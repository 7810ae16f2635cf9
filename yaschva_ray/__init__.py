"""yaschva_ray — Ray-Data-native schema + constraint validation engine.

Reimplements the semantics of mmagyar/yaschva (/root/reference) as
vectorized Arrow predicate evaluators over ``ray.data.Dataset`` pipelines.
Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, CLI, or the test fixture).
"""

from .checks_registry import (register_check, registered_check,
                              unregister_check)
from .generate import generate
from .oracle import validate
from .schema import (SchemaError, combine_validation_objects, is_and,
                     is_array, is_enum, is_map, is_meta, is_number, is_obj,
                     is_simple_type, is_string, is_typedef, load_json)
from .typegen import schema_to_arrow, validation_to_type
from .values import UNDEFINED

# mirror of the reference's public surface (src/index.ts re-exports
# validate.js, generate.js, type.js, validationTypes.js) plus the
# columnar-world analog schema_to_arrow and the engine's named-check
# extension surface (SURVEY §2.5)
__all__ = [
    "validate", "load_json", "generate", "validation_to_type",
    "schema_to_arrow", "combine_validation_objects", "SchemaError",
    "UNDEFINED", "is_simple_type", "is_array", "is_map", "is_string",
    "is_number", "is_meta", "is_enum", "is_obj", "is_typedef",
    "is_and", "register_check", "unregister_check", "registered_check",
]
