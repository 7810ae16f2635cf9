"""yaschva_ray — Ray-Data-native schema + constraint validation engine.

Reimplements the semantics of mmagyar/yaschva (/root/reference) as
vectorized Arrow predicate evaluators over ``ray.data.Dataset`` pipelines.
Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, CLI, or the test fixture).
"""

from .oracle import validate
from .schema import SchemaError, load_json
from .values import UNDEFINED

__all__ = ["validate", "load_json", "SchemaError", "UNDEFINED"]
