"""Schema language: guards, loading, `$and` combination.

The yaschva schema AST (reference: /root/reference/src/validationTypes.ts:1-42)
is plain parsed JSON — strings (simple/custom types), lists (unions) and
dicts (`$`-keyed forms or closed structs).  We keep that representation and
provide the same structural guards, plus `load_json` (validate.ts:263-268)
and `combine_validation_objects` (validate.ts:30-48).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from .values import js_json_dumps, js_truthy

SIMPLE_TYPES = ("string", "boolean", "number", "integer", "null", "?", "any")


class SchemaError(Exception):
    """Raised for malformed *schemas* (the reference throws; validate.ts:203,211,256)."""


def is_simple_type(t: Any) -> bool:
    return isinstance(t, str)


def _truthy_key(t: Any, key: str) -> bool:
    # JS guard style `tbd.$key` — JS truthiness (validationTypes.ts:33-42)
    return isinstance(t, dict) and js_truthy(t.get(key, None))


def is_array(t: Any) -> bool:
    return _truthy_key(t, "$array")


def is_map(t: Any) -> bool:
    return _truthy_key(t, "$map")


def is_string(t: Any) -> bool:
    return _truthy_key(t, "$string")


def is_number(t: Any) -> bool:
    return _truthy_key(t, "$number")


def is_meta(t: Any) -> bool:
    return _truthy_key(t, "$type")


def is_enum(t: Any) -> bool:
    return _truthy_key(t, "$enum")


def is_obj(t: Any) -> bool:
    # validationTypes.ts:39-40 — an object none of whose keys start with '$'.
    return isinstance(t, dict) and not any(k.startswith("$") for k in t)


def is_typedef(t: Any) -> bool:
    return _truthy_key(t, "$types")


def is_and(t: Any) -> bool:
    return _truthy_key(t, "$and")


def load_json(src: str | dict) -> Any:
    """Parse a schema and strip the editor-only ``$schema`` key
    (validate.ts:263-268)."""
    out = json.loads(src) if isinstance(src, str) else dict(src)
    out.pop("$schema", None)
    return out


def combine_validation_objects(
    and_type: dict, custom_types: dict, on_error: Callable[[Any], Any]
) -> dict:
    """Resolve `$and` members through custom-type names and `$type` wrappers,
    then merge key-wise left-to-right (validate.ts:30-48).

    Returns ``{"pass": merged}`` or ``{"result": "error", "error": ...}``.
    """

    def resolve_meta(tpe: Any) -> Any:
        if isinstance(tpe, str):
            return resolve_meta(custom_types.get(tpe))
        if is_meta(tpe):
            return resolve_meta(tpe["$type"])
        return tpe

    resolved = [resolve_meta(x) for x in and_type["$and"]]
    # JS isObj accepts arrays too (validationTypes.ts:39-40 — `instanceof
    # Object` and index-string keys never start with '$'); the reference
    # spreads an array member as {'0': ..., '1': ...} via {...prev, ...cur}
    if any(not (is_obj(x) or isinstance(x, list)) for x in resolved):
        return {"result": "error", "error": on_error(resolved)}

    merged: dict = {}
    for member in resolved:
        if isinstance(member, list):
            merged.update({str(i): v for i, v in enumerate(member)})
        else:
            merged.update(member)
    return {"pass": merged}


def unknown_validator_error(t: Any) -> SchemaError:
    return SchemaError(f"Unknown validator:{js_json_dumps(t)}")
