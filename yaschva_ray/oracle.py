"""Row-level oracle validator.

A faithful re-implementation of the reference's recursive-descent validator
(/root/reference/src/validate.ts:22-261): same dispatch order, same error
strings byte-for-byte (including trailing spaces, validate.ts:68,72), same
mirror-shaped output trees.  It is

* the conformance surface the ported Jest corpus runs against,
* the differential-testing oracle for the vectorized engine, and
* the fallback evaluator used inside ``map_batches`` for rows the
  vectorized path flags as failing (exact violation payloads) or for schema
  nodes the vectorizer cannot express (recursive custom types).

Values follow the JS domain: ``UNDEFINED`` sentinel = JS undefined, ``None``
= JS null, dicts/lists/str/bool/int/float as JSON.
"""

from __future__ import annotations

from typing import Any

from . import schema as S
from .jsregex import js_test
from .values import (
    MAX_SAFE_INTEGER,
    UNDEFINED,
    is_js_number,
    is_safe_integer,
    js_num_str,
    js_truthy,
    utf16_length,
)

PASS = "pass"
FAIL = "fail"

# Exact error strings (validate.ts:50-176).  Two contain trailing spaces.
E_NOT_UNDEFINED = "Value is not undefined"
E_NOT_NULL = "Value is not null"
E_NOT_NUMBER = "Value is not a number"
E_MIN = "Value is smaller than the required minimum"
E_MAX = "Value is bigger than the required maximum"
E_NOT_INTEGER = "Value is not an integer "  # trailing space, validate.ts:68
E_NOT_STRING = "Value is not a string"
E_STR_SHORT = "String is shorter than the required minimum length"
E_STR_LONG = "String is longer than the required maximum length"
E_REGEX = "String did not match required regex"
E_NOT_BOOL = "Value is not a boolean"
E_ONEOF = "Did not match any from the listed types"
E_NOT_ARRAY = "Value is not an Array"
E_NOT_OBJECT = "Value is not an Object"
E_UNKNOWN_KEY = "Key does not exist on validator"
E_AND_SCHEMA = "SCHEMA error: $and must only contain objects"
# ENGINE EXTENSION (reference README.md:174-178 lists "Array to be
# unique set" / "Map to be a unique set" as unimplemented future work;
# neither side of the differential implements it in the parity surface,
# and the fuzz generator never emits $unique): `"$unique": true` on an
# $array / $map node fails any element (map: value) that DEEP-equals an
# earlier one — equality is order-insensitive canonical JSON (object
# key order ignored; 1 and 1.0 equal; true distinct from 1).
E_NOT_UNIQUE_ARRAY = "Array contains duplicate values"
E_NOT_UNIQUE_MAP = "Map contains duplicate values"


def canonical_value_key(value: Any) -> str:
    """Order-insensitive deep-equality key: canonical JSON with sorted
    object keys and integral floats normalized to ints (bools stay
    bools — JSON spells them 'true'/'false', never 1/0)."""
    import json

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, list):
            return [norm(x) for x in v]
        return v

    return json.dumps(norm(value), sort_keys=True, separators=(",", ":"))


def enum_error(enums: list[str]) -> str:
    return f"Value needs to be one of the following: [{', '.join(enums)}] "


def array_length_error(min_len: Any, max_len: Any) -> str:
    return f"Array length needs to be between {js_num_str(min_len)} - {js_num_str(max_len)}"


def map_count_error(min_len: Any, max_len: Any) -> str:
    return (
        f"Map needs to have member count to be between "
        f"{js_num_str(min_len)} - {js_num_str(max_len)}"
    )


def _fail(error: str, value: Any, output: Any = None) -> dict:
    # validate.ts:22-28
    content: dict = {"error": error, "value": value}
    if output is not None:
        content["output"] = output
    return {"result": FAIL, "output": content}


def _is_js_object(value: Any) -> bool:
    """``typeof value === 'object' && value !== null`` — JS arrays are
    objects too (validate.ts:130, 163), with index-string keys."""
    return isinstance(value, (dict, list))


def _js_keys(value: Any) -> list[str]:
    """``Object.keys`` — for arrays these are the index strings."""
    if isinstance(value, list):
        return [str(i) for i in range(len(value))]
    return list(value.keys())


def _get(value: Any, key: str) -> Any:
    """JS property access: missing key reads as undefined."""
    if isinstance(value, dict):
        return value.get(key, UNDEFINED)
    if isinstance(value, list):
        try:
            i = int(key)
        except ValueError:
            return UNDEFINED
        if str(i) == key and 0 <= i < len(value):
            return value[i]
    return UNDEFINED


def _validate_undefined(v: Any) -> str | None:
    return None if v is UNDEFINED else E_NOT_UNDEFINED


def _validate_null(v: Any) -> str | None:
    return None if v is None else E_NOT_NULL


def _validate_number(v: Any) -> str | None:
    return None if is_js_number(v) else E_NOT_NUMBER


def _validate_number_complex(v: Any, mn: Any, mx: Any) -> str | None:
    res = _validate_number(v)
    if res is None:
        # $number min/max use `!== undefined` so 0 IS enforced (validate.ts:62-63)
        if mn is not None and v < mn:
            return E_MIN
        if mx is not None and v > mx:
            return E_MAX
    return res


def _validate_integer(v: Any) -> str | None:
    return None if is_safe_integer(v) else E_NOT_INTEGER


def _validate_string(v: Any, enums: list[str] | None = None) -> str | None:
    if not isinstance(v, str):
        return E_NOT_STRING
    if enums:
        if not any(v == x for x in enums):
            return enum_error(enums)
    return None


def _validate_string_object(v: Any, node: dict) -> str | None:
    if not isinstance(v, str):
        return E_NOT_STRING
    spec = node["$string"]
    # truthy guards: minLength/maxLength of 0 are ignored (validate.ts:78-79)
    if spec.get("minLength") and utf16_length(v) < spec["minLength"]:
        return E_STR_SHORT
    if spec.get("maxLength") and utf16_length(v) > spec["maxLength"]:
        return E_STR_LONG
    if spec.get("regex"):
        if not js_test(spec["regex"], v):
            return E_REGEX
    return None


def _validate_bool(v: Any) -> str | None:
    return None if isinstance(v, bool) else E_NOT_BOOL


def _to_result(res: str | None, value: Any) -> dict:
    # validate.ts:207-208
    if res:
        return {"result": FAIL, "output": {"error": res, "value": value}}
    return {"result": PASS, "output": None}


def _validate_one_of(value: Any, branches: list, validate_fn) -> dict:
    # validate.ts:91-104
    if not branches:
        raise S.SchemaError("Array of types can not be empty")
    errors: list = []
    for branch in branches:
        result = validate_fn(branch, value)
        if result["result"] == PASS:
            return result
        out = result["output"]
        if isinstance(out, list):
            errors.extend(out)
        else:
            errors.append(out)
    return _fail(E_ONEOF, value, errors)


def _dup_mask(values: list) -> list[bool]:
    """True at each position whose value deep-equals an EARLIER one."""
    seen: set = set()
    out = []
    for v in values:
        k = canonical_value_key(v)
        out.append(k in seen)
        seen.add(k)
    return out


def _validate_array(value: Any, node: dict, validate_fn) -> dict:
    # validate.ts:106-126
    if isinstance(value, list):
        max_len = node.get("maxLength") or MAX_SAFE_INTEGER  # truthy-or default
        min_len = node.get("minLength") or 0
        if len(value) < min_len or len(value) > max_len:
            return _fail(array_length_error(min_len, max_len), len(value))
        dup = _dup_mask(value) if node.get("$unique") else None
        result_array: list = []
        fail = False
        for i, x in enumerate(value):
            if dup is not None and dup[i]:
                # $unique extension: a repeat of an earlier element is
                # its own error (element validation is moot — the set
                # constraint already failed here)
                fail = True
                result_array.append({"error": E_NOT_UNIQUE_ARRAY,
                                     "value": x})
                continue
            res = validate_fn(node["$array"], x)
            if res["result"] == FAIL:
                fail = True
            result_array.append(res["output"])
        # one level of flattening (validate.ts:123)
        flat: list = []
        for o in result_array:
            if isinstance(o, list):
                flat.extend(o)
            else:
                flat.append(o)
        return {"result": FAIL if fail else PASS, "output": flat}
    return _fail(E_NOT_ARRAY, value)


def _validate_object(value: Any, validator: dict, validate_fn) -> dict:
    # validate.ts:128-159.  Closed struct; `$`-keys in data map to `\$`-keys
    # in the schema; missing members validate as undefined.
    if not _is_js_object(value):
        return _fail(E_NOT_OBJECT, value)

    fail = False
    output: dict = {}

    for key in _js_keys(value):
        validator_key = "\\" + key if key.startswith("$") else key
        # JS truthiness: an empty-array union schema is truthy (and later throws)
        if not js_truthy(validator.get(validator_key, UNDEFINED)):
            fail = True
            output[key] = {"error": E_UNKNOWN_KEY, "value": _get(value, key)}
        else:
            res = validate_fn(validator[validator_key], _get(value, key))
            if res["result"] == FAIL:
                fail = True
            output[key] = res["output"]

    for validator_key in validator.keys():
        key = validator_key[1:] if validator_key.startswith("\\$") else validator_key
        if key not in output:
            res = validate_fn(validator[validator_key], _get(value, key))
            if res["result"] == FAIL:
                fail = True
            output[key] = res["output"]

    return {"result": FAIL if fail else PASS, "output": output}


def _validate_map(value: Any, node: dict, validate_fn) -> dict:
    # validate.ts:161-193
    if not _is_js_object(value):
        return _fail(E_NOT_OBJECT, value)

    fail = False
    output: dict = {}
    keys = _js_keys(value)
    key_count = len(keys)
    max_len = node.get("maxLength") or MAX_SAFE_INTEGER
    min_len = node.get("minLength") or 0
    if key_count < min_len or key_count > max_len:
        return _fail(map_count_error(min_len, max_len), key_count)
    dup = (_dup_mask([_get(value, k) for k in keys])
           if node.get("$unique") else None)
    for ki, key in enumerate(keys):
        if node.get("regex"):
            if not js_test(node["regex"], key):
                fail = True
                # value echoes the WHOLE map (validate.ts:181-184)
                output[key] = {"error": E_REGEX, "value": value}
                continue
        if dup is not None and dup[ki]:
            # $unique extension: a later key whose VALUE deep-equals an
            # earlier key's value fails the unique-set constraint
            fail = True
            output[key] = {"error": E_NOT_UNIQUE_MAP,
                           "value": _get(value, key)}
            continue
        res = validate_fn(node["$map"], _get(value, key))
        if res["result"] == FAIL:
            fail = True
        output[key] = res["output"]

    return {"result": FAIL if fail else PASS, "output": output}


def _simple_validation(t: str, value: Any) -> str | None:
    # validate.ts:194-205
    if t == "any":
        return None
    if t == "?":
        return _validate_undefined(value)
    if t == "number":
        return _validate_number(value)
    if t == "integer":
        return _validate_integer(value)
    if t == "string":
        return _validate_string(value)
    if t == "boolean":
        return _validate_bool(value)
    if t == "null":
        return _validate_null(value)
    from .checks_registry import lookup_check

    chk = lookup_check(t)
    if chk is not None:  # engine extension — see checks_registry.py
        return chk[0](value)
    raise S.unknown_validator_error(t)


def validate_internal(type_in: Any, value: Any, custom_types_in: dict) -> dict:
    # validate.ts:210-257 — dispatch order preserved exactly.
    if type_in is UNDEFINED:
        raise S.SchemaError("Type for validation cannot be undefined")

    t = type_in
    custom_types = custom_types_in
    if S.is_typedef(type_in):
        custom_types = type_in["$types"]
        t = {k: v for k, v in type_in.items() if k != "$types"}

    def validate_custom(tt: Any, vv: Any) -> dict:
        return validate_internal(tt, vv, custom_types)

    if S.is_simple_type(t):
        if js_truthy(custom_types.get(t, UNDEFINED)):
            return validate_custom(custom_types[t], value)
        return _to_result(_simple_validation(t, value), value)

    if isinstance(t, list):
        return _validate_one_of(value, t, validate_custom)

    if S.is_array(t):
        return _validate_array(value, t, validate_custom)

    if S.is_enum(t):
        return _to_result(_validate_string(value, t["$enum"]), value)

    if S.is_obj(t):
        return _validate_object(value, t, validate_custom)

    if S.is_map(t):
        return _validate_map(value, t, validate_custom)

    if S.is_number(t):
        return _to_result(
            _validate_number_complex(value, t["$number"].get("min"), t["$number"].get("max")),
            value,
        )

    if S.is_meta(t):
        return validate_custom(t["$type"], value)

    if S.is_string(t):
        return _to_result(_validate_string_object(value, t), value)

    if S.is_and(t):
        combined = S.combine_validation_objects(
            t, custom_types, lambda resolved: _fail(E_AND_SCHEMA, resolved)
        )
        if combined.get("result") == "error":
            return combined["error"]
        return _validate_object(value, combined["pass"], validate_custom)

    raise S.unknown_validator_error(t)


def validate(schema: Any, value: Any) -> dict:
    """Public entry (validate.ts:259-261): ``{"result": "pass"|"fail",
    "output": <mirror tree>}``."""
    if schema is UNDEFINED:
        raise S.SchemaError("Type for validation cannot be undefined")
    return validate_internal(schema, value, {})
