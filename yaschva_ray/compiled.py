"""Compiled row validator.

The oracle (`oracle.py`) interprets the schema per value — guard dispatch
and bound lookups run for every node × row.  This module compiles a schema
into a closure tree ONCE (guards, bounds, regexes, `$and` merges, custom
type resolution all resolved at compile time) with byte-identical semantics
— same error strings, same mirror trees, same lazy schema-error timing
(an empty union raises when *reached*, like validate.ts:93).  ~4-5× faster
per row; differential-tested against the oracle (which is itself
differential-tested against the real reference).

Used by `ViolationExploder` for failing rows; the oracle remains the
readable source of truth.
"""

from __future__ import annotations

from typing import Any, Callable

from . import oracle as O
from . import schema as S
from .jsregex import compile_js
from .values import MAX_SAFE_INTEGER, UNDEFINED, is_js_number, is_safe_integer, js_truthy

PASS = {"result": "pass", "output": None}

Fn = Callable[[Any], dict]


def _ok(output: Any = None) -> dict:
    return {"result": "pass", "output": output}


def _fail(error: str, value: Any, output: Any = None) -> dict:
    content: dict = {"error": error, "value": value}
    if output is not None:
        content["output"] = output
    return {"result": "fail", "output": content}


def compile_validator(schema: Any) -> Fn:
    """schema → ``fn(value) -> {"result", "output"}`` (reference contract)."""
    # a str schema may be JSON source or a bare simple/custom type name
    parsed = S.load_json(schema) if isinstance(schema, str) and schema.lstrip().startswith("{") else schema
    return _compile(parsed, {}, {})


def _compile_deferred(node: Any, custom: dict, cache: dict) -> Fn:
    """Compile a child node, converting compile-time schema errors into
    closures that raise when *reached* — matching the interpreter's lazy
    throw timing (e.g. ``['string', 'bigFlout']`` never throws for values
    the first branch accepts)."""
    try:
        return _compile(node, custom, cache)
    except S.SchemaError as e:
        def raiser(v: Any, _e: Exception = e) -> dict:
            raise _e

        return raiser


def _compile(node: Any, custom: dict, cache: dict) -> Fn:
    if node is UNDEFINED:
        raise S.SchemaError("Type for validation cannot be undefined")

    if S.is_typedef(node):
        custom = node["$types"]
        node = {k: v for k, v in node.items() if k != "$types"}
        cache = {}

    if S.is_simple_type(node):
        if js_truthy(custom.get(node, UNDEFINED)):
            return _compile_custom(node, custom, cache)
        return _compile_simple(node)

    if isinstance(node, list):
        if not node:
            # lazy schema error — raised when the union is reached, matching
            # the interpreter's timing (validate.ts:93)
            def raise_empty(v: Any) -> dict:
                raise S.SchemaError("Array of types can not be empty")

            return raise_empty
        branches = [_compile_deferred(b, custom, cache) for b in node]

        def one_of(v: Any) -> dict:
            errors: list = []
            for b in branches:
                r = b(v)
                if r["result"] == "pass":
                    return r
                out = r["output"]
                if isinstance(out, list):
                    errors.extend(out)
                else:
                    errors.append(out)
            return _fail(O.E_ONEOF, v, errors)

        return one_of

    if S.is_array(node):
        elem = _compile_deferred(node["$array"], custom, cache)
        mx = node.get("maxLength") or MAX_SAFE_INTEGER
        mn = node.get("minLength") or 0
        len_err = O.array_length_error(mn, mx)
        unique = bool(node.get("$unique"))  # engine extension (oracle.py)

        def array(v: Any) -> dict:
            if not isinstance(v, list):
                return _fail(O.E_NOT_ARRAY, v)
            if len(v) < mn or len(v) > mx:
                return _fail(len_err, len(v))
            dup = O._dup_mask(v) if unique else None
            flat: list = []
            fail = False
            for i, x in enumerate(v):
                if dup is not None and dup[i]:
                    fail = True
                    flat.append({"error": O.E_NOT_UNIQUE_ARRAY,
                                 "value": x})
                    continue
                r = elem(x)
                if r["result"] == "fail":
                    fail = True
                o = r["output"]
                if isinstance(o, list):
                    flat.extend(o)
                else:
                    flat.append(o)
            return {"result": "fail" if fail else "pass", "output": flat}

        return array

    if S.is_enum(node):
        enums = node["$enum"]
        enum_set = set(enums)
        err = O.enum_error(enums)

        def enum(v: Any) -> dict:
            if not isinstance(v, str):
                return _fail(O.E_NOT_STRING, v)
            if enums and v not in enum_set:
                return _fail(err, v)
            return _ok()

        return enum

    if S.is_obj(node):
        return _compile_object(node, custom, cache)

    if S.is_map(node):
        val_fn = _compile_deferred(node["$map"], custom, cache)
        mx = node.get("maxLength") or MAX_SAFE_INTEGER
        mn = node.get("minLength") or 0
        cnt_err = O.map_count_error(mn, mx)
        rx = compile_js(node["regex"]) if node.get("regex") else None
        unique = bool(node.get("$unique"))  # engine extension (oracle.py)

        def map_(v: Any) -> dict:
            if not isinstance(v, (dict, list)):
                return _fail(O.E_NOT_OBJECT, v)
            keys = [str(i) for i in range(len(v))] if isinstance(v, list) else list(v.keys())
            if len(keys) < mn or len(keys) > mx:
                return _fail(cnt_err, len(keys))
            items = [v[int(k)] if isinstance(v, list) else v[k]
                     for k in keys]
            dup = O._dup_mask(items) if unique else None
            fail = False
            output: dict = {}
            for ki, k in enumerate(keys):
                if rx is not None and rx.search(k) is None:
                    fail = True
                    output[k] = {"error": O.E_REGEX, "value": v}
                    continue
                if dup is not None and dup[ki]:
                    fail = True
                    output[k] = {"error": O.E_NOT_UNIQUE_MAP,
                                 "value": items[ki]}
                    continue
                r = val_fn(items[ki])
                if r["result"] == "fail":
                    fail = True
                output[k] = r["output"]
            return {"result": "fail" if fail else "pass", "output": output}

        return map_

    if S.is_number(node):
        mn = node["$number"].get("min")
        mx = node["$number"].get("max")

        def number(v: Any) -> dict:
            if not is_js_number(v):
                return _fail(O.E_NOT_NUMBER, v)
            if mn is not None and v < mn:
                return _fail(O.E_MIN, v)
            if mx is not None and v > mx:
                return _fail(O.E_MAX, v)
            return _ok()

        return number

    if S.is_meta(node):
        return _compile(node["$type"], custom, cache)

    if S.is_string(node):
        spec = node["$string"]
        mn = spec.get("minLength") or 0   # truthy guards (validate.ts:78-79)
        mx = spec.get("maxLength") or 0
        rx = compile_js(spec["regex"]) if spec.get("regex") else None
        from .values import utf16_length

        def string(v: Any) -> dict:
            if not isinstance(v, str):
                return _fail(O.E_NOT_STRING, v)
            if mn and utf16_length(v) < mn:
                return _fail(O.E_STR_SHORT, v)
            if mx and utf16_length(v) > mx:
                return _fail(O.E_STR_LONG, v)
            if rx is not None and rx.search(v) is None:
                return _fail(O.E_REGEX, v)
            return _ok()

        return string

    if S.is_and(node):
        combined = S.combine_validation_objects(node, custom, lambda resolved: resolved)
        if combined.get("result") == "error":
            err_val = combined["error"]

            def and_schema_error(v: Any) -> dict:
                return _fail(O.E_AND_SCHEMA, err_val)

            return and_schema_error
        return _compile_object(combined["pass"], custom, cache)

    raise S.unknown_validator_error(node)


def _compile_custom(name: str, custom: dict, cache: dict) -> Fn:
    if name in cache:
        return cache[name]
    holder: dict = {}

    def proxy(v: Any) -> dict:
        return holder["fn"](v)

    cache[name] = proxy
    holder["fn"] = _compile_deferred(custom[name], custom, cache)
    return proxy


def _compile_simple(t: str) -> Fn:
    if t == "any":
        return lambda v: _ok()
    if t == "?":
        return lambda v: _ok() if v is UNDEFINED else _fail(O.E_NOT_UNDEFINED, v)
    if t == "null":
        return lambda v: _ok() if v is None else _fail(O.E_NOT_NULL, v)
    if t == "number":
        return lambda v: _ok() if is_js_number(v) else _fail(O.E_NOT_NUMBER, v)
    if t == "integer":
        return lambda v: _ok() if is_safe_integer(v) else _fail(O.E_NOT_INTEGER, v)
    if t == "string":
        return lambda v: _ok() if isinstance(v, str) else _fail(O.E_NOT_STRING, v)
    if t == "boolean":
        return lambda v: _ok() if isinstance(v, bool) else _fail(O.E_NOT_BOOL, v)
    from .checks_registry import lookup_check

    chk = lookup_check(t)
    if chk is not None:  # engine extension — see checks_registry.py
        fn = chk[0]

        def registered(v: Any) -> dict:
            err = fn(v)
            return _ok() if err is None else _fail(err, v)

        return registered
    raise S.unknown_validator_error(t)


def _compile_object(node: dict, custom: dict, cache: dict) -> Fn:
    # precompute: data key → (validator fn); validator pass-2 key order
    compiled: dict[str, Fn] = {}
    data_keys: list[str] = []  # pass-2 iteration order (validator order)
    truthy_keys: set[str] = set()
    for vkey, sub in node.items():
        dkey = vkey[1:] if vkey.startswith("\\$") else vkey
        data_keys.append(dkey)
        if js_truthy(sub):
            truthy_keys.add(dkey)
        compiled[dkey] = _compile_deferred(sub, custom, cache)

    def obj(value: Any) -> dict:
        if not isinstance(value, (dict, list)):
            return _fail(O.E_NOT_OBJECT, value)
        fail = False
        output: dict = {}
        if isinstance(value, list):
            items = [(str(i), value[i]) for i in range(len(value))]
            getter = lambda k: O._get(value, k)  # noqa: E731
        else:
            items = list(value.items())
            getter = lambda k: value.get(k, UNDEFINED)  # noqa: E731
        for key, v in items:
            if key not in truthy_keys:
                fail = True
                output[key] = {"error": O.E_UNKNOWN_KEY, "value": v}
            else:
                r = compiled[key](v)
                if r["result"] == "fail":
                    fail = True
                output[key] = r["output"]
        for key in data_keys:
            if key not in output:
                r = compiled[key](getter(key))
                if r["result"] == "fail":
                    fail = True
                output[key] = r["output"]
        return {"result": "fail" if fail else "pass", "output": output}

    return obj
