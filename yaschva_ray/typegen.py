"""Type emitters.

1. ``validation_to_type`` — TypeScript type-string emitter, exact parity
   with the reference (/root/reference/src/type.ts:7-92), including its
   formatting quirks (``{ [key: string] : T}`` with no space before ``}``)
   and its lack of recursive-type support.
2. ``schema_to_arrow`` — the columnar-world analog: emit the expected
   ``pyarrow`` schema for a yaschva schema, used for compile-time
   closedness checks and reader projection (SURVEY.md §2.4).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from . import schema as S


class TypeGenError(Exception):
    pass


def _contains_optional(v: Any) -> bool:
    # type.ts:7-9
    return (isinstance(v, list) and any(y == "?" for y in v)) or v == "?"


def _all_optional(obj: dict) -> bool:
    # type.ts:11-12
    return all(_contains_optional(v) for v in obj.values())


def _simple(input_: str) -> str:
    # type.ts:14-32
    mapping = {
        "string": "string",
        "number": "number",
        "integer": "number",
        "boolean": "boolean",
        "any": "any",
        "null": "null",
        "?": "undefined",
    }
    if input_ in mapping:
        return mapping[input_]
    raise TypeGenError(f"Unhandled {input_}")


def validation_to_type(input_: Any) -> str:
    # type.ts:33
    return _to_type_internal(input_, {})


def _to_type_internal(input_: Any, types_in: dict) -> str:
    # type.ts:34-92
    custom_types = types_in
    t = input_
    if S.is_typedef(input_):
        custom_types = input_["$types"]
        t = {k: v for k, v in input_.items() if k != "$types"}

    def to_type(x: Any) -> str:
        return _to_type_internal(x, custom_types)

    if isinstance(t, list):
        return " | ".join(to_type(x) for x in t)

    if isinstance(t, str):
        if custom_types.get(t):
            return to_type(custom_types[t])
        return _simple(t)

    if S.is_array(t):
        type_ret = to_type(t["$array"])
        if (isinstance(t["$array"], list) and len(t["$array"]) > 1) or "|" in type_ret:
            return f"({type_ret})[]"
        return f"{type_ret}[]"

    if S.is_enum(t):
        return " | ".join(f'"{x}"' for x in t["$enum"])

    if S.is_obj(t):
        def postfix(v: Any) -> str:
            return "?" if _contains_optional(v) else ""

        obj = "; ".join(
            f"{(k[1:] if k.startswith(chr(92) + '$') else k)}{postfix(v)}: {to_type(v)}"
            for k, v in t.items()
        )
        if _all_optional(t):
            return f"{{ {obj} }} | undefined"
        return f"{{ {obj} }}"

    if S.is_string(t):
        return to_type("string")

    if S.is_map(t):
        return f"{{ [key: string] : {to_type(t['$map'])}}}"

    if S.is_meta(t):
        return to_type(t["$type"])

    if S.is_number(t):
        return to_type("number")

    if S.is_and(t):
        combined = S.combine_validation_objects(t, custom_types, lambda x: x)
        if combined.get("result") == "error":
            raise TypeGenError(
                "Schema error, $and types must be objects: "
                + json.dumps(combined["error"], indent=2, default=str)
            )
        return to_type(combined["pass"])

    raise TypeGenError(f"UNSUPPORTED {json.dumps(t, indent=2, default=str)}")


# ---------------------------------------------------------------------------
# Arrow schema emitter (engine addition)
# ---------------------------------------------------------------------------


def schema_to_arrow(schema: Any) -> pa.Schema:
    """Emit the ``pyarrow.Schema`` a conforming table should have.

    Struct keys become fields; a field whose type union contains ``'?'`` or
    ``'null'`` is nullable.  Union-typed fields with incompatible Arrow
    types, recursive custom types, and ``any`` fall back to ``pa.string()``
    (JSON-encoded column, tagged ``encoding=json`` in field metadata) per
    FIXTURES.md encoding rules.
    """
    custom = schema.get("$types", {}) if isinstance(schema, dict) else {}
    body = {k: v for k, v in schema.items() if k != "$types"} if isinstance(schema, dict) else schema
    if not S.is_obj(body):
        raise TypeGenError("schema_to_arrow requires a root object schema")
    fields = []
    for key, v in body.items():
        name = key[1:] if key.startswith("\\$") else key
        dtype, nullable, is_json = _arrow_type(v, custom, set())
        meta = {b"encoding": b"json"} if is_json else None
        fields.append(pa.field(name, dtype, nullable=nullable, metadata=meta))
    return pa.schema(fields)


def _arrow_type(t: Any, custom: dict, seen: frozenset | set) -> tuple[pa.DataType, bool, bool]:
    """Returns (type, nullable, json_fallback)."""
    json_fb = (pa.string(), True, True)
    if isinstance(t, str):
        if t in seen:
            return json_fb  # recursion → JSON column
        if custom.get(t):
            return _arrow_type(custom[t], custom, set(seen) | {t})
        simple = {
            "string": pa.string(),
            "number": pa.float64(),
            "integer": pa.int64(),
            "boolean": pa.bool_(),
            "null": pa.null(),
            "?": pa.null(),
            "any": None,
        }
        if t not in simple:
            raise TypeGenError(f"Unhandled {t}")
        if simple[t] is None:
            return json_fb
        return simple[t], t in ("null", "?"), False
    if isinstance(t, list):
        branches = [b for b in t if b not in ("?", "null")]
        nullable = len(branches) < len(t)
        if len(branches) == 1:
            dtype, _, fb = _arrow_type(branches[0], custom, seen)
            return dtype, nullable, fb
        types = [_arrow_type(b, custom, seen) for b in branches]
        distinct = {str(x[0]) for x in types}
        if len(distinct) == 1 and not types[0][2]:
            return types[0][0], nullable, False
        return json_fb
    if S.is_array(t):
        dtype, _, fb = _arrow_type(t["$array"], custom, seen)
        if fb:
            return json_fb
        return pa.list_(dtype), False, False
    if S.is_enum(t):
        return pa.string(), False, False
    if S.is_obj(t):
        sub = []
        for k, v in t.items():
            name = k[1:] if k.startswith("\\$") else k
            dtype, nullable, fb = _arrow_type(v, custom, seen)
            if fb:
                dtype = pa.string()
            sub.append(pa.field(name, dtype, nullable=True))
        return pa.struct(sub), False, False
    if S.is_map(t):
        dtype, _, fb = _arrow_type(t["$map"], custom, seen)
        if fb:
            return json_fb
        return pa.map_(pa.string(), dtype), False, False
    if S.is_number(t):
        return pa.float64(), False, False
    if S.is_meta(t):
        return _arrow_type(t["$type"], custom, seen)
    if S.is_string(t):
        return pa.string(), False, False
    if S.is_and(t):
        combined = S.combine_validation_objects(t, custom, lambda x: x)
        if combined.get("result") == "error":
            raise TypeGenError("$and must only contain objects")
        return _arrow_type(combined["pass"], custom, seen)
    return json_fb


def arrow_to_validation(schema: pa.Schema,
                        nullable_cols: set | frozenset = frozenset()) -> dict:
    """INFER a validation schema from an Arrow schema — the inverse of
    ``schema_to_arrow``, closing the reference's self-describe loop from
    the data side: tables whose producer never wrote a schema get one the
    engine can validate against (``validate(infer(t), row)`` passes for
    every row of ``t`` — tested round-trip).

    Arrow nullability is declared per field but almost always ``True``
    regardless of content, so the DATA decides: callers pass the set of
    columns that actually contain nulls (a per-block partial null count —
    the ``null_counts_documents`` pattern) and only those become
    ``[T, 'null']`` unions.  Nested list/struct types recurse; unhandled
    Arrow types raise (no silent 'any')."""
    out: dict = {}
    for f in schema:
        t = _validation_type(f.type)
        if f.name in nullable_cols:
            t = [t, "null"] if not isinstance(t, list) else [*t, "null"]
        key = "\\" + f.name if f.name.startswith("$") else f.name
        out[key] = t
    return out


def _validation_type(t: pa.DataType):
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_null(t):
        return "null"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"$array": _validation_type(t.value_type)}
    if pa.types.is_struct(t):
        # struct members: Arrow cannot distinguish JSON null from absent,
        # so inferred members accept both ('?') plus null — the loosest
        # schema every conforming row passes
        return {("\\" + f.name if f.name.startswith("$") else f.name):
                [_validation_type(f.type), "null", "?"]
                for f in t}
    if pa.types.is_map(t):
        return {"$map": _validation_type(t.item_type)}
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # engine convention (FIXTURES.md): temporal columns validate as
        # their ISO string form
        return "string"
    raise TypeGenError(f"cannot infer a validation type for {t}")
