"""Vectorized Arrow-compute validator.

Compiles a yaschva schema (reference semantics: /root/reference/src/
validate.ts) into per-column Arrow predicate evaluators producing a per-row
``valid`` mask over a ``pyarrow.Table`` batch — the fast path of the engine.
Exact violation payloads (mirror trees, error strings) are produced only for
failing rows by the row oracle (``oracle.py``), which is differential-tested
against the real reference.  This mirrors the reference's own proposed
fail-fast optimization (README.md:185-195): vectorized happy path, full
error construction only on failure.

Design rules (SURVEY.md §1.3):
* Arrow null in a field whose schema mentions ``'null'`` (and not ``'?'``)
  decodes as JS ``null``; otherwise as JS ``undefined`` (missing member).
* A column absent from the table is ``undefined`` for every row.
* Nodes the vectorizer cannot express (recursive custom types, JSON-encoded
  dynamic columns) fall back to the row oracle for that column only.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import schema as S
from .jsregex import compile_js, is_re2_safe
from .oracle import validate_internal
from .values import MAX_SAFE_INTEGER, UNDEFINED, js_truthy, utf16_length


class VectorizedUnsupported(Exception):
    """Node requires the row-oracle fallback."""


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _np(arr: pa.Array | pa.ChunkedArray, fill=False) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null(fill)
    return arr.to_numpy(zero_copy_only=False)


def _null_mask(arr: pa.Array) -> np.ndarray:
    return _np(pc.is_null(arr))


def resolve_ref(node: Any, custom: dict, seen: frozenset = frozenset()) -> Any:
    """Inline custom-type names / `$type` wrappers; recursion is unsupported
    on the vectorized path (handled by the oracle fallback)."""
    while True:
        if isinstance(node, str) and custom.get(node):
            if node in seen:
                raise VectorizedUnsupported(f"recursive custom type {node}")
            seen = seen | {node}
            node = custom[node]
        elif S.is_meta(node):
            node = node["$type"]
        else:
            return node


def _mentions(node: Any, name: str, custom: dict) -> bool:
    if isinstance(node, str):
        if custom.get(node):
            return False  # custom types: decided at their own level
        return node == name
    if isinstance(node, list):
        return any(x == name for x in node)
    return False


def null_decodes_as_undefined(node: Any, custom: dict) -> bool:
    """Arrow-null decode rule for this schema position (FIXTURES.md)."""
    return not (_mentions(node, "null", custom) and not _mentions(node, "?", custom))


def _utf16_lengths(arr: pa.Array) -> np.ndarray:
    """Vectorized JS String.length.  Code-point count equals UTF-16 units
    unless the string has non-BMP characters (4-byte UTF-8); those rows get
    an exact per-row computation."""
    cp = _np(pc.utf8_length(arr), fill=0).astype(np.int64)
    nbytes = _np(pc.binary_length(arr), fill=0).astype(np.int64)
    out = cp
    suspicious = nbytes - cp >= 3  # at least one char could be non-BMP
    if suspicious.any():
        out = cp.copy()
        idx = np.nonzero(suspicious)[0]
        py = arr.take(pa.array(idx)).to_pylist()
        for k, s in zip(idx, py):
            out[k] = utf16_length(s) if s is not None else 0
    return out


def _regex_fail_mask(arr: pa.Array, pattern: str) -> np.ndarray:
    """True where the (non-null) string does NOT contain a match."""
    if is_re2_safe(pattern):
        try:
            ok = pc.match_substring_regex(arr, pattern)
            return ~_np(ok, fill=False)
        except pa.ArrowInvalid:
            pass  # RE2 rejected the pattern — fall through to Python
    rx = compile_js(pattern)
    vals = arr.to_pylist()
    return np.array([not (v is not None and rx.search(v) is not None) for v in vals], dtype=bool)


def _segmented_any(child_fail: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """For list-typed parents: does any element in [offsets[i], offsets[i+1])
    fail?"""
    if len(child_fail) == 0:
        return np.zeros(len(offsets) - 1, dtype=bool)
    cs = np.concatenate([[0], np.cumsum(child_fail.astype(np.int64))])
    return (cs[offsets[1:]] - cs[offsets[:-1]]) > 0


def _segment_dup_any(values: pa.Array, offsets: np.ndarray) -> np.ndarray:
    """Per-segment True iff any value deep-equals another within the
    segment (the ``$unique`` engine extension, oracle.py): a vectorized
    64-bit hash prescreen (sort by (row, hash), adjacent-equal within a
    row) flags CANDIDATE rows; only those rows get the exact Python
    canonical-JSON verify — false hash positives are filtered, and
    false negatives can't occur because physically-equal Arrow values
    hash equal.  Unsupported dtypes fall back to exact-verifying every
    multi-element row."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=bool)
    if not int(offsets[-1]):
        return out
    lengths = np.diff(offsets)
    vals = values.combine_chunks() if isinstance(
        values, pa.ChunkedArray) else values
    try:
        from .engine.sketches import _hash64

        h = _hash64(vals)
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        order = np.lexsort((h, row))
        hs, rs = h[order], row[order]
        same = (hs[1:] == hs[:-1]) & (rs[1:] == rs[:-1])
        cand = np.unique(rs[1:][same])
    except Exception:
        cand = np.arange(n)[lengths > 1]
    if len(cand):
        from .oracle import canonical_value_key

        for r in cand:
            seg = vals.slice(int(offsets[r]), int(lengths[r])).to_pylist()
            ks = [canonical_value_key(v) for v in seg]
            out[int(r)] = len(set(ks)) < len(ks)
    return out


def _list_parts(arr: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(lengths, flat values, offsets-normalized) for a List/LargeList array,
    treating null lists as length 0 and excluding their elements."""
    lengths = _np(pc.list_value_length(arr), fill=0).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    values = arr.flatten()  # pyarrow flatten skips null slots' values
    return lengths, values, offsets


# ---------------------------------------------------------------------------
# node evaluation (returns per-row FAIL mask)
# ---------------------------------------------------------------------------


def eval_node(
    node: Any,
    arr: pa.Array | None,
    undef: np.ndarray,
    jsnull: np.ndarray,
    n: int,
    custom: dict,
    seen: frozenset = frozenset(),
) -> np.ndarray:
    """Evaluate `node` against column data.

    ``arr`` is the Arrow values (may be None when the column is entirely
    absent); ``undef``/``jsnull`` mark rows whose value is JS undefined /
    null.  Rows flagged undef or jsnull must not also be interpreted through
    ``arr``.  Returns a boolean FAIL mask of length ``n``.
    """
    defined = ~(undef | jsnull)

    # dispatch order mirrors the reference exactly (validate.ts:223-256):
    # custom/simple → union → $array → $enum → obj → $map → $number →
    # $type → $string → $and — it matters when a node carries several
    # `$`-keys (first matching guard wins).
    if isinstance(node, str):
        if js_truthy(custom.get(node, UNDEFINED)):
            return eval_node(resolve_ref(node, custom, seen), arr, undef, jsnull, n, custom, seen)
        return _eval_simple(node, arr, undef, jsnull, defined, n)

    if isinstance(node, list):
        if not node:
            raise S.SchemaError("Array of types can not be empty")
        fail = np.ones(n, dtype=bool)
        for branch in node:
            fail &= eval_node(branch, arr, undef, jsnull, n, custom, seen)
            if not fail.any():
                break
        return fail

    if S.is_array(node):
        return _eval_array(node, arr, defined, n, custom, seen)

    if S.is_enum(node):
        fail = ~defined
        if arr is not None and (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            in_set = _np(pc.is_in(arr, value_set=pa.array(node["$enum"], type=arr.type)), fill=False)
            fail = fail | (defined & ~in_set)
        else:
            fail = np.ones(n, dtype=bool)  # non-string column: every defined row fails too
        return fail

    if S.is_obj(node):
        return _eval_struct(node, arr, defined, n, custom, seen)

    if S.is_map(node):
        return _eval_map(node, arr, defined, n, custom, seen)

    if S.is_number(node):
        return _eval_number(node["$number"].get("min"), node["$number"].get("max"),
                            arr, defined, n)

    if S.is_meta(node):
        return eval_node(node["$type"], arr, undef, jsnull, n, custom, seen)

    if S.is_string(node):
        return _eval_string_obj(node, arr, defined, n)

    if S.is_and(node):
        combined = S.combine_validation_objects(node, custom, lambda x: x)
        if combined.get("result") == "error":
            return np.ones(n, dtype=bool)  # every row: SCHEMA error fail (validate.ts:248)
        return eval_node(combined["pass"], arr, undef, jsnull, n, custom, seen)

    raise S.unknown_validator_error(node)


def _eval_simple(t: str, arr, undef, jsnull, defined, n) -> np.ndarray:
    if t == "any":
        return np.zeros(n, dtype=bool)
    if t == "?":
        return ~undef
    if t == "null":
        return ~jsnull
    if t == "boolean":
        if arr is not None and pa.types.is_boolean(arr.type):
            return ~defined
        return np.ones(n, dtype=bool) | ~defined
    if t == "string":
        if arr is not None and (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            return ~defined
        return np.ones(n, dtype=bool)
    if t == "number":
        return _eval_number(None, None, arr, defined, n)
    if t == "integer":
        if arr is None:
            return np.ones(n, dtype=bool)
        if pa.types.is_integer(arr.type):
            v = _np(arr, fill=0).astype(np.float64)
            ok = np.abs(v) <= MAX_SAFE_INTEGER
            return ~defined | (defined & ~ok)
        if pa.types.is_floating(arr.type):
            v = _np(arr, fill=0.0).astype(np.float64)
            ok = np.isfinite(v) & (np.floor(v) == v) & (np.abs(v) <= MAX_SAFE_INTEGER)
            return ~defined | (defined & ~ok)
        return np.ones(n, dtype=bool)
    from .checks_registry import lookup_check

    chk = lookup_check(t)
    if chk is not None:  # engine extension — see checks_registry.py
        if chk[1] is not None and arr is not None:
            return _registered_mask(chk, arr, defined, n)
        raise VectorizedUnsupported(f"registered check {t!r} has no "
                                    "vectorized kernel")
    raise S.unknown_validator_error(t)


def _registered_mask(chk, arr, defined, n) -> np.ndarray:
    """Fail mask for a registered check with a vectorized kernel: the
    kernel judges DEFINED values; undefined/null cells fail (a registered
    predicate is a leaf like $string — pair with ['?' , '@check'] unions
    for optionality)."""
    vec = np.asarray(chk[1](arr), dtype=bool)
    return ~defined | (defined & vec)


def _eval_number(mn, mx, arr, defined, n) -> np.ndarray:
    if arr is None or not (pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)):
        return np.ones(n, dtype=bool)
    v = _np(arr, fill=0).astype(np.float64)
    ok = np.isfinite(v)
    if mn is not None:
        ok &= v >= mn
    if mx is not None:
        ok &= v <= mx
    return ~defined | (defined & ~ok)


def _eval_string_obj(node, arr, defined, n) -> np.ndarray:
    if arr is None or not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        return np.ones(n, dtype=bool)
    spec = node["$string"]
    fail = ~defined
    need_len = bool(spec.get("minLength")) or bool(spec.get("maxLength"))
    if need_len:
        l16 = _utf16_lengths(arr)
        if spec.get("minLength"):
            fail = fail | (defined & (l16 < spec["minLength"]))
        if spec.get("maxLength"):
            fail = fail | (defined & (l16 > spec["maxLength"]))
    if spec.get("regex"):
        fail = fail | (defined & _regex_fail_mask(arr, spec["regex"]))
    return fail


def _child_env(values: pa.Array, node: Any, custom: dict):
    """undef/jsnull masks for nested values by the Arrow-null decode rule."""
    m = _null_mask(values)
    if null_decodes_as_undefined(node, custom):
        return m, np.zeros(len(values), dtype=bool)
    return np.zeros(len(values), dtype=bool), m


def _sidecar_env(values: pa.Array | None, present: pa.Array, n: int):
    """undef/jsnull masks when a ``<field>__present`` boolean sidecar carries
    the undefined-vs-null distinction (FIXTURES.md encoding rules): sidecar
    False ⇒ JS undefined; sidecar True + Arrow null ⇒ JS null."""
    pres = _np(present, fill=False).astype(bool)
    nulls = _null_mask(values) if values is not None else np.ones(n, dtype=bool)
    return ~pres, pres & nulls


def sidecar_name(field: str) -> str:
    return f"{field}__present"


def _eval_array(node, arr, defined, n, custom, seen) -> np.ndarray:
    if arr is None or not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        return np.ones(n, dtype=bool)
    lengths, values, offsets = _list_parts(arr)
    mx = node.get("maxLength") or MAX_SAFE_INTEGER
    mn = node.get("minLength") or 0
    len_fail = (lengths < mn) | (lengths > mx)
    u, jn = _child_env(values, node["$array"], custom)
    child_fail = eval_node(node["$array"], values, u, jn, len(values), custom, seen)
    elem_fail = _segmented_any(child_fail, offsets)
    if node.get("$unique"):  # engine extension (oracle.py)
        elem_fail = elem_fail | _segment_dup_any(values, offsets)
    return ~defined | (defined & (len_fail | elem_fail))


def _eval_struct(node, arr, defined, n, custom, seen) -> np.ndarray:
    if arr is None or not pa.types.is_struct(arr.type):
        return np.ones(n, dtype=bool)
    fail = ~defined
    schema_keys = {}
    for k, v in node.items():
        schema_keys[k[1:] if k.startswith("\\$") else k] = v
    member_fail = np.zeros(n, dtype=bool)
    sidecars: dict[str, pa.Array] = {}
    for field in arr.type:
        if field.name.endswith("__present") and field.name[:-9] in schema_keys:
            sidecars[field.name[:-9]] = pc.struct_field(arr, field.name)
            continue
        if field.name not in schema_keys:
            # closedness: an unknown key fails ONLY rows where it is an own
            # property (validate.ts:137-141); an Arrow null in an unknown
            # field decodes as absent (undefined) and passes
            member_fail |= ~_null_mask(pc.struct_field(arr, field.name))
    for name, sub in schema_keys.items():
        idx = arr.type.get_field_index(name)
        if idx < 0:
            child = None
            u = np.ones(n, dtype=bool)
            jn = np.zeros(n, dtype=bool)
        else:
            child = pc.struct_field(arr, idx)
            if name in sidecars:
                u, jn = _sidecar_env(child, sidecars[name], n)
            else:
                u, jn = _child_env(child, sub, custom)
        member_fail |= eval_node(sub, child, u, jn, n, custom, seen)
    return fail | (defined & member_fail)


def _eval_map(node, arr, defined, n, custom, seen) -> np.ndarray:
    if arr is None or not pa.types.is_map(arr.type):
        return np.ones(n, dtype=bool)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # list_value_length has no map kernel; use the PHYSICAL offsets.
    # ``arr.offsets`` is a correctly-sliced view, but ``arr.keys``/``items``
    # return the FULL child array — so slice children to
    # [offsets[0], offsets[-1]) and rebase, which also stays correct for a
    # sliced MapArray and for null slots with non-zero width (their entries
    # are positioned by the raw offsets and masked out below).
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    start, end = int(off[0]), int(off[-1])
    rel = off - start
    raw = np.diff(off)
    nulls = _null_mask(arr)
    lengths = np.where(nulls, 0, raw)
    mx = node.get("maxLength") or MAX_SAFE_INTEGER
    mn = node.get("minLength") or 0
    count_fail = (lengths < mn) | (lengths > mx)
    keys = arr.keys.slice(start, end - start)
    items = arr.items.slice(start, end - start)
    per_entry_fail = np.zeros(len(items), dtype=bool)
    if node.get("regex"):
        per_entry_fail |= _regex_fail_mask(keys, node["regex"])
    u, jn = _child_env(items, node["$map"], custom)
    per_entry_fail |= eval_node(node["$map"], items, u, jn, len(items), custom, seen)
    entry_fail = _segmented_any(per_entry_fail, rel) & ~nulls
    if node.get("$unique"):  # engine extension (oracle.py)
        entry_fail = entry_fail | (_segment_dup_any(items, rel) & ~nulls)
    return ~defined | (defined & (count_fail | entry_fail))


# ---------------------------------------------------------------------------
# table-level validator
# ---------------------------------------------------------------------------


class TableValidator:
    """Compiled validator for a root object schema over a ``pyarrow.Table``.

    Usable directly as a ``map_batches`` callable (stateless semantics; the
    compiled schema is captured in the closure and shipped once per task).
    Appends a boolean ``valid`` column.  Columns whose schema node cannot be
    vectorized fall back to the row oracle automatically.
    """

    def __init__(self, schema: Any, *, id_columns: tuple[str, ...] = (),
                 json_columns: tuple[str, ...] = ()):
        parsed = S.load_json(schema) if isinstance(schema, (str, dict)) else schema
        self.custom: dict = parsed.get("$types", {}) if isinstance(parsed, dict) else {}
        body = {k: v for k, v in parsed.items() if k != "$types"}
        if S.is_and(body):
            combined = S.combine_validation_objects(body, self.custom, lambda x: x)
            if combined.get("result") == "error":
                raise S.SchemaError("$and must only contain objects")
            body = combined["pass"]
        if S.is_meta(body):
            try:
                body = resolve_ref(body, self.custom)
            except VectorizedUnsupported:
                raise S.SchemaError("recursive root type not supported for tables")
        if not S.is_obj(body):
            raise S.SchemaError("TableValidator requires a root object schema")
        self.fields: dict[str, Any] = {
            (k[1:] if k.startswith("\\$") else k): v for k, v in body.items()
        }
        self.id_columns = tuple(id_columns)
        # JSON-encoded string columns (FIXTURES.md encoding rules): values
        # are parsed per row and validated through the oracle — the path for
        # dynamic payloads / heterogeneous unions Arrow can't type
        self.json_columns = tuple(json_columns)

    def fail_mask(self, batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        fail = np.zeros(n, dtype=bool)
        present = set(batch.column_names)
        side_names = {sidecar_name(f) for f in self.fields}
        # closed-struct rule at table level: an unknown column fails only
        # rows where its value is an own property (non-null); an Arrow null
        # decodes as absent and passes (validate.ts:137-141)
        for name in present:
            if name in self.fields or name in self.id_columns or name in side_names:
                continue
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            fail |= ~_null_mask(col)
        for name, node in self.fields.items():
            side = sidecar_name(name)
            if name in present:
                col = batch[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if side in present:
                    sc = batch[side]
                    if isinstance(sc, pa.ChunkedArray):
                        sc = sc.combine_chunks()
                    u, jn = _sidecar_env(col, sc, n)
                else:
                    u, jn = _child_env(col, node, self.custom)
                if name in self.json_columns:
                    fail |= self._oracle_column(node, col, u, jn, parse_json=True)
                    continue
                try:
                    fail |= eval_node(node, col, u, jn, n, self.custom)
                except VectorizedUnsupported:
                    fail |= self._oracle_column(node, col, u, jn)
            else:
                if side in present:  # sidecar without a value column: null-only field
                    sc = batch[side]
                    if isinstance(sc, pa.ChunkedArray):
                        sc = sc.combine_chunks()
                    u, jn = _sidecar_env(None, sc, n)
                else:
                    u = np.ones(n, dtype=bool)
                    jn = np.zeros(n, dtype=bool)
                try:
                    fail |= eval_node(node, None, u, jn, n, self.custom)
                except VectorizedUnsupported:
                    fail |= self._oracle_column(node, None, u, jn)
        return fail

    def _oracle_column(self, node, col, undef, jsnull, parse_json: bool = False) -> np.ndarray:
        n = len(undef)
        out = np.zeros(n, dtype=bool)
        vals = col.to_pylist() if col is not None else [None] * n
        for i in range(n):
            if undef[i]:
                v = UNDEFINED
            elif jsnull[i]:
                v = None
            elif parse_json:
                v = _parse_json_value(vals[i])
            else:
                v = _decode_value(vals[i], node, self.custom)
            res = validate_internal(node, v, self.custom)
            out[i] = res["result"] == "fail"
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.fail_mask(batch)
        # drop parquet-inherited schema metadata (zero-copy): a pa.Schema
        # with a metadata dict is UNHASHABLE, which defeats Ray Data's
        # block-schema dedup and spams "Failed to hash the schemas" warnings
        batch = batch.replace_schema_metadata(None)
        return batch.append_column("valid", pa.array(~mask))


# ---------------------------------------------------------------------------
# row decoding (Arrow python values -> JS value domain) + violation explosion
# ---------------------------------------------------------------------------


def _parse_json_value(v: Any) -> Any:
    """Decode a JSON-encoded column value into the JS value domain; invalid
    JSON stays a raw string (and fails structural checks downstream, which
    is the correct verdict for a corrupt payload)."""
    if not isinstance(v, str):
        return v
    try:
        return json.loads(v)
    except (ValueError, TypeError):
        return v


def _decode_value(v: Any, node: Any, custom: dict) -> Any:
    """Convert a ``to_pylist`` value into the JS value domain for the oracle:
    Arrow nulls become undefined/null per the decode rule, recursively."""
    try:
        resolved = resolve_ref(node, custom)
    except VectorizedUnsupported:
        resolved = None  # recursive: decide nulls locally per union member
    if v is None:
        return UNDEFINED if null_decodes_as_undefined(node, custom) else None
    if isinstance(v, dict):
        out = {}
        sub_schema = None
        target = resolved if resolved is not None else node
        if S.is_obj(target):
            sub_schema = {(k[1:] if k.startswith("\\$") else k): s for k, s in target.items()}
        map_node = target.get("$map") if isinstance(target, dict) else None
        for k, x in v.items():
            if k.endswith("__present") and sub_schema and k[:-9] in sub_schema:
                continue  # presence sidecar — consumed by its base field
            child_node = sub_schema.get(k) if sub_schema else map_node
            pres_key = f"{k}__present"
            if sub_schema and k in sub_schema and pres_key in v:
                if not v[pres_key]:
                    continue  # sidecar False ⇒ undefined (absent)
                if x is None:
                    out[k] = None  # sidecar True + null ⇒ JS null
                    continue
            elif x is None and child_node is not None and null_decodes_as_undefined(child_node, custom):
                continue  # absent member (undefined) — omit the key
            if child_node is None:
                if x is None:
                    continue  # null in an unknown field decodes as absent
                out[k] = x
            else:
                out[k] = _decode_value(x, child_node, custom)
        return out
    if isinstance(v, list):
        target = resolved if resolved is not None else node
        # map columns decode as list of (key, value) tuples (possibly empty)
        if isinstance(target, dict) and target.get("$map") is not None:
            if not v or isinstance(v[0], tuple):
                return _decode_value(dict(v), target, custom)
        elem = target.get("$array") if isinstance(target, dict) else None
        if elem is None:
            return [_decode_value(x, "any", custom) for x in v]
        return [_decode_value(x, elem, custom) for x in v]
    if isinstance(v, tuple):  # single map entry — shouldn't reach here
        return v
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def decode_row(row: dict, fields: dict, custom: dict, exclude: tuple = (),
               json_columns: tuple = ()) -> dict:
    out = {}
    for name, v in row.items():
        if name in exclude:
            continue
        if name.endswith("__present") and name[:-9] in fields:
            continue  # presence sidecar — consumed by its base field below
        node = fields.get(name)
        if node is None:
            if v is None:
                continue  # Arrow null in an unknown column decodes as absent
            out[name] = v  # unknown own property → oracle emits Key-does-not-exist
            continue
        side = sidecar_name(name)
        if side in row:
            if not row[side]:
                continue  # sidecar False ⇒ undefined (absent)
            if v is None:
                out[name] = None  # sidecar True + Arrow null ⇒ JS null
                continue
        elif v is None and null_decodes_as_undefined(node, custom):
            continue
        if name in json_columns:
            out[name] = _parse_json_value(v)
        else:
            out[name] = _decode_value(v, node, custom)
    return out


def _float_repr_one(x) -> str:
    if x is None:
        return "None"
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    return repr(x)


def _float_reprs(arr: pa.Array) -> pa.Array:
    """``json.dumps``-identical reprs for a float array: Python ``repr`` IS
    json.dumps for finite floats (json calls float.__repr__); only the
    non-finite spellings differ (NaN/Infinity).  Dictionary-encodes first
    — violating values are low-cardinality in practice, so the Python
    repr runs once per DISTINCT value (~10× on real violation columns)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    dreprs = [_float_repr_one(v) for v in enc.dictionary.to_pylist()] + ["None"]
    idx = enc.indices.fill_null(len(dreprs) - 1)
    return pa.DictionaryArray.from_arrays(
        idx, pa.array(dreprs, pa.string())).cast(pa.string())


_JSON_SIMPLE_RE = r'^[ !#-\[\]-~]*$'  # printable ASCII minus `"` and `\`


def _string_reprs(arr: pa.Array) -> pa.Array:
    """``json.dumps``-identical reprs for a string array: strings needing
    no escapes (printable ASCII without quote/backslash) are quote-wrapped
    vectorized; the rest fall back to json.dumps per value.  Dictionary-
    encoded like ``_float_reprs`` (one repr per distinct value)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    d = enc.dictionary
    simple = _np(pc.match_substring_regex(d, _JSON_SIMPLE_RE), fill=False)
    dreprs = [f'"{s}"' if ok else json.dumps(s, default=str)
              for s, ok in zip(d.to_pylist(), simple)] + ["null"]
    idx = enc.indices.fill_null(len(dreprs) - 1)
    return pa.DictionaryArray.from_arrays(
        idx, pa.array(dreprs, pa.string())).cast(pa.string())


def _repr_value(v: Any) -> str:
    if v is UNDEFINED:
        return "undefined"
    try:
        return json.dumps(v, default=str)
    except (TypeError, ValueError):
        return str(v)


class _RowChunk:
    """A columnar run of violation rows: ``rows`` (np.int64 input-row
    indices), ``paths`` (a constant str, or one str per row), ``errors``
    (numpy str/object array), ``reprs`` (Arrow string array).  Appended to
    the same list as plain (row, path, error, repr) tuples; ``_emit``
    assembles both forms with one stable argsort instead of per-row
    Python tuples."""

    __slots__ = ("rows", "paths", "errors", "reprs")

    def __init__(self, rows, paths, errors, reprs):
        self.rows = rows
        self.paths = paths
        self.errors = errors
        self.reprs = reprs


def explode_violations(output: Any, path: str, rows: list) -> None:
    """Flatten a mirror output tree into (path, error, value_repr) rows."""
    if output is None:
        return
    if isinstance(output, dict):
        if "error" in output and "value" in output and not (set(output) - {"error", "value", "output"}):
            rows.append((path, output["error"], _repr_value(output["value"])))
            for sub in output.get("output") or []:
                explode_violations(sub, path, rows)
            return
        for k, sub in output.items():
            explode_violations(sub, f"{path}.{k}" if path else str(k), rows)
        return
    if isinstance(output, list):
        for i, sub in enumerate(output):
            explode_violations(sub, f"{path}[{i}]", rows)


class ViolationExploder:
    """map_batches stage: decode (usually pre-filtered failing) rows, run the
    oracle, emit flat violation rows ``(id..., path, error, value_repr)``."""

    def __init__(self, schema: Any, *, id_columns: tuple[str, ...] = (),
                 json_columns: tuple[str, ...] = (), emit_tree: bool = False):
        tv = TableValidator(schema, id_columns=id_columns, json_columns=json_columns)
        self.fields = tv.fields
        self.custom = tv.custom
        self.id_columns = tuple(id_columns)
        self.json_columns = tuple(json_columns)
        self.emit_tree = emit_tree
        self._root = dict(self.fields)
        self._exclude = ("valid",) + tuple(c for c in id_columns if c not in self.fields)
        # compiled closure tree (~4× the interpreter; differential-tested)
        from .compiled import compile_validator

        root = self._escaped_fields()
        if self.custom:
            root = {"$types": self.custom, **root}
        self._compiled = compile_validator(root)
        self._fast_plans = None if (emit_tree or json_columns) \
            else self._build_fast_plan()

    def _build_fast_plan(self) -> dict:
        """Per-field plans for the MASK-DRIVEN fast path: re-validate only
        cells the vectorized mask flags (compiled closure per failing CELL,
        per failing ELEMENT for eligible arrays) instead of decoding and
        tree-walking every failing row whole.  Exactness: per-field explode
        of the root object tree equals the concatenation of per-cell trees
        prefixed with the field path (the root is an object node, so the
        whole-row mirror tree is keyed by field; passing members contribute
        no rows)."""
        from .compiled import _compile

        plans = {}
        for name, node in self.fields.items():
            fn = _compile(node, self.custom, {})
            leaf = self._leaf_plan(node)
            elem = None
            if (isinstance(node, dict) and "$array" in node
                    and not any(k.startswith("$") for k in node if k != "$array")):
                e = node["$array"]
                try:
                    r = resolve_ref(e, self.custom)
                except Exception:
                    r = None
                # per-element refinement needs element outputs that are
                # never lists (the reference flattens one level,
                # validate.ts:123, which would shift later indices):
                # exclude array-typed and union elements
                if r is not None and not isinstance(r, list) and not (
                        isinstance(r, dict) and "$array" in r):
                    mplans = None
                    if S.is_obj(r):
                        # per-member plans: leaf/union-leaf members emit
                        # vectorized; others re-validate per failing CELL
                        mplans = {}
                        for k, v in r.items():
                            mk = k[1:] if k.startswith("\\$") else k
                            mplans[mk] = (v, self._leaf_plan(v),
                                          _compile(v, self.custom, {}))
                    elem = (e, _compile(e, self.custom, {}),
                            node.get("minLength") or 0,
                            node.get("maxLength") or MAX_SAFE_INTEGER,
                            mplans)
            plans[name] = (fn, elem, leaf)
        return plans

    @staticmethod
    def _leaf_plan(node):
        """Fully-vectorized emission descriptor for flat LEAF constraints
        ($number bounds / $enum / $string) — high-fail-rate tables (80 %+
        failing rows exist) make even per-failing-cell Python the
        bottleneck; leaves need no tree walk at all.  Category order
        mirrors the oracle exactly (oracle.py:118-126, 133-139, 142-154)."""
        from .oracle import enum_error

        if isinstance(node, list):
            # ordered union of '?' / 'null' / AT MOST ONE leaf spec: a
            # failing defined cell emits a fixed row sequence — E_ONEOF,
            # then one row per branch in order (oracle.py:168-182)
            branches = []
            leafs = 0
            for b in node:
                if b == "?":
                    branches.append(("?",))
                elif b == "null":
                    branches.append(("null",))
                else:
                    sub = ViolationExploder._leaf_plan(b)
                    if sub is None or sub[0] == "union":
                        return None
                    branches.append(sub)
                    leafs += 1
            if leafs > 1 or not branches:
                return None
            return ("union", branches)
        if not isinstance(node, dict):
            return None
        keys = {k for k in node if k not in ("name", "description")}
        if keys == {"$number"} or keys == {"$number", "postfix"}:
            spec = node["$number"]
            if set(spec) <= {"min", "max", "step"} and not spec.get("step"):
                return ("number", spec.get("min"), spec.get("max"))
        if keys == {"$enum"}:
            enums = node["$enum"]
            if all(isinstance(x, str) for x in enums):
                return ("enum", enum_error(enums))
        if keys == {"$string"} or keys == {"$string", "select"}:
            spec = node["$string"]
            if set(spec) <= {"minLength", "maxLength", "regex"}:
                return ("string", spec)
        return None

    @staticmethod
    def _leaf_error_vec(leaf, taken, col_type):
        """One error string per DEFINED failing cell (numpy category
        select), or None when the column type doesn't fit the plan."""
        from .oracle import (E_MAX, E_MIN, E_NOT_NUMBER, E_NOT_STRING,
                             E_REGEX, E_STR_LONG, E_STR_SHORT)

        kind = leaf[0]
        if kind == "number":
            if not (pa.types.is_integer(col_type) or pa.types.is_floating(col_type)):
                return None
            _, mn, mx = leaf
            v = _np(taken, fill=0).astype(np.float64)
            conds, outs = [~np.isfinite(v)], [E_NOT_NUMBER]
            if mn is not None:
                conds.append(v < mn)
                outs.append(E_MIN)
            if mx is not None:
                conds.append(v > mx)
                outs.append(E_MAX)
            return np.select(conds, outs, default="")
        if not (pa.types.is_string(col_type) or pa.types.is_large_string(col_type)):
            return None
        if kind == "enum":
            return np.full(len(taken), leaf[1], dtype=object)
        # kind == "string"
        spec = leaf[1]
        n = len(taken)
        conds, outs = [np.zeros(n, dtype=bool)], [E_NOT_STRING]
        if spec.get("minLength") or spec.get("maxLength"):
            l16 = _utf16_lengths(taken)
            if spec.get("minLength"):
                conds.append(l16 < spec["minLength"])
                outs.append(E_STR_SHORT)
            if spec.get("maxLength"):
                conds.append(l16 > spec["maxLength"])
                outs.append(E_STR_LONG)
        if spec.get("regex"):
            conds.append(_regex_fail_mask(taken, spec["regex"]))
            outs.append(E_REGEX)
        return np.select(conds, outs, default="")

    @staticmethod
    def _reprs_for(taken, col_type) -> pa.Array | None:
        if pa.types.is_floating(col_type):
            return _float_reprs(taken)
        if pa.types.is_integer(col_type):
            return pc.cast(taken, pa.string())
        if pa.types.is_string(col_type) or pa.types.is_large_string(col_type):
            return _string_reprs(taken)
        return None

    def _struct_member_rows(self, name, mplans, values, offsets, rowof_all,
                            active, eu, ejn, rows) -> np.ndarray:
        """Vectorized per-MEMBER violation emission for failing struct
        elements of an array field: each member's fail mask picks its
        failing cells; leaf/union-leaf members emit via numpy templates,
        the rest re-validate per failing cell through the member's compiled
        tree.  Returns the residual mask of active elements NOT fully
        explained member-wise (null/undefined elements) — those fall back
        to whole-element validation.  Emission equivalence: the element is
        a plain object node, so its mirror tree is keyed by member and
        passing members contribute no rows (same argument as the top-level
        field split)."""
        from .oracle import E_UNKNOWN_KEY

        nvals = len(values)
        edefined = ~eu & ~ejn
        explained = np.zeros(nvals, dtype=bool)

        def _path(e):
            return f"{name}[{int(e) - int(offsets[rowof_all[e]])}]"

        sidecars = {}
        for f in values.type:
            if f.name.endswith("__present") and f.name[:-9] in mplans:
                sc = pc.struct_field(values, f.name)
                sidecars[f.name[:-9]] = sc.combine_chunks() \
                    if isinstance(sc, pa.ChunkedArray) else sc
        # unknown fields: non-null cells fail their element (closedness)
        for f in values.type:
            if f.name in mplans or (f.name.endswith("__present")
                                    and f.name[:-9] in mplans):
                continue
            ch = pc.struct_field(values, f.name)
            if isinstance(ch, pa.ChunkedArray):
                ch = ch.combine_chunks()
            nn = ~_null_mask(ch) & edefined
            explained |= nn
            emit = np.nonzero(nn & active)[0]
            if len(emit):
                vals_u = ch.take(pa.array(emit)).to_pylist()
                rows.extend((int(rowof_all[e]), f"{_path(e)}.{f.name}",
                             E_UNKNOWN_KEY, _repr_value(v))
                            for e, v in zip(emit, vals_u))
        for mk, (m_node, m_leaf, m_fn) in mplans.items():
            idx_f = values.type.get_field_index(mk)
            ch = None
            if idx_f >= 0:
                ch = pc.struct_field(values, idx_f)
                if isinstance(ch, pa.ChunkedArray):
                    ch = ch.combine_chunks()
            if mk in sidecars:
                mu, mjn = _sidecar_env(ch, sidecars[mk], nvals)
            elif ch is not None:
                mu, mjn = _child_env(ch, m_node, self.custom)
            else:
                mu = np.ones(nvals, dtype=bool)
                mjn = np.zeros(nvals, dtype=bool)
            m_mask = eval_node(m_node, ch, mu, mjn, nvals, self.custom)
            explained |= m_mask & edefined
            emit = np.nonzero(m_mask & active & edefined)[0]
            if not len(emit):
                continue
            mdef = ~mu & ~mjn
            vecm = emit[mdef[emit]]
            done_vec = False
            if m_leaf is not None and ch is not None and len(vecm):
                done_vec = self._leaf_rows(
                    m_leaf, ch, vecm, rows, rowof_all[vecm],
                    [f"{_path(e)}.{mk}" for e in vecm])
            cell_cells = emit[~mdef[emit]] if done_vec else emit
            if len(cell_cells):
                raws = (ch.take(pa.array(cell_cells)).to_pylist()
                        if ch is not None else [None] * len(cell_cells))
                for e, raw in zip(cell_cells, raws):
                    if mu[e]:
                        v = UNDEFINED
                    elif mjn[e]:
                        v = None
                    else:
                        v = _decode_value(raw, m_node, self.custom)
                    tree = m_fn(v)
                    if tree["result"] == "fail":
                        sub: list = []
                        explode_violations(tree["output"],
                                           f"{_path(e)}.{mk}", sub)
                        rows.extend((int(rowof_all[e]), p, er, vr)
                                    for p, er, vr in sub)
        return active & ~(explained & edefined)

    def _leaf_rows(self, leaf, col, vec_idx, rows, row_ids, paths):
        """Emit violation rows for DEFINED failing cells of a leaf/union-leaf
        plan as ONE columnar chunk (``_RowChunk``) — the tuple-per-row path
        spent ~80 % of exploder time materializing/sorting/transposing
        Python tuples at 770k rows (profiled sf0.1 lineitem).  ``row_ids``
        (np.int64) / ``paths`` (constant str, or one str per cell) give the
        output row index and path per cell (a flat field uses its own index
        and a constant path; a struct element uses the parent row and an
        indexed path)."""
        from .oracle import E_NOT_NULL, E_NOT_UNDEFINED, E_ONEOF

        taken = col.take(pa.array(vec_idx))
        reprs = self._reprs_for(taken, col.type)
        if reprs is None:
            return False
        n = len(taken)
        if leaf[0] == "union":
            seqs = []  # one error column per emitted row position
            for b in leaf[1]:
                if b[0] == "?":
                    seqs.append(np.full(n, E_NOT_UNDEFINED, dtype=object))
                elif b[0] == "null":
                    seqs.append(np.full(n, E_NOT_NULL, dtype=object))
                else:
                    ev = self._leaf_error_vec(b, taken, col.type)
                    if ev is None:
                        return False
                    seqs.append(ev.astype(object))
            seqs.insert(0, np.full(n, E_ONEOF, dtype=object))
            # cell-major interleave: cell0's E_ONEOF + per-branch rows,
            # then cell1's, ... (matches the oracle's emission order)
            k = len(seqs)
            rep_idx = np.repeat(np.arange(n, dtype=np.int64), k)
            rows.append(_RowChunk(
                np.repeat(np.asarray(row_ids, dtype=np.int64), k),
                paths if isinstance(paths, str)
                else np.repeat(np.asarray(paths, dtype=object), k),
                np.stack(seqs, axis=1).ravel(),
                reprs.take(pa.array(rep_idx))))
            return True
        errs = self._leaf_error_vec(leaf, taken, col.type)
        if errs is None:
            return False
        rows.append(_RowChunk(np.asarray(row_ids, dtype=np.int64),
                              paths, errs, reprs))
        return True

    def _escaped_fields(self) -> dict:
        """Re-escape data keys starting with '$' back to schema form."""
        return {("\\$" + k[1:] if k.startswith("$") else k): v
                for k, v in self.fields.items()}

    def result_for_row(self, row: dict) -> dict:
        """Full result ({result, output}) — the reference's exact
        mirror-shaped tree (validate.ts:14-17) for golden comparisons."""
        decoded = decode_row(row, self.fields, self.custom, exclude=self._exclude,
                             json_columns=self.json_columns)
        return self._compiled(decoded)

    def violations_for_row(self, row: dict) -> list[tuple[str, str, str]]:
        res = self.result_for_row(row)
        out: list = []
        if res["result"] == "fail":
            explode_violations(res["output"], "", out)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit_tree:
            return self._tree_table(batch)
        if self._fast_plans is not None:
            try:
                return self._emit(batch, self._fast_rows(batch))
            except VectorizedUnsupported:
                pass  # a field's mask isn't vectorizable → row oracle
        rows: list[tuple[int, str, str, str]] = []
        for i, row in enumerate(batch.to_pylist()):
            for path, error, value_repr in self.violations_for_row(
                {k: v for k, v in row.items() if k not in ("valid",)}
            ):
                rows.append((i, path, error, value_repr))
        return self._emit(batch, rows)

    def _fast_rows(self, batch: pa.Table) -> list[tuple[int, str, str, str]]:
        """Mask-driven violation rows: vectorized per-field fail masks pick
        the failing cells; only those are decoded and re-validated through
        the compiled tree (per element for eligible arrays).  Emits the
        same (path, error, value_repr) rows as the whole-row oracle."""
        from .oracle import E_UNKNOWN_KEY

        n = batch.num_rows
        present = set(batch.column_names)
        side_names = {sidecar_name(f) for f in self.fields}
        rows: list[tuple[int, str, str, str]] = []

        def _col(cname):
            c = batch[cname]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        # closedness: unknown own (non-null) members (validate.ts:137-141)
        for cname in batch.column_names:
            if (cname in self.fields or cname in self.id_columns
                    or cname in side_names or cname == "valid"):
                continue
            col = _col(cname)
            nn = ~_null_mask(col)
            if nn.any():
                idx = np.nonzero(nn)[0]
                vals = col.take(pa.array(idx)).to_pylist()
                rows.extend((int(i), cname, E_UNKNOWN_KEY, _repr_value(v))
                            for i, v in zip(idx, vals))

        for name, node in self.fields.items():
            fn, elem_plan, leaf = self._fast_plans[name]
            side = sidecar_name(name)
            col = _col(name) if name in present else None
            sc = _col(side) if side in present else None
            if col is not None:
                u, jn = (_sidecar_env(col, sc, n) if sc is not None
                         else _child_env(col, node, self.custom))
            elif sc is not None:
                u, jn = _sidecar_env(None, sc, n)
            else:
                u, jn = np.ones(n, dtype=bool), np.zeros(n, dtype=bool)
            mask = eval_node(node, col, u, jn, n, self.custom)
            idx = np.nonzero(mask)[0]
            if not len(idx):
                continue

            cell_idx = idx
            if leaf is not None and col is not None:
                defined = ~u[idx] & ~jn[idx]
                vec_idx = idx[defined]
                if len(vec_idx) and self._leaf_rows(
                        leaf, col, vec_idx, rows, vec_idx, name):
                    cell_idx = idx[~defined]
            if elem_plan is not None and col is not None and (
                    pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
                e_node, e_fn, mn, mx, mplans = elem_plan
                lengths, values, offsets = _list_parts(col)
                # elem-mode rows: defined, non-null, bounds pass — their
                # rows come from failing ELEMENTS only (bounds-failing /
                # null cells fail-fast with a single cell-level row)
                elem_mode = mask & ~u & ~jn & (lengths >= mn) & (lengths <= mx)
                cell_idx = idx[~elem_mode[idx]]
                if elem_mode.any():
                    nvals = len(values)
                    eu, ejn = _child_env(values, e_node, self.custom)
                    efail = eval_node(e_node, values, eu, ejn, nvals,
                                      self.custom)
                    rowof_all = np.repeat(np.arange(n), lengths)
                    active = efail & elem_mode[rowof_all]
                    resid = active
                    if active.any() and mplans is not None and \
                            pa.types.is_struct(values.type):
                        resid = self._struct_member_rows(
                            name, mplans, values, offsets, rowof_all,
                            active, eu, ejn, rows)
                    e_idx = np.nonzero(resid)[0]
                    if len(e_idx):
                        rowof = rowof_all[e_idx]
                        evals = values.take(pa.array(e_idx)).to_pylist()
                        for j, r, ev_raw in zip(e_idx, rowof, evals):
                            ev = _decode_value(ev_raw, e_node, self.custom)
                            tree = e_fn(ev)
                            if tree["result"] == "fail":
                                sub: list = []
                                explode_violations(
                                    tree["output"],
                                    f"{name}[{int(j) - int(offsets[r])}]", sub)
                                rows.extend((int(r), p, e, v)
                                            for p, e, v in sub)
            if len(cell_idx):
                raw = (col.take(pa.array(cell_idx)).to_pylist()
                       if col is not None else None)
                sraw = (sc.take(pa.array(cell_idx)).to_pylist()
                        if sc is not None else None)
                for k, i in enumerate(cell_idx):
                    minirow = {name: raw[k] if raw is not None else None}
                    if sraw is not None:
                        minirow[side] = sraw[k]
                    decoded = decode_row(minirow, {name: node}, self.custom)
                    tree = fn(decoded.get(name, UNDEFINED))
                    if tree["result"] == "fail":
                        sub = []
                        explode_violations(tree["output"], name, sub)
                        rows.extend((int(i), p, e, v) for p, e, v in sub)
        # input-row grouping happens columnar in _emit (stable argsort over
        # the concatenated chunk row indices — same permutation as the old
        # flat-tuple stable sort, without materializing per-row tuples)
        return rows

    def _emit(self, batch: pa.Table, rows: list) -> pa.Table:
        """Assemble the output table from a mixed list of ``_RowChunk`` runs
        and plain (row, path, error, repr) tuples.  A stable argsort over
        the concatenated row indices reproduces the old flat-tuple stable
        sort exactly (list order = old append order), without per-row
        Python tuples on the vectorized paths."""
        def id_type(c: str):
            idx = batch.schema.get_field_index(c)
            return batch.schema.field(idx).type if idx >= 0 else pa.string()

        r_parts: list[np.ndarray] = []
        p_parts: list[pa.Array] = []
        e_parts: list[pa.Array] = []
        v_parts: list[pa.Array] = []

        def flush(buf: list) -> None:
            if not buf:
                return
            ri, paths, errs, reprs = zip(*buf)
            r_parts.append(np.fromiter(ri, dtype=np.int64, count=len(buf)))
            p_parts.append(pa.array(paths, pa.string()))
            e_parts.append(pa.array(errs, pa.string()))
            v_parts.append(pa.array(reprs, pa.string()))
            buf.clear()

        buf: list = []
        for entry in rows:
            if not isinstance(entry, _RowChunk):
                buf.append(entry)
                continue
            flush(buf)
            r_parts.append(entry.rows)
            if isinstance(entry.paths, str):
                # constant path: one-element dictionary take (C-speed)
                p_parts.append(pa.array([entry.paths], pa.string()).take(
                    pa.array(np.zeros(len(entry.rows), dtype=np.int32))))
            else:
                p_parts.append(pa.array(entry.paths, pa.string()))
            e_parts.append(entry.errors if isinstance(entry.errors, pa.Array)
                           else pa.array(entry.errors, pa.string()))
            v_parts.append(entry.reprs if isinstance(entry.reprs, pa.Array)
                           else pa.array(entry.reprs, pa.string()))
        flush(buf)

        def cat(parts: list) -> pa.Array:
            if not parts:
                return pa.array([], pa.string())
            norm = [p.combine_chunks() if isinstance(p, pa.ChunkedArray)
                    else p for p in parts]
            return norm[0] if len(norm) == 1 else pa.concat_arrays(norm)

        row_all = (np.concatenate(r_parts) if len(r_parts) > 1
                   else (r_parts[0] if r_parts else np.empty(0, np.int64)))
        paths_a, errs_a, reprs_a = cat(p_parts), cat(e_parts), cat(v_parts)
        if len(row_all) and not np.all(row_all[:-1] <= row_all[1:]):
            order = np.argsort(row_all, kind="stable")
            row_all = row_all[order]
            oi = pa.array(order)
            paths_a = paths_a.take(oi)
            errs_a = errs_a.take(oi)
            reprs_a = reprs_a.take(oi)
        row_idx = pa.array(row_all)
        cols = {}
        for c in self.id_columns:
            if c in batch.column_names:
                col = batch[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[c] = col.take(row_idx)
            else:
                cols[c] = pa.nulls(len(row_all), id_type(c))
        cols["path"] = paths_a
        cols["error"] = errs_a
        cols["value_repr"] = reprs_a
        return pa.table(cols)

    def _tree_table(self, batch: pa.Table) -> pa.Table:
        """One row per input doc: (ids..., result, output_json) — the exact
        reference mirror tree, JSON.stringify-serialized."""
        from .values import js_jsonable

        def id_type(c: str):
            idx = batch.schema.get_field_index(c)
            return batch.schema.field(idx).type if idx >= 0 else pa.string()

        ids = {c: [] for c in self.id_columns}
        results: list[str] = []
        outputs: list[str] = []
        for row in batch.to_pylist():
            res = self.result_for_row(row)
            for c in self.id_columns:
                ids[c].append(row.get(c))
            results.append(res["result"])
            outputs.append(json.dumps(js_jsonable(res["output"]), separators=(",", ":"),
                                      default=str))
        return pa.table({**{c: pa.array(v, type=id_type(c)) for c, v in ids.items()},
                         "result": pa.array(results, pa.string()),
                         "output_json": pa.array(outputs, pa.string())})
