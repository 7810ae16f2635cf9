"""Differential tests: vectorized fail-mask vs the row oracle on Arrow
tables (the oracle itself is differential-tested against the real reference).
"""

import json
import random

import numpy as np
import pyarrow as pa
import pytest

from yaschva_ray import validate
from yaschva_ray.generate import generate
from yaschva_ray.typegen import schema_to_arrow
from yaschva_ray.values import UNDEFINED
from yaschva_ray.vectorized import TableValidator, ViolationExploder, decode_row

F0_SCHEMA = {
    "$types": {"$span": {
        "kind": {"$enum": ["text", "image", "audio", "video"]},
        "text": ["?", {"$string": {"minLength": 1, "maxLength": 65536}}],
        "media_ref": ["?", {"$string": {"regex": "^media://[a-z0-9/._-]+$"}}],
        "offset": {"$number": {"min": 0, "max": 9007199254740991}},
    }},
    "doc_id": {"$string": {"minLength": 1, "regex": "^doc-[0-9a-f]{12}$"}},
    "spans": {"$array": "$span", "minLength": 1, "maxLength": 4096},
}


def clean(o):
    if isinstance(o, dict):
        return {k: clean(x) for k, x in o.items() if x is not UNDEFINED}
    if isinstance(o, list):
        return [None if x is UNDEFINED else clean(x) for x in o]
    return o


def spans_table(rows):
    t = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int64()),
    ])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows], pa.list_(t)),
    })


def good_doc(i):
    return {
        "doc_id": f"doc-{i:012x}",
        "spans": [
            {"kind": "text", "text": f"hello world {i}", "media_ref": None, "offset": 0},
            {"kind": "image", "text": None, "media_ref": f"media://img/{i}.png", "offset": 14},
        ],
    }


def test_flagship_mask_and_violations():
    rows = [good_doc(i) for i in range(50)]
    # targeted mutations, one constraint each
    rows[3]["spans"][0]["kind"] = "gif"                       # bad enum
    rows[7]["spans"][1]["media_ref"] = "http://nope"          # regex fail
    rows[11]["spans"][0]["offset"] = -4                       # below min
    rows[19]["doc_id"] = "DOC-19"                             # doc_id regex fail
    rows[23]["spans"] = []                                    # array minLength
    rows[29]["spans"][0]["text"] = ""                         # string minLength
    bad = {3, 7, 11, 19, 23, 29}

    tv = TableValidator(F0_SCHEMA)
    out = tv(spans_table(rows))
    valid = out["valid"].to_pylist()
    assert {i for i, v in enumerate(valid) if not v} == bad

    ex = ViolationExploder(F0_SCHEMA, id_columns=("doc_id",))
    failing = out.filter(pa.array([not bool(v) for v in valid]))
    vio = ex(failing)
    got = {(r["doc_id"], r["path"], r["error"]) for r in vio.to_pylist()}
    assert ("doc-000000000003", "spans[0].kind",
            "Value needs to be one of the following: [text, image, audio, video] ") in got
    assert ("doc-000000000007", "spans[1].media_ref",
            "Did not match any from the listed types") in got
    assert ("doc-000000000017", "spans", "Array length needs to be between 1 - 4096") in got
    assert ("DOC-19", "doc_id", "String did not match required regex") in got


def test_mask_matches_oracle_on_random_tables():
    rng = random.Random(123)
    schemas = [
        {"a": "string", "b": "integer", "c": "boolean"},
        {"a": ["?", "string"], "b": {"$number": {"min": 0, "max": 10}}},
        {"e": {"$enum": ["x", "y", "z"]}},
        {"s": {"$string": {"minLength": 2, "maxLength": 8}}},
        {"r": {"$string": {"regex": "^ab+c$"}}},
        {"arr": {"$array": "integer", "minLength": 1, "maxLength": 4}},
        {"arr": {"$array": ["?", "string"]}},
        {"o": {"x": "number", "y": ["?", "boolean"]}},
        {"m": {"$map": "integer", "minLength": 1}},
        {"m": {"$map": "string", "regex": "^k"}},
        {"u": ["integer", "string"]},  # json-ish: built as string column below
        {"nested": {"$array": {"v": {"$enum": ["p", "q"]}, "w": ["?", "integer"]}}},
    ]
    for schema in schemas:
        arrow_schema = schema_to_arrow(schema)
        rows = []
        for i in range(60):
            doc = clean(generate(schema, {"maxStringLength": 6, "arrayMax": 3, "mapMax": 3},
                                 rng=rng))
            rows.append(doc)
        # mutations: random type-compatible corruption
        table = _encode(rows, arrow_schema, rng)
        tv = TableValidator(schema)
        mask = tv.fail_mask(table)
        # oracle comparison on the decoded rows
        for i, row in enumerate(table.to_pylist()):
            decoded = decode_row(row, tv.fields, tv.custom)
            expected = validate(schema, decoded)["result"] == "fail"
            assert mask[i] == expected, (
                schema, row, decoded, mask[i], expected)


def _encode(rows, arrow_schema, rng):
    cols = {}
    for field in arrow_schema:
        vals = [r.get(field.name) for r in rows]
        if field.metadata and field.metadata.get(b"encoding") == b"json":
            vals = [json.dumps(v) if v is not None else None for v in vals]
            cols[field.name] = pa.array(vals, pa.string())
        else:
            # corrupt ~20% of values within the same Arrow type
            for i in range(len(vals)):
                if rng.random() < 0.2:
                    vals[i] = _corrupt(vals[i], field.type, rng)
            cols[field.name] = pa.array(vals, field.type)
    return pa.table(cols)


def _corrupt(v, typ, rng):
    if pa.types.is_string(typ):
        return rng.choice(["", "zz", "abbbc", "ab", "nope nope nope nope", None])
    if pa.types.is_integer(typ):
        return rng.choice([-999, 0, 99999, None])
    if pa.types.is_floating(typ):
        return rng.choice([-1.5, 11.0, float("nan"), float("inf"), None])
    if pa.types.is_boolean(typ):
        return rng.choice([True, False, None])
    if pa.types.is_list(typ):
        return rng.choice([[], None, v])
    if pa.types.is_map(typ):
        return rng.choice([[], None, v])
    if pa.types.is_struct(typ):
        return None
    return v


def test_json_fallback_column():
    # union of incompatible types → string column validated via oracle fallback?
    # (vectorized treats a string column against ['integer','string'] union:
    # the string branch passes on the Arrow level — intended typed-column
    # semantics; true JSON columns go through ViolationExploder/decode.)
    schema = {"u": ["integer", "string"]}
    table = pa.table({"u": pa.array(["hi", "42", None])})
    tv = TableValidator(schema)
    mask = tv.fail_mask(table)
    assert list(mask) == [False, False, True]  # null → undefined → both branches fail


def test_missing_column_is_undefined():
    schema = {"a": "string", "b": ["?", "string"]}
    table = pa.table({"a": pa.array(["x", "y"])})
    tv = TableValidator(schema)
    assert list(tv.fail_mask(table)) == [False, False]
    table2 = pa.table({"b": pa.array(["x", None])})
    assert list(TableValidator(schema).fail_mask(table2)) == [True, True]  # a missing


def test_unknown_column_fails_and_reports():
    schema = {"a": "string"}
    table = pa.table({"a": pa.array(["x"]), "zz": pa.array([1])})
    tv = TableValidator(schema)
    assert list(tv.fail_mask(table)) == [True]
    ex = ViolationExploder(schema)
    vio = ex(table).to_pylist()
    assert any(v["error"] == "Key does not exist on validator" and v["path"] == "zz" for v in vio)


def test_recursive_type_falls_back_to_oracle():
    schema = {
        "$types": {"$tree": {"v": "string", "kids": {"$array": "$tree"}}},
        "root": "$tree",
    }
    # encode as struct one level wouldn't work — use JSON column semantics via
    # python objects in an Arrow table is not possible; recursion exercised at
    # fail_mask level through the oracle fallback on a plain string column.
    table = pa.table({"root": pa.array([json.dumps({"v": "a", "kids": []})])})
    tv = TableValidator(schema)
    mask = tv.fail_mask(table)
    # a JSON string is NOT the tree object — fails (string ≠ object)
    assert list(mask) == [True]


def test_utf16_length_vectorized():
    schema = {"s": {"$string": {"maxLength": 2}}}
    table = pa.table({"s": pa.array(["ab", "abc", "\U0001F600\U0001F600", "\U0001F600", "é"])})
    mask = TableValidator(schema).fail_mask(table)
    # emoji counts as 2 UTF-16 units: "😀😀" = 4 > 2 fails; "😀" = 2 passes
    assert list(mask) == [False, True, True, False, False]


def test_json_column_validation():
    # JSON-encoded column (opt-in) parsed and validated by the oracle path
    schema = {"id": "any", "payload": {"a": "number", "b": ["?", "string"]}}
    table = pa.table({
        "id": pa.array([1, 2, 3, 4, 5]),
        "payload": pa.array([
            '{"a": 1}', '{"a": 1, "b": "x"}', '{"a": "no"}',
            'not json at all', '{"a": 2, "zz": 1}',
        ]),
    })
    from yaschva_ray.vectorized import TableValidator

    tv = TableValidator(schema, json_columns=("payload",))
    mask = tv.fail_mask(table)
    assert list(mask) == [False, False, True, True, True]


def test_exploder_tree_mode_matches_oracle():
    from yaschva_ray.vectorized import ViolationExploder

    schema = {"id": "any", "v": {"$number": {"min": 0, "max": 5}},
              "s": ["?", {"$string": {"minLength": 2}}]}
    table = pa.table({"id": pa.array([1, 2]),
                      "v": pa.array([3.0, 9.0]),
                      "s": pa.array(["ok", "x"])})
    ex = ViolationExploder(schema, id_columns=("id",), emit_tree=True)
    out = ex(table).to_pylist()
    assert out[0]["result"] == "pass"
    assert out[1]["result"] == "fail"
    tree = json.loads(out[1]["output_json"])
    assert tree["v"] == {"error": "Value is bigger than the required maximum", "value": 9.0}
    # union failure payload present for the short string
    assert tree["s"]["error"] == "Did not match any from the listed types"


def test_lance_gate():
    from yaschva_ray.sources import have_lance, read_docs

    if not have_lance():
        with pytest.raises(ImportError, match="Lance"):
            read_docs("/tmp/whatever.lance")


def test_multi_dollar_key_dispatch_order():
    # A node with several $-keys dispatches like the reference:
    # $array wins over $enum (validate.ts:233 before :235)
    schema = {"x": {"$array": "string", "$enum": ["a"]}}
    table = pa.table({"x": pa.array([["a", "b"], None], pa.list_(pa.string()))})
    mask = TableValidator(schema).fail_mask(table)
    assert list(mask) == [False, True]  # validated as array, not enum
    # oracle agrees
    assert validate(schema, {"x": ["a", "b"]})["result"] == "pass"
    assert validate(schema, {"x": "a"})["result"] == "fail"  # enum would pass "a"
    # $number wins over $type (validate.ts:241 before :243)
    schema2 = {"y": {"$number": {"min": 5}, "$type": "string"}}
    table2 = pa.table({"y": pa.array([7.0, 1.0])})
    assert list(TableValidator(schema2).fail_mask(table2)) == [False, True]
    assert validate(schema2, {"y": 7})["result"] == "pass"
    assert validate(schema2, {"y": "hello"})["result"] == "fail"


# --- round 2: unknown-key null rule, presence sidecars, map slicing --------


def test_unknown_column_null_decodes_absent():
    # an Arrow null in an unknown column decodes as undefined (absent member)
    # under the decode rule, so only rows with an own (non-null) value fail
    # (validate.ts:137-141)
    schema = {"a": "string"}
    table = pa.table({"a": pa.array(["x", "y", "z"]),
                      "zz": pa.array([1, None, None], pa.int64())})
    tv = TableValidator(schema)
    assert list(tv.fail_mask(table)) == [True, False, False]
    # the exploder (oracle path) agrees row by row
    ex = ViolationExploder(schema)
    for row, expect_fail in zip(table.to_pylist(), [True, False, False]):
        res = ex.result_for_row(row)
        assert (res["result"] == "fail") == expect_fail


def test_unknown_struct_field_null_vs_value():
    schema = {"s": {"a": "string"}}
    t = pa.struct([("a", pa.string()), ("extra", pa.int64())])
    table = pa.table({"s": pa.array(
        [{"a": "x", "extra": 1}, {"a": "y", "extra": None}, None], t)})
    mask = TableValidator(schema).fail_mask(table)
    # row0: own 'extra' property -> fail; row1: extra is null -> absent -> pass;
    # row2: struct itself null -> undefined -> fail ('s' is required)
    assert list(mask) == [True, False, True]
    ex = ViolationExploder(schema)
    for row, expect_fail in zip(table.to_pylist(), [True, False, True]):
        assert (ex.result_for_row(row)["result"] == "fail") == expect_fail


def test_mask_matches_oracle_with_extra_columns_fuzz():
    # fuzzed tables with extra null/non-null columns: mask verdicts must
    # equal per-row oracle verdicts (VERDICT round-1 item 3)
    rng = random.Random(1717)
    schema = {"a": "string", "b": ["?", {"$number": {"min": 0}}]}
    for _ in range(20):
        n = rng.randint(1, 8)
        extra = [rng.choice([None, rng.randint(0, 9)]) for _ in range(n)]
        table = pa.table({
            "a": pa.array([rng.choice(["ok", None]) for _ in range(n)], pa.string()),
            "b": pa.array([rng.choice([None, 1.5, -2.0]) for _ in range(n)]),
            "junk": pa.array(extra, pa.int64()),
        })
        tv = TableValidator(schema)
        ex = ViolationExploder(schema)
        mask = tv.fail_mask(table)
        for i, row in enumerate(table.to_pylist()):
            assert (ex.result_for_row(row)["result"] == "fail") == bool(mask[i]), (
                row, bool(mask[i]))


def test_presence_sidecar_top_level():
    # FIXTURES.md: a boolean `<field>__present` sidecar lets one column carry
    # both JS null and undefined (reference validate.ts:50-54)
    table = pa.table({
        "a": pa.array([None, None, "x"], pa.string()),
        "a__present": pa.array([False, True, True]),
    })
    # ['?','null','string']: all three decode states pass
    tv = TableValidator({"a": ["?", "null", "string"]})
    assert list(tv.fail_mask(table)) == [False, False, False]
    # ['null','string']: sidecar False -> undefined -> fail
    tv2 = TableValidator({"a": ["null", "string"]})
    assert list(tv2.fail_mask(table)) == [True, False, False]
    # ['?','string']: sidecar True + Arrow null -> JS null -> fail
    tv3 = TableValidator({"a": ["?", "string"]})
    assert list(tv3.fail_mask(table)) == [False, True, False]
    # exploder path decodes identically (sidecar consumed, not reported)
    ex = ViolationExploder({"a": ["null", "string"]})
    rows = table.to_pylist()
    assert ex.result_for_row(rows[0])["result"] == "fail"
    assert ex.result_for_row(rows[1])["result"] == "pass"
    assert ex.result_for_row(rows[2])["result"] == "pass"
    vio = ex(table).to_pylist()
    assert all(v["path"] != "a__present" for v in vio)


def test_presence_sidecar_struct_field():
    t = pa.struct([("x", pa.string()), ("x__present", pa.bool_())])
    table = pa.table({"s": pa.array(
        [{"x": None, "x__present": False},
         {"x": None, "x__present": True},
         {"x": "v", "x__present": True}], t)})
    schema = {"s": {"x": ["?", "null", "string"]}}
    assert list(TableValidator(schema).fail_mask(table)) == [False, False, False]
    schema2 = {"s": {"x": ["null", "string"]}}
    assert list(TableValidator(schema2).fail_mask(table)) == [True, False, False]
    ex = ViolationExploder(schema2)
    verdicts = [ex.result_for_row(r)["result"] for r in table.to_pylist()]
    assert verdicts == ["fail", "pass", "pass"]


def test_map_eval_on_sliced_array():
    # regression (round-1 ADVICE): eval_node on a sliced MapArray must use
    # physical offsets — keys/items of a slice still cover the full child
    from yaschva_ray.vectorized import _child_env, eval_node

    node = {"$map": {"$number": {"min": 0}}}
    arr = pa.array([{"a": -5}, {"b": 3}, {"c": -7}],
                   pa.map_(pa.string(), pa.int64()))
    sl = arr.slice(1, 2)
    u, jn = _child_env(sl, node, {})
    fail = eval_node(node, sl, u, jn, len(sl), {})
    assert list(fail) == [False, True]


def test_and_with_array_member():
    # JS isObj accepts arrays; the reference spreads them as index keys
    # (validationTypes.ts:39-40, validate.ts:43-47)
    from yaschva_ray.schema import combine_validation_objects

    out = combine_validation_objects(
        {"$and": [{"a": "string"}, ["number", "boolean"]]}, {}, lambda x: x)
    assert out.get("pass") == {"a": "string", "0": "number", "1": "boolean"}
    # oracle validates against the merged object
    assert validate({"$and": [{"a": "string"}, ["number"]]},
                    {"a": "x", "0": 5})["result"] == "pass"
    assert validate({"$and": [{"a": "string"}, ["number"]]},
                    {"a": "x"})["result"] == "fail"  # '0' key required
    # non-object, non-array member still errors
    assert validate({"$and": [{"a": "string"}, "number"]},
                    {"a": "x"})["result"] == "fail"


def test_fast_exploder_matches_row_oracle_fuzz():
    """The mask-driven fast explode path must emit exactly the same
    (path, error, value_repr) rows as the whole-row oracle walk, across
    random schemas/corruptions (incl. unknown columns, arrays, unions)."""
    rng = random.Random(777)
    schemas = [
        {"a": "string", "b": "integer", "c": "boolean"},
        {"a": ["?", "string"], "b": {"$number": {"min": 0, "max": 10}}},
        {"e": {"$enum": ["x", "y", "z"]}},
        {"s": {"$string": {"minLength": 2, "maxLength": 8}}},
        {"r": {"$string": {"regex": "^ab+c$"}}},
        {"arr": {"$array": "integer", "minLength": 1, "maxLength": 4}},
        {"arr": {"$array": ["?", "string"]}},
        {"o": {"x": "number", "y": ["?", "boolean"]}},
        {"m": {"$map": "integer", "minLength": 1}},
        {"nested": {"$array": {"v": {"$enum": ["p", "q"]}, "w": ["?", "integer"]}}},
        {"$types": {"$sp": {"k": {"$enum": ["a", "b"]},
                            "t": ["?", {"$string": {"minLength": 1}}]}},
         "spans": {"$array": "$sp", "minLength": 1, "maxLength": 3}},
        # union-leaf members + numeric bounds inside struct elements (the
        # vectorized struct-member emission path)
        {"$types": {"$el": {"kind": {"$enum": ["x", "y", "z"]},
                            "ref": ["?", {"$string": {"regex": "^m:"}}],
                            "off": {"$number": {"min": 0, "max": 100}},
                            "note": ["?", "null", {"$string": {"maxLength": 4}}]}},
         "items": {"$array": "$el", "maxLength": 4}},
    ]
    for schema in schemas:
        body = {k: v for k, v in schema.items() if k != "$types"}
        arrow_schema = schema_to_arrow(schema)
        rows = [clean(generate(schema, {"maxStringLength": 6, "arrayMax": 3,
                                        "mapMax": 3}, rng=rng))
                for _ in range(80)]
        table = _encode(rows, arrow_schema, rng)
        if rng.random() < 0.5:  # unknown extra column (closedness rows)
            extra = [rng.choice([None, "zz", None]) for _ in range(80)]
            table = table.append_column("extra_col", pa.array(extra, pa.string()))
        ex_fast = ViolationExploder(schema)
        assert ex_fast._fast_plans is not None
        ex_slow = ViolationExploder(schema)
        ex_slow._fast_plans = None
        fast, slow = ex_fast(table), ex_slow(table)
        key = lambda t: sorted(zip(*[t[c].to_pylist() for c in t.column_names]))
        assert fast.column_names == slow.column_names
        assert key(fast) == key(slow), (schema, key(fast)[:5], key(slow)[:5])


def test_fast_exploder_unicode_and_escape_reprs():
    """Leaf fast path: UTF-16 lengths (surrogate pairs count 2), JSON
    escapes, and non-ASCII \\uXXXX reprs must match the row oracle."""
    schema = {"s": {"$string": {"minLength": 3, "maxLength": 5}},
              "e": {"$enum": ["ok"]}}
    t = pa.table({
        "s": pa.array(["ab", "😀", "😀😀", "日本語です超過", 'a"b\\c', None,
                       "x\ty"], pa.string()),
        "e": pa.array(["émoji", "ok", "日本", " line", "ok", "nope", "ok"],
                      pa.string()),
    })
    fast = ViolationExploder(schema)
    slow = ViolationExploder(schema)
    slow._fast_plans = None
    key = lambda tbl: sorted(zip(*[tbl[c].to_pylist() for c in tbl.column_names]))
    assert key(fast(t)) == key(slow(t))
