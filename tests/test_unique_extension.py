"""$unique array/map set constraint — the ENGINE EXTENSION implementing
the reference's own declared future work (/root/reference/README.md:174-178
"Array to be unique set / Map to be a unique set", implemented by
neither side of the differential; the fuzz generator never emits
$unique, so the parity surface is untouched).  All three evaluators
(row oracle, compiled closures, vectorized TableValidator) plus the
generator must agree."""

import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray import validate  # noqa: E402
from yaschva_ray.compiled import compile_validator  # noqa: E402
from yaschva_ray.oracle import (E_NOT_UNIQUE_ARRAY,  # noqa: E402
                                E_NOT_UNIQUE_MAP, canonical_value_key)
from yaschva_ray.schema import SchemaError  # noqa: E402

ARR = {"a": {"$array": "number", "$unique": True}}
MAP = {"m": {"$map": "number", "$unique": True}}


def _both(schema, value):
    a = validate(schema, value)
    b = compile_validator(schema)(value)
    assert a == b, f"oracle vs compiled diverge:\n{a}\n{b}"
    return a


def test_array_unique_pass():
    assert _both(ARR, {"a": [1, 2, 3]})["result"] == "pass"
    assert _both(ARR, {"a": []})["result"] == "pass"


def test_array_unique_fail_marks_later_duplicate():
    r = _both(ARR, {"a": [1, 2, 1, 3, 2]})
    assert r["result"] == "fail"
    out = r["output"]["a"]
    assert out[0] is None and out[1] is None and out[3] is None
    assert out[2] == {"error": E_NOT_UNIQUE_ARRAY, "value": 1}
    assert out[4] == {"error": E_NOT_UNIQUE_ARRAY, "value": 2}


def test_array_without_unique_still_allows_duplicates():
    assert _both({"a": {"$array": "number"}},
                 {"a": [1, 1, 1]})["result"] == "pass"


def test_map_unique_fail_marks_later_key():
    r = _both(MAP, {"m": {"x": 1, "y": 2, "z": 1}})
    assert r["result"] == "fail"
    assert r["output"]["m"]["z"] == {"error": E_NOT_UNIQUE_MAP, "value": 1}
    assert r["output"]["m"]["x"] is None
    assert _both(MAP, {"m": {"x": 1, "y": 2}})["result"] == "pass"


def test_deep_equality_semantics():
    # 1 and 1.0 are the same JS number
    assert _both(ARR, {"a": [1, 1.0]})["result"] == "fail"
    # object key order is ignored; deep structures compare by value
    deep = {"a": {"$array": {"x": "number", "y": "number"},
                  "$unique": True}}
    assert _both(deep, {"a": [{"x": 1, "y": 2},
                              {"y": 2, "x": 1}]})["result"] == "fail"
    assert _both(deep, {"a": [{"x": 1, "y": 2},
                              {"x": 1, "y": 3}]})["result"] == "pass"
    # bool is NOT the number 1 (json spells them differently)
    assert canonical_value_key(True) != canonical_value_key(1)


def test_invalid_duplicate_gets_unique_error_not_type_error():
    """The duplicate error takes precedence for repeats; the FIRST
    occurrence still gets ordinary element validation."""
    r = _both(ARR, {"a": ["x", "x"]})
    assert r["result"] == "fail"
    assert r["output"]["a"][0] == {"error": "Value is not a number",
                                   "value": "x"}
    assert r["output"]["a"][1] == {"error": E_NOT_UNIQUE_ARRAY,
                                   "value": "x"}


def test_vectorized_array_unique():
    from yaschva_ray.vectorized import TableValidator

    schema = {"doc_id": "number",
              "tags": {"$array": "number", "$unique": True}}
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "tags": pa.array([[1, 2, 3], [1, 1], [], [5, 6, 5]],
                         pa.list_(pa.int64()))})
    out = TableValidator(schema)(t)
    assert out["valid"].to_pylist() == [True, False, True, False]
    # agrees with the row oracle on every row
    for i in range(t.num_rows):
        row = {"doc_id": t["doc_id"][i].as_py(),
               "tags": t["tags"][i].as_py()}
        assert validate(schema, row)["result"] == \
            ("pass" if out["valid"][i].as_py() else "fail")


def test_vectorized_map_unique():
    from yaschva_ray.vectorized import TableValidator

    schema = {"doc_id": "number",
              "props": {"$map": "number", "$unique": True}}
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "props": pa.array([[("a", 1), ("b", 2)], [("a", 1), ("b", 1)],
                           []], pa.map_(pa.string(), pa.int64()))})
    out = TableValidator(schema)(t)
    assert out["valid"].to_pylist() == [True, False, True]


def test_generator_honors_unique():
    import random

    from yaschva_ray.generate import generate

    schema = {"a": {"$array": {"$number": {"min": 0, "max": 30}},
                    "$unique": True, "minLength": 5, "maxLength": 9}}
    for seed in range(20):
        v = generate(schema, rng=random.Random(seed))
        assert _both(schema, v)["result"] == "pass"
        assert 5 <= len(v["a"]) <= 9
        keys = [canonical_value_key(x) for x in v["a"]]
        assert len(set(keys)) == len(keys)


def test_generator_unique_map():
    import random

    from yaschva_ray.generate import generate

    schema = {"m": {"$map": {"$number": {"min": 0, "max": 50}},
                    "$unique": True, "minLength": 4, "maxLength": 8}}
    for seed in range(10):
        v = generate(schema, rng=random.Random(seed))
        assert _both(schema, v)["result"] == "pass"
        assert len(v["m"]) >= 4


def test_generator_unsatisfiable_unique_raises():
    import random

    from yaschva_ray.generate import generate

    schema = {"a": {"$array": {"$enum": ["only"]},
                    "$unique": True, "minLength": 2, "maxLength": 5}}
    with pytest.raises(SchemaError):
        generate(schema, rng=random.Random(0))


def test_self_schema_admits_unique():
    from tests.test_self_describe import SELF_SCHEMA

    doc = {"a": {"$array": "number", "$unique": True},
           "m": {"$map": "string", "$unique": True}}
    assert _both(SELF_SCHEMA, doc)["result"] == "pass"


def test_unique_check_embeddings_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["unique_check_embeddings"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    ora = con.execute(entry.oracle_sql()["unique_check_embeddings"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # exactly the 8 planted rows violate
    bad = out.filter(pa.compute.invert(out["valid"]))
    assert bad.num_rows == 8
    assert all(v >= 40_000_000 for v in bad["vec_id"].to_pylist())


def test_canonical_key_properties_hypothesis():
    """canonical_value_key is a true deep-equality witness: equal keys
    iff the normalized structures are equal; permuting dict key order
    never changes the key; int/integral-float identification holds
    recursively."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-2**40, max_value=2**40),
        st.floats(min_value=-1e9, max_value=1e9,
                  allow_nan=False, allow_infinity=False),
        st.text(max_size=8))
    values = st.recursive(
        scalars,
        lambda ch: st.one_of(
            st.lists(ch, max_size=4),
            st.dictionaries(st.text(max_size=4), ch, max_size=4)),
        max_leaves=12)

    def norm(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float) and v.is_integer():
            return ("n", int(v))
        if isinstance(v, int):
            return ("n", v)
        if isinstance(v, dict):
            return ("d", tuple(sorted((k, norm(x))
                                      for k, x in v.items())))
        if isinstance(v, list):
            return ("l", tuple(norm(x) for x in v))
        if isinstance(v, float):
            return ("n", v)  # non-integral float
        return ("s", v) if isinstance(v, str) else ("z",)

    @given(values, values)
    @settings(max_examples=300, deadline=None)
    def check(a, b):
        ka, kb = canonical_value_key(a), canonical_value_key(b)
        assert (ka == kb) == (norm(a) == norm(b)), (a, b)

    check()

    @given(st.dictionaries(st.text(max_size=4), scalars, max_size=6))
    @settings(max_examples=100, deadline=None)
    def key_order_invariant(d):
        import random as _r
        items = list(d.items())
        _r.Random(0).shuffle(items)
        assert canonical_value_key(dict(items)) == canonical_value_key(d)

    key_order_invariant()


def test_vectorized_unique_agrees_with_oracle_hypothesis(ray_session):
    """Property: for random integer-list columns the vectorized
    $unique fail mask equals the row oracle's verdict on every row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yaschva_ray.vectorized import TableValidator

    schema = {"doc_id": "number",
              "xs": {"$array": "number", "$unique": True}}
    tv = TableValidator(schema)

    @given(st.lists(st.lists(st.integers(min_value=0, max_value=5),
                             max_size=6), min_size=1, max_size=8))
    @settings(max_examples=80, deadline=None)
    def check(rows):
        t = pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "xs": pa.array(rows, pa.list_(pa.int64()))})
        out = tv(t)
        for i, r in enumerate(rows):
            want = validate(schema, {"doc_id": i, "xs": r})["result"]
            got = "pass" if out["valid"][i].as_py() else "fail"
            assert got == want, (i, r)

    check()
