"""Engine extension surface: registered named checks must behave
identically across the row oracle, the compiled closures, and the
vectorized table path (per-column oracle fallback or a user-supplied
vectorized kernel) — and leave reference semantics untouched when a name
is not registered."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray import SchemaError, registered_check, validate  # noqa: E402
from yaschva_ray.compiled import compile_validator  # noqa: E402
from yaschva_ray.values import UNDEFINED  # noqa: E402
from yaschva_ray.vectorized import TableValidator  # noqa: E402

E_SHORT = "String is not short enough"


def _short_text(v):
    if isinstance(v, str) and len(v) <= 5:
        return None
    return E_SHORT


def _short_text_vec(arr):
    import pyarrow.compute as pc

    ok = pc.less_equal(pc.utf8_length(arr), 5)
    return ~np.asarray(ok.fill_null(False).to_numpy(zero_copy_only=False))


def test_unregistered_name_still_raises_reference_error():
    with pytest.raises(SchemaError, match="Unknown validator"):
        validate({"a": "@nope"}, {"a": "x"})


def test_registered_check_oracle_and_compiled_paths():
    with registered_check("@short", _short_text):
        # oracle
        assert validate({"a": "@short"}, {"a": "hi"})["result"] == "pass"
        bad = validate({"a": "@short"}, {"a": "toolongvalue"})
        assert bad["result"] == "fail"
        assert bad["output"]["a"] == {"error": E_SHORT, "value": "toolongvalue"}
        # null/undefined routed to the fn like any leaf value
        assert validate({"a": "@short"}, {})["result"] == "fail"
        # compiled
        fn = compile_validator({"a": "@short"})
        assert fn({"a": "ok"})["result"] == "pass"
        assert fn({"a": "toolongvalue"})["output"]["a"]["error"] == E_SHORT
        # $types still shadows the registry (reference resolution order)
        shadowed = {"$types": {"@short": "number"}, "a": "@short"}
        assert validate(shadowed, {"a": 3})["result"] == "pass"
        assert validate(shadowed, {"a": "hi"})["result"] == "fail"
    # scope ended: back to the reference error
    with pytest.raises(SchemaError, match="Unknown validator"):
        validate({"a": "@short"}, {"a": "hi"})


def test_registered_check_table_paths():
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "a": pa.array(["ok", "toolongvalue", None])})
    with registered_check("@short", _short_text):
        # no vectorized kernel: fail_mask falls back to the per-row oracle
        tv = TableValidator({"id": "any", "a": "@short"})
        assert tv.fail_mask(t).tolist() == [False, True, True]
    with registered_check("@short", _short_text,
                          vectorized=_short_text_vec):
        tv = TableValidator({"id": "any", "a": "@short"})
        assert tv.fail_mask(t).tolist() == [False, True, True]


def test_registered_check_in_union_and_exploder():
    from yaschva_ray.vectorized import ViolationExploder

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "a": pa.array(["ok", "toolongvalue", None])})
    with registered_check("@short", _short_text):
        schema = {"id": "any", "a": ["null", "@short"]}
        tv = TableValidator(schema)
        mask = tv.fail_mask(t)
        assert mask.tolist() == [False, True, False]  # null branch passes
        ex = ViolationExploder(schema, id_columns=("id",))
        rows = ex(t.filter(pa.array(mask))).to_pylist()
        errs = {r["error"] for r in rows}
        assert E_SHORT in errs  # branch payload carries the custom error


def test_registered_check_fn_sees_undefined_sentinel():
    seen = []

    def probe(v):
        seen.append(v)
        return None  # pass everything

    with registered_check("@probe", probe):
        assert validate({"a": "@probe"}, {})["result"] == "pass"
    assert seen == [UNDEFINED]
