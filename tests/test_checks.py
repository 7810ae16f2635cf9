"""referential_missing_keys: broadcast and hash-partitioned paths must agree
(round-1 VERDICT item 7 — the partitioned fallback for unbroadcastable
right-side key sets)."""

import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray.engine.checks import referential_missing_keys  # noqa: E402


@pytest.fixture()
def sides(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 2, 4], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, 6, 8, 10, 2, 2], pa.int64())}))
    return left, right


def test_broadcast_path(sides):
    left, right = sides
    out = referential_missing_keys(left, right, "k", "rk")
    assert out["k"].to_pylist() == [1, 3, 5, 7]


def test_partitioned_path_agrees(sides):
    left, right = sides
    out = referential_missing_keys(left, right, "k", "rk", broadcast_limit=0,
                                   num_buckets=4)
    assert out["k"].to_pylist() == [1, 3, 5, 7]


def test_no_missing_keys(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({"rk": pa.array([1, 2, 3], pa.int64())}))
    for lim in (0, 10):
        out = referential_missing_keys(left, right, "k", "rk",
                                       broadcast_limit=lim)
        assert out.num_rows == 0
        assert out.schema.field("k").type == pa.int64()


def test_string_keys_partitioned(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "d"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(["b", "d"], pa.string())}))
    out = referential_missing_keys(left, right, "k", "rk", broadcast_limit=0,
                                   num_buckets=2)
    assert out["k"].to_pylist() == ["a", "c"]


def test_uniqueness_streaming_combine_equals_flat_reduce(ray_session):
    """Tree-combining chunks of map entries mid-stream must give the same
    duplicate table as reducing the raw entries."""
    import ray
    import ray.data

    from yaschva_ray.engine.blocks import iter_block_refs
    from yaschva_ray.engine.checks import (_UNIQ_BLOCK_REMOTE,
                                           uniqueness_combine,
                                           uniqueness_reduce,
                                           uniqueness_violations)

    keys = [f"k{i % 300:04d}" for i in range(2000)]  # every key duplicated
    t = pa.table({"doc_id": pa.array(keys)})
    ds = ray.data.from_arrow(t).repartition(8)
    flat = uniqueness_violations(ds, "doc_id")

    # rebuild the map side by hand, combine in chunks of 3, reduce
    import yaschva_ray.engine.checks as checks

    ds2 = ray.data.from_arrow(t).repartition(8)
    map_out = []
    for ref in iter_block_refs(ds2):
        map_out.append(checks._UNIQ_BLOCK_REMOTE
                       .options(num_returns=16).remote(ref, "doc_id", 16))
    combined = [uniqueness_combine(map_out[i:i + 3], "doc_id")
                for i in range(0, len(map_out), 3)]
    tree = uniqueness_reduce(combined, "doc_id")
    assert tree.equals(flat)
    assert tree.num_rows == 300


def test_chained_phase2_sentinels(ray_session):
    """The chained candidate task returns None when phase 1 found nothing
    OR the set exceeds the broadcast cap; the verify map short-circuits
    to empty partials on None (the driver then emits empty / falls back
    from the gathered phase-1 tables)."""
    import pyarrow as pa

    from yaschva_ray.engine.checks import (HASH_COL,
                                           _cand_from_reduced_task,
                                           _uniq_verify_blobs_task)

    dup = pa.table({HASH_COL: pa.array([1, 2, 3], pa.int64()),
                    "n_docs": pa.array([2, 2, 3], pa.int64())})
    empty = dup.slice(0, 0)
    assert _cand_from_reduced_task(10, empty) is None          # no cands
    assert _cand_from_reduced_task(2, dup) is None             # over cap
    got = _cand_from_reduced_task(10, dup)
    assert got.to_pylist() == [1, 2, 3]
    outs = _uniq_verify_blobs_task("doc_id", 4, None)          # sentinel
    assert all(o.num_rows == 0 for o in outs)


def test_uniqueness_after_schema_changing_map_with_empty_blocks(ray_session):
    """Empty blocks downstream of a schema-CHANGING map_batches keep the
    SOURCE schema (Ray Data skips the UDF on zero-row blocks) — the map
    half of the uniqueness exchange must treat a block without the key
    column as zero keys, not KeyError (round-4 ADVICE, ops.py:7955 /
    expectations.py:98 composition)."""
    import pyarrow.compute as pc
    import ray.data

    from yaschva_ray.engine.checks import uniqueness_violations

    src = pa.table({"a": pa.array([1, 1, 2, 3], pa.int64()),
                    "b": pa.array(["x", "x", "y", "z"])})
    # 8 blocks from 4 rows → at least 4 empty blocks with schema (a, b)
    ds = ray.data.from_arrow(src).repartition(8)

    def pack(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(t["a"], pa.string())})

    dup = uniqueness_violations(ds.map_batches(pack, batch_format="pyarrow"),
                                "k")
    assert dup.num_rows == 1
    assert dup["k"].to_pylist() == ["1"]
    assert dup["n_docs"].to_pylist() == [2]


def test_uniqueness_all_blocks_empty(ray_session):
    import pyarrow.compute as pc
    import ray.data

    from yaschva_ray.engine.checks import uniqueness_violations

    src = pa.table({"a": pa.array([], pa.int64())})
    ds = ray.data.from_arrow(src).repartition(4)

    def pack(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(t["a"], pa.string())})

    dup = uniqueness_violations(ds.map_batches(pack, batch_format="pyarrow"),
                                "k")
    assert dup.num_rows == 0
