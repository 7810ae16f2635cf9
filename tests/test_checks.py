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
