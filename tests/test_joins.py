"""engine.joins: as-of and range joins (bucket exchanges, vectorized
bucket-local matching) vs brute-force truth on synthetic inputs."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray.engine.joins import asof_join, range_join  # noqa: E402


def test_asof_join_vs_bruteforce(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    n_l, n_r = 500, 300
    lkeys = rng.randint(0, 40, n_l)
    lts = rng.randint(0, 10_000, n_l)
    rkeys = rng.randint(0, 50, n_r)  # some keys have no right rows
    rts = rng.randint(0, 10_000, n_r)
    left = pa.table({"lid": pa.array(np.arange(n_l), pa.int64()),
                     "k": pa.array(lkeys, pa.int64()),
                     "t": pa.array(lts, pa.int64())})
    right = pa.table({"k2": pa.array(rkeys, pa.int64()),
                      "t2": pa.array(rts, pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k2", left_ts="t", right_ts="t2",
                    num_buckets=4)
    got = {r["lid"]: r["t2"] for r in out.to_pylist()}
    for i in range(n_l):
        cand = rts[(rkeys == lkeys[i]) & (rts <= lts[i])]
        want = int(cand.max()) if len(cand) else None
        assert got.get(i) == want, (i, got.get(i), want)


def test_range_join_vs_bruteforce(ray_session):
    import ray.data

    rng = np.random.RandomState(4)
    lv = np.round(rng.uniform(-5, 5, 400), 3)
    rv = np.round(rng.uniform(-5, 5, 200), 3)
    eps = 0.1
    left = pa.table({"lid": pa.array(np.arange(len(lv)), pa.int64()),
                     "v": pa.array(lv, pa.float64())})
    right = pa.table({"rid": pa.array(np.arange(len(rv)), pa.int64()),
                      "w": pa.array(rv, pa.float64())})
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     left_val="v", right_val="w", eps=eps, num_buckets=4)
    got = set(zip(out["lid"].to_pylist(), out["rid"].to_pylist()))
    truth = {(int(i), int(j)) for i in range(len(lv)) for j in range(len(rv))
             if lv[i] - eps <= rv[j] <= lv[i] + eps}
    assert got == truth
    assert len(truth) > 100  # the fixture really exercises matches


def test_range_join_no_duplicate_pairs_at_band_boundaries(ray_session):
    import ray.data

    # values exactly on band boundaries (width = 2*eps = 0.2)
    lv = np.array([0.0, 0.2, 0.4, -0.2], dtype=np.float64)
    rv = np.array([0.0, 0.2, 0.1, -0.1, -0.3], dtype=np.float64)
    left = pa.table({"lid": pa.array(np.arange(len(lv)), pa.int64()),
                     "v": pa.array(lv)})
    right = pa.table({"rid": pa.array(np.arange(len(rv)), pa.int64()),
                      "w": pa.array(rv)})
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     left_val="v", right_val="w", eps=0.1, num_buckets=3)
    pairs = list(zip(out["lid"].to_pylist(), out["rid"].to_pylist()))
    assert len(pairs) == len(set(pairs))  # replication must not duplicate
    truth = {(int(i), int(j)) for i in range(len(lv)) for j in range(len(rv))
             if abs(lv[i] - rv[j]) <= 0.1 + 1e-12}
    assert set(pairs) == truth
