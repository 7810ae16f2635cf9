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


def test_range_join_single_bucket_no_duplicates(ray_session):
    """ADVICE repro: with num_buckets=1 a right row's replicas in
    consecutive bands all alias to bucket 0 — dedup must key on (row,
    bucket), not (row, band), or every match is emitted twice."""
    import ray.data

    lv = np.array([0.0, 0.15, 0.3], dtype=np.float64)
    rv = np.array([0.05, 0.2, 0.25], dtype=np.float64)
    left = pa.table({"lid": pa.array(np.arange(len(lv)), pa.int64()),
                     "v": pa.array(lv)})
    right = pa.table({"rid": pa.array(np.arange(len(rv)), pa.int64()),
                      "w": pa.array(rv)})
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     left_val="v", right_val="w", eps=0.1, num_buckets=1)
    pairs = list(zip(out["lid"].to_pylist(), out["rid"].to_pylist()))
    assert len(pairs) == len(set(pairs))
    truth = {(int(i), int(j)) for i in range(len(lv)) for j in range(len(rv))
             if abs(lv[i] - rv[j]) <= 0.1 + 1e-12}
    assert set(pairs) == truth


def test_range_join_hot_band_subsplit_matches_bruteforce(ray_session, caplog):
    """VERDICT item: a spiky value distribution (one dominant value) used
    to land a whole band in ONE reduce task.  Plant 120k left rows at a
    single value; the counting pass must sub-split the hot band (logged),
    and the pair output must equal brute force exactly."""
    import logging

    import ray.data

    rng = np.random.RandomState(5)
    n_l = 120_000
    lv = np.full(n_l, 7.0)
    lv[:200] = rng.uniform(0, 20, 200)  # some non-hot rows too
    rv = np.concatenate([np.full(40, 7.02), rng.uniform(0, 20, 60)])
    left = pa.table({"lid": pa.array(np.arange(n_l), pa.int64()),
                     "lv": pa.array(lv)})
    right = pa.table({"rid": pa.array(np.arange(len(rv)), pa.int64()),
                      "rv": pa.array(rv)})
    with caplog.at_level(logging.WARNING, logger="yaschva_ray.joins"):
        out = range_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right),
                         left_val="lv", right_val="rv", eps=0.05,
                         num_buckets=8, max_band_rows=10_000)
    assert any("sub-split" in r.message for r in caplog.records)
    got = {(r["lid"], r["rid"]) for r in out.to_pylist()}
    li, ri = np.nonzero(np.abs(lv[:, None] - rv[None, :]) <= 0.05)
    want = set(zip(li.tolist(), ri.tolist()))
    assert got == want
    assert len(out) == len(got)  # no duplicate pairs across sub-splits


def test_range_join_subsplit_equals_unsplit_on_random_data(ray_session):
    """Forcing sub-splits everywhere (tiny max_band_rows) must not change
    the pair set on ordinary data — the grid partition is invisible."""
    import ray.data

    rng = np.random.RandomState(11)
    lv = rng.uniform(0, 5, 3000)
    rv = rng.uniform(0, 5, 2000)
    left = pa.table({"lid": pa.array(np.arange(len(lv)), pa.int64()),
                     "lv": pa.array(lv)})
    right = pa.table({"rid": pa.array(np.arange(len(rv)), pa.int64()),
                      "rv": pa.array(rv)})
    kw = dict(left_val="lv", right_val="rv", eps=0.01, num_buckets=4)
    base = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      **kw)
    split = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                       max_band_rows=25, **kw)
    to_set = lambda t: {(r["lid"], r["rid"]) for r in t.to_pylist()}
    assert to_set(base) == to_set(split)
    assert len(base) == len(split)


def test_range_join_rejects_narrow_width(ray_session):
    import ray.data

    t = pa.table({"v": pa.array([0.0])})
    with pytest.raises(ValueError, match="width"):
        range_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                   left_val="v", right_val="v", eps=0.1, width=0.05,
                   num_buckets=2)


def test_asof_join_empty_right_bucket_unifies_typed_schemas(ray_session):
    """ADVICE repro: a bucket with left rows but NO right rows used to
    fabricate pandas NaT (datetime64[ns]) that could not concat with other
    buckets' date32 columns.  Keys are chosen so at least one of the 4
    buckets holds only left rows; right_ts is date32 like o_orderdate."""
    import datetime

    import ray.data

    lkeys = np.arange(40, dtype=np.int64)  # keys 0..39
    left = pa.table({
        "lid": pa.array(np.arange(40), pa.int64()),
        "k": pa.array(lkeys),
        "t": pa.array([datetime.datetime(2024, 1, 2)] * 40,
                      pa.timestamp("us")),
    })
    right = pa.table({  # only key 0 has history → most buckets right-empty
        "k2": pa.array([0], pa.int64()),
        "t2": pa.array([datetime.date(2024, 1, 1)], pa.date32()),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k2", left_ts="t", right_ts="t2",
                    num_buckets=4)
    assert out.num_rows == 40
    got = {r["lid"]: r["t2"] for r in out.to_pylist()}
    assert got[0] == datetime.date(2024, 1, 1)
    assert sum(v is None for v in got.values()) == 39


def test_asof_bucket_schemaless_first_right_part():
    """ADVICE repro: rall[0] can be a SCHEMA-LESS pa.table({}) (Ray's empty
    map blocks / all-empty concat rounds) — the right schema must come from
    the first part that carries one, or the typed-null append and the
    merge-path type restoration silently iterate an empty schema."""
    import datetime

    from yaschva_ray.engine.joins import _asof_bucket

    left = pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "k": pa.array([0, 0], pa.int64()),
        "t": pa.array([datetime.datetime(2024, 1, 2)] * 2, pa.timestamp("us")),
    })
    right = pa.table({
        "k2": pa.array([0], pa.int64()),
        "t2": pa.array([datetime.date(2024, 1, 1)], pa.date32()),
        "rv": pa.array([7], pa.int32()),
    })
    # schema-less first part + real rows later: restoration must still see
    # the right schema (date32 back from datetime64, int32 back from float)
    out = _asof_bucket(1, "k", "k2", "t", "t2", 0, None, False, "backward",
                       left, pa.table({}), right)
    assert out.schema.field("t2").type == pa.date32()
    assert out.schema.field("rv").type == pa.int32()
    assert out["rv"].to_pylist() == [7, 7]
    # schema-less first part + a typed ZERO-ROW part: left rows join typed
    # nulls with the real right schema, not a column-less table
    out2 = _asof_bucket(1, "k", "k2", "t", "t2", 0, None, False, "backward",
                        left, pa.table({}), right.slice(0, 0))
    assert out2.num_rows == 2
    assert out2.schema.field("t2").type == pa.date32()
    assert out2.schema.field("rv").type == pa.int32()
    assert out2["rv"].to_pylist() == [None, None]
    # shared-name guard must also fire off the typed (non-first) part
    bad_right = pa.table({"k2": pa.array([0], pa.int64()),
                          "t2": pa.array([datetime.date(2024, 1, 1)],
                                         pa.date32()),
                          "lid": pa.array([9], pa.int64())})
    with pytest.raises(ValueError, match="disjoint"):
        _asof_bucket(1, "k", "k2", "t", "t2", 0, None, False, "backward",
                     left, pa.table({}), bad_right)


def test_asof_join_hot_key_single_bucket(ray_session):
    """Hot-key shape: EVERY left row shares one key (all land in one
    bucket task) — completes and matches brute force."""
    import ray.data

    rng = np.random.RandomState(8)
    n = 5000
    lts = rng.randint(0, 100_000, n)
    rts = np.sort(rng.randint(0, 100_000, 200))
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "k": pa.array(np.zeros(n, np.int64)),
                     "t": pa.array(lts, pa.int64())})
    right = pa.table({"k2": pa.array(np.zeros(200, np.int64)),
                      "t2": pa.array(rts, pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k2", left_ts="t", right_ts="t2",
                    num_buckets=8)
    got = {r["lid"]: r["t2"] for r in out.to_pylist()}
    for i in range(0, n, 97):
        cand = rts[rts <= lts[i]]
        want = int(cand.max()) if len(cand) else None
        assert got[i] == want


def test_warn_hot_key_logs_over_threshold(monkeypatch, caplog):
    """The one-key-per-bucket-task assumption is now observable: a bucket
    whose largest key group crosses the threshold logs it (VERDICT item —
    a hot key at scale used to OOM with no warning)."""
    import logging

    from yaschva_ray.engine import joins

    monkeypatch.setattr(joins, "_HOT_KEY_WARN_ROWS", 100)
    t = pa.table({"k": pa.array([7] * 150 + [1, 2, 3], pa.int64())})
    with caplog.at_level(logging.WARNING, logger="yaschva_ray.joins"):
        joins._warn_hot_key(t, "k", "asof_join(left)", 3)
    msgs = [r.message for r in caplog.records]
    assert any("150 rows" in m and "asof_join(left)" in m for m in msgs)
    # under threshold: silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="yaschva_ray.joins"):
        joins._warn_hot_key(
            pa.table({"k": pa.array([1, 1, 2], pa.int64())}), "k", "x", 0)
    assert not caplog.records


def test_join_bucket_sinks_write_parts(ray_session, tmp_path):
    """out_dir switches both joins to per-bucket parquet sinks + manifest."""
    import pyarrow.parquet as pq
    import ray.data

    left = pa.table({"lid": pa.array(np.arange(100), pa.int64()),
                     "k": pa.array(np.arange(100) % 7, pa.int64()),
                     "t": pa.array(np.arange(100), pa.int64())})
    right = pa.table({"k2": pa.array(np.arange(7), pa.int64()),
                      "t2": pa.array(np.zeros(7, np.int64))})
    man = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k2", left_ts="t", right_ts="t2",
                    num_buckets=4, out_dir=str(tmp_path / "asof"))
    assert set(man.column_names) == {"bucket", "n_rows", "path"}
    total = 0
    for p, n in zip(man["path"].to_pylist(), man["n_rows"].to_pylist()):
        t = pq.read_table(p)
        assert t.num_rows == n
        total += n
    assert total == 100  # every left row appears in exactly one part


def test_auto_buckets_scales_with_bytes():
    from yaschva_ray.engine.joins import (_MAX_BUCKETS, _MIN_BUCKETS,
                                          _TARGET_BUCKET_BYTES, _auto_buckets)

    class FakeDs:
        def __init__(self, nbytes):
            self._n = nbytes

        def input_files(self):
            return []

        @property
        def _logical_plan(self):
            n = self._n

            class Dag:
                def infer_metadata(self):
                    class M:
                        size_bytes = n
                    return M()

            class LP:
                dag = Dag()
            return LP()

    assert _auto_buckets(FakeDs(1), FakeDs(1)) == _MIN_BUCKETS
    assert _auto_buckets(FakeDs(100 * _TARGET_BUCKET_BYTES),
                         FakeDs(28 * _TARGET_BUCKET_BYTES)) == 128
    assert _auto_buckets(FakeDs(10**6 * _TARGET_BUCKET_BYTES),
                         FakeDs(0)) == _MAX_BUCKETS


def test_session_windows_vs_bruteforce(ray_session):
    """engine.windows: distributed sessionization matches a per-key
    brute-force walk, including exact-gap boundaries (strict >)."""
    import datetime

    import ray.data

    from yaschva_ray.engine.windows import session_windows

    rng = np.random.RandomState(11)
    n = 4000
    keys = rng.randint(0, 50, n)
    base = datetime.datetime(2024, 1, 1)
    secs = np.sort(rng.randint(0, 200_000, n))
    rows = pa.table({
        "k": pa.array(keys, pa.int64()),
        "t": pa.array([base + datetime.timedelta(seconds=int(s))
                       for s in secs], pa.timestamp("us")),
    })
    gap_s = 600
    out = session_windows(ray.data.from_arrow(rows), key="k", ts="t",
                          gap_s=gap_s, num_buckets=4)
    # brute force
    import collections
    per = collections.defaultdict(list)
    for kk, ss in zip(keys, secs):
        per[int(kk)].append(int(ss))
    want = []
    for kk in sorted(per):
        ts_ = sorted(per[kk])
        start = prev = ts_[0]
        cnt = 1
        for s in ts_[1:]:
            if s - prev > gap_s:
                want.append((kk, start, prev, cnt))
                start, cnt = s, 0
            prev = s
            cnt += 1
        want.append((kk, start, prev, cnt))
    got = [(r["k"],
            int((r["session_start"] - base).total_seconds()),
            int((r["session_end"] - base).total_seconds()),
            r["n_events"]) for r in out.to_pylist()]
    assert got == want


def test_session_windows_exact_gap_not_split(ray_session):
    import datetime

    import ray.data

    from yaschva_ray.engine.windows import session_windows

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "t": pa.array([base,
                       base + datetime.timedelta(seconds=600),   # == gap
                       base + datetime.timedelta(seconds=1201)],  # > gap
                      pa.timestamp("us")),
    })
    out = session_windows(ray.data.from_arrow(t), key="k", ts="t",
                          gap_s=600, num_buckets=1)
    assert out["n_events"].to_pylist() == [2, 1]


def test_asof_join_rejects_shared_column_names(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "t": pa.array([5], pa.int64()),
                     "v": pa.array([1.0])})
    right = pa.table({"k2": pa.array([1], pa.int64()),
                      "t2": pa.array([3], pa.int64()),
                      "v": pa.array([2.0])})  # 'v' collides
    with pytest.raises(Exception, match="disjoint"):
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_key="k", right_key="k2", left_ts="t", right_ts="t2",
                  num_buckets=1)


def test_keyed_exchange_group_sum_property(ray_session):
    """keyed_exchange with a per-bucket group-sum must equal a single
    global group-sum, over random keys/values and several bucket counts."""
    import ray.data

    from yaschva_ray.engine.exchange import keyed_exchange

    rng = np.random.RandomState(17)
    n = 20_000
    t = pa.table({"k": pa.array(rng.randint(0, 977, n).astype(np.int64)),
                  "v": pa.array(rng.randint(0, 100, n).astype(np.int64))})
    want = (t.group_by("k").aggregate([("v", "sum")])
            .sort_by([("k", "ascending")]))

    def reduce_fn(b):
        g = b.group_by("k").aggregate([("v", "sum")])
        return g

    for nb in (1, 4, 32):
        tables = keyed_exchange(ray.data.from_arrow(t).repartition(6), "k",
                                reduce_fn, num_buckets=nb)
        got = (pa.concat_tables(tables).combine_chunks()
               .sort_by([("k", "ascending")]))
        assert got.equals(want), nb


def test_session_windows_unit_aware(ray_session):
    """A timestamp[ms] column must sessionize identically to the same
    instants in timestamp[us] (the gap compares in the column's unit)."""
    import datetime

    import ray.data

    from yaschva_ray.engine.windows import session_windows

    base = datetime.datetime(2024, 1, 1)
    times = [base, base + datetime.timedelta(seconds=500),
             base + datetime.timedelta(seconds=1200)]

    def run(unit):
        t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                      "t": pa.array(times, pa.timestamp(unit))})
        out = session_windows(ray.data.from_arrow(t), key="k", ts="t",
                              gap_s=600, num_buckets=1)
        return out["n_events"].to_pylist()

    assert run("us") == [2, 1]
    assert run("ms") == [2, 1]


def test_session_windows_bucket_sinks(ray_session, tmp_path):
    import datetime

    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.engine.windows import session_windows

    base = datetime.datetime(2024, 1, 1)
    rows = pa.table({
        "k": pa.array(np.arange(200) % 9, pa.int64()),
        "t": pa.array([base + datetime.timedelta(seconds=int(s))
                       for s in range(200)], pa.timestamp("us")),
    })
    man = session_windows(ray.data.from_arrow(rows), key="k", ts="t",
                          gap_s=600, num_buckets=4,
                          out_dir=str(tmp_path / "sess"))
    assert set(man.column_names) == {"bucket", "n_rows", "path"}
    total = sum(pq.read_table(p).num_rows for p in man["path"].to_pylist())
    assert total == 9  # one session per key (all gaps tiny)


def test_keyed_exchange_concat_rounds_equivalent(ray_session):
    """Forcing tiny concat rounds (concat_every=2) must not change any
    result — the rounds are pure data movement."""
    import ray.data

    from yaschva_ray.engine.exchange import keyed_exchange

    rng = np.random.RandomState(19)
    t = pa.table({"k": pa.array(rng.randint(0, 100, 5000).astype(np.int64)),
                  "v": pa.array(rng.randint(0, 10, 5000).astype(np.int64))})

    def reduce_fn(b):
        return b.group_by("k").aggregate([("v", "sum")])

    def run(ce):
        tables = keyed_exchange(ray.data.from_arrow(t).repartition(10), "k",
                                reduce_fn, num_buckets=4, concat_every=ce)
        return (pa.concat_tables(tables).combine_chunks()
                .sort_by([("k", "ascending")]))

    assert run(2).equals(run(10**9))


def test_hash_join_vs_bruteforce(ray_session):
    """Multi-bucket inner equi-join equals the pandas merge, including
    duplicate keys on BOTH sides (cross products within a key) and keys
    missing from either side."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(8)
    lt = pa.table({"k": pa.array(rng.randint(0, 40, 300), pa.int64()),
                   "lv": pa.array(np.arange(300), pa.int64())})
    rt = pa.table({"rk": pa.array(rng.randint(20, 60, 200), pa.int64()),
                   "rv": pa.array(np.arange(200), pa.int64())})
    out = hash_join(ray.data.from_arrow(lt).repartition(5),
                    ray.data.from_arrow(rt).repartition(3),
                    left_key="k", right_key="rk", num_buckets=4)
    got = out.to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    want = (lt.to_pandas().merge(rt.to_pandas(), left_on="k", right_on="rk")
            .drop(columns=["rk"])[got.columns.tolist()]
            .sort_values(["lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_bucket_fn_equals_post_filter(ray_session):
    """bucket_fn (in-reduce transform) ≡ the same filter applied to the
    full join output — only placement differs (violations-only leaves
    each reduce task)."""
    import pyarrow.compute as pc
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(11)
    lt = pa.table({"k": pa.array(rng.randint(0, 40, 300), pa.int64()),
                   "lv": pa.array(rng.randint(0, 100, 300), pa.int64())})
    rt = pa.table({"rk": pa.array(rng.randint(20, 60, 200), pa.int64()),
                   "rv": pa.array(rng.randint(0, 100, 200), pa.int64())})

    def mk():
        return (ray.data.from_arrow(lt).repartition(5),
                ray.data.from_arrow(rt).repartition(3))

    # a closure (cloudpickle by-value) — test modules aren't importable
    # on workers, so a module-level fn here would fail to unpickle
    def lv_gt_rv(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return t.filter(_pc.greater(t["lv"], t["rv"]))

    l1, r1 = mk()
    got = hash_join(l1, r1, left_key="k", right_key="rk", num_buckets=4,
                    bucket_fn=lv_gt_rv)
    l2, r2 = mk()
    full = hash_join(l2, r2, left_key="k", right_key="rk", num_buckets=4)
    want = full.filter(pc.greater(full["lv"], full["rv"]))
    key = [("k", "ascending"), ("lv", "ascending"), ("rv", "ascending")]
    assert got.sort_by(key).equals(want.select(got.column_names).sort_by(key))


def test_hash_join_empty_side_and_shared_names(ray_session):
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    lt = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "v": pa.array([10, 20], pa.int64())})
    empty_r = pa.table({"rk": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64())})
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(empty_r),
                    left_key="k", right_key="rk", num_buckets=2)
    assert out.num_rows == 0
    # shared non-key column name must fail loudly (schema-drift hazard)
    shared_r = pa.table({"rk": pa.array([1], pa.int64()),
                         "v": pa.array([9], pa.int64())})
    with pytest.raises(Exception, match="disjoint"):
        hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(shared_r),
                  left_key="k", right_key="rk", num_buckets=2)


def test_hash_join_then_asof_join_lazy_remotes(ray_session):
    """Regression: hash_join initializes the shared _MAP_REMOTE wrapper;
    a subsequent asof_join must still initialize ITS reduce wrapper
    (the joint-init pattern left _REDUCE_REMOTE None)."""
    import importlib

    import ray.data

    import yaschva_ray.engine.joins as joins_mod
    importlib.reload(joins_mod)  # reset the lazy globals

    lt = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "lv": pa.array([1, 2, 3], pa.int64())})
    rt = pa.table({"rk": pa.array([1, 2], pa.int64()),
                   "rv": pa.array([10, 20], pa.int64())})
    out = joins_mod.hash_join(ray.data.from_arrow(lt),
                              ray.data.from_arrow(rt),
                              left_key="k", right_key="rk", num_buckets=2)
    assert out.num_rows == 3
    la = pa.table({"key": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([5, 9], pa.int64()),
                   "a": pa.array([100, 200], pa.int64())})
    ra = pa.table({"rkey": pa.array([1], pa.int64()),
                   "rts": pa.array([4], pa.int64()),
                   "b": pa.array([7], pa.int64())})
    out2 = joins_mod.asof_join(ray.data.from_arrow(la),
                               ray.data.from_arrow(ra),
                               left_key="key", right_key="rkey",
                               left_ts="ts", right_ts="rts", num_buckets=2)
    assert out2.num_rows == 2
    importlib.reload(joins_mod)  # leave pristine for other tests


def test_hash_join_left_outer_vs_pandas(ray_session):
    """Left-outer join equals the pandas left merge, including buckets
    whose right side is completely empty (typed nulls from the shipped
    schema hint)."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(6)
    lt = pa.table({"k": pa.array(rng.randint(0, 50, 200), pa.int64()),
                   "lv": pa.array(np.arange(200), pa.int64())})
    # right side touches only a few keys -> most buckets right-empty
    rt = pa.table({"rk": pa.array([0, 1, 2], pa.int64()),
                   "rv": pa.array([10.5, 11.5, 12.5], pa.float64())})
    out = hash_join(ray.data.from_arrow(lt).repartition(4),
                    ray.data.from_arrow(rt),
                    left_key="k", right_key="rk", how="left outer",
                    num_buckets=6)
    got = out.to_pandas().sort_values(["lv"]).reset_index(drop=True)
    want = (lt.to_pandas().merge(rt.to_pandas(), how="left",
                                 left_on="k", right_on="rk")
            .drop(columns=["rk"])[got.columns.tolist()]
            .sort_values(["lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert got["rv"].isna().sum() > 0  # unmatched lefts survive as nulls


def test_hash_join_full_outer(ray_session):
    """Full outer keeps unmatched rows from BOTH sides with typed nulls;
    matches pandas' outer merge exactly."""
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    lt = pa.table({"k": pa.array([1, 2, 3, 7], pa.int64()),
                   "lv": pa.array(["a", "b", "c", "g"])})
    rt = pa.table({"rk": pa.array([2, 3, 3, 9], pa.int64()),
                   "rv": pa.array([20, 30, 31, 90], pa.int64())})
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_key="k", right_key="rk", how="full outer",
                    num_buckets=4).to_pandas()
    # Arrow coalesces the key into 'k' — mirror that in the pandas want
    want = (lt.to_pandas().merge(rt.to_pandas(), how="outer",
                                 left_on="k", right_on="rk"))
    want["k"] = want["k"].fillna(want["rk"]).astype("int64")
    want = want.drop(columns=["rk"])
    import pandas as pd

    def key(df):
        df = df.sort_values(["k", "rv"], na_position="last")
        # None-vs-NaN null spellings differ between Arrow and pandas
        return df.reset_index(drop=True).astype(object).where(
            pd.notna(df.reset_index(drop=True)), "NULL").astype(str)

    pd.testing.assert_frame_equal(
        key(out[want.columns.tolist()]), key(want))


def test_hash_join_bloom_parity_and_pruning(ray_session):
    """Bloom-prefiltered join must equal the plain join exactly (inner and
    left outer), and the filter must actually drop non-matching rows
    before the exchange."""
    import numpy as np
    import ray.data

    from yaschva_ray.engine.joins import (
        bloom_prefilter, build_bloom, hash_join)

    rng = np.random.RandomState(7)
    left = pa.table({
        "k": pa.array(rng.randint(0, 200, 500), pa.int64()),
        "lv": pa.array(np.arange(500), pa.int64()),
    })
    # right keys mostly OUTSIDE the left's range → selective join
    right = pa.table({
        "k2": pa.array(rng.randint(0, 20_000, 4000), pa.int64()),
        "rv": pa.array(np.arange(4000), pa.int64()),
    })

    def mk(t):
        return ray.data.from_arrow(t).repartition(4)

    for how in ("inner", "left outer"):
        plain = hash_join(mk(left), mk(right), left_key="k", right_key="k2",
                          how=how)
        bloom = hash_join(mk(left), mk(right), left_key="k", right_key="k2",
                          how=how, bloom_right_by_left=True)
        key_cols = [c for c in plain.column_names]
        assert (plain.sort_by([(c, "ascending") for c in key_cols])
                .equals(bloom.sort_by([(c, "ascending") for c in key_cols]))), how

    # the prefilter itself: rows surviving ⊇ true matches, and ≪ input
    bref = build_bloom(mk(left), "k")
    n_kept = bloom_prefilter(mk(right), "k2", bref).count()
    left_keys = set(left["k"].to_pylist())
    n_true = sum(1 for v in right["k2"].to_pylist() if v in left_keys)
    assert n_kept >= n_true
    # 4000 rows, ~1% nominal fpr at this fill: anything under 10% of the
    # input proves real pruning (plain join would ship all 4000)
    assert n_kept < 400, n_kept


def test_hash_join_bloom_full_outer_raises(ray_session):
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="full outer"):
        hash_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                  left_key="k", right_key="k", how="full outer",
                  bloom_right_by_left=True)


def test_global_asof_partition_independent_and_carry(ray_session):
    """Cutpoints place rows in ranges but must NEVER change the result
    (boundary carry makes range edges invisible), including ranges with
    no right rows and left rows before the first right row."""
    import numpy as np
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import global_asof_join

    rng = np.random.RandomState(5)
    lts = np.sort(rng.uniform(0, 100, 300))
    left = pa.table({"lid": pa.array(list(range(300)), pa.int64()),
                     "lts": pa.array(lts, pa.float64())})
    rts = np.unique(rng.uniform(5, 90, 40))
    right = pa.table({"rts": pa.array(rts, pa.float64()),
                      "rv": pa.array(np.arange(len(rts)), pa.int64())})

    def mk(t, n):
        return ray.data.from_arrow(t).repartition(n)

    want = pd.merge_asof(left.to_pandas(), right.to_pandas(),
                         left_on="lts", right_on="rts")
    outs = []
    for cuts in (np.array([50.0]),
                 np.array([10.0, 20.0, 30.0, 95.0]),  # empty tail range
                 np.empty(0)):
        out = global_asof_join(mk(left, 5), mk(right, 3),
                               left_ts="lts", right_ts="rts",
                               cutpoints=cuts).sort_by([("lid", "ascending")])
        outs.append(out)
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
    got = outs[0].to_pandas()
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()
    # left rows before the first right row carry typed nulls
    assert got["rv"].isna().sum() == want["rv"].isna().sum() > 0


def test_global_asof_duplicate_right_ts_raises(ray_session):
    import numpy as np
    import ray.data

    from yaschva_ray.engine.joins import global_asof_join

    left = pa.table({"lid": pa.array([0], pa.int64()),
                     "lts": pa.array([5.0], pa.float64())})
    right = pa.table({"rts": pa.array([1.0, 1.0], pa.float64()),
                      "rv": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="UNIQUE right timestamps"):
        global_asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right),
                         left_ts="lts", right_ts="rts",
                         cutpoints=np.empty(0))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _floats = st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(_floats, min_size=1, max_size=60),
           st.lists(_floats, min_size=0, max_size=25, unique=True),
           st.lists(_floats, min_size=0, max_size=4, unique=True))
    def test_global_asof_matches_pandas_random(lts, rts, cuts):
        """Randomized differential vs pandas merge_asof: arbitrary left
        timestamps, unique right timestamps, arbitrary cutpoints (which
        must never change the result)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from yaschva_ray.engine.joins import global_asof_join

        left = pa.table({"lid": pa.array(list(range(len(lts))), pa.int64()),
                         "lts": pa.array(lts, pa.float64())})
        right = pa.table({
            "rts": pa.array(sorted(rts), pa.float64()),
            "rv": pa.array(list(range(len(rts))), pa.int64())})
        got = global_asof_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right),
            left_ts="lts", right_ts="rts",
            cutpoints=np.array(sorted(cuts), dtype=np.float64))
        got = got.sort_by([("lid", "ascending")]).to_pandas()
        want = pd.merge_asof(
            left.to_pandas().sort_values("lts", kind="mergesort"),
            right.to_pandas(), left_on="lts", right_on="rts") \
            .sort_values("lid").reset_index(drop=True)
        assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()
except ImportError:  # pragma: no cover
    pass


def test_bloom_bits_rounding(ray_session):
    """Review finding: a non-multiple-of-64 bloom_bits indexed past the
    bitmap's last word.  Rounding is shared by build and prefilter."""
    import numpy as np
    import ray.data

    from yaschva_ray.engine.joins import bloom_prefilter, build_bloom

    left = pa.table({"k": pa.array(list(range(100)), pa.int64())})
    right = pa.table({"k2": pa.array([5, 50, 5000], pa.int64())})
    bits = 10_000_001  # deliberately unaligned
    bref = build_bloom(ray.data.from_arrow(left), "k", num_bits=bits)
    kept = bloom_prefilter(ray.data.from_arrow(right), "k2", bref,
                           num_bits=bits).take_all()
    ids = sorted(r["k2"] for r in kept)
    assert 5 in ids and 50 in ids  # true matches always survive


def test_hash_join_skew_split_inner_equals_unsplit(ray_session):
    """Planted hot key on BOTH sides: the skew grid split (S_l x S_r
    virtual cells) produces the exact same pair multiset as the plain
    path — every pair matched in exactly one cell, none duplicated."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(21)
    lk = np.concatenate([np.full(800, 7), rng.randint(100, 160, 400)])
    rk = np.concatenate([np.full(600, 7), rng.randint(130, 200, 300)])
    lt = pa.table({"k": pa.array(lk, type=pa.int64()),
                   "lv": pa.array(np.arange(len(lk)), pa.int64())})
    rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                   "rv": pa.array(np.arange(len(rk)), pa.int64())})

    def run(**kw):
        out = hash_join(ray.data.from_arrow(lt).repartition(6),
                        ray.data.from_arrow(rt).repartition(4),
                        left_key="k", right_key="rk", num_buckets=5, **kw)
        return (out.to_pandas().sort_values(["lv", "rv"])
                .reset_index(drop=True))

    base = run()
    split = run(skew_split=True, max_key_rows=100)  # S_l=8, S_r=6
    pd.testing.assert_frame_equal(split[base.columns.tolist()], base)
    assert (base["k"] == 7).sum() == 800 * 600  # the hot cross product


def test_hash_join_skew_split_left_outer(ray_session):
    """Left outer under skew splits only the LEFT side (each left row in
    exactly one cell keeps unmatched-null emission duplicate-free);
    dangling left keys still emit exactly one typed-null row."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(22)
    lk = np.concatenate([np.full(700, 3), rng.randint(100, 140, 300),
                         np.array([999, 998])])      # dangling
    rk = np.concatenate([np.full(90, 3), rng.randint(120, 160, 200)])
    lt = pa.table({"k": pa.array(lk, type=pa.int64()),
                   "lv": pa.array(np.arange(len(lk)), pa.int64())})
    rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                   "rv": pa.array(np.arange(len(rk)), pa.int64())})

    def run(**kw):
        out = hash_join(ray.data.from_arrow(lt).repartition(5),
                        ray.data.from_arrow(rt).repartition(3),
                        left_key="k", right_key="rk",
                        how="left outer", num_buckets=4, **kw)
        return (out.to_pandas().sort_values(["lv", "rv"])
                .reset_index(drop=True))

    base = run()
    split = run(skew_split=True, max_key_rows=100)   # S_l=7, S_r forced 1
    pd.testing.assert_frame_equal(split[base.columns.tolist()], base)
    assert (split["k"] == 999).sum() == 1            # no null-row dupes
    assert split.loc[split["k"] == 999, "rv"].isna().all()


def test_hash_join_skew_noop_without_hot_keys(ray_session):
    """skew_split with nothing over the threshold takes the plain path
    (no __cell column, identical output)."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(23)
    lt = pa.table({"k": pa.array(rng.randint(0, 50, 400), pa.int64()),
                   "lv": pa.array(np.arange(400), pa.int64())})
    rt = pa.table({"rk": pa.array(rng.randint(25, 75, 300), pa.int64()),
                   "rv": pa.array(np.arange(300), pa.int64())})
    base = hash_join(ray.data.from_arrow(lt).repartition(4),
                     ray.data.from_arrow(rt).repartition(3),
                     left_key="k", right_key="rk", num_buckets=4)
    split = hash_join(ray.data.from_arrow(lt).repartition(4),
                      ray.data.from_arrow(rt).repartition(3),
                      left_key="k", right_key="rk", num_buckets=4,
                      skew_split=True, max_key_rows=1000)
    b = base.to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    s = split.to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s[b.columns.tolist()], b)
    assert "__cell" not in split.column_names


def test_hash_join_skew_full_outer_now_supported(ray_session):
    """Full outer + skew_split no longer refuses (round 5): the
    null-drop ownership rule makes replication safe; on a tiny
    no-hot-key input the skew plan degrades to the plain exchange."""
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "lv": pa.array([1, 2], pa.int64())})
    r = pa.table({"rk": pa.array([1, 3], pa.int64()),
                  "rv": pa.array([10, 30], pa.int64())})
    out = hash_join(ray.data.from_arrow(t), ray.data.from_arrow(r),
                    left_key="k", right_key="rk", how="full outer",
                    skew_split=True, num_buckets=2)
    assert out.num_rows == 3  # matched 1, unmatched-left 2, unmatched-right 3


def test_hh_detection_lower_bound(ray_session):
    """The merged heavy-hitter counts are exact for a planted hot key
    concentrated in real blocks (and never overestimate)."""
    import ray as _ray

    from yaschva_ray.engine.joins import (_hh_combine, _hh_partial,
                                          _hh_tree)

    rng = np.random.RandomState(24)
    blocks = []
    for i in range(7):
        ks = np.concatenate([np.full(500, 42),
                             rng.randint(1000, 9000, 700)])
        blocks.append(pa.table({"k": pa.array(ks, type=pa.int64())}))
    part = _ray.remote(_hh_partial)
    refs = [part.remote(b, "k", 64) for b in blocks]
    merged = _ray.get(_hh_tree(refs, 64))
    counts = dict(zip(merged["k"].to_pylist(), merged["n"].to_pylist()))
    assert counts[42] == 7 * 500  # concentrated key counted exactly


def test_hash_join_cell_payload_column_untouched(ray_session):
    """Review finding: a user payload column named __cell must ride
    through the PLAIN path as data (never hijacked as a join key), and
    the skew path must reject it loudly."""
    import pytest as _pytest
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    lt = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "__cell": pa.array([10, 20], pa.int64())})
    rt = pa.table({"rk": pa.array([1, 2], pa.int64()),
                   "rv": pa.array([5, 6], pa.int64())})
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_key="k", right_key="rk", num_buckets=2)
    assert out.num_rows == 2 and "__cell" in out.column_names
    assert sorted(out["__cell"].to_pylist()) == [10, 20]
    hot_lt = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                       "__cell": pa.array([10, 20, 30, 40], pa.int64())})
    with _pytest.raises(Exception, match="__cell"):
        hash_join(ray.data.from_arrow(hot_lt), ray.data.from_arrow(rt),
                  left_key="k", right_key="rk", num_buckets=2,
                  skew_split=True, max_key_rows=1)


def test_session_windows_string_keys_with_nulls(ray_session):
    """Review finding: the null-safe session kernel must stay
    type-generic — string keys (with and without nulls) sessionize."""
    import ray.data

    from yaschva_ray.engine.windows import session_windows

    t = pa.table({
        "k": pa.array(["a", "a", "b", None, None, "a"], pa.string()),
        "t": pa.array([0, 10**6 * 3600, 5, 7, 9, 2 * 10**6 * 3600],
                      pa.timestamp("us")),
    })
    out = session_windows(ray.data.from_arrow(t), key="k", ts="t",
                          gap_s=60, num_buckets=2)
    got = out.to_pandas()
    assert (got["k"] == "a").sum() == 3      # three gap-split sessions
    assert (got["k"] == "b").sum() == 1
    assert got["k"].isna().sum() == 1        # nulls form one partition
    assert got.loc[got["k"].isna(), "n_events"].tolist() == [2]


def test_asof_join_date_left_ts_with_nulls(ray_session):
    """Review finding: a date32 left_ts bucket holding BOTH merged rows
    (cast to timestamp for merge_asof) and null-path rows must restore
    the original type so its pieces concat."""
    import ray.data

    from yaschva_ray.engine.joins import asof_join

    left = pa.table({
        "lk": pa.array([1, 1, None], pa.int64()),
        "lts": pa.array([5, None, 3], pa.date32()),
        "lv": pa.array([10, 11, 12], pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([1, 1], pa.int64()),
        "rts": pa.array([1, 4], pa.date32()),
        "rv": pa.array([100, 101], pa.int64()),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="lk", right_key="rk",
                    left_ts="lts", right_ts="rts", num_buckets=2)
    assert out.num_rows == 3
    assert pa.types.is_date32(out.schema.field("lts").type)
    got = {r["lv"]: r["rv"] for r in out.to_pylist()}
    assert got == {10: 101, 11: None, 12: None}


def test_hash_join_skew_left_outer_right_hot_only_noop(ray_session):
    """Review finding: a key hot only on the RIGHT under a left outer
    join clamps to a 1x1 'split' — it must take the plain path (no
    replication, identical output)."""
    import pandas as pd
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    rng = np.random.RandomState(25)
    lt = pa.table({"k": pa.array(rng.randint(0, 10, 50), pa.int64()),
                   "lv": pa.array(np.arange(50), pa.int64())})
    rk = np.concatenate([np.full(400, 3), rng.randint(5, 15, 100)])
    rt = pa.table({"rk": pa.array(rk, type=pa.int64()),
                   "rv": pa.array(np.arange(len(rk)), pa.int64())})

    def run(**kw):
        out = hash_join(ray.data.from_arrow(lt).repartition(3),
                        ray.data.from_arrow(rt).repartition(3),
                        left_key="k", right_key="rk",
                        how="left outer", num_buckets=3, **kw)
        return (out.to_pandas().sort_values(["lv", "rv"])
                .reset_index(drop=True))

    base = run()
    split = run(skew_split=True, max_key_rows=100)
    pd.testing.assert_frame_equal(split[base.columns.tolist()], base)


def test_asof_skew_split_equals_plain_on_hot_key(ray_session, caplog):
    """skew_split time-bands a hot key across reduce tasks and restores
    exactness via boundary carry — output must EQUAL the plain path on
    data with unique timestamps (the tie-free contract)."""
    import logging

    import ray.data

    rng = np.random.RandomState(7)
    # hot key 99: 4000 left + 3000 right rows; plus 30 normal keys;
    # all timestamps unique per side (permutations) so ties can't
    # make the two paths pick different-but-equally-correct rows
    n_hot_l, n_hot_r, n_cold = 4000, 3000, 600
    lts = rng.permutation(50_000)[:n_hot_l + n_cold]
    rts = rng.permutation(50_000)[:n_hot_r + n_cold] + 100_000
    # interleave right ts below/above left range so carries matter:
    # half the right rows sit early, half late
    rts = np.concatenate([rts[: (n_hot_r + n_cold) // 2] - 100_000 - 60_000,
                          rts[(n_hot_r + n_cold) // 2:]])
    lkeys = np.concatenate([np.full(n_hot_l, 99),
                            rng.randint(0, 30, n_cold)])
    rkeys = np.concatenate([np.full(n_hot_r, 99),
                            rng.randint(0, 30, n_cold)])
    left = pa.table({"lid": pa.array(np.arange(len(lkeys)), pa.int64()),
                     "k": pa.array(lkeys, pa.int64()),
                     "t": pa.array(lts, pa.int64())})
    right = pa.table({"k2": pa.array(rkeys, pa.int64()),
                      "t2": pa.array(rts[:len(rkeys)], pa.int64()),
                      "v": pa.array(np.arange(len(rkeys)), pa.int64())})

    def run(**kw):
        out = asof_join(
            ray.data.from_arrow(left).repartition(8),
            ray.data.from_arrow(right).repartition(8),
            left_key="k", right_key="k2", left_ts="t", right_ts="t2",
            num_buckets=4, **kw)
        return out.sort_by([("lid", "ascending")])

    plain = run()
    with caplog.at_level(logging.WARNING):
        banded = run(skew_split=True, max_key_rows=500, max_bands=8)
    assert any("time-banding" in r.message for r in caplog.records)
    assert banded.column_names == plain.column_names
    assert banded.equals(plain)
    # sanity: the hot key genuinely matched across band boundaries
    hot = banded.filter(pa.compute.equal(banded["k"], 99))
    assert hot.num_rows == n_hot_l
    assert pa.compute.sum(pa.compute.cast(
        pa.compute.is_valid(hot["t2"]), pa.int64())).as_py() > 0


def test_asof_skew_split_null_semantics_match_plain(ray_session):
    """NULL keys/timestamps keep the pinned three-valued semantics under
    banding (null-left emits typed-null right; null-right drops)."""
    import ray.data

    rng = np.random.RandomState(11)
    n = 1500
    lts = rng.permutation(40_000)[:n].astype("int64")
    rts = rng.permutation(40_000)[:n].astype("int64")
    lt = pa.array([None if i % 97 == 0 else int(v)
                   for i, v in enumerate(lts)], pa.int64())
    lk = pa.array([None if i % 101 == 0 else 7 for i in range(n)],
                  pa.int64())
    rt = pa.array([None if i % 89 == 0 else int(v)
                   for i, v in enumerate(rts)], pa.int64())
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "k": lk, "t": lt})
    right = pa.table({"k2": pa.array(np.full(n, 7), pa.int64()),
                      "t2": rt,
                      "v": pa.array(np.arange(n), pa.int64())})

    def run(**kw):
        return asof_join(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(6),
            left_key="k", right_key="k2", left_ts="t", right_ts="t2",
            num_buckets=3, **kw).sort_by([("lid", "ascending")])

    plain = run()
    banded = run(skew_split=True, max_key_rows=200, max_bands=6)
    assert banded.equals(plain)


def test_asof_skew_split_no_hot_keys_falls_back(ray_session):
    """With every key under the threshold the skew plan degrades to the
    plain exchange over the same snapshotted refs (no banding)."""
    import ray.data

    rng = np.random.RandomState(5)
    n = 400
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "k": pa.array(rng.randint(0, 50, n), pa.int64()),
                     "t": pa.array(rng.permutation(9000)[:n], pa.int64())})
    right = pa.table({"k2": pa.array(rng.randint(0, 50, n), pa.int64()),
                      "t2": pa.array(rng.permutation(9000)[:n], pa.int64()),
                      "v": pa.array(np.arange(n), pa.int64())})

    def run(**kw):
        return asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="k", right_key="k2", left_ts="t", right_ts="t2",
            num_buckets=4, **kw).sort_by([("lid", "ascending")])

    assert run(skew_split=True, max_key_rows=1000).equals(run())


def test_events_asof_hotkey_query_matches_duckdb(ray_session):
    """The sweep query that drives skew_split end-to-end: 1/3 of events
    collapse onto key -1, the banded path activates (3+ bands), and the
    result hash-matches DuckDB's ASOF on the same key collapse."""
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["events_asof_hotkey"](sf)
    con = duckdb.connect()
    for tbl in ("events", "orders"):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{sf}/{tbl}.parquet')")
    ora = con.execute(entry.oracle_sql()["events_asof_hotkey"]).arrow()
    assert out.equals(ora.cast(out.schema))


def test_session_windows_skew_split_equals_plain(ray_session, caplog):
    """Banded sessionization + driver chain merge must equal the plain
    path exactly — including cross-band session stitching and the
    first-null-row attach rule."""
    import datetime
    import logging

    import ray.data

    from yaschva_ray.engine.windows import session_windows

    rng = np.random.RandomState(13)
    base = datetime.datetime(2024, 1, 1)
    # hot user 5: 3000 events in bursts (sessions span band cuts);
    # 25 cold users; some null timestamps on the hot user
    rows_u, rows_t = [], []
    t = 0
    for i in range(3000):
        # bursts of ~20 events 10s apart, then a 3600s jump
        t += 10 if i % 20 else 3600
        rows_u.append(5)
        rows_t.append(base + datetime.timedelta(seconds=t))
    for i in range(500):
        rows_u.append(int(rng.randint(100, 125)))
        rows_t.append(base + datetime.timedelta(
            seconds=int(rng.randint(0, 200_000))))
    # null timestamps: 3 on the hot user, 2 on a cold user
    rows_u += [5, 5, 5, 101, 101]
    rows_t += [None] * 5
    events = pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "ts": pa.array(rows_t, pa.timestamp("us"))})

    def run(**kw):
        return session_windows(
            ray.data.from_arrow(events).repartition(8),
            key="user_id", ts="ts", gap_s=600, num_buckets=4, **kw)

    plain = run()
    with caplog.at_level(logging.WARNING):
        banded = run(skew_split=True, max_key_rows=400, max_bands=8)
    assert any("time-banding" in r.message for r in caplog.records)
    assert banded.equals(plain)
    # the hot user really produced multiple sessions
    hot = plain.filter(pa.compute.equal(plain["user_id"], 5))
    assert hot.num_rows > 100


def test_session_windows_skew_split_rejects_out_dir(ray_session, tmp_path):
    import ray.data

    from yaschva_ray.engine.windows import session_windows

    events = pa.table({"user_id": pa.array([1], pa.int64()),
                       "ts": pa.array([0], pa.int64()).cast(
                           pa.timestamp("us"))})
    with pytest.raises(ValueError, match="skew_split"):
        session_windows(ray.data.from_arrow(events), key="user_id",
                        ts="ts", gap_s=60, skew_split=True,
                        out_dir=str(tmp_path))


def test_asof_skew_split_with_out_dir_sinks(ray_session, tmp_path):
    """The banded path composes with per-bucket parquet sinks: band
    columns never reach the files and the union of parts equals the
    gathered banded result."""
    import pyarrow.parquet as pq
    import ray.data

    rng = np.random.RandomState(3)
    n = 1200
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "k": pa.array(np.full(n, 1), pa.int64()),
                     "t": pa.array(rng.permutation(30_000)[:n], pa.int64())})
    right = pa.table({"k2": pa.array(np.full(n, 1), pa.int64()),
                      "t2": pa.array(rng.permutation(30_000)[:n],
                                     pa.int64()),
                      "v": pa.array(np.arange(n), pa.int64())})

    def run(**kw):
        return asof_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(4),
            left_key="k", right_key="k2", left_ts="t", right_ts="t2",
            num_buckets=3, skew_split=True, max_key_rows=200, **kw)

    gathered = run().sort_by([("lid", "ascending")])
    manifest = run(out_dir=str(tmp_path))
    # readers follow the manifest and skip zero-row parts (schema-less)
    files = [r["path"] for r in manifest.to_pylist() if r["n_rows"]]
    parts = pa.concat_tables([pq.read_table(f) for f in files])
    assert "__band" not in parts.column_names
    assert parts.sort_by([("lid", "ascending")]).equals(gathered)


def _hashjoin_case(rng, n_hot_l, n_hot_r, n_cold):
    """(left, right) with one both-sides-hot key 7 and cold keys; some
    cold keys exist on only one side so outer joins emit real
    null-extended rows."""
    lkeys = np.concatenate([np.full(n_hot_l, 7),
                            rng.randint(100, 140, n_cold)])
    rkeys = np.concatenate([np.full(n_hot_r, 7),
                            rng.randint(120, 160, n_cold)])
    left = pa.table({"lid": pa.array(np.arange(len(lkeys)), pa.int64()),
                     "k": pa.array(lkeys, pa.int64())})
    right = pa.table({"k2": pa.array(rkeys, pa.int64()),
                      "rv": pa.array(np.arange(len(rkeys)), pa.int64())})
    return left, right


def _run_hashjoin(left, right, how, **kw):
    import ray.data

    from yaschva_ray.engine.joins import hash_join

    out = hash_join(ray.data.from_arrow(left).repartition(6),
                    ray.data.from_arrow(right).repartition(6),
                    left_key="k", right_key="k2", how=how,
                    num_buckets=4, **kw)
    if not out.num_rows:
        return out
    return out.sort_by([(c, "ascending") for c in out.column_names])


def test_hash_join_left_outer_right_hot_split_equals_plain(ray_session):
    """Right-side splitting under LEFT OUTER is now allowed: the
    null-drop ownership rule removes the cell-level artifacts, so the
    split result equals the plain path exactly."""
    rng = np.random.RandomState(17)
    left, right = _hashjoin_case(rng, n_hot_l=50, n_hot_r=3000,
                                 n_cold=400)
    plain = _run_hashjoin(left, right, "left outer")
    split = _run_hashjoin(left, right, "left outer",
                          skew_split=True, max_key_rows=500)
    assert split.equals(plain)
    # unmatched-left rows (keys 100..119 absent on the right) survived
    import pyarrow.compute as pc
    n_null = plain.num_rows - int(pc.sum(pc.cast(pc.is_valid(
        plain["rv"]), pa.int64())).as_py())
    assert n_null > 0


def test_hash_join_full_outer_both_hot_split_equals_plain(ray_session):
    """FULL OUTER with a key hot on BOTH sides splits on both axes; the
    two null-drop rules keep exactly the genuinely-unmatched rows."""
    rng = np.random.RandomState(19)
    left, right = _hashjoin_case(rng, n_hot_l=2000, n_hot_r=2500,
                                 n_cold=400)
    plain = _run_hashjoin(left, right, "full outer")
    split = _run_hashjoin(left, right, "full outer",
                          skew_split=True, max_key_rows=400)
    assert split.equals(plain)
    import pyarrow.compute as pc
    # both directions of unmatched rows exist in the expected output
    assert plain.filter(pc.is_null(plain["rv"])).num_rows > 0
    assert plain.filter(pc.is_null(plain["lid"])).num_rows > 0


def test_hash_join_full_outer_left_hot_no_right_rows(ray_session):
    """A key hot on the LEFT with ZERO right rows: its lefts are
    genuinely unmatched and must all survive the split (the drop rule
    only fires for keys in the OTHER side's split set)."""
    rng = np.random.RandomState(23)
    n = 1500
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "k": pa.array(np.full(n, 9), pa.int64())})
    right = pa.table({"k2": pa.array(rng.randint(100, 120, 200),
                                     pa.int64()),
                      "rv": pa.array(np.arange(200), pa.int64())})
    plain = _run_hashjoin(left, right, "full outer")
    split = _run_hashjoin(left, right, "full outer",
                          skew_split=True, max_key_rows=300)
    assert split.equals(plain)
    import pyarrow.compute as pc
    hot = plain.filter(pc.fill_null(pc.equal(plain["k"], 9), False))
    assert hot.num_rows == n
    assert all(v is None for v in hot["rv"].to_pylist())


def test_asof_join_forward_vs_bruteforce(ray_session):
    """direction='forward': earliest right row at or after each left
    timestamp, per key — brute-force checked."""
    import ray.data

    rng = np.random.RandomState(31)
    n_l, n_r = 400, 300
    lkeys = rng.randint(0, 30, n_l)
    lts = rng.randint(0, 10_000, n_l)
    rkeys = rng.randint(0, 40, n_r)
    rts = rng.randint(0, 10_000, n_r)
    left = pa.table({"lid": pa.array(np.arange(n_l), pa.int64()),
                     "k": pa.array(lkeys, pa.int64()),
                     "t": pa.array(lts, pa.int64())})
    right = pa.table({"k2": pa.array(rkeys, pa.int64()),
                      "t2": pa.array(rts, pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_key="k", right_key="k2", left_ts="t",
                    right_ts="t2", num_buckets=4, direction="forward")
    got = {r["lid"]: r["t2"] for r in out.to_pylist()}
    for i in range(n_l):
        cand = rts[(rkeys == lkeys[i]) & (rts >= lts[i])]
        want = int(cand.min()) if len(cand) else None
        assert got.get(i) == want, (i, got.get(i), want)


def test_asof_forward_skew_split_equals_plain(ray_session):
    """Forward direction under skew banding: the symmetric
    (earliest-of-higher-bands) carry restores exactness — banded equals
    plain on tie-free data."""
    import ray.data

    rng = np.random.RandomState(37)
    n_hot_l, n_hot_r, n_cold = 3000, 2500, 500
    lts = rng.permutation(60_000)[:n_hot_l + n_cold]
    rts = rng.permutation(60_000)[:n_hot_r + n_cold] + 120_000
    # half the rights EARLY, half far LATE so forward carries matter
    half = (n_hot_r + n_cold) // 2
    rts = np.concatenate([rts[:half] - 120_000 - 70_000,
                          rts[half:]])
    lkeys = np.concatenate([np.full(n_hot_l, 42),
                            rng.randint(0, 25, n_cold)])
    rkeys = np.concatenate([np.full(n_hot_r, 42),
                            rng.randint(0, 25, n_cold)])
    left = pa.table({"lid": pa.array(np.arange(len(lkeys)), pa.int64()),
                     "k": pa.array(lkeys, pa.int64()),
                     "t": pa.array(lts, pa.int64())})
    right = pa.table({"k2": pa.array(rkeys, pa.int64()),
                      "t2": pa.array(rts[:len(rkeys)], pa.int64()),
                      "v": pa.array(np.arange(len(rkeys)), pa.int64())})

    def run(**kw):
        return asof_join(
            ray.data.from_arrow(left).repartition(8),
            ray.data.from_arrow(right).repartition(8),
            left_key="k", right_key="k2", left_ts="t", right_ts="t2",
            num_buckets=4, direction="forward", **kw) \
            .sort_by([("lid", "ascending")])

    plain = run()
    banded = run(skew_split=True, max_key_rows=400, max_bands=8)
    assert banded.equals(plain)
    hot = plain.filter(pa.compute.equal(plain["k"], 42))
    assert pa.compute.sum(pa.compute.cast(
        pa.compute.is_valid(hot["t2"]), pa.int64())).as_py() > 0
