"""Unit tests for the sketch primitives (no Ray needed)."""

import numpy as np
import pyarrow as pa

from yaschva_ray.engine.sketches import (
    ColumnSketch,
    HyperLogLog,
    LogHistogram,
    TDigest,
    _hash64,
    ks_statistic,
    psi,
)


def test_hll_accuracy():
    rng = np.random.RandomState(0)
    for true_n in (100, 10_000, 1_000_000):
        h = HyperLogLog()
        # full-width 64-bit hashes (two 32-bit halves)
        hi = rng.randint(0, 2**32, true_n).astype(np.uint64) << np.uint64(32)
        lo = rng.randint(0, 2**32, true_n).astype(np.uint64)
        h.add_hashes(hi | lo)
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.RandomState(1)
    a_vals = rng.randint(0, 2**63, 50_000).astype(np.uint64)
    b_vals = rng.randint(0, 2**63, 50_000).astype(np.uint64)
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.add_hashes(a_vals)
    b.add_hashes(b_vals)
    u.add_hashes(np.concatenate([a_vals, b_vals]))
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)


def test_tdigest_quantiles():
    rng = np.random.RandomState(2)
    vals = rng.randn(200_000)
    d = TDigest()
    for chunk in np.array_split(vals, 20):
        d.add(chunk)
    for q, expected in ((0.5, 0.0), (0.25, -0.674), (0.75, 0.674), (0.99, 2.326)):
        assert abs(d.quantile(q) - expected) < 0.03, (q, d.quantile(q))


def test_tdigest_merge():
    rng = np.random.RandomState(3)
    a, b = TDigest(), TDigest()
    a.add(rng.randn(50_000))
    b.add(rng.randn(50_000) + 0.0)
    a.merge(b)
    assert abs(a.quantile(0.5)) < 0.03


def test_log_histogram_quantiles_and_determinism():
    rng = np.random.RandomState(4)
    vals = np.abs(rng.randn(100_000)) * 100 + 1
    # partition-independence: different batchings give IDENTICAL state
    h1, h2 = LogHistogram(), LogHistogram()
    h1.add(vals)
    for chunk in np.array_split(vals, 13):
        h2.add(chunk)
    assert np.array_equal(h1.counts, h2.counts)
    assert h1.quantile(0.5) == h2.quantile(0.5)
    # ~5% relative quantile accuracy
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(vals, q)
        assert abs(h1.quantile(q) - exact) / exact < 0.06, (q, h1.quantile(q), exact)


def test_log_histogram_negative_and_merge_commutes():
    rng = np.random.RandomState(5)
    a_vals = rng.randn(10_000) * 50
    b_vals = rng.randn(10_000) * 50 + 10
    ab, ba = LogHistogram(), LogHistogram()
    x, y = LogHistogram(), LogHistogram()
    x.add(a_vals)
    y.add(b_vals)
    ab.add(a_vals)
    ab_other = LogHistogram()
    ab_other.add(b_vals)
    ab.merge(ab_other)
    ba.add(b_vals)
    ba_other = LogHistogram()
    ba_other.add(a_vals)
    ba.merge(ba_other)
    assert np.array_equal(ab.counts, ba.counts)


def test_drift_psi_ks():
    rng = np.random.RandomState(6)
    base, same, shifted = LogHistogram(), LogHistogram(), LogHistogram()
    base.add(np.abs(rng.randn(50_000)) + 1)
    same.add(np.abs(rng.randn(50_000)) + 1)
    shifted.add(np.abs(rng.randn(50_000)) * 2 + 3)
    assert psi(base, same) < 0.02
    assert psi(base, shifted) > 0.25
    assert ks_statistic(base, same) < 0.02
    assert ks_statistic(base, shifted) > 0.3


def test_column_sketch_summary():
    sk = ColumnSketch(numeric=True)
    sk.update(pa.array([1.0, 2.0, None, 4.0, 4.0]))
    s = sk.summary()
    assert s["count"] == 5 and s["nulls"] == 1
    assert s["min"] == 1.0 and s["max"] == 4.0
    assert s["sum"] == 11.0
    assert 2 <= s["distinct_est"] <= 4


def test_hash64_stability():
    a = _hash64(pa.array(["x", "y", "x"]))
    b = _hash64(pa.array(["x", "y", "x"]))
    assert np.array_equal(a, b)
    assert a[0] == a[2] and a[0] != a[1]


def test_hash64_length_preserving_with_nulls():
    # round-1 ADVICE (medium): callers align hashes positionally with
    # full-length tables — null slots must hash, not shrink the output
    import numpy as np
    import pyarrow as pa

    from yaschva_ray.engine.sketches import _hash64

    arr = pa.array(["a", None, "b", None, "a"], pa.string())
    h = _hash64(arr)
    assert len(h) == len(arr)
    assert h[0] == h[4]  # equal values hash equal
    assert h[1] == h[3]  # nulls hash to a fixed deterministic value
    ints = pa.array([1, None, 2], pa.int64())
    assert len(_hash64(ints)) == 3


def test_drift_pipeline_detects_planted_shift(ray_session, tmp_path):
    """E2E drift: an events table where one type's value distribution is
    shifted must surface high PSI/KS for exactly that type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_drift_events_value

    rng = np.random.RandomState(11)
    n = 20_000
    rows_type, rows_val, rows_id = [], [], []
    for et, (mul, off) in (("view", (1.0, 1.0)), ("click", (1.0, 1.0)),
                           ("purchase", (4.0, 9.0))):  # planted shift
        rows_type += [et] * n
        rows_val += list(np.abs(rng.randn(n)) * mul + off)
        rows_id += list(range(len(rows_id), len(rows_id) + n))
    pq.write_table(pa.table({"event_id": pa.array(rows_id, pa.int64()),
                             "event_type": pa.array(rows_type, pa.string()),
                             "value": pa.array(rows_val, pa.float64())}),
                   tmp_path / "events.parquet")
    out = q_drift_events_value(str(tmp_path))
    by_type = {r["event_type"]: r for r in out.to_pylist()}
    assert by_type["purchase"]["psi"] > 0.25
    assert by_type["click"]["psi"] < 0.05
    # deterministic (partition-independent histogram partials)
    assert out.equals(q_drift_events_value(str(tmp_path)))


def test_drift_fixed_bins_exact_integers(ray_session, tmp_path):
    """The exact drift check: integer TVD/KS numerators match a
    brute-force computation, a planted shift dominates, and an
    identical distribution gives zero drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import (_DRIFT_BIN_MAX, _DRIFT_BIN_WIDTH,
                                           q_drift_events_fixed_bins)

    rng = np.random.RandomState(7)
    n = 10_000
    vals = {"view": rng.uniform(0, 200, n),
            "click": None,              # exact copy of view -> zero drift
            "purchase": rng.uniform(300, 900, n)}  # planted shift
    vals["click"] = vals["view"].copy()
    rows_type, rows_val = [], []
    for et, v in vals.items():
        rows_type += [et] * n
        rows_val += list(v)
    pq.write_table(pa.table({"event_type": pa.array(rows_type, pa.string()),
                             "value": pa.array(rows_val, pa.float64())}),
                   tmp_path / "events.parquet")
    out = q_drift_events_fixed_bins(str(tmp_path))
    by_type = {r["event_type"]: r for r in out.to_pylist()}
    assert by_type["click"]["tvd_num"] == 0
    assert by_type["click"]["ks_num"] == 0
    # purchase is fully disjoint from view: TVD numerator = 2*N*M, KS = N*M
    assert by_type["purchase"]["tvd_num"] == 2 * n * n
    assert by_type["purchase"]["ks_num"] == n * n

    # brute-force check of the numerators for a non-trivial overlap
    def brute(a, b):
        bins = np.arange(_DRIFT_BIN_MAX + 1)
        ha = np.histogram(np.minimum(np.floor(a / _DRIFT_BIN_WIDTH),
                                     _DRIFT_BIN_MAX),
                          bins=np.append(bins, _DRIFT_BIN_MAX + 1))[0]
        hb = np.histogram(np.minimum(np.floor(b / _DRIFT_BIN_WIDTH),
                                     _DRIFT_BIN_MAX),
                          bins=np.append(bins, _DRIFT_BIN_MAX + 1))[0]
        na, nb_ = ha.sum(), hb.sum()
        tvd = int(np.abs(hb * na - ha * nb_).sum())
        ks = int(np.abs(np.cumsum(hb) * na - np.cumsum(ha) * nb_).max())
        return tvd, ks

    shifted = vals["view"] * 1.3 + 40
    pq.write_table(pa.table({
        "event_type": pa.array(["view"] * n + ["mix"] * n, pa.string()),
        "value": pa.array(list(vals["view"]) + list(shifted),
                          pa.float64())}), tmp_path / "events.parquet")
    out2 = q_drift_events_fixed_bins(str(tmp_path))
    row = out2.to_pylist()[0]
    tvd, ks = brute(vals["view"], shifted)
    assert (row["tvd_num"], row["ks_num"]) == (tvd, ks)
    # deterministic across runs (partition-independent integer partials)
    assert out2.equals(q_drift_events_fixed_bins(str(tmp_path)))


def test_drift_fixed_bins_negative_and_nan_values(ray_session, tmp_path):
    """Negative values clamp to bin 0 (no wrap into the previous type's
    top bin) and non-finite values are excluded — mirroring the SQL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_drift_events_fixed_bins

    vals = ([-50.0, -1.0, 5.0, float("nan"), float("inf")] * 100
            + [5.0] * 500)
    types = (["view"] * 500) + (["click"] * 500)
    pq.write_table(pa.table({"event_type": pa.array(types, pa.string()),
                             "value": pa.array(vals, pa.float64())}),
                   tmp_path / "events.parquet")
    out = q_drift_events_fixed_bins(str(tmp_path))
    row = out.to_pylist()[0]
    # view: 100×(-50), 100×(-1), 100×5 finite -> bins {0: 300}; click:
    # 500×5 -> {0: 500}; identical single-bin distributions -> zero drift
    assert row["event_type"] == "click"
    assert (row["n_rows"], row["n_base"]) == (500, 300)
    assert row["tvd_num"] == 0 and row["ks_num"] == 0
