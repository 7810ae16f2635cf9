"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() DuckDB result at sf0.01 (row count + schema + sorted values)."""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.reset_index(drop=True)


def pairs():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in qs]


@pytest.mark.parametrize("name,fn,sql", pairs(), ids=[p[0] for p in pairs()])
def test_query_matches_oracle(ray_session, name, fn, sql):
    result = _to_df(fn(SF_DIR))
    assert result is not None
    if sql is None:
        assert len(result) >= 0  # rows-only check (driver's weaker gate)
        return
    oracle = _duck(sql)
    got = _normalize(result)
    want = _normalize(oracle)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    if len(got):
        for col in got.columns:
            a, b = got[col], want[col]
            assert a.dtype.kind == b.dtype.kind, f"{name}:{col} dtype {a.dtype} vs {b.dtype}"
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                pd.testing.assert_series_equal(a.astype(float).round(6),
                                               b.astype(float).round(6),
                                               check_names=False)
            else:
                assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}:{col}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    result = _to_df(e.entry())
    assert len(result) >= 0
    assert set(result.columns) == {"doc_id", "path", "error"}


def test_jaccard_pairs_counts_match_kernel(ray_session):
    """q_jaccard_pairs' (n_inter, n_union) must reproduce the
    jaccard_ngrams kernel's ratio exactly for every pair."""
    from yaschva_ray.pipelines.ops import q_jaccard_pairs
    from yaschva_ray.pipelines.textops import jaccard_ngrams

    sf = "/root/testdata/sf0.001"
    out = q_jaccard_pairs(sf, k_docs=20)
    import duckdb

    con = duckdb.connect()
    texts = dict(con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        "WHERE doc_id < 20").fetchall())
    for r in out.to_pylist():
        want = jaccard_ngrams(texts[r["doc_a"]] or "", texts[r["doc_b"]] or "")
        assert r["n_inter"] / max(r["n_union"], 1) == want


def test_approx_distinct_users_accuracy(ray_session):
    from yaschva_ray.pipelines.ops import q_approx_distinct_users

    import duckdb

    sf = "/root/testdata/sf0.01"
    got = q_approx_distinct_users(sf)["approx_distinct"][0].as_py()
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert abs(got - exact) / exact <= 0.02


def test_approx_quantiles_track_exact(ray_session):
    from yaschva_ray.pipelines.ops import (q_approx_quantiles_events,
                                           q_events_value_quantiles)

    sf = "/root/testdata/sf0.01"
    approx = q_approx_quantiles_events(sf)
    exact = q_events_value_quantiles(sf)
    pairs = [("p50_approx", "p50_cents"), ("p90_approx", "p90_cents"),
             ("p99_approx", "p99_cents")]
    for acol, ecol in pairs:
        a = approx[acol][0].as_py()
        e = exact[ecol][0].as_py() / 100.0
        assert abs(a - e) <= max(0.1 * abs(e), 0.05), (acol, a, e)
    # partition-independence: the merged sketch must not depend on the
    # block split (same result twice)
    assert q_approx_quantiles_events(sf).equals(approx)


def test_pack_sequences(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from yaschva_ray.pipelines.ops import pack_sequences_from_ds

    def docs(ids, n_words):
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array([" ".join(["w"] * n)
                                           for n in n_words])})

    # two range-disjoint blocks, budget 10: stream = 4,3,5,2,6,4 tokens
    ds = ray.data.from_arrow([docs([0, 1, 2], [4, 3, 5]),
                              docs([3, 4, 5], [2, 6, 4])])
    out = pack_sequences_from_ds(ds, budget=10)
    assert out["doc_id"].to_pylist() == [0, 1, 2, 3, 4, 5]
    assert out["n_tokens"].to_pylist() == [4, 3, 5, 2, 6, 4]
    # starts: 0,4,7,12,14,20 -> packs 0,0,0,1,1,2
    assert out["pack_id"].to_pylist() == [0, 0, 0, 1, 1, 2]
    # pack_id nondecreasing and no pack skipped
    p = np.array(out["pack_id"].to_pylist())
    assert (np.diff(p) >= 0).all() and set(np.diff(p)) <= {0, 1}


def test_pack_sequences_overlap_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from yaschva_ray.pipelines.ops import pack_sequences_from_ds

    t1 = pa.table({"doc_id": pa.array([0, 5], pa.int64()),
                   "text": pa.array(["a b", "c"])})
    t2 = pa.table({"doc_id": pa.array([3, 9], pa.int64()),
                   "text": pa.array(["d", "e f"])})
    with pytest.raises(RuntimeError, match="range-disjoint"):
        pack_sequences_from_ds(ray.data.from_arrow([t1, t2]), budget=4)


def test_metadata_stats_fallback_and_nulls(ray_session, tmp_path):
    """Footer-only stats must be exact across: a normal file, a file
    written WITHOUT statistics (per-file column-scan fallback), an
    all-null row group, and null rows mixed in."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import metadata_stats

    t1 = pa.table({"x": pa.array([1.0, None, 3.0], pa.float64())})
    t2 = pa.table({"x": pa.array([None, None], pa.float64())})  # all-null
    t3 = pa.table({"x": pa.array([-7.5, 2.0], pa.float64())})
    pq.write_table(t1, str(tmp_path / "a.parquet"))
    pq.write_table(t2, str(tmp_path / "b.parquet"))
    pq.write_table(t3, str(tmp_path / "c.parquet"),
                   write_statistics=False)  # forces the scan fallback
    out = metadata_stats(str(tmp_path / "*.parquet"), ["x"])
    assert out.to_pydict() == {"col_name": ["x"], "n_rows": [7],
                               "n_nulls": [3], "min_v": [-7.5],
                               "max_v": [3.0]}


def test_sorted_export_global_order_and_manifest(ray_session, tmp_path):
    """Reading part files in range order must BE the table in key order
    (nulls first), file key-ranges must be disjoint-or-touching, and the
    persisted manifest must match a recount of the written files."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import sorted_export

    rng = np.random.RandomState(11)
    vals = rng.randn(5000).round(3)
    vals[::97] = 1.5  # duplicate value likely to sit on a cutpoint
    arr = vals.tolist()
    arr[17] = None
    arr[4200] = None
    t = pa.table({"id": pa.array(list(range(5000)), pa.int64()),
                  "v": pa.array(arr, pa.float64())})
    cuts = np.sort(vals)[[600, 1800, 2500, 4000]]
    out = str(tmp_path / "sorted")
    manifest = sorted_export(
        ray.data.from_arrow(t).repartition(6), "v", out, cuts)
    assert manifest.num_rows == 5

    m = json.load(open(f"{out}/manifest.json"))
    assert m["key"] == "v"
    files = sorted(m["ranges"], key=lambda r: r["range_id"])
    got = pa.concat_tables([pq.read_table(r["path"]) for r in files])
    vv = got["v"].to_pylist()
    nn = sum(1 for x in vv if x is None)
    assert nn == 2 and vv[0] is None and vv[1] is None  # nulls first
    nonnull = [x for x in vv if x is not None]
    assert nonnull == sorted(nonnull)  # GLOBAL order, no merge needed
    assert sorted(got["id"].to_pylist()) == list(range(5000))  # lossless
    # manifest rows match a recount of the files they point to
    for r in files:
        ft = pq.read_table(r["path"])
        assert ft.num_rows == r["n_rows"]
        assert ft["v"].null_count == r["n_nulls"]
    # boundaries: max of range i <= min of range i+1 (non-empty ranges)
    ne = [r for r in files if r["n_rows"] - r["n_nulls"] > 0]
    for a, b in zip(ne, ne[1:]):
        assert a["max_v"] <= b["min_v"]
    # a duplicated cutpoint value never straddles a boundary
    host = {r["range_id"] for r in files
            if r["min_v"] is not None and r["min_v"] <= 1.5 <= r["max_v"]}
    assert len(host) == 1


def test_lookup_sorted_prunes_and_matches_full_filter(ray_session, tmp_path):
    """Manifest-pruned lookup must equal a full-table filter while reading
    only the parts whose range can contain a probe."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (
        _sorted_lookup_plan, lookup_sorted, sorted_export)

    vals = np.arange(1000, dtype=np.float64)
    t = pa.table({"id": pa.array(list(range(1000)), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    cuts = np.array([250.0, 500.0, 750.0])
    out = str(tmp_path / "sorted")
    sorted_export(ray.data.from_arrow(t).repartition(4), "v", out, cuts)

    got = lookup_sorted(out, [10.0, 760.0])
    assert sorted(got["id"].to_pylist()) == [10, 760]
    # pruning: probes in ranges 0 and 3 → exactly two parts planned
    m = json.load(open(f"{out}/manifest.json"))
    planned = _sorted_lookup_plan(m["ranges"], [10.0, 760.0])
    assert len(planned) == 2
    assert lookup_sorted(out, [99999.0]).num_rows == 0


def test_schema_drift_null_fracs_and_unknown_stats(ray_session, tmp_path):
    """Null fractions come from footer null_counts; a file written without
    statistics must report -1.0 (unknown), never a wrong number."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import schema_drift

    a = pa.table({"x": pa.array([1.0, None, 3.0, None], pa.float64()),
                  "gone": pa.array(["a", "b", "c", "d"])})
    b1 = pa.table({"x": pa.array([None, 2.0], pa.float64()),
                   "neu": pa.array([1, 2], pa.int32())})
    b2 = pa.table({"x": pa.array([5.0], pa.float64()),
                   "neu": pa.array([3], pa.int32())})
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(b1, str(tmp_path / "b1.parquet"))
    pq.write_table(b2, str(tmp_path / "b2.parquet"),
                   write_statistics=False)
    out = schema_drift(str(tmp_path / "a.parquet"),
                       [str(tmp_path / "b1.parquet"),
                        str(tmp_path / "b2.parquet")])
    rows = {r["col_name"]: r for r in out.to_pylist()}
    assert rows["x"]["status"] == "same"
    assert rows["x"]["null_frac_a"] == 0.5
    assert rows["x"]["null_frac_b"] == -1.0  # unknown poisons, not lies
    assert rows["gone"]["status"] == "removed"
    assert rows["neu"]["status"] == "added" and rows["neu"]["type_b"] == "int32"


def test_table_diff_semantics_and_dup_guard(ray_session):
    """added/removed/modified classification incl. null transitions, and
    the duplicate-key guard."""
    import ray.data

    from yaschva_ray.pipelines.ops import table_diff

    a = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array(["x", None, "z", "w"]),
                  "n": pa.array([10, 20, 30, 40], pa.int64())})
    b = pa.table({"k": pa.array([2, 3, 4, 5], pa.int64()),
                  "v": pa.array(["now set", "z", "w", "new"]),
                  "n": pa.array([20, 31, 40, 50], pa.int64())})
    out = table_diff(ray.data.from_arrow(a).repartition(2),
                     ray.data.from_arrow(b).repartition(3), "k")
    assert out.to_pydict() == {
        "key": [1, 2, 3, 5],
        "change": ["removed", "modified", "modified", "added"]}

    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "v": pa.array(["a", "b"])})
    with pytest.raises(Exception, match="duplicate keys"):
        table_diff(ray.data.from_arrow(dup), ray.data.from_arrow(a), "k")


def test_stats_state_lifecycle(ray_session, tmp_path):
    """Committed-update visibility contract: idempotent tags, a crashed
    (uncommitted) update file stays invisible, merged state equals a
    one-shot build over the union."""
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import (
        stats_state_build, stats_state_read, stats_state_update)

    a = pa.table({"x": pa.array([1.0, 2.0, None], pa.float64())})
    b = pa.table({"x": pa.array([10.0, -5.0], pa.float64())})
    sd = str(tmp_path / "state")
    stats_state_build(ray.data.from_arrow(a), ["x"], sd)
    stats_state_update(ray.data.from_arrow(b), sd, "b")
    m = stats_state_update(ray.data.from_arrow(b), sd, "b")  # idempotent
    assert m["updates"] == ["b"]

    # crashed update: file written, tag never committed → invisible
    ghost = pq.read_table(str(tmp_path / "state" / "update-b.parquet"))
    pq.write_table(ghost, str(tmp_path / "state" / "update-ghost.parquet"))

    got = stats_state_read(sd)
    union = str(tmp_path / "union")
    stats_state_build(
        ray.data.from_arrow(pa.concat_tables([a, b])), ["x"], union)
    assert got.equals(stats_state_read(union))
    assert got.to_pydict()["n_rows"] == [5]
    assert got.to_pydict()["min_v"] == [-5.0]


def test_sorted_export_hot_range_warning(ray_session, tmp_path, caplog):
    """A range concentrating rows (skewed keys or estimated cutpoints)
    must log the hot-range warning — one range = one sort+write task, so
    the hazard has to be observable, never a silent OOM."""
    import logging

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import sorted_export

    n = 200_000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64))})
    # 8 ranges whose cutpoints shove ~all rows into the last one (with B
    # ranges max/mean is bounded by B, so the 4x bar needs B > 4)
    cuts = np.arange(10, 80, 10, dtype=np.int64)
    with caplog.at_level(logging.WARNING, logger="yaschva_ray.ops"):
        sorted_export(ray.data.from_arrow(t).repartition(4), "k",
                      str(tmp_path / "hot"), cuts)
    assert any("hottest range" in r.message for r in caplog.records)


def test_sorted_export_reexport_never_overwrites_committed(
        ray_session, tmp_path):
    """Re-exporting into a live directory must be crash-safe: the new
    generation writes to DISJOINT filenames (a committed part is never
    opened for write), the manifest commit flips snapshots atomically,
    and only then are the old generation's parts removed."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import sorted_export

    out = str(tmp_path / "sorted")
    t1 = pa.table({"id": pa.array(list(range(100)), pa.int64()),
                   "v": pa.array(np.arange(100, dtype=np.float64))})
    m1 = sorted_export(ray.data.from_arrow(t1).repartition(3), "v", out,
                       np.array([30.0, 60.0]))
    old_paths = set(m1["path"].to_pylist())
    assert json.load(open(f"{out}/manifest.json"))["export_gen"] == 0

    t2 = pa.table({"id": pa.array(list(range(500)), pa.int64()),
                   "v": pa.array(np.arange(500, 1000, dtype=np.float64))})
    m2 = sorted_export(ray.data.from_arrow(t2).repartition(4), "v", out,
                       np.array([600.0, 700.0, 800.0]))
    new_paths = set(m2["path"].to_pylist())
    # the crash-safety invariant: generations never share a filename
    assert not (old_paths & new_paths)
    assert json.load(open(f"{out}/manifest.json"))["export_gen"] == 1
    # post-commit cleanup removed the stale generation entirely
    import glob as _glob

    on_disk = set(_glob.glob(f"{out}/part-*.parquet"))
    assert on_disk == new_paths
    got = pa.concat_tables(
        [pq.read_table(r["path"]) for r in
         sorted(m2.to_pylist(), key=lambda r: r["range_id"])])
    assert got["v"].to_pylist() == sorted(t2["v"].to_pylist())


def test_export_gen_survives_compaction_and_upsert(ray_session, tmp_path):
    """compact_sorted / upsert_sorted rewrite the manifest; they must
    carry export_gen through so a later re-export still picks a
    generation disjoint from every live part."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (compact_sorted, sorted_export,
                                           upsert_sorted)

    out = str(tmp_path / "sorted")
    t = pa.table({"k": pa.array(list(range(200)), pa.int64()),
                  "p": pa.array(list(range(200)), pa.int64())})
    sorted_export(ray.data.from_arrow(t).repartition(3), "k", out,
                  np.array([50, 100, 150], np.int64))
    sorted_export(ray.data.from_arrow(t).repartition(3), "k", out,
                  np.array([80, 160], np.int64))  # gen 1
    compact_sorted(out, target_bytes=1 << 30)
    m = json.load(open(f"{out}/manifest.json"))
    assert m["export_gen"] == 1  # carried, not dropped
    ch = pa.table({"k": pa.array([5], pa.int64()),
                   "p": pa.array([999], pa.int64()),
                   "op": pa.array(["upsert"], pa.string())})
    upsert_sorted(out, ch)
    m = json.load(open(f"{out}/manifest.json"))
    assert m["export_gen"] == 1
    # a third export over the compacted+upserted dir: gen 2, and the
    # compact-/upsert- files are gone after its commit
    m3 = sorted_export(ray.data.from_arrow(t).repartition(2), "k", out,
                       np.array([100], np.int64))
    assert json.load(open(f"{out}/manifest.json"))["export_gen"] == 2
    import glob as _glob

    assert set(_glob.glob(f"{out}/*.parquet")) == \
        set(m3["path"].to_pylist())


def test_retention_delete_manifest_only_drops(ray_session, tmp_path):
    """retention_delete: wholly-expired ranges drop WITHOUT reading or
    writing data (all dropped rows share one empty part; live parts'
    files stay byte-identical), only the straddling range rewrites,
    null keys expire, and the read-back equals the plain filter."""
    import json
    import os as _os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import retention_delete, sorted_export

    vals = [None, None] + list(range(100))
    t = pa.table({"k": pa.array(vals, pa.int64()),
                  "p": pa.array(list(range(102)), pa.int64())})
    out = str(tmp_path / "ret")
    cuts = np.array([25, 50, 75], np.int64)
    sorted_export(ray.data.from_arrow(t).repartition(4), "k", out, cuts)
    m0 = {r["range_id"]: r for r in
          json.load(open(f"{out}/manifest.json"))["ranges"]}
    live_mtime = _os.path.getmtime(m0[3]["path"])  # k 75..99: untouched

    manifest = retention_delete(out, 60)
    rows = {r["range_id"]: r for r in manifest.to_pylist()}
    # ranges 0 (nulls + 0..24) and 1 (25..49) wholly expired -> shared
    # empty part; range 2 (50..74) straddles -> rewritten; range 3 live
    assert rows[0]["n_rows"] == 0 and rows[1]["n_rows"] == 0
    assert rows[0]["path"] == rows[1]["path"]
    assert rows[0]["path"].endswith("-empty.parquet")
    assert rows[2]["n_rows"] == 15 and "retain-" in rows[2]["path"]
    assert rows[3] == {**m0[3], "min_v": str(m0[3]["min_v"]),
                       "max_v": str(m0[3]["max_v"])}
    assert _os.path.getmtime(m0[3]["path"]) == live_mtime  # byte-equal
    got = pa.concat_tables(
        [pq.read_table(rows[i]["path"]) for i in sorted(rows)
         if rows[i]["n_rows"]])
    assert got["k"].to_pylist() == list(range(60, 100))
    # old parts of dropped/rewritten ranges were removed post-commit
    for rid in (0, 1, 2):
        assert not _os.path.exists(m0[rid]["path"])


def test_retention_then_incremental_revalidation(ray_session, tmp_path):
    """retention_delete composes with validate_export: untouched live
    ranges reuse their verdicts, dropped/rewritten ranges re-check —
    and the re-validated verdicts equal a fresh full validation."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (retention_delete,
                                           sorted_export, validate_export)

    def too_big(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.fill_null(_pc.greater(t["v"], 90.0), False))

    t = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "v": pa.array(np.arange(100, dtype=np.float64))})
    out = str(tmp_path / "ret")
    sorted_export(ray.data.from_arrow(t).repartition(3), "k", out,
                  np.array([25, 50, 75], np.int64))
    validate_export(out, too_big)

    retention_delete(out, 30)  # range 0 drops, range 1 trims, 2-3 live
    v = validate_export(out, too_big, incremental=True)
    meta = json.load(open(f"{out}/validation.json"))
    assert meta["n_reused"] == 2 and meta["n_revalidated"] == 2
    assert v.equals(validate_export(out, too_big))  # fresh full run
    assert v["n_rows"].to_pylist() == [0, 20, 25, 25]
    assert v["n_violations"].to_pylist() == [0, 0, 0, 9]


def test_asof_merge_join_sorted_boundaries(ray_session, tmp_path):
    """Sorted-layout as-of: boundary carry across EMPTY right ranges,
    left rows before any right row keep typed nulls, and the contracts
    (duplicate right times, mismatched cutpoints) raise."""
    import numpy as np
    import pytest
    import ray.data

    from yaschva_ray.pipelines.ops import (asof_merge_join_sorted,
                                           sorted_export)

    # right rows only at times 5 and 7: ranges (10,20] and (20,30] are
    # EMPTY on the right — their lefts must carry from the t=7 row two
    # ranges back
    left = pa.table({"lid": pa.array(list(range(8)), pa.int64()),
                     "t": pa.array([1., 6., 8., 12., 19., 22., 31., 3.])})
    right = pa.table({"rt": pa.array([5., 7.]),
                      "ref": pa.array([50, 70], pa.int64())})
    cuts = np.array([10.0, 20.0, 30.0])
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    sorted_export(ray.data.from_arrow(left).repartition(3), "t", dl, cuts)
    sorted_export(ray.data.from_arrow(right), "rt", dr, cuts)
    got = asof_merge_join_sorted(dl, dr).sort_by([("lid", "ascending")])
    # lid: 0(t=1)->null, 1(6)->50, 2(8)->70, 3(12)->70, 4(19)->70,
    #      5(22)->70, 6(31)->70, 7(3)->null
    assert got["ref"].to_pylist() == [None, 50, 70, 70, 70, 70, 70, None]

    # right export with ZERO rows: lefts keep TYPED null right columns
    import pyarrow.parquet as pq

    empty_r = right.slice(0, 0)
    de = str(tmp_path / "rempty")
    sorted_export(ray.data.from_arrow(empty_r), "rt", de, cuts)
    got0 = asof_merge_join_sorted(dl, de)
    assert got0.num_rows == left.num_rows
    assert got0["ref"].null_count == left.num_rows
    assert got0.schema.field("ref").type == pa.int64()

    # duplicate right timestamps are ambiguous -> loud failure
    dup = pa.table({"rt": pa.array([5., 5.]),
                    "ref": pa.array([1, 2], pa.int64())})
    dd = str(tmp_path / "dup")
    sorted_export(ray.data.from_arrow(dup), "rt", dd, cuts)
    with pytest.raises((ValueError, Exception),
                       match="strictly increasing"):
        asof_merge_join_sorted(dl, dd)

    # different cutpoints -> refuse instead of mis-aligning
    d2 = str(tmp_path / "r2")
    sorted_export(ray.data.from_arrow(right), "rt", d2,
                  np.array([15.0]))
    with pytest.raises(ValueError, match="DIFFERENT cutpoints"):
        asof_merge_join_sorted(dl, d2)


def test_zorder_conjunctive_probe_prunes_product(ray_session, tmp_path):
    """zorder_lookup_multi: the AND of two range probes must (a) equal
    the full-table filter exactly and (b) read strictly fewer parts
    than either single-column plan — the multiplicative pruning the
    Morton layout exists for."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (_zorder_plan_multi,
                                           zorder_export,
                                           zorder_lookup_multi)

    n = 20_000
    rng = np.random.RandomState(5)
    a = rng.uniform(0, 1000, n)
    b = rng.uniform(0, 1000, n)
    t = pa.table({"a": pa.array(a), "b": pa.array(b),
                  "i": pa.array(np.arange(n, dtype=np.int64))})
    edges = {"a": np.linspace(0, 1000, 33)[1:-1],
             "b": np.linspace(0, 1000, 33)[1:-1]}
    out = str(tmp_path / "z2")
    zorder_export(ray.data.from_arrow(t).repartition(4), ["a", "b"],
                  edges, out, n_ranges=64)
    with open(f"{out}/manifest.json") as f:
        m = json.load(f)
    pa_only = _zorder_plan_multi(m, {"a": (100.0, 200.0)})
    pb_only = _zorder_plan_multi(m, {"b": (500.0, 600.0)})
    both = _zorder_plan_multi(m, {"a": (100.0, 200.0),
                                  "b": (500.0, 600.0)})
    assert set(both) == set(pa_only) & set(pb_only)
    assert len(both) < min(len(pa_only), len(pb_only))

    got = zorder_lookup_multi(out, {"a": (100.0, 200.0),
                                    "b": (500.0, 600.0)})
    want = ((a >= 100) & (a <= 200) & (b >= 500) & (b <= 600))
    assert got.num_rows == int(want.sum())
    assert sorted(got["i"].to_pylist()) == \
        np.arange(n)[want].tolist()


def test_sorted_export_composite_within_and_upsert(ray_session, tmp_path):
    """`within` secondary keys: parts in range order must BE the table
    in full composite order, the manifest must record the contract, and
    an upsert's rewritten ranges must re-sort with the SAME composite
    keys (not primary-only)."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import sorted_export, upsert_sorted

    rng = np.random.RandomState(7)
    k = rng.randint(0, 50, 600)  # duplicate primaries: ties matter
    sub = rng.permutation(600)
    t = pa.table({"k": pa.array(k, type=pa.int64()),
                  "sub": pa.array(sub, type=pa.int64()),
                  "p": pa.array(np.arange(600, dtype=np.float64))})
    out = str(tmp_path / "comp")
    sorted_export(ray.data.from_arrow(t).repartition(4), "k", out,
                  np.array([15, 30], np.int64), within=["sub"])
    m = json.load(open(f"{out}/manifest.json"))
    assert m["within"] == ["sub"]

    def read_all():
        return pa.concat_tables(
            [pq.read_table(r["path"]) for r in
             sorted(m["ranges"], key=lambda r: r["range_id"])])

    got = read_all()
    pairs = list(zip(got["k"].to_pylist(), got["sub"].to_pylist()))
    assert pairs == sorted(pairs)  # full composite order, no merge

    # upsert a row into the middle range: composite order must survive
    ch = pa.table({"k": pa.array([20], pa.int64()),
                   "sub": pa.array([-1], pa.int64()),
                   "p": pa.array([0.5], pa.float64()),
                   "op": pa.array(["upsert"])})
    upsert_sorted(out, ch)
    m = json.load(open(f"{out}/manifest.json"))
    assert m["within"] == ["sub"]  # carried through the rewrite
    got = read_all()
    pairs = list(zip(got["k"].to_pylist(), got["sub"].to_pylist()))
    assert pairs == sorted(pairs)
    assert (20, -1) in pairs


def test_incremental_revalidation_equals_full(ray_session, tmp_path):
    """revalidate_upsert must (a) produce verdicts byte-identical to a
    full re-validation of the post-CDC table, (b) actually REUSE the
    untouched ranges' verdicts (the O(changeset) contract), and (c)
    detect every rewrite through the generation-tagged part path —
    including a compaction, which renames all parts."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (compact_sorted, sorted_export,
                                           revalidate_upsert,
                                           validate_export)

    def too_big(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.fill_null(_pc.greater(t["v"], 80.0), False))

    out = str(tmp_path / "sorted")
    t = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "v": pa.array(np.arange(100, dtype=np.float64))})
    sorted_export(ray.data.from_arrow(t).repartition(3), "k", out,
                  np.array([25, 50, 75], np.int64))
    v0 = validate_export(out, too_big)
    # ranges 0-2 clean, range 3 (k 75..99) has v 81..99 -> 19 violations
    assert v0["n_violations"].to_pylist() == [0, 0, 0, 19]
    assert v0["pass"].to_pylist() == [True, True, True, False]
    # violations parquet written (sidecar dir) for the failing part only
    import glob as _glob

    vfiles = _glob.glob(f"{out}/violations/*.parquet")
    assert len(vfiles) == 1

    # CDC: push k=10 over the cap (range 0 flips to fail), delete k=90
    ch = pa.table({"k": pa.array([10, 90], pa.int64()),
                   "v": pa.array([999.0, None], pa.float64()),
                   "op": pa.array(["upsert", "delete"])})
    v1 = revalidate_upsert(out, ch, too_big)
    meta = json.load(open(f"{out}/validation.json"))
    assert meta["n_revalidated"] == 2 and meta["n_reused"] == 2
    # incremental == full: force a fresh non-incremental validation
    v_full = validate_export(out, too_big)
    assert v1.equals(v_full)
    assert v1["n_violations"].to_pylist() == [1, 0, 0, 18]
    assert v1["pass"].to_pylist() == [False, True, True, False]

    # compaction renames every part -> nothing reusable, still correct
    compact_sorted(out, target_bytes=1 << 30)
    v2 = validate_export(out, too_big, incremental=True)
    meta = json.load(open(f"{out}/validation.json"))
    assert meta["n_reused"] == 0
    assert int(pa.compute.sum(v2["n_violations"]).as_py()) == 19
    # the flipped-clean range's old violations file was cleaned up
    for p in _glob.glob(f"{out}/violations/*.parquet"):
        live = json.load(open(f"{out}/validation.json"))["verdicts"]
        assert p in {v["violations_path"] for v in live}

    # a CHANGED violation_fn discards every verdict (fn_tag mismatch):
    # reusing schema-A verdicts under schema B would silently lie
    def stricter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.fill_null(_pc.greater(t["v"], 50.0), False))

    v3 = validate_export(out, stricter, incremental=True)
    meta = json.load(open(f"{out}/validation.json"))
    assert meta["n_reused"] == 0  # every range re-validated
    assert int(pa.compute.sum(v3["n_violations"]).as_py()) > 19


def test_zorder_reexport_generation(ray_session, tmp_path):
    """zorder_export follows the same generation protocol: disjoint
    filenames across runs, stale parts removed only after the manifest
    commit, lookups exact over the new snapshot."""
    import glob as _glob
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import zorder_export, zorder_lookup

    out = str(tmp_path / "z")
    a = np.arange(1000, dtype=np.float64)
    b = (np.arange(1000, dtype=np.float64) * 7) % 1000
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    edges = {"a": np.linspace(0, 1000, 17)[1:-1],
             "b": np.linspace(0, 1000, 17)[1:-1]}
    m1 = zorder_export(ray.data.from_arrow(t).repartition(4),
                       ["a", "b"], edges, out, n_ranges=8)
    p1 = set(m1["path"].to_pylist())
    t2 = t.slice(0, 400)
    m2 = zorder_export(ray.data.from_arrow(t2).repartition(3),
                       ["a", "b"], edges, out, n_ranges=4)
    p2 = set(m2["path"].to_pylist())
    assert not (p1 & p2)
    assert json.load(open(f"{out}/manifest.json"))["export_gen"] == 1
    assert set(_glob.glob(f"{out}/zpart-*.parquet")) == p2
    got = zorder_lookup(out, "b", 100.0, 150.0)
    want = t2.filter(
        pa.compute.and_(pa.compute.greater_equal(t2["b"], 100.0),
                        pa.compute.less_equal(t2["b"], 150.0)))
    assert got.num_rows == want.num_rows
    assert sorted(got["a"].to_pylist()) == sorted(want["a"].to_pylist())


def test_zorder_export_lookup(ray_session, tmp_path):
    """Z-order clustering: lookups on EITHER clustered column return the
    exact filter result while reading only a strict subset of parts —
    the property a single-key sorted export provides for one column
    only.  Nulls and NaNs never match a range probe."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import (equidepth_cutpoints,
                                           zorder_export, zorder_lookup)

    rng = np.random.RandomState(7)
    n = 40_000
    a = rng.randint(0, 1000, n).astype(np.int64)
    b = (rng.rand(n) * 500).round(3)
    b[5] = float("nan")
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"id": pa.array(ids), "a": pa.array(a),
                  "b": pa.array(b)})
    t = t.set_column(1, "a", pa.array(
        [None if i == 9 else int(x) for i, x in enumerate(a)],
        pa.int64()))
    edges = {"a": equidepth_cutpoints(np.sort(a), 257),
             "b": equidepth_cutpoints(np.sort(b[~np.isnan(b)]), 257)}
    out = str(tmp_path / "z")
    manifest = zorder_export(
        ray.data.from_arrow(t).repartition(8), ["a", "b"], edges, out,
        n_ranges=16)
    assert int(pa.compute.sum(manifest["n_rows"]).as_py()) == n

    av = np.asarray(t["a"].to_numpy(zero_copy_only=False))
    for col, lo, hi, ref in (
            ("a", 100, 120, ids[(av >= 100) & (av <= 120)]),
            ("b", 10.0, 25.0, ids[(b >= 10.0) & (b <= 25.0)])):
        got = zorder_lookup(out, col, lo, hi)
        assert sorted(got["id"].to_pylist()) == sorted(ref.tolist())
        m = json.load(open(f"{out}/manifest.json"))
        files = [r["path"] for r in m["ranges"]
                 if r["n_rows"] and r[f"min_{col}"] is not None
                 and r[f"min_{col}"] <= hi and lo <= r[f"max_{col}"]]
        live = [r for r in m["ranges"] if r["n_rows"]]
        assert 0 < len(files) < len(live), (col, len(files), len(live))

    import pytest

    with pytest.raises(ValueError, match="not a clustered"):
        zorder_lookup(out, "id", 0, 1)


def test_footer_equidepth_cutpoints(ray_session, tmp_path):
    """Footer-only cutpoints: zero data pages read, near-balanced ranges
    on real testdata, deterministic, and a loud ValueError on stat-less
    files (the callers' logged scan-fallback trigger)."""
    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from yaschva_ray.pipelines.ops import footer_equidepth_cutpoints

    path = "/root/testdata/sf0.01/orders.parquet"
    cuts = footer_equidepth_cutpoints(path, "o_orderkey", 6)
    assert list(cuts) == sorted(cuts) and len(cuts) <= 5
    again = footer_equidepth_cutpoints(path, "o_orderkey", 6)
    assert np.array_equal(cuts, again)
    # balance check against the actual key distribution
    keys = np.asarray(pq.read_table(path, columns=["o_orderkey"])
                      ["o_orderkey"].to_numpy(zero_copy_only=False))
    sizes = np.diff(np.concatenate(
        [[0], np.searchsorted(np.sort(keys), cuts, side="right"),
         [len(keys)]]))
    assert sizes.max() <= 3 * len(keys) / 6  # no degenerate range

    # stat-less file => loud error, never a silent guess
    t = pa.table({"k": pa.array(range(100), pa.int64())})
    bad = str(tmp_path / "nostats.parquet")
    pq.write_table(t, bad, write_statistics=False)
    with pytest.raises(ValueError, match="lacks min/max"):
        footer_equidepth_cutpoints(bad, "k", 4)


def test_merge_join_sorted_cutpoint_guard_and_parity(ray_session, tmp_path):
    """Mismatched cutpoints must raise (mis-aligned files would silently
    lose matches); aligned exports must join exactly like a plain join."""
    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import merge_join_sorted, sorted_export

    a = pa.table({"ka": pa.array(list(range(100)), pa.int64()),
                  "va": pa.array(np.arange(100) * 2, pa.int64())})
    b = pa.table({"kb": pa.array([5, 5, 50, 99, 120], pa.int64()),
                  "vb": pa.array([1, 2, 3, 4, 5], pa.int64())})
    cuts = np.array([30, 60], dtype=np.int64)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    sorted_export(ray.data.from_arrow(a).repartition(3), "ka", da, cuts)
    sorted_export(ray.data.from_arrow(b), "kb", db, cuts)
    out = merge_join_sorted(da, db)
    got = sorted(zip(out["ka"].to_pylist(), out["vb"].to_pylist()))
    assert got == [(5, 1), (5, 2), (50, 3), (99, 4)]

    db2 = str(tmp_path / "b2")
    sorted_export(ray.data.from_arrow(b), "kb", db2,
                  np.array([40], dtype=np.int64))
    with pytest.raises(ValueError, match="DIFFERENT cutpoints"):
        merge_join_sorted(da, db2)


def test_compact_sorted_preserves_order_and_lookup(ray_session, tmp_path):
    """Adjacent-range compaction must keep global order, manifest
    recounts, and manifest-pruned lookups working; cutpoints coarsen to
    group boundaries."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import (
        compact_sorted, lookup_sorted, sorted_export)

    vals = np.arange(2000, dtype=np.float64)
    t = pa.table({"id": pa.array(list(range(2000)), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    cuts = np.array([250.0, 500.0, 1000.0, 1500.0, 1750.0])
    out = str(tmp_path / "sorted")
    sorted_export(ray.data.from_arrow(t).repartition(4), "v", out, cuts)

    manifest = compact_sorted(out, target_bytes=12_000)
    assert 1 < manifest.num_rows < 6  # actually merged something
    m = json.load(open(f"{out}/manifest.json"))
    assert len(m["cutpoints"]) == manifest.num_rows - 1
    got = pa.concat_tables([pq.read_table(r["path"]) for r in
                            sorted(m["ranges"],
                                   key=lambda r: r["range_id"])])
    assert got["v"].to_pylist() == sorted(vals.tolist())  # global order
    assert got.num_rows == 2000
    # lookups still prune correctly through the rewritten manifest
    hit = lookup_sorted(out, [1234.0])
    assert hit["id"].to_pylist() == [1234]
    # boundaries stay monotone
    rs = sorted(m["ranges"], key=lambda r: r["range_id"])
    for a, b in zip(rs, rs[1:]):
        assert a["max_v"] <= b["min_v"]


def test_provably_clean_files_prunes_conservatively(ray_session, tmp_path):
    """Files footer-proven in-bounds are skipped; a single excursion, any
    null, or missing stats makes a file suspicious; the pruned result
    equals the full scan's."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import provably_clean_files

    bounds = {"q": (1.0, 25.0)}
    clean_t = pa.table({"id": pa.array([1, 2], pa.int64()),
                        "q": pa.array([3.0, 20.0], pa.float64())})
    dirty_t = pa.table({"id": pa.array([3, 4], pa.int64()),
                        "q": pa.array([5.0, 30.0], pa.float64())})
    nully_t = pa.table({"id": pa.array([5], pa.int64()),
                        "q": pa.array([None], pa.float64())})
    nostat_t = pa.table({"id": pa.array([6], pa.int64()),
                         "q": pa.array([7.0], pa.float64())})
    pq.write_table(clean_t, str(tmp_path / "clean.parquet"))
    pq.write_table(dirty_t, str(tmp_path / "dirty.parquet"))
    pq.write_table(nully_t, str(tmp_path / "nully.parquet"))
    pq.write_table(nostat_t, str(tmp_path / "nostat.parquet"),
                   write_statistics=False)
    files = sorted(str(tmp_path / f"{n}.parquet")
                   for n in ("clean", "dirty", "nully", "nostat"))
    clean, suspicious = provably_clean_files(files, bounds)
    assert [f.rsplit("/", 1)[1] for f in clean] == ["clean.parquet"]
    assert len(suspicious) == 3  # excursion, null, and no-stats all scan


def test_compact_sorted_recompaction_safe(ray_session, tmp_path):
    """Review finding: a second compaction used to reuse the compact-{gid}
    filenames of the parts it was reading, then delete the fresh files.
    Generations keep every run's names disjoint — compact twice, data
    intact."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import compact_sorted, sorted_export

    vals = np.arange(3000, dtype=np.float64)
    t = pa.table({"id": pa.array(list(range(3000)), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    out = str(tmp_path / "sorted")
    sorted_export(ray.data.from_arrow(t).repartition(4), "v", out,
                  np.array([500.0, 1000.0, 1500.0, 2000.0, 2500.0]))
    compact_sorted(out, target_bytes=15_000)
    compact_sorted(out, target_bytes=10 << 20)  # merge everything
    m = json.load(open(f"{out}/manifest.json"))
    assert m["compaction_gen"] == 2
    got = pa.concat_tables([pq.read_table(r["path"]) for r in
                            sorted(m["ranges"],
                                   key=lambda r: r["range_id"])])
    assert got["v"].to_pylist() == sorted(vals.tolist())
    assert sorted(got["id"].to_pylist()) == list(range(3000))


def test_merge_join_sorted_left_outer_empty_right_range(ray_session,
                                                        tmp_path):
    """Review finding: a range pair with an empty right part used to drop
    the left rows instead of emitting them with typed nulls."""
    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import merge_join_sorted, sorted_export

    a = pa.table({"ka": pa.array([1, 10, 20], pa.int64()),
                  "va": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"kb": pa.array([1], pa.int64()),   # ranges 1,2 empty
                  "vb": pa.array([7], pa.int64())})
    cuts = np.array([5, 15], dtype=np.int64)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    sorted_export(ray.data.from_arrow(a), "ka", da, cuts)
    sorted_export(ray.data.from_arrow(b), "kb", db, cuts)
    out = merge_join_sorted(da, db, how="left outer") \
        .sort_by([("ka", "ascending")])
    assert out["ka"].to_pylist() == [1, 10, 20]
    assert out["vb"].to_pylist() == [7, None, None]


def test_sorted_export_string_key(ray_session, tmp_path):
    """Review finding: manifest min/max were forced float64, crashing on
    non-numeric sort keys after the parts were written."""
    import json

    import numpy as np
    import ray.data

    from yaschva_ray.pipelines.ops import lookup_sorted, sorted_export

    t = pa.table({"name": pa.array(["delta", "alpha", "zeta", "mike"]),
                  "n": pa.array([1, 2, 3, 4], pa.int64())})
    out = str(tmp_path / "s")
    manifest = sorted_export(ray.data.from_arrow(t), "name", out,
                             np.array(["m"]))
    assert manifest.num_rows == 2
    m = json.load(open(f"{out}/manifest.json"))
    assert m["ranges"][0]["min_v"] == "alpha"
    hit = lookup_sorted(out, ["zeta"])
    assert hit["n"].to_pylist() == [3]


def test_table_diff_typed_empty_on_string_key(ray_session):
    import ray.data

    from yaschva_ray.pipelines.ops import table_diff

    t = pa.table({"k": pa.array(["a", "b"]),
                  "v": pa.array([1, 2], pa.int64())})
    out = table_diff(ray.data.from_arrow(t), ray.data.from_arrow(t), "k")
    assert out.num_rows == 0
    assert out.schema.field("key").type == pa.string()


def test_upsert_sorted_semantics_and_touched_ranges(ray_session, tmp_path):
    """CDC merge: deletes remove, upserts replace-or-insert, untouched
    ranges keep their exact files (path AND mtime), order stays global,
    and the manifest matches a recount of the rewritten parts."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import (
        lookup_sorted, sorted_export, upsert_sorted)

    t = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "v": pa.array([float(i) for i in range(100)],
                                pa.float64())})
    out = str(tmp_path / "u")
    cuts = np.array([25, 50, 75], np.int64)
    sorted_export(ray.data.from_arrow(t).repartition(4), "k", out, cuts)
    m0 = json.load(open(f"{out}/manifest.json"))
    stat0 = {r["range_id"]: (r["path"], os.path.getmtime(r["path"]))
             for r in m0["ranges"]}

    changes = pa.table({
        # 25 == cutpoint (lands with its duplicates in ONE bucket),
        # -5 below min, 200 past max, 60 mid-range update, 10/30 deletes
        "k": pa.array([10, 30, 25, 60, -5, 200], pa.int64()),
        "v": pa.array([None, None, 111.0, 222.0, 333.0, 444.0],
                      pa.float64()),
        "op": pa.array(["delete", "delete", "upsert", "upsert",
                        "upsert", "upsert"]),
    })
    man = upsert_sorted(out, changes)
    assert set(man.column_names) >= {"range_id", "n_rows", "path",
                                     "rows_removed", "rows_upserted"}

    m1 = json.load(open(f"{out}/manifest.json"))
    ordered = sorted(m1["ranges"], key=lambda r: r["range_id"])
    got = pa.concat_tables([pq.read_table(r["path"]) for r in ordered])
    kk = got["k"].to_pylist()
    assert kk == sorted(kk)  # still globally sorted, no merge step
    d = dict(zip(kk, got["v"].to_pylist()))
    expect = {i: float(i) for i in range(100) if i not in (10, 30)}
    expect.update({25: 111.0, 60: 222.0, -5: 333.0, 200: 444.0})
    assert d == expect
    # manifest rows match a recount of the files they point to
    for r in ordered:
        ft = pq.read_table(r["path"])
        assert ft.num_rows == r["n_rows"]
    # range 3 hosts keys 76..100 → untouched? no: 200 → bucket 3.
    # bucket(60)=2, bucket(25)=1 (side='right': 25 goes WITH its
    # duplicates), bucket(10)=bucket(-5)=0, bucket(30)=1.  So every
    # bucket was touched except... none.  Re-run with a narrow change
    # to pin the untouched-range guarantee:
    stat1 = {r["range_id"]: (r["path"], os.path.getmtime(r["path"]))
             for r in m1["ranges"]}
    upsert_sorted(out, pa.table({
        "k": pa.array([77], pa.int64()),
        "v": pa.array([0.5], pa.float64()),
        "op": pa.array(["upsert"])}))
    m2 = json.load(open(f"{out}/manifest.json"))
    stat2 = {r["range_id"]: (r["path"], os.path.getmtime(r["path"]))
             for r in m2["ranges"]}
    for rid in (0, 1, 2):  # only range 3 (76..) rewrites
        assert stat2[rid] == stat1[rid]
    assert stat2[3] != stat1[3]
    # lookups keep working through the rewritten manifest
    hit = lookup_sorted(out, [77, 10, 200])
    assert dict(zip(hit["k"].to_pylist(), hit["v"].to_pylist())) == \
        {77: 0.5, 200: 444.0}


def test_upsert_sorted_guards(ray_session, tmp_path):
    """Ambiguous or malformed changesets must refuse loudly before any
    file is touched: duplicate keys, null keys, unknown op, columns not
    in the export schema."""
    import numpy as np
    import pytest as _pytest
    import ray.data

    from yaschva_ray.pipelines.ops import sorted_export, upsert_sorted

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0], pa.float64())})
    out = str(tmp_path / "g")
    sorted_export(ray.data.from_arrow(t), "k", out, np.array([2], np.int64))

    def ch(ks, vs, ops_):
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "v": pa.array(vs, pa.float64()),
                         "op": pa.array(ops_)})

    with _pytest.raises(ValueError, match="duplicate"):
        upsert_sorted(out, ch([1, 1], [0.0, 0.0], ["upsert", "delete"]))
    with _pytest.raises(ValueError, match="null"):
        upsert_sorted(out, ch([None], [0.0], ["delete"]))
    with _pytest.raises(ValueError, match="op not in"):
        upsert_sorted(out, ch([1], [0.0], ["replace"]))
    with _pytest.raises(ValueError, match="not in the export schema"):
        upsert_sorted(out, pa.table({
            "k": pa.array([1], pa.int64()),
            "bogus": pa.array([9.0], pa.float64()),
            "op": pa.array(["upsert"])}))


def test_upsert_sorted_after_compact_string_key(ray_session, tmp_path):
    """The shared write-generation counter keeps compact-g*/upsert-g*
    filenames disjoint across op interleavings, and string cutpoints
    re-type correctly from the JSON manifest."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from yaschva_ray.pipelines.ops import (
        compact_sorted, sorted_export, upsert_sorted)

    t = pa.table({"name": pa.array(["alpha", "beta", "mike", "zeta"]),
                  "n": pa.array([0, 1, 2, 3], pa.int64())})
    out = str(tmp_path / "s")
    sorted_export(ray.data.from_arrow(t), "name", out,
                  np.array(["m", "t"]))
    compact_sorted(out, target_bytes=1)  # keep every range, bump gen
    upsert_sorted(out, pa.table({
        "name": pa.array(["beta", "omega"]),
        "n": pa.array([99, 100], pa.int64()),
        "op": pa.array(["upsert", "upsert"])}))
    m = json.load(open(f"{out}/manifest.json"))
    assert m["compaction_gen"] == 2  # compact bumped to 1, upsert to 2
    ordered = sorted(m["ranges"], key=lambda r: r["range_id"])
    got = pa.concat_tables(
        [pq.read_table(r["path"]) for r in ordered])
    assert got["name"].to_pylist() == [
        "alpha", "beta", "mike", "omega", "zeta"]
    assert dict(zip(got["name"].to_pylist(), got["n"].to_pylist()))[
        "beta"] == 99


def test_stratified_sample_exact_quota_and_ties(ray_session, tmp_path,
                                                monkeypatch):
    """The distributed order-statistic sampler must equal the brute-force
    per-stratum rank selection exactly — including a hot stratum, a
    1-row stratum, and null-lang rows as their own stratum."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_stratified_sample

    rng = np.random.RandomState(7)
    langs = (["en"] * 3000 + ["de"] * 40 + ["fr"] * 1
             + [None] * 13 + ["zh"] * 9)
    ids = rng.permutation(len(langs)).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "lang": pa.array(langs, pa.string()),
                  "text": pa.array(["x"] * len(langs)),
                  "source": pa.array(["s"] * len(langs)),
                  "n_chars": pa.array([1] * len(langs), pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = q_stratified_sample(str(d), m=10)

    # brute force: k smallest by (md5(str(id)), id) per stratum
    by = {}
    for lg, did in zip(langs, ids.tolist()):
        by.setdefault(lg, []).append(
            (hashlib.md5(str(did).encode()).hexdigest(), did))
    want = []
    for lg, rows in by.items():
        k = (len(rows) + 9) // 10
        for _, did in sorted(rows)[:k]:
            want.append((lg, did))
    want.sort(key=lambda p: (p[0] is None, p[0] or "", p[1]))
    assert list(zip(got["lang"].to_pylist(),
                    got["doc_id"].to_pylist())) == want
    # quota check per stratum, explicitly
    from collections import Counter

    c = Counter(got["lang"].to_pylist())
    assert c["en"] == 300 and c["de"] == 4 and c["fr"] == 1
    assert c["zh"] == 1 and c[None] == 2


def test_user_funnel_vs_bruteforce(ray_session, tmp_path):
    """Funnel kernel equals per-user brute force — incl. a user missing a
    stage (null cascades), a click BEFORE the first view (ignored), ts
    ties (strict > excludes same-instant next stages), and a user whose
    only events are purchases (view null ⇒ all null)."""
    import numpy as np
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_user_funnel

    rows = []  # (event_id, ts_us, user_id, event_type)
    rows += [(1, 100, 1, "view"), (2, 50, 1, "click"),  # click before view
             (3, 100, 1, "click"),                      # tie: excluded
             (4, 200, 1, "click"), (5, 200, 1, "purchase")]  # tie w/ click
    rows += [(6, 10, 2, "purchase"), (7, 20, 2, "purchase")]  # no view
    rows += [(8, 5, 3, "view"), (9, 6, 3, "click")]      # no purchase
    rows += [(10, 1, 4, "view"), (11, 2, 4, "click"), (12, 3, 4, "purchase")]
    rng = np.random.RandomState(3)
    eid = 100
    for u in range(5, 40):
        for _ in range(rng.randint(1, 30)):
            rows.append((eid, int(rng.randint(0, 1000)), u,
                         ["view", "click", "purchase", "error"][
                             rng.randint(4)]))
            eid += 1
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = q_user_funnel(str(d))

    def brute(user_rows):
        v = min((ts for ts, k in user_rows if k == "view"), default=None)
        c = (min((ts for ts, k in user_rows if k == "click" and ts > v),
                 default=None) if v is not None else None)
        p = (min((ts for ts, k in user_rows if k == "purchase" and ts > c),
                 default=None) if c is not None else None)
        return v, c, p

    by = {}
    for _, ts, u, k in rows:
        by.setdefault(u, []).append((ts, k))
    want = [(u, *brute(ur)) for u, ur in sorted(by.items())]
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    # the hand-built cases, explicitly
    m = {r["user_id"]: r for r in got.to_pylist()}
    assert (m[1]["view_us"], m[1]["click_us"], m[1]["purchase_us"]) == (
        100, 200, None)  # tie at 200 excluded for purchase
    assert m[2]["view_us"] is None and m[2]["purchase_us"] is None
    assert m[3]["purchase_us"] is None
    assert (m[4]["view_us"], m[4]["click_us"], m[4]["purchase_us"]) == (
        1, 2, 3)


def test_user_hourly_locf_vs_bruteforce(ray_session, tmp_path):
    """LOCF resample equals a per-user python reference — incl. gaps of
    several hours, an hour whose only values are null (inherits the
    previous hour), a single-event user (1-cell grid), and null values
    at a user's first hour (leading nulls stay null)."""
    import numpy as np
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_user_hourly_locf

    HOUR = 3_600_000_000
    rows = []  # (ts_us, user_id, value)
    rows += [(0, 1, 1.0), (HOUR * 5, 1, 2.5),          # 4-hour gap
             (HOUR * 5 + 7, 1, 2.0)]                   # same hour, max=2.5
    rows += [(HOUR * 2 + 3, 2, None),                  # leading null hour
             (HOUR * 4, 2, 7.0), (HOUR * 6, 2, None)]  # null hour inherits
    rows += [(HOUR * 9 + 1, 3, 3.25)]                  # single event
    rng = np.random.RandomState(11)
    for u in range(4, 30):
        for _ in range(rng.randint(1, 40)):
            v = None if rng.rand() < 0.2 else float(rng.randint(0, 500)) / 7
            rows.append((int(rng.randint(0, 30 * HOUR)), u, v))
    t = pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = q_user_hourly_locf(str(d))

    want = []
    by = {}
    for ts, u, v in rows:
        c = None if v is None else int(np.round(v * 100))
        h = ts // HOUR * HOUR
        cur = by.setdefault(u, {}).get(h)
        by[u][h] = c if cur is None else (cur if c is None else max(cur, c))
    for u in sorted(by):
        hs = sorted(by[u])
        last = None
        for h in range(hs[0], hs[-1] + HOUR, HOUR):
            if h in by[u] and by[u][h] is not None:
                last = by[u][h]
            want.append((u, h, last))
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    m = {(r["user_id"], r["hour_us"]): r["cents"] for r in got.to_pylist()}
    assert m[(1, HOUR * 2)] == 100          # gap carries hour-0 value
    assert m[(1, HOUR * 5)] == 250          # same-hour max
    assert m[(2, HOUR * 2)] is None         # leading null stays null
    assert m[(2, HOUR * 6)] == 700          # null hour inherits
    assert m[(3, HOUR * 9)] == 325 and (3, HOUR * 10) not in m


def test_user_moving_sum_vs_pandas(ray_session, tmp_path):
    """Frame window equals pandas rolling(4, min_periods=1) per user —
    windows clamp at group starts and never cross users."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_user_moving_sum

    rng = np.random.RandomState(9)
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="us"),
        "user_id": rng.randint(0, 37, n).astype(np.int64),
        "value": rng.rand(n) * 100 - 20,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    got = q_user_moving_sum(str(d)).to_pandas()

    df["cents"] = np.round(df["value"] * 100).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["mov"] = (df.groupby("user_id")["cents"]
                   .rolling(4, min_periods=1).sum()
                   .reset_index(level=0, drop=True)).astype(np.int64)
    want = (df.sort_values(["user_id", "event_id"])
              [["event_id", "user_id", "mov"]].reset_index(drop=True))
    assert got["mov_cents"].tolist() == want["mov"].tolist()
    assert got["event_id"].tolist() == want["event_id"].tolist()


def test_user_moving_sum_streaming_sink(ray_session, tmp_path):
    """Window-family streaming exemplar: the gather=False path writes the
    per-bucket window outputs straight to a partitioned parquet sink (no
    driver concat/sort — the 100 TB shape for per-event output) and the
    rows read back equal the gathered oracle wrapper's exactly."""
    import pyarrow.dataset as pads

    from yaschva_ray.pipelines.ops import (q_user_moving_sum,
                                           stream_user_moving_sum)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "mov_sink")
    n = stream_user_moving_sum(sf, out)
    gathered = q_user_moving_sum(sf)
    assert n == gathered.num_rows
    back = (pads.dataset(out, format="parquet").to_table()
            .sort_by([("user_id", "ascending"), ("event_id", "ascending")]))
    assert back.schema.equals(gathered.schema)
    assert back.equals(gathered.combine_chunks())


def test_user_rank_windows_vs_duckdb(ray_session, tmp_path):
    """Ranking windows equal DuckDB on a fixture with heavy value ties
    (cents drawn from 8 distinct levels, ~47 users) so RANK/DENSE_RANK
    see real tie runs and NTILE's uneven buckets hit every n%4 case;
    PERCENT_RANK's exact rational (rank-1, n-1) is compared as integers."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_user_rank_windows

    rng = np.random.RandomState(11)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 47, n).astype(np.int64),
        "value": rng.choice([0.25, 1.5, 2.0, 3.75, 5.0, 7.25, 9.5, 12.0], n),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    got = q_user_rank_windows(str(d)).to_pandas()

    want = duckdb.sql(f"""
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM read_parquet('{d}/events.parquet')
        )
        SELECT event_id, user_id,
               row_number() OVER wt AS row_num,
               rank() OVER wv AS rnk,
               dense_rank() OVER wv AS drnk,
               ntile(4) OVER wt AS ntile4,
               rank() OVER wv - 1 AS pr_num,
               count(*) OVER (PARTITION BY user_id) - 1 AS pr_den
        FROM e
        WINDOW wv AS (PARTITION BY user_id ORDER BY cents DESC),
               wt AS (PARTITION BY user_id ORDER BY cents DESC, event_id)
        ORDER BY user_id, row_num
    """).df()
    for col in got.columns:
        assert got[col].astype(np.int64).tolist() == \
            want[col].astype(np.int64).tolist(), col


def test_returned_revenue_topk_vs_duckdb(ray_session, tmp_path):
    """The chained join→agg→top-k pipeline equals DuckDB on a synthetic
    4-table fixture with revenue ties (broken by custkey) and customers
    whose revenue lands them exactly at the k boundary."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_returned_revenue_topk

    rng = np.random.RandomState(21)
    n_li, n_ord, n_cust = 5000, 800, 60
    d = tmp_path / "sf"
    d.mkdir()
    ordkeys = np.arange(n_ord, dtype=np.int64)
    pq.write_table(pa.table({
        "l_orderkey": rng.choice(ordkeys, n_li).astype(np.int64),
        "l_extendedprice": np.round(rng.rand(n_li) * 1000, 2),
        "l_discount": np.round(rng.rand(n_li) * 0.1, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
    }), str(d / "lineitem.parquet"))
    base = np.datetime64("1995-06-01", "us")
    pq.write_table(pa.table({
        "o_orderkey": ordkeys,
        "o_custkey": rng.randint(0, n_cust, n_ord).astype(np.int64),
        "o_orderdate": pa.array(
            base + rng.randint(0, 730, n_ord).astype("timedelta64[D]")
                      .astype("timedelta64[us]"), pa.timestamp("us")),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": pa.array([f"cust#{i}" for i in range(n_cust)]),
        "c_nationkey": (np.arange(n_cust, dtype=np.int64) % 5),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": np.arange(5, dtype=np.int64),
        "n_name": pa.array([f"nation#{i}" for i in range(5)]),
    }), str(d / "nation.parquet"))

    got = q_returned_revenue_topk(str(d)).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.sql("""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                    AS BIGINT) AS revenue_c2
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3 ORDER BY revenue_c2 DESC, c_custkey LIMIT 20
    """).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def _null_events_fixture(tmp_path) -> str:
    """Events with null ts / user_id / event_type, exact half-open
    boundaries, and dense overlaps for the sweep-line + transitions."""
    import pyarrow.parquet as pq

    M = 60_000_000  # one minute in us
    rows = [
        # (event_id, ts_us, user_id, type) — hold window is 10 min
        (1, 0 * M, 1, "a"),        # a: overlaps 2, 3
        (2, 5 * M, 1, "a"),
        (3, 9 * M, 2, "a"),        # a peaks at 3 concurrent
        (4, 10 * M, 2, "a"),       # exactly at 1's expiry: NOT concurrent
        #  with 1 (half-open), still with 2, 3
        (5, 0 * M, 3, "b"),
        (6, 10 * M, 3, "b"),       # b never overlaps: max 1
        (7, None, 4, "a"),         # null ts drops from the sweep-line
        (8, 30 * M, None, None),   # null type group; null user partition
        (9, 31 * M, None, "a"),    # transition NULL->a inside null user
        (10, 40 * M, 4, None),     # 4: a(7 null-ts first by NULLS LAST?)
        (11, 41 * M, 4, "b"),      # transition NULL->b for user 4
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[0]) for r in rows], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _shipped_oracle(name: str, sf_dir: str) -> pd.DataFrame:
    import glob
    import os

    import __ray_entry__

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        stem = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {stem} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(__ray_entry__.oracle_sql()[name]).df()


def test_max_concurrent_events_nulls_and_boundaries(ray_session, tmp_path):
    """Half-open [t, t+hold): an arrival exactly at an expiry is NOT
    concurrent with it; null ts rows drop; null event_type is one group.
    Engine vs the SHIPPED oracle SQL and a brute-force simulation."""
    from yaschva_ray.pipelines.ops import q_max_concurrent_events

    sf = _null_events_fixture(tmp_path)
    got = q_max_concurrent_events(sf).to_pandas()
    want = _shipped_oracle("max_concurrent_events", sf)
    got_m = {r.event_type: r.max_concurrent for r in got.itertuples()}
    want_m = {(None if pd.isna(r.event_type) else r.event_type):
              int(r.max_concurrent) for r in want.itertuples()}
    assert got_m == want_m
    # brute force: a={0,5,9,31,40?no->a at 40 is event 10 type NULL}
    # type a deltas: starts 0,5,9,10,31; max overlap = 3 (at t=9: 0,5,9)
    # and at t=10: {5,9,10} = 3; type b: starts 0,10 never overlap
    assert got_m["a"] == 3 and got_m["b"] == 1
    assert got_m[None] == 1  # events 8 and 10 are 10 min apart exactly


def test_max_concurrent_events_range_partition_independent(ray_session,
                                                           tmp_path):
    """The associative fold is cutpoint-placement independent: forcing
    many tiny ranges (every range boundary inside overlap clusters)
    yields the same maxima as few ranges."""
    from yaschva_ray.pipelines.ops import q_max_concurrent_events

    sf = _null_events_fixture(tmp_path)
    a = q_max_concurrent_events(sf, n_ranges=2, sample_mod=1).to_pandas()
    b = q_max_concurrent_events(sf, n_ranges=64, sample_mod=1).to_pandas()
    assert a.equals(b)


def test_user_transitions_null_semantics(ray_session, tmp_path):
    """Transitions FROM a null event_type count (existence keys on the
    lag ROW, not the lagged value); null user_id is one partition; null
    ts sorts last within its user on both engines."""
    from yaschva_ray.pipelines.ops import q_user_transitions

    sf = _null_events_fixture(tmp_path)
    got = q_user_transitions(sf).to_pandas()
    want = _shipped_oracle("user_transitions", sf)

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(got).equals(norm(want))
    # user 4: ts order is 40(None type), 41(b), then null-ts event 7 (a)
    # LAST (NULLS LAST) => transitions NULL->b and b->a
    rows = {(r.prev_type if isinstance(r.prev_type, str) else None,
             r.next_type if isinstance(r.next_type, str) else None): r.n
            for r in got.itertuples()}
    assert rows[(None, "b")] == 1 and rows[("b", "a")] == 1
    assert rows[(None, "a")] == 1  # null-user partition: 8 -> 9


def test_corr_moments_nulls_match_oracle(ray_session, tmp_path):
    """SUM skips NULLs, COUNT(*) counts all rows, NULL returnflag is one
    group — engine vs the shipped oracle on a null-carrying lineitem."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_corr_moments_lineitem

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", None, "B", None], pa.string()),
        "l_quantity": pa.array([1.0, None, 3.0, 4.0, None], pa.float64()),
        "l_discount": pa.array([0.05, 0.1, None, 0.0, 0.07], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "lineitem.parquet"))
    got = q_corr_moments_lineitem(str(d)).to_pandas()
    want = _shipped_oracle("corr_moments_lineitem", str(d))

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(got).equals(norm(want))
    a = got[got.l_returnflag == "A"].iloc[0]
    assert a.n == 2 and a.sum_qty_c == 100 and a.sum_qty_disc == 500


def test_corr_moments_per_block_overflow_is_loud(ray_session, tmp_path):
    """A product that overflows int64 inside a block raises (checked
    Arrow kernel), never wraps silently."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.ops import q_corr_moments_lineitem

    t = pa.table({
        "l_returnflag": pa.array(["A"], pa.string()),
        "l_quantity": pa.array([9.0e16], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "lineitem.parquet"))
    with pytest.raises(Exception, match="(?i)overflow"):
        q_corr_moments_lineitem(str(d))
