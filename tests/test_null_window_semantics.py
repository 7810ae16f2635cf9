"""Null / pre-epoch semantics of the window-function family vs the
REGISTERED oracles (review findings, round 4): null event values must not
NaN-poison cumulative sums, null timestamps must not win funnel minima,
null cents must tie in RANK/DENSE_RANK, null user_ids must form ONE
partition, and pre-epoch timestamps must floor (not truncate) to their
hour.  Each test runs the engine kernel AND the exact SQL string shipped
in __ray_entry__.oracle_sql() over the same null-carrying fixture — the
driver's sweep can't see these paths because the sf fixtures hold no
nulls."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


HOUR = 3_600_000_000  # us


def _write_events(tmp_path) -> str:
    """One fixture exercising every fixed path: null values, null ts,
    null user_id, pre-epoch timestamps, ties among null cents."""
    rows = [
        # (event_id, ts_us or None, user_id or None, value or None, type)
        # user 1: null value inside the running/moving window
        (1, 1 * HOUR, 1, 1.0, "view"),
        (2, 2 * HOUR, 1, None, "click"),
        (3, 3 * HOUR, 1, 2.0, "view"),
        (4, 4 * HOUR, 1, 3.0, "purchase"),
        # user 2: a null-ts view plus a valid funnel
        (5, None, 2, 5.0, "view"),
        (6, 1 * HOUR, 2, 6.0, "view"),
        (7, 2 * HOUR, 2, 7.0, "click"),
        (8, 3 * HOUR, 2, 8.0, "purchase"),
        # user 3: tie runs incl. two null cents (rank must tie them)
        (9, 1 * HOUR, 3, 3.0, "view"),
        (10, 2 * HOUR, 3, None, "view"),
        (11, 3 * HOUR, 3, None, "view"),
        (12, 4 * HOUR, 3, 3.0, "view"),
        (13, 5 * HOUR, 3, 1.0, "view"),
        # user 4: pre-epoch timestamps (hour must FLOOR toward -inf)
        (14, -1, 4, 1.0, "view"),
        (15, -2 * HOUR - 5, 4, 2.0, "view"),
        # user 5: only null-ts events (funnel row with all-null stages)
        (16, None, 5, 1.0, "view"),
        (17, None, 5, 2.0, "click"),
        # null user_id at hours 0 and 2 (one LOCF partition, gap filled)
        (18, 0, None, 1.0, "view"),
        (19, 2 * HOUR, None, 2.0, "view"),
        # user 6: null-value prefix (running total NULL until first valid)
        (20, 1 * HOUR, 6, None, "view"),
        (21, 2 * HOUR, 6, 4.0, "view"),
        # user 7: a null-ts purchase (as-of joins emit it with null right)
        (22, None, 7, 1.0, "purchase"),
        (23, 1 * HOUR, 7, 2.0, "view"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "event_type": pa.array([r[4] for r in rows], pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    import glob
    import os

    import duckdb

    import __ray_entry__

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        stem = os.path.splitext(os.path.basename(p))[0]
        con.execute(
            f"CREATE VIEW {stem} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(__ray_entry__.oracle_sql()[name]).df()


def _assert_matches_oracle(got, name: str, sf_dir: str) -> None:
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = _oracle(name, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), name
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("float64"),
                                  want.astype("float64"),
                                  check_dtype=False, obj=name)


@pytest.mark.parametrize("name,fn", [
    ("running_total_user", "q_running_total_user"),
    ("user_event_gaps", "q_user_event_gaps"),
    ("user_moving_sum", "q_user_moving_sum"),
    ("user_funnel", "q_user_funnel"),
    ("user_hourly_locf", "q_user_hourly_locf"),
    ("user_rank_windows", "q_user_rank_windows"),
])
def test_window_family_null_semantics(ray_session, tmp_path, name, fn):
    from yaschva_ray.pipelines import ops

    sf = _write_events(tmp_path)
    got = getattr(ops, fn)(sf)
    _assert_matches_oracle(got, name, sf)


@pytest.mark.parametrize("name", [
    "events_sessions", "top_events_per_type", "events_value_quantiles",
    "events_rollup", "events_pivot", "grouped_quantiles",
    "events_hourly_window", "events_sliding_window",
])
def test_event_aggregates_null_semantics(ray_session, tmp_path, name):
    """The grouped/windowed aggregate family on the same null fixture —
    compared to the registered oracle ROW-ORDER-INSENSITIVELY, because
    DuckDB 1.0's ORDER BY over a parquet view misorders null timestamp
    groups (verified: the same query over a VALUES table sorts fine).
    Values, schemas and row multisets must still agree exactly."""
    import __ray_entry__

    sf = _write_events(tmp_path)
    got = __ray_entry__.queries()[name](sf)
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = _oracle(name, sf)
    assert sorted(got.columns) == sorted(want.columns), name

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(got).equals(norm(want)), name


def _write_join_tables(sf_dir: str) -> None:
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 2, None, 1], pa.int64()),
        "o_orderdate": pa.array([0, 1, None, 2], pa.date32()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    pq.write_table(orders, sf_dir + "/orders.parquet")
    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_retailprice": pa.array([100.0, None, 305.0], pa.float64()),
        "p_name": pa.array(["a", "b", "c"], pa.string()),
        "p_size": pa.array([1, 2, 3], pa.int64()),
    })
    pq.write_table(part, sf_dir + "/part.parquet")


def test_asof_join_null_semantics(ray_session, tmp_path):
    """Keyed as-of with nulls follows three-valued logic (a NULL left
    key/ts matches nothing and keeps the row with a null date; NULL
    right key/date rows match nothing) — pinned against an explicit
    correlated-subquery SQL, NOT DuckDB's ASOF operator, whose keyed
    path treats NULL ts as +inf (and its keyless path as no-match):
    an implementation quirk, not semantics."""
    import duckdb

    from yaschva_ray.pipelines.ops import q_events_asof_orders

    sf = _write_events(tmp_path)
    _write_join_tables(sf)
    got = q_events_asof_orders(sf).to_pandas()
    want = duckdb.sql(f"""
        WITH e AS (SELECT * FROM read_parquet('{sf}/events.parquet')),
             o AS (SELECT * FROM read_parquet('{sf}/orders.parquet'))
        SELECT e.event_id,
               (SELECT max(o.o_orderdate) FROM o
                 WHERE o.o_custkey = e.user_id
                   AND o.o_orderdate <= e.ts) AS asof_date
        FROM e ORDER BY e.event_id
    """).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert [None if pd.isna(x) else str(x)[:10]
            for x in got["asof_date"]] == \
        [None if pd.isna(x) else str(x)[:10] for x in want["asof_date"]]


def test_range_join_null_values(ray_session, tmp_path):
    """NULL values on either side of the interval join satisfy no
    inequality — the registered oracle (a plain SQL inequality join)
    already encodes that; the engine must not NaN-band them together."""
    sf = _write_events(tmp_path)
    _write_join_tables(sf)
    got = __import__("__ray_entry__").queries()["events_price_range_join"](sf)
    _assert_matches_oracle(got, "events_price_range_join", sf)


def test_global_asof_null_semantics(ray_session, tmp_path):
    """Keyless global as-of: NULL left ts emits with a null ref, NULL
    right ts drops — pinned against explicit SQL (DuckDB's keyless ASOF
    happens to agree on the left, and the engine's rsort drops the null
    right rows its unique-ts check would otherwise trip on)."""
    import duckdb

    from yaschva_ray.pipelines.ops import q_events_global_asof

    sf = _write_events(tmp_path)
    got = q_events_global_asof(sf).to_pandas()
    want = duckdb.sql(f"""
        WITH ev AS (SELECT * FROM read_parquet('{sf}/events.parquet')),
        r AS (
            SELECT ts AS rts, MAX(event_id) AS ref_id FROM ev
            WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY ts
        ), l AS (
            SELECT event_id, ts FROM ev WHERE event_type = 'purchase'
        )
        SELECT l.event_id,
               (SELECT r.ref_id FROM r WHERE r.rts <= l.ts
                 ORDER BY r.rts DESC LIMIT 1) AS ref_id
        FROM l ORDER BY event_id
    """).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert [None if pd.isna(x) else int(x) for x in got["ref_id"]] == \
        [None if pd.isna(x) else int(x) for x in want["ref_id"]]


@pytest.mark.parametrize("name", [
    "lineitem_part_left_join", "part_lineitem_full_join",
    "orders_customer_join", "customers_without_orders",
    "active_customers", "events_user_segments", "dangling_lineitem_parts",
    "recent_orders_lineitems", "ship_before_order",
])
def test_join_family_null_keys(ray_session, tmp_path, name):
    """Equi/semi/anti/broadcast joins with NULL keys on both sides:
    NULL = NULL never matches (inner/semi drop, left/full carry typed
    nulls, anti skips NULL FKs like SQL constraints do — the oracles use
    NOT EXISTS because one NULL parent key voids a whole NOT IN)."""
    import __ray_entry__

    d = tmp_path / "sf"
    d.mkdir()
    HOUR_ = HOUR
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([1 * HOUR_, 2 * HOUR_, 3 * HOUR_, 4 * HOUR_],
                       pa.timestamp("us")),
        "user_id": pa.array([1, None, 2, 1], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
        "event_type": pa.array(["view", "click", "view", "purchase"],
                               pa.string()),
    }), str(d / "events.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, None], pa.int64()),
        "c_name": pa.array(["x", "y", "z"], pa.string()),
        "c_mktsegment": pa.array(["A", "B", "C"], pa.string()),
        "c_acctbal": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_custkey": pa.array([1, None, 2, 9], pa.int64()),
        "o_orderdate": pa.array([0, 1, 2, 3], pa.date32()),
        "o_totalprice": pa.array([5.0, 6.0, 7.0, 8.0], pa.float64()),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 11, 99], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int64()),
        "l_partkey": pa.array([1, None, 3], pa.int64()),
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.01, 0.02], pa.float64()),
        "l_returnflag": pa.array(["A", "N", "A"], pa.string()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "l_shipdate": pa.array([0, 1, None], pa.date32()),
        "l_linestatus": pa.array(["O", "F", "O"], pa.string()),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, None], pa.int64()),
        "p_name": pa.array(["a", "b", "c"], pa.string()),
        "p_size": pa.array([1, 2, 3], pa.int64()),
        "p_retailprice": pa.array([100.0, 200.0, 300.0], pa.float64()),
    }), str(d / "part.parquet"))

    got = __ray_entry__.queries()[name](str(d))
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = _oracle(name, str(d))
    assert sorted(got.columns) == sorted(want.columns), name

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(got).equals(norm(want)), name


def test_moving_sum_null_value_exact(ray_session, tmp_path):
    """The review's confirmed reproduction: values [1.0, None, 2.0, 3.0]
    must yield [100, 100, 300, 600] (SUM skips NULLs), not NaN-poisoned
    floats."""
    from yaschva_ray.pipelines.ops import q_user_moving_sum

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "value": pa.array([1.0, None, 2.0, 3.0], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_user_moving_sum(str(d))
    assert out["mov_cents"].to_pylist() == [100, 100, 300, 600]
    assert pa.types.is_integer(out.schema.field("mov_cents").type)


def test_locf_pre_epoch_hours(ray_session, tmp_path):
    """ts=-1us floors to hour -1h (not 0); -2h-5us floors to -3h."""
    from yaschva_ray.pipelines.ops import q_user_hourly_locf

    t = pa.table({
        "ts": pa.array([-1, -2 * HOUR - 5], pa.timestamp("us")),
        "user_id": pa.array([4, 4], pa.int64()),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_user_hourly_locf(str(d))
    assert out["hour_us"].to_pylist() == [-3 * HOUR, -2 * HOUR, -1 * HOUR]
    assert out["cents"].to_pylist() == [200, 200, 100]
