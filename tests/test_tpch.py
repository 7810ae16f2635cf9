"""Composed TPC-H-shaped pipelines (pipelines/tpch.py): each test pins
the Ray pipeline against the SHIPPED DuckDB oracle SQL (the driver's own
comparison), plus planted fixtures for the semantics the sf corpus can't
exercise: zero-order customers in the Q13 histogram, the Q21 only-late
predicate, and the Q17 integer 0.2x-avg boundary."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entry
from yaschva_ray.pipelines import tpch

SF_DIR = "/root/testdata/sf0.001"
_TABLES = ("customer", "orders", "lineitem", "part", "supplier")


def _oracle(name: str, sf_dir: str = SF_DIR) -> pa.Table:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(entry.oracle_sql()[name]).arrow()


def _check(name: str, out: pa.Table):
    ora = _oracle(name)
    assert out.equals(ora.cast(out.schema)), \
        f"{name}: Ray != oracle\nray={out.to_pydict()}\n" \
        f"ora={ora.to_pydict()}"


def test_order_priority_exists_matches_oracle(ray_session):
    out = entry.queries()["order_priority_exists"](SF_DIR)
    _check("order_priority_exists", out)
    # all five priorities appear and counts are positive
    assert out.num_rows == 5
    assert min(out["order_count"].to_pylist()) > 0


def test_customer_distribution_matches_oracle(ray_session):
    out = entry.queries()["customer_distribution"](SF_DIR)
    _check("customer_distribution", out)
    # total custdist equals the customer count (every customer binned)
    n_cust = pq.ParquetFile(f"{SF_DIR}/customer.parquet") \
        .metadata.num_rows
    assert sum(out["custdist"].to_pylist()) == n_cust


def test_customer_distribution_zero_preserved(ray_session, tmp_path):
    """Customers with NO orders land in the c_count=0 bin (the LEFT
    JOIN semantics a naive inner-join plan silently loses)."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3, None], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64())}),
        str(d / "orders.parquet"))
    out = tpch.q_customer_distribution(str(d))
    got = dict(zip(out["c_count"].to_pylist(),
                   out["custdist"].to_pylist()))
    # cust 1 -> 2 orders, cust 3 -> 1, custs 2 & 4 -> 0 (null custkey
    # order matches nobody)
    assert got == {0: 2, 1: 1, 2: 1}


def test_promo_revenue_matches_oracle(ray_session):
    out = entry.queries()["promo_revenue"](SF_DIR)
    _check("promo_revenue", out)
    p, t = out["promo_cp"][0].as_py(), out["total_cp"][0].as_py()
    assert 0 < p < t  # PROMO is 1 of 6 types: strictly between


def test_top_supplier_matches_oracle(ray_session):
    out = entry.queries()["top_supplier"](SF_DIR)
    _check("top_supplier", out)
    assert out.num_rows >= 1
    # all returned rows tie at the same (maximal) revenue
    assert len(set(out["total_cp"].to_pylist())) == 1


def test_small_qty_revenue_matches_oracle(ray_session):
    out = entry.queries()["small_qty_revenue"](SF_DIR)
    _check("small_qty_revenue", out)


def test_small_qty_boundary(ray_session, tmp_path):
    """The integer predicate 5*qc*n < s is STRICT: a quantity exactly at
    0.2x the average is excluded (matching SQL's <)."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([7, 8], pa.int64()),
        "p_brand": pa.array(["Brand#23", "Brand#1"], pa.string())}),
        str(d / "part.parquet"))
    # part 7: quantities [1, 9] -> avg 5, 0.2*avg = 1 -> qty 1 is NOT
    # below (strict), nothing qualifies; part 8 is the wrong brand
    pq.write_table(pa.table({
        "l_partkey": pa.array([7, 7, 8], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0, 0.1], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0], pa.float64())}),
        str(d / "lineitem.parquet"))
    out = tpch.q_small_qty_revenue(str(d))
    assert out["small_qty_revenue_cents"][0].as_py() is None
    # shrink part 7's small quantity to 0.99 -> strictly below 0.2*avg
    pq.write_table(pa.table({
        "l_partkey": pa.array([7, 7], pa.int64()),
        "l_quantity": pa.array([0.99, 9.01], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0], pa.float64())}),
        str(d / "lineitem.parquet"))
    out = tpch.q_small_qty_revenue(str(d))
    assert out["small_qty_revenue_cents"][0].as_py() == 1000


def test_large_orders_matches_oracle(ray_session):
    out = entry.queries()["large_orders"](SF_DIR)
    _check("large_orders", out)
    # every reported order clears the 300-unit threshold
    assert all(v > 30_000 for v in out["sum_qty_cents"].to_pylist())


def test_disjunctive_revenue_matches_oracle(ray_session):
    out = entry.queries()["disjunctive_revenue"](SF_DIR)
    _check("disjunctive_revenue", out)


def test_waiting_suppliers_matches_oracle(ray_session):
    out = entry.queries()["waiting_suppliers"](SF_DIR)
    _check("waiting_suppliers", out)
    assert out.num_rows >= 1


def test_waiting_suppliers_only_late_logic(ray_session, tmp_path):
    """Planted per-order casework: a supplier counts only when the
    order is finished, multi-supplier, and they are the SOLE late
    shipper."""
    d = tmp_path / "sf"
    d.mkdir()
    day = np.timedelta64(86_400_000_000, "us")
    t0 = np.datetime64("2000-01-01", "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"], pa.string()),
        "o_orderdate": pa.array([t0] * 4, pa.timestamp("us"))}),
        str(d / "orders.parquet"))
    late, ok = t0 + 61 * day, t0 + 10 * day
    rows = [
        (1, 10, late), (1, 11, ok),    # order 1: supp 10 sole late -> counts
        (2, 10, late), (2, 11, late),  # order 2: two late -> nobody
        (3, 12, late),                 # order 3: single-supplier -> no
        (4, 10, late), (4, 11, ok),    # order 4: status O -> excluded
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_shipdate": pa.array([r[2] for r in rows],
                               pa.timestamp("us"))}),
        str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["S10", "S11", "S12"], pa.string())}),
        str(d / "supplier.parquet"))
    out = tpch.q_waiting_suppliers(str(d))
    assert out.to_pydict() == {"s_name": ["S10"], "numwait": [1]}
    # the shipped oracle agrees on the same planted table
    con = duckdb.connect()
    for t in ("orders", "lineitem", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    ora = con.execute(
        entry.oracle_sql()["waiting_suppliers"]).arrow()
    assert out.equals(ora.cast(out.schema))


def test_min_cost_parts_matches_oracle(ray_session):
    out = entry.queries()["min_cost_parts"](SF_DIR)
    _check("min_cost_parts", out)
    # per part, every reported supplier ties the part's minimum
    per_part = {}
    for r in out.to_pylist():
        per_part.setdefault(r["p_partkey"], set()).add(
            r["min_price_cents"])
    assert all(len(v) == 1 for v in per_part.values())


# --- dedup_spans (textops; tested here to reuse the oracle helper) ----

def test_dedup_spans_matches_oracle(ray_session):
    out = __import__("__ray_entry__").queries()["dedup_spans"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    ora = con.execute(entry.oracle_sql()["dedup_spans"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # the corpus genuinely shares 8-grams: something was removed
    assert sum(out["n_removed_tokens"].to_pylist()) > 0


def test_dedup_spans_overlap_and_within_doc(ray_session, tmp_path):
    """Overlapping duplicate windows merge into one contiguous removed
    span; repetition WITHIN a single doc is NOT removed (min_docs
    counts distinct documents)."""
    from yaschva_ray.pipelines import textops

    d = tmp_path / "sf"
    d.mkdir()
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 9 tokens -> two 8-windows
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"a {shared} b",
            f"x {shared}",
            # doc 3 repeats ITS OWN 8-gram twice; no other doc has it
            "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8",
        ], pa.string())}),
        str(d / "documents.parquet"))
    out = textops.q_dedup_spans(str(d))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
           for r in out.to_pylist()}
    # the two overlapping windows merged: all 9 shared tokens removed
    assert got[1] == ("a b", 9)
    assert got[2] == ("x", 9)
    # within-doc repetition untouched
    assert got[3][1] == 0 and got[3][0].startswith("r1 r2")
    # the shipped oracle agrees on the planted table
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(entry.oracle_sql()["dedup_spans"]).arrow()
    assert out.equals(ora.cast(out.schema))


def test_sales_opportunity_matches_oracle(ray_session):
    out = entry.queries()["sales_opportunity"](SF_DIR)
    _check("sales_opportunity", out)
    assert out.num_rows >= 1


def test_sales_opportunity_strict_and_anti(ray_session, tmp_path):
    """Strictly-above-average (exact rational, no float div) and the
    date-windowed NOT EXISTS both bite."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        # positive balances: 10, 20, 30 -> avg 20; cust 4 negative
        "c_acctbal": pa.array([10.0, 20.0, 30.0, -5.0], pa.float64()),
        "c_mktsegment": pa.array(["A", "A", "B", "B"], pa.string())}),
        str(d / "customer.parquet"))
    t_new = np.datetime64("2000-06-01", "us")
    t_old = np.datetime64("1998-06-01", "us")
    pq.write_table(pa.table({
        "o_custkey": pa.array([3, 1], pa.int64()),
        # cust 3 has a RECENT order -> excluded; cust 1's is old
        "o_orderdate": pa.array([t_new, t_old], pa.timestamp("us"))}),
        str(d / "orders.parquet"))
    out = tpch.q_sales_opportunity(str(d))
    # cust 2 is exactly AT the average (20) -> excluded (strict >);
    # cust 3 above avg but recently active -> excluded; nobody remains
    assert out.num_rows == 0
    # raise cust 2 above the average -> the only qualifying customer
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_acctbal": pa.array([10.0, 20.01, 30.0, -5.0], pa.float64()),
        "c_mktsegment": pa.array(["A", "A", "B", "B"], pa.string())}),
        str(d / "customer.parquet"))
    out = tpch.q_sales_opportunity(str(d))
    assert out.to_pydict() == {"c_mktsegment": ["A"], "numcust": [1],
                               "totacctbal_cents": [2001]}


def test_nation_pair_volume_matches_oracle(ray_session):
    # sf0.001 has zero qualifying rows; sf0.01 exercises both pair
    # directions, so pin the oracle there
    sf = "/root/testdata/sf0.01"
    out = entry.queries()["nation_pair_volume"](sf)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ora = con.execute(entry.oracle_sql()["nation_pair_volume"]).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows >= 2  # both directions x two ship years


# --- merkle_diff (ops; divergence localization) ------------------------

def test_merkle_diff_matches_oracle(ray_session):
    out = entry.queries()["merkle_diff_documents"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    ora = con.execute(
        entry.oracle_sql()["merkle_diff_documents"]).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows >= 1  # the evolution genuinely diverges


def test_merkle_diff_localizes(ray_session):
    """Every range the row-level snapshot_diff touches is reported, and
    no clean range is — the digest table is a sound and exact index for
    a targeted repair re-scan."""
    from yaschva_ray.pipelines import ops as _ops

    sf = SF_DIR
    ranges = set(entry.queries()["merkle_diff_documents"](sf)
                 ["range_id"].to_pylist())
    diff = _ops.q_snapshot_diff_documents(sf)
    touched = {i // 256 for i in diff["doc_id"].to_pylist()}
    assert ranges == touched


# --- CUBE + time-weighted average --------------------------------------

def test_orders_cube_matches_oracle(ray_session):
    out = entry.queries()["orders_cube"](SF_DIR)
    _check("orders_cube", out)
    # the four grouping sets reconcile: each level sums to the grand
    lv = {}
    for r in out.to_pylist():
        lv.setdefault(r["lvl"], 0)
        lv[r["lvl"]] += r["revenue_cents"]
    assert lv[0] == lv[1] == lv[2] == lv[3]


def test_time_weighted_value_matches_oracle(ray_session):
    out = entry.queries()["time_weighted_value"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    ora = con.execute(
        entry.oracle_sql()["time_weighted_value"]).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows >= 1


def test_time_weighted_value_semantics(ray_session, tmp_path):
    """Hand-computed intervals: right-open holds, tie order by
    event_id, single-reading users drop, nulls filtered."""
    d = tmp_path / "sf"
    d.mkdir()
    us = 1_000_000
    rows = [
        # user 1: v=2.00 for 10s, then v=4.00 for 5s, then ends
        (1, 1, 0 * us, 2.0),
        (2, 1, 10 * us, 4.0),
        (3, 1, 15 * us, 9.0),     # terminal reading: no interval
        # user 2: single reading -> drops
        (4, 2, 0 * us, 1.0),
        # user 3: tie at t=0 ordered by event_id (5 before 6)
        (5, 3, 0 * us, 1.0),
        (6, 3, 0 * us, 3.0),      # zero-length interval contributes 0
        (7, 3, 4 * us, 5.0),
        # nulls everywhere -> filtered
        (8, None, 0 * us, 1.0),
        (9, 4, None, 1.0),
        (10, 4, 0 * us, None),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64())}),
        str(d / "events.parquet"))
    from yaschva_ray.pipelines import ops as _ops
    out = _ops.q_time_weighted_value(str(d))
    got = {r["user_id"]: (r["num_cvus"], r["den_us"])
           for r in out.to_pylist()}
    # user 1: 200c*10s + 400c*5s = 4_000_000_000 cvus over 15s
    assert got[1] == (200 * 10 * us + 400 * 5 * us, 15 * us)
    # user 3: 100c*0 + 300c*4s over 4s
    assert got[3] == (300 * 4 * us, 4 * us)
    assert set(got) == {1, 3}


def test_f0_span_grammar_matches_oracle(ray_session):
    """Caption-grammar violations over the interleaved F0 table equal
    the LEAD-window mirror, and the organic classes all appear."""
    out = entry.queries()["f0_span_grammar"](SF_DIR)
    con = duckdb.connect()
    ora = con.execute(entry.oracle_sql()["f0_span_grammar"]).arrow()
    assert out.equals(ora.cast(out.schema))
    classes = set(out["class"].to_pylist())
    assert {"uncaptioned_media", "trailing_media"} <= classes


def test_expectation_suite_matches_oracle(ray_session):
    out = entry.queries()["expectation_suite_lineitem"](SF_DIR)
    _check("expectation_suite_lineitem", out)
    got = {r["check_name"]: (r["n_violations"], r["passed"])
           for r in out.to_pylist()}
    # the composite key is genuinely non-unique here: a real failure
    assert got["unique_orderkey_linenumber"][0] > 0
    assert not got["unique_orderkey_linenumber"][1]
    # and the clean expectations genuinely pass
    assert got["returnflag_in_enum"] == (0, True)


def test_sssp_weighted_matches_oracle(ray_session):
    out = entry.queries()["sssp_weighted"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    ora = con.execute(entry.oracle_sql()["sssp_weighted"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # weighted != hop-count: some node's weighted dist must beat a
    # 1-edge-per-hop lower bound only loosely — check a node improved
    # after first discovery is POSSIBLE in this graph by asserting the
    # set of reached nodes matches BFS reachability at the same rounds
    from yaschva_ray.pipelines import ops as _ops
    bfs = _ops.q_bfs_hops(SF_DIR, max_hops=4)
    assert set(out["doc_id"].to_pylist()) == \
        set(bfs["doc_id"].to_pylist())


def test_repair_lineitem_matches_oracle(ray_session):
    """Repair report (counts + repaired-content digest) equals the
    CASE-repair mirror; all three rules bite organically."""
    out = entry.queries()["repair_lineitem"](SF_DIR)
    _check("repair_lineitem", out)
    got = dict(zip(out["metric"].to_pylist(),
                   out["value"].to_pylist()))
    assert got["n_clamped_quantity"] > 0
    assert got["n_clamped_discount"] > 0
    assert got["n_defaulted_returnflag"] > 0


def test_repair_preserves_nulls(ray_session, tmp_path):
    """Repair never invents data: NULL quantity/discount/flag pass
    through unrepaired and uncounted."""
    from yaschva_ray.pipelines import ops as _ops
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([None, 99.0], pa.float64()),
        "l_discount": pa.array([None, 0.5], pa.float64()),
        "l_returnflag": pa.array([None, "X"], pa.string())}),
        str(d / "lineitem.parquet"))
    out = _ops.q_repair_lineitem(str(d))
    got = dict(zip(out["metric"].to_pylist(), out["value"].to_pylist()))
    assert got["n_clamped_quantity"] == 1
    assert got["n_clamped_discount"] == 1
    assert got["n_defaulted_returnflag"] == 1
    # the shipped oracle agrees on the same planted table
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{d}/lineitem.parquet')")
    ora = con.execute(entry.oracle_sql()["repair_lineitem"]).arrow()
    assert out.equals(ora.cast(out.schema))


def test_forget_user_matches_oracle(ray_session):
    """Keyed right-to-be-forgotten delete: report equals the arithmetic
    mirror, with the after-counts measured from the rewritten export."""
    out = entry.queries()["forget_user_events"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    ora = con.execute(
        entry.oracle_sql()["forget_user_events"]).arrow()
    assert out.equals(ora.cast(out.schema))
    got = dict(zip(out["metric"].to_pylist(), out["value"].to_pylist()))
    assert got["n_forgotten"] > 0 and got["n_user_after"] == 0


def test_promo_revenue_null_safety(ray_session, tmp_path):
    """NULL price/discount rows are skipped like the mirror's SUM; NULL
    p_type is not PROMO — pinned against the shipped oracle on a
    null-heavy planted table (the NaN->int64 poison regression)."""
    d = tmp_path / "sf"
    d.mkdir()
    t0 = np.datetime64("1996-09-15", "us")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, None, 20.0, 30.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, None, 0.1], pa.float64()),
        "l_shipdate": pa.array([t0] * 4, pa.timestamp("us"))}),
        str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", None], pa.string())}),
        str(d / "part.parquet"))
    out = tpch.q_promo_revenue(str(d))
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    ora = con.execute(entry.oracle_sql()["promo_revenue"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # row 1 only for promo (1000c*100); row 4 only for the null-type part
    assert out.to_pydict() == {"promo_cp": [100000],
                               "total_cp": [100000 + 3000 * 90]}


def test_customer_distribution_null_orderkey(ray_session, tmp_path):
    """A valid-custkey order with NULL o_orderkey does NOT count
    (COUNT(o.o_orderkey) semantics): its customer bins at zero."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64())}),
        str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderkey": pa.array([100, None], pa.int64())}),
        str(d / "orders.parquet"))
    out = tpch.q_customer_distribution(str(d))
    got = dict(zip(out["c_count"].to_pylist(),
                   out["custdist"].to_pylist()))
    assert got == {0: 1, 1: 1}


def test_time_weighted_null_event_id_tiebreak(ray_session, tmp_path):
    """NULL event_id sorts LAST among equal timestamps (mirror's ORDER
    BY NULLS LAST), so the null row's value is the one held after the
    tie — pinned against the shipped oracle."""
    from yaschva_ray.pipelines import ops as _ops
    d = tmp_path / "sf"
    d.mkdir()
    us = 1_000_000
    pq.write_table(pa.table({
        "event_id": pa.array([None, 5, 7], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 0, 10 * us], pa.timestamp("us")),
        "value": pa.array([9.0, 2.0, 1.0], pa.float64())}),
        str(d / "events.parquet"))
    out = _ops.q_time_weighted_value(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    ora = con.execute(
        entry.oracle_sql()["time_weighted_value"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # held value over [0, 10s) is the NULL-id row's 9.00 (sorts last at
    # ts=0); the id=5 row's interval is zero-length
    assert out.to_pydict() == {"user_id": [1],
                               "num_cvus": [900 * 10 * us],
                               "den_us": [10 * us]}


# --- completing the TPC-H shape family (Q6/Q8/Q9'/Q11'/Q16'/Q20') ------

_SIX_TABLES = ("lineitem", "orders", "customer", "supplier", "nation",
               "part")


def _check6(name: str, out: pa.Table, sf: str = SF_DIR) -> pa.Table:
    con = duckdb.connect()
    for t in _SIX_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ora = con.execute(entry.oracle_sql()[name]).arrow()
    assert out.equals(ora.cast(out.schema)), name
    return out


def test_forecast_revenue_change_matches_oracle(ray_session):
    out = _check6("forecast_revenue_change",
                  entry.queries()["forecast_revenue_change"](SF_DIR))
    assert out["revenue_cc"][0].as_py() > 0


def test_market_share_matches_oracle(ray_session):
    out = _check6("market_share",
                  entry.queries()["market_share"](SF_DIR))
    for r in out.to_pylist():
        assert 0 <= r["nation_cp"] <= r["total_cp"]


def test_nation_margin_matches_oracle(ray_session):
    out = _check6("nation_margin",
                  entry.queries()["nation_margin"](SF_DIR))
    assert out.num_rows >= 25  # every nation x several years


def test_important_parts_matches_oracle(ray_session):
    out = _check6("important_parts",
                  entry.queries()["important_parts"](SF_DIR))
    assert 0 < out.num_rows < 200  # the 1.3x-avg bar genuinely cuts


def test_supplier_part_types_matches_oracle(ray_session):
    out = _check6("supplier_part_types",
                  entry.queries()["supplier_part_types"](SF_DIR))
    assert out.num_rows > 0


def test_excess_suppliers_matches_oracle(ray_session):
    out = _check6("excess_suppliers",
                  entry.queries()["excess_suppliers"](SF_DIR))
    assert out.num_rows >= 1  # the 1.25x-avg bar keeps a real tail


def test_equidepth_events_matches_oracle(ray_session):
    """Equi-depth histogram: rank arithmetic over the counting
    distribution equals row-level NTILE; tile sizes differ by <=1 and
    bounds are monotone."""
    out = entry.queries()["equidepth_events"](SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    ora = con.execute(entry.oracle_sql()["equidepth_events"]).arrow()
    assert out.equals(ora.cast(out.schema))
    ns = out["n"].to_pylist()
    assert max(ns) - min(ns) <= 1
    los, his = out["lo_cents"].to_pylist(), out["hi_cents"].to_pylist()
    assert all(lo <= hi for lo, hi in zip(los, his))
    assert his == sorted(his) and los == sorted(los)


def test_equidepth_tie_straddle(ray_session, tmp_path):
    """A single massive tie straddles tile boundaries: every tile's
    bounds collapse onto the tied value exactly as row-level NTILE
    assigns them."""
    from yaschva_ray.pipelines import ops as _ops
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array(range(25), pa.int64()),
        "value": pa.array([7.0] * 23 + [1.0, 9.0], pa.float64())}),
        str(d / "events.parquet"))
    out = _ops.q_equidepth_events(str(d), k=10)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    ora = con.execute(entry.oracle_sql()["equidepth_events"]).arrow()
    assert out.equals(ora.cast(out.schema))
    # 25 rows / 10 tiles: first 5 tiles of 3, last 5 of 2; tile 1 holds
    # the 1.0 minimum, the last holds the 9.0 maximum, middles all 700
    assert out["n"].to_pylist() == [3] * 5 + [2] * 5
    assert out["lo_cents"][0].as_py() == 100
    assert out["hi_cents"][9].as_py() == 900
    assert set(out["lo_cents"].to_pylist()[1:9]) == {700}


def test_dedup_spans_fingerprint_matches_string_mode(ray_session):
    """The default fingerprint-keyed gram exchange (128-bit pair, 32
    bytes/window shuffled) must produce IDENTICAL output to the
    gram-string-keyed audit path on real corpus data — the round-4
    review's remaining scale item, now the production default."""
    from yaschva_ray.pipelines import textops
    from yaschva_ray.pipelines.ops import _read

    ds = _read(SF_DIR, "documents", ["doc_id", "text"])
    fp = textops.dedup_spans_from_ds(ds, key_mode="fingerprint")
    st = textops.dedup_spans_from_ds(
        _read(SF_DIR, "documents", ["doc_id", "text"]),
        key_mode="string")
    assert fp.equals(st)
    assert sum(fp["n_removed_tokens"].to_pylist()) > 0


def test_dedup_spans_fingerprint_parity_nasty_inputs(ray_session):
    """Fingerprint vs string key parity on adversarial shapes: empty
    texts, NULL text, single-token docs, unicode tokens, within-doc
    repetition, exact multi-doc duplication."""
    import ray.data

    from yaschva_ray.pipelines import textops

    texts = [
        "", None, "one",
        "ünïcode tökens ünïcode tökens ünïcode tökens ünïcode tökens x",
        "a b c d e f g h i j",            # shared 8-gram base
        "z a b c d e f g h i j",          # shares the window
        "r r r r r r r r r r r r r r r",  # within-doc repetition only
        "a b c d e f g h i j",            # exact duplicate of idx 4
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def run(mode):
        return textops.dedup_spans_from_ds(
            ray.data.from_arrow(t).repartition(3), key_mode=mode)

    fp, st = run("fingerprint"), run("string")
    assert fp.equals(st)
    got = {r["doc_id"]: r["n_removed_tokens"] for r in fp.to_pylist()}
    assert got[4] == 10 and got[5] == 10 and got[7] == 10  # shared run
    assert got[6] == 0                                     # within-doc only
