"""TPC-H-shaped COMPOSED pipelines beyond Q1/Q3/Q5/Q10 (ops.py): each
demonstrates a distinct distributed pattern the engine must compose at
100 TB, with an integer-exact DuckDB oracle (cents / cent-x-percent
arithmetic throughout, so hashes are bit-stable).

Patterns covered here:

- Q4  — EXISTS semi over a date window, pushed into a join reduce
- Q13 — zero-preserving LEFT-JOIN group-size histogram in ONE exchange
- Q14 — conditional ratio over a big-big join (integer numerator pair)
- Q15 — argmax-with-ties over a distributed aggregate
- Q17 — correlated per-group scalar filter (0.2 x avg) in ONE exchange
- Q18 — HAVING join-back (heavy groups -> broadcast -> enrich)
- Q19 — OR-of-conjunctions join predicate inside the reduce
- Q21 — multi-EXISTS per-group audit (only-late-supplier)
- Q2' — argmin join-back with ties (min-cost supplier per part)

Scale notes: every big-big pairing goes through the bounded hash
exchange (``engine.joins.hash_join`` / ``engine.exchange.keyed_exchange``);
small sides broadcast as value sets; every scan prunes columns; driver
state is bounded (histograms, winners, heavy groups) with TWO named
exceptions: (a) the chained joins (Q7 here, Q5 in ops.py) materialize
join 1's projected output (orderkey + one dim attr for a 2-of-25-nations
slice) on the driver before feeding join 2 - bounded by selectivity,
not by a constant; (b) Q9 (q_nation_margin) materializes join 1 at the
(orderkey, suppkey) margin grain - pre-aggregated inside the bucket
task, but still O(distinct order-supplier pairs), i.e. proportional to
lineitem on a TPC-H-shaped corpus.  At 100 TB route BOTH through
hash_join's ``out_dir`` per-bucket parquet sinks instead (same contract
as asof_join), re-reading the bucket files as the next join's input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.blocks import gather_tables
from .ops import _read

_US_DAY = 86_400_000_000  # microseconds per day


def _cents(col) -> pa.Array:
    """round(x*100) as int64 — the repo's hash-stable money encoding."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _all(ds) -> pa.Table:
    ts = [t for t in gather_tables(ds) if t.num_rows]
    return (pa.concat_tables(ts).combine_chunks() if ts
            else pa.table({}))


def q_order_priority_exists(sf_dir: str) -> pa.Table:
    """TPC-H Q4-shaped: count Q3-1996 orders per priority where EXISTS a
    lineitem shipped more than 90 days after the order date — the
    EXISTS-semi pattern evaluated INSIDE the join reduce (an order's
    lineitems co-locate on orderkey, so per-order existence is exact in
    the bucket and only a <=5-row priority partial leaves each task).
    Timestamp math is exact int64 microseconds on both sides (DuckDB
    INTERVAL 90 DAY == +90*86400e6 us on TIMESTAMP)."""
    from ..engine.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-07-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"), pa.timestamp("us"))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                                pc.less(t["o_orderdate"], hi)))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def prio_partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        cut = pc.add(pc.cast(t["o_orderdate"], pa.int64()),
                     pa.scalar(90 * _US_DAY, pa.int64()))
        f = t.filter(pc.greater(ship, cut))
        # distinct orders (co-located), then a tiny priority partial
        d = (pa.table({"o_orderkey": f["l_orderkey"],
                       "o_orderpriority": f["o_orderpriority"]})
             .group_by(["o_orderkey", "o_orderpriority"]).aggregate([]))
        g = d.group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "order_count": g["count_all"].cast(pa.int64())})

    parts = hash_join(li, orders.map_batches(o_filter,
                                             batch_format="pyarrow"),
                      left_key="l_orderkey", right_key="o_orderkey",
                      bucket_fn=prio_partial)
    empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                      "order_count": pa.array([], pa.int64())})
    if not parts.num_rows:
        return empty
    g = parts.group_by("o_orderpriority").aggregate([("order_count", "sum")])
    return pa.table({
        "o_orderpriority": g["o_orderpriority"],
        "order_count": g["order_count_sum"].cast(pa.int64()),
    }).sort_by([("o_orderpriority", "ascending")])


def q_customer_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13-shaped: distribution of per-customer order counts
    INCLUDING zero-order customers — the zero-preserving LEFT-JOIN
    group-size histogram, done in ONE union-tagged exchange: customer
    keys (side 0) and per-block order-count partials (side 1) hash to
    the same bucket on custkey; the bucket totals side-1 counts per
    key, assigns 0 to side-0 keys with no match, and emits only its
    LOCAL histogram partial (c_count -> n) — so driver state is bounded
    by the distinct-count histogram width, never by customer count."""
    from ..engine.exchange import keyed_exchange

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def c_side(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["c_custkey"].cast(pa.int64()),
                         "n": pa.array(np.zeros(t.num_rows, np.int64)),
                         "side": pa.array(np.zeros(t.num_rows, np.int8))})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])

    def o_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["o_custkey"]))
        # COUNT(o.o_orderkey) counts NON-NULL orderkeys (Arrow "count"
        # ditto) - a null-orderkey row must bin its customer at 0
        g = f.group_by("o_custkey").aggregate([("o_orderkey", "count")])
        return pa.table({"k": g["o_custkey"].cast(pa.int64()),
                         "n": g["o_orderkey_count"].cast(pa.int64()),
                         "side": pa.array(
                             np.ones(g.num_rows, np.int8))})

    empty = pa.table({"c_count": pa.array([], pa.int64()),
                      "custdist": pa.array([], pa.int64())})

    def hist_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        side = np.asarray(t["side"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), np.int64)
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), np.int64)
        ck = np.unique(k[side == 0])
        if not len(ck):
            return empty
        ok, on = k[side == 1], n[side == 1]
        counts = np.zeros(len(ck), np.int64)
        pos = np.searchsorted(ck, ok)
        hit = (pos < len(ck))
        hit[hit] &= ck[pos[hit]] == ok[hit]
        np.add.at(counts, pos[hit], on[hit])
        vals, freq = np.unique(counts, return_counts=True)
        return pa.table({"c_count": pa.array(vals),
                         "custdist": pa.array(freq.astype(np.int64))})

    parts = keyed_exchange(
        cust.map_batches(c_side, batch_format="pyarrow").union(
            orders.map_batches(o_side, batch_format="pyarrow")),
        "k", hist_bucket, empty_result=empty)
    if not parts:
        return empty
    g = (pa.concat_tables(parts).group_by("c_count")
         .aggregate([("custdist", "sum")]))
    return pa.table({
        "c_count": g["c_count"],
        "custdist": g["custdist_sum"].cast(pa.int64()),
    }).sort_by([("custdist", "descending"), ("c_count", "descending")])


def q_promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q14-shaped: PROMO share of September-1996 revenue as the
    INTEGER numerator/denominator pair (promo_cp, total_cp) — the
    conditional-ratio-over-a-join pattern with the division left to the
    reader so the oracle hash stays exact.  One big-big hash join on
    partkey; each reduce emits a single two-int partial."""
    from ..engine.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-09-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def l_proj(t: pa.Table) -> pa.Table:
        # NULL price/discount makes rev NULL; the mirror's SUM skips it
        # (a NaN->int64 cast would silently poison the sums: reviewed)
        f = t.filter(pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(pc.is_valid(t["l_extendedprice"]),
                    pc.is_valid(t["l_discount"]))))
        rev = pc.multiply_checked(
            _cents(f["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(f["l_discount"])))
        return pa.table({"l_partkey": f["l_partkey"], "rev": rev})

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        rev = np.asarray(t["rev"].to_numpy(zero_copy_only=False),
                         np.int64)
        # NULL p_type -> not PROMO (CASE WHEN NULL -> ELSE), never a
        # None in the mask
        promo = np.asarray(pc.fill_null(
            pc.equal(t["p_type"], "PROMO"), False).to_numpy(
            zero_copy_only=False))
        return pa.table({
            "promo_cp": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_cp": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    parts = hash_join(li.map_batches(l_proj, batch_format="pyarrow"),
                      part, left_key="l_partkey", right_key="p_partkey",
                      bucket_fn=pair_partial)
    n = int(pc.sum(parts["n"]).as_py() or 0) if parts.num_rows else 0
    if not n:  # SUM over empty is NULL on both sides
        return pa.table({"promo_cp": pa.array([None], pa.int64()),
                         "total_cp": pa.array([None], pa.int64())})
    return pa.table({
        "promo_cp": pa.array([int(pc.sum(parts["promo_cp"]).as_py())],
                             pa.int64()),
        "total_cp": pa.array([int(pc.sum(parts["total_cp"]).as_py())],
                             pa.int64())})


def q_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H Q15-shaped: the supplier(s) with maximum Q1-1996 revenue —
    argmax-WITH-TIES over a distributed aggregate.  Per-block partials
    shrink the exchange; each bucket totals its suppliers and emits
    ONLY the rows tying its local max (a bucket's totals are complete,
    so the global argmax is among bucket maxima); the driver compares
    <= n_buckets candidates and enriches names with a winner-key-set
    filtered supplier scan (winners are O(ties), never O(suppliers))."""
    from ..engine.exchange import keyed_exchange

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply_checked(
            _cents(f["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(f["l_discount"])))
        g = (pa.table({"l_suppkey": f["l_suppkey"], "rev": rev})
             .group_by("l_suppkey").aggregate([("rev", "sum")]))
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "rev": g["rev_sum"]})

    empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                      "total_cp": pa.array([], pa.int64())})

    def max_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        g = t.group_by("l_suppkey").aggregate([("rev", "sum")])
        tot = g["rev_sum"].cast(pa.int64())
        mx = pc.max(tot)
        f = pa.table({"l_suppkey": g["l_suppkey"].cast(pa.int64()),
                      "total_cp": tot}).filter(pc.equal(tot, mx))
        return f

    cands = keyed_exchange(li.map_batches(partial,
                                          batch_format="pyarrow"),
                           "l_suppkey", max_bucket, empty_result=empty)
    cands = [c for c in cands if c.num_rows]
    out_empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                          "s_name": pa.array([], pa.string()),
                          "total_cp": pa.array([], pa.int64())})
    if not cands:
        return out_empty
    cand = pa.concat_tables(cands).combine_chunks()
    mx = pc.max(cand["total_cp"])
    win = cand.filter(pc.equal(cand["total_cp"], mx))
    keys = win["l_suppkey"].combine_chunks()

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = _all(supp.map_batches(
        lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=keys)),
        batch_format="pyarrow"))
    if not names.num_rows:
        return out_empty
    nk = np.asarray(names["s_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    order = np.argsort(nk)
    wk = np.asarray(win["l_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    # inner-join semantics: a dangling l_suppkey (no supplier row)
    # drops, matching the mirror's JOIN
    ins = np.clip(np.searchsorted(nk[order], wk), 0, len(nk) - 1)
    found = nk[order][ins] == wk
    pos = order[ins[found]]
    out = pa.table({
        "s_suppkey": pa.array(wk[found]),
        "s_name": pa.array(np.asarray(names["s_name"].to_pylist(),
                                      object)[pos].tolist(),
                           pa.string()),
        "total_cp": win["total_cp"].filter(pa.array(found))})
    return out.sort_by([("s_suppkey", "ascending")])


def q_small_qty_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q17-shaped: revenue (extendedprice cents) of Brand#23
    lineitems whose quantity is below 0.2x that part's average — the
    correlated per-group scalar filter, integer-exact
    (qty < 0.2*avg  <=>  5*qty_c*count < sum_c) and done in ONE
    union-tagged exchange on partkey: the bucket sees the brand's part
    keys (side 0) and every lineitem of those buckets (side 1),
    computes each part's (sum, count) locally, applies the inequality,
    and emits a single-row revenue partial.  No per-part stats table
    ever ships anywhere."""
    from ..engine.exchange import keyed_exchange

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def p_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["p_brand"], "Brand#23"))
        z = np.zeros(f.num_rows, np.int64)
        return pa.table({"k": f["p_partkey"].cast(pa.int64()),
                         "qc": pa.array(z), "ec": pa.array(z),
                         "ecv": pa.array(np.ones(f.num_rows, bool)),
                         "side": pa.array(z.astype(np.int8))})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def l_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["l_quantity"]))
        # ec stays NULLABLE: a null price keeps its row in the per-part
        # (sum, count) average but contributes nothing to SUM(ec) - the
        # mirror's exact semantics (no NaN->int64 poison: reviewed)
        return pa.table({"k": f["l_partkey"].cast(pa.int64()),
                         "qc": _cents(f["l_quantity"]),
                         "ec": _cents(f["l_extendedprice"]),
                         "ecv": pc.is_valid(f["l_extendedprice"]),
                         "side": pa.array(
                             np.ones(f.num_rows, np.int8))})

    empty = pa.table({"rev": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def rev_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        side = np.asarray(t["side"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.unique(k[side == 0])
        if not len(pk):
            return empty
        lk = k[side == 1]
        qc = np.asarray(t["qc"].to_numpy(zero_copy_only=False),
                        np.int64)[side == 1]
        ec = np.asarray(pc.fill_null(t["ec"], 0).to_numpy(
            zero_copy_only=False), np.int64)[side == 1]
        ecv = np.asarray(pc.fill_null(t["ecv"], False).to_numpy(
            zero_copy_only=False))[side == 1]
        pos = np.searchsorted(pk, lk)
        hit = pos < len(pk)
        hit[hit] &= pk[pos[hit]] == lk[hit]
        lk, qc, ec, ecv, pos = \
            lk[hit], qc[hit], ec[hit], ecv[hit], pos[hit]
        if not len(lk):
            return empty
        s = np.zeros(len(pk), np.int64)
        n = np.zeros(len(pk), np.int64)
        np.add.at(s, pos, qc)
        np.add.at(n, pos, 1)
        small = (5 * qc * n[pos] < s[pos]) & ecv
        return pa.table({
            "rev": pa.array([int(ec[small].sum())], pa.int64()),
            "n": pa.array([int(small.sum())], pa.int64())})

    parts = keyed_exchange(
        part.map_batches(p_side, batch_format="pyarrow").union(
            li.map_batches(l_side, batch_format="pyarrow")),
        "k", rev_bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    n = sum(int(pc.sum(p["n"]).as_py() or 0) for p in parts)
    if not n:  # SUM over empty is NULL on both sides
        return pa.table(
            {"small_qty_revenue_cents": pa.array([None], pa.int64())})
    total = sum(int(pc.sum(p["rev"]).as_py() or 0) for p in parts)
    return pa.table(
        {"small_qty_revenue_cents": pa.array([total], pa.int64())})


def q_large_orders(sf_dir: str, min_qty_cents: int = 30_000,
                   k: int = 100) -> pa.Table:
    """TPC-H Q18-shaped: customers who placed orders totalling more than
    300 units — the HAVING join-back pattern: a keyed exchange finds the
    heavy groups (orderkey -> quantity-cents sum > threshold), the SMALL
    heavy set broadcasts back into column-pruned orders / customer scans
    for enrichment, and the driver assembles <= |heavy| rows.  The big
    table is scanned once for the aggregate and never joined row-wise."""
    import ray

    from ..engine.exchange import keyed_exchange

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"l_orderkey": t["l_orderkey"],
                       "qc": _cents(t["l_quantity"])})
             .group_by("l_orderkey").aggregate([("qc", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "qc": g["qc_sum"]})

    empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                      "sum_qty_cents": pa.array([], pa.int64())})

    def heavy_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        g = t.group_by("l_orderkey").aggregate([("qc", "sum")])
        tot = g["qc_sum"].cast(pa.int64())
        return pa.table({"l_orderkey": g["l_orderkey"].cast(pa.int64()),
                         "sum_qty_cents": tot}).filter(
            pc.greater(tot, pa.scalar(min_qty_cents, pa.int64())))

    heavy_parts = [p for p in keyed_exchange(
        li.map_batches(partial, batch_format="pyarrow"),
        "l_orderkey", heavy_bucket, empty_result=empty) if p.num_rows]
    out_empty = pa.table({
        "c_name": pa.array([], pa.string()),
        "c_custkey": pa.array([], pa.int64()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "total_cents": pa.array([], pa.int64()),
        "sum_qty_cents": pa.array([], pa.int64())})
    if not heavy_parts:
        return out_empty
    heavy = pa.concat_tables(heavy_parts).combine_chunks()
    hkeys = heavy["l_orderkey"].combine_chunks()

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    om = _all(orders.map_batches(
        lambda t: t.filter(pc.is_in(t["o_orderkey"], value_set=hkeys)),
        batch_format="pyarrow"))
    if not om.num_rows:
        return out_empty
    ckeys = pc.unique(om["o_custkey"].combine_chunks())
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cm = _all(cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=ckeys)),
        batch_format="pyarrow"))

    # driver-side assembly over <= |heavy| rows
    j = om.join(heavy, keys="o_orderkey", right_keys="l_orderkey",
                join_type="inner")
    j = j.join(cm, keys="o_custkey", right_keys="c_custkey",
               join_type="inner")
    out = pa.table({
        "c_name": j["c_name"],
        "c_custkey": j["o_custkey"].cast(pa.int64()),
        "o_orderkey": j["o_orderkey"].cast(pa.int64()),
        "o_orderdate": j["o_orderdate"],
        "total_cents": _cents(j["o_totalprice"]),
        "sum_qty_cents": j["sum_qty_cents"].cast(pa.int64())})
    order = pc.sort_indices(
        out, sort_keys=[("total_cents", "descending"),
                        ("o_orderdate", "ascending"),
                        ("o_orderkey", "ascending")])
    return out.take(order.slice(0, min(k, len(order))))


def q_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19-shaped: revenue under an OR of brand/size/quantity
    conjunctions — the disjunctive join predicate that can't pre-filter
    EITHER side alone (each disjunct constrains both), so it evaluates
    INSIDE the join reduce where part attrs and lineitem attrs are
    co-located; only a one-row partial leaves each bucket."""
    from ..engine.joins import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def l_proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply_checked(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(t["l_discount"])))
        return pa.table({"l_partkey": t["l_partkey"],
                         "l_quantity": t["l_quantity"], "rev": rev})

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def rev_partial(t: pa.Table) -> pa.Table:
        qty, size = t["l_quantity"], t["p_size"]
        brand = t["p_brand"]

        def clause(b: str, smax: int, qlo: float, qhi: float):
            return pc.and_(
                pc.and_(pc.equal(brand, b),
                        pc.and_(pc.greater_equal(size, 1),
                                pc.less_equal(size, smax))),
                pc.and_(pc.greater_equal(qty, qlo),
                        pc.less_equal(qty, qhi)))

        # NULL attrs make the predicate NULL -> excluded (fill False);
        # NULL rev rows are excluded like the mirror's SUM skip
        m = pc.and_(pc.fill_null(
            pc.or_(pc.or_(clause("Brand#12", 15, 1, 11),
                          clause("Brand#23", 20, 10, 20)),
                   clause("Brand#3", 25, 20, 30)), False),
            pc.is_valid(t["rev"]))
        f = t.filter(m)
        rev = np.asarray(f["rev"].to_numpy(zero_copy_only=False),
                         np.int64)
        return pa.table({"rev": pa.array([int(rev.sum())], pa.int64()),
                         "n": pa.array([f.num_rows], pa.int64())})

    parts = hash_join(li.map_batches(l_proj, batch_format="pyarrow"),
                      part, left_key="l_partkey", right_key="p_partkey",
                      bucket_fn=rev_partial)
    n = int(pc.sum(parts["n"]).as_py() or 0) if parts.num_rows else 0
    if not n:  # SUM over empty is NULL on both sides
        return pa.table({"revenue_cp": pa.array([None], pa.int64())})
    return pa.table({"revenue_cp": pa.array(
        [int(pc.sum(parts["rev"]).as_py())], pa.int64())})


def q_waiting_suppliers(sf_dir: str, k: int = 20) -> pa.Table:
    """TPC-H Q21-shaped: suppliers who were the ONLY late shipper on a
    finished multi-supplier order ("late" = shipped >60 days after the
    order date) — the multi-EXISTS per-group audit: EXISTS another
    supplier on the order AND NOT EXISTS another LATE supplier.  All of
    an order's lineitems co-locate in the join reduce, so both
    existence tests are exact per bucket via vectorized distinct-pair +
    segment-count kernels; each bucket emits a per-supplier count
    partial, and the driver merges counts then name-enriches the <=
    top-k winners with a key-set-filtered supplier scan."""
    from ..engine.joins import hash_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_orderdate": f["o_orderdate"]})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                      "numwait": pa.array([], pa.int64())})

    def wait_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        # distinct (order, supplier) pairs; per-order supplier counts
        pairs = (pa.table({"o": t["l_orderkey"].cast(pa.int64()),
                           "s": t["l_suppkey"].cast(pa.int64())})
                 .group_by(["o", "s"]).aggregate([]))
        po = np.asarray(pairs["o"].to_numpy(zero_copy_only=False),
                        np.int64)
        uo, n_supp = np.unique(po, return_counts=True)
        # distinct LATE (order, supplier) pairs
        ship = pc.cast(t["l_shipdate"], pa.int64())
        cut = pc.add(pc.cast(t["o_orderdate"], pa.int64()),
                     pa.scalar(60 * _US_DAY, pa.int64()))
        f = t.filter(pc.greater(ship, cut))
        if not f.num_rows:
            return empty
        late = (pa.table({"o": f["l_orderkey"].cast(pa.int64()),
                          "s": f["l_suppkey"].cast(pa.int64())})
                .group_by(["o", "s"]).aggregate([]))
        lo = np.asarray(late["o"].to_numpy(zero_copy_only=False),
                        np.int64)
        ls = np.asarray(late["s"].to_numpy(zero_copy_only=False),
                        np.int64)
        ulo, n_late = np.unique(lo, return_counts=True)
        # order qualifies: >1 suppliers total, exactly 1 late supplier
        pos_s = np.searchsorted(uo, ulo)
        ok_orders = ulo[(n_late == 1) & (n_supp[pos_s] > 1)]
        keep = np.isin(lo, ok_orders)
        if not keep.any():
            return empty
        ws, wn = np.unique(ls[keep], return_counts=True)
        return pa.table({"l_suppkey": pa.array(ws),
                         "numwait": pa.array(wn.astype(np.int64))})

    parts = hash_join(li, orders.map_batches(o_filter,
                                             batch_format="pyarrow"),
                      left_key="l_orderkey", right_key="o_orderkey",
                      bucket_fn=wait_partial)
    out_empty = pa.table({"s_name": pa.array([], pa.string()),
                          "numwait": pa.array([], pa.int64())})
    if not parts.num_rows:
        return out_empty
    g = parts.group_by("l_suppkey").aggregate([("numwait", "sum")])
    keys = g["l_suppkey"].combine_chunks()

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = _all(supp.map_batches(
        lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=keys)),
        batch_format="pyarrow"))
    j = g.join(names, keys="l_suppkey", right_keys="s_suppkey",
               join_type="inner")
    out = pa.table({"s_name": j["s_name"],
                    "numwait": j["numwait_sum"].cast(pa.int64())})
    order = pc.sort_indices(out, sort_keys=[("numwait", "descending"),
                                            ("s_name", "ascending")])
    return out.take(order.slice(0, min(k, len(order))))


def q_min_cost_parts(sf_dir: str) -> pa.Table:
    """TPC-H Q2-flavored (no partsupp table in this corpus): for each
    STANDARD part of size 10-15, the supplier(s) that sold it at the
    MINIMUM observed price — argmin JOIN-BACK with ties: pass 1 merges
    per-block per-part minima (bounded by the small filtered part set,
    broadcast as a key set); pass 2 re-scans with the (part -> min)
    broadcast and keeps exactly the achieving rows.  Two pruned scans,
    zero shuffles; winners enrich names via a key-set-filtered supplier
    scan."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"])
    pk_tab = _all(part.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t["p_type"], "STANDARD"),
            pc.and_(pc.greater_equal(t["p_size"], 10),
                    pc.less_equal(t["p_size"], 15))))
        .select(["p_partkey"]), batch_format="pyarrow"))
    out_empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "min_price_cents": pa.array([], pa.int64()),
                          "s_suppkey": pa.array([], pa.int64()),
                          "s_name": pa.array([], pa.string())})
    if not pk_tab.num_rows:
        return out_empty
    pkeys = pk_tab["p_partkey"].combine_chunks()
    pref = ray.put(pkeys)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def min_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(pref)
        f = t.filter(pc.and_(pc.is_in(t["l_partkey"], value_set=ks),
                             pc.is_valid(t["l_extendedprice"])))
        g = (pa.table({"l_partkey": f["l_partkey"],
                       "pc_": _cents(f["l_extendedprice"])})
             .group_by("l_partkey").aggregate([("pc_", "min")]))
        return pa.table({"l_partkey": g["l_partkey"],
                         "mpc": g["pc__min"]})

    mins = _all(li.map_batches(min_partial, batch_format="pyarrow"))
    if not mins.num_rows:
        return out_empty
    gm = mins.group_by("l_partkey").aggregate([("mpc", "min")])
    mk = np.asarray(gm["l_partkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    mv = np.asarray(gm["mpc_min"].to_numpy(zero_copy_only=False),
                    np.int64)
    mo = np.argsort(mk)
    min_ref = ray.put((mk[mo], mv[mo]))

    li2 = _read(sf_dir, "lineitem",
                ["l_partkey", "l_suppkey", "l_extendedprice"])

    def argmin_rows(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(min_ref)
        f = t.filter(pc.is_valid(t["l_extendedprice"]))
        lk = np.asarray(f["l_partkey"].to_numpy(zero_copy_only=False),
                        np.int64)
        cents = np.asarray(_cents(f["l_extendedprice"]), np.int64)
        pos = np.searchsorted(kk, lk)
        hit = pos < len(kk)
        hit[hit] &= (kk[pos[hit]] == lk[hit]) \
            & (vv[pos[hit]] == cents[hit])
        g = (pa.table({"p_partkey": pa.array(lk[hit]),
                       "min_price_cents": pa.array(cents[hit]),
                       "s_suppkey": f["l_suppkey"].filter(
                           pa.array(hit)).cast(pa.int64())})
             .group_by(["p_partkey", "min_price_cents", "s_suppkey"])
             .aggregate([]))
        return g

    rows = _all(li2.map_batches(argmin_rows, batch_format="pyarrow"))
    if not rows.num_rows:
        return out_empty
    rows = rows.group_by(
        ["p_partkey", "min_price_cents", "s_suppkey"]).aggregate([])
    skeys = pc.unique(rows["s_suppkey"].combine_chunks())
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = _all(supp.map_batches(
        lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=skeys)),
        batch_format="pyarrow"))
    j = rows.join(names, keys="s_suppkey", join_type="inner")
    out = pa.table({"p_partkey": j["p_partkey"].cast(pa.int64()),
                    "min_price_cents": j["min_price_cents"].cast(
                        pa.int64()),
                    "s_suppkey": j["s_suppkey"].cast(pa.int64()),
                    "s_name": j["s_name"]})
    return out.sort_by([("p_partkey", "ascending"),
                        ("s_suppkey", "ascending")])


def q_sales_opportunity(sf_dir: str) -> pa.Table:
    """TPC-H Q22-shaped: per market segment, customers whose account
    balance is STRICTLY above the global positive-balance average and
    who placed NO order since 1999 — the global-scalar broadcast + ANTI
    join composition.  The average stays exact as the rational
    (sum_cents, n) pair (bal_c * n > sum_c, no float division); phase 2
    is ONE union-tagged exchange on custkey (customer rows side 0,
    per-block DISTINCT recent-order custkeys side 1) whose bucket
    applies scalar filter + anti-membership and emits per-segment
    partials, so nothing bigger than (segments x buckets) rows reaches
    the driver."""
    from ..engine.exchange import keyed_exchange

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["c_acctbal"], 0.0))
        c = _cents(f["c_acctbal"])
        return pa.table({"s": pa.array([int(pc.sum(c).as_py() or 0)],
                                       pa.int64()),
                         "n": pa.array([f.num_rows], pa.int64())})

    bal = _all(cust.map_batches(bal_partial, batch_format="pyarrow"))
    s_tot = int(pc.sum(bal["s"]).as_py() or 0)
    n_tot = int(pc.sum(bal["n"]).as_py() or 0)

    cut = pa.scalar(np.datetime64("1999-01-01", "us"), pa.timestamp("us"))

    def c_side(t: pa.Table) -> pa.Table:
        # NULL balance: bal*n > s is NULL in the mirror -> excluded;
        # filtering here avoids the NaN->int64 poison (reviewed)
        f = t.filter(pc.is_valid(t["c_acctbal"]))
        return pa.table({"k": f["c_custkey"].cast(pa.int64()),
                         "bal": _cents(f["c_acctbal"]),
                         "seg": f["c_mktsegment"],
                         "side": pa.array(
                             np.zeros(f.num_rows, np.int8))})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def o_side(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], cut),
                             pc.is_valid(t["o_custkey"])))
        g = f.group_by("o_custkey").aggregate([])  # block distinct
        return pa.table({"k": g["o_custkey"].cast(pa.int64()),
                         "bal": pa.array(
                             np.zeros(g.num_rows, np.int64)),
                         "seg": pa.array([""] * g.num_rows,
                                         pa.string()),
                         "side": pa.array(
                             np.ones(g.num_rows, np.int8))})

    empty = pa.table({"c_mktsegment": pa.array([], pa.string()),
                      "numcust": pa.array([], pa.int64()),
                      "tot": pa.array([], pa.int64())})

    def seg_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        side = np.asarray(t["side"].to_numpy(zero_copy_only=False))
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), np.int64)
        ok = np.unique(k[side == 1])
        c = t.filter(pa.array(side == 0))
        bal = np.asarray(c["bal"].to_numpy(zero_copy_only=False),
                         np.int64)
        ck = np.asarray(c["k"].to_numpy(zero_copy_only=False), np.int64)
        keep = (bal * n_tot > s_tot) & ~np.isin(ck, ok)
        f = c.filter(pa.array(keep))
        if not f.num_rows:
            return empty
        g = f.group_by("seg").aggregate([([], "count_all"),
                                         ("bal", "sum")])
        return pa.table({"c_mktsegment": g["seg"],
                         "numcust": g["count_all"].cast(pa.int64()),
                         "tot": g["bal_sum"].cast(pa.int64())})

    parts = keyed_exchange(
        cust.map_batches(c_side, batch_format="pyarrow").union(
            orders.map_batches(o_side, batch_format="pyarrow")),
        "k", seg_bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"c_mktsegment": pa.array([], pa.string()),
                         "numcust": pa.array([], pa.int64()),
                         "totacctbal_cents": pa.array([], pa.int64())})
    g = (pa.concat_tables(parts).group_by("c_mktsegment")
         .aggregate([("numcust", "sum"), ("tot", "sum")]))
    return pa.table({
        "c_mktsegment": g["c_mktsegment"],
        "numcust": g["numcust_sum"].cast(pa.int64()),
        "totacctbal_cents": g["tot_sum"].cast(pa.int64()),
    }).sort_by([("c_mktsegment", "ascending")])


def q_nation_pair_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q7-shaped: 1996-97 revenue between the SYMMETRIC nation
    pair (NATION_1, NATION_2) x ship year — the cross-table pair
    predicate: supplier nation comes from a broadcast lookup, customer
    nation rides the first join, and the (s_nat, c_nat) IN
    {(1,2),(2,1)} filter runs inside the second join reduce where both
    are co-located.  Chained hash joins as in Q5; the customer side is
    pre-filtered to the two nations at the scan so join 1 carries only
    relevant orders."""
    import ray
    import ray.data

    from ..engine.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    nation = _all(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    names = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    keyof = {v: k for k, v in names.items()}
    k1, k2 = keyof["NATION_1"], keyof["NATION_2"]

    supp = _all(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], sn[so]))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def c_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_nationkey"],
                                 value_set=pa.array([k1, k2],
                                                    pa.int64())))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def proj1(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_nationkey": t["c_nationkey"]})

    j1 = hash_join(orders, cust.map_batches(c_filter,
                                            batch_format="pyarrow"),
                   left_key="o_custkey", right_key="c_custkey",
                   bucket_fn=proj1)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def l_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply_checked(
            _cents(f["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(f["l_discount"])))
        yr = pc.cast(pc.year(f["l_shipdate"]), pa.int64())
        g = (pa.table({"l_orderkey": f["l_orderkey"],
                       "l_suppkey": f["l_suppkey"], "l_year": yr,
                       "rev": rev})
             .group_by(["l_orderkey", "l_suppkey", "l_year"])
             .aggregate([("rev", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "l_suppkey": g["l_suppkey"],
                         "l_year": g["l_year"], "rev": g["rev_sum"]})

    def pair_partial(t: pa.Table) -> pa.Table:
        skx, snx = ray.get(supp_ref)
        if not len(skx) or not t.num_rows:  # no suppliers -> inner join is empty
            return pa.table({"s_nat": pa.array([], pa.int64()),
                             "c_nat": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        suppk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                           np.int64)
        cnat = np.asarray(
            t["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
        pos = np.searchsorted(skx, suppk)
        pos = np.clip(pos, 0, max(len(skx) - 1, 0))
        snat = snx[pos] if len(skx) else np.zeros(0, np.int64)
        found = skx[pos] == suppk if len(skx) else np.zeros(0, bool)
        keep = found & (((snat == k1) & (cnat == k2))
                        | ((snat == k2) & (cnat == k1)))
        f = t.filter(pa.array(keep))
        g = (pa.table({"s_nat": pa.array(snat[keep]),
                       "c_nat": pa.array(cnat[keep]),
                       "l_year": f["l_year"], "rev": f["rev"]})
             .group_by(["s_nat", "c_nat", "l_year"])
             .aggregate([("rev", "sum")]))
        return pa.table({"s_nat": g["s_nat"], "c_nat": g["c_nat"],
                         "l_year": g["l_year"], "rev": g["rev_sum"]})

    j2 = hash_join(li.map_batches(l_partial, batch_format="pyarrow"),
                   ray.data.from_arrow(j1),
                   left_key="l_orderkey", right_key="o_orderkey",
                   bucket_fn=pair_partial)
    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue_cp": pa.array([], pa.int64())})
    if not j2.num_rows:
        return empty
    g = (j2.group_by(["s_nat", "c_nat", "l_year"])
         .aggregate([("rev", "sum")]))
    return pa.table({
        "supp_nation": pa.array([names[k] for k in
                                 g["s_nat"].to_pylist()], pa.string()),
        "cust_nation": pa.array([names[k] for k in
                                 g["c_nat"].to_pylist()], pa.string()),
        "l_year": g["l_year"].cast(pa.int64()),
        "revenue_cp": g["rev_sum"].cast(pa.int64()),
    }).sort_by([("supp_nation", "ascending"),
                ("cust_nation", "ascending"), ("l_year", "ascending")])


def q_forecast_revenue_change(sf_dir: str) -> pa.Table:
    """TPC-H Q6-shaped: 1996 revenue delta from dropping small-quantity
    discounts — the pure predicate scan-aggregate (no join at all): a
    single column-pruned pass, per-block one-row partials, the shape
    whose 100 TB win is PRUNING (columns= at the read; the
    violations_lineitem_pruned footer machinery can skip provably-clean
    row groups for the same predicate class).  NULL predicate columns
    excluded like the mirror's WHERE."""
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem",
               ["l_extendedprice", "l_discount", "l_quantity",
                "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        disc_c = _cents(t["l_discount"])
        m = pc.fill_null(pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(pc.and_(pc.greater_equal(disc_c, 5),
                            pc.less_equal(disc_c, 7)),
                    pc.less(t["l_quantity"], 24.0))), False)
        f = t.filter(pc.and_(m, pc.is_valid(t["l_extendedprice"])))
        rev = pc.multiply_checked(_cents(f["l_extendedprice"]),
                                  _cents(f["l_discount"]))
        return pa.table({
            "rev": pa.array([int(pc.sum(rev).as_py() or 0)], pa.int64()),
            "n": pa.array([f.num_rows], pa.int64())})

    parts = [p for p in gather_tables(li.map_batches(
        partial, batch_format="pyarrow")) if p.num_rows]
    n = sum(int(p["n"][0].as_py()) for p in parts)
    if not n:
        return pa.table({"revenue_cc": pa.array([None], pa.int64())})
    return pa.table({"revenue_cc": pa.array(
        [sum(int(p["rev"][0].as_py()) for p in parts)], pa.int64())})


def q_market_share(sf_dir: str) -> pa.Table:
    """TPC-H Q8-shaped: NATION_3's share of region-0 import revenue per
    order year — the grouped conditional-ratio pair: the same chained
    joins as Q5/Q7 (orders⋈customer feeding lineitem⋈ on orderkey, with
    customer pre-filtered to region 0's nations at the scan and the
    supplier-nation broadcast lookup in the second reduce), but the
    reduce emits per-year (nation_cp, total_cp) integer pairs — share =
    nation_cp / total_cp left to the reader so the hash stays exact."""
    import ray
    import ray.data

    from ..engine.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    nation = _all(_read(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]))
    r0 = nation.filter(pc.equal(nation["n_regionkey"], 0))
    r0_keys = pa.array(sorted(r0["n_nationkey"].to_pylist()),
                       pa.int64())
    target = {v: k for k, v in zip(
        nation["n_nationkey"].to_pylist(),
        nation["n_name"].to_pylist())}["NATION_3"]

    supp = _all(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], sn[so]))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_custkey": f["o_custkey"],
                         "o_year": pc.cast(pc.year(f["o_orderdate"]),
                                           pa.int64())})

    def proj1(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": t["o_year"]})

    j1 = hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        cust.map_batches(
            lambda t: t.filter(pc.is_in(t["c_nationkey"],
                                        value_set=r0_keys))
            .select(["c_custkey"]), batch_format="pyarrow"),
        left_key="o_custkey", right_key="c_custkey", bucket_fn=proj1)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.is_valid(t["l_extendedprice"]),
                             pc.is_valid(t["l_discount"])))
        rev = pc.multiply_checked(
            _cents(f["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(f["l_discount"])))
        g = (pa.table({"l_orderkey": f["l_orderkey"],
                       "l_suppkey": f["l_suppkey"], "rev": rev})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("rev", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "l_suppkey": g["l_suppkey"],
                         "rev": g["rev_sum"]})

    def share_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "nat": pa.array([], pa.int64()),
                          "tot": pa.array([], pa.int64())})
        skx, snx = ray.get(supp_ref)
        if not len(skx) or not t.num_rows:
            return empty
        suppk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                           np.int64)
        pos = np.clip(np.searchsorted(skx, suppk), 0, len(skx) - 1)
        found = skx[pos] == suppk
        if not found.any():
            return empty
        f = t.filter(pa.array(found))
        snat = snx[pos[found]]
        rev = np.asarray(f["rev"].to_numpy(zero_copy_only=False),
                         np.int64)
        yr = np.asarray(f["o_year"].to_numpy(zero_copy_only=False),
                        np.int64)
        is_t = (snat == target).astype(np.int64)
        g = (pa.table({"o_year": pa.array(yr),
                       "nat": pa.array(rev * is_t),
                       "tot": pa.array(rev)})
             .group_by("o_year").aggregate([("nat", "sum"),
                                            ("tot", "sum")]))
        return pa.table({"o_year": g["o_year"],
                         "nat": g["nat_sum"], "tot": g["tot_sum"]})

    j2 = hash_join(li.map_batches(l_partial, batch_format="pyarrow"),
                   ray.data.from_arrow(j1),
                   left_key="l_orderkey", right_key="o_orderkey",
                   bucket_fn=share_partial)
    empty = pa.table({"o_year": pa.array([], pa.int64()),
                      "nation_cp": pa.array([], pa.int64()),
                      "total_cp": pa.array([], pa.int64())})
    if not j2.num_rows:
        return empty
    g = j2.group_by("o_year").aggregate([("nat", "sum"), ("tot", "sum")])
    return pa.table({
        "o_year": g["o_year"],
        "nation_cp": g["nat_sum"].cast(pa.int64()),
        "total_cp": g["tot_sum"].cast(pa.int64()),
    }).sort_by([("o_year", "ascending")])


def q_nation_margin(sf_dir: str) -> pa.Table:
    """TPC-H Q9-shaped (no partsupp ⇒ margin proxy): per supplier
    nation × order year, revenue minus retail cost (p_retailprice ×
    quantity) — the multi-table COMPUTED-measure aggregate: lineitem ⋈
    part on partkey carries the retail price into the per-(order)
    partial, the orders join attaches the year, and the supplier-nation
    broadcast resolves the group key in the final reduce; margin stays
    integer cent×percent minus cent×qty_cents/... — both terms scale to
    cent·percent units (×100) so one integer column carries the
    difference exactly."""
    import ray
    import ray.data

    from ..engine.joins import hash_join

    nation = _all(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    names = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    supp = _all(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], sn[so]))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])

    def l_proj(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.and_(pc.is_valid(t["l_extendedprice"]),
                    pc.is_valid(t["l_discount"])),
            pc.is_valid(t["l_quantity"])))
        rev = pc.multiply_checked(
            _cents(f["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()),
                        _cents(f["l_discount"])))
        return pa.table({"l_partkey": f["l_partkey"],
                         "l_orderkey": f["l_orderkey"],
                         "l_suppkey": f["l_suppkey"],
                         "qc": _cents(f["l_quantity"]), "rev": rev})

    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def cost_partial(t: pa.Table) -> pa.Table:
        # cost in cent-x-percent: retail_cents * qty_cents => cents^2;
        # normalize both terms to cent*percent: rev is cents*percent,
        # cost = retail_cents * qc (cents*cents).  qc is quantity*100
        # and percent is discount*100 — SAME scale, so rev - retail*qc
        # is exact in one integer unit (documented in the mirror too)
        f = t.filter(pc.is_valid(t["p_retailprice"]))
        cost = pc.multiply_checked(_cents(f["p_retailprice"]), f["qc"])
        margin = pc.subtract(f["rev"].cast(pa.int64()), cost)
        # pre-aggregate to the (orderkey, suppkey) grain INSIDE the
        # bucket task — downstream only needs margin at that grain, and
        # emitting one row per joined lineitem would put the full fact
        # table on the driver between join 1 and join 2 (round-4 ADVICE)
        g = (pa.table({"l_orderkey": f["l_orderkey"],
                       "l_suppkey": f["l_suppkey"],
                       "margin": margin})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("margin", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "l_suppkey": g["l_suppkey"],
                         "margin": g["margin_sum"]})

    j1 = hash_join(li.map_batches(l_proj, batch_format="pyarrow"),
                   part, left_key="l_partkey", right_key="p_partkey",
                   bucket_fn=cost_partial)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def o_proj(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                           pa.int64())})

    def nation_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_key": pa.array([], pa.int64()),
                          "o_year": pa.array([], pa.int64()),
                          "margin": pa.array([], pa.int64())})
        skx, snx = ray.get(supp_ref)
        if not len(skx) or not t.num_rows:
            return empty
        suppk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                           np.int64)
        pos = np.clip(np.searchsorted(skx, suppk), 0, len(skx) - 1)
        found = skx[pos] == suppk
        if not found.any():
            return empty
        f = t.filter(pa.array(found))
        g = (pa.table({"n_key": pa.array(snx[pos[found]]),
                       "o_year": f["o_year"],
                       "margin": f["margin"]})
             .group_by(["n_key", "o_year"])
             .aggregate([("margin", "sum")]))
        return pa.table({"n_key": g["n_key"], "o_year": g["o_year"],
                         "margin": g["margin_sum"]})

    j2 = hash_join(ray.data.from_arrow(j1),
                   orders.map_batches(o_proj, batch_format="pyarrow"),
                   left_key="l_orderkey", right_key="o_orderkey",
                   bucket_fn=nation_partial)
    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "o_year": pa.array([], pa.int64()),
                      "margin_cp": pa.array([], pa.int64())})
    if not j2.num_rows:
        return empty
    g = j2.group_by(["n_key", "o_year"]).aggregate([("margin", "sum")])
    # inner-join semantics: a nationkey with no nation row drops
    known = pa.array([k in names for k in g["n_key"].to_pylist()])
    g = g.filter(known)
    return pa.table({
        "n_name": pa.array([names[k] for k in
                            g["n_key"].to_pylist()], pa.string()),
        "o_year": g["o_year"].cast(pa.int64()),
        "margin_cp": g["margin_sum"].cast(pa.int64()),
    }).sort_by([("n_name", "ascending"), ("o_year", "ascending")])


def q_important_parts(sf_dir: str) -> pa.Table:
    """TPC-H Q11-shaped (no partsupp ⇒ lineitem inventory proxy): parts
    whose total traded value (qty_cents × price_cents summed over
    lineitem) exceeds 1.3× the average per catalog part (value ·
    n_parts · 10 > 13 · grand, exact rational — a FIXED fraction is
    all-or-none on this uniform corpus) — grouped filter against global
    scalars: pass 1 folds one-row per-block totals (n_parts is the
    part table's O(1) footer row count); pass 2 re-aggregates per part
    and filters against the broadcast scalars inside the exchange
    bucket, so only qualifying parts leave.  Two scans, one bounded
    exchange — the HAVING-against-global shape (Q11's nested
    aggregate) without any driver-side per-part state."""
    import pyarrow.parquet as pq

    from ..engine.exchange import keyed_exchange

    n_parts = pq.ParquetFile(f"{sf_dir}/part.parquet") \
        .metadata.num_rows

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def val_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.is_valid(t["l_quantity"]),
                             pc.is_valid(t["l_extendedprice"])))
        v = pc.multiply_checked(_cents(f["l_quantity"]),
                                _cents(f["l_extendedprice"]))
        return pa.table({"l_partkey": f["l_partkey"].cast(pa.int64()),
                         "v": v})

    def tot_partial(t: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array(
            [int(pc.sum(t["v"]).as_py() or 0)], pa.int64())})

    totals = [p for p in gather_tables(
        li.map_batches(val_rows, batch_format="pyarrow").map_batches(
            tot_partial, batch_format="pyarrow")) if p.num_rows]
    grand = sum(int(p["s"][0].as_py()) for p in totals)
    empty = pa.table({"l_partkey": pa.array([], pa.int64()),
                      "value_qp": pa.array([], pa.int64())})
    if not grand:
        return empty

    def heavy_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        g = t.group_by("l_partkey").aggregate([("v", "sum")])
        tot = g["v_sum"].cast(pa.int64())
        # value*n_parts*10 > 13*grand  <=>  value > 1.3*avg, exact
        keep = pc.greater(pc.multiply_checked(
            tot, pa.scalar(n_parts * 10, pa.int64())),
            pa.scalar(13 * grand, pa.int64()))
        return pa.table({"l_partkey": g["l_partkey"].cast(pa.int64()),
                         "value_qp": tot}).filter(keep)

    parts = keyed_exchange(
        li.map_batches(val_rows, batch_format="pyarrow"),
        "l_partkey", heavy_bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("value_qp", "descending"),
                      ("l_partkey", "ascending")]))


def q_supplier_part_types(sf_dir: str) -> pa.Table:
    """TPC-H Q16-shaped: DISTINCT supplier count per (brand, type, size)
    for size ∈ {10, 20, 30}, EXCLUDING a supplier blocklist (names
    ending '7' — Q16's complaint-suppliers NOT IN) — grouped
    COUNT(DISTINCT) over a join with an anti-set: the blocklist
    broadcasts as a key set (it is output-sized, not table-sized),
    lineitem ⋈ part on partkey emits DISTINCT (attrs, suppkey) pairs
    from each reduce (the map-side distinct bounds the exchange), and
    the driver's final distinct-count collapses ≤ groups × suppliers
    rows."""
    import ray

    from ..engine.joins import hash_join

    supp = _all(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    bad = supp.filter(pc.match_substring_regex(
        pc.fill_null(supp["s_name"], ""), "7$"))
    bad_keys = bad["s_suppkey"].combine_chunks()
    bref = ray.put(bad_keys)

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type",
                                  "p_size"])

    def p_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["p_size"], value_set=pa.array(
            [10, 20, 30], t["p_size"].type)))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_partial(t: pa.Table) -> pa.Table:
        blk = ray.get(bref)
        f = t.filter(pc.and_(
            pc.invert(pc.fill_null(pc.is_in(
                t["l_suppkey"], value_set=blk), False)),
            pc.is_valid(t["l_suppkey"])))
        return (pa.table({"p_brand": f["p_brand"],
                          "p_type": f["p_type"],
                          "p_size": pc.cast(f["p_size"], pa.int64()),
                          "s": f["l_suppkey"].cast(pa.int64())})
                .group_by(["p_brand", "p_type", "p_size", "s"])
                .aggregate([]))

    pairs = hash_join(li, part.map_batches(p_filter,
                                           batch_format="pyarrow"),
                      left_key="l_partkey", right_key="p_partkey",
                      bucket_fn=pair_partial)
    empty = pa.table({"p_brand": pa.array([], pa.string()),
                      "p_type": pa.array([], pa.string()),
                      "p_size": pa.array([], pa.int64()),
                      "supplier_cnt": pa.array([], pa.int64())})
    if not pairs.num_rows:
        return empty
    d = pairs.group_by(["p_brand", "p_type", "p_size", "s"]).aggregate([])
    g = (d.group_by(["p_brand", "p_type", "p_size"])
         .aggregate([([], "count_all")]))
    return pa.table({
        "p_brand": g["p_brand"], "p_type": g["p_type"],
        "p_size": g["p_size"].cast(pa.int64()),
        "supplier_cnt": g["count_all"].cast(pa.int64()),
    }).sort_by([("supplier_cnt", "descending"),
                ("p_brand", "ascending"), ("p_type", "ascending"),
                ("p_size", "ascending")])


def q_excess_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H Q20-shaped: suppliers who shipped MORE than 1.25x the
    average per-supplier volume of PROMO parts in 1996 (qc·4n > 5·sum,
    exact rational — 2x is a >3σ bar on this uniform corpus and
    matches nobody) — the nested-aggregate semi (Q20's fraction-of-sum
    subquery, inverted to a supplier filter): one keyed exchange on
    suppkey totals each supplier's PROMO-part 1996 quantity (the part
    filter broadcasts as a key set), bucket emits (suppkey, qty)
    totals, the driver computes the exact rational average (sum, n)
    and keeps the over-average suppliers, then name-enriches the
    winners via a key-set-filtered supplier scan."""
    import ray

    from ..engine.exchange import keyed_exchange

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    pk = _all(part.map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], "PROMO"))
        .select(["p_partkey"]), batch_format="pyarrow"))
    out_empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                          "s_name": pa.array([], pa.string()),
                          "qty_cents": pa.array([], pa.int64())})
    if not pk.num_rows:
        return out_empty
    pref = ray.put(pk["p_partkey"].combine_chunks())

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        ks = ray.get(pref)
        f = t.filter(pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(pc.is_in(t["l_partkey"], value_set=ks),
                    pc.and_(pc.is_valid(t["l_quantity"]),
                            pc.is_valid(t["l_suppkey"])))))
        g = (pa.table({"l_suppkey": f["l_suppkey"].cast(pa.int64()),
                       "qc": _cents(f["l_quantity"])})
             .group_by("l_suppkey").aggregate([("qc", "sum")]))
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "qc": g["qc_sum"]})

    empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                      "qc": pa.array([], pa.int64())})

    def tot_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        g = t.group_by("l_suppkey").aggregate([("qc", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"].cast(pa.int64()),
                         "qc": g["qc_sum"].cast(pa.int64())})

    parts = [p for p in keyed_exchange(
        li.map_batches(partial, batch_format="pyarrow"),
        "l_suppkey", tot_bucket, empty_result=empty) if p.num_rows]
    if not parts:
        return out_empty
    tot = pa.concat_tables(parts).combine_chunks()
    qc = np.asarray(tot["qc"].to_numpy(zero_copy_only=False), np.int64)
    n = len(qc)
    s = int(qc.sum())
    keep = qc * n * 4 > 5 * s  # qty > 1.25*avg, exact rational
    win = tot.filter(pa.array(keep))
    if not win.num_rows:
        return out_empty
    keys = win["l_suppkey"].combine_chunks()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = _all(supp.map_batches(
        lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=keys)),
        batch_format="pyarrow"))
    j = win.join(names, keys="l_suppkey", right_keys="s_suppkey",
                 join_type="inner")
    out = pa.table({"s_suppkey": j["l_suppkey"].cast(pa.int64()),
                    "s_name": j["s_name"],
                    "qty_cents": j["qc"].cast(pa.int64())})
    return out.sort_by([("s_suppkey", "ascending")])
