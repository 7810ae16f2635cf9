"""Operator-family queries over the driver testdata tables (FIXTURES.md F15).

Each public ``q_*`` function takes ``sf_dir`` and returns a small result
(pyarrow Table or pandas DataFrame); ``__ray_entry__.queries()`` maps names
to them and ``oracle_sql()`` carries the DuckDB-equivalent SQL the driver
cross-checks against.  Column names match the SQL exactly.

Scale notes: every groupby is preceded by an in-batch partial aggregate;
small sides are broadcast (value sets), never shuffled; reads prune columns.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.blocks import gather_tables
from ..engine.checks import uniqueness_violations
from ..pipelines.flagship import validate_dataset
from ..vectorized import TableValidator, ViolationExploder


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    from ..sources import clean_parquet_schema

    path = f"{sf_dir}/{table}.parquet"
    # metadata-stripped schema keeps block schemas hashable (fast unify path);
    # a single-file table otherwise splits into too few blocks to use the
    # whole CPU pool (Ray sizes blocks by bytes, not by available slots)
    import ray

    nb = None
    if ray.is_initialized():
        nb = max(int(ray.cluster_resources().get("CPU", 8)), 8)
    return ray.data.read_parquet(path, columns=columns,
                                 schema=clean_parquet_schema(path, columns),
                                 override_num_blocks=nb)


def _sorted_table(ds_or_table, sort_cols: list[str]) -> pa.Table:
    from ..engine.blocks import gather_tables

    if isinstance(ds_or_table, pa.Table):
        t = ds_or_table
    else:
        tables = gather_tables(ds_or_table)
        t = pa.concat_tables(tables, promote_options="default") if tables else pa.table({})
    if t.num_rows:
        t = t.combine_chunks().sort_by([(c, "ascending") for c in sort_cols])
    return t


# --- schema-validation checks (the reference's operator family) -------------

LINEITEM_CHECK_SCHEMA = {
    "l_orderkey": "any",
    "l_linenumber": "any",
    "l_quantity": {"$number": {"min": 1, "max": 25}},
    "l_discount": {"$number": {"min": 0, "max": 0.05}},
    "l_returnflag": {"$enum": ["A", "N"]},
}

LINEITEM_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"]


def q_check_lineitem(sf_dir: str) -> pa.Table:
    """Rows violating the lineitem constraint schema → (l_orderkey, l_linenumber)."""
    ds = _read(sf_dir, "lineitem", LINEITEM_COLS)
    validated = validate_dataset(ds, LINEITEM_CHECK_SCHEMA)
    bad = validated.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])).select(["l_orderkey", "l_linenumber"]),
        batch_format="pyarrow",
    )
    return _sorted_table(bad, ["l_orderkey", "l_linenumber"])


def q_violations_lineitem(sf_dir: str) -> pa.Table:
    """Exploded violation rows with exact reference error strings."""
    ds = _read(sf_dir, "lineitem", LINEITEM_COLS)
    validated = validate_dataset(ds, LINEITEM_CHECK_SCHEMA)
    exploder = ViolationExploder(LINEITEM_CHECK_SCHEMA,
                                 id_columns=("l_orderkey", "l_linenumber"))
    vio = validated.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])), batch_format="pyarrow"
    ).map_batches(exploder, batch_format="pyarrow")
    out = _sorted_table(vio, ["l_orderkey", "l_linenumber", "path"])
    return out.select(["l_orderkey", "l_linenumber", "path", "error"]) if out.num_rows else pa.table(
        {"l_orderkey": pa.array([], pa.int64()), "l_linenumber": pa.array([], pa.int32()),
         "path": pa.array([], pa.string()), "error": pa.array([], pa.string())})


def provably_clean_files(paths: list[str],
                         bounds: dict[str, tuple[float, float]]) -> tuple[list[str], list[str]]:
    """Split files into (clean, suspicious) using FOOTERS only: a file is
    provably clean iff for EVERY bounded column each row group has
    statistics, zero nulls, and footer [min, max] inside the bound —
    those files can be skipped by a violation scan without reading a
    data page.  Anything unprovable (missing stats, any null, any
    excursion) is suspicious — pruning is conservative, never lossy.
    Only numeric $number-style bounds are footer-provable; $enum/regex
    constraints force the scan (string footer bounds may truncate)."""
    import pyarrow.parquet as pq

    clean, suspicious = [], []
    for path in paths:
        md = pq.read_metadata(path)
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        ok = all(c in idx for c in bounds)
        if ok:
            for col, (lo, hi) in bounds.items():
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[col]).statistics
                    if (st is None or not st.has_min_max
                            or st.null_count is None or st.null_count
                            or st.min < lo or st.max > hi):
                        ok = False
                        break
                if not ok:
                    break
        (clean if ok else suspicious).append(path)
    return clean, suspicious


LINEITEM_NUMERIC_SCHEMA = {
    "l_orderkey": "any",
    "l_linenumber": "any",
    "l_quantity": {"$number": {"min": 1, "max": 25}},
    "l_discount": {"$number": {"min": 0, "max": 0.05}},
}


def q_violations_lineitem_pruned(sf_dir: str) -> pa.Table:
    """The numeric lineitem violations with FOOTER PRUNING in front of the
    scan: files whose footers prove every bounded column in range (and
    null-free) never leave storage.  Pruning is conservative, so the
    result is identical to scanning everything (the oracle checks that);
    at 100 TB a mostly-clean corpus reads only its suspicious shards.
    The $enum constraint is excluded — footers cannot prove it."""
    import glob as _glob

    import ray.data

    files = sorted(_glob.glob(os.path.join(sf_dir, "lineitem*.parquet")))
    bounds = {"l_quantity": (1.0, 25.0), "l_discount": (0.0, 0.05)}
    clean, suspicious = provably_clean_files(files, bounds)
    if clean:
        _LOG.info("violations_lineitem_pruned: %d/%d files footer-proven "
                  "clean, skipped", len(clean), len(files))
    empty = pa.table({
        "l_orderkey": pa.array([], pa.int64()),
        "l_linenumber": pa.array([], pa.int32()),
        "path": pa.array([], pa.string()),
        "error": pa.array([], pa.string())})
    if not suspicious:
        return empty
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    ds = ray.data.read_parquet(suspicious, columns=cols)
    validated = validate_dataset(ds, LINEITEM_NUMERIC_SCHEMA)
    exploder = ViolationExploder(LINEITEM_NUMERIC_SCHEMA,
                                 id_columns=("l_orderkey", "l_linenumber"))
    vio = validated.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])), batch_format="pyarrow"
    ).map_batches(exploder, batch_format="pyarrow")
    out = _sorted_table(vio, ["l_orderkey", "l_linenumber", "path"])
    if not out.num_rows:
        return empty
    return out.select(["l_orderkey", "l_linenumber", "path", "error"])


DOCS_CHECK_SCHEMA = {
    "doc_id": "any",
    "text": {"$string": {"minLength": 1}},
    "lang": {"$enum": ["de", "en", "es", "fr", "zh"]},
    "source": {"$string": {"regex": "^src[0-9]+$"}},
    "n_chars": {"$number": {"min": 1, "max": 300}},
}


def q_violations_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents")
    validated = validate_dataset(ds, DOCS_CHECK_SCHEMA)
    exploder = ViolationExploder(DOCS_CHECK_SCHEMA, id_columns=("doc_id",))
    vio = validated.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])), batch_format="pyarrow"
    ).map_batches(exploder, batch_format="pyarrow")
    out = _sorted_table(vio, ["doc_id", "path"])
    if not out.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "path": pa.array([], pa.string()),
                         "error": pa.array([], pa.string())})
    return out.select(["doc_id", "path", "error"])


def q_check_events_props(sf_dir: str) -> pa.Table:
    """Dynamic JSON payload check: props.k must be in [0, 50] → violating
    event_ids.  Vectorized regex extraction (no JSON parse per row)."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def check(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(ext, "k").cast(pa.int64())
        bad = pc.or_kleene(pc.is_null(k), pc.or_(pc.less(pc.fill_null(k, 0), 0),
                                                 pc.greater(pc.fill_null(k, 0), 50)))
        return pa.table({"event_id": t["event_id"].filter(bad)})

    return _sorted_table(ds.map_batches(check, batch_format="pyarrow"), ["event_id"])


def q_unique_check_embeddings(sf_dir: str) -> pa.Table:
    """$unique set-constraint validation over the embeddings table —
    the ENGINE EXTENSION implementing the reference's own declared
    future work ("Array to be unique set", /root/reference/README.md:
    174-178; implemented by neither side of the differential): each
    embedding vector must contain no deep-equal repeated element,
    evaluated by the vectorized TableValidator's hash-prescreen +
    exact-verify kernel (vectorized.py _segment_dup_any).  Random
    float vectors never collide, so 8 violating rows are PLANTED
    (vec_id+40M, element 2 overwritten with element 1 — the
    setsim_join planted-oracle pattern) and the DuckDB mirror
    replicates the plant with list arithmetic.  Output: (vec_id,
    valid) for every row of the augmented table."""
    import ray.data

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = gather_tables(ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 8)),
        batch_format="pyarrow"))
    head = pa.concat_tables([t for t in head if t.num_rows]) \
        .sort_by([("vec_id", "ascending")])
    planted_rows = []
    for r in head.to_pylist():
        emb = list(r["embedding"])
        emb[1] = emb[0]  # exact duplicate of element 1
        planted_rows.append({"vec_id": r["vec_id"] + 40_000_000,
                             "embedding": emb})
    planted = pa.Table.from_pylist(planted_rows, schema=pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32()))]))

    schema = {"vec_id": "number",
              "embedding": {"$array": "number", "$unique": True}}
    tv = TableValidator(schema)

    def check(t: pa.Table) -> pa.Table:
        out = tv(t)
        return pa.table({"vec_id": out["vec_id"].cast(pa.int64()),
                         "valid": out["valid"]})

    aug = ds.union(ray.data.from_arrow(planted))
    return _sorted_table(aug.map_batches(check, batch_format="pyarrow"),
                         ["vec_id"])


# --- uniqueness / referential ----------------------------------------------


def q_uniqueness_events_user(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["user_id"])
    dup = uniqueness_violations(ds, "user_id")
    return _sorted_table(dup, ["user_id"])


def q_customers_without_orders(sf_dir: str) -> pa.Table:
    """Anti-join: customers with no orders.  ``referential_missing_keys``
    measures the distinct right-side key count and picks broadcast
    (small side, shuffle-free is_in filter) or hash-partitioned co-group
    (the distinct key set of a 100 TB orders table is not broadcastable)."""
    from ..engine.checks import referential_missing_keys

    return referential_missing_keys(
        _read(sf_dir, "customer", ["c_custkey"]),
        _read(sf_dir, "orders", ["o_custkey"]),
        "c_custkey", "o_custkey")


def q_active_customers(sf_dir: str) -> pa.Table:
    """SEMI-join (the set-intersection complement of the anti-join
    family): distinct customer keys that appear as event users.  Broadcast
    the distinct event-user set once, per-block vectorized ``is_in``
    filter + distinct partials — no shuffle of either side."""
    import ray

    users = _read(sf_dir, "events", ["user_id"])
    blocks = gather_tables(
        users.map_batches(lambda t: pa.table(
            {"user_id": pc.unique(t["user_id"].combine_chunks()
                                  if isinstance(t["user_id"], pa.ChunkedArray)
                                  else t["user_id"])}),
            batch_format="pyarrow"))
    uset = pc.unique(pa.concat_tables(blocks)["user_id"].combine_chunks()) \
        if blocks else pa.array([], pa.int64())
    # SQL IN semantics: NULL = NULL is not a match — a null custkey is
    # never "active" and a null user_id activates nobody
    uset = uset.drop_null()
    ref = ray.put(uset)

    def semi(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        hit = t.filter(pc.is_in(t["c_custkey"], value_set=vs))
        d = hit.group_by("c_custkey").aggregate([])
        return pa.table({"c_custkey": d["c_custkey"]})

    out = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        semi, batch_format="pyarrow")
    return _sorted_table(out, ["c_custkey"])


def q_dangling_lineitem_parts(sf_dir: str) -> pa.Table:
    """Referential: distinct lineitem.l_partkey values not present in part
    (size-switched broadcast/partitioned anti-join; expected empty on clean
    TPC-H data)."""
    from ..engine.checks import referential_missing_keys

    return referential_missing_keys(
        _read(sf_dir, "lineitem", ["l_partkey"]),
        _read(sf_dir, "part", ["p_partkey"]),
        "l_partkey", "p_partkey")


# --- aggregates / stats -----------------------------------------------------


def q_null_counts_documents(sf_dir: str) -> pa.Table:
    cols = ["text", "lang", "source"]
    ds = _read(sf_dir, "documents", cols)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": pa.array(cols, pa.string()),
            "n_nulls": pa.array([t[c].null_count for c in cols], pa.int64()),
            "n_rows": pa.array([t.num_rows] * len(cols), pa.int64()),
        })

    # bounded-cardinality partials (3 rows per block): driver-side combine
    import ray

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    g = (pa.concat_tables(blocks).group_by("col_name")
         .aggregate([("n_nulls", "sum"), ("n_rows", "sum")]))
    out = pa.table({"col_name": g["col_name"],
                    "n_nulls": g["n_nulls_sum"].cast(pa.int64()),
                    "n_rows": g["n_rows_sum"].cast(pa.int64())})
    return _sorted_table(out, ["col_name"])


def q_distinct_lang(sf_dir: str) -> pa.Table:
    """Exact distinct count of a LOW-cardinality column via the house
    partial pattern: per-block ``pc.unique`` + driver set-union.  Ray
    Data's ``unique()`` is an all-to-all shuffle costing seconds of fixed
    latency for a 5-value column (the repo's measured groupby finding,
    engine/checks.py)."""
    import ray

    ds = _read(sf_dir, "documents", ["lang"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["lang"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"lang": pc.unique(col)})

    vals: set = set()
    for b in gather_tables(ds.map_batches(partial, batch_format="pyarrow")):
        vals.update(b["lang"].to_pylist())
    vals.discard(None)  # SQL COUNT(DISTINCT …) excludes NULL
    return pa.table({"n_distinct": pa.array([len(vals)], pa.int64())})


def q_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-flavored grouped aggregate with exact integer-cent sums
    (floating sums are order-dependent; cents are hash-stable).
    Pre-aggregated per batch before the final combine."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        tt = pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "qty_cents": qty_c, "price_cents": price_c,
            "n_rows": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("price_cents", "sum"), ("n_rows", "sum")])
        return pa.table({
            "l_returnflag": g["l_returnflag"], "l_linestatus": g["l_linestatus"],
            "qty_cents": g["qty_cents_sum"], "price_cents": g["price_cents_sum"],
            "n_rows": g["n_rows_sum"],
        })

    # final combine on the driver: the partials are ≤ #groups rows per
    # block (group cardinality is bounded by flag×status), so a Ray Data
    # groupby here would be an all-to-all exchange of a few KB — seconds of
    # fixed latency for nothing
    import ray

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    g = (pa.concat_tables(blocks).group_by(["l_returnflag", "l_linestatus"])
         .aggregate([("qty_cents", "sum"), ("price_cents", "sum"),
                     ("n_rows", "sum")]))
    out = pa.table({
        "l_returnflag": g["l_returnflag"], "l_linestatus": g["l_linestatus"],
        "sum_qty_cents": g["qty_cents_sum"].cast(pa.int64()),
        "sum_price_cents": g["price_cents_sum"].cast(pa.int64()),
        "n_rows": g["n_rows_sum"].cast(pa.int64()),
    })
    return _sorted_table(out, ["l_returnflag", "l_linestatus"])


def _count_tokens_batch(t: pa.Table) -> pa.Table:
    n = pc.count_substring_regex(t["text"], r"\S+").cast(pa.int64())
    n_bpe = pc.count_substring_regex(t["text"], r"\w+|[^\w\s]").cast(pa.int64())
    return pa.table({"doc_id": t["doc_id"], "n_tokens": n,
                     "n_bpe_tokens": n_bpe})


def q_token_count_documents(sf_dir: str) -> pa.Table:
    """Token counting: whitespace tokens plus a BPE-ish pre-tokenizer count
    (words and punctuation marks as separate tokens — the unit a subword
    tokenizer would split further)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _sorted_table(ds.map_batches(_count_tokens_batch,
                                        batch_format="pyarrow"), ["doc_id"])


def _pack_phase1(block: pa.Table):
    """Per-block scan half: token counts, IN-BLOCK exclusive prefix sums,
    and a one-row meta (id range + token total) for the driver's global
    prefix.  Returns (meta, prefix_table)."""
    from ..engine.sketches import limit_worker_threads

    limit_worker_threads()
    empty_meta = pa.table({"min_id": pa.array([], pa.int64()),
                           "max_id": pa.array([], pa.int64()),
                           "total": pa.array([], pa.int64())})
    if not block.num_rows or "doc_id" not in block.column_names:
        return empty_meta, pa.table({"doc_id": pa.array([], pa.int64()),
                                     "n_tokens": pa.array([], pa.int64()),
                                     "local_start": pa.array([], pa.int64())})
    counts = _count_tokens_batch(block)
    order = pc.sort_indices(counts, sort_keys=[("doc_id", "ascending")])
    s = counts.take(order)
    ids = np.asarray(s["doc_id"].to_numpy(zero_copy_only=False))
    n = np.asarray(pc.fill_null(s["n_tokens"], 0)
                   .to_numpy(zero_copy_only=False)).astype(np.int64)
    local_start = np.concatenate([[0], np.cumsum(n)[:-1]]) if len(n) \
        else np.empty(0, np.int64)
    meta = pa.table({"min_id": pa.array([int(ids[0])], pa.int64()),
                     "max_id": pa.array([int(ids[-1])], pa.int64()),
                     "total": pa.array([int(n.sum())], pa.int64())})
    return meta, pa.table({"doc_id": pa.array(ids),
                           "n_tokens": pa.array(n),
                           "local_start": pa.array(local_start)})


def _pack_phase2(prefix: pa.Table, offset: int, budget: int) -> pa.Table:
    from ..engine.sketches import limit_worker_threads

    limit_worker_threads()
    if not prefix.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "pack_id": pa.array([], pa.int64())})
    start = np.asarray(prefix["local_start"].to_numpy(zero_copy_only=False))
    pack = (start + offset) // budget
    return pa.table({"doc_id": prefix["doc_id"],
                     "n_tokens": prefix["n_tokens"],
                     "pack_id": pa.array(pack.astype(np.int64))})


_PACK1_REMOTE = None
_PACK2_REMOTE = None


def pack_sequences_from_ds(ds, budget: int = 512) -> pa.Table:
    """Context-window sequence packing (the concat-and-cut pretraining
    step): documents concatenate in doc_id order into one token stream
    cut every ``budget`` tokens; each doc is assigned the pack its FIRST
    token lands in → (doc_id, n_tokens, pack_id).

    Distributed SCAN (exclusive prefix sum), the two-wave pattern: wave
    1 computes per-block token sums and in-block prefixes (blocks stay
    in the object store); the driver orders the one-row metas by doc_id
    range — block ranges must be disjoint (parquet sorted by doc_id;
    asserted loudly, never assumed) — and prefixes the totals; wave 2
    adds each block's global offset.  Driver state is one (min, max,
    sum) row per block, O(blocks) not O(rows)."""
    import ray

    from ..engine.blocks import iter_block_refs

    global _PACK1_REMOTE, _PACK2_REMOTE
    if _PACK1_REMOTE is None:
        _PACK1_REMOTE = ray.remote(num_returns=2)(_pack_phase1)
        _PACK2_REMOTE = ray.remote(_pack_phase2)

    meta_refs, prefix_refs = [], []
    for ref in iter_block_refs(ds):
        m, p = _PACK1_REMOTE.remote(ref)
        meta_refs.append(m)
        prefix_refs.append(p)
    metas = ray.get(meta_refs)
    rows = [(int(m["min_id"][0].as_py()), int(m["max_id"][0].as_py()),
             int(m["total"][0].as_py()), i)
            for i, m in enumerate(metas) if m.num_rows]
    rows.sort()
    for (_, mx, _, _), (mn2, _, _, _) in zip(rows, rows[1:]):
        if mx >= mn2:
            raise RuntimeError(
                "pack_sequences requires doc_id-range-disjoint blocks "
                f"(got overlap: block max {mx} >= next min {mn2}); "
                "sort the input by doc_id first")
    offset = 0
    out_refs = []
    for _, _, total, i in rows:
        out_refs.append(_PACK2_REMOTE.remote(prefix_refs[i], offset, budget))
        offset += total
    parts = [t for t in ray.get(out_refs) if t.num_rows]
    if not parts:
        return _pack_phase2(pa.table({}), 0, budget)
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


def q_pack_sequences(sf_dir: str, budget: int = 512) -> pa.Table:
    return pack_sequences_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]), budget)


def _table_as(sf_dir: str, table: str, columns: list[str], fmt: str) -> list[str]:
    """Materialize a testdata table in another format under /tmp (once per
    sf_dir, tmp-dir + atomic rename) THROUGH the engine's own sink — the
    conversion itself exercises ``write_docs``; callers then read it back
    through ``read_docs`` extension dispatch."""
    import glob
    import hashlib
    import shutil

    from ..sources import write_docs

    tag = hashlib.md5(f"{os.path.realpath(sf_dir)}:{table}:{fmt}"
                      .encode()).hexdigest()[:10]
    out = os.path.join("/tmp", "yaschva_sources", f"{table}_{fmt}_{tag}")
    ext = {"jsonl": "json", "csv": "csv", "orc": "orc",
           "feather": "feather"}[fmt]
    if not os.path.isdir(out):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_docs(_read(sf_dir, table, columns), tmp, format=fmt)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        os.rename(tmp, out)
    return sorted(glob.glob(os.path.join(out, f"*.{ext}")))


def q_token_count_jsonl(sf_dir: str) -> pa.Table:
    """Same computation and ORACLE as ``q_token_count_documents`` but
    end-to-end through the non-parquet I/O path: documents round-trip
    parquet → JSONL (``write_docs``) → ``read_docs`` extension dispatch →
    identical token counts (the JSONL source/sink executed for real, not
    mocked — hash-exact vs the same SQL)."""
    from ..sources import read_docs

    files = _table_as(sf_dir, "documents", ["doc_id", "text"], "jsonl")
    ds = read_docs(files, columns=["doc_id", "text"])
    return _sorted_table(ds.map_batches(_count_tokens_batch,
                                        batch_format="pyarrow"), ["doc_id"])


def q_check_lineitem_csv(sf_dir: str) -> pa.Table:
    """``q_check_lineitem`` through the CSV source path: lineitem
    round-trips parquet → CSV → ``read_docs`` → the same constraint schema
    (CSV re-infers integral doubles as int64 — the validator's $number
    accepts both, so verdicts are identical; the used columns are
    null-free, so no CSV null-encoding ambiguity).  Same oracle SQL."""
    from ..sources import read_docs

    files = _table_as(sf_dir, "lineitem", LINEITEM_COLS, "csv")
    ds = read_docs(files, columns=LINEITEM_COLS)
    validated = validate_dataset(ds, LINEITEM_CHECK_SCHEMA)
    bad = validated.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])).select(["l_orderkey", "l_linenumber"]),
        batch_format="pyarrow",
    )
    out = _sorted_table(bad, ["l_orderkey", "l_linenumber"])
    if out.num_rows:  # CSV re-inference can int64-ify l_linenumber: align
        out = pa.table({"l_orderkey": out["l_orderkey"].cast(pa.int64()),
                        "l_linenumber": out["l_linenumber"].cast(pa.int32())})
    return out


EVENTS_PROPS_SCHEMA = {
    "event_id": "any",
    "props": {"k": {"$number": {"min": 0, "max": 50}}},  # closed struct on parsed JSON
}


def q_props_json_check(sf_dir: str) -> pa.Table:
    """Same constraint as ``q_check_events_props`` but through the engine's
    JSON-encoded-column path: props parsed per row and validated against a
    yaschva closed-struct schema by the oracle (the dynamic-payload route,
    SURVEY.md §7.4).  Verdicts must equal the vectorized regex variant —
    and the SQL oracle."""
    ds = _read(sf_dir, "events", ["event_id", "props"])
    tv = TableValidator(EVENTS_PROPS_SCHEMA, json_columns=("props",))

    def check(t: pa.Table) -> pa.Table:
        mask = tv.fail_mask(t)
        return pa.table({"event_id": t["event_id"].filter(pa.array(mask))})

    return _sorted_table(ds.map_batches(check, batch_format="pyarrow"), ["event_id"])


def _sketch_stats_table(merged: dict) -> pa.Table:
    names = sorted(merged)
    return pa.table({
        "col_name": pa.array(names, pa.string()),
        "n_rows": pa.array([merged[c].count for c in names], pa.int64()),
        "n_nulls": pa.array([merged[c].nulls for c in names], pa.int64()),
        "min_v": pa.array([round(merged[c].min, 6) for c in names], pa.float64()),
        "max_v": pa.array([round(merged[c].max, 6) for c in names], pa.float64()),
        "sum_cents": pa.array([int(round(merged[c].sum * 100)) for c in names], pa.int64()),
    })


def q_stats_lineitem(sf_dir: str) -> pa.Table:
    """Per-column streaming sketch stats (the ColumnSketcher stage) — the
    exact components (count, nulls, min, max, integer-cent sum) are
    oracle-checkable; HLL/quantiles are approximate and reported elsewhere."""
    from ..engine.sketches import ColumnSketcher, merge_partials

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", cols)
    partials = ds.map_batches(
        ColumnSketcher, batch_format="pyarrow",
        fn_constructor_args=(cols,), concurrency=2,
    ).take_all()
    return _sketch_stats_table(merge_partials(partials))


# --------------------------------------------------------------------------
# Incremental column stats: persisted mergeable sketch state
# --------------------------------------------------------------------------
#
# The stats sibling of the incremental dedup index: sketches are
# MERGEABLE, so the corpus's column stats live as a persisted state the
# nightly batch UPDATES without rescanning anything — base + each
# committed update is one tiny (column, state) parquet; reads merge them
# deterministically (merge_partials sorts, so arrival order never
# changes the bytes).  Updates commit through the manifest (atomic
# tmp+rename, idempotent tags, crashed update invisible) — the same
# contract the dedup index pins with tests.

def _stats_state_manifest(state_dir: str) -> dict:
    import json

    with open(os.path.join(state_dir, "manifest.json")) as f:
        return json.load(f)


def _write_stats_manifest(state_dir: str, manifest: dict) -> None:
    import json

    tmp = os.path.join(state_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(state_dir, "manifest.json"))


def _sketch_partials(ds, cols: list[str]) -> pa.Table:
    import pickle

    from ..engine.sketches import ColumnSketcher, merge_partials

    partials = ds.map_batches(
        ColumnSketcher, batch_format="pyarrow",
        fn_constructor_args=(cols,), concurrency=2,
    ).take_all()
    merged = merge_partials(partials)
    names = sorted(merged)
    return pa.table({
        "column": pa.array(names, pa.string()),
        "state": pa.array([pickle.dumps(merged[c]) for c in names],
                          pa.binary()),
    })


def stats_state_build(ds, cols: list[str], state_dir: str) -> dict:
    """One scan → persisted merged sketch state under ``state_dir/base``
    (atomic tmp-build + rename)."""
    import shutil

    import pyarrow.parquet as pq

    tmp_dir = state_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(_sketch_partials(ds, cols),
                   os.path.join(tmp_dir, "base.parquet"))
    manifest = {"cols": sorted(cols), "updates": []}
    _write_stats_manifest(tmp_dir, manifest)
    shutil.rmtree(state_dir, ignore_errors=True)
    os.rename(tmp_dir, state_dir)
    return manifest


def stats_state_update(ds, state_dir: str, tag: str) -> dict:
    """Fold a new batch into the persisted stats WITHOUT rescanning the
    corpus: one scan of the batch → one (column, state) file committed
    under the tag.  Idempotent: a committed tag is a no-op."""
    import pyarrow.parquet as pq

    manifest = _stats_state_manifest(state_dir)
    if tag in manifest["updates"]:
        return manifest
    part = _sketch_partials(ds, manifest["cols"])
    path = os.path.join(state_dir, f"update-{tag}.parquet")
    tmp = path + ".tmp"
    pq.write_table(part, tmp)
    os.replace(tmp, path)
    manifest["updates"].append(tag)
    _write_stats_manifest(state_dir, manifest)
    return manifest


def stats_state_read(state_dir: str) -> pa.Table:
    """Merged stats over base + every COMMITTED update (uncommitted files
    are invisible); deterministic regardless of update order."""
    import pyarrow.parquet as pq

    from ..engine.sketches import merge_partials

    manifest = _stats_state_manifest(state_dir)
    files = [os.path.join(state_dir, "base.parquet")]
    files += [os.path.join(state_dir, f"update-{tag}.parquet")
              for tag in manifest["updates"]]
    rows = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    return _sketch_stats_table(merge_partials(rows))


def q_stats_incremental_lineitem(sf_dir: str) -> pa.Table:
    """Incremental == batch, driver-checked: build the persisted stats
    state over EVEN l_orderkey rows, fold the odd rows in as an update,
    read the merged state — the result must equal full-table SQL stats
    exactly (same components as stats_lineitem, never rescanning the
    'corpus' half)."""
    import hashlib

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", ["l_orderkey"] + cols)

    def half(parity: int):
        def go(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["l_orderkey"], 1), parity)
            return t.filter(keep).select(cols)
        return go

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    state_dir = os.path.join("/tmp", "yaschva_stats_state", tag)
    if not os.path.exists(os.path.join(state_dir, "manifest.json")):
        stats_state_build(ds.map_batches(half(0), batch_format="pyarrow"),
                          cols, state_dir)
    stats_state_update(ds.map_batches(half(1), batch_format="pyarrow"),
                       state_dir, "odd")
    return stats_state_read(state_dir)


def metadata_stats(paths: list[str] | str, columns: list[str]) -> pa.Table:
    """Exact per-column (n_rows, n_nulls, min, max) computed from parquet
    FOOTERS only — zero data pages read.  The at-100 TB fast path for
    table-level stats checks: a footer is a few KB regardless of file
    size, so the job reads megabytes where a scan reads the table.

    NUMERIC columns only: parquet string min/max stats may be truncated,
    so exactness can't be promised for them (use ColumnSketcher).  A file
    whose footer lacks statistics for a requested column falls back to
    scanning THAT column of THAT file (logged — no silent caps, no wrong
    answers)."""
    import glob as _glob

    import ray
    import ray.data

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) or [paths]

    def footer_stats(batch: pa.Table) -> pa.Table:
        import logging

        import pyarrow.parquet as pq

        out = {"col_name": [], "n_rows": [], "n_nulls": [],
               "min_v": [], "max_v": []}
        for path in batch["path"].to_pylist():
            md = pq.read_metadata(path)
            idx = {md.schema.column(i).path: i
                   for i in range(md.num_columns)}
            for col in columns:
                rows = nulls = 0
                mn = mx = None
                ok = True
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    st = rgm.column(idx[col]).statistics
                    # has_min_max is false for an ALL-NULL chunk too —
                    # only a chunk with real values and no min/max means
                    # stats are missing
                    if st is None or st.null_count is None or (
                            not st.has_min_max and st.num_values):
                        ok = False
                        break
                    rows += rgm.num_rows
                    nulls += st.null_count
                    if st.num_values:  # all-null row group has no min/max
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                if not ok:
                    logging.getLogger("yaschva_ray.ops").warning(
                        "metadata_stats: %s lacks footer stats for %r — "
                        "scanning that column of that file", path, col)
                    t = pq.read_table(path, columns=[col])
                    arr = t[col]
                    rows = len(arr)
                    nulls = arr.null_count
                    mm = pc.min_max(arr)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                out["col_name"].append(col)
                out["n_rows"].append(rows)
                out["n_nulls"].append(nulls)
                out["min_v"].append(None if mn is None else float(mn))
                out["max_v"].append(None if mx is None else float(mx))
        # pre-combine per task: one output row per column, not per file
        part = pa.table({
            "col_name": pa.array(out["col_name"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.float64()),
            "max_v": pa.array(out["max_v"], pa.float64()),
        })
        return part.group_by("col_name").aggregate(
            [("n_rows", "sum"), ("n_nulls", "sum"),
             ("min_v", "min"), ("max_v", "max")])

    parts = gather_tables(
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(footer_stats, batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    merged = (pa.concat_tables(parts).group_by("col_name").aggregate(
        [("n_rows_sum", "sum"), ("n_nulls_sum", "sum"),
         ("min_v_min", "min"), ("max_v_max", "max")])
        .sort_by([("col_name", "ascending")]))
    return pa.table({
        "col_name": merged["col_name"],
        "n_rows": merged["n_rows_sum_sum"],
        "n_nulls": merged["n_nulls_sum_sum"],
        "min_v": merged["min_v_min_min"],
        "max_v": merged["max_v_max_max"],
    })


def _row_hash(t: pa.Table, cols: list[str], seed: int) -> np.ndarray:
    """Vectorized row hash over ``cols`` (sorted for stability): per-column
    seeded polars hash mixed with a distinct odd multiplier per column
    position.  The numpy fallback derives the seed by post-mixing (weaker
    independence, documented in table_diff)."""
    try:
        import polars as pl
    except ImportError:
        pl = None
    acc = np.full(t.num_rows, np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        for i, c in enumerate(sorted(cols)):
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pl is not None:
                h = pl.from_arrow(arr).hash(seed=seed) \
                    .to_numpy().astype(np.uint64)
            else:  # pragma: no cover - polars is present in this image
                from ..engine.sketches import _hash64
                h = _hash64(arr)
                h = (h ^ np.uint64(seed * 0xBF58476D1CE4E5B9)) \
                    * np.uint64(0x94D049BB133111EB)
            acc ^= h * np.uint64(2 * i + 3)
    return acc


def table_diff(a_ds, b_ds, key: str, *, num_buckets: int | None = None) -> pa.Table:
    """Row-level diff of two SAME-SCHEMA snapshots by unique key:
    ``added`` (key only in B), ``removed`` (only in A), ``modified`` (in
    both, any non-key column differs).  The migration/backfill
    reconciliation check: only (key, two independent 64-bit row hashes)
    cross the cluster — 24 bytes/row — never the row payloads.

    Change detection is 128-bit-hash-based: a missed modification needs
    simultaneous collisions in two independently seeded hash functions
    (~2^-128; with the numpy fallback hasher the two seeds are derived,
    weaker but still astronomically safe).  Duplicate keys within one
    side raise — the diff would be ambiguous."""
    from ..engine.exchange import keyed_exchange

    def prep(side: int):
        def go(t: pa.Table) -> pa.Table:
            cols = [c for c in t.column_names if c != key]
            return pa.table({
                "k": t[key],
                "h1": pa.array(_row_hash(t, cols, 0).astype(np.int64)),
                "h2": pa.array(_row_hash(t, cols, 1).astype(np.int64)),
                "side": pa.array(np.full(t.num_rows, side, np.int8)),
            })
        return go

    union = a_ds.map_batches(prep(0), batch_format="pyarrow").union(
        b_ds.map_batches(prep(1), batch_format="pyarrow"))

    def diff_bucket(t: pa.Table) -> pa.Table:
        a = t.filter(pc.equal(t["side"], 0)).select(["k", "h1", "h2"])
        b = (t.filter(pc.equal(t["side"], 1)).select(["k", "h1", "h2"])
             .rename_columns(["k", "g1", "g2"]))
        for side_t, name in ((a, "A"), (b, "B")):
            if side_t.num_rows != len(pc.unique(side_t["k"].combine_chunks())):
                raise ValueError(
                    f"table_diff: duplicate keys in side {name} — the "
                    "diff is ambiguous; dedup or pick a unique key")
        j = a.join(b, keys=["k"], join_type="full outer")
        in_a = pc.is_valid(j["h1"])
        in_b = pc.is_valid(j["g1"])
        added = j.filter(pc.and_(pc.invert(in_a), in_b))
        removed = j.filter(pc.and_(in_a, pc.invert(in_b)))
        both = j.filter(pc.and_(in_a, in_b))
        changed = both.filter(pc.or_(
            pc.not_equal(both["h1"], both["g1"]),
            pc.not_equal(both["h2"], both["g2"])))
        return pa.table({
            "key": pa.concat_tables([
                added.select(["k"]), removed.select(["k"]),
                changed.select(["k"])])["k"],
            "change": pa.array(["added"] * added.num_rows
                               + ["removed"] * removed.num_rows
                               + ["modified"] * changed.num_rows,
                               pa.string()),
        })

    tables = keyed_exchange(union, "k", diff_bucket, num_buckets=num_buckets)
    tables = [t for t in tables if t.num_rows]
    if not tables:
        # typed empty: the key column keeps the input's type (string keys
        # must not come back int64 on an all-equal diff)
        s = a_ds.schema()
        ktype = dict(zip(s.names, s.types))[key]
        return pa.table({"key": pa.array([], ktype),
                         "change": pa.array([], pa.string())})
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("key", "ascending"), ("change", "ascending")]))


def q_snapshot_diff_documents(sf_dir: str) -> pa.Table:
    """documents vs a deterministically EVOLVED snapshot, diffed by
    doc_id: every 101st doc deleted, every 103rd (surviving) doc's text
    replaced, copies of the first 10 docs appended at +50M — all three
    predicates SQL-expressible, so the row-level diff is hash-exact."""
    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "lang", "source", "n_chars"])
    out = table_diff(docs, _evolved_documents(docs), "doc_id")
    return pa.table({"doc_id": out["key"], "change": out["change"]})


def _footer_profile(paths: list[str] | str) -> pa.Table:
    """Per-column (type, n_rows, n_nulls) from parquet FOOTERS only —
    distributed one task group per file batch, tiny pre-combined
    partials.  Null counts fall back to -1 (unknown) when a footer lacks
    statistics — schema comparison never needs data pages."""
    import glob as _glob

    import ray.data

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) or [paths]

    def profile(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = {"col_name": [], "col_type": [], "n_rows": [], "n_nulls": []}
        for path in batch["path"].to_pylist():
            schema = pq.read_schema(path)
            md = pq.read_metadata(path)
            nulls = {}
            for i in range(md.num_columns):
                name = md.schema.column(i).path
                tot = 0
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or st.null_count is None:
                        tot = -1
                        break
                    tot += st.null_count
                nulls[name] = tot
            for f in schema:
                out["col_name"].append(f.name)
                out["col_type"].append(str(f.type))
                out["n_rows"].append(md.num_rows)
                out["n_nulls"].append(nulls.get(f.name, -1))
        return pa.table({
            "col_name": pa.array(out["col_name"], pa.string()),
            "col_type": pa.array(out["col_type"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        })

    parts = [t for t in gather_tables(
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(profile, batch_format="pyarrow")) if t.num_rows]
    merged = pa.concat_tables(parts)
    g = merged.group_by(["col_name", "col_type"]).aggregate(
        [("n_rows", "sum"), ("n_nulls", "min"), ("n_nulls", "sum")])
    # any file with unknown nulls (-1) poisons the sum → report -1
    nn = pc.if_else(pc.less(g["n_nulls_min"], 0),
                    pa.scalar(-1, pa.int64()), g["n_nulls_sum"])
    return pa.table({"col_name": g["col_name"], "col_type": g["col_type"],
                     "n_rows": g["n_rows_sum"], "n_nulls": nn})


def schema_drift(paths_a, paths_b) -> pa.Table:
    """Schema drift between two table snapshots from FOOTERS only: per
    column → added / removed / type_changed / same, with each side's type
    and null fraction (rounded; -1.0 when a footer lacks stats).  The
    check a 100 TB nightly ingest runs FIRST — it catches a producer that
    silently dropped or retyped a column without reading any data pages.
    A column appearing with two types within ONE side reports the
    lexically first (and that side's pipeline is already broken — the
    validators will say so loudly)."""
    pa_, pb = _footer_profile(paths_a), _footer_profile(paths_b)

    def as_map(t: pa.Table) -> dict:
        out: dict = {}
        for r in sorted(t.to_pylist(), key=lambda r: (r["col_name"],
                                                      r["col_type"])):
            out.setdefault(r["col_name"], r)  # lexically FIRST type wins
        return out

    ma, mb = as_map(pa_), as_map(pb)

    def frac(r) -> float:
        if r is None or r["n_nulls"] < 0 or not r["n_rows"]:
            return -1.0
        return round(r["n_nulls"] / r["n_rows"], 6)

    rows = []
    for col in sorted(set(ma) | set(mb)):
        ra, rb = ma.get(col), mb.get(col)
        if ra is None:
            status = "added"
        elif rb is None:
            status = "removed"
        elif ra["col_type"] != rb["col_type"]:
            status = "type_changed"
        else:
            status = "same"
        rows.append({
            "col_name": col, "status": status,
            "type_a": ra["col_type"] if ra else None,
            "type_b": rb["col_type"] if rb else None,
            "null_frac_a": frac(ra), "null_frac_b": frac(rb),
        })
    return pa.table({
        "col_name": pa.array([r["col_name"] for r in rows], pa.string()),
        "status": pa.array([r["status"] for r in rows], pa.string()),
        "type_a": pa.array([r["type_a"] for r in rows], pa.string()),
        "type_b": pa.array([r["type_b"] for r in rows], pa.string()),
        "null_frac_a": pa.array([r["null_frac_a"] for r in rows],
                                pa.float64()),
        "null_frac_b": pa.array([r["null_frac_b"] for r in rows],
                                pa.float64()),
    })


def q_schema_drift_documents(sf_dir: str) -> pa.Table:
    """Schema drift of documents vs a deterministically EVOLVED snapshot
    (doc_id retyped int64→int32, lang dropped, flag added) written once
    under /tmp — the drift report depends only on the two schemas, so the
    oracle is a literal VALUES table.  Null fractions stay in the API
    (tested) but out of the query: they vary with sf."""
    import hashlib

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    snap_dir = os.path.join("/tmp", "yaschva_schema_drift", tag)
    snap = os.path.join(snap_dir, "documents_v2.parquet")
    if not os.path.exists(snap):
        os.makedirs(snap_dir, exist_ok=True)
        t = pq.read_table(src, columns=["doc_id", "text", "source",
                                        "n_chars"])
        t = t.set_column(0, pa.field("doc_id", pa.int32()),
                         t["doc_id"].cast(pa.int32()))
        t = t.append_column("flag", pa.nulls(t.num_rows, pa.int64()))
        tmp = snap + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, snap)
    drift = schema_drift(src, snap)
    return drift.select(["col_name", "status", "type_a", "type_b"]) \
        .sort_by([("col_name", "ascending")])


def q_stats_lineitem_metadata(sf_dir: str) -> pa.Table:
    """`q_stats_lineitem`'s exact count/null/min/max components computed
    WITHOUT scanning — parquet footer statistics only (the prune-at-read
    pattern applied to the stats check itself).  Numeric columns, so the
    footer min/max are exact; values rounded like the scan variant."""
    t = metadata_stats(os.path.join(sf_dir, "lineitem.parquet"),
                       ["l_discount", "l_extendedprice", "l_quantity"])
    return pa.table({
        "col_name": t["col_name"],
        "n_rows": t["n_rows"],
        "n_nulls": t["n_nulls"],
        # +0.0 folds the footer's sign-normalized -0.0 lower bound back to
        # 0.0 (IEEE: -0.0 + 0.0 = +0.0), matching SQL MIN over the data
        "min_v": pc.add(pc.round(t["min_v"], ndigits=6), 0.0),
        "max_v": pc.add(pc.round(t["max_v"], ndigits=6), 0.0),
    })


def q_drift_events_value(sf_dir: str) -> pa.Table:
    """Distribution drift of events.value between event types: per-type
    LogHistogram sketches (actor-pool partials + merge), PSI + KS vs the
    'view' baseline.  Deterministic (histogram sketches are
    partition-independent) but approximate → rows-only check."""
    import ray

    from ..engine.sketches import LogHistogram, ks_statistic, psi

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pickle as _p

        types = []
        states = []
        for et in pc.unique(t["event_type"]).to_pylist():
            h = LogHistogram()
            vals = t.filter(pc.equal(t["event_type"], et))["value"]
            h.add(vals.to_numpy(zero_copy_only=False).astype("float64"))
            types.append(et)
            states.append(_p.dumps(h))
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "state": pa.array(states, pa.binary())})

    import pickle

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[str, "LogHistogram"] = {}
    for r in sorted(rows, key=lambda x: (x["event_type"], x["state"])):
        h = pickle.loads(r["state"])
        if r["event_type"] in merged:
            merged[r["event_type"]].merge(h)
        else:
            merged[r["event_type"]] = h
    base = merged.get("view")
    out_t, out_psi, out_ks = [], [], []
    for et in sorted(merged):
        if et == "view" or base is None:
            continue
        out_t.append(et)
        out_psi.append(round(psi(base, merged[et]), 6))
        out_ks.append(round(ks_statistic(base, merged[et]), 6))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "psi": pa.array(out_psi, pa.float64()),
                     "ks": pa.array(out_ks, pa.float64())})


_DRIFT_BIN_WIDTH = 16.0
_DRIFT_BIN_MAX = 63


def q_drift_events_fixed_bins(sf_dir: str) -> pa.Table:
    """EXACT distribution-drift check (the north rule's fourth check
    family, driver-checkable): per-event-type fixed-width value
    histograms (bin = clamp(floor(value/16), 0, 63), non-finite values
    excluded — pure IEEE ops, so Ray and DuckDB bin identically), then
    integer total-variation and
    Kolmogorov–Smirnov NUMERATORS vs the 'view' baseline:

        tvd_num = Σ_bins |cnt_t·N_base − cnt_base·N_t|     (TVD = x/2NM)
        ks_num  = max_bins |cum_t·N_base − cum_base·N_t|   (KS  = x/NM)

    All-integer outputs make the hash-exact compare immune to libm/
    rounding differences (the sketch-based ``drift_events_value`` keeps
    PSI/KS as floats and stays rows-only).  Scale shape: per-batch
    partial histograms are bounded cardinality (n_types × 64 rows per
    block, same plan as null_counts); only those partials leave the
    scan, the numerator math is a driver-side 5×64 matrix.  int64 is
    safe while cnt·N < 2^63 (~3e9 rows per type); beyond that scale the
    counts by gcd or switch the numerators to object ints."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["event_type"]))
        et = t["event_type"].filter(mask).combine_chunks()
        v = t["value"].filter(mask).to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)  # NaN/inf excluded on BOTH sides (isfinite)
        if not fin.all():
            et, v = et.filter(pa.array(fin)), v[fin]
        # clamp BOTH ends: a negative value must not wrap to bin -1 (it
        # would decode as the previous type's top bin in the composite key)
        bins = np.minimum(np.maximum(np.floor(v / _DRIFT_BIN_WIDTH), 0),
                          _DRIFT_BIN_MAX).astype(np.int64)
        codes_arr = pc.dictionary_encode(et)
        codes = np.asarray(codes_arr.indices, dtype=np.int64)
        uk, cnt = np.unique(codes * (_DRIFT_BIN_MAX + 1) + bins,
                            return_counts=True)
        types = codes_arr.dictionary.take(
            pa.array(uk // (_DRIFT_BIN_MAX + 1)))
        return pa.table({"event_type": types.cast(pa.string()),
                         "bin": pa.array(uk % (_DRIFT_BIN_MAX + 1)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    if not blocks:
        return pa.schema([("event_type", pa.string()),
                          ("n_rows", pa.int64()), ("n_base", pa.int64()),
                          ("tvd_num", pa.int64()),
                          ("ks_num", pa.int64())]).empty_table()
    g = (pa.concat_tables(blocks).group_by(["event_type", "bin"])
         .aggregate([("cnt", "sum")]))
    types = sorted(set(g["event_type"].to_pylist()))
    bins_present = sorted(set(g["bin"].to_pylist()))
    bin_pos = {b: i for i, b in enumerate(bins_present)}
    hist = {t: np.zeros(len(bins_present), dtype=np.int64) for t in types}
    for t_, b_, c_ in zip(g["event_type"].to_pylist(),
                          g["bin"].to_pylist(),
                          g["cnt_sum"].to_pylist()):
        hist[t_][bin_pos[b_]] = c_
    base = hist.get("view")
    out_t, out_n, out_nb, out_tvd, out_ks = [], [], [], [], []
    if base is not None:
        nb = int(base.sum())
        bcum = np.cumsum(base)
        for t_ in types:
            if t_ == "view":
                continue
            h = hist[t_]
            n = int(h.sum())
            out_t.append(t_)
            out_n.append(n)
            out_nb.append(nb)
            out_tvd.append(int(np.abs(h * nb - base * n).sum()))
            out_ks.append(int(np.abs(np.cumsum(h) * nb - bcum * n).max()))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "n_rows": pa.array(out_n, pa.int64()),
                     "n_base": pa.array(out_nb, pa.int64()),
                     "tvd_num": pa.array(out_tvd, pa.int64()),
                     "ks_num": pa.array(out_ks, pa.int64())})


def q_generate_fixture(sf_dir: str) -> pa.Table:
    """Generator round-trip as a distributed op: seeded generate() per row
    over ray.data.range, validated back by the vectorized engine — every
    row must pass (the reference's property test, generate.spec.ts:173-183,
    run distributed).  Returns per-block pass counts."""
    import ray.data

    from ..generate import generate
    from ..oracle import validate
    from ..schema import load_json

    schema = {
        "name": "string",
        "age": {"$number": {"min": 0, "max": 120}},
        "tags": {"$array": {"$enum": ["a", "b", "c"]}, "maxLength": 5},
        "email": ["?", {"$string": {"regex": "^[a-z]+@[a-z]+\\.com$"}}],
    }

    def gen_and_check(batch) -> pa.Table:
        import random

        ids = batch["id"]
        n_pass = 0
        for i in ids:
            doc = generate(schema, rng=random.Random(int(i)))
            if validate(schema, doc)["result"] == "pass":
                n_pass += 1
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "n_pass": pa.array([n_pass], pa.int64())})

    n_rows = 2000
    out = ray.data.range(n_rows).map_batches(gen_and_check, batch_format="numpy")
    t = _sorted_table(out, ["n"])
    total = int(pc.sum(t["n"]).as_py())
    passed = int(pc.sum(t["n_pass"]).as_py())
    return pa.table({"n_docs": pa.array([total], pa.int64()),
                     "n_pass": pa.array([passed], pa.int64())})


def q_events_hourly_window(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate over event time: per (hour, event_type)
    counts and integer-cent value sums.  In-batch partial aggregation;
    the final combine is driver-side like the sliding window's — window
    cardinality is bounded (hours × event types), so a Ray Data groupby
    here would be an all-to-all exchange of a few KB."""
    import ray

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        tt = pa.table({
            "window_start": hour, "event_type": t["event_type"],
            "value_cents": cents,
            "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = tt.group_by(["window_start", "event_type"]).aggregate(
            [("value_cents", "sum"), ("n_events", "sum")])
        return pa.table({
            "window_start": g["window_start"], "event_type": g["event_type"],
            "value_cents": g["value_cents_sum"], "n_events": g["n_events_sum"],
        })

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    g = (pa.concat_tables(blocks).group_by(["window_start", "event_type"])
         .aggregate([("value_cents", "sum"), ("n_events", "sum")]))
    out = pa.table({
        "window_start": g["window_start"].cast(pa.timestamp("us")),
        "event_type": g["event_type"],
        "sum_value_cents": g["value_cents_sum"].cast(pa.int64()),
        "n_events": g["n_events_sum"].cast(pa.int64()),
    })
    return _sorted_table(out, ["window_start", "event_type"])


def q_top_violated_paths(sf_dir: str) -> pa.Table:
    """Reporting top-k: most-violated constraint paths over lineitem.

    Fully distributed: each batch validates, explodes its own failing rows,
    and emits per-path PARTIAL counts — only (path, n) partials ever leave a
    task (path cardinality is bounded by the schema, so the final combine is
    a tiny driver-side merge, the same partial-aggregate shape the flagship
    report uses)."""
    ds = _read(sf_dir, "lineitem", LINEITEM_COLS)
    tv = TableValidator(LINEITEM_CHECK_SCHEMA)
    exploder = ViolationExploder(LINEITEM_CHECK_SCHEMA,
                                 id_columns=("l_orderkey", "l_linenumber"))

    def partial_counts(batch: pa.Table) -> pa.Table:
        failing = batch.filter(pa.array(tv.fail_mask(batch)))
        if not failing.num_rows:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vio = exploder(failing)
        g = vio.group_by("path").aggregate([([], "count_all")])
        return pa.table({"path": g["path"], "n": g["count_all"].cast(pa.int64())})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    import ray

    blocks = [b for b in gather_tables(partials) if b.num_rows]
    if not blocks:
        return pa.table({"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    merged = pa.concat_tables(blocks).group_by("path").aggregate([("n", "sum")])
    counts = pa.table({"path": merged["path"], "n": merged["n_sum"].cast(pa.int64())})
    return counts.sort_by([("n", "descending"), ("path", "ascending")])


# --- type emitter (reference type.ts validationToType) ----------------------

# Named schema cases mirroring the reference's type.spec.ts coverage; the
# driver string-compares the emitted TS type and Arrow schema encodings
# against the literal-VALUES oracle (exact parity surface, type.ts:33-92).
TYPE_EMITTER_CASES: list[tuple[str, object]] = [
    ("enum", {"$enum": ["lorem", "ipsum", "santa", "domine"]}),
    ("map_union", {"$map": ["number", "string"]}),
    ("object_simple", {"string": "string", "number": "number", "any": "any",
                       "optional": "?", "boolean": "boolean",
                       "integer": "integer"}),
    ("object_arrays", {"stringOrNumber": {"$array": ["string", "number"]},
                       "objArray": {"$array": {"hello": "string",
                                               "world": "number"}}}),
    ("all_optional", {"prop1": ["?", "string"], "prop2": ["?", "number"]}),
    ("constraints_dropped", {"s": {"$string": {"minLength": 4, "maxLength": 16}},
                             "n": {"$number": {"min": 3, "max": 9}}}),
    ("meta_named", {"name": "object with name",
                    "$type": {"str": "string", "num": "number"}}),
    ("union_flat", ["integer", "boolean", "string", "?"]),
]


def _arrow_schema_repr(schema) -> str:
    """One-line deterministic encoding of the emitted Arrow schema:
    ``name:type:req|opt`` joined by '; ' ('' for non-object roots, which
    have no table form)."""
    from ..schema import is_obj
    from ..typegen import schema_to_arrow

    body = schema
    if isinstance(schema, dict):
        body = {k: v for k, v in schema.items() if k != "$types"}
    if not is_obj(body):
        return ""
    s = schema_to_arrow(schema)
    return "; ".join(f"{f.name}:{f.type}:{'opt' if f.nullable else 'req'}"
                     for f in s)


def q_type_emitter(sf_dir: str) -> pa.Table:
    """Type-emitter parity: TS type string (validationToType, reference
    type.ts:33-92) and Arrow schema encoding per named case.  Input-free
    (``sf_dir`` ignored); the oracle is the literal expected strings."""
    from ..typegen import validation_to_type

    names = [n for n, _ in TYPE_EMITTER_CASES]
    ts = [validation_to_type(s) for _, s in TYPE_EMITTER_CASES]
    arrow = [_arrow_schema_repr(s) for _, s in TYPE_EMITTER_CASES]
    return pa.table({"name": pa.array(names, pa.string()),
                     "ts_type": pa.array(ts, pa.string()),
                     "arrow_schema": pa.array(arrow, pa.string())}
                    ).sort_by([("name", "ascending")])


# --- as-of join (custom operator: latest order at or before each event) ----


def q_events_asof_orders(sf_dir: str) -> pa.Table:
    """As-of join: for each event, the date of the user's latest order at
    or before the event time (hash-partitioned both sides, per-bucket
    vectorized merge_asof — see engine.joins.asof_join).  Output keeps only
    tie-independent columns (several orders can share a (custkey, date))."""
    from ..engine.joins import asof_join

    joined = asof_join(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate")
    if not joined.num_rows or "event_id" not in joined.column_names:
        # an empty LEFT dataset joins to a column-less empty table
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "asof_date": pa.array([], pa.date32())})
    out = pa.table({"event_id": joined["event_id"],
                    "asof_date": joined["o_orderdate"]})
    return out.combine_chunks().sort_by([("event_id", "ascending")])


def q_events_asof_forward(sf_dir: str) -> pa.Table:
    """FORWARD as-of join: for each event, the date of the user's
    EARLIEST order at or after the event time — ``direction="forward"``
    through the same banded-capable engine operator (the backward
    variant's symmetric twin; DuckDB mirrors it by flipping the ASOF
    inequality).  Output keeps only tie-independent columns."""
    from ..engine.joins import asof_join

    joined = asof_join(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", direction="forward")
    if not joined.num_rows or "event_id" not in joined.column_names:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "next_date": pa.array([], pa.date32())})
    out = pa.table({"event_id": joined["event_id"],
                    "next_date": joined["o_orderdate"]})
    return out.combine_chunks().sort_by([("event_id", "ascending")])


def q_events_asof_hotkey(sf_dir: str) -> pa.Table:
    """SKEWED as-of join exercising ``asof_join(skew_split=True)`` end
    to end: every user_id divisible by 3 collapses to ONE key (-1) on
    both sides (~1/3 of all rows — a single pathological key), and
    ``max_key_rows=200`` forces the time-band + boundary-carry path at
    every test scale.  Output keeps only tie-independent columns (the
    matched order DATE — equal-date ties all yield the same value), so
    the banded result is hash-exact against DuckDB's ASOF mirror with
    the same key collapse."""
    from ..engine.joins import asof_join

    def hotify(t: pa.Table, col: str) -> pa.Table:
        k = pc.cast(t[col], pa.int64())
        hot = pc.equal(pc.subtract(k, pc.multiply(
            pc.divide(k, pa.scalar(3, pa.int64())),
            pa.scalar(3, pa.int64()))), pa.scalar(0, pa.int64()))
        i = t.schema.get_field_index(col)
        return t.set_column(i, pa.field(col, pa.int64()),
                            pc.if_else(pc.fill_null(hot, False),
                                       pa.scalar(-1, pa.int64()), k))

    joined = asof_join(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(lambda t: hotify(t, "user_id"),
                     batch_format="pyarrow"),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(lambda t: hotify(t, "o_custkey"),
                     batch_format="pyarrow"),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        skew_split=True, max_key_rows=200)
    if not joined.num_rows or "event_id" not in joined.column_names:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "asof_date": pa.array([], pa.date32())})
    out = pa.table({"event_id": joined["event_id"],
                    "asof_date": joined["o_orderdate"]})
    return out.combine_chunks().sort_by([("event_id", "ascending")])


# --- sliding-window aggregate (1 h windows, 30 min hop) ---------------------


def q_events_sliding_window(sf_dir: str) -> pa.Table:
    """Hopping/sliding event-time windows: 1-hour windows every 30 minutes
    — each event lands in exactly two windows.  In-batch emission into both
    windows + partial aggregation; the final combine is driver-side
    (window cardinality is bounded: 2/hour × event-time span)."""
    import ray

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    HOP_US = 1_800 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        # floor_divide, not pc.divide: the window must FLOOR toward -inf
        # (the oracle's floor(epoch/1800)) — integer division truncates
        # toward zero, which shifts pre-epoch events one window late
        uvalid = np.asarray(pc.is_valid(us).to_numpy(zero_copy_only=False))
        usn = np.asarray(pc.fill_null(us, 0).to_numpy(zero_copy_only=False)
                         ).astype(np.int64)
        base = pa.array(np.floor_divide(usn, HOP_US) * HOP_US,
                        mask=~uvalid)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        parts = []
        for k in (0, 1):  # the two windows covering each event
            w = pc.subtract(base, pa.scalar(k * HOP_US, pa.int64()))
            parts.append(pa.table({
                "window_start": w, "event_type": t["event_type"],
                "value_cents": cents,
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }))
        both = pa.concat_tables(parts)
        g = both.group_by(["window_start", "event_type"]).aggregate(
            [("value_cents", "sum"), ("n", "sum")])
        return pa.table({"window_start": g["window_start"],
                         "event_type": g["event_type"],
                         "value_cents": g["value_cents_sum"],
                         "n": g["n_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    g = (pa.concat_tables(blocks).group_by(["window_start", "event_type"])
         .aggregate([("value_cents", "sum"), ("n", "sum")]))
    return pa.table({
        "window_start": g["window_start"].cast(pa.timestamp("us")),
        "event_type": g["event_type"],
        "sum_value_cents": g["value_cents_sum"].cast(pa.int64()),
        "n_events": g["n_sum"].cast(pa.int64()),
    }).combine_chunks().sort_by([("window_start", "ascending"),
                                 ("event_type", "ascending")])


def q_events_sessions(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Session windows: per user, events separated by more than the gap
    start a new session → (user_id, session_start, session_end, n_events).
    One raw-task hash exchange on user_id + per-bucket vectorized gap
    detection (engine.windows.session_windows); oracle = lag() gap flags +
    running-sum session ids in SQL."""
    from ..engine.windows import session_windows

    out = session_windows(
        _read(sf_dir, "events", ["user_id", "ts"]),
        key="user_id", ts="ts", gap_s=gap_minutes * 60)
    if not out.num_rows:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "session_start": pa.array([], pa.timestamp("us")),
                         "session_end": pa.array([], pa.timestamp("us")),
                         "n_events": pa.array([], pa.int64())})
    return out


def q_top_events_per_type(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k: the k highest-value events per event_type (ties by
    event_id).  Per-batch vectorized partial top-k (sort + within-group
    rank via boundary cumsum) → tiny driver concat → same kernel once
    more — only k × n_types × n_blocks rows ever leave a task."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("event_type", "ascending"),
                                              ("value", "descending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        et = np.asarray(s["event_type"].to_numpy(zero_copy_only=False))
        n = len(et)
        if n == 0:
            return s
        newg = np.ones(n, dtype=bool)
        newg[1:] = et[1:] != et[:-1]
        gstart = np.maximum.accumulate(np.where(newg, np.arange(n), 0))
        rank = np.arange(n) - gstart
        return s.filter(pa.array(rank < k))

    blocks = [b for b in gather_tables(
        ds.map_batches(topk, batch_format="pyarrow")) if b.num_rows]
    if not blocks:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "event_id": pa.array([], pa.int64())})
    final = topk(pa.concat_tables(blocks).combine_chunks())
    return (final.select(["event_type", "event_id"])
            .sort_by([("event_type", "ascending"), ("event_id", "ascending")]))


def q_events_value_quantiles(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles (p50/p90/p99) of the cent-quantized
    event value via a counting exchange: per-block (cents, count) partials
    — bounded by the value range, not the row count — group-summed and
    cumulated on the driver.  Quantile semantics pinned explicitly (the
    element at zero-based rank ``floor(q*(n-1))`` of the sorted multiset)
    so the SQL oracle mirrors it with row_number, engine-independently."""
    import ray

    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table({"cents": cents}).group_by("cents").aggregate(
            [([], "count_all")])
        return pa.table({"cents": g["cents"],
                         "n": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    if not blocks:  # empty input: one row of nulls, like the SQL
        return pa.table({"p50_cents": pa.array([None], pa.int64()),
                         "p90_cents": pa.array([None], pa.int64()),
                         "p99_cents": pa.array([None], pa.int64())})
    g = (pa.concat_tables(blocks).group_by("cents").aggregate([("n", "sum")])
         .sort_by([("cents", "ascending")]))
    # null cents form their own group, sorted LAST (SQL row_number orders
    # NULLS LAST while count(*) still counts them): a quantile index that
    # lands in the null tail yields NULL, exactly like the mirror
    cents, cval = _int_col(g["cents"])
    counts = np.asarray(g["n_sum"].to_numpy(zero_copy_only=False)
                        ).astype(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = {}
    for name, q in (("p50_cents", 0.5), ("p90_cents", 0.9),
                    ("p99_cents", 0.99)):
        idx = int(np.floor(q * (n - 1)))
        pos = int(np.searchsorted(cum, idx + 1))
        val = int(cents[pos]) if cval[pos] else None
        out[name] = pa.array([val], pa.int64())
    return pa.table(out)


def q_events_user_segments(sf_dir: str) -> pa.Table:
    """Broadcast equi-join enrichment (the plain lookup-join family):
    events joined to customer market segments on user_id = c_custkey.
    The small side ships ONCE via ``ray.put`` (key array + segment
    dictionary); each batch does a vectorized ``index_in`` lookup + take,
    misses drop (inner join), and an in-batch partial aggregate keeps the
    exchange at (segment, counts) size — no shuffle of the big side."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    blocks = gather_tables(cust)
    if not blocks:
        blocks = [pa.table({"c_custkey": pa.array([], pa.int64()),
                            "c_mktsegment": pa.array([], pa.string())})]
    small = pa.concat_tables(blocks).combine_chunks()
    # equi-join: NULL keys match nothing — drop them from the lookup so
    # index_in can't pair a null event user with a null custkey
    small = small.filter(pc.is_valid(small["c_custkey"]))
    lookup_ref = ray.put((small["c_custkey"], small["c_mktsegment"]))

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keys, segs = ray.get(lookup_ref)
        idx = pc.index_in(t["user_id"], value_set=keys)
        hit = pc.is_valid(idx)
        seg = segs.take(idx.filter(hit))
        cents = pc.cast(pc.round(pc.multiply(t["value"].filter(hit), 100.0)),
                        pa.int64())
        tt = pa.table({"c_mktsegment": seg, "value_cents": cents,
                       "n": pa.array(np.ones(len(seg), dtype=np.int64))})
        g = tt.group_by("c_mktsegment").aggregate(
            [("value_cents", "sum"), ("n", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "value_cents": g["value_cents_sum"],
                         "n": g["n_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    if not blocks:
        return pa.table({"c_mktsegment": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "sum_value_cents": pa.array([], pa.int64())})
    g = (pa.concat_tables(blocks).group_by("c_mktsegment")
         .aggregate([("value_cents", "sum"), ("n", "sum")]))
    return pa.table({
        "c_mktsegment": g["c_mktsegment"],
        "n_events": g["n_sum"].cast(pa.int64()),
        "sum_value_cents": g["value_cents_sum"].cast(pa.int64()),
    }).sort_by([("c_mktsegment", "ascending")])


def q_partitioned_write_langs(sf_dir: str) -> pa.Table:
    """Partitioned parquet SINK (the brief's resumable-output layout — one
    directory per key; a failed run skips finished partitions): documents
    written hive-partitioned by lang (nulls → 'unknown') through the
    engine sink, counts then read back from the WRITTEN partition
    metadata only (no data pages).  Oracle = GROUP BY over the source —
    the written layout must conserve every row."""
    import glob as _glob
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:10]
    out = os.path.join("/tmp", "yaschva_sources", f"bylang_{tag}")
    if not os.path.isdir(out):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "lang"])
        filled = ds.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "lang": pc.fill_null(t["lang"], "unknown")}),
            batch_format="pyarrow")
        filled.write_parquet(tmp, partition_cols=["lang"])
        os.makedirs(os.path.dirname(out), exist_ok=True)
        os.rename(tmp, out)
    langs, counts = [], []
    for d in sorted(_glob.glob(os.path.join(out, "lang=*"))):
        langs.append(os.path.basename(d).split("=", 1)[1])
        counts.append(sum(pq.ParquetFile(f).metadata.num_rows
                          for f in _glob.glob(os.path.join(d, "*.parquet"))))
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "n_docs": pa.array(counts, pa.int64())})


def q_validate_quarantine(sf_dir: str) -> pa.Table:
    """ONE-PASS split sink (the validation engine's production shape):
    each block is validated once and routed — pass rows to ``clean/``,
    violating rows to ``quarantine/`` — by the SAME map task, so the
    corpus is scanned exactly once and no second filter pass exists.
    Part files are named by a content hash of the block's key columns
    (tmp+rename), so a retried task overwrites its own output
    idempotently; the whole sink is tmp+renamed for resumability.  The
    returned summary is computed from the WRITTEN files (key column
    only), proving the on-disk split — the oracle mirrors the validity
    predicate, so a row lost or double-routed fails the hash."""
    import glob as _glob
    import hashlib
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join("/tmp", "yaschva_quarantine", tag)
    if not os.path.isdir(base):
        tmp = base + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        for side in ("clean", "quarantine"):
            os.makedirs(os.path.join(tmp, side), exist_ok=True)
        ds = _read(sf_dir, "lineitem", LINEITEM_COLS)
        validated = validate_dataset(ds, LINEITEM_CHECK_SCHEMA)

        def route(t: pa.Table) -> pa.Table:
            counts = []
            for side, st in (("clean", t.filter(t["valid"])),
                             ("quarantine",
                              t.filter(pc.invert(t["valid"])))):
                st = st.drop_columns(["valid"])
                if st.num_rows:
                    keys = np.ascontiguousarray(
                        st["l_orderkey"].to_numpy(zero_copy_only=False))
                    lns = np.ascontiguousarray(
                        st["l_linenumber"].to_numpy(zero_copy_only=False))
                    name = hashlib.md5(
                        keys.tobytes() + lns.tobytes()).hexdigest()[:16]
                    path = os.path.join(tmp, side, f"part-{name}.parquet")
                    pq.write_table(st, path + ".inprogress")
                    os.rename(path + ".inprogress", path)
                counts.append(st.num_rows)
            return pa.table({"side": pa.array(["clean", "quarantine"]),
                             "n": pa.array(counts, pa.int64())})

        # consume the stream (the partials are progress metrics; truth is
        # re-derived from disk below)
        gather_tables(validated.map_batches(route, batch_format="pyarrow"))
        os.rename(tmp, base)

    sides, n_rows, sums = [], [], []
    for side in ("clean", "quarantine"):
        files = _glob.glob(os.path.join(base, side, "*.parquet"))
        if not files:
            continue
        rb = ray.data.read_parquet(files, columns=["l_orderkey"])

        def partial(t: pa.Table) -> pa.Table:
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([pc.sum(t["l_orderkey"]).as_py() or 0],
                              pa.int64())})

        blocks = [b for b in gather_tables(
            rb.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
        m = pa.concat_tables(blocks)
        sides.append(side)
        n_rows.append(pc.sum(m["n"]).as_py())
        sums.append(pc.sum(m["s"]).as_py())
    return pa.table({"side": pa.array(sides, pa.string()),
                     "n_rows": pa.array(n_rows, pa.int64()),
                     "sum_orderkey": pa.array(sums, pa.int64())})


_CUSTOM_CHECK_ERR = "Text is longer than 100 characters"


def _text_le_100(v):
    return None if isinstance(v, str) and len(v) <= 100 else _CUSTOM_CHECK_ERR


def _text_le_100_vec(arr):
    ok = pc.less_equal(pc.utf8_length(arr), 100)
    return ~np.asarray(ok.fill_null(False).to_numpy(zero_copy_only=False))


def q_custom_check_documents(sf_dir: str) -> pa.Table:
    """USER-EXTENSION surface driven end-to-end (``register_check``,
    SURVEY §2.5): a registered ``@text_le_100`` predicate — with a
    user-supplied VECTORIZED kernel, so the table fast path serves the
    custom check without per-row fallback — validates documents.text
    through the standard TableValidator.  Registries are per-process
    Python state, so the stage registers inside the worker (idempotent),
    the same place a model/regex would be loaded.  Violating doc_ids,
    hash-exact SQL oracle (nulls fail the leaf like every yaschva leaf
    check)."""
    from ..vectorized import TableValidator

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    schema = {"doc_id": "any", "text": "@text_le_100"}

    def check(t: pa.Table) -> pa.Table:
        from ..checks_registry import register_check

        register_check("@text_le_100", _text_le_100,
                       vectorized=_text_le_100_vec)
        tv = TableValidator(schema)
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(tv.fail_mask(t)))})

    return _sorted_table(ds.map_batches(check, batch_format="pyarrow"),
                         ["doc_id"])


def q_sample_quality(sf_dir: str) -> pa.Table:
    """Deterministic sampling for drift baselines (SURVEY §2.5): a fixed
    5% systematic sample (doc_id % 20 == 7 — reproducible across runs and
    engines, unlike random_sample) with quality features computed only on
    the sampled rows.  The sample predicate pushes into the scan, so at
    100 TB the baseline costs 5% of a read."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        sel = t.filter(pa.array(ids % 20 == 7))  # pc has no modulo kernel
        n_chars = pc.coalesce(pc.utf8_length(sel["text"]).cast(pa.int64()),
                              pa.scalar(0, pa.int64()))
        n_tokens = pc.coalesce(
            pc.count_substring_regex(sel["text"], r"\S+").cast(pa.int64()),
            pa.scalar(0, pa.int64()))
        return pa.table({"doc_id": sel["doc_id"],
                         "n_chars": n_chars, "n_tokens": n_tokens})

    return _sorted_table(ds.map_batches(feats, batch_format="pyarrow"),
                         ["doc_id"])


def q_stratified_sample(sf_dir: str, m: int = 10) -> pa.Table:
    """EXACT stratified 1-in-``m`` sample: every language keeps exactly
    ``ceil(n_lang / m)`` documents — the ``k`` smallest by
    ``(md5(doc_id), doc_id)``, a deterministic rank both engines can
    compute.  Distributed as an exact per-stratum ORDER STATISTIC, never
    a per-stratum shuffle: pass 1 histograms the 16-bit md5 prefix per
    (lang, bucket) — driver state bounded by strata × 65536, independent
    of row count — the cumsum locates each stratum's threshold bucket;
    pass 2 emits every row strictly below its stratum's threshold and
    gathers only the rows INSIDE the threshold bucket (expected
    n_lang/65536 rows) for the final exact tie-break.  A hot stratum
    costs a histogram row, not a reduce task.  md5-of-id is the
    SQL-conformance rank (DuckDB ``md5``); swap a vectorized xxhash for
    production where cross-engine rank equality isn't needed."""
    import hashlib as _h

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def hash_bucket(t: pa.Table):
        hh = [_h.md5(str(i).encode()).hexdigest()
              for i in t["doc_id"].to_pylist()]
        bk = np.array([int(h[:4], 16) for h in hh], np.int32)
        return hh, bk

    def partial(t: pa.Table) -> pa.Table:
        _, bk = hash_bucket(t)
        g = pa.table({"lang": t["lang"], "bucket": pa.array(bk)}) \
            .group_by(["lang", "bucket"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "bucket": g["bucket"],
                         "n": g["count_all"].cast(pa.int64())})

    parts = [b for b in gather_tables(ds.map_batches(
        partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64())})
    if not parts:
        return empty
    hist = (pa.concat_tables(parts).group_by(["lang", "bucket"])
            .aggregate([("n", "sum")])
            .sort_by([("lang", "ascending"), ("bucket", "ascending")]))
    from collections import defaultdict

    per: dict = defaultdict(list)
    for lg, bkt, n in zip(hist["lang"].to_pylist(),
                          hist["bucket"].to_pylist(),
                          hist["n_sum"].to_pylist()):
        per[lg].append((bkt, n))
    # threshold bucket + how many of its rows the stratum still needs
    # (integer quota (n+m-1)//m: float ceil(frac*n) diverges between
    # Python doubles and DuckDB decimals — keep the rank arithmetic
    # integral on both sides)
    thresholds: dict = {}
    for lg, rows in per.items():
        k = (sum(n for _, n in rows) + m - 1) // m
        cum = 0
        for bkt, n in rows:
            if cum + n >= k:
                thresholds[lg] = (bkt, k - cum)
                break
            cum += n

    def select(t: pa.Table) -> pa.Table:
        hh, bk = hash_bucket(t)
        enc = t["lang"].combine_chunks() if isinstance(
            t["lang"], pa.ChunkedArray) else t["lang"]
        enc = pc.dictionary_encode(enc)
        dv = enc.dictionary.to_pylist()
        # null langs are their own stratum: index past the dictionary
        idx = np.asarray(pc.fill_null(enc.indices, len(dv))
                         .to_numpy(zero_copy_only=False)).astype(np.int64)
        tb = np.array([thresholds.get(d, (-1, 0))[0] for d in dv]
                      + [thresholds.get(None, (-1, 0))[0]], np.int64)
        row_tb = tb[idx]
        below = bk < row_tb
        at = bk == row_tb
        keep = below | at
        out = t.filter(pa.array(keep))
        return pa.table({
            "lang": out["lang"], "doc_id": out["doc_id"],
            "h": pa.array([h for h, k_ in zip(hh, keep) if k_],
                          pa.string()),
            "at_threshold": pa.array(at[keep], pa.bool_()),
        })

    got = pa.concat_tables([b for b in gather_tables(ds.map_batches(
        select, batch_format="pyarrow")) if b.num_rows] or [pa.table({
            "lang": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "h": pa.array([], pa.string()),
            "at_threshold": pa.array([], pa.bool_())})]).combine_chunks()
    sure = got.filter(pc.invert(got["at_threshold"]))
    cand = got.filter(got["at_threshold"]).sort_by(
        [("h", "ascending"), ("doc_id", "ascending")])
    chosen = []
    seen: dict = defaultdict(int)
    for lg, did in zip(cand["lang"].to_pylist(),
                       cand["doc_id"].to_pylist()):
        if seen[lg] < thresholds.get(lg, (-1, 0))[1]:
            seen[lg] += 1
            chosen.append((lg, did))
    out = pa.concat_tables([
        sure.select(["lang", "doc_id"]),
        pa.table({"lang": pa.array([c[0] for c in chosen], pa.string()),
                  "doc_id": pa.array([c[1] for c in chosen], pa.int64())}),
    ])
    return out.sort_by([("lang", "ascending"), ("doc_id", "ascending")])


def q_jaccard_pairs(sf_dir: str, k_docs: int = 40) -> pa.Table:
    """Exact n-gram-Jaccard CONFORMANCE surface: all pairs among the first
    ``k_docs`` documents scored by the same ``jaccard_ngrams`` kernel the
    minhash verify stage uses, mirrored by a DuckDB shingle/intersection
    query — the similarity definition itself is hash-checked cross-engine.
    Input-free-small by design (like type_emitter): the SCALE path for
    Jaccard verification is the distributed minhash-verify co-group; this
    pins its kernel's semantics."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    head = _sorted_table(ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], k_docs)),
        batch_format="pyarrow"), ["doc_id"])
    ids = head["doc_id"].to_pylist()
    texts = head["text"].to_pylist()

    def shingles(s: str):
        toks = s.split()
        if len(toks) >= 3:
            return set(zip(toks, toks[1:], toks[2:]))
        return {tuple(toks)}

    sets = [shingles(t or "") for t in texts]
    out_a, out_b, out_i, out_u = [], [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out_a.append(ids[i])
            out_b.append(ids[j])
            out_i.append(len(sets[i] & sets[j]))
            out_u.append(len(sets[i] | sets[j]))
    # integer set sizes, not the ratio: a ratio like 1/128 rounds
    # differently under Python's half-to-even and DuckDB's half-away —
    # the exact rational (n_inter, n_union) is dialect-free; kernel
    # equivalence to jaccard_ngrams is asserted in tests
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "n_inter": pa.array(out_i, pa.int64()),
                     "n_union": pa.array(out_u, pa.int64())})


def q_approx_distinct_users(sf_dir: str) -> pa.Table:
    """Approximate distinct count (HyperLogLog p=14) of events.user_id:
    per-block register partials (16 KB each, regardless of cardinality)
    merged on the driver — the cardinality sketch the 100 TB stats path
    uses where exact counting would shuffle every key.  Deterministic but
    approximate → rows-only driver check; accuracy (±2% at this scale) is
    asserted against the exact count in tests."""
    import ray

    from ..engine.sketches import HyperLogLog, _hash64

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["user_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = HyperLogLog()
        h.add_hashes(_hash64(col))
        return pa.table({"registers": pa.array([h.registers.tobytes()],
                                               pa.binary())})

    merged = HyperLogLog()
    for b in gather_tables(ds.map_batches(partial, batch_format="pyarrow")):
        if b.num_rows:
            for blob in b["registers"].to_pylist():
                other = HyperLogLog(
                    np.frombuffer(blob, dtype=merged.registers.dtype).copy())
                merged.merge(other)
    return pa.table({"approx_distinct": pa.array([int(round(merged.estimate()))],
                                                 pa.int64())})


def q_approx_quantiles_events(sf_dir: str) -> pa.Table:
    """APPROXIMATE streaming quantiles of events.value via LogHistogram
    sketches (partition-independent merge ⇒ byte-identical under any
    block split — the resume-stable property the flagship sketches rely
    on).  One small pickled state per block, driver merge.  Rows-only
    driver check; accuracy vs the exact counting-exchange quantiles
    (q_events_value_quantiles) is asserted in tests."""
    import pickle

    import ray

    from ..engine.sketches import LogHistogram

    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        h = LogHistogram()
        h.add(t["value"].to_numpy(zero_copy_only=False).astype("float64"))
        return pa.table({"state": pa.array([pickle.dumps(h)], pa.binary())})

    merged = LogHistogram()
    states = []
    for b in gather_tables(ds.map_batches(partial, batch_format="pyarrow")):
        if b.num_rows:
            states.extend(b["state"].to_pylist())
    for s in sorted(states):  # deterministic merge order
        merged.merge(pickle.loads(s))
    return pa.table({
        "p50_approx": pa.array([round(merged.quantile(0.5), 6)], pa.float64()),
        "p90_approx": pa.array([round(merged.quantile(0.9), 6)], pa.float64()),
        "p99_approx": pa.array([round(merged.quantile(0.99), 6)], pa.float64()),
    })


def q_events_price_range_join(sf_dir: str, eps: float = 0.05) -> pa.Table:
    """Range (interval) join: event values within ±eps of a part's scaled
    retail price (p_retailprice/100).  Band-partitioned exchange with
    boundary replication on the right side; bucket-local vectorized
    searchsorted windows (engine.joins.range_join)."""
    from ..engine.joins import range_join

    right = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        lambda t: pa.table({
            "p_partkey": t["p_partkey"],
            "price_scaled": pc.divide(t["p_retailprice"], 100.0),
        }), batch_format="pyarrow")
    joined = range_join(
        _read(sf_dir, "events", ["event_id", "value"]), right,
        left_val="value", right_val="price_scaled", eps=eps)
    if not joined.num_rows:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "p_partkey": pa.array([], pa.int64())})
    return (joined.select(["event_id", "p_partkey"]).combine_chunks()
            .sort_by([("event_id", "ascending"), ("p_partkey", "ascending")]))


def q_orders_customer_join(sf_dir: str) -> pa.Table:
    """Big-big shuffled equi-join (neither side broadcastable at target
    scale): orders ⋈ customer on custkey through ``engine.joins.hash_join``
    — both sides hash-partition once, each bucket joins co-located slices
    with Arrow's C++ hash join.  Row-level projection (not an aggregate)
    so the driver hash checks the join itself; sorted for determinism."""
    from ..engine.joins import hash_join

    left = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    right = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out = hash_join(left, right, left_key="o_custkey", right_key="c_custkey")
    if not out.num_rows:
        return pa.schema([("o_orderkey", pa.int64()),
                          ("o_custkey", pa.int64()),
                          ("c_name", pa.string()),
                          ("c_nationkey", pa.int32())]).empty_table()
    return out.select(["o_orderkey", "o_custkey", "c_name", "c_nationkey"]) \
        .sort_by([("o_orderkey", "ascending")])


def equidepth_cutpoints(sorted_values: np.ndarray,
                        n_ranges: int) -> np.ndarray:
    """B-1 equi-depth order statistics from a SORTED sample: cut i is the
    value at 0-based index ((i+1)*len)//B — the formula every SQL mirror
    reproduces as rn = ((g+1)*c)//B + 1.  Too-small samples yield no
    cutpoints (one range)."""
    if len(sorted_values) < n_ranges:
        return np.empty(0, sorted_values.dtype if len(sorted_values)
                        else np.float64)
    return np.array([sorted_values[((i + 1) * len(sorted_values))
                                   // n_ranges]
                     for i in range(n_ranges - 1)])


def _footer_rowgroup_stats(paths: list[str] | str, columns: list[str]):
    """(lo, hi, n) per row group for each requested column, from parquet
    footers — each footer read and decoded ONCE for all columns.
    Returns ``(stats, integral)``: ``stats[col]`` a list of triples,
    ``integral[col]`` whether the physical type is INT32/INT64.  Raises
    ValueError on missing columns, non-numeric PLAIN-int/float storage
    (timestamps/dates/decimals store as ints but their stats surface as
    datetime/Decimal objects — logical types other than NONE/INT are
    rejected so callers fall back to the sampling scan), or any row
    group lacking min/max statistics."""
    import glob as _glob

    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) or [paths]
    stats = {c: [] for c in columns}
    integral = {c: True for c in columns}
    for path in paths:
        md = pq.read_metadata(path)
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        for column in columns:
            if column not in idx:
                raise ValueError(f"footer stats: {path} has no column "
                                 f"{column!r}")
            col_schema = md.schema.column(idx[column])
            ptype = col_schema.physical_type
            ltype = str(col_schema.logical_type.type).upper()
            if ptype not in ("INT32", "INT64", "FLOAT", "DOUBLE") or \
                    ltype not in ("NONE", "INT"):
                raise ValueError(
                    f"footer stats: {column!r} is {ptype}/{ltype}, not a "
                    f"plain numeric — its footer min/max is not a float "
                    f"(and string stats may be truncated)")
            integral[column] &= ptype in ("INT32", "INT64")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[column]).statistics
                if st is None or (not st.has_min_max and st.num_values):
                    raise ValueError(
                        f"footer stats: {path} row group {rg} lacks "
                        f"min/max statistics for {column!r}")
                if not st.num_values:  # all-null group carries no order
                    continue
                stats[column].append(
                    (float(st.min), float(st.max), st.num_values))
    return stats, integral


def footer_equidepth_cutpoints_multi(paths: list[str] | str,
                                     columns: list[str], n_ranges: int,
                                     points_per_group: int = 32
                                     ) -> dict[str, np.ndarray]:
    """Approximate equi-depth cutpoints per column from parquet FOOTERS
    only — zero data pages read, each footer decoded once for ALL
    columns.  Each row group's (min, max, value count) models its values
    as uniform on [min, max]; ``points_per_group`` synthetic points per
    group, each weighted count/points, form a weighted empirical CDF
    whose ``(i+1)/n_ranges`` quantiles become the cuts.

    ONLY for cutpoints whose placement never changes a result (range
    exchange balance — sorted export, co-partitioned merge joins,
    z-order bin edges): where a query's oracle re-derives the cutpoints
    in SQL, keep the sampled order statistics.  A scan samples the table
    to estimate a handful of numbers a few-KB footer already carries; at
    100 TB that is the difference between megabytes and the whole table.
    PLAIN NUMERIC columns only (timestamp/date/decimal logical types are
    rejected).  Raises ValueError when stats are missing — callers fall
    back to the sampling scan (logged, never silent).  INT32/INT64 keys
    get int64 cuts (exact manifest round-trip); others float64 — either
    way placement only ever shifts range balance."""
    stats, integral = _footer_rowgroup_stats(paths, columns)
    out = {}
    for column in columns:
        pts, wts = [], []
        for lo, hi, n in stats[column]:
            k = min(points_per_group, n)
            pts.append(lo + (np.arange(k) + 0.5) / k * (hi - lo))
            wts.append(np.full(k, n / k))
        if not pts:
            out[column] = np.empty(0, np.float64)
            continue
        v = np.concatenate(pts)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, cw = v[order], np.cumsum(w[order])
        total = cw[-1]
        targets = np.array([(i + 1) * total / n_ranges
                            for i in range(n_ranges - 1)])
        cuts = v[np.minimum(np.searchsorted(cw, targets), len(v) - 1)]
        if integral[column]:  # int keys get int cuts (exact dtype
            cuts = np.floor(cuts).astype(np.int64)  # manifest round-trip)
        out[column] = np.unique(cuts)
    return out


def footer_equidepth_cutpoints(paths: list[str] | str, column: str,
                               n_ranges: int,
                               points_per_group: int = 32) -> np.ndarray:
    """Single-column form of `footer_equidepth_cutpoints_multi` (see
    there for the model, the result-neutrality contract and the failure
    modes)."""
    return footer_equidepth_cutpoints_multi(
        paths, [column], n_ranges, points_per_group)[column]


def _cutpoints_footer_or_sample(sf_dir: str, table: str, key: str, ds,
                                n_ranges: int, sample_mod: int) -> np.ndarray:
    """Range-exchange cutpoints for ``ds`` (read from
    ``{sf_dir}/{table}.parquet``): footer statistics when available (zero
    data read), else the deterministic id-keyed sampling SCAN as a logged
    fallback.  Only for cutpoints that never change a result."""
    import logging

    try:
        return footer_equidepth_cutpoints(
            os.path.join(sf_dir, f"{table}.parquet"), key, n_ranges)
    except (ValueError, OSError) as exc:
        logging.getLogger("yaschva_ray.ops").warning(
            "footer cutpoints unavailable for %s.%s (%s) — falling back "
            "to a sampling scan", table, key, exc)

    def key_sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[key].to_numpy(zero_copy_only=False))
        return pa.table({"k": t[key].filter(
            pa.array(ids % sample_mod == 0))})

    sv = np.sort(np.concatenate([
        np.asarray(t["k"].to_numpy(zero_copy_only=False))
        for t in gather_tables(ds.map_batches(key_sample,
                                              batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0, np.int64)]))
    return equidepth_cutpoints(sv, n_ranges)


def _warn_hot_ranges(manifest: pa.Table, what: str) -> None:
    """Hot-range observability (the _warn_hot_key rule for ORDERED
    exchanges): a range sorts+writes in ONE task, so a skewed key
    distribution — or estimated cutpoints, e.g. footer-derived ones on
    value-skewed data — concentrating rows must be visible, not an
    OOM.  Shared by every export whose manifest carries n_rows."""
    nr = manifest["n_rows"].to_numpy(zero_copy_only=False)
    if len(nr) > 1 and nr.sum():
        mx, mean = int(nr.max()), nr.sum() / len(nr)
        if mx > 4 * mean and mx > 100_000:
            import logging

            logging.getLogger("yaschva_ray.ops").warning(
                "%s: hottest range holds %d rows (%.1fx the %.0f-row "
                "mean) — re-derive cutpoints from a sample or raise "
                "n_ranges", what, mx, mx / mean, mean)


def _next_export_gen(out_dir: str) -> int:
    """Write generation for a (re-)export into ``out_dir``: a COMMITTED
    manifest's ``export_gen`` + 1, else 0.  Generation-tagged part names
    keep a re-export's writes DISJOINT from the committed snapshot's
    files — the ``compact_sorted`` protocol (new parts first, manifest
    commits atomically, unreferenced files removed LAST), so a crash
    mid-export leaves the previous snapshot fully intact behind its
    manifest instead of a chimera of old and new parts."""
    import json

    try:
        with open(os.path.join(out_dir, "manifest.json")) as f:
            return int(json.load(f).get("export_gen", 0)) + 1
    except (OSError, ValueError, TypeError):
        # no/unreadable manifest: nothing committed to protect (a
        # pre-protocol manifest without export_gen maps to gen 1, whose
        # g-tagged names are disjoint from the legacy bare names)
        return 0


# every writer that can rewrite a sorted-export part; shared so no
# caller's cleanup can drift to a subset and orphan another's files
_SORTED_PART_PREFIXES = ("part-", "compact-", "upsert-", "retain-")


def _cleanup_unreferenced_parts(out_dir: str, referenced: set[str],
                                prefixes: tuple[str, ...]) -> None:
    """AFTER a manifest commit: remove part files the new manifest does
    not reference (previous generations; a wider earlier run's orphans)
    so a directory reader never sees rows the manifest does not account
    for.  Only files matching the export's own prefixes are touched.
    Paths compare by ``realpath`` — the manifest's spelling of out_dir
    and the caller's (./x vs x vs absolute) must never disagree into
    deleting a live part."""
    import glob as _glob

    real_refs = {os.path.realpath(p) for p in referenced}
    for prefix in prefixes:
        for p in _glob.glob(os.path.join(out_dir, prefix + "*.parquet")):
            if os.path.realpath(p) not in real_refs:
                try:
                    os.remove(p)
                except OSError:
                    pass


def sorted_export(ds, key: str, out_dir: str, cutpoints, *,
                  within: list[str] | None = None) -> pa.Table:
    """Globally SORTED parquet export: a range exchange on broadcast
    ``cutpoints`` (every row of range i precedes every row of range i+1),
    then each range sorts locally (nulls first) and writes its own part
    via tmp+atomic-rename — reading part files in range order IS the
    table in key order, with no merge step.  Returns (and persists, as
    ``manifest.json``) one lineage row per range: rows, nulls,
    nulls-ignored min/max, path.  Ranges write in parallel; a duplicate
    cutpoint value yields an empty range (manifest row kept — file
    boundaries stay honest).  Re-exporting into a live directory is
    crash-safe: parts carry a write generation, so the committed
    snapshot's files are never overwritten in place (see
    ``_next_export_gen``).

    ``within`` adds COMPOSITE clustering: secondary sort keys applied
    inside each range, so reading parts in range order is the table in
    full ``(key, *within)`` order — the fact-table layout — at zero
    extra exchange cost (range assignment stays a pure function of the
    primary key alone; the manifest, lookups and merge joins are
    unchanged).  Recorded in the manifest as ``within`` so readers can
    rely on the composite order."""
    import json

    import pyarrow.parquet as pq

    from ..engine.exchange import range_exchange

    os.makedirs(out_dir, exist_ok=True)
    gen = _next_export_gen(out_dir)
    sort_keys = [(key, "ascending")] + \
        [(w, "ascending") for w in (within or [])]

    def write_range(bucket_id: int, t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=sort_keys, null_placement="at_start")
        t = t.take(idx)
        path = os.path.join(out_dir,
                            f"part-g{gen}-{bucket_id:05d}.parquet")
        # pid-suffixed temp (the _sink_bucket rule): a zombie first
        # attempt and its retry must never interleave writes in one file
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        arr = t[key]
        ktype = t.schema.field(key).type
        mm = (pc.min_max(arr) if t.num_rows - arr.null_count
              else {"min": pa.scalar(None, ktype),
                    "max": pa.scalar(None, ktype)})
        # min/max carry the KEY's type — a string or timestamp sort key
        # must not be forced through float64
        return pa.table({
            "range_id": pa.array([bucket_id], pa.int64()),
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "n_nulls": pa.array([arr.null_count], pa.int64()),
            "min_v": pa.array([mm["min"].as_py()], ktype),
            "max_v": pa.array([mm["max"].as_py()], ktype),
            "path": pa.array([path], pa.string()),
        })

    s = ds.schema()
    empty_t = (getattr(s, "base_schema", None) or pa.schema(
        [(n, t) for n, t in zip(s.names, s.types)])).empty_table()
    manifest = pa.concat_tables(
        range_exchange(ds, key, cutpoints, write_range,
                       empty_result=empty_t)).combine_chunks()
    _warn_hot_ranges(manifest, "sorted_export")
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    cuts = [str(c) for c in np.asarray(cutpoints).tolist()]
    with open(tmp, "w") as f:
        # default=str: timestamp/date min-max values JSON-serialize as
        # their ISO strings (lookups on such keys pass string probes)
        json.dump({"key": key, "cutpoints": cuts, "export_gen": gen,
                   "within": list(within or []),
                   "ranges": manifest.to_pylist()}, f, default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    # only now: drop every other writer's unreferenced parts —
    # directory readers must never double-count rows
    _cleanup_unreferenced_parts(
        out_dir, set(manifest["path"].to_pylist()),
        _SORTED_PART_PREFIXES)
    return manifest


def _sorted_lookup_plan(manifest_rows: list[dict], values) -> list[str]:
    """Parts whose [min_v, max_v] can contain a probe — the manifest as a
    coarse index (all-null parts never match a value probe)."""
    return [r["path"] for r in manifest_rows
            if r["min_v"] is not None and any(
                r["min_v"] <= v <= r["max_v"] for v in values)]


def lookup_sorted(out_dir: str, values) -> pa.Table:
    """Point lookups over a ``sorted_export`` directory WITHOUT a scan:
    the lineage manifest prunes to the parts whose key range can contain
    a probe (at 100 TB: one part per probe instead of the table), then an
    exact vectorized ``is_in`` filters inside just those parts.  The key
    column name comes from the manifest the export wrote."""
    import json

    from ..engine.blocks import gather_tables

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    key, rows = m["key"], m["ranges"]
    files = _sorted_lookup_plan(rows, values)
    if not files:
        return pa.table({})
    import ray.data

    vset = pa.array(list(values))

    def filt(t: pa.Table) -> pa.Table:
        if key not in t.column_names:
            return t
        return t.filter(pc.is_in(t[key], value_set=vset))

    parts = [t for t in gather_tables(
        ray.data.read_parquet(files).map_batches(filt,
                                                 batch_format="pyarrow"))
        if t.num_rows]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts).combine_chunks()


def compact_sorted(out_dir: str, target_bytes: int = 128 << 20) -> pa.Table:
    """Order-PRESERVING compaction of a ``sorted_export`` directory: merge
    ADJACENT small ranges toward ``target_bytes`` — concatenating parts in
    range order is already globally sorted, so no re-sort, no exchange.
    The sorted-table small-files maintenance op: lookups and merge joins
    keep working through the rewritten manifest (whose cutpoints coarsen
    to the kept group boundaries — joining against an export partitioned
    with the ORIGINAL cutpoints now raises, as it must).  New parts write
    first, the manifest commits atomically, THEN old parts are removed —
    a crash in between leaves only unreferenced files."""
    import json

    import ray

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    # generation counter keeps every compaction's filenames DISJOINT from
    # the current parts: without it a re-compaction would write into the
    # very compact-{gid} files it is still reading, then delete them
    gen = int(m.get("compaction_gen", 0)) + 1
    ranges = sorted(m["ranges"], key=lambda r: r["range_id"])
    groups, cur, size = [], [], 0
    for r in ranges:
        fsize = os.path.getsize(r["path"]) if os.path.exists(r["path"]) else 0
        if cur and size + fsize > target_bytes:
            groups.append(cur)
            cur, size = [], 0
        cur.append(r)
        size += fsize
    if cur:
        groups.append(cur)

    @ray.remote
    def merge_group(gid: int, paths: list[str], out: str) -> dict:
        import pyarrow.parquet as pq

        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        t = pa.concat_tables([pq.read_table(p) for p in paths]) \
            .combine_chunks()
        tmp = out + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, out)
        return {"range_id": gid, "n_rows": t.num_rows, "path": out}

    key = m["key"]
    refs, new_ranges = [], []
    for gid, grp in enumerate(groups):
        out = os.path.join(out_dir, f"compact-g{gen}-{gid:05d}.parquet")
        refs.append(merge_group.remote(gid, [r["path"] for r in grp], out))
        mins = [r["min_v"] for r in grp if r["min_v"] is not None]
        new_ranges.append({
            "range_id": gid,
            "n_rows": sum(r["n_rows"] for r in grp),
            "n_nulls": sum(r["n_nulls"] for r in grp),
            "min_v": min(mins) if mins else None,
            "max_v": max(r["max_v"] for r in grp
                         if r["max_v"] is not None) if mins else None,
            "path": out,
        })
    written = ray.get(refs)
    for w, nr in zip(written, new_ranges):
        if w["n_rows"] != nr["n_rows"]:  # lineage recount, not trust
            raise RuntimeError(
                f"compact_sorted: group {w['range_id']} wrote "
                f"{w['n_rows']} rows, manifest expected {nr['n_rows']}")
    # cutpoints coarsen to the kept group boundaries (the cut AFTER each
    # group's last range), so range assignment stays a pure function
    old_cuts = m["cutpoints"]
    new_cuts = []
    last = -1
    for grp in groups[:-1]:
        last = grp[-1]["range_id"]
        new_cuts.append(old_cuts[last])
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        # export_gen carried through: a later re-export must keep its
        # part names disjoint from every still-live generation
        json.dump({"key": key, "cutpoints": new_cuts,
                   "compaction_gen": gen,
                   "export_gen": int(m.get("export_gen", 0)),
                   "within": m.get("within", []),
                   "ranges": new_ranges}, f,
                  default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    for r in ranges:  # old parts now unreferenced
        try:
            os.remove(r["path"])
        except OSError:
            pass
    return pa.Table.from_pylist(new_ranges)


def upsert_sorted(out_dir: str, changes: pa.Table, *,
                  op_col: str = "op") -> pa.Table:
    """MERGE a keyed changeset into a ``sorted_export`` directory — the
    lakehouse upsert/CDC-apply: ``changes`` carries the export's key
    column, the export's payload columns (for upserts) and ``op_col``
    with values ``'upsert'`` (insert-or-replace by key) / ``'delete'``.
    Only ranges whose key interval is TOUCHED by a change are read and
    rewritten (at 100 TB: a thousand-row changeset rewrites a handful of
    parts out of millions, never the table); untouched parts and their
    manifest rows are byte-identical afterward.  Each rewritten range
    re-sorts locally (rows stay inside their range — assignment is a
    pure function of the unchanged cutpoints), writes tmp+rename under a
    bumped write generation, and the manifest commits atomically BEFORE
    old parts are removed — a crash in between leaves only unreferenced
    files, exactly like ``compact_sorted``.  Changeset keys must be
    unique and non-null (raises otherwise: an ambiguous merge must never
    half-apply).  Returns the new manifest rows for the touched ranges.
    """
    import json

    import ray
    import pyarrow.parquet as pq

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    key = m["key"]
    ranges = sorted(m["ranges"], key=lambda r: r["range_id"])
    sort_keys = [(key, "ascending")] + \
        [(w, "ascending") for w in m.get("within", [])]
    # shared write-generation counter with compact_sorted: ANY rewrite
    # bumps it, so upsert-g*/compact-g* filenames never collide with a
    # live part regardless of op interleaving
    gen = int(m.get("compaction_gen", 0)) + 1

    if key not in changes.column_names or op_col not in changes.column_names:
        raise ValueError(
            f"upsert_sorted: changes must carry {key!r} and {op_col!r}")
    karr = changes[key]
    if karr.null_count:
        raise ValueError("upsert_sorted: null changeset keys")
    kv = pc.cast(changes[op_col], pa.string())
    bad = pc.sum(pc.invert(pc.is_in(
        kv, value_set=pa.array(["upsert", "delete"])))).as_py()
    if bad:
        raise ValueError(f"upsert_sorted: {bad} rows with op not in "
                         "('upsert','delete')")
    if changes.num_rows and pc.count_distinct(karr).as_py() \
            != changes.num_rows:
        raise ValueError("upsert_sorted: duplicate changeset keys — "
                         "merge order would be ambiguous")

    # range assignment mirrors engine.exchange._range_map_block exactly:
    # bucket = #(cutpoints <= key), side='right' (manifest stores the
    # cutpoints stringified; re-type them against the changeset key)
    v = np.asarray(karr.combine_chunks().to_numpy(zero_copy_only=False)
                   if isinstance(karr, pa.ChunkedArray)
                   else karr.to_numpy(zero_copy_only=False))
    cuts = np.array(m["cutpoints"])
    if len(cuts) and v.dtype != object:
        cuts = cuts.astype(v.dtype)
    b = np.searchsorted(cuts, v, side="right").astype(np.int64)
    order = np.argsort(b, kind="stable")
    ch = changes.take(pa.array(order))
    sb = b[order]
    bounds = np.searchsorted(sb, np.arange(len(cuts) + 2))
    per_range = {rid: ch.slice(bounds[rid], bounds[rid + 1] - bounds[rid])
                 for rid in range(len(cuts) + 1)
                 if bounds[rid + 1] > bounds[rid]}
    by_id = {r["range_id"]: r for r in ranges}
    missing = sorted(set(per_range) - set(by_id))
    if missing:
        raise ValueError(
            f"upsert_sorted: changes map to range ids {missing} absent "
            "from the manifest — cutpoints/manifest disagree")

    payload_cols = [c for c in changes.column_names if c != op_col]

    @ray.remote
    def apply_range(rid: int, path: str, out: str,
                    part_changes: pa.Table) -> dict:
        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        t = pq.read_table(path)
        ops_ = pc.cast(part_changes[op_col], pa.string())
        all_keys = part_changes[key]  # upserts replace, deletes remove
        keep = pc.invert(pc.is_in(t[key], value_set=all_keys))
        removed = t.num_rows - pc.sum(keep).as_py()
        kept = t.filter(keep)
        ups = part_changes.filter(pc.equal(ops_, "upsert"))
        extra = sorted(set(payload_cols) - set(t.column_names))
        if extra:
            raise ValueError(
                f"upsert_sorted: changeset columns {extra} not in the "
                f"export schema {t.column_names}")
        ups = pa.table({c: (pc.cast(ups[c], t.schema.field(c).type)
                            if c in ups.column_names else
                            pa.nulls(ups.num_rows, t.schema.field(c).type))
                        for c in t.column_names})
        new = pa.concat_tables([kept, ups]).combine_chunks()
        # re-sort with the export's FULL composite order (manifest
        # `within`) — a primary-only sort would break the clustering
        # contract inside rewritten ranges
        new = new.take(pc.sort_indices(
            new, sort_keys=sort_keys, null_placement="at_start"))
        tmp = out + ".tmp"
        pq.write_table(new, tmp)
        os.replace(tmp, out)
        arr = new[key]
        ktype = new.schema.field(key).type
        mm = (pc.min_max(arr) if new.num_rows - arr.null_count
              else {"min": pa.scalar(None, ktype),
                    "max": pa.scalar(None, ktype)})
        return {"range_id": rid, "n_rows": new.num_rows,
                "n_nulls": arr.null_count, "min_v": mm["min"].as_py(),
                "max_v": mm["max"].as_py(), "path": out,
                "rows_removed": removed, "rows_upserted": ups.num_rows}

    refs = {}
    for rid, part_ch in per_range.items():
        out = os.path.join(out_dir, f"upsert-g{gen}-{rid:05d}.parquet")
        refs[rid] = apply_range.remote(rid, by_id[rid]["path"], out, part_ch)
    done = {rid: ray.get(r) for rid, r in refs.items()}

    new_ranges = []
    for r in ranges:
        if r["range_id"] in done:
            d = done[r["range_id"]]
            new_ranges.append({k_: d[k_] for k_ in (
                "range_id", "n_rows", "n_nulls", "min_v", "max_v", "path")})
        else:
            new_ranges.append(r)  # untouched: manifest row byte-identical
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        # export_gen carried through: a later re-export must keep its
        # part names disjoint from every still-live generation
        json.dump({"key": key, "cutpoints": m["cutpoints"],
                   "compaction_gen": gen,
                   "export_gen": int(m.get("export_gen", 0)),
                   "within": m.get("within", []),
                   "ranges": new_ranges}, f,
                  default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    # old touched parts now unreferenced — UNLESS another range still
    # points at the same file (retention_delete's dropped ranges share
    # ONE empty part; rewriting one of them must not orphan the rest)
    still = {os.path.realpath(r["path"]) for r in new_ranges}
    for rid in done:
        old = by_id[rid]["path"]
        if os.path.realpath(old) not in still:
            try:
                os.remove(old)
            except OSError:
                pass
    return pa.Table.from_pylist(
        [done[rid] for rid in sorted(done)]) if done else pa.table({})


def validate_export(out_dir: str, violation_fn, *,
                    incremental: bool = False) -> pa.Table:
    """Per-range VALIDATION VERDICTS over a ``sorted_export`` directory
    (the north rule's per-partition pass/fail, attached to the lakehouse
    layout): one Ray task per range runs ``violation_fn(part_table) ->
    violation rows``, writes non-empty violations next to the part
    (``<part>.violations.parquet``, tmp+rename) and the verdict manifest
    commits atomically as ``validation.json``.

    ``incremental=True`` is the 100 TB re-validation path: a verdict is
    REUSED when its recorded part path still matches the manifest — and
    part paths are write-generation-tagged, so ANY rewrite (upsert,
    compaction, re-export) changes the path and forces re-validation of
    exactly the touched ranges.  Reuse also requires the persisted
    ``fn_tag`` (a fingerprint of the serialized ``violation_fn``) to
    match: a changed schema/predicate re-validates EVERYTHING rather
    than silently mixing verdicts from two rule sets.  After a CDC
    changeset, re-validating the table costs O(touched parts), not
    O(table); reuse counts are logged and persisted (no silent
    staleness).  Violations live under ``<out_dir>/violations/`` — a
    SIDECAR directory, so ``*.parquet`` directory readers of the export
    never ingest them as data.  Returns one verdict row per range:
    range_id, n_rows, n_violations, pass."""
    import hashlib
    import json
    import logging

    import ray
    from ray import cloudpickle

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    vdir = os.path.join(out_dir, "violations")
    os.makedirs(vdir, exist_ok=True)
    # a canonical tag on the fn wins (SchemaViolations derives one from
    # the declarative schema — stable across processes); pickled bytes
    # are the fallback for ad-hoc callables (stable within a process,
    # conservatively different across code changes)
    fn_tag = getattr(violation_fn, "fn_tag", None) or hashlib.sha256(
        cloudpickle.dumps(violation_fn)).hexdigest()[:16]
    vpath = os.path.join(out_dir, "validation.json")
    prior, prior_tag = {}, None
    if incremental and os.path.exists(vpath):
        with open(vpath) as f:
            prev = json.load(f)
        prior_tag = prev.get("fn_tag")
        if prior_tag == fn_tag:
            prior = {v["range_id"]: v for v in prev["verdicts"]}
        else:
            logging.getLogger("yaschva_ray.ops").warning(
                "validate_export: violation_fn changed (tag %s -> %s) "
                "— prior verdicts discarded, full re-validation",
                prior_tag, fn_tag)

    # broadcast once: the compiled validator ships to the object store
    # a single time, not once per range task
    fn_ref = ray.put(violation_fn)

    @ray.remote
    def check_part(rid: int, path: str, fn) -> dict:
        import pyarrow.parquet as pq

        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        t = pq.read_table(path)
        vio = fn(t)
        vio_path = os.path.join(
            os.path.dirname(path), "violations", os.path.basename(path))
        if vio.num_rows:
            tmp = vio_path + f".tmp-{os.getpid()}"
            pq.write_table(vio, tmp)
            os.replace(tmp, vio_path)
        else:
            vio_path = None
        return {"range_id": rid, "part_path": path,
                "n_rows": t.num_rows,
                "n_violations": vio.num_rows,
                "pass": vio.num_rows == 0,
                "violations_path": vio_path}

    refs, verdicts = [], []
    for r in m["ranges"]:
        pv = prior.get(r["range_id"])
        if pv is not None and pv["part_path"] == r["path"]:
            verdicts.append(pv)  # untouched part: verdict carried as-is
        else:
            refs.append(check_part.remote(r["range_id"], r["path"],
                                          fn_ref))
    verdicts.extend(ray.get(refs))
    verdicts.sort(key=lambda v: v["range_id"])
    if incremental:
        logging.getLogger("yaschva_ray.ops").info(
            "validate_export: %d ranges re-validated, %d verdicts "
            "reused", len(refs), len(verdicts) - len(refs))
    tmp = vpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"verdicts": verdicts, "fn_tag": fn_tag,
                   "n_revalidated": len(refs),
                   "n_reused": len(verdicts) - len(refs)}, f)
    os.replace(tmp, vpath)
    # post-commit: drop violations files of rewritten (now unreferenced)
    # parts — same honest-layout rule (and realpath rule) as the part
    # cleanup
    live = {os.path.realpath(v["violations_path"]) for v in verdicts
            if v["violations_path"]}
    import glob as _glob

    for p in _glob.glob(os.path.join(vdir, "*.parquet")):
        if os.path.realpath(p) not in live:
            try:
                os.remove(p)
            except OSError:
                pass
    return pa.table({
        "range_id": pa.array([v["range_id"] for v in verdicts], pa.int64()),
        "n_rows": pa.array([v["n_rows"] for v in verdicts], pa.int64()),
        "n_violations": pa.array([v["n_violations"] for v in verdicts],
                                 pa.int64()),
        "pass": pa.array([v["pass"] for v in verdicts], pa.bool_()),
    })


def retention_delete(out_dir: str, cutoff) -> pa.Table:
    """TTL/retention DELETE over a ``sorted_export`` directory: drop
    every row with ``key < cutoff``.  The layout makes this almost
    free — a part whose max_v < cutoff is dropped by MANIFEST EDIT
    alone (no read, no write: deleting 90% of a 100 TB table costs
    zero data IO), a part whose min_v >= cutoff is untouched, and only
    the part(s) STRADDLING the cutoff rewrite (vectorized filter,
    bumped write generation).  All-null-key rows sort first and count
    as expired (null < cutoff, matching the export's null placement).
    Commits follow the house protocol: new parts first, atomic
    manifest commit, THEN unreferenced files are removed.  Returns the
    new manifest rows.  Any existing validation.json verdicts stay
    correct for untouched ranges (paths unchanged) and re-check
    exactly the rewritten/dropped ones on the next incremental
    ``validate_export``."""
    import json

    import ray
    import pyarrow.parquet as pq

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    key = m["key"]
    ranges = sorted(m["ranges"], key=lambda r: r["range_id"])
    gen = int(m.get("compaction_gen", 0)) + 1

    # manifest min/max of non-JSON key types (timestamps/dates) arrive
    # as their ISO strings (default=str at write) — re-type against the
    # cutoff's domain, the same rule upsert_sorted applies to cutpoints
    cut_np = np.asarray(cutoff)

    def _typed(v):
        if v is None:
            return None
        return np.array(v, dtype=cut_np.dtype)[()] \
            if isinstance(v, str) else v

    @ray.remote
    def trim_range(rid: int, path: str, out: str, cutoff_) -> dict:
        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        t = pq.read_table(path)
        arr = t[key]
        # nulls expire with the old data (they sort before every value)
        keep = pc.fill_null(pc.greater_equal(arr, cutoff_), False)
        new = t.filter(keep)
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(new, tmp)
        os.replace(tmp, out)
        karr = new[key]
        ktype = new.schema.field(key).type
        mm = (pc.min_max(karr) if new.num_rows - karr.null_count
              else {"min": pa.scalar(None, ktype),
                    "max": pa.scalar(None, ktype)})
        return {"range_id": rid, "n_rows": new.num_rows,
                "n_nulls": karr.null_count, "min_v": mm["min"].as_py(),
                "max_v": mm["max"].as_py(), "path": out}

    # classify; wholly-expired ranges need NO read or write — every one
    # of them shares a single empty part written once per run (so
    # manifest paths stay uniform for co-partitioned merge joins)
    refs, final, dropped, rewritten = {}, [], 0, 0
    empty_path = None
    for r in ranges:
        if r["n_rows"] == 0 or (r["max_v"] is not None
                                and _typed(r["max_v"]) < cutoff):
            dropped += 1
            if empty_path is None:
                empty_path = os.path.join(
                    out_dir, f"retain-g{gen}-empty.parquet")
                empty = pq.read_schema(r["path"]).empty_table()
                tmp = empty_path + f".tmp-{os.getpid()}"
                pq.write_table(empty, tmp)
                os.replace(tmp, empty_path)
            final.append({**r, "n_rows": 0, "n_nulls": 0, "min_v": None,
                          "max_v": None, "path": empty_path})
        elif r["min_v"] is not None and _typed(r["min_v"]) >= cutoff \
                and r["n_nulls"] == 0:
            final.append(r)  # wholly live: untouched, byte-equal
        else:
            rewritten += 1
            out = os.path.join(out_dir,
                               f"retain-g{gen}-{r['range_id']:05d}.parquet")
            refs[r["range_id"]] = trim_range.remote(
                r["range_id"], r["path"], out, cutoff)
            final.append(None)  # placeholder, filled from the task below
    done = {rid: ray.get(ref) for rid, ref in refs.items()}
    final = [done[ranges[i]["range_id"]] if f is None else f
             for i, f in enumerate(final)]
    import logging

    logging.getLogger("yaschva_ray.ops").info(
        "retention_delete: %d ranges dropped manifest-only, %d "
        "rewritten, %d untouched", dropped, rewritten,
        len(final) - dropped - rewritten)
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"key": key, "cutpoints": m["cutpoints"],
                   "compaction_gen": gen,
                   "export_gen": int(m.get("export_gen", 0)),
                   "within": m.get("within", []),
                   "ranges": final}, f, default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    live = {r["path"] for r in final}
    _cleanup_unreferenced_parts(out_dir, live, _SORTED_PART_PREFIXES)
    # returned min/max normalize to the manifest's JSON form (strings
    # for non-JSON key types): untouched rows carry manifest strings,
    # rewritten rows carry live scalars — unify like default=str does
    return pa.Table.from_pylist([
        {**r, "min_v": None if r["min_v"] is None else str(r["min_v"]),
         "max_v": None if r["max_v"] is None else str(r["max_v"])}
        for r in final])


class SchemaViolations:
    """``violation_fn`` built from a declarative yaschva schema — the
    validate_export/revalidate_upsert adapter for the engine's own
    validator: vectorized mask first, then the mask-driven exploder over
    only the failing rows.  Compiled once at construction; the instance
    ships once per range task like any map_batches stage."""

    def __init__(self, schema, id_columns: tuple[str, ...] = ()):
        import hashlib
        import json

        from ..vectorized import TableValidator, ViolationExploder

        self._tv = TableValidator(schema, id_columns=id_columns)
        self._ex = ViolationExploder(schema, id_columns=id_columns)
        # canonical rule fingerprint for validate_export's verdict-reuse
        # gate: derived from the DECLARATIVE schema (sort_keys), stable
        # across processes where pickled-closure bytes are not
        self.fn_tag = hashlib.sha256(json.dumps(
            {"schema": schema, "id": list(id_columns)},
            sort_keys=True, default=str).encode()).hexdigest()[:16]

    def __call__(self, t: pa.Table) -> pa.Table:
        masked = self._tv(t)
        return self._ex(masked.filter(pc.invert(masked["valid"])))


def revalidate_upsert(out_dir: str, changes: pa.Table,
                      violation_fn) -> pa.Table:
    """CDC-apply + incremental re-validation in one step: merge
    ``changes`` into the sorted export (``upsert_sorted`` — only touched
    ranges rewrite), then re-validate ONLY those ranges
    (``validate_export(incremental=True)`` — path-tagged verdicts reuse
    everything else).  The post-CDC verdict set is byte-identical to a
    full re-validation at O(changeset) cost — the only re-validation
    shape that works when the table is 100 TB and the changeset is a
    few thousand rows."""
    upsert_sorted(out_dir, changes)
    return validate_export(out_dir, violation_fn, incremental=True)


def _spread_bits16(x: np.ndarray) -> np.ndarray:
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    word (the classic Morton magic-number ladder), vectorized."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def _zorder_codes(t: pa.Table, cols: list[str],
                  edges: dict[str, np.ndarray]) -> np.ndarray:
    """Morton code per row from TWO columns, each first quantized to its
    own equi-depth bin rank (``edges[col]`` = sorted bin boundaries, e.g.
    footer-derived quantiles): rank-space quantization makes the code
    distribution near-uniform, so equidistant code cutpoints balance the
    export without sampling the joint distribution.  Nulls and NaNs rank
    0 (they match no range predicate, so their placement is free)."""
    qs = []
    for col in cols:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = np.asarray(arr.is_valid())
        v = np.asarray(arr.to_numpy(zero_copy_only=False))
        q = np.zeros(len(v), dtype=np.uint64)
        nbins = max(len(edges[col]), 1)
        if valid.any():
            r = np.searchsorted(edges[col], v[valid],
                                side="right").astype(np.uint64)
            # scale the bin rank to fill the 16-bit interleave space —
            # otherwise every code sits in the low corner and the
            # equidistant range cutpoints see one bucket
            r = r * np.uint64(0xFFFF) // np.uint64(nbins)
            np.minimum(r, np.uint64(0xFFFF), out=r)
            q[valid] = r
        # NaN compares false everywhere in searchsorted -> lands at len;
        # clamp already bounded it, force NaN to 0 with the nulls
        if v.dtype.kind == "f":
            q[valid & np.isnan(v)] = 0
        qs.append(q)
    return (_spread_bits16(qs[0]) | (_spread_bits16(qs[1]) << np.uint64(1)))


def zorder_export(ds, cols: list[str], edges: dict[str, np.ndarray],
                  out_dir: str, n_ranges: int = 16) -> pa.Table:
    """Z-ORDER (Morton) clustered parquet export over TWO columns: rows
    are laid out by interleaved bit order of both columns' equi-depth
    ranks, so a range predicate on EITHER column concentrates in a few
    parts — the multi-dimensional sibling of ``sorted_export``, whose
    single sort key can prune only itself.  One range exchange on the
    code (equidistant cutpoints — rank quantization makes codes
    near-uniform); each part records BOTH columns' exact NaN-free
    min/max in the manifest, so pruning is exact-safe no matter how
    approximate the quantization edges are.  Layout is result-neutral:
    every row lands in exactly one part."""
    import json

    import pyarrow.parquet as pq

    from ..engine.exchange import range_exchange

    if len(cols) != 2:
        raise ValueError("zorder_export interleaves exactly 2 columns "
                         f"(got {cols!r})")
    os.makedirs(out_dir, exist_ok=True)
    gen = _next_export_gen(out_dir)

    def add_z(t: pa.Table) -> pa.Table:
        if any(c not in t.column_names for c in cols):
            return t  # schema-less empty block
        return t.append_column("__z", pa.array(
            _zorder_codes(t, cols, edges), pa.uint64()))

    def write_range(bucket_id: int, t: pa.Table) -> pa.Table:
        if "__z" in t.column_names:
            t = t.take(pc.sort_indices(
                t, sort_keys=[("__z", "ascending")]))
            t = t.drop_columns(["__z"])
        path = os.path.join(out_dir,
                            f"zpart-g{gen}-{bucket_id:05d}.parquet")
        # pid-suffixed temp (the _sink_bucket rule): retried tasks must
        # never interleave writes in one file
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        row = {"range_id": pa.array([bucket_id], pa.int64()),
               "n_rows": pa.array([t.num_rows], pa.int64()),
               "path": pa.array([path], pa.string())}
        for col in cols:
            arr = t[col] if col in t.column_names else pa.array([], pa.null())
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_floating(arr.type):
                arr = arr.filter(pc.invert(pc.is_nan(
                    pc.fill_null(arr, float("nan")))))
            mm = (pc.min_max(arr) if len(arr) - arr.null_count
                  else {"min": pa.scalar(None), "max": pa.scalar(None)})
            row[f"min_{col}"] = pa.array([mm["min"].as_py()])
            row[f"max_{col}"] = pa.array([mm["max"].as_py()])
        return pa.table(row)

    zds = ds.map_batches(add_z, batch_format="pyarrow")
    # rank-uniform codes -> equidistant cutpoints over the 32-bit cube
    cutpoints = np.linspace(0, float(1 << 32), n_ranges,
                            endpoint=False)[1:].astype(np.uint64)
    s = ds.schema()
    base = (getattr(s, "base_schema", None) or pa.schema(
        [(n, ty) for n, ty in zip(s.names, s.types)]))
    empty_t = base.append(pa.field("__z", pa.uint64())).empty_table()
    manifest = pa.concat_tables(
        range_exchange(zds, "__z", cutpoints, write_range,
                       empty_result=empty_t),
        promote_options="default").combine_chunks()
    _warn_hot_ranges(manifest, "zorder_export")
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"zorder_cols": cols, "export_gen": gen,
                   "ranges": manifest.to_pylist()}, f, default=str)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    # only now: drop the previous generation's parts (and a wider earlier
    # run's orphans) — directory readers must never double-count rows
    _cleanup_unreferenced_parts(
        out_dir, set(manifest["path"].to_pylist()), ("zpart-",))
    return manifest


def _zorder_lookup_plan(manifest: dict, col: str, lo, hi) -> list[str]:
    """Single-predicate form of `_zorder_plan_multi` — shared by
    zorder_lookup and the CLI's probe report so the pruning predicate
    cannot drift."""
    return _zorder_plan_multi(manifest, {col: (lo, hi)})


def _zorder_plan_multi(manifest: dict, preds: dict) -> list[str]:
    """Parts whose per-column [min, max] intervals can overlap EVERY
    probe in ``preds`` (a conjunction: col -> (lo, hi)) — the manifest
    as a coarse multi-column index.  All-null/NaN parts never match a
    range probe.  Conjunctive pruning is where the z-layout pays: each
    predicate cuts the survivor set independently, so an AND of two
    ranges reads roughly the PRODUCT of the single-column fractions."""
    bad = [c for c in preds if c not in manifest["zorder_cols"]]
    if bad:
        raise ValueError(f"zorder_lookup: {bad} is not a clustered "
                         f"column ({manifest['zorder_cols']})")
    return [r["path"] for r in manifest["ranges"]
            if r["n_rows"] and all(
                r[f"min_{c}"] is not None
                and r[f"min_{c}"] <= hi and lo <= r[f"max_{c}"]
                for c, (lo, hi) in preds.items())]


def zorder_lookup(out_dir: str, col: str, lo, hi) -> pa.Table:
    """Range predicate ``lo <= col <= hi`` over a ``zorder_export``
    directory — see ``zorder_lookup_multi`` (this is the one-predicate
    form)."""
    return zorder_lookup_multi(out_dir, {col: (lo, hi)})


def zorder_lookup_multi(out_dir: str, preds: dict) -> pa.Table:
    """CONJUNCTION of range predicates (``col -> (lo, hi)``, ANDed)
    over a ``zorder_export`` directory: the manifest's per-part
    [min, max] intervals prune on every probed column at once — the
    multi-dimensional payoff of the z-layout, where an AND of two
    ranges reads ~the product of the single-column part fractions —
    then the exact vectorized filter runs inside just the surviving
    parts.  All-null/NaN parts never match a range probe."""
    import json

    from ..engine.blocks import gather_tables

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    files = _zorder_plan_multi(m, preds)
    if not files:
        return pa.table({})
    import ray.data

    def filt(t: pa.Table) -> pa.Table:
        if any(c not in t.column_names for c in preds):
            return t
        mask = None
        for c, (lo, hi) in preds.items():
            one = pc.and_(pc.greater_equal(t[c], lo),
                          pc.less_equal(t[c], hi))
            mask = one if mask is None else pc.and_(mask, one)
        return t.filter(mask)

    parts = [t for t in gather_tables(
        ray.data.read_parquet(files).map_batches(filt,
                                                 batch_format="pyarrow"))
        if t.num_rows]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts).combine_chunks()


def merge_join_sorted(dir_a: str, dir_b: str, *, how: str = "inner") -> pa.Table:
    """SHUFFLE-FREE join of two ``sorted_export`` directories that share
    cutpoints: equal keys provably live in the same range id on both
    sides (searchsorted is a pure function of the value), so the join is
    one task per range pair reading two parts — no exchange, no network
    beyond the reads.  The lakehouse pattern: pick ONE partitioning and
    reuse it across stages; the manifests carry the cutpoints, and a
    mismatch raises instead of silently joining mis-aligned files.
    Non-key column names must be disjoint."""
    import json

    import ray

    def load(d):
        with open(os.path.join(d, "manifest.json")) as f:
            return json.load(f)

    if how not in ("inner", "left outer", "right outer", "full outer"):
        raise ValueError(f"merge_join_sorted: unsupported how={how!r}")
    ma, mb = load(dir_a), load(dir_b)
    if ma["cutpoints"] != mb["cutpoints"]:
        raise ValueError(
            "merge_join_sorted: the two exports were partitioned with "
            "DIFFERENT cutpoints — equal keys are not co-located; "
            "re-export one side with the other's cutpoints")
    ranges_a = {r["range_id"]: r for r in ma["ranges"]}
    ranges_b = {r["range_id"]: r for r in mb["ranges"]}

    @ray.remote
    def join_range(pa_path: str | None, pb_path: str | None,
                   key_a: str, key_b: str, how_: str) -> pa.Table:
        import pyarrow.parquet as pq

        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        if pa_path is None or pb_path is None:
            # equal cutpoints imply equal range counts — a missing side
            # means mismatched manifests, never silently-droppable rows
            raise ValueError(
                f"merge_join_sorted: range missing on one side "
                f"({pa_path!r} vs {pb_path!r}) — manifests disagree")
        ta = pq.read_table(pa_path)
        tb = pq.read_table(pb_path)
        shared = (set(ta.column_names) - {key_a}) & \
            (set(tb.column_names) - {key_b})
        if shared:
            raise ValueError(
                f"merge_join_sorted requires disjoint non-key column "
                f"names; shared: {sorted(shared)}")
        # no empty-side shortcut: a LEFT OUTER join with an empty right
        # part must still emit the left rows with typed nulls — Arrow's
        # join handles 0-row sides correctly and keeps full schemas
        return ta.join(tb, keys=[key_a], right_keys=[key_b],
                       join_type=how_)

    refs = [join_range.remote(
        ranges_a.get(i, {}).get("path"), ranges_b.get(i, {}).get("path"),
        ma["key"], mb["key"], how)
        for i in sorted(set(ranges_a) | set(ranges_b))]
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default") \
        .combine_chunks()


def asof_merge_join_sorted(dir_left: str, dir_right: str) -> pa.Table:
    """SHUFFLE-FREE backward AS-OF join of two ``sorted_export``
    directories sharing TIME cutpoints — the temporal sibling of
    ``merge_join_sorted``: each left row gets the latest right row at or
    before its time.  Time-range co-location means a range pair joins
    locally; the only cross-range dependency is the AS-OF BOUNDARY — a
    left row earlier than every right row in its range matches the LAST
    right row of the nearest earlier non-empty range — satisfied by ONE
    carry row per task, read from only the FINAL row group of that part
    (a few KB at any scale, never the part).  Contracts: strictly
    increasing non-null right times (raises — ties would make the match
    ambiguous), non-null left times, fully disjoint column names.
    Unmatched left rows keep typed nulls on the right (left-outer as-of,
    the SQL ASOF LEFT JOIN shape)."""
    import json

    import ray

    def load(d):
        with open(os.path.join(d, "manifest.json")) as f:
            return json.load(f)

    ml, mr = load(dir_left), load(dir_right)
    if ml["cutpoints"] != mr["cutpoints"]:
        raise ValueError(
            "asof_merge_join_sorted: the two exports were partitioned "
            "with DIFFERENT cutpoints — time ranges are not co-located; "
            "re-export one side with the other's cutpoints")
    rl = {r["range_id"]: r for r in ml["ranges"]}
    rr = {r["range_id"]: r for r in mr["ranges"]}
    carry: dict[int, str | None] = {}
    last = None
    for rid in sorted(rr):
        carry[rid] = last
        if rr[rid]["n_rows"]:
            last = rr[rid]["path"]

    @ray.remote
    def join_range(lpath: str, rpath: str, carry_path: str | None,
                   kl: str, kr: str) -> pa.Table:
        import pyarrow.parquet as pq

        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        tl = pq.read_table(lpath)
        # the right SCHEMA comes from the footer even when no right row
        # exists — unmatched lefts must keep TYPED null right columns
        rschema = pq.read_schema(rpath)
        shared = set(tl.column_names) & set(rschema.names)
        if shared:
            raise ValueError(
                "asof_merge_join_sorted requires disjoint column "
                f"names; shared: {sorted(shared)}")
        if not tl.num_rows:  # nothing to match: skip ALL right reads
            return tl  # (schema restored at concat)
        parts = []
        if carry_path is not None:
            f = pq.ParquetFile(carry_path)
            tail = f.read_row_group(f.num_row_groups - 1)
            parts.append(tail.slice(tail.num_rows - 1, 1))
        tr_own = pq.read_table(rpath)
        if tr_own.num_rows:
            parts.append(tr_own)
        tr = (pa.concat_tables(parts).combine_chunks() if parts
              else None)
        lt_arr = tl[kl]
        if lt_arr.null_count:
            raise ValueError("asof_merge_join_sorted: null left times")
        lt = np.asarray(lt_arr.to_numpy(zero_copy_only=False))
        out = {c: tl[c] for c in tl.column_names}
        if tr is None:  # no right rows at or before this range
            for c in rschema.names:
                out[c] = pa.nulls(tl.num_rows, rschema.field(c).type)
            return pa.table(out)
        rt_arr = tr[kr]
        if rt_arr.null_count:
            raise ValueError("asof_merge_join_sorted: null right times")
        rt = np.asarray(rt_arr.to_numpy(zero_copy_only=False))
        if len(rt) > 1 and not (rt[1:] > rt[:-1]).all():
            raise ValueError(
                "asof_merge_join_sorted: right times must be strictly "
                "increasing (duplicate timestamps make the as-of match "
                "ambiguous — pre-aggregate the right side)")
        idx = np.searchsorted(rt, lt, side="right") - 1
        ok = idx >= 0
        safe = pa.array(np.where(ok, idx, 0), pa.int64())
        okm = pa.array(ok)
        for c in tr.column_names:
            taken = tr[c].take(safe)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            out[c] = pc.if_else(okm, taken,
                                pa.nulls(len(ok), rschema.field(c).type))
        return pa.table(out)

    missing = sorted(set(rl) - set(rr))
    if missing:  # equal cutpoints imply equal range ids on both sides
        raise ValueError(
            f"asof_merge_join_sorted: ranges {missing} missing from the "
            "right manifest — manifests disagree")
    refs = [join_range.remote(rl[i]["path"], rr[i]["path"],
                              carry.get(i), ml["key"], mr["key"])
            for i in sorted(rl)]
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default") \
        .combine_chunks()


def q_sorted_merge_join(sf_dir: str, n_ranges: int = 6,
                        sample_mod: int = 17) -> pa.Table:
    """orders ⋈ lineitem with ZERO shuffle at join time: both tables are
    range-exported sorted by orderkey with the SAME cutpoints, then each
    range pair joins locally — the partitioning is picked once and reused
    across stages.  Cutpoints never change the result (so the oracle is
    the plain SQL join), which lets them come from parquet FOOTER stats
    (`footer_equidepth_cutpoints` — zero data read) with the sampling
    scan only as a logged fallback for stat-less files."""
    import hashlib

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    cutpoints = _cutpoints_footer_or_sample(
        sf_dir, "orders", "o_orderkey", orders, n_ranges, sample_mod)
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join("/tmp", "yaschva_sorted_join", tag)
    dir_o = os.path.join(root, "orders")
    dir_l = os.path.join(root, "lineitem")
    sorted_export(orders, "o_orderkey", dir_o, cutpoints)
    sorted_export(items, "l_orderkey", dir_l, cutpoints)
    out = merge_join_sorted(dir_o, dir_l)
    if not out.num_rows:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_totalprice": pa.array([], pa.float64()),
                         "l_quantity": pa.array([], pa.float64())})
    return out.select(["o_orderkey", "o_totalprice", "l_quantity"]) \
        .sort_by([("o_orderkey", "ascending"),
                  ("o_totalprice", "ascending"),
                  ("l_quantity", "ascending")])


def q_zorder_lookup2(sf_dir: str, n_ranges: int = 64) -> pa.Table:
    """CONJUNCTIVE two-column probe over the z-layout — the query shape
    the Morton interleave exists for: ``user_id BETWEEN 10 AND 40 AND
    value BETWEEN 100 AND 160`` prunes the manifest on BOTH columns'
    per-part min/max (the survivor set is ~the product of the two
    single-column fractions), exact filter inside only those parts.
    Layout result-neutral → plain two-BETWEEN SQL oracle."""
    import hashlib
    import shutil

    path = os.path.join(sf_dir, "events.parquet")
    edges = footer_equidepth_cutpoints_multi(
        path, ["user_id", "value"], 257)
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join("/tmp", "yaschva_zorder2", tag)
    shutil.rmtree(out, ignore_errors=True)
    zorder_export(ds, ["user_id", "value"], edges, out, n_ranges=n_ranges)
    res = zorder_lookup_multi(out, {"user_id": (10, 40),
                                    "value": (100.0, 160.0)})
    if not res.num_rows:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    return res.select(["event_id", "user_id", "value"]) \
        .sort_by([("event_id", "ascending")])


def q_upsert_orders(sf_dir: str, n_ranges: int = 6,
                    sample_mod: int = 17, n_inserts: int = 50) -> pa.Table:
    """CDC merge into a sorted orders export — delete every key divisible
    by 7, upsert (price + 1000) every key divisible by 5 but not 7, and
    insert ``n_inserts`` brand-new keys past the max — then read the
    table back in range order.  Exercises the full ``upsert_sorted``
    path: only touched ranges rewrite (at 100 TB the changeset IS the
    input and rewrites a handful of parts); here the changeset is derived
    from the same deterministic predicates the DuckDB oracle mirrors, so
    the final table is hash-exact.  Global max comes from the export's
    own manifest, and the export cutpoints come from parquet footers
    (result-neutral; sampling scan only as logged fallback) — no extra
    scans."""
    import hashlib
    import shutil

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    cutpoints = _cutpoints_footer_or_sample(
        sf_dir, "orders", "o_orderkey", orders, n_ranges, sample_mod)
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_upsert", tag)
    shutil.rmtree(out_dir, ignore_errors=True)  # upsert mutates: fresh run
    manifest = sorted_export(orders, "o_orderkey", out_dir, cutpoints)
    max_key = pc.max(manifest["max_v"]).as_py()

    def change_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dels = ids % 7 == 0
        ups = (ids % 5 == 0) & ~dels
        dt = t.filter(pa.array(dels))
        ut = t.filter(pa.array(ups))
        return pa.concat_tables([
            pa.table({"o_orderkey": dt["o_orderkey"],
                      "o_totalprice": pa.nulls(dt.num_rows, pa.float64()),
                      "op": pa.array(["delete"] * dt.num_rows,
                                     pa.string())}),
            pa.table({"o_orderkey": ut["o_orderkey"],
                      "o_totalprice": pc.add(ut["o_totalprice"], 1000.0),
                      "op": pa.array(["upsert"] * ut.num_rows,
                                     pa.string())}),
        ])

    parts = [t for t in gather_tables(orders.map_batches(
        change_rows, batch_format="pyarrow")) if t.num_rows]
    ins = pa.table({
        "o_orderkey": pa.array(
            [max_key + i for i in range(1, n_inserts + 1)], pa.int64()),
        "o_totalprice": pa.array(
            [1.5 * i for i in range(1, n_inserts + 1)], pa.float64()),
        "op": pa.array(["upsert"] * n_inserts),
    })
    changes = pa.concat_tables(parts + [ins]).combine_chunks()
    upsert_sorted(out_dir, changes)

    import json

    import pyarrow.parquet as pq

    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    tabs = [pq.read_table(r["path"])
            for r in sorted(m["ranges"], key=lambda r: r["range_id"])]
    out = pa.concat_tables([t for t in tabs if t.num_rows]).combine_chunks()
    # parts in range order ARE the table in key order — no sort needed
    return out.select(["o_orderkey", "o_totalprice"])


_REVAL_PRICE_CAP = 450_000.0


def _orders_price_violations(t: pa.Table) -> pa.Table:
    """Constraint mirrored by the incremental_revalidation oracle:
    o_totalprice must not exceed the cap (vectorized; no nulls in the
    post-merge table — upserts carry explicit prices, deletes are
    gone)."""
    bad = pc.fill_null(
        pc.greater(t["o_totalprice"], _REVAL_PRICE_CAP), False)
    return t.filter(bad)


def q_incremental_revalidation(sf_dir: str, n_ranges: int = 6,
                               sample_mod: int = 97,
                               n_inserts: int = 50) -> pa.Table:
    """INCREMENTAL RE-VALIDATION after CDC — the north rule's
    per-partition pass/fail kept current at O(changeset) cost: export
    orders sorted by key with per-range verdicts (price-cap constraint),
    merge a deterministic changeset (delete keys %7, re-price keys %5 by
    +300k — flipping many verdicts — and insert new keys past the max),
    then ``revalidate_upsert`` re-checks ONLY the rewritten ranges;
    every other verdict is reused via its write-generation-tagged part
    path.  The returned verdict rows are byte-identical to a full
    re-validation (pinned by tests); the oracle recomputes the sampled
    cutpoints, the changeset and the per-range violation counts in SQL,
    so the driver check is hash-exact.  Cutpoints come from the same
    position-independent systematic sample as sorted_export_events
    (keys %97) — per-range verdicts are NOT cutpoint-neutral, so the
    footer shortcut does not apply here."""
    import hashlib
    import shutil

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"k": t["o_orderkey"].filter(pa.array(ids % sample_mod == 0))})

    sv = np.sort(np.concatenate([
        np.asarray(t["k"].to_numpy(zero_copy_only=False))
        for t in gather_tables(orders.map_batches(
            sample, batch_format="pyarrow")) if t.num_rows]
        or [np.empty(0, np.int64)]))
    cutpoints = equidepth_cutpoints(sv, n_ranges)
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_reval", tag)
    shutil.rmtree(out_dir, ignore_errors=True)  # CDC mutates: fresh run
    manifest = sorted_export(orders, "o_orderkey", out_dir, cutpoints)
    validate_export(out_dir, _orders_price_violations)
    max_key = pc.max(manifest["max_v"]).as_py()

    def change_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        dels = ids % 7 == 0
        ups = (ids % 5 == 0) & ~dels
        dt = t.filter(pa.array(dels))
        ut = t.filter(pa.array(ups))
        return pa.concat_tables([
            pa.table({"o_orderkey": dt["o_orderkey"],
                      "o_totalprice": pa.nulls(dt.num_rows, pa.float64()),
                      "op": pa.array(["delete"] * dt.num_rows)}),
            pa.table({"o_orderkey": ut["o_orderkey"],
                      "o_totalprice": pc.add(ut["o_totalprice"],
                                             300_000.0),
                      "op": pa.array(["upsert"] * ut.num_rows)}),
        ])

    parts = [t for t in gather_tables(orders.map_batches(
        change_rows, batch_format="pyarrow")) if t.num_rows]
    ins = pa.table({
        "o_orderkey": pa.array(
            [max_key + i for i in range(1, n_inserts + 1)], pa.int64()),
        "o_totalprice": pa.array(
            [1.5 * i for i in range(1, n_inserts + 1)], pa.float64()),
        "op": pa.array(["upsert"] * n_inserts),
    })
    changes = pa.concat_tables(parts + [ins]).combine_chunks()
    verdicts = revalidate_upsert(out_dir, changes,
                                 _orders_price_violations)
    return verdicts.filter(pc.greater(verdicts["n_rows"], 0)) \
        .sort_by([("range_id", "ascending")])


def q_retention_events(sf_dir: str, n_ranges: int = 10,
                       sample_mod: int = 97) -> pa.Table:
    """RETENTION over the time-sorted layout: export events ordered by
    ts, delete everything before 2024-01-22 — wholly-expired ranges
    drop by manifest edit (zero data IO; at 100 TB deleting most of
    the table costs one boundary-part rewrite), only the straddling
    range filters and rewrites.  Read back from the manifest; the
    oracle is the plain WHERE.  Cutpoints are result-neutral (the
    survivor set is a pure function of ts), so they come from the
    deterministic sample only for balance."""
    import hashlib
    import shutil

    cutoff = np.datetime64("2024-01-22T00:00:00.000000")
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def ts_sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"ts": t["ts"].filter(pa.array(ids % sample_mod == 0))})

    sv = np.sort(np.concatenate([
        np.asarray(t["ts"].to_numpy(zero_copy_only=False))
        for t in gather_tables(ds.map_batches(
            ts_sample, batch_format="pyarrow")) if t.num_rows]
        or [np.empty(0, "datetime64[us]")]))
    cuts = equidepth_cutpoints(sv, n_ranges)
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_retention", tag)
    shutil.rmtree(out_dir, ignore_errors=True)  # delete mutates: fresh
    sorted_export(ds, "ts", out_dir, cuts)
    manifest = retention_delete(out_dir, cutoff)

    import pyarrow.parquet as pq

    tabs = [pq.read_table(r["path"])
            for r in sorted(manifest.to_pylist(),
                            key=lambda r: r["range_id"]) if r["n_rows"]]
    if not tabs:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "ts": pa.array([], pa.timestamp("us"))})
    return pa.concat_tables(tabs).combine_chunks() \
        .sort_by([("event_id", "ascending")])


def q_events_asof_sorted(sf_dir: str, n_ranges: int = 8,
                         sample_mod: int = 97) -> pa.Table:
    """The global as-of expressed over the LAKEHOUSE LAYOUT: purchases
    and the deduped view-reference series are both range-exported on the
    SAME sampled time cutpoints, then ``asof_merge_join_sorted`` aligns
    each purchase to the latest view at or before it with zero shuffle —
    one task per range pair plus a one-row boundary carry.  Same
    semantics as events_global_asof (exchange-based), same DuckDB ASOF
    oracle; the layout is result-neutral, so cutpoint placement never
    changes a row.  The deduped right side is gathered through bounded
    per-block partials (distinct view timestamps — sublinear in events)
    before its export."""
    import hashlib
    import shutil

    events = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def left_rows(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["event_type"], "purchase")
        return pa.table({"event_id": t["event_id"].filter(keep),
                         "ts": t["ts"].filter(keep)})

    def right_partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["event_type"], "view")
        v = t.filter(keep)
        g = v.group_by("ts").aggregate([("event_id", "max")])
        return pa.table({"rts": g["ts"], "ref_id": g["event_id_max"]})

    def ts_sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"ts": t["ts"].filter(pa.array(ids % sample_mod == 0))})

    sv = np.sort(np.concatenate([
        np.asarray(t["ts"].to_numpy(zero_copy_only=False))
        for t in gather_tables(events.map_batches(
            ts_sample, batch_format="pyarrow")) if t.num_rows]
        or [np.empty(0, "datetime64[us]")]))
    cuts = equidepth_cutpoints(sv, n_ranges)

    rparts = [t for t in gather_tables(events.map_batches(
        right_partial, batch_format="pyarrow")) if t.num_rows]
    rtab = pa.concat_tables(rparts).combine_chunks()
    g = rtab.group_by("rts").aggregate([("ref_id", "max")])
    rtab = pa.table({"rts": g["rts"], "ref_id": g["ref_id_max"]})

    import ray.data

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join("/tmp", "yaschva_asof_sorted", tag)
    shutil.rmtree(base, ignore_errors=True)
    dl, dr = os.path.join(base, "purchases"), os.path.join(base, "views")
    sorted_export(events.map_batches(left_rows, batch_format="pyarrow"),
                  "ts", dl, cuts)
    sorted_export(ray.data.from_arrow(rtab).repartition(4), "rts", dr,
                  cuts)
    res = asof_merge_join_sorted(dl, dr)
    if not res.num_rows:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "ref_id": pa.array([], pa.int64())})
    return res.select(["event_id", "ref_id"]) \
        .sort_by([("event_id", "ascending")])


def q_sorted_export_composite(sf_dir: str, n_ranges: int = 8) -> pa.Table:
    """COMPOSITE-clustered export — the fact-table layout: lineitem
    range-partitioned on l_orderkey with l_linenumber ordered WITHIN
    each range, so reading parts in range order is the table in full
    (l_orderkey, l_linenumber) order.  The result is returned in FILE
    order with no re-sort — the oracle's ORDER BY two keys matching
    hash-exactly IS the proof the layout carries the composite order.
    Cutpoints only shift range balance here (row order is a pure
    function of the keys), so they come from parquet footers — zero
    extra scans."""
    import hashlib
    import json
    import shutil

    import pyarrow.parquet as pq

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    cutpoints = _cutpoints_footer_or_sample(
        sf_dir, "lineitem", "l_orderkey", ds, n_ranges, 97)
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_sorted_comp", tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    sorted_export(ds, "l_orderkey", out_dir, cutpoints,
                  within=["l_linenumber"])
    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    tabs = [pq.read_table(r["path"])
            for r in sorted(m["ranges"], key=lambda r: r["range_id"])]
    return pa.concat_tables(
        [t for t in tabs if t.num_rows]).combine_chunks()


def q_sorted_export_events(sf_dir: str, n_ranges: int = 8,
                           sample_mod: int = 97) -> pa.Table:
    """Sorted export of events by value, driver-checked from the LINEAGE:
    equi-depth cutpoints from a deterministic id-keyed systematic sample
    (event_id % 97 == 0 — position-independent, so both engines pick the
    same rows), export to /tmp, return the non-empty manifest rows.  The
    oracle recomputes the identical cutpoints and range assignment in
    SQL, so rows/min/max per range are hash-exact.  At scale the sample
    gather is the only driver-side state — size it with ``sample_mod``
    (~n/sample_mod values)."""
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False))
        keep = pa.array(ids % sample_mod == 0)
        return pa.table({"value": t["value"].filter(keep)})

    sv = np.sort(np.concatenate([
        np.asarray(t["value"].to_numpy(zero_copy_only=False))
        for t in gather_tables(ds.map_batches(sample, batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0)]))
    cutpoints = equidepth_cutpoints(sv, n_ranges)
    import hashlib

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_sorted_events", tag)
    manifest = sorted_export(ds, "value", out_dir, cutpoints)
    manifest = manifest.filter(pc.greater(manifest["n_rows"], 0))
    return manifest.select(["range_id", "n_rows", "min_v", "max_v"]) \
        .sort_by([("range_id", "ascending")])


def q_zorder_lookup(sf_dir: str, lo: float = 100.0, hi: float = 120.0,
                    n_ranges: int = 16) -> pa.Table:
    """Z-ORDER clustered layout, exercised end-to-end: events exported
    Morton-interleaved on (user_id, value) — bin edges from parquet
    FOOTERS, zero extra scans — then a value-range predicate answered by
    manifest pruning + exact filter inside only the overlapping parts.
    A single-key sorted export prunes one column; the z-layout prunes
    range predicates on EITHER clustered column (the multi-dimensional
    lakehouse clustering pattern).  Layout is result-neutral, so the
    oracle is the plain SQL BETWEEN."""
    import hashlib
    import shutil

    path = os.path.join(sf_dir, "events.parquet")
    edges = footer_equidepth_cutpoints_multi(
        path, ["user_id", "value"], 257)  # one footer decode, both cols
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join("/tmp", "yaschva_zorder", tag)
    shutil.rmtree(out, ignore_errors=True)
    zorder_export(ds, ["user_id", "value"], edges, out, n_ranges=n_ranges)
    res = zorder_lookup(out, "value", lo, hi)
    if not res.num_rows:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    return res.select(["event_id", "user_id", "value"]) \
        .sort_by([("event_id", "ascending")])


_GASOF_PURCHASE_EMPTY = pa.table({"event_id": pa.array([], pa.int64()),
                                  "ts": pa.array([], pa.timestamp("us"))})
_GASOF_RIGHT_EMPTY = pa.table({"rts": pa.array([], pa.timestamp("us")),
                               "ref_id": pa.array([], pa.int64())})


def _gasof_fused_map(block: pa.Table, num_buckets: int, sample_mod: int):
    """ONE pass over an events block producing all three consumers the
    keyless as-of needs — (a) per-ts view partials hash-sliced for the
    right exchange, (b) projected purchase rows (the join's left side),
    (c) a deterministic timestamp sample for cutpoint estimation — where
    the original plan re-scanned the whole events table once per
    consumer.  Returns ``num_buckets`` right slices + [purchases,
    sample]."""
    from ..engine.joins import _hash_slices
    from ..engine.sketches import limit_worker_threads

    limit_worker_threads()
    sample_empty = pa.table({"ts": pa.array([], pa.timestamp("us"))})
    if "event_type" not in block.column_names:
        # schema-less empty block (Ray's empty map output shape)
        return ([pa.table({})] * num_buckets
                + [_GASOF_PURCHASE_EMPTY, sample_empty])
    sel = block.filter(pc.equal(block["event_type"], "view"))
    g = (sel.select(["ts", "event_id"]).group_by("ts")
         .aggregate([("event_id", "max")]))
    vp = pa.table({"rts": g["ts"], "ref_id": g["event_id_max"]})
    slices = _hash_slices(vp, "rts", num_buckets)
    purch = block.filter(pc.equal(block["event_type"], "purchase")) \
        .select(["event_id", "ts"])
    # null-safe: null ids still sample deterministically (as 0) and
    # null timestamps never become cutpoints (they carry no order)
    ids, _ = _int_col(block["event_id"])
    samp = pa.table(
        {"ts": block["ts"].filter(pa.array(ids % sample_mod == 0))
         .drop_null()})
    return slices + [purch, samp]


_GASOF_FUSED_REMOTE = None


def q_events_global_asof(sf_dir: str, n_ranges: int = 8,
                         sample_mod: int = 97) -> pa.Table:
    """KEYLESS as-of over global TIME order: every purchase event aligned
    to the latest 'view' reference event at or before it — no join key,
    so the keyed asof_join cannot express it; `engine.joins.
    global_asof_join` co-partitions both sides ORDERED by sampled time
    cutpoints and carries each range's last right row across boundaries.
    The right side is pre-aggregated to one row per timestamp (MAX
    event_id) — the operator's unique-right-ts contract.  Cutpoints only
    place rows in ranges, never change the result, so the oracle is plain
    DuckDB ASOF JOIN.

    The events table is scanned ONCE: a fused multi-output map
    (`_gasof_fused_map`) emits the right exchange's hash slices, the
    left purchase rows and the cutpoint sample per block (the naive plan
    consumed the source three times — two wasted full scans at 100 TB),
    and the join takes both sides as slice refs + explicit schemas."""
    import ray

    from ..engine.exchange import bounded_map_entries, reduce_remote
    from ..engine.joins import _auto_buckets, global_asof_join

    events = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    # right-exchange sizing from the one input we have; view partials are
    # a small fraction of it, so this errs toward more, smaller buckets
    nb = _auto_buckets(events)

    global _GASOF_FUSED_REMOTE
    if _GASOF_FUSED_REMOTE is None:
        _GASOF_FUSED_REMOTE = ray.remote(_gasof_fused_map)
    entries = bounded_map_entries(
        events,
        lambda ref: _GASOF_FUSED_REMOTE.options(num_returns=nb + 2)
        .remote(ref, nb, sample_mod),
        nb + 2)

    def dedup_ts(t: pa.Table) -> pa.Table:
        g = t.group_by("rts").aggregate([("ref_id", "max")])
        return pa.table({"rts": g["rts"], "ref_id": g["ref_id_max"]})

    reduce = reduce_remote()
    right_refs = [reduce.remote(dedup_ts, _GASOF_RIGHT_EMPTY,
                                *[m[b] for m in entries])
                  for b in range(nb)]
    left_refs = [m[nb] for m in entries]
    sv = np.sort(np.concatenate([
        np.asarray(t["ts"].to_numpy(zero_copy_only=False))
        for t in ray.get([m[nb + 1] for m in entries])
        if t.num_rows] or [np.empty(0, "datetime64[us]")]))
    cutpoints = equidepth_cutpoints(sv, n_ranges)
    out = global_asof_join(
        left_refs=left_refs, left_schema=_GASOF_PURCHASE_EMPTY.schema,
        right_refs=right_refs, right_schema=_GASOF_RIGHT_EMPTY.schema,
        left_ts="ts", right_ts="rts", cutpoints=cutpoints)
    if not out.num_rows:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "ref_id": pa.array([], pa.int64())})
    return out.select(["event_id", "ref_id"]) \
        .sort_by([("event_id", "ascending")])


def q_recent_orders_lineitems(sf_dir: str) -> pa.Table:
    """SELECTIVE big-big join, bloom-prefiltered: the left side (orders in
    a narrow recent window — a date filter pushed INTO the read) matches
    ~1% of lineitem, so `hash_join(bloom_right_by_left=True)` builds a
    broadcast Bloom filter from the filtered orders and lineitem rows
    that cannot match die at the scan instead of crossing the exchange
    (at 100 TB: ~99% fewer shuffled right-side bytes; false positives
    just ride through to the exact in-bucket join)."""
    import pyarrow.dataset as pads
    import ray.data

    from ..engine.joins import hash_join

    from ..sources import clean_parquet_schema

    cutoff = pa.scalar(np.datetime64("2001-07-01", "us"),
                       pa.timestamp("us"))
    opath = os.path.join(sf_dir, "orders.parquet")
    left = ray.data.read_parquet(
        opath, columns=["o_orderkey", "o_orderdate"],
        # metadata-stripped schema keeps block schemas hashable (same
        # rationale as _read — raw footers carry unhashable dict metadata
        # that defeats Ray's schema dedup and warns per block)
        schema=clean_parquet_schema(opath, ["o_orderkey", "o_orderdate"]),
        filter=(pads.field("o_orderdate") >= cutoff))
    right = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_extendedprice"])
    out = hash_join(left, right, left_key="o_orderkey",
                    right_key="l_orderkey", bloom_right_by_left=True)
    if not out.num_rows:
        return pa.schema([("o_orderkey", pa.int64()),
                          ("l_quantity", pa.float64()),
                          ("l_extendedprice", pa.float64())]).empty_table()
    return out.select(["o_orderkey", "l_quantity", "l_extendedprice"]) \
        .sort_by([("o_orderkey", "ascending"), ("l_quantity", "ascending"),
                  ("l_extendedprice", "ascending")])


def _ship_before_order_filter(t: pa.Table) -> pa.Table:
    """In-reduce cross-field predicate: emit only violating rows."""
    return t.filter(pc.less(t["l_shipdate"], t["o_orderdate"])).select(
        ["l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"])


def q_ship_before_order(sf_dir: str) -> pa.Table:
    """CROSS-TABLE row-level constraint check (the data-quality checker
    kind next to uniqueness/referential/drift): a lineitem must not ship
    before its order was placed.  The predicate spans two tables, so the
    plan is the big-big hash join on orderkey with the filter pushed INTO
    the join reduce (``bucket_fn``) — each bucket joins its co-located
    slices and emits only violations, so the driver/sink traffic is the
    violation set (here ~half the rows by synthetic construction; in a
    healthy corpus ~0), never the full join."""
    from ..engine.joins import hash_join

    left = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_shipdate"])
    right = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out = hash_join(left, right, left_key="l_orderkey",
                    right_key="o_orderkey",
                    bucket_fn=_ship_before_order_filter)
    if not out.num_rows:
        return pa.schema([("l_orderkey", pa.int64()),
                          ("l_linenumber", pa.int32()),
                          ("l_shipdate", pa.timestamp("us")),
                          ("o_orderdate", pa.timestamp("us"))]).empty_table()
    return out.sort_by([("l_orderkey", "ascending"),
                        ("l_linenumber", "ascending")])


def q_quality_filter(sf_dir: str, q: float = 0.75) -> pa.Table:
    """Quality pruning at a GLOBAL quantile (the FineWeb/Gopher-style
    "keep the best X%" curation step): keep documents whose token count is
    ≥ the corpus p75 — a threshold nobody knows until the whole corpus has
    been scanned.  Two-pass, both passes streaming:

    pass 1 — counting partials: per-block (n_tokens, count) pairs (the
    exact-quantiles pattern; cardinality bounded by the value range, not
    rows), driver cumulates and picks the value at zero-based rank
    ``floor(q*(n-1))`` of the sorted multiset (the convention
    ``events_value_quantiles`` pinned — SQL mirrors it with row_number);
    pass 2 — the threshold broadcasts in the task closure (one int) and a
    plain vectorized filter re-scans; only survivors leave the stage.

    At 100 TB pass 1 moves a few KB per block and pass 2 is the filtered
    scan you were going to do anyway; no shuffle at all."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"\S+").cast(pa.int64())
        g = pa.table({"n_tokens": n}).group_by("n_tokens").aggregate(
            [([], "count_all")])
        return pa.table({"n_tokens": g["n_tokens"],
                         "cnt": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    if not blocks:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    g = (pa.concat_tables(blocks).group_by("n_tokens")
         .aggregate([("cnt", "sum")]).sort_by([("n_tokens", "ascending")]))
    vals = np.asarray(g["n_tokens"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(np.asarray(g["cnt_sum"].to_numpy(zero_copy_only=False)))
    n = int(cum[-1])
    threshold = int(vals[np.searchsorted(cum, int(np.floor(q * (n - 1))) + 1)])

    def keep(t: pa.Table) -> pa.Table:
        nt = pc.count_substring_regex(t["text"], r"\S+").cast(pa.int64())
        out = pa.table({"doc_id": t["doc_id"], "n_tokens": nt})
        return out.filter(pc.greater_equal(nt, threshold))

    return _sorted_table(ds.map_batches(keep, batch_format="pyarrow"),
                         ["doc_id"])


def q_events_rollup(sf_dir: str) -> pa.Table:
    """Multi-level (ROLLUP) aggregate in ONE scan: per-(event_type, hour)
    event counts and integer-cent value sums, plus the per-type and grand
    totals — the reporting shape that would otherwise take three passes.
    Per-block partials aggregate at the FINEST level only ((type, hour) —
    bounded cardinality: types × hours); the driver combine then derives
    the coarser levels by re-summing the partials, so each input byte is
    read once and nothing wide shuffles.  Labels use 'ALL' sentinels in
    string columns (hour rendered as text for one label column), matching
    DuckDB's GROUP BY ROLLUP with coalesce — integer outputs keep the
    mirror hash-exact."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.strftime(pc.floor_temporal(t["ts"], unit="hour"),
                           format="%Y-%m-%d %H:00")
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        tt = pa.table({"event_type": t["event_type"], "hour": hour,
                       "cents": cents,
                       "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        g = tt.group_by(["event_type", "hour"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return pa.table({"event_type": g["event_type"], "hour": g["hour"],
                         "cents": g["cents_sum"], "n": g["n_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "hour": pa.array([], pa.string()),
                      "n_events": pa.array([], pa.int64()),
                      "sum_value_cents": pa.array([], pa.int64())})
    if not blocks:
        return empty
    fine = (pa.concat_tables(blocks).group_by(["event_type", "hour"])
            .aggregate([("cents", "sum"), ("n", "sum")]))
    levels = [fine]
    by_type = fine.group_by("event_type").aggregate(
        [("cents_sum", "sum"), ("n_sum", "sum")])
    levels.append(pa.table({
        "event_type": by_type["event_type"],
        "hour": pa.array(["ALL"] * by_type.num_rows),
        "cents_sum": by_type["cents_sum_sum"], "n_sum": by_type["n_sum_sum"]}))
    # sum() skips nulls but is NULL when every input is null — keep the
    # None instead of coercing to 0 so the grand total matches SQL
    levels.append(pa.table({
        "event_type": pa.array(["ALL"]), "hour": pa.array(["ALL"]),
        "cents_sum": pa.array([pc.sum(fine["cents_sum"]).as_py()],
                              pa.int64()),
        "n_sum": pa.array([pc.sum(fine["n_sum"]).as_py() or 0], pa.int64())}))
    out = pa.concat_tables([lv.select(["event_type", "hour", "n_sum",
                                       "cents_sum"]) for lv in levels])
    return pa.table({
        "event_type": out["event_type"], "hour": out["hour"],
        "n_events": out["n_sum"].cast(pa.int64()),
        "sum_value_cents": out["cents_sum"].cast(pa.int64()),
    }).sort_by([("event_type", "ascending"), ("hour", "ascending")])


def q_grouped_quantiles(sf_dir: str) -> pa.Table:
    """EXACT quantiles PER GROUP (p50/p90 of cent-quantized value per
    event_type) — the grouped generalization of
    ``q_events_value_quantiles``: per-block (event_type, cents, count)
    partials (cardinality bounded by types × value range, independent of
    rows), driver group-sums, then one vectorized rank pick per group on
    the sorted (type, cents) histogram.  Same rank convention
    (zero-based ``floor(q*(n-1))``) so the SQL mirror is row_number over
    a per-type partition."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "cents": g["cents"],
                         "cnt": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "p50_cents": pa.array([], pa.int64()),
                      "p90_cents": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by(["event_type", "cents"])
         .aggregate([("cnt", "sum")])
         .sort_by([("event_type", "ascending"), ("cents", "ascending")]))
    # null-safe: a NULL event_type is its own partition and null cents
    # sort LAST within each one (SQL row_number NULLS LAST while the
    # partition count still includes them) — a quantile rank landing in
    # the null tail yields NULL, exactly like the mirror
    new = _seg_new(g["event_type"])
    cents, cval = _int_col(g["cents"])
    counts = np.asarray(g["cnt_sum"].to_numpy(zero_copy_only=False)
                        ).astype(np.int64)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(new))
    ea = g["event_type"]
    if isinstance(ea, pa.ChunkedArray):
        ea = ea.combine_chunks()
    out_p50, out_p90 = [], []
    for s, e in zip(starts, ends):  # per TYPE (handful), not per row
        cum = np.cumsum(counts[s:e])
        n = int(cum[-1])
        row = []
        for q in (0.5, 0.9):
            idx = int(np.floor(q * (n - 1)))
            pos = s + int(np.searchsorted(cum, idx + 1))
            row.append(int(cents[pos]) if cval[pos] else None)
        out_p50.append(row[0])
        out_p90.append(row[1])
    return pa.table({"event_type": ea.take(pa.array(starts)),
                     "p50_cents": pa.array(out_p50, pa.int64()),
                     "p90_cents": pa.array(out_p90, pa.int64())}).sort_by(
        [("event_type", "ascending")])


def q_iqr_outliers_events(sf_dir: str) -> pa.Table:
    """IQR-fence outlier detection per group — the robust statistical
    data-quality check (Tukey fences): an event is an outlier when its
    cent value lies outside ``[q1 - 1.5·IQR, q3 + 1.5·IQR]`` of its
    event_type's EXACT discrete quartiles.  All arithmetic is INTEGER
    (the 1.5 factor becomes the doubled comparison ``2·c < 2·q1 - 3·IQR``)
    so the SQL mirror is bit-exact with no float fences.

    Two bounded scans, no row shuffle:
    - pass 1: per-block (type, cents, count) histogram partials
      (cardinality bounded by types × distinct cents, not rows), driver
      rank-pick of q1/q3 per type — the ``grouped_quantiles`` machinery
      and the same zero-based ``floor(q·(n-1))`` rank convention;
    - pass 2: the tiny per-type fence table is BROADCAST into a second
      map over events; each block counts outliers and sums their
      event_ids (a checksum the driver can hash) per type; the driver
      group-sums the partials.

    NULL semantics pinned: NULL values are never outliers (NULL
    comparisons), a quartile landing in the null tail makes the type's
    fences NULL → zero outliers, NULL event_type is its own group (the
    mirror joins with IS NOT DISTINCT FROM)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "cents": g["cents"],
                         "cnt": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "q1_cents": pa.array([], pa.int64()),
                      "q3_cents": pa.array([], pa.int64()),
                      "n_outliers": pa.array([], pa.int64()),
                      "outlier_id_sum": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by(["event_type", "cents"])
         .aggregate([("cnt", "sum")])
         .sort_by([("event_type", "ascending"), ("cents", "ascending")]))
    new = _seg_new(g["event_type"])
    cents, cval = _int_col(g["cents"])
    counts = np.asarray(g["cnt_sum"].to_numpy(zero_copy_only=False)
                        ).astype(np.int64)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(new))
    ea = g["event_type"]
    if isinstance(ea, pa.ChunkedArray):
        ea = ea.combine_chunks()
    types = ea.take(pa.array(starts))
    q1s, q3s = [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(counts[s:e])
        n = int(cum[-1])
        row = []
        for q in (0.25, 0.75):
            idx = int(np.floor(q * (n - 1)))
            pos = s + int(np.searchsorted(cum, idx + 1))
            row.append(int(cents[pos]) if cval[pos] else None)
        q1s.append(row[0])
        q3s.append(row[1])

    # pass 2: broadcast fences (a handful of types), count per block
    fence = {}  # type (or None) -> (lo2, hi2) in doubled cents
    for ty, q1, q3 in zip(types.to_pylist(), q1s, q3s):
        if q1 is not None and q3 is not None:
            iqr = q3 - q1
            fence[ty] = (2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr)

    def count_outliers(t: pa.Table) -> pa.Table:
        cents2 = pc.multiply(
            pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
            pa.scalar(2, pa.int64()))
        c2, c2v = _int_col(cents2)
        tcol = t["event_type"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        # fence lookup per DISTINCT type (a handful), gathered to rows by
        # dictionary codes — no per-row Python on the full-scan path
        enc = tcol.dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        dlo = np.array([fence.get(v, (0, 0))[0] for v in dvals], np.int64)
        dhi = np.array([fence.get(v, (0, 0))[1] for v in dvals], np.int64)
        dhas = np.array([v in fence for v in dvals], bool)
        codes = np.asarray(pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False)).astype(np.int64)
        null_has = None in fence
        null_lo, null_hi = fence.get(None, (0, 0))
        isnull = codes < 0
        safe = np.where(isnull, 0, codes)
        lo = np.where(isnull, null_lo, dlo[safe]) if len(dvals) else \
            np.full(len(codes), null_lo, np.int64)
        hi = np.where(isnull, null_hi, dhi[safe]) if len(dvals) else \
            np.full(len(codes), null_hi, np.int64)
        has = np.where(isnull, null_has, dhas[safe]) if len(dvals) else \
            np.full(len(codes), null_has, bool)
        out = has & c2v & ((c2 < lo) | (c2 > hi))
        ids, _ = _int_col(t["event_id"])
        gp = pa.table({
            "event_type": tcol,
            "n_outliers": pa.array(out.astype(np.int64)),
            "outlier_id_sum": pa.array(np.where(out, ids, 0)),
        }).group_by("event_type").aggregate([("n_outliers", "sum"),
                                             ("outlier_id_sum", "sum")])
        return pa.table({"event_type": gp["event_type"],
                         "n_outliers": gp["n_outliers_sum"],
                         "outlier_id_sum": gp["outlier_id_sum_sum"]})

    parts = [b for b in gather_tables(
        ds.map_batches(count_outliers, batch_format="pyarrow"))
        if b.num_rows]
    agg = (pa.concat_tables(parts).group_by("event_type")
           .aggregate([("n_outliers", "sum"), ("outlier_id_sum", "sum")]))
    qt = pa.table({"event_type": types,
                   "q1_cents": pa.array(q1s, pa.int64()),
                   "q3_cents": pa.array(q3s, pa.int64())})
    # small driver-side merge: every type present in pass 1 by
    # construction appears in pass 2's group output too (same scan)
    amap = {ty: (no, sm) for ty, no, sm in zip(
        agg["event_type"].to_pylist(),
        agg["n_outliers_sum"].to_pylist(),
        agg["outlier_id_sum_sum"].to_pylist())}
    nos = [amap.get(ty, (0, 0))[0] for ty in types.to_pylist()]
    sms = [amap.get(ty, (0, 0))[1] for ty in types.to_pylist()]
    return pa.table({
        "event_type": qt["event_type"],
        "q1_cents": qt["q1_cents"],
        "q3_cents": qt["q3_cents"],
        "n_outliers": pa.array(nos, pa.int64()),
        "outlier_id_sum": pa.array(sms, pa.int64()),
    }).sort_by([("event_type", "ascending")])


def q_infer_schema(sf_dir: str) -> pa.Table:
    """Schema INFERENCE from data (the type emitter's inverse,
    typegen.arrow_to_validation): base types come from the parquet file
    metadata (no data pages read for this half), nullability from the
    DATA via one pass of per-block null-count partials — columns that
    actually contain nulls become ``[T, 'null']`` unions.  Output is one
    (column, inferred) row per column with the inferred validation type
    JSON-encoded; the SQL mirror recomputes the nullability decision per
    column, so the data-driven half is hash-checked (the static half is
    pinned by the round-trip test: every row of the table validates
    against the inferred schema)."""
    import glob as _glob
    import json

    import pyarrow.parquet as pq

    from ..typegen import arrow_to_validation

    f = sorted(_glob.glob(os.path.join(sf_dir, "documents*.parquet")))[0]
    schema = pq.read_schema(f)
    cols = schema.names
    ds = _read(sf_dir, "documents", cols)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": pa.array(cols, pa.string()),
            "n_nulls": pa.array([t[c].null_count for c in cols], pa.int64()),
        })

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    nullable = set()
    if blocks:
        g = (pa.concat_tables(blocks).group_by("col_name")
             .aggregate([("n_nulls", "sum")]))
        nullable = {n for n, c in zip(g["col_name"].to_pylist(),
                                      g["n_nulls_sum"].to_pylist()) if c}
    inferred = arrow_to_validation(schema, nullable)
    return pa.table({
        "column": pa.array(list(inferred), pa.string()),
        "inferred": pa.array([json.dumps(v) for v in inferred.values()],
                             pa.string()),
    }).sort_by([("column", "ascending")])


def q_compact_documents(sf_dir: str) -> pa.Table:
    """Small-file compaction round trip (engine/compact.py): documents
    re-written as 16 small parts, compacted into ~4 target-size files
    (one Ray task per group, tmp+rename, manifest lineage), then the
    COMPACTED output is re-read distributed and aggregated — the oracle
    checks conservation (count / min / max / sum of doc_id) against the
    source table, so a dropped or duplicated row in either rewrite fails
    the hash."""
    import hashlib as _hashlib
    import shutil

    import ray.data

    from ..engine.compact import compact_parquet

    tag = _hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join("/tmp", "yaschva_compact", tag)
    small, out = os.path.join(base, "small"), os.path.join(base, "out")
    shutil.rmtree(base, ignore_errors=True)
    _read(sf_dir, "documents", ["doc_id"]).repartition(16).write_parquet(small)
    sz = sum(os.path.getsize(os.path.join(small, f))
             for f in os.listdir(small) if f.endswith(".parquet"))
    compact_parquet(small, out, target_bytes=max(sz // 4, 1))

    ds = ray.data.read_parquet(out)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "min_doc_id": pa.array([pc.min(ids).as_py()], pa.int64()),
            "max_doc_id": pa.array([pc.max(ids).as_py()], pa.int64()),
            "sum_doc_id": pa.array([pc.sum(ids).as_py()], pa.int64()),
        })

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    m = pa.concat_tables(blocks)
    return pa.table({
        "n_rows": pa.array([pc.sum(m["n_rows"]).as_py()], pa.int64()),
        "min_doc_id": pa.array([pc.min(m["min_doc_id"]).as_py()], pa.int64()),
        "max_doc_id": pa.array([pc.max(m["max_doc_id"]).as_py()], pa.int64()),
        "sum_doc_id": pa.array([pc.sum(m["sum_doc_id"]).as_py()], pa.int64()),
    })


def _seg_new(col) -> np.ndarray:
    """Null-safe new-segment flags over a SORTED key column of ANY type:
    null keys compare equal to each other (SQL PARTITION BY groups NULLs
    as one partition) instead of NaN-splitting into per-row segments, and
    the flags never meet a float NaN.  Works by dictionary codes —
    distinct values get distinct integer codes, nulls fill to -1."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    f = np.asarray(pc.fill_null(enc.indices, -1)
                   .to_numpy(zero_copy_only=False)).astype(np.int64)
    n = len(f)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = f[1:] != f[:-1]
    return new


def _int_col(col, fill: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(values, valid) for a nullable int64 Arrow column: values as int64
    with nulls replaced by ``fill`` (never a NaN-poisoned float array),
    valid as the original validity mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = np.asarray(pc.is_valid(col).to_numpy(zero_copy_only=False))
    vals = np.asarray(pc.fill_null(col, fill).to_numpy(zero_copy_only=False)
                      ).astype(np.int64)
    return vals, valid


def q_running_total_user(sf_dir: str) -> pa.Table:
    """Ordered per-key window aggregate (the classic ``SUM() OVER
    (PARTITION BY key ORDER BY ts)``): each user's events get a running
    cent total and a 1-based event index.  One keyed exchange on user_id
    co-locates each user's history (the as-of/session partitioning
    contract — a key's rows fit one bucket, hot keys logged by the
    exchange family); the per-bucket kernel is one vectorized sort +
    segment-reset cumulative sum for ALL users in the bucket.  Ties on
    ts break by event_id so both engines order identically."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "running_cents": pa.array([], pa.int64()),
                      "event_seq": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        # null-safe: null values contribute 0 to the sum (SQL SUM skips
        # NULLs) and the result is NULL only while a user's prefix has
        # seen no non-null value; null user_ids form one partition
        cents, cvalid = _int_col(
            pc.cast(pc.round(pc.multiply(s["value"], 100.0)), pa.int64()))
        new = _seg_new(s["user_id"])
        n = len(new)
        cum = np.cumsum(cents)
        # per-group running sum = global cumsum minus the prefix before
        # each group, forward-filled by group length (sign-safe — no
        # monotonicity assumption on the values)
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, n))
        run = cum - np.repeat(cum[starts] - cents[starts], glens)
        vnum = cvalid.astype(np.int64)
        cumv = np.cumsum(vnum)
        nval = cumv - np.repeat(cumv[starts] - vnum[starts], glens)
        seq = np.arange(n) - np.repeat(starts, glens) + 1
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "running_cents": pa.array(run, mask=nval == 0),
            "event_seq": pa.array(seq.astype(np.int64)),
        })

    parts = keyed_exchange(ds, "user_id", bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("event_seq", "ascending")])


_US_PER_DAY = 86_400_000_000


def q_user_islands(sf_dir: str) -> pa.Table:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    days (an island = dates with ≥1 event and no missing day inside).
    The classic sessionization-by-calendar pattern SQL solves with the
    ``day - row_number()`` anchor trick; here it is one keyed exchange:

    - map side: per-block DISTINCT (user_id, day) pairs — the partial is
      bounded by users × days, NOT by event rows, so the exchange moves
      a tiny fraction of the input (the same pre-aggregation contract as
      the uniqueness checks);
    - reduce side: re-distinct across blocks, one vectorized sort, then
      island boundaries = new-user flags OR day-diff ≠ 1, and per-island
      (start, end, n_days) via reduceat-style segment indexing.

    Day = floor(ts / 86400s) — numpy floor division is calendar-correct
    for PRE-EPOCH timestamps (matches ``CAST(ts AS DATE)``, which floors,
    unlike int truncation).  NULL ts rows are dropped on both sides (a
    NULL day can't be adjacent to anything); NULL user_ids form one
    partition (house PARTITION BY rule)."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    # midnight timestamps, not date32: DATE→pandas is dtype 'object'
    # (datetime.date) while the oracle's comes back datetime64 — the
    # arrow values hash equal but the dtype-kind gate would trip
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "island_start": pa.array([], pa.timestamp("us")),
                      "island_end": pa.array([], pa.timestamp("us")),
                      "n_days": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        if not t.num_rows:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int32())})
        us = np.asarray(pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False))
        day = (us // _US_PER_DAY).astype(np.int32)
        return pa.table({"user_id": t["user_id"],
                         "day": pa.array(day)}).group_by(
            ["user_id", "day"]).aggregate([])

    def bucket(t: pa.Table) -> pa.Table:
        t = t.group_by(["user_id", "day"]).aggregate([])
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("day", "ascending")])
        s = t.take(order)
        days = np.asarray(s["day"].to_numpy(zero_copy_only=False)
                          ).astype(np.int64)
        new = _seg_new(s["user_id"])
        n = len(new)
        brk = new.copy()
        if n > 1:
            brk[1:] |= days[1:] != days[:-1] + 1
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "user_id": s["user_id"].take(pa.array(starts)),
            "island_start": pa.array(
                days[starts] * _US_PER_DAY).cast(pa.timestamp("us")),
            "island_end": pa.array(
                days[ends] * _US_PER_DAY).cast(pa.timestamp("us")),
            "n_days": pa.array((ends - starts + 1).astype(np.int64)),
        })

    pre = ds.map_batches(partial, batch_format="pyarrow")
    parts = keyed_exchange(pre, "user_id", bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("island_start", "ascending")])


def q_rolling_active_users(sf_dir: str) -> pa.Table:
    """DAU + trailing-7-day active users per calendar day — the rolling
    COUNT(DISTINCT) that SQL can only express as a self-join (DISTINCT
    is not decomposable over a sliding frame).  Distributed without any
    per-day distinct shuffle:

    - map: per-block DISTINCT (user_id, day) partials (bounded by
      users × days);
    - exchange on user_id: all of a user's days are co-located, so the
      bucket's 7-way window explode — (user, day) contributes to window
      days day..day+6 — can be deduped LOCALLY per (user, window-day)
      and is then globally distinct; the bucket emits per-window-day
      COUNTS (user dropped), so reduce output is bounded by days × 7;
    - driver: sum the tiny per-day count partials; a day is reported iff
      some user was active ON it (window offset 0).

    NULL ts and NULL user_id rows are excluded on both sides (SQL
    COUNT(DISTINCT user_id) skips NULLs; a NULL day has no calendar
    neighbors)."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    empty = pa.table({"day": pa.array([], pa.int32()),
                      "dau": pa.array([], pa.int64()),
                      "wau7": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["ts"]),
                             pc.is_valid(t["user_id"])))
        if not t.num_rows:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int32())})
        us = np.asarray(pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False))
        day = (us // _US_PER_DAY).astype(np.int32)
        return pa.table({"user_id": t["user_id"],
                         "day": pa.array(day)}).group_by(
            ["user_id", "day"]).aggregate([])

    def bucket(t: pa.Table) -> pa.Table:
        t = t.group_by(["user_id", "day"]).aggregate([])
        if not t.num_rows:
            return empty
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False)
                         ).astype(np.int64)
        day = np.asarray(t["day"].to_numpy(zero_copy_only=False)
                         ).astype(np.int64)
        n = len(uid)
        k = np.tile(np.arange(7, dtype=np.int64), n)
        wday = np.repeat(day, 7) + k
        wuid = np.repeat(uid, 7)
        # dedup (user, window-day): a user active on days 3 AND 5 counts
        # once toward window-day 5..9's overlap — encode pairs, keep one
        # row per pair with the MINIMAL k (so a day the user was active
        # ON — k=0 — never loses its DAU flag to a neighbor's window)
        pair = wuid * np.int64(1 << 20) + (wday & ((1 << 20) - 1))
        # collision-free only if days fit 20 bits — epoch days do (<2^20
        # until year 4840); negative pre-epoch days mask to the same
        # 20-bit space injectively because & is bijective on [-2^19,2^19)
        order = np.lexsort((k, pair))
        ps, ks, wd = pair[order], k[order], wday[order]
        newp = np.ones(len(ps), bool)
        newp[1:] = ps[1:] != ps[:-1]
        first = np.nonzero(newp)[0]
        wday_u = wd[first]
        is_on_day = (ks[first] == 0).astype(np.int64)
        g = pa.table({"day": pa.array(wday_u.astype(np.int32)),
                      "contrib": pa.array(np.ones(len(first), np.int64)),
                      "on_day": pa.array(is_on_day)}).group_by(
            "day").aggregate([("contrib", "sum"), ("on_day", "sum")])
        return pa.table({"day": g["day"], "dau": g["on_day_sum"],
                         "wau7": g["contrib_sum"]})

    pre = ds.map_batches(partial, batch_format="pyarrow")
    parts = [p for p in keyed_exchange(pre, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return pa.table({"day": pa.array([], pa.timestamp("us")),
                         "dau": pa.array([], pa.int64()),
                         "wau7": pa.array([], pa.int64())})
    g = (pa.concat_tables(parts).group_by("day")
         .aggregate([("dau", "sum"), ("wau7", "sum")]))
    g = g.filter(pc.greater(g["dau_sum"], 0))  # report only ACTIVE days
    # midnight timestamps (not date32) so pandas dtype kinds match the
    # oracle's datetime64 — see q_user_islands
    day_us = pc.multiply(pc.cast(g["day"].combine_chunks(), pa.int64()),
                         pa.scalar(_US_PER_DAY, pa.int64()))
    return pa.table({
        "day": day_us.cast(pa.timestamp("us")),
        "dau": g["dau_sum"],
        "wau7": g["wau7_sum"],
    }).sort_by([("day", "ascending")])


_US_PER_HOUR = 3_600_000_000


def q_user_trailing_hour_sum(sf_dir: str) -> pa.Table:
    """Time-RANGE window frame — ``SUM(cents) OVER (PARTITION BY user
    ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT
    ROW)`` — completing the window family next to the ROWS frame
    (user_moving_sum) and the fixed grids (sliding/tumbling): each
    event's trailing-hour value total, peers (equal ts) INCLUDED in each
    other's frames per the SQL RANGE rule.

    Per-bucket kernel is a fully vectorized two-pointer: rows sort by
    (user, ts); a composite key ``user_rank · SPAN + (ts - min_ts + 1h)``
    makes ONE pair of np.searchsorted calls resolve every row's frame
    bounds at once with no per-user loop — the +1h shift keeps the lower
    target inside the user's span, so frames never leak across users
    (guarded: raises if users × span would overflow int64, with the
    bucket count as the remedy).  SQL NULL semantics pinned by probe:
    NULL-ts rows are each other's peers (their frame is exactly the
    user's NULL group), and a frame whose values are all NULL sums to
    NULL."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "trail_cents": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending")])
        s = t.take(order)
        n = s.num_rows
        cents, cvalid = _int_col(
            pc.cast(pc.round(pc.multiply(s["value"], 100.0)), pa.int64()))
        ts_us, ts_valid = _int_col(pc.cast(s["ts"], pa.int64()))
        new = _seg_new(s["user_id"])
        urank = np.cumsum(new) - 1  # 0-based user index within bucket
        # prefix sums over value cents and validity (frame sums/counts)
        csum = np.concatenate([[0], np.cumsum(np.where(cvalid, cents, 0))])
        vsum = np.concatenate([[0], np.cumsum(cvalid.astype(np.int64))])
        lo_idx = np.zeros(n, np.int64)
        hi_idx = np.zeros(n, np.int64)
        valid_rows = np.nonzero(ts_valid)[0]
        if len(valid_rows):
            tmin = int(ts_us[valid_rows].min())
            tmax = int(ts_us[valid_rows].max())
            span = (tmax - tmin) + 2 * _US_PER_HOUR + 2
            n_users = int(urank[-1]) + 1
            if n_users > (2**62) // span:
                raise ValueError(
                    "trailing-window composite key would overflow int64 "
                    f"(users={n_users}, span={span}); raise num_buckets")
            off = ts_us - tmin + _US_PER_HOUR
            key = urank * span + np.where(ts_valid, off, 0)
            kv = key[valid_rows]
            # sorted within user by construction; NULL-ts rows sit at the
            # END of each user segment (Arrow sorts nulls last), so the
            # valid-row subsequence is itself sorted
            lo_idx[valid_rows] = valid_rows[np.searchsorted(
                kv, key[valid_rows] - _US_PER_HOUR, side="left")]
            # exclusive upper bound = one past the LAST included valid
            # row (never the next valid row's index — that would swallow
            # interleaved null-ts rows into the prefix difference); the
            # row itself always matches, so hi_pos ≥ 1
            hi_pos = np.searchsorted(kv, key[valid_rows], side="right")
            hi_idx[valid_rows] = valid_rows[hi_pos - 1] + 1
        # NULL-ts peer groups: contiguous null tail per user segment
        null_rows = np.nonzero(~ts_valid)[0]
        if len(null_rows):
            # group nulls by user: boundaries where user changes
            nr_new = np.ones(len(null_rows), bool)
            nr_new[1:] = urank[null_rows][1:] != urank[null_rows][:-1]
            gstart = np.nonzero(nr_new)[0]
            glen = np.diff(np.append(gstart, len(null_rows)))
            first = null_rows[gstart]
            lo_idx[null_rows] = np.repeat(first, glen)
            hi_idx[null_rows] = np.repeat(first + glen, glen)
        fsum = csum[hi_idx] - csum[lo_idx]
        fval = vsum[hi_idx] - vsum[lo_idx]
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "trail_cents": pa.array(fsum, mask=fval == 0),
        })

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("event_id", "ascending")])


def q_conditional_rules_events(sf_dir: str) -> pa.Table:
    """Declarative CONDITIONAL business-rule validation — the cross-field
    constraint layer on top of the per-field schema checks (the north
    rule's 'constraint validation engine' applied to row-level business
    invariants).  Four rules in ONE vectorized scan, violations emitted
    as (rule, event_id) rows exactly like the schema violation queries:

      - value_above_cap:      value > 400.00 (NULL is not a violation)
      - purchase_below_min:   purchase events must have value ≥ 1.00
                              (NULL value on a purchase IS a violation —
                              conditional requiredness)
      - error_in_quiet_hours: 'error' events must not occur 00:00-05:59
                              UTC (hour by floor division — calendar-
                              correct pre-epoch)
      - missing_required:     ts and user_id are unconditionally required

    Stateless map_batches, no shuffle; output is the violation multiset
    ordered by (rule, event_id)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])
    empty = pa.table({"rule": pa.array([], pa.string()),
                      "event_id": pa.array([], pa.int64())})

    def check(t: pa.Table) -> pa.Table:
        val = t["value"]
        vvalid = np.asarray(pc.is_valid(val).to_numpy(zero_copy_only=False))
        v = np.asarray(pc.fill_null(val, 0.0).to_numpy(zero_copy_only=False))
        ty = t["event_type"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        is_purchase = np.asarray(pc.fill_null(
            pc.equal(ty, "purchase"), False).to_numpy(zero_copy_only=False))
        is_error = np.asarray(pc.fill_null(
            pc.equal(ty, "error"), False).to_numpy(zero_copy_only=False))
        tsv = np.asarray(pc.is_valid(t["ts"]).to_numpy(zero_copy_only=False))
        us = np.asarray(pc.fill_null(pc.cast(t["ts"], pa.int64()), 0)
                        .to_numpy(zero_copy_only=False)).astype(np.int64)
        hour = (us // _US_PER_HOUR) % 24  # floor + nonneg mod: pre-epoch ok
        uvalid = np.asarray(pc.is_valid(t["user_id"]).to_numpy(
            zero_copy_only=False))
        masks = (
            ("error_in_quiet_hours", is_error & tsv & (hour < 6)),
            ("missing_required", ~tsv | ~uvalid),
            ("purchase_below_min", is_purchase & (~vvalid | (v < 1.0))),
            ("value_above_cap", vvalid & (v > 400.0)),
        )
        ids = t["event_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        outs = []
        for rule, m in masks:
            ix = np.nonzero(m)[0]
            if len(ix):
                outs.append(pa.table({
                    "rule": pa.array([rule] * len(ix), pa.string()),
                    "event_id": ids.take(pa.array(ix))}))
        return pa.concat_tables(outs) if outs else empty

    parts = [b for b in gather_tables(
        ds.map_batches(check, batch_format="pyarrow")) if b.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("rule", "ascending"), ("event_id", "ascending")])


def q_interp_quantiles_events(sf_dir: str) -> pa.Table:
    """PERCENTILE_CONT as an EXACT RATIONAL — the interpolated-quantile
    convention (SQL standard PERCENTILE_CONT / numpy 'linear'), which a
    float pipeline can't hash-match, made bit-exact by returning integer
    NUMERATORS over fixed denominators: for p = a/b at position
    (n-1)·a/b the result is (lo·(b-rem) + hi·rem)/b with
    rem = ((n-1)·a) mod b.  p50 is num/2, p90 is num/10.

    Distributed exactly like the discrete quantiles: per-block (type,
    cents, count) histogram partials over NON-NULL values only
    (PERCENTILE_CONT ignores NULLs — a different convention from the
    row_number NULLS LAST rank family, deliberately both represented),
    driver merge, two vectorized rank picks per type."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "cents": g["cents"],
                         "cnt": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "p50_num2": pa.array([], pa.int64()),
                      "p90_num10": pa.array([], pa.int64()),
                      "n_values": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by(["event_type", "cents"])
         .aggregate([("cnt", "sum")])
         .sort_by([("event_type", "ascending"), ("cents", "ascending")]))
    new = _seg_new(g["event_type"])
    cents = np.asarray(g["cents"].to_numpy(zero_copy_only=False)
                       ).astype(np.int64)
    counts = np.asarray(g["cnt_sum"].to_numpy(zero_copy_only=False)
                        ).astype(np.int64)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(new))
    ea = g["event_type"]
    if isinstance(ea, pa.ChunkedArray):
        ea = ea.combine_chunks()
    p50s, p90s, ns = [], [], []
    for s, e in zip(starts, ends):  # per TYPE (a handful)
        cum = np.cumsum(counts[s:e])
        n = int(cum[-1])
        row = []
        for a, b in ((1, 2), (9, 10)):
            t_ = (n - 1) * a
            k, rem = divmod(t_, b)
            lo = int(cents[s + int(np.searchsorted(cum, k + 1))])
            hi = int(cents[s + int(np.searchsorted(cum, k + 2))]) \
                if rem else 0
            row.append(lo * (b - rem) + hi * rem)
        p50s.append(row[0])
        p90s.append(row[1])
        ns.append(n)
    return pa.table({"event_type": ea.take(pa.array(starts)),
                     "p50_num2": pa.array(p50s, pa.int64()),
                     "p90_num10": pa.array(p90s, pa.int64()),
                     "n_values": pa.array(ns, pa.int64())}).sort_by(
        [("event_type", "ascending")])


def q_benford_lineitem(sf_dir: str) -> pa.Table:
    """Benford's-law leading-digit profile — the fraud/synthetic-data
    quality check: observed counts of the first significant digit of
    |cents| for two lineitem measures, one scan, per-block counting
    partials (bounded at 2 columns × 9 digits) + a driver sum.  The
    digit is extracted by STRING slicing on the integer cents (no float
    log10 — exact at every power-of-ten boundary, where ``10^k · (1-ε)``
    float tricks misclassify).  Zero and NULL values are excluded
    (Benford is defined on nonzero magnitudes)."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for col in ("l_extendedprice", "l_quantity"):
            cents = pc.cast(pc.round(pc.multiply(t[col], 100.0)), pa.int64())
            cents = pc.abs(cents)
            mask = pc.and_(pc.is_valid(cents), pc.not_equal(cents, 0))
            nz = pc.filter(cents, mask)
            digit = pc.cast(pc.utf8_slice_codeunits(
                pc.cast(nz, pa.string()), 0, 1), pa.int64())
            g = pa.table({"digit": digit}).group_by("digit").aggregate(
                [([], "count_all")])
            outs.append(pa.table({
                "column": pa.array([col] * g.num_rows, pa.string()),
                "digit": g["digit"],
                "n": g["count_all"].cast(pa.int64())}))
        return pa.concat_tables(outs)

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    if not blocks:
        return pa.table({"column": pa.array([], pa.string()),
                         "digit": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    g = (pa.concat_tables(blocks).group_by(["column", "digit"])
         .aggregate([("n", "sum")]))
    return pa.table({"column": g["column"], "digit": g["digit"],
                     "n": g["n_sum"]}).sort_by(
        [("column", "ascending"), ("digit", "ascending")])


def q_user_type_history(sf_dir: str) -> pa.Table:
    """SCD2-style run-length history: consecutive same-type events per
    user collapse into validity intervals ``[start_ts, end_ts)`` where
    end_ts is the NEXT run's start (NULL on the open last run) — the
    change-tracking compression every slowly-changing-dimension build
    needs.  One keyed exchange on user_id; the bucket kernel is one
    vectorized sort + null-safe consecutive-type compare (dictionary
    codes, so NULL type == NULL type continues a run) + segment
    boundary indexing for ALL users at once.

    start_ts is the run's FIRST row's ts under (ts NULLS LAST,
    event_id) order — equal to SQL's MIN(ts) per run because nulls sort
    last; seg is the 1-based run index per user so both engines order
    output identically even when consecutive runs tie on start_ts."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "seg": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "start_ts": pa.array([], pa.timestamp("us")),
                      "end_ts": pa.array([], pa.timestamp("us")),
                      "n_events": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        new_user = _seg_new(s["user_id"])
        types = s["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        tcodes = np.asarray(pc.fill_null(
            types.dictionary_encode().indices, -1
        ).to_numpy(zero_copy_only=False)).astype(np.int64)
        n = len(tcodes)
        chg = new_user.copy()
        if n > 1:
            chg[1:] |= tcodes[1:] != tcodes[:-1]
        starts = np.nonzero(chg)[0]
        runlen = np.diff(np.append(starts, n))
        # 1-based run index per user: cumulative runs minus the count
        # before each user's first run
        ustarts = np.nonzero(new_user[starts])[0]  # runs starting a user
        runs_before = np.zeros(len(starts), np.int64)
        seg = np.arange(len(starts), dtype=np.int64)
        runs_before = np.repeat(seg[ustarts],
                                np.diff(np.append(ustarts, len(starts))))
        seg = seg - runs_before + 1
        ts_col = s["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        start_ts = ts_col.take(pa.array(starts))
        # end_ts = next run's start_ts within the same user
        same_user_next = np.zeros(len(starts), bool)
        if len(starts) > 1:
            same_user_next[:-1] = ~new_user[starts[1:]]
        nxt = np.roll(starts, -1)
        end_idx = np.where(same_user_next, nxt, 0)
        end_ts = pc.if_else(pa.array(same_user_next),
                            ts_col.take(pa.array(end_idx)),
                            pa.scalar(None, ts_col.type))
        return pa.table({
            "user_id": s["user_id"].take(pa.array(starts)),
            "seg": pa.array(seg),
            "event_type": types.take(pa.array(starts)),
            "start_ts": start_ts,
            "end_ts": end_ts,
            "n_events": pa.array(runlen.astype(np.int64)),
        })

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("seg", "ascending")])


def q_weighted_median_lineitem(sf_dir: str) -> pa.Table:
    """Weighted median per group — l_extendedprice cents weighted by
    integer l_quantity, per l_returnflag: the LOWER weighted median
    (smallest value whose cumulative weight reaches half the total,
    ``2·cum ≥ tot`` in pure int64).  Same counting-exchange shape as the
    exact quantiles: per-block (flag, cents, Σweight) partials bounded
    by flags × distinct cents, driver merge + one cumsum rank pick per
    flag.  NULL price or quantity rows are excluded on both sides."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice",
                                    "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t["l_extendedprice"]),
                       pc.is_valid(t["l_quantity"]))
        t = t.filter(mask)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        w = pc.cast(t["l_quantity"], pa.int64())
        g = pa.table({"flag": t["l_returnflag"], "cents": cents,
                      "w": w}).group_by(["flag", "cents"]).aggregate(
            [("w", "sum")])
        return pa.table({"flag": g["flag"], "cents": g["cents"],
                         "w": g["w_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"l_returnflag": pa.array([], pa.string()),
                      "wmedian_cents": pa.array([], pa.int64()),
                      "total_weight": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by(["flag", "cents"])
         .aggregate([("w", "sum")])
         .sort_by([("flag", "ascending"), ("cents", "ascending")]))
    new = _seg_new(g["flag"])
    cents = np.asarray(g["cents"].to_numpy(zero_copy_only=False)
                       ).astype(np.int64)
    w = np.asarray(g["w_sum"].to_numpy(zero_copy_only=False)
                   ).astype(np.int64)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(new))
    fa = g["flag"]
    if isinstance(fa, pa.ChunkedArray):
        fa = fa.combine_chunks()
    meds, tots = [], []
    for s, e in zip(starts, ends):  # per FLAG (a handful)
        cum = np.cumsum(w[s:e])
        tot = int(cum[-1])
        pos = int(np.searchsorted(2 * cum, tot))
        meds.append(int(cents[s + pos]))
        tots.append(tot)
    return pa.table({"l_returnflag": fa.take(pa.array(starts)),
                     "wmedian_cents": pa.array(meds, pa.int64()),
                     "total_weight": pa.array(tots, pa.int64())}).sort_by(
        [("l_returnflag", "ascending")])


def q_mode_event_value(sf_dir: str) -> pa.Table:
    """Grouped MODE with a deterministic tie-break (highest count, then
    smallest value): the most frequent cent value per event_type.  Pure
    counting partials — per-block (type, cents, count), cardinality
    bounded by types × distinct cents, never by rows — then one small
    driver merge + vectorized per-segment argmax (sort by (type, -count,
    cents), keep each segment's first row).  NULL values are excluded
    (SQL's mode/count convention); NULL event_type is its own group."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"], "cents": g["cents"],
                         "cnt": g["count_all"].cast(pa.int64())})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "mode_cents": pa.array([], pa.int64()),
                      "mode_count": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = pa.concat_tables(blocks).group_by(["event_type", "cents"]) \
        .aggregate([("cnt", "sum")])
    order = pc.sort_indices(g, sort_keys=[("event_type", "ascending"),
                                          ("cnt_sum", "descending"),
                                          ("cents", "ascending")])
    s = g.take(order)
    starts = np.nonzero(_seg_new(s["event_type"]))[0]
    take = pa.array(starts)
    return pa.table({
        "event_type": s["event_type"].take(take),
        "mode_cents": s["cents"].take(take),
        "mode_count": s["cnt_sum"].take(take),
    }).sort_by([("event_type", "ascending")])


def q_user_event_paths(sf_dir: str) -> pa.Table:
    """ORDERED grouped string aggregation — SQL's ``STRING_AGG(x, sep
    ORDER BY ...)``, the one aggregate whose result depends on intra-group
    ORDER, so it cannot be a commutative partial/final pair: each user's
    event types joined with '>' in (ts, event_id) order.  One keyed
    exchange on user_id co-locates each user's history; the per-bucket
    kernel is fully vectorized — one sort, per-group offsets from
    segment-start indexing, and ONE `ListArray.from_arrays` +
    `pc.binary_join` call that concatenates every group in the bucket
    simultaneously (no per-group Python joins).

    SQL semantics pinned: NULL event_types are SKIPPED (they contribute
    neither a step nor a separator), a user whose types are ALL null gets
    a NULL path (string_agg over zero values), NULL ts sorts LAST
    (DuckDB's default null order), and NULL user_ids form one group."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "path": pa.array([], pa.string()),
                      "n_steps": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        types = s["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        valid = np.asarray(pc.is_valid(types).to_numpy(
            zero_copy_only=False))
        new = _seg_new(s["user_id"])
        starts = np.nonzero(new)[0]
        # per-group count of non-null types (order preserved under the
        # stable filter below)
        nval = np.add.reduceat(valid.astype(np.int64), starts) \
            if len(starts) else np.array([], np.int64)
        offsets = np.concatenate([[0], np.cumsum(nval)]).astype(np.int32)
        vals = types.filter(pa.array(valid))
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals)
        joined = pc.binary_join(lists, ">")
        # string_agg over zero values is NULL, not ''
        path = pc.if_else(pa.array(nval > 0), joined,
                          pa.scalar(None, pa.string()))
        return pa.table({
            "user_id": s["user_id"].take(pa.array(starts)),
            "path": path,
            "n_steps": pa.array(nval),
        })

    parts = keyed_exchange(ds, "user_id", bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending")])


def q_user_event_gaps(sf_dir: str) -> pa.Table:
    """Ordered per-key LAG (the window family's other half next to
    ``running_total_user``'s SUM OVER): for each user's event stream,
    the microsecond gap since the PREVIOUS event and the cent delta vs
    the previous value — NULL on each user's first event, exactly SQL's
    ``lag() OVER (PARTITION BY user_id ORDER BY ts, event_id)``.  Same
    plan as the running total: one keyed exchange on user_id, then one
    vectorized sort + shifted-diff per bucket (group starts masked to
    null); gaps are exact int64 because ts is timestamp[us]."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "gap_us": pa.array([], pa.int64()),
                      "delta_cents": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        # null-safe: lag arithmetic with a NULL on either side is NULL
        # (the oracle's epoch_us/round propagate NULL through the diff);
        # null user_ids form one partition
        ts_us, tvalid = _int_col(pc.cast(s["ts"], pa.int64()))
        cents, cvalid = _int_col(
            pc.cast(pc.round(pc.multiply(s["value"], 100.0)), pa.int64()))
        first = _seg_new(s["user_id"])
        n = len(first)
        gap = np.zeros(n, dtype=np.int64)
        delta = np.zeros(n, dtype=np.int64)
        gmask = first.copy()
        dmask = first.copy()
        if n > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
            delta[1:] = cents[1:] - cents[:-1]
            gmask[1:] |= ~tvalid[1:] | ~tvalid[:-1]
            dmask[1:] |= ~cvalid[1:] | ~cvalid[:-1]
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "gap_us": pa.array(gap, mask=gmask),
            "delta_cents": pa.array(delta, mask=dmask),
        })

    parts = keyed_exchange(ds, "user_id", bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")])


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str) -> pa.Table:
    """PIVOT: per-hour event counts spread into one column per event type
    (the reporting reshape).  The column set is the FIXED domain
    ``_PIVOT_TYPES`` — shared verbatim with the SQL mirror, because a
    data-driven column set would make the output schema nondeterministic
    (the same reason SQL PIVOT needs IN (...)).  One scan of per-block
    (hour, type) partials (bounded by hours × types), driver combine +
    vectorized scatter into the wide shape; unseen (hour, type) cells are
    0, rows with types outside the domain are dropped on both sides."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.strftime(pc.floor_temporal(t["ts"], unit="hour"),
                           format="%Y-%m-%d %H:00")
        tt = pa.table({"hour": hour, "event_type": t["event_type"],
                       "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        g = tt.group_by(["hour", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"hour": g["hour"], "event_type": g["event_type"],
                         "n": g["n_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"hour": pa.array([], pa.string()),
                      **{f"n_{t}": pa.array([], pa.int64())
                         for t in _PIVOT_TYPES}})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by(["hour", "event_type"])
         .aggregate([("n", "sum")]))
    hours = np.asarray(g["hour"].to_numpy(zero_copy_only=False))
    types = np.asarray(g["event_type"].to_numpy(zero_copy_only=False))
    counts = np.asarray(g["n_sum"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
    in_domain = np.isin(types, _PIVOT_TYPES)
    hours, types, counts = hours[in_domain], types[in_domain], \
        counts[in_domain]
    # a null-ts row with an in-domain type keeps its NULL hour group
    # (SQL GROUP BY keeps the NULL group); the sentinel never collides
    # with strftime output and the final arrow sort puts NULL last
    _NULLH = "\x00null-hour"
    hkey = np.array([h if h is not None else _NULLH for h in hours],
                    dtype=object)
    uh, hidx = np.unique(hkey, return_inverse=True)
    tpos = {t: i for i, t in enumerate(_PIVOT_TYPES)}
    wide = np.zeros((len(uh), len(_PIVOT_TYPES)), dtype=np.int64)
    wide[hidx, [tpos[t] for t in types]] = counts
    return pa.table({
        "hour": pa.array([None if h == _NULLH else h for h in uh],
                         pa.string()),
        **{f"n_{t}": pa.array(wide[:, i])
           for i, t in enumerate(_PIVOT_TYPES)},
    }).sort_by([("hour", "ascending")])


def q_events_type_stats_join(sf_dir: str, max_key_rows: int = 2_000) -> pa.Table:
    """Enrich every event with its type's global stats via a DELIBERATELY
    skewed big-big join: the key is event_type (5 values), so EVERY key
    is hot and ``hash_join(skew_split=True)`` grid-splits each across
    reduce tasks (left rows spread over S_l cells, the 5-row right side
    replicated per cell) — the driver-visible exercise of the equi-join
    skew mitigation.  The right side is the per-type exact aggregate
    (bounded-cardinality partials, the pricing_summary pattern)."""
    import ray.data

    from ..engine.joins import hash_join

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = (pa.table({"et": t["event_type"], "cents": cents,
                       "n": pa.array(np.ones(t.num_rows, np.int64))})
             .group_by("et").aggregate([("cents", "sum"), ("n", "sum")]))
        return pa.table({"et": g["et"], "cents": g["cents_sum"],
                         "n": g["n_sum"]})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "type_n": pa.array([], pa.int64()),
                      "type_sum_cents": pa.array([], pa.int64())})
    if not blocks:
        return empty
    g = (pa.concat_tables(blocks).group_by("et")
         .aggregate([("cents", "sum"), ("n", "sum")]))
    right = pa.table({"et": g["et"],
                      "type_sum_cents": g["cents_sum"].cast(pa.int64()),
                      "type_n": g["n_sum"].cast(pa.int64())})
    out = hash_join(_read(sf_dir, "events", ["event_id", "event_type"]),
                    ray.data.from_arrow(right),
                    left_key="event_type", right_key="et",
                    skew_split=True, max_key_rows=max_key_rows)
    if not out.num_rows:
        return empty
    return out.select(["event_id", "event_type", "type_n",
                       "type_sum_cents"]).combine_chunks() \
        .sort_by([("event_id", "ascending")])


def q_lineitem_part_left_join(sf_dir: str) -> pa.Table:
    """LEFT OUTER big-big join (the other half of the shuffled-join
    family): every lineitem row survives; rows whose l_partkey has no
    part (the dangling keys ``dangling_lineitem_parts`` reports) carry
    typed nulls from the right.  Same two-sided hash exchange as the
    inner join — only the per-bucket Arrow join type changes.  Sorted by
    the (l_orderkey, l_linenumber) primary key so the row order (and the
    driver hash) is total."""
    from ..engine.joins import hash_join

    left = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_partkey"])
    right = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"])
    out = hash_join(left, right, left_key="l_partkey",
                    right_key="p_partkey", how="left outer")
    if not out.num_rows:
        return pa.schema([("l_orderkey", pa.int64()),
                          ("l_linenumber", pa.int64()),
                          ("l_partkey", pa.int64()),
                          ("p_name", pa.string()),
                          ("p_size", pa.int32())]).empty_table()
    return out.select(["l_orderkey", "l_linenumber", "l_partkey",
                       "p_name", "p_size"]).sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending"),
         ("l_partkey", "ascending")])


def q_part_lineitem_full_join(sf_dir: str) -> pa.Table:
    """FULL OUTER big-big join, checked by conservation classes: the
    joined row count plus how many rows are matched / left-only (part
    never ordered) / right-only (dangling l_partkey).  Aggregating inside
    the query keeps the sweep payload one row while still requiring the
    outer join itself to be exactly right on both dangling sides."""
    from ..engine.joins import hash_join

    left = _read(sf_dir, "part", ["p_partkey", "p_size"])
    right = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_linenumber", "l_partkey"])
    out = hash_join(left, right, left_key="p_partkey",
                    right_key="l_partkey", how="full outer")
    # Arrow COALESCES the key column in a full outer join (right-only rows
    # carry their key in p_partkey), so side-detection uses each side's
    # non-key columns — non-null in the sources by construction
    lnull = (pc.is_null(out["p_size"]) if out.num_rows
             else pa.array([], pa.bool_()))
    rnull = (pc.is_null(out["l_orderkey"]) if out.num_rows
             else pa.array([], pa.bool_()))
    n = out.num_rows
    n_left_only = int(pc.sum(pc.cast(rnull, pa.int64())).as_py() or 0)
    n_right_only = int(pc.sum(pc.cast(lnull, pa.int64())).as_py() or 0)
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_matched": pa.array([n - n_left_only - n_right_only], pa.int64()),
        "n_left_only": pa.array([n_left_only], pa.int64()),
        "n_right_only": pa.array([n_right_only], pa.int64()),
    })


def q_tdigest_quantiles_events(sf_dir: str) -> pa.Table:
    """Quantiles via t-digest (the north star's named sketch): per-block
    digests serialize as (mean, weight) centroid tables — a few hundred
    rows per block regardless of block size — and the driver folds them
    into one digest.  Rows-only (the k1-scale clustering is partition-
    DEPENDENT, unlike LogHistogram's fixed bins — which is why the exact
    and log-histogram paths exist for hash-checkable quantiles); accuracy
    vs the exact counting quantiles is pinned in tests."""
    from ..engine.sketches import TDigest

    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        d = TDigest()
        d.add(np.asarray(t["value"].to_numpy(zero_copy_only=False),
                         dtype=np.float64))
        d._compress(force=True)
        return pa.table({"mean": pa.array(d.means),
                         "weight": pa.array(d.weights)})

    blocks = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    d = TDigest()
    if blocks:
        cent = pa.concat_tables(blocks)
        d.means = np.asarray(cent["mean"].to_numpy(zero_copy_only=False))
        d.weights = np.asarray(cent["weight"].to_numpy(zero_copy_only=False))
        d._compress(force=True)
    return pa.table({
        "p50": pa.array([d.quantile(0.5)], pa.float64()),
        "p90": pa.array([d.quantile(0.9)], pa.float64()),
        "p99": pa.array([d.quantile(0.99)], pa.float64()),
        "n_centroids": pa.array([len(d.means)], pa.int64()),
    })


def q_token_count_orc(sf_dir: str) -> pa.Table:
    """``q_token_count_documents`` through the ORC source/sink path
    (documents round-trip parquet → ORC via the per-block sink → the
    per-file-task reader with column pruning).  Same oracle SQL."""
    from ..sources import read_docs

    files = _table_as(sf_dir, "documents", ["doc_id", "text"], "orc")
    ds = read_docs(files, columns=["doc_id", "text"])
    return _sorted_table(ds.map_batches(_count_tokens_batch,
                                        batch_format="pyarrow"), ["doc_id"])


def q_token_count_feather(sf_dir: str) -> pa.Table:
    """``q_token_count_documents`` through the Arrow-IPC (feather) path —
    same round trip and oracle as the ORC variant."""
    from ..sources import read_docs

    files = _table_as(sf_dir, "documents", ["doc_id", "text"], "feather")
    ds = read_docs(files, columns=["doc_id", "text"])
    return _sorted_table(ds.map_batches(_count_tokens_batch,
                                        batch_format="pyarrow"), ["doc_id"])


def q_user_funnel(sf_dir: str) -> pa.Table:
    """Ordered funnel analysis (view → click → purchase): for each user,
    the timestamp of their FIRST view, the first click STRICTLY AFTER
    that view, and the first purchase strictly after that click — the
    classic product-analytics pattern match no single SQL aggregate
    expresses.  Later stages depend on the user's GLOBAL earlier-stage
    minimum, so per-block partials can't compose; one keyed exchange on
    user_id co-locates each user's history (the window family's
    partitioning contract — hot keys logged by the exchange), then the
    per-bucket kernel is whole-batch numpy: one sort, per-stage masked
    ``minimum.reduceat`` with an INT64-max sentinel, each stage's
    threshold broadcast by ``np.repeat``.  A missing stage nulls every
    later stage for free (nothing beats the sentinel).  Timestamps
    return as int64 microseconds so both engines hash the same bytes."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "view_us": pa.array([], pa.int64()),
                      "click_us": pa.array([], pa.int64()),
                      "purchase_us": pa.array([], pa.int64())})
    SENT = np.iinfo(np.int64).max

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending")])
        s = t.take(order)
        # null-safe: null timestamps fill to the SENTINEL so they can
        # never win a stage minimum (the oracle's min() skips NULLs) yet
        # the row still marks its user present; null user_ids form one
        # partition (SQL DISTINCT/GROUP BY treat NULLs as one group)
        ts_us, _ = _int_col(pc.cast(s["ts"], pa.int64()), fill=SENT)
        new = _seg_new(s["user_id"])
        n = len(new)
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, n))

        def stage(kind: str, after: np.ndarray | None) -> np.ndarray:
            mask = np.asarray(pc.fill_null(
                pc.equal(s["event_type"], kind), False)
                .to_numpy(zero_copy_only=False))
            if after is not None:
                mask = mask & (ts_us > np.repeat(after, glens))
            return np.minimum.reduceat(np.where(mask, ts_us, SENT), starts)

        t_view = stage("view", None)
        t_click = stage("click", t_view)
        t_purchase = stage("purchase", t_click)
        uid = s["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        # a NULL user row appears in the output (DISTINCT user_id keeps
        # it) but its stage joins never match — SQL's USING(user_id)
        # equality is false for NULL = NULL — so all stages are NULL
        uvalid = np.asarray(pc.is_valid(uid).to_numpy(zero_copy_only=False))
        nullseg = ~uvalid[starts]
        if nullseg.any():
            t_view[nullseg] = SENT
            t_click[nullseg] = SENT
            t_purchase[nullseg] = SENT
        return pa.table({
            "user_id": uid.take(pa.array(starts)),
            "view_us": pa.array(t_view, mask=t_view == SENT),
            "click_us": pa.array(t_click, mask=t_click == SENT),
            "purchase_us": pa.array(t_purchase, mask=t_purchase == SENT),
        })

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending")])


def q_user_hourly_locf(sf_dir: str) -> pa.Table:
    """Time-series regularization with gap fill: each user's event values
    resampled onto an hourly grid spanning THEIR OWN [first, last]
    observed hour, missing hours filled by last observation carried
    forward (LOCF) — the step that turns irregular event streams into
    aligned series.  Observations collapse to per-(user, hour) max cents
    first (deterministic under ts ties on both engines), so the LOCF is
    a pure searchsorted against each user's sorted observation hours —
    no per-row loop, no per-grid-cell join.  Output size is bounded by
    keys × (time-range / step), NOT by input rows: the grid is generated
    inside the bucket task and streams out per part, so a wide time
    range needs a coarser step, never more driver memory.  Same keyed
    exchange contract as the window family."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "hour_us": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64())})
    HOUR = 3_600_000_000  # microseconds

    def bucket(t: pa.Table) -> pa.Table:
        # null-ts rows can never join a grid hour (the oracle's m rows
        # with NULL h never match the grid), so drop them up front;
        # date_trunc('hour') FLOORS toward -inf, so the hour must use
        # floor division (pc.divide truncates toward zero — wrong for
        # pre-epoch timestamps)
        t = t.filter(pc.is_valid(t["ts"]))
        if t.num_rows == 0:
            return empty
        cents_col = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                            pa.int64())
        ts_us = np.asarray(pc.cast(t["ts"], pa.int64())
                           .to_numpy(zero_copy_only=False)).astype(np.int64)
        obs = pa.table({"user_id": t["user_id"],
                        "h": pa.array(np.floor_divide(ts_us, HOUR) * HOUR),
                        "cents": cents_col})
        # per-(user, hour) max cents — Arrow group_by is bucket-local
        agg = (obs.group_by(["user_id", "h"])
                  .aggregate([("cents", "max")])
                  .sort_by([("user_id", "ascending"), ("h", "ascending")]))
        hours = np.asarray(agg["h"].to_numpy(zero_copy_only=False))
        vals = agg["cents_max"]  # may hold nulls (all-null hours)
        n = agg.num_rows
        if n == 0:
            return empty
        # null user_ids form ONE partition (SQL GROUP BY/PARTITION BY)
        new = _seg_new(agg["user_id"])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        # grid sizes per user: (last − first)/HOUR + 1
        sizes = ((hours[ends - 1] - hours[starts]) // HOUR + 1).astype(
            np.int64)
        total = int(sizes.sum())
        ua = agg["user_id"]
        if isinstance(ua, pa.ChunkedArray):
            ua = ua.combine_chunks()
        g_user = ua.take(pa.array(np.repeat(starts, sizes)))
        # per-user arange: global arange minus each segment's start offset
        offs = np.zeros(len(sizes), dtype=np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        g_idx = np.arange(total, dtype=np.int64) - np.repeat(offs, sizes)
        g_hour = np.repeat(hours[starts], sizes) + g_idx * HOUR
        # LOCF source per grid cell: scatter each observation's global
        # index onto its own grid cell, then maximum.accumulate — every
        # user's FIRST grid cell is that user's first observation (the
        # grid starts at it), and observation indices increase in
        # (user, hour) order, so the fill can never carry a previous
        # user's index across a boundary
        glens_obs = ends - starts
        obs_pos = (np.repeat(offs, glens_obs)
                   + (hours - np.repeat(hours[starts], glens_obs)) // HOUR)
        g_src = np.full(total, -1, dtype=np.int64)
        g_src[obs_pos] = np.arange(n)
        g_src = np.maximum.accumulate(g_src)
        # a grid cell can map to an all-null observation hour whose LOCF
        # should come from an earlier non-null hour: forward-fill the
        # OBSERVATION values per user first (null obs inherit the
        # previous non-null obs in the same user segment)
        valid = np.asarray(pc.is_valid(vals).to_numpy(zero_copy_only=False))
        vnum = np.asarray(pc.fill_null(vals, 0).to_numpy(
            zero_copy_only=False))
        idx = np.where(valid, np.arange(n), -1)
        idx = np.maximum.accumulate(idx)
        # reset carries that crossed a user boundary
        idx = np.where(idx >= np.repeat(starts, glens_obs), idx, -1)
        filled_valid = idx >= 0
        filled = np.where(filled_valid, vnum[np.maximum(idx, 0)], 0)
        out_valid = filled_valid[g_src]
        out_vals = filled[g_src]
        # the NULL-user grid exists (GROUP BY keeps the NULL group) but
        # its observation join never matches — SQL's m.user_id =
        # grid.user_id is false for NULL = NULL — so its cents stay NULL
        out_valid &= np.asarray(
            pc.is_valid(g_user).to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": g_user,
            "hour_us": pa.array(g_hour),
            "cents": pa.array(out_vals, mask=~out_valid),
        })

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("hour_us", "ascending")])


def q_returned_revenue_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """TPC-H-Q10-style multi-stage pipeline — the composition proof that
    the engine's join / exchange / top-k primitives CHAIN: top-k
    customers by revenue from RETURNED items ordered in 1996.  Stage
    plan, each step sized for 100 TB:

    1. both scans filter + project at the read (returnflag = 'R';
       orderdate in 1996) — only surviving columns cross the cluster;
    2. big-big hash join lineitem⋈orders on orderkey with the GROUP-BY
       PUSHED INTO THE JOIN REDUCE (``bucket_fn``): each bucket emits
       per-custkey partial revenue sums, so join output never
       materializes — the exchange's own partial-aggregate hook;
    3. one keyed exchange on custkey group-sums the partials exactly
       (a custkey's partials can span every join bucket) and each
       bucket keeps only its local top-k — ≤ B·k rows reach the driver;
    4. the global top-k joins customer + nation names via one tiny
       pruned broadcast read (k rows, not the customer table).

    Revenue is the exact integer ``round(price·100) · (100 −
    round(discount·100))`` — both factors round separately so both
    engines compute identical int64s; ties break by custkey."""
    import ray

    from ..engine.exchange import keyed_exchange
    from ..engine.joins import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"])

    def li_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        dh = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                     pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dh))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_c2": rev})

    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def od_filter(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    def bucket_partial(j: pa.Table) -> pa.Table:
        # per-bucket partial GROUP BY custkey — join rows die here
        return (j.select(["o_custkey", "rev_c2"])
                 .group_by(["o_custkey"]).aggregate([("rev_c2", "sum")])
                 .rename_columns(["o_custkey", "rev_c2"]))

    partials = hash_join(
        li.map_batches(li_filter, batch_format="pyarrow"),
        od.map_batches(od_filter, batch_format="pyarrow"),
        left_key="l_orderkey", right_key="o_orderkey",
        bucket_fn=bucket_partial)
    empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                      "rev_c2": pa.array([], pa.int64())})
    if not partials.num_rows:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "revenue_c2": pa.array([], pa.int64())})

    def custkey_topk(t: pa.Table) -> pa.Table:
        g = (t.group_by(["o_custkey"]).aggregate([("rev_c2", "sum")])
              .rename_columns(["o_custkey", "rev_c2"]))
        order = pc.sort_indices(
            g, sort_keys=[("rev_c2", "descending"),
                          ("o_custkey", "ascending")])
        return g.take(order[:k])

    parts = keyed_exchange(ray.data.from_arrow(partials), "o_custkey",
                           custkey_topk, empty_result=empty)
    merged = pa.concat_tables([p for p in parts if p.num_rows] or [empty])
    order = pc.sort_indices(merged,
                            sort_keys=[("rev_c2", "descending"),
                                       ("o_custkey", "ascending")])
    top = merged.take(order[:k])

    # enrichment: read ONLY the k winning customers (pruned read), then
    # their nations — both tiny
    keys = top["o_custkey"].to_pylist()
    import pyarrow.dataset as pads
    cust = pads.dataset(os.path.join(sf_dir, "customer.parquet")).to_table(
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pads.field("c_custkey").isin(keys))
    nat = pads.dataset(os.path.join(sf_dir, "nation.parquet")).to_table(
        columns=["n_nationkey", "n_name"])
    idx = pc.index_in(top["o_custkey"], cust["c_custkey"])
    # the inner-join oracle DROPS dangling custkeys (and would promote
    # the next customer into the k) — an engine-side silent null here
    # would diverge, so the referential assumption fails loudly; a
    # corpus with dangling keys needs the broadcast semi-filter before
    # the top-k (ReferentialChecker), not this fast path
    if pc.any(pc.is_null(idx)).as_py():
        raise ValueError(
            "returned_revenue_topk: top-k contains order custkeys "
            "missing from customer — run the referential filter first")
    nidx = pc.index_in(cust["c_nationkey"].take(idx), nat["n_nationkey"])
    if pc.any(pc.is_null(nidx)).as_py():
        raise ValueError(
            "returned_revenue_topk: customer nationkey missing from "
            "nation")
    return pa.table({
        "c_custkey": top["o_custkey"],
        "c_name": cust["c_name"].take(idx),
        "n_name": nat["n_name"].take(nidx),
        "revenue_c2": top["rev_c2"],
    })


_MOVING_SUM_EMPTY = pa.table({"event_id": pa.array([], pa.int64()),
                              "user_id": pa.array([], pa.int64()),
                              "mov_cents": pa.array([], pa.int64())})


def _moving_sum_bucket(frame: int):
    """Per-bucket kernel for the frame-clause moving window (module-level
    so both the gathered oracle wrapper and the streaming sink path share
    one implementation)."""

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        # null-safe: null values contribute 0 (SQL SUM skips NULLs) and
        # the frame sum is NULL only when every row in the frame is null;
        # null user_ids form one partition
        cents, cvalid = _int_col(
            pc.cast(pc.round(pc.multiply(s["value"], 100.0)), pa.int64()))
        new = _seg_new(s["user_id"])
        n = len(new)
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, n))
        cum = np.cumsum(cents)
        cumv = np.cumsum(cvalid.astype(np.int64))
        i = np.arange(n)
        pos = i - np.repeat(starts, glens)
        lo = i - np.minimum(pos, frame)
        pre = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        prev = np.where(lo > 0, cumv[np.maximum(lo - 1, 0)], 0)
        mov = cum - pre
        nval = cumv - prev
        return pa.table({"event_id": s["event_id"],
                         "user_id": s["user_id"],
                         "mov_cents": pa.array(mov, mask=nval == 0)})

    return bucket


def q_user_moving_sum(sf_dir: str, frame: int = 3) -> pa.Table:
    """Frame-clause window (``ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW``): each event's cent value summed with its user's previous
    ``frame`` events — completing the window family next to the
    running total (unbounded frame), LAG (offset) and sessions (gap).
    Same keyed-exchange plan; the kernel is one global cumsum + index
    arithmetic: each row's frame start clamps to its group start, so
    windows never cross users and no per-window loop exists.

    The final gather + concat + global sort exists ONLY for the driver's
    oracle compare (per-event output ≈ input size — gathering it at 100 TB
    would be wrong).  At scale the SAME kernel streams to a partitioned
    sink with zero driver materialization: `stream_user_moving_sum`
    (``gather=False`` → ``ray.data.from_arrow_refs`` → ``write_parquet``),
    equality-tested against this wrapper.  Every per-event window wrapper
    in the family (running total, LAG, rank windows, LOCF, sessions)
    shares the keyed-exchange plan, so the same swap applies to each."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    parts = [p for p in keyed_exchange(ds, "user_id",
                                       _moving_sum_bucket(frame),
                                       empty_result=_MOVING_SUM_EMPTY)
             if p.num_rows]
    if not parts:
        return _MOVING_SUM_EMPTY
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")])


def stream_user_moving_sum(sf_dir: str, out_dir: str, frame: int = 3) -> int:
    """Streaming-sink exemplar for the per-event window family: the same
    moving-window plan as `q_user_moving_sum`, but the per-bucket reduce
    OUTPUT REFS feed ``ray.data.from_arrow_refs`` → ``write_parquet`` —
    one file per hash bucket, nothing concatenated or sorted on the
    driver.  This is the 100 TB shape: per-event window output is as big
    as the input, so it must land in a partitioned sink, not a driver
    table.  Returns the row count written (from the dataset's metadata,
    not a gather)."""
    import ray

    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    refs = keyed_exchange(ds, "user_id", _moving_sum_bucket(frame),
                          empty_result=_MOVING_SUM_EMPTY, gather=False)
    out = ray.data.from_arrow_refs(refs)
    out.write_parquet(out_dir)
    return out.count()


def q_user_rank_windows(sf_dir: str) -> pa.Table:
    """Ranking window family (ROW_NUMBER / RANK / DENSE_RANK / NTILE /
    PERCENT_RANK) per user over cent value, completing the window set
    next to SUM OVER, LAG, the moving frame and sessions.  RANK and
    DENSE_RANK are ties-aware over ``cents DESC``; ROW_NUMBER and
    NTILE(4) use the tie-broken total order ``(cents DESC, event_id)``
    so every emitted column is deterministic.  PERCENT_RANK is emitted
    as the exact rational ``(pr_num, pr_den) = (rank-1, n-1)`` — integer
    on both engines, so the hash compare never meets a float.  Plan: one
    keyed exchange on user_id (hot keys logged by the exchange family);
    the per-bucket kernel ranks ALL users at once with run-length
    arithmetic — no per-group loop."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "row_num": pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()),
                      "drnk": pa.array([], pa.int64()),
                      "ntile4": pa.array([], pa.int64()),
                      "pr_num": pa.array([], pa.int64()),
                      "pr_den": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        t = t.set_column(t.schema.get_field_index("value"), "cents", cents)
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("cents", "descending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        # null-safe: null cents tie with each other (SQL treats NULLs as
        # one rank run, sorted last) and null user_ids form one partition
        new = _seg_new(s["user_id"])
        cvn, cvv = _int_col(s["cents"])
        n = len(new)
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, glens)   # 0-based in group
        # equal-value runs within a group: RANK = run start's pos + 1,
        # DENSE_RANK = per-group cumsum of run starts
        vg = new.copy()
        vg[1:] |= (cvn[1:] != cvn[:-1]) | (cvv[1:] != cvv[:-1])
        rstarts = np.nonzero(vg)[0]
        rlens = np.diff(np.append(rstarts, n))
        rnk = np.repeat(pos[rstarts] + 1, rlens)
        dv = np.cumsum(vg)
        drnk = dv - np.repeat(dv[starts] - 1, glens)
        # NTILE(4), SQL semantics: first n%4 buckets get ceil(n/4) rows
        gn = np.repeat(glens, glens)
        base = gn // 4
        rem = gn % 4
        cut = rem * (base + 1)
        in_big = pos < cut
        ntile4 = np.where(in_big,
                          pos // np.maximum(base + 1, 1),
                          rem + (pos - cut) // np.maximum(base, 1)) + 1
        return pa.table({
            "event_id": s["event_id"],
            "user_id": s["user_id"],
            "row_num": pa.array((pos + 1).astype(np.int64)),
            "rnk": pa.array(rnk.astype(np.int64)),
            "drnk": pa.array(drnk.astype(np.int64)),
            "ntile4": pa.array(ntile4.astype(np.int64)),
            "pr_num": pa.array((rnk - 1).astype(np.int64)),
            "pr_den": pa.array((gn - 1).astype(np.int64)),
        })

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("user_id", "ascending"), ("row_num", "ascending")])


def q_max_concurrent_events(sf_dir: str, hold_minutes: int = 10,
                            n_ranges: int = 16,
                            sample_mod: int = 97) -> pa.Table:
    """Sweep-line max-concurrency per event type: each event holds a
    resource for ``hold_minutes``; report the peak number simultaneously
    held — the classic interval-overlap / peak-load operator
    (``MAX(SUM(±1) OVER (ORDER BY t))`` in SQL), which needs a GLOBAL
    running count and therefore cannot be a per-block partial on its own.

    Distributed as an ASSOCIATIVE PREFIX SCAN, not a global sort:
    events explode into (t, +1)/(t+hold, -1) deltas in one vectorized
    pass, a range exchange on t (sampled cutpoints — placement is
    result-neutral, the composition below is associative) co-locates
    each time slice, and every range task returns only per-type
    ``(sum of deltas, max of the within-range running count)`` — a few
    rows per range.  The driver folds ranges IN ORDER:
    ``global_max = max_r(prefix_before_r + local_max_r)`` with
    ``prefix_before`` the cumsum of earlier ranges' delta sums — O(ranges
    × types) driver state at any corpus size, the same scan shape as
    ``pack_sequences``.  Tie rule pinned on both engines: at equal t an
    expiry (-1) precedes an arrival (+1) — half-open [t, t+hold) — via
    ``ORDER BY t, d``; within-tie intermediate orders differ between
    engines but the MAX is tie-order independent (a +1 run peaks at its
    end; a -1 run's interior values never exceed the already-attained
    run start).  NULL ts rows are dropped on both sides; NULL event_type
    is one group (sorted last, DuckDB's NULLS LAST)."""
    from ..engine.exchange import range_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    hold_us = hold_minutes * 60_000_000

    def sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False))
        keep = pa.array((ids % sample_mod == 0)
                        & np.asarray(pc.is_valid(t["ts"])
                                     .to_numpy(zero_copy_only=False)))
        return pa.table({"t": pc.cast(t["ts"].filter(keep), pa.int64())})

    sv = np.sort(np.concatenate([
        np.asarray(t["t"].to_numpy(zero_copy_only=False))
        for t in gather_tables(ds.map_batches(sample, batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0, np.int64)]))
    cutpoints = equidepth_cutpoints(sv, n_ranges)

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        ts_us = pc.cast(t["ts"], pa.int64())
        n = t.num_rows
        return pa.table({
            "event_type": pa.concat_arrays(
                [t["event_type"].combine_chunks()] * 2),
            "t": pa.concat_arrays([ts_us.combine_chunks(),
                                   pc.add(ts_us, hold_us).combine_chunks()]),
            "d": pa.array(np.concatenate([np.ones(n, np.int64),
                                          np.full(n, -1, np.int64)])),
        })

    deltas = ds.map_batches(explode, batch_format="pyarrow")
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "sum_d": pa.array([], pa.int64()),
                      "local_max": pa.array([], pa.int64())})

    def range_summary(_rid: int, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        order = pc.sort_indices(t, sort_keys=[("event_type", "ascending"),
                                              ("t", "ascending"),
                                              ("d", "ascending")])
        s = t.take(order)
        new = _seg_new(s["event_type"])
        d = np.asarray(s["d"].to_numpy(zero_copy_only=False))
        run = np.cumsum(d)
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, len(d)))
        # per-type running count = global cumsum minus the prefix before
        # the type's first row (exclusive), all vectorized
        base = run[starts] - d[starts]
        run = run - np.repeat(base, glens)
        local_max = np.maximum.reduceat(run, starts)
        sums = np.add.reduceat(d, starts)
        return pa.table({"event_type": s["event_type"].take(
                             pa.array(starts, pa.int64())),
                         "sum_d": pa.array(sums),
                         "local_max": pa.array(local_max)})

    parts = range_exchange(deltas, "t", cutpoints, range_summary,
                           empty_result=empty)
    running: dict = {}
    best: dict = {}
    for part in parts:  # index-aligned with range ids: fold IN ORDER
        for ty, sd, lm in zip(part["event_type"].to_pylist(),
                              part["sum_d"].to_pylist(),
                              part["local_max"].to_pylist()):
            before = running.get(ty, 0)
            cand = before + lm
            if ty not in best or cand > best[ty]:
                best[ty] = cand
            running[ty] = before + sd
    if not best:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "max_concurrent": pa.array([], pa.int64())})
    keys = sorted([k for k in best if k is not None])
    if None in best:
        keys.append(None)  # NULLS LAST, DuckDB's ASC default
    return pa.table({"event_type": pa.array(keys, pa.string()),
                     "max_concurrent": pa.array([best[k] for k in keys],
                                                pa.int64())})


def q_user_transitions(sf_dir: str) -> pa.Table:
    """Markov transition counts over each user's ordered event stream:
    global counts of (previous event_type → event_type) adjacent pairs,
    the user-journey / n-gram-over-sequences aggregate (feeds transition
    matrices and next-event models).  Plan: one keyed exchange on
    user_id, per-bucket vectorized sort ``(user_id, ts NULLS LAST,
    event_id)`` + dictionary-code pair counting (``np.unique`` over
    ``prev_code * K + next_code``) — each bucket emits at most types²
    partial rows, the driver group-sums a few hundred rows.  Pair
    existence is keyed on the LAG ROW existing (``lag(event_id) IS NOT
    NULL``), not on the lagged type, so transitions from a NULL
    event_type still count (one NULL group, SQL semantics); NULL user_id
    is one partition."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    empty = pa.table({"prev_type": pa.array([], pa.string()),
                      "next_type": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("ts", "ascending"),
                                              ("event_id", "ascending")])
        s = t.take(order)
        first = _seg_new(s["user_id"])
        enc = s["event_type"].combine_chunks().dictionary_encode()
        codes = np.asarray(pc.fill_null(enc.indices, -1)
                           .to_numpy(zero_copy_only=False)).astype(np.int64)
        if len(codes) < 2:
            return empty
        prev, nxt = codes[:-1], codes[1:]
        keep = ~first[1:]
        prev, nxt = prev[keep], nxt[keep]
        if not len(prev):
            return empty
        k = int(codes.max()) + 2  # +1 for the -1 null code shift
        pairs, counts = np.unique((prev + 1) * k + (nxt + 1),
                                  return_counts=True)
        pc_, nc = pairs // k - 1, pairs % k - 1
        dic = enc.dictionary

        def detype(c: np.ndarray) -> pa.Array:
            out = dic.take(pa.array(np.maximum(c, 0), pa.int64()))
            return pc.if_else(pa.array(c >= 0), out,
                              pa.scalar(None, pa.string()))

        return pa.table({"prev_type": detype(pc_), "next_type": detype(nc),
                         "n": pa.array(counts.astype(np.int64))})

    parts = [p for p in keyed_exchange(ds, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).group_by(
        ["prev_type", "next_type"]).aggregate([("n", "sum")])
    merged = merged.rename_columns(["prev_type", "next_type", "n"])
    return merged.sort_by([("prev_type", "ascending"),
                           ("next_type", "ascending")])


def q_corr_moments_lineitem(sf_dir: str) -> pa.Table:
    """Exact second-moment numerators for covariance / correlation /
    least-squares per ``l_returnflag`` over (quantity, discount) cents:
    ``n, Σx, Σy, Σx², Σy², Σxy`` as int64 — every downstream statistic
    (corr, slope, R²) is a pure driver-side function of these six, so
    the DISTRIBUTED part is one bounded per-block partial (flags × 6
    rows per block, no shuffle) + a python-int driver merge that raises
    loudly if any total would overflow int64 (qty ≤ 50 ⇒ Σx² grows at
    2.5e7/row: overflow needs ~3.7e11 rows per flag — log-raise, never
    silent wrap).  Cents quantization is exact on both engines (the
    inputs carry ≤2 decimals, so value*100 is integral before rounding;
    no .5-tie dialect exists).  SUM skips NULLs, COUNT(*) counts all
    rows, an all-NULL group's sum stays NULL, NULL returnflag is one
    group."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        qc = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)),
                     pa.int64())
        dc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                     pa.int64())
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "qc": qc, "dc": dc,
            "qq": pc.multiply_checked(qc, qc),
            "dd": pc.multiply_checked(dc, dc),
            "qd": pc.multiply_checked(qc, dc),
        }).group_by(["l_returnflag"]).aggregate(
            [("one", "sum"), ("qc", "sum"), ("dc", "sum"),
             ("qq", "sum"), ("dd", "sum"), ("qd", "sum")])
        return g.rename_columns(["l_returnflag", "n", "sum_qty_c",
                                 "sum_disc_c", "sum_qty_sq", "sum_disc_sq",
                                 "sum_qty_disc"])

    acc: dict = {}
    cols = ["n", "sum_qty_c", "sum_disc_c", "sum_qty_sq", "sum_disc_sq",
            "sum_qty_disc"]
    seen: dict = {}
    for t in gather_tables(ds.map_batches(partial, batch_format="pyarrow")):
        for i, flag in enumerate(t["l_returnflag"].to_pylist()):
            row = acc.setdefault(flag, [0] * 6)
            srow = seen.setdefault(flag, [False] * 6)
            for j, c in enumerate(cols):
                v = t[c][i].as_py()
                # SUM skips NULLs; an all-NULL group stays NULL (the
                # partial group sums already carry null for that case)
                if v is not None:
                    row[j] += v
                    srow[j] = True
    for flag, row in acc.items():
        for j, v in enumerate(row):
            if not (-2**63 <= v < 2**63):
                raise OverflowError(
                    f"corr moment {cols[j]} for flag {flag!r} exceeds "
                    f"int64 ({v}); re-quantize or shard the aggregate")
    keys = sorted([k for k in acc if k is not None])
    if None in acc:
        keys.append(None)
    return pa.table({"l_returnflag": pa.array(keys, pa.string()),
                     **{c: pa.array(
                         [acc[k][j] if seen[k][j] else None for k in keys],
                         pa.int64())
                        for j, c in enumerate(cols)}})


def q_events_setops(sf_dir: str) -> pa.Table:
    """Multiset set operations (``INTERSECT ALL`` / ``EXCEPT ALL``) as a
    distributed operator — the one relational family the join set does
    NOT cover: set ops use multiset-MULTIPLICITY semantics (min /
    clipped difference of duplicate counts) and, unlike every join,
    treat NULL keys as EQUAL.  Sides: events split by event_id parity
    (position-independent, mirrored verbatim in SQL); rows are
    (user_id, event_type) pairs, output is the grouped multiplicity
    ``n`` per surviving pair under each op.

    Plan: ONE scan tags each row's side in-batch and pre-aggregates to
    (user_id, event_type, side, cnt) partials (bounded by pairs/block),
    one keyed exchange on user_id co-locates each pair's counts, and the
    per-bucket kernel is dictionary-code segment arithmetic —
    ``intersect = min(c0, c1)``, ``except = max(c0 - c1, 0)`` — with
    null user/type grouping AS VALUES (set-op semantics; pyarrow's
    hash join would wrongly drop them, so the kernel never joins)."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    empty = pa.table({"op": pa.array([], pa.string()),
                      "user_id": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def tag(t: pa.Table) -> pa.Table:
        side = pc.cast(pc.bit_wise_and(t["event_id"], 1), pa.int64())
        g = pa.table({"user_id": t["user_id"],
                      "event_type": t["event_type"],
                      "side": side,
                      "one": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by(["user_id", "event_type", "side"]) \
            .aggregate([("one", "sum")])
        return g.rename_columns(["user_id", "event_type", "side", "cnt"])

    partials = ds.map_batches(tag, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                              ("event_type", "ascending"),
                                              ("side", "ascending")])
        s = t.take(order)
        # pair segments, null-safe (null user/type group as one VALUE)
        nu = _seg_new(s["user_id"])
        nt = _seg_new(s["event_type"])
        new = nu | nt
        starts = np.nonzero(new)[0]
        side = np.asarray(s["side"].to_numpy(zero_copy_only=False))
        cnt = np.asarray(s["cnt"].to_numpy(zero_copy_only=False))
        c0 = np.add.reduceat(np.where(side == 0, cnt, 0), starts)
        c1 = np.add.reduceat(np.where(side == 1, cnt, 0), starts)
        inter = np.minimum(c0, c1)
        exc = np.maximum(c0 - c1, 0)
        idx = pa.array(starts, pa.int64())
        uid, ety = s["user_id"].take(idx), s["event_type"].take(idx)
        out = []
        for op, n in (("except_all", exc), ("intersect_all", inter)):
            keep = pa.array(n > 0)
            out.append(pa.table({
                "op": pa.array(np.full(int((n > 0).sum()), op)),
                "user_id": uid.filter(keep),
                "event_type": ety.filter(keep),
                "n": pa.array(n[n > 0])}))
        return pa.concat_tables(out).cast(empty.schema)

    parts = [p for p in keyed_exchange(partials, "user_id", bucket,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("op", "ascending"), ("user_id", "ascending"),
         ("event_type", "ascending")])


_PR_MULT = 2654435761    # Knuth constant shared with train_val_split
_PR_SALT = 13            # distinct salt: edges independent of split/mix
_PR_R0 = 1_000_000_000   # fixed-point unit rank
_PR_OUT = 3              # out-degree of the derived link graph


def q_pagerank_documents(sf_dir: str, iters: int = 5) -> pa.Table:
    """Distributed PageRank over a derived document link graph — the
    classic web-scale corpus-quality signal (rank pages by incoming
    links before keeping their text).

    Graph: every doc links to exactly ``_PR_OUT`` pseudo-random docs,
    ``dst = knuth_mix(doc_id*3 + j) % n`` — the same SQL-expressible mix
    as train_val_split, so the oracle derives the SAME graph (doc_id is
    contiguous 0..n-1 in this corpus, making ``% n`` a valid node id).
    Ranks are INTEGER fixed point (R0 = 1e9): per-edge contribution is
    ``rank // 3`` and ``new_rank = (15*R0)//100 + (85*sum_in)//100`` —
    every operation is order-independent int64 arithmetic on
    non-negative values, so the result is hash-exact against an
    unrolled DuckDB mirror and bit-identical under any partitioning.
    (``85*sum_in`` needs ``n * R0 * 85 < 2^63`` ⇒ fine below ~1e8 docs;
    shrink R0 beyond that.)

    Plan: ranks live in blocks, never on the driver.  Each iteration is
    ONE pass emitting in-batch pre-aggregated (dst, contrib) partials —
    plus a zero self-row per node so rank-starved nodes survive, the
    exact analog of the mirror's w=0 self-edges — and ONE keyed
    exchange on dst whose buckets group-sum into the next rank table;
    iterations chain on the exchange's reduce refs (gather=False)."""
    import ray.data

    import pyarrow.parquet as pq

    from ..engine.exchange import keyed_exchange

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nn = np.uint64(n)
    teleport = (_PR_R0 * 15) // 100
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "rank_fp": pa.array([], pa.int64())})

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "rank_fp": pa.array(
                             np.full(t.num_rows, _PR_R0, np.int64))})

    ranks = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)) \
            .astype(np.uint64)
        contrib = (np.asarray(t["rank_fp"].to_numpy(zero_copy_only=False))
                   // _PR_OUT)
        dst = [((ids * np.uint64(_PR_OUT) + np.uint64(j))
                * np.uint64(_PR_MULT) + np.uint64(_PR_SALT))
               % np.uint64(1 << 32) % nn for j in range(_PR_OUT)]
        dst.append(ids)  # zero self-row keeps in-edge-less nodes alive
        cs = [contrib] * _PR_OUT + [np.zeros(len(ids), np.int64)]
        return pa.table(
            {"dst": pa.array(np.concatenate(dst).astype(np.int64)),
             "contrib": pa.array(np.concatenate(cs))}) \
            .group_by("dst").aggregate([("contrib", "sum")]) \
            .rename_columns(["dst", "contrib"])

    def new_ranks(t: pa.Table) -> pa.Table:
        g = t.group_by("dst").aggregate([("contrib", "sum")])
        s = np.asarray(g["contrib_sum"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": g["dst"],
                         "rank_fp": pa.array(teleport + (85 * s) // 100)}) \
            .cast(empty.schema)

    parts: list = []
    for it in range(iters):
        contribs = ranks.map_batches(emit, batch_format="pyarrow")
        out = keyed_exchange(contribs, "dst", new_ranks,
                             empty_result=empty, gather=it == iters - 1)
        if it == iters - 1:
            parts = [p for p in out if p.num_rows]
        else:
            ranks = ray.data.from_arrow_refs(out)
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


def q_lineitem_unpivot(sf_dir: str) -> pa.Table:
    """UNPIVOT / melt — the inverse reshape of q_events_pivot: four wide
    measure columns become (row key, measure, value_cents) long rows.
    Embarrassingly parallel (a pure per-batch map, no shuffle); cents
    quantization keeps values hash-stable.  (l_orderkey, l_linenumber)
    is NOT unique in this corpus, so value_cents joins the sort key:
    remaining ties are then bit-identical rows and any tie order hashes
    the same.  NULL measures stay NULL (ROUND(NULL) both sides, sorted
    last by both engines)."""
    measures = ["discount", "extendedprice", "quantity", "tax"]
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber"] + [f"l_{m}" for m in measures])

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for m in measures:
            cents = pc.cast(pc.round(pc.multiply(t[f"l_{m}"], 100.0)),
                            pa.int64())
            parts.append(pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "measure": pa.array(np.full(t.num_rows, m)),
                "value_cents": cents}))
        return pa.concat_tables(parts)

    tabs = [b for b in gather_tables(
        ds.map_batches(melt, batch_format="pyarrow")) if b.num_rows]
    if not tabs:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "l_linenumber": pa.array([], pa.int32()),
                         "measure": pa.array([], pa.string()),
                         "value_cents": pa.array([], pa.int64())})
    return pa.concat_tables(tabs).combine_chunks().sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending"),
         ("measure", "ascending"), ("value_cents", "ascending")])


_CKSUM_MOD = 1 << 63  # both sides mask hashes to 63 bits (BIGINT-safe)


def q_table_checksum_documents(sf_dir: str) -> pa.Table:
    """Order-independent whole-table digest — the cross-replica /
    post-migration integrity primitive at 100 TB: O(1) output, ZERO
    shuffle, every byte read exactly once.  Each row canonicalizes to
    ``doc_id || '|' || text`` (null-safe), hashes through the
    DuckDB-conformant MD5-lower-64 (pipelines/conformance.py), and the
    per-block partial is (count, sum mod 2^63, xor of 63-bit-masked
    hashes) — all three merges are associative + commutative, so the
    digest is partition- and order-independent by construction.
    Masking each operand to 63 bits commutes with XOR (bitwise), and the
    mirror applies the identical mask, so everything stays BIGINT.
    Production-scale variant would swap MD5 for the vectorized xxhash
    (the fingerprint_documents split); this is the SQL-checkable
    conformance surface."""
    from .conformance import _md5_lower64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        row = pc.fill_null(pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()),
            pc.fill_null(t["text"], "\x00"), "|"), "")
        h = _md5_lower64(row.combine_chunks() if isinstance(
            row, pa.ChunkedArray) else row)
        lo = h & np.uint64(_CKSUM_MOD - 1)
        s = int(sum(int(x) for x in lo) % _CKSUM_MOD)
        x = int(np.bitwise_xor.reduce(lo)) if len(lo) else 0
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([s], pa.int64()),
                         "x": pa.array([x], pa.int64())})

    parts = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    n = sum(int(p["n"][0].as_py()) for p in parts)
    s = sum(int(p["s"][0].as_py()) for p in parts) % _CKSUM_MOD
    x = 0
    for p in parts:
        x ^= int(p["x"][0].as_py())
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "sum_lo63": pa.array([s], pa.int64()),
                     "xor_lo63": pa.array([x], pa.int64())})


def _counting_median(blocks: list[pa.Table]) -> int | None:
    """Median (zero-based rank ⌊0.5·(n−1)⌋, the repo's pinned quantile
    convention) from gathered (cents, n) counting partials; None when the
    rank lands in the NULLS-LAST tail or the input is empty."""
    if not blocks:
        return None
    g = (pa.concat_tables(blocks).group_by("cents")
         .aggregate([("n", "sum")]).sort_by([("cents", "ascending")]))
    cents, cval = _int_col(g["cents"])
    cum = np.cumsum(np.asarray(g["n_sum"].to_numpy(zero_copy_only=False)
                               ).astype(np.int64))
    n = int(cum[-1])
    if n == 0:
        return None
    pos = int(np.searchsorted(cum, int(np.floor(0.5 * (n - 1))) + 1))
    return int(cents[pos]) if cval[pos] else None


def q_mad_lineitem(sf_dir: str) -> pa.Table:
    """Median absolute deviation of l_extendedprice cents — the robust
    dispersion statistic, EXACT and distributed: two counting exchanges
    (per-block (cents, count) partials, bounded by distinct values per
    block, driver rank pick — the events_value_quantiles machinery),
    with the pass-1 median broadcast into pass 2 as one closure int.
    NULL prices sort into the quantile tail on both sides (row_number
    NULLS LAST ≡ the null-group-last partial sort)."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        g = pa.table({"cents": cents}).group_by("cents").aggregate(
            [([], "count_all")])
        return pa.table({"cents": g["cents"],
                         "n": g["count_all"].cast(pa.int64())})

    med = _counting_median([b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows])
    if med is None:
        return pa.table({"median_cents": pa.array([None], pa.int64()),
                         "mad_cents": pa.array([None], pa.int64())})

    def dev_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        dev = pc.abs(pc.subtract(cents, med))
        g = pa.table({"cents": dev}).group_by("cents").aggregate(
            [([], "count_all")])
        return pa.table({"cents": g["cents"],
                         "n": g["count_all"].cast(pa.int64())})

    mad = _counting_median([b for b in gather_tables(
        ds.map_batches(dev_partial, batch_format="pyarrow")) if b.num_rows])
    return pa.table({"median_cents": pa.array([med], pa.int64()),
                     "mad_cents": pa.array([mad], pa.int64())})


def q_triangle_count(sf_dir: str) -> pa.Table:
    """Distributed triangle counting over the derived link graph —
    completing the graph family next to PageRank and connected
    components.  Graph: the same Knuth-mix 3-out-edge derivation as
    q_pagerank_documents, canonicalized to DISTINCT undirected edges
    (lo < hi, self-loops dropped) so the count is well-defined.

    Plan (node-iterator, two keyed exchanges, count-only output):
    exchange 1 co-locates every edge by its LO endpoint ``a`` — the
    bucket dedups globally (all (a, *) rows are co-located) and emits
    each node's wedge candidates (b, c) with b < c from its sorted
    neighbor list via vectorized segment-combination indexing (no
    per-group Python; pairs per node = deg²/2, bounded by the derived
    graph's ~Poisson(6) degrees — a hub-heavy real graph would reuse
    the joins' grid split).  Exchange 2 co-locates wedges with the
    edge that would close them (both keyed by the candidate edge's lo
    endpoint); the bucket counts wedges whose (b, c) is present via
    int64 pair-key searchsorted membership.  Each triangle a<b<c is
    counted exactly once (at its smallest vertex)."""
    import pyarrow.parquet as pq

    from ..engine.exchange import keyed_exchange

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nn = np.uint64(n)

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)) \
            .astype(np.uint64)
        src = np.concatenate([ids] * _PR_OUT)
        dst = np.concatenate(
            [((ids * np.uint64(_PR_OUT) + np.uint64(j))
              * np.uint64(_PR_MULT) + np.uint64(_PR_SALT))
             % np.uint64(1 << 32) % nn for j in range(_PR_OUT)])
        a = np.minimum(src, dst).astype(np.int64)
        b = np.maximum(src, dst).astype(np.int64)
        keep = a != b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])}) \
            .group_by(["a", "b"]).aggregate([])  # block-level distinct

    mixed = pa.table({"k": pa.array([], pa.int64()),
                      "o": pa.array([], pa.int64()),
                      "kind": pa.array([], pa.int8())})

    def wedge_bucket(t: pa.Table) -> pa.Table:
        # global distinct (all (a, *) co-located here), sorted adjacency
        d = t.group_by(["a", "b"]).aggregate([]).sort_by(
            [("a", "ascending"), ("b", "ascending")])
        a = np.asarray(d["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(d["b"].to_numpy(zero_copy_only=False))
        new = np.ones(len(a), dtype=bool)
        new[1:] = a[1:] != a[:-1]
        starts = np.nonzero(new)[0]
        gstart = np.repeat(starts, np.diff(np.append(starts, len(a))))
        j = np.arange(len(a)) - gstart          # in-group offset
        second = np.repeat(np.arange(len(a)), j)
        run_start = np.cumsum(j) - j
        pos = np.arange(int(j.sum())) - np.repeat(run_start, j)
        first = np.repeat(gstart, j) + pos      # all (first < second) pairs
        wedge = pa.table({"k": pa.array(b[first]),
                          "o": pa.array(b[second]),
                          "kind": pa.array(np.full(len(first), 1, np.int8))})
        edge = pa.table({"k": d["a"], "o": d["b"],
                         "kind": pa.array(np.zeros(len(a), np.int8))})
        return pa.concat_tables([edge, wedge]).cast(mixed.schema)

    stage1 = keyed_exchange(
        ds.map_batches(edges, batch_format="pyarrow"), "a", wedge_bucket,
        empty_result=mixed, gather=False)
    import ray.data

    one = pa.table({"n_triangles": pa.array([], pa.int64())})

    def count_bucket(t: pa.Table) -> pa.Table:
        kind = np.asarray(t["kind"].to_numpy(zero_copy_only=False))
        key = (np.asarray(t["k"].to_numpy(zero_copy_only=False))
               * np.int64(n)
               + np.asarray(t["o"].to_numpy(zero_copy_only=False)))
        ek = np.sort(key[kind == 0])
        wk = key[kind == 1]
        idx = np.searchsorted(ek, wk)
        idx[idx == len(ek)] = 0 if len(ek) else 0
        hit = len(ek) and int(np.count_nonzero(ek[np.minimum(
            idx, len(ek) - 1)] == wk))
        return pa.table({"n_triangles": pa.array([int(hit)], pa.int64())})

    parts = keyed_exchange(ray.data.from_arrow_refs(stage1), "k",
                           count_bucket, empty_result=one)
    total = sum(int(p["n_triangles"][0].as_py()) for p in parts)
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def q_pareto_lineitem(sf_dir: str) -> pa.Table:
    """Skyline (Pareto-dominance) query: the distinct (quantity,
    price_cents) pairs not dominated by any other — dominate = quantity
    ≥ AND price ≤ with one strict (maximize quantity, minimize price:
    the classic preference frontier, Börzsönyi et al. 2001).  Emits the
    frontier with each pair's corpus-wide row count.

    Distribution uses the skyline union property: the GLOBAL skyline is
    a subset of the union of per-block LOCAL skylines, and any
    occurrence of a globally non-dominated pair survives its local
    skyline (a local dominator would be a global one) — so per-block
    partials carry exact counts and the driver merge is exact.  Each
    partial is bounded by the block's distinct quantity values (≤ the
    staircase height, ~50 for TPC-H quantities), so driver state is
    O(blocks × distinct-q), never O(rows).

    Per-block kernel: group distinct pairs (Arrow group_by) → lexsort
    (price asc, quantity desc) → one running-max staircase pass —
    vectorized, no Python loop over rows."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    empty = pa.table({"quantity": pa.array([], pa.int64()),
                      "price_cents": pa.array([], pa.int64()),
                      "n_rows": pa.array([], pa.int64())})

    def _staircase(q: np.ndarray, c: np.ndarray, n: np.ndarray):
        # keep pairs where quantity strictly exceeds every pair with
        # lower-or-equal price (ties in price: only the max q survives)
        order = np.lexsort((-q, c))
        qs, cs, ns = q[order], c[order], n[order]
        runmax = np.maximum.accumulate(qs)
        # survivor: first occurrence of each new running max AND the max
        # q within its own price level (lexsort put it first per price)
        new_high = np.ones(len(qs), dtype=bool)
        new_high[1:] = qs[1:] > runmax[:-1]
        return qs[new_high], cs[new_high], ns[new_high]

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        qc = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)),
                     pa.int64())
        cc = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                     pa.int64())
        g = pa.table({"q": qc, "c": cc}).group_by(["q", "c"]).aggregate(
            [([], "count_all")])
        q = np.asarray(g["q"].to_numpy(zero_copy_only=False), dtype=np.int64)
        c = np.asarray(g["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = np.asarray(g["count_all"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        qs, cs, ns = _staircase(q, c, n)
        return pa.table({"quantity": pa.array(qs),
                         "price_cents": pa.array(cs),
                         "n_rows": pa.array(ns)})

    parts = [t for t in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if t.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).group_by(
        ["quantity", "price_cents"]).aggregate([("n_rows", "sum")])
    q = np.asarray(merged["quantity"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    c = np.asarray(merged["price_cents"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    n = np.asarray(merged["n_rows_sum"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    qs, cs, ns = _staircase(q, c, n)
    out = pa.table({"quantity": pa.array(qs), "price_cents": pa.array(cs),
                    "n_rows": pa.array(ns)})
    return out.sort_by([("quantity", "ascending")])


def q_cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix — users grouped by first-activity week
    (the cohort), counted distinct per week offset since that first
    week: the product-analytics staple behind every retention curve.
    NULL ts / NULL user_id rows are excluded (a cohort needs both).

    ONE keyed exchange on user_id: the map side projects and
    block-DISTINCTs (user, week) pairs (idempotent, shrinks the
    exchange to ≤ users × weeks rows); each reduce bucket owns all of a
    user's weeks, so the per-user MIN (cohort) and the distinct offsets
    are bucket-local and exact; buckets emit (cohort_week, week_offset,
    n_users) partials — each user counted in exactly one bucket — and
    the driver group-sums ≤ weeks² rows."""
    from ..engine.exchange import keyed_exchange

    WEEK_US = 7 * 24 * 3600 * 1_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                      "week_offset": pa.array([], pa.int64()),
                      "n_users": pa.array([], pa.int64())})

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"]))
        t = t.filter(mask)
        if not t.num_rows:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "week": pa.array([], pa.int64())})
        # FLOOR-division week index (pre-epoch ts land in negative
        # weeks, mirrored by FLOOR() in the SQL — DuckDB's BIGINT //
        # truncates toward zero, so the mirror floors explicitly)
        us = np.asarray(pc.cast(t["ts"], pa.int64())
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        week = us // WEEK_US
        return pa.table({"user_id": t["user_id"],
                         "week": pa.array(week)}) \
            .group_by(["user_id", "week"]).aggregate([])

    def bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        w = np.asarray(t["week"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        newu = np.ones(len(u), dtype=bool)
        newu[1:] = u[1:] != u[:-1]
        # distinct (user, week) after the map-side distinct may still
        # repeat across blocks — dedupe again (cheap on sorted arrays)
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w, newu = u[keep], w[keep], newu[keep]
        cohort = w[np.maximum.accumulate(
            np.where(newu, np.arange(len(u)), 0))]
        off = w - cohort
        g = pa.table({"cohort_week": pa.array(cohort),
                      "week_offset": pa.array(off)}) \
            .group_by(["cohort_week", "week_offset"]) \
            .aggregate([([], "count_all")])
        return pa.table({"cohort_week": g["cohort_week"],
                         "week_offset": g["week_offset"],
                         "n_users": g["count_all"].cast(pa.int64())})

    parts = keyed_exchange(ds.map_batches(project, batch_format="pyarrow"),
                           "user_id", bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).group_by(
        ["cohort_week", "week_offset"]).aggregate([("n_users", "sum")])
    return pa.table({
        "cohort_week": merged["cohort_week"],
        "week_offset": merged["week_offset"],
        "n_users": merged["n_users_sum"].cast(pa.int64()),
    }).sort_by([("cohort_week", "ascending"), ("week_offset", "ascending")])


def q_copurchase_pairs(sf_dir: str, k: int = 10) -> pa.Table:
    """Market-basket co-occurrence: the top-k part pairs appearing in
    the most orders together (frequent-itemset mining's 2-itemset
    core).  The quadratic self-join explosion is managed structurally:
    pairs generate per-ORDER (basket sizes are small — pairs per basket
    = g(g-1)/2), never as a global part x part product.

    Two bounded exchanges: (1) keyed on l_orderkey — per-bucket
    vectorized pair generation (sorted groups + repeat/arange index
    arithmetic, no Python loop) with local (pair, count) partials;
    (2) keyed on the packed ``part_a << 32 | part_b`` pair key —
    per-bucket exact group-sum + a local top-k cut, exact globally
    because a pair's total lives in exactly one bucket; the driver
    merges only buckets x k candidate rows.  Ties: count desc,
    part_a asc, part_b asc."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    pair_empty = pa.table({"pair": pa.array([], pa.int64()),
                           "n": pa.array([], pa.int64())})

    def gen_pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pair_empty
        o = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        p = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        # distinct (order, part): a part twice in one basket counts once
        keep = np.ones(len(o), dtype=bool)
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        new = np.ones(len(o), dtype=bool)
        new[1:] = o[1:] != o[:-1]
        starts = np.nonzero(new)[0]
        g = np.diff(np.append(starts, len(o)))
        pos = np.arange(len(o)) - np.repeat(starts, g)
        # element at in-group position q pairs with the (g-1-q) elements
        # after it: a_idx repeats each element that many times, b_idx
        # walks forward from a_idx+1
        reps = (g[np.repeat(np.arange(len(g)), g)] - 1 - pos)
        a_idx = np.repeat(np.arange(len(o)), reps)
        off = np.concatenate([[0], np.cumsum(reps)])
        b_idx = (np.arange(int(off[-1]), dtype=np.int64)
                 - np.repeat(off[:-1], reps) + a_idx + 1)
        if not len(a_idx):
            return pair_empty
        pair = (p[a_idx] << np.int64(32)) | p[b_idx]
        gr = pa.table({"pair": pa.array(pair)}).group_by("pair") \
            .aggregate([([], "count_all")])
        return pa.table({"pair": gr["pair"],
                         "n": gr["count_all"].cast(pa.int64())})

    parts1 = keyed_exchange(ds, "l_orderkey", gen_pairs,
                            empty_result=pair_empty)
    parts1 = [t for t in parts1 if t.num_rows]
    if not parts1:
        return pa.table({"part_a": pa.array([], pa.int64()),
                         "part_b": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64())})
    import ray.data as rd
    pair_ds = rd.from_arrow(parts1)

    def topk_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("pair").aggregate([("n", "sum")])
        pairv = np.asarray(g["pair"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        n = np.asarray(g["n_sum"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        sel = np.lexsort((pairv, -n))[:k]
        return pa.table({"pair": pa.array(pairv[sel]),
                         "n": pa.array(n[sel])})

    parts2 = keyed_exchange(pair_ds, "pair", topk_bucket,
                            empty_result=pair_empty)
    cand = pa.concat_tables([t for t in parts2 if t.num_rows])
    pairv = np.asarray(cand["pair"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    n = np.asarray(cand["n"].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    sel = np.lexsort((pairv, -n))[:k]
    pairv, n = pairv[sel], n[sel]
    return pa.table({"part_a": pa.array(pairv >> np.int64(32)),
                     "part_b": pa.array(pairv & np.int64(0xFFFFFFFF)),
                     "n_orders": pa.array(n)})


def q_cusum_changepoint_events(sf_dir: str, n_ranges: int = 16,
                               sample_mod: int = 17) -> pa.Table:
    """CUSUM change-point per event type — the sequential-anomaly
    primitive (Page 1954): the time index where the cumulative sum of
    cent values deviates most from the type's overall trend.  The
    deviation is kept EXACT by scaling out the rational mean: at row t
    (1-based, (ts, event_id) order), ``dev = |N·cum_t − t·S|`` where S,
    N are the type's total and count — all int64 (envelope guarded:
    N·S must fit; raises loudly past it).  Ties break to the earliest t.
    NULL ts / value / type rows are excluded.

    Distributed as the house two-pass prefix scan (the weighted-sample
    shape): ONE projection scan (type, ts_us, event_id, cents —
    materialized, 32 B/row), a ts range exchange folding per-(range,
    type) count/sum offsets on the driver (ranges × 5 rows), then a
    second pass computing local cumsum + offset and each range's
    argmax per type; the driver reduces ranges × types candidate rows.
    Rows with equal ts land in one range by construction, so the
    (ts, event_id) order is globally consistent."""
    from ..engine.blocks import gather_tables
    from ..engine.exchange import range_exchange

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.and_(pc.is_valid(t["event_type"]),
                               pc.is_valid(t["ts"])),
                       pc.is_valid(t["value"]))
        t = t.filter(mask)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"], "cents": cents})

    pds = ds.map_batches(project, batch_format="pyarrow").materialize()

    def sample_ts(t: pa.Table) -> pa.Table:
        v = np.asarray(t["ts_us"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"ts_us": pa.array(v[v % sample_mod == 0])})

    sv = np.sort(np.concatenate([
        np.asarray(t["ts_us"].to_numpy(zero_copy_only=False))
        for t in gather_tables(
            pds.map_batches(sample_ts, batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0, np.int64)]))
    cuts = equidepth_cutpoints(sv, n_ranges)

    stat_empty = pa.table({"bid": pa.array([], pa.int64()),
                           "event_type": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64()),
                           "s": pa.array([], pa.int64())})

    def _per_type(t: pa.Table):
        """sorted (type_codes, ts, id, cents) + segment starts."""
        et = pc.dictionary_encode(t["event_type"].combine_chunks()
                                  if isinstance(t["event_type"],
                                                pa.ChunkedArray)
                                  else t["event_type"])
        code = np.asarray(et.indices.to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        ts = np.asarray(t["ts_us"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cents = np.asarray(t["cents"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        order = np.lexsort((eid, ts, code))
        return et.dictionary, code[order], ts[order], eid[order], \
            cents[order]

    def stats(bid: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return stat_empty
        vocab, code, _, _, cents = _per_type(t)
        # int64-exact segment sums (bincount's float weights would
        # round past 2^53): code-sorted already, so reduceat per segment
        starts = np.nonzero(np.concatenate(
            [[True], code[1:] != code[:-1]]))[0]
        seg_code = code[starts]
        n = np.zeros(len(vocab), dtype=np.int64)
        s = np.zeros(len(vocab), dtype=np.int64)
        n[seg_code] = np.diff(np.append(starts, len(code)))
        s[seg_code] = np.add.reduceat(cents, starts)
        return pa.table({"bid": pa.array(np.full(len(vocab), bid)),
                         "event_type": vocab.cast(pa.string()),
                         "n": pa.array(n), "s": pa.array(s)})

    stat_parts = [p for p in range_exchange(pds, "ts_us", cuts, stats,
                                            empty_result=stat_empty)
                  if p.num_rows]
    if not stat_parts:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "change_t": pa.array([], pa.int64()),
                         "event_id": pa.array([], pa.int64()),
                         "max_dev": pa.array([], pa.int64())})
    stat = pa.concat_tables(stat_parts)
    types = sorted(set(stat["event_type"].to_pylist()))
    tindex = {ty: i for i, ty in enumerate(types)}
    nb = len(cuts) + 1
    N_off = np.zeros((nb, len(types)), dtype=np.int64)
    S_off = np.zeros((nb, len(types)), dtype=np.int64)
    for bid, ty, n, s in zip(stat["bid"].to_pylist(),
                             stat["event_type"].to_pylist(),
                             stat["n"].to_pylist(),
                             stat["s"].to_pylist()):
        N_off[bid, tindex[ty]] = n
        S_off[bid, tindex[ty]] = s
    N_tot = N_off.sum(axis=0)
    S_tot = S_off.sum(axis=0)
    if np.any(np.abs(N_tot.astype(object) * S_tot.astype(object))
              >= 2**62):
        raise ValueError(
            "cusum deviation arithmetic exceeds int64 (N*S too large) — "
            "shard the scan per type or rescale cents")
    N_pre = np.cumsum(N_off, axis=0) - N_off   # exclusive prefixes
    S_pre = np.cumsum(S_off, axis=0) - S_off

    cand_empty = pa.table({"event_type": pa.array([], pa.string()),
                           "change_t": pa.array([], pa.int64()),
                           "event_id": pa.array([], pa.int64()),
                           "max_dev": pa.array([], pa.int64())})

    def argmax_local(bid: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return cand_empty
        vocab, code, _, eid, cents = _per_type(t)
        out_ty, out_t, out_id, out_dev = [], [], [], []
        starts = np.nonzero(np.concatenate(
            [[True], code[1:] != code[:-1]]))[0]
        bounds = np.append(starts, len(code))
        for si, sj in zip(bounds[:-1], bounds[1:]):
            ty = vocab[code[si]].as_py()
            gi = tindex[ty]
            cum = S_pre[bid, gi] + np.cumsum(cents[si:sj])
            tt = N_pre[bid, gi] + np.arange(1, sj - si + 1,
                                            dtype=np.int64)
            dev = np.abs(N_tot[gi] * cum - tt * S_tot[gi])
            j = int(np.argmax(dev))  # first max = earliest t (tie rule)
            out_ty.append(ty)
            out_t.append(int(tt[j]))
            out_id.append(int(eid[si + j]))
            out_dev.append(int(dev[j]))
        return pa.table({"event_type": pa.array(out_ty, pa.string()),
                         "change_t": pa.array(out_t, pa.int64()),
                         "event_id": pa.array(out_id, pa.int64()),
                         "max_dev": pa.array(out_dev, pa.int64())})

    cand = pa.concat_tables(
        [p for p in range_exchange(pds, "ts_us", cuts, argmax_local,
                                   empty_result=cand_empty)
         if p.num_rows])
    rows = sorted(cand.to_pylist(),
                  key=lambda r: (r["event_type"], -r["max_dev"],
                                 r["change_t"]))
    best, seen = [], set()
    for r in rows:
        if r["event_type"] not in seen:
            seen.add(r["event_type"])
            best.append(r)
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in best],
                               pa.string()),
        "change_t": pa.array([r["change_t"] for r in best], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in best], pa.int64()),
        "max_dev": pa.array([r["max_dev"] for r in best], pa.int64()),
    })


def q_kanonymity_customer(sf_dir: str, k: int = 10) -> pa.Table:
    """k-anonymity audit over the (c_nationkey, c_mktsegment)
    quasi-identifier: every combination shared by fewer than ``k``
    customers is a re-identification risk (Sweeney 2002) — the privacy
    gate a training-data pipeline runs before release.  Emits the
    violating groups with their sizes plus the anonymity floor.

    Per-block partial counts (bounded by the QI domain, nations ×
    segments) → one driver group-sum — the pricing_summary shape; no
    shuffle, no row ever leaves its scan task."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "c_nationkey": g["c_nationkey"].cast(pa.int64()),
            "c_mktsegment": g["c_mktsegment"],
            "n": g["count_all"].cast(pa.int64())})

    parts = [t for t in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if t.num_rows]
    if not parts:
        return pa.table({"c_nationkey": pa.array([], pa.int64()),
                         "c_mktsegment": pa.array([], pa.string()),
                         "group_size": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts).group_by(
        ["c_nationkey", "c_mktsegment"]).aggregate([("n", "sum")])
    mask = pc.less(merged["n_sum"], k)
    bad = merged.filter(mask)
    return pa.table({
        "c_nationkey": bad["c_nationkey"],
        "c_mktsegment": bad["c_mktsegment"],
        "group_size": bad["n_sum"].cast(pa.int64()),
    }).sort_by([("c_nationkey", "ascending"),
                ("c_mktsegment", "ascending")])


def q_orders_rollup(sf_dir: str) -> pa.Table:
    """Hierarchical ROLLUP revenue report over orders: (year, month)
    subtotals, per-year subtotals, and the grand total in one result —
    the OLAP reshape of the plain groupby family.  Distribution is the
    pricing_summary shape: per-block partial aggregates at the FINEST
    grain only (bounded by the date domain, ~7 years x 12 months), one
    driver group-sum, then the coarser levels derive from the finest
    partials EXACTLY (integer cents) — subtotals cost zero extra scan
    and zero shuffle.

    ``lvl`` mirrors SQL ``GROUPING(y, m)`` (one bit per rolled-up
    column: 0 = finest, 1 = year subtotal, 3 = grand total), which is
    what disambiguates a ROLLUP null from a DATA null: a null
    o_orderdate groups at lvl 0 with null year/month, never conflated
    with the rolled-up rows."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({
            "y": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "m": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
            "cents": cents,
        }).group_by(["y", "m"]).aggregate([("cents", "sum"),
                                           ([], "count_all")])
        return pa.table({"y": g["y"], "m": g["m"],
                         "cents": g["cents_sum"],
                         "n": g["count_all"].cast(pa.int64())})

    parts = [p for p in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if p.num_rows]
    empty = pa.table({"lvl": pa.array([], pa.int64()),
                      "o_year": pa.array([], pa.int64()),
                      "o_month": pa.array([], pa.int64()),
                      "revenue_cents": pa.array([], pa.int64()),
                      "n_orders": pa.array([], pa.int64())})
    if not parts:
        return empty
    finest = (pa.concat_tables(parts).group_by(["y", "m"])
              .aggregate([("cents", "sum"), ("n", "sum")]))
    by_year = finest.group_by("y").aggregate([("cents_sum", "sum"),
                                              ("n_sum", "sum")])
    grand_c = pc.sum(finest["cents_sum"]).as_py() or 0
    grand_n = pc.sum(finest["n_sum"]).as_py() or 0

    def level(lvl: int, y, m, c, n) -> pa.Table:
        k = len(c)
        return pa.table({
            "lvl": pa.array([lvl] * k, pa.int64()),
            "o_year": (y if y is not None
                       else pa.array([None] * k, pa.int64())),
            "o_month": (m if m is not None
                        else pa.array([None] * k, pa.int64())),
            "revenue_cents": pa.array(c, pa.int64())
            if isinstance(c, list) else c.cast(pa.int64()),
            "n_orders": pa.array(n, pa.int64())
            if isinstance(n, list) else n.cast(pa.int64())})

    out = pa.concat_tables([
        level(0, finest["y"], finest["m"], finest["cents_sum"],
              finest["n_sum"]),
        level(1, by_year["y"], None, by_year["cents_sum_sum"],
              by_year["n_sum_sum"]),
        level(3, None, None, [grand_c], [grand_n]),
    ])
    # NULLS LAST on every sort key (Arrow default at_end == the mirror's
    # explicit NULLS LAST): data-null year/month rows inside lvl 0 land
    # after the dated ones, deterministically
    return out.take(pc.sort_indices(
        out, sort_keys=[("lvl", "ascending"), ("o_year", "ascending"),
                        ("o_month", "ascending")]))


def q_events_value_ntile(sf_dir: str, tiles: int = 4,
                         n_ranges: int = 16,
                         sample_mod: int = 17) -> pa.Table:
    """Exact distributed NTILE(``tiles``) OVER (PARTITION BY event_type
    ORDER BY cents, event_id) — the quantile-bucket window that needs a
    per-row GLOBAL rank, not just boundaries.  The rank comes from the
    house two-pass prefix scan (the cusum shape): one projection scan,
    a cents range exchange folding per-(range, type) counts on the
    driver (ranges x types rows) into exclusive offsets + per-type
    totals, then a second pass that sorts each range by (type, cents,
    event_id) and adds the offset.  Equal cents land in one range by
    construction, so the (cents, event_id) tie order is globally
    consistent.  The NTILE fill rule is pinned to SQL: with n rows and
    k tiles the first n mod k tiles get ceil(n/k) rows.  NULL
    type/value/id rows are excluded, matching the mirror's WHERE."""
    from ..engine.exchange import range_exchange

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.and_(pc.is_valid(t["event_type"]),
                               pc.is_valid(t["value"])),
                       pc.is_valid(t["event_id"]))
        t = t.filter(mask)
        return pa.table({
            "event_type": t["event_type"],
            "event_id": t["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    pds = ds.map_batches(project, batch_format="pyarrow").materialize()

    def sample_cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["cents"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        return pa.table({"cents": pa.array(v[v % sample_mod == 0])})

    sv = np.sort(np.concatenate([
        np.asarray(t["cents"].to_numpy(zero_copy_only=False))
        for t in gather_tables(
            pds.map_batches(sample_cents, batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0, np.int64)]))
    cuts = equidepth_cutpoints(sv, n_ranges)

    def _sorted_cols(t: pa.Table):
        et = pc.dictionary_encode(
            t["event_type"].combine_chunks()
            if isinstance(t["event_type"], pa.ChunkedArray)
            else t["event_type"])
        code = np.asarray(et.indices.to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cents = np.asarray(t["cents"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((eid, cents, code))
        return et.dictionary, code[order], cents[order], eid[order]

    stat_empty = pa.table({"bid": pa.array([], pa.int64()),
                           "event_type": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64())})

    def stats(bid: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return stat_empty
        vocab, code, _, _ = _sorted_cols(t)
        starts = np.nonzero(np.concatenate(
            [[True], code[1:] != code[:-1]]))[0]
        bounds = np.append(starts, len(code))
        return pa.table({
            "bid": pa.array(np.full(len(starts), bid, np.int64)),
            "event_type": vocab.take(pa.array(code[starts])),
            "n": pa.array(np.diff(bounds).astype(np.int64))})

    stat_parts = [p for p in range_exchange(pds, "cents", cuts, stats,
                                            empty_result=stat_empty)
                  if p.num_rows]
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "tile": pa.array([], pa.int64())})
    if not stat_parts:
        return empty
    st = pa.concat_tables(stat_parts)
    types = sorted(set(st["event_type"].to_pylist()))
    tindex = {ty: i for i, ty in enumerate(types)}
    n_rng = len(cuts) + 1
    counts = np.zeros((n_rng, len(types)), np.int64)
    for b, ty, n in zip(st["bid"].to_pylist(),
                        st["event_type"].to_pylist(),
                        st["n"].to_pylist()):
        counts[b, tindex[ty]] = n
    offsets = np.cumsum(counts, axis=0) - counts  # exclusive over ranges
    totals = counts.sum(axis=0)

    k = int(tiles)
    q_, rem_ = totals // k, totals % k  # per-type fill rule inputs

    def assign(bid: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        vocab, code, _, eid = _sorted_cols(t)
        starts = np.nonzero(np.concatenate(
            [[True], code[1:] != code[:-1]]))[0]
        bounds = np.append(starts, len(code))
        local = np.arange(len(code), dtype=np.int64) - np.repeat(
            bounds[:-1], np.diff(bounds))
        gi = np.array([tindex[vocab[c].as_py()] for c in code[starts]],
                      dtype=np.int64)
        gidx = np.repeat(gi, np.diff(bounds))
        r = offsets[bid, gidx] + local
        qv, rv = q_[gidx], rem_[gidx]
        head = rv * (qv + 1)
        # SQL NTILE: first (n mod k) tiles take ceil(n/k) rows each
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                r < head, r // (qv + 1),
                rv + np.where(qv > 0, (r - head) // np.maximum(qv, 1),
                              0)) + 1
        return pa.table({
            "event_id": pa.array(eid),
            "event_type": vocab.take(pa.array(code)).cast(pa.string()),
            "tile": pa.array(tile.astype(np.int64))})

    out_parts = [p for p in range_exchange(pds, "cents", cuts, assign,
                                           empty_result=empty)
                 if p.num_rows]
    if not out_parts:
        return empty
    return (pa.concat_tables(out_parts).combine_chunks()
            .sort_by([("event_id", "ascending")]))


def q_bfs_hops(sf_dir: str, seed_mod: int = 97,
               max_hops: int = 6) -> pa.Table:
    """Multi-source BFS over the derived 3-out link graph (the
    q_pagerank_documents graph): hop distance from every document to its
    NEAREST seed (doc_id % ``seed_mod`` == 0) capped at ``max_hops`` —
    the influence/propagation primitive (label spreading, crawl-depth
    audits, seed-proximity corpus filters).

    State = the REACHED (doc_id, hops) rows, living in blocks, never on
    the driver.  Round i: every reached row re-emits itself and the
    FRONTIER (hops == i-1) additionally emits (dst, i) along its three
    derived edges — in-block pre-min, then ONE keyed exchange on doc_id
    whose buckets group-min into the next state.  Distances only
    decrease, so the synchronous min-merge rounds equal true BFS layers
    capped at max_hops (nodes first reached at hop h are emitted at
    round h and never improved).  Iterations chain on the exchange's
    reduce refs (``gather=False``), so nothing materializes between
    rounds — the q_pagerank_documents shape.  All arithmetic is int64
    (same envelope note as PageRank), hash-exact vs the unrolled DuckDB
    min-merge mirror."""
    import pyarrow.parquet as pq
    import ray.data

    from ..engine.exchange import keyed_exchange

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nn = np.uint64(n)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "hops": pa.array([], pa.int64())})

    def init(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        seeds = ids[ids % seed_mod == 0]
        return pa.table({"doc_id": pa.array(seeds),
                         "hops": pa.array(np.zeros(len(seeds), np.int64))})

    state = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def min_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("hops", "min")])
        return pa.table({"doc_id": g["doc_id"],
                         "hops": g["hops_min"]}).cast(empty.schema)

    parts: list = []
    for it in range(1, max_hops + 1):
        def emit(t: pa.Table, _h: int = it) -> pa.Table:
            ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                             dtype=np.int64)
            hops = np.asarray(t["hops"].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
            fids = ids[hops == _h - 1].astype(np.uint64)
            dst = [((fids * np.uint64(_PR_OUT) + np.uint64(j))
                    * np.uint64(_PR_MULT) + np.uint64(_PR_SALT))
                   % np.uint64(1 << 32) % nn
                   for j in range(_PR_OUT)]
            out = pa.table({
                "doc_id": pa.array(np.concatenate(
                    [ids] + [d.astype(np.int64) for d in dst])),
                "hops": pa.array(np.concatenate(
                    [hops] + [np.full(len(fids), _h, np.int64)]
                    * _PR_OUT))})
            return min_merge(out)  # in-block pre-min (the combiner)

        ex = keyed_exchange(state.map_batches(emit, batch_format="pyarrow"),
                            "doc_id", min_merge, empty_result=empty,
                            gather=it == max_hops)
        if it == max_hops:
            parts = [p for p in ex if p.num_rows]
        else:
            state = ray.data.from_arrow_refs(ex)
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


def q_value_histogram_events(sf_dir: str, n_bins: int = 20) -> pa.Table:
    """EXACT equi-width histogram of events.value — the reporting
    aggregate behind every profiling UI, kept integer-exact: bin edges
    derive from the exact global [min, max] in cents and
    ``bin = (c - min) * n_bins // (max - min + 1)`` is pure int64, so
    the result is hash-identical under any partitioning (no float bin
    boundaries to disagree about).  Two bounded passes, zero shuffle:
    per-block (min, max, n) partials, then per-block bincount partials
    (n_bins ints each) — the pricing_summary / kanonymity shape.  NULL
    values are excluded and reported in their own row (bin = -1), so
    the histogram still reconciles to count(*)."""
    ds = _read(sf_dir, "events", ["value"])

    def mm(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"lo": pa.array([pc.min(c).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(c).as_py()], pa.int64()),
                         "nn": pa.array([t.num_rows - c.null_count],
                                        pa.int64()),
                         "nu": pa.array([c.null_count], pa.int64())})

    parts = [p for p in gather_tables(
        ds.map_batches(mm, batch_format="pyarrow")) if p.num_rows]
    empty = pa.table({"bin": pa.array([], pa.int64()),
                      "lo_cents": pa.array([], pa.int64()),
                      "hi_cents": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if not parts:
        return empty
    s = pa.concat_tables(parts)
    los = [v for v in s["lo"].to_pylist() if v is not None]
    n_null = sum(s["nu"].to_pylist())
    if not los:
        return (pa.table({"bin": pa.array([-1], pa.int64()),
                          "lo_cents": pa.array([None], pa.int64()),
                          "hi_cents": pa.array([None], pa.int64()),
                          "n": pa.array([n_null], pa.int64())})
                if n_null else empty)
    lo = min(los)
    hi = max(v for v in s["hi"].to_pylist() if v is not None)
    width_den = hi - lo + 1  # integer bin rule: (c-lo)*n_bins // den

    def counts(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        v = np.asarray(c.drop_null().to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        b = (v - lo) * n_bins // width_den
        return pa.table({"bin": pa.array(np.arange(n_bins, dtype=np.int64)),
                         "n": pa.array(np.bincount(b, minlength=n_bins)
                                       .astype(np.int64))})

    cparts = [p for p in gather_tables(
        ds.map_batches(counts, batch_format="pyarrow")) if p.num_rows]
    g = pa.concat_tables(cparts).group_by("bin").aggregate([("n", "sum")])
    gs = g.sort_by([("bin", "ascending")])
    b = np.asarray(gs["bin"].to_numpy(zero_copy_only=False), np.int64)
    n = np.asarray(gs["n_sum"].to_numpy(zero_copy_only=False), np.int64)
    keep = n > 0
    b, n = b[keep], n[keep]
    # integer bin edges: bin k covers cents c with (c-lo)*n_bins//den == k
    lo_edge = lo + (b * width_den + n_bins - 1) // n_bins
    hi_edge = lo + ((b + 1) * width_den - 1) // n_bins
    out = pa.table({"bin": pa.array(b), "lo_cents": pa.array(lo_edge),
                    "hi_cents": pa.array(hi_edge), "n": pa.array(n)})
    if n_null:
        out = pa.concat_tables([pa.table({
            "bin": pa.array([-1], pa.int64()),
            "lo_cents": pa.array([None], pa.int64()),
            "hi_cents": pa.array([None], pa.int64()),
            "n": pa.array([n_null], pa.int64())}), out])
    return out


def q_fd_violations(sf_dir: str) -> pa.Table:
    """Functional-dependency audit (the profiling/constraint-discovery
    check, Papenbrock et al.'s violation form): report every LHS value
    of the CLAIMED dependency o_custkey → o_orderpriority that maps to
    more than one RHS value, with its distinct-RHS count and row count —
    the per-key evidence a data steward needs to accept or reject the
    dependency.

    Scale shape: per-block DISTINCT (lhs, rhs) pair partials plus
    per-block (lhs, rows) counts — the map-side distinct bounds the
    exchange at the distinct-pair count, never the row count — then one
    keyed exchange on lhs whose buckets count distinct RHS per LHS
    exactly (a key's pairs are co-located).  NULL RHS counts as a value
    of its own (two customers differing only by a NULL priority still
    violate); NULL LHS rows group together, SQL-style."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lhs": t["o_custkey"], "rhs": t["o_orderpriority"]})
             .group_by(["lhs", "rhs"]).aggregate([([], "count_all")]))
        return pa.table({"lhs": g["lhs"], "rhs": g["rhs"],
                         "n": g["count_all"].cast(pa.int64())})

    empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                      "n_distinct_rhs": pa.array([], pa.int64()),
                      "n_rows": pa.array([], pa.int64())})

    def audit(t: pa.Table) -> pa.Table:
        # collapse per-block partials, then count distinct RHS per LHS
        g = t.group_by(["lhs", "rhs"]).aggregate([("n", "sum")])
        a = (g.group_by("lhs")
             .aggregate([([], "count_all"), ("n_sum", "sum")]))
        mask = pc.greater(a["count_all"], 1)
        bad = a.filter(mask)
        return pa.table({
            "o_custkey": bad["lhs"].cast(pa.int64()),
            "n_distinct_rhs": bad["count_all"].cast(pa.int64()),
            "n_rows": bad["n_sum_sum"].cast(pa.int64())})

    parts = keyed_exchange(ds.map_batches(partial, batch_format="pyarrow"),
                           "lhs", audit, empty_result=empty)
    if not parts:
        return empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("o_custkey", "ascending")]))


def q_od_violations(sf_dir: str) -> pa.Table:
    """ORDER-dependency audit (Szlichta et al.): within each order, ship
    dates must be non-decreasing in line number — every row that ships
    EARLIER than its predecessor is a violation, reported with both
    dates (the sequential-constraint sibling of the FD audit).

    (l_orderkey, l_linenumber) is NOT unique in this corpus, so the
    window order is made TOTAL with l_shipdate as tiebreak — equal-key
    rows sort by date and thus never violate each other, and the one
    boundary comparison a tie group makes is deterministic; NULLs sort
    last (DuckDB window-ORDER semantics) and null dates never compare.
    One keyed exchange on l_orderkey (a key's lines co-locate),
    bucket-local vectorized lexsort + shifted compare."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_shipdate"])
    empty = pa.table({
        "l_orderkey": pa.array([], pa.int64()),
        "l_linenumber": pa.array([], pa.int64()),
        "l_shipdate": pa.array([], pa.timestamp("us")),
        "prev_shipdate": pa.array([], pa.timestamp("us"))})
    BIG = np.iinfo(np.int64).max

    def audit(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ln_col = t["l_linenumber"].combine_chunks() \
            if isinstance(t["l_linenumber"], pa.ChunkedArray) \
            else t["l_linenumber"]
        ln_valid = np.asarray(ln_col.is_valid())
        ln = np.where(ln_valid, np.asarray(
            ln_col.to_numpy(zero_copy_only=False), dtype=np.float64),
            np.inf).astype(np.float64)
        sd_col = t["l_shipdate"].combine_chunks() \
            if isinstance(t["l_shipdate"], pa.ChunkedArray) \
            else t["l_shipdate"]
        sd_valid = np.asarray(sd_col.is_valid())
        sd = np.asarray(sd_col.cast(pa.int64()).to_numpy(
            zero_copy_only=False))
        sd = np.where(sd_valid, sd, BIG)  # NULLS LAST in the tiebreak
        order = np.lexsort((sd, ln, ok))
        oks, sds, vs = ok[order], sd[order], sd_valid[order]
        same = np.concatenate([[False], oks[1:] == oks[:-1]])
        prev_sd = np.concatenate([[0], sds[:-1]])
        prev_v = np.concatenate([[False], vs[:-1]])
        bad = same & vs & prev_v & (sds < prev_sd)
        if not bad.any():
            return empty
        idx = order[bad]
        return pa.table({
            "l_orderkey": pa.array(ok[idx]),
            "l_linenumber": ln_col.take(pa.array(idx)).cast(pa.int64()),
            "l_shipdate": sd_col.take(pa.array(idx)).cast(
                pa.timestamp("us")),
            "prev_shipdate": pa.array(prev_sd[bad],
                                      pa.timestamp("us"))}) \
            .cast(empty.schema)

    parts = keyed_exchange(ds, "l_orderkey", audit, empty_result=empty)
    if not parts:
        return empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("l_orderkey", "ascending"),
                      ("l_linenumber", "ascending"),
                      ("l_shipdate", "ascending")]))


def q_shipping_priority(sf_dir: str, k: int = 10) -> pa.Table:
    """TPC-H Q3-shaped COMPOSED pipeline (shipping priority): top-k
    unshipped-revenue orders for one market segment — the demo that the
    engine's primitives compose into a real multi-table query rather
    than standing alone.  Revenue stays integer end-to-end in
    cent-x-percent units: ep_cents * (100 - disc_pct).

    Composition: (1) the small dimension filter broadcasts BUILDING
    custkeys via ray.put (no dimension shuffle); (2) orders filter
    date + semi-filter by the broadcast set at the scan; (3) lineitem
    pre-aggregates revenue per orderkey IN the scan block (the
    combiner); (4) one big-big hash_join on orderkey with the group-sum
    AND local top-k pushed into the join reduce via bucket_fn — an
    orderkey's partials co-locate, so per-bucket totals are complete
    and the local top-k is globally sound (the vocab_top_tokens cut
    argument); the driver merges <= buckets x k rows."""
    import ray

    from ..engine.joins import hash_join

    cut = pa.scalar(np.datetime64("1998-01-01", "us"),
                    pa.timestamp("us"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = gather_tables(cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"]), batch_format="pyarrow"))
    keyset = pa.concat_tables([t for t in keys if t.num_rows])
    kref = ray.put(keyset["c_custkey"].combine_chunks())

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        cset = ray.get(kref)
        m = pc.and_(pc.less(t["o_orderdate"], cut),
                    pc.is_in(t["o_custkey"], value_set=cset))
        f = t.filter(m)
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_orderdate": f["o_orderdate"]})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def l_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["l_shipdate"], cut))
        ep = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], 100.0)),
                     pa.int64())
        disc = pc.cast(pc.round(pc.multiply(f["l_discount"], 100.0)),
                       pa.int64())
        rev = pc.multiply_checked(
            ep, pc.subtract(pa.scalar(100, pa.int64()), disc))
        g = (pa.table({"l_orderkey": f["l_orderkey"], "rev": rev})
             .group_by("l_orderkey").aggregate([("rev", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"]})

    def topk_bucket(t: pa.Table) -> pa.Table:
        # Arrow's inner join coalesces the key: the joined slice keeps
        # only the LEFT key column (l_orderkey)
        g = (t.group_by(["l_orderkey", "o_orderdate"])
             .aggregate([("rev", "sum")]))
        out = pa.table({"o_orderkey": g["l_orderkey"],
                        "o_orderdate": g["o_orderdate"],
                        "revenue_cp": g["rev_sum"].cast(pa.int64())})
        order = pc.sort_indices(
            out, sort_keys=[("revenue_cp", "descending"),
                            ("o_orderdate", "ascending"),
                            ("o_orderkey", "ascending")])
        return out.take(order.slice(0, min(k, len(order))))

    joined = hash_join(
        li.map_batches(l_partial, batch_format="pyarrow"),
        orders.map_batches(o_filter, batch_format="pyarrow"),
        left_key="l_orderkey", right_key="o_orderkey",
        bucket_fn=topk_bucket)
    if not joined.num_rows:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_orderdate": pa.array([], pa.timestamp("us")),
                         "revenue_cp": pa.array([], pa.int64())})
    order = pc.sort_indices(
        joined, sort_keys=[("revenue_cp", "descending"),
                           ("o_orderdate", "ascending"),
                           ("o_orderkey", "ascending")])
    return joined.take(order.slice(0, min(k, len(order))))


def q_local_supplier_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q5-shaped CHAINED-join pipeline (local supplier volume):
    1996 revenue by supplier nation in ASIA, counting only orders whose
    customer and supplier share a nation — the demo that big-big
    hash_joins CHAIN (Q3 shows one; this pipes the output of one into
    the left of the next) and that the cross-table equality
    (c_nationkey = s_nationkey) composes from a join plus an in-reduce
    broadcast lookup.

    Plan: orders(1996) ⋈ customer on custkey (hash exchange; bucket_fn
    projects to (o_orderkey, c_nationkey) so only 12 bytes/row leave
    the reduce) → its table feeds the right side of lineitem-partials ⋈
    on orderkey, whose bucket_fn does the supplier nationkey lookup
    (suppkey → nationkey broadcast via ray.put: supplier is 1/10,000 of
    lineitem in TPC-H — switch to a third hash_join if it outgrows
    broadcast), the local-supplier filter, the ASIA filter, and a
    per-nation partial sum — so each join reduce emits ≤ 25 rows.
    Revenue is integer cent×percent throughout."""
    import ray

    from ..engine.joins import hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def _all(ds) -> pa.Table:
        ts = [t for t in gather_tables(ds) if t.num_rows]
        return pa.concat_tables(ts).combine_chunks()

    # tiny dimensions: ASIA nation keys + names
    nation = _all(_read(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"]))
    region = _all(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    asia_rk = region.filter(pc.equal(region["r_name"], "ASIA"))
    nat = nation.filter(pc.is_in(nation["n_regionkey"],
                                 value_set=asia_rk["r_regionkey"]
                                 .combine_chunks()))
    asia_keys = np.sort(np.asarray(
        nat["n_nationkey"].to_numpy(zero_copy_only=False), np.int64))
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))

    supp = _all(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False),
                    np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], sn[so], asia_keys))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_custkey": f["o_custkey"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def proj1(t: pa.Table) -> pa.Table:
        # joined slice keeps the coalesced left key (o_custkey)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_nationkey": t["c_nationkey"]})

    j1 = hash_join(orders.map_batches(o_filter, batch_format="pyarrow"),
                   cust, left_key="o_custkey", right_key="c_custkey",
                   bucket_fn=proj1)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        ep = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                     pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        rev = pc.multiply_checked(
            ep, pc.subtract(pa.scalar(100, pa.int64()), disc))
        g = (pa.table({"l_orderkey": t["l_orderkey"],
                       "l_suppkey": t["l_suppkey"], "rev": rev})
             .group_by(["l_orderkey", "l_suppkey"])
             .aggregate([("rev", "sum")]))
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "l_suppkey": g["l_suppkey"],
                         "rev": g["rev_sum"]})

    def nation_partial(t: pa.Table) -> pa.Table:
        skx, snx, asia = ray.get(supp_ref)
        suppk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                           np.int64)
        cnat = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False),
                          np.int64)
        rev = np.asarray(t["rev"].to_numpy(zero_copy_only=False),
                         np.int64)
        pos = np.searchsorted(skx, suppk)
        pos = np.clip(pos, 0, len(skx) - 1)
        snat = snx[pos]
        keep = (skx[pos] == suppk) & (snat == cnat) \
            & np.isin(snat, asia)
        g = (pa.table({"n_nationkey": pa.array(snat[keep]),
                       "rev": pa.array(rev[keep])})
             .group_by("n_nationkey").aggregate([("rev", "sum")]))
        return pa.table({"n_nationkey": g["n_nationkey"],
                         "rev": g["rev_sum"]})

    import ray.data

    j2 = hash_join(li.map_batches(l_partial, batch_format="pyarrow"),
                   ray.data.from_arrow(j1),
                   left_key="l_orderkey", right_key="o_orderkey",
                   bucket_fn=nation_partial)
    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "revenue_cp": pa.array([], pa.int64())})
    if not j2.num_rows:
        return empty
    g = j2.group_by("n_nationkey").aggregate([("rev", "sum")])
    out = pa.table({
        "n_name": pa.array([names[k] for k in
                            g["n_nationkey"].to_pylist()], pa.string()),
        "revenue_cp": g["rev_sum"].cast(pa.int64())})
    order = pc.sort_indices(out, sort_keys=[("revenue_cp", "descending"),
                                            ("n_name", "ascending")])
    return out.take(order)


def q_event_pairs_within(sf_dir: str, window_s: int = 600) -> pa.Table:
    """Stream-stream (interval) SELF-join: every unordered pair of one
    user's events within ``window_s`` seconds — the bounded-lateness
    join a streaming engine runs with watermarks, expressed batch-side:
    one keyed exchange on user_id co-locates each user's history, then
    a per-bucket vectorized sweep (sort by (ts, event_id), searchsorted
    window end, repeat/arange pair generation — the copurchase trick;
    no Python loop) emits each pair once in time order.  A burst of B
    events inside one window genuinely has B(B-1)/2 pairs — output
    equals the data's truth; the per-key-fits-bucket assumption is the
    documented session-windows one.  NULL user/ts rows drop, matching
    the mirror's WHERE; gap_us is the exact int64 timestamp delta."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    win_us = int(window_s) * 1_000_000
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "event_a": pa.array([], pa.int64()),
                      "event_b": pa.array([], pa.int64()),
                      "gap_us": pa.array([], pa.int64())})

    def project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"]))
        f = t.filter(m)
        return pa.table({"user_id": f["user_id"],
                         "event_id": f["event_id"],
                         "ts_us": pc.cast(f["ts"], pa.int64())})

    def pairs_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                       np.int64)
        ts = np.asarray(t["ts_us"].to_numpy(zero_copy_only=False),
                        np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        # ts is sorted only WITHIN a user segment — shift each segment
        # by (range + window + 1) so the concatenation is globally
        # ascending and a window query can never cross a segment
        is_start = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(is_start) - 1
        rng = int(ts.max() - ts.min()) + win_us + 1
        if seg_id[-1] and rng > (2**62) // int(seg_id[-1]):
            raise ValueError("event_pairs_within: segment-offset "
                             "composite exceeds int64 — shard the "
                             "bucket or shrink the window")
        ts_adj = (ts - ts.min()) + seg_id * rng
        j = np.searchsorted(ts_adj, ts_adj + win_us, side="right")
        cnt = np.maximum(j - np.arange(len(u)) - 1, 0)
        total = int(cnt.sum())
        if not total:
            return empty
        left = np.repeat(np.arange(len(u), dtype=np.int64), cnt)
        off = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        right = left + (np.arange(total, dtype=np.int64)
                        - off[left]) + 1
        ea = np.minimum(eid[left], eid[right])
        eb = np.maximum(eid[left], eid[right])
        return pa.table({"user_id": pa.array(u[left]),
                         "event_a": pa.array(ea),
                         "event_b": pa.array(eb),
                         "gap_us": pa.array(ts[right] - ts[left])})

    parts = keyed_exchange(
        ds.map_batches(project, batch_format="pyarrow"),
        "user_id", pairs_bucket, empty_result=empty)
    if not parts:
        return empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("user_id", "ascending"), ("event_a", "ascending"),
                      ("event_b", "ascending")]))


def _evolved_documents(ds):
    """The deterministic snapshot twin shared by snapshot_diff and
    merkle_diff: every 101st doc deleted, every 103rd survivor's text
    replaced, copies of the first 10 docs appended at +50M."""
    def evolve(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(ids % 101 != 0))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        txt = pc.if_else(pa.array(ids % 103 == 0),
                         pa.scalar("MODIFIED", pa.string()), t["text"])
        t = t.set_column(t.schema.get_field_index("text"),
                         pa.field("text", pa.string()), txt)
        extra = t.filter(pc.less(t["doc_id"], 10))
        extra = extra.set_column(
            0, pa.field("doc_id", pa.int64()),
            pc.add(extra["doc_id"], pa.scalar(50_000_000, pa.int64())))
        return pa.concat_tables([t, extra])

    return ds.map_batches(evolve, batch_format="pyarrow")


def q_merkle_diff_documents(sf_dir: str, range_width: int = 256) -> pa.Table:
    """Merkle-style RANGE-digest diff: localize WHERE two table versions
    diverge in O(ranges) driver state with ZERO shuffle — the
    at-100-TB complement to table_checksum (one digest: "are they
    equal?") and snapshot_diff (row-level: "which rows differ?", a full
    co-partition).  Each side is scanned once; per-block partials fold
    (range_id = doc_id // width) -> (count, sum, xor) of the
    table_checksum row digest (md5-lower-64 masked to 63 bits), and the
    driver compares two range-indexed digest tables, emitting only the
    ranges that disagree — the ranges a targeted snapshot_diff / repair
    re-scan would then touch.

    Exactness of the modular sum under vectorized uint64 accumulation:
    2^64 ≡ 0 (mod 2^63), so natural uint64 wraparound followed by a
    63-bit mask IS the true sum mod 2^63 — no multiprecision needed.
    B-side evolution is the snapshot_diff twin (SQL-mirrored)."""
    cols = ["doc_id", "text"]
    return merkle_diff(_read(sf_dir, "documents", cols),
                       _evolved_documents(_read(sf_dir, "documents",
                                                cols)),
                       key="doc_id", content=["text"],
                       range_width=range_width)


def merkle_range_digest(ds, key: str, content: list[str],
                        range_width: int) -> dict[int, tuple[int, int, int]]:
    """Per-range (count, sum mod 2^63, xor) of the table_checksum row
    digest over ``key // range_width`` — O(ranges) driver state, zero
    shuffle.  Row canonicalization: key|col1|col2... with NULL cells as
    CHR(0) (the table_checksum dialect)."""
    from .conformance import _md5_lower64

    mask = np.uint64(_CKSUM_MOD - 1)

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[key].to_numpy(zero_copy_only=False),
                         np.int64)
        parts = [pc.cast(t[key], pa.string())] + [
            pc.fill_null(pc.cast(t[c], pa.string()), "\x00")
            for c in content]
        row = pc.fill_null(
            pc.binary_join_element_wise(*parts, "|"), "")
        h = _md5_lower64(row.combine_chunks() if isinstance(
            row, pa.ChunkedArray) else row) & mask
        rid = ids // range_width
        ur, inv = np.unique(rid, return_inverse=True)
        n = np.zeros(len(ur), np.int64)
        s = np.zeros(len(ur), np.uint64)
        x = np.zeros(len(ur), np.uint64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, h)          # uint64 wraparound ≡ mod 2^63 ok
        np.bitwise_xor.at(x, inv, h)
        return pa.table({"range_id": pa.array(ur),
                         "n": pa.array(n),
                         "s": pa.array((s & mask).astype(np.int64)),
                         "x": pa.array(x.astype(np.int64))})

    parts = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    mask_i = np.uint64(_CKSUM_MOD - 1)
    out: dict[int, list] = {}
    for p in parts:
        rid = np.asarray(p["range_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        n = np.asarray(p["n"].to_numpy(zero_copy_only=False), np.int64)
        s = np.asarray(p["s"].to_numpy(zero_copy_only=False),
                       np.int64).astype(np.uint64)
        x = np.asarray(p["x"].to_numpy(zero_copy_only=False),
                       np.int64).astype(np.uint64)
        for i in range(len(rid)):  # O(ranges), never O(rows)
            a = out.setdefault(int(rid[i]), [0, 0, 0])
            a[0] += int(n[i])
            # plain-int accumulation masked to 2^64 — intentional
            # wraparound without numpy's scalar-overflow RuntimeWarning
            # (and safe under np.seterr(over='raise')); O(ranges) loop,
            # so scalar Python arithmetic costs nothing
            a[1] = (a[1] + int(s[i])) & 0xFFFFFFFFFFFFFFFF
            a[2] ^= int(x[i])
    return {k: (v[0], v[1] & int(mask_i), v[2])
            for k, v in out.items()}


def merkle_diff(ds_a, ds_b, *, key: str, content: list[str],
                range_width: int = 256) -> pa.Table:
    """Compare two datasets' range digests; emit only disagreeing
    ranges (the ranges a targeted row-level diff / repair re-scan
    would then touch)."""
    da = merkle_range_digest(ds_a, key, content, range_width)
    db = merkle_range_digest(ds_b, key, content, range_width)

    rows = []
    for rid in sorted(set(da) | set(db)):
        a, b = da.get(rid), db.get(rid)
        if a != b:
            rows.append((rid,
                         a[0] if a else None, b[0] if b else None,
                         a[1] if a else None, b[1] if b else None,
                         a[2] if a else None, b[2] if b else None))
    return pa.table({
        "range_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_a": pa.array([r[1] for r in rows], pa.int64()),
        "n_b": pa.array([r[2] for r in rows], pa.int64()),
        "sum_a": pa.array([r[3] for r in rows], pa.int64()),
        "sum_b": pa.array([r[4] for r in rows], pa.int64()),
        "xor_a": pa.array([r[5] for r in rows], pa.int64()),
        "xor_b": pa.array([r[6] for r in rows], pa.int64())})


def q_orders_cube(sf_dir: str) -> pa.Table:
    """Full CUBE over (o_orderstatus, o_orderpriority): all FOUR grouping
    sets in one result — the generalization of q_orders_rollup's linear
    hierarchy (ROLLUP omits the priority-only set, lvl 2, which CUBE
    adds).  Same distribution: per-block partials at the finest grain
    only (bounded by the 3x5 status x priority domain), one driver
    group-sum, every coarser set derived EXACTLY from the finest
    partials — four grouping sets for the price of one scan, zero
    shuffle.  ``lvl`` mirrors SQL GROUPING(s, p): bit 1 = status rolled
    up, bit 0 = priority rolled up."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"s": t["o_orderstatus"],
                      "p": t["o_orderpriority"], "cents": cents}) \
            .group_by(["s", "p"]).aggregate([("cents", "sum"),
                                             ([], "count_all")])
        return pa.table({"s": g["s"], "p": g["p"],
                         "cents": g["cents_sum"],
                         "n": g["count_all"].cast(pa.int64())})

    parts = [p for p in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if p.num_rows]
    empty = pa.table({"lvl": pa.array([], pa.int64()),
                      "o_orderstatus": pa.array([], pa.string()),
                      "o_orderpriority": pa.array([], pa.string()),
                      "revenue_cents": pa.array([], pa.int64()),
                      "n_orders": pa.array([], pa.int64())})
    if not parts:
        return empty
    finest = (pa.concat_tables(parts).group_by(["s", "p"])
              .aggregate([("cents", "sum"), ("n", "sum")]))
    by_s = finest.group_by("s").aggregate([("cents_sum", "sum"),
                                           ("n_sum", "sum")])
    by_p = finest.group_by("p").aggregate([("cents_sum", "sum"),
                                           ("n_sum", "sum")])
    grand_c = pc.sum(finest["cents_sum"]).as_py() or 0
    grand_n = pc.sum(finest["n_sum"]).as_py() or 0

    def level(lvl, s, p, c, n, k):
        nulls = pa.array([None] * k, pa.string())
        return pa.table({
            "lvl": pa.array([lvl] * k, pa.int64()),
            "o_orderstatus": s if s is not None else nulls,
            "o_orderpriority": p if p is not None else nulls,
            "revenue_cents": (pa.array(c, pa.int64())
                              if isinstance(c, list)
                              else c.cast(pa.int64())),
            "n_orders": (pa.array(n, pa.int64())
                         if isinstance(n, list)
                         else n.cast(pa.int64()))})

    out = pa.concat_tables([
        level(0, finest["s"], finest["p"], finest["cents_sum"],
              finest["n_sum"], finest.num_rows),
        level(1, by_s["s"], None, by_s["cents_sum_sum"],
              by_s["n_sum_sum"], by_s.num_rows),
        level(2, None, by_p["p"], by_p["cents_sum_sum"],
              by_p["n_sum_sum"], by_p.num_rows),
        level(3, None, None, [grand_c], [grand_n], 1)])
    return out.sort_by([("lvl", "ascending"),
                        ("o_orderstatus", "ascending"),
                        ("o_orderpriority", "ascending")])


def q_time_weighted_value(sf_dir: str) -> pa.Table:
    """Per-user TIME-WEIGHTED value average — the streaming/ops metric
    where each reading holds until the next one (right-open intervals):
    emitted as the exact integer pair (num_cvus = Σ value_cents·Δt_us,
    den_us = Σ Δt_us) so no float division enters the hash.  One keyed
    exchange on user_id; the bucket lexsorts each user's readings by
    (ts, event_id) and diffs within segments (vectorized shift +
    segment-boundary mask).  Users with a single reading have no
    interval and drop, matching the mirror's HAVING.  Overflow envelope:
    value_cents · user_time_span_us must fit int64 — true by orders of
    magnitude for this corpus (≤6·10^4 cents · ≤3·10^12 us ≈ 2·10^17),
    checked with multiply_checked at runtime."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "num_cvus": pa.array([], pa.int64()),
                      "den_us": pa.array([], pa.int64())})

    def project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(t["user_id"]),
                            pc.is_valid(t["ts"])),
                    pc.is_valid(t["value"]))
        f = t.filter(m)
        return pa.table({
            "user_id": f["user_id"].cast(pa.int64()),
            # NULL event_id sorts LAST among equal timestamps (the
            # mirror's ORDER BY tu, event_id) - a NaN->INT_MIN cast
            # would sort it FIRST (reviewed)
            "event_id": pc.fill_null(f["event_id"].cast(pa.int64()),
                                     (1 << 63) - 1),
            "tu": pc.cast(f["ts"], pa.int64()),
            "vc": pc.cast(pc.round(pc.multiply(f["value"], 100.0)),
                          pa.int64())})

    def twa_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                       np.int64)
        tu = np.asarray(t["tu"].to_numpy(zero_copy_only=False),
                        np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        vc = np.asarray(t["vc"].to_numpy(zero_copy_only=False),
                        np.int64)
        order = np.lexsort((eid, tu, u))
        u, tu, vc = u[order], tu[order], vc[order]
        if len(u) < 2:
            return empty
        same = u[1:] == u[:-1]  # interval stays within one user
        dt = (tu[1:] - tu[:-1])[same]
        vv = vc[:-1][same]
        uu = u[:-1][same]
        if not len(uu):
            return empty
        num = pc.multiply_checked(pa.array(vv), pa.array(dt))
        g = (pa.table({"user_id": pa.array(uu), "num": num,
                       "den": pa.array(dt)})
             .group_by("user_id").aggregate([("num", "sum"),
                                             ("den", "sum")]))
        return pa.table({"user_id": g["user_id"],
                         "num_cvus": g["num_sum"].cast(pa.int64()),
                         "den_us": g["den_sum"].cast(pa.int64())})

    parts = keyed_exchange(
        ds.map_batches(project, batch_format="pyarrow"),
        "user_id", twa_bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("user_id", "ascending")]))


def q_expectation_suite_lineitem(sf_dir: str) -> pa.Table:
    """Expectation-suite REPORT CARD over lineitem — the
    Great-Expectations-style surface a validation engine owes its
    users: a named battery of table expectations evaluated in ONE fused
    scan (every countable check folds per block in the same pass —
    the flagship's fused-scan design exposed as a standalone operator)
    plus the one check that genuinely needs a shuffle (composite-key
    uniqueness via the bounded raw-task exchange, keys packed
    orderkey*8+linenumber — linenumber is 1..7 here; the pack is
    range-asserted).  Output: (check_name, n_violations, passed), where
    uniqueness counts EXTRA rows beyond each key's first.  The
    (l_orderkey, l_linenumber) pair is genuinely non-unique in this
    corpus, so the suite reports a real failure, not a formality."""
    from ..engine.checks import uniqueness_violations

    cut = pa.scalar(np.datetime64("1995-01-01", "us"),
                    pa.timestamp("us"))
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_discount", "l_returnflag", "l_extendedprice",
                "l_shipdate"])

    def counts(t: pa.Table) -> pa.Table:
        def bad(ok_mask) -> int:
            # violations = rows NOT passing (NULL fails an expectation)
            return t.num_rows - int(
                pc.sum(pc.cast(pc.fill_null(ok_mask, False),
                               pa.int64())).as_py() or 0)

        vals = {
            "n": t.num_rows,
            "null_qty": int(pc.sum(pc.cast(
                pc.is_null(t["l_quantity"]), pa.int64())).as_py() or 0),
            "disc": bad(pc.and_(
                pc.greater_equal(t["l_discount"], 0.0),
                pc.less_equal(t["l_discount"], 1.0))),
            "enum": bad(pc.is_in(
                t["l_returnflag"],
                value_set=pa.array(["A", "N", "R"]))),
            "pos": bad(pc.greater(t["l_extendedprice"], 0.0)),
            "ship": bad(pc.greater_equal(t["l_shipdate"], cut)),
        }
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in vals.items()})

    parts = [p for p in gather_tables(
        ds.map_batches(counts, batch_format="pyarrow")) if p.num_rows]
    tot = {k: sum(int(p[k][0].as_py()) for p in parts)
           for k in ("n", "null_qty", "disc", "enum", "pos", "ship")}

    keyed = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pack(t: pa.Table) -> pa.Table:
        ln = pc.cast(t["l_linenumber"], pa.int64())
        # explicit None checks: `or`-coercion would swallow a falsy 0
        # minimum, and a NULL linenumber would pack to a NULL key that
        # collapses (orderkey, NULL) across DIFFERENT orderkeys — both
        # diverge silently from the mirror's GROUP BY pair, so refuse.
        lo, hi = pc.min(ln).as_py(), pc.max(ln).as_py()
        if t.num_rows and (
                lo is None or int(pc.sum(pc.cast(
                    pc.is_null(ln), pa.int64())).as_py() or 0) > 0
                or lo < 1 or hi > 7):
            raise ValueError("expectation_suite: NULL linenumber or value "
                             "outside 1..7 — widen the key pack or fall "
                             "back to the string-concat canonical key")
        return pa.table({"k": pc.add(
            pc.multiply_checked(pc.cast(t["l_orderkey"], pa.int64()),
                                pa.scalar(8, pa.int64())), ln)})

    dup = uniqueness_violations(
        keyed.map_batches(pack, batch_format="pyarrow"), "k")
    n_extra = 0
    if dup.num_rows:
        n_extra = int(pc.sum(pc.subtract(
            dup["n_docs"].cast(pa.int64()),
            pa.scalar(1, pa.int64()))).as_py() or 0)

    rows = [
        ("discount_between_0_and_1", tot["disc"]),
        ("extendedprice_positive", tot["pos"]),
        ("quantity_not_null", tot["null_qty"]),
        ("returnflag_in_enum", tot["enum"]),
        ("row_count_at_least_1000", 0 if tot["n"] >= 1000 else 1),
        ("shipdate_after_1995", tot["ship"]),
        ("unique_orderkey_linenumber", n_extra),
    ]
    return pa.table({
        "check_name": pa.array([r[0] for r in rows], pa.string()),
        "n_violations": pa.array([r[1] for r in rows], pa.int64()),
        "passed": pa.array([r[1] == 0 for r in rows], pa.bool_())})


_SSSP_WMULT = 2654435761
_SSSP_WSALT = 7
_SSSP_WMOD = 97


def q_sssp_weighted(sf_dir: str, seed_mod: int = 97,
                    rounds: int = 4) -> pa.Table:
    """Multi-source WEIGHTED shortest paths (Bellman-Ford, ``rounds``
    synchronous relaxation rounds ⇒ exact shortest distance using ≤
    ``rounds`` edges) over the pagerank-derived 3-out graph with
    deterministic integer edge weights w(src, dst) =
    ((src·131 + dst)·2654435761 + 7) % 97 + 1 — the weighted completion
    of the graph family next to BFS hops (min-hop), PageRank, triangles
    and components.

    Unlike BFS, a weighted distance CAN improve after first discovery,
    so there is NO frontier filter: every current row re-relaxes each
    round (the Bellman-Ford invariant; BFS's frontier cut is the
    unweighted special case).  Each round: in-block pre-min combiner →
    ONE keyed exchange group-min, rounds chained on reduce refs
    (gather=False) so nothing materializes between rounds.  Weight
    arithmetic reduces mod WMOD BEFORE the multiplier ((a·M+S)%W ≡
    ((a%W)·(M%W)+S)%W), so uint64 equals the mirror's HUGEINT math up
    to ~1.4·10^17 docs (the naive product wraps at ~5·10^7)."""
    import pyarrow.parquet as pq
    import ray.data

    from ..engine.exchange import keyed_exchange

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nn = np.uint64(n)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})

    def init(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        seeds = ids[ids % seed_mod == 0]
        return pa.table({"doc_id": pa.array(seeds),
                         "dist": pa.array(
                             np.zeros(len(seeds), np.int64))})

    state = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def min_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("dist", "min")])
        return pa.table({"doc_id": g["doc_id"],
                         "dist": g["dist_min"]}).cast(empty.schema)

    def relax(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64).astype(np.uint64)
        dist = np.asarray(t["dist"].to_numpy(zero_copy_only=False),
                          np.int64)
        outs = [pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                          "dist": pa.array(dist)})]
        for j in range(_PR_OUT):
            dst = ((ids * np.uint64(_PR_OUT) + np.uint64(j))
                   * np.uint64(_PR_MULT) + np.uint64(_PR_SALT)) \
                % np.uint64(1 << 32) % nn
            # reduce mod WMOD BEFORE the big multiply: (a*M+S)%W ==
            # ((a%W)*(M%W)+S)%W, and a = ids*131+dst stays exact in
            # uint64 up to ~1.4e17 docs - the naive product would wrap
            # (and silently diverge from the HUGEINT mirror) past
            # ~5e7 docs (reviewed)
            w = ((ids * np.uint64(131) + dst) % np.uint64(_SSSP_WMOD)
                 * (np.uint64(_SSSP_WMULT) % np.uint64(_SSSP_WMOD))
                 + np.uint64(_SSSP_WSALT)) \
                % np.uint64(_SSSP_WMOD) + np.uint64(1)
            outs.append(pa.table({
                "doc_id": pa.array(dst.astype(np.int64)),
                "dist": pa.array(dist + w.astype(np.int64))}))
        return min_merge(pa.concat_tables(outs))

    parts: list = []
    for it in range(1, rounds + 1):
        ex = keyed_exchange(
            state.map_batches(relax, batch_format="pyarrow"),
            "doc_id", min_merge, empty_result=empty,
            gather=it == rounds)
        if it == rounds:
            parts = [p for p in ex if p.num_rows]
        else:
            state = ray.data.from_arrow_refs(ex)
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


def q_repair_lineitem(sf_dir: str) -> pa.Table:
    """Schema-driven data REPAIR — the fix-instead-of-drop sibling of
    validate_quarantine, applying LINEITEM_CHECK_SCHEMA's own rules as
    repairs: quantity clamps into [1, 25], discount into [0, 0.05],
    out-of-enum returnflag defaults to 'N' (NULLs pass through
    unrepaired — repair never invents data).  ONE fused scan emits
    per-block (repair counts + content digest partials) — the report
    proves the repaired CONTENT, not just the counts: (sum, xor) of the
    md5-lower-64 over the canonical repaired row
    key|line|qty_cents|disc_cents|flag, merged with the merkle/checksum
    wraparound-exact modular sum.  Zero shuffle, O(1) output."""
    from .conformance import _md5_lower64

    mask = np.uint64(_CKSUM_MOD - 1)
    ds = _read(sf_dir, "lineitem", LINEITEM_COLS)

    def partial(t: pa.Table) -> pa.Table:
        qty, disc, flag = t["l_quantity"], t["l_discount"], \
            t["l_returnflag"]
        # min/max_element_wise SKIP nulls (null -> the bound): gate on
        # validity so a NULL digests as the NULL sentinel, never as an
        # invented 1.0/0.0 (reviewed)
        q_rep = pc.if_else(
            pc.is_valid(qty),
            pc.min_element_wise(pc.max_element_wise(qty, 1.0), 25.0),
            qty)
        d_rep = pc.if_else(
            pc.is_valid(disc),
            pc.min_element_wise(pc.max_element_wise(disc, 0.0), 0.05),
            disc)
        # Arrow's is_in maps NULL -> False (not NULL): gate on validity
        # explicitly so NULL flags pass through unrepaired
        f_bad = pc.and_(pc.is_valid(flag),
                        pc.invert(pc.fill_null(pc.is_in(
                            flag, value_set=pa.array(["A", "N"])),
                            False)))
        f_rep = pc.if_else(f_bad, pa.scalar("N", pa.string()), flag)
        n_q = int(pc.sum(pc.cast(pc.fill_null(pc.not_equal(
            qty, q_rep), False), pa.int64())).as_py() or 0)
        n_d = int(pc.sum(pc.cast(pc.fill_null(pc.not_equal(
            disc, d_rep), False), pa.int64())).as_py() or 0)
        n_f = int(pc.sum(pc.cast(f_bad, pa.int64())).as_py() or 0)
        row = pc.fill_null(pc.binary_join_element_wise(
            pc.cast(t["l_orderkey"], pa.string()),
            pc.cast(t["l_linenumber"], pa.string()),
            pc.fill_null(pc.cast(pc.cast(pc.round(pc.multiply(
                q_rep, 100.0)), pa.int64()), pa.string()), "\x00"),
            pc.fill_null(pc.cast(pc.cast(pc.round(pc.multiply(
                d_rep, 100.0)), pa.int64()), pa.string()), "\x00"),
            pc.fill_null(f_rep, "\x00"), "|"), "")
        h = _md5_lower64(row.combine_chunks() if isinstance(
            row, pa.ChunkedArray) else row) & mask
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "n_clamped_quantity": pa.array([n_q], pa.int64()),
            "n_clamped_discount": pa.array([n_d], pa.int64()),
            "n_defaulted_returnflag": pa.array([n_f], pa.int64()),
            "s": pa.array([int(np.uint64(h.sum()) & mask)], pa.int64()),
            "x": pa.array([int(np.bitwise_xor.reduce(h))
                           if len(h) else 0], pa.int64())})

    parts = [p for p in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if p.num_rows]
    tot = {k: sum(int(p[k][0].as_py()) for p in parts)
           for k in ("n_rows", "n_clamped_quantity",
                     "n_clamped_discount", "n_defaulted_returnflag")}
    # plain-int merge masked to 2^64 (intentional wraparound without
    # numpy scalar-overflow warnings); O(parts) driver loop
    s = 0
    x = 0
    for p in parts:
        s = (s + int(p["s"][0].as_py())) & 0xFFFFFFFFFFFFFFFF
        x ^= int(p["x"][0].as_py())
    rows = [("n_clamped_discount", tot["n_clamped_discount"]),
            ("n_clamped_quantity", tot["n_clamped_quantity"]),
            ("n_defaulted_returnflag", tot["n_defaulted_returnflag"]),
            ("n_rows", tot["n_rows"]),
            ("repaired_sum_lo63", s & int(mask)),
            ("repaired_xor_lo63", x)]
    return pa.table({
        "metric": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.int64())})


def q_forget_user_events(sf_dir: str, n_ranges: int = 6,
                         sample_mod: int = 17) -> pa.Table:
    """Right-to-be-forgotten KEYED delete — the compliance primitive
    next to retention_delete's range TTL: erase every event of one user
    (here the smallest user_id, so the target exists at every scale)
    from a sorted export by feeding their event keys as a delete
    changeset through ``upsert_sorted`` — only the ranges containing
    the user's keys rewrite; untouched parts stay byte-identical.

    The report carries the PROOF, not just the plan: ``n_after_total``
    and ``n_user_after`` are counted by RE-SCANNING the rewritten
    export's files, while the mirror derives them arithmetically — a
    rewrite bug (row lost, row kept) breaks the hash match."""
    import hashlib
    import json
    import shutil

    import pyarrow.parquet as pq

    events = _read(sf_dir, "events", ["event_id", "user_id"])

    # target: smallest non-null user_id (per-block min partials)
    def min_user(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["user_id"]))
        if not f.num_rows:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array(
            [int(pc.min(f["user_id"]).as_py())], pa.int64())})

    mins = [p for p in gather_tables(events.map_batches(
        min_user, batch_format="pyarrow")) if p.num_rows]
    out_schema = pa.table({"metric": pa.array([], pa.string()),
                           "value": pa.array([], pa.int64())})
    if not mins:
        return out_schema
    target = min(int(pc.min(p["m"]).as_py()) for p in mins)

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "yaschva_forget", tag)
    shutil.rmtree(out_dir, ignore_errors=True)  # mutating op: fresh run
    cutpoints = _cutpoints_footer_or_sample(
        sf_dir, "events", "event_id", events, n_ranges, sample_mod)
    sorted_export(events, "event_id", out_dir, cutpoints)

    keys = _sorted_table(events.map_batches(
        lambda t: t.filter(pc.equal(t["user_id"], target))
        .select(["event_id"]), batch_format="pyarrow"), ["event_id"])
    n_forgotten = keys.num_rows
    if n_forgotten:
        upsert_sorted(out_dir, pa.table({
            "event_id": keys["event_id"],
            "user_id": pa.nulls(n_forgotten, pa.int64()),
            "op": pa.array(["delete"] * n_forgotten, pa.string())}))

    # absence PROOF: re-scan the rewritten export itself
    with open(os.path.join(out_dir, "manifest.json")) as f:
        m = json.load(f)
    files = [r["path"] for r in m["ranges"]
             if os.path.exists(r["path"])]
    import ray.data

    after = ray.data.read_parquet(files, columns=["user_id"])

    def counts(t: pa.Table) -> pa.Table:
        n_user = int(pc.sum(pc.cast(pc.fill_null(pc.equal(
            t["user_id"], target), False), pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "nu": pa.array([n_user], pa.int64())})

    cparts = [p for p in gather_tables(after.map_batches(
        counts, batch_format="pyarrow")) if p.num_rows]
    n_after = sum(int(p["n"][0].as_py()) for p in cparts)
    n_user_after = sum(int(p["nu"][0].as_py()) for p in cparts)

    rows = [("n_after_total", n_after),
            ("n_before_total", n_after + n_forgotten),
            ("n_forgotten", n_forgotten),
            ("n_user_after", n_user_after),
            ("target_user", target)]
    return pa.table({
        "metric": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.int64())})


def q_equidepth_events(sf_dir: str, k: int = 10) -> pa.Table:
    """EXACT equi-depth (quantile) histogram of events.value — the
    profiling twin of the equi-width q_value_histogram_events: k bins
    of (as close as possible to) equal COUNT, defined as NTILE(k) over
    the total order (cents, event_id) and reported per tile as
    (n, lo_cents, hi_cents).  Computed with ZERO per-row work: the
    counting exchange's (cents, count) partials (bounded by distinct
    cents, never rows) merge on the driver, and every tile's count and
    value bounds fall out of the cumulative distribution by rank
    arithmetic — NTILE's fill rule (first n mod k tiles take one extra
    row) is pure arithmetic on ranks, and a distinct value straddling a
    tile boundary contributes its value to both tiles' bounds exactly
    as the row-level NTILE would."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["value"]))
        cents = pc.cast(pc.round(pc.multiply(f["value"], 100.0)),
                        pa.int64())
        g = pa.table({"cents": cents}).group_by("cents").aggregate(
            [([], "count_all")])
        return pa.table({"cents": g["cents"],
                         "n": g["count_all"].cast(pa.int64())})

    parts = [b for b in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if b.num_rows]
    empty = pa.table({"tile": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "lo_cents": pa.array([], pa.int64()),
                      "hi_cents": pa.array([], pa.int64())})
    if not parts:
        return empty
    g = (pa.concat_tables(parts).group_by("cents")
         .aggregate([("n", "sum")]).sort_by([("cents", "ascending")]))
    cents = np.asarray(g["cents"].to_numpy(zero_copy_only=False),
                       np.int64)
    cnt = np.asarray(g["n_sum"].to_numpy(zero_copy_only=False),
                     np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    if n == 0:
        return empty
    base, extra = divmod(n, k)
    # tile i (1-based) covers ranks [start_i, end_i): the first `extra`
    # tiles take base+1 rows (SQL NTILE's fill rule)
    sizes = np.full(k, base, np.int64)
    sizes[:extra] += 1
    ends = np.cumsum(sizes)
    starts = ends - sizes
    occupied = sizes > 0  # n < k leaves trailing empty tiles -> omitted
    # value at rank r = cents[searchsorted(cum, r+1)]
    lo = cents[np.searchsorted(cum, starts[occupied] + 1)]
    hi = cents[np.searchsorted(cum, ends[occupied])]
    tiles = (np.arange(k, dtype=np.int64) + 1)[occupied]
    return pa.table({"tile": pa.array(tiles),
                     "n": pa.array(sizes[occupied]),
                     "lo_cents": pa.array(lo),
                     "hi_cents": pa.array(hi)})
