"""Distributed joins Ray Data lacks natively (build-brief custom operators).

As-of join: for each left row, the latest right row with the same key and
``right_ts <= left_ts``.  Shape: BOTH sides hash-partition on the join key
with the same raw-task ``num_returns`` exchange the uniqueness check uses
(fixed bucket count, one shuffle each side); each bucket task runs a
vectorized ``pandas.merge_asof`` over its co-located key groups.  The
default partitioning assumption: a key's rows fit one bucket task — keys
are customers/users, so a single key's history is small; bucket COUNT
handles total volume.  ``skew_split=True`` lifts the assumption by
time-banding hot keys with boundary-carry exactness (asof_join
docstring).

Bucket sizing: when the caller doesn't pass ``num_buckets``, it is derived
from the datasets' estimated in-memory bytes so a bucket's reduce input
targets ``_TARGET_BUCKET_BYTES`` — a forgotten parameter no longer means a
1/16-of-the-data task at scale.  When ``out_dir`` is passed, each bucket
task writes its own parquet part (tmp + atomic rename) and only a small
manifest is gathered — the 100 TB path; without it the joined table is
gathered (callers project/sort small results).
"""

from __future__ import annotations

import logging
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TARGET_BUCKET_BYTES = 64 << 20  # reduce-task input target
_MIN_BUCKETS, _MAX_BUCKETS = 8, 512

# The DEFAULT as-of path and session windows assume ONE key's rows fit
# one bucket task (keys are users/customers; bucket COUNT handles
# volume).  Each bucket logs its max single-key row count when it
# crosses this threshold (house no-silent-caps rule).  Both operators
# now also offer ``skew_split=True``, which REMOVES the assumption:
# asof_join time-bands hot keys with boundary-carry right rows
# (asof_join docstring); session_windows time-bands and chain-merges
# band-edge sessions on the driver (windows.session_windows docstring).
_HOT_KEY_WARN_ROWS = 1_000_000

# hash_join skew split: per-block heavy-hitter partial size and the
# hot-key row threshold (a key with more rows than this on either side
# gets grid-split across reduce tasks) — helpers live below hash_join
_SKEW_TOPK = 4096
_SKEW_MAX_KEY_ROWS = 1_000_000

# asof_join skew split: reserved time-band column (the equi-join grid's
# "__cell" sibling) — helpers live below the hash_join skew section
_BAND_COL = "__band"


def _warn_hot_key(t: pa.Table, key: str, op: str, bucket_id: int) -> None:
    """Log the bucket's largest key group if it looks hot (vectorized
    value_counts; O(bucket rows), negligible next to the join itself)."""
    try:
        vc = pc.value_counts(t[key])
        counts = vc.field("counts")
        top = int(pc.max(counts).as_py() or 0)
        if top > _HOT_KEY_WARN_ROWS:
            top_key = vc.field("values")[
                int(pc.index(counts, pc.max(counts)).as_py())].as_py()
            _LOG.warning(
                "%s bucket %d: key %r has %d rows in one bucket task "
                "(threshold %d) — the one-key-per-bucket-task assumption "
                "is under pressure; consider more buckets or pre-splitting "
                "this key", op, bucket_id, top_key, top, _HOT_KEY_WARN_ROWS)
    except Exception:  # observability must never fail the join
        pass


def _estimate_bytes(ds) -> int | None:
    """Best-effort in-memory size WITHOUT executing the dataset: walk the
    logical plan toward the leaf read until some operator can infer a
    size (map stages report None but their source read estimates — a fine
    proxy for exchange sizing), else source-file bytes × 4 (parquet's
    typical in-memory inflation)."""
    try:
        dag = ds._logical_plan.dag
        for _ in range(64):  # bounded walk to the leaf
            sz = dag.infer_metadata().size_bytes
            if sz is not None:
                return int(sz)
            deps = getattr(dag, "input_dependencies", None)
            if not deps:
                break
            dag = deps[0]
    except Exception:
        pass
    try:
        files = ds.input_files()
        if files:
            return 4 * sum(os.path.getsize(f) for f in files
                           if os.path.exists(f))
    except Exception:
        pass
    return None


def _auto_buckets(*dss) -> int:
    sizes = [_estimate_bytes(d) for d in dss]
    if any(s is None for s in sizes):
        return 16
    return int(min(_MAX_BUCKETS,
                   max(_MIN_BUCKETS,
                       math.ceil(sum(sizes) / _TARGET_BUCKET_BYTES))))


def _sink_bucket(table: pa.Table, out_dir: str, bucket_id: int) -> pa.Table:
    """Write one bucket's join output as its own parquet part (tmp + atomic
    rename so a retried task never leaves a half-written file); return a
    one-row manifest."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"bucket-{bucket_id:05d}.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return pa.table({"bucket": pa.array([bucket_id], pa.int32()),
                     "n_rows": pa.array([table.num_rows], pa.int64()),
                     "path": pa.array([path], pa.string())})


def _hash_slices(t: pa.Table, key: str, num_buckets: int) -> list[pa.Table]:
    """Split a block's rows into hash(key)%B slices (map half)."""
    from .sketches import _hash64

    karr = t[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    buckets = (_hash64(karr) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    st = t.take(pa.array(order))
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    return [st.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)]


_MAP_REMOTE = None
_REDUCE_REMOTE = None


def _map_block(block: pa.Table, key: str, num_buckets: int):
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if key not in block.column_names:
        # Ray emits SCHEMA-LESS empty blocks for empty map outputs —
        # route them as empty slices (reduce drops zero-row parts)
        out = [pa.table({})] * num_buckets
        return out if num_buckets > 1 else out[0]
    out = _hash_slices(block, key, num_buckets)
    return out if num_buckets > 1 else out[0]


def _asof_bucket(n_left: int, left_key: str, right_key: str,
                 left_ts: str, right_ts: str, bucket_id: int,
                 out_dir: str | None, use_band: bool, direction: str,
                 *parts: pa.Table) -> pa.Table:
    import pandas as pd  # noqa: F401

    from .sketches import limit_worker_threads

    limit_worker_threads()
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rall = parts[n_left:]
    rparts = [p for p in rall if p.num_rows]
    # a part can be a SCHEMA-LESS pa.table({}): Ray routes empty map blocks
    # through _map_block's key-missing path, and a concat round whose slices
    # are all empty returns pa.table({}).  Take the right schema from the
    # first part that actually carries one — rall[0] may not.
    right_schema = next((p.schema for p in rall if p.num_columns), None)
    if lparts and right_schema is not None:
        shared = (set(lparts[0].column_names) & set(right_schema.names)) \
            - ({_BAND_COL} if use_band else set())
        if shared:
            # pandas would suffix _x/_y, the empty-right path would not —
            # two bucket schemas that cannot concat; demand disjoint names
            raise ValueError(
                f"asof_join requires disjoint column names on the two "
                f"sides; shared: {sorted(shared)}")
    if not lparts:
        merged_t = pa.table({})
    else:
        left_all = pa.concat_tables(lparts).combine_chunks()
        # SQL ASOF LEFT JOIN null semantics: a NULL left key or ts
        # satisfies no inequality — the row emits with typed-null right
        # columns; a NULL right key or ts matches nothing and drops
        # before the merge (pandas merge_asof would otherwise reject
        # null merge keys outright)
        lvalid = pc.and_(pc.is_valid(left_all[left_key]),
                         pc.is_valid(left_all[left_ts]))
        left_valid_t = left_all.filter(lvalid)
        left_null_t = left_all.filter(pc.invert(lvalid))
        right_all = None
        if rparts:
            r = pa.concat_tables(rparts).combine_chunks()
            r = r.filter(pc.and_(pc.is_valid(r[right_key]),
                                 pc.is_valid(r[right_ts])))
            right_all = r if r.num_rows else None
        if right_all is None:
            # no (valid) right rows in this bucket: every left row takes
            # the typed-null path — fabricating pandas NaT here produced
            # datetime64[ns] columns other buckets' timestamp[us]/date32
            # schemas could not unify with
            left_null_t = left_all
            left_valid_t = left_all.slice(0, 0)
        pieces = []
        if left_valid_t.num_rows:
            import pandas as pd

            def _key_compat(tbl: pa.Table, col: str):
                # date32/date64 hit pandas as object dtype, which
                # merge_asof rejects — cast to timestamp[us] for the
                # merge (lossless: dates are midnights)
                f = tbl.schema.field(col)
                if pa.types.is_date(f.type):
                    i = tbl.schema.get_field_index(col)
                    return tbl.set_column(
                        i, pa.field(col, pa.timestamp("us")),
                        tbl[col].cast(pa.timestamp("us"))), f.type
                return tbl, None

            left_t, l_orig = _key_compat(left_valid_t, left_ts)
            right_t, _ = _key_compat(right_all, right_ts)
            if not use_band:
                _warn_hot_key(left_t, left_key, "asof_join(left)",
                              bucket_id)
                _warn_hot_key(right_t, right_key, "asof_join(right)",
                              bucket_id)
            left = left_t.to_pandas()
            left = left.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
            right = right_t.to_pandas()
            # stable sort: among equal (key, ts) right rows merge_asof
            # takes the LAST — callers should select tie-independent
            # output columns
            right = right.sort_values(right_ts, kind="mergesort").reset_index(drop=True)
            # band mode (skew_split): hot keys were time-banded at the
            # map; the (key, band) composite co-locates each band with
            # its carry-in right row, so the per-band merge is exact
            lby = [left_key, _BAND_COL] if use_band else left_key
            rby = [right_key, _BAND_COL] if use_band else right_key
            merged = pd.merge_asof(left, right, left_on=left_ts,
                                   right_on=right_ts,
                                   left_by=lby, right_by=rby,
                                   direction=direction)
            merged_t = pa.Table.from_pandas(merged, preserve_index=False)
            # restore right-side columns' ORIGINAL arrow types: merge_asof
            # leaves unmatched rows NaN/NaT (widening ints to double,
            # dates to datetime64), and buckets with different match
            # patterns would otherwise fail to unify at the final concat
            for f in right_schema:
                col = f.name
                if col not in merged_t.column_names:
                    continue
                arr = merged_t[col]
                if arr.type == f.type:
                    continue
                if pa.types.is_floating(arr.type) and \
                        not pa.types.is_floating(f.type):
                    arr = pc.if_else(pc.is_nan(arr),
                                     pa.scalar(None, arr.type), arr)
                i = merged_t.schema.get_field_index(col)
                merged_t = merged_t.set_column(i, pa.field(col, f.type),
                                               arr.cast(f.type))
            if l_orig is not None and left_ts in merged_t.column_names:
                # cast a date left_ts back from the merge's timestamp[us]
                # so this piece concats with the typed-null piece (and
                # with buckets that took the empty-right path)
                i = merged_t.schema.get_field_index(left_ts)
                merged_t = merged_t.set_column(
                    i, pa.field(left_ts, l_orig),
                    merged_t[left_ts].cast(l_orig))
            if use_band and _BAND_COL in merged_t.column_names:
                merged_t = merged_t.drop_columns([_BAND_COL])
            pieces.append(merged_t)
        if left_null_t.num_rows:
            order = pc.sort_indices(left_null_t,
                                    sort_keys=[(left_ts, "ascending")])
            lt = left_null_t.take(order)
            if use_band and _BAND_COL in lt.column_names:
                lt = lt.drop_columns([_BAND_COL])
            for f in (right_schema or []):
                if use_band and f.name == _BAND_COL:
                    continue
                lt = lt.append_column(
                    pa.field(f.name, f.type), pa.nulls(lt.num_rows, f.type))
            pieces.append(lt)
        merged_t = (pa.concat_tables(pieces, promote_options="default")
                    .combine_chunks() if pieces else pa.table({}))
    if out_dir is not None:
        return _sink_bucket(merged_t, out_dir, bucket_id)
    return merged_t


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, num_buckets: int | None = None,
              out_dir: str | None = None, skew_split: bool = False,
              max_key_rows: int = _SKEW_MAX_KEY_ROWS,
              max_bands: int = 64,
              direction: str = "backward") -> pa.Table:
    """As-of join, per key: ``direction="backward"`` (default) takes the
    LATEST right row at or before each left row's timestamp;
    ``direction="forward"`` the EARLIEST right row at or after it (the
    symmetric variant — DuckDB's ASOF with the inequality flipped).
    ``num_buckets=None`` derives B from the inputs'
    estimated bytes (per-bucket target ``_TARGET_BUCKET_BYTES``).  With
    ``out_dir`` each bucket writes its own parquet part and a small manifest
    table (bucket, n_rows, path) is returned — the at-scale path; otherwise
    the joined table is gathered.

    NULL semantics (pinned, three-valued logic): a NULL key or timestamp
    on the left matches nothing and emits with typed-null right columns;
    a NULL key or timestamp on the right matches nothing and drops.
    (DuckDB's own ASOF operator leaks its sort order here — its keyed
    path treats NULL ts as +inf and can even match a NULL right ts —
    so the engine pins the principled rule instead of the quirk.)

    ``skew_split=True`` removes the one-key-fits-one-bucket-task
    assumption: a heavy-hitter counting pre-pass over snapshotted block
    refs finds keys whose row count exceeds ``max_key_rows`` on either
    side; a second sampling pre-pass over the SAME pinned refs draws
    their timestamp distribution and cuts each hot key into up to
    ``max_bands`` TIME BANDS (equi-depth on the sampled ts).  Rows
    route on the (key, band) composite, so a hot key's history spreads
    across reduce tasks.  Exactness is restored by BOUNDARY CARRY: the
    right side's map tasks emit each block's latest right row per
    (hot key, band); a tree-combine reduces these to the global latest
    per band, and the driver ships each band b the latest right row
    over bands < b as one extra co-located right row — a left row in
    band b either matches inside its band or falls through to exactly
    that carry row (every lower-band right ts precedes band b's left
    ts by construction of the shared cutpoints).  Driver state is
    O(hot keys × bands).  Tie caveat: among EQUAL right timestamps the
    plain path and the banded path may pick different rows (the
    documented caller contract — select tie-independent columns)."""
    import ray

    from .exchange import bounded_map_entries

    if num_buckets is None:
        num_buckets = _auto_buckets(left_ds, right_ds)
    global _MAP_REMOTE, _REDUCE_REMOTE
    if _MAP_REMOTE is None:  # may already be set by hash_join (shared map)
        _MAP_REMOTE = ray.remote(_map_block)
    if _REDUCE_REMOTE is None:
        _REDUCE_REMOTE = ray.remote(_asof_bucket)

    def _mapped(ds, key):
        return bounded_map_entries(
            ds,
            lambda ref: _MAP_REMOTE.options(num_returns=num_buckets)
            .remote(ref, key, num_buckets),
            num_buckets)

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward,"
                         f" got {direction!r}")
    if skew_split:
        # returns plain-mapped entries over the SAME snapshotted refs
        # (carry_slices None) when no key crosses the hot threshold —
        # never re-executes the upstream datasets
        lmap, rmap, carry_slices = _asof_skew_plan(
            left_ds, right_ds, left_key, right_key, left_ts, right_ts,
            num_buckets, max_key_rows, max_bands, direction)
    else:
        carry_slices = None
        lmap = _mapped(left_ds, left_key)
        rmap = _mapped(right_ds, right_key)
    use_band = carry_slices is not None
    joined = [
        _REDUCE_REMOTE.remote(len(lmap), left_key, right_key, left_ts,
                              right_ts, b, out_dir, use_band, direction,
                              *[m[b] for m in lmap],
                              *[m[b] for m in rmap],
                              *([] if carry_slices is None
                                else [carry_slices[b]]))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _equi_bucket(n_left: int, left_key: str, right_key: str, how: str,
                 schema_hints: tuple, bucket_id: int,
                 out_dir: str | None, bucket_fn, use_cell: bool,
                 split_sets: tuple,
                 *parts: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    left_hint, right_hint = schema_hints
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    left_schema = next((p.schema for p in parts[:n_left] if p.num_columns),
                       left_hint)
    right_schema = next((p.schema for p in parts[n_left:] if p.num_columns),
                        right_hint)
    if left_schema is not None and right_schema is not None:
        cell_excl = {"__cell"} if use_cell else set()
        shared = ((set(left_schema.names) - {left_key} - cell_excl)
                  & (set(right_schema.names) - {right_key} - cell_excl))
        if shared:
            raise ValueError(
                f"hash_join requires disjoint non-key column names; "
                f"shared: {sorted(shared)}")
    # which empty sides still produce rows: inner needs both, left outer
    # needs left, full outer needs either
    dead = ((not lparts and not rparts)
            or (not lparts and how in ("inner", "left outer"))
            or (not rparts and how == "inner"))
    if dead:
        merged = pa.table({})
    else:
        # an empty side under an outer join still joins (typed nulls):
        # the driver-shipped schema hints cover buckets whose parts for
        # that side are all schema-less empties
        lt = (pa.concat_tables(lparts).combine_chunks()
              if lparts else left_schema.empty_table())
        rt = (pa.concat_tables(rparts).combine_chunks()
              if rparts else right_schema.empty_table())
        _warn_hot_key(lt, left_key, "hash_join(left)", bucket_id)
        _warn_hot_key(rt, right_key, "hash_join(right)", bucket_id)
        # skew-split rows carry a virtual __cell: join on (key, cell) so
        # a hot key's grid cells never cross-match (an empty side built
        # from the driver schema hint gains the column to stay joinable).
        # use_cell is an EXPLICIT flag from the driver — a user payload
        # column that happens to be named __cell is never hijacked
        join_l, join_r = [left_key], [right_key]
        if use_cell:
            if "__cell" not in lt.column_names:
                lt = lt.append_column("__cell", pa.nulls(lt.num_rows,
                                                         pa.int64()))
            if "__cell" not in rt.column_names:
                rt = rt.append_column("__cell", pa.nulls(rt.num_rows,
                                                         pa.int64()))
            join_l.append("__cell")
            join_r.append("__cell")
        lsplit, rsplit = split_sets
        # match markers for the null-drop ownership rule: pyarrow
        # COALESCES the key columns, so a null marker — not a null key —
        # is the reliable "this side had no partner in this cell" signal
        need_r_drop = how in ("left outer", "full outer") \
            and rsplit is not None
        need_l_drop = how == "full outer" and lsplit is not None
        if (need_r_drop or need_l_drop) and (
                "__rmark" in rt.column_names
                or "__lmark" in lt.column_names):
            raise ValueError(
                "hash_join(skew_split=True) reserves '__rmark'/'__lmark' "
                "for outer-join match markers; rename the input column")
        if need_r_drop:
            rt = rt.append_column(
                "__rmark", pa.array(np.ones(rt.num_rows, np.int8)))
        if need_l_drop:
            lt = lt.append_column(
                "__lmark", pa.array(np.ones(lt.num_rows, np.int8)))
        merged = lt.join(rt, keys=join_l, right_keys=join_r,
                         join_type=how)
        if need_r_drop and merged.num_rows:
            # cell-level unmatched LEFT rows of a right-split key: the
            # matched copy lives in the cell holding a right partner
            artifact = pc.and_(
                pc.is_null(merged["__rmark"]),
                pc.fill_null(pc.is_in(merged[left_key],
                                      value_set=rsplit), False))
            merged = merged.filter(pc.invert(artifact))
        if need_l_drop and merged.num_rows:
            artifact = pc.and_(
                pc.is_null(merged["__lmark"]),
                pc.fill_null(pc.is_in(merged[left_key],
                                      value_set=lsplit), False))
            merged = merged.filter(pc.invert(artifact))
        merged = merged.drop_columns(
            [c for c in ("__rmark", "__lmark") if c in merged.column_names])
        if use_cell and "__cell" in merged.column_names:
            merged = merged.drop_columns(["__cell"])
    if bucket_fn is not None and merged.num_rows:
        # post-join transform INSIDE the reduce: a filter/projection here
        # means only its output (e.g. constraint violations, typically
        # ≪ join size) crosses back to the driver/sink
        merged = bucket_fn(merged)
    if out_dir is not None:
        return _sink_bucket(merged, out_dir, bucket_id)
    return merged


_EQUI_REDUCE = None


# --------------------------------------------------------------------------
# Bloom prefilter: drop non-matching big-side rows BEFORE the exchange
# --------------------------------------------------------------------------

_BLOOM_HASHES = 4
_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _round_bloom_bits(num_bits: int) -> int:
    """Bitmaps pack into uint64 words — positions mod a non-multiple of
    64 would index past the last word.  Build and prefilter both round
    identically, so any caller-supplied size stays consistent."""
    return max(64, (int(num_bits) + 63) >> 6 << 6)


def _bloom_positions(arr, num_bits: int) -> np.ndarray:
    """(len(arr), _BLOOM_HASHES) bit positions via double hashing — one
    real hash per value, the rest derived (standard Kirsch-Mitzenmacher)."""
    from .sketches import _hash64

    h1 = _hash64(arr)
    with np.errstate(over="ignore"):  # uint64 wraparound intended
        h2 = (h1 ^ (h1 >> np.uint64(29))) * _BLOOM_MIX | np.uint64(1)
        steps = np.arange(_BLOOM_HASHES, dtype=np.uint64)
        return (h1[:, None] + steps[None, :] * h2[:, None]) \
            % np.uint64(num_bits)


def _bloom_partial(num_bits: int, key: str, block: pa.Table) -> np.ndarray:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    bm = np.zeros(num_bits >> 6, dtype=np.uint64)
    if key in block.column_names and block.num_rows:
        arr = block[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        p = _bloom_positions(arr, num_bits).ravel()
        np.bitwise_or.at(bm, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))
    return bm


def _bloom_or(*parts: np.ndarray) -> np.ndarray:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    out = parts[0].copy()
    for p in parts[1:]:
        np.bitwise_or(out, p, out=out)
    return out


_BLOOM_PART_REMOTE = None
_BLOOM_OR_REMOTE = None


def build_bloom(ds, key: str, *, num_bits: int = 1 << 23):
    """Distributed Bloom filter over ``ds[key]``: one partial bitmap per
    block (launched as refs stream out of the scan), OR-combined through
    bounded tree rounds.  Returns a ``ray.ObjectRef`` to the packed uint64
    bitmap — ``num_bits/8`` bytes (1 MiB at the default), broadcast once.

    Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k with k=4; the 2^23
    default holds ~1% at n=1M distinct keys — pass a bigger ``num_bits``
    for bigger build sides (the filter only needs to fit in task memory,
    it is never shuffled)."""
    import ray

    from .blocks import iter_block_refs

    num_bits = _round_bloom_bits(num_bits)
    global _BLOOM_PART_REMOTE, _BLOOM_OR_REMOTE
    if _BLOOM_PART_REMOTE is None:
        _BLOOM_PART_REMOTE = ray.remote(_bloom_partial)
        _BLOOM_OR_REMOTE = ray.remote(_bloom_or)
    pending = [_BLOOM_PART_REMOTE.remote(num_bits, key, ref)
               for ref in iter_block_refs(ds)]
    if not pending:
        import numpy as _np

        return ray.put(_np.zeros(num_bits >> 6, dtype=_np.uint64))
    while len(pending) > 1:  # bounded fan-in OR tree
        pending = [_BLOOM_OR_REMOTE.remote(*pending[i:i + 16])
                   for i in range(0, len(pending), 16)]
    return pending[0]


def bloom_prefilter(ds, key: str, bloom_ref, *, num_bits: int = 1 << 23):
    """Keep only rows whose ``key`` MIGHT be in the bloom (false positives
    pass — the downstream join re-checks exactly; false negatives are
    impossible), so non-matching rows die at the scan instead of crossing
    the exchange.  NULL keys are dropped (equi-join semantics)."""
    import ray

    num_bits = _round_bloom_bits(num_bits)

    def filt(t: pa.Table) -> pa.Table:
        if key not in t.column_names or not t.num_rows:
            return t
        bm = ray.get(bloom_ref)
        t = t.filter(pc.is_valid(t[key]))
        if not t.num_rows:
            return t
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        p = _bloom_positions(arr, num_bits)
        hits = (bm[(p >> np.uint64(6)).astype(np.int64)]
                >> (p & np.uint64(63))) & np.uint64(1)
        return t.filter(pa.array(hits.all(axis=1)))

    return ds.map_batches(filt, batch_format="pyarrow")


def hash_join(left_ds, right_ds, *, left_key: str, right_key: str,
              how: str = "inner", num_buckets: int | None = None,
              out_dir: str | None = None, bucket_fn=None,
              bloom_right_by_left: bool = False,
              bloom_bits: int = 1 << 23,
              skew_split: bool = False,
              max_key_rows: int = _SKEW_MAX_KEY_ROWS) -> pa.Table:
    """Big-big equi-join (``how``: "inner", "left outer" or
    "full outer"): both sides
    hash-partition on their key through the bounded exchange (each row
    crosses the cluster once), and each bucket joins its co-located
    slices with Arrow's C++ hash join.  Complements the broadcast lookup
    join (ops.py — right side fits in memory) for the case where NEITHER
    side does.  Non-key column names must be disjoint (the broadcast
    join's rule).  Output row order is unspecified — sort at the caller
    when determinism matters.  With ``out_dir`` each bucket writes its
    own parquet part (the at-scale path, same contract as asof_join).
    ``bucket_fn`` (a picklable table→table callable) runs on each bucket's
    joined slice inside the reduce — filters/projections there shrink
    what leaves the task.

    ``skew_split=True`` adds a heavy-hitter counting pre-pass over
    SNAPSHOTTED block refs (the range_join trade: refs stay pinned, the
    count overlaps the scan) and grid-splits any key whose merged count
    exceeds ``max_key_rows`` on either side across an S_l × S_r grid of
    virtual cells (left row: one grid row, replicated across columns;
    right row: one column, replicated across rows — each pair co-occurs
    in exactly one cell), so one hot key can no longer concentrate in
    one reduce task.  The merged counts are LOWER bounds, so detection
    is conservative-correct; evaders still hit the loud _warn_hot_key.

    OUTER joins split safely via the NULL-DROP OWNERSHIP rule: a key
    split on one side provably HAS rows on that side (its count crossed
    the threshold), so the OTHER side's rows with that key can never be
    globally unmatched — each reduce drops its cell-level null-extended
    rows for such keys (replication guarantees the genuinely-matched
    copy exists in whichever cell holds a partner).  Keys outside the
    split sets keep ordinary outer semantics: their counterpart side is
    never split, so cell-level unmatched equals global unmatched."""
    import ray

    from .exchange import bounded_map_entries

    if how not in ("inner", "left outer", "full outer"):
        raise ValueError(f"hash_join: unsupported how={how!r}")
    if bloom_right_by_left:
        if how == "full outer":
            raise ValueError(
                "bloom_right_by_left drops unmatched right rows — a full "
                "outer join must emit them")
        # SELECTIVE joins at scale: one extra pass over the left side
        # builds a broadcast Bloom filter (bloom_bits/8 bytes, never
        # shuffled) and right rows that cannot match die AT THE SCAN
        # instead of crossing the exchange; false positives just ride
        # through to the exact in-bucket join (never a wrong answer).
        # Trade: the left side is scanned twice.
        right_ds = bloom_prefilter(
            right_ds, right_key,
            build_bloom(left_ds, left_key, num_bits=bloom_bits),
            num_bits=bloom_bits)

    # driver-shipped schemas: outer-join buckets whose parts for one side
    # are all empty must still emit that side's columns as typed nulls
    # (metadata-cheap; None keeps inner joins free of the fetch)
    def _hint(ds):
        s = ds.schema()
        return getattr(s, "base_schema", None) or pa.schema(
            [(n, t) for n, t in zip(s.names, s.types)])

    schema_hints = (None, None)
    if how == "left outer":
        schema_hints = (None, _hint(right_ds))
    elif how == "full outer":
        schema_hints = (_hint(left_ds), _hint(right_ds))
    if num_buckets is None:
        num_buckets = _auto_buckets(left_ds, right_ds)
    global _MAP_REMOTE, _EQUI_REDUCE
    if _MAP_REMOTE is None:
        _MAP_REMOTE = ray.remote(_map_block)
    if _EQUI_REDUCE is None:
        _EQUI_REDUCE = ray.remote(_equi_bucket)

    def _mapped(ds, key):
        return bounded_map_entries(
            ds,
            lambda ref: _MAP_REMOTE.options(num_returns=num_buckets)
            .remote(ref, key, num_buckets),
            num_buckets)

    if skew_split:
        from .blocks import iter_block_refs
        from .exchange import bounded_map_refs

        global _HH_PARTIAL, _SKEW_MAP_REMOTE
        if _HH_PARTIAL is None:
            _HH_PARTIAL = ray.remote(_hh_partial)
        if _SKEW_MAP_REMOTE is None:
            _SKEW_MAP_REMOTE = ray.remote(_skew_map_block)
        # snapshot refs once: counting and slicing read the SAME blocks
        # (pinned; count tasks launch as refs stream out of the scan)
        lrefs, rrefs, lcnt, rcnt = [], [], [], []
        for r in iter_block_refs(left_ds):
            lrefs.append(r)
            lcnt.append(_HH_PARTIAL.remote(r, left_key, _SKEW_TOPK))
        for r in iter_block_refs(right_ds):
            rrefs.append(r)
            rcnt.append(_HH_PARTIAL.remote(r, right_key, _SKEW_TOPK))
        lhot_t = ray.get(_hh_tree(lcnt, _SKEW_TOPK)) if lcnt else pa.table({})
        rhot_t = ray.get(_hh_tree(rcnt, _SKEW_TOPK)) if rcnt else pa.table({})
        lcounts = (dict(zip(lhot_t["k"].to_pylist(),
                            lhot_t["n"].to_pylist()))
                   if lhot_t.num_rows else {})
        rcounts = (dict(zip(rhot_t["k"].to_pylist(),
                            rhot_t["n"].to_pylist()))
                   if rhot_t.num_rows else {})
        key_type = (lhot_t["k"].type if lhot_t.num_rows
                    else (rhot_t["k"].type if rhot_t.num_rows else None))
        hot = []
        for k in set(lcounts) | set(rcounts):
            cl, cr = lcounts.get(k, 0), rcounts.get(k, 0)
            if max(cl, cr) <= max_key_rows:
                continue
            s_l = max(1, -(-cl // max_key_rows))
            s_r = max(1, -(-cr // max_key_rows))
            if s_l == 1 and s_r == 1:
                continue  # a 1x1 "split" is the plain path — skip it
            hot.append((k, s_l, s_r))
        if hot:
            _LOG.warning(
                "hash_join(skew): grid-splitting %d hot key(s) over "
                "max_key_rows=%d: %s", len(hot), max_key_rows,
                [(k, f"{sl}x{sr}") for k, sl, sr in hot[:8]])
            hot_ref = ray.put((
                pa.array([k for k, _, _ in hot], type=key_type),
                np.array([sl for _, sl, _ in hot], dtype=np.int64),
                np.array([sr for _, _, sr in hot], dtype=np.int64)))
            lmap = bounded_map_refs(
                lrefs, lambda r: _SKEW_MAP_REMOTE
                .options(num_returns=num_buckets)
                .remote(r, left_key, num_buckets, True, hot_ref),
                num_buckets)
            rmap = bounded_map_refs(
                rrefs, lambda r: _SKEW_MAP_REMOTE
                .options(num_returns=num_buckets)
                .remote(r, right_key, num_buckets, False, hot_ref),
                num_buckets)
        else:
            lmap = bounded_map_refs(
                lrefs, lambda ref: _MAP_REMOTE
                .options(num_returns=num_buckets)
                .remote(ref, left_key, num_buckets), num_buckets)
            rmap = bounded_map_refs(
                rrefs, lambda ref: _MAP_REMOTE
                .options(num_returns=num_buckets)
                .remote(ref, right_key, num_buckets), num_buckets)
    else:
        lmap = _mapped(left_ds, left_key)
        rmap = _mapped(right_ds, right_key)
    use_cell = bool(skew_split and hot)
    # the null-drop ownership sets (outer joins only): keys split on a
    # side have guaranteed rows there, so the other side's cell-level
    # null-extended rows for them are replication artifacts — dropped in
    # the reduce (docstring).  Tiny (≤ heavy-hitter topk); shipped by arg.
    split_sets = (None, None)
    if use_cell and how != "inner":
        lsplit = [k for k, sl, _ in hot if sl > 1]
        rsplit = [k for k, _, sr in hot if sr > 1]
        split_sets = (
            pa.array(lsplit, type=key_type) if lsplit else None,
            pa.array(rsplit, type=key_type) if rsplit else None)
    joined = [
        _EQUI_REDUCE.remote(len(lmap), left_key, right_key, how,
                            schema_hints, b, out_dir, bucket_fn, use_cell,
                            split_sets,
                            *[m[b] for m in lmap], *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


# --------------------------------------------------------------------------
# Equi-join skew split: grid-partition HOT KEYS across reduce tasks
# --------------------------------------------------------------------------

def _hh_partial(block: pa.Table, key: str, topk: int) -> pa.Table:
    """Per-block heavy-hitter partial: the block's top-K key counts.
    Merged partial sums are LOWER bounds (per-block and per-combine
    truncation only ever drops counts), so a key crossing the threshold
    in the merged view is definitely hot; an adversarially spread key
    can evade detection and still hits the loud _warn_hot_key backstop."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if key not in block.column_names or not block.num_rows:
        return pa.table({})
    g = block.select([key]).group_by(key).aggregate([([], "count_all")])
    t = pa.table({"k": g[key], "n": g["count_all"].cast(pa.int64())})
    t = t.filter(pc.is_valid(t["k"]))  # null keys never join
    order = pc.sort_indices(t, sort_keys=[("n", "descending")])
    return t.take(order.slice(0, topk))


def _hh_combine(topk: int, *parts: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks()
    g = t.group_by("k").aggregate([("n", "sum")])
    t = pa.table({"k": g["k"], "n": g["n_sum"].cast(pa.int64())})
    order = pc.sort_indices(t, sort_keys=[("n", "descending")])
    return t.take(order.slice(0, topk))


_HH_PARTIAL = None
_HH_COMBINE = None


def _hh_tree(refs: list, topk: int, fanin: int = 64):
    """Tree-combine heavy-hitter partial refs with bounded fan-in."""
    import ray

    global _HH_COMBINE
    if _HH_COMBINE is None:
        _HH_COMBINE = ray.remote(_hh_combine)
    while len(refs) > 1:
        refs = [_HH_COMBINE.remote(topk, *refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return refs[0] if refs else None


def _skew_map_block(block: pa.Table, key: str, num_buckets: int,
                    is_left: bool, hot_ref):
    """Map half of the skew-aware exchange.  Every row gains a virtual
    CELL of its hot key's S_l × S_r grid (cell = i·S_r + j): a left row
    takes one grid row ``i`` and replicates across the ``j`` columns, a
    right row takes one column ``j`` and replicates across the ``i``
    rows — a matching pair co-occurs in exactly ONE cell, each cell
    holds ~count/S of each side, and the reduce joins on (key, cell).
    Non-hot rows have cell 0 and no replication (the original path)."""
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    empty = [pa.table({})] * num_buckets
    if key not in block.column_names or not block.num_rows:
        return empty if num_buckets > 1 else empty[0]
    if "__cell" in block.column_names:
        raise ValueError(
            "hash_join(skew_split=True) reserves the column name "
            "'__cell' for its virtual grid cells; rename the input column")
    hot_keys, s_l, s_r = hot_ref
    karr = block[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    h = _hash64(karr)
    idx = pc.fill_null(pc.index_in(karr, value_set=hot_keys), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    hotm = idx >= 0
    safe = np.maximum(idx, 0)
    sl_row = np.where(hotm, s_l[safe], 1)
    sr_row = np.where(hotm, s_r[safe], 1)
    own_s = sl_row if is_left else sr_row      # own coordinate domain
    reps = sr_row if is_left else sl_row       # replication factor
    n = len(idx)
    own = np.arange(n) % np.maximum(own_s, 1)  # position spreads load
    out_idx = np.repeat(np.arange(n), reps)
    offs = np.concatenate([[0], np.cumsum(reps)])[:-1]
    copy_i = np.arange(len(out_idx)) - np.repeat(offs, reps)
    own_rep = np.repeat(own, reps)
    sr_rep = np.repeat(sr_row, reps)
    if is_left:
        cell = own_rep * sr_rep + copy_i       # i = own, j = copy index
    else:
        cell = copy_i * sr_rep + own_rep       # i = copy index, j = own
    st = block.take(pa.array(out_idx))
    st = st.append_column("__cell", pa.array(cell.astype(np.int64)))
    with np.errstate(over="ignore"):
        v = np.repeat(h, reps) + cell.astype(np.uint64)
    buckets = _vkey_bucket(v, num_buckets)
    order = np.argsort(buckets, kind="stable")
    st = st.take(pa.array(order))
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [st.slice(bounds[b], bounds[b + 1] - bounds[b])
           for b in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


_SKEW_MAP_REMOTE = None


_RANGE_MAP_L = None
_RANGE_REDUCE = None
_RANGE_COUNT = None

_LOG = logging.getLogger("yaschva_ray.joins")

# A band whose row count (either side) exceeds this is SUB-SPLIT into a
# grid of virtual groups so no single reduce task owns the whole band —
# value skew (one dominant price point) otherwise lands one band → one
# task, the same hazard class as degenerate LSH buckets.
_MAX_BAND_ROWS = 250_000
# gid packs (i, j) of the sub-split grid into the low bits of the virtual
# key; bands use the rest.  2^20 grid cells ≫ any sane split factor.
_GID_BITS = 20
_MAX_BAND_ABS = 1 << (62 - _GID_BITS)


def _row_bands(v: np.ndarray, width: float, eps: float, replicate: bool):
    """(row_idx, band) pairs for each row: the right side replicates into
    every band its ±eps neighborhood touches (≤3 with width ≥ 2·eps),
    deduped per (row, band); the left side lands in exactly one band."""
    if replicate:
        idx_parts, band_parts = [], []
        for d in (-eps, 0.0, eps):
            band_parts.append(np.floor((v + d) / width).astype(np.int64))
            idx_parts.append(np.arange(len(v)))
        idx = np.concatenate(idx_parts)
        bands = np.concatenate(band_parts)
        # dedupe (row, band): ±eps of the same row can share a band
        order = np.lexsort((bands, idx))
        idx, bands = idx[order], bands[order]
        keep = np.ones(len(idx), dtype=bool)
        keep[1:] = (idx[1:] != idx[:-1]) | (bands[1:] != bands[:-1])
        return idx[keep], bands[keep]
    bands = np.floor(v / width).astype(np.int64)
    return np.arange(len(v)), bands


def _band_counts(t: pa.Table, val_col: str, width: float, eps: float,
                 replicate: bool) -> pa.Table:
    """Counting pre-pass: per-band row counts for one block (band
    cardinality is bounded by value-range/width — bands are coarse by
    design, so these partials are small)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if val_col not in t.column_names or not t.num_rows:
        return pa.table({"band": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    t = t.filter(pc.is_valid(t[val_col]))  # same null rule as _band_slices
    if not t.num_rows:
        return pa.table({"band": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    v = np.asarray(t[val_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    _idx, bands = _row_bands(v, width, eps, replicate)
    ub, counts = np.unique(bands, return_counts=True)
    return pa.table({"band": pa.array(ub), "n": pa.array(counts.astype(np.int64))})


def _vkey_bucket(vkeys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Physical bucket of a virtual (band, gid) key — splitmix so distinct
    bands spread uniformly (both sides MUST agree on this mapping)."""
    z = vkeys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    return (z % np.uint64(num_buckets)).astype(np.int64)


# --------------------------------------------------------------------------
# As-of skew split: TIME-BAND partition hot keys, boundary-carry exactness
# --------------------------------------------------------------------------

_ASOF_SAMPLE_REMOTE = None
_ASOF_SAMPLE_COMBINE_REMOTE = None
_ASOF_SKEW_MAP_REMOTE = None
_ASOF_BOUND_COMBINE_REMOTE = None


def _asof_ts_sample(block: pa.Table, key: str, ts: str, hot_keys,
                    per_key: int) -> pa.Table:
    """Per-block timestamp sample for HOT keys: up to ``per_key`` strided
    ts values per hot key (deterministic; no RNG)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if key not in block.column_names or ts not in block.column_names \
            or not block.num_rows:
        return pa.table({})
    karr = block[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    tarr = block[ts]
    if isinstance(tarr, pa.ChunkedArray):
        tarr = tarr.combine_chunks()
    idx = pc.fill_null(pc.index_in(karr, value_set=hot_keys), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    m = (idx >= 0) & np.asarray(pc.is_valid(tarr))
    if not m.any():
        return pa.table({})
    rows = np.nonzero(m)[0]
    kidx = idx[rows]
    order = np.argsort(kidx, kind="stable")
    rows, kidx = rows[order], kidx[order]
    seg = np.searchsorted(kidx, np.arange(int(kidx[-1]) + 2))
    take = []
    for i in range(len(seg) - 1):
        s, e = int(seg[i]), int(seg[i + 1])
        if e > s:
            take.append(rows[s:e:max(1, (e - s) // per_key)])
    sel = np.concatenate(take)
    sel_sorted = np.sort(sel)
    return pa.table({"kidx": pa.array(idx[sel_sorted]),
                     "ts": tarr.take(pa.array(sel_sorted))})


def _asof_sample_combine(per_key_cap: int, *parts: pa.Table) -> pa.Table:
    """Tree-combine of ts samples: concat and re-stride each key's
    ts-sorted sample back under ``per_key_cap`` (keeps every combine
    level and the final driver gather O(hot keys × cap))."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks()
    kidx = np.asarray(t["kidx"].to_numpy(zero_copy_only=False), np.int64)
    tv = t["ts"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tv, kidx))
    kidx, keep_rows = kidx[order], order
    seg = np.searchsorted(kidx, np.arange(int(kidx[-1]) + 2)) \
        if len(kidx) else np.array([0])
    take = []
    for i in range(len(seg) - 1):
        s, e = int(seg[i]), int(seg[i + 1])
        if e > s:
            take.append(keep_rows[s:e:max(1, (e - s) // per_key_cap)])
    sel = np.concatenate(take)
    return pa.table({"kidx": t["kidx"].take(pa.array(sel)),
                     "ts": t["ts"].take(pa.array(sel))})


def _asof_skew_map_block(block: pa.Table, key: str, ts: str,
                         num_buckets: int, hot_ref, emit_bounds: bool,
                         nulls_past_end: bool = False,
                         bound_min: bool = False):
    """Map half of the banded time exchange (shared by the as-of join
    and session windows): every row gains its hot key's time band
    (non-hot rows: band 0) and routes on the (key, band) composite via
    the shared ``_vkey_bucket`` mix.  With ``emit_bounds`` (the as-of
    RIGHT side) one extra output carries the block-local latest right
    row per (hot key, band) — the boundary side-channel the driver
    turns into carry rows.  ``nulls_past_end`` routes a hot key's
    NULL-ts rows to band n_bands (past every cut) instead of band 0 —
    session semantics sort null timestamps LAST within a key, so they
    must land after the final time band; the as-of join keeps them at
    band 0 (its null path ignores the band entirely)."""
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    n_out = num_buckets + (1 if emit_bounds else 0)
    empty = [pa.table({})] * n_out
    if key not in block.column_names or ts not in block.column_names \
            or not block.num_rows:
        return empty if n_out > 1 else empty[0]
    if _BAND_COL in block.column_names:
        raise ValueError(
            "asof_join(skew_split=True) reserves the column name "
            "'__band' for its time bands; rename the input column")
    hot_keys, cuts = hot_ref
    karr = block[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    tarr = block[ts]
    if isinstance(tarr, pa.ChunkedArray):
        tarr = tarr.combine_chunks()
    h = _hash64(karr)
    idx = pc.fill_null(pc.index_in(karr, value_set=hot_keys), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    validts = np.asarray(pc.is_valid(tarr))
    tv = tarr.to_numpy(zero_copy_only=False)
    band = np.zeros(len(idx), np.int64)
    for i in np.unique(idx[idx >= 0]):
        rows = (idx == i) & validts
        if rows.any():
            band[rows] = np.searchsorted(cuts[int(i)], tv[rows],
                                         side="right")
        if nulls_past_end:
            nullrows = (idx == i) & ~validts
            if nullrows.any():
                band[nullrows] = len(cuts[int(i)]) + 1
    st = block.append_column(_BAND_COL, pa.array(band))
    with np.errstate(over="ignore"):
        v = h + band.astype(np.uint64)
    buckets = _vkey_bucket(v, num_buckets)
    order = np.argsort(buckets, kind="stable")
    sliced = st.take(pa.array(order))
    sb = buckets[order]
    bnds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [sliced.slice(bnds[b], bnds[b + 1] - bnds[b])
           for b in range(num_buckets)]
    if emit_bounds:
        sel = np.nonzero((idx >= 0) & validts)[0]
        if len(sel):
            # groups are ts-ascending under the (key, band, ts) lexsort:
            # last-of-group = block-local LATEST right row per band
            # (backward carry); first-of-group = EARLIEST (forward)
            o = np.lexsort((tv[sel], band[sel], idx[sel]))
            s = sel[o]
            chg = (idx[s][1:] != idx[s][:-1]) | \
                  (band[s][1:] != band[s][:-1])
            keep = np.ones(len(s), bool)
            if bound_min:
                keep[1:] = chg
            else:
                keep[:-1] = chg
            out.append(st.take(pa.array(s[np.nonzero(keep)[0]])))
        else:
            out.append(pa.table({}))
    return out if n_out > 1 else out[0]


def _asof_bound_combine(key: str, ts: str, keep_min: bool,
                        *parts: pa.Table) -> pa.Table:
    """Reduce boundary candidates to the global latest (``keep_min``
    False, backward) or earliest (True, forward) right row per
    (key, band) — tables here are O(hot keys × bands), tiny."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks() \
        .sort_by([(key, "ascending"), (_BAND_COL, "ascending"),
                  (ts, "ascending")])
    kk = t[key].to_pylist()
    bb = t[_BAND_COL].to_pylist()
    if keep_min:
        keep = [i for i in range(t.num_rows)
                if i == 0 or kk[i - 1] != kk[i] or bb[i - 1] != bb[i]]
    else:
        keep = [i for i in range(t.num_rows)
                if i + 1 == t.num_rows or kk[i + 1] != kk[i]
                or bb[i + 1] != bb[i]]
    return t.take(pa.array(keep, pa.int64()))


def _asof_skew_plan(left_ds, right_ds, left_key: str, right_key: str,
                    left_ts: str, right_ts: str, num_buckets: int,
                    max_key_rows: int, max_bands: int,
                    direction: str = "backward"):
    """Pre-passes + banded map launch for ``asof_join(skew_split=True)``.
    Returns ``(lmap, rmap, carry_slices)``; ``carry_slices`` is None when
    no key crosses the hot threshold (the maps are then the PLAIN
    exchange over the same snapshotted refs — upstream never re-runs).
    ``direction="forward"`` mirrors the carry machinery: bounds track
    each band's EARLIEST right row and band b's carry is the earliest
    over bands > b (every higher-band right ts provably follows band
    b's left timestamps, the symmetric cutpoint argument)."""
    import ray

    from .blocks import iter_block_refs
    from .exchange import bounded_map_refs

    global _HH_PARTIAL, _ASOF_SAMPLE_REMOTE, _ASOF_SAMPLE_COMBINE_REMOTE
    global _ASOF_SKEW_MAP_REMOTE, _ASOF_BOUND_COMBINE_REMOTE, _MAP_REMOTE
    if _HH_PARTIAL is None:
        _HH_PARTIAL = ray.remote(_hh_partial)
    if _ASOF_SAMPLE_REMOTE is None:
        _ASOF_SAMPLE_REMOTE = ray.remote(_asof_ts_sample)
    if _ASOF_SAMPLE_COMBINE_REMOTE is None:
        _ASOF_SAMPLE_COMBINE_REMOTE = ray.remote(_asof_sample_combine)
    if _ASOF_SKEW_MAP_REMOTE is None:
        _ASOF_SKEW_MAP_REMOTE = ray.remote(_asof_skew_map_block)
    if _ASOF_BOUND_COMBINE_REMOTE is None:
        _ASOF_BOUND_COMBINE_REMOTE = ray.remote(_asof_bound_combine)

    # snapshot refs once; counting overlaps the scans
    lrefs, rrefs, lcnt, rcnt = [], [], [], []
    for r in iter_block_refs(left_ds):
        lrefs.append(r)
        lcnt.append(_HH_PARTIAL.remote(r, left_key, _SKEW_TOPK))
    for r in iter_block_refs(right_ds):
        rrefs.append(r)
        rcnt.append(_HH_PARTIAL.remote(r, right_key, _SKEW_TOPK))
    lhot_t = ray.get(_hh_tree(lcnt, _SKEW_TOPK)) if lcnt else pa.table({})
    rhot_t = ray.get(_hh_tree(rcnt, _SKEW_TOPK)) if rcnt else pa.table({})
    lcounts = (dict(zip(lhot_t["k"].to_pylist(), lhot_t["n"].to_pylist()))
               if lhot_t.num_rows else {})
    rcounts = (dict(zip(rhot_t["k"].to_pylist(), rhot_t["n"].to_pylist()))
               if rhot_t.num_rows else {})
    key_type = (lhot_t["k"].type if lhot_t.num_rows
                else (rhot_t["k"].type if rhot_t.num_rows else None))
    hot = []
    for k in set(lcounts) | set(rcounts):
        c = max(lcounts.get(k, 0), rcounts.get(k, 0))
        if c > max_key_rows:
            hot.append((k, min(max_bands, -(-c // max_key_rows))))

    def _plain():
        lm = bounded_map_refs(
            lrefs, lambda ref: _MAP_REMOTE
            .options(num_returns=num_buckets)
            .remote(ref, left_key, num_buckets), num_buckets)
        rm = bounded_map_refs(
            rrefs, lambda ref: _MAP_REMOTE
            .options(num_returns=num_buckets)
            .remote(ref, right_key, num_buckets), num_buckets)
        return lm, rm, None

    if not hot:
        return _plain()

    hot_keys = pa.array([k for k, _ in hot], type=key_type)
    hk_ref = ray.put(hot_keys)
    samp = [_ASOF_SAMPLE_REMOTE.remote(r, left_key, left_ts, hk_ref, 256)
            for r in lrefs]
    samp += [_ASOF_SAMPLE_REMOTE.remote(r, right_key, right_ts, hk_ref,
                                        256) for r in rrefs]
    while len(samp) > 1:
        samp = [_ASOF_SAMPLE_COMBINE_REMOTE.remote(4096, *samp[i:i + 64])
                for i in range(0, len(samp), 64)]
    st = ray.get(samp[0]) if samp else pa.table({})
    cuts, kept = [], []
    if st.num_rows:
        skidx = np.asarray(st["kidx"].to_numpy(zero_copy_only=False),
                           np.int64)
        stv = st["ts"].to_numpy(zero_copy_only=False)
        for i, (k, nb_i) in enumerate(hot):
            sv = np.sort(stv[skidx == i])
            if not len(sv) or nb_i < 2:
                continue
            pos = [len(sv) * j // nb_i for j in range(1, nb_i)]
            c = np.unique(sv[pos])
            if len(c):
                kept.append(k)
                cuts.append(c)
    if not kept:
        _LOG.warning(
            "asof_join(skew): %d hot key(s) found but no usable time "
            "cutpoints (constant timestamps?) — falling back to the "
            "plain exchange; the one-key-per-task warning stands",
            len(hot))
        return _plain()
    _LOG.warning(
        "asof_join(skew): time-banding %d hot key(s) over "
        "max_key_rows=%d: %s", len(kept), max_key_rows,
        [(k, len(c) + 1) for k, c in list(zip(kept, cuts))[:8]])
    hot_keys = pa.array(kept, type=key_type)
    hot_ref = ray.put((hot_keys, cuts))

    bound_refs: list = []

    def launch_l(ref):
        return _ASOF_SKEW_MAP_REMOTE.options(num_returns=num_buckets) \
            .remote(ref, left_key, left_ts, num_buckets, hot_ref, False)

    fwd = direction == "forward"

    def launch_r(ref):
        outs = _ASOF_SKEW_MAP_REMOTE.options(
            num_returns=num_buckets + 1).remote(
            ref, right_key, right_ts, num_buckets, hot_ref, True,
            False, fwd)
        bound_refs.append(outs[-1])
        return outs[0] if num_buckets == 1 else list(outs[:-1])

    lmap = bounded_map_refs(lrefs, launch_l, num_buckets)
    rmap = bounded_map_refs(rrefs, launch_r, num_buckets)

    refs = list(bound_refs)
    while len(refs) > 1:
        refs = [_ASOF_BOUND_COMBINE_REMOTE.remote(
            right_key, right_ts, fwd, *refs[i:i + 64])
            for i in range(0, len(refs), 64)]
    bt = ray.get(refs[0]) if refs else pa.table({})

    from .sketches import _hash64
    carry_rows, carry_bands = [], []
    if bt.num_rows:
        bk = bt[right_key].to_pylist()
        bb = bt[_BAND_COL].to_pylist()
        btv = bt[right_ts].to_numpy(zero_copy_only=False)
        n_bands = {k: len(c) + 1 for k, c in zip(kept, cuts)}
        by_key: dict = {}
        for i in range(bt.num_rows):
            by_key.setdefault(bk[i], []).append(i)
        for k, rows in by_key.items():
            nb_k = n_bands.get(k, 0)
            if direction == "backward":
                rows.sort(key=lambda i: bb[i])
                best = None  # running latest right row over bands < b
                ri = 0
                for b in range(1, nb_k):
                    while ri < len(rows) and bb[rows[ri]] < b:
                        i = rows[ri]
                        if best is None or btv[i] >= btv[best]:
                            best = i
                        ri += 1
                    if best is not None:
                        carry_rows.append(best)
                        carry_bands.append(b)
            else:
                rows.sort(key=lambda i: -bb[i])
                best = None  # running earliest right row over bands > b
                ri = 0
                for b in range(nb_k - 2, -1, -1):
                    while ri < len(rows) and bb[rows[ri]] > b:
                        i = rows[ri]
                        if best is None or btv[i] <= btv[best]:
                            best = i
                        ri += 1
                    if best is not None:
                        carry_rows.append(best)
                        carry_bands.append(b)
    if carry_rows:
        ct = bt.take(pa.array(carry_rows, pa.int64()))
        ct = ct.set_column(ct.schema.get_field_index(_BAND_COL),
                           pa.field(_BAND_COL, pa.int64()),
                           pa.array(carry_bands, pa.int64()))
        with np.errstate(over="ignore"):
            v = _hash64(ct[right_key].combine_chunks()) + \
                np.asarray(carry_bands, np.uint64)
        cb = _vkey_bucket(v, num_buckets)
        order = np.argsort(cb, kind="stable")
        cts = ct.take(pa.array(order))
        scb = cb[order]
        bnds = np.searchsorted(scb, np.arange(num_buckets + 1))
        carry_slices = [cts.slice(bnds[b], bnds[b + 1] - bnds[b])
                        for b in range(num_buckets)]
    else:
        empty = bt.slice(0, 0) if bt.num_columns else pa.table({})
        carry_slices = [empty] * num_buckets
    return lmap, rmap, carry_slices


def _session_skew_plan(ds, key: str, ts: str, num_buckets: int,
                       max_key_rows: int, max_bands: int):
    """Pre-passes + banded map launch for
    ``session_windows(skew_split=True)`` — the single-dataset sibling of
    ``_asof_skew_plan`` (same heavy-hitter counts, same ts sampling,
    same banded map; no boundary side-channel — sessions stitch across
    band edges with the driver chain merge instead of carry rows).
    Returns ``(map_out, hot_keys)``; ``hot_keys`` is None when nothing
    crossed the threshold (map_out is then the plain exchange over the
    same snapshotted refs)."""
    import ray

    from .blocks import iter_block_refs
    from .exchange import bounded_map_refs

    global _HH_PARTIAL, _ASOF_SAMPLE_REMOTE, _ASOF_SAMPLE_COMBINE_REMOTE
    global _ASOF_SKEW_MAP_REMOTE, _MAP_REMOTE
    if _HH_PARTIAL is None:
        _HH_PARTIAL = ray.remote(_hh_partial)
    if _ASOF_SAMPLE_REMOTE is None:
        _ASOF_SAMPLE_REMOTE = ray.remote(_asof_ts_sample)
    if _ASOF_SAMPLE_COMBINE_REMOTE is None:
        _ASOF_SAMPLE_COMBINE_REMOTE = ray.remote(_asof_sample_combine)
    if _ASOF_SKEW_MAP_REMOTE is None:
        _ASOF_SKEW_MAP_REMOTE = ray.remote(_asof_skew_map_block)
    if _MAP_REMOTE is None:
        _MAP_REMOTE = ray.remote(_map_block)

    refs, cnt = [], []
    for r in iter_block_refs(ds):
        refs.append(r)
        cnt.append(_HH_PARTIAL.remote(r, key, _SKEW_TOPK))
    hot_t = ray.get(_hh_tree(cnt, _SKEW_TOPK)) if cnt else pa.table({})
    counts = (dict(zip(hot_t["k"].to_pylist(), hot_t["n"].to_pylist()))
              if hot_t.num_rows else {})
    hot = [(k, min(max_bands, -(-c // max_key_rows)))
           for k, c in counts.items() if c > max_key_rows]

    def _plain():
        return bounded_map_refs(
            refs, lambda ref: _MAP_REMOTE
            .options(num_returns=num_buckets)
            .remote(ref, key, num_buckets), num_buckets), None

    if not hot:
        return _plain()
    key_type = hot_t["k"].type
    hot_keys = pa.array([k for k, _ in hot], type=key_type)
    hk_ref = ray.put(hot_keys)
    samp = [_ASOF_SAMPLE_REMOTE.remote(r, key, ts, hk_ref, 256)
            for r in refs]
    while len(samp) > 1:
        samp = [_ASOF_SAMPLE_COMBINE_REMOTE.remote(4096, *samp[i:i + 64])
                for i in range(0, len(samp), 64)]
    st = ray.get(samp[0]) if samp else pa.table({})
    cuts, kept = [], []
    if st.num_rows:
        skidx = np.asarray(st["kidx"].to_numpy(zero_copy_only=False),
                           np.int64)
        stv = st["ts"].to_numpy(zero_copy_only=False)
        for i, (k, nb_i) in enumerate(hot):
            sv = np.sort(stv[skidx == i])
            if not len(sv) or nb_i < 2:
                continue
            pos = [len(sv) * j // nb_i for j in range(1, nb_i)]
            c = np.unique(sv[pos])
            if len(c):
                kept.append(k)
                cuts.append(c)
    if not kept:
        _LOG.warning(
            "session_windows(skew): %d hot key(s) but no usable time "
            "cutpoints — plain exchange; the one-key-per-task warning "
            "stands", len(hot))
        return _plain()
    _LOG.warning(
        "session_windows(skew): time-banding %d hot key(s) over "
        "max_key_rows=%d: %s", len(kept), max_key_rows,
        [(k, len(c) + 1) for k, c in list(zip(kept, cuts))[:8]])
    final_hot = pa.array(kept, type=key_type)
    hot_ref = ray.put((final_hot, cuts))
    map_out = bounded_map_refs(
        refs, lambda ref: _ASOF_SKEW_MAP_REMOTE
        .options(num_returns=num_buckets)
        .remote(ref, key, ts, num_buckets, hot_ref, False, True),
        num_buckets)
    return map_out, final_hot


def _band_slices(t: pa.Table, val_col: str, width: float, eps: float,
                 num_buckets: int, replicate: bool, hot_ref):
    """Map half of the band exchange.  Every emitted row carries its
    virtual key ``__vk = band·2^20 + gid`` where gid encodes a cell of a
    per-band sub-split grid (S_left × S_right, from the counting pass):
    a LEFT row takes one grid row ``i`` and replicates across the ``j``
    columns; a RIGHT row takes one column ``j`` and replicates across the
    ``i`` rows — so a matching pair co-occurs in exactly ONE virtual
    group, each group holds ~band_rows/S of each side, and the reduce
    matches within groups only (no cross-group duplicates).  Non-hot
    bands have a 1×1 grid (gid 0) — the original single-group path."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    empty = [pa.table({})] * num_buckets
    if val_col not in t.column_names or not t.num_rows:
        return empty if num_buckets > 1 else empty[0]
    # NULL values satisfy no inequality (SQL inner-join semantics) and
    # would NaN-poison the band arithmetic — drop them at the map
    t = t.filter(pc.is_valid(t[val_col]))
    if not t.num_rows:
        return empty if num_buckets > 1 else empty[0]
    # hot_ref travels as an ObjectRef argument, which Ray auto-resolves:
    # the broadcast tuple arrives zero-copy from the object store
    hot = hot_ref
    v = np.asarray(t[val_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    idx, bands = _row_bands(v, width, eps, replicate)
    if np.abs(bands).max(initial=0) >= _MAX_BAND_ABS:
        raise ValueError(
            f"range_join band index exceeds ±2^{62 - _GID_BITS} — width "
            f"({width}) is too fine for this value range; pass a coarser "
            "width")
    n = len(idx)
    if hot is None or not len(hot[0]):
        sl = np.ones(n, dtype=np.int64)
        sr = np.ones(n, dtype=np.int64)
    else:
        hb, hsl, hsr = hot
        pos = np.searchsorted(hb, bands)
        pos_c = np.minimum(pos, len(hb) - 1)
        is_hot = hb[pos_c] == bands
        sl = np.where(is_hot, hsl[pos_c], 1)
        sr = np.where(is_hot, hsr[pos_c], 1)
    # own cell index: position within this block is as good as random for
    # load-spreading (any partition of a side is CORRECT — the other side
    # replicates across it; content hashing would re-concentrate the very
    # duplicate values being split)
    if replicate:
        own = np.arange(n, dtype=np.int64) % np.maximum(sr, 1)   # column j
        nrep = sl                                                # × grid rows
    else:
        own = np.arange(n, dtype=np.int64) % np.maximum(sl, 1)   # row i
        nrep = sr                                                # × grid cols
    total = int(nrep.sum())
    rep_src = np.repeat(np.arange(n), nrep)
    offs = np.concatenate([[0], np.cumsum(nrep)])
    other = np.arange(total) - offs[rep_src]  # 0..nrep-1 per source row
    if replicate:
        gid = other * sr[rep_src] + own[rep_src]      # gid = i*S_R + j
    else:
        gid = own[rep_src] * sr[rep_src] + other
    vk = bands[rep_src] * np.int64(1 << _GID_BITS) + gid
    buckets = _vkey_bucket(vk, num_buckets)
    src = t.take(pa.array(idx[rep_src])).append_column("__vk", pa.array(vk))
    order = np.argsort(buckets, kind="stable")
    st = src.take(pa.array(order))
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [st.slice(bounds[b], bounds[b + 1] - bounds[b])
           for b in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


def _range_bucket(n_left: int, left_val: str, right_val: str, eps: float,
                  bucket_id: int, out_dir: str | None,
                  *parts: pa.Table) -> pa.Table:
    """Reduce half: match WITHIN each virtual (band, grid-cell) group —
    sort right by (__vk, value), searchsorted the ±eps window per left
    row against its own group's right segment."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    if not lparts or not rparts:
        out = pa.table({})
    else:
        left = pa.concat_tables(lparts).combine_chunks()
        right = pa.concat_tables(rparts).combine_chunks()
        lvk = np.asarray(left["__vk"].to_numpy(zero_copy_only=False))
        rvk = np.asarray(right["__vk"].to_numpy(zero_copy_only=False))
        rv = np.asarray(right[right_val].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        rorder = np.lexsort((rv, rvk))
        right = right.take(pa.array(rorder))
        rvk, rv = rvk[rorder], rv[rorder]
        lorder = np.argsort(lvk, kind="stable")
        left = left.take(pa.array(lorder))
        lvk = lvk[lorder]
        lv = np.asarray(left[left_val].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        # each left row's group = [gl, gh) in the right arrays
        gl = np.searchsorted(rvk, lvk, side="left")
        gh = np.searchsorted(rvk, lvk, side="right")
        # window within the group (rv sorted within each vk segment)
        lo = np.empty(len(lv), dtype=np.int64)
        hi = np.empty(len(lv), dtype=np.int64)
        # segment-wise searchsorted: iterate DISTINCT left vk segments
        # (vectorized inner windows; segment count per bucket is small)
        seg_new = np.ones(len(lvk), dtype=bool)
        seg_new[1:] = lvk[1:] != lvk[:-1]
        seg_starts = np.nonzero(seg_new)[0]
        seg_ends = np.append(seg_starts[1:], len(lvk))
        for s, e in zip(seg_starts, seg_ends):
            a, b = gl[s], gh[s]
            seg_rv = rv[a:b]
            lo[s:e] = a + np.searchsorted(seg_rv, lv[s:e] - eps, side="left")
            hi[s:e] = a + np.searchsorted(seg_rv, lv[s:e] + eps, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            out = pa.table({})
        else:
            lidx = np.repeat(np.arange(len(lv)), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])
            ridx = np.arange(total) - offs[lidx] + lo[lidx]
            lt = left.drop_columns(["__vk"]).take(pa.array(lidx))
            rt = right.drop_columns(["__vk"]).take(pa.array(ridx))
            cols = {c: lt[c] for c in lt.column_names}
            for c in rt.column_names:
                cols[c if c not in cols else f"{c}_right"] = rt[c]
            out = pa.table(cols)
    if out_dir is not None:
        return _sink_bucket(out, out_dir, bucket_id)
    return out


def range_join(left_ds, right_ds, *, left_val: str, right_val: str,
               eps: float, width: float | None = None,
               num_buckets: int | None = None,
               out_dir: str | None = None,
               max_band_rows: int = _MAX_BAND_ROWS) -> pa.Table:
    """Band-partitioned interval join: pairs where
    ``|left_val - right_val| <= eps``.  Both sides exchange once (raw
    tasks) over SNAPSHOTTED block refs; a cheap counting pre-pass over
    the same blocks (no re-scan — the blocks are already in the object
    store) finds bands with more than ``max_band_rows`` rows on either
    side and sub-splits them into an S_left × S_right grid of virtual
    groups, so value skew (one dominant value) can no longer concentrate
    a whole band in one reduce task — each task sees ~max_band_rows of
    each side and ~1/(S_l·S_r) of the band's pair output.  Every
    sub-split is logged (no silent caps).  ``width`` must be ≥ 2·eps
    (narrower bands silently miss pairs — raise instead);
    ``num_buckets=None`` derives B from the inputs' bytes; ``out_dir``
    switches to per-bucket parquet sinks + manifest return."""
    import ray

    from .blocks import iter_block_refs

    if width is None:
        width = max(2.0 * eps, 1e-9)
    elif width < 2.0 * eps:
        raise ValueError(
            f"range_join width ({width}) must be >= 2*eps ({2.0 * eps}): "
            "a right row only replicates into bands its ±eps neighborhood "
            "touches, so narrower bands can miss matching pairs")
    if num_buckets is None:
        num_buckets = _auto_buckets(left_ds, right_ds)
    global _RANGE_MAP_L, _RANGE_REDUCE, _RANGE_COUNT
    if _RANGE_MAP_L is None:
        _RANGE_MAP_L = ray.remote(_band_slices)
        _RANGE_REDUCE = ray.remote(_range_bucket)
        _RANGE_COUNT = ray.remote(_band_counts)

    # snapshot refs once: the counting pass and the slicing pass read the
    # SAME blocks (holding the refs pins them in the object store, which
    # may spill — the price of a two-pass exchange without re-execution);
    # count tasks launch AS REFS STREAM so the pass overlaps the scans
    lrefs, rrefs, lcnt, rcnt = [], [], [], []
    for r in iter_block_refs(left_ds):
        lrefs.append(r)
        lcnt.append(_RANGE_COUNT.remote(r, left_val, width, eps, False))
    for r in iter_block_refs(right_ds):
        rrefs.append(r)
        rcnt.append(_RANGE_COUNT.remote(r, right_val, width, eps, True))
    sides = []
    for refs in (lcnt, rcnt):
        tabs = [t for t in ray.get(refs) if t.num_rows]
        if tabs:
            merged = (pa.concat_tables(tabs).group_by("band")
                      .aggregate([("n", "sum")]))
            hot = merged.filter(pc.greater(merged["n_sum"], max_band_rows))
        else:
            hot = pa.table({"band": pa.array([], pa.int64()),
                            "n_sum": pa.array([], pa.int64())})
        sides.append(hot)
    lhot, rhot = sides
    all_hot = np.union1d(
        np.asarray(lhot["band"].to_numpy(zero_copy_only=False)),
        np.asarray(rhot["band"].to_numpy(zero_copy_only=False)))
    if len(all_hot):
        def counts_for(hot_t, bands):
            hb = np.asarray(hot_t["band"].to_numpy(zero_copy_only=False))
            hn = np.asarray(hot_t["n_sum"].to_numpy(zero_copy_only=False))
            if not len(hb):
                return np.zeros(len(bands), dtype=np.int64)
            srt = np.argsort(hb)
            hb, hn = hb[srt], hn[srt]
            pos_c = np.minimum(np.searchsorted(hb, bands), len(hb) - 1)
            return np.where(hb[pos_c] == bands, hn[pos_c], 0)

        s_l = np.maximum(counts_for(lhot, all_hot) // max_band_rows + 1, 1)
        s_r = np.maximum(counts_for(rhot, all_hot) // max_band_rows + 1, 1)
        if int((s_l * s_r).max()) >= (1 << _GID_BITS):
            raise ValueError(
                f"range_join sub-split grid exceeds 2^{_GID_BITS} cells for "
                f"one band — max_band_rows ({max_band_rows}) is too small "
                "for this skew")
        _LOG.warning(
            "range_join: %d hot band(s) over %d rows sub-split into grids "
            "(max S_left=%d, S_right=%d)", len(all_hot), max_band_rows,
            int(s_l.max()), int(s_r.max()))
        hot_ref = ray.put((all_hot, s_l, s_r))
    else:
        hot_ref = None

    from .exchange import bounded_map_refs

    def _mapped(refs, col, replicate):
        return bounded_map_refs(
            refs,
            lambda r: _RANGE_MAP_L.options(num_returns=num_buckets)
            .remote(r, col, width, eps, num_buckets, replicate, hot_ref),
            num_buckets)

    lmap = _mapped(lrefs, left_val, False)
    rmap = _mapped(rrefs, right_val, True)
    joined = [
        _RANGE_REDUCE.remote(len(lmap), left_val, right_val, eps, b, out_dir,
                             *[m[b] for m in lmap], *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


# --------------------------------------------------------------------------
# Global (keyless) as-of join over an ordered co-partition
# --------------------------------------------------------------------------

def _gasof_rsort(right_ts: str, *parts: pa.Table) -> pa.Table:
    """Concat + sort a range's right rows; duplicate right timestamps
    raise LOUDLY (the matched payload would depend on partition order)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks()
    # a NULL right timestamp matches nothing (SQL ASOF inequality) —
    # drop before sorting so the unique-ts check and merge never see it
    t = t.filter(pc.is_valid(t[right_ts]))
    if not t.num_rows:
        return pa.table({})
    return t.take(pc.sort_indices(t, sort_keys=[(right_ts, "ascending")]))


def _gasof_last(right_ts: str, t: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if not t.num_rows:
        return pa.table({})
    return t.slice(t.num_rows - 1, 1)


def _gasof_join(left_ts: str, right_ts: str, right_schema,
                n_left: int, *parts) -> pa.Table:
    """parts = n_left left slices, then [carry_table, sorted_right]."""
    import pandas as pd

    from .sketches import limit_worker_threads

    limit_worker_threads()
    carry, right_t = parts[n_left], parts[n_left + 1]
    lparts = [p for p in parts[:n_left] if p.num_rows]
    if not lparts:
        return pa.table({})
    left_all = pa.concat_tables(lparts).combine_chunks()
    # a NULL left timestamp satisfies no inequality: those rows emit
    # with typed-null right columns (ASOF LEFT JOIN), the rest merge
    lvalid = pc.is_valid(left_all[left_ts])
    left_t = left_all.filter(lvalid)
    left_null_t = left_all.filter(pc.invert(lvalid))

    def _nullified(lt: pa.Table) -> pa.Table:
        for f in right_schema:
            lt = lt.append_column(
                pa.field(f.name, f.type), pa.nulls(lt.num_rows, f.type))
        return lt

    left_t = left_t.take(pc.sort_indices(
        left_t, sort_keys=[(left_ts, "ascending")]))
    rparts = [p for p in (carry, right_t) if p.num_rows]
    if not rparts or not left_t.num_rows:
        return _nullified(pa.concat_tables([left_t, left_null_t])
                          .combine_chunks())
    right_full = pa.concat_tables(rparts).combine_chunks()
    right_full = right_full.take(pc.sort_indices(
        right_full, sort_keys=[(right_ts, "ascending")]))
    # unique-right-ts contract check (within range + carry)
    ts = right_full[right_ts].combine_chunks()
    if right_full.num_rows > 1 and pc.any(pc.equal(
            ts.slice(1), ts.slice(0, right_full.num_rows - 1))).as_py():
        raise ValueError(
            "global_asof_join requires UNIQUE right timestamps — ties "
            "would make the matched payload partition-order-dependent; "
            "pre-aggregate the right side to one row per timestamp")
    merged = pd.merge_asof(
        left_t.to_pandas(), right_full.to_pandas(),
        left_on=left_ts, right_on=right_ts, direction="backward")
    merged_t = pa.Table.from_pandas(merged, preserve_index=False)
    for f in right_schema:  # restore arrow types (same rule as asof_join)
        col = f.name
        if col not in merged_t.column_names:
            continue
        arr = merged_t[col]
        if arr.type == f.type:
            continue
        if pa.types.is_floating(arr.type) and \
                not pa.types.is_floating(f.type):
            arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
        i = merged_t.schema.get_field_index(col)
        merged_t = merged_t.set_column(i, pa.field(col, f.type),
                                       arr.cast(f.type))
    if left_null_t.num_rows:
        merged_t = pa.concat_tables(
            [merged_t, _nullified(left_null_t)],
            promote_options="default").combine_chunks()
    return merged_t


_GASOF_RSORT = None
_GASOF_LAST = None
_GASOF_JOIN = None


def global_asof_join(left_ds=None, right_ds=None, *, left_ts: str,
                     right_ts: str, cutpoints,
                     left_refs=None, left_schema: pa.Schema | None = None,
                     right_refs=None,
                     right_schema: pa.Schema | None = None) -> pa.Table:
    """KEYLESS as-of: for every left row, the latest right row with
    ``right_ts <= left_ts`` over the WHOLE stream — what the keyed
    ``asof_join`` cannot express (no key to co-partition on; one global
    order instead).  Both sides co-partition ORDERED by the broadcast
    ``cutpoints`` (range exchange), each range joins locally, and a
    B-row CARRY (the last right row of the nearest earlier non-empty
    range) makes range boundaries invisible — the right row matching a
    left row near a range start may live arbitrarily far back.

    Either side may be a Dataset (``left_ds``/``right_ds``) or a list of
    Arrow block OBJECT REFS plus an explicit schema
    (``left_refs``+``left_schema`` / ``right_refs``+``right_schema``) —
    the refs form lets a caller feed slices produced by an upstream fused
    scan (one pass over the source instead of one per consumer) without a
    ``from_arrow_refs`` round trip; schema-less empty slices among the
    refs are routed harmlessly by the range map's key-missing path, which
    is exactly why the schema must be passed explicitly in that form.

    Contracts: right timestamps UNIQUE (raises on ties — the matched
    payload would be partition-order-dependent; pre-aggregate to one row
    per ts), column names disjoint across sides.  NULL semantics match
    the keyed asof_join (three-valued logic): a NULL left ts emits with
    typed-null right columns, a NULL right ts drops."""
    import ray

    from .blocks import iter_block_refs
    from .exchange import bounded_map_refs, range_map_remote

    def _hint(ds):
        s = ds.schema()
        return getattr(s, "base_schema", None) or pa.schema(
            [(n, t) for n, t in zip(s.names, s.types)])

    def _side(ds, refs, schema, what):
        if refs is not None:
            if schema is None:
                raise ValueError(
                    f"global_asof_join: {what}_refs requires {what}_schema "
                    f"(refs may contain schema-less empty slices)")
            return refs, schema
        return iter_block_refs(ds), _hint(ds)

    lrefs, lschema = _side(left_ds, left_refs, left_schema, "left")
    rrefs, rschema = _side(right_ds, right_refs, right_schema, "right")
    shared = set(lschema.names) & set(rschema.names)
    if shared:
        raise ValueError(
            f"global_asof_join requires disjoint column names; "
            f"shared: {sorted(shared)}")

    global _GASOF_RSORT, _GASOF_LAST, _GASOF_JOIN
    if _GASOF_RSORT is None:
        _GASOF_RSORT = ray.remote(_gasof_rsort)
        _GASOF_LAST = ray.remote(_gasof_last)
        _GASOF_JOIN = ray.remote(_gasof_join)
    num_buckets = len(cutpoints) + 1
    range_map = range_map_remote()

    def _mapped(refs, col):
        return bounded_map_refs(
            refs,
            lambda r: range_map.options(num_returns=num_buckets)
            .remote(r, col, cutpoints),
            num_buckets)

    lmap = _mapped(lrefs, left_ts)
    rmap = _mapped(rrefs, right_ts)
    r_sorted = [_GASOF_RSORT.remote(right_ts, *[m[b] for m in rmap])
                for b in range(num_buckets)]
    lasts = ray.get([_GASOF_LAST.remote(right_ts, r) for r in r_sorted])
    # carry[i] = last right row of the nearest earlier NON-EMPTY range
    # (ranges are ordered, so that row is globally the latest before i)
    empty_r = pa.table({})
    carries, prev = [], empty_r
    for b in range(num_buckets):
        carries.append(prev)
        if lasts[b].num_rows:
            prev = lasts[b]
    joined = [_GASOF_JOIN.remote(left_ts, right_ts, rschema, len(lmap),
                                 *[m[b] for m in lmap], carries[b],
                                 r_sorted[b])
              for b in range(num_buckets)]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default") \
        .combine_chunks()
