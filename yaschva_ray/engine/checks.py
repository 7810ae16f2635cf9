"""Cross-partition checks: uniqueness (hash-shuffle groupby) and
referential integrity (broadcast anti-join).

The reference has no cross-document checks (SURVEY.md §2.5 — per-doc fold
only); these are the engine additions the north rule specifies.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


_UNIQ_BLOCK_REMOTE = None


def uniqueness_violations(ds: "ray.data.Dataset", key: str,
                          num_buckets: int = 16) -> pa.Table:
    """Keys appearing more than once → ``(key, n_docs)`` violation table.

    Explicit two-stage hash exchange with RAW Ray tasks over block refs
    streamed out of the dataset's execution (``iter_internal_ref_bundles``)
    — Ray Data's ``groupby`` all-to-all pays seconds of fixed latency and
    ANTI-scales on high-cardinality keys (measured: 8M keys, 24.6 s @ 8
    cpus → 37.1 s @ 32).  Map: one task per block — partial-count (one row
    per distinct key: the combine step) and slice into ``hash(key) % B``
    buckets, launched WHILE upstream still runs.  Reduce: one vectorized
    group-sum per bucket.  Fixed B shuffle partitions regardless of key
    cardinality; hot keys cost nothing (pre-combined per block).
    """
    import ray

    global _UNIQ_BLOCK_REMOTE
    if _UNIQ_BLOCK_REMOTE is None:
        def _map_block(block: pa.Table, key_: str, nb: int):
            from .sketches import limit_worker_threads

            limit_worker_threads()
            if block.num_rows == 0 or key_ not in block.column_names:
                # Ray Data never runs a map_batches UDF on zero-row
                # blocks, so an empty block downstream of a
                # schema-CHANGING transform still carries the SOURCE
                # schema — the key column may be absent.  No rows means
                # no keys; emit empty slices (combine/reduce filter
                # empties before any concat, so the placeholder type is
                # never unified against real slices).
                empty = pa.table({key_: pa.array([], _key_type(key_)),
                                  "partial_n": pa.array([], pa.int64())})
                return [empty] * nb if nb > 1 else empty
            out = _bucket_partial_slices(block.select([key_]), key_, nb)
            return out if nb > 1 else out[0]

        _UNIQ_BLOCK_REMOTE = ray.remote(_map_block)

    from .blocks import iter_block_refs

    merged, pending = [], []
    for block_ref in iter_block_refs(ds):
        out = _UNIQ_BLOCK_REMOTE.options(num_returns=num_buckets) \
            .remote(block_ref, key, num_buckets)
        pending.append([out] if num_buckets == 1 else out)
        # bound fan-in with the SEMANTIC combine (group-sum) — same
        # streaming tree the flagship uses; entries collapse geometrically
        if len(pending) >= 64:
            merged.append(uniqueness_combine(pending, key, num_buckets))
            pending.clear()
            if len(merged) >= 64:
                merged[:] = [uniqueness_combine(merged, key, num_buckets)]
    return uniqueness_reduce(merged + pending, key, num_buckets)


# Reserved column name of the HASHED uniqueness exchange (phase 1 of the
# two-phase plan: 8-byte key hashes move instead of key strings; phase 2
# re-reads ONLY the key column for candidate hashes and recounts exact
# strings — collisions can only ADD candidates, exactness is unaffected).
HASH_COL = "__kh"


def _key_type(key: str):
    return pa.int64() if key == HASH_COL else pa.string()


def _int_group_sum(vals: np.ndarray, weights: np.ndarray | None):
    """(unique_vals, summed_weights) via sort + reduceat — ~4× Arrow's
    hash group_by for uint64/int64 keys (measured at 4M rows)."""
    if weights is None:
        u, c = np.unique(vals, return_counts=True)
        return u, c.astype(np.int64)
    order = np.argsort(vals, kind="stable")
    sv, sw = vals[order], weights[order]
    newg = np.ones(len(sv), dtype=bool)
    newg[1:] = sv[1:] != sv[:-1]
    starts = np.nonzero(newg)[0]
    return sv[starts], np.add.reduceat(sw, starts).astype(np.int64)


def _bucket_partial_slices(t: pa.Table, key: str, num_buckets: int) -> list[pa.Table]:
    """Partial-count a key table and split it into ``num_buckets`` hash
    slices (the map half of the two-stage uniqueness exchange).  The
    hashed-mode column gets a pure-numpy kernel (sort + reduceat beats
    Arrow's hash group_by on int64 keys)."""
    from .sketches import _hash64

    if key == HASH_COL:
        vals = np.asarray(t[HASH_COL].to_numpy(zero_copy_only=False))
        w = (np.asarray(t["partial_n"].to_numpy(zero_copy_only=False))
             if "partial_n" in t.column_names else None)
        u, c = _int_group_sum(vals, w)
        buckets = (u.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        u, c, sb = u[order], c[order], buckets[order]
        bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
        return [pa.table({HASH_COL: pa.array(u[bounds[b]:bounds[b + 1]]),
                          "partial_n": pa.array(c[bounds[b]:bounds[b + 1]])})
                for b in range(num_buckets)]

    counts = t.group_by(key).aggregate([([], "count_all")])
    karr = counts[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    buckets = (_hash64(karr) % np.uint64(num_buckets)).astype(np.int64)
    part = pa.table({key: karr,
                     "partial_n": counts["count_all"].cast(pa.int64())})
    order = np.argsort(buckets, kind="stable")
    sorted_part = part.take(pa.array(order))
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(num_buckets + 1))
    return [sorted_part.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)]


def _reduce_bucket_tables(parts, key: str) -> pa.Table:
    """Group-sum one bucket's partials and keep keys with total count > 1."""
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({key: pa.array([], _key_type(key)),
                         "n_docs": pa.array([], pa.int64())})
    t = pa.concat_tables(nonempty)
    if key == HASH_COL:
        u, c = _int_group_sum(
            np.asarray(t[HASH_COL].to_numpy(zero_copy_only=False)),
            np.asarray(t["partial_n"].to_numpy(zero_copy_only=False)))
        keep = c > 1
        return pa.table({HASH_COL: pa.array(u[keep]),
                         "n_docs": pa.array(c[keep])})
    g = t.group_by(key).aggregate([("partial_n", "sum")])
    g = g.filter(pc.greater(g["partial_n_sum"], 1))
    return pa.table({key: g[key], "n_docs": g["partial_n_sum"].cast(pa.int64())})


def _uniq_map_key_blobs_task(key: str, num_buckets: int, hashed: bool,
                             *blocks: pa.Table):
    from .ipcio import ipc_table
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    tables = [t for b in blocks
              for t in (ipc_table(x) for x in b["keys"].to_pylist())
              if t.num_columns]
    slice_key = HASH_COL if hashed else key
    if not tables:
        empty = pa.table({slice_key: pa.array([], _key_type(slice_key)),
                          "partial_n": pa.array([], pa.int64())})
        return [empty] * num_buckets if num_buckets > 1 else empty
    t = pa.concat_tables(tables)
    if hashed:
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        t = pa.table({HASH_COL: pa.array(_hash64(karr).astype(np.int64))})
    out = _bucket_partial_slices(t, slice_key, num_buckets)
    return out if num_buckets > 1 else out[0]


_UNIQ_MAP_REMOTE = None


def uniqueness_map_key_blobs(block_refs, key: str, num_buckets: int = 16,
                             hashed: bool = False):
    """Map half of the uniqueness exchange sourced from FUSED-STAGE rows
    (column ``keys``: IPC-encoded per-batch key tables) — the input table
    is NOT re-scanned; the flagship's single pass already extracted the key
    column.  ONE task per call covering every given block ref (callers
    chunk refs as they stream — per-block task submission was itself a
    driver bottleneck at 96M+ docs).  ``hashed=True`` emits 8-byte key
    hashes (column ``HASH_COL``) instead of key strings — phase 1 of the
    two-phase plan; finish with :func:`uniqueness_reduce` on ``HASH_COL``
    and verify the candidate hashes with
    :func:`uniqueness_verify_candidates`."""
    import ray

    global _UNIQ_MAP_REMOTE
    if _UNIQ_MAP_REMOTE is None:
        _UNIQ_MAP_REMOTE = ray.remote(_uniq_map_key_blobs_task)
    entry = _UNIQ_MAP_REMOTE.options(num_returns=num_buckets) \
        .remote(key, num_buckets, hashed, *block_refs)
    return [[entry] if num_buckets == 1 else entry]


_UNIQ_COMBINE_REMOTE = None


def _combine_bucket_task(key: str, *parts: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({key: pa.array([], _key_type(key)),
                         "partial_n": pa.array([], pa.int64())})
    t = pa.concat_tables(nonempty)
    if key == HASH_COL:
        u, c = _int_group_sum(
            np.asarray(t[HASH_COL].to_numpy(zero_copy_only=False)),
            np.asarray(t["partial_n"].to_numpy(zero_copy_only=False)))
        return pa.table({HASH_COL: pa.array(u), "partial_n": pa.array(c)})
    g = t.group_by(key).aggregate([("partial_n", "sum")])
    return pa.table({key: g[key],
                     "partial_n": g["partial_n_sum"].cast(pa.int64())})


def uniqueness_combine(map_out, key: str, num_buckets: int = 16):
    """Collapse many map entries into ONE map-shaped entry (per-bucket
    partial group-sums).  Fired periodically WHILE upstream still streams,
    this (a) moves combine work inside the scan wall instead of the
    post-scan reduce tail and (b) bounds the final reduce's fan-in — at
    10^12 docs the reduce would otherwise concat millions of slices per
    bucket in one task."""
    import ray

    global _UNIQ_COMBINE_REMOTE
    if _UNIQ_COMBINE_REMOTE is None:
        _UNIQ_COMBINE_REMOTE = ray.remote(_combine_bucket_task)
    return [_UNIQ_COMBINE_REMOTE.remote(key, *[m[b] for m in map_out])
            for b in range(num_buckets)]


def uniqueness_reduce(map_out, key: str, num_buckets: int = 16,
                      gather: bool = True):
    """Reduce half: one task per bucket over all accumulated map slices.
    ``gather=False`` returns the per-bucket OBJECT REFS so the caller can
    overlap the reduce with other post-scan work (e.g. the flagship's
    shard assembly) and gather later via
    :func:`finalize_uniqueness_reduce`."""
    import ray

    @ray.remote
    def reduce_bucket(*parts: pa.Table) -> pa.Table:
        return _reduce_bucket_tables(parts, key)

    reduced = [reduce_bucket.remote(*[m[b] for m in map_out])
               for b in range(num_buckets)]
    if not gather:
        return reduced
    return finalize_uniqueness_reduce(reduced, key)


def finalize_uniqueness_reduce(reduced_refs, key: str) -> pa.Table:
    """Gather + order the per-bucket reduce outputs (tiny: dup keys only)."""
    import ray

    tables = [t for t in ray.get(reduced_refs) if t.num_rows]
    if not tables:
        return pa.table({key: pa.array([], _key_type(key)),
                         "n_docs": pa.array([], pa.int64())})
    return pa.concat_tables(tables).combine_chunks().sort_by([(key, "ascending")])


_UNIQ_VERIFY_BLOBS_REMOTE = None


def _uniq_verify_blobs_task(key: str, num_buckets: int, cand, *blocks):
    """Decode the retained fused blocks' key blobs, keep rows whose hash
    is a phase-1 candidate, partial-slice the survivors (string mode).
    ``cand is None`` (chained mode: no candidates, or the set exceeded
    the broadcast cap and the driver will fall back) short-circuits to
    empty partials."""
    from .ipcio import ipc_table
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    tables = [t for b in blocks
              for t in (ipc_table(x) for x in b["keys"].to_pylist())
              if t.num_columns] if cand is not None else []
    if not tables:
        empty = pa.table({key: pa.array([], pa.string()),
                          "partial_n": pa.array([], pa.int64())})
        return [empty] * num_buckets if num_buckets > 1 else empty
    t = pa.concat_tables(tables)
    karr = t[key]
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    h = pa.array(_hash64(karr).astype(np.int64))
    t = t.filter(pc.is_in(h, value_set=cand))
    out = _bucket_partial_slices(t, key, num_buckets)
    return out if num_buckets > 1 else out[0]


# above this candidate count the phase-1 duplicate-hash set is no longer a
# small broadcast: the chained candidate task returns None (verify maps
# no-op) and the flagship falls back to the full string-exchange scan
UNIQ_CAND_BROADCAST_CAP = 20_000_000

_UNIQ_CAND_REMOTE = None


def _cand_from_reduced_task(cap: int, *reduced: pa.Table):
    """Concat the phase-1 per-bucket duplicate tables into the
    broadcastable candidate hash array — or None when there are no
    candidates OR the set exceeds ``cap`` (either way the chained verify
    maps no-op; the driver distinguishes the two from the gathered
    phase-1 tables)."""
    tables = [t for t in reduced if t.num_rows]
    if not tables:
        return None
    t = pa.concat_tables(tables)
    if t.num_rows > cap:
        return None
    ch = t[HASH_COL]
    return ch.combine_chunks() if isinstance(ch, pa.ChunkedArray) else ch


def uniqueness_verify_candidates_blobs_chained(
    chunk_refs: list[list], key: str, reduced_refs,
    num_buckets: int = 16, cap: int = UNIQ_CAND_BROADCAST_CAP,
):
    """Phase 2 launched AS A TASK CHAIN behind the phase-1 reduce refs —
    no driver sync anywhere: the candidate array materializes in a task,
    the verify maps take its ref as an auto-dereferenced argument, and
    the per-bucket reduces return refs.  The whole phase therefore runs
    while the driver is still gathering shard assembly; the post-scan
    uniqueness tail shrinks to two tiny gathers (measured 3.9 s → sub-
    second at 96 M docs).  Finish with :func:`finalize_uniqueness_reduce`
    on the returned refs AFTER checking the gathered phase-1 tables for
    the empty / over-cap cases."""
    import ray

    global _UNIQ_CAND_REMOTE, _UNIQ_VERIFY_BLOBS_REMOTE
    if _UNIQ_CAND_REMOTE is None:
        _UNIQ_CAND_REMOTE = ray.remote(_cand_from_reduced_task)
    if _UNIQ_VERIFY_BLOBS_REMOTE is None:
        _UNIQ_VERIFY_BLOBS_REMOTE = ray.remote(_uniq_verify_blobs_task)
    cand_ref = _UNIQ_CAND_REMOTE.remote(cap, *reduced_refs)
    map_out = [
        _UNIQ_VERIFY_BLOBS_REMOTE.options(num_returns=num_buckets)
        .remote(key, num_buckets, cand_ref, *chunk)
        for chunk in chunk_refs
    ]
    if num_buckets == 1:
        map_out = [[r] for r in map_out]
    return uniqueness_reduce(map_out, key, num_buckets, gather=False)


def uniqueness_verify_candidates_blobs(
    chunk_refs: list[list], key: str, cand_hashes: pa.Array,
    num_buckets: int = 16,
) -> pa.Table:
    """Phase 2 over the RETAINED fused blocks (no re-read: their key
    blobs are already in the object store — the price is pinning them
    until phase 1 finishes, which Ray spills gracefully): keep rows
    whose 8-byte key hash is in the broadcast candidate set (typically
    ≲1% of rows) and run the exact string group-count over just those.
    A hash collision can only ADD a candidate row; the string group-by
    makes the result exact."""
    import ray

    global _UNIQ_VERIFY_BLOBS_REMOTE
    if _UNIQ_VERIFY_BLOBS_REMOTE is None:
        _UNIQ_VERIFY_BLOBS_REMOTE = ray.remote(_uniq_verify_blobs_task)
    cand_ref = ray.put(cand_hashes)
    map_out = [
        _UNIQ_VERIFY_BLOBS_REMOTE.options(num_returns=num_buckets)
        .remote(key, num_buckets, cand_ref, *chunk)
        for chunk in chunk_refs
    ]
    if num_buckets == 1:
        map_out = [[r] for r in map_out]
    return uniqueness_reduce(map_out, key, num_buckets)


def uniqueness_verify_candidates(
    files: list[str], key: str, cand_hashes: pa.Array,
    num_buckets: int = 16, files_per_task: int = 4,
) -> pa.Table:
    """Phase 2 of the two-phase uniqueness plan when the fused blocks are
    NO LONGER available (e.g. resumed runs): re-read ONLY the key column
    (column-pruned parquet scan), keep rows whose 8-byte key hash is in
    the broadcast candidate set (the phase-1 duplicate hashes — typically
    ≲1% of rows), and run the exact string group-count over just those.
    A hash collision can only ADD a candidate row; the string group-by
    makes the result exact."""
    import ray

    from .sketches import _hash64

    cand_ref = ray.put(cand_hashes)

    @ray.remote
    def map_file(paths: list[str]):
        import pyarrow.parquet as pq

        from .sketches import limit_worker_threads

        limit_worker_threads()
        cand = ray.get(cand_ref)
        t = pa.concat_tables([pq.read_table(p, columns=[key]) for p in paths])
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        h = pa.array(_hash64(karr).astype(np.int64))
        t = t.filter(pc.is_in(h, value_set=cand))
        out = _bucket_partial_slices(t, key, num_buckets)
        return out if num_buckets > 1 else out[0]

    groups = [[str(f) for f in files[i:i + files_per_task]]
              for i in range(0, len(files), files_per_task)]
    map_out = [map_file.options(num_returns=num_buckets).remote(g)
               for g in groups]
    if num_buckets == 1:
        map_out = [[r] for r in map_out]
    return uniqueness_reduce(map_out, key, num_buckets)


def uniqueness_violations_files(
    files: list[str], key: str, num_buckets: int = 16, files_per_task: int = 4
) -> pa.Table:
    """Scalable cross-partition uniqueness over parquet files: explicit
    two-stage hash shuffle with raw Ray tasks.

    Measured motivation: Ray Data's ``groupby`` all-to-all ANTI-scaled on
    this workload (8M keys: 24.6s @ 8 cpus → 37.1s @ 32 cpus); the explicit
    exchange below scales near-linearly because the map side pre-combines
    (one row per distinct key per file) and the reduce side is one
    vectorized group-sum per bucket — the classic partial/final pattern
    with B fixed reduce partitions.

    Map stage: one task per file — read ONLY the key column, partial-count,
    split by ``hash(key) % B``.  Reduce stage: one task per bucket —
    concat + group-sum + filter>1.  Returns the full violation table
    ``(key, n_docs)`` (duplicated keys only — small by construction).
    """
    import ray

    @ray.remote
    def map_file(paths: list[str]) -> list[pa.Table]:
        import pyarrow.parquet as pq

        from .sketches import limit_worker_threads

        limit_worker_threads()
        t = pa.concat_tables([pq.read_table(p, columns=[key]) for p in paths])
        out = _bucket_partial_slices(t, key, num_buckets)
        return out if num_buckets > 1 else out[0]

    groups = [[str(f) for f in files[i:i + files_per_task]]
              for i in range(0, len(files), files_per_task)]
    map_out = [map_file.options(num_returns=num_buckets).remote(g) for g in groups]
    if num_buckets == 1:
        map_out = [[r] for r in map_out]
    return uniqueness_reduce(map_out, key, num_buckets)


def referential_missing_keys(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    *,
    num_buckets: int = 32,
    broadcast_limit: int = 200_000,
) -> pa.Table:
    """Distinct left-side keys with no matching right-side key (anti-join).

    The right side is pre-combined per block (distinct keys only, the
    combine step).  The path then switches on the MEASURED combined key
    count:

    * ≤ ``broadcast_limit``: keys are broadcast once via ``ray.put`` and the
      anti-join is a shuffle-free vectorized filter over the left side;
    * otherwise BOTH sides hash-partition on the key (``bucket`` groupby,
      fixed partition count) and each bucket runs a vectorized ``is_in``
      anti-join — the distinct key set of a 100 TB right table is not
      broadcastable (round-1 VERDICT item 7).

    Missing keys are assumed small (violations); they are gathered and
    de-duplicated at the end.
    """
    import ray

    def _distinct_bucket(t: pa.Table, key: str, side: int) -> pa.Table:
        d = t.group_by(key).aggregate([])  # per-block distinct (combine)
        k = d[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({"key": k,
                         "side": pa.array(np.full(len(k), side, np.int8))})

    partials = right_ds.map_batches(
        lambda t: _distinct_bucket(t, right_key, 1), batch_format="pyarrow"
    ).materialize()
    key_type = None
    for f in partials.schema().base_schema:
        if f.name == "key":
            key_type = f.type

    if partials.count() <= broadcast_limit:
        from .blocks import gather_tables

        blocks = gather_tables(partials)
        keys_t = pa.concat_tables(blocks) if blocks else pa.table(
            {"key": pa.array([], key_type)})
        value_set = pc.unique(keys_t["key"].combine_chunks()
                              if isinstance(keys_t["key"], pa.ChunkedArray)
                              else keys_t["key"])
        # SQL FK semantics: a NULL left key is never a violation and a
        # NULL right key satisfies nothing — drop both (arrow's is_in
        # would otherwise match NULL = NULL)
        value_set = value_set.drop_null()
        ref = ray.put(value_set)

        def anti(t: pa.Table) -> pa.Table:
            vs = ray.get(ref)
            t = t.filter(pc.is_valid(t[left_key]))
            miss = t.filter(pc.invert(pc.is_in(t[left_key], value_set=vs)))
            d = miss.group_by(left_key).aggregate([])
            return pa.table({left_key: d[left_key]})

        out = left_ds.map_batches(anti, batch_format="pyarrow")
    else:
        # the 100 TB path: both sides' distinct keys co-locate through the
        # raw-task exchange (the Ray Data groupby it replaced is exactly
        # where the all-to-all anti-scaling bites at scale)
        from .exchange import keyed_exchange

        both = left_ds.map_batches(
            lambda t: _distinct_bucket(t, left_key, 0), batch_format="pyarrow"
        ).union(partials)

        def per_bucket(t: pa.Table) -> pa.Table:
            is_right = pc.equal(t["side"], 1)
            right_keys = t.filter(is_right)["key"]
            if isinstance(right_keys, pa.ChunkedArray):
                right_keys = right_keys.combine_chunks()
            right_keys = right_keys.drop_null()  # same FK null rule
            left_t = pa.table({"key": t.filter(pc.invert(is_right))["key"]})
            left_t = left_t.filter(pc.is_valid(left_t["key"]))
            left_t = left_t.group_by("key").aggregate([])
            miss = left_t.filter(
                pc.invert(pc.is_in(left_t["key"], value_set=right_keys)))
            return pa.table({left_key: miss["key"]})

        tables = keyed_exchange(both, "key", per_bucket,
                                num_buckets=num_buckets)
        if not tables:
            return pa.table({left_key: pa.array([], key_type)})
        t = pa.concat_tables(tables).combine_chunks()
        return (t.group_by(left_key).aggregate([])
                .sort_by([(left_key, "ascending")]))

    from .blocks import gather_tables

    blocks = gather_tables(out)
    if not blocks:
        return pa.table({left_key: pa.array([], key_type)})
    t = pa.concat_tables(blocks).combine_chunks()
    if not t.num_rows:
        return pa.table({left_key: pa.array([], key_type)})
    return (t.group_by(left_key).aggregate([])
            .sort_by([(left_key, "ascending")]))


class SpanRefExtractor:
    """Explode span media_refs: ``(doc_id, media_ref)`` rows (vectorized)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
        refs = pc.struct_field(spans.flatten(), "media_ref")
        doc_ids = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
        parents = np.repeat(np.arange(len(batch)), lengths)
        out = pa.table({
            "doc_id": doc_ids.take(pa.array(parents)),
            "media_ref": refs,
        })
        return out.filter(pc.is_valid(out["media_ref"]))


class ReferentialChecker:
    """Actor-pool stage: broadcast catalog key set (``ray.put`` once, read in
    ``__init__`` once per actor), emit rows whose ref is NOT in the catalog.

    This is the anti-join with a broadcast small side — no shuffle
    (SURVEY.md §7.3).  For catalogs too large to broadcast, hash-partition
    both sides on ``media_ref`` instead (``ds.groupby`` co-location).
    """

    def __init__(self, catalog_ref):
        import ray

        catalog = ray.get(catalog_ref) if not isinstance(catalog_ref, pa.Array) else catalog_ref
        self.value_set = catalog  # pa.Array of valid keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"]
        ok = pc.is_in(refs, value_set=self.value_set)
        return batch.filter(pc.invert(ok))
