"""Generic raw-task hash exchange over a Dataset's streamed block refs.

The house shuffle pattern (engine/checks.py measured it vs Ray Data's
``groupby``: the all-to-all pays seconds of fixed latency and anti-scales
at high key cardinality): one map task per upstream block — launched AS
REFS STREAM out of the producing execution, so the exchange's map half
overlaps the scan — slicing rows into ``hash(key) % B`` buckets via
``num_returns``; one reduce task per bucket running a caller-supplied
vectorized function over the bucket's concatenated rows.  All rows with
equal ``key`` land in exactly one reduce task (the co-location contract
groupby provides), with a FIXED number of shuffle partitions regardless
of key cardinality.
"""

from __future__ import annotations

import pyarrow as pa

_MAP_REMOTE = None
_REDUCE_REMOTE = None
_CONCAT_REMOTE = None


def _reduce_task(reduce_fn, empty_result, *parts: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return empty_result if empty_result is not None else pa.table({})
    return reduce_fn(pa.concat_tables(nonempty).combine_chunks())


def _concat_task(*parts: pa.Table) -> pa.Table:
    """Pure data-movement combine: merge a bucket's slices into one
    (valid for ANY reduce_fn — no semantic reduction happens here)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    return pa.concat_tables(nonempty).combine_chunks()


def reduce_remote():
    """Cached ray.remote registration of the per-bucket reduce task
    (``_reduce_task(reduce_fn, empty_result, *parts)``) — shared by
    keyed_exchange and callers that build their own map half (e.g. a
    fused multi-output scan) but want the identical reduce semantics."""
    import ray

    global _REDUCE_REMOTE
    if _REDUCE_REMOTE is None:
        _REDUCE_REMOTE = ray.remote(_reduce_task)
    return _REDUCE_REMOTE


def bounded_map_refs(block_refs, launch, num_buckets: int,
                     concat_every: int = 64) -> list:
    """Launch ``launch(block_ref) -> num_returns slices`` for every ref in
    ``block_refs`` (any iterable — a streaming generator or a snapshotted
    list), folding accumulated entries through pure-concat rounds so the
    returned entry list (and any reduce fan-in built from it) stays
    O(concat_every) regardless of block count."""
    import ray

    global _CONCAT_REMOTE
    if _CONCAT_REMOTE is None:
        _CONCAT_REMOTE = ray.remote(_concat_task)

    def _merge(entries):
        return [_CONCAT_REMOTE.remote(*[m[b] for m in entries])
                for b in range(num_buckets)]

    merged, pending = [], []
    for block_ref in block_refs:
        out = launch(block_ref)
        pending.append([out] if num_buckets == 1 else out)
        if len(pending) >= concat_every:
            merged.append(_merge(pending))
            pending.clear()
            if len(merged) >= concat_every:
                merged[:] = [_merge(merged)]
    return merged + pending


def bounded_map_entries(ds, launch, num_buckets: int,
                        concat_every: int = 64) -> list:
    """`bounded_map_refs` over a Dataset's STREAMED block refs (map tasks
    launch while the scan still runs).  Shared by keyed_exchange, the
    joins, and session windows."""
    from .blocks import iter_block_refs

    return bounded_map_refs(iter_block_refs(ds), launch, num_buckets,
                            concat_every)


def keyed_exchange(ds, key: str, reduce_fn, *, num_buckets: int | None = None,
                   empty_result: pa.Table | None = None,
                   gather: bool = True, concat_every: int = 64):
    """Hash-partition ``ds`` on ``key`` and apply ``reduce_fn`` (an
    arbitrary vectorized Table → Table function; rows sharing ``key`` are
    guaranteed co-located) once per bucket.  ``num_buckets=None`` derives
    the bucket count from the dataset's estimated bytes (64 MiB reduce
    target, same rule as the joins).

    Fan-in is BOUNDED at any scale: every ``concat_every`` map tasks the
    accumulated bucket slices merge through a pure-concat round (no
    semantic reduction — valid for any ``reduce_fn``), and merged entries
    themselves collapse geometrically, so the driver's ref list and each
    reduce task's argument count stay O(concat_every) even with millions
    of upstream blocks.  The concat rounds launch WHILE upstream still
    streams.

    ``gather=True`` returns the gathered non-empty reduce outputs (small
    results); ``gather=False`` returns the reduce OBJECT REFS so callers
    can keep streaming (``ray.data.from_arrow_refs``) — pass
    ``empty_result`` (a typed zero-row table) so empty buckets carry the
    output schema."""
    import ray

    from .joins import _auto_buckets, _map_block

    if num_buckets is None:
        num_buckets = _auto_buckets(ds)

    global _MAP_REMOTE
    if _MAP_REMOTE is None:
        _MAP_REMOTE = ray.remote(_map_block)
    reduce_remote()

    map_out = bounded_map_entries(
        ds,
        lambda ref: _MAP_REMOTE.options(num_returns=num_buckets)
        .remote(ref, key, num_buckets),
        num_buckets, concat_every)
    reduced = [_REDUCE_REMOTE.remote(reduce_fn, empty_result,
                                     *[m[b] for m in map_out])
               for b in range(num_buckets)]
    if not gather:
        return reduced
    return [t for t in ray.get(reduced) if t.num_rows]


# --------------------------------------------------------------------------
# Range exchange: ORDERED partitioning (the hash exchange's sibling)
# --------------------------------------------------------------------------

def _range_map_block(block: pa.Table, key: str, cutpoints):
    """Slice a block into len(cutpoints)+1 ORDERED ranges:
    bucket = #(cutpoints <= key) (numpy searchsorted side='right', so a
    value equal to a cutpoint — and every duplicate of it — lands in ONE
    bucket, never straddling a file boundary).  Null keys route to bucket
    0 (global nulls-first order); NaN sorts after everything (numpy
    comparison semantics) → last bucket."""
    import numpy as np

    from .sketches import limit_worker_threads

    limit_worker_threads()
    num_buckets = len(cutpoints) + 1
    if key not in block.column_names:
        out = [pa.table({})] * num_buckets
        return out if num_buckets > 1 else out[0]
    arr = block[key]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = np.asarray(arr.is_valid())
    v = np.asarray(arr.to_numpy(zero_copy_only=False))
    b = np.zeros(len(v), dtype=np.int64)
    if valid.all():
        b = np.searchsorted(cutpoints, v, side="right").astype(np.int64)
    elif valid.any():
        # null slots may surface as Python None in the object path —
        # search only the valid values (nulls stay in bucket 0)
        b[valid] = np.searchsorted(cutpoints, v[valid],
                                   side="right").astype(np.int64)
    order = np.argsort(b, kind="stable")
    st = block.take(pa.array(order))
    sb = b[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [st.slice(bounds[i], bounds[i + 1] - bounds[i])
           for i in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


def _range_reduce_task(reduce_fn, empty_result, bucket_id: int,
                       *parts: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return (reduce_fn(bucket_id, empty_result)
                if empty_result is not None else pa.table({}))
    return reduce_fn(bucket_id,
                     pa.concat_tables(nonempty).combine_chunks())


_RANGE_MAP_REMOTE = None
_RANGE_REDUCE_REMOTE = None


def range_map_remote():
    """Cached ray.remote registration of the range-slicing map task
    (shared by range_exchange and the ordered co-partition joins)."""
    import ray

    global _RANGE_MAP_REMOTE
    if _RANGE_MAP_REMOTE is None:
        _RANGE_MAP_REMOTE = ray.remote(_range_map_block)
    return _RANGE_MAP_REMOTE


def range_exchange(ds, key: str, cutpoints, reduce_fn, *,
                   empty_result: pa.Table | None = None,
                   concat_every: int = 64) -> list:
    """ORDERED partition of ``ds`` on ``key`` by broadcastable
    ``cutpoints`` (a sorted numpy array, len+1 buckets): every row of
    range i precedes every row of range i+1 globally, so a per-bucket
    sort yields globally sorted output — the primitive behind sorted
    export / merge-ready files, which a hash exchange cannot provide.
    ``reduce_fn(bucket_id, table)`` runs once per range (same bounded
    fan-in concat rounds as ``keyed_exchange``); pass ``empty_result``
    (typed zero-row table) to have ``reduce_fn`` see empty ranges too
    (e.g. to write their manifest rows).  Returns the gathered reduce
    outputs, index-aligned with range ids."""
    import ray

    global _RANGE_REDUCE_REMOTE
    range_map = range_map_remote()
    if _RANGE_REDUCE_REMOTE is None:
        _RANGE_REDUCE_REMOTE = ray.remote(_range_reduce_task)
    num_buckets = len(cutpoints) + 1
    map_out = bounded_map_entries(
        ds,
        lambda ref: range_map.options(num_returns=num_buckets)
        .remote(ref, key, cutpoints),
        num_buckets, concat_every)
    reduced = [_RANGE_REDUCE_REMOTE.remote(reduce_fn, empty_result, b,
                                           *[m[b] for m in map_out])
               for b in range(num_buckets)]
    return ray.get(reduced)
