"""Distributed joins Ray Data lacks natively (build-brief custom operators).

As-of join: for each left row, the latest right row with the same key and
``right_ts <= left_ts``.  Shape: BOTH sides hash-partition on the join key
with the same raw-task ``num_returns`` exchange the uniqueness check uses
(fixed bucket count, one shuffle each side); each bucket task runs a
vectorized ``pandas.merge_asof`` over its co-located key groups.  The
partitioning assumption: a key's rows fit one bucket task — keys are
customers/users, so a single key's history is small; bucket COUNT handles
total volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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
    out = _hash_slices(block, key, num_buckets)
    return out if num_buckets > 1 else out[0]


def _asof_bucket(n_left: int, left_key: str, right_key: str,
                 left_ts: str, right_ts: str, *parts: pa.Table) -> pa.Table:
    import pandas as pd

    from .sketches import limit_worker_threads

    limit_worker_threads()
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    if not lparts:
        return pa.table({})
    left = pa.concat_tables(lparts).to_pandas()
    left = left.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
    if not rparts:
        merged = left
        for c in (right_ts,):
            merged[c] = pd.NaT
    else:
        right = pa.concat_tables(rparts).to_pandas()
        # stable sort: among equal (key, ts) right rows merge_asof takes the
        # LAST — callers should select tie-independent output columns
        right = right.sort_values(right_ts, kind="mergesort").reset_index(drop=True)
        merged = pd.merge_asof(left, right, left_on=left_ts, right_on=right_ts,
                               left_by=left_key, right_by=right_key,
                               direction="backward")
    return pa.Table.from_pandas(merged, preserve_index=False)


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, num_buckets: int = 16) -> pa.Table:
    """Backward as-of join (latest right row at or before each left row's
    timestamp, per key).  Returns the gathered joined table — callers
    project/sort; at 100 TB swap the final gather for per-bucket sinks."""
    import ray

    global _MAP_REMOTE, _REDUCE_REMOTE
    if _MAP_REMOTE is None:
        _MAP_REMOTE = ray.remote(_map_block)
        _REDUCE_REMOTE = ray.remote(_asof_bucket)

    def _mapped(ds, key):
        out = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, _md in bundle.blocks:
                out.append(_MAP_REMOTE.options(num_returns=num_buckets)
                           .remote(block_ref, key, num_buckets))
        if num_buckets == 1:
            out = [[r] for r in out]
        return out

    lmap = _mapped(left_ds, left_key)
    rmap = _mapped(right_ds, right_key)
    joined = [
        _REDUCE_REMOTE.remote(len(lmap), left_key, right_key, left_ts,
                              right_ts, *[m[b] for m in lmap],
                              *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()
