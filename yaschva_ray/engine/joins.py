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


_RANGE_MAP_L = None
_RANGE_MAP_R = None
_RANGE_REDUCE = None


def _band_slices(t: pa.Table, val_col: str, width: float, eps: float,
                 num_buckets: int, replicate: bool):
    """Band-partition rows by ``floor(value/width) % B``.  The RIGHT side
    replicates each row into every band its ±eps neighborhood touches
    (≤3 with width ≥ 2·eps), so any matching pair co-occurs in the LEFT
    row's band; the left side lands in exactly one band (no duplicate
    pairs).  Banding is by VALUE, so heavy skew concentrates in one band —
    pick ``width`` so a band's rows fit a task."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    v = np.asarray(t[val_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    if replicate:
        idx_parts, band_parts = [], []
        for d in (-eps, 0.0, eps):
            b = np.floor((v + d) / width).astype(np.int64)
            idx_parts.append(np.arange(len(v)))
            band_parts.append(b)
        idx = np.concatenate(idx_parts)
        bands = np.concatenate(band_parts)
        # drop duplicate (row, band) replicas
        key = idx.astype(np.int64) * np.int64(1 << 20) + (bands % (1 << 20))
        _, first = np.unique(key, return_index=True)
        idx, bands = idx[first], bands[first]
        src = t.take(pa.array(idx))
    else:
        bands = np.floor(v / width).astype(np.int64)
        src = t
    buckets = (bands % num_buckets + num_buckets) % num_buckets
    order = np.argsort(buckets, kind="stable")
    st = src.take(pa.array(order))
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [st.slice(bounds[b], bounds[b + 1] - bounds[b])
           for b in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


def _range_bucket(n_left: int, left_val: str, right_val: str, eps: float,
                  *parts: pa.Table) -> pa.Table:
    """Vectorized interval match within one bucket: sort right by value,
    searchsorted the ±eps window per left row, emit pairs."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    if not lparts or not rparts:
        return pa.table({})
    left = pa.concat_tables(lparts).combine_chunks()
    right = pa.concat_tables(rparts).combine_chunks()
    rv = np.asarray(right[right_val].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    order = np.argsort(rv, kind="stable")
    right = right.take(pa.array(order))
    rv = rv[order]
    lv = np.asarray(left[left_val].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    lo = np.searchsorted(rv, lv - eps, side="left")
    hi = np.searchsorted(rv, lv + eps, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return pa.table({})
    lidx = np.repeat(np.arange(len(lv)), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    ridx = np.arange(total) - offs[lidx] + lo[lidx]
    lt = left.take(pa.array(lidx))
    rt = right.take(pa.array(ridx))
    cols = {c: lt[c] for c in lt.column_names}
    for c in rt.column_names:
        cols[c if c not in cols else f"{c}_right"] = rt[c]
    return pa.table(cols)


def range_join(left_ds, right_ds, *, left_val: str, right_val: str,
               eps: float, width: float | None = None,
               num_buckets: int = 16) -> pa.Table:
    """Band-partitioned interval join: pairs where
    ``|left_val - right_val| <= eps``.  Both sides exchange once (raw
    tasks); matches are bucket-local vectorized searchsorted windows."""
    import ray

    width = width or max(2.0 * eps, 1e-9)
    global _RANGE_MAP_L, _RANGE_MAP_R, _RANGE_REDUCE
    if _RANGE_MAP_L is None:
        _RANGE_MAP_L = ray.remote(_band_slices)
        _RANGE_REDUCE = ray.remote(_range_bucket)

    def _mapped(ds, col, replicate):
        out = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, _md in bundle.blocks:
                out.append(_RANGE_MAP_L.options(num_returns=num_buckets)
                           .remote(block_ref, col, width, eps, num_buckets,
                                   replicate))
        if num_buckets == 1:
            out = [[r] for r in out]
        return out

    lmap = _mapped(left_ds, left_val, False)
    rmap = _mapped(right_ds, right_val, True)
    joined = [
        _RANGE_REDUCE.remote(len(lmap), left_val, right_val, eps,
                             *[m[b] for m in lmap], *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()
