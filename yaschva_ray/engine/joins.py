"""Distributed joins Ray Data lacks natively (build-brief custom operators).

As-of join: for each left row, the latest right row with the same key and
``right_ts <= left_ts``.  Shape: BOTH sides hash-partition on the join key
with the same raw-task ``num_returns`` exchange the uniqueness check uses
(fixed bucket count, one shuffle each side); each bucket task runs a
vectorized ``pandas.merge_asof`` over its co-located key groups.  The
partitioning assumption: a key's rows fit one bucket task — keys are
customers/users, so a single key's history is small; bucket COUNT handles
total volume.

Bucket sizing: when the caller doesn't pass ``num_buckets``, it is derived
from the datasets' estimated in-memory bytes so a bucket's reduce input
targets ``_TARGET_BUCKET_BYTES`` — a forgotten parameter no longer means a
1/16-of-the-data task at scale.  When ``out_dir`` is passed, each bucket
task writes its own parquet part (tmp + atomic rename) and only a small
manifest is gathered — the 100 TB path; without it the joined table is
gathered (callers project/sort small results).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TARGET_BUCKET_BYTES = 64 << 20  # reduce-task input target
_MIN_BUCKETS, _MAX_BUCKETS = 8, 512


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
                 out_dir: str | None, *parts: pa.Table) -> pa.Table:
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
        shared = set(lparts[0].column_names) & set(right_schema.names)
        if shared:
            # pandas would suffix _x/_y, the empty-right path would not —
            # two bucket schemas that cannot concat; demand disjoint names
            raise ValueError(
                f"asof_join requires disjoint column names on the two "
                f"sides; shared: {sorted(shared)}")
    if not lparts:
        merged_t = pa.table({})
    elif not rparts:
        # no right rows in this bucket: left rows joined with typed nulls —
        # fabricating pandas NaT here produced datetime64[ns] columns other
        # buckets' timestamp[us]/date32 schemas could not unify with
        left_t = pa.concat_tables(lparts).combine_chunks()
        order = pc.sort_indices(left_t, sort_keys=[(left_ts, "ascending")])
        left_t = left_t.take(order)
        for f in (right_schema or []):
            left_t = left_t.append_column(
                pa.field(f.name, f.type), pa.nulls(left_t.num_rows, f.type))
        merged_t = left_t
    else:
        import pandas as pd

        def _key_compat(tbl: pa.Table, col: str):
            # date32/date64 hit pandas as object dtype, which merge_asof
            # rejects — cast to timestamp[us] for the merge (lossless:
            # dates are midnights) and remember the type to cast back
            f = tbl.schema.field(col)
            if pa.types.is_date(f.type):
                i = tbl.schema.get_field_index(col)
                return tbl.set_column(
                    i, pa.field(col, pa.timestamp("us")),
                    tbl[col].cast(pa.timestamp("us"))), f.type
            return tbl, None

        left_t, _ = _key_compat(pa.concat_tables(lparts), left_ts)
        right_t, _ = _key_compat(pa.concat_tables(rparts), right_ts)
        left = left_t.to_pandas()
        left = left.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
        right = right_t.to_pandas()
        # stable sort: among equal (key, ts) right rows merge_asof takes the
        # LAST — callers should select tie-independent output columns
        right = right.sort_values(right_ts, kind="mergesort").reset_index(drop=True)
        merged = pd.merge_asof(left, right, left_on=left_ts, right_on=right_ts,
                               left_by=left_key, right_by=right_key,
                               direction="backward")
        merged_t = pa.Table.from_pandas(merged, preserve_index=False)
        # restore right-side columns' ORIGINAL arrow types: merge_asof
        # leaves unmatched rows NaN/NaT (widening ints to double, dates to
        # datetime64), and buckets with different match patterns would
        # otherwise fail to unify at the final concat
        for f in right_schema:
            col = f.name
            if col not in merged_t.column_names:
                continue
            arr = merged_t[col]
            if arr.type == f.type:
                continue
            if pa.types.is_floating(arr.type) and \
                    not pa.types.is_floating(f.type):
                arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type),
                                 arr)
            i = merged_t.schema.get_field_index(col)
            merged_t = merged_t.set_column(i, pa.field(col, f.type),
                                           arr.cast(f.type))
    if out_dir is not None:
        return _sink_bucket(merged_t, out_dir, bucket_id)
    return merged_t


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, num_buckets: int | None = None,
              out_dir: str | None = None) -> pa.Table:
    """Backward as-of join (latest right row at or before each left row's
    timestamp, per key).  ``num_buckets=None`` derives B from the inputs'
    estimated bytes (per-bucket target ``_TARGET_BUCKET_BYTES``).  With
    ``out_dir`` each bucket writes its own parquet part and a small manifest
    table (bucket, n_rows, path) is returned — the at-scale path; otherwise
    the joined table is gathered."""
    import ray

    from .exchange import bounded_map_entries

    if num_buckets is None:
        num_buckets = _auto_buckets(left_ds, right_ds)
    global _MAP_REMOTE, _REDUCE_REMOTE
    if _MAP_REMOTE is None:
        _MAP_REMOTE = ray.remote(_map_block)
        _REDUCE_REMOTE = ray.remote(_asof_bucket)

    def _mapped(ds, key):
        return bounded_map_entries(
            ds,
            lambda ref: _MAP_REMOTE.options(num_returns=num_buckets)
            .remote(ref, key, num_buckets),
            num_buckets)

    lmap = _mapped(left_ds, left_key)
    rmap = _mapped(right_ds, right_key)
    joined = [
        _REDUCE_REMOTE.remote(len(lmap), left_key, right_key, left_ts,
                              right_ts, b, out_dir, *[m[b] for m in lmap],
                              *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


_RANGE_MAP_L = None
_RANGE_REDUCE = None


def _band_slices(t: pa.Table, val_col: str, width: float, eps: float,
                 num_buckets: int, replicate: bool):
    """Band-partition rows by ``floor(value/width) % B``.  The RIGHT side
    replicates each row into every band its ±eps neighborhood touches
    (≤3 with width ≥ 2·eps), so any matching pair co-occurs in the LEFT
    row's band; the left side lands in exactly one band (no duplicate
    pairs).  Replicas are deduped per (row, BUCKET) — with few buckets
    distinct bands alias to one bucket and would emit each match twice.
    Banding is by VALUE, so heavy skew concentrates in one band — pick
    ``width`` so a band's rows fit a task."""
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
        bks = (bands % num_buckets + num_buckets) % num_buckets
        # drop duplicate (row, bucket) replicas
        key = idx.astype(np.int64) * np.int64(num_buckets) + bks
        _, first = np.unique(key, return_index=True)
        idx, buckets = idx[first], bks[first]
        src = t.take(pa.array(idx))
    else:
        bands = np.floor(v / width).astype(np.int64)
        buckets = (bands % num_buckets + num_buckets) % num_buckets
        src = t
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
    """Vectorized interval match within one bucket: sort right by value,
    searchsorted the ±eps window per left row, emit pairs."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    if not lparts or not rparts:
        out = pa.table({})
    else:
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
            out = pa.table({})
        else:
            lidx = np.repeat(np.arange(len(lv)), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])
            ridx = np.arange(total) - offs[lidx] + lo[lidx]
            lt = left.take(pa.array(lidx))
            rt = right.take(pa.array(ridx))
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
               out_dir: str | None = None) -> pa.Table:
    """Band-partitioned interval join: pairs where
    ``|left_val - right_val| <= eps``.  Both sides exchange once (raw
    tasks); matches are bucket-local vectorized searchsorted windows.
    ``width`` must be ≥ 2·eps (narrower bands silently miss pairs — raise
    instead); ``num_buckets=None`` derives B from the inputs' bytes;
    ``out_dir`` switches to per-bucket parquet sinks + manifest return."""
    import ray

    from .exchange import bounded_map_entries

    if width is None:
        width = max(2.0 * eps, 1e-9)
    elif width < 2.0 * eps:
        raise ValueError(
            f"range_join width ({width}) must be >= 2*eps ({2.0 * eps}): "
            "a right row only replicates into bands its ±eps neighborhood "
            "touches, so narrower bands can miss matching pairs")
    if num_buckets is None:
        num_buckets = _auto_buckets(left_ds, right_ds)
    global _RANGE_MAP_L, _RANGE_REDUCE
    if _RANGE_MAP_L is None:
        _RANGE_MAP_L = ray.remote(_band_slices)
        _RANGE_REDUCE = ray.remote(_range_bucket)

    def _mapped(ds, col, replicate):
        return bounded_map_entries(
            ds,
            lambda ref: _RANGE_MAP_L.options(num_returns=num_buckets)
            .remote(ref, col, width, eps, num_buckets, replicate),
            num_buckets)

    lmap = _mapped(left_ds, left_val, False)
    rmap = _mapped(right_ds, right_val, True)
    joined = [
        _RANGE_REDUCE.remote(len(lmap), left_val, right_val, eps, b, out_dir,
                             *[m[b] for m in lmap], *[m[b] for m in rmap])
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(joined) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()
