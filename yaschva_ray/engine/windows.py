"""Session windows (gap-based sessionization) — the classic streaming
window a batch engine has to build itself (the reference has no streaming
semantics at all, SURVEY.md §2.5; tumbling/sliding windows live in
pipelines.ops as truncation + grouped aggregate).

Shape: ONE raw-task hash exchange on the session key (the same
``num_returns`` bucket pattern as uniqueness/joins — Ray Data's groupby
all-to-all costs seconds of fixed latency, engine/checks.py), then each
bucket runs a fully vectorized session assignment: sort by (key, ts),
``np.diff`` gaps, boundary cumsum, segment-reduced (start, end, count).
Partitioning assumption: one KEY's events fit a bucket task (keys are
users; a user's history is small — bucket COUNT handles total volume),
identical to the as-of join's documented assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SESSION_MAP = None
_SESSION_REDUCE = None


_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _session_bucket(key: str, ts: str, gap_s: float, bucket_id: int,
                    out_dir: str | None, *parts: pa.Table) -> pa.Table:
    from .joins import _sink_bucket
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks()
    from .joins import _warn_hot_key

    _warn_hot_key(t, key, "session_windows", bucket_id)
    ts_type = t.schema.field(ts).type
    if not pa.types.is_timestamp(ts_type):
        raise TypeError(f"session ts column {ts!r} must be a timestamp, "
                        f"got {ts_type}")
    # gap compared in the column's OWN unit — no lossy unit casts
    gap_units = int(round(gap_s * _UNIT_PER_S[ts_type.unit]))
    order = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                          (ts, "ascending")])
    t = t.take(order)
    # null-safe, mirroring SQL window semantics: null keys form ONE
    # partition; null timestamps sort last within a partition.  The SQL
    # boundary rule is `lag(ts) IS NULL OR ts - lag(ts) > gap`, so the
    # FIRST null-ts row attaches to its user's last session (lag is the
    # last valid ts, NULL-diff is not > gap) while every SUBSEQUENT
    # null-ts row sees lag(ts) IS NULL and starts a singleton session;
    # min/max(ts) skip nulls so an all-null session has null bounds
    ka = t[key]
    if isinstance(ka, pa.ChunkedArray):
        ka = ka.combine_chunks()
    # segment by dictionary codes: type-generic (string/int/any key) and
    # null-safe — distinct values get distinct codes, nulls fill to -1
    kcodes = np.asarray(pc.fill_null(ka.dictionary_encode().indices, -1)
                        .to_numpy(zero_copy_only=False)).astype(np.int64)
    tsa = t[ts]
    if isinstance(tsa, pa.ChunkedArray):
        tsa = tsa.combine_chunks()
    tv = np.asarray(pc.is_valid(tsa).to_numpy(zero_copy_only=False))
    tsv = np.asarray(pc.fill_null(tsa.cast(pa.int64()), 0)
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
    n = len(kcodes)
    new_s = np.ones(n, dtype=bool)
    if n > 1:
        new_user = kcodes[1:] != kcodes[:-1]
        new_s[1:] = new_user | ~tv[:-1] | (tv[1:] & tv[:-1]
                                           & (tsv[1:] - tsv[:-1] > gap_units))
    starts = np.nonzero(new_s)[0]
    ends = np.append(starts[1:], n)
    # valid-ts count per session: valid rows sort first, so the session's
    # min is its first row and its max is row starts + nval - 1
    cv = np.cumsum(tv.astype(np.int64))
    nval = cv[ends - 1] - (cv[starts] - tv[starts].astype(np.int64))
    has_ts = nval > 0
    end_idx = starts + np.maximum(nval, 1) - 1
    out = pa.table({
        key: ka.take(pa.array(starts)),
        "session_start": pa.array(tsv[starts], mask=~has_ts).cast(ts_type),
        "session_end": pa.array(tsv[end_idx], mask=~has_ts).cast(ts_type),
        "n_events": pa.array((ends - starts).astype(np.int64)),
    })
    if out_dir is not None:
        return _sink_bucket(out, out_dir, bucket_id)
    return out


def session_windows(ds, *, key: str, ts: str, gap_s: float,
                    num_buckets: int | None = None,
                    out_dir: str | None = None) -> pa.Table:
    """Sessionize events: rows with the same ``key`` separated by more
    than ``gap_s`` seconds start a new session.  Returns one row per
    session ``(key, session_start, session_end, n_events)``, gathered;
    with ``out_dir`` each bucket writes its own parquet part and a small
    (bucket, n_rows, path) manifest is returned — the 100 TB path."""
    import ray

    from .exchange import bounded_map_entries
    from .joins import _auto_buckets, _map_block

    global _SESSION_MAP, _SESSION_REDUCE
    if _SESSION_MAP is None:
        _SESSION_MAP = ray.remote(_map_block)
        _SESSION_REDUCE = ray.remote(_session_bucket)
    if num_buckets is None:
        num_buckets = _auto_buckets(ds)

    map_out = bounded_map_entries(
        ds,
        lambda ref: _SESSION_MAP.options(num_returns=num_buckets)
        .remote(ref, key, num_buckets),
        num_buckets)
    reduced = [_SESSION_REDUCE.remote(key, ts, gap_s, b, out_dir,
                                      *[m[b] for m in map_out])
               for b in range(num_buckets)]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    merged = pa.concat_tables(tables).combine_chunks()
    if out_dir is not None:
        return merged.sort_by([("bucket", "ascending")])
    return merged.sort_by([(key, "ascending"),
                           ("session_start", "ascending")])
