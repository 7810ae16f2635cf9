"""Session windows (gap-based sessionization) — the classic streaming
window a batch engine has to build itself (the reference has no streaming
semantics at all, SURVEY.md §2.5; tumbling/sliding windows live in
pipelines.ops as truncation + grouped aggregate).

Shape: ONE raw-task hash exchange on the session key (the same
``num_returns`` bucket pattern as uniqueness/joins — Ray Data's groupby
all-to-all costs seconds of fixed latency, engine/checks.py), then each
bucket runs a fully vectorized session assignment: sort by (key, ts),
``np.diff`` gaps, boundary cumsum, segment-reduced (start, end, count).
Default partitioning assumption: one KEY's events fit a bucket task
(keys are users; a user's history is small — bucket COUNT handles total
volume), identical to the as-of join's.  ``skew_split=True`` lifts it:
hot keys time-band through the shared skew plan and the driver
chain-merges band-edge sessions back together (session_windows
docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SESSION_MAP = None
_SESSION_REDUCE = None


_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _session_bucket(key: str, ts: str, gap_s: float, bucket_id: int,
                    out_dir: str | None, use_band: bool,
                    *parts: pa.Table) -> pa.Table:
    from .joins import _BAND_COL, _sink_bucket
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return pa.table({})
    t = pa.concat_tables(nonempty).combine_chunks()
    from .joins import _warn_hot_key

    if not use_band:
        _warn_hot_key(t, key, "session_windows", bucket_id)
    ts_type = t.schema.field(ts).type
    if not pa.types.is_timestamp(ts_type):
        raise TypeError(f"session ts column {ts!r} must be a timestamp, "
                        f"got {ts_type}")
    # gap compared in the column's OWN unit — no lossy unit casts
    gap_units = int(round(gap_s * _UNIT_PER_S[ts_type.unit]))
    # band mode (skew_split): sessionize within (key, band) — bands are
    # time-ordered per key with nulls routed past the last band, so the
    # driver's chain merge stitches only band-edge sessions back up
    sort_keys = ([(key, "ascending"), (_BAND_COL, "ascending"),
                  (ts, "ascending")] if use_band
                 else [(key, "ascending"), (ts, "ascending")])
    order = pc.sort_indices(t, sort_keys=sort_keys)
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
        if use_band:
            from .joins import _BAND_COL

            bb = np.asarray(t[_BAND_COL].to_numpy(zero_copy_only=False),
                            np.int64)
            new_user = new_user | (bb[1:] != bb[:-1])
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


def _chain_merge_hot_sessions(merged: pa.Table, key: str, ts_type,
                              gap_units: int, hot_keys) -> pa.Table:
    """Stitch a hot key's band-edge sessions back together: walk its
    sessions in time order (nulls last) and merge consecutive ones
    whose gap is within the threshold; exactly ONE null-bounds session
    may attach to the last real session (the SQL first-null-row rule).
    Adjacent sessions WITHIN a band never merge (their gap exceeded the
    threshold when the bucket split them), so only band edges change —
    the walk is uniform and needs no band column.  O(hot keys'
    sessions) on the driver; session counts are aggregates, tiny next
    to the row counts that forced the banding."""
    hot_mask = pc.fill_null(pc.is_in(merged[key], value_set=hot_keys),
                            False)
    rest = merged.filter(pc.invert(hot_mask))
    hot_t = merged.filter(hot_mask)
    if not hot_t.num_rows:
        return merged
    out_rows = []
    for k in hot_keys.to_pylist():
        st = hot_t.filter(pc.equal(hot_t[key], k))
        if not st.num_rows:
            continue
        st = st.take(pc.sort_indices(
            st, sort_keys=[("session_start", "ascending")],
            null_placement="at_end"))
        rows = st.to_pylist()
        acc = []
        null_attached = False
        for r in rows:
            prev = acc[-1] if acc else None
            if r["session_start"] is None:
                if prev is not None and not null_attached \
                        and prev["session_start"] is not None:
                    prev["n_events"] += r["n_events"]
                    null_attached = True
                else:
                    acc.append(r)
                continue
            if prev is not None and prev["session_end"] is not None:
                gap = (_ts_units(r["session_start"], ts_type)
                       - _ts_units(prev["session_end"], ts_type))
                if gap <= gap_units:
                    prev["session_end"] = max(prev["session_end"],
                                              r["session_end"])
                    prev["n_events"] += r["n_events"]
                    continue
            acc.append(r)
        out_rows.extend(acc)
    schema = merged.schema
    stitched = pa.Table.from_pylist(out_rows, schema=schema) \
        if out_rows else merged.slice(0, 0)
    return pa.concat_tables([rest, stitched]).combine_chunks()


def _ts_units(v, ts_type) -> int:
    """A gathered session bound (datetime.datetime from to_pylist) back
    to int64 in the column's own unit."""
    return pa.scalar(v, ts_type).cast(pa.int64()).as_py()


def session_windows(ds, *, key: str, ts: str, gap_s: float,
                    num_buckets: int | None = None,
                    out_dir: str | None = None,
                    skew_split: bool = False,
                    max_key_rows: int | None = None,
                    max_bands: int = 64) -> pa.Table:
    """Sessionize events: rows with the same ``key`` separated by more
    than ``gap_s`` seconds start a new session.  Returns one row per
    session ``(key, session_start, session_end, n_events)``, gathered;
    with ``out_dir`` each bucket writes its own parquet part and a small
    (bucket, n_rows, path) manifest is returned — the 100 TB path.

    ``skew_split=True`` lifts the one-key-fits-one-bucket-task
    assumption (the as-of join's sibling): hot keys time-band through
    the shared skew plan (``engine.joins._session_skew_plan``), each
    bucket sessionizes within (key, band), and the driver chain-merges
    band-edge sessions (plus the single attaching null-row session)
    back together — exact, with O(hot keys × their sessions) driver
    work.  Incompatible with ``out_dir`` (edge sessions must come back
    to the driver; sink the stitched result instead)."""
    import ray

    from .exchange import bounded_map_entries
    from .joins import (_SKEW_MAX_KEY_ROWS, _auto_buckets, _map_block,
                        _session_skew_plan)

    global _SESSION_MAP, _SESSION_REDUCE
    if _SESSION_MAP is None:
        _SESSION_MAP = ray.remote(_map_block)
    if _SESSION_REDUCE is None:
        _SESSION_REDUCE = ray.remote(_session_bucket)
    if num_buckets is None:
        num_buckets = _auto_buckets(ds)
    if skew_split and out_dir is not None:
        raise ValueError(
            "session_windows: skew_split requires the gathered path "
            "(band-edge sessions merge on the driver); write the "
            "stitched result yourself")

    hot_keys = None
    if skew_split:
        map_out, hot_keys = _session_skew_plan(
            ds, key, ts, num_buckets,
            max_key_rows or _SKEW_MAX_KEY_ROWS, max_bands)
    else:
        map_out = bounded_map_entries(
            ds,
            lambda ref: _SESSION_MAP.options(num_returns=num_buckets)
            .remote(ref, key, num_buckets),
            num_buckets)
    use_band = hot_keys is not None
    reduced = [_SESSION_REDUCE.remote(key, ts, gap_s, b, out_dir,
                                      use_band,
                                      *[m[b] for m in map_out])
               for b in range(num_buckets)]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    merged = pa.concat_tables(tables).combine_chunks()
    if out_dir is not None:
        return merged.sort_by([("bucket", "ascending")])
    if use_band:
        ts_type = merged.schema.field("session_start").type
        gap_units = int(round(gap_s * _UNIT_PER_S[ts_type.unit]))
        merged = _chain_merge_hot_sessions(merged, key, ts_type,
                                           gap_units, hot_keys)
    return merged.sort_by([(key, "ascending"),
                           ("session_start", "ascending")])
