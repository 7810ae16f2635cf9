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


def uniqueness_violations(ds: "ray.data.Dataset", key: str,
                          num_buckets: int = 64) -> "ray.data.Dataset":
    """Keys appearing more than once → ``(key, n_docs)`` violation rows.

    Two-phase hash shuffle:
    1. per-batch partial counts (one row per key per block — the combine
       step, so the exchange moves distinct keys, not rows) + a
       ``bucket = hash(key) % B`` column,
    2. ``groupby(bucket).map_groups`` with a fully vectorized pyarrow
       group-sum per bucket.

    Bucketing the shuffle key (instead of grouping on the raw key) keeps the
    number of shuffle partitions fixed at B regardless of key cardinality
    and makes the per-group work a single vectorized kernel — ~3× faster
    than a per-key Aggregate at 500k keys, and the gap grows with scale.
    Skewed keys cost nothing here because a bucket's work is O(rows) and
    duplicates are pre-combined per block.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        from .sketches import _hash64

        counts = batch.group_by(key).aggregate([(key, "count")])
        karr = counts[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        bucket = (_hash64(karr) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({key: karr,
                         "partial_n": counts[f"{key}_count"].cast(pa.int64()),
                         "bucket": pa.array(bucket)})

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(key).aggregate([("partial_n", "sum")])
        g = g.filter(pc.greater(g["partial_n_sum"], 1))
        return pa.table({key: g[key], "n_docs": g["partial_n_sum"].cast(pa.int64())})

    return (ds.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


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

    from .sketches import _hash64

    @ray.remote
    def map_file(paths: list[str]) -> list[pa.Table]:
        import pyarrow.parquet as pq

        from .sketches import limit_worker_threads

        limit_worker_threads()
        t = pa.concat_tables([pq.read_table(p, columns=[key]) for p in paths])
        counts = t.group_by(key).aggregate([(key, "count")])
        karr = counts[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        buckets = (_hash64(karr) % np.uint64(num_buckets)).astype(np.int64)
        part = pa.table({key: karr,
                         "partial_n": counts[f"{key}_count"].cast(pa.int64())})
        order = np.argsort(buckets, kind="stable")
        sorted_part = part.take(pa.array(order))
        sorted_buckets = buckets[order]
        bounds = np.searchsorted(sorted_buckets, np.arange(num_buckets + 1))
        return [sorted_part.slice(bounds[b], bounds[b + 1] - bounds[b])
                for b in range(num_buckets)]

    @ray.remote
    def reduce_bucket(*parts: pa.Table) -> pa.Table:
        t = pa.concat_tables([p for p in parts if p.num_rows])
        if t.num_rows == 0:
            return pa.table({key: pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        g = t.group_by(key).aggregate([("partial_n", "sum")])
        g = g.filter(pc.greater(g["partial_n_sum"], 1))
        return pa.table({key: g[key], "n_docs": g["partial_n_sum"].cast(pa.int64())})

    groups = [[str(f) for f in files[i:i + files_per_task]]
              for i in range(0, len(files), files_per_task)]
    map_out = [map_file.options(num_returns=num_buckets).remote(g) for g in groups]
    if num_buckets == 1:
        map_out = [[r] for r in map_out]
    reduced = [reduce_bucket.remote(*[m[b] for m in map_out])
               for b in range(num_buckets)]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({key: pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64())})
    return pa.concat_tables(tables).combine_chunks().sort_by([(key, "ascending")])


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
