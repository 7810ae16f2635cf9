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


def uniqueness_violations(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """Keys appearing more than once → ``(key, n_docs)`` violation rows.

    Pre-aggregates per batch (one row per key per block) before the
    hash-shuffle ``groupby`` so the exchange moves at most
    ``distinct_keys_per_block`` rows, not every row.  For a near-unique key
    (the common case) the pre-aggregate is a no-op in size but still bounds
    the worst case; the shuffle key is the key itself (salting hook:
    pre-split hot keys upstream if a skewed key is ever used here).
    """
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts = batch.group_by(key).aggregate([(key, "count")])
        return pa.table({key: counts[key],
                         "partial_n": counts[f"{key}_count"].cast(pa.int64())})

    per_key = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("partial_n", alias_name="n_docs"))
    )
    return per_key.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)), batch_format="pyarrow"
    )


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
