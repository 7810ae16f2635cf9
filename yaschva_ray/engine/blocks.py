"""Streamed block-ref access, pinning the one private Ray Data API seam.

``Dataset.iter_internal_ref_bundles`` (private, present in Ray 2.49) yields
block refs AS UPSTREAM EXECUTION PRODUCES THEM, which lets the engine's
raw-task exchanges (uniqueness, joins, flagship shard assembly) launch
per-block tasks while the scan is still running — post-scan work hides
inside the scan wall.  If a future Ray removes or renames it, every caller
degrades through this one seam to the public ``to_arrow_refs()`` (blocking:
refs appear only after the full execution finishes — correct, just without
the overlap).  ``tests/test_blocks_seam.py`` fails loudly with the Ray
version if the private surface shifts, and exercises the fallback.
"""

from __future__ import annotations


def has_streaming_refs(ds) -> bool:
    return hasattr(ds, "iter_internal_ref_bundles")


def iter_block_refs(ds, *, force_fallback: bool = False):
    """Yield the dataset's block object-refs (streamed when the private API
    is available, else after a blocking materialization)."""
    if not force_fallback and has_streaming_refs(ds):
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, _md in bundle.blocks:
                yield block_ref
    else:
        yield from ds.to_arrow_refs()


def gather_tables(ds, *, force_fallback: bool = False) -> list:
    """Materialize the dataset's blocks as a list of Arrow tables.

    Replaces the ``ray.get(ds.to_arrow_refs())`` pattern everywhere:
    ``to_arrow_refs`` calls ``schema(fetch_if_missing=True)`` AFTER
    consuming the ref bundles, and on an already-consumed plan that
    schema fetch launches a SECOND limit-1 execution of the whole
    pipeline prefix — measured 0.15–0.4 s of pure overhead per gather at
    sf0.1, and a wasted scan start per stage at scale.  Block order is
    identical (``to_arrow_refs`` consumes the same bundle iterator).
    Blocks are Arrow already in every pyarrow-batch pipeline; anything
    else is converted defensively.  Schema-less empty blocks are dropped
    (they carry no rows and break ``concat_tables``)."""
    import pyarrow as pa
    import ray

    refs = list(iter_block_refs(ds, force_fallback=force_fallback))
    out = []
    for b in ray.get(refs):
        if not isinstance(b, pa.Table):
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_columns:
            out.append(b)
    return out
