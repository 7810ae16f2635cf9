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
