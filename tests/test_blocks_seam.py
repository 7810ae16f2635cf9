"""Version guard for the ONE private Ray Data API the engine leans on
(``Dataset.iter_internal_ref_bundles`` — streams block refs mid-execution
so raw-task exchanges overlap the scan).  If a Ray upgrade shifts it, the
first test fails loudly with the version; the second proves the public
``to_arrow_refs`` fallback in ``engine.blocks`` carries the same rows."""

import sys

sys.path.insert(0, "/root/repo")

from yaschva_ray.engine.blocks import has_streaming_refs, iter_block_refs  # noqa: E402


def test_private_streaming_ref_api_present():
    import ray
    import ray.data

    assert hasattr(ray.data.Dataset, "iter_internal_ref_bundles"), (
        f"Ray {ray.__version__} no longer exposes "
        "Dataset.iter_internal_ref_bundles — engine.blocks.iter_block_refs "
        "degrades to the blocking to_arrow_refs fallback (correct but "
        "without scan overlap); re-pin the seam against the new API")


def test_fallback_refs_carry_same_rows(ray_session):
    import ray
    import ray.data

    def mk():
        return ray.data.range(1000, override_num_blocks=4).map_batches(
            lambda t: t, batch_format="pyarrow")

    ds = mk()
    assert has_streaming_refs(ds)
    fast = [ray.get(r) for r in iter_block_refs(mk())]
    slow = [ray.get(r) for r in iter_block_refs(mk(), force_fallback=True)]
    assert sum(t.num_rows for t in fast) == 1000
    assert sum(t.num_rows for t in slow) == 1000
    assert sorted(x for t in fast for x in t["id"].to_pylist()) == \
        sorted(x for t in slow for x in t["id"].to_pylist())


def test_estimate_bytes_engages_on_parquet_reads(ray_session):
    """Auto bucket sizing must actually see a size for parquet-backed
    datasets (plan metadata or source-file fallback) — otherwise every
    auto-sized exchange silently lands on the default."""
    import ray.data

    from yaschva_ray.engine.joins import _auto_buckets, _estimate_bytes

    ds = ray.data.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    est = _estimate_bytes(ds)
    assert est is not None and est > 0
    assert _auto_buckets(ds) >= 8
    # and through a map (lineage keeps input files reachable)
    mapped = ds.map_batches(lambda t: t, batch_format="pyarrow")
    est2 = _estimate_bytes(mapped)
    assert est2 is not None and est2 > 0
