"""E2E flagship pipeline tests over the deterministic F0 table (Ray)."""

import json
import os
import shutil

import numpy as np
import pytest

from yaschva_ray.pipelines.datagen import (
    VIOLATION_CLASSES,
    expected_violation_class,
    make_docs_batch,
    write_f0_dataset,
)

N_ROWS = 12_000
SEED = 42


@pytest.fixture(scope="module")
def f0_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("f0") / "data"
    files = write_f0_dataset(N_ROWS, str(d), seed=SEED, rows_per_file=3000)
    return d, files


def expected_counts():
    counts = {c: 0 for c in VIOLATION_CLASSES}
    for i in range(N_ROWS):
        c = expected_violation_class(i, SEED)
        if c:
            counts[c] += 1
    return counts


def test_flagship_two_phase_uniqueness_matches_string_mode(
        ray_session, f0_dataset, tmp_path, monkeypatch):
    """Forcing the hashed two-phase uniqueness plan (threshold 0) must
    produce the IDENTICAL dup table and report as the default string
    mode — collisions only add phase-2 candidates, never change output."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines import flagship

    d, files = f0_dataset
    out_s, out_h = tmp_path / "s", tmp_path / "h"
    r_s = flagship.run_flagship(files, str(out_s), shards=3, batch_size=2048)
    monkeypatch.setattr(flagship, "_UNIQ_TWO_PHASE_BYTES", 0)
    r_h = flagship.run_flagship(files, str(out_h), shards=3, batch_size=2048)
    for r in (r_s, r_h):
        r.pop("uniqueness_tail_s", None)
    assert r_s == r_h
    t_s = pq.read_table(str(out_s / "uniqueness" / "dups-0000.parquet"))
    t_h = pq.read_table(str(out_h / "uniqueness" / "dups-0000.parquet"))
    assert t_s.equals(t_h)
    assert t_s.num_rows > 0  # the fixture plants dup_doc_id rows


def test_datagen_deterministic():
    a = make_docs_batch(np.arange(100, 200), seed=SEED)
    b = make_docs_batch(np.arange(100, 200), seed=SEED)
    assert a.equals(b)
    # batch-boundary independence: generating in two halves == one go
    c1 = make_docs_batch(np.arange(100, 150), seed=SEED)
    c2 = make_docs_batch(np.arange(150, 200), seed=SEED)
    import pyarrow as pa

    assert pa.concat_tables([c1, c2]).equals(a)


def test_flagship_end_to_end(ray_session, f0_dataset, tmp_path):
    from yaschva_ray.pipelines.flagship import run_flagship

    d, files = f0_dataset
    out = tmp_path / "out"
    report = run_flagship(files, str(out),
                          catalog_path=str(d / "media_catalog.parquet"),
                          shards=3, batch_size=2048)
    exp = expected_counts()
    schema_fail = exp["bad_kind"] + exp["empty_text"] + exp["bad_media_ref"] + exp["neg_offset"]
    assert report["n_docs"] == N_ROWS
    assert report["n_fail"] == schema_fail
    # exact expected duplicated-key count: simulate the doc_id column
    from collections import Counter

    ids = []
    for i in range(N_ROWS):
        if expected_violation_class(i, SEED) == "dup_doc_id":
            ids.append(f"doc-{i - 1:012x}")
        else:
            ids.append(f"doc-{i:012x}")
    n_dup_exact = sum(1 for _, c in Counter(ids).items() if c > 1)
    assert report["n_dup_keys"] == n_dup_exact
    # malformed refs are also absent from the catalog, so referential flags
    # both planted classes
    assert report["n_dangling_refs"] == exp["dangling_media_ref"] + exp["bad_media_ref"]

    # violations parquet has exact reference error strings
    import pyarrow.dataset as pads

    vio_files = sorted(str(p) for p in out.glob("part-*/violations/*.parquet"))
    vio = pads.dataset(vio_files).to_table().to_pylist()
    errors = {v["error"] for v in vio}
    assert "Value needs to be one of the following: [text, image, audio, video] " in errors
    assert "String did not match required regex" in errors
    assert "Value is smaller than the required minimum" in errors


def test_flagship_resume_byte_identical(ray_session, f0_dataset, tmp_path):
    from yaschva_ray.engine.checkpoint import load_manifest
    from yaschva_ray.pipelines.flagship import run_flagship

    d, files = f0_dataset
    out = tmp_path / "out"
    report1 = run_flagship(files, str(out), shards=3, batch_size=2048)
    m1 = load_manifest(str(out))

    # simulate a crash: drop the last manifest line and its partition output
    lines = open(out / "_manifest.jsonl").read().strip().split("\n")
    with open(out / "_manifest.jsonl", "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    last = json.loads(lines[-1])["partition"]
    shutil.rmtree(out / f"part-{last:05d}")
    os.unlink(out / "_uniqueness_done.json")

    report2 = run_flagship(files, str(out), shards=3, batch_size=2048)
    m2 = load_manifest(str(out))
    # timings are run-dependent; everything else must be byte-identical
    report1.pop("uniqueness_tail_s", None)
    report2.pop("uniqueness_tail_s", None)
    assert report2 == report1
    # per-partition content digests identical after resume
    assert {k: v["digest"] for k, v in m2.items()} == {k: v["digest"] for k, v in m1.items()}


def test_sketch_merge_accuracy(ray_session, f0_dataset):
    import ray.data

    from yaschva_ray.engine.sketches import ColumnSketcher, merge_partials
    from yaschva_ray.pipelines.flagship import SpanFeatures

    d, files = f0_dataset
    ds = ray.data.read_parquet([str(f) for f in files])
    feats = ds.map_batches(SpanFeatures(), batch_format="pyarrow")
    partials = feats.map_batches(
        ColumnSketcher, batch_format="pyarrow",
        fn_constructor_args=(["n_spans", "text_chars"],), concurrency=2,
    ).take_all()
    merged = merge_partials(partials)
    s = merged["n_spans"].summary()
    assert s["count"] == N_ROWS
    assert 1 <= s["min"] and s["max"] <= 6
    # HLL on 6 distinct values
    assert 4 <= s["distinct_est"] <= 8
    q = s["quantiles"]
    assert 1 <= q[0.25] <= q[0.5] <= q[0.75] <= 6


def test_uniqueness_hot_key_skew(ray_session, tmp_path):
    """A pathologically hot key (40% of all rows) must not break or slow the
    uniqueness shuffle: the map side pre-combines per file, so the hot key
    ships as ONE (key, count) row per file regardless of its row count."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yaschva_ray.engine.checks import uniqueness_violations_files

    files = []
    for f in range(4):
        n = 50_000
        hot = ["doc-hot"] * 20_000
        uniq = [f"doc-{f}-{i:08d}" for i in range(n - 20_000)]
        pq.write_table(pa.table({"doc_id": pa.array(hot + uniq)}),
                       str(tmp_path / f"part-{f}.parquet"))
        files.append(str(tmp_path / f"part-{f}.parquet"))
    t0 = time.time()
    out = uniqueness_violations_files(files, "doc_id")
    wall = time.time() - t0
    rows = out.to_pylist()
    assert rows == [{"doc_id": "doc-hot", "n_docs": 80_000}]
    assert wall < 20  # pre-combine keeps the hot key cheap


def test_flagship_multi_wave_matches_single_wave(ray_session, f0_dataset, tmp_path):
    """wave_size=1 (one Dataset execution per shard, uniqueness map partials
    accumulated ACROSS waves) must produce the identical report and
    per-partition digests as the single-wave run."""
    from yaschva_ray.engine.checkpoint import load_manifest
    from yaschva_ray.pipelines.flagship import run_flagship

    d, files = f0_dataset
    out1, out2 = tmp_path / "one", tmp_path / "waves"
    r1 = run_flagship(files, str(out1), shards=3, batch_size=2048,
                      catalog_path=str(d / "media_catalog.parquet"))
    r2 = run_flagship(files, str(out2), shards=3, batch_size=2048,
                      wave_size=1,
                      catalog_path=str(d / "media_catalog.parquet"))
    m1, m2 = load_manifest(str(out1)), load_manifest(str(out2))
    # timings are run-dependent; everything else must be byte-identical
    r1.pop("uniqueness_tail_s", None)
    r2.pop("uniqueness_tail_s", None)
    assert r1 == r2
    assert {k: v["digest"] for k, v in m1.items()} == \
        {k: v["digest"] for k, v in m2.items()}
