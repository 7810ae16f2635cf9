"""Deterministic synthetic F0 table generator (BASELINE.json input_hint).

Builds the interleaved text+media document table
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
with seeded, index-addressed randomness: row ``i`` is identical no matter
how rows are batched or which worker generates it — required for
reproducible benchmarks and resume tests.

~5% of rows carry exactly one planted violation (FIXTURES.md F0): bad enum,
empty text, malformed media_ref, negative offset, duplicate doc_id, or a
dangling media_ref (caught by the referential check, not the schema).
Expected violation classes are recomputable from the row index alone —
see ``expected_violation_class``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KINDS = np.array(["text", "image", "audio", "video"])
CATALOG_SIZE = 65536
VIOLATION_CLASSES = ["bad_kind", "empty_text", "bad_media_ref", "neg_offset",
                     "dup_doc_id", "dangling_media_ref"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _h(x: np.ndarray, salt: int) -> np.ndarray:
    """Cheap vectorized splitmix-style hash of row indices."""
    salted = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (x.astype(np.uint64) + salted) * _MIX
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    return z


def expected_violation_class(i: int, seed: int = 42) -> str | None:
    """Row i's planted violation class, or None (pure function of index)."""
    r = int(_h(np.array([i]), seed * 7919)[0] % np.uint64(120))
    if r < len(VIOLATION_CLASSES) and i > 0:
        return VIOLATION_CLASSES[r]
    return None


def make_docs_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate the rows for the given global row indices (vectorized)."""
    n = len(indices)
    idx = indices.astype(np.uint64)

    n_spans = (_h(idx, seed) % np.uint64(6) + np.uint64(1)).astype(np.int64)  # 1..6
    offsets = np.concatenate([[0], np.cumsum(n_spans)])
    total = int(offsets[-1])
    # parent row index per span + span position
    parent = np.repeat(np.arange(n), n_spans)
    span_pos = np.arange(total) - offsets[parent]
    span_key = idx[parent] * np.uint64(131) + span_pos.astype(np.uint64)

    kind_i = (_h(span_key, seed + 1) % np.uint64(4)).astype(np.int64)
    # first span is always text so every doc has some text
    kind_i[span_pos == 0] = 0
    kinds = KINDS[kind_i]

    text_len = (_h(span_key, seed + 2) % np.uint64(120) + np.uint64(8)).astype(np.int64)
    media_id = (_h(span_key, seed + 3) % np.uint64(CATALOG_SIZE)).astype(np.int64)

    is_text = kind_i == 0
    # vectorized string building via python lists (one pass; strings are cheap templates)
    texts: list[str | None] = [None] * total
    media: list[str | None] = [None] * total
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua "
    for j in range(total):
        if is_text[j]:
            texts[j] = base[: text_len[j]] + format(span_key[j] & np.uint64(0xFFFF), "04x")
        else:
            media[j] = f"media://cat/{media_id[j]:06d}.bin"

    span_offsets = np.zeros(total, dtype=np.int64)
    # offset of span k = sum of lengths of previous spans (text length or 1024 for media)
    span_len = np.where(is_text, text_len + 4, 1024)
    cs = np.cumsum(span_len)
    span_offsets[1:] = cs[:-1]
    # reset at document boundaries
    doc_starts = offsets[:-1]
    starts_vals = np.concatenate([[0], cs])[doc_starts]
    span_offsets = span_offsets - np.repeat(starts_vals, n_spans) + np.repeat(
        np.zeros(n, dtype=np.int64), n_spans
    )

    doc_ids = [f"doc-{i:012x}" for i in indices]

    # --- planted violations (one per selected row) ---
    vclass = (_h(idx, seed * 7919) % np.uint64(120)).astype(np.int64)
    for k in range(n):
        c = vclass[k]
        if c >= len(VIOLATION_CLASSES) or indices[k] == 0:
            continue
        name = VIOLATION_CLASSES[c]
        s0 = int(offsets[k])  # first span of the row
        if name == "bad_kind":
            kinds = kinds.copy() if not kinds.flags.writeable else kinds
            kinds[s0] = "gif"
        elif name == "empty_text":
            texts[s0] = ""
        elif name == "bad_media_ref":
            texts[s0] = None
            media[s0] = f"http://not-media/{indices[k]}"
        elif name == "neg_offset":
            span_offsets[s0] = -1
        elif name == "dup_doc_id":
            doc_ids[k] = f"doc-{indices[k] - 1:012x}"
        elif name == "dangling_media_ref":
            texts[s0] = None
            media[s0] = f"media://missing/{indices[k]:06d}.bin"

    struct_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    spans_struct = pa.StructArray.from_arrays(
        [pa.array(list(kinds), pa.string()), pa.array(texts, pa.string()),
         pa.array(media, pa.string()),
         pa.array(np.clip(span_offsets, -(2**31), 2**31 - 1).astype(np.int32))],
        fields=list(struct_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), spans_struct)
    return pa.table({"doc_id": pa.array(doc_ids, pa.string()), "spans": spans})


def media_catalog() -> pa.Table:
    """The referential small side: all valid media refs."""
    return pa.table({
        "media_ref": pa.array([f"media://cat/{i:06d}.bin" for i in range(CATALOG_SIZE)])
    })


def write_f0_dataset(n_rows: int, out_dir: str, seed: int = 42,
                     rows_per_file: int = 100_000) -> list[str]:
    """Write the deterministic F0 table as multiple parquet files (one per
    shard → parallel read + per-shard checkpoint lineage).  Cached: existing
    complete output is reused."""
    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, "_DONE")
    n_files = (n_rows + rows_per_file - 1) // rows_per_file
    files = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(n_files)]
    # marker records the generation parameters — reuse only an exact match
    # (a stale marker from a different n_rows/seed/rows_per_file would hand
    # back missing files or wrong-scale data)
    # 64k-row ROW GROUPS inside each file: parquet readers parallelize at
    # row-group granularity, so a 500k-row single-group file caps read
    # parallelism at one task per file (slow pipeline ramp on small runs;
    # the same sizing rule applies to real 100 TB layouts)
    row_group = 65536
    params = f"{n_rows},{seed},{rows_per_file},rg{row_group}"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read().strip() == params:
                return files
        import shutil

        shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray and n_files > 1:
        import ray

        @ray.remote
        def _gen(lo: int, hi: int, path: str, seed: int) -> None:
            pq.write_table(make_docs_batch(np.arange(lo, hi), seed=seed), path,
                           row_group_size=65536)

        ray.get([
            _gen.remote(i * rows_per_file, min(n_rows, (i + 1) * rows_per_file), p, seed)
            for i, p in enumerate(files)
        ])
    else:
        for i, path in enumerate(files):
            lo = i * rows_per_file
            hi = min(n_rows, lo + rows_per_file)
            table = make_docs_batch(np.arange(lo, hi), seed=seed)
            pq.write_table(table, path, row_group_size=row_group)
    cat_path = os.path.join(out_dir, "media_catalog.parquet")
    pq.write_table(media_catalog(), cat_path)
    with open(done_marker, "w") as f:
        f.write(params)
    return files
