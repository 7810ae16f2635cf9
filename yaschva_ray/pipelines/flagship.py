"""Flagship pipeline (north rule lifecycle, SURVEY.md §3.1 engine form):

``read_parquet(F0 docs) → map_batches(TableValidator)  [vectorized mask]
  → verdict counts (streaming aggregate)
  → failing rows → map_batches(ViolationExploder)      [exact payloads]
  → groupby(doc_id) uniqueness                          [hash shuffle]
  → span media_ref explode → broadcast anti-join        [no shuffle]
  → per-column sketches (actor pool, partial merge)
  → write violations/verdicts/metrics per partition + manifest``

All stages stream; nothing materializes the full input.  Ray sessions are
owned by the caller.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.checks import ReferentialChecker, SpanRefExtractor, uniqueness_violations
from ..engine.checkpoint import run_partitioned
from ..engine.sketches import ColumnSketcher, merge_partials
from ..vectorized import TableValidator, ViolationExploder

FLAGSHIP_SCHEMA = {
    # FIXTURES.md F0 — applied per document over the input_hint table shape
    "$types": {"$span": {
        "kind": {"$enum": ["text", "image", "audio", "video"]},
        "text": ["?", {"$string": {"minLength": 1, "maxLength": 65536}}],
        "media_ref": ["?", {"$string": {"regex": "^media://[a-z0-9/._-]+$"}}],
        "offset": {"$number": {"min": 0, "max": 9007199254740991}},
    }},
    "doc_id": {"$string": {"minLength": 1, "regex": "^doc-[0-9a-f]{12}$"}},
    "spans": {"$array": "$span", "minLength": 1, "maxLength": 4096},
}


def _only_invalid(t: pa.Table) -> pa.Table:
    return t.filter(pc.invert(t["valid"]))


def write_sorted_single(ds, path: str, sort_cols: list[str], stem: str = "data") -> int:
    """Deterministic small-output sink: gather result blocks, sort totally,
    write ONE file with a fixed name and canonical chunking — so a resumed
    partition is byte-identical (Ray's distributed writer embeds per-run
    UUIDs in filenames and page boundaries follow block layout).

    Used for violation/report outputs only — a small fraction of the input
    per partition; the heavy input path never funnels through this.
    Returns the row count."""
    import pyarrow.parquet as pq
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs())]
    if not tables:
        return 0
    combined = pa.concat_tables(tables).combine_chunks()
    combined = combined.sort_by([(c, "ascending") for c in sort_cols])
    os.makedirs(path, exist_ok=True)
    pq.write_table(combined, os.path.join(path, f"{stem}-0000.parquet"))
    return combined.num_rows


class SpanFeatures:
    """Vectorized per-doc span statistics used by verdicts + sketches:
    n_spans, n_text_spans, total_text_chars."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        kinds = pc.struct_field(flat, "kind")
        texts = pc.struct_field(flat, "text")
        is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
        tchars = pc.utf8_length(texts).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        cs_text = np.concatenate([[0], np.cumsum(np.where(is_text, 1, 0))])
        cs_chars = np.concatenate([[0], np.cumsum(tchars)])
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_spans": pa.array(lengths),
            "n_text_spans": pa.array(cs_text[offsets[1:]] - cs_text[offsets[:-1]]),
            "text_chars": pa.array(cs_chars[offsets[1:]] - cs_chars[offsets[:-1]]),
        })


def validate_dataset(ds, schema=FLAGSHIP_SCHEMA, *, batch_size: int = 8192):
    """Dataset → Dataset with appended ``valid`` column (vectorized)."""
    tv = TableValidator(schema)
    return ds.map_batches(tv, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def run_flagship(
    input_files: list[str],
    out_dir: str,
    *,
    catalog_path: str | None = None,
    schema=FLAGSHIP_SCHEMA,
    shards: int | None = None,
    batch_size: int = 8192,
    sketch_concurrency=(2, 8),
) -> dict:
    """Full checkpointed run.  Returns the aggregate report."""
    import ray
    import ray.data

    # broadcast the referential small side once per run (ray.put → actors)
    catalog_ref = None
    if catalog_path and os.path.exists(catalog_path):
        import pyarrow.parquet as pq

        cat = pq.read_table(catalog_path)["media_ref"].combine_chunks()
        catalog_ref = ray.put(cat)

    n_shards = shards or max(1, min(len(input_files), 16))
    shard_lists = [list(input_files[i::n_shards]) for i in range(n_shards)]
    shard_lists = [s for s in shard_lists if s]

    def run_shard(files: list[str], part_dir: str) -> dict:
        ds = ray.data.read_parquet(files)
        validated = validate_dataset(ds, schema, batch_size=batch_size)

        # violations: only failing rows reach the (row-oracle) exploder
        exploder = ViolationExploder(schema, id_columns=("doc_id",))
        violations = (
            validated.map_batches(_only_invalid, batch_format="pyarrow")
            .map_batches(exploder, batch_format="pyarrow")
        )
        write_sorted_single(violations, os.path.join(part_dir, "violations"),
                            ["doc_id", "path", "error", "value_repr"], stem="violations")

        # verdict counts (small streaming aggregate)
        stats = validated.map_batches(
            lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "n_fail": pa.array([int(pc.sum(pc.invert(t["valid"])).as_py() or 0)], pa.int64()),
            }),
            batch_format="pyarrow",
        ).to_pandas()
        n_docs = int(stats["n"].sum())
        n_fail = int(stats["n_fail"].sum())

        # referential: explode span refs → broadcast anti-join
        dangling_rows = 0
        if catalog_ref is not None:
            refs = ds.map_batches(SpanRefExtractor(), batch_format="pyarrow")
            dangling = refs.map_batches(
                ReferentialChecker, batch_format="pyarrow",
                fn_constructor_args=(catalog_ref,), concurrency=2,
            )
            dangling_rows = write_sorted_single(
                dangling, os.path.join(part_dir, "dangling_refs"),
                ["doc_id", "media_ref"], stem="dangling")

        # per-column sketches over span features (actor pool, partial rows)
        features = ds.map_batches(SpanFeatures(), batch_format="pyarrow")
        partial_rows = features.map_batches(
            ColumnSketcher, batch_format="pyarrow",
            fn_constructor_args=(["n_spans", "n_text_spans", "text_chars"],),
            concurrency=sketch_concurrency,
        ).take_all()
        sketches = merge_partials(partial_rows)
        with open(os.path.join(part_dir, "sketches.json"), "w") as f:
            json.dump({k: v.summary() for k, v in sketches.items()}, f, sort_keys=True)

        return {
            "n_docs": n_docs,
            "n_fail": n_fail,
            "n_dangling_refs": dangling_rows,
        }

    records = run_partitioned(shard_lists, out_dir, run_shard)

    # CROSS-partition uniqueness on doc_id — one global hash-shuffle groupby
    # over the pre-aggregated per-block key counts (north rule).  Resumable
    # via its own marker file.
    uniq_dir = os.path.join(out_dir, "uniqueness")
    uniq_done = os.path.join(out_dir, "_uniqueness_done.json")
    if os.path.exists(uniq_done):
        with open(uniq_done) as f:
            n_dup_keys = json.load(f)["n_dup_keys"]
    else:
        if os.path.isdir(uniq_dir):  # partial output from a crashed run
            import shutil

            shutil.rmtree(uniq_dir)
        all_docs = ray.data.read_parquet(input_files, columns=["doc_id"])
        dup = uniqueness_violations(all_docs, "doc_id")
        n_dup_keys = write_sorted_single(dup, uniq_dir, ["doc_id"], stem="dups")
        with open(uniq_done, "w") as f:
            json.dump({"n_dup_keys": n_dup_keys}, f)

    report = {
        "n_docs": sum(r["n_docs"] for r in records),
        "n_fail": sum(r["n_fail"] for r in records),
        "n_dup_keys": n_dup_keys,
        "n_dangling_refs": sum(r.get("n_dangling_refs") or 0 for r in records),
        "partitions": len(records),
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, sort_keys=True)
    return report
