"""Flagship pipeline (north rule lifecycle, SURVEY.md §3.1 engine form):

``read_parquet(F0 docs, include_paths) →
  map_batches(FusedValidateStage)   [ONE pass: vectorized mask + exact
                                     violation payloads + sketch partials +
                                     referential anti-join per batch]
  → per-shard assembly + lineage manifest   [wave-grouped]
  → cross-partition uniqueness               [explicit 2-stage hash shuffle]
  → report (verdict counts, top violated paths)``

All stages stream; a full run reads each input byte EXACTLY ONCE — the
fused pass also emits per-batch key blobs that feed the uniqueness
exchange (resumed runs whose finished shards predate the session fall
back to a key-column-only scan).  Ray sessions are owned by the caller.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.checks import SpanRefExtractor
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


# Per-worker-process stage cache: lets the fused stage run as STATELESS
# TASKS (no actor-pool spin-up per shard — that cost ~2s/shard) while still
# compiling the schema / fetching the broadcast catalog once per worker.
_FUSED_CACHE: dict = {}
_ASM_CONCAT_REMOTE = None
_BLOCKS_PER_TASK = 8  # fused blocks per split/uniq-map task

# Above this input size the uniqueness exchange goes TWO-PHASE (like exact
# dedup's 4 GiB switch): phase 1 moves 8-byte key HASHES through the
# streaming combine tiers instead of key strings — string group-bys are
# the dominant uniqueness cost (measured: 0.9 s per 4M-key Arrow string
# group_by vs 0.35 s numpy int sort+reduceat, and the string volume is
# the 100 TB shuffle bottleneck) — and phase 2 re-reads ONLY the key
# column to recount candidate rows exactly.  Below it, strings flow
# directly (no second scan; the phase-2 scan costs more than it saves at
# small inputs).
_UNIQ_TWO_PHASE_BYTES = 2 << 30


def _fused_task(batch: pa.Table, schema_json: str, catalog_ref,
                unique_key: str = "doc_id") -> pa.Table:
    # schema travels as a JSON string: hashable for Ray's schema dedup and
    # parsed once per worker; cache key includes the catalog identity
    key = (schema_json, str(catalog_ref), unique_key)
    stage = _FUSED_CACHE.get(key)
    if stage is None:
        stage = FusedValidateStage(json.loads(schema_json), catalog_ref,
                                   unique_key=unique_key)
        _FUSED_CACHE[key] = stage
    return stage(batch)


def _write_single(table: pa.Table, path: str, stem: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, f"{stem}-0000.parquet"))


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


def _ipc_bytes(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _ipc_table(data: bytes) -> pa.Table:
    with pa.ipc.open_stream(pa.BufferReader(data)) as r:
        return r.read_all()


class FusedValidateStage:
    """ONE pass over the input computing everything per-batch (actor pool):

    * vectorized validity mask (TableValidator),
    * exact violation rows for failing rows only (row oracle),
    * per-column sketch partial over span features,
    * dangling media_refs vs the broadcast catalog.

    Emits one compact row per input batch — the input is scanned exactly
    once per shard, which is the property that matters at 100 TB (the naive
    four-pipeline version re-reads the shard 4×).  Stateful setup (schema
    compile, catalog fetch) happens once per actor in ``__init__``.
    """

    def __init__(self, schema, catalog_ref=None, unique_key: str = "doc_id"):
        import pickle

        import ray

        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        self.pickle = pickle
        self.unique_key = unique_key
        self.tv = TableValidator(schema)
        self.ex = ViolationExploder(schema, id_columns=("doc_id",))
        self.feats = SpanFeatures()
        self.catalog = ray.get(catalog_ref) if catalog_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "path" in batch.column_names:
            paths = batch["path"]
            if isinstance(paths, pa.ChunkedArray):
                paths = paths.combine_chunks()
            data = batch.drop_columns(["path"])
            uniq = pc.unique(paths).to_pylist()
            if len(uniq) == 1:
                return self._one(data, uniq[0])
            outs = [self._one(data.filter(pc.equal(paths, p)), p) for p in sorted(uniq)]
            return pa.concat_tables(outs)
        return self._one(batch, "")

    def _one(self, batch: pa.Table, path: str) -> pa.Table:
        from ..engine.sketches import ColumnSketch

        mask = self.tv.fail_mask(batch)
        failing = batch.filter(pa.array(mask))
        vio = self.ex(failing)

        feats = self.feats(batch)
        sketches = {}
        for col in ("n_spans", "n_text_spans", "text_chars"):
            sk = ColumnSketch(numeric=True)
            arr = feats[col]
            sk.update(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
            if sk.digest is not None:
                sk.digest._compress()
            sketches[col] = sk

        if self.catalog is not None:
            refs = SpanRefExtractor()(batch)
            dangling = refs.filter(
                pc.invert(pc.is_in(refs["media_ref"], value_set=self.catalog)))
        else:
            dangling = pa.table({"doc_id": pa.array([], pa.string()),
                                 "media_ref": pa.array([], pa.string())})

        return pa.table({
            "path": pa.array([path], pa.string()),
            "n": pa.array([batch.num_rows], pa.int64()),
            "n_fail": pa.array([int(mask.sum())], pa.int64()),
            "violations": pa.array([_ipc_bytes(vio)], pa.binary()),
            "dangling": pa.array([_ipc_bytes(dangling)], pa.binary()),
            "sketches": pa.array([self.pickle.dumps(sketches)], pa.binary()),
            # per-batch key column for the cross-partition uniqueness
            # exchange — sourced HERE so uniqueness needs no second scan
            # of the input (the whole run reads each input byte once)
            "keys": pa.array([_ipc_bytes(batch.select([self.unique_key]))]
                             if self.unique_key in batch.column_names
                             else [_ipc_bytes(pa.table({}))], pa.binary()),
        })


def _assemble_distributed(block_ref_iter, wave_ids: list[int],
                          file_to_shard: dict, out_dir: str,
                          has_catalog: bool, on_block=None,
                          gather: bool = True):
    """Distributed shard assembly: explicit two-stage exchange with raw Ray
    tasks (the same proven pattern as ``uniqueness_violations_files`` — Ray
    Data's groupby all-to-all costs several seconds of fixed latency here).

    ``block_ref_iter`` yields fused block refs AS THE FUSED STAGE PRODUCES
    THEM (``iter_internal_ref_bundles``), so stage-1 split tasks (and the
    caller's ``on_block`` hook, e.g. the uniqueness map half) overlap the
    fused scan instead of forming a serial tail after it — this is what
    moves 8→32-CPU scaling: the post-scan work rides inside the scan's
    wall time.

    Stage 1 (one task per fused block, ``num_returns`` = wave width): split
    the block's rows by destination shard — only compact fused rows move,
    and only as object refs; the driver never fetches a payload.
    Stage 2 (one task per shard): concat that shard's slices, write the
    ``part-{i}`` outputs in place (tmp dir + rename so a retried task never
    leaves a half-written dir), return ONE small metrics dict.
    """
    import ray

    pos_of = {shard: w for w, shard in enumerate(wave_ids)}
    n_wave = len(wave_ids)

    @ray.remote
    def split_block(wavepos_of: dict, n: int, *blocks: pa.Table):
        import numpy as _np

        # the keys blobs feed the uniqueness exchange, not shard assembly
        block = pa.concat_tables(b.drop_columns(["keys"]) for b in blocks)
        dest = _np.array([wavepos_of[os.path.realpath(p)]
                          for p in block["path"].to_pylist()], dtype=_np.int64)
        out = [block.filter(pa.array(dest == w)) for w in range(n)]
        return out if n > 1 else out[0]

    @ray.remote
    def assemble(shard: int, out_dir_: str, has_catalog_: bool, *parts: pa.Table):
        import shutil

        tables = [p for p in parts if p.num_rows]
        rows = pa.concat_tables(tables).to_pylist() if tables else []
        part_dir = os.path.join(out_dir_, f"part-{shard:05d}")
        tmp_dir = part_dir + ".tmp"
        metrics = _assemble_shard(tmp_dir, rows, has_catalog_)
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        from ..engine.checkpoint import digest_dir

        return {"partition": shard, "digest": digest_dir(part_dir), **metrics}

    from ..engine.exchange import _concat_task

    global _ASM_CONCAT_REMOTE
    if _ASM_CONCAT_REMOTE is None:
        _ASM_CONCAT_REMOTE = ray.remote(_concat_task)

    def _merge(entries):
        return [_ASM_CONCAT_REMOTE.remote(*[m[w] for m in entries])
                for w in range(n_wave)]

    shard_of = {p: pos_of[s] for p, s in file_to_shard.items() if s in pos_of}
    merged, pending = [], []
    chunk: list = []

    def _flush_chunk():
        # ONE split task (and one on_block call) per chunk of blocks:
        # per-block task submission was a DRIVER bottleneck at 96M+ docs
        # (~2 tasks/block × thousands of blocks of serial ray.remote)
        if not chunk:
            return
        if on_block is not None:
            on_block(list(chunk))
        out = split_block.options(num_returns=n_wave).remote(
            shard_of, n_wave, *chunk)
        chunk.clear()
        pending.append([out] if n_wave == 1 else out)
        # bound assemble fan-in: fold split slices through pure-concat
        # rounds while the scan streams
        if len(pending) >= 64:
            merged.append(_merge(pending))
            pending.clear()
            if len(merged) >= 64:
                merged[:] = [_merge(merged)]

    for ref in block_ref_iter:
        chunk.append(ref)
        if len(chunk) >= _BLOCKS_PER_TASK:
            _flush_chunk()
    _flush_chunk()
    split_out = merged + pending
    metric_refs = [
        assemble.remote(wave_ids[w], out_dir, has_catalog,
                        *[s[w] for s in split_out])
        for w in range(n_wave)
    ]
    if not gather:
        # refs mode: the caller overlaps other post-scan work (the
        # uniqueness reduce) with the stage-2 assemble tasks
        return metric_refs
    return {m["partition"]: m for m in ray.get(metric_refs)}


def _assemble_shard(part_dir: str, rows: list[dict], has_catalog: bool) -> dict:
    """Build a shard's outputs from its fused per-batch rows (deterministic:
    all tables totally sorted, sketch partials merged in sorted order)."""
    import pickle
    import shutil

    if os.path.exists(part_dir):
        shutil.rmtree(part_dir)
    os.makedirs(part_dir, exist_ok=True)

    n_docs = sum(r["n"] for r in rows)
    n_fail = sum(r["n_fail"] for r in rows)

    vio = pa.concat_tables([_ipc_table(r["violations"]) for r in rows]).combine_chunks()
    if vio.num_rows:
        vio = vio.sort_by([(c, "ascending") for c in
                           ("doc_id", "path", "error", "value_repr")])
    _write_single(vio, os.path.join(part_dir, "violations"), "violations")

    dangling_rows = 0
    if has_catalog:
        dang = pa.concat_tables([_ipc_table(r["dangling"]) for r in rows]).combine_chunks()
        if dang.num_rows:
            dang = dang.sort_by([("doc_id", "ascending"), ("media_ref", "ascending")])
        dangling_rows = dang.num_rows
        _write_single(dang, os.path.join(part_dir, "dangling_refs"), "dangling")

    merged: dict = {}
    for blob in sorted(r["sketches"] for r in rows):
        for col, sk in pickle.loads(blob).items():
            if col in merged:
                merged[col].merge(sk)
            else:
                merged[col] = sk
    with open(os.path.join(part_dir, "sketches.json"), "w") as f:
        json.dump({k: v.summary() for k, v in merged.items()}, f, sort_keys=True)

    # per-shard violated-path counts, indexes normalized ("spans[3].kind" →
    # "spans[].kind") so cardinality stays bounded for the top-k report
    path_counts: dict[str, int] = {}
    if vio.num_rows:
        norm = pc.replace_substring_regex(vio["path"], r"\[\d+\]", replacement="[]")
        g = pa.table({"path": norm}).group_by("path").aggregate([("path", "count")])
        path_counts = dict(zip(g["path"].to_pylist(),
                               (int(x) for x in g["path_count"].to_pylist())))

    return {"n_docs": n_docs, "n_fail": n_fail, "n_dangling_refs": dangling_rows,
            "path_counts": path_counts}


def run_flagship(
    input_files: list[str],
    out_dir: str,
    *,
    catalog_path: str | None = None,
    schema=FLAGSHIP_SCHEMA,
    shards: int | None = None,
    batch_size: int = 8192,
    wave_size: int | None = None,
    unique_key: str = "doc_id",
) -> dict:
    """Full checkpointed run.  Returns the aggregate report.

    Pending shards are processed in WAVES: one Ray Dataset execution per
    wave covers every file in the wave (rows tagged with their source file
    via ``include_paths``), then per-shard outputs + manifest lines are
    written.  ``wave_size=None`` processes all pending shards in a single
    streaming pass — one fixed execution latency for the whole run; a crash
    loses at most one wave of work, and completed shards are never redone
    (per-partition lineage in ``_manifest.jsonl``).
    """
    import time as _time

    import ray
    import ray.data

    # broadcast the referential small side once per run (ray.put, read once
    # per worker process inside the fused stage)
    catalog_ref = None
    if catalog_path and os.path.exists(catalog_path):
        import pyarrow.parquet as pq

        cat = pq.read_table(catalog_path)["media_ref"].combine_chunks()
        catalog_ref = ray.put(cat)

    n_shards = shards or max(1, min(len(input_files), 16))
    shard_lists = [list(input_files[i::n_shards]) for i in range(n_shards)]
    shard_lists = [s for s in shard_lists if s]
    file_to_shard = {os.path.realpath(str(f)): i
                     for i, fs in enumerate(shard_lists) for f in fs}

    from ..engine.checkpoint import append_manifest, digest_dir, load_manifest

    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    pending = [i for i in range(len(shard_lists)) if i not in done]
    records: list[dict] = [done[i] for i in sorted(done)]

    wave = wave_size or max(1, len(pending))
    schema_json = json.dumps(schema, sort_keys=True)
    has_catalog = catalog_ref is not None
    full_run = not done  # fused blocks will cover EVERY shard
    # Two TIERS of streaming uniqueness combines (LSM-style): 64 raw map
    # entries fold into one level-1 entry; 64 level-1 entries fold into
    # one level-2 entry.  Each key row is re-processed at most twice —
    # the old collapse-everything-at-8 re-group-summed the FULL
    # accumulated key volume on every trigger, which dominated the 96M
    # post-scan tail (measured 11.6 s).  Driver state stays ≤ ~192 refs
    # up to ~10^11 docs; beyond that level 2 self-folds (logged cost).
    uniq_lvl1: list = []   # each = combine of _COMBINE_EVERY raw entries
    uniq_lvl2: list = []   # each = combine of _COMBINE_EVERY lvl1 entries
    uniq_pending: list = []  # raw per-chunk map entries awaiting combine
    _COMBINE_EVERY = 64  # blocks per streaming combine round
    from ..engine.checks import (HASH_COL, uniqueness_combine,
                                 uniqueness_map_key_blobs, uniqueness_reduce)

    uniq_hashed = full_run and sum(
        os.path.getsize(str(f)) for f in input_files
        if os.path.exists(str(f))) > _UNIQ_TWO_PHASE_BYTES
    uniq_key_col = HASH_COL if uniq_hashed else unique_key
    # hashed mode RETAINS the fused-block ref chunks so phase 2 verifies
    # candidates from the already-materialized key blobs (no re-read;
    # pinning is spillable — O(fused bytes), ~1-2% of input)
    uniq_chunks: list = []

    uniq_done = os.path.exists(os.path.join(out_dir, "_uniqueness_done.json"))
    dup_reduce_refs = None  # pre-launched per-bucket uniqueness reducers
    ver_refs = None  # pre-launched CHAINED phase-2 verify (hashed mode)
    for w0 in range(0, len(pending), wave):
        wave_ids = pending[w0:w0 + wave]
        files = [f for i in wave_ids for f in shard_lists[i]]
        t0 = _time.time()
        from ..sources import clean_parquet_schema

        # scan ramp: Ray launches ONE read task per file (dynamic block
        # splitting raises block count, not task parallelism), so a wave
        # with fewer files than CPUs under-drives the pool.  Split to row-
        # group granularity in that case; when files >= CPUs Ray's default
        # wins (measured at 24M+ docs — overrides only add overhead there).
        nb = None
        ncpu = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
        if ncpu and len(files) < ncpu:
            import pyarrow.parquet as _pq

            total_rg = sum(_pq.ParquetFile(f).metadata.num_row_groups
                           for f in files)
            nb = max(len(files), min(total_rg, 2 * ncpu))
        ds = ray.data.read_parquet(files, include_paths=True,
                                   schema=clean_parquet_schema(files[0]),
                                   override_num_blocks=nb)
        fused = ds.map_batches(
            _fused_task, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
            fn_args=(schema_json, catalog_ref, unique_key),
        )
        # stream block refs out of the fused execution — payloads stay in
        # the object store; split + uniqueness-map tasks launch per block
        # WHILE the scan is still running (engine.blocks seam: falls back
        # to a blocking to_arrow_refs if the private Ray API shifts)
        from ..engine.blocks import iter_block_refs as _stream_refs

        on_block = None
        if full_run and not uniq_done:
            # uniqueness map half off the fused rows' key blobs — HASHED
            # (8-byte key hashes move, not key strings; phase 2 verifies
            # candidate hashes against real keys below).  Tiered combines
            # fire DURING the scan so the post-scan reduce sees a bounded
            # fan-in without ever re-processing the full key volume.
            def on_block(refs):  # one uniq-map task per CHUNK of blocks
                if uniq_hashed:
                    uniq_chunks.append(list(refs))
                uniq_pending.extend(
                    uniqueness_map_key_blobs(refs, unique_key,
                                             hashed=uniq_hashed))
                if len(uniq_pending) >= _COMBINE_EVERY:
                    uniq_lvl1.append(
                        uniqueness_combine(uniq_pending, uniq_key_col))
                    uniq_pending.clear()
                    if len(uniq_lvl1) >= _COMBINE_EVERY:
                        uniq_lvl2.append(
                            uniqueness_combine(uniq_lvl1, uniq_key_col))
                        uniq_lvl1.clear()
                        if len(uniq_lvl2) >= _COMBINE_EVERY:
                            # ~10^11+ docs: fold level 2 into itself
                            merged = uniqueness_combine(uniq_lvl2,
                                                        uniq_key_col)
                            uniq_lvl2.clear()
                            uniq_lvl2.append(merged)
        metric_refs = _assemble_distributed(_stream_refs(fused), wave_ids,
                                            file_to_shard, out_dir,
                                            has_catalog, on_block=on_block,
                                            gather=False)
        # the scan has fully streamed here, so every uniqueness map entry
        # is submitted: on the LAST wave, launch the per-bucket PHASE-1
        # reduce (duplicate-hash candidates) now so it runs CONCURRENTLY
        # with the stage-2 assemble tasks instead of forming a serial
        # tail after their gather (VERDICT item: the fixed post-scan tail)
        if ((w0 + wave) >= len(pending) and full_run and not uniq_done
                and (uniq_lvl2 or uniq_lvl1 or uniq_pending)):
            dup_reduce_refs = uniqueness_reduce(
                uniq_lvl2 + uniq_lvl1 + uniq_pending, uniq_key_col,
                gather=False)
            if uniq_hashed and uniq_chunks:
                # chain PHASE 2 behind the phase-1 refs with no driver
                # sync: candidates concat in a task, verify maps take that
                # ref as an auto-dereferenced arg — the whole phase runs
                # while the driver gathers the assembly below, so the
                # post-scan uniqueness tail is just two tiny gathers
                from ..engine.checks import \
                    uniqueness_verify_candidates_blobs_chained

                ver_refs = uniqueness_verify_candidates_blobs_chained(
                    uniq_chunks, unique_key, dup_reduce_refs)
        by_shard = {m["partition"]: m for m in ray.get(metric_refs)}
        wave_wall = _time.time() - t0

        for i in wave_ids:
            m = by_shard.get(i)
            if m is None:  # shard whose files held zero rows: empty outputs
                part_dir = os.path.join(out_dir, f"part-{i:05d}")
                metrics = _assemble_shard(part_dir, [], has_catalog)
                m = {"partition": i, "digest": digest_dir(part_dir), **metrics}
            record = {
                "partition": i,
                "input_files": [str(f) for f in shard_lists[i]],
                "wall_s": round(wave_wall / len(wave_ids), 3),
                "digest": m["digest"],
                "n_docs": int(m["n_docs"]),
                "n_fail": int(m["n_fail"]),
                "n_dangling_refs": int(m["n_dangling_refs"]),
                "path_counts": m["path_counts"],
            }
            append_manifest(out_dir, record)
            records.append(record)

    # CROSS-partition uniqueness on doc_id — two-stage hash exchange over
    # per-batch key partials (north rule).  On a full run the map half was
    # already fed from the fused rows (single input scan); a RESUMED run
    # whose earlier shards predate this session falls back to the
    # key-column-only file scan.  Resumable via its own marker file.
    t_uniq = _time.time()
    uniq_dir = os.path.join(out_dir, "uniqueness")
    uniq_marker = os.path.join(out_dir, "_uniqueness_done.json")
    if os.path.exists(uniq_marker):
        with open(uniq_marker) as f:
            n_dup_keys = json.load(f)["n_dup_keys"]
    else:
        if os.path.isdir(uniq_dir):  # partial output from a crashed run
            import shutil

            shutil.rmtree(uniq_dir)
        if dup_reduce_refs is not None and not uniq_hashed:
            # string mode (small inputs): the pre-launched reduce output
            # IS the final dup table (ran while the shards assembled)
            from ..engine.checks import finalize_uniqueness_reduce

            dup_table = finalize_uniqueness_reduce(dup_reduce_refs,
                                                   unique_key)
        elif dup_reduce_refs is not None:
            # phase 1 gathered: duplicate-HASH candidates (ran while the
            # shards assembled); phase 2 re-reads ONLY the key column and
            # recounts the candidate rows' real strings — collisions can
            # only ADD candidates, the string group-by is exact
            from ..engine.checks import (UNIQ_CAND_BROADCAST_CAP,
                                         finalize_uniqueness_reduce,
                                         uniqueness_verify_candidates)

            cand = finalize_uniqueness_reduce(dup_reduce_refs, HASH_COL)
            if not cand.num_rows:
                dup_table = pa.table({
                    unique_key: pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64())})
            elif cand.num_rows > UNIQ_CAND_BROADCAST_CAP:
                # duplicate-HEAVY corpus: the candidate set is no longer a
                # small broadcast — fall back to the full string-exchange
                # file scan (correctness identical; logged, no silent cap)
                import logging

                from ..engine.checks import uniqueness_violations_files

                logging.getLogger("yaschva_ray.flagship").warning(
                    "uniqueness phase 1 found %d duplicate-hash candidates"
                    " (too many to broadcast): falling back to the full"
                    " string-exchange scan", cand.num_rows)
                dup_table = uniqueness_violations_files(
                    [str(f) for f in input_files], unique_key)
            elif ver_refs is not None:
                # the chained phase 2 already ran during shard assembly —
                # only the tiny per-bucket gather remains
                dup_table = finalize_uniqueness_reduce(ver_refs, unique_key)
            else:
                from ..engine.checks import uniqueness_verify_candidates_blobs

                ch = cand[HASH_COL]
                if isinstance(ch, pa.ChunkedArray):
                    ch = ch.combine_chunks()
                if uniq_chunks:
                    dup_table = uniqueness_verify_candidates_blobs(
                        uniq_chunks, unique_key, ch)
                else:  # fused blocks unavailable: column-pruned re-read
                    dup_table = uniqueness_verify_candidates(
                        [str(f) for f in input_files], unique_key, ch)
        else:
            from ..engine.checks import uniqueness_violations_files

            dup_table = uniqueness_violations_files(
                [str(f) for f in input_files], unique_key)
        n_dup_keys = dup_table.num_rows
        _write_single(dup_table, uniq_dir, "dups")
        with open(uniq_marker, "w") as f:
            json.dump({"n_dup_keys": n_dup_keys}, f)

    top_paths: dict[str, int] = {}
    for r in records:
        for p, c in (r.get("path_counts") or {}).items():
            top_paths[p] = top_paths.get(p, 0) + c
    report = {
        "n_docs": sum(r["n_docs"] for r in records),
        "n_fail": sum(r["n_fail"] for r in records),
        "n_dup_keys": n_dup_keys,
        "n_dangling_refs": sum(r.get("n_dangling_refs") or 0 for r in records),
        "partitions": len(records),
        "top_violated_paths": dict(sorted(top_paths.items(),
                                          key=lambda kv: (-kv[1], kv[0]))[:10]),
        # phase observability: the uniqueness tail should be ~0 when the
        # pre-launched reducers overlapped shard assembly (full runs)
        "uniqueness_tail_s": round(_time.time() - t_uniq, 3),
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, sort_keys=True)
    return report
