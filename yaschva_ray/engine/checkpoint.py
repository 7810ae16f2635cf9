"""Checkpoint-resumable partitioned runs (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout::

    out_dir/
      part-00000/ ... parquet outputs for input shard 0 ...
      _manifest.jsonl    # one line per completed partition

Each manifest line records lineage: partition id, input files, row counts,
verdict counts, and a content digest of the partition's violation output.
``resume``: partitions already in the manifest are skipped; reruns are
byte-identical because the input sharding and all transforms are
deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def load_manifest(out_dir: str) -> dict[int, dict]:
    done: dict[int, dict] = {}
    path = manifest_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[rec["partition"]] = rec
    return done


def append_manifest(out_dir: str, record: dict) -> None:
    with open(manifest_path(out_dir), "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")


def digest_dir(path: str) -> str:
    """Stable content digest of a partition's output tree."""
    h = hashlib.sha256()
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for name in sorted(files):
            full = os.path.join(root, name)
            with open(full, "rb") as f:
                h.update(os.path.relpath(full, path).encode())
                h.update(f.read())
    return h.hexdigest()[:16]


def run_partitioned(
    input_shards: list[list[str]],
    out_dir: str,
    run_shard: Callable[[list[str], str], dict],
) -> list[dict]:
    """Run ``run_shard(files, part_dir) -> metrics`` for every input shard
    not already in the manifest.  Returns all manifest records (old + new).

    Each shard is itself a full Ray Data pipeline using the whole cluster;
    shards are the unit of failure recovery, not of parallelism.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    records = []
    for i, files in enumerate(input_shards):
        if i in done:
            records.append(done[i])
            continue
        part_dir = os.path.join(out_dir, f"part-{i:05d}")
        # clean partial output from a crashed previous attempt (idempotence)
        if os.path.exists(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.makedirs(part_dir, exist_ok=True)
        t0 = time.time()
        metrics = run_shard(files, part_dir)
        record = {
            "partition": i,
            "input_files": files,
            "wall_s": round(time.time() - t0, 3),
            "digest": digest_dir(part_dir),
            **metrics,
        }
        append_manifest(out_dir, record)
        records.append(record)
    return records
