"""Small-file compaction — the post-shuffle hygiene operator a 100 TB
deployment needs between stages: shuffles and per-bucket sinks emit many
small parquet parts; downstream scans then pay per-file open/metadata
cost and lose row-group parallelism.  ``compact_parquet`` bin-packs
input files into ~target-byte groups and rewrites each group as ONE
file, one Ray task per group (reads stay distributed; no shuffle — file
concatenation needs no key movement).

Resumable like every engine sink: each group writes tmp + atomic rename
and appends a manifest line (group id, input files, row count); a rerun
skips groups whose manifest line matches the files on disk, so a killed
compaction continues instead of restarting (the flagship's
per-partition-lineage rule applied to maintenance jobs).

Determinism: groups are formed by FIRST-FIT over name-sorted files, so
the same input set always produces the same layout.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pyarrow as pa

_COMPACT_REMOTE = None


def _plan_groups(files: list[str], target_bytes: int) -> list[list[str]]:
    """First-fit bin packing over name-sorted files (deterministic)."""
    groups: list[list[str]] = []
    sizes: list[int] = []
    for f in sorted(files):
        sz = os.path.getsize(f)
        placed = False
        for i, total in enumerate(sizes):
            if total + sz <= target_bytes:
                groups[i].append(f)
                sizes[i] += sz
                placed = True
                break
        if not placed:
            groups.append([f])
            sizes.append(sz)
    return groups


def _compact_group(files: list[str], out_path: str) -> int:
    import pyarrow.parquet as pq

    from .sketches import limit_worker_threads

    limit_worker_threads()
    tables = [pq.read_table(f) for f in files]
    t = pa.concat_tables(tables, promote_options="default").combine_chunks()
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, out_path)
    return t.num_rows


def compact_parquet(src, out_dir: str,
                    target_bytes: int = 128 * (1 << 20)) -> dict:
    """Compact the parquet files matched by ``src`` (dir or glob) into
    ``out_dir`` with ~``target_bytes`` outputs.  Returns
    ``{"n_in", "n_out", "rows", "skipped"}`` where ``skipped`` counts
    groups resumed from a previous run's manifest."""
    import ray

    if os.path.isdir(src):
        files = _glob.glob(os.path.join(src, "*.parquet"))
    else:
        files = _glob.glob(src)
    if not files:
        return {"n_in": 0, "n_out": 0, "rows": 0, "skipped": 0}
    groups = _plan_groups(files, target_bytes)
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    # the plan id pins (file set, target) — resuming into an out_dir built
    # under a DIFFERENT plan would leave stale part-NNNNN files next to new
    # ones and downstream reads would double-count; refuse loudly instead
    import hashlib

    plan_id = hashlib.md5(json.dumps([sorted(files), target_bytes])
                          .encode()).hexdigest()[:16]
    done: dict[int, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                e = json.loads(line)
                if "plan" in e:
                    if e["plan"] != plan_id:
                        raise RuntimeError(
                            f"compact: {out_dir} holds outputs of a different "
                            f"plan ({e['plan']} != {plan_id}: input set or "
                            "target size changed) — use a fresh out_dir")
                    continue
                done[e["group"]] = e
    else:
        with open(manifest_path, "w") as f:
            f.write(json.dumps({"plan": plan_id}) + "\n")

    global _COMPACT_REMOTE
    if _COMPACT_REMOTE is None:
        _COMPACT_REMOTE = ray.remote(_compact_group)

    pending: list[tuple[int, object]] = []
    skipped = rows = 0
    for gi, grp in enumerate(groups):
        out_path = os.path.join(out_dir, f"part-{gi:05d}.parquet")
        prev = done.get(gi)
        if (prev is not None and prev["files"] == grp
                and os.path.exists(out_path)):
            skipped += 1
            rows += prev["rows"]
            continue
        pending.append((gi, _COMPACT_REMOTE.remote(grp, out_path)))
    with open(manifest_path, "a") as mf:
        for gi, ref in pending:
            n = ray.get(ref)
            rows += n
            mf.write(json.dumps({"group": gi, "files": groups[gi],
                                 "rows": n}) + "\n")
    return {"n_in": len(files), "n_out": len(groups), "rows": rows,
            "skipped": skipped}
