"""Command-line entry point.

    python -m yaschva_ray.cli validate --schema schema.json \
        --input 'data/*.parquet' --out out/ [--catalog catalog.parquet]
        [--id-column doc_id] [--shards 8] [--wave-size 4]

    python -m yaschva_ray.cli check --schema schema.json --value value.json

``validate`` runs the full checkpoint-resumable pipeline (violations,
verdicts, sketches, uniqueness, referential) over a table; ``check``
validates a single JSON value exactly like the reference's ``validate()``
and prints the mirror-shaped result tree.

This module OWNS its Ray session (the only places that do: here, bench.py,
and the test fixture).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _cmd_check(args: argparse.Namespace) -> int:
    from .oracle import validate
    from .schema import load_json
    from .values import js_jsonable

    with open(args.schema) as f:
        schema = load_json(f.read())
    with open(args.value) as f:
        value = json.load(f)
    result = validate(schema, value)
    print(json.dumps({"result": result["result"],
                      "output": js_jsonable(result["output"])}, indent=2, default=str))
    return 0 if result["result"] == "pass" else 1


def _cmd_types(args: argparse.Namespace) -> int:
    """Emit the TypeScript type (reference ``validationToType``, type.ts:33)
    and optionally the Arrow table schema for a schema file."""
    from .schema import load_json
    from .typegen import schema_to_arrow, validation_to_type

    with open(args.schema) as f:
        schema = load_json(f.read())
    print(validation_to_type(schema))
    if args.arrow:
        print(schema_to_arrow(schema))
    return 0


def _cmd_generate(args: argparse.Namespace) -> int:
    """Generate schema-conforming data (reference ``generate``,
    generate.ts:61-76) — seeded, so reproducible."""
    from .generate import generate
    from .schema import load_json
    from .values import js_jsonable

    with open(args.schema) as f:
        schema = load_json(f.read())
    for i in range(args.count):
        doc = generate(schema, seed=args.seed + i)
        print(json.dumps(js_jsonable(doc), default=str, sort_keys=True))
    return 0


def _cmd_validate(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.flagship import run_flagship
        from .schema import load_json

        with open(args.schema) as f:
            schema = load_json(f.read())
        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}", file=sys.stderr)
            return 2
        report = run_flagship(
            files, args.out, schema=schema, catalog_path=args.catalog,
            shards=args.shards, batch_size=args.batch_size,
            wave_size=args.wave_size, unique_key=args.id_column,
        )
        print(json.dumps(report, indent=2, sort_keys=True))
        return 0 if report["n_fail"] == 0 else 1
    finally:
        ray.shutdown()


def _cmd_dedup(args: argparse.Namespace) -> int:
    """Deduplicate a document table (columns ``doc_id``, ``text``):
    ``exact`` emits duplicate doc_ids (keep = lowest id per text group),
    ``minhash`` emits near-duplicate pairs verified by exact n-gram
    Jaccard, ``simhash`` emits pairs within the hamming threshold, and
    ``semantic`` (SemDeDup) reads (``doc_id``, ``embedding``) instead and
    emits the doc_ids dropped by cluster-local cosine dedup."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq

        from .pipelines import textops
        from .sources import read_docs

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}", file=sys.stderr)
            return 2
        if args.method == "semantic":
            import pyarrow as pa

            emb_ds = read_docs(files, columns=["doc_id", "embedding"]) \
                .map_batches(lambda t: t.select(["doc_id", "embedding"])
                             .rename_columns(["vec_id", "embedding"]),
                             batch_format="pyarrow")
            dropped = textops.semantic_dedup_from_ds(
                emb_ds, threshold=args.threshold)
            out = pa.table({"doc_id": dropped["dropped_vec"]})
            if getattr(args, "emit", "pairs") == "canonical":
                from .engine.components import filter_canonical

                comp = pa.table({
                    "doc_id": out["doc_id"],
                    "component": pa.array([-1] * out.num_rows, pa.int64()),
                })
                kept = filter_canonical(
                    read_docs(files, columns=["doc_id", "embedding"]), comp)
                kept.write_parquet(args.out)
                print(json.dumps({"method": "semantic", "emit": "canonical",
                                  "n_dropped": comp.num_rows,
                                  "out": args.out}))
                return 0
            pq.write_table(out, args.out)
            print(json.dumps({"method": "semantic", "n_rows": out.num_rows,
                              "out": args.out}))
            return 0
        ds = read_docs(files, columns=["doc_id", "text"])
        if getattr(args, "emit", "pairs") == "canonical":
            import pyarrow as pa

            from .engine.components import (
                connected_components,
                filter_canonical,
            )

            if args.method == "exact":
                # exact duplicates already name the drop set directly
                dups = textops.dedup_exact_from_ds(ds)
                comp = pa.table({
                    "doc_id": dups["doc_id"],
                    # any value != doc_id marks the row non-canonical
                    "component": pa.array([-1] * dups.num_rows, pa.int64()),
                })
            else:
                pairs = (textops.minhash_verified_pairs_from_ds(ds)
                         if args.method == "minhash" else
                         textops.simhash_neardup_pairs(
                             ds, max_hamming=args.max_hamming))
                comp = connected_components(pairs)
            kept = filter_canonical(read_docs(files, columns=["doc_id", "text"]),
                                    comp)
            kept.write_parquet(args.out)
            print(json.dumps({"method": args.method, "emit": "canonical",
                              "n_clusters": comp.num_rows, "out": args.out}))
            return 0
        if args.method == "exact":
            out = textops.dedup_exact_from_ds(ds)
        elif args.method == "simhash":
            out = textops.simhash_neardup_pairs(ds, max_hamming=args.max_hamming)
        else:  # minhash
            cands = textops.minhash_candidates_from_ds(ds)
            from yaschva_ray.engine.blocks import gather_tables

            tables = [t for t in gather_tables(cands) if t.num_rows]
            import pyarrow as pa

            out = (pa.concat_tables(tables).combine_chunks()
                   .group_by(["doc_a", "doc_b"]).aggregate([])
                   .sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
                   if tables else
                   # explicit types: bare [] infers null-typed columns and
                   # the empty output's parquet schema would differ from the
                   # non-empty case (int64), breaking cross-run concat
                   pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())}))
        pq.write_table(out, args.out)
        print(json.dumps({"method": args.method, "n_rows": out.num_rows,
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def _cmd_ingest(args: argparse.Namespace) -> int:
    """Incremental corpus ingestion: dedup a NEW batch against the
    persisted hash index (built from --corpus on first run), write the
    deduped batch + duplicate report under ``--out/<tag>/``, then COMMIT
    the kept rows into the index.  Resumable end-to-end: an
    already-committed tag exits as a no-op; a crash before the commit
    leaves the index unchanged and the rerun redoes the batch from
    scratch.  For later batches pass ``--corpus`` globs that also cover
    earlier tags' ``deduped/`` outputs (the growing corpus the index
    mirrors)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import shutil

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .pipelines import textops
        from .sources import read_docs

        corpus_files = sorted(f for g in args.corpus for f in glob.glob(g))
        batch_files = sorted(glob.glob(args.batch))
        if not batch_files:
            print(f"error: no batch files match {args.batch!r}",
                  file=sys.stderr)
            return 2
        near = getattr(args, "method", "exact") == "near"
        build = (textops.neardup_index_build if near
                 else textops.dedup_index_build)
        if not os.path.exists(os.path.join(args.index, "manifest.json")):
            if not corpus_files:
                print(f"error: no corpus files match {args.corpus!r} "
                      "(needed to build the index)", file=sys.stderr)
                return 2
            build(read_docs(corpus_files, columns=["doc_id", "text"]),
                  args.index)
        manifest = textops._dedup_index_manifest(args.index)
        if args.tag in manifest["updates"]:
            print(json.dumps({"tag": args.tag, "skipped": True,
                              "reason": "already committed"}))
            return 0

        batch = read_docs(batch_files, columns=["doc_id", "text"])
        # parquet-backed batch ⇒ phase 1 ships only (hash64, doc_id); the
        # batch's text never crosses the exchange (jsonl/csv batches have
        # no pruned-read path, so they ship text — still correct)
        parquet_batch = all(f.endswith(".parquet") for f in batch_files)
        new_paths = batch_files if parquet_batch else None
        if near:
            # (doc_a=corpus, doc_b=new) pairs verified by exact Jaccard —
            # the dropped set is the distinct new side
            pairs = textops.neardup_against_index(
                batch, args.index, corpus_files,
                threshold=args.threshold, new_paths=new_paths)
            dups = pa.table({"doc_id": pc.unique(
                pairs["doc_b"].combine_chunks())})
        else:
            pairs = None
            dups = textops.dedup_against_index(
                batch, args.index, corpus_files, new_paths=new_paths)

        out_dir = os.path.join(args.out, args.tag)
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(os.path.join(tmp_dir, "deduped"), exist_ok=True)
        pq.write_table(pairs if pairs is not None else dups,
                       os.path.join(tmp_dir, "duplicates.parquet"))
        dup_ids = ray.put(dups["doc_id"].combine_chunks())

        def drop_dups(t: pa.Table) -> pa.Table:
            ids = ray.get(dup_ids)
            if not len(ids) or "doc_id" not in t.column_names:
                return t
            return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ids)))

        batch.map_batches(drop_dups, batch_format="pyarrow").write_parquet(
            os.path.join(tmp_dir, "deduped"))
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(tmp_dir, out_dir)
        # commit FROM the written output so the index mirrors exactly the
        # rows whose text future --corpus globs can read back
        kept_files = sorted(
            glob.glob(os.path.join(out_dir, "deduped", "*.parquet")))
        if kept_files:
            kept = read_docs(kept_files, columns=["doc_id", "text"])
            (textops.neardup_index_update if near
             else textops.dedup_index_update)(kept, args.index, args.tag)
        else:
            # every batch row was a duplicate: nothing to index, but the
            # tag still commits so a rerun stays a no-op
            m2 = textops._dedup_index_manifest(args.index)
            if args.tag not in m2["updates"]:
                m2["updates"].append(args.tag)
                textops._write_dedup_manifest(args.index, m2)
        n_kept = sum(pq.read_metadata(f).num_rows for f in kept_files)
        print(json.dumps({"tag": args.tag,
                          "method": "near" if near else "exact",
                          "n_duplicates": dups.num_rows,
                          "n_kept": n_kept, "out": out_dir}))
        return 0
    finally:
        ray.shutdown()


def _log_footer_fallback(cmd: str, err: Exception) -> None:
    """The 'logged fallback, never silent' contract: when parquet
    footers can't supply cutpoints (no statistics / non-plain-numeric
    key), the user must see WHY the zero-read path degraded to a
    sampling scan of the data."""
    import logging

    logging.getLogger("yaschva_ray.cli").warning(
        "%s: footer-derived cutpoints unavailable (%s) — falling back "
        "to a sampling scan", cmd, err)


def _sampled_cutpoints(ds, keys: list[str], n_ranges: int,
                       sample_per_block: int) -> dict:
    """Equi-depth cutpoints per key from ONE systematic-sample scan of
    ``ds`` (every key sampled in the same pass).  The fallback when
    footer statistics are missing; cutpoint placement is result-neutral
    for exports (it only shifts range balance)."""
    import numpy as np
    import pyarrow as pa

    from .engine.blocks import gather_tables
    from .pipelines.ops import equidepth_cutpoints

    def sample(t):
        present = [k for k in keys if k in t.column_names]
        if len(present) != len(keys) or not t.num_rows:
            return t.select([])
        n = max(1, t.num_rows // max(1, sample_per_block))
        idx = pa.array(list(range(0, t.num_rows, n)))
        return pa.table({k: t[k].take(idx) for k in keys})

    parts = [t for t in gather_tables(
        ds.map_batches(sample, batch_format="pyarrow"))
        if t.num_rows and all(k in t.column_names for k in keys)]
    out = {}
    for k in keys:
        sv = np.sort(np.concatenate(
            [t[k].to_numpy(zero_copy_only=False) for t in parts]
            or [np.empty(0)]))
        out[k] = equidepth_cutpoints(sv, n_ranges)
    return out


def _cmd_sort(args: argparse.Namespace) -> int:
    """Globally sorted export: equi-depth cutpoints from parquet footers
    (sampling-scan fallback, logged), range exchange, one sorted parquet
    part per range + lineage manifest (see pipelines.ops.sorted_export)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.compute as pc

        import ray.data

        from .pipelines.ops import sorted_export

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}",
                  file=sys.stderr)
            return 2
        ds = ray.data.read_parquet(files)
        key = args.key

        from .pipelines.ops import footer_equidepth_cutpoints

        try:  # cutpoints are result-neutral: footers first (zero data
            cutpoints = footer_equidepth_cutpoints(files, key, args.ranges)
        except (ValueError, OSError) as e:  # sampling scan as fallback
            _log_footer_fallback("sort", e)
            cutpoints = _sampled_cutpoints(
                ds, [key], args.ranges, args.sample_per_block)[key]
        manifest = sorted_export(ds, key, args.out, cutpoints)
        print(json.dumps({"key": key, "n_ranges": manifest.num_rows,
                          "n_rows": int(pc.sum(manifest["n_rows"]).as_py()),
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def _cmd_cluster(args: argparse.Namespace) -> int:
    """Z-order clustered export over two numeric columns (Morton
    interleave of footer-derived equi-depth ranks; see
    pipelines.ops.zorder_export) + optional pruned range probe."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.compute as pc

        import ray.data

        from .pipelines.ops import (_zorder_lookup_plan,
                                    footer_equidepth_cutpoints_multi,
                                    zorder_export, zorder_lookup)

        cols = [c.strip() for c in args.cols.split(",") if c.strip()]
        if len(cols) != 2:
            print("error: --cols needs exactly two columns",
                  file=sys.stderr)
            return 2
        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}",
                  file=sys.stderr)
            return 2
        ds = ray.data.read_parquet(files)
        try:  # one footer decode for both columns; pruning stays exact
            edges = footer_equidepth_cutpoints_multi(files, cols, 257)
        except (ValueError, OSError) as e:  # per-part min/max, so edges
            _log_footer_fallback("cluster", e)  # only shift balance
            edges = _sampled_cutpoints(ds, cols, 257,
                                       args.sample_per_block)
        manifest = zorder_export(ds, cols, edges, args.out,
                                 n_ranges=args.ranges)
        report = {"cols": cols, "n_parts": manifest.num_rows,
                  "n_rows": int(pc.sum(manifest["n_rows"]).as_py()),
                  "out": args.out}
        if args.probe:
            col, lo, hi = args.probe.split(":")
            lo, hi = float(lo), float(hi)
            got = zorder_lookup(args.out, col, lo, hi)
            import json as _json

            with open(os.path.join(args.out, "manifest.json")) as f:
                m = _json.load(f)
            # the SAME plan helper zorder_lookup ran — parts_read cannot
            # drift from the files the lookup actually opened
            read = _zorder_lookup_plan(m, col, lo, hi)
            report["probe"] = {"col": col, "lo": lo, "hi": hi,
                               "n_hits": got.num_rows,
                               "parts_read": len(read),
                               "parts_total": manifest.num_rows}
        print(json.dumps(report))
        return 0
    finally:
        ray.shutdown()


def _cmd_revalidate(args: argparse.Namespace) -> int:
    """Schema validation verdicts over a sorted-export directory — and,
    with --changes, the CDC loop: merge the changeset, re-validate ONLY
    the rewritten ranges (verdicts for untouched parts are reused via
    their generation-tagged paths; see pipelines.ops.validate_export)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .pipelines.ops import (SchemaViolations, revalidate_upsert,
                                    validate_export)

        with open(args.schema) as f:
            schema = json.load(f)
        idc = tuple(c.strip() for c in (args.id_cols or "").split(",")
                    if c.strip())
        fn = SchemaViolations(schema, id_columns=idc)
        if args.changes:
            verdicts = revalidate_upsert(
                args.dir, pq.read_table(args.changes), fn)
        else:
            verdicts = validate_export(args.dir, fn,
                                       incremental=not args.full)
        with open(os.path.join(args.dir, "validation.json")) as f:
            meta = json.load(f)
        print(json.dumps({
            "dir": args.dir,
            "n_ranges": verdicts.num_rows,
            "n_revalidated": meta["n_revalidated"],
            "n_reused": meta["n_reused"],
            "n_violations": int(pc.sum(verdicts["n_violations"]).as_py()
                                or 0),
            "n_failed_ranges": verdicts["pass"].to_pylist().count(False),
        }))
        return 0
    finally:
        ray.shutdown()


def _cmd_retain(args: argparse.Namespace) -> int:
    """TTL delete over a sorted export: ranges wholly below the cutoff
    drop by manifest edit (zero data IO), only straddling parts
    rewrite (see pipelines.ops.retention_delete)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import numpy as np
        import pyarrow.compute as pc

        from .pipelines.ops import retention_delete

        cutoff = args.cutoff
        try:  # numeric cutoffs first; anything else is a timestamp
            cutoff = int(cutoff) if cutoff.lstrip("-").isdigit() \
                else float(cutoff)
        except ValueError:
            cutoff = np.datetime64(cutoff)
        manifest = retention_delete(args.dir, cutoff)
        print(json.dumps({
            "dir": args.dir, "cutoff": str(cutoff),
            "n_ranges": manifest.num_rows,
            "n_rows_kept": int(pc.sum(manifest["n_rows"]).as_py() or 0),
        }))
        return 0
    finally:
        ray.shutdown()


def _cmd_diff(args: argparse.Namespace) -> int:
    """Row-level snapshot diff by key (added/removed/modified) — the
    migration reconciliation check (pipelines.ops.table_diff)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq

        import ray.data

        from .pipelines.ops import table_diff

        fa = sorted(glob.glob(args.a))
        fb = sorted(glob.glob(args.b))
        if not fa or not fb:
            print("error: empty input glob", file=sys.stderr)
            return 2
        out = table_diff(ray.data.read_parquet(fa),
                         ray.data.read_parquet(fb), args.key)
        pq.write_table(out, args.out)
        counts = {c: 0 for c in ("added", "removed", "modified")}
        for c in out["change"].to_pylist():
            counts[c] += 1
        print(json.dumps({"n_rows": out.num_rows, **counts,
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def _cmd_suggest(args: argparse.Namespace) -> int:
    """Profile -> candidate spec (expectations.suggest_spec); the loop
    closes with `expect`: the suggested spec passes on its own table."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import ray.data

        from .expectations import suggest_spec

        files = sorted(glob.glob(args.input))
        if not files:
            print("error: empty input glob", file=sys.stderr)
            return 2
        spec = suggest_spec(ray.data.read_parquet(files))
        text = json.dumps(spec, indent=2, sort_keys=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")
        print(text)
        return 0
    finally:
        ray.shutdown()


def _cmd_expect(args: argparse.Namespace) -> int:
    """Generic expectation suite (expectations.py) over a parquet glob:
    one fused scan for the countable checks + the uniqueness exchange;
    exit 1 when any expectation fails (the CI-gate contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq

        import ray.data

        from .expectations import expectations_report, spec_columns

        with open(args.spec) as f:
            spec = json.load(f)
        files = sorted(glob.glob(args.input))
        if not files:
            print("error: empty input glob", file=sys.stderr)
            return 2
        ds = ray.data.read_parquet(files, columns=spec_columns(spec))
        out = expectations_report(ds, spec)
        if args.out:
            pq.write_table(out, args.out)
        print(json.dumps({
            "checks": out.num_rows,
            "failed": [r["check_name"] for r in out.to_pylist()
                       if not r["passed"]],
            "report": {r["check_name"]: r["n_violations"]
                       for r in out.to_pylist()}}))
        return 0 if all(out["passed"].to_pylist()) else 1
    finally:
        ray.shutdown()


def _cmd_repair(args: argparse.Namespace) -> int:
    """Generic spec-driven repair (expectations._repair_batch): clamp
    min/max violations, NULL out out-of-enum / regex-failing values
    (never inventing data), stream the repaired table to parquet, and
    report per-rule repair counts from a separate counting pass."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import ray.data

        from .expectations import _repair_batch, repair_counts

        with open(args.spec) as f:
            spec = json.load(f)
        files = sorted(glob.glob(args.input))
        if not files:
            print("error: empty input glob", file=sys.stderr)
            return 2
        counts = repair_counts(ray.data.read_parquet(files), spec)
        ray.data.read_parquet(files).map_batches(
            lambda t: _repair_batch(t, spec),
            batch_format="pyarrow").write_parquet(args.out)
        print(json.dumps({"out": args.out, "repairs": counts,
                          "n_repaired_cells": sum(counts.values())}))
        return 0
    finally:
        ray.shutdown()


def _cmd_rangediff(args: argparse.Namespace) -> int:
    """Merkle range-digest diff of two snapshots: emit only disagreeing
    ranges (pipelines.ops.merkle_diff) — the O(ranges) pre-pass that
    tells `diff` / a repair job which key ranges to re-scan."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq

        import ray.data

        from .pipelines.ops import merkle_diff

        fa = sorted(glob.glob(args.a))
        fb = sorted(glob.glob(args.b))
        if not fa or not fb:
            print("error: empty input glob", file=sys.stderr)
            return 2
        out = merkle_diff(ray.data.read_parquet(fa),
                          ray.data.read_parquet(fb),
                          key=args.key,
                          content=args.content.split(","),
                          range_width=args.width)
        if args.out:
            pq.write_table(out, args.out)
        print(json.dumps({"n_diverging_ranges": out.num_rows,
                          "range_width": args.width,
                          "ranges": out["range_id"].to_pylist()[:64]}))
        return 0
    finally:
        ray.shutdown()


def _cmd_curate(args: argparse.Namespace) -> int:
    """Resumable end-to-end corpus curation (the north-rule pipeline
    shape): phase A runs the fused clean+decontaminate stage PER SHARD
    and checkpoints each shard's surviving rows through the lineage
    manifest (kill + rerun skips finished shards); phase B is the cheap
    global tail — exact-dedup over the curated parts, drop-list broadcast,
    split labels — rewritten idempotently into ``<out>/final``."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .engine.checkpoint import run_partitioned
        from .pipelines.textops import (
            bench_shingle_ref,
            dedup_exact_from_ds,
            make_clean_decon_stage,
            split_labels,
        )
        from .sources import read_docs

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}", file=sys.stderr)
            return 2
        bfiles = sorted(glob.glob(args.bench))
        if not bfiles:
            print(f"error: no bench files match {args.bench!r}", file=sys.stderr)
            return 2
        bench_texts = pa.concat_tables(
            [pq.read_table(f, columns=["text"]) for f in bfiles]
        )["text"].to_pylist()

        shards = [files[i::args.shards] for i in range(args.shards)]
        shards = [s for s in shards if s]

        def run_shard(fs: list, part_dir: str) -> dict:
            bref = bench_shingle_ref(bench_texts)
            stage = make_clean_decon_stage(bref)
            kept = read_docs(fs, columns=["doc_id", "text"]).map_batches(
                stage, batch_format="pyarrow")
            kept.write_parquet(part_dir)
            import pyarrow.dataset as pds

            return {"rows_kept": pds.dataset(part_dir).count_rows()}

        records = run_partitioned(shards, args.out, run_shard)

        part_files = sorted(glob.glob(os.path.join(args.out, "part-*",
                                                   "*.parquet")))
        curated = read_docs(part_files, columns=["doc_id", "text"])
        dups = dedup_exact_from_ds(curated)
        # the drop list is duplicate rows only — small for real corpora;
        # its size is logged so a duplicate-heavy corpus is observable
        drop_ref = ray.put(dups["doc_id"].combine_chunks()
                           if isinstance(dups["doc_id"], pa.ChunkedArray)
                           else dups["doc_id"])

        def finalize(t: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(t["doc_id"],
                                      value_set=ray.get(drop_ref)))
            w = t.filter(keep)
            ids = np.asarray(w["doc_id"].to_numpy(zero_copy_only=False))
            return w.select(["doc_id", "lang_pred", "n_tokens"]) \
                    .append_column("split", split_labels(ids))

        final_dir = os.path.join(args.out, "final")
        if os.path.exists(final_dir):  # idempotent global tail
            import shutil

            shutil.rmtree(final_dir)
        read_docs(part_files).map_batches(
            finalize, batch_format="pyarrow").write_parquet(final_dir)
        import pyarrow.dataset as pds

        n_final = pds.dataset(final_dir).count_rows()
        print(json.dumps({
            "shards": len(records),
            "rows_kept_phase_a": int(sum(r["rows_kept"] for r in records)),
            "n_duplicates_dropped": int(dups.num_rows),
            "rows_final": int(n_final),
            "out": final_dir,
        }))
        return 0
    finally:
        ray.shutdown()


def _cmd_compact(args: argparse.Namespace) -> int:
    """Small-file compaction (engine/compact.py): resumable via the output
    dir's manifest — rerunning after a kill skips finished groups."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from .engine.compact import compact_parquet

        r = compact_parquet(args.input, args.out,
                            target_bytes=args.target_mb * (1 << 20))
        print(json.dumps(r))
        return 0 if r["n_in"] else 2
    finally:
        ray.shutdown()


def _cmd_index(args: argparse.Namespace) -> int:
    """Inverted index: ``--input`` builds (or rebuilds) the partitioned
    index; ``--query`` searches it (both may be given — build then
    search)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.textops import inverted_index_build, keyword_search

        if not args.input and not args.query:
            print("error: need --input (build) and/or --query (search)",
                  file=sys.stderr)
            return 2
        if args.input:
            inverted_index_build(args.input, args.index,
                                 num_buckets=args.buckets)
            print(json.dumps({"built": args.index,
                              "buckets": args.buckets}))
        if args.query:
            out = keyword_search(args.index, args.query.split(), k=args.k)
            for row in out.to_pylist():
                print(json.dumps(row))
        return 0
    finally:
        ray.shutdown()


def _cmd_vocab(args: argparse.Namespace) -> int:
    """Exact top-k token vocabulary over a (doc_id, text) table (see
    pipelines.textops.vocab_top_tokens_from_ds)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq

        from .pipelines.textops import vocab_top_tokens_from_ds
        from .sources import read_docs

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}", file=sys.stderr)
            return 2
        ds = read_docs(files, columns=["doc_id", "text"])
        out = vocab_top_tokens_from_ds(ds, k=args.k)
        pq.write_table(out, args.out)
        print(json.dumps({"k": args.k, "n_rows": out.num_rows,
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def _cmd_score(args: argparse.Namespace) -> int:
    """Model-inference scoring loop: run the pinned quality classifier
    (pipelines.inference.QualityScorerStage — artifact loaded once per
    actor, int64 matvec per batch) over any read_docs-readable
    (doc_id, text) table, write the scored rows to parquet, and print a
    keep/drop summary.  ``--model`` points at a JSON artifact (the
    ``python -m yaschva_ray.pipelines.inference`` trainer output) to
    score with custom weights."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .pipelines.inference import (QUALITY_MODEL,
                                          QualityScorerStage)
        from .pipelines.textops import _gather
        from .sources import read_docs

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}",
                  file=sys.stderr)
            return 2
        model = QUALITY_MODEL
        if args.model:
            with open(args.model) as f:
                model = json.load(f)
        ref = ray.put(model)
        ds = read_docs(files, columns=["doc_id", "text"])
        out = _gather(ds.map_batches(
            QualityScorerStage, fn_constructor_kwargs={"model_ref": ref},
            batch_format="pyarrow", concurrency=(1, 4))).sort_by(
            [("doc_id", "ascending")])
        pq.write_table(out, args.out)
        kept = int(pa.compute.sum(pa.compute.cast(
            out["pred_keep"], pa.int64())).as_py() or 0)
        print(json.dumps({"n_rows": out.num_rows, "n_keep": kept,
                          "n_drop": out.num_rows - kept,
                          "out": args.out}))
        return 0
    finally:
        ray.shutdown()


def _cmd_sessionize(args: argparse.Namespace) -> int:
    """Gap-based sessionization over any parquet table with a key and a
    timestamp column (engine.windows.session_windows); ``--skew-split``
    lifts the one-key-per-task assumption via time banding + the driver
    chain merge (hot keys detected automatically)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow.parquet as pq
        import ray.data

        from .engine.windows import session_windows

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}",
                  file=sys.stderr)
            return 2
        ds = ray.data.read_parquet(files, columns=[args.key, args.ts])
        out = session_windows(
            ds, key=args.key, ts=args.ts, gap_s=args.gap_s,
            skew_split=args.skew_split,
            max_key_rows=args.max_key_rows)
        pq.write_table(out, args.out)
        print(json.dumps({"n_sessions": out.num_rows, "out": args.out,
                          "skew_split": bool(args.skew_split)}))
        return 0
    finally:
        ray.shutdown()


def _cmd_train(args: argparse.Namespace) -> int:
    """Distributed quality-classifier training
    (pipelines.inference.train_quality_classifier_distributed): one
    feature-extraction pass + raw-task gradient rounds; writes the
    QUANTIZED JSON artifact `score --model` consumes — the train →
    score → curate product loop."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.inference import (
            quantize_model, train_quality_classifier_distributed)
        from .sources import read_docs

        files = sorted(glob.glob(args.input))
        if not files:
            print(f"error: no input files match {args.input!r}",
                  file=sys.stderr)
            return 2
        ds = read_docs(files, columns=["doc_id", "text"])
        art = quantize_model(train_quality_classifier_distributed(
            ds, lr=args.lr, iters=args.iters))
        with open(args.out, "w") as f:
            json.dump(art, f)
        print(json.dumps({"out": args.out, "iters": args.iters,
                          "weights": art["weights"],
                          "bias": art["bias"]}))
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="yaschva_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train the quality classifier "
                        "distributed; write the JSON artifact for "
                        "`score --model`")
    tr.add_argument("--input", required=True, help="parquet/jsonl/csv glob")
    tr.add_argument("--out", required=True, help="output JSON artifact")
    tr.add_argument("--lr", type=float, default=0.5)
    tr.add_argument("--iters", type=int, default=400)
    tr.add_argument("--num-cpus", type=int, default=8)

    se = sub.add_parser("sessionize", help="gap-based session windows "
                        "over a (key, timestamp) table")
    se.add_argument("--input", required=True, help="parquet glob")
    se.add_argument("--key", required=True)
    se.add_argument("--ts", required=True)
    se.add_argument("--gap-s", type=float, default=1800.0)
    se.add_argument("--out", required=True, help="output parquet file")
    se.add_argument("--skew-split", action="store_true",
                    help="time-band hot keys (exact; driver chain merge)")
    se.add_argument("--max-key-rows", type=int, default=None,
                    help="hot-key threshold for --skew-split")
    se.add_argument("--num-cpus", type=int, default=8)

    sc = sub.add_parser("score", help="score documents with the pinned "
                        "quality classifier (actor-pool inference)")
    sc.add_argument("--input", required=True, help="parquet/jsonl/csv glob")
    sc.add_argument("--out", required=True, help="output parquet file")
    sc.add_argument("--model", help="JSON model artifact (default: the "
                    "pinned QUALITY_MODEL)")
    sc.add_argument("--num-cpus", type=int, default=8)

    c = sub.add_parser("check", help="validate one JSON value against a schema")
    c.add_argument("--schema", required=True)
    c.add_argument("--value", required=True)

    t = sub.add_parser("types", help="emit the TypeScript type for a schema")
    t.add_argument("--schema", required=True)
    t.add_argument("--arrow", action="store_true",
                   help="also print the emitted Arrow table schema")

    g = sub.add_parser("generate", help="generate schema-conforming data")
    g.add_argument("--schema", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--count", type=int, default=1)

    d = sub.add_parser("dedup", help="deduplicate a (doc_id, text) table")
    d.add_argument("--input", required=True, help="parquet/jsonl/csv glob")
    d.add_argument("--method",
                   choices=["exact", "minhash", "simhash", "semantic"],
                   default="exact")
    d.add_argument("--threshold", type=float, default=0.95,
                   help="semantic: cosine threshold for cluster-local dedup")
    d.add_argument("--out", required=True,
                   help="output parquet file (pairs) or directory (canonical)")
    d.add_argument("--emit", choices=["pairs", "canonical"], default="pairs",
                   help="pairs: duplicate ids / near-dup pairs; canonical: "
                        "the DEDUPLICATED corpus (connected components over "
                        "the pair graph, keep each cluster's min doc_id)")
    d.add_argument("--max-hamming", type=int, default=3)
    d.add_argument("--num-cpus", type=int, default=8)

    ing = sub.add_parser("ingest", help="incremental ingest: dedup a new "
                                        "batch against the persisted hash "
                                        "index, write deduped output, "
                                        "commit the index update")
    ing.add_argument("--index", required=True, help="hash index directory")
    ing.add_argument("--batch", required=True, help="new batch parquet glob")
    ing.add_argument("--corpus", required=True, nargs="+",
                     help="globs covering ALL indexed texts (base corpus + "
                          "earlier tags' deduped outputs)")
    ing.add_argument("--tag", required=True,
                     help="batch id — committed tags are no-op reruns")
    ing.add_argument("--method", choices=["exact", "near"],
                     default="exact",
                     help="near: MinHash-LSH index, drop docs that "
                          "near-dup the corpus at --threshold")
    ing.add_argument("--threshold", type=float, default=0.5)
    ing.add_argument("--out", required=True, help="output directory root")
    ing.add_argument("--num-cpus", type=int, default=8)

    cu = sub.add_parser("curate", help="clean+decontaminate+dedup+split, "
                                       "resumable per-shard")
    cu.add_argument("--input", required=True, help="parquet/jsonl/csv glob")
    cu.add_argument("--bench", required=True,
                    help="benchmark/eval table glob (column: text) — docs "
                         "sharing a token 8-gram with it are dropped")
    cu.add_argument("--out", required=True,
                    help="output directory (part-*/ + _manifest.jsonl + final/)")
    cu.add_argument("--shards", type=int, default=8)
    cu.add_argument("--num-cpus", type=int, default=8)

    vo = sub.add_parser("vocab", help="exact top-k token vocabulary")
    vo.add_argument("--input", required=True, help="parquet/jsonl/csv glob")
    vo.add_argument("--k", type=int, default=100)
    vo.add_argument("--out", required=True, help="output parquet file")
    vo.add_argument("--num-cpus", type=int, default=8)

    co = sub.add_parser("compact", help="compact small parquet files into "
                                        "~target-size outputs (resumable)")
    co.add_argument("--input", required=True, help="parquet dir or glob")
    co.add_argument("--out", required=True, help="output directory")
    co.add_argument("--target-mb", type=int, default=128)
    co.add_argument("--num-cpus", type=int, default=8)

    ix = sub.add_parser("index", help="build a partitioned inverted index / "
                                      "search it")
    ix.add_argument("--input", default=None,
                    help="(build) dir containing documents.parquet")
    ix.add_argument("--index", required=True, help="index directory")
    ix.add_argument("--query", default=None,
                    help="(search) space-separated query tokens")
    ix.add_argument("--k", type=int, default=10)
    ix.add_argument("--buckets", type=int, default=16)
    ix.add_argument("--num-cpus", type=int, default=8)

    so = sub.add_parser("sort", help="globally sorted export (range "
                                     "exchange, one part per range + "
                                     "lineage manifest)")
    so.add_argument("--input", required=True, help="parquet glob")
    so.add_argument("--key", required=True)
    so.add_argument("--out", required=True, help="output directory")
    so.add_argument("--ranges", type=int, default=16)
    so.add_argument("--sample-per-block", type=int, default=64,
                    help="cutpoint sample values taken per input block")
    so.add_argument("--num-cpus", type=int, default=8)

    cl = sub.add_parser("cluster", help="z-order clustered export over two "
                                        "columns + optional pruned range "
                                        "probe")
    cl.add_argument("--input", required=True, help="parquet glob")
    cl.add_argument("--cols", required=True,
                    help="two comma-separated numeric columns, e.g. a,b")
    cl.add_argument("--out", required=True, help="output directory")
    cl.add_argument("--ranges", type=int, default=16)
    cl.add_argument("--probe", default=None,
                    help="col:lo:hi — run a pruned range lookup after the "
                         "export and report parts read vs total")
    cl.add_argument("--sample-per-block", type=int, default=64,
                    help="cutpoint sample values per input block (only "
                         "used when footer statistics are missing)")
    cl.add_argument("--num-cpus", type=int, default=8)

    rv = sub.add_parser(
        "revalidate",
        help="schema validation verdicts over a sorted export; with "
             "--changes, CDC-merge then re-validate only touched ranges")
    rv.add_argument("--dir", required=True,
                    help="sorted_export directory (cli sort output)")
    rv.add_argument("--schema", required=True,
                    help="yaschva schema JSON file")
    rv.add_argument("--changes", default=None,
                    help="changeset parquet (key + payload + 'op' column "
                         "of upsert/delete) to merge before re-validating")
    rv.add_argument("--id-cols", default=None,
                    help="comma-separated id columns for violation rows")
    rv.add_argument("--full", action="store_true",
                    help="ignore existing verdicts and re-validate "
                         "every range")
    rv.add_argument("--num-cpus", type=int, default=8)

    rt = sub.add_parser(
        "retain",
        help="TTL delete over a sorted export: drop key < cutoff "
             "(whole expired ranges drop manifest-only)")
    rt.add_argument("--dir", required=True,
                    help="sorted_export directory (cli sort output)")
    rt.add_argument("--cutoff", required=True,
                    help="retention cutoff: number or ISO timestamp")
    rt.add_argument("--num-cpus", type=int, default=8)

    df = sub.add_parser("diff", help="row-level snapshot diff by key "
                                     "(added/removed/modified)")
    df.add_argument("--a", required=True, help="snapshot A parquet glob")
    df.add_argument("--b", required=True, help="snapshot B parquet glob")
    df.add_argument("--key", required=True)
    df.add_argument("--out", required=True, help="output parquet file")
    df.add_argument("--num-cpus", type=int, default=8)

    sg = sub.add_parser("suggest", help="profile a table and emit a "
                        "candidate expectation-suite spec JSON")
    sg.add_argument("--input", required=True, help="parquet glob")
    sg.add_argument("--out", default=None,
                    help="optional spec file (default: print)")
    sg.add_argument("--num-cpus", type=int, default=8)

    ex = sub.add_parser("expect", help="run a JSON expectation-suite "
                        "spec over a parquet table; print the report")
    ex.add_argument("--input", required=True, help="parquet glob")
    ex.add_argument("--spec", required=True, help="spec JSON file")
    ex.add_argument("--out", default=None,
                    help="optional report parquet (default: print)")
    ex.add_argument("--num-cpus", type=int, default=8)

    rp = sub.add_parser("repair", help="apply a spec's repairable "
                        "rules (clamp min/max, null out-of-enum/regex) "
                        "and write the repaired table")
    rp.add_argument("--input", required=True, help="parquet glob")
    rp.add_argument("--spec", required=True, help="spec JSON file")
    rp.add_argument("--out", required=True, help="output directory")
    rp.add_argument("--num-cpus", type=int, default=8)

    rd = sub.add_parser("rangediff", help="Merkle range-digest diff: "
                        "localize WHERE two snapshots diverge in "
                        "O(ranges) output, zero shuffle")
    rd.add_argument("--a", required=True, help="snapshot A parquet glob")
    rd.add_argument("--b", required=True, help="snapshot B parquet glob")
    rd.add_argument("--key", required=True, help="int64 range key column")
    rd.add_argument("--content", required=True,
                    help="comma-separated content columns to digest")
    rd.add_argument("--width", type=int, default=256,
                    help="rows per range: range_id = key // width")
    rd.add_argument("--out", default=None,
                    help="optional output parquet (default: print)")
    rd.add_argument("--num-cpus", type=int, default=8)

    v = sub.add_parser("validate", help="run the full table-validation pipeline")
    v.add_argument("--schema", required=True)
    v.add_argument("--input", required=True, help="parquet glob")
    v.add_argument("--out", required=True)
    v.add_argument("--catalog", default=None, help="media_ref catalog parquet")
    v.add_argument("--id-column", default="doc_id",
                   help="key column for the cross-partition uniqueness check")
    v.add_argument("--shards", type=int, default=None)
    v.add_argument("--wave-size", type=int, default=None)
    v.add_argument("--batch-size", type=int, default=8192)
    v.add_argument("--num-cpus", type=int, default=8)

    args = p.parse_args(argv)
    if args.cmd == "check":
        return _cmd_check(args)
    if args.cmd == "types":
        return _cmd_types(args)
    if args.cmd == "generate":
        return _cmd_generate(args)
    if args.cmd == "dedup":
        return _cmd_dedup(args)
    if args.cmd == "ingest":
        return _cmd_ingest(args)
    if args.cmd == "sort":
        return _cmd_sort(args)
    if args.cmd == "cluster":
        return _cmd_cluster(args)
    if args.cmd == "revalidate":
        return _cmd_revalidate(args)
    if args.cmd == "retain":
        return _cmd_retain(args)
    if args.cmd == "diff":
        return _cmd_diff(args)
    if args.cmd == "rangediff":
        return _cmd_rangediff(args)
    if args.cmd == "expect":
        return _cmd_expect(args)
    if args.cmd == "suggest":
        return _cmd_suggest(args)
    if args.cmd == "repair":
        return _cmd_repair(args)
    if args.cmd == "curate":
        return _cmd_curate(args)
    if args.cmd == "score":
        return _cmd_score(args)
    if args.cmd == "sessionize":
        return _cmd_sessionize(args)
    if args.cmd == "train":
        return _cmd_train(args)
    if args.cmd == "vocab":
        return _cmd_vocab(args)
    if args.cmd == "compact":
        return _cmd_compact(args)
    if args.cmd == "index":
        return _cmd_index(args)
    return _cmd_validate(args)


if __name__ == "__main__":
    sys.exit(main())
