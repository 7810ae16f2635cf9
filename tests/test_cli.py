"""CLI surface tests (subprocess — the CLI owns its own Ray session)."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "yaschva_ray.cli", *args],
                          capture_output=True, text=True, cwd="/root/repo")


def test_check_pass_and_fail(tmp_path):
    schema = tmp_path / "s.json"
    schema.write_text('{"name": "string", "age": {"$number": {"min": 0}}}')
    ok = tmp_path / "ok.json"
    ok.write_text('{"name": "x", "age": 3}')
    bad = tmp_path / "bad.json"
    bad.write_text('{"name": 1, "age": -2}')

    r = run_cli("check", "--schema", str(schema), "--value", str(ok))
    assert r.returncode == 0
    assert json.loads(r.stdout)["result"] == "pass"

    r2 = run_cli("check", "--schema", str(schema), "--value", str(bad))
    assert r2.returncode == 1
    out = json.loads(r2.stdout)
    assert out["output"]["name"]["error"] == "Value is not a string"
    assert out["output"]["age"]["error"] == "Value is smaller than the required minimum"


def test_validate_missing_input(tmp_path):
    schema = tmp_path / "s.json"
    schema.write_text('{"a": "string"}')
    r = run_cli("validate", "--schema", str(schema),
                "--input", str(tmp_path / "nope-*.parquet"),
                "--out", str(tmp_path / "out"), "--num-cpus", "2")
    assert r.returncode == 2
    assert "no input files" in r.stderr


def test_types_subcommand(tmp_path):
    import json as _json
    import subprocess
    import sys

    s = tmp_path / "s.json"
    s.write_text(_json.dumps({"a": "string", "b": ["?", "number"]}))
    out = subprocess.run([sys.executable, "-m", "yaschva_ray.cli", "types",
                          "--schema", str(s), "--arrow"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0
    lines = out.stdout.strip().split("\n")
    assert lines[0] == "{ a: string; b?: undefined | number }"
    assert "a: string not null" in out.stdout


def test_generate_subcommand_deterministic_and_valid(tmp_path):
    import json as _json
    import subprocess
    import sys

    from yaschva_ray import validate

    schema = {"a": "string", "n": {"$number": {"min": 0, "max": 9}},
              "e": {"$enum": ["x", "y"]}}
    s = tmp_path / "s.json"
    s.write_text(_json.dumps(schema))
    runs = [subprocess.run([sys.executable, "-m", "yaschva_ray.cli",
                            "generate", "--schema", str(s), "--count", "3"],
                           capture_output=True, text=True, cwd="/root/repo")
            for _ in range(2)]
    assert runs[0].returncode == 0
    assert runs[0].stdout == runs[1].stdout  # seeded determinism
    for line in runs[0].stdout.strip().split("\n"):
        doc = _json.loads(line)
        assert validate(schema, doc)["result"] == "pass"


def test_cli_dedup_exact(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "a", "b"]),
    }), src)
    out = tmp_path / "dups.parquet"
    r = run_cli("dedup", "--input", str(src), "--method", "exact",
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.strip().split("\n") if l.startswith("{")][-1]
    assert json.loads(line)["n_rows"] == 2
    assert pq.read_table(out)["doc_id"].to_pylist() == [3, 4]


def test_cli_dedup_canonical(tmp_path):
    """--emit canonical writes the DEDUPLICATED corpus: components over
    the near-dup pair graph, keep each cluster's min doc_id."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    dup = "alpha beta gamma delta epsilon zeta"
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([dup, "unique text one here today friend", dup,
                          "another different document entirely now", dup]),
    }), src)
    for method, n_clusters in (("exact", 2), ("minhash", 3)):
        out = tmp_path / f"kept_{method}"
        r = run_cli("dedup", "--input", str(src), "--method", method,
                    "--emit", "canonical", "--out", str(out),
                    "--num-cpus", "2")
        assert r.returncode == 0, r.stderr
        line = [l for l in r.stdout.strip().split("\n") if l.startswith("{")][-1]
        assert json.loads(line)["n_clusters"] == n_clusters
        kept = pa.concat_tables(
            [pq.read_table(f) for f in _glob.glob(str(out / "*.parquet"))])
        assert sorted(kept["doc_id"].to_pylist()) == [0, 1, 3]


def test_cli_vocab(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a", "b c", None]),
    }), src)
    out = tmp_path / "vocab.parquet"
    r = run_cli("vocab", "--input", str(src), "--k", "2",
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    t = pq.read_table(out)
    # counts: a=2, b=2, c=1 → top-2 by (n DESC, token ASC) = a, b
    assert t["token"].to_pylist() == ["a", "b"]
    assert t["n"].to_pylist() == [2, 2]


def test_cli_validate_e2e(tmp_path):
    """Full `validate` pipeline through the CLI: F0 files in, report out,
    per-partition outputs + manifest on disk, nonzero exit on failures."""
    import glob as _glob

    from yaschva_ray.pipelines.datagen import write_f0_dataset
    from yaschva_ray.pipelines.flagship import FLAGSHIP_SCHEMA

    files = write_f0_dataset(4000, str(tmp_path / "f0"), seed=7,
                             rows_per_file=2000)
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(FLAGSHIP_SCHEMA))
    out = tmp_path / "out"
    r = run_cli("validate", "--schema", str(schema),
                "--input", str(tmp_path / "f0" / "part-*.parquet"),
                "--out", str(out), "--num-cpus", "2", "--shards", "2",
                "--catalog", str(tmp_path / "f0" / "media_catalog.parquet"))
    assert r.returncode == 1, r.stderr  # corrupted docs exist by design
    report = json.loads(r.stdout[r.stdout.index("{"):])
    assert report["n_docs"] == 4000 and report["n_fail"] > 0
    assert (out / "_manifest.jsonl").exists()
    parts = _glob.glob(str(out / "part-*"))
    assert len(parts) == 2
    assert (out / "report.json").exists()


def test_cli_curate_e2e_and_resume(tmp_path):
    """End-to-end curation: dirty / contaminated / duplicate rows drop,
    winners get split labels; a SECOND run skips phase A via the lineage
    manifest (part dirs untouched) and rewrites the final tail
    idempotently."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    en = "the cat and the dog is in it that day one two"
    texts = {
        10: en + " extra words here",           # survivor
        11: en + " extra words here",           # exact dup of 10
        12: "x",                                # too short
        13: en + " different tail entirely now",  # survivor
        14: "alpha beta gamma delta epsilon zeta eta theta bench 0",  # contaminated
    }
    for i, shard in enumerate(([10, 11, 12], [13, 14])):
        pq.write_table(pa.table({
            "doc_id": pa.array(shard, pa.int64()),
            "text": pa.array([texts[k] for k in shard])}),
            tmp_path / f"in{i}.parquet")
    pq.write_table(pa.table({
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta "
                          "bench extra"])}), tmp_path / "bench.parquet")

    out = tmp_path / "curated"
    r = run_cli("curate", "--input", str(tmp_path / "in*.parquet"),
                "--bench", str(tmp_path / "bench.parquet"),
                "--out", str(out), "--shards", "2", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["rows_final"] == 2 and rep["n_duplicates_dropped"] == 1
    final = pa.concat_tables([pq.read_table(f) for f in
                              _glob.glob(str(out / "final" / "*.parquet"))])
    assert sorted(final["doc_id"].to_pylist()) == [10, 13]
    assert set(final.column_names) == {"doc_id", "lang_pred", "n_tokens",
                                       "split"}

    mtimes = {d: os.path.getmtime(d)
              for d in _glob.glob(str(out / "part-*"))}
    r2 = run_cli("curate", "--input", str(tmp_path / "in*.parquet"),
                 "--bench", str(tmp_path / "bench.parquet"),
                 "--out", str(out), "--shards", "2", "--num-cpus", "2")
    assert r2.returncode == 0, r2.stderr
    rep2 = json.loads([l for l in r2.stdout.strip().split("\n")
                       if l.startswith("{")][-1])
    assert rep2 == rep  # identical report after resume
    for d, m in mtimes.items():  # phase A genuinely skipped
        assert os.path.getmtime(d) == m


def test_cli_dedup_semantic(tmp_path):
    """--method semantic reads (doc_id, embedding) and emits dropped ids
    (exact copies at the default threshold); canonical writes survivors."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(4)
    mat = rng.randn(30, 8)
    mat[20] = mat[0]  # exact copy -> dropped
    mat[21] = mat[5]
    src = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in mat],
                              pa.list_(pa.float32())),
    }), src)
    out = tmp_path / "dropped.parquet"
    r = run_cli("dedup", "--input", str(src), "--method", "semantic",
                "--threshold", "0.999999", "--out", str(out),
                "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.strip().split("\n") if l.startswith("{")][-1]
    assert json.loads(line)["n_rows"] == 2
    assert pq.read_table(out)["doc_id"].to_pylist() == [20, 21]

    kept_dir = tmp_path / "kept"
    r = run_cli("dedup", "--input", str(src), "--method", "semantic",
                "--threshold", "0.999999", "--emit", "canonical",
                "--out", str(kept_dir), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    kept = pa.concat_tables(
        [pq.read_table(f) for f in _glob.glob(str(kept_dir / "*.parquet"))])
    assert sorted(kept["doc_id"].to_pylist()) == [i for i in range(30)
                                                  if i not in (20, 21)]


def test_cli_compact_and_index(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    small = tmp_path / "small"
    small.mkdir()
    for i in range(4):
        pq.write_table(pa.table({"doc_id": pa.array([i], pa.int64()),
                                 "text": pa.array([f"tok{i} shared"])}),
                       small / f"in-{i}.parquet")
    out = tmp_path / "compacted"
    r = run_cli("compact", "--input", str(small), "--out", str(out),
                "--target-mb", "64", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().split("\n")[-1])
    assert rec["rows"] == 4 and rec["n_out"] == 1

    # index over a documents.parquet dir, then search in the same call
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "alpha", "gamma"]),
    }), docs_dir / "documents.parquet")
    idx = tmp_path / "idx"
    r = run_cli("index", "--input", str(docs_dir), "--index", str(idx),
                "--query", "alpha beta", "--k", "2", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rows = [json.loads(l) for l in r.stdout.strip().split("\n")
            if l.startswith("{")]
    assert rows[0]["built"] == str(idx)
    hits = rows[1:]
    assert hits[0] == {"doc_id": 0, "n_matched": 2}
    assert hits[1] == {"doc_id": 1, "n_matched": 1}


def test_cli_ingest_incremental_and_resume(tmp_path):
    """Two-batch incremental ingest: batch 1 dedups against the corpus and
    commits; batch 2 dedups against corpus AND batch 1's kept rows; a
    rerun of a committed tag is a no-op."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "corpus.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"]),
    }), corpus)
    b1 = tmp_path / "b1.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["beta", "delta"]),  # 10 dups corpus, 11 fresh
    }), b1)
    idx = tmp_path / "idx"
    out = tmp_path / "out"

    r = run_cli("ingest", "--index", str(idx), "--batch", str(b1),
                "--corpus", str(corpus), "--tag", "t1",
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_duplicates"] == 1 and rep["n_kept"] == 1
    dups = pq.read_table(str(out / "t1" / "duplicates.parquet"))
    assert dups.to_pydict() == {"doc_id": [10], "dup_of": [1]}
    kept = pa.concat_tables([pq.read_table(f) for f in _glob.glob(
        str(out / "t1" / "deduped" / "*.parquet"))])
    assert kept["doc_id"].to_pylist() == [11]

    # committed tag → no-op rerun
    r2 = run_cli("ingest", "--index", str(idx), "--batch", str(b1),
                 "--corpus", str(corpus), "--tag", "t1",
                 "--out", str(out), "--num-cpus", "2")
    assert r2.returncode == 0, r2.stderr
    assert json.loads([l for l in r2.stdout.strip().split("\n")
                       if l.startswith("{")][-1])["skipped"] is True

    # batch 2 matches batch 1's kept text ("delta") through the UPDATE;
    # corpus globs now cover the earlier tag's deduped output
    b2 = tmp_path / "b2.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([20, 21], pa.int64()),
        "text": pa.array(["delta", "epsilon"]),
    }), b2)
    r3 = run_cli("ingest", "--index", str(idx), "--batch", str(b2),
                 "--corpus", str(corpus),
                 str(out / "t1" / "deduped" / "*.parquet"),
                 "--tag", "t2", "--out", str(out), "--num-cpus", "2")
    assert r3.returncode == 0, r3.stderr
    dups2 = pq.read_table(str(out / "t2" / "duplicates.parquet"))
    assert dups2.to_pydict() == {"doc_id": [20], "dup_of": [11]}


def test_cli_cluster(tmp_path):
    """cluster: z-order export over two columns + pruned range probe —
    the probe must hit exactly the brute-force rows while reading a
    strict subset of parts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    n = 20_000
    a = rng.randint(0, 500, n).astype(np.int64)
    b = (rng.rand(n) * 100).round(3)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "a": pa.array(a), "b": pa.array(b)})
    src = tmp_path / "t.parquet"
    pq.write_table(t, src)

    out = tmp_path / "zed"
    r = run_cli("cluster", "--input", str(src), "--cols", "a,b",
                "--out", str(out), "--ranges", "16",
                "--probe", "b:10:20", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_rows"] == n
    want = int(((b >= 10) & (b <= 20)).sum())
    assert rep["probe"]["n_hits"] == want
    assert 0 < rep["probe"]["parts_read"] < rep["probe"]["parts_total"]


def test_cli_sort_and_cluster_statless_fallback(tmp_path):
    """Parquet written WITHOUT footer statistics: both sort and cluster
    must degrade to the sampling scan — loudly (logged reason on
    stderr), not with a traceback, and with correct output."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    n = 400
    t = pa.table({"a": pa.array(rng.permutation(n).astype(np.float64)),
                  "b": pa.array(rng.permutation(n).astype(np.float64))})
    src = tmp_path / "nostats.parquet"
    pq.write_table(t, src, write_statistics=False)

    out = tmp_path / "sorted"
    r = run_cli("sort", "--input", str(src), "--key", "a",
                "--out", str(out), "--ranges", "3", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    assert "falling back" in r.stderr  # logged, never silent
    m = json.load(open(out / "manifest.json"))
    got = pa.concat_tables([pq.read_table(x["path"]) for x in
                            sorted(m["ranges"],
                                   key=lambda x: x["range_id"])])
    assert got["a"].to_pylist() == sorted(t["a"].to_pylist())

    zout = tmp_path / "z"
    r = run_cli("cluster", "--input", str(src), "--cols", "a,b",
                "--out", str(zout), "--ranges", "4",
                "--probe", "b:10:40", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    assert "falling back" in r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_rows"] == n
    assert rep["probe"]["n_hits"] == 31  # 10..40 inclusive


def test_cli_revalidate_full_then_incremental(tmp_path):
    """revalidate: schema verdicts over a cli-sort export, then a CDC
    changeset re-validates only the touched ranges (reuse visible in
    the report)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200
    t = pa.table({"k": pa.array(list(range(n)), pa.int64()),
                  "v": pa.array(np.arange(n, dtype=np.float64))})
    src = tmp_path / "t.parquet"
    pq.write_table(t, src)
    out = tmp_path / "sorted"
    r = run_cli("sort", "--input", str(src), "--key", "k",
                "--out", str(out), "--ranges", "4", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr

    schema = tmp_path / "schema.json"
    schema.write_text('{"k": "any", "v": {"$number": {"max": 150}}}')
    r = run_cli("revalidate", "--dir", str(out), "--schema", str(schema),
                "--id-cols", "k", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    # v 151..199 violate -> 49 violations, all in the last range
    assert rep["n_violations"] == 49 and rep["n_failed_ranges"] == 1
    assert rep["n_revalidated"] == 4 and rep["n_reused"] == 0

    # CDC: k=0 flips over the cap, k=199 (a violator) is deleted
    ch = pa.table({"k": pa.array([0, 199], pa.int64()),
                   "v": pa.array([999.0, None], pa.float64()),
                   "op": pa.array(["upsert", "delete"])})
    chp = tmp_path / "ch.parquet"
    pq.write_table(ch, chp)
    r = run_cli("revalidate", "--dir", str(out), "--schema", str(schema),
                "--changes", str(chp), "--id-cols", "k",
                "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_revalidated"] == 2 and rep["n_reused"] == 2
    assert rep["n_violations"] == 49 and rep["n_failed_ranges"] == 2


def test_cli_retain(tmp_path):
    """retain: TTL delete over a cli-sort export — kept rows equal the
    plain filter; expired ranges' original files are gone."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 300
    t = pa.table({"k": pa.array(list(range(n)), pa.int64()),
                  "v": pa.array(np.arange(n, dtype=np.float64))})
    src = tmp_path / "t.parquet"
    pq.write_table(t, src)
    out = tmp_path / "sorted"
    r = run_cli("sort", "--input", str(src), "--key", "k",
                "--out", str(out), "--ranges", "5", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr

    r = run_cli("retain", "--dir", str(out), "--cutoff", "130",
                "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_rows_kept"] == n - 130
    m = json.load(open(out / "manifest.json"))
    got = pa.concat_tables(
        [pq.read_table(x["path"]) for x in
         sorted(m["ranges"], key=lambda x: x["range_id"])
         if x["n_rows"]])
    assert got["k"].to_pylist() == list(range(130, n))


def test_cli_sort_and_diff(tmp_path):
    """sort: globally ordered parts + manifest; diff: reconciliation
    report between two snapshots."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(9)
    a = pa.table({"id": pa.array(list(range(300)), pa.int64()),
                  "v": pa.array(rng.randn(300).round(3), pa.float64())})
    src = tmp_path / "a.parquet"
    pq.write_table(a, src)

    out = tmp_path / "sorted"
    r = run_cli("sort", "--input", str(src), "--key", "v",
                "--out", str(out), "--ranges", "4", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["n_rows"] == 300 and rep["n_ranges"] == 4
    m = json.load(open(out / "manifest.json"))
    got = pa.concat_tables([pq.read_table(x["path"]) for x in
                            sorted(m["ranges"],
                                   key=lambda x: x["range_id"])])
    vv = got["v"].to_pylist()
    assert vv == sorted(vv) and sorted(got["id"].to_pylist()) == list(range(300))

    b = a.filter(pa.array([i % 7 != 0 for i in range(300)]))
    bsrc = tmp_path / "b.parquet"
    pq.write_table(b, bsrc)
    dout = tmp_path / "diff.parquet"
    r2 = run_cli("diff", "--a", str(src), "--b", str(bsrc), "--key", "id",
                 "--out", str(dout), "--num-cpus", "2")
    assert r2.returncode == 0, r2.stderr
    rep2 = json.loads([l for l in r2.stdout.strip().split("\n")
                       if l.startswith("{")][-1])
    assert rep2 == {"n_rows": 43, "added": 0, "removed": 43,
                    "modified": 0, "out": str(dout)}


def test_cli_ingest_near_mode(tmp_path):
    """--method near: a one-word edit of a corpus doc is dropped, a fresh
    text kept; batch 2 near-dups batch 1's kept text through the update."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("spark data table row column filter join group sort merge "
            "select where order limit offset union except intersect "
            "scan").split()
    rng = np.random.RandomState(4)
    texts = [" ".join(base[rng.randint(len(base))] for _ in range(40))
             for _ in range(20)]
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(texts)}), corpus)
    edited = texts[7].split()
    edited[5] = "changedword"
    fresh = ("entirely different unrelated words here nothing shared "
             "with the corpus at all believe me truly")
    b1 = tmp_path / "b1.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([" ".join(edited), fresh])}), b1)
    idx, out = tmp_path / "idx", tmp_path / "out"

    r = run_cli("ingest", "--index", str(idx), "--batch", str(b1),
                "--corpus", str(corpus), "--tag", "t1", "--out", str(out),
                "--method", "near", "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads([l for l in r.stdout.strip().split("\n")
                      if l.startswith("{")][-1])
    assert rep["method"] == "near"
    assert rep["n_duplicates"] >= 1 and rep["n_kept"] == 1
    pairs = pq.read_table(str(out / "t1" / "duplicates.parquet"))
    assert (7, 100) in set(zip(pairs["doc_a"].to_pylist(),
                               pairs["doc_b"].to_pylist()))
    kept = pa.concat_tables([pq.read_table(f) for f in _glob.glob(
        str(out / "t1" / "deduped" / "*.parquet"))])
    assert kept["doc_id"].to_pylist() == [101]

    # batch 2: near-dup of batch 1's KEPT doc → found via the update
    edited2 = fresh.split()
    edited2[2] = "tweaked"
    b2 = tmp_path / "b2.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([200], pa.int64()),
        "text": pa.array([" ".join(edited2)])}), b2)
    r2 = run_cli("ingest", "--index", str(idx), "--batch", str(b2),
                 "--corpus", str(corpus),
                 str(out / "t1" / "deduped" / "*.parquet"),
                 "--tag", "t2", "--out", str(out),
                 "--method", "near", "--num-cpus", "2")
    assert r2.returncode == 0, r2.stderr
    pairs2 = pq.read_table(str(out / "t2" / "duplicates.parquet"))
    assert (101, 200) in set(zip(pairs2["doc_a"].to_pylist(),
                                 pairs2["doc_b"].to_pylist()))


def test_rangediff_localizes(tmp_path):
    """rangediff reports exactly the ranges where the snapshots differ:
    one modified row, one appended row -> two diverging ranges."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = pa.table({
        "doc_id": pa.array(range(1000), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(1000)], pa.string())})
    b0 = a.set_column(1, "text", pa.array(
        [("CHANGED" if i == 700 else f"t{i}") for i in range(1000)],
        pa.string()))
    extra = pa.table({"doc_id": pa.array([5000], pa.int64()),
                      "text": pa.array(["new"], pa.string())})
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(pa.concat_tables([b0, extra]),
                   str(tmp_path / "b.parquet"))
    out = tmp_path / "rd.parquet"
    r = run_cli("rangediff", "--a", str(tmp_path / "a.parquet"),
                "--b", str(tmp_path / "b.parquet"), "--key", "doc_id",
                "--content", "text", "--width", "256",
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_diverging_ranges"] == 2
    assert rep["ranges"] == [700 // 256, 5000 // 256]
    t = pq.read_table(str(out))
    row = {k: v[0] for k, v in
           t.filter(pa.compute.equal(t["range_id"], 19))
           .to_pydict().items()}
    assert row["n_a"] is None and row["n_b"] == 1  # append-only range


def test_cli_validate_sigkill_resume(tmp_path):
    """REAL crash resume: SIGKILL the validate pipeline mid-run (after
    at least one wave committed its manifest line), rerun, and the
    final report + per-partition digests equal a clean run's — with the
    pre-crash partitions genuinely NOT redone (files untouched)."""
    import glob as _glob
    import os
    import signal
    import time

    from yaschva_ray.pipelines.datagen import write_f0_dataset
    from yaschva_ray.pipelines.flagship import FLAGSHIP_SCHEMA

    write_f0_dataset(16_000, str(tmp_path / "f0"), seed=7,
                     rows_per_file=2000)
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(FLAGSHIP_SCHEMA))
    args = ["validate", "--schema", str(schema),
            "--input", str(tmp_path / "f0" / "part-*.parquet"),
            "--num-cpus", "2", "--shards", "8", "--wave-size", "1",
            "--catalog", str(tmp_path / "f0" / "media_catalog.parquet")]

    # clean reference run
    clean_out = tmp_path / "clean"
    r = run_cli(*args, "--out", str(clean_out))
    assert r.returncode == 1, r.stderr  # corrupted docs exist by design
    clean = json.loads(r.stdout[r.stdout.index("{"):])

    # crashed run: SIGKILL once >=1 wave has committed, before all 8
    crash_out = tmp_path / "crash"
    proc = subprocess.Popen(
        [sys.executable, "-m", "yaschva_ray.cli", *args,
         "--out", str(crash_out)],
        cwd="/root/repo", stdout=subprocess.PIPE,
        stderr=subprocess.PIPE)
    manifest = crash_out / "_manifest.jsonl"
    deadline = time.time() + 180
    killed = False
    while time.time() < deadline and proc.poll() is None:
        if manifest.exists():
            n = sum(1 for ln in open(manifest) if ln.strip())
            if n >= 1:
                proc.send_signal(signal.SIGKILL)
                killed = True
                break
        time.sleep(0.02)
    proc.wait(timeout=60)
    assert killed, "pipeline finished before the kill - grow the input"
    n_before = sum(1 for ln in open(manifest) if ln.strip())
    assert n_before < 8, "all waves finished before the kill landed"
    done_parts = sorted(_glob.glob(str(crash_out / "part-*")))
    committed = done_parts[:n_before]
    mtimes = {p: {os.path.join(dp, f): os.path.getmtime(
                      os.path.join(dp, f))
                  for dp, _, fs in os.walk(p) for f in fs}
              for p in committed}

    # resume to completion
    r2 = run_cli(*args, "--out", str(crash_out))
    assert r2.returncode == 1, r2.stderr
    resumed = json.loads(r2.stdout[r2.stdout.index("{"):])
    clean.pop("uniqueness_tail_s", None)
    resumed.pop("uniqueness_tail_s", None)
    assert resumed == clean
    # committed partitions were skipped, not rewritten
    for p, files_m in mtimes.items():
        for f, mt in files_m.items():
            found = {os.path.join(dp, fn): os.path.getmtime(
                os.path.join(dp, fn))
                for dp, _, fs in os.walk(p) for fn in fs}
            assert found[f] == mt, f"resume rewrote {f} in {p}"


def test_expect_generic_suite(tmp_path):
    """Generic expectation runner: counts match DuckDB on the same
    spec, exit code is the CI gate (1 on any failure, 0 when clean)."""
    import duckdb
    import pyarrow.parquet as pq

    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "columns": {"l_quantity": {"not_null": True, "min": 1,
                                   "max": 25},
                    "l_returnflag": {"enum": ["A", "N"]}},
        "unique": ["l_orderkey", "l_linenumber"],
        "min_rows": 1000}))
    src = "/root/testdata/sf0.001/lineitem.parquet"
    out = tmp_path / "report.parquet"
    r = run_cli("expect", "--input", src, "--spec", str(spec),
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 1  # the corpus genuinely violates the spec
    rep = json.loads(r.stdout.strip().splitlines()[-1])["report"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW l AS SELECT * FROM read_parquet('{src}')")
    exp_max = con.execute(
        "SELECT COUNT(*) - COUNT(*) FILTER (WHERE l_quantity <= 25) "
        "FROM l").fetchone()[0]
    exp_enum = con.execute(
        "SELECT COUNT(*) - COUNT(*) FILTER "
        "(WHERE l_returnflag IN ('A','N')) FROM l").fetchone()[0]
    exp_dup = con.execute(
        "SELECT COALESCE(SUM(c-1),0) FROM (SELECT COUNT(*) c FROM l "
        "GROUP BY l_orderkey, l_linenumber) WHERE c > 1").fetchone()[0]
    assert rep["l_quantity_max"] == exp_max
    assert rep["l_returnflag_enum"] == exp_enum
    assert rep["unique_l_orderkey_l_linenumber"] == exp_dup
    assert rep["l_quantity_not_null"] == 0 and rep["min_rows"] == 0
    t = pq.read_table(str(out))
    assert set(t.column_names) == {"check_name", "n_violations",
                                   "passed"}
    # a clean spec exits 0
    spec.write_text(json.dumps({
        "columns": {"l_quantity": {"not_null": True}}}))
    r2 = run_cli("expect", "--input", src, "--spec", str(spec),
                 "--num-cpus", "2")
    assert r2.returncode == 0


def test_suggest_then_expect_loop(tmp_path):
    """The profiling loop closes: a suggested spec passes BY
    CONSTRUCTION on its own table, and a drifted table fails it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 15.0], pa.float64()),
        "s": pa.array(["a", "b", "a", "b"], pa.string())}), str(src))
    spec = tmp_path / "spec.json"
    r = run_cli("suggest", "--input", str(src), "--out", str(spec),
                "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    sp = json.loads(spec.read_text())
    assert sp["columns"]["v"] == {"max": 30.0, "min": 10.0,
                                 "not_null": True}
    assert sp["columns"]["s"]["enum"] == ["a", "b"]
    r2 = run_cli("expect", "--input", str(src), "--spec", str(spec),
                 "--num-cpus", "2")
    assert r2.returncode == 0, r2.stdout
    # drift: out-of-range value + novel enum member -> gate trips
    pq.write_table(pa.table({
        "k": pa.array([1], pa.int64()),
        "v": pa.array([99.0], pa.float64()),
        "s": pa.array(["zzz"], pa.string())}), str(src))
    r3 = run_cli("expect", "--input", str(src), "--spec", str(spec),
                 "--num-cpus", "2")
    assert r3.returncode == 1
    failed = set(json.loads(
        r3.stdout.strip().splitlines()[-1])["failed"])
    assert {"v_max", "s_enum", "min_rows"} <= failed


def test_repair_generic_spec(tmp_path):
    """suggest -> repair closes the remediation loop: clamps land ON
    the bound, out-of-enum/regex values NULL out (never invented),
    valid cells and NULLs pass through untouched — and the repaired
    table then PASSES the repairable subset of the spec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({
        "v": pa.array([5.0, 50.0, None, -1.0], pa.float64()),
        "s": pa.array(["a", "zzz", "b", None], pa.string())}),
        str(src))
    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "columns": {"v": {"min": 0, "max": 30},
                    "s": {"enum": ["a", "b"]}}}))
    out = tmp_path / "fixed"
    r = run_cli("repair", "--input", str(src), "--spec", str(spec),
                "--out", str(out), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["repairs"] == {"s_nulled": 1, "v_clamped": 2}
    import glob as _glob
    t = pa.concat_tables([pq.read_table(f) for f in
                          _glob.glob(str(out / "*.parquet"))])
    rows = sorted(zip(t["v"].to_pylist(), t["s"].to_pylist()),
                  key=str)
    assert rows == sorted([(5.0, "a"), (30.0, None), (None, "b"),
                           (0.0, None)], key=str)
    # repaired output passes the repairable rules
    r2 = run_cli("expect", "--input", str(out / "*.parquet"),
                 "--spec", str(spec), "--num-cpus", "2")
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])["report"]
    assert rep2["v_min"] == 1 and rep2["v_max"] == 1  # the NULLs only
    assert rep2["s_enum"] == 2  # NULL fails enum-expectations, by spec


def test_repair_fractional_bound_on_integer_column():
    """A fractional min/max on an INTEGER column must clamp toward the
    interior (ceil for min, floor for max) — pa.scalar(1.5, int64)
    truncation would leave a repaired value of 1 that still violates
    min=1.5, so `repair` -> `expect` would re-fail silently (round-4
    ADVICE, expectations.py:215)."""
    import pyarrow as pa

    from yaschva_ray.expectations import _repair_batch

    t = pa.table({"v": pa.array([-2, 1, 2, 9, None], pa.int64())})
    out = _repair_batch(t, {"columns": {"v": {"min": 1.5, "max": 7.5}}})
    # -2 and 1 clamp UP to ceil(1.5)=2; 9 clamps DOWN to floor(7.5)=7
    assert out["v"].to_pylist() == [2, 2, 2, 7, None]
    # every repaired non-null value now satisfies the rule
    assert all(1.5 <= x <= 7.5 for x in out["v"].to_pylist()
               if x is not None)
    # integral fractional bound (2.0) keeps exact-bound clamping
    out2 = _repair_batch(t, {"columns": {"v": {"min": 2.0}}})
    assert out2["v"].to_pylist() == [2, 2, 2, 9, None]


def test_score_cli_matches_library(tmp_path):
    """`score` runs the pinned quality classifier end-to-end: parquet
    out + keep/drop summary; values equal the library query's."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.inference import QUALITY_MODEL

    src = tmp_path / "docs.parquet"
    texts = ["the cat sat on it and that is that " * (i + 1)
             for i in range(6)] + ["xx", ""]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), str(src))
    out = tmp_path / "scored.parquet"
    r = run_cli("score", "--input", str(src), "--out", str(out),
                "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    t = pq.read_table(str(out))
    assert rep["n_rows"] == len(texts)
    assert rep["n_keep"] + rep["n_drop"] == len(texts)
    assert t.column_names == ["doc_id", "logit_fp", "pred_keep"]
    # recompute one row's logit with the pinned artifact
    from yaschva_ray.pipelines.inference import feature_matrix
    F = feature_matrix(pa.array([texts[0]], pa.string()))
    want = int((F @ np.array(QUALITY_MODEL["weights"], np.int64))[0]
               + QUALITY_MODEL["bias"])
    assert t["logit_fp"][0].as_py() == want


def test_score_cli_custom_model(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaa", "bbbb bb"], pa.string())}), str(src))
    model = tmp_path / "m.json"
    # keep iff n_chars > 4 (weights: [1,0,0,0,0,0], bias -4)
    model.write_text(json.dumps({
        "feature_names": ["n_chars", "n_tokens", "n_digits", "n_punct",
                          "n_stop", "n_upper"],
        "weights": [1, 0, 0, 0, 0, 0], "bias": -4, "scale": 1}))
    out = tmp_path / "scored.parquet"
    r = run_cli("score", "--input", str(src), "--out", str(out),
                "--model", str(model), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    t = pq.read_table(str(out))
    assert t["pred_keep"].to_pylist() == [False, True]  # 3 vs 7 chars


def test_sessionize_cli_plain_and_skew_agree(tmp_path):
    """`sessionize` end-to-end: session rows out; --skew-split on a
    planted hot key produces the identical table."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1)
    us, ts = [], []
    t = 0
    for i in range(1200):  # hot user: bursts with 1-hour gaps
        t += 10 if i % 15 else 3600
        us.append(1)
        ts.append(base + datetime.timedelta(seconds=t))
    for i in range(200):
        us.append(50 + i % 7)
        ts.append(base + datetime.timedelta(seconds=i * 97))
    src = tmp_path / "events.parquet"
    pq.write_table(pa.table({
        "user_id": pa.array(us, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))}), str(src))

    out1 = tmp_path / "plain.parquet"
    r1 = run_cli("sessionize", "--input", str(src), "--key", "user_id",
                 "--ts", "ts", "--gap-s", "600", "--out", str(out1),
                 "--num-cpus", "2")
    assert r1.returncode == 0, r1.stderr
    out2 = tmp_path / "skew.parquet"
    r2 = run_cli("sessionize", "--input", str(src), "--key", "user_id",
                 "--ts", "ts", "--gap-s", "600", "--out", str(out2),
                 "--skew-split", "--max-key-rows", "300",
                 "--num-cpus", "2")
    assert r2.returncode == 0, r2.stderr
    a, b = pq.read_table(str(out1)), pq.read_table(str(out2))
    assert a.equals(b)
    n1 = json.loads(r1.stdout.strip().splitlines()[-1])["n_sessions"]
    assert n1 == a.num_rows and n1 > 50


def test_train_then_score_product_loop(tmp_path):
    """`train` on testdata reproduces the pinned artifact; the written
    JSON feeds `score --model` and scores identically to the default."""
    import pyarrow.parquet as pq

    from yaschva_ray.pipelines.inference import QUALITY_MODEL

    model = tmp_path / "model.json"
    r = run_cli("train", "--input",
                "/root/testdata/sf0.001/documents.parquet",
                "--out", str(model), "--num-cpus", "2")
    assert r.returncode == 0, r.stderr
    art = json.loads(model.read_text())
    assert art["weights"] == QUALITY_MODEL["weights"]
    assert art["bias"] == QUALITY_MODEL["bias"]
    out1 = tmp_path / "s1.parquet"
    out2 = tmp_path / "s2.parquet"
    r1 = run_cli("score", "--input",
                 "/root/testdata/sf0.001/documents.parquet",
                 "--out", str(out1), "--num-cpus", "2")
    r2 = run_cli("score", "--input",
                 "/root/testdata/sf0.001/documents.parquet",
                 "--out", str(out2), "--model", str(model),
                 "--num-cpus", "2")
    assert r1.returncode == 0 and r2.returncode == 0
    assert pq.read_table(str(out1)).equals(pq.read_table(str(out2)))
