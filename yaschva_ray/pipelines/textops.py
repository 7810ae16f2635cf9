"""Training-data-pipeline operators over the documents/embeddings tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force cosine top-k + LSH-bucketed variant), and text analysis
(language-ID heuristic, quality scoring, token stats, fingerprinting).

All hot paths are vectorized (numpy / pyarrow / polars-hash); shuffles are
bucketed (fixed partition count, pre-combined map side) like
``engine.checks``; small sides (query matrices, stopword tables) are
broadcast once via ``ray.put``.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.sketches import _hash64

# RE2-equivalent of \S+: polars compiles Rust regex, whose \s is Unicode
# White_Space (VT, NEL, NBSP, U+2028, ...) while DuckDB's RE2 \s is the
# ASCII set [\t\n\f\r ] — a hypothesis-found divergence ('\x0b' tokenized
# differently) that would silently break every token-level SQL mirror on
# exotic whitespace.  The explicit class below IS RE2's \S, so the polars
# kernels and the mirrors' regexp_extract_all(text, '\S+') agree on every
# input, not just the testdata.
TOKEN_RE = r"[^ \t\n\r\x0c]+"

_LOG = logging.getLogger("yaschva_ray.textops")

# Within-bucket pair emission is the one quadratic in the LSH near-dup
# families.  At web scale a degenerate bucket is GUARANTEED (every
# empty/whitespace doc shares _EMPTY_SHINGLE; boilerplate text is the
# normal case), and an uncapped 10M-row bucket attempts ~5e13 pairs.
# Above this cap a bucket emits a hub-and-spoke STAR to its minimum id
# instead of all-pairs: linear in bucket size, preserves duplicate-cluster
# connectivity (degenerate buckets are near-identical members, so every
# member genuinely matches the hub), and each emission is logged — no
# silent caps.
_MAX_BUCKET_ROWS = 2048


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    from ..sources import clean_parquet_schema

    path = f"{sf_dir}/{table}.parquet"
    # metadata-stripped schema keeps block schemas hashable (fast unify path);
    # a single-file table otherwise splits into too few blocks to use the
    # whole CPU pool (Ray sizes blocks by bytes, not by available slots)
    import ray

    nb = None
    if ray.is_initialized():
        nb = max(int(ray.cluster_resources().get("CPU", 8)), 8)
    return ray.data.read_parquet(path, columns=columns,
                                 schema=clean_parquet_schema(path, columns),
                                 override_num_blocks=nb)


def _gather(ds) -> pa.Table:
    from ..engine.blocks import gather_tables

    tables = gather_tables(ds)
    return pa.concat_tables(tables).combine_chunks() if tables else pa.table({})


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def _dedup_bucket(t: pa.Table) -> pa.Table:
    """Exact group-min over co-located text groups (null texts form one
    duplicate group, SQL PARTITION BY semantics; joins drop null keys, so
    group on (filled text, is-null flag))."""
    from ..engine.joins import _warn_hot_key

    # identical texts MUST co-locate (that is the dedup), so a document
    # duplicated >1M times concentrates in one bucket task — observable,
    # not silent (house rule; semantics unchanged)
    _warn_hot_key(t, "text", "dedup_exact(bucket)", -1)
    isn = pc.is_null(t["text"])
    tt = pa.table({"text": pc.fill_null(t["text"], ""), "isn": isn,
                   "doc_id": t["doc_id"]})
    keep = tt.group_by(["text", "isn"]).aggregate([("doc_id", "min")])
    joined = tt.join(keep, keys=["text", "isn"])
    dup = joined.filter(pc.not_equal(joined["doc_id"], joined["doc_id_min"]))
    return pa.table({"doc_id": dup["doc_id"]})


# above this estimated input size, shuffling full text bytes costs more
# than a second scan: switch to the hash-first two-phase plan
_DEDUP_TWO_PHASE_BYTES = 4 << 30


def dedup_exact_from_ds(ds, num_buckets: int | None = None,
                        two_phase: bool | None = None,
                        max_broadcast_candidates: int = 5_000_000) -> pa.Table:
    """doc_ids that are exact-text duplicates of an earlier (lower doc_id)
    document — always text-verified exact; the PLAN switches on input
    size:

    * small (default below ``_DEDUP_TWO_PHASE_BYTES``): one raw-task hash
      exchange on the text column (engine/exchange.py) + per-bucket
      vectorized group-min — one scan, text bytes move once.
    * large (``two_phase``): phase 1 exchanges only ``(hash64(text),
      doc_id)`` — 8 bytes/row instead of the text — and keeps hash groups
      with count > 1 (duplicate CANDIDATES, tiny by construction); phase
      2 re-scans, filters to candidate hashes via a broadcast ``is_in``,
      and runs the exact text-verified group-min over just those rows.
      At 100 TB the full-text shuffle is the bottleneck; two scans plus
      an 8-byte exchange is far cheaper, and a hash collision can only
      ADD a candidate row to phase 2 (exactness is unaffected — phase 2
      compares real text)."""
    import ray

    from ..engine.exchange import keyed_exchange
    from ..engine.joins import _estimate_bytes

    if two_phase is None:
        est = _estimate_bytes(ds)
        two_phase = est is not None and est > _DEDUP_TWO_PHASE_BYTES

    if not two_phase:
        tables = keyed_exchange(ds, "text", _dedup_bucket,
                                num_buckets=num_buckets)
        if not tables:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return (pa.concat_tables(tables).combine_chunks()
                .sort_by([("doc_id", "ascending")]))

    def hash_rows(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return pa.table({"h": pa.array(_hash64(txt).astype(np.int64)),
                         "doc_id": t["doc_id"]})

    def dup_hashes(t: pa.Table) -> pa.Table:
        g = t.group_by("h").aggregate([([], "count_all")])
        return pa.table({"h": g.filter(pc.greater(g["count_all"], 1))["h"]})

    cand_tables = keyed_exchange(ds.map_batches(hash_rows,
                                                batch_format="pyarrow"),
                                 "h", dup_hashes, num_buckets=num_buckets)
    if not cand_tables:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    cand = pc.unique(pa.concat_tables(cand_tables)["h"].combine_chunks())
    if len(cand) > max_broadcast_candidates:
        # duplicate-HEAVY corpus: the candidate set is no longer a small
        # broadcast — fall back to the full-text exchange (correctness
        # identical; phase 1's cost is sunk). Logged per no-silent-caps.
        _LOG.warning(
            "two-phase dedup found %d candidate hashes (too many to "
            "broadcast): falling back to the single-phase text exchange",
            len(cand))
        return dedup_exact_from_ds(ds, num_buckets=num_buckets,
                                   two_phase=False)
    cand_ref = ray.put(cand)

    def filter_candidates(t: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h = pa.array(_hash64(txt).astype(np.int64))
        return t.filter(pc.is_in(h, value_set=cset))

    tables = keyed_exchange(
        ds.map_batches(filter_candidates, batch_format="pyarrow"),
        "text", _dedup_bucket, num_buckets=num_buckets)
    if not tables:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("doc_id", "ascending")]))


def q_dedup_exact_documents(sf_dir: str, num_buckets: int = 16) -> pa.Table:
    return dedup_exact_from_ds(_read(sf_dir, "documents", ["doc_id", "text"]),
                               num_buckets=num_buckets)


# --------------------------------------------------------------------------
# Incremental dedup against a persisted corpus index
# --------------------------------------------------------------------------
#
# The 100 TB operating mode for dedup is INCREMENTAL: the corpus was
# deduped once; each arriving batch (small relative to the corpus) must be
# checked against everything seen so far WITHOUT rescanning corpus text.
# The persisted index holds only (hash64(text), doc_id) — 16 bytes/row —
# hive-partitioned by the exchange's OWN routing function
# (engine/joins._hash_slices: ``_hash64(h) % num_shards``), so an
# incremental run routes new rows through a plain ``keyed_exchange`` on
# "h" and each reduce task reads exactly its shard's files and nothing
# else.  Hash matches are CANDIDATES; a second, text-verified exchange —
# new text from the batch, old text via a doc_id-pruned corpus read —
# makes the result exact (a 64-bit collision can only ADD a candidate,
# never a wrong answer; phase 2 compares real text).  Updates land under
# ``updates/<tag>/shard=S/`` and become visible only when the manifest
# commits (atomic tmp-write + rename), so a crashed update is invisible
# and re-running the same tag is a no-op.

_DEDUP_INDEX_EMPTY = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "dup_of": pa.array([], pa.int64()),
})

# the index outlives the process, but its shard routing is polars'
# seed-0 hash — if the library version ever changed the hash, new rows
# would route to the WRONG shard and matches would silently vanish.
# A probe vector hashed at build time makes that failure loud instead.
_ROUTING_PROBE = pa.array(list(range(16)), pa.int64())


def _routing_fingerprint() -> list[str]:
    return [str(int(x)) for x in _hash64(_ROUTING_PROBE)]


def _dedup_index_manifest(index_dir: str,
                          expect_kind: str | None = None) -> dict:
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    if m.get("routing") != _routing_fingerprint():
        raise RuntimeError(
            "dedup index routing fingerprint mismatch (the environment's "
            "hash function changed since the index was built) — rebuild "
            f"the index at {index_dir}")
    # an exact-hash index probed as an LSH index (or vice versa) would
    # fail deep inside shard reads with a cryptic column error — the
    # manifest's kind marker makes the misuse loud up front
    if expect_kind and m.get("kind", expect_kind) != expect_kind:
        raise RuntimeError(
            f"index at {index_dir} is kind={m['kind']!r}, but this "
            f"operation needs kind={expect_kind!r} — point it at the "
            "right index (or rebuild)")
    return m


def _write_dedup_manifest(index_dir: str, manifest: dict) -> None:
    import json

    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))


def _hash_ids_table(t: pa.Table, keep_text: bool = False) -> pa.Table:
    """(h, doc_id[, text]) for NON-NULL texts.  Null texts never match SQL
    equality, so the incremental family excludes them by contract (a
    documented divergence from ``dedup_exact``'s PARTITION BY semantics,
    where nulls form one duplicate group)."""
    if "text" not in t.column_names:  # schema-less empty block
        cols = {"h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64())}
        if keep_text:
            cols["text"] = pa.array([], pa.string())
        return pa.table(cols)
    t = t.filter(pc.is_valid(t["text"]))
    txt = t["text"]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    cols = {"h": pa.array(_hash64(txt).astype(np.int64)),
            "doc_id": t["doc_id"]}
    if keep_text:
        cols["text"] = txt
    return pa.table(cols)


def _index_shard_files(index_dir: str, shard: int, manifest: dict) -> list[str]:
    import glob as _glob

    dirs = [os.path.join(index_dir, "base")]
    dirs += [os.path.join(index_dir, "updates", tag)
             for tag in manifest.get("updates", [])]
    return [f for d in dirs for f in sorted(
        _glob.glob(os.path.join(d, f"shard={shard}", "*.parquet")))]


def _shard_col(h_col, num_shards: int) -> pa.Array:
    if isinstance(h_col, pa.ChunkedArray):
        h_col = h_col.combine_chunks()
    return pa.array((_hash64(h_col) % np.uint64(num_shards)).astype(np.int64))


def dedup_index_build(corpus_ds, index_dir: str, *,
                      num_shards: int = 16) -> dict:
    """One corpus scan → persisted (hash64(text), doc_id) index,
    hive-partitioned by the exchange routing of "h", under
    ``index_dir/base``.  Atomic tmp-build + rename: a crashed build
    leaves nothing half-visible for a rerun to double-append next to."""
    import shutil

    def assign(t: pa.Table) -> pa.Table:
        ht = _hash_ids_table(t)
        return ht.append_column("shard", _shard_col(ht["h"], num_shards))

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "base"), exist_ok=True)
    corpus_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(tmp_dir, "base"), partition_cols=["shard"])
    manifest = {"num_shards": num_shards, "updates": [],
                "kind": "exact_hash",
                "routing": _routing_fingerprint()}
    _write_dedup_manifest(tmp_dir, manifest)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return manifest


def dedup_against_index(new_ds, index_dir: str,
                        corpus_paths: str | list[str], *,
                        new_paths: str | list[str] | None = None,
                        max_candidates: int = 5_000_000) -> pa.Table:
    """New-batch doc_ids that exactly duplicate an already-indexed corpus
    doc: (doc_id, dup_of = min matching corpus doc_id), sorted.

    Corpus text is NEVER rescanned — phase 1 joins the new rows' hashes
    against the index shards (each reduce task reads only its own shard's
    files); phase 2 fetches ONLY the candidate corpus doc_ids' rows
    (predicate-pruned ``read_parquet``) and text-verifies through one
    more exchange.  Within-batch duplicates are out of scope by design
    (that is ``dedup_exact_from_ds``'s job on the batch itself).

    ``corpus_paths`` must cover the text of EVERY indexed doc_id —
    the base corpus plus each ingested batch's parquet (the growing
    corpus the index mirrors); an indexed id missing from the read is
    treated as a non-match.

    ``new_paths`` (the batch's own parquet, when it is file-backed — the
    CLI ingest path) switches phase 1 to ship ONLY (hash64, doc_id) — 16
    bytes/row instead of the batch's text — and phase 2 fetches the
    candidate NEW rows' text by the same doc_id-pruned read the corpus
    side uses.  Same result (parity-tested); at 100 TB the batch text
    never crosses the exchange.

    The gathered candidate set is bounded by the batch's true-duplicate
    volume (collisions add ~0); above ``max_candidates`` we log — the
    result is still exact, the driver list is just bigger than the design
    point (no silent caps)."""
    import ray
    import ray.data

    from ..engine.exchange import keyed_exchange

    manifest = _dedup_index_manifest(index_dir, expect_kind="exact_hash")
    num_shards = manifest["num_shards"]
    keep_text = new_paths is None

    hashed = new_ds.map_batches(
        lambda t: _hash_ids_table(t, keep_text=keep_text),
        batch_format="pyarrow")

    def check_shard(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        harr = t["h"]
        if isinstance(harr, pa.ChunkedArray):
            harr = harr.combine_chunks()
        shard = int(_hash64(harr.slice(0, 1))[0] % np.uint64(num_shards))
        files = _index_shard_files(index_dir, shard, manifest)
        ttype = (t.schema.field("text").type if "text" in t.column_names
                 else pa.string())
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], ttype),
                          "side": pa.array([], pa.int8())})
        if not files:
            return empty
        idx = pa.concat_tables(
            [pq.read_table(f, columns=["h", "doc_id"]) for f in files])
        idx_h = pc.unique(idx["h"].combine_chunks())
        newm = t.filter(pc.is_in(harr, value_set=idx_h))
        if not newm.num_rows:
            return empty
        nm_h = newm["h"]
        if isinstance(nm_h, pa.ChunkedArray):
            nm_h = nm_h.combine_chunks()
        old = idx.filter(pc.is_in(idx["h"].combine_chunks(),
                                  value_set=pc.unique(nm_h)))
        newt = pa.table({
            "doc_id": newm["doc_id"].cast(pa.int64()),
            "text": (newm["text"] if "text" in newm.column_names
                     else pa.nulls(newm.num_rows, ttype)),
            "side": pa.array(np.zeros(newm.num_rows, np.int8)),
        })
        oldt = pa.table({
            "doc_id": old["doc_id"].cast(pa.int64()),
            "text": pa.nulls(old.num_rows, ttype),
            "side": pa.array(np.ones(old.num_rows, np.int8)),
        })
        return pa.concat_tables([newt, oldt])

    cand_tables = keyed_exchange(hashed, "h", check_shard,
                                 num_buckets=num_shards)
    cand_tables = [t for t in cand_tables if t.num_rows]
    if not cand_tables:
        return _DEDUP_INDEX_EMPTY
    cand = pa.concat_tables(cand_tables).combine_chunks()
    if cand.num_rows > max_candidates:
        _LOG.warning(
            "incremental dedup gathered %d candidate rows (> %d design "
            "point) — result stays exact, driver memory is the cost",
            cand.num_rows, max_candidates)
    old_ids = pc.unique(
        cand.filter(pc.equal(cand["side"], 1))["doc_id"].combine_chunks())
    new_cand = cand.filter(pc.equal(cand["side"], 0)).select(
        ["doc_id", "text", "side"])
    if not len(old_ids) or not new_cand.num_rows:
        return _DEDUP_INDEX_EMPTY

    import pyarrow.dataset as pads

    old_ds = ray.data.read_parquet(
        corpus_paths, columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(old_ids.to_pylist()))

    def _tag(side: int):
        def tag(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["text"]))
            return pa.table({
                "doc_id": t["doc_id"],
                "text": t["text"],
                "side": pa.array(np.full(t.num_rows, side, np.int8)),
            })
        return tag

    if new_paths is None:
        new_side_ds = ray.data.from_arrow(new_cand)
    else:
        # phase 1 shipped no text — fetch the candidate NEW rows by the
        # same doc_id-pruned read the corpus side uses
        new_ids = pc.unique(new_cand["doc_id"].combine_chunks())
        new_side_ds = ray.data.read_parquet(
            new_paths, columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(new_ids.to_pylist())
        ).map_batches(_tag(0), batch_format="pyarrow")

    union = new_side_ds.union(
        old_ds.map_batches(_tag(1), batch_format="pyarrow"))

    def verify_bucket(t: pa.Table) -> pa.Table:
        old = t.filter(pc.equal(t["side"], 1))
        new = t.filter(pc.equal(t["side"], 0))
        if not old.num_rows or not new.num_rows:
            return _DEDUP_INDEX_EMPTY
        om = (old.select(["text", "doc_id"]).group_by("text")
              .aggregate([("doc_id", "min")]))
        # pyarrow Table.join DEFAULTS to left outer: a candidate new text
        # with no same-text old row IN THIS BUCKET (a hash collision that
        # text-verify must drop) would emit dup_of=null — inner join
        j = new.select(["doc_id", "text"]).join(om, keys=["text"],
                                                join_type="inner")
        return pa.table({"doc_id": j["doc_id"].cast(pa.int64()),
                         "dup_of": j["doc_id_min"].cast(pa.int64())})

    tables = keyed_exchange(union, "text", verify_bucket)
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _DEDUP_INDEX_EMPTY
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("doc_id", "ascending")]))


def dedup_index_update(new_ds, index_dir: str, tag: str) -> dict:
    """Append the batch's (h, doc_id) rows under ``updates/<tag>/`` and
    COMMIT the tag in the manifest.  Idempotent resume: an
    already-committed tag is a no-op; a crashed earlier attempt (data
    written, tag never committed) is invisible to readers and simply
    overwritten.  Callers wanting the deduped-corpus invariant pass the
    batch with its found duplicates already filtered out."""
    manifest = _dedup_index_manifest(index_dir, expect_kind="exact_hash")
    if tag in manifest["updates"]:
        return manifest
    num_shards = manifest["num_shards"]

    def assign(t: pa.Table) -> pa.Table:
        ht = _hash_ids_table(t)
        return ht.append_column("shard", _shard_col(ht["h"], num_shards))

    import shutil

    upd_dir = os.path.join(index_dir, "updates", tag)
    tmp_dir = upd_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    new_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"])
    shutil.rmtree(upd_dir, ignore_errors=True)
    os.rename(tmp_dir, upd_dir)
    manifest["updates"].append(tag)
    _write_dedup_manifest(index_dir, manifest)
    return manifest


def q_dedup_incremental(sf_dir: str, n_plant: int = 16,
                        plant_offset: int = 10_000_000) -> pa.Table:
    """Documents split into CORPUS (even doc_id) and NEW batch (odd doc_id
    + planted exact copies of the first ``n_plant`` even non-null docs at
    doc_id+offset, guaranteeing a non-empty, oracle-checkable result).
    Builds (or reuses) the persisted hash index over the corpus under
    /tmp, then dedups the new batch against the INDEX — corpus text is
    touched only for the candidate doc_ids (predicate-pruned read)."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def evens(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    def news(t: pa.Table) -> pa.Table:
        odd = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))
        sel = t.filter(pc.and_(pc.and_(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0),
            pc.less(t["doc_id"], 2 * n_plant)), pc.is_valid(t["text"])))
        planted = pa.table({
            "doc_id": pc.add(sel["doc_id"], pa.scalar(plant_offset, pa.int64())),
            "text": sel["text"],
        })
        return pa.concat_tables([odd.select(["doc_id", "text"]), planted])

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "yaschva_dedup_idx", tag)
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        dedup_index_build(docs.map_batches(evens, batch_format="pyarrow"),
                          index_dir)
    corpus_path = os.path.join(sf_dir, "documents.parquet")
    return dedup_against_index(
        docs.map_batches(news, batch_format="pyarrow"),
        index_dir, corpus_path)


# --------------------------------------------------------------------------
# Incremental NEAR-dup against a persisted LSH band index
# --------------------------------------------------------------------------
#
# The near-dup sibling of the exact-dedup index: the corpus persists its
# MinHash LSH band keys — (band_key, doc_id), 16 rows × 16 bytes per doc,
# ~0.03% of the text — hive-partitioned by the exchange's own routing.
# A new batch is banded, each reduce task joins its shard's band keys,
# and the candidate pairs flow through the SAME distributed text-verify
# co-group the all-pairs flow uses (verify_candidate_pairs) with both
# texts fetched by doc_id-pruned reads.  Same manifest contract as the
# exact index (atomic commits, idempotent tags, routing fingerprint).

_NEARDUP_CAND_EMPTY = pa.table({
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
})
_NEARDUP_VERIFIED_EMPTY = pa.table({
    "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
    "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.float64())})


def _band_rows(t: pa.Table) -> pa.Table:
    if "text" not in t.column_names:  # schema-less empty block
        return pa.table({"bk": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    return MinHasher()(t).select(["bk", "doc_id"])


def neardup_index_build(corpus_ds, index_dir: str, *,
                        num_shards: int = 16) -> dict:
    """One corpus scan → persisted LSH band index under
    ``index_dir/base`` (atomic tmp-build + rename; manifest carries the
    routing fingerprint like the exact-dedup index)."""
    import shutil

    def assign(t: pa.Table) -> pa.Table:
        rows = _band_rows(t)
        return rows.append_column("shard", _shard_col(rows["bk"],
                                                      num_shards))

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "base"), exist_ok=True)
    corpus_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(tmp_dir, "base"), partition_cols=["shard"])
    manifest = {"num_shards": num_shards, "updates": [],
                "kind": "lsh_bands",
                "routing": _routing_fingerprint()}
    _write_dedup_manifest(tmp_dir, manifest)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return manifest


def neardup_index_update(new_ds, index_dir: str, tag: str) -> dict:
    """Append the batch's band rows under ``updates/<tag>/`` and COMMIT
    the tag (idempotent; crashed attempts invisible)."""
    import shutil

    manifest = _dedup_index_manifest(index_dir, expect_kind="lsh_bands")
    if tag in manifest["updates"]:
        return manifest
    num_shards = manifest["num_shards"]

    def assign(t: pa.Table) -> pa.Table:
        rows = _band_rows(t)
        return rows.append_column("shard", _shard_col(rows["bk"],
                                                      num_shards))

    upd_dir = os.path.join(index_dir, "updates", tag)
    tmp_dir = upd_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    new_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"])
    shutil.rmtree(upd_dir, ignore_errors=True)
    os.rename(tmp_dir, upd_dir)
    manifest["updates"].append(tag)
    _write_dedup_manifest(index_dir, manifest)
    return manifest


def neardup_candidates_against_index(new_ds, index_dir: str, *,
                                     max_group_old: int = _MAX_BUCKET_ROWS,
                                     max_candidates: int = 5_000_000) -> pa.Table:
    """Candidate (corpus doc_a, new doc_b) pairs from the band index: the
    batch is banded, each reduce task Arrow-joins its shard's persisted
    band keys — only (bk, doc_id) ever moves.  A band whose CORPUS side
    exceeds ``max_group_old`` rows is degenerate (empty/boilerplate
    shingles): it contributes only its minimum doc_id as a hub, logged —
    linear instead of quadratic, same policy as the all-pairs caps."""
    from ..engine.exchange import keyed_exchange

    manifest = _dedup_index_manifest(index_dir, expect_kind="lsh_bands")
    num_shards = manifest["num_shards"]
    banded = new_ds.map_batches(_band_rows, batch_format="pyarrow")

    def check_shard(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        bkarr = t["bk"]
        if isinstance(bkarr, pa.ChunkedArray):
            bkarr = bkarr.combine_chunks()
        shard = int(_hash64(bkarr.slice(0, 1))[0] % np.uint64(num_shards))
        files = _index_shard_files(index_dir, shard, manifest)
        if not files:
            return _NEARDUP_CAND_EMPTY
        idx = pa.concat_tables(
            [pq.read_table(f, columns=["bk", "doc_id"]) for f in files])
        idx = idx.rename_columns(["bk", "doc_a"])
        g = idx.group_by("bk").aggregate([("doc_a", "min"),
                                          ([], "count_all")])
        hot = g.filter(pc.greater(g["count_all"], max_group_old))
        if hot.num_rows:
            _LOG.warning(
                "neardup index: %d degenerate band(s) over %d corpus rows "
                "— contributing hub (min doc_id) only", hot.num_rows,
                max_group_old)
            cold = idx.filter(pc.invert(pc.is_in(
                idx["bk"].combine_chunks(),
                value_set=hot["bk"].combine_chunks())))
            hubs = pa.table({"bk": hot["bk"], "doc_a": hot["doc_a_min"]})
            idx = pa.concat_tables([cold, hubs])
        new = pa.table({"bk": t["bk"], "doc_b": t["doc_id"]})
        # pyarrow Table.join DEFAULTS to left outer — unmatched new bands
        # would emit null doc_a rows; this must be an inner join
        j = new.join(idx, keys=["bk"], join_type="inner")
        if not j.num_rows:
            return _NEARDUP_CAND_EMPTY
        return (j.select(["doc_a", "doc_b"])
                .group_by(["doc_a", "doc_b"]).aggregate([]))

    tables = keyed_exchange(banded, "bk", check_shard,
                            num_buckets=num_shards)
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _NEARDUP_CAND_EMPTY
    cand = pa.concat_tables(tables).combine_chunks()
    if cand.num_rows > max_candidates:
        _LOG.warning(
            "neardup index produced %d candidate pairs (> %d design "
            "point) — verify stays exact, driver memory is the cost",
            cand.num_rows, max_candidates)
    return cand


def neardup_against_index(new_ds, index_dir: str,
                          corpus_paths: str | list[str], *,
                          threshold: float = 0.5,
                          new_paths: str | list[str] | None = None) -> pa.Table:
    """New-batch docs near-duplicating an INDEXED corpus doc, text-verified
    by exact n-gram Jaccard ≥ threshold through the shared distributed
    co-group.  Corpus text is read only for candidate doc_ids
    (predicate-pruned); with ``new_paths`` the batch text is too.
    ``corpus_paths`` must cover every indexed doc_id's text (base corpus +
    earlier tags' outputs)."""
    import ray
    import ray.data

    cands = neardup_candidates_against_index(new_ds, index_dir)
    if not cands.num_rows:
        return _NEARDUP_VERIFIED_EMPTY

    import pyarrow.dataset as pads

    old_ids = pc.unique(cands["doc_a"].combine_chunks())
    texts_old = ray.data.read_parquet(
        corpus_paths, columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(old_ids.to_pylist()))
    if new_paths is None:
        texts_new = new_ds.map_batches(
            lambda t: (t.select(["doc_id", "text"])
                       if "text" in t.column_names else
                       pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())})),
            batch_format="pyarrow")
    else:
        new_ids = pc.unique(cands["doc_b"].combine_chunks())
        texts_new = ray.data.read_parquet(
            new_paths, columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(new_ids.to_pylist()))
    out = verify_candidate_pairs(ray.data.from_arrow(cands),
                                 texts_old.union(texts_new),
                                 threshold=threshold)
    return out


def q_neardup_incremental(sf_dir: str, threshold: float = 0.5,
                          n_plant: int = 8,
                          plant_offset: int = 10_000_000) -> pa.Table:
    """Near-dup of a NEW batch (odd docs + planted exact copies of the
    first ``n_plant`` even docs) against the INDEXED corpus (even docs) —
    corpus text touched only for candidates.  Oracle-exact for the same
    reason as minhash_verified_pairs: every qualifying cross pair in the
    fixtures has Jaccard ≈ 1.0 (planted copies / empty-text doubles), and
    16×4-band recall at j=1.0 is exactly 1.0."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def evens(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    def news(t: pa.Table) -> pa.Table:
        odd = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))
        sel = t.filter(pc.and_(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0),
            pc.less(t["doc_id"], 2 * n_plant)))
        planted = pa.table({
            "doc_id": pc.add(sel["doc_id"],
                             pa.scalar(plant_offset, pa.int64())),
            "text": sel["text"],
        })
        return pa.concat_tables([odd.select(["doc_id", "text"]), planted])

    tag = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "yaschva_neardup_idx", tag)
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        neardup_index_build(docs.map_batches(evens, batch_format="pyarrow"),
                            index_dir)
    out = neardup_against_index(
        docs.map_batches(news, batch_format="pyarrow"), index_dir,
        os.path.join(sf_dir, "documents.parquet"), threshold=threshold)
    return out.select(["doc_a", "doc_b", "n_inter", "n_union"])


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

_MINHASH_K = 64
_LSH_BANDS = 16  # 16 bands × 4 rows
# 8-bit popcount lookup table (vectorized hamming distance)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)
_EMPTY_SHINGLE = np.uint64(0x27D4EB2F165667C5)


def _finalize64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized)."""
    z = z.copy()
    z ^= z >> np.uint64(30)
    z *= _MIX2
    z ^= z >> np.uint64(27)
    z *= _MIX3
    z ^= z >> np.uint64(31)
    return z


def _pl_text(texts) -> "object":
    """polars Series over texts with nulls as '' — consumes an Arrow
    column ZERO-COPY when given one (measured 1.4× over the to_pylist
    round trip at 500k docs; identical token output), falls back to list
    construction for plain Python lists."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        return pl.from_arrow(pc.fill_null(texts, ""), rechunk=False).rename("t")
    return pl.Series("t", ["" if t is None else t for t in texts],
                     dtype=pl.String)


def _token_hash_segments(texts, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch tokenization + hashing via polars string expressions:
    returns (flat token hashes, per-doc offsets, per-doc token counts) —
    no per-row Python, no per-doc Series construction.  ``texts`` may be
    a Python list OR an Arrow string column (zero-copy path)."""
    s = _pl_text(texts)
    toks = s.str.extract_all(TOKEN_RE)
    lens = toks.list.len().to_numpy().astype(np.int64)
    # empty_as_null pinned: polars 2.0 flips the default; either way the
    # null row an empty list explodes to is dropped, but pinning keeps the
    # kernel warning-free and behavior-stable across the upgrade
    flat = toks.explode(empty_as_null=True).drop_nulls()
    th = flat.hash(seed=seed).to_numpy().astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    return th, offsets, lens


_ODD_STEP = np.uint64(0xD1342543DE82EF95)  # odd ⇒ products stay odd/bijective


def _offset_mults(n: int) -> list[np.uint64]:
    """Distinct odd multiplier per k-gram offset.  Cycling just three
    multipliers made offsets j and j+3 share one — with XOR mixing, equal
    tokens at distance 3 cancelled exactly (any 4-gram 'X B C X' hashed
    independently of X), inflating spurious shared winnowing fingerprints.
    Offsets 0-2 keep the original constants so every n=3 consumer
    (minhash/jaccard/simhash) is bit-identical; each later triple is scaled
    by a fresh odd power so no two offsets within a k-gram share a
    multiplier."""
    base = (_MIX1, _MIX2, _MIX3)
    out, scale = [], np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound intended
        for j in range(n):
            if j and j % 3 == 0:
                scale = scale * _ODD_STEP
            out.append(base[j % 3] * scale)
    return out


def _batch_shingle_hashes(th: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
                          n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word n-gram shingle hashes for every doc at once.

    Long docs (≥n tokens) get one hash per n-token window (a mix of the
    window's token hashes — equivalent identity to hashing the joined
    string); short docs get a single hash of their available tokens (the
    reference-analog ``" ".join(toks)`` fallback).  Returns
    ``(shingle_hashes, shingle_offsets)`` with ≥1 shingle per doc.
    """
    n_docs = len(lens)
    counts = np.maximum(lens - (n - 1), 1)
    s_off = np.concatenate([[0], np.cumsum(counts)])
    total_sh = int(s_off[-1])
    sh = np.empty(total_sh, dtype=np.uint64)
    # window mix over the flat token array (windows crossing doc boundaries
    # are computed but never selected below)
    total = len(th)
    mults = _offset_mults(n)
    if total >= n:
        L = total - n + 1
        w = np.zeros(L, dtype=np.uint64)
        for j in range(n):  # xor of per-offset mixed terms (n is tiny)
            w ^= th[j:j + L] * mults[j]
        w = _finalize64(w)
    else:
        w = np.empty(0, dtype=np.uint64)
    seg = np.repeat(np.arange(n_docs), counts)
    within = np.arange(total_sh) - s_off[seg]
    src = offsets[seg] + within
    long_doc = lens >= n
    sel = long_doc[seg]
    if sel.any():
        sh[sel] = w[src[sel]]
    for i in np.nonzero(~long_doc)[0]:  # short/empty docs only (rare)
        o, ln = int(offsets[i]), int(lens[i])
        if ln == 0:
            sh[s_off[i]] = _EMPTY_SHINGLE
        else:
            acc = np.uint64(0)
            with np.errstate(over="ignore"):  # uint64 wraparound intended
                # same per-offset multipliers as the windowed path (ln < n,
                # so mults always covers the doc — the old 3-tuple zip
                # silently dropped tokens past offset 2 when n >= 5)
                for jj in range(ln):
                    acc ^= th[o + jj] * mults[jj]
            sh[s_off[i]] = _finalize64(np.array([acc]))[0]
    return sh, s_off


_MH_A = None
_MH_B = None


def _mh_params():
    global _MH_A, _MH_B
    if _MH_A is None:
        rng = np.random.RandomState(1234)
        _MH_A = (rng.randint(1, 1 << 61, size=_MINHASH_K).astype(np.uint64) | np.uint64(1))
        _MH_B = rng.randint(0, 1 << 61, size=_MINHASH_K).astype(np.uint64)
    return _MH_A, _MH_B


def minhash_signatures_batch(texts: list) -> np.ndarray:
    """(n_docs, k) minhash matrix for a batch — fully vectorized:
    batch tokenize/hash → windowed shingle mix → per-permutation
    ``a_k·h mod 2^64`` (odd ``a_k`` ⇒ a bijection on uint64, a valid
    permutation family) → per-doc segmented min.

    Implementation note: ONE flat multiply + ``minimum.reduceat`` per
    permutation beats the (k × n_shingles) broadcast matrix by ~100×
    (measured) — the 2-D broadcast form hits numpy's strided scalar loop
    for uint64 and blows the cache; the flat form is a contiguous SIMD
    pass with a ~2 MB working set."""
    a, _b = _mh_params()
    th, offsets, lens = _token_hash_segments(texts, seed=7)
    sh, s_off = _batch_shingle_hashes(th, offsets, lens)
    n_docs = len(lens)
    out = np.empty((n_docs, _MINHASH_K), dtype=np.uint64)
    starts = s_off[:-1].astype(np.int64)
    for k in range(_MINHASH_K):
        out[:, k] = np.minimum.reduceat(sh * a[k], starts)
    return out


def minhash_signature(text: str) -> np.ndarray:
    """k=64 minhash over word 3-gram shingles (single-doc wrapper over the
    batched kernel; odd-multiplier permutation family mod 2^64)."""
    return minhash_signatures_batch([text])[0]


class MinHasher:
    """Actor-pool stage: doc → (doc_id, band, band_hash) rows.
    Whole-batch vectorized (no per-row Python in the hot path)."""

    def __init__(self):
        _mh_params()  # once per actor
        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = minhash_signatures_batch(batch["text"])  # (n, k)
        n = batch.num_rows
        rows_per_band = _MINHASH_K // _LSH_BANDS
        bands = sigs.reshape(n, _LSH_BANDS, rows_per_band)
        bh = (bands * _MIX1).sum(axis=2, dtype=np.uint64)  # (n, bands)
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        parent = np.repeat(np.arange(n), _LSH_BANDS)
        bands = np.tile(np.arange(_LSH_BANDS, dtype=np.int32), n)
        bhr = bh.ravel()
        # single exchange-key column mixing (band, band_hash) — the raw
        # task exchange partitions on one column
        bk = (bhr * _MIX2 + bands.astype(np.uint64)).astype(np.int64)
        return pa.table({
            "doc_id": doc_ids.take(pa.array(parent)),
            "band": pa.array(bands),
            "band_hash": pa.array(bhr.astype(np.int64)),
            "bk": pa.array(bk),
        })


def minhash_candidates_from_ds(ds, max_bucket_rows: int = _MAX_BUCKET_ROWS):
    """Candidate near-dup pairs as a DATASET (never driver-materialized):
    shingle→minhash→band→raw-task hash exchange on the (band, band_hash)
    key (engine/exchange.py — the Ray Data groupby it replaced paid
    seconds of fixed all-to-all latency), per-bucket segmented pair
    emission.  Pairs found in multiple bands may appear more than once;
    consumers dedup where it matters (the verify co-group's pair-key
    groupby collapses them for free, the candidates query dedups its
    small gathered result).  Stateless task stage, not an actor pool:
    MinHasher holds no per-actor state (the permutation table is a module
    global per worker process) and pool spin-up cost ~2 s per query."""
    import ray.data

    from ..engine.exchange import keyed_exchange

    sigs = ds.map_batches(MinHasher(), batch_format="pyarrow")
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})

    def pairs_bucket(t: pa.Table) -> pa.Table:
        # a bucket holds MANY (band, band_hash) groups: sort + segment,
        # emit all-pairs per group — capped: over max_bucket_rows a group
        # is degenerate (empty/boilerplate shingles) and all-pairs would
        # go quadratic, so emit a star to the minimum doc_id instead
        order = pc.sort_indices(t, sort_keys=[("bk", "ascending"),
                                              ("doc_id", "ascending")])
        s = t.take(order)
        bk = np.asarray(s["bk"].to_numpy(zero_copy_only=False))
        ids = np.asarray(s["doc_id"].to_numpy(zero_copy_only=False))
        n = len(ids)
        newg = np.ones(n, dtype=bool)
        newg[1:] = bk[1:] != bk[:-1]
        starts = np.nonzero(newg)[0]
        sizes = np.diff(np.append(starts, n))
        out_a, out_b = [], []
        for gi in np.nonzero(sizes >= 2)[0]:
            grp = ids[starts[gi]: starts[gi] + sizes[gi]]
            m = len(grp)
            if m > max_bucket_rows:
                # unlike the simhash/embedding caps (which verify star
                # pairs against the hub with the family predicate), these
                # star pairs are emitted UNVERIFIED — candidates are
                # unverified by definition; the verify stage filters them
                _LOG.warning(
                    "minhash LSH bucket of %d rows exceeds cap %d: "
                    "emitting %d star pairs to hub doc %d instead of %d "
                    "all-pairs", m, max_bucket_rows, m - 1, int(grp[0]),
                    m * (m - 1) // 2)
                out_a.append(np.full(m - 1, grp[0], dtype=np.int64))
                out_b.append(grp[1:].astype(np.int64))
            else:
                ia, ib = np.triu_indices(m, k=1)
                out_a.append(grp[ia].astype(np.int64))
                out_b.append(grp[ib].astype(np.int64))
        if not out_a:
            return empty
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b))})

    refs = keyed_exchange(sigs, "bk", pairs_bucket, empty_result=empty,
                          gather=False)
    return ray.data.from_arrow_refs(refs)


def _minhash_candidates_ds(sf_dir: str):
    return minhash_candidates_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_minhash_candidates_documents(sf_dir: str) -> pa.Table:
    """LSH candidate near-dup pairs: same (band, band_hash) bucket.
    shingle→minhash→band→bucket-groupby (the canonical scheme)."""
    t = _gather(_minhash_candidates_ds(sf_dir))
    if not t.num_rows:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    return (t.select(["doc_a", "doc_b"]).group_by(["doc_a", "doc_b"])
            .aggregate([]).sort_by([("doc_a", "ascending"),
                                    ("doc_b", "ascending")]))


def _shingle_hash_sets(texts: list) -> list[np.ndarray]:
    """Sorted DISTINCT shingle-hash array per text, computed for the whole
    list in one pass through the batched kernels (`_token_hash_segments` +
    `_batch_shingle_hashes`) — each text tokenized exactly once.  Equal
    shingle tuples hash equal, so Jaccard over these arrays matches
    `jaccard_ngrams`'s tuple-set Jaccard (modulo 64-bit collisions;
    asserted equal on random corpora in tests)."""
    th, offsets, lens = _token_hash_segments(
        ["" if t is None else t for t in texts], seed=7)
    sh, s_off = _batch_shingle_hashes(th, offsets, lens)
    return [np.unique(sh[s_off[i]:s_off[i + 1]]) for i in range(len(texts))]


def jaccard_hash_rationals(ua: np.ndarray, ub: np.ndarray) -> tuple[int, int]:
    """(|A∩B|, |A∪B|) of two sorted-unique hash arrays (vectorized merge).
    Integer rationals, not a rounded float, so a SQL oracle can compare
    exactly (DuckDB rounds half-away, Python half-even)."""
    inter = int(np.intersect1d(ua, ub, assume_unique=True).size)
    return inter, ua.size + ub.size - inter


def jaccard_hash_sets(ua: np.ndarray, ub: np.ndarray) -> float:
    """Jaccard of two sorted-unique hash arrays (vectorized merge)."""
    inter, union = jaccard_hash_rationals(ua, ub)
    return inter / max(union, 1)


_SNM_WINDOW = 4      # compare each row to the next w-1 in sort order
_SNM_PREFIX = 16     # sort key = first 16 chars of lower(text)


def _snm_sortkey(texts) -> pa.Array:
    return pc.utf8_slice_codeunits(
        pc.utf8_lower(pc.fill_null(texts, "")), 0, _SNM_PREFIX)


def _prefix7_int(key) -> np.ndarray:
    """Order-preserving int64 of each string's first 7 UTF-8 BYTES
    (big-endian, zero-padded) — fully vectorized via the binary array's
    offset/data buffers, no per-row Python.  Byte-wise order equals
    UTF-8 codepoint order, so ranges cut on this int are compatible with
    the full string sort (ties refine inside a bucket, never across)."""
    b7 = pc.binary_slice(pc.cast(key, pa.binary()), 0, 7)
    if isinstance(b7, pa.ChunkedArray):
        b7 = b7.combine_chunks()
    off = np.frombuffer(b7.buffers()[1], np.int32)[
        b7.offset:b7.offset + len(b7) + 1]
    data = np.frombuffer(b7.buffers()[2], np.uint8)
    lens = np.diff(off)
    n = len(b7)
    mat = np.zeros((n, 7), np.uint8)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(int(lens.sum())) - np.repeat(off[:-1] - off[0], lens)
    mat[rows, cols] = data[off[0]:off[-1]]
    pw = (256 ** np.arange(6, -1, -1)).astype(np.int64)
    return mat.astype(np.int64) @ pw


def _snm_verified_pairs(ids: np.ndarray, texts: list, cand: list
                        ) -> pa.Table:
    """Verify candidate index pairs with the family's shingle-hash
    Jaccard (each DISTINCT text hashed once); keep J ≥ 0.5 via the
    integer compare 2·inter ≥ union."""
    sets = _shingle_hash_sets(texts)
    out_a, out_b, out_i, out_u = [], [], [], []
    for i, j in cand:
        inter, union = jaccard_hash_rationals(sets[i], sets[j])
        if 2 * inter >= union:
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
            out_a.append(a)
            out_b.append(b)
            out_i.append(inter)
            out_u.append(union)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "n_inter": pa.array(out_i, pa.int64()),
                     "n_union": pa.array(out_u, pa.int64())})


def q_snm_neardup(sf_dir: str) -> pa.Table:
    """Sorted-neighborhood near-dup detection — the SIXTH blocking family
    (after exact / MinHash-LSH / SimHash / embedding-LSH / SemDeDup):
    sort the corpus by a cheap key (first 16 chars of lowercased text),
    compare each row only to its next ``w-1 = 3`` neighbors, verify
    survivors with the family's shingle-hash Jaccard at ``2·inter ≥
    union`` (J ≥ 0.5).  Classic SNM finds prefix-clustered near-dups LSH
    banding can miss at low signature budgets, for O(n·w) comparisons.

    Distributed as a RANGE exchange (the sorted-export primitive, not a
    hash shuffle — SNM needs GLOBAL order): cutpoints come from an
    equi-depth sample of the first-7-byte integer key (order-compatible
    with the string sort: equal-int rows never straddle a cut, and the
    full (sortkey, doc_id) sort inside a bucket refines the int order).
    Window pairs that SPAN bucket cuts are recovered exactly on the
    driver from each bucket's head/tail strips (≤ 2(w-1) rows + a row
    count per bucket — positions reconstruct global adjacency even
    through buckets smaller than the window), and only cross-bucket
    pairs are counted there, so nothing is double-counted.  The SQL
    mirror is the full semantics (row_number self-join + the
    jaccard_pairs shingle CTE), making this the first near-dup family
    member whose ENTIRE pipeline is oracle-checked, not just planted
    copies."""
    import ray.data

    from ..engine.exchange import range_exchange
    from ..engine.joins import _auto_buckets
    from .ops import equidepth_cutpoints

    w = _SNM_WINDOW
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sample_keys(t: pa.Table) -> pa.Table:
        vals = np.sort(_prefix7_int(_snm_sortkey(t["text"])))
        step = max(1, len(vals) // 32)
        return pa.table({"k": pa.array(vals[::step])})

    sample = _gather(ds.map_batches(sample_keys, batch_format="pyarrow"))
    nb = _auto_buckets(ds)
    cuts = equidepth_cutpoints(
        np.sort(np.asarray(sample["k"].to_numpy(zero_copy_only=False))), nb)

    def add_key(t: pa.Table) -> pa.Table:
        key = _snm_sortkey(t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "sortkey": key, "k": pa.array(_prefix7_int(key))})

    empty = pa.table({
        "kind": pa.array([], pa.string()),
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "n_inter": pa.array([], pa.int64()),
        "n_union": pa.array([], pa.int64()),
        "ord": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    })

    def bucket(bucket_id: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        order = pc.sort_indices(t, sort_keys=[("sortkey", "ascending"),
                                              ("doc_id", "ascending")])
        s = t.take(order)
        ids = np.asarray(s["doc_id"].to_numpy(zero_copy_only=False))
        txt = s["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        texts = txt.to_pylist()
        n = len(ids)
        cand = [(i, i + d) for d in range(1, w) for i in range(n - d)]
        pairs = _snm_verified_pairs(ids, texts, cand)
        nulls = pa.nulls  # strip rows: head/tail (all rows when small)
        strip_ix = sorted(set(range(min(w - 1, n)))
                          | set(range(max(0, n - (w - 1)), n)))
        strip = pa.table({
            "kind": pa.array(["strip"] * len(strip_ix), pa.string()),
            "doc_a": nulls(len(strip_ix), pa.int64()),
            "doc_b": nulls(len(strip_ix), pa.int64()),
            "n_inter": nulls(len(strip_ix), pa.int64()),
            "n_union": nulls(len(strip_ix), pa.int64()),
            "ord": pa.array([bucket_id * (1 << 40) + i for i in strip_ix],
                            pa.int64()),
            "doc_id": pa.array([int(ids[i]) for i in strip_ix], pa.int64()),
            "text": pa.array([texts[i] for i in strip_ix], pa.string()),
        })
        count = pa.table({
            "kind": pa.array(["count"], pa.string()),
            "doc_a": nulls(1, pa.int64()),
            "doc_b": nulls(1, pa.int64()),
            "n_inter": nulls(1, pa.int64()),
            "n_union": nulls(1, pa.int64()),
            "ord": pa.array([bucket_id * (1 << 40) + n], pa.int64()),
            "doc_id": nulls(1, pa.int64()),
            "text": nulls(1, pa.string()),
        })
        pr = pa.table({
            "kind": pa.array(["pair"] * pairs.num_rows, pa.string()),
            "doc_a": pairs["doc_a"], "doc_b": pairs["doc_b"],
            "n_inter": pairs["n_inter"], "n_union": pairs["n_union"],
            "ord": pa.nulls(pairs.num_rows, pa.int64()),
            "doc_id": pa.nulls(pairs.num_rows, pa.int64()),
            "text": pa.nulls(pairs.num_rows, pa.string()),
        })
        return pa.concat_tables([pr, strip, count])

    parts = range_exchange(ds.map_batches(add_key, batch_format="pyarrow"),
                           "k", cuts, bucket, empty_result=empty)
    allp = pa.concat_tables([p for p in parts if p.num_rows])
    if not allp.num_rows:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "n_inter": pa.array([], pa.int64()),
                         "n_union": pa.array([], pa.int64())})
    pair_rows = allp.filter(pc.equal(allp["kind"], "pair"))
    # --- cross-cut pairs from the strip chain (driver-side, tiny) ---
    counts = allp.filter(pc.equal(allp["kind"], "count"))
    n_by_bucket = {int(o) >> 40: int(o) & ((1 << 40) - 1)
                   for o in counts["ord"].to_pylist()}
    offsets, acc = {}, 0
    for b in sorted(n_by_bucket):
        offsets[b] = acc
        acc += n_by_bucket[b]
    strips = allp.filter(pc.equal(allp["kind"], "strip"))
    srows = sorted(
        ((int(o) >> 40, int(o) & ((1 << 40) - 1), d, x)
         for o, d, x in zip(strips["ord"].to_pylist(),
                            strips["doc_id"].to_pylist(),
                            strips["text"].to_pylist())),
    )
    gpos = np.array([offsets[b] + i for b, i, _, _ in srows], np.int64)
    gbuk = np.array([b for b, _, _, _ in srows], np.int64)
    gids = np.array([d for _, _, d, _ in srows], np.int64)
    gtexts = [x for _, _, _, x in srows]
    cross = [(i, j)
             for i in range(len(srows))
             for j in range(i + 1, len(srows))
             if gpos[j] - gpos[i] <= w - 1 and gbuk[i] != gbuk[j]]
    xp = _snm_verified_pairs(gids, gtexts, cross)
    out = pa.concat_tables([
        pair_rows.select(["doc_a", "doc_b", "n_inter", "n_union"]), xp])
    return out.combine_chunks().sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])


def _plant_copies(ds, id_col: str, text_cols: list[str], n_plant: int,
                  offset: int):
    """Append EXACT copies of rows with ``id_col < n_plant`` (new id =
    id + offset) — the pattern that makes an LSH family oracle-checkable:
    identical payloads carry identical signatures, so recall on the
    planted pairs is exactly 1.0 and a DuckDB oracle can mirror the
    augmentation (see q_embedding_neardup)."""
    cols = [id_col] + text_cols

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t[id_col], n_plant))
        if not sel.num_rows:
            return t.select(cols)
        copy = {id_col: pc.add(sel[id_col], pa.scalar(offset, pa.int64()))}
        for c in text_cols:
            copy[c] = sel[c]
        return pa.concat_tables([t.select(cols), pa.table(copy).select(cols)])

    return ds.map_batches(plant, batch_format="pyarrow")


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(n)]))) if len(a.split()) >= n else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(n)]))) if len(b.split()) >= n else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_verified_pairs_from_ds(docs_ds, threshold: float = 0.5) -> pa.Table:
    """Candidates verified by exact n-gram Jaccard ≥ threshold — fully
    distributed co-group (no driver-side text lookup), both halves on the
    raw-task exchange (engine/exchange.py).  ``docs_ds`` is branched twice
    (signatures + text attach); each branch re-executes the upstream
    read, same cost as two scans."""
    return verify_candidate_pairs(minhash_candidates_from_ds(docs_ds),
                                  docs_ds, threshold)


def verify_candidate_pairs(cands, texts_ds, threshold: float = 0.5) -> pa.Table:
    """Exact n-gram Jaccard verification of an ARBITRARY candidate-pair
    Dataset (doc_a, doc_b) against a (doc_id, text) Dataset — shared by
    the all-pairs LSH flow and the incremental index flow:

    1. each candidate pair emits two side rows keyed by its member doc_id,
    2. side rows union with the text corpus (keyed by doc_id); exchange 1
       co-locates each doc's text with the pair sides that need it (one
       hash shuffle of the corpus — same cost class as exact dedup), and
       the per-bucket attach is a vectorized sort + segment-take,
    3. exchange 2 on a mixed pair-key column brings both texts of a pair
       together; exactness comes from sorting on the real (doc_a, doc_b)
       inside the bucket, the mixed key only routes.

    Returns (doc_a, doc_b, n_inter, n_union, jaccard) — the integer
    rationals alongside the float so SQL oracles compare exactly."""
    import ray.data

    from ..engine.exchange import keyed_exchange

    docs_ds = texts_ds

    def emit_sides(t: pa.Table) -> pa.Table:
        n = t.num_rows
        a = t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"]
        b = t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]
        return pa.table({
            "join_key": pa.concat_arrays([a, b]),
            "doc_a": pa.concat_arrays([a, a]),
            "doc_b": pa.concat_arrays([b, b]),
            "side": pa.array([0] * n + [1] * n, pa.int32()),
            "text": pa.array([None] * (2 * n), pa.string()),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "join_key": t["doc_id"],
            "doc_a": pa.array([-1] * n, pa.int64()),
            "doc_b": pa.array([-1] * n, pa.int64()),
            "side": pa.array([-1] * n, pa.int32()),
            "text": t["text"],
        })

    sides = cands.map_batches(emit_sides, batch_format="pyarrow")
    docs = docs_ds.map_batches(tag_docs, batch_format="pyarrow")

    attached_empty = pa.table({
        "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
        "side": pa.array([], pa.int32()), "text": pa.array([], pa.string())})

    def attach_bucket(t: pa.Table) -> pa.Table:
        # side -1 (the doc row) sorts first within each join_key segment;
        # every side row takes its segment head's text
        order = pc.sort_indices(t, sort_keys=[("join_key", "ascending"),
                                              ("side", "ascending")])
        s = t.take(order)
        jk = np.asarray(s["join_key"].to_numpy(zero_copy_only=False))
        side = np.asarray(s["side"].to_numpy(zero_copy_only=False))
        n = len(jk)
        newg = np.ones(n, dtype=bool)
        newg[1:] = jk[1:] != jk[:-1]
        starts = np.nonzero(newg)[0]
        seg = np.cumsum(newg) - 1
        first = starts[seg]
        has_text = side[first] == -1
        texts = s["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        attached = texts.take(pa.array(np.where(has_text, first, 0)))
        attached = pc.if_else(pa.array(has_text), attached,
                              pa.scalar(None, pa.string()))
        out = pa.table({"doc_a": s["doc_a"], "doc_b": s["doc_b"],
                        "side": s["side"], "text": attached})
        return out.filter(pc.not_equal(out["side"], -1))

    refs = keyed_exchange(sides.union(docs), "join_key", attach_bucket,
                          empty_result=attached_empty, gather=False)
    attached_ds = ray.data.from_arrow_refs(refs)

    def add_pair_key(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        pk = (a * _MIX1 ^ b * _MIX3).astype(np.int64)
        return t.append_column("pk", pa.array(pk))

    verified_empty = pa.table({"doc_a": pa.array([], pa.int64()),
                               "doc_b": pa.array([], pa.int64()),
                               "n_inter": pa.array([], pa.int64()),
                               "n_union": pa.array([], pa.int64()),
                               "jaccard": pa.array([], pa.float64())})

    def verify_bucket(t: pa.Table) -> pa.Table:
        # shingle-hash each DISTINCT text in the bucket ONCE through the
        # batched kernels, then per-pair Jaccard is a vectorized merge of
        # two sorted hash arrays — no per-pair re-tokenization (a doc in
        # many pairs used to pay a Python tokenize/set loop per pair)
        order = pc.sort_indices(t, sort_keys=[("doc_a", "ascending"),
                                              ("doc_b", "ascending"),
                                              ("side", "ascending")])
        s = t.take(order)
        a = np.asarray(s["doc_a"].to_numpy(zero_copy_only=False))
        b = np.asarray(s["doc_b"].to_numpy(zero_copy_only=False))
        side = np.asarray(s["side"].to_numpy(zero_copy_only=False))
        txt = s["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        enc = pc.dictionary_encode(pc.fill_null(txt, ""))
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
        sets = _shingle_hash_sets(enc.dictionary.to_pylist())
        empty_set = np.array([_EMPTY_SHINGLE], dtype=np.uint64)
        n = len(a)
        newg = np.ones(n, dtype=bool)
        newg[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(newg)[0]
        last = np.append(starts[1:], n) - 1
        # sorted by side within each pair segment: a side-0 row, if any,
        # is first; a side-1 row, if any, is last
        ca = np.where(side[starts] == 0, codes[starts], -1)
        cb = np.where(side[last] == 1, codes[last], -1)
        out_a, out_b, out_i, out_u, out_j = [], [], [], [], []
        for gi in range(len(starts)):
            ua = sets[ca[gi]] if ca[gi] >= 0 else empty_set
            ub = sets[cb[gi]] if cb[gi] >= 0 else empty_set
            inter, union = jaccard_hash_rationals(ua, ub)
            j = inter / max(union, 1)
            if j >= threshold:
                st = starts[gi]
                out_a.append(int(a[st]))
                out_b.append(int(b[st]))
                out_i.append(inter)
                out_u.append(union)
                out_j.append(round(j, 6))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "n_inter": pa.array(out_i, pa.int64()),
                         "n_union": pa.array(out_u, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    tables = keyed_exchange(
        attached_ds.map_batches(add_pair_key, batch_format="pyarrow"),
        "pk", verify_bucket, empty_result=verified_empty)
    if not tables:
        return verified_empty
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("doc_a", "ascending"), ("doc_b", "ascending")]))


def q_minhash_verified_pairs(sf_dir: str, threshold: float = 0.5,
                             n_plant: int = 8,
                             plant_offset: int = 10_000_000) -> pa.Table:
    """LSH candidates verified by exact 3-gram Jaccard ≥ threshold, with
    EXACT copies of the first ``n_plant`` docs planted in-query — and a
    hash-exact DuckDB oracle (all-pairs shingle-set Jaccard over the
    augmented table, integer rationals, ``2·n_inter ≥ n_union``).

    Why the all-pairs SQL is an exact oracle for the LSH output here:
    every qualifying pair in the sf test fixtures has Jaccard ≥ 0.9
    (measured: the corpus has NO pair in [0.2, 0.9) — near-dup copies are
    one-word edits), and 16×4-band minhash misses a j ≥ 0.9 pair with
    probability ≤ (1−0.9⁴)¹⁶ ≈ 4e-8 — recall over the qualifying set is
    1.0 for this data (observed and pinned by the driver hash), while the
    planted pairs (j = 1.0, identical signatures) are recall-1.0 by
    construction on ANY data.  Output columns are the integer rationals
    (n_inter, n_union); the float is omitted because DuckDB rounds
    half-away vs Python's half-even."""
    docs = _plant_copies(_read(sf_dir, "documents", ["doc_id", "text"]),
                         "doc_id", ["text"], n_plant, plant_offset)
    t = minhash_verified_pairs_from_ds(docs, threshold=threshold)
    return t.select(["doc_a", "doc_b", "n_inter", "n_union"])


def q_neardup_components(sf_dir: str, threshold: float = 0.5,
                         n_plant: int = 8,
                         plant_offset: int = 10_000_000) -> pa.Table:
    """Connected components of the verified near-dup pair graph — the
    cluster step of a dedup pipeline: ``(doc_id, component)`` for every
    document in some verified pair, component = min doc_id reachable.

    Distributed hash-min label propagation (engine/components.py).
    Oracle: the same planted fixture as ``q_minhash_verified_pairs``
    (its pair set is hash-exact vs DuckDB), with components mirrored by
    a recursive CTE reachability closure — exact because the pair sets
    match exactly."""
    from ..engine.components import connected_components

    docs = _plant_copies(_read(sf_dir, "documents", ["doc_id", "text"]),
                         "doc_id", ["text"], n_plant, plant_offset)
    pairs = minhash_verified_pairs_from_ds(docs, threshold=threshold)
    return connected_components(pairs)


def q_dedup_keep_canonical(sf_dir: str, threshold: float = 0.5,
                           n_plant: int = 8,
                           plant_offset: int = 10_000_000) -> pa.Table:
    """Corpus after near-dup removal: keep each component's minimum
    doc_id (plus every document with no near-duplicate) — the
    end-to-end dedup pipeline (candidates → verify → components →
    canonical filter).  The component map is broadcast (`ray.put`
    once); the corpus itself never shuffles."""
    from ..engine.components import connected_components, filter_canonical

    docs = _plant_copies(_read(sf_dir, "documents", ["doc_id", "text"]),
                         "doc_id", ["text"], n_plant, plant_offset)
    pairs = minhash_verified_pairs_from_ds(docs, threshold=threshold)
    comp = connected_components(pairs)
    kept = filter_canonical(
        _plant_copies(_read(sf_dir, "documents", ["doc_id"]),
                      "doc_id", [], n_plant, plant_offset), comp)
    out = _gather(kept).select(["doc_id"])
    return out.sort_by([("doc_id", "ascending")])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64_batch(texts: list) -> np.ndarray:
    """(n_docs,) uint64 simhash fingerprints, whole-batch vectorized:
    one polars tokenize+hash pass, per-doc bit sums via
    ``np.add.reduceat``, sign-packed into 64 bits."""
    th, offsets, lens = _token_hash_segments(texts, seed=11)
    n_docs = len(lens)
    fp = np.zeros(n_docs, dtype=np.uint64)
    if len(th) == 0:
        return fp
    # one flat pass per bit (64 contiguous SIMD passes) — the 2-D
    # (tokens × 64) broadcast form hits numpy's slow strided uint64 loop.
    # A trailing dummy element lets an empty last doc's start == len(th).
    seg = np.append(th, np.uint64(0))
    starts = offsets[:-1].astype(np.int64)
    empty = lens == 0
    for k in range(64):
        bit = ((seg >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
        sums = np.add.reduceat(bit, starts)
        sums[empty] = 0  # reduceat yields bit[start] for empty segments
        fp |= (2 * sums > lens).astype(np.uint64) << np.uint64(k)
    return fp


def simhash64(text: str) -> int:
    """Single-doc wrapper over the batched kernel."""
    return int(simhash64_batch([text])[0])


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = simhash64_batch(batch["text"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(fps.astype(np.int64)),
        })


def q_simhash_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _gather(ds.map_batches(SimHasher(), batch_format="pyarrow"))
    return out.sort_by([("doc_id", "ascending")])


def simhash_neardup_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                          max_bucket_rows: int = _MAX_BUCKET_ROWS) -> pa.Table:
    """SimHash near-duplicate pairs: 64-bit fingerprints → 4×16-bit band
    buckets (pigeonhole: any pair within hamming ≤ 3 of 64 bits agrees
    EXACTLY on at least one 16-bit band — recall 1.0 for the default
    threshold, unlike probabilistic minhash banding) → within-bucket
    vectorized hamming verify → distinct pairs.  One hash shuffle keyed by
    (band, band_value); bucket-local pair emission only."""
    bits_per_band = 64 // n_bands
    bmask = np.uint64((1 << bits_per_band) - 1)

    from ..engine.exchange import keyed_exchange

    def sign_bands(t: pa.Table) -> pa.Table:
        fps = simhash64_batch(t["text"])
        n = len(fps)
        parent = np.repeat(np.arange(n), n_bands)
        bands = np.tile(np.arange(n_bands, dtype=np.int32), n)
        shifts = (bands.astype(np.uint64) * np.uint64(bits_per_band))
        vals = ((fps[parent] >> shifts) & bmask).astype(np.uint64)
        doc_ids = t["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        bk = (vals * _MIX2 + bands.astype(np.uint64)).astype(np.int64)
        return pa.table({"bk": pa.array(bk),
                         "doc_id": doc_ids.take(pa.array(parent)),
                         "fp": pa.array(fps[parent].astype(np.int64))})

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})

    def pairs_bucket(t: pa.Table) -> pa.Table:
        # many (band, band_val) groups per bucket: sort + segment, pairs
        # per group with the degenerate-bucket star cap
        order = pc.sort_indices(t, sort_keys=[("bk", "ascending"),
                                              ("doc_id", "ascending")])
        s = t.take(order)
        bk = np.asarray(s["bk"].to_numpy(zero_copy_only=False))
        ids = np.asarray(s["doc_id"].to_numpy(zero_copy_only=False))
        fps = np.asarray(s["fp"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        n = len(ids)
        newg = np.ones(n, dtype=bool)
        newg[1:] = bk[1:] != bk[:-1]
        starts = np.nonzero(newg)[0]
        sizes = np.diff(np.append(starts, n))
        acc_a, acc_b = [], []
        for gi in np.nonzero(sizes >= 2)[0]:
            sl = slice(starts[gi], starts[gi] + sizes[gi])
            gids, gfps = ids[sl], fps[sl]
            m = len(gids)
            if m > max_bucket_rows:
                # degenerate group: verify everything against the min-id
                # HUB only (linear) — same hamming predicate
                _LOG.warning(
                    "simhash bucket of %d rows exceeds cap %d: "
                    "star-verifying against hub doc instead of %d all-pairs",
                    m, max_bucket_rows, m * (m - 1) // 2)
                hub = 0  # rows are doc_id-sorted within the group
                xor = gfps ^ gfps[hub]
                ham = _POP8[xor.view(np.uint8).reshape(-1, 8)].sum(axis=1)
                keep = (ham <= max_hamming) & (np.arange(m) != hub)
                a = np.full(int(keep.sum()), gids[hub])
                b = gids[keep]
            else:
                ia, ib = np.triu_indices(m, k=1)
                xor = (gfps[ia] ^ gfps[ib])
                ham = _POP8[xor.view(np.uint8).reshape(-1, 8)].sum(axis=1)
                keep = ham <= max_hamming
                a, b = gids[ia[keep]], gids[ib[keep]]
            acc_a.append(np.minimum(a, b))
            acc_b.append(np.maximum(a, b))
        if not acc_a:
            return empty
        return pa.table({"doc_a": pa.array(np.concatenate(acc_a).astype(np.int64)),
                         "doc_b": pa.array(np.concatenate(acc_b).astype(np.int64))})

    sigs = ds.map_batches(sign_bands, batch_format="pyarrow")
    tables = keyed_exchange(sigs, "bk", pairs_bucket, empty_result=empty)
    if not tables:
        return empty
    t = pa.concat_tables(tables).combine_chunks()
    return (t.group_by(["doc_a", "doc_b"])
            .aggregate([]).sort_by([("doc_a", "ascending"),
                                    ("doc_b", "ascending")]))


def q_simhash_neardup(sf_dir: str, max_hamming: int = 2,
                      slice_docs: int = 100, n_plant: int = 8,
                      plant_offset: int = 10_000_000) -> pa.Table:
    """Near-dup doc pairs by simhash hamming distance, oracle-checked:
    the driver-facing query runs the operator over the ``doc_id <
    slice_docs`` slice augmented with EXACT copies of the first
    ``n_plant`` docs, so the full output is SQL-expressible as a
    text-equality self-join — identical texts have identical fingerprints
    (hamming 0, found with probability 1: they agree on every band), and
    the slice has NO natural pair within the threshold (measured minimum
    cross-pair hamming in the fixtures: 3 at sf0.001, 5 at sf0.01, 6 at
    sf0.1 — all > max_hamming=2; simhash can't be computed in SQL, so a
    sliced planted fixture is the only non-circular exact oracle).
    Full-corpus exactness of the operator itself (default hamming ≤ 3,
    pigeonhole-exact 4×16-bit banding) is asserted against a brute-force
    all-pairs hamming scan in tests/test_textops.py."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], slice_docs)),
        batch_format="pyarrow")
    docs = _plant_copies(docs, "doc_id", ["text"], n_plant, plant_offset)
    return simhash_neardup_pairs(docs, max_hamming=max_hamming)


# --------------------------------------------------------------------------
# similarity search (embeddings)
# --------------------------------------------------------------------------


def _embeddings_matrix(table: pa.Table) -> np.ndarray:
    col = table["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(table)
    return flat.reshape(len(table), dim)


def q_ann_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Brute-force cosine top-k: broadcast the query matrix (``ray.put``
    once), numpy matmul per batch, per-batch top-k, exact global merge.
    Output: (query_id, vec_id, score) — score rounded for hash stability."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # queries = vec_id < n_queries (deterministic, SQL-mirrorable)
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"
    )).sort_by([("vec_id", "ascending")])
    qm = _embeddings_matrix(head)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ids = head["vec_id"].to_pylist()
    q_ref = ray.put((q_ids, qn))

    def topk_batch(t: pa.Table) -> pa.Table:
        q_ids_, qn_ = ray.get(q_ref)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        scores = qn_ @ mn.T  # (nq, batch)
        vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        nq = len(q_ids_)
        kk = min(k, scores.shape[1])
        idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = {
            "query_id": np.repeat(np.asarray(q_ids_), kk),
            "vec_id": vec_ids[idx].ravel(),
            "score": np.take_along_axis(scores, idx, axis=1).ravel(),
        }
        return pa.table({k2: pa.array(v) for k2, v in rows.items()})

    partials = _gather(emb_ds.map_batches(topk_batch, batch_format="pyarrow"))
    # exact global top-k merge (tiny: nq × k × n_batches rows)
    import pandas as pd

    df = partials.to_pandas()
    df = (df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=True).head(k))
    # scores are float-dialect-dependent (DuckDB computes cosine in float32);
    # the oracle-compared contract is the top-k SET per query
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["query_id", "vec_id"]], preserve_index=False)


def embedding_neardup_pairs(emb_ds, threshold: float = 0.9,
                            n_planes: int = 16, n_bands: int = 4,
                            max_bucket_rows: int = _MAX_BUCKET_ROWS) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (the fifth dedup family):
    random-hyperplane signatures → band buckets (groupby co-locates each
    bucket's VECTORS, not just ids) → exact within-bucket cosine ≥
    threshold → distinct pairs.

    Scale shape: the all-pairs compare is bucket-local (no global
    quadratic), vectors move through ONE hash shuffle keyed by
    (band, band_hash) — same cost class as exact text dedup.  Recall < 1
    by design (banding probability: ~0.95 at sim 0.9 with 4×4-bit bands),
    asserted vs brute force on planted near-dups in tests — rows-only
    driver check."""

    from ..engine.exchange import keyed_exchange

    def sign_bands(t: pa.Table) -> pa.Table:
        # planes derived deterministically per worker (seeded) — no state
        rng_ = np.random.RandomState(99)
        m = _embeddings_matrix(t)
        planes = rng_.randn(m.shape[1], n_planes)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        bits = (mn @ planes > 0).astype(np.uint64)
        rows_per_band = n_planes // n_bands
        bands_m = bits.reshape(len(mn), n_bands, rows_per_band)
        weights = (1 << np.arange(rows_per_band, dtype=np.uint64))
        bh = (bands_m * weights).sum(axis=2).astype(np.uint64)  # (n, bands)
        n = len(mn)
        parent = np.repeat(np.arange(n), n_bands)
        bands = np.tile(np.arange(n_bands, dtype=np.uint64), n)
        bk = (bh.ravel() * _MIX2 + bands).astype(np.int64)
        vec_ids = t["vec_id"]
        if isinstance(vec_ids, pa.ChunkedArray):
            vec_ids = vec_ids.combine_chunks()
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({
            "bk": pa.array(bk),
            "vec_id": vec_ids.take(pa.array(parent)),
            "embedding": emb.take(pa.array(parent)),
        })

    empty = pa.table({"vec_a": pa.array([], pa.int64()),
                      "vec_b": pa.array([], pa.int64())})

    def pairs_bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("bk", "ascending"),
                                              ("vec_id", "ascending")])
        s = t.take(order)
        bk = np.asarray(s["bk"].to_numpy(zero_copy_only=False))
        ids = np.asarray(s["vec_id"].to_numpy(zero_copy_only=False))
        mall = _embeddings_matrix(s)
        mall = mall / np.maximum(np.linalg.norm(mall, axis=1, keepdims=True),
                                 1e-12)
        n = len(ids)
        newg = np.ones(n, dtype=bool)
        newg[1:] = bk[1:] != bk[:-1]
        starts = np.nonzero(newg)[0]
        sizes = np.diff(np.append(starts, n))
        acc_a, acc_b = [], []
        for gi in np.nonzero(sizes >= 2)[0]:
            sl = slice(starts[gi], starts[gi] + sizes[gi])
            gids, gm = ids[sl], mall[sl]
            m = len(gids)
            if m > max_bucket_rows:
                # degenerate group: exact cosine against the min-id HUB
                # only (one matvec) instead of the m×m gram matrix
                _LOG.warning(
                    "embedding LSH bucket of %d rows exceeds cap %d: "
                    "star-verifying against hub vec instead of %d all-pairs",
                    m, max_bucket_rows, m * (m - 1) // 2)
                sims = gm @ gm[0]
                keep = (sims >= threshold) & (np.arange(m) != 0)
                a = np.full(int(keep.sum()), gids[0])
                b = gids[keep]
            else:
                sims = gm @ gm.T
                ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
                a, b = gids[ia], gids[ib]
            acc_a.append(np.minimum(a, b))
            acc_b.append(np.maximum(a, b))
        if not acc_a:
            return empty
        return pa.table({"vec_a": pa.array(np.concatenate(acc_a).astype(np.int64)),
                         "vec_b": pa.array(np.concatenate(acc_b).astype(np.int64))})

    sigs = emb_ds.map_batches(sign_bands, batch_format="pyarrow")
    tables = keyed_exchange(sigs, "bk", pairs_bucket, empty_result=empty)
    if not tables:
        return empty
    t = pa.concat_tables(tables).combine_chunks()
    return (t.group_by(["vec_a", "vec_b"])
            .aggregate([]).sort_by([("vec_a", "ascending"),
                                    ("vec_b", "ascending")]))


def q_embedding_neardup(sf_dir: str, threshold: float = 0.9,
                        n_plant: int = 8,
                        plant_offset: int = 10_000_000) -> pa.Table:
    """Near-duplicate embedding pairs, with EXACT copies of the first
    ``n_plant`` vectors planted in-query (vec_id + offset) so the driver
    check is non-empty AND oracle-checkable: identical vectors carry
    identical hyperplane signatures, so banding recall on the planted
    pairs is exactly 1.0 and the family's output equals brute-force SQL
    over the augmented table (the synthetic data's max natural cosine is
    ~0.51 at sf0.01, far below the threshold — only planted pairs
    qualify, in both float dialects)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["vec_id"], n_plant))
        if not sel.num_rows:
            return t
        copy = pa.table({
            "vec_id": pc.add(sel["vec_id"], pa.scalar(plant_offset, pa.int64())),
            "embedding": sel["embedding"],
        })
        return pa.concat_tables([t.select(["vec_id", "embedding"]), copy])

    return embedding_neardup_pairs(
        ds.map_batches(plant, batch_format="pyarrow"), threshold=threshold)


def q_ann_lsh(sf_dir: str, k: int = 10, n_queries: int = 5, n_planes: int = 12) -> pa.Table:
    """LSH-bucketed ANN (the scale path): random-hyperplane signatures
    co-locate similar vectors; exact rerank within matching buckets.
    Returns (query_id, vec_id, score) with recall < 1 by design —
    rows-only check; accuracy asserted against brute force in tests."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"
    )).sort_by([("vec_id", "ascending")])
    qm = _embeddings_matrix(head)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ids = head["vec_id"].to_pylist()
    rng = np.random.RandomState(99)
    planes = rng.randn(qm.shape[1], n_planes)
    q_sig = (qn @ planes > 0).astype(np.uint32)
    q_sig = (q_sig * (1 << np.arange(n_planes, dtype=np.uint32))).sum(axis=1)
    q_ref = ray.put((q_ids, qn, planes, q_sig))

    def bucket_topk(t: pa.Table) -> pa.Table:
        q_ids_, qn_, planes_, q_sig_ = ray.get(q_ref)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sig = (mn @ planes_ > 0).astype(np.uint32)
        sig = (sig * (1 << np.arange(planes_.shape[1], dtype=np.uint32))).sum(axis=1)
        vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        out_q, out_v, out_s = [], [], []
        # vectorized popcount over the (nq, batch) xor matrix: byte view +
        # 8-bit lookup table (no per-element Python)
        xor_m = sig[None, :].astype(np.uint32) ^ q_sig_[:, None].astype(np.uint32)
        ham_m = _POP8[xor_m.view(np.uint8).reshape(*xor_m.shape, 4)].sum(axis=-1)
        for qi in range(len(q_sig_)):
            # candidates: hamming distance ≤ 4 of 12 planes (recall/scan
            # tradeoff: ~0.65 recall at ~20% of vectors scanned)
            cand = np.nonzero(ham_m[qi] <= 4)[0]
            if len(cand) == 0:
                continue
            scores = mn[cand] @ qn_[qi]
            kk = min(k, len(cand))
            top = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([q_ids_[qi]] * kk)
            out_v.extend(vec_ids[cand][top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = _gather(emb_ds.map_batches(bucket_topk, batch_format="pyarrow"))
    import pandas as pd

    if not partials.num_rows:
        return partials
    df = partials.to_pandas()
    df = (df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=True).head(k))
    df["score"] = df["score"].round(6)
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _train_ivf_quantizer(emb_ds, n_lists: int) -> np.ndarray:
    """Seeded k-means coarse quantizer on a deterministic sample (first 512
    vec_ids, sorted — tiny, driver-side).  Returns normalized centroids."""
    sample = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 512)), batch_format="pyarrow"
    )).sort_by([("vec_id", "ascending")])
    sm = _embeddings_matrix(sample)
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(7)
    centroids = sm[rng.choice(len(sm), size=min(n_lists, len(sm)), replace=False)]
    for _ in range(8):  # Lloyd iterations, cosine metric on normalized vecs
        assign = np.argmax(sm @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sm[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def ivf_build(sf_dir: str, index_dir: str, n_lists: int = 16) -> np.ndarray:
    """Build a PARTITIONED IVF index: embeddings written as hive-partitioned
    parquet (one directory per inverted list) + the centroid matrix.

    This is the I/O half of the IVF scale path: ``ivf_search`` then reads
    ONLY the probed lists' partitions — at 100 TB an ``n_probe/n_lists``
    fraction of the bytes, instead of scanning everything and pruning in
    compute (which ``q_ann_ivf`` does)."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = _train_ivf_quantizer(emb_ds, n_lists)
    bcast = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(bcast)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(mn @ cents.T, axis=1).astype(np.int64)
        return t.append_column("list_id", pa.array(lists))

    # build into a tmp dir + atomic rename: a crashed build must not leave
    # partial partitions a rebuild would APPEND duplicate rows next to
    import shutil

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    emb_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["list_id"])
    np.save(os.path.join(tmp_dir, "centroids.npy"), centroids)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return centroids


def ivf_search(index_dir: str, queries: np.ndarray, q_ids: list,
               *, k: int = 10, n_probe: int = 4) -> pa.Table:
    """Search a partitioned IVF index: reads ONLY the union of the queries'
    ``n_probe`` nearest lists (partition-pruned ``read_parquet``), scores
    each batch against the broadcast query matrix, exact-merges top-k."""
    import glob as _glob

    import ray
    import ray.data

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True),
                              1e-12)
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    needed = sorted({int(x) for x in q_lists.ravel()})
    files = [f for li in needed
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"list_id={li}", "*.parquet")))]
    if not files:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    # hive partition values come back as a list_id column automatically
    ds = ray.data.read_parquet(files)
    bcast = ray.put((list(q_ids), qn, q_lists))

    def probe(t: pa.Table) -> pa.Table:
        q_ids_, qn_, q_lists_ = ray.get(bcast)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        larr = t["list_id"]
        if isinstance(larr, pa.ChunkedArray):
            larr = larr.combine_chunks()
        lists = np.asarray(pc.cast(larr, pa.int64())
                           .to_numpy(zero_copy_only=False), dtype=np.int64)
        vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids_)):
            cand = np.nonzero(np.isin(lists, q_lists_[qi]))[0]
            if len(cand) == 0:
                continue
            scores = mn[cand] @ qn_[qi]
            kk = min(k, len(cand))
            top = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([q_ids_[qi]] * kk)
            out_v.extend(vec_ids[cand][top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = _gather(ds.map_batches(probe, batch_format="pyarrow"))
    if not partials.num_rows:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    import pandas as pd  # noqa: F401

    df = partials.to_pandas()
    df = (df.sort_values(["query_id", "score", "vec_id"],
                         ascending=[True, False, True])
            .groupby("query_id", sort=True).head(k))
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["query_id", "vec_id"]],
                                preserve_index=False)


def train_pq_codebooks(emb_ds, m_sub: int = 8, ksub: int = 16,
                       iters: int = 8) -> np.ndarray:
    """Product-quantization codebooks from the deterministic 512-row
    sample (the IVF trainer's seed/sample discipline): the d-dim space
    splits into ``m_sub`` contiguous subspaces, each with its own
    ``ksub``-centroid L2 k-means run on the sample's normalized
    subvectors.  Returns (m_sub, ksub, d // m_sub) float64.  Seeded
    RandomState per subspace — no global RNG, byte-identical across
    runs/partitionings (the sample is id-sorted)."""
    sample = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 512)),
        batch_format="pyarrow")).sort_by([("vec_id", "ascending")])
    sm = _embeddings_matrix(sample)
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-12)
    d = sm.shape[1]
    if d % m_sub:
        raise ValueError(f"PQ: dim {d} not divisible by m_sub={m_sub}")
    dsub = d // m_sub
    books = np.empty((m_sub, ksub, dsub))
    for m in range(m_sub):
        sub = sm[:, m * dsub:(m + 1) * dsub]
        rng = np.random.RandomState(11 + m)
        cb = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                            replace=False)].copy()
        for _ in range(iters):  # Lloyd, L2 metric on subvectors
            d2 = (sub @ cb.T) - 0.5 * (cb * cb).sum(axis=1)
            assign = np.argmax(d2, axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[m, :len(cb)] = cb
        if len(cb) < ksub:  # degenerate tiny sample: repeat last centroid
            books[m, len(cb):] = cb[-1]
    return books


def q_ann_pq(sf_dir: str, k: int = 10, n_queries: int = 5,
             m_sub: int = 8, ksub: int = 16, rerank: int = 4) -> pa.Table:
    """Product-quantization ANN (the memory-compression scale path next
    to IVF's I/O pruning): vectors encode to ``m_sub`` uint8 codes —
    64-dim float32 → 8 bytes, 32× smaller, the representation that keeps
    a 10^12-vector index in cluster RAM — and queries score candidates
    via ADC (asymmetric distance computation): one (m_sub × ksub) lookup
    table of query-subvector · codebook dot products per query, then the
    approximate score of a row is ``Σ_m LUT[m, code_m]`` — a pure gather
    + sum, no float multiply per candidate.

    Per batch: encode (argmax of sub @ cb.T − ½‖cb‖², the L2 assignment),
    ADC-score all rows for all queries in one vectorized gather, keep the
    top ``rerank·k`` per query, EXACT-rescore only those with the true
    vectors (still in hand per batch), emit top-k.  The driver merges
    nq × k × n_batches exact-scored rows.  Approximate by construction →
    rows-only driver check; recall vs brute force + determinism are
    pinned in tests."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)),
        batch_format="pyarrow")).sort_by([("vec_id", "ascending")])
    qn = _embeddings_matrix(head)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    q_ids = head["vec_id"].to_pylist()
    books = train_pq_codebooks(emb_ds, m_sub=m_sub, ksub=ksub)
    dsub = books.shape[2]
    # per-query ADC tables: lut[q, m, j] = q_sub(m) · books[m, j]
    lut = np.einsum("qmd,mjd->qmj",
                    qn.reshape(len(qn), m_sub, dsub), books)
    bcast = ray.put((q_ids, qn, books, lut))

    def probe(t: pa.Table) -> pa.Table:
        q_ids_, qn_, books_, lut_ = ray.get(bcast)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n, d = mn.shape
        sub = mn.reshape(n, m_sub, dsub)
        # encode: L2 assignment per subspace, all subspaces at once
        scores_sub = np.einsum("nmd,mjd->nmj", sub, books_) \
            - 0.5 * (books_ * books_).sum(axis=2)[None, :, :]
        codes = np.argmax(scores_sub, axis=2)  # (n, m_sub)
        vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        out_q, out_v, out_s = [], [], []
        marange = np.arange(m_sub)
        for qi in range(len(q_ids_)):  # queries are a handful
            approx = lut_[qi][marange[None, :], codes].sum(axis=1)
            cand = min(rerank * k, n)
            top = np.argpartition(-approx, cand - 1)[:cand]
            exact = mn[top] @ qn_[qi]
            kk = min(k, cand)
            best = np.argpartition(-exact, kk - 1)[:kk]
            out_q.extend([q_ids_[qi]] * kk)
            out_v.extend(vec_ids[top][best].tolist())
            out_s.extend(exact[best].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = _gather(emb_ds.map_batches(probe, batch_format="pyarrow"))
    import pandas as pd

    df = partials.to_pandas()
    df = (df.sort_values(["query_id", "score", "vec_id"],
                         ascending=[True, False, True])
            .groupby("query_id", sort=True).head(k))
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["query_id", "vec_id"]],
                                preserve_index=False)


def q_ann_ivf_partitioned(sf_dir: str, k: int = 10, n_queries: int = 5,
                          n_lists: int = 16, n_probe: int = 4) -> pa.Table:
    """IVF with PARTITION-PRUNED I/O: build (or reuse) the hive-partitioned
    index under /tmp, then search reading only the probed lists.  Same
    quantizer seed/sample as ``q_ann_ivf`` ⇒ identical results; what
    changes is the bytes read."""
    import hashlib

    tag = hashlib.md5(f"{os.path.realpath(sf_dir)}:{n_lists}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "yaschva_ivf", tag)
    if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
        ivf_build(sf_dir, index_dir, n_lists)
    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"
    )).sort_by([("vec_id", "ascending")])
    qm = _embeddings_matrix(head)
    return ivf_search(index_dir, qm, head["vec_id"].to_pylist(),
                      k=k, n_probe=n_probe)


def q_ann_ivf(sf_dir: str, k: int = 10, n_queries: int = 5, n_lists: int = 16,
              n_probe: int = 4) -> pa.Table:
    """IVF ANN (the other scale path): seeded k-means coarse quantizer
    trained on a sample (driver-side, tiny), centroids broadcast; each batch
    assigns vectors to lists and only vectors in the query's ``n_probe``
    nearest lists are scored.  At scale the assignment doubles as the
    partitioning key (groupby list-id → co-located exact rerank)."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"
    )).sort_by([("vec_id", "ascending")])
    qn = _embeddings_matrix(head)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    q_ids = head["vec_id"].to_pylist()

    centroids = _train_ivf_quantizer(emb_ds, n_lists)
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    bcast = ray.put((q_ids, qn, centroids, q_lists))

    def probe(t: pa.Table) -> pa.Table:
        q_ids_, qn_, cents, q_lists_ = ray.get(bcast)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(mn @ cents.T, axis=1)
        vec_ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids_)):
            cand = np.nonzero(np.isin(lists, q_lists_[qi]))[0]
            if len(cand) == 0:
                continue
            scores = mn[cand] @ qn_[qi]
            kk = min(k, len(cand))
            top = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([q_ids_[qi]] * kk)
            out_v.extend(vec_ids[cand][top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = _gather(emb_ds.map_batches(probe, batch_format="pyarrow"))
    import pandas as pd

    if not partials.num_rows:
        return partials
    df = partials.to_pandas()
    df = (df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=True).head(k))
    df = df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["query_id", "vec_id"]], preserve_index=False)


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}


class LangIdStage:
    """Actor-pool language-ID heuristic: stopword-hit argmax (compiled sets
    once per actor).  A deterministic n-gram heuristic, not a model."""

    def __init__(self):
        from ..engine.sketches import limit_worker_threads

        limit_worker_threads()
        self.sets = {k: sorted(v) for k, v in _STOPWORDS.items()}
        self.langs = sorted(self.sets)
        # one combined vocabulary + a (word → language) membership matrix:
        # a single string index_in per batch replaces one string is_in PER
        # LANGUAGE (words shared across languages — 'la' in es+fr — get a
        # 1 in every owning column, so multi-membership counts are exact)
        self.words = sorted({w for v in self.sets.values() for w in v})
        widx = {w: i for i, w in enumerate(self.words)}
        self.member = np.zeros((len(self.words) + 1, len(self.langs)),
                               dtype=np.int64)  # last row: non-stopword
        for li, lang in enumerate(self.langs):
            for w in self.sets[lang]:
                self.member[widx[w], li] = 1
        self.words_arr = pa.array(self.words, pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized: one tokenize pass (polars), one is_in per
        language over the flat token column, segmented sums, first-max
        argmax (ties keep the earlier language; zero hits ⇒ unknown) —
        identical decisions to the per-row loop it replaced."""
        s = _pl_text(batch["text"])
        toks = s.str.to_lowercase().str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        # empty_as_null pinned against the polars 2.0 default flip (the
        # null row is dropped either way; see _token_hash_segments)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        n = batch.num_rows
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(flat):
            fa = flat.to_arrow()  # zero-copy out of polars
            if isinstance(fa, pa.ChunkedArray):
                fa = fa.combine_chunks()
            wid = pc.fill_null(
                pc.index_in(fa, value_set=self.words_arr),
                len(self.words)).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            for li in range(len(self.langs)):
                # trailing dummy 0 lets a batch-final empty doc's start ==
                # len(hits) without clamping (clamped starts excluded the
                # last non-empty doc's final token from its count); empty
                # docs' spurious hits[start] values are masked below
                hits = np.append(self.member[:, li][wid], 0)
                seg = np.add.reduceat(hits, starts)
                counts[:, li] = np.where(lens > 0, seg, 0)
        best = np.argmax(counts, axis=1)  # first max (= per-row tie-break)
        out = [self.langs[b] if counts[i, b] > 0 else "unknown"
               for i, b in enumerate(best)]
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(out, pa.string())})


def q_langid_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _gather(ds.map_batches(LangIdStage(), batch_format="pyarrow"))
    return out.sort_by([("doc_id", "ascending")])


def vocab_top_tokens_from_ds(ds, k: int = 100,
                             num_buckets: int | None = None) -> pa.Table:
    """Corpus vocabulary: EXACT top-k tokens by frequency (the
    tokenizer-training / corpus-stats building block).  Per-block partial
    counts (one polars tokenize + value_counts pass — one row per DISTINCT
    token per block, the combiner) → raw-task hash exchange on the token →
    per-bucket group-sum + LOCAL top-k → driver merge of ≤ B·k rows.

    Exactness: a token lives in exactly one bucket, so its global count is
    complete there; a token cut from its bucket's local top-k (ordered by
    (n DESC, token ASC)) is beaten by k tokens that also beat it globally
    — the global top-k is always contained in the union of local top-ks."""
    import polars as pl

    from ..engine.exchange import keyed_exchange

    def partial_counts(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        vc = flat.value_counts()
        arrow = vc.to_arrow()
        return pa.table({"token": arrow["t"].cast(pa.string()),
                         "n": arrow["count"].cast(pa.int64())})

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def topk_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("n", "sum")])
        g = pa.table({"token": g["token"], "n": g["n_sum"].cast(pa.int64())})
        order = pc.sort_indices(g, sort_keys=[("n", "descending"),
                                              ("token", "ascending")])
        return g.take(order.slice(0, min(k, len(order))))

    parts = keyed_exchange(ds.map_batches(partial_counts,
                                          batch_format="pyarrow"),
                           "token", topk_bucket, num_buckets=num_buckets,
                           empty_result=empty)
    if not parts:
        return empty
    merged = pa.concat_tables(parts).combine_chunks()
    order = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                               ("token", "ascending")])
    return merged.take(order.slice(0, min(k, len(order))))


def q_vocab_top_tokens(sf_dir: str, k: int = 100) -> pa.Table:
    return vocab_top_tokens_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=k)


def vocab_counts_from_ds(ds, num_buckets: int | None = None) -> pa.Table:
    """FULL corpus vocabulary counts (the uncapped sibling of
    ``vocab_top_tokens_from_ds``): per-block value_counts partials →
    keyed hash exchange on the token → per-bucket group-sum.  The result
    is one row per DISTINCT corpus token — natural-language vocabularies
    are millions of rows (tens of MB), a documented broadcastable small
    side, not corpus-sized."""
    import polars as pl  # noqa: F401  (kernel dependency made explicit)

    from ..engine.exchange import keyed_exchange

    def partial_counts(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        vc = flat.value_counts()
        arrow = vc.to_arrow()
        return pa.table({"token": arrow["t"].cast(pa.string()),
                         "n": arrow["count"].cast(pa.int64())})

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("n", "sum")])
        return pa.table({"token": g["token"],
                         "n": g["n_sum"].cast(pa.int64())})

    parts = keyed_exchange(ds.map_batches(partial_counts,
                                          batch_format="pyarrow"),
                           "token", sum_bucket, num_buckets=num_buckets,
                           empty_result=empty)
    return (pa.concat_tables(parts).combine_chunks() if parts else empty)


def q_token_stats(sf_dir: str) -> pa.Table:
    """Per-doc token statistics for repetition/rarity filtering — all
    EXACT INTEGERS so the DuckDB mirror is hash-stable: ``n_tokens``,
    ``n_distinct`` (distinct tokens in the doc — a low distinct/total
    ratio flags boilerplate repetition), and ``freq_sum`` (sum over the
    doc's token OCCURRENCES of each token's GLOBAL corpus count — the
    integer analog of unigram log-likelihood; rare-token-heavy docs score
    low).  Two-phase: the uncapped vocab exchange, broadcast once via
    ``ray.put``, then one tokenize pass computes all three per batch
    (``index_in`` against the vocab + an integer take + ``reduceat``)."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = vocab_counts_from_ds(ds)
    order = pc.sort_indices(vocab["token"])
    words = vocab["token"].take(order)
    counts = vocab["n"].take(order).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    bref = ray.put((words, counts))

    def stats(t: pa.Table) -> pa.Table:
        words_, counts_ = ray.get(bref)
        s = _pl_text(t["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        n_distinct = toks.list.n_unique().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        if len(flat) and len(words_):
            fa = flat.to_arrow()
            if isinstance(fa, pa.ChunkedArray):
                fa = fa.combine_chunks()
            wid = pc.index_in(fa, value_set=words_) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            per_tok = np.append(counts_[wid], 0)  # vocab covers the corpus
            fsum = np.where(lens > 0,
                            np.add.reduceat(per_tok, starts), 0)
        else:
            fsum = np.zeros(len(lens), dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(lens),
                         "n_distinct": pa.array(n_distinct),
                         "freq_sum": pa.array(fsum.astype(np.int64))})

    return _gather(ds.map_batches(stats, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


def _batch_bigrams(texts) -> tuple[pa.Array, np.ndarray]:
    """Flat adjacent-token bigram strings ("tok_i tok_i+1") for a batch of
    texts plus the per-doc bigram counts ``max(n_tokens - 1, 0)`` — one
    tokenize pass, bigrams formed by offset arithmetic on the flat token
    array (pairs crossing a doc boundary are masked out), joined with one
    vectorized ``binary_join_element_wise``."""
    s = _pl_text(texts)
    toks = s.str.extract_all(TOKEN_RE)
    lens = toks.list.len().to_numpy().astype(np.int64)
    nb = np.maximum(lens - 1, 0)
    flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    if n < 2 or int(nb.sum()) == 0:
        return pa.array([], pa.string()), nb
    keep = np.ones(n - 1, dtype=bool)
    last = np.cumsum(lens) - 1          # last token index of each doc
    last = last[(last >= 0) & (last < n - 1)]
    keep[last] = False
    mask = pa.array(keep)
    left = flat.slice(0, n - 1).filter(mask)
    right = flat.slice(1, n - 1).filter(mask)
    sep = pa.scalar(" ", type=flat.type)   # polars emits large_string
    joined = pc.binary_join_element_wise(left, right, sep)
    return joined.cast(pa.string()), nb    # one schema across all batches


def bigram_model_from_ds(ds, top_m: int = 1024,
                         num_buckets: int | None = None) -> pa.Table:
    """Global top-M bigram language model (count-based): per-block bigram
    value-count partials → keyed hash exchange on the bigram →
    per-bucket group-sum → per-bucket top-M.  Each bigram lands in
    exactly one bucket, so the global top-M is contained in the union of
    the per-bucket top-Ms; the driver merges only ``num_buckets × M``
    rows and never sees the full bigram vocabulary (unbounded at 100 TB,
    unlike the unigram vocab).  Ties rank by (count DESC, bigram ASC) so
    the model is deterministic under any partitioning."""
    from ..engine.exchange import keyed_exchange

    def partial_counts(t: pa.Table) -> pa.Table:
        bg, _ = _batch_bigrams(t["text"])
        g = pa.table({"bg": bg}).group_by("bg").aggregate([("bg", "count")])
        return pa.table({"bg": g["bg"],
                         "n": g["bg_count"].cast(pa.int64())})

    empty = pa.table({"bg": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def topm_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("bg").aggregate([("n", "sum")])
        g = pa.table({"bg": g["bg"], "n": g["n_sum"].cast(pa.int64())})
        order = pc.sort_indices(g, sort_keys=[("n", "descending"),
                                              ("bg", "ascending")])
        return g.take(order.slice(0, top_m))

    parts = keyed_exchange(ds.map_batches(partial_counts,
                                          batch_format="pyarrow"),
                           "bg", topm_bucket, num_buckets=num_buckets,
                           empty_result=empty)
    merged = (pa.concat_tables([p for p in parts if p.num_rows])
              .combine_chunks() if any(p.num_rows for p in parts) else empty)
    order = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                               ("bg", "ascending")])
    return merged.take(order.slice(0, top_m))


def q_lm_bigram_score(sf_dir: str, top_m: int = 1024) -> pa.Table:
    """CCNet-style n-gram language-model fluency scoring with a PRUNED
    model — the bigram sibling of ``token_stats``'s unigram rarity, and
    the shape real pipelines use (KenLM scoring with a fixed model): the
    corpus trains a top-M bigram count model (heavy hitters only — the
    full bigram vocabulary is unbounded at scale, the pruned model is a
    broadcastable ~top_m rows), then ONE scoring pass computes per doc
    all-integer features: ``n_bigrams``, ``oov_bigrams`` (bigram
    occurrences outside the model — high OOV ⇒ disfluent/rare text) and
    ``model_hit_sum`` (sum of model counts over the doc's bigram
    occurrences — the integer analog of a bigram log-likelihood).
    Model broadcast once via ``ray.put``; scoring is tokenize + offset
    bigrams + ``index_in`` + ``reduceat`` per batch, no Python loop."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = bigram_model_from_ds(ds, top_m=top_m)
    mcounts = model["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    bref = ray.put((model["bg"].combine_chunks(), mcounts))

    def score(t: pa.Table) -> pa.Table:
        model_bg, model_n = ray.get(bref)
        bg, nb = _batch_bigrams(t["text"])
        starts = np.concatenate([[0], np.cumsum(nb)])[:-1]
        if len(bg) and len(model_bg):
            wid = pc.fill_null(pc.index_in(bg, value_set=model_bg), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            hit = wid >= 0
            per_hit = np.where(hit, model_n[np.maximum(wid, 0)], 0)
            hit_sum = np.where(nb > 0,
                               np.add.reduceat(np.append(per_hit, 0),
                                               starts), 0)
            oov = np.where(nb > 0,
                           np.add.reduceat(
                               np.append((~hit).astype(np.int64), 0),
                               starts), 0)
        else:
            hit_sum = np.zeros(len(nb), dtype=np.int64)
            oov = nb.copy()
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pa.array(nb),
                         "oov_bigrams": pa.array(oov.astype(np.int64)),
                         "model_hit_sum": pa.array(hit_sum.astype(np.int64))})

    return _gather(ds.map_batches(score, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


_QUALITY_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that"]
_STOP_RE = r"(?i)\b(?:" + "|".join(_QUALITY_STOPWORDS) + r")\b"


def q_clean_corpus(sf_dir: str, min_tokens: int = 5,
                   max_digit: float = 0.3,
                   max_punct: float = 0.3) -> pa.Table:
    """C4-style corpus cleaning — the composed filter a training-data
    pipeline actually runs, as ONE fused batch pass (no per-feature
    re-scan): language-ID + quality ratios + the keep predicate
    (``n_tokens >= 5``, digit/punct ratio caps, identified language)
    computed together; only surviving rows leave the stage.  Ratios are
    rounded to 6 dp BEFORE comparing so the boundary decisions match
    the SQL mirror bit-for-bit."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    langid = LangIdStage()

    def clean(t: pa.Table) -> pa.Table:
        lang = langid(t)["lang_pred"]
        txt = t["text"]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tokens = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        denom_c = pc.cast(pc.max_element_wise(
            n_chars, pa.scalar(1, pa.int64())), pa.float64())
        digit_ratio = pc.round(pc.divide(pc.cast(
            pc.count_substring_regex(txt, r"[0-9]").cast(pa.int64()),
            pa.float64()), denom_c), ndigits=6)
        punct_ratio = pc.round(pc.divide(pc.cast(
            pc.count_substring_regex(txt, r"[^\w\s]").cast(pa.int64()),
            pa.float64()), denom_c), ndigits=6)
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_tokens, min_tokens),
                    pc.not_equal(lang, "unknown")),
            pc.and_(pc.less_equal(digit_ratio, max_digit),
                    pc.less_equal(punct_ratio, max_punct)))
        out = pa.table({"doc_id": t["doc_id"], "lang_pred": lang,
                        "n_tokens": n_tokens})
        return out.filter(pc.fill_null(keep, False))

    return _gather(ds.map_batches(clean, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


def q_quality_documents(sf_dir: str) -> pa.Table:
    """Vectorized quality features (length / punct / stopword / digit
    ratios per the training-data brief) — all via Arrow RE2 kernels,
    SQL-mirrorable (DuckDB uses RE2 too, so the regexes agree exactly)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tokens = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        n_digits = pc.count_substring_regex(txt, r"[0-9]").cast(pa.int64())
        n_punct = pc.count_substring_regex(txt, r"[^\w\s]").cast(pa.int64())
        n_stop = pc.count_substring_regex(txt, _STOP_RE).cast(pa.int64())
        denom_c = pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())),
                          pa.float64())
        denom_t = pc.cast(pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64())),
                          pa.float64())
        rnd = lambda x, d: pc.round(pc.divide(pc.cast(x, pa.float64()), d),  # noqa: E731
                                    ndigits=6)
        return pa.table({"doc_id": t["doc_id"], "n_chars": n_chars,
                         "n_tokens": n_tokens,
                         "digit_ratio": rnd(n_digits, denom_c),
                         "punct_ratio": rnd(n_punct, denom_c),
                         "stopword_ratio": rnd(n_stop, denom_t)})

    return _gather(ds.map_batches(feats, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_DECON_SEED = 17
_DECON_PLANT_PREFIX = "decon plant alpha beta"


def decontaminate_from_ds(ds, bench_texts: list, k: int = 8):
    """Training-data decontamination: drop every document that shares a
    token ``k``-gram with the benchmark/eval set (the standard n-gram
    overlap rule used to keep eval data out of training corpora).

    Scale shape: the benchmark side is SMALL by definition (eval sets are
    MBs against a 100 TB corpus) — its distinct shingle hashes are computed
    once on the driver, sorted, and broadcast via ``ray.put``; each batch
    then does one vectorized shingle pass (the shared
    ``_token_hash_segments``/``_batch_shingle_hashes`` kernels) plus a
    ``searchsorted`` membership probe and a ``reduceat`` per-doc any().
    No shuffle, no per-row Python.  Docs shorter than ``k`` tokens fall
    back to one whole-doc shingle (the kernels' documented behavior, which
    the SQL mirror reproduces).  Returns a Dataset of surviving doc_ids.
    """
    import ray

    th, off, lens = _token_hash_segments(bench_texts, seed=_DECON_SEED)
    sh, _ = _batch_shingle_hashes(th, off, lens, n=k)
    bench = np.unique(sh)  # sorted, deduped
    ref = ray.put(bench)

    def drop_contaminated(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        b = ray.get(ref)
        th_, off_, lens_ = _token_hash_segments(t["text"],
                                                seed=_DECON_SEED)
        sh_, s_off = _batch_shingle_hashes(th_, off_, lens_, n=k)
        if len(b):
            idx = np.minimum(np.searchsorted(b, sh_), len(b) - 1)
            hit = (b[idx] == sh_).astype(np.int64)
        else:
            hit = np.zeros(len(sh_), dtype=np.int64)
        # every doc owns >=1 shingle (kernel guarantee) so the segment
        # starts are strictly increasing and reduceat is safe
        seg = np.add.reduceat(hit, s_off[:-1])
        return t.select(["doc_id"]).filter(pa.array(seg == 0))

    return ds.map_batches(drop_contaminated, batch_format="pyarrow")


def q_decontaminate(sf_dir: str, k: int = 8) -> pa.Table:
    """Decontamination demo with a deterministic, SQL-mirrorable setup:
    the "benchmark" is docs 0..9 of the corpus itself, and 8 contaminated
    rows are PLANTED (doc_id+20M, a fixed 4-token prefix prepended to an
    eval doc's text) so true positives beyond the eval docs' self-matches
    demonstrably get caught.  Output: surviving doc_ids over the augmented
    table.  The hash-shingle membership is exact on this fixture (64-bit
    shingle hashes over ~10^5 distinct shingles; the string-k-gram DuckDB
    oracle is hash-equal at every tested sf)."""
    import ray.data

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    head = _gather(ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 10)),
        batch_format="pyarrow")).sort_by([("doc_id", "ascending")])
    bench_texts = head["text"].to_pylist()
    plant = head.filter(pc.less(head["doc_id"], 8))
    planted = pa.table({
        "doc_id": pa.array([i + 20_000_000 for i in
                            plant["doc_id"].to_pylist()], pa.int64()),
        "text": pa.array([f"{_DECON_PLANT_PREFIX} {t}" for t in
                          plant["text"].to_pylist()], pa.string())})
    aug = ds.union(ray.data.from_arrow(planted))
    return _gather(decontaminate_from_ds(aug, bench_texts, k=k)).sort_by(
        [("doc_id", "ascending")])


def bench_shingle_ref(bench_texts: list, k: int = 8):
    """Broadcast the benchmark set's sorted distinct shingle hashes once
    (the small side of decontamination)."""
    import ray

    th, off, lens = _token_hash_segments(bench_texts, seed=_DECON_SEED)
    bsh, _ = _batch_shingle_hashes(th, off, lens, n=k)
    return ray.put(np.unique(bsh))


def make_clean_decon_stage(bref, min_tokens: int = 5, max_digit: float = 0.3,
                           max_punct: float = 0.3, k: int = 8):
    """The fused clean+decontaminate batch stage shared by
    ``q_curate_corpus`` and the ``curate`` CLI: quality ratios + langid +
    keep predicate + bench shingle membership probe in ONE pass; only
    surviving rows (doc_id, text, lang_pred, n_tokens) leave."""
    import ray

    langid = LangIdStage()

    def clean_and_decon(t: pa.Table) -> pa.Table:
        txt = t["text"]
        lang = langid(t)["lang_pred"]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tokens = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        denom = pc.cast(pc.max_element_wise(
            n_chars, pa.scalar(1, pa.int64())), pa.float64())
        digit = pc.round(pc.divide(pc.cast(pc.count_substring_regex(
            txt, r"[0-9]").cast(pa.int64()), pa.float64()), denom), ndigits=6)
        punct = pc.round(pc.divide(pc.cast(pc.count_substring_regex(
            txt, r"[^\w\s]").cast(pa.int64()), pa.float64()), denom),
            ndigits=6)
        keep = pc.fill_null(pc.and_(
            pc.and_(pc.greater_equal(n_tokens, min_tokens),
                    pc.not_equal(lang, "unknown")),
            pc.and_(pc.less_equal(digit, max_digit),
                    pc.less_equal(punct, max_punct))), False)
        kept = pa.table({"doc_id": t["doc_id"], "text": txt,
                         "lang_pred": lang,
                         "n_tokens": n_tokens}).filter(keep)
        if kept.num_rows == 0:
            return kept
        b = ray.get(bref)
        th_, off_, lens_ = _token_hash_segments(kept["text"],
                                                seed=_DECON_SEED)
        sh_, s_off = _batch_shingle_hashes(th_, off_, lens_, n=k)
        idx = np.minimum(np.searchsorted(b, sh_), max(len(b) - 1, 0))
        hit = ((b[idx] == sh_) if len(b)
               else np.zeros(len(sh_), bool)).astype(np.int64)
        seg = np.add.reduceat(hit, s_off[:-1])
        return kept.filter(pa.array(seg == 0))

    return clean_and_decon


def split_labels(ids: np.ndarray, train_pct: int = 95,
                 salt: int = 7) -> pa.Array:
    """'train'/'val' labels from the Knuth-mix split (shared with
    q_train_val_split's formula — a pure function of doc_id)."""
    h = (ids.astype(np.uint64) * np.uint64(_SPLIT_MULT)
         + np.uint64(salt)) % np.uint64(1 << 32)
    is_train = (h % np.uint64(100)) < train_pct
    return pa.DictionaryArray.from_arrays(
        pa.array((~is_train).astype(np.int8)),
        pa.array(["train", "val"])).cast(pa.string())


def q_curate_corpus(sf_dir: str, min_tokens: int = 5, max_digit: float = 0.3,
                    max_punct: float = 0.3, k: int = 8,
                    train_pct: int = 95, salt: int = 7) -> pa.Table:
    """End-to-end corpus curation — the COMPOSED pipeline a training-data
    team actually runs, as one streaming chain: fused quality/langid clean
    → benchmark decontamination (docs 0..9 as the eval set) → exact-dedup
    keep-canonical → deterministic train/val split.

    Scale shape: ONE scan; clean+decon are fused into a single per-batch
    stage (quality ratios, langid, shingle membership probe against the
    broadcast bench set — only surviving rows leave it); the only wide
    step is the keyed hash exchange for exact dedup, and it moves only
    the text that survived both filters; the split label is a pure map
    over the canonical winners.  Every stage reuses an independently
    oracle-checked operator, and the composition itself is hash-checked
    against the equivalent single SQL statement."""
    from ..engine.exchange import keyed_exchange

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    head = _gather(ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 10)),
        batch_format="pyarrow")).sort_by([("doc_id", "ascending")])
    bref = bench_shingle_ref(head["text"].to_pylist(), k=k)
    clean_and_decon = make_clean_decon_stage(
        bref, min_tokens=min_tokens, max_digit=max_digit,
        max_punct=max_punct, k=k)

    def canonical(t: pa.Table) -> pa.Table:
        # keep the min-doc_id row per exact text (winners, with their
        # carried columns) — the keep-side twin of _dedup_bucket
        from ..engine.joins import _warn_hot_key

        _warn_hot_key(t, "text", "curate_corpus(dedup)", -1)
        tt = t.append_column("__txt", pc.fill_null(t["text"], "")) \
              .append_column("__isn", pc.is_null(t["text"]))
        keep = tt.group_by(["__txt", "__isn"]).aggregate([("doc_id", "min")])
        j = tt.join(keep, keys=["__txt", "__isn"])
        win = j.filter(pc.equal(j["doc_id"], j["doc_id_min"]))
        return win.select(["doc_id", "lang_pred", "n_tokens"])

    filtered = ds.map_batches(clean_and_decon, batch_format="pyarrow")
    tables = keyed_exchange(filtered, "text", canonical)
    if not tables:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang_pred": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64()),
                         "split": pa.array([], pa.string())})
    out = pa.concat_tables(tables).combine_chunks()
    ids = np.asarray(out["doc_id"].to_numpy(zero_copy_only=False))
    return out.append_column(
        "split", split_labels(ids, train_pct=train_pct, salt=salt)).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# RE2 dialect on both sides (Arrow and DuckDB), so the same pattern strings
# are shared verbatim by the engine and the SQL oracle
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3} [0-9]{3}-[0-9]{4}"


def redact_pii_from_ds(ds):
    """PII redaction as one vectorized batch pass: count then replace
    emails, then count then replace phone numbers on the email-redacted
    text (sequential composition keeps the counts unambiguous).  All four
    kernels are Arrow RE2 (``count_substring_regex`` /
    ``replace_substring_regex``) — no per-row Python; at 100 TB this is a
    pure map stage."""
    def redact(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_email = pc.count_substring_regex(txt, PII_EMAIL_RE).cast(pa.int64())
        t1 = pc.replace_substring_regex(txt, PII_EMAIL_RE, "[EMAIL]")
        n_phone = pc.count_substring_regex(t1, PII_PHONE_RE).cast(pa.int64())
        t2 = pc.replace_substring_regex(t1, PII_PHONE_RE, "[PHONE]")
        return pa.table({"doc_id": t["doc_id"],
                         "n_pii": pc.add(n_email, n_phone),
                         "text_redacted": t2})

    return ds.map_batches(redact, batch_format="pyarrow")


def q_redact_pii(sf_dir: str) -> pa.Table:
    """The corpus has no natural PII, so 12 PII-bearing rows are PLANTED
    (doc_id+30M, an email derived from the row's own doc_id plus a fixed
    phone number appended) — the same in-SQL augmentation the oracle runs,
    so redaction demonstrably fires and every row is hash-checked."""
    import ray.data

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    head = _gather(ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 12)),
        batch_format="pyarrow")).sort_by([("doc_id", "ascending")])
    ids = head["doc_id"].to_pylist()
    planted = pa.table({
        "doc_id": pa.array([i + 30_000_000 for i in ids], pa.int64()),
        "text": pa.array(
            [f"{t} reach user{i}@example.com or call +1 555-0100 now"
             for i, t in zip(ids, head["text"].to_pylist())], pa.string())})
    aug = ds.union(ray.data.from_arrow(planted))
    return _gather(redact_pii_from_ds(aug)).sort_by(
        [("doc_id", "ascending")])


def q_fingerprint_documents(sf_dir: str) -> pa.Table:
    """64-bit content fingerprint per doc (vectorized xxhash via polars) —
    the cheap first stage of any dedup pipeline.  Deterministic."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h = _hash64(txt).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(h)})

    return _gather(ds.map_batches(fp, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


def winnow_fingerprints_batch(texts: list, k: int = 4,
                              window: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS, public algorithm): token k-gram
    rolling hashes → sliding windows of ``window`` consecutive hashes →
    select each window's RIGHTMOST minimum → the doc's fingerprint set is
    the distinct selected hashes.  Guarantees any shared token run of
    length ≥ k + window - 1 contributes at least one shared fingerprint.

    Whole-batch vectorized: one polars tokenize/hash pass, the same
    windowed k-gram mix the minhash kernel uses, one
    ``sliding_window_view`` argmin over the flat hash array (windows
    crossing doc boundaries are computed but never selected).  Returns
    ``(flat sorted-distinct fingerprints, per-doc offsets)``.
    """
    th, offsets, lens = _token_hash_segments(texts, seed=13)
    sh, s_off = _batch_shingle_hashes(th, offsets, lens, n=k)
    n_docs = len(lens)
    m = np.diff(s_off)  # k-gram count per doc (≥1)
    total = len(sh)
    # global window argmins (rightmost min ⇒ argmin over the reversed view)
    if total >= window:
        sw = np.lib.stride_tricks.sliding_window_view(sh, window)
        amin = window - 1 - np.argmin(sw[:, ::-1], axis=1)
        sel_pos_global = np.arange(total - window + 1) + amin
    else:
        sel_pos_global = np.empty(0, dtype=np.int64)
    # per-doc window segments (≥1 per doc; short docs take their min)
    win_counts = np.maximum(m - window + 1, 1)
    w_off = np.concatenate([[0], np.cumsum(win_counts)])
    seg = np.repeat(np.arange(n_docs), win_counts)
    within = np.arange(int(w_off[-1])) - w_off[seg]
    src_window = s_off[seg] + within
    long_doc = m >= window
    sel = np.empty(int(w_off[-1]), dtype=np.int64)
    lmask = long_doc[seg]
    if lmask.any():
        sel[lmask] = sel_pos_global[src_window[lmask]]
    for i in np.nonzero(~long_doc)[0]:  # short docs only (rare)
        s0, s1 = int(s_off[i]), int(s_off[i + 1])
        # rightmost min of the doc's shingles
        sel[w_off[i]] = s1 - 1 - int(np.argmin(sh[s0:s1][::-1]))
    vals = sh[sel]
    # distinct per doc: sort (doc, val), drop adjacent repeats
    order = np.lexsort((vals, seg))
    sseg, svals = seg[order], vals[order]
    keep = np.ones(len(svals), dtype=bool)
    keep[1:] = (sseg[1:] != sseg[:-1]) | (svals[1:] != svals[:-1])
    dseg, dvals = sseg[keep], svals[keep]
    counts = np.bincount(dseg, minlength=n_docs)
    out_off = np.concatenate([[0], np.cumsum(counts)])
    return dvals, out_off


def q_f0_span_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup over the INTERLEAVED north-rule table's text spans:
    synthesize the F0 docs deterministically (input_hint shape —
    ``doc_id, spans: list<struct<kind,text,media_ref,offset>>``), explode
    text spans to (span_key, text) rows in one vectorized pass, and run
    the exchange-based exact dedup — the dedup family operating on the
    interleaved table end-to-end.  The seeded input is WRITTEN to the
    shared oracle path (same bytes as f0_flagship_violations writes —
    identical generator args — so the two queries can share it in either
    execution order) and the DuckDB oracle mirrors the explode + dedup
    (unnest + row_number over PARTITION BY text; null texts — the
    bad_media_ref class keeps kind='text' with text NULL — form one
    duplicate group on both sides)."""
    import pyarrow.parquet as pq
    import ray.data

    from .datagen import make_docs_batch

    n = 20_000 if "0.01" in sf_dir else 5_000
    table = make_docs_batch(np.arange(n), seed=42)
    os.makedirs("/tmp/yaschva_oracle", exist_ok=True)
    pq.write_table(table, "/tmp/yaschva_oracle/f0_docs.parquet")
    k = 8
    ds = ray.data.from_arrow([table.slice(i * len(table) // k,
                                          (i + 1) * len(table) // k
                                          - i * len(table) // k)
                              for i in range(k)])

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        kinds = pc.struct_field(flat, "kind")
        texts = pc.struct_field(flat, "text")
        parents = np.repeat(np.arange(len(t)), lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        within = np.arange(int(lengths.sum())) - np.repeat(starts, lengths)
        doc_ids = t["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        span_key = pc.binary_join_element_wise(
            doc_ids.take(pa.array(parents)),
            pc.cast(pa.array(within), pa.string()), "#")
        out = pa.table({"doc_id": span_key, "text": texts})
        return out.filter(pc.equal(kinds, "text"))

    dup = dedup_exact_from_ds(ds.map_batches(explode, batch_format="pyarrow"))
    return pa.table({"span_key": dup["doc_id"]})


_MEDIA_KINDS = ("image", "audio", "video")
_MEDIA_SPAN_LEN = 1024  # fixed payload length the generator assigns media spans


def q_f0_offset_check(sf_dir: str) -> pa.Table:
    """Span-offset CONTIGUITY validation over the interleaved F0 table —
    the north-rule invariant that spans TILE the document: span 0 starts
    at offset 0 and every later span starts exactly where the previous
    one ended (text spans occupy ``length(text)`` units, media spans a
    fixed 1024).  This is the structural check the per-span schema rules
    can't express (it relates ADJACENT list elements), and it catches
    three planted violation classes: ``neg_offset`` (first offset ≠ 0,
    which also breaks the next adjacency), ``empty_text`` (the stored
    text shrank but the successor's offset didn't move → gap), and
    ``bad_media_ref``/``dangling_media_ref`` (kind='text' with NULL text
    → length unknowable).

    Violation classes emitted per (doc_id, span_idx):
      - ``first_offset_nonzero``: span 0's offset ≠ 0
      - ``unknown_length``: a non-media span with NULL text (length
        indeterminable; the NEXT adjacency is skipped, not flagged —
        SQL NULL-comparison semantics)
      - ``gap_or_overlap``: offset[k] ≠ offset[k-1] + len(span k-1)

    Fully vectorized: one flatten + numpy shifted-compare per batch, no
    per-row Python; parent/within indices via repeat/cumsum (the
    q_f0_span_dedup explode skeleton).  The seeded input is WRITTEN to
    the shared oracle path (identical generator args to the sibling f0
    queries, so any execution order produces the same bytes) and the
    DuckDB mirror unnests with ``file_row_number`` as the row identity —
    doc_id alone is NOT a key (the dup_doc_id class is planted), so the
    LAG partition must be the physical row."""
    import pyarrow.parquet as pq
    import ray.data

    from .datagen import make_docs_batch

    n = 20_000 if "0.01" in sf_dir else 5_000
    table = make_docs_batch(np.arange(n), seed=42)
    os.makedirs("/tmp/yaschva_oracle", exist_ok=True)
    pq.write_table(table, "/tmp/yaschva_oracle/f0_docs.parquet")
    k = 8
    ds = ray.data.from_arrow([table.slice(i * len(table) // k,
                                          (i + 1) * len(table) // k
                                          - i * len(table) // k)
                              for i in range(k)])

    def check(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        kinds = pc.struct_field(flat, "kind")
        texts = pc.struct_field(flat, "text")
        offs = np.asarray(pc.fill_null(
            pc.cast(pc.struct_field(flat, "offset"), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)).astype(np.int64)
        parents = np.repeat(np.arange(len(t)), lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        total = int(lengths.sum())
        within = np.arange(total) - np.repeat(starts, lengths)

        is_media = np.asarray(pc.is_in(
            kinds, value_set=pa.array(_MEDIA_KINDS)
        ).to_numpy(zero_copy_only=False))
        tlen = pc.utf8_length(texts)
        tlen_valid = np.asarray(pc.is_valid(tlen).to_numpy(
            zero_copy_only=False))
        tlen_np = np.asarray(pc.fill_null(tlen, 0).to_numpy(
            zero_copy_only=False)).astype(np.int64)
        explen = np.where(is_media, _MEDIA_SPAN_LEN, tlen_np)
        len_known = is_media | tlen_valid

        first = within == 0
        v_first = first & (offs != 0)
        v_nolen = ~is_media & ~tlen_valid
        # adjacency: same parent as predecessor, predecessor length known
        adj = np.zeros(total, dtype=bool)
        if total > 1:
            adj[1:] = (parents[1:] == parents[:-1]) & len_known[:-1] & (
                offs[1:] != offs[:-1] + explen[:-1])

        doc_ids = t["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        flat_docs = doc_ids.take(pa.array(parents))
        outs = []
        for mask, cls in ((v_first, "first_offset_nonzero"),
                          (v_nolen, "unknown_length"),
                          (adj, "gap_or_overlap")):
            ix = np.nonzero(mask)[0]
            if len(ix):
                outs.append(pa.table({
                    "doc_id": flat_docs.take(pa.array(ix)),
                    "span_idx": pa.array(within[ix].astype(np.int64)),
                    "class": pa.array([cls] * len(ix), pa.string()),
                }))
        if not outs:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "span_idx": pa.array([], pa.int64()),
                             "class": pa.array([], pa.string())})
        return pa.concat_tables(outs)

    out = _gather(ds.map_batches(check, batch_format="pyarrow"))
    return out.sort_by([("doc_id", "ascending"), ("span_idx", "ascending"),
                        ("class", "ascending")])


def q_winnow_fingerprints(sf_dir: str) -> pa.Table:
    """Rolling-hash (winnowing) fingerprints per document: fingerprint
    count plus an order-independent XOR digest of the selected hashes.
    Deterministic → rows-only driver check; the kernel is verified against
    a brute-force per-doc winnowing reference and the shared-substring
    guarantee in tests."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        vals, off = winnow_fingerprints_batch(t["text"])
        n = t.num_rows
        digests = np.zeros(n, dtype=np.uint64)
        nz = np.diff(off) > 0
        red = np.bitwise_xor.reduceat(vals, off[:-1][nz]) if nz.any() else []
        digests[nz] = red
        return pa.table({
            "doc_id": t["doc_id"],
            "n_fingerprints": pa.array(np.diff(off).astype(np.int64)),
            "fp_digest": pa.array(digests.astype(np.int64)),
        })

    return _gather(ds.map_batches(fp, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


_SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant


def q_train_val_split(sf_dir: str, train_pct: int = 95,
                      salt: int = 7) -> pa.Table:
    """Deterministic train/val split — the standard dataset-assembly
    step: ``hash(doc_id) % 100 < train_pct`` → 'train' else 'val'.

    The hash is the Knuth multiplicative mix ``(doc_id * 2654435761 +
    salt) % 2**32`` — chosen because it is BOTH vectorizable (one numpy
    expression per batch, no per-row Python) and exactly expressible in
    ANSI SQL, so the split is hash-exact against DuckDB.  Membership is
    a pure function of doc_id: stable under re-runs, re-partitioning
    and resume (no RNG state)."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def split(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        h = (ids.astype(np.uint64) * np.uint64(_SPLIT_MULT)
             + np.uint64(salt)) % np.uint64(1 << 32)
        is_train = (h % np.uint64(100)) < train_pct
        lab = pa.DictionaryArray.from_arrays(
            pa.array((~is_train).astype(np.int8)),
            pa.array(["train", "val"])).cast(pa.string())
        return pa.table({"doc_id": t["doc_id"], "split": lab})

    return _gather(ds.map_batches(split, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# Demo mixing weights over the fixture's src0..src19: keep all of the
# first five domains, half of the next five, 10% of the tail.  Shared
# with the SQL oracle builder so the two stay in sync.
DOMAIN_MIX_RATES = {f"src{i}": (1.0 if i < 5 else 0.5 if i < 10 else 0.1)
                    for i in range(10)}
DOMAIN_MIX_DEFAULT = 0.1
_MIX_SALT = 11  # distinct from the train/val salt: independent decisions


def stratified_sample_from_ds(ds, rates: dict, default: float,
                              salt: int = _MIX_SALT,
                              group_col: str = "source"):
    """Domain mixing / stratified downsampling — the corpus-assembly step
    that rebalances sources before training: each row is kept iff
    ``knuth_mix(doc_id, salt) % 10000 < rate(group) * 10000``.  A pure
    per-batch map (rate lookup via ``index_in`` against the tiny rates
    table, one numpy mix over doc_id) — no shuffle, no RNG state, stable
    under re-partitioning and resume, and per-group rates are exact in
    expectation with deterministic membership."""
    groups = sorted(rates)
    bp = np.array([int(round(rates[g] * 10_000)) for g in groups]
                  + [int(round(default * 10_000))], dtype=np.int64)
    gset = pa.array(groups, pa.string())

    def samp(t: pa.Table) -> pa.Table:
        idx = pc.fill_null(pc.index_in(t[group_col], value_set=gset),
                           len(groups))
        thr = bp[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        h = ((ids.astype(np.uint64) * np.uint64(_SPLIT_MULT)
              + np.uint64(salt)) % np.uint64(1 << 32)) % np.uint64(10_000)
        return t.select(["doc_id", group_col]).filter(
            pa.array(h.astype(np.int64) < thr))

    return ds.map_batches(samp, batch_format="pyarrow")


def q_domain_mix(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return _gather(stratified_sample_from_ds(
        ds, DOMAIN_MIX_RATES, DOMAIN_MIX_DEFAULT)).sort_by(
        [("doc_id", "ascending")])


def q_shuffle_documents(sf_dir: str, seed: int = 42) -> pa.Table:
    """Seeded epoch shuffle: reorder the corpus by a keyed hash of
    (doc_id, seed) via the distributed range-partitioned ``ds.sort`` —
    the scale-friendly shuffle (deterministic, resumable, a different
    ``seed`` per epoch gives a fresh order; contrast with RNG-state
    ``random_shuffle`` whose order depends on partitioning).  The key
    is a SQL-expressible mix so the ROW ORDER itself is hash-exact
    against DuckDB (the driver compare is order-sensitive); a
    production shuffle would swap in any stronger 64-bit mix — the
    plan (vectorized key + ds.sort) is unchanged.

    The seed folds in by XOR BEFORE the multiply: an additive seed
    would shift every key by the same constant and leave the ORDER
    unchanged across epochs (caught by the different-seed test).  The
    Lehmer-style ``* 48271 % (2^31-1)`` keeps the mirroring BIGINT
    product well inside DuckDB's range."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    seed_mix = np.uint64(seed * 2654435769)

    def key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        h = ((ids.astype(np.uint64) ^ seed_mix) * np.uint64(48271)) \
            % np.uint64(2147483647)
        return t.append_column("__shuffle_key", pa.array(h.astype(np.int64)))

    shuffled = ds.map_batches(key, batch_format="pyarrow") \
        .sort(["__shuffle_key", "doc_id"])
    return _gather(shuffled).select(["doc_id", "text"])


def q_fingerprint_md5(sf_dir: str) -> pa.Table:
    """SQL-checkable content fingerprint: hex MD5 per doc, hash-exact vs
    DuckDB's ``md5()``.  Exists for cross-engine conformance — the
    PRODUCTION fingerprint path is the vectorized 64-bit xxhash above
    (``q_fingerprint_documents``); MD5-per-row is a Python-loop kernel
    kept out of hot pipelines by design."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        import hashlib

        out = [None if s is None
               else hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint_md5": pa.array(out, pa.string())})

    return _gather(ds.map_batches(fp, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# repetition signals (Gopher/MassiveText quality family)
# --------------------------------------------------------------------------


def q_repetition_signals(sf_dir: str) -> pa.Table:
    """Gopher/MassiveText-style repetition quality signals per document,
    over token BIGRAMS (this corpus is single-line text, so the classic
    duplicate-LINE fractions degenerate to whole-doc dedup; the n-gram
    repetition family is the live signal for word-stream web text).
    All-integer outputs keep the DuckDB mirror hash-exact (no
    float-rounding dialect): ``n_bigrams``, ``n_distinct_bigrams``,
    ``dup_bigram_occurrences`` (occurrences beyond each bigram's first)
    and ``top_bigram_count`` (0 when the doc has < 2 tokens) — the
    filter-rule ratios (e.g. Gopher's top-2-gram fraction) derive from
    these integers downstream without re-reading text.

    Vectorized: tokens explode once per batch (the shared polars kernel
    idiom), then EVERYTHING is numpy over dictionary CODES —
    ``pc.dictionary_encode`` assigns equal codes iff the token strings
    are equal (exactness vs the oracle without hashing), bigrams become
    composite integer keys, and one ``np.unique`` + boundary ``reduceat``
    yields the per-doc counts.  A polars group_by here costs 25–60 ms of
    fixed partitioned-hash overhead PER BATCH (measured; 32-thread pool)
    — the code path that made the first version 4.8 s at sf0.1 vs ~0.3 s
    for its siblings.  Stateless map_batches, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        n_big = np.maximum(lens - 1, 0)
        out_distinct = np.zeros(len(lens), dtype=np.int64)
        out_top = np.zeros(len(lens), dtype=np.int64)
        if len(flat):
            fa = flat.to_arrow()
            if isinstance(fa, pa.ChunkedArray):
                fa = fa.combine_chunks()
            codes = np.asarray(pc.dictionary_encode(fa).indices,
                               dtype=np.int64)
            seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            same = seg[1:] == seg[:-1]
            a, b, sg = codes[:-1][same], codes[1:][same], seg[:-1][same]
            if len(a):
                # two-step composite keys keep products < 2^63 at any
                # batch size: pair ranks ≤ n_bigrams, segs ≤ batch rows
                _, pr = np.unique(a * (codes.max() + 1) + b,
                                  return_inverse=True)
                p_card = int(pr.max()) + 1
                uk, cnt = np.unique(sg * p_card + pr, return_counts=True)
                gs = uk // p_card  # seg per distinct bigram, ascending
                seg_ids, first = np.unique(gs, return_index=True)
                out_distinct[seg_ids] = np.diff(np.append(first, len(gs)))
                out_top[seg_ids] = np.maximum.reduceat(cnt, first)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bigrams": pa.array(n_big),
            "n_distinct_bigrams": pa.array(out_distinct),
            "dup_bigram_occurrences": pa.array(n_big - out_distinct),
            "top_bigram_count": pa.array(out_top)})

    return _gather(ds.map_batches(feats, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# passage-level corpus dedup (sub-document exact dedup + reassembly)
# --------------------------------------------------------------------------

_PASSAGE_TOKENS = 16


def passage_dedup_from_ds(ds, n_tokens: int = _PASSAGE_TOKENS,
                          num_buckets: int | None = None) -> pa.Table:
    """Corpus-level PASSAGE dedup — the sub-document exact-dedup stage of
    a training pipeline (C4/RefinedWeb drop duplicated *lines* across the
    corpus; this corpus is single-line, so the unit is a fixed
    ``n_tokens``-token passage): chunk every doc into passages, keep only
    the globally-FIRST occurrence (minimum ``(doc_id, idx)``) of each
    distinct passage TEXT, drop the rest, and reassemble each doc from
    its surviving passages in order.  Docs whose passages are all dropped
    vanish (they duplicate earlier content entirely).

    Scale shape: two keyed exchanges.  (1) by passage text — identical
    passages MUST co-locate (that co-location IS the dedup, same as
    ``dedup_exact``'s single-phase plan; the hash-first two-phase variant
    applies above the same byte threshold if ever needed); the winner per
    distinct passage is a vectorized sort + unique-first, and a hot
    duplicate passage is logged via the shared observability hook.
    (2) by doc_id — reassembly: sort by idx + per-group string join;
    only WINNER rows move.  Passage text crosses the cluster once.

    Kernels are numpy/Arrow throughout: passages tile the exploded token
    stream contiguously, so chunking and both string joins are
    ``ListArray.from_arrays`` offset math + ``pc.binary_join`` — no
    per-batch polars ``group_by`` (which carries 25–60 ms of fixed
    partitioned-hash overhead per call at 32 threads, measured), and the
    winner pick sorts dictionary CODES, never the passage strings."""
    import ray.data

    from ..engine.exchange import keyed_exchange
    from ..engine.joins import _warn_hot_key

    exploded_schema = pa.schema([("p", pa.string()),
                                 ("doc_id", pa.int64()),
                                 ("idx", pa.int64())])
    empty_exploded = exploded_schema.empty_table()
    out_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def explode_passages(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        if not len(flat):
            return empty_exploded
        fa = flat.to_arrow()
        if isinstance(fa, pa.ChunkedArray):
            fa = fa.combine_chunks()
        fa = fa.cast(pa.string())  # binary_join lacks a large_string kernel
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        n_pass = -(-lens // n_tokens)  # ceil; 0-token docs yield nothing
        total = int(n_pass.sum())
        rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_pass)
        pstart = np.concatenate([[0], np.cumsum(n_pass)])[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(pstart, n_pass)
        tstarts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        # passages tile the token stream in (doc, idx) order, so these
        # starts ARE valid monotone list offsets over the flat tokens
        off = np.append(tstarts[rep] + within * n_tokens, len(fa))
        la = pa.ListArray.from_arrays(pa.array(off, pa.int32()), fa)
        return pa.table({"p": pc.binary_join(la, " "),
                         "doc_id": pa.array(ids[rep]),
                         "idx": pa.array(within)}).cast(exploded_schema)

    def winners_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty_exploded
        _warn_hot_key(t, "p", "passage_dedup(bucket)", -1)
        codes = np.asarray(
            pc.dictionary_encode(t["p"].combine_chunks()).indices,
            dtype=np.int64)
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        idx = np.asarray(t["idx"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((idx, doc, codes))
        cs = codes[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        return t.take(pa.array(order[first])).cast(exploded_schema)

    def assemble_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return out_schema.empty_table()
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        idx = np.asarray(t["idx"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((idx, doc))
        ds_ = doc[order]
        bounds = np.flatnonzero(np.append(True, ds_[1:] != ds_[:-1]))
        off = np.append(bounds, len(ds_))
        la = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()),
            t["p"].combine_chunks().take(pa.array(order)))
        return pa.table({"doc_id": pa.array(ds_[bounds]),
                         "text": pc.binary_join(la, " ")}).cast(out_schema)

    refs = keyed_exchange(
        ds.map_batches(explode_passages, batch_format="pyarrow"),
        "p", winners_bucket, num_buckets=num_buckets,
        empty_result=empty_exploded, gather=False)
    tables = keyed_exchange(ray.data.from_arrow_refs(refs), "doc_id",
                            assemble_bucket, num_buckets=num_buckets)
    if not tables:
        return out_schema.empty_table()
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("doc_id", "ascending")]))


def q_passage_dedup(sf_dir: str, n_plant: int = 6,
                    plant_offset: int = 1_000_000) -> pa.Table:
    """Passage dedup over the documents table with EXACT whole-doc copies
    of the first ``n_plant`` docs planted in-query (the oracle-enabling
    pattern, see ``_plant_copies``): every planted passage duplicates its
    original, so the planted ids vanish from the output and the DuckDB
    mirror (same augmentation, ``row_number() OVER (PARTITION BY passage
    ORDER BY doc_id, idx) = 1`` + ordered ``string_agg``) is
    hash-exact."""
    docs = _plant_copies(_read(sf_dir, "documents", ["doc_id", "text"]),
                         "doc_id", ["text"], n_plant, plant_offset)
    return passage_dedup_from_ds(docs)


# --------------------------------------------------------------------------
# distributed k-means + SemDeDup-style semantic dedup (embedding scale path)
# --------------------------------------------------------------------------

_KM_SCALE = np.int64(1) << 24  # fixed-point scale for exact partial sums

_KM_PARTIAL_REMOTE = None  # lazy ray.remote wrappers (house pattern)
_KM_COMBINE_REMOTE = None


def _km_combine(*parts) -> tuple:
    """Tree-combine Lloyd partials (int64 adds are associative, so any
    combine topology yields the same exact sums)."""
    tot = parts[0][0].copy()
    cnt = parts[0][1].copy()
    for t, c in parts[1:]:
        tot += t
        cnt += c
    return tot, cnt


def _km_block_partial(c: np.ndarray, *blocks) -> tuple:
    """One Lloyd partial over a chunk of cached blocks: per-row argmax
    assignment + fixed-point int64 component sums per cluster.  int64
    bound: 2^24 × rows_per_task ≪ 2^63."""
    k, d = c.shape
    tot = np.zeros((k, d), dtype=np.int64)
    cnt = np.zeros(k, dtype=np.int64)
    for t in blocks:
        if not isinstance(t, pa.Table):  # defensive: pandas block
            t = pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_rows:
            continue
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(mn @ c.T, axis=1)
        fx = np.round(mn * float(_KM_SCALE)).astype(np.int64)
        order = np.argsort(assign, kind="stable")
        a_s, fx_s = assign[order], fx[order]
        starts = np.flatnonzero(np.append(True, a_s[1:] != a_s[:-1]))
        cls = a_s[starts]
        tot[cls] += np.add.reduceat(fx_s, starts, axis=0)
        cnt[cls] += np.diff(np.append(starts, len(a_s)))
    return tot, cnt


def kmeans_embeddings(emb_ds, k: int = 16, iters: int = 8,
                      sample_mod: int | None = None) -> np.ndarray:
    """Distributed spherical k-means over the FULL dataset (the IVF coarse
    quantizer trains on a 512-row sample; this is the corpus-scale Lloyd
    loop): each iteration broadcasts the centroid matrix (``ray.put``
    once), one streaming ``map_batches`` pass emits per-batch partial
    sums, and only k×(d+2) numbers return to the driver per block.

    PARTITION-INDEPENDENT BY CONSTRUCTION: partials accumulate
    fixed-point int64 component sums (normalized vectors scaled by 2^24
    and rounded per ROW — a per-row pure function, so any block split
    yields the same addends), and the driver merges them with vectorized
    int64 adds (associative, so merge order is irrelevant) behind a 2^62
    guard that raises loudly if one cluster's row count (>~2.7e11) could
    overflow the exact sum.  Float mean-of-floats would differ in the
    last ulp across block boundaries and could flip an argmax
    assignment; integer sums cannot.

    Init: the k lowest-id vectors (deterministic, no RNG).  Empty
    clusters keep their previous centroid.  Returns normalized (k, d)
    float64 centroids.

    ``sample_mod=m`` is the 100 TB path: centroids train on the
    deterministic 1/m systematic sample (rows with vec_id % m == 0), so
    only the SAMPLE is cached across Lloyd iterations — the full corpus
    is never materialized (SemDeDup itself trains its quantizer on a
    sample at billion-doc scale).  The sample must still hold >= k
    rows; the returned centroids approximate the full-data Lloyd fixed
    point and downstream EXACT-copy dedup semantics are unaffected
    (identical rows get identical argmax under ANY centroid set)."""
    import ray

    if sample_mod is not None and sample_mod > 1:
        _m = int(sample_mod)

        def _systematic(t: pa.Table) -> pa.Table:
            vid = np.asarray(pc.cast(t["vec_id"], pa.int64())
                             .to_numpy(zero_copy_only=False), np.int64)
            return t.filter(pa.array(vid % _m == 0))

        emb_ds = emb_ds.map_batches(_systematic, batch_format="pyarrow")

    # Lloyd re-reads the input every iteration: cache the decoded blocks
    # in the object store once (spills to disk past capacity) instead of
    # re-scanning parquet ``iters`` times — the standard iterative-
    # algorithm trade; callers doing a single pass never materialize.
    # (In sample mode only the sample caches — the point of the knob.)
    emb_ds = emb_ds.materialize()

    # init = the k GLOBALLY-smallest vec_ids (deterministic, no RNG):
    # per-block partial top-k keeps the gather tiny; ids need not be
    # 0-based (planted offsets, sliced corpora)
    def head_k(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])
        return t.take(order.slice(0, k))

    head = _gather(emb_ds.map_batches(head_k, batch_format="pyarrow"))
    if not head.num_rows:
        raise ValueError("kmeans_embeddings: empty embeddings input")
    head = head.sort_by([("vec_id", "ascending")]).slice(0, k)
    cm = _embeddings_matrix(head)
    centroids = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True),
                                1e-12)
    k_eff, dim = centroids.shape

    # iterate with RAW TASKS over the cached block refs: a Dataset
    # map_batches per iteration pays a fresh streaming-executor startup
    # (~0.5 s × iters of pure fixed cost, measured at sf0.1) for work the
    # Dataset API adds nothing to — the refinement loop is the documented
    # raw-task seam, like the uniqueness exchange
    from ..engine.blocks import iter_block_refs

    refs = list(iter_block_refs(emb_ds))
    chunks = [refs[i:i + 8] for i in range(0, len(refs), 8)]
    global _KM_PARTIAL_REMOTE, _KM_COMBINE_REMOTE
    if _KM_PARTIAL_REMOTE is None:
        _KM_PARTIAL_REMOTE = ray.remote(_km_block_partial)
    if _KM_COMBINE_REMOTE is None:
        _KM_COMBINE_REMOTE = ray.remote(_km_combine)

    for _ in range(iters):
        c_ref = ray.put(centroids)
        futs = [_KM_PARTIAL_REMOTE.remote(c_ref, *ch) for ch in chunks]
        # bounded fan-in (house rule): 64-way tree-combine rounds keep the
        # driver's gather O(64) partials even with millions of blocks —
        # int64 addition is associative, so the topology cannot change
        # the exact sums
        while len(futs) > 64:
            futs = [_KM_COMBINE_REMOTE.remote(*futs[i:i + 64])
                    for i in range(0, len(futs), 64)]
        # vectorized int64 accumulation (a python-int loop over k×d×tasks
        # costs minutes per iteration at realistic k): integer addition is
        # associative/commutative, so the merge stays order-independent.
        # |tot[c][j]| ≤ cnt[c]·2^24, so the post-merge guard at 2^62
        # (2× headroom under int64) catches the only overflow route — a
        # single cluster holding > ~2.7e11 rows — before the NEXT merge
        # could wrap; the fix at that scale is a larger k or smaller
        # _KM_SCALE.
        tot = np.zeros((k_eff, dim), dtype=np.int64)
        cnt = np.zeros(k_eff, dtype=np.int64)
        for t_part, c_part in ray.get(futs):
            tot += t_part
            cnt += c_part
            if int(cnt.max()) > (1 << 62) // int(_KM_SCALE):
                raise OverflowError(
                    "kmeans_embeddings: a cluster exceeds the exact int64 "
                    f"sum bound ({int(cnt.max())} rows × 2^24 scale); "
                    "increase k or reduce _KM_SCALE")
        new = centroids.copy()
        nz = cnt > 0
        if nz.any():
            v = tot[nz].astype(np.float64) / (
                cnt[nz, None].astype(np.float64) * float(_KM_SCALE))
            new[nz] = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        if (new == centroids).all():
            break  # exact fixed point — integer partials make this a
            # meaningful test (no float drift), so converged runs skip
            # the remaining full-input passes
        centroids = new
    return centroids


def assign_clusters(emb_ds, centroids: np.ndarray):
    """Add a ``cluster`` column (argmax cosine vs the broadcast centroid
    matrix) — one zero-copy streaming pass."""
    import ray

    c_ref = ray.put(centroids)

    def tag(t: pa.Table) -> pa.Table:
        import ray as _ray

        if not t.num_rows:
            return t.append_column("cluster", pa.array([], pa.int64()))
        c = _ray.get(c_ref)
        m = _embeddings_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return t.append_column(
            "cluster", pa.array(np.argmax(mn @ c.T, axis=1).astype(np.int64)))

    return emb_ds.map_batches(tag, batch_format="pyarrow")


def semantic_dedup_from_ds(emb_ds, threshold: float = 0.95, k: int = 16,
                           iters: int = 8,
                           max_pairwise: int = _MAX_BUCKET_ROWS,
                           sample_mod: int | None = None) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embeddings, then WITHIN each cluster drop every vector whose cosine to
    a LOWER-id cluster member reaches ``threshold`` (keep-first, the house
    dedup semantic).  Near-duplicate pairs land in the same cluster with
    high probability, so the quadratic compare is cluster-local — the
    global quadratic of brute-force cosine dedup never materializes.

    Scale shape: Lloyd iterations stream (see ``kmeans_embeddings``);
    assignment + the dedup traverse ONE keyed exchange on ``cluster``
    (vectors cross once).  A cluster larger than ``max_pairwise`` is
    star-verified against its min-id hub (one matvec) with the same
    logged policy as the LSH families — plus a LINEAR exact-duplicate
    pass, so exact copies are dropped at any cluster size (the oracle
    contract at τ≈1 survives the cap).  SIZE ``k`` TO THE CORPUS: pick
    k ≈ n_vectors / max_pairwise so expected cluster sizes stay under
    the quadratic cap (SemDeDup uses k in the tens of thousands at
    billion-doc scale); the default suits the test tables.  Returns
    dropped vec_ids, ascending.

    ``sample_mod=m`` is the 100 TB configuration: centroid training
    caches only the 1/m systematic sample (see ``kmeans_embeddings``)
    and the FULL corpus is never materialized — it streams twice (once
    through the sampling scan, once through assignment+dedup) instead
    of being cached whole in the object store.  Exact-copy semantics
    (τ≈1) are unchanged under any centroids; near-dup recall depends
    on sampled-centroid quality like any quantizer-on-a-sample."""
    from ..engine.exchange import keyed_exchange

    empty = pa.table({"dropped_vec": pa.array([], pa.int64())})
    if sample_mod is not None and sample_mod > 1:
        try:
            centroids = kmeans_embeddings(emb_ds, k=k, iters=iters,
                                          sample_mod=sample_mod)
        except ValueError:
            # empty sample — either an empty input (return the empty
            # result) or a too-sparse sample (caller picks a smaller m)
            cnt_probe = _gather(emb_ds.map_batches(
                lambda t: pa.table({"n": pa.array([t.num_rows],
                                                  pa.int64())}),
                batch_format="pyarrow"))
            if not cnt_probe.num_rows or not sum(
                    cnt_probe["n"].to_pylist()):
                return empty
            raise
    else:
        # materialize HERE so the Lloyd loop and the assignment pass
        # share one cached copy (materialize() on a MaterializedDataset
        # is a no-op)
        emb_ds = emb_ds.materialize()
        if not emb_ds.count():  # metadata lookup, materialized
            return empty
        centroids = kmeans_embeddings(emb_ds, k=k, iters=iters)
    tagged = assign_clusters(emb_ds, centroids)

    def dedup_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        order = pc.sort_indices(t, sort_keys=[("cluster", "ascending"),
                                              ("vec_id", "ascending")])
        s = t.take(order)
        cl = np.asarray(s["cluster"].to_numpy(zero_copy_only=False))
        ids = np.asarray(s["vec_id"].to_numpy(zero_copy_only=False))
        mall = _embeddings_matrix(s)
        mall = mall / np.maximum(
            np.linalg.norm(mall, axis=1, keepdims=True), 1e-12)
        starts = np.flatnonzero(np.append(True, cl[1:] != cl[:-1]))
        sizes = np.diff(np.append(starts, len(cl)))
        acc = []
        for gi in np.nonzero(sizes >= 2)[0]:
            sl = slice(starts[gi], starts[gi] + sizes[gi])
            gids, gm = ids[sl], mall[sl]
            m = len(gids)
            if m > max_pairwise:
                _LOG.warning(
                    "semantic_dedup cluster of %d rows exceeds cap %d: "
                    "star-verifying against the min-id hub instead of "
                    "%d all-pairs", m, max_pairwise, m * (m - 1) // 2)
                sims = gm @ gm[0]
                drop = (sims >= threshold) & (np.arange(m) != 0)
                # the star cap must NOT lose exact duplicates of non-hub
                # members (the oracle contract at τ≈1 and plain dedup
                # hygiene at any τ): a linear pass drops every row whose
                # normalized bytes already appeared at a lower id
                rows = np.ascontiguousarray(gm).view(
                    np.dtype((np.void, gm.shape[1] * gm.dtype.itemsize))
                ).ravel()
                _, first_idx, inv = np.unique(rows, return_index=True,
                                              return_inverse=True)
                drop |= first_idx[inv] < np.arange(m)
            else:
                sims = gm @ gm.T
                # drop i if ANY lower-id member j (dropped or not) shadows
                # it — SemDeDup's keep-one-per-neighborhood rule
                drop = np.triu(sims >= threshold, k=1).any(axis=0)
            acc.append(gids[drop])
        if not acc:
            return empty
        return pa.table({"dropped_vec":
                         pa.array(np.concatenate(acc).astype(np.int64))})

    tables = keyed_exchange(tagged, "cluster", dedup_bucket,
                            empty_result=empty)
    if not tables:
        return empty
    return (pa.concat_tables(tables).combine_chunks()
            .sort_by([("dropped_vec", "ascending")]))


def q_kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 8) -> pa.Table:
    """Cluster-size profile of the distributed k-means (rows-only driver
    check: the iterative argmax loop is not SQL-expressible; determinism
    and partition-independence are pinned by tests)."""
    import ray

    from ..engine.blocks import gather_tables

    # materialize here so the Lloyd loop and the assignment pass share one
    # cached copy (kmeans_embeddings' internal materialize is a no-op then)
    emb_ds = _read(sf_dir, "embeddings",
                   ["vec_id", "embedding"]).materialize()
    centroids = kmeans_embeddings(emb_ds, k=k, iters=iters)
    tagged = assign_clusters(emb_ds, centroids)

    def sizes(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        cl = np.asarray(t["cluster"].to_numpy(zero_copy_only=False))
        uk, cnt = np.unique(cl, return_counts=True)
        return pa.table({"cluster": pa.array(uk.astype(np.int64)),
                         "n_vecs": pa.array(cnt.astype(np.int64))})

    blocks = [b for b in gather_tables(
        tagged.map_batches(sizes, batch_format="pyarrow")) if b.num_rows]
    g = (pa.concat_tables(blocks).group_by("cluster")
         .aggregate([("n_vecs", "sum")]))
    return pa.table({"cluster": g["cluster"],
                     "n_vecs": g["n_vecs_sum"].cast(pa.int64())}
                    ).sort_by([("cluster", "ascending")])


def q_semantic_dedup(sf_dir: str, n_plant: int = 8,
                     plant_offset: int = 10_000_000) -> pa.Table:
    """Semantic dedup with EXACT copies of the first ``n_plant`` vectors
    planted in-query (vec_id + offset) and threshold 1−1e−9: an exact
    copy lands in its original's cluster with certainty (identical rows
    ⇒ identical argmax) and cosine ≈ 1 ≥ τ, while the synthetic data's
    max natural cosine (~0.51 at sf0.01) stays far below — so the
    dropped set equals DuckDB's exact-duplicate-embedding self-join and
    the driver check is hash-exact.  The production threshold (0.95
    near-dup semantics) is exercised by the planted-noise recall
    test."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["vec_id"], n_plant))
        if not sel.num_rows:
            return t
        copy = pa.table({
            "vec_id": pc.add(sel["vec_id"],
                             pa.scalar(plant_offset, pa.int64())),
            "embedding": sel["embedding"],
        })
        return pa.concat_tables([t.select(["vec_id", "embedding"]), copy])

    return semantic_dedup_from_ds(
        ds.map_batches(plant, batch_format="pyarrow"),
        threshold=1 - 1e-9)


# --------------------------------------------------------------------------
# inverted index + keyword search (the text-retrieval counterpart of the
# partitioned IVF family)
# --------------------------------------------------------------------------

# fixed demo query, shared verbatim with the SQL oracle
_KWSEARCH_QUERY = ("spark", "window", "merge", "quantile")


def inverted_index_build(sf_dir: str, index_dir: str,
                         num_buckets: int = 16) -> None:
    """Build a PARTITIONED inverted index: distinct (token, doc_id)
    postings written as hive-partitioned parquet, one directory per
    token-hash bucket (``ivf_build``'s layout, applied to text).  A
    keyword search then reads ONLY its query tokens' buckets — at 100 TB
    a ``n_query_buckets/num_buckets`` fraction of the postings bytes.

    Distinctness is per-batch, which IS global: each doc's text lives in
    exactly one input row, so one batch holds all of a doc's tokens.
    At scale the partitioned write emits one file per (block × bucket) —
    the classic small-file problem; run ``cli compact`` per bucket dir
    (engine/compact.py) after a large build.
    Token → bucket routing uses the engine's `_hash64` (the exchange
    family's hash); build and search must run the same engine version —
    the routing hash is part of the index format.  tmp-dir + atomic
    rename keeps a crashed build from leaving appendable partials."""
    import shutil

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.cast(pa.string())
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        doc = np.repeat(ids, lens)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        # distinct (doc, token) via dictionary codes + np.unique —
        # the repetition_signals kernel idiom (no per-batch hash join)
        d = pc.dictionary_encode(flat)
        codes = np.asarray(d.indices, dtype=np.int64)
        card = int(codes.max()) + 1
        uk = np.unique(doc * card + codes)
        u_doc, u_code = uk // card, uk % card
        u_tok = d.dictionary.take(pa.array(u_code))
        bucket = (_hash64(u_tok) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"token": u_tok, "doc_id": pa.array(u_doc),
                         "bucket": pa.array(bucket)})

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["bucket"])
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        import json

        json.dump({"num_buckets": num_buckets}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)


def keyword_search(index_dir: str, query_tokens, k: int = 10) -> pa.Table:
    """Search a partitioned inverted index: read ONLY the query tokens'
    buckets, filter to the query set, and rank docs by the number of
    DISTINCT query tokens they contain (ties → smaller doc_id).  The
    per-doc match counts cross buckets, so partial per-batch counts flow
    through one ``keyed_exchange`` on doc_id (group-sum + per-bucket
    top-k); the driver merges ≤ buckets × k rows."""
    import glob as _glob
    import json

    import ray
    import ray.data

    from ..engine.exchange import keyed_exchange

    with open(os.path.join(index_dir, "meta.json")) as f:
        num_buckets = json.load(f)["num_buckets"]
    qarr = pa.array(list(query_tokens), pa.string())
    need = sorted({int(b) for b in _hash64(qarr) % np.uint64(num_buckets)})
    files = [f for b in need
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_matched": pa.array([], pa.int64())})
    if not files:
        return empty
    ds = ray.data.read_parquet(files, columns=["token", "doc_id"])
    qref = ray.put(qarr)

    def partial(t: pa.Table) -> pa.Table:
        hit = pc.is_in(t["token"], value_set=ray.get(qref))
        sel = t.filter(hit)
        # postings are globally distinct (token, doc) ⇒ row count per doc
        # = distinct matched tokens contributed by this batch
        g = pa.table({"doc_id": sel["doc_id"]}).group_by("doc_id").aggregate(
            [([], "count_all")])
        return pa.table({"doc_id": g["doc_id"],
                         "n": g["count_all"].cast(pa.int64())})

    def topk_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("n", "sum")])
        out = pa.table({"doc_id": g["doc_id"],
                        "n_matched": g["n_sum"].cast(pa.int64())})
        order = pc.sort_indices(out, sort_keys=[("n_matched", "descending"),
                                                ("doc_id", "ascending")])
        return out.take(order[:k])

    parts = keyed_exchange(ds.map_batches(partial, batch_format="pyarrow"),
                           "doc_id", topk_bucket, empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).combine_chunks()
    order = pc.sort_indices(merged, sort_keys=[("n_matched", "descending"),
                                               ("doc_id", "ascending")])
    return merged.take(order[:k]).sort_by([("n_matched", "descending"),
                                           ("doc_id", "ascending")])


def q_keyword_search(sf_dir: str, k: int = 10) -> pa.Table:
    """Build (or reuse) the partitioned inverted index under /tmp, then
    run the fixed conjunctive-ish keyword query through it — ranked by
    distinct query tokens matched, hash-exact vs a DuckDB mirror over the
    source table."""
    import hashlib as _hashlib

    tag = _hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "yaschva_invidx", tag)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        inverted_index_build(sf_dir, index_dir)
    return keyword_search(index_dir, _KWSEARCH_QUERY, k=k)


def q_approx_top_tokens(sf_dir: str, k: int = 64) -> pa.Table:
    """Heavy hitters with BOUNDED memory (mergeable Misra-Gries,
    engine/sketches.py): per-block exact token counts reduce to k-counter
    summaries (k rows + a budget row each — constant bytes per block at
    any corpus size), driver merge.  The streaming counterpart of the
    exact ``vocab_top_tokens`` exchange: no shuffle at all, error bounded
    by the returned budget (true ∈ [n, n + budget]; every token with true
    count > budget is guaranteed present).  Approximate by design →
    rows-only; the guarantee is pinned against the exact vocabulary in
    tests."""
    from ..engine.sketches import mg_merge, mg_summary

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        vc = flat.value_counts()
        arrow = vc.to_arrow()
        vals = arrow["t"].cast(pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        counts = np.asarray(arrow["count"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        return mg_summary(vals, counts, k)

    parts = list(_gather_tables(ds.map_batches(partial,
                                               batch_format="pyarrow")))
    summ, budget = mg_merge(parts, k)
    return summ.append_column(
        "budget", pa.array(np.full(summ.num_rows, budget, dtype=np.int64)))


def _gather_tables(ds):
    from ..engine.blocks import gather_tables

    return gather_tables(ds)


def q_label_centroids(sf_dir: str) -> pa.Table:
    """Grouped VECTOR aggregate: per-label embedding centroid numerators
    — the building block behind class prototypes, per-cluster means and
    IVF retraining.  Exactness across engines comes from fixed-point
    component sums: each float32 component casts exactly to double,
    scales by 2^20 (a power of two — still exact), and floors (no
    rounding-tie dialect).  The partial per block is (labels × dim)
    rows — bounded by group cardinality, never input size — so the
    driver merge is one small Arrow group-sum; the embedding matrix
    itself is one zero-copy flatten + reshape + ``add.reduceat`` per
    block, no per-row loop.  int64 headroom: |x| ≤ 1 ⇒ |sum_fp| <
    2^20·n, overflow needs ~2^43 rows per label."""
    SCALE = float(1 << 20)
    NULL_SENT = np.int64(1) << 62

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["embedding"]))
        if not t.num_rows:
            return pa.table({"label": pa.array([], pa.int32()),
                             "dim": pa.array([], pa.int64()),
                             "sum_fp": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        mat = _embeddings_matrix(t)
        fp = np.floor(mat * SCALE).astype(np.int64)
        lab_col = t["label"]
        lab = np.where(
            np.asarray(pc.is_valid(lab_col).to_numpy(zero_copy_only=False)),
            np.asarray(pc.fill_null(lab_col, 0)
                       .to_numpy(zero_copy_only=False)).astype(np.int64),
            NULL_SENT)
        order = np.argsort(lab, kind="stable")
        lab_s, fp_s = lab[order], fp[order]
        new = np.ones(len(lab_s), dtype=bool)
        new[1:] = lab_s[1:] != lab_s[:-1]
        starts = np.nonzero(new)[0]
        glens = np.diff(np.append(starts, len(lab_s)))
        sums = np.add.reduceat(fp_s, starts, axis=0)
        g, d = sums.shape
        glabs = lab_s[starts]
        return pa.table({
            "label": pa.array(
                np.repeat(glabs, d).astype(np.int64),
                mask=np.repeat(glabs == NULL_SENT, d)).cast(pa.int32()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
            "sum_fp": pa.array(sums.ravel()),
            "n_vecs": pa.array(np.repeat(glens.astype(np.int64), d)),
        })

    parts = [t for t in _gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if t.num_rows]
    if not parts:
        return pa.table({"label": pa.array([], pa.int32()),
                         "dim": pa.array([], pa.int64()),
                         "sum_fp": pa.array([], pa.int64()),
                         "n_vecs": pa.array([], pa.int64())})
    merged = (pa.concat_tables(parts)
              .group_by(["label", "dim"])
              .aggregate([("sum_fp", "sum"), ("n_vecs", "sum")])
              .rename_columns(["label", "dim", "sum_fp", "n_vecs"]))
    return merged.sort_by([("label", "ascending"), ("dim", "ascending")])


def q_regex_extract_documents(sf_dir: str,
                              pattern: str = "s[a-z]+") -> pa.Table:
    """Information-extraction TABLE: every regex match in every document
    as its own row with a 1-based occurrence index — the pattern-mining
    shape (entity/URL/ID extraction) the scalar regex checks don't
    cover.  Pure per-batch map, no shuffle: one polars ``extract_all``
    call per batch (Rust regex — leftmost greedy, same matches as
    DuckDB's RE2 for this class-only pattern, the TOKEN_RE dialect note
    applies), then the list array explodes to rows with vectorized
    repeat/cumsum occurrence indices.  Output grows with matches — at
    scale this is the operator you'd follow with a partitioned write,
    like the unpivot."""
    import polars as pl

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def extract(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        s = pl.from_arrow(pc.fill_null(txt, ""))
        lists = s.str.extract_all(pattern).to_arrow()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        parents = np.repeat(np.arange(len(t)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        idx = np.arange(int(lens.sum())) - np.repeat(starts, lens) + 1
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "doc_id": ids.take(pa.array(parents)),
            "idx": pa.array(idx.astype(np.int64)),
            "hit": flat,
        })

    out = _gather(ds.map_batches(extract, batch_format="pyarrow"))
    if not out.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "idx": pa.array([], pa.int64()),
                         "hit": pa.array([], pa.string())})
    return out.sort_by([("doc_id", "ascending"), ("idx", "ascending")])


def q_normalize_text(sf_dir: str) -> pa.Table:
    """Text normalization as a curation stage: unicode lowercase,
    collapse every whitespace run to one space, trim — all Arrow
    kernels (utf8proc lower + RE2 replace), zero Python per row.  The
    SQL mirror applies the identical three steps, pinning the unicode
    lowering and the RE2 ``\\s+`` class cross-engine; n_chars of the
    normalized text rides along as an integer conformance signal."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        one = pc.replace_substring_regex(low, pattern=r"\s+",
                                         replacement=" ")
        out = pc.utf8_trim(one, characters=" ")
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": out,
            "n_chars": pc.cast(pc.fill_null(pc.utf8_length(out), 0),
                               pa.int64()),
        })

    return _gather(ds.map_batches(norm, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


def q_vocab_fuzzy_pairs(sf_dir: str,
                        max_bucket_rows: int = 4096) -> pa.Table:
    """SymSpell/FastSS-style fuzzy vocabulary join: every pair of corpus
    tokens at edit distance EXACTLY 1 — the candidate-generation core of
    spell correction and typo-tolerant matching, as a distributed
    deletion-neighborhood exchange.  Each token emits itself plus its
    single-deletion variants; tokens sharing a variant co-locate through
    one keyed exchange, and the in-bucket verify is exact with NO
    per-pair edit-distance loop:

    * equal-length pair → ed = 1 ⟺ hamming = 1, computed on packed
      fixed-width char matrices (one vectorized compare per length);
    * length-diff-1 pair → PROVABLY ed = 1 already: the shared variant's
      length forces it to equal the shorter token, which therefore IS a
      deletion of the longer (no check needed);
    * length diff ≥ 2 cannot share a variant.

    Each qualifying pair shares exactly ONE variant (substitution pairs
    share only the deletion at the differing position), so the exchange
    emits no duplicates; a final group-by asserts that cheaply.  Typos
    are PLANTED in-query (``t[1:]`` of every ≥3-char distinct token —
    SQL-expressible) so the oracle's ``levenshtein`` cross join is
    non-trivially exercised.  Hub variants (e.g. "" from 1-char tokens)
    over the cap emit a star to the lexicographic minimum, verified by
    the same exact predicate — logged, never silent.  The vocabulary is
    the documented broadcastable small side (tens of MB at corpus
    scale); everything from variants onward is exchange-distributed."""
    import ray

    from ..engine.exchange import keyed_exchange

    vocab = vocab_counts_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))
    toks_py = [t for t in pc.unique(vocab["token"]).to_pylist() if t]
    synth = {t[1:] for t in toks_py if len(t) >= 3}
    union = sorted(set(toks_py) | synth)
    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string())})
    if not union:
        return empty
    ds = ray.data.from_arrow(pa.table({"token": pa.array(union,
                                                         pa.string())}))

    def variants(t: pa.Table) -> pa.Table:
        toks = np.asarray(t["token"].to_pylist(), dtype=object)
        lens = np.asarray(pc.utf8_length(t["token"])
                          .to_numpy(zero_copy_only=False))
        out_tok, out_var = [], []
        for L in np.unique(lens):
            grp = toks[lens == L]
            out_tok.append(grp)
            out_var.append(grp)  # identity variant (covers deletions)
            L = int(L)
            if L == 1:
                out_tok.append(grp)
                out_var.append(np.full(len(grp), "", dtype=object))
                continue
            # vectorized single-deletions: one fixed-width char-matrix
            # slice per position, never a per-token loop
            m = np.array(grp, dtype=f"U{L}").view("U1").reshape(-1, L)
            for i in range(L):
                vm = np.ascontiguousarray(
                    np.concatenate([m[:, :i], m[:, i + 1:]], axis=1))
                out_tok.append(grp)
                out_var.append(vm.view(f"U{L - 1}").ravel()
                               .astype(object))
        return pa.table({
            "variant": pa.array(np.concatenate(out_var), pa.string()),
            "token": pa.array(np.concatenate(out_tok), pa.string()),
        })

    def _verify_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Exact ed==1 mask; a/b object arrays of equal shape."""
        la = np.asarray([len(x) for x in a])
        lb = np.asarray([len(x) for x in b])
        keep = np.abs(la - lb) == 1  # shared variant ⟹ ed == 1 (proof
        # in the docstring); equal-length pairs verify by hamming
        for L in np.unique(la[la == lb]):
            sel = (la == L) & (lb == L)
            am = np.array(a[sel], dtype=f"U{L}").view("U1").reshape(-1, L)
            bm = np.array(b[sel], dtype=f"U{L}").view("U1").reshape(-1, L)
            keep[sel] = (am != bm).sum(axis=1) == 1
        return keep

    def pairs_bucket(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("variant", "ascending"),
                                              ("token", "ascending")])
        s = t.take(order)
        var = np.asarray(s["variant"].to_pylist(), dtype=object)
        tok = np.asarray(s["token"].to_pylist(), dtype=object)
        n = len(tok)
        newg = np.ones(n, dtype=bool)
        newg[1:] = var[1:] != var[:-1]
        starts = np.nonzero(newg)[0]
        sizes = np.diff(np.append(starts, n))
        out_a, out_b = [], []
        for gi in np.nonzero(sizes >= 2)[0]:
            grp = tok[starts[gi]: starts[gi] + sizes[gi]]
            m = len(grp)
            if m > max_bucket_rows:
                _LOG.warning(
                    "fuzzy-vocab variant %r groups %d tokens (cap %d): "
                    "emitting %d verified star pairs to %r instead of "
                    "%d all-pairs", str(var[starts[gi]]), m,
                    max_bucket_rows, m - 1, str(grp[0]),
                    m * (m - 1) // 2)
                out_a.append(np.full(m - 1, grp[0], dtype=object))
                out_b.append(grp[1:])
            else:
                ia, ib = np.triu_indices(m, k=1)
                out_a.append(grp[ia])
                out_b.append(grp[ib])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        keep = _verify_pairs(a, b)
        return pa.table({"tok_a": pa.array(a[keep], pa.string()),
                         "tok_b": pa.array(b[keep], pa.string())})

    parts = [p for p in keyed_exchange(ds.map_batches(
        variants, batch_format="pyarrow"), "variant", pairs_bucket,
        empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    # a pair shares exactly one variant STRING, but a token with
    # repeated characters emits the same deletion twice ("aa" → "a" at
    # i=0 and i=1), so in-bucket duplicates can occur — the group-by
    # dedups them (and self-pairs die in the hamming verify)
    return (pa.concat_tables(parts).group_by(["tok_a", "tok_b"])
            .aggregate([]).sort_by([("tok_a", "ascending"),
                                    ("tok_b", "ascending")]))


def q_compression_ratio(sf_dir: str) -> pa.Table:
    """Per-doc zlib compression signal — the entropy-proxy quality
    feature several public curation stacks ship (highly repetitive or
    degenerate text compresses far below natural prose): exact integers
    ``n_bytes`` (UTF-8) and ``n_zlib_bytes`` (level 6, raw
    ``zlib.compress``), ratio left to the consumer so no float crosses
    the wire.  Deterministic for a fixed zlib (RFC 1950 stream, level
    pinned), but NOT SQL-expressible — rows-only by design, pinned by
    determinism + discrimination tests.

    A pure per-batch map (no shuffle).  The per-doc loop is one C call
    per document — compression is inherently per-document work; the
    batch stays the unit of scheduling and the UTF-8 byte lengths come
    from the Arrow kernel, not Python."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def comp(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        n_bytes = pc.binary_length(txt.cast(pa.binary())).cast(pa.int64())
        zl = [len(zlib.compress(s.encode("utf-8"), 6))
              for s in txt.to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "n_bytes": n_bytes,
                         "n_zlib_bytes": pa.array(zl, pa.int64())})

    return _gather(ds.map_batches(comp, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# TF-IDF top terms (relevance weighting without floats crossing the hash)
# --------------------------------------------------------------------------


def doc_freq_from_ds(ds, num_buckets: int | None = None) -> pa.Table:
    """Document frequency per corpus token (#docs containing it — the
    idf denominator): per-block PER-DOC-DISTINCT partials (a doc is one
    row, so in-batch distinct-per-doc is exact) → keyed exchange
    group-sum.  One row per distinct token — broadcastable by the same
    Heaps'-law argument as ``vocab_counts_from_ds``."""
    from ..engine.exchange import keyed_exchange

    def partial(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        lists = s.str.extract_all(TOKEN_RE).to_arrow()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lists = lists.fill_null([])
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        parents = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        d = pc.dictionary_encode(flat)
        tid = np.asarray(d.indices.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        # distinct (doc, token) pairs, then count docs per token
        order = np.lexsort((tid, parents))
        p_s, t_s = parents[order], tid[order]
        first = np.ones(len(p_s), dtype=bool)
        first[1:] = (p_s[1:] != p_s[:-1]) | (t_s[1:] != t_s[:-1])
        uniq_tid = t_s[first]
        dfp = np.bincount(uniq_tid, minlength=len(d.dictionary))
        return pa.table({"token": d.dictionary,
                         "df": pa.array(dfp.astype(np.int64))})

    empty = pa.table({"token": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64())})

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("df", "sum")])
        return pa.table({"token": g["token"],
                         "df": g["df_sum"].cast(pa.int64())})

    parts = keyed_exchange(ds.map_batches(partial, batch_format="pyarrow"),
                           "token", sum_bucket, num_buckets=num_buckets,
                           empty_result=empty)
    return (pa.concat_tables(parts).combine_chunks() if parts else empty)


def q_tfidf_top_terms(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-document top-k TF-IDF terms — the classic relevance-weighting
    extractor (Spärck Jones 1972 idf) as two bounded passes: the df
    exchange above (broadcast once via ``ray.put``), then ONE scoring
    scan ranking each doc's distinct terms by ``tf/df``.

    Exactness contract: with N fixed per query, ranking by
    ``tf·ln(N/df)`` equals ranking by ``tf/df`` ... NOT in general — so
    this query's DEFINITION is the raw ratio weighting ``tf · (N/df)``
    (the log-free idf variant, also in Spärck Jones's original note):
    within a doc the N factor is constant, so the rank order is the
    exact rational ``tf/df``, computed as ONE IEEE double division —
    division is correctly rounded (unlike ``ln``), so numpy and DuckDB
    produce bit-identical keys and the tie-break (term ascending, byte
    collation) fires identically.  Output columns are integers+strings
    only; no float crosses the driver's hash.

    Per-batch kernel: tokenize → dictionary-encode → one ``lexsort``
    for per-(doc, term) tf → broadcast-df gather → one ``lexsort`` for
    per-doc top-k.  No Python loop; the df side never reships per batch."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df_tab = doc_freq_from_ds(ds)
    dfc = df_tab["token"].combine_chunks() if isinstance(
        df_tab["token"], pa.ChunkedArray) else df_tab["token"]
    bref = ray.put((dfc, df_tab["df"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)))

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64())})

    def score(t: pa.Table) -> pa.Table:
        vocab_tokens, vocab_df = ray.get(bref)
        s = _pl_text(t["text"])
        lists = s.str.extract_all(TOKEN_RE).to_arrow()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lists = lists.fill_null([])
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        if not len(flat):
            return empty
        parents = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        d = pc.dictionary_encode(flat)
        tid = np.asarray(d.indices.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((tid, parents))
        p_s, t_s = parents[order], tid[order]
        first = np.ones(len(p_s), dtype=bool)
        first[1:] = (p_s[1:] != p_s[:-1]) | (t_s[1:] != t_s[:-1])
        starts = np.nonzero(first)[0]
        tf = np.diff(np.append(starts, len(p_s))).astype(np.int64)
        gp, gt = p_s[starts], t_s[starts]
        # df per dictionary slot (every batch token exists in the global
        # df table by construction)
        slot_df = vocab_df[np.asarray(
            pc.index_in(d.dictionary, value_set=vocab_tokens)
            .to_numpy(zero_copy_only=False), dtype=np.int64)]
        dfv = slot_df[gt]
        scorev = tf.astype(np.float64) / dfv  # correctly-rounded IEEE op
        # term tie-break via byte-collation ranks of the batch dictionary
        # (Arrow sort = binary collation = DuckDB's, no Python compares)
        t_order = np.asarray(pc.sort_indices(d.dictionary)
                             .to_numpy(zero_copy_only=False), dtype=np.int64)
        t_rank = np.empty(len(t_order), dtype=np.int64)
        t_rank[t_order] = np.arange(len(t_order), dtype=np.int64)
        ordk = np.lexsort((t_rank[gt], -scorev, gp))
        gp2 = gp[ordk]
        new2 = np.ones(len(gp2), dtype=bool)
        new2[1:] = gp2[1:] != gp2[:-1]
        grp_starts = np.nonzero(new2)[0]
        glens = np.diff(np.append(grp_starts, len(gp2)))
        pos = np.arange(len(gp2)) - np.repeat(grp_starts, glens)
        keep = pos < k
        sel = ordk[keep]
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "doc_id": ids.take(pa.array(gp[sel])),
            "rnk": pa.array((pos[keep] + 1).astype(np.int64)),
            "term": d.dictionary.take(pa.array(gt[sel])),
            "tf": pa.array(tf[sel]),
            "df": pa.array(dfv[sel]),
        })

    out = _gather(ds.map_batches(score, batch_format="pyarrow"))
    if not out.num_rows:
        return empty
    return out.sort_by([("doc_id", "ascending"), ("rnk", "ascending")])


# --------------------------------------------------------------------------
# weighted systematic sampling (data mixing without floats)
# --------------------------------------------------------------------------


def q_weighted_sample_documents(sf_dir: str, n: int = 25,
                                n_ranges: int = 16,
                                sample_mod: int = 17) -> pa.Table:
    """Deterministic WEIGHTED sample of ``n`` draws by token count — the
    data-mixing primitive (sample documents proportional to length /
    domain weight) as SYSTEMATIC sampling over cumulative weight: tick i
    sits at cumulative weight ``(2i+1)·W/(2n)`` (i = 0..n-1) in doc_id
    order, and a doc is drawn once per tick inside its weight interval
    — multiplicity ``m = f(cum) - f(cum - w)`` with
    ``f(x) = (2n·x + W - 1) // (2W)``, ALL INTEGER (ticks are exact
    rationals; no float, no RNG — the particle-filter systematic
    resampler with a fixed phase).

    Distributed as the house prefix-scan shape: ONE tokenize scan
    projects (doc_id, w) — the corpus-sized text never moves — then a
    range exchange on doc_id yields per-range totals (tiny), the driver
    folds offsets, and a second pass over the SAME materialized
    projection computes local cumsum + offset and emits only docs with
    m ≥ 1 (≤ n rows).  int64 envelope guarded: 2n·W must fit; raises
    loudly past it (n·W < 2^62 — at 100 TB pick ticks per shard)."""
    from ..engine.exchange import range_exchange
    from ..engine.blocks import gather_tables
    from .ops import equidepth_cutpoints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        w = pc.fill_null(pc.count_substring_regex(
            t["text"], TOKEN_RE), 0).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "w": w})

    # small integer projection (16 B/row): materialized ONCE, scanned
    # twice — the text column is tokenized exactly once
    wds = ds.map_batches(project, batch_format="pyarrow").materialize()

    def sample_ids(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids[ids % sample_mod == 0])})

    sv = np.sort(np.concatenate([
        np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        for t in gather_tables(
            wds.map_batches(sample_ids, batch_format="pyarrow"))
        if t.num_rows] or [np.empty(0, np.int64)]))
    cuts = equidepth_cutpoints(sv, n_ranges)

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64()),
                      "cum_w": pa.array([], pa.int64()),
                      "m": pa.array([], pa.int64())})

    def totals(bid: int, t: pa.Table) -> pa.Table:
        return pa.table({"bid": pa.array([bid], pa.int64()),
                         "tot": pa.array(
                             [int(pc.sum(t["w"]).as_py() or 0)
                              if t.num_rows else 0], pa.int64())})

    tot_parts = range_exchange(wds, "doc_id", cuts, totals,
                               empty_result=empty)
    tots = np.zeros(len(cuts) + 1, dtype=np.int64)
    for p in tot_parts:
        tots[int(p["bid"][0].as_py())] = int(p["tot"][0].as_py())
    offsets = np.concatenate([[0], np.cumsum(tots)[:-1]])
    W = int(tots.sum())
    if W <= 0:
        return empty
    if 2 * n * W > np.iinfo(np.int64).max:
        raise ValueError(
            f"weighted sample tick arithmetic exceeds int64: "
            f"2*{n}*{W} — shard the tick space (n·W < 2^62)")

    def select(bid: int, t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        s = t.sort_by([("doc_id", "ascending")])
        w = np.asarray(s["w"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        cum = int(offsets[bid]) + np.cumsum(w)
        prev = cum - w
        f_hi = (2 * n * cum + W - 1) // (2 * W)
        f_lo = (2 * n * prev + W - 1) // (2 * W)
        m = f_hi - f_lo
        keep = m >= 1
        return pa.table({
            "doc_id": s["doc_id"].filter(pa.array(keep)),
            "w": pa.array(w[keep]),
            "cum_w": pa.array(cum[keep]),
            "m": pa.array(m[keep]),
        })

    parts = [p for p in range_exchange(wds, "doc_id", cuts, select,
                                       empty_result=empty) if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# context-window chunking (long-doc -> training-context segmentation)
# --------------------------------------------------------------------------


def q_chunk_documents(sf_dir: str, size: int = 64,
                      stride: int = 48) -> pa.Table:
    """Split each document into overlapping token-window chunks — the
    training-data segmentation primitive (context-length packing's
    upstream: long docs become ``size``-token windows every ``stride``
    tokens, overlap ``size - stride``).  Chunk i covers tokens
    ``[i*stride, min(i*stride+size, n))``; generation stops once a
    window reaches the end (``n_chunks = 1`` if ``n <= size`` else
    ``ceil((n-size)/stride) + 1``), so no emitted chunk is wholly
    contained in its predecessor.  Chunk text is the window's tokens
    re-joined with single spaces (canonical whitespace — the same
    convention both engines compute, so parity is exact).

    Pure per-batch map — NO shuffle, the embarrassingly parallel shape:
    tokenize → flat token buffer + offsets → one vectorized gather
    index build (arange - repeat(cumsum) + repeat(starts)) → one
    ``ListArray.from_arrays`` + ``pc.binary_join``.  No Python loop;
    output rows ≈ input tokens / stride, each task's output bounded by
    its batch."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "chunk_id": pa.array([], pa.int64()),
                      "start_tok": pa.array([], pa.int64()),
                      "n_tok": pa.array([], pa.int64()),
                      "chunk_text": pa.array([], pa.string())})

    def chunk(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        lists = s.str.extract_all(TOKEN_RE).to_arrow()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lists = lists.fill_null([])
        n = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
        # chunks per doc: 0 for empty, 1 if n<=size, else the stop rule
        n_chunks = np.where(n == 0, 0, np.where(
            n <= size, 1, (n - size + stride - 1) // stride + 1))
        total = int(n_chunks.sum())
        if not total:
            return empty
        chunk_doc = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_id = np.arange(total, dtype=np.int64) - first[chunk_doc]
        start = chunk_id * stride
        end = np.minimum(start + size, n[chunk_doc])
        clen = end - start
        # gather indices for every chunk's tokens, one arange trick
        coff = np.concatenate([[0], np.cumsum(clen)])
        gidx = (np.arange(int(coff[-1]), dtype=np.int64)
                - np.repeat(coff[:-1], clen)
                + np.repeat(doc_off[chunk_doc] + start, clen))
        # binary_join's kernel wants matching string widths; a batch's
        # token count is far below 2^31, so int32-offset list<string>
        vals = flat.take(pa.array(gidx)).cast(pa.string())
        chunks = pa.ListArray.from_arrays(pa.array(coff, pa.int32()), vals)
        txt = pc.binary_join(chunks, " ")
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(chunk_doc)),
                         "chunk_id": pa.array(chunk_id),
                         "start_tok": pa.array(start),
                         "n_tok": pa.array(clen),
                         "chunk_text": txt})

    out = _gather(ds.map_batches(chunk, batch_format="pyarrow"))
    if not out.num_rows:
        return empty
    return out.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])


# --------------------------------------------------------------------------
# Misra-Gries phi-heavy-hitter tokens (zero-shuffle sketch + exact verify)
# --------------------------------------------------------------------------


def heavy_hitter_tokens_from_ds(ds, phi_den: int = 400,
                                fold_chunk: int = 64) -> pa.Table:
    """phi-heavy-hitter tokens (phi = 1/``phi_den``): every token whose
    corpus frequency strictly exceeds total_tokens/phi_den, found with
    ZERO shuffle and bounded memory — the sketch-family contrast to
    ``vocab_top_tokens_from_ds``'s keyed exchange.  The exchange moves one
    row per DISTINCT token; this moves at most phi_den+1 rows per block
    no matter how wide the vocabulary is — the frequent-token path at
    100 TB, where the vocabulary itself is too wide to exchange just to
    find the head of the Zipf curve.

    Pass 1 (candidates): per block, exact ``value_counts`` compressed to
    a Misra-Gries summary of <= phi_den counters — subtract the
    (phi_den+1)-th largest count from all, drop the non-positive (Misra &
    Gries 1982).  The driver folds summaries ``fold_chunk`` tables at a
    time with re-compression, so live driver state is O(fold_chunk *
    phi_den) rows, never O(blocks * phi_den).  MG summaries are one-way
    mergeable with TOTAL undercount <= n/(phi_den+1) < phi*n regardless
    of merge order (Agarwal et al., PODS 2012), so every true phi-heavy
    token survives the fold among the <= phi_den candidates.

    Pass 2 (exact): the candidate list (<= phi_den strings) broadcasts
    via ``ray.put``; each block counts ONLY candidate tokens (<= phi_den
    rows out per block); driver group-sum; emit n * phi_den > n_total.
    The sketch only PRUNES, never decides — the output is exact, which is
    what makes the DuckDB HAVING mirror hash-exact rather than
    approximate.

    Each block's exact token total rides along as one sentinel row
    (token = NULL; the tokenizer never yields NULL), so pass 1 also
    yields the exact global denominator in the same scan.
    """
    import ray

    cap = int(phi_den)
    if cap < 1:
        raise ValueError("phi_den must be >= 1")

    def _mg_compress(tok: pa.Array, n: np.ndarray):
        if len(n) > cap:
            # (cap+1)-th largest = ascending index len-cap-1; subtracting
            # it zeroes everything <= it, so at most cap survive (ties
            # with the threshold drop too — strictly-greater keeps only).
            sub = int(np.partition(n, len(n) - cap - 1)[len(n) - cap - 1])
            keep = n > sub
            tok = tok.filter(pa.array(keep))
            n = n[keep] - sub
        return tok, n

    def partial(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        total = len(flat)
        vc = flat.value_counts().to_arrow()
        tok = vc["t"].cast(pa.string()).combine_chunks()
        n = vc["count"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tok, n = _mg_compress(tok, n.astype(np.int64))
        return pa.table({
            "token": pa.concat_arrays(
                [tok, pa.array([None], pa.string())]),
            "n": pa.array(np.concatenate([n, [total]]), pa.int64())})

    from ..engine.blocks import gather_tables

    parts = [p for p in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if p.num_rows]

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not parts:
        return empty

    n_total = 0
    acc = empty
    for i in range(0, len(parts), fold_chunk):
        t = pa.concat_tables([acc] + parts[i:i + fold_chunk])
        is_tok = pc.is_valid(t["token"])
        sent = pc.sum(t.filter(pc.invert(is_tok))["n"]).as_py()
        n_total += int(sent or 0)
        g = (t.filter(is_tok).group_by("token")
             .aggregate([("n", "sum")]))
        tok = g["token"].combine_chunks()
        n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok, n = _mg_compress(tok, n)
        acc = pa.table({"token": tok, "n": pa.array(n, pa.int64())})

    if not acc.num_rows or not n_total:
        return empty

    cand_ref = ray.put(acc["token"].combine_chunks())

    def exact_counts(t: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        vc = flat.value_counts().to_arrow()
        tok = vc["t"].cast(pa.string()).combine_chunks()
        n = vc["count"].cast(pa.int64())
        keep = pc.is_in(tok, value_set=cset)
        return pa.table({"token": tok.filter(keep),
                         "n": n.combine_chunks().filter(keep)})

    exact = [p for p in gather_tables(
        ds.map_batches(exact_counts, batch_format="pyarrow")) if p.num_rows]
    if not exact:
        return empty
    g = (pa.concat_tables(exact).group_by("token")
         .aggregate([("n", "sum")]))
    n = g["n_sum"].cast(pa.int64())
    heavy = pc.greater(pc.multiply_checked(n, pa.scalar(cap, pa.int64())),
                       pa.scalar(n_total, pa.int64()))
    out = pa.table({"token": g["token"], "n": n}).filter(heavy)
    order = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
    return out.take(order)


def q_heavy_hitter_tokens(sf_dir: str, phi_den: int = 400) -> pa.Table:
    return heavy_hitter_tokens_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]), phi_den=phi_den)


# --------------------------------------------------------------------------
# Prefix-filter set-similarity self-join (the exact, non-LSH near-dup)
# --------------------------------------------------------------------------

_SETSIM_PLANT_TOKENS = "zq0 zq1 zq2 zq3 zq4 zq5"  # absent from the corpus


def setsim_join_from_ds(ds, num: int = 6, den: int = 10,
                        seed: int = 7777,
                        num_buckets: int | None = None) -> pa.Table:
    """EXACT shingle-set similarity self-join (Jaccard >= num/den) via
    prefix filtering (PPJoin family, Chaudhuri/Xiao et al.) — the
    deterministic, recall-1.0 counterpart to the MinHash/SimHash LSH
    near-dups: no probabilistic candidate loss, the filter only PRUNES.

    Filter: order every doc's DISTINCT 3-gram shingles by global rarity
    (document frequency asc, hash asc — one bounded df exchange, the
    vocabulary is a documented broadcastable small side); a doc of s
    distinct shingles emits its first ``p = s - ceil(t*s) + 1`` rarest
    as prefix keys.  Two sets with J >= t MUST share a prefix element
    under any one global order (the prefix-filter lemma), so grouping
    by prefix rank finds every qualifying pair; each pair is verified
    ONLY in the group of its minimal common prefix rank (ownership —
    no duplicate work, no post-dedup).  Verification is exact set
    intersection on presorted int64 hash arrays (np.intersect1d — the
    vectorized-kernel style the minhash verify uses), with the integer
    cross-multiply ``inter * den >= union * num`` deciding.

    Shingle dialect == ``jaccard_pairs`` (whose DuckDB mirror is
    hash-exact), incl. the short-doc whole-text fallback; 64-bit shingle
    hashing is exact on this fixture (~1e5 distinct shingles — the
    decontaminate argument).  Rarity-ordered prefixes keep groups small
    (a prefix shingle is among its doc's rarest 40%); a degenerate
    boilerplate corpus can still form a hot group, which is logged
    (never silently capped — the operator is exact, so it processes
    the group anyway)."""
    from ..engine.exchange import keyed_exchange

    t_num, t_den = int(num), int(den)

    def doc_sets(t: pa.Table):
        """per-doc DISTINCT shingle hashes (int64, ascending) + doc ids"""
        th, offsets, lens = _token_hash_segments(t["text"], seed)
        sh, s_off = _batch_shingle_hashes(th, offsets, lens)
        n_docs = len(lens)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64),
                        np.diff(s_off))
        order = np.lexsort((sh, seg))
        sh_s, seg_s = sh[order], seg[order]
        first = np.concatenate([[True], (seg_s[1:] != seg_s[:-1])
                                | (sh_s[1:] != sh_s[:-1])])
        dh = sh_s[first].astype(np.int64)
        dseg = seg_s[first]
        dlens = np.bincount(dseg, minlength=n_docs).astype(np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return ids, dh, dlens

    # ---- pass 1: global shingle document frequency (bounded exchange:
    # one row per DISTINCT shingle; the vocabulary-sized small side) ----
    def df_partial(t: pa.Table) -> pa.Table:
        _, dh, _ = doc_sets(t)
        u, c = np.unique(dh, return_counts=True)
        return pa.table({"h": pa.array(u), "df": pa.array(c.astype(np.int64))})

    df_empty = pa.table({"h": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64())})

    def df_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("h").aggregate([("df", "sum")])
        return pa.table({"h": g["h"], "df": g["df_sum"]}).cast(df_empty.schema)

    df_parts = keyed_exchange(ds.map_batches(df_partial,
                                             batch_format="pyarrow"),
                              "h", df_sum, num_buckets=num_buckets,
                              empty_result=df_empty)
    out_empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "n_inter": pa.array([], pa.int64()),
                          "n_union": pa.array([], pa.int64())})
    if not df_parts:
        return out_empty
    df_all = pa.concat_tables(df_parts).combine_chunks()
    h = np.asarray(df_all["h"].to_numpy(zero_copy_only=False), np.int64)
    dfc = np.asarray(df_all["df"].to_numpy(zero_copy_only=False), np.int64)
    # rank = position in (df asc, hash asc): rarest shingles first
    order = np.lexsort((h, dfc))
    h_by_hash = h[order][np.argsort(h[order], kind="stable")]
    # searchsorted lookup table: hashes ascending -> rank
    rank_of = np.empty(len(h), np.int64)
    rank_of[np.argsort(h[order], kind="stable")] = np.arange(len(h))
    import ray
    lut_ref = ray.put((np.sort(h), rank_of))

    # ---- pass 2: prefix emission + ownership-grouped exact verify ----
    def emit(t: pa.Table) -> pa.Table:
        hs, ranks = ray.get(lut_ref)
        ids, dh, dlens = doc_sets(t)
        n_docs = len(ids)
        s_off = np.concatenate([[0], np.cumsum(dlens)])
        r = ranks[np.searchsorted(hs, dh)]
        # per-doc rank order (prefix = lowest ranks = rarest shingles)
        dseg = np.repeat(np.arange(n_docs, dtype=np.int64), dlens)
        ro = np.lexsort((r, dseg))
        r_sorted = r[ro]
        p = dlens - (t_num * dlens + t_den - 1) // t_den + 1
        p = np.maximum(np.minimum(p, dlens), 0)
        rows = int(p.sum())
        if not rows:
            return pa.table({"key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set": pa.array([], pa.list_(pa.int64())),
                             "prefix": pa.array([], pa.list_(pa.int64()))})
        rdoc = np.repeat(np.arange(n_docs, dtype=np.int64), p)
        p_off = np.concatenate([[0], np.cumsum(p)])
        within = np.arange(rows, dtype=np.int64) - p_off[rdoc]
        key = r_sorted[s_off[rdoc] + within]
        # gather each emission row's full set / prefix slice
        set_len, pre_len = dlens[rdoc], p[rdoc]
        so = np.concatenate([[0], np.cumsum(set_len)])
        po = np.concatenate([[0], np.cumsum(pre_len)])
        gset = (np.arange(int(so[-1]), dtype=np.int64)
                - np.repeat(so[:-1], set_len)
                + np.repeat(s_off[rdoc], set_len))
        gpre = (np.arange(int(po[-1]), dtype=np.int64)
                - np.repeat(po[:-1], pre_len)
                + np.repeat(s_off[rdoc], pre_len))
        sets = pa.ListArray.from_arrays(
            pa.array(so, pa.int32()), pa.array(dh[gset]))
        # prefix ranks, ascending within each row (rank-sorted source)
        prefs = pa.ListArray.from_arrays(
            pa.array(po, pa.int32()), pa.array(r_sorted[gpre]))
        return pa.table({"key": pa.array(key),
                         "doc_id": pa.array(ids[rdoc]),
                         "set": sets, "prefix": prefs})

    def verify_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return out_empty
        t = t.sort_by([("key", "ascending"), ("doc_id", "ascending")])
        key = np.asarray(t["key"].to_numpy(zero_copy_only=False), np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        sets = t["set"].combine_chunks()
        prefs = t["prefix"].combine_chunks()
        sv = np.asarray(sets.flatten().to_numpy(zero_copy_only=False),
                        np.int64)
        soff = np.asarray(sets.offsets.to_numpy(zero_copy_only=False),
                          np.int64)
        pv = np.asarray(prefs.flatten().to_numpy(zero_copy_only=False),
                        np.int64)
        poff = np.asarray(prefs.offsets.to_numpy(zero_copy_only=False),
                          np.int64)
        starts = np.nonzero(np.concatenate(
            [[True], key[1:] != key[:-1]]))[0]
        bounds = np.append(starts, len(key))
        oa, ob, oi, ou = [], [], [], []
        for si, sj in zip(bounds[:-1], bounds[1:]):
            g = sj - si
            if g < 2:
                continue
            if g > _MAX_BUCKET_ROWS:
                _LOG.warning(
                    "setsim prefix group for rank %d holds %d docs "
                    "(boilerplate-degenerate); exact join processes it "
                    "quadratically", int(key[si]), int(g))
            k = key[si]
            for x in range(si, sj):
                ax = sv[soff[x]:soff[x + 1]]
                px = pv[poff[x]:poff[x + 1]]
                for y in range(x + 1, sj):
                    # ownership: verify only in the minimal common
                    # prefix-rank group (both arrays ascending)
                    pyr = pv[poff[y]:poff[y + 1]]
                    common = np.intersect1d(px, pyr, assume_unique=True)
                    if not len(common) or common[0] != k:
                        continue
                    by = sv[soff[y]:soff[y + 1]]
                    inter = len(np.intersect1d(ax, by,
                                               assume_unique=True))
                    union = len(ax) + len(by) - inter
                    if union > 0 and inter * t_den >= union * t_num:
                        a, b = ids[x], ids[y]
                        if a > b:
                            a, b = b, a
                        oa.append(int(a)); ob.append(int(b))
                        oi.append(int(inter)); ou.append(int(union))
        return pa.table({"doc_a": pa.array(oa, pa.int64()),
                         "doc_b": pa.array(ob, pa.int64()),
                         "n_inter": pa.array(oi, pa.int64()),
                         "n_union": pa.array(ou, pa.int64())})

    parts = keyed_exchange(ds.map_batches(emit, batch_format="pyarrow"),
                           "key", verify_bucket, num_buckets=num_buckets,
                           empty_result=out_empty)
    if not parts:
        return out_empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("doc_a", "ascending"), ("doc_b", "ascending")]))


def q_setsim_join(sf_dir: str) -> pa.Table:
    """setsim over the corpus augmented with 8 planted near-copies
    (novel-token suffix => J ~ 0.95 vs the original — the
    embedding_neardup planted-oracle pattern, making the full
    prefix-filter path hash-checkable against the all-pairs mirror)."""
    import ray.data

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    head = _gather(ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 8)),
        batch_format="pyarrow")).sort_by([("doc_id", "ascending")])
    planted = pa.table({
        "doc_id": pa.array([i + 30_000_000 for i in
                            head["doc_id"].to_pylist()], pa.int64()),
        "text": pa.array([f"{t} {_SETSIM_PLANT_TOKENS}" for t in
                          head["text"].to_pylist()], pa.string())})
    return setsim_join_from_ds(ds.union(ray.data.from_arrow(planted)))


def dedup_spans_from_ds(ds, k: int = 8, min_docs: int = 2,
                        key_mode: str = "fingerprint") -> pa.Table:
    """Cross-document duplicate-SPAN removal (the ExactSubstr idea of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", expressed as two bounded exchanges instead of a suffix
    array): every k-token window whose exact text occurs in >=
    ``min_docs`` DISTINCT documents is removed from ALL of them, and
    each document's surviving tokens are re-joined — the span-level
    counterpart to the doc-level (dedup_exact) and passage-level
    (passage_dedup) dedups.

    Plan: (1) gram exchange — each block tokenizes (the vocab_top_tokens
    polars dialect) and, in the DEFAULT ``key_mode="fingerprint"``,
    hashes each token twice (two independent 64-bit polars hash seeds)
    and rolls each window into a 128-bit fingerprint pair (f1, f2) via
    two vectorized k-step polynomial combines — no gram string is ever
    built, and the exchange ships 32 bytes per window
    (f1, f2, doc_id, start) instead of the ~k x avg-token-bytes gram
    payload (~10x fewer shuffle bytes at k=8 on this corpus; the
    round-4 review's remaining scale weakness).  Two token sequences
    collide only if BOTH independent fingerprints collide (~2^-128 per
    pair; ~1e-13 corpus-wide even at 10^13 windows — the
    fingerprint_documents/fingerprint_md5 split's documented trade).
    ``key_mode="string"`` keeps the original gram-string key (equality
    exact by construction; the paranoid/audit path — a test pins both
    modes to identical output on real corpus data).  The bucket keeps
    occurrences of grams with >= min_docs distinct docs.  (2) doc
    exchange — marks and full docs union-tag on doc_id; the bucket
    replays tokenization, turns [start, start+k) marks into a removal
    mask via the difference-array trick (add.at +1/-1, cumsum), and
    rebuilds each doc with ListArray offsets + binary_join.  Output
    text is whitespace-NORMALIZED (single spaces), matching the mirror's
    string_agg(tok, ' ').

    Scale: exchange 1 ships one row per token window — O(corpus tokens),
    the honest cost of EXACT substring dedup (suffix-array engines pay
    the same asymptotics in sort volume) — but at a fixed 32 bytes/row
    in fingerprint mode; the approximate pre-filters (winnowing,
    minhash) are the cheaper screens when exactness isn't required.
    Self-repetition within one doc is NOT removed (min_docs counts
    DISTINCT documents)."""
    import polars as pl  # noqa: F401

    from ..engine.exchange import keyed_exchange
    from ..engine.sketches import _hash64

    if key_mode not in ("fingerprint", "string"):
        raise ValueError(f"key_mode must be fingerprint|string: {key_mode}")
    fp_mode = key_mode == "fingerprint"
    # odd multipliers for the two rolling polynomial combines (the token
    # hashes already carry the randomness; the multiplier only needs to
    # make position matter, so any odd constant works)
    _M1 = np.uint64(0x9E3779B97F4A7C15)
    _M2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def _tokenize(t: pa.Table):
        s = _pl_text(t["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
        flat = pa.array(flat, pa.string()) if not isinstance(
            flat, pa.Array) else flat.cast(pa.string())
        return flat, lens

    def emit_grams(t: pa.Table) -> pa.Table:
        flat, lens = _tokenize(t)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        n_win = np.maximum(lens - k + 1, 0)
        total = int(n_win.sum())
        if not total:
            if fp_mode:
                return pa.table({"f1": pa.array([], pa.int64()),
                                 "f2": pa.array([], pa.int64()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "start": pa.array([], pa.int64())})
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_win)
        woff = np.concatenate([[0], np.cumsum(n_win)])[:-1]
        within = np.arange(total, dtype=np.int64) - woff[doc_idx]
        ws = offsets[doc_idx] + within
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        if fp_mode:
            th1 = _hash64(flat, seed=0)
            th2 = _hash64(flat, seed=1)
            f1 = np.zeros(total, np.uint64)
            f2 = np.zeros(total, np.uint64)
            for j in range(k):  # k vectorized passes over all windows
                idx = ws + j
                f1 = f1 * _M1 + th1[idx]
                f2 = f2 * _M2 + th2[idx]
            return pa.table({"f1": pa.array(f1.view(np.int64)),
                             "f2": pa.array(f2.view(np.int64)),
                             "doc_id": pa.array(ids[doc_idx]),
                             "start": pa.array(within)})
        cols = [flat.take(pa.array(ws + j)) for j in range(k)]
        gram = pc.binary_join_element_wise(*cols, " ")
        return pa.table({"gram": gram,
                         "doc_id": pa.array(ids[doc_idx]),
                         "start": pa.array(within)})

    mark_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                           "start": pa.array([], pa.int64())})

    def dup_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return mark_empty
        g = t.group_by("gram").aggregate([("doc_id", "count_distinct")])
        dup = g.filter(pc.greater_equal(
            g["doc_id_count_distinct"],
            pa.scalar(min_docs, pa.int64())))["gram"].combine_chunks()
        if not len(dup):
            return mark_empty
        f = t.filter(pc.is_in(t["gram"], value_set=dup))
        return pa.table({"doc_id": f["doc_id"], "start": f["start"]})

    def dup_bucket_fp(t: pa.Table) -> pa.Table:
        # dup decision on the FULL 128-bit pair (never a 64-bit
        # recombination — that would throw away half the collision bits)
        if not t.num_rows:
            return mark_empty
        g = t.group_by(["f1", "f2"]).aggregate(
            [("doc_id", "count_distinct")])
        dup = g.filter(pc.greater_equal(
            g["doc_id_count_distinct"],
            pa.scalar(min_docs, pa.int64()))).select(["f1", "f2"])
        if not dup.num_rows:
            return mark_empty
        f = t.join(dup, keys=["f1", "f2"], join_type="inner")
        return pa.table({"doc_id": f["doc_id"], "start": f["start"]})

    marks_parts = keyed_exchange(
        ds.map_batches(emit_grams, batch_format="pyarrow"),
        "f1" if fp_mode else "gram",
        dup_bucket_fp if fp_mode else dup_bucket,
        empty_result=mark_empty, gather=False)

    import ray.data

    marks_ds = ray.data.from_arrow_refs(marks_parts)

    def doc_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "text": pc.fill_null(t["text"], ""),
            "start": pa.array(np.full(t.num_rows, -1, np.int64)),
            "end": pa.array(np.full(t.num_rows, -1, np.int64)),
            "side": pa.array(np.zeros(t.num_rows, np.int8))})

    def mark_side(t: pa.Table) -> pa.Table:
        # compact overlapping [start, start+k) windows into merged
        # intervals per doc BEFORE the exchange: under heavy duplication
        # marks shrink from ~one row per token to ~one row per span
        # (measured 50k-doc worst case: exchange-2 volume /6)
        if not t.num_rows:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8())})
        d = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                       np.int64)
        s = np.asarray(t["start"].to_numpy(zero_copy_only=False),
                       np.int64)
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        e = s + k
        # a window starts a NEW interval iff it begins after the running
        # merged end; running end = max prefix within the doc segment
        new_doc = np.concatenate([[True], d[1:] != d[:-1]])
        # segment-wise cummax of e (reset at doc boundaries): lift each
        # segment by a strictly-increasing offset so one global cummax
        # never crosses segments; envelope: n_segments * (max_end+1)
        # must fit int64 (block-local counts — orders of magnitude in)
        seg = np.cumsum(new_doc) - 1
        big = (seg.astype(np.int64) + 1) * int(e.max() + 1)
        run_end = np.maximum.accumulate(e + big) - big
        starts_new = np.concatenate(
            [[True], s[1:] > run_end[:-1]]) | new_doc
        iid = np.cumsum(starts_new) - 1
        n_iv = int(iid[-1]) + 1
        iv_start = s[starts_new]
        iv_end = np.zeros(n_iv, np.int64)
        np.maximum.at(iv_end, iid, e)
        iv_doc = d[starts_new]
        return pa.table({
            "doc_id": pa.array(iv_doc),
            "text": pa.array([""] * n_iv, pa.string()),
            "start": pa.array(iv_start),
            "end": pa.array(iv_end),
            "side": pa.array(np.ones(n_iv, np.int8))})

    out_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "clean_text": pa.array([], pa.string()),
                          "n_removed_tokens": pa.array([], pa.int64())})

    def rebuild_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return out_empty
        side = np.asarray(t["side"].to_numpy(zero_copy_only=False))
        docs = t.filter(pa.array(side == 0))
        if not docs.num_rows:
            return out_empty
        ids = np.asarray(docs["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        s = _pl_text(docs["text"])
        toks = s.str.extract_all(TOKEN_RE)
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
        flat = pa.array(flat, pa.string()) if not isinstance(
            flat, pa.Array) else flat.cast(pa.string())
        offsets = np.concatenate([[0], np.cumsum(lens)])
        total = int(offsets[-1])
        removed = np.zeros(total, bool)
        mrows = t.filter(pa.array(side == 1))
        if mrows.num_rows:
            mid = np.asarray(
                mrows["doc_id"].to_numpy(zero_copy_only=False), np.int64)
            mst = np.asarray(
                mrows["start"].to_numpy(zero_copy_only=False), np.int64)
            men = np.asarray(
                mrows["end"].to_numpy(zero_copy_only=False), np.int64)
            order = np.argsort(ids)
            pos = order[np.searchsorted(ids[order], mid)]
            gs = offsets[pos] + mst  # intervals always fit their doc
            delta = np.zeros(total + 1, np.int64)
            np.add.at(delta, gs, 1)
            np.add.at(delta, offsets[pos] + men, -1)
            removed = np.cumsum(delta[:-1]) > 0
        keep = ~removed
        doc_of_tok = np.repeat(np.arange(len(lens), dtype=np.int64),
                               lens)
        kept_per_doc = np.zeros(len(lens), np.int64)
        np.add.at(kept_per_doc, doc_of_tok[keep], 1)
        kept_off = np.concatenate([[0], np.cumsum(kept_per_doc)])
        kept_list = pa.ListArray.from_arrays(
            pa.array(kept_off, pa.int32()),
            flat.filter(pa.array(keep)))
        clean = pc.binary_join(kept_list, " ")
        return pa.table({
            "doc_id": pa.array(ids),
            "clean_text": pc.fill_null(clean.cast(pa.string()), ""),
            "n_removed_tokens": pa.array(lens - kept_per_doc)})

    def dproj(t: pa.Table) -> pa.Table:
        return doc_side(t)

    parts = keyed_exchange(
        ds.map_batches(dproj, batch_format="pyarrow").union(
            marks_ds.map_batches(mark_side, batch_format="pyarrow")),
        "doc_id", rebuild_bucket, empty_result=out_empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return out_empty
    return (pa.concat_tables(parts).combine_chunks()
            .sort_by([("doc_id", "ascending")]))


def q_dedup_spans(sf_dir: str) -> pa.Table:
    return dedup_spans_from_ds(
        _read(sf_dir, "documents", ["doc_id", "text"]))


def q_f0_span_grammar(sf_dir: str) -> pa.Table:
    """Span-KIND-sequence (caption grammar) validation over the
    interleaved F0 table — the REGULAR-LANGUAGE constraint on each
    document's span sequence that per-span schema rules can't express
    (it relates ADJACENT kinds, the north rule's span-sequence
    semantics): documents must start with text, and every media span
    needs a text caption after it.

    Violation classes per (doc_id, span_idx):
      - ``first_not_text``: span 0 isn't a text span
      - ``uncaptioned_media``: a media span immediately followed by
        another media span (no caption between)
      - ``trailing_media``: the document's LAST span is media

    Same explode skeleton as q_f0_offset_check (repeat/cumsum parent
    indices, one shifted compare — no per-row Python); the generator's
    random kinds make all-media adjacencies genuinely frequent, so the
    check bites on organic data, not only plants.  doc_id is NOT a key
    (dup_doc_id is planted) so adjacency is by PHYSICAL row (parents),
    and the DuckDB mirror partitions its LEAD window by
    file_row_number over the shared written oracle table."""
    import pyarrow.parquet as pq
    import ray.data

    from .datagen import make_docs_batch

    n = 20_000 if "0.01" in sf_dir else 5_000
    table = make_docs_batch(np.arange(n), seed=42)
    os.makedirs("/tmp/yaschva_oracle", exist_ok=True)
    pq.write_table(table, "/tmp/yaschva_oracle/f0_docs.parquet")
    k = 8
    ds = ray.data.from_arrow([table.slice(i * len(table) // k,
                                          (i + 1) * len(table) // k
                                          - i * len(table) // k)
                              for i in range(k)])

    def check(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        kinds = pc.struct_field(flat, "kind")
        parents = np.repeat(np.arange(len(t)), lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        total = int(lengths.sum())
        within = np.arange(total) - np.repeat(starts, lengths)

        is_media = np.asarray(pc.is_in(
            kinds, value_set=pa.array(_MEDIA_KINDS)
        ).to_numpy(zero_copy_only=False))
        is_text = np.asarray(pc.equal(kinds, "text").to_numpy(
            zero_copy_only=False))

        first = within == 0
        last = np.zeros(total, dtype=bool)
        if total:
            last[:-1] = parents[1:] != parents[:-1]
            last[-1] = True
        v_first = first & ~is_text
        nxt_media = np.zeros(total, dtype=bool)
        if total > 1:
            nxt_media[:-1] = is_media[1:] & (parents[1:] == parents[:-1])
        v_uncap = is_media & nxt_media
        v_trail = is_media & last

        doc_ids = t["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        flat_docs = doc_ids.take(pa.array(parents))
        outs = []
        for mask, cls in ((v_first, "first_not_text"),
                          (v_uncap, "uncaptioned_media"),
                          (v_trail, "trailing_media")):
            ix = np.nonzero(mask)[0]
            if len(ix):
                outs.append(pa.table({
                    "doc_id": flat_docs.take(pa.array(ix)),
                    "span_idx": pa.array(within[ix].astype(np.int64)),
                    "class": pa.array([cls] * len(ix), pa.string())}))
        if not outs:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "span_idx": pa.array([], pa.int64()),
                             "class": pa.array([], pa.string())})
        return pa.concat_tables(outs)

    out = _gather(ds.map_batches(check, batch_format="pyarrow"))
    return out.sort_by([("doc_id", "ascending"),
                        ("span_idx", "ascending"),
                        ("class", "ascending")])
