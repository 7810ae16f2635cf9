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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.sketches import _hash64

TOKEN_RE = r"\S+"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _gather(ds) -> pa.Table:
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(tables).combine_chunks() if tables else pa.table({})


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def q_dedup_exact_documents(sf_dir: str, num_buckets: int = 16) -> pa.Table:
    """doc_ids that are exact-text duplicates of an earlier (lower doc_id)
    document.  Hash-bucketed shuffle + per-bucket vectorized group-min:
    only ``(bucket, text, doc_id)`` rows move, each text group lands in
    exactly one bucket task."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bucketize(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        b = (_hash64(txt) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def per_bucket(t: pa.Table) -> pa.Table:
        keep = t.group_by("text").aggregate([("doc_id", "min")])
        joined = t.join(keep, keys=["text"])
        dup = joined.filter(pc.not_equal(joined["doc_id"], joined["doc_id_min"]))
        return pa.table({"doc_id": dup["doc_id"]})

    out = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow"))
    t = _gather(out)
    if not t.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return t.sort_by([("doc_id", "ascending")])


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

_MINHASH_K = 64
_LSH_BANDS = 16  # 16 bands × 4 rows
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    import polars as pl

    return pl.Series(shingles).hash(seed=7).to_numpy().astype(np.uint64)


_MH_A = None
_MH_B = None


def _mh_params():
    global _MH_A, _MH_B
    if _MH_A is None:
        rng = np.random.RandomState(1234)
        _MH_A = (rng.randint(1, 1 << 61, size=_MINHASH_K).astype(np.uint64) | np.uint64(1))
        _MH_B = rng.randint(0, 1 << 61, size=_MINHASH_K).astype(np.uint64)
    return _MH_A, _MH_B


def minhash_signature(text: str) -> np.ndarray:
    """k=64 minhash over word 3-gram shingles (universal hashing mod 2^61−1)."""
    h = _shingle_hashes(text)
    a, b = _mh_params()
    # (a*h + b) mod p, rowwise min — vectorized (k × n_shingles)
    prod = (h[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


class MinHasher:
    """Actor-pool stage: doc → (doc_id, band, band_hash) rows."""

    def __init__(self):
        _mh_params()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        rows_doc, rows_band, rows_hash = [], [], []
        rows_per_band = _MINHASH_K // _LSH_BANDS
        for d, txt in zip(doc_ids, texts):
            sig = minhash_signature(txt or "")
            bands = sig.reshape(_LSH_BANDS, rows_per_band)
            bh = (bands * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1, dtype=np.uint64)
            rows_doc.extend([d] * _LSH_BANDS)
            rows_band.extend(range(_LSH_BANDS))
            rows_hash.extend(bh.tolist())
        return pa.table({
            "doc_id": pa.array(rows_doc),
            "band": pa.array(rows_band, pa.int32()),
            "band_hash": pa.array(np.array(rows_hash, dtype=np.uint64).astype(np.int64)),
        })


def q_minhash_candidates_documents(sf_dir: str) -> pa.Table:
    """LSH candidate near-dup pairs: same (band, band_hash) bucket.
    shingle→minhash→band→bucket-groupby (the canonical scheme)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=2)

    def pairs(t: pa.Table) -> pa.Table:
        # group already co-located by (band, band_hash)
        ids = sorted(t["doc_id"].to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})

    out = sigs.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pyarrow")
    t = _gather(out)
    if not t.num_rows:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    # dedup pairs found in multiple bands
    t = t.group_by(["doc_a", "doc_b"]).aggregate([]).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])
    return t


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(n)]))) if len(a.split()) >= n else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(n)]))) if len(b.split()) >= n else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def q_minhash_verified_pairs(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """Candidates verified by exact n-gram Jaccard ≥ threshold (the verify
    step of the dedup pipeline; broadcast text lookup for the small table,
    bucketed co-group at scale)."""
    import ray

    cands = q_minhash_candidates_documents(sf_dir)
    docs = _gather(_read(sf_dir, "documents", ["doc_id", "text"]))
    lookup = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    a_ids = cands["doc_a"].to_pylist()
    b_ids = cands["doc_b"].to_pylist()
    rows = []
    for x, y in zip(a_ids, b_ids):
        j = jaccard_ngrams(lookup.get(x) or "", lookup.get(y) or "")
        if j >= threshold:
            rows.append((x, y, round(j, 6)))
    rows.sort()
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    })


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(text: str) -> int:
    import polars as pl

    toks = text.split()
    if not toks:
        return 0
    h = pl.Series(toks).hash(seed=11).to_numpy().astype(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [simhash64(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(np.array(fps, dtype=np.uint64).astype(np.int64)),
        })


def q_simhash_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _gather(ds.map_batches(SimHasher(), batch_format="pyarrow"))
    return out.sort_by([("doc_id", "ascending")])


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
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"))
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


def q_ann_lsh(sf_dir: str, k: int = 10, n_queries: int = 5, n_planes: int = 12) -> pa.Table:
    """LSH-bucketed ANN (the scale path): random-hyperplane signatures
    co-locate similar vectors; exact rerank within matching buckets.
    Returns (query_id, vec_id, score) with recall < 1 by design —
    rows-only check; accuracy asserted against brute force in tests."""
    import ray

    emb_ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"))
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
        for qi, qs in enumerate(q_sig_):
            # candidates: hamming distance ≤ 4 of 12 planes (recall/scan
            # tradeoff: ~0.65 recall at ~20% of vectors scanned)
            xor = sig ^ qs
            ham = np.array([bin(x).count("1") for x in xor])
            cand = np.nonzero(ham <= 4)[0]
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
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)), batch_format="pyarrow"))
    qn = _embeddings_matrix(head)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    q_ids = head["vec_id"].to_pylist()

    # train the coarse quantizer on a deterministic sample (first 512 rows)
    sample = _gather(emb_ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 512)), batch_format="pyarrow"))
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
        self.sets = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        self.langs = sorted(self.sets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            toks = (text or "").lower().split()
            best, best_n = "unknown", 0
            for lang in self.langs:
                n = sum(1 for t in toks if t in self.sets[lang])
                if n > best_n:
                    best, best_n = lang, n
            out.append(best)
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(out, pa.string())})


def q_langid_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _gather(ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=2))
    return out.sort_by([("doc_id", "ascending")])


def q_quality_documents(sf_dir: str) -> pa.Table:
    """Vectorized quality features: n_tokens, mean token length, digit
    ratio — all via Arrow kernels, SQL-mirrorable."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tokens = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        n_digits = pc.count_substring_regex(txt, r"[0-9]").cast(pa.int64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
        digit_ratio = pc.round(pc.divide(pc.cast(n_digits, pa.float64()),
                                         pc.cast(denom, pa.float64())), ndigits=6)
        return pa.table({"doc_id": t["doc_id"], "n_chars": n_chars,
                         "n_tokens": n_tokens, "digit_ratio": digit_ratio})

    return _gather(ds.map_batches(feats, batch_format="pyarrow")).sort_by(
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
