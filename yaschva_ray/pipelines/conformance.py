"""Cross-engine ALGORITHM conformance queries (the ``fingerprint_md5``
pattern, textops.py): each near-dup / fingerprint family algorithm re-run
with an MD5-derived base hash so the WHOLE algorithm — not just its
row plumbing — is hash-exact against a DuckDB SQL mirror:

- ``q_simhash_md5``     — the simhash bit-vote construction
  (per-token 64-bit hash → per-bit ±1 votes → sign ⇒ fingerprint bit);
- ``q_winnow_md5``      — the MOSS winnowing window selection
  (k-gram hashes → rightmost minimum of each sliding window → distinct
  selected values per doc);
- ``q_minhash_sig_md5`` — the minhash signature construction
  (min over shingles of k affine rehashes).

The PRODUCTION paths keep their vectorized xxhash-style kernels
(textops.py: simhash64 / winnow_fingerprints_batch / minhash_signature);
these variants exist because DuckDB can compute ``md5_number_lower``
(the little-endian uint64 of md5-digest bytes 8..16) but not the
engine's mixers, so they pin the algorithm logic — vote counting,
window tie-breaks, affine-min — byte-for-byte across engines.  MD5 per
DISTINCT token/gram is a Python loop by design (kept out of hot
pipelines, exactly like ``q_fingerprint_md5``); everything around it is
vectorized numpy/Arrow.  Reference parity note: the reference
(mmagyar/yaschva) has no dedup/fingerprint surface — these belong to the
engine-addition families (SURVEY.md §2.6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textops import TOKEN_RE, _gather, _pl_text, _read

__all__ = [
    "q_simhash_md5",
    "q_winnow_md5",
    "q_minhash_sig_md5",
    "simhash_md5_batch",
    "winnow_md5_batch",
    "minhash_sig_md5_batch",
]

_GRAM_K = 4       # tokens per shingle (shared with the SQL mirrors)
_WINDOW = 4       # winnowing window width
_U64 = np.uint64

# Affine rehash constants for the minhash-signature mirror.  Bounds are
# load-bearing for the SQL side: DuckDB BIGINT arithmetic is
# overflow-CHECKED, so a < 2^29 and b < 2^60 keep a*h32 + b < 2^61 + 2^60
# < 2^63 with h32 < 2^32 (numpy int64 holds the same products exactly).
_SIG_P = (1 << 61) - 1  # Mersenne prime modulus
_SIG_AB = tuple(((2 * i + 3) * 40503 % (1 << 29) | 1,
                 (i * 2654435761 + 17) % (1 << 60)) for i in range(8))
_SIG_A = np.array([a for a, _ in _SIG_AB], np.int64)
_SIG_B = np.array([b for _, b in _SIG_AB], np.int64)


def _md5_lower64(arr: pa.Array) -> np.ndarray:
    """uint64 MD5-derived hash per element, matching DuckDB's
    ``md5_number_lower`` (little-endian of digest bytes 8..16).  MD5 runs
    once per DISTINCT value via dictionary encoding — the only per-row
    Python in this module."""
    d = pc.dictionary_encode(arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    dic = d.dictionary.to_pylist()
    if not dic:
        return np.empty(0, _U64)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(x.encode("utf-8")).digest()[8:], "little")
         for x in dic), dtype=_U64, count=len(dic))
    return hs[np.asarray(d.indices, dtype=np.int64)]


def _tok_arrays(texts) -> tuple[pa.Array, np.ndarray, pa.Array]:
    """(flat tokens, per-doc token counts, per-doc ' '-joined tokens) for
    a batch — one polars tokenize pass, Arrow the rest.  Null text is ''
    (no tokens), matching ``coalesce(text,'')`` in the mirrors."""
    s = _pl_text(texts)
    toks = s.str.extract_all(TOKEN_RE)
    lens = toks.list.len().to_numpy().astype(np.int64)
    flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    joined = toks.list.join(" ").to_arrow()
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    # polars emits large_string; binary_join_element_wise needs one type
    return flat.cast(pa.string()), lens, joined.cast(pa.string())


def _gram_segments(texts, k: int = _GRAM_K) -> tuple[pa.Array, np.ndarray]:
    """Token k-gram STRINGS per doc in positional order, with the
    short-doc whole-text fallback (docs with < k tokens contribute ONE
    gram = all tokens joined — the decontaminate oracle's convention, so
    every doc has ≥ 1 gram).  Returns (flat gram array, per-doc offsets).
    Fully vectorized: gram text is a 4-way ``binary_join_element_wise``
    over shifted takes of the flat token array."""
    flat, lens, joined = _tok_arrays(texts)
    off = np.concatenate([[0], np.cumsum(lens)])
    n_docs = len(lens)
    m = np.where(lens >= k, lens - k + 1, 1)
    g_off = np.concatenate([[0], np.cumsum(m)])
    long = lens >= k
    ml = (lens - k + 1)[long]
    tot = int(ml.sum())
    within = np.arange(tot) - np.repeat(
        np.concatenate([[0], np.cumsum(ml)])[:-1], ml)
    tok_start = np.repeat(off[:-1][long], ml) + within
    if tot:
        parts = [flat.take(pa.array(tok_start + j)) for j in range(k)]
        grams_long = pc.binary_join_element_wise(*parts, " ")
        if isinstance(grams_long, pa.ChunkedArray):
            grams_long = grams_long.combine_chunks()
    else:
        grams_long = pa.array([], pa.string())
    short_arr = joined.take(pa.array(np.nonzero(~long)[0]))
    # interleave long-doc grams and short-doc fallbacks back into doc order
    order = np.empty(int(g_off[-1]), np.int64)
    order[np.repeat(g_off[:-1][long], ml) + within] = np.arange(len(grams_long))
    order[g_off[:-1][~long]] = len(grams_long) + np.arange(len(short_arr))
    src = pa.concat_arrays([grams_long, short_arr])
    return src.take(pa.array(order)), g_off


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_md5_batch(texts) -> np.ndarray:
    """64-bit simhash per doc from md5-lower token hashes: per-bit vote
    sum over tokens (+1 if the token hash has the bit, else −1); the
    fingerprint sets exactly the bits with vote sum > 0 (strictly-positive
    convention ⇒ tokenless docs are 0, matching the SQL's left-join
    coalesce).  Returns int64 (the uint64 bit pattern viewed signed,
    DuckDB-BIGINT-comparable)."""
    flat, lens, _ = _tok_arrays(texts)
    hs = _md5_lower64(flat)
    n = len(lens)
    sums = np.zeros((n, 64), np.int64)
    nz = lens > 0
    if len(hs):
        bits = ((hs[:, None] >> np.arange(64, dtype=_U64)[None, :])
                & _U64(1)).astype(np.int64) * 2 - 1
        off = np.concatenate([[0], np.cumsum(lens)])
        # reduceat starts are strictly increasing (empty docs excluded)
        sums[nz] = np.add.reduceat(bits, off[:-1][nz], axis=0)
    bitset = (sums > 0).astype(_U64)
    with np.errstate(over="ignore"):
        u = (bitset << np.arange(64, dtype=_U64)[None, :]).sum(
            axis=1, dtype=_U64)
    return u.view(np.int64)


def q_simhash_md5(sf_dir: str) -> pa.Table:
    """SQL-checkable simhash (see module docstring).  The (tokens × 64)
    vote matrix is int64 ⇒ small batches keep the kernel in-heap; this
    conformance path never runs in the flagship."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "simhash_md5": pa.array(simhash_md5_batch(t["text"]))})

    return _gather(ds.map_batches(fp, batch_format="pyarrow",
                                  batch_size=2048)).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# winnowing
# --------------------------------------------------------------------------


def winnow_md5_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing selection (rightmost window minimum — the same logic as
    the production ``winnow_fingerprints_batch``) over md5-lower k-gram
    hashes.  Returns (n_fingerprints, xor-of-distinct-selected as int64)
    per doc."""
    grams, g_off = _gram_segments(texts)
    sh = _md5_lower64(grams)
    n_docs = len(g_off) - 1
    m = np.diff(g_off)
    total = len(sh)
    if total >= _WINDOW:
        sw = np.lib.stride_tricks.sliding_window_view(sh, _WINDOW)
        amin = _WINDOW - 1 - np.argmin(sw[:, ::-1], axis=1)
        sel_pos_global = np.arange(total - _WINDOW + 1) + amin
    else:
        sel_pos_global = np.empty(0, dtype=np.int64)
    win_counts = np.maximum(m - _WINDOW + 1, 1)
    w_off = np.concatenate([[0], np.cumsum(win_counts)])
    seg = np.repeat(np.arange(n_docs), win_counts)
    within = np.arange(int(w_off[-1])) - w_off[seg]
    src_window = g_off[seg] + within
    long_doc = m >= _WINDOW
    sel = np.empty(int(w_off[-1]), dtype=np.int64)
    lmask = long_doc[seg]
    if lmask.any():
        sel[lmask] = sel_pos_global[src_window[lmask]]
    for i in np.nonzero(~long_doc)[0]:  # short docs: rightmost min of all
        s0, s1 = int(g_off[i]), int(g_off[i + 1])
        sel[w_off[i]] = s1 - 1 - int(np.argmin(sh[s0:s1][::-1]))
    vals = sh[sel]
    order = np.lexsort((vals, seg))
    sseg, svals = seg[order], vals[order]
    keep = np.ones(len(svals), dtype=bool)
    keep[1:] = (sseg[1:] != sseg[:-1]) | (svals[1:] != svals[:-1])
    dseg, dvals = sseg[keep], svals[keep]
    counts = np.bincount(dseg, minlength=n_docs)
    out_off = np.concatenate([[0], np.cumsum(counts)])
    n_fp = np.diff(out_off).astype(np.int64)
    dig = np.zeros(n_docs, _U64)
    nz = n_fp > 0
    if nz.any():
        dig[nz] = np.bitwise_xor.reduceat(dvals, out_off[:-1][nz])
    return n_fp, dig.view(np.int64)


def q_winnow_md5(sf_dir: str) -> pa.Table:
    """SQL-checkable winnowing (see module docstring): per doc, the count
    and XOR digest of the distinct window-selected k-gram hashes."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        n_fp, dig = winnow_md5_batch(t["text"])
        return pa.table({"doc_id": t["doc_id"],
                         "n_fingerprints": pa.array(n_fp),
                         "fp_xor": pa.array(dig)})

    return _gather(ds.map_batches(fp, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")])


# --------------------------------------------------------------------------
# minhash signature
# --------------------------------------------------------------------------


def minhash_sig_md5_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Minhash signatures from md5-lower gram hashes: h32 = hash mod 2^32,
    sig_i = min over grams of (a_i·h32 + b_i) mod (2^61 − 1).  Returns
    (per-doc offsets are implicit — every doc has exactly len(_SIG_AB)
    rows) as (mins matrix (n_docs × k), k)."""
    grams, g_off = _gram_segments(texts)
    h32 = (_md5_lower64(grams) & _U64(0xFFFFFFFF)).astype(np.int64)
    vals = (h32[:, None] * _SIG_A[None, :] + _SIG_B[None, :]) % _SIG_P
    # every doc has ≥ 1 gram ⇒ g_off strictly increasing ⇒ reduceat valid
    return np.minimum.reduceat(vals, g_off[:-1], axis=0), len(_SIG_AB)


def q_minhash_sig_md5(sf_dir: str) -> pa.Table:
    """SQL-checkable minhash signature, long format (doc_id, i, sig)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        mins, k = minhash_sig_md5_batch(t["text"])
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, k)),
            "i": pa.array(np.tile(np.arange(k, dtype=np.int64), len(ids))),
            "sig": pa.array(mins.ravel()),
        })

    return _gather(ds.map_batches(sig, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("i", "ascending")])


# --------------------------------------------------------------------------
# SQL mirrors (rendered into __ray_entry__.oracle_sql())
# --------------------------------------------------------------------------

_GRAM_EXPR = "||' '||".join(f"t[i+{j}]" if j else "t[i]"
                            for j in range(_GRAM_K))

# grams CTE shared by the winnow / minhash mirrors — identical to
# _gram_segments (incl. the short-doc fallback).  The coalesce matters:
# DuckDB's array_to_string([], ' ') is NULL, not '', so a tokenless doc
# would otherwise vanish from the aggregates instead of hashing ''
_GRAMS_CTE = rf"""
toks AS (
  SELECT doc_id, regexp_extract_all(coalesce(text,''), '\S+') AS t
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {_GRAM_K}
              THEN list_transform(range(1, len(t) - {_GRAM_K - 2}),
                                  i -> {_GRAM_EXPR})
              ELSE [coalesce(array_to_string(t, ' '), '')] END AS grams
  FROM toks
)"""

# uint64 (as HUGEINT) → BIGINT two's-complement view, matching numpy's
# .view(int64) on the engine side
_U64_TO_I64 = ("CAST(CASE WHEN {x} >= 9223372036854775808 "
               "THEN {x} - 18446744073709551616 ELSE {x} END AS BIGINT)")

SIMHASH_MD5_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text,''), '\S+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, md5_number_lower(tok) AS h FROM toks
), bits AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
), fp AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::UBIGINT << b)::HUGEINT
                  ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       {_U64_TO_I64.format(x='coalesce(u,0)')} AS simhash_md5
FROM documents d LEFT JOIN fp USING (doc_id) ORDER BY doc_id
"""

WINNOW_MD5_SQL = rf"""
WITH {_GRAMS_CTE}, h AS (
  SELECT doc_id, unnest(range(1, len(grams)+1)) AS pos,
         md5_number_lower(unnest(grams)) AS h
  FROM g
), mdoc AS (
  SELECT doc_id, len(grams) AS m FROM g
), w AS (
  SELECT h.doc_id, h.pos AS j
  FROM h JOIN mdoc USING (doc_id)
  WHERE h.pos <= greatest(mdoc.m - {_WINDOW - 1}, 1)
), mn AS (
  SELECT w.doc_id, w.j, min(h2.h) AS hmin
  FROM w JOIN h h2 ON h2.doc_id = w.doc_id
                  AND h2.pos BETWEEN w.j AND w.j + {_WINDOW - 1}
  GROUP BY w.doc_id, w.j
)
SELECT d.doc_id,
       CAST(count(DISTINCT mn.hmin) AS BIGINT) AS n_fingerprints,
       {_U64_TO_I64.format(
           x='coalesce(bit_xor(DISTINCT mn.hmin), 0)::HUGEINT')} AS fp_xor
FROM documents d LEFT JOIN mn ON mn.doc_id = d.doc_id
GROUP BY d.doc_id ORDER BY d.doc_id
"""

_SIG_VALUES = ", ".join(f"({i}, {a}, {b})"
                        for i, (a, b) in enumerate(_SIG_AB))

MINHASH_SIG_MD5_SQL = rf"""
WITH {_GRAMS_CTE}, hh AS (
  SELECT doc_id,
         CAST(md5_number_lower(unnest(grams)) % 4294967296 AS BIGINT) AS h32
  FROM g
), ab(i, a, b) AS (VALUES {_SIG_VALUES})
SELECT doc_id, i, min((a * h32 + b) % {_SIG_P}) AS sig
FROM hh CROSS JOIN ab GROUP BY doc_id, i ORDER BY doc_id, i
"""
