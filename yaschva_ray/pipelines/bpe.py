"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016 —
"Neural Machine Translation of Rare Words with Subword Units", the public
byte-pair-encoding algorithm).

The scale split is the classic one: the CORPUS-sized half (word counting)
runs distributed — per-block polars ``value_counts`` partials → one keyed
exchange group-sum — while the merge LOOP runs on the gathered distinct
(word, count) table, which grows sublinearly in corpus bytes (Heaps' law;
at 100 TB the distinct-word table is millions of rows, not trillions), so
driver-side merging over it is the scale-correct design, not a shortcut.

The merge loop itself is vectorized numpy over one flat symbol-id array:
pair counting is a sort + ``reduceat`` over composite keys weighted by
word counts, and merge application resolves overlapping occurrences
("aaa" under pair (a,a)) with a run-parity trick — leftmost-first
semantics without a per-position Python scan.

Determinism: initial symbol ids are assigned in sorted character order,
merged ids append in merge order, and count ties break on the merged
pair's (left, right) strings ascending — byte-stable across runs and
partitionings (the word-count exchange is exact, so its gathered table is
partition-independent after the sort).

No end-of-word marker is used (whole-word BPE; merges cannot cross word
boundaries because adjacency is within-word) — documented divergence from
the paper's ``</w>`` variant, chosen so segment concatenation equals the
word exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textops import TOKEN_RE, _pl_text, _read

__all__ = ["word_counts_from_ds", "bpe_train", "bpe_encode",
           "BpeEncoder", "tokenize_ds", "q_bpe_merges",
           "q_bpe_token_counts"]


def word_counts_from_ds(ds, num_buckets: int | None = None) -> pa.Table:
    """Exact distinct (word, n) over a (doc_id, text) Dataset: per-block
    ``value_counts`` combiner → keyed exchange on the word → per-bucket
    group-sum; gathered and sorted (word asc) for partition-independence."""
    from ..engine.exchange import keyed_exchange

    def partial_counts(t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        flat = (s.str.extract_all(TOKEN_RE)
                .explode(empty_as_null=True).drop_nulls())
        vc = flat.value_counts()
        arrow = vc.to_arrow()
        return pa.table({"word": arrow["t"].cast(pa.string()),
                         "n": arrow["count"].cast(pa.int64())})

    empty = pa.table({"word": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("word").aggregate([("n", "sum")])
        return pa.table({"word": g["word"],
                         "n": g["n_sum"].cast(pa.int64())})

    parts = keyed_exchange(ds.map_batches(partial_counts,
                                          batch_format="pyarrow"),
                           "word", sum_bucket, num_buckets=num_buckets,
                           empty_result=empty)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("word", "ascending")])


def bpe_train(word_counts: pa.Table, n_merges: int = 64) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (word, n) table.  Returns
    (rank, left, right, merged, count) — count is the pair's weighted
    frequency at merge time.  Stops early when no pair repeats."""
    words = word_counts["word"].to_pylist()
    counts = np.asarray(word_counts["n"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
    # initial vocabulary: characters in sorted order (deterministic ids)
    chars = sorted({c for w in words for c in w})
    sym_of = {c: i for i, c in enumerate(chars)}
    vocab: list[str] = list(chars)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    syms = np.fromiter((sym_of[c] for w in words for c in w),
                       dtype=np.int64, count=int(lens.sum()))
    # word id per symbol position (merges shrink arrays in place)
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    out = {"rank": [], "left": [], "right": [], "merged": [], "count": []}
    for rank in range(n_merges):
        if len(syms) < 2:
            break
        adj = wid[1:] == wid[:-1]
        if not adj.any():
            break
        a, b = syms[:-1][adj], syms[1:][adj]
        w = counts[wid[:-1][adj]]
        V = len(vocab)
        key = a * V + b
        order = np.argsort(key, kind="stable")
        sk, sw = key[order], w[order]
        starts = np.ones(len(sk), dtype=bool)
        starts[1:] = sk[1:] != sk[:-1]
        sums = np.add.reduceat(sw, np.nonzero(starts)[0])
        uk = sk[starts]
        best = int(sums.max())
        if best < 2:  # no repeated pair left — nothing worth merging
            break
        tied = uk[sums == best]
        # tie-break: merged (left, right) strings ascending
        pair_strs = [(vocab[int(k) // V], vocab[int(k) % V]) for k in tied]
        ai, bi = divmod(int(tied[int(np.argmin(
            np.array([f"{l}\x00{r}" for l, r in pair_strs])))]), V)
        out["rank"].append(rank)
        out["left"].append(vocab[ai])
        out["right"].append(vocab[bi])
        out["merged"].append(vocab[ai] + vocab[bi])
        out["count"].append(best)
        vocab.append(vocab[ai] + vocab[bi])
        # apply: leftmost-first over occurrences; consecutive candidate
        # positions only arise when left==right ("aaa"), where run parity
        # keeps exactly the leftmost-first non-overlapping set
        hit = np.zeros(len(syms), dtype=bool)
        hit[:-1] = adj & (syms[:-1] == ai) & (syms[1:] == bi)
        cand = np.nonzero(hit)[0]
        if len(cand):
            run_start = np.ones(len(cand), dtype=bool)
            run_start[1:] = np.diff(cand) > 1
            run_origin = cand[run_start][np.cumsum(run_start) - 1]
            kept = cand[((cand - run_origin) % 2) == 0]
            syms[kept] = V
            drop = np.zeros(len(syms), dtype=bool)
            drop[kept + 1] = True
            syms, wid = syms[~drop], wid[~drop]
    return pa.table({
        "rank": pa.array(out["rank"], pa.int64()),
        "left": pa.array(out["left"], pa.string()),
        "right": pa.array(out["right"], pa.string()),
        "merged": pa.array(out["merged"], pa.string()),
        "count": pa.array(out["count"], pa.int64()),
    })


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with learned merges (greedy lowest-rank first —
    the standard inference rule).  ``ranks`` maps (left, right) → rank."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


class BpeEncoder:
    """Actor-pool TOKENIZER APPLICATION — the corpus-sized half of BPE,
    the other direction from training: merges (a few thousand rows even
    for big vocabularies) are broadcast ONCE via ``ray.put`` and each
    actor builds its rank dict in ``__init__``; ``__call__`` encodes a
    batch by dictionary-encoding the exploded words and running the
    greedy merge loop ONLY over distinct words not already in the
    actor's cross-batch cache — per-word Python cost is bounded by the
    actor's distinct-word vocabulary (Heaps' law), never by corpus
    rows, and everything row-shaped stays numpy (reduceat per-doc
    sums)."""

    def __init__(self, merges_ref):
        import ray

        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, pa.Table) else merges_ref)
        self.ranks = {(lt, rt): i for i, (lt, rt) in enumerate(
            zip(merges["left"].to_pylist(), merges["right"].to_pylist()))}
        self._cache: dict[str, int] = {}

    def _segments(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(bpe_encode(word, self.ranks))
            self._cache[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        s = _pl_text(t["text"])
        lists = s.str.extract_all(TOKEN_RE).to_arrow()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        # null text -> null list; count as zero tokens like token_count
        lists = lists.fill_null([])
        offsets = np.asarray(lists.offsets)
        flat = lists.values
        n_words = np.diff(offsets).astype(np.int64)
        if len(flat):
            d = pc.dictionary_encode(flat)
            words = d.dictionary.to_pylist()
            seg_per_slot = np.fromiter(
                (self._segments(w) for w in words), np.int64, len(words))
            per_word = seg_per_slot[np.asarray(d.indices)]
            # reduceat needs non-empty slices; add.reduceat over doc
            # starts miscounts empty docs, so sum via cumsum diffs
            cum = np.concatenate([[0], np.cumsum(per_word)])
            n_bpe = cum[offsets[1:]] - cum[offsets[:-1]]
        else:
            n_bpe = np.zeros(len(t), np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_words": pa.array(n_words, pa.int64()),
                         "n_bpe_tokens": pa.array(n_bpe, pa.int64())})


def tokenize_ds(ds, merges: pa.Table, *, batch_size: int = 4096,
                concurrency=(2, 8)):
    """Distributed BPE application over a (doc_id, text) Dataset: the
    merges table ships to the object store once (``ray.put``), every
    actor reads it zero-copy — never re-shipped per batch."""
    import ray

    return ds.map_batches(
        BpeEncoder, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(ray.put(merges),),
        concurrency=concurrency, num_cpus=1)


def q_bpe_token_counts(sf_dir: str, n_merges: int = 32) -> pa.Table:
    """End-to-end tokenizer pipeline: train merges on the corpus, then
    APPLY them back over every document through the ``BpeEncoder``
    actor pool — per-doc word and BPE-token counts, the sizing signal a
    training-data pipeline computes before packing.  Deterministic but
    iterative (rows-only driver check); encode exactness vs the
    per-word reference ``bpe_encode`` and the actor cache's coherence
    are pinned in tests."""
    from ..engine.blocks import gather_tables

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(word_counts_from_ds(ds), n_merges=n_merges)
    parts = [t for t in gather_tables(tokenize_ds(ds, merges))
             if t.num_rows]
    return pa.concat_tables(parts).combine_chunks().sort_by(
        [("doc_id", "ascending")])


def q_bpe_merges(sf_dir: str, n_merges: int = 32) -> pa.Table:
    """BPE tokenizer training over the documents corpus: distributed word
    counting → vectorized merge learning.  Deterministic (rows-only: the
    merge loop is iterative, not SQL-expressible; exactness is pinned by
    a brute-force reference implementation in tests and by the word-count
    exchange's hash-exact sibling ``vocab_top_tokens``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_train(word_counts_from_ds(ds), n_merges=n_merges)
