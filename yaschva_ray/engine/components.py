"""Distributed connected components over a near-duplicate pair graph.

The step after MinHash/SimHash/embedding verification in a web-scale
dedup pipeline: verified pairs form a graph; each document keeps only
the minimum doc_id of its connected component (the canonical
representative), and `filter_canonical` drops every non-canonical
member from the corpus.

Algorithm: hash-min label propagation on the house raw-task exchange
(engine/exchange.py).  The symmetric adjacency is hash-partitioned
ONCE into B stable buckets; every round moves only (node, label)
messages — min-combined per destination node INSIDE the map task
before slicing — so per-round shuffle volume is O(distinct
neighbours), never O(edges).  Plain hash-min converges in
graph-diameter rounds — near-dup components are cliques plus short
chains (the LSH bucket caps bound star growth), so that is
single-digit in practice; from round ``_JUMP_AFTER`` on, a
pointer-jumping exchange (``label[node] <- label[label[node]]``)
joins each round, halving the remaining distance-to-root so
pathological chains still converge in O(log diameter) total.
``max_rounds`` guards the loop with a loud error carrying the round
count and unconverged-node count (house no-silent-caps rule).

The pair graph is orders of magnitude smaller than the corpus (only
documents that appear in some verified pair), so the component map is
small enough to broadcast (`ray.put` once) for the canonical filter;
if it ever rivals corpus size, the keyed-exchange anti-join
(`customers_without_orders` pattern) is the fallback — documented,
not silently assumed.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_EMPTY_COMPONENTS = pa.table({"doc_id": pa.array([], pa.int64()),
                              "component": pa.array([], pa.int64())})

_ADJ_REMOTE = None
_INIT_REMOTE = None
_PROP_REMOTE = None
_ABSORB_REMOTE = None
_JQ_REMOTE = None
_JA_REMOTE = None
_MERGEF_REMOTE = None
_CONTRACT_REMOTE = None
_RESOLVE_REMOTE = None

# plain hash-min rounds before pointer-jumping joins in (the common
# short-diameter case never pays the extra exchanges)
_JUMP_AFTER = 3


def _np_col(t: pa.Table, name: str) -> np.ndarray:
    col = t[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_numpy(zero_copy_only=False))


def _adj_slices(block: pa.Table, a_col: str, b_col: str,
                num_buckets: int) -> list[pa.Table]:
    """Map half: symmetric adjacency rows (node, nbr) for a block of
    pairs, sliced into hash(node)%B buckets."""
    from .joins import _hash_slices
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if a_col not in block.column_names or not block.num_rows:
        return [pa.table({})] * num_buckets
    a = block[a_col]
    b = block[b_col]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    adj = pa.table({"node": pa.concat_arrays([a.cast(pa.int64()),
                                              b.cast(pa.int64())]),
                    "nbr": pa.concat_arrays([b.cast(pa.int64()),
                                             a.cast(pa.int64())])})
    out = _hash_slices(adj, "node", num_buckets)
    return out if num_buckets > 1 else out[0]


def _init_bucket(*parts: pa.Table):
    """Reduce half of the one-time adjacency exchange: a bucket's sorted
    adjacency plus its initial labels (label = node)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "nbr": pa.array([], pa.int64())})
        return empty, pa.table({"node": pa.array([], pa.int64()),
                                "label": pa.array([], pa.int64())})
    adj = pa.concat_tables(nonempty).combine_chunks()
    node = _np_col(adj, "node")
    nbr = _np_col(adj, "nbr")
    order = np.argsort(node, kind="stable")
    node = node[order]
    nbr = nbr[order]
    distinct = np.unique(node)
    return (pa.table({"node": pa.array(node), "nbr": pa.array(nbr)}),
            pa.table({"node": pa.array(distinct),
                      "label": pa.array(distinct.copy())}))


def _min_by_key(keys: np.ndarray, vals: np.ndarray):
    """(distinct_keys, min val per key) via sort + minimum.reduceat."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = vals[order]
    newg = np.ones(len(k), dtype=bool)
    newg[1:] = k[1:] != k[:-1]
    starts = np.nonzero(newg)[0]
    return k[starts], np.minimum.reduceat(v, starts)


def _slice_by_bucket(arrs: dict, key: np.ndarray, num_buckets: int,
                     _hash64) -> list[pa.Table]:
    """Slice aligned numpy columns into hash(key)%B tables."""
    buckets = (_hash64(pa.array(key)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    cols = {n: a[order] for n, a in arrs.items()}
    return [pa.table({n: pa.array(a[bounds[i]:bounds[i + 1]])
                      for n, a in cols.items()})
            for i in range(num_buckets)]


def _propagate(adj: pa.Table, labels: pa.Table, frontier,
               num_buckets: int, all_pairs: bool = False) -> list[pa.Table]:
    """One round's map half for one bucket: send the current label of
    every FRONTIER node (label changed last round; ``None`` = all, round
    0) to its neighbours, min-combined per destination before the slice
    — per-round shuffle volume tracks the shrinking frontier, not the
    full edge set.

    ``all_pairs=True`` (the contraction wave) keeps every DISTINCT
    (dest, label) pair instead of the per-destination minimum — the
    min-combine is sound for label absorption but would drop contracted
    edges a destination needs for connectivity (a dest adjacent to
    groups 5 and 9 must yield BOTH cross edges, not just the 5 one)."""
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
    if not adj.num_rows:
        return [empty] * num_buckets if num_buckets > 1 else empty
    node = _np_col(adj, "node")          # sorted by _init_bucket
    nbr = _np_col(adj, "nbr")
    if frontier is not None:
        fnode = _np_col(frontier, "node")  # sorted subset of this bucket
        if not len(fnode):
            out = [empty] * num_buckets
            return out if num_buckets > 1 else out[0]
        idx = np.clip(np.searchsorted(fnode, node), 0, len(fnode) - 1)
        sel = fnode[idx] == node
        node = node[sel]
        nbr = nbr[sel]
        if not len(node):
            out = [empty] * num_buckets
            return out if num_buckets > 1 else out[0]
    lnode = _np_col(labels, "node")      # sorted distinct == unique(node)
    llab = _np_col(labels, "label")
    own = llab[np.searchsorted(lnode, node)]
    if all_pairs:
        order = np.lexsort((own, nbr))
        dest = nbr[order]
        lab = own[order]
        keep = np.ones(len(dest), dtype=bool)
        keep[1:] = (dest[1:] != dest[:-1]) | (lab[1:] != lab[:-1])
        dest = dest[keep]
        lab = lab[keep]
    else:
        dest, lab = _min_by_key(nbr, own)
    out = _slice_by_bucket({"node": dest, "label": lab}, dest,
                           num_buckets, _hash64)
    return out if num_buckets > 1 else out[0]


def _compress_local(lnode: np.ndarray, new: np.ndarray) -> np.ndarray:
    """In-bucket path compression: while a node's label is itself a node
    of this bucket with a smaller label, chase the pointer (pure numpy,
    no exchange) — shortens chains that happen to be bucket-local."""
    for _ in range(4):
        pos = np.clip(np.searchsorted(lnode, new), 0, len(lnode) - 1)
        hit = lnode[pos] == new
        hop = np.where(hit, new[pos], new)
        if np.array_equal(hop, new):
            break
        new = np.minimum(new, hop)
    return new


def _absorb(labels: pa.Table, *msgs: pa.Table):
    """One round's reduce half for one bucket: fold incoming neighbour
    labels into the bucket's label table (plus local path compression);
    return (new_labels, frontier_of_changed_nodes, n_changed)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    empty_frontier = pa.table({"node": pa.array([], pa.int64())})
    live = [m for m in msgs if m.num_rows]
    if not labels.num_rows or not live:
        return labels, empty_frontier, 0
    lnode = _np_col(labels, "node")
    llab = _np_col(labels, "label")
    mnode = np.concatenate([_np_col(m, "node") for m in live])
    mlab = np.concatenate([_np_col(m, "label") for m in live])
    dk, dv = _min_by_key(mnode, mlab)
    # every message destination is a node of this bucket (the adjacency is
    # symmetric, so each node routes to its own hash bucket)
    pos = np.searchsorted(lnode, dk)
    new = llab.copy()
    np.minimum.at(new, pos, dv)
    new = _compress_local(lnode, new)
    changed_mask = new < llab
    changed = int(np.count_nonzero(changed_mask))
    if not changed:
        return labels, empty_frontier, 0
    return (pa.table({"node": pa.array(lnode), "label": pa.array(new)}),
            pa.table({"node": pa.array(lnode[changed_mask])}), changed)


def _cc_local(a: np.ndarray, b: np.ndarray):
    """In-memory connected components (vectorized numpy): symmetric
    edge-relax + full pointer-jumping per sweep → O(log diameter)
    sweeps.  The adjacency is sorted ONCE; each sweep is a pure
    ``minimum.reduceat`` over the presorted segments (``minimum.at`` is
    ~20× slower per element).  Returns (sorted distinct nodes,
    component min per node)."""
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    order = np.argsort(src, kind="stable")
    src = src[order]
    dst = dst[order]
    seg = np.ones(len(src), dtype=bool)
    seg[1:] = src[1:] != src[:-1]
    starts = np.nonzero(seg)[0]
    touched = src[starts]                # nodes with >=1 neighbour
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = label.copy()
        nbr_min = np.minimum.reduceat(label[dst], starts)
        new[touched] = np.minimum(new[touched], nbr_min)
        while True:
            hop = new[new]
            if np.array_equal(hop, new):
                break
            new = hop
        if np.array_equal(new, label):
            break
        label = new
    return nodes, nodes[label]


def _contract(labels: pa.Table, *msgs: pa.Table):
    """Contraction map half for one bucket: emit the still-unresolved
    structure as a small edge list — cross-label edges (label[u],
    label[v]) from the full message wave, plus the bucket's label-forest
    edges (node, label[node]).  Components of the union of these edges
    over all buckets equal the original graph's components (every
    original edge is either within one label group — reconstructed by
    the two forest edges through the shared label — or crosses groups
    and appears contracted).  Returns (deduped edge table, row count)."""
    from .sketches import limit_worker_threads

    limit_worker_threads()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if not labels.num_rows:
        return empty, 0
    lnode = _np_col(labels, "node")
    llab = _np_col(labels, "label")
    parts_a = []
    parts_b = []
    forest = llab != lnode
    parts_a.append(llab[forest])
    parts_b.append(lnode[forest])
    live = [m for m in msgs if m.num_rows]
    if live:
        dest = np.concatenate([_np_col(m, "node") for m in live])
        lab = np.concatenate([_np_col(m, "label") for m in live])
        own = llab[np.searchsorted(lnode, dest)]
        cross = lab != own
        la = np.minimum(lab[cross], own[cross])
        lb = np.maximum(lab[cross], own[cross])
        parts_a.append(la)
        parts_b.append(lb)
    a = np.concatenate(parts_a)
    b = np.concatenate(parts_b)
    if not len(a):
        return empty, 0
    order = np.lexsort((b, a))
    a = a[order]
    b = b[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    a = a[keep]
    b = b[keep]
    return pa.table({"a": pa.array(a), "b": pa.array(b)}), int(len(a))


def _resolve(labels: pa.Table, cmap) -> pa.Table:
    """Apply the driver-solved component map to a bucket's labels."""
    import ray

    from .sketches import limit_worker_threads

    limit_worker_threads()
    if not labels.num_rows:
        return labels
    nodes, comp = ray.get(cmap) if isinstance(cmap, ray.ObjectRef) else cmap
    llab = _np_col(labels, "label")
    if not len(nodes):
        return labels
    pos = np.clip(np.searchsorted(nodes, llab), 0, len(nodes) - 1)
    hit = nodes[pos] == llab
    final = np.where(hit, comp[pos], llab)
    return pa.table({"node": labels["node"], "label": pa.array(final)})


def _merge_frontier(f1: pa.Table, f2: pa.Table) -> pa.Table:
    from .sketches import limit_worker_threads

    limit_worker_threads()
    if not f1.num_rows:
        return f2
    if not f2.num_rows:
        return f1
    return pa.table({"node": pa.array(np.union1d(_np_col(f1, "node"),
                                                 _np_col(f2, "node")))})


def _jump_queries(labels: pa.Table, num_buckets: int) -> list[pa.Table]:
    """Pointer-jump map half: every non-root node asks its label's bucket
    for the label's own label (``label[label[node]]``)."""
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    empty = pa.table({"dest": pa.array([], pa.int64()),
                      "req": pa.array([], pa.int64())})
    if not labels.num_rows:
        return [empty] * num_buckets if num_buckets > 1 else empty
    node = _np_col(labels, "node")
    lab = _np_col(labels, "label")
    mask = lab != node
    dest = lab[mask]
    req = node[mask]
    buckets = (_hash64(pa.array(dest)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    dest = dest[order]
    req = req[order]
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [pa.table({"dest": pa.array(dest[bounds[i]:bounds[i + 1]]),
                     "req": pa.array(req[bounds[i]:bounds[i + 1]])})
           for i in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


def _jump_answers(labels: pa.Table, num_buckets: int,
                  *queries: pa.Table) -> list[pa.Table]:
    """Pointer-jump reduce half: answer each query with the queried
    node's current label, routed back to the requester's bucket as a
    normal (node, label) message for ``_absorb``.  Every label value is
    a real node id (labels start as self and only ever take other
    nodes' ids), so the lookup always hits."""
    from .sketches import _hash64, limit_worker_threads

    limit_worker_threads()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
    live = [q for q in queries if q.num_rows]
    if not labels.num_rows or not live:
        return [empty] * num_buckets if num_buckets > 1 else empty
    lnode = _np_col(labels, "node")
    llab = _np_col(labels, "label")
    dest = np.concatenate([_np_col(q, "dest") for q in live])
    req = np.concatenate([_np_col(q, "req") for q in live])
    ans = llab[np.searchsorted(lnode, dest)]
    buckets = (_hash64(pa.array(req)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    req = req[order]
    ans = ans[order]
    sb = buckets[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    out = [pa.table({"node": pa.array(req[bounds[i]:bounds[i + 1]]),
                     "label": pa.array(ans[bounds[i]:bounds[i + 1]])})
           for i in range(num_buckets)]
    return out if num_buckets > 1 else out[0]


def _pairs_buckets(pairs) -> int:
    """Bucket count for the iterative exchange.  Unlike one-shot joins
    (sized purely by reduce-input bytes), every ROUND here launches one
    task wave per bucket — so the floor is the cluster's CPU count, or
    waves under-fill the cluster and round latency, not data volume,
    dominates.  The byte-based ceiling still applies for huge graphs."""
    import ray

    from .joins import _MAX_BUCKETS, _TARGET_BUCKET_BYTES, _auto_buckets, \
        _estimate_bytes

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if isinstance(pairs, pa.Table):
        by_bytes = math.ceil(2 * pairs.nbytes / _TARGET_BUCKET_BYTES)
    else:
        est = _estimate_bytes(pairs)
        by_bytes = _auto_buckets(pairs) if est is not None else 16
    return int(min(_MAX_BUCKETS, max(cpus, by_bytes)))


def connected_components(pairs, *, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         num_buckets: int | None = None,
                         max_rounds: int = 64,
                         local_max_bytes: int = 64 << 20,
                         contract_max_bytes: int = 256 << 20) -> pa.Table:
    """Connected components of the undirected pair graph → one
    ``(doc_id, component)`` row per node, component = min doc_id reachable.

    ``pairs`` is a ``pa.Table`` or ``ray.data.Dataset`` with two int64
    id columns.  The result covers only nodes that appear in some pair
    (documents with no near-duplicate are their own implicit component).

    Size-switched plan (same pattern as the two-phase exact dedup):

    * a driver table under ``local_max_bytes`` runs the in-memory
      vectorized kernel directly — no task waves for small pair sets;
    * otherwise, distributed hash-min rounds; from round ``_JUMP_AFTER``
      on, the loop tries CONTRACTION — one full message wave emits the
      unresolved structure (cross-label edges + label-forest edges),
      and if that fits ``contract_max_bytes`` the driver solves it
      in-memory and broadcasts the component map back (one resolve
      wave), ending the loop.  A contracted graph still too big logs
      and keeps iterating (pointer-jump-accelerated) — no silent cap.
    """
    import ray

    from .blocks import iter_block_refs
    from .exchange import bounded_map_refs

    if isinstance(pairs, pa.Table) and pairs.nbytes <= local_max_bytes:
        if not pairs.num_rows:
            return _EMPTY_COMPONENTS
        nodes, comp = _cc_local(
            _np_col(pairs, a_col).astype(np.int64),
            _np_col(pairs, b_col).astype(np.int64))
        return pa.table({"doc_id": pa.array(nodes),
                         "component": pa.array(comp)})

    global _ADJ_REMOTE, _INIT_REMOTE, _PROP_REMOTE, _ABSORB_REMOTE, \
        _JQ_REMOTE, _JA_REMOTE, _MERGEF_REMOTE, _CONTRACT_REMOTE, \
        _RESOLVE_REMOTE
    if _ADJ_REMOTE is None:
        _ADJ_REMOTE = ray.remote(_adj_slices)
        _INIT_REMOTE = ray.remote(num_returns=2)(_init_bucket)
        _PROP_REMOTE = ray.remote(_propagate)
        _ABSORB_REMOTE = ray.remote(num_returns=3)(_absorb)
        _JQ_REMOTE = ray.remote(_jump_queries)
        _JA_REMOTE = ray.remote(_jump_answers)
        _MERGEF_REMOTE = ray.remote(_merge_frontier)
        _CONTRACT_REMOTE = ray.remote(num_returns=2)(_contract)
        _RESOLVE_REMOTE = ray.remote(_resolve)

    if isinstance(pairs, pa.Table):
        if not pairs.num_rows:
            return _EMPTY_COMPONENTS
        refs = [ray.put(pairs)]
    else:
        refs = iter_block_refs(pairs)
    if num_buckets is None:
        num_buckets = _pairs_buckets(pairs)

    map_out = bounded_map_refs(
        refs,
        lambda ref: _ADJ_REMOTE.options(num_returns=num_buckets)
        .remote(ref, a_col, b_col, num_buckets),
        num_buckets)
    adj_refs, label_refs = [], []
    for b in range(num_buckets):
        a_ref, l_ref = _INIT_REMOTE.remote(*[m[b] for m in map_out])
        adj_refs.append(a_ref)
        label_refs.append(l_ref)

    # Rounds: plain hash-min propagation (one message exchange) converges
    # in diameter rounds — enough for near-dup graphs (cliques + short
    # chains).  From round _JUMP_AFTER on, each round ADDS a
    # pointer-jumping exchange (label[node] <- label[label[node]]), which
    # halves the remaining distance-to-root per round, so pathological
    # chains converge in O(log diameter) total — the common short case
    # never pays the extra waves.
    frontier_refs = [None] * num_buckets  # round 0: every node broadcasts
    for rnd in range(max_rounds):
        prop = [_PROP_REMOTE.options(num_returns=num_buckets)
                .remote(adj_refs[b], label_refs[b], frontier_refs[b],
                        num_buckets)
                for b in range(num_buckets)]
        if num_buckets == 1:
            prop = [[p] for p in prop]
        changed_refs = []
        new_labels = []
        new_frontiers = []
        for b in range(num_buckets):
            l_ref, f_ref, c_ref = _ABSORB_REMOTE.remote(
                label_refs[b], *[p[b] for p in prop])
            new_labels.append(l_ref)
            new_frontiers.append(f_ref)
            changed_refs.append(c_ref)
        label_refs = new_labels
        frontier_refs = new_frontiers
        n_changed = sum(ray.get(changed_refs))
        if contract_max_bytes and rnd + 1 >= _JUMP_AFTER and n_changed:
            full = [_PROP_REMOTE.options(num_returns=num_buckets)
                    .remote(adj_refs[b], label_refs[b], None, num_buckets,
                            True)
                    for b in range(num_buckets)]
            if num_buckets == 1:
                full = [[f] for f in full]
            cont = [_CONTRACT_REMOTE.remote(label_refs[b],
                                            *[f[b] for f in full])
                    for b in range(num_buckets)]
            n_rows = sum(ray.get([c[1] for c in cont]))
            if n_rows * 16 <= contract_max_bytes:
                parts = [t for t in ray.get([c[0] for c in cont])
                         if t.num_rows]
                if parts:
                    ct = pa.concat_tables(parts).combine_chunks()
                    cmap = _cc_local(_np_col(ct, "a"), _np_col(ct, "b"))
                    cmap_ref = ray.put(cmap)
                    label_refs = [_RESOLVE_REMOTE.remote(label_refs[b],
                                                         cmap_ref)
                                  for b in range(num_buckets)]
                logger.info(
                    "connected_components: contracted to %d edges at "
                    "round %d, solved on driver", n_rows, rnd + 1)
                break
            logger.info(
                "connected_components: contraction deferred at round %d "
                "(%d edges > %d bytes budget), continuing rounds",
                rnd + 1, n_rows, contract_max_bytes)
        if rnd + 1 >= _JUMP_AFTER and n_changed:
            jq = [_JQ_REMOTE.options(num_returns=num_buckets)
                  .remote(label_refs[b], num_buckets)
                  for b in range(num_buckets)]
            if num_buckets == 1:
                jq = [[q] for q in jq]
            ja = [_JA_REMOTE.options(num_returns=num_buckets)
                  .remote(label_refs[b], num_buckets,
                          *[q[b] for q in jq])
                  for b in range(num_buckets)]
            if num_buckets == 1:
                ja = [[a] for a in ja]
            new_labels = []
            new_frontiers = []
            for b in range(num_buckets):
                l_ref, f_ref, _c = _ABSORB_REMOTE.remote(
                    label_refs[b], *[a[b] for a in ja])
                new_labels.append(l_ref)
                # a jump-lowered label must re-broadcast next round
                new_frontiers.append(_MERGEF_REMOTE.remote(
                    frontier_refs[b], f_ref))
            label_refs = new_labels
            frontier_refs = new_frontiers
        if not n_changed:
            logger.info("connected_components: converged after %d rounds",
                        rnd + 1)
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            f"rounds ({n_changed} labels still changing) — the pair graph "
            f"has a path longer than the jump-accelerated bound; raise "
            f"max_rounds")

    parts = [t for t in ray.get(label_refs) if t.num_rows]
    if not parts:
        return _EMPTY_COMPONENTS
    out = pa.concat_tables(parts).combine_chunks()
    return (out.rename_columns(["doc_id", "component"])
            .sort_by([("doc_id", "ascending")]))


def filter_canonical(docs_ds, components: pa.Table,
                     id_col: str = "doc_id"):
    """Keep only canonical documents: rows whose id is absent from the
    component map (no near-duplicate) or IS its component's minimum.
    The map is broadcast once (`ray.put`) and each batch does two
    ``np.searchsorted`` lookups — no shuffle of the corpus."""
    import ray

    node = np.sort(np.asarray(_np_col(components, "doc_id"))) \
        if components.num_rows else np.empty(0, np.int64)
    comp = _np_col(components.sort_by([("doc_id", "ascending")]),
                   "component") if components.num_rows \
        else np.empty(0, np.int64)
    map_ref = ray.put((node, comp))

    def keep(t: pa.Table, m=map_ref) -> pa.Table:
        import ray as _ray
        nodes, comps = _ray.get(m)  # closure-captured ref: explicit get
        # (zero-copy view of the shared object-store buffer per worker)
        if not len(nodes) or not t.num_rows:
            return t
        ids = _np_col(t, id_col)
        pos = np.searchsorted(nodes, ids)
        pos_c = np.clip(pos, 0, len(nodes) - 1)
        member = nodes[pos_c] == ids
        drop = member & (comps[pos_c] != ids)
        return t.filter(pa.array(~drop))

    return docs_ds.map_batches(keep, batch_format="pyarrow")
