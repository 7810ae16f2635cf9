"""Connected components + canonical filter (engine/components.py)."""

import numpy as np
import pyarrow as pa
import pytest

from yaschva_ray.engine.components import (
    connected_components,
    filter_canonical,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return pa.table({"doc_a": pa.array(list(a), pa.int64()),
                     "doc_b": pa.array(list(b), pa.int64())})


def _reference_components(edges):
    """Driver-side union-find (path compression) — the oracle."""
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_clique_singleton_local_path(ray_session):
    # small pa.Table input takes the in-memory vectorized kernel
    comp = connected_components(
        _pairs([(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
                (20, 21)]))
    assert comp.to_pydict() == {
        "doc_id": [1, 2, 3, 4, 10, 11, 12, 20, 21],
        "component": [1, 1, 1, 1, 10, 10, 10, 20, 20]}


def test_chain_clique_singleton_distributed(ray_session):
    comp = connected_components(
        _pairs([(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
                (20, 21)]), num_buckets=4, local_max_bytes=0)
    assert comp.to_pydict() == {
        "doc_id": [1, 2, 3, 4, 10, 11, 12, 20, 21],
        "component": [1, 1, 1, 1, 10, 10, 10, 20, 20]}


def test_long_chain_converges_without_contraction(ray_session):
    # a 120-node path on the pure propagation+pointer-jumping path
    # (contraction disabled) exercises the O(log diameter) acceleration
    edges = [(i, i + 1) for i in range(120)]
    comp = connected_components(_pairs(edges), num_buckets=4,
                                local_max_bytes=0, contract_max_bytes=0)
    assert comp.num_rows == 121
    assert set(comp["component"].to_pylist()) == {0}


def test_random_graph_matches_union_find(ray_session):
    # forced-distributed: contraction fires (round >= 3) and the driver
    # solve must agree with the union-find reference
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, 400, size=(300, 2)) if a != b]
    ref = _reference_components(edges)
    for kwargs in ({"contract_max_bytes": 0}, {}):
        comp = connected_components(_pairs(edges), num_buckets=8,
                                    local_max_bytes=0, **kwargs)
        got = dict(zip(comp["doc_id"].to_pylist(),
                       comp["component"].to_pylist()))
        assert got == ref
    # and the local kernel agrees too
    comp = connected_components(_pairs(edges))
    got = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    assert got == ref


def test_cc_local_fuzz_vs_union_find():
    """The in-memory kernel (the small-input fast path AND the
    contraction finisher) differentially fuzzed against union-find
    across many random topologies — no Ray needed."""
    from yaschva_ray.engine.components import _cc_local

    for seed in range(25):
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(2, 300))
        n_edges = int(rng.integers(1, 500))
        a = rng.integers(0, n_nodes, size=n_edges)
        b = rng.integers(0, n_nodes, size=n_edges)
        m = a != b
        if not m.any():
            continue
        edges = list(zip(a[m].tolist(), b[m].tolist()))
        nodes, comp = _cc_local(a[m].astype(np.int64), b[m].astype(np.int64))
        ref = _reference_components(edges)
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == ref, f"seed {seed}"


def test_dataset_input_multiblock(ray_session):
    import ray.data

    edges = [(i, i + 1) for i in range(50)] + [(100, 101), (103, 101)]
    ds = ray.data.from_arrow(_pairs(edges)).repartition(5)
    comp = connected_components(ds, num_buckets=4)
    ref = _reference_components(edges)
    got = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    assert got == ref


def test_empty_pairs(ray_session):
    comp = connected_components(_pairs([]))
    assert comp.num_rows == 0
    assert comp.schema == pa.schema([("doc_id", pa.int64()),
                                     ("component", pa.int64())])


def test_max_rounds_raises_loudly(ray_session):
    edges = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(edges), num_buckets=2, max_rounds=3,
                             local_max_bytes=0, contract_max_bytes=0)


def test_filter_canonical(ray_session):
    import ray.data

    comp = connected_components(_pairs([(1, 2), (2, 3), (10, 11)]))
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(list(range(15)), pa.int64())}))
    kept = pa.Table.from_pandas(
        filter_canonical(docs, comp).to_pandas())["doc_id"].to_pylist()
    assert sorted(kept) == [0, 1, 4, 5, 6, 7, 8, 9, 10, 12, 13, 14]


def test_filter_canonical_empty_components(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([5, 6], pa.int64())}))
    kept = pa.Table.from_pandas(filter_canonical(
        docs, connected_components(_pairs([]))).to_pandas())
    assert sorted(kept["doc_id"].to_pylist()) == [5, 6]


def test_neardup_queries_consistent(ray_session):
    """q_dedup_keep_canonical == augmented ids minus non-canonical members
    of q_neardup_components — the two queries agree on the same run."""
    from yaschva_ray.pipelines.textops import (
        q_dedup_keep_canonical,
        q_neardup_components,
    )

    comp = q_neardup_components(SF_DIR)
    kept = set(q_dedup_keep_canonical(SF_DIR)["doc_id"].to_pylist())
    ids = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    # planted copies (doc_id >= 10_000_000) are never canonical: the
    # original doc with the same text has a smaller id
    assert all(c < 10_000_000 for c in ids.values())
    for doc, c in ids.items():
        assert (doc in kept) == (doc == c)
    # every component representative is kept, and components are closed
    # under representation (component of a rep is itself)
    for doc, c in ids.items():
        assert ids[c] == c
