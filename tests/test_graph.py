"""Hierarchy-graph tests: closure, negatives, split determinism."""

import numpy as np

from learning_embeddings_tpu.hierarchy import (
    label_graph_from_paths,
    negative_adjacency,
    split_edges,
    toy_labelmap,
    transitive_closure,
)


def chain_adj(n):
    A = np.zeros((n, n), dtype=bool)
    for i in range(n - 1):
        A[i, i + 1] = True
    return A


def test_transitive_closure_chain():
    A = chain_adj(5)
    C = transitive_closure(A)
    # closure of a chain = strict upper triangle
    expect = np.triu(np.ones((5, 5), dtype=bool), k=1)
    np.testing.assert_array_equal(C, expect)


def test_transitive_closure_matches_networkx():
    import networkx as nx

    rng = np.random.RandomState(0)
    n = 20
    # random DAG: edges only i -> j for i < j
    A = np.triu(rng.rand(n, n) < 0.15, k=1)
    C = transitive_closure(A)
    G = nx.from_numpy_array(A, create_using=nx.DiGraph)
    Gtc = nx.transitive_closure(G)
    expect = np.zeros((n, n), dtype=bool)
    for u, v in Gtc.edges():
        expect[u, v] = True
    np.testing.assert_array_equal(C, expect)


def test_negative_adjacency():
    A = chain_adj(3)
    C = transitive_closure(A)
    N = negative_adjacency(C)
    assert not N.diagonal().any()
    assert not N[0, 1] and not N[0, 2] and not N[1, 2]
    assert N[1, 0] and N[2, 0] and N[2, 1]


def test_label_graph_from_paths():
    lm = toy_labelmap(branching=2, n_levels=3)  # levels (2, 4, 8)
    # one sample down path 0 -> 0 -> 0, one down 1 -> 3 -> 7
    ll = np.array([[0, 0, 0], [1, 3, 7]])
    A = label_graph_from_paths(ll, lm)
    assert A[0, 2]          # L0_0 -> L1_0 (global 2)
    assert A[2, 6]          # L1_0 -> L2_0 (global 6)
    assert A[1, 5] and A[5, 13]
    assert A.sum() == 4


def test_split_edges_protocol():
    lm = toy_labelmap(branching=3, n_levels=3)
    paths = lm.leaf_paths()
    A = label_graph_from_paths(paths, lm)
    n_basic = int(A.sum())          # 9 + 27 = 36
    splits = split_edges(A, proportion_of_nb_edges_in_train=0.5, seed=0)
    n_nb = int(splits.closure.sum()) - n_basic  # grandparent edges: 27
    assert n_nb == 27
    n_val = int(0.05 * n_nb)
    assert len(splits.val) == n_val and len(splits.test) == n_val
    assert len(splits.train) == n_basic + int(0.5 * n_nb)
    # determinism
    splits2 = split_edges(A, proportion_of_nb_edges_in_train=0.5, seed=0)
    np.testing.assert_array_equal(splits.train, splits2.train)
    np.testing.assert_array_equal(splits.val, splits2.val)
    # val/test disjoint from each other and from train extras
    def as_set(e):
        return {tuple(r) for r in e}
    assert not (as_set(splits.val) & as_set(splits.test))
    assert not (as_set(splits.val) & as_set(splits.train))
    # negatives exclude closure & diagonal
    assert not (splits.negatives & splits.closure).any()
    assert not splits.negatives.diagonal().any()


def test_transitive_closure_many_paths_no_overflow():
    """Path COUNTS through the closure can exceed 255 — the reachability
    squaring must not wrap (uint8 matmul regression: root -> 256 middles ->
    sink used to lose the root->sink edge)."""
    n = 258
    adj = np.zeros((n, n), bool)
    adj[0, 1:257] = True      # root -> 256 middle nodes
    adj[1:257, 257] = True    # each middle -> sink
    closure = transitive_closure(adj)
    assert closure[0, 257]
    assert closure[0].sum() == 257   # root reaches everything
