"""Hierarchy graphs as dense boolean adjacency matrices.

Replaces the reference's networkx usage (graph build at
order_embeddings.py:363-371, transitive closure + negative adjacency +
edge splits at order_embeddings.py:397-497, combined image+label graphs at
oe.py:417-491) with numpy boolean matrix algebra:

* transitive closure by repeated boolean squaring (O(log N) matmuls — XLA /
  BLAS friendly, no per-edge python),
* the negative-edge adjacency is ``~closure & ~I``,
* edge splits are seeded draws over the non-basic (transitive-only) edges,
  mirroring the 5%/5%/train-proportion protocol of create_splits
  (order_embeddings.py:430-470).

Node ids are global labelmap indices for labels; image nodes (joint
training) get ids ``n_labels + image_index`` — the same int-coding idea the
reference applies in its `mapping_node_to_ix` (order_embeddings.py:404-414).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "transitive_closure",
    "negative_adjacency",
    "label_graph_from_paths",
    "EdgeSplits",
    "split_edges",
    "edges_from_adjacency",
]


def transitive_closure(adj: np.ndarray) -> np.ndarray:
    """Boolean transitive closure (excluding self-loops) of a DAG adjacency.

    Repeated boolean squaring: reach = adj | adj@adj | ...; converges in
    O(log(depth)) rounds. Matches nx.transitive_closure semantics for DAGs
    (reference order_embeddings.py:371)."""
    reach = adj.astype(bool).copy()
    while True:
        # float32 matmul: path COUNTS can exceed 255, so uint8 would wrap
        # mod 256 and silently drop reachable edges (any positive float32
        # sum stays > 0 — addition of positives never rounds to zero)
        new = reach | (reach.astype(np.float32) @ reach.astype(np.float32)
                       > 0)
        if (new == reach).all():
            return new
        reach = new


def negative_adjacency(closure: np.ndarray) -> np.ndarray:
    """All-ones minus closure edges minus the diagonal: True where (u, v) is
    a *negative* (non-entailed) pair (reference order_embeddings.py:417-423)."""
    A = ~closure.astype(bool)
    np.fill_diagonal(A, False)
    return A


def label_graph_from_paths(level_labels: np.ndarray, labelmap) -> np.ndarray:
    """Dense (n_classes, n_classes) direct-edge adjacency built from observed
    per-sample level-label paths (reference builds edges
    level_l -> level_{l+1} per sample, order_embeddings.py:363-371).

    `level_labels`: (N, n_levels) relative labels per sample. Only edges
    observed in the data are added (matches the reference, which adds edges
    per dataset sample rather than from the full taxonomy)."""
    level_labels = np.asarray(level_labels)
    n = labelmap.n_classes
    A = np.zeros((n, n), dtype=bool)
    glob = level_labels + labelmap.level_start[None, :]
    for l in range(labelmap.n_levels - 1):
        A[glob[:, l], glob[:, l + 1]] = True
    return A


@dataclasses.dataclass
class EdgeSplits:
    """Edge-level train/val/test splits over a transitive closure.

    ``train`` holds the basic (direct) edges plus a proportion of non-basic
    (transitive-only) edges; ``val``/``test`` each hold 5% of the non-basic
    edges, disjointly (reference create_splits, order_embeddings.py:430-470).
    Each field is an (E, 2) int array of (u, v) global node ids."""

    train: np.ndarray
    val: np.ndarray
    test: np.ndarray
    closure: np.ndarray          # (n, n) bool transitive closure
    negatives: np.ndarray        # (n, n) bool negative adjacency


def edges_from_adjacency(adj: np.ndarray) -> np.ndarray:
    """(E, 2) int32 edge list in row-major (u, then v) order."""
    u, v = np.nonzero(adj)
    return np.stack([u, v], axis=1).astype(np.int32)


def split_edges(
    basic_adj: np.ndarray,
    *,
    proportion_of_nb_edges_in_train: float = 0.0,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    seed: int = 0,
) -> EdgeSplits:
    """Split closure edges following the reference protocol
    (order_embeddings.py:397-470): all basic edges go to train; of the
    non-basic (closure-only) edges, `val_frac` to val, `test_frac` to test
    (disjoint), and `proportion_of_nb_edges_in_train` of the remainder is
    added to train."""
    closure = transitive_closure(basic_adj)
    negatives = negative_adjacency(closure)

    nb_adj = closure & ~basic_adj.astype(bool)
    nb_edges = edges_from_adjacency(nb_adj)
    n_nb = len(nb_edges)

    rng = np.random.RandomState(seed)
    perm = rng.permutation(n_nb)
    n_val = int(val_frac * n_nb)
    n_test = int(test_frac * n_nb)
    val_ix = perm[:n_val]
    test_ix = perm[n_val:n_val + n_test]
    rest_ix = perm[n_val + n_test:]
    n_train_extra = int(proportion_of_nb_edges_in_train * n_nb)
    train_extra_ix = rest_ix[:n_train_extra]

    train = np.concatenate(
        [edges_from_adjacency(basic_adj), nb_edges[train_extra_ix]], axis=0
    )
    return EdgeSplits(
        train=train.astype(np.int32),
        val=nb_edges[val_ix].astype(np.int32),
        test=nb_edges[test_ix].astype(np.int32),
        closure=closure,
        negatives=negatives,
    )
