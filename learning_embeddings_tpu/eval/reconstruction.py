"""Hierarchy graph-reconstruction quality check.

The reference's `check_graph_embedding` (order_embeddings.py:512-559,
oe_h.py:2180-2247) scores ALL transitive-closure edges as positives and ALL
O(N²) non-edges as negatives over the label-only subgraph, in host-side
chunks of 100 pairs. Here the full pairwise energy matrix comes from the
tiled device kernels in geometry.pairwise, and the threshold sweep from
eval.threshold — one device program each.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..geometry import pairwise_energy_sharded
from .threshold import ThresholdMetrics, best_threshold_metrics, threshold_metrics

__all__ = ["reconstruction_metrics"]


def reconstruction_metrics(
    embeddings,
    closure: np.ndarray,
    energy: str = "hyp_cone",
    threshold: Optional[float] = None,
    mesh=None,
    **energy_kw,
) -> ThresholdMetrics:
    """F1/acc/P/R of reconstructing `closure` from pairwise energies.

    embeddings: (N, D) node embeddings (labels only, per the reference's
    restriction at oe_h.py:2185-2198). closure: (N, N) bool transitive
    closure. Positives = closure edges; negatives = non-edges minus the
    diagonal. With `threshold=None` the best-F1 threshold is swept
    (val/checkpoint path); otherwise metrics at the fixed threshold.
    With a mesh, the O(N²) energy matrix shards its columns over 'data'
    (the reference chunks host-side on one GPU, oe_h.py:2180-2247)."""
    E = np.asarray(pairwise_energy_sharded(energy, embeddings, embeddings,
                                           mesh=mesh, **energy_kw))
    closure = np.asarray(closure, dtype=bool)
    n = closure.shape[0]
    offdiag = ~np.eye(n, dtype=bool)
    e_pos = E[closure]
    e_neg = E[(~closure) & offdiag]
    if threshold is None:
        return best_threshold_metrics(jnp.asarray(e_pos), jnp.asarray(e_neg))
    return threshold_metrics(jnp.asarray(e_pos), jnp.asarray(e_neg),
                             jnp.asarray(threshold))
