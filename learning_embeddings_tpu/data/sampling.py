"""Index samplers: shuffling and class-balanced weighted resampling.

``WeightedResampler`` mirrors the reference's inverse / inverse-sqrt
leaf-frequency `WeightedRandomSampler` with replacement
(experiment.py:227-251): per-sample probability ∝ 1/count(leaf) or
1/sqrt(count(leaf)), drawing len(dataset) indices per epoch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["WeightedResampler", "shuffled_order"]


def shuffled_order(n: int, rng: np.random.RandomState) -> np.ndarray:
    return rng.permutation(n)


class WeightedResampler:
    def __init__(self, leaf_labels: np.ndarray, n_leaf: int,
                 weight_strategy: str = "inv"):
        """weight_strategy ∈ {'inv', 'inv_sqrt'} (reference
        experiment.py:236-244)."""
        counts = np.bincount(leaf_labels, minlength=n_leaf).astype(np.float64)
        counts = np.maximum(counts, 1.0)
        if weight_strategy == "inv":
            w = 1.0 / counts
        elif weight_strategy == "inv_sqrt":
            w = 1.0 / np.sqrt(counts)
        else:
            raise ValueError(f"unknown weight_strategy {weight_strategy!r}")
        per_sample = w[leaf_labels]
        self.probs = per_sample / per_sample.sum()
        self.n = len(leaf_labels)

    def order(self, rng: np.random.RandomState,
              n_draws: Optional[int] = None) -> np.ndarray:
        """Sample with replacement (torch WeightedRandomSampler semantics)."""
        return rng.choice(self.n, size=n_draws or self.n, replace=True,
                          p=self.probs)
