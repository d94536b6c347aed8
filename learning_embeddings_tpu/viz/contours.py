"""2-D bottleneck-head analysis — counterpart of `network/plot_contours.py`
(:21-330) and the per-eval label plots of the 2-d CNN variant
(`ETHEC2D.plot_label_representations`, ethec_experiments.py:155-200):
plot each level's weight vectors of the bias-free per-level linears, and
the dot-product "Voronoi" decision regions over the 2-d feature plane."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["plot_label_vectors", "plot_dot_product_voronoi"]


def plot_label_vectors(level_weights, labelmap, save_path: str,
                       title: str = "") -> None:
    """level_weights: list per level of (2, n_level) or (n_level, 2) weight
    matrices (the bottleneck2d head's per-level kernels)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    colors = plt.cm.viridis(np.linspace(0, 0.9, labelmap.n_levels))
    for l, W in enumerate(level_weights):
        W = np.asarray(W)
        if W.shape[0] == 2:
            W = W.T                       # (n, 2)
        for i in range(W.shape[0]):
            ax.annotate("", xy=W[i], xytext=(0, 0),
                        arrowprops=dict(arrowstyle="->", color=colors[l],
                                        alpha=0.7))
        ax.scatter(W[:, 0], W[:, 1], color=colors[l], s=18,
                   label=labelmap.level_names[l])
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    ax.set_title(title or "2-d label representations")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=130)
    plt.close(fig)


def plot_dot_product_voronoi(W: np.ndarray, save_path: str,
                             extent: float = 3.0, res: int = 400,
                             title: str = "") -> np.ndarray:
    """argmax_i ⟨w_i, z⟩ over a grid of 2-d features z — the dot-product
    Voronoi regions of one level's classes (plot_contours.py:120-200)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    W = np.asarray(W)
    if W.shape[0] == 2:
        W = W.T
    xs = np.linspace(-extent, extent, res)
    X, Y = np.meshgrid(xs, xs)
    Z = np.stack([X.ravel(), Y.ravel()], axis=1)      # (res², 2)
    region = np.argmax(Z @ W.T, axis=1).reshape(res, res)

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(region, origin="lower", extent=[-extent, extent, -extent, extent],
              cmap="tab20", alpha=0.6)
    ax.scatter(W[:, 0], W[:, 1], color="k", s=20)
    ax.set_title(title or "dot-product Voronoi")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=130)
    plt.close(fig)
    return region
