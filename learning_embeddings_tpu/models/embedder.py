"""Label-embedding tables and image-feature embedding nets (Flax).

Rebuilds the reference's embedding modules:

* ``LabelEmbedder`` — one table, four geometry modes:
  - ``euclidean``  : raw table (order embeddings,
    order_embeddings.py:179-193 with K=None)
  - ``euc_cone``   : radial shift x̂·(‖x‖+K) guaranteeing ‖x‖ ≥ K
    (order_embeddings.py:195-200 `soft_clip`, K = 3.0)
  - ``hyp_cone``   : +1e-15 offset then annulus projection into
    [inner_radius(K), 1−1e−5] (order_embeddings_h.py:181-228, K = 0.1)
  - ``hyp_cone_exp0``: exp₀-style squash tanh(atanh(r₀)+‖x‖)·x̂ then
    annulus projection (oe_h.py:51-105) — the joint-trainer variant.
  Hyperbolic modes initialize rows at norm inner_radius + U[0, 0.05]
  (order_embeddings_h.py:198-203); Euclidean modes use N(0, 1) like
  torch nn.Embedding.

* ``FeatNet`` — linear image-feature projector (2048-d fc7 → dim) with the
  same geometry post-maps (oe.py:83-130 Euclidean; oe_h.py:113-211
  hyperbolic exp₀). ``FeatCNN``-style end-to-end backbones compose a
  models.resnet trunk with this head.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry import (
    exp_map_zero_shifted,
    inner_radius,
    project_annulus,
)

__all__ = ["LabelEmbedder", "FeatNet", "geometry_map", "hyperbolic_init"]

MODES = ("euclidean", "euc_cone", "hyp_cone", "hyp_cone_exp0")


def geometry_map(x: jnp.ndarray, mode: str, K: Optional[float]) -> jnp.ndarray:
    """Apply the per-mode geometry post-map to raw embedding vectors."""
    if mode == "euclidean":
        return x
    if mode == "euc_cone":
        n = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))
        return x / n * (n + K)
    r0 = inner_radius(K)
    if mode == "hyp_cone":
        return project_annulus(x + 1e-15, r0)
    if mode == "hyp_cone_exp0":
        return project_annulus(exp_map_zero_shifted(x, r0), r0)
    raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")


def hyperbolic_init(K: float):
    """Row-norm init at inner_radius + U[0, 0.05] with N(0,1) directions
    (order_embeddings_h.py:198-203)."""
    r0 = inner_radius(K)

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, shape, dtype)
        n = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))
        target = r0 + jax.random.uniform(k2, (shape[0], 1), dtype) * 0.05
        return x / n * target

    return init


class LabelEmbedder(nn.Module):
    """nn.Embed + geometry post-map."""

    n_nodes: int
    dim: int
    mode: str = "euclidean"
    K: Optional[float] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        if self.mode in ("hyp_cone", "hyp_cone_exp0"):
            init = hyperbolic_init(self.K)
        else:
            init = nn.initializers.normal(stddev=1.0)
        table = self.param("embedding", init, (self.n_nodes, self.dim))
        return geometry_map(jnp.take(table, ids, axis=0), self.mode, self.K)


class FeatNet(nn.Module):
    """Image-feature projector fc7(2048) → dim with geometry post-map.

    `mode='hyp_cone_exp0'` reproduces the oe_h FeatNet forward: linear →
    +1e-15 → exp₀ squash → annulus clip (oe_h.py:168-211)."""

    dim: int
    mode: str = "euclidean"
    K: Optional[float] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, name="fc1")(feats)
        return geometry_map(x, self.mode, self.K)


class MatrixApproximation(nn.Module):
    """Low-parameter image projector W = pad(diag(d)) + u·vᵀ
    (reference `MatrixApproximation`, oe.py:233-289): a diagonal map from
    the first `dim` feature coordinates plus a rank-1 correction over the
    full feature vector, with the same geometry post-map."""

    dim: int
    mode: str = "euclidean"
    K: Optional[float] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        F = feats.shape[-1]
        d = self.param("diag", nn.initializers.ones, (self.dim,))
        u = self.param("u", nn.initializers.normal(0.01), (self.dim,))
        v = self.param("v", nn.initializers.normal(0.01), (F,))
        x = feats[..., : self.dim] * d + jnp.outer(feats @ v, u).reshape(
            feats.shape[:-1] + (self.dim,))
        return geometry_map(x, self.mode, self.K)


class FeatCNN(nn.Module):
    """End-to-end image tower: CNN trunk → dim projection → geometry map
    (the reference's FeatCNN18 / FeatCNN used with --use_CNN,
    oe_h.py:213-378)."""

    backbone: str
    dim: int
    mode: str = "euclidean"
    K: Optional[float] = None
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False   # rematerialize trunk blocks (memory vs FLOPs)
    bn_stats_dtype: str = "float32"  # 'bfloat16' = half-precision BN stat
    #   sweeps in the trunk (see resnet.GhostBatchNorm.stats_dtype)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .resnet import BACKBONES

        trunk = BACKBONES[self.backbone](
            num_classes=None, features_only=True, dtype=self.dtype,
            remat=self.remat, bn_stats_dtype=self.bn_stats_dtype,
            name="trunk")
        feats = trunk(images, train=train)
        x = nn.Dense(self.dim, name="fc")(feats)
        return geometry_map(x, self.mode, self.K)
