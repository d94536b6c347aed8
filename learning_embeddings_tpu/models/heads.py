"""Classifier heads + the backbone/head assembly.

Mirrors the reference's head surgery (finetuner.py:140-174): the head shape
is chosen by the training criterion —

* ``multi_head``   : one Dense over all n_classes (MultiLevelCE,
  MaskedCE, MultiLabelSM)
* ``leaf``         : Dense over the last level only (LastLevelCELoss)
* ``hsoftmax``     : Dense over all n_classes whose output is normalized by
  losses.classification.make_hierarchical_softmax (HierarchicalSoftmaxLoss;
  replaces the reference's ModuleDict-of-linears, loss.py:196-240)
* ``bottleneck2d`` : backbone → 2-d feature → per-level bias-free linears
  (the CNN2DFeat embedding-visualization variant,
  ethec_experiments.py:35-49)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .resnet import BACKBONES

__all__ = ["HierarchicalCNN", "HEADS"]

HEADS = ("multi_head", "leaf", "hsoftmax", "bottleneck2d")


class HierarchicalCNN(nn.Module):
    """Backbone trunk + criterion-matched head.

    Returns raw scores: (B, n_classes) for multi_head/hsoftmax/bottleneck2d,
    (B, levels[-1]) for leaf. For `bottleneck2d`, `capture_bottleneck=True`
    additionally returns the 2-d feature (for embedding plots,
    ethec_experiments.py:155-200)."""

    backbone: str
    levels: Tuple[int, ...]
    head: str = "multi_head"
    dtype: Any = jnp.bfloat16
    bottleneck_dim: int = 2
    remat: bool = False
    stem: str = "conv7"
    bn_stats_rows: int = 0   # >0: ghost-batch BN statistics (GhostBatchNorm)
    bn_impl: str = "flax"    # 'pallas' = fused-reduction BN (ops.bn_pallas)
    bn_stats_dtype: str = "float32"  # 'bfloat16' = half-precision stat sweeps

    @nn.compact
    def __call__(self, x, train: bool = False, capture_bottleneck: bool = False):
        n_classes = int(sum(self.levels))
        trunk = BACKBONES[self.backbone](
            num_classes=None, dtype=self.dtype, features_only=True,
            remat=self.remat, stem=self.stem,
            bn_stats_rows=self.bn_stats_rows, bn_impl=self.bn_impl,
            bn_stats_dtype=self.bn_stats_dtype,
            name="trunk")
        feats = trunk(x, train=train)                     # (B, F) f32

        if self.head == "multi_head":
            return nn.Dense(n_classes, name="fc")(feats)
        if self.head == "leaf":
            return nn.Dense(int(self.levels[-1]), name="fc")(feats)
        if self.head == "hsoftmax":
            # raw per-node scores; sibling-group normalization happens in
            # losses.make_hierarchical_softmax
            return nn.Dense(n_classes, name="fc")(feats)
        if self.head == "bottleneck2d":
            z = nn.Dense(self.bottleneck_dim, name="bottleneck")(feats)
            scores = jnp.concatenate(
                [nn.Dense(int(n), use_bias=False, name=f"level_fc{l}")(z)
                 for l, n in enumerate(self.levels)], axis=-1)
            if capture_bottleneck:
                return scores, z
            return scores
        raise ValueError(f"unknown head {self.head!r}; expected {HEADS}")
