"""ResNet family in Flax, TPU-first.

Replaces the reference's torchvision backbone zoo (finetuner.py:117-128:
alexnet / vgg11_bn / resnet18/50/101/152, always ``pretrained=True``) with
native Flax implementations:

* NHWC layout (TPU native), bf16 compute / f32 params & batch stats,
* BatchNorm with torch semantics (momentum 0.1 → flax momentum 0.9,
  eps 1e-5) so imported torchvision weights behave identically,
* grayscale: feed (B, H, W, 1) input — flax infers conv1's input
  channels, which reproduces the reference's fresh-init 1-channel conv1
  surgery
  (ethec_experiments.py:222-238),
* `features_only=True` returns the pooled trunk features (the reference's
  `fc = Identity()` trick for fc7 extraction, order_embeddings_images.py:123).

Weight import from torchvision checkpoints is in models/torch_import.py
(gated: torchvision is not installed in this image; random init otherwise).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "GhostBatchNorm",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "BACKBONES",
]

ModuleDef = Any


class GhostBatchNorm(nn.Module):
    """BatchNorm whose train-time statistics come from only the first
    `stats_rows` batch rows (ghost-batch statistics).

    Rationale (TPU): the profiled resnet50@448 train step spends ~52% of
    its time in convert_reduce fusions — f32 stat reductions over huge bf16
    activations (forward mean/var + backward d(stats) sweeps). Subsampled
    statistics cut that reduction bandwidth by batch/stats_rows while the
    normalization itself stays exact over the full batch. Opt-in via
    `bn_stats_rows` (0 = exact nn.BatchNorm); an approximation of the
    reference's BN semantics, not default.

    Parameter/variable names match flax nn.BatchNorm ('scale', 'bias',
    'mean', 'var') so torchvision weight import is unaffected."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    stats_rows: int = 8
    #: dtype of the train-mode mean/var sweeps (and, through autodiff,
    #: their gradient sweeps). float32 = exact nn.BatchNorm semantics;
    #: bfloat16 halves the reduction's accumulator/intermediate precision —
    #: a measured experiment for the convert_reduce slice (BASELINE.md r2
    #: trace: ~47-52% of the BN-train step). Running stats stay f32.
    stats_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            rows = (min(self.stats_rows, x.shape[0]) if self.stats_rows > 0
                    else x.shape[0])  # <=0: full batch (folded-normalize BN)
            xs = x[:rows].astype(self.stats_dtype)
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axes).astype(jnp.float32)
            var = jnp.maximum(
                jnp.mean(xs * xs, axes).astype(jnp.float32) - mean * mean,
                0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        # fold into per-channel (a, b) so the full-batch elementwise pass
        # runs in the compute dtype (one fused multiply-add over x)
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    norm: ModuleDef = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    norm: ModuleDef = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Trunk + optional classification head.

    Returns logits (num_classes set) or pooled features (features_only)."""

    stage_sizes: Sequence[int]
    block: type
    num_classes: Optional[int] = None
    dtype: Any = jnp.bfloat16
    features_only: bool = False
    #: rematerialize each residual block in the backward pass — trades
    #: recompute FLOPs for activation memory (jax.checkpoint); at 448² the
    #: activation footprint otherwise spills HBM for large batches
    remat: bool = False
    #: 'conv7' = torch-layout 7×7/s2 stem; 's2d' = space-to-depth(2) +
    #: 4×4/s1 conv — mathematically EQUIVALENT reparametrization (the
    #: MLPerf TPU ResNet trick: 12 input channels at half resolution map
    #: far better onto the MXU than 3 channels at full resolution).
    #: Imported 7×7 torchvision weights convert via s2d_stem_kernel().
    stem: str = "conv7"
    #: >0 = ghost-batch BN statistics over the first N rows (GhostBatchNorm)
    bn_stats_rows: int = 0
    #: 'flax' | 'pallas' — pallas = fused-reduction train-mode BN
    #: (ops.bn_pallas; exact same math, single-read statistics)
    bn_impl: str = "flax"
    #: dtype of the train-mode BN stat sweeps ('float32' = exact flax BN;
    #: 'bfloat16' = half-precision reductions — see GhostBatchNorm)
    bn_stats_dtype: str = "float32"

    @property
    def feature_dim(self) -> int:
        width = 512
        return width * (4 if self.block is Bottleneck else 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_stats_rows or self.bn_stats_dtype != "float32":
            norm = functools.partial(
                GhostBatchNorm, use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype,
                stats_rows=self.bn_stats_rows or -1,
                stats_dtype=jnp.dtype(self.bn_stats_dtype))
        elif self.bn_impl == "pallas":
            from ..ops import PallasBatchNorm

            norm = functools.partial(
                PallasBatchNorm, use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype)
        else:
            norm = functools.partial(
                nn.BatchNorm, use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            # space-to-depth(2): (B, H, W, C) -> (B, H/2, W/2, 4C), then a
            # 4×4 stride-1 conv with asymmetric (2, 1) padding — the exact
            # reparametrization of conv 7×7/s2/p3 (see s2d_stem_kernel)
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
            x = nn.Conv(64, (4, 4), (1, 1), padding=[(2, 1), (2, 1)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        block_cls = (nn.remat(self.block, static_argnums=())
                     if self.remat else self.block)
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(filters=64 * 2**i, strides=strides,
                              dtype=self.dtype, norm=norm,
                              name=f"layer{i+1}_{j}")(x)
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        x = x.astype(jnp.float32)
        if self.features_only or self.num_classes is None:
            return x
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


def s2d_stem_kernel(w7):
    """Convert a 7×7/s2 stem kernel (7, 7, C, O) to the equivalent
    space-to-depth 4×4/s1 kernel (4, 4, 4C, O).

    With z[p,q,(u,v,c)] = x[2p+u, 2q+v, c] (u, v ∈ {0,1}) and input offset
    di − 3 = 2a + u, the original tap w[di, dj, c, o] lands at
    ŵ[a+2, b+2, (u·2+v)·C + c, o]; taps with di or dj outside [0, 7) are
    zero."""
    import numpy as np

    w7 = np.asarray(w7)
    C, O = w7.shape[2], w7.shape[3]
    out = np.zeros((4, 4, 4 * C, O), w7.dtype)
    for a in range(-2, 2):
        for b in range(-2, 2):
            for u in range(2):
                for v in range(2):
                    di, dj = 2 * a + u + 3, 2 * b + v + 3
                    if 0 <= di < 7 and 0 <= dj < 7:
                        out[a + 2, b + 2,
                            (u * 2 + v) * C:(u * 2 + v + 1) * C] = w7[di, dj]
    return out


def resnet18(**kw):
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, **kw)


def resnet34(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock, **kw)


def resnet50(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, **kw)


def resnet101(**kw):
    return ResNet(stage_sizes=(3, 4, 23, 3), block=Bottleneck, **kw)


def resnet152(**kw):
    return ResNet(stage_sizes=(3, 8, 36, 3), block=Bottleneck, **kw)


class AlexNet(nn.Module):
    """Compact AlexNet-shaped backbone (reference zoo parity,
    finetuner.py:117-118)."""

    num_classes: Optional[int] = None
    dtype: Any = jnp.bfloat16
    features_only: bool = False
    remat: bool = False   # accepted for API uniformity; unused
    stem: str = "conv7"   # accepted for API uniformity; unused
    bn_stats_rows: int = 0  # accepted for API uniformity; no BN in alexnet
    bn_impl: str = "flax"
    bn_stats_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for filters, kernel, stride, pool in [
            (64, 11, 4, True), (192, 5, 1, True), (384, 3, 1, False),
            (256, 3, 1, False), (256, 3, 1, True),
        ]:
            pad = kernel // 2
            x = nn.Conv(filters, (kernel, kernel), (stride, stride),
                        padding=[(pad, pad), (pad, pad)], dtype=self.dtype)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096, dtype=jnp.float32)(x))
        x = nn.relu(nn.Dense(4096, dtype=jnp.float32)(x))
        if self.features_only or self.num_classes is None:
            return x
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)

    @property
    def feature_dim(self):
        return 4096


class VGG11BN(nn.Module):
    """VGG-11 with batch norm (reference zoo parity, finetuner.py:119-120)."""

    num_classes: Optional[int] = None
    dtype: Any = jnp.bfloat16
    features_only: bool = False
    remat: bool = False   # accepted for API uniformity; unused
    stem: str = "conv7"   # accepted for API uniformity; unused
    bn_stats_rows: int = 0
    bn_impl: str = "flax"
    bn_stats_dtype: str = "float32"

    CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_stats_rows or self.bn_stats_dtype != "float32":
            norm = functools.partial(
                GhostBatchNorm, use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype,
                stats_rows=self.bn_stats_rows or -1,
                stats_dtype=jnp.dtype(self.bn_stats_dtype))
        else:
            norm = functools.partial(
                nn.BatchNorm, use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        for v in self.CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False, dtype=self.dtype)(x)
                x = norm()(x)
                x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.features_only or self.num_classes is None:
            return x
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)

    @property
    def feature_dim(self):
        return 512


BACKBONES: dict = {
    "alexnet": AlexNet,
    "vgg11_bn": VGG11BN,
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}
