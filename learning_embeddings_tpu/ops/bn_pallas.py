"""Pallas-fused train-mode BatchNorm for TPU.

Motivation (BASELINE.md round-2 trace): in the BN-train resnet50@448 step,
XLA spends ~42 ms/step on the BN statistics machinery — f32 convert+reduce
sweeps over every bf16 activation in the forward (mean/var) and backward
(d-stats) passes — roughly 4× the streaming-bandwidth lower bound of those
reads. This module moves the reductions into two Pallas kernels that read
the activation exactly once each in bf16 and accumulate per-channel f32
sums on-chip:

* ``_stats``     : x (R, C)            → Σx, Σx²           (forward)
* ``_corr``      : dy, x (R, C)        → Σdy, Σ(dy·x)      (backward)

The normalization itself and the dx expression stay in XLA (per-channel
affine elementwise — XLA fuses them into the neighboring convs). The public
``batch_norm_train`` carries a custom VJP built on the two kernels;
``PallasBatchNorm`` is a drop-in flax module with nn.BatchNorm's parameter
and batch_stats naming (biased variance, torch/flax semantics — same math
as models.resnet's norm, reference BN eps 1e-5).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batch_norm_train", "PallasBatchNorm"]


def _row_block(R: int, C: int, budget_bytes: int = 2 << 20) -> int:
    """Largest multiple-of-16 divisor of R within the VMEM budget (two
    bf16 input blocks must fit comfortably); 0 if none exists. Runs at
    trace time only (static shapes). C is padded to the 128-lane tile —
    a (rb, 64) bf16 block really occupies (rb, 128) of VMEM — and Pallas
    double-buffers blocks, hence the conservative budget."""
    eff_c = max(C, 128)
    cap = max(budget_bytes // max(2 * eff_c * 2, 1), 16)
    start = (min(R, cap) // 16) * 16
    for rb in range(start, 15, -16):
        if R % rb == 0:
            return rb
    return 0


def _stats_kernel(x_ref, s_ref, q_ref):
    xf = x_ref[:].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    s_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
    q_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _corr_kernel(dy_ref, x_ref, s_ref, p_ref):
    dy = dy_ref[:].astype(jnp.float32)
    xf = x_ref[:].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    s_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    p_ref[:] += jnp.sum(dy * xf, axis=0, keepdims=True)


def _use_pallas(R: int, C: int) -> bool:
    return (jax.default_backend() == "tpu" and _row_block(R, C) >= 16)


def _stats(x2):
    R, C = x2.shape
    rb = _row_block(R, C)
    if not _use_pallas(R, C):
        xf = x2.astype(jnp.float32)
        return jnp.sum(xf, 0), jnp.sum(xf * xf, 0)
    s, q = pl.pallas_call(
        _stats_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * R * C, bytes_accessed=2 * R * C + 8 * C,
            transcendentals=0),
    )(x2)
    return s[0], q[0]


def _corr(dy2, x2):
    R, C = x2.shape
    rb = _row_block(R, C)
    if not _use_pallas(R, C):
        dyf = dy2.astype(jnp.float32)
        xf = x2.astype(jnp.float32)
        return jnp.sum(dyf, 0), jnp.sum(dyf * xf, 0)
    s, p = pl.pallas_call(
        _corr_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * R * C, bytes_accessed=4 * R * C + 8 * C,
            transcendentals=0),
    )(dy2, x2)
    return s[0], p[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x, scale, bias, eps: float = 1e-5):
    """Train-mode batch norm over all leading axes of x (channel-minor).

    Returns (y, mean, var) — biased variance, f32 statistics; y in x.dtype.
    mean/var feed running-average updates (treated as non-differentiable)."""
    y, mean, var, _ = _bn_fwd(x, scale, bias, eps)
    return y, mean, var


def _bn_fwd(x, scale, bias, eps):
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    R = x2.shape[0]
    s, q = _stats(x2)
    mean = s / R
    var = jnp.maximum(q / R - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = (scale.astype(jnp.float32) * inv)
    b = (bias.astype(jnp.float32) - mean * a)
    y = (x * a.astype(x.dtype) + b.astype(x.dtype)).reshape(shape)
    return y, mean, var, inv


def _bn_fwd_vjp(x, scale, bias, eps):
    y, mean, var, inv = _bn_fwd(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd_vjp(eps, res, cts):
    dy, _, _ = cts          # cotangents for (y, mean, var); stats are
    #                         consumed under stop_gradient upstream
    x, scale, mean, inv = res
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    dy2 = dy.reshape(-1, C)
    R = x2.shape[0]
    sdy, sdyx = _corr(dy2, x2)
    # Σ dy·x̂ = (Σ dy·x − mean·Σ dy) · inv
    sdyxh = (sdyx - mean * sdy) * inv
    dscale = sdyxh
    dbias = sdy
    g = (scale.astype(jnp.float32) * inv)
    mean_dy = sdy / R
    mean_dyxh = sdyxh / R
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * inv
    dx = (g * (dy.astype(jnp.float32) - mean_dy - xhat * mean_dyxh))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


batch_norm_train.defvjp(_bn_fwd_vjp, _bn_bwd_vjp)


class PallasBatchNorm(nn.Module):
    """Drop-in nn.BatchNorm replacement whose train-mode statistics run
    through the Pallas fused-reduction kernels (XLA fallback off-TPU).
    Parameter / batch_stats names match nn.BatchNorm so torchvision
    weight import is unaffected."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

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
            inv = jax.lax.rsqrt(var + self.epsilon)
            a = scale * inv
            b = bias - mean * a
            return x.astype(self.dtype) * a.astype(self.dtype) \
                + b.astype(self.dtype)
        y, mean, var = batch_norm_train(x.astype(self.dtype), scale, bias,
                                        self.epsilon)
        if not self.is_initializing():
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y
