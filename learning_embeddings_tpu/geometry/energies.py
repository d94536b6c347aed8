"""Entailment energy operators E(u, v).

The three energies of the reference, as pure jax functions over the last
axis (batch dims broadcast):

* ``order_energy``      — Vendrov order embedding, ‖max(0, u−v)‖²
  (reference order_embeddings.py:819-824 `OrderEmbeddingLoss.E_operator`)
* ``euc_cone_energy``   — Euclidean entailment cones in cos space,
  E = max(0, Θ(x,y) − ψ(x)) with Θ = −⟨x̂, (y−x)̂⟩ and
  ψ = −sqrt(1 − K²/‖x‖²), K = 3.0
  (reference order_embeddings.py:954-969 `EucConesLoss.E_operator`)
* ``hyp_cone_energy``   — hyperbolic (Poincaré-ball) entailment cones in
  angle space, E = max(0, Ξ(x,y) − ψ(x)) with the acos/asin forms and
  the reference's exact ±(1−1e−5) clamps, K = 0.1
  (reference order_embeddings_h.py:1097-1120 / oe_h.py:811-833)

All functions accept (..., D) arrays and return (...). Computation is f32:
embedding dims are small, and the cone energies are clamp-sensitive.

Degenerate pairs (x == y, or ‖x‖ == 0) would produce 0/0 NaNs in the
reference too; we guard denominators with a 1e-15 floor so NaNs cannot
poison reductions — only exactly-degenerate pairs are affected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "order_energy",
    "euc_cone_energy",
    "hyp_cone_energy",
    "EUC_CONE_K",
    "HYP_CONE_K",
    "inner_radius",
]

EUC_CONE_K = 3.0   # reference order_embeddings.py:948
HYP_CONE_K = 0.1   # reference order_embeddings_h.py:1088 / oe_h.py:740
_TINY = 1e-15
_CLAMP = 1e-5      # reference's acos/asin argument clamp offset


def inner_radius(K: float) -> float:
    """Minimum-norm annulus radius for cone embeddings:
    2K / (1 + sqrt(1 + 4K²)) (reference order_embeddings_h.py:189)."""
    return 2.0 * K / (1.0 + (1.0 + 4.0 * K * K) ** 0.5)


def order_energy(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """E(u, v) = ‖max(0, u − v)‖² — zero iff v dominates u coordinatewise."""
    d = jnp.maximum(x - y, 0.0)
    return jnp.sum(d * d, axis=-1)


def _norm(x, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def _normalize(x):
    """L2 normalize along the last axis (torch F.normalize semantics:
    norm floored at 1e-12)."""
    n = jnp.maximum(_norm(x, keepdims=True), 1e-12)
    return x / n


def euc_cone_energy(x: jnp.ndarray, y: jnp.ndarray, K: float = EUC_CONE_K) -> jnp.ndarray:
    """Euclidean cones, cos-space: E = max(0, Θ − ψ),
    Θ(x,y) = −⟨x̂, (y−x)̂⟩, ψ(x) = −sqrt(1 − K²/‖x‖²)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    theta = -jnp.sum(_normalize(x) * _normalize(y - x), axis=-1)
    x_norm_sq = jnp.maximum(jnp.sum(x * x, axis=-1), _TINY)
    # ‖x‖ ≥ K is guaranteed by the annulus projection; clamp the sqrt arg
    # at 0 so float error cannot NaN (reference relies on projection alone).
    psi = -jnp.sqrt(jnp.maximum(1.0 - (K * K) / x_norm_sq, 0.0))
    return jnp.maximum(theta - psi, 0.0)


def hyp_cone_energy(x: jnp.ndarray, y: jnp.ndarray, K: float = HYP_CONE_K) -> jnp.ndarray:
    """Hyperbolic cones, angle-space (radians): E = max(0, Ξ − ψ).

    Ξ(x,y) = acos[(⟨x,y⟩(1+‖x‖²) − ‖x‖²(1+‖y‖²)) /
                   (‖x‖ · ‖x−y‖ · sqrt(1 + ‖x‖²‖y‖² − 2⟨x,y⟩))]
    ψ(x)   = asin(K(1−‖x‖²)/‖x‖)

    acos/asin arguments clamped to ±(1−1e−5) exactly as the reference."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x_norm = _norm(x)
    y_norm = _norm(y)
    x_y_dist = _norm(x - y)
    x_dot_y = jnp.sum(x * y, axis=-1)

    num = x_dot_y * (1.0 + x_norm**2) - (x_norm**2) * (1.0 + y_norm**2)
    rad = jnp.maximum(1.0 + (x_norm * y_norm) ** 2 - 2.0 * x_dot_y, _TINY)
    den = jnp.maximum(x_norm * x_y_dist * jnp.sqrt(rad), _TINY)
    acos_arg = num / den

    theta = jnp.arccos(jnp.clip(acos_arg, -1.0 + _CLAMP, 1.0 - _CLAMP))
    psi_arg = K * (1.0 - x_norm**2) / jnp.maximum(x_norm, _TINY)
    psi = jnp.arcsin(jnp.clip(psi_arg, -1.0 + _CLAMP, 1.0 - _CLAMP))
    return jnp.maximum(theta - psi, 0.0)
