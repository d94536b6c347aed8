"""Poincaré-ball operations with the reference's exact numerics.

Implements the manifold math of the reference's hyperbolic trainers
(order_embeddings_h.py:634-674 `soft_clip`/`mob_add`/`lambda_x`/`exp_map_x`,
oe_h.py:77-110 `Embedder.forward` exp₀ map, oe_h.py:148-211 `FeatNet`)
including all of its idiosyncratic epsilons and clamps:

* ``lambda_x`` is ``2 / (1 − ‖x‖)`` — the reference uses the *non-squared*
  norm (order_embeddings_h.py:668), not the textbook conformal factor
  2/(1−‖x‖²). We reproduce the reference.
* ``exp_map_x`` clamps the tanh argument to ±15 (order_embeddings_h.py:672).
* ``mob_add`` offsets v by +1e-6/+1e-15 before use (the label-embedding
  RSGD path uses 1e-6, the FeatNet path 1e-15) and projects the result
  into the annulus.
* ``project_annulus`` (the reference's ``soft_clip``) rescales rows with
  ‖x‖ ≤ inner_radius up to inner_radius and rows with ‖x‖ ≥ 1 down to
  1−1e−5. The reference computes this under `torch.no_grad()` and writes
  in place; we apply the scale through `stop_gradient` so the projection
  acts as a constant rescaling in the backward pass.

All functions operate on the last axis and broadcast over batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .energies import inner_radius

__all__ = [
    "arctanh",
    "project_annulus",
    "mobius_add",
    "lambda_x",
    "exp_map_x",
    "exp_map_zero_shifted",
    "poincare_distance",
    "inner_radius",
]

_TANH_CLAMP = 15.0
_EPS = 1e-5


def _norm(x, keepdims=True):
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=keepdims), 1e-30))


def arctanh(x: jnp.ndarray) -> jnp.ndarray:
    """atanh with the reference's ±(1−1e−5) input clamp
    (oe_h.py:107-110)."""
    x = jnp.clip(x, -1.0 + _EPS, 1.0 - _EPS)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def project_annulus(x: jnp.ndarray, radius_min: float, eps: float = _EPS) -> jnp.ndarray:
    """Rescale rows into the annulus [radius_min, 1−eps]; the scale factor
    carries no gradient (reference soft_clip under no_grad,
    order_embeddings_h.py:634-647)."""
    n = _norm(x)
    scale = jnp.where(
        n <= radius_min, radius_min / n, jnp.where(n >= 1.0, (1.0 - eps) / n, 1.0)
    )
    return x * jax.lax.stop_gradient(scale)


def mobius_add(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius_min: float,
    v_offset: float = 1e-6,
) -> jnp.ndarray:
    """Möbius addition u ⊕ v followed by annulus projection
    (reference mob_add, order_embeddings_h.py:649-660).

    result = ((1 + 2⟨u,v⟩ + ‖v‖²) u + (1 − ‖u‖²) v)
             / (1 + 2⟨u,v⟩ + ‖u‖²‖v‖²)
    """
    v = v + v_offset
    dot2 = 2.0 * jnp.sum(u * v, axis=-1, keepdims=True)
    nu = jnp.sum(u * u, axis=-1, keepdims=True)
    nv = jnp.sum(v * v, axis=-1, keepdims=True)
    den = 1.0 + dot2 + nv * nu
    out = (1.0 + dot2 + nv) / den * u + (1.0 - nu) / den * v
    return project_annulus(out, radius_min)


def lambda_x(x: jnp.ndarray) -> jnp.ndarray:
    """Reference's conformal factor 2 / (1 − ‖x‖) — non-squared norm,
    matching order_embeddings_h.py:668 exactly. (..., 1) keepdims."""
    return 2.0 / (1.0 - _norm(x))


def exp_map_x(
    x: jnp.ndarray,
    v: jnp.ndarray,
    radius_min: float,
    v_offset: float = 1e-6,
) -> jnp.ndarray:
    """Exponential map at x of tangent v:
    x ⊕ (tanh(clamp(λ_x ‖v‖ / 2, ±15)) · v/‖v‖)
    (reference exp_map_x, order_embeddings_h.py:668-674)."""
    v = v + 1e-15
    nv = _norm(v)
    second = jnp.tanh(jnp.clip(lambda_x(x) * nv / 2.0, -_TANH_CLAMP, _TANH_CLAMP)) * v / nv
    return mobius_add(x, second, radius_min, v_offset=v_offset)


def exp_map_zero_shifted(x: jnp.ndarray, radius_min: float) -> jnp.ndarray:
    """The reference's exp₀-style squash used by the hyperbolic Embedder and
    FeatNet forward (oe_h.py:77-91, 168-199):

    out = tanh(clamp(atanh(radius_min) + ‖x‖, ±15)) · x̂

    Maps any vector into the ball with norm ≥ tanh(atanh(r₀)) ≈ r₀."""
    x = x + 1e-15
    n = _norm(x)
    r0_h = arctanh(jnp.asarray(radius_min, x.dtype))
    scale = jnp.tanh(jnp.clip(r0_h + n, -_TANH_CLAMP, _TANH_CLAMP))
    # torch F.normalize: norm floored at 1e-12
    return scale * x / jnp.maximum(n, 1e-12)


def poincare_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """d(x, y) = arccosh(1 + 2‖x−y‖² / ((1−‖x‖²)(1−‖y‖²))).

    Not used by the reference losses (kept for analysis/visualization)."""
    sq = jnp.sum((x - y) ** 2, axis=-1)
    nx = jnp.sum(x * x, axis=-1)
    ny = jnp.sum(y * y, axis=-1)
    arg = 1.0 + 2.0 * sq / jnp.maximum((1.0 - nx) * (1.0 - ny), 1e-15)
    return jnp.arccosh(jnp.maximum(arg, 1.0))
