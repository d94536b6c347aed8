"""Riemannian optimization on the Poincaré ball as optax transforms.

The reference performs the hyperbolic update manually after backward
(order_embeddings_h.py:765-778):

    grad  ← grad · (1 / λ_x(w))²          with λ_x = 2 / (1 − ‖w‖)
    w     ← exp_map_w(−lr · grad)          (Möbius addition + tanh clamp)

and, on the joint trainer's Adam path, rescales the gradient the same way,
takes the Adam step, then projects weights back into the annulus
(oe_h.py:1757-1771). Both are reproduced here:

* ``riemannian_sgd(lr, K)``            — full RSGD via exp-map; emits
  additive updates (new_w − w) so it composes with optax.apply_updates.
* ``scale_by_conformal_factor()``      — the grad·(1/λ)² rescale, chainable
  in front of any optax optimizer (e.g. adam) for the hybrid path.
* ``project_annulus_tree(params, K)``  — post-step annulus projection.

Only apply these to parameter subtrees that live on the ball (the label
embedding table); use optax.multi_transform to partition.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..geometry import exp_map_x, inner_radius, lambda_x, project_annulus

__all__ = [
    "riemannian_sgd",
    "riemannian_adam",
    "scale_by_conformal_factor",
    "project_annulus_tree",
]


def _rescale(g, w):
    """grad · (1/λ_w)² with the reference's non-squared-norm λ."""
    inv = 1.0 / lambda_x(w)
    return g * (inv * inv)


def scale_by_conformal_factor() -> optax.GradientTransformation:
    """Euclidean→Riemannian gradient rescale (needs params)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scale_by_conformal_factor requires params")
        updates = jax.tree_util.tree_map(_rescale, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class RiemannianSGDState(NamedTuple):
    count: jnp.ndarray  # optimizer step, drives the lr schedule


def riemannian_sgd(learning_rate, K: float) -> optax.GradientTransformation:
    """Full RSGD step: updates = exp_map_w(−lr · grad·(1/λ)²) − w.

    Matches the reference's update order: rescale, then exp-map with the
    ±15 tanh clamp, then annulus projection inside mobius_add.

    ``learning_rate`` may be a float or an optax schedule (step → lr): the
    reference decays its manual-RSGD lr at lr_step epoch boundaries too
    (order_embeddings_h.py:620,775), so MultiStepLR must reach this path."""
    r0 = inner_radius(K)

    def init_fn(params):
        return RiemannianSGDState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("riemannian_sgd requires params")
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)

        def step(g, w):
            rg = _rescale(g, w)
            new_w = exp_map_x(w, -lr * rg, r0)
            return new_w - w

        updates = jax.tree_util.tree_map(step, updates, params)
        return updates, RiemannianSGDState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class RiemannianAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any      # first moment (tangent space, identity transport)
    nu: Any      # second moment (componentwise, geoopt convention)


def riemannian_adam(learning_rate, K: float, b1: float = 0.9,
                    b2: float = 0.999,
                    eps: float = 1e-8) -> optax.GradientTransformation:
    """Riemannian Adam on the Poincaré ball (Bécigneul & Ganea,
    arXiv:1810.00760, in the geoopt implementation convention): moments
    accumulate the Riemannian gradient grad·(1/λ_x)² componentwise, the
    update is exp_map_x(−lr·m̂/(√v̂+ε)), and the first moment is carried to
    the new point by identity parallel transport (the standard practical
    approximation on the ball). Goes beyond the reference's rescale+adam+
    clip hybrid (oe_h.py:1757-1771) by taking the step along the manifold
    instead of projecting afterwards."""
    r0 = inner_radius(K)

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return RiemannianAdamState(count=jnp.zeros((), jnp.int32),
                                   mu=zeros(), nu=zeros())

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("riemannian_adam requires params")
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        count = state.count + 1
        rgrad = jax.tree_util.tree_map(_rescale, updates, params)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, rgrad)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, rgrad)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def step(m, v, w):
            direction = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return exp_map_x(w, -lr * direction, r0) - w

        deltas = jax.tree_util.tree_map(step, mu, nu, params)
        return deltas, RiemannianAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def project_annulus_tree(params, K: float):
    """Project every leaf's rows into [inner_radius(K), 1−1e−5] — the
    post-Adam soft clip of the hybrid path (oe_h.py:1766-1771)."""
    r0 = inner_radius(K)
    return jax.tree_util.tree_map(lambda w: project_annulus(w, r0), params)
