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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..geometry import exp_map_x, inner_radius, lambda_x, project_annulus

__all__ = [
    "riemannian_sgd",
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


def project_annulus_tree(params, K: float):
    """Project every leaf's rows into [inner_radius(K), 1−1e−5] — the
    post-Adam soft clip of the hybrid path (oe_h.py:1766-1771)."""
    r0 = inner_radius(K)
    return jax.tree_util.tree_map(lambda w: project_annulus(w, r0), params)
