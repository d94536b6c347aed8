"""Riemannian SGD tests vs a torch oracle of the reference update
(order_embeddings_h.py:765-778)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from learning_embeddings_tpu.geometry import (
    hyp_cone_energy,
    inner_radius,
)
from learning_embeddings_tpu.optim.rsgd import (
    project_annulus_tree,
    riemannian_sgd,
    scale_by_conformal_factor,
)

K = 0.1
R0 = inner_radius(K)
RNG = np.random.RandomState(0)


def torch_rsgd_step(w, g, lr):
    """Reference update: grad·(1/λ)², then exp-map via mob_add."""
    w = torch.tensor(w)
    g = torch.tensor(g)
    lam = 2.0 / (1 - torch.norm(w, p=2, dim=1, keepdim=True))
    g = g * (1.0 / lam) ** 2
    v = -lr * g + 1e-15
    norm_v = torch.norm(v, p=2, dim=1, keepdim=True)
    lam_x = 2.0 / (1 - torch.norm(w, p=2, dim=1, keepdim=True))
    second = torch.tanh(torch.clamp(lam_x * norm_v / 2, -15.0, 15.0)) * v / norm_v
    # mob_add(w, second) with v_offset 1e-6 and annulus clip
    u, vv = w, second + 1e-6
    dot2 = 2 * torch.sum(u * vv, dim=1, keepdim=True)
    nu = torch.sum(u * u, dim=1, keepdim=True)
    nv = torch.sum(vv * vv, dim=1, keepdim=True)
    den = 1 + dot2 + nv * nu
    out = (1 + dot2 + nv) / den * u + (1 - nu) / den * vv
    n = torch.norm(out, dim=1, keepdim=True)
    out = torch.where(n <= R0, out / n * R0, out)
    n = torch.norm(out, dim=1, keepdim=True)
    out = torch.where(n >= 1.0, out / n * (1 - 1e-5), out)
    return out.numpy()


def ball_points(n, d):
    x = RNG.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x * RNG.uniform(R0, 0.9, (n, 1)).astype(np.float32)


def test_rsgd_step_matches_reference_update():
    w = ball_points(16, 8)
    g = (0.5 * RNG.randn(16, 8)).astype(np.float32)
    lr = 0.1
    tx = riemannian_sgd(lr, K)
    state = tx.init({"e": jnp.array(w)})
    updates, _ = tx.update({"e": jnp.array(g)}, state, {"e": jnp.array(w)})
    new_w = np.asarray(optax.apply_updates({"e": jnp.array(w)}, updates)["e"])
    ref = torch_rsgd_step(w, g, lr)
    np.testing.assert_allclose(new_w, ref, rtol=1e-4, atol=1e-5)


def test_rsgd_descends_cone_energy():
    """One positive pair: RSGD drives E(u, v) to ~0 and stays in the ball."""
    uv = jnp.array([[0.2, 0.05], [0.05, 0.25]], jnp.float32)
    tx = riemannian_sgd(0.1, K)
    state = tx.init(uv)

    def loss(x):
        return hyp_cone_energy(x[0:1], x[1:2])[0]

    e0 = float(loss(uv))
    for _ in range(100):
        g = jax.grad(loss)(uv)
        updates, state = tx.update(g, state, uv)
        uv = optax.apply_updates(uv, updates)
    assert float(loss(uv)) < min(1e-3, e0)
    norms = np.linalg.norm(np.asarray(uv), axis=1)
    assert (norms < 1.0).all() and (norms >= R0 - 1e-6).all()


def test_conformal_rescale_chain_with_adam():
    """The hybrid path: rescale → adam → annulus projection keeps params in
    the annulus and reduces loss (oe_h.py:1757-1771)."""
    w = {"e": jnp.array(ball_points(8, 4))}
    tx = optax.chain(scale_by_conformal_factor(), optax.adam(0.01))
    state = tx.init(w)
    target = jnp.array(ball_points(8, 4))

    def loss(p):
        return jnp.sum((p["e"] - target) ** 2)

    l0 = float(loss(w))
    for _ in range(50):
        g = jax.grad(loss)(w)
        updates, state = tx.update(g, state, w)
        w = optax.apply_updates(w, updates)
        w = project_annulus_tree(w, K)
    assert float(loss(w)) < l0
    norms = np.linalg.norm(np.asarray(w["e"]), axis=1)
    assert (norms <= 1.0 - 1e-6).all() and (norms >= R0 - 1e-6).all()


def test_rsgd_lr_schedule_decays():
    """--lr_step with --use_rsgd must actually decay: riemannian_sgd
    resolves a schedule from its step counter (order_embeddings_h.py:620,775
    decays the manual-RSGD lr at lr_step epochs)."""
    w = {"e": jnp.array(ball_points(8, 4))}
    g = {"e": jnp.array((0.1 * RNG.randn(8, 4)).astype(np.float32))}
    sched = optax.piecewise_constant_schedule(0.1, {1: 0.1})
    tx = riemannian_sgd(sched, K)
    state = tx.init(w)
    up0, state = tx.update(g, state, w)          # step 0: lr = 0.1
    up1, state = tx.update(g, state, w)          # step 1: lr = 0.01
    # step-1 update must equal a fixed-lr(0.01) RSGD update on the same w
    fixed = riemannian_sgd(0.01, K)
    up_ref, _ = fixed.update(g, fixed.init(w), w)
    np.testing.assert_allclose(np.asarray(up1["e"]), np.asarray(up_ref["e"]),
                               rtol=1e-6)
    # and the two steps differ (the schedule was not ignored)
    assert not np.allclose(np.asarray(up0["e"]), np.asarray(up1["e"]))


def test_riemannian_adam_descends_and_stays_on_ball():
    from learning_embeddings_tpu.optim.rsgd import riemannian_adam

    uv = jnp.array([[0.2, 0.05], [0.05, 0.25]], jnp.float32)
    tx = riemannian_adam(0.05, K)
    state = tx.init(uv)

    def loss(x):
        return hyp_cone_energy(x[0:1], x[1:2])[0]

    e0 = float(loss(uv))
    for _ in range(150):
        g = jax.grad(loss)(uv)
        updates, state = tx.update(g, state, uv)
        uv = optax.apply_updates(uv, updates)
    assert float(loss(uv)) < min(1e-3, e0)
    norms = np.linalg.norm(np.asarray(uv), axis=1)
    assert (norms < 1.0).all() and (norms >= R0 - 1e-6).all()
    assert int(state.count) == 150


def test_riemannian_adam_schedule():
    from learning_embeddings_tpu.optim.rsgd import riemannian_adam

    w = {"e": jnp.array(ball_points(4, 3))}
    g = {"e": jnp.array((0.1 * RNG.randn(4, 3)).astype(np.float32))}
    sched = optax.piecewise_constant_schedule(0.1, {1: 0.1})
    tx = riemannian_adam(sched, K)
    state = tx.init(w)
    up0, state = tx.update(g, state, w)
    up1, state = tx.update(g, state, w)
    assert not np.allclose(np.asarray(up0["e"]), np.asarray(up1["e"]))
