"""Pallas fused-BN correctness vs flax nn.BatchNorm (values, grads,
running stats) — XLA fallback path on CPU; the kernels themselves are
additionally exercised in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from learning_embeddings_tpu.ops import PallasBatchNorm, batch_norm_train
from learning_embeddings_tpu.ops import bn_pallas

RNG = np.random.RandomState(0)


def _flax_bn_apply(x, scale, bias, train=True):
    m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=jnp.float32,
                     param_dtype=jnp.float32)
    C = x.shape[-1]
    variables = {"params": {"scale": jnp.asarray(scale),
                            "bias": jnp.asarray(bias)},
                 "batch_stats": {"mean": jnp.zeros(C), "var": jnp.ones(C)}}
    return m.apply(variables, jnp.asarray(x), mutable=["batch_stats"])


def test_batch_norm_train_matches_flax_values_and_stats():
    x = RNG.randn(4, 5, 6, 8).astype(np.float32)
    scale = (1 + 0.2 * RNG.randn(8)).astype(np.float32)
    bias = (0.1 * RNG.randn(8)).astype(np.float32)
    y, mean, var = batch_norm_train(jnp.asarray(x), jnp.asarray(scale),
                                    jnp.asarray(bias), 1e-5)
    ref, mutated = _flax_bn_apply(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean),
                               x.reshape(-1, 8).mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var),
                               x.reshape(-1, 8).var(0), rtol=1e-4,
                               atol=1e-6)


def test_batch_norm_train_grads_match_flax():
    x = RNG.randn(6, 4, 4, 8).astype(np.float32)
    scale = (1 + 0.2 * RNG.randn(8)).astype(np.float32)
    bias = (0.1 * RNG.randn(8)).astype(np.float32)
    t = RNG.randn(6, 4, 4, 8).astype(np.float32)

    def loss_pallas(x, s, b):
        y, _, _ = batch_norm_train(x, s, b, 1e-5)
        return jnp.sum((y - t) ** 2)

    def loss_flax(x, s, b):
        y, _ = _flax_bn_apply(x, s, b)
        return jnp.sum((y - t) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    gf = jax.grad(loss_flax, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    for a, b in zip(gp, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_kernels_interpret_mode(monkeypatch):
    """Run the actual Pallas kernels (interpret=True) against numpy."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = RNG.randn(64, 24).astype(np.float32)
    dy = RNG.randn(64, 24).astype(np.float32)
    rb = 16
    s, q = pl.pallas_call(
        bn_pallas._stats_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, 24), jnp.float32)] * 2,
        grid=(64 // rb,),
        in_specs=[pl.BlockSpec((rb, 24), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 24), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        interpret=True,
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s)[0], x.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q)[0], (x * x).sum(0), rtol=1e-5)

    s2, p2 = pl.pallas_call(
        bn_pallas._corr_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, 24), jnp.float32)] * 2,
        grid=(64 // rb,),
        in_specs=[pl.BlockSpec((rb, 24), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((1, 24), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        interpret=True,
    )(jnp.asarray(dy), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s2)[0], dy.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2)[0], (dy * x).sum(0), rtol=1e-4)


def test_pallas_bn_module_matches_ghost_full():
    """PallasBatchNorm (fallback path) == the folded-BN formulation."""
    from learning_embeddings_tpu.models.resnet import GhostBatchNorm

    x = RNG.randn(8, 6, 6, 12).astype(np.float32)
    pm = PallasBatchNorm(use_running_average=False, dtype=jnp.float32)
    gm = GhostBatchNorm(use_running_average=False, dtype=jnp.float32,
                        stats_rows=0)
    v = pm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    yp, mp = pm.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    yg, mg = gm.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yg),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mp),
                    jax.tree_util.tree_leaves(mg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_row_block_divisors():
    assert bn_pallas._row_block(1605632, 64) % 16 == 0
    assert 1605632 % bn_pallas._row_block(1605632, 64) == 0
    assert bn_pallas._row_block(17, 64) == 0  # prime-ish: no divisor


def test_classifier_with_pallas_bn_matches_flax_bn():
    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    lm = toy_labelmap(branching=3, n_levels=3)
    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
    ll = lm.leaf_paths()[rng.randint(0, lm.levels[-1], 8)].astype(np.int32)
    mh = np.zeros((8, lm.n_classes), np.float32)

    base = dict(backbone="resnet18", criterion="multi_level_ce", lr=1e-3,
                image_size=32, batch_size=8, seed=0, dtype=jnp.float32)
    tr_flax = ClassifierTrainer(lm, ClassifierConfig(**base))
    tr_pal = ClassifierTrainer(lm, ClassifierConfig(**base,
                                                    bn_impl="pallas"))
    # same init (same seed/model structure)
    s1, l1 = tr_flax.train_step(tr_flax.state,
                                *tr_flax.put_batch(imgs, ll, mh))
    s2, l2 = tr_pal.train_step(tr_pal.state,
                               *tr_pal.put_batch(imgs, ll, mh))
    assert abs(float(l1) - float(l2)) < 1e-3
    # second step exercises the custom VJP end to end
    _, l1b = tr_flax.train_step(s1, *tr_flax.put_batch(imgs, ll, mh))
    _, l2b = tr_pal.train_step(s2, *tr_pal.put_batch(imgs, ll, mh))
    assert abs(float(l1b) - float(l2b)) < 2e-3


def test_bf16_stats_bn_close_to_exact_and_trains():
    """bn_stats_dtype='bfloat16' (half-precision BN stat sweeps): values
    and updated running stats track exact f32 BN within bf16 tolerance on
    a moderate batch, and a classifier step runs finite end-to-end."""
    from learning_embeddings_tpu.models.resnet import GhostBatchNorm

    x = (1.5 + 0.5 * RNG.randn(8, 14, 14, 16)).astype(np.float32)
    ref, ref_stats = _flax_bn_apply(x, np.ones(16), np.zeros(16))

    m = GhostBatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, stats_rows=-1,
                       stats_dtype=jnp.bfloat16)
    variables = {"params": {"scale": jnp.ones(16), "bias": jnp.zeros(16)},
                 "batch_stats": {"mean": jnp.zeros(16), "var": jnp.ones(16)}}
    out, stats = m.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    # bf16 reductions: ~8 mantissa bits => percent-level agreement
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(
        np.asarray(stats["batch_stats"]["mean"]),
        np.asarray(ref_stats["batch_stats"]["mean"]), rtol=0.05, atol=0.02)
    # running stats are stored f32
    assert stats["batch_stats"]["mean"].dtype == jnp.float32

    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.train.classifier import (ClassifierConfig,
                                                          ClassifierTrainer)

    lm = toy_labelmap(branching=2, n_levels=2)
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=4, seed=0,
                           bn_stats_dtype="bfloat16")
    tr = ClassifierTrainer(lm, cfg, mesh=None)
    images = RNG.rand(4, 32, 32, 3).astype(np.float32)
    ll = lm.leaf_paths()[RNG.randint(0, lm.levels[-1], 4)].astype(np.int32)
    mh = np.zeros((4, lm.n_classes), np.float32)
    state, loss = tr.train_step(tr.state, *tr.put_batch(images, ll, mh))
    assert np.isfinite(float(loss))
