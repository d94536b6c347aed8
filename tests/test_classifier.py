"""Classifier trainer + sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learning_embeddings_tpu.hierarchy import toy_labelmap
from learning_embeddings_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)
from learning_embeddings_tpu.train.classifier import (
    ClassifierConfig,
    ClassifierTrainer,
)

RNG = np.random.RandomState(0)


def make_batch(lm, B=8, size=32, channels=3):
    imgs = RNG.rand(B, size, size, channels).astype(np.float32)
    paths = lm.leaf_paths()
    ll = paths[RNG.randint(0, lm.levels[-1], B)].astype(np.int32)
    mh = np.zeros((B, lm.n_classes), np.float32)
    mh[np.arange(B)[:, None], ll + np.asarray(lm.level_start)] = 1.0
    return imgs, ll, mh


@pytest.fixture(scope="module")
def lm():
    return toy_labelmap(branching=3, n_levels=3)


def test_mesh_has_8_devices():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


@pytest.mark.parametrize("criterion", [
    "multi_level_ce", "last_level_ce", "masked_ce", "multi_label_sm",
    "hsoftmax"])
def test_sharded_train_step_all_criteria(lm, criterion):
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = ClassifierConfig(backbone="resnet18", criterion=criterion,
                           lr=1e-3, image_size=32, batch_size=8)
    tr = ClassifierTrainer(lm, cfg, mesh=mesh)
    batch = tr.put_batch(*make_batch(lm))
    state, loss0 = tr.train_step(tr.state, *batch)
    state, loss1 = tr.train_step(state, *batch)
    assert np.isfinite(float(loss0)) and float(loss1) < float(loss0)
    _, scores = tr.eval_step(state, *batch)
    assert scores.shape == (8, lm.n_classes)


def test_dp_matches_single_device(lm):
    """The 8-way sharded step must compute the same math as unsharded."""
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8, seed=0,
                           dtype=jnp.float32)
    batch_np = make_batch(lm)
    mesh = make_mesh(n_data=8, n_model=1)
    tr_mesh = ClassifierTrainer(lm, cfg, mesh=mesh)
    tr_single = ClassifierTrainer(lm, cfg, mesh=None)
    s1, l1 = tr_mesh.train_step(tr_mesh.state, *tr_mesh.put_batch(*batch_np))
    s2, l2 = tr_single.train_step(tr_single.state, *tr_single.put_batch(*batch_np))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    k1 = np.asarray(s1.params["fc"]["kernel"])
    k2 = np.asarray(s2.params["fc"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-6)


def test_tp_fallback_on_indivisible_dims(lm):
    mesh = make_mesh(n_data=4, n_model=2)
    params = {"fc": {"kernel": jnp.zeros((512, 39)), "bias": jnp.zeros((39,))}}
    sh = param_shardings(params, mesh, ("fc/kernel",))
    # 39 not divisible by 2 -> row-parallel on 512
    assert sh["fc"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["fc"]["bias"].spec == jax.sharding.PartitionSpec()


def test_grayscale_input(lm):
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           image_size=32)
    tr = ClassifierTrainer(lm, cfg, grayscale=True)
    batch = tr.put_batch(*make_batch(lm, channels=1))
    state, loss = tr.train_step(tr.state, *batch)
    assert np.isfinite(float(loss))


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_forward_traces():
    # full compile of resnet50@448 is exercised by the driver and bench on
    # TPU; here just verify the entry traces with correct output shape
    import __graft_entry__ as g
    fn, (variables, images) = g.entry()
    out = jax.eval_shape(fn, variables, images)
    assert out.shape == (images.shape[0], 723)


def test_uint8_input_matches_float32_exactly(lm):
    """uint8 batches (low-bandwidth transfer format) scale on device:
    u8/255 there is bit-identical to host-side astype(f32)/255."""
    # donate=False: this test deliberately re-steps from one state object
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=4,
                           donate=False)
    tr = ClassifierTrainer(lm, cfg, mesh=None)
    _, ll, mh = make_batch(lm, B=4)
    u8 = RNG.randint(0, 256, (4, 32, 32, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    _, loss_u8 = tr.train_step(tr.state, *tr.put_batch(u8, ll, mh))
    _, loss_f32 = tr.train_step(tr.state, *tr.put_batch(f32, ll, mh))
    assert float(loss_u8) == float(loss_f32)
    l_u8, s_u8 = tr.eval_step(tr.state, *tr.put_batch(u8, ll, mh))
    l_f, s_f = tr.eval_step(tr.state, *tr.put_batch(f32, ll, mh))
    assert float(l_u8) == float(l_f)
    assert np.array_equal(np.asarray(s_u8), np.asarray(s_f))


def test_uint8_input_on_mesh_matches_f32(lm):
    """uint8 batches shard and train on the ('data','model') mesh; loss
    matches the f32-fed sharded step exactly."""
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8,
                           donate=False)   # re-steps from one state object
    tr = ClassifierTrainer(lm, cfg, mesh=mesh)
    _, ll, mh = make_batch(lm, B=8)
    u8 = RNG.randint(0, 256, (8, 32, 32, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    _, loss_u8 = tr.train_step(tr.state, *tr.put_batch(u8, ll, mh))
    _, loss_f32 = tr.train_step(tr.state, *tr.put_batch(f32, ll, mh))
    assert float(loss_u8) == float(loss_f32)


def test_grad_accum_equals_full_batch_step(lm):
    """grad_accum=2 fed the same micro-batch twice must produce exactly
    the params of one plain step on that batch (mean of equal grads)."""
    base = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                            lr=1e-3, image_size=32, batch_size=4)
    acc = ClassifierConfig(**{**base.__dict__, "grad_accum": 2})
    imgs, ll, mh = make_batch(lm, B=4)
    tr1 = ClassifierTrainer(lm, base, mesh=None)
    tr2 = ClassifierTrainer(lm, acc, mesh=None)
    b1 = tr1.put_batch(imgs, ll, mh)
    s1, _ = tr1.train_step(tr1.state, *b1)

    b2 = tr2.put_batch(imgs, ll, mh)
    init = jax.tree_util.tree_map(np.asarray, tr2.state.params)
    s2, _ = tr2.train_step(tr2.state, *b2)   # micro-step: accumulate only
    #   (snapshot init first — the donated input state is consumed)
    mid = jax.tree_util.tree_map(np.asarray, s2.params)
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(mid), jax.tree_util.tree_leaves(init)))
    s2, _ = tr2.train_step(s2, *b2)          # second micro-step: apply
    for a, b in zip(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, s1.params)),
            jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, s2.params))):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_lr_schedule_decays_per_epoch_not_per_step(lm):
    """Regression: --lr_step N must decay after N *epochs*, matching torch
    MultiStepLR (reference experiment.py:158-190) — not after N optimizer
    steps (the optax piecewise boundaries count steps)."""
    import torch

    spe = 7  # steps per epoch
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-2, lr_steps=(2, 5), lr_decay=0.1,
                           steps_per_epoch=spe, image_size=32, batch_size=8)
    tr = ClassifierTrainer(lm, cfg)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-2)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2, 5],
                                                 gamma=0.1)
    for epoch in range(7):
        expected = opt.param_groups[0]["lr"]
        for s in range(spe):
            got = float(tr.lr_schedule(epoch * spe + s))
            assert got == pytest.approx(expected), (epoch, s, got, expected)
        sched.step()


def test_runner_sets_steps_per_epoch_from_train_split():
    import dataclasses

    cfg = ClassifierConfig(lr_steps=(10,), batch_size=4, steps_per_epoch=1)
    # mirror run_classifier's conversion (runner.py)
    n_train = 37
    cfg2 = dataclasses.replace(
        cfg, steps_per_epoch=max(n_train // cfg.batch_size, 1))
    assert cfg2.steps_per_epoch == 9


def test_freeze_bn_step_keeps_stats_and_learns(lm):
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8,
                           freeze_bn=True)
    tr = ClassifierTrainer(lm, cfg)
    batch = tr.put_batch(*make_batch(lm))
    stats0 = jax.tree_util.tree_map(np.asarray, tr.state.batch_stats)
    s1, l0 = tr.train_step(tr.state, *batch)
    s2, l1 = tr.train_step(s1, *batch)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)
    # running stats untouched
    for a, b in zip(jax.tree_util.tree_leaves(stats0),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ghost_bn_matches_batchnorm_when_full_rows(lm):
    """stats_rows >= batch must reproduce exact BatchNorm behavior."""
    from learning_embeddings_tpu.models.heads import HierarchicalCNN

    imgs, _, _ = make_batch(lm, B=8, size=32)
    kw = dict(backbone="resnet18", levels=tuple(lm.levels),
              head="multi_head", dtype=jnp.float32)
    m_exact = HierarchicalCNN(**kw)
    m_ghost = HierarchicalCNN(**kw, bn_stats_rows=8)
    v = m_exact.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]), train=False)
    out_e, mut_e = m_exact.apply(v, jnp.asarray(imgs), train=True,
                                 mutable=["batch_stats"])
    out_g, mut_g = m_ghost.apply(v, jnp.asarray(imgs), train=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_g),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(mut_e["batch_stats"]),
                    jax.tree_util.tree_leaves(mut_g["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ghost_bn_subsampled_stats_train_step(lm):
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8,
                           bn_stats_rows=4)
    tr = ClassifierTrainer(lm, cfg)
    batch = tr.put_batch(*make_batch(lm))
    stats0 = jax.tree_util.tree_map(np.asarray, tr.state.batch_stats)
    s1, l0 = tr.train_step(tr.state, *batch)
    s2, l1 = tr.train_step(s1, *batch)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)
    # running stats DID update (unlike freeze_bn)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(stats0),
                        jax.tree_util.tree_leaves(s2.batch_stats)))
    assert changed


def test_head_tensor_parallel_actually_shards(lm):
    """The wide fc must actually land on the 'model' axis on a (4,2) mesh:
    fan-out (odd n_classes, like ETHEC's 723) does not divide 2, so the
    divisibility fallback must shard the fan-in (row-parallel, XLA inserts
    the psum) — not silently replicate. Loss must match the single-device
    run."""
    from jax.sharding import PartitionSpec as P

    assert lm.n_classes % 2 == 1  # odd, like 723
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8, seed=0,
                           dtype=jnp.float32)
    mesh = make_mesh(n_data=4, n_model=2)
    tr = ClassifierTrainer(lm, cfg, mesh=mesh)
    spec = tr.state.params["fc"]["kernel"].sharding.spec
    assert tuple(spec) == ("model", None), spec  # row-parallel on fan-in 512
    # bias (shape (n_classes,) odd) stays replicated
    bspec = tr.state.params["fc"]["bias"].sharding.spec
    assert tuple(bspec) in ((), (None,)), bspec

    batch_np = make_batch(lm)
    tr_single = ClassifierTrainer(lm, cfg, mesh=None)
    _, l_tp = tr.train_step(tr.state, *tr.put_batch(*batch_np))
    _, l_single = tr_single.train_step(tr_single.state,
                                       *tr_single.put_batch(*batch_np))
    assert abs(float(l_tp) - float(l_single)) < 1e-4


def test_spatial_partitioning_matches_unsharded(lm):
    """GSPMD spatial partitioning: image H axis sharded over 'model' (XLA
    inserts the conv halo exchanges); loss must match the unsharded run.
    A scaling axis the reference's DataParallel cannot express."""
    from jax.sharding import PartitionSpec as P

    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=8, seed=0,
                           dtype=jnp.float32, spatial_partition=True)
    mesh = make_mesh(n_data=2, n_model=4)   # H=32 -> 8 rows per device
    tr = ClassifierTrainer(lm, cfg, mesh=mesh)
    batch_np = make_batch(lm)
    imgs = tr.put_batch(*batch_np)[0]
    assert tuple(imgs.sharding.spec) == ("data", "model")

    tr_single = ClassifierTrainer(
        lm, dataclasses_replace_spatial(cfg), mesh=None)
    _, l_sp = tr.train_step(tr.state, *tr.put_batch(*batch_np))
    _, l_single = tr_single.train_step(tr_single.state,
                                       *tr_single.put_batch(*batch_np))
    assert abs(float(l_sp) - float(l_single)) < 1e-4


def dataclasses_replace_spatial(cfg):
    import dataclasses
    return dataclasses.replace(cfg, spatial_partition=False)


def test_train_step_donates_state(lm):
    """The jitted step donates its input TrainState (in-place param/opt
    update — halves the state's HBM footprint across a step): the passed-in
    state's buffers are consumed and must not be readable afterwards."""
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=32, batch_size=4)
    tr = ClassifierTrainer(lm, cfg, mesh=None)
    batch = tr.put_batch(*make_batch(lm, B=4))
    old = tr.state
    tr.state, loss = tr.train_step(tr.state, *batch)
    assert np.isfinite(float(loss))
    leaf = jax.tree_util.tree_leaves(old.params)[0]
    with pytest.raises(RuntimeError):
        np.asarray(leaf)
