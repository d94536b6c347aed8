"""Torchvision weight-import round trip + numerical check against a torch
re-implementation of one ResNet block."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from learning_embeddings_tpu.models.resnet import resnet18
from learning_embeddings_tpu.models.torch_import import (
    export_torchvision_resnet,
    import_torchvision_resnet,
)


def test_roundtrip_resnet18():
    model = resnet18(num_classes=None, features_only=True,
                     dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = export_torchvision_resnet(variables["params"],
                                   variables["batch_stats"], (2, 2, 2, 2))
    # torchvision-style names present
    assert "conv1.weight" in sd and "layer4.1.bn2.running_var" in sd
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    params, stats = import_torchvision_resnet(sd)
    chex_equal = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], params)
    assert all(jax.tree_util.tree_leaves(chex_equal))
    stats_equal = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        variables["batch_stats"], stats)
    assert all(jax.tree_util.tree_leaves(stats_equal))


def test_imported_weights_match_torch_forward():
    """Run the imported stem (conv1+bn1+relu+maxpool) against the same ops
    in torch — validates the layout transposes and BN semantics, which is
    what pretrained-import correctness rests on."""
    rng = np.random.RandomState(0)
    w = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    bn_w = rng.rand(64).astype(np.float32) + 0.5
    bn_b = rng.randn(64).astype(np.float32) * 0.1
    bn_m = rng.randn(64).astype(np.float32) * 0.1
    bn_v = rng.rand(64).astype(np.float32) + 0.5
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    # torch forward
    t = torch.tensor
    y = F.conv2d(t(x), t(w), stride=2, padding=3)
    y = F.batch_norm(y, t(bn_m), t(bn_v), t(bn_w), t(bn_b), training=False,
                     eps=1e-5)
    y = F.relu(y)
    y = F.max_pool2d(y, 3, 2, padding=1).numpy()

    # flax forward with imported weights
    sd = {"conv1.weight": w, "bn1.weight": bn_w, "bn1.bias": bn_b,
          "bn1.running_mean": bn_m, "bn1.running_var": bn_v}
    params, stats = import_torchvision_resnet(sd)

    from flax import linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name="bn1")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    out = Stem().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), y,
                               rtol=1e-4, atol=1e-5)


def torch_resnet18_features(sd, x):
    """Full torch-functional ResNet-18 trunk (conv1..layer4, global avg
    pool) typed from the torchvision architecture — the oracle for
    end-to-end pretrained-import parity."""
    t = lambda k: torch.tensor(np.asarray(sd[k]))

    def bn(name, y):
        return F.batch_norm(y, t(f"{name}.running_mean"),
                            t(f"{name}.running_var"), t(f"{name}.weight"),
                            t(f"{name}.bias"), training=False, eps=1e-5)

    y = F.conv2d(torch.tensor(x), t("conv1.weight"), stride=2, padding=3)
    y = F.relu(bn("bn1", y))
    y = F.max_pool2d(y, 3, 2, padding=1)
    for i in range(1, 5):
        for j in range(2):
            p = f"layer{i}.{j}"
            stride = 2 if i > 1 and j == 0 else 1
            res = y
            z = F.conv2d(y, t(f"{p}.conv1.weight"), stride=stride, padding=1)
            z = F.relu(bn(f"{p}.bn1", z))
            z = F.conv2d(z, t(f"{p}.conv2.weight"), stride=1, padding=1)
            z = bn(f"{p}.bn2", z)
            if f"{p}.downsample.0.weight" in sd:
                res = bn(f"{p}.downsample.1",
                         F.conv2d(y, t(f"{p}.downsample.0.weight"),
                                  stride=stride))
            y = F.relu(z + res)
    return y.mean(dim=(2, 3)).numpy()


def test_full_network_forward_parity_with_torch():
    """Export random Flax resnet18 weights to torchvision layout, run BOTH
    full trunks on the same input, assert activations match — end-to-end
    proof that a torchvision checkpoint behaves identically after import
    (finetuner.py:117-128 pretrained=True)."""
    model = resnet18(num_classes=None, features_only=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    # make batch stats non-trivial so BN import is actually exercised
    rng = np.random.RandomState(0)
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    stats = jax.tree_util.tree_map(
        lambda s: jnp.asarray(s + 0.3 * rng.rand(*s.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    sd = export_torchvision_resnet(variables["params"],
                                   variables["batch_stats"], (2, 2, 2, 2))
    x = rng.randn(2, 3, 64, 64).astype(np.float32) * 0.5

    ours = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    theirs = torch_resnet18_features(sd, x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_load_backbone_state_dict_into_trainer(tmp_path):
    """--load_backbone_from: torch-save a state dict, load it into a
    differently-seeded trainer, trunk params/stats must match the source."""
    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    lm = toy_labelmap(branching=3, n_levels=3)
    src = resnet18(num_classes=None, features_only=True, dtype=jnp.float32)
    sv = src.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)),
                  train=False)
    sd = export_torchvision_resnet(sv["params"], sv["batch_stats"],
                                   (2, 2, 2, 2))
    path = tmp_path / "resnet18.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(path))

    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           image_size=32, batch_size=4, seed=1)
    tr = ClassifierTrainer(lm, cfg)
    tr.load_backbone_state_dict(str(path))
    got = jax.tree_util.tree_map(np.asarray, tr.state.params["trunk"])
    want = jax.tree_util.tree_map(np.asarray, sv["params"])
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray,
                                       tr.state.batch_stats["trunk"])),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, sv["batch_stats"]))):
        np.testing.assert_array_equal(a, b)
    # and the training step still runs on the loaded weights
    rngs = np.random.RandomState(0)
    imgs = rngs.rand(4, 32, 32, 3).astype(np.float32)
    paths = lm.leaf_paths()
    ll = paths[rngs.randint(0, lm.levels[-1], 4)].astype(np.int32)
    mh = np.zeros((4, lm.n_classes), np.float32)
    _, loss = tr.train_step(tr.state, *tr.put_batch(imgs, ll, mh))
    assert np.isfinite(float(loss))
