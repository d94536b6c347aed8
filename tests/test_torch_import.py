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
