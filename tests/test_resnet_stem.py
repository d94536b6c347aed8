"""Space-to-depth stem: exact equivalence to the 7×7/s2 stem."""

import numpy as np

import jax
import jax.numpy as jnp

from learning_embeddings_tpu.models.resnet import resnet18, s2d_stem_kernel

RNG = np.random.RandomState(0)


def test_s2d_kernel_conv_equivalence():
    x = jnp.asarray(RNG.randn(2, 32, 32, 3).astype(np.float32))
    w7 = RNG.randn(7, 7, 3, 8).astype(np.float32) * 0.1
    y_ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w7), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, H, W, C = x.shape
    z = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    y = jax.lax.conv_general_dilated(
        z, jnp.asarray(s2d_stem_kernel(w7)), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_s2d_model_matches_conv7_with_converted_weights():
    """Whole-trunk forward: conv7 model vs s2d model with the converted
    stem kernel and otherwise identical params."""
    x = jnp.asarray(RNG.randn(2, 64, 64, 3).astype(np.float32))
    m7 = resnet18(features_only=True, dtype=jnp.float32, stem="conv7")
    v7 = m7.init(jax.random.PRNGKey(0), x, train=False)
    ms = resnet18(features_only=True, dtype=jnp.float32, stem="s2d")
    params = dict(v7["params"])
    params["conv1"] = {"kernel": jnp.asarray(
        s2d_stem_kernel(v7["params"]["conv1"]["kernel"]))}
    out7 = m7.apply(v7, x, train=False)
    outs = ms.apply({"params": params, "batch_stats": v7["batch_stats"]},
                    x, train=False)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(out7),
                               rtol=1e-4, atol=1e-5)
