"""On-device (TPU) checks — skipped on the CPU test mesh; run manually with
`python -m pytest tests/test_tpu_only.py -q` from /root/repo with the
ambient axon env (see CLAUDE.md). These document the on-hardware
verifications performed during development."""

import numpy as np
import pytest

import jax


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU device")


def test_pallas_pairwise_order_energy_matches_xla_on_tpu():
    import jax.numpy as jnp

    from learning_embeddings_tpu.geometry import pairwise_order_energy

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(723, 100).astype(np.float32))
    pallas = pairwise_order_energy(u, u, use_pallas=True)
    xla = pairwise_order_energy(u, u, use_pallas=False)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla),
                               rtol=1e-5, atol=1e-5)


def test_train_step_runs_on_tpu():
    import jax.numpy as jnp

    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    lm = toy_labelmap(3, 3)
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           image_size=64, batch_size=8)
    tr = ClassifierTrainer(lm, cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    ll = jnp.asarray(lm.leaf_paths()[rng.randint(0, 27, 8)].astype(np.int32))
    mh = jnp.zeros((8, lm.n_classes), jnp.float32)
    state, loss = tr.train_step(tr.state, imgs, ll, mh)
    assert np.isfinite(float(loss))   # value fetch = true sync (CLAUDE.md)
