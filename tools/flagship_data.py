"""Shared synthetic-but-separable pixel banks for the flagship quality
tools (quality_cnn_flagship.py, quality_two_stage_flagship.py).

Moved verbatim from tools/quality_cnn_flagship.py so the two-stage recipe
trains its classifier on BYTE-IDENTICAL banks to the joint flagship runs
(same pattern rng, same chunk PRNG keys) — any numeric drift here would
silently change what a resumed run or an A/B compares against.

Rationale (unchanged): ETHEC pixels don't ship in this environment; one
random 8x8 color pattern per leaf upsampled to `size` plus per-image
uniform noise, built directly in device HBM as uint8 banks (the dev
harness's ~15 MB/s host->device tunnel would otherwise dominate; a
production TPU host feeds pixels at PCIe rates)."""

import jax
import jax.numpy as jnp
import numpy as np


def make_patterns(n_leaves: int) -> np.ndarray:
    """One 8x8x3 uint8 pattern per leaf (separable), pattern rng seed 0."""
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (n_leaves, 8, 8, 3)).astype(np.uint8)


def make_bank(patterns: np.ndarray, leaves, salt: int, size: int):
    """(n, size, size, 3) uint8 device bank: pattern[leaf] upsampled +
    per-image noise (deterministic per salt). Built in 128-row chunks so
    the int32 noise temporaries stay small in HBM."""
    @jax.jit
    def chunk(small, key):
        up = jnp.repeat(jnp.repeat(small, size // 8, 1), size // 8, 2)
        noise = jax.random.randint(key, up.shape, -25, 26, jnp.int32)
        return jnp.clip(up.astype(jnp.int32) + noise, 0, 255).astype(
            jnp.uint8)

    n, C = len(leaves), 128
    pad = -(-n // C) * C if n > C else n
    rows = np.resize(np.asarray(leaves), pad)
    parts = [chunk(jnp.asarray(patterns[rows[i:i + C]]),
                   jax.random.PRNGKey(salt * 100003 + i))
             for i in range(0, pad, C)]
    return jnp.concatenate(parts)[:n]


def device_loader(bank):
    n = bank.shape[0]

    def load(rows):
        return bank[jnp.asarray(np.asarray(rows) % n)]
    return load


def load_label_warm_start(ckpt_path):
    """Label-table warm start from a label-only run's checkpoint (the
    reference workflow: train labels alone, then --load_emb_from into the
    joint run, oe_h.py:1435-1436). Returns (embeddings, threshold|None).

    Shared by quality_cnn_flagship.py / quality_two_stage_flagship.py so
    the warm-start contract (single 2-d leaf = the table; NaN threshold =
    unset) lives in one place."""
    import os

    from learning_embeddings_tpu.train.experiment import (Checkpointer,
                                                          ExperimentDir)

    wdir, wname = os.path.split(os.path.abspath(ckpt_path))
    exp_root, exp_name = os.path.split(os.path.dirname(wdir))
    payload = Checkpointer(ExperimentDir(exp_root, exp_name)).load_raw(wname)
    table = [np.asarray(p) for p in jax.tree_util.tree_leaves(
        payload["params"]) if getattr(p, "ndim", 0) == 2]
    assert len(table) == 1, [t.shape for t in table]
    thr = float(payload.get("optimal_threshold", float("nan")))
    return table[0], (None if np.isnan(thr) else thr)
