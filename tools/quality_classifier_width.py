"""Classifier quality at REAL taxonomy width: train the 723-node ETHEC
multi-head classifier (resnet18@64, MultiLevelCE — finetuner.py:89-375
semantics) on synthetic separable images (one fixed random pattern per
leaf + noise) and measure per-level m-F1 on held-out samples.

The ETHEC images don't exist in this environment; this run proves the
723-wide multi-head + criterion + eval stack *learns at real scale* when
signal exists, complementing the label-embedding quality runs (which use
the real taxonomy with no pixels at all).

Run: cd /root/repo && nohup setsid python tools/quality_classifier_width.py \
        > /tmp/quality_cls_width.log 2>&1 < /dev/null &

Optional argv[1]: bn_stats_dtype ('float32' default | 'bfloat16') — the
round-4 half-precision BN-statistics experiment's quality-drift leg
(VERDICT r3 #3): identical run, BN stat sweeps in bf16.
"""

import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

N_TRAIN, N_EVAL, SIZE, BS, STEPS = 4096, 1024, 64, 128, 600


def make_images(leaves, patterns, rng):
    """8x8 per-leaf pattern -> upsample to SIZE + noise, uint8."""
    pats = patterns[leaves]                       # (n, 8, 8, 3) float
    up = np.repeat(np.repeat(pats, SIZE // 8, 1), SIZE // 8, 2)
    noisy = up + rng.randn(*up.shape).astype(np.float32) * 0.1
    return (np.clip(noisy, 0, 1) * 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.eval.metrics import multilevel_metrics
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    t0 = time.time()
    lm = _ethec_labelmap()
    assert lm.levels == (6, 21, 135, 561), lm.levels
    rng = np.random.RandomState(0)
    patterns = rng.rand(lm.levels[-1], 8, 8, 3).astype(np.float32)
    paths = lm.leaf_paths()

    tr_leaves = rng.randint(0, lm.levels[-1], N_TRAIN)
    ev_leaves = rng.randint(0, lm.levels[-1], N_EVAL)
    tr_ll = paths[tr_leaves].astype(np.int32)
    ev_ll = paths[ev_leaves].astype(np.int32)

    bn_stats_dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, optimizer="adam", image_size=SIZE,
                           batch_size=BS, seed=0,
                           bn_stats_dtype=bn_stats_dtype)
    trainer = ClassifierTrainer(lm, cfg, mesh=None)

    # stage once on device (uint8: 4x smaller through the dev tunnel),
    # index per step on device
    imgs_dev = jnp.asarray(make_images(tr_leaves, patterns, rng))
    ll_dev = jnp.asarray(tr_ll)
    mh = np.zeros((N_TRAIN, lm.n_classes), np.float32)
    mh[np.arange(N_TRAIN)[:, None],
       tr_ll + np.asarray(lm.level_start)] = 1.0
    mh_dev = jnp.asarray(mh)

    # eager, NOT jitted: a jit closing over the device image bank ships
    # the bank inside the remote-compile request — at flagship-bank sizes
    # (~1.35 GB) the endpoint drops it with "Broken pipe" (measured on
    # quality_two_stage_flagship.py, 2026-08-19); this bank is smaller
    # but the pattern is the same hazard
    def gather(idx):
        return imgs_dev[idx], ll_dev[idx], mh_dev[idx]

    state = trainer.state
    order = np.concatenate([rng.permutation(N_TRAIN)
                            for _ in range(STEPS * BS // N_TRAIN + 1)])
    for s in range(STEPS):
        idx = jnp.asarray(order[s * BS:(s + 1) * BS])
        state, loss = trainer.train_step(state, *gather(idx))
        if s % 100 == 0:
            print(f"step {s} loss {float(loss):.4f}", flush=True)
    final_loss = float(loss)

    # held-out eval
    ev_imgs = make_images(ev_leaves, patterns, rng)
    ev_mh = np.zeros((N_EVAL, lm.n_classes), np.float32)
    ev_mh[np.arange(N_EVAL)[:, None],
          ev_ll + np.asarray(lm.level_start)] = 1.0
    scores = []
    for s in range(0, N_EVAL, BS):
        _, sc = trainer.eval_step(state, jnp.asarray(ev_imgs[s:s + BS]),
                                  jnp.asarray(ev_ll[s:s + BS]),
                                  jnp.asarray(ev_mh[s:s + BS]))
        scores.append(np.asarray(sc))
    scores = np.concatenate(scores)
    m = multilevel_metrics(scores, ev_ll, lm)
    flat = {}
    for l, lev in enumerate(m["levels"]):
        for k in ("f1_micro", "f1_macro", "accuracy"):
            flat[f"level{l}_{k}"] = round(float(getattr(lev, k)), 4)
    flat["global_micro_f1"] = round(m["micro"]["f1"], 4)
    flat["global_macro_f1"] = round(m["macro"]["f1"], 4)
    out = {"final_loss": round(final_loss, 4),
           "steps": STEPS, "n_train": N_TRAIN, "n_eval": N_EVAL,
           "bn_stats_dtype": bn_stats_dtype,
           "wall_s": round(time.time() - t0, 1), **flat}
    print("==", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
