"""Perf probe round 4: bf16 BN statistics — the one untried single-chip
lever (r3 verdict #3). The BN-train step spends ~115 ms (47-52%) in
convert_reduce fusions (f32 BN stat + stat-grad sweeps over bf16
activations, BASELINE.md r2 trace); this measures the same step with the
stat sweeps (and, through autodiff, their gradient sweeps) computed in
bfloat16 (`bn_stats_dtype='bfloat16'`).

Controls:
  * bn_train_default      — exact flax BN (the bench default, ~216 ms r2/r3)
  * ghost_full_f32        — GhostBatchNorm folded form, f32 stats (isolates
                            the folded-normalize module from the dtype; r2
                            measured 212.8 ms)
  * bn_stats_bf16         — the experiment
  * freeze_bn             — the no-stat-sweep floor (~176 ms)
Also probes the joint (--use_CNN) step with bf16 stats.

Run: cd /root/repo && nohup setsid python tools/perf_probe_r4.py \
        > /tmp/perf_probe_r4.log 2>&1 < /dev/null &
"""

import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def measure(cfg_kw, bs, steps=20, warmup=3):
    import jax.numpy as jnp

    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    labelmap = _ethec_labelmap()
    cfg = ClassifierConfig(backbone="resnet50", criterion="multi_level_ce",
                           lr=1e-5, image_size=448, batch_size=bs, seed=0,
                           **cfg_kw)
    trainer = ClassifierTrainer(labelmap, cfg, mesh=None)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(bs, 448, 448, 3).astype(np.float32))
    paths = labelmap.leaf_paths()
    ll = jnp.asarray(paths[rng.randint(0, labelmap.levels[-1], bs)]
                     .astype(np.int32))
    mh = jnp.zeros((bs, labelmap.n_classes), jnp.float32)
    state = trainer.state
    for _ in range(warmup):
        state, loss = trainer.train_step(state, images, ll, mh)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = trainer.train_step(state, images, ll, mh)
    last = float(loss)   # value fetch = sync through the axon tunnel
    dt = time.perf_counter() - t0
    return {"ms_per_step": round(1000 * dt / steps, 1),
            "img_per_s": round(bs * steps / dt, 1),
            "final_loss": round(last, 4)}


def measure_joint(cfg_kw, steps=10, warmup=2, batch_size=16):
    """bench.py main_joint's measurement core with config overrides."""
    from __graft_entry__ import _ethec_labelmap
    from bench import _unique_tower_images
    from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
    from learning_embeddings_tpu.train.joint_cnn import (
        JointCNNConfig, JointCNNTrainer)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    leaves = rng.randint(0, labelmap.levels[-1], 2048)
    ll = labelmap.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(labelmap, ll)
    img_edges = train_edges[train_edges[:, 1] >= labelmap.n_classes]
    pixel_bank = rng.rand(64, 448, 448, 3).astype(np.float32)

    def pixel_loader(rows):
        return pixel_bank[np.asarray(rows) % len(pixel_bank)]

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet50",
                         embedding_dim=10, image_size=448,
                         batch_size=batch_size, neg_to_pos_ratio=5,
                         alpha=0.05, pick_per_level=True, seed=0, **cfg_kw)
    trainer = JointCNNTrainer(labelmap, graph, img_edges[:10000],
                              pixel_loader, cfg)
    edges = img_edges[rng.permutation(len(img_edges))]

    def batch(i):
        e = edges[(i * batch_size) % (len(edges) - batch_size):][:batch_size]
        return e[:, 0], e[:, 1]

    prepared = [trainer.prepare_batch(*batch(i))
                for i in range(warmup + steps)]
    n_imgs = sum(_unique_tower_images(p, labelmap.n_classes)
                 for p in prepared[warmup:])
    warmed = set()
    loss = None
    for p in prepared[:warmup]:
        warmed.add(p[0].shape[0])
        loss, _, _ = trainer.train_prepared(p)
    for p in prepared[warmup:]:
        if p[0].shape[0] not in warmed:
            warmed.add(p[0].shape[0])
            loss, _, _ = trainer.train_prepared(p)
    if loss is not None:
        _ = float(loss)
    t0 = time.perf_counter()
    for p in prepared[warmup:]:
        loss, _, _ = trainer.train_prepared(p)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return {"img_per_s": round(n_imgs / dt, 1)}


VARIANTS = [
    ("bn_train_default", {}, 128),
    ("bn_stats_bf16", {"bn_stats_dtype": "bfloat16"}, 128),
    ("ghost_full_f32", {"bn_stats_rows": -1}, 128),
    ("freeze_bn", {"freeze_bn": True}, 128),
]

JOINT_VARIANTS = [
    ("joint_default", {}),
    ("joint_bn_stats_bf16", {"bn_stats_dtype": "bfloat16"}),
]

if __name__ == "__main__":
    for name, kw, bs in VARIANTS:
        try:
            out = measure(kw, bs)
            out["variant"] = name
        except Exception as e:
            out = {"variant": name, "error": repr(e)[:300]}
        print(json.dumps(out), flush=True)
    for name, kw in JOINT_VARIANTS:
        try:
            out = measure_joint(kw)
            out["variant"] = name
        except Exception as e:
            out = {"variant": name, "error": repr(e)[:300]}
        print(json.dumps(out), flush=True)
    print("PROBE_R4 DONE", flush=True)
