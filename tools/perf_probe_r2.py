"""Round-2 TPU perf probe — ALL variants in one long-running process
(remote compiles are ~10 min each and the compilation cache does not help
across processes; CLAUDE.md).

Targets the round-1 trace finding: ~52% of the resnet50@448 train step is
convert_reduce fusions (backward-filter convs + f32 BN-stat reductions).
Variants attack the BN share: frozen BN (inference-mode stats) and
ghost-batch statistics (subsampled stat reductions), each with and without
the space-to-depth stem.

Run:  cd /root/repo && python tools/perf_probe_r2.py > /tmp/perf_probe_r2.log
"""

import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

BS = 128
STEPS = 20
WARMUP = 3


def measure(tag, cfg_kw):
    import jax.numpy as jnp
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    labelmap = _ethec_labelmap()
    cfg = ClassifierConfig(backbone="resnet50", criterion="multi_level_ce",
                           lr=1e-5, optimizer="adam", image_size=448,
                           batch_size=BS, seed=0, **cfg_kw)
    t0 = time.time()
    trainer = ClassifierTrainer(labelmap, cfg, mesh=None)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BS, 448, 448, 3).astype(np.float32))
    paths = labelmap.leaf_paths()
    ll = jnp.asarray(paths[rng.randint(0, labelmap.levels[-1], BS)]
                     .astype(np.int32))
    mh = jnp.zeros((BS, labelmap.n_classes), jnp.float32)

    state = trainer.state
    for _ in range(WARMUP):
        state, loss = trainer.train_step(state, images, ll, mh)
    _ = float(loss)
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = trainer.train_step(state, images, ll, mh)
    _ = float(loss)  # value fetch = true sync through the axon tunnel
    dt = time.perf_counter() - t0
    ips = BS * STEPS / dt
    print(json.dumps({"variant": tag, "img_per_s": round(ips, 1),
                      "ms_per_step": round(1000 * dt / STEPS, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ips


VARIANTS = [
    ("baseline_bn_train", {}),
    ("freeze_bn", {"freeze_bn": True}),
    ("freeze_bn_s2d", {"freeze_bn": True, "stem": "s2d"}),
    ("ghost_bn16", {"bn_stats_rows": 16}),
    ("ghost_bn16_s2d", {"bn_stats_rows": 16, "stem": "s2d"}),
    ("ghost_bn32", {"bn_stats_rows": 32}),
]

if __name__ == "__main__":
    only = sys.argv[1:] or None
    for tag, kw in VARIANTS:
        if only and tag not in only:
            continue
        try:
            measure(tag, kw)
        except Exception as e:  # keep probing the rest
            print(json.dumps({"variant": tag, "error": repr(e)[:300]}),
                  flush=True)
    print("PROBE DONE", flush=True)
