"""Perf probe round 2d: classifier step variants after the uint8/grad-accum
round — confirm the headline numbers still hold and probe the remaining
levers (optimizer cost via sgd, batch-size fine sweep around 128).

Run: cd /root/repo && nohup setsid python tools/perf_probe_r2d.py \
        > /tmp/perf_probe_r2d.log 2>&1 < /dev/null &
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
    _ = float(loss)
    dt = time.perf_counter() - t0
    return {"ms_per_step": round(1000 * dt / steps, 1),
            "img_per_s": round(bs * steps / dt, 1)}


VARIANTS = [
    ("bn_train_bs128_default", {}, 128),
    ("freeze_bn_bs128", {"freeze_bn": True}, 128),
    ("freeze_bn_sgd_bs128", {"freeze_bn": True, "optimizer": "sgd"}, 128),
    ("bn_train_bs96", {}, 96),
    ("bn_train_bs160", {}, 160),
    ("freeze_bn_bs112", {"freeze_bn": True}, 112),
    ("freeze_bn_bs144", {"freeze_bn": True}, 144),
]

if __name__ == "__main__":
    for name, kw, bs in VARIANTS:
        try:
            out = measure(kw, bs)
            out["variant"] = name
        except Exception as e:
            out = {"variant": name, "error": repr(e)[:300]}
        print(json.dumps(out), flush=True)
    print("PROBE2D DONE", flush=True)
