"""Perf probe round 2b: freeze_bn batch-size sweep + full-batch folded BN +
profiler traces of baseline vs freeze_bn (for the BASELINE.md analysis).

Run:  cd /root/repo && python tools/perf_probe_r2b.py > /tmp/perf_probe_r2b.log
"""

import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

STEPS = 20
WARMUP = 3


def build(cfg_kw, bs):
    import jax.numpy as jnp
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    labelmap = _ethec_labelmap()
    cfg = ClassifierConfig(backbone="resnet50", criterion="multi_level_ce",
                           lr=1e-5, optimizer="adam", image_size=448,
                           batch_size=bs, seed=0, **cfg_kw)
    trainer = ClassifierTrainer(labelmap, cfg, mesh=None)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(bs, 448, 448, 3).astype(np.float32))
    paths = labelmap.leaf_paths()
    ll = jnp.asarray(paths[rng.randint(0, labelmap.levels[-1], bs)]
                     .astype(np.int32))
    mh = jnp.zeros((bs, labelmap.n_classes), jnp.float32)
    return trainer, images, ll, mh


def measure(tag, cfg_kw, bs, trace_dir=None):
    import jax

    t0 = time.time()
    trainer, images, ll, mh = build(cfg_kw, bs)
    state = trainer.state
    for _ in range(WARMUP):
        state, loss = trainer.train_step(state, images, ll, mh)
    _ = float(loss)
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = trainer.train_step(state, images, ll, mh)
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": tag, "bs": bs,
                      "img_per_s": round(bs * STEPS / dt, 1),
                      "ms_per_step": round(1000 * dt / STEPS, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, loss = trainer.train_step(state, images, ll, mh)
            _ = float(loss)
        summarize_trace(tag, trace_dir)


def summarize_trace(tag, trace_dir):
    """Aggregate device-op time by fusion-name prefix from trace.json.gz."""
    import glob

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(json.dumps({"variant": tag, "trace": "none found"}), flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    tpu_pids = {p["pid"] for p in data.get("traceEvents", [])
                if p.get("ph") == "M" and p.get("name") == "process_name"
                and "TPU" in str(p.get("args", {}).get("name", ""))}
    agg = defaultdict(float)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "")
            key = name.split(".")[0].rstrip("0123456789")
            agg[key] += e.get("dur", 0) / 1e3
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
    print(json.dumps({"variant": tag,
                      "trace_ms_over_3steps":
                          {k: round(v, 1) for k, v in top}}), flush=True)


if __name__ == "__main__":
    measure("freeze_bn_bs192", {"freeze_bn": True}, 192)
    measure("freeze_bn_bs256", {"freeze_bn": True}, 256)
    measure("bn_folded_full", {"bn_stats_rows": -1}, 128)
    measure("baseline_trace", {}, 128, trace_dir="/tmp/trace_baseline")
    measure("freeze_bn_trace", {"freeze_bn": True}, 128,
            trace_dir="/tmp/trace_freeze_bn")
    print("PROBE2 DONE", flush=True)
