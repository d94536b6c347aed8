"""Round-3 backward-conv probes (VERDICT r2 #6): the trace attributes
~125 ms of the 175.8 ms frozen-BN resnet50@448 bs128 step to backward
convs running at ~70% of the forward pass's per-FLOP rate. This script
measures, per hot conv shape AND whole-step, every lever available from
this harness (XLA TPU compiler flags are structurally unavailable — see
CLAUDE.md):

  per-op (the four resnet50 3x3 stages at bs128@448):
    fwd conv, input-grad, filter-grad (XLA's conv_backprop),
    filter-grad as explicit im2col patches+dot_general,
    filter-grad accumulated over batch chunks,
    precision HIGHEST vs DEFAULT on the grads,
    NCHW layouts for the same convs
  whole-step:
    freeze_bn baseline re-confirmation,
    f32 tower vs bf16 (sanity anchor)

Batch ALL variants in one process (remote TPU compiles are slow; see
CLAUDE.md). Timing via value-fetch chain (block_until_ready is unreliable
through the axon tunnel). Results -> experiments/perf_r3.json.

Run:  python tools/perf_probe_r3.py   (cwd must be /root/repo for axon)
"""

import json
import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.getcwd(), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

OUT = "experiments/perf_r3.json"
results = {}


def record(name, ms, note=""):
    results[name] = {"ms": round(ms, 3), "note": note}
    os.makedirs("experiments", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"{name}: {ms:.3f} ms  {note}", flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    """ms/iter with value-fetch synchronization (chain through a scalar)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1000


# hot 3x3 shapes of resnet50 @448, bs128 (stage resolutions 112/56/28/14)
SHAPES = [  # (H, Cin, Cout, stride)
    (112, 64, 64, 1),
    (56, 128, 128, 1),
    (28, 256, 256, 1),
    (14, 512, 512, 1),
]
BS = 128
DIMNUMS_NHWC = ("NHWC", "HWIO", "NHWC")
DIMNUMS_NCHW = ("NCHW", "OIHW", "NCHW")


def conv_nhwc(x, w, precision=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS_NHWC,
        precision=precision)


def run_per_op():
    rng = np.random.RandomState(0)
    for H, cin, cout, stride in SHAPES:
        tag = f"c{cin}_h{H}"
        x = jnp.asarray(rng.rand(BS, H, H, cin).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.rand(3, 3, cin, cout).astype(np.float32) * 0.01,
                        jnp.bfloat16)

        fwd = jax.jit(lambda x, w: conv_nhwc(x, w))
        record(f"{tag}/fwd", timeit(fwd, x, w))

        # input grad + filter grad via XLA's autodiff (what the model uses)
        g_in = jax.jit(jax.grad(lambda x, w: jnp.sum(
            conv_nhwc(x, w).astype(jnp.float32)), argnums=0))
        g_w = jax.jit(jax.grad(lambda x, w: jnp.sum(
            conv_nhwc(x, w).astype(jnp.float32)), argnums=1))
        record(f"{tag}/grad_input", timeit(g_in, x, w))
        record(f"{tag}/grad_filter", timeit(g_w, x, w))

        # precision HIGHEST on the same grads (bf16 inputs: expect no-op)
        g_w_hi = jax.jit(jax.grad(lambda x, w: jnp.sum(conv_nhwc(
            x, w, precision=lax.Precision.HIGHEST).astype(jnp.float32)),
            argnums=1))
        record(f"{tag}/grad_filter_highest", timeit(g_w_hi, x, w))

        # filter grad as explicit im2col: patches (N,H,W,cin*9) x cot
        # (N,H,W,cout) contracted over N,H,W -> (cin*9, cout)
        def filter_grad_im2col(x, cot):
            patches = lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), "SAME",
                dimension_numbers=DIMNUMS_NHWC)      # (N,H,W,cin*9)
            g = lax.dot_general(
                patches, cot,
                (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32)   # (cin*9, cout)
            return g.reshape(cin, 3, 3, cout).transpose(1, 2, 0, 3)

        cot = jnp.ones((BS, H, H, cout), jnp.bfloat16)
        im2col = jax.jit(filter_grad_im2col)
        record(f"{tag}/grad_filter_im2col", timeit(im2col, x, cot))

        # filter grad accumulated over 4 batch chunks
        def filter_grad_chunked(x, w):
            def one(c):
                return jax.grad(lambda xc, w: jnp.sum(
                    conv_nhwc(xc, w).astype(jnp.float32)), argnums=1)(c, w)
            chunks = x.reshape(4, BS // 4, H, H, cin)
            return jnp.sum(jax.lax.map(one, chunks), axis=0)

        record(f"{tag}/grad_filter_chunked",
               timeit(jax.jit(filter_grad_chunked), x, w))

        # NCHW layout for the same conv (fwd + filter grad)
        x_nchw = jnp.transpose(x, (0, 3, 1, 2))
        w_oihw = jnp.transpose(w, (3, 2, 0, 1))

        def conv_nchw(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=DIMNUMS_NCHW)

        record(f"{tag}/fwd_nchw",
               timeit(jax.jit(conv_nchw), x_nchw, w_oihw))
        g_w_nchw = jax.jit(jax.grad(lambda x, w: jnp.sum(
            conv_nchw(x, w).astype(jnp.float32)), argnums=1))
        record(f"{tag}/grad_filter_nchw", timeit(g_w_nchw, x_nchw, w_oihw))


def run_whole_step():
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BS, 448, 448, 3).astype(np.float32))
    paths = labelmap.leaf_paths()
    ll = jnp.asarray(paths[rng.randint(0, labelmap.levels[-1], BS)]
                     .astype(np.int32))
    mh = jnp.zeros((BS, labelmap.n_classes), jnp.float32)

    for name, kw in [
        ("step_bn_train", {}),
        ("step_freeze_bn", {"freeze_bn": True}),
    ]:
        cfg = ClassifierConfig(backbone="resnet50",
                               criterion="multi_level_ce", lr=1e-5,
                               optimizer="adam", image_size=448,
                               batch_size=BS, seed=0, **kw)
        tr = ClassifierTrainer(labelmap, cfg, mesh=None)
        state = tr.state

        def step():
            nonlocal state
            state, loss = tr.train_step(state, images, ll, mh)
            return loss

        for _ in range(3):
            loss = step()
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            loss = step()
        _ = float(loss)
        ms = (time.perf_counter() - t0) / 10 * 1000
        record(name, ms, f"{BS / ms * 1000:.1f} img/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ops"):
        run_per_op()
    if which in ("all", "step"):
        run_whole_step()
    print(json.dumps(results))
