"""Round-3b backward-conv probes with DISPATCH-FREE timing.

perf_probe_r3.py's per-op numbers were dominated by a ~3 ms per-call
dispatch floor through the axon tunnel (c512_h14 fwd = 59 GFLOP ≈ 0.6 ms
of MXU time, measured 3.8 ms). Here every op runs K=20 times INSIDE one
jit via a lax.scan whose carry chains through the op (x_{k+1} depends on
x_k), so XLA cannot hoist the loop-invariant work and the measured time
is K genuine kernel executions + one dispatch.

Reports ms/op and achieved TFLOP/s against the v5e bf16 peak (197) for:
  fwd conv, input-grad, filter-grad (XLA autodiff),
  filter-grad as im2col patches+dot_general,
for the four hot resnet50 3x3 shapes at bs128@448.

Run:  python tools/perf_probe_r3b.py    (cwd /root/repo for axon)
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

OUT = "experiments/perf_r3b.json"
PEAK_TFLOPS = 197.0
K = 20
BS = 128
DN = ("NHWC", "HWIO", "NHWC")
results = {}


def record(name, ms, gflop):
    tf = gflop / ms  # GFLOP / ms == TFLOP/s
    results[name] = {"ms": round(ms, 3), "tflops": round(tf, 1),
                     "mxu_util": round(tf / PEAK_TFLOPS, 3)}
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"{name}: {ms:.3f} ms  {tf:.1f} TFLOP/s "
          f"({tf / PEAK_TFLOPS * 100:.0f}% MXU)", flush=True)


def timed_scan(chain_fn, init, iters=3):
    """ms per op application: scan K chained applications inside one jit."""
    @jax.jit
    def run(init):
        def body(c, _):
            return chain_fn(c), ()
        out, _ = lax.scan(body, init, None, length=K)
        return out

    out = run(init)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(out)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (iters * K) * 1000


SHAPES = [(112, 64), (56, 128), (28, 256), (14, 512)]

rng = np.random.RandomState(0)
for H, C in SHAPES:
    tag = f"c{C}_h{H}"
    gflop = 2 * BS * H * H * C * C * 9 / 1e9
    x0 = jnp.asarray(rng.rand(BS, H, H, C).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    w0 = jnp.asarray(rng.rand(3, 3, C, C).astype(np.float32) * 0.01,
                     jnp.bfloat16)

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=DN)

    # fwd: chain x -> conv(x, w0) (normalize to stop overflow)
    def fwd_chain(x):
        y = conv(x, w0)
        return (y * 0.01).astype(jnp.bfloat16)

    record(f"{tag}/fwd", timed_scan(fwd_chain, x0), gflop)

    # input grad: cotangent chains through vjp
    _, vjp = jax.vjp(lambda x: conv(x, w0), x0)

    def gin_chain(cot):
        (gx,) = vjp(cot.astype(jnp.bfloat16))
        return (gx * 0.01).astype(jnp.bfloat16)

    record(f"{tag}/grad_input",
           timed_scan(gin_chain, jnp.ones((BS, H, H, C), jnp.bfloat16)),
           gflop)

    # filter grad: chain w -> grad_w(sum conv(x0, w))
    def gw_chain(w):
        g = jax.grad(lambda w: jnp.sum(conv(x0, w).astype(jnp.float32)))(w)
        return (g * 1e-6 + w0).astype(jnp.bfloat16)

    record(f"{tag}/grad_filter", timed_scan(gw_chain, w0), gflop)

    # filter grad via explicit im2col (patches precomputed ONCE outside
    # the chain would be hoisted — keep patches inside to be fair)
    def gw_im2col_chain(w):
        patches = lax.conv_general_dilated_patches(
            x0, (3, 3), (1, 1), "SAME", dimension_numbers=DN)
        cot = jnp.ones((BS, H, H, C), jnp.bfloat16) + jnp.sum(w) * 0
        g = lax.dot_general(patches, cot,
                            (((0, 1, 2), (0, 1, 2)), ((), ())),
                            preferred_element_type=jnp.float32)
        g = g.reshape(C, 3, 3, C).transpose(1, 2, 0, 3)
        return (g * 1e-6 + w0).astype(jnp.bfloat16)

    record(f"{tag}/grad_filter_im2col", timed_scan(gw_im2col_chain, w0),
           gflop)

print(json.dumps(results))
