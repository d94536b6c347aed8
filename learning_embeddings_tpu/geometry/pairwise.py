"""All-pairs entailment energies E(U, V) — tiled device kernels.

The reference computes pairwise energies with chunked Python loops on host
(graph reconstruction over all O(N²) node pairs, oe_h.py:2180-2247; image ×
label ranking, oe_h.py:2018-2053, chunks of 100). Here:

* cone energies (Euclidean & hyperbolic) depend on x·y, ‖x‖, ‖y‖ only →
  one MXU matmul (the Gram matrix) + elementwise VPU math. XLA fuses the
  epilogue; no custom kernel needed.
* the order energy Σ_d max(0, u_d − v_d)² is *not* expressible via a Gram
  matrix → a tiled Pallas kernel streams (BM, D) × (BN, D) blocks through
  VMEM and accumulates the (BM, BN) tile, avoiding the O(M·N·D)
  materialization an XLA broadcast would need.

All functions take U (M, D), V (N, D) and return (M, N) float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .energies import EUC_CONE_K, HYP_CONE_K, _CLAMP, _TINY

__all__ = [
    "pairwise_order_energy",
    "pairwise_euc_cone_energy",
    "pairwise_hyp_cone_energy",
    "pairwise_energy",
    "pairwise_energy_sharded",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# order energy — Pallas kernel
# ---------------------------------------------------------------------------

def _order_kernel(u_ref, v_ref, out_ref, *, d_chunk: int):
    u = u_ref[:]  # (BM, D)
    v = v_ref[:]  # (BN, D)
    bm, d = u.shape
    bn = v.shape[0]
    acc = jnp.zeros((bm, bn), jnp.float32)
    for d0 in range(0, d, d_chunk):
        du = u[:, d0:d0 + d_chunk].astype(jnp.float32)
        dv = v[:, d0:d0 + d_chunk].astype(jnp.float32)
        diff = jnp.maximum(du[:, None, :] - dv[None, :, :], 0.0)
        acc = acc + jnp.sum(diff * diff, axis=-1)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def _pairwise_order_pallas(u, v, block_m=128, block_n=128, interpret=False):
    m, d = u.shape
    n = v.shape[0]
    mp, np_, dp = _round_up(m, block_m), _round_up(n, block_n), _round_up(d, 128)
    u = jnp.pad(u.astype(jnp.float32), ((0, mp - m), (0, dp - d)))
    v = jnp.pad(v.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    d_chunk = min(dp, 128)
    out = pl.pallas_call(
        functools.partial(_order_kernel, d_chunk=d_chunk),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * mp * np_ * dp,
            bytes_accessed=4 * (mp * dp + np_ * dp + mp * np_),
            transcendentals=0,
        ),
    )(u, v)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("row_block",))
def _pairwise_order_xla(u, v, row_block=128):
    """Row-blocked XLA fallback: O(row_block · N · D) live memory."""
    m, d = u.shape
    mp = _round_up(m, row_block)
    u = jnp.pad(u.astype(jnp.float32), ((0, mp - m), (0, 0)))
    v = v.astype(jnp.float32)

    def f(u_blk):
        diff = jnp.maximum(u_blk[:, None, :] - v[None, :, :], 0.0)
        return jnp.sum(diff * diff, axis=-1)

    out = jax.lax.map(f, u.reshape(mp // row_block, row_block, d))
    return out.reshape(mp, v.shape[0])[:m]


def pairwise_order_energy(u, v, *, use_pallas: bool | None = None):
    """(M, N) matrix of order energies E(u_i, v_j) = ‖max(0, u_i − v_j)‖²."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _pairwise_order_pallas(u, v)
    return _pairwise_order_xla(u, v)


# ---------------------------------------------------------------------------
# cone energies — Gram-matrix formulations (single MXU matmul)
# ---------------------------------------------------------------------------

def _gram_stats(u, v):
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    dot = jnp.dot(u, v.T, preferred_element_type=jnp.float32)     # (M, N)
    un = jnp.sqrt(jnp.maximum(jnp.sum(u * u, axis=-1), 0.0))[:, None]  # (M,1)
    vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))[None, :]  # (1,N)
    # cancellation-stable: ‖x−y‖² = (‖x‖−‖y‖)² + 2(‖x‖‖y‖ − x·y)
    c = jnp.maximum(un * vn - dot, 0.0)
    dist = jnp.sqrt((un - vn) ** 2 + 2.0 * c)
    return dot, un, vn, dist


@functools.partial(jax.jit, static_argnames=("K",))
def pairwise_euc_cone_energy(u, v, K: float = EUC_CONE_K):
    """Pairwise Euclidean cone energy from the Gram matrix.

    Θ(x,y) = −⟨x̂, (y−x)̂⟩ = −(x·y − ‖x‖²) / (‖x‖·‖y−x‖), norms floored at
    1e-12 to match torch F.normalize; ψ(x) = −sqrt(1 − K²/‖x‖²)."""
    dot, un, vn, dist = _gram_stats(u, v)
    theta = -(dot - un**2) / (jnp.maximum(un, 1e-12) * jnp.maximum(dist, 1e-12))
    psi = -jnp.sqrt(jnp.maximum(1.0 - (K * K) / jnp.maximum(un**2, _TINY), 0.0))
    return jnp.maximum(theta - psi, 0.0)


@functools.partial(jax.jit, static_argnames=("K",))
def pairwise_hyp_cone_energy(u, v, K: float = HYP_CONE_K):
    """Pairwise hyperbolic cone energy from the Gram matrix (same formula
    and ±(1−1e−5) clamps as geometry.energies.hyp_cone_energy)."""
    dot, un, vn, dist = _gram_stats(u, v)
    num = dot * (1.0 + un**2) - (un**2) * (1.0 + vn**2)
    # stable: 1 + (‖x‖‖y‖)² − 2x·y = (1 − ‖x‖‖y‖)² + 2(‖x‖‖y‖ − x·y)
    rad = jnp.maximum(
        (1.0 - un * vn) ** 2 + 2.0 * jnp.maximum(un * vn - dot, 0.0), _TINY)
    den = jnp.maximum(un * dist * jnp.sqrt(rad), _TINY)
    theta = jnp.arccos(jnp.clip(num / den, -1.0 + _CLAMP, 1.0 - _CLAMP))
    psi_arg = K * (1.0 - un**2) / jnp.maximum(un, _TINY)
    psi = jnp.arcsin(jnp.clip(psi_arg, -1.0 + _CLAMP, 1.0 - _CLAMP))
    return jnp.maximum(theta - psi, 0.0)


_PAIRWISE = {
    "order": pairwise_order_energy,
    "euc_cone": pairwise_euc_cone_energy,
    "hyp_cone": pairwise_hyp_cone_energy,
}


def pairwise_energy(kind: str, u, v, **kw):
    return _PAIRWISE[kind](u, v, **kw)


# ---------------------------------------------------------------------------
# mesh-sharded all-pairs — V's rows over 'data', U replicated
# ---------------------------------------------------------------------------

# bounded: meshes (and their compiled executables) are retained by the
# cache — tests that build many differently-shaped meshes must not pin
# device handles forever (ADVICE r4)
@functools.lru_cache(maxsize=8)
def _sharded_pairwise_fn(kind: str, mesh, kw_items):
    from jax.sharding import PartitionSpec as P

    kw = dict(kw_items)
    n_model = dict(mesh.shape).get("model", 1)
    # U's rows shard over 'model' (when present), V's rows over 'data':
    # every chip in the mesh gets an (M/p, N/q) tile, not just the data
    # axis — a {data: 4, model: 2} mesh uses all 8 chips (ADVICE r4).
    u_spec = P("model", None) if n_model > 1 else P()
    out_spec = P("model", "data") if n_model > 1 else P(None, "data")
    return jax.jit(jax.shard_map(
        lambda uu, vv: pairwise_energy(kind, uu, vv, **kw),
        mesh=mesh, in_specs=(u_spec, P("data", None)),
        out_specs=out_spec))


def _pad_rows(x, multiple: int):
    pad = (-x.shape[0]) % multiple
    if not pad:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])


def pairwise_energy_sharded(kind: str, u, v, *, mesh=None, **kw):
    """(M, N) all-pairs energies tiled over the mesh: U's rows shard over
    'model' (if that axis is wider than 1), V's rows over 'data', so each
    device runs the SAME single-device kernel on its (M/p, N/q) tile —
    tiles are independent, so no collectives are inserted. The reference's
    eval-side pairwise passes are host-chunked loops on one GPU (ranking
    oe_h.py:2018-2053, reconstruction oe_h.py:2180-2247); unsharded they
    would idle every other chip at each eval interval. Ragged M/N pad with
    a repeated last row and the padding is sliced off. mesh=None (or a
    1-chip mesh) and empty inputs fall back to the plain kernel.

    Note: tiling changes XLA's block shapes, so meshed energies can drift
    from the single-device kernel at ulp level (~1e-5 relative on
    XLA:CPU) — ranking/threshold decisions are tolerance-tested, not
    bit-exact (tests/test_geometry.py)."""
    m, n = int(u.shape[0]), int(v.shape[0])
    if mesh is None or m == 0 or n == 0:
        return pairwise_energy(kind, u, v, **kw)
    shape = dict(mesh.shape)
    q, p = shape.get("data", 1), shape.get("model", 1)
    if q <= 1 and p <= 1:
        return pairwise_energy(kind, u, v, **kw)
    uj = _pad_rows(jnp.asarray(u), p)
    vj = _pad_rows(jnp.asarray(v), q)
    fn = _sharded_pairwise_fn(kind, mesh, tuple(sorted(kw.items())))
    return fn(uj, vj)[:m, :n]
