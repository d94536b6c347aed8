"""Device mesh + sharding helpers.

The reference's only parallelism is single-process `nn.DataParallel`
(replicate module, scatter batch — SURVEY.md §2.6). The TPU-native
equivalent: a `jax.sharding.Mesh` over ('data', 'model'),

* batches sharded over 'data' (pure DP — the grad all-reduce is inserted
  by XLA because parameters are replicated),
* optionally, wide output layers (the 723-way head, embedding tables)
  sharded over 'model' (TP) — collectives ride ICI automatically.

Everything uses GSPMD via jit + NamedSharding: one traced program, XLA
chooses the collective schedule.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_shardings"]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use == 0 or use > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) = {use} devices does "
            f"not fit the {len(devices)} available device(s)")
    grid = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, tp_patterns: Sequence[str] = ()):
    """Replicate everything except parameters whose tree path matches one of
    `tp_patterns` (regex over '/'-joined path); those shard over 'model'
    (tensor parallelism). The sharded axis is the last whose size divides
    the 'model' axis — column-parallel when the fan-out divides, otherwise
    row-parallel on the fan-in (XLA inserts the psum); replicate if neither
    divides."""
    compiled = [re.compile(p) for p in tp_patterns]
    n_model = mesh.shape.get("model", 1)

    def assign(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if (n_model > 1 and x.ndim >= 1
                and any(p.search(name) for p in compiled)):
            for axis in range(x.ndim - 1, -1, -1):
                if x.shape[axis] % n_model == 0:
                    spec = [None] * x.ndim
                    spec[axis] = "model"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
