"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run over
XLA's host-platform virtual devices (the recommended JAX pattern for testing
`Mesh`/`shard_map` code paths without real chips)."""

import os

# Force, don't setdefault: the ambient env sets JAX_PLATFORMS=axon (the real
# TPU tunnel); unit tests must run on the virtual CPU mesh for speed and for
# exact-math comparisons against the torch oracle.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
