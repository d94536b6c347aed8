"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run over
XLA's host-platform virtual devices (the recommended JAX pattern for testing
`Mesh`/`shard_map` code paths without real chips)."""

import os

# Force, don't setdefault: the ambient env sets JAX_PLATFORMS=axon (the real
# TPU tunnel); unit tests must run on the virtual CPU mesh for speed and for
# exact-math comparisons against the torch oracle.
#
# A sitecustomize force-registers the axon TPU backend in every python
# process when PALLAS_AXON_POOL_IPS is set, overriding JAX_PLATFORMS — blank
# it out so the register is skipped and the cpu platform actually wins.
#
# LE_TPU_TESTS=1 keeps the real device (for tests/test_tpu_only.py).
_USE_TPU = os.environ.get("LE_TPU_TESTS") == "1"
if not _USE_TPU:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The sitecustomize imports jax at interpreter startup (before this file),
# so the env vars above may be too late for jax.config — override the
# already-initialized config as well. Backends are created lazily at the
# first computation, so this still wins as long as no test ran yet.
import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
