"""One freeze_bn resnet50@448 bs128 measurement — run under different
XLA_FLAGS env settings to diagnose whether client compiler flags propagate
through the axon remote-compile tunnel (BASELINE round-2 question)."""
import json
import os
import sys

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
# NOTE: no compilation cache — each run must compile fresh so flag effects
# (if any) are visible
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, "/root/repo/tools")
from perf_probe_r2d import measure

if __name__ == "__main__":
    out = measure({"freeze_bn": True}, 128, steps=10, warmup=2)
    out["xla_flags"] = os.environ.get("XLA_FLAGS", "")
    print(json.dumps(out), flush=True)
