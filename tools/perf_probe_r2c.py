"""Perf probe round 2c: joint (--use_CNN) north-star batch-size sweep.

The joint CNN-tower step at edge-bs 16 leaves the MXU underfed; larger
edge batches push more unique images through the tower per step.

Run:  cd /root/repo && python tools/perf_probe_r2c.py > /tmp/perf_probe_r2c.log
"""

import json
import os
import sys

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import contextlib
import io

import bench

if __name__ == "__main__":
    for bs in (16, 32, 64):
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main_joint(batch_size=bs)
            out = json.loads(buf.getvalue().strip().splitlines()[-1])
            out["edge_bs"] = bs
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"edge_bs": bs, "error": repr(e)[:300]}),
                  flush=True)
    print("PROBE2C DONE", flush=True)
