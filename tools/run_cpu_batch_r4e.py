"""Round-4 CPU batch, part E: the --use_2d (ETHEC2D) variant A/B.

Component #20 (2-D bottleneck variant, ethec_experiments.py:35-200) has
rebuild-side tests and plots but was never run upstream-vs-rebuild.
This runs the reference's ETHEC2D driver (CNN2DFeat bias-free 2-d
bottleneck + per-level bias-free heads, multi_level criterion) and the
rebuild's `--use_2d` CLI on the identical 12-species sandbox.

Run: cd /root/repo && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       nohup setsid python tools/run_cpu_batch_r4e.py \
       > /tmp/cpu_batch_r4e.log 2>&1 < /dev/null &
"""

import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

while True:
    try:
        if "CPU_BATCH_R4D DONE" in open("/tmp/cpu_batch_r4d.log").read():
            break
    except OSError:
        pass
    print("waiting for part D", flush=True)
    time.sleep(300)

for kind in ("classifier2d_multi_level", "rebuild_classifier2d_multi_level"):
    print(f"=== {kind} ===", flush=True)
    subprocess.run([sys.executable, "tools/reference_ab.py", kind, "30"],
                   check=False)
print("CPU_BATCH_R4E DONE", flush=True)
