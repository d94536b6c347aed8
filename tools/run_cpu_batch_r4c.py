"""Round-4 CPU batch, part C: warm-started fc7 flagship.

Measures the warm-start lever (--load_emb_from, the reference's own
remedy for hard cone optimization, oe_h.py:1435-1436) at the flagship
fc7 configuration on CPU — the converged un-warmed baseline is r2's
joint_flagship_curriculum_200ep (micro-F1 0.730 / recon 0.898). This
complements (and hedges, given the TPU outage) the TPU CNN-flagship
warm run the orchestrator owns.

Run: cd /root/repo && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       nohup setsid python tools/run_cpu_batch_r4c.py \
       > /tmp/cpu_batch_r4c.log 2>&1 < /dev/null &
"""

import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"

while True:
    try:
        if "CPU_BATCH_R4B DONE" in open("/tmp/cpu_batch_r4b.log").read():
            break
    except OSError:
        pass
    print("waiting for part B", flush=True)
    time.sleep(300)

subprocess.run([sys.executable, "tools/quality_joint_flagship.py",
                "200", "compressed", "adam", WARM], check=False)
print("CPU_BATCH_R4C DONE", flush=True)
