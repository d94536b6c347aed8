"""Round-4 CPU batch, part B: extend the classifier family A/B to the
remaining structured criteria once part A (run_cpu_batch_r4.py) is done.

Part A covers multi_level + masked_loss (VERDICT r3 #2 asked for
multi_level AND one structured criterion). This adds hsoftmax and
last_level — with it, 4 of the 5 classification criteria are A/B'd
against the RUNNING reference (multi_label's evaluator is the
threshold-tuned MultiLabelEvaluation path, a different eval contract;
its loss math is oracle-tested in tests/test_losses.py).

Run: cd /root/repo && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       nohup setsid python tools/run_cpu_batch_r4b.py \
       > /tmp/cpu_batch_r4b.log 2>&1 < /dev/null &
"""

import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

CPU_LOG = "/tmp/cpu_batch_r4.log"

while True:
    try:
        if "CPU_BATCH_R4 DONE" in open(CPU_LOG).read():
            break
    except OSError:
        pass
    print("waiting for part A", flush=True)
    time.sleep(300)

for kind in ("classifier_hsoftmax", "rebuild_classifier_hsoftmax",
             "classifier_last_level", "rebuild_classifier_last_level"):
    print(f"=== {kind} ===", flush=True)
    subprocess.run([sys.executable, "tools/reference_ab.py", kind, "30"],
                   check=False)
print("CPU_BATCH_R4B DONE", flush=True)
