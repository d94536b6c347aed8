"""Round-4 CPU batch, part D: the fifth classifier criterion + the
hsoftmax convergence check.

* `classifier_multi_label` (reference) was smoked this round and CRASHES
  at upstream HEAD: finetuner.py:267 unpacks two values from
  MultiLabelEvaluation.evaluate, which returns a single dict
  (evaluation.py:287) — only MultiLevelEvaluation (evaluation.py:561)
  honors the two-tuple contract, so every non-MLEVAL criterion path is
  bitrotted. The crash record lives in experiments/ref_ab/results.json
  (classifier_multi_label_ep1_lr0.001). This batch runs the REBUILD's
  multi_label leg (threshold-tuned ML evaluator, its native contract)
  to show the fifth criterion trains end-to-end on the same sandbox.
* rebuild hsoftmax @60 ep: the 30-ep A/B left the rebuild at
  best_epoch=29 (still improving at cutoff, test m-F1 0.833 vs the
  reference's 0.906 on a 24-image test set); doubling the budget tests
  the "convergence, not semantics" hypothesis.

Run: cd /root/repo && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       nohup setsid python tools/run_cpu_batch_r4d.py \
       > /tmp/cpu_batch_r4d.log 2>&1 < /dev/null &
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
        if "CPU_BATCH_R4C DONE" in open("/tmp/cpu_batch_r4c.log").read():
            break
    except OSError:
        pass
    print("waiting for part C", flush=True)
    time.sleep(300)

for kind, n in (("rebuild_classifier_multi_label", "30"),
                ("rebuild_classifier_hsoftmax", "60")):
    print(f"=== {kind} {n} ===", flush=True)
    subprocess.run([sys.executable, "tools/reference_ab.py", kind, n],
                   check=False)
print("CPU_BATCH_R4D DONE", flush=True)
