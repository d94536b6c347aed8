"""Round-4 CPU batch, part F: post-reboot resume of the lost legs.

The dev VM rebooted mid-round and wiped all untracked state
(`experiments/`, /tmp logs, running batches). Parts A-D's results were
already recorded in BASELINE.md; this batch re-runs ONLY what was lost
before recording:

1. `classifier_multi_label 1` — regenerate the upstream-HEAD crash
   artifact (finetuner.py:267 two-tuple unpack vs the single dict
   MultiLabelEvaluation.evaluate returns) in experiments/ref_ab.
2. part E: the `--use_2d` (ETHEC2D) A/B, reference + rebuild, 30 ep.
3. part D's tail: the 60-epoch rebuild hsoftmax convergence leg (the
   30-ep A/B cut the rebuild off at best_epoch=29, still improving).
4. the full pytest suite (green-check after the reboot).

Run: cd /root/repo && nohup setsid python tools/run_cpu_batch_r4f.py \
        > /tmp/cpu_batch_r4f.log 2>&1 < /dev/null &
(The `run_cpu_batch_r4` argv prefix is what the TPU orchestrator's
paused_batches() matches — keep the name.)
"""

import os
import subprocess
import sys

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

LEGS = (
    ("classifier_multi_label", "1"),
    ("classifier2d_multi_level", "30"),
    ("rebuild_classifier2d_multi_level", "30"),
    ("rebuild_classifier_hsoftmax", "60"),
)
for kind, n in LEGS:
    print(f"=== {kind} {n} ===", flush=True)
    subprocess.run([sys.executable, "tools/reference_ab.py", kind, n],
                   check=False)

print("=== pytest ===", flush=True)
r = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-q"],
                   check=False)
print(f"PYTEST rc={r.returncode}", flush=True)
print("CPU_BATCH_R4F DONE", flush=True)
