"""Round-4 CPU batch, part G: second post-reboot resume.

The dev VM rebooted AGAIN mid-round (fresh checkout at 2026-08-18 11:10)
and wiped all untracked state a second time. Everything recorded in
BASELINE.md is safe; this batch re-runs ONLY the unrecorded losses:

1. the warm-start label table (`hyp_cone_d10_r4`) — the checkpoint the
   TPU flagship_warm4 stage consumes (reference --load_emb_from
   workflow, oe_h.py:1435-1436); its BASELINE row exists but the weights
   were untracked. ~3 min.
2. part F's legs, none of which landed before the reboot:
   - `classifier_multi_label 1` upstream-HEAD crash artifact
   - the `--use_2d` (ETHEC2D) A/B, reference + rebuild, 30 ep
   - the 60-epoch rebuild hsoftmax convergence leg
3. the full pytest suite (green-check on the fresh checkout).

Run: cd /root/repo && nohup setsid python tools/run_cpu_batch_r4g.py \
        > /tmp/cpu_batch_r4g.log 2>&1 < /dev/null &
(The `run_cpu_batch_r4` argv prefix is what the TPU orchestrator's
paused_batches() matches — keep the name.)
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
REPO = os.getcwd()
sys.path.insert(0, REPO)
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

EXP_DIR = "experiments/quality_r4_label"
OUT = os.path.join(EXP_DIR, "results.json")


def label_only_warmstart():
    from learning_embeddings_tpu.cli.order_embeddings_h import main as oeh

    name = "hyp_cone_d10_r4"
    t0 = time.time()
    res = oeh((f"--set_mode train --loss hyp_cones_loss --pick_per_level "
               f"--graph_from all --n_epochs 300 --lr 0.001 --alpha 0.05 "
               f"--batch_size 10 --embedding_dim 10 --neg_to_pos_ratio 5 "
               f"--eval_interval 5 --check_reconstr_every 25 "
               f"--experiment_name {name} "
               f"--experiment_dir {EXP_DIR}").split())
    flat = {k: v for k, v in res.items() if isinstance(v, (int, float, str))}
    flat["wall_s"] = round(time.time() - t0, 1)
    os.makedirs(EXP_DIR, exist_ok=True)
    blob = json.load(open(OUT)) if os.path.exists(OUT) else {}
    blob[name] = flat
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {flat}", flush=True)
    ckpt = os.path.join(EXP_DIR, name, "weights", "best_model")
    assert os.path.exists(ckpt), ckpt
    print(f"WARMSTART_CKPT {ckpt}", flush=True)


LEGS = (
    ("classifier_multi_label", "1"),
    ("classifier2d_multi_level", "30"),
    ("rebuild_classifier2d_multi_level", "30"),
    ("rebuild_classifier_hsoftmax", "60"),
)

if __name__ == "__main__":
    label_only_warmstart()
    for kind, n in LEGS:
        print(f"=== {kind} {n} ===", flush=True)
        subprocess.run([sys.executable, "tools/reference_ab.py", kind, n],
                       check=False)
    print("=== pytest ===", flush=True)
    r = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-q"],
                       check=False)
    print(f"PYTEST rc={r.returncode}", flush=True)
    print("CPU_BATCH_R4G DONE", flush=True)
