"""Round-4 CPU batch, part H: third post-reboot resume (session 2).

The dev VM rebooted again between the first round-4 session and this one,
wiping all untracked state a third time (experiments/, /tmp logs). This
batch re-runs ONLY the still-unrecorded losses:

1. the warm-start label table (`hyp_cone_d10_r4`) — the checkpoint the
   TPU flagship_warm4 stage consumes (reference --load_emb_from
   workflow, oe_h.py:1435-1436). Its BASELINE row exists; only the
   weights need re-training (~3 min). Runs FIRST because the TPU
   orchestrator (tools/r4_tpu_orchestrator2.py) polls for the ckpt.
2. the 60-epoch rebuild hsoftmax convergence leg (part D/F/G leg that
   never landed before the round ended): the 30-ep A/B left the rebuild
   at best_epoch=29, still improving at cutoff (test m-F1 0.833 vs the
   reference's 0.906 on a 24-image test set); doubling the budget tests
   the "convergence, not semantics" hypothesis.

Results are mirrored into R4_RESULTS_AUTO.md (git-tracked) so a
round-end snapshot preserves them even if this session ends first.

Run: cd /root/repo && nohup setsid python tools/run_cpu_batch_r4h.py \
        > /tmp/cpu_batch_r4h.log 2>&1 < /dev/null &
(The `tools/run_cpu_batch_` argv prefix is what bench.py's and the TPU
orchestrator's paused_batches() match — keep the name.)
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
REPO = os.getcwd()
sys.path.insert(0, REPO)
# CPU batch: never touch the TPU (the sitecustomize registers the axon
# backend at interpreter start; re-exec with a clean env — see part G).
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

EXP_DIR = "experiments/quality_r4_label"
OUT = os.path.join(EXP_DIR, "results.json")
AUTO = "R4_RESULTS_AUTO.md"


def auto_record(title, rec):
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} ({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})\n\n"
                f"```json\n{json.dumps(rec, indent=2)}\n```\n")


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
    auto_record("warm-start label table re-trained (hyp_cone_d10_r4, "
                "session-2 rerun after third state wipe)", flat)


if __name__ == "__main__":
    label_only_warmstart()
    print("=== rebuild_classifier_hsoftmax 60 ===", flush=True)
    subprocess.run([sys.executable, "tools/reference_ab.py",
                    "rebuild_classifier_hsoftmax", "60"], check=False)
    try:
        blob = json.load(open("experiments/ref_ab/results.json"))
        key = [k for k in blob if k.startswith("rebuild_classifier_hsoftmax_ep60")]
        auto_record("rebuild hsoftmax 60-epoch convergence leg",
                    {k: blob[k] for k in key})
    except (OSError, ValueError) as e:
        auto_record("rebuild hsoftmax 60-epoch convergence leg",
                    {"error": str(e)})
    print("CPU_BATCH_R4H DONE", flush=True)
