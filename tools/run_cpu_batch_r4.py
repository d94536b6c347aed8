"""Round-4 CPU batch:

1. re-train the converged label-only hyperbolic-cone table (the r2
   hyp_cone_d10 run's checkpoint no longer exists on disk — its
   results.json record was also clobbered by later quality runs writing
   the same file from fresh processes). The table is the warm start the
   TPU flagship run consumes (reference --load_emb_from workflow,
   oe_h.py:1435-1436).
2. the classifier-family A/B (reference ETHEC_train_model --debug vs the
   rebuild CLI) for multi_level AND masked_loss, run as subprocesses (the
   reference modules seed global RNGs / cache state at import).

Run: cd /root/repo && nohup setsid python tools/run_cpu_batch_r4.py \
        > /tmp/cpu_batch_r4.log 2>&1 < /dev/null &
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
REPO = os.getcwd()
sys.path.insert(0, REPO)
# CPU batch: never touch the TPU (the TPU batches own the chip). The axon
# sitecustomize registers the TPU backend at INTERPRETER START whenever
# PALLAS_AXON_POOL_IPS is non-empty, so mutating os.environ here is too
# late for this process — re-exec with a clean environment instead
# (measured: the in-process assignment alone left the batch hanging in
# axon backend init during the round-4 outage).
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


if __name__ == "__main__":
    label_only_warmstart()
    for kind in ("classifier_multi_level", "rebuild_classifier_multi_level",
                 "classifier_masked_loss", "rebuild_classifier_masked_loss"):
        print(f"=== {kind} ===", flush=True)
        subprocess.run([sys.executable, "tools/reference_ab.py", kind, "30"],
                       check=False)
    print("CPU_BATCH_R4 DONE", flush=True)
