"""Flagship joint config quality run: curriculum level-hiding + half_half
resampling on the REAL 723-node ETHEC taxonomy (the reference's oe_h.py
configuration, levels_to_hide_for_epoch compressed 4x to fit a 35-epoch
run). Appends to experiments/quality_r2/results.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.getcwd())

import numpy as np

from learning_embeddings_tpu.cli.common import load_ethec_data
from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
from learning_embeddings_tpu.train.joint import JointTrainerConfig
from learning_embeddings_tpu.train.runner import run_joint_embedding

EXP_DIR = "experiments/quality_r2"
OUT = os.path.join(EXP_DIR, "results.json")

t0 = time.time()
lm, datasets, _ = load_ethec_data("/root/reference/splits/ETHEC")
graph, train_edges = build_joint_graph(lm, datasets["train"].level_labels)
rng = np.random.RandomState(0)
D = 256
mu = rng.randn(lm.levels[-1], D).astype(np.float32)


def feats_for(ds):
    return (mu[ds.leaf_labels]
            + 0.15 * rng.randn(len(ds.leaf_labels), D)).astype(np.float32)


N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 35
# 'compressed' (reference schedule / 4) or 'reference' (verbatim
# {0:[1,2,3],20:[2,3],50:[3],100:[]}, oe_h.py:1534-1536)
SCHEDULE = sys.argv[2] if len(sys.argv) > 2 else "compressed"
OPT = sys.argv[3] if len(sys.argv) > 3 else "adam"   # adam | radam | rsgd
# optional argv[4]: label-embedding checkpoint (weights/<name>) whose
# table + calibrated threshold warm-start the label side — the reference
# --load_emb_from workflow (oe_h.py:1435-1436)
WARM_CKPT = sys.argv[4] if len(sys.argv) > 4 else None
NAME = ("joint_flagship_curriculum" if N_EPOCHS == 35
        else f"joint_flagship_curriculum_{N_EPOCHS}ep")
if SCHEDULE != "compressed":
    NAME += f"_{SCHEDULE}"
if OPT != "adam":
    NAME += f"_{OPT}"
if WARM_CKPT:
    NAME += "_warm"
CURRICULA = {
    "compressed": {0: (1, 2, 3), 5: (2, 3), 12: (3,), 25: ()},
    "reference": {0: (1, 2, 3), 20: (2, 3), 50: (3,), 100: ()},
}

cfg = JointTrainerConfig(
    energy="hyp_cone", embedding_dim=10, feature_dim=D,
    lr_labels=1e-3, lr_images=1e-3, batch_size=50,
    neg_to_pos_ratio=5, alpha=0.05, optimizer_labels=OPT,
    pick_per_level=True, half_half=True,
    curriculum=CURRICULA[SCHEDULE],
    seed=0)
init_embeddings, init_threshold = None, None
if WARM_CKPT:
    from learning_embeddings_tpu.train.experiment import Checkpointer

    class _Dir:   # Checkpointer only needs .weights
        weights = os.path.dirname(os.path.abspath(WARM_CKPT))

    payload = Checkpointer(_Dir()).load_raw(os.path.basename(WARM_CKPT))
    init_embeddings = np.asarray(payload["params"]["params"]["embedding"])
    thr = float(payload.get("optimal_threshold", float("nan")))
    init_threshold = None if np.isnan(thr) else thr
    print(f"warm start: table {init_embeddings.shape} from {WARM_CKPT}, "
          f"threshold {init_threshold}", flush=True)

res = run_joint_embedding(
    lm, graph, train_edges, feats_for(datasets["train"]), cfg,
    experiment_dir=EXP_DIR, experiment_name=NAME,
    n_epochs=N_EPOCHS, eval_interval=5,
    init_embeddings=init_embeddings, init_threshold=init_threshold,
    eval_features={s: feats_for(datasets[s]) for s in ("val", "test")},
    eval_paths={s: (datasets[s].level_labels
                    + np.asarray(lm.level_start)[None, :])
                for s in ("val", "test")},
    manifest_args={"loss": "hyp_cones_loss", "hide_levels": "True",
                   "half_half": "True",
                   **({"load_emb_from": WARM_CKPT} if WARM_CKPT else {})})
flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
flat.update({f"test_{k}": v for k, v in res["test_metrics"].items()})
flat["wall_s"] = round(time.time() - t0, 1)
results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results[NAME] = flat
with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print("==", flat, flush=True)
