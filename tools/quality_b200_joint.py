"""Butterfly200 JOINT quality run: image+label hyperbolic cones on the
frozen 5/23/116/200 taxonomy with synthetic separable fc7-style features
(mirrors the ETHEC joint quality runs in BASELINE.md — demonstrates the
second dataset end-to-end through the joint stack).

Run: cd /root/repo && nohup setsid python tools/quality_b200_joint.py \
        > /tmp/quality_b200_joint.log 2>&1 < /dev/null &
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

from learning_embeddings_tpu.hierarchy import butterfly200_labelmap
from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
from learning_embeddings_tpu.train.joint import JointTrainerConfig
from learning_embeddings_tpu.train.runner import run_joint_embedding

t0 = time.time()
lm = butterfly200_labelmap()
rng = np.random.RandomState(0)
D = 256
# 10 synthetic specimens per species, separable features
leaves = np.repeat(np.arange(lm.levels[-1]), 10)
rng.shuffle(leaves)
ll = lm.leaf_paths()[leaves]
graph, train_edges = build_joint_graph(lm, ll)
mu = rng.randn(lm.levels[-1], D).astype(np.float32)


def feats_for(lv):
    return (mu[lv] + 0.15 * rng.randn(len(lv), D)).astype(np.float32)


n = len(leaves)
ev = rng.randint(0, lm.levels[-1], 400)
cfg = JointTrainerConfig(
    energy="hyp_cone", embedding_dim=10, feature_dim=D,
    lr_labels=1e-3, lr_images=1e-3, batch_size=50,
    neg_to_pos_ratio=5, alpha=0.05, optimizer_labels="adam",
    pick_per_level=True, seed=0)
res = run_joint_embedding(
    lm, graph, train_edges, feats_for(leaves), cfg,
    experiment_dir="experiments/quality_r2", experiment_name="b200_joint",
    n_epochs=40, eval_interval=5,
    eval_features={"val": feats_for(ev), "test": feats_for(ev)},
    eval_paths={"val": lm.leaf_paths()[ev] + np.asarray(lm.level_start)[None],
                "test": lm.leaf_paths()[ev] + np.asarray(lm.level_start)[None]},
    manifest_args={"loss": "hyp_cones_loss", "taxonomy": "butterfly200"})
flat = {k: round(v, 4) for k, v in res.items() if isinstance(v, (int, float))}
flat.update({f"test_{k}": round(v, 4)
             for k, v in res["test_metrics"].items()
             if isinstance(v, (int, float))})
flat["wall_s"] = round(time.time() - t0, 1)
print("==", json.dumps(flat), flush=True)
