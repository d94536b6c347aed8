"""Butterfly200 through the `--use_CNN` pixel path (VERDICT r3 #7): the
second taxonomy (5/23/116/200 = 344 nodes, data/butterfly200_taxonomy.json
extracted from the reference's hard-coded Butterfly200LabelMap,
db.py:17-1115) trained end-to-end on PIXELS through run_joint_cnn — the
same protocol as the ETHEC flagship (tools/quality_cnn_flagship.py):
ResNet-50 tower @448, hyperbolic cones, compressed curriculum + half_half,
device-resident synthetic separable per-leaf uint8 banks (Butterfly200
images don't ship with the reference, oe_h.py:1394-1409 loads them from a
private path).

Run:  python tools/quality_b200_cnn.py [n_epochs] [n_per_leaf]
      (cwd /root/repo for the axon TPU plugin)
"""

import json
import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.getcwd(), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from learning_embeddings_tpu.hierarchy import butterfly200_labelmap
from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
from learning_embeddings_tpu.train.joint_cnn import JointCNNConfig
from learning_embeddings_tpu.train.runner import run_joint_cnn

EXP_DIR = "experiments/quality_r4"
OUT = os.path.join(EXP_DIR, "results.json")

N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
N_PER_LEAF = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(os.environ.get("LE_Q4_SIZE", 448))
BACKBONE = os.environ.get("LE_Q4_BACKBONE", "resnet50")
NAME = (f"b200_cnn_{N_EPOCHS}ep_{N_PER_LEAF}perleaf"
        + ("" if (SIZE, BACKBONE) == (448, "resnet50")
           else f"_{BACKBONE}{SIZE}"))

t0 = time.time()
lm = butterfly200_labelmap()
assert tuple(lm.levels) == (5, 23, 116, 200), lm.levels
n_leaves = lm.levels[-1]
rng = np.random.RandomState(0)
patterns = rng.randint(0, 256, (n_leaves, 8, 8, 3)).astype(np.uint8)


def make_bank(leaves, salt):
    @jax.jit
    def chunk(small, key):
        up = jnp.repeat(jnp.repeat(small, SIZE // 8, 1), SIZE // 8, 2)
        noise = jax.random.randint(key, up.shape, -25, 26, jnp.int32)
        return jnp.clip(up.astype(jnp.int32) + noise, 0, 255).astype(
            jnp.uint8)

    n, C = len(leaves), 128
    pad = -(-n // C) * C if n > C else n
    rows = np.resize(np.asarray(leaves), pad)
    parts = [chunk(jnp.asarray(patterns[rows[i:i + C]]),
                   jax.random.PRNGKey(salt * 100003 + i))
             for i in range(0, pad, C)]
    return jnp.concatenate(parts)[:n]


def device_loader(bank):
    n = bank.shape[0]

    def load(rows):
        return bank[jnp.asarray(np.asarray(rows) % n)]
    return load


train_leaves = np.repeat(np.arange(n_leaves), N_PER_LEAF)
eval_leaves = np.arange(n_leaves)
ll_train = lm.leaf_paths()[train_leaves]
graph, train_edges = build_joint_graph(lm, ll_train)
print(f"graph: {graph.n_labels} labels + {graph.n_images} train images, "
      f"{len(train_edges)} edges", flush=True)

banks = {
    "train": make_bank(train_leaves, 1),
    "val": make_bank(eval_leaves, 2),
    "test": make_bank(eval_leaves, 3),
}
eval_paths = lm.leaf_paths()[eval_leaves] + np.asarray(
    lm.level_start)[None, :]

cfg = JointCNNConfig(
    energy="hyp_cone", backbone=BACKBONE, embedding_dim=10,
    image_size=SIZE, lr_labels=1e-3, lr_images=1e-3, batch_size=10,
    neg_to_pos_ratio=5, alpha=0.05, optimizer_labels="adam",
    pick_per_level=True, half_half=True,
    curriculum={0: (1, 2, 3), 5: (2, 3), 12: (3,), 25: ()},
    seed=0, pixel_bucket=64, inflight_steps=2, remat=True)

res = run_joint_cnn(
    lm, graph, train_edges, device_loader(banks["train"]), cfg,
    experiment_dir=EXP_DIR, experiment_name=NAME,
    n_epochs=N_EPOCHS, eval_interval=4,
    eval_sets={s: (eval_paths, device_loader(banks[s]))
               for s in ("val", "test")},
    manifest_args={"loss": "hyp_cones_loss", "use_CNN": "True",
                   "taxonomy": "butterfly200", "hide_levels": "True",
                   "half_half": "True"})

flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
flat.update({f"test_{k}": v for k, v in res["test_metrics"].items()})
flat["wall_s"] = round(time.time() - t0, 1)
os.makedirs(EXP_DIR, exist_ok=True)
results = json.load(open(OUT)) if os.path.exists(OUT) else {}
results[NAME] = flat
with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print("==", flat, flush=True)
