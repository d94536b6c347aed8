"""Round-2 quality-parity runs on the REAL ETHEC taxonomy (6/21/135/561).

Produces the converged label-embedding + joint-embedding quality numbers
recorded in BASELINE.md's "Quality (real taxonomy)" table. Label-only runs
need no images (reference runs them on the imageless ETHECDB,
order_embeddings_h.py:381-432); the joint run uses synthetic-but-separable
fc7-like features (per-leaf gaussian clusters) so that image->label ranking
quality is attributable to the embedding geometry, not a CNN.

Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/quality_runs.py
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

EXP_DIR = "experiments/quality_r2"
OUT = os.path.join(EXP_DIR, "results.json")


def record(name, res, t0):
    # merge into the ON-DISK record: a later partial run rewriting the
    # file from a fresh in-memory dict is how the r2 label-only entries
    # (and their round-3 usefulness as warm-start pointers) were lost
    os.makedirs(EXP_DIR, exist_ok=True)
    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    results[name] = {k: v for k, v in res.items()
                     if isinstance(v, (int, float, str))}
    results[name]["wall_s"] = round(time.time() - t0, 1)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"== {name}: {results[name]}", flush=True)


def label_run(name, main, loss, n_epochs, lr, extra=()):
    t0 = time.time()
    argv = (f"--set_mode train --loss {loss} --pick_per_level "
            f"--graph_from all "
            f"--n_epochs {n_epochs} --lr {lr} --batch_size 10 "
            f"--embedding_dim 10 --neg_to_pos_ratio 5 "
            f"--eval_interval 5 --check_reconstr_every 25 "
            f"--experiment_name {name} "
            f"--experiment_dir {EXP_DIR}").split() + list(extra)
    record(name, main(argv), t0)


def main():
    from learning_embeddings_tpu.cli.order_embeddings import main as oe_main
    from learning_embeddings_tpu.cli.order_embeddings_h import main as oeh_main

    # 1) hyperbolic entailment cones, conformal-adam hybrid (ref defaults:
    #    dim 10, ratio 5, alpha 0.05, K 0.1 — order_embeddings_h.py:1486-1528)
    label_run("hyp_cone_d10", oeh_main, "hyp_cones_loss",
              n_epochs=300, lr=0.001, extra=["--alpha", "0.05"])

    # 2) euclidean order embeddings (margin alpha 1.0 — the vendrov-style
    #    margin the reference uses for OrderEmbeddingLoss experiments)
    label_run("order_d10", oe_main, "order_emb_loss",
              n_epochs=300, lr=0.001, extra=["--alpha", "1.0"])

    # 3) euclidean cones K=3 (EucConesLoss, order_embeddings.py:926-1105)
    label_run("euc_cone_d10", oe_main, "euc_cones_loss",
              n_epochs=300, lr=0.001, extra=["--alpha", "0.05"])

    # 4) joint image+label hyperbolic cones on the real taxonomy with
    #    synthetic-but-separable per-leaf fc7 clusters
    from learning_embeddings_tpu.cli.common import load_ethec_data
    from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
    from learning_embeddings_tpu.train.joint import JointTrainerConfig
    from learning_embeddings_tpu.train.runner import run_joint_embedding

    t0 = time.time()
    lm, datasets, _ = load_ethec_data("/root/reference/splits/ETHEC")
    print("taxonomy levels:", lm.levels, flush=True)
    graph, train_edges = build_joint_graph(lm, datasets["train"].level_labels)
    rng = np.random.RandomState(0)
    D = 256
    mu = rng.randn(lm.levels[-1], D).astype(np.float32)

    def feats_for(ds):
        leaf = ds.leaf_labels
        return (mu[leaf] + 0.15 * rng.randn(len(leaf), D)).astype(np.float32)

    feats = feats_for(datasets["train"])
    eval_features = {s: feats_for(datasets[s]) for s in ("val", "test")}
    eval_paths = {s: (datasets[s].level_labels
                      + np.asarray(lm.level_start)[None, :])
                  for s in ("val", "test")}
    cfg = JointTrainerConfig(
        energy="hyp_cone", embedding_dim=10, feature_dim=D,
        lr_labels=1e-3, lr_images=1e-3, batch_size=50,
        neg_to_pos_ratio=5, alpha=0.05, optimizer_labels="adam",
        pick_per_level=True, seed=0)
    res = run_joint_embedding(
        lm, graph, train_edges, feats, cfg,
        experiment_dir=EXP_DIR, experiment_name="joint_hyp_cone",
        n_epochs=40, eval_interval=5,
        eval_features=eval_features, eval_paths=eval_paths,
        manifest_args={"loss": "hyp_cones_loss", "embedding_dim": "10"})
    flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
    flat.update({f"test_{k}": v for k, v in res["test_metrics"].items()})
    record("joint_hyp_cone", flat, t0)

    print("ALL QUALITY RUNS DONE", flush=True)


if __name__ == "__main__":
    main()
