"""Runner-level tests: checkpoint/resume round trip, manifests, score dumps,
2-d bottleneck plots."""

import json
import os

import numpy as np
import pytest

from learning_embeddings_tpu.data.workloads import (
    ArrayDataset,
    synthetic_array_dataset,
)
from learning_embeddings_tpu.hierarchy import (
    label_graph_from_paths,
    split_edges,
    toy_labelmap,
)
from learning_embeddings_tpu.train.classifier import ClassifierConfig
from learning_embeddings_tpu.train.embedding import EmbeddingTrainerConfig
from learning_embeddings_tpu.train.experiment import (
    Checkpointer,
    ExperimentDir,
    read_manifest,
    write_manifest,
)
from learning_embeddings_tpu.train.runner import (
    run_classifier,
    run_label_embedding,
)


@pytest.fixture()
def class_setup():
    lm = toy_labelmap(branching=2, n_levels=2)
    ds = synthetic_array_dataset(lm, 60, size=24, seed=0)
    datasets = {
        "train": ArrayDataset(ds.images[:40], ds.leaf_labels[:40], lm),
        "val": ArrayDataset(ds.images[40:50], ds.leaf_labels[40:50], lm),
        "test": ArrayDataset(ds.images[50:], ds.leaf_labels[50:], lm),
    }
    cfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                           lr=1e-3, image_size=24, batch_size=10, seed=0)
    return lm, datasets, cfg


def test_classifier_runner_artifacts_and_resume(class_setup, tmp_path):
    lm, datasets, cfg = class_setup
    kw = dict(experiment_dir=str(tmp_path), experiment_name="run",
              n_epochs=2, eval_interval=1, n_workers=2,
              manifest_args={"loss": "multi_level", "model": "resnet18"},
              augment="rrc", use_weighted_resampler=False)
    res = run_classifier(lm, datasets, "", cfg, **kw)
    exp = res["experiment"]
    assert os.path.exists(exp.manifest_path)
    assert read_manifest(exp.manifest_path)["loss"] == "multi_level"
    assert os.path.exists(os.path.join(exp.stats, "predicted_scores.npy"))
    assert os.path.exists(os.path.join(exp.stats, "correct_labels.npy"))
    ck = Checkpointer(exp)
    assert ck.find_existing_weights() == 1
    assert "best_model" in os.listdir(exp.weights)
    # resume continues from epoch 2
    res2 = run_classifier(lm, datasets, "", cfg, **{**kw, "n_epochs": 3,
                                                    "resume": True})
    assert Checkpointer(res2["experiment"]).find_existing_weights() == 2
    # --resume competes against the ORIGINAL best (carried in the
    # checkpoint payload), never a reset -1: a resume past completion
    # runs no epochs yet reports and reloads the original best
    res2b = run_classifier(lm, datasets, "", cfg, **{**kw, "n_epochs": 3,
                                                     "resume": True})
    assert res2b["best_epoch"] == res2["best_epoch"]
    assert res2b["best_val_score"] == pytest.approx(res2["best_val_score"])
    # metrics jsonl exists with train/loss entries
    lines = [json.loads(l) for l in open(
        os.path.join(exp.logs, "metrics.jsonl"))]
    assert any(r["tag"] == "train/loss" for r in lines)
    # --set_mode test: loads best_model and re-runs the final test pass
    before = os.path.getmtime(os.path.join(exp.stats, "predicted_scores.npy"))
    res3 = run_classifier(lm, datasets, "", cfg,
                          **{**kw, "set_mode": "test"})
    after = os.path.getmtime(os.path.join(
        res3["experiment"].stats, "predicted_scores.npy"))
    assert after > before


def test_async_checkpoint_roundtrip(tmp_path):
    """save(wait=False) + wait_until_finished() must round-trip exactly
    (the classifier runner overlaps epoch saves with the next epoch)."""
    exp = ExperimentDir(str(tmp_path), "async_ckpt")
    ckpt = Checkpointer(exp)
    payload = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
               "step": np.full((), 7, np.int32)}
    ckpt.save(3, payload, wait=False)
    ckpt.save("best_model", payload, wait=False)
    ckpt.wait_until_finished()
    like = {"params": {"w": np.zeros((3, 4), np.float32)},
            "step": np.zeros((), np.int32)}
    out = ckpt.load(3, like)
    assert np.array_equal(out["params"]["w"], payload["params"]["w"])
    assert int(out["step"]) == 7
    assert ckpt.find_existing_weights() == 3


def test_checkpointer_load_tolerates_key_drift(tmp_path):
    """Payloads gain bookkeeping keys over time (best_score/best_f1/
    best_epoch) while eval/inference callers template only the subtrees
    they use — load() must serve both a narrower and a wider template."""
    exp = ExperimentDir(str(tmp_path), "drift")
    ckpt = Checkpointer(exp)
    ckpt.save(1, {"params": {"w": np.ones((2, 2), np.float32)},
                  "extra": 5.0})
    out = ckpt.load(1, {"params": {"w": np.zeros((2, 2), np.float32)}})
    assert "extra" not in out
    assert np.array_equal(out["params"]["w"], np.ones((2, 2)))
    out2 = ckpt.load(1, {"params": {"w": np.zeros((2, 2), np.float32)},
                         "missing": -1.0})
    assert float(out2["missing"]) == -1.0
    assert np.array_equal(out2["params"]["w"], np.ones((2, 2)))
    # the drift fallback must re-type optax NamedTuple states (a raw
    # restore yields plain dicts; an untyped opt_state crashes the next
    # update): pre-drift checkpoint -> wider template -> usable state
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((2, 2), jnp.float32)}
    opt_state = tx.init(params)
    ckpt.save(2, {"params": params, "opt_state": opt_state})
    like = {"params": params, "opt_state": opt_state,
            "best_score": -1.0}
    out3 = ckpt.load(2, like)
    assert float(out3["best_score"]) == -1.0
    assert (jax.tree_util.tree_structure(out3["opt_state"])
            == jax.tree_util.tree_structure(opt_state))
    # and it actually drives an update
    grads = {"w": jnp.ones((2, 2), jnp.float32)}
    tx.update(grads, out3["opt_state"], params)


def test_embedding_runner_resume_and_threshold_payload(tmp_path):
    lm = toy_labelmap(branching=3, n_levels=3)
    A = label_graph_from_paths(lm.leaf_paths(), lm)
    splits = split_edges(A, proportion_of_nb_edges_in_train=0.5,
                         val_frac=0.15, test_frac=0.15, seed=0)
    cfg = EmbeddingTrainerConfig(energy="order", embedding_dim=4, lr=0.01,
                                 batch_size=10, neg_to_pos_ratio=3,
                                 alpha=1.0, optimizer="adam", seed=0)
    kw = dict(experiment_dir=str(tmp_path), experiment_name="emb",
              n_epochs=3, eval_interval=1, check_reconstr_every=2)
    res = run_label_embedding(lm, splits, cfg, **kw)
    assert res["best_val_f1"] > 0
    assert "test_f1" in res
    res2 = run_label_embedding(lm, splits, cfg,
                               **{**kw, "n_epochs": 5, "resume": True})
    exp = res2["experiment"]
    ck = Checkpointer(exp)
    assert ck.find_existing_weights() == 4
    # optimal_threshold + best-tracking persisted in the checkpoint payload
    like = {"params": res2["trainer"].params,
            "opt_state": res2["trainer"].opt_state,
            "optimal_threshold": 0.0,
            "best_f1": -1.0, "best_epoch": -1.0}
    payload = ck.load(4, like)
    assert payload["optimal_threshold"] > 0.0
    assert payload["best_f1"] == pytest.approx(res2["best_val_f1"])
    # resume past completion: the loop never runs, yet the original best
    # must be restored from the checkpoint (not reset to -1) and reported
    res3 = run_label_embedding(lm, splits, cfg,
                               **{**kw, "n_epochs": 5, "resume": True})
    assert res3["best_val_f1"] == pytest.approx(res2["best_val_f1"])
    assert res3["best_epoch"] == res2["best_epoch"]


def test_joint_resume_preserves_best_tracking(tmp_path):
    """--resume must keep competing against the ORIGINAL best val score
    (best_f1/best_epoch ride in the checkpoint payload) — a reset to -1
    would overwrite best_model with the first post-resume eval; and a
    resume past completion must still reload and score the best model."""
    import numpy as np

    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.losses.joint_sampling import (
        build_joint_graph)
    from learning_embeddings_tpu.train.joint import JointTrainerConfig
    from learning_embeddings_tpu.train.runner import run_joint_embedding

    lm = toy_labelmap(branching=2, n_levels=3)
    rng = np.random.RandomState(0)
    leaves = np.repeat(np.arange(lm.levels[-1]), 4)
    ll = lm.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(lm, ll)
    centers = rng.randn(lm.levels[-1], 16) * 3
    feats = (centers[leaves] + 0.3 * rng.randn(len(leaves), 16)).astype(
        np.float32)
    paths = ll + np.asarray(lm.level_start)[None, :]
    cfg = JointTrainerConfig(energy="hyp_cone", embedding_dim=4,
                             feature_dim=16, batch_size=10,
                             neg_to_pos_ratio=3, alpha=0.05, seed=0)
    kw = dict(experiment_dir=str(tmp_path), experiment_name="jres",
              n_epochs=4, eval_interval=1,
              eval_features={"val": feats, "test": feats},
              eval_paths={"val": paths, "test": paths})
    res1 = run_joint_embedding(lm, graph, train_edges, feats, cfg, **kw)
    assert res1["best_epoch"] >= 0
    # resume past completion: loop body never runs, yet the original best
    # must be reloaded and reported
    res2 = run_joint_embedding(lm, graph, train_edges, feats, cfg,
                               **{**kw, "resume": True})
    assert res2["best_val_micro_f1"] == pytest.approx(
        res1["best_val_micro_f1"])
    assert res2["best_epoch"] == res1["best_epoch"]
    # resume with more epochs: best never decreases
    res3 = run_joint_embedding(lm, graph, train_edges, feats, cfg,
                               **{**kw, "n_epochs": 6, "resume": True})
    assert res3["best_val_micro_f1"] >= res1["best_val_micro_f1"]


def test_bottleneck2d_runner_plots(class_setup, tmp_path):
    lm, datasets, cfg = class_setup
    import dataclasses

    cfg = dataclasses.replace(cfg, head_override="bottleneck2d")
    res = run_classifier(lm, datasets, "", cfg,
                         experiment_dir=str(tmp_path),
                         experiment_name="b2d", n_epochs=1, n_workers=2,
                         augment="rrc", use_weighted_resampler=False)
    stats = res["experiment"].stats
    assert any(f.startswith("label_reps_") for f in os.listdir(stats))


def test_validate_embedding_cli_roundtrip(tmp_path):
    """embed_toy -> validate_embedding: manifest rebuild + checkpoint
    re-score must reproduce the experiment."""
    from learning_embeddings_tpu.cli.embed_toy import main as toy_main
    from learning_embeddings_tpu.cli.validate_embedding import main as val_main

    toy_main(("--pick_per_level --tree_levels 3 --tree_branching 2 "
              "--n_epochs 30 --lr 0.03 --loss hyp_cones_loss "
              "--embedding_dim 2 --neg_to_pos_ratio 3 --alpha 0.01 "
              "--experiment_name v --batch_size 10 "
              f"--experiment_dir {tmp_path}").split())
    res = val_main(["--experiment_path", str(tmp_path / "v")])
    assert 0.0 <= res["reconstruction_f1"] <= 1.0


def test_eval_pass_pads_ragged_tail_on_mesh(class_setup, tmp_path):
    """On a mesh, the ragged eval tail is padded to a full batch for even
    sharding and the padding rows are dropped from results."""
    import jax

    from learning_embeddings_tpu.data import ImagePipeline
    from learning_embeddings_tpu.parallel.mesh import make_mesh
    from learning_embeddings_tpu.train.classifier import ClassifierTrainer
    from learning_embeddings_tpu.train.runner import _eval_pass

    lm, datasets, cfg = class_setup
    import dataclasses
    cfg = dataclasses.replace(cfg, batch_size=8)
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = ClassifierTrainer(lm, cfg, mesh=mesh)
    import numpy as np
    ds = datasets["val"]   # ArrayDataset: in-memory pixels, no files
    pipe = ImagePipeline(ds, lm, "", image_size=cfg.image_size,
                         batch_size=8, train=False, num_workers=2)
    n = min(len(ds), 11)   # 8 + ragged 3
    scores, ll, mh, loss, loss_rows = _eval_pass(trainer, pipe, np.arange(n))
    assert scores.shape[0] == n and ll.shape[0] == n and mh.shape[0] == n
    assert np.isfinite(loss)
    # the padded tail batch is excluded from the loss average (its batch
    # mean includes duplicated padding rows); only the full batch counts
    assert loss_rows == 8


def test_profile_flag_writes_trace(class_setup, tmp_path):
    lm, datasets, cfg = class_setup
    r = run_classifier(
        lm, datasets, "", cfg, experiment_dir=str(tmp_path),
        experiment_name="prof", n_epochs=1, eval_interval=5, n_workers=2,
        profile_steps=2, manifest_args={}, use_weighted_resampler=False)
    tdir = os.path.join(str(tmp_path), "prof", "stats", "trace")
    assert os.path.isdir(tdir)
    import glob
    assert glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                     recursive=True)
