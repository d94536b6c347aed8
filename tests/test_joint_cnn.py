"""End-to-end CNN joint trainer (--use_CNN path) tests."""

import numpy as np
import pytest

from learning_embeddings_tpu.hierarchy import toy_labelmap
from learning_embeddings_tpu.losses.joint_sampling import (
    build_joint_graph,
    sample_joint_negatives_np,
)
from learning_embeddings_tpu.train.joint_cnn import (
    JointCNNConfig,
    JointCNNTrainer,
)

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def setup():
    lm = toy_labelmap(branching=2, n_levels=2)    # 2 + 4 labels
    leaves = np.repeat(np.arange(4), 4)           # 16 images
    ll = lm.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(lm, ll)
    # class-colored pixel bank
    colors = RNG.rand(4, 1, 1, 3).astype(np.float32)
    pixels = np.clip(colors[leaves] + 0.1 * RNG.rand(16, 24, 24, 3), 0, 1)

    def loader(rows):
        return pixels[rows % len(pixels)].astype(np.float32)

    return lm, graph, train_edges, loader, leaves


def test_numpy_sampler_matches_device_semantics(setup):
    lm, graph, train_edges, loader, leaves = setup
    rng = np.random.RandomState(0)
    nf, nt = sample_joint_negatives_np(graph, 3, rng,
                                       train_edges[:, 0], train_edges[:, 1])
    assert not graph.positive_mask(nf, nt).any()
    assert not (nf == nt).any()


def test_cnn_joint_training_step_and_learning(setup):
    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, lr_labels=0.02,
                         lr_images=0.005, batch_size=8, neg_to_pos_ratio=3,
                         alpha=0.01, seed=0)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    rng = np.random.RandomState(0)
    losses = []
    for ep in range(6):
        stats = tr.train_epoch(ep, rng)
        losses.append(stats["loss"])
    assert losses[-1] < losses[0]
    # embeddings stay on the ball
    lab = np.asarray(tr.label_embeddings())
    assert (np.linalg.norm(lab, axis=1) < 1.0).all()
    img = np.asarray(tr.image_embeddings_from_pixels(loader(np.arange(8))))
    assert (np.linalg.norm(img, axis=1) < 1.0).all()


def test_joint_cnn_freeze_bn_step():
    """--freeze_bn on the joint CNN tower: stats stay fixed, loss finite."""
    import jax

    lm = toy_labelmap(branching=2, n_levels=3)
    rng = np.random.RandomState(0)
    leaves = rng.randint(0, lm.levels[-1], 12)
    ll = lm.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(lm, ll)
    bank = rng.rand(16, 32, 32, 3).astype(np.float32)

    def loader(rows):
        return bank[np.asarray(rows) % len(bank)]

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=32, batch_size=6,
                         neg_to_pos_ratio=2, seed=0, freeze_bn=True)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    stats0 = jax.tree_util.tree_map(np.array, tr.batch_stats)
    loss, _, _ = tr.train_batch(train_edges[:6, 0], train_edges[:6, 1])
    assert np.isfinite(loss)
    for a, b in zip(jax.tree_util.tree_leaves(stats0),
                    jax.tree_util.tree_leaves(tr.batch_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_use_cnn_cli_evaluates_and_checkpoints(tmp_path):
    """--use_CNN end-to-end: curriculum applied, val metrics tracked, best
    checkpoint saved, final test metrics + reconstruction returned."""
    import json as _json
    import os

    import cv2

    from learning_embeddings_tpu.cli.oe_h import main

    rng = np.random.RandomState(0)
    data_dir = tmp_path / "splits"
    img_dir = tmp_path / "imgs"
    os.makedirs(data_dir)
    os.makedirs(img_dir / "d")
    recs = {}
    for t in range(24):
        name = f"im_{t}.jpg"
        cv2.imwrite(str(img_dir / "d" / name),
                    rng.randint(0, 255, (40, 40, 3), np.uint8))
        leaf = t % 3
        recs[f"tok{t}"] = {
            "token": f"tok{t}", "image_path": "d", "image_name": name,
            "family": f"F{leaf % 2}", "subfamily": f"S{leaf % 2}",
            "genus": f"G{leaf % 2}", "specific_epithet": f"e{leaf}"}
    with open(data_dir / "val.json", "w") as f:
        _json.dump(recs, f)

    r = main((f"--set_mode train --use_CNN --hide_levels --loss hyp_cones_loss "
              f"--data_dir {data_dir} --image_dir {img_dir} "
              f"--model resnet18 --image_size 32 --embedding_dim 4 "
              f"--n_epochs 2 --batch_size 6 --neg_to_pos_ratio 2 "
              f"--eval_interval 1 --experiment_name jcnn "
              f"--experiment_dir {tmp_path / 'exp'}").split())
    assert "reconstruction_f1" in r and np.isfinite(r["reconstruction_f1"])
    assert r["best_epoch"] >= 0
    assert "micro_f1" in r["test_metrics"]
    weights = os.listdir(r["experiment"].weights)
    assert "best_model" in weights
