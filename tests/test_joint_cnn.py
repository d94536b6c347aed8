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
