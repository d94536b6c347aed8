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


def test_mesh_loss_parity(setup):
    """The meshed --use_CNN step (tower batch + edge slots over 'data',
    params replicated) must reproduce the unmeshed step — GSPMD
    global-batch semantics. Asserted: identical step-0 loss/energies on
    identical inputs, post-step BN batch statistics (the cross-device
    stat reduction) and the updated label table. (Full param equality is
    NOT asserted: adam normalizes near-zero gradients to ±lr, so benign
    reduction-order noise in tiny BN-scale grads flips update signs.)"""
    import jax

    from learning_embeddings_tpu.parallel.mesh import make_mesh

    lm, graph, train_edges, loader, leaves = setup
    img_edges = train_edges[train_edges[:, 1] >= graph.n_labels]
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, lr_labels=0.02,
                         lr_images=0.005, batch_size=8, neg_to_pos_ratio=3,
                         alpha=0.01, seed=0, tower_dtype="float32")
    mesh = make_mesh(n_data=8, n_model=1)
    tr_m = JointCNNTrainer(lm, graph, train_edges, loader, cfg, mesh=mesh)
    tr_s = JointCNNTrainer(lm, graph, train_edges, loader, cfg, mesh=None)
    # same seed => identical host negative draws => identical step inputs
    e = img_edges[:8]
    loss_m, ep_m, en_m = tr_m.train_batch(e[:, 0], e[:, 1])
    loss_s, ep_s, en_s = tr_s.train_batch(e[:, 0], e[:, 1])
    np.testing.assert_allclose(loss_m, loss_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep_m), np.asarray(ep_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(en_m), np.asarray(en_s),
                               rtol=1e-4, atol=1e-5)
    # the cross-device BN statistics reduce to the single-device values
    for a, b in zip(jax.tree_util.tree_leaves(tr_m.batch_stats),
                    jax.tree_util.tree_leaves(tr_s.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # the all-reduced label-table update matches single-device
    for a, b in zip(jax.tree_util.tree_leaves(tr_m.params["labels"]),
                    jax.tree_util.tree_leaves(tr_s.params["labels"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mesh_rejects_indivisible_batch(setup):
    from learning_embeddings_tpu.parallel.mesh import make_mesh

    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=7,
                         neg_to_pos_ratio=2, seed=0)
    with pytest.raises(ValueError, match="divide evenly"):
        JointCNNTrainer(lm, graph, train_edges, loader, cfg,
                        mesh=make_mesh(n_data=8, n_model=1))


def test_freeze_images_trains_only_projection(setup):
    """--freeze_weights (feature extracting): the tower trunk stays frozen
    after a step; the final projection and the label table still move."""
    import jax

    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, lr_labels=0.02,
                         lr_images=0.01, batch_size=8, neg_to_pos_ratio=3,
                         alpha=0.01, seed=0, freeze_images=True)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    before = jax.tree_util.tree_map(np.array, tr.params)
    tr.train_batch(train_edges[:8, 0], train_edges[:8, 1])
    for a, b in zip(jax.tree_util.tree_leaves(before["images"]["trunk"]),
                    jax.tree_util.tree_leaves(tr.params["images"]["trunk"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    fc_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before["images"]["fc"]),
                        jax.tree_util.tree_leaves(tr.params["images"]["fc"])))
    lab_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before["labels"]),
                        jax.tree_util.tree_leaves(tr.params["labels"])))
    assert fc_moved and lab_moved


def test_half_half_reaches_cnn_epoch(setup, monkeypatch):
    """--half_half must change the CNN path's epoch composition (it was
    parsed-but-dead in r2): the shared resampler is called with
    half_half=True and its output feeds the epoch."""
    from learning_embeddings_tpu.train import joint_cnn as jc

    lm, graph, train_edges, loader, leaves = setup
    seen = {}
    real = jc.epoch_edge_order

    def spy(graph_, edges, rng, half_half):
        seen["half_half"] = half_half
        return real(graph_, edges, rng, half_half)

    monkeypatch.setattr(jc, "epoch_edge_order", spy)
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0, half_half=True)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    tr.train_epoch(0, np.random.RandomState(0))
    assert seen["half_half"] is True


def test_prefetch_preserves_epoch_semantics(setup):
    """prefetch=True (host prep overlapped with the device step) must be
    an execution-order change only: identical losses to the serial path
    (production stays serialized, so the sampler RNG sequence matches)."""
    from learning_embeddings_tpu.data.pipeline import prefetch_one

    assert list(prefetch_one(iter(range(50)))) == list(range(50))

    lm, graph, train_edges, loader, leaves = setup
    out = {}
    for prefetch in (False, True):
        cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                             embedding_dim=4, image_size=24, lr_labels=0.02,
                             lr_images=0.005, batch_size=8,
                             neg_to_pos_ratio=3, alpha=0.01, seed=0,
                             prefetch=prefetch)
        tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
        out[prefetch] = tr.train_epoch(0, np.random.RandomState(0))
    np.testing.assert_allclose(out[True]["loss"], out[False]["loss"],
                               rtol=1e-6)


def test_load_embedding_table_warm_start(setup):
    """--load_emb_from: a table already inside the Poincare annulus loads
    VERBATIM into the raw label params (reference load_emb_model restores
    the state dict as-is, oe_h.py:1904-1916)."""
    import jax

    from learning_embeddings_tpu.geometry import inner_radius

    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    rng = np.random.RandomState(3)
    r0 = inner_radius(tr.K)
    raw = rng.randn(graph.n_labels, 4)
    raw = raw / np.linalg.norm(raw, axis=1, keepdims=True) * (r0 + 0.02)
    tr.load_embedding_table(raw.astype(np.float32))
    table = [p for p in jax.tree_util.tree_leaves(tr.params["labels"])
             if p.shape == raw.shape][0]
    np.testing.assert_allclose(np.asarray(table), raw, rtol=1e-6)
    # a table OUTSIDE the ball is rescaled into the annulus
    tr.load_embedding_table((raw * 50).astype(np.float32))
    table = [p for p in jax.tree_util.tree_leaves(tr.params["labels"])
             if p.shape == raw.shape][0]
    norms = np.linalg.norm(np.asarray(table), axis=1)
    assert (norms >= r0 - 1e-6).all() and (norms < 1.0).all()


def test_load_tower_trunk_two_stage(setup):
    """The reference's two-stage FeatCNN workflow (oe.py:232-289): the
    joint image tower's trunk warm-starts from a FINETUNED classifier's
    trunk (same backbone), the projection head stays freshly initialized,
    and mismatched trunks are rejected."""
    import jax

    from learning_embeddings_tpu.train.classifier import (ClassifierConfig,
                                                          ClassifierTrainer)

    lm, graph, train_edges, loader, leaves = setup
    ccfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                            lr=1e-3, optimizer="adam", image_size=24,
                            batch_size=4, seed=1)
    cls = ClassifierTrainer(lm, ccfg, mesh=None)
    trunk_p = jax.tree_util.tree_map(np.asarray, cls.state.params["trunk"])
    trunk_s = jax.tree_util.tree_map(np.asarray,
                                     cls.state.batch_stats["trunk"])

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0)
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    fc_before = jax.tree_util.tree_map(np.asarray, tr.params["images"]["fc"])
    tr.load_tower_trunk(trunk_p, trunk_s)
    for a, b in zip(jax.tree_util.tree_leaves(trunk_p),
                    jax.tree_util.tree_leaves(tr.params["images"]["trunk"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(trunk_s),
                    jax.tree_util.tree_leaves(tr.batch_stats["trunk"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the projection head is NOT touched (classifier heads have classifier
    # shapes; the reference re-initializes FeatCNN's projection too)
    for a, b in zip(jax.tree_util.tree_leaves(fc_before),
                    jax.tree_util.tree_leaves(tr.params["images"]["fc"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the warmed tower still trains
    loss, _, _ = tr.train_batch(train_edges[:8, 0], train_edges[:8, 1])
    assert np.isfinite(loss)
    # a structurally different trunk (e.g. another backbone) is rejected
    with pytest.raises(ValueError, match="trunk param mismatch"):
        tr.load_tower_trunk({"bogus": 1}, trunk_s)


def test_eval_max_images_caps_and_logs(setup, tmp_path, capsys):
    """--eval_max_images: the eval-split cap is applied AND logged (the
    repo's no-silent-caps rule; the r2 CNN path silently capped at 512)."""
    from learning_embeddings_tpu.train.runner import run_joint_cnn

    lm, graph, train_edges, loader, leaves = setup
    paths = graph.image_paths_global
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0)
    res = run_joint_cnn(
        lm, graph, train_edges, loader, cfg,
        experiment_dir=str(tmp_path), experiment_name="cap",
        n_epochs=1, eval_interval=1,
        eval_sets={"val": (paths, loader), "test": (paths, loader)},
        eval_max_images=8)
    out = capsys.readouterr().out
    assert "capping val eval at 8 of" in out
    assert "capping test eval at 8 of" in out
    assert "random subsample" in out   # prefix would score one taxon branch
    assert "micro_f1" in res["test_metrics"]


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
    # the CNN path now meets the full joint experiment contract: edge-F1
    # calibrated on val, scored on test at the val threshold
    assert "edge_f1" in r["test_metrics"]
    assert r["trainer"].optimal_threshold is not None
    weights = os.listdir(r["experiment"].weights)
    assert "best_model" in weights
    # checkpoints persist the calibrated threshold (oe_h.py:1876-1909)
    from learning_embeddings_tpu.train.experiment import Checkpointer

    ckpt = Checkpointer(r["experiment"])
    payload = ckpt.load_raw("best_model")
    assert "optimal_threshold" in payload
    # template-less restores must come back as HOST numpy, never replaying
    # the saved shardings — a CPU-trained warm-start table read inside a
    # TPU process crashed orbax otherwise ("Device TFRT_CPU_0 not found")
    import jax as _jax

    assert all(isinstance(leaf, np.ndarray)
               for leaf in _jax.tree_util.tree_leaves(payload))

    # --resume restores the latest numbered checkpoint and continues
    r2 = main((f"--set_mode train --use_CNN --hide_levels "
               f"--loss hyp_cones_loss --resume "
               f"--data_dir {data_dir} --image_dir {img_dir} "
               f"--model resnet18 --image_size 32 --embedding_dim 4 "
               f"--n_epochs 4 --batch_size 6 --neg_to_pos_ratio 2 "
               f"--eval_interval 1 --experiment_name jcnn "
               f"--experiment_dir {tmp_path / 'exp'}").split())
    epochs = sorted(int(d) for d in os.listdir(r2["experiment"].weights)
                    if d.isdigit())
    assert epochs == [0, 1, 2, 3]   # 0-1 from run 1, 2-3 resumed


def test_use_cnn_cli_load_emb_from(tmp_path):
    """--load_emb_from on the --use_CNN CLI: the label table AND its
    calibrated threshold load from a label-embedding checkpoint; with
    --lr 0 the table stays exactly the warm start through training."""
    import json as _json
    import os

    import cv2
    import jax

    from learning_embeddings_tpu.cli.oe_h import main
    from learning_embeddings_tpu.geometry import inner_radius
    from learning_embeddings_tpu.train.experiment import (Checkpointer,
                                                          ExperimentDir)

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

    # label-only-style checkpoint: {params: embedder vars, opt_state,
    # optimal_threshold}
    n_labels = 2 + 2 + 2 + 3
    r0 = inner_radius(0.1)
    table = rng.randn(n_labels, 4).astype(np.float32)
    table = table / np.linalg.norm(table, axis=1, keepdims=True) * (r0 + 0.03)
    lab_exp = ExperimentDir(str(tmp_path / "labexp"), "lab")
    Checkpointer(lab_exp).save("best_model", {
        "params": {"params": {"embedding": table}},
        "opt_state": {}, "optimal_threshold": 0.125})

    r = main((f"--set_mode train --use_CNN --loss hyp_cones_loss "
              f"--load_emb_from {lab_exp.weights}/best_model "
              f"--data_dir {data_dir} --image_dir {img_dir} "
              f"--model resnet18 --image_size 32 --embedding_dim 4 "
              f"--lr 0 --n_epochs 1 --batch_size 6 --neg_to_pos_ratio 2 "
              f"--eval_interval 1 --experiment_name warm "
              f"--experiment_dir {tmp_path / 'exp2'}").split())
    got = [p for p in jax.tree_util.tree_leaves(
        r["trainer"].params["labels"]) if p.shape == table.shape][0]
    np.testing.assert_allclose(np.asarray(got), table, rtol=1e-6)


def test_explicit_levels_to_hide_survives_train_epoch(setup):
    """JointCNNConfig(levels_to_hide=...) without hide_levels/curriculum
    is a single-stage curriculum — train_epoch's per-epoch stage switch
    must not silently reset it to () (r3 advisor finding)."""
    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0, levels_to_hide=(0,))
    tr = JointCNNTrainer(lm, graph, train_edges, loader, cfg)
    assert tr.levels_for_epoch(0) == (0,)
    tr.train_epoch(0, np.random.RandomState(0))
    assert tuple(tr.cfg.levels_to_hide) == (0,)


def test_meshed_eval_embeddings_match_single(setup):
    """Meshed eval (tower batch sharded over 'data') must reproduce the
    single-device eval embeddings — including a ragged row count that
    forces the chunk-size round-up + tail padding."""
    from learning_embeddings_tpu.parallel.mesh import make_mesh

    lm, graph, train_edges, loader, leaves = setup
    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet18",
                         embedding_dim=4, image_size=24, batch_size=8,
                         neg_to_pos_ratio=2, seed=0, tower_dtype="float32")
    tr_m = JointCNNTrainer(lm, graph, train_edges, loader, cfg,
                           mesh=make_mesh(n_data=8, n_model=1))
    tr_s = JointCNNTrainer(lm, graph, train_edges, loader, cfg, mesh=None)
    rows = np.arange(13)   # ragged vs batch_size AND vs the 8 data shards
    em = tr_m.image_embeddings_for_rows(rows, batch_size=6)
    es = tr_s.image_embeddings_for_rows(rows, batch_size=6)
    assert em.shape == es.shape == (13, 4)
    np.testing.assert_allclose(em, es, rtol=1e-5, atol=1e-6)


def test_use_cnn_cli_load_tower_from(tmp_path):
    """--load_tower_from on the --use_CNN CLI (the reference's two-stage
    FeatCNN workflow as a flag — upstream hard-codes the classifier
    experiment path, oe.py:245-255): the image tower's trunk loads from a
    classifier checkpoint on disk; with --lr_images 0 it stays exactly the
    warm start through training. Without --use_CNN the flag is rejected."""
    import json as _json
    import os

    import cv2
    import jax
    import pytest as _pytest

    from learning_embeddings_tpu.cli.oe_h import main
    from learning_embeddings_tpu.train.classifier import (ClassifierConfig,
                                                          ClassifierTrainer)
    from learning_embeddings_tpu.train.experiment import (Checkpointer,
                                                          ExperimentDir)

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

    # a (fresh-init) classifier checkpoint — only the trunk transfers, so
    # the classifier's own labelmap/head shapes are irrelevant
    from learning_embeddings_tpu.hierarchy import toy_labelmap

    ccfg = ClassifierConfig(backbone="resnet18", criterion="multi_level_ce",
                            lr=1e-3, optimizer="adam", image_size=32,
                            batch_size=4, seed=3)
    cls = ClassifierTrainer(toy_labelmap(2, 2), ccfg, mesh=None)
    cls_exp = ExperimentDir(str(tmp_path / "clsexp"), "cls")
    Checkpointer(cls_exp).save("best_model", cls.checkpoint_payload())
    trunk_p = jax.tree_util.tree_map(np.asarray, cls.state.params["trunk"])

    r = main((f"--set_mode train --use_CNN --loss hyp_cones_loss "
              f"--load_tower_from {cls_exp.weights}/best_model "
              f"--data_dir {data_dir} --image_dir {img_dir} "
              f"--model resnet18 --image_size 32 --embedding_dim 4 "
              f"--lr 0.01 --lr_images 0 --n_epochs 1 --batch_size 6 "
              f"--neg_to_pos_ratio 2 --eval_interval 1 "
              f"--experiment_name tower "
              f"--experiment_dir {tmp_path / 'exp3'}").split())
    got = r["trainer"].params["images"]["trunk"]
    for a, b in zip(jax.tree_util.tree_leaves(trunk_p),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # a checkpoint with params['trunk'] but no batch_stats['trunk'] is
    # rejected up front with a clear error (not deep inside flax apply)
    import argparse as _ap

    from learning_embeddings_tpu.cli._joint_main import load_tower_warm_start

    bad_exp = ExperimentDir(str(tmp_path / "clsexp_bad"), "cls")
    Checkpointer(bad_exp).save("best_model", {"params": cls.state.params})
    with _pytest.raises(ValueError, match="batch_stats"):
        load_tower_warm_start(_ap.Namespace(
            load_tower_from=f"{bad_exp.weights}/best_model"))

    # fc7 path rejects the flag
    with _pytest.raises(SystemExit, match="requires --use_CNN"):
        main((f"--set_mode train --loss hyp_cones_loss "
              f"--load_tower_from {cls_exp.weights}/best_model "
              f"--data_dir {data_dir} --image_dir {img_dir} "
              f"--n_epochs 1 --experiment_name tower2 "
              f"--experiment_dir {tmp_path / 'exp4'}").split())
