"""End-to-end toy-hierarchy embedding training (SURVEY.md §4.3: the
reference's de-facto integration test — embed_toy converging to perfect
reconstruction)."""

import numpy as np
import os
import pytest

from learning_embeddings_tpu.hierarchy import (
    label_graph_from_paths,
    split_edges,
    toy_labelmap,
)
from learning_embeddings_tpu.train.embedding import (
    EmbeddingTrainer,
    EmbeddingTrainerConfig,
)


def toy_splits(branching=2, n_levels=3):
    lm = toy_labelmap(branching=branching, n_levels=n_levels)
    A = label_graph_from_paths(lm.leaf_paths(), lm)
    return lm, split_edges(A, proportion_of_nb_edges_in_train=1.0,
                           val_frac=0.0, test_frac=0.0)


def run(lm, splits, cfg, epochs):
    tr = EmbeddingTrainer(lm, splits, cfg)
    rng = np.random.RandomState(0)
    for _ in range(epochs):
        stats = tr.train_epoch(rng)
    return tr, stats


def test_label_embedding_mesh_parity():
    """The meshed label-embedding epoch (edge batches over 'data', table
    replicated) reproduces the single-device epoch bit-for-bit in logical
    semantics (reference DataParallel wrap, order_embeddings.py:360)."""
    from learning_embeddings_tpu.parallel.mesh import make_mesh

    lm, splits = toy_splits(branching=2, n_levels=3)
    cfg = EmbeddingTrainerConfig(energy="hyp_cone", embedding_dim=4,
                                 lr=1e-2, optimizer="adam", batch_size=8,
                                 neg_to_pos_ratio=3, seed=0)
    mesh = make_mesh(n_data=8, n_model=1)
    tr_m = EmbeddingTrainer(lm, splits, cfg, mesh=mesh)
    tr_s = EmbeddingTrainer(lm, splits, cfg, mesh=None)
    sm = tr_m.train_epoch(np.random.RandomState(0))
    ss = tr_s.train_epoch(np.random.RandomState(0))
    np.testing.assert_allclose(sm["loss"], ss["loss"], rtol=1e-5)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(tr_m.params),
                    jax.tree_util.tree_leaves(tr_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    with pytest.raises(ValueError, match="divide evenly"):
        EmbeddingTrainer(lm, splits,
                         EmbeddingTrainerConfig(batch_size=7), mesh=mesh)


def test_order_embedding_perfect_reconstruction():
    lm, splits = toy_splits()
    cfg = EmbeddingTrainerConfig(energy="order", embedding_dim=4, lr=0.01,
                                 batch_size=10, neg_to_pos_ratio=5,
                                 alpha=1.0, optimizer="adam", seed=0)
    tr, stats = run(lm, splits, cfg, 300)
    rec = tr.reconstruction()
    assert float(rec.f1) == 1.0
    assert stats["e_pos_mean"] < 0.05


def test_hyp_cone_embedding_perfect_reconstruction():
    lm, splits = toy_splits()
    cfg = EmbeddingTrainerConfig(energy="hyp_cone", embedding_dim=2, lr=0.03,
                                 batch_size=10, neg_to_pos_ratio=5,
                                 alpha=0.01, optimizer="adam",
                                 pick_per_level=True, seed=0)
    tr, stats = run(lm, splits, cfg, 400)
    rec = tr.reconstruction()
    assert float(rec.f1) == 1.0
    # hybrid adam path must keep embeddings inside the annulus
    emb = np.asarray(tr.all_embeddings())
    norms = np.linalg.norm(emb, axis=1)
    assert (norms <= 1.0 - 1e-6).all()


def test_euc_cone_embedding_learns():
    lm, splits = toy_splits()
    cfg = EmbeddingTrainerConfig(energy="euc_cone", embedding_dim=2, lr=0.1,
                                 batch_size=10, neg_to_pos_ratio=5,
                                 alpha=0.01, optimizer="adam",
                                 pick_per_level=True, seed=0)
    tr, stats = run(lm, splits, cfg, 300)
    rec = tr.reconstruction()
    assert float(rec.f1) > 0.85
    # euclidean-cone embeddings live outside radius K = 3
    emb = np.asarray(tr.all_embeddings())
    assert (np.linalg.norm(emb, axis=1) >= 3.0 - 1e-4).all()


def test_degree_neg_weights_reference_semantics():
    """--weigh_neg_term: weight = n_nodes/ratio × 1/deg_tc(corrupted node)
    — in-degree for corrupted 'to' slots (first R per edge), out-degree for
    corrupted 'from' slots (last R); degree 0 → no factor
    (order_embeddings.py:881-916)."""
    from learning_embeddings_tpu.losses.margin import degree_neg_weights

    R, n_nodes = 2, 10
    in_deg = np.array([0, 1, 2, 4] + [1] * 6)
    out_deg = np.array([5, 0, 1, 2] + [1] * 6)
    # one positive edge -> 2R = 4 slots: [to-corrupt, to-corrupt,
    #                                     from-corrupt, from-corrupt]
    neg_from = np.array([7, 7, 0, 1])   # from-corrupt slots use out_deg
    neg_to = np.array([2, 0, 8, 8])     # to-corrupt slots use in_deg
    w = np.asarray(degree_neg_weights(neg_from, neg_to, in_deg, out_deg,
                                      R, n_nodes))
    base = n_nodes / R
    np.testing.assert_allclose(
        w, [base / 2,      # in_deg[2] = 2
            base,          # in_deg[0] = 0 -> no factor
            base / 5,      # out_deg[0] = 5
            base])         # out_deg[1] = 0 -> no factor


def test_weighting_flags_train(recwarn):
    """level_weights / weigh_pos_term / weigh_neg_term variants all train
    and converge on the toy graph."""
    lm, splits = toy_splits()
    for kw in ({"level_weights": (1.0, 2.0, 3.0)},
               {"level_weights": (1.0, 2.0, 3.0), "weigh_pos_term": True},
               {"weigh_neg_term": True}):
        cfg = EmbeddingTrainerConfig(energy="order", embedding_dim=4,
                                     lr=0.01, batch_size=10,
                                     neg_to_pos_ratio=3, alpha=1.0,
                                     optimizer="adam", seed=0, **kw)
        tr, stats = run(lm, splits, cfg, 150)
        assert np.isfinite(stats["loss"])
        rec = tr.reconstruction()
        assert float(rec.f1) > 0.85, (kw, float(rec.f1))


def test_val_threshold_calibration_and_test_reuse():
    lm = toy_labelmap(branching=3, n_levels=3)
    from learning_embeddings_tpu.hierarchy import label_graph_from_paths, split_edges
    A = label_graph_from_paths(lm.leaf_paths(), lm)
    splits = split_edges(A, proportion_of_nb_edges_in_train=0.5,
                         val_frac=0.15, test_frac=0.15, seed=0)
    assert len(splits.val) > 0 and len(splits.test) > 0
    cfg = EmbeddingTrainerConfig(energy="order", embedding_dim=4, lr=0.01,
                                 batch_size=10, neg_to_pos_ratio=3,
                                 alpha=1.0, optimizer="adam", seed=0)
    tr, _ = run(lm, splits, cfg, 400)
    val = tr.evaluate("val")
    assert tr.optimal_threshold is not None
    test = tr.evaluate("test")
    assert float(test.threshold) == pytest.approx(tr.optimal_threshold)
    # val sweeps its own best threshold; test (4 held-out edges — high
    # variance) just has to beat chance at the reused threshold
    assert float(val.f1) > 0.8 and float(test.f1) > 0.4


def test_negative_sampler_only_samples_negatives():
    import jax
    import jax.numpy as jnp
    from learning_embeddings_tpu.losses.margin import make_negative_sampler

    lm, splits = toy_splits(branching=3, n_levels=3)
    sampler = make_negative_sampler(
        splits.negatives, 4,
        level_start=lm.level_start, level_stop=lm.level_stop,
        pick_per_level=True)
    edges = splits.train
    nf, nt = sampler.sample(jax.random.PRNGKey(0),
                            jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]))
    nf, nt = np.asarray(nf), np.asarray(nt)
    assert splits.negatives[nf, nt].all(), "sampled a non-negative pair"
    # layout parity: first R slots of each group keep the 'from' node
    R = 4
    B = len(edges)
    nf2 = nf.reshape(B, 2 * R)
    np.testing.assert_array_equal(nf2[:, :R], np.repeat(edges[:, :1], R, 1))
    nt2 = nt.reshape(B, 2 * R)
    np.testing.assert_array_equal(nt2[:, R:], np.repeat(edges[:, 1:], R, 1))
    # per-level pick: corrupted 'to' of pass r lives at level r % L
    lvl = lm.level_of_global()
    for r in range(R):
        assert (lvl[nt2[:, r]] == r % lm.n_levels).all()


def test_negative_sampler_uniformity():
    """The device sampler must be uniform over each node's candidate set
    (chi-square-style check), matching the reference's
    random.choice(np.where(...)) distribution."""
    import jax
    import jax.numpy as jnp
    from learning_embeddings_tpu.losses.margin import make_negative_sampler

    lm, splits = toy_splits(branching=3, n_levels=2)   # 3 + 9 labels
    sampler = make_negative_sampler(splits.negatives, 1)
    # anchor on node 0 (a root: its negatives are the other roots + all
    # non-descendant leaves)
    pf = jnp.zeros((2000,), jnp.int32)
    pt = jnp.full((2000,), 3, jnp.int32)    # its first child (global 3)
    nf, nt = sampler.sample(jax.random.PRNGKey(0), pf, pt)
    nt = np.asarray(nt).reshape(2000, 2)[:, 0]   # corrupted-to slots
    cands = np.nonzero(splits.negatives[0])[0]
    counts = np.bincount(nt, minlength=lm.n_classes)[cands]
    assert counts.sum() == 2000
    expected = 2000 / len(cands)
    # every candidate drawn, none wildly off uniform (±50%)
    assert (counts > 0.5 * expected).all() and (counts < 1.5 * expected).all()


def test_embedding_runner_writes_2d_frames(tmp_path):
    from learning_embeddings_tpu.train.runner import run_label_embedding

    lm, splits = toy_splits()
    cfg = EmbeddingTrainerConfig(energy="hyp_cone", embedding_dim=2,
                                 lr=0.03, batch_size=10, neg_to_pos_ratio=3,
                                 alpha=0.01, optimizer="adam",
                                 pick_per_level=True, seed=0)
    res = run_label_embedding(lm, splits, cfg, experiment_dir=str(tmp_path),
                              experiment_name="viz", n_epochs=6,
                              check_reconstr_every=0)
    frames = os.listdir(os.path.join(res["experiment"].stats, "frames"))
    assert "epoch_0000.png" in frames and "epoch_0005.png" in frames


def test_butterfly200_label_embedding_workload(tmp_path):
    """Butterfly200 is a usable label-embedding workload straight from the
    frozen taxonomy — no dataset json (VERDICT r1 item 8)."""
    from learning_embeddings_tpu.cli.order_embeddings_h import main

    r = main(("--set_mode train --taxonomy butterfly200 --loss hyp_cones_loss "
              "--pick_per_level --n_epochs 3 --lr 0.01 --batch_size 20 "
              "--embedding_dim 6 --neg_to_pos_ratio 3 --eval_interval 2 "
              "--check_reconstr_every 0 --experiment_name b200 "
              f"--experiment_dir {tmp_path}").split())
    assert np.isfinite(r["best_val_f1"])
    assert r["trainer"].n_nodes == 344
