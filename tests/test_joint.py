"""Joint image+label embedding tests: structured sampler correctness vs the
graph, end-to-end training on synthetic features, curriculum filtering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learning_embeddings_tpu.hierarchy import toy_labelmap
from learning_embeddings_tpu.losses.joint_sampling import (
    build_joint_graph,
    make_joint_negative_sampler,
)
from learning_embeddings_tpu.train.joint import (
    JointEmbeddingTrainer,
    JointTrainerConfig,
)

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def setup():
    lm = toy_labelmap(branching=2, n_levels=3)      # 14 labels, 8 leaves
    n_img_per_leaf = 6
    leaves = np.repeat(np.arange(lm.levels[-1]), n_img_per_leaf)
    ll = lm.leaf_paths()[leaves]                     # (48, 3)
    graph, train_edges = build_joint_graph(lm, ll)
    # synthetic separable "fc7": one cluster center per leaf + noise
    centers = RNG.randn(lm.levels[-1], 32) * 3
    feats = centers[leaves] + 0.3 * RNG.randn(len(leaves), 32)
    return lm, graph, train_edges, feats.astype(np.float32), ll


def test_build_joint_graph_shapes(setup):
    lm, graph, train_edges, feats, ll = setup
    assert graph.n_labels == 14 and graph.n_images == 48
    # label basic edges 2+4+... = 12; image edges 48*3
    assert len(train_edges) == 12 + 48 * 3
    # positive_mask: direct and transitive label edges, label->image
    assert graph.positive_mask(np.array([0]), np.array([2]))[0]   # L0_0->L1_0
    assert graph.positive_mask(np.array([0]), np.array([6]))[0]   # transitive
    img0 = 14 + 0
    assert graph.positive_mask(np.array([0]), np.array([img0]))[0]
    assert not graph.positive_mask(np.array([1]), np.array([img0]))[0]
    assert not graph.positive_mask(np.array([img0]), np.array([0]))[0]


@pytest.mark.parametrize("pick_per_level", [True, False])
def test_joint_sampler_only_negatives(setup, pick_per_level):
    lm, graph, train_edges, feats, ll = setup
    sampler = make_joint_negative_sampler(
        graph, 4, pick_per_level=pick_per_level)
    pf = jnp.asarray(train_edges[:, 0])
    pt = jnp.asarray(train_edges[:, 1])
    nf, nt = sampler(jax.random.PRNGKey(0), pf, pt)
    nf, nt = np.asarray(nf), np.asarray(nt)
    pos = graph.positive_mask(nf, nt)
    assert not pos.any(), f"{pos.sum()} sampled pairs are positives"
    assert not (nf == nt).any()


def test_joint_sampler_image_pass_type_follows_anchor(setup):
    """On the image-level pass the corrupted node's type follows the
    ANCHOR (reference sample_negative_edge sees only the kept endpoint,
    oe_h.py:869-873 + call sites :970/:975): label anchor -> image
    negative, image anchor -> label negative. Regression: the old rule
    keyed on the EDGE type and drew label negatives for the corrupt-'to'
    side of label->image edges."""
    lm, graph, train_edges, feats, ll = setup
    nl, L, R = graph.n_labels, graph.n_levels, graph.n_levels + 1
    sampler = make_joint_negative_sampler(graph, R, pick_per_level=True)
    img_edges = train_edges[train_edges[:, 1] >= nl][:8]
    lab_edges = train_edges[train_edges[:, 1] < nl][:8]
    for edges in (img_edges, lab_edges):
        nf, nt = sampler(jax.random.PRNGKey(3),
                         jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]))
        B = len(edges)
        nt2 = np.asarray(nt).reshape(B, 2 * R)[:, :R]   # corrupt-'to' slots
        nf2 = np.asarray(nf).reshape(B, 2 * R)[:, R:]   # corrupt-'from'
        # image pass = slot L; 'from' anchors are labels -> image negative
        assert (nt2[:, L] >= nl).all()
        # corrupt-'from' on the image pass: image anchor -> label negative,
        # label anchor -> image negative
        expect_label = edges[:, 1] >= nl
        assert ((nf2[:, L] < nl) == expect_label).all()
    # the numpy mirror implements the same rule
    from learning_embeddings_tpu.losses.joint_sampling import (
        sample_joint_negatives_np)

    rng = np.random.RandomState(0)
    nf, nt = sample_joint_negatives_np(graph, R, rng, img_edges[:, 0],
                                       img_edges[:, 1],
                                       pick_per_level=True)
    B = len(img_edges)
    nt2 = nf.reshape(B, 2 * R), nt.reshape(B, 2 * R)
    assert (nt2[1][:, L] >= nl).all()          # label anchor -> image
    assert (nt2[0][:, R + L] < nl).all()       # image anchor -> label


def test_image_negative_run_range_sampler_uniform(setup):
    """The O(1) run-range image-negative sampler must be uniform over
    exactly the non-descendant images (same distribution as the masked
    categorical it replaced)."""
    lm, graph, train_edges, feats, ll = setup
    nl, L, R = graph.n_labels, graph.n_levels, graph.n_levels + 1
    sampler = make_joint_negative_sampler(graph, R, pick_per_level=True)
    anchor = 0                                 # a root label
    N = 3000
    pf = jnp.zeros((N,), jnp.int32)
    pt = jnp.asarray(
        train_edges[(train_edges[:, 0] == anchor)
                    & (train_edges[:, 1] >= nl)][0, 1]
        * np.ones(N, np.int32))
    nf, nt = sampler(jax.random.PRNGKey(7), pf, pt)
    picks = np.asarray(nt).reshape(N, 2 * R)[:, L]       # image pass slots
    assert (picks >= nl).all()
    rows = picks - nl
    descended = (graph.image_paths_global[rows] == anchor).any(axis=1)
    assert not descended.any()
    # uniformity over the complement: every non-descendant image hit,
    # counts within chi-square-ish bounds
    compl = np.nonzero(
        ~(graph.image_paths_global == anchor).any(axis=1))[0]
    counts = np.bincount(rows, minlength=graph.n_images)[compl]
    assert (counts > 0).all()
    expected = N / len(compl)
    assert counts.max() < expected * 2.5 and counts.min() > expected * 0.3


def test_empty_image_complement_raises(setup):
    """A label that is an ancestor of EVERY train image has no negative
    images — both samplers must fail loudly (the silently-clamped draw
    would return a descendant trained as a negative; the reference
    crashes on the empty candidate set, oe_h.py:881-905)."""
    from learning_embeddings_tpu.losses.joint_sampling import (
        sample_joint_negatives_np)

    lm = toy_labelmap(branching=2, n_levels=3)
    ll = lm.leaf_paths()[np.zeros(6, int)]      # all images under leaf 0
    graph, train_edges = build_joint_graph(lm, ll)
    with pytest.raises(ValueError, match="ancestors? of"):
        make_joint_negative_sampler(graph, 4, pick_per_level=True)
    img_edges = train_edges[train_edges[:, 1] >= graph.n_labels]
    with pytest.raises(ValueError, match="ancestors? of"):
        sample_joint_negatives_np(
            graph, 4, np.random.RandomState(0),
            img_edges[:4, 0], img_edges[:4, 1], pick_per_level=True)
    # hiding nothing but sampling without per-level passes stays legal
    # (the unrestricted pass mixes label candidates in)
    make_joint_negative_sampler(graph, 4, pick_per_level=False)
    # a ratio too small for the image-level pass to ever fire must not be
    # rejected at build time (pass slots = visible[r % len(visible)] for
    # r < R: with L=3 and R=2, only label levels 0 and 1 appear)
    make_joint_negative_sampler(graph, 2, pick_per_level=True)
    # an offender confined to ONE level: hiding that level legalizes the
    # stage (hidden labels never anchor a draw — filter_stage_edges drops
    # their edges), so the error's own remedy actually works
    ll2 = lm.leaf_paths()[np.arange(8) % 4]     # all under level-0 node 0
    graph2, _ = build_joint_graph(lm, ll2)
    with pytest.raises(ValueError, match="ancestors? of"):
        make_joint_negative_sampler(graph2, 4, pick_per_level=True)
    make_joint_negative_sampler(graph2, 4, pick_per_level=True,
                                levels_to_hide=(0,))


def test_joint_sampler_respects_hidden_levels(setup):
    lm, graph, train_edges, feats, ll = setup
    sampler = make_joint_negative_sampler(
        graph, 6, pick_per_level=True, levels_to_hide=(1, 2))
    pf = jnp.asarray(train_edges[:12, 0])
    pt = jnp.asarray(train_edges[:12, 1])
    nf, nt = sampler(jax.random.PRNGKey(1), pf, pt)
    lvl_of = np.full(graph.n_labels + graph.n_images, graph.n_levels)
    for l in range(graph.n_levels):
        lvl_of[graph.level_start[l]:graph.level_stop[l]] = l
    # corrupted nodes must never come from hidden label levels 1, 2
    corrupted = np.concatenate([
        np.asarray(nf).reshape(12, 12)[:, 6:].reshape(-1),
        np.asarray(nt).reshape(12, 12)[:, :6].reshape(-1)])
    assert not np.isin(lvl_of[corrupted], [1, 2]).any()


def test_joint_training_learns(setup):
    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(
        energy="hyp_cone", embedding_dim=4, feature_dim=32,
        lr_labels=0.01, lr_images=0.01, batch_size=12, neg_to_pos_ratio=4,
        alpha=0.01, optimizer_labels="adam", pick_per_level=True, seed=0)
    tr = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)
    rng = np.random.RandomState(0)
    m0 = tr.classification_metrics()
    for ep in range(60):
        stats = tr.train_epoch(ep, rng)
    m1 = tr.classification_metrics()
    assert m1["hit@1"] > max(2 * m0["hit@1"], 0.5)
    assert m1["micro_f1"] > m0["micro_f1"]
    rec = tr.reconstruction()
    assert float(rec.f1) > 0.6
    # hyperbolic: all embeddings inside the ball
    assert m1["median_label_norm"] < 1.0 and m1["median_img_norm"] < 1.0


@pytest.mark.parametrize("variant", ["vendrov", "nll"])
def test_joint_loss_variants_learn(setup, variant):
    """The v1-prototype loss variants (--loss_variant vendrov/nll,
    order_embeddings_images.py:533-542 / order_embeddings.py:1108-1202)
    train and improve ranking."""
    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(
        energy="order", embedding_dim=4, feature_dim=32,
        lr_labels=0.01, lr_images=0.01, batch_size=12, neg_to_pos_ratio=4,
        alpha=0.05, optimizer_labels="adam", pick_per_level=True,
        loss_variant=variant, seed=0)
    tr = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)
    rng = np.random.RandomState(0)
    m0 = tr.classification_metrics()
    for ep in range(40):
        stats = tr.train_epoch(ep, rng)
    assert np.isfinite(stats["loss"])
    m1 = tr.classification_metrics()
    assert m1["hit@1"] > m0["hit@1"]


def test_nll_variant_rejects_non_euclidean_energy(setup):
    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(energy="hyp_cone", embedding_dim=4,
                             feature_dim=32, loss_variant="nll", seed=0)
    with pytest.raises(ValueError, match="euclidean"):
        JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)


def test_curriculum_stages_filter_edges(setup):
    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(
        energy="hyp_cone", embedding_dim=4, feature_dim=32,
        batch_size=12, neg_to_pos_ratio=2, hide_levels=True,
        curriculum={0: (1, 2), 5: ()}, seed=0)
    tr = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)
    edges0, _ = tr._stage(tr.levels_for_epoch(0))
    edges5, _ = tr._stage(tr.levels_for_epoch(5))
    assert len(edges5) == len(train_edges)
    # stage 0 hides levels 1,2: only L0 labels + images remain ->
    # only (L0 label -> image) edges survive
    lvl_of = np.full(graph.n_labels + graph.n_images, graph.n_levels)
    for l in range(graph.n_levels):
        lvl_of[graph.level_start[l]:graph.level_stop[l]] = l
    assert (lvl_of[edges0[:, 0]] == 0).all()
    assert (edges0[:, 1] >= graph.n_labels).all()
    assert len(edges0) == 48


def test_half_half_resampling(setup):
    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(energy="order", embedding_dim=4, feature_dim=32,
                             half_half=True, batch_size=12, seed=0)
    tr = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)
    order = tr._epoch_order(train_edges, np.random.RandomState(0))
    frac_img = (order[:, 1] >= graph.n_labels).mean()
    assert 0.45 < frac_img < 0.55


def test_joint_graph_cache_roundtrip(tmp_path):
    """--load_G_from_disk cache contract (reference gpickle +
    neg_adjacency.npy, oe_h.py:2250-2297): save -> load yields identical
    graph arrays and train edges."""
    from learning_embeddings_tpu.losses.joint_sampling import (
        build_joint_graph, load_joint_graph, save_joint_graph)

    lm = toy_labelmap(branching=2, n_levels=3)
    rng = np.random.RandomState(0)
    ll = lm.leaf_paths()[rng.randint(0, lm.levels[-1], 20)]
    graph, edges = build_joint_graph(lm, ll)
    path = str(tmp_path / "joint_graph.npz")
    save_joint_graph(path, graph, edges)
    g2, e2 = load_joint_graph(path)
    np.testing.assert_array_equal(graph.label_closure, g2.label_closure)
    np.testing.assert_array_equal(graph.image_paths_global,
                                  g2.image_paths_global)
    np.testing.assert_array_equal(graph.level_start, g2.level_start)
    np.testing.assert_array_equal(edges, e2)


def test_euc_cones_loss_is_per_driver(setup):
    """The reference reuses EuclideanConesWithImagesHypernymLoss for two
    geometries — oe.py: genuine Euclidean cone (K=3, soft_clip norm+K,
    oe.py:650-742); oe_h.py: hyperbolic cones (K=0.1, oe_h.py:739-760).
    The CLI mapping must follow the driver, and the joint trainer must
    actually train the euclidean-cone energy."""
    from learning_embeddings_tpu.cli._joint_main import resolve_energy
    from learning_embeddings_tpu.train.joint import (
        DEFAULT_K,
        JOINT_MODE,
        JointEmbeddingTrainer,
        JointTrainerConfig,
    )

    assert resolve_energy("euc_cones_loss", "order_emb_loss") == "euc_cone"
    assert resolve_energy("euc_cones_loss", "hyp_cones_loss") == "hyp_cone"
    assert JOINT_MODE["euc_cone"] == "euc_cone"
    assert DEFAULT_K["euc_cone"] == 3.0

    lm, graph, train_edges, feats, ll = setup
    cfg = JointTrainerConfig(energy="euc_cone", embedding_dim=4,
                             feature_dim=feats.shape[1], batch_size=10,
                             neg_to_pos_ratio=3, alpha=0.05, seed=0,
                             pick_per_level=True)
    tr = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg)
    losses = [tr.train_epoch(e, np.random.RandomState(e))["loss"]
              for e in range(3)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # soft-clip geometry: every node embedding has norm >= K
    emb = np.asarray(tr.node_embeddings(
        tr.params, jnp.arange(graph.n_labels)))
    assert (np.linalg.norm(emb, axis=1) >= 3.0 - 1e-4).all()


def test_matrix_approximation_matches_reference_math():
    """MatrixApproximation: x @ (pad(diag(d)) + u v^T) with the soft-clip
    geometry tail (reference oe.py:141-175 — defined upstream but never
    selected by the committed drivers; kept at parity and tested here)."""
    from learning_embeddings_tpu.models.embedder import MatrixApproximation

    rng = np.random.RandomState(0)
    B, F, D = 5, 32, 10
    x = rng.randn(B, F).astype(np.float32)
    m = MatrixApproximation(dim=D, mode="euc_cone", K=3.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    d = np.asarray(params["params"]["diag"])
    u = np.asarray(params["params"]["u"])
    v = np.asarray(params["params"]["v"])
    W = np.zeros((F, D), np.float32)
    W[:D, :D] = np.diag(d)
    W = W + np.outer(v, u)
    raw = x @ W
    n = np.linalg.norm(raw, axis=1, keepdims=True)
    expect = raw / n * (n + 3.0)         # soft_clip norm -> norm + K
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_eval_split_empty_image_complement_widens():
    """A skewed eval split where one label is an ancestor of EVERY image
    must still produce edge metrics (the train-graph behavior is to fail
    loudly; joint_edge_metrics passes empty_image_complement='widen' —
    r3 advisor finding)."""
    from learning_embeddings_tpu.losses.joint_sampling import (
        sample_joint_negatives_np)
    from learning_embeddings_tpu.train.joint import joint_edge_metrics

    lm = toy_labelmap(branching=2, n_levels=2)   # 2 + 4 labels
    # every image under leaf 0: its ancestors cover the whole split
    ll = lm.leaf_paths()[np.zeros(5, np.int64)]
    graph, _ = build_joint_graph(lm, ll)
    paths = graph.image_paths_global
    nl = graph.n_labels
    pos_from = paths.reshape(-1)
    pos_to = (nl + np.repeat(np.arange(len(paths)), paths.shape[1])
              ).astype(np.int32)

    # ratio 3: the per-level pass cycle (levels 0, 1, images) reaches the
    # image-level draw, whose complement is empty for leaf 0's ancestors
    with pytest.raises(ValueError, match="ancestor of every image"):
        sample_joint_negatives_np(graph, 3, np.random.RandomState(0),
                                  pos_from, pos_to, pick_per_level=True)
    nf, nt = sample_joint_negatives_np(
        graph, 3, np.random.RandomState(0), pos_from, pos_to,
        pick_per_level=True, empty_image_complement="widen")
    # widened draws are still true negatives
    assert not graph.positive_mask(nf, nt).any()

    # and the eval pass itself runs end-to-end on the skewed split
    rng = np.random.RandomState(1)
    lab = rng.randn(nl, 4).astype(np.float32) * 0.1
    img = rng.randn(len(paths), 4).astype(np.float32) * 0.1
    m = joint_edge_metrics(lab, img, paths, graph, energy="hyp_cone",
                           neg_to_pos_ratio=3, pick_per_level=True,
                           seed=0, K=0.1)
    assert np.isfinite(float(m.f1))


def test_meshed_fc7_eval_embeddings_match_single(setup):
    """Meshed fc7 eval (feature batch sharded over 'data') reproduces the
    single-device FeatNet embeddings on a ragged row count."""
    from learning_embeddings_tpu.parallel.mesh import make_mesh

    lm, graph, train_edges, feats, leaves = setup
    cfg = JointTrainerConfig(energy="hyp_cone", embedding_dim=4,
                             feature_dim=feats.shape[1], batch_size=8,
                             neg_to_pos_ratio=2, seed=0)
    tr_m = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg,
                                 mesh=make_mesh(n_data=8, n_model=1))
    tr_s = JointEmbeddingTrainer(lm, graph, train_edges, feats, cfg,
                                 mesh=None)
    sub = np.asarray(feats)[:11]   # ragged vs the 8 data shards
    em = np.asarray(tr_m.image_embeddings(sub))
    es = np.asarray(tr_s.image_embeddings(sub))
    assert em.shape == es.shape == (11, 4)
    np.testing.assert_allclose(em, es, rtol=1e-5, atol=1e-6)
