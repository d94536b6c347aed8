"""Eval tests: threshold sweep vs brute-force oracle of the reference's
calculate_best (order_embeddings.py:258-271); level metrics vs sklearn."""

import numpy as np
import pytest
from sklearn.metrics import precision_recall_fscore_support

import jax.numpy as jnp

from learning_embeddings_tpu.eval import (
    best_threshold_metrics,
    hierarchical_match_counts,
    multilevel_metrics,
    reconstruction_metrics,
    threshold_metrics,
)
from learning_embeddings_tpu.hierarchy import (
    label_graph_from_paths,
    toy_labelmap,
    transitive_closure,
)

RNG = np.random.RandomState(0)


def brute_force_best(e_pos, e_neg):
    """The reference's sweep: F1 at every unique energy, argmax (first)."""
    cands = np.unique(np.concatenate([e_pos, e_neg]))
    best = None
    for t in cands:
        cp = int((e_pos <= t).sum())
        cn = int((e_neg > t).sum())
        acc = (cp + cn) / (len(e_pos) + len(e_neg))
        den = cp + (len(e_neg) - cn)
        prec = cp / den if den > 0 else 0.0
        rec = cp / len(e_pos)
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        if best is None or f1 > best[0]:
            best = (f1, t, acc, prec, rec, cp, cn)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_best_threshold_vs_brute_force(seed):
    rng = np.random.RandomState(seed)
    e_pos = rng.gamma(2.0, 0.5, size=200).astype(np.float32)
    e_neg = (rng.gamma(2.0, 0.5, size=300) + 0.8).astype(np.float32)
    ours = best_threshold_metrics(jnp.array(e_pos), jnp.array(e_neg))
    ref = brute_force_best(e_pos, e_neg)
    np.testing.assert_allclose(float(ours.f1), ref[0], rtol=1e-6)
    np.testing.assert_allclose(float(ours.threshold), ref[1], rtol=1e-6)
    np.testing.assert_allclose(float(ours.accuracy), ref[2], rtol=1e-6)
    np.testing.assert_allclose(float(ours.precision), ref[3], rtol=1e-6)
    np.testing.assert_allclose(float(ours.recall), ref[4], rtol=1e-6)
    assert int(ours.correct_positives) == ref[5]
    assert int(ours.correct_negatives) == ref[6]


def test_best_threshold_with_ties():
    # duplicated energies across pos/neg exercise the <=/> tie rule
    e_pos = np.array([0.1, 0.2, 0.2, 0.5], np.float32)
    e_neg = np.array([0.2, 0.5, 0.9], np.float32)
    ours = best_threshold_metrics(jnp.array(e_pos), jnp.array(e_neg))
    ref = brute_force_best(e_pos, e_neg)
    assert float(ours.f1) == pytest.approx(ref[0])
    assert float(ours.threshold) == pytest.approx(ref[1])


def test_fixed_threshold_metrics():
    e_pos = np.array([0.1, 0.3, 0.6], np.float32)
    e_neg = np.array([0.2, 0.7, 0.9], np.float32)
    m = threshold_metrics(jnp.array(e_pos), jnp.array(e_neg), 0.3)
    # cp = 2 (0.1, 0.3), cn = 2 (0.7, 0.9)
    assert int(m.correct_positives) == 2 and int(m.correct_negatives) == 2
    assert float(m.accuracy) == pytest.approx(4 / 6)
    assert float(m.precision) == pytest.approx(2 / 3)
    assert float(m.recall) == pytest.approx(2 / 3)


def test_perfect_separation_gives_f1_one():
    e_pos = RNG.uniform(0, 0.4, 100).astype(np.float32)
    e_neg = RNG.uniform(0.6, 1.0, 120).astype(np.float32)
    m = best_threshold_metrics(jnp.array(e_pos), jnp.array(e_neg))
    assert float(m.f1) == 1.0
    assert 0.4 >= float(m.threshold) or float(m.threshold) < 0.6


def test_reconstruction_on_ideal_order_embedding():
    """Hand-placed order embeddings that perfectly encode a toy closure
    reconstruct with F1 = 1.0 (the reference's convergence criterion)."""
    lm = toy_labelmap(branching=2, n_levels=3)
    A = label_graph_from_paths(lm.leaf_paths(), lm)
    closure = transitive_closure(A)
    n = lm.n_classes
    # order embedding: x dominates y iff edge; use reversed-product coding:
    # assign each node coordinates = 1 - eps*depth along its path dims
    # Simple constructive: embedding[u] = indicator of ancestors-of-u scaled.
    emb = np.zeros((n, n), np.float32)
    for v in range(n):
        anc = closure[:, v]
        emb[v, anc] = 1.0   # v's coords dominate its ancestors' patterns
        emb[v, v] = 1.0
    # E(u,v) = ||max(0, u - v)||²: zero iff u's support ⊆ v's support, i.e.
    # ancestors(u) ∪ {u} ⊆ ancestors(v) ∪ {v} — true iff u is ancestor of v.
    m = reconstruction_metrics(jnp.array(emb), closure, energy="order")
    assert float(m.f1) == 1.0
    assert float(m.accuracy) == 1.0


def test_multilevel_metrics_vs_sklearn():
    lm = toy_labelmap(branching=3, n_levels=3)
    N = 200
    paths = lm.leaf_paths()
    ll = paths[RNG.randint(0, lm.levels[-1], N)]
    scores = RNG.randn(N, lm.n_classes).astype(np.float32)
    out = multilevel_metrics(scores, ll, lm)
    for l in range(lm.n_levels):
        a, b = int(lm.level_start[l]), int(lm.level_stop[l])
        pred = np.argmax(scores[:, a:b], axis=1)
        p, r, f1, _ = precision_recall_fscore_support(
            ll[:, l], pred, average="macro", labels=np.arange(b - a),
            zero_division=0)
        lv = out["levels"][l]
        np.testing.assert_allclose(lv.precision_macro, p, rtol=1e-6)
        np.testing.assert_allclose(lv.recall_macro, r, rtol=1e-6)
        np.testing.assert_allclose(lv.f1_macro, f1, rtol=1e-6)
        np.testing.assert_allclose(lv.accuracy, (pred == ll[:, l]).mean(), rtol=1e-6)


def test_hierarchical_match_counts():
    lm = toy_labelmap(branching=2, n_levels=2)
    ll = np.array([[0, 0], [1, 3]], np.int32)
    scores = np.full((2, lm.n_classes), -1.0, np.float32)
    scores[0, [0, 2]] = 5.0        # exact match for sample 0
    scores[1, [1, 2]] = 5.0        # level-0 correct, level-1 wrong
    m = hierarchical_match_counts(scores, ll, lm)
    assert m["exact_match"] == 1
    assert m["per_level_match"] == [2, 1]


def test_render_tsne_with_animation(tmp_path):
    from learning_embeddings_tpu.hierarchy import toy_labelmap
    from learning_embeddings_tpu.viz.tsne import render_tsne

    lm = toy_labelmap(2, 2)
    rng = np.random.RandomState(0)
    F = rng.randn(60, 16).astype(np.float32)
    L = rng.randint(0, 2, (60, 2))
    render_tsne(F, L, lm, str(tmp_path), animate=True, n_frames=4, fps=4)
    for l in range(2):
        assert (tmp_path / f"tsne_level{l}.png").exists()
        assert (tmp_path / f"tsne_level{l}.gif").exists()


def test_single_threshold_handles_tied_scores():
    """A run of tied scores is all-or-nothing under score >= t — mid-run
    cumsum points are unattainable and must not be selected (regression:
    [0.9 pos, 0.5 pos, 0.5 neg x8] used to return t=0.5, true F1 0.33,
    instead of t=0.9, F1 0.67)."""
    from learning_embeddings_tpu.eval.multilabel import tune_single_threshold

    scores = np.array([[0.9, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]])
    multihot = np.array([[1, 1, 0, 0, 0, 0, 0, 0, 0, 0]])
    t = tune_single_threshold(scores, multihot)
    assert t == 0.9
    # F1 at the returned threshold (pred = score >= t) beats t=0.5's
    pred_t = (scores >= t).astype(int)
    tp = int((pred_t & multihot).sum())
    f1_t = 2 * tp / (pred_t.sum() + multihot.sum())
    pred_5 = (scores >= 0.5).astype(int)
    tp5 = int((pred_5 & multihot).sum())
    f1_5 = 2 * tp5 / (pred_5.sum() + multihot.sum())
    assert f1_t > f1_5


def test_degenerate_class_scores_one_like_reference():
    """Classes with tp == fp == fn == 0 (no support, never predicted)
    score precision/recall/F1 = 1.0 — the reference MetricsMultiLevel
    convention (evaluation.py:518-522), NOT sklearn's 0.0."""
    from learning_embeddings_tpu.eval.metrics import (
        level_metrics_from_confusion, prf1_from_counts)

    cm = np.array([[2, 0, 0], [0, 2, 0], [0, 0, 0]], np.float64)
    lv = level_metrics_from_confusion(cm)
    np.testing.assert_allclose(lv.per_class_f1, [1.0, 1.0, 1.0])
    assert lv.f1_macro == 1.0            # reference: 1.0, sklearn: 0.667
    # the joint-metrics convention (oe_h.py:2071-2086) stays 0.0
    p, r, f1 = prf1_from_counts([2, 0], [2, 0], [2, 0],
                                degenerate_one=False)
    np.testing.assert_allclose(f1, [1.0, 0.0])


def test_pr_curves_render_with_zero_support_class(tmp_path):
    """A class with no positives in the eval set must get EMPTY PR curves
    (so the renderer's len-guard fires) instead of length-1 placeholders
    that crash ax.plot with mismatched shapes."""
    import numpy as np

    from learning_embeddings_tpu.eval.multilabel import (
        per_class_pr,
        render_pr_curves,
    )

    rng = np.random.RandomState(0)
    scores = rng.rand(20, 4)
    mh = np.zeros((20, 4), np.float32)
    mh[:10, 0] = 1
    mh[5:12, 1] = 1          # classes 2 and 3 have zero support
    curves, _ = per_class_pr(scores, mh)
    assert len(curves[2][2]) == 0 and len(curves[3][2]) == 0
    out = str(tmp_path / "pr.png")
    render_pr_curves(scores, mh, [f"c{i}" for i in range(4)], out)
    import os
    assert os.path.exists(out)


def test_normalization_values_uint8_matches_float(tmp_path):
    """generate_normalization_values must agree between uint8 and float32
    pipelines (uint8 squaring would wrap mod 256 without the f64 cast)."""
    import numpy as np

    from learning_embeddings_tpu.data.build_db import (
        generate_normalization_values)

    class FakePipe:
        def __init__(self, images):
            self.images = images

        def batches(self, order):
            yield {"image": self.images}

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (16, 8, 8, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    m_u8, s_u8 = generate_normalization_values(FakePipe(u8), np.arange(16))
    m_f, s_f = generate_normalization_values(FakePipe(f32), np.arange(16))
    np.testing.assert_allclose(m_u8, m_f, rtol=1e-6)
    np.testing.assert_allclose(s_u8, s_f, rtol=1e-6)
    assert (s_u8 > 0.2).all()   # wrapped squares would collapse std
