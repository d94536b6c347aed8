"""LIME implementation tests (viz/lime.py — reference inference.py:248-362
uses lime_image; ours is a from-scratch SLIC + weighted-ridge surrogate)."""

import numpy as np

from learning_embeddings_tpu.viz.lime import (
    lime_explain, mark_boundaries, overlay_mask, slic_segments,
    top_feature_mask)


def test_slic_segments_cover_and_count():
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32)
    seg = slic_segments(img, n_segments=16)
    assert seg.shape == (48, 64)
    n = seg.max() + 1
    # consecutive non-empty labels, roughly the requested count
    assert set(np.unique(seg)) == set(range(n))
    assert 8 <= n <= 32
    # deterministic
    assert np.array_equal(seg, slic_segments(img, n_segments=16))


def test_slic_chunked_path_matches_dense(monkeypatch):
    """The chunked distance path must produce the exact segmentation of
    the dense path on the same image."""
    from learning_embeddings_tpu.viz import lime as L

    rng = np.random.RandomState(2)
    img = rng.rand(60, 60, 3).astype(np.float32)
    dense = slic_segments(img, n_segments=9)         # 3600*9 << limit
    monkeypatch.setattr(L, "_DENSE_LIMIT", 1)        # force chunked path
    chunked = slic_segments(img, n_segments=9)
    assert np.array_equal(dense, chunked)
    n = chunked.max() + 1
    assert set(np.unique(chunked)) == set(range(n))


def test_slic_respects_color_regions():
    # two flat color halves -> no segment spans the boundary
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    seg = slic_segments(img, n_segments=8, compactness=0.05)
    left = set(np.unique(seg[:, :16]))
    right = set(np.unique(seg[:, 16:]))
    assert left.isdisjoint(right)


def test_lime_recovers_planted_segment():
    """A predictor that only looks at whether segment k survives must get
    its largest surrogate weight on segment k."""
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32) + 0.5  # keep off 0 fill
    seg = slic_segments(img, n_segments=9)
    S = seg.max() + 1
    k = S // 2
    area = float((seg == k).sum())

    def predict(images):
        # prob class0 = fraction of segment k's pixels still visible
        vis = (images.sum(-1) > 0) & (seg == k)[None]
        p = vis.sum((1, 2)) / area
        return np.stack([p, 1 - p], axis=1)

    coefs, probs0 = lime_explain(img, predict, seg, num_samples=200,
                                 hide_color=0.0,
                                 rng=np.random.RandomState(0))
    assert probs0[0] == 1.0                      # unperturbed: all visible
    assert int(np.argmax(coefs[0])) == k
    # class 1 is anti-correlated with segment k
    assert int(np.argmin(coefs[1])) == k

    mask = top_feature_mask(coefs[0], seg, num_features=1)
    assert set(np.unique(mask[seg == k])) == {1}
    assert not mask[seg != k].any()
    neg = top_feature_mask(coefs[1], seg, num_features=1)
    assert set(np.unique(neg[seg == k])) == {-1}


def test_top_feature_mask_positive_only():
    seg = np.repeat(np.arange(4), 4).reshape(4, 4)
    coefs = np.array([0.5, -2.0, 0.1, -0.01], np.float32)
    m = top_feature_mask(coefs, seg, num_features=2, positive_only=True)
    assert set(np.unique(m)) <= {0, 1}
    assert m[seg == 0].all() and not m[seg == 1].any()


def test_render_helpers_shapes_and_range():
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    seg = slic_segments(img, n_segments=4)
    out = mark_boundaries(img, seg)
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1
    mask = np.where(seg == 0, 1, np.where(seg == 1, -1, 0)).astype(np.int8)
    ov = overlay_mask(img, seg, mask)
    assert ov.shape == (16, 16, 3)
    assert ov.min() >= 0 and ov.max() <= 1
    # grayscale input broadcasts to rgb
    assert mark_boundaries(img[..., 0], seg).shape == (16, 16, 3)
