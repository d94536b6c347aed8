"""Classification-loss tests vs torch oracles implementing the reference
semantics (network/loss.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from learning_embeddings_tpu.hierarchy import build_labelmap
from learning_embeddings_tpu.losses.classification import (
    hierarchical_softmax_nll,
    make_hierarchical_softmax,
    make_last_level_ce,
    make_masked_ce,
    make_multi_level_ce,
    multi_label_soft_margin,
)

RNG = np.random.RandomState(0)


def small_labelmap():
    return build_labelmap(
        level_names=("family", "subfamily", "genus"),
        names_by_level=[
            ["fA", "fB"],
            ["sA1", "sA2", "sB1"],
            ["g1", "g2", "g3", "g4", "g5"],
        ],
        child_of_by_name=[
            {"fA": ["sA1", "sA2"], "fB": ["sB1"]},
            {"sA1": ["g1", "g2"], "sA2": ["g3"], "sB1": ["g4", "g5"]},
        ],
    )


def random_batch(lm, B=16):
    logits = RNG.randn(B, lm.n_classes).astype(np.float32) * 3
    # consistent gt paths: pick leaf, walk up
    paths = lm.leaf_paths()
    leaf = RNG.randint(0, lm.levels[-1], size=B)
    level_labels = paths[leaf]
    return logits, level_labels.astype(np.int32)


# --------------------------------------------------------------------------
# MultiLevelCELoss
# --------------------------------------------------------------------------

def torch_multi_level_ce(lm, logits, level_labels, level_weights, class_weights=None):
    logits = torch.tensor(logits)
    level_labels = torch.tensor(level_labels.astype(np.int64))
    loss = 0.0
    for l in range(lm.n_levels):
        a, b = int(lm.level_start[l]), int(lm.level_stop[l])
        w = None if class_weights is None else torch.tensor(class_weights[a:b])
        ce = torch.nn.CrossEntropyLoss(weight=w, reduction="none")
        loss = loss + level_weights[l] * ce(logits[:, a:b], level_labels[:, l])
    return torch.mean(loss).item()


def test_multi_level_ce_vs_torch():
    lm = small_labelmap()
    logits, ll = random_batch(lm)
    lw = [1.0, 2.0, 0.5]
    ours = float(make_multi_level_ce(lm, lw)(jnp.array(logits), jnp.array(ll)))
    ref = torch_multi_level_ce(lm, logits, ll, lw)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multi_level_ce_with_class_weights():
    lm = small_labelmap()
    logits, ll = random_batch(lm)
    cw = RNG.uniform(0.5, 2.0, lm.n_classes).astype(np.float32)
    ours = float(make_multi_level_ce(lm, None, cw)(jnp.array(logits), jnp.array(ll)))
    ref = torch_multi_level_ce(lm, logits, ll, [1.0] * 3, cw)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multi_level_ce_smoke_huge_logits():
    """Reference loss.py:253-269 smoke: huge logits at the correct labels
    drive the loss to ~0."""
    lm = small_labelmap()
    ll = np.array([[0, 1, 2]], np.int32)  # fA -> sA2 -> g3
    logits = np.zeros((1, lm.n_classes), np.float32)
    logits[0, [0, 3, 7]] = 1e4
    loss = float(make_multi_level_ce(lm)(jnp.array(logits), jnp.array(ll)))
    assert loss < 1e-5


# --------------------------------------------------------------------------
# LastLevelCELoss
# --------------------------------------------------------------------------

def torch_last_level_ce(lm, leaf_logits, level_labels, level_weights):
    """Oracle for reference loss.py:68-98: bottom-up probability sums."""
    leaf_logits = torch.tensor(leaf_logits)
    level_labels = torch.tensor(level_labels.astype(np.int64))
    B = leaf_logits.shape[0]
    outputs_new = torch.zeros((B, lm.n_classes))
    a, b = int(lm.level_start[-1]), int(lm.level_stop[-1])
    outputs_new[:, a:b] = torch.softmax(leaf_logits, dim=1)
    for l in range(lm.n_levels - 2, -1, -1):
        al, bl = int(lm.level_start[l]), int(lm.level_stop[l])
        an, bn = int(lm.level_start[l + 1]), int(lm.level_stop[l + 1])
        for p in range(lm.levels[l]):
            kids = lm.get_children_of(p, l + 1)
            outputs_new[:, al + p] = outputs_new[:, an + torch.tensor(kids)].sum(dim=1)
    loss = 0.0
    for l in range(lm.n_levels):
        al, bl = int(lm.level_start[l]), int(lm.level_stop[l])
        nll = torch.nn.NLLLoss(reduction="none")
        loss = loss + level_weights[l] * nll(
            torch.log(outputs_new[:, al:bl]), level_labels[:, l])
    return outputs_new.numpy(), torch.mean(loss).item()


def test_last_level_ce_vs_torch():
    lm = small_labelmap()
    B = 8
    leaf_logits = RNG.randn(B, lm.levels[-1]).astype(np.float32)
    paths = lm.leaf_paths()
    ll = paths[RNG.randint(0, lm.levels[-1], B)].astype(np.int32)
    probs, loss = make_last_level_ce(lm, [1.0, 1.0, 1.0])(
        jnp.array(leaf_logits), jnp.array(ll))
    ref_probs, ref_loss = torch_last_level_ce(lm, leaf_logits, ll, [1.0] * 3)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


def test_last_level_parent_probs_sum_to_one():
    lm = small_labelmap()
    leaf_logits = RNG.randn(4, lm.levels[-1]).astype(np.float32)
    ll = lm.leaf_paths()[[0, 1, 2, 3]].astype(np.int32)
    probs, _ = make_last_level_ce(lm)(jnp.array(leaf_logits), jnp.array(ll))
    probs = np.asarray(probs)
    for l in range(lm.n_levels):
        a, b = int(lm.level_start[l]), int(lm.level_stop[l])
        np.testing.assert_allclose(probs[:, a:b].sum(-1), 1.0, rtol=1e-5)


# --------------------------------------------------------------------------
# MaskedCELoss
# --------------------------------------------------------------------------

def torch_masked_ce(lm, logits, level_labels, level_weights):
    """Oracle for reference loss.py:123-166: per-sample loop, gt-children
    CE until first wrong prediction, then full-level CE; outputs filled at
    predicted-chain children."""
    logits_t = torch.tensor(logits)
    B = logits.shape[0]
    outputs_new = -1e8 * torch.ones_like(logits_t)
    loss = 0.0
    for i in range(B):
        possible, new_labels = lm.decode_children(level_labels[i])
        found_wrong = False
        pred_rel = None  # predicted node, relative within its level
        for l, key in enumerate(lm.level_names):
            a = int(lm.level_start[l])
            # loss: CE over gt parent's children until first mistake
            cand = [ix + a for ix in possible[key]]
            if not found_wrong:
                ce = F.cross_entropy(
                    logits_t[i, cand].unsqueeze(0),
                    torch.tensor([new_labels[l]]), reduction="none")
            else:
                b = int(lm.level_stop[l])
                ce = F.cross_entropy(
                    logits_t[i, a:b].unsqueeze(0),
                    torch.tensor([int(level_labels[i, l])]), reduction="none")
            loss = loss + level_weights[l] * ce
            # predicted chain: argmax within predicted parent's children
            kids_rel = (list(range(lm.levels[0])) if l == 0
                        else lm.get_children_of(pred_rel, l))
            kids_abs = [k + a for k in kids_rel]
            j = torch.argmax(logits_t[i, kids_abs]).item()
            outputs_new[i, kids_abs] = logits_t[i, kids_abs]
            pred_rel = kids_rel[j]
            if pred_rel != int(level_labels[i, l]):
                found_wrong = True
    # reference: torch.mean over the 1-element accumulator == the SUM
    return outputs_new.numpy(), loss.item()


def test_masked_ce_vs_oracle():
    lm = small_labelmap()
    logits, ll = random_batch(lm, B=12)
    ours_out, ours_loss = make_masked_ce(lm, [1.0, 1.0, 1.0])(
        jnp.array(logits), jnp.array(ll))
    ref_out, ref_loss = torch_masked_ce(lm, logits, ll, [1.0, 1.0, 1.0])
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_out), ref_out, rtol=1e-5, atol=1e-5)


def test_masked_ce_perfect_predictions_match_gt_chain():
    """With logits peaked at the gt path, masked CE ~ 0 and outputs expose
    exactly the gt chain's candidate sets."""
    lm = small_labelmap()
    ll = np.array([[1, 2, 4]], np.int32)  # fB -> sB1 -> g5
    logits = np.full((1, lm.n_classes), -5.0, np.float32)
    logits[0, [1, 4, 9]] = 50.0
    out, loss = make_masked_ce(lm)(jnp.array(logits), jnp.array(ll))
    assert float(loss) < 1e-4
    out = np.asarray(out)[0]
    # level 0 all visible; level 1 children of fB = {sB1}; level 2 children
    # of sB1 = {g4, g5}
    visible = np.nonzero(out > -1e7)[0]
    np.testing.assert_array_equal(visible, [0, 1, 4, 8, 9])


# --------------------------------------------------------------------------
# MultiLabelSoftMarginLoss
# --------------------------------------------------------------------------

def test_multi_label_soft_margin_vs_torch():
    lm = small_labelmap()
    logits, ll = random_batch(lm, B=10)
    targets = np.zeros_like(logits)
    for i in range(len(ll)):
        targets[i, lm.global_labels(ll[i])] = 1.0
    ours = float(multi_label_soft_margin(jnp.array(logits), jnp.array(targets)))
    ref = torch.nn.MultiLabelSoftMarginLoss()(
        torch.tensor(logits), torch.tensor(targets)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multi_label_soft_margin_weighted_vs_torch():
    lm = small_labelmap()
    logits, ll = random_batch(lm, B=10)
    targets = (RNG.rand(*logits.shape) > 0.5).astype(np.float32)
    w = RNG.uniform(0.5, 2.0, lm.n_classes).astype(np.float32)
    ours = float(multi_label_soft_margin(
        jnp.array(logits), jnp.array(targets), jnp.array(w)))
    ref = torch.nn.MultiLabelSoftMarginLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(targets)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


# --------------------------------------------------------------------------
# HierarchicalSoftmax
# --------------------------------------------------------------------------

def test_hsoftmax_leaf_probs_normalize():
    lm = small_labelmap()
    raw = RNG.randn(6, lm.n_classes).astype(np.float32)
    all_lp, leaf_lp = make_hierarchical_softmax(lm)(jnp.array(raw))
    leaf = np.exp(np.asarray(leaf_lp))
    np.testing.assert_allclose(leaf.sum(-1), 1.0, rtol=1e-5)


def test_hsoftmax_parent_equals_children_sum():
    lm = small_labelmap()
    raw = RNG.randn(4, lm.n_classes).astype(np.float32)
    all_lp, _ = make_hierarchical_softmax(lm)(jnp.array(raw))
    p = np.exp(np.asarray(all_lp))
    # P(parent) == sum of P(children)
    for l in range(lm.n_levels - 1):
        a = int(lm.level_start[l]); an = int(lm.level_start[l + 1])
        for par in range(lm.levels[l]):
            kids = lm.get_children_of(par, l + 1)
            np.testing.assert_allclose(
                p[:, a + par], p[:, an + np.array(kids)].sum(-1), rtol=1e-4)


def torch_hsoftmax(lm, raw):
    """Oracle for reference loss.py:210-240 with weights folded into a
    single matrix (per-parent local log-softmax, chained)."""
    raw = torch.tensor(raw)
    B = raw.shape[0]
    all_lp = torch.zeros((B, lm.n_classes))
    a0, b0 = int(lm.level_start[0]), int(lm.level_stop[0])
    all_lp[:, a0:b0] = F.log_softmax(raw[:, a0:b0], dim=1)
    for l in range(1, lm.n_levels):
        a = int(lm.level_start[l]); ap = int(lm.level_start[l - 1])
        for par in range(lm.levels[l - 1]):
            kids = lm.get_children_of(par, l)
            if not kids:
                continue
            kid_ix = [a + k for k in kids]
            local = F.log_softmax(raw[:, kid_ix], dim=1)
            all_lp[:, kid_ix] = local + all_lp[:, ap + par].unsqueeze(1)
    return all_lp.numpy()


def test_hsoftmax_vs_oracle():
    lm = small_labelmap()
    raw = (RNG.randn(5, lm.n_classes) * 2).astype(np.float32)
    all_lp, leaf_lp = make_hierarchical_softmax(lm)(jnp.array(raw))
    ref = torch_hsoftmax(lm, raw)
    np.testing.assert_allclose(np.asarray(all_lp), ref, rtol=1e-4, atol=1e-5)
    # NLL loss
    ll = lm.leaf_paths()[[0, 2, 4, 1, 3]].astype(np.int32)
    ours = float(hierarchical_softmax_nll(leaf_lp, jnp.array(ll)))
    a, b = int(lm.level_start[-1]), int(lm.level_stop[-1])
    ref_loss = F.nll_loss(torch.tensor(ref[:, a:b]),
                          torch.tensor(ll[:, -1].astype(np.int64))).item()
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-4)


def test_multi_level_ce_gradient_parity_with_torch():
    """Gradients, not just values: d(loss)/d(logits) must match torch
    autograd (the training signal is what parity ultimately means)."""
    import jax

    lm = small_labelmap()
    logits, ll = random_batch(lm, B=6)
    lw = [1.0, 0.5, 2.0]
    f = make_multi_level_ce(lm, lw)
    g_ours = np.asarray(jax.grad(lambda x: f(x, jnp.array(ll)))(
        jnp.array(logits)))

    t = torch.tensor(logits, requires_grad=True)
    tl = torch.tensor(ll.astype(np.int64))
    loss = 0.0
    for l in range(lm.n_levels):
        a, b = int(lm.level_start[l]), int(lm.level_stop[l])
        loss = loss + lw[l] * torch.nn.CrossEntropyLoss(reduction="none")(
            t[:, a:b], tl[:, l])
    loss.mean().backward()
    np.testing.assert_allclose(g_ours, t.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_hsoftmax_gradient_parity_with_torch():
    import jax

    lm = small_labelmap()
    raw = (RNG.randn(4, lm.n_classes) * 1.5).astype(np.float32)
    ll = lm.leaf_paths()[[0, 2, 4, 1]].astype(np.int32)
    norm = make_hierarchical_softmax(lm)

    def loss_ours(x):
        _, leaf_lp = norm(x)
        return hierarchical_softmax_nll(leaf_lp, jnp.array(ll))

    g_ours = np.asarray(jax.grad(loss_ours)(jnp.array(raw)))

    t = torch.tensor(raw, requires_grad=True)
    # torch oracle: per-parent local log_softmax chained, NLL on leaves
    a0, b0 = int(lm.level_start[0]), int(lm.level_stop[0])
    all_lp = [F.log_softmax(t[:, a0:b0], dim=1)]
    for l in range(1, lm.n_levels):
        a = int(lm.level_start[l])
        cols = torch.full((raw.shape[0], lm.levels[l]), 0.0)
        pieces = {}
        for par in range(lm.levels[l - 1]):
            kids = lm.get_children_of(par, l)
            if not kids:
                continue
            local = F.log_softmax(t[:, [a + k for k in kids]], dim=1)
            pieces[par] = (kids, local)
        rows = []
        out = torch.zeros((raw.shape[0], lm.levels[l]), dtype=t.dtype)
        for par, (kids, local) in pieces.items():
            out = out.index_add(
                1, torch.tensor(kids),
                local + all_lp[l - 1][:, par].unsqueeze(1))
        all_lp.append(out)
    leaf_lp = all_lp[-1]
    loss = torch.nn.functional.nll_loss(
        leaf_lp, torch.tensor(ll[:, -1].astype(np.int64)))
    loss.backward()
    np.testing.assert_allclose(g_ours, t.grad.numpy(), rtol=1e-3, atol=1e-5)
