"""Hierarchical classification losses, vectorized for XLA.

The five criteria of the reference (`network/loss.py`), rebuilt as pure
jittable functions. Each factory closes over the labelmap's dense constants
(level offsets, child masks) so the returned function is shape-static and
trace-friendly:

* ``make_multi_level_ce``   — Σ_l w_l · CE(logits[level_l], y_l)
  (reference loss.py:5-38 `MultiLevelCELoss`)
* ``make_last_level_ce``    — softmax over leaves; parent scores are sums
  of child probabilities propagated bottom-up; NLL at every level. The
  per-parent python loops of the reference (loss.py:75-86) become one
  masked matmul per level: probs_l = probs_{l+1} @ M_lᵀ.
* ``make_masked_ce``        — per level, CE restricted to the children of
  the gt parent until the predicted chain makes its first mistake, then
  full-level CE; returns prediction-chain-masked outputs for eval. The
  reference's per-sample python loop (loss.py:123-166) becomes batched
  masked-softmax + a cumulative wrong-prediction flag.
* ``multi_label_soft_margin`` — sigmoid margin loss on the multi-hot
  (reference loss.py:169-178 wrapping torch MultiLabelSoftMarginLoss)
* ``make_hierarchical_softmax`` — per-sibling-group log-softmax chained
  down the tree, from a single (B, n_classes) linear output; replaces the
  reference's ModuleDict of per-parent linears (loss.py:181-240) with one
  padded weight tensor + segment log-sum-exp via child masks.

Conventions: ``logits`` (B, n_classes) over all levels concatenated (leaf
logits (B, n_leaf) for last_level_ce); ``level_labels`` (B, L) relative
per-level integer labels; losses return scalar batch means like the
reference's torch.mean.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_multi_level_ce",
    "make_last_level_ce",
    "make_masked_ce",
    "multi_label_soft_margin",
    "make_hierarchical_softmax",
    "hierarchical_softmax_nll",
]

_NEG_FILL = -1.0e8   # reference loss.py:124 uses -1e8 as the "masked" fill


def _level_slices(labelmap):
    return [
        (int(labelmap.level_start[l]), int(labelmap.level_stop[l]))
        for l in range(labelmap.n_levels)
    ]


def _ce_from_logits(logits, labels, class_weights=None):
    """Per-sample cross entropy −w[y]·log softmax(logits)[y]
    (torch CrossEntropyLoss(weight, reduction='none') semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        nll = nll * class_weights[labels]
    return nll


def make_multi_level_ce(labelmap, level_weights=None, class_weights=None):
    """Σ_l w_l · CE over each level's logit slice; batch mean."""
    slices = _level_slices(labelmap)
    lw = np.ones(labelmap.n_levels) if level_weights is None else np.asarray(level_weights)
    cw = None if class_weights is None else np.asarray(class_weights, np.float32)

    def loss_fn(logits, level_labels):
        total = 0.0
        for l, (a, b) in enumerate(slices):
            w_l = None if cw is None else jnp.asarray(cw[a:b])
            total = total + float(lw[l]) * _ce_from_logits(
                logits[:, a:b], level_labels[:, l], w_l)
        return jnp.mean(total)

    return loss_fn


def make_last_level_ce(labelmap, level_weights=None, class_weights=None):
    """Leaf softmax propagated bottom-up; NLL at every level.

    Returns (all_probs (B, n_classes), scalar loss). Parent probabilities
    are exact sums of their children's (one masked matmul per level)."""
    slices = _level_slices(labelmap)
    lw = np.ones(labelmap.n_levels) if level_weights is None else np.asarray(level_weights)
    masks = [m.astype(np.float32) for m in labelmap.child_masks]
    cw = None if class_weights is None else np.asarray(class_weights, np.float32)
    n_classes = labelmap.n_classes
    L = labelmap.n_levels

    def loss_fn(leaf_logits, level_labels):
        probs = [None] * L
        probs[L - 1] = jax.nn.softmax(leaf_logits, axis=-1)
        for l in range(L - 2, -1, -1):
            probs[l] = probs[l + 1] @ jnp.asarray(masks[l]).T
        total = 0.0
        for l, (a, b) in enumerate(slices):
            logp = jnp.log(jnp.maximum(probs[l], 1e-30))
            nll = -jnp.take_along_axis(logp, level_labels[:, l][:, None], -1)[:, 0]
            if cw is not None:
                nll = nll * jnp.asarray(cw[a:b])[level_labels[:, l]]
            total = total + float(lw[l]) * nll
        all_probs = jnp.concatenate(probs, axis=-1)
        assert all_probs.shape[-1] == n_classes
        return all_probs, jnp.mean(total)

    return loss_fn


def _masked_ce(logits, mask, labels):
    """CE over the candidate subset only: −logit[y] + lse(logits | mask).
    Equal to CE computed on the gathered subset (y must be in the mask)."""
    neg_inf = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask > 0, logits, neg_inf)
    lse = jax.nn.logsumexp(masked, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], -1)[:, 0]
    return lse - picked


def make_masked_ce(labelmap, level_weights=None):
    """Top-down masked CE with first-mistake fallback
    (reference loss.py:101-166 semantics, batched):

    * level 0: CE over the whole level.
    * level l>0, while the *predicted* chain has matched gt so far:
      CE over children of the **gt** parent; after the first mismatch:
      CE over the full level.
    * the returned outputs are _NEG_FILL except at level 0 (all logits) and
      at each level's children-of-**predicted**-parent positions — exactly
      what the reference feeds its evaluator.
    """
    slices = _level_slices(labelmap)
    lw = np.ones(labelmap.n_levels) if level_weights is None else np.asarray(level_weights)
    masks = [m.astype(np.float32) for m in labelmap.child_masks]
    L = labelmap.n_levels

    def loss_fn(logits, level_labels):
        B = logits.shape[0]
        total = jnp.zeros((B,), logits.dtype)
        outputs_new = jnp.full_like(logits, _NEG_FILL)
        wrong_so_far = jnp.zeros((B,), bool)
        pred_prev = None
        for l, (a, b) in enumerate(slices):
            lvl_logits = logits[:, a:b]
            if l == 0:
                loss_l = _ce_from_logits(lvl_logits, level_labels[:, 0])
                pred_l = jnp.argmax(lvl_logits, axis=-1)
                outputs_new = outputs_new.at[:, a:b].set(lvl_logits)
            else:
                M = jnp.asarray(masks[l - 1])
                gt_mask = M[level_labels[:, l - 1]]          # (B, levels[l])
                pred_mask = M[pred_prev]
                loss_masked = _masked_ce(lvl_logits, gt_mask, level_labels[:, l])
                loss_full = _ce_from_logits(lvl_logits, level_labels[:, l])
                loss_l = jnp.where(wrong_so_far, loss_full, loss_masked)
                neg_inf = jnp.finfo(lvl_logits.dtype).min
                pred_l = jnp.argmax(
                    jnp.where(pred_mask > 0, lvl_logits, neg_inf), axis=-1)
                outputs_new = outputs_new.at[:, a:b].set(
                    jnp.where(pred_mask > 0, lvl_logits, _NEG_FILL))
            total = total + float(lw[l]) * loss_l
            wrong_so_far = wrong_so_far | (pred_l != level_labels[:, l])
            pred_prev = pred_l
        # the reference accumulates (1,)-shaped reduction='none' CE terms
        # into one scalar, so its final torch.mean over that 1-element
        # tensor is the batch SUM, not the mean (loss.py:125-166)
        return outputs_new, jnp.sum(total)

    return loss_fn


def multi_label_soft_margin(logits, targets, weight=None):
    """torch MultiLabelSoftMarginLoss: mean over classes of
    −[y·logσ(x) + (1−y)·logσ(−x)], then mean over batch."""
    # log σ(x) = −softplus(−x); log σ(−x) = −softplus(x)
    term = targets * jax.nn.log_sigmoid(logits) + (1.0 - targets) * jax.nn.log_sigmoid(-logits)
    if weight is not None:
        term = term * weight
    return jnp.mean(-jnp.mean(term, axis=-1))


def make_hierarchical_softmax(labelmap):
    """Normalize a raw (B, n_classes) linear output into chained
    hierarchical log-probabilities.

    Per level l>0, each node's logit is log-softmaxed within its sibling
    group (children of one parent) and added to its parent's log-prob —
    the reference's per-parent ModuleDict forward (loss.py:210-240) as
    masked segment log-sum-exp. Returns (all_log_probs, leaf_log_probs)."""
    slices = _level_slices(labelmap)
    masks = [m.astype(np.float32) for m in labelmap.child_masks]
    # relative parent index of each node at level l (l>=1)
    rel_parents = []
    for l in range(1, labelmap.n_levels):
        gstart = labelmap.level_start[l]
        pstart = labelmap.level_start[l - 1]
        rel_parents.append(
            (labelmap.parent_ix[gstart:labelmap.level_stop[l]] - pstart).astype(np.int32))
    L = labelmap.n_levels

    def log_probs_fn(raw):
        out = []
        a, b = slices[0]
        out.append(jax.nn.log_softmax(raw[:, a:b], axis=-1))
        for l in range(1, L):
            a, b = slices[l]
            x = raw[:, a:b]                                   # (B, n_l)
            M = jnp.asarray(masks[l - 1])                     # (n_{l-1}, n_l)
            par = jnp.asarray(rel_parents[l - 1])             # (n_l,)
            # segment max per parent for stability
            neg_inf = jnp.finfo(x.dtype).min
            seg_max = jnp.max(
                jnp.where(M[None] > 0, x[:, None, :], neg_inf), axis=-1)  # (B, n_{l-1})
            shifted = jnp.exp(x - seg_max[:, par])
            seg_sum = shifted @ M.T                            # (B, n_{l-1})
            lse = jnp.log(seg_sum) + seg_max                   # (B, n_{l-1})
            local = x - lse[:, par]
            out.append(local + out[l - 1][:, par])
        all_log_probs = jnp.concatenate(out, axis=-1)
        return all_log_probs, out[-1]

    return log_probs_fn


def hierarchical_softmax_nll(leaf_log_probs, level_labels):
    """NLL on the leaf log-probs (reference loss.py:243-250)."""
    picked = jnp.take_along_axis(leaf_log_probs, level_labels[:, -1][:, None], -1)
    return -jnp.mean(picked)
