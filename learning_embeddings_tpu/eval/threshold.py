"""Decision-threshold calibration for edge energies.

The reference sweeps every unique energy value as a candidate threshold and
picks the best F1 with a `multiprocessing.Pool` of up to 512 workers
(order_embeddings.py:250-306, oe_h.py:447-503). Here the sweep is a sort +
two searchsorteds — O((P+N) log(P+N)) on device, no host processes.

Classification rule (reference `calculate_best`): positive-pair energies
``<= t`` are correct positives, negative-pair energies ``> t`` are correct
negatives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ThresholdMetrics", "best_threshold_metrics", "threshold_metrics"]


class ThresholdMetrics(NamedTuple):
    f1: jnp.ndarray
    threshold: jnp.ndarray
    accuracy: jnp.ndarray
    precision: jnp.ndarray
    recall: jnp.ndarray
    correct_positives: jnp.ndarray
    correct_negatives: jnp.ndarray


def _metrics_at(cp, cn, n_pos, n_neg):
    accuracy = (cp + cn) / (n_pos + n_neg)
    den = cp + (n_neg - cn)
    precision = jnp.where(den > 0, cp / jnp.maximum(den, 1), 0.0)
    recall = cp / jnp.maximum(n_pos, 1)
    pr = precision + recall
    f1 = jnp.where(pr > 0, 2.0 * precision * recall / jnp.maximum(pr, 1e-30), 0.0)
    return f1, accuracy, precision, recall


@jax.jit
def best_threshold_metrics(e_pos: jnp.ndarray, e_neg: jnp.ndarray) -> ThresholdMetrics:
    """Exact best-F1 threshold over all candidate energies.

    Candidates are every observed energy (duplicates share identical metric
    values, so the arg-max over the sorted array equals the reference's
    arg-max over np.unique). Ties resolve to the smallest threshold."""
    e_pos = e_pos.reshape(-1).astype(jnp.float32)
    e_neg = e_neg.reshape(-1).astype(jnp.float32)
    n_pos, n_neg = e_pos.shape[0], e_neg.shape[0]
    cand = jnp.sort(jnp.concatenate([e_pos, e_neg]))
    pos_sorted = jnp.sort(e_pos)
    neg_sorted = jnp.sort(e_neg)
    cp = jnp.searchsorted(pos_sorted, cand, side="right").astype(jnp.float32)
    below_neg = jnp.searchsorted(neg_sorted, cand, side="right").astype(jnp.float32)
    cn = n_neg - below_neg
    f1, accuracy, precision, recall = _metrics_at(cp, cn, n_pos, n_neg)
    best = jnp.argmax(f1)  # first max = smallest threshold achieving it
    return ThresholdMetrics(
        f1=f1[best],
        threshold=cand[best],
        accuracy=accuracy[best],
        precision=precision[best],
        recall=recall[best],
        correct_positives=cp[best],
        correct_negatives=cn[best],
    )


@jax.jit
def threshold_metrics(e_pos, e_neg, threshold) -> ThresholdMetrics:
    """Metrics at a fixed (val-calibrated) threshold — the reference's test
    path (order_embeddings.py:289-306)."""
    e_pos = e_pos.reshape(-1).astype(jnp.float32)
    e_neg = e_neg.reshape(-1).astype(jnp.float32)
    n_pos, n_neg = e_pos.shape[0], e_neg.shape[0]
    cp = jnp.sum(e_pos <= threshold).astype(jnp.float32)
    cn = jnp.sum(e_neg > threshold).astype(jnp.float32)
    f1, accuracy, precision, recall = _metrics_at(cp, cn, n_pos, n_neg)
    return ThresholdMetrics(f1, jnp.asarray(threshold, jnp.float32), accuracy,
                            precision, recall, cp, cn)
