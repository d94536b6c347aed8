"""Multi-label evaluation with per-class threshold tuning.

Rebuilds `MultiLabelEvaluation` / `MultiLabelEvaluationSingleThresh` /
`Metrics` (reference evaluation.py:129-481):

* per-class PR curves + AP / mAP over sigmoid-style scores,
* per-class decision thresholds tuned on val to maximize F1
  (set_optimal_thresholds, evaluation.py:345-381),
* binary per-class confusion stats at the tuned thresholds; macro = mean
  over the class subset, micro from the summed 2×2 cmat,
* the reference's idiosyncratic `accuracy` (mean predicted value at
  positions whose gt is 1 — i.e. recall of the multi-hot) is preserved as
  `accuracy_score` (evaluation.py:178-181),
* single shared-threshold variant over the flattened score matrix.

All vectorized numpy (host eval path; sklearn only for PR-curve parity).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from sklearn.metrics import average_precision_score, precision_recall_curve

__all__ = [
    "per_class_pr",
    "tune_per_class_thresholds",
    "tune_single_threshold",
    "multilabel_metrics",
]


def _f1(p, r):
    p, r = np.asarray(p), np.asarray(r)
    return (p * r) * 2 / (p + r + 1e-6)   # reference get_f1score epsilon


def per_class_pr(scores: np.ndarray, multihot: np.ndarray,
                 compute_ap: bool = True):
    """Per-class (precision, recall, thresholds, AP) + mAP. Zero-support
    classes get EMPTY curves (so downstream `len(t) == 0` guards fire) and
    AP 0.0. compute_ap=False skips the per-class average_precision_score
    (threshold tuning only needs the curves — the AP pass roughly doubles
    the sklearn work at 723 classes per val epoch)."""
    out = {}
    aps = []
    empty = np.array([], np.float64)
    for c in range(scores.shape[1]):
        y = multihot[:, c]
        if y.sum() == 0:
            out[c] = (empty, empty, empty, 0.0)
            aps.append(0.0)
            continue
        p, r, t = precision_recall_curve(y, scores[:, c])
        ap = (average_precision_score(y, scores[:, c]) if compute_ap
              else 0.0)
        out[c] = (p, r, t, ap)
        aps.append(ap)
    return out, float(np.mean(aps))


def tune_per_class_thresholds(scores: np.ndarray, multihot: np.ndarray) -> np.ndarray:
    """Best-F1 threshold per class from its PR curve (val calibration)."""
    curves, _ = per_class_pr(scores, multihot, compute_ap=False)
    th = np.zeros(scores.shape[1], np.float64)
    for c, (p, r, t, ap) in curves.items():
        if len(t) == 0:
            continue
        f1 = _f1(p, r)
        best = int(np.argmax(f1))
        th[c] = t[min(best, len(t) - 1)]
    return th


def tune_single_threshold(scores: np.ndarray, multihot: np.ndarray) -> float:
    """One shared threshold over the flattened matrix maximizing F1
    (MultiLabelEvaluationSingleThresh, evaluation.py:440-481).
    Predicted positive = score >= t."""
    s = scores.reshape(-1)
    y = multihot.reshape(-1) > 0
    order = np.argsort(-s)                       # descending
    s_sorted = s[order]
    tp = np.cumsum(y[order])
    fp = np.cumsum(~y[order])
    # with score >= t semantics a run of TIED scores is all-or-nothing:
    # only the LAST position of each tied run is an attainable operating
    # point (mid-run cumsums describe predictions no threshold can make)
    last_of_run = np.ones(len(s_sorted), bool)
    last_of_run[:-1] = s_sorted[:-1] != s_sorted[1:]
    tp, fp = tp[last_of_run], fp[last_of_run]
    prec = tp / np.maximum(tp + fp, 1)
    rec = tp / max(y.sum(), 1)
    f1 = _f1(prec, rec)
    return float(s_sorted[last_of_run][int(np.argmax(f1))])


def _binary_stats(pred: np.ndarray, corr: np.ndarray, idx) -> Dict[str, np.ndarray]:
    p = pred[:, idx].astype(bool)
    c = corr[:, idx].astype(bool)
    tp = (p & c).sum(0).astype(np.float64)
    fp = (p & ~c).sum(0).astype(np.float64)
    fn = (~p & c).sum(0).astype(np.float64)
    tn = (~p & ~c).sum(0).astype(np.float64)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def multilabel_metrics(
    scores: np.ndarray,
    multihot: np.ndarray,
    thresholds,
    labelmap,
) -> Dict[str, object]:
    """Global + per-level metrics at the given threshold(s).

    thresholds: scalar (single-threshold variant) or (n_classes,)."""
    th = np.broadcast_to(np.asarray(thresholds, np.float64),
                         (scores.shape[1],))
    pred = scores >= th[None, :]
    corr = multihot > 0

    def subset(idx, degenerate_one=False):
        # per-level metrics go through the reference's MetricsMultiLevel
        # (degenerate classes -> 1.0, evaluation.py:518-522); the global
        # block keeps the sklearn 0.0 convention like the reference's
        # Metrics class
        from .metrics import prf1_from_counts

        s = _binary_stats(pred, corr, idx)
        prec, rec, f1 = prf1_from_counts(
            s["tp"], s["tp"] + s["fp"], s["tp"] + s["fn"],
            degenerate_one=degenerate_one)
        Tp, Fp, Fn = s["tp"].sum(), s["fp"].sum(), s["fn"].sum()
        micro_p = Tp / max(Tp + Fp, 1)
        micro_r = Tp / max(Tp + Fn, 1)
        micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)
                    if micro_p + micro_r > 0 else 0.0)
        # reference accuracy_score: mean predicted value where gt == 1
        mask = corr[:, idx]
        acc = float(pred[:, idx][mask].mean()) if mask.any() else 0.0
        return {
            "macro": {"precision": float(prec.mean()),
                      "recall": float(rec.mean()), "f1": float(f1.mean())},
            "micro": {"precision": float(micro_p), "recall": float(micro_r),
                      "f1": float(micro_f1)},
            "precision": prec, "recall": rec, "f1": f1,
            "tp": s["tp"], "fp": s["fp"], "fn": s["fn"], "tn": s["tn"],
            "accuracy_score": acc,
        }

    out: Dict[str, object] = {"global": subset(np.arange(scores.shape[1]))}
    for l, name in enumerate(labelmap.level_names):
        a, b = int(labelmap.level_start[l]), int(labelmap.level_stop[l])
        out[name] = subset(np.arange(a, b), degenerate_one=True)
    return out


def render_pr_curves(scores: np.ndarray, multihot: np.ndarray, class_names,
                     out_dir: str, max_classes: int = 32):
    """Precision/recall/F1-vs-threshold plots per class (the reference's
    plot_prec_recall_vs_thresh, evaluation.py:119-126), capped to the
    `max_classes` highest-support classes at ETHEC scale."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    support = multihot.sum(axis=0)
    order = np.argsort(-support)[:max_classes]
    curves, mAP = per_class_pr(scores, multihot)
    written = []
    for c in order:
        p, r, t, ap = curves[int(c)]
        if len(t) == 0:
            continue
        f1 = _f1(p, r)
        fig, ax = plt.subplots()
        ax.plot(t, p[:-1], "b:", label="precision")
        ax.plot(t, r[:-1], "r:", label="recall")
        ax.plot(t, f1[:-1], "g:", label="f1-score")
        ax.set_xlabel("threshold")
        ax.set_ylim([0, 1])
        ax.legend(loc="upper left")
        name = str(class_names[int(c)])
        ax.set_title(f"P/R vs threshold — {name} (AP {ap:.3f})")
        path = os.path.join(out_dir, f"prec_recall_{name}.png")
        fig.savefig(path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        written.append(path)
    return written, mAP


def render_score_vs_freq(per_class_score: np.ndarray, train_freq: np.ndarray,
                         out_path: str, title: str = "F1 vs train frequency"):
    """Score-vs-train-frequency scatter with marginal histograms
    (reference make_score_vs_freq_hist, evaluation.py:289-340)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(train_freq, float)
    y = np.asarray(per_class_score, float)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_axes([0.1, 0.1, 0.65, 0.65])
    axx = fig.add_axes([0.1, 0.77, 0.65, 0.18], sharex=ax)
    axy = fig.add_axes([0.77, 0.1, 0.18, 0.65], sharey=ax)
    ax.scatter(x, y, s=10, alpha=0.6)
    axx.hist(x, bins=30)
    axy.hist(y, bins=30, orientation="horizontal")
    axx.tick_params(labelbottom=False)
    axy.tick_params(labelleft=False)
    ax.set_xlabel("train frequency")
    ax.set_ylabel("score")
    axx.set_title(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=110)
    plt.close(fig)
    return out_path
