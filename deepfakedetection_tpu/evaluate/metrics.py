"""Metric computation: accuracy, ROC-AUC, confusion matrix, threshold sweep.

Output-parity with the reference (orchestrator.py:513-546, 609-647), with the
501-point balanced-accuracy threshold sweep vectorized into one matrix op
instead of a python loop (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np


def sweep_threshold(scores: np.ndarray, targets: np.ndarray) -> float:
    """Best-of-501 threshold in [0,1] maximizing balanced accuracy.

    Mirrors orchestrator.py:536-545 (ascending scan, strict improvement →
    lowest threshold wins ties; default 0.5 when degenerate).
    """
    scores = np.asarray(scores, np.float64)
    targets = np.asarray(targets, np.int64)
    if scores.size == 0 or np.unique(targets).size < 2:
        return 0.5
    thresholds = np.linspace(0.0, 1.0, 501)
    preds = scores[:, None] >= thresholds[None, :]  # [N, 501]
    pos = targets == 1
    n_pos = max(int(pos.sum()), 1)
    n_neg = max(int((~pos).sum()), 1)
    tpr = preds[pos].sum(axis=0) / n_pos
    tnr = (~preds[~pos]).sum(axis=0) / n_neg
    balanced = (tpr + tnr) / 2.0
    return float(thresholds[int(np.argmax(balanced))])


def expected_calibration_error(
    probs: np.ndarray, targets: np.ndarray, n_bins: int = 15
) -> float:
    """ECE over max-probability confidence (equal-width bins, Guo et al. '17).

    TPU-framework serving extension (the reference reports no calibration
    metrics): production deepfake pipelines act on the *probability* (review
    queues, score fusion), so how honest the softmax confidence is matters
    beyond accuracy. ``probs`` is [N, C] softmax rows.
    """
    probs = np.asarray(probs, np.float64)
    targets = np.asarray(targets, np.int64)
    if probs.size == 0:
        return 0.0
    conf = probs.max(axis=-1)
    correct = probs.argmax(axis=-1) == targets
    # right-inclusive bins over (0, 1]; conf >= 1/C > 0 so digitize is safe
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    idx = np.clip(np.digitize(conf, edges[1:-1], right=True), 0, n_bins - 1)
    ece = 0.0
    for b in range(n_bins):
        in_bin = idx == b
        n = int(in_bin.sum())
        if n == 0:
            continue
        ece += (n / len(conf)) * abs(correct[in_bin].mean() - conf[in_bin].mean())
    return float(ece)


def fit_temperature(
    probs: np.ndarray, targets: np.ndarray, bounds: tuple[float, float] = (0.05, 20.0)
) -> float:
    """Temperature that minimizes NLL of ``softmax(logits / T)`` on held-out
    rows (Guo et al. '17 temperature scaling).

    Works from saved softmax probs: ``log(p)`` equals the logits up to a
    per-row constant, and softmax is invariant to per-row constants, so the
    fit is exact without re-running the model. Scalar golden-section search
    over log-T (the NLL is unimodal in T for a fixed direction).

    Caveat (ADVICE r3): exactness holds for raw single-pass softmax rows
    only. Under TTA the rows are AVERAGES of two softmaxes (log(p) is no
    longer a shifted logit), and rows that hit the 1e-12 clip are perturbed;
    in those cases the fit is a self-consistent monotone recalibration of
    the served rows rather than exact logit temperature scaling — still
    well-defined, and binary threshold decisions remain consistent because
    the same transform is applied to both val and test rows.
    """
    probs = np.asarray(probs, np.float64)
    targets = np.asarray(targets, np.int64)
    if probs.size == 0:
        return 1.0
    logit = np.log(np.clip(probs, 1e-12, 1.0))

    def nll(log_t: float) -> float:
        z = logit / np.exp(log_t)
        z = z - z.max(axis=-1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
        return float(-logp[np.arange(len(targets)), targets].mean())

    lo, hi = np.log(bounds[0]), np.log(bounds[1])
    inv_phi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - inv_phi * (b - a), a + inv_phi * (b - a)
    fc, fd = nll(c), nll(d)
    for _ in range(60):  # |b-a| shrinks ~0.618^60: far below fp tolerance
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - inv_phi * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + inv_phi * (b - a)
            fd = nll(d)
    return float(np.exp((a + b) / 2.0))


def apply_temperature(probs: np.ndarray, temperature: float) -> np.ndarray:
    """Re-softmax saved probability rows at ``temperature`` (exact — see
    fit_temperature). T=1 is the identity up to clipping noise."""
    probs = np.asarray(probs, np.float64)
    if probs.size == 0 or temperature == 1.0:
        return probs
    z = np.log(np.clip(probs, 1e-12, 1.0)) / float(temperature)
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def confusion(targets: np.ndarray, preds: np.ndarray, num_classes: int | None = None) -> np.ndarray:
    """Confusion matrix sized to cover every RAW label value (indexing is by
    label, so missing/non-contiguous classes must not shrink the matrix)."""
    targets = np.asarray(targets, np.int64)
    preds = np.asarray(preds, np.int64)
    max_label = int(max(targets.max(initial=-1), preds.max(initial=-1)))
    n = max(num_classes or 0, max_label + 1, 1)
    cm = np.zeros((n, n), dtype=np.int64)
    for t, p in zip(targets, preds):
        cm[int(t), int(p)] += 1
    return cm


def roc_auc(targets: np.ndarray, scores: np.ndarray, *, multi_class: bool = False) -> float | None:
    """ROC-AUC via sklearn when available (reference uses sklearn directly)."""
    try:
        from sklearn.metrics import roc_auc_score

        if multi_class:
            return float(roc_auc_score(targets, scores, multi_class="ovr"))
        return float(roc_auc_score(targets, scores))
    except ValueError:
        return None
    except ImportError:  # pragma: no cover
        return _binary_auc(targets, scores) if not multi_class else None


def _binary_auc(targets: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC fallback (Mann-Whitney U)."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = scores[order]
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            avg = (i + j + 2) / 2.0
            ranks[order[i : j + 1]] = avg
        i = j + 1
    pos = targets == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
