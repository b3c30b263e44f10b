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
