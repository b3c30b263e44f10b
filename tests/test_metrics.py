"""Eval metrics: threshold sweep vs sklearn reference loop, confusion, AUC."""

import numpy as np
import pytest

from deepfakedetection_tpu.evaluate.metrics import (
    _binary_auc,
    confusion,
    roc_auc,
    sweep_threshold,
)


def _reference_sweep(scores, targets):
    """The reference's literal python loop (orchestrator.py:536-545)."""
    from sklearn.metrics import balanced_accuracy_score

    thresholds = np.linspace(0.0, 1.0, 501, dtype=np.float64)
    best_bal, chosen = -1.0, 0.5
    for thr in thresholds:
        preds = (scores >= thr).astype(np.int64)
        bal = balanced_accuracy_score(targets, preds)
        if bal > best_bal:
            best_bal, chosen = float(bal), float(thr)
    return chosen


def test_sweep_matches_reference_loop():
    rng = np.random.default_rng(0)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        targets = rng.integers(0, 2, 200)
        # correlated but noisy scores
        scores = np.clip(targets * 0.4 + rng.normal(0.3, 0.25, 200), 0, 1)
        assert sweep_threshold(scores, targets) == pytest.approx(
            _reference_sweep(scores, targets), abs=1e-12
        )


def test_sweep_degenerate_cases():
    assert sweep_threshold(np.array([]), np.array([])) == 0.5
    assert sweep_threshold(np.array([0.5, 0.6]), np.array([1, 1])) == 0.5


def test_confusion_matrix():
    t = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    cm = confusion(t, p)
    np.testing.assert_array_equal(cm, [[1, 1], [1, 2]])


def test_auc_fallback_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(3)
    targets = rng.integers(0, 2, 300)
    scores = np.clip(targets * 0.3 + rng.normal(0.4, 0.3, 300), 0, 1)
    assert _binary_auc(targets, scores) == pytest.approx(
        roc_auc_score(targets, scores), abs=1e-9
    )
    assert roc_auc(targets, scores) == pytest.approx(
        roc_auc_score(targets, scores), abs=1e-9
    )


def test_confusion_handles_missing_and_noncontiguous_classes():
    from deepfakedetection_tpu.evaluate.metrics import confusion

    # class 1 absent entirely: matrix must still be num_classes-sized and
    # indexable by raw label values
    t = np.asarray([0, 2, 2, 0])
    p = np.asarray([0, 2, 0, 2])
    cm = confusion(t, p, num_classes=3)
    assert cm.shape == (3, 3)
    assert cm[0, 0] == 1 and cm[2, 2] == 1 and cm[2, 0] == 1 and cm[0, 2] == 1
    # degenerate binary case: everything one class, still 2x2
    cm2 = confusion(np.zeros(4, np.int64), np.zeros(4, np.int64), num_classes=2)
    assert cm2.shape == (2, 2) and cm2[0, 0] == 4
    # without num_classes, sized to the max raw label
    assert confusion(t, p).shape == (3, 3)
