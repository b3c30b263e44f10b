"""Plot files: confusion_matrix.png and roc_curve.png.

Matches the reference's plot surface (orchestrator.py:398-415): sklearn
ConfusionMatrixDisplay with Blues cmap on a 6x5 figure, RocCurveDisplay with
"ROC Curve" title. Gated on matplotlib/sklearn availability.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _primary() -> bool:
    """Multihost: one writer per shared run dir (inputs are allgathered, so
    every process would render the identical file)."""
    import jax

    return jax.process_index() == 0


def save_confusion_matrix(cm: np.ndarray, labels: list[str], path: Path) -> bool:
    if not _primary():
        return False
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.metrics import ConfusionMatrixDisplay
    except ImportError:  # pragma: no cover
        return False
    disp = ConfusionMatrixDisplay(confusion_matrix=cm, display_labels=labels)
    fig, ax = plt.subplots(figsize=(6, 5))
    disp.plot(ax=ax, cmap="Blues", colorbar=False)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return True


def save_roc_curve(y_true: np.ndarray, y_scores: np.ndarray, path: Path) -> bool:
    if not _primary():
        return False
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.metrics import RocCurveDisplay
    except ImportError:  # pragma: no cover
        return False
    fig, ax = plt.subplots(figsize=(6, 5))
    RocCurveDisplay.from_predictions(y_true, y_scores, ax=ax)
    ax.set_title("ROC Curve")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return True
