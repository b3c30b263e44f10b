"""Softmax-averaged multi-model ensembling over batch-eval results.

The reference evaluates each selected model independently and the web UI
shows per-model verdicts side by side (reference: orchestrator.py:661-697,
web_ui.py:241-306); it never combines them. A weighted mean of the
per-model softmax probabilities is the standard way to buy accuracy from
the three heterogeneous backbones at zero training cost, so this is an
opt-in TPU extension (top-level ``ensemble:`` config key; off by default =
reference behavior).

Semantics:

- every member must have evaluated the SAME split with identical targets.
  Eval loaders are deterministic over the dataset scan order, so
  per-sample alignment holds by construction even when members use
  different ``img_size``; any mismatch (per-model ``inference.split``
  overrides, class-count drift) aborts the ensemble with a warning rather
  than combining misaligned rows.
- member probabilities combine as a weighted arithmetic mean of softmax
  outputs. Weights default to uniform, are validated positive by the
  config schema, and are normalized here.
- the binary decision threshold is re-swept on the ENSEMBLE's val
  probabilities (same 501-point balanced-accuracy sweep as a single model,
  reference orchestrator.py:513-546) — reusing a member's threshold would
  be miscalibrated for the averaged distribution. If any member lacks a
  val pass, the ensemble falls back to 0.5 exactly like a single model.
- metrics/plots/jsonl land in their own run dir (default
  ``runs/ensemble/<ts>/``) with the same record fields as a single model,
  under ``"model": "ensemble"`` plus a ``"members"`` list.
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Any

import numpy as np

from deepfakedetection_tpu.evaluate.job import EvalResult
from deepfakedetection_tpu.evaluate.metrics import confusion, roc_auc, sweep_threshold
from deepfakedetection_tpu.evaluate.plots import save_confusion_matrix, save_roc_curve
from deepfakedetection_tpu.runtime.logging import append_metrics, console
from deepfakedetection_tpu.runtime.paths import RunPaths


def combine_probs(
    results: dict[str, EvalResult], weights: dict[str, float] | None, attr: str
) -> np.ndarray | None:
    """Weighted mean of ``attr`` ("probs" or "val_probs") across members.

    Returns None when any member is missing the array or shapes disagree.
    """
    names = list(results)
    arrays = [getattr(results[n], attr) for n in names]
    if any(a is None for a in arrays):
        return None
    if len({a.shape for a in arrays}) != 1:
        return None
    w = np.asarray([float((weights or {}).get(n, 1.0)) for n in names], np.float64)
    w = w / w.sum()
    return np.tensordot(w, np.stack(arrays).astype(np.float64), axes=1)


def run_ensemble(
    results: dict[str, EvalResult],
    run_paths: RunPaths,
    *,
    num_classes: int,
    weights: dict[str, float] | None = None,
) -> dict[str, Any] | None:
    """Combine ≥2 member results into ensemble metrics/plots/jsonl.

    Returns the metrics record, or None when the ensemble cannot be formed
    (fewer than two members, mismatched splits, or misaligned targets).
    """
    members = {n: r for n, r in results.items() if r is not None}
    if len(members) < 2:
        console.print("[yellow]⚠ ensemble skipped: fewer than two evaluated models[/]")
        return None
    names = list(members)
    first = members[names[0]]
    splits = {r.metrics.get("split") for r in members.values()}
    if len(splits) != 1:
        console.print(
            f"[yellow]⚠ ensemble skipped: members evaluated different splits {sorted(splits)}[/]"
        )
        return None
    for n in names[1:]:
        t = members[n].targets
        if t.shape != first.targets.shape or not np.array_equal(t, first.targets):
            console.print(
                f"[yellow]⚠ ensemble skipped: target rows of '{n}' do not align "
                f"with '{names[0]}'[/]"
            )
            return None

    probs = combine_probs(members, weights, "probs")
    if probs is None:
        console.print("[yellow]⚠ ensemble skipped: member probabilities misaligned[/]")
        return None
    targets = first.targets

    # threshold: re-swept on the ensemble's val distribution (binary only)
    best_threshold = 0.5
    val_probs = combine_probs(members, weights, "val_probs")
    vt = [members[n].val_targets for n in names]
    val_aligned = (
        val_probs is not None
        and all(v is not None for v in vt)
        and all(np.array_equal(v, vt[0]) for v in vt[1:])
    )
    if num_classes == 2 and val_aligned and val_probs.size:
        best_threshold = sweep_threshold(val_probs[:, 1], vt[0])

    if num_classes == 2:
        preds = (probs[:, 1] >= best_threshold).astype(np.int64)
    else:
        preds = probs.argmax(axis=-1)

    accuracy = float((preds == targets).mean()) if targets.size else 0.0
    metrics: dict[str, Any] = {
        "model": "ensemble",
        "members": names,
        "split": first.metrics.get("split"),
        "accuracy": accuracy,
        "timestamp": datetime.now().isoformat(),
    }
    if weights:
        metrics["weights"] = {n: float(weights.get(n, 1.0)) for n in names}
    if np.unique(targets).size > 1:
        auc = (
            roc_auc(targets, probs[:, 1])
            if num_classes == 2
            else roc_auc(targets, probs, multi_class=True)
        )
        if auc is not None:
            metrics["roc_auc"] = auc
    if num_classes == 2:
        metrics["threshold"] = float(best_threshold)

    cm = confusion(targets, preds, num_classes=num_classes)
    metrics["confusion_matrix"] = cm.tolist()
    classes = first.classes or [str(i) for i in range(num_classes)]
    save_confusion_matrix(cm, classes, run_paths.plots / "confusion_matrix.png")
    if num_classes == 2 and np.unique(targets).size > 1:
        save_roc_curve(targets, probs[:, 1], run_paths.plots / "roc_curve.png")

    append_metrics(run_paths.logs / "metrics.jsonl", metrics)
    console.print(
        f"[bold]Ensemble[/] ({', '.join(names)}): accuracy {accuracy:.4f} "
        + " ".join(
            f"{k}={v:.4f}"
            for k, v in metrics.items()
            if isinstance(v, float) and k != "accuracy"
        )
    )
    console.print(
        json.dumps({"model": "ensemble", "split": metrics["split"], "accuracy": accuracy})
    )
    return metrics
