"""The batch-eval job: threshold sweep → test pass → metrics/plots/logs.

Call-stack parity with the reference inference path (SURVEY.md §3.2;
reference: orchestrator.py:418-658): model load (strict=False), eval
transforms, binary threshold sweep over val, test eval with live img/s,
accuracy/ROC-AUC/confusion matrix, plots, metrics.jsonl append, console
summary — with the eval loop jitted and batches padded to static shapes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.data.augment import normalize_batch
from deepfakedetection_tpu.data.folder import require_num_classes, scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_eval_loader
from deepfakedetection_tpu.data.transforms import build_eval_plan
from deepfakedetection_tpu.evaluate.metrics import confusion, roc_auc, sweep_threshold
from deepfakedetection_tpu.evaluate.plots import save_confusion_matrix, save_roc_curve
from deepfakedetection_tpu.parallel.mesh import make_mesh, shard_batch
from deepfakedetection_tpu.registry import ModelSpec
from deepfakedetection_tpu.runtime import checkpoint as ckpt
from deepfakedetection_tpu.runtime.logging import append_metrics, console, progress, tee_output
from deepfakedetection_tpu.runtime.paths import RunPaths
from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step


@dataclass
class EvalJob:
    model_name: str
    spec: ModelSpec
    run_paths: RunPaths
    data_root: Path
    split: str = "test"
    val_split: str = "val"
    num_classes: int = 2
    img_size: int = 224
    batch_size: int = 64
    num_workers: int = 4
    weights: Path | None = None
    seed: int | None = None
    eval_toggles: dict[str, Any] = field(default_factory=dict)
    class_labels: dict[str, str] | None = None
    mesh_data: int = -1
    mesh_model: int = 1
    compute_dtype: Any = jnp.bfloat16
    # eval numerics: "bf16" (default) or "int8" — int8 quantizes the ConvBN
    # convs (ops/quant.py) with activation scales calibrated on a few val
    # batches before the sweep; opt-in serving mode, accuracy delta is
    # whatever metrics.jsonl reports vs a bf16 run
    precision: str = "bf16"
    # int8 activation-range statistic (inference.int8_calibration):
    # "absmax" (default) | "percentile" (clip outliers at int8_percentile
    # of |x|) | "per-channel" (per-input-channel absmax). VERDICT r4 #6.
    int8_calibration: str = "absmax"
    int8_percentile: float = 0.999
    # decode batches staged ahead of the consumer (Loader.lookahead);
    # measured A/B in docs/BENCHMARKS.md — 2 wins when the decode pool is
    # narrow, neutral when it is wide
    lookahead: int = 2
    # test-time augmentation: None (reference behavior) or "hflip" —
    # softmax probs averaged over the horizontal flip (train/steps.py)
    tta: str | None = None
    # probability calibration: None (reference behavior) or "temperature" —
    # fit T on the val pass (Guo et al. temperature scaling, exact from
    # saved softmax rows) and report test probabilities/ECE at that T.
    # Binary decisions are unchanged in effect: the transform is monotone
    # and the threshold is swept on the calibrated val distribution.
    calibration: str | None = None
    # extra builder kwargs (e.g. fastervit head_config: "tpu"|"official")
    model_kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class EvalResult:
    metrics: dict[str, Any]
    probs: np.ndarray
    targets: np.ndarray
    preds: np.ndarray
    # split class names (for downstream plots, e.g. evaluate/ensemble.py)
    classes: list[str] = field(default_factory=list)
    # the threshold sweep's val-pass outputs (None when the sweep didn't
    # run); evaluate/ensemble.py re-sweeps on the combined distribution
    val_probs: np.ndarray | None = None
    val_targets: np.ndarray | None = None


_WEIGHTS_RELEASE_BASE = (
    "https://github.com/thourihan/DeepfakeDetection/releases/download/v0.3.0/"
)
# released reference checkpoints — loadable here via runtime/torch_convert.py
_WEIGHTS_NAME_MAP = {
    "efficientnet_b3": "efficientnet_b3_v0.3.0.pth",
    "efficientformerv2_s1": "efficientformerv2_s1_v0.3.0.pth",
    "faster_vit_2_224": "faster_vit_2_224_v0.3.0.pth",
}


def _maybe_download_weights(model_name: str, wpath: Path) -> None:
    """Interactive GitHub-release download for missing weights
    (reference: orchestrator.py:477-502). Non-interactive runs skip unless
    DFD_AUTO_DOWNLOAD=1."""
    import os
    import sys

    asset = _WEIGHTS_NAME_MAP.get(model_name)
    if asset is None:
        return
    if os.environ.get("DFD_AUTO_DOWNLOAD") == "1":
        answer = "y"
    elif getattr(sys.stdin, "isatty", lambda: False)():
        answer = (
            input(f"Missing weights at '{wpath}'. Download from GitHub Releases? [Y/N]: ")
            .strip()
            .lower()
        )
    else:
        return
    if answer not in ("y", "yes"):  # the reference accepts only "y"
        return
    import urllib.request

    wpath.parent.mkdir(parents=True, exist_ok=True)
    try:
        urllib.request.urlretrieve(_WEIGHTS_RELEASE_BASE + asset, str(wpath))
        console.print(f"  downloaded {asset} → {wpath}")
    except Exception as exc:  # zero-egress / offline environments
        console.print(f"[yellow]⚠ download failed: {exc}[/]")


def _is_torch_checkpoint(path: Path) -> bool:
    return ckpt.is_torch_checkpoint(path)


def load_model_for_eval(job: EvalJob):
    """Build + init the model, then load weights (strict=False tolerant).

    For FasterViT, a genuine torch ``.pth`` checkpoint implies the wheel's
    configuration, so ``head_config="official"`` is selected automatically
    unless the config pinned one (ADVICE r1: the official positional scheme
    and head grouping change the function — a converted official checkpoint
    cannot be evaluated correctly through the TPU-mode model).
    """
    model_kwargs = dict(job.model_kwargs)
    wpath = Path(job.weights) if job.weights is not None else None
    if wpath is not None and not wpath.exists():
        _maybe_download_weights(job.model_name, wpath)
    if (
        job.spec.family == "fastervit"
        and "head_config" not in model_kwargs
        and wpath is not None
        and wpath.exists()
        and _is_torch_checkpoint(wpath)
    ):
        model_kwargs["head_config"] = "official"
        console.print(
            "  torch checkpoint detected → faster_vit head_config='official'"
        )
    model = job.spec.builder(job.num_classes, dtype=job.compute_dtype, **model_kwargs)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, job.img_size, job.img_size, 3)
    )
    if wpath is not None:
        if wpath.exists():
            target = {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}
            restored, unmatched = ckpt.load_weights(
                wpath, target, model_family=job.spec.family
            )
            params = restored.get("params", params)
            batch_stats = restored.get("batch_stats", batch_stats)
            if unmatched:
                console.print(
                    f"[yellow]⚠ {len(unmatched)} checkpoint tensors not loaded "
                    f"(strict=False): {unmatched[:5]}…[/]"
                )
        else:
            console.print(f"[yellow]⚠ weights not found at {wpath}; using init weights[/]")
    return model, params, batch_stats


class ProbsCollector:
    """Streams per-batch device probs into host arrays with BOUNDED
    in-flight state (VERDICT r3 weak #6).

    Keeps the last ``combine_every`` batches un-fetched so dispatch runs
    ahead of host conversion (the round-2 dispatch-ahead behavior), but
    drains older batches — fetching this process's rows and applying the
    validity mask — as the loop advances, so a million-image split holds at
    most ``combine_every`` device buffers + the masked result rows instead
    of every padded batch. ``combine_every`` is overridable via
    ``DFD_EVAL_COMBINE_BATCHES`` (0 → combine only at the end, the pre-r4
    behavior)."""

    def __init__(self, combine_every: int | None = None):
        if combine_every is None:
            import os

            combine_every = int(os.environ.get("DFD_EVAL_COMBINE_BATCHES", "64"))
        self.combine_every = combine_every
        self._pending: list[tuple[Any, np.ndarray]] = []
        self._probs: list[np.ndarray] = []
        self._targets: list[np.ndarray] = []
        self.max_pending = 0

    def add(self, device_probs, mask: np.ndarray, labels: np.ndarray) -> None:
        self._pending.append((device_probs, mask))
        self._targets.append(labels[mask])
        self.max_pending = max(self.max_pending, len(self._pending))
        if self.combine_every and len(self._pending) > self.combine_every:
            # drain the oldest (long since computed): no sync on the newest
            self._drain(len(self._pending) - self.combine_every)

    def _drain(self, n: int) -> None:
        from deepfakedetection_tpu.parallel.multihost import local_rows

        for device_probs, mask in self._pending[:n]:
            # pods: fetch only this process's rows of the batch-sharded
            # probs (aligned with its local mask); single-process this is a
            # plain np.asarray
            self._probs.append(np.asarray(local_rows(device_probs))[mask])
        del self._pending[:n]

    def finish(self) -> tuple[np.ndarray, np.ndarray]:
        self._drain(len(self._pending))
        if not self._probs:
            return np.zeros((0, 2)), np.zeros((0,), np.int64)
        return np.concatenate(self._probs), np.concatenate(self._targets)


def _collect_probs(eval_step, params, batch_stats, loader, plan, mesh, compute_dtype):
    collector = ProbsCollector()
    speed = 0.0
    with progress("inference", total=len(loader.dataset)) as advance:
        for batch in loader:
            # numpy goes straight to shard_batch: one correctly-placed transfer
            # (jnp.asarray would commit to device 0 first, then reshard)
            images = shard_batch(mesh, batch.images)
            x = normalize_batch(images, plan, out_dtype=compute_dtype)
            collector.add(eval_step(params, batch_stats, x), batch.mask, batch.labels)
            speed = advance(int(batch.mask.sum()))
    probs, targets = collector.finish()
    # multi-host: each process evaluated a disjoint shard (pipeline._order);
    # re-assemble the full split so metrics/threshold-sweep see everything
    from deepfakedetection_tpu.parallel.multihost import allgather_examples

    return allgather_examples(probs), allgather_examples(targets), speed


def run_eval_job(job: EvalJob) -> EvalResult | None:
    console.print(f"[bold]→ inference {job.model_name}[/]")
    log_path = job.run_paths.logs / "inference.log"
    log_path.unlink(missing_ok=True)
    with tee_output(log_path):
        return _run_eval_job(job)


def _calibration_scope(job: EvalJob, model, params, batch_stats, plan, mesh):
    """(scope, active) for the int8 eval path when requested.

    Calibrates per-ConvBN activation scales over up to 2 val batches
    (falling back to the test split when val is missing, empty, or
    unscannable) — a full-precision pass sowing input absmax
    (ops/quant.py) — then returns the ``quantized_eval`` scope that both
    the threshold sweep and the test pass run inside. ``active`` is False
    when int8 was requested but nothing could be calibrated (no images, or
    zero eligible conv layers): the eval then runs bf16 and must NOT be
    labeled int8 in metrics.
    """
    import contextlib

    if str(job.precision).lower() not in ("int8", "i8"):
        return contextlib.nullcontext(), False
    from deepfakedetection_tpu.ops import quant

    def _scan(split):
        try:
            ds = scan_image_folder(job.data_root / split)
        except FileNotFoundError:
            return None
        return ds if len(ds) > 0 else None

    calib_split, calib_ds = job.val_split, _scan(job.val_split)
    if calib_ds is None:
        calib_split, calib_ds = job.split, _scan(job.split)
    batches = []
    if calib_ds is not None:
        # num_workers=0: a calibration-only Loader with a thread pool would
        # leak the pool for the process lifetime; two batches decode fine
        # sequentially. Batches shard over the SAME mesh as the eval passes
        # (the global batch may exceed one chip's HBM on a data mesh).
        loader = make_eval_loader(
            calib_ds, plan, batch_size=job.batch_size, num_workers=0
        )
        for i, batch in enumerate(loader):
            if i >= 2:
                break
            batches.append(
                normalize_batch(
                    shard_batch(mesh, batch.images), plan, out_dtype=job.compute_dtype
                )
            )
    scales = (
        quant.calibrate_act_scales(
            model, params, batch_stats, batches,
            mode=job.int8_calibration, percentile=job.int8_percentile,
        )
        if batches
        else {}
    )
    if not scales:
        console.print(
            "[yellow]⚠ int8 requested but nothing calibrated "
            f"({'no quantizable conv layers' if batches else 'no calibration images'}) "
            "— staying bf16[/]"
        )
        return contextlib.nullcontext(), False
    mode_note = (
        f" [{job.int8_calibration}"
        + (f"@{job.int8_percentile}" if job.int8_calibration == "percentile" else "")
        + "]"
        if job.int8_calibration != "absmax"
        else ""
    )
    console.print(
        f"  int8 eval: calibrated {len(scales)} conv layers on "
        f"{len(batches)} '{calib_split}' batches{mode_note}"
    )
    return quant.quantized_eval(quant.QuantCtx(scales=scales)), True


def _run_eval_job(job: EvalJob) -> EvalResult | None:
    from deepfakedetection_tpu.runtime import watchdog

    watchdog.enable_for_relay()  # bound relay lost-wakeup hangs (see module)
    console.print(
        f"[bold]Model[/]: {job.model_name} | split={job.split} | batch={job.batch_size}"
    )
    mesh = make_mesh(job.mesh_data, job.mesh_model)
    # batch must divide over the data axis; round up (pad+mask absorbs)
    job.batch_size = -(-job.batch_size // mesh.shape["data"]) * mesh.shape["data"]
    model, params, batch_stats = load_model_for_eval(job)
    eval_step = make_eval_step(model, tta=job.tta)
    plan = build_eval_plan(job.img_size, job.eval_toggles)

    scope, int8_active = _calibration_scope(job, model, params, batch_stats, plan, mesh)
    with scope:
        return _eval_passes(
            job, params, batch_stats, eval_step, plan, mesh,
            int8_active=int8_active,
        )


def _eval_passes(job, params, batch_stats, eval_step, plan, mesh, *, int8_active=False):
    # ---- binary decision-threshold sweep on val (orchestrator.py:513-546)
    best_threshold = 0.5
    vprobs = vtargets = None
    want_calibration = str(job.calibration or "").lower() == "temperature"
    # the val pass feeds the binary threshold sweep; calibration reuses it
    # (and is the only reason to run it for multiclass)
    if job.num_classes == 2 or want_calibration:
        val_path = job.data_root / job.val_split
        if val_path.exists():
            try:
                val_ds = scan_image_folder(val_path)
            except FileNotFoundError:
                val_ds = None
            if val_ds is not None and len(val_ds) > 0:
                val_loader = make_eval_loader(
                    val_ds, plan, batch_size=job.batch_size,
                    num_workers=job.num_workers, lookahead=job.lookahead,
                )
                vprobs, vtargets, _ = _collect_probs(
                    eval_step, params, batch_stats, val_loader, plan, mesh, job.compute_dtype
                )

    # ---- optional temperature calibration (TPU serving extension) ---------
    temperature = None
    if want_calibration:
        if vprobs is not None and vprobs.size:
            from deepfakedetection_tpu.evaluate.metrics import fit_temperature

            temperature = fit_temperature(vprobs, vtargets)
            console.print(f"  calibration: temperature T={temperature:.4f} (fit on val)")
        else:
            console.print(
                "[yellow]⚠ calibration requested but no val pass ran — "
                "probabilities stay uncalibrated[/]"
            )
    if temperature is not None and vprobs is not None and vprobs.size:
        from deepfakedetection_tpu.evaluate.metrics import apply_temperature

        vprobs = apply_temperature(vprobs, temperature)
    if job.num_classes == 2 and vprobs is not None and vprobs.size:
        best_threshold = sweep_threshold(vprobs[:, 1], vtargets)

    # ---- test pass --------------------------------------------------------
    test_path = job.data_root / job.split
    if not test_path.exists():
        console.print(f"[bold red]Split not found:[/] {test_path}")
        raise SystemExit(1)
    test_ds = scan_image_folder(test_path)
    require_num_classes(test_ds, job.num_classes, split=job.split, dataset_root=test_path)
    if len(test_ds) == 0:
        console.print(f"[bold yellow]No images found in[/] {test_path}")
        return None

    loader = make_eval_loader(
        test_ds, plan, batch_size=job.batch_size,
        num_workers=job.num_workers, lookahead=job.lookahead,
    )
    probs, targets, speed = _collect_probs(
        eval_step, params, batch_stats, loader, plan, mesh, job.compute_dtype
    )
    console.print(f"  eval throughput: {speed:.1f} img/s")

    ece_raw = None
    if temperature is not None and probs.size:
        from deepfakedetection_tpu.evaluate.metrics import (
            apply_temperature,
            expected_calibration_error,
        )

        ece_raw = expected_calibration_error(probs, targets)
        probs = apply_temperature(probs, temperature)

    if job.num_classes == 2:
        preds = (probs[:, 1] >= best_threshold).astype(np.int64)
    else:
        preds = probs.argmax(axis=-1)

    accuracy = float((preds == targets).mean()) if targets.size else 0.0
    metrics: dict[str, Any] = {
        "model": job.model_name,
        "split": job.split,
        "accuracy": accuracy,
        "timestamp": datetime.now().isoformat(),
    }
    if np.unique(targets).size > 1:
        auc = (
            roc_auc(targets, probs[:, 1])
            if job.num_classes == 2
            else roc_auc(targets, probs, multi_class=True)
        )
        if auc is not None:
            metrics["roc_auc"] = auc
    if job.num_classes == 2:
        metrics["threshold"] = float(best_threshold)
    if int8_active:
        metrics["precision"] = "int8"
    if temperature is not None:
        from deepfakedetection_tpu.evaluate.metrics import expected_calibration_error

        metrics["temperature"] = float(temperature)
        if ece_raw is not None:
            metrics["ece_uncalibrated"] = ece_raw
            metrics["ece"] = expected_calibration_error(probs, targets)

    cm = confusion(targets, preds, num_classes=job.num_classes)
    metrics["confusion_matrix"] = cm.tolist()
    save_confusion_matrix(cm, test_ds.classes, job.run_paths.plots / "confusion_matrix.png")
    if job.num_classes == 2 and np.unique(targets).size > 1:
        save_roc_curve(targets, probs[:, 1], job.run_paths.plots / "roc_curve.png")

    append_metrics(job.run_paths.logs / "metrics.jsonl", metrics)
    console.print(
        "[bold]Accuracy[/]: "
        f"{accuracy:.4f} "
        + " ".join(
            f"{k}={v:.4f}"
            for k, v in metrics.items()
            if isinstance(v, float) and k != "accuracy"
        )
    )
    # machine-readable one-liner for harness consumption
    console.print(
        json.dumps({"model": job.model_name, "split": job.split, "accuracy": accuracy})
    )
    return EvalResult(
        metrics=metrics, probs=probs, targets=targets, preds=preds,
        classes=list(test_ds.classes), val_probs=vprobs, val_targets=vtargets,
    )
