"""Orchestration: config → per-model run dirs → train/eval job dispatch.

Call-stack parity with the reference (SURVEY.md §3.1-3.2; reference:
orchestration/orchestrator.py:661-713): load+validate config, seed, iterate
``selection`` (skipping unknown names with a warning), fresh timestamped run
dir + config snapshot per model, then dispatch by mode. The reference's
env-var relay into trainer modules (orchestrator.py:183-283) is replaced by
typed ``TrainJob``/``EvalJob`` objects — same YAML keys, same defaults.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

from deepfakedetection_tpu.config import load_config
from deepfakedetection_tpu.data.transforms import resolve_transform_mapping
from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
from deepfakedetection_tpu.registry import get_model_spec
from deepfakedetection_tpu.runtime.logging import console
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs, snapshot_config
from deepfakedetection_tpu.runtime.seeding import apply_seed
from deepfakedetection_tpu.train.loop import TrainJob, run_training


def _resolve_path(value: str | Path) -> Path:
    p = Path(value).expanduser()
    return p if p.is_absolute() else (Path.cwd() / p).resolve()


def _parse_resume(value: Any) -> bool:
    """training.resume ∈ {1, true, "auto"} enables auto-resume
    (orchestrator.py:246-249)."""
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return bool(value)
    if isinstance(value, str):
        # "continue" (TPU extension) also reuses the newest existing run dir
        # — see _resolve_run_paths
        return value.strip().lower() in ("1", "true", "auto", "yes", "continue")
    return False


def _parse_unfreeze(value: Any) -> str | tuple[str, ...] | None:
    """training.unfreeze: "all", a substring, or a list of substrings
    (UNFREEZE_KEYS semantics); None defers to the model recipe."""
    if value is None:
        return None
    if isinstance(value, str):
        v = value.strip()
        if not v:
            raise SystemExit("training.unfreeze must not be empty")
        return "all" if v.lower() == "all" else (v,)
    subs = tuple(str(s).strip() for s in value)
    if not subs or any(not s for s in subs):
        raise SystemExit(
            "training.unfreeze must be 'all' or a non-empty list of "
            "parameter-name substrings"
        )
    return subs


def _resolve_run_paths(model_cfg: dict[str, Any], output_dir: Path, mode: str):
    """Fresh timestamped run dir per invocation (reference semantics,
    orchestrator.py:682-684) — unless ``training.resume: continue``.

    TPU extension: the reference's RESUME_AUTO can never fire through the
    CLI because every invocation makes a new timestamped dir, so the
    latest.ckpt it looks for is always absent (ref train_env.py:182-185 +
    orchestrator.py:138-145). ``resume: continue`` reuses the NEWEST
    existing run dir that holds a ``checkpoints/latest.ckpt``, which makes
    both epoch-level resume and mid-epoch preemption resume
    (runtime/preempt.py) real from ``python train.py``. All reference
    resume spellings (1/true/auto) keep reference behavior.
    """
    train_cfg = (model_cfg.get("training") or {}) if mode == "training" else {}
    resume_val = str(train_cfg.get("resume") or "").strip().lower()
    if resume_val == "continue" and output_dir.exists():
        runs = sorted(
            d for d in output_dir.iterdir()
            if d.is_dir() and (d / "checkpoints" / "latest.ckpt").exists()
        )
        if runs:
            console.print(f"  resume: continue → reusing run dir {runs[-1]}")
            return ensure_run_dirs(output_dir, run_id=runs[-1].name)
    return ensure_run_dirs(output_dir)


def _apply_device_preference(device: str | None) -> None:
    """Honor the YAML ``device`` key (reference: orchestrator.py:463-469
    resolves device with a cuda→cpu fallback; here JAX picks the platform
    and ``device: cpu`` forces the CPU backend)."""
    if not device:
        return
    import jax

    if device.lower().startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            console.print("[yellow]⚠ could not force CPU (backend already initialized)[/]")
    # "tpu"/"cuda"/anything else: let JAX use the best available backend;
    # if no accelerator is present JAX falls back to CPU by itself.


def _mesh_dims(config: dict[str, Any]) -> tuple[int, int]:
    mesh = config.get("mesh") or {}
    data = int(mesh.get("data", -1) if mesh.get("data") is not None else -1)
    model = int(mesh.get("model", 1) if mesh.get("model") is not None else 1)
    if data == 0 or data < -1 or model < 1:
        raise ValueError(
            f"invalid mesh config data={data} model={model}: data must be -1 "
            "(all remaining devices) or >= 1, model must be >= 1"
        )
    return data, model


def _compute_dtype(config: dict[str, Any]):
    """Map the (validated) top-level ``precision`` key to a compute dtype."""
    import jax.numpy as jnp

    precision = str(config.get("precision") or "bfloat16").lower()
    return {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float32": jnp.float32,
        "fp32": jnp.float32,
    }[precision]


def _model_kwargs(model_cfg: dict[str, Any]) -> dict[str, Any]:
    """Extra builder kwargs from the model block (e.g. ``head_config``)."""
    kw = dict(model_cfg.get("model_kwargs") or {})
    if model_cfg.get("head_config"):
        kw["head_config"] = model_cfg["head_config"]
    return kw


def build_train_job(
    config: dict[str, Any], model_name: str, model_cfg: dict[str, Any], run_paths
) -> TrainJob:
    spec = get_model_spec(model_name)
    data_cfg = config.get("data", {})
    train_cfg = model_cfg.get("training") or {}
    img_size = int(
        train_cfg.get("img_size")
        or data_cfg.get("img_size")
        or spec.default_image_size
    )
    mesh_data, mesh_model = _mesh_dims(config)
    return TrainJob(
        model_name=model_name,
        spec=spec,
        run_paths=run_paths,
        data_root=_resolve_path(data_cfg.get("root", "data")),
        train_split=data_cfg.get("train_split", "train"),
        val_split=data_cfg.get("val_split", "val"),
        num_classes=int(model_cfg.get("num_classes", data_cfg.get("num_classes", 2))),
        img_size=img_size,
        batch_size=int(train_cfg.get("batch_size", 64)),
        epochs=int(train_cfg.get("epochs", 10)),
        num_workers=int(train_cfg.get("num_workers", 4)),
        lr=(float(train_cfg["lr"]) if train_cfg.get("lr") is not None else None),
        weight_decay=(
            float(train_cfg["weight_decay"])
            if train_cfg.get("weight_decay") is not None
            else None
        ),
        accum_steps=(
            int(train_cfg["accum_steps"])
            if train_cfg.get("accum_steps") is not None
            else None
        ),
        warmup_epochs=(
            int(train_cfg["warmup_epochs"])
            if train_cfg.get("warmup_epochs") is not None
            else None
        ),
        early_stop_patience=(
            int(train_cfg["early_stop_patience"])
            if train_cfg.get("early_stop_patience") is not None
            else None
        ),
        resume_auto=_parse_resume(train_cfg.get("resume")),
        init_weights=(
            _resolve_path(train_cfg["init_weights"])
            if train_cfg.get("init_weights")
            else None
        ),
        unfreeze=_parse_unfreeze(train_cfg.get("unfreeze")),
        seed=config.get("seed"),
        profile_dir=config.get("profile_dir"),
        remat=bool(train_cfg.get("remat", False)),
        bn_recalc_batches=int(train_cfg.get("bn_recalc_batches", 0) or 0),
        cache_decoded=bool(train_cfg.get("cache_decoded", False)),
        async_checkpoint=bool(train_cfg.get("async_checkpoint", False)),
        ema_decay=(
            float(train_cfg["ema_decay"])
            if train_cfg.get("ema_decay") is not None
            else None
        ),
        grad_clip_norm=(
            float(train_cfg["grad_clip_norm"])
            if train_cfg.get("grad_clip_norm") is not None
            else None
        ),
        mixup_alpha=float(train_cfg.get("mixup_alpha", 0.0) or 0.0),
        cutmix_alpha=float(train_cfg.get("cutmix_alpha", 0.0) or 0.0),
        class_weights=(
            tuple(float(w) for w in train_cfg["class_weights"])
            if isinstance(train_cfg.get("class_weights"), (list, tuple))
            else train_cfg.get("class_weights")
        ),
        train_toggles=resolve_transform_mapping(model_cfg, "train"),
        eval_toggles=resolve_transform_mapping(model_cfg, "eval"),
        mesh_data=mesh_data,
        mesh_model=mesh_model,
        compute_dtype=_compute_dtype(config),
        model_kwargs=_model_kwargs(model_cfg),
    )


def build_eval_job(
    config: dict[str, Any], model_name: str, model_cfg: dict[str, Any], run_paths
) -> EvalJob:
    spec = get_model_spec(model_name)
    data_cfg = config.get("data", {})
    infer_cfg = model_cfg.get("inference") or {}
    train_cfg = model_cfg.get("training") or {}
    # img_size fallback chain: infer → train → data → spec default
    # (orchestrator.py:250-276)
    img_size = int(
        infer_cfg.get("img_size")
        or train_cfg.get("img_size")
        or data_cfg.get("img_size")
        or spec.default_image_size
    )
    weights = infer_cfg.get("weights")
    if isinstance(weights, str) and weights.strip().lower() == "auto":
        # TPU extension: resolve the newest trained export for this model.
        # A re-train lands in a fresh timestamped run dir, so a literal
        # weights path goes stale and SILENTLY evaluates init weights (the
        # load only warns) — an hours-costing footgun. "auto" scans the
        # model's output_dir for the newest run holding an exported .pth
        # and hard-fails with an actionable message when none exists.
        weights = _latest_weights_export(
            _resolve_path(model_cfg.get("output_dir") or f"runs/{model_name}")
        )
        if weights is None:
            raise SystemExit(
                f"inference.weights: auto — no exported .pth found under "
                f"{model_cfg.get('output_dir') or f'runs/{model_name}'}/*/checkpoints/; "
                f"train first (python train.py) or point weights at a file"
            )
        console.print(f"  weights: auto → {weights}")
    # batch/workers fallback chains (reference: orchestrator.py:257-269).
    # NB: like the reference, pydantic fills inference defaults (64/4) when
    # an inference block EXISTS, so these chains only engage when the whole
    # block is absent — identical (if subtle) semantics both sides.
    batch_size = infer_cfg.get("batch_size")
    if batch_size is None:
        batch_size = train_cfg.get("batch_size")
    if batch_size is None:
        batch_size = 64
    num_workers = infer_cfg.get("num_workers")
    if num_workers is None:
        num_workers = train_cfg.get("num_workers")
    if num_workers is None:
        num_workers = data_cfg.get("num_workers", 0)
    mesh_data, mesh_model = _mesh_dims(config)
    return EvalJob(
        model_name=model_name,
        spec=spec,
        run_paths=run_paths,
        data_root=_resolve_path(data_cfg.get("root", "data")),
        split=infer_cfg.get("split") or data_cfg.get("test_split", "test"),
        val_split=data_cfg.get("val_split", "val"),
        num_classes=int(model_cfg.get("num_classes", data_cfg.get("num_classes", 2))),
        img_size=img_size,
        batch_size=int(batch_size),
        num_workers=int(num_workers),
        weights=_resolve_path(weights) if weights else None,
        seed=config.get("seed"),
        eval_toggles=resolve_transform_mapping(model_cfg, "eval"),
        class_labels=data_cfg.get("class_labels"),
        mesh_data=mesh_data,
        mesh_model=mesh_model,
        compute_dtype=_compute_dtype(config),
        precision=str(infer_cfg.get("precision") or "bf16"),
        int8_calibration=str(infer_cfg.get("int8_calibration") or "absmax"),
        int8_percentile=float(infer_cfg.get("int8_percentile") or 0.999),
        lookahead=int(infer_cfg.get("lookahead", 2)),
        tta=(str(infer_cfg["tta"]).lower() if infer_cfg.get("tta") else None),
        calibration=(
            str(infer_cfg["calibration"]).lower()
            if infer_cfg.get("calibration")
            else None
        ),
        model_kwargs=_model_kwargs(model_cfg),
    )


def _latest_weights_export(output_dir: Path) -> Path | None:
    """Newest run dir's exported best weights: ``<output_dir>/<ts>/checkpoints/*.pth``.

    Run dirs are timestamped (``YYYYmmdd-HHMMSS``), so lexical order is
    creation order; within a run the export is unique per weights_key."""
    if not output_dir.exists():
        return None
    for run in sorted((d for d in output_dir.iterdir() if d.is_dir()), reverse=True):
        pths = sorted((run / "checkpoints").glob("*.pth"))
        if pths:
            return pths[-1]
    return None


def _ensemble_cfg(config: dict[str, Any]) -> dict[str, Any] | None:
    """Normalize the top-level ``ensemble:`` key (bool or mapping) to a dict,
    or None when disabled/absent (config.EnsembleConfig validates shapes)."""
    raw = config.get("ensemble")
    if raw is True:
        return {}
    if isinstance(raw, dict) and raw.get("enabled", True):
        return raw
    return None


def orchestrate(config_path: str | Path, mode: str = "training") -> None:
    from deepfakedetection_tpu.parallel.multihost import maybe_initialize
    from deepfakedetection_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    maybe_initialize()
    config_path = Path(config_path)
    config = load_config(config_path)
    _apply_device_preference(config.get("device"))
    apply_seed(config.get("seed"))

    selection = config.get("selection") or list((config.get("models") or {}).keys())
    models = config.get("models") or {}
    eval_results: dict[str, Any] = {}
    for model_name in selection:
        model_cfg = models.get(model_name)
        if model_cfg is None:
            # belt-and-braces like the reference (orchestrator.py:678-680):
            # config validation already rejects unknown selection names, so
            # this only fires for configs built programmatically
            console.print(f"[yellow]⚠ unknown model '{model_name}' — skipping[/]")
            continue
        model_cfg = dict(model_cfg)
        model_cfg["name"] = model_name
        output_dir = model_cfg.get("output_dir") or f"runs/{model_name}"
        run_paths = _resolve_run_paths(model_cfg, _resolve_path(output_dir), mode)
        snapshot_config(config, model_name, run_paths)
        if mode == "training":
            job = build_train_job(config, model_name, model_cfg, run_paths)
            result = run_training(job)
            if result.interrupted:
                # SIGTERM mid-run (runtime/preempt.py): the mid-epoch
                # checkpoint is saved; stop dispatching further models so
                # the process exits within the preemption grace window
                console.print(
                    f"[yellow]⚠ {model_name} preempted — stopping; "
                    "rerun to resume[/]"
                )
                return
            console.print(
                f"[bold green]✓ {model_name}[/]: best val acc "
                f"{result.best_val_acc:.4f} @ epoch {result.best_epoch + 1}"
            )
        elif mode == "inference":
            job = build_eval_job(config, model_name, model_cfg, run_paths)
            eval_results[model_name] = run_eval_job(job)
        else:
            raise ValueError(f"unknown mode '{mode}'")

    # opt-in softmax-averaged ensemble over the selection's eval results
    # (TPU extension; evaluate/ensemble.py — the reference never combines)
    ens_cfg = _ensemble_cfg(config)
    evaluated = sum(1 for r in eval_results.values() if r is not None)
    if mode == "inference" and ens_cfg is not None and evaluated < 2:
        console.print(
            f"[yellow]⚠ ensemble skipped: {evaluated} evaluated model(s), need ≥2[/]"
        )
    elif mode == "inference" and ens_cfg is not None:
        from deepfakedetection_tpu.evaluate.ensemble import run_ensemble

        ens_paths = ensure_run_dirs(
            _resolve_path(ens_cfg.get("output_dir") or "runs/ensemble")
        )
        snapshot_config(config, "ensemble", ens_paths)
        run_ensemble(
            eval_results,
            ens_paths,
            num_classes=int((config.get("data") or {}).get("num_classes", 2)),
            weights=ens_cfg.get("weights"),
        )


def run_cli(default_mode: str = "training") -> None:
    parser = argparse.ArgumentParser(description="deepfakedetection_tpu orchestrator")
    parser.add_argument(
        "--config",
        type=Path,
        default=Path("config/train.yaml" if default_mode == "training" else "config/inference.yaml"),
    )
    parser.add_argument("--mode", choices=["training", "inference"], default=default_mode)
    args = parser.parse_args()
    orchestrate(args.config, mode=args.mode)
