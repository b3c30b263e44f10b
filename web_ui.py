"""Web UI for Real vs Fake face detection with Grad-CAM visualization.

Surface-compatible with the reference UI (reference: web_ui.py): loads all
selected models from an inference YAML, predicts per model with softmax
confidence, renders a Grad-CAM overlay panel per model with a text label,
concatenates panels side-by-side, exports a 2x bicubic-upscaled PNG to
``outputs/cam_exports/cam_triptych_<UTC %Y%m%d_%H%M%S>.png`` and serves a
Gradio interface. The CAM itself runs on device via jax.grad
(deepfakedetection_tpu/cam.py) instead of pytorch_grad_cam hooks.

Gradio is optional: without it, ``predict_and_visualize`` still works
programmatically (and is covered by tests); only ``launch`` needs gradio.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import UTC, datetime
from pathlib import Path
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw, ImageFont

from deepfakedetection_tpu.cam import (
    compute_cam,
    denormalize_to_rgb,
    show_cam_on_image,
)
from deepfakedetection_tpu.config import load_config
from deepfakedetection_tpu.data.decode import decode_pil_eval
from deepfakedetection_tpu.data.augment import normalize_batch
from deepfakedetection_tpu.data.transforms import (
    build_eval_plan,
    resolve_transform_mapping,
)
from deepfakedetection_tpu.evaluate.job import load_model_for_eval
from deepfakedetection_tpu.orchestrator import build_eval_job
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.steps import make_eval_step

DEFAULT_CONFIG_PATH = Path("config/inference.yaml")
EXPORT_SCALE = 2
EXPORT_DIR = Path("outputs") / "cam_exports"


@dataclass
class ModelBundle:
    """Per-model inference resources (reference: web_ui.py:45-57)."""

    name: str
    display_label: str
    model: Any
    params: Any
    batch_stats: Any
    eval_step: Callable
    plan: Any  # EvalTransformPlan


CLASS_LABELS: dict[int, str] = {0: "fake", 1: "real"}
MODEL_CACHE: list[ModelBundle] = []
# top-level ``ensemble:`` config (evaluate/ensemble.py semantics) — when
# set, the summary gains a softmax-averaged ensemble verdict line
ENSEMBLE_CFG: dict[str, Any] | None = None


def initialize_from_config(config_path: Path) -> None:
    """Load config and populate MODEL_CACHE (reference: web_ui.py:156-221)."""
    global CLASS_LABELS, MODEL_CACHE, ENSEMBLE_CFG
    config = load_config(config_path)
    from deepfakedetection_tpu.orchestrator import _ensemble_cfg

    ENSEMBLE_CFG = _ensemble_cfg(config)
    data_cfg: dict[str, Any] = config.get("data", {})
    labels_cfg = data_cfg.get("class_labels")
    if isinstance(labels_cfg, dict):
        CLASS_LABELS = {int(k): str(v) for k, v in labels_cfg.items()}

    models_cfg: dict[str, dict[str, Any]] = config.get("models", {})
    selection: list[str] = config.get("selection") or list(models_cfg.keys())

    bundles: list[ModelBundle] = []
    for model_name in selection:
        model_cfg = models_cfg.get(model_name)
        if not isinstance(model_cfg, dict):
            print(f"[UI] Skipping unknown model '{model_name}' in selection.")
            continue
        run_paths = ensure_run_dirs(
            Path(model_cfg.get("output_dir") or f"runs/{model_name}"), run_id="webui"
        )
        # reuse the orchestrator's job construction — it carries the
        # img_size fallback chain, model_kwargs/head_config, weights path
        # resolution, and toggle handling identically to CLI eval
        job = build_eval_job(
            config, model_name, dict(model_cfg, name=model_name), run_paths
        )
        toggles = resolve_transform_mapping(model_cfg, phase="eval")
        plan = build_eval_plan(job.img_size, toggles)
        model, params, batch_stats = load_model_for_eval(job)
        display_label = str(
            model_cfg.get("display_name") or model_cfg.get("label") or model_name
        )
        bundles.append(
            ModelBundle(
                name=model_name,
                display_label=display_label,
                model=model,
                params=params,
                batch_stats=batch_stats,
                eval_step=make_eval_step(model, tta=job.tta),
                plan=plan,
            )
        )
    if not bundles:
        raise RuntimeError("No valid models configured for inference.")
    MODEL_CACHE = bundles


def _add_label(img_rgb_uint8: np.ndarray, text: str) -> np.ndarray:
    """Text label at top-left, white with black stroke (web_ui.py:117-130)."""
    img = Image.fromarray(img_rgb_uint8)
    draw = ImageDraw.Draw(img)
    font = ImageFont.load_default()
    draw.text(
        (6, 6), text, fill=(255, 255, 255), stroke_width=2,
        stroke_fill=(0, 0, 0), font=font,
    )
    return np.asarray(img)


def predict_and_visualize(image: Image.Image) -> tuple[np.ndarray, str]:
    """Per-model prediction + Grad-CAM triptych (reference: web_ui.py:241-306)."""
    panels: list[np.ndarray] = []
    summary_lines: list[str] = []
    member_probs: list[tuple[str, np.ndarray]] = []

    for bundle in MODEL_CACHE:
        arr = decode_pil_eval(image, bundle.plan)  # uint8 [S,S,3]
        batch_u8 = jnp.asarray(arr)[None]
        x = normalize_batch(batch_u8, bundle.plan, out_dtype=jnp.float32)
        probs = np.asarray(
            bundle.eval_step(bundle.params, bundle.batch_stats, x)
        )[0]
        member_probs.append((bundle.name, probs))
        cls_idx = int(probs.argmax())
        confidence = float(probs[cls_idx] * 100.0)
        label = CLASS_LABELS.get(cls_idx, f"class_{cls_idx}")
        summary_lines.append(
            f"{bundle.display_label}: {label} ({confidence:.2f}% confidence)"
        )

        cam = np.asarray(
            compute_cam(bundle.model, bundle.params, bundle.batch_stats, x, cls_idx)
        )[0]
        rgb = denormalize_to_rgb(
            np.asarray(x)[0], bundle.plan.mean, bundle.plan.std,
            normalize=bundle.plan.normalize,
        )
        overlay = show_cam_on_image(rgb, cam)
        panel = _add_label(
            overlay, f"{bundle.display_label} {label} ({confidence:.1f}%)"
        )
        panels.append(panel)

    if not panels:
        raise RuntimeError("No models available for inference.")

    # softmax-averaged ensemble verdict (opt-in top-level ensemble: key;
    # summary-only — Grad-CAM is per-model, so the triptych is unchanged)
    if ENSEMBLE_CFG is not None and len(member_probs) >= 2:
        weights = ENSEMBLE_CFG.get("weights") or {}
        w = np.asarray([float(weights.get(n, 1.0)) for n, _ in member_probs])
        eprobs = np.tensordot(
            w / w.sum(), np.stack([p for _, p in member_probs]).astype(np.float64),
            axes=1,
        )
        cls_idx = int(eprobs.argmax())
        summary_lines.append(
            f"Ensemble: {CLASS_LABELS.get(cls_idx, f'class_{cls_idx}')} "
            f"({float(eprobs[cls_idx] * 100.0):.2f}% confidence)"
        )

    side_by_side = np.concatenate(panels, axis=1)
    h, w, _ = side_by_side.shape
    export_img = Image.fromarray(side_by_side).resize(
        (w * EXPORT_SCALE, h * EXPORT_SCALE), resample=Image.BICUBIC
    )
    EXPORT_DIR.mkdir(parents=True, exist_ok=True)
    out_path = (
        EXPORT_DIR
        / f"cam_triptych_{datetime.now(tz=UTC).strftime('%Y%m%d_%H%M%S')}.png"
    )
    export_img.save(out_path, format="PNG", optimize=True)

    summary = "\n".join(summary_lines + [f"Saved: {out_path.resolve()}"])
    return np.asarray(export_img), summary


def build_interface(config_path: Path = DEFAULT_CONFIG_PATH):
    """Create the Gradio interface (requires gradio)."""
    import gradio as gr

    initialize_from_config(config_path)
    return gr.Interface(
        fn=predict_and_visualize,
        inputs=gr.Image(type="pil"),
        outputs=[gr.Image(type="numpy"), "text"],
        title="Real vs Fake Face Detection",
        description="Upload an image to determine if the face is real or fake.",
    )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Deepfake detection UI (TPU)")
    parser.add_argument("--config", type=Path, default=DEFAULT_CONFIG_PATH)
    args = parser.parse_args()
    iface = build_interface(args.config)
    iface.launch()
