"""Batch prediction CLI: per-model predictions for an image or a directory.

A TPU-framework addition beyond the reference's surface (the reference only
predicts through the Gradio UI, web_ui.py): programmatic predictions with
optional Grad-CAM panel export, reusing the exact UI code path.

    python predict.py --config config/inference.yaml --input photo.jpg
    python predict.py --config config/inference.yaml --input frames/ --cam
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from deepfakedetection_tpu.data.folder import IMG_EXTENSIONS
from deepfakedetection_tpu.data.decode import decode_pil_eval
from deepfakedetection_tpu.data.augment import normalize_batch
from deepfakedetection_tpu.runtime.compile_cache import enable as enable_compile_cache


def main() -> None:
    parser = argparse.ArgumentParser(description="Deepfake detection prediction CLI")
    parser.add_argument("--config", type=Path, default=Path("config/inference.yaml"))
    parser.add_argument("--input", type=Path, required=True, help="image file or directory")
    parser.add_argument("--cam", action="store_true", help="export Grad-CAM triptychs")
    parser.add_argument("--json", action="store_true", help="machine-readable output")
    parser.add_argument(
        "--ensemble", action="store_true",
        help="also report the softmax-averaged ensemble of the selected models "
        "(on by default when the config sets a top-level 'ensemble:' key)",
    )
    args = parser.parse_args()

    enable_compile_cache()
    import web_ui  # model loading + CAM path shared with the UI

    web_ui.initialize_from_config(args.config)

    # ensemble settings: the CLI flag or the config's top-level key
    # (evaluate/ensemble.py semantics: weighted mean of softmax outputs)
    from deepfakedetection_tpu.config import load_config
    from deepfakedetection_tpu.orchestrator import _ensemble_cfg

    ens_cfg = _ensemble_cfg(load_config(args.config))
    if args.ensemble and ens_cfg is None:
        ens_cfg = {}
    ens_weights = (ens_cfg or {}).get("weights") or {}

    if args.input.is_dir():
        paths = sorted(
            p for p in args.input.rglob("*")
            if p.is_file() and p.suffix.lower() in IMG_EXTENSIONS
        )
    else:
        paths = [args.input]
    if not paths:
        raise SystemExit(f"no images found at {args.input}")

    for path in paths:
        with Image.open(path) as img:
            if args.cam:
                _, summary = web_ui.predict_and_visualize(img.copy())
                if args.json:
                    print(json.dumps({"image": str(path), "summary": summary.splitlines()}))
                else:
                    print(f"{path}:")
                    for line in summary.splitlines():
                        print(f"  {line}")
                continue
            record: dict = {"image": str(path), "predictions": {}}
            lines = []
            member_probs: list[tuple[str, np.ndarray]] = []
            for bundle in web_ui.MODEL_CACHE:
                arr = decode_pil_eval(img, bundle.plan)
                x = normalize_batch(jnp.asarray(arr)[None], bundle.plan, out_dtype=jnp.float32)
                probs = np.asarray(
                    bundle.eval_step(bundle.params, bundle.batch_stats, x)
                )[0]
                member_probs.append((bundle.name, probs))
                cls_idx = int(probs.argmax())
                label = web_ui.CLASS_LABELS.get(cls_idx, f"class_{cls_idx}")
                conf = float(probs[cls_idx] * 100.0)
                record["predictions"][bundle.name] = {
                    "label": label,
                    "confidence": round(conf, 2),
                    "probs": [round(float(p), 6) for p in probs],
                }
                lines.append(f"  {bundle.display_label}: {label} ({conf:.2f}% confidence)")
            if ens_cfg is not None and len(member_probs) >= 2:
                w = np.asarray(
                    [float(ens_weights.get(n, 1.0)) for n, _ in member_probs]
                )
                probs = np.tensordot(
                    w / w.sum(),
                    np.stack([p for _, p in member_probs]).astype(np.float64),
                    axes=1,
                )
                cls_idx = int(probs.argmax())
                label = web_ui.CLASS_LABELS.get(cls_idx, f"class_{cls_idx}")
                conf = float(probs[cls_idx] * 100.0)
                record["predictions"]["ensemble"] = {
                    "label": label,
                    "confidence": round(conf, 2),
                    "probs": [round(float(p), 6) for p in probs],
                }
                lines.append(f"  ensemble: {label} ({conf:.2f}% confidence)")
            if args.json:
                print(json.dumps(record))
            else:
                print(f"{path}:")
                print("\n".join(lines))


if __name__ == "__main__":
    main()
