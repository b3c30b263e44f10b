"""Host-side decode: PIL path with torchvision-on-PIL geometry.

The eval path is the parity-critical subset (SURVEY.md §7 "hard parts"):
``ensure_rgb → Resize(shorter=img) → CenterCrop(img)`` exactly as the
reference's orchestrator eval transforms (reference: orchestrator.py:316-347).
PIL's BILINEAR is the antialiased triangle filter — the same op torchvision
runs on PIL inputs — so these pixels bit-match the reference pipeline.

The train path decodes to a fixed square canvas (shorter-side resize to
``plan.host_canvas_size`` + center crop); all randomized geometry then runs
fused on device (data/augment.py) from that canvas. A native C++ decoder with
identical geometry is available via data/native.py (see native/dfd_loader.cc).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from deepfakedetection_tpu.data.transforms import EvalTransformPlan, TrainTransformPlan


def _ensure_rgb(img: Image.Image) -> Image.Image:
    return img if img.mode == "RGB" else img.convert("RGB")


def _resize_shorter(img: Image.Image, target: int) -> Image.Image:
    """Shorter-side resize, PIL BILINEAR (matches torchvision Resize on PIL).

    Output size uses TRUNCATION — ``int(long * target / short)`` — exactly
    torchvision's ``_compute_resized_output_size`` (torchvision 0.24,
    functional.py), NOT round-half-up: e.g. 500x375 at target 299 gives the
    long side int(500*299/375)=398, where half-up would give 399 and shift
    the center-crop grid by 1px on most real images. The native decoder
    (dfd_loader.cc shape_to_square) uses the same truncation."""
    w, h = img.size
    if w <= h:
        rw = target
        rh = max(1, int(h * target / w))
    else:
        rh = target
        rw = max(1, int(w * target / h))
    if (rw, rh) == (w, h):
        return img
    return img.resize((rw, rh), Image.BILINEAR)


def _crop_anchor(size: int, target: int) -> int:
    """torchvision CenterCrop anchor: ``int(round((size - target) / 2.0))``
    with Python's round-half-to-even — NOT floor division, which shifts the
    crop 1px on ``(size - target) % 4 == 3`` long sides (caught by the
    round-4 pipeline-level parity harness, tools/parity.py --pipeline).
    When the image is SMALLER than the crop, torchvision pads top-left by
    ``(target - size) // 2`` first (functional.center_crop padding_ltrb),
    so the content anchor is ``-((target - size) // 2)``."""
    if size >= target:
        return int(round((size - target) / 2.0))
    return -((target - size) // 2)


def _center_crop_square(arr: np.ndarray, target: int) -> np.ndarray:
    """Center crop (zero-pad if smaller) to target x target uint8 HWC,
    exact torchvision CenterCrop semantics (see ``_crop_anchor``)."""
    h, w = arr.shape[:2]
    out = np.zeros((target, target, 3), np.uint8)
    top = _crop_anchor(h, target)
    left = _crop_anchor(w, target)
    src_y0, src_x0 = max(top, 0), max(left, 0)
    src_y1, src_x1 = min(h, top + target), min(w, left + target)
    dst_y0, dst_x0 = src_y0 - top, src_x0 - left
    out[dst_y0 : dst_y0 + (src_y1 - src_y0), dst_x0 : dst_x0 + (src_x1 - src_x0)] = arr[
        src_y0:src_y1, src_x0:src_x1
    ]
    return out


def _decode_to_square(
    img: Image.Image, target: int, *, resize: bool, crop: bool,
    resize_target: int | None = None,
) -> np.ndarray:
    """shorter-side resize (to ``resize_target`` or ``target``) then center
    crop to a ``target`` square uint8 array."""
    if resize:
        img = _resize_shorter(img, resize_target or target)
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:  # grayscale slipped through with ensure_rgb off
        arr = np.stack([arr] * 3, axis=-1)
    if crop or arr.shape[:2] != (target, target):
        # a static square is required downstream even with the crop toggled
        # off; falling back to the crop is the documented degradation
        arr = _center_crop_square(arr, target)
    return arr


def decode_pil_eval(img: Image.Image, plan: EvalTransformPlan) -> np.ndarray:
    """Eval decode of an open PIL image → uint8 [img_size, img_size, 3].

    Resizes the shorter side to ``plan.resize_size`` (== img_size for the
    orchestrator eval path; the 1.15× over-resize for trainer val plans,
    efficientnet.py:199) then center-crops to ``img_size``."""
    if plan.ensure_rgb:
        img = _ensure_rgb(img)
    elif img.mode != "RGB":  # static-shape requirement still needs 3 channels
        img = img.convert("RGB")
    return _decode_to_square(
        img, plan.img_size, resize=plan.resize, crop=plan.center_crop,
        resize_target=plan.resize_size or plan.img_size,
    )


def decode_eval(path: str | Path, plan: EvalTransformPlan) -> np.ndarray:
    """Eval decode of an image file → uint8 [img_size, img_size, 3]."""
    with Image.open(path) as img:
        return decode_pil_eval(img, plan)


def decode_pil_train(img: Image.Image, plan: TrainTransformPlan) -> np.ndarray:
    """Train decode of an open PIL image → uint8 square canvas
    [host_canvas_size]² × 3 (randomized geometry happens on device)."""
    if plan.ensure_rgb or img.mode != "RGB":
        img = _ensure_rgb(img)
    return _decode_to_square(img, plan.host_canvas_size, resize=plan.resize, crop=True)


def decode_train(path: str | Path, plan: TrainTransformPlan) -> np.ndarray:
    """Train decode → uint8 square canvas [host_canvas_size]² × 3.

    Small regime: Resize(img+4) (reference Resize + device RandomCrop);
    large regime: shorter-side → max(img+32, 1.15·img) canvas, from which the
    device RandomResizedCrop samples (PARITY.md §3)."""
    with Image.open(path) as img:
        return decode_pil_train(img, plan)
