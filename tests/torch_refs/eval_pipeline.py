"""Independent torch reimplementation of the reference's FULL eval pipeline.

Reproduces, without touching any deepfakedetection_tpu code, the reference
inference-job semantics end to end (reference: orchestration/orchestrator.py):

- decode + eval transforms: PIL open → ensure_rgb → torchvision
  ``Resize(img_size)`` geometry (shorter side → img_size, PIL BILINEAR,
  truncated output size ``int(size·long/short)``) → ``CenterCrop(img_size)``
  (anchor ``int(round((dim-size)/2.0))``, zero-pad when smaller) → ToTensor
  → Normalize(ImageNet) (ref orchestrator.py:316-347)
- binary decision sweep: 501 thresholds in [0,1] maximizing balanced
  accuracy on the val split, first-max tie-break like ``np.argmax``
  (ref orchestrator.py:513-546)
- test decisions ``p(class1) >= threshold`` (ref orchestrator.py:605-607)
- metrics: accuracy, rank-based ROC-AUC (Mann-Whitney with tied-rank
  averaging — sklearn ``roc_auc_score`` semantics), confusion matrix
  (ref orchestrator.py:609-647)

Used by ``tools/parity.py --pipeline`` and tests/test_pipeline_parity.py to
run the SAME converted checkpoint + image tree through this stack and the
JAX stack (evaluate/job.py) and assert per-image agreement. Everything here
is deliberately a second implementation: no imports from the package.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif", ".tiff"}


def scan_folder(root: Path) -> tuple[list[tuple[Path, int]], list[str]]:
    """ImageFolder scan: alphabetical class dirs → labels (torchvision
    ImageFolder semantics the reference relies on — fake=0/real=1)."""
    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    samples = []
    for idx, cls in enumerate(classes):
        for p in sorted((root / cls).rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS and p.is_file():
                samples.append((p, idx))
    return samples, classes


def eval_transform(img: Image.Image, img_size: int) -> np.ndarray:
    """Reference eval transforms on one PIL image → float32 CHW tensor."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    # torchvision Resize(int) on PIL: shorter side → img_size, BILINEAR,
    # long side int-truncated (torchvision _compute_resized_output_size)
    w, h = img.size
    if w <= h:
        ow, oh = img_size, max(1, int(img_size * h / w))
    else:
        oh, ow = img_size, max(1, int(img_size * w / h))
    if (ow, oh) != (w, h):
        img = img.resize((ow, oh), Image.BILINEAR)
    # torchvision CenterCrop: round-half-even anchor, zero-pad when smaller
    w, h = img.size
    arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    out = np.zeros((img_size, img_size, 3), np.uint8)
    top = int(round((h - img_size) / 2.0))
    left = int(round((w - img_size) / 2.0))
    sy0, sx0 = max(top, 0), max(left, 0)
    sy1, sx1 = min(h, top + img_size), min(w, left + img_size)
    dy0, dx0 = sy0 - top, sx0 - left
    out[dy0 : dy0 + (sy1 - sy0), dx0 : dx0 + (sx1 - sx0)] = arr[sy0:sy1, sx0:sx1]
    # ToTensor + Normalize
    x = out.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (2, 0, 1))  # CHW


def run_split(model, samples: list[tuple[Path, int]], img_size: int, batch: int = 32):
    """(softmax probs [N,C], labels [N]) over a sample list, batched."""
    import torch

    probs, labels = [], []
    model.eval()
    with torch.inference_mode():
        for i in range(0, len(samples), batch):
            chunk = samples[i : i + batch]
            xs = np.stack(
                [eval_transform(Image.open(p), img_size) for p, _ in chunk]
            )
            logits = model(torch.from_numpy(xs))
            probs.append(torch.softmax(logits.float(), dim=-1).numpy())
            labels.extend(lbl for _, lbl in chunk)
    return (
        np.concatenate(probs) if probs else np.zeros((0, 2), np.float32),
        np.asarray(labels, np.int64),
    )


def balanced_accuracy(targets: np.ndarray, preds: np.ndarray) -> float:
    """sklearn balanced_accuracy_score: mean recall over classes in y_true."""
    recalls = []
    for c in np.unique(targets):
        m = targets == c
        recalls.append(float((preds[m] == c).mean()))
    return float(np.mean(recalls))


def sweep_threshold(p1: np.ndarray, targets: np.ndarray) -> float:
    """501-point balanced-accuracy sweep, first-max tie-break
    (ref orchestrator.py:513-546)."""
    thresholds = np.linspace(0.0, 1.0, 501)
    scores = [balanced_accuracy(targets, (p1 >= t).astype(np.int64)) for t in thresholds]
    return float(thresholds[int(np.argmax(scores))])


def roc_auc(targets: np.ndarray, p1: np.ndarray) -> float | None:
    """Rank-based AUC (Mann-Whitney U with average ranks for ties) ==
    sklearn roc_auc_score on binary labels."""
    pos = p1[targets == 1]
    neg = p1[targets == 0]
    if len(pos) == 0 or len(neg) == 0:
        return None
    allp = np.concatenate([pos, neg])
    order = np.argsort(allp, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(allp) + 1)
    # average ranks over ties
    sorted_vals = allp[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j + 1 < len(sorted_vals) and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    n1, n0 = len(pos), len(neg)
    return float((r_pos - n1 * (n1 + 1) / 2.0) / (n1 * n0))


def run_reference_eval(
    model,
    data_root: Path,
    img_size: int,
    *,
    val_split: str = "val",
    test_split: str = "test",
    batch: int = 32,
) -> dict:
    """The composed reference inference job through this torch stack.

    Returns probs/targets/preds/threshold/accuracy/auc plus the ordered
    test file list so the caller can align per-image with the JAX stack.
    """
    data_root = Path(data_root)
    threshold = 0.5
    val_samples, _ = (
        scan_folder(data_root / val_split)
        if (data_root / val_split).exists()
        else ([], [])
    )
    if val_samples:
        vprobs, vtargets = run_split(model, val_samples, img_size, batch)
        # reference semantics (orchestration/orchestrator.py:535-546): the
        # sweep only runs for BINARY tasks when val contains BOTH classes
        # (np.unique(val_true).size > 1); otherwise threshold stays 0.5
        if vprobs.shape[1] == 2 and np.unique(vtargets).size > 1:
            threshold = sweep_threshold(vprobs[:, 1], vtargets)
    test_samples, classes = scan_folder(data_root / test_split)
    probs, targets = run_split(model, test_samples, img_size, batch)
    if probs.shape[1] == 2:
        preds = (probs[:, 1] >= threshold).astype(np.int64)
    else:
        preds = probs.argmax(axis=1).astype(np.int64)
    return {
        "files": [str(p) for p, _ in test_samples],
        "classes": classes,
        "probs": probs,
        "targets": targets,
        "preds": preds,
        "threshold": threshold,
        "accuracy": float((preds == targets).mean()) if len(targets) else 0.0,
        "roc_auc": roc_auc(targets, probs[:, 1]),
    }
