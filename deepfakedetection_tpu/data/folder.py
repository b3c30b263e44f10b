"""ImageFolder-style dataset scan.

Behavior-compatible with torchvision ``datasets.ImageFolder`` as consumed by
the reference (reference: trainers/efficientnet.py:213, web_ui.py:57):
classes are the sorted child directory names (alphabetical — the fake=0 /
real=1 label assignment depends on this) and samples are the sorted image
paths within each class.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

# torchvision's IMG_EXTENSIONS (datasets/folder.py), minus formats PIL in this
# image cannot decode anyway
IMG_EXTENSIONS = {
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
}


@dataclass
class ImageFolderDataset:
    root: Path
    classes: list[str]
    class_to_idx: dict[str, int]
    samples: list[tuple[Path, int]] = field(repr=False)

    def __len__(self) -> int:
        return len(self.samples)


def scan_image_folder(root: str | Path):
    """Scan ``root/<class>/*`` into a dataset (alphabetical class order).

    Layout auto-detection (TPU-framework extension): when the split
    directory holds ``*.tar`` shards instead of class subdirectories, it
    scans as a sharded-tar dataset (data/shards.py — the production-scale
    layout); class ordering and the sample surface are identical either
    way, so every consumer is backend-agnostic."""
    root = Path(root)
    if not root.is_dir():
        raise FileNotFoundError(f"dataset split directory not found: {root}")
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if not classes and any(root.glob("*.tar")):
        from deepfakedetection_tpu.data.shards import scan_tar_shards

        return scan_tar_shards(root)
    class_to_idx = {c: i for i, c in enumerate(classes)}
    samples: list[tuple[Path, int]] = []
    for cls in classes:
        idx = class_to_idx[cls]
        for p in sorted((root / cls).rglob("*")):
            if p.is_file() and p.suffix.lower() in IMG_EXTENSIONS:
                samples.append((p, idx))
    return ImageFolderDataset(
        root=root, classes=classes, class_to_idx=class_to_idx, samples=samples
    )


def require_num_classes(
    dataset: ImageFolderDataset,
    expected: int,
    *,
    split: str,
    dataset_root: Path | str | None = None,
) -> None:
    """Class-count guard with the reference's actionable message
    (reference: orchestration/train_env.py:309-341). Exits instead of
    raising so CLI runs fail cleanly like the reference trainers do."""
    if expected <= 0:
        raise ValueError("expected number of classes must be positive")
    actual = len(dataset.classes)
    if actual == expected:
        return
    preview = ", ".join(dataset.classes[: min(5, actual)])
    if actual > 5:
        preview += ", …"
    root_hint = f" at {Path(dataset_root)}" if dataset_root is not None else ""
    raise SystemExit(
        f"Class count mismatch for split '{split}'{root_hint}: dataset "
        f"exposes {actual} classes ({preview}) but configuration sets "
        f"num_classes={expected}. Update config.data.num_classes (e.g., match "
        "it to the true number of categories in your ImageFolder)."
    )
