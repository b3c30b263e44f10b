"""Sharded-tar dataset (WebDataset-style) for production-scale data.

The reference reads loose files through torchvision ``ImageFolder``
(reference: trainers/efficientnet.py:213). That layout breaks down at
production scale — millions of loose files bottleneck on filesystem
metadata (one stat+open per image per epoch) and defeat network-filesystem
readahead. The standard fix is packing each split into sequential **tar
shards**, the layout popularized by WebDataset.

This module is the TPU framework's shard backend:

- a split is a directory of ``*.tar`` files whose members are named
  ``<class>/<basename>.<ext>`` — the class comes from the member's
  directory prefix, and class ordering is alphabetical exactly like the
  folder scan (labels fake=0 / real=1 depend on it, reference web_ui.py:57)
- ``scan_tar_shards`` indexes every member ONCE from the tar headers
  (name, payload offset, size — no decode, no extraction) giving O(1)
  random access afterwards: a read is one ``seek`` + one bounded ``read``
- the dataset serves **raw encoded bytes** (``read_bytes``); decode stays
  in the loader's existing thread pool (PIL from memory, or the native
  C++ ``dfd_decode_buffer`` when its direct-square geometry applies), so
  shuffled multi-epoch training and padded eval work unchanged
- ``write_shards`` packs an existing ImageFolder split into shards
  deterministically (also exposed as ``tools/make_shards.py``)

``data.folder.scan_image_folder`` auto-detects the layout: a split
directory that contains ``*.tar`` files and no class subdirectories scans
as shards; everything downstream (loaders, multihost sharding, metrics)
is agnostic to the backend because both datasets expose the same
``classes``/``samples`` surface.
"""

from __future__ import annotations

import tarfile
from dataclasses import dataclass, field
from pathlib import Path

from deepfakedetection_tpu.data.folder import IMG_EXTENSIONS, ImageFolderDataset


@dataclass(frozen=True)
class TarMember:
    """Index entry for one image member inside a shard."""

    shard: int  # index into TarShardDataset.shards
    offset: int  # payload byte offset within the shard file
    size: int  # payload byte length


@dataclass
class TarShardDataset:
    """Random-access image dataset over a directory of tar shards.

    Quacks like ``ImageFolderDataset`` for every consumer in the framework
    (``classes``/``class_to_idx``/``samples``/``len``), plus ``read_bytes``
    — the marker the loader uses to switch to bytes-backed decode.
    ``samples`` carries the member name (for error messages and ordering
    parity); the bytes come from the O(1) member index.
    """

    root: Path
    shards: list[Path]
    classes: list[str]
    class_to_idx: dict[str, int]
    samples: list[tuple[str, int]] = field(repr=False)  # (member name, label)
    members: list[TarMember] = field(repr=False)

    def __len__(self) -> int:
        return len(self.samples)

    def read_bytes(self, index: int) -> bytes:
        """Raw encoded image bytes of sample ``index`` (one seek + read).

        Opens the shard per call: an open is microseconds against the
        multi-millisecond JPEG decode that follows, and it keeps the reader
        trivially safe under the loader's concurrent decode threads.
        """
        m = self.members[index]
        with self.shards[m.shard].open("rb") as f:
            f.seek(m.offset)
            data = f.read(m.size)
        if len(data) != m.size:
            raise OSError(
                f"short read ({len(data)}/{m.size} bytes) for member "
                f"'{self.samples[index][0]}' in {self.shards[m.shard]}"
            )
        return data


def scan_tar_shards(root: str | Path) -> TarShardDataset:
    """Index ``root/*.tar`` into a dataset (alphabetical class order).

    Ordering parity with the folder scan: samples sort by class then member
    basename, so a split packed from an ImageFolder tree yields the same
    sample order (and therefore identical eval batches and identical
    seeded-shuffle streams) as scanning the tree directly.
    """
    root = Path(root)
    shards = sorted(root.glob("*.tar"))
    if not shards:
        raise FileNotFoundError(f"no *.tar shards found in: {root}")
    classes: set[str] = set()
    rows: list[tuple[str, str, TarMember]] = []  # (class, name, member)
    for si, shard in enumerate(shards):
        # stream the headers only: tarfile reads each 512-byte header block
        # and we record the payload location; member data is never touched
        with tarfile.open(shard, "r") as tf:
            for info in tf:
                if not info.isfile():
                    continue
                name = info.name.lstrip("./")
                if "/" not in name:
                    continue  # class prefix is mandatory
                if Path(name).suffix.lower() not in IMG_EXTENSIONS:
                    continue
                cls = name.split("/", 1)[0]
                classes.add(cls)
                rows.append(
                    (cls, name, TarMember(shard=si, offset=info.offset_data, size=info.size))
                )
    ordered_classes = sorted(classes)
    class_to_idx = {c: i for i, c in enumerate(ordered_classes)}
    rows.sort(key=lambda r: (class_to_idx[r[0]], r[1]))
    return TarShardDataset(
        root=root,
        shards=shards,
        classes=ordered_classes,
        class_to_idx=class_to_idx,
        samples=[(name, class_to_idx[cls]) for cls, name, _ in rows],
        members=[m for _, _, m in rows],
    )


def write_shards(
    dataset: ImageFolderDataset,
    out_dir: str | Path,
    *,
    images_per_shard: int = 1000,
    prefix: str = "shard",
) -> list[Path]:
    """Pack an ImageFolder dataset into tar shards (deterministic order).

    Members are stored as ``<class>/<basename>`` in the dataset's sample
    order (class-major, name-sorted), uncompressed (images are already
    compressed; tar is a pure framing layer so reads stay seekable).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idx_to_class = {i: c for c, i in dataset.class_to_idx.items()}
    written: list[Path] = []
    tf: tarfile.TarFile | None = None
    try:
        for i, (path, label) in enumerate(dataset.samples):
            if i % images_per_shard == 0:
                if tf is not None:
                    tf.close()
                shard_path = out_dir / f"{prefix}-{len(written):05d}.tar"
                tf = tarfile.open(shard_path, "w")
                written.append(shard_path)
            cls = idx_to_class[label]
            try:  # keep nested paths unique within a class (folder scan rglobs)
                rel = Path(path).relative_to(dataset.root / cls).as_posix()
            except ValueError:
                rel = Path(path).name
            tf.add(path, arcname=f"{cls}/{rel}", recursive=False)
    finally:
        if tf is not None:
            tf.close()
    return written
