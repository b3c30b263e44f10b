"""Pack ImageFolder splits into tar shards (the production-scale layout).

    python tools/make_shards.py --root data/dataset --out data/shards \
        [--splits train val test] [--images-per-shard 1000]

Each split becomes ``<out>/<split>/shard-%05d.tar`` with members named
``<class>/<relative-path>``; the framework's loaders auto-detect the layout
(data/folder.scan_image_folder → data/shards.scan_tar_shards) so pointing
``data.root`` at ``--out`` afterwards is the only config change.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--root", type=Path, required=True, help="ImageFolder dataset root")
    parser.add_argument("--out", type=Path, required=True, help="output root for shards")
    parser.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--images-per-shard", type=int, default=1000)
    args = parser.parse_args()

    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.shards import write_shards

    for split in args.splits:
        split_dir = args.root / split
        if not split_dir.is_dir():
            print(f"skipping missing split: {split_dir}")
            continue
        ds = scan_image_folder(split_dir)
        shards = write_shards(
            ds, args.out / split, images_per_shard=args.images_per_shard
        )
        print(
            f"{split}: {len(ds)} images ({len(ds.classes)} classes) → "
            f"{len(shards)} shard(s) in {args.out / split}"
        )


if __name__ == "__main__":
    main()
