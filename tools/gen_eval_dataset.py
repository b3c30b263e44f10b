"""Generate a realistic ImageFolder for end-to-end eval throughput runs.

VERDICT r2 #2: the device-only bench number excludes host decode; this tool
builds a JPEG ImageFolder (default ~480p, quality 90) so `inference.py` /
`tools/bench_e2e.py` can measure the img/s a user actually sees — decode
included (reference: orchestrator.py:585-599 measures over the real loop).

Usage: python tools/gen_eval_dataset.py --root /tmp/eval10k --per-class 5000
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--per-class", type=int, default=5000)
    ap.add_argument("--val-per-class", type=int, default=256)
    # 0 = eval-only tree (the original use); >0 also emits a train split so
    # the same generator drives the on-chip convergence demos (docs/ROUND3.md)
    ap.add_argument("--train-per-class", type=int, default=0)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--seed", type=int, default=0)
    # class separation: the fake/real base-intensity gap (default 70 —
    # trivially separable, good for throughput runs). Small gaps (~10-25)
    # plus noise make a HARD set so short fine-tunes land at realistic
    # 0.7-0.9 val accuracies (VERDICT r3 weak #3: int8 accuracy deltas must
    # be measured on an UNsaturated operating point)
    ap.add_argument("--class-gap", type=float, default=70.0)
    ap.add_argument("--noise", type=float, default=12.0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    h, w = args.height, args.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    splits = [("val", args.val_per_class), ("test", args.per_class)]
    if args.train_per_class:
        splits.insert(0, ("train", args.train_per_class))
    for split, n in splits:
        for ci, cls in enumerate(("fake", "real")):
            d = args.root / split / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                # smooth structured content (JPEG-compressible like photos,
                # not pure noise which decodes unrealistically slowly)
                f1, f2 = rng.uniform(0.005, 0.05, 2)
                phase = rng.uniform(0, 6.28, 3)
                mid = 125.0
                base = mid - args.class_gap / 2 if ci == 0 else mid + args.class_gap / 2
                img = np.stack(
                    [
                        base + 70 * np.sin(f1 * xx + phase[0]) * np.cos(f2 * yy),
                        base + 60 * np.cos(f1 * yy + phase[1]),
                        base + 50 * np.sin(f2 * (xx + yy) + phase[2]),
                    ],
                    axis=-1,
                )
                img += rng.normal(0, args.noise, (h, w, 3))
                Image.fromarray(
                    img.clip(0, 255).astype(np.uint8)
                ).save(d / f"img_{i:05d}.jpg", quality=args.quality)
        print(f"{split}: {2 * n} images at {w}x{h}")


if __name__ == "__main__":
    main()
