"""End-to-end eval throughput: the img/s a user actually sees.

The headline `bench.py` measures the device compute path on resident
synthetic batches; the reference's img/s is measured over the real data
loop — decode included (reference: orchestrator.py:585-599). This tool
drives the ACTUAL eval pipeline (ImageFolder scan → host decode → H2D →
jitted eval step → probs fetch) over a real dataset and reports wall-clock
img/s, so the host and device numbers compose honestly
(docs/BENCHMARKS.md "End-to-end eval throughput").

Usage:
    python tools/gen_eval_dataset.py --root /tmp/eval10k --per-class 5000
    python tools/bench_e2e.py --root /tmp/eval10k [--decode native|pil]

Prints ONE JSON line: {"metric": "e2e_eval_throughput_...", "value": N,
"unit": "img/s", "images": N, "decode": "..."}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="ImageFolder root (split inside)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--model", default="efficientnet_b3")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument(
        "--decode", choices=["native", "pil"], default="native",
        help="host decode backend (native = C++ thread pool, dfd_loader.cc)",
    )
    ap.add_argument("--max-images", type=int, default=0, help="0 = whole split")
    ap.add_argument(
        "--lookahead", type=int, default=2,
        help="decode batches staged ahead of the consumer (Loader.lookahead)",
    )
    args = ap.parse_args()

    from deepfakedetection_tpu.runtime.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from deepfakedetection_tpu.data.augment import normalize_batch
    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.pipeline import make_eval_loader
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.parallel.mesh import make_mesh, shard_batch
    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step

    spec = get_model_spec(args.model)
    model = spec.builder(2, dtype=jnp.bfloat16)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, args.img_size, args.img_size, 3)
    )
    eval_step = make_eval_step(model)
    plan = build_eval_plan(args.img_size, {})

    ds = scan_image_folder(os.path.join(args.root, args.split))
    loader = make_eval_loader(
        ds, plan, batch_size=args.batch, num_workers=args.workers,
        use_native=(args.decode == "native"), lookahead=args.lookahead,
    )

    # mirror the eval job's transfer path exactly (evaluate/job.py
    # _collect_probs): shard_batch placement + bf16 normalize output —
    # numpy → one correctly-placed transfer, everything downstream resident
    mesh = make_mesh(-1, 1)

    # warm the compiled step + caches outside the timed loop
    import numpy as np

    warm = shard_batch(
        mesh, np.zeros((args.batch, args.img_size, args.img_size, 3), np.uint8)
    )
    x0 = normalize_batch(warm, plan, out_dtype=jnp.bfloat16)
    float(jnp.sum(eval_step(params, batch_stats, x0)))

    n_seen = 0
    t0 = time.perf_counter()
    last = None
    for batch in loader:
        images = shard_batch(mesh, batch.images)
        x = normalize_batch(images, plan, out_dtype=jnp.bfloat16)
        last = eval_step(params, batch_stats, x)
        n_seen += int(batch.mask.sum())
        if args.max_images and n_seen >= args.max_images:
            break
    # completion barrier: fetch a VALUE (see bench.py docstring — ack-early
    # transports make block_until_ready untrustworthy)
    if last is not None:
        float(jnp.sum(last))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"e2e_eval_throughput_{args.img_size}px_{args.model}",
                "value": round(n_seen / dt, 1),
                "unit": "img/s",
                "images": n_seen,
                "decode": args.decode,
            }
        )
    )


if __name__ == "__main__":
    main()
