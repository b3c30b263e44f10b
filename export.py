"""Serialize a model's eval step for deployment (jax.export / StableHLO).

Production-serving artifact beyond the reference's surface: the jitted
softmax-forward step exports as a portable StableHLO module that any
compatible runtime (new process, different binary, C++ PJRT host) can load
without Python model code.

    python export.py --model efficientnet_b3 --weights runs/.../best.pth \
        --out exports/efficientnet_b3.stablehlo
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp


def export_model(
    model_name: str,
    weights: Path | None,
    out: Path,
    *,
    batch: int = 64,
    img_size: int = 224,
    num_classes: int = 2,
) -> Path:
    from jax import export as jax_export

    from deepfakedetection_tpu.evaluate.job import EvalJob
    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    spec = get_model_spec(model_name)
    job = EvalJob(
        model_name=model_name,
        spec=spec,
        run_paths=ensure_run_dirs(Path("runs") / model_name, run_id="export"),
        data_root=Path("."),
        num_classes=num_classes,
        img_size=img_size,
        weights=weights,
    )
    from deepfakedetection_tpu.evaluate.job import load_model_for_eval

    model, params, batch_stats = load_model_for_eval(job)

    def forward(params, batch_stats, x):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    exported = jax_export.export(jax.jit(forward))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch_stats),
        jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.bfloat16),
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(exported.serialize())
    # weights travel alongside as msgpack
    from deepfakedetection_tpu.runtime.checkpoint import export_weights

    export_weights(out.with_suffix(".weights.msgpack"), params, batch_stats)
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description="Export eval step as StableHLO")
    parser.add_argument("--model", default="efficientnet_b3")
    parser.add_argument("--weights", type=Path, default=None)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--num-classes", type=int, default=2)
    args = parser.parse_args()
    path = export_model(
        args.model, args.weights, args.out,
        batch=args.batch, img_size=args.img_size, num_classes=args.num_classes,
    )
    print(f"exported: {path} (+ {path.with_suffix('.weights.msgpack')})")


if __name__ == "__main__":
    main()
