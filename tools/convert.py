"""Standalone weight-conversion CLI: PyTorch ``.pth`` → native Flax weights.

The framework converts torch checkpoints on the fly wherever weights are
loaded (runtime/checkpoint.load_weights, magic-byte detection), so this tool
is a convenience for converting ONCE and shipping the native msgpack format
(faster loads, no conversion-map execution at serve time), with a
conversion report.

    python tools/convert.py --model efficientnet_b3 --weights ref.pth \
        --out efficientnet_b3.flax.msgpack [--official] [--json report.json]

An ``--out`` ending in ``.pth`` converts in the REVERSE direction — any
loadable checkpoint (native msgpack or torch) exports as a
reference-layout torch state dict via the same name maps
(runtime/torch_convert.export_torch_state_dict), so TPU-trained models
load into the reference's torch stack.

Reference checkpoints carry the torch module naming of the reference's
builders (reference: orchestration/model_registry.py:32-47); the name maps
live in runtime/torch_convert.py / runtime/fastervit_convert.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(
    model_name: str,
    weights: Path,
    out: Path,
    *,
    img_size: int = 224,
    num_classes: int = 2,
    official: bool = False,
) -> dict:
    import jax

    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.runtime.checkpoint import export_weights, load_weights
    from deepfakedetection_tpu.train.steps import init_model_variables

    spec = get_model_spec(model_name)
    kw = {"head_config": "official"} if (official and spec.family == "fastervit") else {}
    model = spec.builder(num_classes, **kw)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, img_size, img_size, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    n_leaves = len(jax.tree.leaves(target))
    restored, unmatched = load_weights(weights, target, model_family=spec.family)
    if str(out).endswith(".pth"):
        # reverse direction: native/flax → reference-layout torch .pth
        # (runtime/torch_convert.export_torch_state_dict) — TPU-trained
        # models load into the reference's torch stack
        import torch

        from deepfakedetection_tpu.runtime.torch_convert import (
            export_torch_state_dict,
        )

        sd = {
            k: torch.from_numpy(v)
            for k, v in export_torch_state_dict(restored, spec.family).items()
        }
        out.parent.mkdir(parents=True, exist_ok=True)
        torch.save(sd, out)
    else:
        export_weights(out, restored["params"], restored["batch_stats"])
    report = {
        "model": model_name,
        "weights": str(weights),
        "out": str(out),
        "target_tensors": n_leaves,
        "unmatched": list(unmatched),
        "unmatched_count": len(unmatched),
    }
    return report


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--model", required=True)
    parser.add_argument("--weights", type=Path, required=True)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--num-classes", type=int, default=2)
    parser.add_argument(
        "--official", action="store_true",
        help="FasterViT wheel-parity head configuration",
    )
    parser.add_argument("--json", type=Path, help="write the conversion report here")
    args = parser.parse_args()

    report = convert(
        args.model, args.weights, args.out,
        img_size=args.img_size, num_classes=args.num_classes,
        official=args.official,
    )
    if report["unmatched_count"]:
        print(f"⚠ {report['unmatched_count']} unmatched tensors:")
        for u in report["unmatched"][:20]:
            print(f"    {u}")
    else:
        print(f"✓ all {report['target_tensors']} tensors matched")
    print(f"wrote {report['out']}")
    if args.json:
        args.json.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
