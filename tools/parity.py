"""Logit-parity harness: converted torch weights vs this repo's Flax models.

Closes SURVEY.md §7.8 / BASELINE.md gate plumbing (AUROC and top-1 within
0.1% of the PyTorch/timm reference). Three tiers, best-effort by what is
importable in the environment:

1. ALWAYS (offline): conversion coverage — matched/unmatched tensor counts —
   plus logit self-consistency: batch-size invariance (batch 1 vs N) and
   bf16-vs-f32 drift of the converted model.
2. ``--images DIR``: run the converted model over an ImageFolder split and
   report top-1 / AUROC on it.
3. If the reference's torch package for the family is importable (timm /
   fastervit / efficientnet_pytorch — reference requirements.txt), build the
   torch model, load the SAME checkpoint, and report max|Δlogit|, top-1
   agreement, and AUROC delta on identical inputs (ref consumers:
   trainers/efficientformer_v2.py:327, trainers/fastervit.py:371,
   trainers/efficientnet.py:405).

Usage:
    python tools/parity.py --model faster_vit_2_224 --weights w.pth \
        [--images data/test] [--img-size 224] [--batch 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _build_flax(spec, num_classes, dtype, official_torch: bool):
    import jax.numpy as jnp

    kw = {}
    if spec.family == "fastervit" and official_torch:
        kw["head_config"] = "official"
    return spec.builder(num_classes, dtype={"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype], **kw)


def _init_and_load(model, spec, weights: Path, img_size: int):
    import jax

    from deepfakedetection_tpu.runtime.checkpoint import load_weights
    from deepfakedetection_tpu.train.steps import init_model_variables

    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, img_size, img_size, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    n_leaves = len(jax.tree.leaves(target))
    restored, unmatched = load_weights(weights, target, model_family=spec.family)
    return restored, unmatched, n_leaves


def _torch_reference_model(spec, num_classes):
    """Best-effort construction of the reference's torch model (tier 3).

    Prefers the real wheels (efficientnet_pytorch / timm / fastervit —
    reference requirements.txt); when those aren't installed (zero-egress
    environments), falls back to the in-repo reimplementations
    (tests/torch_refs/) that carry the same module naming and forward
    semantics. Returns (model, source) or (None, None).
    """
    try:
        import torch  # noqa: F401
        import torch.nn as nn
    except ImportError:
        return None, None
    try:
        if spec.family == "efficientnet":
            from efficientnet_pytorch import EfficientNet

            m = EfficientNet.from_name(f"efficientnet-{spec.variant}")
            m._fc = nn.Linear(m._fc.in_features, num_classes)
        elif spec.family == "efficientformerv2":
            import timm

            m = timm.create_model(
                f"efficientformerv2_{spec.variant}",
                pretrained=False, num_classes=num_classes,
            )
        elif spec.family == "fastervit":
            from fastervit import create_model

            m = create_model(f"faster_vit_{spec.variant}_224", pretrained=False)
            m.head = nn.Linear(m.head.in_features, num_classes)
        else:
            return None, None
        m.eval()
        return m, "official wheel"
    except ImportError:
        pass
    # offline fallback: the repo's independent torch reimplementations —
    # written for the reference's exact variants only
    tests_dir = str(Path(__file__).resolve().parent.parent / "tests")
    if tests_dir not in sys.path:
        sys.path.append(tests_dir)  # append: never shadow real modules
    try:
        if spec.family == "efficientnet" and spec.variant == "b3":
            from torch_refs.efficientnet_torch import EfficientNetB3

            m = EfficientNetB3(num_classes=num_classes)
        elif spec.family == "efficientformerv2" and spec.variant == "s1":
            from torch_refs.efficientformer_v2_torch import EfficientFormerV2S1

            m = EfficientFormerV2S1(num_classes=num_classes)
        elif spec.family == "fastervit" and spec.variant == "2":
            from torch_refs.fastervit_torch import FasterViT2

            m = FasterViT2(num_classes=num_classes)
        else:
            return None, None
    except ImportError:
        return None, None
    m.eval()
    return m, "in-repo torch_refs reimplementation"


def _load_images(images_dir: Path | None, img_size: int, n_synthetic: int, seed: int):
    """(float images NHWC normalized, labels|None). Synthetic when no dir."""
    from deepfakedetection_tpu.data.transforms import build_eval_plan

    plan = build_eval_plan(img_size, {})
    if images_dir is None:
        rng = np.random.default_rng(seed)
        u8 = rng.integers(0, 256, size=(n_synthetic, img_size, img_size, 3), dtype=np.uint8)
        import jax.numpy as jnp

        from deepfakedetection_tpu.data.augment import normalize_batch

        x = np.asarray(normalize_batch(jnp.asarray(u8), plan, out_dtype=jnp.float32))
        return x, None
    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.pipeline import make_eval_loader

    ds = scan_image_folder(images_dir)
    loader = make_eval_loader(ds, plan, batch_size=32, num_workers=0)
    import jax.numpy as jnp

    from deepfakedetection_tpu.data.augment import normalize_batch

    xs, ys = [], []
    for batch in loader:
        x = np.asarray(
            normalize_batch(jnp.asarray(batch.images), plan, out_dtype=jnp.float32)
        )
        xs.append(x[batch.mask])
        ys.append(batch.labels[batch.mask])
    return np.concatenate(xs), np.concatenate(ys)


def run_parity(
    model_name: str,
    weights: Path,
    images: Path | None = None,
    img_size: int = 224,
    batch: int = 8,
    num_classes: int = 2,
    seed: int = 0,
) -> dict:
    from deepfakedetection_tpu.registry import get_model_spec

    spec = get_model_spec(model_name)
    report: dict = {"model": model_name, "weights": str(weights)}

    with weights.open("rb") as f:
        magic = f.read(2)
    is_torch_ckpt = magic[:2] == b"PK" or magic[:1] == b"\x80"
    report["torch_checkpoint"] = is_torch_ckpt

    # --- tier 1a: conversion coverage -----------------------------------
    model = _build_flax(spec, num_classes, "f32", official_torch=is_torch_ckpt)
    restored, unmatched, n_leaves = _init_and_load(model, spec, weights, img_size)
    report["flax_leaves"] = n_leaves
    report["unmatched_torch_keys"] = len(unmatched)
    report["unmatched_sample"] = unmatched[:8]

    x, labels = _load_images(images, img_size, n_synthetic=max(batch, 8), seed=seed)
    x = x[: max(batch, 2)] if images is None else x

    chunk = max(int(batch), 1)

    def apply_f32(xs):
        return np.concatenate(
            [
                np.asarray(model.apply(restored, xs[i : i + chunk], train=False))
                for i in range(0, len(xs), chunk)
            ]
        )

    logits = apply_f32(x)

    # --- tier 1b: batch-size invariance ----------------------------------
    single = np.concatenate([apply_f32(x[i : i + 1]) for i in range(min(len(x), 4))])
    report["batch_invariance_max_delta"] = float(
        np.abs(logits[: len(single)] - single).max()
    )

    # --- tier 1c: bf16 drift ---------------------------------------------
    model_bf16 = _build_flax(spec, num_classes, "bf16", official_torch=is_torch_ckpt)
    logits_bf16 = np.concatenate(
        [
            np.asarray(
                model_bf16.apply(restored, x[i : i + chunk], train=False),
                dtype=np.float32,
            )
            for i in range(0, len(x), chunk)
        ]
    )
    probs = _softmax(logits)
    probs_bf16 = _softmax(logits_bf16)
    report["bf16_max_logit_delta"] = float(np.abs(logits - logits_bf16).max())
    report["bf16_top1_agreement"] = float(
        (logits.argmax(-1) == logits_bf16.argmax(-1)).mean()
    )
    report["bf16_max_prob_delta"] = float(np.abs(probs - probs_bf16).max())

    # --- tier 2: metrics on real images ----------------------------------
    if labels is not None:
        top1 = float((logits.argmax(-1) == labels).mean())
        report["top1"] = top1
        if num_classes == 2 and np.unique(labels).size > 1:
            from deepfakedetection_tpu.evaluate.metrics import roc_auc

            report["auroc"] = roc_auc(labels, probs[:, 1])

    # --- tier 3: torch reference comparison ------------------------------
    torch_model, torch_src = (
        _torch_reference_model(spec, num_classes) if is_torch_ckpt else (None, None)
    )
    if torch_model is not None:
        report["torch_reference"] = torch_src
        import torch

        sd = torch.load(weights, map_location="cpu", weights_only=True)
        for wrapper in ("state_dict", "model"):
            if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
                sd = sd[wrapper]
        torch_model.load_state_dict(sd, strict=False)
        with torch.inference_mode():
            t_logits = np.concatenate(
                [
                    torch_model(
                        torch.from_numpy(np.ascontiguousarray(x[i : i + chunk]))
                        .permute(0, 3, 1, 2)
                        .contiguous()
                    ).numpy()
                    for i in range(0, len(x), chunk)
                ]
            )
        report["ref_max_logit_delta"] = float(np.abs(logits - t_logits).max())
        report["ref_top1_agreement"] = float(
            (logits.argmax(-1) == t_logits.argmax(-1)).mean()
        )
        # tier 3b: per-block activation deltas (relative max|Δ| per probe) —
        # a drift localizes to a block instead of the whole network
        report["block_probes"] = probe_blocks(
            spec, model, restored, torch_model, x
        )
        if labels is not None:
            report["ref_top1"] = float((t_logits.argmax(-1) == labels).mean())
            report["top1_delta"] = abs(report["ref_top1"] - report.get("top1", 0.0))
            if num_classes == 2 and np.unique(labels).size > 1:
                from deepfakedetection_tpu.evaluate.metrics import roc_auc

                ref_auroc = roc_auc(labels, _softmax(t_logits)[:, 1])
                if ref_auroc is not None and "auroc" in report:
                    report["ref_auroc"] = ref_auroc
                    report["auroc_delta"] = abs(report["auroc"] - ref_auroc)
        # the 0.1% gate is about top-1/AUROC deltas on REAL images
        # (BASELINE.md); without --images it is unmeasured, not passed
        if "top1_delta" in report:
            report["gate_0p1pct"] = report["top1_delta"] <= 1e-3 and (
                report.get("auroc_delta", 0.0) <= 1e-3
            )
        else:
            report["gate_0p1pct"] = (
                "not evaluated (pass --images for the top-1/AUROC gate; "
                f"max|Δlogit| vs torch = {report['ref_max_logit_delta']:.2e})"
            )
    else:
        report["torch_reference"] = "unavailable (timm/fastervit/efficientnet_pytorch not installed)"
    return report


_PROBE_SETS = {
    # (label, flax top-level module name, torch module name) — the same
    # boundaries tests/test_cross_framework.py verifies; torch names follow
    # the wheels' module layout (which tests/torch_refs mirrors)
    "efficientnet": [
        (f"stage{s}", f"stage{s}_block{r}", f"_blocks.{f}")
        for s, (r, f) in enumerate(
            zip((1, 2, 2, 4, 4, 5, 1), (1, 4, 7, 12, 17, 23, 25))
        )
    ],
    "fastervit": [
        ("level0.b2", "stage0_block2", "levels.0.blocks.2"),
        ("ds1", "downsample_1", "levels.0.downsample"),
        ("ds2", "downsample_2", "levels.1.downsample"),
        ("ds3", "downsample_3", "levels.2.downsample"),
        ("final_norm", "norm_out", "norm"),
    ],
    "efficientformerv2": [  # s1 depths (3,3,9,6): last block per stage
        ("stage0", "stages_0_block2_ffn_res", "stages.0.blocks.2"),
        ("stage1", "stages_1_block2_ffn_res", "stages.1.blocks.2"),
        ("stage2", "stages_2_block8_ffn_res", "stages.2.blocks.8"),
        ("stage3", "stages_3_block5_ffn_res", "stages.3.blocks.5"),
        ("ds2", "downsample_2", "stages.2.downsample"),
        ("ds3", "downsample_3", "stages.3.downsample"),
    ],
}


def probe_blocks(spec, model, restored, torch_model, x: np.ndarray) -> dict:
    """Per-block activation deltas flax-vs-torch on identical inputs, so a
    real-weights drift localizes to a block instead of the whole network
    (same probe boundaries as tests/test_cross_framework.py)."""
    import jax.numpy as jnp
    import torch

    probes = _PROBE_SETS.get(spec.family, [])
    if not probes:
        return {}
    names = {p[1] for p in probes}
    _, inter = model.apply(
        restored, jnp.asarray(x[:2]), train=False,
        capture_intermediates=lambda mdl, method: (
            method == "__call__" and mdl.name in names
        ),
    )
    inter = inter["intermediates"]
    acts: dict[str, np.ndarray] = {}
    hooks, modules = [], dict(torch_model.named_modules())

    def first(o):
        return o[0] if isinstance(o, (tuple, list)) else o

    for label, _f, tname in probes:
        if tname not in modules:
            continue

        def mk(lbl):
            return lambda _m, _i, out: acts.__setitem__(
                lbl, first(out).detach().numpy()
            )

        hooks.append(modules[tname].register_forward_hook(mk(label)))
    try:
        with torch.inference_mode():
            torch_model(
                torch.from_numpy(np.ascontiguousarray(x[:2]))
                .permute(0, 3, 1, 2).contiguous()
            )
    finally:
        for h in hooks:
            h.remove()
    out = {}
    for label, fname, _t in probes:
        if label not in acts or fname not in inter:
            continue
        f_out = np.asarray(first(inter[fname]["__call__"][0]), np.float32)
        t_out = acts[label].astype(np.float32)
        if t_out.ndim == 4 and f_out.ndim == 4 and t_out.shape != f_out.shape:
            t_out = np.transpose(t_out, (0, 2, 3, 1))  # NCHW → NHWC
        if f_out.shape != t_out.shape:
            out[label] = f"shape mismatch {f_out.shape} vs {t_out.shape}"
            continue
        scale = max(float(np.abs(t_out).max()), 1e-3)
        out[label] = float(np.abs(f_out - t_out).max() / scale)
    return out


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def run_pipeline_parity(
    model_name: str,
    weights: Path,
    images_root: Path,
    img_size: int = 224,
    batch: int = 32,
    num_classes: int = 2,
    val_split: str = "val",
    test_split: str = "test",
    num_workers: int = 0,
) -> dict:
    """Process-state-safe wrapper around :func:`_run_pipeline_parity_impl`.

    The parity run pins ``jax_default_matmul_precision='highest'`` and
    ``DFD_DISABLE_PALLAS=1`` for measurement fidelity; both are restored
    afterwards so an in-process caller (pytest) doesn't inherit silently
    changed numerics/kernel dispatch for every later test.
    """
    import os

    import jax

    prior_prec = jax.config.jax_default_matmul_precision
    prior_env = os.environ.get("DFD_DISABLE_PALLAS")
    try:
        return _run_pipeline_parity_impl(
            model_name, weights, images_root, img_size, batch, num_classes,
            val_split, test_split, num_workers,
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prior_prec)
        if prior_env is None:
            os.environ.pop("DFD_DISABLE_PALLAS", None)
        else:
            os.environ["DFD_DISABLE_PALLAS"] = prior_env


def _run_pipeline_parity_impl(
    model_name: str,
    weights: Path,
    images_root: Path,
    img_size: int = 224,
    batch: int = 32,
    num_classes: int = 2,
    val_split: str = "val",
    test_split: str = "test",
    num_workers: int = 0,
) -> dict:
    """Full-pipeline two-implementation parity (VERDICT r3 #1).

    Runs the reference's COMPOSED eval semantics — decode →
    build_eval_transforms (ref orchestrator.py:316-347) → model → 501-point
    threshold sweep (ref orchestrator.py:513-546) → ``p₁ ≥ threshold``
    decisions → metrics (ref orchestrator.py:605-658) — through BOTH stacks
    on the SAME converted checkpoint and the SAME image tree:

    - this repo's real eval job (``evaluate/job.py``, f32 so numerics are
      the pipeline's, not bf16 rounding), and
    - an independent torch reimplementation of the whole job
      (tests/torch_refs/eval_pipeline.py — zero package imports).

    Reports per-image prediction agreement, threshold step delta (the sweep
    grid is 0.002), and accuracy/AUC deltas. The strongest parity statement
    an offline environment permits: "the PRODUCT agrees on real images",
    not just "logits agree on synthetic inputs".
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
    from deepfakedetection_tpu.registry import get_model_spec
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    # TPU MXU runs f32 matmuls as single-pass bf16 under the DEFAULT
    # precision; the parity measurement wants the pipeline's numerics, not
    # MXU rounding, so pin the float32 path for this process — and route
    # attention through XLA (the Pallas kernels compute bf16 internally by
    # design, which is the serving trade-off, not pipeline semantics)
    import os

    jax.config.update("jax_default_matmul_precision", "highest")
    os.environ["DFD_DISABLE_PALLAS"] = "1"

    spec = get_model_spec(model_name)
    images_root = Path(images_root)
    report: dict = {
        "mode": "pipeline",
        "model": model_name,
        "weights": str(weights),
        "images": str(images_root),
        "img_size": img_size,
    }

    # ---- torch stack: the independent full-job reimplementation ----------
    eval_model_kwargs: dict = {}
    torch_model, torch_src = _torch_reference_model(spec, num_classes)
    if torch_model is None:
        report["error"] = "no torch reference model importable for this family"
        return report
    report["torch_reference"] = torch_src
    import torch

    from deepfakedetection_tpu.runtime.checkpoint import is_torch_checkpoint

    if is_torch_checkpoint(Path(weights)):
        sd = torch.load(weights, map_location="cpu", weights_only=True)
        for wrapper in ("state_dict", "model"):
            if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
                sd = sd[wrapper]
    else:
        # native msgpack export: reverse-convert through the family name map
        # (runtime/torch_convert.export_torch_state_dict) so BOTH stacks run
        # the same checkpoint. A natively-TRAINED FasterViT may carry the
        # official wheel-parity layout (model_kwargs: head_config: official
        # in its train config) — sniff the param tree: the official config
        # has the ct_tokenizer_pos depthwise conv, the TPU config has the
        # ct_pos_embed learned table.
        native_official = False
        if spec.family == "fastervit":
            import flax.serialization as fser

            tree = fser.msgpack_restore(Path(weights).read_bytes())

            def _keys(t, out):
                if isinstance(t, dict):
                    for k, v in t.items():
                        out.append(str(k))
                        _keys(v, out)
                return out

            all_keys = set(_keys(tree, []))
            native_official = "ct_tokenizer_pos" in all_keys
            report["native_checkpoint_layout"] = (
                "official" if native_official else "tpu"
            )
            if native_official:
                eval_model_kwargs["head_config"] = "official"
        model = _build_flax(spec, num_classes, "f32", official_torch=native_official)
        restored, unmatched, _ = _init_and_load(model, spec, Path(weights), img_size)
        from deepfakedetection_tpu.runtime.torch_convert import (
            export_torch_state_dict,
        )

        report["native_checkpoint_unmatched"] = len(unmatched)
        sd = {
            k: torch.from_numpy(v)
            for k, v in export_torch_state_dict(restored, spec.family).items()
        }
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    report["torch_load_missing"] = [
        m for m in missing if not m.endswith("num_batches_tracked")
    ][:8]
    report["torch_load_unexpected"] = list(unexpected)[:8]

    tests_dir = str(Path(__file__).resolve().parent.parent / "tests")
    if tests_dir not in sys.path:
        sys.path.append(tests_dir)
    from torch_refs.eval_pipeline import run_reference_eval

    ref = run_reference_eval(
        torch_model, images_root, img_size,
        val_split=val_split, test_split=test_split, batch=batch,
    )

    # ---- JAX stack: the real eval job ------------------------------------
    with tempfile.TemporaryDirectory() as td:
        job = EvalJob(
            model_name=model_name,
            spec=spec,
            run_paths=ensure_run_dirs(Path(td), run_id="pipeline_parity"),
            data_root=images_root,
            split=test_split,
            val_split=val_split,
            num_classes=num_classes,
            img_size=img_size,
            batch_size=batch,
            num_workers=num_workers,
            weights=Path(weights),
            compute_dtype=jnp.float32,
            model_kwargs=eval_model_kwargs,
        )
        result = run_eval_job(job)
    if result is None:
        report["error"] = "JAX eval job produced no result"
        return report

    # ---- alignment + comparison ------------------------------------------
    ds = scan_image_folder(images_root / test_split)
    jax_files = [str(p) for p, _ in ds.samples]
    report["file_order_match"] = jax_files == ref["files"]
    n = len(ref["files"])
    report["n_images"] = n
    if not report["file_order_match"] or n == 0:
        return report

    pred_agree = int((result.preds == ref["preds"]).sum())
    report["pred_agreement"] = pred_agree / n
    report["pred_disagreements"] = n - pred_agree
    report["max_prob_delta"] = float(np.abs(result.probs - ref["probs"]).max())
    report["mean_prob_delta"] = float(np.abs(result.probs - ref["probs"]).mean())
    thr_jax = float(result.metrics.get("threshold", 0.5))
    thr_ref = float(ref["threshold"])
    report["threshold_jax"] = thr_jax
    report["threshold_torch"] = thr_ref
    # compare GRID INDICES, not raw deltas: np.linspace(0,1,501) steps are
    # not exactly 0.002 in float64, so abs(Δthr)/0.002 for one legitimate
    # grid step can compute to 1.0000000000000002 and flip the gate
    report["threshold_step_delta"] = abs(
        round(thr_jax / 0.002) - round(thr_ref / 0.002)
    )
    report["accuracy_jax"] = float(result.metrics["accuracy"])
    report["accuracy_torch"] = ref["accuracy"]
    report["accuracy_delta_images"] = abs(
        round(report["accuracy_jax"] * n) - round(ref["accuracy"] * n)
    )
    auc_jax = result.metrics.get("roc_auc")
    if auc_jax is not None and ref["roc_auc"] is not None:
        report["auroc_jax"] = float(auc_jax)
        report["auroc_torch"] = float(ref["roc_auc"])
        report["auroc_delta"] = abs(float(auc_jax) - float(ref["roc_auc"]))
    # the gate: ≤1 image disagreement, ≤1 sweep step, ≤0.1% metric deltas
    report["gate_pipeline"] = bool(
        report["pred_disagreements"] <= max(1, n // 1000)
        and report["threshold_step_delta"] <= 1.0
        and report["accuracy_delta_images"] <= max(1, n // 1000)
        and report.get("auroc_delta", 0.0) <= 1e-3
    )
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True)
    ap.add_argument("--weights", type=Path, required=True)
    ap.add_argument("--images", type=Path, default=None)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument(
        "--pipeline", action="store_true",
        help="full-job two-implementation parity over --images "
             "(val+test splits): decode→transforms→model→sweep→metrics "
             "through both stacks, per-image agreement",
    )
    ap.add_argument("--val-split", default="val")
    ap.add_argument("--test-split", default="test")
    ap.add_argument("--num-workers", type=int, default=0)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()
    if args.pipeline:
        if args.images is None:
            ap.error("--pipeline requires --images <root with val/test splits>")
        report = run_pipeline_parity(
            args.model, args.weights, args.images, args.img_size, args.batch,
            args.num_classes, val_split=args.val_split,
            test_split=args.test_split, num_workers=args.num_workers,
        )
    else:
        report = run_parity(
            args.model, args.weights, args.images, args.img_size, args.batch,
            args.num_classes,
        )
    text = json.dumps(report, indent=2, default=str)
    print(text)
    if args.json:
        args.json.write_text(text)


if __name__ == "__main__":
    main()
