"""PyTorch checkpoint → Flax param-tree conversion.

The reference publishes fine-tuned ``.pth`` weights (orchestrator.py:477-502
downloads them from GitHub Releases). torch-cpu is available in this image
purely as an unpickler; compute never touches torch. Conversion handles:
- ``{"state_dict":…}`` / ``{"model":…}`` wrappers (orchestrator.py:370-375)
- OIHW→HWIO conv layout, [O,I]→[I,O] dense layout, BN param/stat naming
- per-family name maps (EfficientNet fully mapped; other families best-effort
  by name normalization — unmatched leaves keep init values, strict=False).
"""

from __future__ import annotations

import io
import re
from typing import Any

import numpy as np


def _load_state_dict(blob: bytes) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(io.BytesIO(blob), map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for wrapper in ("state_dict", "model"):
            if wrapper in obj and isinstance(obj[wrapper], dict):
                obj = obj[wrapper]
                break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def _flatten(tree: Any, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    out: dict[tuple[str, ...], Any] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple[str, ...], Any]) -> dict:
    root: dict = {}
    for path, value in flat.items():
        node = root
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    return root


def _conv_to_hwio(w: np.ndarray, groups_depthwise: bool = False) -> np.ndarray:
    # torch conv weight: [O, I/groups, H, W] → flax: [H, W, I/groups, O]
    return np.transpose(w, (2, 3, 1, 0))


# Registered-buffer keys that are not weights (recomputed from shapes).
_SKIP_SUFFIXES = (
    "num_batches_tracked",
    "attention_bias_idxs",
    "attention_bias_cache",
    "relative_position_index",
    "relative_coords_table",
    "relative_bias",
)


def _layout(arr: np.ndarray, kind: str) -> np.ndarray:
    """Torch→flax layout transform per map-entry kind.

    "auto": by ndim (4D conv OIHW→HWIO, 2D dense [O,I]→[I,O], else copy);
    "none": copy as-is (bias tables, layer-scale gammas, 1D vectors);
    "talking_head": nn.Conv2d(h,h,1) weight [g,h,1,1] → einsum table [h,g].
    """
    if kind == "none":
        return arr
    if kind == "talking_head":
        h = arr.shape[0]
        return arr.reshape(h, h).T
    if arr.ndim == 4:
        return _conv_to_hwio(arr)
    if arr.ndim == 2:
        return arr.T
    return arr


def _efficientnet_name_map(flax_paths: list[tuple[str, ...]]) -> dict[str, tuple[str, ...]]:
    """Build efficientnet_pytorch name → flax path map.

    Relies on this repo's module naming (models/efficientnet.py):
    stem / stage{S}_block{R}/{expand,depthwise,se,project} / head_conv /
    classifier. Flat torch block index ↔ (stage, rep) is recovered by
    scanning the flax paths in stage/block order.
    """
    # ordered (stage, rep) pairs present in the flax tree
    blocks: list[tuple[int, int]] = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for p in flax_paths
            for m in [re.match(r"stage(\d+)_block(\d+)", p[0])]
            if m
        }
    )
    mapping: dict[str, tuple[str, ...]] = {}

    def bn(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        # ConvBN owns both conv and BN params at one level (models/common.py)
        mapping[f"{torch_prefix}.weight"] = flax_prefix + ("scale",)
        mapping[f"{torch_prefix}.bias"] = flax_prefix + ("bias",)
        mapping[f"{torch_prefix}.running_mean"] = flax_prefix + ("mean",)
        mapping[f"{torch_prefix}.running_var"] = flax_prefix + ("var",)

    mapping["_conv_stem.weight"] = ("stem", "kernel")
    bn("_bn0", ("stem",))
    for flat_idx, (stage, rep) in enumerate(blocks):
        b = f"_blocks.{flat_idx}"
        f = f"stage{stage}_block{rep}"
        mapping[f"{b}._expand_conv.weight"] = (f, "expand", "kernel")
        bn(f"{b}._bn0", (f, "expand"))
        mapping[f"{b}._depthwise_conv.weight"] = (f, "depthwise", "kernel")
        bn(f"{b}._bn1", (f, "depthwise"))
        mapping[f"{b}._se_reduce.weight"] = (f, "se", "reduce", "kernel")
        mapping[f"{b}._se_reduce.bias"] = (f, "se", "reduce", "bias")
        mapping[f"{b}._se_expand.weight"] = (f, "se", "expand", "kernel")
        mapping[f"{b}._se_expand.bias"] = (f, "se", "expand", "bias")
        mapping[f"{b}._project_conv.weight"] = (f, "project", "kernel")
        bn(f"{b}._bn2", (f, "project"))
    mapping["_conv_head.weight"] = ("head_conv", "kernel")
    bn("_bn1", ("head_conv",))
    mapping["_fc.weight"] = ("classifier", "kernel")
    mapping["_fc.bias"] = ("classifier", "bias")
    return mapping


def _efficientformer_v2_name_map(
    flax_paths: list[tuple[str, ...]],
) -> dict[str, tuple[tuple[str, ...], str]]:
    """timm ``efficientformerv2_*`` state-dict name → flax path map.

    Reference consumer: trainers/efficientformer_v2.py:327 (timm
    ``create_model``), model_registry.py:39-40. timm module layout:
    stem.conv{1,2} / stages.{s}.downsample.{conv,attn} /
    stages.{s}.blocks.{b}.{token_mixer,ls1,mlp,ls2} / norm / head+head_dist,
    where ConvNorm = .conv + .bn. This repo's flax naming
    (models/efficientformer_v2.py): stem_{0,1} / downsample_{s} /
    stages_{s}_block{b}_{attn,attn_res,ffn,ffn_res} / norm_out /
    head+head_dist. Alias spellings (``proj.1.conv`` vs ``proj.conv``) are
    both mapped since only one appears in a given timm version.
    """
    tops = {p[0] for p in flax_paths}
    mapping: dict[str, tuple[tuple[str, ...], str]] = {}

    def bn(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        mapping[f"{torch_prefix}.weight"] = (flax_prefix + ("scale",), "none")
        mapping[f"{torch_prefix}.bias"] = (flax_prefix + ("bias",), "none")
        mapping[f"{torch_prefix}.running_mean"] = (flax_prefix + ("mean",), "none")
        mapping[f"{torch_prefix}.running_var"] = (flax_prefix + ("var",), "none")

    def convbn(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        mapping[f"{torch_prefix}.conv.weight"] = (flax_prefix + ("kernel",), "auto")
        bn(f"{torch_prefix}.bn", flax_prefix)

    convbn("stem.conv1", ("stem_0",))
    convbn("stem.conv2", ("stem_1",))

    # downsamples: stage 1 plain conv; stages 2-3 conv + attention branch
    convbn("stages.1.downsample.conv", ("downsample_1",))
    for s in (2, 3):
        d = f"stages.{s}.downsample"
        f = f"downsample_{s}"
        convbn(f"{d}.conv", (f, "conv"))
        a = f"{d}.attn"
        mapping[f"{a}.q.local.weight"] = ((f, "q_local", "kernel"), "auto")
        mapping[f"{a}.q.local.bias"] = ((f, "q_local", "bias"), "none")
        convbn(f"{a}.q.proj", (f, "q"))
        convbn(f"{a}.k", (f, "k"))
        convbn(f"{a}.v", (f, "v"))
        convbn(f"{a}.v_local", (f, "v_local"))
        convbn(f"{a}.proj.1", (f, "proj"))  # Sequential(act, ConvNorm)
        convbn(f"{a}.proj", (f, "proj"))  # alias: bare ConvNorm spelling
        mapping[f"{a}.attention_biases"] = ((f, "attention_biases"), "none")

    # blocks, discovered from the flax tree (stages_{s}_block{b}_ffn etc.)
    blocks = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for p in tops
            for m in [re.match(r"stages_(\d+)_block(\d+)_ffn$", p)]
            if m
        }
    )
    for s, b in blocks:
        t = f"stages.{s}.blocks.{b}"
        f = f"stages_{s}_block{b}"
        convbn(f"{t}.mlp.fc1", (f"{f}_ffn", "fc1"))
        convbn(f"{t}.mlp.mid", (f"{f}_ffn", "mid"))
        convbn(f"{t}.mlp.fc2", (f"{f}_ffn", "fc2"))
        mapping[f"{t}.ls2.gamma"] = ((f"{f}_ffn_res", "gamma"), "none")
        if f"{f}_attn" in tops:
            tm = f"{t}.token_mixer"
            fa = f"{f}_attn"
            convbn(f"{tm}.stride_conv", (fa, "stride_conv"))
            convbn(f"{tm}.q", (fa, "q"))
            convbn(f"{tm}.k", (fa, "k"))
            convbn(f"{tm}.v", (fa, "v"))
            convbn(f"{tm}.v_local", (fa, "v_local"))
            convbn(f"{tm}.proj.1", (fa, "proj"))
            convbn(f"{tm}.proj", (fa, "proj"))  # alias
            for th in ("talking_head1", "talking_head2"):
                mapping[f"{tm}.{th}.weight"] = ((fa, th), "talking_head")
                mapping[f"{tm}.{th}.bias"] = ((fa, f"{th}_bias"), "none")
            mapping[f"{tm}.attention_biases"] = ((fa, "attention_biases"), "none")
            mapping[f"{t}.ls1.gamma"] = ((f"{f}_attn_res", "gamma"), "none")

    bn("norm", ("norm_out",))
    mapping["head.weight"] = (("head", "kernel"), "auto")
    mapping["head.bias"] = (("head", "bias"), "none")
    mapping["head_dist.weight"] = (("head_dist", "kernel"), "auto")
    mapping["head_dist.bias"] = (("head_dist", "bias"), "none")
    return mapping


def build_name_map(
    model_family: str | None, body_paths: list[tuple[str, ...]]
) -> dict[str, tuple[tuple[str, ...], str]]:
    """Torch-key → (flax body path, layout kind) map for a model family."""
    if model_family == "efficientnet":
        return {
            k: (v, "auto") for k, v in _efficientnet_name_map(body_paths).items()
        }
    if model_family in ("efficientformerv2", "efficientformer_v2"):
        return _efficientformer_v2_name_map(body_paths)
    if model_family in ("fastervit", "faster_vit"):
        from deepfakedetection_tpu.runtime.fastervit_convert import (
            fastervit_name_map,
        )

        return fastervit_name_map(body_paths)
    return {}


def convert_torch_checkpoint(
    blob: bytes, target: dict[str, Any], *, model_family: str | None = None
) -> tuple[dict[str, Any], list[str]]:
    """Convert a torch state dict into ``target``'s structure.

    Returns (new_tree, unmatched_torch_keys). Leaves absent from the torch
    checkpoint keep their init values (strict=False, orchestrator.py:370-375),
    but a checkpoint where NOTHING matches raises — silently evaluating on
    init weights would record chance-level metrics as a valid result.
    """
    state = _load_state_dict(blob)
    flat_target = _flatten(target)
    # target paths look like ("params", "stem", "conv", "kernel") or
    # ("batch_stats", "stem", "bn", "mean")
    body_paths = sorted({p[1:] for p in flat_target})
    name_map = build_name_map(model_family, body_paths)

    out = dict(flat_target)
    unmatched: list[str] = []
    matched = 0
    for torch_key, value in state.items():
        if torch_key.endswith(_SKIP_SUFFIXES):
            continue
        entry = name_map.get(torch_key)
        if entry is None:
            unmatched.append(torch_key)
            continue
        flax_body, kind = entry
        is_stat = flax_body[-1] in ("mean", "var")
        full = (("batch_stats",) if is_stat else ("params",)) + flax_body
        if full not in out:
            unmatched.append(torch_key)
            continue
        ref = out[full]
        arr = _layout(np.asarray(value), kind)
        if tuple(arr.shape) != tuple(np.shape(ref)):
            unmatched.append(f"{torch_key} (shape {arr.shape} vs {np.shape(ref)})")
            continue
        out[full] = arr.astype(np.asarray(ref).dtype)
        matched += 1
    # Fold stray conv biases into the following BatchNorm's running mean:
    # some timm builds give ConvNorm's conv a bias (the EFv2 ConvNorm
    # conv-bias question, PARITY.md). Our ConvBN has no conv_bias param for
    # these layers, but conv(x)+b → BN(mean μ) ≡ conv(x) → BN(mean μ-b), so
    # the checkpoint converts exactly rather than silently dropping the bias.
    still_unmatched: list[str] = []
    for key in unmatched:
        folded = False
        if key.endswith(".bias"):
            prefix = key[: -len(".bias")]  # e.g. "...attn.k.conv"
            for bn_name in (".bn", ""):  # "X.conv.bias"+"X.bn", "X.bias"+"X.bn"
                mean_key = (
                    prefix[: -len(".conv")] if prefix.endswith(".conv") else prefix
                ) + f"{bn_name}.running_mean"
                entry = name_map.get(mean_key)
                if entry is None:
                    continue
                full = ("batch_stats",) + entry[0]
                bias = np.asarray(state[key])
                if full in out and np.shape(out[full]) == bias.shape:
                    out[full] = (np.asarray(out[full]) - bias).astype(
                        np.asarray(out[full]).dtype
                    )
                    matched += 1
                    folded = True
                    break
        if not folded:
            still_unmatched.append(key)
    unmatched = still_unmatched
    if matched == 0 and state:
        raise ValueError(
            f"torch checkpoint conversion matched 0 of {len(state)} tensors "
            f"for model_family={model_family!r} — refusing to proceed on "
            "randomly-initialized weights"
        )
    return _unflatten(out), unmatched


def _inverse_layout(arr: np.ndarray, kind: str) -> np.ndarray:
    """Flax→torch layout transform — exact inverse of ``_layout``."""
    if kind == "none":
        return arr
    if kind == "talking_head":
        # flax einsum table [h, g] ← torch nn.Conv2d(h,h,1) [g, h, 1, 1]
        h, g = arr.shape
        return arr.T.reshape(g, h, 1, 1)
    if arr.ndim == 4:  # HWIO → OIHW
        return np.transpose(arr, (3, 2, 0, 1))
    if arr.ndim == 2:  # [I, O] → [O, I]
        return arr.T
    return arr


def export_torch_state_dict(
    target: dict[str, Any], model_family: str
) -> dict[str, np.ndarray]:
    """Reverse conversion: a flax ``{"params", "batch_stats"}`` tree → a
    reference-layout torch state dict (keys + OIHW/[O,I] layouts of the
    family's wheel), through the SAME name maps the import path uses.

    The migration story in the other direction: models fine-tuned on TPU
    load into the reference's torch stack (``trainers/*`` consumers) — and
    the pipeline-parity harness (tools/parity.py --pipeline) uses it to run
    native checkpoints through the independent torch eval reimplementation.
    Returns numpy arrays; wrap in ``torch.tensor`` to ``torch.save``.

    Note: torch-only parameters with no flax counterpart (e.g. a ConvNorm
    conv bias that the IMPORT path folds into BN running mean) are simply
    absent — load with ``strict=False`` and zero torch-side leftovers, or
    check the returned keys against the consumer's ``state_dict()``.
    """
    flat = _flatten(target)
    body = sorted({p[1:] for p in flat})
    name_map = build_name_map(model_family, body)
    if not name_map:
        raise ValueError(f"no name map for model_family={model_family!r}")
    sd: dict[str, np.ndarray] = {}
    emitted: set[tuple[tuple[str, ...], str]] = set()
    for torch_key, (path, kind) in name_map.items():
        is_stat = path[-1] in ("mean", "var")
        full = (("batch_stats",) if is_stat else ("params",)) + path
        if full not in flat or (path, kind) in emitted:
            continue  # absent in this config / alias spelling already emitted
        arr = np.asarray(flat[full], np.float32)
        sd[torch_key] = np.ascontiguousarray(_inverse_layout(arr, kind))
        emitted.add((path, kind))
    return sd
