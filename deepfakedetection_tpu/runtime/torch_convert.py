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


def convert_torch_checkpoint(
    blob: bytes, target: dict[str, Any], *, model_family: str | None = None
) -> tuple[dict[str, Any], list[str]]:
    """Convert a torch state dict into ``target``'s structure.

    Returns (new_tree, unmatched_torch_keys). Leaves absent from the torch
    checkpoint keep their init values (strict=False, orchestrator.py:370-375).
    """
    state = _load_state_dict(blob)
    flat_target = _flatten(target)
    # target paths look like ("params", "stem", "conv", "kernel") or
    # ("batch_stats", "stem", "bn", "mean")
    body_paths = sorted({p[1:] for p in flat_target})

    if model_family == "efficientnet":
        name_map = _efficientnet_name_map([p for p in body_paths])
    else:
        name_map = {}

    out = dict(flat_target)
    unmatched: list[str] = []
    for torch_key, value in state.items():
        flax_body = name_map.get(torch_key)
        if flax_body is None:
            unmatched.append(torch_key)
            continue
        is_stat = flax_body[-1] in ("mean", "var")
        full = (("batch_stats",) if is_stat else ("params",)) + flax_body
        if full not in out:
            unmatched.append(torch_key)
            continue
        ref = out[full]
        arr = np.asarray(value)
        if arr.ndim == 4:  # conv OIHW → HWIO
            arr = _conv_to_hwio(arr)
        elif arr.ndim == 2:  # dense [O,I] → [I,O]
            arr = arr.T
        if tuple(arr.shape) != tuple(np.shape(ref)):
            unmatched.append(f"{torch_key} (shape {arr.shape} vs {np.shape(ref)})")
            continue
        out[full] = arr.astype(np.asarray(ref).dtype)
    return _unflatten(out), unmatched
