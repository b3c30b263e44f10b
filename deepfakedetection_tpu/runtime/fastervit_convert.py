"""fastervit-wheel state-dict name map → this repo's Flax FasterViT paths.

Reference consumer: trainers/fastervit.py:371 (``fastervit.create_model``),
orchestration/model_registry.py:43-47. Wheel module layout:

    patch_embed.conv_down.{0,1,3,4}           stem convs + BNs
    levels.{0,1}.blocks.{b}.{conv1,norm1,conv2,norm2}
    levels.{i}.downsample.{norm,reduction.0}  i = 0,1,2 (level END)
    levels.2.global_tokenizer.to_global_feature.pos    CT tokenizer dw conv
    levels.{2,3}.blocks.{b}.{pos_embed,norm1,attn,norm2,mlp}
    levels.2.blocks.{b}.{hat_pos_embed,hat_norm1,hat_attn,hat_norm2,hat_mlp}
    norm / head

This repo (models/fastervit.py, pos_mode="cpb"): stem_{0,1} /
stage{0,1}_block{b}.conv{1,2} / downsample_{1,2,3} (at stage START, so
downsample_{s} ↔ levels.{s-1}.downsample) / ct_tokenizer_pos /
stage2_block{b}.{pos_embed,hat_pos_embed,hat,win} / stage3_block{b}.{pos_embed,blk}
/ norm_out / head. CPB MLPs: cpb_mlp.{0,2} ↔ cpb_fc{1,2}.

Only the official (pos_mode="cpb", official heads) configuration converts —
the map is derived from the flax tree, so a TPU-mode tree (learned tables)
simply yields no entries for the positional params and conversion of a real
checkpoint would fail its zero-match/shape guards loudly.
"""

from __future__ import annotations

import re

_MapEntry = tuple[tuple[str, ...], str]


def fastervit_name_map(
    flax_paths: list[tuple[str, ...]],
) -> dict[str, _MapEntry]:
    tops = {p[0] for p in flax_paths}
    sub = {(p[0], p[1]) for p in flax_paths if len(p) > 1}
    mapping: dict[str, _MapEntry] = {}

    def bn(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        mapping[f"{torch_prefix}.weight"] = (flax_prefix + ("scale",), "none")
        mapping[f"{torch_prefix}.bias"] = (flax_prefix + ("bias",), "none")
        mapping[f"{torch_prefix}.running_mean"] = (flax_prefix + ("mean",), "none")
        mapping[f"{torch_prefix}.running_var"] = (flax_prefix + ("var",), "none")

    def ln(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        mapping[f"{torch_prefix}.weight"] = (flax_prefix + ("scale",), "none")
        mapping[f"{torch_prefix}.bias"] = (flax_prefix + ("bias",), "none")

    def dense(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        mapping[f"{torch_prefix}.weight"] = (flax_prefix + ("kernel",), "auto")
        mapping[f"{torch_prefix}.bias"] = (flax_prefix + ("bias",), "none")

    def cpb(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        # PosEmbMLPSwinv1D/v2D: Sequential(Linear(2,512), ReLU, Linear(512,d))
        mapping[f"{torch_prefix}.cpb_mlp.0.weight"] = (
            flax_prefix + ("cpb_fc1", "kernel"), "auto")
        mapping[f"{torch_prefix}.cpb_mlp.0.bias"] = (
            flax_prefix + ("cpb_fc1", "bias"), "none")
        mapping[f"{torch_prefix}.cpb_mlp.2.weight"] = (
            flax_prefix + ("cpb_fc2", "kernel"), "auto")

    def subblock(torch_prefix: str, flax_prefix: tuple[str, ...]) -> None:
        """Wheel attention+mlp pair → a flax TransformerSubBlock subtree.

        torch_prefix covers norm1/attn/norm2/mlp; the wheel prefixes the CT
        sub-block's modules with hat_ (handled by the caller passing e.g.
        "levels.2.blocks.0.hat_" as a prefix ending in the separator).
        """
        ln(f"{torch_prefix}norm1", flax_prefix + ("norm1",))
        dense(f"{torch_prefix}attn.qkv", flax_prefix + ("attn", "qkv"))
        dense(f"{torch_prefix}attn.proj", flax_prefix + ("attn", "proj"))
        cpb(f"{torch_prefix}attn.pos_emb_funct", flax_prefix + ("attn", "pos_emb_funct"))
        ln(f"{torch_prefix}norm2", flax_prefix + ("norm2",))
        dense(f"{torch_prefix}mlp.fc1", flax_prefix + ("mlp", "fc1"))
        dense(f"{torch_prefix}mlp.fc2", flax_prefix + ("mlp", "fc2"))

    # stem (PatchEmbed.conv_down Sequential: conv,BN,ReLU,conv,BN,ReLU)
    mapping["patch_embed.conv_down.0.weight"] = (("stem_0", "kernel"), "auto")
    bn("patch_embed.conv_down.1", ("stem_0",))
    mapping["patch_embed.conv_down.3.weight"] = (("stem_1", "kernel"), "auto")
    bn("patch_embed.conv_down.4", ("stem_1",))

    # conv stages 1-2
    conv_blocks = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for p in tops
            for m in [re.match(r"stage([01])_block(\d+)$", p)]
            if m
        }
    )
    for s, b in conv_blocks:
        t = f"levels.{s}.blocks.{b}"
        f = f"stage{s}_block{b}"
        mapping[f"{t}.conv1.weight"] = ((f, "conv1", "kernel"), "auto")
        mapping[f"{t}.conv1.bias"] = ((f, "conv1", "conv_bias"), "none")
        bn(f"{t}.norm1", (f, "conv1"))
        mapping[f"{t}.conv2.weight"] = ((f, "conv2", "kernel"), "auto")
        mapping[f"{t}.conv2.bias"] = ((f, "conv2", "conv_bias"), "none")
        bn(f"{t}.norm2", (f, "conv2"))

    # downsamples: flax downsample_{s} (stage start) = wheel levels.{s-1} end
    for s in (1, 2, 3):
        if f"downsample_{s}" in tops:
            d = f"levels.{s - 1}.downsample"
            ln(f"{d}.norm", (f"downsample_{s}", "norm"))
            mapping[f"{d}.reduction.0.weight"] = (
                (f"downsample_{s}", "conv", "kernel"), "auto")

    # CT tokenizer: dw conv registered under BOTH names in the wheel
    if "ct_tokenizer_pos" in tops:
        for alias in (
            "levels.2.global_tokenizer.to_global_feature.pos",
            "levels.2.global_tokenizer.pos_embed",
        ):
            mapping[f"{alias}.weight"] = (("ct_tokenizer_pos", "kernel"), "auto")
            mapping[f"{alias}.bias"] = (("ct_tokenizer_pos", "bias"), "none")

    # transformer stages: stage2 = HAT blocks, stage3 = plain (sr_ratio=1)
    hat_blocks = sorted(
        int(m.group(1))
        for p in sub
        for m in [re.match(r"stage2_block(\d+)$", p[0])]
        if m and p[1] == "hat"
    )
    for b in hat_blocks:
        t = f"levels.2.blocks.{b}."
        f = f"stage2_block{b}"
        cpb(f"{t}pos_embed", (f, "pos_embed"))
        cpb(f"{t}hat_pos_embed", (f, "hat_pos_embed"))
        subblock(f"{t}hat_", (f, "hat"))
        subblock(t, (f, "win"))
    plain_blocks = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for p in tops
            for m in [re.match(r"stage([23])_block(\d+)$", p)]
            if m and (p, "blk") in sub
        }
    )
    for s, b in plain_blocks:
        # stage3 plain blocks are wheel level 3; a degenerate stage2 plain
        # path (small inputs) has no official counterpart and is skipped
        if s != 3:
            continue
        t = f"levels.3.blocks.{b}."
        f = f"stage3_block{b}"
        cpb(f"{t}pos_embed", (f, "pos_embed"))
        subblock(t, (f, "blk"))

    bn("norm", ("norm_out",))
    dense("head", ("head",))
    return mapping
