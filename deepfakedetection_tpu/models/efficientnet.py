"""EfficientNet (B0–B7) in Flax, NHWC, bf16-first.

TPU-native re-implementation of the backbone the reference consumes from the
``efficientnet_pytorch`` wheel (reference: trainers/efficientnet.py:405,
orchestration/model_registry.py:32-36 swaps ``_fc`` for num_classes). The
architecture follows the published EfficientNet recipe (Tan & Le, 2019):
MBConv blocks with expand→depthwise→SE→project, compound width/depth
scaling, stochastic depth 0.2 scaled by block index, BN eps 1e-3 /
momentum 0.99, SiLU.

Layout decisions for TPU: NHWC throughout (XLA's native conv layout),
compute in bf16 with f32 params/BN, SE pooling in f32. The final conv-head
feature map is sow()n into the 'intermediates' collection for Grad-CAM
(replacing the reference's forward hook on ``_conv_head``, web_ui.py:96-114).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deepfakedetection_tpu.models.common import (
    ConvBN,
    DropPath,
    SqueezeExcite,
    make_divisible,
)

# (expand_ratio, channels, repeats, stride, kernel) — base (B0) stages
_BASE_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# width, depth, train resolution, dropout
_VARIANTS: dict[str, tuple[float, float, int, float]] = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

_BN_MOMENTUM = 0.99
_BN_EPSILON = 1e-3


def _static_same_pads(size: int, kernel: int, stride: int):
    """TF-SAME padding FROZEN from a trace at ``size`` (efficientnet_pytorch
    Conv2dStaticSamePadding semantics: ``from_pretrained`` computes pads at
    the variant's native resolution — 300 for B3 — and applies them verbatim
    at any input size). At 224 this differs from dynamic SAME on the two
    k5/stride-2 depthwise convs (trace sizes 75 and 19 are odd → (2,2) pads
    where dynamic-at-224 would give (1,2)) — reproducing the frozen grid is
    required for logit parity with reference checkpoints."""
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    return ((total // 2, total - total // 2),) * 2


@dataclass(frozen=True)
class BlockArgs:
    in_features: int
    out_features: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float
    drop_rate: float
    # explicit depthwise padding from the static-SAME trace (see
    # _static_same_pads); "SAME" would re-derive from the RUNTIME size
    dw_padding: Any = "SAME"


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    args: BlockArgs
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = self.args
        shortcut = x
        mid = a.in_features * a.expand_ratio
        fused_expdw = False
        if a.expand_ratio != 1:
            from deepfakedetection_tpu.models.common import _symmetric_pad
            from deepfakedetection_tpu.ops import quant
            from deepfakedetection_tpu.ops.pallas.expand_dw import (
                fits_expdw,
                use_pallas_expdw,
            )

            # fused expand+dw+SiLU+pool Pallas path (eval, stride-1): the
            # 6x-expanded tensor never leaves VMEM (ops/pallas/expand_dw.py)
            fused_expdw = (
                not train
                and a.stride == 1
                and a.kernel in (3, 5)
                and _symmetric_pad(a.dw_padding, a.kernel)
                and fits_expdw(x.shape[1], x.shape[2], mid)
                and quant.current_ctx() is None
                and use_pallas_expdw(a.kernel)
            )
            expand = ConvBN(
                mid, (1, 1), act=nn.silu, bn_momentum=_BN_MOMENTUM,
                bn_epsilon=_BN_EPSILON, dtype=self.dtype, name="expand",
            )
            if fused_expdw:
                wexp, bexp = expand(x, fold_only=True)
            else:
                x = expand(x, train)
        # NOTE (profiled, round 3): XLA fuses the SE global-mean INTO each
        # depthwise-conv fusion; those fusions achieve only 44-233 GB/s and
        # hold 29 ms of the 50 ms eval step. Breaking the fusion with an
        # optimization_barrier was measured and REGRESSED (8,406 → 8,160
        # img/s) — the dw window arithmetic itself is the bound, not the
        # fusion shape. ``return_spatial_mean`` lets ConvBN serve stride-1
        # eval calls from the fused depthwise+SiLU+pool Pallas kernel
        # (ops/pallas/depthwise_se.py) when its dispatch enables it.
        depthwise = ConvBN(
            mid, (a.kernel, a.kernel), strides=(a.stride, a.stride), groups=mid,
            act=nn.silu, bn_momentum=_BN_MOMENTUM, bn_epsilon=_BN_EPSILON,
            padding=a.dw_padding, dtype=self.dtype, name="depthwise",
        )
        if fused_expdw:
            from deepfakedetection_tpu.ops.pallas.expand_dw import expand_dw_silu_pool

            wdw, bdw = depthwise(
                jnp.zeros((1, 1, 1, mid), self.dtype), fold_only=True
            )
            Cin = x.shape[-1]
            x, se_mean = expand_dw_silu_pool(
                x.astype(self.dtype),
                wexp.reshape(Cin, mid),
                bexp,
                wdw.reshape(a.kernel, a.kernel, mid),
                bdw,
                kernel=a.kernel,
            )
        else:
            x, se_mean = depthwise(x, train, return_spatial_mean=True)
        # SE reduction is computed from the block INPUT channels (paper + the
        # efficientnet_pytorch behavior the reference fine-tunes).
        se_features = max(1, int(a.in_features * a.se_ratio))
        x = SqueezeExcite(se_features, dtype=self.dtype, name="se")(x, pooled=se_mean)
        x = ConvBN(
            a.out_features, (1, 1), bn_momentum=_BN_MOMENTUM,
            bn_epsilon=_BN_EPSILON, dtype=self.dtype, name="project",
        )(x, train)
        if a.stride == 1 and a.in_features == a.out_features:
            x = DropPath(a.drop_rate, name="drop_path")(x, train)
            x = x + shortcut
        return x


class EfficientNet(nn.Module):
    """EfficientNet classifier. Input NHWC in [normalized] float; output logits."""

    num_classes: int
    width_coefficient: float = 1.2
    depth_coefficient: float = 1.4
    dropout_rate: float = 0.3
    drop_connect_rate: float = 0.2
    se_ratio: float = 0.25
    # the variant's native training resolution: static-SAME pads are frozen
    # from this trace like efficientnet_pytorch's Conv2dStaticSamePadding
    native_resolution: int = 300
    dtype: Any = jnp.bfloat16

    def round_filters(self, filters: int) -> int:
        return make_divisible(filters * self.width_coefficient, 8)

    def round_repeats(self, repeats: int) -> int:
        return int(math.ceil(self.depth_coefficient * repeats))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        trace = self.native_resolution  # static-pad trace size (300 for B3)
        x = ConvBN(
            self.round_filters(32), (3, 3), strides=(2, 2), act=nn.silu,
            bn_momentum=_BN_MOMENTUM, bn_epsilon=_BN_EPSILON,
            padding=_static_same_pads(trace, 3, 2), dtype=self.dtype,
            name="stem",
        )(x, train)
        trace = -(-trace // 2)

        total_blocks = sum(self.round_repeats(r) for _, _, r, _, _ in _BASE_BLOCKS)
        block_idx = 0
        in_features = self.round_filters(32)
        for stage_idx, (expand, channels, repeats, stride, kernel) in enumerate(_BASE_BLOCKS):
            out_features = self.round_filters(channels)
            for rep in range(self.round_repeats(repeats)):
                block_stride = stride if rep == 0 else 1
                args = BlockArgs(
                    in_features=in_features,
                    out_features=out_features,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=block_stride,
                    se_ratio=self.se_ratio,
                    drop_rate=self.drop_connect_rate * block_idx / max(total_blocks, 1),
                    dw_padding=_static_same_pads(trace, kernel, block_stride),
                )
                if block_stride > 1:
                    trace = -(-trace // block_stride)
                x = MBConv(args, dtype=self.dtype, name=f"stage{stage_idx}_block{rep}")(
                    x, train
                )
                in_features = out_features
                block_idx += 1

        x = ConvBN(
            self.round_filters(1280), (1, 1), act=nn.silu,
            bn_momentum=_BN_MOMENTUM, bn_epsilon=_BN_EPSILON, dtype=self.dtype,
            name="head_conv",
        )(x, train)
        # Grad-CAM target: the last conv feature map (reference prefers
        # model._conv_head, web_ui.py:108-114).
        self.sow("intermediates", "cam_features", x)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)
        return x


def create_efficientnet(
    variant: str = "b3", *, num_classes: int = 2, dtype: Any = jnp.bfloat16
) -> EfficientNet:
    if variant not in _VARIANTS:
        raise KeyError(f"unknown EfficientNet variant '{variant}'")
    width, depth, res, dropout = _VARIANTS[variant]
    return EfficientNet(
        num_classes=num_classes,
        width_coefficient=width,
        depth_coefficient=depth,
        dropout_rate=dropout,
        native_resolution=res,
        dtype=dtype,
    )
