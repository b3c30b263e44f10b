"""EfficientFormerV2 (S0/S1/S2/L) in Flax, NHWC, bf16-first.

TPU-native re-implementation of the timm backbone the reference consumes
(reference: trainers/efficientformer_v2.py:327 ``timm.create_model``;
orchestration/model_registry.py:39-40). Architecture follows the published
EfficientFormerV2 design (Li et al., "Rethinking Vision Transformers for
MobileNet Size and Speed", 2022):

- 4 stages; stages 1-2 are pure unified-FFN blocks (1x1 expand → depthwise
  3x3 → 1x1 project, BN between convs), stages 3-4 mix FFN blocks with 4D
  multi-head attention on the last ``vit_num`` blocks
- Attention4D: conv-projected q/k/v with a depthwise local-v branch,
  learned per-offset attention biases, talking-heads 1x1 convs across the
  head dim before/after softmax; stage-3 attention pools to 1/2 resolution
  and upsamples back (stride mode)
- hybrid downsampling into attention stages: strided conv + attention
  subsample branch
- dual classifier heads (head + dist_head) averaged at inference, matching
  the timm eval behavior the reference inherits.

All spatial ops stay NHWC; attention matmuls are [B*heads, N, N] MXU-shaped
with N = 49 at 224px. BN in f32, compute in bf16.
"""

from __future__ import annotations

import itertools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deepfakedetection_tpu.models.common import (
    BatchNorm2d,
    ConvBN,
    DropPath,
    gelu_exact,
)

# torch Conv2d(kernel=3, stride=2, padding=1): symmetric, unlike TF-SAME —
# required for grid parity with timm checkpoints on even-sized inputs.
_PAD1 = ((1, 1), (1, 1))

# variant: (widths, depths, vit_num, expansion tables)
_VARIANTS: dict[str, dict[str, Any]] = {
    "s0": {
        "dims": (32, 48, 96, 176),
        "depths": (2, 2, 6, 4),
        "vit_num": 2,
        "e_ratios": {
            0: [4, 4],
            1: [4, 4],
            2: [4, 3, 3, 3, 4, 4],
            3: [4, 3, 3, 4],
        },
    },
    "s1": {
        "dims": (32, 48, 120, 224),
        "depths": (3, 3, 9, 6),
        "vit_num": 2,
        "e_ratios": {
            0: [4, 4, 4],
            1: [4, 4, 4],
            2: [4, 4, 3, 3, 3, 3, 4, 4, 4],
            3: [4, 4, 3, 3, 4, 4],
        },
    },
    "s2": {
        "dims": (32, 64, 144, 288),
        "depths": (4, 4, 12, 8),
        "vit_num": 4,
        "e_ratios": {
            0: [4, 4, 4, 4],
            1: [4, 4, 4, 4],
            2: [4, 4, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4],
            3: [4, 4, 3, 3, 3, 3, 4, 4],
        },
    },
    "l": {
        "dims": (40, 80, 192, 384),
        "depths": (5, 5, 15, 10),
        "vit_num": 6,
        "e_ratios": {
            0: [4, 4, 4, 4, 4],
            1: [4, 4, 4, 4, 4],
            2: [4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4],
            3: [4, 4, 4, 3, 3, 3, 3, 4, 4, 4],
        },
    },
}

_LAYER_SCALE_INIT = 1e-5


class LayerScaleResidual(nn.Module):
    """x + drop_path(gamma * f(x)) with per-channel gamma."""

    drop_rate: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, fx, train: bool = False):
        gamma = self.param(
            "gamma", nn.initializers.constant(_LAYER_SCALE_INIT), (fx.shape[-1],), jnp.float32
        )
        return x + DropPath(self.drop_rate, name="drop_path")(
            fx * gamma.astype(fx.dtype), train
        )


class UnifiedFFN(nn.Module):
    """v2 FFN: 1x1 expand → dw3x3 (locality) → 1x1 project, BN after convs."""

    dim: int
    expansion: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.dim * self.expansion)
        h = ConvBN(hidden, (1, 1), act=gelu_exact, dtype=self.dtype, name="fc1")(x, train)
        h = ConvBN(
            hidden, (3, 3), groups=hidden, act=gelu_exact, dtype=self.dtype, name="mid"
        )(h, train)
        h = ConvBN(self.dim, (1, 1), dtype=self.dtype, name="fc2")(h, train)
        return h


def _attention_bias_index(resolution: tuple[int, int]) -> tuple[np.ndarray, int]:
    """Per-pair offset index table for learned attention biases.

    timm encoding (efficientformer_v2.py Attention2d): slot = |dy|*W + |dx|,
    table size H*W — the fixed encoding makes timm bias tables copy through
    weight conversion without permutation.
    """
    h, w = resolution
    points = list(itertools.product(range(h), range(w)))
    idxs = [
        abs(p1[0] - p2[0]) * w + abs(p1[1] - p2[1])
        for p1 in points
        for p2 in points
    ]
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), h * w


class Attention4D(nn.Module):
    """4D MHSA on an NHWC feature map (EfficientFormerV2 style).

    ``stride=2`` pools the map before attention and bilinearly upsamples the
    output back (the stage-3 configuration at 14x14 → 7x7).
    """

    dim: int
    key_dim: int = 32
    num_heads: int = 8
    attn_ratio: float = 4.0
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H0, W0, C = x.shape
        if self.stride > 1:
            x = ConvBN(
                C, (3, 3), strides=(self.stride, self.stride), groups=C,
                padding=_PAD1, dtype=self.dtype, name="stride_conv",
            )(x, train)
        B, H, W, _ = x.shape
        N = H * W
        dh = int(self.attn_ratio * self.key_dim)

        q = ConvBN(self.key_dim * self.num_heads, (1, 1), dtype=self.dtype, name="q")(x, train)
        k = ConvBN(self.key_dim * self.num_heads, (1, 1), dtype=self.dtype, name="k")(x, train)
        v = ConvBN(dh * self.num_heads, (1, 1), dtype=self.dtype, name="v")(x, train)
        # local enhancement of v (dw conv branch)
        v_local = ConvBN(
            dh * self.num_heads, (3, 3), groups=dh * self.num_heads,
            dtype=self.dtype, name="v_local",
        )(v, train)

        idx_table, n_offsets = _attention_bias_index((H, W))
        bias = self.param(
            "attention_biases",
            nn.initializers.zeros,
            (self.num_heads, n_offsets),
            jnp.float32,
        )
        th1 = self.param(
            "talking_head1", nn.initializers.normal(0.02),
            (self.num_heads, self.num_heads), jnp.float32,
        )
        th1_b = self.param(
            "talking_head1_bias", nn.initializers.zeros, (self.num_heads,), jnp.float32
        )
        th2 = self.param(
            "talking_head2", nn.initializers.normal(0.02),
            (self.num_heads, self.num_heads), jnp.float32,
        )
        th2_b = self.param(
            "talking_head2_bias", nn.initializers.zeros, (self.num_heads,), jnp.float32
        )

        from deepfakedetection_tpu.ops.attention import use_pallas_attn4d

        if use_pallas_attn4d(train):
            from deepfakedetection_tpu.ops.pallas.attn4d import attn4d_pallas

            out = attn4d_pallas(
                q.reshape(B, N, -1), k.reshape(B, N, -1), v.reshape(B, N, -1),
                bias[:, idx_table], th1, th1_b, th2, th2_b,
                num_heads=self.num_heads, scale=self.key_dim ** -0.5,
            )
            out = out.reshape(B, H, W, dh * self.num_heads)
        else:
            def heads(t, d):
                return t.reshape(B, N, self.num_heads, d).transpose(0, 2, 1, 3)

            qh = heads(q, self.key_dim)
            kh = heads(k, self.key_dim)
            vh = heads(v, dh)

            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32
            ) * (self.key_dim ** -0.5)
            attn = attn + bias[:, idx_table][None]

            # talking heads: 1x1 convs (with bias, like timm's nn.Conv2d)
            # across the head dimension
            attn = jnp.einsum("bhnm,hg->bgnm", attn, th1) + th1_b[None, :, None, None]
            attn = nn.softmax(attn, axis=-1)
            attn = (
                jnp.einsum("bhnm,hg->bgnm", attn, th2) + th2_b[None, :, None, None]
            ).astype(self.dtype)

            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, vh, preferred_element_type=jnp.float32
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, H, W, dh * self.num_heads)
        # bf16 from here: the dh=1024-channel upsample+gelu segment is pure
        # HBM traffic and feeds a bf16 conv anyway (sub-ulp effect on logits)
        out = (out + v_local.astype(jnp.float32)).astype(self.dtype)
        if self.stride > 1:
            # timm order: upsample BEFORE act+proj (act does not commute with
            # bilinear resize, so parity requires this exact order)
            out = jax.image.resize(
                out, (B, H0, W0, out.shape[-1]), method="bilinear"
            )
        out = gelu_exact(out).astype(self.dtype)
        out = ConvBN(self.dim, (1, 1), dtype=self.dtype, name="proj")(out, train)
        return out


class AttentionDownsample(nn.Module):
    """Attention-assisted 2x downsample (out = strided-conv(x) + attn branch).

    Mirrors timm's Downsample(use_attn=True) + Attention2dDownsample: heads
    are FIXED at 8 (timm leaves the default regardless of dim), and the query
    is a LocalGlobalQuery — proj(avgpool(x) + depthwise-conv-s2(x)).
    """

    out_dim: int
    key_dim: int = 16
    num_heads: int = 8
    attn_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        Ho, Wo = H // 2, W // 2
        num_heads = self.num_heads
        dh = int(self.attn_ratio * self.key_dim)

        conv_path = ConvBN(
            self.out_dim, (3, 3), strides=(2, 2), padding=_PAD1,
            dtype=self.dtype, name="conv",
        )(x, train)

        # LocalGlobalQuery: stride-2 subsample + depthwise local branch
        # (plain conv WITH bias, no BN — timm LocalGlobalQuery.local)
        q_pool = nn.avg_pool(x, (1, 1), strides=(2, 2))
        q_local = nn.Conv(
            C, (3, 3), strides=(2, 2), padding=_PAD1, feature_group_count=C,
            dtype=self.dtype, name="q_local",
        )(x)
        q = ConvBN(self.key_dim * num_heads, (1, 1), dtype=self.dtype, name="q")(
            q_pool + q_local, train
        )
        k = ConvBN(self.key_dim * num_heads, (1, 1), dtype=self.dtype, name="k")(x, train)
        v = ConvBN(dh * num_heads, (1, 1), dtype=self.dtype, name="v")(x, train)
        v_local = ConvBN(
            dh * num_heads, (3, 3), strides=(2, 2), groups=dh * num_heads,
            padding=_PAD1, dtype=self.dtype, name="v_local",
        )(v, train)

        Nq, Nk = Ho * Wo, H * W
        qh = q.reshape(B, Nq, num_heads, self.key_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Nk, num_heads, self.key_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Nk, num_heads, dh).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) * (self.key_dim ** -0.5)
        # learned bias between query (pooled) grid and key grid, timm encoding:
        # slot = |2*qy - ky| * W + |2*qx - kx|, table size H*W
        points_q = list(itertools.product(range(Ho), range(Wo)))
        points_k = list(itertools.product(range(H), range(W)))
        idxs = [
            abs(pq[0] * 2 - pk[0]) * W + abs(pq[1] * 2 - pk[1])
            for pq in points_q
            for pk in points_k
        ]
        idx_table = np.asarray(idxs, np.int32).reshape(Nq, Nk)
        bias = self.param(
            "attention_biases", nn.initializers.zeros,
            (num_heads, H * W), jnp.float32,
        )
        attn = attn + bias[:, idx_table][None]
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Ho, Wo, dh * num_heads)
        out = (out + v_local.astype(jnp.float32)).astype(self.dtype)
        out = gelu_exact(out)
        out = ConvBN(self.out_dim, (1, 1), dtype=self.dtype, name="proj")(out, train)
        return conv_path + out


class EfficientFormerV2(nn.Module):
    """EfficientFormerV2 classifier. Input NHWC normalized float; logits out."""

    num_classes: int
    dims: tuple[int, ...] = (32, 48, 120, 224)
    depths: tuple[int, ...] = (3, 3, 9, 6)
    vit_num: int = 2
    e_ratios: dict[int, list[int]] | None = None
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        e_ratios = self.e_ratios or _VARIANTS["s1"]["e_ratios"]
        # stem: two stride-2 convs (dims0//2 → dims0)
        x = ConvBN(
            self.dims[0] // 2, (3, 3), strides=(2, 2), act=gelu_exact,
            padding=_PAD1, dtype=self.dtype, name="stem_0",
        )(x, train)
        x = ConvBN(
            self.dims[0], (3, 3), strides=(2, 2), act=gelu_exact,
            padding=_PAD1, dtype=self.dtype, name="stem_1",
        )(x, train)

        total_blocks = sum(self.depths)
        block_counter = 0
        for stage in range(4):
            dim = self.dims[stage]
            if stage > 0:
                if stage >= 2:
                    x = AttentionDownsample(
                        dim, dtype=self.dtype, name=f"downsample_{stage}"
                    )(x, train)
                else:
                    x = ConvBN(
                        dim, (3, 3), strides=(2, 2), padding=_PAD1,
                        dtype=self.dtype, name=f"downsample_{stage}",
                    )(x, train)
            for block_idx in range(self.depths[stage]):
                ratio = e_ratios[stage][block_idx]
                dp_rate = self.drop_path_rate * block_counter / max(total_blocks - 1, 1)
                use_attn = (
                    stage >= 2
                    and block_idx > self.depths[stage] - 1 - self.vit_num
                )
                prefix = f"stages_{stage}_block{block_idx}"
                if use_attn:
                    attn_out = Attention4D(
                        dim,
                        stride=2 if stage == 2 else 1,
                        dtype=self.dtype,
                        name=f"{prefix}_attn",
                    )(x, train)
                    x = LayerScaleResidual(
                        dp_rate, dtype=self.dtype, name=f"{prefix}_attn_res"
                    )(x, attn_out, train)
                ffn_out = UnifiedFFN(
                    dim, ratio, dtype=self.dtype, name=f"{prefix}_ffn"
                )(x, train)
                x = LayerScaleResidual(
                    dp_rate, dtype=self.dtype, name=f"{prefix}_ffn_res"
                )(x, ffn_out, train)
                block_counter += 1

        x = BatchNorm2d(dtype=self.dtype, name="norm_out")(
            x, use_running_average=not train
        )
        self.sow("intermediates", "cam_features", x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        # dual heads averaged (timm efficientformerv2 eval behavior)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)
        logits_dist = nn.Dense(self.num_classes, dtype=jnp.float32, name="head_dist")(x)
        return (logits + logits_dist) / 2.0


def create_efficientformer_v2(
    variant: str = "s1", *, num_classes: int = 2, dtype: Any = jnp.bfloat16
) -> EfficientFormerV2:
    if variant not in _VARIANTS:
        raise KeyError(f"unknown EfficientFormerV2 variant '{variant}'")
    cfg = _VARIANTS[variant]
    return EfficientFormerV2(
        num_classes=num_classes,
        dims=cfg["dims"],
        depths=cfg["depths"],
        vit_num=cfg["vit_num"],
        e_ratios=cfg["e_ratios"],
        drop_path_rate=0.0,
        dtype=dtype,
    )
