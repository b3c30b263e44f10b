"""FasterViT (0–4) in Flax, NHWC, bf16-first.

TPU-native re-implementation of the backbone the reference consumes from the
``fastervit`` wheel (reference: trainers/fastervit.py:371 ``create_model``,
orchestration/model_registry.py:43-47 swaps ``head``). Architecture follows
the published FasterViT design (Hatamizadeh et al., "FasterViT: Fast Vision
Transformers with Hierarchical Attention", 2023 — PAPERS.md):

- conv stem (two stride-2 3x3+BN+ReLU) then 4 stages with 2x channel growth
- stages 1-2: residual conv blocks (3x3+BN+GELU → 3x3+BN, layer-scale)
- stages 3-4: windowed transformer blocks with Hierarchical ATtention:
  per-window carrier tokens (CTs) summarize each window (avg-pool
  tokenizer), attend globally among themselves, then join their window's
  tokens for local attention; at the stage end CT content is propagated
  back into the window tokens (nearest upsample + add)
- stage 4 at 7x7 equals one window → plain global attention, no CTs.

TPU mapping: window partition is a reshape/transpose (static shapes), HAT
attention batches [B*nW, ct²+win², C] onto the MXU, CT attention batches
[B, nCT, C]. Two positional modes:

- ``pos_mode="table"`` (the TPU-native default): learned relative bias
  tables per attention and learned absolute embeddings for CTs/window
  tokens — same role as the wheel's MLP embeddings, simpler and faster.
- ``pos_mode="cpb"`` (the "official" parity mode): the wheel's exact
  scheme — per-block absolute-position MLPs (PosEmbMLPSwinv1D: coords →
  512 → dim, added to tokens), log-CPB relative bias MLPs
  (PosEmbMLPSwinv2D: 16·sigmoid(MLP(log-scaled rel coords)), zero-padded
  over carrier-token rows/cols), carrier tokens dewindowed to grid-major
  for their global attention, conv-based CT tokenizer, no layer scale, no
  CT propagation, conv biases in stages 1-2. Required for loading
  converted official checkpoints (ref consumer: trainers/fastervit.py:371).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deepfakedetection_tpu.models.common import (
    BatchNorm2d,
    ConvBN,
    DropPath,
    Mlp,
    gelu_exact,
)

# torch Conv2d(k=3, s=2, padding=1): symmetric, unlike TF-SAME on even inputs
_PAD1 = ((1, 1), (1, 1))

_VARIANTS: dict[str, dict[str, Any]] = {
    "0": {"dim": 64, "in_dim": 64, "depths": (2, 3, 6, 5), "num_heads": (2, 4, 8, 16)},
    "1": {"dim": 80, "in_dim": 32, "depths": (1, 3, 8, 5), "num_heads": (2, 4, 8, 16)},
    "2": {"dim": 96, "in_dim": 64, "depths": (3, 3, 8, 5), "num_heads": (2, 4, 8, 16)},
    "3": {"dim": 128, "in_dim": 64, "depths": (3, 3, 12, 5), "num_heads": (2, 4, 8, 16)},
    "4": {"dim": 196, "in_dim": 64, "depths": (3, 3, 12, 5), "num_heads": (4, 8, 16, 32)},
}


def _tpu_heads(dim: int, official: tuple[int, ...]) -> tuple[int, ...]:
    """Re-bucket attention heads so head_dim == 128 (one full lane width).

    The official head counts give head_dim 48 — a GPU-era choice. At these
    tiny windows (49-53 tokens) the attention matmuls are lane-padded to 128
    anyway, so fewer, 128-wide heads cut padded FLOPs and HBM traffic:
    measured +40% end-to-end eval throughput on v5e for FasterViT-2
    (4.3k → 6.1k img/s) with identical parameter count.
    """
    heads = []
    for stage in range(len(official)):
        stage_dim = dim * (2**stage)
        h = max(stage_dim // 128, 1)
        # head count must divide the stage dim (qkv reshape [.., h, dim//h]);
        # walk down to the nearest divisor, falling back to the official
        # count (always valid) — e.g. FasterViT-4's dim 196 stages have no
        # ~128-wide divisor split
        while h > 1 and stage_dim % h:
            h -= 1
        if stage_dim % h:
            h = official[stage]
        heads.append(h)
    return tuple(heads)

_LAYER_SCALE_INIT = 1e-5


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[B,H,W,C] → [B*nW, win*win, C] (static reshape/transpose)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // win, win, W // win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // win) * (W // win), win * win, C)


def window_reverse(x: jnp.ndarray, win: int, H: int, W: int, B: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    C = x.shape[-1]
    x = x.reshape(B, H // win, W // win, win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def ct_dewindow(ct: jnp.ndarray, n_win: int, cs: int) -> jnp.ndarray:
    """Window-major CT sequence → grid row-major (wheel's ct_dewindow).

    ct: [B, n_win²·cs², C] ordered (wy, wx, iy, ix) → [B, same, C] ordered
    by global grid row y=wy·cs+iy, col x=wx·cs+ix. Static transpose.
    """
    B, N, C = ct.shape
    g = ct.reshape(B, n_win, n_win, cs, cs, C)
    return g.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, C)


def ct_window(ct: jnp.ndarray, n_win: int, cs: int) -> jnp.ndarray:
    """Inverse of ct_dewindow (grid row-major → window-major)."""
    B, N, C = ct.shape
    g = ct.reshape(B, n_win, cs, n_win, cs, C)
    return g.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, C)


@lru_cache(maxsize=None)
def _abs_grid_coords(s: int) -> np.ndarray:
    """[s², 2] row-major grid coords normalized by s//2 (PosEmbMLPSwinv1D)."""
    c = (np.arange(s, dtype=np.float32) - s // 2) / max(s // 2, 1)
    yy, xx = np.meshgrid(c, c, indexing="ij")
    return np.stack([yy, xx], axis=-1).reshape(-1, 2)


@lru_cache(maxsize=None)
def _rel_coords_log(h: int, w: int) -> np.ndarray:
    """[(2h-1)(2w-1), 2] log-scaled relative coords (PosEmbMLPSwinv2D)."""
    ch = np.arange(-(h - 1), h, dtype=np.float32) / max(h - 1, 1)
    cw = np.arange(-(w - 1), w, dtype=np.float32) / max(w - 1, 1)
    yy, xx = np.meshgrid(ch, cw, indexing="ij")
    t = np.stack([yy, xx], axis=-1) * 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8.0)
    return t.reshape(-1, 2)


@lru_cache(maxsize=None)
def _rel_position_index(h: int, w: int) -> np.ndarray:
    """[h·w, h·w] swin-style relative-position index into the coords table."""
    coords = np.stack(
        np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), 0
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1).astype(np.int32)


class AbsPosMLP(nn.Module):
    """PosEmbMLPSwinv1D(rank=2): x + MLP(grid coords), MLP = 2→512→dim."""

    dim: int
    grid: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        coords = jnp.asarray(_abs_grid_coords(self.grid))
        h = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(coords)
        h = nn.relu(h)
        h = nn.Dense(self.dim, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(h)
        return x + h[None].astype(x.dtype)


class RelPosBiasMLP(nn.Module):
    """PosEmbMLPSwinv2D: 16·sigmoid(MLP(log rel coords)), padded for CTs.

    Returns [num_heads, n_global+N, n_global+N] with zeros in the leading
    ``n_global`` rows/cols (the wheel zero-pads carrier-token positions).
    """

    num_heads: int
    window: tuple[int, int]
    n_global: int = 0

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        h_, w_ = self.window
        table = jnp.asarray(_rel_coords_log(h_, w_))
        t = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
        t = nn.relu(t)
        t = nn.Dense(self.num_heads, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(t)
        idx = jnp.asarray(_rel_position_index(h_, w_))
        bias = 16.0 * nn.sigmoid(t[idx])  # [N, N, heads]
        bias = bias.transpose(2, 0, 1)
        if self.n_global:
            bias = jnp.pad(
                bias, ((0, 0), (self.n_global, 0), (self.n_global, 0))
            )
        return bias


class _DenseParams(nn.Module):
    """Declares a Dense layer's parameters (flax-default inits) WITHOUT
    applying it — used by the fused attention sub-block so the param tree
    stays byte-identical to the nn.Dense path (same checkpoint format)."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
        )
        return kernel, bias


class TokenAttention(nn.Module):
    """MHSA over a token sequence with a per-head [N,N] bias.

    ``pos_mode="table"``: learned bias table (TPU-native default).
    ``pos_mode="cpb"``: official log-CPB MLP bias (PosEmbMLPSwinv2D) over the
    ``window`` grid, zero-padded over ``n_global`` leading CT positions.
    Dispatches to the fused Pallas window-attention kernel for TPU inference
    (ops/attention.py), XLA einsums otherwise.
    """

    dim: int
    num_heads: int
    pos_mode: str = "table"
    window: tuple[int, int] | None = None
    n_global: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from deepfakedetection_tpu.ops.attention import (
            use_pallas_for,
            window_attn_subblock,
            window_mhsa_qkv_pallas,
        )
        from deepfakedetection_tpu.ops.pallas.attn_block import (
            use_fused_attn_subblock,
        )

        B, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim ** -0.5
        if self.pos_mode == "cpb":
            bias_fn = lambda: RelPosBiasMLP(  # noqa: E731
                h, self.window, self.n_global, name="pos_emb_funct"
            )()
        else:
            bias_fn = lambda: self.param(  # noqa: E731
                "rel_bias", nn.initializers.zeros, (h, N, N), jnp.float32
            )
        if use_pallas_for(head_dim, train) and use_fused_attn_subblock():
            # fully-fused sub-block: qkv/ctx never round-trip HBM. The
            # param holders keep the flax tree identical to the Dense path
            # (same names/shapes/inits → same checkpoints).
            wqkv, bqkv = _DenseParams(C, 3 * C, name="qkv")()
            wproj, bproj = _DenseParams(C, C, name="proj")()
            return window_attn_subblock(
                x, wqkv, bqkv, bias_fn(), wproj, bproj,
                num_heads=h, scale=scale,
            ).astype(self.dtype)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        bias = bias_fn()
        # N >= 32: the 16-token carrier-token attentions are cheaper on the
        # XLA einsum path (A/B: official train 1,666 -> 1,683 img/s; eval
        # and aligned-head train neutral) - the Pallas call's pad/slice
        # overhead dominates at that size
        if use_pallas_for(head_dim, train) and N >= 32:
            out = window_mhsa_qkv_pallas(
                qkv, bias, num_heads=h, scale=scale, train=train
            ).astype(self.dtype)
        else:
            qkv5 = qkv.reshape(B, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv5[0], qkv5[1], qkv5[2]  # [B,h,N,d]
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * scale
            attn = nn.softmax(attn + bias[None], axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class TransformerSubBlock(nn.Module):
    """prenorm attention + prenorm MLP, with drop-path and optional layer-scale.

    ``layer_scale=None`` means plain residuals — the wheel's 224 models are
    built with layer_scale=None, so the official parity mode has no gammas.
    LayerNorm eps 1e-5 matches torch nn.LayerNorm's default.
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    drop_path_rate: float
    layer_scale: float | None = _LAYER_SCALE_INIT
    pos_mode: str = "table"
    window: tuple[int, int] | None = None
    n_global: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def scaled(name, fx):
            if self.layer_scale is not None:
                gamma = self.param(
                    f"{name}_gamma", nn.initializers.constant(self.layer_scale),
                    (self.dim,), jnp.float32,
                )
                fx = fx * gamma.astype(fx.dtype)
            return DropPath(self.drop_path_rate, name=f"{name}_dp")(fx, train)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + scaled("attn", TokenAttention(
            self.dim, self.num_heads, pos_mode=self.pos_mode, window=self.window,
            n_global=self.n_global, dtype=self.dtype, name="attn")(h, train))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + scaled("mlp", Mlp(
            int(self.dim * self.mlp_ratio), self.dim, act=gelu_exact,
            dtype=self.dtype, name="mlp")(h))
        return x


class ConvBlock(nn.Module):
    """Residual conv block for stages 1-2.

    The wheel's ConvBlock convs carry biases (nn.Conv2d default) and its 224
    models have no conv layer scale (layer_scale_conv=None) — the official
    mode mirrors both; the TPU mode keeps bias-free ConvBN + layer scale.
    """

    dim: int
    drop_path_rate: float
    layer_scale: float | None = _LAYER_SCALE_INIT
    use_conv_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = ConvBN(self.dim, (3, 3), act=gelu_exact, use_bias=self.use_conv_bias,
                   dtype=self.dtype, name="conv1")(x, train)
        h = ConvBN(self.dim, (3, 3), use_bias=self.use_conv_bias,
                   dtype=self.dtype, name="conv2")(h, train)
        if self.layer_scale is not None:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale),
                (self.dim,), jnp.float32,
            )
            h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path_rate, name="dp")(h, train)


class Downsample(nn.Module):
    """LayerNorm (channel, eps 1e-6 like timm LayerNorm2d) + 3x3/2 conv."""

    dim_out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Conv(
            self.dim_out, (3, 3), strides=(2, 2), padding=_PAD1, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)


class HATBlock(nn.Module):
    """Hierarchical-attention block over (carrier tokens, window tokens).

    ``pos_mode="cpb"`` reproduces the wheel's HAT exactly: per-block absolute
    MLP embeddings on window tokens and (grid-major, dewindowed) carrier
    tokens, log-CPB attention biases, no layer scale, no propagation
    (do_propagation=False in the released 224 models).
    """

    dim: int
    num_heads: int
    window_size: int
    ct_size: int
    mlp_ratio: float
    drop_path_rate: float
    last: bool  # propagate CT content back into windows after this block
    n_win_side: int = 2  # windows per side (sr_ratio) — for CT dewindowing
    pos_mode: str = "table"
    layer_scale: float | None = _LAYER_SCALE_INIT
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_windows: jnp.ndarray, ct: jnp.ndarray, train: bool = False):
        """x_windows: [B*nW, win², C]; ct: [B, nW*ct², C] (window-major)."""
        BnW, Nw, C = x_windows.shape
        Bct, Nct_total, _ = ct.shape
        ct_per_win = self.ct_size * self.ct_size
        official = self.pos_mode == "cpb"
        ct_grid_side = self.ct_size * self.n_win_side

        if official:
            # per-block absolute position MLP on window tokens (wheel's
            # HAT.pos_embed, applied before anything else each block)
            x_windows = AbsPosMLP(
                self.dim, self.window_size, dtype=self.dtype, name="pos_embed"
            )(x_windows)

        # 1) carrier tokens attend globally among themselves
        if official:
            # the wheel runs CT attention in grid-major order (ct_dewindow),
            # where its absolute/relative position MLPs are defined
            ctg = ct_dewindow(ct, self.n_win_side, self.ct_size)
            ctg = AbsPosMLP(
                self.dim, ct_grid_side, dtype=self.dtype, name="hat_pos_embed"
            )(ctg)
            ctg = TransformerSubBlock(
                self.dim, self.num_heads, self.mlp_ratio, self.drop_path_rate,
                layer_scale=self.layer_scale, pos_mode="cpb",
                window=(ct_grid_side, ct_grid_side), dtype=self.dtype, name="hat",
            )(ctg, train)
            ct = ct_window(ctg, self.n_win_side, self.ct_size)
        else:
            ct = TransformerSubBlock(
                self.dim, self.num_heads, self.mlp_ratio, self.drop_path_rate,
                layer_scale=self.layer_scale, dtype=self.dtype, name="hat",
            )(ct, train)

        # 2) each window attends jointly over [its CTs ; its tokens]
        ct_windows = ct.reshape(BnW, ct_per_win, C)
        y = jnp.concatenate([ct_windows, x_windows], axis=1)
        y = TransformerSubBlock(
            self.dim, self.num_heads, self.mlp_ratio, self.drop_path_rate,
            layer_scale=self.layer_scale,
            pos_mode=self.pos_mode,
            window=(self.window_size, self.window_size),
            n_global=ct_per_win if official else 0,
            dtype=self.dtype, name="win",
        )(y, train)
        ct_windows, x_windows = y[:, :ct_per_win], y[:, ct_per_win:]
        ct = ct_windows.reshape(Bct, Nct_total, C)

        if self.last and not official:
            # global feature propagation: nearest-upsample each window's CT
            # grid (ct×ct) to (win×win) and add to the window tokens.
            # The wheel's 224 models ship do_propagation=False, so the
            # official mode skips this.
            cs, ws = self.ct_size, self.window_size
            grid = ct_windows.reshape(BnW, cs, cs, C)
            reps = ws // cs + (1 if ws % cs else 0)
            up = jnp.repeat(jnp.repeat(grid, reps, axis=1), reps, axis=2)[:, :ws, :ws]
            x_windows = x_windows + up.reshape(BnW, Nw, C)
        return x_windows, ct


class PlainBlock(nn.Module):
    """Stage-4 block: the 7x7 map is one window → plain global attention.

    In official mode this is the wheel's HAT with sr_ratio=1: a per-block
    absolute MLP embedding followed by CPB-biased attention + MLP.
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    drop_path_rate: float
    grid: int = 7
    pos_mode: str = "table"
    layer_scale: float | None = _LAYER_SCALE_INIT
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.pos_mode == "cpb":
            tokens = AbsPosMLP(
                self.dim, self.grid, dtype=self.dtype, name="pos_embed"
            )(tokens)
        return TransformerSubBlock(
            self.dim, self.num_heads, self.mlp_ratio, self.drop_path_rate,
            layer_scale=self.layer_scale, pos_mode=self.pos_mode,
            window=(self.grid, self.grid), dtype=self.dtype, name="blk",
        )(tokens, train)


class FasterViT(nn.Module):
    """FasterViT classifier. Input NHWC normalized float; output logits."""

    num_classes: int
    dim: int = 96
    in_dim: int = 64
    depths: tuple[int, ...] = (3, 3, 8, 5)
    num_heads: tuple[int, ...] = (2, 4, 8, 16)
    window_size: int = 7
    ct_size: int = 2
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    # "table" = TPU-native learned tables; "cpb" = wheel-exact parity mode
    pos_mode: str = "table"
    # BENCHMARK-ONLY (no checkpoint compatibility): override the conv
    # stage 1-2 channel counts, e.g. (128, 256) pads the official 96/192
    # stages to full 128-lane MXU tiles. Exists to falsify-or-confirm the
    # docs/BENCHMARKS.md "lane-padding roofline" claim (VERDICT r3 weak #1):
    # if those convs are lane-limited, the padded shape's extra FLOPs are
    # ~free; if the step slows proportionally, the ceiling claim is wrong.
    conv_stage_dims: tuple[int, int] | None = None
    # Rematerialize the stage-1/2 ConvBlocks in the backward pass
    # (flax nn.remat, recompute-all policy). The round-4 falsification A/B
    # left HBM traffic at the conv stages' fusion depth as the open
    # official-train bottleneck (docs/BENCHMARKS.md "Round-4 falsification
    # A/B"); remat trades conv re-FLOPs (the stages have 25-40% MXU
    # headroom) for skipping the stored-activation write+read per block.
    # Numerics are unchanged (same ops, same order). A/B via
    # bench.py --conv-remat. False/None = off; "full" (or True) = recompute
    # the whole block; "save-conv" = save only the raw conv outputs
    # (checkpoint_name "convbn_raw" in ConvBN) and recompute just the
    # BN-normalize/GELU elementwise chains — no conv re-FLOPs.
    conv_remat: bool | str = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        official = self.pos_mode == "cpb"
        # official 224 models: layer_scale=None → plain residuals, conv biases
        layer_scale = None if official else _LAYER_SCALE_INIT
        # stem: 3 → in_dim → dim, each 3x3 stride 2 + BN + ReLU
        # (wheel PatchEmbed.conv_down: padding 1, BN eps 1e-4)
        x = ConvBN(self.in_dim, (3, 3), strides=(2, 2), act=nn.relu, padding=_PAD1,
                   bn_epsilon=1e-4, dtype=self.dtype, name="stem_0")(x, train)
        stem_out = (
            self.conv_stage_dims[0] if self.conv_stage_dims is not None else self.dim
        )
        x = ConvBN(stem_out, (3, 3), strides=(2, 2), act=nn.relu, padding=_PAD1,
                   bn_epsilon=1e-4, dtype=self.dtype, name="stem_1")(x, train)

        total = sum(self.depths)
        done = 0
        # ---- conv stages 1-2 --------------------------------------------
        for stage in range(2):
            dim = (
                self.conv_stage_dims[stage]
                if self.conv_stage_dims is not None
                else self.dim * (2 ** stage)
            )
            if stage > 0:
                x = Downsample(dim, dtype=self.dtype, name=f"downsample_{stage}")(x, train)
            if self.conv_remat in (True, "full"):
                block_cls = nn.remat(ConvBlock, static_argnums=(2,))
            elif self.conv_remat == "save-conv":
                block_cls = nn.remat(
                    ConvBlock,
                    static_argnums=(2,),
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "convbn_raw"
                    ),
                )
            else:
                block_cls = ConvBlock
            for blk in range(self.depths[stage]):
                dp = self.drop_path_rate * (done + blk) / max(total - 1, 1)
                x = block_cls(dim, dp, layer_scale=layer_scale,
                              use_conv_bias=official, dtype=self.dtype,
                              name=f"stage{stage}_block{blk}")(x, train)
            done += self.depths[stage]

        # ---- stage 3: HAT with carrier tokens ---------------------------
        stage = 2
        dim = self.dim * 4
        x = Downsample(dim, dtype=self.dtype, name="downsample_2")(x, train)
        B, H, W, _ = x.shape
        ws = self.window_size
        use_ct = H > ws or W > ws
        if use_ct and (H % ws or W % ws):
            raise ValueError(
                f"FasterViT stage-3 resolution {H}x{W} (img_size / 16) must "
                f"be divisible by window_size {ws}; use an img_size that is a "
                f"multiple of {16 * ws} (e.g. 224) or adjust window_size"
            )
        if use_ct:
            nWh, nWw = H // ws, W // ws
            ct_h = self.ct_size * nWh  # square maps: W-side CT count matches
            stride = H // ct_h
            kernel = H - (ct_h - 1) * stride
            if official:
                # wheel TokenInitializer: depthwise 3x3 conv (with bias) then
                # overlapping avg-pool — the conv IS the positional encoding
                feat = nn.Conv(
                    dim, (3, 3), feature_group_count=dim, dtype=self.dtype,
                    name="ct_tokenizer_pos",
                )(x)
            else:
                # TPU mode: learned absolute table instead of the conv
                pos = self.param(
                    "ct_pos_embed", nn.initializers.normal(0.02), (H, W, dim),
                    jnp.float32,
                )
                feat = x + pos.astype(self.dtype)
            ct_grid = nn.avg_pool(feat, (kernel, kernel), strides=(stride, stride))
            # group CTs window-major so [B,nW*ct², C] reshapes to per-window
            ct_grid = ct_grid.reshape(B, nWh, self.ct_size, nWw, self.ct_size, dim)
            ct = ct_grid.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, nWh * nWw * self.ct_size**2, dim
            )
            xw = window_partition(x, ws)
            if not official:
                win_pos = self.param(
                    "win_pos_embed", nn.initializers.normal(0.02), (ws * ws, dim),
                    jnp.float32,
                )
                xw = xw + win_pos.astype(self.dtype)[None]
            for blk in range(self.depths[stage]):
                dp = self.drop_path_rate * (done + blk) / max(total - 1, 1)
                xw, ct = HATBlock(
                    dim, self.num_heads[stage], ws, self.ct_size, self.mlp_ratio,
                    dp, last=(blk == self.depths[stage] - 1), n_win_side=nWh,
                    pos_mode=self.pos_mode, layer_scale=layer_scale,
                    dtype=self.dtype, name=f"stage2_block{blk}",
                )(xw, ct, train)
            x = window_reverse(xw, ws, H, W, B)
        else:  # small inputs degenerate to plain windowed attention
            tokens = x.reshape(B, H * W, dim)
            for blk in range(self.depths[stage]):
                dp = self.drop_path_rate * (done + blk) / max(total - 1, 1)
                tokens = PlainBlock(
                    dim, self.num_heads[stage], self.mlp_ratio, dp, grid=H,
                    pos_mode=self.pos_mode, layer_scale=layer_scale,
                    dtype=self.dtype, name=f"stage2_block{blk}",
                )(tokens, train)
            x = tokens.reshape(B, H, W, dim)
        done += self.depths[stage]

        # ---- stage 4: global attention (one window) ---------------------
        stage = 3
        dim = self.dim * 8
        x = Downsample(dim, dtype=self.dtype, name="downsample_3")(x, train)
        B, H, W, _ = x.shape
        tokens = x.reshape(B, H * W, dim)
        if not official:
            pos4 = self.param(
                "stage3_pos_embed", nn.initializers.normal(0.02), (H * W, dim),
                jnp.float32,
            )
            tokens = tokens + pos4.astype(self.dtype)[None]
        for blk in range(self.depths[stage]):
            dp = self.drop_path_rate * (done + blk) / max(total - 1, 1)
            tokens = PlainBlock(
                dim, self.num_heads[stage], self.mlp_ratio, dp, grid=H,
                pos_mode=self.pos_mode, layer_scale=layer_scale,
                dtype=self.dtype, name=f"stage3_block{blk}",
            )(tokens, train)
        x = tokens.reshape(B, H, W, dim)

        x = BatchNorm2d(dtype=self.dtype, name="norm_out")(
            x, use_running_average=not train
        )
        self.sow("intermediates", "cam_features", x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


def create_faster_vit(
    variant: str = "2",
    *,
    num_classes: int = 2,
    dtype: Any = jnp.bfloat16,
    head_config: str = "tpu",
    conv_stage_dims: tuple[int, int] | None = None,
    conv_remat: bool | str = False,
) -> FasterViT:
    """``head_config``: "tpu" (default) re-buckets heads to head_dim=128 for
    MXU/lane alignment and uses learned positional tables; "official" is the
    full parity configuration — the wheel's head counts AND its positional
    scheme (log-CPB MLPs, no layer scale, conv biases), required for loading
    converted official checkpoints (ref: trainers/fastervit.py:371).
    ``conv_stage_dims`` is BENCHMARK-ONLY (see FasterViT field docs)."""
    key = variant.split("_")[0]
    if key not in _VARIANTS:
        raise KeyError(f"unknown FasterViT variant '{variant}'")
    cfg = _VARIANTS[key]
    official = head_config == "official"
    heads = cfg["num_heads"] if official else _tpu_heads(cfg["dim"], cfg["num_heads"])
    return FasterViT(
        num_classes=num_classes,
        dim=cfg["dim"],
        in_dim=cfg["in_dim"],
        depths=cfg["depths"],
        num_heads=heads,
        pos_mode="cpb" if official else "table",
        conv_stage_dims=conv_stage_dims,
        conv_remat=conv_remat,
        dtype=dtype,
    )
