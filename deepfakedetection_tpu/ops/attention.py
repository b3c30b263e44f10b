"""Short-window multi-head attention: XLA reference + Pallas dispatch.

The model code calls ``window_mhsa`` with unpadded [B, N, h, d] tensors; this
module picks the fused Pallas kernel (TPU, inference AND training — the v2
kernel has a Pallas backward) or the XLA einsum path (non-TPU backends,
128-aligned heads), handling the tile padding contract of
ops/pallas/window_attn.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    from deepfakedetection_tpu.runtime.flags import on_tpu

    return on_tpu()


def use_pallas_default() -> bool:
    """The v1 per-head-layout kernel is opt-in: measured end-to-end on v5e
    the XLA einsum path wins for these tiny windows (DFD_ENABLE_PALLAS=1 to
    force)."""
    if os.environ.get("DFD_DISABLE_PALLAS"):
        return False
    if not os.environ.get("DFD_ENABLE_PALLAS"):
        return False
    return _on_tpu()


def use_pallas_for(head_dim: int, train: bool = False) -> bool:
    """Dispatch policy for the v2 head-masked kernel (measured on v5e,
    FasterViT-2 end-to-end):

    - lane-misaligned heads (head_dim % 128 != 0, e.g. the official d=48):
      v2 wins big — eval 4,302 → 5,353 img/s; train 1,306 → 1,627 img/s
      with the masked Pallas backward (window_attn.py _bwd_impl has the
      full A/B series) — ON by default for BOTH modes;
    - 128-aligned heads: mode-dependent (round-3 same-day A/Bs at batch
      128): EVAL stays XLA (7,214 vs 6,899), but TRAIN takes the kernel
      (1,875 vs 1,809 — the Pallas backward avoids the per-head relayouts
      XLA's autodiff pays even at aligned widths).
    """
    from deepfakedetection_tpu.runtime.flags import env_flag

    if env_flag("DFD_DISABLE_PALLAS"):
        return False
    if not _on_tpu():
        return False
    if env_flag("DFD_ENABLE_PALLAS"):
        return True
    return train or head_dim % 128 != 0


def use_pallas_attn4d(train: bool = False) -> bool:
    """Dispatch policy for the fused EfficientFormerV2 Attention4D kernel
    (ops/pallas/attn4d.py). Inference-only (no VJP). Default follows the
    v5e measurement in docs/BENCHMARKS.md; DFD_ENABLE_PALLAS_ATTN4D=1 /
    DFD_DISABLE_PALLAS=1 override."""
    from deepfakedetection_tpu.runtime.flags import env_flag

    if train or env_flag("DFD_DISABLE_PALLAS"):
        return False
    if not _on_tpu():
        return False
    return env_flag("DFD_ENABLE_PALLAS_ATTN4D")


def window_mhsa_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray, *, scale: float
) -> jnp.ndarray:
    """Reference path. q,k,v: [B,N,h,d]; bias: [h,N,N] f32 → [B,N,h*d].

    Transposes to [B,h,N,d] first — measured faster on v5e than einsum-ing
    the bnhd layout directly (XLA picks better matmul layouts).
    """
    B, N, h, d = q.shape
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(attn + bias[None].astype(jnp.float32), axis=-1)
    attn = attn.astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(B, N, h * d)


def window_mhsa_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    from deepfakedetection_tpu.ops.pallas.window_attn import fused_window_attention

    B, N, h, d = q.shape
    Np = _round_up(N, 64)
    Dp = _round_up(d, 64)

    def pad_bhnd(t):
        t = t.transpose(0, 2, 1, 3)  # [B,h,N,d]
        return jnp.pad(t, ((0, 0), (0, 0), (0, Np - N), (0, Dp - d))).astype(jnp.bfloat16)

    qp, kp, vp = pad_bhnd(q), pad_bhnd(k), pad_bhnd(v)
    bias_p = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, Np - N), (0, Np - N)),
        constant_values=0.0,
    )
    if Np > N:  # mask padded KEY columns out of the softmax
        col_mask = (jnp.arange(Np) >= N)[None, None, :]
        bias_p = jnp.where(col_mask, _NEG_INF, bias_p)
    out = fused_window_attention(qp, kp, vp, bias_p, scale=scale, interpret=interpret)
    out = out[:, :, :N, :d].transpose(0, 2, 1, 3)  # [B,N,h,d]
    return out.astype(q.dtype).reshape(B, N, h * d)


def window_mhsa_qkv_pallas(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    train: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention from the NATURAL qkv layout [B, N, 3C] (the Dense
    output, features ordered [3, h, d]) — no per-head transposes on the host
    at all. Differentiable: the kernel has a Pallas flash-style backward
    (window_attn.py ``window_attention_v2``), so this path serves training
    too. ``train`` picks the forward variant that wins each mode on v5e
    (masked full-K for eval, per-head sliced for train — measurements in
    window_attn.py ``_fwd_impl``/``_bwd_impl``). Returns [B, N, C]."""
    from deepfakedetection_tpu.ops.pallas.window_attn import (
        window_attention_v2,
    )

    B, N, threeC = qkv.shape
    Np = _round_up(N, 16)  # bf16 sublane tile
    qkv_p = qkv.astype(jnp.bfloat16)
    if Np > N:
        qkv_p = jnp.pad(qkv_p, ((0, 0), (0, Np - N), (0, 0)))
    bias_p = jnp.pad(
        bias.astype(jnp.float32), ((0, 0), (0, Np - N), (0, Np - N))
    )
    if Np > N:  # mask padded KEY columns out of the softmax
        col_mask = (jnp.arange(Np) >= N)[None, None, :]
        bias_p = jnp.where(col_mask, _NEG_INF, bias_p)
    out = window_attention_v2(
        qkv_p, bias_p, num_heads, scale, interpret,
        "sliced" if train else "masked",
    )
    return out[:, :N, :]


def window_attn_subblock(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused qkv-Dense → window MHSA → proj-Dense (ops/pallas/attn_block.py),
    handling the row padding + key-column −1e9 masking here. x: [B, N, C]
    unpadded → [B, N, C]."""
    from deepfakedetection_tpu.ops.pallas.attn_block import attn_subblock

    B, N, C = x.shape
    Np = _round_up(N, 16)
    xp = x.astype(jnp.bfloat16)
    if Np > N:
        xp = jnp.pad(xp, ((0, 0), (0, Np - N), (0, 0)))
    bias_p = jnp.pad(
        bias.astype(jnp.float32), ((0, 0), (0, Np - N), (0, Np - N))
    )
    if Np > N:
        col_mask = (jnp.arange(Np) >= N)[None, None, :]
        bias_p = jnp.where(col_mask, _NEG_INF, bias_p)
    out = attn_subblock(
        num_heads, scale, interpret, xp, wqkv, bqkv, bias_p, wproj, bproj
    )
    return out[:, :N, :]


def window_mhsa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    scale: float,
    train: bool = False,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Dispatch: fused Pallas kernel for TPU inference, XLA otherwise."""
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if train or not use_pallas:
        return window_mhsa_xla(q, k, v, bias, scale=scale)
    return window_mhsa_pallas(q, k, v, bias, scale=scale)
