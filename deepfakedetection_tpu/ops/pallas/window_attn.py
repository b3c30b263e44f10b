"""Fused short-window multi-head attention (Pallas TPU kernel).

Motivation (measured, see ops/attention.py dispatcher): FasterViT's windowed
attention runs at 53-token windows — XLA materializes the f32 [B, h, N, N]
score tensor in HBM and round-trips it through softmax, which dominates the
block time at these tiny matmul shapes. This kernel keeps q·kᵀ → +bias →
softmax → ·v entirely in VMEM per block of windows; HBM sees only q,k,v and
the output.

Layout contract (host side pads, ops/attention.py):
- q, k, v: [B, h, Np, Dp] bf16 — N and head_dim padded to multiples of the
  tile (Np, Dp ≥ actual, zeros in padding)
- bias: [h, Np, Np] f32 — relative-position bias with -1e9 on padded KEY
  columns (so softmax ignores them); padded query rows produce garbage that
  the caller slices off.
- out: [B, h, Np, Dp] bf16.

Used for inference; training takes the XLA path (the kernel has no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    # blocks: q/k/v [G, h, Np, Dp] bf16; bias [h, Np, Np] f32
    G, h, Np, Dp = q_ref.shape
    # flatten (G, h) into ONE batch dim (Mosaic tpu.matmul supports max 1)
    q = q_ref[:].reshape(G * h, Np, Dp)
    k = k_ref[:].reshape(G * h, Np, Dp)
    v = v_ref[:].reshape(G * h, Np, Dp)
    bias = bias_ref[:]  # [h, Np, Np] f32
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, Np, Np)
    scores = scores * scale + bias[None]
    # numerically-stable softmax on the VPU, all in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        probs.reshape(G * h, Np, Np), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G*h, Np, Dp]
    out_ref[:] = out.reshape(G, h, Np, Dp).astype(jnp.bfloat16)


def _attn_kernel_v2(qkv_ref, bias_ref, out_ref, *, scale: float, num_heads: int):
    """Head-masked full-K window attention.

    Tiny-head MHSA (head_dim 48 at 53 tokens) starves the MXU and forces
    lane-unaligned relayouts when q/k/v are split per head. This kernel never
    splits: per head it LANE-MASKS q and contracts over the FULL C dim —
    (q ⊙ mask_h)·k ≡ q_h·k_h because the mask zeroes every other head's
    products — so all matmuls run at K=C (lane-aligned, 3 full K tiles) and
    the only per-head ops are VPU selects. probs_h @ v uses the same trick on
    the output side: (P_h @ v) ⊙ mask_h summed over heads.

    qkv_ref: [G, Np, 3C] bf16 (natural Dense-output layout, N padded);
    bias_ref: [h, Np, Np] f32, -1e9 on padded KEY columns; out: [G, Np, C].
    """
    G, Np, threeC = qkv_ref.shape
    C = threeC // 3
    d = C // num_heads
    qkv = qkv_ref[:]
    q = qkv[:, :, 0:C]
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C : 3 * C]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, Np, C), 2)
    head_of_lane = lane // d
    out = jnp.zeros((G, Np, C), jnp.float32)
    for h in range(num_heads):
        mask = head_of_lane == h
        qh = jnp.where(mask, q, jnp.zeros_like(q))
        scores = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Np, Np] — q_h·k_h via the lane mask
        scores = scores * scale + bias_ref[h][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        ctx = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Np, C]
        out = out + jnp.where(mask, ctx, jnp.zeros_like(out))
    out_ref[:] = out.astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "interpret")
)
def fused_window_attention_v2(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """qkv: [B, Np, 3C] bf16 (natural layout, Np = N padded to the tile);
    bias: [num_heads, Np, Np] f32 (-1e9 on padded key cols) → [B, Np, C]."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    G = block_windows
    while B % G != 0:
        G //= 2
    G = max(G, 1)
    grid = (B // G,)
    return pl.pallas_call(
        functools.partial(_attn_kernel_v2, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bias.shape[0], Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, bias)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows", "interpret"))
def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    scale: float,
    block_windows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k,v: [B, h, Np, Dp] bf16 (padded); bias [h, Np, Np] f32 → [B,h,Np,Dp]."""
    B, h, Np, Dp = q.shape
    # bound VMEM: the kernel holds ~6 temporaries of [G*h, Np, Np] f32, so
    # keep G*h ≤ 64 (≈8MB of temps at Np=64 with double buffering)
    G = min(block_windows, max(1, 64 // h))
    while B % G != 0:
        G //= 2
    G = max(G, 1)
    grid = (B // G,)
    qkv_spec = pl.BlockSpec(
        (G, h, Np, Dp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, h, Np, Dp), jnp.bfloat16),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        interpret=interpret,
    )(q, k, v, bias)
