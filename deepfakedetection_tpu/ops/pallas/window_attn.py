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
