"""Fused attention sub-block: qkv Dense → windowed MHSA → proj Dense.

Motivation (measured, docs/BENCHMARKS.md round-3 profile): with the sliced
window-attention kernels the official FasterViT train step still spends
~25 ms/step OUTSIDE the attention kernels on the tensors AROUND them — the
[B·nW, 53, 3C] qkv round-trips to HBM, the pads/slices to the kernel
layout, the ctx round-trip into the proj matmul, and their backward
mirrors. This kernel keeps the whole sub-block resident: HBM sees x, the
(small) weights, and the output; qkv/probs/ctx never leave VMEM. The
backward recomputes qkv/probs flash-style and accumulates dW/db/dbias in
f32 VMEM scratch across the sequential grid (same revisited-block trick as
the window-attention dbias).

Layout contract (caller: ops/attention.py):
- x: [B, Np, C] bf16 — window tokens, rows ≥ N zero-padded
- wqkv/bqkv, wproj/bproj: f32 (flax param_dtype), cast to bf16 here
- bias: [h, Np, Np] f32, −1e9 on padded KEY columns
- out: [B, Np, C] bf16; caller slices rows :N.

Replaces (behaviorally): models/fastervit.py TokenAttention's
qkv-Dense → window_mhsa → proj-Dense chain (ref: the wheel's WindowAttention
in faster_vit.py — qkv Linear, scaled dot-product with CPB bias, proj).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfakedetection_tpu.ops.pallas.util import largest_pow2_block

# the per-head attention fwd/bwd math is shared with the v5 window kernels —
# one definition keeps the two kernels numerically identical by construction
from deepfakedetection_tpu.ops.pallas.window_attn import (
    sliced_head_attention,
    sliced_head_attention_bwd,
)


def use_fused_attn_subblock() -> bool:
    """Opt-in dispatch (DFD_FUSED_ATTN=1); measured A/Bs in BENCHMARKS.md."""
    from deepfakedetection_tpu.runtime.flags import env_flag

    return env_flag("DFD_FUSED_ATTN")


def _fwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref, out_ref,
    *, num_heads: int, scale: float,
):
    G, Np, C = x_ref.shape
    x2 = x_ref[:].reshape(G * Np, C)
    qkv2 = jax.lax.dot_general(
        x2, wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv2 + bqkv_ref[0][None]).astype(jnp.bfloat16).reshape(G, Np, 3 * C)
    ctx, _ = sliced_head_attention(
        qkv, bias_ref[:], num_heads=num_heads, scale=scale
    )
    out2 = jax.lax.dot_general(
        ctx.reshape(G * Np, C), wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (out2 + bproj_ref[0][None]).astype(jnp.bfloat16).reshape(
        G, Np, C
    )


def _bwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, dout_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dbias_ref, dwproj_ref, dbproj_ref,
    *, num_heads: int, scale: float,
):
    i = pl.program_id(0)
    G, Np, C = x_ref.shape
    x2 = x_ref[:].reshape(G * Np, C)
    wqkv = wqkv_ref[:]
    wproj = wproj_ref[:]
    # --- recompute forward up to ctx (flash-style) ---
    qkv2 = jax.lax.dot_general(
        x2, wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv2 + bqkv_ref[0][None]).astype(jnp.bfloat16).reshape(G, Np, 3 * C)
    ctx, probs_list = sliced_head_attention(
        qkv, bias_ref[:], num_heads=num_heads, scale=scale, keep_probs=True
    )
    dout = dout_ref[:]
    do2 = dout.reshape(G * Np, C)
    # --- proj backward ---
    dwproj = jax.lax.dot_general(  # ctxᵀ·dout → [C, C]
        ctx.reshape(G * Np, C), do2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    dbproj = jnp.sum(do2.astype(jnp.float32), axis=0)
    dctx = jax.lax.dot_general(  # dout·Wprojᵀ → [G·Np, C]
        do2, wproj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(G, Np, C)
    # --- attention backward (sliced heads, probs reused from recompute) ---
    dqkv, dbias = sliced_head_attention_bwd(
        qkv, bias_ref[:], dctx, num_heads=num_heads, scale=scale,
        probs=probs_list,
    )
    # --- qkv-Dense backward ---
    dqkv2 = dqkv.reshape(G * Np, 3 * C)
    dwqkv = jax.lax.dot_general(  # xᵀ·dqkv → [C, 3C]
        x2, dqkv2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(dqkv2.astype(jnp.float32), axis=0)
    dx2 = jax.lax.dot_general(  # dqkv·Wqkvᵀ → [G·Np, C]
        dqkv2, wqkv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx2.astype(jnp.bfloat16).reshape(G, Np, C)
    # --- accumulate the broadcast grads across the sequential grid ---
    # 1D grads are emitted as [8, F] (sublane-broadcast) per the TPU tile
    # rule; the wrapper reads row 0.
    dbqkv8 = jnp.broadcast_to(dbqkv[None], (8, 3 * C))
    dbproj8 = jnp.broadcast_to(dbproj[None], (8, C))

    @pl.when(i == 0)
    def _():
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[:] = dbqkv8
        dbias_ref[:] = dbias
        dwproj_ref[:] = dwproj
        dbproj_ref[:] = dbproj8

    @pl.when(i > 0)
    def _():
        dwqkv_ref[:] = dwqkv_ref[:] + dwqkv
        dbqkv_ref[:] = dbqkv_ref[:] + dbqkv8
        dbias_ref[:] = dbias_ref[:] + dbias
        dwproj_ref[:] = dwproj_ref[:] + dwproj
        dbproj_ref[:] = dbproj_ref[:] + dbproj8


def _pick_block(B: int, Np: int, C: int, budget_mb: int) -> int:
    per_window = Np * C * 2 * 10  # x/qkv/dqkv/ctx/dctx + head temps, bf16-ish
    return largest_pow2_block(B, budget_mb * 1024 * 1024 // per_window)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def _fwd_call(x, wqkv, bqkv, bias, wproj, bproj, *, num_heads, scale, interpret):
    B, Np, C = x.shape
    h = bias.shape[0]
    G = _pick_block(B, Np, C, 8)
    grid = (B // G,)
    wqkv16 = wqkv.astype(jnp.bfloat16)
    wproj16 = wproj.astype(jnp.bfloat16)
    bqkv8 = jnp.broadcast_to(bqkv.astype(jnp.float32)[None], (8, 3 * C))
    bproj8 = jnp.broadcast_to(bproj.astype(jnp.float32)[None], (8, C))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wqkv16, bqkv8, bias.astype(jnp.float32),
      wproj16, bproj8)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def _bwd_call(x, wqkv, bqkv, bias, wproj, dout, *, num_heads, scale, interpret):
    B, Np, C = x.shape
    h = bias.shape[0]
    G = _pick_block(B, Np, C, 6)
    grid = (B // G,)
    wqkv16 = wqkv.astype(jnp.bfloat16)
    wproj16 = wproj.astype(jnp.bfloat16)
    bqkv8 = jnp.broadcast_to(bqkv.astype(jnp.float32)[None], (8, 3 * C))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),      # dx
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),       # dwqkv
            jax.ShapeDtypeStruct((8, 3 * C), jnp.float32),       # dbqkv
            jax.ShapeDtypeStruct((h, Np, Np), jnp.float32),      # dbias
            jax.ShapeDtypeStruct((C, C), jnp.float32),           # dwproj
            jax.ShapeDtypeStruct((8, C), jnp.float32),           # dbproj
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wqkv16, bqkv8, bias.astype(jnp.float32),
      wproj16, dout.astype(jnp.bfloat16))
    dx, dwqkv, dbqkv8, dbias, dwproj, dbproj8 = outs
    return dx, dwqkv, dbqkv8[0], dbias, dwproj, dbproj8[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def attn_subblock(num_heads, scale, interpret, x, wqkv, bqkv, bias, wproj, bproj):
    """Fused qkv→MHSA→proj on padded window layouts (see module docstring)."""
    return _fwd_call(
        x, wqkv, bqkv, bias, wproj, bproj,
        num_heads=num_heads, scale=scale, interpret=interpret,
    )


def _attn_subblock_fwd(num_heads, scale, interpret, x, wqkv, bqkv, bias, wproj, bproj):
    out = _fwd_call(
        x, wqkv, bqkv, bias, wproj, bproj,
        num_heads=num_heads, scale=scale, interpret=interpret,
    )
    return out, (x, wqkv, bqkv, bias, wproj)


def _attn_subblock_bwd(num_heads, scale, interpret, res, g):
    x, wqkv, bqkv, bias, wproj = res
    dx, dwqkv, dbqkv, dbias, dwproj, dbproj = _bwd_call(
        x, wqkv, bqkv, bias, wproj, g,
        num_heads=num_heads, scale=scale, interpret=interpret,
    )
    return (
        dx.astype(x.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dbias.astype(bias.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.astype(wproj.dtype),
    )


attn_subblock.defvjp(_attn_subblock_fwd, _attn_subblock_bwd)


def attn_subblock_reference(
    x, wqkv, bqkv, bias, wproj, bproj, *, num_heads, scale
):
    """Pure-JAX reference of the fused sub-block (tests + non-TPU)."""
    B, Np, C = x.shape
    d = C // num_heads
    qkv = (
        jnp.einsum("bnc,cf->bnf", x.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16),
                   precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)[None, None]
    ).astype(jnp.bfloat16)
    q = qkv[:, :, 0:C].reshape(B, Np, num_heads, d)
    k = qkv[:, :, C : 2 * C].reshape(B, Np, num_heads, d)
    v = qkv[:, :, 2 * C : 3 * C].reshape(B, Np, num_heads, d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale + bias[None].astype(jnp.float32), axis=-1)
    ctx = jnp.einsum(
        "bhnm,bmhd->bnhd", p.astype(jnp.bfloat16), v,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(B, Np, C)
    out = (
        jnp.einsum("bnc,cf->bnf", ctx, wproj.astype(jnp.bfloat16),
                   precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)[None, None]
    )
    return out.astype(jnp.bfloat16)
