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

The v1 per-head-layout kernel is inference-only (no VJP); the v2 head-masked
kernel has a full Pallas backward (``window_attention_v2`` custom_vjp below)
so official-config FasterViT training gets the same lane-alignment win eval
got (VERDICT r2 #3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfakedetection_tpu.ops.pallas.util import largest_pow2_block


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
        precision=jax.lax.Precision.DEFAULT,
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
        precision=jax.lax.Precision.DEFAULT,
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
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np, Np] — q_h·k_h via the lane mask
        scores = scores * scale + bias_ref[h][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        ctx = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np, C]
        out = out + jnp.where(mask, ctx, jnp.zeros_like(out))
    out_ref[:] = out.astype(jnp.bfloat16)


def _fwd_compiler_params(B: int, G: int, Np: int, threeC: int):
    """Scoped-VMEM cap for the FORWARD kernels, applied only when needed.

    The G=16 stage-4 block ([16, 64, 2304] bf16) sits right at Mosaic's 16M
    default scoped cap: it compiles (and runs fastest) uncapped at B ≤ 128,
    but the same block OOMs at B ≥ 192 (observed 18.25M scoped — Mosaic's
    scheduling changes with grid length), and raising the cap
    unconditionally was measured to cost 4-5% on official EVAL (6,008 →
    5,715-5,752 img/s). So the 26M cap (which the backward measured FASTER
    than halving blocks) is applied only to the big-batch big-block
    compiles that need it."""
    if B > 128 and G * Np * threeC * 2 > 3 * 1024 * 1024:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        )}
    return {}


def sliced_head_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    keep_probs: bool = False,
):
    """VMEM-resident sliced-head MHSA forward (the v5 per-head math).

    Head split via static lane slices (Mosaic VMEM relayouts, no HBM
    traffic); the two matmuls per head contract over K=d / output N=d.
    qkv [G, Np, 3C] bf16, bias [h, Np, Np] f32 → (ctx [G, Np, C] bf16,
    probs list of f32 [G, Np, Np] per head when ``keep_probs`` else None).
    Shared by the v5 window kernels below AND the fused attention
    sub-block kernel (ops/pallas/attn_block.py) so the two stay
    numerically identical by construction.
    """
    G, Np, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    parts = []
    probs_list = [] if keep_probs else None
    for h in range(num_heads):
        qh = qkv[:, :, 0 * C + h * d : 0 * C + (h + 1) * d]
        kh = qkv[:, :, 1 * C + h * d : 1 * C + (h + 1) * d]
        vh = qkv[:, :, 2 * C + h * d : 2 * C + (h + 1) * d]
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np, Np]
        scores = scores * scale + bias[h][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if keep_probs:
            probs_list.append(p)
        parts.append(
            jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )  # [G, Np, d]
    return jnp.concatenate(parts, axis=2), probs_list


def sliced_head_attention_bwd(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    dout: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    probs: list | None = None,
):
    """Sliced-head MHSA backward on VMEM-resident tensors (the v5 math).

    Recomputes probs per head flash-style unless the caller still holds
    them (``probs``). Returns (dqkv [G, Np, 3C] bf16 as dq‖dk‖dv,
    dbias [h, Np, Np] f32). Shared with ops/pallas/attn_block.py.
    """
    G, Np, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    dq_parts, dk_parts, dv_parts, dbias_planes = [], [], [], []
    for h in range(num_heads):
        qh = qkv[:, :, 0 * C + h * d : 0 * C + (h + 1) * d]
        kh = qkv[:, :, 1 * C + h * d : 1 * C + (h + 1) * d]
        vh = qkv[:, :, 2 * C + h * d : 2 * C + (h + 1) * d]
        doh = dout[:, :, h * d : (h + 1) * d]
        if probs is not None:
            p = probs[h]
        else:
            scores = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
            )  # [G, Np, Np]
            scores = scores * scale + bias[h][None]
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        p16 = p.astype(jnp.bfloat16)
        dv_parts.append(
            jax.lax.dot_general(
                p16, doh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )  # [G, Np(keys), d]
        dp = jax.lax.dot_general(
            doh, vh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np, Np]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_planes.append(jnp.sum(ds, axis=0))
        ds16 = ds.astype(jnp.bfloat16)
        dq_parts.append(
            (jax.lax.dot_general(
                ds16, kh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
            ) * scale).astype(jnp.bfloat16)
        )
        dk_parts.append(
            (jax.lax.dot_general(
                ds16, qh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
            ) * scale).astype(jnp.bfloat16)
        )
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=2)
    return dqkv, jnp.stack(dbias_planes, axis=0)


def _attn_kernel_v5(qkv_ref, bias_ref, out_ref, *, scale: float, num_heads: int):
    """Per-head-SLICED forward pallas kernel (see sliced_head_attention)."""
    ctx, _ = sliced_head_attention(
        qkv_ref[:], bias_ref[:], num_heads=num_heads, scale=scale
    )
    out_ref[:] = ctx


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "interpret")
)
def fused_window_attention_v5(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sliced-head forward pallas_call — same contract as the masked v2."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    G = largest_pow2_block(B, block_windows)
    grid = (B // G,)
    return pl.pallas_call(
        functools.partial(_attn_kernel_v5, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bias.shape[0], Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        **_fwd_compiler_params(B, G, Np, threeC),
        interpret=interpret,
    )(qkv, bias)


def _attn_bwd_kernel_v2(
    qkv_ref, bias_ref, dout_ref, dqkv_ref, dbias_ref, *, scale: float,
    num_heads: int,
):
    """Backward of the head-masked window attention.

    Flash-style: probs are RECOMPUTED per head from qkv+bias (the whole
    window fits in VMEM, so no online-softmax stats are needed). The same
    lane-mask trick carries over — each head owns a disjoint set of lanes,
    so dq/dk/dv per lane are written by exactly ONE head and select cleanly
    with no cross-head accumulation:

      dV_h = Pᵀ·(dO ⊙ m_h)          (nonzero only on head-h lanes)
      dP   = (dO ⊙ m_h)·vᵀ  ≡ dO_h·v_hᵀ
      dS   = P ⊙ (dP − rowsum(dP ⊙ P))
      dQ_h = scale·(dS·k) ⊙ m_h
      dK_h = scale·dSᵀ·(q ⊙ m_h)    (nonzero only on head-h lanes)
      dB_h = Σ_windows dS           (accumulated across the sequential grid)

    Padded query rows have dout == 0 → dS == 0 → contribute nothing; padded
    key columns carry −1e9 bias → P ≈ 0 → dS ≈ 0. The caller slices both.
    """
    i = pl.program_id(0)
    G, Np, threeC = qkv_ref.shape
    C = threeC // 3
    d = C // num_heads
    qkv = qkv_ref[:]
    q = qkv[:, :, 0:C]
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C : 3 * C]
    dout = dout_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, Np, C), 2)
    head_of_lane = lane // d
    dq = jnp.zeros((G, Np, C), jnp.bfloat16)
    dk = jnp.zeros((G, Np, C), jnp.bfloat16)
    dv = jnp.zeros((G, Np, C), jnp.bfloat16)
    dbias_planes = []  # per-head [Np, Np]; stacked at the end (no scatter)
    for h in range(num_heads):
        mask = head_of_lane == h
        qh = jnp.where(mask, q, jnp.zeros_like(q))
        doh = jnp.where(mask, dout, jnp.zeros_like(dout))
        scores = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )
        scores = scores * scale + bias_ref[h][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32 [G, Np, Np]
        p16 = p.astype(jnp.bfloat16)
        # dV_h = Pᵀ dO_h — contract the query dim
        dvh = jax.lax.dot_general(
            p16, doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np(keys), C]
        dv = jnp.where(mask, dvh.astype(jnp.bfloat16), dv)
        # dP = dO_h vᵀ (full-C contraction; mask zeroes other heads)
        dp = jax.lax.dot_general(
            doh, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )  # [G, Np, Np]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        dbias_planes.append(jnp.sum(ds, axis=0))
        ds16 = ds.astype(jnp.bfloat16)
        # dQ_h = scale·(dS·k) restricted to head-h lanes
        dqh = jax.lax.dot_general(
            ds16, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )
        dq = jnp.where(mask, (dqh * scale).astype(jnp.bfloat16), dq)
        # dK_h = scale·dSᵀ·q_h — contract the query dim
        dkh = jax.lax.dot_general(
            ds16, qh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )
        dk = jnp.where(mask, (dkh * scale).astype(jnp.bfloat16), dk)
    dqkv_ref[:] = jnp.concatenate([dq, dk, dv], axis=2)
    dbias = jnp.stack(dbias_planes, axis=0)
    # bias is broadcast over the grid: accumulate into one revisited block
    # (TPU grids execute sequentially, so read-modify-write is safe)
    @pl.when(i == 0)
    def _():
        dbias_ref[:] = dbias

    @pl.when(i > 0)
    def _():
        dbias_ref[:] = dbias_ref[:] + dbias


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "interpret")
)
def fused_window_attention_v2_bwd(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    dout: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward pallas_call: (qkv [B,Np,3C] bf16, bias [h,Np,Np] f32,
    dout [B,Np,C]) → (dqkv [B,Np,3C] bf16, dbias [h,Np,Np] f32).

    ``block_windows=0`` picks the largest power-of-2 block that fits the
    ~16MB VMEM budget (measured ~``Np·3C·14`` resident bytes per window with
    Mosaic's double buffering: stage-2 shapes → G=8, stage-3 → G=4;
    G=8 at C=768 compiles to a 19.3MB stack and is rejected)."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    h = bias.shape[0]
    if block_windows <= 0:
        per_window = Np * threeC * 14
        block_windows = max(1, (18 * 1024 * 1024) // per_window)
    G = largest_pow2_block(B, block_windows)
    grid = (B // G,)
    dqkv, dbias = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel_v2, scale=scale, num_heads=num_heads
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, threeC), jnp.bfloat16),
            jax.ShapeDtypeStruct((h, Np, Np), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        # G=16 stage-2 / G=8 stage-3 blocks need ~20M scoped VMEM; raise the
        # Mosaic cap past the 16M default (v5e has headroom) — measured
        # faster than halving the block (docs/BENCHMARKS.md)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv, bias, dout.astype(jnp.bfloat16))
    return dqkv, dbias


def _fwd_impl(default: str = "masked") -> str:
    """Forward implementation selector (DFD_WINATTN_FWD=masked|sliced).

    Measured end-to-end on v5e (bench.py, batch 128): the masked forward
    wins EVAL (official 6,008 vs 5,974 sliced; aligned 6,899 vs 6,818),
    the sliced forward wins TRAIN paired with the sliced backward (official
    1,667 vs 1,654 masked-fwd; aligned 1,888) — so the caller passes
    ``fwd_impl="sliced"`` when tracing a train step and the env var
    overrides either way.
    """
    import os

    value = os.environ.get("DFD_WINATTN_FWD", default).strip().lower()
    if value not in ("masked", "sliced"):
        import warnings

        warnings.warn(
            f"DFD_WINATTN_FWD={value!r} is not one of masked|sliced — using "
            f"the caller's default {default!r}",
            stacklevel=2,
        )
        return default
    return value


def _run_fwd(qkv, bias, num_heads, scale, interpret, default):
    fn = (
        fused_window_attention_v5
        if _fwd_impl(default) == "sliced"
        else fused_window_attention_v2
    )
    return fn(qkv, bias, num_heads=num_heads, scale=scale, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def window_attention_v2(qkv, bias, num_heads, scale, interpret=False, fwd_impl="masked"):
    """Differentiable head-masked window attention on PADDED layouts.

    qkv: [B, Np, 3C] bf16; bias: [h, Np, Np] f32 with −1e9 on padded key
    columns → [B, Np, C] bf16. ``jax.grad`` through this uses the Pallas
    backward above; padding/slicing and the −1e9 masking live in the caller
    (ops/attention.py) where plain JAX autodiff handles them.
    """
    return _run_fwd(qkv, bias, num_heads, scale, interpret, fwd_impl)


def _window_attention_v2_fwd(qkv, bias, num_heads, scale, interpret, fwd_impl):
    out = _run_fwd(qkv, bias, num_heads, scale, interpret, fwd_impl)
    return out, (qkv, bias)


def _attn_bwd_kernel_v3(
    q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
    *, scale: float,
):
    """Per-head-layout backward: blocks [G, h, Np, Dp] (Dp = d padded to 64).

    The masked full-C backward (v2 above) recomputes every matmul at K=C,
    wasting h× the FLOPs (at stage-3's h=16 that is 94% of the MXU work);
    here the host pre-splits heads so all five matmuls contract over Dp=64 —
    12× fewer FLOPs — at the cost of two XLA transposes per tensor outside.
    """
    i = pl.program_id(0)
    G, h, Np, Dp = q_ref.shape
    GH = G * h
    q = q_ref[:].reshape(GH, Np, Dp)
    k = k_ref[:].reshape(GH, Np, Dp)
    v = v_ref[:].reshape(GH, Np, Dp)
    do = do_ref[:].reshape(GH, Np, Dp)
    batched = lambda a, b, dims: jax.lax.dot_general(  # noqa: E731
        a, b, dimension_numbers=(dims, ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    scores = batched(q, k, ((2,), (2,))) * scale  # [GH, Np, Np]
    scores = (scores.reshape(G, h, Np, Np) + bias_ref[:][None]).reshape(GH, Np, Np)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p16 = p.astype(jnp.bfloat16)
    dv_ref[:] = batched(p16, do, ((1,), (1,))).astype(jnp.bfloat16).reshape(
        G, h, Np, Dp
    )
    dp = batched(do, v, ((2,), (2,)))  # [GH, Np, Np]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dbias = jnp.sum(ds.reshape(G, h, Np, Np), axis=0)
    ds16 = ds.astype(jnp.bfloat16)
    dq_ref[:] = (batched(ds16, k, ((2,), (1,))) * scale).astype(
        jnp.bfloat16
    ).reshape(G, h, Np, Dp)
    dk_ref[:] = (batched(ds16, q, ((1,), (1,))) * scale).astype(
        jnp.bfloat16
    ).reshape(G, h, Np, Dp)

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = dbias

    @pl.when(i > 0)
    def _():
        dbias_ref[:] = dbias_ref[:] + dbias


def _attn_bwd_kernel_v5(
    qkv_ref, bias_ref, dout_ref, dqkv_ref, dbias_ref, *, scale: float,
    num_heads: int,
):
    """Per-head-SLICED backward: the head split happens INSIDE the kernel.

    The masked backward (v2 above) contracts every matmul over the full C
    lanes — h× the useful FLOPs; the headed backward (v3) pays XLA
    transposes through HBM around the kernel. This variant slices each
    head's d lanes in VMEM (static lane slices — Mosaic relayout shifts,
    no HBM traffic) and runs the five matmuls at K=d / N=d, cutting the
    MXU work to ceil(d/128)·128/C of the masked kernel (3× at C=384, 6× at
    C=768 for d=48) while keeping the v2 HBM layout contract. The per-head
    math lives in sliced_head_attention_bwd (shared with attn_block.py).
    """
    i = pl.program_id(0)
    dqkv, dbias = sliced_head_attention_bwd(
        qkv_ref[:], bias_ref[:], dout_ref[:], num_heads=num_heads, scale=scale
    )
    dqkv_ref[:] = dqkv

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = dbias

    @pl.when(i > 0)
    def _():
        dbias_ref[:] = dbias_ref[:] + dbias


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "interpret")
)
def fused_window_attention_v5_bwd(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    dout: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sliced-head backward pallas_call — same HBM contract as the masked
    v2 backward ((qkv [B,Np,3C], bias [h,Np,Np], dout) → (dqkv, dbias))."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    h = bias.shape[0]
    if block_windows <= 0:
        per_window = Np * threeC * 14
        block_windows = max(1, (18 * 1024 * 1024) // per_window)
    G = largest_pow2_block(B, block_windows)
    grid = (B // G,)
    dqkv, dbias = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel_v5, scale=scale, num_heads=num_heads
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, threeC), jnp.bfloat16),
            jax.ShapeDtypeStruct((h, Np, Np), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, Np, threeC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv, bias, dout.astype(jnp.bfloat16))
    return dqkv, dbias


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "interpret")
)
def _headed_window_attention_bwd(
    qkv, bias, dout, *, num_heads, scale, block_windows=0, interpret=False
):
    """Per-head-layout backward wrapper: XLA transposes around the v3 kernel.

    Returns (dqkv [B,Np,3C] bf16, dbias [h,Np,Np] f32)."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    h = num_heads
    d = C // h
    Dp = ((d + 63) // 64) * 64

    def split(t):  # [B,Np,C] -> [B,h,Np,Dp]
        t = t.reshape(B, Np, h, d).transpose(0, 2, 1, 3)
        return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, Dp - d))).astype(
            jnp.bfloat16
        )

    q = split(qkv[:, :, 0:C])
    k = split(qkv[:, :, C : 2 * C])
    v = split(qkv[:, :, 2 * C : 3 * C])
    do = split(dout.astype(jnp.bfloat16))
    if block_windows <= 0:
        per_window = h * Np * Dp * 30  # ~7 resident [h,Np,Dp]-sized planes
        block_windows = max(1, (12 * 1024 * 1024) // per_window)
    G = largest_pow2_block(B, block_windows)
    grid = (B // G,)
    blk = pl.BlockSpec((G, h, Np, Dp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_v3, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, h, Np, Dp), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, h, Np, Dp), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, h, Np, Dp), jnp.bfloat16),
            jax.ShapeDtypeStruct((h, Np, Np), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            blk, blk, blk, blk,
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            blk, blk, blk,
            pl.BlockSpec((h, Np, Np), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        # stage-3 shapes at G=4 need 16.01M scoped — 8K past Mosaic's 16M
        # default; v5e has headroom, so raise the cap instead of halving G
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v, do, bias)

    def merge(t):  # [B,h,Np,Dp] -> [B,Np,C]
        return t[:, :, :, :d].transpose(0, 2, 1, 3).reshape(B, Np, C)

    dqkv = jnp.concatenate([merge(dq), merge(dk), merge(dv)], axis=-1)
    return dqkv, dbias


def _xla_window_attention_bwd(qkv, bias, g, *, num_heads, scale):
    """XLA-einsum backward (recompute probs), per-head layout.

    Kept alongside the Pallas backwards so the dispatch can pick whichever
    measures faster end-to-end (DFD_WINATTN_BWD=sliced|masked|headed|xla,
    see _bwd_impl; measurements in docs/BENCHMARKS.md)."""
    B, Np, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads

    def split(t):
        return t.reshape(B, Np, num_heads, d).transpose(0, 2, 1, 3)

    q = split(qkv[:, :, 0:C])
    k = split(qkv[:, :, C : 2 * C])
    v = split(qkv[:, :, 2 * C : 3 * C])
    do = split(g.astype(qkv.dtype))
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32
    ) * scale + bias[None]
    p = jax.nn.softmax(s, axis=-1)
    p16 = p.astype(qkv.dtype)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p16, do, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", do, v, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dbias = jnp.sum(ds, axis=0)
    ds16 = ds.astype(qkv.dtype)
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds16, k, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds16, q, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) * scale

    def merge(t):
        return t.astype(qkv.dtype).transpose(0, 2, 1, 3).reshape(B, Np, C)

    dqkv = jnp.concatenate([merge(dq), merge(dk), merge(dv)], axis=-1)
    return dqkv, dbias


def _bwd_impl() -> str:
    """Backward selector (DFD_WINATTN_BWD=sliced|masked|headed|xla).

    Measured end-to-end (bench.py --model faster_vit_2_224 --official
    --mode train --batch 128, v5e):
    - "sliced" (default, round 3): per-head lane slices INSIDE the kernel
      (K=d matmuls, VMEM relayouts only) — 1,654 img/s with the masked
      fwd, 1,667 paired with the sliced fwd
    - "masked": lane-masked full-C Pallas backward, adaptive block + 26M
      VMEM cap — 1,610-1,627 img/s
    - "headed": per-head-layout Pallas backward (12x fewer matmul FLOPs but
      XLA transposes through HBM around the kernel) — 1,286 img/s
    - "xla": einsum backward — 1,295 img/s; pure-XLA fwd+bwd
      (DFD_DISABLE_PALLAS=1) — 1,306 img/s
    The ranking shows WHERE the per-head split happens is everything: in
    HBM (headed) it loses to brute-force h×-FLOP masking; in VMEM (sliced)
    it wins on top of it.
    """
    import os

    value = os.environ.get("DFD_WINATTN_BWD", "sliced").strip().lower()
    if value not in ("sliced", "masked", "headed", "xla"):
        import warnings

        warnings.warn(
            f"DFD_WINATTN_BWD={value!r} is not one of sliced|masked|headed|"
            "xla — using the default 'sliced'",
            stacklevel=2,
        )
        return "sliced"
    return value


def _window_attention_v2_bwd(num_heads, scale, interpret, fwd_impl, res, g):
    qkv, bias = res
    impl = _bwd_impl()
    if impl == "xla":
        dqkv, dbias = _xla_window_attention_bwd(
            qkv, bias, g, num_heads=num_heads, scale=scale
        )
    elif impl == "sliced":
        dqkv, dbias = fused_window_attention_v5_bwd(
            qkv, bias, g, num_heads=num_heads, scale=scale, interpret=interpret
        )
    elif impl == "masked":
        dqkv, dbias = fused_window_attention_v2_bwd(
            qkv, bias, g, num_heads=num_heads, scale=scale, interpret=interpret
        )
    else:  # "headed": per-head layout, 12x fewer matmul FLOPs (loses to both)
        dqkv, dbias = _headed_window_attention_bwd(
            qkv, bias, g, num_heads=num_heads, scale=scale, interpret=interpret
        )
    return dqkv.astype(qkv.dtype), dbias.astype(bias.dtype)


window_attention_v2.defvjp(_window_attention_v2_fwd, _window_attention_v2_bwd)


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
    G = largest_pow2_block(B, block_windows)
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
        **_fwd_compiler_params(B, G, Np, threeC),
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
    G = largest_pow2_block(B, min(block_windows, max(1, 64 // h)))
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
