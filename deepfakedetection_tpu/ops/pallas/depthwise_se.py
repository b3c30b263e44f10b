"""Fused depthwise-conv + SiLU + SE global-pool (Pallas TPU kernel).

Profiled motivation (docs/BENCHMARKS.md, round-3 eval profile): XLA fuses
each MBConv's SE global-mean into the depthwise-conv fusion, and those
fusions run at 44-233 GB/s — 29 ms of B3's 50 ms eval step. Breaking the
fusion regressed (the dw output materializes twice), so the fix must make
the depthwise arithmetic itself stream: this kernel keeps a block of images
in VMEM, computes the k×k depthwise conv as k² shifted VPU multiply-adds
over the [H·W, C] layout (channels on lanes — no relayout, no MXU), applies
bias+SiLU, and emits BOTH the bf16 activation and the f32 spatial mean the
SE branch needs. HBM sees one read of x and one write of y.

Scope: stride 1, symmetric (k//2) zero padding, SiLU activation — the
configuration of every non-transition MBConv depthwise in EfficientNet.
Inference-only (no VJP); training and other configs take the XLA path.
Consumer: models/common.py ConvBN (eval, folded-BN branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfakedetection_tpu.ops.pallas.util import largest_pow2_block


def _dw_kernel(x_ref, w_ref, b_ref, y_ref, pool_ref, *, H: int, W: int, k: int):
    G, HW, C = x_ref.shape
    r = k // 2
    x = x_ref[:]  # [G, HW, C] bf16
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW, 1), 1) % W
    acc = jnp.zeros((G, HW, C), jnp.float32)
    zeros_row = jnp.zeros((G, 1, C), x.dtype)

    def shift_flat(t, off):
        """t[:, p+off, :] with zero fill beyond the flat range (static off)."""
        if off == 0:
            return t
        if off > 0:
            pad = jnp.broadcast_to(zeros_row, (G, off, C))
            return jnp.concatenate([t[:, off:, :], pad], axis=1)
        pad = jnp.broadcast_to(zeros_row, (G, -off, C))
        return jnp.concatenate([pad, t[:, :off, :]], axis=1)

    tap = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = shift_flat(x, dy * W + dx)
            if dx != 0:
                # row-major flattening: a dx shift must not wrap across rows
                valid = (col + dx >= 0) & (col + dx < W)
                shifted = jnp.where(valid, shifted, jnp.zeros_like(shifted))
            acc = acc + shifted.astype(jnp.float32) * w_ref[tap][None, None, :]
            tap += 1
    acc = acc + b_ref[0][None, None, :]
    y = (acc * jax.nn.sigmoid(acc)).astype(jnp.bfloat16)  # SiLU, f32 math
    y_ref[:] = y
    # SE pools the bf16 activation with f32 accumulation (matches the XLA
    # path's jnp.mean(x_bf16, dtype=f32) semantics). The mean broadcasts
    # over 8 sublanes because a [G, C] output block would violate the TPU
    # tile rule (second-to-last block dim must divide 8); caller slices.
    mean = jnp.mean(y.astype(jnp.float32), axis=1)
    pool_ref[:] = jnp.broadcast_to(mean[:, None, :], pool_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "k", "block_images", "interpret")
)
def depthwise_silu_pool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    H: int,
    W: int,
    k: int,
    block_images: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, C] bf16; w: [k, k, C] (folded dw kernel); b: [C] f32
    → (y [B, H, W, C] bf16 = silu(dw(x)+b), pool [B, C] f32 = mean(y))."""
    B, _, _, C = x.shape
    HW = H * W
    xf = x.reshape(B, HW, C).astype(jnp.bfloat16)
    wf = w.reshape(k * k, C).astype(jnp.float32)
    bf = b.reshape(1, C).astype(jnp.float32)
    if block_images <= 0:
        # resident per image ≈ x+y bf16 (double-buffered) + f32 acc + one
        # shifted temp, all at the LANE-PADDED channel count
        cp = ((C + 127) // 128) * 128
        block_images = max(1, (12 * 1024 * 1024) // (HW * cp * 20))
    G = largest_pow2_block(B, block_images)
    grid = (B // G,)
    img = lambda c: pl.BlockSpec(  # noqa: E731
        (G, HW, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    y, pool = pl.pallas_call(
        functools.partial(_dw_kernel, H=H, W=W, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((B, HW, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            img(C),
            pl.BlockSpec((k * k, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            img(C),
            pl.BlockSpec((G, 8, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
        interpret=interpret,
    )(xf, wf, bf)
    return y.reshape(B, H, W, C), pool[:, 0, :]
