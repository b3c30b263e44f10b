"""Batched image rotation via Paeth 3-shear decomposition (Pallas TPU).

Per-pixel gather warps run ~345 img/s on v5e (random access defeats the
VPU). Rotation by θ decomposes into three SHEARS — Shx(-tan θ/2) · Shy(sin θ)
· Shx(-tan θ/2) — and a shear has per-ROW constant shift, so an R-row block
needs only taps = ceil(coef·(R−1)) + 2 dynamic lane-rotates blended with
per-row triangle weights (coef = tan(θ/2) for the x-shears, sin θ for the
y-shear): every row's bilinear pair falls in {m0..m0+taps−1} for the
block-wide base tap m0. Round 3 generalized the original fixed (R=8,
taps=4) scheme: channels fold into the block (the shift is
channel-independent) and R=32 with 10 taps at θ≤13.7° cuts grid steps 12×
and rolls-per-row 38% — measured end-to-end in BENCHMARKS.md. Everything
stays in VMEM; zero fill at the borders matches torchvision's rotate
fill=0.

Layout contract: channel planes [B, 3, S, W] with the x-axis on lanes,
pre-padded by ``pad`` zero lanes on each side (shift headroom). The y-shear
pass reuses the same kernel on transposed planes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows() -> int:
    """Rows per shear block. Taller blocks need more taps (span = coef·(R−1)
    grows) but cut grid steps ~R/8× and rolls-per-row (T/R falls: 4/8 at
    R=8 vs 10/32 at R=32) — round-3 A/B on v5e picked 32 (see BENCHMARKS
    ledger). DFD_SHEAR_ROWS overrides for re-measurement."""
    try:
        return max(8, int(os.environ.get("DFD_SHEAR_ROWS", "32")))
    except ValueError:
        return 32


def _shear_kernel(
    coef_ref, img_ref, out_ref, *, pad: int, center: float, rows_per_block: int,
    taps: int,
):
    """One (image, row-block), ALL channels: rows shifted by coef*(y-center).

    img_ref block: [1, C, R, W + 2*pad]; out_ref: [1, C, R, W].
    Sampling: out[c, y, x] = in[c, y, x + s_y] bilinear, s_y = coef*(y-center);
    the shift is channel-independent so folding C into the block costs
    nothing and cuts grid steps 3x.
    """
    R = rows_per_block
    blk = pl.program_id(1)
    coef = coef_ref[pl.program_id(0)]  # full [B] coef array lives in SMEM
    W = out_ref.shape[-1]

    y0 = (blk * R).astype(jnp.float32)
    rows = y0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(jnp.float32)
    shifts = coef * (rows - center)  # [R, 1]

    # block-wide scalar base tap; per-row bilinear pairs fall in
    # {m0 .. m0+taps-1} because the block's shift span is coef·(R-1) and
    # taps = ceil(max span) + 2 (static, from max_theta)
    s_first = coef * (y0 - center)
    s_last = coef * (y0 + (R - 1) - center)
    m0 = jnp.floor(jnp.minimum(s_first, s_last)).astype(jnp.int32)

    frac = shifts - m0.astype(jnp.float32)  # in [0, span + 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, taps), 1).astype(jnp.float32)
    # triangle weights of taps k=0..taps-1 at offsets m0+k (≤2 nonzero/row)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(frac - k))  # [R, taps]

    # arbitrary lane offsets aren't sliceable (128-alignment rule) but
    # tpu.dynamic_rotate is: roll the padded block so lane x holds
    # in[c, y, x + m0], then the taps are static +0..+taps-1 rolls
    block = img_ref[0].astype(jnp.float32)  # [C, R, W + 2*pad]
    wpad = block.shape[-1]
    # left-roll by (pad + m0) expressed as a non-negative right-roll
    rolled = pltpu.roll(block, wpad - (pad + m0), axis=2)
    acc = w[:, 0][None, :, None] * rolled[:, :, :W]
    for tap in range(1, taps):
        rolled = pltpu.roll(rolled, wpad - 1, axis=2)  # one further lane left
        acc = acc + w[:, tap][None, :, None] * rolled[:, :, :W]
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pad", "center", "max_coef", "interpret")
)
def _shear_pass(
    imgs: jnp.ndarray,  # [B, C, H, W] (unpadded)
    coefs: jnp.ndarray,  # [B] f32
    *,
    pad: int,
    center: float,
    max_coef: float,
    interpret: bool = False,
) -> jnp.ndarray:
    import math

    B, C, H, W = imgs.shape
    R = _block_rows()
    taps = int(math.ceil(max_coef * (R - 1))) + 2
    Hp = ((H + R - 1) // R) * R
    # dynamic lane rotates need a 128-aligned width; extra zeros go right
    total_w = ((W + 2 * pad + 127) // 128) * 128
    padded = jnp.pad(imgs, ((0, 0), (0, 0), (0, Hp - H), (pad, total_w - W - pad)))
    grid = (B, Hp // R)
    out = pl.pallas_call(
        functools.partial(
            _shear_kernel, pad=pad, center=center, rows_per_block=R, taps=taps
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, W), imgs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B] coef array
            pl.BlockSpec(
                (1, C, R, total_w),
                lambda b, r: (b, 0, r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, R, W),
            lambda b, r: (b, 0, r, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(coefs.astype(jnp.float32), padded)
    return out[:, :, :H, :]


def rotate_batch(
    imgs: jnp.ndarray,  # [B, H, W, C] float
    thetas: jnp.ndarray,  # [B] radians
    *,
    max_theta: float = 0.2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotate each image by its angle about the center, zero fill.

    ``max_theta`` bounds the shear headroom (lane padding) and sets the
    static tap count per pass: within an R-row block the shifts span
    coef·(R−1) px, so taps = ceil(span)+2 (R=8 reproduces the historical
    4-tap scheme; the default R=32 uses 10 taps at θ≤13.7° — fewer rolls
    per row AND ~12× fewer grid steps). Any ``max_theta`` ≤ ~0.45 rad is
    now valid (taps adapt); the caller's gather path remains for larger
    angles (data/augment.py dispatches at 0.24 rad).
    """
    if max_theta > 0.45:
        raise ValueError(
            f"rotate_batch shear kernel supports |theta| ≤ ~0.45 rad; got "
            f"max_theta={max_theta:.3f}. Use the gather path "
            "(data/augment.py _affine_sample) for larger angles."
        )
    _, H, W, _ = imgs.shape
    a = -jnp.tan(thetas / 2.0)
    b = jnp.sin(thetas)
    # worst-case lane shift: |a|*H/2 (x-shears) / |b|*W/2 (y-shear)
    import math

    max_a = math.tan(max_theta / 2.0)
    max_b = math.sin(max_theta)
    pad_x = int(math.ceil(max_a * (H / 2.0))) + 2
    pad_y = int(math.ceil(max_b * (W / 2.0))) + 2

    planes = imgs.transpose(0, 3, 1, 2)  # [B, C, H, W]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    planes = _shear_pass(
        planes, a, pad=pad_x, center=cy, max_coef=max_a, interpret=interpret
    )
    planes = planes.transpose(0, 1, 3, 2)  # x-shear on columns = y-shear
    planes = _shear_pass(
        planes, b, pad=pad_y, center=cx, max_coef=max_b, interpret=interpret
    )
    planes = planes.transpose(0, 1, 3, 2)
    planes = _shear_pass(
        planes, a, pad=pad_x, center=cy, max_coef=max_a, interpret=interpret
    )
    return planes.transpose(0, 2, 3, 1)
