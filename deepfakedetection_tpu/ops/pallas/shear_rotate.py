"""Batched image rotation via Paeth 3-shear decomposition (Pallas TPU).

Per-pixel gather warps run ~345 img/s on v5e (random access defeats the
VPU). Rotation by θ decomposes into three SHEARS — Shx(-tan θ/2) · Shy(sin θ)
· Shx(-tan θ/2) — and a shear has per-ROW constant shift, so an 8-row block
needs only FOUR dynamic lane-slices blended with per-row weights: the
shifts within a block span coef·7 px (coef = tan(θ/2) for the x-shears,
sin θ for the y-shear), and with span < 2 every row's bilinear pair falls
in {m0..m0+3}. That bounds validity at |sin θ|·7 < 2 → |θ| ≲ 16.6° (the
y-shear is the binding constraint — 3 taps were only valid to ~8.2° there).
Everything stays in VMEM; zero fill at the borders matches torchvision's
rotate fill=0.

Layout contract: channel planes [B, 3, S, W] with the x-axis on lanes,
pre-padded by ``pad`` zero lanes on each side (shift headroom). The y-shear
pass reuses the same kernel on transposed planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 8


def _shear_kernel(coef_ref, img_ref, out_ref, *, pad: int, center: float):
    """One (image, channel, row-block): out rows shifted by coef*(y-center).

    img_ref block: [_BLOCK_ROWS, W + 2*pad]; out_ref: [_BLOCK_ROWS, W].
    Sampling: out[y, x] = in[y, x + s_y] bilinear, s_y = coef * (y - center).
    """
    blk = pl.program_id(2)
    coef = coef_ref[pl.program_id(0)]  # full [B] coef array lives in SMEM
    W = out_ref.shape[-1]  # blocks carry leading (1, 1) dims

    y0 = (blk * _BLOCK_ROWS).astype(jnp.float32)
    rows = y0 + jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, 1), 0).astype(
        jnp.float32
    )
    shifts = coef * (rows - center)  # [_BLOCK_ROWS, 1]

    # block-wide scalar base tap; per-row taps fall in {m0 .. m0+3}
    s_first = coef * (y0 - center)
    s_last = coef * (y0 + (_BLOCK_ROWS - 1) - center)
    m0 = jnp.floor(jnp.minimum(s_first, s_last)).astype(jnp.int32)

    frac = shifts - m0.astype(jnp.float32)  # in [0, 3) given block span < 2
    # triangle weights of taps k=0..3 located at offsets m0+k
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(frac - k))  # [_BLOCK_ROWS, 4]

    # arbitrary lane offsets aren't sliceable (128-alignment rule) but
    # tpu.dynamic_rotate is: roll the padded block so lane x holds
    # in[y, x + m0], then the four taps are static +0..+3 rolls
    block = img_ref[0, 0, :, :].astype(jnp.float32)  # [_BLOCK_ROWS, W + 2*pad]
    wpad = block.shape[1]
    # left-roll by (pad + m0) expressed as a non-negative right-roll
    rolled = pltpu.roll(block, wpad - (pad + m0), axis=1)
    acc = w[:, 0][:, None] * rolled[:, :W]
    for tap in range(1, 4):
        rolled = pltpu.roll(rolled, wpad - 1, axis=1)  # one further lane left
        acc = acc + w[:, tap][:, None] * rolled[:, :W]
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pad", "center", "interpret"))
def _shear_pass(
    imgs: jnp.ndarray,  # [B, C, H, W] (unpadded)
    coefs: jnp.ndarray,  # [B] f32
    *,
    pad: int,
    center: float,
    interpret: bool = False,
) -> jnp.ndarray:
    B, C, H, W = imgs.shape
    Hp = ((H + _BLOCK_ROWS - 1) // _BLOCK_ROWS) * _BLOCK_ROWS
    # dynamic lane rotates need a 128-aligned width; extra zeros go right
    total_w = ((W + 2 * pad + 127) // 128) * 128
    padded = jnp.pad(imgs, ((0, 0), (0, 0), (0, Hp - H), (pad, total_w - W - pad)))
    grid = (B, C, Hp // _BLOCK_ROWS)
    out = pl.pallas_call(
        functools.partial(_shear_kernel, pad=pad, center=center),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, W), imgs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B] coef array
            pl.BlockSpec(
                (1, 1, _BLOCK_ROWS, total_w),
                lambda b, c, r: (b, c, r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _BLOCK_ROWS, W),
            lambda b, c, r: (b, c, r, 0),
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

    ``max_theta`` bounds the shear headroom (lane padding); the per-block
    4-tap scheme requires shifts within an 8-row block to span < 2px:
    |sin(theta)|*7 < 2 (the y-shear binds before the x-shears'
    |tan(theta/2)|*7 < 2) → valid for |theta| ≤ ~0.28 rad (16°).
    Larger ``max_theta`` raises — callers must use the exact gather path
    (data/augment.py dispatches automatically; its threshold is 0.24 rad
    = 13.7°, comfortably inside the bound).
    """
    if max_theta > 0.28:
        raise ValueError(
            f"rotate_batch 4-tap shear kernel is only valid for |theta| ≤ "
            f"~0.28 rad (16°; 3-tap was ~0.24 on the x axis but only 0.14 "
            f"on the y-shear); got max_theta={max_theta:.3f}. Use the "
            "gather path (data/augment.py _affine_sample) for larger angles."
        )
    _, H, W, _ = imgs.shape
    a = -jnp.tan(thetas / 2.0)
    b = jnp.sin(thetas)
    # worst-case lane shift: |a|*H/2 (x-shears) / |b|*W/2 (y-shear)
    import math

    pad_x = int(math.ceil(math.tan(max_theta / 2.0) * (H / 2.0))) + 2
    pad_y = int(math.ceil(math.sin(max_theta) * (W / 2.0))) + 2

    planes = imgs.transpose(0, 3, 1, 2)  # [B, C, H, W]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    planes = _shear_pass(planes, a, pad=pad_x, center=cy, interpret=interpret)
    planes = planes.transpose(0, 1, 3, 2)  # x-shear on columns = y-shear
    planes = _shear_pass(planes, b, pad=pad_y, center=cx, interpret=interpret)
    planes = planes.transpose(0, 1, 3, 2)
    planes = _shear_pass(planes, a, pad=pad_x, center=cy, interpret=interpret)
    return planes.transpose(0, 2, 3, 1)
