"""Fused MBConv expand(1x1)+BN+SiLU → depthwise(kxk, s1)+BN+SiLU (+SE pool).

Motivation (round-3 B3 eval profile at the batch-128 sweet spot,
docs/BENCHMARKS.md): every expand→depthwise pair round-trips the 6x-expanded
activation through HBM — [128,56²,192] or [128,14²,816] tensors written by
the expand conv and immediately re-read by the depthwise conv. Summed over
the stride-1 pairs that is ~1.6 GB/step of avoidable traffic (~2 ms at the
819 GB/s roofline) in a 12.25 ms step. This kernel keeps the expanded
tensor in VMEM: HBM sees the block input x, the (small) folded weights, the
depthwise output, and the SE spatial mean — the expanded tensor never
leaves the chip.

Contract (eval only, BN pre-folded by the caller — models/common.py ConvBN
``fold_only``):
- x: [B, H, W, Cin] bf16 (UNPADDED; the kernel zero-pads k//2 per side,
  which equals the frozen static-SAME grid for every stride-1 odd-k conv)
- wexp [Cin, Ce] / bexp [Ce]: folded expand weights (f32)
- wdw [k, k, Ce] / bdw [Ce]: folded depthwise weights (f32)
- returns (y [B, H, W, Ce] bf16 = silu(dw(silu(x@wexp+bexp))+bdw),
  pooled [B, Ce] f32 spatial mean of y — consumed by SqueezeExcite so its
  pooling pass over y is skipped)

Prior art in the ledger: the whole-block fused-MBConv kernel lost to XLA at
the DEEP shapes (28²/14², where batch-128 activations are resident anyway)
and the depthwise+SE kernel executed pathologically slowly with [HW, C]
flattened shifts. This kernel differs where it matters: it targets the
high-resolution pairs where the traffic argument is strongest, keeps H and
W as separate dims (W-shifts are sublane moves, H-shifts are row slices —
no flattened-boundary masks), and leaves SE gating + projection to XLA.

VERDICT (measured on v5e, docs/BENCHMARKS.md ledger): it LOSES anyway —
B3 eval 4,608 img/s with all stride-1 pairs fused, 6,710 k3-only, vs
~9,6xx XLA baseline the same day. The k² shifted VPU multiply-adds cost
more in Mosaic than the ~2 ms of expanded-tensor HBM traffic they save —
the third independent confirmation (after fused-MBConv and depthwise+SE)
that XLA's depthwise window lowering beats hand-written Pallas taps on
this hardware/toolchain. Kept opt-in (DFD_ENABLE_PALLAS_EXPDW) with
interpret-mode parity tests; OFF by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfakedetection_tpu.ops.pallas.util import largest_pow2_block


def _kernel(x_ref, wexp_ref, bexp_ref, wdw_ref, bdw_ref, y_ref, pool_ref,
            *, k: int, H: int, W: int):
    # NB Mosaic-friendliness: every intermediate stays >= 2D (1D vectors
    # trip infer-vector-layout), biases/taps ride as [1, Ce] row slices of
    # the [8, Ce] sublane broadcasts the wrapper ships.
    G, _, _, Cin = x_ref.shape
    Ce = wexp_ref.shape[1]
    r = k // 2
    x2 = x_ref[:].reshape(G * H * W, Cin)
    y1 = jax.lax.dot_general(
        x2, wexp_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bexp_ref[0:1, :]
    y1 = jax.nn.silu(y1).astype(jnp.bfloat16).reshape(G, H, W, Ce)
    y1 = jnp.pad(y1, ((0, 0), (r, r), (r, r), (0, 0)))
    acc = jnp.zeros((G, H, W, Ce), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = y1[:, dy : dy + H, dx : dx + W, :].astype(jnp.float32)
            w_tap = wdw_ref[dy * k + dx, 0:1, :].reshape(1, 1, 1, Ce)
            acc = acc + tap * w_tap
    y = jax.nn.silu(acc + bdw_ref[0:1, :].reshape(1, 1, 1, Ce))
    y_ref[:] = y.astype(jnp.bfloat16)
    # SE spatial mean in the same pass (f32), emitted [G, 8, Ce] per the TPU
    # tile rule for sub-8 sublane outputs; the wrapper slices row 0.
    # (axis=(1,2) in one reduce — reshaping [G,H,W,Ce]→[G,H·W,Ce] first is
    # an unsupported Mosaic shape cast, as is a two-step axis=2-then-1)
    mean = jnp.mean(y, axis=(1, 2))  # [G, Ce]
    pool_ref[:] = jnp.broadcast_to(mean[:, None, :], (G, 8, Ce))


@functools.partial(
    jax.jit, static_argnames=("kernel", "block_images", "interpret")
)
def expand_dw_silu_pool(
    x: jnp.ndarray,
    wexp: jnp.ndarray,
    bexp: jnp.ndarray,
    wdw: jnp.ndarray,
    bdw: jnp.ndarray,
    *,
    kernel: int,
    block_images: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused expand+dw+SiLU+pool (see module docstring). Stride-1, odd k."""
    B, H, W, Cin = x.shape
    Ce = wexp.shape[1]
    k = kernel
    # Mosaic's 4D↔2D reshapes ([G,H,W,C] ↔ [G·H·W, C]) are rejected when the
    # spatial sublane dim is < 8 AND the lane dim is not 128-aligned
    # (observed: vector<4x7x7x232> → vector<196x232> "unsupported shape
    # cast"; 384/2304 lanes compile fine at 7×7). Zero-pad the channel dims
    # to 128 multiples for small spatial maps — padded lanes stay exactly
    # zero through silu(0)=0 and zero dw taps, and the wrapper slices them
    # off; the extra traffic is ≤10% on tensors this small.
    if min(H, W) < 8 and (Cin % 128 or Ce % 128):
        cin_p = -(-Cin // 128) * 128
        ce_p = -(-Ce // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - Cin)))
        wexp = jnp.pad(wexp, ((0, cin_p - Cin), (0, ce_p - Ce)))
        bexp = jnp.pad(bexp, (0, ce_p - Ce))
        wdw = jnp.pad(wdw, ((0, 0), (0, 0), (0, ce_p - Ce)))
        bdw = jnp.pad(bdw, (0, ce_p - Ce))
        y, pooled = expand_dw_silu_pool(
            x, wexp, bexp, wdw, bdw, kernel=kernel,
            block_images=block_images, interpret=interpret,
        )
        return y[..., :Ce], pooled[..., :Ce]
    if block_images <= 0:
        # resident per image: y1 padded (+ dbuf'd x and y blocks) ≈ 5 copies
        # of the expanded plane; target ~6MB of scoped VMEM
        per_image = H * W * Ce * 2 * 5
        block_images = max(1, (6 * 1024 * 1024) // per_image)
    G = largest_pow2_block(B, block_images)
    grid = (B // G,)
    # 1D params ride as [8, C] sublane broadcasts (TPU tile rule); the dw
    # taps flatten to [k*k, 8, Ce] the same way
    bexp8 = jnp.broadcast_to(bexp.astype(jnp.float32)[None], (8, Ce))
    bdw8 = jnp.broadcast_to(bdw.astype(jnp.float32)[None], (8, Ce))
    wdw8 = jnp.broadcast_to(
        wdw.astype(jnp.float32).reshape(k * k, 1, Ce), (k * k, 8, Ce)
    )
    y, pooled = pl.pallas_call(
        functools.partial(_kernel, k=k, H=H, W=W),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Ce), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 8, Ce), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, H, W, Cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Ce), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Ce), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, 8, Ce), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Ce), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, H, W, Ce), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8, Ce), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wexp.astype(jnp.float32), bexp8, wdw8, bdw8)
    return y, pooled[:, 0, :]


def use_pallas_expdw(kernel: int = 3) -> bool:
    """Dispatch for the fused expand+dw kernel. OPT-IN and MEASURED-BAD —
    stays OFF: the end-to-end A/B on v5e lost 2x (B3 eval 4,608 vs ~9,6xx
    with all stride-1 pairs fused; k3-only also lost, see BENCHMARKS.md
    ledger) — the VPU shifted-tap arithmetic costs more in Mosaic than the
    expanded tensor's HBM round-trip it saves, the same verdict the
    depthwise+SE kernel got. DFD_ENABLE_PALLAS_EXPDW=1 re-enables (all k),
    =k3 restricts to 3x3 pairs; DFD_DISABLE_PALLAS=1 wins."""
    import os

    from deepfakedetection_tpu.runtime.flags import env_flag, on_tpu

    if env_flag("DFD_DISABLE_PALLAS") or not on_tpu():
        return False
    value = os.environ.get("DFD_ENABLE_PALLAS_EXPDW", "").strip().lower()
    if value == "k3":
        return kernel == 3
    return env_flag("DFD_ENABLE_PALLAS_EXPDW")


def fits_expdw(H: int, W: int, Ce: int) -> bool:
    """One padded expanded plane per image must fit the VMEM budget."""
    return H * W * Ce * 2 * 5 <= 24 * 1024 * 1024
