"""Fused EfficientFormerV2 4D attention (Pallas TPU kernel).

The one hot block SURVEY §7.6 lists that had no Pallas attempt (VERDICT r2
#6): Attention4D at 7x7 (N=49) — q·kᵀ → +bias → talking-head-1 → softmax →
talking-head-2 → ·v (models/efficientformer_v2.py:149-239, timm Attention2d
semantics). XLA runs this as ~6 HBM round-trips over the [B, 8, N, N] score
tensor; here the whole chain stays in VMEM per block of images.

Same lane-mask trick as window_attn.py v2: per head, q is lane-masked and
contracted at full C (lane-aligned K dim); the talking-head mixes are
unrolled VPU multiply-adds over the per-head score planes (h=8, so 64 adds);
the value matmul runs at full Cv with a 128-lane-aligned output mask
(dh=128 exactly — one lane tile per head).

Padding contract: q/k/v rows ≥ N are zero; bias is 0 on padding. Padded key
columns are re-masked to −1e9 AFTER talking-head-1 (mixing −1e9 across heads
with signed weights would corrupt them), and padded v rows being zero makes
the talking-head-2 bias on padded columns harmless (it multiplies zeros).

Inference-only (no VJP): training and non-TPU backends take the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn4d_kernel(
    q_ref, k_ref, v_ref, bias_ref, th1_ref, th1b_ref, th2_ref, th2b_ref,
    out_ref, *, num_heads: int, scale: float, n_valid: int,
):
    G, Np, Cq = q_ref.shape
    d = Cq // num_heads
    Cv = v_ref.shape[2]
    dv = Cv // num_heads
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (G, Np, Cq), 2) // d
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (G, Np, Cv), 2) // dv
    col = jax.lax.broadcasted_iota(jnp.int32, (G, Np, Np), 2)
    pad_col = col >= n_valid

    # per-head raw scores (+ positional bias), all resident in VMEM
    scores = []
    for h in range(num_heads):
        qh = jnp.where(lane_q == h, q, jnp.zeros_like(q))
        s = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )
        scores.append(s * scale + bias_ref[h][None])

    # talking-head 1 (scores mix across heads), then key-pad mask, softmax
    probs = []
    for g in range(num_heads):
        s2 = th1b_ref[g, 0]
        for h in range(num_heads):
            s2 = s2 + th1_ref[h, g] * scores[h]
        s2 = jnp.where(pad_col, -1e9, s2)
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp(s2 - m)
        probs.append(e / jnp.sum(e, axis=-1, keepdims=True))

    # talking-head 2 (probability mix) + value matmul, masked per head
    out = jnp.zeros((G, Np, Cv), jnp.float32)
    for g in range(num_heads):
        p2 = th2b_ref[g, 0]
        for h in range(num_heads):
            p2 = p2 + th2_ref[h, g] * probs[h]
        ctx = jax.lax.dot_general(
            p2.astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
        )
        out = jnp.where(lane_v == g, ctx, out)
    out_ref[:] = out.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "n_valid", "block_images", "interpret"),
)
def fused_attn4d(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    th1: jnp.ndarray,
    th1_b: jnp.ndarray,
    th2: jnp.ndarray,
    th2_b: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    n_valid: int,
    block_images: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k: [B, Np, h·d] bf16; v: [B, Np, h·dv] bf16; bias: [h, Np, Np] f32
    (0 on padding); th*: [h, h] f32; th*_b: [h, 1] f32 → [B, Np, h·dv] bf16."""
    B, Np, Cq = q.shape
    Cv = v.shape[2]
    from deepfakedetection_tpu.ops.pallas.util import largest_pow2_block

    G = largest_pow2_block(B, block_images)
    grid = (B // G,)

    def img_spec(c):
        return pl.BlockSpec((G, Np, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _attn4d_kernel, num_heads=num_heads, scale=scale, n_valid=n_valid
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, Cv), jnp.bfloat16),
        grid=grid,
        in_specs=[
            img_spec(Cq),
            img_spec(Cq),
            img_spec(Cv),
            fixed(num_heads, Np, Np),
            fixed(num_heads, num_heads),
            fixed(num_heads, 1),
            fixed(num_heads, num_heads),
            fixed(num_heads, 1),
        ],
        out_specs=img_spec(Cv),
        interpret=interpret,
    )(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        bias.astype(jnp.float32), th1.astype(jnp.float32),
        th1_b.astype(jnp.float32), th2.astype(jnp.float32),
        th2_b.astype(jnp.float32),
    )


def attn4d_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    th1: jnp.ndarray,
    th1_b: jnp.ndarray,
    th2: jnp.ndarray,
    th2_b: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unpadded wrapper. q/k: [B, N, h·d]; v: [B, N, h·dv]; bias: [h, N, N]
    → [B, N, h·dv] bf16. Pads N to the bf16 sublane tile and slices back."""
    B, N, _ = q.shape
    Np = ((N + 15) // 16) * 16
    pad = ((0, 0), (0, Np - N), (0, 0))
    out = fused_attn4d(
        jnp.pad(q.astype(jnp.bfloat16), pad),
        jnp.pad(k.astype(jnp.bfloat16), pad),
        jnp.pad(v.astype(jnp.bfloat16), pad),
        jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, Np - N), (0, Np - N))),
        th1, th1_b.reshape(num_heads, 1), th2, th2_b.reshape(num_heads, 1),
        num_heads=num_heads, scale=scale, n_valid=N, interpret=interpret,
    )
    return out[:, :N, :]
