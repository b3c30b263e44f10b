"""Fused MBConv+SE block for inference (Pallas TPU).

The MBConv hot path expands channels 6x (expand 1x1 → depthwise KxK →
SE gate → project 1x1); XLA materializes the 6x-expanded activations in HBM
(write + read ≈ 0.5GB per 28² block at batch 256) — the convs measure
traffic-bound at <10% MXU. This kernel runs the WHOLE block per image in one
grid step with everything resident in VMEM (the expanded map is ≤3.6MB even
at 112²): stream the input image in (double-buffered DMA), compute
expand+depthwise per row tile into a VMEM stash while accumulating the SE
pool, finish the SE gate with two tiny in-kernel matmuls, then gate+project
each stashed tile and write the output block. HBM sees input once and output
once.

Weights arrive BN-FOLDED (models/common.py eval folding). Inference-only
(stride-1, in==out blocks); training and other blocks keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 8


def _block_kernel(
    x_hbm, we_ref, be_ref, wd_ref, bd_ref, wsr_ref, bsr_ref, wse_ref, bse_ref,
    wp_ref, bp_ref, out_ref, slab, dw_stash, sem, *, K, W, H, Hp
):
    b = pl.program_id(0)
    n_tiles = Hp // _TILE_ROWS
    T = _TILE_ROWS
    hp = K // 2
    Cmid = we_ref.shape[1]
    Cout = wp_ref.shape[1]
    Wfull = slab.shape[2]

    def dma(slot, img):
        return pltpu.make_async_copy(x_hbm.at[img], slab.at[slot], sem.at[slot])

    # whole-image slab double buffer across grid steps (images)
    @pl.when(b == 0)
    def _():
        dma(0, 0).start()

    @pl.when(b + 1 < pl.num_programs(0))
    def _():
        dma((b + 1) % 2, b + 1).start()

    slot = b % 2
    dma(slot, b).wait()

    def expand_dw(tile_idx):
        row0 = tile_idx * T
        x_tile = slab[slot, pl.ds(row0, T + K - 1)]  # [T+K-1, Wfull, Cin_p]
        flat = x_tile.reshape((T + K - 1) * Wfull, x_tile.shape[2])
        exp = jnp.dot(flat, we_ref[:], preferred_element_type=jnp.float32) + be_ref[:]
        exp = jax.nn.silu(exp).astype(jnp.bfloat16).reshape(T + K - 1, Wfull, Cmid)
        acc = jnp.zeros((T, W, Cmid), jnp.float32)
        for dy in range(K):
            for dx in range(K):
                acc = acc + (
                    exp[dy : dy + T, dx : dx + W, :].astype(jnp.float32)
                    * wd_ref[dy, dx][None, None, :]
                )
        return jax.nn.silu(acc + bd_ref[:][None, None, :])  # [T, W, Cmid] f32

    def fill(tile_idx, pool):
        dw = expand_dw(tile_idx)
        rows = tile_idx * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
        valid = (rows < H).astype(jnp.float32)
        dw_stash[pl.ds(tile_idx * T, T)] = dw.astype(jnp.bfloat16)
        return pool + jnp.sum(dw * valid, axis=(0, 1))

    pool = jax.lax.fori_loop(0, n_tiles, fill, jnp.zeros((Cmid,), jnp.float32))

    # SE gate in-kernel: two tiny matvecs
    mean = (pool / float(H * W)).reshape(1, Cmid)
    se = jax.nn.silu(
        jnp.dot(mean, wsr_ref[:], preferred_element_type=jnp.float32) + bsr_ref[:]
    )
    gate = jax.nn.sigmoid(
        jnp.dot(se, wse_ref[:], preferred_element_type=jnp.float32) + bse_ref[:]
    )  # [1, Cmid]
    gate_b = gate.astype(jnp.bfloat16)

    def project(tile_idx, _):
        dw = dw_stash[pl.ds(tile_idx * T, T)]  # [T, W, Cmid] bf16
        gated = dw * gate_b[0][None, None, :]
        proj = jnp.dot(
            gated.reshape(T * W, Cmid), wp_ref[:], preferred_element_type=jnp.float32
        ) + bp_ref[:]
        residual = slab[
            slot, pl.ds(tile_idx * T + hp, T), hp : hp + W, :Cout
        ].astype(jnp.float32)
        out_ref[0, pl.ds(tile_idx * T, T)] = (
            proj.reshape(T, W, Cout) + residual
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, project, 0)


@functools.partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def fused_mbconv_se(
    x: jnp.ndarray,  # [B,H,W,Cin] bf16
    w_exp: jnp.ndarray,  # [Cin, Cmid] folded
    b_exp: jnp.ndarray,
    w_dw: jnp.ndarray,  # [K, K, Cmid] folded
    b_dw: jnp.ndarray,
    w_se_r: jnp.ndarray,  # [Cmid, Cse]
    b_se_r: jnp.ndarray,
    w_se_e: jnp.ndarray,  # [Cse, Cmid]
    b_se_e: jnp.ndarray,
    w_proj: jnp.ndarray,  # [Cmid, Cout] folded
    b_proj: jnp.ndarray,
    *,
    kernel_size: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    K = kernel_size
    hp = K // 2
    Cmid = w_exp.shape[1]
    Cout = w_proj.shape[1]
    Hp = ((H + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    # DMA-friendly padding: haloed width → multiple of 8, channels → 128
    Wh = ((W + 2 * hp + 7) // 8) * 8
    Cin_p = ((Cin + 127) // 128) * 128
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (hp, Hp - H + hp), (hp, Wh - W - hp), (0, Cin_p - Cin)),
    )
    w_exp = jnp.pad(w_exp, ((0, Cin_p - Cin), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_block_kernel, K=K, W=W, H=H, Hp=Hp),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cout), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                memory_space=getattr(pl, "ANY", None) or pltpu.ANY
            )
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(
            (1, Hp, W, Cout), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Hp + K - 1, Wh, Cin_p), jnp.bfloat16),
            pltpu.VMEM((Hp, W, Cmid), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        xp,
        w_exp.astype(jnp.bfloat16),
        b_exp.astype(jnp.float32),
        w_dw.astype(jnp.float32),
        b_dw.astype(jnp.float32),
        w_se_r.astype(jnp.bfloat16),
        b_se_r.astype(jnp.float32),
        w_se_e.astype(jnp.bfloat16),
        b_se_e.astype(jnp.float32),
        w_proj.astype(jnp.bfloat16),
        b_proj.astype(jnp.float32),
    )
    return out[:, :H]
