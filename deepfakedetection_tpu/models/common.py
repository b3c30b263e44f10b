"""Shared Flax building blocks (NHWC, bf16 compute / f32 params & norms)."""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_EXACT_GELU = os.environ.get("DFD_EXACT_GELU") == "1"


def gelu_exact(x):
    """GELU for models whose torch reference uses nn.GELU (exact erf).

    Defaults to the tanh form: its maximum deviation from exact erf-GELU is
    4.8e-4 absolute (sub-ulp in bf16), while XLA-TPU's erf lowering measured
    a 33% END-TO-END throughput hit on FasterViT-2 (6,323 → 4,256 img/s).
    ``DFD_EXACT_GELU=1`` opts into true erf for bitwise parity audits
    (tools/parity.py reports the delta either way).
    """
    return nn.gelu(x, approximate=not _EXACT_GELU)

# Trace-time BatchNorm momentum override. Used by BN recalibration
# (train/steps.py): tracing a stats-only step with momentum 0 makes the
# mutated running stats EQUAL the batch statistics, so fresh stats can be
# averaged over a few batches instead of crawling there at momentum 0.99.
_BN_MOMENTUM_OVERRIDE: contextvars.ContextVar[float | None] = contextvars.ContextVar(
    "bn_momentum_override", default=None
)


@contextlib.contextmanager
def bn_momentum_override(value: float | None):
    token = _BN_MOMENTUM_OVERRIDE.set(value)
    try:
        yield
    finally:
        _BN_MOMENTUM_OVERRIDE.reset(token)


def effective_bn_momentum(default: float) -> float:
    override = _BN_MOMENTUM_OVERRIDE.get()
    return default if override is None else override


class BatchNorm2d(nn.Module):
    """Standalone BatchNorm over NHWC (f32 stats, override-aware momentum).

    Drop-in for flax nn.BatchNorm where a bare norm is needed (stage outputs);
    sharing the ConvBN stat machinery keeps recalibration uniform. Default
    momentum 0.9 matches torch BatchNorm2d (momentum 0.1 = decay 0.9), the
    convention of the timm/fastervit references and ConvBN.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        y = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(y.ndim - 1))
            mean = jnp.mean(y, axis=axes)
            var = jnp.var(y, axis=axes)
            m = effective_bn_momentum(self.momentum)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (y - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv_f32_out(x, w, strides, padding, dn, groups):
    """Conv with an f32 fused epilogue AND a differentiable path.

    ``preferred_element_type=f32`` on bf16 operands makes XLA fuse the
    convert (and downstream elementwise math) into the conv epilogue —
    measured faster than conv→astype for the BN train path — but its
    built-in VJP rejects the operand/cotangent dtype mismatch. The custom
    VJP computes gradients through the PLAIN bf16 conv (identical to what
    the old train path produced): cast the f32 cotangent to the operand
    dtype and pull back. MXU accumulation stays f32 either way.
    """
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding, dimension_numbers=dn,
        feature_group_count=groups, preferred_element_type=jnp.float32,
    )


def _conv_f32_out_fwd(x, w, strides, padding, dn, groups):
    return _conv_f32_out(x, w, strides, padding, dn, groups), (x, w)


def _conv_f32_out_bwd(strides, padding, dn, groups, res, g):
    x, w = res
    _, pullback = jax.vjp(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, window_strides=strides, padding=padding,
            dimension_numbers=dn, feature_group_count=groups,
        ),
        x, w,
    )
    return pullback(g.astype(x.dtype))


_conv_f32_out.defvjp(_conv_f32_out_fwd, _conv_f32_out_bwd)


def use_pallas_dwse() -> bool:
    """Dispatch for the fused depthwise+SiLU+SE-pool kernel
    (ops/pallas/depthwise_se.py). EXPERIMENTAL AND MEASURED-BAD — stays OFF:
    on v5e the compiled kernel executed pathologically slowly end-to-end
    (the bench's 40-min ceiling expired with no result; docs/BENCHMARKS.md
    ledger). Interpret-mode numerics are verified (tests/test_depthwise_se
    .py); the dispatch is kept only for future re-measurement.
    DFD_ENABLE_PALLAS_DWSE=1 / DFD_DISABLE_PALLAS=1 override."""
    from deepfakedetection_tpu.runtime.flags import env_flag, on_tpu

    if env_flag("DFD_DISABLE_PALLAS") or not on_tpu():
        return False
    return env_flag("DFD_ENABLE_PALLAS_DWSE")


def dw_group_size() -> int:
    """Opt-in experiment: serve eligible eval-path depthwise convs as
    block-diagonal GROUPED convs with this many channels per group
    (``DFD_DW_GROUP_SIZE``, 0 = off). The math is identical — each group's
    g×g cross-channel weight block is diagonal — but the contraction gains a
    K = g·k² axis, moving the op from the VPU window loop (the profiled
    44-233 GB/s depthwise+SE fusions holding ~29 ms of the 50 ms eval step,
    docs/BENCHMARKS.md) onto the MXU at g× the FLOPs. Restricted to the
    deep low-resolution stages via ``DFD_DW_GROUP_MAXHW`` (default 256 = 16²;
    the early high-resolution depthwise fusions already stream near peak)."""
    try:
        return int(os.environ.get("DFD_DW_GROUP_SIZE", "0"))
    except ValueError:
        return 0


def _dw_group_maxhw() -> int:
    try:
        return int(os.environ.get("DFD_DW_GROUP_MAXHW", "256"))
    except ValueError:
        return 256


def _symmetric_pad(pad, k: int) -> bool:
    """True for the stride-1 zero-pad grid the fused dw kernel implements:
    (k//2, k//2) on both spatial dims (or TF-SAME, identical at stride 1)."""
    if pad == "SAME":
        return True
    r = k // 2
    try:
        return tuple(map(tuple, pad)) == ((r, r), (r, r))
    except TypeError:
        return False


class ConvBN(nn.Module):
    """Conv2D + BatchNorm (+ optional activation). NHWC, TF-style SAME padding.

    Owns its parameters directly so the eval path can FOLD BatchNorm into the
    convolution: ``w' = w * gamma/sqrt(var+eps)``, ``b' = beta - mean *
    gamma/sqrt(var+eps)`` — one conv+bias instead of conv → normalize →
    rescale, eliminating a full HBM pass over the activations per layer.
    Training mode computes batch statistics in f32 (under pjit the batch axis
    is the global batch, i.e. cross-replica synced stats) and updates running
    stats with the usual momentum rule.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    act: Callable | None = None
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    # "SAME" (TF-style, matches efficientnet_pytorch's SamePadding convs) or
    # explicit ((lo,hi),(lo,hi)) pairs. torch Conv2d(k=3, s=2, padding=1) is
    # symmetric ((1,1),(1,1)) and samples a DIFFERENT grid than SAME on even
    # inputs — parity with timm/fastervit checkpoints needs the explicit form.
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_spatial_mean: bool = False,
        fold_only: bool = False,
    ):
        """``return_spatial_mean=True`` returns ``(y, mean|None)`` where mean
        is the f32 spatial mean of y WHEN the fused depthwise+SiLU+pool
        Pallas kernel served this call (ops/pallas/depthwise_se.py) — the SE
        consumer then skips its own pooling pass. None means the caller
        should pool normally.

        ``fold_only=True`` (eval only) declares the parameters and returns
        the BN-folded ``(w, b)`` WITHOUT running the convolution — for
        callers that fuse several convs into one Pallas kernel (e.g. the
        expand+depthwise kernel, ops/pallas/expand_dw.py) while keeping the
        parameter tree checkpoint-identical; ``x`` supplies only the input
        channel count."""
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features // self.groups, self.features),
            jnp.float32,
        )
        conv_bias = (
            self.param("conv_bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )

        pad = self.padding if isinstance(self.padding, str) else tuple(
            map(tuple, self.padding)
        )

        if not train:
            # fold BN (+ conv bias) into the conv weights/bias; the f32
            # epilogue fuses bias+act into the conv (measured +31% eval)
            denom = scale * jax.lax.rsqrt(ra_var.value + self.bn_epsilon)
            w = kernel * denom  # broadcast over output-features dim
            b = bias - (ra_mean.value - (conv_bias if conv_bias is not None else 0.0)) * denom
            if fold_only:
                return w, b
            from deepfakedetection_tpu.ops import quant

            qctx = quant.current_ctx()
            if qctx is not None:
                is_dw = self.groups == self.features == in_features
                eligible = self.groups == 1 or (is_dw and qctx.include_depthwise)
                if eligible and qctx.calibrate:
                    # full-precision calibration pass: record this layer's
                    # input range, then run the normal bf16 conv below.
                    # Range statistic per ctx.calib_mode: global absmax
                    # (default), global |x| percentile (outlier clipping),
                    # or per-input-channel absmax (folded into the weights
                    # by int8_conv).
                    ax = jnp.abs(x.astype(jnp.float32))
                    if qctx.calib_mode == "percentile":
                        stat = jnp.quantile(
                            ax.reshape(-1), jnp.float32(qctx.percentile)
                        )
                    elif qctx.calib_mode == "per-channel":
                        stat = jnp.max(ax, axis=tuple(range(ax.ndim - 1)))
                    else:
                        stat = jnp.max(ax)
                    self.sow("intermediates", "act_absmax", stat)
                elif eligible:
                    sx = qctx.scale_for(self.scope.path)
                    if sx is not None:
                        y = quant.int8_conv(
                            x, w, b, sx, self.strides, pad, dn, self.groups
                        )
                        if self.act is not None:
                            y = self.act(y)
                        y = y.astype(self.dtype)
                        return (y, None) if return_spatial_mean else y
            if (
                return_spatial_mean
                and use_pallas_dwse()
                and self.groups == self.features == in_features
                and self.strides == (1, 1)
                and kh == kw
                and kh in (3, 5)
                and self.act is nn.silu
                and _symmetric_pad(pad, kh)
                # deep stages only: whole-image blocks must fit VMEM, and
                # the early high-resolution fusions already stream well
                and x.shape[1] * x.shape[2] <= 1024
            ):
                from deepfakedetection_tpu.ops.pallas.depthwise_se import (
                    depthwise_silu_pool,
                )

                B, H, W, _ = x.shape
                y, pooled = depthwise_silu_pool(
                    x.astype(self.dtype),
                    w.reshape(kh, kw, self.features),
                    b,
                    H=H, W=W, k=kh,
                )
                return y, pooled
            w_conv, groups_conv = w, self.groups
            g = dw_group_size()
            if (
                g > 1
                and self.groups == self.features == in_features
                and self.features % g == 0
                and x.shape[1] * x.shape[2] <= _dw_group_maxhw()
            ):
                # block-diagonal expansion: wg[:, :, a, c] = w[:, :, 0, c]
                # iff a == c mod g (channel c sits at within-group slot c%g)
                eye = (
                    jnp.arange(g)[:, None] == (jnp.arange(self.features) % g)[None, :]
                ).astype(w.dtype)
                w_conv = w * eye[None, None]  # [kh,kw,1,C]·[1,1,g,C] → [kh,kw,g,C]
                groups_conv = self.features // g
            y = _conv_f32_out(
                x.astype(self.dtype), w_conv.astype(self.dtype), self.strides, pad,
                dn, groups_conv,
            ) + b
        else:
            # TRAIN: keep the whole chain bf16 — stats accumulate in f32 from
            # the bf16 conv output, normalization applies as a bf16 y·a+b.
            # Halving the BN-segment bytes (vs an f32 conv output) measured
            # 1.39k → 2.15k img/s on the full B3 train step (HBM-bound).
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), self.strides,
                pad, dimension_numbers=dn, feature_group_count=self.groups,
            )
            if conv_bias is not None:
                y = y + conv_bias.astype(self.dtype)
            # no-op outside jax.checkpoint; under a save_only_these_names
            # policy it marks the raw conv output as the ONLY saved residual
            # so the BN/act chain recomputes in the backward while the MXU
            # conv does not (fastervit.py conv_remat="save-conv")
            from jax.ad_checkpoint import checkpoint_name

            y = checkpoint_name(y, "convbn_raw")
            axes = (0, 1, 2)
            # one-pass stats: E[x], E[x²] fuse into a single read of y
            mean = jnp.mean(y, axis=axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            m = effective_bn_momentum(self.bn_momentum)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
            denom = scale * jax.lax.rsqrt(var + self.bn_epsilon)
            a = denom.astype(self.dtype)
            b = (bias - mean * denom).astype(self.dtype)
            y = y * a + b
        if self.act is not None:
            y = self.act(y)
        y = y.astype(self.dtype)
        if return_spatial_mean:
            return y, None
        return y


class SqueezeExcite(nn.Module):
    """SE block: global-avg-pool → reduce 1x1 → act → expand 1x1 → sigmoid gate.

    ``pooled`` accepts a precomputed f32 [B, C] spatial mean (emitted by the
    fused depthwise+pool kernel via ConvBN ``return_spatial_mean``) so the
    pooling pass over x is skipped."""

    reduced_features: int
    act: Callable = nn.silu
    gate: Callable = nn.sigmoid
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, pooled: jnp.ndarray | None = None) -> jnp.ndarray:
        if pooled is not None:
            se = pooled[:, None, None, :].astype(self.dtype)
        else:
            # f32-accumulated reduction without materializing an f32 copy
            se = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32).astype(self.dtype)
        se = nn.Conv(self.reduced_features, (1, 1), dtype=self.dtype, name="reduce")(se)
        se = self.act(se)
        se = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(se)
        return x * self.gate(se)


class DropPath(nn.Module):
    """Stochastic depth / drop-connect, per sample. Identity when not training."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.rate <= 0.0:
            return x
        rng = self.make_rng("droppath")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerScale(nn.Module):
    """Per-channel learned scaling (CaiT-style), init gamma * ones."""

    init_value: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (x.shape[-1],), jnp.float32
        )
        return x * gamma.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer MLP: dense → act → dense."""

    hidden_features: int
    out_features: int
    act: Callable = nn.gelu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


def make_divisible(value: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Standard channel rounding used across mobile-net-family models."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)
