"""Shared Flax building blocks (NHWC, bf16 compute / f32 params & norms)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm (+ optional activation). NHWC, TF-style SAME padding.

    BatchNorm runs in float32 for numerical stability regardless of the
    compute dtype; output is cast back to ``dtype``.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    act: Callable | None = None
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x.astype(self.dtype)


class SqueezeExcite(nn.Module):
    """SE block: global-avg-pool → reduce 1x1 → act → expand 1x1 → sigmoid gate."""

    reduced_features: int
    act: Callable = nn.silu
    gate: Callable = nn.sigmoid
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
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
