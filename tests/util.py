"""Test helpers: a tiny CNN spec so E2E tests run fast on virtual CPU devices."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from deepfakedetection_tpu.registry import ModelSpec, TrainRecipe


class TinyCNN(nn.Module):
    num_classes: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        from deepfakedetection_tpu.models.common import BatchNorm2d

        x = nn.Conv(8, (3, 3), strides=(2, 2), dtype=self.dtype, name="conv1")(x)
        x = BatchNorm2d(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x).astype(self.dtype)
        x = nn.Conv(16, (3, 3), strides=(2, 2), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        self.sow("intermediates", "cam_features", x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)
        return x


def tiny_spec(**recipe_kw) -> ModelSpec:
    recipe = TrainRecipe(
        **{
            "warmup_epochs": 1,
            "head_param_substrings": ("head",),
            "unfreeze": "all",
            "early_stop_patience": None,
            **recipe_kw,
        }
    )
    return ModelSpec(
        name="tiny_cnn",
        family="tiny",
        variant="t",
        weights_key="tiny_cnn",
        default_image_size=32,
        recipe=recipe,
        builder=lambda num_classes, **kw: TinyCNN(
            num_classes=num_classes, dtype=kw.get("dtype", jnp.float32)
        ),
    )
