"""Every registry-accepted variant must build and run a forward pass.

The registry prefix-matches names (efficientformer*, faster_vit* — reference
model_registry.py:60-75) and EfficientNet carries the full B0-B7 compound
grid, so variants beyond the three reference configs are part of the
accepted surface; a config typo in any row would otherwise only surface at
a user's first run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.train.steps import init_model_variables


def _forward(model, size):
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, size, size, 3)
    )
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((1, size, size, 3), jnp.float32),
        train=False,
    )
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["b1", "b2", "b4", "b5", "b6", "b7"])
def test_efficientnet_variant_builds(variant):
    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    # b0/b3 are covered elsewhere at full depth; 64px keeps the big
    # variants' forward cheap while still exercising every block config
    _forward(create_efficientnet(variant, num_classes=2, dtype=jnp.float32), 64)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["s2", "l"])
def test_efficientformer_v2_variant_builds(variant):
    from deepfakedetection_tpu.models.efficientformer_v2 import (
        create_efficientformer_v2,
    )

    _forward(
        create_efficientformer_v2(variant, num_classes=2, dtype=jnp.float32), 96
    )


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["0", "1", "3"])
def test_fastervit_variant_builds(variant):
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    # 224 is the supported resolution family (window 7 + carrier grid);
    # variants 2/4 are covered elsewhere
    _forward(create_faster_vit(variant, num_classes=2, dtype=jnp.float32), 224)
