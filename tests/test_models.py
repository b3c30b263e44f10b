"""Model zoo unit tests: shapes, param-count fidelity vs published numbers,
window partition round-trip, registry builders. Small resolutions keep CPU
compile time sane; param-count checks use the real 224px configs (init only
where needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.models.efficientnet import create_efficientnet
from deepfakedetection_tpu.models.fastervit import (
    create_faster_vit,
    window_partition,
    window_reverse,
)
from deepfakedetection_tpu.registry import get_model_spec


def _init(model, size):
    return jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, size, size, 3)), train=False)
    )(jax.random.key(0))


def _n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


def test_efficientnet_b3_param_count_matches_published():
    m = create_efficientnet("b3", num_classes=1000, dtype=jnp.float32)
    v = _init(m, 64)
    # published EfficientNet-B3: 12.23M @ 1000 classes
    assert abs(_n_params(v) / 1e6 - 12.23) < 0.1


def test_efficientnet_forward_and_cam_features():
    m = create_efficientnet("b0", num_classes=2, dtype=jnp.float32)
    v = _init(m, 64)
    logits, inter = jax.jit(
        lambda v, x: m.apply(v, x, train=False, mutable=["intermediates"])
    )(v, jnp.ones((2, 64, 64, 3)))
    assert logits.shape == (2, 2)
    feats = jax.tree.leaves(inter["intermediates"])[0]
    assert feats.shape == (2, 2, 2, 1280)  # 64/32 spatial, B0 head width


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 14 * 14 * 3, dtype=jnp.float32).reshape(2, 14, 14, 3)
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 3)
    back = window_reverse(w, 7, 14, 14, 2)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


@pytest.mark.slow
def test_fastervit_2_param_count_close_to_published():
    m = create_faster_vit("2", num_classes=1000, dtype=jnp.float32)
    v = _init(m, 224)
    n = _n_params(v) / 1e6
    # published FasterViT-2: 75.9M; positional-embedding internals differ
    # (documented delta in models/fastervit.py) — require within 10%
    assert abs(n - 75.9) / 75.9 < 0.10


def test_fastervit_small_input_forward():
    # 112px: stage3 at 7x7 → degenerates to plain attention (no CTs)
    m = create_faster_vit("0", num_classes=2, dtype=jnp.float32)
    v = _init(m, 112)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((2, 112, 112, 3)))
    assert out.shape == (2, 2)


def test_fastervit_hat_path_forward():
    # 224px stage3 is 14x14 → real carrier-token path
    m = create_faster_vit("0", num_classes=3, dtype=jnp.float32)
    v = _init(m, 224)
    out, inter = jax.jit(
        lambda v, x: m.apply(v, x, train=False, mutable=["intermediates"])
    )(v, jnp.ones((1, 224, 224, 3)))
    assert out.shape == (1, 3)
    feats = jax.tree.leaves(inter["intermediates"])[0]
    assert feats.shape[1:3] == (7, 7)


@pytest.mark.slow
def test_efficientformer_v2_s1_param_count_matches_published():
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    m = create_efficientformer_v2("s1", num_classes=1000, dtype=jnp.float32)
    v = _init(m, 224)
    # exact itemized count of the timm efficientformerv2_s1 architecture
    # (stem + 4 stages + attn downsamples + dual heads), BN stats excluded
    assert _n_params(v) == 6_262_792


def test_efficientformer_v2_forward_224():
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    m = create_efficientformer_v2("s0", num_classes=2, dtype=jnp.float32)
    v = _init(m, 224)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((1, 224, 224, 3)))
    assert out.shape == (1, 2)


def test_registry_builders_construct_models():
    for name in ("efficientnet_b3", "efficientformerv2_s1", "faster_vit_2_224"):
        spec = get_model_spec(name)
        model = spec.builder(2, dtype=jnp.float32)
        assert hasattr(model, "apply")
