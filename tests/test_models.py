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
    # map == window at stage 3 → degenerates to plain attention (no CTs)
    from deepfakedetection_tpu.models.fastervit import FasterViT

    m = FasterViT(
        num_classes=2, dim=16, in_dim=8, depths=(1, 1, 1, 1),
        num_heads=(1, 1, 2, 2), window_size=2, ct_size=1, dtype=jnp.float32,
    )
    v = _init(m, 32)  # stage3 map 2x2 == window → PlainBlock fallback
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 2)
    assert "blk" in v["params"]["stage2_block0"]  # plain path, no HAT


def test_fastervit_hat_path_forward():
    # tiny config with window < map size → real carrier-token path, fast
    # CPU compile (the full 224px config is covered by the slow tests)
    from deepfakedetection_tpu.models.fastervit import FasterViT

    m = FasterViT(
        num_classes=3, dim=16, in_dim=8, depths=(1, 1, 2, 1),
        num_heads=(1, 1, 2, 2), window_size=2, ct_size=1, dtype=jnp.float32,
    )
    v = _init(m, 64)  # stage3 map 4x4 → 2x2 windows of size 2 → CTs active
    out, inter = jax.jit(
        lambda v, x: m.apply(v, x, train=False, mutable=["intermediates"])
    )(v, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 3)
    feats = jax.tree.leaves(inter["intermediates"])[0]
    assert feats.shape[1:3] == (2, 2)
    assert "stage2_block0" in v["params"]
    assert "hat" in v["params"]["stage2_block0"]  # CT sub-block exists


def test_fastervit_official_mode_tiny_forward():
    # cpb positional mode end-to-end on a tiny config (both block kinds)
    from deepfakedetection_tpu.models.fastervit import FasterViT

    m = FasterViT(
        num_classes=2, dim=16, in_dim=8, depths=(1, 1, 2, 1),
        num_heads=(1, 1, 2, 2), window_size=2, ct_size=1, pos_mode="cpb",
        dtype=jnp.float32,
    )
    v = _init(m, 64)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 2)
    blk = v["params"]["stage2_block0"]
    # official machinery present, TPU-mode tables absent
    assert "pos_embed" in blk and "hat_pos_embed" in blk
    assert "pos_emb_funct" in blk["win"]["attn"]
    assert "rel_bias" not in blk["win"]["attn"]
    assert "attn_gamma" not in blk["win"]  # layer_scale=None in official mode


@pytest.mark.slow
def test_efficientformer_v2_s1_param_count_matches_published():
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    m = create_efficientformer_v2("s1", num_classes=1000, dtype=jnp.float32)
    v = _init(m, 224)
    # exact itemized count of the timm efficientformerv2_s1 architecture
    # (stem + 4 stages + attn downsamples + dual heads), BN stats excluded
    assert _n_params(v) == 6_262_792


def test_efficientformer_v2_forward_small():
    # 96px: stage-3 stride attention at 6x6→3x3, stage-4 at 3x3 — all code
    # paths of the 224 config at a fraction of the CPU compile time
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    m = create_efficientformer_v2("s0", num_classes=2, dtype=jnp.float32)
    v = _init(m, 96)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((1, 96, 96, 3)))
    assert out.shape == (1, 2)


def test_registry_builders_construct_models():
    for name in ("efficientnet_b3", "efficientformerv2_s1", "faster_vit_2_224"):
        spec = get_model_spec(name)
        model = spec.builder(2, dtype=jnp.float32)
        assert hasattr(model, "apply")


def test_fastervit_v4_tpu_heads_divide_and_bad_size_raises():
    """_tpu_heads must pick divisors of the stage dim (FasterViT-4's dim 196
    has no 128-wide split) and non-multiple-of-112 sizes fail clearly."""
    import jax

    from deepfakedetection_tpu.models.fastervit import _tpu_heads, create_faster_vit

    for dim, official in ((64, (2, 4, 8, 16)), (96, (2, 4, 8, 16)), (196, (4, 8, 16, 32))):
        for stage, h in enumerate(_tpu_heads(dim, official)):
            assert (dim * 2**stage) % h == 0, (dim, stage, h)
    m = create_faster_vit("4", num_classes=2, dtype=jnp.float32)
    jax.eval_shape(
        lambda k: m.init({"params": k}, jnp.zeros((1, 224, 224, 3)), train=False),
        jax.random.key(0),
    )
    m2 = create_faster_vit("2", num_classes=2, dtype=jnp.float32)
    with pytest.raises(ValueError, match="divisible by window_size"):
        jax.eval_shape(
            lambda k: m2.init({"params": k}, jnp.zeros((1, 256, 256, 3)), train=False),
            jax.random.key(0),
        )
