"""Numerical invariants: warp identity/flip, BN folding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.data.augment import _separable_warp
from deepfakedetection_tpu.models.common import ConvBN


def _params(ty, tx, sy, sx, flip):
    return jnp.asarray([[ty, tx, sy, sx, 1.0, 0.0, flip]], jnp.float32)


def test_separable_warp_identity():
    rng = np.random.default_rng(0)
    S = 32
    img = jnp.asarray(rng.random((1, S, S, 3)), jnp.float32)
    out = _separable_warp(img, _params(0.0, 0.0, 1.0, 1.0, 1.0), S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-2)


def test_separable_warp_flip_involution():
    rng = np.random.default_rng(1)
    S = 32
    img = jnp.asarray(rng.random((1, S, S, 3)), jnp.float32)
    flipped = _separable_warp(img, _params(0.0, 0.0, 1.0, 1.0, -1.0), S)
    np.testing.assert_allclose(
        np.asarray(flipped), np.asarray(img[:, :, ::-1, :]), atol=2e-2
    )


def test_separable_warp_crop_quadrant():
    """Crop of the top-left quadrant resized 1:1 must equal that quadrant."""
    rng = np.random.default_rng(2)
    S, O = 32, 16
    img = jnp.asarray(rng.random((1, S, S, 3)), jnp.float32)
    out = _separable_warp(img, _params(0.0, 0.0, 1.0, 1.0, 1.0), O)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[:, :O, :O]), atol=2e-2)


def test_convbn_folding_matches_unfolded_math():
    """Eval ConvBN (folded) == conv → batchnorm composed by hand."""
    model = ConvBN(8, (3, 3), dtype=jnp.float32, bn_epsilon=1e-3, name="c")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    # non-trivial stats/affine
    params = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.2, jnp.float32),
        "scale": jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=8) * 0.3, jnp.float32),
    }
    stats = {
        "mean": jnp.asarray(rng.normal(size=8) * 0.5, jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32),
    }
    folded = model.apply({"params": params, "batch_stats": stats}, x, train=False)

    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 4, 8), ("NHWC", "HWIO", "NHWC"))
    raw = jax.lax.conv_general_dilated(
        x, params["kernel"], (1, 1), "SAME", dimension_numbers=dn
    )
    manual = (raw - stats["mean"]) * jax.lax.rsqrt(stats["var"] + 1e-3) * params[
        "scale"
    ] + params["bias"]
    np.testing.assert_allclose(np.asarray(folded), np.asarray(manual), atol=1e-4)


def test_convbn_train_updates_running_stats_toward_batch():
    model = ConvBN(4, (1, 1), dtype=jnp.float32, bn_momentum=0.5, name="c")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(16, 4, 4, 2)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    # momentum 0.5 from init 0: new mean = 0.5 * batch_mean — must move
    assert np.abs(new_mean).max() > 0.1


def test_dw_grouped_dispatch_matches_depthwise():
    """DFD_DW_GROUP_SIZE block-diagonal grouped conv == depthwise conv.

    The opt-in MXU reformulation (models/common.py dw_group_size) is exact
    math — each group's g×g weight block is diagonal so the extra
    contraction terms are zero — but backends may accumulate the contraction
    in a different order, so assert a tight tolerance, not bit equality."""
    from flax import linen as nn

    rng = np.random.default_rng(7)
    C = 96
    model = ConvBN(C, (5, 5), groups=C, act=nn.silu, dtype=jnp.float32, name="dw")
    x = jnp.asarray(rng.normal(size=(2, 7, 7, C)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": {
            "mean": jnp.asarray(rng.normal(size=C) * 0.3, jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
        },
    }
    base = model.apply(variables, x, train=False)
    import os

    for g in (16, 48):
        os.environ["DFD_DW_GROUP_SIZE"] = str(g)
        try:
            grouped = model.apply(variables, x, train=False)
        finally:
            del os.environ["DFD_DW_GROUP_SIZE"]
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(grouped), atol=1e-5, rtol=0
        )

    # ineligible cases fall through untouched: g does not divide C; spatial
    # size above the deep-stage ceiling
    os.environ["DFD_DW_GROUP_SIZE"] = "7"
    try:
        same = model.apply(variables, x, train=False)
    finally:
        del os.environ["DFD_DW_GROUP_SIZE"]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    big = jnp.asarray(rng.normal(size=(1, 28, 28, C)), jnp.float32)
    base_big = model.apply(variables, big, train=False)
    os.environ["DFD_DW_GROUP_SIZE"] = "16"
    try:
        same_big = model.apply(variables, big, train=False)
    finally:
        del os.environ["DFD_DW_GROUP_SIZE"]
    np.testing.assert_array_equal(np.asarray(base_big), np.asarray(same_big))
