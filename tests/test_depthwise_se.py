"""Fused depthwise+SiLU+SE-pool Pallas kernel vs the XLA path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.ops.pallas.depthwise_se import depthwise_silu_pool


@pytest.mark.parametrize("H,W,C,k", [(7, 7, 256, 5), (14, 14, 128, 3), (9, 11, 128, 5)])
def test_depthwise_silu_pool_matches_xla(H, W, C, k):
    B = 4
    rng = np.random.default_rng(k + H)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(scale=0.2, size=(k, k, C)), jnp.float32)
    b = jnp.asarray(rng.normal(scale=0.1, size=(C,)), jnp.float32)

    y, pool = depthwise_silu_pool(x, w, b, H=H, W=W, k=k, interpret=True)

    # XLA reference: depthwise conv, zero pad k//2, + bias, SiLU
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (k, k, 1, C), ("NHWC", "HWIO", "NHWC")
    )
    r = k // 2
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.reshape(k, k, 1, C),
        (1, 1),
        ((r, r), (r, r)),
        dimension_numbers=dn,
        feature_group_count=C,
    ) + b
    ref_y = (jax.nn.silu(ref)).astype(jnp.bfloat16)
    ref_pool = jnp.mean(ref_y.astype(jnp.float32), axis=(1, 2))

    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref_y, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(pool), np.asarray(ref_pool), atol=2e-3, rtol=2e-3
    )


def test_convbn_spatial_mean_contract_off_tpu():
    """On CPU the fused path must stay off: ConvBN returns (y, None) and the
    model output is unchanged vs the plain call."""
    from deepfakedetection_tpu.models.common import ConvBN
    from flax import linen as nn

    m = ConvBN(8, (3, 3), groups=8, act=nn.silu, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 8)), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    y_pair = m.apply(vs, x, False, True)
    assert isinstance(y_pair, tuple) and y_pair[1] is None
    y_plain = m.apply(vs, x, False)
    np.testing.assert_array_equal(np.asarray(y_pair[0]), np.asarray(y_plain))
