"""Fused expand+depthwise kernel (ops/pallas/expand_dw.py): interpret-mode
parity vs the plain XLA chain, and the MBConv dispatch path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.ops.pallas import expand_dw


def _reference(x, wexp, bexp, wdw, bdw, k):
    y1 = jax.nn.silu(
        jnp.einsum("bhwc,cf->bhwf", x.astype(jnp.float32), wexp.astype(jnp.float32))
        + bexp
    )
    r = k // 2
    dn = jax.lax.conv_dimension_numbers(
        y1.shape, (k, k, 1, y1.shape[-1]), ("NHWC", "HWIO", "NHWC")
    )
    conv = jax.lax.conv_general_dilated(
        y1,
        wdw.astype(jnp.float32).reshape(k, k, 1, -1),
        window_strides=(1, 1),
        padding=((r, r), (r, r)),
        dimension_numbers=dn,
        feature_group_count=y1.shape[-1],
    )
    y = jax.nn.silu(conv + bdw)
    return y, jnp.mean(y, axis=(1, 2))


@pytest.mark.parametrize("k,H,Cin,Ce", [(3, 14, 8, 32), (5, 10, 16, 24)])
def test_kernel_matches_xla_chain(k, H, Cin, Ce):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, H, H, Cin)), jnp.bfloat16)
    wexp = jnp.asarray(rng.normal(size=(Cin, Ce)) * 0.3, jnp.float32)
    bexp = jnp.asarray(rng.normal(size=(Ce,)) * 0.1, jnp.float32)
    wdw = jnp.asarray(rng.normal(size=(k, k, Ce)) * 0.3, jnp.float32)
    bdw = jnp.asarray(rng.normal(size=(Ce,)) * 0.1, jnp.float32)
    y, pooled = expand_dw.expand_dw_silu_pool(
        x, wexp, bexp, wdw, bdw, kernel=k, interpret=True
    )
    ref_y, ref_pool = _reference(x, wexp, bexp, wdw, bdw, k)
    assert y.shape == ref_y.shape and pooled.shape == ref_pool.shape
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref_y), atol=0.05, rtol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(ref_pool), atol=0.02, rtol=0.05
    )


def test_mbconv_dispatch_matches_unfused(monkeypatch):
    """MBConv routed through the fused kernel (interpret mode) must match the
    plain two-ConvBN eval path on the same params."""
    from deepfakedetection_tpu.models.efficientnet import BlockArgs, MBConv

    args = BlockArgs(
        in_features=8, out_features=8, expand_ratio=6, kernel=3, stride=1,
        se_ratio=0.25, drop_rate=0.0, dw_padding=((1, 1), (1, 1)),
    )
    m = MBConv(args, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 12, 12, 8), jnp.float32)
    v = m.init({"params": jax.random.key(1)}, jnp.zeros((1, 12, 12, 8)), train=False)
    ref = m.apply(v, x, train=False)

    monkeypatch.setattr(expand_dw, "use_pallas_expdw", lambda *a: True)
    orig = expand_dw.expand_dw_silu_pool

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(expand_dw, "expand_dw_silu_pool", interp)
    fused = m.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
    # param tree identical either way (checkpoint compatibility)
    v2 = m.init({"params": jax.random.key(1)}, jnp.zeros((1, 12, 12, 8)), train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
