"""Pallas fused window attention vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.ops.attention import (
    window_mhsa_pallas,
    window_mhsa_qkv_pallas,
    window_mhsa_xla,
)


def _mk(B=4, N=53, h=8, d=48, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
    return q, k, v, bias, d ** -0.5


def test_pallas_matches_xla_unpadded_shapes():
    q, k, v, bias, scale = _mk()
    ref = np.asarray(window_mhsa_xla(q, k, v, bias, scale=scale), np.float32)
    out = np.asarray(
        window_mhsa_pallas(q, k, v, bias, scale=scale, interpret=True), np.float32
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)  # bf16 tolerance


def test_pallas_v2_head_masked_matches_xla():
    """v2 kernel (natural [B,N,3C] layout, head-masked full-K matmuls) must
    agree with the XLA reference at the official FasterViT shapes."""
    for B, N, h, d, seed in ((4, 53, 8, 48, 0), (4, 49, 16, 48, 1), (2, 16, 8, 48, 2)):
        q, k, v, bias, scale = _mk(B=B, N=N, h=h, d=d, seed=seed)
        ref = np.asarray(window_mhsa_xla(q, k, v, bias, scale=scale), np.float32)
        C = h * d
        qkv = jnp.concatenate(
            [t.reshape(B, N, C) for t in (q, k, v)], axis=-1
        )  # [B, N, 3C] in the Dense layout ([3, h, d] feature order)
        out = np.asarray(
            window_mhsa_qkv_pallas(
                qkv, bias, num_heads=h, scale=scale, interpret=True
            ),
            np.float32,
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_pallas_matches_xla_aligned_shapes():
    q, k, v, bias, scale = _mk(B=8, N=64, h=4, d=64, seed=1)
    ref = np.asarray(window_mhsa_xla(q, k, v, bias, scale=scale), np.float32)
    out = np.asarray(
        window_mhsa_pallas(q, k, v, bias, scale=scale, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_padded_keys_are_masked():
    """Padding columns must not receive attention mass."""
    q, k, v, bias, scale = _mk(B=2, N=10, h=2, d=8, seed=2)
    # make the values at padded positions huge: if masking failed, outputs
    # would blow up; they must match the unpadded XLA result instead
    ref = np.asarray(window_mhsa_xla(q, k, v, bias, scale=scale), np.float32)
    out = np.asarray(
        window_mhsa_pallas(q, k, v, bias, scale=scale, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_fastervit_uses_xla_path_on_cpu():
    """On CPU the dispatcher must fall back to XLA (kernel is TPU-only)."""
    from deepfakedetection_tpu.ops.attention import use_pallas_default

    assert jax.default_backend() == "cpu"
    assert use_pallas_default() is False
