"""Pallas fused window attention vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.parametrize("impl", ["masked", "sliced", "headed", "xla"])
def test_pallas_v2_grad_matches_xla(impl, monkeypatch):
    """jax.grad through every selectable v2 backward implementation must
    match the XLA path's autodiff gradients — for qkv AND the bias
    (VERDICT r2 #3; the impls' measurements are in _bwd_impl)."""
    monkeypatch.setenv("DFD_WINATTN_BWD", impl)
    if impl == "sliced":  # sliced fwd pairs with the sliced bwd in practice
        monkeypatch.setenv("DFD_WINATTN_FWD", "sliced")
    for B, N, h, d, seed in ((4, 53, 8, 48, 0), (2, 49, 16, 48, 1)):
        q, k, v, bias, scale = _mk(B=B, N=N, h=h, d=d, seed=seed)
        C = h * d
        qkv = jnp.concatenate([t.reshape(B, N, C) for t in (q, k, v)], axis=-1)
        rng = np.random.default_rng(seed + 10)
        # a non-trivial downstream cotangent: weighted sum of outputs
        w = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

        def loss_pallas(qkv_in, bias_in):
            out = window_mhsa_qkv_pallas(
                qkv_in, bias_in, num_heads=h, scale=scale, interpret=True
            )
            return jnp.sum(out.astype(jnp.float32) * w)

        def loss_xla(qkv_in, bias_in):
            q5 = qkv_in[:, :, 0:C].reshape(B, N, h, d)
            k5 = qkv_in[:, :, C : 2 * C].reshape(B, N, h, d)
            v5 = qkv_in[:, :, 2 * C : 3 * C].reshape(B, N, h, d)
            out = window_mhsa_xla(q5, k5, v5, bias_in, scale=scale)
            return jnp.sum(out.astype(jnp.float32) * w)

        gp_qkv, gp_bias = jax.grad(loss_pallas, argnums=(0, 1))(qkv, bias)
        gx_qkv, gx_bias = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
        sq = max(float(jnp.abs(gx_qkv).max()), 1e-3)
        sb = max(float(jnp.abs(gx_bias).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gp_qkv, np.float32) / sq,
            np.asarray(gx_qkv, np.float32) / sq,
            atol=4e-2,  # bf16 matmul accumulations on both sides
            err_msg=f"dqkv mismatch at B={B} N={N} h={h}",
        )
        np.testing.assert_allclose(
            np.asarray(gp_bias, np.float32) / sb,
            np.asarray(gx_bias, np.float32) / sb,
            atol=4e-2,
            err_msg=f"dbias mismatch at B={B} N={N} h={h}",
        )


def test_sliced_kernels_handle_non_power_of_two_windows():
    """B=6 windows forces the G-fallback (G=2, 3 grid steps) in both v5
    kernels; results must match the masked kernels."""
    from deepfakedetection_tpu.ops.pallas.window_attn import (
        fused_window_attention_v2,
        fused_window_attention_v2_bwd,
        fused_window_attention_v5,
        fused_window_attention_v5_bwd,
    )

    B, N, h, d = 6, 64, 8, 48
    C = h * d
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
    dout = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    kw = dict(num_heads=h, scale=d**-0.5, interpret=True)
    a = fused_window_attention_v5(qkv, bias, **kw)
    b = fused_window_attention_v2(qkv, bias, **kw)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-2
    )
    ga = fused_window_attention_v5_bwd(qkv, bias, dout, **kw)
    gb = fused_window_attention_v2_bwd(qkv, bias, dout, **kw)
    np.testing.assert_allclose(
        np.asarray(ga[0], np.float32), np.asarray(gb[0], np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(ga[1], np.float32), np.asarray(gb[1], np.float32), atol=1e-4
    )


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


def test_pallas_attn4d_matches_xla_reference():
    """Fused EFv2 Attention4D (q·kᵀ → bias → th1 → softmax → th2 → ·v) must
    match the plain einsum math at the model's shapes (N=49, h=8, d=32,
    dv=128) and at a non-tile-aligned N."""
    from deepfakedetection_tpu.ops.pallas.attn4d import attn4d_pallas

    for B, N, h, d, dv, seed in ((4, 49, 8, 32, 128, 0), (2, 25, 4, 16, 64, 1)):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, N, h * d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, N, h * d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, N, h * dv)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)
        th1 = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
        th1_b = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        th2 = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
        th2_b = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
        scale = d ** -0.5

        # XLA reference — the exact einsum chain from the model
        qh = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        vh = v.reshape(B, N, h, dv).transpose(0, 2, 1, 3)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) * scale + bias[None]
        attn = jnp.einsum("bhnm,hg->bgnm", attn, th1) + th1_b[None, :, None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        attn = (
            jnp.einsum("bhnm,hg->bgnm", attn, th2) + th2_b[None, :, None, None]
        ).astype(jnp.bfloat16)
        ref = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, vh, preferred_element_type=jnp.float32
        )
        ref = np.asarray(
            ref.transpose(0, 2, 1, 3).reshape(B, N, h * dv), np.float32
        )

        out = np.asarray(
            attn4d_pallas(
                q, k, v, bias, th1, th1_b, th2, th2_b,
                num_heads=h, scale=scale, interpret=True,
            ),
            np.float32,
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_fastervit_uses_xla_path_on_cpu():
    """On CPU the dispatcher must fall back to XLA (kernel is TPU-only)."""
    from deepfakedetection_tpu.ops.attention import use_pallas_default

    assert jax.default_backend() == "cpu"
    assert use_pallas_default() is False


def test_backend_env_selectors_validate(monkeypatch):
    """Unknown DFD_WINATTN_BWD/FWD values warn and fall back to the defaults
    instead of silently dispatching the slowest backend (round-3 review)."""
    import warnings

    from deepfakedetection_tpu.ops.pallas import window_attn as wa

    monkeypatch.setenv("DFD_WINATTN_BWD", "pallas")  # the old docstring's lie
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert wa._bwd_impl() == "sliced"
    assert any("DFD_WINATTN_BWD" in str(w.message) for w in caught)

    monkeypatch.setenv("DFD_WINATTN_FWD", "slice")  # typo'd value
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert wa._fwd_impl("masked") == "masked"
    assert any("DFD_WINATTN_FWD" in str(w.message) for w in caught)

    monkeypatch.setenv("DFD_WINATTN_BWD", "xla")
    assert wa._bwd_impl() == "xla"
