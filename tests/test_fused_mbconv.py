"""Fused MBConv+SE Pallas kernel vs plain-ops reference (interpret mode).

Status: correct but NOT integrated — measured on v5e it does not beat XLA's
fusion for these blocks (4.2ms vs 3.4ms at the 28²/576ch shape), so the
models keep the XLA path per the only-keep-wins rule (SURVEY.md §7.6).
Kept as tested infrastructure for future tuning.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.ops.pallas.fused_mbconv import fused_mbconv_se


def _reference(x, args, K):
    B, H, W, Cin = x.shape
    w_exp, b_exp, w_dw, b_dw, w_se_r, b_se_r, w_se_e, b_se_e, w_proj, b_proj = args
    Cmid = w_exp.shape[1]
    exp = jax.nn.silu(
        jnp.einsum("bhwc,cd->bhwd", x, w_exp.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + b_exp
    ).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        (B, H, W, Cmid), (K, K, 1, Cmid), ("NHWC", "HWIO", "NHWC")
    )
    dw = jax.lax.conv_general_dilated(
        exp, w_dw[:, :, None, :].astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn, feature_group_count=Cmid,
        preferred_element_type=jnp.float32,
    )
    dw = jax.nn.silu(dw + b_dw)
    mean = dw.mean(axis=(1, 2))
    se = jax.nn.silu(mean @ w_se_r + b_se_r)
    gate = jax.nn.sigmoid(se @ w_se_e + b_se_e)
    gated = (dw * gate[:, None, None, :]).astype(jnp.bfloat16)
    proj = jnp.einsum(
        "bhwc,cd->bhwd", gated, w_proj.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + b_proj
    return (proj + x.astype(jnp.float32)).astype(jnp.bfloat16)


def _mk_args(rng, Cin, Cmid, Cse, Cout, K):
    f = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)  # noqa: E731
    return (
        f(Cin, Cmid), f(Cmid), f(K, K, Cmid), f(Cmid),
        f(Cmid, Cse), f(Cse), f(Cse, Cmid), f(Cmid),
        f(Cmid, Cout), f(Cout),
    )


def test_fused_block_matches_reference_k3():
    rng = np.random.default_rng(0)
    B, H, W, Cin, K = 2, 14, 14, 16, 3
    args = _mk_args(rng, Cin, Cin * 6, Cin // 4, Cin, K)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.bfloat16)
    ref = np.asarray(_reference(x, args, K), np.float32)
    got = np.asarray(
        fused_mbconv_se(x, *args, kernel_size=K, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_fused_block_matches_reference_k5_nonaligned():
    rng = np.random.default_rng(1)
    B, H, W, Cin, K = 2, 10, 12, 24, 5  # H not a tile multiple, K=5 halo
    args = _mk_args(rng, Cin, Cin * 6, max(Cin // 4, 1), Cin, K)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.bfloat16)
    ref = np.asarray(_reference(x, args, K), np.float32)
    got = np.asarray(
        fused_mbconv_se(x, *args, kernel_size=K, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
