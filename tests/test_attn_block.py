"""Fused attention sub-block (ops/pallas/attn_block.py): interpret-mode
parity of the forward and ALL six gradients against the pure-JAX reference,
and param-tree identity of the fused TokenAttention branch.

The kernel is opt-in (DFD_FUSED_ATTN=1): the end-to-end A/B measured it
SLOWER than the decomposed sliced path (1,582 vs 1,666 img/s official
train, docs/BENCHMARKS.md) — kept as a working measured-negative per the
SURVEY §7.6 benchmark-and-reject methodology.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deepfakedetection_tpu.ops.pallas.attn_block import (  # noqa: E402
    attn_subblock,
    attn_subblock_reference,
)


def _inputs(B, N, h, d, seed=2):
    C = h * d
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("B,N,h,d", [(8, 64, 8, 48), (4, 64, 16, 48)])
def test_fused_subblock_forward_matches_reference(B, N, h, d):
    x, wqkv, bqkv, bias, wproj, bproj = _inputs(B, N, h, d)
    scale = d**-0.5
    out = attn_subblock(h, scale, True, x, wqkv, bqkv, bias, wproj, bproj)
    ref = attn_subblock_reference(
        x, wqkv, bqkv, bias, wproj, bproj, num_heads=h, scale=scale
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_fused_subblock_grads_match_reference():
    B, N, h, d = (8, 64, 8, 48)
    x, wqkv, bqkv, bias, wproj, bproj = _inputs(B, N, h, d)
    scale = d**-0.5
    C = h * d
    w = jnp.asarray(np.random.default_rng(7).normal(size=(B, N, C)), jnp.float32)

    def loss_p(*a):
        return jnp.sum(
            attn_subblock(h, scale, True, *a).astype(jnp.float32) * w
        )

    def loss_r(*a):
        return jnp.sum(
            attn_subblock_reference(*a, num_heads=h, scale=scale).astype(
                jnp.float32
            )
            * w
        )

    args = (x, wqkv, bqkv, bias, wproj, bproj)
    gp = jax.grad(loss_p, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    for a, b, nm in zip(
        gp, gr, ("dx", "dwqkv", "dbqkv", "dbias", "dwproj", "dbproj")
    ):
        s = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / s,
            np.asarray(b, np.float32) / s,
            atol=4e-2,
            err_msg=f"{nm} mismatch",
        )


def test_fused_branch_param_tree_identical(monkeypatch):
    """DFD_FUSED_ATTN must not change the flax param tree (checkpoints,
    weight conversion, and the non-fused path all share it)."""
    import deepfakedetection_tpu.ops.attention as attn_mod
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    def shapes(fused):
        if fused:
            monkeypatch.setenv("DFD_FUSED_ATTN", "1")
            monkeypatch.setenv("DFD_ENABLE_PALLAS", "1")
            monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
        else:
            monkeypatch.delenv("DFD_FUSED_ATTN", raising=False)
            monkeypatch.delenv("DFD_ENABLE_PALLAS", raising=False)
        m = create_faster_vit("2", num_classes=2, head_config="official")
        v = jax.eval_shape(
            lambda k: m.init(
                {"params": k}, jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
                train=False,
            ),
            jax.random.key(0),
        )
        flat = jax.tree_util.tree_flatten_with_path(
            jax.tree.map(lambda s: (s.shape, str(s.dtype)), v)
        )[0]
        return {jax.tree_util.keystr(k): val for k, val in flat}

    base, fused = shapes(False), shapes(True)
    assert base == fused
