"""Multi-device validation for the TRANSFORMER families (VERDICT r3 #2).

The reference is single-device (SURVEY.md §2.x); our mesh data-parallelism
must produce single-device math for every family — not just EfficientNet-B3.
These tests trace FasterViT (real HAT carrier-token path at 224px) and
EfficientFormerV2 (4D attention) inside a multi-device-sharded jit on the
8-virtual-device CPU mesh, and prove the Pallas window-attention custom_vjp
composes with input sharding at all (interpret mode: the kernel maths run
in the Pallas interpreter, while partitioning/SPMD runs exactly as
compiled). Ref consumers: trainers/fastervit.py:371,
trainers/efficientformer_v2.py:327.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from deepfakedetection_tpu.train.steps import (
    TrainState,
    init_model_variables,
    make_train_step,
)


def _dp_matches_single_device(model, img: int, batch: int = 8):
    """One SGD train step: 8-device dp-sharded grads == single-device grads.

    SGD makes the update a pure lr·grad so parameter equality directly
    asserts the cross-shard gradient all-reduce (same rationale as
    tests/test_parallel.py::test_sharded_train_step_matches_single_device).
    """
    import optax

    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, img, img, 3)
    )
    tx = optax.sgd(1e-2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, batch), jnp.int32)
    mask = jnp.ones((batch,), bool)

    def fresh_state():
        return TrainState(
            params=jax.tree.map(jnp.copy, params),
            batch_stats=jax.tree.map(jnp.copy, batch_stats),
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )

    step = make_train_step(model, tx)
    s1, m1 = step(fresh_state(), x, labels, mask, jax.random.key(5))

    mesh = make_mesh()  # all 8 virtual devices on "data"
    s2, m2 = step(
        jax.device_put(fresh_state(), replicated(mesh)),
        shard_batch(mesh, x),
        shard_batch(mesh, labels),
        shard_batch(mesh, mask),
        jax.random.key(5),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_fastervit_dp_grads_match_single_device():
    """FasterViT at 224px (stage-3 14x14 → 4 windows + carrier tokens): the
    full HAT path traced inside a dp-sharded jit gives single-device grads."""
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    _dp_matches_single_device(
        create_faster_vit("0", num_classes=2, dtype=jnp.float32), img=224
    )


@pytest.mark.slow
def test_efficientformer_dp_grads_match_single_device():
    """EfficientFormerV2 (4D attention + downsample attention at 64px) traced
    inside a dp-sharded jit gives single-device grads."""
    from deepfakedetection_tpu.models.efficientformer_v2 import (
        create_efficientformer_v2,
    )

    _dp_matches_single_device(
        create_efficientformer_v2("s1", num_classes=2, dtype=jnp.float32), img=64
    )


def test_window_attn_v2_custom_vjp_partitions_under_sharding():
    """The Pallas window-attention custom_vjp (the default FasterViT TRAIN
    path on TPU, ops/attention.py:41-62) inside a jit whose inputs are
    sharded over the 8 virtual devices: forward AND grads must equal the
    XLA path. Interpret mode runs the kernel per shard while GSPMD
    partitions the pallas_call — proving the composition partitions."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from deepfakedetection_tpu.ops.attention import (
        window_mhsa_qkv_pallas,
        window_mhsa_xla,
    )

    B, N, h, d = 16, 49, 8, 48  # official FasterViT-2 window shape
    C = h * d
    scale = d**-0.5
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(h, N, N)) * 0.1, jnp.float32)

    mesh = make_mesh()  # 8 devices on "data"
    qkv_sharded = jax.device_put(qkv, NamedSharding(mesh, P("data")))
    bias_repl = jax.device_put(bias, NamedSharding(mesh, P()))

    def loss_pallas(qkv_in, bias_in):
        out = window_mhsa_qkv_pallas(
            qkv_in, bias_in, num_heads=h, scale=scale, train=True, interpret=True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(qkv_in, bias_in):
        q = qkv_in[:, :, 0:C].reshape(B, N, h, d)
        k = qkv_in[:, :, C : 2 * C].reshape(B, N, h, d)
        v = qkv_in[:, :, 2 * C : 3 * C].reshape(B, N, h, d)
        out = window_mhsa_xla(q, k, v, bias_in, scale=scale)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # jit over SHARDED inputs: GSPMD must partition (or resolve) the
    # pallas_call inside the custom_vjp, forward and backward
    vg_pallas = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1)))
    l_p, (g_qkv_p, g_bias_p) = vg_pallas(qkv_sharded, bias_repl)
    l_x, (g_qkv_x, g_bias_x) = jax.jit(
        jax.value_and_grad(loss_xla, argnums=(0, 1))
    )(qkv_sharded, bias_repl)

    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-2)
    sq = max(float(jnp.abs(g_qkv_x).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(g_qkv_p, np.float32) / sq,
        np.asarray(g_qkv_x, np.float32) / sq,
        atol=4e-2,
    )
    sb = max(float(jnp.abs(g_bias_x).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(g_bias_p, np.float32) / sb,
        np.asarray(g_bias_x, np.float32) / sb,
        atol=4e-2,
    )


def test_fastervit_official_sharded_eval_matches_single_device():
    """Official-config FasterViT eval forward under batch sharding equals the
    single-device forward (fast tier: 112px single-window geometry keeps the
    compile small; the 224px HAT geometry is covered by the slow test)."""
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    model = create_faster_vit(
        "0", num_classes=2, dtype=jnp.float32, head_config="official"
    )
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, 112, 112, 3)
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 112, 112, 3)), jnp.float32)
    variables = {"params": params, "batch_stats": batch_stats}

    single = np.asarray(model.apply(variables, x, train=False))
    mesh = make_mesh()
    sharded = np.asarray(
        jax.jit(lambda v, xs: model.apply(v, xs, train=False))(
            jax.device_put(variables, replicated(mesh)), shard_batch(mesh, x)
        )
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)
