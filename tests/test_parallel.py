"""Mesh construction, batch sharding, tensor-parallel partition rules."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from deepfakedetection_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


def test_make_mesh_shapes():
    m = make_mesh()  # all 8 virtual devices on data
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = make_mesh(data=4, model=2)
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2


def test_batch_sharding_distributes_rows():
    mesh = make_mesh()
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data")
    # 16 rows over 8 devices → 2 rows per shard
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 4)}
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_param_shardings_tp_rules():
    mesh = make_mesh(data=4, model=2)
    params = {
        "dense": {"kernel": jnp.zeros((64, 128)), "bias": jnp.zeros((128,))},
        "odd": {"kernel": jnp.zeros((8, 33))},  # 33 not divisible by 2
        "bn": {"scale": jnp.zeros((128,))},
    }
    shardings = param_shardings(mesh, params)
    assert shardings["dense"]["kernel"].spec == P(None, "model")
    assert shardings["dense"]["bias"].spec == P()
    assert shardings["odd"]["kernel"].spec == P()  # indivisible → replicated
    assert shardings["bn"]["scale"].spec == P()


def test_tensor_parallel_train_step_runs():
    """dp×tp mesh (4×2): TP-sharded kernels + batch sharding execute a step."""
    from tests.util import TinyCNN
    from deepfakedetection_tpu.parallel.mesh import replicated
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step,
    )

    mesh = make_mesh(data=4, model=2)
    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 16, 16, 3))
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-3, weight_decay=0.0, trainable=lambda _: True
    )
    p_shard = param_shardings(mesh, params)
    params = jax.tree.map(jax.device_put, params, p_shard)
    # TinyCNN head kernel [16, 2]: 2 not divisible by model axis → replicated;
    # conv2 kernel [3,3,8,16]: 16 % 2 == 0 → sharded over "model"
    assert p_shard["conv2"]["kernel"].spec == P(None, None, None, "model")
    state = TrainState(
        params=params,
        batch_stats=jax.device_put(batch_stats, replicated(mesh)),
        opt_state=jax.device_put(tx.init(params), replicated(mesh)),
        step=jax.device_put(jnp.asarray(0, jnp.int32), replicated(mesh)),
    )
    x = jax.device_put(jnp.ones((8, 16, 16, 3)), batch_sharding(mesh))
    labels = jax.device_put(jnp.zeros((8,), jnp.int32), batch_sharding(mesh))
    mask = jax.device_put(jnp.ones((8,), bool), batch_sharding(mesh))
    step = make_train_step(model, tx)
    new_state, metrics = step(state, x, labels, mask, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_train_step_matches_single_device():
    """Data-parallel grads == single-device grads on the same global batch."""
    from tests.util import TinyCNN
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step,
    )

    import optax

    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 16, 16, 3))
    # SGD: update == lr*grad, so this directly asserts cross-shard gradient
    # reductions match single-device math (Adam at step 0 amplifies bit-level
    # reduction-order differences; loss equality below covers the forward)
    tx = optax.sgd(1e-2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 16), jnp.int32)
    mask = jnp.ones((16,), bool)

    def fresh_state():
        return TrainState(
            params=jax.tree.map(jnp.copy, params),
            batch_stats=jax.tree.map(jnp.copy, batch_stats),
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )

    step = make_train_step(model, tx)
    # single device
    s1, m1 = step(fresh_state(), x, labels, mask, jax.random.key(5))
    # sharded over the 8-device mesh
    mesh = make_mesh()
    xs = shard_batch(mesh, x)
    ls = shard_batch(mesh, labels)
    ms = shard_batch(mesh, mask)
    from deepfakedetection_tpu.parallel.mesh import replicated

    s2, m2 = step(
        jax.device_put(fresh_state(), replicated(mesh)), xs, ls, ms, jax.random.key(5)
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
