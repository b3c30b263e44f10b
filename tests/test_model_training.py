"""All three model families take a real optimizer step (grad flow, BN stats,
freeze masks) at small resolutions on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepfakedetection_tpu.train.optim import (
    head_predicate,
    make_phase_optimizer,
    trainable_labels,
    unfreeze_predicate,
)
from deepfakedetection_tpu.train.steps import (
    TrainState,
    init_model_variables,
    make_train_step,
)


def _one_step(model, size, key=0):
    params, batch_stats = init_model_variables(
        model, jax.random.key(key), (1, size, size, 3)
    )
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-3, weight_decay=1e-2, trainable=lambda _: True
    )
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    # the step donates its state — snapshot to host first for comparisons
    params_before = jax.device_get(params)
    stats_before = jax.device_get(batch_stats)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, size, size, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    mask = jnp.ones((8,), bool)
    new_state, metrics = step(state, x, labels, mask, jax.random.key(1))
    return params_before, stats_before, new_state, metrics


@pytest.mark.slow
def test_efficientnet_trains():
    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    model = create_efficientnet("b0", num_classes=2, dtype=jnp.float32)
    params, stats, new_state, metrics = _one_step(model, 64)
    assert np.isfinite(float(metrics["loss"]))
    # params updated and batch stats moved
    assert not np.allclose(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(new_state.params)[0]),
    )
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(new_state.batch_stats))
    )
    assert moved


@pytest.mark.slow
def test_fastervit_trains_with_carrier_tokens():
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    model = create_faster_vit("0", num_classes=2, dtype=jnp.float32)
    # 224 → stage 3 at 14x14 exercises the real HAT/carrier-token path
    _, _, new_state, metrics = _one_step(model, 224)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_efficientformer_trains():
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    model = create_efficientformer_v2("s0", num_classes=2, dtype=jnp.float32)
    _, _, new_state, metrics = _one_step(model, 224)
    assert np.isfinite(float(metrics["loss"]))


def test_freeze_masks_select_expected_params():
    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    model = create_efficientnet("b0", num_classes=2, dtype=jnp.float32)
    params, _ = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    # head-only warmup: only the classifier dense trains
    _, n_head, n_total = trainable_labels(
        params, head_predicate(("classifier", "_fc", "fc"))
    )
    assert n_head == 2 and n_total > 100
    # efficientformer-style partial unfreeze predicate
    pred = unfreeze_predicate(("stage6", "head_conv", "classifier"))
    labels, n_train, _ = trainable_labels(params, pred)
    assert 2 < n_train < n_total


def test_frozen_params_receive_zero_updates():
    from tests.util import TinyCNN

    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 16, 16, 3))
    tx, n_train, n_total = make_phase_optimizer(
        params, lr=1e-2, weight_decay=0.0, trainable=head_predicate(("head",))
    )
    assert n_train == 2
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    params_before = jax.device_get(params)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    new_state, _ = step(
        state, x, jnp.zeros((8,), jnp.int32), jnp.ones((8,), bool), jax.random.key(1)
    )
    # conv params frozen, head moved
    np.testing.assert_array_equal(
        np.asarray(params_before["conv1"]["kernel"]),
        np.asarray(new_state.params["conv1"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(params_before["head"]["kernel"]),
        np.asarray(new_state.params["head"]["kernel"]),
    )


def test_unfreeze_predicate_string_policy_is_one_substring():
    from deepfakedetection_tpu.train.optim import unfreeze_predicate

    pred = unfreeze_predicate("head")  # must NOT iterate characters
    assert pred("stages_3_block0/head/kernel")
    assert not pred("stem/kernel")  # 'e' in 'stem' would match char-wise
    assert unfreeze_predicate("all")("anything")
