"""Mixup/CutMix: mixing math, loss composition, loop integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.train.mixup import MixupSpec, mix_batch


def _batch(b=4, h=8, w=8):
    return jax.random.uniform(jax.random.key(0), (b, h, w, 3), jnp.float32)


def test_mixup_blends_with_rolled_partner():
    x = _batch()
    spec = MixupSpec(mixup_alpha=0.4)
    mixed, lam = mix_batch(jax.random.key(1), x, spec)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    expected = lam * np.asarray(x) + (1 - lam) * np.asarray(jnp.roll(x, 1, axis=0))
    np.testing.assert_allclose(np.asarray(mixed), expected, rtol=1e-5, atol=1e-6)


def test_cutmix_pastes_box_and_corrects_lam():
    x = _batch(b=3, h=16, w=16)
    spec = MixupSpec(cutmix_alpha=1.0)
    mixed, lam = mix_batch(jax.random.key(2), x, spec)
    m = np.asarray(mixed)
    a = np.asarray(x)
    b = np.asarray(jnp.roll(x, 1, axis=0))
    # every pixel comes from exactly one of the two sources
    from_a = np.isclose(m, a, atol=1e-6).all(axis=-1)
    from_b = np.isclose(m, b, atol=1e-6).all(axis=-1)
    assert (from_a | from_b).all()
    # lam equals the exact kept fraction (same box for every row)
    kept = from_a[0].mean()
    assert float(lam) == pytest.approx(kept, abs=1 / 16)


def test_both_modes_picks_one():
    x = _batch()
    spec = MixupSpec(mixup_alpha=0.4, cutmix_alpha=1.0)
    mixed, lam = mix_batch(jax.random.key(3), x, spec)
    assert mixed.shape == x.shape and 0.0 <= float(lam) <= 1.0


def test_train_step_with_mixup_runs_and_matches_loss_composition():
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step_fn,
    )
    from tests.util import tiny_spec

    model = tiny_spec().builder(2)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 16, 16, 3))
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-3, weight_decay=0.0, trainable=lambda _: True
    )
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    spec = MixupSpec(mixup_alpha=0.2)
    step = make_train_step_fn(model, tx, mixup=spec)
    x = _batch(b=6, h=16, w=16)
    labels = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.int32)
    mask = jnp.ones((6,), bool)
    new_state, metrics = step(state, x, labels, mask, jax.random.key(9))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))
    )
    assert moved


def test_training_loop_with_mixup(tiny_image_tree, tmp_path):
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from deepfakedetection_tpu.train.loop import TrainJob, run_training
    from tests.util import tiny_spec

    job = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=ensure_run_dirs(tmp_path / "tiny", run_id="mx"),
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=5,
        compute_dtype=np.float32,
        mixup_alpha=0.4,
        cutmix_alpha=1.0,
    )
    result = run_training(job)
    assert result.epochs_run == 1
    assert np.isfinite(result.final_train_loss)
    log = (job.run_paths.logs / "train.log").read_text()
    assert "mixup: alpha=0.4 cutmix=1.0" in log


def test_config_mix_alpha_validation(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config

    cfg = {
        "data": {"root": "d", "num_classes": 2},
        "models": {"efficientnet_b3": {"training": {"mixup_alpha": -0.1}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="alpha"):
        load_config(p)
