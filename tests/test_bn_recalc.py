"""Precise-BN recalibration: pooled fresh stats replace stale running stats."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.train.steps import init_model_variables, recalibrate_bn
from tests.util import TinyCNN


def test_recalibration_recovers_true_statistics():
    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, stale_stats = init_model_variables(model, jax.random.key(0), (1, 16, 16, 3))
    # stale stats: init values (mean 0, var 1) — deliberately wrong for the
    # input distribution below (mean 5, std 3)
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.normal(5.0, 3.0, size=(32, 16, 16, 3)), jnp.float32)
        for _ in range(8)
    ]
    fresh = recalibrate_bn(model, params, stale_stats, iter(batches), jax.random.key(1))

    # conv1 output statistics under this input are far from (0,1); the
    # recalibrated stats must match a direct big-batch estimate
    big = jnp.concatenate(batches, axis=0)
    _, direct = model.apply(
        {"params": params, "batch_stats": stale_stats}, big, train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2), "droppath": jax.random.key(3)},
    )
    # momentum 0.99: direct stats moved only 1% — instead compute the true
    # batch stats via the same momentum-0 path recalibrate_bn uses, on the
    # concatenated batch
    true_stats = recalibrate_bn(model, params, stale_stats, iter([big]), jax.random.key(1))

    got_mean = np.asarray(fresh["bn1"]["mean"])
    want_mean = np.asarray(true_stats["bn1"]["mean"])
    np.testing.assert_allclose(got_mean, want_mean, rtol=0.05, atol=0.05)
    got_var = np.asarray(fresh["bn1"]["var"])
    want_var = np.asarray(true_stats["bn1"]["var"])
    np.testing.assert_allclose(got_var, want_var, rtol=0.1, atol=0.1)
    # and they are far from the stale init values
    assert np.abs(got_mean).max() > 0.5 or np.abs(got_var - 1.0).max() > 0.5


def test_recalibration_improves_eval_after_short_training(tiny_image_tree, tmp_path):
    """E2E: with bn_recalc, a short fine-tune reaches real val accuracy."""
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from deepfakedetection_tpu.train.loop import TrainJob, run_training
    from tests.util import tiny_spec

    run_paths = ensure_run_dirs(tmp_path / "runs", run_id="bnrc")
    job = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=2,
        num_workers=0,
        seed=11,
        compute_dtype=np.float32,
        bn_recalc_batches=2,
    )
    result = run_training(job)
    assert result.epochs_run == 2  # pipeline runs through recalibration
