"""End-to-end: two-phase training, checkpointing, resume, eval job.

Runs the full L1-L5 slice on the synthetic dataset with a tiny model over
the 8-device virtual CPU mesh (data parallelism exercised for real).
"""

import json

import numpy as np
import pytest

from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, run_training
from tests.util import tiny_spec


@pytest.fixture(scope="module")
def trained_run(tiny_image_tree, tmp_path_factory):
    out = tmp_path_factory.mktemp("runs")
    run_paths = ensure_run_dirs(out / "tiny_cnn", run_id="t0")
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
        seed=7,
        resume_auto=True,
        compute_dtype=np.float32,
    )
    result = run_training(job)
    return job, result


def test_training_completes_and_checkpoints(trained_run):
    job, result = trained_run
    assert result.epochs_run == 2
    assert 0.0 <= result.best_val_acc <= 1.0
    assert (job.run_paths.checkpoints / "latest.ckpt").exists()
    # best checkpoint + bare weights exported on improvement
    if result.best_epoch >= 0:
        assert (job.run_paths.checkpoints / "best.ckpt").exists()
        assert (job.run_paths.checkpoints / "tiny_cnn.pth").exists()


def test_resume_from_latest(trained_run, tiny_image_tree):
    job, _ = trained_run
    job2 = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=job.run_paths,
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=3,  # one more epoch than already trained
        num_workers=0,
        seed=7,
        resume_auto=True,
        compute_dtype=np.float32,
    )
    result = run_training(job2)
    assert result.epochs_run == 1  # resumed at epoch 2, ran only epoch 3


def test_eval_job_outputs(trained_run, tiny_image_tree):
    job, _ = trained_run
    weights = job.run_paths.checkpoints / "tiny_cnn.pth"
    ejob = EvalJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=job.run_paths,
        data_root=tiny_image_tree,
        split="test",
        num_classes=2,
        img_size=32,
        batch_size=8,
        num_workers=0,
        weights=weights if weights.exists() else None,
        compute_dtype=np.float32,
    )
    result = run_eval_job(ejob)
    assert result is not None
    m = result.metrics
    assert set(["model", "split", "accuracy", "timestamp", "threshold", "confusion_matrix"]).issubset(m)
    assert 0.0 <= m["threshold"] <= 1.0
    assert result.probs.shape[0] == 12  # all test images, padding dropped
    np.testing.assert_allclose(result.probs.sum(axis=1), 1.0, atol=1e-4)
    # output surface files
    assert (job.run_paths.logs / "metrics.jsonl").exists()
    assert (job.run_paths.logs / "inference.log").exists()
    rec = json.loads((job.run_paths.logs / "metrics.jsonl").read_text().splitlines()[-1])
    assert rec["model"] == "tiny_cnn" and rec["split"] == "test"
    assert (job.run_paths.plots / "confusion_matrix.png").exists()


def test_async_checkpoint_roundtrip(tiny_image_tree, tmp_path_factory):
    """training.async_checkpoint writes the same checkpoint surface, and the
    run is resumable from its (background-written) latest.ckpt."""
    out = tmp_path_factory.mktemp("runs_async")
    run_paths = ensure_run_dirs(out / "tiny_cnn", run_id="a0")
    kwargs = dict(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        num_workers=0,
        seed=7,
        resume_auto=True,
        compute_dtype=np.float32,
        async_checkpoint=True,
    )
    result = run_training(TrainJob(epochs=2, **kwargs))
    assert result.epochs_run == 2
    assert (run_paths.checkpoints / "latest.ckpt").exists()
    if result.best_epoch >= 0:
        assert (run_paths.checkpoints / "best.ckpt").exists()
        assert (run_paths.checkpoints / "tiny_cnn.pth").exists()
    resumed = run_training(TrainJob(epochs=3, **kwargs))
    assert resumed.epochs_run == 1  # counters restored from the async write


def test_async_saver_snapshot_and_failure(tmp_path):
    """AsyncSaver: saved tree equals the submitted values even if the live
    arrays change afterwards (donation hazard), and write failures surface
    at wait()."""
    import jax.numpy as jnp
    import pytest

    from deepfakedetection_tpu.runtime import checkpoint as ckpt

    saver = ckpt.AsyncSaver()
    tree = {"w": jnp.arange(4, dtype=jnp.float32)}
    saver.submit_tree(tmp_path / "t.ckpt", tree)
    tree["w"] = tree["w"] + 100.0  # mutate the live reference post-submit
    saver.wait()
    restored = ckpt.restore_tree(
        tmp_path / "t.ckpt", {"w": np.zeros(4, np.float32)}
    )
    np.testing.assert_array_equal(np.asarray(restored["w"]), [0, 1, 2, 3])

    blocked = tmp_path / "not_a_dir"
    blocked.write_text("file, not dir")
    saver.submit_tree(blocked / "x.ckpt", tree)
    with pytest.raises(Exception):
        saver.wait()
