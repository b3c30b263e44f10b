"""YAML mesh config flows through to a sharded training run (dp×tp on the
8-device CPU mesh)."""

import numpy as np

from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, run_training
from tests.util import tiny_spec


def test_training_on_dp_tp_mesh(tiny_image_tree, tmp_path):
    run_paths = ensure_run_dirs(tmp_path / "runs", run_id="mesh")
    job = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=9,
        mesh_data=4,
        mesh_model=2,
        compute_dtype=np.float32,
    )
    result = run_training(job)
    assert result.epochs_run == 1
    assert (job.run_paths.checkpoints / "latest.ckpt").exists()


def test_orchestrator_mesh_dims_parsed():
    from deepfakedetection_tpu.orchestrator import _mesh_dims

    assert _mesh_dims({}) == (-1, 1)
    assert _mesh_dims({"mesh": {"data": 4, "model": 2}}) == (4, 2)
    assert _mesh_dims({"mesh": None}) == (-1, 1)
