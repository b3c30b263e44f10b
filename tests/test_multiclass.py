"""Multiclass (Imagenette-style) paths: argmax preds, OVR ROC-AUC, no
threshold sweep — the branch the binary tests never touch
(reference: orchestrator.py:605-630)."""

import numpy as np
import pytest
from PIL import Image

from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, run_training
from tests.util import tiny_spec


@pytest.fixture(scope="module")
def ten_class_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenette_like")
    rng = np.random.default_rng(1)
    classes = [f"n{i:02d}" for i in range(10)]
    for split, n in (("train", 3), ("val", 2), ("test", 2)):
        for cls in classes:
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return root


def test_ten_class_train_and_eval(ten_class_tree, tmp_path):
    run_paths = ensure_run_dirs(tmp_path / "runs", run_id="mc")
    tjob = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=ten_class_tree,
        num_classes=10,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=5,
        compute_dtype=np.float32,
    )
    result = run_training(tjob)
    assert result.epochs_run == 1

    ejob = EvalJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=ten_class_tree,
        split="test",
        num_classes=10,
        img_size=32,
        batch_size=8,
        num_workers=0,
        weights=run_paths.checkpoints / "tiny_cnn.pth"
        if (run_paths.checkpoints / "tiny_cnn.pth").exists()
        else None,
        compute_dtype=np.float32,
    )
    eres = run_eval_job(ejob)
    assert eres is not None
    m = eres.metrics
    # multiclass: no threshold key, argmax predictions, 10x10 confusion
    assert "threshold" not in m
    cm = np.asarray(m["confusion_matrix"])
    assert cm.shape == (10, 10) and cm.sum() == 20
    assert eres.probs.shape == (20, 10)


def test_class_count_mismatch_fails_fast(ten_class_tree, tmp_path):
    run_paths = ensure_run_dirs(tmp_path / "runs", run_id="bad")
    job = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=ten_class_tree,
        num_classes=2,  # wrong on purpose
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        compute_dtype=np.float32,
    )
    with pytest.raises(SystemExit):
        run_training(job)
