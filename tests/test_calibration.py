"""Probability calibration: ECE, temperature scaling, eval-job plumbing.

TPU serving extension (the reference reports no calibration metrics):
``inference.calibration: temperature`` fits T on the val pass and reports
calibrated test probabilities + ECE in metrics.jsonl (evaluate/metrics.py,
evaluate/job.py).
"""

import numpy as np
import pytest

from deepfakedetection_tpu.evaluate.metrics import (
    apply_temperature,
    expected_calibration_error,
    fit_temperature,
)


def _softmax(z):
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def test_ece_hand_computed():
    # two bins worth of rows with known confidence/accuracy gaps
    probs = np.array([[0.9, 0.1], [0.9, 0.1], [0.6, 0.4], [0.6, 0.4]])
    targets = np.array([0, 1, 0, 0])  # conf .9 bin: acc 1/2; conf .6 bin: acc 2/2
    # ECE = 0.5*|0.5-0.9| + 0.5*|1.0-0.6| = 0.4
    assert expected_calibration_error(probs, targets, n_bins=10) == pytest.approx(0.4)


def test_ece_perfectly_calibrated_is_small():
    rng = np.random.default_rng(0)
    n = 20_000
    p = rng.uniform(0.5, 1.0, n)
    targets = (rng.uniform(size=n) < p).astype(np.int64)  # correct w.p. p
    probs = np.stack([p, 1.0 - p], axis=1)  # predicts class 0 at confidence p
    assert expected_calibration_error(probs, (1 - targets)) < 0.02


def test_ece_empty_and_degenerate():
    assert expected_calibration_error(np.zeros((0, 2)), np.zeros((0,))) == 0.0
    one = np.array([[1.0, 0.0]])
    assert expected_calibration_error(one, np.array([0])) == pytest.approx(0.0)
    assert expected_calibration_error(one, np.array([1])) == pytest.approx(1.0)


def test_fit_temperature_recovers_known_miscalibration():
    rng = np.random.default_rng(1)
    n = 5000
    logits = rng.normal(0.0, 2.0, (n, 2))
    # labels drawn from the TRUE distribution softmax(logits)
    p_true = _softmax(logits)
    targets = (rng.uniform(size=n) < p_true[:, 1]).astype(np.int64)
    for t_applied in (2.5, 0.5):
        # the model reports overconfident/underconfident probs: logits*t
        probs = _softmax(logits * t_applied)
        t_fit = fit_temperature(probs, targets)
        # dividing by T≈t_applied recovers the true calibrated distribution
        assert t_fit == pytest.approx(t_applied, rel=0.1)
        cal = apply_temperature(probs, t_fit)
        np.testing.assert_allclose(cal, p_true, atol=0.05)
        # and measured ECE improves
        assert expected_calibration_error(cal, targets) <= (
            expected_calibration_error(probs, targets) + 1e-9
        )


def test_apply_temperature_identity_and_monotone():
    rng = np.random.default_rng(2)
    probs = _softmax(rng.normal(0, 3, (64, 2)))
    np.testing.assert_allclose(apply_temperature(probs, 1.0), probs, atol=1e-12)
    cal = apply_temperature(probs, 3.0)
    np.testing.assert_allclose(cal.sum(axis=-1), 1.0, atol=1e-12)
    # monotone in p1: binary ranking (hence ROC-AUC) is preserved
    order = np.argsort(probs[:, 1])
    assert (np.diff(cal[order, 1]) >= -1e-12).all()
    # temperature > 1 always softens toward uniform
    assert (np.abs(cal[:, 1] - 0.5) <= np.abs(probs[:, 1] - 0.5) + 1e-12).all()


def test_fit_temperature_empty_is_identity():
    assert fit_temperature(np.zeros((0, 2)), np.zeros((0,), np.int64)) == 1.0


def test_config_calibration_validation_and_plumbing(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config
    from deepfakedetection_tpu.orchestrator import build_eval_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    cfg = {
        "data": {"root": str(tmp_path), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"inference": {"calibration": "platt"}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="calibration"):
        load_config(p)

    cfg["models"]["efficientnet_b3"]["inference"]["calibration"] = "temperature"
    p.write_text(yaml.safe_dump(cfg))
    config = load_config(p)
    run_paths = ensure_run_dirs(tmp_path / "runs/x", run_id="t")
    model_cfg = dict(config["models"]["efficientnet_b3"], name="efficientnet_b3")
    job = build_eval_job(config, "efficientnet_b3", model_cfg, run_paths)
    assert job.calibration == "temperature"
    # default stays off (reference behavior)
    del cfg["models"]["efficientnet_b3"]["inference"]["calibration"]
    p.write_text(yaml.safe_dump(cfg))
    job = build_eval_job(
        load_config(p), "efficientnet_b3", model_cfg, run_paths
    )


def test_eval_job_calibrated_metrics(tiny_image_tree, tmp_path):
    """E2E: the eval job fits T on val, tags metrics, keeps decisions sane."""
    import numpy as np

    from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from tests.util import tiny_spec

    run_paths = ensure_run_dirs(tmp_path / "runs/tiny", run_id="cal")
    job = EvalJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=tiny_image_tree,
        split="test",
        num_classes=2,
        img_size=32,
        batch_size=8,
        num_workers=0,
        weights=None,
        compute_dtype=np.float32,
        calibration="temperature",
    )
    result = run_eval_job(job)
    assert result is not None
    m = result.metrics
    assert m["temperature"] > 0.0
    assert 0.0 <= m["ece"] <= 1.0 and 0.0 <= m["ece_uncalibrated"] <= 1.0
    # returned probabilities are the calibrated rows
    np.testing.assert_allclose(result.probs.sum(axis=1), 1.0, atol=1e-6)
    assert 0.0 <= m["threshold"] <= 1.0
