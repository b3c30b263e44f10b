"""Softmax-averaged ensemble over the selection's eval results
(evaluate/ensemble.py; opt-in top-level ``ensemble:`` key — the reference
evaluates each model independently and never combines,
reference: orchestrator.py:661-697)."""

import json

import numpy as np
import pytest
import yaml

import deepfakedetection_tpu.orchestrator as orch
from deepfakedetection_tpu.evaluate.ensemble import combine_probs, run_ensemble
from deepfakedetection_tpu.evaluate.job import EvalResult
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs


def _result(p1, targets, *, split="test", val_p1=None, val_targets=None):
    """Binary EvalResult with class-1 probabilities ``p1``."""
    p1 = np.asarray(p1, np.float64)
    probs = np.stack([1.0 - p1, p1], axis=1)
    vp = None
    if val_p1 is not None:
        vp = np.stack([1.0 - np.asarray(val_p1, np.float64), np.asarray(val_p1)], axis=1)
    return EvalResult(
        metrics={"model": "m", "split": split, "accuracy": 0.0},
        probs=probs,
        targets=np.asarray(targets, np.int64),
        preds=(p1 >= 0.5).astype(np.int64),
        classes=["fake", "real"],
        val_probs=vp,
        val_targets=None if val_targets is None else np.asarray(val_targets, np.int64),
    )


def test_combine_probs_weighted_mean():
    t = [0, 1]
    results = {
        "a": _result([0.2, 0.8], t),
        "b": _result([0.4, 0.6], t),
    }
    mean = combine_probs(results, None, "probs")
    np.testing.assert_allclose(mean[:, 1], [0.3, 0.7])
    weighted = combine_probs(results, {"a": 3.0, "b": 1.0}, "probs")
    np.testing.assert_allclose(weighted[:, 1], [0.25, 0.75])
    # missing member array → None
    results["b"].probs = None
    assert combine_probs(results, None, "probs") is None


def test_run_ensemble_metrics_threshold_and_artifacts(tmp_path):
    targets = [0, 0, 0, 1, 1, 1]
    vt = [0, 0, 1, 1]
    # each member is individually miscalibrated high; the mean still ranks
    # correctly and the re-swept threshold adapts to the averaged scale
    results = {
        "a": _result([0.55, 0.60, 0.62, 0.80, 0.90, 0.95], targets,
                     val_p1=[0.58, 0.61, 0.82, 0.91], val_targets=vt),
        "b": _result([0.50, 0.52, 0.58, 0.75, 0.85, 0.97], targets,
                     val_p1=[0.51, 0.59, 0.78, 0.88], val_targets=vt),
    }
    paths = ensure_run_dirs(tmp_path / "ensemble")
    metrics = run_ensemble(results, paths, num_classes=2)
    assert metrics is not None
    assert metrics["model"] == "ensemble"
    assert sorted(metrics["members"]) == ["a", "b"]
    # swept on the ensemble val distribution: separates 0.60 from 0.80
    assert 0.60 < metrics["threshold"] <= 0.80
    assert metrics["accuracy"] == 1.0
    assert metrics["roc_auc"] == 1.0
    assert (paths.plots / "confusion_matrix.png").exists()
    assert (paths.plots / "roc_curve.png").exists()
    rec = json.loads((paths.logs / "metrics.jsonl").read_text().splitlines()[-1])
    assert rec["model"] == "ensemble" and rec["threshold"] == metrics["threshold"]


def test_run_ensemble_falls_back_to_half_threshold_without_val(tmp_path):
    targets = [0, 1, 0, 1]
    results = {
        "a": _result([0.1, 0.9, 0.2, 0.8], targets),
        "b": _result([0.3, 0.7, 0.4, 0.6], targets),
    }
    metrics = run_ensemble(results, ensure_run_dirs(tmp_path / "e"), num_classes=2)
    assert metrics["threshold"] == 0.5


def test_run_ensemble_refuses_misaligned_members(tmp_path):
    paths = ensure_run_dirs(tmp_path / "e")
    # fewer than two members
    one = {"a": _result([0.1, 0.9], [0, 1])}
    assert run_ensemble(one, paths, num_classes=2) is None
    # different splits
    two = {
        "a": _result([0.1, 0.9], [0, 1], split="test"),
        "b": _result([0.1, 0.9], [0, 1], split="val"),
    }
    assert run_ensemble(two, paths, num_classes=2) is None
    # mismatched target rows
    three = {
        "a": _result([0.1, 0.9], [0, 1]),
        "b": _result([0.1, 0.9], [1, 0]),
    }
    assert run_ensemble(three, paths, num_classes=2) is None
    # a member that returned None (empty split) is dropped → below 2
    four = {"a": _result([0.1, 0.9], [0, 1]), "b": None}
    assert run_ensemble(four, paths, num_classes=2) is None


def test_config_validates_ensemble_key(tmp_path):
    from deepfakedetection_tpu.config import load_config

    base = {
        "data": {"root": "d"},
        "models": {"efficientnet_b3": {}},
    }

    def _load(extra):
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump({**base, **extra}))
        return load_config(p)

    assert _load({"ensemble": True})["ensemble"] is True
    cfg = _load({"ensemble": {"weights": {"efficientnet_b3": 2.0}}})
    assert cfg["ensemble"]["weights"] == {"efficientnet_b3": 2.0}
    with pytest.raises(Exception, match="unknown models"):
        _load({"ensemble": {"weights": {"ghost": 1.0}}})
    with pytest.raises(Exception, match="> 0"):
        _load({"ensemble": {"weights": {"efficientnet_b3": 0.0}}})


def test_predict_cli_reports_ensemble(tmp_path, monkeypatch, capsys):
    """predict.py adds a softmax-averaged 'ensemble' entry when the config
    enables it and ≥2 models are loaded."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import predict
    import web_ui
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step
    from tests.util import TinyCNN

    bundles = []
    for i, name in enumerate(("m_a", "m_b")):
        model = TinyCNN(num_classes=2, dtype=jnp.float32)
        params, batch_stats = init_model_variables(
            model, jax.random.key(i), (1, 32, 32, 3)
        )
        bundles.append(
            web_ui.ModelBundle(
                name=name, display_label=name, model=model, params=params,
                batch_stats=batch_stats, eval_step=make_eval_step(model),
                plan=build_eval_plan(32),
            )
        )
    monkeypatch.setattr(web_ui, "initialize_from_config", lambda p: None)
    monkeypatch.setattr(web_ui, "MODEL_CACHE", bundles)

    img = tmp_path / "x.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(img)
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "data": {"root": str(tmp_path)},
        "models": {"efficientnet_b3": {}},  # not built: initialize is stubbed
        "ensemble": {"weights": {"efficientnet_b3": 2.0}},
    }))
    monkeypatch.setattr(
        "sys.argv",
        ["predict.py", "--config", str(cfg_path), "--input", str(img), "--json"],
    )
    predict.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    preds = rec["predictions"]
    assert set(preds) == {"m_a", "m_b", "ensemble"}
    expected = (
        np.asarray(preds["m_a"]["probs"]) + np.asarray(preds["m_b"]["probs"])
    ) / 2.0
    np.testing.assert_allclose(preds["ensemble"]["probs"], expected, atol=2e-6)


def test_orchestrate_runs_ensemble_after_inference(
    tiny_image_tree, tmp_path, monkeypatch
):
    """orchestrate(mode=inference) with ensemble: true combines the
    selection's results into runs/ensemble/<ts>/ with its own snapshot."""
    from tests.util import tiny_spec

    monkeypatch.setattr(orch, "get_model_spec", lambda name: tiny_spec())
    targets = [0, 0, 1, 1]

    def fake_eval(job):
        p1 = {"m_a": [0.2, 0.4, 0.6, 0.8], "m_b": [0.1, 0.3, 0.7, 0.9]}[job.model_name]
        return _result(p1, targets, val_p1=p1, val_targets=targets)

    monkeypatch.setattr(orch, "run_eval_job", fake_eval)
    out = tmp_path / "runs"
    cfg = {
        "seed": 1,
        "device": "cpu",
        "data": {"root": str(tiny_image_tree), "num_classes": 2, "img_size": 32},
        "models": {
            "m_a": {"output_dir": str(out / "m_a"), "inference": {"batch_size": 4}},
            "m_b": {"output_dir": str(out / "m_b"), "inference": {"batch_size": 4}},
        },
        "ensemble": {"output_dir": str(out / "ensemble"), "weights": {"m_a": 1.0, "m_b": 1.0}},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    orch.orchestrate(cfg_path, mode="inference")

    runs = sorted((out / "ensemble").iterdir())
    assert len(runs) == 1
    rec = json.loads((runs[0] / "logs" / "metrics.jsonl").read_text().splitlines()[-1])
    assert rec["model"] == "ensemble"
    assert sorted(rec["members"]) == ["m_a", "m_b"]
    assert rec["accuracy"] == 1.0
    snap = yaml.safe_load((runs[0] / "config_snapshot.yaml").read_text())
    assert snap["model"]["name"] == "ensemble"
    # training mode must NOT trigger the ensemble block
    monkeypatch.setattr(
        orch, "run_training",
        lambda job: __import__("types").SimpleNamespace(
            best_val_acc=1.0, best_epoch=0, interrupted=False
        ),
    )
    orch.orchestrate(cfg_path, mode="training")
    assert len(sorted((out / "ensemble").iterdir())) == 1


def test_orchestrate_single_model_ensemble_makes_no_run_dir(
    tiny_image_tree, tmp_path, monkeypatch
):
    """ensemble: true with <2 evaluated models must not leave an empty
    runs/ensemble/<ts>/ dir behind."""
    from tests.util import tiny_spec

    monkeypatch.setattr(orch, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.setattr(
        orch, "run_eval_job",
        lambda job: _result([0.2, 0.8], [0, 1]),
    )
    out = tmp_path / "runs"
    cfg = {
        "seed": 1,
        "device": "cpu",
        "data": {"root": str(tiny_image_tree), "num_classes": 2, "img_size": 32},
        "models": {"m_a": {"output_dir": str(out / "m_a")}},
        "ensemble": {"output_dir": str(out / "ensemble")},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    orch.orchestrate(cfg_path, mode="inference")
    assert not (out / "ensemble").exists()


def test_serve_ensemble_threshold_auto_reads_sweep(tmp_path, monkeypatch):
    """serve: ensemble.threshold: auto picks up the latest ensemble eval
    sweep's decision threshold from runs/ensemble/*/logs/metrics.jsonl."""
    import serve
    from tests.util import tiny_spec

    ens_out = tmp_path / "runs" / "ensemble"
    logs = ens_out / "20240101-000000" / "logs"
    logs.mkdir(parents=True)
    (logs / "metrics.jsonl").write_text(
        json.dumps({"model": "ensemble", "threshold": 0.73,
                    "timestamp": "2024-01-01T00:00:00"}) + "\n"
    )
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {"output_dir": str(tmp_path / "runs/a")},
            "efficientformerv2_s1": {"output_dir": str(tmp_path / "runs/b")},
        },
        "ensemble": {"threshold": "auto", "output_dir": str(ens_out)},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0)
    try:
        assert state.ensemble_threshold == 0.73
    finally:
        state.close()
