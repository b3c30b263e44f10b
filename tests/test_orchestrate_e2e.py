"""YAML-to-finish integration through orchestrate() itself (VERDICT r2 #7).

The other E2E tests drive run_training/run_eval_job directly; this one
exercises the glue in orchestrate() — config load+validation, selection
iteration, output_dir resolution, fresh timestamped run dirs,
snapshot-then-dispatch, unknown-model skip, and mode errors — against the
reference call stack (reference: orchestrator.py:661-697).
"""

import yaml
import pytest

import deepfakedetection_tpu.orchestrator as orch
from tests.util import tiny_spec


@pytest.fixture()
def tiny_registry(monkeypatch):
    """Route the registry lookup to the fast test CNN so the full stack runs
    in seconds on the virtual CPU devices."""
    monkeypatch.setattr(orch, "get_model_spec", lambda name: tiny_spec())


def _write_cfg(path, data_root, out_dir, weights=None):
    cfg = {
        "seed": 7,
        "device": "cpu",
        "data": {
            "root": str(data_root),
            "train_split": "train",
            "val_split": "val",
            "test_split": "test",
            "num_classes": 2,
            "img_size": 32,
        },
        "models": {
            "tiny_cnn": {
                "output_dir": str(out_dir),
                "training": {
                    "epochs": 1,
                    "batch_size": 8,
                    "num_workers": 0,
                    "warmup_epochs": 0,
                    # TPU training extensions travel through orchestrate too
                    "ema_decay": 0.9,
                    "grad_clip_norm": 1.0,
                    "mixup_alpha": 0.2,
                },
                "inference": {
                    "split": "test",
                    "batch_size": 8,
                    "num_workers": 0,
                    "tta": "hflip",
                    "lookahead": 2,
                    **({"weights": str(weights)} if weights else {}),
                },
            }
        },
        "selection": ["tiny_cnn"],
    }
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.mark.slow
def test_orchestrate_yaml_to_finish(tiny_image_tree, tmp_path, tiny_registry):
    out_dir = tmp_path / "runs" / "tiny_cnn"
    cfg = _write_cfg(tmp_path / "train.yaml", tiny_image_tree, out_dir)

    orch.orchestrate(cfg, mode="training")

    run_dirs = sorted(out_dir.iterdir())
    assert len(run_dirs) == 1, "one fresh timestamped run dir per model"
    run = run_dirs[0]
    # reference run-dir layout (orchestrator.py:50-57, 682-685)
    assert (run / "config_snapshot.yaml").exists()
    snap = yaml.safe_load((run / "config_snapshot.yaml").read_text())
    assert "models" not in snap and "selection" not in snap
    assert snap["seed"] == 7 and snap["model"]["name"] == "tiny_cnn"
    ckpt = run / "checkpoints"
    assert (ckpt / "latest.ckpt").exists()
    assert (ckpt / "best.ckpt").exists()
    pths = list(ckpt.glob("*.pth"))
    assert pths, "bare best-weights export missing"

    # second orchestrate call → NEW timestamped dir, not a reuse
    cfg2 = _write_cfg(
        tmp_path / "infer.yaml", tiny_image_tree, out_dir, weights=pths[0]
    )
    orch.orchestrate(cfg2, mode="inference")
    run_dirs = sorted(out_dir.iterdir())
    assert len(run_dirs) == 2
    eval_run = run_dirs[-1]
    assert (eval_run / "logs" / "metrics.jsonl").exists()
    assert (eval_run / "logs" / "inference.log").exists()
    assert (eval_run / "plots" / "confusion_matrix.png").exists()
    import json

    records = [
        json.loads(line)
        for line in (eval_run / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    assert records[-1]["model"] == "tiny_cnn"
    assert 0.0 <= records[-1]["accuracy"] <= 1.0
    assert "threshold" in records[-1]


def test_orchestrate_unknown_mode_raises(tiny_image_tree, tmp_path, tiny_registry):
    cfg = _write_cfg(tmp_path / "c.yaml", tiny_image_tree, tmp_path / "runs")
    with pytest.raises(ValueError, match="unknown mode"):
        orch.orchestrate(cfg, mode="serving")


def test_orchestrate_skips_unknown_selection_name(
    tiny_image_tree, tmp_path, tiny_registry, monkeypatch
):
    """Programmatically-built configs may carry unknown selection names; the
    loop warns and skips them (reference: orchestrator.py:678-680)."""
    import types

    calls = []

    def fake_train(job):
        calls.append(job.model_name)
        return types.SimpleNamespace(best_val_acc=1.0, best_epoch=0, interrupted=False)

    monkeypatch.setattr(orch, "run_training", fake_train)
    cfg_path = _write_cfg(tmp_path / "c.yaml", tiny_image_tree, tmp_path / "runs")
    raw = yaml.safe_load(cfg_path.read_text())
    monkeypatch.setattr(
        orch, "load_config", lambda p: {**raw, "selection": ["ghost", "tiny_cnn"]}
    )
    orch.orchestrate(cfg_path, mode="training")
    assert calls == ["tiny_cnn"]


def test_orchestrate_stops_dispatch_after_preemption(
    tiny_image_tree, tmp_path, tiny_registry, monkeypatch
):
    """An interrupted result (SIGTERM mid-run, runtime/preempt.py) must stop
    the selection loop so the process exits within the grace window instead
    of starting the next model's training."""
    import types

    calls = []

    def fake_train(job):
        calls.append(job.model_name)
        return types.SimpleNamespace(best_val_acc=0.5, best_epoch=0, interrupted=True)

    monkeypatch.setattr(orch, "run_training", fake_train)
    cfg_path = _write_cfg(tmp_path / "c.yaml", tiny_image_tree, tmp_path / "runs")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["models"]["tiny_cnn_b"] = raw["models"]["tiny_cnn"]
    monkeypatch.setattr(
        orch,
        "load_config",
        lambda p: {**raw, "selection": ["tiny_cnn", "tiny_cnn_b"]},
    )
    orch.orchestrate(cfg_path, mode="training")
    assert calls == ["tiny_cnn"], "second model must not be dispatched"


def test_resume_continue_reuses_newest_checkpointed_run_dir(tmp_path):
    """training.resume: continue → newest run dir holding a latest.ckpt is
    reused (TPU extension; every reference spelling still makes a fresh
    timestamped dir, so the reference's RESUME_AUTO could never fire from
    the CLI — see orchestrator._resolve_run_paths)."""
    out = tmp_path / "runs"
    for name, with_ckpt in (("20240101-000000", True), ("20240102-000000", True),
                            ("20240103-000000", False)):
        d = out / name / "checkpoints"
        d.mkdir(parents=True)
        if with_ckpt:
            (d / "latest.ckpt").mkdir()

    cfg = {"training": {"resume": "continue"}}
    paths = orch._resolve_run_paths(cfg, out, mode="training")
    assert paths.root == out / "20240102-000000"

    # reference spellings keep reference semantics: fresh dir
    cfg = {"training": {"resume": "auto"}}
    paths = orch._resolve_run_paths(cfg, out, mode="training")
    assert paths.root.parent == out
    assert paths.root.name not in ("20240101-000000", "20240102-000000")

    # inference mode never reuses
    cfg = {"training": {"resume": "continue"}}
    paths = orch._resolve_run_paths(cfg, out, mode="inference")
    assert paths.root.name not in ("20240101-000000", "20240102-000000")
