"""Orchestrator behavior: job construction from YAML, selection handling,
run-dir/snapshot surface, resume parsing."""

import yaml

from deepfakedetection_tpu.orchestrator import (
    _parse_resume,
    build_eval_job,
    build_train_job,
)
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs, snapshot_config


def _config(tmp_path):
    return {
        "seed": 7,
        "device": "tpu",
        "data": {
            "root": str(tmp_path / "data"),
            "train_split": "train",
            "val_split": "val",
            "test_split": "test",
            "num_classes": 2,
            "img_size": 224,
        },
        "models": {
            "efficientnet_b3": {
                "output_dir": str(tmp_path / "runs/enet"),
                "training": {
                    "epochs": 3,
                    "batch_size": 32,
                    "num_workers": 2,
                    "resume": "auto",
                    "lr": 5e-5,
                    "accum_steps": 2,
                },
                "inference": {
                    "weights": str(tmp_path / "w.pth"),
                    "split": "test",
                    "batch_size": 128,
                    "img_size": 192,
                },
                "transforms": {
                    "train": {"train_random_rotation": False},
                    "eval": {"val_resize": True},
                },
            }
        },
        "selection": ["efficientnet_b3"],
    }


def test_build_train_job_from_yaml(tmp_path):
    cfg = _config(tmp_path)
    run_paths = ensure_run_dirs(tmp_path / "runs/enet", run_id="t")
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    job = build_train_job(cfg, "efficientnet_b3", mc, run_paths)
    assert job.epochs == 3 and job.batch_size == 32
    assert job.lr == 5e-5 and job.accum_steps == 2
    assert job.resume_auto is True
    assert job.img_size == 224  # data img_size (no training override)
    assert job.seed == 7
    assert job.train_toggles == {"train_random_rotation": False}


def test_build_eval_job_img_size_chain(tmp_path):
    cfg = _config(tmp_path)
    run_paths = ensure_run_dirs(tmp_path / "runs/enet", run_id="e")
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    job = build_eval_job(cfg, "efficientnet_b3", mc, run_paths)
    assert job.img_size == 192  # inference overrides data (orchestrator.py:250-276)
    assert job.batch_size == 128 and job.split == "test"
    assert str(job.weights).endswith("w.pth")


def test_parse_resume_reference_semantics():
    # training.resume ∈ {1, true, "auto"} (orchestrator.py:246-249)
    assert _parse_resume("auto") and _parse_resume(True) and _parse_resume(1)
    assert _parse_resume("TRUE") and _parse_resume("yes")
    assert not _parse_resume(False) and not _parse_resume(None)
    assert not _parse_resume("no") and not _parse_resume(0)


def test_snapshot_config_contents(tmp_path):
    cfg = _config(tmp_path)
    run_paths = ensure_run_dirs(tmp_path / "runs/enet", run_id="s")
    out = snapshot_config(cfg, "efficientnet_b3", run_paths)
    snap = yaml.safe_load(out.read_text())
    # globals minus models/selection + the model block (orchestrator.py:148-159)
    assert "models" not in snap and "selection" not in snap
    assert snap["seed"] == 7
    assert snap["model"]["name"] == "efficientnet_b3"
    assert snap["model"]["training"]["epochs"] == 3


def test_eval_job_batch_worker_fallback_chain(tmp_path):
    """batch: infer→train→64; workers: infer→train→data→0
    (reference orchestrator.py:257-269)."""
    cfg = _config(tmp_path)
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    mc["inference"] = {"weights": None}  # no batch/workers set on inference
    run_paths = ensure_run_dirs(tmp_path / "runs/enet", run_id="f")
    job = build_eval_job(cfg, "efficientnet_b3", mc, run_paths)
    assert job.batch_size == 32  # falls back to training.batch_size
    assert job.num_workers == 2  # falls back to training.num_workers

    mc["training"] = {}
    cfg2 = dict(cfg)
    job2 = build_eval_job(cfg2, "efficientnet_b3", mc, run_paths)
    assert job2.batch_size == 64
    assert job2.num_workers == 0  # data has no num_workers → 0


def test_eval_job_weights_auto_resolves_newest_export(tmp_path):
    """inference.weights: auto → newest run dir's exported .pth (TPU
    extension; a literal path goes stale after every re-train because run
    dirs are freshly timestamped, and the load only warns)."""
    import pytest

    cfg = _config(tmp_path)
    out = tmp_path / "runs/enet"
    for run, with_pth in (("20240101-000000", True), ("20240102-000000", True),
                          ("20240103-000000", False)):
        d = out / run / "checkpoints"
        d.mkdir(parents=True)
        if with_pth:
            (d / "efficientnet_b3.pth").write_bytes(b"x")
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    mc["inference"] = dict(mc["inference"], weights="auto")
    run_paths = ensure_run_dirs(tmp_path / "runs/enet", run_id="t")
    job = build_eval_job(cfg, "efficientnet_b3", mc, run_paths)
    # newest run WITH an export wins (the empty 0103 dir is skipped; the
    # "t" run dir created above has no checkpoints/*.pth either)
    assert job.weights == out / "20240102-000000" / "checkpoints" / "efficientnet_b3.pth"

    # no export anywhere → actionable hard failure, never silent init weights
    mc2 = dict(mc, output_dir=str(tmp_path / "runs/empty"))
    with pytest.raises(SystemExit, match="no exported .pth"):
        build_eval_job(cfg, "efficientnet_b3", mc2, run_paths)
