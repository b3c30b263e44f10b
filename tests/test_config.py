"""Config schema behavior parity (reference: orchestration/config_schema.py)."""

import pytest
import yaml

from deepfakedetection_tpu.config import OrchestratorConfig, load_config

BASE = {
    "seed": 1,
    "device": "tpu",
    "data": {"root": "data/x", "num_classes": 2, "img_size": 224},
    "models": {
        "efficientnet_b3": {"output_dir": "runs/enet"},
        "faster_vit_2_224": {"output_dir": "runs/fv"},
    },
}


def test_selection_defaults_to_all_models():
    cfg = OrchestratorConfig(**BASE)
    assert cfg.selection == ["efficientnet_b3", "faster_vit_2_224"]


def test_empty_models_rejected():
    bad = dict(BASE, models={})
    with pytest.raises(Exception, match="models"):
        OrchestratorConfig(**bad)


def test_unknown_selection_rejected():
    bad = dict(BASE, selection=["nope"])
    with pytest.raises(Exception, match="unknown models"):
        OrchestratorConfig(**bad)


def test_extra_keys_tolerated_and_data_extras_ignored():
    raw = dict(BASE)
    raw["custom_top_level"] = {"x": 1}
    raw["data"] = dict(BASE["data"], bogus_key=123)
    cfg = OrchestratorConfig(**raw)
    assert not hasattr(cfg.data, "bogus_key")


def test_load_config_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(BASE))
    cfg = load_config(p)
    assert cfg["data"]["img_size"] == 224
    assert cfg["selection"] == ["efficientnet_b3", "faster_vit_2_224"]


def test_defaults_match_reference():
    cfg = OrchestratorConfig(**BASE)
    assert cfg.data.train_split == "train"
    assert cfg.data.val_split == "val"
    assert cfg.data.test_split == "test"
    tb = cfg.models["efficientnet_b3"]
    assert tb.training is None and tb.inference is None


def test_shipped_yaml_recipes_build_jobs(tmp_path):
    """Every shipped config must validate and build typed jobs for every
    selected model (guards schema drift against the reference recipes)."""
    from pathlib import Path

    from deepfakedetection_tpu.config import load_config
    from deepfakedetection_tpu.orchestrator import build_eval_job, build_train_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    repo = Path(__file__).resolve().parents[1]
    for yaml_name in ("train.yaml", "inference.yaml", "train_imagenette.yaml"):
        cfg = load_config(repo / "config" / yaml_name)
        selection = cfg.get("selection") or list(cfg["models"].keys())
        assert selection, yaml_name
        for model_name in selection:
            mc = dict(cfg["models"][model_name], name=model_name)
            run_paths = ensure_run_dirs(tmp_path / yaml_name / model_name, run_id="t")
            tj = build_train_job(cfg, model_name, mc, run_paths)
            ej = build_eval_job(cfg, model_name, mc, run_paths)
            assert tj.img_size > 0 and tj.batch_size > 0 and tj.epochs > 0
            assert ej.img_size > 0 and ej.batch_size > 0
            assert tj.spec.name == model_name and ej.spec.name == model_name
