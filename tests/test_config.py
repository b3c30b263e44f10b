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
