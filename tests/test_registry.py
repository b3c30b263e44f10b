"""Registry matching rules (reference: orchestration/model_registry.py:78-98)."""

import pytest

from deepfakedetection_tpu.registry import get_model_spec


def test_exact_and_prefix_matching():
    assert get_model_spec("efficientnet_b3").family == "efficientnet"
    assert get_model_spec("efficientformerv2_s1").family == "efficientformerv2"
    assert get_model_spec("efficientformer_v2_l").family == "efficientformerv2"
    # unknown variants raise instead of silently building the wrong net
    # (timm raises for them too; strict=False loading would otherwise hide it)
    with pytest.raises(KeyError, match="V1"):
        get_model_spec("efficientformer_l1")
    with pytest.raises(KeyError):
        get_model_spec("efficientformerv2_s9")
    with pytest.raises(KeyError):
        get_model_spec("faster_vit_9_224")
    assert get_model_spec("faster_vit_2_224").family == "fastervit"
    assert get_model_spec("faster_vit_0_224").family == "fastervit"


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model_spec("resnet50")


def test_recipe_deltas_match_reference():
    enet = get_model_spec("efficientnet_b3").recipe
    fv = get_model_spec("faster_vit_2_224").recipe
    ef = get_model_spec("efficientformerv2_s1").recipe
    # SURVEY.md §2.3d deltas
    assert enet.finetune_micro_batch == 32 and enet.accum_steps == 4
    assert enet.accum_steps_overridable
    assert not fv.accum_steps_overridable  # fastervit.py:437-439
    assert ef.early_stop_patience is None and enet.early_stop_patience == 4
    assert ef.unfreeze != "all" and enet.unfreeze == "all"
    assert enet.color_jitter == (0.2, 0.2, 0.2, 0.05)
    assert fv.color_jitter == (0.1, 0.1, 0.1, 0.05)
    # EfficientNet inherits the regime-gated base defaults (rotation/jitter/
    # erasing = not small_images, efficientnet.py:128-144) — no overrides;
    # FasterViT forces rotation/erasing off at every size (fastervit.py:127,129)
    assert "train_random_erasing" not in enet.default_train_toggles
    assert fv.default_train_toggles["train_random_erasing"] is False
    assert "train_color_jitter" not in fv.default_train_toggles
