"""Grad-CAM: on-device CAM values, overlay rendering, web-UI triptych export."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from deepfakedetection_tpu.cam import (
    compute_cam,
    head_logits,
    jet_colormap,
    show_cam_on_image,
)
from deepfakedetection_tpu.train.steps import init_model_variables
from tests.util import TinyCNN


def _tiny():
    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    return model, params, batch_stats


def test_head_logits_matches_model_forward():
    model, params, batch_stats = _tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    logits, inter = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False,
        mutable=["intermediates"],
    )
    feats = jax.tree.leaves(inter["intermediates"])[0]
    replay = head_logits(params, feats)
    np.testing.assert_allclose(np.asarray(replay), np.asarray(logits), atol=1e-5)


def test_compute_cam_range_and_shape():
    model, params, batch_stats = _tiny()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)), jnp.float32)
    cam = np.asarray(compute_cam(model, params, batch_stats, x, 0))
    assert cam.shape == (2, 32, 32)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_head_replay_dual_heads_efficientformer():
    """EFv2 averages head + head_dist; the replay must match the model."""
    from deepfakedetection_tpu.models.efficientformer_v2 import create_efficientformer_v2

    model = create_efficientformer_v2("s0", num_classes=3, dtype=jnp.float32)
    params_vars = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, 224, 224, 3)), train=False)
    )(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 224, 224, 3)), jnp.float32)
    logits, inter = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mutable=["intermediates"])
    )(params_vars, x)
    feats = jax.tree.leaves(inter["intermediates"])[0]
    replay = head_logits(params_vars["params"], feats)
    np.testing.assert_allclose(np.asarray(replay), np.asarray(logits), atol=1e-4)
    cam = np.asarray(
        compute_cam(model, params_vars["params"], params_vars.get("batch_stats", {}), x, 1)
    )
    assert cam.shape == (1, 224, 224)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_jet_and_overlay():
    gray = np.linspace(0, 1, 64).reshape(8, 8)
    jet = jet_colormap(gray)
    assert jet.shape == (8, 8, 3)
    # cold end is blue-ish, hot end red-ish
    assert jet[0, 0, 2] > jet[0, 0, 0]
    assert jet[-1, -1, 0] > jet[-1, -1, 2]
    rgb = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    out = show_cam_on_image(rgb, gray)
    assert out.dtype == np.uint8 and out.shape == (8, 8, 3)


def test_webui_predict_and_visualize(tiny_image_tree, tmp_path, monkeypatch):
    """Full triptych path without gradio, tiny model monkey-patched in."""
    import web_ui
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.train.steps import make_eval_step

    model, params, batch_stats = _tiny()
    bundle = web_ui.ModelBundle(
        name="tiny_cnn",
        display_label="Tiny CNN",
        model=model,
        params=params,
        batch_stats=batch_stats,
        eval_step=make_eval_step(model),
        plan=build_eval_plan(32),
    )
    monkeypatch.setattr(web_ui, "MODEL_CACHE", [bundle, bundle])
    monkeypatch.setattr(web_ui, "EXPORT_DIR", tmp_path / "cam_exports")

    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (50, 60, 3), dtype=np.uint8)
    )
    out, summary = web_ui.predict_and_visualize(img)
    # two panels of 32x32, 2x upscale → 64 x 128
    assert out.shape == (64, 128, 3)
    lines = summary.splitlines()
    assert len(lines) == 3 and lines[-1].startswith("Saved: ")
    assert "% confidence)" in lines[0]
    exports = list((tmp_path / "cam_exports").glob("cam_triptych_*.png"))
    assert len(exports) == 1


def test_webui_ensemble_summary_line(tiny_image_tree, tmp_path, monkeypatch):
    """ensemble: config adds a summary verdict line (triptych unchanged —
    Grad-CAM is per-model)."""
    import web_ui
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.train.steps import make_eval_step

    model, params, batch_stats = _tiny()
    bundle = web_ui.ModelBundle(
        name="tiny_cnn", display_label="Tiny CNN", model=model, params=params,
        batch_stats=batch_stats, eval_step=make_eval_step(model),
        plan=build_eval_plan(32),
    )
    monkeypatch.setattr(web_ui, "MODEL_CACHE", [bundle, bundle])
    monkeypatch.setattr(web_ui, "EXPORT_DIR", tmp_path / "cam_exports")
    monkeypatch.setattr(web_ui, "ENSEMBLE_CFG", {})

    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (50, 60, 3), dtype=np.uint8)
    )
    out, summary = web_ui.predict_and_visualize(img)
    assert out.shape == (64, 128, 3)  # still two panels, no ensemble panel
    lines = summary.splitlines()
    assert len(lines) == 4
    assert lines[2].startswith("Ensemble: ") and "% confidence)" in lines[2]
