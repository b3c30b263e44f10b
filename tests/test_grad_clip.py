"""grad_clip_norm: optax chain semantics + config validation + loop smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.train.optim import make_phase_optimizer


def _params():
    return {"head": {"w": jnp.ones((4,), jnp.float32)},
            "body": {"w": jnp.ones((3,), jnp.float32)}}


def test_clip_bounds_update_magnitude():
    params = _params()
    tx, _, _ = make_phase_optimizer(
        params, lr=1.0, weight_decay=0.0, trainable=lambda p: True,
        grad_clip_norm=1.0,
    )
    state = tx.init(params)
    huge = jax.tree.map(lambda x: jnp.full_like(x, 1e6), params)
    updates, _ = tx.update(huge, state, params)
    # adam normalizes magnitudes to ~lr anyway; verify the chain runs and
    # produces finite updates under a pathological gradient
    for u in jax.tree.leaves(updates):
        assert np.isfinite(np.asarray(u)).all()

    # the clip itself: compare the transformed grads against an unclipped
    # SGD-like probe by inspecting clip_by_global_norm directly
    import optax

    clip = optax.clip_by_global_norm(1.0)
    cstate = clip.init(params)
    clipped, _ = clip.update(huge, cstate, params)
    norm = float(optax.global_norm(clipped))
    assert norm == pytest.approx(1.0, rel=1e-5)


def test_clip_respects_freeze_partition():
    params = _params()
    tx, n_train, n_total = make_phase_optimizer(
        params, lr=0.1, weight_decay=0.0,
        trainable=lambda p: "head" in p, grad_clip_norm=1.0,
    )
    assert (n_train, n_total) == (1, 2)
    state = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 5.0), params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["body"]["w"]), 0.0)
    assert np.abs(np.asarray(updates["head"]["w"])).max() > 0


def test_config_grad_clip_validation(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config

    cfg = {
        "data": {"root": "d", "num_classes": 2},
        "models": {"efficientnet_b3": {"training": {"grad_clip_norm": -1}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="grad_clip_norm"):
        load_config(p)
    cfg["models"]["efficientnet_b3"]["training"]["grad_clip_norm"] = 1.0
    p.write_text(yaml.safe_dump(cfg))
    assert load_config(p)["models"]["efficientnet_b3"]["training"]["grad_clip_norm"] == 1.0


def test_training_with_clip_runs(tiny_image_tree, tmp_path):
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from deepfakedetection_tpu.train.loop import TrainJob, run_training
    from tests.util import tiny_spec

    job = TrainJob(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=ensure_run_dirs(tmp_path / "tiny", run_id="gc"),
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=3,
        compute_dtype=np.float32,
        grad_clip_norm=0.5,
    )
    result = run_training(job)
    assert result.epochs_run == 1
    assert np.isfinite(result.final_train_loss)
