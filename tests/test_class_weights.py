"""training.class_weights: weighted CE semantics, auto-balance, plumbing.

TPU extension (the reference trains unweighted CE only): per-class loss
weights for imbalanced deepfake datasets — "auto" derives sklearn-"balanced"
N/(C·count_c) weights from the train split; explicit lists follow
alphabetical class order (the label order, data/folder.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.train.objectives import smoothed_cross_entropy


def _torch_weighted_ce(logits, labels, weights, label_smoothing=0.0):
    """Independent torch reference: CrossEntropyLoss(weight=, label_smoothing=)."""
    import torch

    return float(
        torch.nn.functional.cross_entropy(
            torch.tensor(np.asarray(logits), dtype=torch.float64),
            torch.tensor(np.asarray(labels), dtype=torch.long),
            weight=torch.tensor(np.asarray(weights), dtype=torch.float64),
            label_smoothing=label_smoothing,
        )
    )


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_weighted_ce_matches_torch_semantics(smoothing):
    """ADVICE r3: torch weights each class component of the smoothed target
    by w_c — must agree at label_smoothing>0 (the default recipe's 0.1),
    not just 0."""
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (16, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 16)
    weights = np.array([0.5, 2.0, 1.25], np.float32)
    got = float(
        smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels),
            label_smoothing=smoothing, class_weights=jnp.asarray(weights),
        )
    )
    assert got == pytest.approx(
        _torch_weighted_ce(logits, labels, weights, smoothing), rel=1e-5
    )


def test_weighted_ce_uniform_weights_is_unweighted():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 1, (8, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 8))
    mask = jnp.asarray([True] * 6 + [False] * 2)
    base = smoothed_cross_entropy(logits, labels, mask)
    same = smoothed_cross_entropy(
        logits, labels, mask, class_weights=jnp.asarray([3.0, 3.0])
    )
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)


def test_weighted_ce_masked_rows_contribute_nothing():
    logits = jnp.asarray(np.random.default_rng(2).normal(0, 1, (4, 2)), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1])
    w = jnp.asarray([1.0, 5.0])
    full = smoothed_cross_entropy(
        logits[:2], labels[:2], class_weights=w, label_smoothing=0.1
    )
    masked = smoothed_cross_entropy(
        logits, labels, jnp.asarray([True, True, False, False]),
        class_weights=w, label_smoothing=0.1,
    )
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_weighted_ce_grad_scales_with_class_weight():
    """Upweighting a class scales its rows' gradient share."""
    logits = jnp.asarray([[2.0, -1.0], [0.5, 1.5]], jnp.float32)
    labels = jnp.asarray([0, 1])

    def loss(lg, w):
        return smoothed_cross_entropy(
            lg, labels, label_smoothing=0.0,
            class_weights=jnp.asarray(w),
        )

    g_uniform = jax.grad(loss)(logits, [1.0, 1.0])
    g_up = jax.grad(loss)(logits, [1.0, 3.0])
    # normalization: sum w = 2 vs 4; row 1's raw weight 1→3
    np.testing.assert_allclose(
        np.asarray(g_up[1]), np.asarray(g_uniform[1]) * (3.0 / 1.0) * (2.0 / 4.0),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_up[0]), np.asarray(g_uniform[0]) * (2.0 / 4.0), rtol=1e-5
    )


def test_resolve_auto_weights_from_imbalanced_folder(tmp_path):
    from PIL import Image

    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from deepfakedetection_tpu.train.loop import TrainJob, resolve_class_weights
    from tests.util import tiny_spec

    rng = np.random.default_rng(0)
    for cls, n in (("fake", 6), ("real", 2)):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    ds = scan_image_folder(tmp_path / "train")
    job = TrainJob(
        model_name="tiny_cnn", spec=tiny_spec(),
        run_paths=ensure_run_dirs(tmp_path / "runs", run_id="w"),
        data_root=tmp_path, num_classes=2, class_weights="auto",
    )
    w = resolve_class_weights(job, ds)
    # N/(C*count): 8/(2*6), 8/(2*2)
    np.testing.assert_allclose(w, [8 / 12, 8 / 4], rtol=1e-6)

    job.class_weights = (1.0, 4.0)
    np.testing.assert_allclose(resolve_class_weights(job, ds), [1.0, 4.0])

    job.class_weights = (1.0,)  # wrong arity
    with pytest.raises(SystemExit, match="class_weights"):
        resolve_class_weights(job, ds)
    job.class_weights = "balanced"  # unknown keyword
    with pytest.raises(SystemExit, match="class_weights"):
        resolve_class_weights(job, ds)


def test_config_class_weights_validation_and_plumbing(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config
    from deepfakedetection_tpu.orchestrator import build_train_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    cfg = {
        "data": {"root": str(tmp_path), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"training": {"class_weights": [1.0, -2.0]}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="class_weights"):
        load_config(p)

    for value, expect in (("auto", "auto"), ([0.5, 2.5], (0.5, 2.5))):
        cfg["models"]["efficientnet_b3"]["training"]["class_weights"] = value
        p.write_text(yaml.safe_dump(cfg))
        config = load_config(p)
        run_paths = ensure_run_dirs(tmp_path / "runs/x", run_id="t")
        model_cfg = dict(config["models"]["efficientnet_b3"], name="efficientnet_b3")
        job = build_train_job(config, "efficientnet_b3", model_cfg, run_paths)
        assert job.class_weights == expect


def test_train_step_with_class_weights_runs_and_differs():
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step,
    )
    from tests.util import tiny_spec

    model = tiny_spec().builder(2)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-3, weight_decay=0.0, trainable=lambda _: True
    )
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    x = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
    labels = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1])
    mask = jnp.ones((8,), bool)
    key = jax.random.key(2)

    plain = make_train_step(model, tx)
    weighted = make_train_step(model, tx, class_weights=np.asarray([0.25, 2.0]))
    # the step donates its state argument: give each call its own copy
    _, m0 = plain(jax.tree.map(jnp.copy, state), x, labels, mask, key)
    _, m1 = weighted(jax.tree.map(jnp.copy, state), x, labels, mask, key)
    assert float(m0["loss"]) != pytest.approx(float(m1["loss"]))
