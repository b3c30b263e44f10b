"""Weight EMA (training.ema_decay): update math, loop integration, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, run_training
from deepfakedetection_tpu.train.steps import make_ema_update
from tests.util import tiny_spec


def test_ema_update_math_no_warmup():
    update = make_ema_update(0.75, warmup=False)
    step = jnp.asarray(0, jnp.int32)
    ema = {"w": jnp.ones((3,), jnp.float32) * 4.0}
    params = {"w": jnp.zeros((3,), jnp.float32)}
    ema = update(ema, params, step)  # 0.75*4 + 0.25*0 = 3
    np.testing.assert_allclose(np.asarray(ema["w"]), 3.0)
    ema = update(ema, {"w": jnp.ones((3,), jnp.float32)}, step)  # 0.75*3 + 0.25
    np.testing.assert_allclose(np.asarray(ema["w"]), 2.5)


def test_ema_decay_warmup_ramp():
    # d_t = min(decay, (1+t)/(10+t)): early steps track params closely so a
    # production decay (0.999) is usable on short fine-tunes
    update = make_ema_update(0.999)
    ema = {"w": jnp.zeros((2,), jnp.float32)}
    params = {"w": jnp.ones((2,), jnp.float32)}
    out = update(ema, params, jnp.asarray(0, jnp.int32))
    # t=0: d = 1/10 → ema = 0.9 * params
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)
    out2 = update({"w": jnp.zeros((2,), jnp.float32)}, params,
                  jnp.asarray(10_000, jnp.int32))
    # large t: d saturates at decay → ema barely moves
    np.testing.assert_allclose(np.asarray(out2["w"]), 1.0 - 0.999, rtol=1e-4)


def test_ema_update_does_not_alias_live_params():
    # the loop seeds the EMA with an explicit copy; verify the update's
    # donation cannot invalidate a caller-held copy of the same values
    update = make_ema_update(0.5, warmup=False)
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    ema = jax.tree.map(jnp.copy, params)
    out = update(ema, params, jnp.asarray(3, jnp.int32))
    np.testing.assert_allclose(np.asarray(params["w"]), [0, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(out["w"]), [0, 1, 2, 3])


def _job(tmp, data_root, run_id, **kw):
    run_paths = ensure_run_dirs(tmp / "tiny_cnn", run_id=run_id)
    defaults = dict(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=data_root,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=2,
        num_workers=0,
        seed=11,
        resume_auto=True,
        compute_dtype=np.float32,
        ema_decay=0.9,
    )
    defaults.update(kw)
    return TrainJob(**defaults)


@pytest.fixture(scope="module")
def ema_run(tiny_image_tree, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ema_runs")
    job = _job(tmp, tiny_image_tree, "e0")
    result = run_training(job)
    return tmp, job, result


def test_ema_training_completes_and_exports(ema_run):
    _, job, result = ema_run
    assert result.epochs_run == 2
    assert (job.run_paths.checkpoints / "latest.ckpt").exists()
    if result.best_epoch >= 0:
        assert (job.run_paths.checkpoints / "tiny_cnn.pth").exists()
    log = (job.run_paths.logs / "train.log").read_text()
    assert "weight EMA: decay=0.9" in log
    assert "ema" in log  # the val line carries the ema marker


def test_ema_checkpoint_carries_averaged_tree(ema_run):
    # latest.ckpt holds both the raw state and the ema tree, and with a
    # strong decay the averaged weights lag the optimizer trajectory
    _, job, _ = ema_run
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(
        (job.run_paths.checkpoints / "latest.ckpt").resolve()
    )
    assert "ema" in raw
    raw_leaves = jax.tree.leaves(raw["state"]["params"])
    ema_leaves = jax.tree.leaves(raw["ema"])
    assert len(raw_leaves) == len(ema_leaves)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(raw_leaves, ema_leaves)
    )


def test_ema_resume_restores_average(ema_run, tiny_image_tree):
    tmp, job, _ = ema_run
    job2 = _job(tmp, tiny_image_tree, "e0", epochs=3)
    result = run_training(job2)
    assert result.epochs_run == 1  # resumed at epoch 2, ran epoch 3
    log = (job2.run_paths.logs / "train.log").read_text()
    assert "resumed from" in log


def test_ema_resume_from_pre_ema_checkpoint(tiny_image_tree, tmp_path_factory):
    # a run trained WITHOUT ema can be resumed WITH it (average seeds from
    # the restored weights instead of failing the orbax restore)
    tmp = tmp_path_factory.mktemp("ema_upgrade")
    base = _job(tmp, tiny_image_tree, "u0", ema_decay=None, epochs=1)
    run_training(base)
    cont = _job(tmp, tiny_image_tree, "u0", ema_decay=0.9, epochs=2)
    result = run_training(cont)
    assert result.epochs_run == 1


def test_config_ema_decay_validation(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config

    cfg = {
        "data": {"root": "d", "num_classes": 2},
        "models": {"efficientnet_b3": {"training": {"ema_decay": 1.5}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="ema_decay"):
        load_config(p)
    cfg["models"]["efficientnet_b3"]["training"]["ema_decay"] = 0.999
    p.write_text(yaml.safe_dump(cfg))
    loaded = load_config(p)
    assert loaded["models"]["efficientnet_b3"]["training"]["ema_decay"] == 0.999
