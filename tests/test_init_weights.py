"""training.init_weights: pretrained fine-tune start (strict=False head swap).

TPU analogue of the reference trainers' ImageNet-pretrained start + fresh
head (ref efficientnet.py:405-410, fastervit.py:371, efficientformer_v2.py:327):
backbone tensors load from a converted .pth / native msgpack export, the
freshly built classifier head keeps its init where shapes differ.
"""

import jax
import numpy as np
import pytest

from deepfakedetection_tpu.orchestrator import build_train_job
from deepfakedetection_tpu.runtime import checkpoint as ckpt
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import (
    TrainJob,
    apply_init_weights,
    resolve_init_weights,
    run_training,
)
from deepfakedetection_tpu.train.steps import init_model_variables
from tests.util import tiny_spec


def _job(tmp_path, **kw):
    defaults = dict(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=ensure_run_dirs(tmp_path / "run", run_id="t"),
        data_root=tmp_path,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=3,
        compute_dtype=np.float32,
    )
    defaults.update(kw)
    return TrainJob(**defaults)


def _init(num_classes, seed):
    model = tiny_spec().builder(num_classes, dtype=np.float32)
    return init_model_variables(model, jax.random.key(seed), (1, 32, 32, 3))


def test_resolve_init_weights(tmp_path):
    assert resolve_init_weights(_job(tmp_path)) is None
    job = _job(tmp_path, init_weights=tmp_path / "nope.pth")
    with pytest.raises(SystemExit, match="init_weights not found"):
        resolve_init_weights(job)
    w = tmp_path / "w.msgpack"
    w.write_bytes(b"x")
    assert resolve_init_weights(_job(tmp_path, init_weights=w)) == w


def test_apply_init_weights_backbone_loads_head_kept(tmp_path):
    # export a 2-class model, load it into a fresh 3-class init: every
    # backbone tensor copies over, the shape-mismatched head keeps its init
    params_src, stats_src = _init(num_classes=2, seed=0)
    wpath = ckpt.export_weights(tmp_path / "pre.msgpack", params_src, stats_src)

    params, batch_stats = _init(num_classes=3, seed=1)
    head_before = np.asarray(params["head"]["kernel"])
    job = _job(tmp_path, num_classes=3, init_weights=wpath)
    params2, stats2 = apply_init_weights(job, wpath, params, batch_stats)

    np.testing.assert_array_equal(
        np.asarray(params2["conv1"]["kernel"]),
        np.asarray(params_src["conv1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(stats2["bn1"]["mean"]), np.asarray(stats_src["bn1"]["mean"])
    )
    # head shapes differ (2 vs 3 classes) → fresh init survives
    np.testing.assert_array_equal(np.asarray(params2["head"]["kernel"]), head_before)


def test_is_torch_checkpoint_magic(tmp_path):
    zipish = tmp_path / "a.pth"
    zipish.write_bytes(b"PK\x03\x04rest")
    legacy = tmp_path / "b.pth"
    legacy.write_bytes(b"\x80\x02rest")
    native = tmp_path / "c.msgpack"
    native.write_bytes(b"\x82\xa6params")
    assert ckpt.is_torch_checkpoint(zipish)
    assert ckpt.is_torch_checkpoint(legacy)
    assert not ckpt.is_torch_checkpoint(native)


def test_build_train_job_plumbs_init_weights(tmp_path):
    w = tmp_path / "pre.pth"
    cfg = {
        "seed": 1,
        "data": {"root": str(tmp_path), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {"training": {"epochs": 1, "init_weights": str(w)}}
        },
    }
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    run_paths = ensure_run_dirs(tmp_path / "run", run_id="t")
    job = build_train_job(cfg, "efficientnet_b3", mc, run_paths)
    assert job.init_weights == w
    # absent key → None (random init, the reference default in zero-egress)
    mc2 = {"name": "efficientnet_b3", "training": {"epochs": 1}}
    assert build_train_job(cfg, "efficientnet_b3", mc2, run_paths).init_weights is None


def test_training_starts_from_init_weights(tiny_image_tree, tmp_path):
    # the wiring inside _run_training: resolve → apply → train one epoch
    params_src, stats_src = _init(num_classes=2, seed=0)
    wpath = ckpt.export_weights(tmp_path / "pre.msgpack", params_src, stats_src)
    job = _job(tmp_path, data_root=tiny_image_tree, init_weights=wpath)
    result = run_training(job)
    assert result.epochs_run == 1
