"""training.unfreeze: YAML override of the recipe's fine-tune unfreeze policy.

The reference hardcodes UNFREEZE_KEYS per trainer (efficientformer_v2.py:66-74);
here the same substring semantics are configurable — ("head",) + init_weights
is a linear probe.
"""

import dataclasses

import jax
import numpy as np
import pytest
from flax import serialization

from deepfakedetection_tpu.orchestrator import _parse_unfreeze, build_train_job
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, adopts_official_head, run_training
from deepfakedetection_tpu.train.steps import init_model_variables
from tests.util import tiny_spec


def _job(tmp_path, tiny_image_tree, **kw):
    defaults = dict(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=ensure_run_dirs(tmp_path / "run", run_id="t"),
        data_root=tiny_image_tree,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=1,
        num_workers=0,
        seed=5,
        compute_dtype=np.float32,
    )
    defaults.update(kw)
    return TrainJob(**defaults)


def test_parse_unfreeze():
    assert _parse_unfreeze(None) is None
    assert _parse_unfreeze("all") == "all"
    assert _parse_unfreeze("ALL ") == "all"
    assert _parse_unfreeze("head") == ("head",)
    assert _parse_unfreeze(["stages_3", "head"]) == ("stages_3", "head")
    for bad in ("", [], ["head", ""]):
        with pytest.raises(SystemExit):
            _parse_unfreeze(bad)


def test_head_only_unfreeze_freezes_backbone(tmp_path, tiny_image_tree):
    # linear probe: with unfreeze=("head",) the exported best weights keep
    # the backbone at its init values while the head moves
    job = _job(tmp_path, tiny_image_tree, unfreeze=("head",))
    result = run_training(job)
    assert result.epochs_run == 1

    model = tiny_spec().builder(2, dtype=np.float32)
    params0, _ = init_model_variables(model, jax.random.key(5), (1, 32, 32, 3))
    blob = (job.run_paths.checkpoints / "tiny_cnn.pth").read_bytes()
    exported = serialization.msgpack_restore(bytearray(blob))["params"]
    np.testing.assert_array_equal(
        np.asarray(exported["conv1"]["kernel"]), np.asarray(params0["conv1"]["kernel"])
    )
    assert not np.array_equal(
        np.asarray(exported["head"]["kernel"]), np.asarray(params0["head"]["kernel"])
    )


def test_unfreeze_matching_nothing_hard_fails(tmp_path, tiny_image_tree):
    job = _job(tmp_path, tiny_image_tree, unfreeze=("no_such_param_xyz",))
    with pytest.raises(SystemExit, match="matches no parameter"):
        run_training(job)


def test_adopts_official_head(tmp_path):
    torch_ckpt = tmp_path / "w.pth"
    torch_ckpt.write_bytes(b"PK\x03\x04rest")
    native = tmp_path / "w.msgpack"
    native.write_bytes(b"\x82\xa6params")

    fvit = dataclasses.replace(tiny_spec(), family="fastervit")
    job = _job(tmp_path, tmp_path, spec=fvit)
    assert adopts_official_head(job, torch_ckpt)
    assert not adopts_official_head(job, native)  # native export: keep "tpu"
    # explicit head_config always wins
    job2 = _job(tmp_path, tmp_path, spec=fvit, model_kwargs={"head_config": "tpu"})
    assert not adopts_official_head(job2, torch_ckpt)
    # non-fastervit families never switch
    job3 = _job(tmp_path, tmp_path)
    assert not adopts_official_head(job3, torch_ckpt)


def test_build_train_job_plumbs_unfreeze(tmp_path):
    cfg = {
        "seed": 1,
        "data": {"root": str(tmp_path), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {"training": {"epochs": 1, "unfreeze": ["head"]}}
        },
    }
    mc = dict(cfg["models"]["efficientnet_b3"], name="efficientnet_b3")
    run_paths = ensure_run_dirs(tmp_path / "run", run_id="t")
    job = build_train_job(cfg, "efficientnet_b3", mc, run_paths)
    assert job.unfreeze == ("head",)
    mc2 = {"name": "efficientnet_b3", "training": {"epochs": 1}}
    assert build_train_job(cfg, "efficientnet_b3", mc2, run_paths).unfreeze is None
