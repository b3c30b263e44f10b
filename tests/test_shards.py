"""Sharded-tar dataset (data/shards.py): scan/write round-trip, loader
backend parity with the ImageFolder path, and layout auto-detection."""

from __future__ import annotations

import numpy as np
import pytest

from deepfakedetection_tpu.data.folder import scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_eval_loader, make_train_loader
from deepfakedetection_tpu.data.shards import (
    TarShardDataset,
    scan_tar_shards,
    write_shards,
)
from deepfakedetection_tpu.data.transforms import build_eval_plan, build_train_plan


@pytest.fixture(scope="module")
def shard_split(tiny_image_tree, tmp_path_factory):
    """The test split packed into 2-image tar shards (exercises >1 shard)."""
    out = tmp_path_factory.mktemp("shards") / "test"
    folder_ds = scan_image_folder(tiny_image_tree / "test")
    shards = write_shards(folder_ds, out, images_per_shard=2)
    return tiny_image_tree / "test", out, shards


def test_write_scan_roundtrip_matches_folder(shard_split):
    folder_root, shard_root, shards = shard_split
    folder_ds = scan_image_folder(folder_root)
    ds = scan_tar_shards(shard_root)
    assert len(shards) == -(-len(folder_ds) // 2)
    assert ds.classes == folder_ds.classes
    assert ds.class_to_idx == folder_ds.class_to_idx
    assert len(ds) == len(folder_ds)
    # identical sample ORDER (class-major, name-sorted) → identical batches
    for (name, label), (path, flabel) in zip(ds.samples, folder_ds.samples):
        assert label == flabel
        assert name.split("/", 1)[1] == path.name


def test_read_bytes_returns_original_file(shard_split):
    folder_root, shard_root, _ = shard_split
    folder_ds = scan_image_folder(folder_root)
    ds = scan_tar_shards(shard_root)
    for i in (0, len(ds) - 1):
        assert ds.read_bytes(i) == folder_ds.samples[i][0].read_bytes()


def test_scan_image_folder_autodetects_tar_layout(shard_split):
    _, shard_root, _ = shard_split
    ds = scan_image_folder(shard_root)
    assert isinstance(ds, TarShardDataset)


def test_eval_loader_backend_parity(shard_split):
    """Same plan over folder vs shards → identical images/labels/masks."""
    folder_root, shard_root, _ = shard_split
    plan = build_eval_plan(32, {})
    batches_folder = list(
        make_eval_loader(scan_image_folder(folder_root), plan, batch_size=4)
    )
    batches_shard = list(
        make_eval_loader(scan_tar_shards(shard_root), plan, batch_size=4)
    )
    assert len(batches_folder) == len(batches_shard)
    for bf, bs in zip(batches_folder, batches_shard):
        np.testing.assert_array_equal(bf.images, bs.images)
        np.testing.assert_array_equal(bf.labels, bs.labels)
        np.testing.assert_array_equal(bf.mask, bs.mask)


def test_trainer_val_geometry_falls_back_to_pil(shard_split, monkeypatch):
    """Over-resize eval plans can't use the native direct-square buffer
    decode; the loader must fall back to PIL (identical pixels either way —
    here we just pin that the branch is taken)."""
    _, shard_root, _ = shard_split
    from deepfakedetection_tpu.data import pipeline as pl

    # over-resize only applies above the small-image regime (img_size > 64)
    plan = build_eval_plan(96, {}, trainer_val=True)  # resize_size 128 > 96
    loader = make_eval_loader(
        scan_tar_shards(shard_root), plan, batch_size=4, use_native=True
    )
    def boom(*a, **k):
        raise AssertionError("native buffer decode must not be used here")

    monkeypatch.setattr(pl.native, "decode_buffer", boom)
    batch = next(iter(loader))
    assert batch.images.shape[1:] == (plan.img_size, plan.img_size, 3)


def test_train_loader_over_shards_shuffles_and_fills(shard_split):
    folder_root, shard_root, _ = shard_split
    plan = build_train_plan(32, {})
    ds = scan_tar_shards(shard_root)
    loader = make_train_loader(ds, plan, batch_size=4, seed=7)
    loader.set_epoch(0)
    e0 = [b.images.copy() for b in loader]
    assert all(b.shape[0] == 4 for b in e0)  # drop_last: full batches only
    # epoch order advances deterministically with set_epoch
    loader.set_epoch(1)
    e1 = [b.images.copy() for b in loader]
    assert any(not np.array_equal(a, b) for a, b in zip(e0, e1))
    loader.set_epoch(0)
    e0_again = [b.images.copy() for b in loader]
    for a, b in zip(e0, e0_again):
        np.testing.assert_array_equal(a, b)


def test_cache_decoded_over_shards(shard_split, monkeypatch):
    """Epoch 2 with cache_decoded reads zero bytes from the shards."""
    _, shard_root, _ = shard_split
    plan = build_eval_plan(32, {})
    ds = scan_tar_shards(shard_root)
    loader = make_eval_loader(ds, plan, batch_size=4, cache_decoded=True)
    list(loader)
    reads = []
    orig = TarShardDataset.read_bytes
    monkeypatch.setattr(
        TarShardDataset, "read_bytes",
        lambda self, i: reads.append(i) or orig(self, i),
    )
    list(loader)
    assert not reads


@pytest.mark.slow
def test_training_over_shards_end_to_end(tiny_image_tree, tmp_path):
    """The full two-phase training + eval slice with every split packed as
    tar shards — the loaders, metrics, and checkpoints are backend-agnostic."""
    from deepfakedetection_tpu.evaluate.job import EvalJob, run_eval_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
    from deepfakedetection_tpu.train.loop import TrainJob, run_training
    from tests.util import tiny_spec

    shard_root = tmp_path / "shards"
    for split in ("train", "val", "test"):
        write_shards(
            scan_image_folder(tiny_image_tree / split),
            shard_root / split,
            images_per_shard=5,
        )
    run_paths = ensure_run_dirs(tmp_path / "runs" / "tiny_cnn", run_id="t0")
    job = TrainJob(
        model_name="tiny_cnn", spec=tiny_spec(), run_paths=run_paths,
        data_root=shard_root, num_classes=2, img_size=32, batch_size=8,
        epochs=1, num_workers=0, seed=7, compute_dtype=np.float32,
    )
    result = run_training(job)
    assert result.epochs_run == 1
    assert (run_paths.checkpoints / "latest.ckpt").exists()
    ejob = EvalJob(
        model_name="tiny_cnn", spec=tiny_spec(), run_paths=run_paths,
        data_root=shard_root, num_classes=2, img_size=32, batch_size=8,
        num_workers=0, weights=run_paths.checkpoints / "tiny_cnn.pth",
        compute_dtype=np.float32,
    )
    eres = run_eval_job(ejob)
    assert eres is not None
    assert eres.probs.shape[0] == len(scan_image_folder(tiny_image_tree / "test"))
    assert (run_paths.logs / "metrics.jsonl").exists()
