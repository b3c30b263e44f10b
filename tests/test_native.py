"""Native C++ decode library: correctness vs the PIL path, batch API, fallback."""

import numpy as np
import pytest
from PIL import Image

from deepfakedetection_tpu.data import native
from deepfakedetection_tpu.data.decode import decode_eval, decode_train
from deepfakedetection_tpu.data.folder import scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_train_loader
from deepfakedetection_tpu.data.transforms import build_eval_plan, build_train_plan

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def smooth_images(tmp_path_factory):
    td = tmp_path_factory.mktemp("imgs")
    y, x = np.mgrid[0:200, 0:260]
    img = np.stack(
        [
            128 + 100 * np.sin(x / 40) * np.cos(y / 30),
            128 + 80 * np.cos(x / 25),
            np.minimum(x, 255) * 0.8,
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    jpg = td / "a.jpg"
    png = td / "b.png"
    Image.fromarray(img).save(jpg, quality=95)
    Image.fromarray(img).save(png)
    return jpg, png


def test_native_matches_pil_geometry_and_content(smooth_images):
    jpg, png = smooth_images
    for path in (jpg, png):
        pil = decode_eval(path, build_eval_plan(96))
        nat = native.decode_image(path, 96)
        assert nat.shape == pil.shape == (96, 96, 3)
        diff = np.abs(pil.astype(int) - nat.astype(int))
        assert diff.mean() < 2.0  # resampling-filter differences only


def test_native_batch_and_status(smooth_images, tmp_path):
    jpg, png = smooth_images
    bad = tmp_path / "missing.jpg"
    out, status = native.decode_batch([jpg, png, bad], 64, n_threads=2)
    assert out.shape == (3, 64, 64, 3)
    assert status[0] == 0 and status[1] == 0 and status[2] != 0


def test_train_loader_native_backend(tiny_image_tree):
    ds = scan_image_folder(tiny_image_tree / "train")
    plan = build_train_plan(64)
    loader = make_train_loader(ds, plan, batch_size=8, seed=1, num_workers=2)
    assert loader.use_native
    batch = next(iter(loader))
    assert batch.images.shape == (8, plan.host_canvas_size, plan.host_canvas_size, 3)
    assert batch.mask.all()
    # native and PIL produce near-identical pixels on the same sample
    pil_loader = make_train_loader(
        ds, plan, batch_size=8, seed=1, num_workers=0, use_native=False
    )
    pil_batch = next(iter(pil_loader))
    np.testing.assert_array_equal(batch.labels, pil_batch.labels)
    diff = np.abs(batch.images.astype(int) - pil_batch.images.astype(int))
    assert diff.mean() < 2.0


def test_native_trainer_val_geometry_matches_pil(smooth_images):
    """Separate resize/crop targets: the native direct center crop must match
    the PIL trainer-val path (over-resize 1.15x then crop) without the 1px
    shift a composed double-crop would introduce on odd remainders."""
    from deepfakedetection_tpu.data.transforms import build_eval_plan

    jpg, png = smooth_images
    plan = build_eval_plan(96, trainer_val=True)
    assert plan.resize_size == 128
    for path in (jpg, png):
        pil = decode_eval(path, plan)
        nat, status = native.decode_batch([path], 96, resize_target=128)
        assert status[0] == 0
        assert nat[0].shape == pil.shape == (96, 96, 3)
        diff = np.abs(pil.astype(int) - nat[0].astype(int))
        assert diff.mean() < 2.0, diff.mean()


def test_buffer_batch_matches_file_batch(smooth_images, tmp_path):
    """decode_buffer_batch (tar-shard path) must be byte-identical to
    decode_batch over the same images, incl. the trainer-val over-resize
    geometry; corrupt buffers report per-image status."""
    if not native.has_buffer_batch():
        pytest.skip("library built without dfd_decode_buffer_batch_rc")
    jpg, png = smooth_images
    buffers = [jpg.read_bytes(), png.read_bytes()]
    for resize in (64, 80):  # direct square + over-resize-then-crop
        by_file, st_f = native.decode_batch(
            [jpg, png], 64, n_threads=2, resize_target=resize
        )
        by_buf, st_b = native.decode_buffer_batch(
            buffers, 64, n_threads=2, resize_target=resize
        )
        assert (st_f == 0).all() and (st_b == 0).all()
        np.testing.assert_array_equal(by_file, by_buf)
    out, status = native.decode_buffer_batch(
        [buffers[0], b"not an image"], 64, n_threads=2
    )
    assert status[0] == 0 and status[1] != 0
    assert (out[1] == 0).all()  # failed slot zero-filled


def test_shard_loader_native_buffer_batch(tiny_image_tree, tmp_path):
    """Eval over tar shards with the native backend serves identical batches
    to the loose-file native path (the loader's buffer-batch branch)."""
    from deepfakedetection_tpu.data.pipeline import make_eval_loader
    from deepfakedetection_tpu.data.shards import write_shards

    if not native.has_buffer_batch():
        pytest.skip("library built without dfd_decode_buffer_batch_rc")
    folder = scan_image_folder(tiny_image_tree / "val")
    write_shards(folder, tmp_path / "val", images_per_shard=5)
    shards = scan_image_folder(tmp_path / "val")
    plan = build_eval_plan(32)
    a = list(make_eval_loader(folder, plan, batch_size=4, use_native=True))
    b = list(make_eval_loader(shards, plan, batch_size=4, use_native=True))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.images, bb.images)
        np.testing.assert_array_equal(ba.labels, bb.labels)
        np.testing.assert_array_equal(ba.mask, bb.mask)


def test_scaled_decode_opt_in_and_fidelity(smooth_images):
    """Round 4: DCT-scaled JPEG decode is OPT-IN; the full-res default must
    sit closer to PIL than the scaled chain on the same image."""
    jpg, _ = smooth_images
    pil = decode_eval(jpg, build_eval_plan(96)).astype(int)
    default = native.decode_image(jpg, 96).astype(int)  # full-res default
    native.set_scaled_decode(True)
    try:
        scaled = native.decode_image(jpg, 96).astype(int)
    finally:
        native.set_scaled_decode(False)
    d_full = np.abs(pil - default).mean()
    d_scaled = np.abs(pil - scaled).mean()
    assert d_full <= d_scaled
    assert d_full < 0.5  # sub-LSB against PIL in the faithful default
