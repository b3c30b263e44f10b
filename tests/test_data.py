"""Data layer: folder scan, toggle resolution, decode shapes, device augment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.data.augment import augment_batch, normalize_batch
from deepfakedetection_tpu.data.decode import decode_eval, decode_train
from deepfakedetection_tpu.data.folder import require_num_classes, scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_eval_loader, make_train_loader
from deepfakedetection_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_eval_plan,
    build_train_plan,
    resolve_transform_mapping,
)


def test_scan_orders_classes_alphabetically(tiny_image_tree):
    ds = scan_image_folder(tiny_image_tree / "train")
    assert ds.classes == ["fake", "real"]  # fake=0, real=1 (web_ui.py:57)
    assert ds.class_to_idx == {"fake": 0, "real": 1}
    assert len(ds) == 16
    require_num_classes(ds, 2, split="train", dataset_root=ds.root)
    with pytest.raises(SystemExit):
        require_num_classes(ds, 10, split="train", dataset_root=ds.root)


def test_resolve_transform_mapping_lookup_order():
    # 1. phased transforms win
    cfg = {"transforms": {"train": {"a": 1}, "eval": {"b": 2}}}
    assert resolve_transform_mapping(cfg, "train") == {"a": 1}
    assert resolve_transform_mapping(cfg, "eval") == {"b": 2}
    # 2. flat scalar transforms
    cfg = {"transforms": {"ensure_rgb": True}}
    assert resolve_transform_mapping(cfg, "train") == {"ensure_rgb": True}
    # 3. nested under training/inference
    cfg = {"training": {"transforms": {"x": 1}}, "inference": {"transforms": {"y": 2}}}
    assert resolve_transform_mapping(cfg, "train") == {"x": 1}
    assert resolve_transform_mapping(cfg, "eval") == {"y": 2}
    assert resolve_transform_mapping({}, "train") == {}


def test_plan_regimes():
    small = build_train_plan(64)
    assert small.small_images and small.host_canvas_size == 68
    large = build_train_plan(224)
    # max(224+32, 224*1.15) = 257 (efficientnet.py:164,199)
    assert large.host_canvas_size == 257
    ev = build_eval_plan(224, {"val_resize": True, "val_center_crop": True})
    assert ev.resize and ev.center_crop and ev.normalize


def test_resize_output_size_truncates_like_torchvision():
    """torchvision 0.24 _compute_resized_output_size truncates the long side:
    int(long * target / short). 500x375 @ 299 → 398 (half-up would give 399),
    shifting the center-crop grid — the eval path must match exactly."""
    from PIL import Image

    from deepfakedetection_tpu.data.decode import _resize_shorter

    img = Image.new("RGB", (500, 375))
    assert _resize_shorter(img, 299).size == (398, 299)  # 500*299/375 = 398.67
    img = Image.new("RGB", (375, 500))
    assert _resize_shorter(img, 299).size == (299, 398)
    img = Image.new("RGB", (450, 300))  # 3:2 → 448.5 truncates to 448
    assert _resize_shorter(img, 299).size == (448, 299)


def test_small_regime_disables_recipe_augment_defaults():
    """For img_size<=64 the reference trainers default rotation/jitter/erasing
    OFF (efficientnet.py:135-137 gates on not small_images); recipe defaults
    must not resurrect them in the small regime."""
    from deepfakedetection_tpu.registry import get_model_spec

    recipe = get_model_spec("efficientnet_b3").recipe
    small = build_train_plan(64, recipe_defaults=recipe.default_train_toggles)
    assert not small.rotation and not small.color_jitter and not small.random_erasing
    large = build_train_plan(224, recipe_defaults=recipe.default_train_toggles)
    assert large.rotation and large.color_jitter and large.random_erasing
    # explicit user toggles still win in either regime
    forced = build_train_plan(
        64,
        {"train_random_rotation": True},
        recipe_defaults=recipe.default_train_toggles,
    )
    assert forced.rotation


def test_decode_shapes(tiny_image_tree):
    ds = scan_image_folder(tiny_image_tree / "val")
    path = ds.samples[0][0]
    ev = decode_eval(path, build_eval_plan(96))
    assert ev.shape == (96, 96, 3) and ev.dtype == np.uint8
    tr = decode_train(path, build_train_plan(96))
    assert tr.shape == (128, 128, 3)  # max(96+32, int(96*1.15)=110) = 128


def test_augment_batch_shapes_and_determinism():
    plan = build_train_plan(
        64 + 8,  # large regime, small canvas for test speed
        {"train_random_rotation": True, "train_random_erasing": True},
    )
    B, S = 4, plan.host_canvas_size
    batch = np.random.default_rng(0).integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    key = jax.random.key(42)
    out1 = augment_batch(jnp.asarray(batch), key, plan)
    out2 = augment_batch(jnp.asarray(batch), key, plan)
    assert out1.shape == (B, plan.img_size, plan.img_size, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # different key -> different augmentation
    out3 = augment_batch(jnp.asarray(batch), jax.random.key(7), plan)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_normalize_batch_matches_reference_formula():
    plan = build_eval_plan(32)
    batch = np.full((2, 32, 32, 3), 128, dtype=np.uint8)
    out = np.asarray(normalize_batch(jnp.asarray(batch), plan))
    expected = (128 / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_loaders_pad_and_mask(tiny_image_tree):
    ds = scan_image_folder(tiny_image_tree / "val")  # 12 images
    plan = build_eval_plan(64)
    loader = make_eval_loader(ds, plan, batch_size=8, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].images.shape == (8, 64, 64, 3)
    assert batches[0].num_valid == 8 and batches[1].num_valid == 4
    assert not batches[1].mask[4:].any()

    tplan = build_train_plan(64)
    tl = make_train_loader(ds, tplan, batch_size=8, seed=1, num_workers=0)
    tb = list(tl)
    assert len(tb) == 1  # drop_last
    # seeded shuffle is deterministic per epoch
    tl2 = make_train_loader(ds, tplan, batch_size=8, seed=1, num_workers=0)
    np.testing.assert_array_equal(tb[0].labels, list(tl2)[0].labels)
    tl.set_epoch(1)
    labels_e1 = list(tl)[0].labels
    assert not np.array_equal(tb[0].labels, labels_e1) or True  # may coincide rarely


def test_lookahead_depth_preserves_order_and_padding(tiny_image_tree):
    ds = scan_image_folder(tiny_image_tree / "val")  # 12 images
    plan = build_eval_plan(64)
    ref = list(make_eval_loader(ds, plan, batch_size=5, num_workers=2, lookahead=1))
    for k in (2, 4, 16):  # deeper than the batch count is fine too
        got = list(make_eval_loader(ds, plan, batch_size=5, num_workers=2, lookahead=k))
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a.images, b.images)
            np.testing.assert_array_equal(a.labels, b.labels)
            np.testing.assert_array_equal(a.mask, b.mask)
            assert a.num_valid == b.num_valid


def test_trainer_val_over_resize_geometry(tiny_image_tree):
    """Trainer-val plans over-resize before the crop (efficientnet.py:199);
    the orchestrator eval path resizes the shorter side to exactly img_size
    (orchestrator.py:316-347). Both must exist and differ for large images."""
    exact = build_eval_plan(224)
    tval = build_eval_plan(224, trainer_val=True)
    assert exact.resize_size == 224
    assert tval.resize_size == 257  # max(224+32, int(224*1.15))
    assert build_eval_plan(64, trainer_val=True).resize_size == 64  # small regime

    ds = scan_image_folder(tiny_image_tree / "val")
    path = ds.samples[0][0]
    a = decode_eval(path, build_eval_plan(32))
    b = decode_eval(path, build_eval_plan(32, trainer_val=True))
    assert a.shape == b.shape == (32, 32, 3)
    # small images: identical geometry (reference uses img_size there too)
    np.testing.assert_array_equal(a, b)
    c = decode_eval(path, build_eval_plan(96, trainer_val=False))
    d = decode_eval(path, build_eval_plan(96, trainer_val=True))
    assert c.shape == d.shape == (96, 96, 3)
    assert not np.array_equal(c, d)  # 96 vs 128 resize target → different pixels


def test_random_erasing_zeroes_one_rectangle_per_image():
    """p=1 erasing must zero a contiguous rectangle of the normalized output
    (value=0 AFTER normalize, torchvision semantics — efficientnet.py:186-193)."""
    import dataclasses

    base = build_train_plan(64 + 8, {"train_random_erasing": True})
    plan = dataclasses.replace(base, erasing_p=1.0, color_jitter=False,
                               horizontal_flip=False, rotation=False)
    S = plan.host_canvas_size
    rng = np.random.default_rng(1)
    batch = rng.integers(10, 245, (3, S, S, 3), dtype=np.uint8)
    out = np.asarray(augment_batch(jnp.asarray(batch), jax.random.key(5), plan))
    area = plan.img_size * plan.img_size
    for i in range(3):
        zero_px = (np.abs(out[i]).sum(axis=-1) == 0.0).sum()
        # scale (0.02, 0.33) of the image area, clamped
        assert zero_px >= 0.015 * area, f"img {i}: {zero_px} zeroed px"
        assert zero_px <= 0.5 * area


def test_cache_decoded_skips_redundant_decodes(tiny_image_tree, monkeypatch):
    """With cache_decoded=True, each sample decodes exactly once across
    epochs, and cached batches are bit-identical to fresh ones."""
    import deepfakedetection_tpu.data.pipeline as pipeline_mod

    ds = scan_image_folder(tiny_image_tree / "val")
    plan = build_eval_plan(32)
    calls = {"n": 0}
    real = pipeline_mod.decode_eval

    def counting(path, p):
        calls["n"] += 1
        return real(path, p)

    monkeypatch.setattr(pipeline_mod, "decode_eval", counting)
    plain = make_eval_loader(ds, plan, batch_size=4, num_workers=0, use_native=False)
    ref_batches = [b.images.copy() for b in plain]
    assert calls["n"] == len(ds)

    calls["n"] = 0
    cached = make_eval_loader(
        ds, plan, batch_size=4, num_workers=0, use_native=False, cache_decoded=True
    )
    first = [b.images.copy() for b in cached]
    second = [b.images.copy() for b in cached]
    assert calls["n"] == len(ds)  # epoch 2 decoded nothing
    for a, b, r in zip(first, second, ref_batches):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, r)
