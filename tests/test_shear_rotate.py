"""3-shear Pallas rotation vs the reference gather warp (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.data.augment import _affine_sample
from deepfakedetection_tpu.ops.pallas.shear_rotate import rotate_batch


def _reference_rotate(img: np.ndarray, theta: float) -> np.ndarray:
    """Rotation-only through the existing gather warp (crop = identity)."""
    S = img.shape[0]
    params = jnp.asarray(
        [0.0, 0.0, 1.0, 1.0, np.cos(theta), np.sin(theta), 1.0], jnp.float32
    )
    return np.asarray(_affine_sample(jnp.asarray(img, jnp.float32), params, S))


def test_shear_rotation_matches_gather_warp_interior():
    rng = np.random.default_rng(0)
    S = 64
    # smooth image (bilinear-vs-two-pass differences are tiny on smooth data)
    y, x = np.mgrid[0:S, 0:S]
    img = np.stack(
        [np.sin(x / 7.0) * np.cos(y / 9.0), (x + y) / (2 * S), np.cos(x / 5.0)],
        axis=-1,
    ).astype(np.float32)

    for theta in (-0.15, -0.05, 0.08, 0.17):
        got = np.asarray(
            rotate_batch(
                jnp.asarray(img)[None], jnp.asarray([-theta]), interpret=True
            )
        )[0]
        want = _reference_rotate(img, theta)
        # compare away from the zero-filled borders
        m = 14
        diff = np.abs(got[m:-m, m:-m] - want[m:-m, m:-m])
        assert diff.mean() < 0.02, f"theta={theta}: mean diff {diff.mean()}"
        assert diff.max() < 0.15, f"theta={theta}: max diff {diff.max()}"


def test_large_angle_raises_and_augment_falls_back():
    """30° exceeds the shear kernel's validity bound: the kernel must
    refuse, and augment_batch must route such plans to the gather path."""
    import pytest

    from deepfakedetection_tpu.data import augment
    from deepfakedetection_tpu.data.transforms import build_train_plan

    img = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="0.45"):
        rotate_batch(
            jnp.asarray(img), jnp.asarray([0.5]), max_theta=0.52, interpret=True
        )

    plan30 = build_train_plan(
        32,
        {"train_random_rotation": True, "train_rotation_degrees": 30.0},
    )
    assert plan30.rotation_degrees == 30.0
    # dispatch: 30° must NOT take the shear kernel even when enabled
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 255, (2, 37, 37, 3), dtype=np.uint8)
    out = augment.augment_batch(
        jnp.asarray(u8), jax.random.key(0), plan30, out_dtype=jnp.float32
    )
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_angle_is_identity():
    rng = np.random.default_rng(1)
    img = rng.random((2, 40, 48, 3)).astype(np.float32)
    out = np.asarray(
        rotate_batch(jnp.asarray(img), jnp.zeros((2,)), interpret=True)
    )
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_batch_of_distinct_angles():
    rng = np.random.default_rng(2)
    img = rng.random((3, 32, 32, 3)).astype(np.float32)
    thetas = jnp.asarray([0.1, -0.1, 0.0])
    out = np.asarray(rotate_batch(jnp.asarray(img), thetas, interpret=True))
    # third image unrotated, first two differ from input and from each other
    np.testing.assert_allclose(out[2], img[2], atol=1e-5)
    assert not np.allclose(out[0], img[0])
    assert not np.allclose(out[0], out[1])


def test_interior_brightness_preserved_at_bound_angles():
    """A constant image must stay constant in the interior after rotation —
    the 3-tap scheme lost up to 13% of the tap weight at 10° on the y-shear
    (span sin(10°)*7 > 1px), darkening rows near block edges."""
    S = 64
    ones = np.ones((1, S, S, 3), np.float32)
    for deg in (10.0, 13.7, 16.0):
        theta = np.radians(deg)
        out = np.asarray(
            rotate_batch(
                jnp.asarray(ones), jnp.asarray([theta]),
                max_theta=float(theta), interpret=True,
            )
        )[0]
        m = 18  # clear of the zero-filled corners
        interior = out[m:-m, m:-m]
        assert interior.min() > 0.999, f"{deg}°: min {interior.min():.4f}"
        assert interior.max() < 1.001
