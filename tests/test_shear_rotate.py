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
