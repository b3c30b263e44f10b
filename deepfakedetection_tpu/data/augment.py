"""Fused on-device augmentation (one jitted program per transform plan).

The reference runs torchvision CPU transforms inside DataLoader workers
(reference: trainers/efficientnet.py:150-209). Here the host only decodes to
a fixed square canvas; ALL randomized work — crop, flip, rotation, color
jitter, normalize, erasing — happens on device in one fused XLA program per
(plan, shape): uint8 canvases stream over PCIe/ICI once, and the whole stack
is a handful of HBM passes instead of per-op PIL round trips.

TPU geometry strategy (PARITY.md §14): per-pixel gathers are pathological on
the VPU, so

- axis-aligned crop/resize/flip runs as TWO batched matmuls against
  triangle-filter interpolation matrices (antialiased, PIL-like) — pure MXU
  work (``_separable_warp``)
- rotation uses the Paeth 3-shear Pallas kernel on the canvas BEFORE the
  crop (ops/pallas/shear_rotate.py) when the angle is within its 3-tap
  validity bound (~13.7°) and a TPU backend is active
- otherwise (CPU tests, large angles) the crop+flip+rotation compose into a
  single exact bilinear gather warp (``_affine_sample``) — one resample, so
  quality matches the fused path (documented delta: torchvision rotates the
  cropped output; we rotate the canvas then crop — same distribution for
  symmetric angles and random crops).

Augmentation order matches the reference Compose: geometry → color jitter
(fixed order brightness→contrast→saturation→hue; torchvision shuffles — see
PARITY.md §4) → normalize → random erasing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from deepfakedetection_tpu.data.transforms import TrainTransformPlan

# ---------------------------------------------------------------------------
# normalize
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("plan", "out_dtype"))
def normalize_batch(images, plan, out_dtype=jnp.float32):
    """uint8 [B,S,S,3] (or float in [0,1]) → normalized ``out_dtype``.

    ``(x/255 - mean) / std`` with ImageNet stats, matching the reference's
    ToTensor+Normalize (efficientnet.py:122-125, orchestrator.py:344)."""
    x = images.astype(jnp.float32)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x * (1.0 / 255.0)
    if plan.normalize:
        mean = jnp.asarray(plan.mean, jnp.float32)
        std = jnp.asarray(plan.std, jnp.float32)
        x = (x - mean) / std
    return x.astype(out_dtype)


# ---------------------------------------------------------------------------
# geometry: separable matmul warp (axis-aligned) and exact gather warp
# ---------------------------------------------------------------------------
# Shared 7-float parameter layout per image:
#   [ty, tx, sy, sx, cos, sin, flip]
# Crop window mapping (torchvision center convention):
#   src = t + (dst + 0.5) * s - 0.5, with the x output order reversed when
#   flip < 0. cos/sin rotate about the CANVAS center (gather path only; the
#   separable warp requires cos=1, sin=0).


def _axis_weights(centers: jnp.ndarray, scale: jnp.ndarray, size: int) -> jnp.ndarray:
    """Triangle-filter interpolation matrix rows.

    centers: [B, out] source-space sample centers; scale: [B, 1] source px per
    output px. Returns [B, out, size] normalized weights. support widens to
    the scale on downscale (antialiasing) — PIL/torchvision Resize behavior.
    """
    support = jnp.maximum(1.0, scale)[:, :, None]  # [B,1,1]
    src = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    d = jnp.abs(src - centers[:, :, None]) / support
    w = jnp.maximum(0.0, 1.0 - d)
    return w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def _separable_warp(imgs: jnp.ndarray, params: jnp.ndarray, out_size: int):
    """Axis-aligned crop/resize/flip as two batched MXU matmuls.

    imgs: [B, H, W, C] float; params: [B, 7] (cos/sin ignored — rotation is
    handled by the shear kernel or the gather path). Returns
    [B, out_size, out_size, C].
    """
    B, H, W, C = imgs.shape
    ty, tx, sy, sx = params[:, 0], params[:, 1], params[:, 2], params[:, 3]
    flip = params[:, 6]
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # [1,out]
    xo = jnp.where(flip[:, None] > 0, o, out_size - 1 - o)
    yc = ty[:, None] + (o + 0.5) * sy[:, None] - 0.5
    xc = tx[:, None] + (xo + 0.5) * sx[:, None] - 0.5
    wy = _axis_weights(yc, sy[:, None], H)  # [B,out,H]
    wx = _axis_weights(xc, sx[:, None], W)  # [B,out,W]
    tmp = jnp.einsum("boh,bhwc->bowc", wy, imgs)
    return jnp.einsum("bpw,bowc->bopc", wx, tmp)


@functools.partial(jax.jit, static_argnames=("out_size",))
def _affine_sample(img: jnp.ndarray, params: jnp.ndarray, out_size: int):
    """Exact per-pixel bilinear warp of ONE image, zero fill outside.

    Composes crop window + flip + rotation about the canvas center into a
    single resample. This is the CPU fallback / large-angle path; on TPU the
    batched matmul + shear-kernel pipeline covers the hot configurations.
    """
    H, W, C = img.shape
    ty, tx, sy, sx, cos, sin, flip = (params[i] for i in range(7))
    o = jnp.arange(out_size, dtype=jnp.float32)
    xo = jnp.where(flip > 0, o, out_size - 1 - o)
    ycrop = ty + (o + 0.5) * sy - 0.5  # [out]
    xcrop = tx + (xo + 0.5) * sx - 0.5  # [out]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    u = xcrop[None, :] - cx  # [1,out]
    v = ycrop[:, None] - cy  # [out,1]
    xs = cx + cos * u + sin * v  # [out,out]
    ys = cy - sin * u + cos * v
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def tap(yi, xi, wgt):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc_ = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = img[yc, xc_]  # [out,out,C]
        return vals * (wgt * inb.astype(jnp.float32))[:, :, None]

    out = (
        tap(y0, x0, (1 - fy) * (1 - fx))
        + tap(y0, x0 + 1, (1 - fy) * fx)
        + tap(y0 + 1, x0, fy * (1 - fx))
        + tap(y0 + 1, x0 + 1, fy * fx)
    )
    return out


# ---------------------------------------------------------------------------
# randomized parameter sampling
# ---------------------------------------------------------------------------


def _sample_crop(key, plan: TrainTransformPlan, B: int, H: int, W: int):
    """Per-image crop window (ty, tx, sy, sx) in canvas coordinates."""
    S = plan.img_size
    if plan.small_images:
        if plan.random_crop:
            ky, kx = jax.random.split(key)
            ty = jax.random.randint(ky, (B,), 0, max(H - S, 0) + 1).astype(jnp.float32)
            tx = jax.random.randint(kx, (B,), 0, max(W - S, 0) + 1).astype(jnp.float32)
        elif plan.center_crop:
            ty = jnp.full((B,), (H - S) // 2, jnp.float32)
            tx = jnp.full((B,), (W - S) // 2, jnp.float32)
        else:
            ty = tx = jnp.zeros((B,), jnp.float32)
        one = jnp.ones((B,), jnp.float32)
        return ty, tx, one, one
    if plan.random_resized_crop:
        ka, kr, ky, kx = jax.random.split(key, 4)
        area = H * W * jax.random.uniform(
            ka, (B,), minval=plan.rrc_scale[0], maxval=plan.rrc_scale[1]
        )
        log_r = jax.random.uniform(
            kr, (B,),
            minval=math.log(plan.rrc_ratio[0]), maxval=math.log(plan.rrc_ratio[1]),
        )
        ratio = jnp.exp(log_r)
        # clamp oversize candidates instead of torchvision's 10-try loop
        # (PARITY.md §5) — with scale (0.9, 1.0) clamping is rarely active
        cw = jnp.minimum(jnp.sqrt(area * ratio), float(W))
        ch = jnp.minimum(jnp.sqrt(area / ratio), float(H))
        ty = jax.random.uniform(ky, (B,)) * (H - ch)
        tx = jax.random.uniform(kx, (B,)) * (W - cw)
        return ty, tx, ch / S, cw / S
    # fallback: deterministic center crop from the canvas (the host already
    # resized shorter-side to the canvas = the reference's resize target)
    ty = jnp.full((B,), (H - S) / 2.0, jnp.float32)
    tx = jnp.full((B,), (W - S) / 2.0, jnp.float32)
    one = jnp.ones((B,), jnp.float32)
    return ty, tx, one, one


def _color_jitter(x, key, plan: TrainTransformPlan):
    """brightness→contrast→saturation→hue in fixed order on [0,1] floats."""
    b, c, s, h = plan.jitter
    kb, kc, ks, kh = jax.random.split(key, 4)
    B = x.shape[0]

    def gray(img):
        w = jnp.asarray([0.2989, 0.587, 0.114], jnp.float32)
        return (img * w).sum(axis=-1, keepdims=True)

    if b > 0:
        fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=max(0.0, 1 - b), maxval=1 + b)
        x = jnp.clip(x * fb, 0.0, 1.0)
    if c > 0:
        fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=max(0.0, 1 - c), maxval=1 + c)
        m = gray(x).mean(axis=(1, 2), keepdims=True)
        x = jnp.clip((x - m) * fc + m, 0.0, 1.0)
    if s > 0:
        fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=max(0.0, 1 - s), maxval=1 + s)
        g = gray(x)
        x = jnp.clip((x - g) * fs + g, 0.0, 1.0)
    if h > 0:
        # hue rotation in YIQ space (linear approximation of HSV hue shift)
        fh = jax.random.uniform(kh, (B,), minval=-h, maxval=h) * 2.0 * jnp.pi
        to_yiq = jnp.asarray(
            [[0.299, 0.587, 0.114],
             [0.5959, -0.2746, -0.3213],
             [0.2115, -0.5227, 0.3112]], jnp.float32,
        )
        from_yiq = jnp.linalg.inv(to_yiq)
        yiq = jnp.einsum("bhwc,dc->bhwd", x, to_yiq)
        cos_h = jnp.cos(fh)[:, None, None]
        sin_h = jnp.sin(fh)[:, None, None]
        i, q = yiq[..., 1], yiq[..., 2]
        yiq = jnp.stack(
            [yiq[..., 0], i * cos_h - q * sin_h, i * sin_h + q * cos_h], axis=-1
        )
        x = jnp.clip(jnp.einsum("bhwd,cd->bhwc", yiq, from_yiq), 0.0, 1.0)
    return x


def _random_erasing(x, key, plan: TrainTransformPlan):
    """torchvision RandomErasing(p, scale, ratio, value=0) applied AFTER
    normalize (efficientnet.py:186-193); oversize rectangles clamp."""
    B, S = x.shape[0], x.shape[1]
    kp, ka, kr, ky, kx = jax.random.split(key, 5)
    apply = jax.random.uniform(kp, (B,)) < plan.erasing_p
    area = S * S * jax.random.uniform(
        ka, (B,), minval=plan.erasing_scale[0], maxval=plan.erasing_scale[1]
    )
    ratio = jnp.exp(
        jax.random.uniform(
            kr, (B,),
            minval=math.log(plan.erasing_ratio[0]),
            maxval=math.log(plan.erasing_ratio[1]),
        )
    )
    he = jnp.minimum(jnp.round(jnp.sqrt(area * ratio)), S)
    we = jnp.minimum(jnp.round(jnp.sqrt(area / ratio)), S)
    top = jnp.floor(jax.random.uniform(ky, (B,)) * (S - he + 1))
    left = jnp.floor(jax.random.uniform(kx, (B,)) * (S - we + 1))
    rows = jnp.arange(S, dtype=jnp.float32)[None, :, None]  # [1,S,1]
    cols = jnp.arange(S, dtype=jnp.float32)[None, None, :]  # [1,1,S]
    inside = (
        (rows >= top[:, None, None]) & (rows < (top + he)[:, None, None])
        & (cols >= left[:, None, None]) & (cols < (left + we)[:, None, None])
    )
    erase = inside & apply[:, None, None]
    return jnp.where(erase[..., None], 0.0, x)


# ---------------------------------------------------------------------------
# the fused pipeline
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("plan", "out_dtype", "rotation_mode")
)
def _augment_jit(images, key, plan: TrainTransformPlan, out_dtype, rotation_mode):
    B, H, W, _ = images.shape
    S = plan.img_size
    k_crop, k_flip, k_rot, k_jit, k_erase = jax.random.split(key, 5)

    x = images.astype(jnp.float32)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x * (1.0 / 255.0)

    ty, tx, sy, sx = _sample_crop(k_crop, plan, B, H, W)
    if plan.horizontal_flip:
        flip = jnp.where(jax.random.bernoulli(k_flip, 0.5, (B,)), -1.0, 1.0)
    else:
        flip = jnp.ones((B,), jnp.float32)

    max_rad = math.radians(plan.rotation_degrees)
    thetas = jax.random.uniform(k_rot, (B,), minval=-max_rad, maxval=max_rad)

    if rotation_mode == "shear":
        from deepfakedetection_tpu.ops.pallas.shear_rotate import rotate_batch

        # bf16 planes through the three shear passes: halves the kernel's
        # HBM traffic (the kernel still blends in f32 internally). The two
        # intermediate quantizations add ~0.004 noise on unit-scale pixels —
        # below the reference pipeline's own uint8 rounding between PIL
        # transforms (1/255 per op), so augmentation parity is unaffected.
        x = rotate_batch(x.astype(jnp.bfloat16), thetas, max_theta=max_rad).astype(
            jnp.float32
        )
        params = jnp.stack(
            [ty, tx, sy, sx, jnp.ones((B,)), jnp.zeros((B,)), flip], axis=1
        )
        x = _separable_warp(x, params, S)
    elif rotation_mode == "gather":
        params = jnp.stack(
            [ty, tx, sy, sx, jnp.cos(thetas), jnp.sin(thetas), flip], axis=1
        )
        x = jax.vmap(lambda im, p: _affine_sample(im, p, S))(x, params)
    else:  # no rotation: pure matmul warp
        params = jnp.stack(
            [ty, tx, sy, sx, jnp.ones((B,)), jnp.zeros((B,)), flip], axis=1
        )
        x = _separable_warp(x, params, S)

    if plan.color_jitter:
        x = _color_jitter(x, k_jit, plan)
    if plan.normalize:
        mean = jnp.asarray(plan.mean, jnp.float32)
        std = jnp.asarray(plan.std, jnp.float32)
        x = (x - mean) / std
    if plan.random_erasing:
        x = _random_erasing(x, k_erase, plan)
    return x.astype(out_dtype)


# the 3-tap shear kernel's validity bound (ops/pallas/shear_rotate.py:106-126)
_SHEAR_MAX_DEG = 13.7


def augment_batch(images, key, plan: TrainTransformPlan, out_dtype=jnp.float32):
    """Fused train augmentation: [B, canvas, canvas, 3] uint8 → normalized
    [B, img_size, img_size, 3] ``out_dtype``. Deterministic per ``key``."""
    if not plan.rotation:
        mode = "none"
    elif (
        plan.rotation_degrees <= _SHEAR_MAX_DEG
        and jax.default_backend() == "tpu"
    ):
        mode = "shear"
    else:
        mode = "gather"
    return _augment_jit(images, key, plan, out_dtype, mode)


__all__ = [
    "augment_batch",
    "normalize_batch",
    "_affine_sample",
    "_separable_warp",
]
