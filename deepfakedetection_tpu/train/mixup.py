"""On-device Mixup / CutMix batch augmentation (TPU training extension).

The reference trains without batch mixing; this is an opt-in addition
(``training.mixup_alpha`` / ``training.cutmix_alpha``, both off by default)
following the standard timm Mixup semantics:

- one lambda per batch, drawn Beta(alpha, alpha);
- the partner example is the batch rolled by one (a fixed derangement —
  equivalent in expectation to a random permutation and free of the
  device-side permutation gather);
- when both modes are enabled, each batch picks CutMix with probability
  ``switch_prob`` (0.5, timm default);
- CutMix cuts a centered-at-random box of area (1-lam) and corrects lam to
  the exact pasted fraction;
- the loss becomes ``lam * CE(y) + (1-lam) * CE(roll(y))`` — int labels
  throughout, no soft-target plumbing.

All of it runs inside the jitted train step (static shapes, one Beta draw,
iota-mask box), so the device cost is one extra elementwise blend of the
input batch. Train loaders drop the last partial batch (pipeline.py), so
mixing never touches padded rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MixupSpec:
    mixup_alpha: float = 0.0  # 0 = mode disabled
    cutmix_alpha: float = 0.0
    switch_prob: float = 0.5  # P(cutmix) when both modes enabled

    @property
    def enabled(self) -> bool:
        return self.mixup_alpha > 0.0 or self.cutmix_alpha > 0.0


def _beta(key, alpha: float) -> jnp.ndarray:
    return jax.random.beta(key, alpha, alpha, dtype=jnp.float32)


def _cut_box_mask(key, height: int, width: int, lam: jnp.ndarray) -> jnp.ndarray:
    """[H, W] float mask: 1 inside the cut box (area ≈ 1-lam), 0 outside."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * height).astype(jnp.int32)
    cut_w = (ratio * width).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, height)
    cx = jax.random.randint(kx, (), 0, width)
    y0 = jnp.clip(cy - cut_h // 2, 0, height)
    y1 = jnp.clip(cy + (cut_h + 1) // 2, 0, height)
    x0 = jnp.clip(cx - cut_w // 2, 0, width)
    x1 = jnp.clip(cx + (cut_w + 1) // 2, 0, width)
    yy = jnp.arange(height)[:, None]
    xx = jnp.arange(width)[None, :]
    return (((yy >= y0) & (yy < y1)) & ((xx >= x0) & (xx < x1))).astype(jnp.float32)


def mix_batch(key, images: jnp.ndarray, spec: MixupSpec):
    """Mix an NHWC batch with its roll-by-one partner.

    Returns ``(mixed_images, lam)`` where the effective target is
    ``lam * labels + (1-lam) * roll(labels, 1)``. ``lam`` is a f32 scalar.
    """
    k_mode, k_lam, k_box = jax.random.split(key, 3)
    partner = jnp.roll(images, shift=1, axis=0)
    h, w = images.shape[1], images.shape[2]

    def mixup(_):
        lam = _beta(k_lam, spec.mixup_alpha)
        lam_c = lam.astype(images.dtype)
        return images * lam_c + partner * (1.0 - lam_c), lam

    def cutmix(_):
        lam = _beta(k_lam, spec.cutmix_alpha)
        box = _cut_box_mask(k_box, h, w, lam)
        # exact pasted fraction (box clipping changes the area)
        lam_adj = 1.0 - box.sum() / (h * w)
        box_c = box[None, :, :, None].astype(images.dtype)
        return images * (1.0 - box_c) + partner * box_c, lam_adj

    if spec.mixup_alpha > 0.0 and spec.cutmix_alpha > 0.0:
        use_cutmix = jax.random.bernoulli(k_mode, spec.switch_prob)
        return jax.lax.cond(use_cutmix, cutmix, mixup, None)
    if spec.cutmix_alpha > 0.0:
        return cutmix(None)
    return mixup(None)
