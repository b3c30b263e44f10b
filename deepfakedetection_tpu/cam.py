"""Grad-CAM on device via jax.grad.

Replaces the reference's hook-based pytorch_grad_cam pipeline
(reference: web_ui.py:275-283) with a functional equivalent: every model
sow()s its final conv feature map ('intermediates'/cam_features — the analogue
of targeting ``_conv_head`` / the last Conv2d, web_ui.py:96-114), and the CAM
weights come from ``jax.grad`` of the class score with respect to that map.
The classifier head is replayed from the param tree (pooling + dense), so the
backward pass never crosses a convolution.

Overlay/colormap semantics match pytorch_grad_cam's ``show_cam_on_image``:
jet heatmap, 0.5/0.5 blend, joint renormalization by the max.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def head_logits(params: dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """Replay the classifier head: global-avg-pool → dense(s).

    Handles the three model families: 'classifier' (EfficientNet), 'head'
    (FasterViT / tiny models), 'head'+'head_dist' averaged (EfficientFormerV2).
    """
    pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))

    def dense(name: str) -> jnp.ndarray:
        p = params[name]
        return pooled @ p["kernel"].astype(jnp.float32) + p["bias"].astype(jnp.float32)

    if "classifier" in params:
        return dense("classifier")
    if "head" in params and "head_dist" in params:
        return (dense("head") + dense("head_dist")) / 2.0
    if "head" in params:
        return dense("head")
    raise KeyError("no classifier head found in params (classifier/head)")


def compute_cam(
    model,
    params: dict[str, Any],
    batch_stats: dict[str, Any],
    x: jnp.ndarray,
    cls_idx: int | jnp.ndarray,
) -> jnp.ndarray:
    """Grayscale CAM [B, H, W] in [0,1] at the input resolution.

    GradCAM weights: spatial mean of ∂score/∂A per channel; map:
    ReLU(Σ_c w_c A_c), then min-max normalized per image and THEN
    bilinear-resized to the input size — pytorch_grad_cam's
    ``scale_cam_image`` order (normalize before resize; the round-5
    two-implementation check in tests/torch_refs/gradcam_torch.py pins
    this order — resize-then-normalize differs by up to a few percent
    where the resize smooths the extrema).
    """
    _, inter = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=False,
        mutable=["intermediates"],
    )
    leaves = jax.tree.leaves(inter.get("intermediates", {}))
    if not leaves:
        raise ValueError(
            f"Grad-CAM needs the model to sow('intermediates', 'cam_features', "
            f"<last conv map>); {type(model).__name__} sowed nothing. Registry "
            "models do this in their final BatchNorm block — custom models "
            "must add the sow call (analogue of the reference's last-Conv2d "
            "fallback, web_ui.py:96-105)."
        )
    feats = leaves[0].astype(jnp.float32)
    if feats.ndim != 4:
        raise ValueError(
            f"cam_features must be a [B,H,W,C] feature map, got shape "
            f"{feats.shape}"
        )

    def score(f):
        logits = head_logits(params, f)
        return jnp.sum(logits[jnp.arange(logits.shape[0]), cls_idx])

    grads = jax.grad(score)(feats)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * feats, axis=-1))  # [B, h, w]
    # pytorch_grad_cam scale_cam_image: shift to 0, divide by (1e-7 + max),
    # THEN resize to the input size
    cam = cam - cam.min(axis=(1, 2), keepdims=True)
    cam = cam / (1e-7 + cam.max(axis=(1, 2), keepdims=True))
    B = cam.shape[0]
    return jax.image.resize(cam, (B, x.shape[1], x.shape[2]), method="bilinear")


def jet_colormap(gray: np.ndarray) -> np.ndarray:
    """OpenCV-style JET colormap: [H,W] in [0,1] → [H,W,3] float RGB in [0,1]."""
    g = np.clip(gray, 0.0, 1.0)
    v = 4.0 * g
    r = np.clip(np.minimum(v - 1.5, -v + 4.5), 0.0, 1.0)
    gch = np.clip(np.minimum(v - 0.5, -v + 3.5), 0.0, 1.0)
    b = np.clip(np.minimum(v + 0.5, -v + 2.5), 0.0, 1.0)
    return np.stack([r, gch, b], axis=-1).astype(np.float32)


def show_cam_on_image(
    rgb: np.ndarray, cam: np.ndarray, image_weight: float = 0.5
) -> np.ndarray:
    """Overlay (pytorch_grad_cam semantics): blend then renormalize by max."""
    heatmap = jet_colormap(cam)
    overlay = (1.0 - image_weight) * heatmap + image_weight * rgb
    overlay = overlay / max(float(overlay.max()), 1e-7)
    return np.uint8(255 * overlay)


def denormalize_to_rgb(
    x: np.ndarray, mean: tuple[float, ...], std: tuple[float, ...], *, normalize: bool
) -> np.ndarray:
    """[H,W,3] normalized float → RGB float in [0,1]
    (reference _tensor_to_rgb, web_ui.py:72-93)."""
    arr = np.asarray(x, np.float32)
    if normalize:
        arr = arr * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return np.clip(arr, 0.0, 1.0)
