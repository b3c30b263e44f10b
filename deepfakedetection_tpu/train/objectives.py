"""Loss and metric primitives.

Matches the reference objective: CrossEntropyLoss(label_smoothing=0.1)
(reference: trainers/efficientnet.py:412), with a validity mask so padded
batch rows (static-shape pipeline) contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    label_smoothing: float = 0.1,
) -> jnp.ndarray:
    """Mean label-smoothed softmax CE over valid rows. logits f32 [B,C]."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    smooth = jax.nn.one_hot(labels, num_classes) * (1.0 - label_smoothing)
    smooth = smooth + label_smoothing / num_classes
    losses = optax.softmax_cross_entropy(logits, smooth)
    if mask is None:
        return jnp.mean(losses)
    m = mask.astype(jnp.float32)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)


def accuracy_count(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(num_correct, num_valid) — summed, so they psum cleanly across shards."""
    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == labels)
    if mask is not None:
        correct = correct & mask
        total = jnp.sum(mask.astype(jnp.int32))
    else:
        total = jnp.asarray(labels.shape[0], jnp.int32)
    return jnp.sum(correct.astype(jnp.int32)), total
