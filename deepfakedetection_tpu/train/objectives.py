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
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean label-smoothed softmax CE over valid rows. logits f32 [B,C].

    ``class_weights`` (TPU extension, ``training.class_weights`` — the
    reference trains unweighted) scales each row by the weight of its
    TARGET class with weighted-mean normalization, i.e. torch
    ``CrossEntropyLoss(weight=w)`` reduction semantics:
    ``sum(w[y_i]·l_i) / sum(w[y_i])`` over valid rows.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    smooth = jax.nn.one_hot(labels, num_classes) * (1.0 - label_smoothing)
    smooth = smooth + label_smoothing / num_classes
    losses = optax.softmax_cross_entropy(logits, smooth)
    row_w = (
        jnp.asarray(class_weights, jnp.float32)[labels]
        if class_weights is not None
        else jnp.ones_like(losses)
    )
    if mask is not None:
        row_w = row_w * mask.astype(jnp.float32)
    return jnp.sum(losses * row_w) / jnp.maximum(jnp.sum(row_w), 1e-6)


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
