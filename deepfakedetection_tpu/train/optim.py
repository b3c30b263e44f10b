"""Optimizer construction: AdamW phases, cosine schedule, freeze masks.

Reproduces the reference regime (SURVEY.md §2.3d) the optax way:
- warmup phase: fresh AdamW(lr=3e-4, wd=5e-2) over HEAD params only
  (reference: trainers/efficientnet.py:435-440)
- fine-tune phase: fresh AdamW(lr=1e-4, wd=5e-2) over unfrozen params with
  CosineAnnealingLR(T_max=epochs-1) stepped per epoch (efficientnet.py:492)
- freezing is an optax.multi_transform with set_to_zero on frozen leaves —
  the functional analogue of requires_grad=False.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import jax
import optax


def param_path_strings(params) -> list[str]:
    """Flatten a param pytree into '/'-joined path strings (stable order)."""
    paths = []
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        paths.append("/".join(str(n) for n in names))
    return paths


def trainable_labels(
    params, predicate: Callable[[str], bool]
) -> tuple[object, int, int]:
    """Label tree for optax.multi_transform: 'train' where predicate(path)."""
    treedef = jax.tree_util.tree_flatten_with_path(params)[1]
    labels_flat = [
        "train" if predicate(p) else "freeze" for p in param_path_strings(params)
    ]
    n_train = labels_flat.count("train")
    labels = jax.tree_util.tree_unflatten(treedef, labels_flat)
    return labels, n_train, len(labels_flat)


def head_predicate(substrings: tuple[str, ...]) -> Callable[[str], bool]:
    """Match by name substring, like the reference's '_fc'/'head' selection
    (efficientnet.py:435-437, fastervit.py:400-402).

    NOTE: bare-substring semantics are load-bearing parity — the reference's
    EFv2 warmup predicate ``"head" in name`` also matches timm's
    ``talking_head1/2`` convs in every stage (efficientformer_v2.py:352), so
    those train during "head-only" warmup there too. Don't "fix" this to
    path-component matching without breaking regime parity.
    """
    subs = tuple(s.lower() for s in substrings)
    return lambda path: any(s in path.lower() for s in subs)


def unfreeze_predicate(policy) -> Callable[[str], bool]:
    """'all', or a tuple of name substrings (UNFREEZE_KEYS semantics,
    reference efficientformer_v2.py:66-74,390-393 — see head_predicate's
    note on substring parity)."""
    if policy == "all":
        return lambda path: True
    if isinstance(policy, str):
        # a bare string is one substring — tuple(str) would silently iterate
        # characters and match (and thus unfreeze) nearly everything
        policy = (policy,)
    subs = tuple(s.lower() for s in policy)
    return lambda path: any(s in path.lower() for s in subs)


def epoch_cosine_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int
) -> optax.Schedule:
    """CosineAnnealingLR(T_max=epochs-1) stepped once per EPOCH, expressed as
    a per-step schedule: lr(step) = base * (1+cos(pi*epoch/T_max))/2."""
    t_max = max(epochs - 1, 1)

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.minimum(step // max(steps_per_epoch, 1), t_max)
        return base_lr * 0.5 * (1.0 + jnp.cos(math.pi * epoch / t_max))

    return schedule


def make_phase_optimizer(
    params,
    *,
    lr: float | optax.Schedule,
    weight_decay: float,
    trainable: Callable[[str], bool],
    accum_steps: int = 1,
    grad_clip_norm: float | None = None,
) -> tuple[optax.GradientTransformation, int, int]:
    """AdamW over params selected by ``trainable``; others get zero updates.

    Returns (tx, n_trainable_leaves, n_total_leaves). ``accum_steps > 1``
    wraps in optax.MultiSteps (micro-batch gradient accumulation; the
    reference divides loss by accum_steps and steps every Nth micro-batch,
    efficientnet.py:296-331 — MultiSteps averages, same effective update).
    ``grad_clip_norm`` prepends global-norm clipping (TPU extension, off by
    default = reference behavior; the reference has no clipping).
    """
    labels, n_train, n_total = trainable_labels(params, trainable)
    adamw = optax.adamw(learning_rate=lr, weight_decay=weight_decay)
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )
    if grad_clip_norm is not None:
        # clip BEFORE the freeze partition (the norm is over the full grad
        # tree; frozen leaves are zeroed afterwards anyway)
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps).gradient_transformation()
    return tx, n_train, n_total
