"""Determinism plumbing.

The reference seeds python/numpy/torch and forces cudnn determinism
(reference: orchestration/train_env.py:203-213). The TPU equivalent is
simpler: JAX programs are deterministic given a PRNG key; we seed python and
numpy for host-side shuffling/augmentation bookkeeping and derive all device
randomness from one root ``jax.random.key(seed)``.
"""

from __future__ import annotations

import random

import numpy as np


def apply_seed(seed: int | None) -> None:
    """Seed host-side RNGs. No-op when seed is None (matches reference)."""
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def root_key(seed: int | None):
    """Root JAX PRNG key; seed=None falls back to 0 (documented delta: the
    reference leaves RNG unseeded in that case, JAX has no 'unseeded' mode)."""
    import jax

    return jax.random.key(0 if seed is None else int(seed))
