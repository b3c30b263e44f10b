"""Environment-flag parsing shared by the kernel dispatch policies.

One definition of boolean-env truthiness ("0"/"false"/"no"/unset mean OFF —
plain string truthiness would invert them), instead of the per-module copies
that had started to drift (ADVICE r2-style reuse finding, round-3 review).
"""

from __future__ import annotations

import os

_FALSY = ("", "0", "false", "no")


def env_flag(name: str) -> bool:
    """True iff the env var is set to a non-falsy value."""
    return os.environ.get(name, "").strip().lower() not in _FALSY


def on_tpu() -> bool:
    """True iff the default JAX backend is a TPU-class device (the Pallas
    kernel dispatches gate on this; cpu/gpu take the XLA paths)."""
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False
