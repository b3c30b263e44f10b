"""Persistent XLA compilation cache.

TPU compiles of the full train step take minutes; the reference pays the
cuDNN-autotune equivalent on every process start. We persist serialized
executables so repeated runs (resume, inference after training, bench
reruns) skip compilation entirely.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = Path(
        cache_dir
        or os.environ.get("DFD_COMPILE_CACHE")
        or Path.home() / ".cache" / "deepfakedetection_tpu" / "xla_cache"
    )
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # pragma: no cover - older jax
        pass
