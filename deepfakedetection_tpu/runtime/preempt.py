"""Preemption-graceful training: SIGTERM → mid-epoch checkpoint → exact resume.

TPU production fleets preempt VMs routinely (maintenance events, spot
reclaims) and deliver SIGTERM with a short grace window. The reference's
recovery unit is the per-epoch ``latest.ckpt`` (train_env.py:254-278):
a kill mid-epoch loses the whole epoch in progress. This module adds a
TPU-production extension with no reference analogue:

- ``trap()`` installs a SIGTERM handler around training (single-process
  only — see below) that sets a flag instead of dying;
- the train loop polls ``requested()`` once per optimizer step, breaks out,
  saves ``latest.ckpt`` with the mid-epoch state, and writes a small
  ``inprogress.json`` sidecar recording how many batches of the epoch ran;
- on auto-resume, the loop re-enters the SAME epoch and skips exactly the
  completed batches. The loader order is deterministic per epoch
  (``set_epoch``) and the augmentation keys fold by the true batch index,
  so the resumed run is **bit-identical** to an uninterrupted one
  (asserted in tests/test_preempt.py).

The sidecar is a separate file rather than a new key in the checkpoint's
counters tree so that old checkpoints keep restoring unchanged (orbax
restores against an exact target structure) and mid-epoch state remains
impossible to confuse with a completed epoch: the counters in the
checkpoint itself still say "previous epoch completed".

Multiprocess runs keep the flag off: preemption of a slice delivers
SIGTERM to every host at slightly different times, and a process that
stops mid-epoch while its peers continue desyncs the collective launch
order (the same failure mode AsyncSaver guards against —
runtime/checkpoint.py). Their recovery unit stays the per-epoch collective
``latest.ckpt``.
"""

from __future__ import annotations

import json
import signal
import threading
from pathlib import Path
from typing import Any

_requested = threading.Event()


def requested() -> bool:
    """Has a graceful shutdown been requested (SIGTERM or ``request()``)?"""
    return _requested.is_set()


def request() -> None:
    """Request a graceful stop at the next step boundary (also the handler)."""
    _requested.set()


def reset() -> None:
    _requested.clear()


class trap:
    """Install SIGTERM → ``request()`` while the context is active.

    No-op (training keeps default kill semantics) when the process is
    multihost, when not on the main thread (signal.signal would raise), or
    when ``DFD_NO_PREEMPT_TRAP=1``. The previous handler is restored and
    the flag cleared on exit, so back-to-back jobs in one process (the
    orchestrator's selection loop) don't inherit a stale request.
    """

    def __enter__(self) -> "trap":
        import os

        import jax

        self._prev: Any = None
        self._installed = False
        if os.environ.get("DFD_NO_PREEMPT_TRAP", "") in ("1", "true"):
            return self
        if jax.process_count() > 1:
            return self
        if threading.current_thread() is not threading.main_thread():
            return self
        self._prev = signal.signal(signal.SIGTERM, lambda s, f: request())
        self._installed = True
        return self

    def __exit__(self, *exc: Any) -> None:
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
        reset()


# ---------------------------------------------------------------------------
# In-progress sidecar (next to latest.ckpt)
# ---------------------------------------------------------------------------


def progress_path(checkpoints_dir: Path) -> Path:
    return Path(checkpoints_dir) / "inprogress.json"


def write_progress(
    checkpoints_dir: Path, *, epoch: int, batches_done: int, batch_size: int
) -> None:
    """Record a mid-epoch interruption point, atomically (tmp + rename)."""
    path = progress_path(checkpoints_dir)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(
        json.dumps(
            {"epoch": int(epoch), "batches_done": int(batches_done),
             "batch_size": int(batch_size)}
        )
    )
    tmp.rename(path)


def read_progress(checkpoints_dir: Path) -> dict[str, int] | None:
    path = progress_path(checkpoints_dir)
    if not path.exists():
        return None
    try:
        rec = json.loads(path.read_text())
        return {
            "epoch": int(rec["epoch"]),
            "batches_done": int(rec["batches_done"]),
            "batch_size": int(rec["batch_size"]),
        }
    except (ValueError, KeyError, TypeError):
        return None  # corrupt sidecar: fall back to epoch-start resume


def clear_progress(checkpoints_dir: Path) -> None:
    progress_path(checkpoints_dir).unlink(missing_ok=True)
