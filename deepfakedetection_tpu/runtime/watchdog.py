"""Heartbeat signal that retries lost-wakeup device waits (relay backends).

Observed in round 5 on the axon-relayed TPU: long training runs wedge
inside ``jax.Array._value`` — the main thread parks in a futex wait for a
device fetch that has in fact completed (CPU time frozen for 10+ minutes,
the chip healthy for new clients, a stack dump showing ``__float__`` →
``_value``). ANY handled signal interrupts the wait; Python retries the
call per PEP 475, and the retried wait sees the ready value and returns
immediately. Reproduced twice, unstuck twice by exactly one signal.

This module arms a periodic no-op SIGALRM so a lost wakeup costs at most
one heartbeat interval instead of hanging the run forever. PEP 475 makes
the heartbeat invisible to correctly-written blocking calls (sleep, reads,
locks all auto-retry); the handler body is a no-op, so there is no
re-entrancy hazard.

Enabled automatically by the train loop and eval job when the backend is
the relay (``jax.default_backend() == "axon"``); override with
``DFD_RELAY_WATCHDOG_SECS`` (seconds, ``0`` disables).
"""

from __future__ import annotations

import os
import signal
import threading

_armed = False


def enable(interval: float | None = None) -> bool:
    """Arm the heartbeat. Returns True when armed (main thread only, and
    only if SIGALRM is unclaimed); safe to call repeatedly."""
    global _armed
    if interval is None:
        raw = os.environ.get("DFD_RELAY_WATCHDOG_SECS")
        try:
            interval = float(raw) if raw else 60.0
        except ValueError as exc:
            raise ValueError(
                f"DFD_RELAY_WATCHDOG_SECS must be a number, got {raw!r}"
            ) from exc
    if interval <= 0:
        return False
    if threading.current_thread() is not threading.main_thread():
        return False
    if _armed:
        return True
    prev = signal.getsignal(signal.SIGALRM)
    if prev not in (signal.SIG_DFL, signal.SIG_IGN, None):
        return False  # someone else owns SIGALRM — don't fight
    signal.signal(signal.SIGALRM, lambda _s, _f: None)
    signal.setitimer(signal.ITIMER_REAL, interval, interval)
    _armed = True
    return True


def disable() -> None:
    global _armed
    if not _armed:
        return
    signal.setitimer(signal.ITIMER_REAL, 0.0, 0.0)
    signal.signal(signal.SIGALRM, signal.SIG_DFL)
    _armed = False


def enable_for_relay(interval: float | None = None) -> bool:
    """Arm only when running against the relay backend."""
    import jax

    if jax.default_backend() != "axon":
        return False
    return enable(interval)
