"""runtime/watchdog.py — the relay lost-wakeup heartbeat."""

import signal
import time

from deepfakedetection_tpu.runtime import watchdog


def test_heartbeat_is_invisible_to_blocking_calls(monkeypatch):
    """PEP 475: an armed heartbeat must not break sleeps or raise."""
    monkeypatch.delenv("DFD_RELAY_WATCHDOG_SECS", raising=False)
    try:
        assert watchdog.enable(0.05) is True
        t0 = time.perf_counter()
        time.sleep(0.25)  # several heartbeats land during this sleep
        assert time.perf_counter() - t0 >= 0.24
        # idempotent
        assert watchdog.enable(0.05) is True
    finally:
        watchdog.disable()
    assert signal.getsignal(signal.SIGALRM) == signal.SIG_DFL


def test_refuses_foreign_sigalrm_owner():
    prev = signal.signal(signal.SIGALRM, lambda s, f: None)
    try:
        assert watchdog.enable(0.05) is False
    finally:
        signal.signal(signal.SIGALRM, prev if prev is not None else signal.SIG_DFL)


def test_zero_interval_disables(monkeypatch):
    monkeypatch.setenv("DFD_RELAY_WATCHDOG_SECS", "0")
    assert watchdog.enable() is False


def test_relay_gate(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert watchdog.enable_for_relay(0.05) is False
