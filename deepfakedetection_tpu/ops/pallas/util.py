"""Shared helpers for the Pallas kernels."""

from __future__ import annotations


def largest_pow2_block(batch: int, max_windows: int) -> int:
    """Largest power-of-2 divisor of ``batch`` that is ≤ ``max_windows``.

    Grid-block picker shared by every window/attention/depthwise kernel
    (always ≥ 1): callers compute ``max_windows`` from a VMEM byte budget
    or use the measured default, and the grid is then ``batch // G``.
    """
    g = 1
    while g * 2 <= max_windows and batch % (g * 2) == 0:
        g *= 2
    return g
