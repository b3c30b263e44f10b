"""Pallas TPU kernels (see /opt guides; XLA fallbacks live in ops/attention.py)."""
