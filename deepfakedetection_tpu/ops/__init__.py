"""Custom ops: Pallas TPU kernels with XLA fallbacks."""
