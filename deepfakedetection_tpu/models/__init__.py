"""Flax model zoo: EfficientNet, FasterViT, EfficientFormerV2 — NHWC, bf16-first."""
