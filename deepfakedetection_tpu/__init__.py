"""deepfakedetection_tpu — a TPU-native deepfake-detection framework.

A from-scratch JAX/Flax/pjit/Pallas rebuild of the capabilities of the
reference PyTorch pipeline (thourihan/DeepfakeDetection): three image
backbones (EfficientNet-B3, FasterViT-2-224, EfficientFormerV2-S1)
fine-tuned for binary real/fake frame classification, with YAML-driven
orchestration, batch evaluation with metrics/plots, Grad-CAM, and a web UI.

Design stance (see SURVEY.md §7):
- same user surface as the reference (YAML schema, CLI, run-dir layout,
  metrics.jsonl, plots, cam exports)
- TPU-first internals: NHWC bf16 compute, one jitted train/eval step,
  mesh-sharded data parallelism via jax.sharding, on-device fused input
  augmentation, Orbax checkpoints, jax.grad Grad-CAM.
"""

__version__ = "0.1.0"
