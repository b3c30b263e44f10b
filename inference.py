"""Inference CLI: python inference.py --config config/inference.yaml
(reference surface: inference.py:11-16)."""

import argparse
from pathlib import Path

from deepfakedetection_tpu.orchestrator import orchestrate


def main() -> None:
    parser = argparse.ArgumentParser(description="Batch-evaluate deepfake-detection models (TPU)")
    parser.add_argument("--config", type=Path, default=Path("config/inference.yaml"))
    args = parser.parse_args()
    orchestrate(args.config, mode="inference")


if __name__ == "__main__":
    main()
