"""Train CLI: python train.py --config config/train.yaml
(reference surface: train.py:11-16)."""

import argparse
from pathlib import Path

from deepfakedetection_tpu.orchestrator import orchestrate


def main() -> None:
    parser = argparse.ArgumentParser(description="Train deepfake-detection models (TPU)")
    parser.add_argument("--config", type=Path, default=Path("config/train.yaml"))
    args = parser.parse_args()
    orchestrate(args.config, mode="training")


if __name__ == "__main__":
    main()
