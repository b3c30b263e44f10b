"""Run-directory layout and config snapshots.

Layout is byte-compatible with the reference:
``runs/<model>/<YYYYmmdd-HHMMSS>/{checkpoints,logs,plots}``
(reference: orchestration/orchestrator.py:50-57,138-145,682-684) and a
``config_snapshot.yaml`` per run (orchestrator.py:148-159).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Any

import yaml


@dataclass(frozen=True)
class RunPaths:
    root: Path
    checkpoints: Path
    logs: Path
    plots: Path


def timestamp_now() -> str:
    return datetime.now().strftime("%Y%m%d-%H%M%S")


def ensure_run_dirs(base_output_dir: str | Path, *, run_id: str | None = None) -> RunPaths:
    """Create a fresh timestamped run dir with the standard subdirs."""
    root = Path(base_output_dir) / (run_id or timestamp_now())
    paths = RunPaths(
        root=root,
        checkpoints=root / "checkpoints",
        logs=root / "logs",
        plots=root / "plots",
    )
    for p in (paths.root, paths.checkpoints, paths.logs, paths.plots):
        p.mkdir(parents=True, exist_ok=True)
    return paths


def snapshot_config(
    config: dict[str, Any], model_name: str, run_paths: RunPaths
) -> Path:
    """Write config_snapshot.yaml: globals minus models/selection + this model's block.

    Mirrors reference orchestrator.py:148-159.
    """
    snapshot = {
        k: copy.deepcopy(v)
        for k, v in config.items()
        if k not in ("models", "selection")
    }
    model_block = copy.deepcopy((config.get("models") or {}).get(model_name) or {})
    snapshot["model"] = {"name": model_name, **model_block}
    out = run_paths.root / "config_snapshot.yaml"
    with out.open("w", encoding="utf-8") as fh:
        yaml.safe_dump(snapshot, fh, sort_keys=False)
    return out
