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


def sync_run_id(run_id: str) -> str:
    """Every process adopts process 0's run id (no-op single-process).

    Multihost runs execute the same orchestrate() call stack on every
    process, and the orbax checkpoint save is COLLECTIVE — each process
    writes its addressable shards into the same directory. A second
    boundary between two processes' clocks would hand them different
    timestamped run dirs and silently split every checkpoint across two
    incomplete directories. Broadcast runs on the main thread before any
    training collectives, so launch order stays consistent.
    """
    import jax

    if jax.process_count() == 1:
        return run_id
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(64, np.uint8)
    raw = run_id.encode()
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    synced = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(synced).rstrip(b"\x00").decode()


def ensure_run_dirs(base_output_dir: str | Path, *, run_id: str | None = None) -> RunPaths:
    """Create a fresh timestamped run dir with the standard subdirs.

    Without an explicit ``run_id``, multihost runs agree on process 0's
    timestamp (``sync_run_id``) so collective checkpoint saves land in ONE
    directory."""
    root = Path(base_output_dir) / (run_id or sync_run_id(timestamp_now()))
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

    Mirrors reference orchestrator.py:148-159. Multihost: primary-only
    (all processes hold the identical validated config and the run dir is
    shared — see sync_run_id).
    """
    import jax

    if jax.process_index() != 0:
        return run_paths.root / "config_snapshot.yaml"
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
