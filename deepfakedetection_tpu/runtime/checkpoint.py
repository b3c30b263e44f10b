"""Checkpointing: Orbax latest/best + portable weight export/import.

Reproduces the reference's checkpoint surface (SURVEY.md §5.4; reference:
orchestration/train_env.py:254-306):
- ``latest.ckpt`` every epoch with {epoch, model, optimizer, scheduler-state,
  best_val_acc, best_epoch, warmup_done} → here an Orbax directory checkpoint
  of the full TrainState + counters
- ``best.ckpt`` + bare best weights ``<weights_key>.pth`` on improvement
- auto-resume iff resume enabled and latest exists (train_env.py:182-185)
- inference weight loading tolerates {"state_dict":…}/{"model":…} wrappers
  and partial mismatch, strict=False style (orchestrator.py:350-377); real
  PyTorch ``.pth`` checkpoints are converted on the fly
  (runtime/torch_convert.py) since torch-cpu is available for unpickling.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization



def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_tree(path: Path, tree: Any) -> None:
    """Save a pytree checkpoint directory, atomically replacing any old one."""
    path = Path(path).resolve()
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    with _checkpointer() as ckptr:
        ckptr.save(tmp, tree)
    if path.exists():
        shutil.rmtree(path)
    tmp.rename(path)


def restore_tree(path: Path, target: Any) -> Any:
    """Restore a pytree checkpoint with ``target``'s structure/shardings."""
    path = Path(path).resolve()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with _checkpointer() as ckptr:
        return ckptr.restore(path, abstract)


def latest_path(checkpoints_dir: Path) -> Path:
    return Path(checkpoints_dir) / "latest.ckpt"


def best_path(checkpoints_dir: Path) -> Path:
    return Path(checkpoints_dir) / "best.ckpt"


def has_latest(checkpoints_dir: Path) -> bool:
    return latest_path(checkpoints_dir).exists()


class AsyncSaver:
    """Overlap checkpoint writes with the next epoch's compute.

    ``submit_*`` snapshots the tree with an on-device copy — the train step
    donates its state buffers (train/steps.py ``donate_argnums``), so the
    live arrays may be invalidated by the next step while a write is still
    in flight; the copy is cheap (HBM→HBM) and the background worker then
    owns the device→host fetch, serialization, and file IO. A single worker
    thread serializes saves in submission order, so ``latest.ckpt`` always
    ends up holding the newest submitted state. ``wait()`` drains the queue
    and re-raises the first failure (a silently lost checkpoint would
    corrupt auto-resume semantics).
    """

    def __init__(self) -> None:
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
        self._futures: list[Any] = []

    @staticmethod
    def _snapshot(tree: Any) -> Any:
        import jax.numpy as jnp

        return jax.tree.map(jnp.copy, tree)

    def submit_tree(self, path: Path, tree: Any) -> None:
        self._futures.append(self._pool.submit(save_tree, path, self._snapshot(tree)))

    def submit_export(
        self, path: Path, params: Any, batch_stats: Any | None = None
    ) -> None:
        snap_stats = self._snapshot(batch_stats) if batch_stats is not None else None
        self._futures.append(
            self._pool.submit(export_weights, path, self._snapshot(params), snap_stats)
        )

    def wait(self) -> None:
        futures, self._futures = self._futures, []
        for f in futures:
            f.result()


# ---------------------------------------------------------------------------
# Portable bare-weights export/import (the ".pth" surface)
# ---------------------------------------------------------------------------


def export_weights(path: Path, params: Any, batch_stats: Any | None = None) -> Path:
    """Export inference weights as flax msgpack bytes.

    Written to the configured path even if it ends ``.pth`` (the reference's
    naming, efficientnet.py:552-554); the loader auto-detects format by magic
    bytes, so both native exports and genuine torch checkpoints work.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = {"params": jax.device_get(params)}
    if batch_stats is not None:
        tree["batch_stats"] = jax.device_get(batch_stats)
    path.write_bytes(serialization.to_bytes(tree))
    return path


def load_weights(path: Path, target: dict[str, Any], *, model_family: str | None = None):
    """Load bare weights from native msgpack or a PyTorch .pth checkpoint.

    ``target`` is {"params": ..., "batch_stats": ...} from a fresh init.
    Missing/mismatched leaves keep their init values (strict=False analogue);
    a list of unmatched paths is returned for logging.
    """
    path = Path(path)
    blob = path.read_bytes()
    if blob[:2] == b"PK" or blob[:1] == b"\x80":  # torch zip / legacy pickle
        from deepfakedetection_tpu.runtime.torch_convert import (
            convert_torch_checkpoint,
        )

        return convert_torch_checkpoint(blob, target, model_family=model_family)
    # strict=False analogue for native exports (flax from_bytes would restore
    # wrong-SHAPED arrays silently and only raise on structure mismatch): walk
    # the target, copy every leaf whose path+shape matches, report the rest
    # (reference load_model is strict=False throughout, orchestrator.py:370-375)
    state = serialization.msgpack_restore(bytearray(blob))
    if not isinstance(state, dict):
        raise ValueError(f"unrecognized weights format at {path}")
    unmatched: list[str] = []

    def merge(dst, src, prefix=""):
        out = {}
        for k, v in dst.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                sub = src.get(k)
                out[k] = merge(v, sub if isinstance(sub, dict) else {}, key + "/")
            elif k not in src:
                out[k] = v
                unmatched.append(f"(missing) {key}")
            elif np.shape(src[k]) == np.shape(v):
                out[k] = np.asarray(src[k], dtype=np.asarray(v).dtype)
            else:
                out[k] = v
                unmatched.append(f"{key} (shape {np.shape(src[k])} vs {np.shape(v)})")
        for k in src:
            if k not in dst:
                unmatched.append(f"(unexpected) {prefix}{k}")
        return out

    merged = merge(target, state)
    n_total = len(jax.tree.leaves(target))
    n_bad = sum(1 for u in unmatched if not u.startswith("(unexpected)"))
    if n_total and n_bad >= n_total:
        raise ValueError(
            f"checkpoint at {path} shares no tensors with the target model"
        )
    return merged, unmatched


def tree_allclose(a: Any, b: Any) -> bool:
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(leaves_a) == len(leaves_b) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b)
    )
