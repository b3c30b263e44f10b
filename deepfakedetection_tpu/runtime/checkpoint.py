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

import itertools
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization



def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


_sync_counter = itertools.count()


def _sync(tag: str) -> None:
    """Cross-process barrier around checkpoint filesystem mutations.

    Uses the jax.distributed coordination service (orbax's
    ``get_barrier_sync_fn`` — documented safe from background threads)
    rather than ``sync_global_devices``: that one is a device collective,
    and device collectives must launch in ONE global order across
    processes, so issuing it off the main thread while train steps run
    deadlocks (measured — see AsyncSaver). The per-process counter stays
    aligned because every process runs the same save/export sequence
    (lockstep training). No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from orbax.checkpoint import multihost as om

    om.get_barrier_sync_fn()(
        key=f"dfd:{tag}:{next(_sync_counter)}", timeout_ms=600_000
    )


def save_tree(path: Path, tree: Any) -> None:
    """Save a pytree checkpoint directory, atomically replacing any old one.

    Multihost-correct on a shared filesystem: the orbax save itself is
    collective (every process writes its addressable shards — sharded
    params checkpoint without gathering), while the surrounding replace
    dance (clear stale tmp, swap tmp → final) runs on process 0 only,
    fenced by barriers so no process writes into a directory another is
    deleting or reads the final path before the swap lands. The old
    checkpoint stays intact until the new one is fully written (crash
    mid-save never loses ``latest.ckpt``).
    """
    path = Path(path).resolve()
    tree = _hostlocal_to_numpy(tree)
    tmp = path.with_name(path.name + ".tmp")
    primary = jax.process_index() == 0
    if primary and tmp.exists():
        shutil.rmtree(tmp)
    _sync("ckpt-pre")
    with _checkpointer() as ckptr:
        ckptr.save(tmp, tree)
    if primary:
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
    _sync("ckpt-post")


def _hostlocal_to_numpy(tree: Any) -> Any:
    """In multiprocess runs, convert host-local jax arrays to numpy.

    Orbax refuses host-local (all-shards-addressable) jax.Arrays in
    multihost settings; the only such leaves in our checkpoints are the
    lockstep-identical step/epoch counters, which serialize fine as numpy
    (primary-host write). Global sharded/replicated arrays pass through and
    are written collectively. No-op single-process.
    """
    if jax.process_count() == 1:
        return tree
    return jax.tree.map(
        lambda x: np.asarray(x)
        if isinstance(x, jax.Array) and x.is_fully_addressable
        else x,
        tree,
    )


def restore_tree(path: Path, target: Any) -> Any:
    """Restore a pytree checkpoint with ``target``'s structure/shardings.

    Host-local template leaves (counters) restore as numpy in multiprocess
    runs, mirroring how ``save_tree`` wrote them.
    """
    path = Path(path).resolve()
    target = _hostlocal_to_numpy(target)
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

    Multiprocess runs use orbax's ``AsyncCheckpointer`` for the TREE saves
    instead of the thread pool: running our whole sync ``save_tree`` on a
    side thread deadlocks — its barriers were ``sync_global_devices``
    DEVICE collectives, and a device collective launched from a background
    thread interleaves nondeterministically with the main thread's
    train-step collectives (measured in the 2-process test before the
    original inline guard). ``AsyncCheckpointer`` is built for exactly
    this: the blocking portion of ``save`` runs on the MAIN thread (D2H
    copy + directory setup, coordination-service fenced) and only the file
    commit runs in background with thread-safe coordination-service
    barriers of its own. The crash-safe replace dance stays ours: each
    async save targets ``<name>.tmp`` (orbax writes that atomically), and
    the tmp→final swap happens on the primary at the NEXT drain point —
    so ``latest.ckpt`` always holds a complete checkpoint, lagging the
    in-flight write by at most one epoch. The ``.pth`` export stays inline
    in multiprocess runs (primary-only small-file write; not worth a
    deferred-swap protocol).
    """

    def __init__(self) -> None:
        import concurrent.futures

        self._multi = jax.process_count() > 1
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
        self._futures: list[Any] = []
        # multiprocess: one AsyncCheckpointer per target path (latest/best
        # overlap each other and the next epoch) + its deferred tmp→final swap
        self._async: dict[Path, Any] = {}
        self._pending_swap: dict[Path, Path] = {}

    @staticmethod
    def _snapshot(tree: Any) -> Any:
        """Device-copy jax leaves (the train step donates its buffers, so
        the live arrays may be invalidated while the write is in flight);
        host leaves (numpy counters) need no copy."""
        import jax.numpy as jnp

        return jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
        )

    def _drain_path(self, path: Path) -> None:
        """Finish the in-flight write for ``path`` and land its swap."""
        ckptr = self._async.get(path)
        if ckptr is None:
            return
        ckptr.wait_until_finished()  # re-raises background write failures
        tmp = self._pending_swap.pop(path, None)
        if tmp is not None:
            if jax.process_index() == 0:
                if path.exists():
                    shutil.rmtree(path)
                tmp.rename(path)
            _sync("async-swap")

    def submit_tree(self, path: Path, tree: Any) -> None:
        path = Path(path).resolve()
        if self._multi:
            # previous write to this path must land (and swap) before its
            # tmp directory is reused
            self._drain_path(path)
            tree = _hostlocal_to_numpy(self._snapshot(tree))
            tmp = path.with_name(path.name + ".tmp")
            if jax.process_index() == 0 and tmp.exists():
                shutil.rmtree(tmp)
            _sync("async-pre")
            ckptr = self._async.get(path)
            if ckptr is None:
                ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                self._async[path] = ckptr
            ckptr.save(tmp, args=ocp.args.StandardSave(tree))
            self._pending_swap[path] = tmp
            return
        self._futures.append(self._pool.submit(save_tree, path, self._snapshot(tree)))

    def submit_export(
        self, path: Path, params: Any, batch_stats: Any | None = None
    ) -> None:
        if self._multi:
            export_weights(path, params, batch_stats)
            return
        snap_stats = self._snapshot(batch_stats) if batch_stats is not None else None
        self._futures.append(
            self._pool.submit(export_weights, path, self._snapshot(params), snap_stats)
        )

    def submit_call(self, fn: Any, *args: Any) -> None:
        """Queue an arbitrary callable behind the pending writes (e.g. the
        preempt sidecar cleanup, which must not run before the epoch-end
        checkpoint it refers to has landed)."""
        if self._multi:
            self.wait()  # contract: runs behind every pending write
            fn(*args)
            return
        self._futures.append(self._pool.submit(fn, *args))

    def wait(self) -> None:
        futures, self._futures = self._futures, []
        for f in futures:
            f.result()
        for path in list(self._async):
            self._drain_path(path)

    def close(self) -> None:
        """Drain everything and release worker threads (idempotent)."""
        self.wait()
        for ckptr in self._async.values():
            ckptr.close()
        self._async.clear()
        self._pool.shutdown(wait=True)


# ---------------------------------------------------------------------------
# Portable bare-weights export/import (the ".pth" surface)
# ---------------------------------------------------------------------------


def export_weights(path: Path, params: Any, batch_stats: Any | None = None) -> Path:
    """Export inference weights as flax msgpack bytes.

    Written to the configured path even if it ends ``.pth`` (the reference's
    naming, efficientnet.py:552-554); the loader auto-detects format by magic
    bytes, so both native exports and genuine torch checkpoints work.

    Multihost: the file is written by process 0 only (one writer on a
    shared filesystem); ``device_get`` is host-local, so the tree must be
    fully addressable — replicated, as the train loop's eval/export trees
    are. Model-sharded params belong in the orbax checkpoints (which write
    shards collectively), not this portable export.
    """
    path = Path(path)
    # validate BEFORE any barrier or early return: the predicate is
    # host-local but consistent across processes, so either every process
    # raises here (no barrier tick consumed, counters stay aligned) or none.
    # Replicated global arrays (P() over the mesh) fetch locally; only
    # genuinely sharded leaves are rejected.
    for leaf in jax.tree.leaves((params, batch_stats)):
        if (
            isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable
            and not leaf.is_fully_replicated
        ):
            raise ValueError(
                "export_weights needs a locally-fetchable (replicated or "
                "single-process) tree; reshard with NamedSharding(mesh, P()) "
                "before exporting, or save an orbax checkpoint instead"
            )
    if jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
        tree = {"params": jax.device_get(params)}
        if batch_stats is not None:
            tree["batch_stats"] = jax.device_get(batch_stats)
        path.write_bytes(serialization.to_bytes(tree))
    _sync("export-post")
    return path


def is_torch_checkpoint(path: Path) -> bool:
    """True when the file is a PyTorch checkpoint (zip or legacy pickle)."""
    with Path(path).open("rb") as f:
        magic = f.read(2)
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


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
