"""Multi-host (pod) support.

The reference is strictly single-process (SURVEY.md §2.x). On TPU pods, JAX
runs one process per host: initialize the distributed runtime, build the
mesh over all global devices (ICI within a slice, DCN across), and shard the
input pipeline by process. Single-host behavior is unchanged.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize() -> None:
    """Initialize jax.distributed on pods. No-op single-host / already-init.

    Opt-in via DFD_MULTIHOST=1 (TPU pod environments auto-detect coordinator
    config from the TPU metadata), or automatic when JAX_COORDINATOR_ADDRESS
    is set explicitly.
    """
    global _initialized
    if _initialized:
        return
    if os.environ.get("DFD_MULTIHOST") == "1" or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        _initialized = True


def local_rows(arr):
    """THIS process's rows of a batch-sharded device array, in batch order.

    Single-process (fully-addressable) arrays fetch directly. On pods the
    global array's rows live across hosts — ``np.asarray`` would raise on
    non-addressable shards — so only the addressable shards are fetched and
    concatenated by their global row offset; the result aligns with the
    host-local labels/masks the loader produced for the same batch.
    """
    import numpy as np

    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    # Deduplicate by global row offset: with a model axis in the mesh, a
    # P("data")-sharded array is REPLICATED along "data"-free axes, so each
    # row block appears once per local model-axis device; concatenating all
    # addressable shards would duplicate rows and misalign with the loader's
    # host-local labels/masks.
    by_offset = {}
    for s in arr.addressable_shards:
        by_offset.setdefault(s.index[0].start or 0, s)
    return np.concatenate(
        [np.asarray(by_offset[k].data) for k in sorted(by_offset)]
    )


def allgather_examples(arr):
    """Concatenate per-process example arrays (ragged leading dim) across
    hosts, in process order — so sharded eval still produces the full
    probs/targets set for sklearn-compatible metrics on every host.

    Single-process: identity. Ragged shards (the last process takes the
    remainder) are padded to the max count before the collective and trimmed
    after.
    """
    import numpy as np

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils as mhu

    arr = np.asarray(arr)
    counts = np.asarray(
        mhu.process_allgather(np.asarray([arr.shape[0]], np.int64))
    ).reshape(-1)
    m = int(counts.max())
    padded = np.zeros((m,) + arr.shape[1:], arr.dtype)
    padded[: arr.shape[0]] = arr
    gathered = np.asarray(mhu.process_allgather(padded))  # [pc, m, ...]
    return np.concatenate([gathered[i, : counts[i]] for i in range(len(counts))])
