"""Mesh construction and sharding rules.

The reference is single-process single-device (SURVEY.md §2.x — no DDP/TP/PP
anywhere); parallelism here is new, TPU-native capability: a
``jax.sharding.Mesh`` over ICI with axes ``("data", "model")``.

- batches are sharded over "data" (pure data parallelism; grad/metric
  reductions become XLA all-reduces over ICI inserted by GSPMD)
- wide projection weights (classifier/attention/MLP kernels) may shard over
  "model" (tensor parallelism) via simple path-based partition rules —
  single-chip degrades to fully-replicated, matching reference behavior.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices: list | None = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if model < 1:
        model = 1
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple[str, ...], value: Any, model_axis_size: int) -> P:
    """Tensor-parallel partition rule by parameter path.

    Dense/conv kernels with an output-feature dim divisible by the model axis
    shard that dim; everything else replicates. Conservative by design: with
    model=1 every spec is effectively replicated.
    """
    if model_axis_size <= 1:
        return P()
    path_str = "/".join(path).lower()
    shape = getattr(value, "shape", ())
    if not shape:
        return P()
    if "kernel" in path_str and len(shape) >= 2 and shape[-1] % model_axis_size == 0:
        # shard the output-features dim; matmul partials all-reduce over ICI
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for a parameter pytree via the TP rules above."""
    model_size = mesh.shape["model"]

    def to_sharding(path, value):
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        return NamedSharding(mesh, _param_spec(names, value, model_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


@functools.cache
def default_mesh() -> Mesh:
    return make_mesh()


def shard_batch(mesh: Mesh, arrays: Any) -> Any:
    """Assemble host batches onto the mesh with batch sharding over "data".

    Single-process: a plain ``device_put``. Multi-process (pods): each host
    holds only ITS shard of the global batch (the loader decodes disjoint
    row ranges — data/pipeline.Loader), so the global array is assembled
    with ``jax.make_array_from_process_local_data`` — a bare ``device_put``
    would instead treat every host's local rows as the full global value
    and silently consume only each host's own slice of it.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), arrays)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        arrays,
    )
