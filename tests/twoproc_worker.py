"""Worker for the REAL 2-process distributed eval test (VERDICT r2 #4).

Launched twice by test_two_process_distributed.py with
``jax.distributed.initialize`` over a localhost coordinator, 4 virtual CPU
devices per process (8 global). Runs the actual sharded eval collection
path — ``shard_batch``'s ``make_array_from_process_local_data`` branch,
``local_rows`` on NON-fully-addressable arrays (with a model axis, so the
replica-dedup logic executes for real), and ``allgather_examples``'s
collective — then writes gathered probs/targets to a JSON file the parent
compares against a single-process reference run.

Usage: python -m tests.twoproc_worker <pid> <nprocs> <port> <data_dir> <out.json>
"""

import json
import os
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, out_path = sys.argv[4], sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_disable_most_optimizations", True)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs and jax.local_device_count() == 4

    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.pipeline import make_eval_loader
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.evaluate.job import _collect_probs
    from deepfakedetection_tpu.parallel.mesh import make_mesh
    from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step
    from tests.util import tiny_spec

    import jax.numpy as jnp

    # data=4 x model=2: probs come out P("data")-sharded but REPLICATED along
    # the model axis, so each process addresses every local row block twice —
    # exercising local_rows' dedup-by-offset for real
    mesh = make_mesh(4, 2)
    spec = tiny_spec()
    model = spec.builder(2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, 32, 32, 3)
    )
    plan = build_eval_plan(32)
    ds = scan_image_folder(data_dir)
    loader = make_eval_loader(
        ds, plan, batch_size=8, num_workers=0, use_native=False
    )
    probs, targets, _ = _collect_probs(
        make_eval_step(model), params, batch_stats, loader, plan, mesh,
        jnp.float32,
    )
    with open(out_path, "w") as f:
        json.dump({"probs": probs.tolist(), "targets": targets.tolist()}, f)


if __name__ == "__main__":
    main()
