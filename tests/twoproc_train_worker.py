"""Worker for the REAL 2-process distributed TRAIN test.

Runs the actual sharded training machinery across two
``jax.distributed.initialize``'d CPU processes (4 virtual devices each):
the process-sharded train loader (disjoint contiguous shards of one seeded
epoch order, lockstep batch counts), ``shard_batch``'s
``make_array_from_process_local_data`` branch for images/labels/masks, and
the jitted train step over the global data×model mesh whose gradient
all-reduce spans BOTH processes. Writes a params checksum + losses for the
parent to compare across processes (grad sync ⇒ identical).

Usage: python -m tests.twoproc_train_worker <pid> <nprocs> <port> <data> <out.json>
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

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deepfakedetection_tpu.data.augment import normalize_batch
    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.pipeline import make_train_loader
    from deepfakedetection_tpu.data.transforms import build_eval_plan, build_train_plan
    from deepfakedetection_tpu.parallel.mesh import (
        make_mesh,
        param_shardings,
        shard_batch,
    )
    from deepfakedetection_tpu.train.optim import make_phase_optimizer
    from deepfakedetection_tpu.train.steps import (
        TrainState,
        init_model_variables,
        make_train_step,
    )
    from tests.util import tiny_spec

    mesh = make_mesh(4, 2)
    spec = tiny_spec()
    model = spec.builder(2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, 32, 32, 3)
    )
    tx, _, _ = make_phase_optimizer(
        params, lr=1e-2, weight_decay=0.0, trainable=lambda _: True
    )
    p_shard = param_shardings(mesh, params)
    params = jax.tree.map(jax.device_put, params, p_shard)
    batch_stats = jax.device_put(batch_stats, NamedSharding(mesh, P()))
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.device_put(tx.init(params), NamedSharding(mesh, P())),
        step=jax.device_put(
            jnp.asarray(0, jnp.int32), NamedSharding(mesh, P())
        ),
    )
    train_step = make_train_step(model, tx)

    plan = build_train_plan(32, {})
    norm_plan = build_eval_plan(32)
    ds = scan_image_folder(data_dir)
    loader = make_train_loader(
        ds, plan, batch_size=8, seed=11, num_workers=0, use_native=False
    )
    losses, seen = [], 0
    for epoch in range(2):
        loader.set_epoch(epoch)
        for batch in loader:
            images = shard_batch(mesh, batch.images)
            x = normalize_batch(images, norm_plan, out_dtype=jnp.float32)
            labels, mask = jax.tree.map(
                lambda a: shard_batch(mesh, a), (batch.labels, batch.mask)
            )
            state, metrics = train_step(state, x, labels, mask, jax.random.key(epoch))
            losses.append(float(metrics["loss"]))
            seen += 8
    # params checksum must be identical across processes (grad all-reduce)
    flat = jax.tree.leaves(jax.tree.map(lambda t: np.asarray(t), state.params))
    checksum = float(sum(np.abs(leaf).sum() for leaf in flat))

    # --- multihost checkpoint surface (runtime/checkpoint.py) -------------
    # save_tree is collective (each process writes its addressable shards of
    # the MODEL-SHARDED params) with primary-only tmp/swap; saving twice
    # exercises the atomic-replace dance across processes; restore must
    # round-trip the sharded values; export_weights writes from process 0
    # only and rejects non-addressable trees.
    from pathlib import Path

    from deepfakedetection_tpu.runtime import checkpoint as ckpt

    ckpt_dir = Path(out_path).parent / "shared_ckpts"
    tree = {"params": state.params, "epoch": jnp.asarray(1, jnp.int32)}
    ckpt.save_tree(ckpt_dir / "latest.ckpt", tree)
    tree2 = {
        "params": jax.tree.map(lambda t: t + 1.0, state.params),
        "epoch": jnp.asarray(2, jnp.int32),
    }
    # AsyncSaver in multiprocess: the tree save goes through orbax's
    # AsyncCheckpointer (blocking D2H on the main thread, file commit in a
    # background thread with coordination-service barriers) while train
    # steps with device collectives keep running — the ORIGINAL design ran
    # our whole sync save on a side thread and deadlocked exactly here.
    # The tmp→final swap is deferred to the next drain point, so the OLD
    # complete checkpoint must survive while the write is in flight.
    saver = ckpt.AsyncSaver()
    saver.submit_tree(ckpt_dir / "latest.ckpt", tree2)
    for batch in loader:
        images = shard_batch(mesh, batch.images)
        x = normalize_batch(images, norm_plan, out_dtype=jnp.float32)
        labels, mask = jax.tree.map(
            lambda a: shard_batch(mesh, a), (batch.labels, batch.mask)
        )
        state, _ = train_step(state, x, labels, mask, jax.random.key(9))
    # crash-safety window: latest.ckpt still holds tree (epoch 1) until the
    # in-flight tree2 write lands and swaps at the drain point. (Value
    # comparison uses the epoch counter only: tree's param buffers were
    # donated into the train steps above, so their data is gone — but the
    # template's shape/sharding metadata still drives the restore.)
    mid = ckpt.restore_tree(ckpt_dir / "latest.ckpt", tree)
    crash_window_ok = int(np.asarray(mid["epoch"])) == 1
    saver.close()
    restored = ckpt.restore_tree(ckpt_dir / "latest.ckpt", tree2)
    eq = jax.tree.map(lambda a, b: bool((a == b).all()), restored, tree2)
    roundtrip_ok = all(jax.tree.leaves(eq)) and crash_window_ok

    export_rejected = False
    try:  # model-sharded tree must be rejected, not silently truncated
        ckpt.export_weights(ckpt_dir / "bad.pth", state.params)
    except ValueError:
        export_rejected = True
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

    repl = jax.device_put(state.params, _NS(mesh, _P()))
    ckpt.export_weights(ckpt_dir / "weights.pth", repl)

    # run-id sync: feed DIVERGENT per-process ids (simulating a clock-second
    # boundary between hosts); every process must adopt process 0's — else
    # the collective checkpoint saves above would split across two run dirs
    from deepfakedetection_tpu.runtime.paths import sync_run_id

    synced_run_id = sync_run_id(f"20240101-00000{pid}")

    # shared-run-dir artifact hygiene: metrics.jsonl is primary-only (both
    # processes compute identical records) and the console tee splits into
    # per-process files instead of interleaving one
    from deepfakedetection_tpu.runtime.logging import append_metrics, tee_output

    logs_dir = Path(out_path).parent / "shared_logs"
    append_metrics(logs_dir / "metrics.jsonl", {"p": pid})
    with tee_output(logs_dir / "train.log"):
        print(f"tee check p{pid}")

    with open(out_path, "w") as f:
        json.dump(
            {
                "losses": losses,
                "checksum": checksum,
                "seen": seen,
                "roundtrip_ok": roundtrip_ok,
                "export_rejected": export_rejected,
                "synced_run_id": synced_run_id,
                "is_primary": pid == 0,
            },
            f,
        )


if __name__ == "__main__":
    main()
