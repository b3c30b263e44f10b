"""REAL 2-process jax.distributed eval (VERDICT r2 #4).

Spawns two subprocesses that ``jax.distributed.initialize`` over a localhost
coordinator (4 virtual CPU devices each, 8 global) and run the actual
sharded eval collection path end-to-end — the only code paths no in-process
test can execute: ``make_array_from_process_local_data`` assembly
(parallel/mesh.py shard_batch), ``local_rows`` on non-addressable shards
with model-axis replicas (parallel/multihost.py), and
``allgather_examples``'s cross-process collective. Metrics inputs must be
identical across processes and equal to a single-process reference.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(module, args_per_proc, timeout=420):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", module, *map(str, args)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for args in args_per_proc
    ]
    logs = [p.communicate(timeout=timeout)[0].decode(errors="replace") for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"


@pytest.mark.slow
def test_two_process_sharded_train_syncs_gradients(tiny_image_tree, tmp_path):
    """REAL 2-process TRAIN: process-sharded loader + global-mesh train step.
    The gradient all-reduce spans both processes, so end-of-run params must
    be bit-identical across them; losses must match step-for-step too."""
    port = _free_port()
    data_dir = str(tiny_image_tree / "train")
    outs = [tmp_path / f"t{i}.json" for i in range(2)]
    _run_workers(
        "tests.twoproc_train_worker",
        [(i, 2, port, data_dir, outs[i]) for i in range(2)],
    )
    r0, r1 = (json.loads(o.read_text()) for o in outs)
    assert r0["checksum"] == r1["checksum"], (r0["checksum"], r1["checksum"])
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert len(r0["losses"]) == 4  # 16 samples, batch 8, 2 epochs, lockstep
    assert all(np.isfinite(r0["losses"]))

    # multihost checkpoint surface (see twoproc_train_worker): the sharded
    # save→overwrite→restore round-trip held on BOTH processes, the
    # model-sharded export was rejected on both, and exactly one process
    # wrote the portable export
    assert r0["roundtrip_ok"] and r1["roundtrip_ok"]
    assert r0["export_rejected"] and r1["export_rejected"]
    ckpts = tmp_path / "shared_ckpts"
    assert (ckpts / "latest.ckpt").is_dir()
    assert not (ckpts / "latest.ckpt.tmp").exists()  # swap completed
    assert (ckpts / "weights.pth").is_file()
    assert not (ckpts / "bad.pth").exists()
    from flax import serialization

    tree = serialization.msgpack_restore(
        bytearray((ckpts / "weights.pth").read_bytes())
    )
    assert "params" in tree and len(tree["params"]) > 0

    # run-id sync: both workers fed divergent local ids; both must adopt
    # process 0's (runtime/paths.sync_run_id — without it the collective
    # saves above would target different timestamped run dirs)
    assert r0["synced_run_id"] == r1["synced_run_id"] == "20240101-000000"

    # shared-run-dir artifact hygiene: exactly one metrics writer (primary),
    # per-process tee files instead of one interleaved log
    logs = tmp_path / "shared_logs"
    lines = [json.loads(x) for x in (logs / "metrics.jsonl").read_text().splitlines()]
    assert lines == [{"p": 0}]
    assert "tee check p0" in (logs / "train.log").read_text()
    assert "tee check p1" in (logs / "train.log.p1").read_text()


@pytest.mark.slow
def test_two_process_sharded_eval_matches_single_process(
    tiny_image_tree, tmp_path
):
    port = _free_port()
    data_dir = str(tiny_image_tree / "val")
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests.twoproc_worker",
                str(i), "2", str(port), data_dir, str(outs[i]),
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    p0, t0 = np.asarray(results[0]["probs"]), np.asarray(results[0]["targets"])
    p1, t1 = np.asarray(results[1]["probs"]), np.asarray(results[1]["targets"])
    # every process must see the SAME fully-assembled split
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)
    np.testing.assert_array_equal(t0, t1)

    # single-process reference on the same data/model (same fixed init key)
    import jax
    import jax.numpy as jnp

    from deepfakedetection_tpu.data.folder import scan_image_folder
    from deepfakedetection_tpu.data.pipeline import make_eval_loader
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.evaluate.job import _collect_probs
    from deepfakedetection_tpu.parallel.mesh import make_mesh
    from deepfakedetection_tpu.train.steps import (
        init_model_variables,
        make_eval_step,
    )
    from tests.util import tiny_spec

    spec = tiny_spec()
    model = spec.builder(2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, 32, 32, 3)
    )
    plan = build_eval_plan(32)
    ds = scan_image_folder(data_dir)
    loader = make_eval_loader(ds, plan, batch_size=8, num_workers=0, use_native=False)
    ref_probs, ref_targets, _ = _collect_probs(
        make_eval_step(model), params, batch_stats, loader, plan,
        make_mesh(4, 2), jnp.float32,
    )

    assert p0.shape == ref_probs.shape and len(t0) == len(ds)
    # the 2-process assembly concatenates per-process shards (process order),
    # which permutes rows vs the single-process order — compare as multisets
    def canon(p, t):
        rows = np.concatenate([p, t[:, None].astype(p.dtype)], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(
        canon(p0, t0), canon(np.asarray(ref_probs), np.asarray(ref_targets)),
        atol=1e-5,
    )
