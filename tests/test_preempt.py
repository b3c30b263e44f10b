"""Preemption-graceful training: SIGTERM → mid-epoch checkpoint → exact resume.

TPU-production extension with no reference analogue (the reference's
recovery unit is the per-epoch latest.ckpt, train_env.py:254-278); see
runtime/preempt.py. The headline assertion: an interrupted-then-resumed
run produces **byte-identical** exported weights to an uninterrupted one.
"""

import hashlib
import os
import signal

import numpy as np
import pytest

from deepfakedetection_tpu.runtime import preempt
from deepfakedetection_tpu.runtime.paths import ensure_run_dirs
from deepfakedetection_tpu.train.loop import TrainJob, run_training
from tests.util import tiny_spec


def _job(run_paths, data_root, **kw):
    defaults = dict(
        model_name="tiny_cnn",
        spec=tiny_spec(),
        run_paths=run_paths,
        data_root=data_root,
        num_classes=2,
        img_size=32,
        batch_size=8,
        epochs=2,
        num_workers=0,
        seed=11,
        resume_auto=True,
        compute_dtype=np.float32,
    )
    defaults.update(kw)
    return TrainJob(**defaults)


def test_trap_installs_and_restores_sigterm_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with preempt.trap():
        assert not preempt.requested()
        os.kill(os.getpid(), signal.SIGTERM)  # delivered to our handler
        assert preempt.requested()
    assert signal.getsignal(signal.SIGTERM) is prev
    assert not preempt.requested()  # flag cleared on exit


def test_progress_sidecar_roundtrip(tmp_path):
    assert preempt.read_progress(tmp_path) is None
    preempt.write_progress(tmp_path, epoch=3, batches_done=7, batch_size=16)
    assert preempt.read_progress(tmp_path) == {
        "epoch": 3, "batches_done": 7, "batch_size": 16,
    }
    preempt.clear_progress(tmp_path)
    assert preempt.read_progress(tmp_path) is None
    # corrupt sidecar → ignored, not fatal
    preempt.progress_path(tmp_path).write_text("{nope")
    assert preempt.read_progress(tmp_path) is None


def test_interrupt_resume_is_bit_identical(tiny_image_tree, tmp_path):
    # control: uninterrupted 2-epoch run
    a_paths = ensure_run_dirs(tmp_path / "a", run_id="r")
    a = run_training(_job(a_paths, tiny_image_tree))
    assert not a.interrupted
    a_pth = a_paths.checkpoints / "tiny_cnn.pth"
    assert a_pth.exists()

    # interrupted run: preemption after the 1st fine-tune step (the fake
    # `requested` passes the 2-step warmup, then fires on call 3)
    b_paths = ensure_run_dirs(tmp_path / "b", run_id="r")
    calls = {"n": 0}

    def fake_requested():
        calls["n"] += 1
        return calls["n"] >= 3

    mp = pytest.MonkeyPatch()
    mp.setattr(preempt, "requested", fake_requested)
    try:
        b = run_training(_job(b_paths, tiny_image_tree))
    finally:
        mp.undo()
    assert b.interrupted
    prog = preempt.read_progress(b_paths.checkpoints)
    assert prog == {"epoch": 0, "batches_done": 1, "batch_size": 8}
    assert (b_paths.checkpoints / "latest.ckpt").exists()

    # resume: re-enters epoch 1, skips the completed batch, finishes
    c = run_training(_job(b_paths, tiny_image_tree))
    assert not c.interrupted
    assert c.epochs_run == 2  # epochs 0 (replayed from batch 1) and 1
    assert preempt.read_progress(b_paths.checkpoints) is None  # sidecar cleared

    # the gold assertion: identical trajectory ⇒ identical exported weights
    b_pth = b_paths.checkpoints / "tiny_cnn.pth"
    assert b_pth.exists()
    assert c.best_val_acc == a.best_val_acc
    assert (
        hashlib.sha256(a_pth.read_bytes()).hexdigest()
        == hashlib.sha256(b_pth.read_bytes()).hexdigest()
    )


def test_interrupt_during_warmup_exits_without_checkpoint(tiny_image_tree, tmp_path):
    paths = ensure_run_dirs(tmp_path / "w", run_id="r")
    mp = pytest.MonkeyPatch()
    mp.setattr(preempt, "requested", lambda: True)  # fires on warmup step 1
    try:
        result = run_training(_job(paths, tiny_image_tree))
    finally:
        mp.undo()
    assert result.interrupted
    assert not (paths.checkpoints / "latest.ckpt").exists()
    assert preempt.read_progress(paths.checkpoints) is None


def test_stale_sidecar_with_wrong_geometry_is_ignored(tiny_image_tree, tmp_path):
    paths = ensure_run_dirs(tmp_path / "s", run_id="r")
    # train one epoch so latest.ckpt exists, then plant a mismatched sidecar
    r1 = run_training(_job(paths, tiny_image_tree, epochs=1))
    assert not r1.interrupted
    preempt.write_progress(paths.checkpoints, epoch=1, batches_done=1, batch_size=999)
    r2 = run_training(_job(paths, tiny_image_tree, epochs=2))
    assert not r2.interrupted
    assert r2.epochs_run == 1  # normal epoch-granular resume, skip ignored




@pytest.mark.slow
def test_cli_sigterm_preemption_and_resume(tiny_image_tree, tmp_path):
    """The production scenario end-to-end through the REAL CLI call stack:
    a ``python -m tests.preempt_cli_worker`` subprocess (= what train.py
    does, registry routed to the tiny CNN) gets a real SIGTERM mid-run,
    exits 0 with a mid-epoch checkpoint + sidecar, and a plain rerun with
    ``training.resume: continue`` finishes the run — exported weights
    byte-identical to an uninterrupted control run."""
    import subprocess
    import sys
    import time
    from pathlib import Path

    import yaml

    repo = Path(__file__).resolve().parent.parent

    def _cfg(path, out_dir):
        cfg = {
            "seed": 7,
            "device": "cpu",
            "data": {"root": str(tiny_image_tree), "num_classes": 2, "img_size": 32},
            "models": {
                "tiny_cnn": {
                    "output_dir": str(out_dir),
                    "training": {
                        "epochs": 4, "batch_size": 8, "num_workers": 0,
                        "warmup_epochs": 0, "resume": "continue",
                    },
                }
            },
            "selection": ["tiny_cnn"],
        }
        path.write_text(yaml.safe_dump(cfg))
        return path

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = str(repo)

    def _run(cfg_path, sigterm_after_marker=None, timeout=420):
        proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "tests.preempt_cli_worker", str(cfg_path)],
            cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, errors="replace",
        )
        lines = []
        deadline = time.monotonic() + timeout
        sent = sigterm_after_marker is None
        while True:
            line = proc.stdout.readline()
            if line:
                lines.append(line)
                if not sent and sigterm_after_marker in line:
                    proc.send_signal(signal.SIGTERM)
                    sent = True
            elif proc.poll() is not None:
                break
            if time.monotonic() > deadline:
                proc.kill()
                raise AssertionError("worker timed out:\n" + "".join(lines[-40:]))
        assert sent, "marker never appeared:\n" + "".join(lines[-40:])
        assert proc.returncode == 0, "".join(lines[-40:])
        return "".join(lines)

    # control: uninterrupted run
    ctrl_out = tmp_path / "runs_ctrl"
    _run(_cfg(tmp_path / "ctrl.yaml", ctrl_out))
    (ctrl_pth,) = list(ctrl_out.rglob("tiny_cnn.pth"))
    ctrl_hash = hashlib.sha256(ctrl_pth.read_bytes()).hexdigest()

    # interrupted: real SIGTERM right after the fine-tune phase starts
    int_out = tmp_path / "runs_int"
    cfg = _cfg(tmp_path / "int.yaml", int_out)
    log = _run(cfg, sigterm_after_marker="fine-tune:")
    assert "preempted" in log
    (run_dir,) = [d for d in int_out.iterdir() if d.is_dir()]
    assert (run_dir / "checkpoints" / "latest.ckpt").exists()
    assert (run_dir / "checkpoints" / "inprogress.json").exists()

    # plain rerun: resume: continue reuses the run dir, skips the completed
    # batches, finishes — byte-identical export
    log2 = _run(cfg)
    assert "resume: continue → reusing run dir" in log2
    assert "mid-epoch resume: skipping" in log2
    assert "✓ tiny_cnn" in log2
    assert not (run_dir / "checkpoints" / "inprogress.json").exists()
    (int_pth,) = list(int_out.rglob("tiny_cnn.pth"))
    assert hashlib.sha256(int_pth.read_bytes()).hexdigest() == ctrl_hash
