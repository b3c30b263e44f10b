"""tools/parity.py harness (SURVEY.md §7.8 gate plumbing), synthetic weights."""

import io
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from test_torch_convert import _synthetic_state_dict_from_map  # noqa: E402

from deepfakedetection_tpu.models.efficientnet import create_efficientnet  # noqa: E402
from deepfakedetection_tpu.train.steps import init_model_variables  # noqa: E402


@pytest.mark.slow
def test_parity_harness_offline_tiers(tmp_path):
    from parity import run_parity

    model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 64, 64, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd, _ = _synthetic_state_dict_from_map(target, "efficientnet")
    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / "efficientnet_b3.pth"
    pth.write_bytes(buf.getvalue())

    report = run_parity(
        "efficientnet_b3", pth, images=None, img_size=64, batch=2, num_classes=2
    )
    assert report["torch_checkpoint"] is True
    assert report["unmatched_torch_keys"] == 0
    # eval-mode model must be batch-size invariant (folded BN, no batch deps)
    assert report["batch_invariance_max_delta"] < 1e-4
    assert 0.0 <= report["bf16_top1_agreement"] <= 1.0
    assert report["bf16_max_logit_delta"] >= 0.0
    # tier 3b: per-block probes against the in-repo torch reference must
    # exist for every stage and agree on matching synthetic weights
    probes = report.get("block_probes", {})
    assert len(probes) == 7, probes  # one per B3 stage
    for label, delta in probes.items():
        assert isinstance(delta, float) and delta < 5e-2, (label, delta)


def test_pipeline_parity_restores_process_globals(tmp_path, monkeypatch):
    """run_pipeline_parity pins matmul precision + DFD_DISABLE_PALLAS for
    the measurement; both must be restored afterwards so in-process callers
    (this pytest process) don't inherit changed numerics/kernel dispatch
    (advisor r4)."""
    import os

    import tools.parity as parity

    monkeypatch.delenv("DFD_DISABLE_PALLAS", raising=False)
    prior_prec = jax.config.jax_default_matmul_precision

    def fake_impl(*args, **kwargs):
        # mimic the real impl's process-global pinning
        jax.config.update("jax_default_matmul_precision", "highest")
        os.environ["DFD_DISABLE_PALLAS"] = "1"
        return {"ok": True}

    monkeypatch.setattr(parity, "_run_pipeline_parity_impl", fake_impl)
    out = parity.run_pipeline_parity("efficientnet_b3", tmp_path / "w", tmp_path)
    assert out == {"ok": True}
    assert jax.config.jax_default_matmul_precision == prior_prec
    assert os.environ.get("DFD_DISABLE_PALLAS") is None

    # restoration must also run when the impl raises
    def raising_impl(*args, **kwargs):
        jax.config.update("jax_default_matmul_precision", "highest")
        os.environ["DFD_DISABLE_PALLAS"] = "1"
        raise RuntimeError("boom")

    monkeypatch.setattr(parity, "_run_pipeline_parity_impl", raising_impl)
    with pytest.raises(RuntimeError, match="boom"):
        parity.run_pipeline_parity("efficientnet_b3", tmp_path / "w", tmp_path)
    assert jax.config.jax_default_matmul_precision == prior_prec
    assert os.environ.get("DFD_DISABLE_PALLAS") is None


def test_threshold_step_delta_counts_grid_indices():
    """One legitimate sweep-grid step must report exactly 1 even though
    np.linspace(0,1,501) steps aren't exactly 0.002 in float64
    (advisor r4: 1.0000000000000002 > 1.0 flipped the gate)."""
    import numpy as np

    grid = np.linspace(0.0, 1.0, 501)
    # adjacent grid points whose raw delta/0.002 exceeds 1.0 in float64
    worst = None
    for i in range(500):
        ratio = abs(grid[i + 1] - grid[i]) / 0.002
        if worst is None or ratio > worst[0]:
            worst = (ratio, i)
    _, i = worst
    thr_a, thr_b = float(grid[i]), float(grid[i + 1])
    assert abs(round(thr_a / 0.002) - round(thr_b / 0.002)) == 1
