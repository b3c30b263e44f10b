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
