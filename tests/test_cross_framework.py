"""Cross-framework logit parity (the 0.1% gate, run offline).

The real timm/fastervit packages aren't installable here (zero egress), so
tests/torch_refs/ carries minimal PyTorch reimplementations with the
reference consumers' exact module naming and forward semantics. The SAME
synthetic state dict loads into the torch model (strict module-name check)
and converts into the Flax model (zero unmatched); logits on identical
inputs must agree. This cross-checks the converter AND the architectural
semantics (op order, bias indexing, eps, padding grids) through two
independent implementations.
"""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_torch_convert import _synthetic_state_dict_from_map  # noqa: E402

from deepfakedetection_tpu.runtime.checkpoint import load_weights  # noqa: E402
from deepfakedetection_tpu.train.steps import init_model_variables  # noqa: E402


def _cross_check(flax_model, family, torch_model, size, tmp_path, monkeypatch, seed=0):
    # torch nn.GELU is exact erf; switch the flax side to match bitwise
    import deepfakedetection_tpu.models.common as common

    monkeypatch.setattr(common, "_EXACT_GELU", True)

    params, batch_stats = init_model_variables(
        flax_model, jax.random.key(0), (1, size, size, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd, _ = _synthetic_state_dict_from_map(target, family, seed=seed)

    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    # allowed-missing: BN counters, and the wheel's DUAL-registered tokenizer
    # conv (the synthetic dict carries the to_global_feature.pos spelling;
    # loading it fills the shared module, so pos_embed.* is nominally
    # "missing" but correctly populated)
    allowed = ("num_batches_tracked", "global_tokenizer.pos_embed.weight",
               "global_tokenizer.pos_embed.bias")
    bad_missing = [m for m in missing if not m.endswith(allowed)]
    assert not bad_missing, f"torch ref missing: {bad_missing[:8]}"
    assert not unexpected, f"torch ref unexpected: {list(unexpected)[:8]}"
    torch_model.eval()

    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / f"{family}.pth"
    pth.write_bytes(buf.getvalue())
    restored, unmatched = load_weights(pth, target, model_family=family)
    assert unmatched == [], f"unmatched: {unmatched[:8]}"

    rng = np.random.default_rng(seed)
    x = rng.normal(scale=1.0, size=(2, size, size, 3)).astype(np.float32)
    flax_logits = np.asarray(
        jax.jit(
            lambda v, xx: flax_model.apply(v, xx, train=False)
        )({"params": restored["params"], "batch_stats": restored["batch_stats"]},
          jnp.asarray(x))
    )
    with torch.inference_mode():
        t_logits = (
            torch_model(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
            .numpy()
        )
    scale = max(float(np.abs(t_logits).max()), 1e-3)
    delta = float(np.abs(flax_logits - t_logits).max())
    assert delta / scale < 5e-3, (
        f"logit mismatch: max|Δ|={delta:.5f} scale={scale:.3f}\n"
        f"flax={flax_logits}\ntorch={t_logits}"
    )
    assert (flax_logits.argmax(-1) == t_logits.argmax(-1)).all()


@pytest.mark.slow
def test_efficientformer_v2_matches_torch_reimplementation(tmp_path, monkeypatch):
    from torch_refs.efficientformer_v2_torch import EfficientFormerV2S1

    from deepfakedetection_tpu.models.efficientformer_v2 import (
        create_efficientformer_v2,
    )

    flax_model = create_efficientformer_v2("s1", num_classes=2, dtype=jnp.float32)
    _cross_check(
        flax_model, "efficientformerv2", EfficientFormerV2S1(num_classes=2),
        224, tmp_path, monkeypatch,
    )


@pytest.mark.slow
def test_fastervit_official_matches_torch_reimplementation(tmp_path, monkeypatch):
    from torch_refs.fastervit_torch import FasterViT2

    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    flax_model = create_faster_vit(
        "2", num_classes=2, dtype=jnp.float32, head_config="official"
    )
    _cross_check(
        flax_model, "fastervit", FasterViT2(num_classes=2), 224, tmp_path,
        monkeypatch,
    )


@pytest.mark.slow
def test_efficientnet_b3_matches_torch_reimplementation(tmp_path, monkeypatch):
    from torch_refs.efficientnet_torch import EfficientNetB3

    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    flax_model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    _cross_check(
        flax_model, "efficientnet", EfficientNetB3(num_classes=2), 224,
        tmp_path, monkeypatch,
    )
