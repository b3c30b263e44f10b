"""Two-implementation Grad-CAM parity (VERDICT r4 missing #3).

The web-UI CAM surface (ref web_ui.py:241-306, GradCAM at :275-283) had
byte-compatible export tests and internal unit tests, but nothing
independent ever checked the CAM *values* — the same composed-semantics
risk class pipeline parity caught twice elsewhere. Here the repo's
jax.grad CAM (deepfakedetection_tpu/cam.py) runs against an independent
hook-based torch GradCAM (tests/torch_refs/gradcam_torch.py,
pytorch_grad_cam semantics) on IDENTICAL weights and inputs:

- fast tier: a hand-mirrored tiny CNN (weights copied tensor-by-tensor,
  no converter in the loop — isolates the CAM math itself)
- slow tier: B3 and FasterViT-official through the real converter
  name-maps (the full user-facing composition)

Overlay parity: both sides' show_cam_on_image must agree byte-for-byte on
the shared analytic jet once the grayscale CAMs agree.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_torch_convert import _synthetic_state_dict_from_map  # noqa: E402
from torch_refs.gradcam_torch import TorchGradCAM  # noqa: E402
from torch_refs.gradcam_torch import show_cam_on_image as torch_overlay  # noqa: E402

from deepfakedetection_tpu.cam import compute_cam, show_cam_on_image  # noqa: E402
from deepfakedetection_tpu.runtime.checkpoint import load_weights  # noqa: E402
from deepfakedetection_tpu.train.steps import init_model_variables  # noqa: E402


class _TinyFlax(nn.Module):
    """conv(3→8, relu) → conv(8→8) → sow → GAP → dense head."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME", name="c1")(x))
        x = nn.Conv(8, (3, 3), padding="SAME", name="c2")(x)
        self.sow("intermediates", "cam_features", x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(2, name="head")(x)


class _TinyTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = torch.nn.Conv2d(3, 8, 3, padding=1)
        self.c2 = torch.nn.Conv2d(8, 8, 3, padding=1)
        self.cam_point = torch.nn.Identity()
        self.head = torch.nn.Linear(8, 2)

    def forward(self, x):
        x = torch.relu(self.c1(x))
        x = self.cam_point(self.c2(x))
        x = x.mean(dim=(2, 3))
        return self.head(x)


def test_gradcam_matches_independent_torch_hook_impl():
    """CAM math isolation: identical hand-copied weights, no converter."""
    fm = _TinyFlax()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]

    tm = _TinyTorch()
    with torch.no_grad():
        # flax conv kernel HWIO → torch OIHW
        tm.c1.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["c1"]["kernel"]), (3, 2, 0, 1))))
        tm.c1.bias.copy_(torch.from_numpy(np.asarray(params["c1"]["bias"])))
        tm.c2.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["c2"]["kernel"]), (3, 2, 0, 1))))
        tm.c2.bias.copy_(torch.from_numpy(np.asarray(params["c2"]["bias"])))
        tm.head.weight.copy_(torch.from_numpy(
            np.asarray(params["head"]["kernel"]).T))
        tm.head.bias.copy_(torch.from_numpy(np.asarray(params["head"]["bias"])))

    # logits agree → same model
    fl = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.inference_mode():
        tl = tm(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    np.testing.assert_allclose(fl, tl, atol=1e-5)

    for cls_idx in (0, 1):
        cam_jax = np.asarray(compute_cam(fm, params, {}, jnp.asarray(x), cls_idx))
        grad_cam = TorchGradCAM(tm, tm.cam_point)
        cam_ref = grad_cam(
            torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(), cls_idx
        )
        grad_cam.remove()
        assert cam_jax.shape == cam_ref.shape == (3, 16, 16)
        np.testing.assert_allclose(cam_jax, cam_ref, atol=2e-5)

    # overlay composition: byte equality on the shared analytic jet
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    ours = show_cam_on_image(rgb, cam_jax[0])
    ref = torch_overlay(rgb, cam_ref[0])
    np.testing.assert_array_equal(ours, ref)


def _converted_pair(flax_model, family, torch_model, size, tmp_path):
    """Same synthetic weights in both stacks via the real converter."""
    import io

    params, batch_stats = init_model_variables(
        flax_model, jax.random.key(0), (1, size, size, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd, _ = _synthetic_state_dict_from_map(target, family, seed=3)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    allowed = ("num_batches_tracked", "global_tokenizer.pos_embed.weight",
               "global_tokenizer.pos_embed.bias")
    assert not [m for m in missing if not m.endswith(allowed)]
    assert not unexpected
    torch_model.eval()
    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / f"{family}_cam.pth"
    pth.write_bytes(buf.getvalue())
    restored, unmatched = load_weights(pth, target, model_family=family)
    assert unmatched == []
    return restored


def _assert_cam_parity(flax_model, restored, torch_model, hook_module, size,
                       atol):
    rng = np.random.default_rng(11)
    x = rng.normal(scale=1.0, size=(2, size, size, 3)).astype(np.float32)
    cam_jax = np.asarray(compute_cam(
        flax_model, restored["params"], restored["batch_stats"],
        jnp.asarray(x), 1,
    ))
    grad_cam = TorchGradCAM(torch_model, hook_module)
    cam_ref = grad_cam(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(), 1)
    grad_cam.remove()
    assert cam_jax.shape == cam_ref.shape == (2, size, size)
    delta = float(np.abs(cam_jax - cam_ref).max())
    assert delta < atol, f"CAM max delta {delta} (gate {atol})"
    # triptych panels: a CAM delta d propagates through the jet ramp
    # (max slope 4/unit) and the 0.5 blend to at most 255·0.5·4·d uint8
    # steps, so the overlay gate derives from the CAM gate (measured:
    # CAM 0.0055 → 3 bytes, exactly on this line)
    rgb = rng.random((size, size, 3)).astype(np.float32)
    panel_ours = show_cam_on_image(rgb, cam_jax[0])
    panel_ref = torch_overlay(rgb, cam_ref[0])
    diff = np.abs(panel_ours.astype(np.int16) - panel_ref.astype(np.int16))
    byte_gate = int(np.ceil(255.0 * 0.5 * 4.0 * atol)) + 1
    assert diff.max() <= byte_gate, f"overlay byte delta {diff.max()}"


@pytest.mark.slow
def test_cam_parity_efficientnet_b3_converted(tmp_path, monkeypatch):
    from torch_refs.efficientnet_torch import EfficientNetB3

    from deepfakedetection_tpu.models.efficientnet import create_efficientnet

    flax_model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    tm = EfficientNetB3(num_classes=2)
    restored = _converted_pair(flax_model, "efficientnet", tm, 224, tmp_path)
    # target layers: flax sow after head_conv BN+SiLU (efficientnet.py:234)
    # ≡ torch _cam_point (the post-silu(bn1(conv_head)) Identity)
    # gate 1e-2 on a [0,1] map: the 26-block f32 forward drifts
    # ~5e-3 relative between frameworks (oneDNN vs XLA accumulation
    # order); the per-image max-normalize amplifies it at the hot spot.
    # Measured 0.0055; anything structural would be orders larger.
    _assert_cam_parity(flax_model, restored, tm, tm._cam_point, 224, 1e-2)


@pytest.mark.slow
def test_cam_parity_fastervit_official_converted(tmp_path, monkeypatch):
    import deepfakedetection_tpu.models.common as common
    from torch_refs.fastervit_torch import FasterViT2

    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    # torch GELU is exact erf; align the flax side for tight numerics
    monkeypatch.setattr(common, "_EXACT_GELU", True)
    flax_model = create_faster_vit(
        "2", num_classes=2, dtype=jnp.float32, head_config="official"
    )
    tm = FasterViT2(num_classes=2)
    restored = _converted_pair(flax_model, "fastervit", tm, 224, tmp_path)
    # target layers: flax sow after norm_out (fastervit.py:665) ≡ torch
    # final BatchNorm2d `norm`
    _assert_cam_parity(flax_model, restored, tm, tm.norm, 224, 5e-3)
