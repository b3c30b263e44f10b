"""Full-pipeline two-implementation eval parity (VERDICT r3 #1).

The composed reference inference-job semantics — decode → eval transforms →
model → 501-point sweep → threshold decisions → metrics — run through BOTH
stacks (this repo's evaluate/job.py and the independent torch
reimplementation in tests/torch_refs/eval_pipeline.py) on the same
checkpoint and image tree, asserting per-image agreement.
"""

import numpy as np
import pytest
from PIL import Image

from deepfakedetection_tpu.data.decode import decode_pil_eval
from deepfakedetection_tpu.data.transforms import build_eval_plan
from torch_refs.eval_pipeline import eval_transform

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def test_crop_anchor_matches_torchvision_round_half_even():
    from deepfakedetection_tpu.data.decode import _crop_anchor

    for size in range(1, 80):
        for target in range(1, 80):
            if size >= target:
                expect = int(round((size - target) / 2.0))
            else:
                expect = -((target - size) // 2)
            assert _crop_anchor(size, target) == expect, (size, target)


def test_eval_decode_bit_matches_independent_torch_pipeline():
    """The production eval decode (data/decode.py) must produce BIT-identical
    uint8 pixels to the independent torchvision-semantics reimplementation —
    across aspect ratios hitting every (long_side - crop) % 4 residue
    (residue 3 is the round-half-even case floor division gets wrong)."""
    rng = np.random.default_rng(0)
    target = 64
    plan = build_eval_plan(target, {})
    # heights/widths chosen so resized long sides land on all 4 residues
    shapes = [(80, 80), (96, 71), (71, 96), (200, 131), (131, 200),
              (77, 160), (160, 77), (64, 64), (40, 52), (300, 299)]
    for h, w in shapes:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        ours = decode_pil_eval(img, plan)  # uint8 [64,64,3]
        theirs_chw = eval_transform(img, target)  # normalized CHW float
        # invert the normalize to recover uint8 pixels exactly
        theirs = np.transpose(theirs_chw, (1, 2, 0)) * IMAGENET_STD + IMAGENET_MEAN
        theirs_u8 = np.round(theirs * 255.0).astype(np.int64)
        np.testing.assert_array_equal(
            ours.astype(np.int64), theirs_u8, err_msg=f"shape {(h, w)}"
        )


def test_threshold_sweep_implementations_agree():
    """Both sweeps (evaluate/metrics.py and torch_refs/eval_pipeline.py)
    pick the same threshold on shared inputs, including plateau ties."""
    from deepfakedetection_tpu.evaluate.metrics import sweep_threshold as sweep_jax
    from torch_refs.eval_pipeline import sweep_threshold as sweep_ref

    rng = np.random.default_rng(1)
    for n, seed in ((30, 0), (101, 1), (512, 2)):
        r = np.random.default_rng(seed)
        targets = r.integers(0, 2, n)
        p1 = np.clip(r.normal(0.5 + 0.2 * (targets - 0.5), 0.25), 0, 1)
        assert sweep_jax(p1, targets) == pytest.approx(sweep_ref(p1, targets), abs=1e-12)
    # degenerate: constant probabilities
    targets = rng.integers(0, 2, 16)
    p1 = np.full(16, 0.25)
    assert sweep_jax(p1, targets) == pytest.approx(sweep_ref(p1, targets), abs=1e-12)


def test_roc_auc_implementations_agree():
    from deepfakedetection_tpu.evaluate.metrics import roc_auc as auc_jax
    from torch_refs.eval_pipeline import roc_auc as auc_ref

    for n, seed in ((50, 0), (333, 3)):
        r = np.random.default_rng(seed)
        targets = r.integers(0, 2, n)
        p1 = r.random(n)
        p1[: n // 4] = np.round(p1[: n // 4], 1)  # force ties
        a, b = auc_jax(targets, p1), auc_ref(targets, p1)
        assert a == pytest.approx(b, abs=1e-12)


@pytest.fixture(scope="module")
def parity_tree(tmp_path_factory):
    """Realistic-ish mixed-size JPEG tree (val+test) for the composed job."""
    root = tmp_path_factory.mktemp("parity_data")
    rng = np.random.default_rng(7)
    for split, n in (("val", 10), ("test", 12)):
        for ci, cls in enumerate(("fake", "real")):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                h = int(rng.integers(70, 180))
                w = int(rng.integers(70, 180))
                base = 70 if ci == 0 else 170
                arr = rng.normal(base, 45, (h, w, 3)).clip(0, 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"i{i:03d}.jpg", quality=92)
    return root


def _random_torch_ckpt(model_name, tmp_path):
    import torch

    torch.manual_seed(0)
    if model_name == "efficientnet_b3":
        from torch_refs.efficientnet_torch import EfficientNetB3

        m = EfficientNetB3(num_classes=2)
    else:
        from torch_refs.efficientformer_v2_torch import EfficientFormerV2S1

        m = EfficientFormerV2S1(num_classes=2)
    wpath = tmp_path / f"{model_name}_random.pth"
    torch.save(m.state_dict(), wpath)
    return wpath


def _head_tuned_torch_ckpt(model_name, tree, img_size, tmp_path):
    """A TRAINED checkpoint fixture (VERDICT r4 weak #3): fine-tune the
    torch reference model's classifier head for a few steps on the parity
    tree so probabilities spread to a real operating point — random-init
    probs are nearly tied, which forced loosened gates in earlier rounds.
    Head-only keeps this CPU-cheap (backbone forward only, no backbone
    grads)."""
    import torch

    from torch_refs.eval_pipeline import eval_transform, scan_folder

    torch.manual_seed(0)
    if model_name == "efficientnet_b3":
        from torch_refs.efficientnet_torch import EfficientNetB3

        m = EfficientNetB3(num_classes=2)
        heads = [m._fc]
    else:
        from torch_refs.efficientformer_v2_torch import EfficientFormerV2S1

        m = EfficientFormerV2S1(num_classes=2)
        heads = [m.head, m.head_dist]
    samples, _ = scan_folder(tree / "val")
    xs = torch.from_numpy(
        np.stack([eval_transform(Image.open(p), img_size) for p, _ in samples])
    )
    ys = torch.tensor([lbl for _, lbl in samples])
    m.eval()  # BN running stats untouched — eval-mode semantics throughout
    # one backbone pass → cached head-input features; the head(s) then
    # train on them directly (the backbone forward is the expensive part)
    feats: dict = {}
    hook = heads[0].register_forward_hook(
        lambda _m, inp, _o: feats.__setitem__("x", inp[0].detach())
    )
    with torch.no_grad():
        m(xs)
    hook.remove()
    pooled = feats["x"]
    head_params = [p for h in heads for p in h.parameters()]
    opt = torch.optim.Adam(head_params, lr=5e-2)
    for _ in range(60):
        opt.zero_grad()
        logits = heads[0](pooled)
        if len(heads) == 2:
            logits = (logits + heads[1](pooled)) / 2.0
        loss = torch.nn.functional.cross_entropy(logits, ys)
        loss.backward()
        opt.step()
    wpath = tmp_path / f"{model_name}_headtuned.pth"
    torch.save(m.state_dict(), wpath)
    return wpath


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["efficientnet_b3", "efficientformerv2_s1"])
def test_full_pipeline_parity_on_converted_checkpoint(parity_tree, tmp_path, model_name):
    """tools/parity.py --pipeline end to end: same torch ``.pth`` through the
    real JAX eval job AND the independent torch job; per-image prediction
    agreement, same sweep threshold (≤1 grid step), identical accuracy —
    for TWO families, so the composed-pipeline claim isn't B3-specific."""
    from tools.parity import run_pipeline_parity

    # torch_refs EFv2 builds its attention-bias index tables for 224 only
    # (timm's trainers pass img_size=224); B3 runs the cheap 64px geometry
    img_size = 64 if model_name == "efficientnet_b3" else 224
    # TRAINED-checkpoint fixture for both families (VERDICT r4 weak #3):
    # head-tuned probs sit at a real operating point, so BOTH families run
    # the same strict gates — no loosened AUC bound for EFv2 anymore
    wpath = _head_tuned_torch_ckpt(model_name, parity_tree, img_size, tmp_path)
    report = run_pipeline_parity(
        model_name, wpath, parity_tree, img_size=img_size, batch=8,
    )
    assert report.get("error") is None, report
    assert report["file_order_match"]
    assert report["n_images"] == 24
    assert report["pred_disagreements"] == 0, report
    assert report["threshold_step_delta"] <= 1.0, report
    assert report["accuracy_delta_images"] == 0, report
    assert report["max_prob_delta"] < 5e-3, report
    assert report.get("auroc_delta", 0.0) <= 1e-3, report
    assert report["gate_pipeline"], report


def test_reference_eval_skips_sweep_on_single_class_val(tmp_path):
    """Reference semantics (ref orchestrator.py:535-546): the threshold
    sweep only runs for binary tasks when val holds BOTH classes; a
    single-class val split keeps threshold=0.5 (advisor r4)."""
    torch = pytest.importorskip("torch")
    from torch_refs.eval_pipeline import run_reference_eval

    rng = np.random.default_rng(7)
    for split, classes in (("val", ["fake"]), ("test", ["fake", "real"])):
        for cls in classes:
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(
                    rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")

    class Const(torch.nn.Module):
        def forward(self, x):
            n = x.shape[0]
            out = torch.zeros((n, 2))
            out[:, 1] = x.mean(dim=(1, 2, 3))  # nondegenerate but arbitrary
            return out

    ref = run_reference_eval(Const(), tmp_path, img_size=32)
    assert ref["threshold"] == 0.5
