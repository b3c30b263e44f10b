"""PyTorch .pth → Flax conversion (the weight-parity path, SURVEY.md §7.8).

Builds a synthetic state dict shaped exactly like efficientnet_pytorch's
EfficientNet-B3 (the reference's training target, trainers/efficientnet.py:405)
and verifies every tensor lands in the Flax tree with correct layout.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deepfakedetection_tpu.models.efficientnet import create_efficientnet
from deepfakedetection_tpu.runtime.checkpoint import load_weights
from deepfakedetection_tpu.train.steps import init_model_variables

# efficientnet-b3 block structure: (repeats, expand_ratio, in, out, kernel)
# derived from the published compound scaling (models/efficientnet.py)
_B3_STAGES = [
    (2, 1, 40, 24, 3),
    (3, 6, 24, 32, 3),
    (3, 6, 32, 48, 5),
    (5, 6, 48, 96, 3),
    (5, 6, 96, 136, 5),
    (6, 6, 136, 232, 5),
    (2, 6, 232, 384, 3),
]


def _make_torch_state_dict(num_classes=2, seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return torch.tensor(rng.normal(scale=0.05, size=shape).astype(np.float32))

    sd = {}

    def bn(prefix, ch):
        sd[f"{prefix}.weight"] = t(ch) + 1.0
        sd[f"{prefix}.bias"] = t(ch)
        sd[f"{prefix}.running_mean"] = t(ch)
        sd[f"{prefix}.running_var"] = torch.abs(t(ch)) + 1.0

    sd["_conv_stem.weight"] = t(40, 3, 3, 3)
    bn("_bn0", 40)
    flat = 0
    for repeats, expand, cin, cout, k in _B3_STAGES:
        for rep in range(repeats):
            b = f"_blocks.{flat}"
            bin_ = cin if rep == 0 else cout
            mid = bin_ * expand
            if expand != 1:
                sd[f"{b}._expand_conv.weight"] = t(mid, bin_, 1, 1)
                bn(f"{b}._bn0", mid)
            sd[f"{b}._depthwise_conv.weight"] = t(mid, 1, k, k)
            bn(f"{b}._bn1", mid)
            se = max(1, bin_ // 4)
            sd[f"{b}._se_reduce.weight"] = t(se, mid, 1, 1)
            sd[f"{b}._se_reduce.bias"] = t(se)
            sd[f"{b}._se_expand.weight"] = t(mid, se, 1, 1)
            sd[f"{b}._se_expand.bias"] = t(mid)
            sd[f"{b}._project_conv.weight"] = t(cout, mid, 1, 1)
            bn(f"{b}._bn2", cout)
            flat += 1
    sd["_conv_head.weight"] = t(1536, 384, 1, 1)
    bn("_bn1", 1536)
    sd["_fc.weight"] = t(num_classes, 1536)
    sd["_fc.bias"] = t(num_classes)
    return sd


@pytest.mark.slow
def test_b3_state_dict_converts_completely(tmp_path):
    model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 64, 64, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }

    sd = _make_torch_state_dict()
    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / "efficientnet_b3.pth"
    pth.write_bytes(buf.getvalue())

    restored, unmatched = load_weights(pth, target, model_family="efficientnet")
    assert unmatched == [], f"unmatched: {unmatched[:10]}"

    # layout checks: conv OIHW→HWIO, dense [O,I]→[I,O]
    stem = np.asarray(restored["params"]["stem"]["kernel"])
    np.testing.assert_allclose(
        stem, sd["_conv_stem.weight"].numpy().transpose(2, 3, 1, 0)
    )
    fc = np.asarray(restored["params"]["classifier"]["kernel"])
    np.testing.assert_allclose(fc, sd["_fc.weight"].numpy().T)
    # BN stats routed into batch_stats
    np.testing.assert_allclose(
        np.asarray(restored["batch_stats"]["stem"]["var"]),
        sd["_bn0.running_var"].numpy(),
    )
    # every state-dict tensor consumed AND every changed leaf differs from init
    assert not np.allclose(
        np.asarray(restored["params"]["stage6_block1"]["project"]["kernel"]),
        np.asarray(target["params"]["stage6_block1"]["project"]["kernel"]),
    )

    # the converted tree must run
    logits = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        jnp.ones((1, 64, 64, 3)),
        train=False,
    )
    assert np.isfinite(np.asarray(logits)).all()


def _synthetic_state_dict_from_map(target, family, seed=0):
    """Generate a torch state dict covering EVERY name-map entry, with shapes
    inverted from the flax init tree — catches map/model naming drift for any
    family without needing the real timm/fastervit packages."""
    from deepfakedetection_tpu.runtime.torch_convert import _flatten, build_name_map

    rng = np.random.default_rng(seed)
    flat = _flatten(target)
    body = sorted({p[1:] for p in flat})
    name_map = build_name_map(family, body)
    assert name_map, f"no name map for {family}"
    sd, seen = {}, {}
    for tk, (path, kind) in name_map.items():
        is_stat = path[-1] in ("mean", "var")
        full = (("batch_stats",) if is_stat else ("params",)) + path
        if full not in flat or (path, kind) in seen:  # absent / alias entries
            continue
        shape = tuple(np.shape(flat[full]))
        if kind == "talking_head":
            tshape = (shape[1], shape[0], 1, 1)
        elif kind == "auto" and len(shape) == 4:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "auto" and len(shape) == 2:
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        arr = rng.normal(scale=0.05, size=tshape).astype(np.float32)
        if path[-1] == "var":
            arr = np.abs(arr) + 1.0
        sd[tk] = torch.tensor(arr)
        seen[(path, kind)] = sd[tk]
    return sd, name_map


def _roundtrip_family(model, family, size, tmp_path, extra_keys=()):
    from deepfakedetection_tpu.runtime.torch_convert import _layout

    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, size, size, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd, name_map = _synthetic_state_dict_from_map(target, family)
    for k in extra_keys:  # registered buffers that must be silently skipped
        sd[k] = torch.zeros(1)
    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / f"{family}.pth"
    pth.write_bytes(buf.getvalue())
    restored, unmatched = load_weights(pth, target, model_family=family)
    assert unmatched == [], f"unmatched: {unmatched[:10]} (+{max(0, len(unmatched)-10)})"
    # exhaustive layout check: every torch tensor landed where the map says
    flat_restored = {}

    def walk(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                flat_restored[prefix + (k,)] = v

    walk(restored)
    for tk, (path, kind) in name_map.items():
        if tk not in sd:
            continue
        is_stat = path[-1] in ("mean", "var")
        full = (("batch_stats",) if is_stat else ("params",)) + path
        np.testing.assert_allclose(
            np.asarray(flat_restored[full]),
            _layout(sd[tk].numpy(), kind),
            err_msg=f"{tk} -> {full}",
        )
    logits = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        jnp.ones((1, size, size, 3), jnp.float32),
        train=False,
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_efficientformer_v2_state_dict_converts_completely(tmp_path):
    from deepfakedetection_tpu.models.efficientformer_v2 import (
        create_efficientformer_v2,
    )

    model = create_efficientformer_v2("s1", num_classes=2, dtype=jnp.float32)
    _roundtrip_family(
        model,
        "efficientformerv2",
        224,
        tmp_path,
        extra_keys=("stem.conv1.bn.num_batches_tracked",),
    )


@pytest.mark.slow
def test_efficientformer_v2_conv_bias_folds_into_bn_mean(tmp_path):
    """Some timm builds give ConvNorm's conv a bias (PARITY.md's EFv2
    conv-bias question). conv(x)+b → BN(μ) ≡ conv(x) → BN(μ-b), so the
    converter must fold the bias into the running mean instead of leaving
    it unmatched (which would silently drop it)."""
    from deepfakedetection_tpu.models.efficientformer_v2 import (
        create_efficientformer_v2,
    )
    from deepfakedetection_tpu.runtime.torch_convert import (
        convert_torch_checkpoint,
    )

    model = create_efficientformer_v2("s1", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0), (1, 224, 224, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd, _ = _synthetic_state_dict_from_map(target, "efficientformerv2")
    bias = np.linspace(-0.5, 0.5, sd["stem.conv1.bn.running_mean"].shape[0])
    sd["stem.conv1.conv.bias"] = torch.tensor(bias.astype(np.float32))
    buf = io.BytesIO()
    torch.save(sd, buf)
    restored, unmatched = convert_torch_checkpoint(
        buf.getvalue(), target, model_family="efficientformerv2"
    )
    assert unmatched == [], f"unmatched: {unmatched[:10]}"
    np.testing.assert_allclose(
        np.asarray(restored["batch_stats"]["stem_0"]["mean"]),
        sd["stem.conv1.bn.running_mean"].numpy() - bias.astype(np.float32),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_fastervit_official_state_dict_converts_completely(tmp_path):
    from deepfakedetection_tpu.models.fastervit import create_faster_vit

    model = create_faster_vit(
        "2", num_classes=2, dtype=jnp.float32, head_config="official"
    )
    _roundtrip_family(
        model,
        "fastervit",
        224,
        tmp_path,
        extra_keys=(
            # persistent registered buffers in the wheel's pos-emb modules
            "levels.2.blocks.0.attn.pos_emb_funct.relative_coords_table",
            "levels.2.blocks.0.attn.pos_emb_funct.relative_position_index",
            "levels.2.blocks.0.attn.pos_emb_funct.relative_bias",
            "levels.2.blocks.0.pos_embed.relative_bias",
        ),
    )


def test_zero_match_fails_hard(tmp_path):
    model = create_efficientnet("b0", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd = {"totally.unknown.weight": torch.zeros(4)}
    buf = io.BytesIO()
    torch.save(sd, buf)
    pth = tmp_path / "junk.pth"
    pth.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="matched 0"):
        load_weights(pth, target, model_family="efficientnet")


def test_wrapped_state_dict_and_strictness(tmp_path):
    model = create_efficientnet("b0", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    # wrapper {"state_dict": …} with an extra unknown key (strict=False)
    sd = {
        "_conv_stem.weight": torch.zeros(32, 3, 3, 3),
        "some.unknown.tensor": torch.zeros(3),
    }
    buf = io.BytesIO()
    torch.save({"state_dict": sd}, buf)
    pth = tmp_path / "w.pth"
    pth.write_bytes(buf.getvalue())
    restored, unmatched = load_weights(pth, target, model_family="efficientnet")
    assert any("unknown" in u for u in unmatched)
    np.testing.assert_allclose(np.asarray(restored["params"]["stem"]["kernel"]), 0.0)
    # untouched leaves keep init values
    np.testing.assert_allclose(
        np.asarray(restored["params"]["classifier"]["kernel"]),
        np.asarray(target["params"]["classifier"]["kernel"]),
    )


def test_native_export_partial_mismatch_is_tolerant(tmp_path):
    """A msgpack export from a DIFFERENT configuration (e.g. other trace-time
    resolution) must load matching leaves and report the rest, strict=False
    style (reference orchestrator.py:370-375) — not raise."""
    import jax
    import jax.numpy as jnp

    from deepfakedetection_tpu.runtime.checkpoint import export_weights, load_weights
    from tests.util import TinyCNN

    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    # export, then mutate one leaf's shape in the target (simulating a
    # different head size) — the rest must still load
    pth = tmp_path / "w.pth"
    export_weights(pth, params, stats)
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(stats),
    }
    target["params"]["head"]["kernel"] = np.zeros((16, 5), np.float32)  # was (16,2)
    restored, unmatched = load_weights(pth, target)
    assert any("head" in u for u in unmatched)
    # a matching leaf actually loaded
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1"]["kernel"]),
        np.asarray(params["conv1"]["kernel"]),
    )
    # fully-alien checkpoint still fails hard
    alien = {"x": {"y": np.zeros((3,), np.float32)}}
    from flax import serialization

    bad = tmp_path / "alien.pth"
    bad.write_bytes(serialization.to_bytes(alien))
    with pytest.raises(ValueError, match="no tensors"):
        load_weights(bad, target)


def test_export_torch_state_dict_roundtrip_b3():
    """Reverse conversion (flax → torch layout) composed with the import
    path must reproduce every leaf bit-exactly (the migration surface for
    TPU-trained checkpoints + the pipeline-parity harness's torch side)."""
    import io as _io

    from deepfakedetection_tpu.models.efficientnet import create_efficientnet
    from deepfakedetection_tpu.runtime.torch_convert import (
        convert_torch_checkpoint,
        export_torch_state_dict,
    )

    model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(3), (1, 64, 64, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd = export_torch_state_dict(target, "efficientnet")
    assert len(sd) > 300
    buf = _io.BytesIO()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, buf)

    # import into a DIFFERENTLY-seeded init: every leaf must come back
    params2, stats2 = init_model_variables(model, jax.random.key(9), (1, 64, 64, 3))
    target2 = {
        "params": jax.device_get(params2),
        "batch_stats": jax.device_get(stats2),
    }
    restored, unmatched = convert_torch_checkpoint(
        buf.getvalue(), target2, model_family="efficientnet"
    )
    assert unmatched == []
    flat_a = jax.tree_util.tree_leaves_with_path(target)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_export_torch_state_dict_loads_into_torch_ref_model():
    """The reverse export's keys line up with the reference consumer's
    module naming: zero unexpected keys, zero missing (beyond BN counters)."""
    from deepfakedetection_tpu.models.efficientnet import create_efficientnet
    from deepfakedetection_tpu.runtime.torch_convert import export_torch_state_dict
    from torch_refs.efficientnet_torch import EfficientNetB3

    model = create_efficientnet("b3", num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 64, 64, 3))
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd = {
        k: torch.from_numpy(v)
        for k, v in export_torch_state_dict(target, "efficientnet").items()
    }
    tm = EfficientNetB3(num_classes=2)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, list(unexpected)[:5]
    real_missing = [m for m in missing if not m.endswith("num_batches_tracked")]
    assert not real_missing, real_missing[:5]


@pytest.mark.slow
@pytest.mark.parametrize(
    "family,make_model,size",
    [
        (
            "efficientformerv2",
            lambda: __import__(
                "deepfakedetection_tpu.models.efficientformer_v2",
                fromlist=["create_efficientformer_v2"],
            ).create_efficientformer_v2("s1", num_classes=2, dtype=jnp.float32),
            64,
        ),
        (
            "fastervit",
            lambda: __import__(
                "deepfakedetection_tpu.models.fastervit",
                fromlist=["create_faster_vit"],
            ).create_faster_vit(
                "2", num_classes=2, dtype=jnp.float32, head_config="official"
            ),
            224,
        ),
    ],
)
def test_export_torch_state_dict_roundtrip_other_families(family, make_model, size):
    """Reverse conversion round-trips bit-exactly for the transformer
    families too (224 for FasterViT so the HAT/carrier-token params are in
    the map)."""
    import io as _io

    from deepfakedetection_tpu.runtime.torch_convert import (
        convert_torch_checkpoint,
        export_torch_state_dict,
    )

    model = make_model()
    params, batch_stats = init_model_variables(
        model, jax.random.key(3), (1, size, size, 3)
    )
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    sd = export_torch_state_dict(target, family)
    assert len(sd) > 100
    buf = _io.BytesIO()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, buf)
    params2, stats2 = init_model_variables(model, jax.random.key(9), (1, size, size, 3))
    target2 = {
        "params": jax.device_get(params2),
        "batch_stats": jax.device_get(stats2),
    }
    restored, unmatched = convert_torch_checkpoint(
        buf.getvalue(), target2, model_family=family
    )
    assert unmatched == []
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(target),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))
