"""tools/convert.py: conversion CLI mechanics over the tiny model."""

import jax
import numpy as np

from tests.util import tiny_spec


def test_convert_roundtrip_native(tmp_path, monkeypatch):
    import deepfakedetection_tpu.registry as registry
    from deepfakedetection_tpu.runtime.checkpoint import export_weights, load_weights
    from deepfakedetection_tpu.train.steps import init_model_variables
    from tools.convert import convert

    spec = tiny_spec()
    monkeypatch.setattr(registry, "get_model_spec", lambda name: spec)

    model = spec.builder(2)
    params, batch_stats = init_model_variables(model, jax.random.key(3), (1, 32, 32, 3))
    src = tmp_path / "src.msgpack"
    export_weights(src, jax.device_get(params), jax.device_get(batch_stats))

    out = tmp_path / "out.msgpack"
    report = convert("tiny_cnn", src, out, img_size=32)
    assert out.exists()
    assert report["unmatched_count"] == 0
    assert report["target_tensors"] == len(
        jax.tree.leaves({"params": params, "batch_stats": batch_stats})
    )

    # the converted file loads back bit-identical
    params2, batch_stats2 = init_model_variables(model, jax.random.key(9), (1, 32, 32, 3))
    restored, unmatched = load_weights(
        out, {"params": jax.device_get(params2), "batch_stats": jax.device_get(batch_stats2)}
    )
    assert not unmatched
    for a, b in zip(
        jax.tree.leaves(restored["params"]), jax.tree.leaves(jax.device_get(params))
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
