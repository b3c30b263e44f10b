"""predict.py CLI behavior with a tiny monkeypatched model bundle."""

import json
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def test_predict_cli_json(tmp_path, monkeypatch):
    # tiny dataset + config with a tiny model is heavy to wire through the
    # registry; instead exercise the predict code path in-process
    import web_ui
    from deepfakedetection_tpu.data.transforms import build_eval_plan
    from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step
    from tests.util import TinyCNN

    model = TinyCNN(num_classes=2, dtype=jnp.float32)
    params, batch_stats = init_model_variables(model, __import__("jax").random.key(0), (1, 32, 32, 3))
    bundle = web_ui.ModelBundle(
        name="tiny",
        display_label="Tiny",
        model=model,
        params=params,
        batch_stats=batch_stats,
        eval_step=make_eval_step(model),
        plan=build_eval_plan(32),
    )
    monkeypatch.setattr(web_ui, "MODEL_CACHE", [bundle])

    img = tmp_path / "x.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(img)

    # run the prediction loop body like predict.py does (without subprocess —
    # the registry would build the full B3)
    from deepfakedetection_tpu.data.decode import decode_pil_eval
    from deepfakedetection_tpu.data.augment import normalize_batch

    with Image.open(img) as im:
        arr = decode_pil_eval(im, bundle.plan)
    x = normalize_batch(jnp.asarray(arr)[None], bundle.plan, out_dtype=jnp.float32)
    probs = np.asarray(bundle.eval_step(bundle.params, bundle.batch_stats, x))[0]
    assert probs.shape == (2,)
    assert abs(probs.sum() - 1.0) < 1e-4


def test_predict_cli_help_runs():
    out = subprocess.run(
        [sys.executable, str(REPO / "predict.py"), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0 and "--input" in out.stdout
