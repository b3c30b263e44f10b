"""inference.tta: hflip probability averaging + config plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfakedetection_tpu.train.steps import init_model_variables, make_eval_step
from tests.util import tiny_spec


def test_hflip_tta_averages_probs():
    model = tiny_spec().builder(2)
    params, batch_stats = init_model_variables(model, jax.random.key(0), (1, 32, 32, 3))
    x = jax.random.uniform(jax.random.key(1), (3, 32, 32, 3), jnp.float32)

    plain = make_eval_step(model)
    tta = make_eval_step(model, tta="hflip")
    expected = 0.5 * (
        np.asarray(plain(params, batch_stats, x))
        + np.asarray(plain(params, batch_stats, x[:, :, ::-1, :]))
    )
    got = np.asarray(tta(params, batch_stats, x))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # still a distribution
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
    # a mirror-symmetric input makes TTA a no-op
    sym = jnp.concatenate([x[:, :, :16], x[:, :, :16][:, :, ::-1]], axis=2)
    np.testing.assert_allclose(
        np.asarray(tta(params, batch_stats, sym)),
        np.asarray(plain(params, batch_stats, sym)),
        rtol=1e-5, atol=1e-6,
    )


def test_config_tta_validation_and_plumbing(tmp_path):
    import yaml

    from deepfakedetection_tpu.config import load_config
    from deepfakedetection_tpu.orchestrator import build_eval_job
    from deepfakedetection_tpu.runtime.paths import ensure_run_dirs

    cfg = {
        "data": {"root": str(tmp_path), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"inference": {"tta": "vflip"}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="tta"):
        load_config(p)

    cfg["models"]["efficientnet_b3"]["inference"]["tta"] = "hflip"
    p.write_text(yaml.safe_dump(cfg))
    config = load_config(p)
    run_paths = ensure_run_dirs(tmp_path / "runs/x", run_id="t")
    model_cfg = dict(config["models"]["efficientnet_b3"], name="efficientnet_b3")
    job = build_eval_job(config, "efficientnet_b3", model_cfg, run_paths)
    assert job.tta == "hflip"
    assert job.lookahead == 2
