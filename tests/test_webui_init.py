"""web_ui.initialize_from_config: bundles, class labels, unknown-model skip."""

import jax.numpy as jnp
import numpy as np
import yaml

import web_ui
from tests.util import tiny_spec


def test_initialize_from_config_builds_bundles(tmp_path, monkeypatch):
    cfg = {
        "data": {
            "root": str(tmp_path / "data"),
            "num_classes": 2,
            "img_size": 32,
            "class_labels": {"0": "synthetic", "1": "genuine"},
        },
        "models": {
            "efficientnet_b3": {
                "display_name": "Tiny Display",
                "output_dir": str(tmp_path / "runs/t"),
            }
        },
        "selection": ["efficientnet_b3"],
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    # swap the registry so the heavy B3 never builds (web_ui resolves
    # specs through the orchestrator's build_eval_job)
    import deepfakedetection_tpu.orchestrator as orchestrator

    spec = tiny_spec()
    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: spec)
    monkeypatch.chdir(tmp_path)

    web_ui.initialize_from_config(p)
    assert len(web_ui.MODEL_CACHE) == 1
    bundle = web_ui.MODEL_CACHE[0]
    assert bundle.display_label == "Tiny Display"
    assert web_ui.CLASS_LABELS == {0: "synthetic", 1: "genuine"}
    # the bundle is runnable
    x = jnp.asarray(np.zeros((1, 32, 32, 3), np.float32))
    probs = np.asarray(bundle.eval_step(bundle.params, bundle.batch_stats, x))
    assert probs.shape == (1, 2)


def test_tee_and_throughput(tmp_path):
    from deepfakedetection_tpu.runtime.logging import Throughput, tee_output

    log = tmp_path / "x.log"
    with tee_output(log):
        print("hello-tee")
    assert "hello-tee" in log.read_text()

    meter = Throughput()
    v1 = meter.update(10)
    v2 = meter.update(10)
    assert v1 > 0 and meter.seen == 20 and v2 > 0
