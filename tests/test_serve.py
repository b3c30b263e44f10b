"""serve.py: micro-batcher semantics + HTTP endpoint over a tiny model."""

from __future__ import annotations

import io
import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest
import yaml
from PIL import Image

import serve
from serve import MicroBatcher, _bucket
from tests.util import tiny_spec


def test_bucket_rounds_to_power_of_two():
    assert [_bucket(n, 32) for n in (1, 2, 3, 5, 8, 9, 31, 32, 40)] == [
        1, 2, 4, 8, 8, 16, 32, 32, 32,
    ]


def test_microbatcher_coalesces_and_pads():
    seen_batches: list[int] = []

    def runner(batch: np.ndarray) -> np.ndarray:
        # padded to a power-of-two bucket, zeros in the tail
        assert batch.shape[0] & (batch.shape[0] - 1) == 0
        seen_batches.append(batch.shape[0])
        # echo the per-item mean so results can be matched to submissions
        return np.stack([np.full((2,), a.mean(), np.float32) for a in batch])

    mb = MicroBatcher(runner, max_batch=8, max_wait_ms=50.0, name="t")
    arrs = [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    futs = [mb.submit(a) for a in arrs]
    results = [f.result(timeout=10) for f in futs]
    for i, r in enumerate(results):
        assert r[0] == pytest.approx(float(i))
    stats = mb.stats()
    assert stats["requests"] == 5
    # 5 submissions arrive fast → should coalesce into few batches, each
    # padded to a power of two
    assert stats["batches"] <= 5
    assert all(b in (1, 2, 4, 8) for b in seen_batches)
    assert "latency_ms_p50" in stats
    mb.stop()


def test_microbatcher_concurrent_stress():
    # 64 submissions from 16 threads over several rounds: every future must
    # resolve with its own echo (no deadlock, no cross-wiring)
    def runner(batch: np.ndarray) -> np.ndarray:
        time.sleep(0.002)  # make coalescing windows overlap
        return np.stack([np.full((2,), a.mean(), np.float32) for a in batch])

    mb = MicroBatcher(runner, max_batch=8, max_wait_ms=3.0, name="stress")
    with ThreadPoolExecutor(max_workers=16) as ex:
        def submit_and_wait(i: int) -> float:
            fut = mb.submit(np.full((2, 2, 3), i % 251, np.uint8))
            return float(fut.result(timeout=30)[0])

        results = list(ex.map(submit_and_wait, range(64)))
    assert results == [float(i % 251) for i in range(64)]
    stats = mb.stats()
    assert stats["requests"] == 64
    assert stats["batches"] <= 64
    mb.stop()


def test_microbatcher_propagates_runner_errors():
    def runner(batch: np.ndarray) -> np.ndarray:
        raise RuntimeError("device on fire")

    mb = MicroBatcher(runner, max_batch=4, max_wait_ms=1.0, name="err")
    fut = mb.submit(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(RuntimeError, match="device on fire"):
        fut.result(timeout=10)
    mb.stop()


@pytest.fixture()
def serve_state(tmp_path, monkeypatch):
    """ServeState over the tiny CNN (registry swapped like test_webui_init)."""
    cfg = {
        "data": {
            "root": str(tmp_path / "data"),
            "num_classes": 2,
            "img_size": 32,
            "class_labels": {"0": "fake", "1": "real"},
        },
        "models": {
            "efficientnet_b3": {
                "display_name": "Tiny Serve",
                "output_dir": str(tmp_path / "runs/t"),
            }
        },
        "selection": ["efficientnet_b3"],
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    import deepfakedetection_tpu.orchestrator as orchestrator

    spec = tiny_spec()
    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: spec)
    monkeypatch.chdir(tmp_path)
    return serve.build_state(p, max_batch=8, max_wait_ms=5.0)


def _jpeg_bytes(value: int = 128) -> bytes:
    img = Image.fromarray(np.full((40, 48, 3), value, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def test_warmup_compiles_buckets(serve_state):
    # exercises every bucket runner path; stats must not count warmups
    serve_state.warmup("all")
    stats = serve_state.models[0].batcher.stats()
    assert stats["requests"] == 0
    serve_state.warmup("none")  # no-op


def test_predict_once_shapes_and_labels(serve_state):
    img = Image.open(io.BytesIO(_jpeg_bytes()))
    results = serve.predict_once(serve_state, img)
    assert len(results) == 1
    r = results[0]
    assert r["model"] == "efficientnet_b3"
    assert r["display_name"] == "Tiny Serve"
    assert r["label"] in ("fake", "real")
    assert len(r["probs"]) == 2
    assert r["confidence"] == pytest.approx(max(r["probs"]))
    assert sum(r["probs"]) == pytest.approx(1.0, abs=1e-4)


def test_threshold_overrides_argmax(serve_state):
    # force the decision threshold to 0 → class 1 always chosen (ref
    # orchestrator.py:605-607 semantics: p(class1) >= threshold)
    serve_state.models[0].threshold = 0.0
    img = Image.open(io.BytesIO(_jpeg_bytes()))
    r = serve.predict_once(serve_state, img)[0]
    assert r["class_index"] == 1
    serve_state.models[0].threshold = 1.1
    r = serve.predict_once(serve_state, img)[0]
    assert r["class_index"] == 0


def test_threshold_auto_reads_latest_sweep(tmp_path, monkeypatch):
    runs = tmp_path / "runs/t"
    for run_id, (thr, ts) in {
        "r1": (0.30, "2026-08-17T10:00:00"),
        "r2": (0.42, "2026-08-18T10:00:00"),
    }.items():
        d = runs / run_id / "logs"
        d.mkdir(parents=True)
        (d / "metrics.jsonl").write_text(
            json.dumps({"model": "m", "accuracy": 1.0}) + "\n"
            + json.dumps({"model": "m", "threshold": thr, "timestamp": ts}) + "\n"
        )
    assert serve.latest_sweep_threshold(runs) == pytest.approx(0.42)
    assert serve.latest_sweep_threshold(tmp_path / "missing") is None

    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {
                "output_dir": str(runs),
                "inference": {"threshold": "auto"},
            }
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0)
    assert state.models[0].threshold == pytest.approx(0.42)
    state.close()


def test_serve_applies_latest_temperature(tmp_path, monkeypatch):
    """inference.calibration: temperature → probs served at the newest
    calibrated eval run's fitted T (consistent with its sweep threshold)."""
    runs = tmp_path / "runs/t"
    d = runs / "r1" / "logs"
    d.mkdir(parents=True)
    (d / "metrics.jsonl").write_text(
        json.dumps(
            {"model": "m", "temperature": 2.0, "threshold": 0.5,
             "timestamp": "2026-08-18T10:00:00"}
        )
        + "\n"
    )
    assert serve.latest_metric_value(runs, "temperature") == pytest.approx(2.0)

    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {
                "output_dir": str(runs),
                "inference": {"calibration": "temperature"},
            }
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0)
    try:
        assert state.models[0].temperature == pytest.approx(2.0)
        img = Image.open(io.BytesIO(_jpeg_bytes()))
        calibrated = serve.predict_once(state, img)[0]
        state.models[0].temperature = None
        raw = serve.predict_once(state, img)[0]
        # T=2 softens toward uniform but keeps the ranking
        from deepfakedetection_tpu.evaluate.metrics import apply_temperature

        expect = apply_temperature(np.asarray([raw["probs"]]), 2.0)[0]
        np.testing.assert_allclose(calibrated["probs"], expect, atol=1e-6)
        assert abs(calibrated["probs"][1] - 0.5) <= abs(raw["probs"][1] - 0.5) + 1e-12
    finally:
        state.close()


def test_config_threshold_validation(tmp_path):
    from deepfakedetection_tpu.config import load_config

    cfg = {
        "data": {"root": "d", "num_classes": 2},
        "models": {"efficientnet_b3": {"inference": {"threshold": 1.5}}},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(Exception, match="threshold"):
        load_config(p)
    cfg["models"]["efficientnet_b3"]["inference"]["threshold"] = "AUTO"
    p.write_text(yaml.safe_dump(cfg))
    assert load_config(p)["models"]["efficientnet_b3"]["inference"]["threshold"] == "auto"


def test_multi_model_fanout_and_filter(tmp_path, monkeypatch):
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {"output_dir": str(tmp_path / "runs/a")},
            "efficientformerv2_s1": {"output_dir": str(tmp_path / "runs/b")},
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    import deepfakedetection_tpu.orchestrator as orchestrator

    spec = tiny_spec()
    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: spec)
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0)
    # yaml.safe_dump sorts keys; selection defaults to the models order
    assert sorted(m.name for m in state.models) == [
        "efficientformerv2_s1", "efficientnet_b3",
    ]
    img = Image.open(io.BytesIO(_jpeg_bytes()))
    results = serve.predict_once(state, img)
    assert sorted(r["model"] for r in results) == [
        "efficientformerv2_s1", "efficientnet_b3",
    ]
    only = serve.predict_once(state, img, only="efficientformerv2_s1")
    assert len(only) == 1 and only[0]["model"] == "efficientformerv2_s1"
    with pytest.raises(KeyError):
        serve.predict_once(state, img, only="nope")
    for m in state.models:
        m.batcher.stop()


def test_http_endpoints_and_concurrent_batching(serve_state, tmp_path):
    server = serve.build_server(tmp_path / "unused.yaml", port=0, state=serve_state)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["models"] == ["efficientnet_b3"]

        payload = _jpeg_bytes()

        def post(val: int):
            req = urllib.request.Request(
                f"{base}/predict", data=_jpeg_bytes(val), method="POST"
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                return json.loads(resp.read())

        # warm the jit on a single request first
        first = post(100)
        assert first["results"][0]["label"] in ("fake", "real")

        # concurrent posts exercise the coalescing path
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(post, [10, 90, 170, 250]))
        assert all(len(o["results"]) == 1 for o in outs)

        # JSON body with base64 image
        import base64

        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"image_b64": base64.b64encode(payload).decode()}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert out["results"][0]["model"] == "efficientnet_b3"

        # unknown model → 404
        req = urllib.request.Request(
            f"{base}/predict?model=nope", data=payload, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 404

        # garbage body → 400
        req = urllib.request.Request(
            f"{base}/predict", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as resp:
            stats = json.loads(resp.read())
        assert stats["efficientnet_b3"]["requests"] >= 6
        assert stats["efficientnet_b3"]["batches"] >= 1
    finally:
        server.shutdown()
        thread.join(timeout=10)
        for m in serve_state.models:
            m.batcher.stop()
        time.sleep(0.05)


def test_serve_ensemble_entry(tmp_path, monkeypatch):
    """ensemble: true adds a softmax-averaged 'ensemble' record to the full
    fan-out (weighted mean of member probs; absent for ?model= requests)."""
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {"output_dir": str(tmp_path / "runs/a")},
            "efficientformerv2_s1": {"output_dir": str(tmp_path / "runs/b")},
        },
        "ensemble": {"weights": {"efficientnet_b3": 3.0, "efficientformerv2_s1": 1.0}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    import deepfakedetection_tpu.orchestrator as orchestrator

    spec = tiny_spec()
    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: spec)
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0)
    try:
        img = Image.open(io.BytesIO(_jpeg_bytes()))
        results = serve.predict_once(state, img)
        by_model = {r["model"]: r for r in results}
        assert "ensemble" in by_model
        expected = (
            3.0 * np.asarray(by_model["efficientnet_b3"]["probs"])
            + 1.0 * np.asarray(by_model["efficientformerv2_s1"]["probs"])
        ) / 4.0
        np.testing.assert_allclose(by_model["ensemble"]["probs"], expected, atol=1e-9)
        assert by_model["ensemble"]["label"] in ("fake", "real")
        # single-model filter must not emit the ensemble entry
        only = serve.predict_once(state, img, only="efficientnet_b3")
        assert [r["model"] for r in only] == ["efficientnet_b3"]
    finally:
        state.close()


def test_native_request_decode_matches_pil(tmp_path, monkeypatch):
    """--native-decode path: probabilities match the PIL path to decode
    noise; non-JPEG/PNG bodies fall back to PIL per request."""
    from deepfakedetection_tpu.data import native

    if not (native.available() and native.has_buffer_batch()):
        pytest.skip("native loader not built")
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"output_dir": str(tmp_path / "runs/a")}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    spec = tiny_spec()
    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: spec)
    monkeypatch.chdir(tmp_path)
    state_pil = serve.build_state(p, max_batch=4, max_wait_ms=2.0, native_decode=False)
    state_nat = serve.build_state(p, max_batch=4, max_wait_ms=2.0, native_decode=True)
    assert not state_pil.native_decode and state_nat.native_decode
    try:
        # smooth gradient image: resampling-filter deltas stay sub-LSB
        grad = np.linspace(0, 255, 48 * 56 * 3).reshape(48, 56, 3).astype(np.uint8)
        img = Image.fromarray(grad)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        raw = buf.getvalue()
        r_pil = serve.predict_once(state_pil, Image.open(io.BytesIO(raw)), raw=raw)[0]
        r_nat = serve.predict_once(state_nat, Image.open(io.BytesIO(raw)), raw=raw)[0]
        np.testing.assert_allclose(r_nat["probs"], r_pil["probs"], atol=5e-3)

        # BMP is not native-decodable → per-request PIL fallback, same result
        buf2 = io.BytesIO()
        img.save(buf2, format="BMP")
        r_bmp = serve.predict_once(
            state_nat, Image.open(io.BytesIO(buf2.getvalue())), raw=buf2.getvalue()
        )[0]
        assert r_bmp["probs"] == pytest.approx(r_pil["probs"], abs=5e-3)
    finally:
        state_pil.close()
        state_nat.close()


def test_native_mode_truncated_body_is_still_400(tmp_path, monkeypatch):
    """A truncated JPEG passes the cheap header verify in native mode; the
    deferred pixel decode failure must still map to 400, not 500."""
    from deepfakedetection_tpu.data import native

    if not (native.available() and native.has_buffer_batch()):
        pytest.skip("native loader not built")
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"output_dir": str(tmp_path / "runs/a")}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    state = serve.build_state(p, max_batch=4, max_wait_ms=2.0, native_decode=True)
    server = serve.build_server(p, port=0, state=state)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    try:
        # header-complete but pixel-truncated JPEG
        full = _jpeg_bytes()
        truncated = full[: len(full) // 2]
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=truncated, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=60)
        assert exc_info.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=10)
        state.close()


def test_metrics_endpoint_prometheus_format(serve_state):
    from pathlib import Path

    server = serve.build_server(Path("unused.yaml"), port=0, state=serve_state)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    try:
        # score one image so counters are non-zero
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=_jpeg_bytes(), method="POST"
        )
        urllib.request.urlopen(req, timeout=60).read()
        with urllib.request.urlopen(f"http://{host}:{port}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert '# TYPE dfd_requests_total counter' in text
        assert 'dfd_requests_total{model="efficientnet_b3"} 1' in text
        assert 'dfd_request_latency_ms{model="efficientnet_b3",quantile="0.5"}' in text
    finally:
        server.shutdown()
        thread.join(timeout=10)
        serve_state.close()


def test_reload_reresolves_threshold_and_temperature(tmp_path, monkeypatch):
    """POST /reload swaps in a fresh state resolving the NEWEST eval
    records — a retrain + re-sweep during a long-running serve no longer
    leaves stale decision parameters (VERDICT r3 weak #4)."""
    runs = tmp_path / "runs/t"
    d = runs / "r1/logs"
    d.mkdir(parents=True)
    d.joinpath("metrics.jsonl").write_text(
        json.dumps(
            {"model": "m", "threshold": 0.30, "timestamp": "2026-08-17T10:00:00"}
        ) + "\n"
    )
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {
            "efficientnet_b3": {
                "output_dir": str(runs),
                "inference": {"threshold": "auto", "calibration": "temperature"},
            }
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator
    from tests.util import tiny_spec

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    server = serve.build_server(p, port=0, max_batch=4, max_wait_ms=2.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        handler_cls = server.RequestHandlerClass
        assert handler_cls.state.models[0].threshold == pytest.approx(0.30)
        assert handler_cls.state.models[0].temperature is None

        # a newer CALIBRATED eval run lands: threshold AND temperature must
        # come from that same record after reload
        d2 = runs / "r2/logs"
        d2.mkdir(parents=True)
        d2.joinpath("metrics.jsonl").write_text(
            json.dumps(
                {
                    "model": "m",
                    "threshold": 0.55,
                    "temperature": 1.7,
                    "timestamp": "2026-08-19T10:00:00",
                }
            ) + "\n"
        )
        req = urllib.request.Request(f"{base}/reload", data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["status"] == "reloaded"
        assert out["models"]["efficientnet_b3"]["threshold"] == pytest.approx(0.55)
        assert out["models"]["efficientnet_b3"]["temperature"] == pytest.approx(1.7)
        assert handler_cls.state.models[0].threshold == pytest.approx(0.55)

        # the swapped state still serves predictions
        req = urllib.request.Request(
            f"{base}/predict", data=_jpeg_bytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            res = json.loads(resp.read())
        assert res["results"][0]["label"] in ("fake", "real")
    finally:
        server.shutdown()
        thread.join(timeout=10)
        server.RequestHandlerClass.state.close()


def test_microbatcher_submit_after_stop_fails_fast():
    """A stopped batcher must reject submissions immediately (advisor r4
    medium): the reload race would otherwise strand a Future for the full
    result timeout."""
    mb = MicroBatcher(lambda b: np.zeros((b.shape[0], 2), np.float32),
                      max_batch=4, max_wait_ms=1.0, name="stopped")
    mb.stop()
    t0 = time.perf_counter()
    with pytest.raises(serve.BatcherStopped):
        mb.submit(np.zeros((2, 2, 3), np.uint8))
    assert time.perf_counter() - t0 < 1.0
    # idempotent stop
    mb.stop()


def test_microbatcher_stop_drains_queued_items():
    """Every Future enqueued before stop() must resolve: the submit/stop
    lock orders all work items ahead of the sentinel, and the worker
    flushes what it collected when it sees the sentinel."""
    def runner(batch: np.ndarray) -> np.ndarray:
        time.sleep(0.01)
        return np.stack([np.full((2,), a.mean(), np.float32) for a in batch])

    mb = MicroBatcher(runner, max_batch=2, max_wait_ms=50.0, name="drain")
    futs = [mb.submit(np.full((2, 2, 3), i, np.uint8)) for i in range(7)]
    stopper = threading.Thread(target=mb.stop)
    stopper.start()
    results = [float(f.result(timeout=30)[0]) for f in futs]
    stopper.join(timeout=30)
    assert results == [float(i) for i in range(7)]


def test_reload_token_gating(tmp_path, monkeypatch):
    """POST /reload with a configured token: 403 without it, 200 with it
    (either header form); loopback-without-token stays allowed (advisor r4
    low: unauthenticated reload on 0.0.0.0 binds)."""
    cfg = {
        "data": {"root": str(tmp_path / "data"), "num_classes": 2, "img_size": 32},
        "models": {"efficientnet_b3": {"output_dir": str(tmp_path / "runs/t")}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    import deepfakedetection_tpu.orchestrator as orchestrator

    monkeypatch.setattr(orchestrator, "get_model_spec", lambda name: tiny_spec())
    monkeypatch.chdir(tmp_path)
    server = serve.build_server(p, port=0, max_batch=4, max_wait_ms=2.0,
                                reload_token="s3cret")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        req = urllib.request.Request(f"{base}/reload", data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 403

        req = urllib.request.Request(
            f"{base}/reload", data=b"", method="POST",
            headers={"X-Reload-Token": "s3cret"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert json.loads(resp.read())["status"] == "reloaded"

        req = urllib.request.Request(
            f"{base}/reload", data=b"", method="POST",
            headers={"Authorization": "Bearer s3cret"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert json.loads(resp.read())["status"] == "reloaded"
    finally:
        server.shutdown()
        thread.join(timeout=10)
        server.RequestHandlerClass.state.close()


def test_reload_denied_on_public_bind_without_token():
    """Handler-level check: no token + non-loopback bind → not authorized
    (SIGHUP remains the operator path)."""
    class H:
        reload_token = None
        bind_host = "0.0.0.0"
        headers: dict = {}

    class H2(H):
        bind_host = "127.0.0.1"

    assert serve._Handler._reload_authorized(H()) is False
    assert serve._Handler._reload_authorized(H2()) is True
