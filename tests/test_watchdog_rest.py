"""Watchdog + REST endpoint + web demo tests."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from fireredtts2_tpu.serve.watchdog import Watchdog, ServiceSpec


def test_watchdog_recovers_service():
    state = {"ok": False, "recoveries": 0}

    def check():
        return state["ok"]

    def recover():
        state["recoveries"] += 1
        state["ok"] = True

    wd = Watchdog(interval_s=999)
    wd.register(ServiceSpec("svc", check, recover, max_recovery_attempts=2))
    st = wd.check_all()["svc"]
    assert not st.healthy and st.recovery_attempts == 1
    st = wd.check_all()["svc"]
    assert st.healthy and state["recoveries"] == 1
    diag = wd.diagnostics()
    assert "services" in diag and "performance" in diag


def test_watchdog_bounds_recovery_attempts():
    def always_bad():
        return False

    calls = {"n": 0}

    def recover():
        calls["n"] += 1

    wd = Watchdog(interval_s=999)
    wd.register(ServiceSpec("bad", always_bad, recover, max_recovery_attempts=2))
    for _ in range(5):
        wd.check_all()
    assert calls["n"] == 2  # bounded


def test_watchdog_check_exception_is_failure():
    def boom():
        raise RuntimeError("dead")

    wd = Watchdog(interval_s=999)
    wd.register(ServiceSpec("boom", boom))
    st = wd.check_all()["boom"]
    assert not st.healthy and "dead" in st.last_error


@pytest.fixture(scope="module")
def live_http():
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer, HealthHTTPServer

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=free_port())
    http = HealthHTTPServer(ws, host="127.0.0.1", port=port)
    http.start()
    yield f"http://127.0.0.1:{port}"
    http.stop()
    ws.service.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def test_rest_health_stats_demo(live_http):
    code, body = _get(live_http + "/health")
    assert code == 200 and json.loads(body)["status"] == "healthy"
    code, body = _get(live_http + "/stats")
    assert code == 200 and "requests" in json.loads(body)
    code, body = _get(live_http + "/demo")
    assert code == 200 and b"generate_speech" in body


def test_rest_tts_generate(live_http):
    req = urllib.request.Request(
        live_http + "/api/v1/tts/generate",
        data=json.dumps({"text": "rest api hello"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        body = json.loads(r.read())
    assert body["format"] == "pcm16" and body["sample_rate"] == 24_000
    pcm = np.frombuffer(bytes.fromhex(body["data"]), dtype="<i2")
    assert len(pcm) > 0 and body["duration_s"] > 0


def test_rest_tts_rejects_bad_input(live_http):
    req = urllib.request.Request(
        live_http + "/api/v1/tts/generate",
        data=json.dumps({"text": "<script>alert(1)</script>"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
