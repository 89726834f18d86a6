"""Hostile-input tests for the gated REST surface (VERDICT r2 #5): the WS
path's SecuritySystem now also guards /api/v1 — token auth, rate limiting,
Content-Length cap (413), and prompt-audio duration caps. Reference gates
its REST the same way (api_interfaces.py:227 verify_token;
security_system.py:651-686 SecurityMiddleware, :159-227 upload validation).
"""

import http.client
import json
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sec_rest(tmp_path_factory):
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.security import (
        RateLimiter, SecuritySystem, TokenAuthenticator)
    from fireredtts2_tpu.serve.server import (
        HealthHTTPServer, WebSocketTTSServer)

    security = SecuritySystem(
        rate_limiter=RateLimiter(max_requests=30, window_seconds=60.0),
        auth=TokenAuthenticator(b"test-secret"), require_auth=True)
    token = security.auth.issue("operator")
    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=free_port(),
                            security=security)
    http_srv = HealthHTTPServer(ws, host="127.0.0.1", port=port,
                                voice_dir=str(tmp_path_factory.mktemp("v")))
    http_srv.start()
    yield {"base": f"http://127.0.0.1:{port}", "hostport": ("127.0.0.1", port),
           "token": token}
    http_srv.stop()
    ws.service.shutdown()


def _req(rest, method, path, obj=None, token=None, timeout=60):
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(
        rest["base"] + path,
        data=json.dumps(obj).encode() if obj is not None else None,
        headers=headers, method=method)
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_unauthenticated_api_rejected(sec_rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(sec_rest, "GET", "/api/v1/voices")
    assert ei.value.code == 401
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(sec_rest, "POST", "/api/v1/tts/generate", {"text": "hi"})
    assert ei.value.code == 401


def test_bad_token_rejected(sec_rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(sec_rest, "GET", "/api/v1/voices", token="operator.99.deadbeef")
    assert ei.value.code == 401


def test_health_and_stats_stay_open(sec_rest):
    code, body = _req(sec_rest, "GET", "/health")
    assert code == 200 and body["status"] == "healthy"


def test_valid_token_passes(sec_rest):
    code, body = _req(sec_rest, "GET", "/api/v1/voices",
                      token=sec_rest["token"])
    assert code == 200 and "voices" in body


def test_oversized_body_413_before_read(sec_rest):
    """A hostile Content-Length is rejected from the HEADER, before the
    server buffers anything (the round-2 memory-DoS on /tts/clone)."""
    conn = http.client.HTTPConnection(*sec_rest["hostport"], timeout=30)
    conn.putrequest("POST", "/api/v1/voices/create")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Authorization", f"Bearer {sec_rest['token']}")
    conn.putheader("Content-Length", str(512 * 1024 * 1024))
    conn.endheaders()
    conn.send(b'{"name": "x"}')  # only a sliver of the claimed body
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_prompt_audio_duration_capped(sec_rest):
    """> 60 s of reference audio is a compute-DoS on the 32-layer SSL
    encoder; the create route must refuse it."""
    samples = int(61.0 * 16_000)
    hex_silence = "0000" * samples  # PCM16 zeros, hex-encoded
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(sec_rest, "POST", "/api/v1/voices/create",
             {"name": "long", "reference_text": "too long",
              "data": hex_silence, "sample_rate": 16_000},
             token=sec_rest["token"])
    assert ei.value.code == 400
    assert "too long" in json.loads(ei.value.read())["error"]


def test_bogus_sample_rate_rejected(sec_rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(sec_rest, "POST", "/api/v1/voices/create",
             {"name": "sr", "reference_text": "r", "data": "0000" * 4000,
              "sample_rate": 1}, token=sec_rest["token"])
    assert ei.value.code == 400


def test_rate_limit_429(sec_rest):
    """Hammering an authenticated route trips the sliding-window limiter."""
    got_429 = False
    for _ in range(40):
        try:
            _req(sec_rest, "GET", "/api/v1/voices", token=sec_rest["token"])
        except urllib.error.HTTPError as e:
            assert e.code == 429
            got_429 = True
            break
    assert got_429
