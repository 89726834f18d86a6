"""Socket-level tests for the extended REST surface (VERDICT missing #3):
streaming TTS (chunked transfer), request status, voices CRUD, and
conversations — reference api_interfaces.py:201-541."""

import http.client
import json
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rest(tmp_path_factory):
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer, HealthHTTPServer

    voice_dir = str(tmp_path_factory.mktemp("voices"))
    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=free_port())
    http_srv = HealthHTTPServer(ws, host="127.0.0.1", port=port,
                                voice_dir=voice_dir)
    http_srv.start()
    yield {"base": f"http://127.0.0.1:{port}", "hostport": ("127.0.0.1", port)}
    http_srv.stop()
    ws.service.shutdown()


def _post(base, path, obj, timeout=600):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(base, path, timeout=30):
    with urllib.request.urlopen(base + path, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _delete(base, path, timeout=30):
    req = urllib.request.Request(base + path, method="DELETE")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


# ------------------------------------------------------------ streaming TTS


def test_streaming_tts_chunked_transfer(rest):
    """POST generate-streaming must deliver PCM16 bytes incrementally via
    chunked transfer encoding (reference api_interfaces.py:237-257)."""
    conn = http.client.HTTPConnection(*rest["hostport"], timeout=600)
    conn.request("POST", "/api/v1/tts/generate-streaming",
                 body=json.dumps({"text": "stream me please"}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("X-Format") == "pcm16"
    assert resp.getheader("X-Sample-Rate") == "24000"
    data = resp.read()          # http.client de-chunks
    conn.close()
    pcm = np.frombuffer(data, dtype="<i2")
    assert pcm.size > 0
    assert np.abs(pcm.astype(np.int32)).max() <= 32767


def test_streaming_tts_bad_input(rest):
    conn = http.client.HTTPConnection(*rest["hostport"], timeout=30)
    conn.request("POST", "/api/v1/tts/generate-streaming",
                 body=json.dumps({"text": ""}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_tts_status_endpoint(rest):
    rid = "status-test-req"
    code, body = _post(rest["base"], "/api/v1/tts/generate",
                       {"text": "track my status", "request_id": rid})
    assert code == 200
    code, st = _get(rest["base"], f"/api/v1/tts/status/{rid}")
    assert code == 200
    assert st["status"] == "completed" and st["duration_s"] > 0
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(rest["base"], "/api/v1/tts/status/nonexistent")
    assert ei.value.code == 404


# ------------------------------------------------------------- voices CRUD


def _pcm16_hex(audio: np.ndarray) -> str:
    return (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes().hex()


def test_voices_crud_roundtrip(rest):
    audio = (np.sin(np.linspace(0, 200 * 2 * np.pi, 32_000))
             .astype(np.float32) * 0.4)
    code, created = _post(rest["base"], "/api/v1/voices/create", {
        "name": "alice", "reference_text": "hello I am alice",
        "data": _pcm16_hex(audio), "sample_rate": 16_000,
        "language": "English", "gender": "F"})
    assert code == 200 and created["profile_id"]
    assert "quality" in created

    code, lst = _get(rest["base"], "/api/v1/voices")
    assert code == 200
    assert any(v["name"] == "alice" for v in lst["voices"])

    pid = created["profile_id"]
    code, got = _get(rest["base"], f"/api/v1/voices/{pid}")
    assert code == 200 and got["reference_text"] == "hello I am alice"
    assert got["metadata"]["gender"] == "F"

    code, d = _delete(rest["base"], f"/api/v1/voices/{pid}")
    assert code == 200 and d["deleted"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(rest["base"], f"/api/v1/voices/{pid}")
    assert ei.value.code == 404


def test_voices_create_validation(rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(rest["base"], "/api/v1/voices/create",
              {"name": "x", "reference_text": "y", "data": "0001"})
    assert ei.value.code == 400  # too short


# ----------------------------------------------------------- conversations


def test_conversation_lifecycle(rest):
    code, conv = _post(rest["base"], "/api/v1/conversations/start",
                       {"language": "English"})
    assert code == 200
    sid = conv["session_id"]

    code, turn = _post(rest["base"], f"/api/v1/conversations/{sid}/turn",
                       {"text": "hello there"})
    assert code == 200
    assert turn["response_text"]
    assert len(bytes.fromhex(turn["data"])) > 0

    code, got = _get(rest["base"], f"/api/v1/conversations/{sid}")
    assert code == 200
    assert len(got["turns"]) == 2  # user + assistant

    code, d = _delete(rest["base"], f"/api/v1/conversations/{sid}")
    assert code == 200 and d["ended"]


def test_conversation_turn_unknown_session(rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(rest["base"], "/api/v1/conversations/zzz/turn", {"text": "hi"})
    assert ei.value.code == 404


# ------------------------------------------------------------ voice cloning


def test_tts_clone_with_stored_voice(rest):
    """Upload a reference voice, then synthesize a monologue in it
    (reference gradio_demo.py:153-198 drives the same path)."""
    audio = (np.sin(np.linspace(0, 160 * 2 * np.pi, 24_000))
             .astype(np.float32) * 0.4)
    code, created = _post(rest["base"], "/api/v1/voices/create", {
        "name": "bob", "reference_text": "this is bob speaking",
        "data": _pcm16_hex(audio), "sample_rate": 16_000})
    assert code == 200

    code, out = _post(rest["base"], "/api/v1/tts/clone", {
        "text": "Speak this in the stored voice.",
        "voice_profile_id": created["profile_id"]}, timeout=600)
    assert code == 200
    assert out["voice"] == "bob"
    pcm = np.frombuffer(bytes.fromhex(out["data"]), dtype="<i2")
    assert pcm.size > 0 and out["duration_s"] > 0


def test_tts_clone_unknown_voice(rest):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(rest["base"], "/api/v1/tts/clone",
              {"text": "hello", "voice_profile_id": "nope"})
    assert ei.value.code == 404


def test_demo_page_has_cloning_ui(rest):
    with urllib.request.urlopen(rest["base"] + "/demo", timeout=30) as r:
        page = r.read().decode()
    assert "voices/create" in page and "tts/clone" in page
    assert "generate_speech" in page   # single-utterance path intact
    assert "generate_dialogue" in page  # KV-persistent dialogue streaming


# -------------------------------------------------- OpenAI-compatible TTS


def _post_raw(base, path, obj, timeout=600):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def test_openai_speech_wav_and_pcm(rest):
    """POST /v1/audio/speech (openai-python drop-in): wav bytes with a
    valid RIFF header, and raw pcm16 when response_format=pcm."""
    st, hdrs, body = _post_raw(rest["base"], "/v1/audio/speech",
                               {"model": "fireredtts2", "input": "Hello."})
    assert st == 200 and hdrs["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    sr = int(hdrs["X-Sample-Rate"])
    n = int.from_bytes(body[40:44], "little") // 2   # data chunk samples
    assert sr == 24_000 and n > 0 and len(body) == 44 + 2 * n

    st, hdrs, pcm = _post_raw(rest["base"], "/v1/audio/speech",
                              {"input": "Hello.", "response_format": "pcm"})
    assert st == 200 and hdrs["Content-Type"] == "application/octet-stream"
    assert len(pcm) % 2 == 0 and len(pcm) > 0
    x = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0
    assert np.isfinite(x).all()


def test_openai_speech_rejects_bad_format_and_empty_input(rest):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(rest["base"], "/v1/audio/speech",
                  {"input": "hi", "response_format": "opus"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(rest["base"], "/v1/audio/speech", {"input": ""})
    assert e.value.code == 400


def test_openai_speech_with_stored_voice(rest):
    """voice=<profile name> routes through the clone path."""
    t = np.arange(8_000) / 16_000.0
    wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
    st, created = _post(rest["base"], "/api/v1/voices/create", {
        "name": "openai-voice", "reference_text": "a reference sentence",
        "data": pcm.hex(), "sample_rate": 16_000})
    assert st == 200
    st, hdrs, body = _post_raw(
        rest["base"], "/v1/audio/speech",
        {"input": "Hello there.", "voice": "openai-voice"}, timeout=900)
    assert st == 200 and body[:4] == b"RIFF" and len(body) > 44


# -------------------------------------------- OpenAI-compatible ASR


@pytest.fixture(scope="module")
def rest_asr(tmp_path_factory):
    """A second server with the REAL (tiny random-weight) on-TPU whisper
    wired as the transcriber."""
    from fireredtts2_tpu.asr import WhisperASR
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import (
        WebSocketTTSServer, HealthHTTPServer,
    )

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=free_port())
    http_srv = HealthHTTPServer(
        ws, host="127.0.0.1", port=port,
        transcriber=WhisperASR(warmup=False).as_transcriber())
    http_srv.start()
    yield {"base": f"http://127.0.0.1:{port}"}
    http_srv.stop()
    ws.service.shutdown()


def _tone_pcm16(n=8000):
    t = np.arange(n) / 16_000.0
    wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    return (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()


def test_openai_transcription_json_payload(rest_asr):
    st, out = _post(rest_asr["base"], "/v1/audio/transcriptions",
                    {"data": _tone_pcm16().hex(), "sample_rate": 16_000})
    assert st == 200 and isinstance(out["text"], str)


def test_openai_transcription_multipart_wav(rest_asr):
    import io
    import struct

    pcm = _tone_pcm16()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    boundary = "frtts2boundary"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n").encode() + wav + \
        f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        rest_asr["base"] + "/v1/audio/transcriptions", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"},
        method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.loads(r.read())
        assert r.status == 200
    assert isinstance(out["text"], str)


def test_openai_transcription_503_without_asr(rest):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(rest["base"], "/v1/audio/transcriptions",
              {"data": _tone_pcm16().hex()})
    assert e.value.code == 503


# ------------------------------------------------------------ admin reload


def test_admin_reload_bad_dir_400(rest):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(rest["base"], "/api/v1/admin/reload", {"dir": "/no/such/dir"})
    assert e.value.code == 400


def test_admin_reload_swaps_weights(rest, tmp_path):
    """POST /api/v1/admin/reload with a DIR/jax/ layout hot-swaps the
    serving weights (engine.prepare/apply_checkpoint through the
    batcher's drain); the server keeps answering afterwards."""
    import os

    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import init_codec_params
    from fireredtts2_tpu.models.lm.model import init_lm_params
    from fireredtts2_tpu.runtime.checkpoint import save_params

    tiny = tiny_engine_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(99))
    new_lm = init_lm_params(k1, tiny.llm, jnp.float32)
    save_params(os.path.join(str(tmp_path), "jax", "llm_posttrain"), new_lm)
    save_params(os.path.join(str(tmp_path), "jax", "codec"),
                init_codec_params(k2, tiny.codec, jnp.float32))

    status, out = _post(rest["base"], "/api/v1/admin/reload",
                        {"dir": str(tmp_path)})
    assert status == 200 and out["reloaded"] == str(tmp_path)
    # serving continues on the new weights
    status, out = _post(rest["base"], "/api/v1/tts/generate",
                        {"text": "after reload"})
    assert status == 200 and out["duration_s"] > 0
