"""The Python client (fireredtts2_tpu/client.py) against a real server:
every method drives the live HTTP/WS surface end to end (the reference
ships no programmatic client at all)."""

import numpy as np
import pytest

from fireredtts2_tpu.client import FireRedTTSClient


@pytest.fixture(scope="module")
def client(tmp_path_factory):
    from fireredtts2_tpu.asr import WhisperASR
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import (
        WebSocketTTSServer, HealthHTTPServer,
    )

    from conftest import free_port

    ws_port, http_port = free_port(), free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=ws_port)
    http_srv = HealthHTTPServer(
        ws, host="127.0.0.1", port=http_port,
        voice_dir=str(tmp_path_factory.mktemp("voices")),
        transcriber=WhisperASR(warmup=False).as_transcriber())
    http_srv.start()

    import asyncio
    import threading
    import time

    loop = asyncio.new_event_loop()

    def spin():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(ws.start())
        loop.run_forever()

    threading.Thread(target=spin, daemon=True).start()
    deadline = time.time() + 60
    while time.time() < deadline and ws._server is None:
        time.sleep(0.1)

    yield FireRedTTSClient(f"http://127.0.0.1:{http_port}",
                           ws_url=f"ws://127.0.0.1:{ws_port}")
    http_srv.stop()
    ws.service.shutdown()


def test_health_and_stats(client):
    assert client.health()["status"] == "healthy"
    s = client.stats()
    assert "clients" in s and "device" in s


def test_synthesize_blocking(client):
    audio, sr = client.synthesize("[S1]Hello there.",
                                  max_audio_length_ms=640)
    assert sr == 24_000 and audio.dtype == np.float32
    assert audio.size > 0 and np.isfinite(audio).all()


def test_synthesize_streaming_chunks(client):
    chunks = list(client.synthesize_streaming("[S1]Stream me.",
                                              max_audio_length_ms=640))
    assert chunks and all(c.dtype == np.float32 for c in chunks)
    assert sum(len(c) for c in chunks) > 0


def test_stream_ws(client):
    chunks = list(client.stream_ws("[S1]Sockets.",
                                   max_audio_length_ms=640))
    assert chunks and sum(len(c) for c in chunks) > 0


def test_openai_speech_bytes(client):
    wav = client.speech("Hello.", response_format="wav")
    assert wav[:4] == b"RIFF"
    pcm = client.speech("Hello.", response_format="pcm")
    assert len(pcm) % 2 == 0 and len(pcm) > 0


def test_transcribe(client):
    t = np.arange(8_000) / 16_000.0
    tone = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    assert isinstance(client.transcribe(tone), str)


def test_voice_roundtrip_and_clone(client):
    t = np.arange(8_000) / 16_000.0
    ref = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    pid = client.create_voice("client-voice", "a reference sentence", ref)
    assert any(v["profile_id"] == pid for v in client.list_voices())
    audio, sr = client.clone_speech("New words entirely.", pid)
    assert sr == 24_000 and audio.size > 0


def test_conversation(client):
    sid = client.start_conversation(language="English")
    out = client.conversation_turn(sid, "Hello, how are you?")
    assert out["response_text"] and out["data"]


def test_stream_dialogue_ws(client):
    pairs = list(client.stream_dialogue_ws(
        ["[S1]Hello there.", "[S2]Hi back."], max_utterance_ms=1600))
    utts = {u for u, _ in pairs}
    assert utts == {0, 1}
    assert sum(len(c) for _, c in pairs) > 0
