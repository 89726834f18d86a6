"""Serving-layer tests: VAD state machine, sessions, monitor, and an
end-to-end WebSocket round trip against the tiny random-weight engine
(real server, real socket — SURVEY.md §4: serving tests with a fake tiny
model instead of Mocks)."""

import asyncio
import json
import threading
import time

import numpy as np
import pytest

from fireredtts2_tpu.serve.vad import HybridVAD, VADConfig, VADState
from fireredtts2_tpu.serve.sessions import SessionManager
from fireredtts2_tpu.serve.monitor import (
    PerformanceMonitor, analyze_audio_quality,
)


# ------------------------------------------------------------------- VAD

def _speech_like(rng, n, sr=16000):
    """Modulated 300-3000 Hz harmonics, clearly voiced."""
    t = np.arange(n) / sr
    sig = sum(np.sin(2 * np.pi * f * t) for f in (300, 600, 1200, 2400))
    return (0.3 * sig / 4 + 0.001 * rng.standard_normal(n)).astype(np.float32)


def test_vad_detects_speech_turn(rng):
    cfg = VADConfig()
    vad = HybridVAD(cfg)
    sr = cfg.sample_rate
    audio = np.concatenate([
        0.0005 * rng.standard_normal(sr // 2).astype(np.float32),  # silence
        _speech_like(rng, sr),                                     # 1 s speech
        0.0005 * rng.standard_normal(sr).astype(np.float32),       # silence
    ])
    events = vad.process_audio(audio)
    kinds = [e.kind for e in events]
    assert "speech_start" in kinds and "speech_end" in kinds
    start = next(e for e in events if e.kind == "speech_start")
    end = next(e for e in events if e.kind == "speech_end")
    assert end.timestamp > start.timestamp
    assert end.duration_ms > 500


def test_vad_ignores_silence(rng):
    vad = HybridVAD()
    audio = 0.0003 * rng.standard_normal(16000).astype(np.float32)
    assert vad.process_audio(audio) == []
    assert vad.state == VADState.SILENCE


def test_vad_min_speech_gate(rng):
    """A burst shorter than min_speech_ms must not trigger speech_start."""
    cfg = VADConfig(min_speech_ms=250)
    vad = HybridVAD(cfg)
    sr = cfg.sample_rate
    audio = np.concatenate([
        0.0005 * rng.standard_normal(sr // 4).astype(np.float32),
        _speech_like(rng, int(0.12 * sr)),  # 120 ms blip
        0.0005 * rng.standard_normal(sr // 2).astype(np.float32),
    ])
    assert [e.kind for e in vad.process_audio(audio)] == []


# --------------------------------------------------------------- sessions

def test_session_lifecycle(tmp_path):
    mgr = SessionManager(persist_dir=str(tmp_path))
    s = mgr.create_session({"user": "x"})
    mgr.add_turn(s.session_id, "user", "hello")
    mgr.add_turn(s.session_id, "assistant", "hi", audio_duration_s=1.2)
    ctx = mgr.context_window(s.session_id)
    assert [t.role for t in ctx] == ["user", "assistant"]

    # persistence round trip
    mgr2 = SessionManager(persist_dir=str(tmp_path))
    s2 = mgr2.get(s.session_id)
    assert s2 is not None and len(s2.turns) == 2
    assert s2.turns[1].audio_duration_s == 1.2


def test_session_expiry(tmp_path):
    mgr = SessionManager(persist_dir=None, expiry_seconds=0.0)
    mgr.create_session()
    time.sleep(0.01)
    assert mgr.cleanup_expired() == 1
    assert mgr.active_count == 0


# ---------------------------------------------------------------- monitor

def test_monitor_tracks_latency():
    mon = PerformanceMonitor()
    mon.start_inference("r1")
    mon.record_first_packet("r1")
    mon.record_frame("r1", 10)
    rec = mon.end_inference("r1", audio_seconds=0.8)
    assert rec.first_packet_s is not None and rec.first_packet_s >= 0
    s = mon.summary()
    assert s["requests"] == 1 and s["frames"] == 10
    assert "first_packet_ms_p50" in s


def test_audio_quality_analysis(rng):
    sr = 24000
    t = np.arange(sr // 2) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    quiet = 0.001 * rng.standard_normal(sr // 2)
    audio = np.concatenate([quiet, tone]).astype(np.float32)  # speech-like: pauses + voice
    q = analyze_audio_quality(audio, sr)
    assert q["duration_s"] == pytest.approx(1.0)
    assert q["clipping_ratio"] == 0.0
    assert q["snr_db"] > 10  # floor from the quiet half, rms from the tone


# ------------------------------------------------------------- websocket

@pytest.mark.asyncio_disabled  # plain sync test driving its own loop
def test_websocket_server_end_to_end():
    import websockets

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.monitor import reset_performance_monitor
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    from conftest import free_port

    port = free_port()
    reset_performance_monitor()  # the singleton accumulates across tests
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port)

    results = {}

    async def scenario():
        await server.start()
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                # ping
                await ws.send(json.dumps({"type": "ping"}))
                results["pong"] = json.loads(await ws.recv())
                # session
                await ws.send(json.dumps({"type": "session_start"}))
                sess = json.loads(await ws.recv())
                results["session"] = sess
                # bad message
                await ws.send(json.dumps({"type": "nope"}))
                results["bad"] = json.loads(await ws.recv())
                # streaming TTS
                await ws.send(json.dumps({
                    "type": "generate_speech", "text": "hello world",
                    "session_id": sess["session_id"], "streaming": True}))
                chunks = 0
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 300))
                    if msg["type"] == "audio_chunk":
                        chunks += 1
                        assert msg["format"] == "pcm16"
                        pcm = bytes.fromhex(msg["data"])
                        assert len(pcm) % 2 == 0 and len(pcm) > 0
                    elif msg["type"] == "generation_complete":
                        results["complete"] = msg
                        results["chunks"] = chunks
                        break
                    elif msg["type"] == "error":
                        raise AssertionError(msg)
                # stats
                await ws.send(json.dumps({"type": "get_stats"}))
                results["stats"] = json.loads(await ws.recv())
        finally:
            await server.stop()

    asyncio.run(scenario())

    assert results["pong"]["type"] == "pong"
    assert "session_id" in results["session"]
    assert results["bad"]["type"] == "error"
    assert results["chunks"] >= 1
    assert results["complete"]["chunks"] == results["chunks"]
    assert results["stats"]["stats"]["requests"] == 1


def test_websocket_server_batched_concurrent():
    """max_streams > 1: two concurrent websocket requests decode together
    through the continuous batcher."""
    import websockets

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port,
                                max_streams=4)

    async def one_client(text):
        async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
            await ws.send(json.dumps({"type": "generate_speech",
                                      "text": text, "streaming": True}))
            chunks = 0
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 300))
                if msg["type"] == "audio_chunk":
                    chunks += 1
                elif msg["type"] == "generation_complete":
                    return chunks, msg["duration_s"]
                elif msg["type"] == "error":
                    raise AssertionError(msg)

    async def scenario():
        await server.start()
        try:
            return await asyncio.gather(one_client("first client words"),
                                        one_client("second client says"))
        finally:
            await server.stop()

    results = asyncio.run(scenario())
    for chunks, dur in results:
        assert chunks >= 1 and dur > 0


def test_websocket_streaming_dialogue():
    """generate_dialogue over WS: audio_chunk messages carry per-utterance
    indices; complete reports both utterances (KV-persistent dialogue on
    the engine side — no reference counterpart)."""
    import websockets

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port)

    async def scenario():
        await server.start()
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                # bad payload first
                await ws.send(json.dumps({"type": "generate_dialogue",
                                          "text_list": []}))
                bad = json.loads(await asyncio.wait_for(ws.recv(), 60))
                await ws.send(json.dumps({
                    "type": "generate_dialogue",
                    "text_list": ["[S1]Hello there.", "[S2]Hi back."],
                    "max_utterance_ms": 1600}))
                utts, chunks = set(), 0
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 600))
                    if msg["type"] == "audio_chunk":
                        chunks += 1
                        utts.add(msg["utterance"])
                        assert len(bytes.fromhex(msg["data"])) > 0
                    elif msg["type"] == "generation_complete":
                        return bad, msg, utts, chunks
                    elif msg["type"] == "error":
                        raise AssertionError(msg)
        finally:
            await server.stop()

    bad, complete, utts, chunks = asyncio.run(scenario())
    assert bad["type"] == "error"
    assert utts == {0, 1}
    assert complete["utterances"] == 2 and complete["chunks"] == chunks
    assert complete["duration_s"] > 0


def test_websocket_rejects_hostile_text():
    import websockets

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port)

    async def scenario():
        await server.start()
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"type": "generate_speech",
                                          "text": "<script>alert(1)</script>"}))
                return json.loads(await asyncio.wait_for(ws.recv(), 60))
        finally:
            await server.stop()

    msg = asyncio.run(scenario())
    assert msg["type"] == "error"
    assert "security" in msg["error"] or "screening" in msg["error"]


def test_stats_includes_batcher_and_recommendation_telemetry():
    """stats() must surface the continuous-batching telemetry and the
    recommendation engine's output (runtime/policy.py — the reference's
    PerformanceOptimizationEngine capability,
    advanced_performance_monitor.py:673-939) without needing a socket."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.monitor import reset_performance_monitor
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    reset_performance_monitor()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    from conftest import free_port

    server = WebSocketTTSServer(engine, port=free_port(), max_streams=2)
    try:
        out = server.stats()
        assert out["active_streams"] == 0
        assert out["queue_depth"] == 0
        assert out["chunk_drops"] == 0
        pol = out["block_policy"]
        assert set(pol) == {"wall_ms_per_block", "rtt_ms", "frame_cost_ms"}
        assert pol["rtt_ms"] is None  # no blocks observed yet
        assert isinstance(out["recommendations"], list)
        for r in out["recommendations"]:
            assert {"severity", "code", "message", "action"} <= set(r)
    finally:
        server.service.batcher.stop()


def test_websocket_dialogue_with_voice_mapping(tmp_path):
    """generate_dialogue with {"voices": {"[S1]": <name>}}: the speaker's
    stored profile becomes the clone prompt (voices.dialogue_prompts);
    unknown voices and a missing store error cleanly."""
    import websockets

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer
    from fireredtts2_tpu.serve.voices import VoiceProfileManager
    from fireredtts2_tpu.utils.audio_io import save_wav

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port)

    t = np.arange(8_000) / 16_000.0
    ref = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav_path = str(tmp_path / "ref.wav")
    save_wav(wav_path, ref, 16_000)
    store = VoiceProfileManager(str(tmp_path / "profiles"))
    prof = store.create_profile("alice", "[S1]reference words",
                                wav_path=wav_path)
    server.voices = store

    async def scenario():
        await server.start()
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                # unknown voice -> clean error
                await ws.send(json.dumps({
                    "type": "generate_dialogue",
                    "text_list": ["[S1]Hello."],
                    "voices": {"[S1]": "nobody"}}))
                bad = json.loads(await asyncio.wait_for(ws.recv(), 60))
                # by name
                await ws.send(json.dumps({
                    "type": "generate_dialogue",
                    "text_list": ["[S1]Hello there."],
                    "voices": {"[S1]": "alice"},
                    "max_utterance_ms": 1600}))
                chunks = 0
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 600))
                    if msg["type"] == "audio_chunk":
                        chunks += 1
                    elif msg["type"] == "generation_complete":
                        return bad, chunks
                    elif msg["type"] == "error":
                        raise AssertionError(msg)
        finally:
            await server.stop()

    bad, chunks = asyncio.run(scenario())
    assert bad["type"] == "error" and "nobody" in bad["error"]
    assert chunks >= 1
    assert prof.profile_id in {p.profile_id for p in store.list_profiles()}
