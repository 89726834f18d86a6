"""Realtime ASR WebSocket pipeline (asr/realtime.py) — socket-level test
with the tiny JAX whisper and synthetic speech/silence audio."""

import asyncio

import numpy as np
import pytest

from fireredtts2_tpu.asr import WhisperASR, ASRConfig
from fireredtts2_tpu.asr.realtime import (
    RealtimeASRServer, RealtimeASRClient, StreamingConfig,
)


def _speech(seconds: float, sr: int = 16_000, seed: int = 0) -> np.ndarray:
    """Modulated multi-tone burst the hybrid VAD reliably calls speech."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = sum(np.sin(2 * np.pi * f * t) for f in (220, 440, 880))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 4 * t)
    return (0.3 * sig * env + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_realtime_asr_turn_detection_and_transcription():
    from conftest import free_port

    port = free_port()
    asr = WhisperASR(config=ASRConfig(max_new_tokens=4), seed=0, warmup=False)
    server = RealtimeASRServer(
        asr, StreamingConfig(interim_interval_s=0.05, min_turn_s=0.1),
        host="127.0.0.1", port=port)

    results = {}

    async def scenario():
        await server.start()
        client = RealtimeASRClient(f"ws://127.0.0.1:{port}")
        try:
            await client.connect()
            results["started"] = await client.start_session()

            # one speech turn followed by silence -> VAD end-of-turn fires a
            # FINAL transcription without any explicit flush
            speech = _speech(1.0)
            silence = np.zeros(16_000, np.float32)
            for i in range(0, len(speech), 4000):
                await client.send_audio(speech[i:i + 4000])
            msgs = []
            for i in range(0, len(silence), 4000):
                await client.send_audio(silence[i:i + 4000])
            # collect messages until a final transcription arrives
            while True:
                m = await client.recv(timeout=60)
                msgs.append(m)
                if m.get("type") == "transcription" and m.get("is_final"):
                    break
            results["msgs"] = msgs

            # status reflects the reset buffer
            await client.ws.send('{"type": "get_status"}')
            while True:
                m = await client.recv(timeout=30)
                if m.get("type") == "status":
                    results["status"] = m
                    break

            await client.end_session()
            while True:
                m = await client.recv(timeout=30)
                if m.get("type") == "session_ended":
                    results["ended"] = m
                    break
        finally:
            await client.close()
            await server.stop()

    asyncio.run(scenario())

    assert results["started"]["type"] == "session_started"
    finals = [m for m in results["msgs"]
              if m["type"] == "transcription" and m["is_final"]]
    assert finals, results["msgs"]
    assert finals[0]["turn"] == 1
    assert isinstance(finals[0]["text"], str)
    assert 0.0 <= finals[0]["confidence"] <= 1.0
    assert results["status"]["turns"] >= 1
    assert results["ended"]["type"] == "session_ended"
    assert server.get_server_stats()["total_transcriptions"] >= 1


def test_realtime_asr_flush_and_errors():
    from conftest import free_port

    port = free_port()
    asr = WhisperASR(config=ASRConfig(max_new_tokens=4), seed=1, warmup=False)
    server = RealtimeASRServer(asr, StreamingConfig(min_turn_s=0.05),
                               host="127.0.0.1", port=port)
    results = {}

    async def scenario():
        await server.start()
        client = RealtimeASRClient(f"ws://127.0.0.1:{port}")
        try:
            await client.connect()
            await client.start_session()
            await client.ws.send("not json")
            results["err"] = await client.recv()
            await client.ws.send('{"type": "bogus"}')
            results["unknown"] = await client.recv()
            # flush with buffered audio forces a FINAL transcription (any
            # interim results may arrive first)
            await client.send_audio(_speech(0.4, seed=2))
            await client.flush()
            while True:
                m = await client.recv(timeout=60)
                if m.get("type") == "transcription" and m.get("is_final"):
                    results["flushed"] = m
                    break
        finally:
            await client.close()
            await server.stop()

    asyncio.run(scenario())
    assert results["err"]["type"] == "error"
    assert "unknown" in results["unknown"]["error"]
    assert results["flushed"]["is_final"] is True
