"""Per-voice prompt-token cache (VERDICT r2 #4): the 32-layer SSL encode of
a clone prompt must run ONCE per voice, not once per request. Three layers:
engine content-hash LRU on _tokenize_audio, pre-encoded Segment tokens, and
VoiceProfile .npz persistence. Reference re-encodes on every call
(fireredtts2/fireredtts2.py:90-115) — this is a beat, not parity.
"""

import json
import urllib.request

import numpy as np
import pytest


def _tone(seconds=1.5, sr=16_000, f=180.0):
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.fixture(scope="module")
def engine():
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    return FireRedTTS2Engine(config=tiny_engine_config(), seed=0)


def test_tokenize_audio_lru_hits(engine):
    """Same prompt bytes -> one encode; different bytes -> a second."""
    a, b = _tone(f=180.0), _tone(f=240.0)
    base = engine.encode_calls
    f1, m1 = engine._tokenize_audio(a)
    assert engine.encode_calls == base + 1
    f2, m2 = engine._tokenize_audio(a.copy())     # same content, new array
    assert engine.encode_calls == base + 1        # cache hit
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(m1, m2)
    engine._tokenize_audio(b)
    assert engine.encode_calls == base + 2


def test_pre_encoded_segment_skips_encode(engine):
    """A Segment carrying audio_tokens must not touch the codec, and must
    produce the identical prompt as the encode path."""
    from fireredtts2_tpu.engine import Segment

    a = _tone(f=200.0)
    frames, mask = engine.encode_prompt_tokens(a)
    plain = Segment(speaker="[S1]", text="hello", audio=a)
    cached = Segment(speaker="[S1]", text="hello",
                     audio=np.zeros(0, np.float32),
                     audio_tokens=frames, audio_tokens_mask=mask)
    t_plain = engine._tokenize_segment(plain)
    base = engine.encode_calls
    t_cached = engine._tokenize_segment(cached)
    assert engine.encode_calls == base            # no encode at all
    np.testing.assert_array_equal(t_plain[0], t_cached[0])
    np.testing.assert_array_equal(t_plain[1], t_cached[1])


def test_monologue_clone_encodes_once(engine):
    """N clone generations with the same prompt -> exactly one encode
    (first call misses, rest hit the LRU)."""
    import tempfile

    from fireredtts2_tpu.utils.audio_io import save_wav

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        save_wav(f.name, _tone(f=150.0), 16_000)
        base = engine.encode_calls
        for _ in range(3):
            audio = engine.generate_monologue(
                "A short cloned sentence.", prompt_wav=f.name,
                prompt_text="[S1]the reference text.")
            assert audio.size > 0
        assert engine.encode_calls == base + 1


def test_monologue_clone_with_stored_tokens(engine):
    """prompt_tokens path: zero encodes, no wav load needed."""
    frames, mask = engine.encode_prompt_tokens(_tone(f=170.0))
    base = engine.encode_calls
    audio = engine.generate_monologue(
        "Use the stored voice now.", prompt_text="[S1]stored reference.",
        prompt_tokens=(frames, mask))
    assert audio.size > 0
    assert engine.encode_calls == base


def test_voice_profile_persists_tokens(engine, tmp_path):
    from fireredtts2_tpu.serve.voices import VoiceProfileManager

    mgr = VoiceProfileManager(str(tmp_path))
    p = mgr.create_profile("carol", "[S1]carol speaking", audio16k=_tone(),
                           encoder=engine.encode_prompt_tokens)
    assert p.tokens_path and p.tokens_path.endswith(".npz")
    frames, mask = mgr.prompt_tokens(p.profile_id)
    want_f, want_m = engine.encode_prompt_tokens(_tone())
    np.testing.assert_array_equal(frames, want_f)
    np.testing.assert_array_equal(mask, want_m)

    # survives a manager reload from disk (a server restart)
    mgr2 = VoiceProfileManager(str(tmp_path))
    f2, m2 = mgr2.prompt_tokens(p.profile_id)
    np.testing.assert_array_equal(f2, want_f)
    np.testing.assert_array_equal(m2, want_m)

    assert mgr2.delete(p.profile_id)
    assert mgr2.prompt_tokens(p.profile_id) is None


def test_rest_clone_uses_stored_tokens(tmp_path):
    """End-to-end REST: create a voice (one encode), clone twice (zero
    further encodes)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import (
        HealthHTTPServer, WebSocketTTSServer)

    from conftest import free_port

    port = free_port()
    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    ws = WebSocketTTSServer(engine, host="127.0.0.1", port=free_port())
    http_srv = HealthHTTPServer(ws, host="127.0.0.1", port=port,
                                voice_dir=str(tmp_path))
    http_srv.start()
    try:
        base = f"http://127.0.0.1:{port}"

        def post(path, obj):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        hexpcm = (np.clip(_tone(2.0), -1, 1) * 32767).astype("<i2") \
            .tobytes().hex()
        created = post("/api/v1/voices/create", {
            "name": "dave", "reference_text": "[S1]this is dave",
            "data": hexpcm, "sample_rate": 16_000})
        after_create = engine.encode_calls
        for _ in range(2):
            out = post("/api/v1/tts/clone", {
                "text": "Say it in dave's voice.",
                "voice_profile_id": created["profile_id"]})
            assert out["duration_s"] > 0
        assert engine.encode_calls == after_create
    finally:
        http_srv.stop()
        ws.service.shutdown()
