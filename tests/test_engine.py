"""End-to-end engine tests on the tiny random-weight config: the real model
topology at miniature dims (SURVEY.md §4: fake tiny-config model instead of
Mocks). Exercises text -> frames -> AR decode -> codec -> waveform."""

import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine, Segment


@pytest.fixture(scope="module")
def engine():
    return FireRedTTS2Engine(config=tiny_engine_config(), seed=0)


def test_generate_monologue_random_voice(engine):
    audio = engine.generate_monologue("Hello world, this is a test.")
    assert audio.ndim == 1
    assert audio.dtype == np.float32
    # random weights won't EOS sensibly, but length must be a multiple of
    # one token's samples and capped by max generation length
    assert audio.shape[0] % 1920 == 0
    assert np.isfinite(audio).all()


def test_generate_with_context_and_prompt(engine, rng, tmp_path):
    # Build a prompt wav (16 kHz, 1 s), clone-style dialogue
    from fireredtts2_tpu.utils.audio_io import save_wav
    wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)).astype(np.float32)
    p = tmp_path / "prompt.wav"
    save_wav(str(p), wav, 16000)

    seg = engine.prepare_prompt("[S1]prompt text.", "[S1]", str(p))
    assert seg.audio.ndim == 1
    audio = engine.generate("short reply", "[S2]", [seg],
                            max_audio_length_ms=800)  # 10 frames max
    assert audio.shape[0] % 1920 == 0
    assert audio.shape[0] <= 10 * 1920


def test_generate_dialogue_two_speakers(engine):
    # tiny config: bound per-utterance length so the rolling context
    # (utterance-1 audio tokens) fits the tiny prompt buckets
    audio = engine.generate_dialogue(
        ["[S1]Hi there.", "[S2]Hello."], max_utterance_ms=1600)
    assert audio.ndim == 1 and np.isfinite(audio).all()
    assert audio.shape[0] > 0


def test_generate_stream_matches_batch_decode(engine):
    """Streaming chunks must concatenate to the batch decode of the same
    tokens. Seed the engine identically so the sampled tokens agree."""
    text, speaker = "stream me", "[S1]"

    e1 = FireRedTTS2Engine(config=tiny_engine_config(), seed=123)
    chunks = list(e1.generate_stream(text, speaker, [],
                                     max_audio_length_ms=480))
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    e2 = FireRedTTS2Engine(config=tiny_engine_config(), seed=123)
    batch = e2.generate(text, speaker, [], max_audio_length_ms=480)

    assert streamed.shape == batch.shape
    np.testing.assert_allclose(streamed, batch, rtol=1e-3, atol=1e-4)
    assert e1._first_packet_s is not None


def test_prompt_too_long_raises(engine):
    with pytest.raises(ValueError):
        engine.generate("x" * 4000, "[S1]", [], max_audio_length_ms=800)


def test_generate_monologue_with_clone_prompt(engine, rng, tmp_path):
    """Clone path: prompt wav + text, chunked text, retry-until->18-frames,
    leading-silence trim (reference fireredtts2.py:405-446)."""
    from fireredtts2_tpu.utils.audio_io import save_wav

    wav = (0.1 * np.sin(2 * np.pi * 180 * np.arange(24000) / 16000)).astype(np.float32)
    p = tmp_path / "clone.wav"
    save_wav(str(p), wav, 16000)

    audio = engine.generate_monologue("A cloned sentence to speak.",
                                      prompt_wav=str(p),
                                      prompt_text="reference words spoken here.")
    assert audio.ndim == 1
    assert audio.shape[0] % 1920 == 0
    assert np.isfinite(audio).all()


def test_generate_batch_offline(engine):
    """Batched offline synthesis: per-stream lengths/EOS, outputs finite."""
    outs = engine.generate_batch(
        ["first utterance", "the second one here"],
        ["[S1]", "[S2]"], max_audio_length_ms=640)
    assert len(outs) == 2
    for o in outs:
        assert o.ndim == 1 and o.shape[0] % 1920 == 0
        assert np.isfinite(o).all()


def test_warmup_compiles(engine):
    dt = engine.warmup(buckets=(32,), stream_blocks=False)
    assert dt >= 0
