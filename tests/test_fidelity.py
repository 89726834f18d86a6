"""Fidelity harness (serve/qa.py): WER/CER math, speaker-similarity proxy,
and the synthesize->transcribe->score loop with a real tiny engine."""

import numpy as np
import pytest

from fireredtts2_tpu.serve.qa import (
    word_error_rate, char_error_rate, speaker_similarity,
    spectral_speaker_embedding, FidelityHarness,
)


def test_wer_known_values():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0
    assert word_error_rate("the cat sat", "the cat") == pytest.approx(1 / 3)
    assert word_error_rate("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert word_error_rate("a b", "a x b") == pytest.approx(0.5)
    assert word_error_rate("", "") == 0.0
    assert word_error_rate("", "word") == 1.0
    # case/whitespace insensitive
    assert word_error_rate("Hello World", "hello   world") == 0.0


def test_cer_known_values():
    assert char_error_rate("abc", "abc") == 0.0
    assert char_error_rate("abc", "abd") == pytest.approx(1 / 3)
    assert char_error_rate("a b c", "abc") == 0.0  # spaces ignored


def test_speaker_similarity_proxy(rng):
    t = np.linspace(0, 1, 16_000)
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    b = np.sin(2 * np.pi * 225 * t).astype(np.float32)   # near-identical timbre
    c = rng.standard_normal(16_000).astype(np.float32)    # white noise
    assert speaker_similarity(a, a) == pytest.approx(1.0, abs=1e-5)
    assert speaker_similarity(a, b) > speaker_similarity(a, c)
    emb = spectral_speaker_embedding(a)
    assert np.isfinite(emb).all() and abs(np.linalg.norm(emb) - 1) < 1e-4


def test_fidelity_harness_end_to_end():
    """Real tiny engine + a controllable transcriber: perfect transcription
    scores WER 0; a wrong one scores > 0; speaker_sim fills in when a
    prompt is given."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    text = "check the fidelity loop"

    perfect = FidelityHarness(engine, transcriber=lambda a: text)
    prompt = np.sin(np.linspace(0, 440 * np.pi, 16_000)).astype(np.float32)
    rep = perfect.evaluate_utterance(text, prompt_audio_16k=prompt)
    assert rep.wer == 0.0 and rep.cer == 0.0
    assert rep.speaker_sim is not None and -1.0 <= rep.speaker_sim <= 1.0

    wrong = FidelityHarness(engine, transcriber=lambda a: "something else")
    rep2 = wrong.evaluate_utterance(text)
    assert rep2.wer > 0.5 and rep2.speaker_sim is None


def test_fidelity_harness_with_jax_whisper():
    """Plumbing check: the real WhisperASR transcriber plugs in (random
    weights -> WER is reported, not gated)."""
    from fireredtts2_tpu.asr import WhisperASR, ASRConfig
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    asr = WhisperASR(config=ASRConfig(max_new_tokens=4), seed=1, warmup=False)
    h = FidelityHarness(engine, transcriber=asr.as_transcriber())
    rep = h.evaluate_utterance("plumbing check")
    assert 0.0 <= rep.wer and isinstance(rep.transcript, str)
