"""Temperature-fallback ladder (VERDICT r2 #7): the reference's actual
quality mechanism for noisy audio (whisper_asr.py:124-200 / openai whisper
transcribe) — retry at rising temperature when the transcript is weak
(low avg logprob) or degenerate-repetitive (high compression ratio), honor
silence as final. All decodes ride ONE compiled program (temperature is a
traced scalar)."""

import numpy as np
import pytest


def _tone(seconds=0.5, sr=16_000, f=220.0):
    # Must fit ONE long-form window of the tiny test model (0.64 s,
    # asr._n_samples) so decode_calls counts exactly one ladder walk —
    # a second window would double every count below.
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _asr(**cfg_kw):
    from fireredtts2_tpu.asr import ASRConfig, WhisperASR

    return WhisperASR(config=ASRConfig(max_new_tokens=8, **cfg_kw),
                      warmup=False)


def test_compression_ratio_flags_repetition():
    from fireredtts2_tpu.asr.asr import _compression_ratio

    assert _compression_ratio("the the the the " * 40) > 2.4
    assert _compression_ratio(
        "A perfectly ordinary sentence with varied words.") < 2.4
    assert _compression_ratio("") == 0.0


def test_clean_transcript_decodes_once():
    """Thresholds that always pass -> exactly one decode, greedy temp."""
    asr = _asr(logprob_threshold=-1e9, compression_ratio_threshold=1e9,
               no_speech_threshold=2.0)
    base = asr.decode_calls
    res = asr.transcribe(_tone())
    assert asr.decode_calls == base + 1
    assert res.segments and res.segments[0]["temperature"] == 0.0


def test_fallback_ladder_walks_all_rungs():
    """An unsatisfiable logprob gate (and no silence escape) forces the
    full ladder; the reported temperature is the last rung."""
    asr = _asr(logprob_threshold=1e9, no_speech_threshold=2.0,
               fallback_temperatures=(0.2, 0.4))
    base = asr.decode_calls
    res = asr.transcribe(_tone())
    assert asr.decode_calls == base + 3          # greedy + 2 fallbacks
    assert res.segments and res.segments[0]["temperature"] == 0.4


def test_fallback_accepts_first_passing_rung():
    """A gate the sampled rungs also clear -> ladder stops early. With
    logprob_threshold high enough to fail greedy but compression fine,
    every rung fails the same way — so instead flip the gate mid-ladder
    via the silence escape: high no-speech prob on pure silence makes the
    FIRST decode final (silence is never retried, openai semantics)."""
    asr = _asr(logprob_threshold=1e9, no_speech_threshold=-1.0,
               fallback_temperatures=(0.2, 0.4, 0.6))
    base = asr.decode_calls
    asr.transcribe(np.zeros(8_000, np.float32))
    # no_speech_prob > -1 always -> is_silence True -> one decode only
    assert asr.decode_calls == base + 1


def test_sampled_rungs_reproducible_and_seeded():
    """Same seed -> identical ladder tokens; different seed -> the sampled
    (T>0) decode may differ but stays deterministic per seed."""
    a1 = _asr(logprob_threshold=1e9, no_speech_threshold=2.0,
              fallback_temperatures=(0.8,), seed=3)
    a2 = _asr(logprob_threshold=1e9, no_speech_threshold=2.0,
              fallback_temperatures=(0.8,), seed=3)
    # share weights so tokens are comparable
    a2.params = a1.params
    r1 = a1.transcribe(_tone())
    r2 = a2.transcribe(_tone())
    assert r1.segments[0]["tokens"] == r2.segments[0]["tokens"]
    assert r1.segments[0]["temperature"] == 0.8


def test_greedy_path_unchanged_by_default_key():
    """temperature=0 must reproduce the pre-ladder greedy decode exactly
    regardless of the PRNG key (argmax path)."""
    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.asr.model import (
        TINY_ASR, asr_greedy_decode, init_asr_params)
    from fireredtts2_tpu.ops.audio import (
        log_mel_spectrogram, whisper_mel_filters)

    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mel_f = jnp.asarray(whisper_mel_filters(cfg.n_mels))
    n_samples = cfg.max_source_positions * 2 * 160  # the static window
    audio = jnp.asarray(np.random.default_rng(0)
                        .normal(0, 0.1, n_samples).astype(np.float32))
    mel = log_mel_spectrogram(audio[None], mel_f).transpose(0, 2, 1)
    mel_len = jnp.asarray([cfg.max_source_positions * 2], jnp.int32)
    prompt = jnp.asarray([[cfg.sot_id, cfg.transcribe_id,
                           cfg.no_timestamps_id]], jnp.int32)
    r0 = asr_greedy_decode(params, cfg, mel, mel_len, prompt, max_new=8)
    r1 = asr_greedy_decode(params, cfg, mel, mel_len, prompt, max_new=8,
                           temperature=0.0, key=jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(r0.tokens),
                                  np.asarray(r1.tokens))
    np.testing.assert_array_equal(np.asarray(r0.n_tokens),
                                  np.asarray(r1.n_tokens))
