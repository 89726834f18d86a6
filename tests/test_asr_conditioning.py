"""<|startofprev|> text conditioning (reference condition_on_previous_text,
whisper_asr.py ASRConfig): context tokens enter the decoder prompt once a
STATIC prev_window of them exists (one extra compiled decode program, no
recompile per context length), and the no-speech logit is read at the
shifted SOT position."""

import numpy as np
import pytest


def _asr(**kw):
    from fireredtts2_tpu.asr import ASRConfig, WhisperASR

    return WhisperASR(config=ASRConfig(max_new_tokens=8, prev_window=4,
                                       fallback_temperatures=(), **kw),
                      warmup=False)


def _tone(seconds=1.0, sr=16_000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_prompt_layout_with_and_without_prev():
    asr = _asr()
    cfg = asr.model_cfg
    plain, sot0 = asr._prompt_ids(None)
    assert sot0 == 0 and plain[0, 0] == cfg.sot_id

    ids, sot = asr._prompt_ids(None, prev_ids=[7, 8, 9, 10, 11, 12])
    row = list(ids[0])
    # [sot_prev, last 4 prev tokens, sot, task, notimestamps]
    assert row[0] == cfg.sot_prev_id
    assert row[1:5] == [9, 10, 11, 12]
    assert row[5] == cfg.sot_id and sot == 5
    assert row[-1] == cfg.no_timestamps_id

    # below the window: no conditioning (static shape discipline)
    short, sot_s = asr._prompt_ids(None, prev_ids=[1, 2, 3])
    np.testing.assert_array_equal(short, plain)
    assert sot_s == 0


def test_transcribe_with_context_tokens_runs():
    asr = _asr()
    base = asr.decode_calls
    # audio must fit ONE long-form window (tiny config: _n_samples is
    # well under a second) so conditioning costs exactly one decode
    seconds = 0.5 * asr._n_samples / 16_000
    res = asr.transcribe(_tone(seconds), initial_prompt_ids=[5, 6, 7, 8, 9])
    assert asr.decode_calls == base + 1
    assert res.model_name.startswith("whisper-jax")


def test_conditioning_disabled_by_config():
    asr = _asr(condition_on_previous_text=False)
    ids, sot = asr._prompt_ids(None, prev_ids=[1, 2, 3, 4, 5, 6])
    assert sot == 0 and ids[0, 0] == asr.model_cfg.sot_id


def test_prompt_overflow_raises_loudly():
    """A prev_window that cannot fit the decode slab is a CONFIG error and
    must raise, not silently return an empty transcript."""
    from fireredtts2_tpu.asr import ASRConfig, WhisperASR

    asr = WhisperASR(config=ASRConfig(max_new_tokens=20, prev_window=8,
                                      fallback_temperatures=()),
                     warmup=False)
    with pytest.raises(ValueError, match="max_target_positions"):
        asr.transcribe(_tone(), initial_prompt_ids=list(range(10)))


def test_streaming_loop_accumulates_context():
    from fireredtts2_tpu.asr.asr import StreamingWhisperASR

    asr = _asr()
    stream = StreamingWhisperASR(asr, chunk_duration=0.5,
                                 overlap_duration=0.1)
    stream.start_streaming()
    try:
        import time

        for _ in range(6):
            stream.add_audio_chunk(_tone(0.3))
        deadline = time.time() + 120
        got = []
        while time.time() < deadline and len(got) < 2:
            r = stream.get_transcription_result(timeout=0.5)
            if r is not None:
                got.append(r)
        assert got, "no streaming results"
        # random tiny weights always emit tokens -> context accumulates
        assert len(stream.context_tokens) > 0
    finally:
        stream.stop_streaming()
