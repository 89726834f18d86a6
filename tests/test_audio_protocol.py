"""Audio protocol tests: codecs, jitter buffer priming/underrun behavior."""

import numpy as np

from fireredtts2_tpu.serve.audio_protocol import (
    AudioFormat, encode_audio, decode_audio, JitterBuffer, QualityController,
)


def test_format_roundtrips(rng):
    x = (rng.standard_normal(1024) * 0.4).clip(-1, 1).astype(np.float32)
    for fmt, tol in ((AudioFormat.PCM16, 1e-4), (AudioFormat.PCM32, 1e-6),
                     (AudioFormat.FLOAT32, 0.0)):
        y = decode_audio(encode_audio(x, fmt), fmt)
        assert y.shape == x.shape
        assert np.abs(y - x).max() <= tol, fmt


def test_jitter_buffer_primes_then_plays(rng):
    jb = JitterBuffer(sample_rate=24_000, target_ms=160)
    chunk = rng.standard_normal(1920).astype(np.float32)  # 80 ms
    assert jb.pull(480) is None                    # not primed yet
    jb.push(chunk)
    assert jb.pull(480) is None                    # 80 < 160 ms
    jb.push(chunk)
    out = jb.pull(480)                             # primed at 160 ms
    assert out is not None and out.shape == (480,)
    np.testing.assert_array_equal(out, chunk[:480])


def test_jitter_buffer_underrun_grows_target(rng):
    jb = JitterBuffer(sample_rate=24_000, target_ms=80)
    jb.push(rng.standard_normal(1920).astype(np.float32))
    assert jb.pull(1920) is not None
    before = jb.target_ms
    out = jb.pull(1920)                            # drained: underrun
    assert out is not None and (out[-100:] == 0).all()
    assert jb.stats.underruns == 1
    assert jb.target_ms > before
    assert jb.pull(100) is None                    # re-priming


def test_jitter_buffer_shrinks_when_deep(rng):
    jb = JitterBuffer(sample_rate=24_000, target_ms=400)
    for _ in range(20):
        jb.push(rng.standard_normal(1920).astype(np.float32))
    before = jb.target_ms
    jb.maybe_shrink()
    assert jb.target_ms < before


def test_quality_controller_lag_detection():
    qc = QualityController()
    for _ in range(10):
        qc.record_send(4096, seconds_blocked=0.001)
    assert not qc.lagging()
    for _ in range(64):
        qc.record_send(4096, seconds_blocked=0.2)
    assert qc.lagging()
    assert qc.choose_format() == AudioFormat.PCM16
