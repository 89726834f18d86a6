"""Golden tests for the matmul-DFT STFT/iSTFT against scipy/numpy FFT.

These pin the numerics that the codec depends on: mel-frontend STFT power
(vs torch.stft semantics) and vocoder iSTFT overlap-add (vs a direct
irfft + fold computation, reference fireredtts2/codec/decoder.py:350-468).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.ops.stft import (
    hann_window, stft_power, irfft_frames, overlap_add, window_envelope,
    istft, istft_chunk,
)


def _np_stft_power(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """torch.stft(center=True, reflect, hann, return_complex) |.|^2 in numpy."""
    pad = n_fft // 2
    xp = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    w = hann_window(n_fft).astype(np.float64)
    n_frames = (xp.shape[1] - n_fft) // hop + 1
    out = np.empty((x.shape[0], n_fft // 2 + 1, n_frames), dtype=np.float64)
    for b in range(x.shape[0]):
        for t in range(n_frames):
            fr = xp[b, t * hop:t * hop + n_fft] * w
            out[b, :, t] = np.abs(np.fft.rfft(fr)) ** 2
    return out


@pytest.mark.parametrize("n_fft,hop", [(400, 160), (960, 240)])
def test_stft_power_matches_fft(rng, n_fft, hop):
    x = rng.standard_normal((2, n_fft * 4)).astype(np.float32)
    got = np.asarray(stft_power(jnp.asarray(x), n_fft, hop))
    want = _np_stft_power(x, n_fft, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_frame_count_matches_torch_semantics(rng):
    # torch.stft(center=True): 1 + T//hop frames.
    T = 16000
    x = rng.standard_normal((1, T)).astype(np.float32)
    p = stft_power(jnp.asarray(x), 400, 160)
    assert p.shape[-1] == 1 + T // 160


def test_irfft_frames_matches_numpy(rng):
    n_fft = 960
    F = n_fft // 2 + 1
    re = rng.standard_normal((1, F, 3)).astype(np.float32)
    im = rng.standard_normal((1, F, 3)).astype(np.float32)
    im[:, 0, :] = 0.0
    im[:, -1, :] = 0.0
    got = np.asarray(irfft_frames(jnp.asarray(re), jnp.asarray(im), n_fft))
    spec = re + 1j * im
    want = np.fft.irfft(spec, n_fft, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_overlap_add_matches_direct(rng):
    hop, win, T = 240, 960, 7
    frames = rng.standard_normal((2, win, T)).astype(np.float32)
    got = np.asarray(overlap_add(jnp.asarray(frames), hop))
    want = np.zeros((2, (T - 1) * hop + win), dtype=np.float64)
    for t in range(T):
        want[:, t * hop:t * hop + win] += frames[:, :, t]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _np_istft_same(re, im, n_fft, hop):
    """Direct implementation of the reference's 'same'-padded iSTFT."""
    spec = re + 1j * im
    B, F, T = spec.shape
    w = hann_window(n_fft).astype(np.float64)
    ifft = np.fft.irfft(spec, n_fft, axis=1) * w[None, :, None]
    out_len = (T - 1) * hop + n_fft
    y = np.zeros((B, out_len))
    env = np.zeros(out_len)
    for t in range(T):
        y[:, t * hop:t * hop + n_fft] += ifft[:, :, t]
        env[t * hop:t * hop + n_fft] += w ** 2
    pad = (n_fft - hop) // 2
    return (y / env[None, :])[:, pad:-pad]


def test_istft_matches_reference_math(rng):
    n_fft, hop, T = 960, 240, 10
    F = n_fft // 2 + 1
    re = rng.standard_normal((2, F, T)).astype(np.float32)
    im = rng.standard_normal((2, F, T)).astype(np.float32)
    got = np.asarray(istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop))
    want = _np_istft_same(re, im, n_fft, hop)
    assert got.shape == (2, T * hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_istft_streaming_equals_batch(rng):
    """Chained istft_chunk must reproduce batch istft exactly (the parity
    property the reference only asserts implicitly via its cache design)."""
    n_fft, hop = 960, 240
    F = n_fft // 2 + 1
    chunk, n_chunks = 8, 5
    T = chunk * n_chunks
    re = rng.standard_normal((1, F, T)).astype(np.float32)
    im = rng.standard_normal((1, F, T)).astype(np.float32)

    full = np.asarray(istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop))

    cache = None
    pieces = []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        y, cache = istft_chunk(
            jnp.asarray(re[:, :, sl]), jnp.asarray(im[:, :, sl]), cache,
            n_fft, hop, last_chunk=(c == n_chunks - 1),
        )
        pieces.append(np.asarray(y))
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-3, atol=1e-4)


def test_window_envelope_positive_in_interior():
    # The emitted region (after pad trim) must have a positive envelope;
    # the raw edges are 0 for a periodic hann (trimmed by istft).
    env = np.asarray(window_envelope(960, 240, 6))
    pad = (960 - 240) // 2
    assert (env[pad:-pad] > 1e-11).all()
