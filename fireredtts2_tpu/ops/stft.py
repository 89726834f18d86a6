"""STFT / iSTFT as MXU-friendly matmul-DFT + strided conv, no FFT primitive.

Small fixed-size transforms (n_fft 400 @16 kHz mel frontend, 960 @24 kHz
vocoder) map better to the TPU MXU as dense matmuls than to a generic FFT.

Behavioral parity targets from the reference:
- forward STFT power for mel: torch.stft(center=True, reflect pad),
  fireredtts2/codec/whisper.py:310-315
- iSTFT with "same" padding + hann window + overlap-add + window-envelope
  normalization: fireredtts2/codec/decoder.py:323-405
- streaming single-frame iSTFT with a 3-frame cache:
  fireredtts2/codec/decoder.py:407-468
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.ops.precision import peinsum


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


@lru_cache(maxsize=8)
def _stft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed rDFT analysis basis: (F, n_fft) cos and -sin matrices such
    that re = cos_b @ frame, im = sin_b @ frame equal rfft(window*frame)."""
    freqs = np.arange(n_fft // 2 + 1, dtype=np.float64)
    times = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * freqs[:, None] * times[None, :] / n_fft
    w = hann_window(n_fft, np.float64)
    cos_b = (np.cos(ang) * w[None, :]).astype(np.float32)
    sin_b = (-np.sin(ang) * w[None, :]).astype(np.float32)
    return cos_b, sin_b


@lru_cache(maxsize=8)
def _istft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """irfft synthesis basis: x = Cr @ re + Ci @ im, each (n_fft, F).

    Equivalent to torch.fft.irfft(spec, n_fft, norm="backward") for a
    hermitian-extended spectrum of F = n_fft//2 + 1 bins.
    """
    F = n_fft // 2 + 1
    freqs = np.arange(F, dtype=np.float64)
    times = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * times[:, None] * freqs[None, :] / n_fft
    # Interior bins appear twice in the full spectrum (k and N-k).
    scale = np.full(F, 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    cr = (np.cos(ang) * scale[None, :] / n_fft).astype(np.float32)
    ci = (-np.sin(ang) * scale[None, :] / n_fft).astype(np.float32)
    return cr, ci


def stft_power(audio: Array, n_fft: int, hop_length: int) -> Array:
    """|STFT|^2 with center=True reflect padding, hann(n_fft) window.

    Args:
        audio: (B, T)
    Returns:
        (B, n_fft//2+1, 1 + T//hop_length) float32 power spectrogram,
        frame count matching torch.stft(center=True).
    """
    cos_b, sin_b = _stft_basis(n_fft)
    pad = n_fft // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # Strided frame extraction + windowed DFT as one conv:
    # filters (out=2F, in=1, width=n_fft), stride hop.
    filt = jnp.asarray(np.concatenate([cos_b, sin_b], axis=0))[:, None, :]
    y = jax.lax.conv_general_dilated(
        x[:, None, :], filt, window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 2F, N)
    F = n_fft // 2 + 1
    re, im = y[:, :F, :], y[:, F:, :]
    return re * re + im * im


def irfft_frames(spec_re: Array, spec_im: Array, n_fft: int) -> Array:
    """Per-frame inverse rDFT (no window). spec_*: (B, F, T) -> (B, n_fft, T)."""
    cr, ci = _istft_basis(n_fft)
    cr = jnp.asarray(cr).astype(spec_re.dtype)
    ci = jnp.asarray(ci).astype(spec_re.dtype)
    return (peinsum("nf,bft->bnt", cr, spec_re)
            + peinsum("nf,bft->bnt", ci, spec_im))


def overlap_add(frames: Array, hop_length: int) -> Array:
    """Overlap-add frames (B, win, T) -> (B, (T-1)*hop + win).

    Requires win % hop == 0 (true for all vocoder configs: win = 4*hop);
    decomposes each frame into win//hop hop-sized parts and sums shifted
    copies — static shapes, no scatter.
    """
    B, win, T = frames.shape
    assert win % hop_length == 0, (win, hop_length)
    r = win // hop_length
    # parts: (B, r, hop, T)
    parts = frames.reshape(B, r, hop_length, T)
    total_segs = T + r - 1
    out = jnp.zeros((B, hop_length, total_segs), dtype=frames.dtype)
    for j in range(r):
        out = out.at[:, :, j:j + T].add(parts[:, j, :, :])
    # (B, hop, segs) -> (B, segs*hop) in time order
    return out.transpose(0, 2, 1).reshape(B, total_segs * hop_length)


def window_envelope(n_fft: int, hop_length: int, num_frames: int,
                    dtype=jnp.float32) -> Array:
    """Overlap-added squared-window envelope, shape ((T-1)*hop + win,)."""
    w2 = jnp.asarray(hann_window(n_fft) ** 2, dtype=dtype)
    frames = jnp.broadcast_to(w2[None, :, None], (1, n_fft, num_frames))
    return overlap_add(frames, hop_length)[0]


def istft(spec_re: Array, spec_im: Array, n_fft: int, hop_length: int) -> Array:
    """Batch iSTFT with "same" padding (win = n_fft), hann window.

    Args:
        spec_*: (B, F, T) real/imag parts.
    Returns:
        (B, T * hop_length) waveform — matches reference ISTFT.forward
        (fireredtts2/codec/decoder.py:350-405) which trims
        (win - hop)//2 from each side.
    """
    w = jnp.asarray(hann_window(n_fft), dtype=spec_re.dtype)
    frames = irfft_frames(spec_re, spec_im, n_fft) * w[None, :, None]
    y = overlap_add(frames, hop_length)
    env = window_envelope(n_fft, hop_length, spec_re.shape[-1], dtype=y.dtype)
    # Clamp: a periodic hann window is 0 at its first sample, so the very
    # edges of the envelope are 0 — they fall inside the trimmed pad region.
    y = y / jnp.maximum(env[None, :], 1e-11)
    pad = (n_fft - hop_length) // 2
    return y[:, pad:-pad]


def istft_chunk(spec_re: Array, spec_im: Array, cache: Array | None,
                n_fft: int, hop_length: int,
                last_chunk: bool = False) -> tuple[Array, Array]:
    """Streaming iSTFT over one chunk of frames with a windowed-frame cache.

    Args:
        spec_*: (B, F, Tc) chunk spectra.
        cache: (B, n_fft, win//hop - 1) previous chunk's trailing windowed
            ifft frames, or None on the first chunk.
    Returns:
        (audio, new_cache). The emitted audio chain, concatenated over
        chunks, equals the batch :func:`istft` of the full sequence
        (parity with reference decoder.py:407-468).
    """
    assert n_fft % hop_length == 0
    r = n_fft // hop_length
    pad = (n_fft - hop_length) // 2
    w = jnp.asarray(hann_window(n_fft), dtype=spec_re.dtype)
    frames = irfft_frames(spec_re, spec_im, n_fft) * w[None, :, None]
    first = cache is None
    if not first:
        frames = jnp.concatenate([cache.astype(frames.dtype), frames], axis=-1)
    new_cache = frames[..., -(r - 1):]

    y = overlap_add(frames, hop_length)
    env = window_envelope(n_fft, hop_length, frames.shape[-1], dtype=y.dtype)
    y = y / jnp.maximum(env[None, :], 1e-11)

    # Emit only the fully-overlapped region: drop the warmup prefix
    # (pad on the very first chunk, win-hop afterwards) and hold back the
    # trailing win-hop samples (emitted by the next chunk) unless last.
    y = y[:, pad:] if first else y[:, (n_fft - hop_length):]
    y = y[:, :-pad] if last_chunk else y[:, :-(n_fft - hop_length)]
    return y, new_cache
