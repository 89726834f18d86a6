"""Mel filterbank construction and Whisper-style log-mel feature math.

Numerical parity targets (values, not code) from the reference:
- mel filter bank (slaney scale + slaney norm): fireredtts2/codec/audio.py:24-148
- Whisper log-mel normalization: fireredtts2/codec/whisper.py:304-323

Filterbank construction is host-side numpy (done once at model build);
feature extraction is jitted JAX using a matmul-DFT STFT (MXU-friendly —
avoids relying on XLA FFT performance for small transforms).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fireredtts2_tpu.ops.precision import peinsum
from jax import Array

from fireredtts2_tpu.ops.stft import stft_power


def hertz_to_mel(freq, mel_scale: str = "htk"):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    if mel_scale == "kaldi":
        return 1127.0 * np.log(1.0 + freq / 700.0)
    if mel_scale != "slaney":
        raise ValueError("mel_scale must be htk, kaldi, or slaney")
    # Slaney: linear below 1 kHz, log above.
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
                    mels)
    return mels


def mel_to_hertz(mels, mel_scale: str = "htk"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (np.power(10.0, mels / 2595.0) - 1.0)
    if mel_scale == "kaldi":
        return 700.0 * (np.exp(mels / 1127.0) - 1.0)
    if mel_scale != "slaney":
        raise ValueError("mel_scale must be htk, kaldi, or slaney")
    min_log_hertz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region,
                    min_log_hertz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
                    freq)
    return freq


def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, shape (num_frequency_bins, num_mel_filters).

    Same math as librosa/torchaudio/HF: filter centers linearly spaced in
    mel space, triangles formed in Hz space, optional slaney area norm.
    """
    mel_min = hertz_to_mel(min_frequency, mel_scale)
    mel_max = hertz_to_mel(max_frequency, mel_scale)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz(mel_freqs, mel_scale)

    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    # Triangles: rising edge between f[i] and f[i+1], falling between
    # f[i+1] and f[i+2].
    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2:num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError("norm must be None or 'slaney'")
    return fb.astype(np.float32)


def whisper_mel_filters(num_mels: int = 128, n_fft: int = 400,
                        sampling_rate: int = 16_000,
                        fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """The exact filterbank the reference mel frontend uses
    (fireredtts2/codec/whisper.py:294-302): slaney scale + slaney norm."""
    return mel_filter_bank(
        num_frequency_bins=1 + n_fft // 2,
        num_mel_filters=num_mels,
        min_frequency=fmin,
        max_frequency=fmax,
        sampling_rate=sampling_rate,
        norm="slaney",
        mel_scale="slaney",
    )


def log_mel_spectrogram(audio: Array, mel_filters: Array,
                        n_fft: int = 400, hop_length: int = 160) -> Array:
    """Whisper-style log-mel features.

    Args:
        audio: (B, T) waveform at the mel frontend's sample rate.
        mel_filters: (n_freq, n_mels) filterbank (from whisper_mel_filters).
    Returns:
        (B, n_mels, T//hop) log-mel, normalized the Whisper way: log10,
        clamp to (max - 8), then (x + 4) / 4.
        Matches reference fireredtts2/codec/whisper.py:304-323 which computes
        torch.stft(center=True, reflect pad) and drops the final frame.
    """
    power = stft_power(audio, n_fft=n_fft, hop_length=hop_length)  # (B, F, N)
    # torch.stft yields 1 + T//hop frames (center=True); Whisper drops the last.
    power = power[..., :-1]
    mel = peinsum("fm,bft->bmt", mel_filters.astype(power.dtype), power)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
