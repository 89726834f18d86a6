"""Codec training objectives (reconstruction + quantization + distillation).

The reference ships the codec for INFERENCE only (no training loop or
losses in fireredtts2/codec/*; SURVEY §5), but its architecture implies the
standard recipe for this codec family: straight-through RVQ with
commitment/codebook losses, multi-scale mel reconstruction, waveform L1,
and semantic distillation of the frozen SSL features through the semantic
decoder head (which models/codec/model.py already carries for parity).
This module provides those objectives as pure functions so a codec
fine-tune/train step can be assembled like train/step.py; adversarial
(discriminator) training is intentionally out of scope until real data is.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import RVQConfig
from fireredtts2_tpu.ops.audio import mel_filter_bank
from fireredtts2_tpu.ops.precision import peinsum
from fireredtts2_tpu.ops.stft import stft_power
from fireredtts2_tpu.models.codec.rvq import _nearest_code

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# RVQ with straight-through gradients + VQ losses
# ---------------------------------------------------------------------------


def rvq_encode_st(params: Params, cfg: RVQConfig, z: Array
                  ) -> tuple[Array, Array, dict[str, Array]]:
    """RVQ forward for TRAINING: same residual chain as rvq_encode, but
    returns the decoded features with straight-through gradients plus the
    commitment / codebook losses.

    Returns (features (B, T, output_dim) fp32, codes (nq, B, T) int32,
    {"commit_loss", "codebook_loss"}).
    """
    z = z.astype(jnp.float32)
    if "input_proj_w" in params:
        z = z @ params["input_proj_w"] + params["input_proj_b"]

    def step(carry, qp):
        residual, = carry
        z_e = residual @ qp["in_proj_w"] + qp["in_proj_b"]
        idx = _nearest_code(jax.lax.stop_gradient(z_e), qp["codebook"])
        z_q = qp["codebook"][idx]
        commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        codebook = jnp.mean((jax.lax.stop_gradient(z_e) - z_q) ** 2)
        # straight-through: forward uses z_q, gradient flows to z_e
        z_st = z_e + jax.lax.stop_gradient(z_q - z_e)
        recon = z_st @ qp["out_proj_w"] + qp["out_proj_b"]
        return (residual - recon,), (idx, recon, commit, codebook)

    qparams = {k: params[k] for k in
               ("codebook", "in_proj_w", "in_proj_b", "out_proj_w", "out_proj_b")}
    _, (codes, recons, commits, codebooks) = jax.lax.scan(step, (z,), qparams)
    out = jnp.sum(recons, axis=0)                       # (B, T, rd)
    if "output_proj_w" in params:
        out = out @ params["output_proj_w"] + params["output_proj_b"]
    return out, codes, {"commit_loss": jnp.mean(commits),
                        "codebook_loss": jnp.mean(codebooks)}


# ---------------------------------------------------------------------------
# Spectral reconstruction losses
# ---------------------------------------------------------------------------


_MEL_CACHE: dict[tuple, np.ndarray] = {}


def _mel_filters(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    key = (sample_rate, n_fft, n_mels)
    if key not in _MEL_CACHE:
        _MEL_CACHE[key] = mel_filter_bank(
            num_frequency_bins=1 + n_fft // 2, num_mel_filters=n_mels,
            min_frequency=0.0, max_frequency=sample_rate / 2,
            sampling_rate=sample_rate, norm="slaney", mel_scale="slaney")
    return _MEL_CACHE[key]


def multiscale_mel_loss(pred: Array, target: Array, sample_rate: int = 24_000,
                        scales: tuple[int, ...] = (512, 1024, 2048),
                        n_mels: int = 80) -> Array:
    """Mean L1 over log-mel spectrograms at several FFT scales (the
    standard Vocos/EnCodec-family reconstruction term)."""
    total = 0.0
    for n_fft in scales:
        hop = n_fft // 4
        fb = jnp.asarray(_mel_filters(sample_rate, n_fft, n_mels))
        pm = peinsum("fm,bft->bmt", fb, stft_power(pred, n_fft, hop))
        tm = peinsum("fm,bft->bmt", fb, stft_power(target, n_fft, hop))
        pl = jnp.log(jnp.maximum(pm, 1e-7))
        tl = jnp.log(jnp.maximum(tm, 1e-7))
        total = total + jnp.mean(jnp.abs(pl - tl))
    return total / len(scales)


def waveform_l1(pred: Array, target: Array) -> Array:
    n = min(pred.shape[-1], target.shape[-1])
    return jnp.mean(jnp.abs(pred[..., :n] - target[..., :n]))


def semantic_distill_loss(pred_ssl: Array, target_ssl: Array,
                          lengths: Optional[Array] = None) -> Array:
    """Masked L1 + (1 - cosine) between reconstructed and frozen SSL
    features — the semantic decoder head's objective."""
    if lengths is None:
        mask = jnp.ones(pred_ssl.shape[:2], bool)
    else:
        mask = jnp.arange(pred_ssl.shape[1])[None, :] < lengths[:, None]
    m = mask[..., None].astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    l1 = jnp.sum(jnp.abs(pred_ssl - target_ssl) * m) / denom
    pn = pred_ssl * jax.lax.rsqrt(
        jnp.sum(pred_ssl ** 2, -1, keepdims=True) + 1e-8)
    tn = target_ssl * jax.lax.rsqrt(
        jnp.sum(target_ssl ** 2, -1, keepdims=True) + 1e-8)
    cos = jnp.sum(pn * tn, -1, keepdims=True)
    cos_loss = jnp.sum((1.0 - cos) * m[..., :1]) / jnp.maximum(
        m[..., 0].sum(), 1.0)
    return l1 + cos_loss


def codec_train_losses(pred_wav: Array, target_wav: Array,
                       vq_losses: dict[str, Array],
                       pred_ssl: Optional[Array] = None,
                       target_ssl: Optional[Array] = None,
                       ssl_lengths: Optional[Array] = None,
                       mel_weight: float = 15.0, wave_weight: float = 1.0,
                       commit_weight: float = 0.25, codebook_weight: float = 1.0,
                       semantic_weight: float = 1.0,
                       sample_rate: int = 24_000) -> dict[str, Array]:
    """Assemble the total codec objective from its terms."""
    mel = multiscale_mel_loss(pred_wav, target_wav, sample_rate)
    wave = waveform_l1(pred_wav, target_wav)
    total = (mel_weight * mel + wave_weight * wave
             + commit_weight * vq_losses["commit_loss"]
             + codebook_weight * vq_losses["codebook_loss"])
    out = {"mel_loss": mel, "wave_loss": wave, **vq_losses}
    if pred_ssl is not None and target_ssl is not None:
        sem = semantic_distill_loss(pred_ssl, target_ssl, ssl_lengths)
        total = total + semantic_weight * sem
        out["semantic_loss"] = sem
    out["loss"] = total
    return out
