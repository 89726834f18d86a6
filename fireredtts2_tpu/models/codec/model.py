"""RedCodec assembly: 16 kHz waveform <-> 12.5 Hz RVQ tokens <-> 24 kHz audio.

Capability parity with reference fireredtts2/codec/model.py:151-377:
- encode: mel -> frozen whisper-large-v3 ssl + adaptor (semantic) ‖ acoustic
  whisper encoder -> concat -> 4x GLU downsample -> RVQ codes, processed in
  6 s windows (encode(), model.py:244-305; token_length = ceil(samples/1280));
- decode: RVQ decode -> UpConv x4 -> acoustic decoder -> waveform
  (decode(), model.py:307-324);
- streaming decode: one token -> ~80 ms audio with fixed-shape caches
  (decode_one_token(), model.py:326-377).

The semantic decoder (ssl reconstruction head) exists for training parity;
it is not on the synthesis path.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import CodecConfig
from fireredtts2_tpu.ops.audio import whisper_mel_filters, log_mel_spectrogram
from fireredtts2_tpu.models.codec.whisper_nn import (
    init_whisper_encoder, whisper_encoder_forward,
)
from fireredtts2_tpu.models.codec.encoder import (
    init_ssl_adaptor, ssl_adaptor_forward, init_down_conv, down_conv_forward,
)
from fireredtts2_tpu.models.codec.rvq import init_rvq_params, rvq_encode, rvq_decode
from fireredtts2_tpu.models.codec.decoder import (
    init_upconv, upconv_forward, init_acoustic_decoder,
    acoustic_decoder_forward, stream_state_init, stream_decode_chunk,
    stream_decode_scan, VocoderStreamState,
)

Params = dict[str, Any]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def init_codec_params(key: Array, cfg: CodecConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "ssl": init_whisper_encoder(
            ks[0], cfg.ssl.in_dim, cfg.ssl.embed_dim, cfg.ssl.num_layers,
            cfg.ssl.num_heads, cfg.ssl.resolved_ffn_dim, cfg.ssl.max_positions, dtype),
        "ssl_adaptor": init_ssl_adaptor(ks[1], cfg.ssl_adaptor, dtype),
        "acoustic_encoder": init_whisper_encoder(
            ks[2], cfg.acoustic_encoder.in_dim, cfg.acoustic_encoder.embed_dim,
            cfg.acoustic_encoder.num_layers, cfg.acoustic_encoder.num_heads,
            cfg.acoustic_encoder.resolved_ffn_dim,
            cfg.acoustic_encoder.max_positions, dtype),
        "downsample": init_down_conv(ks[3], cfg.downsample_embed_dim,
                                     cfg.downsample_factor, dtype),
        "rvq": init_rvq_params(ks[4], cfg.rvq, dtype),
        "upsample": init_upconv(ks[5], cfg.upsample_embed_dim,
                                cfg.upsample_stride, dtype),
        "semantic_decoder": init_ssl_adaptor(ks[6], cfg.semantic_decoder, dtype),
        "acoustic_decoder": init_acoustic_decoder(ks[7], cfg.acoustic_decoder, dtype),
        # Host-constant mel filterbank (not trained).
        "mel_filters": jnp.asarray(whisper_mel_filters(
            cfg.mel.num_mels, cfg.mel.n_fft, cfg.mel.sampling_rate,
            cfg.mel.fmin, cfg.mel.fmax)),
    }


def _mel(params: Params, cfg: CodecConfig, audio16k: Array, lengths: Array
         ) -> tuple[Array, Array]:
    mel = log_mel_spectrogram(audio16k, params["mel_filters"],
                              cfg.mel.n_fft, cfg.mel.hop_length)
    return mel.transpose(0, 2, 1), lengths // cfg.mel.hop_length  # (B, T, n_mels)


def encode_window(params: Params, cfg: CodecConfig, audio16k: Array,
                  lengths: Array) -> Array:
    """Encode one batch of fixed-size 16 kHz windows to codes.

    Args:
        audio16k: (B, T) with T a multiple of the 6 s window;
        lengths: (B,) valid samples.
    Returns:
        (nq, B, T_tokens) int32 codes (reference _encode_one_batch,
        model.py:218-235).
    """
    mel, mel_len = _mel(params, cfg, audio16k, lengths)
    ssl, ssl_len = whisper_encoder_forward(
        params["ssl"], cfg.ssl.num_heads, mel, mel_len)
    sem, _ = ssl_adaptor_forward(params["ssl_adaptor"], cfg.ssl_adaptor, ssl, ssl_len)
    aco, aco_len = whisper_encoder_forward(
        params["acoustic_encoder"], cfg.acoustic_encoder.num_heads, mel, mel_len)
    feats = jnp.concatenate([sem, aco], axis=-1)
    down, _ = down_conv_forward(params["downsample"], cfg.downsample_factor,
                                feats, aco_len)
    return rvq_encode(params["rvq"], cfg.rvq, down)


def codec_encode(params: Params, cfg: CodecConfig, audio16k: np.ndarray,
                 lengths: np.ndarray | None = None,
                 encode_fn=None) -> tuple[np.ndarray, np.ndarray]:
    """Host-orchestrated full encode with 6 s chunking (reference encode(),
    model.py:244-305).

    Args:
        audio16k: (B, T) numpy waveform;
        encode_fn: optional jitted encode_window (params/cfg closed over).
    Returns:
        (codes (B, nq, L) int32, token_lengths (B,)) with
        token_length = ceil(samples / 1280) — 12.5 Hz.
    """
    audio16k = np.asarray(audio16k, np.float32)
    B, T = audio16k.shape
    if lengths is None:
        lengths = np.full((B,), T, np.int64)
    win = cfg.encode_chunk_seconds * cfg.input_sample_rate

    if encode_fn is None:
        def encode_fn(a, l):  # noqa: E743
            return encode_window(params, cfg, a, l)

    # Chunk every stream into 6 s windows.
    chunks, owners = [], []
    for b in range(B):
        n = int(lengths[b])
        n_win = max(1, math.ceil(n / win))
        padded = np.zeros((n_win * win,), np.float32)
        padded[:n] = audio16k[b, :n]
        for c in range(n_win):
            chunks.append(padded[c * win:(c + 1) * win])
            owners.append(b)

    # Dispatch windows in capped sub-batches (reference caps at 48,
    # codec/model.py:244) padded up to power-of-two buckets so arbitrary
    # prompt lengths reuse a handful of compiled encoder graphs.
    max_b = max(1, cfg.encode_max_batch)
    parts = []
    for i in range(0, len(chunks), max_b):
        sub = np.stack(chunks[i:i + max_b])
        n_sub = sub.shape[0]
        bs = min(max_b, _next_pow2(n_sub))
        if bs > n_sub:
            sub = np.concatenate(
                [sub, np.zeros((bs - n_sub, win), np.float32)])
        out = np.asarray(encode_fn(
            jnp.asarray(sub), jnp.full((bs,), win, jnp.int32)))
        parts.append(out[:, :n_sub])
    codes = np.concatenate(parts, axis=1)               # (nq, n_chunks, L_win)

    nq = codes.shape[0]
    token_lengths = np.ceil(lengths / cfg.samples_per_token_16k).astype(np.int64)
    L = int(token_lengths.max())
    out = np.zeros((B, nq, L), np.int32)
    for b in range(B):
        rows = [codes[:, i, :] for i, o in enumerate(owners) if o == b]
        full = np.concatenate(rows, axis=-1)
        out[b, :, :token_lengths[b]] = full[:, :token_lengths[b]]
    return out, token_lengths


def codec_decode(params: Params, cfg: CodecConfig, tokens: Array) -> Array:
    """Batch decode tokens (B, nq, L) -> waveform (B, L * 1920) @24 kHz
    (reference decode(), model.py:307-324)."""
    codes = tokens.transpose(1, 0, 2)                  # (nq, B, L)
    feats = rvq_decode(params["rvq"], cfg.rvq, codes)  # (B, L, D)
    dtype = params["upsample"]["in_proj_w"].dtype
    up = upconv_forward(params["upsample"], cfg.upsample_stride,
                        feats.astype(dtype))           # (B, 4L, D)
    lengths = jnp.full((tokens.shape[0],), up.shape[1], jnp.int32)
    audio, _ = acoustic_decoder_forward(
        params["acoustic_decoder"], cfg.acoustic_decoder, up, lengths)
    return audio


def codec_decode_chunks(params: Params, cfg: CodecConfig, tokens: Array
                        ) -> tuple[Array, Array]:
    """Bucket-safe decode: tokens (B, nq, Lpad) -> (middles (L, B, 1920),
    tails (L, B, 360)) with exact streaming semantics, so a bucket-padded
    call can be assembled for ANY true length T <= Lpad:

        audio = concat(middles[0][:, lead:], middles[1:T] ..., tails[T-1])

    (see models/codec/decoder.py:stream_decode_scan). This is the engine's
    decode path; `codec_decode` remains the full-attention single-length
    graph for offline use."""
    codes = tokens.transpose(1, 0, 2)
    feats = rvq_decode(params["rvq"], cfg.rvq, codes)
    dtype = params["upsample"]["in_proj_w"].dtype
    up = upconv_forward(params["upsample"], cfg.upsample_stride,
                        feats.astype(dtype))
    return stream_decode_scan(params["acoustic_decoder"], cfg.acoustic_decoder, up)


def assemble_chunks(middles: np.ndarray, tails: np.ndarray, T: int,
                    hop_length: int, n_fft: int) -> np.ndarray:
    """Host-side assembly of codec_decode_chunks output for true length T.
    Returns (B, T*8*hop) float32."""
    pad = (n_fft - hop_length) // 2
    lead = (n_fft - hop_length) - pad  # samples missing from chunk 0's middle
    parts = [middles[0][:, lead:]]
    for t in range(1, T):
        parts.append(middles[t])
    parts.append(tails[T - 1])
    return np.concatenate(parts, axis=1)


def stream_decode_init(cfg: CodecConfig, batch: int, dtype=jnp.float32,
                       latents: Optional[int] = None) -> VocoderStreamState:
    """latents: optional attention-cache capacity override (100 Hz
    latents, 8 per 12.5 Hz token) for bounded-utterance serving pools."""
    return stream_state_init(cfg.acoustic_decoder, batch, dtype,
                             latents=latents)


def stream_decode_step(params: Params, cfg: CodecConfig, token: Array,
                       state: VocoderStreamState, first: bool, last: bool
                       ) -> tuple[Array, VocoderStreamState]:
    """Decode ONE token (B, nq, 1) to ~80 ms of audio (reference
    decode_one_token(), model.py:326-377). first/last are static flags."""
    codes = token.transpose(1, 0, 2)                    # (nq, B, 1)
    feats = rvq_decode(params["rvq"], cfg.rvq, codes)   # (B, 1, D)
    dtype = params["upsample"]["in_proj_w"].dtype
    up = upconv_forward(params["upsample"], cfg.upsample_stride,
                        feats.astype(dtype))            # (B, 4, D)
    return stream_decode_chunk(params["acoustic_decoder"], cfg.acoustic_decoder,
                               up, state, first, last)
