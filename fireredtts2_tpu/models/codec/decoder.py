"""Acoustic decoder / streaming vocoder: UpConv, causal Vocos backbone,
iSTFT head.

Capability parity with reference fireredtts2/codec/decoder.py:
- UpConv 12.5->50 Hz (codec/model.py:123-148): Linear(D,4D) + ConvT(k4,s4)
- AcousticDecoder (decoder.py:550-700): ConvT(k3,s2)+GELU+ConvT(k3,s1)+GELU
  upsample 50->100 Hz (trim to 2T), causal Vocos backbone (CausalConv k7
  in_proj, 2+2 causal resnet blocks, 12 whisper layers with 8-block-causal
  attention, final LN eps 1e-6), iSTFT head (Linear -> exp-mag clip 1e2 /
  phase -> iSTFT hop 240, n_fft 960).
- Streaming forward_chunk with caches (decoder.py:624-700): here every cache
  is a FIXED-SHAPE array (zero-init conv caches are mathematically identical
  to the reference's first-chunk no-cache path; the attention cache is a
  preallocated slab + position instead of an unbounded concat).

Layout: features are (B, T, C); convs convert internally.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import AcousticDecoderConfig
from fireredtts2_tpu.ops.stft import (
    istft, istft_chunk, irfft_frames, overlap_add, window_envelope,
    hann_window as hann_window_cached,
)
from fireredtts2_tpu.ops import masks as mask_ops
from fireredtts2_tpu.models.codec.whisper_nn import (
    init_whisper_layers, whisper_layers_forward, init_kv_slab,
    layer_norm, conv1d, init_conv1d,
)

Params = dict[str, Any]

VOCODER_CHUNK = 8  # 100 Hz latents per 12.5 Hz token (decoder.py:263-266)


# ---------------------------------------------------------------------------
# Primitive convs
# ---------------------------------------------------------------------------


def conv_transpose1d(x: Array, w: Array, stride: int, bias: Array | None = None) -> Array:
    """Torch-semantics ConvTranspose1d, padding=0.

    Args:
        x: (B, C_in, T); w: (C_in, C_out, K) torch layout.
    Returns:
        (B, C_out, (T-1)*stride + K)
    """
    k = w.shape[-1]
    # conv_transpose == lhs-dilated correlation with the flipped, transposed kernel
    w2 = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (C_out, C_in, K)
    y = jax.lax.conv_general_dilated(
        x, w2.astype(x.dtype), window_strides=(1,),
        padding=[(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None]
    return y


def causal_conv1d(x: Array, p: Params) -> Array:
    """CausalConv1d batch forward: left-pad k-1 (decoder.py:78-91). x: (B,C,T)."""
    k = p["w"].shape[-1]
    return conv1d(jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0))), p, 1, 0)


def causal_conv1d_chunk(x: Array, p: Params, cache: Array) -> tuple[Array, Array]:
    """Streaming causal conv: cache (B, C, k-1) carries the previous tail.
    Zero-init cache == the batch zero left-pad (decoder.py:93-101)."""
    k = p["w"].shape[-1]
    xin = jnp.concatenate([cache.astype(x.dtype), x], axis=-1)
    new_cache = xin[..., -(k - 1):]
    return conv1d(xin, p, 1, 0), new_cache


# ---------------------------------------------------------------------------
# UpConv (12.5 Hz tokens -> 50 Hz latents), naturally causal
# ---------------------------------------------------------------------------


def init_upconv(key: Array, embed_dim: int, stride: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    d, s = embed_dim, stride
    return {
        "in_proj_w": (jax.random.normal(k1, (d, s * d), jnp.float32) * 0.02).astype(dtype),
        "in_proj_b": jnp.zeros((s * d,), dtype),
        # ConvT(s*d -> d, k=s, s=s) == per-step matmul (no overlap): (s*d, d, s)
        "up_conv_w": (jax.random.normal(k2, (s * d, d, s), jnp.float32) * 0.02).astype(dtype),
    }


def upconv_forward(params: Params, stride: int, x: Array) -> Array:
    """x: (B, T, D) -> (B, T*stride, D). Kernel==stride => a reshape-matmul
    (each input step independently produces `stride` outputs)."""
    B, T, D = x.shape
    h = x @ params["in_proj_w"] + params["in_proj_b"]       # (B, T, s*D)
    # out[b, t*s + j, o] = sum_i h[b,t,i] * w[i,o,j]
    y = jnp.einsum("bti,ioj->btjo", h, params["up_conv_w"].astype(h.dtype))
    return y.reshape(B, T * stride, D)


# ---------------------------------------------------------------------------
# Causal resnet block (LN -> SiLU -> CausalConv, twice; decoder.py:105-171)
# ---------------------------------------------------------------------------


def init_causal_resnet(key: Array, dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ln1_w": jnp.ones((dim,), dtype), "ln1_b": jnp.zeros((dim,), dtype),
        "conv1": init_conv1d(k1, dim, dim, 3, dtype),
        "ln2_w": jnp.ones((dim,), dtype), "ln2_b": jnp.zeros((dim,), dtype),
        "conv2": init_conv1d(k2, dim, dim, 3, dtype),
    }


def causal_resnet_forward(p: Params, x: Array) -> Array:
    """x: (B, T, C)."""
    h = jax.nn.silu(layer_norm(x, p["ln1_w"], p["ln1_b"]))
    h = causal_conv1d(h.transpose(0, 2, 1), p["conv1"]).transpose(0, 2, 1)
    h = jax.nn.silu(layer_norm(h, p["ln2_w"], p["ln2_b"]))
    h = causal_conv1d(h.transpose(0, 2, 1), p["conv2"]).transpose(0, 2, 1)
    return x + h


def causal_resnet_chunk(p: Params, x: Array, cache1: Array, cache2: Array
                        ) -> tuple[Array, Array, Array]:
    h = jax.nn.silu(layer_norm(x, p["ln1_w"], p["ln1_b"]))
    h, c1 = causal_conv1d_chunk(h.transpose(0, 2, 1), p["conv1"], cache1)
    h = h.transpose(0, 2, 1)
    h = jax.nn.silu(layer_norm(h, p["ln2_w"], p["ln2_b"]))
    h, c2 = causal_conv1d_chunk(h.transpose(0, 2, 1), p["conv2"], cache2)
    return x + h.transpose(0, 2, 1), c1, c2


# ---------------------------------------------------------------------------
# Acoustic decoder
# ---------------------------------------------------------------------------


def group_norm(x: Array, w: Array, b: Array, groups: int = 32,
               eps: float = 1e-6) -> Array:
    """GroupNorm over channels of (B, C, T) (reference ResnetBlock uses
    nn.GroupNorm(32), decoder.py:22-36)."""
    B, C, T = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T)
    mu = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=(2, 3), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, C, T)
    return (y * w.astype(jnp.float32)[None, :, None]
            + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)


def init_resnet(key: Array, dim: int, dtype=jnp.float32) -> Params:
    """Non-causal ResnetBlock params: GroupNorm -> SiLU -> Conv(k3,p1), x2."""
    k1, k2 = jax.random.split(key)
    return {
        "gn1_w": jnp.ones((dim,), dtype), "gn1_b": jnp.zeros((dim,), dtype),
        "conv1": init_conv1d(k1, dim, dim, 3, dtype),
        "gn2_w": jnp.ones((dim,), dtype), "gn2_b": jnp.zeros((dim,), dtype),
        "conv2": init_conv1d(k2, dim, dim, 3, dtype),
    }


def resnet_forward(p: Params, x: Array) -> Array:
    """Non-causal resnet (reference decoder.py:8-63). x: (B, T, C)."""
    h = x.transpose(0, 2, 1)
    h = conv1d(jax.nn.silu(group_norm(h, p["gn1_w"], p["gn1_b"])), p["conv1"], 1, 1)
    h = conv1d(jax.nn.silu(group_norm(h, p["gn2_w"], p["gn2_b"])), p["conv2"], 1, 1)
    return x + h.transpose(0, 2, 1)


def init_acoustic_decoder(key: Array, cfg: AcousticDecoderConfig,
                          dtype=jnp.float32) -> Params:
    d = cfg.embed_dim
    if not cfg.causal:
        ks = jax.random.split(key, 10)
        return {
            "up1_w": (jax.random.normal(ks[0], (d, d, 3), jnp.float32) * 0.02).astype(dtype),
            "up1_b": jnp.zeros((d,), dtype),
            "up2_w": (jax.random.normal(ks[1], (d, d, 3), jnp.float32) * 0.02).astype(dtype),
            "up2_b": jnp.zeros((d,), dtype),
            "in_proj": init_conv1d(ks[2], d, d, 7, dtype),
            "prior0": init_resnet(ks[3], d, dtype),
            "prior1": init_resnet(ks[4], d, dtype),
            "layers": init_whisper_layers(ks[5], cfg.num_layers, d, 4 * d, dtype),
            "post0": init_resnet(ks[6], d, dtype),
            "post1": init_resnet(ks[7], d, dtype),
            "final_ln_w": jnp.ones((d,), dtype),
            "final_ln_b": jnp.zeros((d,), dtype),
            "head_w": (jax.random.normal(ks[8], (d, cfg.n_fft + 2), jnp.float32) * 0.02).astype(dtype),
            "head_b": jnp.zeros((cfg.n_fft + 2,), dtype),
        }
    ks = jax.random.split(key, 10)
    return {
        # upsample_conv: ConvT(d,d,k3,s2) + ConvT(d,d,k3,s1), torch layout (in,out,k)
        "up1_w": (jax.random.normal(ks[0], (d, d, 3), jnp.float32) * 0.02).astype(dtype),
        "up1_b": jnp.zeros((d,), dtype),
        "up2_w": (jax.random.normal(ks[1], (d, d, 3), jnp.float32) * 0.02).astype(dtype),
        "up2_b": jnp.zeros((d,), dtype),
        # backbone
        "in_proj": init_conv1d(ks[2], d, d, 7, dtype),
        "prior0": init_causal_resnet(ks[3], d, dtype),
        "prior1": init_causal_resnet(ks[4], d, dtype),
        "layers": init_whisper_layers(ks[5], cfg.num_layers, d, 4 * d, dtype),
        "post0": init_causal_resnet(ks[6], d, dtype),
        "post1": init_causal_resnet(ks[7], d, dtype),
        "final_ln_w": jnp.ones((d,), dtype), "final_ln_b": jnp.zeros((d,), dtype),
        # iSTFT head
        "head_w": (jax.random.normal(ks[8], (d, cfg.n_fft + 2), jnp.float32) * 0.02).astype(dtype),
        "head_b": jnp.zeros((cfg.n_fft + 2,), dtype),
    }


def _upsample_batch(params: Params, x: Array) -> Array:
    """50->100 Hz: ConvT(k3,s2)+GELU+ConvT(k3,s1)+GELU, trimmed to 2T
    (decoder.py:604-617). x: (B, T, D) -> (B, 2T, D)."""
    target = 2 * x.shape[1]
    h = x.transpose(0, 2, 1)
    h = jax.nn.gelu(conv_transpose1d(h, params["up1_w"], 2, params["up1_b"]),
                    approximate=False)
    h = jax.nn.gelu(conv_transpose1d(h, params["up2_w"], 1, params["up2_b"]),
                    approximate=False)
    return h.transpose(0, 2, 1)[:, :target]


def _head_spectrum(params: Params, x: Array) -> tuple[Array, Array]:
    """Vocos iSTFT head: hidden -> (re, im) each (B, F, T) (decoder.py:492-521)."""
    pred = (x @ params["head_w"] + params["head_b"]).astype(jnp.float32)
    pred = pred.transpose(0, 2, 1)                     # (B, n_fft+2, T)
    F = pred.shape[1] // 2
    mag = jnp.minimum(jnp.exp(pred[:, :F]), 1e2)
    phase = pred[:, F:]
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


def acoustic_decoder_forward(params: Params, cfg: AcousticDecoderConfig,
                             x: Array, lengths: Array,
                             remat: Optional[str] = None
                             ) -> tuple[Array, Array]:
    """Batch decode: (B, T50, D), lengths at 50 Hz -> ((B, T50*2*hop), lengths).

    Backbone attention uses the 8-block-causal mask so batch == streaming
    (decoder.py:263-266).
    """
    h = _upsample_batch(params, x)
    T = h.shape[1]
    lengths = lengths * 2
    # backbone
    hc = h.transpose(0, 2, 1)
    if cfg.causal:
        hc = causal_conv1d(hc, params["in_proj"]).transpose(0, 2, 1)
        hc = causal_resnet_forward(params["prior0"], hc)
        hc = causal_resnet_forward(params["prior1"], hc)
        mask = mask_ops.block_causal_mask(lengths, T, VOCODER_CHUNK)
    else:
        # Non-causal VocosBackbone (reference decoder.py:175-221): same-pad
        # conv front, GroupNorm resnets, full (non-pad-only) attention.
        hc = conv1d(hc, params["in_proj"], 1, 3).transpose(0, 2, 1)
        hc = resnet_forward(params["prior0"], hc)
        hc = resnet_forward(params["prior1"], hc)
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        mask = valid[:, None, :] & jnp.ones((1, T, 1), bool)
    hc, _ = whisper_layers_forward(params["layers"], cfg.num_heads, hc, mask,
                                   remat=remat)
    if cfg.causal:
        hc = causal_resnet_forward(params["post0"], hc)
        hc = causal_resnet_forward(params["post1"], hc)
    else:
        hc = resnet_forward(params["post0"], hc)
        hc = resnet_forward(params["post1"], hc)
    hc = layer_norm(hc, params["final_ln_w"], params["final_ln_b"], eps=1e-6)
    re, im = _head_spectrum(params, hc)
    audio = istft(re, im, cfg.n_fft, cfg.hop_length)
    return audio, lengths * cfg.hop_length


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


class VocoderStreamState(NamedTuple):
    """Fixed-shape streaming carry (replaces the reference's dict of five
    growing tensors, codec/model.py:346-375)."""
    up1_cache: Array      # (B, D, 1)   acoustic ConvT k3 s2 input tail
    up2_cache: Array      # (B, D, 2)   acoustic ConvT k3 s1 input tail
    in_proj_cache: Array  # (B, D, 6)   backbone CausalConv k7
    rb_caches: Array      # (4, 2, B, D, 2) four resnet blocks x two convs
    kv_k: Array           # (L, B, T_max, H*Dh) attention slab — heads
    kv_v: Array           # MERGED: Dh=64 < the 128-lane tile, so a
                          # (..., H, Dh) layout pays 2x tile padding
                          # (2.20 GB for 1.10 GB of slab at B=16)
    istft_cache: Array    # (B, n_fft, 3) trailing windowed ifft frames
    pos: Array            # (B,) int32 latents written so far (100 Hz)


def stream_state_init(cfg: AcousticDecoderConfig, batch: int,
                      dtype=jnp.float32, latents: Optional[int] = None
                      ) -> VocoderStreamState:
    """latents: optional KV capacity override in 100 Hz latents (must be a
    multiple of 16 so the flash kernel's chunk divisor exists; 8 latents
    per 12.5 Hz token — a pool capped at F frames needs 8*F)."""
    d = cfg.embed_dim
    cap = latents or cfg.max_stream_latents
    assert cap % 16 == 0, f"vocoder latent capacity {cap} not 16-aligned"
    slab = init_kv_slab(cfg.num_layers, batch, cap,
                        cfg.num_heads, d // cfg.num_heads, dtype,
                        merged=True)
    return VocoderStreamState(
        up1_cache=jnp.zeros((batch, d, 1), dtype),
        up2_cache=jnp.zeros((batch, d, 2), dtype),
        in_proj_cache=jnp.zeros((batch, d, 6), dtype),
        rb_caches=jnp.zeros((4, 2, batch, d, 2), dtype),
        kv_k=slab["k"], kv_v=slab["v"],
        istft_cache=jnp.zeros((batch, cfg.n_fft, 3), dtype),
        pos=jnp.zeros((batch,), jnp.int32),
    )


def _upsample_chunk(params: Params, x: Array, up1_cache: Array, up2_cache: Array
                    ) -> tuple[Array, Array, Array]:
    """Streaming 50->100 Hz upsample over one 4-latent chunk
    (decoder.py:624-655; zero caches reproduce the first-chunk path).

    x: (B, 4, D) -> (B, 8, D).
    """
    h = x.transpose(0, 2, 1)                                  # (B, D, 4)
    hin = jnp.concatenate([up1_cache.astype(h.dtype), h], axis=-1)
    new_up1 = hin[..., -1:]
    y = conv_transpose1d(hin, params["up1_w"], 2, params["up1_b"])[..., :-1]
    y = jax.nn.gelu(y[..., 2:], approximate=False)
    yin = jnp.concatenate([up2_cache.astype(y.dtype), y], axis=-1)
    new_up2 = yin[..., -2:]
    z = conv_transpose1d(yin, params["up2_w"], 1, params["up2_b"])[..., :-2]
    z = jax.nn.gelu(z[..., 2:], approximate=False)
    return z.transpose(0, 2, 1), new_up1, new_up2


def stream_decode_chunk(params: Params, cfg: AcousticDecoderConfig,
                        x: Array, state: VocoderStreamState,
                        first: bool, last: bool) -> tuple[Array, VocoderStreamState]:
    """Decode one token's worth of latents to ~80 ms of audio.

    Args:
        x: (B, 4, D) 50 Hz latents of ONE 12.5 Hz token (from UpConv).
        first/last: static chunk-position flags (compile ≤4 variants); they
            only affect how much fully-overlapped iSTFT audio is emitted.
    Returns:
        (audio (B, n_samples), new state). Chained outputs concatenate to
        exactly the batch decoder's waveform.
    """
    h, up1, up2 = _upsample_chunk(params, x, state.up1_cache, state.up2_cache)
    S = h.shape[1]  # 8 latents

    hc = h.transpose(0, 2, 1)
    hc, in_cache = causal_conv1d_chunk(hc, params["in_proj"], state.in_proj_cache)
    hc = hc.transpose(0, 2, 1)
    rb = state.rb_caches
    hc, c0a, c0b = causal_resnet_chunk(params["prior0"], hc, rb[0, 0], rb[0, 1])
    hc, c1a, c1b = causal_resnet_chunk(params["prior1"], hc, rb[1, 0], rb[1, 1])

    # Attention: this chunk's 8 latents see every written slot plus themselves.
    # 8-block-causal within the chunk (reference decoder.py:263-266): a
    # query latent sees every slot up to the END of its own 8-latent token
    # block, never later tokens. For S == 8 (one token) this equals the
    # old full pos + S window; chunks are whole tokens so pos is 8-aligned.
    q_end = (state.pos[:, None]
             + ((jnp.arange(S, dtype=jnp.int32)[None, :]
                 // VOCODER_CHUNK) + 1) * VOCODER_CHUNK)        # (B, S)
    cache = {"k": state.kv_k, "v": state.kv_v}
    hc, cache = whisper_layers_forward(
        params["layers"], cfg.num_heads, hc, None, cache, state.pos,
        q_end=q_end, live_hi=jnp.max(state.pos) + S)

    hc, c2a, c2b = causal_resnet_chunk(params["post0"], hc, rb[2, 0], rb[2, 1])
    hc, c3a, c3b = causal_resnet_chunk(params["post1"], hc, rb[3, 0], rb[3, 1])
    hc = layer_norm(hc, params["final_ln_w"], params["final_ln_b"], eps=1e-6)

    re, im = _head_spectrum(params, hc)
    audio, istft_cache = istft_chunk(
        re, im, None if first else state.istft_cache.astype(re.dtype),
        cfg.n_fft, cfg.hop_length, last_chunk=last)

    new_state = VocoderStreamState(
        up1_cache=up1, up2_cache=up2, in_proj_cache=in_cache,
        rb_caches=jnp.stack([jnp.stack([c0a, c0b]), jnp.stack([c1a, c1b]),
                             jnp.stack([c2a, c2b]), jnp.stack([c3a, c3b])]),
        kv_k=cache["k"], kv_v=cache["v"],
        istft_cache=istft_cache.astype(state.istft_cache.dtype),
        pos=state.pos + S,
    )
    return audio, new_state


def _vocoder_backbone_chunk(params: Params, cfg: AcousticDecoderConfig,
                            x: Array, state: VocoderStreamState
                            ) -> tuple[Array, VocoderStreamState]:
    """Shared streaming front (upsample + convs + attention + head) for one
    token chunk. Returns (windowed ifft frames (B, n_fft, 8), new state with
    istft_cache set to the trailing frames)."""
    h, up1, up2 = _upsample_chunk(params, x, state.up1_cache, state.up2_cache)
    S = h.shape[1]
    hc = h.transpose(0, 2, 1)
    hc, in_cache = causal_conv1d_chunk(hc, params["in_proj"], state.in_proj_cache)
    hc = hc.transpose(0, 2, 1)
    rb = state.rb_caches
    hc, c0a, c0b = causal_resnet_chunk(params["prior0"], hc, rb[0, 0], rb[0, 1])
    hc, c1a, c1b = causal_resnet_chunk(params["prior1"], hc, rb[1, 0], rb[1, 1])
    # 8-block-causal within the chunk (reference decoder.py:263-266): a
    # query latent sees every slot up to the END of its own 8-latent token
    # block, never later tokens. For S == 8 (one token) this equals the
    # old full pos + S window; chunks are whole tokens so pos is 8-aligned.
    q_end = (state.pos[:, None]
             + ((jnp.arange(S, dtype=jnp.int32)[None, :]
                 // VOCODER_CHUNK) + 1) * VOCODER_CHUNK)        # (B, S)
    cache = {"k": state.kv_k, "v": state.kv_v}
    hc, cache = whisper_layers_forward(
        params["layers"], cfg.num_heads, hc, None, cache, state.pos,
        q_end=q_end, live_hi=jnp.max(state.pos) + S)
    hc, c2a, c2b = causal_resnet_chunk(params["post0"], hc, rb[2, 0], rb[2, 1])
    hc, c3a, c3b = causal_resnet_chunk(params["post1"], hc, rb[3, 0], rb[3, 1])
    hc = layer_norm(hc, params["final_ln_w"], params["final_ln_b"], eps=1e-6)
    re, im = _head_spectrum(params, hc)
    w = jnp.asarray(hann_window_cached(cfg.n_fft), dtype=jnp.float32)
    frames = irfft_frames(re, im, cfg.n_fft) * w[None, :, None]
    r_1 = cfg.n_fft // cfg.hop_length - 1
    new_state = VocoderStreamState(
        up1_cache=up1, up2_cache=up2, in_proj_cache=in_cache,
        rb_caches=jnp.stack([jnp.stack([c0a, c0b]), jnp.stack([c1a, c1b]),
                             jnp.stack([c2a, c2b]), jnp.stack([c3a, c3b])]),
        kv_k=cache["k"], kv_v=cache["v"],
        istft_cache=frames[..., -r_1:].astype(state.istft_cache.dtype),
        pos=state.pos + S,
    )
    return frames, new_state


def _norm_ola(frames: Array, hop: int, n_fft: int) -> Array:
    y = overlap_add(frames, hop)
    env = window_envelope(n_fft, hop, frames.shape[-1], dtype=y.dtype)
    return y / jnp.maximum(env[None, :], 1e-11)


def stream_decode_step_batched(params: Params, cfg: AcousticDecoderConfig,
                               x: Array, state: VocoderStreamState,
                               is_first: Array
                               ) -> tuple[Array, Array, VocoderStreamState]:
    """Continuous-batching vocoder step: per-slot `is_first` is TRACED
    (slots join the batch at different times), so both emission variants are
    computed and selected per slot.

    Args:
        x: (B, 4, D) one token's 50 Hz latents per slot.
        is_first: (B,) bool — True for a slot's first chunk.
    Returns:
        (middle (B, chunk*hop) — for first chunks only the trailing
         chunk*hop - lead samples are valid (left zero-padded, lead =
         (n_fft-hop) - pad);
         tail (B, (n_fft-hop) - pad) — the closing emission if this chunk
         were the slot's last;
         new state).
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = (n_fft - hop) // 2
    prev_cache = state.istft_cache
    frames, new_state = _vocoder_backbone_chunk(params, cfg, x, state)

    # rest-style: use the 3-frame cache
    frames_cat = jnp.concatenate([prev_cache.astype(frames.dtype), frames],
                                 axis=-1)
    y_rest = _norm_ola(frames_cat, hop, n_fft)
    mid_rest = y_rest[:, (n_fft - hop):-(n_fft - hop)]          # chunk*hop
    tail_rest = y_rest[:, -(n_fft - hop):-pad]

    # first-style: no cache
    y_first = _norm_ola(frames, hop, n_fft)
    mid_first = y_first[:, pad:-(n_fft - hop)]                   # chunk*hop - lead
    lead = mid_rest.shape[1] - mid_first.shape[1]
    mid_first = jnp.pad(mid_first, ((0, 0), (lead, 0)))
    tail_first = y_first[:, -(n_fft - hop):-pad]

    f = is_first[:, None]
    middle = jnp.where(f, mid_first, mid_rest)
    tail = jnp.where(f, tail_first, tail_rest)
    return middle, tail, new_state


def stream_decode_block_batched(params: Params, cfg: AcousticDecoderConfig,
                                x: Array, state: VocoderStreamState,
                                is_first: Array
                                ) -> tuple[Array, Array, VocoderStreamState]:
    """K-token batched vocoder step: all of a fused block's tokens in ONE
    backbone pass, so the 12-layer transformer weights are read once per
    BLOCK instead of once per frame (the streaming analogue of the offline
    grouped scan — at 16 streams the per-frame vocoder pass was the
    serving bottleneck, PERF.md).

    Args:
        x: (B, 4*K, D) K tokens' 50 Hz latents per slot.
        is_first: (B,) bool — True for a slot's first block.
    Returns:
        (middle (B, K*chunk*hop) — for first blocks the leading `lead`
         samples are zero-padding;
         tails (K, B, (n_fft-hop) - pad) — tails[j] is the closing
         emission if token j were the slot's last (a cut's tail depends
         only on the 3 windowed frames preceding it, so it is independent
         of the first/rest emission style);
         new state).
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = (n_fft - hop) // 2
    r_1 = n_fft // hop - 1                                       # 3
    K = x.shape[1] // 4
    prev_cache = state.istft_cache
    frames, new_state = _vocoder_backbone_chunk(params, cfg, x, state)

    frames_cat = jnp.concatenate([prev_cache.astype(frames.dtype), frames],
                                 axis=-1)
    y_rest = _norm_ola(frames_cat, hop, n_fft)
    mid_rest = y_rest[:, (n_fft - hop):-(n_fft - hop)]           # K*chunk*hop

    y_first = _norm_ola(frames, hop, n_fft)
    mid_first = y_first[:, pad:-(n_fft - hop)]
    lead = mid_rest.shape[1] - mid_first.shape[1]
    mid_first = jnp.pad(mid_first, ((0, 0), (lead, 0)))
    middle = jnp.where(is_first[:, None], mid_first, mid_rest)

    # Per-cut closing tails: the OLA tail after token j draws only on the
    # last r_1 windowed frames before the cut (stream_decode_tail's math),
    # i.e. frames[..., 8j+8-r_1 : 8j+8] — same for first/rest styles.
    def cut_tail(win: Array) -> Array:
        y = overlap_add(win.astype(jnp.float32), hop)
        env = window_envelope(n_fft, hop, r_1, dtype=y.dtype)
        y = y / jnp.maximum(env[None, :], 1e-11)
        start = r_1 * hop
        return y[:, start:start + (n_fft - hop) - pad]

    tails = jnp.stack([cut_tail(frames[..., 8 * j + 8 - r_1: 8 * j + 8])
                       for j in range(K)])                       # (K, B, ts)
    return middle, tails, new_state


def reset_vocoder_slot(state: VocoderStreamState, b: Array) -> VocoderStreamState:
    """Zero one slot's caches (a new stream claims the slot)."""
    def zero_at(arr: Array, axis: int) -> Array:
        upd = jnp.zeros_like(
            jax.lax.dynamic_index_in_dim(arr, b, axis, keepdims=False))
        return jax.lax.dynamic_update_index_in_dim(arr, upd, b, axis)

    return VocoderStreamState(
        up1_cache=zero_at(state.up1_cache, 0),
        up2_cache=zero_at(state.up2_cache, 0),
        in_proj_cache=zero_at(state.in_proj_cache, 0),
        rb_caches=zero_at(state.rb_caches, 2),
        kv_k=zero_at(state.kv_k, 1),
        kv_v=zero_at(state.kv_v, 1),
        istft_cache=zero_at(state.istft_cache, 0),
        pos=state.pos.at[b].set(0),
    )


def reset_vocoder_slots(state: VocoderStreamState,
                        bs: Array) -> VocoderStreamState:
    """Zero a VECTOR of slots' caches in one program (admission-burst
    counterpart of reset_vocoder_slot): bs is (B,) int32 padded with
    out-of-range B for unused entries — those scatters drop. Only the
    addressed rows are written; the KV slabs are scattered per row, not
    rewritten whole."""
    def zero_rows(arr: Array, axis: int) -> Array:
        upd_shape = arr.shape[:axis] + (bs.shape[0],) + arr.shape[axis + 1:]
        upd = jnp.zeros(upd_shape, arr.dtype)
        idx = (slice(None),) * axis + (bs,)
        return arr.at[idx].set(upd, mode="drop")

    return VocoderStreamState(
        up1_cache=zero_rows(state.up1_cache, 0),
        up2_cache=zero_rows(state.up2_cache, 0),
        in_proj_cache=zero_rows(state.in_proj_cache, 0),
        rb_caches=zero_rows(state.rb_caches, 2),
        kv_k=zero_rows(state.kv_k, 1),
        kv_v=zero_rows(state.kv_v, 1),
        istft_cache=zero_rows(state.istft_cache, 0),
        pos=state.pos.at[bs].set(0, mode="drop"),
    )


def stream_decode_tail(cfg: AcousticDecoderConfig,
                       state: VocoderStreamState) -> Array:
    """Emit the closing samples held back by the last non-last chunk.

    After any stream_decode_chunk(last=False), the stream is missing the
    final (n_fft - hop) - pad samples relative to "this chunk was last".
    Those samples draw ONLY on the cached trailing windowed frames (the
    window spans n_fft//hop frames), so they are computable from the carry:
    decoupling vocoding from EOS detection lets the engine vocode frames
    speculatively and emit this tail once EOS is known.

    Returns (B, (n_fft - hop) - pad) samples.
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = (n_fft - hop) // 2
    frames = state.istft_cache.astype(jnp.float32)       # (B, n_fft, r-1)
    r_1 = frames.shape[-1]                               # n_fft//hop - 1
    y = overlap_add(frames, hop)                         # (B, (r_1-1)*hop + n_fft)
    env = window_envelope(n_fft, hop, r_1, dtype=y.dtype)
    y = y / jnp.maximum(env[None, :], 1e-11)
    # In full-stream coordinates the tail starts (n_fft - hop) before the
    # end and stops pad before it; the cache's first frame starts r_1*hop
    # before the stream end... offset math: tail = y[r_1*hop : r_1*hop + (n_fft-hop) - pad].
    start = r_1 * hop
    return y[:, start:start + (n_fft - hop) - pad]


def stream_decode_scan(params: Params, cfg: AcousticDecoderConfig,
                       latents: Array, group: int = 8) -> tuple[Array, Array]:
    """Decode many tokens' latents in ONE compiled scan with exact streaming
    semantics (no tail pollution from bucket padding).

    Per token t the step emits:
      middle[t]: (B, chunk*hop) samples — for t==0 only the trailing
          chunk*hop - (n_fft-hop) + pad samples are valid (left zero-padded);
      tail[t]: (B, (n_fft-hop) - pad) samples — the closing emission if t
          were the LAST real token.
    Host assembly for true length T:
      audio = concat(middle[0][pad_lead:], middle[1:T], tail[T-1])
            == batch decode of exactly T tokens.

    Args:
        latents: (B, L*4, D) 50 Hz latents from UpConv (L tokens).
        group: STATIC tokens per scan step. The per-token scan is
            per-step-overhead bound (~2.7 ms/token on v5e at group=1, far
            above the weight-read floor); grouping processes group*8
            latents per step behind an 8-block-causal mask — each token
            still attends exactly to its own block plus everything earlier,
            so emissions equal the group=1 stream within matmul-tiling
            tolerance. L must be a multiple of group (the engine's Lpad
            multiples of 32 guarantee it).
    Returns:
        (middles (L, B, chunk*hop), tails (L, B, n_fft-hop-pad)).
    """
    B = latents.shape[0]
    L = latents.shape[1] // 4
    if L % group:
        group = 1
    G = group
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = (n_fft - hop) // 2
    r_1 = n_fft // hop - 1
    state = stream_state_init(cfg, B, latents.dtype)

    w = jnp.asarray(hann_window_cached(n_fft), dtype=jnp.float32)

    def backbone_chunk(x, st: VocoderStreamState):
        """Shared conv+attention front; returns windowed ifft frames.
        x: (B, 4*G, D) -> frames (B, n_fft, 8*G)."""
        h, up1, up2 = _upsample_chunk(params, x, st.up1_cache, st.up2_cache)
        S = h.shape[1]
        hc = h.transpose(0, 2, 1)
        hc, in_cache = causal_conv1d_chunk(hc, params["in_proj"], st.in_proj_cache)
        hc = hc.transpose(0, 2, 1)
        rb = st.rb_caches
        hc, c0a, c0b = causal_resnet_chunk(params["prior0"], hc, rb[0, 0], rb[0, 1])
        hc, c1a, c1b = causal_resnet_chunk(params["prior1"], hc, rb[1, 0], rb[1, 1])
        # 8-block-causal within the chunk: query q (latent index within this
        # chunk) sees keys < pos + 8*(q//8 + 1) — its own token's block plus
        # all earlier slots. For G=1 this is the original "whole chunk" mask.
        q_end = st.pos[:, None] + 8 * (jnp.arange(S, dtype=jnp.int32)[None] // 8 + 1)
        cache = {"k": st.kv_k, "v": st.kv_v}
        hc, cache = whisper_layers_forward(
            params["layers"], cfg.num_heads, hc, None, cache, st.pos,
            q_end=q_end, live_hi=jnp.max(st.pos) + S)
        hc, c2a, c2b = causal_resnet_chunk(params["post0"], hc, rb[2, 0], rb[2, 1])
        hc, c3a, c3b = causal_resnet_chunk(params["post1"], hc, rb[3, 0], rb[3, 1])
        hc = layer_norm(hc, params["final_ln_w"], params["final_ln_b"], eps=1e-6)
        re, im = _head_spectrum(params, hc)
        frames = irfft_frames(re, im, n_fft) * w[None, :, None]  # (B, n_fft, S)
        new_st = VocoderStreamState(
            up1_cache=up1, up2_cache=up2, in_proj_cache=in_cache,
            rb_caches=jnp.stack([jnp.stack([c0a, c0b]), jnp.stack([c1a, c1b]),
                                 jnp.stack([c2a, c2b]), jnp.stack([c3a, c3b])]),
            kv_k=cache["k"], kv_v=cache["v"],
            istft_cache=frames[..., -r_1:].astype(st.istft_cache.dtype),
            pos=st.pos + S,
        )
        return frames, new_st

    def emit_first(frames):
        # frames: (B, n_fft, 8); OLA 8 frames, trim pad front / hold 720 back
        y = overlap_add(frames, hop)
        env = window_envelope(n_fft, hop, frames.shape[-1], dtype=y.dtype)
        y = y / jnp.maximum(env[None, :], 1e-11)
        middle = y[:, pad:-(n_fft - hop)]                        # 1560
        middle = jnp.pad(middle, ((0, 0), (VOCODER_CHUNK * hop - middle.shape[1], 0)))
        tail = y[:, -(n_fft - hop):-pad]                         # 360
        return middle, tail

    def emit_rest(frames_with_cache):
        y = overlap_add(frames_with_cache, hop)
        env = window_envelope(n_fft, hop, frames_with_cache.shape[-1], dtype=y.dtype)
        y = y / jnp.maximum(env[None, :], 1e-11)
        middle = y[:, (n_fft - hop):-(n_fft - hop)]              # 1920
        tail = y[:, -(n_fft - hop):-pad]                         # 360
        return middle, tail

    def step(carry, xs):
        st, t = carry                                            # t: group index
        x = xs                                                   # (B, 4*G, D)
        prev_cache = st.istft_cache
        frames, new_st = backbone_chunk(x, st)
        frames_cat = jnp.concatenate(
            [prev_cache.astype(frames.dtype), frames], axis=-1)  # (B, n_fft, r_1 + 8G)
        mids, tls = [], []
        for g in range(G):                                       # static unroll
            window = jax.lax.slice_in_dim(frames_cat, 8 * g, 8 * g + 8 + r_1,
                                          axis=2)
            if g == 0:
                middle, tail = jax.lax.cond(
                    t == 0,
                    lambda: emit_first(
                        jax.lax.slice_in_dim(frames, 0, 8, axis=2)),
                    lambda: emit_rest(window))
            else:
                middle, tail = emit_rest(window)
            mids.append(middle)
            tls.append(tail)
        return (new_st, t + 1), (jnp.stack(mids), jnp.stack(tls))

    xs = latents.reshape(B, L // G, 4 * G, -1).transpose(1, 0, 2, 3)
    (_, _), (middles, tails) = jax.lax.scan(step, (state, jnp.int32(0)), xs)
    # (L//G, G, B, ...) -> (L, B, ...)
    return (middles.reshape(L, *middles.shape[2:]),
            tails.reshape(L, *tails.shape[2:]))
