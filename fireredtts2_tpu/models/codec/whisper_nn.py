"""Whisper-style transformer encoder blocks in JAX.

Capability parity with the reference's re-implemented Whisper encoder
(fireredtts2/codec/whisper.py:23-272): pre-LN MHA (k has no bias; q, v,
out do), GELU FFN, sinusoidal positions, conv frontend that halves the
frame rate (100 Hz mel -> 50 Hz).

TPU-first design: layer params are stacked on a leading L axis and the
layer loop is a lax.scan; the streaming (vocoder) variant uses a
fixed-size KV slab written at a position counter instead of the
reference's unbounded torch.cat cache (whisper.py:100-104).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.ops.attention import (
    mha_attention, gqa_attention_bounded,
)
from fireredtts2_tpu.ops.pallas_flash import (
    flash_decode_bounded, flash_decode_update_bounded, flash_enabled,
    flash_supported,
)
from fireredtts2_tpu.ops.remat import remat_layer

Params = dict[str, Any]


def layer_norm(x: Array, w: Array, b: Array, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def sinusoids(length: int, channels: int, max_timescale: float = 10_000.0) -> np.ndarray:
    """Whisper sinusoidal position table (whisper.py:11-20)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_whisper_layers(key: Array, num_layers: int, dim: int, ffn_dim: int,
                        dtype=jnp.float32) -> Params:
    """Stacked (L, ...) params for a pre-LN whisper encoder layer stack."""
    ks = jax.random.split(key, 6)

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    L, D, F = num_layers, dim, ffn_dim
    return {
        "wq": w(ks[0], L, D, D), "bq": jnp.zeros((L, D), dtype),
        "wk": w(ks[1], L, D, D),
        "wv": w(ks[2], L, D, D), "bv": jnp.zeros((L, D), dtype),
        "wo": w(ks[3], L, D, D), "bo": jnp.zeros((L, D), dtype),
        "attn_ln_w": jnp.ones((L, D), dtype), "attn_ln_b": jnp.zeros((L, D), dtype),
        "fc1_w": w(ks[4], L, D, F), "fc1_b": jnp.zeros((L, F), dtype),
        "fc2_w": w(ks[5], L, F, D), "fc2_b": jnp.zeros((L, D), dtype),
        "ffn_ln_w": jnp.ones((L, D), dtype), "ffn_ln_b": jnp.zeros((L, D), dtype),
    }


_WHISPER_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")


def quantize_whisper_layers_int8(params: Params) -> Params:
    """Weight-only int8 (per-output-channel symmetric) for a stacked
    whisper layer tree. Used on the VOCODER backbone: its 12-layer
    transformer weights are re-read every streaming chunk (the second HBM
    cost after the LM, PERF.md); int8 halves that. Norms/biases stay."""
    out: Params = {}
    for k, v in params.items():
        if k in _WHISPER_MATMUL_KEYS:
            w = v.astype(jnp.float32)
            scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0, 1e-8)
            out[k] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out[k + "_scale"] = scale  # (L, 1, out) fp32
        else:
            out[k] = v
    return out


def _wmm(x: Array, lp: Params, name: str) -> Array:
    """x @ W with transparent weight-only int8 (dequant fuses into the
    dot under XLA — same recipe as models/lm/transformer._mm)."""
    w = lp[name]
    if w.dtype == jnp.int8:
        y = jnp.dot(x, w.astype(x.dtype), precision=None)
        return y * lp[name + "_scale"][0].astype(y.dtype)
    return x @ w


def _whisper_layer(h: Array, lp: Params, num_heads: int, mask: Optional[Array],
                   k_slab: Optional[Array], v_slab: Optional[Array],
                   cache_pos: Optional[Array],
                   q_end: Optional[Array] = None,
                   live_hi: Optional[Array] = None):
    B, S, D = h.shape
    Dh = D // num_heads

    x = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"])
    q = (_wmm(x, lp, "wq") + lp["bq"]).reshape(B, S, num_heads, Dh)
    k = _wmm(x, lp, "wk").reshape(B, S, num_heads, Dh)
    v = (_wmm(x, lp, "wv") + lp["bv"]).reshape(B, S, num_heads, Dh)

    if k_slab is not None:
        # MERGED slab layout (B, T, H*Dh): with Dh = 64 < the 128-lane
        # tile, a (B, T, H, Dh) slab gets 2x tile padding from XLA
        # (measured: the 1.10 GB vocoder slab occupies 2.20 GB HBM at
        # B=16) — merging the head dims tiles cleanly, halving slab HBM
        # and every slab read/write.
        merged = k_slab.ndim == 3
        kw = k.reshape(B, S, D) if merged else k
        vw = v.reshape(B, S, D) if merged else v
        # scalar cache_pos = shared slot; (B,) = per-stream slots
        if getattr(cache_pos, "ndim", 0) == 1:
            zeros = (0,) if merged else (0, 0)
            upd = jax.vmap(
                lambda slab_b, x_b, p: jax.lax.dynamic_update_slice(
                    slab_b, x_b, (p, *zeros)))
            k_slab = upd(k_slab, kw.astype(k_slab.dtype), cache_pos)
            v_slab = upd(v_slab, vw.astype(v_slab.dtype), cache_pos)
        else:
            zeros = (0, 0) if merged else (0, 0, 0)
            k_slab = jax.lax.dynamic_update_slice(
                k_slab, kw.astype(k_slab.dtype), (0, cache_pos, *zeros[1:]))
            v_slab = jax.lax.dynamic_update_slice(
                v_slab, vw.astype(v_slab.dtype), (0, cache_pos, *zeros[1:]))
        if q_end is not None:
            # Bounded slab attention (cost scales with live chunks, not
            # capacity). Production slab decode routes through the CARRY
            # scan + _whisper_layer_slab4 instead; this branch only backs
            # shared-position callers.
            attn = gqa_attention_bounded(q, k_slab.astype(h.dtype),
                                         v_slab.astype(h.dtype),
                                         q_end, live_hi)
        else:
            kf, vf = k_slab.astype(h.dtype), v_slab.astype(h.dtype)
            if merged:
                T = kf.shape[1]
                kf = kf.reshape(B, T, num_heads, Dh)
                vf = vf.reshape(B, T, num_heads, Dh)
            attn = mha_attention(q, kf, vf, mask)
    else:
        attn = mha_attention(q, k, v, mask)
    h = h + (_wmm(attn.reshape(B, S, D), lp, "wo") + lp["bo"]).astype(h.dtype)

    x = layer_norm(h, lp["ffn_ln_w"], lp["ffn_ln_b"])
    x = jax.nn.gelu(_wmm(x, lp, "fc1_w") + lp["fc1_b"], approximate=False)
    h = h + (_wmm(x, lp, "fc2_w") + lp["fc2_b"]).astype(h.dtype)
    return h, k_slab, v_slab


def _whisper_layer_slab4(h: Array, lp: Params, layer: Array, num_heads: int,
                         k4: Array, v4: Array, pos: Array,
                         q_end: Array, live_hi: Array
                         ) -> tuple[Array, Array, Array]:
    """Slab-decode layer over CARRIED (L, B, T, H*Dh) slabs.

    The xs/ys slab threading of the generic path copies the full slab
    capacity through the scan every block (scan ys are fresh stacked
    buffers — measured ~14 ms/block of pure T=3008 capacity cost at B=16,
    tools/block_probe.py). Here the slabs are the scan CARRY and this
    chunk's K/V rows are written in place: by the fused Pallas kernel
    (TPU serving default) or an XLA scatter + per-layer slice on the
    fallback path."""
    B, S, D = h.shape
    Dh = D // num_heads

    x = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"])
    q = (_wmm(x, lp, "wq") + lp["bq"]).reshape(B, S, num_heads, Dh)
    kw = _wmm(x, lp, "wk")
    vw = _wmm(x, lp, "wv") + lp["bv"]

    from fireredtts2_tpu.parallel.mesh import serving_mesh
    mesh = serving_mesh()
    took_flash = False
    if flash_enabled():
        if mesh is None:
            if flash_supported(q, k4):
                attn, k4, v4 = flash_decode_update_bounded(
                    q, kw, vw, k4, v4, layer, pos, q_end, live_hi)
                took_flash = True
        else:
            # Mesh serving: the write kernel MUST go through shard_map
            # (GSPMD cannot partition a raw pallas_call) — the vocoder
            # slab is column-sharded over tp so each shard writes only
            # its own heads' columns (VERDICT r4 #4; r3's pin-off is
            # gone). A mesh the kernel can't split falls through to the
            # XLA path below, which shards cleanly under GSPMD.
            from fireredtts2_tpu.ops.pallas_flash import (
                _interpret, flash_voc_tp_ok, flash_decode_update_bounded_shard,
            )
            interp = _interpret(False)
            if flash_voc_tp_ok(mesh, q, k4, interpret=interp):
                attn, k4, v4 = flash_decode_update_bounded_shard(
                    mesh, q, kw, vw, k4, v4, layer, pos, q_end, live_hi,
                    interpret=interp)
                took_flash = True
    if not took_flash:
        rows = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        k4 = k4.at[layer, bidx, rows, :].set(kw.astype(k4.dtype))
        v4 = v4.at[layer, bidx, rows, :].set(vw.astype(v4.dtype))
        kl = jax.lax.dynamic_slice(
            k4, (layer, 0, 0, 0), (1, *k4.shape[1:]))[0]
        vl = jax.lax.dynamic_slice(
            v4, (layer, 0, 0, 0), (1, *v4.shape[1:]))[0]
        attn = gqa_attention_bounded(q, kl.astype(h.dtype),
                                     vl.astype(h.dtype), q_end, live_hi)

    h = h + (_wmm(attn.reshape(B, S, D), lp, "wo") + lp["bo"]).astype(h.dtype)
    x = layer_norm(h, lp["ffn_ln_w"], lp["ffn_ln_b"])
    x = jax.nn.gelu(_wmm(x, lp, "fc1_w") + lp["fc1_b"], approximate=False)
    h = h + (_wmm(x, lp, "fc2_w") + lp["fc2_b"]).astype(h.dtype)
    return h, k4, v4


def whisper_layers_forward(
    params: Params, num_heads: int, h: Array,
    mask: Optional[Array] = None,
    cache: Optional[dict[str, Array]] = None,
    cache_pos: Optional[Array] = None,
    remat: Optional[str] = None,
    q_end: Optional[Array] = None,
    live_hi: Optional[Array] = None,
) -> tuple[Array, Optional[dict[str, Array]]]:
    """Run the stacked layer scan. cache (if given): k/v slabs of shape
    (L, B, T_max, H, Dh) written at cache_pos. remat ("full"/"dots",
    ops/remat.py) applies per-layer jax.checkpoint on the STATELESS path —
    codec training windows are long (30 s = 1500 mel frames), so saved
    layer activations dominate training HBM; values are unchanged.

    q_end (B, S) int32 + live_hi () int32 (slab path only): per-query
    exclusive attention bounds + the max live slot — selects the bounded
    decode attention whose cost scales with live context instead of slab
    capacity (every query must attend >= 1 slot of the slab's first chunk,
    i.e. q_end > 0; block-causal decode masks always satisfy this)."""
    if cache is not None and q_end is not None:
        # Slab-decode fast path: slabs as scan CARRY (in-place writes;
        # see _whisper_layer_slab4). Requires per-stream (B,) positions —
        # every streaming-vocoder call site passes state.pos.
        assert getattr(cache_pos, "ndim", 0) == 1, "slab decode needs (B,) pos"
        L = params["wq"].shape[0]

        def body4(carry, xs):
            hh, k4, v4 = carry
            lp, lyr = xs
            hh, k4, v4 = _whisper_layer_slab4(hh, lp, lyr, num_heads,
                                              k4, v4, cache_pos,
                                              q_end, live_hi)
            return (hh, k4, v4), None

        (h, nk, nv), _ = jax.lax.scan(
            body4, (h, cache["k"], cache["v"]),
            (params, jnp.arange(L, dtype=jnp.int32)))
        return h, {"k": nk, "v": nv}
    if cache is not None:
        def body(hh, xs):
            lp, ks, vs = xs
            hh, ks, vs = _whisper_layer(hh, lp, num_heads, mask, ks, vs,
                                        cache_pos, q_end, live_hi)
            return hh, (ks, vs)
        h, (nk, nv) = jax.lax.scan(body, h, (params, cache["k"], cache["v"]))
        return h, {"k": nk, "v": nv}
    else:
        def body(hh, lp):
            hh, _, _ = _whisper_layer(hh, lp, num_heads, mask, None, None, None)
            return hh, None
        if remat:
            body = remat_layer(body, remat)
        h, _ = jax.lax.scan(body, h, params)
        return h, None


def init_kv_slab(num_layers: int, batch: int, max_len: int, num_heads: int,
                 head_dim: int, dtype=jnp.float32,
                 merged: bool = False) -> dict[str, Array]:
    """merged=True stores (L, B, T, H*Dh) — the tile-padding-free layout
    when head_dim < 128 lanes (a (..., H, 64) slab occupies 2x its real
    bytes under XLA's (8, 128) tiling); _whisper_layer handles both."""
    shape = ((num_layers, batch, max_len, num_heads * head_dim) if merged
             else (num_layers, batch, max_len, num_heads, head_dim))
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


# ---------------------------------------------------------------------------
# Full whisper encoder (conv frontend + positions + layers + final LN)
# ---------------------------------------------------------------------------


def init_conv1d(key: Array, in_ch: int, out_ch: int, k: int, dtype=jnp.float32,
                bias: bool = True) -> Params:
    w = (jax.random.normal(key, (out_ch, in_ch, k), jnp.float32) * 0.02).astype(dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def conv1d(x: Array, p: Params, stride: int = 1, padding: int = 0) -> Array:
    """x: (B, C, T) -> (B, C', T'). Torch-layout weights (out, in, k)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)[None, :, None]
    return y


def init_whisper_encoder(key: Array, in_dim: int, embed_dim: int,
                         num_layers: int, num_heads: int, ffn_dim: int,
                         max_positions: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "conv1": init_conv1d(ks[0], in_dim, embed_dim, 3, dtype),
        "conv2": init_conv1d(ks[1], embed_dim, embed_dim, 3, dtype),
        "pos": jnp.asarray(sinusoids(max_positions, embed_dim)).astype(dtype),
        "layers": init_whisper_layers(ks[2], num_layers, embed_dim, ffn_dim, dtype),
        "ln_w": jnp.ones((embed_dim,), dtype),
        "ln_b": jnp.zeros((embed_dim,), dtype),
    }


def whisper_encoder_forward(params: Params, num_heads: int, mel: Array,
                            mel_lengths: Array, apply_position: bool = True,
                            remat: Optional[str] = None
                            ) -> tuple[Array, Array]:
    """mel: (B, T, n_mels) -> (B, T//2, D), lengths halved.

    Mirrors reference WhisperEncoder.forward (whisper.py:234-261): two convs
    (k3 p1; k3 s2 p1) with GELU, sinusoid positions, non-pad attention mask.
    """
    x = mel.transpose(0, 2, 1)                       # (B, n_mels, T)
    x = jax.nn.gelu(conv1d(x, params["conv1"], 1, 1), approximate=False)
    x = jax.nn.gelu(conv1d(x, params["conv2"], 2, 1), approximate=False)
    x = x.transpose(0, 2, 1)                         # (B, T', D)
    lengths = mel_lengths // 2
    if apply_position:
        x = x + params["pos"][None, :x.shape[1], :].astype(x.dtype)
    T = x.shape[1]
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    mask = valid[:, None, :] & jnp.ones((1, T, 1), bool)  # (B, T, T) keys masked
    h, _ = whisper_layers_forward(params["layers"], num_heads, x, mask,
                                  remat=remat)
    h = layer_norm(h, params["ln_w"], params["ln_b"])
    return h, lengths
