"""Fused LM+vocoder streaming blocks: K frames per device dispatch.

Host-driven per-frame loops pay one device round trip per 80 ms frame —
fatal when the host↔TPU link has tens of ms of latency (remote tunnels),
and still wasteful on local hosts. This module scans K AR frames AND their
vocoder chunks inside ONE jitted program, returning a single packed array
(audio middles + closing tails + EOS flags), so the host pays one dispatch
and one fetch per K frames.

EOS semantics stay exact: the flags mark which input frames were EOS
(all-zero, reference fireredtts2.py:178); the host emits middles for live
steps only and closes the stream with the tail captured at the last live
step. Post-EOS steps inside a block compute garbage that is never emitted
(the stream ends there), so no masking machinery is needed for B=1 streams.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import LLMConfig, CodecConfig
from fireredtts2_tpu.models.lm.model import (
    LMState, lm_generate_frame, build_step_frame,
)
from fireredtts2_tpu.models.codec.rvq import rvq_decode
from fireredtts2_tpu.models.codec.decoder import (
    VocoderStreamState, upconv_forward, stream_decode_block_batched,
)

Params = dict[str, Any]


def stream_block(
    lm_params: Params,
    codec_params: Params,
    llm_cfg: LLMConfig,
    codec_cfg: CodecConfig,
    state: LMState,
    vstate: VocoderStreamState,
    frame: Array,            # (B, ncb) current sampled, un-vocoded frame
    emitted: Array,          # (B,) int32 chunks emitted so far (vocoder warmup)
    key: Array,
    t_base: Array,           # () int32 global frame index of `frame`
    block: int,              # STATIC frames per dispatch
    temperature: float | Array = 0.9,
    topk: int | Array = 20,
    depth_topk: int = 10,
    depth_temperature: float = 0.75,
):
    """Decode `block` frames with the LM, then vocode them ALL in one
    grouped pass (vocoder weights read once per block, not per frame —
    the per-frame vocoder pass was the 16-stream serving bottleneck,
    PERF.md round 2 part 2).

    Returns (state, vstate, next_frame, emitted, packed) where packed is
    (B, block*chunk + block*tail + block + block*ncb) float32 per stream:
    [middles 0..K-1 | cut-tails 0..K-1 | eos flags 0..K-1 |
     token frames 0..K-1] — ONE host fetch per block. tails[j] closes a
    stream whose last live frame is j; eos[j] marks input frame j as the
    all-zero EOS frame (fireredtts2.py:178); tokens[j] is the (ncb,) frame
    vocoded at step j (ids < 2051 are exact in float32 — the token region
    lets hosts collect the raw LM stream, e.g. the batched clone path's
    trim-then-vocode, runtime/batcher.py).
    """
    vo_dtype = vstate.istft_cache.dtype

    def lm_step(carry, t):
        state, frame = carry
        is_eos = jnp.all(frame == 0, axis=-1)                     # (B,)
        tokens, mask = build_step_frame(llm_cfg, frame)
        valid = jnp.ones((frame.shape[0], 1), jnp.bool_)
        state, next_frame = lm_generate_frame(
            lm_params, llm_cfg, state, tokens, mask, valid,
            jax.random.fold_in(key, t_base + t),
            temperature, topk, depth_topk, depth_temperature)
        return (state, next_frame), (frame, is_eos)

    (state, frame), (frames_seq, eos_seq) = jax.lax.scan(
        lm_step, (state, frame), jnp.arange(block, dtype=jnp.int32))

    # Grouped vocode: G tokens per backbone pass (weight reads / G). G is
    # capped by batch size — the backbone's (B, heads, S, T_max) attention
    # scores grow with S = 8G, and full-block grouping at B=16 measurably
    # REGRESSED from memory pressure (PERF.md round 2 part 2).
    B = frame.shape[0]
    G = max(1, min(block, 64 // max(B, 1)))
    while block % G:
        G -= 1
    n_groups = block // G
    codes = frames_seq.transpose(2, 1, 0)                         # (nq, B, K)
    feats = rvq_decode(codec_params["rvq"], codec_cfg.rvq, codes)
    up = upconv_forward(codec_params["upsample"], codec_cfg.upsample_stride,
                        feats.astype(vo_dtype))                   # (B, 4K, D)
    up_groups = up.reshape(B, n_groups, 4 * G, -1).transpose(1, 0, 2, 3)

    def vo_step(carry, xs):
        vstate, first = carry
        up_g = xs
        middle, tails, vstate = stream_decode_block_batched(
            codec_params["acoustic_decoder"], codec_cfg.acoustic_decoder,
            up_g, vstate, is_first=first)
        return (vstate, jnp.zeros_like(first)), (middle, tails)

    (vstate, _), (middles, tails) = jax.lax.scan(
        vo_step, (vstate, emitted == 0), up_groups)
    emitted = emitted + block

    # middles: (n_groups, B, G*cs) -> (B, K*cs); tails: (n_groups, G, B, ts)
    # -> (B, K*ts), cut order j = 0..K-1.
    middle = middles.transpose(1, 0, 2).reshape(B, -1)
    tails_flat = tails.transpose(2, 0, 1, 3).reshape(B, -1)
    tokens_flat = frames_seq.transpose(1, 0, 2).reshape(B, -1)  # (B, K*ncb)
    packed = jnp.concatenate(
        [middle.astype(jnp.float32), tails_flat.astype(jnp.float32),
         eos_seq.astype(jnp.float32).T, tokens_flat.astype(jnp.float32)],
        axis=-1)
    return state, vstate, frame, emitted, packed
