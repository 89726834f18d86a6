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
    VocoderStreamState, upconv_forward, stream_decode_step_batched,
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
    """Decode+vocode `block` frames in one program.

    Returns (state, vstate, next_frame, emitted, packed) where packed is
    (block, B, chunk_samples + tail_samples + 1) float32:
    [middle | tail | eos_flag] per step — ONE host fetch per block.
    """
    vo_dtype = vstate.istft_cache.dtype

    def step(carry, t):
        state, vstate, frame, emitted = carry
        is_eos = jnp.all(frame == 0, axis=-1)                     # (B,)

        # vocode current frame (batched-style emission: middle+tail)
        codes = frame[:, :, None].transpose(1, 0, 2)              # (nq, B, 1)
        feats = rvq_decode(codec_params["rvq"], codec_cfg.rvq, codes)
        up = upconv_forward(codec_params["upsample"], codec_cfg.upsample_stride,
                            feats.astype(vo_dtype))
        middle, tail, vstate = stream_decode_step_batched(
            codec_params["acoustic_decoder"], codec_cfg.acoustic_decoder,
            up, vstate, is_first=(emitted == 0))
        emitted = emitted + (~is_eos).astype(jnp.int32)

        # next LM frame
        tokens, mask = build_step_frame(llm_cfg, frame)
        valid = jnp.ones((frame.shape[0], 1), jnp.bool_)
        state, next_frame = lm_generate_frame(
            lm_params, llm_cfg, state, tokens, mask, valid,
            jax.random.fold_in(key, t_base + t),
            temperature, topk, depth_topk, depth_temperature)

        packed = jnp.concatenate(
            [middle.astype(jnp.float32), tail.astype(jnp.float32),
             is_eos.astype(jnp.float32)[:, None]], axis=-1)
        return (state, vstate, next_frame, emitted), packed

    (state, vstate, frame, emitted), packed = jax.lax.scan(
        step, (state, vstate, frame, emitted),
        jnp.arange(block, dtype=jnp.int32))
    return state, vstate, frame, emitted, packed
