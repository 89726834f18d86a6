"""Decompose the batched serving block (models/pipeline.py:stream_block)
at production batch sizes: where do the ~ms of a K-frame block go?

ws_load on chip (2026-08-18) put the 16-stream per-block wall at ~310 ms
for K=4 — ~57 ms of that is the LM scan (devtime B=16), leaving ~5x the
analytic vocoder cost unexplained. This probe times, each as ONE scanned
device program of REPS blocks (tunnel RTT amortized away):

  full   — stream_block exactly as the batcher dispatches it
  lm     — the K-frame lm_generate_frame scan alone
  voc    — rvq_decode + upconv + grouped stream_decode_block_batched alone
  voc-sN — voc with the attention slab capped at N latents (T_max
           sensitivity: full-slab masked attention reads/writes scale
           with max_stream_latents, not with live context)
  lm-sN  — lm with max_seq_len capped at N (LM slab capacity
           sensitivity: xs/ys scan threading copies slab capacity)
  host   — stream_block host-dispatched per block with the packed fetch
           (np.asarray) each time, i.e. the batcher's real per-block wall
           including tunnel transfer

Usage: PYTHONPATH=/root/.axon_site:. python tools/block_probe.py [B ...]
         [-kK] [variants...]
       python tools/block_probe.py 16 -k4 full lm voc voc-s768 host
"""

from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

REPS = 25
HOST_REPS = 10


def build(latents_cap: int | None = None, seq_cap: int | None = None):
    from fireredtts2_tpu.config import LLMConfig, CodecConfig
    from fireredtts2_tpu.models.lm.model import init_lm_params
    from fireredtts2_tpu.models.lm.transformer import quantize_transformer_int8
    from fireredtts2_tpu.models.codec.model import init_codec_params
    from fireredtts2_tpu.ops.pallas_depth import enable_fused_depth

    llm_cfg = LLMConfig(
        backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
        text_vocab_size=152_000, audio_vocab_size=2051,
        audio_num_codebooks=16, max_seq_len=seq_cap or 3100,
        dtype="bfloat16",
        quantize_backbone=True, fused_depth_plan="gate=r8,up=s8,down=s8")
    codec_cfg = CodecConfig(dtype="bfloat16")
    if latents_cap is not None:
        codec_cfg = dataclasses.replace(
            codec_cfg, acoustic_decoder=dataclasses.replace(
                codec_cfg.acoustic_decoder, max_stream_latents=latents_cap))
    lm_params = init_lm_params(jax.random.PRNGKey(0), llm_cfg, jnp.bfloat16)
    lm_params = enable_fused_depth(lm_params, llm_cfg)
    lm_params["backbone"] = quantize_transformer_int8(lm_params["backbone"])
    codec_params = init_codec_params(jax.random.PRNGKey(1), codec_cfg,
                                     jnp.bfloat16)
    return llm_cfg, codec_cfg, lm_params, codec_params


def _time_scanned(fn, params, state_factory) -> float:
    """Compile, then min-of-2 timed runs; np.asarray forces the relay to
    finish (CLAUDE.md: scalar results return early through the tunnel).
    States are donated (the scan carries them; an undonated carry keeps a
    full copy of every KV slab alive — OOMs at B=16), so each call gets a
    fresh set from state_factory; creation cost stays outside the timer."""
    np.asarray(fn(*params, *state_factory(), jnp.int32(0)))
    walls = []
    for r in (1, 2):  # vary the seed per timed call (relay result cache)
        states = state_factory()
        t0 = time.perf_counter()
        np.asarray(fn(*params, *states, jnp.int32(r)))
        walls.append(time.perf_counter() - t0)
    return min(walls) * 1000.0 / REPS


def probe_full(B: int, K: int) -> float:
    from fireredtts2_tpu.models.pipeline import stream_block
    from fireredtts2_tpu.models.lm.model import init_lm_state
    from fireredtts2_tpu.models.codec.model import stream_decode_init

    llm_cfg, codec_cfg, lm_params, codec_params = build()
    block = partial(stream_block, llm_cfg=llm_cfg, codec_cfg=codec_cfg,
                    depth_topk=10, depth_temperature=0.75)

    def run(lp, cp, state, vstate, seed):
        frame = jnp.ones((B, llm_cfg.audio_num_codebooks), jnp.int32)
        emitted = jnp.zeros((B,), jnp.int32)

        def step(carry, i):
            state, vstate, frame, emitted = carry
            state, vstate, frame, emitted, packed = block(
                lp, cp, state=state, vstate=vstate, frame=frame,
                emitted=emitted, key=jax.random.fold_in(
                    jax.random.PRNGKey(7), seed * 1000 + i),
                t_base=i * K, block=K,
                temperature=jnp.full((B, 1), 0.9),
                topk=jnp.full((B,), 20, jnp.int32))
            return (state, vstate, frame, emitted), packed.sum()

        (_, _, frame, _), sums = jax.lax.scan(
            step, (state, vstate, frame, emitted),
            jnp.arange(REPS, dtype=jnp.int32))
        return sums

    fn = jax.jit(run, donate_argnums=(2, 3))
    return _time_scanned(
        fn, (lm_params, codec_params),
        lambda: (init_lm_state(llm_cfg, B, jnp.bfloat16),
                 stream_decode_init(codec_cfg, B, jnp.bfloat16)))


def probe_lm(B: int, K: int, seq_cap: int | None = None) -> float:
    from fireredtts2_tpu.models.lm.model import (
        init_lm_state, lm_generate_frame, build_step_frame)

    llm_cfg, _, lm_params, _ = build(seq_cap=seq_cap)

    def run(lp, state, seed):
        frame = jnp.ones((B, llm_cfg.audio_num_codebooks), jnp.int32)

        def step(carry, t):
            state, frame = carry
            tokens, mask = build_step_frame(llm_cfg, frame)
            valid = jnp.ones((B, 1), jnp.bool_)
            state, frame = lm_generate_frame(
                lp, llm_cfg, state, tokens, mask, valid,
                jax.random.fold_in(jax.random.PRNGKey(7), seed * 100_000 + t),
                jnp.full((B, 1), 0.9), jnp.full((B,), 20, jnp.int32),
                10, 0.75)
            return (state, frame), frame.sum()

        (_, _), sums = jax.lax.scan(
            step, (state, frame), jnp.arange(REPS * K, dtype=jnp.int32))
        return sums

    fn = jax.jit(run, donate_argnums=(1,))
    return _time_scanned(fn, (lm_params,),
                         lambda: (init_lm_state(llm_cfg, B, jnp.bfloat16),))


def probe_voc(B: int, K: int, latents_cap: int | None = None) -> float:
    from fireredtts2_tpu.models.codec.model import stream_decode_init
    from fireredtts2_tpu.models.codec.rvq import rvq_decode
    from fireredtts2_tpu.models.codec.decoder import (
        upconv_forward, stream_decode_block_batched)

    llm_cfg, codec_cfg, _, codec_params = build(latents_cap)
    nq = llm_cfg.audio_num_codebooks

    def run(cp, vstate, seed):
        codes = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(11), seed),
            (REPS, nq, B, K), 0, 256)

        def step(carry, codes_i):
            vstate = carry
            feats = rvq_decode(cp["rvq"], codec_cfg.rvq, codes_i)
            up = upconv_forward(cp["upsample"], codec_cfg.upsample_stride,
                                feats.astype(jnp.bfloat16))
            middle, tails, vstate = stream_decode_block_batched(
                cp["acoustic_decoder"], codec_cfg.acoustic_decoder,
                up, vstate, is_first=jnp.zeros((B,), bool))
            return vstate, middle.sum() + tails.sum()

        _, sums = jax.lax.scan(step, vstate, codes)
        return sums

    fn = jax.jit(run, donate_argnums=(1,))
    return _time_scanned(
        fn, (codec_params,),
        lambda: (stream_decode_init(codec_cfg, B, jnp.bfloat16),))


def probe_host(B: int, K: int) -> float:
    """The batcher's actual pattern: one jitted stream_block per block,
    donated states, np.asarray fetch of the packed output every block —
    includes tunnel RTT + packed transfer (NOT double-buffered, so this
    is the upper bound the batcher's overlap hides)."""
    from fireredtts2_tpu.models.pipeline import stream_block
    from fireredtts2_tpu.models.lm.model import init_lm_state
    from fireredtts2_tpu.models.codec.model import stream_decode_init

    llm_cfg, codec_cfg, lm_params, codec_params = build()
    blk = jax.jit(
        partial(stream_block, llm_cfg=llm_cfg, codec_cfg=codec_cfg,
                depth_topk=10, depth_temperature=0.75),
        static_argnames=("block",), donate_argnames=("state", "vstate"))

    state = init_lm_state(llm_cfg, B, jnp.bfloat16)
    vstate = stream_decode_init(codec_cfg, B, jnp.bfloat16)
    frame = jnp.ones((B, llm_cfg.audio_num_codebooks), jnp.int32)
    emitted = jnp.zeros((B,), jnp.int32)

    def one(i):
        nonlocal state, vstate, frame, emitted
        state, vstate, frame, emitted, packed = blk(
            lm_params, codec_params, state=state, vstate=vstate, frame=frame,
            emitted=emitted, key=jax.random.fold_in(jax.random.PRNGKey(3), i),
            t_base=jnp.int32(i * K), block=K,
            temperature=jnp.full((B, 1), 0.9),
            topk=jnp.full((B,), 20, jnp.int32))
        return np.asarray(packed)

    one(0)  # compile
    t0 = time.perf_counter()
    for i in range(1, HOST_REPS + 1):
        one(i)
    return (time.perf_counter() - t0) * 1000.0 / HOST_REPS


def main() -> None:
    args = sys.argv[1:]
    K = 4
    batches, variants = [], []
    for a in args:
        if a.startswith("-k"):
            K = int(a[2:])
        elif a.isdigit():
            batches.append(int(a))
        else:
            variants.append(a)
    batches = batches or [16]
    variants = variants or ["full", "lm", "voc", "voc-s768", "host"]
    print(f"backend={jax.default_backend()} K={K}", flush=True)
    for B in batches:
        for v in variants:
            if v == "full":
                ms = probe_full(B, K)
            elif v == "lm":
                ms = probe_lm(B, K)
            elif v.startswith("lm-s"):
                ms = probe_lm(B, K, seq_cap=int(v[4:]))
            elif v == "voc":
                ms = probe_voc(B, K)
            elif v.startswith("voc-s"):
                ms = probe_voc(B, K, latents_cap=int(v[5:]))
            elif v == "host":
                ms = probe_host(B, K)
            else:
                raise SystemExit(f"unknown variant {v}")
            print(f"B={B:2d} K={K} {v:9s} {ms:8.2f} ms/block "
                  f"({ms / K:6.2f} ms/frame-step)", flush=True)


if __name__ == "__main__":
    main()
