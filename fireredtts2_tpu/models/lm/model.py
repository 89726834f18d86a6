"""Dual-transformer text-speech LM (backbone + depth decoder).

Capability parity with the reference `Model` (fireredtts2/llm/llm.py:86-350):
- interleaved frames of audio_num_codebooks audio columns + 1 text column;
  frame embedding = masked sum of per-column embeddings (llm.py:297-299);
- backbone predicts codebook-0 from the frame stream; a small depth
  transformer predicts codebooks 1..N-1 within each frame (llm.py:274-330);
- codebook-0 sampled with caller temperature/topk, codebooks 1..N-1 with
  fixed topk=10 / temperature=0.75 (llm.py:306,324);
- training loss = 2*((1-w)*c0 + w*depth) + 0.01*text, depth loss amortized
  on a random 1/8 subset of audio positions (llm.py:225-272).

TPU-first differences (design, not behavior):
- one jitted `lm_generate_frame` covers prefill (S=prompt bucket) and decode
  (S=1); KV lives in a static slab; the 15-step depth loop is a
  `lax.fori_loop` inside the same jit, so a whole 80 ms frame is ONE device
  dispatch;
- batches are left-padded / right-aligned; a `slot_valid` bitmap masks
  padded KV slots. RoPE attention is relative, so left-padding preserves
  the reference's exact attention pattern while allowing bucketed batching;
- the depth decoder's per-frame cache reset (llm.py:317) is free here: its
  cache is a fresh 16-slot scratch allocated inside the step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.ops import masks as mask_ops
from fireredtts2_tpu.ops.sampling import sample_topk
from fireredtts2_tpu.models.lm.transformer import (
    init_transformer_params, init_kv_cache, transformer_forward,
)

Params = dict[str, Any]


class LMState(NamedTuple):
    """Mutable decode state threaded through jitted steps."""
    cache_k: Array        # (L, B, T_max, Hkv*Dh) merged slab
    cache_v: Array
    slot_valid: Array     # (B, T_max) bool — which KV slots hold real tokens
    pos: Array            # (B,) int32 — next slab slot to write, per stream


def init_lm_params(key: Array, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    bb, dec = cfg.backbone, cfg.decoder
    ks = jax.random.split(key, 8)

    def emb(k, n, d):
        return (jax.random.normal(k, (n, d), jnp.float32) * 0.02).astype(dtype)

    def lin(k, i, o):
        bound = 1.0 / jnp.sqrt(i)
        return (jax.random.uniform(k, (i, o), jnp.float32, -bound, bound)).astype(dtype)

    return {
        "backbone": init_transformer_params(ks[0], bb, dtype),
        "decoder": init_transformer_params(ks[1], dec, dtype),
        "text_embeddings": emb(ks[2], cfg.text_vocab_size, bb.embed_dim),
        "audio_embeddings": emb(
            ks[3], cfg.audio_vocab_size * cfg.audio_num_codebooks, bb.embed_dim),
        "projection": lin(ks[4], bb.embed_dim, dec.embed_dim),
        "codebook0_head": lin(ks[5], bb.embed_dim, cfg.audio_vocab_size),
        "text_head": lin(ks[6], bb.embed_dim, cfg.text_vocab_size),
        "audio_head": lin(
            ks[7], dec.embed_dim,
            (cfg.audio_num_codebooks - 1) * cfg.audio_vocab_size,
        ).reshape(dec.embed_dim, cfg.audio_num_codebooks - 1, cfg.audio_vocab_size)
         .transpose(1, 0, 2),   # (ncb-1, D_dec, V_audio)
        **({"depth_draft": init_draft_head(jax.random.fold_in(key, 99),
                                           cfg, dtype)}
           if cfg.depth_draft_head else {}),
    }


def init_draft_head(key: Array, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    """MTP-style draft head for speculative depth decode (PAPERS.md, arXiv
    2410.13839): one trunk from [last_h, embed(c0)] plus per-position
    offsets, decoded through the EXISTING audio_head stack — ~3M params,
    read once per frame. Grafts onto a loaded checkpoint for finetuning
    (train with cfg.depth_draft_head=True; lm_loss adds the aux CE)."""
    bb, dec = cfg.backbone, cfg.decoder
    k1, _ = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(2 * bb.embed_dim)
    return {
        "trunk": jax.random.uniform(k1, (2 * bb.embed_dim, dec.embed_dim),
                                    jnp.float32, -bound, bound).astype(dtype),
        "pos": jnp.zeros((cfg.audio_num_codebooks - 1, dec.embed_dim), dtype),
    }


def draft_depth_tokens(params: Params, cfg: LLMConfig, last_h: Array,
                       c0: Array) -> Array:
    """Greedy draft of codebooks 1..ncb-1 in ONE parallel shot (B, ncb-1):
    the Jacobi init when a trained depth_draft head is present."""
    dh = params["depth_draft"]
    e0 = embed_audio(params, cfg, 0, c0).astype(last_h.dtype)
    h = jnp.concatenate([last_h, e0], axis=-1) @ dh["trunk"]   # (B, D_dec)
    hp = h[:, None, :] + dh["pos"][None]                       # (B, ncb-1, D)
    logits = jnp.einsum("nsd,sdv->nsv", hp.astype(jnp.float32),
                        params["audio_head"].astype(jnp.float32))
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


KV_ALIGN = 512  # slab capacity alignment (= Pallas decode-kernel DMA tile)


def kv_capacity(max_seq_len: int) -> int:
    """Physical KV slab length: the logical cap rounded up to KV_ALIGN so
    the Pallas decode kernel gets whole DMA tiles (3100 -> 3584). The
    logical position cap (reference max_seq_len=3100, fireredtts2.py:58)
    is still enforced by the engine's frame budget."""
    return -(-max_seq_len // KV_ALIGN) * KV_ALIGN


def init_lm_state(cfg: LLMConfig, batch_size: int, dtype=jnp.float32,
                  capacity: Optional[int] = None) -> LMState:
    """capacity: optional logical position cap override (< cfg.max_seq_len)
    for decode-era capacity classes — a serving pool whose utterances are
    bounded (prompt bucket + frame cap) can run a much smaller slab than
    the 3100-position dialogue ceiling. Every decode program derives its
    window from the state SHAPE, so a smaller slab is just a smaller
    compiled program (and a cheaper dense-attention read)."""
    cap = kv_capacity(capacity or cfg.max_seq_len)
    cache = init_kv_cache(cfg.backbone, batch_size, cap, dtype)
    return LMState(
        cache_k=cache["k"], cache_v=cache["v"],
        slot_valid=jnp.zeros((batch_size, cap), jnp.bool_),
        pos=jnp.zeros((batch_size,), jnp.int32),
    )


def embed_audio(params: Params, cfg: LLMConfig, codebook, tokens: Array) -> Array:
    """Embedding of audio tokens for a given codebook index (int or traced),
    using the flat audio table with per-codebook offset (llm.py:336-337)."""
    idx = tokens + codebook * cfg.audio_vocab_size
    return params["audio_embeddings"][idx]


def embed_tokens(params: Params, cfg: LLMConfig, tokens: Array) -> Array:
    """(B, S, C+1) int tokens -> (B, S, C+1, D) per-column embeddings."""
    text = params["text_embeddings"][tokens[..., -1]][..., None, :]  # (B,S,1,D)
    offsets = jnp.arange(cfg.audio_num_codebooks, dtype=tokens.dtype) * cfg.audio_vocab_size
    audio = params["audio_embeddings"][tokens[..., :-1] + offsets]   # (B,S,C,D)
    return jnp.concatenate([audio, text], axis=-2)


def frame_hidden(params: Params, cfg: LLMConfig, tokens: Array,
                 tokens_mask: Array, dtype) -> Array:
    """Masked sum of per-column embeddings -> (B, S, D)."""
    embeds = embed_tokens(params, cfg, tokens)
    return (embeds * tokens_mask[..., None].astype(embeds.dtype)).sum(-2).astype(dtype)


def depth_decode_jacobi(params: Params, cfg: LLMConfig, last_h: Array,
                        c0: Array, key: Array, depth_topk: int,
                        depth_temperature: float,
                        init: Optional[Array] = None,
                        ) -> tuple[Array, Array]:
    """Speculative depth decode via Jacobi / lookahead iteration.

    Instead of 15 sequential single-token steps (llm.py:317-328), run the
    16-position depth transformer in parallel TEACHER-FORCING mode on a
    guessed token vector, re-sample every position with the SAME
    deterministic per-position noise the sequential path uses
    (fold_in(key, i)), and accept the longest prefix where the guess is
    self-consistent. Each round verifies at least one more token, so this
    terminates in <= ncb-1 rounds and returns exactly the tokens the
    sequential path samples — PROVIDED the parallel teacher-forcing
    forward rounds identically to the incremental S=1 forward. That holds
    at f32 / matching tiling (tests/test_speculative_depth.py); on-chip
    bf16 matmul tiling can flip near-tie top-k boundaries (same caveat as
    batched-vs-B=1, CLAUDE.md invariants), which is expected fp noise, not
    a regression. Acceptance only changes how many parallel rounds (i.e.
    how many HBM weight reads) it takes. Sequential decode is
    bandwidth-bound at small batch: a 16-position forward costs ~1 weight
    read, so frames that verify in r rounds read depth weights r times
    instead of 15.

    Returns (samples (B, ncb) int32, rounds () int32 — parallel forwards
    executed; 1 means the init guess was already the model's own chain).
    """
    dec_cfg = cfg.decoder
    ncb = cfg.audio_num_codebooks
    B = last_h.shape[0]
    dtype = last_h.dtype
    proj = params["projection"]
    heads = params["audio_head"]                       # (ncb-1, D_dec, V)
    offs = jnp.arange(ncb - 1, dtype=jnp.int32) * cfg.audio_vocab_size
    pos = jnp.broadcast_to(jnp.arange(ncb, dtype=jnp.int32)[None], (B, ncb))
    attn = jnp.broadcast_to(mask_ops.causal_mask(ncb)[None], (B, ncb, ncb))
    # Per-position sampling keys — identical to the sequential path's
    # fold_in(key, i) for codebook i.
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(1, ncb, dtype=jnp.int32))
    ipos = jnp.arange(1, ncb, dtype=jnp.int32)[None]   # (1, ncb-1)

    def forward(tok):
        """One parallel pass: sampled token for every position 1..ncb-1,
        each conditioned on the CURRENT guess of the positions before it
        (same input layout as the loss path, lm_loss above)."""
        c_emb = params["audio_embeddings"][tok[:, :ncb - 1] + offs].astype(dtype)
        dec_in = jnp.concatenate(
            [last_h[:, None, :], c_emb], axis=1) @ proj
        dec_h, _ = transformer_forward(params["decoder"], dec_cfg, dec_in,
                                       pos, attn)
        logits = jnp.einsum("nsd,sdv->nsv", dec_h[:, 1:, :].astype(jnp.float32),
                            heads.astype(jnp.float32))
        return jax.vmap(
            lambda lg, k: sample_topk(lg, depth_topk, depth_temperature, k),
            in_axes=(1, 0), out_axes=1)(logits, keys)  # (B, ncb-1)

    def cond(carry):
        _, p, r = carry
        return jnp.any(p < ncb - 1) & (r < ncb)

    def body(carry):
        tok, p, r = carry
        sampled = forward(tok)
        # Positions <= p are verified: their inputs are true, so `sampled`
        # reproduces them. The first position > p where the OLD guess
        # disagrees is corrected by this round's sample (its inputs were
        # all verified/matching) and becomes the new frontier.
        match = tok[:, 1:] == sampled                  # (B, ncb-1)
        blocked = (~match) & (ipos > p[:, None])
        has = blocked.any(axis=1)
        first = jnp.argmax(blocked, axis=1).astype(jnp.int32) + 1
        new_p = jnp.where(has, first, ncb - 1)
        tok = tok.at[:, 1:].set(
            jnp.where(ipos <= p[:, None], tok[:, 1:], sampled))
        return tok, jnp.maximum(p, new_p), r + 1

    tok0 = jnp.zeros((B, ncb), jnp.int32).at[:, 0].set(c0)
    if init is not None:
        tok0 = tok0.at[:, 1:].set(init)
    tok, _, rounds = jax.lax.while_loop(
        cond, body, (tok0, jnp.zeros((B,), jnp.int32), jnp.int32(0)))
    return tok, rounds


def _depth_decode(params: Params, cfg: LLMConfig, last_h: Array, c0: Array,
                  key: Array, depth_topk: int, depth_temperature: float,
                  spec_init: Optional[Array] = None) -> Array:
    """Sample codebooks 1..N-1 with the depth transformer (fresh 16-slot
    cache; reference resets it every frame, llm.py:317).

    When the params tree carries a prepared "depth_chain" bundle (see
    ops/pallas_depth.enable_fused_depth) the whole chain runs in ONE fused
    Pallas kernel with VMEM-resident weights — same key folding, same
    sampled tokens for the same key."""
    if cfg.fused_depth_plan and "depth_chain" in params:
        from fireredtts2_tpu.ops.pallas_depth import fused_depth_decode
        return fused_depth_decode(
            params["depth_chain"], cfg, last_h, c0, key,
            depth_topk=depth_topk, depth_temperature=depth_temperature,
            plan=cfg.fused_depth_plan)
    if cfg.speculative_depth:
        if "depth_draft" in params:
            # Trained MTP draft beats the previous-frame guess.
            spec_init = draft_depth_tokens(params, cfg, last_h, c0)
        samples, _ = depth_decode_jacobi(params, cfg, last_h, c0, key,
                                         depth_topk, depth_temperature,
                                         init=spec_init)
        return samples
    dec_cfg = cfg.decoder
    ncb = cfg.audio_num_codebooks
    B = last_h.shape[0]
    dtype = last_h.dtype

    proj = params["projection"]
    cache = init_kv_cache(dec_cfg, B, ncb, dtype)

    # Prefill slots 0..1: [backbone last_h, embed(c0)]
    e0 = embed_audio(params, cfg, 0, c0).astype(dtype)          # (B, D_b)
    h01 = jnp.stack([last_h, e0], axis=1) @ proj                # (B, 2, D_dec)
    pos01 = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32), (B, 2))
    m01 = mask_ops.decode_step_mask(pos01, ncb)
    hh, cache = transformer_forward(params["decoder"], dec_cfg, h01, pos01,
                                    m01, cache, jnp.int32(0), unroll=True)
    logits1 = (hh[:, -1].astype(jnp.float32)
               @ params["audio_head"][0].astype(jnp.float32))
    c1 = sample_topk(logits1, depth_topk, depth_temperature,
                     jax.random.fold_in(key, 1))

    samples = jnp.zeros((B, ncb), jnp.int32)
    samples = samples.at[:, 0].set(c0).at[:, 1].set(c1)

    # Fully unrolled depth loop (15 static iterations): each step is a
    # handful of tiny matvecs — sequential-dependency latency dominates, and
    # unrolling lets XLA fuse/schedule them back-to-back (~2x vs fori_loop
    # on real chips).
    cache_k, cache_v, prev = cache["k"], cache["v"], c1
    for i in range(2, ncb):
        emb = embed_audio(params, cfg, i - 1, prev).astype(dtype)  # (B, D_b)
        h = (emb @ proj)[:, None, :]                               # (B, 1, D_dec)
        pos = jnp.broadcast_to(jnp.int32(i), (B, 1))
        m = mask_ops.decode_step_mask(pos, ncb)
        hh, new_cache = transformer_forward(
            params["decoder"], dec_cfg, h, pos, m,
            {"k": cache_k, "v": cache_v}, jnp.int32(i), unroll=True)
        cache_k, cache_v = new_cache["k"], new_cache["v"]
        logits = hh[:, -1].astype(jnp.float32) @ params["audio_head"][i - 1].astype(jnp.float32)
        prev = sample_topk(logits, depth_topk, depth_temperature,
                           jax.random.fold_in(key, i))
        samples = samples.at[:, i].set(prev)
    return samples


def lm_generate_frame(
    params: Params,
    cfg: LLMConfig,
    state: LMState,
    tokens: Array,          # (B, S, C+1) int32
    tokens_mask: Array,     # (B, S, C+1) bool — which columns are real
    valid: Array,           # (B, S) bool — which sequence slots are real
    key: Array,
    temperature: float | Array = 0.9,
    topk: int | Array = 20,
    depth_topk: int = 10,
    depth_temperature: float = 0.75,
    real_len: Optional[Array] = None,
) -> tuple[LMState, Array]:
    """One AR step: consume a token window, sample the next frame.

    Covers prefill (S = prompt bucket, content RIGHT-ALIGNED / left-padded)
    and decode (S=1). Mirrors reference generate_frame semantics
    (fireredtts2/llm/llm.py:274-330) with bucketed batching.

    real_len: when given, the window is RIGHT-padded instead (content
    left-aligned, real_len (B,) real slots): the frame samples from slot
    real_len-1 and pos advances by real_len only — the next window then
    OVERWRITES the pad slots, keeping slab positions contiguous with no
    interior gaps. This is the append-prefill used by incremental dialogue
    (engine: KV persists across utterances instead of re-prefilling the
    whole conversation — greedy-exact vs the re-prefill path,
    tests/test_incremental_dialogue.py).

    Returns (new_state, sampled (B, ncb) int32).
    """
    bb_cfg = cfg.backbone
    B, S, _ = tokens.shape
    dtype = state.cache_k.dtype

    h = frame_hidden(params, cfg, tokens, tokens_mask, dtype)

    # Per-stream positions (continuous batching: streams may sit at
    # different depths of their KV slabs).
    positions_b = state.pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]

    # Mark this window's real slots, then build slab attention rows:
    # query at absolute position p attends slot j iff j <= p and slot is real.
    slot_valid = jax.vmap(
        lambda sv, v, p: jax.lax.dynamic_update_slice(sv, v, (p,))
    )(state.slot_valid, valid, state.pos)
    slab_len = state.cache_k.shape[2]
    attn = mask_ops.decode_step_mask(positions_b, slab_len)
    attn = attn & slot_valid[:, None, :]

    # Live window per stream: valid slots are contiguous (prefill content is
    # right-aligned in its bucket; every decode write is valid), so the live
    # region is [first-valid, pos+S). Feeds the Pallas decode kernel, which
    # streams only that window instead of the full slab.
    live_start = jnp.argmax(slot_valid, axis=1).astype(jnp.int32)
    live_end = state.pos + S

    cache = {"k": state.cache_k, "v": state.cache_v}
    h_out, cache = transformer_forward(
        params["backbone"], bb_cfg, h, positions_b, attn, cache, state.pos,
        live_window=(live_start, live_end))

    if real_len is None:
        last_h = h_out[:, -1, :]  # right-aligned content ⇒ newest real token
        last_tok = tokens[:, -1]
    else:
        idx = (real_len - 1).astype(jnp.int32)
        last_h = jnp.take_along_axis(h_out, idx[:, None, None], axis=1)[:, 0]
        last_tok = jnp.take_along_axis(tokens, idx[:, None, None], axis=1)[:, 0]
    c0_logits = (last_h.astype(jnp.float32)
                 @ params["codebook0_head"].astype(jnp.float32))
    key_c0, key_depth = jax.random.split(key)
    c0 = sample_topk(c0_logits, topk, temperature, key_c0)

    # Speculative init: the PREVIOUS frame's depth chain (this step's input
    # columns 1..ncb-1). RVQ codes are temporally correlated, so it's a
    # free draft — init only affects Jacobi round count, never the tokens.
    ncb = cfg.audio_num_codebooks
    spec_init = (jnp.clip(last_tok[:, 1:ncb], 0, cfg.audio_vocab_size - 1)
                 if cfg.speculative_depth else None)
    samples = _depth_decode(params, cfg, last_h, c0, key_depth,
                            depth_topk, depth_temperature,
                            spec_init=spec_init)

    new_state = LMState(
        cache_k=cache["k"], cache_v=cache["v"],
        slot_valid=slot_valid,
        pos=state.pos + (S if real_len is None
                         else real_len.astype(jnp.int32)),
    )
    return new_state, samples


def rewind_lm_state(state: LMState, pos: Array) -> LMState:
    """Roll every stream back to absolute position pos (B,): slots at and
    beyond pos are invalidated (their K/V stays — masking hides it until
    the next append window overwrites). Incremental dialogue uses this to
    replace decode-era KV with the re-encoded audio tokens of the finished
    utterance (engine._generate_dialogue_incremental)."""
    idx = jnp.arange(state.slot_valid.shape[1], dtype=jnp.int32)
    return LMState(
        cache_k=state.cache_k, cache_v=state.cache_v,
        slot_valid=state.slot_valid & (idx[None, :] < pos[:, None]),
        pos=pos.astype(jnp.int32),
    )


def reset_lm_slot(state: LMState, b: Array) -> LMState:
    """Free one stream slot (cache contents stay; masking hides them)."""
    return LMState(
        cache_k=state.cache_k, cache_v=state.cache_v,
        slot_valid=state.slot_valid.at[b].set(False),
        pos=state.pos.at[b].set(0),
    )


def reset_lm_slots(state: LMState, bs: Array) -> LMState:
    """Free a VECTOR of stream slots in one program: bs is (B,) int32,
    padded with out-of-range B for unused entries (dropped by the
    scatter). One fixed-shape dispatch per admission burst instead of one
    tunnel round trip per slot (measured 55 ms RTT each through the axon
    relay, runtime/batcher.py admission timeline)."""
    return LMState(
        cache_k=state.cache_k, cache_v=state.cache_v,
        slot_valid=state.slot_valid.at[bs].set(False, mode="drop"),
        pos=state.pos.at[bs].set(0, mode="drop"),
    )


def prefill_into_slot(params: Params, cfg: LLMConfig, state: LMState,
                      b: Array, tokens: Array, tokens_mask: Array,
                      valid: Array, key: Array,
                      temperature=0.9, topk: int | Array = 20,
                      depth_topk: int = 10, depth_temperature: float = 0.75,
                      ) -> tuple[LMState, Array]:
    """Prefill ONE stream's prompt into slot `b` of a batched decode state
    (continuous batching: admit a request while other slots keep decoding).

    tokens/tokens_mask/valid are (1, S, C+1)/(1, S) right-aligned buckets.
    Returns (updated batched state, first sampled frame (1, ncb)).
    """
    small = init_lm_state(cfg, 1, state.cache_k.dtype,
                          capacity=state.cache_k.shape[2])
    small, frame = lm_generate_frame(
        params, cfg, small, tokens, tokens_mask, valid, key,
        temperature, topk, depth_topk, depth_temperature)
    new_state = LMState(
        cache_k=jax.lax.dynamic_update_slice(
            state.cache_k, small.cache_k, (0, b, 0, 0)),
        cache_v=jax.lax.dynamic_update_slice(
            state.cache_v, small.cache_v, (0, b, 0, 0)),
        slot_valid=jax.lax.dynamic_update_slice(
            state.slot_valid, small.slot_valid, (b, 0)),
        pos=jax.lax.dynamic_update_slice(state.pos, small.pos, (b,)),
    )
    return new_state, frame


def prefill_into_slots(params: Params, cfg: LLMConfig, state: LMState,
                       bs: Array, tokens: Array, tokens_mask: Array,
                       valid: Array, key: Array,
                       temperature=0.9, topk: int | Array = 20,
                       depth_topk: int = 10, depth_temperature: float = 0.75,
                       ) -> tuple[LMState, Array]:
    """Prefill SEVERAL prompts into slots `bs` of a batched decode state in
    ONE device program (burst admission: N arrivals cost one dispatch, not
    N — the reference has no batched path at all, fireredtts2.py:43).

    bs: (N,) int32 slot indices (distinct; entries >= B are DROPPED — used
    to pad N to a bucketed size without touching any slot). tokens /
    tokens_mask: (N, S, C+1) right-aligned buckets; valid: (N, S).
    temperature/topk may be (N,)/(N,1) per-request vectors.
    Returns (updated batched state, frames (N, ncb)).
    """
    N = tokens.shape[0]
    # capacity follows the TARGET state's slab (capacity-classed pools run
    # slabs smaller than cfg.max_seq_len — runtime/batcher.py)
    small = init_lm_state(cfg, N, state.cache_k.dtype,
                          capacity=state.cache_k.shape[2])
    small, frames = lm_generate_frame(
        params, cfg, small, tokens, tokens_mask, valid, key,
        temperature, topk, depth_topk, depth_temperature)
    # scatter the N fresh rows into the big state's slots
    new_state = LMState(
        cache_k=state.cache_k.at[:, bs].set(small.cache_k, mode="drop"),
        cache_v=state.cache_v.at[:, bs].set(small.cache_v, mode="drop"),
        slot_valid=state.slot_valid.at[bs].set(small.slot_valid, mode="drop"),
        pos=state.pos.at[bs].set(small.pos, mode="drop"),
    )
    return new_state, frames


def prefill_into_slot_prefix(params: Params, cfg: LLMConfig, state: LMState,
                             b: Array, pk: Array, pv: Array, plen: Array,
                             tokens: Array, tokens_mask: Array, valid: Array,
                             real_len: Array, key: Array,
                             temperature=0.9, topk: int | Array = 20,
                             depth_topk: int = 10,
                             depth_temperature: float = 0.75,
                             ) -> tuple[LMState, Array]:
    """Admit one stream into slot `b` FROM A CACHED KV PREFIX: the slot
    starts with the voice/context prefix rows already in place and only
    the new text window is prefilled (append mode) — the batched analogue
    of the engine's per-voice KV prefix cache (engine._context_state,
    VERDICT r3 #3 "a slot starts from the cached slab").

    pk/pv: (Lyr, 1, P, W) prefix slab rows (P = 128-aligned crop of the
    cached full-capacity state; static per compiled program). plen: (1,)
    true prefix length (rows [plen, P) are pad — marked invalid).
    tokens/tokens_mask/valid: (1, S, C+1)/(1, S) RIGHT-padded text window
    (content left-aligned); real_len: (1,) its true length. The window
    lands at absolute positions [plen, plen+real_len) — contiguous with
    the prefix, exact under RoPE shift invariance (the incremental-
    dialogue equivalence class, CLAUDE.md).

    Returns (updated batched state, first sampled frame (1, ncb)).
    """
    cap = state.cache_k.shape[2]
    P = pk.shape[2]
    dtype = state.cache_k.dtype
    small = init_lm_state(cfg, 1, dtype, capacity=cap)
    rows = jnp.arange(cap, dtype=jnp.int32)[None, :]
    small = LMState(
        cache_k=jax.lax.dynamic_update_slice(
            small.cache_k, pk.astype(dtype), (0, 0, 0, 0)),
        cache_v=jax.lax.dynamic_update_slice(
            small.cache_v, pv.astype(dtype), (0, 0, 0, 0)),
        slot_valid=rows < plen[:, None],
        pos=plen.astype(jnp.int32),
    )
    small, frame = lm_generate_frame(
        params, cfg, small, tokens, tokens_mask, valid, key,
        temperature, topk, depth_topk, depth_temperature, real_len=real_len)
    new_state = LMState(
        cache_k=jax.lax.dynamic_update_slice(
            state.cache_k, small.cache_k, (0, b, 0, 0)),
        cache_v=jax.lax.dynamic_update_slice(
            state.cache_v, small.cache_v, (0, b, 0, 0)),
        slot_valid=jax.lax.dynamic_update_slice(
            state.slot_valid, small.slot_valid, (b, 0)),
        pos=jax.lax.dynamic_update_slice(state.pos, small.pos, (b,)),
    )
    return new_state, frame


def slot_kv_prefix(state: LMState, b: Array, P: int) -> tuple[Array, Array]:
    """Extract slot b's first P KV rows as a (pk, pv) prefix pair —
    (Lyr, 1, P, W) each, the prefill_into_slot_prefix input format.

    Batched incremental dialogue (runtime/batcher.py:run_dialogue) calls
    this when an utterance finishes: rows [0, plen+L) hold the context +
    window tokens at contiguous absolute positions (decode-era rows sit
    BEYOND base_len and are excluded — the next window re-appends the
    utterance as re-encoded codec tokens, the reference's feedback loop,
    fireredtts2/fireredtts2.py:389-394). P is static per compiled program
    (128-aligned ladder)."""
    k = jax.lax.dynamic_slice_in_dim(state.cache_k, b, 1, axis=1)
    v = jax.lax.dynamic_slice_in_dim(state.cache_v, b, 1, axis=1)
    return k[:, :, :P], v[:, :, :P]


def build_step_frame(cfg: LLMConfig, frame: Array) -> tuple[Array, Array]:
    """Sampled frame (B, ncb) -> next AR input ((B,1,C+1) tokens, mask):
    audio columns filled, text column zero/unmasked (fireredtts2.py:183-193)."""
    B = frame.shape[0]
    tokens = jnp.concatenate(
        [frame.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1)[:, None, :]
    mask = jnp.concatenate(
        [jnp.ones((B, cfg.audio_num_codebooks), jnp.bool_),
         jnp.zeros((B, 1), jnp.bool_)], axis=1)[:, None, :]
    return tokens, mask


def lm_generate_loop(
    params: Params,
    cfg: LLMConfig,
    state: LMState,
    tokens: Array,          # (B, S, C+1) right-aligned prompt bucket
    tokens_mask: Array,
    valid: Array,
    key: Array,
    max_frames: int,        # STATIC buffer capacity
    frame_cap: Array,       # () traced: stop after this many frames
    temperature: float | Array = 0.9,
    topk: int | Array = 20,
    depth_topk: int = 10,
    depth_temperature: float = 0.75,
    real_len: Optional[Array] = None,
) -> tuple[LMState, Array, Array]:
    """Whole-utterance AR generation as ONE device program.

    Prefill + a lax.while_loop over decode frames with per-stream EOS
    (all-zero frame, fireredtts2.py:178). This is the batch path: a single
    dispatch replaces the reference's one-python-step-per-80ms loop.

    real_len: append mode — the prompt window is RIGHT-padded and the KV
    state is NOT fresh (incremental dialogue; see lm_generate_frame).

    Returns (state, frames (B, max_frames, ncb) int32 zero-padded after each
    stream's EOS, n_frames (B,) int32 — EOS frame excluded).
    """
    B = tokens.shape[0]
    ncb = cfg.audio_num_codebooks

    kwargs = dict(temperature=temperature, topk=topk, depth_topk=depth_topk,
                  depth_temperature=depth_temperature)
    state, frame = lm_generate_frame(params, cfg, state, tokens, tokens_mask,
                                     valid, jax.random.fold_in(key, 0),
                                     real_len=real_len, **kwargs)

    buf = jnp.zeros((B, max_frames, ncb), jnp.int32)
    n_frames = jnp.zeros((B,), jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)

    def record(buf, n_frames, done, frame, t):
        is_eos = jnp.all(frame == 0, axis=-1)
        live = ~done & ~is_eos
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, jnp.where(live[:, None], frame, 0), t, axis=1)
        n_frames = n_frames + live.astype(jnp.int32)
        return buf, n_frames, done | is_eos

    buf, n_frames, done = record(buf, n_frames, done, frame, 0)

    def cond(carry):
        state, frame, buf, n_frames, done, t = carry
        return (t < jnp.minimum(max_frames, frame_cap)) & ~jnp.all(done)

    def body(carry):
        state, frame, buf, n_frames, done, t = carry
        st_tokens, st_mask = build_step_frame(cfg, frame)
        st_valid = jnp.ones((B, 1), jnp.bool_)
        state, new_frame = lm_generate_frame(
            params, cfg, state, st_tokens, st_mask, st_valid,
            jax.random.fold_in(key, t), **kwargs)
        buf, n_frames, done = record(buf, n_frames, done, new_frame, t)
        return (state, new_frame, buf, n_frames, done, t + 1)

    carry = (state, frame, buf, n_frames, done, jnp.int32(1))
    state, _, buf, n_frames, done, _ = jax.lax.while_loop(cond, body, carry)
    return state, buf, n_frames


def lm_prefill(params: Params, cfg: LLMConfig, state: LMState,
               tokens: Array, tokens_mask: Array, valid: Array,
               key: Array, temperature=0.9, topk: int = 20) -> tuple[LMState, Array]:
    """Alias for the prefill-shaped generate_frame call."""
    return lm_generate_frame(params, cfg, state, tokens, tokens_mask, valid,
                             key, temperature, topk)


def lm_decode_frame(params: Params, cfg: LLMConfig, state: LMState,
                    frame: Array, frame_mask: Array, key: Array,
                    temperature=0.9, topk: int = 20) -> tuple[LMState, Array]:
    """Single-frame decode step: frame (B, 1, C+1)."""
    B = frame.shape[0]
    valid = jnp.ones((B, 1), jnp.bool_)
    return lm_generate_frame(params, cfg, state, frame, frame_mask, valid,
                             key, temperature, topk)


# ---------------------------------------------------------------------------
# Training loss
# ---------------------------------------------------------------------------


def _masked_ce(logits: Array, targets: Array, weights: Array) -> Array:
    """Weighted mean cross-entropy in fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def lm_loss(params: Params, cfg: LLMConfig, tokens: Array, tokens_mask: Array,
            key: Array, depth_subset: Optional[int] = None,
            depth_indices: Optional[Array] = None) -> dict[str, Array]:
    """Training loss, mirroring reference Model.forward (llm.py:145-272).

    Args:
        tokens: (B, S, C+1) int32 interleaved frames.
        tokens_mask: (B, S, C+1) bool.
        depth_subset: static size of the amortized depth-decoder subset;
            defaults to (B*S)//8 (the reference's 1/8 random subset,
            llm.py:228, with static shape for XLA).

    Returns dict(loss, text_loss, c0_loss, depth_loss).
    """
    bb_cfg, dec_cfg = cfg.backbone, cfg.decoder
    B, S, _ = tokens.shape
    ncb = cfg.audio_num_codebooks
    dtype = params["projection"].dtype

    h = frame_hidden(params, cfg, tokens, tokens_mask, dtype)

    audio_mask = tokens_mask[:, :, 0]      # (B, S) frame is audio
    text_mask = tokens_mask[:, :, -1]      # (B, S) frame is text
    padding_mask = audio_mask | text_mask

    # Causal mask restricted to non-pad positions, plus self (llm.py:192-200).
    causal = mask_ops.causal_mask(S)[None]
    pair = padding_mask[:, :, None] & padding_mask[:, None, :]
    attn = (causal & pair) | jnp.eye(S, dtype=jnp.bool_)[None]

    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    h_out, _ = transformer_forward(params["backbone"], bb_cfg, h, positions,
                                   attn, remat=cfg.train_remat or None)

    # Codebook-0: h at position p predicts the audio frame at p+1
    # (audio_mask rolled left by 1, llm.py:210-215).
    c0_pred_mask = jnp.roll(audio_mask, -1, axis=1).at[:, -1].set(False)
    c0_logits = h_out.astype(jnp.float32) @ params["codebook0_head"].astype(jnp.float32)
    c0_targets = jnp.roll(tokens[:, :, 0], -1, axis=1)
    c0_loss = _masked_ce(c0_logits, c0_targets, c0_pred_mask)

    # Text loss: positions whose NEXT token is text predict it; target ids of 0
    # are ignored (llm.py:218-220 cross_entropy(ignore_index=0)).
    text_target_mask = jnp.roll(text_mask, -1, axis=1).at[:, -1].set(False)
    text_targets = jnp.roll(tokens[:, :, -1], -1, axis=1)
    text_w = text_target_mask & (text_targets != 0)
    # NOTE: the reference gathers h[text_mask] against targets at the *next*
    # text slot; equivalent: every position p with text at p+1 predicts it.
    text_logits = h_out.astype(jnp.float32) @ params["text_head"].astype(jnp.float32)
    text_loss = _masked_ce(text_logits, text_targets, text_w)

    # Depth decoder on a random subset of audio positions (llm.py:225-252).
    # depth_indices (flat B*S positions) overrides the random draw — used by
    # parity tests to align the subset with a reference implementation.
    flat_w = c0_pred_mask.reshape(-1).astype(jnp.float32)
    if depth_indices is not None:
        idx = depth_indices
    else:
        n_sub = depth_subset if depth_subset is not None else max((B * S) // 8, 1)
        probs = flat_w / jnp.maximum(flat_w.sum(), 1.0)
        idx = jax.random.choice(key, B * S, shape=(n_sub,), replace=True, p=probs)
    n_sub = idx.shape[0]
    sub_w = flat_w[idx]  # 0 for any degenerate picks

    h_flat = h_out.reshape(B * S, -1)
    # Target frame tokens live at position p+1 of the same batch row.
    next_tokens = jnp.roll(tokens, -1, axis=1).reshape(B * S, -1)
    sub_h = h_flat[idx]                             # (N, D_b)
    sub_frame = next_tokens[idx]                    # (N, C+1)

    # Depth input sequence: [h, embed(c_0), ..., embed(c_{ncb-2})]
    offs = jnp.arange(ncb - 1, dtype=tokens.dtype) * cfg.audio_vocab_size
    c_embeds = params["audio_embeddings"][sub_frame[:, :ncb - 1] + offs]
    dec_in = jnp.concatenate(
        [sub_h[:, None, :], c_embeds.astype(dtype)], axis=1) @ params["projection"]
    dec_pos = jnp.broadcast_to(jnp.arange(ncb, dtype=jnp.int32)[None], (n_sub, ncb))
    dec_attn = jnp.broadcast_to(mask_ops.causal_mask(ncb)[None], (n_sub, ncb, ncb))
    dec_h, _ = transformer_forward(params["decoder"], dec_cfg, dec_in, dec_pos,
                                   dec_attn, remat=cfg.train_remat or None)

    # Position i (1..ncb-1) predicts codebook i via audio_head[i-1]
    # (einsum bsd,sdv->bsv, llm.py:252).
    dep_logits = jnp.einsum(
        "nsd,sdv->nsv", dec_h[:, 1:, :].astype(jnp.float32),
        params["audio_head"].astype(jnp.float32))
    dep_targets = sub_frame[:, 1:ncb]
    dep_w = jnp.broadcast_to(sub_w[:, None], dep_targets.shape)
    depth_loss = _masked_ce(dep_logits, dep_targets, dep_w)

    w = cfg.decoder_loss_weight
    loss = 2.0 * ((1.0 - w) * c0_loss + w * depth_loss)
    if cfg.use_text_loss:
        loss = loss + 0.01 * text_loss
    out = {"loss": loss, "text_loss": text_loss,
           "c0_loss": c0_loss, "depth_loss": depth_loss}

    # Auxiliary MTP draft-head CE on the same supervised subset (teaches the
    # one-shot draft used as the Jacobi init, speculative depth decode).
    if "depth_draft" in params:
        dh = params["depth_draft"]
        e0 = (params["audio_embeddings"][sub_frame[:, 0]]).astype(dtype)
        trunk = jnp.concatenate([sub_h.astype(dtype), e0],
                                axis=-1) @ dh["trunk"]
        hp = trunk[:, None, :] + dh["pos"][None]
        draft_logits = jnp.einsum("nsd,sdv->nsv", hp.astype(jnp.float32),
                                  params["audio_head"].astype(jnp.float32))
        draft_loss = _masked_ce(draft_logits, dep_targets, dep_w)
        out["draft_loss"] = draft_loss
        out["loss"] = loss + cfg.draft_loss_weight * draft_loss
    return out
