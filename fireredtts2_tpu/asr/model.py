"""Whisper encoder-decoder ASR model in JAX (TPU-first).

The reference wraps the `openai-whisper` package (whisper_asr.py:73-97
loads `whisper.load_model(...)`, :124 `transcribe`). Here the model itself
is implemented natively: the encoder reuses the whisper blocks already
shipped for the codec SSL stack (models/codec/whisper_nn.py — the codec's
frozen SSL encoder IS a whisper encoder), and this module adds the text
decoder (self-attention with a static KV slab + cross-attention over
precomputed encoder K/V) and a greedy transcription loop compiled as ONE
device program (`lax.while_loop` over tokens, on-device EOT).

Weight layout matches HF `WhisperForConditionalGeneration` via
asr/convert.py; numerics are parity-tested against the HF torch model at
tiny dims in tests/test_asr.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.models.codec.whisper_nn import (
    init_whisper_encoder, whisper_encoder_forward, layer_norm,
    quantize_whisper_layers_int8, _wmm,
)
from fireredtts2_tpu.ops.attention import mha_attention

Params = dict[str, Any]


@dataclass(frozen=True)
class WhisperASRModelConfig:
    """Dims + special-token ids of a Whisper checkpoint.

    Defaults are whisper-large-v3 (the reference's `model_size="large"`
    tier; HF openai/whisper-large-v3 config.json).
    """

    n_mels: int = 128
    vocab_size: int = 51_866
    encoder_layers: int = 32
    decoder_layers: int = 32
    num_heads: int = 20
    embed_dim: int = 1280
    ffn_dim: int = 5120
    max_source_positions: int = 1500   # 30 s of 50 Hz encoder frames
    max_target_positions: int = 448
    # Special tokens (large-v3 multilingual vocab):
    sot_id: int = 50_258               # <|startoftranscript|>
    eot_id: int = 50_257               # <|endoftext|>
    transcribe_id: int = 50_360        # <|transcribe|>
    translate_id: int = 50_359         # <|translate|>
    no_timestamps_id: int = 50_364     # <|notimestamps|>
    no_speech_id: int = 50_362         # <|nospeech|>
    sot_prev_id: int = 50_361          # <|startofprev|> (text conditioning)
    first_language_id: int = 50_259    # <|en|>; languages are contiguous
    num_languages: int = 100

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


TINY_ASR = WhisperASRModelConfig(
    n_mels=16, vocab_size=64, encoder_layers=2, decoder_layers=2,
    num_heads=2, embed_dim=32, ffn_dim=64, max_source_positions=32,
    max_target_positions=24, sot_id=60, eot_id=59, transcribe_id=58,
    translate_id=57, no_timestamps_id=56, no_speech_id=55, sot_prev_id=54,
    first_language_id=40, num_languages=8)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _init_decoder_layers(key: Array, L: int, D: int, F: int, dtype) -> Params:
    ks = jax.random.split(key, 10)

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    zeros = lambda *s: jnp.zeros(s, dtype)
    ones = lambda *s: jnp.ones(s, dtype)
    return {
        # self-attention (k has no bias — whisper convention)
        "self_wq": w(ks[0], L, D, D), "self_bq": zeros(L, D),
        "self_wk": w(ks[1], L, D, D),
        "self_wv": w(ks[2], L, D, D), "self_bv": zeros(L, D),
        "self_wo": w(ks[3], L, D, D), "self_bo": zeros(L, D),
        "self_ln_w": ones(L, D), "self_ln_b": zeros(L, D),
        # cross-attention over encoder states
        "cross_wq": w(ks[4], L, D, D), "cross_bq": zeros(L, D),
        "cross_wk": w(ks[5], L, D, D),
        "cross_wv": w(ks[6], L, D, D), "cross_bv": zeros(L, D),
        "cross_wo": w(ks[7], L, D, D), "cross_bo": zeros(L, D),
        "cross_ln_w": ones(L, D), "cross_ln_b": zeros(L, D),
        # FFN
        "fc1_w": w(ks[8], L, D, F), "fc1_b": zeros(L, F),
        "fc2_w": w(ks[9], L, F, D), "fc2_b": zeros(L, D),
        "ffn_ln_w": ones(L, D), "ffn_ln_b": zeros(L, D),
    }


def init_asr_params(key: Array, cfg: WhisperASRModelConfig,
                    dtype=jnp.float32) -> Params:
    ke, kd, kt, kp = jax.random.split(key, 4)
    D = cfg.embed_dim
    return {
        "encoder": init_whisper_encoder(
            ke, cfg.n_mels, D, cfg.encoder_layers, cfg.num_heads,
            cfg.ffn_dim, cfg.max_source_positions, dtype),
        "decoder": {
            "layers": _init_decoder_layers(
                kd, cfg.decoder_layers, D, cfg.ffn_dim, dtype),
            "token_emb": (jax.random.normal(
                kt, (cfg.vocab_size, D), jnp.float32) * 0.02).astype(dtype),
            "pos_emb": (jax.random.normal(
                kp, (cfg.max_target_positions, D), jnp.float32) * 0.02
            ).astype(dtype),
            "ln_w": jnp.ones((D,), dtype),
            "ln_b": jnp.zeros((D,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Decoder forward
# ---------------------------------------------------------------------------


class ASRDecodeState(NamedTuple):
    """Self-attn KV slabs + position for the AR text decode."""
    cache_k: Array        # (L, B, T_ctx, H, Dh)
    cache_v: Array
    pos: Array            # () int32 — shared across the batch (no padding)


_DECODER_INT8_KEYS = ("self_wq", "self_wk", "self_wv", "self_wo",
                      "cross_wq", "cross_wo", "fc1_w", "fc2_w")


def quantize_asr_params_int8(params: Params) -> Params:
    """Weight-only int8 (per-output-channel symmetric) for the
    transcription hot path: the encoder stack and the decoder's PER-STEP
    matmuls. cross_wk/cross_wv stay fp — they run once per utterance in
    precompute_cross_kv, not per token; so does the tied token embedding
    (quality-sensitive logits). At whisper-large-v3 dims AR decode is
    weight-read-bound, so int8 halves the per-token HBM traffic (same
    recipe as the TTS LM backbone, models/lm/transformer.py)."""
    out = dict(params)
    enc = dict(params["encoder"])
    enc["layers"] = quantize_whisper_layers_int8(enc["layers"])
    out["encoder"] = enc
    dec = dict(params["decoder"])
    lp = dict(dec["layers"])
    for k in _DECODER_INT8_KEYS:
        w = lp[k].astype(jnp.float32)
        scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0, 1e-8)
        lp[k] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        lp[k + "_scale"] = scale  # (L, 1, out) fp32
    dec["layers"] = lp
    out["decoder"] = dec
    return out


def init_asr_decode_state(cfg: WhisperASRModelConfig, batch: int,
                          dtype=jnp.float32) -> ASRDecodeState:
    shape = (cfg.decoder_layers, batch, cfg.max_target_positions,
             cfg.num_heads, cfg.head_dim)
    return ASRDecodeState(cache_k=jnp.zeros(shape, dtype),
                          cache_v=jnp.zeros(shape, dtype), pos=jnp.int32(0))


def precompute_cross_kv(params: Params, cfg: WhisperASRModelConfig,
                        enc: Array) -> dict[str, Array]:
    """Encoder states -> per-layer cross-attention K/V, computed ONCE per
    utterance (the reference's torch whisper re-projects encoder states
    through the hooked kv_cache the first decode step; same idea).

    enc: (B, T_enc, D) -> {"k","v"}: (L, B, T_enc, H, Dh)."""
    lp = params["decoder"]["layers"]
    B, T, D = enc.shape
    H, Dh = cfg.num_heads, cfg.head_dim

    def per_layer(wk, wv, bv):
        k = (enc @ wk).reshape(B, T, H, Dh)
        v = (enc @ wv + bv).reshape(B, T, H, Dh)
        return k, v

    k, v = jax.vmap(per_layer)(lp["cross_wk"], lp["cross_wv"], lp["cross_bv"])
    return {"k": k, "v": v}


def _decoder_layer(h: Array, lp: Params, cfg: WhisperASRModelConfig,
                   self_mask: Array, cross_k: Array, cross_v: Array,
                   cross_mask: Optional[Array],
                   k_slab: Array, v_slab: Array, cache_pos: Array):
    B, S, D = h.shape
    H, Dh = cfg.num_heads, cfg.head_dim

    # self-attention over the KV slab (matmuls via _wmm: transparent
    # weight-only int8, whisper_nn.py)
    x = layer_norm(h, lp["self_ln_w"], lp["self_ln_b"])
    q = (_wmm(x, lp, "self_wq") + lp["self_bq"]).reshape(B, S, H, Dh)
    k = _wmm(x, lp, "self_wk").reshape(B, S, H, Dh)
    v = (_wmm(x, lp, "self_wv") + lp["self_bv"]).reshape(B, S, H, Dh)
    k_slab = jax.lax.dynamic_update_slice(
        k_slab, k.astype(k_slab.dtype), (0, cache_pos, 0, 0))
    v_slab = jax.lax.dynamic_update_slice(
        v_slab, v.astype(v_slab.dtype), (0, cache_pos, 0, 0))
    attn = mha_attention(q, k_slab.astype(h.dtype), v_slab.astype(h.dtype),
                         self_mask)
    h = h + (_wmm(attn.reshape(B, S, D), lp, "self_wo")
             + lp["self_bo"]).astype(h.dtype)

    # cross-attention over precomputed encoder K/V
    cross_in = h                     # saved for alignment-head re-projection
    x = layer_norm(h, lp["cross_ln_w"], lp["cross_ln_b"])
    q = (_wmm(x, lp, "cross_wq") + lp["cross_bq"]).reshape(B, S, H, Dh)
    attn = mha_attention(q, cross_k.astype(h.dtype), cross_v.astype(h.dtype),
                         cross_mask)
    h = h + (_wmm(attn.reshape(B, S, D), lp, "cross_wo")
             + lp["cross_bo"]).astype(h.dtype)

    # FFN
    x = layer_norm(h, lp["ffn_ln_w"], lp["ffn_ln_b"])
    x = jax.nn.gelu(_wmm(x, lp, "fc1_w") + lp["fc1_b"], approximate=False)
    h = h + (_wmm(x, lp, "fc2_w") + lp["fc2_b"]).astype(h.dtype)
    return h, k_slab, v_slab, cross_in


def asr_decoder_forward(params: Params, cfg: WhisperASRModelConfig,
                        tokens: Array, state: ASRDecodeState,
                        cross_kv: dict[str, Array],
                        enc_len: Optional[Array] = None,
                        collect_cross_inputs: bool = False,
                        ) -> tuple[Array, ASRDecodeState] | tuple[
                            Array, ASRDecodeState, Array]:
    """Decode a window of tokens (B, S) at positions [pos, pos+S).

    Returns (logits (B, S, V) fp32, new state). One call covers prompt
    prefill (S>1) and AR steps (S=1) — same single-program design as the
    TTS LM (models/lm/model.py). With collect_cross_inputs (STATIC) a
    third output carries each layer's cross-attention input hidden states
    (L, B, S, D) so alignment heads can be re-projected for word-level
    timestamps (asr_alignment_probs) without materializing every head's
    (L, H, S, T_enc) attention map.
    """
    dec = params["decoder"]
    B, S = tokens.shape
    dtype = dec["token_emb"].dtype
    pos = state.pos

    h = dec["token_emb"][tokens]
    h = h + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, S, axis=0)[None]
    h = h.astype(dtype)

    # causal over the slab: query at absolute position p sees slots <= p
    T_ctx = state.cache_k.shape[2]
    qpos = pos + jnp.arange(S, dtype=jnp.int32)
    self_mask = (jnp.arange(T_ctx, dtype=jnp.int32)[None, :]
                 <= qpos[:, None])[None]            # (1, S, T_ctx)
    self_mask = jnp.broadcast_to(self_mask, (B, S, T_ctx))

    cross_mask = None
    if enc_len is not None:
        T_enc = cross_kv["k"].shape[2]
        cross_mask = (jnp.arange(T_enc)[None, :] < enc_len[:, None])[:, None, :]
        cross_mask = jnp.broadcast_to(cross_mask, (B, S, T_enc))

    def body(hh, xs):
        lp, ck, cv, ks, vs = xs
        hh, ks, vs, xin = _decoder_layer(hh, lp, cfg, self_mask, ck, cv,
                                         cross_mask, ks, vs, pos)
        return hh, ((ks, vs, xin) if collect_cross_inputs else (ks, vs))

    h, ys = jax.lax.scan(
        body, h, (dec["layers"], cross_kv["k"], cross_kv["v"],
                  state.cache_k, state.cache_v))
    h = layer_norm(h, dec["ln_w"], dec["ln_b"])
    logits = h.astype(jnp.float32) @ dec["token_emb"].T.astype(jnp.float32)
    if collect_cross_inputs:
        nk, nv, xin = ys
        return (logits, ASRDecodeState(cache_k=nk, cache_v=nv, pos=pos + S),
                xin)
    nk, nv = ys
    return logits, ASRDecodeState(cache_k=nk, cache_v=nv, pos=pos + S)


# ---------------------------------------------------------------------------
# Greedy transcription (one device program)
# ---------------------------------------------------------------------------


def asr_encode(params: Params, cfg: WhisperASRModelConfig, mel: Array,
               mel_len: Array) -> tuple[Array, Array]:
    """(B, T_mel, n_mels) log-mel -> (B, T_enc, D) encoder states + lengths."""
    return whisper_encoder_forward(params["encoder"], cfg.num_heads,
                                   mel, mel_len)


class GreedyResult(NamedTuple):
    tokens: Array          # (B, max_new) int32, eot-padded
    n_tokens: Array        # (B,) int32 — tokens before EOT
    sum_logprob: Array     # (B,) fp32 — sum of greedy token logprobs
    no_speech_prob: Array  # (B,) fp32 — p(<|nospeech|>) at the SOT step


def _sample_loop(params: Params, cfg: WhisperASRModelConfig,
                 cross: dict[str, Array], enc_len: Array, state: ASRDecodeState,
                 prompt: Array, max_new: int,
                 temperature: Array, key: Array,
                 sot_index: int = 0) -> GreedyResult:
    """Greedy/sampled AR decode over R prompt rows given a prepared
    encoder context (cross KV + lengths + fresh slab state). Shared by
    asr_greedy_decode (R = B) and asr_sample_best_of (R = B*N tiled
    candidates — encode once, decode many)."""
    B, P = prompt.shape
    temperature = jnp.asarray(temperature, jnp.float32)

    def pick(logp, t):
        """argmax at T=0, categorical sample at T>0 (one program: the
        branch rides a where on a traced scalar)."""
        greedy = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        safe_t = jnp.maximum(temperature, 1e-4)
        sampled = jax.random.categorical(
            jax.random.fold_in(key, t), logp / safe_t, axis=-1
        ).astype(jnp.int32)
        return jnp.where(temperature > 0.0, sampled, greedy)

    logits, state = asr_decoder_forward(params, cfg, prompt, state, cross,
                                        enc_len)
    # p(no-speech) at the SOT position (openai whisper decoding.py reads the
    # same logit before sampling begins). sot_index > 0 when the prompt
    # carries <|startofprev|> conditioning tokens ahead of the SOT block.
    no_speech = jax.nn.softmax(logits[:, sot_index],
                               axis=-1)[:, cfg.no_speech_id]

    logp = jax.nn.log_softmax(logits[:, -1], axis=-1)     # (B, V)
    tok = pick(logp, 0)
    slp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

    buf = jnp.full((B, max_new), cfg.eot_id, jnp.int32)
    done = tok == cfg.eot_id
    buf = buf.at[:, 0].set(jnp.where(done, cfg.eot_id, tok))
    n = (~done).astype(jnp.int32)
    sum_lp = slp

    def cond(c):
        _, _, _, _, done, _, t = c
        return (t < max_new) & ~jnp.all(done)

    def body(c):
        state, buf, n, sum_lp, done, tok, t = c
        logits, state = asr_decoder_forward(
            params, cfg, tok[:, None], state, cross, enc_len)
        logp = jax.nn.log_softmax(logits[:, -1], axis=-1)
        nxt = pick(logp, t)
        lp_t = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
        is_eot = nxt == cfg.eot_id
        live = ~done & ~is_eot
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, jnp.where(live, nxt, cfg.eot_id), t, axis=1)
        n = n + live.astype(jnp.int32)
        sum_lp = sum_lp + jnp.where(done, 0.0, lp_t)
        # keep feeding EOT once done (a done stream's later outputs are
        # discarded; its extra KV writes only affect itself)
        return (state, buf, n, sum_lp, done | is_eot,
                jnp.where(done, cfg.eot_id, nxt), t + 1)

    carry = (state, buf, n, sum_lp, done, tok, jnp.int32(1))
    _, buf, n, sum_lp, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return GreedyResult(tokens=buf, n_tokens=n, sum_logprob=sum_lp,
                        no_speech_prob=no_speech)


def asr_greedy_decode(params: Params, cfg: WhisperASRModelConfig,
                      mel: Array, mel_len: Array, prompt: Array,
                      max_new: int, suppress_blank_id: int = -1,
                      temperature: Array | float = 0.0,
                      key: Optional[Array] = None,
                      sot_index: int = 0) -> GreedyResult:
    """Whole-utterance transcription as ONE jitted program.

    Args:
        mel: (B, T_mel, n_mels); mel_len: (B,); prompt: (B, P) forced
        tokens (e.g. [sot, lang, transcribe, notimestamps]); max_new:
        STATIC output budget.
        temperature: TRACED scalar — 0.0 is greedy (argmax); > 0 samples
        softmax(logits/T). Traced so the whole temperature-fallback ladder
        (reference whisper_asr.py:124-200 retries at rising temperature on
        weak transcripts) reuses one compiled program.
        key: PRNG key for sampled decoding (required when temperature can
        be > 0; folded by step index so decodes are reproducible).

    Mirrors reference whisper transcribe's default temperature=0 path;
    asr_beam_decode / asr_sample_best_of cover the reference's beam_size /
    best_of search options (whisper_asr.py:40-41).
    """
    B, P = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    state = init_asr_decode_state(cfg, B, enc.dtype)
    return _sample_loop(params, cfg, cross, enc_len, state, prompt, max_new,
                        temperature, key, sot_index)


def _tile_beams(cross: dict[str, Array], enc_len: Array, n: int
                ) -> tuple[dict[str, Array], Array]:
    """Tile the per-utterance encoder context to n rows per utterance
    (row r = b*n + j): the encoder runs ONCE however many candidates or
    beams decode against it."""
    return ({k: jnp.repeat(v, n, axis=1) for k, v in cross.items()},
            jnp.repeat(enc_len, n, axis=0))


def asr_sample_best_of(params: Params, cfg: WhisperASRModelConfig,
                       mel: Array, mel_len: Array, prompt: Array,
                       max_new: int, best_of: int,
                       temperature: Array | float,
                       key: Optional[Array] = None,
                       sot_index: int = 0) -> GreedyResult:
    """best-of-N sampled transcription (reference ASRConfig.best_of,
    whisper_asr.py:41 / openai whisper GreedyDecoder(best_of)): N
    independent samples decode as ONE batched program against a single
    shared encoder pass (candidates are just rows of the batch — the
    TPU-first shape of "run it N times"), then the candidate with the best
    length-normalized logprob wins per utterance.

    Selection metric sum_logprob/(n_tokens+1) matches the service layer's
    avg-logprob confidence gate, so the winner is exactly the candidate the
    fallback ladder would judge strongest.
    """
    B, P = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    cross, enc_len = _tile_beams(cross, enc_len, best_of)
    R = B * best_of
    state = init_asr_decode_state(cfg, R, enc.dtype)
    res = _sample_loop(params, cfg, cross, enc_len, state,
                       jnp.repeat(prompt, best_of, axis=0), max_new,
                       temperature, key, sot_index)
    avg = (res.sum_logprob / (res.n_tokens.astype(jnp.float32) + 1.0)
           ).reshape(B, best_of)
    best = jnp.argmax(avg, axis=1)                       # (B,)
    rows = jnp.arange(B) * best_of + best
    return GreedyResult(tokens=res.tokens[rows], n_tokens=res.n_tokens[rows],
                        sum_logprob=res.sum_logprob[rows],
                        no_speech_prob=res.no_speech_prob[jnp.arange(B)
                                                          * best_of])


# ---------------------------------------------------------------------------
# Beam search (one device program)
# ---------------------------------------------------------------------------


class BeamResult(NamedTuple):
    tokens: Array          # (B, max_new) int32 best hypothesis, eot-padded
    n_tokens: Array        # (B,) int32 — tokens before EOT
    sum_logprob: Array     # (B,) fp32 — incl. the closing EOT's logprob
    no_speech_prob: Array  # (B,) fp32
    n_finished: Array      # (B,) int32 — hypotheses that closed with EOT


def asr_beam_decode(params: Params, cfg: WhisperASRModelConfig,
                    mel: Array, mel_len: Array, prompt: Array,
                    max_new: int, beam_size: int,
                    sot_index: int = 0) -> BeamResult:
    """Beam-search transcription as ONE jitted program (reference
    ASRConfig.beam_size, whisper_asr.py:40, backed by openai whisper's
    BeamSearchDecoder, decoding.py — semantics reproduced here, tested
    token-exact against an eager implementation in tests/test_asr.py):

    - beams are ROWS of the decode batch (row r = b*W + w); reordering a
      beam is a gather of its KV-slab rows — no python control flow, the
      whole search is a lax.while_loop on device;
    - each step every beam proposes its top-(W+1) tokens; EOT proposals
      enter a per-utterance finished pool (best-first, capped at W =
      patience 1.0), the best W non-EOT proposals become the next beams;
    - the search ends when the pool is full (or the token budget runs
      out; unfinished beams then pad the pool), and the hypothesis with
      the best length-normalized logprob sum/(len+1) wins — whisper's
      MaximumLikelihoodRanker with length_penalty=None, normalized the
      same way the service layer's confidence gate is.
    """
    B, P = prompt.shape
    W = beam_size
    V = cfg.vocab_size
    R = B * W
    NEG = jnp.float32(-1e9)
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    cross, enc_lenR = _tile_beams(cross, enc_len, W)
    state = init_asr_decode_state(cfg, R, enc.dtype)

    logits, state = asr_decoder_forward(
        params, cfg, jnp.repeat(prompt, W, axis=0), state, cross, enc_lenR)
    no_speech = jax.nn.softmax(logits[::W, sot_index],
                               axis=-1)[:, cfg.no_speech_id]
    logp0 = jax.nn.log_softmax(logits[:, -1], axis=-1).reshape(B, W, V)

    barange = jnp.arange(B)
    eot_onehot = jax.nn.one_hot(cfg.eot_id, V, dtype=jnp.float32)

    def step(logp, state, beam_tok, beam_sum, fin):
        """One beam-search transition. logp: (B, W, V); beam state is
        gathered/extended; EOT proposals feed the finished pool."""
        fin_tok, fin_sum, fin_n, fin_cnt, t = fin
        live = beam_sum > NEG / 2                         # (B, W)

        # -- EOT proposals: each beam contributes one, valid only when EOT
        # is inside its own top-(W+1) (openai proposes exactly W+1 per
        # beam, so EOT outside that set is never seen).
        kth = jax.lax.top_k(logp, min(W + 1, V))[0][..., -1]   # (B, W)
        eot_lp = logp[..., cfg.eot_id]
        eot_valid = (eot_lp >= kth) & live
        eot_score = beam_sum + eot_lp                     # (B, W)
        order = jnp.argsort(-jnp.where(eot_valid, eot_score, NEG), axis=1)

        def insert(i, carry):
            ft, fs, fn, fc = carry
            j = order[:, i]                               # (B,)
            ok = (jnp.take_along_axis(eot_valid, j[:, None], 1)[:, 0]
                  & (fc < W))
            slot = jnp.minimum(fc, W - 1)
            score_j = jnp.take_along_axis(eot_score, j[:, None], 1)[:, 0]
            seq_j = jnp.take_along_axis(
                beam_tok, j[:, None, None], 1)[:, 0]      # (B, max_new)
            cur_s = fs[barange, slot]
            cur_t = ft[barange, slot]
            cur_n = fn[barange, slot]
            fs = fs.at[barange, slot].set(jnp.where(ok, score_j, cur_s))
            ft = ft.at[barange, slot].set(
                jnp.where(ok[:, None], seq_j, cur_t))
            fn = fn.at[barange, slot].set(jnp.where(ok, t, cur_n))
            return ft, fs, fn, fc + ok.astype(jnp.int32)

        fin_tok, fin_sum, fin_n, fin_cnt = jax.lax.fori_loop(
            0, W, insert, (fin_tok, fin_sum, fin_n, fin_cnt))

        # -- continuations: global top-W over (W*V) non-EOT candidates.
        cand = beam_sum[..., None] + logp - eot_onehot * 1e9
        top_s, top_i = jax.lax.top_k(cand.reshape(B, W * V), W)
        parent = top_i // V                               # (B, W)
        tok = (top_i % V).astype(jnp.int32)
        beam_tok = jnp.take_along_axis(beam_tok, parent[:, :, None], 1)
        beam_tok = jax.lax.dynamic_update_index_in_dim(
            beam_tok.transpose(2, 0, 1), tok, t, axis=0).transpose(1, 2, 0)
        rows = (barange[:, None] * W + parent).reshape(R)
        state = ASRDecodeState(
            cache_k=jnp.take(state.cache_k, rows, axis=1),
            cache_v=jnp.take(state.cache_v, rows, axis=1), pos=state.pos)
        return (state, beam_tok, top_s, tok.reshape(R),
                (fin_tok, fin_sum, fin_n, fin_cnt, t + 1))

    beam_tok = jnp.full((B, W, max_new), cfg.eot_id, jnp.int32)
    beam_sum = jnp.where(jnp.arange(W)[None, :] == 0, 0.0, NEG)
    beam_sum = jnp.broadcast_to(beam_sum, (B, W)).astype(jnp.float32)
    fin = (jnp.full((B, W, max_new), cfg.eot_id, jnp.int32),
           jnp.full((B, W), NEG, jnp.float32),
           jnp.zeros((B, W), jnp.int32), jnp.zeros((B,), jnp.int32),
           jnp.int32(0))
    state, beam_tok, beam_sum, cur, fin = step(
        logp0, state, beam_tok, beam_sum, fin)

    def cond(c):
        _, _, _, _, (_, _, _, fc, t) = c
        return (t < max_new) & ~jnp.all(fc >= W)

    def body(c):
        state, beam_tok, beam_sum, cur, fin = c
        logits, state = asr_decoder_forward(
            params, cfg, cur[:, None], state, cross, enc_lenR)
        logp = jax.nn.log_softmax(logits[:, -1], axis=-1).reshape(B, W, V)
        return step(logp, state, beam_tok, beam_sum, fin)

    _, beam_tok, beam_sum, _, fin = jax.lax.while_loop(
        cond, body, (state, beam_tok, beam_sum, cur, fin))
    fin_tok, fin_sum, fin_n, fin_cnt, t_end = fin
    n_finished = jnp.minimum(fin_cnt, W)

    # Finalize: utterances whose pool is not full pad it with the running
    # beams, best score first (openai BeamSearchDecoder.finalize).
    order = jnp.argsort(-beam_sum, axis=1)

    def pad(i, carry):
        ft, fs, fn, fc = carry
        j = order[:, i]
        ok = fc < W
        slot = jnp.minimum(fc, W - 1)
        score_j = jnp.take_along_axis(beam_sum, j[:, None], 1)[:, 0]
        seq_j = jnp.take_along_axis(beam_tok, j[:, None, None], 1)[:, 0]
        cur_s = fs[barange, slot]
        cur_t = ft[barange, slot]
        cur_n = fn[barange, slot]
        fs = fs.at[barange, slot].set(jnp.where(ok, score_j, cur_s))
        ft = ft.at[barange, slot].set(jnp.where(ok[:, None], seq_j, cur_t))
        fn = fn.at[barange, slot].set(jnp.where(ok, t_end, cur_n))
        return ft, fs, fn, fc + ok.astype(jnp.int32)

    fin_tok, fin_sum, fin_n, _ = jax.lax.fori_loop(
        0, W, pad, (fin_tok, fin_sum, fin_n, fin_cnt))

    avg = fin_sum / (fin_n.astype(jnp.float32) + 1.0)
    best = jnp.argmax(avg, axis=1)
    return BeamResult(
        tokens=fin_tok[barange, best], n_tokens=fin_n[barange, best],
        sum_logprob=fin_sum[barange, best], no_speech_prob=no_speech,
        n_finished=n_finished)


def asr_alignment_probs(params: Params, cfg: WhisperASRModelConfig,
                        mel: Array, mel_len: Array, tokens: Array,
                        heads: tuple[tuple[int, int], ...]
                        ) -> tuple[Array, Array]:
    """Teacher-forced cross-attention maps for word-level timestamps
    (openai whisper timing.find_alignment — the mechanism behind the
    reference's ASRConfig.word_timestamps, whisper_asr.py:45).

    One device program: full forward over the decoded `tokens` (B, S)
    collecting each layer's cross-attention INPUT states, then only the
    selected alignment (layer, head) pairs are re-projected to attention
    probabilities — materializing K maps of (S, T_enc) instead of every
    head's (L, H, S, T_enc) (1.7 GB at large-v3 dims; K maps are ~20 MB).

    Returns:
        probs: (B, K, S, T_enc) fp32 — softmax attention of each
            alignment head, masked to the real encoder frames.
        token_logprob: (B, S) fp32 — log p(tokens[i] | tokens[<i]) under
            teacher forcing (position 0 has no predecessor -> 0.0); used
            for per-word probabilities.
    """
    B, S = tokens.shape
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    state = init_asr_decode_state(cfg, B, enc.dtype)
    logits, _, xin = asr_decoder_forward(params, cfg, tokens, state, cross,
                                         enc_len, collect_cross_inputs=True)
    lp_all = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(lp_all[:, :-1],
                                 tokens[:, 1:, None], axis=2)[:, :, 0]
    token_logprob = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), tok_lp], axis=1)

    layers = params["decoder"]["layers"]
    H, Dh = cfg.num_heads, cfg.head_dim
    T = cross["k"].shape[2]
    frame_ok = jnp.arange(T)[None, None, :] < enc_len[:, None, None]
    maps = []
    for l, h in heads:               # static, K is small
        x = layer_norm(xin[l], layers["cross_ln_w"][l],
                       layers["cross_ln_b"][l])
        q = (x @ layers["cross_wq"][l]
             + layers["cross_bq"][l]).reshape(B, S, H, Dh)[:, :, h]
        k = cross["k"][l][:, :, h]                       # (B, T, Dh)
        scores = jnp.einsum(
            "bsd,btd->bst", q.astype(jnp.float32), k.astype(jnp.float32)
        ) / jnp.sqrt(jnp.float32(Dh))
        scores = jnp.where(frame_ok, scores, -1e30)
        maps.append(jax.nn.softmax(scores, axis=-1))
    return jnp.stack(maps, axis=1), token_logprob


def asr_detect_language(params: Params, cfg: WhisperASRModelConfig,
                        mel: Array, mel_len: Array) -> Array:
    """One decode step from [sot]: softmax restricted to the language-token
    block -> (B, num_languages) probabilities (openai whisper
    decoding.detect_language does exactly this)."""
    B = mel.shape[0]
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    state = init_asr_decode_state(cfg, B, enc.dtype)
    sot = jnp.full((B, 1), cfg.sot_id, jnp.int32)
    logits, _ = asr_decoder_forward(params, cfg, sot, state, cross, enc_len)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], cfg.first_language_id, cfg.num_languages, axis=1)
    return jax.nn.softmax(lang_logits, axis=-1)
