"""FireRedTTS2-compatible synthesis engine on the TPU stack.

API parity with reference fireredtts2/fireredtts2.py:15-459:
- `FireRedTTS2Engine(pretrained_dir, gen_type, ...)` loads config_llm.json /
  config_codec.json / llm_{pre,post}train.pt / codec.pt / Qwen2.5 tokenizer;
- `generate_dialogue(text_list, prompt_wav_list, prompt_text_list, ...)`;
- `generate_monologue(text, prompt_wav, prompt_text, ...)`;
- `generate(text, speaker, context, ...)` single-utterance path;
- `generate_stream(...)` — the REAL streaming generator the reference left
  commented out (fireredtts2.py:259-343): decode token t-1's audio while
  sampling token t, yielding ~80 ms chunks.

TPU-first engineering:
- prompts are LEFT-padded into static buckets, so every prompt length hits
  one of a handful of compiled prefill graphs (no recompile storms);
- batch paths (generate/generate_dialogue/generate_monologue/generate_batch)
  run the WHOLE utterance as one device program (lax.while_loop with
  on-device EOS) plus one bucketed vocoder scan;
- the streaming path decodes K frames (LM + vocoder, fused) per dispatch
  with ONE packed fetch per block (models/pipeline.py) — the EOS flags ride
  inside the packed array, so host round trips never scale per frame.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import threading
import time
from dataclasses import dataclass
from functools import partial
from typing import Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import (
    EngineConfig, llm_config_from_json, codec_config_from_json,
)
from fireredtts2_tpu.models.lm.model import (
    init_lm_params, init_lm_state, lm_generate_frame, lm_generate_loop,
    build_step_frame,
)
from fireredtts2_tpu.models.pipeline import stream_block
from fireredtts2_tpu.models.codec.model import (
    init_codec_params, encode_window, codec_encode, codec_decode_chunks,
    assemble_chunks, stream_decode_init,
)
from fireredtts2_tpu.utils.text import (
    clean_text, split_text, process_text_list, SPEAKER_TAGS,
)
from fireredtts2_tpu.utils.tokenizer import load_tokenizer
from fireredtts2_tpu.utils.audio_io import load_prompt_audio_16k, resample


@dataclass
class Segment:
    """One conversational segment (reference llm/utils.py:13-17).

    audio_tokens/audio_tokens_mask: optional PRE-ENCODED (T, ncols) frames
    for `audio` (engine.encode_prompt_tokens). When set, the engine skips
    the 32-layer SSL + RVQ encode entirely — the per-voice prompt cache
    (SURVEY §7 "cacheable per voice profile"; the reference re-encodes on
    every call, fireredtts2/fireredtts2.py:90-115)."""
    speaker: str
    text: str
    audio: np.ndarray  # (T,) float32 @16 kHz
    audio_tokens: Optional[np.ndarray] = None
    audio_tokens_mask: Optional[np.ndarray] = None


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class FireRedTTS2Engine:
    """End-to-end dialogue/monologue synthesis with voice cloning."""

    def __init__(
        self,
        config: Optional[EngineConfig] = None,
        pretrained_dir: Optional[str] = None,
        gen_type: str = "dialogue",
        seed: int = 0,
        llm_overrides: Optional[dict] = None,
        codec_overrides: Optional[dict] = None,
        mesh=None,
    ):
        """llm_overrides / codec_overrides: config-field overrides applied
        on top of the checkpoint's JSON (or the given config) — the CLI
        path for serving perf knobs, e.g. {"quantize_backbone": True,
        "fused_depth_plan": "gate=r8,up=s8,down=s8"}.

        mesh: an optional jax.sharding.Mesh with ("dp", "tp") axes
        (parallel/mesh.py:make_mesh). When given, the engine serves
        SHARDED inference: LM projections are column/row-split over tp
        (XLA inserts the all-reduces over ICI), decode-state stream slots
        ride dp, and the codec runs replicated. Every public API keeps
        exactly its single-device semantics — tokens match the unsharded
        engine (tests/test_multichip.py). Use tp for latency (one stream
        spread over chips), dp for throughput (B divisible by dp). The
        reference has no distributed inference at all (SURVEY.md §2.3)."""
        assert gen_type in ("monologue", "dialogue")
        self.gen_type = gen_type

        if config is not None and (llm_overrides or codec_overrides):
            config = dataclasses.replace(
                config,
                llm=dataclasses.replace(config.llm, **(llm_overrides or {})),
                codec=dataclasses.replace(config.codec,
                                          **(codec_overrides or {})))

        if pretrained_dir is not None:
            llm_cfg = llm_config_from_json(
                os.path.join(pretrained_dir, "config_llm.json"),
                **(llm_overrides or {}))
            codec_cfg = codec_config_from_json(
                os.path.join(pretrained_dir, "config_codec.json"),
                **(codec_overrides or {}))
            # Engine limits follow the checkpoint's LM: max_seq_len from
            # config_llm.json, prefill buckets trimmed so every bucket
            # leaves >= 28 decode slots (3100 - 3072, the reference's own
            # headroom, fireredtts2.py:166-171).
            default_buckets = EngineConfig.prefill_buckets
            buckets = tuple(b for b in default_buckets
                            if b <= llm_cfg.max_seq_len - 28) \
                or (max(32, llm_cfg.max_seq_len // 2),)
            config = EngineConfig(llm=llm_cfg, codec=codec_cfg,
                                  gen_type=gen_type,
                                  max_seq_len=llm_cfg.max_seq_len,
                                  prefill_buckets=buckets)
            self.config = config
            self.lm_params, self.codec_params = self._load_checkpoint_trees(
                pretrained_dir, llm_cfg, codec_cfg)
            tok_dir = os.path.join(pretrained_dir, "Qwen2.5-1.5B")
            # Byte fallback when the Qwen tokenizer isn't shipped next to
            # the weights (dev fixtures, the convert drill) — loud, since
            # real text quality needs the real tokenizer.
            if not os.path.isdir(tok_dir):
                import logging
                logging.getLogger(__name__).warning(
                    "no Qwen2.5-1.5B tokenizer dir under %s; using the "
                    "byte fallback tokenizer", pretrained_dir)
                tok_dir = None
            self.tokenizer = load_tokenizer(tok_dir)
        else:
            assert config is not None, "need a config or a pretrained_dir"
            self.config = config
            key = jax.random.PRNGKey(seed)
            k1, k2 = jax.random.split(key)
            self.lm_params = init_lm_params(k1, config.llm,
                                            _dtype_of(config.llm.dtype))
            self.codec_params = init_codec_params(k2, config.codec,
                                                  _dtype_of(config.codec.dtype))
            self.tokenizer = load_tokenizer(None)

        self.mesh = mesh
        # Publish the mesh for the transformer's decode attention: the LM
        # flash kernel is shard_mapped over tp-split heads when a mesh is
        # live (ops/pallas_flash.py:flash_decode_gqa1_shard, VERDICT r3
        # #6). The context is read at TRACE time; constructing a second
        # engine with a different mesh in one process flips programs not
        # yet traced to the newer mesh — always correct (shard_map is
        # semantics-preserving and the no-mesh read falls back to the
        # single-device kernel), but serve one engine per process for the
        # intended routing.
        from fireredtts2_tpu.parallel.mesh import set_serving_mesh
        set_serving_mesh(mesh)
        # Mesh mode no longer pins FRTTS2_FLASH_VOC off (r5): the vocoder
        # KV slab is column-sharded over tp (each shard owns whole MHA
        # heads), so the write kernel's in-kernel DMAs are shard-local and
        # ride shard_map like the LM kernel
        # (ops/pallas_flash.py:flash_decode_update_bounded_shard); a mesh
        # the kernel can't split falls back to the XLA path per call site.
        self.lm_params, self.codec_params = self._apply_serving_transforms(
            self.lm_params, self.codec_params)

        self.sample_rate = self.config.codec.input_sample_rate      # 16 kHz in
        self.output_sample_rate = self.config.codec.output_sample_rate  # 24 kHz out
        self.max_seq_len = self.config.max_seq_len
        self._ncb = self.config.llm.audio_num_codebooks
        self._ncols = self.config.llm.num_columns
        self._key = jax.random.PRNGKey(seed + 17)
        self._first_packet_s: Optional[float] = None  # last stream's FPL
        # Concurrency contract: the serving layers run engine methods from
        # several threads at once (the batcher worker plus per-request
        # consumer threads, serve/server.py). All MUTABLE shared state —
        # the PRNG key chain and the two content-keyed LRU caches below —
        # is guarded by this one re-entrant lock (VERDICT r4 weak #1: an
        # unlocked _next_key read-modify-write could hand two racing
        # requests the SAME key, i.e. correlated sampling across
        # customers). Device params/compiled programs are read-only after
        # __init__ (apply_checkpoint swaps them only after callers drain,
        # see its docstring) and JAX dispatch itself is thread-safe, so
        # generation paths only synchronize on these few host structures.
        self._lock = threading.RLock()
        # Prompt-audio token cache (see _tokenize_audio).
        from collections import OrderedDict
        self._audio_token_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self.encode_calls = 0
        # Per-voice KV prefix cache (see _context_state): context token
        # hash -> (LMState after context prefill, context length).
        self._voice_state_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._voice_ctx_seen: "OrderedDict[str, bool]" = OrderedDict()
        self.voice_state_builds = 0  # cache-build counter (tests/bench)

        # ---- compiled functions (cfg objects are hashable -> static) ----
        llm_cfg, codec_cfg = self.config.llm, self.config.codec
        acfg = codec_cfg.acoustic_decoder

        def _prefill_block(lm_params, codec_params, state, vstate, tokens,
                           tokens_mask, valid, key, block,
                           temperature, topk, depth_topk, depth_temperature,
                           real_len=None):
            """Prefill + the first `block` stream frames fused into ONE
            device program: the first-packet path pays a single dispatch
            instead of prefill-then-block (each host<->device round trip
            costs ~30 ms through a tunneled TPU). Key folding matches the
            unfused path exactly: prefill samples frame 0 with
            fold_in(key, 0), the block samples frame t with fold_in(key, t).
            real_len: append-prefill mode for incremental streaming
            dialogue (right-padded window; models/lm/model.py).
            """
            state, frame = lm_generate_frame(
                params=lm_params, cfg=llm_cfg, state=state, tokens=tokens,
                tokens_mask=tokens_mask, valid=valid,
                key=jax.random.fold_in(key, 0), temperature=temperature,
                topk=topk, depth_topk=depth_topk,
                depth_temperature=depth_temperature, real_len=real_len)
            emitted = jnp.zeros((tokens.shape[0],), jnp.int32)
            return stream_block(
                lm_params, codec_params, llm_cfg, codec_cfg, state, vstate,
                frame, emitted, key, t_base=jnp.int32(1), block=block,
                temperature=temperature, topk=topk, depth_topk=depth_topk,
                depth_temperature=depth_temperature)

        # whole-utterance generation: ONE device program (prefill +
        # while_loop over frames with on-device EOS); KV slabs are donated
        # so decode updates are in place, not copies
        self._gen_loop_fn = jax.jit(
            partial(lm_generate_loop, cfg=llm_cfg),
            static_argnames=("max_frames", "topk", "depth_topk"),
            donate_argnames=("state",))
        # Incremental-dialogue rewind (models/lm/model.py:rewind_lm_state).
        from fireredtts2_tpu.models.lm.model import rewind_lm_state
        self._rewind_fn = jax.jit(rewind_lm_state, donate_argnames=("state",))
        # Voice-state cache programs: context-only prefill (the sampled
        # frame is discarded by the rewind that follows — only the KV slab
        # matters, so greedy/any sampling params are fine), and a deep
        # state copy so cached slabs survive downstream buffer donation.
        self._ctx_prefill_fn = jax.jit(
            lambda p, state, tokens, tokens_mask, valid, real_len:
            lm_generate_frame(p, llm_cfg, state, tokens, tokens_mask, valid,
                              jax.random.PRNGKey(0), temperature=1.0,
                              topk=1, real_len=real_len)[0],
            donate_argnames=("state",))
        self._copy_state_fn = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))
        # codec_encode calls it as encode_fn(audio_batch, lengths); params
        # ride as a jit ARGUMENT (closing over the tree would embed the
        # whole codec — incl. whisper-large SSL — as compile-time
        # constants, and would pin reload_checkpoint to stale weights).
        self._encode_jit = jax.jit(
            lambda p, a, l: encode_window(p, codec_cfg, a, l))
        self._encode_fn = lambda a, l: self._encode_jit(self.codec_params, a, l)
        self._decode_fn = jax.jit(partial(codec_decode_chunks, cfg=codec_cfg))
        # Fused K-frame stream blocks: one dispatch + one packed fetch per K
        # frames (the host<->device round trip dominates per-frame loops on
        # tunneled TPUs; see models/pipeline.py).
        self._block_fn = jax.jit(
            partial(stream_block, llm_cfg=llm_cfg, codec_cfg=codec_cfg),
            static_argnames=("block", "topk", "depth_topk"),
            donate_argnames=("state", "vstate"))
        # Fused prefill + first block: one dispatch on the FPL path.
        self._prefill_block_fn = jax.jit(
            _prefill_block, static_argnames=("block", "topk", "depth_topk"),
            donate_argnames=("state", "vstate"))
        self._chunk_samples = 8 * acfg.hop_length
        self._tail_samples = (acfg.n_fft - acfg.hop_length) \
            - (acfg.n_fft - acfg.hop_length) // 2
        self._lead_samples = self._tail_samples

    # ------------------------------------------------------------------
    # Checkpoint loading / hot reload
    # ------------------------------------------------------------------

    def _load_checkpoint_trees(self, pretrained_dir: str, llm_cfg, codec_cfg):
        """Raw (lm_params, codec_params) from a serving dir: prefers the
        torch-free DIR/jax/ Orbax trees the `convert`/`export` drills
        persist (runtime/convert.py); falls back to the torch pickles
        (reference checkpoint layout, fireredtts2/fireredtts2.py:16-43)."""
        from fireredtts2_tpu.runtime.checkpoint import (
            load_lm_checkpoint, load_codec_checkpoint, find_hf_whisper_dir,
            load_converted_lm, load_converted_codec,
        )
        lm_name = ("llm_pretrain" if self.gen_type == "monologue"
                   else "llm_posttrain")
        jax_lm = os.path.join(pretrained_dir, "jax", lm_name)
        jax_codec = os.path.join(pretrained_dir, "jax", "codec")
        if os.path.isdir(jax_lm) and os.path.isdir(jax_codec):
            lm = load_converted_lm(jax_lm, _dtype_of(llm_cfg.dtype))
            codec = load_converted_codec(jax_codec, _dtype_of(codec_cfg.dtype))
        else:
            lm = load_lm_checkpoint(
                os.path.join(pretrained_dir, lm_name + ".pt"), llm_cfg,
                _dtype_of(llm_cfg.dtype))
            # The frozen SSL encoder ships as an HF whisper-large-v3
            # checkout when not embedded in codec.pt (reference
            # codec/whisper.py:333).
            codec = load_codec_checkpoint(
                os.path.join(pretrained_dir, "codec.pt"), codec_cfg,
                _dtype_of(codec_cfg.dtype),
                hf_whisper_dir=find_hf_whisper_dir(pretrained_dir))
        return lm, codec

    def _apply_serving_transforms(self, lm_params, codec_params):
        """Quantization / fused-depth-kernel / mesh placement for raw
        param trees, per self.config and self.mesh. Pure w.r.t. engine
        state: safe to run on a CANDIDATE tree while serving continues on
        the current one (prepare_checkpoint)."""
        if (self.config.llm.fused_depth_plan or self.config.llm.quantize_depth
                or self.config.llm.quantize_backbone):
            from fireredtts2_tpu.models.lm.transformer import (
                quantize_transformer_int8, quantize_transformer_int4,
            )
            lm_params = dict(lm_params)
            if self.config.llm.fused_depth_plan:
                # Fused depth-chain kernel: quantizes the decoder per the
                # placement plan and installs the kernel bundle.
                from fireredtts2_tpu.ops.pallas_depth import enable_fused_depth
                lm_params = enable_fused_depth(lm_params, self.config.llm)
            elif self.config.llm.quantize_depth:
                quant = (quantize_transformer_int4
                         if self.config.llm.quantize_depth_bits == 4
                         else quantize_transformer_int8)
                lm_params["decoder"] = quant(lm_params["decoder"])
            if self.config.llm.quantize_backbone:
                lm_params["backbone"] = quantize_transformer_int8(
                    lm_params["backbone"])
        if self.config.codec.quantize_vocoder:
            from fireredtts2_tpu.models.codec.whisper_nn import (
                quantize_whisper_layers_int8,
            )
            codec_params = dict(codec_params)
            ad = dict(codec_params["acoustic_decoder"])
            ad["layers"] = quantize_whisper_layers_int8(ad["layers"])
            codec_params["acoustic_decoder"] = ad

        if self.mesh is not None:
            from fireredtts2_tpu.parallel.mesh import (
                lm_param_pspecs, codec_param_pspecs, sanitize_pspecs,
                to_named,
            )
            # Megatron-style placement for whatever tree the serving
            # transforms produced (bf16 / int8+scales / fused depth
            # bundle); sanitize_pspecs keeps device_put legal on dims the
            # hand rules can't split (tiny configs, size-1 scale dims).
            specs = sanitize_pspecs(self.mesh, lm_params,
                                    lm_param_pspecs(lm_params))
            lm_params = jax.device_put(lm_params, to_named(self.mesh, specs))
            # Codec: the whisper-style stacks (incl. the per-frame
            # vocoder) shard over tp too; convs/RVQ/norms replicate.
            cspecs = sanitize_pspecs(self.mesh, codec_params,
                                     codec_param_pspecs(codec_params))
            codec_params = jax.device_put(codec_params,
                                          to_named(self.mesh, cspecs))
        return lm_params, codec_params

    @staticmethod
    def _shape_guard(name: str, loaded, reference) -> None:
        """Loaded tree must match the running model's structure + leaf
        shapes — every compiled program is shape-keyed, so a mismatched
        checkpoint must fail HERE with a readable error, not as a stale
        jit cache miss mid-stream."""
        ld, rd = (jax.tree_util.tree_structure(loaded),
                  jax.tree_util.tree_structure(reference))
        if ld != rd:
            raise ValueError(f"reload {name} tree structure differs from "
                             f"the running model: {ld} != {rd}")
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(loaded)[0],
                jax.tree_util.tree_leaves(reference)):
            if tuple(a.shape) != tuple(b.shape):
                keys = "/".join(str(getattr(k, "key", k)) for k in path)
                raise ValueError(
                    f"reload {name} leaf {keys} has shape {tuple(a.shape)}, "
                    f"running model expects {tuple(b.shape)}")

    def prepare_checkpoint(self, pretrained_dir: str):
        """Load + transform NEW weights without touching live serving
        state (the expensive half of a hot reload — runs concurrently
        with generation). Returns the handle for apply_checkpoint.

        The dir's checkpoint must hold the SAME model shapes as the
        running engine (validated leaf by leaf against the config's
        canonical init shapes): every compiled program is reused as-is,
        only the weight buffers change. The reference has no reload at
        all — restart is its only path to new weights."""
        lm, codec = self._load_checkpoint_trees(
            pretrained_dir, self.config.llm, self.config.codec)
        ref_lm = jax.eval_shape(
            lambda: init_lm_params(jax.random.PRNGKey(0), self.config.llm,
                                   _dtype_of(self.config.llm.dtype)))
        ref_codec = jax.eval_shape(
            lambda: init_codec_params(jax.random.PRNGKey(0),
                                      self.config.codec,
                                      _dtype_of(self.config.codec.dtype)))
        self._shape_guard("LM", lm, ref_lm)
        self._shape_guard("codec", codec, ref_codec)
        return self._apply_serving_transforms(lm, codec)

    def apply_checkpoint(self, prepared) -> None:
        """Swap in weights from prepare_checkpoint. NOT safe concurrent
        with in-flight generation on OTHER threads — callers must drain
        first (ContinuousBatcher.reload does); KV caches hold activations
        of the weights that produced them. The prompt-token cache is
        cleared: RVQ tokens are a function of the codec weights."""
        lm_params, codec_params = prepared
        with self._lock:
            self.lm_params = lm_params
            self.codec_params = codec_params
            self._audio_token_cache.clear()
            # Cached KV prefixes are activations of the OLD weights (and
            # the seen-keys are hashes of old-weight codec tokens).
            self._voice_state_cache.clear()
            self._voice_ctx_seen.clear()

    def reload_checkpoint(self, pretrained_dir: str) -> None:
        """prepare + apply in one call (idle engines; serving goes through
        ContinuousBatcher.reload, which drains live streams between)."""
        self.apply_checkpoint(self.prepare_checkpoint(pretrained_dir))

    # ------------------------------------------------------------------
    # Tokenization to interleaved frames
    # ------------------------------------------------------------------

    def _new_lm_state(self, B: int, capacity: Optional[int] = None):
        """Fresh decode state, placed on the engine's mesh when sharded
        serving is on (stream slots over dp; sanitized so B=1 on a dp>1
        mesh falls back to replicated). capacity: optional position-cap
        override for bounded serving pools (runtime/batcher.py)."""
        state = init_lm_state(self.config.llm, B,
                              _dtype_of(self.config.llm.dtype),
                              capacity=capacity)
        if self.mesh is not None:
            from fireredtts2_tpu.parallel.mesh import (
                lm_state_pspecs, sanitize_pspecs, to_named,
            )
            specs = sanitize_pspecs(self.mesh, state, lm_state_pspecs(state))
            state = jax.device_put(state, to_named(self.mesh, specs))
        return state

    def _new_vstate(self, B: int, latents: Optional[int] = None):
        """Fresh streaming-vocoder state. On a mesh, slots ride dp and the
        KV slabs column-shard their merged head dim over tp (sanitized for
        shapes the mesh can't divide) — the layout the sharded vocoder
        flash kernel assumes (parallel/mesh.py:vocoder_state_pspecs)."""
        vstate = stream_decode_init(self.config.codec, B,
                                    _dtype_of(self.config.codec.dtype),
                                    latents=latents)
        if self.mesh is not None:
            from fireredtts2_tpu.parallel.mesh import (
                vocoder_state_pspecs, sanitize_pspecs, to_named,
            )
            specs = sanitize_pspecs(self.mesh, vstate,
                                    vocoder_state_pspecs(vstate))
            vstate = jax.device_put(vstate, to_named(self.mesh, specs))
        return vstate

    def _next_key(self):
        with self._lock:
            self._key, k = jax.random.split(self._key)
            return k

    def _tokenize_text_segment(self, text: str, speaker: str
                               ) -> tuple[np.ndarray, np.ndarray]:
        """-> ((T,17) tokens, (T,17) bool mask), text in the last column
        (reference fireredtts2.py:72-88)."""
        ids = self.tokenizer.encode(f"{speaker}<|text_start|>{text}<|text_end|>")
        T = len(ids)
        frame = np.zeros((T, self._ncols), np.int32)
        mask = np.zeros((T, self._ncols), bool)
        frame[:, -1] = ids
        mask[:, -1] = True
        return frame, mask

    def _tokenize_audio(self, audio16k: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Encode prompt audio to frames + EOS frame (fireredtts2.py:90-115).

        Content-hash LRU cached: a dialogue re-tokenizes its prompt
        segments for EVERY utterance, and clone requests reuse one stored
        voice — the 32-layer SSL encode is by far the dominant per-request
        cost for repeated prompts, and its tokens are deterministic
        (fp32 argmin RVQ, tests/test_parity_codec.py). `encode_calls`
        counts true encodes (cache misses) for tests + telemetry."""
        key = hashlib.sha1(
            np.ascontiguousarray(audio16k, np.float32).tobytes()).hexdigest()
        # The whole lookup-encode-insert runs under the engine lock: the
        # OrderedDict move_to_end/popitem pair is not safe under concurrent
        # mutation, and coalescing concurrent encodes of the SAME content
        # into one device pass is what the cache is for (the SSL encode is
        # the dominant per-request cost; a single chip would serialize
        # concurrent encodes at the device anyway).
        with self._lock:
            hit = self._audio_token_cache.get(key)
            if hit is not None:
                self._audio_token_cache.move_to_end(key)
                return hit
            self.encode_calls += 1
            codes, tlen = codec_encode(self.codec_params, self.config.codec,
                                       audio16k[None, :],
                                       encode_fn=self._encode_fn)
            tokens = codes[0, :, :tlen[0]]               # (nq, T)
            T = tokens.shape[1] + 1                      # +1 EOS (all-zero)
            frame = np.zeros((T, self._ncols), np.int32)
            mask = np.zeros((T, self._ncols), bool)
            frame[:T - 1, :-1] = tokens.T
            mask[:, :-1] = True                          # EOS frame is masked too
            self._audio_token_cache[key] = (frame, mask)
            while len(self._audio_token_cache) > 64:
                self._audio_token_cache.popitem(last=False)
            return frame, mask

    def encode_prompt_tokens(self, audio16k: np.ndarray
                             ) -> tuple[np.ndarray, np.ndarray]:
        """Public prompt pre-encode: (T, ncols) frames + mask for
        Segment.audio_tokens / VoiceProfile storage (serve/voices.py)."""
        return self._tokenize_audio(audio16k)

    def _tokenize_segment(self, seg: Segment) -> tuple[np.ndarray, np.ndarray]:
        tf, tm = self._tokenize_text_segment(seg.text, seg.speaker)
        if seg.audio_tokens is not None:
            af, am = seg.audio_tokens, seg.audio_tokens_mask
        else:
            af, am = self._tokenize_audio(seg.audio)
        return np.concatenate([tf, af]), np.concatenate([tm, am])

    def _build_prompt(self, context: List[Segment], text: Optional[str],
                      speaker: Optional[str]) -> tuple[np.ndarray, np.ndarray]:
        toks, msks = [], []
        for seg in context:
            t, m = self._tokenize_segment(seg)
            toks.append(t)
            msks.append(m)
        if text is not None:
            t, m = self._tokenize_text_segment(text, speaker)
            toks.append(t)
            msks.append(m)
        return np.concatenate(toks), np.concatenate(msks)

    def _bucket(self, length: int) -> int:
        for b in self.config.prefill_buckets:
            if b >= length:
                return b
        raise ValueError(
            f"prompt too long: {length} > max bucket "
            f"{self.config.prefill_buckets[-1]} (reference raises the same way, "
            f"fireredtts2.py:168-171)")

    # ------------------------------------------------------------------
    # Core AR generation
    # ------------------------------------------------------------------

    def _bucketize(self, prompt: np.ndarray, prompt_mask: np.ndarray):
        """Left-pad a prompt into its static bucket."""
        L = prompt.shape[0]
        bucket = self._bucket(L)
        pad = bucket - L
        tokens = np.zeros((1, bucket, self._ncols), np.int32)
        mask = np.zeros((1, bucket, self._ncols), bool)
        valid = np.zeros((1, bucket), bool)
        tokens[0, pad:] = prompt
        mask[0, pad:] = prompt_mask
        valid[0, pad:] = True
        return bucket, tokens, mask, valid

    def _right_pad(self, win: np.ndarray, wmask: np.ndarray):
        """Right-pad an append window into its static bucket (content
        LEFT-aligned; used with real_len — see lm_generate_frame)."""
        L = win.shape[0]
        bucket = self._bucket(L)
        tokens = np.zeros((1, bucket, self._ncols), np.int32)
        mask = np.zeros((1, bucket, self._ncols), bool)
        valid = np.zeros((1, bucket), bool)
        tokens[0, :L] = win
        mask[0, :L] = wmask
        valid[0, :L] = True
        return bucket, tokens, mask, valid

    def _context_state(self, context: List[Segment]):
        """(state_copy, pos) for this context's cached KV prefix, or None
        when the cache is disabled / there is no context.

        A context is cached on its SECOND use (one-shot prompts keep the
        plain path with zero overhead): the context segments are prefilled
        ONCE into a fresh slab at absolute positions 0..L-1 (right-padded
        window + rewind over the pad), and the slab is cached on device
        keyed by the context's token CONTENT (so identical prompts hit
        regardless of how the Segments were constructed). Hits hand out a
        deep copy — the decode programs donate their state buffers.

        Exactness class: the cached layout places context+text at
        contiguous absolute positions (vs one left-padded window in the
        uncached path); RoPE shift invariance makes GREEDY decode exact
        across the two layouts (tests/test_voice_state_cache.py), sampled
        decode same-distribution — the incremental-dialogue equivalence
        class (CLAUDE.md invariants)."""
        if self.config.voice_state_cache <= 0 or not context:
            return None
        with self._lock:   # LRU mutation + build-once coalescing
            pieces = [self._tokenize_segment(s) for s in context]
            win = np.concatenate([p[0] for p in pieces])
            wmask = np.concatenate([p[1] for p in pieces])
            L = int(win.shape[0])
            key = hashlib.sha256(win.tobytes() + wmask.tobytes()).hexdigest()
            hit = self._voice_state_cache.get(key)
            if hit is None:
                # Cache on SECOND use: a one-shot prompt takes the plain
                # left-padded path with zero overhead; only a context seen
                # again pays the one-time prefix build.
                if key not in self._voice_ctx_seen:
                    self._voice_ctx_seen[key] = True
                    self._voice_ctx_seen.move_to_end(key)
                    while len(self._voice_ctx_seen) > \
                            8 * self.config.voice_state_cache:
                        self._voice_ctx_seen.popitem(last=False)
                    return None
                self.voice_state_builds += 1
                _, tokens, mask, valid = self._right_pad(win, wmask)
                state = self._ctx_prefill_fn(
                    self.lm_params, self._new_lm_state(1),
                    jnp.asarray(tokens), jnp.asarray(mask),
                    jnp.asarray(valid), jnp.asarray([L], jnp.int32))
                state = self._rewind_fn(state, jnp.asarray([L], jnp.int32))
                hit = (state, L)
                self._voice_state_cache[key] = hit
                while len(self._voice_state_cache) > \
                        self.config.voice_state_cache:
                    self._voice_state_cache.popitem(last=False)
            else:
                self._voice_state_cache.move_to_end(key)
            return self._copy_state_fn(hit[0]), hit[1]

    def _run_ar_from(self, state, pos: int, win: np.ndarray,
                     wmask: np.ndarray, max_generation_len: int,
                     temperature: float, topk: int) -> np.ndarray:
        """Whole-utterance AR generation appended onto an existing KV
        state at absolute position pos (voice-state cache path). Same
        single-dispatch loop as _run_ar; the window holds only the NEW
        tokens (right-padded, real_len mode)."""
        L = win.shape[0]
        bucket, tokens, mask, valid = self._right_pad(win, wmask)
        if pos + bucket > self.max_seq_len:
            raise ValueError(
                f"prompt too long: {pos} + {bucket} > {self.max_seq_len}")
        # Buffer capacity stays a per-bucket static (one compiled program
        # per bucket, like _run_ar); the reachable cap is traced.
        max_frames = self.max_seq_len - bucket
        cap = min(max_generation_len, self.max_seq_len - pos - L - 1)
        state, buf, n_frames = self._gen_loop_fn(
            self.lm_params, state=state, tokens=jnp.asarray(tokens),
            tokens_mask=jnp.asarray(mask), valid=jnp.asarray(valid),
            key=self._next_key(), max_frames=max_frames,
            frame_cap=jnp.int32(cap), temperature=temperature, topk=topk,
            depth_topk=self.config.depth_topk,
            depth_temperature=self.config.depth_temperature,
            real_len=jnp.asarray([L], jnp.int32))
        n = int(n_frames[0])
        return np.asarray(buf[0, :n])

    def _run_ar(self, prompt: np.ndarray, prompt_mask: np.ndarray,
                max_generation_len: int, temperature: float, topk: int
                ) -> np.ndarray:
        """Whole-utterance AR generation as ONE device dispatch
        (lax.while_loop with on-device EOS). Returns (T, ncb) int32 frames.
        """
        bucket, tokens, mask, valid = self._bucketize(prompt, prompt_mask)
        max_frames = self.max_seq_len - bucket  # static per bucket
        cap = min(max_generation_len, max_frames)

        state = self._new_lm_state(1)
        state, buf, n_frames = self._gen_loop_fn(
            self.lm_params, state=state, tokens=jnp.asarray(tokens),
            tokens_mask=jnp.asarray(mask), valid=jnp.asarray(valid),
            key=self._next_key(), max_frames=max_frames,
            frame_cap=jnp.int32(cap), temperature=temperature, topk=topk,
            depth_topk=self.config.depth_topk,
            depth_temperature=self.config.depth_temperature)
        n = int(n_frames[0])
        return np.asarray(buf[0, :n])

    def _decode_tokens(self, gen_tokens: np.ndarray) -> np.ndarray:
        """(T, ncb) -> (n_samples,) float32 @24 kHz.

        Bucket-padded scan decode with exact streaming semantics, so padded
        tail tokens cannot pollute the emitted waveform (matches decoding
        exactly T tokens, like the reference's unpadded decode())."""
        T = gen_tokens.shape[0]
        if T == 0:
            return np.zeros((0,), np.float32)
        Lpad = ((T + 31) // 32) * 32
        toks = np.zeros((1, self._ncb, Lpad), np.int32)
        toks[0, :, :T] = gen_tokens.T
        middles, tails = self._decode_fn(self.codec_params,
                                         tokens=jnp.asarray(toks))
        acfg = self.config.codec.acoustic_decoder
        audio = assemble_chunks(np.asarray(middles), np.asarray(tails), T,
                                acfg.hop_length, acfg.n_fft)
        return audio[0].astype(np.float32)

    # ------------------------------------------------------------------
    # Public API (parity with reference fireredtts2.py)
    # ------------------------------------------------------------------

    def prepare_prompt(self, text: str, speaker: str, audio_path: str) -> Segment:
        return Segment(speaker=speaker, text=text,
                       audio=load_prompt_audio_16k(audio_path))

    def warmup(self, buckets: Optional[tuple[int, ...]] = None,
               stream_blocks: bool = True) -> float:
        """Pre-compile the serving-critical programs (prefill per bucket,
        decode loop, stream blocks, vocoder) so the first real request
        doesn't pay cold-compile latency. Returns seconds spent."""
        t0 = time.perf_counter()
        buckets = buckets or self.config.prefill_buckets
        ncols = self._ncols
        for bucket in buckets:
            max_frames = self.max_seq_len - bucket
            tokens = np.zeros((1, bucket, ncols), np.int32)
            mask = np.zeros((1, bucket, ncols), bool)
            mask[:, :, -1] = True
            valid = np.ones((1, bucket), bool)
            state = self._new_lm_state(1)
            # compile the whole-utterance loop with a tiny cap
            self._gen_loop_fn(
                self.lm_params, state=state, tokens=jnp.asarray(tokens),
                tokens_mask=jnp.asarray(mask), valid=jnp.asarray(valid),
                key=jax.random.PRNGKey(0), max_frames=max_frames,
                frame_cap=jnp.int32(1), temperature=0.9, topk=20,
                depth_topk=self.config.depth_topk,
                depth_temperature=self.config.depth_temperature)
        if stream_blocks:
            # one short stream compiles prefill(+smallest bucket), the block
            # sizes up to the cap, and the vocoder variants
            list(self.generate_stream("warm up", "[S1]", [],
                                      max_audio_length_ms=30 * 80))
        return time.perf_counter() - t0

    def generate_batch(self, texts: List[str], speakers: List[str],
                       contexts: Optional[List[List[Segment]]] = None,
                       max_audio_length_ms: float = 30_000,
                       temperature: float = 0.9, topk: int = 20
                       ) -> list[np.ndarray]:
        """Batched offline synthesis: N independent utterances decode
        TOGETHER in one device program (shared bucket, per-stream EOS).
        A capability the reference lacks entirely (batch_size is hardcoded
        to 1 there, fireredtts2.py:43).

        Returns a list of (n_i,) float32 waveforms @24 kHz.
        """
        assert len(texts) == len(speakers)
        contexts = contexts or [[] for _ in texts]
        prompts = [self._build_prompt(c, t, s)
                   for c, t, s in zip(contexts, texts, speakers)]
        bucket = self._bucket(max(p.shape[0] for p, _ in prompts))
        B = len(texts)
        tokens = np.zeros((B, bucket, self._ncols), np.int32)
        mask = np.zeros((B, bucket, self._ncols), bool)
        valid = np.zeros((B, bucket), bool)
        for i, (p, m) in enumerate(prompts):
            pad = bucket - p.shape[0]
            tokens[i, pad:] = p
            mask[i, pad:] = m
            valid[i, pad:] = True

        max_frames = self.max_seq_len - bucket
        cap = min(int(max_audio_length_ms / 80), max_frames)
        state = self._new_lm_state(B)
        state, buf, n_frames = self._gen_loop_fn(
            self.lm_params, state=state, tokens=jnp.asarray(tokens),
            tokens_mask=jnp.asarray(mask), valid=jnp.asarray(valid),
            key=self._next_key(), max_frames=max_frames,
            frame_cap=jnp.int32(cap), temperature=temperature, topk=topk,
            depth_topk=self.config.depth_topk,
            depth_temperature=self.config.depth_temperature)
        buf = np.asarray(buf)
        n_frames = np.asarray(n_frames)
        # Batched vocoder decode: one scan over the shared padded length,
        # per-stream assembly for each true length.
        Lmax = max(1, int(n_frames.max()))
        Lpad = ((Lmax + 31) // 32) * 32
        # vectorized fill: (B, ncb, Lpad) with frames past each stream's
        # length zeroed (no per-stream host loop; buf is zero-padded after
        # EOS already, so a mask multiply suffices)
        live = (np.arange(Lpad)[None, :] < n_frames[:, None])  # (B, Lpad)
        toks = np.zeros((B, self._ncb, Lpad), np.int32)
        T0 = min(Lpad, buf.shape[1])
        toks[:, :, :T0] = buf[:, :T0].transpose(0, 2, 1)
        toks *= live[:, None, :]
        middles, tails = self._decode_fn(self.codec_params,
                                         tokens=jnp.asarray(toks))
        middles, tails = np.asarray(middles), np.asarray(tails)
        acfg = self.config.codec.acoustic_decoder
        outs = []
        for i in range(B):
            T = int(n_frames[i])
            if T == 0:
                outs.append(np.zeros(0, np.float32))
                continue
            outs.append(assemble_chunks(
                middles[:, i:i + 1], tails[:, i:i + 1], T,
                acfg.hop_length, acfg.n_fft)[0].astype(np.float32))
        return outs

    def generate(self, text: str, speaker: str, context: List[Segment],
                 max_audio_length_ms: float = 90_000,
                 temperature: float = 0.9, topk: int = 20) -> np.ndarray:
        """One utterance conditioned on context -> (n,) float32 @24 kHz
        (reference fireredtts2.py:131-201).

        With a cached voice state for this context (_context_state), only
        the new text is prefilled — the context KV is copied from the
        per-voice cache."""
        max_len = int(max_audio_length_ms / 80)
        ctx = self._context_state(context)
        if ctx is not None:
            state, pos = ctx
            win, wmask = self._tokenize_text_segment(text, speaker)
            gen = self._run_ar_from(state, pos, win, wmask, max_len,
                                    temperature, topk)
        else:
            prompt, mask = self._build_prompt(context, text, speaker)
            gen = self._run_ar(prompt, mask, max_len, temperature, topk)
        return self._decode_tokens(gen)

    def generate_single(self, context: List[Segment], temperature: float = 0.9,
                        topk: int = 20) -> np.ndarray:
        """Monologue-clone inner call: context only, last 3 prompt frames
        dropped, max 400 frames (reference fireredtts2.py:203-257).
        Returns raw gen tokens (T, ncb)."""
        prompt, mask = self._build_prompt(context, None, None)
        prompt, mask = prompt[:-3], mask[:-3]
        return self._run_ar(prompt, mask, 400, temperature, topk)

    def generate_stream(self, text: str, speaker: str, context: List[Segment],
                        max_audio_length_ms: float = 90_000,
                        temperature: float = 0.9, topk: int = 20,
                        ) -> Iterator[np.ndarray]:
        """True streaming synthesis: yields ~80 ms float32 chunks @24 kHz.

        Implements the pipeline the reference sketched but disabled
        (fireredtts2.py:259-343): while the LM samples token t, the vocoder
        decodes token t-1, so audio flows after two frames.

        With a cached voice state for this context (_context_state), the
        first dispatch append-prefills only the new text onto a copy of
        the cached context KV.
        """
        max_len = int(max_audio_length_ms / 80)
        # Streaming utterances are bounded by the vocoder's KV slab (8
        # latents/frame; 3008 latents = 376 frames = 30 s at the stock
        # config — the reference's own per-utterance cap,
        # fireredtts2.py:383). Past it the slab write clamps (garbage
        # audio, not a device abort — ops/pallas_flash.py), so cap here.
        # Longer texts belong to generate()/generate_dialogue(), which
        # split by sentence and vocode offline without a slab limit.
        max_len = min(max_len,
                      self.config.codec.acoustic_decoder.max_stream_latents
                      // 8)
        t_start = time.perf_counter()
        self._first_packet_s = None

        ctx = self._context_state(context)
        if ctx is not None:
            state, pos = ctx
            win, wmask = self._tokenize_text_segment(text, speaker)
            L = win.shape[0]
            _, tokens, tmask, valid = self._right_pad(win, wmask)
            real_len = jnp.asarray([L], jnp.int32)
            max_len = min(max_len, self.max_seq_len - pos - L - 1)
        else:
            prompt, mask = self._build_prompt(context, text, speaker)
            bucket, tokens, tmask, valid = self._bucketize(prompt, mask)
            real_len = None
            max_len = min(max_len, self.max_seq_len - bucket)
            state = self._new_lm_state(1)
        vstate = self._new_vstate(1)

        kw = dict(temperature=temperature, topk=topk,
                  depth_topk=self.config.depth_topk,
                  depth_temperature=self.config.depth_temperature)
        utt_key = self._next_key()

        # Fused block decoding: each dispatch scans K frames of (LM step +
        # vocoder chunk) and the host makes ONE packed fetch per block —
        # the round trip no longer scales with frame count. The FIRST
        # dispatch additionally fuses the prompt prefill (saving a whole
        # round trip on the first-packet path); the schedule then grows
        # K to 8 (640 ms of audio per sync); a client-side jitter buffer
        # absorbs the block cadence. Audio equals the reference's streaming
        # exactly: middles for live frames + the closing tail captured at
        # the last live frame.
        n_emitted = 0
        g = 0                   # global index of the pending frame
        block = 1
        cs, ts = self._chunk_samples, self._tail_samples
        last_tail: Optional[np.ndarray] = None
        stop = False
        state, vstate, frame, emitted, packed = self._prefill_block_fn(
            self.lm_params, self.codec_params, state=state, vstate=vstate,
            tokens=jnp.asarray(tokens), tokens_mask=jnp.asarray(tmask),
            valid=jnp.asarray(valid), key=utt_key, block=block,
            real_len=real_len, **kw)
        while True:
            # one fetch per block; layout (B, K*cs + K*ts + K):
            # [middles | per-cut tails | eos flags | tokens]
            # (models/pipeline.py)
            pk = np.asarray(packed)[0]
            K = block
            eos = pk[K * (cs + ts): K * (cs + ts) + K] > 0.5
            n = min(int(np.argmax(eos)) if eos.any() else K, max_len - g)
            stop = n < K
            if n > 0:
                span = pk[:n * cs]
                if n_emitted == 0:
                    span = span[self._lead_samples:]
                    if self._first_packet_s is None:
                        self._first_packet_s = time.perf_counter() - t_start
                last_tail = pk[K * cs + (n - 1) * ts: K * cs + n * ts]
                n_emitted += n
                yield span.astype(np.float32)
            g += K
            # Ladder 1 -> 4 -> 16 (cap): same block sizes as the batcher's
            # policy ladder, so cold serving compiles 3 block programs
            # instead of 5 — each fused-kernel program costs minutes of
            # Mosaic compile on a cold cache.
            block = min(block * 4, self.config.stream_block_cap)
            if g >= max_len or stop:
                break
            # Power-of-2 block sizes only (a handful of compiled programs);
            # the host stops emitting at the frame cap — over-computed
            # trailing frames are discarded.
            state, vstate, frame, emitted, packed = self._block_fn(
                self.lm_params, self.codec_params, state=state, vstate=vstate,
                frame=frame, emitted=emitted, key=utt_key,
                t_base=jnp.int32(g + 1), block=block, **kw)
        if n_emitted > 0 and last_tail is not None:
            yield last_tail.astype(np.float32)

    def generate_dialogue(self, text_list: List[str],
                          prompt_wav_list: Optional[List[str]] = None,
                          prompt_text_list: Optional[List[str]] = None,
                          temperature: float = 0.9, topk: int = 20,
                          max_utterance_ms: float = 30_000,
                          incremental: bool = True) -> np.ndarray:
        """Multi-speaker dialogue -> (n,) float32 @24 kHz
        (reference fireredtts2.py:345-403).

        incremental=True (default) keeps the KV state alive across
        utterances and append-prefills only each utterance's NEW tokens —
        O(new) prefill work per utterance instead of re-prefilling the
        whole growing conversation (the reference re-prefills everything,
        fireredtts2.py:379-386). GREEDY decode matches the re-prefill path
        sample-for-sample under the dense reference attention
        (tests/test_incremental_dialogue.py — slab content/positions are
        identical); sampled decode, and greedy under the bounded
        attention (FRTTS2_BOUNDED_LM=1, opt-in — dense measured faster
        for the LM, see transformer.py), draw from the same
        distribution but absolute RoPE positions differ between the
        layouts, so fp near-tie flips are possible — the same equivalence
        class as batched-vs-B=1 (CLAUDE.md invariants). Set False for the
        exact reference-shaped path."""
        prompt_segments: list[Segment] = []
        text_list = process_text_list(text_list)
        if prompt_wav_list is not None:
            assert prompt_text_list is not None
            assert len(prompt_wav_list) == len(prompt_text_list)
            for wav, ptext in zip(prompt_wav_list, prompt_text_list):
                speaker = ptext[:4]
                assert speaker in SPEAKER_TAGS, speaker
                prompt_segments.append(self.prepare_prompt(ptext, speaker, wav))

        if incremental:
            return self._generate_dialogue_incremental(
                text_list, prompt_segments, temperature, topk,
                max_utterance_ms)

        generated: list[Segment] = []
        storage: list[np.ndarray] = []
        for text in text_list:
            speaker, utterance = text[:4], text[4:]
            assert speaker in SPEAKER_TAGS, speaker
            audio24 = self.generate(
                text=utterance, speaker=speaker,
                context=prompt_segments + generated,
                max_audio_length_ms=max_utterance_ms,
                temperature=temperature, topk=topk)
            # feed back at 16 kHz as context (fireredtts2.py:389-394)
            audio16 = resample(audio24, self.output_sample_rate, self.sample_rate)
            generated.append(Segment(speaker=speaker, text=utterance, audio=audio16))
            storage.append(audio24)
        return np.concatenate(storage) if storage else np.zeros((0,), np.float32)

    def _generate_dialogue_incremental(self, text_list: list[str],
                                       prompt_segments: list[Segment],
                                       temperature: float, topk: int,
                                       max_utterance_ms: float) -> np.ndarray:
        """KV-persistent dialogue decode.

        Per utterance i the append window holds ONLY the new tokens:
        [codec tokens of utterance i-1's audio (re-encoded at 16 kHz, the
        reference's own feedback loop) + text of utterance i]; the first
        window additionally carries the prompt segments. Windows are
        RIGHT-padded into the prefill buckets and the LM state rewinds
        over both the pad slots and the decode-era KV (the re-encoded
        audio tokens replace the sampled frames, exactly like the
        reference's rebuilt prompt), so slab content and positions match
        the re-prefill path token for token."""
        from fireredtts2_tpu.models.lm.model import rewind_lm_state

        cfg = self.config.llm
        state = self._new_lm_state(1)
        utt_cap = int(max_utterance_ms / 80)
        pos = 0
        storage: list[np.ndarray] = []
        audio_piece: Optional[tuple[np.ndarray, np.ndarray]] = None
        for i, text in enumerate(text_list):
            speaker, utterance = text[:4], text[4:]
            assert speaker in SPEAKER_TAGS, speaker
            pieces: list[tuple[np.ndarray, np.ndarray]] = []
            if i == 0:
                pieces += [self._tokenize_segment(s) for s in prompt_segments]
            elif audio_piece is not None:
                pieces.append(audio_piece)
            pieces.append(self._tokenize_text_segment(utterance, speaker))
            win = np.concatenate([p[0] for p in pieces])
            wmask = np.concatenate([p[1] for p in pieces])
            L = win.shape[0]
            bucket = self._bucket(L)
            if pos + bucket > self.max_seq_len:
                raise ValueError(
                    f"dialogue context overflow at utterance {i}: "
                    f"{pos} + {bucket} > {self.max_seq_len} (reference "
                    f"raises the same way, fireredtts2.py:166-171)")
            tokens = np.zeros((1, bucket, self._ncols), np.int32)
            mask = np.zeros((1, bucket, self._ncols), bool)
            valid = np.zeros((1, bucket), bool)
            tokens[0, :L] = win          # RIGHT-padded: content left-aligned
            mask[0, :L] = wmask
            valid[0, :L] = True

            cap = min(utt_cap, self.max_seq_len - (pos + L) - 1)
            state, buf, n_frames = self._gen_loop_fn(
                self.lm_params, state=state, tokens=jnp.asarray(tokens),
                tokens_mask=jnp.asarray(mask), valid=jnp.asarray(valid),
                key=self._next_key(), max_frames=utt_cap,
                frame_cap=jnp.int32(cap), temperature=temperature, topk=topk,
                depth_topk=self.config.depth_topk,
                depth_temperature=self.config.depth_temperature,
                real_len=jnp.asarray([L], jnp.int32))
            n = int(np.asarray(n_frames)[0])
            audio24 = self._decode_tokens(np.asarray(buf[0, :n]))
            storage.append(audio24)

            # Rewind over the decode-era KV; the next window re-appends the
            # utterance as RE-ENCODED codec tokens (feedback parity with
            # fireredtts2.py:389-394).
            pos += L
            state = self._rewind_fn(state, jnp.asarray([pos], jnp.int32))
            audio16 = resample(audio24, self.output_sample_rate,
                               self.sample_rate)
            audio_piece = self._tokenize_audio(audio16)
        return (np.concatenate(storage) if storage
                else np.zeros((0,), np.float32))

    def generate_dialogue_stream(self, text_list: List[str],
                                 prompt_wav_list: Optional[List[str]] = None,
                                 prompt_text_list: Optional[List[str]] = None,
                                 temperature: float = 0.9, topk: int = 20,
                                 max_utterance_ms: float = 30_000,
                                 ) -> Iterator[tuple[int, np.ndarray]]:
        """STREAMING incremental dialogue: yields (utterance_index, ~80 ms
        audio chunk) pairs as each utterance decodes, with the KV state
        persisting across utterances (O(new) prefill per turn). The
        reference has no dialogue streaming at all (its streaming sketch
        was commented out, fireredtts2.py:259-343, and its dialogue path
        re-prefills everything per turn, :379-386).

        Per utterance: one fused append-prefill + first-block dispatch
        (lowest first-packet latency), then the K-frame block ladder; at
        utterance end the state rewinds over decode-era KV and the audio
        re-enters as codec tokens (the reference's own feedback loop)."""
        text_list = process_text_list(text_list)
        prompt_segments: list[Segment] = []
        if prompt_wav_list is not None:
            assert prompt_text_list is not None
            for wav, ptext in zip(prompt_wav_list, prompt_text_list):
                speaker = ptext[:4]
                assert speaker in SPEAKER_TAGS, speaker
                prompt_segments.append(self.prepare_prompt(ptext, speaker, wav))

        cfg = self.config.llm
        state = self._new_lm_state(1)
        # Same vocoder-slab bound as generate_stream: every utterance
        # streams through a fresh vstate whose KV slab holds
        # max_stream_latents/8 frames; past that the slab write clamps
        # over live rows (garbage audio). max_utterance_ms is
        # client-controlled on the WS dialogue path, so cap it here too.
        # (_generate_dialogue_incremental needs no cap: it vocodes
        # offline, without the streaming slab.)
        utt_cap = min(int(max_utterance_ms / 80),
                      self.config.codec.acoustic_decoder.max_stream_latents
                      // 8)
        pos = 0
        self._first_packet_s = None
        t_start = time.perf_counter()
        audio_piece: Optional[tuple[np.ndarray, np.ndarray]] = None
        cs, ts = self._chunk_samples, self._tail_samples
        kw = dict(temperature=temperature, topk=topk,
                  depth_topk=self.config.depth_topk,
                  depth_temperature=self.config.depth_temperature)

        for i, text in enumerate(text_list):
            speaker, utterance = text[:4], text[4:]
            assert speaker in SPEAKER_TAGS, speaker
            pieces: list[tuple[np.ndarray, np.ndarray]] = []
            if i == 0:
                pieces += [self._tokenize_segment(s) for s in prompt_segments]
            elif audio_piece is not None:
                pieces.append(audio_piece)
            pieces.append(self._tokenize_text_segment(utterance, speaker))
            win = np.concatenate([p[0] for p in pieces])
            wmask = np.concatenate([p[1] for p in pieces])
            L = win.shape[0]
            bucket = self._bucket(L)
            if pos + bucket > self.max_seq_len:
                raise ValueError(
                    f"dialogue context overflow at utterance {i}: "
                    f"{pos} + {bucket} > {self.max_seq_len}")
            tokens = np.zeros((1, bucket, self._ncols), np.int32)
            mask = np.zeros((1, bucket, self._ncols), bool)
            valid = np.zeros((1, bucket), bool)
            tokens[0, :L], mask[0, :L] = win, wmask
            valid[0, :L] = True

            max_len = min(utt_cap, self.max_seq_len - (pos + L) - 1)
            vstate = self._new_vstate(1)
            utt_key = self._next_key()
            utt_chunks: list[np.ndarray] = []
            n_emitted, g, block = 0, 0, 1
            last_tail: Optional[np.ndarray] = None
            state, vstate, frame, emitted, packed = self._prefill_block_fn(
                self.lm_params, self.codec_params, state=state, vstate=vstate,
                tokens=jnp.asarray(tokens), tokens_mask=jnp.asarray(mask),
                valid=jnp.asarray(valid), key=utt_key, block=block,
                real_len=jnp.asarray([L], jnp.int32), **kw)
            while True:
                pk = np.asarray(packed)[0]
                K = block
                eos = pk[K * (cs + ts): K * (cs + ts) + K] > 0.5
                n = min(int(np.argmax(eos)) if eos.any() else K, max_len - g)
                stop = n < K
                if n > 0:
                    span = pk[:n * cs]
                    if n_emitted == 0:
                        span = span[self._lead_samples:]
                        if self._first_packet_s is None:
                            self._first_packet_s = \
                                time.perf_counter() - t_start
                    last_tail = pk[K * cs + (n - 1) * ts: K * cs + n * ts]
                    n_emitted += n
                    chunk = span.astype(np.float32)
                    utt_chunks.append(chunk)
                    yield i, chunk
                g += K
                block = min(block * 4, self.config.stream_block_cap)
                if g >= max_len or stop:
                    break
                state, vstate, frame, emitted, packed = self._block_fn(
                    self.lm_params, self.codec_params, state=state,
                    vstate=vstate, frame=frame, emitted=emitted, key=utt_key,
                    t_base=jnp.int32(g + 1), block=block, **kw)
            if n_emitted > 0 and last_tail is not None:
                tail = last_tail.astype(np.float32)
                utt_chunks.append(tail)
                yield i, tail

            # close the utterance: rewind over decode KV, feed the audio
            # back as codec tokens for the next window
            pos += L
            state = self._rewind_fn(state, jnp.asarray([pos], jnp.int32))
            if i + 1 < len(text_list):
                audio24 = (np.concatenate(utt_chunks) if utt_chunks
                           else np.zeros(0, np.float32))
                audio16 = resample(audio24, self.output_sample_rate,
                                   self.sample_rate)
                audio_piece = self._tokenize_audio(audio16)

    def generate_monologue(self, text: str, prompt_wav: Optional[str] = None,
                           prompt_text: Optional[str] = None,
                           temperature: float = 0.75, topk: int = 20,
                           prompt_tokens: Optional[tuple] = None) -> np.ndarray:
        """Long-form monologue, optional voice clone
        (reference fireredtts2.py:405-459).

        prompt_tokens: optional pre-encoded (frames, mask) for the clone
        prompt (encode_prompt_tokens / VoiceProfile store) — skips the SSL
        encode AND the wav load entirely; prompt_wav may then be None."""
        if prompt_wav is not None or prompt_tokens is not None:
            assert prompt_text is not None
            prompt_text = clean_text(prompt_text)
            text = clean_text(text)
            prompt_audio = (np.zeros(0, np.float32) if prompt_wav is None
                            else load_prompt_audio_16k(prompt_wav))
            pt_frames, pt_mask = (prompt_tokens if prompt_tokens is not None
                                  else (None, None))
            pieces: list[np.ndarray] = []
            for chunk in split_text(text, 400):
                chunk = clean_text(chunk)
                merged = prompt_text[:-1] + "," + chunk  # (fireredtts2.py:424)
                prompt_seg = Segment(
                    speaker="[S1]", text=merged, audio=prompt_audio,
                    audio_tokens=pt_frames, audio_tokens_mask=pt_mask)
                # retry until >18 frames (fireredtts2.py:431-439)
                for _ in range(8):
                    gen = self.generate_single([prompt_seg], temperature, topk)
                    if gen.shape[0] > 18:
                        break
                gen = gen[2:]  # trim leading silence (fireredtts2.py:440)
                pieces.append(self._decode_tokens(gen))
            return np.concatenate(pieces) if pieces else np.zeros((0,), np.float32)
        text = clean_text(text.strip())
        return self.generate(text=text, speaker="[S1]", context=[],
                             max_audio_length_ms=30_000,
                             temperature=temperature, topk=topk)
