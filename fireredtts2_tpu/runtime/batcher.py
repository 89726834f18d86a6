"""Continuous batching: many concurrent TTS streams on one chip.

The reference serves one request at a time on one GPU worker
(enhanced_fireredtts2.py worker thread; `max_concurrent_streams: 10` is
aspirational — SURVEY.md §3.6). Here decode really is batched:

- a fixed pool of B stream slots shares ONE batched LM decode step and ONE
  batched vocoder step per 80 ms frame — static shapes, compiled once;
- new requests are admitted by prefilling their prompts into free slots —
  a whole BURST in one batched dispatch
  (models/lm/model.py:prefill_into_slots) — while other slots keep decoding;
- per-slot EOS (all-zero frame) frees the slot; per-slot `is_first` handles
  each stream's vocoder warmup inside the shared step
  (models/codec/decoder.py:stream_decode_step_batched);
- per-slot temperatures AND top-k ride traced (B,) vectors (dynamic top-k
  filter, ops/sampling.py:topk_filter_dynamic), so every request keeps its
  own sampling config inside ONE compiled step — parity with the reference
  honoring caller topk per request (fireredtts2/fireredtts2.py:131-143).

The host loop runs in one worker thread (a single chip is one compute
stream); clients consume per-stream chunk queues.
"""

from __future__ import annotations

import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import EngineConfig
from fireredtts2_tpu.models.lm.model import (
    init_lm_state, prefill_into_slots, prefill_into_slot_prefix,
    reset_lm_slots, slot_kv_prefix,
)
from fireredtts2_tpu.models.codec.decoder import reset_vocoder_slots
from fireredtts2_tpu.models.codec.model import stream_decode_init


@dataclass
class StreamHandle:
    """Client-side view of one stream: a queue of audio chunks (float32
    @24 kHz); None terminates the stream."""
    request_id: str
    chunks: "queue.Queue[Optional[np.ndarray]]" = field(
        default_factory=lambda: queue.Queue(maxsize=256))
    # Token mode (collect_tokens submits): the raw LM frames land here at
    # completion as (T, ncb) int32 and no audio chunks are emitted — the
    # batched clone path trims tokens BEFORE vocoding, like the reference
    # (fireredtts2.py:431-440).
    tokens: Optional[np.ndarray] = None
    first_packet_s: Optional[float] = None
    # Dialogue mode (run_dialogue submits with keep_kv): at completion the
    # worker extracts the slot's context+window KV rows as a (pk, pv,
    # plen, P) prefix — the next utterance admits FROM it (O(new) prefill
    # per turn, the engine's incremental-dialogue layout). Set before the
    # terminating None, so it is visible once iteration ends.
    kv_prefix: Optional[tuple] = None
    # Production-side accounting (set by the batcher, independent of how
    # fast the client drains the queue): wall seconds submit -> last chunk
    # PRODUCED, and total samples produced. Per-stream realtime factor for
    # serving telemetry is (samples / 24_000) / finished_s.
    finished_s: Optional[float] = None
    samples: int = 0
    error: Optional[Exception] = None

    def __iter__(self):
        while True:
            c = self.chunks.get()
            if c is None:
                if self.error is not None:
                    raise self.error
                return
            yield c


@dataclass
class _Slot:
    active: bool = False
    handle: Optional[StreamHandle] = None
    frames_done: int = 0
    max_frames: int = 0
    started: float = 0.0
    last_tail: Optional[np.ndarray] = None
    collect_tokens: bool = False
    token_rows: Optional[list] = None
    keep_kv: bool = False
    base_len: int = 0        # plen + window real_len (prefix rows to keep)


@dataclass
class _Pending:
    handle: StreamHandle
    tokens: np.ndarray       # (1, S, C+1) bucketed
    mask: np.ndarray
    valid: np.ndarray
    temperature: float
    topk: int
    max_frames: int
    collect_tokens: bool = False
    # Cached-prefix admission (submit with a repeat context): (pk, pv,
    # plen, P) device slabs + the text window's true length — the slot
    # starts from the cached context KV and append-prefills only the text.
    prefix: Optional[tuple] = None
    real_len: int = 0
    keep_kv: bool = False    # dialogue turns: extract the KV prefix at EOS


def voc_latent_capacity(ac_cfg, max_frames_cap: int) -> int:
    """Latent rows the pool's vocoder slab allocates for a frame cap:
    8 latents/frame, rounded up to the 16-latent block quantum, bounded by
    the stock slab. bench.py's B=32 memory gate imports THIS helper so the
    analytic estimate can never drift from the real allocation (a drifted
    estimate re-opens the predictable-OOM respawn loop, VERDICT r3 #1)."""
    return min(-(-8 * max_frames_cap // 16) * 16, ac_cfg.max_stream_latents)


class ContinuousBatcher:
    """Batched multi-stream decoder over a shared engine's params."""

    def __init__(self, engine, max_streams: int = 16, topk: int = 20,
                 policy=None, warmup_blocks: Optional[bool] = None,
                 seq_capacity: Optional[int] = None,
                 max_frames_cap: Optional[int] = None):
        """seq_capacity / max_frames_cap define this pool's CAPACITY CLASS
        (VERDICT r3 #4 — 32 full 3100-slot slabs genuinely exceed a v5e's
        16 GB):

        - seq_capacity: LM KV positions per slot (prompt bucket + frames),
          default the engine's max_seq_len (3100). A pool serving bounded
          utterances (the serving norm: the reference caps dialogue turns
          at 30 s = 375 frames, fireredtts2.py:383) can run e.g. 1024.
        - max_frames_cap: generated frames per utterance; sizes the
          vocoder KV slab at 8 latents/frame. Default: the per-utterance
          30 s cap (376 frames -> the stock 3008-latent slab).

        Slab HBM scales linearly with both, so a 32-slot pool at
        (1024, 128) costs ~1/6 the slab memory of 32 full-capacity slots —
        and the dense fallback attention reads shrink the same way.
        submit() rejects requests that don't fit the class.
        """
        self.engine = engine
        self.B = max_streams
        self.default_topk = topk
        cfg: EngineConfig = engine.config
        self.cfg = cfg
        llm_cfg, codec_cfg = cfg.llm, cfg.codec
        import jax.numpy as jnp  # local alias for dtypes
        lm_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[llm_cfg.dtype]
        vo_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[codec_cfg.dtype]
        self.seq_capacity = min(seq_capacity or llm_cfg.max_seq_len,
                                llm_cfg.max_seq_len)
        stock_frames = codec_cfg.acoustic_decoder.max_stream_latents // 8
        self.max_frames_cap = min(max_frames_cap or stock_frames,
                                  stock_frames, self.seq_capacity - 1)
        voc_latents = voc_latent_capacity(codec_cfg.acoustic_decoder,
                                          self.max_frames_cap)

        # Engine helpers place states on the engine's mesh when sharded
        # serving is on (B stream slots ride the dp axis).
        self.lm_state = (engine._new_lm_state(self.B, capacity=self.seq_capacity)
                         if hasattr(engine, "_new_lm_state")
                         else init_lm_state(llm_cfg, self.B, lm_dtype,
                                            capacity=self.seq_capacity))
        self.vo_state = (engine._new_vstate(self.B, latents=voc_latents)
                         if hasattr(engine, "_new_vstate")
                         else stream_decode_init(codec_cfg, self.B, vo_dtype,
                                                 latents=voc_latents))
        self.frames = jnp.zeros((self.B, llm_cfg.audio_num_codebooks), jnp.int32)
        self.temps = np.full((self.B,), cfg.default_temperature, np.float32)
        self.topks = np.full((self.B,), topk, np.int32)

        self.slots = [_Slot() for _ in range(self.B)]
        self.pending: "queue.Queue[_Pending]" = queue.Queue()
        self._step_count = 0
        self._stop = threading.Event()
        self._dead: Optional[Exception] = None  # set if the worker crashed
        self._lock = threading.Lock()
        # Hot reload (reload()): while set, pending requests stay queued
        # instead of being admitted, so live slots drain naturally.
        self._admit_paused = threading.Event()
        self._reload_lock = threading.Lock()

        # ---- jitted programs ----
        # Fused K-frame blocks (models/pipeline.py): one dispatch + one
        # packed fetch per K frames across ALL slots — the host round trip
        # amortizes over streams AND frames.
        from fireredtts2_tpu.models.pipeline import stream_block

        self._block = jax.jit(
            partial(stream_block, llm_cfg=llm_cfg, codec_cfg=codec_cfg,
                    depth_topk=cfg.depth_topk,
                    depth_temperature=cfg.depth_temperature),
            static_argnames=("block",),
            donate_argnames=("state", "vstate"))
        self._prefill_slots = jax.jit(
            partial(prefill_into_slots, cfg=llm_cfg,
                    depth_topk=cfg.depth_topk,
                    depth_temperature=cfg.depth_temperature),
            donate_argnames=("state",))
        # Cached-prefix admission (one compiled program per (P, bucket)):
        # the slot starts from a cached context KV slab and append-prefills
        # only the new text (engine voice-state cache, batched).
        self._prefill_prefix = jax.jit(
            partial(prefill_into_slot_prefix, cfg=llm_cfg,
                    depth_topk=cfg.depth_topk,
                    depth_temperature=cfg.depth_temperature),
            donate_argnames=("state",))
        from collections import OrderedDict
        self._prefix_cache: "OrderedDict[str, tuple]" = OrderedDict()
        # Slot KV-prefix extraction for dialogue turns (one compiled
        # program per 128-aligned P; reads the live state, no donation).
        self._slice_prefix = jax.jit(slot_kv_prefix, static_argnames=("P",))
        self._reset_lm = jax.jit(reset_lm_slots, donate_argnames=("state",))
        self._reset_vo = jax.jit(reset_vocoder_slots, donate_argnames=("state",))
        self.emitted = jnp.zeros((self.B,), jnp.int32)
        self._cs = 8 * codec_cfg.acoustic_decoder.hop_length
        self._ts = (codec_cfg.acoustic_decoder.n_fft
                    - codec_cfg.acoustic_decoder.hop_length) // 2
        self.block_frames = 4  # 320 ms of audio per device round trip
        # Adaptive block sizing (runtime/policy.py): picks K from a small
        # ladder using measured RTT/frame-cost; ladder is intentionally
        # tiny so the compiled-program surface stays warmable.
        if policy is None:
            from fireredtts2_tpu.runtime.policy import (
                AdaptiveBlockPolicy, BlockPolicyConfig)
            policy = AdaptiveBlockPolicy(BlockPolicyConfig(
                ladder=(1, 4, 16), start_block=self.block_frames))
        self.policy = policy
        self.chunk_drops = 0
        # Host-cost attribution (PERF.md round 2: past 8 streams the
        # bottleneck was HOST-side, not the device step). Cumulative
        # seconds split by phase: dispatch (trace+enqueue of the block
        # program, async), fetch (np.asarray of the packed block — tunnel
        # transfer + any wait for the device), fanout (pure numpy slicing
        # + queue puts). host_stats() reports per-frame ms.
        self._host = {"blocks": 0, "frames": 0, "dispatch_s": 0.0,
                      "fetch_s": 0.0, "fanout_s": 0.0}
        # Event timeline for latency forensics (ws_load --timeline): one
        # entry per admission and per block, host-clock relative seconds.
        # Admission host cost is dispatch-only (prefill is async); a slow
        # first block AFTER an admit shows up as that block's wall.
        from collections import deque
        self._tl_t0 = time.perf_counter()
        self.timeline: "deque[dict]" = deque(maxlen=256)

        # Block-ladder warmup (default: on when a real accelerator backend
        # is live, off on CPU where tests construct many batchers): the
        # policy may pick ANY ladder K mid-serving — e.g. throughput-mode
        # jumps straight to the largest K — and an XLA compile inside a
        # live dispatch stalls every active stream for the compile's
        # duration (measured 2026-08-18: bench batched8 dispatch
        # 299 ms/frame with the K=16 block program compiling inside the
        # timed window). The worker compiles one block per ladder K before
        # admitting anything; wait_ready() lets benchmarks exclude it.
        self._warmup_blocks_on = (jax.default_backend() != "cpu"
                                  if warmup_blocks is None else warmup_blocks)
        self._ready = threading.Event()
        self._key = jax.random.PRNGKey(int(time.time()) & 0xFFFF)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._lead = (codec_cfg.acoustic_decoder.n_fft
                      - codec_cfg.acoustic_decoder.hop_length) \
            - (codec_cfg.acoustic_decoder.n_fft
               - codec_cfg.acoustic_decoder.hop_length) // 2

    # ------------------------------------------------------------- API

    def start(self) -> None:
        self._worker.start()

    def wait_ready(self, timeout: Optional[float] = None) -> bool:
        """Block until the worker's block-ladder warmup is done (True) or
        timeout (False). Requests submitted before ready just queue —
        admission happens after warmup — so calling this is only needed
        when measuring latency."""
        return self._ready.wait(timeout)

    def _warmup_ladder(self) -> None:
        """Compile + run one block per ladder K the policy can choose.
        All slots are inactive here, so the dispatches are pure warmup:
        the outputs are garbage rows that admission resets (reset_lm /
        reset_vo / frames / emitted), exactly like post-EOS lanes."""
        pcfg = getattr(self.policy, "cfg", None)
        ladder = tuple(getattr(pcfg, "ladder", (self.block_frames,)))
        cadence = getattr(pcfg, "max_cadence_ms", float("inf"))
        for k in ladder:
            if k * 80.0 > cadence:
                continue  # choose() never returns K past the cadence cap
            (self.lm_state, self.vo_state, self.frames, self.emitted,
             packed) = self._block(
                self.engine.lm_params, self.engine.codec_params,
                state=self.lm_state, vstate=self.vo_state,
                frame=self.frames, emitted=self.emitted,
                key=self._next_key(), t_base=jnp.int32(0),
                block=int(k), temperature=jnp.asarray(self.temps)[:, None],
                topk=jnp.asarray(self.topks))
            np.asarray(packed)  # force execution through any relay
        # Admission-path warmup: the two prefill burst shapes (Np=1 single
        # arrival, Np=B burst) for the smallest prompt bucket, plus the
        # vectorized resets and the frames scatter — a cold prefill
        # compile measured 45 s INSIDE the first admission (2026-08-19
        # timeline: prefill_ms=45266). Larger buckets compile on first
        # use; engine.warmup() covers them when a deployment wants all.
        llm_cfg = self.cfg.llm
        S0 = min(self.cfg.prefill_buckets)
        C = llm_cfg.audio_num_codebooks + 1
        dummy = np.full((self.B,), self.B, np.int32)
        for Np in (1, self.B):
            temps = np.full((Np,), self.cfg.default_temperature, np.float32)
            topks = np.full((Np,), self.default_topk, np.int32)
            self.lm_state, frames = self._prefill_slots(
                self.engine.lm_params, state=self.lm_state,
                bs=jnp.asarray(dummy[:Np]),
                tokens=jnp.zeros((Np, S0, C), jnp.int32),
                tokens_mask=jnp.zeros((Np, S0, C), bool),
                valid=jnp.zeros((Np, S0), bool), key=self._next_key(),
                temperature=jnp.asarray(temps)[:, None],
                topk=jnp.asarray(topks))
            self.frames = self.frames.at[jnp.asarray(dummy[:Np])].set(
                frames, mode="drop")
        # Dialogue prefix-admission warmup: turn 0 of every run_dialogue
        # admits via the (P=128, smallest-bucket) prefix program and the
        # finished turn extracts with the P=128 slicer — compile both now
        # (a cold compile inside a live admission stalls every active
        # stream; prefill_ms=45266 measured in the 2026-08-19 timeline).
        # Later turns' larger P values still compile on first use. The
        # garbage this writes into slot 0 is reset at real admission,
        # like the block warmup above.
        shp = self.lm_state.cache_k.shape
        z = jnp.zeros((shp[0], 1, 128, shp[3]), self.lm_state.cache_k.dtype)
        wtok = np.zeros((1, S0, C), np.int32)
        wmask = np.zeros((1, S0, C), bool)
        wval = np.zeros((1, S0), bool)
        wmask[0, 0, -1] = wval[0, 0] = True
        self.lm_state, _ = self._prefill_prefix(
            self.engine.lm_params, state=self.lm_state, b=jnp.int32(0),
            pk=z, pv=z, plen=jnp.asarray([0], jnp.int32),
            tokens=jnp.asarray(wtok), tokens_mask=jnp.asarray(wmask),
            valid=jnp.asarray(wval), real_len=jnp.asarray([1], jnp.int32),
            key=self._next_key(),
            temperature=jnp.full((1, 1), self.cfg.default_temperature,
                                 jnp.float32),
            topk=jnp.asarray([self.default_topk], jnp.int32))
        pk, _pv = self._slice_prefix(self.lm_state, jnp.int32(0), P=128)
        np.asarray(pk[0, 0, 0, :1])  # force the slicer through the relay
        rsj = jnp.asarray(dummy)
        self.lm_state = self._reset_lm(self.lm_state, rsj)
        self.vo_state = self._reset_vo(self.vo_state, rsj)
        np.asarray(self.frames)  # force everything through the relay

    def stop(self) -> None:
        self._stop.set()
        self._worker.join(timeout=10)

    def reload(self, pretrained_dir: str, timeout_s: float = 300.0) -> None:
        """Hot-swap checkpoint weights with zero dropped requests.

        Sequence: (1) load + transform the new trees WHILE serving
        continues on the old ones (the slow half — disk + device_put);
        (2) pause admissions so live slots drain naturally (pending
        requests stay queued, mid-stream audio keeps its own weights —
        KV caches hold activations of the weights that made them);
        (3) swap the engine's param references (the block program reads
        them per dispatch, and shapes are unchanged, so every compiled
        program is reused); (4) resume admissions.

        Raises TimeoutError (and resumes on the OLD weights) if live
        streams don't finish within timeout_s. The reference has no
        reload path at all — restart is its only way to new weights.
        """
        with self._reload_lock:
            prepared = self.engine.prepare_checkpoint(pretrained_dir)
            self._admit_paused.set()
            try:
                deadline = time.monotonic() + timeout_s
                while self.active_streams:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"{self.active_streams} live stream(s) did not "
                            f"finish within {timeout_s}s; still serving the "
                            f"old weights")
                    time.sleep(0.05)
                # One loop tick of grace: a just-finished slot's in-flight
                # double-buffered block only touches host queues after
                # this, and its device output is already computed from the
                # old weights.
                time.sleep(0.1)
                self.engine.apply_checkpoint(prepared)
                self._prefix_cache.clear()   # slabs hold OLD-weight KV
            finally:
                self._admit_paused.clear()

    def _check_alive(self) -> None:
        """Fail fast on every submit path when the worker can no longer
        drain the pending queue — a dead or stopped worker would otherwise
        hang the consumer forever on handle.chunks.get()."""
        if self._dead is not None:
            raise RuntimeError("batcher worker died") from self._dead
        if self._stop.is_set():
            raise RuntimeError("batcher stopped")

    def submit(self, text: str, speaker: str = "[S1]",
               context=(), temperature: Optional[float] = None,
               topk: Optional[int] = None,
               max_audio_length_ms: float = 30_000) -> StreamHandle:
        """Enqueue a stream; returns a handle yielding audio chunks.
        temperature/topk/max_audio_length_ms are honored PER REQUEST even
        though all live requests share one compiled batched step.

        A repeat context is admitted FROM ITS CACHED KV PREFIX (the
        engine's per-voice state cache, batched: the slot starts with the
        context slab in place and only the text window prefills — O(text)
        admission instead of O(context+text); greedy-exact vs the plain
        layout by RoPE shift invariance, the voice-state-cache
        equivalence class)."""
        self._check_alive()
        context = list(context)
        pre = self._context_prefix(context) if context else None
        if pre is not None:
            pk, pv, plen, P = pre
            win, wmask = self.engine._tokenize_text_segment(text, speaker)
            bucket, tokens, tmask, valid = self.engine._right_pad(win, wmask)
            cap = self.lm_state.cache_k.shape[2]
            if plen + bucket < min(cap, self.seq_capacity):
                handle = StreamHandle(request_id=uuid.uuid4().hex)
                handle._t0 = time.perf_counter()
                max_frames = min(int(max_audio_length_ms / 80),
                                 self.seq_capacity - plen - bucket,
                                 self.max_frames_cap)
                self.pending.put(_Pending(
                    handle=handle, tokens=tokens, mask=tmask, valid=valid,
                    temperature=(temperature if temperature is not None
                                 else self.cfg.default_temperature),
                    topk=(topk if topk is not None else self.default_topk),
                    max_frames=max_frames, prefix=(pk, pv, plen, P),
                    real_len=int(win.shape[0])))
                return handle
        prompt, mask = self.engine._build_prompt(context, text, speaker)
        return self.submit_prompt(prompt, mask, temperature=temperature,
                                  topk=topk,
                                  max_audio_length_ms=max_audio_length_ms)

    def _context_prefix(self, context) -> Optional[tuple]:
        """Cached (pk, pv, plen, P) for this context, or None (first
        sighting / cache disabled / doesn't fit the pool). Delegates
        content keying, the cache-on-second-use policy, and the prefix
        build to the ENGINE's voice-state cache (engine._context_state),
        then crops the full-capacity slab to the smallest 128-aligned
        bucket >= plen so slot scatters move only the live rows."""
        import hashlib

        e = self.engine
        if getattr(e.config, "voice_state_cache", 0) <= 0:
            return None
        try:
            pieces = [e._tokenize_segment(s) for s in context]
        except Exception:  # noqa: BLE001 — fall back to the plain path
            return None
        win = np.concatenate([p[0] for p in pieces])
        wmask = np.concatenate([p[1] for p in pieces])
        key = hashlib.sha256(win.tobytes() + wmask.tobytes()).hexdigest()
        hit = self._prefix_cache.get(key)
        if hit is None:
            ctx = e._context_state(context)
            if ctx is None:
                return None
            state, plen = ctx
            # 128-aligned crop: P is only a copy length (no DMA-tile
            # constraint), and coarser alignment would reject small pools
            # outright (a 512 crop >= the tiny test pool's whole class)
            P = -(-plen // 128) * 128
            cap = self.lm_state.cache_k.shape[2]
            if P >= min(cap, self.seq_capacity):
                return None          # context alone fills the pool's class
            hit = (state.cache_k[:, :, :P], state.cache_v[:, :, :P],
                   plen, P)
            self._prefix_cache[key] = hit
            while len(self._prefix_cache) > \
                    max(4, e.config.voice_state_cache):
                self._prefix_cache.popitem(last=False)
        else:
            self._prefix_cache.move_to_end(key)
        return hit

    def submit_prompt(self, prompt: np.ndarray, mask: np.ndarray,
                      temperature: Optional[float] = None,
                      topk: Optional[int] = None,
                      max_audio_length_ms: float = 30_000,
                      collect_tokens: bool = False) -> StreamHandle:
        """Low-level submit of pre-built (S, C+1) prompt frames.

        collect_tokens: token mode — the handle emits NO audio; the raw LM
        frames land in handle.tokens at completion. Used by the batched
        clone path, which must trim tokens BEFORE vocoding to match the
        reference (fireredtts2.py:440)."""
        self._check_alive()
        bucket, tokens, tmask, valid = self.engine._bucketize(prompt, mask)
        if bucket >= self.seq_capacity:
            raise ValueError(
                f"prompt bucket {bucket} does not fit this pool's capacity "
                f"class (seq_capacity={self.seq_capacity}); use a "
                f"full-capacity batcher or shorten the context")
        max_frames = min(int(max_audio_length_ms / 80),
                         self.seq_capacity - bucket, self.max_frames_cap)
        handle = StreamHandle(request_id=uuid.uuid4().hex)
        handle._t0 = time.perf_counter()
        self.pending.put(_Pending(
            handle=handle, tokens=tokens, mask=tmask, valid=valid,
            temperature=(temperature if temperature is not None
                         else self.cfg.default_temperature),
            topk=(topk if topk is not None else self.default_topk),
            max_frames=max_frames, collect_tokens=collect_tokens))
        return handle

    def generate_monologue_clone(self, text: str, prompt_text: str,
                                 prompt_audio: Optional[np.ndarray] = None,
                                 prompt_tokens: Optional[tuple] = None,
                                 temperature: float = 0.75, topk: int = 20,
                                 max_frames: int = 400) -> np.ndarray:
        """Voice-clone monologue THROUGH the shared batched decoder
        (VERDICT r3 #3: clone requests previously bypassed the batcher and
        serialized like the reference's single worker).

        Reference semantics preserved exactly
        (fireredtts2/fireredtts2.py:405-459 via engine.generate_monologue):
        per text chunk, prompt = [merged prompt_text[:-1] + "," + chunk]
        with the last 3 prompt frames dropped; retry while the stream ends
        <= 18 frames; trim 2 leading-silence frames; THEN vocode. The LM
        decode of every chunk — and of concurrent clone requests — shares
        the pool's ONE batched block program; all chunks of this call are
        submitted at once, so they decode concurrently too. Vocoding uses
        the engine's offline bucketed decode on the trimmed tokens (the
        in-block vocode lanes of token-mode slots are discarded: audio
        before the trim point must never be emitted).

        Blocking call (worker threads are the serving norm here — the
        serve layer runs one per request): returns (n,) float32 @24 kHz.
        """
        from fireredtts2_tpu.utils.text import clean_text, split_text
        from fireredtts2_tpu.engine.engine import Segment

        e = self.engine
        prompt_text = clean_text(prompt_text)
        text = clean_text(text)
        if prompt_audio is None and prompt_tokens is None:
            raise ValueError("clone needs prompt_audio or prompt_tokens")
        audio = (np.zeros(0, np.float32) if prompt_audio is None
                 else prompt_audio)
        pt_frames, pt_mask = (prompt_tokens if prompt_tokens is not None
                              else (None, None))

        def build(chunk: str):
            merged = prompt_text[:-1] + "," + clean_text(chunk)
            seg = Segment(speaker="[S1]", text=merged, audio=audio,
                          audio_tokens=pt_frames, audio_tokens_mask=pt_mask)
            prompt, mask = e._build_prompt([seg], None, None)
            return prompt[:-3], mask[:-3]   # drop 3 (fireredtts2.py:216-217)

        chunks = split_text(text, 400) or [text]
        prompts = [build(c) for c in chunks]
        handles = [self.submit_prompt(p, m, temperature=temperature,
                                      topk=topk, collect_tokens=True,
                                      max_audio_length_ms=max_frames * 80)
                   for p, m in prompts]
        pieces: list[np.ndarray] = []
        for (p, m), h in zip(prompts, handles):
            # retry >18 frames, 8 attempts total like the engine
            # (fireredtts2.py:431-439; the reference loops unboundedly)
            for attempt in range(8):
                for _ in h:          # drain (token mode emits no audio)
                    pass
                toks = h.tokens
                if (toks is not None and toks.shape[0] > 18) or attempt == 7:
                    break
                h = self.submit_prompt(p, m, temperature=temperature,
                                       topk=topk, collect_tokens=True,
                                       max_audio_length_ms=max_frames * 80)
            toks = h.tokens if h.tokens is not None else np.zeros(
                (0, self.cfg.llm.audio_num_codebooks), np.int32)
            pieces.append(e._decode_tokens(toks[2:]))  # trim 2, then vocode
        return (np.concatenate(pieces) if pieces
                else np.zeros(0, np.float32))

    def _submit_dialogue_window(self, win: np.ndarray, wmask: np.ndarray,
                                prefix: Optional[tuple], temperature: float,
                                topk: Optional[int],
                                max_utterance_ms: float) -> StreamHandle:
        """Admit one dialogue utterance window (new tokens only) onto its
        carried KV prefix; the slot extracts the grown prefix at EOS
        (keep_kv). Utterance 0 rides a zero prefix (plen=0) so every turn
        uses the SAME contiguous-position layout (RoPE exactness across
        turns — the incremental-dialogue equivalence class)."""
        self._check_alive()
        e = self.engine
        bucket, tokens, tmask, valid = e._right_pad(win, wmask)
        if prefix is None:
            shp = self.lm_state.cache_k.shape            # (Lyr, B, T, W)
            z = jnp.zeros((shp[0], 1, 128, shp[3]),
                          self.lm_state.cache_k.dtype)
            prefix = (z, z, 0, 128)
        pk, pv, plen, P = prefix
        cap = min(self.lm_state.cache_k.shape[2], self.seq_capacity)
        if plen + bucket >= cap:
            raise ValueError(
                f"dialogue context overflow: {plen} + {bucket} >= {cap} "
                f"(pool capacity class; the reference raises the same way, "
                f"fireredtts2.py:166-171)")
        handle = StreamHandle(request_id=uuid.uuid4().hex)
        handle._t0 = time.perf_counter()
        max_frames = min(int(max_utterance_ms / 80),
                         self.seq_capacity - plen - bucket,
                         self.max_frames_cap)
        self.pending.put(_Pending(
            handle=handle, tokens=tokens, mask=tmask, valid=valid,
            temperature=(temperature if temperature is not None
                         else self.cfg.default_temperature),
            topk=(topk if topk is not None else self.default_topk),
            max_frames=max_frames, prefix=(pk, pv, plen, P),
            real_len=int(win.shape[0]), keep_kv=True))
        return handle

    def run_dialogue(self, text_list: list, prompt_wav_list=None,
                     prompt_text_list=None, prompt_segments=None,
                     temperature: float = 0.9, topk: Optional[int] = None,
                     max_utterance_ms: float = 30_000):
        """Multi-speaker incremental dialogue THROUGH the shared batched
        decoder: yields (utterance_index, ~audio chunk) pairs while the
        LM decode of every turn — and of every CONCURRENT dialogue — runs
        in the pool's ONE batched block program (VERDICT r4 #1: dialogue
        was the last thread-per-request serving path; the reference
        serializes whole dialogues on one worker,
        fireredtts2/fireredtts2.py:345-403).

        A dialogue is a sequence of per-utterance slot occupancies:
        utterance i admits a window of ONLY its new tokens ([re-encoded
        codec tokens of turn i-1's audio] + [text i]; turn 0 carries the
        prompt segments) onto the dialogue's carried KV prefix
        (prefill_into_slot_prefix), decodes in the shared block program,
        and at EOS the worker extracts the grown prefix (slot_kv_prefix)
        for the next turn — O(new) prefill per turn, the engine
        incremental path's layout exactly (contiguous absolute positions,
        audio fed back as re-encoded codec tokens,
        engine._generate_dialogue_incremental). Between turns the slot is
        FREE for other requests, so N dialogues + M streams + clones all
        share the pool.

        Blocking generator — the serve layer runs one consumer per
        dialogue session from its bounded pool (serve/server.py)."""
        from fireredtts2_tpu.utils.text import process_text_list, SPEAKER_TAGS
        from fireredtts2_tpu.utils.audio_io import resample

        e = self.engine
        text_list = process_text_list(list(text_list))
        segs = list(prompt_segments) if prompt_segments else []
        if prompt_wav_list is not None:
            assert prompt_text_list is not None
            assert len(prompt_wav_list) == len(prompt_text_list)
            for wav, ptext in zip(prompt_wav_list, prompt_text_list):
                speaker = ptext[:4]
                assert speaker in SPEAKER_TAGS, speaker
                segs.append(e.prepare_prompt(ptext, speaker, wav))

        prefix: Optional[tuple] = None
        audio_piece: Optional[tuple] = None
        for i, text in enumerate(text_list):
            speaker, utterance = text[:4], text[4:]
            assert speaker in SPEAKER_TAGS, speaker
            pieces: list[tuple[np.ndarray, np.ndarray]] = []
            if i == 0:
                if segs:
                    # Repeat voice sets admit turn 0 from the cached KV
                    # prefix (_context_prefix — the engine voice-state
                    # cache, cache-on-second-use): the speaker prompts
                    # prefill once per VOICE SET, not once per dialogue
                    # session. Both layouts place rows at contiguous
                    # absolute positions from 0, so this stays in the
                    # prefix-layout equivalence class
                    # (tests/test_clone_batched.py:
                    # test_context_prefix_admission).
                    prefix = self._context_prefix(segs)
                    if prefix is None:
                        pieces += [e._tokenize_segment(s) for s in segs]
            elif audio_piece is not None:
                pieces.append(audio_piece)
            pieces.append(e._tokenize_text_segment(utterance, speaker))
            win = np.concatenate([p[0] for p in pieces])
            wmask = np.concatenate([p[1] for p in pieces])
            handle = self._submit_dialogue_window(
                win, wmask, prefix, temperature, topk, max_utterance_ms)
            chunks: list[np.ndarray] = []
            for c in handle:         # raises on worker death
                chunks.append(c)
                yield i, c
            prefix = handle.kv_prefix
            if prefix is None:       # worker stopped before EOS
                return
            if i + 1 < len(text_list):
                audio24 = (np.concatenate(chunks) if chunks
                           else np.zeros(0, np.float32))
                audio16 = resample(audio24, e.output_sample_rate,
                                   e.sample_rate)
                audio_piece = e._tokenize_audio(audio16)

    @property
    def active_streams(self) -> int:
        with self._lock:
            return sum(s.active for s in self.slots)

    # ------------------------------------------------------------- loop

    def _admit(self) -> None:
        """Admit ALL pending requests that fit in free slots with ONE
        batched prefill dispatch (burst arrivals cost one program, not N —
        prompts are padded to the widest bucket in the burst; extra left
        padding is exact thanks to RoPE shift invariance + slot_valid)."""
        if self._admit_paused.is_set():
            return
        free = [i for i, s in enumerate(self.slots) if not s.active]
        reqs: list[_Pending] = []
        slot_ids: list[int] = []
        while free and not self.pending.empty():
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            reqs.append(req)
            slot_ids.append(free.pop())
        if not reqs:
            return
        t_admit = time.perf_counter()

        # ONE vectorized reset dispatch per state (not one per slot: each
        # eager dispatch costs a ~55 ms tunnel RTT — 16 of them was 886 ms
        # of pure RTT per admission burst, 2026-08-19 timeline). Fixed
        # (B,) shape padded with out-of-range B → one compiled program.
        rs = np.full((self.B,), self.B, np.int32)
        rs[:len(slot_ids)] = slot_ids
        rsj = jnp.asarray(rs)
        self.lm_state = self._reset_lm(self.lm_state, rsj)
        self.vo_state = self._reset_vo(self.vo_state, rsj)
        t_reset = time.perf_counter()

        plain = [(r, b) for r, b in zip(reqs, slot_ids) if r.prefix is None]
        prefixed = [(r, b) for r, b in zip(reqs, slot_ids)
                    if r.prefix is not None]

        # Pad the burst to one of TWO static row counts (1 for the common
        # single arrival, B for any burst) so exactly two prefill programs
        # exist per bucket — deterministic compile surface, no first-burst
        # compile stall at a new size. Dummy rows scatter to out-of-range
        # slot B and are dropped.
        t_pack = t_disp = t_reset
        if plain:
            N = len(plain)
            Np = 1 if N == 1 else self.B
            S = max(r.tokens.shape[1] for r, _ in plain)
            C = plain[0][0].tokens.shape[2]
            tokens = np.zeros((Np, S, C), np.int32)
            mask = np.zeros((Np, S, C), bool)
            valid = np.zeros((Np, S), bool)
            temps = np.full((Np,), self.cfg.default_temperature, np.float32)
            topks = np.full((Np,), self.default_topk, np.int32)
            bs = np.full((Np,), self.B, np.int32)
            for i, (req, slot_id) in enumerate(plain):
                s = req.tokens.shape[1]
                tokens[i, S - s:] = req.tokens[0]
                mask[i, S - s:] = req.mask[0]
                valid[i, S - s:] = req.valid[0]
                temps[i] = req.temperature
                topks[i] = req.topk
                bs[i] = slot_id
            t_pack = time.perf_counter()
            self.lm_state, frames = self._prefill_slots(
                self.engine.lm_params, state=self.lm_state,
                bs=jnp.asarray(bs),
                tokens=jnp.asarray(tokens), tokens_mask=jnp.asarray(mask),
                valid=jnp.asarray(valid), key=self._next_key(),
                temperature=jnp.asarray(temps)[:, None],
                topk=jnp.asarray(topks))
            t_disp = time.perf_counter()
            # Fixed-shape scatter (full Np rows, dummies drop at index B):
            # a bs[:N]-shaped update would compile a NEW program per
            # distinct burst size MID-SERVING (~2.3 s each through the
            # tunnel, measured update_ms in the admission timeline).
            self.frames = self.frames.at[jnp.asarray(bs)].set(frames,
                                                              mode="drop")
        # Cached-prefix admissions: one dispatch each (the text window
        # append-prefills onto the copied context slab; programs key on
        # the (P, bucket) shape pair).
        for req, slot_id in prefixed:
            pk, pv, plen, _P = req.prefix
            self.lm_state, frame = self._prefill_prefix(
                self.engine.lm_params, state=self.lm_state,
                b=jnp.int32(slot_id), pk=pk, pv=pv,
                plen=jnp.asarray([plen], jnp.int32),
                tokens=jnp.asarray(req.tokens),
                tokens_mask=jnp.asarray(req.mask),
                valid=jnp.asarray(req.valid),
                real_len=jnp.asarray([req.real_len], jnp.int32),
                key=self._next_key(),
                # arrays, not python scalars: a scalar would bake into the
                # compiled program and recompile per distinct value
                temperature=jnp.full((1, 1), req.temperature, jnp.float32),
                topk=jnp.asarray([req.topk], jnp.int32))
            self.frames = self.frames.at[slot_id].set(frame[0])
        now = time.perf_counter()
        self.timeline.append({
            "t": round(now - self._tl_t0, 4), "ev": "admit", "n": len(reqs),
            "S": max(r.tokens.shape[1] for r in reqs),
            "n_prefix": len(prefixed),
            "host_ms": round((now - t_admit) * 1e3, 2),
            # phase attribution: reset = eager per-slot state resets,
            # prefill = the _prefill_slots dispatch (async unless the
            # runtime blocks), update = the frames scatter + any prefix
            # admissions
            "reset_ms": round((t_reset - t_admit) * 1e3, 1),
            "prefill_ms": round((t_disp - t_pack) * 1e3, 1),
            "update_ms": round((now - t_disp) * 1e3, 1)})
        for i, req in enumerate(reqs):
            b = slot_ids[i]
            self.emitted = self.emitted.at[b].set(0)
            self.temps[b] = req.temperature
            self.topks[b] = req.topk
            slot = self.slots[b]
            slot.active = True
            slot.handle = req.handle
            slot.frames_done = 0
            slot.max_frames = req.max_frames
            slot.started = now
            slot.last_tail = None
            slot.collect_tokens = req.collect_tokens
            slot.token_rows = [] if req.collect_tokens else None
            slot.keep_kv = req.keep_kv
            slot.base_len = ((req.prefix[2] if req.prefix is not None else 0)
                             + req.real_len)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _finish(self, b: int) -> None:
        slot = self.slots[b]
        if slot.handle is not None:
            if slot.keep_kv and slot.base_len > 0:
                # Dialogue turn done: hand the slot's context+window KV
                # rows to the driver BEFORE the terminating None (queue
                # ordering publishes it). Safe vs the double-buffered
                # in-flight block: decode only WRITES at cur_pos >=
                # base_len, and this slot can't have been re-admitted yet
                # (it frees only below). The extracted arrays are fresh jit
                # outputs — later state donation never touches them.
                P = min(-(-slot.base_len // 128) * 128,
                        self.lm_state.cache_k.shape[2])
                pk, pv = self._slice_prefix(self.lm_state, jnp.int32(b), P=P)
                slot.handle.kv_prefix = (pk, pv, slot.base_len, P)
            if slot.collect_tokens:
                rows = slot.token_rows or []
                ncb = self.cfg.llm.audio_num_codebooks
                slot.handle.tokens = (
                    np.concatenate(rows).astype(np.int32) if rows
                    else np.zeros((0, ncb), np.int32))
            elif slot.frames_done > 0 and slot.last_tail is not None:
                slot.handle.chunks.put(slot.last_tail)
                slot.handle.samples += len(slot.last_tail)
            slot.handle.finished_s = time.perf_counter() - slot.handle._t0
            slot.handle.chunks.put(None)
        slot.active = False
        slot.handle = None
        slot.collect_tokens = False
        slot.token_rows = None
        slot.keep_kv = False
        slot.base_len = 0

    def _loop(self) -> None:
        try:
            self._loop_inner()
        except Exception as e:  # fail every live + pending stream loudly
            import traceback
            traceback.print_exc()
            # submits after worker death must fail fast, not hang their
            # consumers on a queue nobody will ever feed
            self._dead = e
            for s in self.slots:
                if s.active and s.handle is not None:
                    s.handle.error = e
                    s.handle.chunks.put(None)
                    s.active = False
            while not self.pending.empty():
                try:
                    req = self.pending.get_nowait()
                    req.handle.error = e
                    req.handle.chunks.put(None)
                except queue.Empty:
                    break

    def _loop_inner(self) -> None:
        """Double-buffered block loop (VERDICT r2 #2): dispatch block k+1
        BEFORE fetching block k's packed output, so the tunnel transfer +
        numpy fan-out of block k run WHILE the device computes k+1. JAX
        dispatch is async and the device serializes in dispatch order, so
        the donated state chain stays correct; a slot that hits EOS in
        block k wastes its lanes in the already-in-flight k+1 (the host
        discards them), which is the price of never idling the chip."""
        try:
            if self._warmup_blocks_on:
                self._warmup_ladder()
        finally:
            self._ready.set()
        in_flight = None   # (packed, K, active_slots, t_dispatch)
        while not self._stop.is_set():
            self._admit()
            # Capture (slot, handle) pairs at DISPATCH time: a slot can be
            # freed by the previous block's fan-out and re-admitted before
            # this block's fan-out runs — the handle identity check keeps
            # the old stream's stale lanes away from the new stream.
            active = [(i, s.handle) for i, s in enumerate(self.slots)
                      if s.active]
            nxt = None
            if active:
                # Admission happens at block boundaries: short blocks while
                # requests are waiting (fast admission), adaptively sized
                # blocks otherwise (runtime/policy.py fits wall(K) = rtt +
                # K*frame_cost and picks the smallest realtime K).
                K = self.policy.choose(pending=not self.pending.empty(),
                                       active=len(active))
                t_block = time.perf_counter()
                (self.lm_state, self.vo_state, self.frames, self.emitted,
                 packed) = self._block(
                    self.engine.lm_params, self.engine.codec_params,
                    state=self.lm_state, vstate=self.vo_state,
                    frame=self.frames, emitted=self.emitted,
                    key=self._next_key(), t_base=jnp.int32(self._step_count),
                    block=K, temperature=jnp.asarray(self.temps)[:, None],
                    topk=jnp.asarray(self.topks))
                self._step_count += K
                self._host["dispatch_s"] += time.perf_counter() - t_block
                nxt = (packed, K, active, t_block)
            if in_flight is not None:
                self._fan_out(*in_flight)
            in_flight = nxt
            if in_flight is None:
                time.sleep(0.002)
        # Graceful stop: drain the in-flight block, then terminate every
        # still-live stream so no consumer blocks forever on its queue.
        if in_flight is not None:
            self._fan_out(*in_flight)
        for b, s in enumerate(self.slots):
            if s.active:
                self._finish(b)

    def _fan_out(self, packed, K: int, active: list, t_block: float) -> None:
        """Fetch one packed block — (B, K*cs + K*ts + K + K*ncb) =
        [middles | cut-tails | eos | token frames] per stream
        (models/pipeline.py) — and fan it out with ONE numpy slice and ONE
        queue put per stream (the per-(frame, stream) python loop was the
        host bottleneck past 8 streams, PERF.md round 2): a stream accepts
        frames up to its first EOS flag / its frame cap, as one contiguous
        audio chunk. Token-mode slots collect the token region instead of
        emitting audio."""
        cs, ts = self._cs, self._ts
        ncb = self.cfg.llm.audio_num_codebooks
        t_fetch0 = time.perf_counter()
        pk = np.asarray(packed)
        now = time.perf_counter()
        self.policy.record(K, now - t_block)
        self._host["fetch_s"] += now - t_fetch0
        self.timeline.append({
            "t": round(t_block - self._tl_t0, 4), "ev": "block", "K": K,
            "n": len(active), "wall_ms": round((now - t_block) * 1e3, 1)})
        base = K * (cs + ts)
        eos = pk[:, base:base + K] > 0.5         # (B, K)
        toks = pk[:, base + K:].reshape(-1, K, ncb)
        for b, handle in active:
            slot = self.slots[b]
            if not slot.active or slot.handle is not handle:
                continue
            hit_eos = bool(eos[b].any())
            n_eos = int(np.argmax(eos[b])) if hit_eos else K
            n = min(n_eos, slot.max_frames - slot.frames_done)
            capped = n < n_eos or slot.frames_done + n >= slot.max_frames
            if n > 0:
                if slot.collect_tokens:
                    # copy: a view would pin the whole (B, packed) block
                    # fetch alive until _finish (the audio path copies
                    # for the same reason)
                    slot.token_rows.append(toks[b, :n].copy())
                    slot.frames_done += n
                    if slot.handle.first_packet_s is None:
                        slot.handle.first_packet_s = now - slot.handle._t0
                else:
                    audio = pk[b, :n * cs]
                    if slot.frames_done == 0:
                        audio = audio[self._lead:]
                        if slot.handle.first_packet_s is None:
                            slot.handle.first_packet_s = now - slot.handle._t0
                    slot.last_tail = pk[b, K * cs + (n - 1) * ts:
                                        K * cs + n * ts]
                    slot.frames_done += n
                    try:
                        slot.handle.chunks.put_nowait(audio.copy())
                        slot.handle.samples += len(audio)
                    except queue.Full:
                        slot.handle.error = RuntimeError(
                            "client too slow; dropped")
                        self.chunk_drops += 1
                        self._finish(b)
                        continue
            if hit_eos or capped:
                self._finish(b)
        self._host["fanout_s"] += time.perf_counter() - now
        self._host["blocks"] += 1
        self._host["frames"] += K * len(active)

    def reset_host_stats(self) -> None:
        """Zero the attribution counters — call after a warmup wave so
        first-dispatch compile time doesn't pollute dispatch_ms."""
        for k in self._host:
            self._host[k] = type(self._host[k])(0)

    def host_stats(self) -> dict:
        """Per-frame host-cost breakdown in ms (phase meanings: see
        __init__). fetch includes waiting for the device when the host is
        ahead, so dispatch+fanout is the pure host overhead — the number
        that must stay under (80 ms x streams)/frame for the 16-stream
        realtime bar."""
        h = dict(self._host)
        f = max(h.pop("frames"), 1)
        out = {"blocks": h.pop("blocks"), "frames": f}
        out.update({k[:-2] + "_ms_per_frame": 1e3 * v / f
                    for k, v in h.items()})
        out["host_ms_per_frame"] = (out["dispatch_ms_per_frame"]
                                    + out["fanout_ms_per_frame"])
        return out