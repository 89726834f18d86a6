"""Continuous batching: many concurrent TTS streams on one chip.

The reference serves one request at a time on one GPU worker
(enhanced_fireredtts2.py worker thread; `max_concurrent_streams: 10` is
aspirational — SURVEY.md §3.6). Here decode really is batched:

- a fixed pool of B stream slots shares ONE batched LM decode step and ONE
  batched vocoder step per 80 ms frame — static shapes, compiled once;
- new requests are admitted by prefilling their prompt into a free slot
  (models/lm/model.py:prefill_into_slot) while other slots keep decoding;
- per-slot EOS (all-zero frame) frees the slot; per-slot `is_first` handles
  each stream's vocoder warmup inside the shared step
  (models/codec/decoder.py:stream_decode_step_batched);
- per-slot temperatures ride a traced (B,) vector; top-k is shared/static.

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
    init_lm_state, lm_generate_frame, prefill_into_slot, reset_lm_slot,
    build_step_frame,
)
from fireredtts2_tpu.models.codec.rvq import rvq_decode
from fireredtts2_tpu.models.codec.decoder import (
    upconv_forward, stream_decode_step_batched, reset_vocoder_slot,
    stream_decode_tail,
)
from fireredtts2_tpu.models.codec.model import stream_decode_init


@dataclass
class StreamHandle:
    """Client-side view of one stream: a queue of audio chunks (float32
    @24 kHz); None terminates the stream."""
    request_id: str
    chunks: "queue.Queue[Optional[np.ndarray]]" = field(
        default_factory=lambda: queue.Queue(maxsize=256))
    first_packet_s: Optional[float] = None
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


@dataclass
class _Pending:
    handle: StreamHandle
    tokens: np.ndarray       # (1, S, C+1) bucketed
    mask: np.ndarray
    valid: np.ndarray
    temperature: float
    max_frames: int


class ContinuousBatcher:
    """Batched multi-stream decoder over a shared engine's params."""

    def __init__(self, engine, max_streams: int = 16, topk: int = 20):
        self.engine = engine
        self.B = max_streams
        self.topk = topk
        cfg: EngineConfig = engine.config
        self.cfg = cfg
        llm_cfg, codec_cfg = cfg.llm, cfg.codec
        import jax.numpy as jnp  # local alias for dtypes
        lm_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[llm_cfg.dtype]
        vo_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[codec_cfg.dtype]

        self.lm_state = init_lm_state(llm_cfg, self.B, lm_dtype)
        self.vo_state = stream_decode_init(codec_cfg, self.B, vo_dtype)
        self.frames = jnp.zeros((self.B, llm_cfg.audio_num_codebooks), jnp.int32)
        self.temps = np.full((self.B,), cfg.default_temperature, np.float32)

        self.slots = [_Slot() for _ in range(self.B)]
        self.pending: "queue.Queue[_Pending]" = queue.Queue()
        self._step_count = 0
        self._stop = threading.Event()
        self._lock = threading.Lock()

        # ---- jitted programs ----
        def _batched_step(params, state, frames, key, temps):
            tokens, mask = build_step_frame(llm_cfg, frames)
            valid = jnp.ones((self.B, 1), jnp.bool_)
            state, new_frames = lm_generate_frame(
                params, llm_cfg, state, tokens, mask, valid, key,
                temps[:, None], topk,
                cfg.depth_topk, cfg.depth_temperature)
            return state, new_frames, jnp.all(new_frames == 0, axis=-1)

        self._lm_step = jax.jit(_batched_step, donate_argnames=("state",))
        self._prefill_slot = jax.jit(
            partial(prefill_into_slot, cfg=llm_cfg,
                    topk=topk, depth_topk=cfg.depth_topk,
                    depth_temperature=cfg.depth_temperature),
            donate_argnames=("state",))
        self._reset_lm = jax.jit(reset_lm_slot, donate_argnames=("state",))
        self._reset_vo = jax.jit(reset_vocoder_slot, donate_argnames=("state",))

        def _vocode(params, state, frames, is_first):
            codes = frames[:, :, None].transpose(1, 0, 2)      # (nq, B, 1)
            feats = rvq_decode(params["rvq"], codec_cfg.rvq, codes)
            up = upconv_forward(params["upsample"], codec_cfg.upsample_stride,
                                feats.astype(vo_dtype))
            return stream_decode_step_batched(
                params["acoustic_decoder"], codec_cfg.acoustic_decoder,
                up, state, is_first)

        self._vocode_step = jax.jit(_vocode, donate_argnames=("state",))
        self._tail = jax.jit(partial(stream_decode_tail,
                                     codec_cfg.acoustic_decoder))

        self._key = jax.random.PRNGKey(int(time.time()) & 0xFFFF)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._lead = (codec_cfg.acoustic_decoder.n_fft
                      - codec_cfg.acoustic_decoder.hop_length) \
            - (codec_cfg.acoustic_decoder.n_fft
               - codec_cfg.acoustic_decoder.hop_length) // 2

    # ------------------------------------------------------------- API

    def start(self) -> None:
        self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        self._worker.join(timeout=10)

    def submit(self, text: str, speaker: str = "[S1]",
               context=(), temperature: Optional[float] = None,
               max_audio_length_ms: float = 30_000) -> StreamHandle:
        """Enqueue a stream; returns a handle yielding audio chunks."""
        prompt, mask = self.engine._build_prompt(list(context), text, speaker)
        bucket, tokens, tmask, valid = self.engine._bucketize(prompt, mask)
        max_frames = min(int(max_audio_length_ms / 80),
                         self.cfg.max_seq_len - bucket)
        handle = StreamHandle(request_id=uuid.uuid4().hex)
        handle._t0 = time.perf_counter()
        self.pending.put(_Pending(
            handle=handle, tokens=tokens, mask=tmask, valid=valid,
            temperature=(temperature if temperature is not None
                         else self.cfg.default_temperature),
            max_frames=max_frames))
        return handle

    @property
    def active_streams(self) -> int:
        with self._lock:
            return sum(s.active for s in self.slots)

    # ------------------------------------------------------------- loop

    def _admit(self) -> None:
        free = [i for i, s in enumerate(self.slots) if not s.active]
        while free and not self.pending.empty():
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            b = free.pop()
            self.lm_state = self._reset_lm(self.lm_state, jnp.int32(b))
            self.vo_state = self._reset_vo(self.vo_state, jnp.int32(b))
            self.lm_state, frame = self._prefill_slot(
                self.engine.lm_params, state=self.lm_state, b=jnp.int32(b),
                tokens=jnp.asarray(req.tokens), tokens_mask=jnp.asarray(req.mask),
                valid=jnp.asarray(req.valid), key=self._next_key(),
                temperature=req.temperature)
            self.frames = self.frames.at[b].set(frame[0])
            self.temps[b] = req.temperature
            slot = self.slots[b]
            slot.active = True
            slot.handle = req.handle
            slot.frames_done = 0
            slot.max_frames = req.max_frames
            slot.started = time.perf_counter()
            slot.last_tail = None

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _finish(self, b: int) -> None:
        slot = self.slots[b]
        if slot.handle is not None:
            if slot.frames_done > 0 and slot.last_tail is not None:
                slot.handle.chunks.put(slot.last_tail)
            slot.handle.chunks.put(None)
        slot.active = False
        slot.handle = None

    def _loop(self) -> None:
        try:
            self._loop_inner()
        except Exception as e:  # fail every live + pending stream loudly
            import traceback
            traceback.print_exc()
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
        while not self._stop.is_set():
            self._admit()
            active = [i for i, s in enumerate(self.slots) if s.active]
            if not active:
                time.sleep(0.002)
                continue

            # Current frames for active slots were sampled last round (or at
            # prefill). EOS check + vocode + next LM step, batched.
            frames_host = np.asarray(self.frames)
            is_first = np.array([s.active and s.frames_done == 0
                                 for s in self.slots])
            eos = (frames_host == 0).all(axis=1)

            # retire slots whose current frame is EOS or that hit their cap
            for b in active:
                if eos[b] or self.slots[b].frames_done >= self.slots[b].max_frames:
                    self._finish(b)
            active = [i for i, s in enumerate(self.slots) if s.active]
            if not active:
                continue

            # batched vocode of current frames (speculative, never EOS here)
            middles, tails, self.vo_state = self._vocode_step(
                self.engine.codec_params, state=self.vo_state,
                frames=self.frames, is_first=jnp.asarray(is_first))
            # batched LM step -> next frames
            self.lm_state, self.frames, _ = self._lm_step(
                self.engine.lm_params, self.lm_state, self.frames,
                self._next_key(), jnp.asarray(self.temps))

            middles_h = np.asarray(middles)
            tails_h = np.asarray(tails)
            now = time.perf_counter()
            for b in active:
                slot = self.slots[b]
                chunk = middles_h[b]
                if slot.frames_done == 0:
                    chunk = chunk[self._lead:]
                    if slot.handle.first_packet_s is None:
                        slot.handle.first_packet_s = now - slot.handle._t0
                slot.last_tail = tails_h[b]
                slot.frames_done += 1
                try:
                    slot.handle.chunks.put_nowait(chunk.copy())
                except queue.Full:
                    slot.handle.error = RuntimeError("client too slow; dropped")
                    self._finish(b)