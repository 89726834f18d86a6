"""Continuous-batching tests: correctness of batched multi-stream decode
against the single-stream engine (greedy), slot reuse, staggered admission."""

import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.runtime.batcher import ContinuousBatcher


@pytest.fixture(scope="module")
def greedy_engine():
    # depth_topk=1 + topk=1 makes generation deterministic: batcher output
    # must match the single-stream engine bit-for-bit.
    cfg = tiny_engine_config(depth_topk=1)
    return FireRedTTS2Engine(config=cfg, seed=0)


@pytest.fixture(scope="module")
def batcher(greedy_engine):
    b = ContinuousBatcher(greedy_engine, max_streams=4, topk=1)
    b.start()
    yield b
    b.stop()


def _collect(handle, timeout=300):
    import queue
    chunks = []
    while True:
        c = handle.chunks.get(timeout=timeout)  # raises Empty on hang
        if c is None:
            if handle.error is not None:
                raise handle.error
            break
        chunks.append(c)
    return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)


def test_batched_stream_matches_single_engine(greedy_engine, batcher):
    text, speaker = "hello batch", "[S1]"
    want = greedy_engine.generate(text, speaker, [], max_audio_length_ms=640, topk=1)

    h = batcher.submit(text, speaker, max_audio_length_ms=640)
    got = _collect(h)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)
    assert h.first_packet_s is not None and h.first_packet_s > 0


def test_concurrent_streams_are_independent(greedy_engine):
    """Slot independence: identical texts in different slots of the SAME
    batch must produce identical audio (matmul rows are independent and
    greedy ignores RNG); a different text must produce different audio.

    NOTE: batched-vs-B=1 bitwise equality is intentionally NOT asserted
    here — batch-size-dependent matmul tiling can flip near-tie greedy
    argmaxes, as in any batched serving system (the B=1-active case is
    covered by test_batched_stream_matches_single_engine).

    Uses a dedicated batcher and submits BEFORE start(): joint admission is
    what the invariant is about — a running worker may otherwise admit the
    first twin a block before the rest (staggered twins see different batch
    compositions per step, where tiling flips are fair game).
    """
    batcher = ContinuousBatcher(greedy_engine, max_streams=4, topk=1)
    same = ["twin stream text", "twin stream text", "twin stream text"]
    handles = [batcher.submit(t, "[S1]", max_audio_length_ms=480)
               for t in same]
    other = batcher.submit("completely different words", "[S1]",
                           max_audio_length_ms=480)
    batcher.start()
    try:
        got = [_collect(h) for h in handles]
        got_other = _collect(other)
    finally:
        batcher.stop()

    assert got[0].shape == got[1].shape == got[2].shape
    np.testing.assert_allclose(got[0], got[1], rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(got[0], got[2], rtol=2e-3, atol=5e-4)
    if got_other.shape == got[0].shape:
        assert not np.allclose(got_other, got[0], atol=1e-3)


def test_slot_reuse_beyond_capacity(batcher):
    """More sequential requests than slots: slots must recycle cleanly."""
    for round_ in range(2):
        handles = [batcher.submit(f"req {round_} {i}", "[S1]",
                                  max_audio_length_ms=320)
                   for i in range(6)]  # > max_streams=4
        outs = [_collect(h) for h in handles]
        for o in outs:
            assert o.shape[0] % 1920 == 0 and o.shape[0] > 0
            assert np.isfinite(o).all()


def test_per_request_sampling_config(batcher, greedy_engine):
    """Per-request topk and max_audio_length_ms are honored inside the
    shared batched step (reference honors caller topk per request,
    fireredtts2/fireredtts2.py:131-143)."""
    # a tight frame cap must bound the audio length: <=3 frames of audio
    h = batcher.submit("cap me", "[S1]", max_audio_length_ms=3 * 80)
    got = _collect(h)
    acfg = greedy_engine.config.codec.acoustic_decoder
    assert got.shape[0] <= 3 * 8 * acfg.hop_length

    # an explicit per-request topk rides through; topk=1 in another slot of
    # the same batch stays deterministic == the engine's greedy output
    text = "hello batch"
    want = greedy_engine.generate(text, "[S1]", [], max_audio_length_ms=640,
                                  topk=1)
    h_wide = batcher.submit("some other words", "[S1]", topk=4,
                            max_audio_length_ms=640)
    h_greedy = batcher.submit(text, "[S1]", topk=1, max_audio_length_ms=640)
    _collect(h_wide)
    got = _collect(h_greedy)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_stop_terminates_live_streams(greedy_engine):
    """stop() mid-stream must drain the in-flight block and close every
    live handle (None sentinel) so no consumer blocks forever on its
    queue — the graceful-stop path at the tail of _loop_inner."""
    batcher = ContinuousBatcher(greedy_engine, max_streams=4, topk=1)
    batcher.start()
    h = batcher.submit("a long stream that will be interrupted", "[S1]",
                       max_audio_length_ms=30_000)
    first = h.chunks.get(timeout=300)   # stream is live
    assert first is not None
    batcher.stop()
    # the handle must terminate promptly: chunks until a None sentinel
    import queue as _q
    while True:
        try:
            c = h.chunks.get(timeout=30)
        except _q.Empty:
            pytest.fail("stream handle never closed after stop()")
        if c is None:
            break
    assert h.error is None


def test_mid_block_frame_cap_is_exact(greedy_engine, batcher):
    """A frame cap landing INSIDE a decode block (3 frames: ladder runs
    block=1 then block=4, so the cap cuts the 4-frame block after 2) must
    yield exactly the single-engine capped audio — validates the packed-span
    fan-out slicing (runtime/batcher.py: n = min(n_eos, remaining))."""
    text, speaker = "hello batch", "[S1]"
    want = greedy_engine.generate(text, speaker, [],
                                  max_audio_length_ms=240, topk=1)

    h = batcher.submit(text, speaker, max_audio_length_ms=240)
    got = _collect(h)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_host_stats_attribution(batcher):
    """host_stats() attributes the block loop's host costs (dispatch /
    fetch / fanout) per frame — the instrumentation the 16-stream
    realtime-bar analysis reads (PERF.md round 2: host-side bottleneck)."""
    h = batcher.submit("host stats probe", "[S1]", max_audio_length_ms=640)
    _collect(h)
    stats = batcher.host_stats()
    assert stats["blocks"] > 0 and stats["frames"] > 0
    for k in ("dispatch_ms_per_frame", "fetch_ms_per_frame",
              "fanout_ms_per_frame", "host_ms_per_frame"):
        assert np.isfinite(stats[k]) and stats[k] >= 0.0, k
    assert stats["host_ms_per_frame"] == pytest.approx(
        stats["dispatch_ms_per_frame"] + stats["fanout_ms_per_frame"])


def test_capacity_class_pool(greedy_engine):
    """A capacity-classed pool (seq_capacity + max_frames_cap,
    VERDICT r3 #4: 32 full-capacity slabs exceed a v5e's HBM) must
    (a) produce the same audio as the full-capacity engine for requests
    that fit the class, (b) enforce the per-utterance frame cap, and
    (c) reject prompts whose bucket exceeds the class."""
    b = ContinuousBatcher(greedy_engine, max_streams=4, topk=1,
                          seq_capacity=128, max_frames_cap=8)
    # slab shapes reflect the class: LM capacity is kv_capacity(128),
    # vocoder slab is 8 frames * 8 latents (16-aligned)
    from fireredtts2_tpu.models.lm.model import kv_capacity
    assert b.lm_state.cache_k.shape[2] == kv_capacity(128)
    assert b.vo_state.kv_k.shape[2] == 64
    b.start()
    try:
        text, speaker = "hello batch", "[S1]"
        want = greedy_engine.generate(text, speaker, [],
                                      max_audio_length_ms=640, topk=1)
        got = _collect(b.submit(text, speaker, max_audio_length_ms=640))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)

        # (b) frame cap: 30 s requested, 8 frames served
        h = b.submit("cap me to the class", speaker,
                     max_audio_length_ms=30_000)
        capped = _collect(h)
        acfg = greedy_engine.config.codec.acoustic_decoder
        assert capped.shape[0] <= 8 * 8 * acfg.hop_length

        # (c) an oversized prompt is rejected upfront, not wedged: ~140
        # tokens (byte-fallback tokenizer ~1/char) land in the 192 bucket —
        # inside the ENGINE's bucket ladder (so _bucket doesn't raise
        # first) but over this pool's 128-position class
        with pytest.raises(ValueError, match="capacity"):
            b.submit("far too many words " * 7, speaker)
    finally:
        b.stop()


def test_capacity_class_smaller_than_engine_slab():
    """A pool whose slab is genuinely SMALLER than the engine's (pool
    kv_capacity 512 vs engine 1024 — the tiny default rounds everything
    to 512, hiding shape bugs): admission prefill must build its scratch
    state at the POOL's capacity, not cfg.max_seq_len
    (models/lm/model.py:prefill_into_slots)."""
    import dataclasses

    base = tiny_engine_config(depth_topk=1)
    cfg = dataclasses.replace(
        base, llm=dataclasses.replace(base.llm, max_seq_len=1024),
        max_seq_len=1024)
    e = FireRedTTS2Engine(config=cfg, seed=0)
    from fireredtts2_tpu.models.lm.model import kv_capacity
    b = ContinuousBatcher(e, max_streams=2, topk=1, seq_capacity=256,
                          max_frames_cap=4)
    assert b.lm_state.cache_k.shape[2] == kv_capacity(256) == 512
    assert kv_capacity(cfg.llm.max_seq_len) == 1024  # engine slab differs
    b.start()
    try:
        got = _collect(b.submit("mixed capacity pool", "[S1]",
                                max_audio_length_ms=320))
        assert got.shape[0] > 0 and np.isfinite(got).all()
    finally:
        b.stop()


def test_warmup_ladder_then_serving_matches_single_engine(greedy_engine):
    """warmup_blocks=True pre-compiles every ladder-K block, both prefill
    burst shapes, the vectorized resets, and the frames scatter BEFORE
    admission (runtime/batcher.py:_warmup_ladder) — a compile landing
    inside a live dispatch stalls every active stream (measured 2026-08-18
    on chip). The warmup dispatches garbage rows through real programs, so
    the test asserts (a) readiness signals, (b) the first REAL stream
    after warmup still matches the single-stream engine bit-for-bit."""
    b = ContinuousBatcher(greedy_engine, max_streams=4, topk=1,
                          warmup_blocks=True)
    b.start()
    try:
        assert b.wait_ready(timeout=600)
        text, speaker = "warmup then serve", "[S1]"
        want = greedy_engine.generate(text, speaker, [],
                                      max_audio_length_ms=640, topk=1)
        got = _collect(b.submit(text, speaker, max_audio_length_ms=640))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)
    finally:
        b.stop()


def test_submit_fails_fast_after_worker_death(greedy_engine):
    """BOTH submit entry points must raise once the worker is dead — the
    cached-prefix early-return path used to enqueue into a pending queue
    nobody drains, hanging the consumer forever on chunks.get()."""
    b = ContinuousBatcher(greedy_engine, max_streams=2, topk=1)
    # no start(): simulate a crashed worker directly
    b._dead = RuntimeError("simulated worker crash")
    with pytest.raises(RuntimeError, match="worker died"):
        b.submit("text after death", "[S1]")
    with pytest.raises(RuntimeError, match="worker died"):
        prompt, mask = greedy_engine._build_prompt([], "direct", "[S1]")
        b.submit_prompt(prompt, mask)
