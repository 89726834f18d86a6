"""Batched voice-clone path (VERDICT r3 #3): clone requests decode THROUGH
the continuous batcher's shared block program instead of bypassing it to a
dedicated engine thread — N concurrent clones batch like plain utterances,
while keeping the reference's exact glue (merged prompt text, last-3 prompt
frames dropped, retry >18 frames, trim 2 frames BEFORE vocoding —
fireredtts2/fireredtts2.py:405-459)."""

import threading

import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.engine.engine import Segment
from fireredtts2_tpu.runtime.batcher import ContinuousBatcher
from fireredtts2_tpu.utils.text import clean_text, split_text

PROMPT_TEXT = "A short voice prompt."
TEXT = "hello cloned batch"


@pytest.fixture(scope="module")
def engine():
    return FireRedTTS2Engine(config=tiny_engine_config(depth_topk=1), seed=0)


@pytest.fixture(scope="module")
def prompt_audio():
    rng = np.random.default_rng(4)
    return (rng.standard_normal(8000) * 0.05).astype(np.float32)


@pytest.fixture(scope="module")
def batcher(engine):
    b = ContinuousBatcher(engine, max_streams=4, topk=1)
    b.start()
    yield b
    b.stop()


def _engine_clone_mirror(e, text, prompt_text, prompt_audio, max_frames,
                         topk=1):
    """The engine's generate_monologue glue with a controllable frame cap
    (the pool's per-utterance cap must bind both sides for an exact
    comparison): merged text, drop 3, AR decode, trim 2, vocode."""
    pieces = []
    pt = clean_text(prompt_text)
    for chunk in split_text(clean_text(text), 400) or [text]:
        merged = pt[:-1] + "," + clean_text(chunk)
        seg = Segment(speaker="[S1]", text=merged, audio=prompt_audio)
        prompt, mask = e._build_prompt([seg], None, None)
        gen = e._run_ar(prompt[:-3], mask[:-3], max_frames, 0.75, topk)
        pieces.append(e._decode_tokens(gen[2:]))
    return np.concatenate(pieces) if pieces else np.zeros(0, np.float32)


def test_batched_clone_matches_engine_glue(engine, batcher, prompt_audio):
    """Greedy batched clone == the engine's clone glue at the same frame
    cap (24 > the 18-frame retry bar, so no retries fire on either side)."""
    want = _engine_clone_mirror(engine, TEXT, PROMPT_TEXT, prompt_audio, 24)
    got = batcher.generate_monologue_clone(
        TEXT, prompt_text=PROMPT_TEXT, prompt_audio=prompt_audio,
        topk=1, max_frames=24)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_clone_retry_and_trim_semantics(engine, batcher, prompt_audio):
    """A 10-frame cap can never satisfy the >18-frame bar: the batched path
    must retry exactly 8 times (greedy -> identical result each time,
    fireredtts2.py:431-439 loop bounded at 8 here), then trim 2 frames and
    vocode — so the audio is exactly (10-2) frames long."""
    got = batcher.generate_monologue_clone(
        TEXT, prompt_text=PROMPT_TEXT, prompt_audio=prompt_audio,
        topk=1, max_frames=10)
    acfg = engine.config.codec.acoustic_decoder
    assert got.shape[0] == 8 * 8 * acfg.hop_length
    assert np.isfinite(got).all()


def test_concurrent_clones_batch_together(engine, batcher, prompt_audio):
    """Concurrent clone requests share the batcher (the serve-layer win):
    identical requests from 3 threads produce identical audio and all
    complete."""
    results = [None] * 3
    def run(i):
        results[i] = batcher.generate_monologue_clone(
            TEXT, prompt_text=PROMPT_TEXT, prompt_audio=prompt_audio,
            topk=1, max_frames=24)
    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for r in results:
        assert r is not None and r.shape[0] > 0 and np.isfinite(r).all()
    # slot independence (same invariant as plain batched streams)
    assert results[0].shape == results[1].shape == results[2].shape


def test_clone_requires_prompt(batcher):
    with pytest.raises(ValueError, match="prompt"):
        batcher.generate_monologue_clone("no prompt here",
                                         prompt_text="x")


def test_context_prefix_admission(engine, prompt_audio):
    """submit() with a REPEAT context admits from the cached KV prefix
    (engine voice-state cache, batched — the slot starts from the cached
    slab and append-prefills only the text).

    Equivalence class (CLAUDE.md): the prefix layout places context+text
    at contiguous absolute positions while the plain path left-pads one
    bucket — greedy near-ties can flip between the two layouts (different
    program shapes -> different matmul tiling), so cross-layout bitwise
    equality is NOT asserted; within the prefix layout, repeated greedy
    requests must be identical (deterministic program, keys ignored at
    topk=1/depth_topk=1).

    NOTE the merged-text monologue clone CANNOT share a prefix (the
    reference merges prompt_text+chunk into ONE segment, text-first —
    fireredtts2.py:424 — so the token prefix differs per text); the
    context path here is the reference's generate_dialogue-style cloning
    (fixed context segments + new text appended)."""
    ctx = [Segment(speaker="[S1]", text="A fixed voice context.",
                   audio=prompt_audio)]
    b = ContinuousBatcher(engine, max_streams=4, topk=1)
    b.start()
    try:
        outs = []
        for _ in range(4):   # 1: plain, 2: engine-cache build, 3-4: hits
            h = b.submit("hello prefix", "[S1]", context=ctx,
                         max_audio_length_ms=640, topk=1)
            outs.append(_collect(h))
        assert len(b._prefix_cache) == 1
        for o in outs:
            assert o.shape[0] > 0 and np.isfinite(o).all()
        # prefix-path determinism: build-admission and hit-admissions run
        # the same program on the same content
        assert outs[1].shape == outs[2].shape == outs[3].shape
        np.testing.assert_allclose(outs[2], outs[1], rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(outs[3], outs[1], rtol=2e-3, atol=5e-4)
    finally:
        b.stop()


def _collect(handle):
    chunks = list(handle)
    return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
