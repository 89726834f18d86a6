"""Per-voice KV prefix cache (engine._context_state): a context seen twice
gets its prefilled KV slab cached on device; later requests copy the slab
and append-prefill ONLY the new text (O(text) prefill instead of
O(context+text)). The reference re-encodes AND re-prefills the prompt on
every call (fireredtts2/fireredtts2.py:90-115, 131-201).

Equivalence standard (same as incremental dialogue, CLAUDE.md): GREEDY
decode must match the uncached left-padded layout sample-for-sample —
the cached layout puts context+text at contiguous absolute positions,
and RoPE shift invariance makes the two layouts exact. Sampled decode
draws from the same distribution (absolute positions differ, so bitwise
equality is NOT asserted there)."""

import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine, Segment

TEXT = "short cached reply"
MS = 800  # 10 frames cap: enough decode to cascade any layout mismatch


def _context(seed=7, text="A voice prompt."):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal(8000) * 0.05).astype(np.float32)
    return [Segment(speaker="[S1]", text=text, audio=audio)]


@pytest.fixture(scope="module")
def cached_engine():
    return FireRedTTS2Engine(config=tiny_engine_config(), seed=11)


@pytest.fixture(scope="module")
def plain_engine():
    return FireRedTTS2Engine(
        config=tiny_engine_config(voice_state_cache=0), seed=11)


@pytest.fixture(scope="module")
def cached_outputs(cached_engine):
    """Three identical greedy clone requests against the cache-enabled
    engine: call 1 = plain path (first sighting), call 2 = build + cached
    path, call 3 = pure cache hit."""
    ctx = _context()
    return [cached_engine.generate(TEXT, "[S2]", ctx,
                                   max_audio_length_ms=MS, topk=1)
            for _ in range(3)]


def test_greedy_exact_vs_uncached(cached_outputs, plain_engine):
    ctx = _context()
    plain = [plain_engine.generate(TEXT, "[S2]", ctx,
                                   max_audio_length_ms=MS, topk=1)
             for _ in range(3)]
    for got, want in zip(cached_outputs, plain):
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_build_once_then_hit(cached_engine, cached_outputs):
    # second-use policy: call 1 plain, call 2 builds, call 3 hits
    assert cached_engine.voice_state_builds == 1
    assert len(cached_engine._voice_state_cache) == 1
    # another repeat stays a hit
    cached_engine.generate(TEXT, "[S2]", _context(),
                           max_audio_length_ms=MS, topk=1)
    assert cached_engine.voice_state_builds == 1


def test_stream_cached_matches_batch(cached_outputs):
    """Streaming over the cached prefix ≡ the batch decode of the same
    request (the repo-wide streaming≡batch invariant, now on the
    append-prefill clone path)."""
    e = FireRedTTS2Engine(config=tiny_engine_config(), seed=11)
    ctx = _context()
    for i in range(2):
        chunks = list(e.generate_stream(TEXT, "[S2]", ctx,
                                        max_audio_length_ms=MS, topk=1))
        streamed = (np.concatenate(chunks) if chunks
                    else np.zeros(0, np.float32))
        want = cached_outputs[i]
        assert streamed.shape == want.shape, f"call {i}"
        np.testing.assert_allclose(streamed, want, rtol=1e-3, atol=1e-4)
    assert e.voice_state_builds == 1
    assert e._first_packet_s is not None


def test_lru_eviction():
    # The cache is keyed by token CONTENT (intended semantics: identical
    # prompts dedup regardless of Segment construction) — so the two
    # contexts must differ in TOKENS. Different random prompt *audio* is
    # not enough: the tiny codec quantizes both noises to the same token
    # ids. Different prompt *text* guarantees distinct keys.
    e = FireRedTTS2Engine(config=tiny_engine_config(voice_state_cache=1),
                          seed=3)
    a = _context(1, text="First distinct prompt text.")
    b = _context(2, text="Second, entirely different prompt.")
    for _ in range(2):
        e.generate(TEXT, "[S2]", a, max_audio_length_ms=160, topk=1)
    assert e.voice_state_builds == 1
    for _ in range(2):
        e.generate(TEXT, "[S2]", b, max_audio_length_ms=160, topk=1)
    assert e.voice_state_builds == 2          # b evicted a (capacity 1)
    assert len(e._voice_state_cache) == 1
    e.generate(TEXT, "[S2]", a, max_audio_length_ms=160, topk=1)
    assert e.voice_state_builds == 3          # a must rebuild after evict


def test_content_key_dedup():
    """Intended semantics (pinned): the cache key is the context's token
    CONTENT, so two Segment lists that tokenize identically share one
    entry — no rebuild, no second slot — even when the Python objects
    (and, under the tiny codec, the raw prompt audio) differ."""
    e = FireRedTTS2Engine(config=tiny_engine_config(voice_state_cache=4),
                          seed=3)
    # different seeds -> different raw audio; tiny codec quantizes both to
    # the same tokens; same text -> identical token content
    for seed in (1, 2, 3, 4):
        e.generate(TEXT, "[S2]", _context(seed), max_audio_length_ms=160,
                   topk=1)
    assert e.voice_state_builds == 1
    assert len(e._voice_state_cache) == 1


def test_reload_clears_cache(cached_engine):
    assert len(cached_engine._voice_state_cache) >= 1
    cached_engine.apply_checkpoint(
        (cached_engine.lm_params, cached_engine.codec_params))
    assert len(cached_engine._voice_state_cache) == 0
    assert len(cached_engine._voice_ctx_seen) == 0
