"""Checkpoint hot-reload (engine.prepare/apply_checkpoint +
ContinuousBatcher.reload + REST /api/v1/admin/reload): swap weights with
zero dropped requests and every compiled program reused. The reference
has no reload path at all — restart is its only way to new weights."""

import os
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.models.codec.model import init_codec_params
from fireredtts2_tpu.models.lm.model import init_lm_params
from fireredtts2_tpu.runtime.checkpoint import save_params

TINY = tiny_engine_config()


def _make_reload_dir(tmp_path, seed: int = 42) -> tuple[str, np.ndarray]:
    """A DIR/jax/ serving layout with fresh random weights; returns
    (dir, the new backbone wq) so tests can prove the swap landed."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    lm = init_lm_params(k1, TINY.llm, jnp.float32)
    codec = init_codec_params(k2, TINY.codec, jnp.float32)
    d = str(tmp_path / f"reload_{seed}")
    save_params(os.path.join(d, "jax", "llm_posttrain"), lm)
    save_params(os.path.join(d, "jax", "codec"), codec)
    # The engine loads LM weights in its compute dtype (bf16 by default),
    # so the expected array is the saved f32 cast through that dtype.
    wq = jnp.asarray(lm["backbone"]["wq"], dtype=TINY.llm.dtype)
    return d, np.asarray(wq)


def test_engine_reload_swaps_weights(tmp_path):
    d, new_wq = _make_reload_dir(tmp_path)
    engine = FireRedTTS2Engine(config=TINY, seed=0)
    old_wq = np.asarray(engine.lm_params["backbone"]["wq"])
    assert not np.array_equal(old_wq, new_wq)

    a_old = engine.generate("Hello there.", "[S1]", [],
                            max_audio_length_ms=240)
    engine.reload_checkpoint(d)
    np.testing.assert_array_equal(
        np.asarray(engine.lm_params["backbone"]["wq"]), new_wq)
    # same compiled programs serve the new weights
    a_new = engine.generate("Hello there.", "[S1]", [],
                            max_audio_length_ms=240)
    assert a_new.shape[0] > 0 and np.isfinite(a_new).all()
    assert np.isfinite(a_old).all()


def test_engine_reload_clears_prompt_cache(tmp_path):
    """RVQ prompt tokens are a function of the codec weights — the
    per-voice cache must not survive a swap."""
    d, _ = _make_reload_dir(tmp_path)
    engine = FireRedTTS2Engine(config=TINY, seed=0)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4000) * 0.05).astype(np.float32)
    engine.encode_prompt_tokens(wav)
    assert engine.encode_calls == 1
    engine.encode_prompt_tokens(wav)
    assert engine.encode_calls == 1          # cache hit
    engine.reload_checkpoint(d)
    engine.encode_prompt_tokens(wav)
    assert engine.encode_calls == 2          # re-encoded with new weights


def test_engine_reload_shape_mismatch_raises(tmp_path):
    import dataclasses

    other_llm = dataclasses.replace(TINY.llm, audio_vocab_size=32)
    lm = init_lm_params(jax.random.PRNGKey(1), other_llm, jnp.float32)
    codec = init_codec_params(jax.random.PRNGKey(2), TINY.codec, jnp.float32)
    d = str(tmp_path / "bad")
    save_params(os.path.join(d, "jax", "llm_posttrain"), lm)
    save_params(os.path.join(d, "jax", "codec"), codec)

    engine = FireRedTTS2Engine(config=TINY, seed=0)
    old = engine.lm_params
    with pytest.raises(ValueError, match="shape"):
        engine.reload_checkpoint(d)
    assert engine.lm_params is old           # nothing swapped


def test_batcher_reload_drains_then_swaps(tmp_path):
    """reload() while a stream is live: the stream finishes completely on
    the OLD weights (drain), the swap lands after, and post-reload
    submissions serve the new weights through the same compiled step."""
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    d, new_wq = _make_reload_dir(tmp_path)
    engine = FireRedTTS2Engine(config=TINY, seed=0)
    batcher = ContinuousBatcher(engine, max_streams=2)
    batcher.start()
    try:
        # warm the compiled surface so the live-stream timing below is
        # real decode work, not compile stalls
        for _ in batcher.submit("Warm up.", max_audio_length_ms=240):
            pass

        h = batcher.submit("A long sentence to keep the slot busy.",
                           max_audio_length_ms=80 * 40)      # 40 frames
        first = h.chunks.get(timeout=120)    # admitted + decoding
        assert first is not None
        done = threading.Event()
        err: list = []

        def do_reload():
            try:
                batcher.reload(d, timeout_s=120.0)
            except Exception as e:  # noqa: BLE001
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=do_reload)
        t.start()
        samples = len(first) + sum(len(c) for c in h)  # consume the stream
        t.join(timeout=120)
        assert done.is_set() and not err, err
        assert samples > 0 and h.finished_s is not None

        np.testing.assert_array_equal(
            np.asarray(engine.lm_params["backbone"]["wq"]), new_wq)
        # the batcher still serves, on the new weights
        h2 = batcher.submit("After the swap.", max_audio_length_ms=240)
        assert sum(len(c) for c in h2) > 0
    finally:
        batcher.stop()


def test_batcher_reload_timeout_keeps_old_weights(tmp_path):
    """A drain that cannot finish within timeout_s raises and leaves the
    old weights serving (admissions resume)."""
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    d, _ = _make_reload_dir(tmp_path)
    engine = FireRedTTS2Engine(config=TINY, seed=0)
    old = engine.lm_params
    batcher = ContinuousBatcher(engine, max_streams=2)
    batcher.start()
    try:
        for _ in batcher.submit("Warm up.", max_audio_length_ms=240):
            pass
        # as long a stream as the config allows: it must still be live
        # when reload's prepare half (Orbax load) finishes
        h = batcher.submit("Busy slot.", max_audio_length_ms=80 * 1000)
        first = h.chunks.get(timeout=120)    # admitted: slot is live
        assert first is not None
        with pytest.raises(TimeoutError):
            batcher.reload(d, timeout_s=0.0)
        assert engine.lm_params is old
        assert not batcher._admit_paused.is_set()   # admissions resumed
        assert sum(len(c) for c in h) > 0           # stream unharmed
    finally:
        batcher.stop()
