"""Incremental (KV-persistent) dialogue decode vs the reference-shaped
re-prefill path.

The incremental path append-prefills only each utterance's new tokens into
the live KV slab (right-padded windows, pad slots overwritten by the next
window, rewind over decode-era KV) — O(new) prefill work per utterance vs
the reference's O(conversation) rebuild (fireredtts2.py:379-386).

Equivalence standard (same as the repo's batched-vs-B=1 invariant,
CLAUDE.md): GREEDY decode must match the re-prefill path sample-for-sample
— that proves slab content/positions are identical. Sampled decode draws
from the same distribution but absolute RoPE positions differ between the
two prompt layouts, so fp near-tie flips are possible and bitwise equality
is NOT asserted.
"""

import numpy as np
import pytest


def _dialogue_engine():
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    return FireRedTTS2Engine(config=tiny_engine_config(), seed=123)


TEXTS = ["[S1]Hello there, how are you today?",
         "[S2]I am doing great, thanks for asking.",
         "[S1]Wonderful to hear it."]


def test_incremental_matches_reprefill_greedy_exact(monkeypatch):
    """Greedy: every sample of the 3-utterance dialogue identical.

    Pinned to the DENSE reference attention (FRTTS2_BOUNDED_LM=0): the
    structural claim under test is that the append/rewind slab content and
    positions reproduce the re-prefill path. The bounded serving attention
    computes the same mask set with a different fp summation order, which
    shifts RoPE-shift noise between the two layouts enough to flip a
    greedy near-tie deep into the dialogue (measured round 3: utterance 3,
    one depth-codebook flip) — the same accepted equivalence class as
    batched-vs-B=1 (CLAUDE.md). Bounded == dense per call is covered by
    tests/test_bounded_attention.py and the engine equality suites."""
    monkeypatch.setenv("FRTTS2_BOUNDED_LM", "0")
    a = _dialogue_engine().generate_dialogue(
        list(TEXTS), max_utterance_ms=1600, incremental=False, topk=1)
    b = _dialogue_engine().generate_dialogue(
        list(TEXTS), max_utterance_ms=1600, incremental=True, topk=1)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_append_prefill_matches_left_padded_eager():
    """The structural anchor, free of cross-program fp noise: EAGER (unjitted)
    right-padded append-prefill + greedy decode chain must match the
    left-padded layout token for token on a window holding text AND audio
    rows (a prompt segment's shape)."""
    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.config import LLMConfig
    from fireredtts2_tpu.models.lm.model import (
        build_step_frame, init_lm_params, init_lm_state, lm_generate_frame)

    CFG = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                    text_vocab_size=300, audio_vocab_size=64,
                    audio_num_codebooks=4, max_seq_len=256, dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    rng = np.random.default_rng(0)
    L, bucket, C = 42, 64, CFG.num_columns
    win = np.zeros((L, C), np.int32)
    wm = np.zeros((L, C), bool)
    win[:12, -1] = rng.integers(1, 300, 12)
    wm[:12, -1] = True
    win[12:32, :-1] = rng.integers(0, 64, (20, C - 1))
    wm[12:32, :-1] = True
    win[32:, -1] = rng.integers(1, 300, 10)
    wm[32:, -1] = True

    def chain(left: bool) -> np.ndarray:
        tokens = np.zeros((1, bucket, C), np.int32)
        mask = np.zeros((1, bucket, C), bool)
        valid = np.zeros((1, bucket), bool)
        if left:
            tokens[0, bucket - L:], mask[0, bucket - L:] = win, wm
            valid[0, bucket - L:] = True
            rl = None
        else:
            tokens[0, :L], mask[0, :L] = win, wm
            valid[0, :L] = True
            rl = jnp.asarray([L], jnp.int32)
        st = init_lm_state(CFG, 1, jnp.float32)
        st, frame = lm_generate_frame(
            params, CFG, st, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(valid), jax.random.PRNGKey(5), topk=1, real_len=rl)
        out = [np.asarray(frame)]
        for t in range(1, 12):
            tt, tm = build_step_frame(CFG, frame)
            st, frame = lm_generate_frame(
                params, CFG, st, tt, tm, jnp.ones((1, 1), bool),
                jax.random.PRNGKey(100 + t), topk=1)
            out.append(np.asarray(frame))
        return np.concatenate(out)

    np.testing.assert_array_equal(chain(True), chain(False))


def test_incremental_with_prompt_segments_runs():
    """Voice-cloned incremental dialogue end to end (prompt wav/text ride
    the first window only). Strict equality vs the re-prefill path is NOT
    asserted here: the two layouts compile to different XLA programs whose
    reduction orders can flip fp near-ties (see module docstring); the
    eager test above pins the structural exactness."""
    import tempfile

    from fireredtts2_tpu.utils.audio_io import save_wav

    t = np.arange(24_000) / 16_000.0
    tone = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        save_wav(f.name, tone, 16_000)
        out = _dialogue_engine().generate_dialogue(
            list(TEXTS[:2]), prompt_wav_list=[f.name],
            prompt_text_list=["[S1]the reference voice."],
            max_utterance_ms=1600, topk=1, incremental=True)
    assert out.size > 0 and np.isfinite(out).all()


def test_incremental_sampled_runs_and_first_utterance_matches():
    """Sampled decode: utterance 0 shares one window layout with the
    re-prefill path up to the left/right pad shift, and in practice
    matches; later utterances may flip fp near-ties (documented)."""
    a = _dialogue_engine().generate_dialogue(
        list(TEXTS[:1]), max_utterance_ms=1600, incremental=False)
    b = _dialogue_engine().generate_dialogue(
        list(TEXTS[:1]), max_utterance_ms=1600, incremental=True)
    np.testing.assert_array_equal(a, b)
    full = _dialogue_engine().generate_dialogue(
        list(TEXTS), max_utterance_ms=1600, incremental=True)
    assert full.size > 0 and np.isfinite(full).all()


def test_dialogue_stream_equals_batch_incremental():
    """Streaming dialogue (chunked, fused append-prefill + block ladder)
    must produce the same audio as the batch incremental path, chunk for
    chunk — the dialogue-level extension of the streaming==batch
    invariant (same tolerance as tests/test_engine.py)."""
    e1 = _dialogue_engine()
    batch = e1.generate_dialogue(list(TEXTS[:2]), max_utterance_ms=1600,
                                 incremental=True)
    e2 = _dialogue_engine()
    pairs = list(e2.generate_dialogue_stream(list(TEXTS[:2]),
                                             max_utterance_ms=1600))
    assert {i for i, _ in pairs} == {0, 1}
    streamed = np.concatenate([c for _, c in pairs])
    assert streamed.shape == batch.shape
    np.testing.assert_allclose(streamed, batch, rtol=1e-3, atol=1e-4)
    assert e2._first_packet_s is not None


def test_incremental_dialogue_under_fused_serving_config():
    """The serving config (fused depth-chain kernel + int8 backbone) must
    drive the incremental dialogue path too (interpret mode on CPU)."""
    import dataclasses

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(cfg, llm=dataclasses.replace(
        cfg.llm, fused_depth_plan="gate=r8,up=s8,down=s8",
        quantize_backbone=True))
    eng = FireRedTTS2Engine(config=cfg, seed=7)
    out = eng.generate_dialogue(list(TEXTS[:2]), max_utterance_ms=1600,
                                topk=1, incremental=True)
    assert out.size > 0 and np.isfinite(out).all()


def test_incremental_overflow_raises():
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    eng = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    many = [f"[S{1 + i % 2}]utterance number {i} with plenty of words "
            f"to fill the context window quickly." for i in range(40)]
    with pytest.raises(ValueError, match="overflow|too long"):
        eng.generate_dialogue(many, max_utterance_ms=1600, incremental=True)
