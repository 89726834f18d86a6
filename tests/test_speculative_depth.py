"""Speculative (Jacobi / lookahead) depth decode vs the sequential loop.

depth_decode_jacobi (models/lm/model.py) replaces the 15 sequential depth
steps (reference llm.py:317-328) with iterated parallel teacher-forcing
passes + deterministic-noise replay. Acceptance only changes HOW MANY
rounds run — the returned tokens must equal the sequential path's exactly
(f32 on CPU: both paths attend over the same 16 slots in the same order).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireredtts2_tpu.config import LLMConfig, tiny_engine_config
from fireredtts2_tpu.models.lm.model import (
    _depth_decode, depth_decode_jacobi, init_lm_params,
)


def _tiny_cfg(**kw):
    return LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                     text_vocab_size=300, audio_vocab_size=64,
                     audio_num_codebooks=4, max_seq_len=256, dtype="float32",
                     **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B = 3
    last_h = jax.random.normal(jax.random.PRNGKey(1),
                               (B, cfg.backbone.embed_dim), jnp.float32)
    c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                            cfg.audio_vocab_size)
    return cfg, params, last_h, c0


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_sampled_tokens_match_sequential(setup, seed):
    cfg, params, last_h, c0 = setup
    key = jax.random.PRNGKey(seed)
    seq = _depth_decode(params, cfg, last_h, c0, key, 10, 0.75)
    jac, rounds = depth_decode_jacobi(params, cfg, last_h, c0, key, 10, 0.75)
    assert (seq == jac).all(), (seq.tolist(), jac.tolist())
    assert (jac[:, 0] == c0).all()
    assert 1 <= int(rounds) <= cfg.audio_num_codebooks


def test_greedy_matches_sequential(setup):
    cfg, params, last_h, c0 = setup
    key = jax.random.PRNGKey(5)
    seq = _depth_decode(params, cfg, last_h, c0, key, 1, 0.75)
    jac, _ = depth_decode_jacobi(params, cfg, last_h, c0, key, 1, 0.75)
    assert (seq == jac).all()


def test_perfect_init_verifies_in_one_round(setup):
    """Feeding the true chain as the initial guess must verify everything
    with a single parallel pass — the mechanism behind the speedup: a good
    draft means ~1 weight read instead of 15."""
    cfg, params, last_h, c0 = setup
    key = jax.random.PRNGKey(9)
    truth = _depth_decode(params, cfg, last_h, c0, key, 10, 0.75)
    jac, rounds = depth_decode_jacobi(params, cfg, last_h, c0, key, 10, 0.75,
                                      init=truth[:, 1:])
    assert int(rounds) == 1
    assert (jac == truth).all()


def test_rounds_bounded_by_chain_length(setup):
    """Worst case (adversarial init) still terminates within ncb rounds and
    still returns the true chain."""
    cfg, params, last_h, c0 = setup
    key = jax.random.PRNGKey(13)
    truth = _depth_decode(params, cfg, last_h, c0, key, 10, 0.75)
    bad = (truth[:, 1:] + 1) % cfg.audio_vocab_size
    jac, rounds = depth_decode_jacobi(params, cfg, last_h, c0, key, 10, 0.75,
                                      init=bad)
    assert (jac == truth).all()
    assert int(rounds) <= cfg.audio_num_codebooks


def test_config_routing_is_transparent():
    """cfg.speculative_depth=True must not change generated audio: engines
    with and without the flag produce identical waveforms for one seed."""
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    base = tiny_engine_config()
    spec = dataclasses.replace(
        base, llm=dataclasses.replace(base.llm, speculative_depth=True))
    text, speaker = "speculative depth check", "[S1]"
    a = FireRedTTS2Engine(config=base, seed=0).generate(
        text, speaker, [], max_audio_length_ms=400)
    b = FireRedTTS2Engine(config=spec, seed=0).generate(
        text, speaker, [], max_audio_length_ms=400)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frame_routing_with_prev_frame_init():
    """lm_generate_frame threads the previous frame's chain as the Jacobi
    init (a free temporal draft) — tokens must still equal the sequential
    path's exactly."""
    from fireredtts2_tpu.models.lm.model import (
        init_lm_state, lm_generate_frame)

    cfg = _tiny_cfg()
    cfg_spec = _tiny_cfg(speculative_depth=True)
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    B, S = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(11),
                                (B, S, cfg.num_columns), 1, 60)
    tmask = jnp.ones((B, S, cfg.num_columns), bool)
    valid = jnp.ones((B, S), bool)
    kf = jax.random.PRNGKey(12)

    st = init_lm_state(cfg, B, jnp.float32)
    _, frame_seq = lm_generate_frame(params, cfg, st, tokens, tmask,
                                     valid, kf)
    st = init_lm_state(cfg_spec, B, jnp.float32)
    _, frame_jac = lm_generate_frame(params, cfg_spec, st, tokens, tmask,
                                     valid, kf)
    assert (frame_seq == frame_jac).all()


def test_engine_llm_overrides():
    """Engine applies llm_overrides on top of a given config (the CLI's
    path for serving perf knobs, __main__.py)."""
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    e = FireRedTTS2Engine(config=tiny_engine_config(), seed=0,
                          llm_overrides={"speculative_depth": True})
    assert e.config.llm.speculative_depth is True


def test_draft_head_init_and_exact_tokens():
    """A depth_draft head changes only the Jacobi INIT — frame tokens must
    still equal the sequential path's exactly (untrained draft = bad
    guesses = more rounds, same output)."""
    from fireredtts2_tpu.models.lm.model import (
        draft_depth_tokens, init_lm_state, lm_generate_frame)

    cfg = _tiny_cfg()
    cfg_draft = _tiny_cfg(speculative_depth=True, depth_draft_head=True)
    params_d = init_lm_params(jax.random.PRNGKey(0), cfg_draft, jnp.float32)
    assert "depth_draft" in params_d
    params = {k: v for k, v in params_d.items() if k != "depth_draft"}

    B, S = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(21),
                                (B, S, cfg.num_columns), 1, 60)
    tmask = jnp.ones((B, S, cfg.num_columns), bool)
    valid = jnp.ones((B, S), bool)
    kf = jax.random.PRNGKey(22)

    st = init_lm_state(cfg, B, jnp.float32)
    _, frame_seq = lm_generate_frame(params, cfg, st, tokens, tmask,
                                     valid, kf)
    st = init_lm_state(cfg_draft, B, jnp.float32)
    _, frame_drafted = lm_generate_frame(params_d, cfg_draft, st, tokens,
                                         tmask, valid, kf)
    assert (frame_seq == frame_drafted).all()

    h = jax.random.normal(jax.random.PRNGKey(23),
                          (B, cfg.backbone.embed_dim), jnp.float32)
    c0 = jnp.zeros((B,), jnp.int32)
    d = draft_depth_tokens(params_d, cfg_draft, h, c0)
    assert d.shape == (B, cfg.audio_num_codebooks - 1)


def test_draft_loss_trains():
    """lm_loss with the draft head emits draft_loss, folds it into the
    total, and its gradient reaches the draft trunk."""
    from fireredtts2_tpu.models.lm.model import lm_loss

    cfg = _tiny_cfg(depth_draft_head=True)
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, S, C = 2, 10, cfg.num_columns
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S, C), 1, 40)
    tmask = jnp.ones((B, S, C), bool)

    def total(p):
        out = lm_loss(p, cfg, tokens, tmask, jax.random.PRNGKey(2),
                      depth_subset=4)
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert jnp.isfinite(out["draft_loss"])
    base = 2.0 * ((1 - cfg.decoder_loss_weight) * out["c0_loss"]
                  + cfg.decoder_loss_weight * out["depth_loss"]) \
        + 0.01 * out["text_loss"]
    assert jnp.allclose(loss, base + cfg.draft_loss_weight * out["draft_loss"],
                        rtol=1e-6)
    g = grads["depth_draft"]["trunk"]
    assert jnp.abs(g).max() > 0


def test_jacobi_on_int8_quantized_decoder():
    """cfg.quantize_depth + speculative: both paths run the SAME
    int8-transparent transformer_forward, so tokens must still match."""
    from fireredtts2_tpu.models.lm.transformer import (
        quantize_transformer_int8)

    cfg = _tiny_cfg()
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params_q = dict(params, decoder=quantize_transformer_int8(
        params["decoder"]))
    B = 3
    last_h = jax.random.normal(jax.random.PRNGKey(31),
                               (B, cfg.backbone.embed_dim), jnp.float32)
    c0 = jax.random.randint(jax.random.PRNGKey(32), (B,), 0,
                            cfg.audio_vocab_size)
    key = jax.random.PRNGKey(33)
    seq = _depth_decode(params_q, cfg, last_h, c0, key, 10, 0.75)
    jac, _ = depth_decode_jacobi(params_q, cfg, last_h, c0, key, 10, 0.75)
    assert (seq == jac).all()


def test_stream_equals_batch_with_speculative_depth():
    """The streaming==batch invariant must hold under the speculative flag
    (the Jacobi while_loop runs inside the fused stream blocks' scan)."""
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    base = tiny_engine_config()
    cfg = dataclasses.replace(
        base, llm=dataclasses.replace(base.llm, speculative_depth=True))
    text, speaker = "stream speculative", "[S1]"

    e1 = FireRedTTS2Engine(config=cfg, seed=123)
    chunks = list(e1.generate_stream(text, speaker, [],
                                     max_audio_length_ms=480))
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    e2 = FireRedTTS2Engine(config=cfg, seed=123)
    batch = e2.generate(text, speaker, [], max_audio_length_ms=480)

    assert streamed.shape == batch.shape
    np.testing.assert_allclose(streamed, batch, rtol=1e-3, atol=1e-4)
