"""Tests for the Qwen2-style transformer stack and the dual-transformer LM.

The key correctness anchors (SURVEY.md §4 lesson):
- KV-cached incremental decode ≡ stateless full forward (the property the
  reference delegates to torchtune's cache implementation);
- left-padded (bucketed) prefill ≡ exact-length prefill (RoPE attention is
  relative, so our batching trick must not change outputs);
- the depth decoder consumes exactly ncb slots with a fresh cache per frame.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import LLMConfig, FLAVORS
from fireredtts2_tpu.ops import masks as mask_ops
from fireredtts2_tpu.models.lm.transformer import (
    init_transformer_params, init_kv_cache, transformer_forward,
)
from fireredtts2_tpu.models.lm.model import (
    init_lm_params, init_lm_state, lm_generate_frame, lm_decode_frame, lm_loss,
)

CFG = LLMConfig(
    backbone_flavor="tiny", decoder_flavor="tiny-deep",
    text_vocab_size=300, audio_vocab_size=64, audio_num_codebooks=4,
    max_seq_len=64, dtype="float32",
)


@pytest.fixture(scope="module")
def lm_params():
    return init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)


# ------------------------------------------------------------- transformer

def test_cached_decode_matches_full_forward(rng):
    tcfg = FLAVORS["tiny"]
    params = init_transformer_params(jax.random.PRNGKey(1), tcfg, jnp.float32)
    B, S, T_max = 2, 10, 16
    h = jnp.asarray(rng.standard_normal((B, S, tcfg.embed_dim)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    # Stateless full forward with causal mask
    causal = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))
    full, _ = transformer_forward(params, tcfg, h, pos, causal)

    # Prefill first 6 then decode 4 single steps against the slab
    cache = init_kv_cache(tcfg, B, T_max, jnp.float32)
    split = 6
    m_pre = mask_ops.decode_step_mask(pos[:, :split], T_max)
    out_pre, cache = transformer_forward(params, tcfg, h[:, :split], pos[:, :split],
                                         m_pre, cache, jnp.int32(0))
    outs = [out_pre]
    for s in range(split, S):
        p = pos[:, s:s + 1]
        m = mask_ops.decode_step_mask(p, T_max)
        o, cache = transformer_forward(params, tcfg, h[:, s:s + 1], p, m,
                                       cache, jnp.int32(s))
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------- LM decode

def _random_prompt(rng, B, L, ncb=CFG.audio_num_codebooks):
    """Mixed text+audio prompt frames like the engine builds."""
    C = ncb + 1
    tokens = np.zeros((B, L, C), np.int32)
    mask = np.zeros((B, L, C), bool)
    half = L // 2
    tokens[:, :half, -1] = rng.integers(1, CFG.text_vocab_size, (B, half))
    mask[:, :half, -1] = True
    tokens[:, half:, :-1] = rng.integers(0, CFG.audio_vocab_size, (B, L - half, ncb))
    mask[:, half:, :-1] = True
    return tokens, mask


def test_generate_frame_shapes_and_determinism(rng, lm_params):
    B, L = 1, 12
    tokens, tmask = _random_prompt(rng, B, L)
    state = init_lm_state(CFG, B)
    valid = jnp.ones((B, L), bool)
    key = jax.random.PRNGKey(42)
    s1, f1 = lm_generate_frame(lm_params, CFG, state, jnp.asarray(tokens),
                               jnp.asarray(tmask), valid, key, topk=1)
    s2, f2 = lm_generate_frame(lm_params, CFG, state, jnp.asarray(tokens),
                               jnp.asarray(tmask), valid, key, topk=1)
    assert f1.shape == (B, CFG.audio_num_codebooks)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert int(s1.pos[0]) == L
    assert (np.asarray(f1) >= 0).all() and (np.asarray(f1) < CFG.audio_vocab_size).all()


def test_left_padded_prefill_matches_exact(rng, lm_params):
    """Bucketed (left-padded) prefill must produce the same greedy frame as
    exact-length prefill — validates the slot_valid masking + RoPE shift
    invariance that makes batching possible."""
    B, L, bucket = 1, 10, 16
    tokens, tmask = _random_prompt(rng, B, L)
    key = jax.random.PRNGKey(7)

    # Exact
    state = init_lm_state(CFG, B)
    _, exact = lm_generate_frame(
        lm_params, CFG, state, jnp.asarray(tokens), jnp.asarray(tmask),
        jnp.ones((B, L), bool), key, topk=1)

    # Left-padded to bucket
    pad = bucket - L
    tokens_p = np.zeros((B, bucket, CFG.num_columns), np.int32)
    tmask_p = np.zeros((B, bucket, CFG.num_columns), bool)
    tokens_p[:, pad:] = tokens
    tmask_p[:, pad:] = tmask
    valid_p = np.zeros((B, bucket), bool)
    valid_p[:, pad:] = True
    state = init_lm_state(CFG, B)
    _, padded = lm_generate_frame(
        lm_params, CFG, state, jnp.asarray(tokens_p), jnp.asarray(tmask_p),
        jnp.asarray(valid_p), key, topk=1)

    np.testing.assert_array_equal(np.asarray(exact), np.asarray(padded))


def test_decode_chain_consistency(rng, lm_params):
    """Prefill + N greedy decode steps run without shape errors and produce
    frames influenced by context (not constant)."""
    B, L = 1, 8
    tokens, tmask = _random_prompt(rng, B, L)
    state = init_lm_state(CFG, B)
    key = jax.random.PRNGKey(3)
    state, frame = lm_generate_frame(
        lm_params, CFG, state, jnp.asarray(tokens), jnp.asarray(tmask),
        jnp.ones((B, L), bool), key, topk=1)

    frames = [np.asarray(frame)]
    for i in range(4):
        ft = jnp.concatenate(
            [frame, jnp.zeros((B, 1), jnp.int32)], axis=1)[:, None, :]
        fm = jnp.concatenate(
            [jnp.ones_like(frame, dtype=bool), jnp.zeros((B, 1), bool)],
            axis=1)[:, None, :]
        state, frame = lm_decode_frame(lm_params, CFG, state, ft, fm,
                                       jax.random.fold_in(key, i), topk=1)
        frames.append(np.asarray(frame))
    assert int(state.pos[0]) == L + 4
    stacked = np.stack(frames)
    assert stacked.shape == (5, B, CFG.audio_num_codebooks)


def test_batched_streams_decode_independently(rng, lm_params):
    """Two streams in one batch (same lengths) must each match their own
    B=1 run — the batching dimension cannot leak across streams."""
    L = 8
    t1, m1 = _random_prompt(rng, 1, L)
    t2, m2 = _random_prompt(rng, 1, L)
    key = jax.random.PRNGKey(11)

    def run(toks, msk, B):
        state = init_lm_state(CFG, B)
        # depth_topk=1 too: sampled draws depend on batch shape, greedy doesn't.
        _, f = lm_generate_frame(lm_params, CFG, state, jnp.asarray(toks),
                                 jnp.asarray(msk), jnp.ones((B, L), bool),
                                 key, topk=1, depth_topk=1)
        return np.asarray(f)

    fb = run(np.concatenate([t1, t2]), np.concatenate([m1, m2]), 2)
    f1 = run(t1, m1, 1)
    f2 = run(t2, m2, 1)
    np.testing.assert_array_equal(fb[0], f1[0])
    np.testing.assert_array_equal(fb[1], f2[0])


def test_pallas_decode_path_matches_mask_path(rng, lm_params, monkeypatch):
    """The production Pallas decode-attention route (interpret mode on CPU)
    must sample the SAME tokens as the XLA mask path, including left-padded
    streams in a batch — it is wired per-layer in transformer_forward for
    S=1 cached steps (live window from LMState.slot_valid/pos)."""
    from fireredtts2_tpu.models.lm.model import build_step_frame

    B, L, bucket = 2, 10, 16
    t1, m1 = _random_prompt(rng, 1, L)
    t2, m2 = _random_prompt(rng, 1, L)
    pad = bucket - L
    tokens = np.zeros((B, bucket, CFG.num_columns), np.int32)
    tmask = np.zeros((B, bucket, CFG.num_columns), bool)
    valid = np.zeros((B, bucket), bool)
    tokens[0, pad:], tmask[0, pad:] = t1[0], m1[0]
    tokens[1, pad:], tmask[1, pad:] = t2[0], m2[0]
    valid[:, pad:] = True
    key = jax.random.PRNGKey(5)

    def run():
        state = init_lm_state(CFG, B)
        state, f = lm_generate_frame(
            lm_params, CFG, state, jnp.asarray(tokens), jnp.asarray(tmask),
            jnp.asarray(valid), key)
        frames = [np.asarray(f)]
        for t in range(3):
            ft, fm = build_step_frame(CFG, f)
            state, f = lm_generate_frame(
                lm_params, CFG, state, ft, fm, jnp.ones((B, 1), bool),
                jax.random.fold_in(key, t))
            frames.append(np.asarray(f))
        return np.stack(frames)

    monkeypatch.setenv("FRTTS2_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("FRTTS2_PALLAS", "1")
    got = run()
    np.testing.assert_array_equal(ref, got)


# ------------------------------------------------------------- loss

def test_lm_loss_finite_and_composed(rng, lm_params):
    B, S = 2, 16
    tokens, tmask = _random_prompt(rng, B, S)
    out = lm_loss(lm_params, CFG, jnp.asarray(tokens), jnp.asarray(tmask),
                  jax.random.PRNGKey(0))
    for k in ("loss", "text_loss", "c0_loss", "depth_loss"):
        assert np.isfinite(float(out[k])), k
    w = CFG.decoder_loss_weight
    want = 2 * ((1 - w) * float(out["c0_loss"]) + w * float(out["depth_loss"])) \
        + 0.01 * float(out["text_loss"])
    assert abs(float(out["loss"]) - want) < 1e-5


def test_lm_loss_grads_flow(rng, lm_params):
    B, S = 1, 12
    tokens, tmask = _random_prompt(rng, B, S)

    def f(p):
        return lm_loss(p, CFG, jnp.asarray(tokens), jnp.asarray(tmask),
                       jax.random.PRNGKey(0))["loss"]

    g = jax.grad(f)(lm_params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_prefill_into_slots_burst(rng, lm_params):
    """Batched burst admission: (a) with greedy sampling (topk=1, draws are
    batch-shape independent) an N=1 burst equals the single-slot path;
    (b) padded rows (slot index B, mode=drop) leave the state untouched;
    (c) a 2-burst fills both slots and identical prompts yield identical
    greedy frames."""
    from fireredtts2_tpu.models.lm.model import (
        prefill_into_slot, prefill_into_slots)

    B, L, bucket = 4, 9, 16
    t1, m1 = _random_prompt(rng, 1, L)
    pad = bucket - L
    tokens = np.zeros((1, bucket, CFG.num_columns), np.int32)
    tmask = np.zeros((1, bucket, CFG.num_columns), bool)
    valid = np.zeros((1, bucket), bool)
    tokens[0, pad:], tmask[0, pad:], valid[0, pad:] = t1[0], m1[0], True
    key = jax.random.PRNGKey(7)
    kw = dict(topk=1, depth_topk=1)

    base = init_lm_state(CFG, B)
    s_single, f_single = prefill_into_slot(
        lm_params, CFG, base, jnp.int32(2), jnp.asarray(tokens),
        jnp.asarray(tmask), jnp.asarray(valid), key, **kw)

    base2 = init_lm_state(CFG, B)
    # N=1 padded to Np=2 with a dropped dummy row
    tok2 = np.concatenate([tokens, np.zeros_like(tokens)])
    msk2 = np.concatenate([tmask, np.zeros_like(tmask)])
    val2 = np.concatenate([valid, np.zeros_like(valid)])
    s_burst, f_burst = prefill_into_slots(
        lm_params, CFG, base2, jnp.asarray([2, B], jnp.int32),
        jnp.asarray(tok2), jnp.asarray(msk2), jnp.asarray(val2), key, **kw)

    np.testing.assert_array_equal(np.asarray(f_single[0]),
                                  np.asarray(f_burst[0]))
    np.testing.assert_array_equal(np.asarray(s_single.pos),
                                  np.asarray(s_burst.pos))
    np.testing.assert_array_equal(np.asarray(s_single.slot_valid),
                                  np.asarray(s_burst.slot_valid))
    np.testing.assert_array_equal(np.asarray(s_single.cache_k),
                                  np.asarray(s_burst.cache_k))

    # 2-burst into slots 0 and 3
    tok3 = np.concatenate([tokens, tokens])
    msk3 = np.concatenate([tmask, tmask])
    val3 = np.concatenate([valid, valid])
    s2, f2 = prefill_into_slots(
        lm_params, CFG, init_lm_state(CFG, B),
        jnp.asarray([0, 3], jnp.int32), jnp.asarray(tok3),
        jnp.asarray(msk3), jnp.asarray(val3), key, **kw)
    assert np.asarray(s2.pos).tolist() == [bucket, 0, 0, bucket]
    np.testing.assert_array_equal(np.asarray(f2[0]), np.asarray(f2[1]))
