"""Direct equality tests for ops.attention.gqa_attention_bounded.

The op is otherwise only covered transitively (vocoder streaming==batch,
LM decode equality); these pin its contract against the dense path —
including the round-3 per-query LOWER bound (left-padded prompts) and the
live_lo whole-chunk skip — at f32 where online-softmax reassociation is
benign.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireredtts2_tpu.ops.attention import gqa_attention, gqa_attention_bounded


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


def _dense_ref(q, k, v, q_end, q_start=None):
    T = k.shape[1]
    idx = jnp.arange(T, dtype=jnp.int32)
    mask = idx[None, None, :] < q_end[..., None]          # (B, S, T)
    if q_start is not None:
        mask &= idx[None, None, :] >= q_start[..., None]
    return gqa_attention(q, k, v, mask)


@pytest.mark.parametrize("T", [64, 1280])  # single-chunk and multi-chunk
def test_bounded_matches_dense_upper_only(T):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    B, S, Hq, Hkv, D = 2, 3, 4, 2, 8
    q = _rand(ks[0], B, S, Hq, D)
    k = _rand(ks[1], B, T, Hkv, D)
    v = _rand(ks[2], B, T, Hkv, D)
    q_end = jax.random.randint(ks[3], (B, S), 1, T + 1)
    out = gqa_attention_bounded(q, k, v, q_end, jnp.max(q_end))
    ref = _dense_ref(q, k, v, q_end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("T", [64, 1280])
def test_bounded_matches_dense_with_lower_bound(T):
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    B, S, Hq, Hkv, D = 2, 3, 4, 2, 8
    q = _rand(ks[0], B, S, Hq, D)
    k = _rand(ks[1], B, T, Hkv, D)
    v = _rand(ks[2], B, T, Hkv, D)
    q_start = jax.random.randint(ks[3], (B, S), 0, T // 2)
    q_end = q_start + jax.random.randint(ks[4], (B, S), 1, T // 2)
    out = gqa_attention_bounded(q, k, v, q_end, jnp.max(q_end),
                                q_start=q_start, live_lo=jnp.min(q_start))
    ref = _dense_ref(q, k, v, q_end, q_start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_live_lo_skips_whole_chunks_exactly():
    """q_start high enough that chunk 0 (640 slots) is skipped entirely:
    the fori_loop must start at chunk 1 and still match the dense path."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, S, Hq, Hkv, D, T = 1, 2, 4, 2, 8, 1280
    q = _rand(ks[0], B, S, Hq, D)
    k = _rand(ks[1], B, T, Hkv, D)
    v = _rand(ks[2], B, T, Hkv, D)
    q_start = jnp.full((B, S), 700, jnp.int32)
    q_end = jnp.full((B, S), 1200, jnp.int32)
    out = gqa_attention_bounded(q, k, v, q_end, jnp.max(q_end),
                                q_start=q_start, live_lo=jnp.min(q_start))
    ref = _dense_ref(q, k, v, q_end, q_start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_lm_bounded_decode_optin_matches_dense(monkeypatch):
    """FRTTS2_BOUNDED_LM=1 (opt-in since r3 part 3 — dense measured
    faster for S=1 LM decode, transformer.py) must stay numerically
    equal to the dense decode path at f32."""
    from fireredtts2_tpu.config import FLAVORS
    from fireredtts2_tpu.ops import masks as mask_ops
    from fireredtts2_tpu.models.lm.transformer import (
        init_transformer_params, init_kv_cache, transformer_forward)

    tcfg = FLAVORS["tiny"]
    params = init_transformer_params(jax.random.PRNGKey(7), tcfg, jnp.float32)
    B, T_max, pos0 = 2, 32, 9
    cache0 = init_kv_cache(tcfg, B, T_max, jnp.float32)
    # Pre-populate slots [2, pos0) so the live window has a lower bound.
    kfill = jax.random.normal(jax.random.PRNGKey(8),
                              cache0["k"][:, :, 2:pos0].shape, jnp.float32)
    cache0 = {"k": cache0["k"].at[:, :, 2:pos0].set(kfill),
              "v": cache0["v"].at[:, :, 2:pos0].set(kfill * 0.5)}
    h = jax.random.normal(jax.random.PRNGKey(9), (B, 1, tcfg.embed_dim),
                          jnp.float32)
    pos = jnp.full((B, 1), pos0, jnp.int32)
    mask = mask_ops.decode_step_mask(pos, T_max)
    mask &= (jnp.arange(T_max)[None, None, :] >= 2)
    live = (jnp.full((B,), 2, jnp.int32), jnp.full((B,), pos0 + 1, jnp.int32))

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("FRTTS2_BOUNDED_LM", flag)
        monkeypatch.setenv("FRTTS2_PALLAS", "0")
        out, _ = transformer_forward(params, tcfg, h, pos, mask, dict(cache0),
                                     jnp.int32(pos0), live_window=live)
        outs[flag] = np.asarray(out)
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=2e-5, atol=2e-6)


def test_merged_slab_layout():
    """(B, T, Hkv*D) merged slabs (tile-padding-free vocoder storage)."""
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    B, S, Hq, Hkv, D, T = 2, 1, 4, 2, 8, 1280
    q = _rand(ks[0], B, S, Hq, D)
    k = _rand(ks[1], B, T, Hkv, D)
    v = _rand(ks[2], B, T, Hkv, D)
    q_end = jax.random.randint(ks[3], (B, S), 1, T + 1)
    out = gqa_attention_bounded(
        q, k.reshape(B, T, Hkv * D), v.reshape(B, T, Hkv * D),
        q_end, jnp.max(q_end))
    ref = _dense_ref(q, k, v, q_end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
