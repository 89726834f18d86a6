"""Pallas decode-attention kernel vs the XLA reference (interpret mode on
the CPU mesh; the TPU-compiled path is wired behind FRTTS2_PALLAS=1 — the
XLA mask path measured faster and is the default, see PERF.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.ops.attention import gqa_attention
from fireredtts2_tpu.ops.pallas_attention import (
    pallas_decode_attention, pick_chunk, CHUNK,
)


def _xla_reference(q, k, v, start, end):
    T = k.shape[1]
    pos = np.arange(T)[None, None, :]
    mask = (pos >= start[:, None, None]) & (pos < end[:, None, None])
    return gqa_attention(jnp.asarray(q)[:, None], jnp.asarray(k),
                         jnp.asarray(v), jnp.asarray(mask))[:, 0]


@pytest.mark.parametrize("n_live", [1, 7, CHUNK, CHUNK + 3, 2 * CHUNK - 1])
def test_pallas_decode_matches_xla(rng, n_live):
    B, Hq, Hkv, D = 2, 4, 2, 128
    T = 2 * CHUNK
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    start = np.zeros((B,), np.int32)
    end = np.array([n_live, max(1, n_live - 1)], np.int32)

    got = pallas_decode_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(start),
                                  jnp.asarray(end), interpret=True)
    want = _xla_reference(q, k, v, start, end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("start_val", [3, CHUNK - 1, CHUNK + 5])
def test_pallas_decode_left_padded_window(rng, start_val):
    """Nonzero start (left-padded prompts): only [start, end) contributes."""
    B, Hq, Hkv, D = 2, 4, 2, 128
    T = 3 * CHUNK
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    start = np.array([start_val, start_val + 1], np.int32)
    end = np.array([start_val + CHUNK + 9, start_val + 17], np.int32)

    got = pallas_decode_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(start),
                                  jnp.asarray(end), interpret=True)
    want = _xla_reference(q, k, v, start, end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("T", [64, 256])
def test_pallas_decode_small_slab_chunk_adaptivity(rng, T):
    """Tiny test slabs (< CHUNK) pick a smaller power-of-two DMA tile."""
    assert pick_chunk(T) == T
    B, Hq, Hkv, D = 1, 4, 2, 32
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    start = np.array([5], np.int32)
    end = np.array([T - 3], np.int32)

    got = pallas_decode_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(start),
                                  jnp.asarray(end), interpret=True)
    want = _xla_reference(q, k, v, start, end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pick_chunk():
    assert pick_chunk(3584) == CHUNK
    assert pick_chunk(512) == 512
    assert pick_chunk(256) == 256
    assert pick_chunk(96) == 32


def test_pallas_decode_bf16(rng):
    B, Hq, Hkv, D = 1, 4, 2, 128
    T = CHUNK
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    start = jnp.asarray([0], jnp.int32)
    end = jnp.asarray([40], jnp.int32)

    got = pallas_decode_attention(q, k, v, start, end, interpret=True)
    mask = (np.arange(T)[None, None, :] < 40)
    want = gqa_attention(q[:, None], k, v, jnp.asarray(mask))[:, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
