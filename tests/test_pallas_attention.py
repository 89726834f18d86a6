"""Pallas decode-attention kernel vs the XLA reference (interpret mode on
the CPU mesh; the TPU-compiled path is exercised by bench/drives)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.ops.attention import gqa_attention
from fireredtts2_tpu.ops.pallas_attention import pallas_decode_attention, CHUNK


@pytest.mark.parametrize("n_live", [1, 7, CHUNK, CHUNK + 3, 2 * CHUNK - 1])
def test_pallas_decode_matches_xla(rng, n_live):
    B, Hq, Hkv, D = 2, 4, 2, 128
    T = 2 * CHUNK
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    n_valid = np.array([n_live, max(1, n_live - 1)], np.int32)

    got = pallas_decode_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(n_valid),
                                  interpret=True)

    # XLA reference with the validity mask
    mask = (np.arange(T)[None, None, :] < n_valid[:, None, None])
    want = gqa_attention(jnp.asarray(q)[:, None], jnp.asarray(k),
                         jnp.asarray(v), jnp.asarray(mask))[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pallas_decode_bf16(rng):
    B, Hq, Hkv, D = 1, 4, 2, 128
    T = CHUNK
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    n_valid = jnp.asarray([40], jnp.int32)

    got = pallas_decode_attention(q, k, v, n_valid, interpret=True)
    mask = (np.arange(T)[None, None, :] < 40)
    want = gqa_attention(q[:, None], k, v, jnp.asarray(mask))[:, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
