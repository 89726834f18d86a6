"""Pallas TPU kernel: single-token GQA decode attention over a KV slab.

The XLA decode path materializes a (B, S, T_max) mask and runs attention
over the ENTIRE preallocated slab (ops/attention.py) — for a 3100-slot
cache that is ~1.6 MB of K + 1.6 MB of V per layer per stream read from
HBM every step, even when only 200 positions are live. This kernel:

- streams K/V from HBM in CHUNK-sized tiles with an async-DMA double
  buffer, stopping at the live length (per-stream `n_valid`), so HBM
  traffic scales with the actual context instead of the slab capacity;
- runs flash-style running-softmax accumulation in VMEM (fp32);
- handles GQA by blocking queries as (Hkv, G, D) against per-kv-head tiles.

Numerics match ops.attention.gqa_attention with the causal/valid mask
(tested in tests/test_pallas_attention.py, interpret mode on CPU and
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # KV positions per tile (DMA granularity)


def _decode_attn_kernel(n_valid_ref,      # SMEM (1,) int32 — live kv length
                        q_ref,            # VMEM (Hq, D)
                        k_hbm,            # HBM  (T, Hkv, D)
                        v_hbm,            # HBM  (T, Hkv, D)
                        o_ref,            # VMEM (Hq, D)
                        k_buf, v_buf,     # VMEM scratch (2, CHUNK, Hkv, D)
                        acc_ref,          # VMEM scratch (Hq, D) fp32
                        m_ref, l_ref,     # VMEM scratch (Hq, 128) fp32
                        sems):            # DMA semaphores (2, 2)
    Hq, D = q_ref.shape
    T, Hkv, _ = k_hbm.shape
    G = Hq // Hkv

    n_valid = n_valid_ref[0]
    n_chunks = pl.cdiv(n_valid, CHUNK)

    def k_dma(slot, c):
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(c * CHUNK, CHUNK)], k_buf.at[slot], sems.at[0, slot])

    def v_dma(slot, c):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(c * CHUNK, CHUNK)], v_buf.at[slot], sems.at[1, slot])

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[:].astype(jnp.float32) * (1.0 / (D ** 0.5))  # (Hq, D)

    def body(c, _):
        slot = c % 2
        nxt = (c + 1) % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            k_dma(nxt, c + 1).start()
            v_dma(nxt, c + 1).start()

        k_dma(slot, c).wait()
        v_dma(slot, c).wait()

        k = k_buf[slot].astype(jnp.float32)   # (CHUNK, Hkv, D)
        v = v_buf[slot].astype(jnp.float32)

        # scores (Hq, CHUNK): head h uses kv head h // G... our layout is
        # q rows ordered [kv0g0..kv0g{G-1}, kv1g0..]; build via per-kv dots.
        base = c * CHUNK
        pos_ids = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base
        valid = pos_ids < n_valid                      # (1, CHUNK)

        scores = jnp.concatenate([
            jax.lax.dot_general(
                q[h * G:(h + 1) * G], k[:, h, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(Hkv)
        ], axis=0)                                     # (Hq, CHUNK)
        scores = jnp.where(valid, scores, -1e30)

        m_prev = m_ref[:, :1]                          # (Hq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                # (Hq, 1)
        p = jnp.exp(scores - m_new)                    # (Hq, CHUNK)

        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p[h * G:(h + 1) * G], v[:, h, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(Hkv)
        ], axis=0)                                     # (Hq, D)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[:] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_decode_attention(q: Array, k_slab: Array, v_slab: Array,
                            n_valid: Array, interpret: bool = False) -> Array:
    """Single-token GQA decode attention.

    Args:
        q: (B, Hq, D) current-step queries.
        k_slab/v_slab: (B, T_max, Hkv, D) KV slabs (any dtype).
        n_valid: (B,) int32 — live positions (query's slot included).
    Returns:
        (B, Hq, D) in q.dtype.
    """
    B, Hq, D = q.shape
    _, T, Hkv, _ = k_slab.shape
    assert T % CHUNK == 0, (T, CHUNK)

    kernel = pl.pallas_call(
        _decode_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((Hq, D), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, Hkv, D), k_slab.dtype),
            pltpu.VMEM((2, CHUNK, Hkv, D), v_slab.dtype),
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )

    def per_b(qb, kb, vb, nb):
        return kernel(nb[None], qb, kb, vb)

    return jax.vmap(per_b)(q, k_slab, v_slab, n_valid)
