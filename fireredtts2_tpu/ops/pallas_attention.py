"""Pallas TPU kernel: single-token GQA decode attention over a KV slab.

The XLA decode path materializes a (B, S, T_max) mask and runs attention
over the ENTIRE preallocated slab (ops/attention.py) — for a 3100-slot
cache that is ~1.6 MB of K + 1.6 MB of V per layer per stream read from
HBM every step, even when only 200 positions are live. This kernel:

- streams K/V from HBM in CHUNK-sized tiles with an async-DMA double
  buffer, touching ONLY the live window [start, end) of each stream's
  slab (prompts are left-padded into buckets, so the live region starts
  at the pad offset, not 0), so HBM traffic scales with the actual
  context instead of the slab capacity;
- runs flash-style running-softmax accumulation in VMEM (fp32);
- handles GQA by blocking queries as (Hkv, G, D) against per-kv-head tiles.

models/lm/transformer.py routes cached S=1 decode steps here (single-stream
and batched) when FRTTS2_PALLAS=1, with per-stream live windows computed
from LMState.slot_valid/pos in models/lm/model.py. Numerics match
ops.attention.gqa_attention with the causal/valid mask (tested in
tests/test_pallas_attention.py in interpret mode on CPU, and end-to-end
against the mask path in tests/test_lm.py).

MEASURED OFF by default (PERF.md round 2): on v5e the XLA mask path is
at-or-faster in every tested config (B=1/8/16, contexts 128-2048) — the
slab KV re-read this kernel avoids is ~0.2 ms/frame of a 7-12 ms frame,
while the kernel pays per-(layer, stream) program setup + serial DMA
latency x28 layers. The decode floor is weight re-reads (int8 attacks
that); revisit if slab lengths grow >> live windows.

Replaces: torchtune SDPA over a static mask in the reference
(fireredtts2/llm/llm.py:123-143).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # preferred KV positions per tile (DMA granularity)


def pick_chunk(T: int) -> int:
    """Largest power-of-two tile <= CHUNK that divides the slab length.
    Slabs allocated by models.lm.model.init_lm_state are 512-aligned, so
    production always gets CHUNK; tiny test slabs get smaller tiles."""
    c = CHUNK
    while c > 1 and T % c:
        c //= 2
    return c


def pallas_enabled() -> bool:
    """Should the jitted decode step trace the Pallas attention kernel?

    Default OFF: the XLA mask path measured at-or-faster on v5e at flagship
    dims (see module docstring / PERF.md). FRTTS2_PALLAS=1 opts in.
    """
    env = os.environ.get("FRTTS2_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def use_pallas_decode(head_dim: int) -> bool:
    """Route a decode step through the Pallas kernel?

    On real TPU, Mosaic requires the KV tile's lane dimension (head_dim)
    to be 128-aligned (flagship qwen flavors: 128 ✓; tiny test configs:
    16 ✗ — those fall back to the XLA mask path). Interpret mode (CPU
    tests) has no tiling constraint."""
    if not pallas_enabled():
        return False
    if jax.default_backend() == "tpu" and head_dim % 128 != 0:
        return False
    return True


def _decode_attn_kernel(start_ref,        # SMEM (B,) int32 — first live slot
                        end_ref,          # SMEM (B,) int32 — one past last
                        q_ref,            # VMEM (Hq, D) — this program's batch row
                        k_hbm,            # HBM  (B, T, Hkv, D)
                        v_hbm,            # HBM  (B, T, Hkv, D)
                        o_ref,            # VMEM (Hq, D)
                        k_buf, v_buf,     # VMEM scratch (2, chunk, Hkv, D)
                        acc_ref,          # VMEM scratch (Hq, D) fp32
                        m_ref, l_ref,     # VMEM scratch (Hq, 128) fp32
                        sems,             # DMA semaphores (2, 2)
                        *, chunk: int):
    Hq, D = q_ref.shape
    _, T, Hkv, _ = k_hbm.shape
    G = Hq // Hkv
    CHUNK = chunk

    b = pl.program_id(0)                  # grid = (B,): one program per stream
    start = start_ref[b]
    end = end_ref[b]
    c0 = start // CHUNK
    c_end = pl.cdiv(end, CHUNK)

    def k_dma(slot, c):
        return pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(c * CHUNK, CHUNK)], k_buf.at[slot],
            sems.at[0, slot])

    def v_dma(slot, c):
        return pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(c * CHUNK, CHUNK)], v_buf.at[slot],
            sems.at[1, slot])

    k_dma(c0 % 2, c0).start()
    v_dma(c0 % 2, c0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[:].astype(jnp.float32) * (1.0 / (D ** 0.5))  # (Hq, D)

    def body(c, _):
        slot = c % 2
        nxt = (c + 1) % 2

        @pl.when(c + 1 < c_end)
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
        valid = (pos_ids >= start) & (pos_ids < end)   # (1, CHUNK)

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

    jax.lax.fori_loop(c0, c_end, body, 0)
    o_ref[:] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def pallas_decode_attention(q: Array, k_slab: Array, v_slab: Array,
                            start: Array, end: Array,
                            interpret: bool | None = None) -> Array:
    """Single-token GQA decode attention over the live window [start, end).

    Args:
        q: (B, Hq, D) current-step queries.
        k_slab/v_slab: (B, T_max, Hkv, D) KV slabs (any dtype).
        start: (B,) int32 — first live slot (left-pad offset; 0 if none).
        end: (B,) int32 — one past the newest live slot (>= 1).
        interpret: force Pallas interpret mode; default = auto (interpret
            everywhere except on real TPU).
    Returns:
        (B, Hq, D) in q.dtype.
    """
    B, Hq, D = q.shape
    _, T, Hkv, _ = k_slab.shape
    chunk = pick_chunk(T)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = pl.pallas_call(
        functools.partial(_decode_attn_kernel, chunk=chunk),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        in_specs=[
            # start/end: FULL (B,) arrays in SMEM (no per-program blocking —
            # Mosaic rejects sub-8x128 blocks); the kernel indexes by
            # program_id. Same for the HBM slabs (ANY + manual DMA).
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, Hq, D), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, Hq, D), lambda b: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, Hkv, D), k_slab.dtype),
            pltpu.VMEM((2, chunk, Hkv, D), v_slab.dtype),
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )
    return kernel(start.astype(jnp.int32), end.astype(jnp.int32),
                  q, k_slab, v_slab)
