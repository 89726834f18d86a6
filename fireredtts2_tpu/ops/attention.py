"""Attention primitives: grouped-query attention over static KV slabs.

The reference uses torch SDPA everywhere (fireredtts2/codec/whisper.py:68,
torchtune attention in the LM). Here attention is a pure function over
(B, S, H, D) tensors with an explicit bool mask; KV caches live as
fixed-shape slabs owned by the model layers (no dynamic concat — decode
writes into the slab at `pos` with a dynamic-update, keeping XLA shapes
static).

softmax runs in float32 regardless of the compute dtype (bf16 weights);
masked positions get a large negative bias. A fused Pallas decode kernel
can replace `gqa_attention` without changing callers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.ops.precision import peinsum

_MASK_VALUE = -1e30


def gqa_attention(q: Array, k: Array, v: Array, mask: Array | None = None) -> Array:
    """Scaled-dot-product attention with grouped KV heads.

    Args:
        q: (B, S, Hq, D)
        k, v: (B, T, Hkv, D), Hq % Hkv == 0
        mask: bool, broadcastable to (B, Hq, S, T); True = attend.
    Returns:
        (B, S, Hq, D) in q.dtype.
    """
    B, S, Hq, D = q.shape
    _, T, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.reshape(B, S, Hkv, group, D)
    # scores: (B, Hkv, group, S, T)
    scores = peinsum("bshgd,bthd->bhgst", qf, k,
                     preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask
        if m.ndim == 3:           # (B, S, T)
            m = m[:, None, None, :, :]
        elif m.ndim == 4:         # (B, Hq, S, T)
            m = m.reshape(B, Hkv, group, S, T)
        scores = jnp.where(m, scores, _MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = peinsum("bhgst,bthd->bshgd", probs, v)
    return out.reshape(B, S, Hq, D).astype(q.dtype)


def mha_attention(q: Array, k: Array, v: Array, mask: Array | None = None) -> Array:
    """Standard multi-head attention (Hq == Hkv)."""
    return gqa_attention(q, k, v, mask)


def _slab_chunk(T: int, target: int = 640) -> int:
    """Largest divisor of T that is <= target (T itself when T <= target).
    The bounded attention slices the slab in chunks of this size; a
    divisor keeps every dynamic_slice fully in bounds (XLA CLAMPS
    out-of-range starts, which would silently double-attend slots)."""
    if T <= target:
        return T
    for n in range(-(-T // target), T + 1):
        if T % n == 0:
            return T // n
    return T


def gqa_attention_bounded(q: Array, k: Array, v: Array, q_end: Array,
                          live_hi: Array, q_start: Array | None = None,
                          live_lo: Array | None = None) -> Array:
    """Decode attention over a static KV slab that only touches LIVE slots.

    Equal to ``gqa_attention(q, k, v, mask=arange(T) < q_end[..., None])``
    up to fp32 summation order (online softmax over slab chunks; serving
    tests tolerate rtol 2e-3), provided every slot >= live_hi is masked
    for every query (max(q_end) <= live_hi). Cost scales with live_hi,
    not with the slab capacity T: a fori_loop visits only
    ceil(live_hi / chunk) chunks — with T_max = 3008 vocoder slabs the
    dense path materializes (B, H, S, 3008) fp32 scores per layer and
    measured 31 ms/block at B=16 of pure slab-capacity cost
    (tools/block_probe.py, 2026-08-18: voc 40.1 ms/block vs 9.1 with a
    768-slot slab).

    Args:
        q: (B, S, Hq, D); k, v: (B, T, Hkv, D) slabs — or MERGED
            (B, T, Hkv*D) slabs (the tile-padding-free storage for
            Dh < 128; chunks are reshaped after slicing, which XLA folds
            into the chunk materialization).
        q_end: (B, S) int32 — exclusive per-query attention bound.
        live_hi: () int32 — slots >= live_hi are dead (never attended).
        q_start: optional (B, S) int32 — INCLUSIVE per-query lower bound
            (left-padded prompts leave dead slots at the slab head; the
            LM masks them via slot_valid on the dense path).
        live_lo: optional () int32 — slots < live_lo are dead for every
            query (min over q_start); whole chunks below it are skipped.
    Returns:
        (B, S, Hq, D) in q.dtype.
    """
    B, S, Hq, D = q.shape
    T = k.shape[1]
    merged = k.ndim == 3
    Hkv = k.shape[-1] // D if merged else k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    C = _slab_chunk(T)

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.reshape(B, S, Hkv, group, D)
    qe = q_end[:, None, None, :]                        # (B, 1, 1, S)
    qs = None if q_start is None else q_start[:, None, None, :]

    first = (jnp.int32(0) if live_lo is None
             else jnp.maximum(live_lo, 0) // C)
    n_live = jnp.maximum((live_hi + C - 1) // C, first + 1)

    def _chunk(slab, i):
        if merged:
            c = jax.lax.dynamic_slice(slab, (0, i * C, 0), (B, C, Hkv * D))
            return c.reshape(B, C, Hkv, D)
        return jax.lax.dynamic_slice(slab, (0, i * C, 0, 0), (B, C, Hkv, D))

    def body(i, carry):
        m, l, acc = carry
        kc = _chunk(k, i)
        vc = _chunk(v, i)
        s = peinsum("bshgd,bthd->bhgst", qf, kc,
                    preferred_element_type=jnp.float32) * scale
        idx = i * C + jnp.arange(C, dtype=jnp.int32)
        live = idx[None, None, None, None, :] < qe[..., None]
        if qs is not None:
            live &= idx[None, None, None, None, :] >= qs[..., None]
        s = jnp.where(live, s, _MASK_VALUE)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        pv = peinsum("bhgst,bthd->bhgsd", p.astype(v.dtype), vc,
                     preferred_element_type=jnp.float32)
        acc = acc * corr[..., None] + pv
        return m_new, l, acc

    m0 = jnp.full((B, Hkv, group, S), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hkv, group, S), jnp.float32)
    a0 = jnp.zeros((B, Hkv, group, S, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_live, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    # bhgsd -> (B, S, Hq, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(q.dtype)
