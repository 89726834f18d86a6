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
