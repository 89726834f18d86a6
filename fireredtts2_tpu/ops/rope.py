"""Rotary position embeddings.

The LM backbone/decoder follow Qwen2 via torchtune (reference
fireredtts2/llm/modules.py:1-2). HF/torchtune Qwen2 applies RoPE with the
HALF-SPLIT (rotate_half) convention: the head dim is split into two halves
(x1, x2) rotated as (x1*cos - x2*sin, x2*cos + x1*sin) with angle index i
covering channel pairs (i, i + d/2). The interleaved (llama-original)
convention pairs (2i, 2i+1) instead. Checkpoint compatibility requires
half-split; both are provided.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def rope_angles(positions: Array, head_dim: int, base: float) -> tuple[Array, Array]:
    """cos/sin tables for given absolute positions.

    Args:
        positions: (...,) int positions.
    Returns:
        (cos, sin), each (..., head_dim//2) float32.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: Array, cos: Array, sin: Array, interleaved: bool = False) -> Array:
    """Rotate q/k by position-dependent angles.

    Args:
        x: (B, S, H, D).
        cos/sin: (B, S, D//2) from :func:`rope_angles`.
        interleaved: pair channels (2i, 2i+1) instead of (i, i+D/2).
    """
    d = x.shape[-1]
    c = cos[..., None, :].astype(jnp.float32)  # (B, S, 1, D/2)
    s = sin[..., None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        out = jnp.stack([r1, r2], axis=-1).reshape(*x.shape[:-1], d)
    else:
        x1 = xf[..., :d // 2]
        x2 = xf[..., d // 2:]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(x.dtype)
