"""Rotary position embeddings (Qwen2/Llama style, matching torchtune's
RotaryPositionalEmbeddings semantics used by the reference backbone via
`torchtune.models.qwen2` — fireredtts2/llm/modules.py:1-2).

torchtune applies RoPE by viewing the head dim as interleaved (x[..., ::2],
x[..., 1::2]) pairs rotated by theta_i = base^(-2i/d) * pos.
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


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate interleaved pairs of the last dim.

    Args:
        x: (B, S, H, D) query or key.
        cos/sin: (B, S, D//2) (or broadcastable) from :func:`rope_angles`.
    """
    d = x.shape[-1]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[..., None, :].astype(x.dtype)  # (B, S, 1, D/2)
    s = sin[..., None, :].astype(x.dtype)
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    # Re-interleave
    out = jnp.stack([r1, r2], axis=-1).reshape(*x.shape[:-1], d)
    return out
