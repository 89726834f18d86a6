"""Attention / padding mask builders.

Behavioral parity targets (shapes & semantics, not code) from the reference:
- make_pad_mask / make_nonpad_mask: fireredtts2/codec/utils.py:5-16
- block-causal mask (streaming vocoder, chunk=8): fireredtts2/codec/utils.py:19-38
- LM causal mask + per-step row indexing: fireredtts2/llm/llm.py:16-30

All functions take a static ``max_len`` so jitted callers keep static shapes
(the reference derives it from ``lengths.max()`` at runtime, which would
force a recompile per length on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def nonpad_mask(lengths: Array, max_len: int) -> Array:
    """True where position < length. Returns (B, max_len) bool."""
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return pos < lengths.astype(jnp.int32)[:, None]


def pad_mask(lengths: Array, max_len: int) -> Array:
    """True at padding positions. Returns (B, max_len) bool."""
    return ~nonpad_mask(lengths, max_len)


def causal_mask(seq_len: int) -> Array:
    """Lower-triangular (seq_len, seq_len) bool mask; True = attend."""
    return jnp.tril(jnp.ones((seq_len, seq_len), dtype=jnp.bool_))


def block_causal_mask(lengths: Array, max_len: int, chunk_size: int) -> Array:
    """Block-causal attention: position i attends to j iff j is in the same
    ``chunk_size`` block as i or any earlier position, and both are non-pad.

    This is the streaming vocoder's attention pattern: one 12.5 Hz token
    expands to 8 latents at 100 Hz, so attention is causal at 8-latent
    granularity (reference fireredtts2/codec/decoder.py:263-266).

    Returns (B, max_len, max_len) bool; True = attend.
    """
    valid = nonpad_mask(lengths, max_len)  # (B, T)
    pair_valid = valid[:, :, None] & valid[:, None, :]
    blk = jnp.arange(max_len, dtype=jnp.int32) // chunk_size
    allowed = blk[:, None] >= blk[None, :]  # same or earlier block
    return pair_valid & allowed[None, :, :]


def decode_step_mask(input_pos: Array, max_seq_len: int) -> Array:
    """Causal-mask rows for incremental decode against a KV slab.

    For query tokens at absolute positions ``input_pos`` (B, S), returns
    (B, S, max_seq_len) bool where entry [b, s, j] is True iff
    j <= input_pos[b, s] — i.e. the row of the full causal mask the
    reference gathers with `_index_causal_mask` (fireredtts2/llm/llm.py:20-30).
    """
    kv_pos = jnp.arange(max_seq_len, dtype=jnp.int32)[None, None, :]
    return kv_pos <= input_pos.astype(jnp.int32)[:, :, None]
