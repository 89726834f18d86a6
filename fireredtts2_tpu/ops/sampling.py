"""On-device token sampling.

Parity targets (distributional semantics) from the reference:
- top-k + temperature with the exponential-race multinomial trick
  (no host sync): fireredtts2/llm/llm.py:34-49
- top-nσ filtering: fireredtts2/llm/llm.py:52-72

The exponential race — argmax(probs / q), q ~ Exp(1) — is the Gumbel-max
trick; on TPU we draw q with JAX's counter-based PRNG so the whole sample
lives inside the jitted decode step (no host round-trip, mirroring why the
reference avoids a CUDA sync).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_NEG_INF = -1e30  # plain float: no device alloc at import time


def topk_filter(logits: Array, k: int) -> Array:
    """Mask logits below the k-th largest to -inf. Static k."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def topk_filter_dynamic(logits: Array, k: Array, k_cap: int = 64) -> Array:
    """Mask logits below the k-th largest with TRACED k (scalar or one k per
    leading row), clamped to [1, k_cap]. Serving needs per-request top-k
    inside ONE compiled batched step (the reference honors caller topk per
    request, fireredtts2/fireredtts2.py:131-143); a static `k` would force
    one compiled program per distinct k."""
    k_cap = min(k_cap, logits.shape[-1])
    vals = jax.lax.top_k(logits, k_cap)[0]  # (..., k_cap) sorted desc
    k = jnp.clip(jnp.asarray(k, jnp.int32), 1, k_cap)
    idx = jnp.broadcast_to(k - 1, logits.shape[:-1])[..., None]
    kth = jnp.take_along_axis(vals, idx, axis=-1)
    return jnp.where(logits < kth, _NEG_INF, logits)


def top_nsigma_filter(logits: Array, n: float) -> Array:
    """Keep logits within n standard deviations of the max."""
    mx = jnp.max(logits, axis=-1, keepdims=True)
    # ddof=1 to match torch.std's default (unbiased).
    mean = jnp.mean(logits, axis=-1, keepdims=True)
    denom = logits.shape[-1] - 1
    var = jnp.sum((logits - mean) ** 2, axis=-1, keepdims=True) / denom
    thr = mx - n * jnp.sqrt(var)
    return jnp.where(logits < thr, _NEG_INF, logits)


def exponential_race_sample(probs: Array, key: Array) -> Array:
    """argmax(probs / q) with q ~ Exp(1): exact categorical sample.

    Returns int32 indices of shape probs.shape[:-1].
    """
    q = jax.random.exponential(key, probs.shape, dtype=jnp.float32)
    return jnp.argmax(probs.astype(jnp.float32) / q, axis=-1).astype(jnp.int32)


def sample_topk(logits: Array, k: int | Array, temperature: float | Array,
                key: Array) -> Array:
    """Temperature + top-k sampling; returns int32 (...,) token ids.

    `k` may be a static int (one compiled filter) or a traced array
    (per-row k inside one compiled program — the continuous batcher's
    per-request top-k). Temperature must be > 0; use :func:`greedy` for
    argmax.
    """
    logits = logits.astype(jnp.float32) / temperature
    if isinstance(k, int):
        filtered = topk_filter(logits, k)
    else:
        filtered = topk_filter_dynamic(logits, k)
    probs = jax.nn.softmax(filtered, axis=-1)
    return exponential_race_sample(probs, key)


def sample_top_nsigma(logits: Array, n: float, temperature: float | Array,
                      key: Array) -> Array:
    logits = logits.astype(jnp.float32) / temperature
    filtered = top_nsigma_filter(logits, n)
    probs = jax.nn.softmax(filtered, axis=-1)
    return exponential_race_sample(probs, key)


def greedy(logits: Array) -> Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
