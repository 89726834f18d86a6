"""Matmul precision policy.

JAX's default matmul precision is allowed to downcast fp32 operands
(bf16-ish passes) on some backends. Policy here: if every operand is
float32 the caller wants genuine fp32 math (codec numerics, parity tests),
so force Precision.HIGHEST; bf16/fp16 operands take the fast single-pass
MXU path (accumulation dtype is still controlled by callers via
``preferred_element_type``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def matmul_precision(*operands: Array):
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None


def peinsum(subscripts: str, *operands: Array, **kwargs) -> Array:
    """einsum with the fp32-exactness policy applied."""
    kwargs.setdefault("precision", matmul_precision(*operands))
    return jnp.einsum(subscripts, *operands, **kwargs)
