"""Pallas TPU kernel: matmul with int4 weight-only dequant fused in VMEM.

XLA does not fuse nibble-unpack + group-dequant into a dot: it
materializes the dequantized bf16 weights in HBM, making int4 SLOWER than
int8 (PERF.md round-2 addendum: 16.2 vs 7.4 ms/frame). This kernel streams
the PACKED weights (0.5 byte/param) from HBM in output-column tiles via
Mosaic's pipelined BlockSpecs, unpacks and dequants in VMEM, and feeds the
MXU — HBM weight traffic stays at the packed size.

Packing layout (quantize_transformer_int4): row i of the packed matrix
holds input rows i (low nibble) and i + I/2 (high nibble), so the VMEM
unpack is a contiguous concat along sublanes — no strided interleave.

The depth decoder is the customer: its weights are re-read 15x per 80 ms
frame (the per-frame device floor). int8 weight streaming costs ~3.5 ms of
weight reads per frame; int4 through this kernel halves that again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(O: int, I: int, budget_bytes: int = 6 << 20) -> int:
    """Largest multiple of 128 dividing O whose unpacked bf16 weight tile
    (I x O_t x 2 bytes) fits the VMEM working-set budget (Mosaic's scoped
    vmem is ~16 MB; leave room for the double-buffered packed tile and
    activations). Falls back to the smallest divisor tile."""
    cap = max(128, budget_bytes // (I * 2))
    best = 0
    t = 128
    while t <= min(O, cap):
        if O % t == 0:
            best = t
        t += 128
    if best:
        return best
    return O if O < 128 else 128 if O % 128 == 0 else O


def _int4_mm_kernel(x_ref,      # VMEM (B, I) activations
                    w_ref,      # VMEM (I/2, O_t) packed nibbles (auto-DMA)
                    s_ref,      # VMEM (I/g, O_t) fp32 group scales
                    o_ref):     # VMEM (B, O_t)
    # Mosaic has no vector shift-left (arith.shli fails to legalize) and
    # int32 intermediates blow the scoped-vmem stack, so unpack with FLOAT
    # math: hi = floor(p / 16) (== arithmetic >> 4 of the signed byte);
    # u = p - 16*hi (the unsigned low nibble); lo = u - 16*[u >= 8]
    # (its sign extension).
    p = w_ref[...].astype(jnp.float32)
    hi = jnp.floor(p * 0.0625)                         # rows [I/2, I)
    u = p - 16.0 * hi
    lo = u - 16.0 * (u >= 8.0).astype(jnp.float32)     # rows [0, I/2)
    w = jnp.concatenate([lo, hi], axis=0)              # (I, O_t) f32
    n_groups = s_ref.shape[0]
    w = ((w.reshape(n_groups, -1, w.shape[1]) * s_ref[...][:, None, :])
         .reshape(w.shape)).astype(jnp.bfloat16)
    x = x_ref[...].astype(jnp.bfloat16)
    # precision MUST be pinned: the package default
    # jax_default_matmul_precision="float32" would request an upcast dot
    # Mosaic cannot legalize on bf16 operands ("Bad lhs type").
    o_ref[...] = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def int4_matmul(x: Array, packed: Array, scales: Array,
                interpret: bool | None = None) -> Array:
    """x (..., I) @ int4-packed W (I/2, O) with group scales (I/g, O).

    Returns (..., O) in x.dtype (accumulation fp32).
    """
    orig_shape = x.shape
    I2, O = packed.shape
    x2 = x.reshape(-1, orig_shape[-1])
    B = x2.shape[0]
    # Mosaic rejects bf16 matmul lhs with < 8 sublane rows ("Bad lhs
    # type"); pad activations to full sublanes (zero rows are free).
    Bp = -(-B // 8) * 8
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    O_t = _pick_tile(O, I2 * 2)

    out = pl.pallas_call(
        _int4_mm_kernel,
        grid=(O // O_t,),
        in_specs=[
            pl.BlockSpec((Bp, x2.shape[1]), lambda o: (0, 0)),
            pl.BlockSpec((I2, O_t), lambda o: (0, o)),
            pl.BlockSpec((scales.shape[0], O_t), lambda o: (0, o)),
        ],
        out_specs=pl.BlockSpec((Bp, O_t), lambda o: (0, o)),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        interpret=interpret,
    )(x2, packed, scales)
    return out[:B].reshape(*orig_shape[:-1], O)


def int4_kernel_enabled() -> bool:
    """Use the Pallas int4 kernel for int4-quantized matmuls? Default: only
    on real TPU (interpret mode is for tests); FRTTS2_INT4_KERNEL=0/1
    overrides."""
    import os

    env = os.environ.get("FRTTS2_INT4_KERNEL")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"
