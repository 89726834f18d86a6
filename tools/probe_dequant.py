"""Where does the fused depth-chain kernel's residual ~2.5 ms/frame go?

Round-3 A/B data (tools/depth_only.py) showed the overhead over the
2.15 ms streaming-DMA floor is BATCH-INDEPENDENT (B=8 ~= B=1) and
CHUNK-COUNT-INDEPENDENT ((3,2) ~= (5,4)) — which points at the per-use
int8 -> bf16 weight dequantization (165 MB of converts x 16 steps
= 2.6 G element-converts per frame), not DMA issue overhead.

This probe separates the dot cost from the convert cost on the real chip:

1. bf16-resident dot   — no convert (the floor for a W-bf16 MXU dot)
2. int8-resident dot   — convert + dot (what the kernel does today)
3. s8 x s8 int32 dot   — native int8 MXU path, activations quantized
                         (what a W8A8 plan mode would do)

All at depth-kernel-like shapes (D=896 contraction, 8-row activations).
Rates are GB/s-of-int8-equivalent so rows compare directly: if (2) is
much slower than (1) per element, the convert dominates and W8A8 (3) or
a cheaper convert is the next lever; if (1) ~= (2), the kernel is at its
compute floor and the remaining gap is elsewhere.

Usage: PYTHONPATH=/root/.axon_site:. python tools/probe_dequant.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

# 15 depth steps x REPEATS so on-kernel time (>300 ms) dwarfs the ~30 ms
# tunnel RTT — a single 15-step pass is ~2 ms and the RTT would be 94% of
# the measurement.
STEPS = 15 * 16
D = 896  # depth-transformer contraction dim at flagship scale


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)  # tunnel-safe completion (CLAUDE.md)
        best = min(best, time.perf_counter() - t0)
    return best


def _reuse_call(kernel, inputs, vmem_mb=128):
    return jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * (1 << 20)),
    )(*a))


def probe_bf16_reuse(mb_int8_equiv: int = 48):
    """STEPS sequential (8, D) @ (D, O) dots, weights ALREADY bf16 in VMEM.
    O sized so the int8 EQUIVALENT is `mb_int8_equiv` MB (the bf16 tensor
    itself is 2x that, bounding O by VMEM)."""
    O = mb_int8_equiv * (1 << 20) // D
    w = jnp.ones((D, O), jnp.bfloat16)
    x = jnp.ones((8, D), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        def body(i, acc):
            y = jax.lax.dot_general(
                x_ref[...], w_ref[...],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(y, axis=1, keepdims=True)
        o_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((8, 1), jnp.float32))

    dt = _time(_reuse_call(kernel, (x, w)), x, w)
    per = dt / STEPS
    print(f"bf16 resident dot : {mb_int8_equiv:3d} MB-eq x {STEPS}: "
          f"{dt*1e3:7.2f} ms, {per*1e3:6.3f} ms/step "
          f"({mb_int8_equiv/(1<<10)/per:6.1f} GB/s-eq)", flush=True)
    return per / (mb_int8_equiv * (1 << 20))


def probe_int8_reuse(mb: int = 48):
    """Same dots, int8-resident with per-use .astype(bf16) (today's path)."""
    O = mb * (1 << 20) // D
    w = jnp.ones((D, O), jnp.int8)
    x = jnp.ones((8, D), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        def body(i, acc):
            y = jax.lax.dot_general(
                x_ref[...], w_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(y, axis=1, keepdims=True)
        o_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((8, 1), jnp.float32))

    dt = _time(_reuse_call(kernel, (x, w)), x, w)
    per = dt / STEPS
    print(f"int8 convert+dot  : {mb:3d} MB    x {STEPS}: "
          f"{dt*1e3:7.2f} ms, {per*1e3:6.3f} ms/step "
          f"({mb/(1<<10)/per:6.1f} GB/s-eq)", flush=True)
    return per / (mb * (1 << 20))


def probe_s8s8_reuse(mb: int = 48):
    """s8 x s8 dot with int32 accumulation (native MXU int8 path; what a
    W8A8 plan mode would run — activations dynamically quantized)."""
    O = mb * (1 << 20) // D
    w = jnp.ones((D, O), jnp.int8)
    x = jnp.ones((8, D), jnp.int8)

    def kernel(x_ref, w_ref, o_ref):
        def body(i, acc):
            y = jax.lax.dot_general(
                x_ref[...], w_ref[...],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32)
            return acc + jnp.sum(y.astype(jnp.float32), axis=1,
                                 keepdims=True)
        o_ref[...] = jax.lax.fori_loop(
            0, STEPS, body, jnp.zeros((8, 1), jnp.float32))

    try:
        dt = _time(_reuse_call(kernel, (x, w)), x, w)
    except Exception as e:  # noqa: BLE001
        print(f"s8xs8 int32 dot   : UNSUPPORTED ({str(e).splitlines()[0][:90]})",
              flush=True)
        return None
    per = dt / STEPS
    print(f"s8xs8 int32 dot   : {mb:3d} MB    x {STEPS}: "
          f"{dt*1e3:7.2f} ms, {per*1e3:6.3f} ms/step "
          f"({mb/(1<<10)/per:6.1f} GB/s-eq)", flush=True)
    return per / (mb * (1 << 20))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    rates = {}
    rates["bf16"] = probe_bf16_reuse(48)
    rates["int8"] = probe_int8_reuse(48)
    rates["s8s8"] = probe_s8s8_reuse(48)
    # Frame-level projection: the serving plan touches 165 MB of int8
    # depth weights per step x 16 steps = 2.64 G element-uses per frame.
    bytes_per_frame = 165 * (1 << 20) * 16
    for k, r in rates.items():
        if r is not None:
            print(f"projected depth-dot cost/frame [{k}]: "
                  f"{r*bytes_per_frame*1e3:6.2f} ms", flush=True)
