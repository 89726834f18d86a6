"""Empirical probes for the fused depth-chain kernel design (PERF.md r2
addendum: the depth decoder's 15 sequential steps re-read its weights from
HBM every step; a one-call-per-frame Pallas kernel can hold them RESIDENT
in VMEM instead).

Questions this answers on the real chip BEFORE the kernel is built:
1. How much VMEM will Mosaic actually hold resident in one pallas_call?
2. What does an int8->bf16 convert+dot cost per step when the int8 weights
   are VMEM-resident (the repeated-use cost that replaces HBM re-reads)?
3. What does the int4 float-math nibble-unpack cost at the same scale?

Usage: PYTHONPATH=/root/.axon_site:. python tools/probe_depth_kernel.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 15


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1)


def probe_vmem_capacity():
    """Find the largest int8 VMEM-resident input Mosaic accepts (grid=1)."""
    print("== VMEM residency capacity ==", flush=True)
    for mb in (32, 64, 80, 96, 104, 112, 120):
        rows = mb * (1 << 20) // 1536
        w = jnp.ones((rows, 1536), jnp.int8)
        x = jnp.ones((8, rows), jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        try:
            fn = jax.jit(lambda x, w: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 1536), jnp.bfloat16),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=130 * (1 << 20)),
            )(x, w))
            dt = _time(fn, x, w)
            print(f"  {mb:4d} MB resident int8: OK  ({dt*1e3:.2f} ms/call)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"  {mb:4d} MB resident int8: FAIL  {msg}", flush=True)
            break


def probe_int8_reuse(mb: int = 64):
    """Cost of STEPS sequential (8, D) @ (D, O) dots re-reading a resident
    int8 weight from VMEM with convert-to-bf16 per use."""
    D = 1536
    O = mb * (1 << 20) // D  # total output cols so that w is `mb` MB
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

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((8, 1), jnp.float32))
        o_ref[...] = acc

    fn = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * (1 << 20)),
    )(x, w))
    dt = _time(fn, x, w)
    per_step = dt / STEPS
    rate = mb / (1 << 10) / per_step
    print(f"== int8 VMEM reuse: {mb} MB x {STEPS} steps: "
          f"{dt*1e3:.2f} ms total, {per_step*1e3:.3f} ms/step "
          f"({rate:.1f} GB/s effective convert+dot)", flush=True)


def probe_int4_reuse(mb_packed: int = 48, group: int = 128):
    """Same, but int4 packed nibbles unpacked with the float-math trick
    (ops/pallas_int4.py) on every use."""
    D = 1536
    O = mb_packed * (1 << 20) // (D // 2)
    w = jnp.ones((D // 2, O), jnp.int8)
    s = jnp.ones((D // group, O), jnp.float32)
    x = jnp.ones((8, D), jnp.bfloat16)

    def kernel(x_ref, w_ref, s_ref, o_ref):
        def body(i, acc):
            p = w_ref[...].astype(jnp.float32)
            hi = jnp.floor(p * 0.0625)
            u = p - 16.0 * hi
            lo = u - 16.0 * (u >= 8.0).astype(jnp.float32)
            wf = jnp.concatenate([lo, hi], axis=0)
            n_groups = s_ref.shape[0]
            wf = ((wf.reshape(n_groups, -1, wf.shape[1]) * s_ref[...][:, None, :])
                  .reshape(wf.shape)).astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                x_ref[...], wf, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(y, axis=1, keepdims=True)

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((8, 1), jnp.float32))
        o_ref[...] = acc

    fn = jax.jit(lambda x, w, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * (1 << 20)),
    )(x, w, s))
    dt = _time(fn, x, w, s)
    per_step = dt / STEPS
    print(f"== int4 VMEM reuse: {mb_packed} MB packed x {STEPS} steps: "
          f"{dt*1e3:.2f} ms total, {per_step*1e3:.3f} ms/step "
          f"(= {2*mb_packed/(1<<10)/per_step:.1f} GB/s unpacked-equivalent)",
          flush=True)


def probe_streamed_int8(mb: int = 64, chunk_mb: int = 8):
    """Double-buffered HBM->VMEM streaming of int8 weights + dot per chunk:
    the per-step cost of the NON-resident weight portion."""
    D = 1536
    O = mb * (1 << 20) // D
    chunk_cols = chunk_mb * (1 << 20) // D
    n_chunks = O // chunk_cols
    w = jnp.ones((D, O), jnp.int8)
    x = jnp.ones((8, D), jnp.bfloat16)

    def kernel(x_ref, w_hbm, o_ref):
        def body(scratch, sem):
            def get_dma(slot, c):
                return pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds(c * chunk_cols, chunk_cols)],
                    scratch.at[slot], sem.at[slot])

            def step(s, acc):
                def chunk_body(c, acc2):
                    slot = c % 2

                    @pl.when(c + 1 < n_chunks)
                    def _():
                        get_dma((c + 1) % 2, c + 1).start()

                    get_dma(slot, c).wait()
                    y = jax.lax.dot_general(
                        x_ref[...], scratch[slot].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
                    return acc2 + jnp.sum(y, axis=1, keepdims=True)

                get_dma(0, 0).start()
                return jax.lax.fori_loop(0, n_chunks, chunk_body, acc)

            acc = jax.lax.fori_loop(
                0, STEPS, step, jnp.zeros((8, 1), jnp.float32))
            o_ref[...] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((2, D, chunk_cols), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        )

    fn = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * (1 << 20)),
    )(x, w))
    dt = _time(fn, x, w)
    per_step = dt / STEPS
    rate = mb / (1 << 10) / per_step
    print(f"== int8 HBM stream: {mb} MB x {STEPS} steps (chunk {chunk_mb} MB): "
          f"{dt*1e3:.2f} ms, {per_step*1e3:.3f} ms/step ({rate:.1f} GB/s)",
          flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    probe_vmem_capacity()
    for mb in (32, 64, 96):
        probe_int8_reuse(mb)
    for mbp in (24, 48, 80):
        probe_int4_reuse(mbp)
    probe_streamed_int8(64, 8)
    probe_streamed_int8(110, 8)
