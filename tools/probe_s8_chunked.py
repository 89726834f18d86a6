"""Is the MXU's int8 mode a 2x weight-load lever in the KERNEL's regime?

tools/probe_dequant.py measured monolithic (8, 896) @ (896, 56k) dots and
found bf16 == int8+convert == s8xs8 (~345 G elem/s). But that shape runs
FAR below the chip's small-M weight-load wall: the fused depth kernel's
chunked dots reach ~630 G elem/s and the XLA backbone ~740, against a
~770 G elem/s analytic ceiling for bf16 weights at M<=8 rows
(4 MXUs x 128 lanes x ~1.5 GHz — each MXU consumes one 128-wide bf16
weight row per cycle). The monolithic probe was bound elsewhere, so its
"s8 buys nothing" conclusion does not transfer.

The physical question: v5e's int8 MXU mode is 2x bf16 TOPS — does it also
consume WEIGHT ELEMENTS at 2x/cycle (halved bits through a fixed-width
load path)? If yes, a W8A8 depth plan halves the dot-issue floor and the
kernel drops to its 2.15 ms/frame DMA floor.

This probe replays the kernel's ACTUAL dot schedule — flagship depth dims
(D=1536, Ih=4480 split q=2 -> 2304+2176 column chunks, 4 layers x
2 halves x {gate resident, up, down}) — all weights VMEM-resident so DMA
is out of the picture; only the dot/convert path varies:

  bf16   : weights bf16        (the no-quant floor)
  int8   : weights int8, per-use astype(bf16) (today's r8/s8 dot)
  s8s8   : weights int8, activations quantized per row OUTSIDE the loop,
           native s8 x s8 -> int32 dot, fp32 rescale per chunk
  s8s8q  : like s8s8 but the activation row is re-quantized INSIDE the
           loop per layer-half (the real W8A8 recipe: x changes per layer)

Also sweeps M (8, 16, 32) to map the rows-per-use scaling for batched
serving and Jacobi projections.

Usage: PYTHONPATH=/root/.axon_site:. python tools/probe_s8_chunked.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

D = 1536           # depth embed dim (qwen-200m flavor at flagship)
SPLITS = (2304, 2176)  # q=2 cut of Ih = 4480 (18 + 17 lane tiles)
LAYERS = 4
REPS = 320         # simulated frames per timed call (4-layer step each);
                   # high so on-kernel time dwarfs the ~30 ms tunnel RTT


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _call(kernel, inputs, out_rows):
    return jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * (1 << 20)),
    )(*a))


def _mk_weights(dtype):
    """One layer's worth of {in-proj chunks, down chunks}; reused for all
    LAYERS (weight CONTENT doesn't matter for issue rate, residency does —
    one layer of unique tensors keeps total VMEM under 3 x 48 MB)."""
    ws = []
    for w in SPLITS:
        ws.append(jnp.ones((D, w), dtype))      # gate chunk
        ws.append(jnp.ones((D, w), dtype))      # up chunk
        ws.append(jnp.ones((w, D), dtype))      # down chunk
    return ws


def _elements_per_step():
    per_half = sum(D * w * 3 for w in SPLITS)  # gate+up+down both chunks
    return per_half * LAYERS


def probe(mode: str, m: int) -> float | None:
    wdtype = jnp.bfloat16 if mode == "bf16" else jnp.int8
    ws = _mk_weights(wdtype)
    x = jnp.ones((m, D), jnp.bfloat16)

    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]

        def body(i, acc):
            xrow = x_ref[...]
            if mode == "s8s8":
                # quantize once per step (bounds the quant cost at 1/LAYERS
                # of the real recipe)
                s = jnp.max(jnp.abs(xrow.astype(jnp.float32)), axis=1,
                            keepdims=True) / 127.0
                xq = jnp.clip(jnp.round(xrow.astype(jnp.float32)
                                        / s), -127, 127).astype(jnp.int8)
            tot = jnp.zeros((m, 1), jnp.float32)
            for l in range(LAYERS):
                if mode == "s8s8q":
                    s = jnp.max(jnp.abs(xrow.astype(jnp.float32)), axis=1,
                                keepdims=True) / 127.0
                    xq = jnp.clip(jnp.round(xrow.astype(jnp.float32)
                                            / s), -127, 127).astype(jnp.int8)
                for wi, wref in enumerate(w_refs):
                    w = wref[...]
                    down = (wi % 3) == 2
                    if mode == "bf16":
                        y = jax.lax.dot_general(
                            xrow if not down else jnp.ones(
                                (m, w.shape[0]), jnp.bfloat16),
                            w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    elif mode == "int8":
                        y = jax.lax.dot_general(
                            xrow if not down else jnp.ones(
                                (m, w.shape[0]), jnp.bfloat16),
                            w.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        xin = (xq if not down else
                               jnp.ones((m, w.shape[0]), jnp.int8))
                        yi = jax.lax.dot_general(
                            xin, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        y = yi.astype(jnp.float32) * (s if not down else 1.0)
                    tot = tot + jnp.sum(y, axis=1, keepdims=True)
            return acc + tot
        o_ref[...] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((m, 1), jnp.float32))

    try:
        dt = _time(_call(kernel, (x, *ws), m), x, *ws)
    except Exception as e:  # noqa: BLE001
        print(f"{mode:6s} M={m:3d}: UNSUPPORTED "
              f"({str(e).splitlines()[0][:100]})", flush=True)
        return None
    per = dt / REPS
    elems = _elements_per_step()
    rate = elems / per / 1e9
    print(f"{mode:6s} M={m:3d}: {per*1e3:7.3f} ms/step "
          f"({elems/1e6:.0f}M elems -> {rate:6.1f} G elem/s)", flush=True)
    return rate


def probe_step(m: int, parts: str) -> float | None:
    """Replica of ONE depth step at flagship dims with weights RESIDENT
    (one layer's tensors reused LAYERS times — content is irrelevant to
    issue rate, and unique 4-layer weights would blow VMEM). `parts`
    toggles the non-MLP structure so deltas attribute the real kernel's
    gap over the pure-dot floor:

      mlp            : gate/up/down chunk dots only (== probe('int8'))
      mlp+attn       : + QKV/O dots, rope, whole-window softmax-attention
      mlp+attn+samp  : + head dot, top-k filter, exponential-race sampling
    """
    Hq, Hkv, Dh, ncb, Vp = 12, 2, 128, 16, 2176
    G = Hq // Hkv
    ws = _mk_weights(jnp.int8)
    wq = jnp.ones((D, Hq * Dh), jnp.int8)
    wk = jnp.ones((D, Hkv * Dh), jnp.int8)
    wv = jnp.ones((D, Hkv * Dh), jnp.int8)
    wo = jnp.ones((Hq * Dh, D), jnp.int8)
    head = jnp.ones((D, Vp), jnp.bfloat16)
    x = jnp.ones((m, D), jnp.bfloat16)
    attn = "attn" in parts
    samp = "samp" in parts

    def rope1(xh):
        # constant-angle rotation (cost model only cares about the op mix)
        d = xh.shape[-1]
        cos = jnp.full((1, d // 2), 0.8, jnp.float32)
        sin = jnp.full((1, d // 2), 0.6, jnp.float32)
        xf = xh.astype(jnp.float32)
        x1, x2 = xf[:, : d // 2], xf[:, d // 2:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin],
            axis=-1).astype(xh.dtype)

    def kernel(x_ref, *refs):
        # pallas_call ref order: (*inputs, *outputs, *scratch)
        (wq_r, wk_r, wv_r, wo_r, head_r), w_refs = refs[:5], refs[5:-3]
        o_ref = refs[-3]
        k_store, v_store = refs[-2], refs[-1]

        def body(i, acc):
            h = x_ref[...]
            p = jnp.minimum(i, ncb - 1)
            for l in range(LAYERS):
                if attn:
                    q = jax.lax.dot_general(
                        h, wq_r[...].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                    k = jax.lax.dot_general(
                        h, wk_r[...].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                    v = jax.lax.dot_general(
                        h, wv_r[...].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                    qg = [jnp.concatenate(
                        [q[:, (hkv * G + g) * Dh:(hkv * G + g + 1) * Dh]
                         for hkv in range(Hkv)], axis=1).reshape(m * Hkv, Dh)
                        for g in range(G)]
                    qh = rope1(jnp.concatenate(qg, axis=0))
                    kh = rope1(k.reshape(m * Hkv, Dh))
                    vh = v.reshape(m * Hkv, Dh)
                    k_store[l, pl.ds(0, 1)] = kh[None]
                    v_store[l, pl.ds(0, 1)] = vh[None]
                    qf = qh.astype(jnp.float32) * (1.0 / (Dh ** 0.5))
                    k3 = pltpu.repeat(k_store[l], G, axis=1
                                      ).astype(jnp.float32)
                    s3 = jnp.sum(qf[None, :, :] * k3, axis=-1)
                    tpos = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 0)
                    s3 = jnp.where(tpos <= p, s3, -1e30)
                    mx = jnp.max(s3, axis=0, keepdims=True)
                    ex = jnp.exp(s3 - mx)
                    pr = (ex / jnp.sum(ex, axis=0, keepdims=True))
                    v3 = pltpu.repeat(v_store[l], G, axis=1
                                      ).astype(jnp.float32)
                    vsel = jnp.where(tpos[:, :, None] <= p, v3, 0.0)
                    av = jnp.sum(pr[:, :, None] * vsel, axis=0
                                 ).astype(jnp.bfloat16)
                    op = [av[g * m * Hkv:(g + 1) * m * Hkv
                             ].reshape(m, Hkv * Dh) for g in range(G)]
                    o = jnp.concatenate(
                        [op[h2 % G][:, (h2 // G) * Dh:(h2 // G + 1) * Dh]
                         for h2 in range(Hq)], axis=1)
                    h = h + jax.lax.dot_general(
                        o, wo_r[...].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                for wi, wref in enumerate(w_refs):
                    w = wref[...]
                    down = (wi % 3) == 2
                    y = jax.lax.dot_general(
                        h if not down else jnp.ones(
                            (m, w.shape[0]), jnp.bfloat16),
                        w.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + jnp.sum(y, axis=1, keepdims=True)
            if samp:
                logits = jax.lax.dot_general(
                    h, head_r[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lf = logits / 0.75
                cur = lf
                for _ in range(9):
                    mxs = jnp.max(cur, axis=-1, keepdims=True)
                    cur = jnp.where(cur >= mxs, -1e30, cur)
                kth = jnp.max(cur, axis=-1, keepdims=True)
                filt = jnp.where(lf < kth, -1e30, lf)
                mm = jnp.max(filt, axis=-1, keepdims=True)
                ex2 = jnp.exp(filt - mm)
                pr2 = ex2 / jnp.sum(ex2, axis=-1, keepdims=True)
                mx2 = jnp.max(pr2, axis=-1, keepdims=True)
                ids = jax.lax.broadcasted_iota(jnp.int32, pr2.shape, 1)
                tok = jnp.min(jnp.where(pr2 >= mx2, ids, Vp), axis=-1,
                              keepdims=True)
                acc = acc + tok.astype(jnp.float32)
            return acc

        o_ref[...] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((m, 1), jnp.float32))

    inputs = (x, wq, wk, wv, wo, head, *ws)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((LAYERS, ncb, m * Hkv, Dh), jnp.bfloat16),
            pltpu.VMEM((LAYERS, ncb, m * Hkv, Dh), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * (1 << 20)),
    )(*a))
    try:
        dt = _time(fn, *inputs)
    except Exception as e:  # noqa: BLE001
        print(f"step[{parts:13s}] M={m:3d}: FAILED "
              f"({str(e).splitlines()[0][:100]})", flush=True)
        return None
    per = dt / REPS
    print(f"step[{parts:13s}] M={m:3d}: {per*1e3:7.3f} ms/step "
          f"-> x15 = {per*15*1e3:6.2f} ms/frame-eq", flush=True)
    return per


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind} "
          f"elems/step={_elements_per_step()/1e6:.0f}M", flush=True)
    for m in (8, 16, 32):
        for mode in ("bf16", "int8", "s8s8", "s8s8q"):
            probe(mode, m)
    # Attribution: deltas between these isolate attention-VPU and
    # sampling cost in the real kernel's structure, with zero DMA.
    for parts in ("mlp", "mlp+attn", "mlp+attn+samp"):
        probe_step(8, parts)
