"""Qwen2-family decoder-only transformer as pure functions over a pytree.

Replaces the reference's torchtune `TransformerDecoder` (used via
fireredtts2/llm/modules.py:1-2 with the cache API at
fireredtts2/llm/llm.py:123-143) with a TPU-first design:

- layer parameters are STACKED along a leading L axis and the layer loop is
  a `lax.scan` — one compiled layer body regardless of depth (36 layers for
  qwen-3b), fast compiles and uniform sharding;
- the KV cache is a preallocated (L, B, T_max, H_kv, D) slab in HBM;
  decode writes in place via dynamic_update_slice at the current position —
  shapes never change, so XLA compiles the decode step exactly once;
- RMSNorm runs in fp32; matmuls run in the params dtype (bf16 on TPU) with
  fp32 accumulation where it matters.

Architecture facts mirrored from Qwen2 (via torchtune's qwen2 builder):
GQA with q/k/v bias, o-proj without bias, RoPE base 1e6 on q/k, RMSNorm
(eps 1e-6) pre-attn and pre-mlp, SwiGLU MLP, final RMSNorm.
Token embedding / LM head are external (the LM strips them, reference
fireredtts2/llm/llm.py:9-13).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import TransformerConfig
from fireredtts2_tpu.ops.attention import gqa_attention, gqa_attention_bounded
from fireredtts2_tpu.ops.pallas_attention import (
    pallas_decode_attention, use_pallas_decode,
)
from fireredtts2_tpu.ops.pallas_flash import (
    flash_decode_gqa1, flash_lm_enabled, flash_lm_ok,
)
from fireredtts2_tpu.ops.remat import remat_layer
from fireredtts2_tpu.ops.rope import rope_angles, apply_rope

Params = dict[str, Any]
KVCache = dict[str, Array]


def rms_norm(x: Array, weight: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * weight.astype(x.dtype)


def init_transformer_params(key: Array, cfg: TransformerConfig,
                            dtype=jnp.float32) -> Params:
    """Random init (trunc-normal-ish). Real weights come from the checkpoint
    converter (runtime/checkpoint.py); init only needs sane magnitudes."""
    L, D, I = cfg.num_layers, cfg.embed_dim, cfg.intermediate_dim
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 8)

    def norm_init(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    return {
        "wq": norm_init(ks[0], L, D, Hq * Dh),
        "bq": jnp.zeros((L, Hq * Dh), dtype),
        "wk": norm_init(ks[1], L, D, Hkv * Dh),
        "bk": jnp.zeros((L, Hkv * Dh), dtype),
        "wv": norm_init(ks[2], L, D, Hkv * Dh),
        "bv": jnp.zeros((L, Hkv * Dh), dtype),
        "wo": norm_init(ks[3], L, Hq * Dh, D),
        "w_gate": norm_init(ks[4], L, D, I),
        "w_up": norm_init(ks[5], L, D, I),
        "w_down": norm_init(ks[6], L, I, D),
        "attn_norm": jnp.ones((L, D), dtype),
        "mlp_norm": jnp.ones((L, D), dtype),
        "final_norm": jnp.ones((D,), dtype),
    }


def init_kv_cache(cfg: TransformerConfig, batch_size: int, max_seq_len: int,
                  dtype=jnp.float32) -> KVCache:
    """Preallocated KV slab: MERGED (L, B, T_max, H_kv * D_head) for k and
    v. The merged head layout tiles cleanly for any head_dim (an unmerged
    (..., Hkv, Dh) minor pair pays XLA tile padding when Dh < 128 — the
    vocoder measured 2x slab HBM at Dh=64, PERF.md round 3) and gives the
    flash decode kernel contiguous per-chunk DMA rows."""
    shape = (cfg.num_layers, batch_size, max_seq_len,
             cfg.num_kv_heads * cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quantize_transformer_int8(params: Params) -> Params:
    """Weight-only int8 (per-output-channel symmetric) for a stacked
    transformer tree. Halves HBM weight traffic on decode — the depth
    decoder re-reads all its weights 15x per 80 ms frame, which is its
    bf16 HBM floor (PERF.md). Norms/biases stay in the original dtype."""
    out: Params = {}
    for k, v in params.items():
        if k in _MATMUL_KEYS:
            w = v.astype(jnp.float32)
            scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            out[k] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out[k + "_scale"] = scale  # (L, 1, out) fp32
        else:
            out[k] = v
    return out


_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_transformer_int4(params: Params, group: int = 128) -> Params:
    """Weight-only int4 (group-wise symmetric, two nibbles packed per int8
    byte along the input axis) — quarter of the bf16 HBM weight traffic.

    Packed byte at row i holds input rows i (low nibble) and i + I/2 (high
    nibble) so the Pallas kernel's unpack is a contiguous sublane concat
    (ops/pallas_int4.py). Riskier than int8 (validate on real weights
    before shipping as the default); group-wise scales over `group` input
    channels bound the quantization error per dot-product segment."""
    out: Params = {}
    for k, v in params.items():
        if k in _MATMUL_KEYS:
            w = v.astype(jnp.float32)                       # (L, I, O)
            L, I, O = w.shape
            g = min(group, I)
            while I % g:
                g //= 2
            wg = w.reshape(L, I // g, g, O)
            scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=2, keepdims=True)
                                / 7.0, 1e-8)                # (L, I/g, 1, O)
            q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
            q = q.reshape(L, I, O)
            lo, hi = q[:, : I // 2, :], q[:, I // 2:, :]    # halves packing
            out[k] = ((lo & 0x0F) | jnp.left_shift(hi, 4)).astype(jnp.int8)
            out[k + "_scale4"] = scale[:, :, 0, :]          # (L, I/g, O) fp32
        else:
            out[k] = v
    return out


def _unpack_int4(p8: Array, scale: Array, dtype) -> Array:
    """(I/2, O) packed + (I/g, O) scales -> (I, O) dequantized (XLA path)."""
    lo = jnp.right_shift(jnp.left_shift(p8, 4), 4)          # rows [0, I/2)
    hi = jnp.right_shift(p8, 4)                             # rows [I/2, I)
    q = jnp.concatenate([lo, hi], axis=0)
    g = q.shape[0] // scale.shape[0]
    wq = (q.astype(dtype).reshape(scale.shape[0], g, -1)
          * scale[:, None, :].astype(dtype))
    return wq.reshape(q.shape[0], -1)


def _mm(x: Array, lp: Params, name: str) -> Array:
    """x @ W with transparent weight-only int8/int4. int8 dequant fuses
    into the dot under XLA; int4 routes through the Pallas fused-unpack
    kernel on TPU (XLA materializes the unpacked weights — measured slower
    than int8, PERF.md)."""
    w = lp[name]
    if name + "_scale4" in lp:
        from fireredtts2_tpu.ops.pallas_int4 import (
            int4_matmul, int4_kernel_enabled)

        if int4_kernel_enabled():
            return int4_matmul(x, w, lp[name + "_scale4"])
        return x @ _unpack_int4(w, lp[name + "_scale4"], x.dtype)
    if w.dtype == jnp.int8:
        y = jnp.dot(x, w.astype(x.dtype), precision=None)
        return y * lp[name + "_scale"][0].astype(y.dtype)
    return x @ w


def _layer(h: Array, lp: Params, cfg: TransformerConfig,
           cos: Array, sin: Array, mask: Optional[Array],
           k4: Optional[Array], v4: Optional[Array],
           layer: Optional[Array],
           cache_pos: Optional[Array],
           live_window: Optional[tuple[Array, Array]] = None,
           bounded: Optional[tuple[Array, Array, Array, Array]] = None):
    """One transformer layer. Cached variant operates on the CARRIED
    (L, B, T, Hkv*Dh) slab pair at `layer` — writes are in-place scatters
    on the carry and the flash/bounded reads touch only live chunks, so
    neither scales with slab capacity (the previous xs/ys slab threading
    copied full capacity through the scan every step: measured
    3.65 ms/frame at B=16 on the 3100-slot flagship slab,
    tools/block_probe.py lm vs lm-s768). Returns (h, k4, v4)."""
    B, S, D = h.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    x = rms_norm(h, lp["attn_norm"], cfg.norm_eps)
    q = (_mm(x, lp, "wq") + lp["bq"]).reshape(B, S, Hq, Dh)
    k = (_mm(x, lp, "wk") + lp["bk"]).reshape(B, S, Hkv, Dh)
    v = (_mm(x, lp, "wv") + lp["bv"]).reshape(B, S, Hkv, Dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if k4 is not None:
        T = k4.shape[2]
        kw = k.reshape(B, S, Hkv * Dh).astype(k4.dtype)
        vw = v.reshape(B, S, Hkv * Dh).astype(v4.dtype)
        # Under a serving mesh the fresh rows arrive tp-SHARDED on their
        # last dim (column-split wk/wv) while the slab is tp-replicated
        # (lm_state_pspecs — Hkv too small to shard). Pin the rows to the
        # slab's layout BEFORE the scatter: without this GSPMD scatters
        # sharded columns locally and then re-gathers the ENTIRE slab
        # over tp at the flash shard_map boundary — a full-slab
        # all-gather per layer per frame (caught by
        # tests/test_comm_pattern.py; gathering (B, S, W) here instead
        # costs W bytes per stream).
        from fireredtts2_tpu.parallel.mesh import serving_mesh
        mesh = serving_mesh()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            row_spec = (P("dp", None, None)
                        if B % int(mesh.shape.get("dp", 1)) == 0 else P())
            kw = jax.lax.with_sharding_constraint(
                kw, NamedSharding(mesh, row_spec))
            vw = jax.lax.with_sharding_constraint(
                vw, NamedSharding(mesh, row_spec))
        # In-place slab update at cache_pos: scalar = same slot across the
        # batch; (B,) = per-stream slots (continuous batching).
        if getattr(cache_pos, "ndim", 0) == 1:
            rows = cache_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
            bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
            k4 = k4.at[layer, bidx, rows, :].set(kw)
            v4 = v4.at[layer, bidx, rows, :].set(vw)
        else:
            k4 = jax.lax.dynamic_update_slice(
                k4, kw[None], (layer, 0, cache_pos, 0))
            v4 = jax.lax.dynamic_update_slice(
                v4, vw[None], (layer, 0, cache_pos, 0))

        if (bounded is not None and S == 1 and flash_lm_enabled()
                and flash_lm_ok(q, k4)):
            # Flash decode kernel over the carried 4-D slab: live-chunk
            # DMA ring, no per-layer slab materialization
            # (ops/pallas_flash.py). Under a serving mesh with tp > 1 the
            # kernel is shard_mapped over tp-split heads (each shard reads
            # only its kv heads' slab columns) so sharded serving keeps
            # the fast path (VERDICT r3 #6); a mesh it can't split falls
            # through to the XLA paths below.
            from fireredtts2_tpu.parallel.mesh import serving_mesh
            from fireredtts2_tpu.ops.pallas_flash import (
                flash_lm_tp_ok, flash_decode_gqa1_shard, flash_lm_interpret,
            )
            q_start, q_end, live_lo, live_hi = bounded
            mesh = serving_mesh()
            if mesh is None:
                attn = flash_decode_gqa1(
                    q[:, 0], k4, v4, layer, q_start[:, 0], q_end[:, 0],
                    live_lo, live_hi)[:, None]
            elif flash_lm_tp_ok(mesh, q, k4,
                                interpret=flash_lm_interpret()):
                # ANY serving mesh — including dp-only (tp=1) — must take
                # the shard_map route: GSPMD has no partitioning rule for
                # the raw pallas_call, so issuing it on dp-sharded state
                # would replicate the full KV slab per layer per frame.
                # With tp=1 each shard simply runs all heads locally.
                attn = flash_decode_gqa1_shard(
                    mesh, q[:, 0], k4, v4, layer, q_start[:, 0],
                    q_end[:, 0], live_lo, live_hi,
                    interpret=flash_lm_interpret())[:, None]
            else:
                attn = gqa_attention_bounded(
                    q,
                    jax.lax.dynamic_slice(
                        k4, (layer, 0, 0, 0),
                        (1, B, T, Hkv * Dh))[0].astype(h.dtype),
                    jax.lax.dynamic_slice(
                        v4, (layer, 0, 0, 0),
                        (1, B, T, Hkv * Dh))[0].astype(h.dtype),
                    q_end, live_hi, q_start=q_start, live_lo=live_lo)
        else:
            # Fallback reads materialize this layer's slab slice (full
            # capacity — the copy the kernel route avoids).
            k_slab = jax.lax.dynamic_slice(
                k4, (layer, 0, 0, 0), (1, B, T, Hkv * Dh))[0]
            v_slab = jax.lax.dynamic_slice(
                v4, (layer, 0, 0, 0), (1, B, T, Hkv * Dh))[0]
            if live_window is not None and S == 1:
                # Pallas decode kernel (FRTTS2_PALLAS=1 opt-in; see
                # ops/pallas_attention.py for why XLA is the measured
                # default): streams only the live [start, end) KV window
                # from HBM instead of attending over the whole slab behind
                # a (B, 1, T_max) mask.
                start, end = live_window
                attn = pallas_decode_attention(
                    q[:, 0], k_slab.reshape(B, T, Hkv, Dh),
                    v_slab.reshape(B, T, Hkv, Dh), start, end)[:, None]
            elif bounded is not None:
                # Online-softmax attention over only the LIVE chunks of
                # the slab: cost scales with content, not capacity. Same
                # fix as the vocoder's (PERF.md round 3).
                q_start, q_end, live_lo, live_hi = bounded
                attn = gqa_attention_bounded(
                    q, k_slab.astype(h.dtype), v_slab.astype(h.dtype),
                    q_end, live_hi, q_start=q_start, live_lo=live_lo)
            else:
                attn = gqa_attention(
                    q, k_slab.reshape(B, T, Hkv, Dh).astype(h.dtype),
                    v_slab.reshape(B, T, Hkv, Dh).astype(h.dtype), mask)
    else:
        attn = gqa_attention(q, k, v, mask)

    h = h + _mm(attn.reshape(B, S, Hq * Dh), lp, "wo").astype(h.dtype)

    x = rms_norm(h, lp["mlp_norm"], cfg.norm_eps)
    gate = jax.nn.silu(_mm(x, lp, "w_gate").astype(jnp.float32)).astype(h.dtype)
    up = _mm(x, lp, "w_up")
    h = h + _mm(gate * up, lp, "w_down").astype(h.dtype)
    return h, k4, v4


def transformer_forward(
    params: Params,
    cfg: TransformerConfig,
    h: Array,
    positions: Array,
    mask: Optional[Array] = None,
    cache: Optional[KVCache] = None,
    cache_pos: Optional[Array] = None,
    unroll: int | bool = 1,
    live_window: Optional[tuple[Array, Array]] = None,
    remat: Optional[str] = None,
) -> tuple[Array, Optional[KVCache]]:
    """Run the decoder stack.

    Args:
        h: (B, S, D) input embeddings (already summed/projected).
        positions: (B, S) absolute positions for RoPE.
        mask: bool, True = attend. Without cache: (B, S, S). With cache:
            (B, S, T_max) rows of the causal mask at `positions`
            (see ops.masks.decode_step_mask).
        cache: KV slab from :func:`init_kv_cache`; None = stateless forward.
        cache_pos: scalar int — the slab slot where this call's first token
            is written (prefill writes [0, S), decode writes [pos, pos+S)).
        live_window: optional ((B,) start, (B,) end) — the contiguous live
            region of each stream's slab. When given (and S == 1, and Pallas
            is enabled), attention runs in the Pallas decode kernel, which
            reads only [start, end) from HBM. The mask path is the fallback
            and the numerical reference.
        remat: "full" | "dots" | None — per-layer jax.checkpoint on the
            STATELESS path (training); see :func:`remat_layer`. Ignored when
            a KV cache is given (decode never differentiates). Values are
            unchanged — remat only alters what the backward pass saves.

    Returns:
        (h_out (B, S, D) after final norm, updated cache or None).
    """
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_base)

    bounded = None
    if live_window is not None and not (h.shape[1] == 1
                                        and use_pallas_decode(cfg.head_dim)):
        # S == 1 decode routing. The flash kernel (default ON on TPU,
        # FRTTS2_FLASH_LM=0 to opt out) reads only live slab chunks with
        # a pipelined DMA ring and never materializes a per-layer slab
        # slice. The XLA bounded fori_loop (FRTTS2_BOUNDED_LM=1 opt-in)
        # computes the same mask set but serializes its chunk fetches —
        # measured slower than dense for S=1 (PERF.md round 3 part 3);
        # dense remains the fallback when neither engages.
        want = (flash_lm_enabled()
                or os.environ.get("FRTTS2_BOUNDED_LM", "0") == "1")
        if want and h.shape[1] == 1:
            start, end = live_window
            # Per-query causal bound = its own position + 1; per-stream
            # lower bound = first live slot (left-padded prompts). Only
            # the chunks covering [min(start), max(end)) are visited.
            bounded = (jnp.broadcast_to(start[:, None], positions.shape),
                       positions.astype(jnp.int32) + 1,
                       jnp.min(start), jnp.max(end))
        live_window = None

    use_cache = cache is not None
    if use_cache:
        assert cache_pos is not None
        L = cfg.num_layers

        def body(carry, xs):
            hh, k4, v4 = carry
            lp, lyr = xs
            hh, k4, v4 = _layer(hh, lp, cfg, cos, sin, mask,
                                k4, v4, lyr, cache_pos,
                                live_window, bounded)
            return (hh, k4, v4), None

        layer_params = {k: v for k, v in params.items() if k != "final_norm"}
        (h, new_k, new_v), _ = jax.lax.scan(
            body, (h, cache["k"], cache["v"]),
            (layer_params, jnp.arange(L, dtype=jnp.int32)), unroll=unroll)
        new_cache: Optional[KVCache] = {"k": new_k, "v": new_v}
    else:
        def body(carry, lp):
            hh = carry
            hh, _, _ = _layer(hh, lp, cfg, cos, sin, mask,
                              None, None, None, None)
            return hh, None

        if remat:
            body = remat_layer(body, remat)
        layer_params = {k: v for k, v in params.items() if k != "final_norm"}
        h, _ = jax.lax.scan(body, h, layer_params, unroll=unroll)
        new_cache = None

    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    return h, new_cache
