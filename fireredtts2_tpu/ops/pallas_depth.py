"""Fused depth-chain Pallas kernel: the WHOLE per-frame depth decode
(15 sequential qwen-200m steps + sampling) in ONE pallas_call.

Why. The depth decoder dominates LM device time per 80 ms frame: its ~187M
transformer params are re-read from HBM for every one of the 15 sequential
codebook steps, because each step's input is the previous step's SAMPLED
token (reference loop: fireredtts2/llm/llm.py:317-328). XLA cannot keep
weights on-chip across the steps; this kernel can — v5e has 128 MB of VMEM.
Weight placement is a static PLAN per MLP matmul family:

- ``r8``: int8, RESIDENT in VMEM for the whole frame (read from HBM once).
- ``r4``: int4 packed nibbles, resident; dequantized in VMEM per use with
  the float-math trick proven in ops/pallas_int4.py (Mosaic: no vector
  shl), in quarter-matrix chunks to bound the unpacked temporary.
- ``s8``: int8, STREAMED from HBM per step in lane-aligned chunks behind
  a ring of buffers; chunk size and ring depth come from a VMEM budget
  estimate (big chunks when they fit — fewer DMAs measured faster).

The attention projections (wq/wk/wv/wo, 22 MB int8) are always resident.
Measured on v5e (tools/devtime.py, flagship qwen-200m): XLA int8 loop
7.40 ms/frame -> fused gate=r8,up=s8,down=s8 6.5 at B=1, and 14.0 -> 9.85
at B=8; the full design-fact table is in PERF.md (round 2, part 2).

In-kernel math mirrors models/lm/model.py::_depth_decode exactly:
- the reference's S=2 prefill ([backbone h, embed(c0)]) is computed as two
  single-position micro-steps — identical numerics for causal attention
  since every op is row-independent;
- sampling is temperature + top-k + exponential-race argmax(probs / q)
  (reference fireredtts2/llm/llm.py:34-49) with the SAME q draws as the
  XLA path: the exponential noise is drawn OUTSIDE the kernel with
  jax.random.fold_in(key, step) and streamed in per step, so fused and XLA
  paths sample identical tokens for identical keys;
- the next step's embedding rows are fetched by PER-STREAM row DMA from
  the flat audio-embedding table (offset token + codebook*V, llm.py:336),
  issued right after sampling — embeddings never occupy table-sized VMEM.

Hard-won Mosaic facts encoded here: matmul accumulators must be 32-bit;
pltpu.repeat TILES (g-major) rather than element-repeating — Q rows are
permuted to (g, b, hkv) order to line up; unwritten scratch is NaN-poison,
so dead KV slots are select-ed away, never multiplied by zero; DMA lane
slices must be 128-aligned (half/quarter splits of flagship dims are).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fireredtts2_tpu.config import LLMConfig, TransformerConfig

_NEG = -1e30
_MATMUL = ("wq", "wk", "wv", "wo")
_MLP = ("w_gate", "w_up", "w_down")


# ---------------------------------------------------------------------------
# Plan parsing
# ---------------------------------------------------------------------------


def parse_plan(plan: str) -> dict[str, str]:
    """"gate=r4,up=s8,down=s8" -> {"w_gate": "r4", ...}. Empty -> all r8.

    This is a user-facing CLI knob (--fused-depth-plan), so malformed
    strings get a ValueError naming the accepted grammar, not a bare
    KeyError traceback out of engine construction."""
    names = {"gate": "w_gate", "up": "w_up", "down": "w_down"}
    modes = ("r8", "r4", "s8", "r8a8", "s8a8")
    out = {"w_gate": "r8", "w_up": "r8", "w_down": "r8"}
    if plan:
        for part in plan.split(","):
            k, eq, v = part.partition("=")
            k, v = k.strip(), v.strip()
            if not eq or k not in names or v not in modes:
                raise ValueError(
                    f"bad fused-depth plan entry {part!r}: expected "
                    f"<tensor>=<mode> with tensor in {sorted(names)} and "
                    f"mode in {modes} (r8 = VMEM-resident int8, r4 = "
                    f"resident int4, s8 = HBM-streamed int8; the a8 "
                    f"variants ALSO quantize the activations per row and "
                    f"run native s8xs8 int32 MXU dots — measured ~15% "
                    f"faster per weight byte than the int8->bf16 convert "
                    f"path, tools/probe_dequant.py, but they CHANGE "
                    f"NUMERICS: opt-in pending real-checkpoint quality "
                    f"validation), e.g. 'gate=r8,up=s8,down=s8'")
            out[names[k]] = v
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_split(Ih: int, q: int) -> tuple[tuple[int, int], ...]:
    """Cut Ih columns into q contiguous chunks of (rel_offset, width).

    When Ih is whole 128-lane tiles, the TILES are split as evenly as
    possible (widths may differ by one tile — Mosaic only needs each
    slice 128-lane aligned, not equal). Flagship Ih = 4480 = 35 tiles:
    q=2 -> 2304+2176, q=3 -> 1536+1536+1408. Otherwise q must divide Ih
    exactly (tiny test dims). Raises ValueError when the cut is impossible.
    """
    if Ih % 128 == 0:
        tiles = Ih // 128
        if q > tiles:
            raise ValueError(f"q={q} > {tiles} tiles")
        base, extra = divmod(tiles, q)
        widths = [(base + (1 if i < extra else 0)) * 128 for i in range(q)]
    else:
        if Ih % q:
            raise ValueError(f"q={q} does not divide Ih={Ih}")
        widths = [Ih // q] * q
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return tuple(out)


# ---------------------------------------------------------------------------
# Bundle preparation (host/setup time)
# ---------------------------------------------------------------------------


def _quant8(w: Array) -> tuple[Array, Array]:
    """Per-output-channel symmetric int8 (matches
    models/lm/transformer.py::quantize_transformer_int8)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0,
                        1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant4(w: Array, group: int) -> tuple[Array, Array]:
    """Group-wise symmetric int4, halves-packed (matches
    quantize_transformer_int4: packed row i = input rows (i, i + I/2))."""
    wf = w.astype(jnp.float32)
    L, I, O = wf.shape
    # Groups must divide I/2: the kernel dequantizes input-row chunks of
    # each nibble side independently (down-proj streams/unpacks per half).
    g = max(min(group, I // 2), 1)
    while (I // 2) % g:
        g //= 2
    wg = wf.reshape(L, I // g, g, O)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0,
                        1e-8)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8).reshape(L, I, O)
    lo, hi = q[:, : I // 2, :], q[:, I // 2:, :]
    packed = ((lo & 0x0F) | jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale[:, :, 0, :]  # (L, I/2, O), (L, I/g, O)


def prepare_depth_chain(params: dict[str, Any], cfg: LLMConfig,
                        plan: str = "", group: int = 128) -> dict[str, Any]:
    """Build the kernel weight bundle from an LM params tree whose
    ``decoder`` is UNQUANTIZED (bf16/f32).

    Returns a dict of arrays (a pytree — it rides inside the params tree as
    ``params["depth_chain"]``) plus, under "xla_decoder", the matching
    mixed-quantized decoder tree for the XLA fallback path so both paths
    compute identical numbers. Quantized arrays are SHARED between the two
    views (same HBM buffers).
    """
    dec = params["decoder"]
    assert dec["wq"].dtype not in (jnp.int8,), \
        "prepare_depth_chain needs the unquantized decoder params"
    p = parse_plan(plan)
    ncb = cfg.audio_num_codebooks
    V = cfg.audio_vocab_size
    Vp = _round_up(V, 128)
    dcfg = cfg.decoder
    dtype = params["projection"].dtype

    bundle: dict[str, Any] = {}
    xla_dec: dict[str, Any] = {}
    for k, v in dec.items():
        if k in _MATMUL:
            q, s = _quant8(v)
            if k != "wo":
                # Q/K/V are merged into ONE resident tensor + one dot in
                # the kernel (fewer MXU issues per step); per-output-channel
                # scales concatenate exactly, so numerics are unchanged.
                xla_dec[k], xla_dec[k + "_scale"] = q, s
                continue
            bundle[k], bundle[k + "_s"] = q, s
            xla_dec[k], xla_dec[k + "_scale"] = q, s
        elif k in _MLP:
            if p[k] == "r4":
                q, s4 = _quant4(v, group)
                # Scales stored in the compute dtype: the XLA dequant path
                # casts them to x.dtype anyway (transformer._unpack_int4),
                # and int4-value * bf16-scale products are exact in fp32,
                # so both paths round identically.
                bundle[k], bundle[k + "_s4"] = q, s4.astype(dtype)
                xla_dec[k], xla_dec[k + "_scale4"] = q, s4.astype(dtype)
            else:
                q, s = _quant8(v)
                if p[k] in ("s8", "s8a8") and k != "w_down":
                    # Streamed in-projections are stored TRANSPOSED
                    # (L, I, Dd): a column chunk of the logical weight is
                    # then a CONTIGUOUS row slice in HBM, giving every
                    # streamed tensor the same DMA shape. Measured timing-
                    # NEUTRAL vs the strided column slices (the DMA engines
                    # handle the stride at full rate — PERF.md round 3);
                    # kept because one uniform chunk layout is what lets
                    # up/down chunks share a slot/DMA. The kernel dots
                    # against the chunk with the contraction on the RHS's
                    # second dim (x @ chunk^T) — same MXU rate, measured.
                    # Scales stay output-major.
                    bundle[k] = jnp.swapaxes(q, -1, -2)
                    bundle[k + "_s"] = s
                else:
                    bundle[k], bundle[k + "_s"] = q, s
                xla_dec[k], xla_dec[k + "_scale"] = q, s
        else:
            xla_dec[k] = v
    # Merged QKV: (L, Dd, Hq*Dh + 2*Hkv*Dh) int8 + matching scale row.
    bundle["wqkv"] = jnp.concatenate(
        [xla_dec["wq"], xla_dec["wk"], xla_dec["wv"]], axis=-1)
    bundle["wqkv_s"] = jnp.concatenate(
        [xla_dec["wq_scale"], xla_dec["wk_scale"], xla_dec["wv_scale"]],
        axis=-1)

    # Norm/bias vectors as (L, 1, D) rows for broadcast.
    L = dcfg.num_layers
    bundle["attn_norm"] = dec["attn_norm"].reshape(L, 1, -1)
    bundle["mlp_norm"] = dec["mlp_norm"].reshape(L, 1, -1)
    bundle["final_norm"] = dec["final_norm"].reshape(1, -1)
    bundle["bqkv"] = jnp.concatenate(
        [dec["bq"], dec["bk"], dec["bv"]], axis=-1).reshape(L, 1, -1)

    bundle["proj"] = params["projection"]

    # Flat embedding rows for codebooks 0..ncb-2 (embed_audio indexes the
    # flat table at token + codebook*V, models/lm/model.py:100-104). The
    # kernel DMAs the 8-row ALIGNED window containing each sampled row
    # (Mosaic: HBM sublane slices must be 8-aligned) and one-hot-selects
    # the row on chip; pad the row count so every window is in range.
    emb = params["audio_embeddings"][: (ncb - 1) * V].astype(dtype)
    pad_rows = _round_up(emb.shape[0], 8) - emb.shape[0]
    bundle["emb_rows"] = jnp.pad(emb, ((0, pad_rows), (0, 0)))
    # audio_head: (ncb-1, D_dec, V) -> pad V to a lane multiple.
    head = params["audio_head"].astype(dtype)
    bundle["head_steps"] = jnp.pad(head, ((0, 0), (0, 0), (0, Vp - V)))

    # RoPE tables for depth positions 0..ncb-1.
    half = dcfg.head_dim // 2
    inv = 1.0 / (dcfg.rope_base ** (
        jnp.arange(0, half, dtype=jnp.float32) * 2.0 / dcfg.head_dim))
    ang = jnp.arange(ncb, dtype=jnp.float32)[:, None] * inv
    bundle["rope_cos"] = jnp.cos(ang)
    bundle["rope_sin"] = jnp.sin(ang)

    bundle["xla_decoder"] = xla_dec
    return bundle


def enable_fused_depth(params: dict[str, Any], cfg: LLMConfig) -> dict[str, Any]:
    """Serving transform: prepare the fused-chain bundle and swap the
    decoder tree for the matching mixed-quantized one, so the XLA fallback
    path computes the same numbers as the kernel."""
    assert cfg.fused_depth_plan, "set LLMConfig.fused_depth_plan first"
    bundle = prepare_depth_chain(params, cfg, cfg.fused_depth_plan)
    xla_dec = bundle.pop("xla_decoder")
    out = dict(params)
    out["decoder"] = xla_dec
    out["depth_chain"] = bundle
    return out


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _rms(x: Array, w: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    s = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * s).astype(x.dtype) * w.astype(x.dtype)


def _dot(a: Array, b: Array) -> Array:
    """2-D matmul, fp32 accumulation (Mosaic requires a 32-bit matmul acc;
    callers downcast — the same rounding point as XLA's bf16-out dot)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def _dot_t(a: Array, b: Array) -> Array:
    """a @ b^T: contraction on BOTH operands' second dim. Used for streamed
    in-projection chunks, which are stored transposed (contiguous-DMA
    layout); the MXU consumes either orientation at the same rate
    (measured, tools/probe_s8_chunked.py round 3)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def _deq8(w8: Array, dtype) -> Array:
    return w8.astype(dtype)


def _dot_s8(a8: Array, b8: Array, transposed: bool = False) -> Array:
    """Native int8 x int8 MXU dot, int32 accumulation, returned as f32
    (the a8 plan modes — tools/probe_dequant.py measured 389.8 vs 332.1
    GB/s-of-int8 for convert+dot). transposed: contraction on both
    operands' second dim (streamed chunks are stored transposed)."""
    dims = (((1,), (1,)), ((), ())) if transposed else (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(a8, b8, dims,
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32)


def _quant_act(x: Array) -> tuple[Array, Array]:
    """Per-row symmetric int8 quantization of an activation block:
    (B, D) -> (int8 (B, D), f32 scale (B, 1)). Round-to-nearest through
    int32 (Mosaic vectorizes f32->i32 converts; i32->i8 is a narrowing
    copy). The 1e-30 floor keeps all-zero rows finite."""
    xf = x.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-30) / 127.0
    xq = jnp.round(xf / sc).astype(jnp.int32).astype(jnp.int8)
    return xq, sc


def _unpack4_rows(p8: Array, scales: Array, dtype, side: int | None) -> Array:
    """Dequantize packed-int4 rows (float math — Mosaic has no vector
    shift; derivation in ops/pallas_int4.py).

    p8: (R, W) packed bytes; scales: (R'/g, W) rows covering the TARGET
    input rows; side: 0 = low nibbles, 1 = high nibbles, None = both
    (returns (2R, W), scales must cover 2R rows)."""
    p = p8.astype(jnp.float32)
    hi = jnp.floor(p * 0.0625)
    if side == 1:
        q = hi
    else:
        u = p - 16.0 * hi
        lo = u - 16.0 * (u >= 8.0).astype(jnp.float32)
        q = lo if side == 0 else jnp.concatenate([lo, hi], axis=0)
    g = q.shape[0] // scales.shape[0]
    w = (q.reshape(scales.shape[0], g, -1)
         * scales[:, None, :].astype(jnp.float32)).reshape(q.shape)
    return w.astype(dtype)


def _dequant_chunks(width: int) -> int:
    """How many chunks to split an int4 dequant over: bounds the unpacked
    bf16 temporary while keeping every slice 128-lane-aligned (Mosaic
    requires it — flagship Ih = 4480 = 35 x 128 splits 5 ways, not 2)."""
    if width % 128:
        return 1
    tiles = width // 128
    for qn in (4, 5, 2, 3, 7):
        if tiles % qn == 0 and width // qn >= 256:
            return qn
    return 1


def _lane_argmax(x: Array) -> Array:
    """First-index argmax over the last (lane) axis -> (rows, 1) int32."""
    m = jnp.max(x, axis=-1, keepdims=True)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.min(jnp.where(x >= m, ids, jnp.int32(x.shape[-1])),
                   axis=-1, keepdims=True)


def _kth_largest(x: Array, k: int) -> Array:
    """Value of the k-th largest lane entry per row (ties collapse — with
    continuous logits this matches jax.lax.top_k(x, k)[0][..., -1:])."""
    cur = x
    for _ in range(k - 1):
        m = jnp.max(cur, axis=-1, keepdims=True)
        cur = jnp.where(cur >= m, _NEG, cur)
    return jnp.max(cur, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _depth_chain_kernel(*refs, names: tuple[str, ...], cfg: TransformerConfig,
                        ncb: int, V: int, Vp: int, plan: dict[str, str],
                        topk: int, greedy: bool,
                        eps: float,
                        splits: tuple[tuple[int, int], ...] = ((0, 0),),
                        stream_slots: int = 2, n_real: int | None = None):
    r = dict(zip(names, refs))
    L, Dd = cfg.num_layers, cfg.embed_dim
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = Hq // Hkv
    lasth_ref = r["last_h"]
    Bp, Db = lasth_ref.shape
    dtype = lasth_ref.dtype
    I = cfg.intermediate_dim
    Ih = I // 2

    out_ref = r["out"]
    k_store, v_store = r["k_store"], r["v_store"]
    e_buf, head_buf, nz_buf = r["e_buf"], r["head_buf"], r["nz_buf"]
    tok_io = r["tok_io"]

    streamed = [n for n in _MLP if plan[n] in ("s8", "s8a8")]
    # splits: per-half chunk layout ((rel_off, width), ...) — widths may be
    # UNEQUAL (whole 128-lane tiles split as evenly as q allows): flagship
    # Ih = 35 tiles only divides by 5/7/35, but q=2 -> (18, 17) tiles and
    # q=3 -> (12, 12, 11) cut the per-step dot count 2.5-4x vs q=5 within
    # the same ring bytes (ring slots are sized to the widest chunk).
    n_sub = len(splits)
    n_flat = L * 2 * n_sub  # subchunks per step per streamed tensor

    def sub_dma(name: str, j: int):
        """DMA flat subchunk j = ((l*2 + half)*n_sub + s) of a streamed
        tensor into its ring of stream_slots buffers. EVERY streamed tensor
        is stored input-major for its chunk axis — down is (L, I, Dd)
        natively and gate/up are stored TRANSPOSED (L, I, Dd) — so every
        chunk is the same CONTIGUOUS row-slice shape (timing-neutral vs
        strided column slices, but one uniform layout). The (splits, slots)
        pair is chosen by the wrapper's VMEM budget: big chunks when they
        fit (fewer DMAs = faster), small chunks with a deeper ring when
        residency needs the room."""
        jj = j % n_flat
        l = jj // (2 * n_sub)
        half, s = (jj % (2 * n_sub)) // n_sub, jj % n_sub
        rel, w = splits[s]
        off = half * Ih + rel
        buf, sem = r[name + "_buf"], r[name + "_sem"]
        slot = j % stream_slots
        src = r[name].at[l, pl.ds(off, w), :]
        dst = buf.at[slot, pl.ds(0, w), :]
        return pltpu.make_async_copy(src, dst, sem.at[slot])

    def prefetch_next(name: str, j: int, p):
        """After consuming subchunk j, refill its slot with j+slots
        (wrapping into the NEXT step's first chunks, skipped on the last
        step)."""
        if j + stream_slots < n_flat:
            sub_dma(name, j + stream_slots).start()
        else:
            @pl.when(p < ncb - 1)
            def _():
                sub_dma(name, j + stream_slots).start()

    def head_dma(j):
        return pltpu.make_async_copy(r["head_steps"].at[j], head_buf,
                                     r["head_sem"])

    def noise_dma(j):
        return pltpu.make_async_copy(r["noise"].at[j], nz_buf, r["nz_sem"])

    def emb_row_dma(b: int, row8):
        """Fetch the aligned 8-row window starting at row8 into e_buf[b]."""
        return pltpu.make_async_copy(r["emb_rows"].at[pl.ds(row8, 8)],
                                     e_buf.at[b], r["emb_sems"].at[b])

    # Embedding-row DMAs only for REAL batch rows: padded rows (b >= n_real)
    # would fetch garbage tokens' windows and cost a DMA issue + wait each —
    # at B=1 that is 7 wasted DMA round-trips per step. Their e_buf rows stay
    # unwritten (NaN-poison), which is safe: no op mixes across batch rows
    # (attention mixes across POSITIONS), and samples[:B] discards them.
    n_live = Bp if n_real is None else min(_round_up(max(n_real, 1), 1), Bp)

    def start_emb_rows(p):
        """After sampling at step p: fetch embed rows token_p + p*V for
        step p+1 (embed_audio codebook index p, model.py:100-104)."""
        for b in range(n_live):
            tok = tok_io[b, 0]
            row = jnp.clip(tok, 0, V - 1) + p * V
            emb_row_dma(b, (row // 8) * 8).start()

    # Warm-up: step 0's head slice (content discarded at p=0 but the buffer
    # must not be read mid-DMA) and the streamed MLP chunks for layer 0.
    # No embedding warm-up: micro-step 0 consumes last_h, and step 1's rows
    # are issued at the bottom of step 0 once tok_io holds c0.
    head_dma(0).start()
    for n in streamed:
        for j in range(min(stream_slots, n_flat)):
            sub_dma(n, j).start()

    def mm8(x: Array, name: str, l: int) -> Array:
        """x @ W for a resident int8 tensor (mirrors transformer._mm)."""
        y = _dot(x, _deq8(r[name][l], dtype)).astype(dtype)
        return y * r[name + "_s"][l].astype(y.dtype)

    def rope(xh: Array, cosr: Array, sinr: Array) -> Array:
        d = xh.shape[-1]
        xf = xh.astype(jnp.float32)
        x1, x2 = xf[:, : d // 2], xf[:, d // 2:]
        return jnp.concatenate(
            [x1 * cosr - x2 * sinr, x2 * cosr + x1 * sinr],
            axis=-1).astype(xh.dtype)

    def mlp_in_matmul(name: str, x2: Array, l: int, half: int, p=None) -> Array:
        """x2 @ {gate,up}[l][:, half] -> (Bp, Ih) in dtype, scale applied."""
        mode = plan[name]
        if mode == "r8":
            y = _dot(x2, _deq8(r[name][l, :, half * Ih:(half + 1) * Ih],
                               dtype)).astype(dtype)
        elif mode == "r8a8":
            xq, xs = _quant_act(x2)
            y = (_dot_s8(xq, r[name][l, :, half * Ih:(half + 1) * Ih])
                 * xs).astype(dtype)
        elif mode in ("s8", "s8a8"):
            a8 = mode == "s8a8"
            if a8:
                xq, xs = _quant_act(x2)
            base = (l * 2 + half) * n_sub
            ys = []
            for s in range(n_sub):
                _, w = splits[s]
                sub_dma(name, base + s).wait()
                # Chunk rows are the OUTPUT channels (transposed storage):
                # contract on dim 1 of both operands.
                chunk = r[name + "_buf"][(base + s) % stream_slots,
                                         pl.ds(0, w), :]
                if a8:
                    ys.append((_dot_s8(xq, chunk, transposed=True)
                               * xs).astype(dtype))
                else:
                    ys.append(_dot_t(x2, _deq8(chunk, dtype)).astype(dtype))
                # Refill AFTER the dot: chunk j+slots lands in THIS slot —
                # starting it earlier would overwrite the operand mid-read.
                prefetch_next(name, base + s, p)
            y = ys[0] if n_sub == 1 else jnp.concatenate(ys, axis=1)
        else:  # r4: chunked column dequant bounds the unpacked temporary
            qn = _dequant_chunks(Ih)
            qw = Ih // qn
            ys = []
            for qs in range(qn):
                c0 = half * Ih + qs * qw
                wq = _unpack4_rows(r[name][l][:, c0:c0 + qw],
                                   r[name + "_s4"][l][:, c0:c0 + qw],
                                   dtype, side=None)
                ys.append(_dot(x2, wq).astype(dtype))
            return ys[0] if qn == 1 else jnp.concatenate(ys, axis=1)
        return y * r[name + "_s"][l][:, half * Ih:(half + 1) * Ih
                                     ].astype(dtype)

    def mlp_down_matmul(t_h: Array, l: int, half: int, p=None) -> Array:
        """t_h (Bp, Ih) @ down[l][half rows] -> fp32 (Bp, Dd) partial."""
        mode = plan["w_down"]
        if mode == "r8":
            return _dot(t_h, _deq8(r["w_down"][l, half * Ih:(half + 1) * Ih],
                                   dtype))
        if mode == "r8a8":
            tq, ts = _quant_act(t_h)
            return _dot_s8(
                tq, r["w_down"][l, half * Ih:(half + 1) * Ih]) * ts
        if mode in ("s8", "s8a8"):
            a8 = mode == "s8a8"
            if a8:
                # one per-row scale is valid across column slices of tq
                tq, ts = _quant_act(t_h)
            base = (l * 2 + half) * n_sub
            acc = jnp.zeros((t_h.shape[0], Dd), jnp.float32)
            for s in range(n_sub):
                rel, w = splits[s]
                sub_dma("w_down", base + s).wait()
                chunk = r["w_down_buf"][(base + s) % stream_slots,
                                        pl.ds(0, w), :]
                if a8:
                    acc = acc + _dot_s8(tq[:, rel:rel + w], chunk) * ts
                else:
                    acc = acc + _dot(t_h[:, rel:rel + w],
                                     _deq8(chunk, dtype))
                prefetch_next("w_down", base + s, p)
            return acc
        # r4: nibble side = half; chunked input-row dequant when groups
        # allow (chunk rows must be whole scale groups).
        packed = r["w_down"][l]                      # (I/2 = Ih, Dd)
        scales = r["w_down_s4"][l]                   # (I/g, Dd)
        g = I // scales.shape[0]
        qn = _dequant_chunks(Ih)
        if (Ih // qn) % g:
            qn = 1
        qh = Ih // qn
        acc = jnp.zeros((t_h.shape[0], Dd), jnp.float32)
        for qs in range(qn):
            rows = slice(qs * qh, (qs + 1) * qh)
            srow = slice((half * Ih + qs * qh) // g,
                         (half * Ih + (qs + 1) * qh) // g)
            wq = _unpack4_rows(packed[rows, :], scales[srow, :], dtype,
                               side=half)
            acc = acc + _dot(t_h[:, rows], wq)
        return acc

    def body(p, samples):
        # ---- input hidden state ------------------------------------------
        noise_dma(p).start()  # tiny row; hidden behind the layer stack

        @pl.when(p > 0)
        def _():
            for b in range(n_live):
                # Wait the window DMAs issued at the bottom of step p-1
                # (the descriptor's source index is irrelevant to the wait
                # — only the byte count must match the outstanding copy).
                emb_row_dma(b, 0).wait()

        # Select each stream's row from its 8-row window (one-hot sum over
        # REAL table data — safe to multiply). tok_io still holds step
        # p-1's token; the row offset recomputes the DMA's scalar math in
        # vector form.
        prev_vec = tok_io[...]                               # (Bp, 1)
        row_vec = jnp.clip(prev_vec, 0, V - 1) + (p - 1) * V
        off = row_vec - (row_vec // 8) * 8                   # (Bp, 1)
        # One-hot in f32: Mosaic only supports minor-dim insertion on
        # 32-bit types; f32*bf16 row selection is exact either way.
        oh8 = (jax.lax.broadcasted_iota(jnp.int32, (Bp, 8), 1)
               == off).astype(jnp.float32)
        e = jnp.sum(e_buf[...].astype(jnp.float32) * oh8[:, :, None],
                    axis=1).astype(dtype)                    # (Bp, Db)
        # At p=0 e_buf is unwritten scratch, so e may be NaN — SELECT it
        # away (where discards, never multiplies).
        e = jnp.where(p == 0, jnp.zeros_like(e), e)
        h_emb = _dot(e.astype(dtype), r["proj"][...]).astype(dtype)
        h_last = _dot(lasth_ref[...], r["proj"][...]).astype(dtype)
        h = jnp.where(p == 0, h_last, h_emb)                 # (Bp, Dd)

        cosr = r["rope_cos"][pl.ds(p, 1), :].astype(jnp.float32)
        sinr = r["rope_sin"][pl.ds(p, 1), :].astype(jnp.float32)

        # ---- transformer layers ------------------------------------------
        Wq, Wkv = Hq * Dh, Hkv * Dh
        for l in range(L):
            x = _rms(h, r["attn_norm"][l], eps)
            # One merged QKV dot (fewer MXU issues than three): slice
            # boundaries Hq*Dh / Hkv*Dh are 128-lane aligned at flagship
            # dims (1536 / 256); tiny test dims only run in interpret mode.
            qkv = mm8(x, "wqkv", l) + r["bqkv"][l].astype(dtype)
            q = qkv[:, :Wq]
            k = qkv[:, Wq:Wq + Wkv]
            v = qkv[:, Wq + Wkv:]
            # Q rows permuted to (g, b, hkv): pltpu.repeat TILES its input
            # ([rows, rows, ...]) rather than element-repeating, so tile g
            # of repeat(k, G) lines up with q rows (g, b, hkv).
            qg = [
                jnp.concatenate(
                    [q[:, (hkv * G + g) * Dh:(hkv * G + g + 1) * Dh]
                     for hkv in range(Hkv)], axis=1).reshape(Bp * Hkv, Dh)
                for g in range(G)
            ]
            qh = rope(jnp.concatenate(qg, axis=0), cosr, sinr)
            kh = rope(k.reshape(Bp * Hkv, Dh), cosr, sinr)
            vh = v.reshape(Bp * Hkv, Dh)
            k_store[l, pl.ds(p, 1)] = kh[None].astype(k_store.dtype)
            v_store[l, pl.ds(p, 1)] = vh[None].astype(v_store.dtype)

            qf = qh.astype(jnp.float32) * (1.0 / (Dh ** 0.5))
            # Whole-window attention in 3-D ops: the slot axis stays
            # LEADING so mask/softmax/reduce run once over the window.
            k3 = pltpu.repeat(k_store[l], G, axis=1).astype(jnp.float32)
            s3 = jnp.sum(qf[None, :, :] * k3, axis=-1)     # (ncb, G*Bp*Hkv)
            tpos = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 0)
            s3 = jnp.where(tpos <= p, s3, _NEG)
            mx = jnp.max(s3, axis=0, keepdims=True)
            ex = jnp.exp(s3 - mx)
            probs = (ex / jnp.sum(ex, axis=0, keepdims=True)).astype(dtype)
            v3 = pltpu.repeat(v_store[l], G, axis=1).astype(jnp.float32)
            # Slots t > p are UNWRITTEN scratch (NaN/garbage): their
            # probability is 0 but 0 * NaN = NaN, so select — never
            # multiply — the dead slots away.
            vsel = jnp.where(tpos[:, :, None] <= p, v3, 0.0)
            acc = jnp.sum(probs.astype(jnp.float32)[:, :, None] * vsel,
                          axis=0)                          # (G*Bp*Hkv, Dh)
            og = acc.astype(dtype)
            # Inverse permutation: rows (g, b, hkv) -> columns h = hkv*G+g.
            opieces = [og[g * Bp * Hkv:(g + 1) * Bp * Hkv
                          ].reshape(Bp, Hkv * Dh) for g in range(G)]
            o = jnp.concatenate(
                [opieces[h2 % G][:, (h2 // G) * Dh:(h2 // G + 1) * Dh]
                 for h2 in range(Hq)], axis=1)             # (Bp, Hq*Dh)
            h = h + mm8(o, "wo", l).astype(dtype)

            # MLP in halves; streamed tensors ride per-subchunk double
            # buffers whose waits/prefetches live inside the matmul
            # helpers (sub_dma / prefetch_next).
            x2 = _rms(h, r["mlp_norm"][l], eps)
            d_acc = jnp.zeros((Bp, Dd), jnp.float32)
            for half in range(2):
                g_act = jax.nn.silu(
                    mlp_in_matmul("w_gate", x2, l, half, p).astype(jnp.float32)
                ).astype(dtype)
                u_act = mlp_in_matmul("w_up", x2, l, half, p)
                d_acc = d_acc + mlp_down_matmul(g_act * u_act, l, half, p)
            d = d_acc.astype(dtype)
            if plan["w_down"] != "r4":
                d = d * r["w_down_s"][l].astype(dtype)  # (1, Dd) broadcast
            h = h + d

        hh = _rms(h, r["final_norm"][0], eps)

        # ---- logits + sampling -------------------------------------------
        head_dma(jnp.minimum(p, ncb - 2)).wait()
        logits = _dot(hh, head_buf[...])                      # (Bp, Vp) f32

        @pl.when(p < ncb - 1)
        def _():
            head_dma(jnp.minimum(p, ncb - 2)).start()  # slice for step p+1

        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(lane < V, logits, _NEG)
        noise_dma(p).wait()
        if greedy:
            tok = _lane_argmax(logits)
        else:
            # temperature rides in SMEM: engine callers pass it traced
            # (per-config, not per-compile).
            lf = logits / r["temp"][0]
            kth = _kth_largest(lf, topk)
            filt = jnp.where(lf < kth, _NEG, lf)
            m = jnp.max(filt, axis=-1, keepdims=True)
            ex2 = jnp.exp(filt - m)
            pr = ex2 / jnp.sum(ex2, axis=-1, keepdims=True)
            tok = _lane_argmax(pr / nz_buf[...])

        tok = jnp.where(p == 0, r["c0"][...], tok)           # record c0 at 0
        onecol = (jax.lax.broadcasted_iota(jnp.int32, (Bp, ncb), 1)
                  == p).astype(jnp.int32)
        samples = samples + tok * onecol
        tok_io[...] = tok

        @pl.when(p < ncb - 1)
        def _():
            start_emb_rows(p)  # rows c_p + p*V, consumed at step p+1
        return samples

    samples = jax.lax.fori_loop(
        0, ncb, body, jnp.zeros((Bp, ncb), jnp.int32))
    out_ref[...] = samples


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def fused_depth_decode(bundle: dict[str, Any], cfg: LLMConfig,
                       last_h: Array, c0: Array, key: Array,
                       depth_topk: int = 10, depth_temperature: float = 0.75,
                       greedy: bool = False, plan: str = "",
                       interpret: bool | None = None,
                       stream_cfg: tuple[int, int] | None = None) -> Array:
    """Sample codebooks 0..ncb-1 for one frame with the fused chain kernel.

    Mirrors models/lm/model.py::_depth_decode (same key folding, same
    sampling semantics). Returns (B, ncb) int32 including c0.
    """
    dcfg = cfg.decoder
    ncb = cfg.audio_num_codebooks
    V = cfg.audio_vocab_size
    Vp = _round_up(V, 128)
    B = last_h.shape[0]
    Bp = _round_up(max(B, 8), 8)
    dtype = last_h.dtype
    p = parse_plan(plan)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Exponential-race draws, identical to the XLA path (fold_in(key, i),
    # shape (B, V)) so both paths pick the same tokens for the same key.
    if greedy:
        noise = jnp.ones((ncb, Bp, Vp), jnp.float32)
    else:
        draws = jnp.stack([
            jax.random.exponential(jax.random.fold_in(key, i), (B, V),
                                   dtype=jnp.float32)
            for i in range(1, ncb)])
        noise = jnp.ones((ncb, Bp, Vp), jnp.float32)
        noise = noise.at[1:, :B, :V].set(draws)

    if B != Bp:
        last_h = jnp.pad(last_h, ((0, Bp - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, Bp - B),))

    names: list[str] = []
    args: list[Array] = []
    in_specs: list[Any] = []

    def add(name: str, arr: Array, space=pltpu.VMEM):
        names.append(name)
        args.append(arr)
        in_specs.append(pl.BlockSpec(memory_space=space))

    add("c0", c0.astype(jnp.int32).reshape(Bp, 1))
    add("last_h", last_h)
    add("temp", jnp.asarray(depth_temperature, jnp.float32).reshape(1),
        space=pltpu.SMEM)
    add("noise", noise, space=pl.ANY)
    add("proj", bundle["proj"].astype(dtype))
    add("rope_cos", bundle["rope_cos"])
    add("rope_sin", bundle["rope_sin"])
    for n in ("attn_norm", "mlp_norm", "final_norm", "bqkv"):
        add(n, bundle[n].astype(dtype))
    for n in ("wqkv", "wo"):
        add(n, bundle[n])
        add(n + "_s", bundle[n + "_s"])
    for n in _MLP:
        mode = p[n]
        if mode in ("s8", "s8a8"):
            add(n, bundle[n], space=pl.ANY)
            add(n + "_s", bundle[n + "_s"])
        elif mode == "r4":
            add(n, bundle[n])
            add(n + "_s4", bundle[n + "_s4"])
        else:
            add(n, bundle[n])
            add(n + "_s", bundle[n + "_s"])
    add("emb_rows", bundle["emb_rows"].astype(dtype), space=pl.ANY)
    add("head_steps", bundle["head_steps"].astype(dtype), space=pl.ANY)

    L, Dd = dcfg.num_layers, dcfg.embed_dim
    Hkv, Dh = dcfg.num_kv_heads, dcfg.head_dim
    Db = bundle["proj"].shape[0]
    I = dcfg.intermediate_dim
    Ih = I // 2

    scratch = [
        pltpu.VMEM((L, ncb, Bp * Hkv, Dh), dtype),      # k_store
        pltpu.VMEM((L, ncb, Bp * Hkv, Dh), dtype),      # v_store
        pltpu.VMEM((Bp, 8, Db), dtype),                 # e_buf (8-row windows)
        pltpu.VMEM((Dd, Vp), dtype),                    # head_buf
        pltpu.VMEM((Bp, Vp), jnp.float32),              # nz_buf
        pltpu.VMEM((Bp, 1), jnp.int32),                 # tok_io
        pltpu.SemaphoreType.DMA((Bp,)),                 # emb_sems
        pltpu.SemaphoreType.DMA(()),                    # head_sem
        pltpu.SemaphoreType.DMA(()),                    # nz_sem
    ]
    scratch_names = ["k_store", "v_store", "e_buf", "head_buf", "nz_buf",
                     "tok_io", "emb_sems", "head_sem", "nz_sem"]

    # ---- streaming granularity from the VMEM budget --------------------
    # Bigger chunks stream faster (fewer DMAs: measured 6.7 vs 7.5
    # ms/frame half-chunks vs fifth-chunks on the mix plan), so take the
    # biggest (chunk, ring) option whose buffers fit beside the resident
    # weights. Fixed overhead ~= scratch + r4 dequant temporaries +
    # Mosaic working set.
    def _size(a) -> int:
        n = 1
        for d in a.shape:
            n *= d
        return n * a.dtype.itemsize

    resident = sum(
        _size(a) for nm, a in zip(names, args)
        if (nm in ("wqkv", "wo") or nm in _MLP or nm.endswith("_s")
            or nm.endswith("_s4") or nm == "proj")
        and not (nm in _MLP and p.get(nm) in ("s8", "s8a8")))
    n_r4 = sum(1 for n in _MLP if p[n] == "r4")
    fixed = (2 * L * ncb * Bp * Hkv * Dh * 2      # k/v stores
             + Dd * Vp * 2 + Bp * Vp * 4 + Bp * 8 * Db * 2
             + (18 << 20)                         # attn temps + headroom
             # Mosaic keeps r4 dequant temporaries alive longer than their
             # dataflow lifetime (measured: the two-r4 mix2 plan used
             # ~14 MB beyond the analytic sum) — budget for them.
             + n_r4 * (6 << 20))
    budget = (120 << 20) - resident - fixed
    n_streamed = sum(1 for n in _MLP if p[n] in ("s8", "s8a8"))
    # Chunk count q need NOT divide the 128-lane tile count: _chunk_split
    # cuts the tiles as evenly as possible (unequal widths are fine — ring
    # slots size to the widest). Prefer the fewest chunks that fit (fewer
    # dot issues + DMA waits per step); shallow rings for big chunks (each
    # DMA is long), deeper rings once chunks shrink. q=3 is EXCLUDED on
    # measurement: at flagship dims its shallow-ring mid-size chunks are
    # strictly worse than both neighbours ((3,2) 4.87 ms/frame vs (5,4)
    # 4.65 / (2,2) 4.60, tools/depth_only.py on-chip A/B) — the kernel is
    # at its small-M weight-consume floor and only that pocket regresses.
    options = [(q, s) for q in (1, 2, 5, 7)
               for s in ((2, 4) if q <= 3 else (4, 2))]
    stream_sub, stream_slots = options[-1]
    for q, s in options:
        try:
            ws = _chunk_split(Ih, q)
        except ValueError:
            continue
        per = s * max(w for _, w in ws) * Dd  # int8 bytes per tensor's ring
        if n_streamed * per <= max(budget, 0) and (L * 2 * q) % s == 0:
            stream_sub, stream_slots = q, s
            break
    if stream_cfg is not None:  # test/tuning override
        stream_sub, stream_slots = stream_cfg
        assert (L * 2 * stream_sub) % stream_slots == 0
    splits = _chunk_split(Ih, stream_sub)
    Wmax = max(w for _, w in splits)

    for n in _MLP:
        if p[n] in ("s8", "s8a8"):
            # Every streamed tensor chunks on its input-major row axis
            # (gate/up are stored transposed), behind a stream_slots-deep
            # ring of (Wmax, Dd) slots.
            scratch.append(pltpu.VMEM((stream_slots, Wmax, Dd), jnp.int8))
            scratch.append(pltpu.SemaphoreType.DMA((stream_slots,)))
            scratch_names += [n + "_buf", n + "_sem"]

    all_names = tuple(names + ["out"] + scratch_names)

    kernel = pl.pallas_call(
        functools.partial(
            _depth_chain_kernel, names=all_names, cfg=dcfg, ncb=ncb, V=V,
            Vp=Vp, plan=p, topk=depth_topk,
            greedy=greedy, eps=dcfg.norm_eps, splits=splits,
            stream_slots=stream_slots, n_real=B),
        out_shape=jax.ShapeDtypeStruct((Bp, ncb), jnp.int32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * (1 << 20)),
        interpret=interpret,
    )
    samples = kernel(*args)
    return samples[:B]
