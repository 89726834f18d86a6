"""Pallas TPU kernel: flash decode attention over a bounded KV-slab window,
with the per-stream slab WRITE fused in.

Replaces ops.attention.gqa_attention_bounded (+ the XLA slab update) on the
VOCODER hot path. Two measured costs motivated it (tools/block_probe.py,
B=16 K=4 serving blocks, PERF.md round 3):

1. The XLA bounded path visits live slab chunks with a lax.fori_loop of
   dynamic_slice reads — correct and capacity-independent, but the loop
   SERIALIZES the chunk fetches; XLA does not software-pipeline DMA across
   fori_loop iterations (29.0 vs 9.1 ms/block with a capacity-768 slab).
2. Threading the (L, B, T, H*Dh) slabs through the layer scan as xs/ys
   COPIES the full slab capacity every block: scan ys are freshly stacked
   buffers, so each layer pays a slab-slice read + write regardless of
   live content (~14 ms/block of pure capacity cost at T=3008, B=16 —
   measured as the flash-kernel-attention-only residual vs a 768 slab).

Design:

- the slabs stay (L, B, T, H*Dh) and ride the layer scan as CARRY; this
  kernel takes the FULL 4-D slab refs (ANY memory space) plus the layer
  index, so no per-layer slab slice is ever materialized;
- `input_output_aliases` pins the slab outputs to the input buffers —
  the kernel writes this chunk's fresh K/V rows in place (program 0
  writes ALL batch rows up front, so the cross-batch-row chunk prefetch
  below never reads pre-write data);
- grid = (B,); TPU grid steps run sequentially, so the DMA ring indexes
  by GLOBAL chunk number (b * span + i) % NBUF and each program
  prefetches the NEXT program's first chunk during its own tail — the
  copy engine never drains at batch-row boundaries;
- online-softmax (fp32 m/l/acc) accumulation, one (S, Dh) x (Dh, C)
  dot + one (S, C) x (C, Dh) dot per head per chunk (MHA; the vocoder
  backbone has Hq == Hkv == 16, Dh = 64);
- per-query exclusive bound q_end (and optional inclusive lower bound
  q_start) masks exactly like the XLA path: masked lanes get -1e30, and
  a fully-masked chunk self-cancels once a live chunk lands (standard
  flash-decode algebra — exp(m_old - m_new) zeroes the garbage).

Cost scales with ceil(live_hi / C) chunks, not slab capacity; chunk size
C is the largest divisor of T that is <= 768 and a multiple of 16 (bf16
sublane tile; HBM DMA offsets stay tile-aligned). T = 3008 -> C = 752.

Mosaic rules encoded here (see also ops/pallas_depth.py): fp32 matmul
accumulators only; bf16 dots pin precision=DEFAULT against the package's
float32 matmul default; 2D iota only; SMEM scalars are (1, N); HBM DMA
row offsets are 8-sublane aligned (slab writes land at pos % 8 == 0 —
vocoder chunks are whole 8-latent tokens).

Reference being replaced: torch SDPA over a growing concat cache
(fireredtts2/codec/whisper.py:81-118, decoder.py:276-320).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -1e30
_NBUF = 2           # DMA ring depth (k and v each)
_CHUNK_TARGET = 768  # preferred live-window chunk (slab slots)


def pick_chunk(T: int) -> int | None:
    """Largest divisor of T that is <= _CHUNK_TARGET and a multiple of 16
    (bf16 sublane tile — keeps every HBM DMA offset tile-aligned for both
    f32 and bf16 slabs). None when T has no such divisor (caller falls
    back to the XLA bounded path)."""
    best = None
    for c in range(16, min(T, _CHUNK_TARGET) + 1, 16):
        if T % c == 0:
            best = c
    return best


def flash_supported(q: Array, k: Array) -> bool:
    """Kernel eligibility: merged (..., T, H*Dh) slab (3-D attention-only
    or 4-D layer-stacked), MHA (Hq == Hkv), a tile-aligned chunking of T,
    and 8-aligned query counts."""
    if k.ndim not in (3, 4):
        return False
    B, S, Hq, D = q.shape
    if k.shape[-1] != Hq * D or S % 8:
        return False          # GQA slab — not supported (vocoder is MHA)
    if (os.environ.get("FRTTS2_FLASH_VOC") != "interpret"
            and k.shape[-1] % 128):
        # real-TPU lane tiling: a narrow slab gets lane-padded and its
        # row slices fail Mosaic alignment (see flash_lm_ok)
        return False
    return pick_chunk(k.shape[-2]) is not None


def flash_enabled() -> bool:
    """Route vocoder slab decode through this kernel? Default ON on TPU
    (measured win at every batch size, PERF.md round 3 part 3); OFF
    elsewhere (CPU tests exercise it via FRTTS2_FLASH_VOC=interpret)."""
    flag = os.environ.get("FRTTS2_FLASH_VOC", "")
    if flag in ("0", "false"):
        return False
    if flag in ("1", "true", "interpret"):
        return True
    return jax.default_backend() == "tpu"


def _interpret(explicit: bool) -> bool:
    if explicit:
        return True
    return os.environ.get("FRTTS2_FLASH_VOC") == "interpret"


def _kernel(scal_ref, pos_ref, qend_ref, qstart_ref, q_ref, *rest,
            C: int, H: int, Dh: int, nbuf: int, write: bool, Sw: int):
    if write:
        newk_ref, newv_ref, k_in, v_in, out_ref, k_out, v_out, \
            kbuf, vbuf, sems, wsem = rest
        k_slab, v_slab = k_out, v_out     # aliased to k_in/v_in
    else:
        k_slab, v_slab, out_ref, kbuf, vbuf, sems = rest

    b = pl.program_id(0)
    B = pl.num_programs(0)
    nc = scal_ref[0, 0]          # live chunks (>= 1, counted from 0)
    c0 = scal_ref[0, 1]          # first live chunk (live_lo // C)
    lyr = scal_ref[0, 2]         # layer index into the (L, B, T, D) slab
    S = q_ref.shape[1]
    D = H * Dh
    span = nc - c0

    def start(slot, bb, cc):
        pltpu.make_async_copy(
            k_slab.at[lyr, bb, pl.ds(cc * C, C), :], kbuf.at[slot],
            sems.at[0, slot]).start()
        pltpu.make_async_copy(
            v_slab.at[lyr, bb, pl.ds(cc * C, C), :], vbuf.at[slot],
            sems.at[1, slot]).start()

    def wait(slot):
        pltpu.make_async_copy(k_slab.at[0, 0, pl.ds(0, C), :], kbuf.at[slot],
                              sems.at[0, slot]).wait()
        pltpu.make_async_copy(v_slab.at[0, 0, pl.ds(0, C), :], vbuf.at[slot],
                              sems.at[1, slot]).wait()

    T_slab = k_slab.shape[-2]

    @pl.when(b == 0)
    def _():
        if write:
            # Write EVERY batch row's fresh K/V before any chunk read —
            # the cross-row prefetch below may touch row b+1's live tail.
            # pos is CLAMPED into [0, T - Sw]: a stream whose frame cap
            # was crossed mid-block keeps decoding garbage lanes the host
            # never emits, and an unclamped overshoot is an OUT-OF-BOUNDS
            # DMA that hard-aborts the device (TPU INTERNAL, observed
            # with 30 s clone streams crossing the 3008-latent slab).
            # XLA's dynamic_update_slice clamps identically.
            for bb in range(B):
                p = pl.multiple_of(
                    jnp.minimum(pos_ref[0, bb], T_slab - Sw), 8)
                pltpu.make_async_copy(
                    newk_ref.at[bb],
                    k_out.at[lyr, bb, pl.ds(p, Sw), :],
                    wsem.at[0, bb]).start()
                pltpu.make_async_copy(
                    newv_ref.at[bb],
                    v_out.at[lyr, bb, pl.ds(p, Sw), :],
                    wsem.at[1, bb]).start()
            for bb in range(B):
                p = pl.multiple_of(
                    jnp.minimum(pos_ref[0, bb], T_slab - Sw), 8)
                pltpu.make_async_copy(
                    newk_ref.at[bb], k_out.at[lyr, bb, pl.ds(p, Sw), :],
                    wsem.at[0, bb]).wait()
                pltpu.make_async_copy(
                    newv_ref.at[bb], v_out.at[lyr, bb, pl.ds(p, Sw), :],
                    wsem.at[1, bb]).wait()
        start(0, 0, c0)

    # q_end/q_start ride as full (B, S) VMEM blocks (a (1, S) block would
    # violate the 8-sublane block rule); each program slices its row.
    qe = jnp.swapaxes(qend_ref[pl.ds(b, 1), :], 0, 1)    # (S, 1) int32
    qs = jnp.swapaxes(qstart_ref[pl.ds(b, 1), :], 0, 1)  # (S, 1) int32
    col = jax.lax.broadcasted_iota(jnp.int32, (S, C), 1)
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))

    def chunk_step(i, carry):
        m, l, acc = carry                          # (S,H) (S,H) (S,D) fp32
        c = c0 + i
        slot = (b * span + i) % nbuf

        @pl.when(i + 1 < span)
        def _():
            start((b * span + i + 1) % nbuf, b, c + 1)

        @pl.when((i + 1 == span) & (b + 1 < B))
        def _():
            start(((b + 1) * span) % nbuf, b + 1, c0)

        wait(slot)
        idx = col + c * C
        live = (idx < qe) & (idx >= qs)            # (S, C)

        ms, ls, accs = [], [], []
        for h in range(H):
            qh = q_ref[0, :, h * Dh:(h + 1) * Dh]              # (S, Dh)
            kc = kbuf[slot, :, h * Dh:(h + 1) * Dh]            # (C, Dh)
            vc = vbuf[slot, :, h * Dh:(h + 1) * Dh]            # (C, Dh)
            s = jax.lax.dot_general(
                qh, kc, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32) * scale     # (S, C)
            s = jnp.where(live, s, _MASK_VALUE)
            m_old = m[:, h:h + 1]                               # (S, 1)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)                              # (S, C)
            corr = jnp.exp(m_old - m_new)                       # (S, 1)
            ls.append(l[:, h:h + 1] * corr + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)             # (S, Dh)
            accs.append(acc[:, h * Dh:(h + 1) * Dh] * corr + pv)
            ms.append(m_new)
        return (jnp.concatenate(ms, axis=1), jnp.concatenate(ls, axis=1),
                jnp.concatenate(accs, axis=1))

    m0 = jnp.full((S, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((S, H), jnp.float32)
    a0 = jnp.zeros((S, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, span, chunk_step, (m0, l0, a0))

    l = jnp.maximum(l, 1e-30)
    out = jnp.concatenate(
        [acc[:, h * Dh:(h + 1) * Dh] / l[:, h:h + 1] for h in range(H)],
        axis=1)
    out_ref[0] = out.astype(out_ref.dtype)


def _call(q, k4, v4, q_end, q_start, scalars, pos, new_k, new_v,
          write: bool, interpret: bool):
    B, S, H, Dh = q.shape
    L, _, T, D = k4.shape
    C = pick_chunk(T)
    Sw = new_k.shape[1] if write else 8

    kern = functools.partial(_kernel, C=C, H=H, Dh=Dh, nbuf=_NBUF,
                             write=write, Sw=Sw)
    in_specs = [
        pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [scalars, pos, q_end.astype(jnp.int32), q_start.astype(jnp.int32),
            q.reshape(B, S, D)]
    out_shape = [jax.ShapeDtypeStruct((B, S, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    scratch = [
        pltpu.VMEM((_NBUF, C, D), k4.dtype),
        pltpu.VMEM((_NBUF, C, D), v4.dtype),
        pltpu.SemaphoreType.DMA((2, _NBUF)),
    ]
    aliases = {}
    if write:
        in_specs += [
            pl.BlockSpec((B, Sw, D), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sw, D), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [new_k.astype(k4.dtype), new_v.astype(v4.dtype)]
        out_shape += [jax.ShapeDtypeStruct(k4.shape, k4.dtype),
                      jax.ShapeDtypeStruct(v4.shape, v4.dtype)]
        out_specs += [pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
        scratch.append(pltpu.SemaphoreType.DMA((2, B)))
        aliases = {7: 1, 8: 2}   # k4 -> k_out, v4 -> v_out (in-place)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    args += [k4, v4]

    res = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=_interpret(interpret),
    )(*args)
    if write:
        attn, k_new, v_new = res
        return attn.reshape(B, S, H, Dh), k_new, v_new
    return res[0].reshape(B, S, H, Dh)


def _scalars(live_hi, live_lo, layer, C, kv0=None, t_cap=None):
    """t_cap: slab length T — chunk indices are CLAMPED to it so a stream
    whose position overshot capacity (a frame cap crossed mid-block: the
    host stops emitting, but the already-dispatched block still computes
    its lanes) can never drive the DMA ring past the slab. Observed
    without the clamp: TPU INTERNAL abort when 30 s clone streams crossed
    the 3008-latent vocoder slab (2026-08-20)."""
    nc = jnp.maximum((live_hi + C - 1) // C, 1).astype(jnp.int32)
    c0 = (jnp.int32(0) if live_lo is None
          else jnp.maximum(live_lo, 0).astype(jnp.int32) // C)
    if t_cap is not None:
        nc = jnp.minimum(nc, t_cap // C)
        c0 = jnp.minimum(c0, t_cap // C - 1)
    nc = jnp.maximum(nc, c0 + 1)
    lyr = jnp.int32(0) if layer is None else layer.astype(jnp.int32)
    kv0 = jnp.int32(0) if kv0 is None else jnp.asarray(kv0, jnp.int32)
    return jnp.stack([nc, c0, lyr, kv0]).reshape(1, 4)


def flash_decode_bounded(q: Array, k: Array, v: Array, q_end: Array,
                         live_hi: Array, q_start: Array | None = None,
                         live_lo: Array | None = None,
                         interpret: bool = False) -> Array:
    """Attention-only drop-in for ops.attention.gqa_attention_bounded on
    merged MHA slabs.

    Args:
        q: (B, S, Hq, Dh); k, v: MERGED (B, T, Hq*Dh) slabs.
        q_end: (B, S) int32 exclusive per-query bound (> 0 everywhere).
        live_hi: () int32 — max live slot over the batch.
        q_start / live_lo: optional inclusive lower bounds (left-padded
            prompts); default 0.
    Returns:
        (B, S, Hq, Dh) in q.dtype. Equal to the XLA bounded path up to
        fp32 online-softmax summation order.
    """
    B, S, H, Dh = q.shape
    T = k.shape[1]
    C = pick_chunk(T)
    assert C is not None and k.shape == (B, T, H * Dh), (q.shape, k.shape)
    if q_start is None:
        q_start = jnp.zeros_like(q_end)
    return _call(q, k[None], v[None], q_end, q_start,
                 _scalars(live_hi, live_lo, None, C, t_cap=T),
                 jnp.zeros((1, B), jnp.int32), None, None,
                 write=False, interpret=interpret)


def flash_decode_update_bounded(
        q: Array, new_k: Array, new_v: Array, k4: Array, v4: Array,
        layer: Array, pos: Array, q_end: Array, live_hi: Array,
        interpret: bool = False) -> tuple[Array, Array, Array]:
    """Fused slab write + bounded flash attention for one layer of a
    (L, B, T, H*Dh) slab pair carried through the layer scan.

    Writes new_k/new_v (B, Sw, H*Dh) at rows [pos_b, pos_b + Sw) of
    slab[layer, b] IN PLACE (input_output_aliases — callers must treat
    k4/v4 as consumed), then attends with per-query bounds that may cover
    the freshly written rows. pos must be 8-aligned (vocoder chunks are
    whole 8-latent tokens; asserted statically for Sw).

    Returns:
        (attn (B, S, Hq, Dh), k4, v4) — the slab buffers, updated.
    """
    B, S, H, Dh = q.shape
    L, _, T, D = k4.shape
    C = pick_chunk(T)
    Sw = new_k.shape[1]
    assert C is not None and D == H * Dh and Sw % 8 == 0, (q.shape, k4.shape)
    q_start = jnp.zeros_like(q_end)
    return _call(q, k4, v4, q_end, q_start,
                 _scalars(live_hi, None, layer, C, t_cap=T),
                 pos.astype(jnp.int32).reshape(1, B),
                 new_k.reshape(B, Sw, D), new_v.reshape(B, Sw, D),
                 write=True, interpret=interpret)


def flash_voc_tp_ok(mesh, q: Array, k4: Array, interpret: bool = False
                    ) -> bool:
    """Eligibility of the tp-sharded VOCODER write-kernel route
    (flash_decode_update_bounded_shard — VERDICT r4 #4): the vocoder is
    MHA, so sharding the SLAB's head columns over tp makes every shard's
    in-kernel write land exclusively in its own columns — the write-
    divergence argument that used to pin the kernel off under a mesh
    disappears. Requires: heads split evenly over tp, batch over dp, and
    (real TPU) a 128-lane-aligned LOCAL slab width (H/ntp * Dh) so the
    per-shard DMA slices stay tile-aligned; interpret mode has no
    alignment constraint."""
    if k4.ndim != 4:
        return False
    B, S, H, Dh = q.shape
    if k4.shape[-1] != H * Dh or S % 8:
        return False
    ntp = int(mesh.shape.get("tp", 1))
    ndp = int(mesh.shape.get("dp", 1))
    if H % ntp or B % ndp:
        return False
    if not interpret and (H // ntp) * Dh % 128:
        return False
    return pick_chunk(k4.shape[-2]) is not None


def flash_decode_update_bounded_shard(
        mesh, q: Array, new_k: Array, new_v: Array, k4: Array, v4: Array,
        layer: Array, pos: Array, q_end: Array, live_hi: Array,
        interpret: bool = False) -> tuple[Array, Array, Array]:
    """Tensor-parallel fused vocoder slab-write + flash attention
    (VERDICT r4 #4): shard_map the write kernel over the serving mesh so
    mesh serving keeps the 6x vocoder-attention win (28.8 -> 4.7 ms/block
    at B=16, PERF.md r3p3) instead of falling back to the XLA dense-slab
    path.

    Layout: the vocoder KV slabs are column-sharded over tp and
    batch-sharded over dp (parallel/mesh.py:vocoder_state_pspecs); q and
    the fresh new_k/new_v arrive head-/column-sharded from the Megatron-
    split projections, so each shard's kernel call is fully local — it
    writes ONLY its own heads' slab columns and attends over them (MHA:
    every head is independent). The head-sharded attention output feeds
    the row-parallel wo matmul with no resharding; no collectives are
    introduced. As with the LM kernel, a dp-only mesh (tp=1) MUST still
    take this route: GSPMD has no partitioning rule for a raw pallas_call.
    """
    from jax.sharding import PartitionSpec as P
    try:  # JAX >= 0.8 moved shard_map out of experimental (jax.shard_map)
        from jax import shard_map
        smap = functools.partial(shard_map, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        smap = functools.partial(shard_map, check_rep=False)

    B, S, H, Dh = q.shape

    def local(qs, nks, nvs, k4s, v4s, lyr, ps, qes, hi):
        return flash_decode_update_bounded(qs, nks, nvs, k4s, v4s, lyr,
                                           ps, qes, hi, interpret=interpret)

    fn = smap(
        local, mesh=mesh,
        in_specs=(P("dp", None, "tp", None),           # q (B, S, H, Dh)
                  P("dp", None, "tp"),                 # new_k (B, S, H*Dh)
                  P("dp", None, "tp"),                 # new_v
                  P(None, "dp", None, "tp"),           # k4 (L, B, T, H*Dh)
                  P(None, "dp", None, "tp"),           # v4
                  P(),                                 # layer
                  P("dp"),                             # pos (B,)
                  P("dp", None),                       # q_end (B, S)
                  P()),                                # live_hi
        out_specs=(P("dp", None, "tp", None),
                   P(None, "dp", None, "tp"),
                   P(None, "dp", None, "tp")))
    return fn(q, new_k.reshape(B, S, H * Dh), new_v.reshape(B, S, H * Dh),
              k4, v4, layer, pos.astype(jnp.int32), q_end.astype(jnp.int32),
              live_hi)


# ---------------------------------------------------------------------------
# S = 1 GQA decode over a carried (L, B, T, Hkv*Dh) slab (the LM hot path)
# ---------------------------------------------------------------------------


def flash_lm_enabled() -> bool:
    """Route LM S=1 decode attention through flash_decode_gqa1? Default ON
    on TPU; FRTTS2_FLASH_LM=0 opts out (dense mask path),
    FRTTS2_FLASH_LM=interpret runs the kernel interpreted on CPU tests."""
    flag = os.environ.get("FRTTS2_FLASH_LM", "")
    if flag in ("0", "false"):
        return False
    if flag in ("1", "true", "interpret"):
        return True
    return jax.default_backend() == "tpu"


def flash_lm_interpret() -> bool:
    """True when the LM kernel is being exercised interpreted (CPU tests
    via FRTTS2_FLASH_LM=interpret)."""
    return os.environ.get("FRTTS2_FLASH_LM") == "interpret"


def flash_lm_ok(q: Array, k4: Array) -> bool:
    """Shape eligibility for the S=1 GQA kernel: 4-D merged slab whose
    width divides the query heads, and a tile-aligned chunking of T. On a
    real TPU the slab width must also be a whole number of 128-lane
    tiles: a narrow slab (e.g. the tiny dev configs' 32) gets lane-padded
    by Mosaic, and its row slices then fail tiling alignment — observed
    as 'Slice shape along dimension 3 must be aligned to tiling (128)'
    when a tiny engine runs on chip. Interpret mode has no such limit."""
    if k4.ndim != 4:
        return False
    B, S, Hq, Dh = q.shape
    if S != 1 or k4.shape[-1] % Dh:
        return False
    Hkv = k4.shape[-1] // Dh
    if Hq % Hkv:
        return False
    if not flash_lm_interpret() and k4.shape[-1] % 128:
        return False
    return pick_chunk(k4.shape[-2]) is not None


def _kernel_gqa1(scal_ref, bounds_ref, q_ref, k_hbm, v_hbm, out_ref,
                 kbuf, vbuf, sems, *, C: int, Hkv: int, G: int, Dh: int,
                 nbuf: int, col_window: bool = False):
    """Hkv here is the LOCAL kv-head count this call computes over; the
    slab may hold more (tensor-parallel serving, col_window=True: each tp
    shard reads only its heads' columns — scal[0,3] = kv0 is the first kv
    head, and the DMA column window starts at kv0*Dh). Single-device
    serving keeps col_window=False: the lane dim is sliced with ':'
    exactly as before — an EXPLICIT lane-dim pl.ds demands 128-aligned
    extent AND offset from Mosaic, which small-width configs (W < 128)
    cannot satisfy; flash_lm_tp_ok enforces Dh % 128 == 0 before the tp
    route is taken on a real TPU."""
    b = pl.program_id(0)
    B = pl.num_programs(0)
    nc = scal_ref[0, 0]
    c0 = scal_ref[0, 1]
    lyr = scal_ref[0, 2]
    col0 = scal_ref[0, 3] * Dh
    Hq = Hkv * G
    W = Hkv * Dh                         # local window width
    span = nc - c0

    def cols(ref, bb, cc):
        if col_window:
            return ref.at[lyr, bb, pl.ds(cc * C, C), pl.ds(col0, W)]
        return ref.at[lyr, bb, pl.ds(cc * C, C), :]

    def start(slot, bb, cc):
        pltpu.make_async_copy(cols(k_hbm, bb, cc), kbuf.at[slot],
                              sems.at[0, slot]).start()
        pltpu.make_async_copy(cols(v_hbm, bb, cc), vbuf.at[slot],
                              sems.at[1, slot]).start()

    def wait(slot):
        pltpu.make_async_copy(cols(k_hbm, 0, 0), kbuf.at[slot],
                              sems.at[0, slot]).wait()
        pltpu.make_async_copy(cols(v_hbm, 0, 0), vbuf.at[slot],
                              sems.at[1, slot]).wait()

    @pl.when(b == 0)
    def _():
        start(0, 0, c0)

    qs = bounds_ref[0, b]                # inclusive lower bound (left pad)
    qe = bounds_ref[1, b]                # exclusive upper bound (pos + 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))

    def chunk_step(i, carry):
        m, l, acc = carry                # (Hq,1) (Hq,1) (Hq,Dh) fp32
        c = c0 + i
        slot = (b * span + i) % nbuf

        @pl.when(i + 1 < span)
        def _():
            start((b * span + i + 1) % nbuf, b, c + 1)

        @pl.when((i + 1 == span) & (b + 1 < B))
        def _():
            start(((b + 1) * span) % nbuf, b + 1, c0)

        wait(slot)
        idx = col + c * C
        live = (idx < qe) & (idx >= qs)  # (1, C) — all queries share bounds

        ms, ls, accs = [], [], []
        for kh in range(Hkv):
            qg = q_ref[0, kh * G:(kh + 1) * G, :]             # (G, Dh)
            kc = kbuf[slot, :, kh * Dh:(kh + 1) * Dh]         # (C, Dh)
            vc = vbuf[slot, :, kh * Dh:(kh + 1) * Dh]         # (C, Dh)
            s = jax.lax.dot_general(
                qg, kc, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32) * scale    # (G, C)
            s = jnp.where(live, s, _MASK_VALUE)
            m_old = m[kh * G:(kh + 1) * G]                     # (G, 1)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_old - m_new)
            ls.append(l[kh * G:(kh + 1) * G] * corr
                      + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)            # (G, Dh)
            accs.append(acc[kh * G:(kh + 1) * G] * corr + pv)
            ms.append(m_new)
        return (jnp.concatenate(ms, axis=0), jnp.concatenate(ls, axis=0),
                jnp.concatenate(accs, axis=0))

    m0 = jnp.full((Hq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((Hq, 1), jnp.float32)
    a0 = jnp.zeros((Hq, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, span, chunk_step, (m0, l0, a0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def flash_decode_gqa1(q: Array, k4: Array, v4: Array, layer: Array,
                      q_start: Array, q_end: Array,
                      live_lo: Array, live_hi: Array,
                      interpret: bool = False,
                      kv_base: Array | int = 0,
                      hkv: int | None = None) -> Array:
    """Single-token GQA decode attention over one layer of a carried
    (L, B, T, Hkv*Dh) slab pair — the LM S=1 hot path. The slab write
    stays an XLA in-place scatter on the scan carry (LM positions advance
    by 1 and are not DMA-alignable); this kernel only reads, touching
    live chunks with the pipelined ring.

    Args:
        q: (B, Hq, Dh) post-RoPE queries.
        k4, v4: (L, B, T, Hkv*Dh) merged slabs (freshly written rows
            included — attention covers the current position).
        layer: () int32 layer index.
        q_start / q_end: (B,) int32 per-stream live window (end = pos+1).
        live_lo / live_hi: () int32 batch-wide bounds (min start, max end).
        kv_base / hkv: tensor-parallel serving (flash_decode_gqa1_shard):
            compute only kv heads [kv_base, kv_base + hkv) of the slab —
            q then holds just this shard's query heads. Defaults cover the
            full slab width (single-device serving).
    Returns:
        (B, Hq, Dh) in q.dtype; equals dense masked attention up to fp32
        online-softmax summation order.
    """
    B, Hq, Dh = q.shape
    L, _, T, W = k4.shape
    Hkv = hkv if hkv is not None else W // Dh
    G = Hq // Hkv
    C = pick_chunk(T)
    assert C is not None and Hkv * G == Hq and Hkv * Dh <= W
    col_window = Hkv * Dh != W   # tp shard: window the slab columns

    flag = os.environ.get("FRTTS2_FLASH_LM", "")
    kern = functools.partial(_kernel_gqa1, C=C, Hkv=Hkv, G=G, Dh=Dh,
                             nbuf=_NBUF, col_window=col_window)
    bounds = jnp.stack([q_start.astype(jnp.int32),
                        q_end.astype(jnp.int32)])       # (2, B)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hq, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, Dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, C, Hkv * Dh), k4.dtype),
            pltpu.VMEM((_NBUF, C, Hkv * Dh), v4.dtype),
            pltpu.SemaphoreType.DMA((2, _NBUF)),
        ],
        interpret=interpret or flag == "interpret",
    )(_scalars(live_hi, live_lo, layer, C, kv0=kv_base, t_cap=T),
      bounds, q, k4, v4)
    return out


def flash_lm_tp_ok(mesh, q: Array, k4: Array, interpret: bool = False
                   ) -> bool:
    """Eligibility of the tp-sharded kernel route (flash_decode_gqa1_shard):
    query heads must split evenly over tp with each shard covering a whole
    number of kv heads (or an exact fraction of one group), the batch must
    split over dp, and — on real TPUs — the per-shard DMA column offsets
    (kv0 * Dh) must stay 128-lane aligned, i.e. Dh % 128 == 0 (true for
    every qwen2 flavor; interpret mode has no alignment constraint)."""
    if not flash_lm_ok(q, k4):
        return False
    ntp = int(mesh.shape.get("tp", 1))
    ndp = int(mesh.shape.get("dp", 1))
    B, S, Hq, Dh = q.shape
    Hkv = k4.shape[-1] // Dh
    if Hq % ntp or B % ndp:
        return False
    hql = Hq // ntp
    if ntp <= Hkv and Hkv % ntp:
        # each shard must cover a WHOLE number of kv heads — a floor'd
        # hkv_local would let a shard's query heads straddle kv heads it
        # never DMAs (e.g. Hq=6, Hkv=3, tp=2: shard 0's head 2 belongs
        # to kv head 1 but the window covers only kv head 0)
        return False
    hkv_local = max(1, Hkv // ntp)
    if hql % hkv_local:
        return False
    g_total = Hq // Hkv
    if ntp > Hkv and g_total % hql:
        # each shard must map to exactly ONE kv head
        return False
    if not interpret and Dh % 128:
        return False
    return True


def flash_decode_gqa1_shard(mesh, q: Array, k4: Array, v4: Array,
                            layer: Array, q_start: Array, q_end: Array,
                            live_lo: Array, live_hi: Array,
                            interpret: bool = False) -> Array:
    """Tensor-parallel flash LM decode (VERDICT r3 #6): shard_map the
    kernel over the serving mesh so sharded serving keeps the fast path.

    Layout matches the Megatron split of the surrounding program
    (parallel/mesh.py): q arrives column-sharded on heads over tp and on
    streams over dp; the KV slabs are dp-sharded and tp-REPLICATED
    (lm_state_pspecs — Hkv=2 is too small to shard). Each shard's kernel
    call is fully local: it reads only its kv heads' slab columns
    (kv_base DMA window) and computes its Hq/tp query heads; the output
    stays head-sharded, feeding the row-parallel wo matmul with no
    resharding. No collectives are introduced — the kernel is read-only.
    """
    from jax.sharding import PartitionSpec as P
    try:  # JAX >= 0.8 moved shard_map out of experimental (jax.shard_map)
        from jax import shard_map
        smap = functools.partial(shard_map, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        smap = functools.partial(shard_map, check_rep=False)

    B, Hq, Dh = q.shape
    Hkv = k4.shape[-1] // Dh
    ntp = int(mesh.shape.get("tp", 1))
    hql = Hq // ntp
    hkv_local = max(1, Hkv // ntp)
    g_total = Hq // Hkv

    def local(qs, k4s, v4s, lyr, qss, qes, lo, hi):
        t = jax.lax.axis_index("tp")
        kv0 = (t * hql) // g_total
        return flash_decode_gqa1(qs, k4s, v4s, lyr, qss, qes, lo, hi,
                                 interpret=interpret, kv_base=kv0,
                                 hkv=hkv_local)

    fn = smap(
        local, mesh=mesh,
        in_specs=(P("dp", "tp", None),
                  P(None, "dp", None, None), P(None, "dp", None, None),
                  P(), P("dp"), P("dp"), P(), P()),
        out_specs=P("dp", "tp", None))
    return fn(q, k4, v4, layer, q_start, q_end, live_lo, live_hi)
