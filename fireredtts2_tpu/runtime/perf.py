"""FLOPs / bytes accounting and device-time measurement for the LM hot path.

The reference has no notion of MFU at all (its perf story is wall-clock
trackers, reference performance_monitor.py:272-347). Here we account decode
FLOPs and HBM bytes analytically from the config, measure device time with
the whole-utterance program (ONE dispatch, so host/tunnel RTT amortizes to
nothing), and derive:

- MFU  = flops/frame / (device_s/frame * chip peak FLOP/s)  — low for AR
  decode at small batch (it is HBM-bound), meaningful for batched serving;
- MBU  = bytes/frame / (device_s/frame * chip peak HBM B/s) — the honest
  utilization number for decode (how close to the weight-read floor we run).

bench.py emits both plus device_ms_per_frame, and enforces the regression
budget in perf_budget.json (tunnel wall-clock noise is ±25%; device time
from a single fused program is stable).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import LLMConfig, TransformerConfig


# (bf16 peak FLOP/s, HBM bytes/s) per chip generation. Sources: public TPU
# spec sheets (v5e: 197 TFLOPs bf16 / 819 GB/s; v4: 275/1228; v5p: 459/2765;
# v6e: 918/1640).
_CHIP_PEAKS: dict[str, tuple[float, float]] = {
    "v4": (275e12, 1228e9),
    "v5e": (197e12, 819e9),
    "v5 lite": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6e": (918e12, 1640e9),
    "v6 lite": (918e12, 1640e9),
}


def chip_peaks(device: Optional[Any] = None) -> tuple[float, float, str]:
    """-> (peak_flops, peak_hbm_bytes_per_s, kind). Unknown kinds fall back
    to v5e numbers (the target platform, BASELINE.md)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "unknown").lower()
    for name, peaks in _CHIP_PEAKS.items():
        if name in kind:
            return (*peaks, kind)
    return (*_CHIP_PEAKS["v5e"], kind or "unknown")


# ---------------------------------------------------------------------------
# Analytic counts
# ---------------------------------------------------------------------------


def transformer_layer_params(cfg: TransformerConfig) -> int:
    """Matmul parameters of one layer (norms/biases excluded — they are
    noise at these scales)."""
    D, I = cfg.embed_dim, cfg.intermediate_dim
    attn = D * (cfg.num_heads * cfg.head_dim) * 2 \
        + D * (cfg.num_kv_heads * cfg.head_dim) * 2
    mlp = 3 * D * I
    return attn + mlp


def transformer_matmul_params(cfg: TransformerConfig) -> int:
    return cfg.num_layers * transformer_layer_params(cfg)


@dataclasses.dataclass(frozen=True)
class FrameCost:
    """Per-80ms-frame decode cost of the dual-transformer LM at batch B."""
    flops: float          # total FLOPs across the batch
    weight_bytes: float   # HBM weight reads (shared across the batch)
    kv_bytes: float       # HBM KV-slab traffic (per stream, so scales with B)


def depth_frame_weight_bytes(cfg: LLMConfig) -> Optional[float]:
    """HBM weight bytes per frame for the depth decoder under the fused
    chain kernel (ops/pallas_depth.py): RESIDENT tensors are read from HBM
    once per frame, STREAMED tensors once per sequential step. None when
    the fused plan is disabled (the XLA loop re-reads everything ncb-1
    times; lm_frame_cost's default accounting covers that)."""
    if not cfg.fused_depth_plan:
        return None
    from fireredtts2_tpu.ops.pallas_depth import parse_plan

    plan = parse_plan(cfg.fused_depth_plan)
    dec = cfg.decoder
    D, I, L = dec.embed_dim, dec.intermediate_dim, dec.num_layers
    ncb = cfg.audio_num_codebooks
    attn = L * (D * dec.num_heads * dec.head_dim * 2
                + D * dec.num_kv_heads * dec.head_dim * 2)
    total = float(attn)  # attention projections: resident int8, read once
    for name in ("w_gate", "w_up", "w_down"):
        sz = L * D * I
        mode = plan[name]
        if mode == "r8":
            total += sz
        elif mode == "r4":
            total += sz * 0.5
        else:  # s8: re-streamed for each of the ncb micro-steps
            total += float(sz) * ncb
    return total


def lm_frame_cost(cfg: LLMConfig, batch: int = 1, mean_context: int = 512,
                  weight_bytes_per_param: float = 2.0,
                  backbone_bytes_per_param: Optional[float] = None,
                  depth_bytes_per_param: Optional[float] = None) -> FrameCost:
    """Analytic cost of ONE generated frame (backbone step + 15 depth steps
    + sampling heads), mirroring the program models/lm/model.py builds.

    mean_context: average live KV length for backbone attention.
    weight_bytes_per_param: 2.0 for bf16 weights, 1.0 for weight-only int8;
    backbone/depth can be overridden independently (mixed quantization).
    """
    bb, dec = cfg.backbone, cfg.decoder
    ncb = cfg.audio_num_codebooks
    B = batch

    bb_params = transformer_matmul_params(bb)
    dec_params = transformer_matmul_params(dec)
    c0_head = bb.embed_dim * cfg.audio_vocab_size
    audio_heads = (ncb - 1) * dec.embed_dim * cfg.audio_vocab_size
    proj = bb.embed_dim * dec.embed_dim

    # FLOPs: 2 * params per token per matmul visit.
    bb_attn = 2 * bb.num_heads * bb.head_dim * mean_context * 2  # qk + pv
    depth_attn = 2 * dec.num_heads * dec.head_dim * ncb * 2
    flops = B * (
        2 * bb_params + bb.num_layers * bb_attn            # backbone step
        + 2 * c0_head                                      # codebook-0 head
        + (ncb + 1) * 2 * proj                             # depth inputs
        + ncb * (2 * dec_params + dec.num_layers * depth_attn)  # 15+1 depth steps
        + 2 * audio_heads                                  # one visit per head
    )

    # Weight bytes: each matmul's weights are read once per visit regardless
    # of batch (the whole point of batching decode).
    bb_wb = (backbone_bytes_per_param if backbone_bytes_per_param is not None
             else weight_bytes_per_param)
    dec_wb = (depth_bytes_per_param if depth_bytes_per_param is not None
              else weight_bytes_per_param)
    fused_depth = depth_frame_weight_bytes(cfg)
    depth_bytes = (fused_depth if fused_depth is not None
                   # XLA loop: depth weights re-read for every sequential
                   # step — the per-frame floor (PERF.md): 2 prefill slots
                   # + (ncb - 2) steps.
                   else (ncb - 1) * dec_params * dec_wb)
    weight_bytes = (
        bb_params * bb_wb + c0_head * 2.0
        + depth_bytes
        + audio_heads * 2.0 + proj * 2.0
    )

    # KV traffic: read [0, mean_context) k+v per layer per stream + writes.
    kv_bytes = B * bb.num_layers * mean_context * bb.num_kv_heads \
        * bb.head_dim * 2 * 2.0
    return FrameCost(flops=float(flops), weight_bytes=float(weight_bytes),
                     kv_bytes=float(kv_bytes))


def lm_prefill_flops(cfg: LLMConfig, seq_len: int) -> float:
    """FLOPs of one prefill over seq_len tokens (matmuls + attention)."""
    bb = cfg.backbone
    params = transformer_matmul_params(bb)
    attn = 2 * bb.num_heads * bb.head_dim * seq_len * seq_len  # qk+pv combined /2*2
    return 2.0 * params * seq_len + bb.num_layers * attn


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------


def measure_lm_device_ms_per_frame(params, cfg: LLMConfig, frames: int = 100,
                                   batch: int = 1, bucket: int = 128,
                                   repeats: int = 2) -> float:
    """Wall-time of the whole-utterance program / frames. One dispatch per
    measurement, so the host<->device round trip contributes O(RTT/frames)
    ≈ 0.3 ms/frame at 30 ms RTT — device time dominates."""
    from fireredtts2_tpu.models.lm.model import init_lm_state, lm_generate_loop

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (batch, bucket, cfg.num_columns), 1, 100)
    tokens_mask = jnp.ones_like(tokens, dtype=bool).at[:, :, :-1].set(False)
    valid = jnp.ones((batch, bucket), bool)

    # params must be a jit ARGUMENT: closing over the tree would embed the
    # weights as compile-time constants (a multi-GB program at flagship).
    fn = jax.jit(lambda p, st, cap: lm_generate_loop(
        p, cfg, st, tokens, tokens_mask, valid, jax.random.PRNGKey(2),
        max_frames=frames, frame_cap=cap)[2])
    st = init_lm_state(cfg, batch, dtype)
    fn(params, st, jnp.int32(frames)).block_until_ready()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(params, st, jnp.int32(frames)).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0 / frames


def load_perf_budget() -> dict[str, Any]:
    """perf_budget.json from the repo root (or $FRTTS2_PERF_BUDGET).
    Keys: lm_device_ms_per_frame (bench.py regression gate),
    block_frame_cost_ms (live serving frame-cost alarm, serve/server.py
    stats()). Missing file -> {} (all budget checks disabled)."""
    import json
    import os

    path = os.environ.get("FRTTS2_PERF_BUDGET") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "perf_budget.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


import contextlib


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a code region (view with tensorboard or
    xprof). The in-repo hook VERDICT asked for: bench.py and the serve
    layer use this instead of ad-hoc manual profiling."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999):
    """Expose the live jax.profiler gRPC endpoint (serve layer hook)."""
    return jax.profiler.start_server(port)


def utilization(cfg: LLMConfig, device_ms_per_frame: float, batch: int = 1,
                mean_context: int = 512,
                weight_bytes_per_param: float = 2.0,
                backbone_bytes_per_param: Optional[float] = None,
                depth_bytes_per_param: Optional[float] = None) -> dict[str, float]:
    """-> {mfu, mbu, flops_per_frame, hbm_bytes_per_frame} for a measured
    per-frame device time."""
    peak_flops, peak_bw, kind = chip_peaks()
    cost = lm_frame_cost(cfg, batch, mean_context, weight_bytes_per_param,
                         backbone_bytes_per_param, depth_bytes_per_param)
    t = device_ms_per_frame / 1000.0
    return {
        "mfu": cost.flops / (t * peak_flops),
        "mbu": (cost.weight_bytes + cost.kv_bytes) / (t * peak_bw),
        "flops_per_frame": cost.flops,
        "hbm_bytes_per_frame": cost.weight_bytes + cost.kv_bytes,
        "chip": kind,
    }
