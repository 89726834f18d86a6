"""Sanity for the FLOPs/bytes accounting + device-time measurement (the MFU
machinery bench.py reports; reference has no equivalent)."""

import jax
import numpy as np

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.runtime.perf import (
    chip_peaks, lm_frame_cost, lm_prefill_flops, measure_lm_device_ms_per_frame,
    transformer_matmul_params, utilization,
)

TINY = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                 text_vocab_size=300, audio_vocab_size=64,
                 audio_num_codebooks=4, max_seq_len=64, dtype="float32")
FLAGSHIP = LLMConfig()  # qwen-1.5b + qwen-200m defaults


def test_param_counts_flagship_scale():
    bb = transformer_matmul_params(FLAGSHIP.backbone)
    dec = transformer_matmul_params(FLAGSHIP.decoder)
    # qwen-1.5b non-embedding matmuls ~1.3e9; qwen-200m ~1.9e8
    assert 1.0e9 < bb < 1.6e9, bb
    assert 1.5e8 < dec < 2.5e8, dec


def test_frame_cost_structure():
    c1 = lm_frame_cost(FLAGSHIP, batch=1)
    c8 = lm_frame_cost(FLAGSHIP, batch=8)
    # FLOPs scale with batch; weight reads do not (that's why batching wins).
    assert np.isclose(c8.flops, 8 * c1.flops)
    assert c8.weight_bytes == c1.weight_bytes
    assert c8.kv_bytes == 8 * c1.kv_bytes
    # The depth decoder's 15 sequential re-reads dominate weight traffic.
    assert c1.weight_bytes > 4e9  # > 4 GB/frame at bf16
    # int8 halves transformer weight traffic.
    c_int8 = lm_frame_cost(FLAGSHIP, batch=1, weight_bytes_per_param=1.0)
    assert c_int8.weight_bytes < 0.65 * c1.weight_bytes


def test_prefill_flops_positive_and_superlinear():
    f128 = lm_prefill_flops(FLAGSHIP, 128)
    f256 = lm_prefill_flops(FLAGSHIP, 256)
    assert f256 > 2 * f128  # attention term is quadratic


def test_chip_peaks_fallback():
    flops, bw, kind = chip_peaks()
    assert flops > 1e13 and bw > 1e11
    assert isinstance(kind, str)


def test_utilization_keys():
    u = utilization(FLAGSHIP, device_ms_per_frame=10.0)
    assert 0 < u["mfu"] < 1.5
    assert 0 < u["mbu"] < 1.5
    assert u["flops_per_frame"] > 0


def test_measure_device_ms_runs_tiny():
    from fireredtts2_tpu.models.lm.model import init_lm_params
    params = init_lm_params(jax.random.PRNGKey(0), TINY)
    ms = measure_lm_device_ms_per_frame(params, TINY, frames=4, bucket=16,
                                        repeats=1)
    assert ms > 0


def test_fused_depth_plan_weight_bytes():
    """HBM accounting under the fused depth-chain kernel: resident tensors
    count once per frame, streamed tensors once per micro-step."""
    import dataclasses

    from fireredtts2_tpu.config import LLMConfig
    from fireredtts2_tpu.runtime.perf import (
        depth_frame_weight_bytes, lm_frame_cost)

    base = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                     audio_num_codebooks=4)
    assert depth_frame_weight_bytes(base) is None  # XLA loop: default path

    cfg = dataclasses.replace(base, fused_depth_plan="gate=r8,up=s8,down=s8")
    dec = cfg.decoder
    L, D, I = dec.num_layers, dec.embed_dim, dec.intermediate_dim
    attn = L * (D * dec.num_heads * dec.head_dim * 2
                + D * dec.num_kv_heads * dec.head_dim * 2)
    mlp = L * D * I
    ncb = cfg.audio_num_codebooks
    want = attn + mlp + 2 * mlp * ncb  # gate resident, up+down streamed
    assert depth_frame_weight_bytes(cfg) == want

    r4 = dataclasses.replace(base, fused_depth_plan="gate=r4,up=r4,down=r4")
    assert depth_frame_weight_bytes(r4) == attn + 3 * mlp * 0.5

    # lm_frame_cost picks the fused accounting up automatically.
    c_plain = lm_frame_cost(base, depth_bytes_per_param=1.0)
    c_fused = lm_frame_cost(cfg, depth_bytes_per_param=1.0)
    assert c_fused.weight_bytes < c_plain.weight_bytes
