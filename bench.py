"""Headline benchmark: first-packet latency + realtime factor of streaming
synthesis on the flagship model (qwen-1.5b backbone, 16-codebook 12.5 Hz
codec, bf16), single chip.

Baseline: the reference reports "as low as 140 ms" first-packet latency on
an NVIDIA L20 (reference README.md:30; BASELINE.md). vs_baseline is
baseline_ms / our_ms (>1 = faster than the reference's number).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


BASELINE_FIRST_PACKET_MS = 140.0


def main() -> None:
    import jax

    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    # Serving configuration: int8 backbone + the fused depth-chain Pallas
    # kernel (whole 15-step depth decode in ONE pallas_call, gate proj
    # VMEM-resident, up/down streamed). Measured LM floor on v5e: 12.1
    # (bf16) -> 7.4 (int8 XLA loop) -> 6.5 ms/frame (fused kernel) —
    # tools/devtime.py, PERF.md. The vocoder stays bf16: int8 there
    # measured SLOWER at batch under XLA (B=8 offline 36.5 -> 27.3 — the
    # int4-under-XLA lesson again), so quantize_vocoder ships opt-in only.
    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    quantize_backbone=True,
                    fused_depth_plan="gate=r8,up=s8,down=s8")
    codec = CodecConfig(dtype="bfloat16")
    cfg = EngineConfig(llm=llm, codec=codec)
    engine = FireRedTTS2Engine(config=cfg, seed=0)

    text = ("Hello there, welcome to the show. Today we are going to talk "
            "about streaming text to speech on tensor processing units.")

    def run(n_frames: int):
        t0 = time.perf_counter()
        samples = 0
        chunks = 0
        for chunk in engine.generate_stream(text, "[S1]", [],
                                            max_audio_length_ms=n_frames * 80):
            samples += chunk.shape[0]
            chunks += 1
        wall = time.perf_counter() - t0
        return engine._first_packet_s, samples, wall, chunks

    # Warmup: compiles prefill bucket + all block sizes (1..block cap).
    run(50)
    # Measure (50 frames = 4 s of audio; long enough for the block
    # schedule to reach its cap so steady-state RTF is visible). Min of 3:
    # the tunneled host link has ±25% wall-clock noise.
    runs = [run(50) for _ in range(3)]
    fp_ms = min(r[0] for r in runs) * 1000.0
    audio_s = max(r[1] for r in runs) / 24_000.0
    rtf = audio_s / min(r[2] for r in runs)  # >1 = faster than realtime
    chunks = runs[0][3]

    # Multi-stream throughput: aggregate realtime factor with the
    # continuous batcher (the serving configuration).
    agg_rtf, n_streams = _bench_batched(engine)

    # Offline (non-streaming) single-utterance throughput.
    off_rtf = _bench_offline(engine, text)

    # Device-time + utilization accounting (runtime/perf.py): the tunnel's
    # ±25% wall-clock noise cannot hide a device-time regression because the
    # whole-utterance program is ONE dispatch.
    perf = _bench_device(engine, llm)
    perf["offline_rtf"] = round(off_rtf, 2)

    print(json.dumps({
        "metric": "first_packet_latency_ms_streaming_flagship",
        "value": round(fp_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_FIRST_PACKET_MS / fp_ms, 3),
        "extra": {"realtime_factor": round(rtf, 2),
                  "batched_streams": n_streams,
                  "batched_aggregate_rtf": round(agg_rtf, 2),
                  "frames": chunks, "backend": jax.default_backend(),
                  **perf},
    }))


def _bench_offline(engine, text: str) -> float:
    """Offline generate() realtime factor (whole-utterance program +
    grouped vocoder scan)."""
    def run():
        t0 = time.perf_counter()
        audio = engine.generate(text, "[S1]", [], max_audio_length_ms=8000)
        return (len(audio) / 24_000.0) / (time.perf_counter() - t0)

    run()  # compile
    return max(run(), run())


def _bench_device(engine, llm_cfg) -> dict:
    """Measured LM device ms/frame + analytic MFU/MBU + budget check
    against perf_budget.json (fails loudly in the JSON, not the exit code:
    the driver records the line either way)."""
    import os

    from fireredtts2_tpu.runtime.perf import (
        measure_lm_device_ms_per_frame, utilization)

    # Depth HBM accounting comes from the fused plan when set
    # (runtime/perf.py:depth_frame_weight_bytes); dq only matters for the
    # XLA-loop fallback.
    dq = 1.0 if (engine.config.llm.quantize_depth
                 or engine.config.llm.fused_depth_plan) else 2.0
    bq = 1.0 if engine.config.llm.quantize_backbone else 2.0
    ms = measure_lm_device_ms_per_frame(engine.lm_params, llm_cfg, frames=100)
    u = utilization(llm_cfg, ms, batch=1, depth_bytes_per_param=dq,
                    backbone_bytes_per_param=bq)
    out = {
        "device_ms_per_frame": round(ms, 2),
        "mfu": round(u["mfu"], 4),
        "mbu": round(u["mbu"], 3),
        "chip": u["chip"],
    }
    budget_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "perf_budget.json")
    if os.path.exists(budget_path):
        with open(budget_path) as f:
            budget = json.load(f)
        cap = budget.get("lm_device_ms_per_frame")
        if cap is not None:
            out["device_ms_budget"] = cap
            out["budget_ok"] = bool(ms <= cap * 1.15)
    return out


def _bench_batched(engine, n_streams: int = 8, n_frames: int = 50):
    """Aggregate realtime factor across concurrent batched streams."""
    import numpy as np

    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_streams=n_streams)
    batcher.start()
    try:
        texts = [f"Stream number {i}: a short benchmark sentence about "
                 f"tensor processing units and speech synthesis."
                 for i in range(n_streams)]
        # warmup (compiles batched steps + burst-sized slot prefill: a
        # simultaneous submit admits as ONE batched prefill program)
        warm = [batcher.submit(t, "[S1]", max_audio_length_ms=4 * 80)
                for t in texts]
        for h in warm:
            for _ in h:
                pass
        t0 = time.perf_counter()
        handles = [batcher.submit(t, "[S1]", max_audio_length_ms=n_frames * 80)
                   for t in texts]
        total_samples = 0
        for h in handles:
            for c in h:
                total_samples += len(c)
        wall = time.perf_counter() - t0
        return (total_samples / 24_000.0) / wall, n_streams
    finally:
        batcher.stop()


if __name__ == "__main__":
    sys.exit(main())
