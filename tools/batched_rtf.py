"""Measure aggregate serving RTF at N concurrent streams via the
continuous batcher (the VERDICT round-1 scaling question: does 16-stream
beat 8-stream aggregate?).

Usage: PYTHONPATH=/root/.axon_site:. python tools/batched_rtf.py [N...]
"""

import sys
import time


def main():
    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    quantize_backbone=True,
                    fused_depth_plan="gate=r8,up=s8,down=s8")
    engine = FireRedTTS2Engine(
        config=EngineConfig(llm=llm, codec=CodecConfig(dtype="bfloat16")),
        seed=0)
    n_frames = 50

    for n in [int(a) for a in sys.argv[1:]] or [8, 16]:
        batcher = ContinuousBatcher(engine, max_streams=n)
        batcher.start()
        try:
            texts = [f"Stream {i}: benchmark sentence about speech synthesis "
                     f"throughput on tensor processing units." for i in range(n)]
            warm = [batcher.submit(t, "[S1]", max_audio_length_ms=4 * 80)
                    for t in texts]
            for h in warm:
                for _ in h:
                    pass
            t0 = time.perf_counter()
            handles = [batcher.submit(t, "[S1]",
                                      max_audio_length_ms=n_frames * 80)
                       for t in texts]
            total = 0
            for h in handles:
                for c in h:
                    total += len(c)
            wall = time.perf_counter() - t0
            print(f"N={n:3d} aggregate RTF {(total/24_000.0)/wall:6.2f} "
                  f"({total/24_000.0:.1f}s audio / {wall:.1f}s wall)",
                  flush=True)
        finally:
            batcher.stop()


main()
