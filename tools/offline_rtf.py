"""Measure offline (non-streaming) single-utterance and batched RTF on the
flagship serving config (int8). Usage: PYTHONPATH=/root/.axon_site:. python
tools/offline_rtf.py [batch...]"""
import sys
import time

def main():
    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    quantize_depth=True, quantize_backbone=True)
    engine = FireRedTTS2Engine(config=EngineConfig(llm=llm, codec=CodecConfig(dtype="bfloat16")), seed=0)
    text = ("Here is a benchmark sentence about synthesis throughput on "
            "tensor processing units, long enough to be representative.")
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    for B in batches:
        fn = (lambda: engine.generate(text, "[S1]", [], max_audio_length_ms=8000)) if B == 1 \
            else (lambda: engine.generate_batch([text] * B, ["[S1]"] * B, max_audio_length_ms=8000))
        fn()  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            samples = len(out) if B == 1 else sum(len(o) for o in out)
            best = min(best, dt / max(samples / 24_000.0, 1e-9))
        print(f"B={B:2d} offline RTF {1.0/best:.2f}", flush=True)

main()
