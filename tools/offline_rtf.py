"""Measure offline (non-streaming) single-utterance and batched RTF on the
flagship serving config. Usage: PYTHONPATH=/root/.axon_site:. python
tools/offline_rtf.py [batch...] [--fused=PLAN] [--vocoder-int8]"""
import sys
import time

def main():
    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    args = sys.argv[1:]
    fused = next((a.split("=", 1)[1] for a in args if a.startswith("--fused=")),
                 "")
    vo8 = "--vocoder-int8" in args
    batches = [int(a) for a in args if a.isdigit()] or [1, 8]
    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    quantize_depth=not fused, quantize_backbone=True,
                    fused_depth_plan=fused)
    codec = CodecConfig(dtype="bfloat16", quantize_vocoder=vo8)
    engine = FireRedTTS2Engine(config=EngineConfig(llm=llm, codec=codec),
                               seed=0)
    text = ("Here is a benchmark sentence about synthesis throughput on "
            "tensor processing units, long enough to be representative.")
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
