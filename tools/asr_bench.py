"""ASR serving benchmark: whisper-large-v3 transcription RTF on the
current backend (TPU via axon, or CPU for a smoke run).

    PYTHONPATH=.:$PYTHONPATH:/root/.axon_site python tools/asr_bench.py
    ... --int8          # weight-only int8 hot path A/B
    ... --max-new 64    # decode budget per 30 s window

Random bf16 weights at real dims — wall time depends on dims only, and
random-logit greedy rarely hits EOT, so every run pays the FULL decode
budget: the reported ms/token is an upper bound per decoded token.
Prints one JSON line. The reference never ran ASR on the accelerator at
all (/root/reference/whisper_asr.py wraps openai-whisper on CUDA/CPU).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dev dims (CPU smoke of the tool itself)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.asr import ASRConfig, WhisperASR
    from fireredtts2_tpu.asr.model import (
        TINY_ASR, WhisperASRModelConfig, init_asr_params,
    )

    mcfg = TINY_ASR if args.tiny else WhisperASRModelConfig()
    if args.tiny:
        args.max_new = min(args.max_new, 8)
    params = init_asr_params(jax.random.PRNGKey(0), mcfg, jnp.bfloat16)
    asr = WhisperASR(params=params, model_cfg=mcfg,
                     config=ASRConfig(max_new_tokens=args.max_new,
                                      prev_window=0),
                     warmup=False, quantize_int8=args.int8)

    rng = np.random.default_rng(0)
    n = int(args.seconds * 16_000)

    def audio(i: int) -> np.ndarray:
        # speech-band chirp + noise; varies per call so the tunnel relay
        # cache cannot serve a repeat (CLAUDE.md measurement pitfall)
        t = np.arange(n) / 16_000.0
        x = 0.2 * np.sin(2 * np.pi * (150 + 17 * i + 900 * t / t[-1]) * t)
        return (x + 0.02 * rng.standard_normal(n)).astype(np.float32)

    asr.transcribe(audio(999))              # compile
    walls, toks = [], 0
    for i in range(args.repeat):
        t0 = time.perf_counter()
        r = asr.transcribe(audio(i))
        walls.append(time.perf_counter() - t0)
        toks = sum(len(s["tokens"]) for s in r.segments)
    med = sorted(walls)[len(walls) // 2]
    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "int8": args.int8, "audio_s": args.seconds,
        "wall_s": round(med, 3), "rtf": round(args.seconds / med, 2),
        "tokens": toks,
        "ms_per_token": round(1e3 * med / max(toks, 1), 3),
        "walls": [round(w, 3) for w in walls],
    }))
    return 0


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
