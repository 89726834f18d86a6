"""Per-turn first-packet latency A/B: incremental KV-persistent dialogue
vs the reference-style re-prefill path.

The incremental path (engine.generate_dialogue_stream) keeps the backbone
KV state alive across utterances, so each turn pays one O(new-tokens)
append-prefill; the re-prefill path (generate_stream with a growing
Segment context, the reference's own dialogue loop shape,
/root/reference/fireredtts2/fireredtts2.py:372-398) re-prefills the whole
conversation every turn. Both are timed to the FIRST audio chunk of each
utterance.

Usage: PYTHONPATH=/root/.axon_site:. python tools/dialogue_fpl.py \
    [n_turns] [--fused=PLAN] [--tiny]
"""
import sys
import time

import numpy as np


TURNS = [
    "Hello there, how has your day been going so far?",
    "Pretty well overall, I spent the morning reading about compilers.",
    "That sounds interesting, which part did you find most surprising?",
    "The way tiling decisions interact with memory bandwidth limits.",
    "Right, the fastest kernels are usually the ones that move less data.",
    "Exactly, arithmetic is cheap and wires are expensive these days.",
    "So next time we should profile the copies before the math.",
    "Agreed, let us make that the first step of every investigation.",
]


def main():
    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.engine.engine import Segment
    from fireredtts2_tpu.utils.audio_io import resample

    args = sys.argv[1:]
    fused = next((a.split("=", 1)[1] for a in args if a.startswith("--fused=")),
                 "")
    n_turns = next((int(a) for a in args if a.isdigit()), 6)
    if "--tiny" in args:
        from fireredtts2_tpu.config import tiny_engine_config
        engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    else:
        llm = LLMConfig(backbone_flavor="qwen-1.5b",
                        decoder_flavor="qwen-200m",
                        text_vocab_size=152_000, audio_vocab_size=2051,
                        audio_num_codebooks=16, max_seq_len=3100,
                        dtype="bfloat16", quantize_depth=not fused,
                        quantize_backbone=True, fused_depth_plan=fused)
        codec = CodecConfig(dtype="bfloat16")
        engine = FireRedTTS2Engine(config=EngineConfig(llm=llm, codec=codec),
                                   seed=0)
    # keep turns short so the A/B finishes quickly (and, for the tiny
    # CPU config, fits its 256-position window AND its 192-token max
    # prompt bucket on the re-prefill arm: 3 turns x 200 ms is the
    # largest dialogue both arms accept there)
    if "--tiny" in args:
        cap_ms, n_turns = 200, min(n_turns, 3)
        turns = ["Hi there.", "Hello you.", "Bye now."]
    else:
        cap_ms, turns = 6_000, TURNS
    texts = [("[S1]" if i % 2 == 0 else "[S2]") + turns[i % len(turns)]
             for i in range(n_turns)]

    def run_incremental_per_turn():
        """Per-turn FPL: time from one utterance's last chunk to the
        next utterance's first chunk (what a listener perceives as the
        inter-turn gap)."""
        fpl, cur = [], -1
        t_mark = time.perf_counter()
        for idx, _chunk in engine.generate_dialogue_stream(
                texts, max_utterance_ms=cap_ms):
            if idx != cur:
                fpl.append(time.perf_counter() - t_mark)
                cur = idx
            t_mark = time.perf_counter()
        return fpl

    def run_reprefill_per_turn():
        fpl, context = [], []
        for text in texts:
            speaker, utterance = text[:4], text[4:]
            chunks, t_mark = [], time.perf_counter()
            for chunk in engine.generate_stream(
                    utterance, speaker, context,
                    max_audio_length_ms=cap_ms):
                if not chunks:
                    fpl.append(time.perf_counter() - t_mark)
                chunks.append(chunk)
            audio24 = np.concatenate(chunks) if chunks else np.zeros(
                (240,), np.float32)
            audio16 = resample(audio24, engine.output_sample_rate,
                               engine.sample_rate)
            context.append(Segment(speaker=speaker, text=utterance,
                                   audio=audio16))
        return fpl

    # Compile pass: run BOTH full A/B arms once. A shorter warmup leaves
    # later turns' shapes cold (the re-prefill arm walks a NEW prompt
    # bucket as the context grows, and the incremental arm compiles one
    # append-prefill shape per new-token bucket) — the 2026-08-18 on-chip
    # run had 67-77 s compile stalls inside turns 1/2/4 from exactly that.
    print("warmup (compile): full A/B pass...", flush=True)
    run_incremental_per_turn()
    run_reprefill_per_turn()

    inc = run_incremental_per_turn()
    rep = run_reprefill_per_turn()
    print(f"{'turn':>4} {'incremental_fpl_ms':>19} {'reprefill_fpl_ms':>17}")
    for i in range(n_turns):
        a = inc[i] * 1e3 if i < len(inc) else float("nan")
        b = rep[i] * 1e3 if i < len(rep) else float("nan")
        print(f"{i:>4} {a:>19.1f} {b:>17.1f}")
    if inc and rep:
        print(f"mean turn>0: incremental {np.mean(inc[1:])*1e3:.1f} ms, "
              f"reprefill {np.mean(rep[1:])*1e3:.1f} ms", flush=True)


main()
