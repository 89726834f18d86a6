"""Measure per-frame LM device time on the flagship config, per variant.

Runs `lm_generate_loop` (whole utterance = ONE device dispatch, so the
host<->TPU tunnel RTT amortizes away) for N frames and reports ms/frame.
Variants toggle the Pallas decode-attention path (FRTTS2_PALLAS) and
weight-only int8 on the depth decoder / backbone.

Usage: PYTHONPATH=/root/.axon_site:. python tools/devtime.py [variants...]
  variants: mask pallas mask-int8d pallas-int8d pallas-int8all (default all)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp


FRAMES = 100


def build(quantize_depth: bool, quantize_backbone: bool,
          depth_bits: int = 8, fused_plan: str = "", speculative: bool = False):
    from fireredtts2_tpu.config import LLMConfig
    from fireredtts2_tpu.models.lm.model import (
        init_lm_params, init_lm_state, lm_generate_loop)
    from fireredtts2_tpu.models.lm.transformer import (
        quantize_transformer_int8, quantize_transformer_int4)

    cfg = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    fused_depth_plan=fused_plan, speculative_depth=speculative)
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if fused_plan:
        from fireredtts2_tpu.ops.pallas_depth import enable_fused_depth
        params = enable_fused_depth(params, cfg)
    elif quantize_depth:
        quant = (quantize_transformer_int4 if depth_bits == 4
                 else quantize_transformer_int8)
        params["decoder"] = quant(params["decoder"])
    if quantize_backbone:
        params["backbone"] = quantize_transformer_int8(params["backbone"])
    return cfg, params, init_lm_state, lm_generate_loop


def run_variant(name: str, pallas: bool, int8_depth: bool, int8_backbone: bool,
                batch: int = 1, bucket: int = 128, depth_bits: int = 8,
                fused_plan: str = "", depth_topk: int = 10,
                speculative: bool = False) -> float:
    os.environ["FRTTS2_PALLAS"] = "1" if pallas else "0"
    cfg, params, init_lm_state, lm_generate_loop = build(
        int8_depth, int8_backbone, depth_bits, fused_plan, speculative)

    B, L = batch, bucket
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (B, L, 17), 1, 100)
    tmask = jnp.ones((B, L, 17), bool).at[:, :, :-1].set(False)
    valid = jnp.ones((B, L), bool)

    # frame_cap is traced; max_frames static. EOS never fires with random
    # weights + nonzero sampling, so this runs exactly frame_cap frames.
    # params MUST be a jit argument (closing over them would bake 3 GB of
    # weights into the program as constants and stall the compiler).
    fn = jax.jit(lambda p, st, cap: lm_generate_loop(
        p, cfg, st, tokens, tmask, valid, jax.random.PRNGKey(2),
        max_frames=FRAMES, frame_cap=cap, depth_topk=depth_topk)[2])

    st = init_lm_state(cfg, B, jnp.bfloat16)
    fn(params, st, jnp.int32(FRAMES)).block_until_ready()  # compile
    t0 = time.perf_counter()
    fn(params, st, jnp.int32(FRAMES)).block_until_ready()
    t1 = time.perf_counter()
    fn(params, st, jnp.int32(FRAMES)).block_until_ready()
    t2 = time.perf_counter()
    wall = min(t1 - t0, t2 - t1)
    ms_per_frame = wall * 1000.0 / FRAMES
    print(f"{name:16s} B={batch:2d} {ms_per_frame:7.2f} ms/frame "
          f"(wall {wall*1000:.0f} ms / {FRAMES} frames)", flush=True)
    return ms_per_frame


VARIANTS = {
    "mask":          dict(pallas=False, int8_depth=False, int8_backbone=False),
    "pallas":        dict(pallas=True, int8_depth=False, int8_backbone=False),
    "mask-int8d":    dict(pallas=False, int8_depth=True, int8_backbone=False),
    "pallas-int8d":  dict(pallas=True, int8_depth=True, int8_backbone=False),
    "pallas-int8all": dict(pallas=True, int8_depth=True, int8_backbone=True),
    "int4d-int8b": dict(pallas=False, int8_depth=True, int8_backbone=True,
                        depth_bits=4),
    # Fused depth-chain kernel plans (ops/pallas_depth.py), int8 backbone.
    "fused-r8": dict(pallas=False, int8_depth=False, int8_backbone=True,
                     fused_plan="gate=r8,up=s8,down=s8"),
    "fused-r4": dict(pallas=False, int8_depth=False, int8_backbone=True,
                     fused_plan="gate=r4,up=r4,down=r4"),
    "fused-mix": dict(pallas=False, int8_depth=False, int8_backbone=True,
                      fused_plan="gate=r4,up=s8,down=s8"),
    "fused-mix2": dict(pallas=False, int8_depth=False, int8_backbone=True,
                       fused_plan="gate=r4,up=r4,down=s8"),
    "fused-mix3": dict(pallas=False, int8_depth=False, int8_backbone=True,
                       fused_plan="gate=r4,up=r4,down=r8"),
    "fused-s8": dict(pallas=False, int8_depth=False, int8_backbone=True,
                     fused_plan="gate=s8,up=s8,down=s8"),
    # Sampling-cost probe: depth_topk=1 skips the serial k-th-largest chain.
    "fused-mix-k1": dict(pallas=False, int8_depth=False, int8_backbone=True,
                         fused_plan="gate=r4,up=s8,down=s8", depth_topk=1),
    "int8all-k1": dict(pallas=False, int8_depth=True, int8_backbone=True,
                       depth_topk=1),
    # Speculative (Jacobi) depth decode: rounds ~ worst case on random
    # weights, so this bounds the spec path's cost floor; trained weights
    # are the real measurement (tools/spec_depth_rounds.py --ckpt).
    "spec-int8": dict(pallas=False, int8_depth=True, int8_backbone=True,
                      speculative=True),
    "spec-bf16": dict(pallas=False, int8_depth=False, int8_backbone=False,
                      speculative=True),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    batches = [1]
    bucket = 128
    for a in list(names):
        if a.startswith("-b"):
            names.remove(a)
            batches = [int(x) for x in a[2:].split(",")]
        elif a.startswith("-L"):
            names.remove(a)
            bucket = int(a[2:])
    print(f"backend={jax.default_backend()} devices={jax.device_count()} "
          f"bucket={bucket}", flush=True)
    for b in batches:
        for n in names:
            run_variant(n, batch=b, bucket=bucket, **VARIANTS[n])


if __name__ == "__main__":
    main()
