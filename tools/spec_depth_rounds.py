"""Speculative (Jacobi) depth decode: round count + ms/frame vs the
sequential loop.

The Jacobi path (models/lm/model.py::depth_decode_jacobi) returns exactly
the sequential chain's tokens; its cost is `rounds` parallel verify
passes. rounds depends on acceptance — random weights sit near the worst
case (every position a topk coin flip), trained checkpoints are the
interesting measurement (ROADMAP real-checkpoint round).

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/spec_depth_rounds.py \
      [--tiny] [--ckpt DIR] [--frames N] [B...]

--tiny runs the CPU dev config (mechanism check); --ckpt loads a real
checkpoint's LM weights. Default: flagship dims, random weights.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import (
    _depth_decode, depth_decode_jacobi, init_lm_params,
)


def main() -> None:
    args = sys.argv[1:]
    tiny = "--tiny" in args
    frames = 16
    consumed = set()
    if "--frames" in args:
        i = args.index("--frames")
        frames = int(args[i + 1])
        consumed.add(i + 1)
    if "--ckpt" in args:
        consumed.add(args.index("--ckpt") + 1)
    batches = [int(a) for i, a in enumerate(args)
               if a.isdigit() and i not in consumed] or [1, 8]

    if tiny:
        cfg = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                        text_vocab_size=300, audio_vocab_size=64,
                        audio_num_codebooks=4, max_seq_len=256,
                        dtype="float32")
        dtype = jnp.float32
    else:
        cfg = LLMConfig(backbone_flavor="qwen-1.5b",
                        decoder_flavor="qwen-200m",
                        text_vocab_size=152_000, audio_vocab_size=2051,
                        audio_num_codebooks=16, max_seq_len=3100,
                        dtype="bfloat16")
        dtype = jnp.bfloat16

    if "--ckpt" in args:
        from fireredtts2_tpu.runtime.checkpoint import load_lm_checkpoint
        import os
        d = args[args.index("--ckpt") + 1]
        params = load_lm_checkpoint(os.path.join(d, "llm_posttrain.pt"),
                                    cfg, dtype)
    else:
        params = init_lm_params(jax.random.PRNGKey(0), cfg, dtype)

    for B in batches:
        last_h = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, cfg.backbone.embed_dim), dtype)
        c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                                cfg.audio_vocab_size)

        # Weights as jit ARGS (closing over them bakes GBs of constants
        # into the program — tools/devtime.py trap).
        @jax.jit
        def run_jac(w, h, c, seed):
            def body(carry, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                s, r = depth_decode_jacobi(w, cfg, h, c, key, 10, 0.75)
                return carry + s.sum(), r
            tot, rounds = jax.lax.scan(body, jnp.int32(0),
                                       jnp.arange(frames))
            return tot, rounds

        @jax.jit
        def run_seq(w, h, c, seed):
            def body(carry, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                return carry + _depth_decode(w, cfg, h, c, key,
                                             10, 0.75).sum(), None
            return jax.lax.scan(body, jnp.int32(0), jnp.arange(frames))[0]

        def timed(fn, *a):
            np.asarray(jax.tree.leaves(fn(*a))[0])        # compile
            best, out = float("inf"), None
            for rep in range(1, 4):   # distinct seeds + full value fetch
                t0 = time.perf_counter()
                out = jax.tree.map(np.asarray, fn(*a[:-1] + (jnp.int32(rep * 1000),)))
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_jac, (_, rounds) = timed(run_jac, params, last_h, c0, jnp.int32(0))
        t_seq, _ = timed(run_seq, params, last_h, c0, jnp.int32(0))
        r = np.asarray(rounds)
        print(f"B={B:2d} spec: {t_jac * 1000 / frames:6.2f} ms/frame "
              f"(rounds mean {r.mean():.2f} max {int(r.max())} "
              f"of worst-case {cfg.audio_num_codebooks}) | "
              f"seq: {t_seq * 1000 / frames:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
