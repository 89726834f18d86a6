"""Depth-chain kernel cost in isolation (no backbone): ms per frame of
JUST the fused kernel call, vs the XLA depth loop. Locates where the
LM frame budget actually goes (tools/devtime.py measures the whole LM).

Usage: PYTHONPATH=/root/.axon_site:. python tools/depth_only.py [plan] [B...]
       [sc=Q,S]    # force the streamed-chunk split (chunks per half, ring
                   # slots) instead of the VMEM-budget auto-choice — the
                   # round-3 A/B knob for non-uniform tile splits:
                   # sc=1,2 sc=2,2 sc=3,2 sc=5,4 (old default)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import _depth_decode, init_lm_params
from fireredtts2_tpu.ops.pallas_depth import (
    fused_depth_decode, prepare_depth_chain,
)

REPEAT = 20  # frames per timed dispatch (scan amortizes launch overhead)


def main() -> None:
    args = sys.argv[1:]
    stream_cfg = None
    for a in list(args):
        if a.startswith("sc="):
            q, s = a[3:].split(",")
            stream_cfg = (int(q), int(s))
            args.remove(a)
    plan = next((a for a in args if "=" in a), "gate=r8,up=s8,down=s8")
    batches = [int(a) for a in args if a.isdigit()] or [1, 8]
    cfg = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16")
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    bundle = prepare_depth_chain(params, cfg, plan)
    params_q = dict(params, decoder=bundle["xla_decoder"])

    for B in batches:
        last_h = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, cfg.backbone.embed_dim), jnp.bfloat16)
        c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                                cfg.audio_vocab_size)

        # Weights MUST be jit ARGUMENTS: closing over them would bake GBs
        # into the program as constants and stall the compiler (same trap
        # tools/devtime.py documents).
        def loop(call):
            def run(weights, h, c, seed):
                def body(carry, i):
                    key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                    return carry + call(weights, h, c, key).sum(), None
                return jax.lax.scan(body, jnp.int32(0),
                                    jnp.arange(REPEAT))[0]
            return jax.jit(run)

        for name, weights, fn in (
            ("fused", bundle, loop(lambda w, h, c, k: fused_depth_decode(
                w, cfg, h, c, k, plan=plan, stream_cfg=stream_cfg))),
            ("xla", params_q, loop(lambda w, h, c, k: _depth_decode(
                w, cfg, h, c, k, 10, 0.75))),
        ):
            import numpy as np

            np.asarray(fn(weights, last_h, c0, jnp.int32(0)))  # compile
            best = float("inf")
            for rep in range(1, 4):  # distinct seeds + value fetch: defeat
                t0 = time.perf_counter()  # any relay-side async shortcuts
                np.asarray(fn(weights, last_h, c0, jnp.int32(rep * 1000)))
                best = min(best, time.perf_counter() - t0)
            sc = f" sc={stream_cfg[0]},{stream_cfg[1]}" if stream_cfg else ""
            print(f"{plan:24s}{sc} B={B:2d} {name:5s}: "
                  f"{best * 1000 / REPEAT:6.2f} ms/frame (depth only)",
                  flush=True)


if __name__ == "__main__":
    main()
