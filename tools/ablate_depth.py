"""On-chip cost attribution for the fused depth kernel: run the REAL
kernel (via the generated copy tools/_ablate_depth_kernel.py) with named
pieces disabled and report ms/frame deltas. Numerics are garbage under
ablation; only the timing is meaningful.

Usage: PYTHONPATH=/root/.axon_site:. python tools/ablate_depth.py [B]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def run(abl: str, B: int) -> float:
    os.environ["ABL"] = abl
    # fresh import per ablation setting
    for m in list(sys.modules):
        if "_ablate_depth_kernel" in m:
            del sys.modules[m]
    import importlib
    mod = importlib.import_module("tools._ablate_depth_kernel")

    import jax
    import jax.numpy as jnp
    from fireredtts2_tpu.config import LLMConfig
    from fireredtts2_tpu.models.lm.model import init_lm_params

    cfg = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16")
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    plan = "gate=r8,up=s8,down=s8"
    bundle = mod.prepare_depth_chain(params, cfg, plan)
    bundle.pop("xla_decoder")
    last_h = jax.random.normal(jax.random.PRNGKey(1),
                               (B, cfg.backbone.embed_dim), jnp.bfloat16)
    c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 2051)

    REPEAT = 20

    def run_fn(weights, h, c, seed):
        def body(carry, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
            return carry + mod.fused_depth_decode(
                weights, cfg, h, c, key, plan=plan,
                stream_cfg=(2, 2)).sum(), None
        return jax.lax.scan(body, jnp.int32(0), jnp.arange(REPEAT))[0]

    fn = jax.jit(run_fn)
    np.asarray(fn(bundle, last_h, c0, jnp.int32(0)))
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        np.asarray(fn(bundle, last_h, c0, jnp.int32(rep * 1000)))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / REPEAT
    print(f"ABL={abl or '(none)':12s} B={B}: {ms:6.2f} ms/frame", flush=True)
    return ms


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    names = sys.argv[2:] or ["", "waits,dmas", "attn,waits,dmas",
                             "attn,samp,waits,dmas"]
    for abl in names:
        run(abl, B)
