"""On-TPU parity check for the fused depth-chain kernel at flagship dims.

Interpret-mode tests (tests/test_pallas_depth.py) prove the math; this
proves the REAL Mosaic lowering + DMA schedule on the chip: races or
uninitialized reads show up as massive token divergence, while bf16
near-tie argmax flips are fp noise (a few tokens at most).

Usage: PYTHONPATH=/root/.axon_site:. python tools/depth_kernel_check.py \
           [plan ...]   (default: the candidate plans)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import _depth_decode, init_lm_params
from fireredtts2_tpu.ops.pallas_depth import (
    fused_depth_decode, prepare_depth_chain,
)

PLANS = ["gate=r4,up=s8,down=s8", "gate=r4,up=r4,down=s8"]


def main() -> int:
    plans = sys.argv[1:] or PLANS
    cfg = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16")
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    failures = 0
    for plan in plans:
        bundle = prepare_depth_chain(params, cfg, plan)
        params_q = dict(params, decoder=bundle["xla_decoder"])
        for B in (1, 8):
            last_h = jax.random.normal(jax.random.PRNGKey(1),
                                       (B, cfg.backbone.embed_dim),
                                       jnp.bfloat16)
            c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                                    cfg.audio_vocab_size)
            for mode, topk in (("greedy", 1), ("sampled", 10)):
                keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
                match = total = 0
                selfsame = True
                for k in keys:
                    xla = _depth_decode(params_q, cfg, last_h, c0, k,
                                        topk, 0.75)
                    run = lambda: fused_depth_decode(
                        bundle, cfg, last_h, c0, k, depth_topk=topk,
                        depth_temperature=0.75, greedy=(mode == "greedy"),
                        plan=plan)
                    fused = run()
                    # Self-consistency: the kernel must be DETERMINISTIC
                    # run-to-run — any variation means a DMA race, not fp.
                    selfsame &= bool(jnp.all(run() == fused))
                    match += int(jnp.sum(xla == fused))
                    total += xla.size
                pct = 100.0 * match / total
                # The kernel must be bit-deterministic (anything else is a
                # DMA race). vs-XLA match: SAMPLED mode is the robust
                # comparison — the exponential race randomizes selection
                # margins, so bf16 logit noise rarely flips the winner
                # (measured 100% at B=1 on the shipping plan). GREEDY
                # amplifies noise (argmax over raw near-tie logits, flips
                # cascade through the AR chain; 31-94% measured) and is
                # informational only.
                # a8 plans CHANGE numerics by design (per-row activation
                # quantization — the XLA mirror runs unquantized
                # activations), so their vs-XLA match is informational at
                # any mode (measured 43-52% sampled on chip, far above
                # the ~0.5% random floor); determinism stays mandatory.
                a8 = "a8" in plan
                ok = selfsame and (mode == "greedy" or a8 or pct >= 50.0)
                failures += 0 if ok else 1
                print(f"{plan:28s} B={B} {mode:7s}: {match}/{total} tokens "
                      f"match ({pct:.1f}%), deterministic={selfsame} "
                      f"{'OK' if ok else 'FAIL'}", flush=True)
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
