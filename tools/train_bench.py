"""On-chip LM training throughput: steps/s, tokens/s, and train MFU.

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/train_bench.py \
      [--backbone qwen-500m] [--decoder qwen-200m] [--batch 4] [--seq 512] \
      [--steps 8] [--bf16] [--remat dots] [--grad-accum 1] [--zero1] [--tp N]

Prints one JSON line: {"steps_per_s": ..., "tokens_per_s": ..., "mfu": ...,
"flops_per_step": ..., "step_ms": ..., ...}.

Notes:
- fp32 master + AdamW moments cost 12 bytes/param: the flagship qwen-1.5b
  backbone does NOT fit one v5e (16 GB) single-chip — the default here is
  qwen-500m; flagship training is the multi-chip path (--tp/--zero1,
  docs/training.md).
- FLOPs come from XLA's own cost model for the compiled step
  (compiled.cost_analysis()["flops"]), falling back to the 6·N·D
  approximation when the backend does not report them. With remat the
  XLA number INCLUDES the recompute, so MFU stays honest.
- Timing: np.asarray of a metric (never block_until_ready through the
  axon relay, CLAUDE.md), one input varied per step so the relay cache
  cannot serve a repeat.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="qwen-500m")
    ap.add_argument("--decoder", default="qwen-200m")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", default="", choices=["", "full", "dots"])
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--zero1", action="store_true")
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.config import LLMConfig
    from fireredtts2_tpu.models.lm.model import init_lm_params
    from fireredtts2_tpu.parallel.mesh import make_mesh
    from fireredtts2_tpu.runtime.perf import chip_peaks, transformer_matmul_params
    from fireredtts2_tpu.train.loop import synthetic_batches, TrainConfig
    from fireredtts2_tpu.train.step import make_optimizer, make_sharded_train_step

    cfg = LLMConfig(backbone_flavor=args.backbone, decoder_flavor=args.decoder,
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=max(args.seq, 64),
                    dtype="float32", train_remat=args.remat)
    tcfg = TrainConfig(batch_size=args.batch, seq_len=args.seq, tp=args.tp)

    mesh = make_mesh(tp=args.tp)
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    n_params = sum(x.size for x in jax.tree.leaves(params)
                   if hasattr(x, "size"))
    opt = make_optimizer(peak_lr=1e-4, warmup_steps=10, total_steps=1000)
    step_fn, state = make_sharded_train_step(
        mesh, cfg, params, opt,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        zero1=args.zero1, grad_accum=args.grad_accum)

    batches = synthetic_batches(cfg, tcfg, seed=0)
    data = [next(batches) for _ in range(args.steps + 1)]

    # compile + warm step (also surfaces the compiled step's XLA cost model)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, jnp.asarray(data[0][0]),
                             jnp.asarray(data[0][1]), jax.random.PRNGKey(0))
    _ = float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t0

    flops_per_step = None
    try:
        cost = step_fn.jitted.lower(
            state, jnp.asarray(data[0][0]), jnp.asarray(data[0][1]),
            jax.random.PRNGKey(0)).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops_per_step = float(cost["flops"])
    except Exception as e:  # noqa: BLE001 — cost model is best-effort
        print(f"[train_bench] cost_analysis unavailable: {e}", file=sys.stderr)
    if not flops_per_step:
        n_mm = (transformer_matmul_params(cfg.backbone)
                + transformer_matmul_params(cfg.decoder))
        flops_per_step = 6.0 * n_mm * args.batch * args.seq

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, jnp.asarray(data[i + 1][0]),
                                 jnp.asarray(data[i + 1][1]),
                                 jax.random.PRNGKey(i + 1))
    loss = float(np.asarray(metrics["loss"]))       # forces the last step
    wall = time.perf_counter() - t0

    steps_per_s = args.steps / wall
    tokens_per_s = steps_per_s * args.batch * args.seq
    peak_flops, _, kind = chip_peaks()
    n_chips = mesh.devices.size
    mfu = flops_per_step * steps_per_s / (peak_flops * n_chips)
    print(json.dumps({
        "steps_per_s": round(steps_per_s, 3),
        "step_ms": round(1000.0 / steps_per_s, 1),
        "tokens_per_s": round(tokens_per_s, 1),
        "mfu": round(mfu, 4),
        "flops_per_step": flops_per_step,
        "params": n_params,
        "chip": kind, "n_chips": n_chips,
        "batch": args.batch, "seq": args.seq, "bf16": args.bf16,
        "remat": args.remat, "grad_accum": args.grad_accum,
        "zero1": args.zero1, "tp": args.tp,
        "compile_s": round(compile_s, 1),
        "final_loss": round(loss, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
