"""Training loop with checkpoint/resume.

The reference ships no training loop — only the loss, an LR schedule, and
TensorBoard helpers (SURVEY §5 checkpoint/resume: "No training
checkpointing (no training loop ships)"). This completes the story:

- batched interleaved-frame data pipeline (jsonl token shards like the
  reference's reader, llm/utils.py:295-303, or synthetic batches for
  smoke/dev);
- sharded train step over the (dp, tp) mesh (train/step.py);
- Orbax checkpointing every N steps with resume (params + opt state + step).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import init_lm_params
from fireredtts2_tpu.parallel.mesh import make_mesh
from fireredtts2_tpu.train.step import (
    make_optimizer, make_sharded_train_step, make_sharded_eval_step,
    TrainState,
)


class MetricsLogger:
    """Append-only jsonl metrics stream (the reference logs to
    TensorBoard via torch.utils.tensorboard — not in this image; jsonl is
    greppable and loads straight into pandas)."""

    def __init__(self, path: Optional[str]):
        self._f = open(path, "a") if path else None

    def log(self, step: int, kind: str, metrics: dict) -> None:
        if self._f is None:
            return
        row = {"step": step, "kind": kind, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()


def evaluate(eval_fn, params, data, n_batches: int, seed: int = 1) -> dict:
    """Mean losses over n_batches of held-out data."""
    sums: dict[str, float] = {}
    for i, (tokens, mask) in enumerate(data):
        if i >= n_batches:
            break
        out = eval_fn(params, jnp.asarray(tokens), jnp.asarray(mask),
                      jax.random.fold_in(jax.random.PRNGKey(seed), i))
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    n = max(min(n_batches, i + 1), 1)
    return {f"eval_{k}": v / n for k, v in sums.items()}


@dataclass
class TrainConfig:
    batch_size: int = 8
    seq_len: int = 256
    peak_lr: float = 3e-4
    warmup_steps: int = 1000
    total_steps: int = 100_000
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    checkpoint_every: int = 1000
    checkpoint_dir: Optional[str] = None
    log_every: int = 50
    dp: Optional[int] = None
    tp: int = 1
    # Mixed precision: fp32 master params, bf16 forward/backward.
    mixed_precision: bool = False
    # ZeRO-1: shard the AdamW moments over dp (train/step.py) — saves
    # 8 bytes/param/chip of fp32 mu+nu; step values are unchanged.
    zero1: bool = False
    # Per-layer rematerialization: "" (off), "full", or "dots"
    # (models/lm/transformer.py:remat_layer). Activation-memory /
    # recompute trade for long seq_len; loss values are unchanged.
    remat: str = ""
    # In-step gradient accumulation: k micro-batches of batch_size/k per
    # optimizer update (train/step.py) — one compiled program, activation
    # memory of one micro-batch.
    grad_accum: int = 1
    # Eval cadence: run eval_batches of held-out data every eval_every steps
    # (0 = off); metrics stream to metrics_path as jsonl if set.
    eval_every: int = 0
    eval_batches: int = 8
    metrics_path: Optional[str] = None


def synthetic_batches(cfg: LLMConfig, tcfg: TrainConfig, seed: int = 0
                      ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Random interleaved text+audio frame batches (dev/smoke)."""
    rng = np.random.default_rng(seed)
    B, S, C = tcfg.batch_size, tcfg.seq_len, cfg.num_columns
    while True:
        tokens = np.zeros((B, S, C), np.int32)
        mask = np.zeros((B, S, C), bool)
        for b in range(B):
            n_text = int(rng.integers(S // 8, S // 2))
            tokens[b, :n_text, -1] = rng.integers(1, cfg.text_vocab_size, n_text)
            mask[b, :n_text, -1] = True
            tokens[b, n_text:, :-1] = rng.integers(
                0, cfg.audio_vocab_size, (S - n_text, cfg.audio_num_codebooks))
            mask[b, n_text:, :-1] = True
        yield tokens, mask


def jsonl_batches(path: str, cfg: LLMConfig, tcfg: TrainConfig
                  ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Token-shard reader: each jsonl line holds {"text_tokens": [...],
    "audio_tokens": [[...x ncb]...]} (layout mirroring the reference's
    jsonl reader + frame construction, fireredtts2.py:72-115)."""
    B, S, C = tcfg.batch_size, tcfg.seq_len, cfg.num_columns
    buf_t, buf_m = [], []
    while True:  # loop epochs
        with open(path) as f:
            for line in f:
                d = json.loads(line)
                text = d.get("text_tokens", [])
                audio = d.get("audio_tokens", [])
                T = min(S, len(text) + len(audio) + 1)
                tokens = np.zeros((S, C), np.int32)
                mask = np.zeros((S, C), bool)
                nt = min(len(text), S)
                tokens[:nt, -1] = text[:nt]
                mask[:nt, -1] = True
                na = min(len(audio), S - nt - 1)
                if na > 0:
                    tokens[nt:nt + na, :-1] = np.asarray(audio[:na], np.int32)
                    mask[nt:nt + na + 1, :-1] = True  # +1 = EOS frame
                del T
                buf_t.append(tokens)
                buf_m.append(mask)
                if len(buf_t) == B:
                    yield np.stack(buf_t), np.stack(buf_m)
                    buf_t, buf_m = [], []


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": state.step}, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_checkpoint(path: str, like: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, {"params": like.params,
                                    "opt_state": like.opt_state,
                                    "step": like.step})
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])


def train(cfg: LLMConfig, tcfg: TrainConfig, data=None, num_steps: int = 100,
          seed: int = 0, log=print, eval_data=None) -> TrainState:
    """Run `num_steps` of training; resumes from tcfg.checkpoint_dir."""
    mesh = make_mesh(dp=tcfg.dp, tp=tcfg.tp)
    if tcfg.remat:
        cfg = dataclasses.replace(cfg, train_remat=tcfg.remat)
    params = init_lm_params(jax.random.PRNGKey(seed), cfg, jnp.float32)
    optimizer = make_optimizer(tcfg.peak_lr, tcfg.warmup_steps,
                               tcfg.total_steps, tcfg.weight_decay,
                               tcfg.max_grad_norm)
    compute_dtype = jnp.bfloat16 if tcfg.mixed_precision else None
    step_fn, state = make_sharded_train_step(mesh, cfg, params, optimizer,
                                             compute_dtype=compute_dtype,
                                             zero1=tcfg.zero1,
                                             grad_accum=tcfg.grad_accum)
    eval_fn = make_sharded_eval_step(mesh, cfg, compute_dtype=compute_dtype) \
        if tcfg.eval_every else None

    if tcfg.checkpoint_dir:
        latest = latest_checkpoint(tcfg.checkpoint_dir)
        if latest:
            state = restore_checkpoint(latest, state)
            log(f"resumed from {latest} at step {int(state.step)}")

    if data is None:
        data = synthetic_batches(cfg, tcfg, seed)

    metrics_log = MetricsLogger(tcfg.metrics_path)
    t0 = time.perf_counter()
    start = int(state.step)
    try:
        for i, (tokens, mask) in enumerate(data):
            if i >= num_steps:
                break
            state, metrics = step_fn(
                state, jnp.asarray(tokens), jnp.asarray(mask),
                jax.random.fold_in(jax.random.PRNGKey(seed), start + i))
            step = int(state.step)
            if step % tcfg.log_every == 0 or i == num_steps - 1:
                dt = time.perf_counter() - t0
                log(f"step {step}: loss {float(metrics['loss']):.4f} "
                    f"(c0 {float(metrics['c0_loss']):.3f} "
                    f"depth {float(metrics['depth_loss']):.3f} "
                    f"text {float(metrics['text_loss']):.3f} "
                    f"gnorm {float(metrics['grad_norm']):.2f}) "
                    f"{(i + 1) / dt:.2f} steps/s")
                metrics_log.log(step, "train", metrics)
            if eval_fn and step % tcfg.eval_every == 0:
                ev = evaluate(eval_fn, state.params,
                              eval_data or synthetic_batches(cfg, tcfg, seed + 1),
                              tcfg.eval_batches)
                log(f"step {step}: " + " ".join(
                    f"{k} {v:.4f}" for k, v in ev.items()))
                metrics_log.log(step, "eval", ev)
            if tcfg.checkpoint_dir and step % tcfg.checkpoint_every == 0:
                save_checkpoint(tcfg.checkpoint_dir, state)
        if tcfg.checkpoint_dir:
            save_checkpoint(tcfg.checkpoint_dir, state)
    finally:
        metrics_log.close()
    return state
