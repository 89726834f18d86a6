"""Codec training loop with checkpoint/resume.

The reference ships no codec training at all — RedCodec is loaded
inference-only (/root/reference/fireredtts2/codec/model.py:151-235) and
even its semantic_decoder is never called. This completes the recipe the
checkpoint's own structure implies (see train/codec_step.py): a driver
mirroring train/loop.py's LM loop —

- audio data pipeline: 16/24 kHz aligned windows from a wav directory,
  or synthetic noise windows for smoke/dev;
- (dp, tp)-sharded train step (train/codec_step.py) over one mesh;
- Orbax checkpointing every N steps with resume (trainable params +
  opt state + step; the frozen SSL teacher is saved alongside so a
  resumed run is bit-identical even if the conversion source moved).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import CodecConfig
from fireredtts2_tpu.models.codec.model import init_codec_params
from fireredtts2_tpu.parallel.mesh import make_mesh
from fireredtts2_tpu.train.codec_step import (
    CodecTrainState, codec_train_forward, make_codec_optimizer,
    make_codec_sharded_train_step,
)
from fireredtts2_tpu.train.loop import MetricsLogger


@dataclass
class CodecTrainConfig:
    batch_size: int = 8
    # One 12.5 Hz RVQ token spans 1280 samples @16 kHz (160-hop mel, /2
    # whisper conv, /4 down); windows must be a multiple of that.
    window_samples: int = 32_000          # 2.0 s @16 kHz = 25 tokens
    peak_lr: float = 2e-4
    warmup_steps: int = 1000
    total_steps: int = 200_000
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    checkpoint_every: int = 1000
    checkpoint_dir: Optional[str] = None
    log_every: int = 50
    dp: Optional[int] = None
    tp: int = 1
    # Eval cadence mirrors TrainConfig: eval_batches of held-out windows
    # every eval_every steps (0 = off); metrics stream as jsonl.
    eval_every: int = 0
    eval_batches: int = 8
    metrics_path: Optional[str] = None
    # ZeRO-1: shard the AdamW moments over dp (train/codec_step.py).
    zero1: bool = False
    # Per-layer remat of the trained whisper stacks ("", "full", "dots") —
    # activation memory for recompute; values unchanged (ops/remat.py).
    remat: str = ""

    # samples per RVQ token at the input rate
    TOKEN_SAMPLES = 1280

    def __post_init__(self):
        if self.window_samples % self.TOKEN_SAMPLES:
            raise ValueError(
                f"window_samples must be a multiple of {self.TOKEN_SAMPLES} "
                f"(one 12.5 Hz token @16 kHz), got {self.window_samples}")


def synthetic_audio_batches(tcfg: CodecTrainConfig, seed: int = 0
                            ) -> Iterator[tuple]:
    """Random (audio16k, lengths, target24k) windows (dev/smoke)."""
    rng = np.random.default_rng(seed)
    B, T16 = tcfg.batch_size, tcfg.window_samples
    while True:
        audio = (rng.standard_normal((B, T16)) * 0.1).astype(np.float32)
        lengths = np.full((B,), T16, np.int32)
        target = (rng.standard_normal((B, T16 * 3 // 2)) * 0.1
                  ).astype(np.float32)
        yield audio, lengths, target


def wav_dir_batches(path: str, tcfg: CodecTrainConfig, seed: int = 0,
                    loop: bool = True) -> Iterator[tuple]:
    """Aligned 16/24 kHz training windows from a directory of wavs.

    Each wav is resampled once to BOTH rates; windows are cut on token
    boundaries so input[i*1280:(i+k)*1280] @16k lines up with
    target[i*1920:(i+k)*1920] @24k (the decoder emits exactly 1.5
    samples per input sample). Short files are zero-padded into one
    window with `lengths` marking the valid prefix.
    """
    from fireredtts2_tpu.utils.audio_io import load_wav_mono, resample

    files = sorted(f for f in os.listdir(path) if f.endswith(".wav"))
    if not files:
        raise FileNotFoundError(f"no .wav files under {path}")
    rng = np.random.default_rng(seed)
    T16 = tcfg.window_samples
    T24 = T16 * 3 // 2
    buf: list[tuple] = []
    while True:  # loop epochs
        for name in files:
            wav, sr = load_wav_mono(os.path.join(path, name))
            a16 = resample(wav, sr, 16_000)
            a24 = resample(wav, sr, 24_000)
            n_tok = max(len(a16) // CodecTrainConfig.TOKEN_SAMPLES, 1)
            n_win = max(n_tok * CodecTrainConfig.TOKEN_SAMPLES // T16, 1)
            for _ in range(n_win):
                if len(a16) <= T16:
                    x = np.zeros(T16, np.float32)
                    y = np.zeros(T24, np.float32)
                    x[:len(a16)] = a16
                    y[:min(len(a24), T24)] = a24[:T24]
                    length = len(a16)
                else:
                    max_tok = (len(a16) - T16) // CodecTrainConfig.TOKEN_SAMPLES
                    t0 = int(rng.integers(0, max_tok + 1))
                    i16 = t0 * CodecTrainConfig.TOKEN_SAMPLES
                    i24 = i16 * 3 // 2
                    x = a16[i16:i16 + T16].astype(np.float32)
                    y = np.zeros(T24, np.float32)
                    seg = a24[i24:i24 + T24]
                    y[:len(seg)] = seg
                    length = T16
                buf.append((x, length, y))
                if len(buf) == tcfg.batch_size:
                    xs, ls, ys = zip(*buf)
                    yield (np.stack(xs), np.asarray(ls, np.int32),
                           np.stack(ys))
                    buf = []
        if not loop:
            if buf:  # flush the final partial batch (may be smaller —
                # fine for eval sweeps; training loops normally loop=True)
                xs, ls, ys = zip(*buf)
                yield (np.stack(xs), np.asarray(ls, np.int32),
                       np.stack(ys))
            return


def save_codec_checkpoint(ckpt_dir: str, state: CodecTrainState) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "frozen": state.frozen,
                      "opt_state": state.opt_state, "step": state.step},
               force=True)
    ckptr.wait_until_finished()
    return path


def latest_codec_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_codec_checkpoint(path: str, like: CodecTrainState
                             ) -> CodecTrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, {"params": like.params,
                                    "frozen": like.frozen,
                                    "opt_state": like.opt_state,
                                    "step": like.step})
    return CodecTrainState(params=restored["params"],
                           frozen=restored["frozen"],
                           opt_state=restored["opt_state"],
                           step=restored["step"])


def train_codec(cfg: CodecConfig, tcfg: CodecTrainConfig, data=None,
                num_steps: int = 100, seed: int = 0, log=print,
                eval_data=None, init_params=None) -> CodecTrainState:
    """Run `num_steps` of codec training; resumes from tcfg.checkpoint_dir.

    init_params: full codec param tree (e.g. converted from a checkpoint
    with the real whisper SSL teacher loaded); random-init when None.
    """
    mesh = make_mesh(dp=tcfg.dp, tp=tcfg.tp)
    params = init_params if init_params is not None else init_codec_params(
        jax.random.PRNGKey(seed), cfg)
    optimizer = make_codec_optimizer(tcfg.peak_lr, tcfg.warmup_steps,
                                     tcfg.total_steps, tcfg.weight_decay,
                                     tcfg.max_grad_norm)
    step_fn, state = make_codec_sharded_train_step(mesh, cfg, params,
                                                   optimizer,
                                                   zero1=tcfg.zero1,
                                                   remat=tcfg.remat or None)
    eval_fn = None
    if tcfg.eval_every:
        # cfg is closed over (same pattern as codec_step): one compiled
        # eval program reused across the run.
        _eval = jax.jit(lambda p, a, ln, y: codec_train_forward(
            p, cfg, a, ln, y))

        def eval_fn(state, audio, lengths, target):  # noqa: E306
            return _eval({**state.params, **state.frozen}, audio, lengths,
                         target)

    if tcfg.checkpoint_dir:
        latest = latest_codec_checkpoint(tcfg.checkpoint_dir)
        if latest:
            state = restore_codec_checkpoint(latest, state)
            log(f"resumed from {latest} at step {int(state.step)}")

    if data is None:
        data = synthetic_audio_batches(tcfg, seed)

    metrics_log = MetricsLogger(tcfg.metrics_path)
    t0 = time.perf_counter()
    try:
        for i, (audio, lengths, target) in enumerate(data):
            if i >= num_steps:
                break
            state, metrics = step_fn(state, jnp.asarray(audio),
                                     jnp.asarray(lengths),
                                     jnp.asarray(target))
            step = int(state.step)
            if step % tcfg.log_every == 0 or i == num_steps - 1:
                dt = time.perf_counter() - t0
                log(f"step {step}: loss {float(metrics['loss']):.4f} "
                    f"(mel {float(metrics['mel_loss']):.3f} "
                    f"wave {float(metrics['wave_loss']):.3f} "
                    f"sem {float(metrics['semantic_loss']):.3f} "
                    f"commit {float(metrics['commit_loss']):.3f} "
                    f"gnorm {float(metrics['grad_norm']):.2f}) "
                    f"{(i + 1) / dt:.2f} steps/s")
                metrics_log.log(step, "train", metrics)
            if eval_fn and step % tcfg.eval_every == 0:
                sums: dict[str, float] = {}
                src = eval_data or synthetic_audio_batches(tcfg, seed + 1)
                n = 0
                for j, (a, ln, y) in enumerate(src):
                    if j >= tcfg.eval_batches:
                        break
                    out = eval_fn(state, jnp.asarray(a), jnp.asarray(ln),
                                  jnp.asarray(y))
                    for k, v in out.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                    n += 1
                ev = {f"eval_{k}": v / max(n, 1) for k, v in sums.items()}
                log(f"step {step}: " + " ".join(
                    f"{k} {v:.4f}" for k, v in ev.items()))
                metrics_log.log(step, "eval", ev)
            if tcfg.checkpoint_dir and step % tcfg.checkpoint_every == 0:
                save_codec_checkpoint(tcfg.checkpoint_dir, state)
        if tcfg.checkpoint_dir:
            save_codec_checkpoint(tcfg.checkpoint_dir, state)
    finally:
        metrics_log.close()
    return state
