"""Codec training step (generator objectives).

The reference ships NO codec training code at all — RedCodec is
inference-only (/root/reference/fireredtts2/codec/model.py:151-235: the
semantic_decoder is constructed and loaded but never called on any
inference path). This module provides the full differentiable pass the
FireRedTTS2 recipe implies from the checkpoint's own structure:

    16 kHz audio -> mel -> [frozen whisper SSL teacher] -> ssl_adaptor ┐
                       \\-> acoustic encoder ─────────────────────────┤
    concat -> ResidualDownConv (12.5 Hz) -> straight-through RVQ       │
    -> UpConv (x4, back to 50 Hz) ─┬-> semantic_decoder ≈ SSL teacher ◄┘
                                   └-> acoustic decoder -> 24 kHz wav

trained with multiscale-mel + waveform-L1 reconstruction, RVQ
commit/codebook terms, and semantic distillation (train/codec_losses.py).
The SSL teacher stays FROZEN: its activations are stop_gradient'ed and
its params live outside the optimizer state entirely (so AdamW weight
decay cannot drift them either).

Sharding mirrors train/step.py: one (dp, tp) mesh, batch on dp, the
whisper-style stacks Megatron-split on tp (parallel/mesh.py:
codec_param_pspecs), XLA inserting the collectives.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fireredtts2_tpu.config import CodecConfig
from fireredtts2_tpu.models.codec.model import _mel
from fireredtts2_tpu.models.codec.whisper_nn import whisper_encoder_forward
from fireredtts2_tpu.models.codec.encoder import (
    ssl_adaptor_forward, down_conv_forward,
)
from fireredtts2_tpu.models.codec.decoder import (
    upconv_forward, acoustic_decoder_forward,
)
from fireredtts2_tpu.train.codec_losses import (
    rvq_encode_st, codec_train_losses,
)

FROZEN_KEYS = ("ssl", "mel_filters")


def split_codec_params(params: Any) -> tuple[dict, dict]:
    """-> (trainable, frozen): the whisper SSL teacher and the constant
    mel filterbank never train."""
    trainable = {k: v for k, v in params.items() if k not in FROZEN_KEYS}
    frozen = {k: params[k] for k in FROZEN_KEYS if k in params}
    return trainable, frozen


def codec_train_forward(params: Any, cfg: CodecConfig, audio16k, lengths,
                        target24k, remat: str | None = None) -> dict:
    """Differentiable full pass -> loss dict (codec_train_losses keys).

    audio16k: (B, T16) float32; lengths: (B,) valid samples;
    target24k: (B, T16 * 3 // 2) float32 ground-truth at the output rate
    (the decoder emits exactly 1.5 samples per input sample: 160-hop mel,
    /2 whisper conv, x4 down, x4 up, x2 + 240-hop vocoder head).

    remat ("full"/"dots", ops/remat.py) applies per-layer jax.checkpoint
    to every TRAINED whisper stack — at 30 s windows the saved layer
    activations dominate training HBM. The frozen SSL teacher is left
    alone: its output is stop_gradient'ed, so no activations are kept
    for it either way.
    """
    mel, mel_len = _mel(params, cfg, audio16k, lengths)
    ssl_t, ssl_len = whisper_encoder_forward(
        params["ssl"], cfg.ssl.num_heads, mel, mel_len)
    ssl_t = jax.lax.stop_gradient(ssl_t)                  # frozen teacher
    sem, _ = ssl_adaptor_forward(params["ssl_adaptor"], cfg.ssl_adaptor,
                                 ssl_t, ssl_len, remat=remat)
    aco, aco_len = whisper_encoder_forward(
        params["acoustic_encoder"], cfg.acoustic_encoder.num_heads,
        mel, mel_len, remat=remat)
    feats = jnp.concatenate([sem, aco], axis=-1)
    down, down_len = down_conv_forward(params["downsample"],
                                       cfg.downsample_factor, feats, aco_len)
    q, _codes, vq_losses = rvq_encode_st(params["rvq"], cfg.rvq,
                                         down.astype(jnp.float32))
    dtype = params["upsample"]["in_proj_w"].dtype
    up = upconv_forward(params["upsample"], cfg.upsample_stride,
                        q.astype(dtype))
    up_len = down_len * cfg.upsample_stride               # back at 50 Hz
    pred_ssl, _ = ssl_adaptor_forward(params["semantic_decoder"],
                                      cfg.semantic_decoder, up, up_len,
                                      remat=remat)
    wav, _ = acoustic_decoder_forward(params["acoustic_decoder"],
                                      cfg.acoustic_decoder, up, up_len,
                                      remat=remat)
    return codec_train_losses(
        wav.astype(jnp.float32), target24k, vq_losses,
        pred_ssl=pred_ssl.astype(jnp.float32), target_ssl=ssl_t,
        ssl_lengths=ssl_len, sample_rate=cfg.output_sample_rate)


class CodecTrainState(NamedTuple):
    params: Any     # trainable subtree
    frozen: Any     # SSL teacher + mel filterbank (never updated)
    opt_state: Any
    step: jax.Array


def make_codec_optimizer(peak_lr: float = 2e-4, warmup_steps: int = 1000,
                         total_steps: int = 200_000,
                         weight_decay: float = 0.01, clip: float = 1.0):
    from fireredtts2_tpu.train.step import warmup_decay_schedule

    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(warmup_decay_schedule(peak_lr, warmup_steps, total_steps),
                    b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def codec_train_step(state: CodecTrainState, audio16k, lengths, target24k,
                     *, cfg: CodecConfig, optimizer,
                     remat: str | None = None) -> tuple:
    def loss_fn(trainable):
        losses = codec_train_forward({**trainable, **state.frozen}, cfg,
                                     audio16k, lengths, target24k,
                                     remat=remat)
        return losses["loss"], losses

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return CodecTrainState(params, state.frozen, opt_state,
                           state.step + 1), metrics


def make_codec_train_step(cfg: CodecConfig, params: Any, optimizer,
                          donate: bool = True, remat: str | None = None):
    """Single-device jitted step. -> (step_fn, state)."""
    from functools import partial

    trainable, frozen = split_codec_params(params)
    state = CodecTrainState(trainable, frozen,
                            optimizer.init(trainable), jnp.zeros((), jnp.int32))
    fn = partial(codec_train_step, cfg=cfg, optimizer=optimizer, remat=remat)
    return jax.jit(fn, donate_argnums=(0,) if donate else ()), state


def make_codec_sharded_train_step(mesh: Mesh, cfg: CodecConfig, params: Any,
                                  optimizer, zero1: bool = False,
                                  remat: str | None = None):
    """(dp, tp)-sharded jitted step (mirrors train/step.py:
    make_sharded_train_step, incl. the zero1 AdamW-moment dp-sharding).
    -> (step_fn, state); feed step_fn batches whose leading (batch) dim
    divides dp."""
    from functools import partial

    from fireredtts2_tpu.parallel.mesh import (
        codec_param_pspecs, sanitize_pspecs, to_named, zero1_pspecs,
    )

    trainable, frozen = split_codec_params(params)
    rep = NamedSharding(mesh, P())
    tspec = sanitize_pspecs(mesh, trainable, codec_param_pspecs(trainable))
    trainable = jax.device_put(trainable, to_named(mesh, tspec))
    frozen = jax.device_put(frozen, jax.tree.map(lambda _: rep, frozen))
    # optax init is zeros_like over the param tree — moments inherit the
    # params' NamedShardings; 0-d leaves (adam step count) land on one
    # device and must be replicated onto the mesh, or a later Orbax
    # restore (which commits arrays to their saved shardings) feeds the
    # jitted step a mixed-device state (train/step.py does the same).
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, rep)
        if (hasattr(x, "ndim") and x.ndim == 0) else x,
        optimizer.init(trainable))
    if zero1:
        from fireredtts2_tpu.train.step import _shard_adam_moments

        mspec = sanitize_pspecs(
            mesh, trainable, zero1_pspecs(mesh, trainable, tspec))
        opt_state = _shard_adam_moments(opt_state, to_named(mesh, mspec))
    state = CodecTrainState(trainable, frozen, opt_state,
                            jax.device_put(jnp.zeros((), jnp.int32), rep))

    batch_sharding = NamedSharding(mesh, P("dp"))
    state_shardings = jax.tree.map(lambda x: x.sharding, state)
    fn = partial(codec_train_step, cfg=cfg, optimizer=optimizer, remat=remat)
    step_fn = jax.jit(fn, donate_argnums=(0,),
                      in_shardings=(state_shardings,
                                    batch_sharding, batch_sharding,
                                    batch_sharding),
                      out_shardings=(state_shardings, None))
    return step_fn, state
