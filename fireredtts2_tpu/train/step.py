"""Sharded training step for the dual-transformer LM.

The reference ships no training loop — only the loss (fireredtts2/llm/
llm.py:145-272), an LR schedule (WarmupDecayLR, llm/utils.py:20-59) and a
grad-norm helper (llm/utils.py:280-292). This module provides the TPU
training step around our `lm_loss`: optax AdamW + warmup-decay schedule,
jitted over a (dp, tp) mesh with NamedSharding on params and batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import lm_loss
from fireredtts2_tpu.parallel.mesh import (
    lm_param_pspecs, sanitize_pspecs, to_named, zero1_pspecs,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def warmup_decay_schedule(peak_lr: float, warmup_steps: int, total_steps: int,
                          decay_type: str = "linear"):
    """Reference WarmupDecayLR semantics (llm/utils.py:33-59)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        frac = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        if decay_type == "linear":
            dec = (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        elif decay_type == "constant":
            dec = jnp.ones_like(step)
        elif decay_type == "exponential":
            dec = 0.1 ** frac
        elif decay_type == "cosine":
            dec = 0.5 * (1 + jnp.cos(jnp.pi * frac))
        else:
            raise ValueError(decay_type)
        return peak_lr * jnp.where(step < warmup_steps, warm, dec)
    return sched


def make_optimizer(peak_lr: float = 3e-4, warmup_steps: int = 1000,
                   total_steps: int = 100_000, weight_decay: float = 0.01,
                   max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(warmup_decay_schedule(peak_lr, warmup_steps, total_steps),
                    weight_decay=weight_decay),
    )


def train_step(state: TrainState, tokens, tokens_mask, key, *,
               cfg: LLMConfig, optimizer: optax.GradientTransformation,
               compute_dtype=None, grad_accum: int = 1):
    """One fp32-master step; returns (new_state, metrics).

    compute_dtype=jnp.bfloat16 enables mixed precision: the forward/backward
    runs with bf16-cast params (MXU-friendly), gradients land in fp32 master
    params via AdamW. Norms inside the model already compute in fp32.

    grad_accum=k splits the batch into k micro-batches and accumulates
    gradients in a lax.scan INSIDE the compiled step — activation memory is
    that of one micro-batch, one optimizer update per call. Each micro-batch
    draws its depth subset from fold_in(key, i), so the accumulated gradient
    equals the mean of k independent half-batch gradients (tested)."""
    def loss_fn(p, tok, msk, k):
        if compute_dtype is not None:
            p = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if (hasattr(x, "dtype") and x.dtype == jnp.float32) else x, p)
        out = lm_loss(p, cfg, tok, msk, k)
        return out["loss"], out

    if grad_accum <= 1:
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, tokens, tokens_mask, key)
    else:
        B = tokens.shape[0]
        assert B % grad_accum == 0, (B, grad_accum)
        tb = tokens.reshape(grad_accum, B // grad_accum, *tokens.shape[1:])
        mb = tokens_mask.reshape(grad_accum, B // grad_accum,
                                 *tokens_mask.shape[1:])
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(grad_accum))

        g_shapes, m_shapes = jax.eval_shape(
            jax.grad(loss_fn, has_aux=True),
            state.params, tb[0], mb[0], keys[0])
        zeros = lambda t: jax.tree.map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), t)

        def body(carry, xs):
            g_acc, m_acc = carry
            t, m, k = xs
            g, met = jax.grad(loss_fn, has_aux=True)(state.params, t, m, k)
            return (jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, m_acc, met)), None

        (g_sum, m_sum), _ = jax.lax.scan(
            body, (zeros(g_shapes), zeros(m_shapes)), (tb, mb, keys))
        inv = 1.0 / grad_accum
        grads = jax.tree.map(lambda g: g * inv, g_sum)
        metrics = jax.tree.map(lambda v: v * inv, m_sum)

    grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    metrics = dict(metrics)
    metrics["grad_norm"] = gnorm
    return TrainState(new_params, new_opt, state.step + 1), metrics


def eval_step(params, tokens, tokens_mask, key, *, cfg: LLMConfig,
              compute_dtype=None):
    """Loss-only forward (no grads) for the eval loop."""
    if compute_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if (hasattr(x, "dtype") and x.dtype == jnp.float32) else x, params)
    return lm_loss(params, cfg, tokens, tokens_mask, key)


def _shard_adam_moments(opt_state, moment_shardings):
    """Re-place every ScaleByAdamState's mu/nu trees (found anywhere in a
    possibly-chained optax state) onto the given sharding tree (ZeRO-1)."""
    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                mu=jax.device_put(node.mu, moment_shardings),
                nu=jax.device_put(node.nu, moment_shardings))
        if isinstance(node, tuple):
            kids = [walk(c) for c in node]
            # NamedTuple states take fields positionally; plain tuples
            # (optax.chain) take one iterable.
            return (type(node)(*kids) if hasattr(node, "_fields")
                    else tuple(kids))
        return node

    return walk(opt_state)


def make_sharded_train_step(mesh: Mesh, cfg: LLMConfig, params,
                            optimizer: optax.GradientTransformation,
                            compute_dtype=None, zero1: bool = False,
                            grad_accum: int = 1):
    """jit the train step with explicit (dp, tp) shardings.

    Batch rides dp; weights/optimizer state ride tp per
    parallel.mesh.lm_param_pspecs. compute_dtype=jnp.bfloat16 turns on
    mixed precision (fp32 master + bf16 forward/backward). zero1=True
    additionally shards the AdamW moments over dp (parallel.mesh.
    zero1_pspecs) — 1/dp of the fp32 mu/nu per chip, values unchanged.
    grad_accum=k accumulates k micro-batch gradients inside the step
    (activation memory of B/k; composes with remat for long sequences).
    Returns (step_fn, sharded TrainState).
    """
    # sanitize: axes the mesh cannot divide (e.g. the 2051 audio vocab on
    # tp=4) fall back to replicated — semantics-preserving under GSPMD
    p_specs = sanitize_pspecs(mesh, params, lm_param_pspecs(params))
    p_shard = to_named(mesh, p_specs)
    params = jax.device_put(params, p_shard)

    data_shard = NamedSharding(mesh, P("dp", None, None))
    rep = NamedSharding(mesh, P())

    # Eager init: zeros_like preserves param shardings for mu/nu; scalars
    # (e.g. adam step count) land on one device and must be replicated.
    opt_state = optimizer.init(params)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, rep)
        if (hasattr(x, "ndim") and x.ndim == 0) else x, opt_state)
    if zero1:
        opt_state = _shard_adam_moments(
            opt_state, to_named(mesh, zero1_pspecs(mesh, params, p_specs)))

    state = TrainState(params, opt_state,
                       jax.device_put(jnp.zeros((), jnp.int32), rep))

    # out_shardings pins the new state to the input layout — without it,
    # GSPMD may legally re-replicate the zero1-sharded moments on output,
    # silently losing the memory win after step 1.
    state_shardings = jax.tree.map(lambda x: x.sharding, state)
    fn = jax.jit(
        partial(train_step, cfg=cfg, optimizer=optimizer,
                compute_dtype=compute_dtype, grad_accum=grad_accum),
        in_shardings=(state_shardings, data_shard, data_shard, rep),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )

    def step_fn(st: TrainState, tokens, tokens_mask, key):
        tokens = jax.device_put(tokens, data_shard)
        tokens_mask = jax.device_put(tokens_mask, data_shard)
        key = jax.device_put(key, rep)
        return fn(st, tokens, tokens_mask, key)

    step_fn.jitted = fn  # AOT handle (tools/train_bench.py cost analysis)
    return step_fn, state


def make_sharded_eval_step(mesh: Mesh, cfg: LLMConfig, compute_dtype=None):
    """jit the eval forward with dp-sharded batches."""
    data_shard = NamedSharding(mesh, P("dp", None, None))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(partial(eval_step, cfg=cfg, compute_dtype=compute_dtype))

    def step_fn(params, tokens, tokens_mask, key):
        tokens = jax.device_put(tokens, data_shard)
        tokens_mask = jax.device_put(tokens_mask, data_shard)
        return fn(params, tokens, tokens_mask, jax.device_put(key, rep))

    return step_fn
