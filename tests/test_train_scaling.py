"""Training-scaling features: per-layer remat and ZeRO-1 moment sharding.

Both are value-preserving transforms — remat only changes what the backward
pass saves (jax.checkpoint), ZeRO-1 only changes where the AdamW moments
live (parallel/mesh.py:zero1_pspecs) — so every test here is an equality
against the plain path. Runs on the 8-device virtual CPU mesh (conftest).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import init_lm_params, lm_loss
from fireredtts2_tpu.parallel.mesh import make_mesh
from fireredtts2_tpu.train.step import (
    make_optimizer, make_sharded_train_step,
)

CFG = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                text_vocab_size=300, audio_vocab_size=64,
                audio_num_codebooks=4, max_seq_len=64, dtype="float32")


def _batch(rng, B, S):
    C = CFG.num_columns
    tokens = np.zeros((B, S, C), np.int32)
    mask = np.zeros((B, S, C), bool)
    half = S // 2
    tokens[:, :half, -1] = rng.integers(1, CFG.text_vocab_size, (B, half))
    mask[:, :half, -1] = True
    tokens[:, half:, :-1] = rng.integers(0, CFG.audio_vocab_size,
                                         (B, S - half, CFG.audio_num_codebooks))
    mask[:, half:, :-1] = True
    return jnp.asarray(tokens), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# remat
# ---------------------------------------------------------------------------


def test_remat_loss_and_grads_match(rng):
    """jax.checkpoint must not change loss or gradient VALUES."""
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    tokens, mask = _batch(rng, B=2, S=16)
    key = jax.random.PRNGKey(3)

    def loss_of(cfg):
        def f(p):
            return lm_loss(p, cfg, tokens, mask, key)["loss"]
        return jax.jit(jax.value_and_grad(f))(params)

    base_loss, base_grads = loss_of(CFG)
    for mode in ("full", "dots"):
        cfg = dataclasses.replace(CFG, train_remat=mode)
        loss, grads = loss_of(cfg)
        assert np.allclose(float(loss), float(base_loss), rtol=1e-6), mode
        flat_b = jax.tree.leaves(base_grads)
        flat_r = jax.tree.leaves(grads)
        for gb, gr in zip(flat_b, flat_r):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gb),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)


def test_remat_train_step_matches(rng):
    """3 sharded train steps with remat == without, bit-for-bit inputs."""
    mesh = make_mesh(tp=4)
    tokens, mask = _batch(rng, B=4, S=16)

    def run(cfg):
        params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=50)
        step_fn, state = make_sharded_train_step(mesh, cfg, params, opt)
        losses = []
        for i in range(3):
            state, m = step_fn(state, tokens, mask, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        return losses, state.params

    base_losses, base_params = run(CFG)
    rem_losses, rem_params = run(dataclasses.replace(CFG, train_remat="dots"))
    np.testing.assert_allclose(rem_losses, base_losses, rtol=1e-5)
    for pb, pr in zip(jax.tree.leaves(base_params), jax.tree.leaves(rem_params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


def test_codec_remat_loss_and_grads_match(rng):
    """Codec trainer remat: loss and grads identical with/without
    per-layer checkpointing of the trained whisper stacks."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import init_codec_params
    from fireredtts2_tpu.train.codec_step import (
        codec_train_forward, split_codec_params,
    )

    ccfg = tiny_engine_config().codec
    params = init_codec_params(jax.random.PRNGKey(0), ccfg)
    trainable, frozen = split_codec_params(params)
    audio = jnp.asarray((rng.standard_normal((1, 2560)) * 0.1)
                        .astype(np.float32))
    lengths = jnp.full((1,), 2560, jnp.int32)
    target = jnp.asarray((rng.standard_normal((1, 3840)) * 0.1)
                         .astype(np.float32))

    def loss_of(remat):
        def f(t):
            return codec_train_forward({**t, **frozen}, ccfg, audio,
                                       lengths, target, remat=remat)["loss"]
        return jax.jit(jax.value_and_grad(f))(trainable)

    base_loss, base_grads = loss_of(None)
    loss, grads = loss_of("dots")
    assert np.allclose(float(loss), float(base_loss), rtol=1e-6)
    # Tensor-scale relative error, not elementwise rtol: checkpointing
    # changes XLA fusion order on the recompute, and codec grad tensors
    # span ~6 orders of magnitude (multiscale-mel terms) — near-zero
    # elements then fail any elementwise rtol while the tensors agree to
    # f32 precision (measured worst: 6e-7 of the tensor max).
    for gb, gr in zip(jax.tree.leaves(base_grads), jax.tree.leaves(grads)):
        gb, gr = np.asarray(gb), np.asarray(gr)
        scale = np.max(np.abs(gb)) + 1e-8
        err = np.max(np.abs(gr - gb)) / scale
        assert err <= 2e-5, (err, gb.shape)


# ---------------------------------------------------------------------------
# gradient accumulation
# ---------------------------------------------------------------------------


def test_grad_accum_matches_manual_mean(rng):
    """train_step(grad_accum=2) == one update on the mean of two half-batch
    gradients drawn with fold_in(key, i) — the documented semantics."""
    from fireredtts2_tpu.train.step import TrainState, train_step

    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    tokens, mask = _batch(rng, B=4, S=16)
    key = jax.random.PRNGKey(5)
    opt = make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=50)

    def gfn(t, m, k):
        return jax.grad(lambda p: lm_loss(p, CFG, t, m, k)["loss"])(params)

    g0 = gfn(tokens[:2], mask[:2], jax.random.fold_in(key, 0))
    g1 = gfn(tokens[2:], mask[2:], jax.random.fold_in(key, 1))
    g = jax.tree.map(lambda a, b: (a + b) * 0.5, g0, g1)
    upd, _ = opt.update(g, opt.init(params), params)
    manual = optax.apply_updates(params, upd)

    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    new_state, metrics = train_step(state, tokens, mask, key, cfg=CFG,
                                    optimizer=opt, grad_accum=2)
    assert np.isfinite(float(metrics["loss"]))
    for pm, pa in zip(jax.tree.leaves(manual), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm),
                                   rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# ZeRO-1
# ---------------------------------------------------------------------------


def _find_adam_state(opt_state):
    found = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
            return
        if isinstance(node, tuple):
            for c in node:
                walk(c)

    walk(opt_state)
    assert len(found) == 1, f"expected one ScaleByAdamState, got {len(found)}"
    return found[0]


def test_zero1_moments_are_dp_sharded():
    mesh = make_mesh(tp=4)  # dp=2 x tp=4
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=50)
    _, state = make_sharded_train_step(mesh, CFG, params, opt, zero1=True)

    adam = _find_adam_state(state.opt_state)
    dp = mesh.shape["dp"]
    # Backbone wq: (L=2, D, O) — zero1 shards the leading L axis on dp,
    # composed with the tp column split on the last axis.
    mu_wq = adam.mu["backbone"]["wq"]
    local = mu_wq.sharding.shard_shape(mu_wq.shape)
    assert local[0] == mu_wq.shape[0] // dp, (local, mu_wq.shape)
    assert local[-1] == mu_wq.shape[-1] // mesh.shape["tp"]
    # ... while the PARAM itself stays dp-replicated (ZeRO-1, not FSDP).
    p_wq = state.params["backbone"]["wq"]
    assert p_wq.sharding.shard_shape(p_wq.shape)[0] == p_wq.shape[0]


def test_zero1_steps_match_baseline(rng):
    """ZeRO-1 changes placement, not math: N steps match the plain path,
    and the moments STAY dp-sharded across steps (out_shardings pins them
    against GSPMD re-replication)."""
    mesh = make_mesh(tp=4)
    tokens, mask = _batch(rng, B=4, S=16)

    def run(zero1):
        params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
        opt = make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=50)
        step_fn, state = make_sharded_train_step(mesh, CFG, params, opt,
                                                 zero1=zero1)
        losses = []
        for i in range(3):
            state, m = step_fn(state, tokens, mask, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        return losses, state

    base_losses, base_state = run(False)
    z_losses, z_state = run(True)
    np.testing.assert_allclose(z_losses, base_losses, rtol=1e-5)
    # atol: the reduce-scatter changes grad summation ORDER, and AdamW's
    # rsqrt(nu) amplifies the ~1e-7 f32 difference on near-zero moments —
    # measured worst case ~1e-6 after 3 steps; not a math difference.
    for pb, pz in zip(jax.tree.leaves(base_state.params),
                      jax.tree.leaves(z_state.params)):
        np.testing.assert_allclose(np.asarray(pz), np.asarray(pb),
                                   rtol=1e-5, atol=5e-6)
    mu_wq = _find_adam_state(z_state.opt_state).mu["backbone"]["wq"]
    assert (mu_wq.sharding.shard_shape(mu_wq.shape)[0]
            == mu_wq.shape[0] // mesh.shape["dp"])


def test_codec_zero1_matches_and_shards(rng):
    """Codec trainer: zero1 sharded step == plain sharded step, with the
    AdamW moments actually dp-sharded (train/codec_step.py)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import init_codec_params
    from fireredtts2_tpu.train.codec_step import (
        make_codec_sharded_train_step, make_codec_optimizer,
    )

    ccfg = tiny_engine_config().codec
    B, T16 = 2, 5120
    audio = jnp.asarray((rng.standard_normal((B, T16)) * 0.1)
                        .astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T16, np.int32))
    target = jnp.asarray((rng.standard_normal((B, T16 * 3 // 2)) * 0.1)
                         .astype(np.float32))
    mesh = make_mesh(tp=4)  # dp=2

    def run(zero1):
        params = init_codec_params(jax.random.PRNGKey(0), ccfg)
        opt = make_codec_optimizer(peak_lr=1e-3, warmup_steps=2,
                                   total_steps=100)
        step_fn, state = make_codec_sharded_train_step(mesh, ccfg, params,
                                                       opt, zero1=zero1)
        state, metrics = step_fn(state, audio, lengths, target)
        return float(metrics["loss"]), state

    plain, _ = run(False)
    z, z_state = run(True)
    assert abs(plain - z) / max(abs(plain), 1e-6) < 2e-4, (plain, z)
    mu = _find_adam_state(z_state.opt_state).mu
    dp = mesh.shape["dp"]
    sharded_any = any(
        hasattr(leaf, "sharding")
        and leaf.ndim > 0
        and leaf.sharding.shard_shape(leaf.shape) != leaf.shape
        and np.prod(leaf.sharding.shard_shape(leaf.shape))
            <= np.prod(leaf.shape) // dp
        for leaf in jax.tree.leaves(mu))
    assert sharded_any, "no codec AdamW moment picked up the dp shard"


def test_zero1_with_mixed_precision_runs(rng):
    """zero1 + bf16 compute compose (fp32 master update on sharded moments)."""
    mesh = make_mesh(tp=2)
    tokens, mask = _batch(rng, B=4, S=16)
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(peak_lr=1e-3, warmup_steps=2, total_steps=50)
    step_fn, state = make_sharded_train_step(
        mesh, CFG, params, opt, compute_dtype=jnp.bfloat16, zero1=True)
    for i in range(2):
        state, m = step_fn(state, tokens, mask, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
