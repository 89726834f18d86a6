"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.models.lm.model import init_lm_params
from fireredtts2_tpu.parallel.mesh import make_mesh, lm_param_pspecs, to_named
from fireredtts2_tpu.train.step import make_optimizer, make_sharded_train_step

CFG = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                text_vocab_size=300, audio_vocab_size=64,
                audio_num_codebooks=4, max_seq_len=64, dtype="float32")


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_param_sharding_placement():
    mesh = make_mesh(tp=4)
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    specs = lm_param_pspecs(params)
    sharded = jax.device_put(params, to_named(mesh, specs))
    wq = sharded["backbone"]["wq"]
    # column-parallel: local shard has 1/4 of the output features
    assert wq.sharding.shard_shape(wq.shape)[-1] == wq.shape[-1] // 4
    wo = sharded["backbone"]["wo"]
    assert wo.sharding.shard_shape(wo.shape)[1] == wo.shape[1] // 4


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
    return tokens, mask


def test_sharded_train_step_runs_and_improves(rng):
    mesh = make_mesh(tp=4)  # dp=2 x tp=4
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(peak_lr=3e-3, warmup_steps=2, total_steps=100)
    step_fn, state = make_sharded_train_step(mesh, CFG, params, opt)

    tokens, mask = _batch(rng, B=4, S=32)
    losses = []
    for i in range(5):
        state, metrics = step_fn(state, jnp.asarray(tokens), jnp.asarray(mask),
                                 jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5
    # overfitting one tiny batch must reduce loss
    assert losses[-1] < losses[0], losses


def test_tp_sharded_loss_matches_single_device(rng):
    """The tp-sharded forward must compute the same loss as unsharded."""
    from fireredtts2_tpu.models.lm.model import lm_loss

    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    tokens, mask = _batch(rng, B=2, S=16)
    key = jax.random.PRNGKey(7)

    plain = float(lm_loss(params, CFG, jnp.asarray(tokens), jnp.asarray(mask),
                          key)["loss"])

    mesh = make_mesh(tp=4)
    sharded = jax.device_put(params, to_named(mesh, lm_param_pspecs(params)))
    shard_loss = float(jax.jit(
        lambda p, t, m: lm_loss(p, CFG, t, m, key)["loss"]
    )(sharded, jnp.asarray(tokens), jnp.asarray(mask)))
    # Identical math modulo reduction order.
    assert abs(plain - shard_loss) / max(abs(plain), 1e-6) < 2e-4


def test_tp_sharded_decode_tokens_match(rng):
    """Inference TP (VERDICT r2 #6): lm_generate_loop under a tp=4 mesh
    (projections column/row-sharded, XLA inserting the all-reduces) must
    sample EXACTLY the tokens of the unsharded path at f32 — same prompt,
    same key folding."""
    from functools import partial

    from fireredtts2_tpu.models.lm.model import init_lm_state, lm_generate_loop
    from fireredtts2_tpu.parallel.mesh import lm_state_pspecs

    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    B, S = 2, 16
    tokens, mask = _batch(rng, B=B, S=S)
    valid = np.ones((B, S), bool)
    key = jax.random.PRNGKey(11)
    gen = jax.jit(partial(lm_generate_loop, cfg=CFG),
                  static_argnames=("max_frames",))

    def run(p, st):
        _, buf, n = gen(p, state=st, tokens=jnp.asarray(tokens),
                        tokens_mask=jnp.asarray(mask),
                        valid=jnp.asarray(valid), key=key,
                        max_frames=8, frame_cap=jnp.int32(8))
        return np.asarray(buf), np.asarray(n)

    buf0, n0 = run(params, init_lm_state(CFG, B, jnp.float32))

    mesh = make_mesh(tp=4)
    sharded_p = jax.device_put(params, to_named(mesh, lm_param_pspecs(params)))
    st = init_lm_state(CFG, B, jnp.float32)
    sharded_st = jax.device_put(st, to_named(mesh, lm_state_pspecs(st)))
    buf1, n1 = run(sharded_p, sharded_st)

    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(buf0, buf1)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_lm_state_sharding_over_dp():
    """Decode-state shardings: stream slots ride the dp axis."""
    from fireredtts2_tpu.models.lm.model import init_lm_state
    from fireredtts2_tpu.parallel.mesh import lm_state_pspecs, to_named

    mesh = make_mesh(tp=4)  # dp=2
    state = init_lm_state(CFG, batch_size=4)
    sharded = jax.device_put(state, to_named(mesh, lm_state_pspecs(state)))
    # batch dim split over dp=2
    assert sharded.cache_k.sharding.shard_shape(sharded.cache_k.shape)[1] == 2
    assert sharded.slot_valid.sharding.shard_shape(sharded.slot_valid.shape)[0] == 2
