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


def test_engine_sharded_serving_matches_unsharded():
    """Sharded SERVING (engine mesh mode): the same engine API under a
    (dp=2, tp=4) mesh — LM and codec whisper-stacks Megatron-split over
    tp, stream slots on dp — must synthesize the same audio as the
    unsharded engine (f32; same seed, same key-folding). The user-facing
    capability the model-level test above de-risks; the reference has no
    distributed inference at all (SURVEY.md §2.3)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    cfg = tiny_engine_config()
    kw = dict(config=cfg, seed=3, llm_overrides={"dtype": "float32"})
    text, speaker = "Hello there.", "[S1]"

    e0 = FireRedTTS2Engine(**kw)
    a0 = e0.generate(text, speaker, [], max_audio_length_ms=400)
    s0 = np.concatenate(list(e0.generate_stream(
        text, speaker, [], max_audio_length_ms=400)))

    mesh = make_mesh(tp=4)
    e1 = FireRedTTS2Engine(**kw, mesh=mesh)
    # the big projections really are split over tp=4 — LM and vocoder both
    wq = e1.lm_params["backbone"]["wq"]
    assert wq.sharding.shard_shape(wq.shape)[-1] == wq.shape[-1] // 4
    fc1 = e1.codec_params["acoustic_decoder"]["layers"]["fc1_w"]
    assert fc1.sharding.shard_shape(fc1.shape)[-1] == fc1.shape[-1] // 4
    a1 = e1.generate(text, speaker, [], max_audio_length_ms=400)
    s1 = np.concatenate(list(e1.generate_stream(
        text, speaker, [], max_audio_length_ms=400)))

    np.testing.assert_allclose(a0, a1, atol=2e-5)
    np.testing.assert_allclose(s0, s1, atol=2e-5)


def test_engine_sharded_batch_over_dp():
    """generate_batch under the mesh: B=8 stream slots split dp=2, per-slot
    audio matches the unsharded batch path (dp never reorders per-example
    math; tp=4 reductions are f32)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    cfg = tiny_engine_config()
    kw = dict(config=cfg, seed=5, llm_overrides={"dtype": "float32"})
    texts = ["Hello there.", "Bye now.", "One two.", "Three four."] * 2
    speakers = ["[S1]", "[S2]"] * 4

    e0 = FireRedTTS2Engine(**kw)
    outs0 = e0.generate_batch(texts, speakers, max_audio_length_ms=400)
    e1 = FireRedTTS2Engine(**kw, mesh=make_mesh(tp=4))
    outs1 = e1.generate_batch(texts, speakers, max_audio_length_ms=400)

    assert len(outs0) == len(outs1) == len(texts)
    for x, y in zip(outs0, outs1):
        assert x.shape == y.shape
        np.testing.assert_allclose(x, y, atol=2e-5)


def test_batcher_on_meshed_engine():
    """The SERVING path end to end under sharding: a ContinuousBatcher over
    a meshed engine (params tp=4-split, its B=4 stream slots dp=2-split)
    must produce the same greedy audio as the unsharded batcher."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    def collect(handle):
        chunks = []
        while True:
            c = handle.chunks.get(timeout=300)
            if c is None:
                if handle.error is not None:
                    raise handle.error
                break
            chunks.append(c)
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    cfg = tiny_engine_config(depth_topk=1)
    kw = dict(config=cfg, seed=0, llm_overrides={"dtype": "float32"})
    texts = ["hello mesh", "second words"]

    def run(engine):
        b = ContinuousBatcher(engine, max_streams=4, topk=1)
        b.start()
        try:
            hs = [b.submit(t, "[S1]", max_audio_length_ms=480)
                  for t in texts]
            return [collect(h) for h in hs]
        finally:
            b.stop()

    outs0 = run(FireRedTTS2Engine(**kw))
    outs1 = run(FireRedTTS2Engine(**kw, mesh=make_mesh(tp=4)))
    for x, y in zip(outs0, outs1):
        assert x.shape == y.shape
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=5e-4)


def test_asr_sharded_matches_unsharded():
    """WhisperASR(mesh=...): tp=4-sharded transcription (encoder/decoder
    stacks Megatron-split, vocab-split tied embedding) must produce the
    same tokens as the unsharded model (f32 tiny weights, greedy)."""
    from fireredtts2_tpu.asr import ASRConfig, WhisperASR

    t = np.arange(8_000) / 16_000.0
    tone = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    cfg = ASRConfig(max_new_tokens=8)

    a0 = WhisperASR(config=cfg, warmup=False)
    a1 = WhisperASR(config=cfg, warmup=False, mesh=make_mesh(tp=4))
    wq = a1.params["encoder"]["layers"]["wq"]
    assert wq.sharding.shard_shape(wq.shape)[-1] == wq.shape[-1] // 4
    swq = a1.params["decoder"]["layers"]["self_wq"]
    assert swq.sharding.shard_shape(swq.shape)[-1] == swq.shape[-1] // 4

    r0 = a0.transcribe(tone)
    r1 = a1.transcribe(tone)
    assert [s["tokens"] for s in r0.segments] == \
        [s["tokens"] for s in r1.segments]
    assert r0.text == r1.text


def test_codec_sharded_train_step(rng):
    """Codec training over the mesh (train/codec_step.py): batch on dp,
    whisper stacks on tp; one step runs and its loss matches the
    single-device step (same params, same batch, f32)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import init_codec_params
    from fireredtts2_tpu.train.codec_step import (
        make_codec_train_step, make_codec_sharded_train_step,
        make_codec_optimizer,
    )

    ccfg = tiny_engine_config().codec
    B, T16 = 2, 5120
    audio = jnp.asarray((rng.standard_normal((B, T16)) * 0.1)
                        .astype(np.float32))
    lengths = jnp.asarray(np.full((B,), T16, np.int32))
    target = jnp.asarray((rng.standard_normal((B, T16 * 3 // 2)) * 0.1)
                         .astype(np.float32))

    def first_loss(maker, *extra):
        params = init_codec_params(jax.random.PRNGKey(0), ccfg)
        opt = make_codec_optimizer(peak_lr=1e-3, warmup_steps=2,
                                   total_steps=100)
        step_fn, state = maker(*extra, ccfg, params, opt)
        state, metrics = step_fn(state, audio, lengths, target)
        assert int(state.step) == 1
        return float(metrics["loss"])

    plain = first_loss(lambda c, p, o: make_codec_train_step(c, p, o))
    mesh = make_mesh(tp=4)  # dp=2: B=2 splits 1+1
    shard = first_loss(
        lambda c, p, o: make_codec_sharded_train_step(mesh, c, p, o))
    assert np.isfinite(plain) and np.isfinite(shard)
    assert abs(plain - shard) / max(abs(plain), 1e-6) < 2e-4, (plain, shard)


def test_engine_sharded_serving_int8_backbone():
    """The flagship serving combination: weight-only int8 backbone UNDER
    the (dp, tp) mesh — lm_param_pspecs must shard the int8 weights AND
    their per-output-channel scales together, and the sharded engine must
    synthesize the same audio as the unsharded int8 engine (greedy-ish:
    topk=1 + depth_topk=1 keeps near-tie sampling out of the comparison
    across all-reduce summation orders)."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    kw = dict(config=tiny_engine_config(depth_topk=1), seed=7,
              llm_overrides={"dtype": "float32",
                             "quantize_backbone": True})
    gen = dict(max_audio_length_ms=400, temperature=0.6, topk=1)
    a0 = FireRedTTS2Engine(**kw).generate("Hello there.", "[S1]", [], **gen)

    e1 = FireRedTTS2Engine(**kw, mesh=make_mesh(tp=4))
    wq = e1.lm_params["backbone"]["wq"]
    assert wq.dtype == jnp.int8
    assert wq.sharding.shard_shape(wq.shape)[-1] == wq.shape[-1] // 4
    sc = e1.lm_params["backbone"]["wq_scale"]
    assert sc.sharding.shard_shape(sc.shape)[-1] == sc.shape[-1] // 4
    a1 = e1.generate("Hello there.", "[S1]", [], **gen)
    assert a0.shape == a1.shape
    np.testing.assert_allclose(a0, a1, atol=2e-5)
