"""Fused depth-chain kernel (ops/pallas_depth.py) vs the XLA depth loop.

The kernel must sample IDENTICAL tokens to models/lm/model.py::_depth_decode
for the same key: both draw the exponential-race noise with
fold_in(key, step), and the XLA fallback runs on the same mixed-quantized
weights the kernel reads (prepare_depth_chain returns both views sharing
buffers). Tests run in Pallas interpret mode on the CPU mesh at tiny dims
(f32 — dequantized math is bitwise-identical between the two paths there).
"""

import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import LLMConfig, tiny_engine_config
from fireredtts2_tpu.models.lm.model import (
    _depth_decode, init_lm_params, init_lm_state, lm_generate_frame,
)
from fireredtts2_tpu.ops.pallas_depth import (
    enable_fused_depth, fused_depth_decode, parse_plan, prepare_depth_chain,
)

PLANS = ["", "gate=r4,up=s8,down=s8", "gate=s8,up=r4,down=r4",
         "gate=s8,up=s8,down=s8"]


def _tiny_cfg(plan=""):
    return LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                     text_vocab_size=300, audio_vocab_size=64,
                     audio_num_codebooks=4, max_seq_len=256, dtype="float32",
                     fused_depth_plan=plan)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    params = init_lm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B = 3
    last_h = jax.random.normal(jax.random.PRNGKey(1),
                               (B, cfg.backbone.embed_dim), jnp.float32)
    c0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                            cfg.audio_vocab_size)
    return cfg, params, last_h, c0


def test_parse_plan():
    assert parse_plan("") == {"w_gate": "r8", "w_up": "r8", "w_down": "r8"}
    assert parse_plan("gate=r4,down=s8") == {
        "w_gate": "r4", "w_up": "r8", "w_down": "s8"}
    assert parse_plan("gate=r8a8,up=s8a8") == {
        "w_gate": "r8a8", "w_up": "s8a8", "w_down": "r8"}


@pytest.mark.parametrize("bad", ["gate:r8", "proj=r8", "gate=r9",
                                 "gate", "up=,down=s8"])
def test_parse_plan_rejects_malformed_with_clear_error(bad):
    """--fused-depth-plan is a CLI knob: malformed strings must raise a
    ValueError naming the grammar, not a bare KeyError (ADVICE r2)."""
    with pytest.raises(ValueError, match="gate.*up.*|expected"):
        parse_plan(bad)


@pytest.mark.parametrize("plan", PLANS)
def test_sampled_tokens_match_xla(setup, plan):
    cfg, params, last_h, c0 = setup
    bundle = prepare_depth_chain(params, cfg, plan)
    params_q = dict(params, decoder=bundle["xla_decoder"])
    key = jax.random.PRNGKey(7)
    xla = _depth_decode(params_q, cfg, last_h, c0, key, 10, 0.75)
    fused = fused_depth_decode(bundle, cfg, last_h, c0, key, 10, 0.75,
                               plan=plan, interpret=True)
    assert (xla == fused).all(), (xla.tolist(), fused.tolist())
    # c0 is recorded verbatim in column 0.
    assert (fused[:, 0] == c0).all()


@pytest.mark.parametrize("plan", ["", "gate=r4,up=s8,down=s8"])
def test_greedy_matches_topk1(setup, plan):
    cfg, params, last_h, c0 = setup
    bundle = prepare_depth_chain(params, cfg, plan)
    params_q = dict(params, decoder=bundle["xla_decoder"])
    key = jax.random.PRNGKey(3)
    xla = _depth_decode(params_q, cfg, last_h, c0, key, 1, 0.75)
    fused = fused_depth_decode(bundle, cfg, last_h, c0, key, greedy=True,
                               plan=plan, interpret=True)
    assert (xla == fused).all()


def test_batch_padding_consistency(setup):
    """A stream's samples must not depend on how many others share the
    kernel batch (B=1 vs B=3 padded to 8)."""
    cfg, params, last_h, c0 = setup
    bundle = prepare_depth_chain(params, cfg, "")
    key = jax.random.PRNGKey(9)
    full = fused_depth_decode(bundle, cfg, last_h, c0, key, greedy=True,
                              interpret=True)
    one = fused_depth_decode(bundle, cfg, last_h[:1], c0[:1], key,
                             greedy=True, interpret=True)
    assert (full[:1] == one).all()


def test_lm_generate_frame_routes_through_kernel(setup):
    """End-to-end: lm_generate_frame with the bundle installed samples the
    same frame as the XLA path on the matching quantized decoder."""
    cfg, params, last_h, c0 = setup
    plan = "gate=r4,up=s8,down=s8"
    cfg_fused = _tiny_cfg(plan)
    params_fused = enable_fused_depth(dict(params), cfg_fused)
    params_plain = dict(params, decoder=params_fused["decoder"])

    B, S = 2, 8
    key = jax.random.PRNGKey(11)
    tokens = jax.random.randint(key, (B, S, cfg.num_columns), 1, 60)
    tmask = jnp.ones((B, S, cfg.num_columns), bool)
    valid = jnp.ones((B, S), bool)
    kf = jax.random.PRNGKey(12)

    st = init_lm_state(cfg, B, jnp.float32)
    _, frame_plain = lm_generate_frame(params_plain, cfg, st, tokens, tmask,
                                       valid, kf)
    st = init_lm_state(cfg_fused, B, jnp.float32)
    _, frame_fused = lm_generate_frame(params_fused, cfg_fused, st, tokens,
                                       tmask, valid, kf)
    assert (frame_plain == frame_fused).all()


def test_engine_stream_equals_batch_with_fused_plan():
    """Engine-level invariant under the SERVING config shape: with the
    fused depth-chain kernel on, streaming chunks still concatenate to the
    batch decode for the same seed (both paths route the depth decode
    through the kernel with identical key folding)."""
    import dataclasses

    import numpy as np

    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(
            cfg.llm, fused_depth_plan="gate=r8,up=s8,down=s8"))

    e1 = FireRedTTS2Engine(config=cfg, seed=11)
    assert "depth_chain" in e1.lm_params
    chunks = list(e1.generate_stream("fused kernel stream", "[S1]", [],
                                     max_audio_length_ms=480))
    streamed = np.concatenate(chunks)

    e2 = FireRedTTS2Engine(config=cfg, seed=11)
    batch = e2.generate("fused kernel stream", "[S1]", [],
                        max_audio_length_ms=480)
    assert streamed.shape == batch.shape
    np.testing.assert_allclose(streamed, batch, rtol=1e-3, atol=1e-4)


def test_chunk_split_tiles():
    """Flagship Ih = 4480 = 35 lane tiles: q no longer needs to divide the
    tile count — q=2/3 cut the per-step dot count 2.5-4x vs q=5 within the
    same ring bytes (VERDICT r2 #3: the ~2.4 ms issue overhead lever)."""
    from fireredtts2_tpu.ops.pallas_depth import _chunk_split

    assert _chunk_split(4480, 2) == ((0, 2304), (2304, 2176))
    assert _chunk_split(4480, 3) == ((0, 1536), (1536, 1536), (3072, 1408))
    assert _chunk_split(4480, 5) == tuple((i * 896, 896) for i in range(5))
    assert _chunk_split(32, 2) == ((0, 16), (16, 16))
    with pytest.raises(ValueError):
        _chunk_split(32, 3)


def test_stream_ring_nonuniform_split_exact(monkeypatch):
    """Unequal chunk widths (tile split, ring slots sized to the widest)
    must stay token-exact vs the XLA path at f32."""
    from fireredtts2_tpu import config as C
    from fireredtts2_tpu.config import TransformerConfig

    monkeypatch.setitem(C.FLAVORS, "nu-bb", TransformerConfig(
        vocab_size=0, num_layers=1, num_heads=2, num_kv_heads=1,
        embed_dim=64, intermediate_dim=128, max_seq_len=64))
    monkeypatch.setitem(C.FLAVORS, "nu-dec", TransformerConfig(
        vocab_size=0, num_layers=2, num_heads=2, num_kv_heads=1,
        embed_dim=128, intermediate_dim=768, max_seq_len=64))
    cfg = LLMConfig(backbone_flavor="nu-bb", decoder_flavor="nu-dec",
                    text_vocab_size=300, audio_vocab_size=64,
                    audio_num_codebooks=4, max_seq_len=64, dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    last_h = jax.random.normal(jax.random.PRNGKey(4),
                               (2, cfg.backbone.embed_dim), jnp.float32)
    c0 = jax.random.randint(jax.random.PRNGKey(5), (2,), 0,
                            cfg.audio_vocab_size)
    plan = "gate=s8,up=s8,down=s8"
    bundle = prepare_depth_chain(params, cfg, plan)
    params_q = dict(params, decoder=bundle["xla_decoder"])
    key = jax.random.PRNGKey(31)
    xla = _depth_decode(params_q, cfg, last_h, c0, key, 10, 0.75)
    # Ih = 384 = 3 tiles; q=2 -> widths (256, 128): genuinely non-uniform.
    # Also cover the whole on-chip A/B ladder (tools/onchip_r3.sh):
    # (3, 2) = one chunk per tile, (1, 2) = single big chunk.
    for stream_cfg in ((2, 2), (3, 2), (1, 2)):
        fused = fused_depth_decode(bundle, cfg, last_h, c0, key, 10, 0.75,
                                   plan=plan, interpret=True,
                                   stream_cfg=stream_cfg)
        assert (xla == fused).all(), stream_cfg


def test_quant_act_dot_s8_mirror():
    """The a8 helpers compute EXACTLY the documented math: per-row
    symmetric round-to-nearest int8 activation quant, then a native
    s8 x s8 dot with int32 accumulation (both storage orientations).
    Int accumulation is exact, so the mirror is bitwise."""
    from fireredtts2_tpu.ops.pallas_depth import _dot_s8, _quant_act

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 96), jnp.float32) * 3.0
    xq, xs = _quant_act(x)
    sc = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    assert jnp.allclose(xs, sc)
    assert (xq.astype(jnp.int32)
            == jnp.round(x / sc).astype(jnp.int32)).all()
    w8 = jax.random.randint(jax.random.PRNGKey(1), (96, 32), -128, 128,
                            jnp.int32).astype(jnp.int8)
    ref = (xq.astype(jnp.int32) @ w8.astype(jnp.int32)).astype(jnp.float32)
    assert (_dot_s8(xq, w8) == ref).all()
    # Transposed orientation (streamed chunks store output rows first).
    assert (_dot_s8(xq, w8.T, transposed=True) == ref).all()


def test_a8_resident_and_streamed_layouts_agree(setup):
    """r8a8 (resident) and s8a8 (HBM-streamed chunks) run the same
    quantized math over different storage layouts: gate/up column
    partitions are bitwise-identical (int32 dots are exact), the down
    accumulation differs only in fp32 sum association — for this fixed
    seed the sampled token streams must be IDENTICAL. Guards the chunk
    indexing / scale wiring of the a8 branches."""
    cfg, params, last_h, c0 = setup
    key = jax.random.PRNGKey(17)
    outs = []
    for plan in ("gate=r8a8,up=r8a8,down=r8a8",
                 "gate=s8a8,up=s8a8,down=s8a8"):
        bundle = prepare_depth_chain(params, cfg, plan)
        outs.append(fused_depth_decode(bundle, cfg, last_h, c0, key, 10,
                                       0.75, plan=plan, interpret=True))
    assert (outs[0] == outs[1]).all(), (outs[0].tolist(), outs[1].tolist())
    assert (outs[0][:, 0] == c0).all()


def test_a8_mixed_plan_runs(setup):
    """A mixed a8/dequant plan (the realistic deployment shape: resident
    a8 gate, streamed a8 up, streamed dequant down) decodes tokens in
    range with c0 recorded verbatim."""
    cfg, params, last_h, c0 = setup
    plan = "gate=r8a8,up=s8a8,down=s8"
    bundle = prepare_depth_chain(params, cfg, plan)
    out = fused_depth_decode(bundle, cfg, last_h, c0,
                             jax.random.PRNGKey(23), 10, 0.75, plan=plan,
                             interpret=True)
    assert out.shape == (last_h.shape[0], cfg.audio_num_codebooks)
    assert (out[:, 0] == c0).all()
    assert ((out >= 0) & (out < cfg.audio_vocab_size)).all()


@pytest.mark.parametrize("stream_cfg", [(2, 2), (2, 4), (4, 2), (4, 4)])
def test_stream_ring_configs_exact(setup, stream_cfg):
    """The streamed-chunk ring (any chunk count / ring depth) must compute
    EXACTLY what the XLA path computes at f32 — column-partitioned dots
    are value-identical and down-chunk partials accumulate in fp32. The
    flagship (5, 4) config is the same machinery at aligned dims (proven
    bit-deterministic on chip by tools/depth_kernel_check.py)."""
    cfg, params, last_h, c0 = setup
    plan = "gate=s8,up=s8,down=s8"
    bundle = prepare_depth_chain(params, cfg, plan)
    params_q = dict(params, decoder=bundle["xla_decoder"])
    key = jax.random.PRNGKey(21)
    xla = _depth_decode(params_q, cfg, last_h, c0, key, 10, 0.75)
    fused = fused_depth_decode(bundle, cfg, last_h, c0, key, 10, 0.75,
                               plan=plan, interpret=True,
                               stream_cfg=stream_cfg)
    assert (xla == fused).all()
