"""Weight-only int8 quantization tests (depth decoder)."""

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import FLAVORS, LLMConfig, tiny_engine_config
from fireredtts2_tpu.ops import masks as mask_ops
from fireredtts2_tpu.models.lm.transformer import (
    init_transformer_params, transformer_forward, quantize_transformer_int8,
)


def test_quantized_weights_roundtrip(rng):
    tcfg = FLAVORS["tiny"]
    params = init_transformer_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    q = quantize_transformer_int8(params)
    assert q["wq"].dtype == jnp.int8
    deq = np.asarray(q["wq"], np.float32) * np.asarray(q["wq_scale"])
    w = np.asarray(params["wq"])
    # per-channel symmetric int8: relative error bounded by scale/2
    denom = np.abs(w).max(axis=1, keepdims=True) + 1e-9
    assert (np.abs(deq - w) / denom).max() < 1.0 / 127.0


def test_quantized_forward_close(rng):
    tcfg = FLAVORS["tiny"]
    params = init_transformer_params(jax.random.PRNGKey(1), tcfg, jnp.float32)
    qparams = quantize_transformer_int8(params)
    B, S = 1, 6
    h = jnp.asarray(rng.standard_normal((B, S, tcfg.embed_dim)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    mask = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))

    full, _ = transformer_forward(params, tcfg, h, pos, mask)
    quant, _ = transformer_forward(qparams, tcfg, h, pos, mask)
    f, qn = np.asarray(full), np.asarray(quant)
    cos = (f * qn).sum() / (np.linalg.norm(f) * np.linalg.norm(qn))
    assert cos > 0.999, cos


def test_engine_with_quantized_depth_runs():
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    import dataclasses

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quantize_depth=True))
    e = FireRedTTS2Engine(config=cfg, seed=0)
    assert e.lm_params["decoder"]["wq"].dtype == jnp.int8
    audio = e.generate("quantized depth", "[S1]", [], max_audio_length_ms=480)
    assert audio.shape[0] % 1920 == 0 and np.isfinite(audio).all()
    chunks = list(e.generate_stream("stream it", "[S1]", [],
                                    max_audio_length_ms=480))
    assert chunks and all(np.isfinite(c).all() for c in chunks)


def test_engine_with_quantized_backbone_runs():
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    import dataclasses

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quantize_depth=True,
                                     quantize_backbone=True))
    e = FireRedTTS2Engine(config=cfg, seed=0)
    assert e.lm_params["backbone"]["wq"].dtype == jnp.int8
    audio = e.generate("quantized backbone", "[S1]", [],
                       max_audio_length_ms=480)
    assert audio.shape[0] % 1920 == 0 and np.isfinite(audio).all()
    chunks = list(e.generate_stream("stream it", "[S1]", [],
                                    max_audio_length_ms=480))
    assert chunks and all(np.isfinite(c).all() for c in chunks)


def test_int4_roundtrip_and_forward(rng):
    from fireredtts2_tpu.models.lm.transformer import quantize_transformer_int4

    tcfg = FLAVORS["tiny"]
    params = init_transformer_params(jax.random.PRNGKey(2), tcfg, jnp.float32)
    q = quantize_transformer_int4(params, group=16)
    # packed: half the input rows
    assert q["wq"].shape[1] == params["wq"].shape[1] // 2
    assert q["wq"].dtype == jnp.int8 and "wq_scale4" in q

    B, S = 1, 6
    h = jnp.asarray(rng.standard_normal((B, S, tcfg.embed_dim)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    mask = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))
    full, _ = transformer_forward(params, tcfg, h, pos, mask)
    quant, _ = transformer_forward(q, tcfg, h, pos, mask)
    f, qn = np.asarray(full), np.asarray(quant)
    cos = (f * qn).sum() / (np.linalg.norm(f) * np.linalg.norm(qn))
    assert cos > 0.99, cos  # int4: looser than int8's 0.999


def test_int4_unpack_exact(rng):
    """Packed nibbles (halves layout: byte row i = input rows i and i+I/2)
    must unpack to exactly the quantized values, including negatives."""
    from fireredtts2_tpu.models.lm.transformer import (
        quantize_transformer_int4, _unpack_int4)

    w = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
    q = quantize_transformer_int4({"wq": w}, group=4)
    deq = np.asarray(_unpack_int4(q["wq"][0], q["wq_scale4"][0], jnp.float32))
    ref = np.asarray(w[0])
    scale = np.asarray(q["wq_scale4"][0])           # (2, 4)
    step = scale.repeat(4, axis=0)
    assert (np.abs(deq - ref) <= step / 2 + 1e-6).all()


def test_int4_kernel_matches_xla_dequant(rng):
    """The Pallas fused-unpack matmul (interpret mode on CPU) must match
    the XLA dequant path at production-like dims."""
    from fireredtts2_tpu.models.lm.transformer import (
        quantize_transformer_int4, _unpack_int4)
    from fireredtts2_tpu.ops.pallas_int4 import int4_matmul

    for I, O in ((256, 384), (128, 256)):
        w = jnp.asarray(rng.standard_normal((1, I, O)).astype(np.float32) * 0.1)
        q = quantize_transformer_int4({"wq": w}, group=64)
        x = jnp.asarray(rng.standard_normal((2, I)).astype(np.float32))
        want = x @ _unpack_int4(q["wq"][0], q["wq_scale4"][0], jnp.float32)
        got = int4_matmul(x, q["wq"][0], q["wq_scale4"][0], interpret=True)
        # kernel computes in bf16 weights (vmem budget) -> ~0.5% tolerance
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
    # 3D activations reshape through
    x3 = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 128, 256)).astype(np.float32) * 0.1)
    q = quantize_transformer_int4({"wq": w}, group=64)
    got = int4_matmul(x3, q["wq"][0], q["wq_scale4"][0], interpret=True)
    assert got.shape == (2, 3, 256)


def test_engine_with_int4_depth_runs():
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    import dataclasses

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, quantize_depth=True,
                                     quantize_depth_bits=4))
    e = FireRedTTS2Engine(config=cfg, seed=0)
    assert "wq_scale4" in e.lm_params["decoder"]
    audio = e.generate("int4 depth", "[S1]", [], max_audio_length_ms=480)
    assert audio.shape[0] % 1920 == 0 and np.isfinite(audio).all()


def test_engine_with_quantized_vocoder_streaming_equals_batch():
    """int8 vocoder backbone: engine runs end-to-end AND the streaming ≡
    batch invariant holds (both paths share the same quantized weights)."""
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    import dataclasses

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(
        cfg, codec=dataclasses.replace(cfg.codec, quantize_vocoder=True))
    # TWO engines with the same seed: the engine's RNG advances per call,
    # so stream-vs-batch comparisons need fresh engines (same pattern as
    # tests/test_engine.py::test_generate_stream_matches_batch_decode).
    e1 = FireRedTTS2Engine(config=cfg, seed=0)
    assert e1.codec_params["acoustic_decoder"]["layers"]["wq"].dtype == jnp.int8
    chunks = list(e1.generate_stream("quantized vocoder", "[S1]", [],
                                     max_audio_length_ms=480))
    assert chunks and all(np.isfinite(c).all() for c in chunks)
    streamed = np.concatenate(chunks)

    e2 = FireRedTTS2Engine(config=cfg, seed=0)
    audio = e2.generate("quantized vocoder", "[S1]", [],
                        max_audio_length_ms=480)
    assert audio.shape[0] % 1920 == 0 and np.isfinite(audio).all()
    # Same seed => same tokens; streaming vocoder must equal batch decode
    # (same bound as the unquantized invariant, tests/test_codec.py:142).
    assert streamed.shape == audio.shape
    np.testing.assert_allclose(streamed, audio, rtol=2e-3, atol=5e-4)


def test_quantized_vocoder_output_close_to_bf16():
    """int8 on the vocoder perturbs the waveform only mildly (random
    weights; the gate is a sanity bound, not a perceptual metric)."""
    import dataclasses

    from fireredtts2_tpu.models.codec.model import (
        codec_decode, init_codec_params)
    from fireredtts2_tpu.models.codec.whisper_nn import (
        quantize_whisper_layers_int8)

    cfg = tiny_engine_config().codec
    params = init_codec_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4, 10), 0,
                                cfg.rvq.codebook_size)
    ref = codec_decode(params, cfg, tokens)
    qp = dict(params)
    qp["acoustic_decoder"] = dict(qp["acoustic_decoder"])
    qp["acoustic_decoder"]["layers"] = quantize_whisper_layers_int8(
        qp["acoustic_decoder"]["layers"])
    out = codec_decode(qp, cfg, tokens)
    assert out.shape == ref.shape
    err = float(np.sqrt(np.mean((np.asarray(out) - np.asarray(ref)) ** 2)))
    scale = float(np.sqrt(np.mean(np.asarray(ref) ** 2))) + 1e-9
    assert err / scale < 0.15, (err, scale)
