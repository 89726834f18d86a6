"""Codec tests: RVQ round trips, encoder shapes, and the load-bearing
parity property — streaming decode ≡ batch decode (SURVEY.md §4 item 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.models.codec.rvq import init_rvq_params, rvq_encode, rvq_decode
from fireredtts2_tpu.models.codec.model import (
    init_codec_params, encode_window, codec_encode, codec_decode,
    codec_decode_chunks, assemble_chunks,
    stream_decode_init, stream_decode_step,
)
from fireredtts2_tpu.models.codec.decoder import stream_decode_tail

CFG = tiny_engine_config().codec


@pytest.fixture(scope="module")
def codec_params():
    return init_codec_params(jax.random.PRNGKey(0), CFG, jnp.float32)


# ------------------------------------------------------------------ RVQ

def test_rvq_encode_decode_shapes(rng):
    cfg = CFG.rvq
    params = init_rvq_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 5, cfg.input_dim)).astype(np.float32))
    codes = rvq_encode(params, cfg, z)
    assert codes.shape == (cfg.num_quantizers, 2, 5)
    assert codes.dtype == jnp.int32
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < cfg.codebook_size).all()
    feats = rvq_decode(params, cfg, codes)
    assert feats.shape == (2, 5, cfg.resolved_output_dim)


def test_rvq_residual_reduces_error(rng):
    """Each additional quantizer must reduce reconstruction error of the
    rvq-space representation (the defining property of residual VQ)."""
    cfg = CFG.rvq
    params = init_rvq_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    # Put codebook vectors near the data distribution so quantization binds.
    params["codebook"] = jax.random.normal(
        jax.random.PRNGKey(3), params["codebook"].shape) * 0.5
    z = jnp.asarray(rng.standard_normal((1, 16, cfg.input_dim)).astype(np.float32))
    codes = rvq_encode(params, cfg, z)

    zp = z
    if "input_proj_w" in params:
        zp = z @ params["input_proj_w"] + params["input_proj_b"]

    errs = []
    for nq in (1, cfg.num_quantizers):
        # decode without the final output_proj: sum of out-projected codebook vecs
        emb = jax.vmap(lambda c, idx: c[idx])(params["codebook"][:nq], codes[:nq])
        rec = jnp.einsum("qbtc,qcr->btr", emb, params["out_proj_w"][:nq])
        rec = rec + jnp.sum(params["out_proj_b"][:nq], axis=0)
        errs.append(float(jnp.mean((zp - rec) ** 2)))
    assert errs[1] < errs[0]


def test_rvq_encode_matches_reference_greedy_chain(rng):
    """The residual chain must quantize q_i against (z - Σ_{j<i} recon_j)."""
    cfg = CFG.rvq
    params = init_rvq_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 3, cfg.input_dim)).astype(np.float32))
    codes = np.asarray(rvq_encode(params, cfg, z))

    # replicate in numpy
    zp = np.asarray(z)
    if "input_proj_w" in params:
        zp = zp @ np.asarray(params["input_proj_w"]) + np.asarray(params["input_proj_b"])
    residual = zp.copy()
    for i in range(cfg.num_quantizers):
        ze = residual @ np.asarray(params["in_proj_w"][i]) + np.asarray(params["in_proj_b"][i])
        cb = np.asarray(params["codebook"][i])
        d = ((ze[:, :, None, :] - cb[None, None]) ** 2).sum(-1)
        idx = d.argmin(-1)
        np.testing.assert_array_equal(codes[i], idx)
        rec = cb[idx] @ np.asarray(params["out_proj_w"][i]) + np.asarray(params["out_proj_b"][i])
        residual = residual - rec


# ------------------------------------------------------------------ encoder

def test_encode_window_shapes(codec_params, rng):
    sr = CFG.input_sample_rate
    win = CFG.encode_chunk_seconds * sr
    audio = jnp.asarray((rng.standard_normal((2, win)) * 0.1).astype(np.float32))
    codes = encode_window(codec_params, CFG, audio, jnp.array([win, win]))
    nq = CFG.rvq.num_quantizers
    # 6 s at 12.5 Hz = 75 tokens
    assert codes.shape == (nq, 2, 75)


def test_codec_encode_token_length(codec_params, rng):
    sr = CFG.input_sample_rate
    n = int(2.3 * sr)
    audio = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    codes, tlen = codec_encode(codec_params, CFG, audio)
    assert tlen[0] == int(np.ceil(n / 1280))
    assert codes.shape == (1, CFG.rvq.num_quantizers, tlen[0])


# ------------------------------------------------------------------ decoder

def test_codec_decode_shape(codec_params, rng):
    L = 10
    tokens = jnp.asarray(rng.integers(0, CFG.rvq.codebook_size,
                                      (1, CFG.rvq.num_quantizers, L)).astype(np.int32))
    audio = codec_decode(codec_params, CFG, tokens)
    # L tokens * 4 (up) * 2 (acoustic up) * hop 240 = L * 1920 samples @24k
    assert audio.shape == (1, L * 1920)
    assert np.isfinite(np.asarray(audio)).all()


def test_stream_decode_equals_batch(codec_params, rng):
    """Token-by-token streaming decode must concatenate to the batch decode
    exactly — the property that makes first-packet streaming lossless
    (reference leaves it implicit in decode_one_token's cache design)."""
    L = 6
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (1, CFG.rvq.num_quantizers, L)).astype(np.int32)
    full = np.asarray(codec_decode(codec_params, CFG, jnp.asarray(tokens)))

    state = stream_decode_init(CFG, batch=1)
    pieces = []
    for t in range(L):
        tok = jnp.asarray(tokens[:, :, t:t + 1])
        audio, state = stream_decode_step(codec_params, CFG, tok, state,
                                          first=(t == 0), last=(t == L - 1))
        pieces.append(np.asarray(audio))
    streamed = np.concatenate(pieces, axis=1)

    assert streamed.shape == full.shape
    # atol: the iSTFT head emits magnitudes up to 1e2 and the first samples
    # sit on a small window envelope, amplifying fp32 noise slightly.
    np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=5e-4)


def test_speculative_stream_plus_tail_equals_batch(codec_params, rng):
    """The pipelined engine path: vocode every frame with last=False, then
    emit the held-back closing samples from the carry (stream_decode_tail).
    Must equal batch decode exactly."""
    L = 5
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (1, CFG.rvq.num_quantizers, L)).astype(np.int32)
    full = np.asarray(codec_decode(codec_params, CFG, jnp.asarray(tokens)))

    state = stream_decode_init(CFG, batch=1)
    pieces = []
    for t in range(L):
        tok = jnp.asarray(tokens[:, :, t:t + 1])
        audio, state = stream_decode_step(codec_params, CFG, tok, state,
                                          first=(t == 0), last=False)
        pieces.append(np.asarray(audio))
    pieces.append(np.asarray(stream_decode_tail(CFG.acoustic_decoder, state)))
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=5e-4)


def test_scan_decode_equals_batch(codec_params, rng):
    """codec_decode_chunks + assemble_chunks over a PADDED bucket must equal
    batch decode of exactly T tokens (no tail pollution)."""
    T, Lpad = 5, 8
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (1, CFG.rvq.num_quantizers, Lpad)).astype(np.int32)
    full = np.asarray(codec_decode(codec_params, CFG,
                                   jnp.asarray(tokens[:, :, :T])))
    middles, tails = codec_decode_chunks(codec_params, CFG, jnp.asarray(tokens))
    acfg = CFG.acoustic_decoder
    got = assemble_chunks(np.asarray(middles), np.asarray(tails), T,
                          acfg.hop_length, acfg.n_fft)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, rtol=2e-3, atol=5e-4)


def test_codec_encode_batch_cap_equivalence(codec_params, rng):
    """Capped sub-batch dispatch (reference caps encode batches at 48,
    codec/model.py:244) must produce the same codes as one big batch."""
    import dataclasses
    from fireredtts2_tpu.models.codec.model import codec_encode

    cfg = CFG
    win = cfg.encode_chunk_seconds * cfg.input_sample_rate
    audio = rng.normal(size=(1, 5 * win - 123)).astype(np.float32) * 0.1
    capped = dataclasses.replace(cfg, encode_max_batch=2)

    codes_big, len_big = codec_encode(codec_params, cfg, audio)
    codes_cap, len_cap = codec_encode(codec_params, capped, audio)
    np.testing.assert_array_equal(len_big, len_cap)
    np.testing.assert_array_equal(codes_big, codes_cap)


def test_grouped_scan_equals_per_token_scan(codec_params, rng):
    """The grouped vocoder scan (8 tokens/step, 8-block-causal mask) must
    emit the same middles/tails as the per-token scan — it exists purely to
    amortize per-step overhead (PERF.md round 2)."""
    from fireredtts2_tpu.models.codec.decoder import stream_decode_scan
    from fireredtts2_tpu.models.codec.rvq import rvq_decode
    from fireredtts2_tpu.models.codec.decoder import upconv_forward

    B, L = 2, 16
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (B, CFG.rvq.num_quantizers, L)).astype(np.int32)
    codes = jnp.asarray(tokens).transpose(1, 0, 2)
    feats = rvq_decode(codec_params["rvq"], CFG.rvq, codes)
    up = upconv_forward(codec_params["upsample"], CFG.upsample_stride, feats)

    m1, t1 = stream_decode_scan(codec_params["acoustic_decoder"],
                                CFG.acoustic_decoder, up, group=1)
    m8, t8 = stream_decode_scan(codec_params["acoustic_decoder"],
                                CFG.acoustic_decoder, up, group=8)
    assert m1.shape == m8.shape and t1.shape == t8.shape
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1),
                               rtol=2e-3, atol=5e-4)
