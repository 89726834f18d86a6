"""Golden parity tests against the ACTUAL reference codec implementation.

The reference codec (fireredtts2/codec/*) is pure torch with no external
model downloads, so we can instantiate it at tiny dims with random weights,
export its state_dict through our checkpoint converter, and require our JAX
codec to reproduce its outputs numerically: mel frontend, full encode
(token-exact), batch decode, and streaming decode_one_token.

This is the strongest correctness anchor available without checkpoints
(token-level parity, SURVEY.md §6 fidelity target).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fireredtts2_tpu.config import tiny_engine_config  # noqa: E402
from fireredtts2_tpu.runtime.checkpoint import convert_codec_state_dict  # noqa: E402
from fireredtts2_tpu.models.codec.model import (  # noqa: E402
    encode_window, codec_encode, codec_decode, stream_decode_init,
    stream_decode_step, _mel,
)

CFG = tiny_engine_config().codec


def _build_reference_codec():
    """Reference RedCodec at the tiny config's dims (random weights)."""
    from fireredtts2.codec.model import (
        RedCodec, RedCodecInfer, SslAdaptor, ResidualDownConv, UpConv,
    )
    from fireredtts2.codec.whisper import (
        PretrainedWhisperEncoder, WhisperAcousticEncoder, WhisperMelExtractor,
    )
    from fireredtts2.codec.rvq import ResidualVQ
    from fireredtts2.codec.decoder import AcousticDecoder

    torch.manual_seed(0)

    ssl = PretrainedWhisperEncoder(
        in_dim=CFG.mel.num_mels, embed_dim=CFG.ssl.embed_dim,
        num_layers=CFG.ssl.num_layers, num_heads=CFG.ssl.num_heads,
        max_positions=CFG.ssl.max_positions)
    ssl.feature_extractor = WhisperMelExtractor(
        num_mels=CFG.mel.num_mels, sampling_rate=CFG.mel.sampling_rate,
        hop_length=CFG.mel.hop_length, n_fft=CFG.mel.n_fft,
        fmin=CFG.mel.fmin, fmax=CFG.mel.fmax)

    ssl_adaptor = SslAdaptor(
        in_dim=CFG.ssl_adaptor.in_dim, embed_dim=CFG.ssl_adaptor.embed_dim,
        out_dim=CFG.ssl_adaptor.out_dim, num_layers=CFG.ssl_adaptor.num_layers,
        num_heads=CFG.ssl_adaptor.num_heads)
    acoustic_encoder = WhisperAcousticEncoder(
        num_mels=CFG.mel.num_mels, embed_dim=CFG.acoustic_encoder.embed_dim,
        num_layers=CFG.acoustic_encoder.num_layers,
        num_heads=CFG.acoustic_encoder.num_heads,
        max_positions=CFG.acoustic_encoder.max_positions)
    downsample = ResidualDownConv(embed_dim=CFG.downsample_embed_dim,
                                  avg_pooler=CFG.downsample_factor)
    rvq = ResidualVQ(input_dim=CFG.rvq.input_dim, rvq_dim=CFG.rvq.resolved_rvq_dim,
                     output_dim=CFG.rvq.resolved_output_dim,
                     num_quantizers=CFG.rvq.num_quantizers,
                     codebook_size=CFG.rvq.codebook_size,
                     codebook_dim=CFG.rvq.codebook_dim)
    # Codebook buffers default to zeros; randomize so quantization binds.
    with torch.no_grad():
        for q in rvq.quantizers:
            q.codebook.normal_(0, 0.5)
            q.embed_avg.copy_(q.codebook)
    upsample = UpConv(embed_dim=CFG.upsample_embed_dim, stride=CFG.upsample_stride)
    semantic_decoder = SslAdaptor(
        in_dim=CFG.semantic_decoder.in_dim, embed_dim=CFG.semantic_decoder.embed_dim,
        out_dim=CFG.semantic_decoder.out_dim,
        num_layers=CFG.semantic_decoder.num_layers,
        num_heads=CFG.semantic_decoder.num_heads)
    acoustic_decoder = AcousticDecoder(
        embed_dim=CFG.acoustic_decoder.embed_dim,
        num_layers=CFG.acoustic_decoder.num_layers,
        num_heads=CFG.acoustic_decoder.num_heads,
        hop_length=CFG.acoustic_decoder.hop_length,
        causal=True)

    codec = RedCodec(ssl, ssl_adaptor, acoustic_encoder, downsample, rvq,
                     upsample, semantic_decoder, acoustic_decoder)
    return RedCodecInfer(codec).eval()


@pytest.fixture(scope="module")
def pair():
    ref = _build_reference_codec()
    ours = convert_codec_state_dict(ref.state_dict(), CFG, jnp.float32)
    return ref, ours


def test_mel_parity(pair, rng):
    ref, ours = pair
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want, want_len = ref.ssl.feature_extractor(
            torch.from_numpy(audio), torch.tensor([16000, 12000]))
    got, got_len = _mel(ours, CFG, jnp.asarray(audio), jnp.array([16000, 12000]))
    np.testing.assert_array_equal(np.asarray(got_len), want_len.numpy())
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_encode_token_parity(pair, rng):
    """Our encoder must produce EXACTLY the reference's RVQ codes."""
    ref, ours = pair
    win = CFG.encode_chunk_seconds * CFG.input_sample_rate
    audio = (rng.standard_normal((1, win)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = ref._encode_one_batch(torch.from_numpy(audio))  # (B, nq, L)
    got = encode_window(ours, CFG, jnp.asarray(audio),
                        jnp.array([win]))                      # (nq, B, L)
    got = np.asarray(got).transpose(1, 0, 2)
    assert got.shape == tuple(want.shape)
    mismatch = (got != want.numpy()).mean()
    # fp32 argmin ties at codebook boundaries can flip isolated tokens;
    # anything beyond a fraction of a percent is a real bug.
    assert mismatch < 0.005, f"token mismatch rate {mismatch:.4f}"


def test_full_encode_multiwindow_parity(pair, rng):
    """End-to-end encode() parity including the 6 s window chunking and
    reassembly (reference model.py:244-305): 8.3 s of audio = 2 windows."""
    ref, ours = pair
    n = int(8.3 * CFG.input_sample_rate)
    audio = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want, want_len = ref.encode(
            torch.from_numpy(audio),
            torch.tensor([n], dtype=torch.long), batch_size=48)
    got, got_len = codec_encode(ours, CFG, audio)
    assert got_len[0] == int(want_len[0])
    assert got.shape == tuple(want.shape)
    mismatch = (got != want.numpy()).mean()
    assert mismatch < 0.005, f"token mismatch rate {mismatch:.4f}"


def test_decode_waveform_parity(pair, rng):
    ref, ours = pair
    L = 8
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (1, CFG.rvq.num_quantizers, L)).astype(np.int64)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(tokens)).numpy()
    got = np.asarray(codec_decode(ours, CFG, jnp.asarray(tokens.astype(np.int32))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_noncausal_decoder_parity(rng):
    """Non-causal AcousticDecoder (GroupNorm resnets, full attention) vs
    the reference torch implementation."""
    import dataclasses
    from fireredtts2.codec.decoder import AcousticDecoder

    from fireredtts2_tpu.models.codec.decoder import acoustic_decoder_forward
    from fireredtts2_tpu.runtime.checkpoint import (
        _convert_resnet, _convert_whisper_layers, _conv1d_params, _t, _lin,
    )

    acfg = dataclasses.replace(CFG.acoustic_decoder, causal=False)
    torch.manual_seed(3)
    ref = AcousticDecoder(embed_dim=acfg.embed_dim, num_layers=acfg.num_layers,
                          num_heads=acfg.num_heads, hop_length=acfg.hop_length,
                          causal=False).eval()
    sd = {f"acoustic_decoder.{k}": v for k, v in ref.state_dict().items()}

    params = {
        "up1_w": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.0.weight"])),
        "up1_b": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.0.bias"])),
        "up2_w": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.2.weight"])),
        "up2_b": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.2.bias"])),
        "in_proj": _conv1d_params(sd, "acoustic_decoder.backbone.in_proj", jnp.float32),
        "prior0": _convert_resnet(sd, "acoustic_decoder.backbone.prior_net.0", jnp.float32),
        "prior1": _convert_resnet(sd, "acoustic_decoder.backbone.prior_net.1", jnp.float32),
        "layers": _convert_whisper_layers(
            sd, "acoustic_decoder.backbone.transformers", acfg.num_layers, jnp.float32),
        "post0": _convert_resnet(sd, "acoustic_decoder.backbone.post_net.0", jnp.float32),
        "post1": _convert_resnet(sd, "acoustic_decoder.backbone.post_net.1", jnp.float32),
        "final_ln_w": jnp.asarray(_t(sd["acoustic_decoder.backbone.final_norm.weight"])),
        "final_ln_b": jnp.asarray(_t(sd["acoustic_decoder.backbone.final_norm.bias"])),
        "head_w": jnp.asarray(_lin(sd, "acoustic_decoder.isift.out")),
        "head_b": jnp.asarray(_t(sd["acoustic_decoder.isift.out.bias"])),
    }

    T = 8
    x = rng.standard_normal((1, T, acfg.embed_dim)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x), torch.tensor([T]))
    got, _ = acoustic_decoder_forward(params, acfg, jnp.asarray(x),
                                      jnp.array([T]))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_streaming_decode_parity(pair, rng):
    """Our streaming step chain must match the reference's decode_one_token
    chain chunk for chunk."""
    ref, ours = pair
    L = 4
    tokens = rng.integers(0, CFG.rvq.codebook_size,
                          (1, CFG.rvq.num_quantizers, L)).astype(np.int64)

    ref_chunks = []
    cache = {}
    with torch.no_grad():
        for t in range(L):
            tok = torch.from_numpy(tokens[:, :, t:t + 1])
            audio, cache = ref.decode_one_token(tok, cache, last_token=(t == L - 1))
            ref_chunks.append(audio.numpy())

    state = stream_decode_init(CFG, 1)
    for t in range(L):
        tok = jnp.asarray(tokens[:, :, t:t + 1].astype(np.int32))
        audio, state = stream_decode_step(ours, CFG, tok, state,
                                          first=(t == 0), last=(t == L - 1))
        got = np.asarray(audio)
        assert got.shape == ref_chunks[t].shape, (t, got.shape, ref_chunks[t].shape)
        np.testing.assert_allclose(got, ref_chunks[t], rtol=2e-3, atol=2e-3,
                                   err_msg=f"chunk {t}")
