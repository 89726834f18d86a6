"""Codec training objectives (train/codec_losses.py): straight-through RVQ
agrees with the inference RVQ, gradients flow, losses behave."""

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import RVQConfig
from fireredtts2_tpu.models.codec.rvq import (
    init_rvq_params, rvq_encode, rvq_decode,
)
from fireredtts2_tpu.train.codec_losses import (
    rvq_encode_st, multiscale_mel_loss, waveform_l1, semantic_distill_loss,
    codec_train_losses,
)

CFG = RVQConfig(input_dim=16, num_quantizers=3, codebook_size=32,
                codebook_dim=8, rvq_dim=12, output_dim=16)


def _params():
    return init_rvq_params(jax.random.PRNGKey(0), CFG)


def test_st_codes_and_features_match_inference(rng):
    params = _params()
    z = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    feats, codes, losses = rvq_encode_st(params, CFG, z)
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(rvq_encode(params, CFG, z)))
    want = rvq_decode(params, CFG, codes)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert float(losses["commit_loss"]) > 0
    assert float(losses["codebook_loss"]) > 0


def test_st_gradients_flow_to_encoder_and_codebook(rng):
    params = _params()
    z = jnp.asarray(rng.standard_normal((1, 4, 16)).astype(np.float32))

    def loss_fn(p, zz):
        feats, _, vq = rvq_encode_st(p, CFG, zz)
        return jnp.mean(feats ** 2) + vq["commit_loss"] + vq["codebook_loss"]

    gz = jax.grad(loss_fn, argnums=1)(params, z)
    assert float(jnp.abs(gz).sum()) > 0          # straight-through to input
    gp = jax.grad(loss_fn, argnums=0)(params, z)
    assert float(jnp.abs(gp["codebook"]).sum()) > 0   # codebook loss term
    assert float(jnp.abs(gp["in_proj_w"]).sum()) > 0


def test_mel_loss_zero_on_identical_and_positive_on_noise(rng):
    a = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    assert float(multiscale_mel_loss(a, a, scales=(512, 1024))) < 1e-5
    assert float(multiscale_mel_loss(a, b, scales=(512, 1024))) > 0.1
    assert float(waveform_l1(a, a)) == 0.0


def test_semantic_distill_masked(rng):
    p = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    t = p.at[:, 3:].add(100.0)  # corrupt only masked-out positions
    lengths = jnp.asarray([3, 3], jnp.int32)
    assert float(semantic_distill_loss(p, t, lengths)) < 1e-5
    assert float(semantic_distill_loss(p, t)) > 1.0


def test_codec_train_losses_assembly(rng):
    pred = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    target = pred + 0.01 * jnp.asarray(
        rng.standard_normal((1, 4096)).astype(np.float32))
    vq = {"commit_loss": jnp.float32(0.1), "codebook_loss": jnp.float32(0.2)}
    out = codec_train_losses(pred, target, vq,
                             pred_ssl=jnp.ones((1, 3, 4)),
                             target_ssl=jnp.ones((1, 3, 4)))
    for k in ("loss", "mel_loss", "wave_loss", "commit_loss",
              "codebook_loss", "semantic_loss"):
        assert np.isfinite(float(out[k])), k
    assert float(out["semantic_loss"]) < 1e-6
    assert float(out["loss"]) > 0
