"""Fused stream_block (models/pipeline.py): block partitioning must not
change the audio. A K-frame block (which groups the vocoder into G-token
backbone passes, G capped by batch size) must produce exactly the
concatenation of K single-frame blocks — the grouped-vocoder streaming
analogue of the streaming==batch invariant."""

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.models.codec.model import (
    init_codec_params, stream_decode_init,
)
from fireredtts2_tpu.models.lm.model import init_lm_params, init_lm_state
from fireredtts2_tpu.models.pipeline import stream_block


def _setup(B):
    cfg = tiny_engine_config()
    lm_params = init_lm_params(jax.random.PRNGKey(0), cfg.llm, jnp.float32)
    codec_params = init_codec_params(jax.random.PRNGKey(1), cfg.codec,
                                     jnp.float32)
    state = init_lm_state(cfg.llm, B, jnp.float32)
    vstate = stream_decode_init(cfg.codec, B, jnp.float32)
    # Non-zero frames (EOS is the all-zero frame; avoid it so all steps
    # stay live).
    frame = jax.random.randint(jax.random.PRNGKey(2),
                               (B, cfg.llm.audio_num_codebooks), 1,
                               cfg.llm.audio_vocab_size)
    emitted = jnp.zeros((B,), jnp.int32)
    return cfg, lm_params, codec_params, state, vstate, frame, emitted


def test_block_partitioning_is_exact():
    """B=16 with block=8 runs the multi-group vocoder path (G=4); its
    middles/tails must match eight single-frame blocks bit-for-bit at f32."""
    B, K = 16, 8
    cfg, lm_params, codec_params, state, vstate, frame, emitted = _setup(B)
    key = jax.random.PRNGKey(7)
    cs = 8 * cfg.codec.acoustic_decoder.hop_length
    ts = (cfg.codec.acoustic_decoder.n_fft
          - cfg.codec.acoustic_decoder.hop_length) \
        - (cfg.codec.acoustic_decoder.n_fft
           - cfg.codec.acoustic_decoder.hop_length) // 2

    # One K-frame block.
    _, _, _, _, packed_k = stream_block(
        lm_params, codec_params, cfg.llm, cfg.codec, state, vstate,
        frame, emitted, key, t_base=jnp.int32(0), block=K)
    pk = np.asarray(packed_k)

    # K single-frame blocks threading the same states and key folding.
    st, vs, fr, em = state, vstate, frame, emitted
    mids, tails, toks = [], [], []
    for t in range(K):
        toks.append(np.asarray(fr))       # input frame of step t
        st, vs, fr, em, p1 = stream_block(
            lm_params, codec_params, cfg.llm, cfg.codec, st, vs,
            fr, em, key, t_base=jnp.int32(t), block=1)
        p1 = np.asarray(p1)
        mids.append(p1[:, :cs])
        tails.append(p1[:, cs:cs + ts])

    np.testing.assert_allclose(pk[:, :K * cs], np.concatenate(mids, axis=1),
                               rtol=2e-3, atol=5e-4)
    for j in range(K):
        np.testing.assert_allclose(
            pk[:, K * cs + j * ts: K * cs + (j + 1) * ts], tails[j],
            rtol=2e-3, atol=5e-4, err_msg=f"cut tail {j}")
    # token region: packed frames j are the INPUT frames of each step,
    # exact int-in-float32 (the batched clone path's collection source)
    ncb = cfg.llm.audio_num_codebooks
    tok_region = pk[:, K * (cs + ts) + K:].reshape(B, K, ncb)
    np.testing.assert_array_equal(
        tok_region.astype(np.int32), np.stack(toks, axis=1))
