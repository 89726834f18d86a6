"""Unit tests: mel filterbank vs reference math, masks, sampling, RoPE."""

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.ops import masks
from fireredtts2_tpu.ops.audio import (
    hertz_to_mel, mel_to_hertz, whisper_mel_filters, log_mel_spectrogram,
)
from fireredtts2_tpu.ops.sampling import (
    sample_topk, topk_filter, top_nsigma_filter, greedy,
)
from fireredtts2_tpu.ops.rope import rope_angles, apply_rope
from fireredtts2_tpu.ops.attention import gqa_attention


# ---------------------------------------------------------------- mel

def test_mel_scale_roundtrip():
    freqs = np.array([0.0, 100.0, 999.0, 1000.0, 4000.0, 8000.0])
    for scale in ("htk", "kaldi", "slaney"):
        back = mel_to_hertz(hertz_to_mel(freqs, scale), scale)
        np.testing.assert_allclose(back, freqs, rtol=1e-9, atol=1e-6)


def test_whisper_filterbank_shape_and_norm():
    fb = whisper_mel_filters(num_mels=128, n_fft=400)
    assert fb.shape == (201, 128)
    assert (fb >= 0).all()
    # slaney norm: every filter has nonzero mass
    assert (fb.max(axis=0) > 0).all()


def test_log_mel_shape_and_range(rng):
    fb = whisper_mel_filters(num_mels=128, n_fft=400)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(jnp.asarray(audio), jnp.asarray(fb))
    assert mel.shape == (2, 128, 100)
    m = np.asarray(mel)
    # Whisper norm keeps values in (max-8+4)/4 .. (max+4)/4 window
    assert m.max() - m.min() <= 2.0 + 1e-5


# ---------------------------------------------------------------- masks

def test_nonpad_mask():
    m = np.asarray(masks.nonpad_mask(jnp.array([2, 4]), 5))
    assert m.tolist() == [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]


def test_block_causal_mask_matches_reference_semantics():
    # chunk=2, len 5 of 6: position i sees all j with block(j) <= block(i)
    m = np.asarray(masks.block_causal_mask(jnp.array([5]), 6, 2))[0]
    want = np.zeros((6, 6), bool)
    for i in range(5):
        for j in range(5):
            want[i, j] = (j // 2) <= (i // 2)
    np.testing.assert_array_equal(m, want)


def test_decode_step_mask():
    m = np.asarray(masks.decode_step_mask(jnp.array([[3]]), 6))
    assert m.tolist() == [[[True, True, True, True, False, False]]]


# ---------------------------------------------------------------- sampling

def test_topk_filter_keeps_topk():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    f = np.asarray(topk_filter(logits, 2))
    assert f[0, 1] == 5.0 and f[0, 2] == 3.0
    assert f[0, 0] < -1e29 and f[0, 3] < -1e29


def test_top_nsigma_matches_torch_std_semantics():
    x = np.array([[0.0, 1.0, 2.0, 10.0]], dtype=np.float32)
    f = np.asarray(top_nsigma_filter(jnp.asarray(x), 1.0))
    std = x.std(ddof=1)
    thr = 10.0 - std
    want_kept = x[0] >= thr
    np.testing.assert_array_equal(f[0] > -1e29, want_kept)


def test_sample_topk_distribution():
    # Token 3 has overwhelming mass; with k=1 it must always win.
    logits = jnp.array([0.0, 0.1, 0.2, 10.0])
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    samples = np.asarray(jax.vmap(lambda k: sample_topk(logits, 1, 1.0, k))(keys))
    assert (samples == 3).all()


def test_sample_topk_respects_k():
    logits = jnp.array([0.0, 1.0, 2.0, 3.0])
    keys = jax.random.split(jax.random.PRNGKey(1), 256)
    samples = np.asarray(jax.vmap(lambda k: sample_topk(logits, 2, 1.0, k))(keys))
    assert set(np.unique(samples)) <= {2, 3}
    assert len(set(np.unique(samples))) == 2  # both appear at this temperature


def test_greedy():
    assert int(greedy(jnp.array([0.0, 3.0, 1.0]))) == 1


# ---------------------------------------------------------------- rope / attention

def test_rope_zero_position_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 2, 8)).astype(np.float32))
    cos, sin = rope_angles(jnp.zeros((1, 1)), 8, 1e6)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_rope_preserves_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16)).astype(np.float32))
    cos, sin = rope_angles(jnp.arange(3)[None, :].repeat(2, 0), 16, 1e6)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_rope_relative_shift_property(rng):
    """Dot products of rotated q/k depend only on relative distance."""
    D = 16
    q = jnp.asarray(rng.standard_normal((1, 1, 1, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 1, D)).astype(np.float32))

    def dot_at(pq, pk):
        cq, sq = rope_angles(jnp.array([[pq]]), D, 1e4)
        ck, sk = rope_angles(jnp.array([[pk]]), D, 1e4)
        qr = apply_rope(q, cq, sq)
        kr = apply_rope(k, ck, sk)
        return float(jnp.sum(qr * kr))

    assert abs(dot_at(5, 3) - dot_at(10, 8)) < 1e-4


def test_gqa_attention_equals_naive(rng):
    B, S, T, Hq, Hkv, D = 2, 3, 5, 4, 2, 8
    q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, D)).astype(np.float32)
    mask = rng.random((B, S, T)) > 0.3
    mask[:, :, 0] = True  # ensure at least one attendable key

    got = np.asarray(gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   jnp.asarray(mask)))

    # naive per-head computation with repeated kv heads
    group = Hq // Hkv
    want = np.zeros_like(got)
    for b in range(B):
        for h in range(Hq):
            kv_h = h // group
            scores = q[b, :, h, :] @ k[b, :, kv_h, :].T / np.sqrt(D)
            scores = np.where(mask[b], scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            want[b, :, h, :] = p @ v[b, :, kv_h, :]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_topk_filter_dynamic_matches_static():
    from fireredtts2_tpu.ops.sampling import topk_filter, topk_filter_dynamic
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(5, 40)).astype(np.float32))
    for k in (1, 3, 10, 40):
        want = topk_filter(logits, k)
        got = topk_filter_dynamic(logits, jnp.int32(k), k_cap=40)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # per-row k
    ks = jnp.asarray([1, 2, 5, 10, 40], jnp.int32)
    got = topk_filter_dynamic(logits, ks, k_cap=40)
    for i, k in enumerate([1, 2, 5, 10, 40]):
        np.testing.assert_array_equal(
            np.asarray(topk_filter(logits[i:i + 1], k))[0], np.asarray(got[i]))


def test_sample_topk_traced_k_equals_static_k():
    """Same key + same effective filter => identical samples, whether k is
    a static int or a traced per-row array (the batcher's path)."""
    from fireredtts2_tpu.ops.sampling import sample_topk
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(4, 33)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    a = sample_topk(logits, 5, 0.8, key)
    b = sample_topk(logits, jnp.full((4,), 5, jnp.int32), 0.8, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
