"""Flash bounded-decode kernel (ops/pallas_flash.py) vs the XLA paths.

Interpret-mode on the CPU mesh: the kernel must match dense masked
attention at f32 (same math, online-softmax order differs only in fp
rounding) across batch sizes, query counts, live windows, and lower
bounds. Replaces: reference torch SDPA decode attention
(fireredtts2/codec/whisper.py:81-118)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireredtts2_tpu.ops.attention import gqa_attention, gqa_attention_bounded
from fireredtts2_tpu.ops.pallas_flash import (
    flash_decode_update_bounded,
    flash_decode_bounded, flash_supported, pick_chunk)


def _dense_ref(q, k, v, q_end, q_start=None):
    B, S, H, Dh = q.shape
    T = k.shape[1]
    kf = k.reshape(B, T, H, Dh)
    vf = v.reshape(B, T, H, Dh)
    idx = jnp.arange(T, dtype=jnp.int32)
    mask = idx[None, None, :] < q_end[:, :, None]
    if q_start is not None:
        mask &= idx[None, None, :] >= q_start[:, :, None]
    return gqa_attention(q, kf, vf, mask)


def _mk(key, B, S, T, H=4, Dh=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, S, H, Dh), dtype)
    k = jax.random.normal(ks[1], (B, T, H * Dh), dtype)
    v = jax.random.normal(ks[2], (B, T, H * Dh), dtype)
    return q, k, v


@pytest.mark.parametrize("B,S,T", [(1, 8, 64), (3, 32, 256), (2, 16, 96)])
def test_flash_matches_dense(B, S, T):
    q, k, v = _mk(jax.random.PRNGKey(0), B, S, T)
    # block-causal style bounds: each query sees a ramp of slots
    base = jnp.arange(B, dtype=jnp.int32)[:, None] * 3 + 9
    q_end = base + (jnp.arange(S, dtype=jnp.int32)[None, :] // 8 + 1) * 8
    q_end = jnp.minimum(q_end, T)
    live_hi = jnp.max(q_end)
    got = flash_decode_bounded(q, k, v, q_end, live_hi, interpret=True)
    want = _dense_ref(q, k, v, q_end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_xla_bounded():
    B, S, T = 2, 16, 128
    q, k, v = _mk(jax.random.PRNGKey(1), B, S, T)
    q_end = jnp.full((B, S), 40, jnp.int32).at[1].set(97)
    got = flash_decode_bounded(q, k, v, q_end, jnp.int32(97), interpret=True)
    want = gqa_attention_bounded(q, k, v, q_end, jnp.int32(97))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_lower_bound():
    """Left-padded live windows: q_start/live_lo skip dead head chunks."""
    B, S, T = 2, 8, 192
    q, k, v = _mk(jax.random.PRNGKey(2), B, S, T)
    q_start = jnp.array([[70] * S, [135] * S], jnp.int32)
    q_end = q_start + 30
    got = flash_decode_bounded(q, k, v, q_end, jnp.max(q_end),
                               q_start=q_start, live_lo=jnp.min(q_start),
                               interpret=True)
    want = _dense_ref(q, k, v, q_end, q_start)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_small_live_window():
    """live_hi smaller than one chunk (stream start): only chunk 0 read."""
    B, S, T = 4, 8, 256
    q, k, v = _mk(jax.random.PRNGKey(3), B, S, T)
    q_end = jnp.full((B, S), 8, jnp.int32)
    got = flash_decode_bounded(q, k, v, q_end, jnp.int32(8), interpret=True)
    want = _dense_ref(q, k, v, q_end)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    B, S, T = 2, 8, 64
    q, k, v = _mk(jax.random.PRNGKey(4), B, S, T, dtype=jnp.bfloat16)
    q_end = jnp.full((B, S), 48, jnp.int32)
    got = flash_decode_bounded(q, k, v, q_end, jnp.int32(48), interpret=True)
    want = _dense_ref(q, k, v, q_end)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pick_chunk_and_support():
    assert pick_chunk(3008) == 752
    assert pick_chunk(256) == 256
    assert pick_chunk(96) == 96
    assert pick_chunk(8) is None            # < 16: no tile-aligned divisor
    q = jnp.zeros((1, 8, 4, 64))
    assert flash_supported(q, jnp.zeros((1, 64, 256)))
    assert not flash_supported(q, jnp.zeros((1, 64, 4, 64)))  # unmerged
    assert not flash_supported(q, jnp.zeros((1, 64, 128)))    # GQA slab


def test_stream_decode_with_flash_kernel(monkeypatch, rng=None):
    """Full vocoder streaming path through the kernel (interpret mode)
    must still concatenate to the batch decode — the load-bearing
    streaming ≡ batch invariant under the flash attention route."""
    import numpy as np
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import (
        init_codec_params, codec_decode, stream_decode_init,
        stream_decode_step)

    cfg = tiny_engine_config().codec
    params = init_codec_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    L = 4
    tokens = rng.integers(0, cfg.rvq.codebook_size,
                          (1, cfg.rvq.num_quantizers, L)).astype(np.int32)
    full = np.asarray(codec_decode(params, cfg, jnp.asarray(tokens)))

    monkeypatch.setenv("FRTTS2_FLASH_VOC", "interpret")
    state = stream_decode_init(cfg, batch=1)
    pieces = []
    for t in range(L):
        audio, state = stream_decode_step(
            params, cfg, jnp.asarray(tokens[:, :, t:t + 1]), state,
            first=(t == 0), last=(t == L - 1))
        pieces.append(np.asarray(audio))
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=5e-4)


def test_flash_update_bounded_matches_dense():
    """Fused in-place slab write + attention == scatter-then-dense, per
    layer, including queries attending their own freshly written rows."""
    B, S, T, H, Dh, L = 2, 8, 96, 4, 64, 3
    D = H * Dh
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, S, H, Dh))
    new_k = jax.random.normal(ks[1], (B, S, D))
    new_v = jax.random.normal(ks[2], (B, S, D))
    k4 = jax.random.normal(ks[3], (L, B, T, D))
    v4 = jax.random.normal(ks[4], (L, B, T, D))
    pos = jnp.array([16, 40], jnp.int32)          # 8-aligned, per stream
    q_end = jnp.broadcast_to(pos[:, None] + S, (B, S))  # own rows included
    live_hi = jnp.max(q_end)

    for layer in (0, 2):
        lyr = jnp.int32(layer)
        rows = pos[:, None] + jnp.arange(S)[None, :]
        bidx = jnp.arange(B)[:, None]
        k4_ref = k4.at[lyr, bidx, rows, :].set(new_k)
        v4_ref = v4.at[lyr, bidx, rows, :].set(new_v)
        want = _dense_ref(q, k4_ref[layer], v4_ref[layer], q_end)

        got, k4_out, v4_out = flash_decode_update_bounded(
            q, new_k, new_v, k4, v4, lyr, pos, q_end, live_hi,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(k4_out), np.asarray(k4_ref),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(v4_out), np.asarray(v4_ref),
                                   rtol=0, atol=0)


def test_voc_update_tp_sharded():
    """The shard_mapped tp route of the vocoder WRITE kernel
    (flash_decode_update_bounded_shard, VERDICT r4 #4) must equal the
    single-device kernel: the slab is column-sharded over tp (each shard
    writes only its own MHA heads' columns) and batch-sharded over dp."""
    from fireredtts2_tpu.parallel.mesh import make_mesh
    from fireredtts2_tpu.ops.pallas_flash import (
        flash_decode_update_bounded_shard, flash_voc_tp_ok)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    B, S, T, H, Dh, L = 2, 8, 96, 4, 64, 3
    D = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    q = jax.random.normal(ks[0], (B, S, H, Dh))
    new_k = jax.random.normal(ks[1], (B, S, D))
    new_v = jax.random.normal(ks[2], (B, S, D))
    k4 = jax.random.normal(ks[3], (L, B, T, D))
    v4 = jax.random.normal(ks[4], (L, B, T, D))
    pos = jnp.array([16, 40], jnp.int32)
    q_end = jnp.broadcast_to(pos[:, None] + S, (B, S))
    live_hi = jnp.max(q_end)
    lyr = jnp.int32(1)

    want, k4_ref, v4_ref = flash_decode_update_bounded(
        q, new_k, new_v, k4, v4, lyr, pos, q_end, live_hi, interpret=True)

    mesh = make_mesh(dp=2, tp=4)
    assert flash_voc_tp_ok(mesh, q, k4, interpret=True)
    got, k4_out, v4_out = flash_decode_update_bounded_shard(
        mesh, q, new_k, new_v, k4, v4, lyr, pos, q_end, live_hi,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(np.asarray(k4_out), np.asarray(k4_ref),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(v4_out), np.asarray(v4_ref),
                               rtol=0, atol=0)
    # a mesh the kernel can't split is rejected upfront (odd head split)
    assert not flash_voc_tp_ok(make_mesh(dp=1, tp=3), q, k4, interpret=True)


def test_stream_decode_flash_tp_mesh(monkeypatch):
    """Full vocoder streaming through the SHARD_MAPPED write kernel under
    a serving mesh (the r5 mesh default — mesh mode no longer pins
    FRTTS2_FLASH_VOC off): streaming must still equal batch decode, and
    the tp route must actually be taken."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.models.codec.model import (
        init_codec_params, codec_decode, stream_decode_init,
        stream_decode_step)
    from fireredtts2_tpu.parallel.mesh import (
        make_mesh, set_serving_mesh, serving_mesh)
    import fireredtts2_tpu.ops.pallas_flash as pf

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = tiny_engine_config().codec
    params = init_codec_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(11)
    B, L = 2, 3
    tokens = rng.integers(0, cfg.rvq.codebook_size,
                          (B, cfg.rvq.num_quantizers, L)).astype(np.int32)
    full = np.asarray(codec_decode(params, cfg, jnp.asarray(tokens)))

    monkeypatch.setenv("FRTTS2_FLASH_VOC", "interpret")
    calls = {"n": 0}
    orig = pf.flash_decode_update_bounded_shard

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pf, "flash_decode_update_bounded_shard", counting)
    ntp = cfg.acoustic_decoder.num_heads  # whole-head split over tp
    prev = serving_mesh()
    set_serving_mesh(make_mesh(dp=2, tp=min(4, ntp)))
    try:
        state = stream_decode_init(cfg, batch=B)
        pieces = []
        for t in range(L):
            audio, state = stream_decode_step(
                params, cfg, jnp.asarray(tokens[:, :, t:t + 1]), state,
                first=(t == 0), last=(t == L - 1))
            pieces.append(np.asarray(audio))
    finally:
        set_serving_mesh(prev)
    assert calls["n"] > 0, "mesh route bypassed the sharded write kernel"
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=5e-4)


def test_lm_gqa1_flash_matches_dense(monkeypatch):
    """S=1 GQA decode through flash_decode_gqa1 (interpret) must match the
    dense masked path at f32 through transformer_forward, with left-padded
    live windows and per-stream positions."""
    from fireredtts2_tpu.config import TransformerConfig
    from fireredtts2_tpu.models.lm.transformer import (
        init_transformer_params, init_kv_cache, transformer_forward)
    from fireredtts2_tpu.ops.masks import decode_step_mask

    tcfg = TransformerConfig(
        vocab_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
        embed_dim=64, intermediate_dim=128, max_seq_len=64)
    B, T_max = 2, 64
    params = init_transformer_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    start = jnp.array([0, 5], jnp.int32)          # stream 1 left-padded

    def run(env):
        monkeypatch.setenv("FRTTS2_FLASH_LM", env)
        cache = init_kv_cache(tcfg, B, T_max, jnp.float32)
        pos = start                                 # next slot per stream
        outs = []
        for t in range(4):
            h = jax.random.normal(jax.random.PRNGKey(10 + t),
                                  (B, 1, tcfg.embed_dim))
            positions = pos[:, None]
            mask = (jnp.arange(T_max)[None, None, :] < (pos + 1)[:, None, None]) \
                & (jnp.arange(T_max)[None, None, :] >= start[:, None, None])
            o, cache = transformer_forward(
                params, tcfg, h, positions, mask, cache, pos,
                live_window=(start, pos + 1))
            outs.append(np.asarray(o))
            pos = pos + 1
        return np.concatenate(outs, axis=1)

    dense = run("0")
    flash = run("interpret")
    np.testing.assert_allclose(flash, dense, rtol=3e-5, atol=3e-5)


def test_lm_gqa1_kv_base_window():
    """kv_base/hkv select a column window of the slab (the tp shard's
    local view): computing kv head 1 with its query group must equal the
    dense attention restricted to those heads."""
    from fireredtts2_tpu.ops.pallas_flash import flash_decode_gqa1

    B, T, Hq, Hkv, Dh = 2, 64, 4, 2, 32
    G = Hq // Hkv
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, Hq, Dh))
    k4 = jax.random.normal(ks[1], (2, B, T, Hkv * Dh))
    v4 = jax.random.normal(ks[2], (2, B, T, Hkv * Dh))
    layer = jnp.int32(1)
    q_start = jnp.array([0, 3], jnp.int32)
    q_end = jnp.array([17, 20], jnp.int32)

    full = flash_decode_gqa1(q, k4, v4, layer, q_start, q_end,
                             jnp.min(q_start), jnp.max(q_end),
                             interpret=True)
    # shard view: query group of kv head 1, slab columns [Dh, 2*Dh)
    part = flash_decode_gqa1(q[:, G:], k4, v4, layer, q_start, q_end,
                             jnp.min(q_start), jnp.max(q_end),
                             interpret=True, kv_base=jnp.int32(1), hkv=1)
    np.testing.assert_allclose(np.asarray(part), np.asarray(full)[:, G:],
                               rtol=3e-6, atol=3e-6)


def test_lm_gqa1_flash_tp_sharded(monkeypatch):
    """The shard_mapped tp route (flash_decode_gqa1_shard, VERDICT r3 #6)
    through transformer_forward under a (dp=2, tp=4) mesh must match the
    single-device flash kernel output — each shard computes its own query
    heads against only its kv head's slab columns."""
    from fireredtts2_tpu.config import TransformerConfig
    from fireredtts2_tpu.models.lm.transformer import (
        init_transformer_params, init_kv_cache, transformer_forward)
    from fireredtts2_tpu.parallel.mesh import (
        make_mesh, set_serving_mesh, serving_mesh)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    tcfg = TransformerConfig(
        vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        embed_dim=64, intermediate_dim=128, max_seq_len=64)
    B, T_max = 2, 64
    params = init_transformer_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
    start = jnp.array([0, 5], jnp.int32)

    def run(mesh):
        monkeypatch.setenv("FRTTS2_FLASH_LM", "interpret")
        prev = serving_mesh()
        set_serving_mesh(mesh)
        try:
            cache = init_kv_cache(tcfg, B, T_max, jnp.float32)
            pos = start
            outs = []
            for t in range(3):
                h = jax.random.normal(jax.random.PRNGKey(20 + t),
                                      (B, 1, tcfg.embed_dim))
                o, cache = transformer_forward(
                    params, tcfg, h, pos[:, None], None, cache, pos,
                    live_window=(start, pos + 1))
                outs.append(np.asarray(o))
                pos = pos + 1
            return np.concatenate(outs, axis=1)
        finally:
            set_serving_mesh(prev)

    single = run(None)
    sharded = run(make_mesh(dp=2, tp=4))
    np.testing.assert_allclose(sharded, single, rtol=3e-5, atol=3e-5)

    # dp-ONLY mesh (tp=1, the make_mesh default shape for serving): must
    # ALSO take the shard_map route — GSPMD cannot partition the raw
    # pallas_call, so the unsharded kernel on dp-sharded state would
    # replicate the whole KV slab per layer per frame on real chips.
    import fireredtts2_tpu.ops.pallas_flash as pf
    calls = {"n": 0}
    orig = pf.flash_decode_gqa1_shard

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pf, "flash_decode_gqa1_shard", counting)
    dp_only = run(make_mesh(dp=2, tp=1))
    assert calls["n"] > 0, "dp-only mesh bypassed the shard_map route"
    np.testing.assert_allclose(dp_only, single, rtol=3e-5, atol=3e-5)


def test_flash_lm_tp_ok_rejects_kv_straddle():
    """Hq=6, Hkv=3 over tp=2 passes the even-split checks (Hq%ntp==0,
    hql%hkv_local==0 with the floor'd hkv_local=1) but shard 0's query
    head 2 belongs to kv head 1 while its DMA window covers only kv head
    0 — the eligibility check must reject any split where Hkv % ntp != 0
    so the tp route can't silently attend against the wrong kv head."""
    from fireredtts2_tpu.ops.pallas_flash import flash_lm_tp_ok
    from fireredtts2_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(dp=1, tp=2)
    q = jnp.zeros((2, 1, 6, 128), jnp.float32)
    k4 = jnp.zeros((2, 2, 64, 3 * 128), jnp.float32)   # (L, B, T, Hkv*Dh)
    assert not flash_lm_tp_ok(mesh, q, k4, interpret=True)
    # sanity: whole-kv-head splits stay eligible
    q2 = jnp.zeros((2, 1, 8, 128), jnp.float32)
    k42 = jnp.zeros((2, 2, 64, 2 * 128), jnp.float32)
    assert flash_lm_tp_ok(mesh, q2, k42, interpret=True)


def test_overshoot_clamps_write_and_reads():
    """A stream whose position overshot the slab (frame cap crossed
    mid-block: the host stops emitting but the dispatched block still
    computes its lanes) must NOT drive the kernel out of bounds — writes
    clamp to the last rows (like XLA dynamic_update_slice) and the chunk
    ring never reads past T. Without the clamps this was a hard TPU abort
    (INTERNAL) when 30 s clone streams crossed the 3008-latent vocoder
    slab."""
    from fireredtts2_tpu.ops.pallas_flash import (
        flash_decode_update_bounded, flash_decode_bounded)

    B, S, H, Dh, T, L = 2, 8, 4, 64, 64, 2
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    q = jax.random.normal(ks[0], (B, S, H, Dh))
    k4 = jax.random.normal(ks[1], (L, B, T, H * Dh))
    v4 = jax.random.normal(ks[2], (L, B, T, H * Dh))
    new_k = jax.random.normal(ks[3], (B, S, H * Dh))
    new_v = jax.random.normal(ks[4], (B, S, H * Dh))
    # stream 0 normal; stream 1 OVERSHOT the slab end
    pos = jnp.array([16, T + 8], jnp.int32)
    q_end = jnp.broadcast_to(
        jnp.array([[24], [T + 16]], jnp.int32), (B, S)).copy()
    live_hi = jnp.int32(T + 16)          # past capacity
    before = np.asarray(k4)
    attn, k4o, v4o = flash_decode_update_bounded(
        q, new_k, new_v, k4, v4, jnp.int32(1), pos, q_end, live_hi,
        interpret=True)
    assert np.isfinite(np.asarray(attn)).all()
    k4o = np.asarray(k4o)
    # stream 1's clamped write landed in the LAST S rows of its own lane
    np.testing.assert_array_equal(k4o[1, 1, T - S:], np.asarray(new_k)[1])
    # stream 0's write landed at pos normally; rows of OTHER (layer,
    # stream) lanes are untouched
    np.testing.assert_array_equal(k4o[1, 0, 16:16 + S],
                                  np.asarray(new_k)[0])
    np.testing.assert_array_equal(k4o[0], before[0])

    # read-side: live_hi past capacity must clamp the chunk ring (and
    # still match dense masked attention over the REAL slab extent)
    k3 = jax.random.normal(ks[1], (B, T, H * Dh))
    v3 = jax.random.normal(ks[2], (B, T, H * Dh))
    qe = jnp.full((B, S), T + 40, jnp.int32)
    out = flash_decode_bounded(q, k3, v3, qe, jnp.int32(T + 40),
                               interpret=True)
    want = _dense_ref(q, k3, v3, qe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
