"""ASR tests: JAX whisper vs the HF torch implementation (tiny dims, same
recipe as tests/test_parity_lm.py), plus the service layer end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fireredtts2_tpu.asr import (
    TINY_ASR, WhisperASR, StreamingWhisperASR, ASRConfig,
    init_asr_params, asr_greedy_decode, asr_beam_decode,
    asr_sample_best_of, asr_detect_language, convert_hf_whisper,
)
from fireredtts2_tpu.asr.model import (
    asr_encode, asr_decoder_forward, init_asr_decode_state,
    precompute_cross_kv, WhisperASRModelConfig,
)


def _rand_mel(rng, cfg, frames=None):
    T = frames or cfg.max_source_positions * 2
    mel = rng.standard_normal((1, T, cfg.n_mels)).astype(np.float32) * 0.1
    return jnp.asarray(mel), jnp.asarray([T], jnp.int32)


# --------------------------------------------------------------- unit level


def test_greedy_decode_shapes_and_budget(rng):
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    prompt = jnp.asarray([[cfg.sot_id, cfg.transcribe_id,
                           cfg.no_timestamps_id]], jnp.int32)
    res = asr_greedy_decode(params, cfg, mel, mel_len, prompt, max_new=8)
    assert res.tokens.shape == (1, 8)
    n = int(res.n_tokens[0])
    assert 0 <= n <= 8
    toks = np.asarray(res.tokens[0])
    assert (toks[n:] == cfg.eot_id).all()     # eot-padded tail
    assert np.isfinite(float(res.sum_logprob[0]))
    assert 0.0 <= float(res.no_speech_prob[0]) <= 1.0


def test_detect_language_distribution(rng):
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(1), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    probs = np.asarray(asr_detect_language(params, cfg, mel, mel_len))
    assert probs.shape == (1, cfg.num_languages)
    assert np.isclose(probs.sum(), 1.0, atol=1e-5)


def test_decoder_prefill_equals_stepwise(rng):
    """Feeding [t0..t3] in one prefill must give the same last-position
    logits as feeding t0..t3 one at a time (KV slab correctness)."""
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(2), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    toks = jnp.asarray([[cfg.sot_id, 5, 9, 3]], jnp.int32)

    st = init_asr_decode_state(cfg, 1)
    full, _ = asr_decoder_forward(params, cfg, toks, st, cross, enc_len)

    st = init_asr_decode_state(cfg, 1)
    for i in range(4):
        step, st = asr_decoder_forward(params, cfg, toks[:, i:i + 1], st,
                                       cross, enc_len)
    np.testing.assert_allclose(np.asarray(full[:, -1]), np.asarray(step[:, -1]),
                               rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------- beam search


def _eager_beam(params, cfg, mel, mel_len, prompt_row, max_new, W):
    """Independent eager beam search (python loops, full teacher-forced
    prefill each step — none of the while_loop/KV-gather machinery the
    compiled asr_beam_decode uses), same semantics: per-beam top-(W+1)
    proposals, EOT proposals fill a W-capped pool best-first, best W
    continuations survive, final ranking by sum/(len+1)."""
    enc, enc_len = asr_encode(params, cfg, mel, mel_len)
    cross = precompute_cross_kv(params, cfg, enc)
    P = len(prompt_row)

    def last_logp(seq):
        st = init_asr_decode_state(cfg, 1)
        logits, _ = asr_decoder_forward(
            params, cfg, jnp.asarray([seq], jnp.int32), st, cross, enc_len)
        return np.asarray(jax.nn.log_softmax(logits[0, -1]))

    beams = [(list(prompt_row), 0.0)]
    finished = []          # (generated_tokens, sum_lp, n) in arrival order
    t_end = 0
    for t in range(max_new):
        cont, eots = [], []
        for seq, s in beams:
            lp = last_logp(seq)
            for v in np.argsort(-lp)[: W + 1]:
                v = int(v)
                if v == cfg.eot_id:
                    eots.append((seq[P:], s + lp[v]))
                else:
                    cont.append((seq + [v], s + lp[v]))
        for gen, sc in sorted(eots, key=lambda x: -x[1]):
            if len(finished) < W:
                finished.append((gen, sc, len(gen)))
        beams = sorted(cont, key=lambda x: -x[1])[:W]
        t_end = t + 1
        if len(finished) >= W:
            break
    for seq, s in sorted(beams, key=lambda x: -x[1]):
        if len(finished) < W:
            finished.append((seq[P:], s, t_end))
    return max(finished, key=lambda f: f[1] / (f[2] + 1))


def test_beam_size_one_equals_greedy(rng):
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(4), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    prompt = jnp.asarray([[cfg.sot_id, cfg.transcribe_id,
                           cfg.no_timestamps_id]], jnp.int32)
    g = asr_greedy_decode(params, cfg, mel, mel_len, prompt, max_new=8)
    b = asr_beam_decode(params, cfg, mel, mel_len, prompt, max_new=8,
                        beam_size=1)
    ng, nb = int(g.n_tokens[0]), int(b.n_tokens[0])
    assert ng == nb
    np.testing.assert_array_equal(np.asarray(g.tokens[0][:ng]),
                                  np.asarray(b.tokens[0][:nb]))
    np.testing.assert_allclose(float(g.sum_logprob[0]),
                               float(b.sum_logprob[0]), rtol=1e-4)
    np.testing.assert_allclose(float(g.no_speech_prob[0]),
                               float(b.no_speech_prob[0]), rtol=1e-4)


@pytest.mark.parametrize("beam_size", [2, 4])
def test_beam_decode_matches_eager_reference(rng, beam_size):
    """The one-program beam search (beams as batch rows, KV-slab gathers,
    on-device finished pool) must pick the exact hypothesis an eager
    python implementation of the same search picks."""
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(5), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    prompt_row = [cfg.sot_id, cfg.transcribe_id, cfg.no_timestamps_id]
    max_new = 8

    want_gen, want_score, want_n = _eager_beam(
        params, cfg, mel, mel_len, prompt_row, max_new, beam_size)

    res = asr_beam_decode(params, cfg, mel, mel_len,
                          jnp.asarray([prompt_row], jnp.int32),
                          max_new=max_new, beam_size=beam_size)
    n = int(res.n_tokens[0])
    got = [int(t) for t in np.asarray(res.tokens[0][:n])]
    assert n == want_n
    assert got == [int(v) for v in want_gen[:n]]
    np.testing.assert_allclose(float(res.sum_logprob[0]), want_score,
                               rtol=2e-3, atol=2e-3)


def test_best_of_equals_tiled_batch_selection(rng):
    """best-of-N must equal decoding N identical rows as a plain batch
    (same key) and keeping the best avg-logprob row — proves the
    encode-once tiling and the on-device selection."""
    cfg = TINY_ASR
    params = init_asr_params(jax.random.PRNGKey(6), cfg)
    mel, mel_len = _rand_mel(rng, cfg)
    prompt_row = [cfg.sot_id, cfg.transcribe_id, cfg.no_timestamps_id]
    N, max_new = 4, 8
    key = jax.random.PRNGKey(11)

    tiled = asr_greedy_decode(
        params, cfg, jnp.tile(mel, (N, 1, 1)), jnp.tile(mel_len, (N,)),
        jnp.asarray([prompt_row] * N, jnp.int32), max_new=max_new,
        temperature=1.0, key=key)
    avg = (np.asarray(tiled.sum_logprob)
           / (np.asarray(tiled.n_tokens, np.float32) + 1.0))
    w = int(avg.argmax())

    res = asr_sample_best_of(
        params, cfg, mel, mel_len, jnp.asarray([prompt_row], jnp.int32),
        max_new=max_new, best_of=N, temperature=1.0, key=key)
    assert int(res.n_tokens[0]) == int(tiled.n_tokens[w])
    np.testing.assert_array_equal(np.asarray(res.tokens[0]),
                                  np.asarray(tiled.tokens[w]))


def test_service_beam_and_best_of_paths(rng):
    """ASRConfig.beam_size / best_of route transcribe through the beam /
    best-of programs (reference ASRConfig knobs, whisper_asr.py:40-41)."""
    asr = WhisperASR(config=ASRConfig(max_new_tokens=8, beam_size=3,
                                      best_of=2), seed=3)
    audio = rng.standard_normal(16_000).astype(np.float32) * 0.3
    res = asr.transcribe(audio, 16_000)
    assert isinstance(res.text, str)
    assert res.segments == [] or "avg_logprob" in res.segments[0]


# -------------------------------------------------------- word timestamps


def test_dtw_recovers_known_path():
    """DTW over a matrix with an unambiguous diagonal band must follow
    it: token i aligns to frames around 2i."""
    from fireredtts2_tpu.asr import dtw_path
    N, M = 5, 10
    mat = np.zeros((N, M))
    for i in range(N):
        mat[i, 2 * i] = mat[i, 2 * i + 1] = 1.0   # bright band
    ti, fi = dtw_path(-mat)
    # path is monotonic and covers all tokens/frames
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == M - 1
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    # each token's first-visit frame is its band start
    first = {int(t): int(f) for t, f in zip(ti[::-1], fi[::-1])}
    assert first == {i: 2 * i for i in range(N)}


def test_split_to_words_space_and_cjk():
    from fireredtts2_tpu.asr import split_to_words
    vocab = {1: "Hel", 2: "lo", 3: " wor", 4: "ld", 5: "'s", 6: "你", 7: "好"}
    detok = lambda ids: "".join(vocab[i] for i in ids)
    words, counts = split_to_words([1, 2, 3, 4, 5, 6, 7], detok)
    assert words == ["Hello", "world's", "你", "好"]
    assert counts == [2, 3, 1, 1]
    assert sum(counts) == 7


def test_transcribe_word_timestamps(rng):
    """word_timestamps=True adds per-word dicts with monotonic times
    inside the audio window (reference ASRConfig.word_timestamps,
    whisper_asr.py:45)."""
    asr = WhisperASR(config=ASRConfig(max_new_tokens=8, word_timestamps=True,
                                      fallback_temperatures=()), seed=3)
    audio = rng.standard_normal(16_000).astype(np.float32) * 0.3
    res = asr.transcribe(audio, 16_000)
    if not res.segments:      # random weights may gate to silence
        pytest.skip("random-weight decode hit the no-speech gate")
    words = res.segments[0]["words"]
    assert words and all(
        set(w) == {"word", "start", "end", "probability"} for w in words)
    starts = [w["start"] for w in words]
    assert all(b >= a for a, b in zip(starts, starts[1:]))
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= 1.05  # 1 s of audio
        assert 0.0 <= w["probability"] <= 1.0
    # every decoded token is accounted for in some word
    assert "".join(w["word"] for w in words).replace(" ", "") \
        == res.segments[0]["text"].replace(" ", "")


# ----------------------------------------------------------- long-form seek


def test_long_form_seek_loop(rng):
    """Audio longer than the 30 s window is transcribed window by window
    (the reference's backing package seeks over long audio; previously
    everything past one window was silently dropped)."""
    asr = WhisperASR(config=ASRConfig(max_new_tokens=6,
                                      fallback_temperatures=()), seed=3)
    W = asr._n_samples
    audio = rng.standard_normal(3 * W + W // 2).astype(np.float32) * 0.3
    res = asr.transcribe(audio, 16_000)
    assert res.end_time == pytest.approx(len(audio) / 16_000)
    assert len(res.segments) >= 2          # random weights emit tokens
    for i, s in enumerate(res.segments):
        assert s["id"] == i
    starts = [s["start"] for s in res.segments]
    assert starts == sorted(starts) and len(set(starts)) == len(starts)
    assert all(s["end"] <= len(audio) / 16_000 + 1e-6 for s in res.segments)
    assert res.text == " ".join(s["text"].strip() for s in res.segments
                                if s["text"].strip())
    # deterministic: same audio -> same transcript (per-window attempt keys)
    assert asr.transcribe(audio, 16_000).text == res.text


def test_long_form_word_timestamps_are_offset(rng):
    asr = WhisperASR(config=ASRConfig(max_new_tokens=4, word_timestamps=True,
                                      fallback_temperatures=()), seed=3)
    W = asr._n_samples
    audio = rng.standard_normal(2 * W).astype(np.float32) * 0.3
    res = asr.transcribe(audio, 16_000)
    if len(res.segments) < 2:
        pytest.skip("random-weight decode gated a window to silence")
    s0, s1 = res.segments[0], res.segments[1]
    assert all(w["end"] <= s0["end"] + 1e-6 for w in s0["words"])
    # window-2 words carry the window offset
    assert all(w["start"] >= s1["start"] - 1e-6 for w in s1["words"])


# ------------------------------------------------------------ torch parity


def _tiny_hf_model():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = TINY_ASR
    hf_cfg = WhisperConfig(
        vocab_size=cfg.vocab_size, num_mel_bins=cfg.n_mels,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim, decoder_ffn_dim=cfg.ffn_dim,
        d_model=cfg.embed_dim, max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.sot_id, eos_token_id=cfg.eot_id,
        pad_token_id=cfg.eot_id, use_cache=False, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(7)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    return torch, model


def test_parity_vs_hf_whisper(rng):
    """Converted HF weights must reproduce HF logits and greedy tokens."""
    torch, model = _tiny_hf_model()
    cfg = TINY_ASR
    params = convert_hf_whisper(model.state_dict(), cfg)

    T = cfg.max_source_positions * 2
    mel = rng.standard_normal((1, T, cfg.n_mels)).astype(np.float32) * 0.5
    dec_in = np.asarray([[cfg.sot_id, 4, 17, 33]], np.int64)

    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
                    decoder_input_ids=torch.from_numpy(dec_in))
    want = out.logits.numpy()

    enc, enc_len = asr_encode(params, cfg, jnp.asarray(mel),
                              jnp.asarray([T], jnp.int32))
    cross = precompute_cross_kv(params, cfg, enc)
    st = init_asr_decode_state(cfg, 1)
    got, _ = asr_decoder_forward(params, cfg, jnp.asarray(dec_in, jnp.int32),
                                 st, cross, enc_len)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    # greedy argmax chain must be token-exact
    np.testing.assert_array_equal(np.asarray(got).argmax(-1),
                                  want.argmax(-1))


def test_greedy_tokens_match_hf_generate(rng):
    torch, model = _tiny_hf_model()
    cfg = TINY_ASR
    params = convert_hf_whisper(model.state_dict(), cfg)

    T = cfg.max_source_positions * 2
    mel = rng.standard_normal((1, T, cfg.n_mels)).astype(np.float32) * 0.5
    max_new = 6

    # manual greedy loop in torch (HF .generate adds suppression logic the
    # raw model does not have)
    feats = torch.from_numpy(mel.transpose(0, 2, 1))
    ids = torch.tensor([[cfg.sot_id]])
    want = []
    with torch.no_grad():
        for _ in range(max_new):
            logits = model(input_features=feats, decoder_input_ids=ids).logits
            nxt = int(logits[0, -1].argmax())
            want.append(nxt)
            if nxt == cfg.eot_id:
                break
            ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)

    res = asr_greedy_decode(params, cfg, jnp.asarray(mel),
                            jnp.asarray([T], jnp.int32),
                            jnp.asarray([[cfg.sot_id]], jnp.int32),
                            max_new=max_new)
    n = int(res.n_tokens[0])
    got = [int(t) for t in np.asarray(res.tokens[0][:n])]
    want_live = [t for t in want if t != cfg.eot_id]
    assert got == want_live, (got, want_live)


# ------------------------------------------------------------ service layer


@pytest.fixture(scope="module")
def tiny_asr():
    return WhisperASR(config=ASRConfig(max_new_tokens=8), seed=3)


def test_whisper_asr_transcribe_api(tiny_asr):
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16_000)).astype(np.float32)
    res = tiny_asr.transcribe(audio, 16_000)
    assert res.model_name.startswith("whisper-jax")
    assert isinstance(res.text, str)
    assert 0.0 <= res.confidence <= 1.0
    assert res.end_time > 0
    stats = tiny_asr.get_performance_stats()
    assert stats["total_transcriptions"] >= 2  # warmup + this call
    assert stats["average_processing_time_ms"] > 0


def test_whisper_asr_preprocess_paths(tiny_asr):
    # int16 stereo at 48 kHz exercises mono + dtype + resample + trim
    audio = (np.random.default_rng(0).integers(-2000, 2000, (48_000, 2))
             .astype(np.int16))
    res = tiny_asr.transcribe(audio, 48_000)
    assert isinstance(res.text, str)


def test_whisper_asr_detect_language(tiny_asr):
    audio = np.random.default_rng(1).standard_normal(8000).astype(np.float32)
    out = tiny_asr.detect_language(audio)
    assert out["language"] in tiny_asr.get_supported_languages()
    assert len(out["all_probabilities"]) <= 10


def test_streaming_asr_produces_results(tiny_asr):
    stream = StreamingWhisperASR(tiny_asr, chunk_duration=0.5,
                                 overlap_duration=0.1)
    stream.start_streaming()
    try:
        audio = np.random.default_rng(2).standard_normal(24_000).astype(np.float32)
        for i in range(0, len(audio), 4000):
            stream.add_audio_chunk(audio[i:i + 4000])
        results = []
        import time
        deadline = time.time() + 30
        while time.time() < deadline and not results:
            r = stream.get_transcription_result(timeout=0.5)
            if r is not None:
                results.append(r)
        # random weights always emit SOME tokens (argmax of random logits is
        # almost never eot immediately)
        assert results and results[0].is_final is False
    finally:
        stream.stop_streaming()


def test_s2s_pipeline_with_real_asr(tiny_asr):
    """The speech-to-speech loop transcribes real audio end-to-end through
    the JAX whisper (VERDICT missing-item #1: serve/s2s.py previously only
    had a Protocol hook)."""
    from fireredtts2_tpu.serve.s2s import SpeechToSpeechPipeline
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    pipe = SpeechToSpeechPipeline(engine, transcriber=tiny_asr.as_transcriber())
    audio = np.random.default_rng(3).standard_normal(16_000).astype(np.float32) * 0.3
    res = pipe.process_audio_input(audio)
    assert isinstance(res.transcript, str)
    assert res.response_text
    assert res.audio24k.size > 0 and np.isfinite(res.audio24k).all()


# ----------------------------------------- official SSL-encoder weight path


def test_hf_whisper_dir_loads_into_ssl_encoder(rng, tmp_path):
    """The official-weights path (VERDICT missing #5): a local HF whisper
    checkout converts into the codec SSL encoder tree verbatim and
    reproduces the HF torch encoder's output."""
    torch, model = _tiny_hf_model()
    cfg = TINY_ASR
    hf_dir = tmp_path / "whisper-tiny-test"
    model.save_pretrained(hf_dir)

    from fireredtts2_tpu.runtime.checkpoint import (
        find_hf_whisper_dir, load_hf_whisper_encoder_sd,
        _convert_whisper_encoder,
    )
    from fireredtts2_tpu.config import WhisperEncoderConfig
    from fireredtts2_tpu.models.codec.whisper_nn import whisper_encoder_forward

    assert find_hf_whisper_dir(str(tmp_path)) == str(hf_dir)

    sd = load_hf_whisper_encoder_sd(str(hf_dir), prefix="ssl")
    assert "ssl.conv1.weight" in sd and "ssl.layers.0.self_attn.q_proj.weight" in sd
    # verbatim: converted tensor equals the HF tensor
    np.testing.assert_array_equal(
        np.asarray(sd["ssl.conv1.weight"]),
        model.model.encoder.conv1.weight.detach().numpy())

    enc_cfg = WhisperEncoderConfig(
        in_dim=cfg.n_mels, embed_dim=cfg.embed_dim,
        num_layers=cfg.encoder_layers, num_heads=cfg.num_heads,
        ffn_dim=cfg.ffn_dim, max_positions=cfg.max_source_positions)
    params = _convert_whisper_encoder(sd, "ssl", enc_cfg, jnp.float32)

    T = cfg.max_source_positions * 2
    mel = rng.standard_normal((1, T, cfg.n_mels)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    got, lengths = whisper_encoder_forward(
        params, cfg.num_heads, jnp.asarray(mel), jnp.asarray([T], jnp.int32))
    assert int(lengths[0]) == T // 2
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_int8_quantized_asr_runs_and_composes_with_mesh():
    """Weight-only int8 on the transcription hot path
    (asr/model.py:quantize_asr_params_int8): per-channel dequantization
    error is small, the pipeline runs end to end, and the int8 scales
    shard with their weights under a tp mesh."""
    from fireredtts2_tpu.asr.asr import WhisperASR, ASRConfig
    from fireredtts2_tpu.parallel.mesh import make_mesh

    t = np.arange(8_000) / 16_000.0
    tone = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    cfg = ASRConfig(max_new_tokens=8)

    a8 = WhisperASR(config=cfg, warmup=False, quantize_int8=True)
    lp = a8.params["decoder"]["layers"]
    assert lp["self_wq"].dtype == jnp.int8 and "self_wq_scale" in lp
    assert lp["cross_wk"].dtype != jnp.int8  # once-per-utterance: stays fp
    enc = a8.params["encoder"]["layers"]
    assert enc["wq"].dtype == jnp.int8 and "wq_scale" in enc

    orig = WhisperASR(config=cfg, warmup=False).params
    w0 = np.asarray(orig["decoder"]["layers"]["self_wq"], np.float32)
    deq = (np.asarray(lp["self_wq"], np.float32)
           * np.asarray(lp["self_wq_scale"], np.float32))
    rel = np.linalg.norm(deq - w0) / np.linalg.norm(w0)
    assert rel < 0.01, rel

    r = a8.transcribe(tone)
    assert r.segments and np.isfinite(r.segments[0]["avg_logprob"])

    am = WhisperASR(config=cfg, warmup=False, quantize_int8=True,
                    mesh=make_mesh(tp=4))
    s = am.params["decoder"]["layers"]["self_wq_scale"]
    assert s.sharding.shard_shape(s.shape)[-1] == s.shape[-1] // 4
    rm = am.transcribe(tone)
    assert rm.segments and np.isfinite(rm.segments[0]["avg_logprob"])
