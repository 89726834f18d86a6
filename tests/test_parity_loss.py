"""Training-loss parity against an independent torch implementation of the
reference loss (fireredtts2/llm/llm.py:145-272), with the amortized depth
subset pinned to explicit indices so both sides compute the same thing.

Note one deliberate deviation (documented in models/lm/model.py): the
reference pairs text hiddens/targets through two separate boolean gathers
whose flatten order can cross row boundaries (llm.py:177-179); we use the
clean next-token formulation. This test therefore checks c0 and depth
losses exactly against the reference formulation and the text loss against
the next-token formulation applied on the torch side too.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fireredtts2_tpu.config import LLMConfig, TransformerConfig  # noqa: E402
from fireredtts2_tpu.models.lm.model import lm_loss  # noqa: E402
from fireredtts2_tpu.runtime.checkpoint import convert_lm_state_dict  # noqa: E402
from tests.test_parity_lm import TorchQwen2  # noqa: E402

BB = TransformerConfig(vocab_size=0, num_layers=2, num_heads=4, num_kv_heads=2,
                       embed_dim=32, intermediate_dim=64, max_seq_len=64)
DEC = TransformerConfig(vocab_size=0, num_layers=2, num_heads=2, num_kv_heads=1,
                        embed_dim=16, intermediate_dim=32, max_seq_len=64)


class TorchDualModel(torch.nn.Module):
    """Reference Model layout (llm.py:86-113) over the independent qwen2."""

    def __init__(self, cfg: LLMConfig, bb: TransformerConfig = None,
                 dec: TransformerConfig = None):
        super().__init__()
        bb, dec = bb or BB, dec or DEC
        self.cfg = cfg
        self.backbone = TorchQwen2(bb)
        self.decoder = TorchQwen2(dec)
        self.text_embeddings = torch.nn.Embedding(cfg.text_vocab_size, bb.embed_dim)
        self.audio_embeddings = torch.nn.Embedding(
            cfg.audio_vocab_size * cfg.audio_num_codebooks, bb.embed_dim)
        self.projection = torch.nn.Linear(bb.embed_dim, dec.embed_dim, bias=False)
        self.codebook0_head = torch.nn.Linear(bb.embed_dim, cfg.audio_vocab_size,
                                              bias=False)
        self.text_head = torch.nn.Linear(bb.embed_dim, cfg.text_vocab_size,
                                         bias=False)
        self.audio_head = torch.nn.Parameter(torch.randn(
            cfg.audio_num_codebooks - 1, dec.embed_dim, cfg.audio_vocab_size) * 0.1)

    def loss(self, tokens, tokens_mask, flat_indices):
        """Reference Model.forward (llm.py:145-272) with the depth subset
        given explicitly as flat (B*S) positions of h / frame p -> frame p+1
        targets."""
        cfg = self.cfg
        B, S, _ = tokens.shape
        ncb = cfg.audio_num_codebooks

        # embed + masked sum (llm.py:164-188)
        text_emb = self.text_embeddings(tokens[:, :, -1]).unsqueeze(-2)
        offs = torch.arange(ncb) * cfg.audio_vocab_size
        audio_emb = self.audio_embeddings(tokens[:, :, :-1] + offs)
        embeds = torch.cat([audio_emb, text_emb], dim=-2)
        h = (embeds * tokens_mask.unsqueeze(-1)).sum(dim=2)

        audio_mask = tokens_mask[:, :, 0]
        text_mask = tokens_mask[:, :, -1]
        padding = audio_mask | text_mask
        causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
        attn = (causal.unsqueeze(0) & padding.unsqueeze(-1) & padding.unsqueeze(1))
        attn = attn | torch.eye(S, dtype=torch.bool).unsqueeze(0)
        pos = torch.arange(S).unsqueeze(0).expand(B, S)
        h = self.backbone(h, pos, causal=attn)

        # c0 (llm.py:209-215): h at p predicts audio frame p+1
        c0_mask = torch.roll(audio_mask, -1, 1)
        c0_mask[:, -1] = False
        c0_logits = self.codebook0_head(h[c0_mask])
        c0_targets = torch.roll(tokens[:, :, 0], -1, 1)[c0_mask]
        c0_loss = torch.nn.functional.cross_entropy(c0_logits, c0_targets)

        # text (next-token formulation; see module docstring)
        t_mask = torch.roll(text_mask, -1, 1)
        t_mask[:, -1] = False
        t_targets = torch.roll(tokens[:, :, -1], -1, 1)
        keep = t_mask & (t_targets != 0)
        text_logits = self.text_head(h[keep])
        text_loss = torch.nn.functional.cross_entropy(text_logits, t_targets[keep])

        # depth on explicit indices (llm.py:225-256)
        h_flat = h.reshape(B * S, -1)
        next_tokens = torch.roll(tokens, -1, 1).reshape(B * S, -1)
        sub_h = h_flat[flat_indices]
        sub_frame = next_tokens[flat_indices]
        c_embeds = self.audio_embeddings(
            sub_frame[:, :ncb - 1] + offs[: ncb - 1])
        dec_in = self.projection(
            torch.cat([sub_h.unsqueeze(1), c_embeds], dim=1))
        N = dec_in.shape[0]
        dpos = torch.arange(ncb).unsqueeze(0).expand(N, ncb)
        dec_h = self.decoder(dec_in, dpos)
        c_logits = torch.einsum("bsd,sdv->bsv", dec_h[:, 1:, :], self.audio_head)
        c_loss = torch.nn.functional.cross_entropy(
            c_logits.reshape(-1, c_logits.size(-1)),
            sub_frame[:, 1:ncb].reshape(-1))

        w = cfg.decoder_loss_weight
        total = 2 * ((1 - w) * c0_loss + w * c_loss) + 0.01 * text_loss
        return total, text_loss, c0_loss, c_loss


def _patch_flavors(monkeypatch):
    from fireredtts2_tpu import config as C
    monkeypatch.setitem(C.FLAVORS, "pl-bb", BB)
    monkeypatch.setitem(C.FLAVORS, "pl-dec", DEC)


def test_lm_loss_matches_reference_formulation(rng, monkeypatch):
    _patch_flavors(monkeypatch)
    cfg = LLMConfig(backbone_flavor="pl-bb", decoder_flavor="pl-dec",
                    text_vocab_size=120, audio_vocab_size=40,
                    audio_num_codebooks=4, max_seq_len=64, dtype="float32")
    torch.manual_seed(0)
    ref = TorchDualModel(cfg).eval()
    params = convert_lm_state_dict(ref.state_dict(), cfg, jnp.float32)

    B, S = 2, 20
    C = cfg.num_columns
    tokens = np.zeros((B, S, C), np.int64)
    mask = np.zeros((B, S, C), bool)
    half = S // 2
    tokens[:, :half, -1] = rng.integers(1, cfg.text_vocab_size, (B, half))
    mask[:, :half, -1] = True
    tokens[:, half:, :-1] = rng.integers(0, cfg.audio_vocab_size,
                                         (B, S - half, 4))
    mask[:, half:, :-1] = True

    # pick depth indices: positions whose NEXT frame is audio
    c0m = np.roll(mask[:, :, 0], -1, 1)
    c0m[:, -1] = False
    flat = np.nonzero(c0m.reshape(-1))[0][:6]

    with torch.no_grad():
        want = ref.loss(torch.from_numpy(tokens), torch.from_numpy(mask),
                        torch.from_numpy(flat))
    got = lm_loss(params, cfg, jnp.asarray(tokens.astype(np.int32)),
                  jnp.asarray(mask), jax.random.PRNGKey(0),
                  depth_indices=jnp.asarray(flat.astype(np.int32)))

    for name, w, g in zip(("loss", "text_loss", "c0_loss", "depth_loss"),
                          want, (got["loss"], got["text_loss"],
                                 got["c0_loss"], got["depth_loss"])):
        assert abs(float(w) - float(g)) < 2e-4, (name, float(w), float(g))
