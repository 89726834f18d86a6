"""LM transformer parity against an independent torch Qwen2 implementation.

torchtune isn't installed here, so this test hand-writes the documented
Qwen2 architecture in torch (GQA with q/k/v bias, HF rotate_half RoPE base
1e6, RMSNorm eps 1e-6, SwiGLU) using torchtune's state-dict naming, runs a
forward pass, and requires our converted JAX transformer to reproduce it.
This pins the two things a checkpoint load can silently get wrong: weight
mapping and RoPE convention.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fireredtts2_tpu.config import TransformerConfig  # noqa: E402
from fireredtts2_tpu.ops import masks as mask_ops  # noqa: E402
from fireredtts2_tpu.runtime.checkpoint import convert_qwen2_transformer  # noqa: E402
from fireredtts2_tpu.models.lm.transformer import transformer_forward  # noqa: E402

CFG = TransformerConfig(vocab_size=0, num_layers=2, num_heads=4, num_kv_heads=2,
                        embed_dim=32, intermediate_dim=64, max_seq_len=64)


class TorchQwen2(torch.nn.Module):
    """Minimal Qwen2 decoder (HF conventions) with torchtune param names."""

    def __init__(self, cfg: TransformerConfig):
        super().__init__()
        self.cfg = cfg
        D, Hq, Hkv, Dh, I = (cfg.embed_dim, cfg.num_heads, cfg.num_kv_heads,
                             cfg.head_dim, cfg.intermediate_dim)
        self.layers = torch.nn.ModuleList()
        for _ in range(cfg.num_layers):
            layer = torch.nn.Module()
            layer.attn = torch.nn.Module()
            layer.attn.q_proj = torch.nn.Linear(D, Hq * Dh, bias=True)
            layer.attn.k_proj = torch.nn.Linear(D, Hkv * Dh, bias=True)
            layer.attn.v_proj = torch.nn.Linear(D, Hkv * Dh, bias=True)
            layer.attn.output_proj = torch.nn.Linear(Hq * Dh, D, bias=False)
            layer.mlp = torch.nn.Module()
            layer.mlp.w1 = torch.nn.Linear(D, I, bias=False)
            layer.mlp.w2 = torch.nn.Linear(I, D, bias=False)
            layer.mlp.w3 = torch.nn.Linear(D, I, bias=False)
            layer.sa_norm = torch.nn.Module()
            layer.sa_norm.scale = torch.nn.Parameter(torch.randn(D) * 0.1 + 1.0)
            layer.mlp_norm = torch.nn.Module()
            layer.mlp_norm.scale = torch.nn.Parameter(torch.randn(D) * 0.1 + 1.0)
            self.layers.append(layer)
        self.norm = torch.nn.Module()
        self.norm.scale = torch.nn.Parameter(torch.randn(D) * 0.1 + 1.0)

    @staticmethod
    def _rms(x, scale, eps):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)
        return (y * scale.float()).to(x.dtype)

    def _rope(self, x, positions):
        # HF rotate_half: channel pairs (i, i + D/2)
        B, S, H, Dh = x.shape
        half = Dh // 2
        inv = 1.0 / (self.cfg.rope_base ** (
            torch.arange(0, half, dtype=torch.float64) * 2.0 / Dh))
        ang = positions.double()[:, :, None] * inv[None, None, :]
        cos = ang.cos()[:, :, None, :].float()
        sin = ang.sin()[:, :, None, :].float()
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, h, positions, causal=True):
        cfg = self.cfg
        B, S, D = h.shape
        Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        if isinstance(causal, torch.Tensor):
            mask = causal.unsqueeze(1)  # (B, 1, S, S) for SDPA broadcast
        else:
            mask = (torch.tril(torch.ones(S, S, dtype=torch.bool))
                    if causal else None)
        for layer in self.layers:
            x = self._rms(h, layer.sa_norm.scale, cfg.norm_eps)
            q = layer.attn.q_proj(x).view(B, S, Hq, Dh)
            k = layer.attn.k_proj(x).view(B, S, Hkv, Dh)
            v = layer.attn.v_proj(x).view(B, S, Hkv, Dh)
            q = self._rope(q, positions)
            k = self._rope(k, positions)
            # GQA: repeat kv heads
            rep = Hq // Hkv
            k = k.repeat_interleave(rep, dim=2)
            v = v.repeat_interleave(rep, dim=2)
            att = torch.nn.functional.scaled_dot_product_attention(
                q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
                attn_mask=mask)
            att = att.transpose(1, 2).reshape(B, S, Hq * Dh)
            h = h + layer.attn.output_proj(att)
            x = self._rms(h, layer.mlp_norm.scale, cfg.norm_eps)
            h = h + layer.mlp.w2(
                torch.nn.functional.silu(layer.mlp.w1(x)) * layer.mlp.w3(x))
        return self._rms(h, self.norm.scale, cfg.norm_eps)


def test_transformer_matches_torch_qwen2(rng):
    torch.manual_seed(0)
    ref = TorchQwen2(CFG).eval()
    sd = {f"m.{k}": v for k, v in ref.state_dict().items()}
    params = convert_qwen2_transformer(sd, "m", CFG, jnp.float32)

    B, S = 2, 9
    h = rng.standard_normal((B, S, CFG.embed_dim)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int64)[None], (B, S)).copy()

    with torch.no_grad():
        want = ref(torch.from_numpy(h), torch.from_numpy(pos)).numpy()

    causal = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))
    got, _ = transformer_forward(params, CFG, jnp.asarray(h),
                                 jnp.asarray(pos.astype(np.int32)), causal)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_transformer_matches_torch_qwen2_shifted_positions(rng):
    """Same check at non-zero offset positions (decode-path RoPE)."""
    torch.manual_seed(1)
    ref = TorchQwen2(CFG).eval()
    sd = {f"m.{k}": v for k, v in ref.state_dict().items()}
    params = convert_qwen2_transformer(sd, "m", CFG, jnp.float32)

    B, S, off = 1, 4, 11
    h = rng.standard_normal((B, S, CFG.embed_dim)).astype(np.float32)
    pos = (np.arange(S, dtype=np.int64)[None] + off)

    with torch.no_grad():
        want = ref(torch.from_numpy(h), torch.from_numpy(pos)).numpy()

    causal = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))
    got, _ = transformer_forward(params, CFG, jnp.asarray(h),
                                 jnp.asarray(pos.astype(np.int32)), causal)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------- mid-dim parity


def test_transformer_greedy_parity_mid_dim(rng):
    """Flagship-risk de-risking at ~180M params (qwen-500m dims, 12 layers):
    converted weights must reproduce torch logits closely enough that a
    greedy AR decode chain picks the SAME tokens. Tiny-dim parity can hide
    tolerance cliffs that only appear at real widths/depths (VERDICT r1
    weak #5)."""
    cfg = TransformerConfig(vocab_size=0, num_layers=12, num_heads=14,
                            num_kv_heads=2, embed_dim=896,
                            intermediate_dim=4864, max_seq_len=128)
    torch.manual_seed(3)
    ref = TorchQwen2(cfg).eval()
    sd = {f"m.{k}": v for k, v in ref.state_dict().items()}
    params = convert_qwen2_transformer(sd, "m", cfg, jnp.float32)

    n_params = sum(v.numel() for v in ref.state_dict().values())
    assert n_params > 100e6, n_params  # the point of the test

    V, S, steps = 503, 12, 4
    emb = (rng.standard_normal((V, cfg.embed_dim)) * 0.05).astype(np.float32)
    head = (rng.standard_normal((cfg.embed_dim, V)) * 0.05).astype(np.float32)
    toks = rng.integers(0, V, size=(1, S))

    # torch greedy chain
    t_toks = list(toks[0])
    with torch.no_grad():
        for _ in range(steps):
            h = torch.from_numpy(emb[np.asarray(t_toks)][None])
            pos = torch.arange(len(t_toks), dtype=torch.int64)[None]
            out = ref(h, pos)
            logits = out[0, -1].numpy() @ head
            t_toks.append(int(logits.argmax()))

    # JAX greedy chain (stateless forward per step — parity target is the
    # numerics, the KV-cache path is covered by tiny-dim tests)
    j_toks = list(toks[0])
    for _ in range(steps):
        h = jnp.asarray(emb[np.asarray(j_toks)][None])
        S_cur = len(j_toks)
        pos = jnp.arange(S_cur, dtype=jnp.int32)[None]
        causal = jnp.broadcast_to(mask_ops.causal_mask(S_cur)[None],
                                  (1, S_cur, S_cur))
        out, _ = transformer_forward(params, cfg, h, pos, causal)
        logits = np.asarray(out[0, -1]) @ head
        j_toks.append(int(logits.argmax()))

    assert j_toks == t_toks, (j_toks[S:], t_toks[S:])
