"""PyTorch checkpoint -> JAX param-tree conversion, plus Orbax save/load.

The reference ships monolithic torch pickles: {"model": state_dict} for the
LM (fireredtts2/llm/utils.py:249-253) and {"generator": state_dict} for the
codec (fireredtts2/codec/model.py:214-215). This module maps those layouts
(torchtune qwen2 naming for the LM; the reference's own module names for
the codec) onto our stacked param trees.

Conventions handled here so the compute path stays clean:
- torch Linear weights are (out, in) -> transposed to (in, out);
- per-layer weights are stacked onto a leading L axis (scan-over-layers);
- torch weight_norm parametrizations (RVQ 1x1 convs, rvq.py:8-13) are folded
  into plain matrices: W = g * v / ||v||;
- torchtune qwen2 RoPE uses the HF half-split convention — our transformer
  applies the same, so q/k weights are copied verbatim.

Orbax round-trip: `save_params` / `load_params` store converted trees so the
torch pickle is only read once.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.config import (
    LLMConfig, CodecConfig, TransformerConfig, SslAdaptorConfig,
    WhisperEncoderConfig,
)
from fireredtts2_tpu.ops.audio import whisper_mel_filters

Params = dict[str, Any]


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (no torch import needed at call sites)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, name: str) -> np.ndarray:
    """Linear weight (out,in) -> (in,out)."""
    return _t(sd[f"{name}.weight"]).T


def _wn_conv1x1(sd: Mapping, name: str) -> tuple[np.ndarray, np.ndarray]:
    """Weight-normed 1x1 Conv1d -> (in,out) matrix + bias.

    torch parametrized weight_norm stores original0 (g, shape (out,1,1)) and
    original1 (v, shape (out,in,1)); effective W = g * v/||v||_dim0-rest.
    Plain (non-parametrized) checkpoints may store weight directly.
    """
    if f"{name}.weight" in sd:
        w = _t(sd[f"{name}.weight"])           # (out, in, 1)
    else:
        g = _t(sd[f"{name}.parametrizations.weight.original0"])
        v = _t(sd[f"{name}.parametrizations.weight.original1"])
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    b = _t(sd[f"{name}.bias"]) if f"{name}.bias" in sd else np.zeros(w.shape[0])
    return w[:, :, 0].T, b                      # (in, out), (out,)


def _stack(arrs: list[np.ndarray], dtype) -> jnp.ndarray:
    return jnp.asarray(np.stack(arrs)).astype(dtype)


# ---------------------------------------------------------------------------
# LM (torchtune qwen2 naming)
# ---------------------------------------------------------------------------


def convert_qwen2_transformer(sd: Mapping, prefix: str, cfg: TransformerConfig,
                              dtype=jnp.bfloat16) -> Params:
    """torchtune qwen2 TransformerDecoder state dict -> stacked tree.

    Key layout per layer: {prefix}.layers.{i}.attn.{q,k,v}_proj.{weight,bias},
    attn.output_proj.weight, mlp.w1/w2/w3.weight (gate/down/up),
    sa_norm.scale, mlp_norm.scale; final {prefix}.norm.scale.
    """
    L = cfg.num_layers

    def per_layer(fmt: str, transpose=True):
        out = []
        for i in range(L):
            w = _t(sd[fmt.format(prefix=prefix, i=i)])
            out.append(w.T if transpose else w)
        return out

    params = {
        "wq": _stack(per_layer("{prefix}.layers.{i}.attn.q_proj.weight"), dtype),
        "wk": _stack(per_layer("{prefix}.layers.{i}.attn.k_proj.weight"), dtype),
        "wv": _stack(per_layer("{prefix}.layers.{i}.attn.v_proj.weight"), dtype),
        "wo": _stack(per_layer("{prefix}.layers.{i}.attn.output_proj.weight"), dtype),
        "w_gate": _stack(per_layer("{prefix}.layers.{i}.mlp.w1.weight"), dtype),
        "w_down": _stack(per_layer("{prefix}.layers.{i}.mlp.w2.weight"), dtype),
        "w_up": _stack(per_layer("{prefix}.layers.{i}.mlp.w3.weight"), dtype),
        "attn_norm": _stack(per_layer("{prefix}.layers.{i}.sa_norm.scale", False), dtype),
        "mlp_norm": _stack(per_layer("{prefix}.layers.{i}.mlp_norm.scale", False), dtype),
        "final_norm": jnp.asarray(_t(sd[f"{prefix}.norm.scale"])).astype(dtype),
    }
    for name, key in (("q_proj", "bq"), ("k_proj", "bk"), ("v_proj", "bv")):
        bias_key = f"{prefix}.layers.0.attn.{name}.bias"
        if bias_key in sd:
            params[key] = _stack(
                per_layer("{prefix}.layers.{i}.attn." + name + ".bias", False), dtype)
        else:
            dims = {"bq": cfg.num_heads, "bk": cfg.num_kv_heads,
                    "bv": cfg.num_kv_heads}[key] * cfg.head_dim
            params[key] = jnp.zeros((L, dims), dtype)
    return params


def convert_lm_state_dict(sd: Mapping, cfg: LLMConfig, dtype=jnp.bfloat16) -> Params:
    """Reference Model state dict -> our LM tree (llm/llm.py:86-113 layout)."""
    return {
        "backbone": convert_qwen2_transformer(sd, "backbone", cfg.backbone, dtype),
        "decoder": convert_qwen2_transformer(sd, "decoder", cfg.decoder, dtype),
        "text_embeddings": jnp.asarray(_t(sd["text_embeddings.weight"])).astype(dtype),
        "audio_embeddings": jnp.asarray(_t(sd["audio_embeddings.weight"])).astype(dtype),
        "projection": jnp.asarray(_lin(sd, "projection")).astype(dtype),
        "codebook0_head": jnp.asarray(_lin(sd, "codebook0_head")).astype(dtype),
        "text_head": jnp.asarray(_lin(sd, "text_head")).astype(dtype),
        "audio_head": jnp.asarray(_t(sd["audio_head"])).astype(dtype),
    }


# ---------------------------------------------------------------------------
# Codec (reference module naming)
# ---------------------------------------------------------------------------


def _conv1d_params(sd: Mapping, name: str, dtype) -> Params:
    p = {"w": jnp.asarray(_t(sd[f"{name}.weight"])).astype(dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_t(sd[f"{name}.bias"])).astype(dtype)
    return p


def _convert_whisper_layers(sd: Mapping, prefix: str, L: int, dtype) -> Params:
    def pl(fmt, transpose=True):
        return [_t(sd[fmt.format(p=prefix, i=i)]).T if transpose
                else _t(sd[fmt.format(p=prefix, i=i)]) for i in range(L)]

    return {
        "wq": _stack(pl("{p}.{i}.self_attn.q_proj.weight"), dtype),
        "bq": _stack(pl("{p}.{i}.self_attn.q_proj.bias", False), dtype),
        "wk": _stack(pl("{p}.{i}.self_attn.k_proj.weight"), dtype),
        "wv": _stack(pl("{p}.{i}.self_attn.v_proj.weight"), dtype),
        "bv": _stack(pl("{p}.{i}.self_attn.v_proj.bias", False), dtype),
        "wo": _stack(pl("{p}.{i}.self_attn.out_proj.weight"), dtype),
        "bo": _stack(pl("{p}.{i}.self_attn.out_proj.bias", False), dtype),
        "attn_ln_w": _stack(pl("{p}.{i}.self_attn_layer_norm.weight", False), dtype),
        "attn_ln_b": _stack(pl("{p}.{i}.self_attn_layer_norm.bias", False), dtype),
        "fc1_w": _stack(pl("{p}.{i}.fc1.weight"), dtype),
        "fc1_b": _stack(pl("{p}.{i}.fc1.bias", False), dtype),
        "fc2_w": _stack(pl("{p}.{i}.fc2.weight"), dtype),
        "fc2_b": _stack(pl("{p}.{i}.fc2.bias", False), dtype),
        "ffn_ln_w": _stack(pl("{p}.{i}.final_layer_norm.weight", False), dtype),
        "ffn_ln_b": _stack(pl("{p}.{i}.final_layer_norm.bias", False), dtype),
    }


def _convert_whisper_encoder(sd: Mapping, prefix: str,
                             cfg: WhisperEncoderConfig, dtype) -> Params:
    return {
        "conv1": _conv1d_params(sd, f"{prefix}.conv1", dtype),
        "conv2": _conv1d_params(sd, f"{prefix}.conv2", dtype),
        "pos": jnp.asarray(_t(sd[f"{prefix}.embed_positions.weight"])).astype(dtype),
        "layers": _convert_whisper_layers(sd, f"{prefix}.layers",
                                          cfg.num_layers, dtype),
        "ln_w": jnp.asarray(_t(sd[f"{prefix}.layer_norm.weight"])).astype(dtype),
        "ln_b": jnp.asarray(_t(sd[f"{prefix}.layer_norm.bias"])).astype(dtype),
    }


def _convert_ssl_adaptor(sd: Mapping, prefix: str, cfg: SslAdaptorConfig,
                         dtype) -> Params:
    return {
        "in_proj_w": jnp.asarray(_lin(sd, f"{prefix}.in_proj")).astype(dtype),
        "in_proj_b": jnp.asarray(_t(sd[f"{prefix}.in_proj.bias"])).astype(dtype),
        "layers": _convert_whisper_layers(sd, f"{prefix}.layers",
                                          cfg.num_layers, dtype),
        "ln_w": jnp.asarray(_t(sd[f"{prefix}.layer_norm.weight"])).astype(dtype),
        "ln_b": jnp.asarray(_t(sd[f"{prefix}.layer_norm.bias"])).astype(dtype),
        "out_proj_w": jnp.asarray(_lin(sd, f"{prefix}.out_proj")).astype(dtype),
        "out_proj_b": jnp.asarray(_t(sd[f"{prefix}.out_proj.bias"])).astype(dtype),
    }


def _convert_rvq(sd: Mapping, cfg, dtype) -> Params:
    nq = cfg.num_quantizers
    cbs, ins, ibs, outs, obs = [], [], [], [], []
    for i in range(nq):
        q = f"rvq.quantizers.{i}"
        cbs.append(_t(sd[f"{q}.codebook"]))
        if f"{q}.in_project.parametrizations.weight.original0" in sd \
                or f"{q}.in_project.weight" in sd:
            w, b = _wn_conv1x1(sd, f"{q}.in_project")
        else:  # Identity (dims equal)
            w = np.eye(cfg.resolved_rvq_dim)
            b = np.zeros(cfg.resolved_rvq_dim)
        ins.append(w)
        ibs.append(b)
        if f"{q}.out_project.parametrizations.weight.original0" in sd \
                or f"{q}.out_project.weight" in sd:
            w, b = _wn_conv1x1(sd, f"{q}.out_project")
        else:
            w = np.eye(cfg.resolved_rvq_dim)
            b = np.zeros(cfg.resolved_rvq_dim)
        outs.append(w)
        obs.append(b)
    p: Params = {
        "codebook": jnp.asarray(np.stack(cbs), jnp.float32),
        "in_proj_w": jnp.asarray(np.stack(ins), jnp.float32),
        "in_proj_b": jnp.asarray(np.stack(ibs), jnp.float32),
        "out_proj_w": jnp.asarray(np.stack(outs), jnp.float32),
        "out_proj_b": jnp.asarray(np.stack(obs), jnp.float32),
    }
    if cfg.input_dim != cfg.resolved_rvq_dim:
        w, b = _wn_conv1x1(sd, "rvq.input_proj")
        p["input_proj_w"] = jnp.asarray(w, jnp.float32)
        p["input_proj_b"] = jnp.asarray(b, jnp.float32)
    if cfg.resolved_output_dim != cfg.resolved_rvq_dim:
        w, b = _wn_conv1x1(sd, "rvq.output_proj")
        p["output_proj_w"] = jnp.asarray(w, jnp.float32)
        p["output_proj_b"] = jnp.asarray(b, jnp.float32)
    return p


def _convert_resnet(sd: Mapping, prefix: str, dtype) -> Params:
    # Non-causal ResnetBlock (decoder.py:8-47): block1 = [GroupNorm, SiLU,
    # Conv]; block2 = [GroupNorm, SiLU, Dropout, Conv].
    return {
        "gn1_w": jnp.asarray(_t(sd[f"{prefix}.block1.0.weight"])).astype(dtype),
        "gn1_b": jnp.asarray(_t(sd[f"{prefix}.block1.0.bias"])).astype(dtype),
        "conv1": _conv1d_params(sd, f"{prefix}.block1.2", dtype),
        "gn2_w": jnp.asarray(_t(sd[f"{prefix}.block2.0.weight"])).astype(dtype),
        "gn2_b": jnp.asarray(_t(sd[f"{prefix}.block2.0.bias"])).astype(dtype),
        "conv2": _conv1d_params(sd, f"{prefix}.block2.3", dtype),
    }


def _convert_causal_resnet(sd: Mapping, prefix: str, dtype) -> Params:
    # CausalResnetBlock (decoder.py:105-137): block1 = [Transpose, LN,
    # Transpose, SiLU, CausalConv]; block2 = [..., Dropout, CausalConv].
    return {
        "ln1_w": jnp.asarray(_t(sd[f"{prefix}.block1.1.weight"])).astype(dtype),
        "ln1_b": jnp.asarray(_t(sd[f"{prefix}.block1.1.bias"])).astype(dtype),
        "conv1": _conv1d_params(sd, f"{prefix}.block1.4", dtype),
        "ln2_w": jnp.asarray(_t(sd[f"{prefix}.block2.1.weight"])).astype(dtype),
        "ln2_b": jnp.asarray(_t(sd[f"{prefix}.block2.1.bias"])).astype(dtype),
        "conv2": _conv1d_params(sd, f"{prefix}.block2.5", dtype),
    }


def convert_codec_state_dict(sd: Mapping, cfg: CodecConfig,
                             dtype=jnp.float32) -> Params:
    """Reference RedCodec "generator" state dict -> our codec tree."""
    ad = cfg.acoustic_decoder
    return {
        "ssl": _convert_whisper_encoder(sd, "ssl", cfg.ssl, dtype),
        "ssl_adaptor": _convert_ssl_adaptor(sd, "ssl_adaptor", cfg.ssl_adaptor, dtype),
        "acoustic_encoder": _convert_whisper_encoder(
            sd, "acoustic_encoder", cfg.acoustic_encoder, dtype),
        "downsample": {
            "gate_w": jnp.asarray(_t(sd["downsample.gate_proj.weight"])).astype(dtype),
            "up_w": jnp.asarray(_t(sd["downsample.up_proj.weight"])).astype(dtype),
            "down_w": jnp.asarray(_lin(sd, "downsample.down_proj")).astype(dtype),
            "ln_w": jnp.asarray(_t(sd["downsample.layer_norm.weight"])).astype(dtype),
            "ln_b": jnp.asarray(_t(sd["downsample.layer_norm.bias"])).astype(dtype),
            "out_w": jnp.asarray(_lin(sd, "downsample.out_proj")).astype(dtype),
            "out_b": jnp.asarray(_t(sd["downsample.out_proj.bias"])).astype(dtype),
        },
        "rvq": _convert_rvq(sd, cfg.rvq, dtype),
        "upsample": {
            "in_proj_w": jnp.asarray(_lin(sd, "upsample.in_proj")).astype(dtype),
            "in_proj_b": jnp.asarray(_t(sd["upsample.in_proj.bias"])).astype(dtype),
            "up_conv_w": jnp.asarray(_t(sd["upsample.up_conv.weight"])).astype(dtype),
        },
        "semantic_decoder": _convert_ssl_adaptor(
            sd, "semantic_decoder", cfg.semantic_decoder, dtype),
        "acoustic_decoder": {
            "up1_w": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.0.weight"])).astype(dtype),
            "up1_b": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.0.bias"])).astype(dtype),
            "up2_w": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.2.weight"])).astype(dtype),
            "up2_b": jnp.asarray(_t(sd["acoustic_decoder.upsample_conv.2.bias"])).astype(dtype),
            "in_proj": _conv1d_params(sd, "acoustic_decoder.backbone.in_proj", dtype),
            "prior0": (_convert_causal_resnet if ad.causal else _convert_resnet)(
                sd, "acoustic_decoder.backbone.prior_net.0", dtype),
            "prior1": (_convert_causal_resnet if ad.causal else _convert_resnet)(
                sd, "acoustic_decoder.backbone.prior_net.1", dtype),
            "layers": _convert_whisper_layers(
                sd, "acoustic_decoder.backbone.transformers", ad.num_layers, dtype),
            "post0": (_convert_causal_resnet if ad.causal else _convert_resnet)(
                sd, "acoustic_decoder.backbone.post_net.0", dtype),
            "post1": (_convert_causal_resnet if ad.causal else _convert_resnet)(
                sd, "acoustic_decoder.backbone.post_net.1", dtype),
            "final_ln_w": jnp.asarray(
                _t(sd["acoustic_decoder.backbone.final_norm.weight"])).astype(dtype),
            "final_ln_b": jnp.asarray(
                _t(sd["acoustic_decoder.backbone.final_norm.bias"])).astype(dtype),
            "head_w": jnp.asarray(_lin(sd, "acoustic_decoder.isift.out")).astype(dtype),
            "head_b": jnp.asarray(_t(sd["acoustic_decoder.isift.out.bias"])).astype(dtype),
        },
        "mel_filters": jnp.asarray(whisper_mel_filters(
            cfg.mel.num_mels, cfg.mel.n_fft, cfg.mel.sampling_rate,
            cfg.mel.fmin, cfg.mel.fmax)),
    }


# ---------------------------------------------------------------------------
# Loading entry points + Orbax round trip
# ---------------------------------------------------------------------------


def load_lm_checkpoint(path: str, cfg: LLMConfig, dtype=jnp.bfloat16) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    return convert_lm_state_dict(sd, cfg, dtype)


def load_codec_checkpoint(path: str, cfg: CodecConfig, dtype=jnp.float32,
                          hf_whisper_dir: Optional[str] = None) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)["generator"]
    has_ssl = any(k.startswith("ssl.conv1") for k in sd)
    if not has_ssl:
        # The reference ships the frozen SSL encoder OUTSIDE codec.pt: it is
        # whisper-large-v3's encoder pulled from HF
        # (reference fireredtts2/codec/whisper.py:333-361 from_pretrained).
        if hf_whisper_dir is None:
            raise FileNotFoundError(
                "codec checkpoint has no ssl.* weights; pass hf_whisper_dir "
                "(a local openai/whisper-large-v3 checkout)")
        sd = dict(sd)
        sd.update(load_hf_whisper_encoder_sd(hf_whisper_dir, prefix="ssl"))
    return convert_codec_state_dict(sd, cfg, dtype)


def load_hf_whisper_encoder_sd(model_dir: str, prefix: str = "ssl") -> dict:
    """Local HF whisper checkpoint -> reference-style `{prefix}.*` encoder
    state-dict entries (HF names 'model.encoder.X' / 'encoder.X' ->
    '{prefix}.X'; the per-tensor layouts are already identical)."""
    import os

    import torch

    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.torch import load_file

        sd = load_file(st_path)
    else:
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        for p in ("model.encoder.", "encoder."):
            if k.startswith(p):
                out[f"{prefix}." + k[len(p):]] = v
                break
    if not out:
        raise ValueError(f"no encoder.* tensors found in {model_dir}")
    return out


def find_hf_whisper_dir(pretrained_dir: str) -> Optional[str]:
    """Locate a local HF whisper checkout inside a pretrained dir (the
    official SSL-encoder weights; reference pulls openai/whisper-large-v3)."""
    import json as _json
    import os

    for name in sorted(os.listdir(pretrained_dir)):
        sub = os.path.join(pretrained_dir, name)
        cfg_path = os.path.join(sub, "config.json")
        if os.path.isdir(sub) and os.path.exists(cfg_path):
            try:
                with open(cfg_path) as f:
                    if _json.load(f).get("model_type") == "whisper":
                        return sub
            except (ValueError, OSError):
                continue
    return None


def save_params(path: str, params: Params) -> None:
    """Persist a converted tree with Orbax (so torch is a one-time cost)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Params) -> Params:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


def load_converted_lm(path: str, dtype=jnp.bfloat16) -> Params:
    """Load an LM tree persisted by the `convert` drill (DIR/jax/<name>)
    — the torch-free serving path (torch becomes a one-time cost). Float
    leaves cast to `dtype` (conversion is uniform-dtype, so this matches
    load_lm_checkpoint exactly when dtypes agree)."""
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(path)
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def load_converted_codec(path: str, dtype=jnp.float32) -> Params:
    """Load the `convert` drill's codec tree (DIR/jax/codec; saved fp32
    for cross-platform golden stability) with the same per-leaf dtype
    policy as convert_codec_state_dict: everything to `dtype` EXCEPT the
    RVQ subtree and the mel filterbank, which stay fp32 (the token-exact
    encode invariant needs the fp32 argmin)."""
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(path)

    def cast(sub):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, sub)

    return {k: (v if k in ("rvq", "mel_filters") else cast(v))
            for k, v in tree.items()}
