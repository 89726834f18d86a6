"""HF Whisper checkpoint -> JAX params.

Covers two consumers:

- the ASR model (asr/model.py): full encoder-decoder from an HF
  `WhisperForConditionalGeneration` state dict (openai/whisper-*);
- the codec's frozen SSL encoder (models/codec/whisper_nn.py): the
  reference pulls whisper-large-v3's encoder via
  `PretrainedWhisperEncoder.from_pretrained`
  (reference fireredtts2/codec/whisper.py:333-361) — here the SAME
  conversion feeds `runtime/checkpoint.py`'s encoder params tree, so
  official weights load without a fireredtts2-specific repack.

HF naming (model.encoder.layers.{i}.self_attn.q_proj...) is identical to
the reference's re-implemented whisper modules, so the layer converter in
runtime/checkpoint.py is reused as-is.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from fireredtts2_tpu.asr.model import WhisperASRModelConfig
from fireredtts2_tpu.runtime.checkpoint import (
    _convert_whisper_layers, _conv1d_params, _t, _stack,
)

Params = dict[str, Any]


def _strip_prefix(sd: Mapping, prefix: str = "model.") -> dict:
    """HF WhisperForConditionalGeneration prepends 'model.'; plain
    WhisperModel does not. Accept both."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return dict(sd)


def convert_hf_whisper_encoder(sd: Mapping, num_layers: int,
                               dtype=jnp.float32) -> Params:
    """HF whisper state dict -> whisper_nn encoder params (conv frontend +
    stacked layers + final LN). Works for the ASR encoder AND as the
    official-weights path for the codec SSL encoder."""
    sd = _strip_prefix(sd)
    return {
        "conv1": _conv1d_params(sd, "encoder.conv1", dtype),
        "conv2": _conv1d_params(sd, "encoder.conv2", dtype),
        "pos": jnp.asarray(_t(sd["encoder.embed_positions.weight"])).astype(dtype),
        "layers": _convert_whisper_layers(sd, "encoder.layers", num_layers, dtype),
        "ln_w": jnp.asarray(_t(sd["encoder.layer_norm.weight"])).astype(dtype),
        "ln_b": jnp.asarray(_t(sd["encoder.layer_norm.bias"])).astype(dtype),
    }


def _convert_decoder_layers(sd: Mapping, L: int, dtype) -> Params:
    p = "decoder.layers"

    def pl(fmt, transpose=True):
        return [_t(sd[fmt.format(p=p, i=i)]).T if transpose
                else _t(sd[fmt.format(p=p, i=i)]) for i in range(L)]

    return {
        "self_wq": _stack(pl("{p}.{i}.self_attn.q_proj.weight"), dtype),
        "self_bq": _stack(pl("{p}.{i}.self_attn.q_proj.bias", False), dtype),
        "self_wk": _stack(pl("{p}.{i}.self_attn.k_proj.weight"), dtype),
        "self_wv": _stack(pl("{p}.{i}.self_attn.v_proj.weight"), dtype),
        "self_bv": _stack(pl("{p}.{i}.self_attn.v_proj.bias", False), dtype),
        "self_wo": _stack(pl("{p}.{i}.self_attn.out_proj.weight"), dtype),
        "self_bo": _stack(pl("{p}.{i}.self_attn.out_proj.bias", False), dtype),
        "self_ln_w": _stack(pl("{p}.{i}.self_attn_layer_norm.weight", False), dtype),
        "self_ln_b": _stack(pl("{p}.{i}.self_attn_layer_norm.bias", False), dtype),
        "cross_wq": _stack(pl("{p}.{i}.encoder_attn.q_proj.weight"), dtype),
        "cross_bq": _stack(pl("{p}.{i}.encoder_attn.q_proj.bias", False), dtype),
        "cross_wk": _stack(pl("{p}.{i}.encoder_attn.k_proj.weight"), dtype),
        "cross_wv": _stack(pl("{p}.{i}.encoder_attn.v_proj.weight"), dtype),
        "cross_bv": _stack(pl("{p}.{i}.encoder_attn.v_proj.bias", False), dtype),
        "cross_wo": _stack(pl("{p}.{i}.encoder_attn.out_proj.weight"), dtype),
        "cross_bo": _stack(pl("{p}.{i}.encoder_attn.out_proj.bias", False), dtype),
        "cross_ln_w": _stack(pl("{p}.{i}.encoder_attn_layer_norm.weight", False), dtype),
        "cross_ln_b": _stack(pl("{p}.{i}.encoder_attn_layer_norm.bias", False), dtype),
        "fc1_w": _stack(pl("{p}.{i}.fc1.weight"), dtype),
        "fc1_b": _stack(pl("{p}.{i}.fc1.bias", False), dtype),
        "fc2_w": _stack(pl("{p}.{i}.fc2.weight"), dtype),
        "fc2_b": _stack(pl("{p}.{i}.fc2.bias", False), dtype),
        "ffn_ln_w": _stack(pl("{p}.{i}.final_layer_norm.weight", False), dtype),
        "ffn_ln_b": _stack(pl("{p}.{i}.final_layer_norm.bias", False), dtype),
    }


def convert_hf_whisper(sd: Mapping, cfg: WhisperASRModelConfig,
                       dtype=jnp.float32) -> Params:
    """Full HF whisper state dict -> asr/model.py params tree."""
    sd = _strip_prefix(sd)
    return {
        "encoder": convert_hf_whisper_encoder(sd, cfg.encoder_layers, dtype),
        "decoder": {
            "layers": _convert_decoder_layers(sd, cfg.decoder_layers, dtype),
            "token_emb": jnp.asarray(
                _t(sd["decoder.embed_tokens.weight"])).astype(dtype),
            "pos_emb": jnp.asarray(
                _t(sd["decoder.embed_positions.weight"])).astype(dtype),
            "ln_w": jnp.asarray(_t(sd["decoder.layer_norm.weight"])).astype(dtype),
            "ln_b": jnp.asarray(_t(sd["decoder.layer_norm.bias"])).astype(dtype),
        },
    }


def asr_config_from_hf(hf_config) -> WhisperASRModelConfig:
    """HF WhisperConfig -> WhisperASRModelConfig (dims + token ids)."""
    return WhisperASRModelConfig(
        n_mels=hf_config.num_mel_bins,
        vocab_size=hf_config.vocab_size,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        embed_dim=hf_config.d_model,
        ffn_dim=hf_config.encoder_ffn_dim,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
        sot_id=hf_config.decoder_start_token_id,
        eot_id=hf_config.eos_token_id,
    )


def load_hf_whisper(model_dir: str, dtype=jnp.float32
                    ) -> tuple[Params, WhisperASRModelConfig]:
    """Load an HF whisper checkpoint directory (config.json +
    pytorch_model.bin / model.safetensors) into JAX params. Offline-only:
    reads local files, never downloads."""
    import json
    import os

    import torch

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

        def __getattr__(self, k):
            return None

    cfg = asr_config_from_hf(_Cfg(raw))

    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.torch import load_file
        sd = load_file(st_path)
    else:
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    sd = {k: v for k, v in sd.items()}
    return convert_hf_whisper(sd, cfg, dtype), cfg
