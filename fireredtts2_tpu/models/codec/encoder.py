"""Codec encoder side: SSL adaptor, acoustic encoder, GLU-conv downsample.

Capability parity with reference fireredtts2/codec/model.py:19-120:
- SslAdaptor: Linear in_proj -> whisper layers -> LN -> Linear out_proj
- ResidualDownConv: two stride-4 convs as GLU gate/up, residual with the
  4x-stacked input, LN, out_proj — 50 Hz -> 12.5 Hz.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import SslAdaptorConfig
from fireredtts2_tpu.models.codec.whisper_nn import (
    init_whisper_layers, whisper_layers_forward, layer_norm,
)

Params = dict[str, Any]


def init_ssl_adaptor(key: Array, cfg: SslAdaptorConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32) * 0.02).astype(dtype)

    return {
        "in_proj_w": w(ks[0], cfg.in_dim, cfg.embed_dim),
        "in_proj_b": jnp.zeros((cfg.embed_dim,), dtype),
        "layers": init_whisper_layers(ks[1], cfg.num_layers, cfg.embed_dim,
                                      cfg.resolved_ffn_dim, dtype),
        "ln_w": jnp.ones((cfg.embed_dim,), dtype),
        "ln_b": jnp.zeros((cfg.embed_dim,), dtype),
        "out_proj_w": w(ks[2], cfg.embed_dim, cfg.out_dim),
        "out_proj_b": jnp.zeros((cfg.out_dim,), dtype),
    }


def ssl_adaptor_forward(params: Params, cfg: SslAdaptorConfig,
                        x: Array, lengths: Array,
                        remat: Optional[str] = None) -> tuple[Array, Array]:
    """x: (B, T, in_dim) -> (B, T, out_dim) (reference codec/model.py:53-66)."""
    h = x @ params["in_proj_w"] + params["in_proj_b"]
    T = h.shape[1]
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    mask = valid[:, None, :] & jnp.ones((1, T, 1), bool)
    h, _ = whisper_layers_forward(params["layers"], cfg.num_heads, h, mask,
                                  remat=remat)
    h = layer_norm(h, params["ln_w"], params["ln_b"])
    return h @ params["out_proj_w"] + params["out_proj_b"], lengths


def init_down_conv(key: Array, embed_dim: int, factor: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    inter = embed_dim * factor

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    return {
        # stride-`factor` convs with kernel == stride: reshape-matmuls.
        # Torch layout (out, in, k).
        "gate_w": w(ks[0], inter, embed_dim, factor),
        "up_w": w(ks[1], inter, embed_dim, factor),
        "down_w": w(ks[2], inter, inter),
        "ln_w": jnp.ones((inter,), dtype), "ln_b": jnp.zeros((inter,), dtype),
        "out_w": w(ks[3], inter, embed_dim),
        "out_b": jnp.zeros((embed_dim,), dtype),
    }


def down_conv_forward(params: Params, factor: int, x: Array, lengths: Array
                      ) -> tuple[Array, Array]:
    """GLU downsample 50->12.5 Hz (reference ResidualDownConv,
    codec/model.py:107-120). x: (B, T, D) with T % factor == 0."""
    B, T, D = x.shape
    assert T % factor == 0, (T, factor)
    # Conv(k=s=factor) == fold `factor` frames then matmul.
    xf = x.reshape(B, T // factor, factor * D)
    # torch conv weight (out, in, k) consumes frames [t*f + j] via w[:, :, j];
    # xf packs them as [frame0 | frame1 | ...], i.e. j-major blocks of D.
    gw = params["gate_w"].transpose(2, 1, 0).reshape(factor * D, -1)
    uw = params["up_w"].transpose(2, 1, 0).reshape(factor * D, -1)
    g = xf @ gw.astype(x.dtype)
    u = xf @ uw.astype(x.dtype)
    c = (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u) @ params["down_w"]
    res = layer_norm(c + xf, params["ln_w"], params["ln_b"])
    out = res @ params["out_w"] + params["out_b"]
    return out, lengths // factor
