"""Residual vector quantization (encode to codes / decode to embeddings).

Capability parity with the reference ResidualVQ (fireredtts2/codec/rvq.py):
- per-quantizer 1x1-conv in/out projections (weight-normed in torch; the
  checkpoint converter folds g*v/||v|| into a plain matrix here);
- fp32-forced L2-distance argmin (rvq.py:62-79);
- decode = output_proj( Σ_i out_project_i(codebook_i[idx_i]) ) (rvq.py:145-164).

TPU-first: all quantizers' codebooks/projections are STACKED (nq leading
axis); encode runs the residual chain as a lax.scan; distances hit the MXU
as one (B*T, cb_dim) x (cb_dim, cb_size) matmul per quantizer step.
Layout is (B, T, D) throughout (channel-last is the friendly TPU layout).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from fireredtts2_tpu.config import RVQConfig
from fireredtts2_tpu.ops.precision import peinsum

Params = dict[str, Any]


def init_rvq_params(key: Array, cfg: RVQConfig, dtype=jnp.float32) -> Params:
    nq = cfg.num_quantizers
    rd, cd, cs = cfg.resolved_rvq_dim, cfg.codebook_dim, cfg.codebook_size
    ks = jax.random.split(key, 6)

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    p: Params = {
        # (nq, cb_size, cb_dim) codebooks, fp32 (distance math is fp32-forced)
        "codebook": jax.random.normal(ks[0], (nq, cs, cd), jnp.float32) * 0.02,
        # stacked per-quantizer projections (1x1 conv == matmul)
        "in_proj_w": w(ks[1], nq, rd, cd),
        "in_proj_b": jnp.zeros((nq, cd), jnp.float32),
        "out_proj_w": w(ks[2], nq, cd, rd),
        "out_proj_b": jnp.zeros((nq, rd), jnp.float32),
    }
    if cfg.input_dim != cfg.resolved_rvq_dim:
        p["input_proj_w"] = w(ks[3], cfg.input_dim, rd)
        p["input_proj_b"] = jnp.zeros((rd,), jnp.float32)
    if cfg.resolved_output_dim != cfg.resolved_rvq_dim:
        p["output_proj_w"] = w(ks[4], rd, cfg.resolved_output_dim)
        p["output_proj_b"] = jnp.zeros((cfg.resolved_output_dim,), jnp.float32)
    return p


def _nearest_code(z_e: Array, codebook: Array) -> Array:
    """z_e: (B, T, cb_dim) fp32; codebook: (cb_size, cb_dim) fp32 -> (B, T) int32.

    argmin over ||z - c||^2 = z.z - 2 z.c + c.c (reference rvq.py:71-78).
    """
    z2 = jnp.sum(z_e * z_e, axis=-1, keepdims=True)             # (B, T, 1)
    zc = peinsum("btd,cd->btc", z_e, codebook)                  # (B, T, cs)
    c2 = jnp.sum(codebook * codebook, axis=-1)[None, None, :]   # (1, 1, cs)
    dist = z2 - 2.0 * zc + c2
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def rvq_encode(params: Params, cfg: RVQConfig, z: Array) -> Array:
    """Quantize features to codes.

    Args:
        z: (B, T, input_dim).
    Returns:
        codes: (nq, B, T) int32 — same layout as reference encode_codes.
    """
    z = z.astype(jnp.float32)
    if "input_proj_w" in params:
        z = z @ params["input_proj_w"] + params["input_proj_b"]

    def step(residual, qp):
        # qp: per-quantizer slice of stacked params
        z_e = residual @ qp["in_proj_w"] + qp["in_proj_b"]       # (B, T, cd)
        idx = _nearest_code(z_e, qp["codebook"])                 # (B, T)
        z_q = qp["codebook"][idx]                                # (B, T, cd)
        recon = z_q @ qp["out_proj_w"] + qp["out_proj_b"]        # (B, T, rd)
        return residual - recon, idx

    qparams = {k: params[k] for k in
               ("codebook", "in_proj_w", "in_proj_b", "out_proj_w", "out_proj_b")}
    _, codes = jax.lax.scan(step, z, qparams)
    return codes  # (nq, B, T)


def rvq_decode(params: Params, cfg: RVQConfig, codes: Array) -> Array:
    """Codes (nq, B, T) -> features (B, T, output_dim), fp32.

    Σ over quantizers of out_project(codebook[code]) then output_proj
    (reference rvq.py:145-164). One gather + einsum per quantizer, done
    as a vectorized contraction over the stacked axis.
    """
    nq = codes.shape[0]
    cb = params["codebook"][:nq]                                  # (nq, cs, cd)
    # Per-quantizer codebook lookup: (nq, B, T, cd)
    emb = jax.vmap(lambda c, idx: c[idx])(cb, codes)
    # Per-quantizer out projection then sum: (B, T, rd)
    out = peinsum("qbtc,qcr->btr", emb, params["out_proj_w"][:nq])
    out = out + jnp.sum(params["out_proj_b"][:nq], axis=0)[None, None, :]
    if "output_proj_w" in params:
        out = out @ params["output_proj_w"] + params["output_proj_b"]
    return out
