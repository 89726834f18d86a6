"""Device mesh and sharding rules.

The reference has no distributed layer at all (SURVEY.md §2.3: zero
torch.distributed imports; scale-out = HTTP clients on one GPU). Here
multi-chip scaling is first-class and expressed entirely through
`jax.sharding`:

- axis "dp": data/stream parallelism — batches of decode streams or
  training examples ride ICI with no weight communication;
- axis "tp": tensor parallelism — megatron-style column/row sharding of
  attention and MLP projections; XLA inserts the all-reduces.

Everything is NamedSharding over one Mesh; no hand-rolled collectives on
the model path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(
                f"tp={tp} does not divide the {n} visible device(s); "
                f"pass --tp that divides the device count (CPU tests use "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=8)")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"dp={dp} x tp={tp} exceeds the {n} visible "
                         f"device(s)")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _transformer_pspecs() -> dict[str, P]:
    """PartitionSpecs for a stacked transformer tree (leading L axis).

    Column-parallel (shard output features on tp): wq/wk/wv, w_gate, w_up.
    Row-parallel (shard input features): wo, w_down.
    Norms replicated.
    """
    return {
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(None, None, "tp"), "bk": P(None, "tp"),
        "wv": P(None, None, "tp"), "bv": P(None, "tp"),
        "wo": P(None, "tp", None),
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
        "attn_norm": P(), "mlp_norm": P(), "final_norm": P(),
    }


# Column-parallel matmuls (output features sharded on tp); their
# per-output-channel int8 scales ((L, 1, O), transformer.py:95) shard on
# the same last axis. Row-parallel scales stay replicated: the scale
# multiply happens AFTER the partial-sum all-reduce, where the activation
# is already replicated.
_COL_KEYS = ("wq", "wk", "wv", "w_gate", "w_up")


def lm_param_pspecs(params: Any) -> Any:
    """PartitionSpec tree matching an LM param tree (models/lm/model.py).

    Embeddings/heads are sharded on the vocab dim (pure lookups / final
    matmuls — no resharding needed mid-network). Handles the serving
    transforms too: weight-only int8 trees (`*_scale` leaves,
    transformer.py:83), and the fused depth-chain bundle (`depth_chain`,
    ops/pallas_depth.py:233), which stays replicated — the Pallas kernel
    is a single-core program; the backbone is where the tp FLOPs are.
    """
    t = _transformer_pspecs()

    def spec_for(path: tuple[str, ...], leaf) -> P:
        top = path[0]
        if top in ("backbone", "decoder"):
            key = path[1]
            if key in t:
                return t[key]
            if key.endswith("_scale"):
                base = key[: -len("_scale")]
                if base in _COL_KEYS and hasattr(leaf, "ndim"):
                    return P(*([None] * (leaf.ndim - 1) + ["tp"]))
                return P()
            return P()  # packed int4 / unknown serving leaves: replicate
        if top in ("text_embeddings", "audio_embeddings"):
            return P("tp", None)
        if top == "codebook0_head" or top == "text_head":
            return P(None, "tp")
        if top == "projection":
            return P()
        if top == "audio_head":
            return P(None, None, "tp")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: spec_for(tuple(k.key for k in kp), leaf), params)


# Whisper-style stacked layer trees (models/codec/whisper_nn.py:45,
# asr/model.py:73): attention (+ optional cross-attention) + GELU MLP
# with (L, in, out) matmuls.
_WHISPER_COL = ("wq", "wk", "wv", "fc1_w", "cross_wq", "cross_wk",
                "cross_wv", "self_wq", "self_wk", "self_wv")
_WHISPER_ROW = ("wo", "fc2_w", "cross_wo", "self_wo")
_WHISPER_COL_BIAS = ("bq", "bv", "fc1_b", "cross_bq", "cross_bv",
                     "self_bq", "self_bv")


def _whisper_layer_spec(key: str, leaf) -> P:
    """Megatron split for one leaf of a whisper-style layer stack:
    column-parallel q/k/v + MLP-in (output features on tp, biases too),
    row-parallel out-proj + MLP-out (input features on tp; biases applied
    after the all-reduce, replicated). int8 `*_scale` leaves follow their
    column-parallel weights on the last axis."""
    if key in _WHISPER_COL:
        return P(None, None, "tp")
    if key in _WHISPER_ROW:
        return P(None, "tp", None)
    if key in _WHISPER_COL_BIAS:
        return P(None, "tp")
    if key.endswith("_scale"):
        base = key[: -len("_scale")]
        if base in _WHISPER_COL and hasattr(leaf, "ndim"):
            return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def codec_param_pspecs(params: Any) -> Any:
    """PartitionSpec tree for a codec param tree (models/codec/model.py:48).

    The whisper-style transformer stacks (SSL/acoustic encoders, adaptors,
    and the ACOUSTIC DECODER — the per-frame vocoder cost in serving)
    shard Megatron-style over tp; convs, RVQ codebooks, norms and heads
    are small and stay replicated. int8 `*_scale` leaves
    (whisper_nn.py:quantize_whisper_layers_int8) follow their weights.
    """
    def spec_for(path: tuple[str, ...], leaf) -> P:
        if len(path) >= 2 and path[-2] == "layers":
            return _whisper_layer_spec(path[-1], leaf)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: spec_for(tuple(k.key for k in kp), leaf), params)


def asr_param_pspecs(params: Any) -> Any:
    """PartitionSpec tree for a whisper ASR param tree (asr/model.py:108):
    encoder/decoder layer stacks Megatron-split (incl. cross-attention);
    the token embedding — also the tied logits matrix — shards on the
    vocab dim; convs/norms/positional tables replicate."""
    def spec_for(path: tuple[str, ...], leaf) -> P:
        if len(path) >= 2 and path[-2] == "layers":
            return _whisper_layer_spec(path[-1], leaf)
        if path[-1] == "token_emb":
            return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: spec_for(tuple(k.key for k in kp), leaf), params)


def sanitize_pspecs(mesh: Mesh, tree: Any, pspecs: Any) -> Any:
    """Downgrade any sharded axis that does not evenly divide its array
    dim to replicated. Sharding is semantics-preserving under GSPMD, so
    dropping an axis never changes results — it only keeps device_put
    legal for trees the hand-written rules didn't anticipate (quantized
    scales of size-1 dims, tiny test configs, B=1 engine states on a
    dp>1 mesh)."""
    def fix(leaf, spec: P) -> P:
        if not hasattr(leaf, "shape"):
            return spec
        names = list(spec) + [None] * (len(leaf.shape) - len(spec))
        out = []
        for dim, name in zip(leaf.shape, names):
            size = 1
            for ax in ((name,) if isinstance(name, str) else (name or ())):
                size *= mesh.shape[ax]
            out.append(name if size > 0 and dim % size == 0 else None)
        return P(*out)

    return jax.tree.map(fix, tree, pspecs,
                        is_leaf=lambda x: isinstance(x, P))


def zero1_pspecs(mesh: Mesh, params: Any, pspecs: Any) -> Any:
    """ZeRO-1 shardings for optimizer-moment trees (AdamW mu/nu).

    The moments are updated ELEMENTWISE, so any partitioning is valid —
    unlike the weights, they are never contracted against activations.
    Replicating them across dp wastes 8 bytes/param/chip (fp32 mu + nu);
    this augments each param's tp spec with "dp" on the first axis that
    dp divides and tp left unsharded (the leading stacked-L axis for
    transformer weights), so each dp rank holds 1/dp of the moments.
    GSPMD then reduce-scatters the grads into the sharded update and
    all-gathers the applied deltas — the same bytes as the all-reduce it
    replaces, but 2x params x fp32 less HBM per chip.

    Leaves that dp cannot divide (scalars, tiny norms) stay on their
    param spec: correctness never depends on the augmentation.
    """
    dp = mesh.shape["dp"]

    def aug(spec: P, leaf) -> P:
        if dp <= 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
            return spec
        names = list(spec) + [None] * (leaf.ndim - len(spec))
        for i, (dim, name) in enumerate(zip(leaf.shape, names)):
            if name is None and dim % dp == 0 and dim >= dp:
                names[i] = "dp"
                return P(*names)
        return spec

    return jax.tree.map(aug, pspecs, params,
                        is_leaf=lambda x: isinstance(x, P))


def lm_state_pspecs(state) -> Any:
    """LMState sharding: batch (stream) dim on dp; kv heads replicated.

    LMState fields: cache_k/cache_v (L, B, T, Hkv*Dh), slot_valid (B, T),
    pos (). The kv-head count of the flavors (2) is too small to shard on
    tp usefully; decode TP shards the projections instead.
    """
    from fireredtts2_tpu.models.lm.model import LMState

    return LMState(
        cache_k=P(None, "dp", None, None),
        cache_v=P(None, "dp", None, None),
        slot_valid=P("dp", None),
        pos=P("dp"),
    )


def vocoder_state_pspecs(state) -> Any:
    """VocoderStreamState sharding: stream (batch) dims on dp; the KV
    slabs ADDITIONALLY column-shard their merged head dim over tp — the
    vocoder is MHA, so each tp shard owns whole heads and the flash write
    kernel's in-kernel DMAs land exclusively in the shard's own columns
    (ops/pallas_flash.py:flash_decode_update_bounded_shard, VERDICT r4
    #4). Conv/iSTFT caches are small and stay tp-replicated.

    Fields (models/codec/decoder.py:VocoderStreamState): up1/up2/in_proj
    caches (B, D, k), rb_caches (4, 2, B, D, 2), kv_k/kv_v
    (L, B, T, H*Dh), istft_cache (B, n_fft, 3), pos (B,)."""
    from fireredtts2_tpu.models.codec.decoder import VocoderStreamState

    return VocoderStreamState(
        up1_cache=P("dp", None, None),
        up2_cache=P("dp", None, None),
        in_proj_cache=P("dp", None, None),
        rb_caches=P(None, None, "dp", None, None),
        kv_k=P(None, "dp", None, "tp"),
        kv_v=P(None, "dp", None, "tp"),
        istft_cache=P("dp", None, None),
        pos=P("dp"),
    )


def to_named(mesh: Mesh, pspec_tree):
    return jax.tree.map(lambda p: NamedSharding(mesh, p), pspec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params, pspecs):
    shardings = to_named(mesh, pspecs)
    return jax.device_put(params, shardings)


# ---------------------------------------------------------------------------
# Serving-mesh context: lets mesh-agnostic model code (the transformer's
# decode attention) reach the engine's mesh to shard_map a Pallas kernel
# (ops/pallas_flash.py:flash_decode_gqa1_shard — XLA cannot auto-partition
# custom calls, VERDICT r3 #6). Set at engine construction, captured at
# TRACE time by the jitted programs; None = single-device serving.
# ---------------------------------------------------------------------------

_SERVING_MESH: Mesh | None = None


def set_serving_mesh(mesh: Mesh | None) -> None:
    global _SERVING_MESH
    _SERVING_MESH = mesh


def serving_mesh() -> Mesh | None:
    return _SERVING_MESH
