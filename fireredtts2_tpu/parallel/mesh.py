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
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp <= n, (dp, tp, n)
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


def lm_param_pspecs(params: Any) -> Any:
    """PartitionSpec tree matching an LM param tree (models/lm/model.py).

    Embeddings/heads are sharded on the vocab dim (pure lookups / final
    matmuls — no resharding needed mid-network).
    """
    t = _transformer_pspecs()

    def spec_for(path: tuple[str, ...], leaf) -> P:
        top = path[0]
        if top in ("backbone", "decoder"):
            return t[path[1]]
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


def lm_state_pspecs(state) -> Any:
    """LMState sharding: batch (stream) dim on dp; kv heads replicated.

    LMState fields: cache_k/cache_v (L, B, T, Hkv, Dh), slot_valid (B, T),
    pos (). The kv-head count of the flavors (2) is too small to shard on
    tp usefully; decode TP shards the projections instead.
    """
    from fireredtts2_tpu.models.lm.model import LMState

    return LMState(
        cache_k=P(None, "dp", None, None, None),
        cache_v=P(None, "dp", None, None, None),
        slot_valid=P("dp", None),
        pos=P("dp"),
    )


def to_named(mesh: Mesh, pspec_tree):
    return jax.tree.map(lambda p: NamedSharding(mesh, p), pspec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params, pspecs):
    shardings = to_named(mesh, pspecs)
    return jax.device_put(params, shardings)
