"""Comm-pattern guard for sharded serving (VERDICT r4 weak #3 / next #7):
the per-frame decode under a (dp=2, tp=4) mesh must not all-gather a full
KV slab — correctness tests can't catch a change that silently degrades
the sharded decode to replicated attention (the audio stays right, the
ICI bill explodes). This lowers the REAL serving block program with its
sharded state and asserts no all-gather instruction materializes a
slab-sized buffer."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.parallel.mesh import make_mesh

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8, "c64": 8}


def _allgather_sizes(hlo_text: str) -> list[tuple[str, int]]:
    """(shape string, bytes) of every all-gather RESULT in the module.
    Tuple-shaped results contribute their largest element."""
    out = []
    for m in re.finditer(r"=\s*((?:\([^)]*\)|\S+))\s+all-gather", hlo_text):
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", m.group(1))
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            out.append((f"{dt}[{dims}]", n * _DTYPE_BYTES.get(dt, 4)))
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_block_decode_has_no_full_slab_allgather(monkeypatch):
    """Lower the serving block program (LM frame + vocoder chunk fused,
    models/pipeline.py) under (dp=2, tp=4) with the engine's real sharded
    state and check the compiled HLO: every all-gather must stay well
    under the KV slabs' size. A future change that routes the Pallas
    kernels around shard_map — or re-shards the slab per frame — fails
    here, not in production."""
    monkeypatch.setenv("FRTTS2_FLASH_LM", "interpret")
    monkeypatch.setenv("FRTTS2_FLASH_VOC", "interpret")
    mesh = make_mesh(dp=2, tp=4)
    engine = FireRedTTS2Engine(config=tiny_engine_config(depth_topk=1),
                               seed=0, mesh=mesh)
    B = 2
    state = engine._new_lm_state(B)
    vstate = engine._new_vstate(B)
    ncb = engine.config.llm.audio_num_codebooks
    frame = jnp.zeros((B, ncb), jnp.int32)
    emitted = jnp.zeros((B,), jnp.int32)

    lowered = engine._block_fn.lower(
        engine.lm_params, engine.codec_params, state=state, vstate=vstate,
        frame=frame, emitted=emitted, key=jax.random.PRNGKey(0),
        t_base=jnp.int32(1), block=1, temperature=0.9, topk=1,
        depth_topk=1, depth_temperature=0.75)
    txt = lowered.compile().as_text()

    lm_slab = int(np.asarray(state.cache_k).nbytes)
    voc_slab = int(np.asarray(vstate.kv_k).nbytes)
    # Bar: no all-gather result may reach 25% of either full slab — a
    # replicating degradation gathers 100% (or the 50% dp complement).
    bar = max(min(lm_slab, voc_slab) // 4, 1)
    offenders = [(s, b) for s, b in _allgather_sizes(txt) if b >= bar]
    assert not offenders, (
        f"slab-scale all-gather in the sharded decode (bar {bar} B, "
        f"lm_slab {lm_slab} B, voc_slab {voc_slab} B): {offenders}")
