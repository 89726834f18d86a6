"""Training loop + Orbax checkpoint/resume tests (tiny config, CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fireredtts2_tpu.config import LLMConfig
from fireredtts2_tpu.train.loop import (
    TrainConfig, train, synthetic_batches, jsonl_batches,
    save_checkpoint, latest_checkpoint, restore_checkpoint,
)
from fireredtts2_tpu.runtime.checkpoint import save_params, load_params
from fireredtts2_tpu.models.lm.model import init_lm_params

CFG = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                text_vocab_size=300, audio_vocab_size=64,
                audio_num_codebooks=4, max_seq_len=64, dtype="float32")


def test_train_runs_and_checkpoints(tmp_path):
    tcfg = TrainConfig(batch_size=4, seq_len=32, peak_lr=1e-3,
                       warmup_steps=2, total_steps=100,
                       checkpoint_every=5, checkpoint_dir=str(tmp_path / "ck"),
                       log_every=100, tp=2)
    logs = []
    state = train(CFG, tcfg, num_steps=6, log=logs.append)
    assert int(state.step) == 6
    latest = latest_checkpoint(str(tmp_path / "ck"))
    assert latest is not None and latest.endswith("step_00000006")

    # resume continues from the saved step
    state2 = train(CFG, tcfg, num_steps=2, log=logs.append)
    assert int(state2.step) == 8
    assert any("resumed" in l for l in logs)


def test_orbax_params_roundtrip(tmp_path):
    params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    path = str(tmp_path / "params_ck")
    save_params(path, params)
    like = jax.tree.map(jnp.zeros_like, params)
    restored = load_params(path, like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jsonl_batches(tmp_path):
    import json
    path = tmp_path / "data.jsonl"
    rows = []
    rng = np.random.default_rng(0)
    for _ in range(5):
        rows.append({
            "text_tokens": rng.integers(1, 300, 10).tolist(),
            "audio_tokens": rng.integers(0, 64, (12, 4)).tolist(),
        })
    path.write_text("\n".join(json.dumps(r) for r in rows))

    tcfg = TrainConfig(batch_size=2, seq_len=32)
    it = jsonl_batches(str(path), CFG, tcfg)
    tokens, mask = next(it)
    assert tokens.shape == (2, 32, 5)
    assert mask[:, :, -1].any() and mask[:, :, 0].any()
    # audio rows should carry all codebook columns
    audio_rows = mask[0, :, 0]
    assert (mask[0, audio_rows, :-1]).all()


def test_train_mixed_precision_eval_and_metrics(tmp_path):
    """bf16-compute/fp32-master step runs, eval loop fires, metrics stream
    to jsonl (ROADMAP item 12: mixed precision + eval + metrics)."""
    import json

    mpath = tmp_path / "metrics.jsonl"
    tcfg = TrainConfig(batch_size=4, seq_len=32, peak_lr=1e-3,
                       warmup_steps=2, total_steps=100, log_every=2,
                       mixed_precision=True, eval_every=2, eval_batches=2,
                       metrics_path=str(mpath), tp=2)
    state = train(CFG, tcfg, num_steps=4)
    assert int(state.step) == 4
    # master params stayed fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params)
               if hasattr(l, "dtype") and l.dtype.kind == "f")
    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    kinds = {r["kind"] for r in rows}
    assert "train" in kinds and "eval" in kinds
    ev = [r for r in rows if r["kind"] == "eval"][-1]
    assert np.isfinite(ev["eval_loss"])
    tr = [r for r in rows if r["kind"] == "train"][-1]
    assert np.isfinite(tr["loss"]) and np.isfinite(tr["grad_norm"])
