"""Worker for tests/test_distributed.py: one of two coordinated CPU
processes running the REAL multi-host training recipe (docs/training.md)
— jax.distributed bring-up, a global (dp=2, tp=4) mesh whose dp axis
spans the processes, per-process local batch shards assembled with
train.distributed.global_batch, and the sharded train step.

Not collected by pytest (leading underscore); invoked as
``python tests/_dist_worker.py <process_id> <port>``.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from fireredtts2_tpu.config import LLMConfig  # noqa: E402
from fireredtts2_tpu.models.lm.model import init_lm_params  # noqa: E402
from fireredtts2_tpu.parallel.mesh import make_mesh  # noqa: E402
from fireredtts2_tpu.train.distributed import (  # noqa: E402
    global_batch, initialize, process_shard,
)
from fireredtts2_tpu.train.step import (  # noqa: E402
    make_optimizer, make_sharded_train_step,
)

info = initialize(f"localhost:{port}", 2, pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

assert process_shard(["a", "b", "c", "d"]) == (
    ["a", "c"] if pid == 0 else ["b", "d"])

CFG = LLMConfig(backbone_flavor="tiny", decoder_flavor="tiny-deep",
                text_vocab_size=300, audio_vocab_size=64,
                audio_num_codebooks=4, max_seq_len=64, dtype="float32")

mesh = make_mesh(tp=4)  # dp=2 spans the two processes; tp=4 intra-process
params = init_lm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
opt = make_optimizer(peak_lr=3e-3, warmup_steps=2, total_steps=100)
step_fn, state = make_sharded_train_step(mesh, CFG, params, opt)

# Deterministic GLOBAL batch; each process feeds only ITS dp half.
rng = np.random.default_rng(0)
B, S, C = 4, 32, CFG.num_columns
tokens = np.zeros((B, S, C), np.int32)
mask = np.zeros((B, S, C), bool)
half = S // 2
tokens[:, :half, -1] = rng.integers(1, CFG.text_vocab_size, (B, half))
mask[:, :half, -1] = True
tokens[:, half:, :-1] = rng.integers(
    0, CFG.audio_vocab_size, (B, S - half, CFG.audio_num_codebooks))
mask[:, half:, :-1] = True

lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
losses = []
for i in range(3):
    tg = global_batch(mesh, P("dp", None, None), tokens[lo:hi])
    mg = global_batch(mesh, P("dp", None, None), mask[lo:hi])
    state, metrics = step_fn(state, tg, mg, jax.random.PRNGKey(i))
    losses.append(float(metrics["loss"]))

assert all(np.isfinite(losses)), losses
assert losses[-1] < losses[0], losses
print(f"WORKER_OK pid={pid} losses={','.join(f'{x:.6f}' for x in losses)}",
      flush=True)
