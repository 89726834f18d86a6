"""Multi-host training bring-up, tested FOR REAL with two coordinated CPU
processes (tests/_dist_worker.py): jax.distributed initialize, a global
(dp=2, tp=4) mesh with dp spanning processes, per-process batch shards,
and the sharded train step — the exact recipe docs/training.md prescribes
for TPU pods. Both workers must see identical (replicated) losses."""

import os
import socket
import subprocess
import sys

from fireredtts2_tpu.train.distributed import process_shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_process_shard_explicit():
    assert process_shard(list("abcde"), 0, 2) == ["a", "c", "e"]
    assert process_shard(list("abcde"), 1, 2) == ["b", "d"]
    assert process_shard([], 0, 2) == []


def test_two_process_training():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out, out[-3000:]

    # Losses are replicated across the mesh: both processes must report
    # bit-identical values.
    def losses(out):
        line = [ln for ln in out.splitlines() if "WORKER_OK" in ln][0]
        return line.split("losses=")[1]

    assert losses(outs[0]) == losses(outs[1]), (outs[0][-400:], outs[1][-400:])
