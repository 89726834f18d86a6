"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4 lesson)."""

import os

# Must be set before jax is imported anywhere. FORCE cpu: the environment
# ships JAX_PLATFORMS=axon (the TPU tunnel), and tests must not contend for
# the single TPU chip — they run on an 8-device virtual CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, freezing the
# env-var default (JAX_PLATFORMS=axon) into jax's config before this
# conftest runs — update the config explicitly too.
jax.config.update("jax_platforms", "cpu")

import socket  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def free_port() -> int:
    """OS-assigned free TCP port (bind 0, read, close). Server tests use
    this instead of fixed ports so the suite is safe under pytest-xdist
    (workers run test files concurrently) and under repeated runs in one
    session (no TIME_WAIT collisions)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module. A full-suite
    process accumulates hundreds of XLA:CPU programs and has segfaulted
    inside later compiles (backend_compile_and_load) on hosts whose CPU
    differs from the image's build machine; per-module cache clearing
    keeps the live-executable footprint bounded. Tests share almost no
    compiled programs across modules (each builds its own engines), so
    this costs little."""
    yield
    jax.clear_caches()
