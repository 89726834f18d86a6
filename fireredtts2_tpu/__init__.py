"""FireRedTTS2-TPU: a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A from-scratch rebuild of the capabilities of the FireRedTTS-2 stack
(dual-transformer text-speech interleaved AR model over a 12.5 Hz RVQ
speech codec with a streaming Vocos/iSTFT vocoder), designed for TPU:

- all compute paths are jit-compiled, static-shape JAX with bfloat16
  matmuls on the MXU;
- KV caches are preallocated HBM ring/slab buffers (no dynamic concat);
- multi-chip scaling goes through ``jax.sharding.Mesh`` + NamedSharding
  (data axis for multi-stream serving, tensor axis for large backbones);
- the streaming vocoder is a ``(carry, token) -> (carry, audio)`` step
  function with fixed-shape caches so XLA compiles it once.

Reference capability surface: /root/reference (FireRedTTS2), see SURVEY.md.
"""

__version__ = "0.1.0"

import jax as _jax

# JAX's DEFAULT matmul precision may run fp32 operands through bf16 passes.
# "float32" makes fp32 math exact (codec numerics / parity) while bf16
# operands keep the fast single-pass MXU path — exactly the policy we want
# everywhere, so set it once at import.
_jax.config.update("jax_default_matmul_precision", "float32")

import os as _os

# Honor JAX_PLATFORMS even when a sitecustomize imported jax at interpreter
# start (which freezes the env-var platform default before any user code
# runs) — same fix as tests/conftest.py and __graft_entry__.py.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backends already initialized — too late to switch
        pass

# Persistent compilation cache: flagship-model compiles are minutes; cache
# them across processes (serving restarts, benches, tools). TPU-only:
# XLA:CPU entries are AOT-compiled for one host's exact CPU features
# (loading them elsewhere risks SIGILL, and the cache WRITE path has
# segfaulted mid-test on migrated VMs), and CPU compiles are cheap —
# tests/dev runs don't need a cross-process cache.

_cache_dir = _os.environ.get("FIREREDTTS2_JAX_CACHE", "/tmp/frtts2_jax_cache")
_platforms = (_os.environ.get("JAX_PLATFORMS")
              or getattr(_jax.config, "jax_platforms", None) or "")
if "cpu" not in _platforms:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass

from fireredtts2_tpu.config import (  # noqa: F401
    LLMConfig,
    TransformerConfig,
    CodecConfig,
    EngineConfig,
    FLAVORS,
)
