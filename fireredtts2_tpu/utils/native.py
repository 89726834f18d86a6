"""ctypes bindings for the native host-side audio kernels
(native/audio_kernels.cpp), with transparent numpy/scipy fallback.

The native path exists for the serving hot loop (per-chunk PCM packing and
24k->16k context resampling); everything degrades gracefully to
scipy/numpy when the .so hasn't been built (`sh native/build.sh`).
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libfrtts_audio.so")


def _build() -> None:
    """Best-effort lazy build (the .so is a build artifact, not checked
    in). Serving falls back to scipy/numpy when g++ or the source tree
    is unavailable (pip-installed package without native/)."""
    script = os.path.join(os.path.dirname(_SO_PATH), "build.sh")
    if not os.path.exists(script):
        return
    import subprocess
    try:
        subprocess.run(["sh", script], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        _build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.frtts_resample_out_len.restype = ctypes.c_longlong
        lib.frtts_resample_out_len.argtypes = [ctypes.c_longlong] * 3
        lib.frtts_resample_poly.restype = None
        lib.frtts_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_double,
        ]
        lib.frtts_f32_to_pcm16.restype = None
        lib.frtts_f32_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16),
            ctypes.c_longlong]
        lib.frtts_pcm16_to_f32.restype = None
        lib.frtts_pcm16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def resample(audio: np.ndarray, src_rate: int, dst_rate: int,
             half_width: int = 16, beta: float = 8.555) -> np.ndarray:
    """Rational polyphase resample; native when built, scipy otherwise."""
    if src_rate == dst_rate:
        return np.asarray(audio, np.float32)
    lib = _load()
    if lib is None:
        from fireredtts2_tpu.utils.audio_io import resample as sp_resample
        return sp_resample(audio, src_rate, dst_rate)
    g = math.gcd(src_rate, dst_rate)
    up, down = dst_rate // g, src_rate // g
    x = np.ascontiguousarray(audio, np.float32)
    n_out = lib.frtts_resample_out_len(len(x), up, down)
    y = np.empty(n_out, np.float32)
    lib.frtts_resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), up, down,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        half_width, beta)
    return y


def f32_to_pcm16(audio: np.ndarray) -> bytes:
    x = np.ascontiguousarray(audio, np.float32)
    lib = _load()
    if lib is None:
        return (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()
    y = np.empty(len(x), np.int16)
    lib.frtts_f32_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x))
    return y.tobytes()


def pcm16_to_f32(data: bytes) -> np.ndarray:
    x = np.frombuffer(data, dtype="<i2")
    lib = _load()
    if lib is None:
        return (x.astype(np.float32) / 32768.0)
    xc = np.ascontiguousarray(x)
    y = np.empty(len(xc), np.float32)
    lib.frtts_pcm16_to_f32(
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(xc))
    return y
