"""Native C++ audio kernel tests (ctypes bindings with numpy fallback)."""

import subprocess
import os

import numpy as np
import pytest

from fireredtts2_tpu.utils import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    so = os.path.join(REPO, "native", "libfrtts_audio.so")
    if not os.path.exists(so):
        subprocess.run(["sh", os.path.join(REPO, "native", "build.sh")],
                       check=True, capture_output=True)
    # reset the lazy loader in case a previous test ran without the lib
    native._TRIED = False
    native._LIB = None


def test_native_resample_matches_scipy():
    from scipy.signal import resample_poly

    t = np.arange(24000) / 24000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    y = native.resample(x, 24000, 16000)
    ys = resample_poly(x.astype(np.float64), 2, 3).astype(np.float32)
    assert len(y) == len(ys)
    err = np.abs(y[200:-200] - ys[200:-200]).max()
    assert err < 5e-3, err


def test_native_pcm_roundtrip(rng):
    x = (rng.standard_normal(4096) * 0.5).clip(-1, 1).astype(np.float32)
    pcm = native.f32_to_pcm16(x)
    assert len(pcm) == 2 * len(x)
    x2 = native.pcm16_to_f32(pcm)
    assert np.abs(x2 - x).max() < 1e-4


def test_pcm_clips_out_of_range():
    x = np.array([2.0, -2.0, 0.5], np.float32)
    pcm = np.frombuffer(native.f32_to_pcm16(x), dtype="<i2")
    assert pcm[0] == 32767 and pcm[1] in (-32767, -32768)


def test_fallback_without_lib(monkeypatch, rng):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    y = native.resample(x, 24000, 16000)
    assert y.shape[0] > 0
    assert native.pcm16_to_f32(native.f32_to_pcm16(x)).shape == x.shape
