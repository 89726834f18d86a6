"""Tests for the security and error-handling subsystems."""

import time

import pytest

from fireredtts2_tpu.serve.security import (
    validate_text_input, validate_audio_upload, RateLimiter,
    TokenAuthenticator, create_security_system,
)
from fireredtts2_tpu.serve.errors import (
    handle_errors, device_safe, NetworkError, ValidationError,
    get_error_manager, ErrorManager,
)


# ---------------------------------------------------------------- security

def test_text_validation_accepts_normal():
    assert validate_text_input("Hello, world! 你好。").ok
    assert validate_text_input("Line one.\nLine two.").ok


@pytest.mark.parametrize("bad", [
    "",
    "   ",
    "a" * 10_001,
    "'; DROP TABLE users; --",
    "<script>alert(1)</script>",
    "see ../../etc/passwd",
    "x; rm -rf /",
    "javascript:void(0)",
    "null\x00byte",
])
def test_text_validation_rejects_hostile(bad):
    assert not validate_text_input(bad).ok


def test_audio_upload_validation():
    wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"\x00" * 100
    assert validate_audio_upload(wav).ok
    assert validate_audio_upload(b"fLaC" + b"\x00" * 100).ok
    assert not validate_audio_upload(b"MZ\x90\x00" + b"\x00" * 100).ok
    assert not validate_audio_upload(b"RIFF", max_bytes=2).ok


def test_rate_limiter_window():
    rl = RateLimiter(max_requests=3, window_seconds=10.0)
    t = 100.0
    assert all(rl.allow("c", t + i) for i in range(3))
    assert not rl.allow("c", t + 3)
    assert rl.allow("other", t + 3)        # per-client isolation
    assert rl.allow("c", t + 11)           # window slid


def test_token_auth_roundtrip_and_tamper():
    auth = TokenAuthenticator(ttl_seconds=60)
    tok = auth.issue("client-1")
    assert auth.verify(tok) == "client-1"
    assert auth.verify(tok + "x") is None
    assert auth.verify(tok.replace("client-1", "client-2")) is None
    expired = auth.issue("c", now=time.time() - 7200)
    assert auth.verify(expired) is None


def test_security_facade():
    sec = create_security_system()
    ok = sec.check_request("c1", "Hello there")
    assert ok.ok
    bad = sec.check_request("c1", "<script>x</script>")
    assert not bad.ok
    sec2 = create_security_system(require_auth=True)
    assert not sec2.check_request("c1", "hi").ok
    tok = sec2.auth.issue("c1")
    assert sec2.check_request("c1", "hi", token=tok).ok


# ---------------------------------------------------------------- errors

def test_retry_decorator_eventually_succeeds():
    calls = {"n": 0}

    @handle_errors(max_retries=3, backoff_base=0.001)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise NetworkError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_decorator_fallback():
    @handle_errors(max_retries=1, backoff_base=0.001,
                   fallback=lambda: "fallback")
    def always_fails():
        raise NetworkError("down")

    assert always_fails() == "fallback"


def test_retry_does_not_swallow_other_errors():
    @handle_errors(max_retries=2, backoff_base=0.001)
    def boom():
        raise ValidationError("bad input")

    with pytest.raises(ValidationError):
        boom()


def test_device_safe_applies_reduction():
    state = {"batch": 8, "calls": 0}

    def reduce():
        state["batch"] //= 2

    @device_safe(reduce=reduce, max_reductions=3)
    def step():
        state["calls"] += 1
        if state["batch"] > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on TPU")
        return state["batch"]

    assert step() == 2
    assert state["calls"] == 3


def test_error_manager_health():
    mgr = ErrorManager()
    for _ in range(3):
        mgr.record(NetworkError("x"))
    h = mgr.health()
    assert h["status"] == "healthy"
    assert h["by_category"]["network"] == 3
    hits = {"n": 0}
    mgr.register_strategy("network", lambda e: hits.__setitem__("n", hits["n"] + 1))
    mgr.record(NetworkError("y"))
    assert hits["n"] == 1


def test_global_error_manager_singleton():
    assert get_error_manager() is get_error_manager()
