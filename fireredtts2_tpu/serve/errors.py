"""Error handling: exception taxonomy, retry with exponential backoff,
device-failure fallback, and a recovery-strategy registry.

Capability parity with the reference `error_handling_system.py`:
- typed exception hierarchy (:111-180);
- @handle_errors retry decorator with exponential backoff (:219-283);
- @gpu_safe device-OOM fallback (:285-311) — here a TPU-OOM guard that can
  shrink batch/bucket and retry;
- strategy registry retry/fallback/degrade/alert (:513-573) and a singleton
  manager (:317-338).
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from collections import deque
from typing import Callable, Optional

logger = logging.getLogger("fireredtts2_tpu")


# ---------------------------------------------------------------- taxonomy

class TTSError(Exception):
    """Base error; carries a category for routing to recovery strategies."""
    category = "general"


class ModelError(TTSError):
    category = "model"


class AudioProcessingError(TTSError):
    category = "audio"


class ValidationError(TTSError):
    category = "validation"


class ResourceExhaustedError(TTSError):
    """Device OOM / queue overflow."""
    category = "resource"


class NetworkError(TTSError):
    category = "network"


class SessionError(TTSError):
    category = "session"


def _is_device_oom(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return "resource_exhausted" in msg or "out of memory" in msg or "oom" in msg


# ---------------------------------------------------------------- retry

def handle_errors(max_retries: int = 3, backoff_base: float = 0.1,
                  backoff_factor: float = 2.0,
                  retry_on: tuple = (NetworkError, ResourceExhaustedError),
                  fallback: Optional[Callable] = None):
    """Retry decorator with exponential backoff (reference
    error_handling_system.py:219-283)."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            delay = backoff_base
            last: Optional[BaseException] = None
            for attempt in range(max_retries + 1):
                try:
                    return fn(*args, **kwargs)
                except retry_on as e:
                    last = e
                    get_error_manager().record(e)
                    if attempt == max_retries:
                        break
                    logger.warning("retry %d/%d after %s: %s",
                                   attempt + 1, max_retries, type(e).__name__, e)
                    time.sleep(delay)
                    delay *= backoff_factor
                except Exception as e:
                    get_error_manager().record(e)
                    raise
            if fallback is not None:
                return fallback(*args, **kwargs)
            raise last
        return wrapper
    return deco


def device_safe(reduce: Optional[Callable] = None, max_reductions: int = 2):
    """TPU-OOM guard (analog of the reference's @gpu_safe CUDA-OOM->CPU
    fallback, :285-311). On an OOM-looking failure, call `reduce()` (e.g.
    halve the batch / drop to a smaller bucket) and retry."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            for attempt in range(max_reductions + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:
                    if not _is_device_oom(e) or attempt == max_reductions:
                        raise
                    get_error_manager().record(
                        ResourceExhaustedError(str(e)))
                    logger.warning("device OOM; applying reduction %d", attempt + 1)
                    if reduce is not None:
                        reduce()
            raise RuntimeError("unreachable")
        return wrapper
    return deco


# ---------------------------------------------------------------- manager

class ErrorManager:
    """Error log + recovery strategies + health snapshot (reference
    singleton ErrorManager, :317-338)."""

    def __init__(self, window: int = 512):
        self._events: deque = deque(maxlen=window)
        self._lock = threading.Lock()
        self._strategies: dict[str, Callable[[BaseException], None]] = {}

    def record(self, exc: BaseException) -> None:
        cat = getattr(exc, "category", "general")
        with self._lock:
            self._events.append((time.time(), cat, type(exc).__name__, str(exc)[:200]))
        strategy = self._strategies.get(cat)
        if strategy is not None:
            try:
                strategy(exc)
            except Exception:  # a broken strategy must not cascade
                logger.exception("recovery strategy for %s failed", cat)

    def register_strategy(self, category: str,
                          fn: Callable[[BaseException], None]) -> None:
        self._strategies[category] = fn

    def health(self) -> dict:
        now = time.time()
        with self._lock:
            recent = [e for e in self._events if now - e[0] < 300]
            by_cat: dict[str, int] = {}
            for _, cat, _, _ in recent:
                by_cat[cat] = by_cat.get(cat, 0) + 1
        status = "healthy"
        if len(recent) > 50:
            status = "degraded"
        return {"status": status, "errors_5min": len(recent),
                "by_category": by_cat}


_MANAGER: Optional[ErrorManager] = None
_LOCK = threading.Lock()


def get_error_manager() -> ErrorManager:
    global _MANAGER
    with _LOCK:
        if _MANAGER is None:
            _MANAGER = ErrorManager()
        return _MANAGER
