"""System monitoring loops: periodic health checks, service watchdog with
auto-recovery accounting.

Capability parity with the reference `system_monitoring.py` (913 LoC):
asyncio/thread loops for health + metrics + service watchdog (:222-240),
recovery-attempt tracking (:184-187), diagnostics snapshot (:770+).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from fireredtts2_tpu.serve.monitor import get_performance_monitor, device_memory_stats
from fireredtts2_tpu.serve.errors import get_error_manager


@dataclass
class ServiceSpec:
    name: str
    check: Callable[[], bool]                 # True = healthy
    recover: Optional[Callable[[], None]] = None
    max_recovery_attempts: int = 3


@dataclass
class ServiceStatus:
    healthy: bool = True
    last_check: float = 0.0
    consecutive_failures: int = 0
    recovery_attempts: int = 0
    last_error: str = ""


class Watchdog:
    """Threaded watchdog: polls service checks, attempts bounded recovery,
    exposes a diagnostics snapshot for /health consumers."""

    def __init__(self, interval_s: float = 10.0):
        self.interval_s = interval_s
        self._services: dict[str, ServiceSpec] = {}
        self._status: dict[str, ServiceStatus] = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self.started_at = time.time()

    def register(self, spec: ServiceSpec) -> None:
        with self._lock:
            self._services[spec.name] = spec
            self._status[spec.name] = ServiceStatus()

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def check_all(self) -> dict[str, ServiceStatus]:
        """One synchronous sweep (also used by the loop)."""
        with self._lock:
            items = list(self._services.items())
        for name, spec in items:
            st = self._status[name]
            st.last_check = time.time()
            try:
                ok = bool(spec.check())
            except Exception as e:
                ok = False
                st.last_error = f"{type(e).__name__}: {e}"
            if ok:
                st.healthy = True
                st.consecutive_failures = 0
                continue
            st.consecutive_failures += 1
            st.healthy = False
            if (spec.recover is not None
                    and st.recovery_attempts < spec.max_recovery_attempts):
                st.recovery_attempts += 1
                try:
                    spec.recover()
                except Exception as e:  # recovery failures are recorded
                    st.last_error = f"recover failed: {e}"
        return dict(self._status)

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            self.check_all()

    def diagnostics(self) -> dict:
        """Full snapshot: services + perf + errors + device memory
        (reference DiagnosticTools :770)."""
        return {
            "uptime_s": time.time() - self.started_at,
            "services": {
                n: {"healthy": s.healthy,
                    "consecutive_failures": s.consecutive_failures,
                    "recovery_attempts": s.recovery_attempts,
                    "last_error": s.last_error}
                for n, s in self._status.items()
            },
            "performance": get_performance_monitor().summary(),
            "errors": get_error_manager().health(),
            "device": device_memory_stats(),
        }
