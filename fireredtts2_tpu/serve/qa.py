"""Quality assurance: audio validation, latency gates, automated test
pipeline.

Capability parity with the reference `quality_assurance_system.py`
(1256 LoC): AudioQualityValidator with threshold gates (:90-383),
SystemValidator (:729-1018), AutomatedTestingPipeline (:1019-1218), facade
(:1219). Thresholds follow the reference's test_config.json (e2e latency
≤ 2000 ms, SNR ≥ 20 dB, clipping ≤ 1%, etc.).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from fireredtts2_tpu.serve.monitor import analyze_audio_quality


@dataclass
class QAThresholds:
    """Gates from the reference's test_config.json:15-53."""
    max_e2e_latency_ms: float = 2000.0
    max_first_packet_ms: float = 200.0
    min_snr_db: float = 20.0
    max_clipping_ratio: float = 0.01
    max_silence_ratio: float = 0.8
    min_duration_s: float = 0.05
    min_rms: float = 1e-4
    quality_gate: float = 0.85          # fraction of checks that must pass


@dataclass
class QAReport:
    passed: bool
    score: float
    checks: dict[str, bool]
    metrics: dict
    failures: list[str] = field(default_factory=list)


def validate_audio_output(audio: np.ndarray, sample_rate: int = 24_000,
                          thresholds: Optional[QAThresholds] = None) -> QAReport:
    """Gate a synthesized waveform (reference AudioQualityValidator :90)."""
    th = thresholds or QAThresholds()
    m = analyze_audio_quality(audio, sample_rate)
    checks = {
        "nonempty": m.get("duration_s", 0) >= th.min_duration_s,
        "finite": bool(np.isfinite(audio).all()) if audio.size else False,
        "not_clipped": m.get("clipping_ratio", 1.0) <= th.max_clipping_ratio,
        "not_silent": m.get("silence_ratio", 1.0) <= th.max_silence_ratio,
        "audible": m.get("rms", 0.0) >= th.min_rms,
        "snr": m.get("snr_db", 0.0) >= th.min_snr_db or m.get("duration_s", 0) < 1.0,
    }
    score = sum(checks.values()) / len(checks)
    failures = [k for k, ok in checks.items() if not ok]
    return QAReport(passed=score >= th.quality_gate, score=score,
                    checks=checks, metrics=m, failures=failures)


@dataclass
class ScenarioResult:
    name: str
    passed: bool
    duration_s: float
    detail: str = ""


class QAPipeline:
    """End-to-end scenario runner against a live engine (reference
    end_to_end_system_validation.py scenarios + AutomatedTestingPipeline).

    Unlike the reference — whose suites mock the models entirely
    (SURVEY.md §4) — these scenarios execute the real engine.
    """

    def __init__(self, engine, thresholds: Optional[QAThresholds] = None):
        self.engine = engine
        self.th = thresholds or QAThresholds()

    def run_all(self) -> list[ScenarioResult]:
        out = []
        for name in ("basic_tts", "streaming", "dialogue",
                     "dialogue_streaming", "error_recovery"):
            out.append(self.run(name))
        return out

    def run(self, name: str) -> ScenarioResult:
        fn: Callable[[], str] = getattr(self, f"_scenario_{name}")
        t0 = time.perf_counter()
        try:
            detail = fn()
            return ScenarioResult(name, True, time.perf_counter() - t0, detail)
        except AssertionError as e:
            return ScenarioResult(name, False, time.perf_counter() - t0, str(e))

    # -- scenarios

    def _scenario_basic_tts(self) -> str:
        audio = self.engine.generate_monologue("Quality check sentence.")
        rep = validate_audio_output(audio, self.engine.output_sample_rate, self.th)
        assert rep.passed, f"audio gates failed: {rep.failures}"
        return f"{rep.metrics['duration_s']:.2f}s, score {rep.score:.2f}"

    def _scenario_streaming(self) -> str:
        t0 = time.perf_counter()
        chunks = []
        for c in self.engine.generate_stream("Streaming quality check.",
                                             "[S1]", [],
                                             max_audio_length_ms=2000):
            chunks.append(c)
        assert chunks, "no chunks emitted"
        fp = self.engine._first_packet_s
        assert fp is not None
        total = np.concatenate(chunks)
        rep = validate_audio_output(total, self.engine.output_sample_rate, self.th)
        assert rep.passed, f"stream audio gates failed: {rep.failures}"
        return f"first packet {fp*1000:.0f} ms, {len(chunks)} chunks"

    def _scenario_dialogue(self) -> str:
        audio = self.engine.generate_dialogue(
            ["[S1]Hello.", "[S2]Hi."], max_utterance_ms=1600)
        rep = validate_audio_output(audio, self.engine.output_sample_rate, self.th)
        assert rep.passed, f"dialogue gates failed: {rep.failures}"
        return f"{rep.metrics['duration_s']:.2f}s"

    def _scenario_dialogue_streaming(self) -> str:
        """Chunked incremental dialogue (engine.generate_dialogue_stream):
        both utterances must emit chunks and the whole waveform must pass
        the audio gates."""
        per_utt: dict[int, int] = {}
        chunks = []
        for i, c in self.engine.generate_dialogue_stream(
                ["[S1]Hello.", "[S2]Hi."], max_utterance_ms=1600):
            per_utt[i] = per_utt.get(i, 0) + 1
            chunks.append(c)
        assert set(per_utt) == {0, 1}, f"missing utterances: {per_utt}"
        total = np.concatenate(chunks)
        rep = validate_audio_output(total, self.engine.output_sample_rate,
                                    self.th)
        assert rep.passed, f"dialogue-stream gates failed: {rep.failures}"
        return (f"{rep.metrics['duration_s']:.2f}s, "
                f"chunks per utterance {dict(sorted(per_utt.items()))}")

    def _scenario_error_recovery(self) -> str:
        # hostile input must raise/deny cleanly, then a normal request works
        try:
            self.engine.generate("x" * 100_000, "[S1]", [],
                                 max_audio_length_ms=400)
            raise AssertionError("oversized prompt should have been rejected")
        except ValueError:
            pass
        audio = self.engine.generate("recovered fine", "[S1]", [],
                                     max_audio_length_ms=800)
        assert audio.size > 0
        return "rejected oversized prompt; recovered"


# ---------------------------------------------------------------------------
# Fidelity harness (WER / speaker similarity)
# ---------------------------------------------------------------------------
# BASELINE.md lists WER and speaker similarity as the reference's fidelity
# targets (its README eval table); the reference repo itself ships no WER
# harness. This one is pluggable: any Transcriber (e.g.
# fireredtts2_tpu.asr.WhisperASR.as_transcriber()) and any speaker-embedding
# callable. Real gates need real checkpoints — with random dev weights the
# numbers are reported, not gated.


def _edit_distance(a: list, b: list) -> int:
    """Levenshtein over token lists (iterative DP, O(len(a)*len(b)))."""
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def word_error_rate(reference: str, hypothesis: str) -> float:
    """WER = edit distance over reference words (standard definition)."""
    ref = reference.lower().split()
    hyp = hypothesis.lower().split()
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)


def char_error_rate(reference: str, hypothesis: str) -> float:
    ref = list(reference.lower().replace(" ", ""))
    hyp = list(hypothesis.lower().replace(" ", ""))
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)


def spectral_speaker_embedding(audio: np.ndarray,
                               sample_rate: int = 16_000) -> np.ndarray:
    """Signal-level speaker proxy: per-band log-energy statistics of the
    spectrum (mean + std over frames), L2-normalized. A stand-in with the
    right interface — swap in a trained speaker encoder for production
    gates."""
    n_fft, hop = 512, 160
    n = (len(audio) - n_fft) // hop + 1
    if n < 2:
        return np.zeros(2 * (n_fft // 2 + 1), np.float32)
    frames = np.lib.stride_tricks.sliding_window_view(
        audio, n_fft)[::hop][:n] * np.hanning(n_fft)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    loge = np.log(spec + 1e-8)
    emb = np.concatenate([loge.mean(0), loge.std(0)]).astype(np.float32)
    return emb / (np.linalg.norm(emb) + 1e-8)


def speaker_similarity(a: np.ndarray, b: np.ndarray,
                       sample_rate: int = 16_000,
                       embedder: Optional[Callable] = None) -> float:
    emb = embedder or spectral_speaker_embedding
    ea, eb = emb(a, sample_rate), emb(b, sample_rate)
    return float(np.dot(ea, eb) /
                 ((np.linalg.norm(ea) * np.linalg.norm(eb)) + 1e-8))


@dataclass
class FidelityReport:
    wer: float
    cer: float
    transcript: str
    speaker_sim: Optional[float] = None


class FidelityHarness:
    """Synthesize -> transcribe -> score (and optionally compare speaker
    identity against a prompt wav)."""

    def __init__(self, engine, transcriber: Callable[[np.ndarray], str],
                 embedder: Optional[Callable] = None):
        self.engine = engine
        self.transcriber = transcriber
        self.embedder = embedder

    def evaluate_utterance(self, text: str, speaker: str = "[S1]",
                           prompt_audio_16k: Optional[np.ndarray] = None,
                           audio: Optional[np.ndarray] = None) -> FidelityReport:
        """audio (if given) skips synthesis — lets callers score
        already-generated waveforms."""
        from fireredtts2_tpu.utils.audio_io import resample

        if audio is None:
            audio = self.engine.generate(text, speaker, [],
                                         max_audio_length_ms=30_000)
        audio16k = resample(audio.astype(np.float32),
                            self.engine.output_sample_rate, 16_000)
        hyp = self.transcriber(audio16k)
        rep = FidelityReport(wer=word_error_rate(text, hyp),
                             cer=char_error_rate(text, hyp), transcript=hyp)
        if prompt_audio_16k is not None:
            rep.speaker_sim = speaker_similarity(
                audio16k, prompt_audio_16k, embedder=self.embedder)
        return rep
