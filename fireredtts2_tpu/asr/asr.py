"""Whisper ASR service layer: transcribe / language-detect / streaming.

Capability parity with the reference's `WhisperASR` + `StreamingWhisperASR`
(reference whisper_asr.py:56-357, 360-511): preprocessing (mono, fp32,
resample to 16 kHz, normalize, 30 s trim), warmup, greedy transcription
with confidence from mean token logprob, no-speech gating, language
detection, perf stats, and a background streaming loop with overlapping
chunks + rolling context. The model underneath is the native JAX whisper
(asr/model.py) instead of the `openai-whisper` torch package, so the whole
ASR path runs on TPU inside single compiled programs.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fireredtts2_tpu.asr.model import (
    WhisperASRModelConfig, init_asr_params, asr_greedy_decode,
    asr_beam_decode, asr_sample_best_of, asr_alignment_probs,
    asr_detect_language, TINY_ASR,
)
from fireredtts2_tpu.asr.timestamps import (
    default_alignment_heads, word_timestamps_from_alignment,
)
from fireredtts2_tpu.ops.audio import whisper_mel_filters, log_mel_spectrogram
from fireredtts2_tpu.utils.audio_io import resample

# Whisper's language inventory, in the model's language-token order
# (<|en|> is first_language_id; public whisper tokenizer table).
LANGUAGES: List[str] = [
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
]


@dataclass
class TranscriptionResult:
    """Mirror of reference TranscriptionResult (whisper_asr.py:24-35)."""
    text: str
    confidence: float
    language: str
    start_time: float
    end_time: float
    segments: List[Dict[str, Any]]
    processing_time_ms: float
    model_name: str
    is_final: bool = True


@dataclass
class ASRConfig:
    """Decoding knobs (reference ASRConfig, whisper_asr.py:37-54): greedy
    plus the temperature-fallback ladder by default; beam_size enables
    beam search on the T=0 rung and best_of enables best-of-N sampling on
    the T>0 rungs — the same split openai whisper's transcribe applies its
    beam_size/best_of options with (the reference's backing package)."""
    model_size: str = "large-v3"
    language: Optional[str] = None       # None = auto-detect
    task: str = "transcribe"
    temperature: float = 0.0
    # Search width: beam_size > 1 runs asr_beam_decode (one compiled
    # program; beams are batch rows) whenever the ladder rung is T=0;
    # best_of > 1 decodes N independent samples per T>0 rung against one
    # shared encoder pass and keeps the best avg-logprob candidate.
    beam_size: int = 1
    best_of: int = 1
    # Word-level timestamps via cross-attention alignment + DTW
    # (asr/timestamps.py — openai whisper timing.find_alignment): adds a
    # "words" list to each segment. One extra compiled teacher-forced
    # forward per transcription.
    word_timestamps: bool = False
    # Long-form audio: transcribe seeks over fixed 30 s windows with
    # rolling <|startofprev|> conditioning (the reference's backing
    # package seeks with timestamp tokens; fixed-stride windows keep
    # every program shape static). max_windows caps total audio
    # (120 windows = 1 hour).
    max_windows: int = 120
    no_speech_threshold: float = 0.6
    logprob_threshold: float = -1.0
    max_new_tokens: int = 224
    # Text conditioning (<|startofprev|> tokens before the SOT block):
    # enabled once prev_window tokens of context exist — the window is
    # STATIC so conditioning costs exactly ONE extra compiled decode
    # program, not a recompile per context length (TPU-first shape
    # discipline; the reference's torch path pays no such constraint,
    # whisper_asr.py condition_on_previous_text).
    condition_on_previous_text: bool = True
    prev_window: int = 32
    # Fallback ladder: retried in order when avg logprob is below
    # logprob_threshold or the text is degenerate-repetitive
    # (compression_ratio above threshold) — openai whisper transcribe
    # semantics. Empty tuple = pure greedy. The traced-temperature decode
    # means every rung reuses ONE compiled program.
    fallback_temperatures: tuple = (0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: float = 2.4
    seed: int = 0


def _compression_ratio(text: str) -> float:
    """len(utf8)/len(zlib(utf8)) — degenerate repetition compresses well
    (openai whisper's repetition detector; reference relies on the same
    mechanism through the torch package)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


Detokenizer = Callable[[List[int]], str]


def _default_detokenizer(ids: List[int]) -> str:
    """Fallback used when no tokenizer is wired (random-weight dev mode):
    a readable token-id transcript, NOT natural text."""
    return " ".join(str(i) for i in ids)


def load_hf_detokenizer(tokenizer_dir: str) -> Detokenizer:
    """Local-files-only HF tokenizer (no downloads in this environment)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir, local_files_only=True)
    return lambda ids: tok.decode(ids, skip_special_tokens=True)


class WhisperASR:
    """Greedy whisper transcription on TPU.

    Parameters default to a RANDOM-weight tiny model (dev mode, same policy
    as the TTS engine) — pass params/model_cfg converted via
    asr/convert.py:load_hf_whisper for real checkpoints.
    """

    def __init__(self, config: Optional[ASRConfig] = None,
                 params: Optional[dict] = None,
                 model_cfg: Optional[WhisperASRModelConfig] = None,
                 detokenizer: Optional[Detokenizer] = None,
                 alignment_heads: Optional[tuple] = None,
                 seed: int = 0, warmup: bool = True, mesh=None,
                 quantize_int8: bool = False):
        """mesh: optional jax.sharding Mesh (parallel/mesh.py:make_mesh)
        — transcription runs tp-SHARDED (encoder/decoder stacks
        Megatron-split, vocab-split tied embedding; XLA inserts the
        collectives), same tokens as unsharded (tests/test_multichip.py).
        quantize_int8: weight-only int8 on the hot matmuls
        (asr/model.py:quantize_asr_params_int8) — halves per-token weight
        reads; composes with mesh (scales shard with their weights).
        """
        self.config = config or ASRConfig()
        self.model_cfg = model_cfg or TINY_ASR
        # The default ASRConfig budgets new tokens for whisper-large-v3
        # (448 target positions); on smaller models (the tiny dev config
        # has 24) clamp the budget to what fits after the worst-case BASE
        # prompt (<|sot|> lang task <|notimestamps|> = 4, +1 EOS slot) so
        # the out-of-the-box config always runs. Prev-context prompts that
        # overflow still raise in _transcribe_window with a clear message.
        cap = self.model_cfg.max_target_positions - 5
        if self.config.max_new_tokens > cap:
            import dataclasses
            self.config = dataclasses.replace(self.config,
                                              max_new_tokens=max(cap, 1))
        self.alignment_heads = tuple(
            alignment_heads if alignment_heads is not None
            else default_alignment_heads(self.model_cfg.decoder_layers,
                                         self.model_cfg.num_heads))
        self.params = params if params is not None else init_asr_params(
            jax.random.PRNGKey(seed), self.model_cfg)
        if quantize_int8:
            from fireredtts2_tpu.asr.model import quantize_asr_params_int8
            self.params = quantize_asr_params_int8(self.params)
        self.mesh = mesh
        if mesh is not None:
            from fireredtts2_tpu.parallel.mesh import (
                asr_param_pspecs, sanitize_pspecs, to_named,
            )
            specs = sanitize_pspecs(mesh, self.params,
                                    asr_param_pspecs(self.params))
            self.params = jax.device_put(self.params,
                                         to_named(mesh, specs))
        self.detokenize = detokenizer or _default_detokenizer
        self.model_name = f"whisper-jax-{self.config.model_size}"

        cfg = self.model_cfg
        self._mel_filters = jnp.asarray(
            whisper_mel_filters(cfg.n_mels))              # (n_freq, n_mels)
        # 30 s of audio -> max_source_positions encoder frames (conv halves
        # the 100 Hz mel rate). Everything is padded/trimmed to this STATIC
        # shape so transcribe is one compiled program.
        self._n_samples = cfg.max_source_positions * 2 * 160

        self._decode = jax.jit(
            lambda p, mel, mel_len, prompt, temp, key, sot: asr_greedy_decode(
                p, cfg, mel, mel_len, prompt,
                max_new=self.config.max_new_tokens,
                temperature=temp, key=key, sot_index=sot),
            static_argnums=(6,))
        self._beam = jax.jit(
            lambda p, mel, mel_len, prompt, sot: asr_beam_decode(
                p, cfg, mel, mel_len, prompt,
                max_new=self.config.max_new_tokens,
                beam_size=max(self.config.beam_size, 1), sot_index=sot),
            static_argnums=(4,))
        self._best_of = jax.jit(
            lambda p, mel, mel_len, prompt, temp, key, sot:
            asr_sample_best_of(
                p, cfg, mel, mel_len, prompt,
                max_new=self.config.max_new_tokens,
                best_of=max(self.config.best_of, 1),
                temperature=temp, key=key, sot_index=sot),
            static_argnums=(6,))
        self._lang = jax.jit(
            lambda p, mel, mel_len: asr_detect_language(p, cfg, mel, mel_len))
        self._align = jax.jit(
            lambda p, mel, mel_len, tokens: asr_alignment_probs(
                p, cfg, mel, mel_len, tokens, self.alignment_heads))

        self.total_transcriptions = 0
        self.total_processing_time = 0.0
        self.average_processing_time = 0.0
        self.decode_calls = 0  # ladder telemetry (tests + stats)

        if warmup:
            self._warmup()

    # ------------------------------------------------------------- internals

    def _warmup(self) -> None:
        """Compile + run once on silence (reference _warmup_model,
        whisper_asr.py:99-122)."""
        silent = np.zeros(16_000, np.float32)
        self.transcribe(silent, 16_000)

    def _preprocess_audio(self, audio: np.ndarray, sample_rate: int
                          ) -> np.ndarray:
        """Mono fp32 16 kHz, normalized, trimmed to the 30 s window
        (reference whisper_asr.py:228-262)."""
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif audio.dtype == np.int32:
            audio = audio.astype(np.float32) / 2147483648.0
        else:
            audio = audio.astype(np.float32)
        if sample_rate != 16_000:
            audio = resample(audio, sample_rate, 16_000)
        peak = np.abs(audio).max() if audio.size else 0.0
        if peak > 1.0:
            audio = audio / peak
        # Long-form audio is transcribed window by window (transcribe's
        # seek loop); only a generous safety cap applies here.
        return audio[: self._n_samples * self.config.max_windows]

    def _mel(self, audio16k: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """-> ((1, T_mel, n_mels) padded mel, (1,) real length)."""
        n_real = len(audio16k)
        padded = np.zeros(self._n_samples, np.float32)
        padded[:n_real] = audio16k
        mel = log_mel_spectrogram(jnp.asarray(padded)[None],
                                  self._mel_filters)       # (1, n_mels, T)
        mel_len = jnp.asarray([max(n_real // 160, 2)], jnp.int32)
        return mel.transpose(0, 2, 1), mel_len

    def _prompt_ids(self, language: Optional[str],
                    prev_ids: Optional[list] = None) -> np.ndarray:
        """Forced decoder prompt: [<|startofprev|> + last prev_window
        context tokens]? + <|startoftranscript|> [+ lang] + task +
        <|notimestamps|> (openai whisper prompt layout). prev_ids are used
        only when at least prev_window are available, keeping the prompt
        shape static (see ASRConfig)."""
        cfg = self.model_cfg
        ids: list = []
        W = self.config.prev_window
        if (prev_ids is not None and self.config.condition_on_previous_text
                and len(prev_ids) >= W > 0):
            ids += [cfg.sot_prev_id] + [int(t) for t in prev_ids[-W:]]
        sot_index = len(ids)
        ids.append(cfg.sot_id)
        if language is not None and language in LANGUAGES[:cfg.num_languages]:
            ids.append(cfg.first_language_id + LANGUAGES.index(language))
        task_id = (cfg.translate_id if self.config.task == "translate"
                   else cfg.transcribe_id)
        ids += [task_id, cfg.no_timestamps_id]
        return np.asarray([ids], np.int32), sot_index

    # ------------------------------------------------------------------ API

    def _decode_once(self, mel, mel_len, prompt, temperature: float,
                     attempt: int, sot_index: int = 0
                     ) -> tuple[list, float, float]:
        """One ladder rung -> (ids, avg_lp, no_speech). Deterministic per
        (seed, attempt). Search width follows openai whisper's transcribe
        split: beam search applies on T=0 rungs, best-of-N sampling on
        T>0 rungs, plain greedy/sampling otherwise."""
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed), attempt)
        if temperature <= 0.0 and self.config.beam_size > 1:
            res = self._beam(self.params, mel, mel_len, prompt, sot_index)
        elif temperature > 0.0 and self.config.best_of > 1:
            res = self._best_of(self.params, mel, mel_len, prompt,
                                jnp.float32(temperature), key, sot_index)
        else:
            res = self._decode(self.params, mel, mel_len, prompt,
                               jnp.float32(temperature), key, sot_index)
        self.decode_calls += 1
        n = int(res.n_tokens[0])
        ids = [int(t) for t in np.asarray(res.tokens[0][:n])]
        avg_lp = float(res.sum_logprob[0]) / max(n + 1, 1)
        return ids, avg_lp, float(res.no_speech_prob[0])

    def _transcribe_window(self, win: np.ndarray, lang: Optional[str],
                           prev_ids: Optional[list], attempt_base: int):
        """Ladder-decode ONE <=30 s window (reference whisper_asr.py:
        124-226 / openai whisper transcribe): greedy (or beam) first;
        when the transcript is weak (avg logprob below logprob_threshold)
        or degenerate-repetitive (compression ratio above threshold) —
        and the window is NOT just silence — retry at rising temperatures,
        accepting the first decode that clears the gates.

        Returns (ids, text, avg_lp, no_speech, used_temp, align_ctx)."""
        prompt_np, sot_index = self._prompt_ids(lang, prev_ids)
        if (prompt_np.shape[1] + self.config.max_new_tokens
                > self.model_cfg.max_target_positions):
            raise ValueError(
                f"prompt ({prompt_np.shape[1]}) + max_new_tokens "
                f"({self.config.max_new_tokens}) exceeds "
                f"max_target_positions "
                f"({self.model_cfg.max_target_positions}); lower "
                f"ASRConfig.prev_window or max_new_tokens")
        mel, mel_len = self._mel(win)
        prompt = jnp.asarray(prompt_np)

        ladder = ((self.config.temperature,)
                  + tuple(t for t in self.config.fallback_temperatures
                          if t > self.config.temperature))
        used_temp = ladder[0]
        for attempt, temp in enumerate(ladder):
            ids, avg_lp, no_speech = self._decode_once(
                mel, mel_len, prompt, temp, attempt_base + attempt,
                sot_index)
            used_temp = temp
            text = self.detokenize(ids) if ids else ""
            is_silence = no_speech > self.config.no_speech_threshold
            weak = avg_lp < self.config.logprob_threshold
            degenerate = (_compression_ratio(text)
                          > self.config.compression_ratio_threshold)
            if is_silence or not (weak or degenerate):
                break  # silence is final; a clean transcript is final

        # no-speech gate (openai whisper decode semantics): silence if
        # p(nospeech) is high AND the transcript logprob is weak.
        if (no_speech > self.config.no_speech_threshold
                and avg_lp < self.config.logprob_threshold):
            text, ids = "", []
        return (ids, text, avg_lp, no_speech, used_temp,
                (mel, mel_len, prompt_np[0].tolist()))

    def transcribe(self, audio_data: np.ndarray, sample_rate: int = 16_000,
                   language: Optional[str] = None,
                   initial_prompt_ids: Optional[list] = None
                   ) -> TranscriptionResult:
        """Transcription with the temperature-fallback ladder; audio
        longer than 30 s is transcribed by a seek loop over fixed 30 s
        windows with rolling <|startofprev|> conditioning — every window
        reuses the same compiled programs (the reference's backing package
        seeks with timestamp tokens; fixed-stride windows are the
        static-shape equivalent). One segment per non-silent window.

        initial_prompt_ids: context tokens for <|startofprev|>
        conditioning (used once >= ASRConfig.prev_window are available —
        static prompt shape; StreamingWhisperASR feeds its rolling
        transcript here when condition_on_previous_text is on)."""
        t0 = time.time()
        lang = language or self.config.language
        # Config errors raise loudly (they are caller bugs, not transient
        # transcription failures the broad handler below should eat).
        probe, _ = self._prompt_ids(lang, initial_prompt_ids)
        if (probe.shape[1] + self.config.max_new_tokens
                > self.model_cfg.max_target_positions):
            raise ValueError(
                f"prompt ({probe.shape[1]}) + max_new_tokens "
                f"({self.config.max_new_tokens}) exceeds "
                f"max_target_positions "
                f"({self.model_cfg.max_target_positions}); lower "
                f"ASRConfig.prev_window or max_new_tokens")
        try:
            audio = self._preprocess_audio(audio_data, sample_rate)
            W = self._n_samples
            n_win = max(1, -(-max(len(audio), 1) // W))
            prev = list(initial_prompt_ids) if initial_prompt_ids else []
            segments: list = []
            texts: list = []
            lp_num = lp_den = 0.0
            avg_lp = 0.0
            for wi in range(n_win):
                off = wi * W
                win = audio[off: off + W]
                cond = (prev if self.config.condition_on_previous_text
                        else None)
                ids, text, avg_lp, no_speech, used_temp, align_ctx = \
                    self._transcribe_window(win, lang, cond,
                                            attempt_base=wi * 1000)
                if not ids:
                    continue
                t_off = off / 16_000
                seg = {"id": len(segments), "start": t_off,
                       "end": t_off + len(win) / 16_000,
                       "text": text, "tokens": ids,
                       "temperature": used_temp, "avg_logprob": avg_lp,
                       "compression_ratio": _compression_ratio(text),
                       "no_speech_prob": no_speech}
                if self.config.word_timestamps:
                    mel, mel_len, prompt_row = align_ctx
                    words = self._word_timestamps(mel, mel_len, prompt_row,
                                                  ids, len(win))
                    for w in words:
                        w["start"] += t_off
                        w["end"] += t_off
                    seg["words"] = words
                segments.append(seg)
                texts.append(text.strip())
                lp_num += avg_lp * (len(ids) + 1)
                lp_den += len(ids) + 1
                # openai whisper: output decoded above temperature 0.5 is
                # too noisy to condition the next window on
                if used_temp <= 0.5:
                    prev.extend(ids)
                else:
                    prev = []

            dt = (time.time() - t0) * 1000.0
            self.total_transcriptions += 1
            self.total_processing_time += dt
            self.average_processing_time = (
                self.total_processing_time / self.total_transcriptions)

            mean_lp = lp_num / lp_den if lp_den else avg_lp
            confidence = (float(np.clip(np.exp(mean_lp), 0.0, 1.0))
                          if segments else 0.0)
            return TranscriptionResult(
                text=" ".join(t for t in texts if t), confidence=confidence,
                language=lang or "unknown", start_time=0.0,
                end_time=len(audio) / 16_000, segments=segments,
                processing_time_ms=dt, model_name=self.model_name)
        except Exception:
            # loud in logs, quiet to callers — reference returns an empty
            # result on failure (whisper_asr.py:209-226)
            import logging
            logging.getLogger(__name__).exception("transcription failed")
            return TranscriptionResult(
                text="", confidence=0.0, language="unknown", start_time=0.0,
                end_time=0.0, segments=[],
                processing_time_ms=(time.time() - t0) * 1000.0,
                model_name=self.model_name)

    def _word_timestamps(self, mel, mel_len, prompt_row: list, ids: list,
                         n_samples: int) -> list:
        """Cross-attention alignment -> word dicts. The teacher-forced
        sequence is padded to the STATIC length P + max_new + 1 so the
        alignment program compiles once per prompt variant."""
        cfg = self.model_cfg
        P = len(prompt_row)
        full = prompt_row + ids + [cfg.eot_id]
        S = P + self.config.max_new_tokens + 1
        full = (full + [cfg.eot_id] * S)[:S]
        probs, tok_lp = self._align(
            self.params, mel, mel_len, jnp.asarray([full], jnp.int32))
        n_frames = max(n_samples // 320, 1)   # 16 kHz -> 50 Hz enc frames
        return word_timestamps_from_alignment(
            np.asarray(probs[0]), np.asarray(tok_lp[0]),
            text_start=P, n_text=len(ids), ids=ids,
            detokenize=self.detokenize, n_frames=n_frames)

    def detect_language(self, audio_data: np.ndarray,
                        sample_rate: int = 16_000) -> Dict[str, Any]:
        """-> {language, confidence, all_probabilities(top10)} (reference
        whisper_asr.py:295-330)."""
        audio = self._preprocess_audio(audio_data, sample_rate)
        mel, mel_len = self._mel(audio)
        probs = np.asarray(self._lang(self.params, mel, mel_len))[0]
        n = min(len(LANGUAGES), len(probs))
        order = np.argsort(probs[:n])[::-1]
        return {
            "language": LANGUAGES[int(order[0])],
            "confidence": float(probs[order[0]]),
            "all_probabilities": {
                LANGUAGES[int(i)]: float(probs[i]) for i in order[:10]},
        }

    def get_supported_languages(self) -> List[str]:
        return LANGUAGES[: self.model_cfg.num_languages]

    def get_performance_stats(self) -> Dict[str, Any]:
        return {
            "total_transcriptions": self.total_transcriptions,
            "decode_calls": self.decode_calls,
            "average_processing_time_ms": self.average_processing_time,
            "total_processing_time_ms": self.total_processing_time,
            "model_name": self.model_name,
            "backend": jax.default_backend(),
        }

    def as_transcriber(self) -> Callable[[np.ndarray], str]:
        """Adapter to the serve/s2s.py Transcriber protocol."""
        return lambda audio16k: self.transcribe(audio16k, 16_000).text


class StreamingWhisperASR:
    """Background streaming transcription: overlapping chunks + rolling
    context (reference whisper_asr.py:360-511)."""

    def __init__(self, asr: WhisperASR, chunk_duration: float = 2.0,
                 overlap_duration: float = 0.5, sample_rate: int = 16_000):
        self.asr = asr
        self.sample_rate = sample_rate
        self.chunk_size = int(chunk_duration * sample_rate)
        self.overlap_size = int(overlap_duration * sample_rate)
        self.audio_queue: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=64)
        self.result_queue: "queue.Queue[TranscriptionResult]" = queue.Queue(maxsize=16)
        self.audio_buffer: deque = deque()
        self.context_history: deque = deque(maxlen=5)
        # Rolling token context for <|startofprev|> conditioning (fed back
        # into the decoder prompt once ASRConfig.prev_window tokens exist
        # — previously context_history was collected but never conditioned
        # on; the reference's condition_on_previous_text actually does).
        self.context_tokens: deque = deque(maxlen=4 * asr.config.prev_window)
        self.is_streaming = False
        self._thread: Optional[threading.Thread] = None

    def start_streaming(self) -> None:
        if self.is_streaming:
            return
        self.is_streaming = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop_streaming(self) -> None:
        self.is_streaming = False
        if self._thread:
            self._thread.join(timeout=5.0)
            self._thread = None

    def add_audio_chunk(self, audio_data: np.ndarray,
                        sample_rate: int = 16_000) -> None:
        if sample_rate != self.sample_rate:
            audio_data = resample(audio_data.astype(np.float32),
                                  sample_rate, self.sample_rate)
        try:
            self.audio_queue.put(audio_data.astype(np.float32), timeout=0.1)
        except queue.Full:
            pass  # drop under backpressure, same as the reference

    def get_transcription_result(self, timeout: float = 0.1
                                 ) -> Optional[TranscriptionResult]:
        try:
            return self.result_queue.get(timeout=timeout)
        except queue.Empty:
            return None

    def _loop(self) -> None:
        while self.is_streaming:
            try:
                chunk = self.audio_queue.get(timeout=0.5)
            except queue.Empty:
                continue
            self.audio_buffer.extend(chunk.tolist())
            if len(self.audio_buffer) < self.chunk_size:
                continue
            data = np.asarray(list(self.audio_buffer)[: self.chunk_size],
                              np.float32)
            for _ in range(self.chunk_size - self.overlap_size):
                if self.audio_buffer:
                    self.audio_buffer.popleft()
            prev = (list(self.context_tokens)
                    if self.asr.config.condition_on_previous_text else None)
            res = self.asr.transcribe(data, self.sample_rate,
                                      initial_prompt_ids=prev)
            res.is_final = False
            if res.text.strip():
                self.context_history.append(res)
                for seg in res.segments:
                    self.context_tokens.extend(seg.get("tokens", ()))
                try:
                    self.result_queue.put(res, timeout=0.1)
                except queue.Full:
                    try:
                        self.result_queue.get_nowait()
                        self.result_queue.put_nowait(res)
                    except queue.Empty:
                        pass


def create_asr_interface(asr: Optional[WhisperASR] = None
                         ) -> tuple[WhisperASR, StreamingWhisperASR, dict]:
    """Reference create_asr_interface parity (whisper_asr.py:513-599):
    returns (asr, streaming_asr, callable interface dict)."""
    asr = asr or WhisperASR()
    streaming = StreamingWhisperASR(asr)
    interface = {
        "transcribe": lambda audio, sr=16_000, language=None:
            asr.transcribe(audio, sr, language),
        "detect_language": lambda audio, sr=16_000:
            asr.detect_language(audio, sr),
        "start_streaming": streaming.start_streaming,
        "stop_streaming": streaming.stop_streaming,
        "add_audio_chunk": streaming.add_audio_chunk,
        "get_result": streaming.get_transcription_result,
        "get_performance_stats": asr.get_performance_stats,
        "supported_languages": asr.get_supported_languages,
    }
    return asr, streaming, interface
