"""On-TPU Whisper ASR: native JAX encoder-decoder + service layer.

Replaces the reference's `openai-whisper` wrapper (whisper_asr.py) with a
TPU-native implementation; the speech-to-speech pipeline (serve/s2s.py)
plugs in via `WhisperASR.as_transcriber()`.
"""

from fireredtts2_tpu.asr.model import (
    WhisperASRModelConfig, TINY_ASR, init_asr_params, asr_greedy_decode,
    asr_beam_decode, asr_sample_best_of, asr_detect_language, asr_encode,
)
from fireredtts2_tpu.asr.asr import (
    ASRConfig, TranscriptionResult, WhisperASR, StreamingWhisperASR,
    create_asr_interface, LANGUAGES,
)
from fireredtts2_tpu.asr.convert import (
    convert_hf_whisper, convert_hf_whisper_encoder, load_hf_whisper,
)
from fireredtts2_tpu.asr.timestamps import (
    default_alignment_heads, word_timestamps_from_alignment, dtw_path,
    split_to_words,
)

__all__ = [
    "WhisperASRModelConfig", "TINY_ASR", "init_asr_params",
    "asr_greedy_decode", "asr_beam_decode", "asr_sample_best_of",
    "asr_detect_language", "asr_encode",
    "ASRConfig", "TranscriptionResult", "WhisperASR", "StreamingWhisperASR",
    "create_asr_interface", "LANGUAGES",
    "convert_hf_whisper", "convert_hf_whisper_encoder", "load_hf_whisper",
    "default_alignment_heads", "word_timestamps_from_alignment", "dtw_path",
    "split_to_words",
]
