"""Context-aware TTS: infer emotion/prosody from text and adapt sampling.

Capability parity with the reference `context_aware_tts.py` (667 LoC):
keyword-based EmotionAnalyzer (:71), mapping of emotion/intensity to
temperature / top-k adjustments (:346-560). The model itself also accepts
explicit emotion special tokens (<|emotion_*|>, utils/tokenizer.py), which
this module can inject.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

EMOTION_KEYWORDS: dict[str, list[str]] = {
    "happy": ["happy", "great", "wonderful", "awesome", "amazing", "excited",
              "fantastic", "love", "joy", "glad", "yay", "congratulations"],
    "sad": ["sad", "sorry", "unfortunately", "regret", "miss", "lost",
            "cry", "grief", "lonely", "disappointed"],
    "angry": ["angry", "furious", "outrageous", "hate", "annoyed",
              "unacceptable", "terrible", "mad"],
    "surprise": ["wow", "incredible", "unbelievable", "no way", "really",
                 "astonishing", "surprised"],
    "fear": ["afraid", "scared", "terrified", "worried", "anxious",
             "nervous", "dangerous"],
    "serious": ["important", "critical", "must", "warning", "urgent",
                "attention", "caution"],
}

_EXCLAIM = re.compile(r"!")
_QUESTION = re.compile(r"\?")


@dataclass
class EmotionResult:
    emotion: str            # neutral | happy | sad | angry | surprise | fear | serious
    intensity: float        # 0..1
    is_question: bool
    is_exclamation: bool


def analyze_emotion(text: str) -> EmotionResult:
    """Keyword + punctuation heuristics (reference EmotionAnalyzer :71)."""
    lower = text.lower()
    scores: dict[str, int] = {}
    for emotion, words in EMOTION_KEYWORDS.items():
        n = sum(1 for w in words if w in lower)
        if n:
            scores[emotion] = n
    n_ex = len(_EXCLAIM.findall(text))
    if scores:
        emotion = max(scores, key=scores.get)
        intensity = min(1.0, 0.4 + 0.2 * scores[emotion] + 0.1 * n_ex)
    elif n_ex >= 2:
        emotion, intensity = "surprise", 0.5
    else:
        emotion, intensity = "neutral", 0.0
    return EmotionResult(
        emotion=emotion, intensity=intensity,
        is_question=bool(_QUESTION.search(text)),
        is_exclamation=n_ex > 0,
    )


@dataclass
class SamplingAdjustment:
    temperature: float
    topk: int
    emotion_token: Optional[str]


def contextual_sampling(base_temperature: float, base_topk: int,
                        emotion: EmotionResult,
                        inject_emotion_token: bool = False
                        ) -> SamplingAdjustment:
    """Map emotion to sampling params (reference _get_contextual_temperature
    :508: expressive emotions get hotter sampling, serious gets colder)."""
    temp, topk = base_temperature, base_topk
    if emotion.emotion in ("happy", "surprise", "angry"):
        temp = min(1.2, base_temperature + 0.15 * emotion.intensity)
        topk = min(50, base_topk + int(10 * emotion.intensity))
    elif emotion.emotion in ("sad", "fear"):
        temp = max(0.5, base_temperature - 0.1 * emotion.intensity)
    elif emotion.emotion == "serious":
        temp = max(0.5, base_temperature - 0.15)
        topk = max(5, base_topk - 5)
    token = None
    if inject_emotion_token and emotion.emotion != "neutral":
        token = f"<|emotion_{emotion.emotion}|>"
    return SamplingAdjustment(temperature=temp, topk=topk, emotion_token=token)


class ContextAwareTTS:
    """Wraps an engine; analyzes each request and adapts sampling
    (reference ContextAwareTTS.generate_contextual_speech :346)."""

    def __init__(self, engine, inject_emotion_tokens: bool = False):
        self.engine = engine
        self.inject = inject_emotion_tokens

    def generate(self, text: str, speaker: str = "[S1]", context=(),
                 base_temperature: float = 0.9, base_topk: int = 20):
        emo = analyze_emotion(text)
        adj = contextual_sampling(base_temperature, base_topk, emo, self.inject)
        if adj.emotion_token:
            text = adj.emotion_token + text
        audio = self.engine.generate(text, speaker, list(context),
                                     temperature=adj.temperature,
                                     topk=adj.topk)
        return audio, emo, adj
