"""Conversation analytics and context optimization.

Capability parity with the reference `enhanced_conversation_manager.py`
(739 LoC): engagement / sentiment / coherence analytics (:62-266), a
token-budgeted context optimizer with summaries (:267-337), and personality
profiles applied to response generation (:338+).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from fireredtts2_tpu.serve.sessions import ConversationTurn

_POSITIVE = {"good", "great", "love", "excellent", "happy", "thanks", "nice",
             "wonderful", "amazing", "perfect", "yes"}
_NEGATIVE = {"bad", "hate", "terrible", "awful", "angry", "no", "wrong",
             "problem", "sad", "unfortunately", "worse"}


@dataclass
class TurnAnalysis:
    sentiment: float      # -1..1
    word_count: int
    question: bool


@dataclass
class ConversationAnalysis:
    engagement: float     # 0..1 — length + question activity
    sentiment: float      # -1..1 rolling
    coherence: float      # 0..1 — lexical overlap between adjacent turns
    turns: int


def analyze_turn(text: str) -> TurnAnalysis:
    words = re.findall(r"[\w']+", text.lower())
    pos = sum(w in _POSITIVE for w in words)
    neg = sum(w in _NEGATIVE for w in words)
    total = pos + neg
    sentiment = 0.0 if total == 0 else (pos - neg) / total
    return TurnAnalysis(sentiment=sentiment, word_count=len(words),
                        question="?" in text)


def analyze_conversation(turns: list[ConversationTurn]) -> ConversationAnalysis:
    """Rolling analytics (reference ConversationAnalyzer :62-266)."""
    if not turns:
        return ConversationAnalysis(0.0, 0.0, 1.0, 0)
    analyses = [analyze_turn(t.text) for t in turns]
    avg_words = sum(a.word_count for a in analyses) / len(analyses)
    q_rate = sum(a.question for a in analyses) / len(analyses)
    engagement = min(1.0, avg_words / 25.0) * 0.7 + q_rate * 0.3
    sentiment = sum(a.sentiment for a in analyses[-6:]) / min(len(analyses), 6)

    # coherence: word overlap between consecutive turns
    overlaps = []
    for a, b in zip(turns, turns[1:]):
        wa = set(re.findall(r"[\w']+", a.text.lower()))
        wb = set(re.findall(r"[\w']+", b.text.lower()))
        if wa and wb:
            overlaps.append(len(wa & wb) / min(len(wa), len(wb)))
    coherence = sum(overlaps) / len(overlaps) if overlaps else 1.0
    return ConversationAnalysis(engagement=round(engagement, 3),
                                sentiment=round(sentiment, 3),
                                coherence=round(coherence, 3),
                                turns=len(turns))


def optimize_context(turns: list[ConversationTurn], token_budget: int = 512,
                     tokens_per_word: float = 1.3) -> tuple[list[ConversationTurn], str]:
    """Token-budgeted context window (reference ContextOptimizer :267-337):
    keep the most recent turns within budget; summarize the dropped prefix
    into a one-line synopsis."""
    kept: list[ConversationTurn] = []
    budget = token_budget
    for t in reversed(turns):
        cost = int(len(t.text.split()) * tokens_per_word) + 4
        if cost > budget and kept:
            break
        kept.append(t)
        budget -= cost
    kept.reverse()
    dropped = turns[: len(turns) - len(kept)]
    if not dropped:
        return kept, ""
    topics = []
    for t in dropped:
        words = [w for w in re.findall(r"[a-zA-Z']{5,}", t.text)][:2]
        topics.extend(words)
    uniq = list(dict.fromkeys(topics))[:6]
    summary = ("Earlier the conversation covered: " + ", ".join(uniq) + "."
               if uniq else f"{len(dropped)} earlier turns omitted.")
    return kept, summary


@dataclass
class PersonalityProfile:
    """Response-shaping knobs (reference personality profiles)."""
    name: str = "neutral"
    verbosity: float = 1.0        # scales target reply length
    warmth: float = 0.5           # biases temperature upward
    formality: float = 0.5

    def adjust_sampling(self, temperature: float) -> float:
        return max(0.4, min(1.3, temperature + (self.warmth - 0.5) * 0.2))


PERSONALITIES = {
    "neutral": PersonalityProfile(),
    "warm": PersonalityProfile("warm", verbosity=1.2, warmth=0.9),
    "concise": PersonalityProfile("concise", verbosity=0.6, warmth=0.4,
                                  formality=0.7),
}
