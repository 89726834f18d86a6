"""Conversation analytics + context optimizer tests."""

import time

from fireredtts2_tpu.serve.sessions import ConversationTurn
from fireredtts2_tpu.serve.conversation_analytics import (
    analyze_turn, analyze_conversation, optimize_context,
    PERSONALITIES,
)


def _turn(text, role="user"):
    return ConversationTurn(turn_id="x", role=role, text=text,
                            timestamp=time.time())


def test_turn_sentiment():
    assert analyze_turn("this is great, I love it").sentiment > 0
    assert analyze_turn("terrible, awful problem").sentiment < 0
    assert analyze_turn("the sky is blue").sentiment == 0
    assert analyze_turn("what time is it?").question


def test_conversation_analysis():
    turns = [
        _turn("Tell me about tensor processing units and how they work?"),
        _turn("Tensor processing units are accelerators built for matrix "
              "math, they work by streaming data through systolic arrays",
              "assistant"),
        _turn("That's great, thanks! How do systolic arrays work?"),
    ]
    a = analyze_conversation(turns)
    assert a.turns == 3
    assert a.engagement > 0.2
    assert a.sentiment >= 0
    assert a.coherence > 0.1  # shared vocabulary across turns

    empty = analyze_conversation([])
    assert empty.turns == 0 and empty.coherence == 1.0


def test_context_optimizer_budget():
    turns = [_turn(f"message number {i} about interesting topics " * 5)
             for i in range(20)]
    kept, summary = optimize_context(turns, token_budget=200)
    assert len(kept) < 20
    assert kept[-1] is turns[-1]          # newest always kept
    assert summary                        # dropped prefix summarized
    # everything fits on a large budget
    kept2, summary2 = optimize_context(turns, token_budget=100_000)
    assert len(kept2) == 20 and summary2 == ""


def test_personality_sampling():
    warm = PERSONALITIES["warm"].adjust_sampling(0.9)
    concise = PERSONALITIES["concise"].adjust_sampling(0.9)
    assert warm > 0.9 > concise
