"""Tests for the S2S overlay: context-aware TTS, voice profiles, pipeline."""

import numpy as np
import pytest

from fireredtts2_tpu.serve.context_tts import (
    analyze_emotion, contextual_sampling, ContextAwareTTS,
)
from fireredtts2_tpu.serve.voices import (
    score_reference_audio, VoiceProfileManager,
)
from fireredtts2_tpu.serve.s2s import (
    RuleBasedResponder, ResponderChain, SpeechToSpeechPipeline,
)


# ------------------------------------------------------------ emotion

def test_emotion_detection():
    assert analyze_emotion("I'm so happy, this is wonderful!").emotion == "happy"
    assert analyze_emotion("Unfortunately we lost everything.").emotion == "sad"
    assert analyze_emotion("This is urgent, attention required.").emotion == "serious"
    r = analyze_emotion("The sky is blue.")
    assert r.emotion == "neutral" and r.intensity == 0.0
    assert analyze_emotion("Is it time?").is_question


def test_contextual_sampling_adjusts():
    happy = analyze_emotion("wonderful amazing awesome!")
    adj = contextual_sampling(0.9, 20, happy)
    assert adj.temperature > 0.9 and adj.topk >= 20
    serious = analyze_emotion("critical warning, urgent")
    adj2 = contextual_sampling(0.9, 20, serious)
    assert adj2.temperature < 0.9 and adj2.topk < 20
    tok = contextual_sampling(0.9, 20, happy, inject_emotion_token=True)
    assert tok.emotion_token == "<|emotion_happy|>"


def test_context_aware_tts_wraps_engine():
    calls = {}

    class FakeEngine:
        def generate(self, text, speaker, context, temperature, topk):
            calls.update(text=text, temperature=temperature, topk=topk)
            return np.zeros(1920, np.float32)

    cat = ContextAwareTTS(FakeEngine(), inject_emotion_tokens=True)
    audio, emo, adj = cat.generate("This is amazing, I love it!")
    assert emo.emotion == "happy"
    assert calls["text"].startswith("<|emotion_happy|>")
    assert calls["temperature"] == adj.temperature


# ------------------------------------------------------------ voices

def _good_reference(rng, seconds=4.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    # modulated voice-ish signal with pauses
    sig = 0.3 * np.sin(2 * np.pi * 200 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    sig[: sr // 4] = 0.001 * rng.standard_normal(sr // 4)
    return sig.astype(np.float32)


def test_reference_audio_scoring(rng):
    good = score_reference_audio(_good_reference(rng))
    assert good["acceptable"], good["reasons"]

    short = score_reference_audio(np.zeros(8000, np.float32))
    assert not short["acceptable"]

    clipped = _good_reference(rng) * 5.0
    assert "clipping detected" in score_reference_audio(np.clip(clipped, -1, 1))["reasons"]


def test_voice_profile_crud(tmp_path, rng):
    mgr = VoiceProfileManager(str(tmp_path))
    p = mgr.create_profile("alice", "[S1]hello reference",
                           audio16k=_good_reference(rng))
    assert mgr.get(p.profile_id).name == "alice"
    assert mgr.by_name("alice") is not None
    # reload from disk
    mgr2 = VoiceProfileManager(str(tmp_path))
    assert mgr2.get(p.profile_id).reference_text == "[S1]hello reference"
    # dialogue mapping
    p2 = mgr2.create_profile("bob", "bob reference", audio16k=_good_reference(rng))
    wavs, texts = mgr2.dialogue_prompts({"[S1]": p.profile_id,
                                         "[S2]": p2.profile_id})
    assert len(wavs) == 2
    assert texts[0].startswith("[S1]") and texts[1].startswith("[S2]")
    assert mgr2.delete(p.profile_id)
    assert mgr2.get(p.profile_id) is None


# ------------------------------------------------------------ s2s

def test_rule_responder():
    r = RuleBasedResponder()
    assert "Hello" in r("hello there", []) or "Hi" in r("hello there", [])
    assert r("what is the meaning of life?", []).strip() != ""


def test_responder_chain_fallback():
    def broken(text, history):
        raise RuntimeError("backend down")

    chain = ResponderChain([broken, RuleBasedResponder()])
    assert chain("hello", "")


def test_s2s_text_pipeline_with_fake_engine():
    class FakeEngine:
        output_sample_rate = 24_000

        def generate(self, text, speaker, context, max_audio_length_ms):
            return np.zeros(3840, np.float32)

    pipe = SpeechToSpeechPipeline(FakeEngine())
    res = pipe.process_text_input("hello")
    assert res.response_text
    assert res.audio24k.shape == (3840,)
    sid = res.timings["session_id"]
    # history accumulates
    res2 = pipe.process_text_input("thanks", session_id=sid)
    turns = pipe.sessions.context_window(sid)
    assert len(turns) == 4
    assert res2.timings["tts_s"] >= 0


def test_s2s_audio_requires_transcriber():
    class FakeEngine:
        def generate(self, *a, **k):
            return np.zeros(10, np.float32)

    pipe = SpeechToSpeechPipeline(FakeEngine())
    with pytest.raises(RuntimeError):
        pipe.process_audio_input(np.zeros(16000, np.float32))


def test_s2s_audio_with_fake_asr():
    class FakeEngine:
        def generate(self, text, speaker, context, max_audio_length_ms):
            return np.zeros(1920, np.float32)

    pipe = SpeechToSpeechPipeline(FakeEngine(),
                                  transcriber=lambda a: "hello assistant")
    res = pipe.process_audio_input(np.zeros(16000, np.float32))
    assert res.transcript == "hello assistant"
    assert "asr_s" in res.timings
