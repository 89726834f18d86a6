"""Dialogue synthesis through the engine API (tiny dev config when no
checkpoint dir is given)."""
import sys

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.engine import FireRedTTS2Engine
from fireredtts2_tpu.utils.audio_io import save_wav

pretrained = sys.argv[1] if len(sys.argv) > 1 else None
engine = (FireRedTTS2Engine(pretrained_dir=pretrained) if pretrained
          else FireRedTTS2Engine(config=tiny_engine_config(), seed=0))
# the tiny dev config has a 256-frame context: cap utterance length so
# turn 1's audio fits as context for turn 2 (real checkpoints: omit)
kw = {} if pretrained else {"max_utterance_ms": 2_000}
audio = engine.generate_dialogue(
    ["[S1]Hello there.", "[S2]Hi, nice day!"], **kw)
save_wav("dialogue.wav", audio, engine.output_sample_rate)
print(f"wrote dialogue.wav ({len(audio) / engine.output_sample_rate:.2f} s)")
