"""Create a voice profile from reference audio, then speak in it."""
import sys

import numpy as np

from fireredtts2_tpu.client import FireRedTTSClient
from fireredtts2_tpu.utils.audio_io import load_prompt_audio_16k, save_wav

client = FireRedTTSClient("http://127.0.0.1:8080")
if len(sys.argv) > 2:
    ref, ref_text = load_prompt_audio_16k(sys.argv[1]), sys.argv[2]
else:  # synthetic reference for the dev config
    t = np.arange(16_000) / 16_000.0
    ref = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    ref_text = "a synthetic reference tone"
pid = client.create_voice("demo-voice", ref_text, ref)
audio, sr = client.clone_speech("Now I speak with the stored voice.", pid)
save_wav("cloned.wav", audio, sr)
print(f"voice {pid}: wrote cloned.wav ({len(audio) / sr:.2f} s)")
