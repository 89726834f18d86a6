"""One codec training step on synthetic audio, checkpoint, and export
into a servable dir (tiny dims; see docs/training.md for the real run)."""
import json
import os
import tempfile

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.runtime.convert import run_export
from fireredtts2_tpu.train.codec_loop import CodecTrainConfig, train_codec
from fireredtts2_tpu.train.loop import TrainConfig, train

work = tempfile.mkdtemp(prefix="frtts2_example_")
cfg = tiny_engine_config()
with open(os.path.join(work, "config_llm.json"), "w") as f:
    json.dump({"llm_models": {k: getattr(cfg.llm, k) for k in (
        "backbone_flavor", "decoder_flavor", "text_vocab_size",
        "audio_vocab_size", "audio_num_codebooks",
        "decoder_loss_weight")}}, f)
with open(os.path.join(work, "config_codec.json"), "w") as f:
    json.dump({"codec": {}}, f)

train(cfg.llm, TrainConfig(batch_size=2, seq_len=32, warmup_steps=2,
                           checkpoint_every=1,
                           checkpoint_dir=f"{work}/lm_ck", log_every=1, tp=4),
      num_steps=1)
train_codec(cfg.codec, CodecTrainConfig(
    batch_size=2, window_samples=5120, warmup_steps=2, checkpoint_every=1,
    checkpoint_dir=f"{work}/codec_ck", log_every=1, tp=4),
            num_steps=1)
print(run_export(f"{work}/serving", work,
                 lm_ckpt=f"{work}/lm_ck/step_00000001",
                 codec_ckpt=f"{work}/codec_ck/step_00000001"))
print(f"servable dir: {work}/serving")
