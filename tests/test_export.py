"""Train -> serve lifecycle (runtime/convert.py:run_export): train both
model families a step, export the Orbax train checkpoints into a serving
dir, and construct a working engine from it WITHOUT torch pickles. The
reference has no training and therefore no such lifecycle at all."""

import dataclasses
import json
import os

import numpy as np
import pytest

from fireredtts2_tpu.config import CodecConfig, tiny_engine_config
from fireredtts2_tpu.runtime.convert import run_export

TINY = tiny_engine_config()


def _write_configs(d: str) -> None:
    llm = TINY.llm
    with open(os.path.join(d, "config_llm.json"), "w") as f:
        json.dump({"llm_models": {
            "backbone_flavor": llm.backbone_flavor,
            "decoder_flavor": llm.decoder_flavor,
            "text_vocab_size": llm.text_vocab_size,
            "audio_vocab_size": llm.audio_vocab_size,
            "audio_num_codebooks": llm.audio_num_codebooks,
            "decoder_loss_weight": llm.decoder_loss_weight,
        }}, f)
    with open(os.path.join(d, "config_codec.json"), "w") as f:
        json.dump({"codec": {}}, f)  # dims ride codec_overrides


def _overrides():
    return ({"max_seq_len": TINY.llm.max_seq_len, "dtype": "float32"},
            {f.name: getattr(TINY.codec, f.name)
             for f in dataclasses.fields(CodecConfig)})


def test_export_train_checkpoints_then_serve(tmp_path):
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.train.loop import TrainConfig, train
    from fireredtts2_tpu.train.codec_loop import (
        CodecTrainConfig, train_codec,
    )

    cfg_dir = str(tmp_path / "cfg")
    os.makedirs(cfg_dir)
    _write_configs(cfg_dir)

    lm_ck = str(tmp_path / "lm_ck")
    state = train(TINY.llm, TrainConfig(
        batch_size=2, seq_len=32, warmup_steps=2, total_steps=10,
        checkpoint_every=1, checkpoint_dir=lm_ck, log_every=10, tp=4),
        num_steps=1)  # tp=4 -> dp=2 on the 8-device mesh; B=2 divides
    codec_ck = str(tmp_path / "codec_ck")
    train_codec(TINY.codec, CodecTrainConfig(
        batch_size=2, window_samples=5120, warmup_steps=2, total_steps=10,
        checkpoint_every=1, checkpoint_dir=codec_ck, log_every=10, tp=4),
        num_steps=1)

    out = str(tmp_path / "serving")
    s = run_export(out, cfg_dir,
                   lm_ckpt=os.path.join(lm_ck, "step_00000001"),
                   codec_ckpt=os.path.join(codec_ck, "step_00000001"))
    assert s["lm_step"] == 1 and s["codec_step"] == 1
    assert os.path.isdir(os.path.join(out, "jax", "llm_posttrain"))
    assert os.path.isdir(os.path.join(out, "jax", "codec"))

    llm_over, codec_over = _overrides()
    engine = FireRedTTS2Engine(pretrained_dir=out, gen_type="dialogue",
                               llm_overrides=llm_over,
                               codec_overrides=codec_over)
    # the engine really serves the TRAINED weights (not a re-init)
    np.testing.assert_array_equal(
        np.asarray(engine.lm_params["backbone"]["wq"]),
        np.asarray(state.params["backbone"]["wq"]))
    audio = engine.generate("Hello.", "[S1]", [], max_audio_length_ms=240)
    assert audio.shape[0] > 0 and np.isfinite(audio).all()

    # Fallback path: exporting ONLY the LM against the serving dir above
    # copies the codec tree from config_dir's jax/ (the common case of
    # finetuning the LM against the reference codec).
    out2 = str(tmp_path / "serving2")
    s2 = run_export(out2, out,
                    lm_ckpt=os.path.join(lm_ck, "step_00000001"))
    assert any("copied" in e for e in s2["exported"])
    assert os.path.isdir(os.path.join(out2, "jax", "codec"))


def test_export_requires_fallback_or_checkpoint(tmp_path):
    cfg_dir = str(tmp_path / "cfg")
    os.makedirs(cfg_dir)
    _write_configs(cfg_dir)
    with pytest.raises(FileNotFoundError, match="llm_posttrain"):
        run_export(str(tmp_path / "serving"), cfg_dir)
