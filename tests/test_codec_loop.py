"""Codec training loop (train/codec_loop.py): wav-directory data pipeline
alignment, Orbax checkpoint/resume, metrics + eval streaming, and the
`train` CLI subcommand. The reference ships no codec training at all
(/root/reference/fireredtts2/codec/model.py:151-235 is inference-only)."""

import json

import numpy as np

from fireredtts2_tpu.config import tiny_engine_config
from fireredtts2_tpu.train.codec_loop import (
    CodecTrainConfig, train_codec, wav_dir_batches, latest_codec_checkpoint,
)
from fireredtts2_tpu.utils.audio_io import save_wav

CFG = tiny_engine_config().codec
T16 = 5120  # 4 RVQ tokens; matches test_codec_train.py window


def _tcfg(**kw):
    # tp=4 -> dp=2 on the 8-device mesh, so batch_size=2 divides dp
    base = dict(batch_size=2, window_samples=T16, peak_lr=1e-3,
                warmup_steps=2, total_steps=100, log_every=1, tp=4)
    base.update(kw)
    return CodecTrainConfig(**base)


def test_window_must_align_to_token():
    import pytest
    with pytest.raises(ValueError, match="multiple of 1280"):
        CodecTrainConfig(window_samples=5000)


def test_wav_dir_batches_alignment(tmp_path):
    """Windows come out (B, T16) @16 kHz with (B, 1.5*T16) targets; a
    short file zero-pads with `lengths` marking the valid prefix; a
    48 kHz stereo file resamples to both rates."""
    rng = np.random.default_rng(0)
    save_wav(str(tmp_path / "a.wav"),
             rng.standard_normal(16_000).astype(np.float32) * 0.1, 16_000)
    stereo = (rng.standard_normal((24_000, 2)) * 0.1).astype(np.float32)
    from scipy.io import wavfile
    wavfile.write(str(tmp_path / "b.wav"), 48_000,
                  (stereo * 32767).astype(np.int16))
    save_wav(str(tmp_path / "short.wav"),
             rng.standard_normal(2_000).astype(np.float32) * 0.1, 16_000)

    tcfg = _tcfg()
    seen_short = False
    it = wav_dir_batches(str(tmp_path), tcfg, loop=False)
    for audio, lengths, target in it:
        B = audio.shape[0]  # final flushed batch may be smaller
        assert 1 <= B <= 2 and audio.shape == (B, T16)
        assert audio.dtype == np.float32
        assert target.shape == (B, T16 * 3 // 2)
        assert lengths.dtype == np.int32 and (lengths <= T16).all()
        seen_short |= bool((lengths < T16).any())
    assert seen_short  # the 2000-sample file padded into one window


def test_train_codec_checkpoint_resume_and_metrics(tmp_path):
    mpath = tmp_path / "metrics.jsonl"
    tcfg = _tcfg(checkpoint_every=2, checkpoint_dir=str(tmp_path / "ck"),
                 eval_every=2, eval_batches=1, metrics_path=str(mpath))
    logs = []
    state = train_codec(CFG, tcfg, num_steps=2, log=logs.append)
    assert int(state.step) == 2
    latest = latest_codec_checkpoint(str(tmp_path / "ck"))
    assert latest is not None and latest.endswith("step_00000002")

    state2 = train_codec(CFG, tcfg, num_steps=1, log=logs.append)
    assert int(state2.step) == 3
    assert any("resumed" in l for l in logs)
    # frozen SSL teacher survived the round trip bit-identically
    np.testing.assert_array_equal(
        np.asarray(state.frozen["ssl"]["layers"]["wq"]),
        np.asarray(state2.frozen["ssl"]["layers"]["wq"]))

    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    kinds = {r["kind"] for r in rows}
    assert "train" in kinds and "eval" in kinds
    tr = [r for r in rows if r["kind"] == "train"][-1]
    for k in ("loss", "mel_loss", "semantic_loss", "grad_norm"):
        assert np.isfinite(tr[k]), k
    ev = [r for r in rows if r["kind"] == "eval"][-1]
    assert np.isfinite(ev["eval_loss"])


def test_cli_train_codec_smoke(capsys):
    """`python -m fireredtts2_tpu train --model codec` drives one step on
    the tiny dev config with synthetic batches."""
    from fireredtts2_tpu.__main__ import main

    main(["train", "--model", "codec", "--steps", "1", "--batch-size", "2",
          "--tp", "4", "--log-every", "1", "--window-samples", str(T16)])
    out = capsys.readouterr().out
    assert "step 1: loss" in out
