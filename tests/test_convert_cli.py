"""One-command checkpoint drill (VERDICT r2 #8): `python -m fireredtts2_tpu
convert --pretrained-dir DIR` against SYNTHETIC .pt fixtures in the
reference layout (fireredtts2/fireredtts2.py:16-43) — convert to Orbax,
record goldens on first run, validate token-exactly on re-runs, flag
mismatches. The moment real weights are reachable, validation is one run.
"""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fireredtts2_tpu.config import (  # noqa: E402
    CodecConfig, FLAVORS, tiny_engine_config)
from fireredtts2_tpu.runtime.convert import run_convert  # noqa: E402


TINY = tiny_engine_config()


def _write_fixture_dir(d: str) -> None:
    from tests.test_parity_codec import _build_reference_codec
    from tests.test_parity_loss import TorchDualModel

    llm_cfg = TINY.llm
    with open(os.path.join(d, "config_llm.json"), "w") as f:
        json.dump({"llm_models": {
            "backbone_flavor": llm_cfg.backbone_flavor,
            "decoder_flavor": llm_cfg.decoder_flavor,
            "text_vocab_size": llm_cfg.text_vocab_size,
            "audio_vocab_size": llm_cfg.audio_vocab_size,
            "audio_num_codebooks": llm_cfg.audio_num_codebooks,
            "decoder_loss_weight": llm_cfg.decoder_loss_weight,
        }}, f)
    with open(os.path.join(d, "config_codec.json"), "w") as f:
        json.dump({"codec": {}}, f)  # dims ride codec_overrides below

    torch.manual_seed(0)
    lm = TorchDualModel(llm_cfg, bb=FLAVORS[llm_cfg.backbone_flavor],
                        dec=FLAVORS[llm_cfg.decoder_flavor])
    torch.save({"model": lm.state_dict()},
               os.path.join(d, "llm_posttrain.pt"))
    codec = _build_reference_codec()
    torch.save({"generator": codec.state_dict()},
               os.path.join(d, "codec.pt"))


def _overrides():
    llm_over = {"max_seq_len": TINY.llm.max_seq_len, "dtype": "float32"}
    codec_over = {f.name: getattr(TINY.codec, f.name)
                  for f in dataclasses.fields(CodecConfig)}
    return llm_over, codec_over


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pretrained"))
    _write_fixture_dir(d)
    return d


def test_convert_records_then_validates_goldens(fixture_dir):
    llm_over, codec_over = _overrides()
    s1 = run_convert(fixture_dir, llm_overrides=llm_over,
                     codec_overrides=codec_over)
    assert set(s1["converted"]) == {"codec.pt", "llm_posttrain.pt"}
    assert all(v == "recorded" for v in s1["parity"].values())
    assert s1["parity_ok"]
    # Orbax trees persisted
    assert os.path.isdir(os.path.join(fixture_dir, "jax", "codec"))
    assert os.path.isdir(os.path.join(fixture_dir, "jax", "llm_posttrain"))
    g = json.load(open(os.path.join(fixture_dir, "goldens.json")))
    assert g["codec_tokens"] and g["lm_frames[llm_posttrain.pt]"]

    # second run validates token-exactly against the recorded goldens
    s2 = run_convert(fixture_dir, llm_overrides=llm_over,
                     codec_overrides=codec_over)
    assert all(v == "ok" for v in s2["parity"].values())
    assert s2["parity_ok"]


def test_convert_flags_mismatched_goldens(fixture_dir):
    llm_over, codec_over = _overrides()
    gpath = os.path.join(fixture_dir, "goldens.json")
    g = json.load(open(gpath))
    good = dict(g)
    g["codec_tokens"] = [int(t) + 1 for t in g["codec_tokens"]]
    json.dump(g, open(gpath, "w"))
    try:
        s = run_convert(fixture_dir, llm_overrides=llm_over,
                        codec_overrides=codec_over)
        assert s["parity"]["codec_tokens"] == "MISMATCH"
        assert not s["parity_ok"]
    finally:
        json.dump(good, open(gpath, "w"))


def test_convert_fidelity_report(fixture_dir):
    llm_over, codec_over = _overrides()
    s = run_convert(fixture_dir, fidelity=True, llm_overrides=llm_over,
                    codec_overrides=codec_over)
    fid = s["fidelity"]
    # random weights -> garbage transcript; the report just has to exist
    # with finite metrics (the harness itself is parity-tested elsewhere)
    assert 0.0 <= fid["cer"] or fid["cer"] >= 0.0
    assert np.isfinite(fid["wer"]) and np.isfinite(fid["cer"])


def test_convert_missing_lm_checkpoint_raises(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "config_llm.json"), "w") as f:
        json.dump({"llm_models": {
            "backbone_flavor": "tiny", "decoder_flavor": "tiny-deep",
            "text_vocab_size": 300, "audio_vocab_size": 64,
            "audio_num_codebooks": 4, "decoder_loss_weight": 0.5}}, f)
    with open(os.path.join(d, "config_codec.json"), "w") as f:
        json.dump({"codec": {}}, f)
    with pytest.raises(FileNotFoundError):
        llm_over, codec_over = _overrides()
        run_convert(d, llm_overrides=llm_over, codec_overrides=codec_over)


def test_engine_serves_orbax_trees_without_torch(fixture_dir):
    """After the drill, the engine prefers DIR/jax/ (Orbax) and loads
    WITHOUT the torch pickles — same audio as the torch path bit-for-bit
    (identical dtype policies in runtime/checkpoint.py:load_converted_*)."""
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    llm_over, codec_over = _overrides()
    if not os.path.isdir(os.path.join(fixture_dir, "jax", "codec")):
        run_convert(fixture_dir, llm_overrides=llm_over,
                    codec_overrides=codec_over)
    kw = dict(pretrained_dir=fixture_dir, gen_type="dialogue",
              llm_overrides=llm_over, codec_overrides=codec_over)

    jax_dir = os.path.join(fixture_dir, "jax")
    os.rename(jax_dir, jax_dir + ".hidden")  # force the torch path
    try:
        audio_torch = FireRedTTS2Engine(**kw).generate(
            "Hello there.", "[S1]", [], max_audio_length_ms=240)
    finally:
        os.rename(jax_dir + ".hidden", jax_dir)

    hidden = []
    for n in ("llm_posttrain.pt", "codec.pt"):  # force the Orbax path
        p = os.path.join(fixture_dir, n)
        os.rename(p, p + ".hidden")
        hidden.append(p)
    try:
        audio_orbax = FireRedTTS2Engine(**kw).generate(
            "Hello there.", "[S1]", [], max_audio_length_ms=240)
    finally:
        for p in hidden:
            os.rename(p + ".hidden", p)

    np.testing.assert_array_equal(audio_torch, audio_orbax)
