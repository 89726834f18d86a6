"""QA gates + CLI surface tests (tiny engine)."""

import numpy as np
import pytest

from fireredtts2_tpu.serve.qa import (
    QAThresholds, validate_audio_output, QAPipeline,
)


def test_validate_audio_gates(rng):
    sr = 24000
    t = np.arange(sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    # leading quiet fifth: gives the SNR floor estimator real noise windows
    tone[:sr // 5] = 0.0005 * rng.standard_normal(sr // 5)
    rep = validate_audio_output(tone, sr)
    assert rep.passed, rep.failures

    silent = np.zeros(24000, np.float32)
    rep2 = validate_audio_output(silent, sr)
    assert not rep2.passed
    assert "audible" in rep2.failures

    clipped = np.ones(24000, np.float32)
    rep3 = validate_audio_output(clipped, sr)
    assert "not_clipped" in rep3.failures

    empty = np.zeros(0, np.float32)
    assert not validate_audio_output(empty, sr).passed


def test_qa_thresholds_configurable(rng):
    lenient = QAThresholds(min_snr_db=-100, max_silence_ratio=1.0,
                           min_rms=0.0, quality_gate=0.5)
    quietish = (0.001 * rng.standard_normal(24000)).astype(np.float32)
    assert validate_audio_output(quietish, 24000, lenient).passed


def test_cli_parser_smoke(capsys):
    # parser wiring only — no engine build
    from fireredtts2_tpu.__main__ import main
    with pytest.raises(SystemExit):
        main(["--help"])
    with pytest.raises(SystemExit):
        main([])  # missing subcommand
