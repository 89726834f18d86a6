"""bench.py outage-hardening harness (VERDICT r2 #1): the parent must
merge partial stage results into one JSON line and classify transient
(tunnel) failures for retry. These tests cover the pure host logic — the
measurement stages themselves run on the chip (BENCH_r0N.json)."""

import importlib.util
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_transient_classification():
    assert bench._is_transient(
        "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE")
    assert bench._is_transient("DEADLINE_EXCEEDED: deadline exceeded")
    assert bench._is_transient("socket closed by peer")
    assert not bench._is_transient("AssertionError: shapes differ")
    assert not bench._is_transient("KeyError: 'w_gate'")
    # VERDICT r3 #1: an on-chip HBM OOM is a DETERMINISTIC property of the
    # stage — classifying it transient made round 3 respawn into the same
    # OOM until the driver killed the run.
    assert not bench._is_transient(
        "JaxRuntimeError: RESOURCE_EXHAUSTED: TPU backend error "
        "(ResourceExhausted)")


def test_merge_partial_stage_results(tmp_path):
    path = str(tmp_path / "stages.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"stage": "fpl",
                            "data": {"fpl_ms": 60.0, "rtf": 4.0,
                                     "frames": 26, "backend": "tpu"}}) + "\n")
        f.write(json.dumps({"stage": "offline", "error": "UNAVAILABLE",
                            "transient": True}) + "\n")
        f.write("not json\n")
        f.write(json.dumps({"stage": "batched8",
                            "data": {"aggregate_rtf": 13.0,
                                     "per_stream_min_rtf": 1.4,
                                     "n_streams": 8}}) + "\n")
        # a later retry completes the stage that errored before
        f.write(json.dumps({"stage": "offline",
                            "data": {"offline_rtf": 9.8}}) + "\n")
    done, errors, attempts = {}, {}, {}
    bench._merge(path, done, errors, attempts)
    assert done["fpl"]["fpl_ms"] == 60.0
    assert done["offline"]["offline_rtf"] == 9.8   # retry overrode the error
    assert "offline" not in errors
    assert done["batched8"]["per_stream_min_rtf"] == 1.4


def test_merge_keeps_error_for_never_completed_stage(tmp_path):
    path = str(tmp_path / "stages.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"stage": "device", "error": "boom"}) + "\n")
    done, errors, attempts = {}, {}, {}
    bench._merge(path, done, errors, attempts)
    assert errors == {"device": "boom"} and done == {}


def test_transient_stage_retries_exactly_once(tmp_path):
    """Retry-once policy (VERDICT r3 #1): the FIRST transient record for a
    stage leaves it retryable (not in errors, not done — the parent's skip
    list excludes it); the SECOND makes it a permanent stage error."""
    path = str(tmp_path / "stages.jsonl")
    rec = {"stage": "batched16", "error": "UNAVAILABLE: tunnel blip",
           "transient": True}
    with open(path, "w") as f:
        f.write(json.dumps(rec) + "\n")
    done, errors, attempts = {}, {}, {}
    bench._merge(path, done, errors, attempts)
    assert "batched16" not in errors and attempts["batched16"] == 1
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    done, errors, attempts = {}, {}, {}
    bench._merge(path, done, errors, attempts)
    assert "batched16" in errors and attempts["batched16"] == 2


def test_merge_is_idempotent_across_rereads(tmp_path):
    """The results file is append-only and re-read IN FULL on every merge
    with the same persistent dicts (main's loop): one transient record
    must stay one attempt however many times it is merged — otherwise a
    run that dies before re-recording the stage gets it marked permanent
    without its documented retry. A later success must also clear the
    stage from errors even when a prior merge condemned it."""
    path = str(tmp_path / "stages.jsonl")
    rec = {"stage": "batched16", "error": "UNAVAILABLE: tunnel blip",
           "transient": True}
    with open(path, "w") as f:
        f.write(json.dumps(rec) + "\n")
    done, errors, attempts = {}, {}, {}
    for _ in range(3):  # e.g. run 2 and 3 die before touching the stage
        bench._merge(path, done, errors, attempts)
    assert attempts["batched16"] == 1
    assert "batched16" not in errors, "re-merge must not consume the retry"
    # second REAL attempt fails -> now permanent; then a success heals it
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    bench._merge(path, done, errors, attempts)
    assert "batched16" in errors
    with open(path, "a") as f:
        f.write(json.dumps({"stage": "batched16", "data": {"ok": 1}}) + "\n")
    bench._merge(path, done, errors, attempts)
    assert done["batched16"] == {"ok": 1} and "batched16" not in errors
    # out-of-band entries (no file records) survive merges untouched
    errors["backend"] = "TPU backend unavailable until deadline"
    bench._merge(path, done, errors, attempts)
    assert errors["backend"].startswith("TPU backend")


def test_headline_partial_flag_and_stage_fields():
    """The progressive partial line must carry whatever stages landed and
    be parseable on its own (the driver's artifact on a mid-run kill)."""
    done = {"fpl": {"fpl_ms": 55.0, "rtf": 5.0, "frames": 26,
                    "backend": "tpu"},
            "batched32": {"aggregate_rtf": 60.0, "per_stream_min_rtf": 2.0,
                          "host_ms_per_frame": 0.1,
                          "fetch_ms_per_frame": 0.5, "n_streams": 32}}
    line = bench._headline(done, {"device": "boom"}, partial=True)
    rec = json.loads(line)
    assert rec["value"] == 55.0
    assert rec["extra"]["partial"] is True
    assert rec["extra"]["streams32_aggregate_rtf"] == 60.0
    assert rec["extra"]["streams32_fetch_ms_per_frame"] == 0.5
    assert rec["extra"]["streams32_capacity_class"] == {
        "seq": bench._B32_SEQ_CAPACITY, "frames": bench._B32_FRAMES_CAP}
    assert rec["extra"]["stage_errors"] == {"device": "boom"}
    final = json.loads(bench._headline(done, {}))
    assert "partial" not in final["extra"]


def test_b32_memory_gate_math():
    """_slab_bytes must track the capacity class linearly: the B=32
    bounded class costs a fraction of full capacity."""
    from fireredtts2_tpu.config import tiny_engine_config

    cfg = tiny_engine_config()
    full = bench._slab_bytes(cfg, 32, cfg.llm.max_seq_len,
                             cfg.codec.acoustic_decoder.max_stream_latents // 8)
    bounded = bench._slab_bytes(cfg, 32, 128, 8)
    assert 0 < bounded < full


def test_clone_stage_measures_prompt_cache():
    """The clone stage's warm runs must be served from the prompt-token
    cache: exactly 5 true encodes (compile + 3 cold + 1 warm seed), zero
    for the 3 warm repeats."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    tiny_engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    before = tiny_engine.encode_calls
    out = bench._stage_clone(tiny_engine)
    assert set(out) == {"clone_fpl_cold_ms", "clone_fpl_warm_ms",
                        "prompt_encode_ms"}
    assert out["clone_fpl_cold_ms"] > 0 and out["clone_fpl_warm_ms"] > 0
    assert tiny_engine.encode_calls - before == 5


def test_clone8_stage_smoke():
    """The concurrent-clone bench stage runs end-to-end on the tiny
    engine: N threads share the batched decoder, per-stream RTFs land.
    frames=20 > the 18-frame retry bar, so no retry waves fire."""
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    e = FireRedTTS2Engine(config=tiny_engine_config(depth_topk=1), seed=0)
    out = bench._stage_clone8(e, n=2, frames=20)
    assert out["streams"] == 2
    assert out["aggregate_rtf"] > 0
    assert out["per_stream_min_rtf"] > 0


def test_stage_list_covers_verdict_fields():
    """The headline artifact must carry FPL, streaming/offline RTF, the
    clone-path FPL A/B (prompt-token cache win, VERDICT r2 #4), batched
    aggregate AND per-stream-min at 8/16/32/64 streams (64 = the r5
    capacity-ladder probe, VERDICT r4 #8), concurrent clone (clone8) and
    concurrent dialogue (dialogue8, VERDICT r4 #1), and the device
    accounting."""
    assert bench.STAGES == ("fpl", "offline", "clone", "batched8",
                            "batched16", "batched32", "clone8", "device",
                            "dialogue8", "batched64")
