"""Headline benchmark: first-packet latency + realtime factors of streaming
synthesis on the flagship model (qwen-1.5b backbone, 16-codebook 12.5 Hz
codec, bf16 + int8 backbone + fused depth-chain Pallas kernel), single chip.

Baseline: the reference reports "as low as 140 ms" first-packet latency on
an NVIDIA L20 (reference README.md:30; BASELINE.md). vs_baseline is
baseline_ms / our_ms (>1 = faster than the reference's number).

Prints a headline JSON line
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ..., "extra": {...}}
after EVERY completed stage (marked "partial": true) and a final complete
line last — so a driver-side kill at any point still leaves a parseable
artifact on stdout (VERDICT r3: round 3's artifact was rc=124/parsed:null
because results only flushed at normal exit).

Outage hardening (VERDICT r2 #1): this file is a PARENT orchestrator that
never imports jax. It (a) probes the TPU backend in a throwaway subprocess
with bounded retry/backoff (a failed backend init is cached process-wide by
jax, so the probe must not share the parent's process), (b) runs the
measurement stages in a WORKER subprocess (`bench.py --worker`) that
appends one JSON line per completed stage to a results file, and (c) on
worker death respawns it with the completed stages skipped.

Failure classification (VERDICT r3 #1): an on-chip OOM (RESOURCE_EXHAUSTED)
is a PERMANENT stage failure — recorded, stage skipped, worker continues
in-process (round 3 respawned into the same B=32 OOM until the driver
killed it). Genuinely transient tunnel failures retry, but at most ONCE
per stage: the second transient failure of the same stage is recorded as
permanent and the remaining stages proceed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


BASELINE_FIRST_PACKET_MS = 140.0
# Order = execution order under the deadline: every r4 stage keeps its
# slot (incl. the budget-guarded `device`), the two r5 probes run LAST so
# a deadline kill costs the probes, not the headline fields (the partial
# line flushes after every stage either way).
STAGES = ("fpl", "offline", "clone", "batched8", "batched16", "batched32",
          "clone8", "device", "dialogue8", "batched64")
_RETRYABLE_RC = 17
# RESOURCE_EXHAUSTED is deliberately NOT here: on TPU it means HBM OOM — a
# deterministic property of the stage, not a tunnel blip (VERDICT r3 #1).
_TRANSIENT_MARKERS = (
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "INTERNAL",
    "Unable to initialize backend", "axon", "socket", "Connection",
    "connection", "timed out", "ABORTED",
)
# B=32 capacity class (VERDICT r3 #4): full 3100-position KV slabs at 32
# streams exceed a v5e's 16 GB, so the 32-stream pool runs a bounded
# capacity class — 1024 LM positions (prompt bucket + frames) and a
# 128-frame (10.2 s) utterance cap sizing the vocoder slab at 1024
# latents. ~1/6 the slab HBM of full capacity per slot.
_B32_SEQ_CAPACITY = 1024
_B32_FRAMES_CAP = 128
# B=64 capacity-class ladder probe (VERDICT r4 #8): halving the class to
# (512 positions, 64 frames = 5.1 s utterances) makes 64 slots cost the
# SAME slab HBM as the 32-slot (1024, 128) class — the open question is
# whether aggregate RTF keeps scaling or 32 was the knee.
_B64_SEQ_CAPACITY = 512
_B64_FRAMES_CAP = 64


def _is_transient(msg: str) -> bool:
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _headline(done: dict, errors: dict, partial: bool = False) -> str:
    """The artifact line, built from whatever stages have landed."""
    fpl = done.get("fpl", {})
    b8, b16 = done.get("batched8", {}), done.get("batched16", {})
    b32 = done.get("batched32", {})
    b64 = done.get("batched64", {})
    fp_ms = fpl.get("fpl_ms")
    extra = {
        "realtime_factor": fpl.get("rtf"),
        "frames": fpl.get("frames"),
        "offline_rtf": done.get("offline", {}).get("offline_rtf"),
        "batched_streams": 8 if b8 else None,
        "batched_aggregate_rtf": b8.get("aggregate_rtf"),
        "batched_per_stream_min_rtf": b8.get("per_stream_min_rtf"),
        "streams16_aggregate_rtf": b16.get("aggregate_rtf"),
        "streams16_per_stream_min_rtf": b16.get("per_stream_min_rtf"),
        "streams16_host_ms_per_frame": b16.get("host_ms_per_frame"),
        "streams16_fetch_ms_per_frame": b16.get("fetch_ms_per_frame"),
        "streams32_aggregate_rtf": b32.get("aggregate_rtf"),
        "streams32_per_stream_min_rtf": b32.get("per_stream_min_rtf"),
        "streams32_host_ms_per_frame": b32.get("host_ms_per_frame"),
        "streams32_fetch_ms_per_frame": b32.get("fetch_ms_per_frame"),
        "streams32_capacity_class": (
            {"seq": _B32_SEQ_CAPACITY, "frames": _B32_FRAMES_CAP}
            if b32 else None),
        "streams64_aggregate_rtf": b64.get("aggregate_rtf"),
        "streams64_per_stream_min_rtf": b64.get("per_stream_min_rtf"),
        "streams64_host_ms_per_frame": b64.get("host_ms_per_frame"),
        "streams64_fetch_ms_per_frame": b64.get("fetch_ms_per_frame"),
        "streams64_capacity_class": (
            {"seq": _B64_SEQ_CAPACITY, "frames": _B64_FRAMES_CAP}
            if b64 else None),
        "backend": fpl.get("backend"),
        **done.get("clone", {}),
        **{f"clone8_{k}": v for k, v in done.get("clone8", {}).items()},
        **{f"dialogue8_{k}": v for k, v in done.get("dialogue8", {}).items()},
        **done.get("device", {}),
    }
    if errors:
        extra["stage_errors"] = errors
    if partial:
        extra["partial"] = True
    return json.dumps({
        "metric": "first_packet_latency_ms_streaming_flagship",
        "value": round(fp_ms, 2) if fp_ms else None,
        "unit": "ms",
        "vs_baseline": (round(BASELINE_FIRST_PACKET_MS / fp_ms, 3)
                        if fp_ms else None),
        "extra": extra,
    })


def _merge(path: str, done: dict, errors: dict, attempts: dict) -> None:
    """Fold the worker's per-stage records into done/errors. A transient
    failure becomes permanent on its SECOND occurrence for the same stage
    (retry-once policy, VERDICT r3 #1).

    The results file is APPEND-ONLY and re-read in full on every call, so
    all transient counts are rebuilt from the file alone (one record per
    actual attempt) rather than accumulated into the caller's dict —
    otherwise a run that dies before re-recording a stage would re-count
    the old attempt on the next merge and mark the stage permanently
    failed without its documented retry."""
    if not os.path.exists(path):
        return
    fdone: dict = {}
    ferrors: dict = {}
    counts: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            stage = rec.get("stage")
            if "data" in rec:
                fdone[stage] = rec["data"]
                ferrors.pop(stage, None)
            elif stage in fdone:
                continue
            elif rec.get("transient"):
                n = counts.get(stage, 0) + 1
                counts[stage] = n
                if n >= 2:
                    ferrors[stage] = rec.get("error", "?")
            else:
                ferrors[stage] = rec.get("error", "?")
    done.update(fdone)
    attempts.clear()
    attempts.update(counts)
    errors.update(ferrors)
    for stage in list(errors):
        # un-mark stages the file no longer condemns (completed later, or
        # transient-once awaiting their retry); out-of-band entries like
        # "backend" have no file records and are left untouched
        if stage in done or (stage not in ferrors and stage in counts):
            errors.pop(stage, None)


# ---------------------------------------------------------------------------
# Parent: probe / spawn / merge. No jax imports at this level.
# ---------------------------------------------------------------------------


def _probe_backend(timeout_s: float = 240.0) -> bool:
    """Run one tiny device matmul in a throwaway subprocess; True if the
    chip answered. np.asarray (not block_until_ready) per CLAUDE.md: scalar
    results can return before the relay finishes. The probe REQUIRES a
    non-CPU backend (unless BENCH_ALLOW_CPU=1, for harness tests): a silent
    jax CPU fallback would otherwise produce a valid-looking rc=0 artifact
    full of CPU-speed numbers."""
    platform_check = ("" if os.environ.get("BENCH_ALLOW_CPU") == "1" else
                      "assert jax.default_backend() != 'cpu', 'cpu fallback';")
    code = ("import jax, numpy as np;" + platform_check +
            "x = jax.numpy.ones((8, 128));"
            "print(float(np.asarray(x @ x.T)[0][0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(deadline: float) -> bool:
    backoff = 20.0
    while True:
        if _probe_backend():
            return True
        if time.time() + backoff >= deadline:
            return False
        print(f"[bench] backend unavailable; retrying in {backoff:.0f}s",
              file=sys.stderr)
        time.sleep(backoff)
        backoff = min(backoff * 2, 120.0)


def main() -> int:
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE_S", 2700))
    results_path = os.environ.get("BENCH_RESULTS", "/tmp/frtts2_bench_stages.jsonl")
    try:
        os.unlink(results_path)
    except FileNotFoundError:
        pass

    done: dict[str, dict] = {}
    errors: dict[str, str] = {}
    attempts: dict[str, int] = {}
    respawns = 0
    while len(done) + len(errors) < len(STAGES) and respawns < 6:
        if not _wait_for_backend(deadline):
            errors.setdefault("backend", "TPU backend unavailable until deadline")
            break
        budget = deadline - time.time()
        if budget < 60:
            break
        skip = ",".join(list(done) + list(errors))
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--results", results_path]
        if skip:
            cmd += ["--skip", skip]
        try:
            r = subprocess.run(cmd, timeout=min(budget, 2400))
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -1
        _merge(results_path, done, errors, attempts)
        if rc == 0:
            break
        respawns += 1
        print(f"[bench] worker exited rc={rc}; respawn {respawns}",
              file=sys.stderr)
        if rc in (-6, 134):
            # SIGABRT: a killed compile can leave a TRUNCATED entry in the
            # persistent compile cache that hard-aborts every reader
            # (jax compilation_cache deserialization). Clear it or every
            # respawn dies the same way (CLAUDE.md gotcha).
            cache = os.environ.get("FIREREDTTS2_JAX_CACHE",
                                   "/tmp/frtts2_jax_cache")
            print(f"[bench] SIGABRT — clearing compile cache {cache}",
                  file=sys.stderr)
            import shutil
            shutil.rmtree(cache, ignore_errors=True)
        time.sleep(15)

    _merge(results_path, done, errors, attempts)
    print(_headline(done, errors))
    return 0 if done.get("fpl", {}).get("fpl_ms") else 1


# ---------------------------------------------------------------------------
# Worker: builds the engine once, runs remaining stages, appends one JSON
# line per stage AND prints the running partial headline to stdout after
# each (the parent inherits stdout, so a driver kill still leaves the
# latest partial line in the captured output). Exits 17 on a transient
# (tunnel) failure so the parent respawns; any other stage failure —
# including an on-chip OOM — is recorded and the worker continues to the
# next stage in-process.
# ---------------------------------------------------------------------------


def worker(results_path: str, skip: set[str]) -> int:
    import jax

    if (jax.default_backend() == "cpu"
            and os.environ.get("BENCH_ALLOW_CPU") != "1"):
        # The tunnel died between the parent's probe and our jax init and
        # jax fell back to CPU — CPU numbers must never enter the artifact.
        print("[bench-worker] jax came up on CPU (tunnel fallback); retrying",
              file=sys.stderr)
        return _RETRYABLE_RC

    from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
    from fireredtts2_tpu.engine import FireRedTTS2Engine

    def emit(stage: str, data=None, error=None, transient=False):
        with open(results_path, "a") as f:
            rec = {"stage": stage}
            if data is not None:
                rec["data"] = data
            if error is not None:
                rec["error"] = error
            if transient:
                rec["transient"] = True
            f.write(json.dumps(rec) + "\n")
        # progressive partial artifact: merge EVERYTHING recorded so far
        # (previous workers included) and flush one partial headline line
        done, errors, attempts = {}, {}, {}
        _merge(results_path, done, errors, attempts)
        print(_headline(done, errors, partial=True), flush=True)

    # Serving configuration: int8 backbone + the fused depth-chain Pallas
    # kernel (whole 15-step depth decode in ONE pallas_call). Measured LM
    # floor on v5e: 12.1 (bf16) -> 7.4 (int8 XLA loop) -> 6.5 ms/frame
    # (fused kernel) — tools/devtime.py, PERF.md. Vocoder stays bf16
    # (int8 there measured SLOWER at batch under XLA).
    llm = LLMConfig(backbone_flavor="qwen-1.5b", decoder_flavor="qwen-200m",
                    text_vocab_size=152_000, audio_vocab_size=2051,
                    audio_num_codebooks=16, max_seq_len=3100, dtype="bfloat16",
                    quantize_backbone=True,
                    fused_depth_plan="gate=r8,up=s8,down=s8")
    codec = CodecConfig(dtype="bfloat16")
    engine = FireRedTTS2Engine(config=EngineConfig(llm=llm, codec=codec),
                               seed=0)
    text = ("Hello there, welcome to the show. Today we are going to talk "
            "about streaming text to speech on tensor processing units.")

    stage_fns = {
        "fpl": lambda: _stage_fpl(engine, text, jax),
        "offline": lambda: {"offline_rtf": round(_bench_offline(engine, text), 2)},
        "clone": lambda: _stage_clone(engine),
        "batched8": lambda: _bench_batched(engine, 8),
        "batched16": lambda: _bench_batched(engine, 16),
        "batched32": lambda: _stage_batched32(engine, jax),
        "batched64": lambda: _stage_batched64(engine, jax),
        "clone8": lambda: _stage_clone8(engine),
        "dialogue8": lambda: _stage_dialogue8(engine),
        "device": lambda: _bench_device(engine, llm),
    }
    for stage in STAGES:
        if stage in skip:
            continue
        try:
            emit(stage, data=stage_fns[stage]())
        except Exception as e:  # noqa: BLE001 — must classify and keep going
            msg = f"{type(e).__name__}: {e}"
            transient = _is_transient(msg)
            emit(stage, error=msg, transient=transient)
            if transient:
                print(f"[bench-worker] transient failure in {stage}: {msg}",
                      file=sys.stderr)
                return _RETRYABLE_RC
            import traceback
            traceback.print_exc()
    return 0


def _stage_fpl(engine, text: str, jax) -> dict:
    def run(n_frames: int):
        t0 = time.perf_counter()
        samples = chunks = 0
        for chunk in engine.generate_stream(text, "[S1]", [],
                                            max_audio_length_ms=n_frames * 80):
            samples += chunk.shape[0]
            chunks += 1
        return engine._first_packet_s, samples, time.perf_counter() - t0, chunks

    run(50)  # compiles prefill bucket + all block sizes
    # 50 frames = 4 s of audio (block schedule reaches its cap). Min of 3:
    # the tunneled host link has ±25% wall-clock noise.
    runs = [run(50) for _ in range(3)]
    return {
        "fpl_ms": round(min(r[0] for r in runs) * 1000.0, 2),
        "rtf": round(max(r[1] for r in runs) / 24_000.0
                     / min(r[2] for r in runs), 2),
        "frames": runs[0][3],
        "backend": jax.default_backend(),
    }


def _stage_clone(engine) -> dict:
    """Voice-clone path: streaming FPL WITH a prompt segment, cold (full
    32-layer SSL + RVQ prompt encode + full prefill) vs cached (per-voice
    prompt-token cache + KV prefix cache: the warm runs copy the cached
    context KV slab and prefill only the new text,
    engine/engine.py:_tokenize_audio/_context_state). The delta is the
    per-request win of storing tokens + prefix KV per voice — the
    reference re-encodes AND re-prefills the prompt on every call
    (/root/reference/fireredtts2/fireredtts2.py:90-115)."""
    import numpy as np
    from fireredtts2_tpu.engine.engine import Segment

    rng = np.random.default_rng(0)
    text = "Cloned voice benchmark sentence for the prompt token cache."

    def run(audio16k):
        seg = Segment(speaker="[S1]", text="A short voice prompt.",
                      audio=audio16k)
        for _ in engine.generate_stream(text, "[S1]", [seg],
                                        max_audio_length_ms=12 * 80):
            pass
        return engine._first_packet_s * 1000.0

    def noise():
        # fresh content every time -> guaranteed token-cache miss; encode
        # cost is content-independent (fixed-shape device programs)
        return (rng.standard_normal(24_000) * 0.05).astype(np.float32)

    run(noise())  # compiles the encode program + this prompt-length bucket
    colds = [run(noise()) for _ in range(3)]
    warm_audio = noise()
    run(warm_audio)  # populate the cache entry that the warm runs hit
    warms = [run(warm_audio) for _ in range(3)]
    return {
        "clone_fpl_cold_ms": round(min(colds), 2),
        "clone_fpl_warm_ms": round(min(warms), 2),
        "prompt_encode_ms": round(min(colds) - min(warms), 2),
    }


def _bench_offline(engine, text: str) -> float:
    """Offline generate() realtime factor (whole-utterance program +
    grouped vocoder scan)."""
    def run():
        t0 = time.perf_counter()
        audio = engine.generate(text, "[S1]", [], max_audio_length_ms=8000)
        return (len(audio) / 24_000.0) / (time.perf_counter() - t0)

    run()  # compile
    return max(run(), run())


def _stage_clone8(engine, n: int = 8, frames: int = 100) -> dict:
    """8 CONCURRENT voice-clone requests through the shared batched
    decoder (runtime/batcher.py:generate_monologue_clone — VERDICT r3 #3:
    the reference serializes clone requests on one worker; round 3 of
    this framework did too). Per-stream RTF = produced audio seconds over
    request wall. frames=100 (8 s of audio each) keeps the stage fast;
    concurrency, not length, is what it certifies."""
    import threading

    import numpy as np
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    rng = np.random.default_rng(1)
    prompt_audio = (rng.standard_normal(24_000) * 0.05).astype(np.float32)
    text = ("A cloned voice speaking a benchmark sentence about batched "
            "decoding on tensor processing units.")
    batcher = ContinuousBatcher(engine, max_streams=n)
    batcher.start()
    batcher.wait_ready(timeout=3600)
    try:
        def wave():
            walls = [None] * n
            audios = [None] * n

            def run(i):
                t0 = time.perf_counter()
                audios[i] = batcher.generate_monologue_clone(
                    text, prompt_text="A short voice prompt.",
                    prompt_audio=prompt_audio, max_frames=frames)
                walls[i] = time.perf_counter() - t0

            t0 = time.perf_counter()
            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            rtfs = [len(a) / 24_000.0 / w for a, w in zip(audios, walls)
                    if a is not None and w]
            total = sum(len(a) for a in audios if a is not None) / 24_000.0
            return rtfs, total / wall

        wave()                         # compile (bucket + block shapes)
        rtfs, agg = wave()
        return {
            "streams": n,
            "per_stream_min_rtf": round(min(rtfs), 3) if rtfs else None,
            "per_stream_p50_rtf": (round(sorted(rtfs)[len(rtfs) // 2], 3)
                                   if rtfs else None),
            "aggregate_rtf": round(agg, 2),
        }
    finally:
        batcher.stop()


def _stage_dialogue8(engine, n: int = 8, utt_frames: int = 40) -> dict:
    """8 CONCURRENT 2-speaker dialogue sessions through the shared batched
    decoder (runtime/batcher.py:run_dialogue — VERDICT r4 #1: dialogue is
    the reference's flagship mode, fireredtts2/fireredtts2.py:345-403, and
    was this framework's last thread-per-request serving path). Each
    session is 3 utterances decoding as per-utterance slot occupancies
    with a carried KV prefix; the per-turn audio-feedback codec encode is
    part of the measured wall (it is part of the mode). Per-stream RTF =
    produced audio seconds over session wall."""
    import threading

    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    texts = ["[S1]Hello there, how are you doing on this fine day?",
             "[S2]I am doing very well, thank you for asking about it.",
             "[S1]Great to hear that, let us talk about processing units."]
    batcher = ContinuousBatcher(engine, max_streams=n)
    batcher.start()
    batcher.wait_ready(timeout=3600)
    try:
        def wave():
            walls = [None] * n
            secs = [0.0] * n

            def run(i):
                t0 = time.perf_counter()
                s = 0
                for _, c in batcher.run_dialogue(
                        list(texts), max_utterance_ms=utt_frames * 80):
                    s += len(c)
                secs[i] = s / 24_000.0
                walls[i] = time.perf_counter() - t0

            t0 = time.perf_counter()
            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            rtfs = [s / w for s, w in zip(secs, walls) if w and s > 0]
            return rtfs, sum(secs) / wall

        wave()                   # compile (prefix admissions + feedback encode)
        rtfs, agg = wave()
        return {
            "streams": n,
            "utterances": len(texts),
            "per_stream_min_rtf": round(min(rtfs), 3) if rtfs else None,
            "per_stream_p50_rtf": (round(sorted(rtfs)[len(rtfs) // 2], 3)
                                   if rtfs else None),
            "aggregate_rtf": round(agg, 2),
        }
    finally:
        batcher.stop()


def _bench_device(engine, llm_cfg) -> dict:
    """Measured LM device ms/frame + analytic MFU/MBU + budget check
    against perf_budget.json (fails loudly in the JSON, not the exit code:
    the driver records the line either way)."""
    from fireredtts2_tpu.runtime.perf import (
        measure_lm_device_ms_per_frame, utilization)

    dq = 1.0 if (engine.config.llm.quantize_depth
                 or engine.config.llm.fused_depth_plan) else 2.0
    bq = 1.0 if engine.config.llm.quantize_backbone else 2.0
    ms = measure_lm_device_ms_per_frame(engine.lm_params, llm_cfg, frames=100)
    u = utilization(llm_cfg, ms, batch=1, depth_bytes_per_param=dq,
                    backbone_bytes_per_param=bq)
    out = {
        "device_ms_per_frame": round(ms, 2),
        "mfu": round(u["mfu"], 4),
        "mbu": round(u["mbu"], 3),
        "chip": u["chip"],
    }
    try:
        # VERDICT r2 #3's other bar: LM device <= 9 ms/frame at B=8. A
        # fresh B=8 config (max_batch_size drives the compiled step's
        # state shape); failure here must not kill the B=1 numbers.
        import dataclasses
        ms8 = measure_lm_device_ms_per_frame(
            engine.lm_params, dataclasses.replace(llm_cfg, max_batch_size=8),
            frames=100, batch=8)
        out["device_ms_per_frame_b8"] = round(ms8, 2)
    except Exception as e:  # noqa: BLE001
        out["device_b8_error"] = f"{type(e).__name__}: {e}"
    budget_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "perf_budget.json")
    if os.path.exists(budget_path):
        with open(budget_path) as f:
            budget = json.load(f)
        cap = budget.get("lm_device_ms_per_frame")
        if cap is not None:
            out["device_ms_budget"] = cap
            out["budget_ok"] = bool(ms <= cap * 1.15)
    return out


def _slab_bytes(cfg, n_streams: int, seq_capacity: int, frames_cap: int) -> int:
    """Analytic HBM for the batched pool's KV slabs (the allocation the
    B=32 memory gate must predict — weights are already resident)."""
    from fireredtts2_tpu.models.lm.model import kv_capacity
    from fireredtts2_tpu.runtime.batcher import voc_latent_capacity

    bb = cfg.llm.backbone
    bytes_el = 2  # bf16 states
    lm = (bb.num_layers * n_streams * kv_capacity(seq_capacity)
          * bb.num_kv_heads * bb.head_dim * 2 * bytes_el)
    ac = cfg.codec.acoustic_decoder
    latents = voc_latent_capacity(ac, frames_cap)
    voc = ac.num_layers * n_streams * latents * ac.embed_dim * 2 * bytes_el
    return lm + voc


def _stage_batched32(engine, jax) -> dict:
    """32 concurrent streams in a bounded CAPACITY CLASS (module constants
    above), gated by an analytic slab-size check against the device's live
    memory stats — a predictable OOM must cost a recorded skip, not a
    respawn loop (VERDICT r3 #1/#4)."""
    est = _slab_bytes(engine.config, 32, _B32_SEQ_CAPACITY, _B32_FRAMES_CAP)
    stats = {}
    try:
        stats = engine_device_memory_stats(jax)
    except Exception:  # noqa: BLE001 — stats are advisory
        pass
    limit, used = stats.get("bytes_limit"), stats.get("bytes_in_use")
    if limit and used is not None:
        free = limit - used
        if est > free * 0.8:
            raise RuntimeError(
                f"batched32 skipped by memory gate: slabs need "
                f"~{est / 1e9:.2f} GB, free HBM {free / 1e9:.2f} GB")
    return _bench_batched(engine, 32, seq_capacity=_B32_SEQ_CAPACITY,
                          frames_cap=_B32_FRAMES_CAP)


def _stage_batched64(engine, jax) -> dict:
    """64 concurrent streams in the halved (512, 64) class — same slab
    HBM as the 32-stream class (VERDICT r4 #8: the 32-stream point left
    ~5x aggregate-RTF headroom at 0.56 ms/frame fetch; this probes
    whether scaling continues or 32 was the knee). Same memory gate."""
    est = _slab_bytes(engine.config, 64, _B64_SEQ_CAPACITY, _B64_FRAMES_CAP)
    stats = {}
    try:
        stats = engine_device_memory_stats(jax)
    except Exception:  # noqa: BLE001
        pass
    limit, used = stats.get("bytes_limit"), stats.get("bytes_in_use")
    if limit and used is not None and est > (limit - used) * 0.8:
        raise RuntimeError(
            f"batched64 skipped by memory gate: slabs need "
            f"~{est / 1e9:.2f} GB, free HBM {(limit - used) / 1e9:.2f} GB")
    return _bench_batched(engine, 64, seq_capacity=_B64_SEQ_CAPACITY,
                          frames_cap=_B64_FRAMES_CAP)


def engine_device_memory_stats(jax) -> dict:
    d = jax.local_devices()[0]
    return d.memory_stats() or {}


def _bench_batched(engine, n_streams: int, n_frames: int = 50,
                   seq_capacity=None, frames_cap=None) -> dict:
    """Aggregate + per-stream-min realtime factor across concurrent batched
    streams (production-side timestamps on StreamHandle, so a slow consumer
    loop cannot distort per-stream numbers)."""
    from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(engine, max_streams=n_streams,
                                seq_capacity=seq_capacity,
                                max_frames_cap=frames_cap)
    batcher.start()
    batcher.wait_ready(timeout=3600)  # ladder+prefill compile, not serving
    try:
        texts = [f"Stream number {i}: a short benchmark sentence about "
                 f"tensor processing units and speech synthesis."
                 for i in range(n_streams)]
        # warmup (compiles batched steps + burst-sized slot prefill)
        warm = [batcher.submit(t, "[S1]", max_audio_length_ms=4 * 80)
                for t in texts]
        for h in warm:
            for _ in h:
                pass
        batcher.reset_host_stats()  # keep compile out of the attribution
        t0 = time.perf_counter()
        handles = [batcher.submit(t, "[S1]", max_audio_length_ms=n_frames * 80)
                   for t in texts]
        total_samples = 0
        for h in handles:
            for c in h:
                total_samples += len(c)
        wall = time.perf_counter() - t0
        per_stream = [h.samples / 24_000.0 / h.finished_s
                      for h in handles if h.finished_s]
        host = batcher.host_stats()
        return {
            "aggregate_rtf": round((total_samples / 24_000.0) / wall, 2),
            "per_stream_min_rtf": (round(min(per_stream), 3)
                                   if per_stream else None),
            "n_streams": n_streams,
            # host-side cost attribution (dispatch + fanout = pure host
            # overhead per frame; fetch includes device wait)
            "host_ms_per_frame": round(host["host_ms_per_frame"], 3),
            "fetch_ms_per_frame": round(host["fetch_ms_per_frame"], 3),
        }
    finally:
        batcher.stop()


if __name__ == "__main__":
    if "--worker" in sys.argv:
        args = sys.argv[sys.argv.index("--worker"):]
        results = args[args.index("--results") + 1]
        skip = set()
        if "--skip" in args:
            skip = set(args[args.index("--skip") + 1].split(","))
        sys.exit(worker(results, skip))
    sys.exit(main())
