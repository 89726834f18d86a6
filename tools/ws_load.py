"""WebSocket serving load generator: N concurrent streaming clients.

Measures the 16-concurrent-streams serving bar (BASELINE.json) at the
PROTOCOL level — socket -> JSON -> hex-PCM16 chunks — so host-side costs
(batcher fan-out, asyncio send path, pcm16 hex encode) are inside the
measurement, unlike tools/batched_rtf.py which stops at StreamHandle.
Replaces the reference's serialized single-stream worker measurement
(enhanced_fireredtts2.py:408-447).

Usage:
  python tools/ws_load.py --self-host tiny --streams 8          # CPU check
  python tools/ws_load.py --self-host flagship --streams 16     # on chip
  python tools/ws_load.py --port 8765 --streams 16              # live server

Prints one JSON line:
  {"streams": N, "ok": n, "errors": n,
   "fpl_ms": {"p50":..., "p95":..., "max":...},
   "per_stream_rtf": {"min":..., "p50":...},
   "aggregate_rtf":..., "wall_s":...}
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(xs, q):
    if not xs:
        return None
    xs = sorted(xs)
    i = min(len(xs) - 1, int(round(q * (len(xs) - 1))))
    return round(xs[i], 2)


async def _one_client(uri: str, text: str, max_ms: float, out: list) -> None:
    import websockets

    rec = {"fpl_ms": None, "audio_s": 0.0, "wall_s": None, "error": None}
    t0 = time.perf_counter()
    try:
        async with websockets.connect(uri, max_size=1 << 24) as ws:
            await ws.send(json.dumps({
                "type": "generate_speech", "text": text, "streaming": True,
                "max_audio_length_ms": max_ms}))
            sr = 24_000
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 600))
                if msg["type"] == "audio_chunk":
                    if rec["fpl_ms"] is None:
                        rec["fpl_ms"] = (time.perf_counter() - t0) * 1000.0
                    sr = msg.get("sample_rate", sr)
                    rec["audio_s"] += len(msg["data"]) / 4.0 / sr  # hex pcm16
                elif msg["type"] == "generation_complete":
                    break
                elif msg["type"] == "error":
                    rec["error"] = msg.get("error", "?")
                    break
    except Exception as e:  # noqa: BLE001 — load tool reports, not raises
        rec["error"] = f"{type(e).__name__}: {e}"
    rec["wall_s"] = time.perf_counter() - t0
    out.append(rec)


async def run_load(uri: str, n_streams: int, text: str, max_ms: float,
                   warmup: bool = True, after_warmup=None) -> dict:
    if warmup:  # compile the batched programs before the timed wave
        # Same text + max_ms as the timed wave: the whole-utterance LM
        # program is shape-specialized on the frame budget, so a shorter
        # warmup would leave the real program to compile inside the timing.
        w: list = []
        await asyncio.gather(*[
            _one_client(uri, text, max_ms, w) for _ in range(n_streams)])
        if after_warmup is not None:  # e.g. reset host-cost attribution
            after_warmup()
    out: list = []
    t0 = time.perf_counter()
    await asyncio.gather(*[
        _one_client(uri, text, max_ms, out) for _ in range(n_streams)])
    wall = time.perf_counter() - t0
    ok = [r for r in out if r["error"] is None and r["audio_s"] > 0]
    rtfs = [r["audio_s"] / r["wall_s"] for r in ok]
    fpls = [r["fpl_ms"] for r in ok if r["fpl_ms"] is not None]
    return {
        "streams": n_streams, "ok": len(ok),
        "errors": [r["error"] for r in out if r["error"]][:4],
        "fpl_ms": {"p50": _pct(fpls, 0.5), "p95": _pct(fpls, 0.95),
                   "max": _pct(fpls, 1.0)},
        "per_stream_rtf": {"min": round(min(rtfs), 3) if rtfs else None,
                           "p50": _pct(rtfs, 0.5)},
        "aggregate_rtf": round(sum(r["audio_s"] for r in ok) / wall, 2),
        "wall_s": round(wall, 2),
    }


async def _one_dialogue(uri: str, text_list: list, max_utt_ms: float,
                        out: list) -> None:
    """One streaming multi-speaker dialogue session over WS
    (generate_dialogue — the batched dialogue path since r5,
    runtime/batcher.py:run_dialogue)."""
    import websockets

    rec = {"fpl_ms": None, "audio_s": 0.0, "wall_s": None, "error": None,
           "utterances": 0}
    t0 = time.perf_counter()
    try:
        async with websockets.connect(uri, max_size=1 << 24) as ws:
            await ws.send(json.dumps({
                "type": "generate_dialogue", "text_list": text_list,
                "max_utterance_ms": max_utt_ms}))
            sr = 24_000
            utts = set()
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 600))
                if msg["type"] == "audio_chunk":
                    if rec["fpl_ms"] is None:
                        rec["fpl_ms"] = (time.perf_counter() - t0) * 1000.0
                    sr = msg.get("sample_rate", sr)
                    utts.add(msg.get("utterance"))
                    rec["audio_s"] += len(msg["data"]) / 4.0 / sr
                elif msg["type"] == "generation_complete":
                    rec["utterances"] = len(utts)
                    break
                elif msg["type"] == "error":
                    rec["error"] = msg.get("error", "?")
                    break
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {e}"
    rec["wall_s"] = time.perf_counter() - t0
    out.append(rec)


async def run_dialogue_load(uri: str, n: int, text_list: list,
                            max_utt_ms: float) -> dict:
    """N concurrent dialogue sessions (VERDICT r4 #1 done-criterion: the
    sessions decode in the SHARED block program, not one engine thread
    each). Per-stream RTF = produced audio seconds over session wall."""
    warm: list = []
    await asyncio.gather(*[_one_dialogue(uri, text_list, max_utt_ms, warm)
                           for _ in range(n)])
    out: list = []
    t0 = time.perf_counter()
    await asyncio.gather(*[_one_dialogue(uri, text_list, max_utt_ms, out)
                           for _ in range(n)])
    wall = time.perf_counter() - t0
    ok = [r for r in out if r["error"] is None and r["audio_s"] > 0]
    rtfs = [r["audio_s"] / r["wall_s"] for r in ok]
    fpls = [r["fpl_ms"] for r in ok if r["fpl_ms"] is not None]
    return {
        "dialogue_streams": n, "ok": len(ok),
        "errors": [r["error"] for r in out if r["error"]][:4],
        "utterances": {"min": min((r["utterances"] for r in ok), default=0),
                       "max": max((r["utterances"] for r in ok), default=0)},
        "fpl_ms": {"p50": _pct(fpls, 0.5), "p95": _pct(fpls, 0.95)},
        "per_stream_rtf": {"min": round(min(rtfs), 3) if rtfs else None,
                           "p50": _pct(rtfs, 0.5)},
        "aggregate_rtf": round(sum(r["audio_s"] for r in ok) / wall, 2),
        "wall_s": round(wall, 2),
    }


async def _one_clone(base: str, voice_id: str, text: str, out: list) -> None:
    """One clone request via REST /api/v1/tts/clone (the batched clone
    path, runtime/batcher.py:generate_monologue_clone) in a worker
    thread; records wall + produced audio seconds."""
    import urllib.request

    def post():
        req = urllib.request.Request(
            base + "/api/v1/tts/clone",
            data=json.dumps({"text": text,
                             "voice_profile_id": voice_id}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    rec = {"audio_s": 0.0, "wall_s": None, "error": None}
    t0 = time.perf_counter()
    try:
        resp = await asyncio.to_thread(post)
        rec["audio_s"] = float(resp.get("duration_s", 0.0))
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {e}"
    rec["wall_s"] = time.perf_counter() - t0
    out.append(rec)


async def run_clone_load(base: str, voice_id: str, n: int, text: str) -> dict:
    """N concurrent clone requests; per-stream RTF from produced audio
    seconds over request wall (VERDICT r3 #3 done-criterion: concurrent
    clones decode in ONE batched program)."""
    warm: list = []
    await asyncio.gather(*[_one_clone(base, voice_id, text, warm)
                           for _ in range(n)])
    out: list = []
    t0 = time.perf_counter()
    await asyncio.gather(*[_one_clone(base, voice_id, text, out)
                           for _ in range(n)])
    wall = time.perf_counter() - t0
    ok = [r for r in out if r["error"] is None and r["audio_s"] > 0]
    rtfs = [r["audio_s"] / r["wall_s"] for r in ok]
    return {
        "clone_streams": n, "ok": len(ok),
        "errors": [r["error"] for r in out if r["error"]][:4],
        "per_stream_rtf": {"min": round(min(rtfs), 3) if rtfs else None,
                           "p50": _pct(rtfs, 0.5)},
        "aggregate_rtf": round(sum(r["audio_s"] for r in ok) / wall, 2),
        "wall_s": round(wall, 2),
    }


def _make_voice(base: str) -> str:
    """Create a throwaway voice profile (noise prompt) -> profile id."""
    import urllib.request

    import numpy as np

    rng = np.random.default_rng(0)
    pcm = (np.clip(rng.standard_normal(32_000) * 0.2, -1, 1)
           * 32767).astype("<i2")
    req = urllib.request.Request(
        base + "/api/v1/voices/create",
        data=json.dumps({
            "name": "ws-load-probe",
            "reference_text": "A short voice prompt for the load probe.",
            "sample_rate": 16_000,
            "data": pcm.tobytes().hex()}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())["profile_id"]


def _self_host(kind: str, port: int, max_streams: int, http_port=None,
               voice_dir=None):
    """Start a WebSocketTTSServer in this process -> (server, loop)."""
    import threading

    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.serve.server import WebSocketTTSServer

    if kind == "tiny":
        from fireredtts2_tpu.config import tiny_engine_config
        engine = FireRedTTS2Engine(config=tiny_engine_config(), seed=0)
    else:
        from fireredtts2_tpu.config import EngineConfig, LLMConfig, CodecConfig
        llm = LLMConfig(backbone_flavor="qwen-1.5b",
                        decoder_flavor="qwen-200m",
                        text_vocab_size=152_000, audio_vocab_size=2051,
                        audio_num_codebooks=16, max_seq_len=3100,
                        dtype="bfloat16", quantize_backbone=True,
                        fused_depth_plan="gate=r8,up=s8,down=s8")
        engine = FireRedTTS2Engine(
            config=EngineConfig(llm=llm, codec=CodecConfig(dtype="bfloat16")),
            seed=0)
    server = WebSocketTTSServer(engine, host="127.0.0.1", port=port,
                                max_streams=max_streams)
    http_srv = None
    if http_port is not None:
        from fireredtts2_tpu.serve.server import HealthHTTPServer
        http_srv = HealthHTTPServer(server, host="127.0.0.1", port=http_port,
                                    voice_dir=voice_dir)
        http_srv.start()
    loop = asyncio.new_event_loop()

    def spin():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.start())
        loop.run_forever()

    threading.Thread(target=spin, daemon=True).start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if server._server is not None:
            return server
        time.sleep(0.1)
    raise RuntimeError("server did not start")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=18795)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--max-ms", type=float, default=50 * 80)
    ap.add_argument("--text", default="A short benchmark sentence about "
                    "tensor processing units and speech synthesis.")
    ap.add_argument("--self-host", choices=("tiny", "flagship"), default=None,
                    help="spin up a server in-process (tiny = CPU check, "
                    "flagship = serving config on the chip)")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--timeline", action="store_true",
                    help="dump the batcher's admit/block event timeline "
                    "after the timed wave (latency forensics)")
    ap.add_argument("--dialogue-streams", type=int, default=0,
                    help="ALSO run N concurrent 2-speaker streaming "
                    "dialogue sessions over WS (generate_dialogue — the "
                    "batched dialogue path) and report per-stream RTF")
    ap.add_argument("--clone-streams", type=int, default=0,
                    help="ALSO run N concurrent voice-clone requests "
                    "through REST /api/v1/tts/clone (the batched clone "
                    "path) and report their per-stream RTF")
    ap.add_argument("--http-port", type=int, default=18796)
    args = ap.parse_args()

    server = None
    if args.self_host:
        voice_dir = None
        if args.clone_streams:
            import tempfile
            voice_dir = tempfile.mkdtemp(prefix="wsload_voices_")
        server = _self_host(args.self_host, args.port,
                            max_streams=max(args.streams
                                            + args.clone_streams,
                                            args.dialogue_streams),
                            http_port=(args.http_port if args.clone_streams
                                       else None),
                            voice_dir=voice_dir)
    uri = f"ws://{args.host}:{args.port}"
    batcher = getattr(getattr(server, "service", None), "batcher", None)
    if batcher is not None:
        # Exclude the block-ladder + prefill warmup (pure compile time;
        # can be many minutes cold on the flagship) from the waves — a
        # cold warmup longer than the client recv timeout would
        # otherwise fail every warmup-wave client.
        batcher.wait_ready(timeout=3600)
    res = asyncio.run(
        run_load(uri, args.streams, args.text, args.max_ms,
                 warmup=not args.no_warmup,
                 after_warmup=(batcher.reset_host_stats
                               if batcher is not None else None)))
    if args.dialogue_streams:
        # Short turns (16 frames) so the session fits even the tiny dev
        # config's 256-position class; context grows by ~(audio tokens +
        # text) per turn and overflow is a hard error (reference parity).
        res["dialogue"] = asyncio.run(run_dialogue_load(
            uri, args.dialogue_streams,
            ["[S1]Hello there friend.", "[S2]Hi right back at you.",
             "[S1]Great, talk soon."],
            max_utt_ms=16 * 80))
    if args.clone_streams:
        base = f"http://{args.host}:{args.http_port}"
        voice_id = _make_voice(base)
        res["clone"] = asyncio.run(run_clone_load(
            base, voice_id, args.clone_streams, args.text))
    if batcher is not None:
        # host-cost attribution (runtime/batcher.py:host_stats): dispatch
        # + fanout = pure host overhead; fetch includes device wait.
        res["host"] = {k: round(v, 3) if isinstance(v, float) else v
                       for k, v in batcher.host_stats().items()}
    print(json.dumps(res))
    if args.timeline and batcher is not None:
        # One line per event; block walls > K*12.5 ms stall the consumers.
        for ev in list(batcher.timeline):
            print(json.dumps(ev), file=sys.stderr)
    return 0 if res["ok"] == args.streams else 1


if __name__ == "__main__":
    sys.exit(main())
