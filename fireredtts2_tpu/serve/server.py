"""WebSocket + HTTP serving for streaming TTS.

Capability parity with the reference serving overlay:
- WebSocket message vocabulary and flow (reference websocket_server.py:25-61
  message types; enhanced_fireredtts2.py:503-668 generate_speech over WS with
  hex-encoded int16 PCM chunks) — but here streaming chunks come from the
  REAL incremental decoder, not a buffer filled after completion
  (the reference fills its StreamingAudioBuffer only once generation
  finishes, enhanced_fireredtts2.py:422-427);
- sessions (serve.sessions), monitoring (serve.monitor);
- stdlib HTTP /health + /stats endpoints (reference runpod_deployment.py:183-271
  runs a stdlib health server; fastapi isn't available in this image).

Two service modes: TTSService (one worker, requests serialized) and
BatchedTTSService (continuous batching — concurrent requests decode
together in one batched device program, runtime/batcher.py); pick with
WebSocketTTSServer(max_streams=...).
"""

from __future__ import annotations

import asyncio
import json
import queue
import threading
import time
import uuid
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from fireredtts2_tpu.serve.monitor import get_performance_monitor
from fireredtts2_tpu.serve.sessions import SessionManager


# Message types (capability set of reference websocket_server.py:25-61)
MSG_SESSION_START = "session_start"
MSG_SESSION_END = "session_end"
MSG_TTS_REQUEST = "generate_speech"
MSG_TTS_STARTED = "generation_started"
MSG_AUDIO_CHUNK = "audio_chunk"
MSG_TTS_COMPLETE = "generation_complete"
MSG_ERROR = "error"
MSG_PING = "ping"
MSG_PONG = "pong"
MSG_STATS = "get_stats"
MSG_STATS_RESPONSE = "stats"


def pcm16_hex(audio: np.ndarray) -> str:
    """float32 [-1,1] -> hex int16 PCM (reference enhanced_fireredtts2.py
    streams audio as hex-encoded int16). Uses the native C++ kernel when
    built (native/audio_kernels.cpp)."""
    from fireredtts2_tpu.utils.native import f32_to_pcm16

    return f32_to_pcm16(audio).hex()


@dataclass
class TTSRequest:
    request_id: str
    text: str
    speaker: str
    temperature: float
    topk: int
    streaming: bool
    on_chunk: any           # callable(np.ndarray) -> None (threadsafe)
    on_done: any            # callable(np.ndarray | None, Exception | None)
    max_audio_length_ms: float = 30_000.0  # per-request cap (reference
    # honors the caller's max length per request, fireredtts2.py:131-143)


class BatchedTTSService:
    """Continuous-batching front: concurrent requests decode together in
    one batched device program (runtime.batcher) — requests no longer
    queue behind each other like the reference's single worker
    (enhanced_fireredtts2.py:408-447)."""

    def __init__(self, engine, max_streams: int = 8):
        from fireredtts2_tpu.runtime.batcher import ContinuousBatcher

        self.engine = engine
        self.monitor = get_performance_monitor()
        self.batcher = ContinuousBatcher(engine, max_streams=max_streams)
        self.batcher.start()

    def submit(self, req: TTSRequest) -> None:
        def consume():
            self.monitor.start_inference(req.request_id)
            try:
                handle = self.batcher.submit(
                    req.text, req.speaker, temperature=req.temperature,
                    topk=req.topk,
                    max_audio_length_ms=req.max_audio_length_ms)
                total = []
                for chunk in handle:
                    self.monitor.record_first_packet(req.request_id)
                    self.monitor.record_frame(req.request_id)
                    total.append(chunk)
                    if req.streaming:
                        req.on_chunk(chunk)
                audio = (np.concatenate(total) if total
                         else np.zeros(0, np.float32))
                self.monitor.end_inference(
                    req.request_id,
                    audio_seconds=len(audio) / self.engine.output_sample_rate)
                req.on_done(audio, None)
            except Exception as e:
                self.monitor.end_inference(req.request_id, error=True)
                req.on_done(None, e)

        threading.Thread(target=consume, daemon=True).start()

    def shutdown(self) -> None:
        self.batcher.stop()


class TTSService:
    """Single-worker queue in front of the engine (one chip = one stream).
    The default for single-tenant use; BatchedTTSService multiplexes many
    concurrent streams through the continuous batcher."""

    def __init__(self, engine):
        self.engine = engine
        self.queue: "queue.Queue[Optional[TTSRequest]]" = queue.Queue()
        self.monitor = get_performance_monitor()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, req: TTSRequest) -> None:
        self.queue.put(req)

    def shutdown(self) -> None:
        self.queue.put(None)

    def _loop(self) -> None:
        while True:
            req = self.queue.get()
            if req is None:
                return
            self.monitor.start_inference(req.request_id)
            try:
                if req.streaming:
                    total = []
                    for chunk in self.engine.generate_stream(
                            req.text, req.speaker, [],
                            temperature=req.temperature, topk=req.topk,
                            max_audio_length_ms=req.max_audio_length_ms):
                        self.monitor.record_first_packet(req.request_id)
                        self.monitor.record_frame(req.request_id)
                        total.append(chunk)
                        req.on_chunk(chunk)
                    audio = np.concatenate(total) if total else np.zeros(0, np.float32)
                else:
                    audio = self.engine.generate(
                        req.text, req.speaker, [],
                        max_audio_length_ms=req.max_audio_length_ms,
                        temperature=req.temperature, topk=req.topk)
                self.monitor.end_inference(
                    req.request_id,
                    audio_seconds=len(audio) / self.engine.output_sample_rate)
                req.on_done(audio, None)
            except Exception as e:  # surface errors to the client
                self.monitor.end_inference(req.request_id, error=True)
                req.on_done(None, e)


class WebSocketTTSServer:
    """asyncio WebSocket server speaking the reference's message protocol."""

    def __init__(self, engine, host: str = "0.0.0.0", port: int = 8765,
                 session_dir: Optional[str] = None, max_streams: int = 1):
        self.host, self.port = host, port
        self.service = (BatchedTTSService(engine, max_streams)
                        if max_streams > 1 else TTSService(engine))
        self.sessions = SessionManager(persist_dir=session_dir)
        self.monitor = get_performance_monitor()
        from fireredtts2_tpu.serve.security import create_security_system
        self.security = create_security_system()
        self.clients: dict[str, any] = {}
        self._server = None
        self.started = time.time()

    # -- message handling

    async def _handle(self, ws) -> None:
        client_id = uuid.uuid4().hex
        self.clients[client_id] = ws
        loop = asyncio.get_running_loop()
        try:
            async for raw in ws:
                try:
                    msg = json.loads(raw)
                except json.JSONDecodeError:
                    await self._send(ws, {"type": MSG_ERROR,
                                          "error": "invalid json"})
                    continue
                await self._dispatch(ws, client_id, msg, loop)
        finally:
            self.clients.pop(client_id, None)

    async def _send(self, ws, obj: dict) -> None:
        await ws.send(json.dumps(obj))

    async def _dispatch(self, ws, client_id: str, msg: dict, loop) -> None:
        mtype = msg.get("type")
        if mtype == MSG_PING:
            await self._send(ws, {"type": MSG_PONG, "ts": time.time()})
        elif mtype == MSG_SESSION_START:
            s = self.sessions.create_session(metadata={"client": client_id})
            await self._send(ws, {"type": MSG_SESSION_START,
                                  "session_id": s.session_id})
        elif mtype == MSG_SESSION_END:
            self.sessions.end_session(msg.get("session_id", ""))
            await self._send(ws, {"type": MSG_SESSION_END, "ok": True})
        elif mtype == MSG_STATS:
            await self._send(ws, {"type": MSG_STATS_RESPONSE,
                                  "stats": self.stats()})
        elif mtype == MSG_TTS_REQUEST:
            await self._handle_tts(ws, client_id, msg, loop)
        else:
            await self._send(ws, {"type": MSG_ERROR,
                                  "error": f"unknown message type: {mtype}"})

    async def _handle_tts(self, ws, client_id: str, msg: dict, loop) -> None:
        text = msg.get("text", "")
        if not text or not isinstance(text, str):
            await self._send(ws, {"type": MSG_ERROR,
                                  "error": "text is required"})
            return
        check = self.security.check_request(client_id, text,
                                            token=msg.get("token"))
        if not check.ok:
            await self._send(ws, {"type": MSG_ERROR, "error": check.reason})
            return
        request_id = msg.get("request_id") or uuid.uuid4().hex
        session_id = msg.get("session_id")
        speaker = msg.get("speaker", "[S1]")
        streaming = bool(msg.get("streaming", True))
        out_q: asyncio.Queue = asyncio.Queue()

        def on_chunk(chunk: np.ndarray) -> None:
            loop.call_soon_threadsafe(out_q.put_nowait, ("chunk", chunk))

        def on_done(audio, err) -> None:
            loop.call_soon_threadsafe(out_q.put_nowait, ("done", (audio, err)))

        req = TTSRequest(
            request_id=request_id, text=text, speaker=speaker,
            temperature=float(msg.get("temperature", 0.9)),
            topk=int(msg.get("top_k", 20)), streaming=streaming,
            max_audio_length_ms=float(msg.get("max_audio_length_ms", 30_000)),
            on_chunk=on_chunk, on_done=on_done)
        self.service.submit(req)
        await self._send(ws, {"type": MSG_TTS_STARTED,
                              "request_id": request_id})

        seq = 0
        while True:
            kind, payload = await out_q.get()
            if kind == "chunk":
                await self._send(ws, {
                    "type": MSG_AUDIO_CHUNK, "request_id": request_id,
                    "seq": seq, "sample_rate": self.service.engine.output_sample_rate,
                    "format": "pcm16", "data": pcm16_hex(payload)})
                seq += 1
            else:
                audio, err = payload
                if err is not None:
                    await self._send(ws, {"type": MSG_ERROR,
                                          "request_id": request_id,
                                          "error": str(err)})
                else:
                    resp = {"type": MSG_TTS_COMPLETE, "request_id": request_id,
                            "chunks": seq,
                            "duration_s": len(audio) / self.service.engine.output_sample_rate}
                    if not streaming:
                        resp["data"] = pcm16_hex(audio)
                        resp["sample_rate"] = self.service.engine.output_sample_rate
                        resp["format"] = "pcm16"
                    await self._send(ws, resp)
                    if session_id and self.sessions.get(session_id):
                        self.sessions.add_turn(
                            session_id, "assistant", text,
                            audio_duration_s=resp["duration_s"])
                break

    # -- lifecycle

    async def start(self) -> None:
        import websockets

        self._server = await websockets.serve(self._handle, self.host, self.port)

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        self.service.shutdown()

    def stats(self) -> dict:
        out = self.monitor.summary()
        out["clients"] = len(self.clients)
        out["sessions"] = self.sessions.active_count
        out["uptime_s"] = time.time() - self.started
        return out


class HealthHTTPServer:
    """stdlib REST endpoints (no fastapi in this image): /health, /stats
    (mirrors reference runpod_deployment.py:183-271) plus the reference's
    REST TTS surface (api_interfaces.py:201-541): POST /api/v1/tts/generate
    returning base64 PCM16."""

    def __init__(self, ws_server: WebSocketTTSServer, host: str = "0.0.0.0",
                 port: int = 8080):
        from fireredtts2_tpu.serve.security import validate_text_input

        class Handler(BaseHTTPRequestHandler):
            def _json(self, code: int, obj: dict):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "healthy",
                                     "uptime_s": time.time() - ws_server.started})
                elif self.path == "/stats":
                    self._json(200, ws_server.stats())
                elif self.path in ("/", "/demo"):
                    from fireredtts2_tpu.serve.webui import demo_page

                    data = demo_page(ws_server.port).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/api/v1/tts/generate":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._json(400, {"error": "invalid json"})
                    return
                text = req.get("text", "")
                v = validate_text_input(text)
                if not v.ok:
                    self._json(400, {"error": v.reason})
                    return
                done = threading.Event()
                result: dict = {}

                def on_done(audio, err):
                    result["audio"], result["err"] = audio, err
                    done.set()

                ws_server.service.submit(TTSRequest(
                    request_id=uuid.uuid4().hex, text=text,
                    speaker=req.get("speaker", "[S1]"),
                    temperature=float(req.get("temperature", 0.9)),
                    topk=int(req.get("top_k", 20)), streaming=False,
                    max_audio_length_ms=float(
                        req.get("max_audio_length_ms", 30_000)),
                    on_chunk=lambda c: None, on_done=on_done))
                if not done.wait(timeout=600):
                    self._json(504, {"error": "generation timed out"})
                    return
                if result["err"] is not None:
                    self._json(500, {"error": str(result["err"])})
                    return
                audio = result["audio"]
                self._json(200, {
                    "sample_rate": ws_server.service.engine.output_sample_rate,
                    "format": "pcm16",
                    "duration_s": len(audio) / ws_server.service.engine.output_sample_rate,
                    "data": pcm16_hex(audio),
                })

            def log_message(self, *a):  # quiet
                pass

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()


def serve(engine, ws_port: int = 8765, http_port: int = 8080,
          session_dir: Optional[str] = None, max_streams: int = 1) -> None:
    """Blocking entry point: WebSocket TTS + HTTP health. max_streams > 1
    serves concurrent requests through the continuous batcher."""
    server = WebSocketTTSServer(engine, port=ws_port, session_dir=session_dir,
                                max_streams=max_streams)
    health = HealthHTTPServer(server, port=http_port)

    async def main():
        await server.start()
        health.start()
        await asyncio.Future()  # run forever

    asyncio.run(main())
