"""Low-latency streaming TTS against a running server."""
import sys
import time

from fireredtts2_tpu.client import FireRedTTSClient

client = FireRedTTSClient(sys.argv[1] if len(sys.argv) > 1
                          else "http://127.0.0.1:8080")
t0 = time.perf_counter()
total = 0
for i, chunk in enumerate(client.stream_ws("[S1]Streaming, chunk by chunk.")):
    if i == 0:
        print(f"first packet after {(time.perf_counter() - t0) * 1e3:.0f} ms")
    total += len(chunk)
print(f"{total / 24_000:.2f} s of audio in {time.perf_counter() - t0:.2f} s")
