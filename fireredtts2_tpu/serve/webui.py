"""Built-in browser demo (replaces the reference's gradio demos, which need
the gradio package — absent in this image). A single self-contained HTML
page served by the HTTP server: type dialogue text, hit Generate, audio
streams in over the WebSocket and plays via WebAudio."""

DEMO_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>fireredtts2_tpu demo</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:760px;margin:2rem auto;padding:0 1rem;background:#111;color:#eee}
 textarea{width:100%;height:7rem;background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:6px;padding:.5rem}
 button{padding:.6rem 1.4rem;border-radius:6px;border:0;background:#c33;color:#fff;font-size:1rem;cursor:pointer}
 button:disabled{background:#555}
 .row{display:flex;gap:1rem;margin:.8rem 0;align-items:center}
 label{font-size:.9rem;color:#aaa}
 input[type=number]{width:5rem;background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:4px;padding:.3rem}
 #log{font-family:monospace;font-size:.8rem;color:#8c8;white-space:pre-wrap}
</style></head><body>
<h2>fireredtts2_tpu — streaming dialogue TTS</h2>
<p>Multi-speaker text with <code>[S1]..[S4]</code> tags. Audio streams as it
is generated (first packet in well under a second).</p>
<textarea id="text">[S1]Hello there, welcome to the show. [S2]Thanks, great to be here!</textarea>
<div class="row">
 <label>temperature <input id="temp" type="number" value="0.9" step="0.05"></label>
 <label>top-k <input id="topk" type="number" value="20" step="1"></label>
 <button id="go">Generate</button>
</div>
<div id="log"></div>
<script>
const log = m => document.getElementById('log').textContent += m + "\\n";
let actx;
function playPcm16(hex, rate, at) {
  const n = hex.length / 4;
  const buf = actx.createBuffer(1, n, rate);
  const ch = buf.getChannelData(0);
  for (let i = 0; i < n; i++) {
    let v = parseInt(hex.substr(i*4, 2), 16) | (parseInt(hex.substr(i*4+2, 2), 16) << 8);
    if (v >= 32768) v -= 65536;
    ch[i] = v / 32768;
  }
  const src = actx.createBufferSource();
  src.buffer = buf; src.connect(actx.destination);
  const t = Math.max(at, actx.currentTime + 0.05);
  src.start(t);
  return t + buf.duration;
}
document.getElementById('go').onclick = () => {
  actx = actx || new AudioContext();
  const btn = document.getElementById('go');
  btn.disabled = true;
  document.getElementById('log').textContent = '';
  const ws = new WebSocket(`ws://${location.hostname}:__WS_PORT__`);
  let playAt = 0, t0 = performance.now(), first = true;
  ws.onopen = () => {
    ws.send(JSON.stringify({type: 'generate_speech',
      text: document.getElementById('text').value,
      temperature: parseFloat(document.getElementById('temp').value),
      top_k: parseInt(document.getElementById('topk').value),
      streaming: true}));
    log('request sent');
  };
  ws.onmessage = ev => {
    const m = JSON.parse(ev.data);
    if (m.type === 'audio_chunk') {
      if (first) { log(`first packet: ${(performance.now()-t0).toFixed(0)} ms`); first = false; }
      playAt = playPcm16(m.data, m.sample_rate, playAt);
    } else if (m.type === 'generation_complete') {
      log(`done: ${m.duration_s.toFixed(2)}s in ${m.chunks} chunks`);
      ws.close(); btn.disabled = false;
    } else if (m.type === 'error') {
      log('error: ' + m.error); ws.close(); btn.disabled = false;
    }
  };
  ws.onerror = () => { log('websocket error'); btn.disabled = false; };
};
</script></body></html>
"""


def demo_page(ws_port: int) -> str:
    return DEMO_HTML.replace("__WS_PORT__", str(ws_port))
