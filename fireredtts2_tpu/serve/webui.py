"""Built-in browser demo (replaces the reference's gradio demos, which need
the gradio package — absent in this image). A single self-contained HTML
page served by the HTTP server:

- Dialogue tab: multi-speaker text, audio streams in over the WebSocket and
  plays via WebAudio (reference enhanced_gradio_demo.py streaming panel);
- Voice cloning tab: upload prompt audio + reference text -> voice profile
  (persisted by serve/voices.py through /api/v1/voices), then monologue
  synthesis in that voice via /api/v1/tts/clone (reference
  gradio_demo.py:153-198, enhanced_gradio_demo.py:245-340).
"""

DEMO_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>fireredtts2_tpu demo</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:760px;margin:2rem auto;padding:0 1rem;background:#111;color:#eee}
 textarea,input[type=text]{width:100%;background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:6px;padding:.5rem;box-sizing:border-box}
 textarea{height:7rem}
 button{padding:.6rem 1.4rem;border-radius:6px;border:0;background:#c33;color:#fff;font-size:1rem;cursor:pointer}
 button:disabled{background:#555}
 select{background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:4px;padding:.4rem}
 .row{display:flex;gap:1rem;margin:.8rem 0;align-items:center;flex-wrap:wrap}
 label{font-size:.9rem;color:#aaa}
 input[type=number]{width:5rem;background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:4px;padding:.3rem}
 #log,#clog{font-family:monospace;font-size:.8rem;color:#8c8;white-space:pre-wrap}
 .tab{display:inline-block;padding:.5rem 1rem;cursor:pointer;border-bottom:2px solid transparent;color:#aaa}
 .tab.active{color:#eee;border-color:#c33}
 .panel{display:none}.panel.active{display:block}
</style></head><body>
<h2>fireredtts2_tpu</h2>
<div>
 <span class="tab active" data-p="dlg">Dialogue</span>
 <span class="tab" data-p="clone">Voice cloning</span>
</div>

<div id="dlg" class="panel active">
<p>Multi-speaker text with <code>[S1]..[S4]</code> tags. Audio streams as it
is generated (first packet in well under a second).</p>
<textarea id="text">[S1]Hello there, welcome to the show. [S2]Thanks, great to be here!</textarea>
<div class="row">
 <label>temperature <input id="temp" type="number" value="0.9" step="0.05"></label>
 <label>top-k <input id="topk" type="number" value="20" step="1"></label>
 <button id="go">Generate</button>
</div>
<div id="log"></div>
</div>

<div id="clone" class="panel">
<h3>1. Create a voice profile</h3>
<div class="row"><input id="vname" type="text" placeholder="voice name"></div>
<div class="row"><input id="vtext" type="text" placeholder="reference text (what the prompt audio says)"></div>
<div class="row"><input id="vfile" type="file" accept="audio/*">
 <button id="vcreate">Create profile</button></div>
<h3>2. Speak in that voice</h3>
<div class="row"><select id="vsel"></select>
 <button id="vrefresh" title="reload profiles">&#8635;</button></div>
<textarea id="ctext">Hello! This is my cloned voice speaking on a tensor processing unit.</textarea>
<div class="row"><button id="cgo">Clone &amp; speak</button></div>
<div id="clog"></div>
</div>

<script>
const $ = id => document.getElementById(id);
const log = m => $('log').textContent += m + "\\n";
const clog = m => $('clog').textContent += m + "\\n";
document.querySelectorAll('.tab').forEach(t => t.onclick = () => {
  document.querySelectorAll('.tab').forEach(x => x.classList.remove('active'));
  document.querySelectorAll('.panel').forEach(x => x.classList.remove('active'));
  t.classList.add('active'); $(t.dataset.p).classList.add('active');
});
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
// ------------------------------------------------ dialogue streaming
$('go').onclick = () => {
  actx = actx || new AudioContext();
  const btn = $('go');
  btn.disabled = true;
  $('log').textContent = '';
  const ws = new WebSocket(`ws://${location.hostname}:__WS_PORT__`);
  let playAt = 0, t0 = performance.now(), first = true;
  ws.onopen = () => {
    ws.send(JSON.stringify({type: 'generate_speech',
      text: $('text').value,
      temperature: parseFloat($('temp').value),
      top_k: parseInt($('topk').value),
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
// ------------------------------------------------ voice cloning
async function fileToPcm16Hex(file) {
  // decode any browser-supported audio, resample to 16 kHz mono PCM16 hex
  const raw = await file.arrayBuffer();
  const dctx = new AudioContext();
  const buf = await dctx.decodeAudioData(raw);
  const octx = new OfflineAudioContext(1, Math.ceil(buf.duration * 16000), 16000);
  const src = octx.createBufferSource();
  src.buffer = buf; src.connect(octx.destination); src.start();
  const out = (await octx.startRendering()).getChannelData(0);
  let hex = new Array(out.length);
  for (let i = 0; i < out.length; i++) {
    let v = Math.max(-1, Math.min(1, out[i])) * 32767 | 0;
    if (v < 0) v += 65536;
    hex[i] = (v & 255).toString(16).padStart(2,'0') + (v >> 8).toString(16).padStart(2,'0');
  }
  return hex.join('');
}
async function refreshVoices() {
  const r = await fetch('/api/v1/voices');
  const d = await r.json();
  const sel = $('vsel');
  sel.innerHTML = '';
  for (const v of d.voices) {
    const o = document.createElement('option');
    o.value = v.profile_id; o.textContent = v.name;
    sel.appendChild(o);
  }
}
$('vrefresh').onclick = refreshVoices;
refreshVoices().catch(() => clog('voices API disabled (start serve with --voice-dir)'));
$('vcreate').onclick = async () => {
  const f = $('vfile').files[0];
  if (!f || !$('vname').value || !$('vtext').value) { clog('need name, reference text, and an audio file'); return; }
  $('vcreate').disabled = true;
  try {
    clog('encoding audio...');
    const hexData = await fileToPcm16Hex(f);
    const r = await fetch('/api/v1/voices/create', {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({name: $('vname').value, reference_text: $('vtext').value,
                            data: hexData, sample_rate: 16000})});
    const d = await r.json();
    if (!r.ok) { clog('error: ' + d.error); return; }
    clog(`profile "${d.name}" created (snr ${d.quality.snr_db?.toFixed?.(1)} dB)`);
    await refreshVoices();
  } finally { $('vcreate').disabled = false; }
};
$('cgo').onclick = async () => {
  actx = actx || new AudioContext();
  const pid = $('vsel').value;
  if (!pid) { clog('create/select a voice profile first'); return; }
  $('cgo').disabled = true;
  clog('generating...');
  try {
    const r = await fetch('/api/v1/tts/clone', {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({text: $('ctext').value, voice_profile_id: pid})});
    const d = await r.json();
    if (!r.ok) { clog('error: ' + d.error); return; }
    clog(`done: ${d.duration_s.toFixed(2)}s in voice "${d.voice}"`);
    playPcm16(d.data, d.sample_rate, 0);
  } finally { $('cgo').disabled = false; }
};
</script></body></html>
"""


def demo_page(ws_port: int) -> str:
    return DEMO_HTML.replace("__WS_PORT__", str(ws_port))
