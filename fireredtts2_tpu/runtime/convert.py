"""One-command real-checkpoint drill (VERDICT r2 #8).

`python -m fireredtts2_tpu convert --pretrained-dir DIR` runs the whole
bring-up for a reference checkpoint layout
(reference fireredtts2/fireredtts2.py:16-43: config_llm.json,
config_codec.json, llm_pretrain.pt / llm_posttrain.pt, codec.pt, optional
HF whisper-large-v3 checkout for the frozen SSL encoder):

1. convert every torch pickle to our stacked JAX trees
   (runtime/checkpoint.py) and persist them with Orbax under DIR/jax/
   (torch becomes a one-time cost);
2. greedy token-parity smoke: deterministic codec-encode tokens of a fixed
   chirp + topk-1 LM frames for a fixed prompt, compared against
   DIR/goldens.json (recorded on the first run — e.g. from the torch
   reference environment — and validated on every later run/platform);
3. optional fidelity-harness report (serve/qa.py WER/CER + spectral
   speaker similarity) on the converted engine.

The moment real weights are reachable, validation is a single run.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np


LM_CKPTS = ("llm_posttrain.pt", "llm_pretrain.pt")


def _chirp(seconds: float, sr: int) -> np.ndarray:
    """Deterministic 200->1200 Hz chirp — the golden codec input."""
    t = np.arange(int(seconds * sr)) / sr
    f = 200.0 + (1200.0 - 200.0) * t / max(t[-1], 1e-9)
    return (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _golden_codec_tokens(codec_params, codec_cfg) -> list[int]:
    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.models.codec.model import codec_encode, encode_window

    audio = _chirp(1.0, codec_cfg.input_sample_rate)
    fn = jax.jit(lambda a, l: encode_window(codec_params, codec_cfg, a, l))
    codes, tlen = codec_encode(codec_params, codec_cfg, audio[None, :],
                               encode_fn=fn)
    return [int(x) for x in
            np.asarray(codes[0, :, : int(tlen[0])]).reshape(-1)]


def _golden_lm_frames(lm_params, llm_cfg) -> list[list[int]]:
    """topk=1 decode of a fixed prompt: deterministic regardless of key."""
    import jax
    import jax.numpy as jnp

    from fireredtts2_tpu.models.lm.model import init_lm_state, lm_generate_loop

    S, C = 16, llm_cfg.num_columns
    tokens = np.zeros((1, S, C), np.int32)
    tokens[0, :, -1] = (np.arange(1, S + 1) * 7) % llm_cfg.text_vocab_size
    mask = np.zeros((1, S, C), bool)
    mask[0, :, -1] = True
    valid = np.ones((1, S), bool)
    dtype = jnp.bfloat16 if llm_cfg.dtype == "bfloat16" else jnp.float32
    state = init_lm_state(llm_cfg, 1, dtype)
    _, buf, n = jax.jit(
        lambda p, st: lm_generate_loop(
            p, llm_cfg, st, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(valid), jax.random.PRNGKey(0), max_frames=8,
            frame_cap=jnp.int32(8), temperature=1.0, topk=1,
            depth_topk=1))(lm_params, state)
    return np.asarray(buf[0, : int(n[0])]).astype(int).tolist()


def run_convert(pretrained_dir: str, out_dir: Optional[str] = None,
                fidelity: bool = False,
                llm_overrides: Optional[dict] = None,
                codec_overrides: Optional[dict] = None) -> dict[str, Any]:
    """Convert + smoke-validate one pretrained dir. Returns a summary dict
    with parity status per golden ("recorded" on first run, "ok"/"MISMATCH"
    afterwards); raises FileNotFoundError on a missing required file."""
    import jax.numpy as jnp

    from fireredtts2_tpu.config import (
        codec_config_from_json, llm_config_from_json)
    from fireredtts2_tpu.runtime.checkpoint import (
        find_hf_whisper_dir, load_codec_checkpoint, load_lm_checkpoint,
        save_params)

    out_dir = out_dir or os.path.join(pretrained_dir, "jax")
    llm_cfg = llm_config_from_json(
        os.path.join(pretrained_dir, "config_llm.json"),
        **(llm_overrides or {}))
    codec_cfg = codec_config_from_json(
        os.path.join(pretrained_dir, "config_codec.json"),
        **(codec_overrides or {}))
    lm_dtype = jnp.bfloat16 if llm_cfg.dtype == "bfloat16" else jnp.float32
    summary: dict[str, Any] = {"pretrained_dir": pretrained_dir,
                               "out_dir": out_dir, "converted": [],
                               "parity": {}}

    codec_params = load_codec_checkpoint(
        os.path.join(pretrained_dir, "codec.pt"), codec_cfg,
        jnp.float32, hf_whisper_dir=find_hf_whisper_dir(pretrained_dir))
    save_params(os.path.abspath(os.path.join(out_dir, "codec")), codec_params)
    summary["converted"].append("codec.pt")

    lm_trees: dict[str, Any] = {}
    for name in LM_CKPTS:
        path = os.path.join(pretrained_dir, name)
        if not os.path.exists(path):
            continue
        lm_trees[name] = load_lm_checkpoint(path, llm_cfg, lm_dtype)
        save_params(os.path.abspath(
            os.path.join(out_dir, name.removesuffix(".pt"))), lm_trees[name])
        summary["converted"].append(name)
    if not lm_trees:
        raise FileNotFoundError(
            f"no LM checkpoint ({' / '.join(LM_CKPTS)}) in {pretrained_dir}")

    # ---- golden token-parity smoke -------------------------------------
    lm_name = next(n for n in LM_CKPTS if n in lm_trees)
    goldens = {
        "codec_tokens": _golden_codec_tokens(codec_params, codec_cfg),
        f"lm_frames[{lm_name}]": _golden_lm_frames(lm_trees[lm_name], llm_cfg),
    }
    golden_path = os.path.join(pretrained_dir, "goldens.json")
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            want = json.load(f)
        for key, got in goldens.items():
            if key not in want:
                summary["parity"][key] = "recorded"
            elif want[key] == got:
                summary["parity"][key] = "ok"
            else:
                summary["parity"][key] = "MISMATCH"
        want.update({k: v for k, v in goldens.items() if k not in want})
        with open(golden_path, "w") as f:
            json.dump(want, f)
    else:
        with open(golden_path, "w") as f:
            json.dump(goldens, f)
        summary["parity"] = {k: "recorded" for k in goldens}
    summary["parity_ok"] = all(v in ("ok", "recorded")
                               for v in summary["parity"].values())

    # ---- fidelity harness ----------------------------------------------
    if fidelity:
        from fireredtts2_tpu.asr import WhisperASR
        from fireredtts2_tpu.engine import FireRedTTS2Engine
        from fireredtts2_tpu.serve.qa import FidelityHarness

        engine = FireRedTTS2Engine(
            pretrained_dir=pretrained_dir,
            gen_type="dialogue" if "llm_posttrain.pt" in lm_trees
            else "monologue",
            llm_overrides=llm_overrides, codec_overrides=codec_overrides)
        # Size the decode budget to the ASR model actually loaded: the
        # random-weight TINY_ASR fallback has 24 target positions, far
        # below ASRConfig's real-whisper default max_new_tokens=224
        # (transcribe raises loudly on that mismatch). prev_window=0
        # keeps the rolling <|startofprev|> prompt within tiny budgets
        # on multi-window audio.
        from fireredtts2_tpu.asr import ASRConfig
        asr = WhisperASR(warmup=False)
        mt = asr.model_cfg.max_target_positions
        if asr.config.max_new_tokens + 8 > mt:
            asr = WhisperASR(config=ASRConfig(
                max_new_tokens=max(4, mt - 8), prev_window=0))
        harness = FidelityHarness(engine, asr.as_transcriber())
        rep = harness.evaluate_utterance(
            "The quick brown fox jumps over the lazy dog.")
        summary["fidelity"] = {
            "wer": rep.wer, "cer": rep.cer, "speaker_sim": rep.speaker_sim,
        }
    return summary


def main(args) -> int:
    summary = run_convert(args.pretrained_dir, out_dir=args.out,
                          fidelity=args.fidelity,
                          llm_overrides=getattr(args, "_llm_overrides", None),
                          codec_overrides=getattr(args, "_codec_overrides",
                                                  None))
    print(json.dumps(summary, indent=2, default=str))
    return 0 if summary["parity_ok"] else 1


# ---------------------------------------------------------------------------
# Export: training checkpoints -> a serving dir (closes train -> serve)
# ---------------------------------------------------------------------------


def run_export(out_dir: str, config_dir: str,
               lm_ckpt: Optional[str] = None,
               codec_ckpt: Optional[str] = None,
               gen_type: str = "dialogue") -> dict:
    """Orbax TRAIN checkpoints (train/loop.py, train/codec_loop.py
    `step_XXXXXXXX` dirs) -> a complete serving dir the engine loads
    torch-free (the DIR/jax/ fast path in engine/engine.py).

    - config_llm.json / config_codec.json are copied from `config_dir`
      (the dir training read its configs from — the reference layout has
      no writer, fireredtts2/fireredtts2.py:16-43, so configs pass
      through verbatim);
    - `lm_ckpt`: its fp32 master `params` tree is saved under
      out/jax/llm_{posttrain|pretrain} (per gen_type); the engine casts
      to the config dtype at load;
    - `codec_ckpt`: trainable+frozen merge saved under out/jax/codec
      (fp32, matching the convert drill's golden-stability policy);
    - a family not being exported falls back to config_dir's own jax/
      tree (copied), so the result always serves.
    """
    import shutil

    import orbax.checkpoint as ocp

    from fireredtts2_tpu.runtime.checkpoint import save_params

    out_dir = os.path.abspath(out_dir)
    os.makedirs(os.path.join(out_dir, "jax"), exist_ok=True)
    summary: dict[str, Any] = {"out_dir": out_dir, "exported": []}

    for name in ("config_llm.json", "config_codec.json"):
        src = os.path.join(config_dir, name)
        if not os.path.exists(src):
            raise FileNotFoundError(f"{src} (need both config jsons)")
        shutil.copyfile(src, os.path.join(out_dir, name))

    ckptr = ocp.StandardCheckpointer()
    lm_name = "llm_pretrain" if gen_type == "monologue" else "llm_posttrain"
    if lm_ckpt:
        state = ckptr.restore(os.path.abspath(lm_ckpt))
        save_params(os.path.join(out_dir, "jax", lm_name), state["params"])
        summary["exported"].append(lm_name)
        summary["lm_step"] = int(state["step"])
    if codec_ckpt:
        state = ckptr.restore(os.path.abspath(codec_ckpt))
        save_params(os.path.join(out_dir, "jax", "codec"),
                    {**state["params"], **state["frozen"]})
        summary["exported"].append("codec")
        summary["codec_step"] = int(state["step"])

    # Fall back to config_dir's converted trees for the missing family.
    for name in (lm_name, "codec"):
        dst = os.path.join(out_dir, "jax", name)
        src = os.path.join(config_dir, "jax", name)
        if not os.path.isdir(dst):
            if not os.path.isdir(src):
                raise FileNotFoundError(
                    f"no checkpoint given for '{name}' and no fallback "
                    f"tree at {src}")
            shutil.copytree(src, dst)
            summary["exported"].append(f"{name} (copied from config_dir)")
    return summary


def export_main(args) -> int:
    summary = run_export(args.out, args.config_dir, lm_ckpt=args.lm_ckpt,
                         codec_ckpt=args.codec_ckpt,
                         gen_type=args.gen_type)
    print(json.dumps(summary, indent=2, default=str))
    return 0
