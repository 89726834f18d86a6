"""Tiny TRAINED-checkpoint quality loop (VERDICT r4 #3 / missing #1).

The published checkpoints are unreachable in this environment, so every
acceptance/quality question (speculative-depth rounds, MTP draft value,
W8A8 token overlap) has so far been answered on RANDOM weights — the
worst case for all of them. This closes the proxy loop on a tiny model
TRAINED by the repo's own trainers on a *learnable* synthetic task:

- LM task: audio token (frame t, codebook q) = 1 + (7*t + 13*q + s) % (V-1)
  with s = first text token % (V-1) — deterministic given the text AND
  trivially inferable (a lookup, not modular arithmetic over the whole
  text — sum-based classes defeated free-running generalization in the
  first capture while teacher-forced depth accuracy was still 1.0), so a
  trained backbone+depth stack makes the depth chain predictable (the
  regime a real TTS checkpoint is in, vs uniform-random worst case).
  Utterances are a fixed 16 frames then EOS (teaches termination).
- Codec task: sine-class audio (wav-dir pipeline).

Pipeline: generate data -> train LM (with the MTP draft head) + codec ->
export -> FireRedTTS2Engine(pretrained_dir=...) -> measure on the SAME
serving surface:
  1. greedy token accuracy vs the ground-truth mapping (the tiny-scale
     "WER": random weights score ~1/63);
  2. Jacobi/speculative-depth rounds on REAL teacher-forced backbone
     hiddens (prev-frame init AND trained-draft init), trained vs random
     (tools/spec_depth_rounds.py used random last_h — meaningless
     acceptance);
  3. fused depth-kernel plan-mode token overlap vs the XLA chain in
     interpret mode (weight-only r8/s8 vs the a8 activation-quant modes)
     on trained weights — the quality gate the W8A8 default is waiting on;
  4. QA scenarios + fidelity harness wiring on the trained engine.

Usage:  python tools/trained_loop.py [--steps-lm 2000] [--steps-codec 150]
        [--out /tmp/frtts2_trained_loop]
Prints one JSON line per phase and a final summary (paste into PERF.md).

Reference hot path this attacks: the 15-step sequential depth chain
(/root/reference/fireredtts2/llm/llm.py:317-328).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


V_AUDIO = 64          # tiny config audio vocab
N_FRAMES = 16         # fixed utterance length (teaches EOS at t=16)


def gt_frame(s: int, t: int, ncb: int) -> np.ndarray:
    """Ground-truth audio frame at time t for first-token class s."""
    q = np.arange(ncb)
    return 1 + (7 * t + 13 * q + s) % (V_AUDIO - 1)


def make_jsonl(path: str, n: int, ncb: int, tvocab: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            nt = int(rng.integers(4, 9))
            text = rng.integers(1, tvocab, nt).tolist()
            s = int(text[0] % (V_AUDIO - 1))
            audio = [gt_frame(s, t, ncb).tolist() for t in range(N_FRAMES)]
            f.write(json.dumps({"text_tokens": text,
                                "audio_tokens": audio}) + "\n")


def make_wavs(d: str, n: int, seed: int) -> None:
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    t = np.arange(16_000) / 16_000.0
    for i in range(n):
        f0 = float(rng.choice([220.0, 330.0, 440.0, 550.0]))
        x = 0.3 * np.sin(2 * np.pi * f0 * t) \
            + 0.05 * rng.standard_normal(t.shape)
        wavfile.write(os.path.join(d, f"sine_{i}.wav"), 16_000,
                      (np.clip(x, -1, 1) * 32767).astype(np.int16))


def build_sequence(cfg, text: list[int]) -> tuple[np.ndarray, np.ndarray, int]:
    """(1, S, C+1) tokens + mask: text rows then N_FRAMES gt audio rows
    then the EOS frame — the jsonl_batches layout."""
    ncb = cfg.audio_num_codebooks
    C = ncb + 1
    nt = len(text)
    S = nt + N_FRAMES + 1
    s = int(text[0] % (V_AUDIO - 1))
    tokens = np.zeros((1, S, C), np.int32)
    mask = np.zeros((1, S, C), bool)
    tokens[0, :nt, -1] = text
    mask[0, :nt, -1] = True
    for t in range(N_FRAMES):
        tokens[0, nt + t, :-1] = gt_frame(s, t, ncb)
    mask[0, nt:, :-1] = True          # audio rows + EOS frame
    return tokens, mask, nt


def backbone_hiddens(params, cfg, tokens, mask):
    """Teacher-forced backbone hiddens for a full sequence (no cache)."""
    import jax.numpy as jnp
    from fireredtts2_tpu.models.lm.model import frame_hidden
    from fireredtts2_tpu.models.lm.transformer import transformer_forward
    from fireredtts2_tpu.ops import masks as mask_ops

    dtype = params["text_embeddings"].dtype
    h = frame_hidden(params, cfg, jnp.asarray(tokens), jnp.asarray(mask),
                     dtype)
    B, S = tokens.shape[:2]
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    attn = jnp.broadcast_to(mask_ops.causal_mask(S)[None], (B, S, S))
    hh, _ = transformer_forward(params["backbone"], cfg.backbone, h, pos,
                                attn)
    return hh


def measure_rounds(params, cfg, texts, label, use_draft, depth_topk=1,
                   depth_temperature=0.75) -> dict:
    """Jacobi rounds + token agreement on REAL teacher-forced hiddens."""
    import jax
    import jax.numpy as jnp
    from fireredtts2_tpu.models.lm.model import (
        depth_decode_jacobi, draft_depth_tokens)

    all_rounds, agree, total = [], 0, 0
    for text in texts:
        tokens, mask, nt = build_sequence(cfg, text)
        hh = backbone_hiddens(params, cfg, tokens, mask)
        for t in range(N_FRAMES):
            p = nt + t                       # frame row; hidden at p-1
            last_h = hh[:, p - 1]
            c0 = jnp.asarray(tokens[:, p, 0])
            init = None
            if use_draft and "depth_draft" in params:
                init = draft_depth_tokens(params, cfg, last_h, c0)
            samples, rounds = depth_decode_jacobi(
                params, cfg, last_h, c0, jax.random.PRNGKey(1000 + t),
                depth_topk, depth_temperature, init=init)
            all_rounds.append(int(rounds))
            got = np.asarray(samples)[0, 1:]
            agree += int((got == tokens[0, p, 1:cfg.audio_num_codebooks]).sum())
            total += cfg.audio_num_codebooks - 1
    r = np.asarray(all_rounds)
    return {"label": label, "rounds_mean": round(float(r.mean()), 2),
            "rounds_max": int(r.max()),
            "worst_case": cfg.audio_num_codebooks,
            "gt_token_acc": round(agree / total, 3)}


def token_accuracy(engine, texts) -> float:
    """Greedy generation vs the ground-truth mapping, via the SERVING
    path (engine._run_ar) — the tiny-scale WER analogue."""
    ncb = engine.config.llm.audio_num_codebooks
    agree = total = 0
    for text in texts:
        # engine path tokenizes strings; drive the AR loop on raw frames
        tokens, mask, nt = build_sequence(engine.config.llm, text)
        prompt, pmask = tokens[0, :nt], mask[0, :nt]
        gen = engine._run_ar(prompt, pmask, N_FRAMES + 4, 0.75, 1)
        s = int(text[0] % (V_AUDIO - 1))
        for t in range(min(len(gen), N_FRAMES)):
            agree += int((gen[t] == gt_frame(s, t, ncb)).sum())
            total += ncb
        total += abs(len(gen) - N_FRAMES) * ncb   # length errors count
    return round(agree / max(total, 1), 3)


def kernel_overlap(params, cfg, texts, plans) -> dict:
    """Fused depth-kernel plan modes vs the XLA chain (interpret mode) on
    the given weights: token overlap % per plan. The a8 modes change
    numerics BY DESIGN — this is their quality gate on a trained model."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from fireredtts2_tpu.models.lm.model import _depth_decode
    from fireredtts2_tpu.ops.pallas_depth import (
        fused_depth_decode, prepare_depth_chain)

    out = {}
    # real hiddens again: quality depends on where activations live
    hs, c0s = [], []
    for text in texts[:2]:
        tokens, mask, nt = build_sequence(cfg, text)
        hh = backbone_hiddens(params, cfg, tokens, mask)
        for t in range(0, N_FRAMES, 2):
            hs.append(np.asarray(hh[:, nt + t - 1]))
            c0s.append(int(tokens[0, nt + t, 0]))
    for plan in plans:
        pcfg = dataclasses.replace(cfg, fused_depth_plan=plan)
        bundle = prepare_depth_chain(params, pcfg, plan)
        match = total = 0
        for i, (h, c0) in enumerate(zip(hs, c0s)):
            key = jax.random.PRNGKey(i)
            want = np.asarray(_depth_decode(
                params, cfg, jnp.asarray(h), jnp.asarray([c0]), key, 1,
                0.75))
            got = np.asarray(fused_depth_decode(
                bundle, pcfg, jnp.asarray(h), jnp.asarray([c0]), key,
                depth_topk=1, depth_temperature=0.75, plan=plan,
                interpret=True))
            match += int((got == want).sum())
            total += want.size
        out[plan] = round(match / total, 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-lm", type=int, default=2000)
    ap.add_argument("--steps-codec", type=int, default=150)
    ap.add_argument("--out", default="/tmp/frtts2_trained_loop")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp  # noqa: F401
    from fireredtts2_tpu.config import tiny_engine_config
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.models.lm.model import init_lm_params
    from fireredtts2_tpu.runtime.convert import run_export
    from fireredtts2_tpu.train.loop import TrainConfig, train, jsonl_batches
    from fireredtts2_tpu.train.codec_loop import (
        CodecTrainConfig, train_codec, wav_dir_batches)

    work = args.out
    os.makedirs(work, exist_ok=True)
    cfg = tiny_engine_config()
    # train the MTP draft head too (lm_loss aux CE) — the Jacobi init
    lm_cfg = dataclasses.replace(cfg.llm, depth_draft_head=True)
    rng = np.random.default_rng(0)
    held_out = [rng.integers(1, lm_cfg.text_vocab_size,
                             int(rng.integers(4, 9))).tolist()
                for _ in range(4)]

    # ---- 1. data + training -------------------------------------------
    jl = os.path.join(work, "lm_data.jsonl")
    make_jsonl(jl, 4096, lm_cfg.audio_num_codebooks,
               lm_cfg.text_vocab_size, seed=1)
    t0 = time.time()
    tcfg = TrainConfig(batch_size=16, seq_len=32, peak_lr=3e-3,
                       warmup_steps=50, total_steps=args.steps_lm,
                       checkpoint_every=args.steps_lm,
                       checkpoint_dir=os.path.join(work, "lm_ck"),
                       log_every=max(args.steps_lm // 10, 1))
    train(lm_cfg, tcfg, data=jsonl_batches(jl, lm_cfg, tcfg),
          num_steps=args.steps_lm)
    print(json.dumps({"phase": "train_lm", "steps": args.steps_lm,
                      "secs": round(time.time() - t0, 1)}), flush=True)

    wd = os.path.join(work, "wavs")
    make_wavs(wd, 32, seed=2)
    t0 = time.time()
    ccfg = CodecTrainConfig(batch_size=4, window_samples=5120,
                            peak_lr=1e-3, warmup_steps=20,
                            total_steps=args.steps_codec,
                            checkpoint_every=args.steps_codec,
                            checkpoint_dir=os.path.join(work, "codec_ck"),
                            log_every=max(args.steps_codec // 5, 1))
    train_codec(cfg.codec, ccfg, data=wav_dir_batches(wd, ccfg),
                num_steps=args.steps_codec)
    codec_ck = os.path.join(work, "codec_ck",
                            f"step_{args.steps_codec:08d}")
    print(json.dumps({"phase": "train_codec", "steps": args.steps_codec,
                      "secs": round(time.time() - t0, 1)}), flush=True)

    # ---- 2. export -> serve -------------------------------------------
    with open(os.path.join(work, "config_llm.json"), "w") as f:
        json.dump({"llm_models": {k: getattr(lm_cfg, k) for k in (
            "backbone_flavor", "decoder_flavor", "text_vocab_size",
            "audio_vocab_size", "audio_num_codebooks",
            "decoder_loss_weight", "depth_draft_head")}}, f)
    with open(os.path.join(work, "config_codec.json"), "w") as f:
        json.dump({"codec": {}}, f)
    serving = os.path.join(work, "serving")
    run_export(serving, work,
               lm_ckpt=os.path.join(work, "lm_ck",
                                    f"step_{args.steps_lm:08d}"),
               codec_ckpt=codec_ck)
    # Full tiny-config overrides: the reference JSON schema can't express
    # every tiny sub-config (e.g. the ssl section), so pin the exact
    # training-time configs on top of the checkpoint-dir JSONs.
    llm_over = {f.name: getattr(lm_cfg, f.name)
                for f in dataclasses.fields(lm_cfg)}
    codec_over = {f.name: getattr(cfg.codec, f.name)
                  for f in dataclasses.fields(cfg.codec)}
    engine = FireRedTTS2Engine(pretrained_dir=serving,
                               llm_overrides=llm_over,
                               codec_overrides=codec_over)
    trained = engine.lm_params
    random_params = init_lm_params(jax.random.PRNGKey(7), lm_cfg,
                                   jnp.float32)

    # ---- 3. measurements ----------------------------------------------
    results = {"phase": "summary"}
    results["token_acc_trained"] = token_accuracy(engine, held_out)
    results["rounds"] = [
        measure_rounds(trained, lm_cfg, held_out, "trained prev-frame t1",
                       use_draft=False),
        measure_rounds(trained, lm_cfg, held_out, "trained draft-init t1",
                       use_draft=True),
        measure_rounds(trained, lm_cfg, held_out,
                       "trained draft-init t10", use_draft=True,
                       depth_topk=10),
        measure_rounds(random_params, lm_cfg, held_out,
                       "random prev-frame t1", use_draft=False),
    ]
    plans = ("gate=r8,up=s8,down=s8", "gate=r8a8,up=s8a8,down=s8a8")
    results["kernel_overlap_trained"] = kernel_overlap(
        trained, lm_cfg, held_out, plans)
    results["kernel_overlap_random"] = kernel_overlap(
        random_params, lm_cfg, held_out, plans)

    # ---- 4. serve-side QA on the trained engine -----------------------
    from fireredtts2_tpu.serve.qa import QAPipeline, FidelityHarness
    qa = QAPipeline(engine).run_all()
    results["qa_pass"] = sum(1 for r in qa if r.passed)
    results["qa_total"] = len(qa)
    results["qa_detail"] = [f"{r.name}: {'PASS' if r.passed else r.detail}"
                            for r in qa]
    # fidelity wiring: mapping-aware "transcriber" = codec encode of the
    # generated audio would need the inverse task; at tiny scale we pin
    # only that the harness runs end-to-end against a trained engine.
    rep = FidelityHarness(
        engine, transcriber=lambda a: "trained loop probe").evaluate_utterance(
        "trained loop probe")
    results["fidelity_ran"] = bool(rep.wer == 0.0)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
