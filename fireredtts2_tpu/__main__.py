"""Command-line interface.

Replaces the reference's CLI surface (gradio_demo.py --pretrained-dir ...,
runpod launchers) with subcommands:

  python -m fireredtts2_tpu generate  --text "[S1]Hi. [S2]Hello." --out out.wav
  python -m fireredtts2_tpu monologue --text "..." --prompt-wav ref.wav \
                                      --prompt-text "..." --out out.wav
  python -m fireredtts2_tpu serve     --ws-port 8765 --http-port 8080
  python -m fireredtts2_tpu qa        # run the QA scenario suite
  python -m fireredtts2_tpu bench     # headline benchmark JSON

Without --pretrained-dir a tiny random-weight config is used (dev mode).
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def _build_engine(args):
    from fireredtts2_tpu.engine import FireRedTTS2Engine
    from fireredtts2_tpu.config import tiny_engine_config

    # Serving perf knobs -> LLMConfig overrides (PERF.md for what each buys;
    # the measured serving preset is --quantize-backbone
    # --fused-depth-plan gate=r8,up=s8,down=s8).
    llm_overrides = {}
    if getattr(args, "quantize_backbone", False):
        llm_overrides["quantize_backbone"] = True
    if getattr(args, "fused_depth_plan", None):
        llm_overrides["fused_depth_plan"] = args.fused_depth_plan
    if getattr(args, "speculative_depth", False):
        llm_overrides["speculative_depth"] = True

    # Sharded serving over a (dp, tp) device mesh (engine mesh mode;
    # parallel/mesh.py). tp spreads one stream's matmuls over chips for
    # latency; dp rides extra chips with batched streams for throughput.
    mesh = None
    tp, dp = getattr(args, "tp", 1), getattr(args, "dp", None)
    if tp > 1 or (dp or 1) > 1:
        import jax
        from fireredtts2_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        if tp * (dp or 1) > n:
            sys.exit(f"--tp {tp} x --dp {dp or 1} needs more than the "
                     f"{n} visible device(s)")
        mesh = make_mesh(dp=dp, tp=tp)
        print(f"[mesh] serving sharded: dp={mesh.shape['dp']} "
              f"tp={mesh.shape['tp']}", file=sys.stderr)

    if args.pretrained_dir:
        return FireRedTTS2Engine(pretrained_dir=args.pretrained_dir,
                                 gen_type=args.gen_type,
                                 llm_overrides=llm_overrides or None,
                                 mesh=mesh)
    print("[warn] no --pretrained-dir: using tiny random-weight dev config",
          file=sys.stderr)
    return FireRedTTS2Engine(config=tiny_engine_config(),
                             gen_type=args.gen_type,
                             llm_overrides=llm_overrides or None,
                             mesh=mesh)


def _cmd_generate(args):
    from fireredtts2_tpu.utils.audio_io import save_wav

    engine = _build_engine(args)
    max_utt = args.max_utterance_ms
    if max_utt is None:
        # dev tiny config has small prompt buckets; long utterances would
        # overflow the rolling dialogue context
        max_utt = 30_000 if args.pretrained_dir else 1_600
    # Split "[S1]... [S2]..." inline dialogue text into utterances
    parts = re.split(r"(?=\[S\d\])", args.text)
    text_list = [p.strip() for p in parts if p.strip()]
    if not text_list[0].startswith("[S"):
        text_list = ["[S1]" + args.text]
    audio = engine.generate_dialogue(
        text_list,
        prompt_wav_list=args.prompt_wav or None,
        prompt_text_list=args.prompt_text or None,
        temperature=args.temperature, topk=args.topk,
        max_utterance_ms=max_utt)
    save_wav(args.out, audio, engine.output_sample_rate)
    print(f"wrote {args.out}: {len(audio)/engine.output_sample_rate:.2f}s")


def _cmd_monologue(args):
    from fireredtts2_tpu.utils.audio_io import save_wav

    engine = _build_engine(args)
    audio = engine.generate_monologue(
        args.text, prompt_wav=args.prompt_wav_single,
        prompt_text=args.prompt_text_single,
        temperature=args.temperature, topk=args.topk)
    save_wav(args.out, audio, engine.output_sample_rate)
    print(f"wrote {args.out}: {len(audio)/engine.output_sample_rate:.2f}s")


def _cmd_serve(args):
    import os

    from fireredtts2_tpu.serve.llm import build_responder_chain
    from fireredtts2_tpu.serve.server import serve

    engine = _build_engine(args)
    responder = build_responder_chain(
        primary=args.llm_primary, hf_model_dir=args.llm_model_dir,
        openai_base_url=args.openai_base_url, openai_model=args.openai_model,
        openai_api_key=os.environ.get("OPENAI_API_KEY"))
    transcriber = None
    if args.asr:
        from fireredtts2_tpu.asr import WhisperASR

        if args.asr_dir:
            from fireredtts2_tpu.asr import load_hf_whisper
            params, model_cfg = load_hf_whisper(args.asr_dir)
            asr = WhisperASR(params=params, model_cfg=model_cfg,
                             quantize_int8=args.asr_int8)
        else:
            print("[warn] serve --asr without --asr-dir: tiny random-"
                  "weight dev ASR (transcripts are noise)")
            asr = WhisperASR(warmup=False, quantize_int8=args.asr_int8)
        transcriber = asr.as_transcriber()
    if args.profiler_port:
        # Live jax.profiler gRPC endpoint: `xprof --port 6006
        # --grpc_port <port>` or TensorBoard's profile tab can attach to a
        # running server (the in-repo tracing hook, runtime/perf.py).
        from fireredtts2_tpu.runtime.perf import start_profiler_server
        start_profiler_server(args.profiler_port)
        print(f"jax.profiler listening on :{args.profiler_port}")
    print(f"serving: ws://0.0.0.0:{args.ws_port}  http://0.0.0.0:{args.http_port}/health")
    serve(engine, ws_port=args.ws_port, http_port=args.http_port,
          session_dir=args.session_dir, max_streams=args.max_streams,
          voice_dir=args.voice_dir, responder=responder,
          require_auth=args.require_auth, transcriber=transcriber)


def _cmd_qa(args):
    from fireredtts2_tpu.serve.qa import QAPipeline, QAThresholds

    engine = _build_engine(args)
    thresholds = None
    if not args.pretrained_dir:
        # random-weight dev audio has no SNR/silence structure — keep the
        # structural gates, drop the perceptual ones
        thresholds = QAThresholds(min_snr_db=-100.0, max_silence_ratio=1.0,
                                  min_rms=0.0)
    results = QAPipeline(engine, thresholds).run_all()
    ok = all(r.passed for r in results)
    for r in results:
        mark = "PASS" if r.passed else "FAIL"
        print(f"[{mark}] {r.name} ({r.duration_s:.1f}s) {r.detail}")
    sys.exit(0 if ok else 1)


def _cmd_bench(args):
    import bench
    bench.main()


def _cmd_train(args):
    if args.model == "lm":
        import os

        from fireredtts2_tpu.config import (
            llm_config_from_json, tiny_engine_config,
        )
        from fireredtts2_tpu.train.loop import (
            TrainConfig, train, jsonl_batches,
        )

        cfg = (llm_config_from_json(
                   os.path.join(args.pretrained_dir, "config_llm.json"))
               if args.pretrained_dir else tiny_engine_config().llm)
        tcfg = TrainConfig(
            batch_size=args.batch_size, seq_len=args.seq_len,
            peak_lr=args.lr,
            checkpoint_dir=args.ckpt_dir, checkpoint_every=args.ckpt_every,
            log_every=args.log_every, dp=args.dp, tp=args.tp,
            mixed_precision=args.bf16, eval_every=args.eval_every,
            metrics_path=args.metrics_path,
            zero1=args.zero1, remat=args.remat,
            grad_accum=args.grad_accum)
        data = jsonl_batches(args.data, cfg, tcfg) if args.data else None
        train(cfg, tcfg, data=data, num_steps=args.steps, seed=args.seed)
    else:
        import os

        from fireredtts2_tpu.config import (
            codec_config_from_json, tiny_engine_config,
        )
        from fireredtts2_tpu.train.codec_loop import (
            CodecTrainConfig, train_codec, wav_dir_batches,
        )

        cfg = (codec_config_from_json(
                   os.path.join(args.pretrained_dir, "config_codec.json"))
               if args.pretrained_dir else tiny_engine_config().codec)
        tcfg = CodecTrainConfig(
            batch_size=args.batch_size, peak_lr=args.lr,
            window_samples=args.window_samples,
            checkpoint_dir=args.ckpt_dir, checkpoint_every=args.ckpt_every,
            log_every=args.log_every, dp=args.dp, tp=args.tp,
            eval_every=args.eval_every, metrics_path=args.metrics_path,
            zero1=args.zero1, remat=args.remat)
        data = wav_dir_batches(args.data, tcfg) if args.data else None
        train_codec(cfg, tcfg, data=data, num_steps=args.steps,
                    seed=args.seed)


def _cmd_export(args):
    from fireredtts2_tpu.runtime.convert import export_main

    sys.exit(export_main(args))


def _cmd_convert(args):
    if not args.pretrained_dir:
        sys.exit("convert requires --pretrained-dir")
    from fireredtts2_tpu.runtime.convert import main as convert_main

    sys.exit(convert_main(args))


def main(argv=None):
    p = argparse.ArgumentParser(prog="fireredtts2_tpu")
    p.add_argument("--pretrained-dir", default=None,
                   help="checkpoint dir (config_llm.json, codec.pt, ...)")
    p.add_argument("--gen-type", default="dialogue",
                   choices=["dialogue", "monologue"])
    # Serving perf knobs (apply to every subcommand; PERF.md has the
    # measured effect of each — the proven serving preset is
    # --quantize-backbone --fused-depth-plan gate=r8,up=s8,down=s8).
    p.add_argument("--quantize-backbone", action="store_true",
                   help="weight-only int8 backbone (halves decode reads)")
    p.add_argument("--fused-depth-plan", default=None, metavar="PLAN",
                   help="fused Pallas depth kernel placement plan, e.g. "
                        "gate=r8,up=s8,down=s8 (TPU only)")
    p.add_argument("--speculative-depth", action="store_true",
                   help="Jacobi speculative depth decode (same tokens, "
                        "fewer weight reads when acceptance is high)")
    p.add_argument("--tp", type=int, default=1, metavar="N",
                   help="tensor-parallel ways: shard the LM projections "
                        "over N chips of a jax.sharding mesh (latency)")
    p.add_argument("--dp", type=int, default=None, metavar="N",
                   help="data-parallel ways for batched streams "
                        "(throughput; default visible_devices // tp)")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="dialogue synthesis to a wav")
    g.add_argument("--text", required=True)
    g.add_argument("--prompt-wav", nargs="*", default=None)
    g.add_argument("--prompt-text", nargs="*", default=None)
    g.add_argument("--temperature", type=float, default=0.9)
    g.add_argument("--topk", type=int, default=20)
    g.add_argument("--out", default="out.wav")
    g.add_argument("--max-utterance-ms", type=float, default=None)
    g.set_defaults(fn=_cmd_generate)

    m = sub.add_parser("monologue", help="monologue synthesis (optional clone)")
    m.add_argument("--text", required=True)
    m.add_argument("--prompt-wav", dest="prompt_wav_single", default=None)
    m.add_argument("--prompt-text", dest="prompt_text_single", default=None)
    m.add_argument("--temperature", type=float, default=0.75)
    m.add_argument("--topk", type=int, default=20)
    m.add_argument("--out", default="out.wav")
    m.set_defaults(fn=_cmd_monologue)

    s = sub.add_parser("serve", help="websocket + http serving")
    s.add_argument("--ws-port", type=int, default=8765)
    s.add_argument("--http-port", type=int, default=8080)
    s.add_argument("--session-dir", default=None)
    s.add_argument("--max-streams", type=int, default=8,
                   help="concurrent batched streams per chip (1 = serial)")
    s.add_argument("--voice-dir", default=None,
                   help="voice-profile store dir (enables /api/v1/voices)")
    s.add_argument("--profiler-port", type=int, default=0,
                   help="expose a live jax.profiler gRPC endpoint (0 = off)")
    s.add_argument("--require-auth", action="store_true",
                   help="demand Bearer tokens on WS TTS + /api/v1 REST "
                        "(secret via FRTTS2_TOKEN_SECRET)")
    s.add_argument("--asr", action="store_true",
                   help="wire the on-TPU whisper ASR: enables "
                        "POST /v1/audio/transcriptions")
    s.add_argument("--asr-dir", default=None,
                   help="local HF whisper checkout (e.g. whisper-large-v3);"
                        " omitted = tiny random dev ASR")
    s.add_argument("--asr-int8", action="store_true",
                   help="weight-only int8 ASR hot path")
    s.add_argument("--llm-primary", default="rule_based",
                   choices=["rule_based", "local", "openai"],
                   help="primary conversation-LLM backend")
    s.add_argument("--llm-model-dir", default=None,
                   help="local HF causal-LM dir for the 'local' backend")
    s.add_argument("--openai-base-url", default=None,
                   help="OpenAI-compatible endpoint for the 'openai' backend"
                        " (API key via OPENAI_API_KEY)")
    s.add_argument("--openai-model", default="gpt-3.5-turbo")
    s.set_defaults(fn=_cmd_serve)

    q = sub.add_parser("qa", help="run QA scenarios against the engine")
    q.set_defaults(fn=_cmd_qa)

    b = sub.add_parser("bench", help="headline benchmark (prints JSON)")
    b.set_defaults(fn=_cmd_bench)

    t = sub.add_parser(
        "train",
        help="train the LM (jsonl token shards) or the codec (wav dir) "
             "over a (dp, tp) mesh with Orbax checkpoint/resume")
    t.add_argument("--model", default="lm", choices=["lm", "codec"])
    t.add_argument("--data", default=None,
                   help="lm: jsonl token-shard path; codec: wav directory "
                        "(default: synthetic smoke batches)")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--ckpt-dir", default=None)
    t.add_argument("--ckpt-every", type=int, default=1000)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--eval-every", type=int, default=0)
    t.add_argument("--metrics-path", default=None,
                   help="append jsonl train/eval metrics here")
    t.add_argument("--dp", type=int, default=None)
    t.add_argument("--tp", type=int, default=1)
    t.add_argument("--seq-len", type=int, default=256,
                   help="lm only: training sequence length (frames)")
    t.add_argument("--window-samples", type=int, default=32_000,
                   help="codec only: 16 kHz window length (multiple of "
                        "1280 = one 12.5 Hz token)")
    t.add_argument("--bf16", action="store_true",
                   help="lm only: bf16 forward/backward, fp32 master params")
    t.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 — shard the AdamW moments over dp "
                        "(8 bytes/param/chip saved; values unchanged)")
    t.add_argument("--remat", default="", choices=["", "full", "dots"],
                   help="per-layer rematerialization (activation memory "
                        "for recompute; values unchanged)")
    t.add_argument("--grad-accum", type=int, default=1,
                   help="lm only: micro-batches accumulated per optimizer "
                        "update (batch-size must divide evenly)")
    t.add_argument("--seed", type=int, default=0)
    t.set_defaults(fn=_cmd_train)

    x = sub.add_parser(
        "export",
        help="train checkpoint(s) -> serving dir the engine loads "
             "torch-free (closes train -> serve; docs/training.md)")
    x.add_argument("--out", required=True, help="serving dir to write")
    x.add_argument("--config-dir", required=True,
                   help="dir holding config_llm.json/config_codec.json "
                        "(and fallback jax/ trees for unexported families)")
    x.add_argument("--lm-ckpt", default=None,
                   help="train/loop.py Orbax step dir")
    x.add_argument("--codec-ckpt", default=None,
                   help="train/codec_loop.py Orbax step dir")
    x.set_defaults(fn=_cmd_export)

    c = sub.add_parser(
        "convert",
        help="torch checkpoint dir -> Orbax JAX trees + golden parity smoke "
             "(the real-checkpoint bring-up drill; docs/deployment.md)")
    c.add_argument("--out", default=None,
                   help="Orbax output dir (default <pretrained-dir>/jax)")
    c.add_argument("--fidelity", action="store_true",
                   help="also run the WER/CER fidelity harness on the "
                        "converted engine")
    c.set_defaults(fn=_cmd_convert)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
