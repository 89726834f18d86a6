"""Typed configuration tree for the whole framework.

One dataclass tree replaces the reference's four layered config systems
(checkpoint-dir JSONs, per-subsystem dataclass defaults, repo-root JSON
files, argparse) — see reference `fireredtts2/fireredtts2.py:20-38` and
`fireredtts2/codec/model.py:173-184` for the shapes this must accept.

JSON files in a pretrained checkpoint dir (``config_llm.json`` /
``config_codec.json``) load directly into this tree via
:func:`llm_config_from_json` / :func:`codec_config_from_json`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


# ---------------------------------------------------------------------------
# Transformer flavors (mirrors reference fireredtts2/llm/modules.py:5-90 —
# torchtune qwen2 family configs; GQA, RoPE base 1e6, RMSNorm eps 1e-6)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerConfig:
    """A Qwen2-family decoder-only transformer.

    The LM uses these with external embeddings/output head (the token
    embedding and LM output of the flavor are unused, matching
    `_prepare_transformer` in the reference fireredtts2/llm/llm.py:9-13).
    """

    vocab_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    embed_dim: int
    intermediate_dim: int
    max_seq_len: int = 4096
    norm_eps: float = 1e-6
    rope_base: float = 1_000_000.0
    qkv_bias: bool = True  # Qwen2 uses bias on q/k/v projections

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


FLAVORS: dict[str, TransformerConfig] = {
    "qwen-200m": TransformerConfig(
        vocab_size=151936, num_layers=4, num_heads=12, num_kv_heads=2,
        embed_dim=1536, intermediate_dim=8960,
    ),
    "qwen-500m": TransformerConfig(
        vocab_size=151936, num_layers=24, num_heads=14, num_kv_heads=2,
        embed_dim=896, intermediate_dim=4864,
    ),
    "qwen-1.5b": TransformerConfig(
        vocab_size=151936, num_layers=28, num_heads=12, num_kv_heads=2,
        embed_dim=1536, intermediate_dim=8960,
    ),
    "qwen-3b": TransformerConfig(
        vocab_size=151936, num_layers=36, num_heads=16, num_kv_heads=2,
        embed_dim=2048, intermediate_dim=11008,
    ),
    "qwen-7b": TransformerConfig(
        vocab_size=152064, num_layers=28, num_heads=28, num_kv_heads=4,
        embed_dim=3584, intermediate_dim=18944,
    ),
    # Small flavors for tests / CI (not in the reference)
    "tiny": TransformerConfig(
        vocab_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
        embed_dim=64, intermediate_dim=128, max_seq_len=512,
    ),
    "tiny-deep": TransformerConfig(
        vocab_size=256, num_layers=3, num_heads=2, num_kv_heads=1,
        embed_dim=32, intermediate_dim=64, max_seq_len=64,
    ),
}


# ---------------------------------------------------------------------------
# LLM (dual-transformer text-speech model)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LLMConfig:
    """Dual-transformer config (reference ModelArgs, fireredtts2/llm/llm.py:75-84)."""

    backbone_flavor: str = "qwen-1.5b"
    decoder_flavor: str = "qwen-200m"
    text_vocab_size: int = 152_000
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 16
    decoder_loss_weight: float = 0.5
    use_text_loss: bool = True
    # TPU-specific knobs (not in the reference):
    max_seq_len: int = 3100        # backbone positions (fireredtts2.py:58)
    max_batch_size: int = 1        # decode streams per compiled step
    dtype: str = "bfloat16"        # activations/weights compute dtype
    # Weight-only int8 for the depth decoder: its weights are re-read 15x
    # per frame (the dominant device cost, PERF.md); int8 halves that.
    quantize_depth: bool = False
    # Weight-only int8 for the backbone too (halves its per-step reads;
    # decode is weight-read-bound at small batch).
    quantize_backbone: bool = False
    # Bit width for the depth quantizer: 8 (per-channel) or 4 (group-wise
    # packed nibbles — quarter the reads; validate quality on real weights
    # before defaulting).
    quantize_depth_bits: int = 8
    # Fused depth-chain Pallas kernel (ops/pallas_depth.py): run the whole
    # per-frame depth decode (15 sequential steps + sampling) in ONE
    # pallas_call with weights VMEM-resident per this placement plan, e.g.
    # "gate=r4,up=s8,down=s8" (r8 = resident int8, r4 = resident int4,
    # s8 = streamed int8). Empty = disabled (XLA depth loop).
    fused_depth_plan: str = ""
    # Speculative (Jacobi / lookahead) depth decode: iterate a parallel
    # 16-position teacher-forcing forward instead of 15 sequential steps,
    # accepting the longest self-consistent prefix each round. Reproduces
    # the sequential path's tokens (deterministic-noise replay) when the
    # parallel forward rounds like the incremental one — exact at f32 /
    # same tiling; on-chip bf16 near-tie flips are expected fp noise
    # (models/lm/model.py:depth_decode_jacobi). Rounds needed shrink with
    # model confidence, so HBM weight traffic drops from 15 reads to
    # ~rounds reads per frame on trained weights. Opt-in; ignored when
    # fused_depth_plan is active.
    speculative_depth: bool = False
    # MTP-style trainable draft head (models/lm/model.py:init_draft_head):
    # predicts the whole depth chain in one shot as the Jacobi init, and
    # adds draft_loss_weight x CE to lm_loss for finetuning it. Tokens are
    # unchanged either way (the draft only changes verify-round count).
    depth_draft_head: bool = False
    draft_loss_weight: float = 0.1
    # Training-only: per-layer rematerialization on lm_loss's stateless
    # forwards ("full" = save nothing per layer, "dots" = keep weight-dot
    # outputs; models/lm/transformer.py:remat_layer). Trades backward-pass
    # recompute FLOPs for activation HBM, so longer sequences / bigger
    # per-chip batches fit. Loss/grad VALUES are unchanged. Decode ignores
    # it (nothing is differentiated there).
    train_remat: str = ""

    @property
    def backbone(self) -> TransformerConfig:
        return FLAVORS[self.backbone_flavor]

    @property
    def decoder(self) -> TransformerConfig:
        return FLAVORS[self.decoder_flavor]

    @property
    def num_columns(self) -> int:
        """Interleaved frame width: audio codebooks + 1 text column."""
        return self.audio_num_codebooks + 1


def llm_config_from_json(path: str, **overrides) -> LLMConfig:
    """Load a reference-style ``config_llm.json`` (see reference
    fireredtts2/llm/utils.py:238-246 for the accepted schema)."""
    with open(path) as f:
        cfg = json.load(f)["llm_models"]
    kwargs = dict(
        backbone_flavor=cfg["backbone_flavor"],
        decoder_flavor=cfg["decoder_flavor"],
        text_vocab_size=cfg["text_vocab_size"],
        audio_vocab_size=cfg["audio_vocab_size"],
        audio_num_codebooks=cfg["audio_num_codebooks"],
        decoder_loss_weight=cfg["decoder_loss_weight"],
    )
    kwargs.update(overrides)
    return LLMConfig(**kwargs)


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WhisperEncoderConfig:
    """Whisper-style encoder (reference fireredtts2/codec/whisper.py:195-233)."""

    in_dim: int = 128            # mel bins
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 8
    ffn_dim: Optional[int] = None  # defaults to 4*embed_dim
    max_positions: int = 1500     # 50 Hz * 30 s

    @property
    def resolved_ffn_dim(self) -> int:
        return self.ffn_dim if self.ffn_dim is not None else 4 * self.embed_dim


@dataclass(frozen=True)
class SslAdaptorConfig:
    """Transformer adaptor with in/out projections (reference codec/model.py:19-66)."""

    in_dim: int
    embed_dim: int
    out_dim: int
    num_layers: int
    num_heads: int
    ffn_dim: Optional[int] = None

    @property
    def resolved_ffn_dim(self) -> int:
        return self.ffn_dim if self.ffn_dim is not None else 4 * self.embed_dim


@dataclass(frozen=True)
class RVQConfig:
    """Residual VQ (reference fireredtts2/codec/rvq.py:92-130)."""

    input_dim: int = 768
    rvq_dim: Optional[int] = None
    output_dim: Optional[int] = None
    num_quantizers: int = 16
    codebook_size: int = 2048
    codebook_dim: int = 256

    @property
    def resolved_rvq_dim(self) -> int:
        return self.rvq_dim if self.rvq_dim is not None else self.input_dim

    @property
    def resolved_output_dim(self) -> int:
        return self.output_dim if self.output_dim is not None else self.resolved_rvq_dim


@dataclass(frozen=True)
class MelConfig:
    """Whisper-style mel frontend (reference codec/whisper.py:275-302)."""

    num_mels: int = 128
    sampling_rate: int = 16_000
    hop_length: int = 160
    n_fft: int = 400
    fmin: float = 0.0
    fmax: float = 8000.0


@dataclass(frozen=True)
class AcousticDecoderConfig:
    """Vocos-style decoder + iSTFT head (reference codec/decoder.py:550-595)."""

    embed_dim: int = 1024
    num_layers: int = 12
    num_heads: int = 16
    hop_length: int = 240         # @24 kHz -> 100 Hz frames
    causal: bool = True
    # Streaming attention cache capacity in 100 Hz latents. 8 latents per
    # 12.5 Hz token; 3008 covers 376 tokens ≈ 30 s of audio — matches the
    # per-utterance cap of the reference dialogue loop (fireredtts2.py:383).
    max_stream_latents: int = 3008

    @property
    def n_fft(self) -> int:
        return self.hop_length * 4


@dataclass(frozen=True)
class CodecConfig:
    """RedCodec assembly (reference fireredtts2/codec/model.py:151-194)."""

    ssl: WhisperEncoderConfig = field(default_factory=lambda: WhisperEncoderConfig(
        in_dim=128, embed_dim=1280, num_layers=32, num_heads=20, ffn_dim=5120,
    ))
    ssl_adaptor: SslAdaptorConfig = field(default_factory=lambda: SslAdaptorConfig(
        in_dim=1280, embed_dim=768, out_dim=768, num_layers=4, num_heads=8,
    ))
    acoustic_encoder: WhisperEncoderConfig = field(
        default_factory=lambda: WhisperEncoderConfig(
            in_dim=128, embed_dim=768, num_layers=12, num_heads=8,
        )
    )
    downsample_embed_dim: int = 1536   # concat(sem, aco) feature dim
    downsample_factor: int = 4         # 50 Hz -> 12.5 Hz
    rvq: RVQConfig = field(default_factory=lambda: RVQConfig(
        input_dim=1536, rvq_dim=512, output_dim=1024,
        num_quantizers=16, codebook_size=2048, codebook_dim=256,
    ))
    upsample_embed_dim: int = 1024
    upsample_stride: int = 4           # 12.5 Hz -> 50 Hz
    semantic_decoder: SslAdaptorConfig = field(default_factory=lambda: SslAdaptorConfig(
        in_dim=1024, embed_dim=768, out_dim=1280, num_layers=4, num_heads=8,
    ))
    acoustic_decoder: AcousticDecoderConfig = field(default_factory=AcousticDecoderConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    dtype: str = "bfloat16"

    # Sample rates / framing facts (reference fireredtts2.py:56, codec/model.py:301)
    input_sample_rate: int = 16_000
    output_sample_rate: int = 24_000
    samples_per_token_16k: int = 1280  # 12.5 Hz tokens at 16 kHz
    encode_chunk_seconds: int = 6      # encoder processes 6 s windows
    # Cap on 6 s windows per encoder dispatch (reference caps encode
    # batches at 48, fireredtts2/codec/model.py:244); long prompt audio
    # would otherwise become one unbounded batch through the 32-layer SSL
    # encoder and risk OOM.
    encode_max_batch: int = 48
    # Weight-only int8 on the VOCODER backbone transformer (the 12-layer
    # stack re-read every streaming chunk — the second HBM cost after the
    # LM). Encoders/adaptors stay bf16 (encode is per-prompt, not per
    # frame).
    quantize_vocoder: bool = False


def codec_config_from_json(path: str, **overrides) -> CodecConfig:
    """Load a reference-style ``config_codec.json`` (schema per reference
    fireredtts2/codec/model.py:173-184: top-level key "codec" with
    ssl_adaptor / acoustic_encoder / downsample / rvq / upsample /
    semantic_decoder / acoustic_decoder sections)."""
    with open(path) as f:
        cfg = json.load(f)["codec"]

    def _whisper(d: dict, defaults: WhisperEncoderConfig) -> WhisperEncoderConfig:
        known = {f.name for f in dataclasses.fields(WhisperEncoderConfig)}
        merged = {**dataclasses.asdict(defaults)}
        merged.update({k: v for k, v in d.items() if k in known})
        # Reference acoustic_encoder kwargs use num_mels for the mel input dim.
        if "num_mels" in d:
            merged["in_dim"] = d["num_mels"]
        return WhisperEncoderConfig(**merged)

    def _adaptor(d: dict) -> SslAdaptorConfig:
        known = {f.name for f in dataclasses.fields(SslAdaptorConfig)}
        return SslAdaptorConfig(**{k: v for k, v in d.items() if k in known})

    kwargs: dict = {}
    if "ssl_adaptor" in cfg:
        kwargs["ssl_adaptor"] = _adaptor(cfg["ssl_adaptor"])
    if "acoustic_encoder" in cfg:
        kwargs["acoustic_encoder"] = _whisper(cfg["acoustic_encoder"], WhisperEncoderConfig())
    if "downsample" in cfg:
        kwargs["downsample_embed_dim"] = cfg["downsample"].get("embed_dim", 1536)
        kwargs["downsample_factor"] = cfg["downsample"].get("avg_pooler", 4)
    if "rvq" in cfg:
        known = {f.name for f in dataclasses.fields(RVQConfig)}
        kwargs["rvq"] = RVQConfig(**{k: v for k, v in cfg["rvq"].items() if k in known})
    if "upsample" in cfg:
        kwargs["upsample_embed_dim"] = cfg["upsample"].get("embed_dim", 768)
        kwargs["upsample_stride"] = cfg["upsample"].get("stride", 4)
    if "semantic_decoder" in cfg:
        kwargs["semantic_decoder"] = _adaptor(cfg["semantic_decoder"])
    if "acoustic_decoder" in cfg:
        d = cfg["acoustic_decoder"]
        known = {f.name for f in dataclasses.fields(AcousticDecoderConfig)}
        kwargs["acoustic_decoder"] = AcousticDecoderConfig(
            **{k: v for k, v in d.items() if k in known}
        )
    kwargs.update(overrides)
    return CodecConfig(**kwargs)


# ---------------------------------------------------------------------------
# Engine / serving
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EngineConfig:
    """Top-level synthesis engine configuration."""

    llm: LLMConfig = field(default_factory=LLMConfig)
    codec: CodecConfig = field(default_factory=CodecConfig)
    gen_type: str = "dialogue"             # "monologue" | "dialogue"
    max_seq_len: int = 3100
    # Prefill lengths are bucketed to these sizes to avoid a recompile per
    # prompt length (the reference recompiles nothing because torch is eager).
    prefill_buckets: tuple[int, ...] = (128, 256, 512, 1024, 2048, 3072)
    default_temperature: float = 0.9
    default_topk: int = 20
    # Depth decoder (codebooks 1..N-1) sampling is fixed by the reference
    # (fireredtts2/llm/llm.py:324): topk=10, temperature=0.75.
    depth_topk: int = 10
    depth_temperature: float = 0.75
    # Streaming block schedule cap (power of 2): K frames per device
    # dispatch after ramp-up. Larger K amortizes host<->device RTT (30 ms
    # through a tunnel) at the cost of chunk cadence; a client jitter
    # buffer absorbs it.
    stream_block_cap: int = 16
    # Per-voice KV prefix cache capacity (entries; 0 disables). The LM
    # state after prefilling a request's CONTEXT segments (voice-clone
    # prompt) is kept on device, keyed by the context's token content;
    # repeat requests with the same context copy the cached slab and
    # append-prefill only the new text (O(text) prefill instead of
    # O(context+text)). Greedy decode is exact vs the uncached layout
    # (RoPE shift invariance — same equivalence class as incremental
    # dialogue); each entry holds a full KV slab (~90 MB at flagship
    # dims), so the capacity is deliberately small. The reference
    # re-encodes AND re-prefills the prompt on every call
    # (fireredtts2/fireredtts2.py:90-115, 131-201).
    voice_state_cache: int = 4


def tiny_engine_config(**overrides) -> EngineConfig:
    """A CPU-runnable, random-weight configuration used across the test
    suite (real model topology, miniature dims)."""
    llm = LLMConfig(
        backbone_flavor="tiny",
        decoder_flavor="tiny-deep",
        text_vocab_size=300,
        audio_vocab_size=64,
        audio_num_codebooks=4,
        max_seq_len=256,
    )
    codec = CodecConfig(
        ssl=WhisperEncoderConfig(in_dim=16, embed_dim=32, num_layers=1, num_heads=2,
                                 max_positions=512),
        ssl_adaptor=SslAdaptorConfig(in_dim=32, embed_dim=16, out_dim=16,
                                     num_layers=1, num_heads=2),
        acoustic_encoder=WhisperEncoderConfig(in_dim=16, embed_dim=16, num_layers=1,
                                              num_heads=2, max_positions=512),
        downsample_embed_dim=32,
        rvq=RVQConfig(input_dim=32, rvq_dim=32, output_dim=32, num_quantizers=4,
                      codebook_size=64, codebook_dim=8),
        upsample_embed_dim=32,
        semantic_decoder=SslAdaptorConfig(in_dim=32, embed_dim=16, out_dim=32,
                                          num_layers=1, num_heads=2),
        acoustic_decoder=AcousticDecoderConfig(embed_dim=32, num_layers=2, num_heads=2,
                                               hop_length=240, causal=True,
                                               max_stream_latents=256),
        mel=MelConfig(num_mels=16),
        dtype="float32",
    )
    kwargs = dict(llm=llm, codec=codec, max_seq_len=256,
                  prefill_buckets=(32, 64, 128, 192))
    kwargs.update(overrides)
    return EngineConfig(**kwargs)
