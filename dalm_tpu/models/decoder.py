"""Decoder-only causal LM (Llama-class generator backbone).

TPU-native twin of the reference generator (``AutoModelForCausalLM``,
default `meta-llama/Llama-2-7b-hf`,
`/root/reference/dalm/models/rag_e2e_base_model.py:42-59`). Llama
architecture — RMSNorm pre-norm, rotary position embeddings
(rotate-half convention, HF-compatible), SwiGLU MLP, optional GQA — as
pure Flax with logical sharding axes (``heads``/``mlp``/``vocab`` over the
mesh ``model`` axis → Megatron-style tensor parallel under GSPMD; batch
over ``data``).

Two entry modes, both static-shape and jittable:
- full-sequence teacher forcing (training / prefill): ``apply(ids, mask)``
- single-step decode with a preallocated KV cache pytree
  (``init_kv_cache`` + ``decode_step=True``) for the eval-rag generation
  loop (reference `eval_rag.py:127-141` uses HF ``generate``; here decode
  is a ``lax.scan`` / ``lax.while_loop`` over this step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    num_kv_heads: Optional[int] = None  # None → MHA
    intermediate_size: int = 1408
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_embeddings: bool = False
    remat: bool = False  # jax.checkpoint each layer (FLOPs for HBM)
    # "einsum" (XLA-fused, any shape), "flash" (Pallas TPU blockwise
    # kernel — used for full-sequence causal attention when the sequence
    # is long and block-aligned, e.g. SFT packing at seq 2560; falls back
    # to einsum for short/unaligned shapes and cached decode), or "ring"
    # (context parallelism: the sequence axis is sharded over mesh axis
    # ``ring_axis``; run under shard_map — kernels/ring_attention.py).
    attention_impl: str = "einsum"
    ring_axis: str = "model"
    ring_layout: str = "contiguous"  # or "zigzag" (balanced causal CP)
    # Sliding-window attention (Mistral-family): keys further than
    # ``sliding_window`` positions behind the query are masked; None = full.
    sliding_window: Optional[int] = None
    # Q/K/V projection bias (Qwen2-family); o_proj and MLP stay bias-free.
    attention_bias: bool = False
    # Gemma-family knobs: head_dim decoupled from hidden/heads (gemma-7b:
    # 16 heads x 256 = 4096 != hidden 3072), GeGLU MLP activation,
    # sqrt(hidden)-scaled token embeddings, and RMSNorm's (1 + w) scale
    # parameterization (HF stores zero-centered weights).
    head_dim_override: Optional[int] = None
    hidden_act: str = "silu"  # or "gelu_tanh" (Gemma) / "gelu" (exact erf)
    scale_embeddings: bool = False
    rmsnorm_unit_offset: bool = False
    # Gemma2-family knobs (HF Gemma2Config semantics):
    # - query_pre_attn_scalar: attention scores are scaled by
    #   1/sqrt(this) instead of 1/sqrt(head_dim) when set.
    # - attn_logit_softcap: scores <- cap * tanh(scores / cap) BEFORE
    #   masking/softmax; final_logit_softcap: same on the LM-head logits.
    # - post_norms: sandwich normalization — the attention and MLP
    #   branch outputs each pass a second RMSNorm before the residual
    #   add, and the MLP branch gets its own pre-norm (4 norms/layer:
    #   input / post_attention / pre_feedforward / post_feedforward).
    # - sliding_layers="even": only even-index layers use the sliding
    #   window; odd layers attend globally ("all" = every layer, the
    #   Mistral behavior).
    query_pre_attn_scalar: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    post_norms: bool = False
    # "all" (every layer windows — Mistral), "even" (even-index layers
    # window — Gemma2), or an explicit per-layer tuple of bools (True =
    # sliding) for irregular patterns like Gemma3's 5-sliding:1-full.
    sliding_layers: Any = "all"
    # Gemma3-family knobs (HF Gemma3TextConfig semantics):
    # - qk_norm: per-head RMSNorm on Q and K (over head_dim) after the
    #   projections, BEFORE rope — replaces gemma2's attn softcapping.
    # - rope_local_theta: sliding layers rotate with this base frequency
    #   (10_000) while full-attention layers use ``rope_theta`` (1e6).
    # - rope_scaling_factor: linear position scaling applied to the
    #   GLOBAL-theta rope only (gemma3 ≥4B ships factor 8; HF scales
    #   ``rotary_emb`` but leaves ``rotary_emb_local`` unscaled).
    qk_norm: bool = False
    rope_local_theta: Optional[float] = None
    rope_scaling_factor: Optional[float] = None
    # Llama-3.1-style frequency-dependent rope scaling (HF rope_type
    # "llama3", `_compute_llama3_parameters`): a static inv_freq rewrite
    # — wavelengths longer than original_max/low_freq_factor are slowed
    # by ``factor``, shorter than original_max/high_freq_factor kept,
    # and the band between linearly interpolated. Tuple of
    # (factor, low_freq_factor, high_freq_factor, original_max_position
    # _embeddings); attention scale is unchanged (HF attention_factor=1).
    rope_llama3: Optional[tuple] = None
    # Mixture-of-Experts (Mixtral / Qwen3-MoE families — models/moe.py;
    # the reference has no MoE support, beyond-parity). num_experts set →
    # every layer's MLP is a sparse MoE block. moe_impl: "dense" (exact,
    # all experts all tokens — parity tests, decode), "dispatch"
    # (capacity-C dispatch einsums — training scale), "auto" (dense when
    # decoding from a KV cache, dispatch otherwise — calibrated from the
    # measured crossover table, models/moe.py). moe_capacity_factor:
    # dispatch capacity C = ceil(T·K·cf / E); None → C = T (dropless,
    # exact).
    num_experts: Optional[int] = None
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True
    # Router semantics: "softmax" (Mixtral/Qwen3-MoE — f32 softmax over
    # all experts, top-k) or "noaux_tc" (DeepSeek-V3 — sigmoid scores,
    # aux-free e_score_correction_bias for CHOICE only, group-limited
    # top-k; models/moe.py route_noaux_tc).
    moe_router: str = "softmax"
    moe_n_group: Optional[int] = None        # noaux_tc: expert groups
    moe_topk_group: Optional[int] = None     # noaux_tc: groups kept
    moe_routed_scaling_factor: float = 1.0   # noaux_tc: weight scale
    moe_n_shared_experts: int = 0            # V3 always-on dense experts
    # First k layers use a dense MLP instead of MoE (DeepSeek-V3
    # first_k_dense_replace); 0 → every layer is MoE.
    moe_layer_start: int = 0
    moe_impl: str = "auto"
    moe_capacity_factor: Optional[float] = None
    # GShard-style token grouping for the dispatch path: tokens split
    # into groups of ≤ this many, each dispatched independently (the
    # one-hot dispatch tensor is (S·K, E, C) PER GROUP, so memory stays
    # linear in T instead of the single-group O(T²·K/E)). None → one
    # group (exact dropless possible); with groups, capacity counts are
    # per group. 2048 bounds the group dispatch tensor to ~64 MB bf16
    # at E=16, cf=1.25.
    moe_group_size: Optional[int] = 2048
    # int8 MXU compute for packed frozen kernels ("none"|"fwd"|"all") —
    # see kernels/int8_matmul.py; no effect without int8 quant storage.
    int8_compute: str = "none"
    # int8 KV cache (beyond-parity serving tier): cache buffers store
    # int8 K/V with per-(token, kv-head) absmax scales (f32, D/4 bytes
    # of overhead per 1/2'd D bytes at D=128 ⇒ ~1.6%). Cached decode
    # attention is HBM-bound on the cache read, so halving K/V bytes
    # ≈ halves per-token attention traffic and doubles the slot budget
    # at a fixed HBM envelope. Quantize-on-write / dequantize-on-read
    # happen inside DecoderAttention; both fuse into the surrounding
    # elementwise/einsum programs (no extra HBM pass). Quantization is
    # deterministic, so all write paths (scalar prefill slice, one-hot
    # single-token, one-hot multi-token) stay bit-identical to each
    # other — only attention numerics carry the (bounded) rounding.
    kv_quant: bool = False
    # Multi-head latent attention (DeepSeek-V2/V3, models/mla.py;
    # beyond-parity — the reference has no MLA support). kv_lora_rank
    # set → every layer's attention is MLA: K/V live as one shared
    # compressed latent per token (kv_lora_rank wide) plus one shared
    # rope key (qk_rope_head_dim wide) — the KV cache stores ONLY those
    # (r + d_rope vs n_heads·2·head_dim bytes/token: 57× smaller at V3
    # shapes). Cache-less forwards decompress through kv_b and run
    # standard attention; cached decode runs the ABSORBED formulation
    # (q pulled through kv_b's K half, scores against the latent cache
    # directly — all MXU einsums, no per-step decompression). HF
    # reference: transformers deepseek_v3 modeling (DeepseekV3Attention
    # forward, eager path).
    q_lora_rank: Optional[int] = None       # None → direct q_proj
    kv_lora_rank: Optional[int] = None      # set → MLA attention
    qk_nope_head_dim: Optional[int] = None
    qk_rope_head_dim: Optional[int] = None
    v_head_dim: Optional[int] = None
    # DeepSeek checkpoints store rope-dim weights pair-interleaved
    # (HF rope_interleave=True): de-interleave before rotate_half.
    rope_interleave: bool = False
    # YaRN NTK rope (DeepSeek-V2/V3 long-context checkpoints):
    # (factor, beta_fast, beta_slow, original_max_position_embeddings,
    # attention_factor) — see rope_cos_sin. attention_factor is the
    # precomputed mscale ratio multiplied into cos/sin.
    rope_yarn: Optional[tuple] = None
    # Extra multiplier on the attention softmax scale (DeepSeek yarn
    # mscale_all_dim: scaling *= get_mscale(factor, mscale_all_dim)^2,
    # HF DeepseekV3Attention.__init__).
    attn_scale_mult: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def mla(self) -> bool:
        return self.kv_lora_rank is not None

    @property
    def qk_head_dim(self) -> int:
        return (self.qk_nope_head_dim or 0) + (self.qk_rope_head_dim or 0)

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    def layer_window(self, layer_idx: int) -> Optional[int]:
        """Effective sliding window for one layer (None = global).

        Gemma2 alternates sliding/global per layer (HF ``layer_types``:
        even layers slide); Gemma3 ships an explicit pattern (5 sliding
        then 1 full) carried here as a per-layer bool tuple; everything
        else windows every layer."""
        if not self.sliding_window:
            return None
        if isinstance(self.sliding_layers, (tuple, list)):
            return self.sliding_window if self.sliding_layers[layer_idx] else None
        if self.sliding_layers == "even" and layer_idx % 2 == 1:
            return None
        return self.sliding_window

    @staticmethod
    def gemma_2b() -> "DecoderConfig":
        """Gemma-2B: MQA (1 kv head), head_dim 256, GeGLU, tied
        embeddings, sqrt(hidden)-scaled embeds, (1+w) RMSNorm."""
        return DecoderConfig(
            vocab_size=256000, hidden_size=2048, num_layers=18, num_heads=8,
            num_kv_heads=1, head_dim_override=256, intermediate_size=16384,
            max_position_embeddings=8192, rms_norm_eps=1e-6,
            tie_embeddings=True, hidden_act="gelu_tanh",
            scale_embeddings=True, rmsnorm_unit_offset=True,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def gemma2_2b() -> "DecoderConfig":
        """Gemma2-2B: GQA (4 kv heads), sandwich norms, logit
        softcapping (50 attn / 30 final), alternating 4096-token
        sliding window, query scale 1/sqrt(256)."""
        return DecoderConfig(
            vocab_size=256000, hidden_size=2304, num_layers=26, num_heads=8,
            num_kv_heads=4, head_dim_override=256, intermediate_size=9216,
            max_position_embeddings=8192, rms_norm_eps=1e-6,
            tie_embeddings=True, hidden_act="gelu_tanh",
            scale_embeddings=True, rmsnorm_unit_offset=True,
            query_pre_attn_scalar=256.0, attn_logit_softcap=50.0,
            final_logit_softcap=30.0, sliding_window=4096,
            sliding_layers="even", post_norms=True,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def gemma3_1b() -> "DecoderConfig":
        """Gemma3-1B (text): QK-norm replaces softcapping, dual rope
        (sliding layers at theta 10k, full layers at 1e6), 512-token
        window on 5 of every 6 layers (layer_types pattern), MQA."""
        return DecoderConfig(
            vocab_size=262144, hidden_size=1152, num_layers=26, num_heads=4,
            num_kv_heads=1, head_dim_override=256, intermediate_size=6912,
            max_position_embeddings=32768, rope_theta=1000000.0,
            rms_norm_eps=1e-6, tie_embeddings=True, hidden_act="gelu_tanh",
            scale_embeddings=True, rmsnorm_unit_offset=True,
            query_pre_attn_scalar=256.0, post_norms=True,
            sliding_window=512,
            sliding_layers=tuple(bool((i + 1) % 6) for i in range(26)),
            qk_norm=True, rope_local_theta=10000.0,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def tiny(vocab_size: int = 512) -> "DecoderConfig":
        """CPU-testable config (GPT-2-125M-class role in BASELINE config 3)."""
        return DecoderConfig(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=2,
            intermediate_size=128, max_position_embeddings=512,
        )

    @staticmethod
    def tiny_moe(vocab_size: int = 512) -> "DecoderConfig":
        """CPU-testable sparse-MoE config (models/moe.py)."""
        return dataclasses.replace(
            DecoderConfig.tiny(vocab_size), num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=64,
        )

    @staticmethod
    def tiny_mla(vocab_size: int = 512) -> "DecoderConfig":
        """CPU-testable MLA config (models/mla.py; DeepSeek-V3 geometry
        scaled down — latent rank 16 vs per-head KV 4·2·16)."""
        return dataclasses.replace(
            DecoderConfig.tiny(vocab_size),
            q_lora_rank=24, kv_lora_rank=16,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
            rope_interleave=True,
        )

    @staticmethod
    def deepseek_v3_mid_7b() -> "DecoderConfig":
        """7B-CLASS dense MLA (llama2-7B's hidden/layers/mlp geometry
        with V3 attention: latent 512 + rope 64 + q-LoRA 1536 — ~5.9B
        params). The direct MLA-vs-MHA serving comparison: llama2-7B's
        MHA cache caps the 16 GB chip at 32 slots; this model's latent
        cache (~1.2 KB/token) makes slots nearly free."""
        return DecoderConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32,
            num_heads=32, num_kv_heads=32, intermediate_size=11008,
            max_position_embeddings=4096, rope_theta=10000.0,
            q_lora_rank=1536, kv_lora_rank=512,
            qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
            rope_interleave=True, remat=True,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def deepseek_v3_mini() -> "DecoderConfig":
        """Chip-serveable dense-MLP MLA model (V3 attention geometry at
        ~4B dense scale: latent rank 512 + rope 64 → 1152 cache
        bytes/token in bf16 vs llama2-7B's 32768 — the serving tier
        MLA exists for)."""
        return DecoderConfig(
            vocab_size=32000, hidden_size=2560, num_layers=28,
            num_heads=20, num_kv_heads=20, intermediate_size=8960,
            max_position_embeddings=4096, rope_theta=10000.0,
            q_lora_rank=1024, kv_lora_rank=512,
            qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
            rope_interleave=True, remat=True,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def llama2_7b() -> "DecoderConfig":
        # remat on by default: 7B training without per-layer checkpointing
        # exceeds single-chip HBM; decode ignores remat (kv_cache path).
        return DecoderConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
            intermediate_size=11008, max_position_embeddings=4096,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def llama2_13b() -> "DecoderConfig":
        # Serves on one 16 GB chip ONLY via the int4 capacity tier
        # (weights ~6.5 GB packed; bf16 would need 26 GB).
        return DecoderConfig(
            vocab_size=32000, hidden_size=5120, num_layers=40, num_heads=40,
            intermediate_size=13824, max_position_embeddings=4096,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def qwen25_7b() -> "DecoderConfig":
        # Qwen2.5-7B (the reference's QA-gen default model,
        # `/root/reference/dalm/datasets/qa_gen/question_answer_generation.py:20`):
        # GQA 4 kv heads + Q/K/V projection bias.
        return DecoderConfig(
            vocab_size=152064, hidden_size=3584, num_layers=28, num_heads=28,
            num_kv_heads=4, intermediate_size=18944,
            max_position_embeddings=32768, rope_theta=1000000.0,
            attention_bias=True, remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def qwen3_8b() -> "DecoderConfig":
        # Qwen3-8B: Qwen2 minus the qkv bias, plus per-head QK RMSNorm
        # (standard w scale) and an explicit head_dim (128).
        return DecoderConfig(
            vocab_size=151936, hidden_size=4096, num_layers=36, num_heads=32,
            num_kv_heads=8, head_dim_override=128, intermediate_size=12288,
            max_position_embeddings=40960, rope_theta=1000000.0,
            rms_norm_eps=1e-6, qk_norm=True,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def phi3_mini() -> "DecoderConfig":
        # Phi-3-mini-4k (3.8B): llama-shaped MHA with fused qkv/gate_up
        # checkpoint tensors (split at load, hf_loader) and a 2047-token
        # sliding window on every layer.
        return DecoderConfig(
            vocab_size=32064, hidden_size=3072, num_layers=32, num_heads=32,
            num_kv_heads=32, intermediate_size=8192,
            max_position_embeddings=4096, rope_theta=10000.0,
            sliding_window=2047, remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def mistral_7b() -> "DecoderConfig":
        return DecoderConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=8, intermediate_size=14336,
            max_position_embeddings=32768, rope_theta=10000.0,
            sliding_window=4096, remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def llama3_8b() -> "DecoderConfig":
        # GQA (8 kv heads): the KV cache is 4× smaller than llama2-7b's
        # MHA — at serving time that is 4× the decode slots per HBM byte.
        return DecoderConfig(
            vocab_size=128256, hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=8, intermediate_size=14336,
            max_position_embeddings=8192, rope_theta=500000.0,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def mixtral_8x7b() -> "DecoderConfig":
        # Mixtral-8x7B: llama-shaped attention (GQA 32/8) with 8-expert
        # top-2 sparse MoE MLPs (HF MixtralConfig; sliding_window null).
        return DecoderConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=8, intermediate_size=14336,
            max_position_embeddings=32768, rope_theta=1000000.0,
            num_experts=8, num_experts_per_tok=2,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def mixtral_mini_4b() -> "DecoderConfig":
        # Serve-bench MoE tier: mixtral-style few-big-experts scaled to
        # ~3.6B total / ~1.1B active params — the largest top-2 8-expert
        # shape whose int8 weights (~3.6 GB) fit one 16 GB chip beside a
        # full slot pool's KV cache (tools/bench_moe.py).
        return DecoderConfig(
            vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=32,
            num_kv_heads=8, head_dim_override=64, intermediate_size=4096,
            num_experts=8, num_experts_per_tok=2,
            max_position_embeddings=4096, rope_theta=1000000.0,
            remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def qwen3_moe_30b() -> "DecoderConfig":
        # Qwen3-30B-A3B: 128 tiny experts, top-8, per-head QK-norm —
        # the many-small-experts regime where EP (not TP-within-expert)
        # is the right mesh cut (models/moe.py).
        return DecoderConfig(
            vocab_size=151936, hidden_size=2048, num_layers=48, num_heads=32,
            num_kv_heads=4, head_dim_override=128, intermediate_size=6144,
            moe_intermediate_size=768, num_experts=128, num_experts_per_tok=8,
            norm_topk_prob=True, qk_norm=True,
            max_position_embeddings=40960, rope_theta=1000000.0,
            rms_norm_eps=1e-6, remat=True, param_dtype=jnp.bfloat16,
        )

    @staticmethod
    def llama31_8b() -> "DecoderConfig":
        # Llama-3.1-8B: llama3-8b plus 131k context via the "llama3"
        # frequency-band rope scaling (factor 8 on long wavelengths,
        # original context 8192).
        return dataclasses.replace(
            DecoderConfig.llama3_8b(),
            max_position_embeddings=131072,
            rope_llama3=(8.0, 1.0, 4.0, 8192),
        )


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float, dtype,
    llama3_scaling: Optional[tuple] = None,
    yarn: Optional[tuple] = None,
) -> tuple:
    """positions: (B, S) → cos/sin of shape (B, S, head_dim).

    ``llama3_scaling=(factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings)`` applies the Llama-3.1
    frequency-band inv_freq rewrite (HF ``_compute_llama3_parameters``):
    long wavelengths (> original/low) divide by ``factor``, short ones
    (< original/high) pass through, the middle band interpolates.

    ``yarn=(factor, beta_fast, beta_slow, original_max_position_
    embeddings, attention_factor)`` applies the YaRN NTK rewrite (HF
    ``_compute_yarn_parameters``, truncate=True): per-dimension linear
    blend between interpolated (inv_freq/factor) and extrapolated
    frequencies over the beta correction range, cos/sin multiplied by
    ``attention_factor`` (precomputed at load — the mscale ratio).
    DeepSeek-V2/V3 checkpoints train with this.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if yarn is not None:
        import math as _math

        factor, beta_fast, beta_slow, old_len, _af = (float(v) for v in yarn)

        def _corr_dim(rot):
            return (head_dim * _math.log(old_len / (rot * 2 * _math.pi))) / (
                2 * _math.log(theta)
            )

        low = max(_math.floor(_corr_dim(beta_fast)), 0)
        high = min(_math.ceil(_corr_dim(beta_slow)), head_dim - 1)
        ramp = jnp.clip(
            (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / max(high - low, 1e-3),
            0.0, 1.0,
        )
        extrapolation_factor = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1.0 - extrapolation_factor) + (
            inv_freq * extrapolation_factor
        )
    if llama3_scaling is not None:
        factor, low, high, old_len = (float(v) for v in llama3_scaling)
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = jnp.where(wavelen > old_len / low, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low) / (high - low)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        medium = (wavelen >= old_len / high) & (wavelen <= old_len / low)
        inv_freq = jnp.where(medium, smoothed, scaled)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    af = float(yarn[4]) if yarn is not None else 1.0
    return (jnp.cos(emb) * af).astype(dtype), (jnp.sin(emb) * af).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, D); cos/sin: (B, S, D)."""
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    return x * cos + rotate_half(x) * sin


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # Gemma parameterization: effective scale = 1 + w (HF checkpoints
    # store zero-centered weights; fresh init zeros → effective ones).
    unit_offset: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros_init() if self.unit_offset else nn.initializers.ones_init()
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(init, ("embed",)),
            (x.shape[-1],),
            self.param_dtype,
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        s = scale.astype(jnp.float32) + (1.0 if self.unit_offset else 0.0)
        return (normed * s).astype(self.dtype)


def _proj(features, name, cfg, kernel_axes, use_bias=False):
    from dalm_tpu.models.layers import FlexLinear

    return FlexLinear(
        features, name=name, use_bias=use_bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        kernel_axes=kernel_axes, bias_axes=(kernel_axes[-1],), int8_compute=cfg.int8_compute,
    )


def _kv_quantize(x):
    """(B, S, H, D) float -> (int8 values, (B, S, H) f32 scales).

    Per-(token, head) absmax over D: KV magnitudes vary strongly across
    positions and heads but are smooth across D, so this is the standard
    KV-quant granularity (one scale per 128-lane row — free to apply).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def _kv_dequantize(q, scale, dtype):
    """Inverse of _kv_quantize; f32 multiply, cast to compute dtype."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _cache_write(cache, new_vals, cache_index, S):
    """Write per-row or scalar-indexed entries into KV-cache buffers.

    ``new_vals`` maps buffer name -> (B, S, ...) update; buffers are
    (B, L, H, D) values or (B, L, H) scales. Three modes (see the inline
    notes — each avoids an XLA lowering measured pathological on TPU):

    - ``cache_index`` (B,) and S == 1: one-hot broadcast select — a
      dynamic gather over a length-1 axis lowers as a real gather and
      measured 2x the whole fused step (commit 6098ee1).
    - ``cache_index`` (B,), S > 1 (speculative verification / fused
      prefill): one-hot MATMUL over the cache length (rides the MXU,
      exact: single nonzero term per output row) — take_along_axis over
      L lowers pathologically; a vmapped dynamic_update_slice measured
      ~1 s/token at 64 slots.
    - scalar ``cache_index``: plain dynamic_update_slice.

    int8 buffers run the one-hot contraction in f32 (0/1 one-hot picks
    integer values exactly representable in f32; the cast back is exact).
    """
    out = {}
    L = cache[next(iter(new_vals))].shape[1]
    if getattr(cache_index, "ndim", 0) == 1:
        if S == 1:
            oh = jnp.arange(L)[None, :] == cache_index[:, None]  # (B, L)
            for name, val in new_vals.items():
                buf = cache[name]
                m = oh.reshape(oh.shape + (1,) * (buf.ndim - 2))
                out[name] = jnp.where(m, val.astype(buf.dtype), buf)
        else:
            g = jnp.arange(L)[None, :] - cache_index[:, None]  # (B, L)
            inside = (g >= 0) & (g < S)
            for name, val in new_vals.items():
                buf = cache[name]
                et = jnp.float32 if buf.dtype == jnp.int8 else buf.dtype
                # HIGHEST precision: on TPU the default f32 dot truncates
                # inputs to bf16 — fine for int8 values (≤127, exact in
                # bf16) and bf16 buffers, but it would round the f32
                # scale buffers. The write tensors are tiny; full f32
                # keeps every path bit-exact vs dynamic_update_slice.
                oh = (g[:, :, None] == jnp.arange(S)[None, None, :]).astype(et)
                if buf.ndim == 4:
                    rows = jnp.einsum("bls,bshd->blhd", oh, val.astype(et),
                                      precision=jax.lax.Precision.HIGHEST)
                    m = inside[:, :, None, None]
                else:
                    rows = jnp.einsum("bls,bsh->blh", oh, val.astype(et),
                                      precision=jax.lax.Precision.HIGHEST)
                    m = inside[:, :, None]
                out[name] = jnp.where(m, rows.astype(buf.dtype), buf)
    else:
        for name, val in new_vals.items():
            buf = cache[name]
            start = (0, cache_index) + (0,) * (buf.ndim - 2)
            out[name] = jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), start)
    return out


class DecoderAttention(nn.Module):
    cfg: DecoderConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, hidden, mask, cos, sin, kv_cache=None, cache_index=None, segment_mask=None):
        """mask: (B, 1, S_q, S_k) additive-ready boolean (True = attend).

        With ``kv_cache`` (dict k/v of (B, max_len, KVH, D)) the current
        keys/values are written at ``cache_index`` and attention runs over
        the whole cache buffer; returns (out, new_cache).
        """
        cfg = self.cfg
        B, S, _ = hidden.shape
        nh, kvh, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim

        ab = cfg.attention_bias
        q = _proj(nh * hd, "q_proj", cfg, ("embed", "heads"), ab)(hidden).reshape(B, S, nh, hd)
        k = _proj(kvh * hd, "k_proj", cfg, ("embed", "heads"), ab)(hidden).reshape(B, S, kvh, hd)
        v = _proj(kvh * hd, "v_proj", cfg, ("embed", "heads"), ab)(hidden).reshape(B, S, kvh, hd)

        if cfg.qk_norm:
            # Gemma3: per-head RMSNorm over head_dim on Q and K, after the
            # projections and BEFORE rope (HF Gemma3Attention.q_norm/k_norm;
            # replaces gemma2's attention softcapping). Same (1 + w)
            # parameterization as the family's other norms.
            def _qknorm(name):
                return RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
                               unit_offset=cfg.rmsnorm_unit_offset, name=name)

            q = _qknorm("q_norm")(q)
            k = _qknorm("k_norm")(k)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if kv_cache is not None:
            # Write modes live in _cache_write (one-hot select / one-hot
            # MXU contraction / dynamic_update_slice — each chosen against
            # a measured-pathological XLA lowering; see its docstring).
            if "k_scale" in kv_cache:
                # int8 KV tier (cfg.kv_quant): quantize-on-write with
                # per-(token, head) scales; attention below reads the
                # dequantized full buffers (the dequant multiply fuses
                # into the attention einsum's operand read — the HBM
                # traffic is the int8 cache + 1/128th of scales).
                qk, ks = _kv_quantize(k)
                qv, vs = _kv_quantize(v)
                new_cache = _cache_write(
                    kv_cache,
                    {"k": qk, "k_scale": ks, "v": qv, "v_scale": vs},
                    cache_index, S,
                )
                k = _kv_dequantize(new_cache["k"], new_cache["k_scale"], cfg.dtype)
                v = _kv_dequantize(new_cache["v"], new_cache["v_scale"], cfg.dtype)
            else:
                new_cache = _cache_write(kv_cache, {"k": k, "v": v}, cache_index, S)
                k, v = new_cache["k"], new_cache["v"]

        if kvh != nh and cfg.attention_impl == "ring" and kv_cache is None:
            # Only the ring path still needs equal head counts (its
            # rotating chunks carry K/V at the query head count). The
            # flash kernel is GQA-native (kernels/flash_attention.py maps
            # query head h -> kv head h//group in its index maps) and the
            # einsum/decode path uses grouped attention — neither
            # materializes the repeat, which at decode time would multiply
            # KV-cache HBM traffic by the group size.
            rep = nh // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        if cfg.attention_impl == "ring" and kv_cache is None:
            assert not cfg.sliding_window, "ring attention has no sliding-window support yet"
            assert cfg.attn_logit_softcap is None, "ring attention has no softcap support yet"
            assert cfg.query_pre_attn_scalar is None or cfg.query_pre_attn_scalar == hd, (
                "ring attention uses the default 1/sqrt(head_dim) scale; a "
                "decoupled query_pre_attn_scalar is not plumbed through yet"
            )
            # Context parallelism: this call is one sequence chunk on one
            # device of the ring (must run under shard_map with
            # ``cfg.ring_axis`` bound; caller supplies GLOBAL positions so
            # RoPE is chunk-offset correct). Padding is not supported —
            # the CP path is for packed fixed-length SFT blocks.
            from dalm_tpu.kernels.ring_attention import ring_attention

            ctx = ring_attention(
                q, k, v, axis_name=cfg.ring_axis, causal=True,
                layout=cfg.ring_layout,
            )
            ctx = ctx.reshape(B, S, nh * hd).astype(cfg.dtype)
            out = _proj(cfg.hidden_size, "o_proj", cfg, ("heads", "embed"))(ctx)
            return out, new_cache

        # Attention-score scale: Gemma2 decouples it from head_dim
        # (query_pre_attn_scalar); softcap bounds scores pre-softmax.
        scale = 1.0 / float(cfg.query_pre_attn_scalar or hd) ** 0.5

        def _mask_scores(scores, m):
            """f32-cast + optional softcap (HF order: cap, THEN mask)."""
            s32 = scores.astype(jnp.float32)
            if cfg.attn_logit_softcap is not None:
                cap = cfg.attn_logit_softcap
                s32 = jnp.tanh(s32 / cap) * cap
            return jnp.where(m, s32, jnp.finfo(jnp.float32).min)

        use_flash = (
            cfg.attention_impl == "flash"
            and kv_cache is None
            and S >= 256
            and S % 128 == 0
            and jax.default_backend() == "tpu"
        )
        if use_flash:
            # First-party Pallas blockwise flash kernel: O(S) memory, never
            # builds the (S, S) score matrix, native (B, S, H, D) layout
            # (kernels/flash_attention.py — measured 2.1× fwd / 3.7×
            # fwd+bwd vs the jax library kernel at B4 S2560 H12 D64).
            # Padding is expressed via segment ids (pads form their own
            # segment → real tokens never attend them).
            from dalm_tpu.kernels.flash_attention import flash_attention

            seg = segment_mask  # (B, S) int; None when all-valid
            ctx = flash_attention(
                q, k, v, seg, seg,
                causal=True,
                scale=scale,
                window=cfg.layer_window(self.layer_idx),
                softcap=cfg.attn_logit_softcap,
            ).reshape(B, S, nh * hd).astype(cfg.dtype)
        elif kvh != nh:
            # Grouped-query attention, no K/V repeat: query head g·kvh+j
            # reads kv head j directly. (Head grouping matches
            # jnp.repeat(axis=2): consecutive query heads share a kv head.)
            rep = nh // kvh
            qg = q.reshape(B, S, kvh, rep, hd)
            scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) * jnp.asarray(scale, cfg.dtype)
            scores = _mask_scores(scores, mask[:, :, None])
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v).reshape(B, S, nh * hd)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(scale, cfg.dtype)
            scores = _mask_scores(scores, mask)
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, nh * hd)
        out = _proj(cfg.hidden_size, "o_proj", cfg, ("heads", "embed"))(ctx)
        return out, new_cache


class DecoderLayer(nn.Module):
    cfg: DecoderConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, hidden, mask, cos, sin, kv_cache=None, cache_index=None, segment_mask=None):
        cfg = self.cfg

        def _norm(name):
            return RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
                           unit_offset=cfg.rmsnorm_unit_offset, name=name)

        normed = _norm("input_norm")(hidden)
        if cfg.mla:
            from dalm_tpu.models.mla import MLAAttention

            attn_cls = MLAAttention
        else:
            attn_cls = DecoderAttention
        attn_out, new_cache = attn_cls(cfg, layer_idx=self.layer_idx, name="attention")(
            normed, mask, cos, sin, kv_cache, cache_index, segment_mask
        )
        if cfg.post_norms:
            # Gemma2 sandwich normalization: the branch output is normed
            # before the residual add, and the MLP branch gets its own
            # pre-norm (HF {post_attention,pre/post_feedforward}_layernorm).
            attn_out = _norm("post_attention_norm")(attn_out)
        hidden = hidden + attn_out

        normed = _norm("pre_feedforward_norm" if cfg.post_norms else "post_attention_norm")(hidden)
        moe_aux = jnp.zeros((), jnp.float32)
        if cfg.num_experts and self.layer_idx >= cfg.moe_layer_start:
            from dalm_tpu.models.moe import MoEBlock

            down, moe_aux = MoEBlock(cfg, name="moe")(normed, decode=kv_cache is not None)
        else:
            gate = _proj(cfg.intermediate_size, "gate_proj", cfg, ("embed", "mlp"))(normed)
            up = _proj(cfg.intermediate_size, "up_proj", cfg, ("embed", "mlp"))(normed)
            act = {
                "silu": nn.silu,
                "gelu_tanh": lambda z: nn.gelu(z, approximate=True),
                "gelu": lambda z: nn.gelu(z, approximate=False),
            }[cfg.hidden_act]
            down = _proj(cfg.hidden_size, "down_proj", cfg, ("mlp", "embed"))(act(gate) * up)
        if cfg.post_norms:
            down = _norm("post_feedforward_norm")(down)
        return hidden + down, new_cache, moe_aux


class Decoder(nn.Module):
    cfg: DecoderConfig

    def init_kv_cache(self, batch_size: int, max_len: int, dtype=None) -> dict:
        cfg = self.cfg
        dtype = dtype or cfg.dtype
        if cfg.mla:
            # MLA latent cache: one shared compressed latent + one shared
            # rope key per token — (r + d_rope) · bytes/token vs the
            # standard tier's kv_heads·2·head_dim. The latent IS the
            # compression (57× at V3 shapes), so the int8-KV tier does
            # not stack on it (rejected loudly).
            if cfg.kv_quant:
                raise ValueError(
                    "kv_quant is not supported with MLA: the latent cache "
                    "is already the compressed tier (kv_lora_rank + "
                    "qk_rope_head_dim floats/token)"
                )
            return {
                f"layer_{i}": {
                    "k": jnp.zeros((batch_size, max_len, cfg.kv_lora_rank), dtype),
                    "pe": jnp.zeros((batch_size, max_len, cfg.qk_rope_head_dim), dtype),
                }
                for i in range(cfg.num_layers)
            }
        shape = (batch_size, max_len, cfg.kv_heads, cfg.head_dim)
        if cfg.kv_quant:
            # int8 KV tier: int8 values + per-(token, head) f32 scales.
            # Zero-initialized scales dequantize unwritten slots to 0,
            # which the causal/length masks exclude anyway (same contract
            # as the zero-initialized float buffers below).
            def _layer():
                return {
                    "k": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.zeros(shape[:3], jnp.float32),
                    "v": jnp.zeros(shape, jnp.int8),
                    "v_scale": jnp.zeros(shape[:3], jnp.float32),
                }

            return {f"layer_{i}": _layer() for i in range(cfg.num_layers)}
        return {
            f"layer_{i}": {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for i in range(cfg.num_layers)
        }

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        positions=None,
        kv_cache: Optional[dict] = None,
        cache_index: Any = None,
        return_hidden: bool = False,
        neftune_alpha: float = 0.0,
        noise_rng: Optional[jax.Array] = None,
        return_moe_aux: bool = False,
        logits_last_only: bool = False,
    ):
        """Full-sequence: logits (B, S, V). With kv_cache: (logits, new_cache).

        ``attention_mask``: (B, S) for full-sequence; (B, max_len) over key
        positions when decoding with a cache. ``return_moe_aux=True``
        additionally returns the layer-mean MoE load-balancing aux
        (models/moe.py) as the last element — 0.0 for dense configs.

        ``logits_last_only=True`` computes the LM head only for the final
        sequence position, returning logits (B, 1, V). Prefill only needs
        the last token's distribution, and a full (B, P, V) logit tensor
        is the largest intermediate of a long-prompt admission (1 GB at
        B=16, P=1024, V=32k) — slicing the hidden state first keeps the
        head matmul (B, 1, H)×(H, V).
        """
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            if kv_cache is not None:
                base = jnp.asarray(cache_index, jnp.int32).reshape(-1, 1)  # scalar or (B,)
                positions = jnp.broadcast_to(base, (B, 1)) + jnp.arange(S)[None, :]
            elif attention_mask is not None:
                # Left-padding-safe positions: cumsum over the mask.
                positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, min=0)
            else:
                positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))

        hidden = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="embed_tokens",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
        )(input_ids)
        if cfg.scale_embeddings:
            # Gemma: normalizer cast to the embed dtype BEFORE multiplying
            # (HF GemmaModel semantics — matters for bf16 parity).
            hidden = hidden * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)

        if neftune_alpha > 0.0 and noise_rng is not None:
            # NEFTune (generator SFT, reference `generator_only/trainer.py:219`
            # neftune_noise_alpha=5): uniform noise on the token embeddings
            # scaled by alpha / sqrt(S * H).
            scale = neftune_alpha / jnp.sqrt(
                jnp.asarray(S * cfg.hidden_size, jnp.float32)
            )
            noise = jax.random.uniform(
                noise_rng, hidden.shape, jnp.float32, minval=-1.0, maxval=1.0
            )
            hidden = hidden + (noise * scale).astype(hidden.dtype)

        # Global-theta rope; Gemma3 ≥4B linearly scales ONLY this one
        # (HF scales ``rotary_emb`` via rope_scaling but instantiates
        # ``rotary_emb_local`` with rope_type "default").
        pos_global = positions
        if cfg.rope_scaling_factor:
            pos_global = positions.astype(jnp.float32) / cfg.rope_scaling_factor
        cos, sin = rope_cos_sin(
            pos_global,
            # MLA rotates only the decoupled rope slice (q_pe/k_pe)
            cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim,
            cfg.rope_theta, cfg.dtype,
            llama3_scaling=cfg.rope_llama3,
            yarn=cfg.rope_yarn,
        )
        cos_local = sin_local = None
        if cfg.rope_local_theta is not None:
            # Gemma3 dual rope: sliding layers rotate at the local base
            # frequency with UNSCALED positions.
            cos_local, sin_local = rope_cos_sin(
                positions, cfg.head_dim, cfg.rope_local_theta, cfg.dtype
            )

        if kv_cache is not None:
            # Cached decode: causality is over cache *slots*, not rope
            # positions (with left padding the semantic position lags the
            # slot index). ``attention_mask`` marks valid slots.
            key_len = kv_cache["layer_0"]["k"].shape[1]
            key_slot = jnp.arange(key_len)[None, None, None, :]
            base = jnp.asarray(cache_index, jnp.int32).reshape(-1, 1)  # scalar or (B,)
            q_slot = (base + jnp.arange(S)[None, :])[:, None, :, None]
            mask = key_slot <= q_slot
            if attention_mask is not None:
                mask = mask & (attention_mask[:, None, None, :] > 0)
            # slot index − semantic position is a per-row constant
            # (the pad offset), so the slot-space band == position band
            mask_win = (
                mask & (key_slot > q_slot - cfg.sliding_window)
                if cfg.sliding_window else mask
            )
        else:
            q_pos = positions[:, None, :, None]
            k_pos = positions[:, None, None, :]
            mask = k_pos <= q_pos
            if attention_mask is not None:
                mask = mask & (attention_mask[:, None, None, :] > 0)
            mask_win = (
                mask & (k_pos > q_pos - cfg.sliding_window)
                if cfg.sliding_window else mask
            )

        segment_mask = None
        if kv_cache is None and attention_mask is not None:
            segment_mask = attention_mask.astype(jnp.int32)

        layer_cls = DecoderLayer
        if cfg.remat and kv_cache is None:
            layer_cls = nn.remat(DecoderLayer, static_argnums=())

        new_cache = {} if kv_cache is not None else None
        moe_aux_sum = jnp.zeros((), jnp.float32)
        for i in range(cfg.num_layers):
            layer_cache = kv_cache[f"layer_{i}"] if kv_cache is not None else None
            windowed = cfg.layer_window(i)
            layer_mask = mask_win if windowed else mask
            lcos, lsin = (
                (cos_local, sin_local)
                if (windowed and cos_local is not None) else (cos, sin)
            )
            hidden, layer_new, layer_aux = layer_cls(cfg, layer_idx=i, name=f"layer_{i}")(
                hidden, layer_mask, lcos, lsin, layer_cache, cache_index, segment_mask
            )
            moe_aux_sum = moe_aux_sum + layer_aux
            if new_cache is not None:
                new_cache[f"layer_{i}"] = layer_new
        moe_aux = moe_aux_sum / cfg.num_layers

        hidden = RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
                         unit_offset=cfg.rmsnorm_unit_offset, name="final_norm")(hidden)
        if return_hidden:
            return hidden
        if logits_last_only:
            hidden = hidden[:, -1:, :]

        if cfg.tie_embeddings:
            embed = self.variables["params"]["embed_tokens"]["embedding"]
            from flax.core import meta
            if isinstance(embed, meta.Partitioned):
                embed = embed.value
            logits = hidden @ embed.astype(cfg.dtype).T
        else:
            logits = _proj(cfg.vocab_size, "lm_head", cfg, ("embed", "vocab"))(hidden)

        if cfg.final_logit_softcap is not None:
            cap = cfg.final_logit_softcap
            logits = jnp.tanh(logits.astype(jnp.float32) / cap) * cap
            logits = logits.astype(cfg.dtype)

        if kv_cache is not None:
            return (logits, new_cache, moe_aux) if return_moe_aux else (logits, new_cache)
        return (logits, moe_aux) if return_moe_aux else logits
