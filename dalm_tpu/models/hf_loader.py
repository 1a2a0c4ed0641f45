"""HF-torch checkpoint interop.

Loads HuggingFace torch checkpoints — BERT-family encoders (bge) and
Llama-family decoders — into this framework's Flax parameter trees, and
exports LoRA adapters in a PEFT-compatible torch layout so reference
tooling can consume them (SURVEY.md §7.3.4).

The reference resolves models via ``AutoModel.from_pretrained``
(`/root/reference/dalm/models/retriever_only_base_model.py:23-27`); here
a local HF checkpoint directory (``config.json`` +
``model.safetensors``/``pytorch_model.bin``) is converted weight-for-
weight: torch ``nn.Linear`` stores (out, in) — transposed into Flax
(in, out) kernels. Llama rotary uses the rotate-half convention in both,
so attention weights port directly.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Tuple

import numpy as np

from dalm_tpu.models.decoder import DecoderConfig
from dalm_tpu.models.encoder import EncoderConfig

logger = logging.getLogger(__name__)


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """state dict from safetensors or pytorch_model.bin → numpy."""
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        state = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.to(torch.float32).numpy() for k, v in state.items()}
    raise FileNotFoundError(f"no model.safetensors or pytorch_model.bin in {path}")


def _read_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# --------------------------------------------------------------------------
# BERT-family encoder (bge)
# --------------------------------------------------------------------------

def load_hf_encoder(path: str, dtype=None) -> Tuple[EncoderConfig, Any]:
    hf = _read_hf_config(path)
    cfg = EncoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        hidden_dropout=hf.get("hidden_dropout_prob", 0.1),
        attention_dropout=hf.get("attention_probs_dropout_prob", 0.1),
    )
    if dtype is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=dtype)
    state = _load_torch_state(path)
    # Strip an optional "bert." wrapper prefix (BertModel vs BertFor*).
    if any(k.startswith("bert.") for k in state):
        state = {k[len("bert."):]: v for k, v in state.items() if k.startswith("bert.")}

    def W(name):  # torch Linear weight → flax kernel
        return state[name].T.astype(np.float32)

    def arr(name):
        return state[name].astype(np.float32)

    params: Dict[str, Any] = {
        "word_embeddings": {"embedding": arr("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": arr("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": arr("embeddings.token_type_embeddings.weight")},
        "embeddings_norm": {
            "scale": arr("embeddings.LayerNorm.weight"),
            "bias": arr("embeddings.LayerNorm.bias"),
        },
    }
    for i in range(cfg.num_layers):
        hf_layer = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": W(f"{hf_layer}.attention.self.query.weight"),
                          "bias": arr(f"{hf_layer}.attention.self.query.bias")},
                "key": {"kernel": W(f"{hf_layer}.attention.self.key.weight"),
                        "bias": arr(f"{hf_layer}.attention.self.key.bias")},
                "value": {"kernel": W(f"{hf_layer}.attention.self.value.weight"),
                          "bias": arr(f"{hf_layer}.attention.self.value.bias")},
                "output": {"kernel": W(f"{hf_layer}.attention.output.dense.weight"),
                           "bias": arr(f"{hf_layer}.attention.output.dense.bias")},
            },
            "attention_norm": {
                "scale": arr(f"{hf_layer}.attention.output.LayerNorm.weight"),
                "bias": arr(f"{hf_layer}.attention.output.LayerNorm.bias"),
            },
            "intermediate": {"kernel": W(f"{hf_layer}.intermediate.dense.weight"),
                             "bias": arr(f"{hf_layer}.intermediate.dense.bias")},
            "mlp_output": {"kernel": W(f"{hf_layer}.output.dense.weight"),
                           "bias": arr(f"{hf_layer}.output.dense.bias")},
            "mlp_norm": {
                "scale": arr(f"{hf_layer}.output.LayerNorm.weight"),
                "bias": arr(f"{hf_layer}.output.LayerNorm.bias"),
            },
        }
    logger.info("loaded HF encoder from %s (%d layers, hidden %d)", path, cfg.num_layers, cfg.hidden_size)
    return cfg, params


# --------------------------------------------------------------------------
# Llama-family decoder
# --------------------------------------------------------------------------

def _maybe_bias(entry: dict, arr, key: str, cfg) -> dict:
    if cfg.attention_bias:
        entry["bias"] = arr(key)
    return entry


def load_hf_decoder(path: str, dtype=None) -> Tuple[DecoderConfig, Any]:
    hf = _read_hf_config(path)
    model_type = hf.get("model_type") or ""
    # gemma (v1), gemma2, and gemma3_text are implemented. A bare
    # "gemma3" config is the MULTIMODAL wrapper (vision tower +
    # language_model.*-prefixed weights) — reject it rather than load
    # garbage; its text_config is what gemma3_text covers.
    if model_type.startswith("gemma") and model_type not in (
        "gemma", "gemma2", "gemma3_text"
    ):
        raise ValueError(
            f"unsupported gemma-family model_type {model_type!r}: "
            "'gemma' (v1), 'gemma2', and 'gemma3_text' are implemented "
            "(multimodal 'gemma3' wraps a vision tower; extract the text "
            "checkpoint / text_config)"
        )
    gemma_family = model_type in ("gemma", "gemma2", "gemma3_text")
    gemma3 = model_type == "gemma3_text"
    # Qwen3 gates ALL FOUR attention projections (o_proj included) on
    # attention_bias; this decoder biases q/k/v only (the Qwen2 layout).
    # No shipped qwen3 checkpoint sets it — refuse rather than mis-load.
    if model_type in ("qwen3", "qwen3_moe") and hf.get("attention_bias"):
        raise ValueError(
            f"{model_type} with attention_bias=true puts a bias on o_proj "
            "too, which this loader does not map; no shipped checkpoint sets it"
        )
    # MoE families (models/moe.py). Qwen3-MoE can interleave dense MLP
    # layers (decoder_sparse_step / mlp_only_layers); this decoder makes
    # EVERY layer sparse when num_experts is set — reject the interleaved
    # configs (no shipped Qwen3-MoE checkpoint uses them) rather than
    # silently loading a wrong architecture.
    if model_type == "qwen3_moe" and (
        hf.get("decoder_sparse_step", 1) != 1 or hf.get("mlp_only_layers")
    ):
        raise ValueError(
            "qwen3_moe with decoder_sparse_step != 1 or non-empty "
            "mlp_only_layers interleaves dense MLP layers, which this "
            "decoder does not implement"
        )
    num_experts = (
        hf.get("num_local_experts") if model_type == "mixtral"
        else hf.get("num_experts") if model_type == "qwen3_moe"
        # deepseek_v3: only when some layer actually IS MoE (all-dense
        # configs — first_k_dense_replace >= layers — load as plain MLA)
        else hf.get("n_routed_experts") if (
            model_type == "deepseek_v3"
            and hf.get("n_routed_experts")
            and hf.get("first_k_dense_replace", 0) < hf["num_hidden_layers"]
        )
        else None
    )
    # Phi-3-small-class checkpoints rotate only part of head_dim; this
    # decoder applies rope to the full head (phi-3-mini ships 1.0).
    if model_type == "phi3" and float(hf.get("partial_rotary_factor") or 1.0) != 1.0:
        raise ValueError(
            "phi3 with partial_rotary_factor != 1.0 is not implemented "
            "(this decoder rotates the full head_dim)"
        )
    # rope_scaling, any family. Implemented: "linear" (position
    # division — on gemma3 it applies to the global rope only, matching
    # HF, since the local rope has no scaling; elsewhere all layers use
    # the global rope) and "llama3" (Llama-3.1's frequency-band
    # inv_freq rewrite). Everything else (yarn/dynamic/longrope) is
    # rejected loudly — silently ignoring it would load a checkpoint
    # that produces wrong attention beyond its original context.
    rope_scaling_factor = None
    rope_llama3 = None
    # deepseek_v3 handles its own rope_scaling (yarn) below
    if isinstance(hf.get("rope_scaling"), dict) and model_type != "deepseek_v3":
        rs = hf["rope_scaling"]
        rs_type = rs.get("rope_type", rs.get("type"))
        if rs_type == "linear":
            rope_scaling_factor = float(rs["factor"])
        elif rs_type == "llama3":
            rope_llama3 = (
                float(rs["factor"]),
                float(rs["low_freq_factor"]),
                float(rs["high_freq_factor"]),
                float(rs["original_max_position_embeddings"]),
            )
        elif rs_type != "default":
            raise ValueError(
                f"unsupported rope_scaling type {rs_type!r} for "
                f"{model_type!r}: only 'linear' and 'llama3' are "
                "implemented (refusing to ignore it silently)"
            )
    # DeepSeek-V3 (MLA attention, models/mla.py + noaux-tc MoE,
    # models/moe.py route_noaux_tc + YaRN rope with mscale).
    mla = model_type == "deepseek_v3"
    ds_moe = False
    rope_yarn = None
    attn_scale_mult = 1.0
    if mla:
        rs = hf.get("rope_scaling")
        if isinstance(rs, dict) and (rs.get("rope_type", rs.get("type"))) == "yarn":
            # YaRN (HF _compute_yarn_parameters, truncate default):
            # attention_factor multiplies cos/sin; DeepSeek's
            # mscale_all_dim additionally rescales the softmax scale by
            # get_mscale(factor, mscale_all_dim)^2
            # (DeepseekV3Attention.__init__).
            import math as _math

            def _get_mscale(scale, ms=1.0):
                return 1.0 if scale <= 1 else 0.1 * ms * _math.log(scale) + 1.0

            yfactor = float(rs["factor"])
            af = rs.get("attention_factor")
            msc, msc_all = rs.get("mscale"), rs.get("mscale_all_dim")
            if af is None:
                if msc and msc_all:
                    af = _get_mscale(yfactor, msc) / _get_mscale(yfactor, msc_all)
                else:
                    af = _get_mscale(yfactor)
            if not rs.get("truncate", True):
                raise ValueError("yarn with truncate=false is not implemented")
            rope_yarn = (
                yfactor,
                float(rs.get("beta_fast") or 32),
                float(rs.get("beta_slow") or 1),
                float(rs.get("original_max_position_embeddings")
                      or hf.get("max_position_embeddings", 4096)),
                float(af),
            )
            if msc_all:
                m = _get_mscale(yfactor, float(msc_all))
                attn_scale_mult = m * m
            hf = dict(hf, rope_scaling=None)  # consumed here, not by the generic branch
        elif rs is not None:
            raise ValueError(
                f"deepseek_v3 rope_scaling type {rs.get('rope_type', rs.get('type'))!r} "
                "is not implemented (yarn and null are)"
            )
        ds_moe = bool(hf.get("n_routed_experts")) and (
            hf.get("first_k_dense_replace", 0) < hf["num_hidden_layers"]
        )

    gemma3_sliding: "tuple | None" = None
    if gemma3:
        layer_types = hf.get("layer_types") or [
            # HF default when layer_types is absent: pattern 6 —
            # five sliding layers then one full-attention layer.
            "sliding_attention"
            if bool((i + 1) % hf.get("sliding_window_pattern", 6))
            else "full_attention"
            for i in range(hf["num_hidden_layers"])
        ]
        gemma3_sliding = tuple(t == "sliding_attention" for t in layer_types)
    # An absent hidden_act means the family default (silu); an explicitly
    # null or unknown value must not fall through to silu silently.
    act_present = "hidden_act" in hf or "hidden_activation" in hf
    act = hf.get("hidden_act", hf.get("hidden_activation"))
    if act_present and act not in ("silu", "gelu", "gelu_pytorch_tanh"):
        raise ValueError(
            f"unrecognized hidden_act {act!r}; supported: silu, gelu, "
            "gelu_pytorch_tanh (refusing to default to silu silently)"
        )
    cfg = DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads"),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        # Gemma serializes no tie_word_embeddings key (always tied).
        tie_embeddings=hf.get("tie_word_embeddings", gemma_family),
        # Qwen2-family configs gate the window behind use_sliding_window
        # (shipped false on most checkpoints even when sliding_window is
        # set); Mistral-family configs have no gate — default True.
        sliding_window=(
            (hf.get("sliding_window") or None)
            if hf.get("use_sliding_window", True) else None
        ),
        # Qwen2 sets qkv bias via the architecture (no explicit flag in
        # older configs); attention_bias covers Llama-style configs too.
        attention_bias=bool(
            hf.get("attention_bias", False) or hf.get("model_type") == "qwen2"
        ),
        # Gemma family: decoupled head_dim, GeGLU, scaled embeddings,
        # (1 + w) RMSNorm — same weight names as Llama otherwise.
        head_dim_override=hf.get("head_dim"),
        # Gemma's config-level "gelu" means tanh-approx (HF remaps it);
        # a non-Gemma "gelu" is exact-erf GeLU and loads as such.
        hidden_act=(
            "gelu_tanh"
            if (
                hf.get("hidden_act", hf.get("hidden_activation"))
                == "gelu_pytorch_tanh"
                or (hf.get("model_type") == "gemma"
                    and hf.get("hidden_act", hf.get("hidden_activation")) == "gelu")
            )
            else {"silu": "silu", "gelu": "gelu"}.get(
                hf.get("hidden_act", "silu"), "silu"
            )
        ),
        scale_embeddings=gemma_family,
        rmsnorm_unit_offset=gemma_family,
        # Gemma2: decoupled attention scale, attn/final logit softcapping,
        # sandwich norms, and sliding window on even layers only (HF
        # ``layer_types`` alternates sliding/full starting at layer 0).
        # Gated on model_type like post_norms/sliding_layers: a non-gemma2
        # checkpoint that happens to carry these keys (or a future family
        # reusing the names with different semantics) must not silently
        # activate Gemma2 behavior.
        query_pre_attn_scalar=(
            hf.get("query_pre_attn_scalar")
            if model_type in ("gemma2", "gemma3_text") else None
        ),
        attn_logit_softcap=(
            hf.get("attn_logit_softcapping") if model_type == "gemma2" else None
        ),
        final_logit_softcap=(
            hf.get("final_logit_softcapping") if model_type == "gemma2" else None
        ),
        post_norms=model_type in ("gemma2", "gemma3_text"),
        sliding_layers=(
            gemma3_sliding if gemma3
            else ("even" if model_type == "gemma2" else "all")
        ),
        # Gemma3: QK-norm replaces gemma2's attention softcapping; sliding
        # layers rotate at rope_local_base_freq, full layers at rope_theta.
        # Qwen3's only attention delta from Qwen2 is the same per-head
        # QK-norm (standard w scale — rmsnorm_unit_offset stays False —
        # vs gemma's (1+w)); it drops Qwen2's qkv bias.
        qk_norm=gemma3 or model_type in ("qwen3", "qwen3_moe"),
        rope_local_theta=hf.get("rope_local_base_freq") if gemma3 else None,
        rope_scaling_factor=rope_scaling_factor,
        rope_llama3=rope_llama3,
        # MoE: Mixtral always renormalizes the top-k weights (no config
        # key); Qwen3-MoE gates it on norm_topk_prob.
        num_experts=num_experts,
        num_experts_per_tok=hf.get("num_experts_per_tok") or 2,
        moe_intermediate_size=hf.get("moe_intermediate_size"),
        norm_topk_prob=bool(hf.get("norm_topk_prob", True)),
        # MLA (deepseek_v3): latent-KV attention geometry + the
        # pair-interleaved rope weight layout V3 checkpoints ship.
        q_lora_rank=hf.get("q_lora_rank") if mla else None,
        kv_lora_rank=hf.get("kv_lora_rank") if mla else None,
        qk_nope_head_dim=hf.get("qk_nope_head_dim") if mla else None,
        qk_rope_head_dim=hf.get("qk_rope_head_dim") if mla else None,
        v_head_dim=hf.get("v_head_dim") if mla else None,
        rope_interleave=bool(hf.get("rope_interleave", True)) if mla else False,
        rope_yarn=rope_yarn,
        attn_scale_mult=attn_scale_mult,
        # deepseek_v3 MoE (noaux-tc router + shared experts + leading
        # dense layers); inert (defaults) for every other family.
        moe_router="noaux_tc" if ds_moe else "softmax",
        moe_n_group=hf.get("n_group") if ds_moe else None,
        moe_topk_group=hf.get("topk_group") if ds_moe else None,
        moe_routed_scaling_factor=float(hf.get("routed_scaling_factor", 1.0)) if ds_moe else 1.0,
        moe_n_shared_experts=int(hf.get("n_shared_experts") or 0) if ds_moe else 0,
        moe_layer_start=int(hf.get("first_k_dense_replace", 0)) if ds_moe else 0,
    )
    if model_type == "gemma2" and hf.get("layer_types"):
        expected = [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(hf["num_hidden_layers"])
        ]
        if list(hf["layer_types"]) != expected:
            raise ValueError(
                "gemma2 layer_types deviates from the even-sliding "
                f"alternation this loader implements: {hf['layer_types']!r}"
            )
    if dtype is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=dtype)
    state = _load_torch_state(path)

    def W(name):
        return state[name].T.astype(np.float32)

    def arr(name):
        return state[name].astype(np.float32)

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": arr("model.embed_tokens.weight")},
        "final_norm": {"scale": arr("model.norm.weight")},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"kernel": W("lm_head.weight")}
    phi3 = model_type == "phi3"
    for i in range(cfg.num_layers):
        hf_layer = f"model.layers.{i}"
        # deepseek_v3: layers below first_k_dense_replace are plain
        # dense MLPs even in MoE checkpoints
        moe_layer = bool(cfg.num_experts) and i >= cfg.moe_layer_start
        if phi3:
            # Phi3 fuses the projections: qkv_proj stacks [q; k; v] rows,
            # gate_up_proj stacks [gate; up] (HF Phi3Attention slices in
            # that order; Phi3MLP chunks gate first). Split into this
            # decoder's per-projection layout.
            qkv = state[f"{hf_layer}.self_attn.qkv_proj.weight"]
            q_rows = cfg.num_heads * cfg.head_dim
            kv_rows = cfg.kv_heads * cfg.head_dim
            attention = {
                "q_proj": {"kernel": qkv[:q_rows].T.astype(np.float32)},
                "k_proj": {"kernel": qkv[q_rows:q_rows + kv_rows].T.astype(np.float32)},
                "v_proj": {"kernel": qkv[q_rows + kv_rows:].T.astype(np.float32)},
                "o_proj": {"kernel": W(f"{hf_layer}.self_attn.o_proj.weight")},
            }
            gate_up = state[f"{hf_layer}.mlp.gate_up_proj.weight"]
            gate_w = gate_up[: cfg.intermediate_size].T.astype(np.float32)
            up_w = gate_up[cfg.intermediate_size:].T.astype(np.float32)
        elif cfg.mla:
            # DeepSeek-V3 MLA projections (models/mla.py). kv_b_proj is
            # a RAW kernel param (both paths contract it explicitly —
            # the decode path absorbs its K half into the query), so it
            # maps to the bare (r, nh·(dn+dv)) array, not a FlexLinear
            # {"kernel": ...} dict.
            sa = f"{hf_layer}.self_attn"
            attention = {
                "kv_a_proj": _maybe_bias(
                    {"kernel": W(f"{sa}.kv_a_proj_with_mqa.weight")},
                    arr, f"{sa}.kv_a_proj_with_mqa.bias", cfg),
                "kv_a_norm": {"scale": arr(f"{sa}.kv_a_layernorm.weight")},
                "kv_b_proj": W(f"{sa}.kv_b_proj.weight"),
                "o_proj": _maybe_bias({"kernel": W(f"{sa}.o_proj.weight")},
                                      arr, f"{sa}.o_proj.bias", cfg),
            }
            if cfg.q_lora_rank:
                attention.update({
                    "q_a_proj": _maybe_bias({"kernel": W(f"{sa}.q_a_proj.weight")},
                                            arr, f"{sa}.q_a_proj.bias", cfg),
                    "q_a_norm": {"scale": arr(f"{sa}.q_a_layernorm.weight")},
                    "q_b_proj": {"kernel": W(f"{sa}.q_b_proj.weight")},
                })
            else:
                attention["q_proj"] = {"kernel": W(f"{sa}.q_proj.weight")}
            gate_w = up_w = None
            if not moe_layer:
                gate_w = W(f"{hf_layer}.mlp.gate_proj.weight")
                up_w = W(f"{hf_layer}.mlp.up_proj.weight")
        else:
            attention = {
                "q_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.q_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.q_proj.bias", cfg),
                "k_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.k_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.k_proj.bias", cfg),
                "v_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.v_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.v_proj.bias", cfg),
                "o_proj": {"kernel": W(f"{hf_layer}.self_attn.o_proj.weight")},
                **(
                    {
                        "q_norm": {"scale": arr(f"{hf_layer}.self_attn.q_norm.weight")},
                        "k_norm": {"scale": arr(f"{hf_layer}.self_attn.k_norm.weight")},
                    }
                    if cfg.qk_norm else {}
                ),
            }
            gate_w = up_w = None
            if not cfg.num_experts:
                gate_w = W(f"{hf_layer}.mlp.gate_proj.weight")
                up_w = W(f"{hf_layer}.mlp.up_proj.weight")
        params[f"layer_{i}"] = {
            "attention": attention,
            "input_norm": {"scale": arr(f"{hf_layer}.input_layernorm.weight")},
        }
        if moe_layer:
            # MoE checkpoints store per-expert tensors; stack them into
            # this block's (E, H, M)/(E, M, H) batched-einsum layout
            # (models/moe.py). Mixtral: block_sparse_moe.gate +
            # experts.{j}.w1/w3/w2 (gate/up/down). Qwen3-MoE and
            # DeepSeek-V3: mlp.gate + experts.{j}.{gate,up,down}_proj;
            # V3 adds the noaux-tc gate bias and the shared experts.
            if model_type == "mixtral":
                base = f"{hf_layer}.block_sparse_moe"
                names = ("w1.weight", "w3.weight", "w2.weight")
            else:
                base = f"{hf_layer}.mlp"
                names = ("gate_proj.weight", "up_proj.weight", "down_proj.weight")
            stack = {
                out: np.stack([
                    state[f"{base}.experts.{j}.{hf_name}"].T.astype(np.float32)
                    for j in range(cfg.num_experts)
                ])
                for out, hf_name in zip(("w_gate", "w_up", "w_down"), names)
            }
            params[f"layer_{i}"]["moe"] = {
                "router": W(f"{base}.gate.weight"),
                **stack,
            }
            if cfg.moe_router == "noaux_tc":
                params[f"layer_{i}"]["moe"]["e_score_correction_bias"] = arr(
                    f"{base}.gate.e_score_correction_bias"
                )
            if cfg.moe_n_shared_experts:
                se = f"{base}.shared_experts"
                params[f"layer_{i}"]["moe"].update({
                    "shared_gate": W(f"{se}.gate_proj.weight"),
                    "shared_up": W(f"{se}.up_proj.weight"),
                    "shared_down": W(f"{se}.down_proj.weight"),
                })
        else:
            params[f"layer_{i}"].update({
                "gate_proj": {"kernel": gate_w},
                "up_proj": {"kernel": up_w},
                "down_proj": {"kernel": W(f"{hf_layer}.mlp.down_proj.weight")},
            })
        if cfg.post_norms:
            # Gemma2 sandwich norms: HF post_attention_layernorm is the
            # post-ATTENTION norm here (not Llama's pre-MLP norm), and the
            # MLP branch has its own pre/post pair.
            params[f"layer_{i}"].update({
                "post_attention_norm": {"scale": arr(f"{hf_layer}.post_attention_layernorm.weight")},
                "pre_feedforward_norm": {"scale": arr(f"{hf_layer}.pre_feedforward_layernorm.weight")},
                "post_feedforward_norm": {"scale": arr(f"{hf_layer}.post_feedforward_layernorm.weight")},
            })
        else:
            params[f"layer_{i}"]["post_attention_norm"] = {
                "scale": arr(f"{hf_layer}.post_attention_layernorm.weight")
            }
    logger.info("loaded HF decoder from %s (%d layers, hidden %d)", path, cfg.num_layers, cfg.hidden_size)
    return cfg, params


# --------------------------------------------------------------------------
# PEFT-compatible adapter export
# --------------------------------------------------------------------------

def peft_arch_for_config(cfg) -> "str | None":
    """Config type → PEFT module-path layout ("llama"/"bert"), or None
    when no compatible torch-PEFT layout exists (e.g. GPT-2's fused
    c_attn has no per-projection twin)."""
    from dalm_tpu.models.decoder import DecoderConfig
    from dalm_tpu.models.encoder import EncoderConfig

    if isinstance(cfg, EncoderConfig):
        return "bert"
    if isinstance(cfg, DecoderConfig):
        return "llama"
    return None


def export_peft_if_supported(
    output_dir: str, flat_adapter: Dict[str, dict], spec, model_cfg,
    base_model_name_or_path: str = "",
) -> bool:
    """Trainer-facing wrapper: export when the config has a PEFT layout."""
    arch = peft_arch_for_config(model_cfg)
    if arch is None:
        logger.warning(
            "PEFT adapter export is not supported for %s; skipping",
            type(model_cfg).__name__,
        )
        return False
    export_peft_adapter(
        output_dir, flat_adapter, spec, arch=arch,
        base_model_name_or_path=base_model_name_or_path,
    )
    return True


def export_peft_adapter(
    output_dir: str,
    lora_params: Dict[str, dict],
    spec,
    arch: str = "llama",
    base_model_name_or_path: str = "",
) -> None:
    """Write ``adapter_model.bin`` + ``adapter_config.json`` in PEFT layout.

    Our merge math is PEFT's (``W + alpha/r * A @ B``); PEFT stores
    ``lora_A.weight`` as (r, in) and ``lora_B.weight`` as (out, r), so
    A/B transpose on the way out.
    """
    import torch

    tensors = {}
    for path_str, ab in lora_params.items():
        parts = path_str.split("/")
        module = parts[-2]  # e.g. q_proj / query
        if arch == "llama":
            hf_idx = parts[0].split("_")[1] if parts[0].startswith("layer_") else "0"
            prefix = f"base_model.model.model.layers.{hf_idx}.self_attn.{module}"
        else:  # bert-family
            hf_idx = parts[0].split("_")[1] if parts[0].startswith("layer_") else "0"
            prefix = f"base_model.model.encoder.layer.{hf_idx}.attention.self.{module}"
        a = np.asarray(ab["lora_a"], np.float32)
        b = np.asarray(ab["lora_b"], np.float32)
        tensors[f"{prefix}.lora_A.weight"] = torch.tensor(a.T)
        tensors[f"{prefix}.lora_B.weight"] = torch.tensor(b.T)

    os.makedirs(output_dir, exist_ok=True)
    torch.save(tensors, os.path.join(output_dir, "adapter_model.bin"))
    with open(os.path.join(output_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "peft_type": "LORA",
                "task_type": "CAUSAL_LM" if arch == "llama" else "FEATURE_EXTRACTION",
                "r": spec.rank,
                "lora_alpha": spec.alpha,
                "lora_dropout": spec.dropout,
                "target_modules": list(spec.target_modules),
                "base_model_name_or_path": base_model_name_or_path,
                "bias": "none",
            },
            f,
            indent=2,
        )
