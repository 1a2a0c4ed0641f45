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
    # gemma (v1) and gemma2 are implemented; gemma3 checkpoints share
    # weight names but need per-layer rope bases and QK-norm we don't
    # implement — loading one as gemma2 would produce garbage outputs.
    if model_type.startswith("gemma") and model_type not in ("gemma", "gemma2"):
        raise ValueError(
            f"unsupported gemma-family model_type {model_type!r}: only "
            "'gemma' (v1) and 'gemma2' are implemented (gemma3 needs "
            "per-layer rope bases and QK-norm)"
        )
    gemma_family = model_type in ("gemma", "gemma2")
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
            hf.get("query_pre_attn_scalar") if model_type == "gemma2" else None
        ),
        attn_logit_softcap=(
            hf.get("attn_logit_softcapping") if model_type == "gemma2" else None
        ),
        final_logit_softcap=(
            hf.get("final_logit_softcapping") if model_type == "gemma2" else None
        ),
        post_norms=model_type == "gemma2",
        sliding_layers="even" if model_type == "gemma2" else "all",
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
    for i in range(cfg.num_layers):
        hf_layer = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.q_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.q_proj.bias", cfg),
                "k_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.k_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.k_proj.bias", cfg),
                "v_proj": _maybe_bias({"kernel": W(f"{hf_layer}.self_attn.v_proj.weight")},
                                      arr, f"{hf_layer}.self_attn.v_proj.bias", cfg),
                "o_proj": {"kernel": W(f"{hf_layer}.self_attn.o_proj.weight")},
            },
            "input_norm": {"scale": arr(f"{hf_layer}.input_layernorm.weight")},
            "gate_proj": {"kernel": W(f"{hf_layer}.mlp.gate_proj.weight")},
            "up_proj": {"kernel": W(f"{hf_layer}.mlp.up_proj.weight")},
            "down_proj": {"kernel": W(f"{hf_layer}.mlp.down_proj.weight")},
        }
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
