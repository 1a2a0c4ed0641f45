"""Model resolution + save/load of final artifacts.

The reference resolves models by HF hub name (`AutoModel.from_pretrained`).
Here a model spec is one of:
- a registered config name ("tiny", "bge-small", "bge-large",
  "tiny-decoder", "llama2-7b", "llama3-8b") → fresh random init;
- a directory previously written by :func:`save_pretrained` (our native
  format: ``config.json`` + ``params.msgpack``);
- a directory holding an HF torch checkpoint → converted through
  ``dalm_tpu.models.hf_loader``.

Final-artifact layout matches the reference's
(`train_rage2e.py:508-524`): ``{output_dir}/retriever`` and
``{output_dir}/generator``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.encoder import EncoderConfig
from dalm_tpu.models.gpt2 import GPT2Config, GPT2Decoder

ENCODER_PRESETS = {
    "tiny": EncoderConfig.tiny,
    "bge-small": EncoderConfig.bge_small,
    "bge-large": EncoderConfig.bge_large,
}

DECODER_PRESETS = {
    "tiny": DecoderConfig.tiny,
    "tiny-decoder": DecoderConfig.tiny,
    "llama2-7b": DecoderConfig.llama2_7b,
    "llama3-8b": DecoderConfig.llama3_8b,
    "llama2-13b": DecoderConfig.llama2_13b,
    "mistral-7b": DecoderConfig.mistral_7b,
    "qwen2.5-7b": DecoderConfig.qwen25_7b,
    "qwen3-8b": DecoderConfig.qwen3_8b,
    "mixtral-8x7b": DecoderConfig.mixtral_8x7b,
    "mixtral-mini-4b": DecoderConfig.mixtral_mini_4b,
    "qwen3-moe-30b": DecoderConfig.qwen3_moe_30b,
    "llama3.1-8b": DecoderConfig.llama31_8b,
    "phi3-mini": DecoderConfig.phi3_mini,
    "gemma-2b": DecoderConfig.gemma_2b,
    "gemma2-2b": DecoderConfig.gemma2_2b,
    "gemma3-1b": DecoderConfig.gemma3_1b,
    "tiny-moe": DecoderConfig.tiny_moe,
    "tiny-mla": DecoderConfig.tiny_mla,
    "deepseek-v3-mini": DecoderConfig.deepseek_v3_mini,
    "deepseek-v3-mid-7b": DecoderConfig.deepseek_v3_mid_7b,
    "tiny-gpt2": GPT2Config.tiny,
    "gpt2": GPT2Config.gpt2_124m,
}


def build_decoder(cfg):
    """Config type → the matching decoder module (Llama- or GPT-2-family)."""
    if isinstance(cfg, GPT2Config):
        return GPT2Decoder(cfg)
    return Decoder(cfg)

_DTYPE_NAMES = {jnp.float32: "float32", jnp.bfloat16: "bfloat16", jnp.float16: "float16"}


def _config_to_json(cfg) -> dict:
    out = {"__class__": type(cfg).__name__}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if f.name in ("dtype", "param_dtype"):
            v = jnp.dtype(v).name
        out[f.name] = v
    return out


def _config_from_json(d: dict):
    d = dict(d)
    cls_name = d.pop("__class__")
    cls = {"EncoderConfig": EncoderConfig, "DecoderConfig": DecoderConfig, "GPT2Config": GPT2Config}[cls_name]
    field_names = {f.name for f in dataclasses.fields(cls)}
    d = {k: v for k, v in d.items() if k in field_names}  # drop extra metadata
    for k in ("dtype", "param_dtype"):
        if k in d:
            d[k] = jnp.dtype(d[k])
    # JSON round-trips the gemma3 per-layer sliding pattern and the
    # llama3 rope-scaling tuple as lists; restore the hashable tuples
    # the frozen configs were built with.
    if isinstance(d.get("sliding_layers"), list):
        d["sliding_layers"] = tuple(d["sliding_layers"])
    if isinstance(d.get("rope_llama3"), list):
        d["rope_llama3"] = tuple(d["rope_llama3"])
    return cls(**d)


def save_pretrained(output_dir: str, config, params: Any, extra: Optional[dict] = None) -> None:
    """Write ``config.json`` + ``params.msgpack`` (+ metadata)."""
    os.makedirs(output_dir, exist_ok=True)
    params = jax.tree.map(np.asarray, params)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump({**_config_to_json(config), **(extra or {})}, f, indent=2)
    with open(os.path.join(output_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def load_pretrained(path: str) -> Tuple[Any, Any]:
    """Read a :func:`save_pretrained` dir → (config, params)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = _config_from_json({k: v for k, v in json.load(f).items()})
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    return cfg, params


def _is_native_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "params.msgpack"))


def _is_hf_dir(path: str) -> bool:
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "pytorch_model.bin"))
        or os.path.exists(os.path.join(path, "model.safetensors"))
    )


def resolve_encoder(
    spec: str, dtype=None, vocab_size: Optional[int] = None
) -> Tuple[EncoderConfig, Optional[Any]]:
    """Model spec → (config, params-or-None). None = caller random-inits."""
    if spec in ENCODER_PRESETS:
        cfg = ENCODER_PRESETS[spec]()
        if vocab_size is not None:
            cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
        if dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        return cfg, None
    if _is_native_dir(spec):
        cfg, params = load_pretrained(spec)
        if dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        return cfg, params
    if _is_hf_dir(spec):
        from dalm_tpu.models.hf_loader import load_hf_encoder

        return load_hf_encoder(spec, dtype=dtype)
    raise ValueError(f"unknown encoder spec {spec!r}")


def resolve_decoder(
    spec: str, dtype=None, vocab_size: Optional[int] = None
) -> Tuple[DecoderConfig, Optional[Any]]:
    if spec in DECODER_PRESETS:
        cfg = DECODER_PRESETS[spec]()
        if vocab_size is not None:
            cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
        if dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        return cfg, None
    if _is_native_dir(spec):
        cfg, params = load_pretrained(spec)
        if dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        return cfg, params
    if _is_hf_dir(spec):
        import json as _json

        with open(os.path.join(spec, "config.json")) as f:
            model_type = _json.load(f).get("model_type", "")
        if model_type == "gpt2":
            from dalm_tpu.models.gpt2 import load_hf_gpt2

            return load_hf_gpt2(spec, dtype=dtype)
        from dalm_tpu.models.hf_loader import load_hf_decoder

        return load_hf_decoder(spec, dtype=dtype)
    raise ValueError(f"unknown decoder spec {spec!r}")
