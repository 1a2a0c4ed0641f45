"""GPT-2-family decoder (second generator family).

BASELINE.json config 3 pairs the bge-small retriever with a
"GPT-2-125M-class" generator; this module makes real HF GPT-2
checkpoints loadable: learned absolute positions, pre-LN blocks with
biases, GELU(tanh) MLP, tied LM head, and HF's Conv1D weight layout
(already (in, out) — NOT transposed like nn.Linear).

Same interface as `dalm_tpu.models.decoder.Decoder`: full-sequence
teacher forcing and single-step decode against a preallocated KV cache,
so trainers/eval/generation treat both families interchangeably.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(vocab_size: int = 512) -> "GPT2Config":
        return GPT2Config(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=2,
            intermediate_size=128, max_position_embeddings=128,
        )

    @staticmethod
    def gpt2_124m() -> "GPT2Config":
        return GPT2Config()


def _dense(features, name, cfg):
    return nn.Dense(
        features, name=name, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        kernel_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("embed", "mlp")),
    )


class GPT2Attention(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, hidden, mask, kv_cache=None, cache_index=None):
        cfg = self.cfg
        B, S, _ = hidden.shape
        nh, hd = cfg.num_heads, cfg.head_dim

        qkv = _dense(3 * cfg.hidden_size, "c_attn", cfg)(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, nh, hd)
        k = k.reshape(B, S, nh, hd)
        v = v.reshape(B, S, nh, hd)

        new_cache = None
        if kv_cache is not None:
            if getattr(cache_index, "ndim", 0) == 1:
                # Per-row write positions (continuous batching / speculative
                # verification) — gather-select, mirrors models/decoder.py
                # (a vmapped dynamic_update_slice lowers ~1000x slower).
                L_cache = kv_cache["k"].shape[1]
                if S == 1:
                    # Single-token step: one-hot select instead of the
                    # gather (see models/decoder.py — the gather with
                    # statically-zero indices still lowers as a dynamic
                    # gather and measured 2x the fused-schedule step).
                    oh = (
                        jnp.arange(L_cache)[None, :] == cache_index[:, None]
                    )[:, :, None, None]
                    k = jnp.where(oh, k.astype(kv_cache["k"].dtype), kv_cache["k"])
                    v = jnp.where(oh, v.astype(kv_cache["v"].dtype), kv_cache["v"])
                else:
                    # one-hot MXU contraction, mirrors models/decoder.py
                    # (take_along_axis lowers as a slow dynamic gather)
                    g = jnp.arange(L_cache)[None, :] - cache_index[:, None]
                    inside = (g >= 0) & (g < S)
                    oh = (g[:, :, None] == jnp.arange(S)[None, None, :]).astype(
                        kv_cache["k"].dtype
                    )
                    sel = inside[:, :, None, None]
                    k_rows = jnp.einsum(
                        "bls,bshd->blhd", oh, k.astype(kv_cache["k"].dtype)
                    )
                    v_rows = jnp.einsum(
                        "bls,bshd->blhd", oh, v.astype(kv_cache["v"].dtype)
                    )
                    k = jnp.where(sel, k_rows, kv_cache["k"])
                    v = jnp.where(sel, v_rows, kv_cache["v"])
            else:
                k = jax.lax.dynamic_update_slice(kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, cache_index, 0, 0))
                v = jax.lax.dynamic_update_slice(kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, cache_index, 0, 0))
            new_cache = {"k": k, "v": v}

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(cfg.dtype)
        scores = jnp.where(mask, scores.astype(jnp.float32), jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, nh * hd)
        return _dense(cfg.hidden_size, "c_proj", cfg)(ctx), new_cache


class GPT2Block(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, hidden, mask, kv_cache=None, cache_index=None):
        cfg = self.cfg
        normed = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype, name="ln_1")(hidden)
        attn_out, new_cache = GPT2Attention(cfg, name="attn")(normed, mask, kv_cache, cache_index)
        hidden = hidden + attn_out
        normed = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype, name="ln_2")(hidden)
        mlp = _dense(cfg.intermediate_size, "c_fc", cfg)(normed)
        mlp = nn.gelu(mlp, approximate=True)  # GPT-2 uses gelu_new (tanh)
        mlp = _dense(cfg.hidden_size, "mlp_proj", cfg)(mlp)
        return hidden + mlp, new_cache


class GPT2Decoder(nn.Module):
    cfg: GPT2Config

    def init_kv_cache(self, batch_size: int, max_len: int, dtype=None) -> dict:
        cfg = self.cfg
        shape = (batch_size, max_len, cfg.num_heads, cfg.head_dim)
        dtype = dtype or cfg.dtype
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
        logits_last_only: bool = False,
    ):
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            if kv_cache is not None:
                base = jnp.asarray(cache_index, jnp.int32).reshape(-1, 1)  # scalar or (B,)
                positions = jnp.broadcast_to(base, (B, 1)) + jnp.arange(S)[None, :]
            elif attention_mask is not None:
                positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, min=0)
            else:
                positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))

        wte = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="wte",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("vocab", "embed")),
        )
        hidden = wte(input_ids)
        hidden = hidden + nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="wpe",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(nn.initializers.normal(0.02), ("seq", "embed")),
        )(positions)

        if neftune_alpha > 0.0 and noise_rng is not None:
            scale = neftune_alpha / jnp.sqrt(jnp.asarray(S * cfg.hidden_size, jnp.float32))
            noise = jax.random.uniform(noise_rng, hidden.shape, jnp.float32, -1.0, 1.0)
            hidden = hidden + (noise * scale).astype(hidden.dtype)

        if kv_cache is not None:
            key_len = kv_cache["layer_0"]["k"].shape[1]
            key_slot = jnp.arange(key_len)[None, None, None, :]
            base = jnp.asarray(cache_index, jnp.int32).reshape(-1, 1)  # scalar or (B,)
            q_slot = (base + jnp.arange(S)[None, :])[:, None, :, None]
            mask = key_slot <= q_slot
            if attention_mask is not None:
                mask = mask & (attention_mask[:, None, None, :] > 0)
        else:
            q_pos = positions[:, None, :, None]
            k_pos = positions[:, None, None, :]
            mask = k_pos <= q_pos
            if attention_mask is not None:
                mask = mask & (attention_mask[:, None, None, :] > 0)

        new_cache = {} if kv_cache is not None else None
        for i in range(cfg.num_layers):
            layer_cache = kv_cache[f"layer_{i}"] if kv_cache is not None else None
            hidden, layer_new = GPT2Block(cfg, name=f"layer_{i}")(hidden, mask, layer_cache, cache_index)
            if new_cache is not None:
                new_cache[f"layer_{i}"] = layer_new

        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln_f"
        )(hidden)
        if return_hidden:
            return hidden
        if logits_last_only:
            # prefill only needs the final position's distribution; see
            # decoder.Decoder.__call__ — kills the (B, P, V) intermediate
            hidden = hidden[:, -1:, :]

        # GPT-2 ties the LM head to wte.
        embed = self.variables["params"]["wte"]["embedding"]
        from flax.core import meta

        if isinstance(embed, meta.Partitioned):
            embed = embed.value
        logits = hidden @ embed.astype(cfg.dtype).T
        if kv_cache is not None:
            return logits, new_cache
        return logits


def load_hf_gpt2(path: str, dtype=None) -> Tuple[GPT2Config, Any]:
    """HF GPT-2 checkpoint → (GPT2Config, params).

    HF GPT-2 uses Conv1D: weights already (in, out) — no transpose.
    """
    from dalm_tpu.models.hf_loader import _load_torch_state

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = GPT2Config(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["n_embd"],
        num_layers=hf["n_layer"],
        num_heads=hf["n_head"],
        intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
        max_position_embeddings=hf["n_positions"],
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
    )
    if dtype is not None:
        cfg = dataclasses.replace(cfg, dtype=dtype)
    state = _load_torch_state(path)
    if any(k.startswith("transformer.") for k in state):
        state = {k[len("transformer."):]: v for k, v in state.items() if k.startswith("transformer.")}

    def conv1d(name):  # (in, out) as-is
        return state[name].astype(np.float32)

    def arr(name):
        return state[name].astype(np.float32)

    params: Dict[str, Any] = {
        "wte": {"embedding": arr("wte.weight")},
        "wpe": {"embedding": arr("wpe.weight")},
        "ln_f": {"scale": arr("ln_f.weight"), "bias": arr("ln_f.bias")},
    }
    for i in range(cfg.num_layers):
        h = f"h.{i}"
        params[f"layer_{i}"] = {
            "ln_1": {"scale": arr(f"{h}.ln_1.weight"), "bias": arr(f"{h}.ln_1.bias")},
            "ln_2": {"scale": arr(f"{h}.ln_2.weight"), "bias": arr(f"{h}.ln_2.bias")},
            "attn": {
                "c_attn": {"kernel": conv1d(f"{h}.attn.c_attn.weight"), "bias": arr(f"{h}.attn.c_attn.bias")},
                "c_proj": {"kernel": conv1d(f"{h}.attn.c_proj.weight"), "bias": arr(f"{h}.attn.c_proj.bias")},
            },
            "c_fc": {"kernel": conv1d(f"{h}.mlp.c_fc.weight"), "bias": arr(f"{h}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": conv1d(f"{h}.mlp.c_proj.weight"), "bias": arr(f"{h}.mlp.c_proj.bias")},
        }
    return cfg, params
