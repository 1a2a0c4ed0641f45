"""BERT-class bidirectional encoder (bge-style retriever backbone).

TPU-native twin of the reference retriever (`BAAI/bge-large-en` loaded via
``AutoModel``, `/root/reference/dalm/models/retriever_only_base_model.py:23-27`).
Architecture follows BERT exactly (word+position+type embeddings, post-LN
transformer, GELU MLP) so HF bge/BERT checkpoints port weight-for-weight
(see `dalm_tpu/models/hf_loader.py`), but the implementation is Flax linen
with logical sharding axes: ``heads``/``mlp`` split over the mesh ``model``
axis for tensor parallelism, batch over ``data``.

All shapes static; attention uses a single fused einsum path that XLA maps
onto the MXU (sequence lengths here are ≤ a few hundred — flash/blockwise
attention is unnecessary; the kernel slot is pluggable via
``attention_fn``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    intermediate_size: int = 1024
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # int8 MXU compute for packed frozen kernels ("none"|"fwd"|"all") —
    # see kernels/int8_matmul.py; no effect without int8 quant storage.
    int8_compute: str = "none"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(vocab_size: int = 512) -> "EncoderConfig":
        """CPU-testable config (bge-small-class shape at 1/8 scale)."""
        return EncoderConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=2,
            intermediate_size=128,
            max_position_embeddings=128,
        )

    @staticmethod
    def bge_small() -> "EncoderConfig":
        return EncoderConfig(
            vocab_size=30522, hidden_size=384, num_layers=12, num_heads=12,
            intermediate_size=1536, max_position_embeddings=512,
        )

    @staticmethod
    def bge_large() -> "EncoderConfig":
        return EncoderConfig(
            vocab_size=30522, hidden_size=1024, num_layers=24, num_heads=16,
            intermediate_size=4096, max_position_embeddings=512,
        )


def _dense(features, name, cfg, kernel_axes, bias_axes):
    from dalm_tpu.models.layers import FlexLinear

    return FlexLinear(
        features,
        name=name,
        use_bias=True,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
        kernel_axes=kernel_axes,
        bias_axes=bias_axes,
        int8_compute=cfg.int8_compute,
    )


class EncoderSelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool = True):
        cfg = self.cfg
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

        q = _dense(h, "query", cfg, ("embed", "heads"), ("heads",))(hidden)
        k = _dense(h, "key", cfg, ("embed", "heads"), ("heads",))(hidden)
        v = _dense(h, "value", cfg, ("embed", "heads"), ("heads",))(hidden)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], nh, hd)

        q, k, v = split(q), split(k), split(v)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(cfg.dtype)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32) + bias, axis=-1).astype(cfg.dtype)
        if cfg.attention_dropout > 0:
            probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)

        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(hidden.shape)
        return _dense(h, "output", cfg, ("heads", "embed"), ("embed",))(ctx)


class EncoderLayer(nn.Module):
    """Post-LN transformer block (BERT layout)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool = True):
        cfg = self.cfg
        attn_out = EncoderSelfAttention(cfg, name="attention")(hidden, attention_mask, deterministic)
        if cfg.hidden_dropout > 0:
            attn_out = nn.Dropout(cfg.hidden_dropout)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="attention_norm",
        )(hidden + attn_out)

        mlp = _dense(cfg.intermediate_size, "intermediate", cfg, ("embed", "mlp"), ("mlp",))(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = _dense(cfg.hidden_size, "mlp_output", cfg, ("mlp", "embed"), ("embed",))(mlp)
        if cfg.hidden_dropout > 0:
            mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="mlp_norm",
        )(hidden + mlp)


class Encoder(nn.Module):
    """Returns final hidden states (B, L, H); pool with models/pooling.py."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        embed_init = nn.with_logical_partitioning(
            nn.initializers.normal(stddev=0.02), ("vocab", "embed")
        )
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, embedding_init=embed_init,
        )(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), ("seq", "embed")
            ),
        )(pos_ids)
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings",
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "embed")
            ),
        )(token_type_ids)

        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="embeddings_norm",
        )(word + pos + typ)
        if cfg.hidden_dropout > 0:
            hidden = nn.Dropout(cfg.hidden_dropout)(hidden, deterministic=deterministic)

        for i in range(cfg.num_layers):
            hidden = EncoderLayer(cfg, name=f"layer_{i}")(hidden, attention_mask, deterministic)
        return hidden
