"""Sentence embedder — twin of ``AutoModelForSentenceEmbedding``
(`/root/reference/dalm/models/retriever_only_base_model.py:10-68`).

Wraps an Encoder (bge/BERT-class) or, in autoregressive mode, a Decoder
whose final hidden state at the EOS position is the embedding (`:49-55`).
Pure-functional: ``embed(params, ids, mask)`` returns pooled,
L2-normalized embeddings and is differentiable / jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Union

import jax

from dalm_tpu.models.decoder import DecoderConfig
from dalm_tpu.models.encoder import Encoder, EncoderConfig
from dalm_tpu.models.pooling import eos_pool, mean_pool_l2


@dataclasses.dataclass
class SentenceEmbedder:
    config: Union[EncoderConfig, DecoderConfig]
    is_autoregressive: bool = False
    normalize: bool = True

    def __post_init__(self):
        if self.is_autoregressive:
            from dalm_tpu.models.registry import build_decoder

            self.module = build_decoder(self.config)
        else:
            self.module = Encoder(self.config)

    @property
    def embedding_dim(self) -> int:
        return self.config.hidden_size

    def init_params(self, rng: jax.Array, seq_len: int = 8) -> Any:
        import jax.numpy as jnp

        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        if self.is_autoregressive:
            return self.module.init(rng, ids, mask, return_hidden=True)["params"]
        return self.module.init(rng, ids, mask)["params"]

    def embed(
        self,
        params: Any,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        deterministic = dropout_rng is None
        rngs = None if deterministic else {"dropout": dropout_rng}
        if self.is_autoregressive:
            hidden = self.module.apply(
                {"params": params}, input_ids, attention_mask, return_hidden=True
            )
            return eos_pool(hidden, attention_mask, normalize=self.normalize)
        hidden = self.module.apply(
            {"params": params}, input_ids, attention_mask,
            deterministic=deterministic, rngs=rngs,
        )
        return mean_pool_l2(hidden, attention_mask, normalize=self.normalize)
