"""Joint retriever + generator model for RAG-e2e training.

Twin of ``AutoModelForRagE2E``
(`/root/reference/dalm/models/rag_e2e_base_model.py:22-106`): one object
holding both sub-models with a task-switched forward
("retrieval"/"generation", `:101-106`) and a ``Mode`` enum gating which
sub-model gets LoRA/quantization (`:16-19,61-80`).

Functional JAX shape: the parameter pytree is ``{"retriever": ...,
"generator": ...}`` — the same split the reference uses for its
checkpoint hooks (`train_utils.py:16-31`) — and the apply fns are pure, so
one ``jax.value_and_grad`` over the combined loss differentiates through
both sub-models (and through retrieval scores into the generator loss).
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from dalm_tpu.models.decoder import DecoderConfig
from dalm_tpu.models.encoder import Encoder, EncoderConfig
from dalm_tpu.models.pooling import eos_pool, mean_pool_l2


class Mode(str, enum.Enum):
    """Which sub-models receive PEFT/quantization (`rag_e2e_base_model.py:16-19`)."""

    RETRIEVER = "retriever"
    GENERATOR = "generator"
    BOTH = "both"


@dataclasses.dataclass
class RagE2EModel:
    retriever_config: EncoderConfig
    generator_config: DecoderConfig
    retriever_is_autoregressive: bool = False
    normalize: bool = True

    def __post_init__(self):
        if self.retriever_is_autoregressive:
            # Autoregressive retriever = a decoder backbone, EOS-pooled
            # (`retriever_only_base_model.py:49-55`). The config passed as
            # retriever_config must then be a DecoderConfig.
            from dalm_tpu.models.registry import build_decoder

            self.retriever = build_decoder(self.retriever_config)  # type: ignore[arg-type]
        else:
            self.retriever = Encoder(self.retriever_config)
        from dalm_tpu.models.registry import build_decoder

        self.generator = build_decoder(self.generator_config)

    # ---- init ----------------------------------------------------------
    def init_params(self, rng: jax.Array, query_len: int = 8, gen_len: int = 8) -> dict:
        r_rng, g_rng = jax.random.split(rng)
        ids = jnp.zeros((1, query_len), jnp.int32)
        mask = jnp.ones((1, query_len), jnp.int32)
        if self.retriever_is_autoregressive:
            r_params = self.retriever.init(r_rng, ids, mask, return_hidden=True)["params"]
        else:
            r_params = self.retriever.init(r_rng, ids, mask)["params"]
        g_ids = jnp.zeros((1, gen_len), jnp.int32)
        g_mask = jnp.ones((1, gen_len), jnp.int32)
        g_params = self.generator.init(g_rng, g_ids, g_mask)["params"]
        return {"retriever": r_params, "generator": g_params}

    # ---- task-switched forward (`rag_e2e_base_model.py:101-106`) --------
    def embed(self, params: dict, input_ids, attention_mask, deterministic: bool = True):
        """"retrieval" task → pooled L2-normalized embeddings."""
        if self.retriever_is_autoregressive:
            hidden = self.retriever.apply(
                {"params": params["retriever"]}, input_ids, attention_mask, return_hidden=True
            )
            return eos_pool(hidden, attention_mask, normalize=self.normalize)
        hidden = self.retriever.apply(
            {"params": params["retriever"]}, input_ids, attention_mask,
            deterministic=deterministic,
        )
        return mean_pool_l2(hidden, attention_mask, normalize=self.normalize)

    def generate_logits(self, params: dict, input_ids, attention_mask):
        """"generation" task → causal LM logits."""
        return self.generator.apply({"params": params["generator"]}, input_ids, attention_mask)

    def forward(self, params: dict, task: str, input_ids, attention_mask):
        if task == "retrieval":
            return self.embed(params, input_ids, attention_mask)
        if task == "generation":
            return self.generate_logits(params, input_ids, attention_mask)
        raise ValueError(f"unknown task {task!r}")

    # ---- fused-QLoRA variants (models/qlora.py collections) -------------
    def embed_with(self, variables: dict, input_ids, attention_mask, mutable=False):
        """Like :meth:`embed` but with full variable collections for the
        retriever (``{"params": residual, "quant": ..., "lora": ...}``).

        ``mutable=["intermediates"]`` additionally returns the sowed
        calibration stats (layers.py FlexLinear ``a_amax``) as
        ``(embeddings, updated_vars)``."""
        if self.retriever_is_autoregressive:
            out = self.retriever.apply(
                variables, input_ids, attention_mask, return_hidden=True, mutable=mutable
            )
            if mutable:
                return eos_pool(out[0], attention_mask, normalize=self.normalize), out[1]
            return eos_pool(out, attention_mask, normalize=self.normalize)
        out = self.retriever.apply(
            variables, input_ids, attention_mask, deterministic=True, mutable=mutable
        )
        if mutable:
            return mean_pool_l2(out[0], attention_mask, normalize=self.normalize), out[1]
        return mean_pool_l2(out, attention_mask, normalize=self.normalize)

    def logits_with(self, variables: dict, input_ids, attention_mask, mutable=False):
        return self.generator.apply(variables, input_ids, attention_mask, mutable=mutable)
