"""Plain causal-LM next-token cross entropy (generator SFT objective)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def causal_lm_loss(logits: jax.Array, input_ids: jax.Array, attention_mask=None) -> jax.Array:
    """Mean NLL of ``input_ids[:, 1:]`` under ``logits[:, :-1]``."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = input_ids[:, 1:]
    nll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if attention_mask is None:
        return nll.mean()
    mask = attention_mask[:, 1:].astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
