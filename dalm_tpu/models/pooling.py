"""Sentence-embedding pooling heads.

Exact reference math (SURVEY.md §2.2.1):

- mean pooling + L2 norm
  (`/root/reference/dalm/models/retriever_only_base_model.py:60-68`):
  ``emb = L2norm( sum_t h_t * mask_t / max(sum_t mask_t, 1e-9) )``
  with torch's ``F.normalize`` eps of 1e-12.
- autoregressive (EOS) pooling (`:49-55`, `dalm/utils.py:22-35`): take the
  final hidden state at the EOS position — left padding puts it at the
  last column; right padding at index ``sum(mask) - 1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_pool_l2(hidden: jax.Array, attention_mask: jax.Array, normalize: bool = True) -> jax.Array:
    """Masked mean over tokens, then L2 normalize. hidden: (B, L, H)."""
    mask = attention_mask[:, :, None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), min=1e-9)
    emb = summed / counts
    if normalize:
        emb = l2_normalize(emb)
    return emb


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize(p=2, dim=1) twin: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def eos_mask(attention_mask: jax.Array, padding: str = "left") -> jax.Array:
    """Mask selecting only each sequence's final (EOS) token.

    Twin of `dalm/utils.py:22-35`: left padding → last column; right
    padding → position ``sum(mask) - 1``.
    """
    new_mask = jnp.zeros_like(attention_mask)
    if padding == "right":
        ones_counts = attention_mask.sum(axis=1)
        cols = jnp.arange(attention_mask.shape[1])[None, :]
        return (cols == (ones_counts[:, None] - 1)).astype(attention_mask.dtype)
    return new_mask.at[:, -1].set(1)


def eos_pool(
    hidden: jax.Array,
    attention_mask: jax.Array,
    padding: str = "left",
    normalize: bool = True,
) -> jax.Array:
    """Autoregressive-retriever pooling: hidden state at EOS, L2-normalized.

    The reference routes this through the same mean-pooling with a one-hot
    mask (`retriever_only_base_model.py:55,60`); we do the same so the
    1e-9 clamp semantics are identical.
    """
    return mean_pool_l2(hidden, eos_mask(attention_mask, padding), normalize=normalize)
