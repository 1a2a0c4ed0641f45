"""In-batch-negative symmetric NT-Xent contrastive loss.

Semantics match the reference exactly
(`/root/reference/dalm/training/utils/train_utils.py:76-88`,
`train_rage2e.py:441-446`):

- logits: ``S = (Q @ P^T) * logit_scale`` on already-L2-normalized
  embeddings, default ``logit_scale = 100``.
- loss: ``(CE(S, arange(B)) + CE(S^T, arange(B))) / 2`` — positives on the
  diagonal, all other in-batch passages are negatives.

Parity note (SURVEY.md §2.4): the reference computes this on the *local*
batch of each DDP process — negatives never cross devices. Under pjit with
batch sharded over ``data``, a plain ``Q @ P.T`` IS the global-negative
variant. ``contrastive_loss(..., local_negatives=True)`` restores per-shard
semantics by blocking the similarity matrix inside shard_map; the trainers
default to parity (local) and expose global negatives as the opt-in
improvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cosine_sim_logits(query_embs: jax.Array, passage_embs: jax.Array, logit_scale: float = 100.0) -> jax.Array:
    """``S = Q @ P^T * logit_scale`` (embeddings pre-normalized).

    Reference: `train_utils.py:76-77` (get_cosine_sim). Full precision:
    the (B, B) similarity matrix is tiny, but its values are scaled by
    100 and fed to exp — low-precision accumulation visibly shifts the
    loss, so force fp32 accumulation even when embeddings are bf16.
    """
    return (
        jnp.matmul(
            query_embs,
            passage_embs.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        * logit_scale
    )


def nt_xent_loss(sim_scores: jax.Array) -> jax.Array:
    """Cross-entropy against the diagonal (`train_utils.py:80-88`)."""
    n = sim_scores.shape[0]
    labels = jnp.arange(n)
    return optax.softmax_cross_entropy_with_integer_labels(sim_scores, labels).mean()


def contrastive_loss(
    query_embs: jax.Array,
    passage_embs: jax.Array,
    logit_scale: float = 100.0,
    local_negatives_block: int | None = None,
    extra_negative_logits: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Symmetric NT-Xent over the batch; returns (loss, sim_logits).

    Reference: `train_rage2e.py:441-446` — mean of query→passage and
    passage→query cross-entropies.

    ``local_negatives_block``: parity mode (SURVEY.md §2.4). The
    reference's negative set is per-DDP-process; setting this to the
    per-device batch size masks all cross-block similarities to -inf, so
    each row's softmax runs over its own device-block only — exactly the
    reference's local in-batch negatives, without leaving the single
    pjit program. The masked logits are also what the marginalized loss
    must consume (its ``log_softmax(S, axis=1)`` then normalizes over
    local passages, as the reference's does).

    ``extra_negative_logits`` (B, K): hard-negative scores retrieved
    from the live index (already logit-scaled; stale embeddings, so the
    gradient flows only through the query side). They extend each row's
    query→passage softmax — and the returned (B, B+K) sim matrix, whose
    positives remain at column i, so the marginalized loss's passage
    normalizer includes them too (the reference's own TODO at
    `train_rage2e.py:461-462`). The passage→query direction stays square.
    """
    logits = cosine_sim_logits(query_embs, passage_embs, logit_scale)
    if local_negatives_block:
        n = logits.shape[0]
        blocks = jnp.arange(n) // local_negatives_block
        same_block = blocks[:, None] == blocks[None, :]
        logits = jnp.where(same_block, logits, jnp.finfo(jnp.float32).min)
    if extra_negative_logits is not None:
        aug = jnp.concatenate(
            [logits, extra_negative_logits.astype(logits.dtype)], axis=1
        )
    else:
        aug = logits
    loss = (nt_xent_loss(aug) + nt_xent_loss(logits.T)) / 2.0
    return loss, aug
