"""Marginalized causal next-token loss — the differentiable-retrieval core.

Reference semantics (`/root/reference/dalm/training/utils/train_utils.py:96-138`),
reproduced exactly but vectorized (the reference loops over samples in
Python, `:127-132` — a CPU hot spot that cannot be jitted):

Given generator logits over ``#query# q #passage# p #answer# a``:

1. ``logp = log_softmax(logits[:, :-1, :])``                     (:121)
2. ``doc_logprobs = diag(log_softmax(S, axis=1))`` — only the positive
   (diagonal) passage score; marginalization collapses to the matched
   passage (known reference TODO at `train_rage2e.py:461-462`)   (:124)
3. per sample ``i`` with un-padded prefix length ``L_i =
   query_passage_input_len[i]`` (length of ``#query# q #passage# p
   #answer#``, `rag_e2e_dataloader_utils.py:47-52`): next-token positions
   ``t < L_i - 1`` keep plain ``logp``; positions ``t >= L_i - 1`` get
   ``logp + doc_logprobs[i]``                                     (:100-108)
4. NLL of labels ``input[:, 1:]``, masked by ``attention_mask[:, 1:]``,
   mean over unmasked positions                                   (:134-137)

The vectorization: step 3's boundary becomes a static-shape mask
``position >= L_i - 1`` broadcast over the vocab — identical math, one
fused XLA kernel, fully differentiable w.r.t. both the generator logits
and (through ``scores``) the retriever embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def marginalized_nll_loss(
    logits: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    scores: jax.Array,
    query_passage_input_len: jax.Array,
) -> jax.Array:
    """Vectorized twin of `compute_marginalized_loss_from_logits` (:113-138).

    Args:
      logits: (B, L, V) generator logits, any float dtype (upcast to f32).
      input_ids: (B, L) generator input token ids.
      attention_mask: (B, L) 1 for real tokens.
      scores: (B, B) similarity logits (queries × passages).
      query_passage_input_len: (B,) un-padded length of the
        ``... #answer#`` prefix.

    Returns scalar mean NLL over unmasked next-token positions.
    """
    logits = logits[:, :-1, :].astype(jnp.float32)
    scores = scores.astype(jnp.float32)

    # Gather/logsumexp formulation — identical math to
    # ``log_softmax + take_along_axis`` but never materializes the
    # (B, L, V) log-probability tensor in HBM:
    #   ll_t = logits_t[label_t] - logsumexp(logits_t) + answer_mask_t * doc_lp
    labels = input_ids[:, 1:]
    label_logits = jnp.take_along_axis(logits, labels[:, :, None], axis=-1)[:, :, 0]
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B, L-1)

    doc_logprobs = jnp.diagonal(jax.nn.log_softmax(scores, axis=1))  # (B,)
    seq = logits.shape[1]
    positions = jnp.arange(seq)[None, :]
    answer_region = positions >= (query_passage_input_len[:, None] - 1)  # (B, L-1)

    ll = label_logits - lse + jnp.where(answer_region, doc_logprobs[:, None], 0.0)

    mask = attention_mask[:, 1:].astype(jnp.float32)
    return -(ll * mask).sum() / mask.sum()


def rag_e2e_loss(
    query_embs: jax.Array,
    passage_embs: jax.Array,
    generator_logits: jax.Array,
    generator_input_ids: jax.Array,
    generator_attention_mask: jax.Array,
    query_passage_input_len: jax.Array,
    logit_scale: float = 100.0,
) -> tuple[jax.Array, dict]:
    """Combined objective: ``contrastive + marginalized`` (`train_rage2e.py:467`)."""
    from dalm_tpu.losses.contrastive import contrastive_loss

    retriever_loss, sim_logits = contrastive_loss(query_embs, passage_embs, logit_scale)
    generator_loss = marginalized_nll_loss(
        generator_logits,
        generator_input_ids,
        generator_attention_mask,
        sim_logits,
        query_passage_input_len,
    )
    total = retriever_loss + generator_loss
    return total, {
        "loss": total,
        "retriever_contrastive_loss": retriever_loss,
        "generator_marginalized_loss": generator_loss,
    }
