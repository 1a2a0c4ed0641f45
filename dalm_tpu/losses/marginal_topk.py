"""True top-k RAG marginalization — the full objective the reference
deferred (`train_rage2e.py:461-462` TODO: its marginalization collapses
to the matched passage's score).

RAG-sequence likelihood over the retrieved candidate set::

    p(y | q) = Σ_j softmax_j(s(q, z_j)) · p(y | q, z_j)
    loss     = - Σ_i log p(y_i | q_i) / Σ_i |y_i|

The generator runs once per (sample, candidate) — k× decoder cost —
over inputs assembled ON DEVICE from tokenized segments, so retrieved
passages substitute into the prompt without any host round trip:

    [ #query# {q} ][ #passage# {z_j} ][ #answer# {y} ]

Gradients flow into the retriever through the fresh candidate scores
``s`` (both query and passage towers) and into the generator through
every candidate's answer likelihood.

Segment tokenization note: concatenating per-segment token ids equals
tokenizing the joined string exactly for the byte tokenizer; subword
tokenizers may differ at segment boundaries (documented approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_generator_inputs(
    q_ids: jax.Array, q_len: jax.Array,
    p_ids: jax.Array, p_len: jax.Array,
    a_ids: jax.Array, a_len: jax.Array,
    pad_id: int = 0,
):
    """Concatenate variable-length segments into static-shape inputs.

    Args:
      q_ids (B, Lq), q_len (B,): query segment (right-padded).
      p_ids (B, K, Lp), p_len (B, K): one passage segment per candidate.
      a_ids (B, La), a_len (B,): answer segment (``#answer#`` marker
        included at its head).
    Returns (ids (B, K, L), attention_mask (B, K, L), boundary (B, K))
    with ``L = Lq + Lp + La`` (never truncates) and ``boundary`` = the
    global index where the answer segment starts (q_len + p_len).
    """
    B, Lq = q_ids.shape
    K, Lp = p_ids.shape[1], p_ids.shape[2]
    La = a_ids.shape[1]
    L = Lq + Lp + La

    t = jnp.arange(L)[None, None, :]  # (1, 1, L)
    ql = q_len[:, None, None]  # (B, 1, 1)
    pl = p_len[:, :, None]  # (B, K, 1)
    al = a_len[:, None, None]

    in_q = t < ql
    in_p = (~in_q) & (t < ql + pl)
    in_a = (~in_q) & (~in_p) & (t < ql + pl + al)

    idx_q = jnp.clip(t, 0, Lq - 1)
    idx_p = jnp.clip(t - ql, 0, Lp - 1)
    idx_a = jnp.clip(t - ql - pl, 0, La - 1)

    qg = jnp.take_along_axis(q_ids[:, None, :], idx_q, axis=2)  # broadcast over K
    qg = jnp.broadcast_to(qg, (B, K, L))
    pg = jnp.take_along_axis(p_ids, jnp.broadcast_to(idx_p, (B, K, L)), axis=2)
    ag = jnp.take_along_axis(a_ids[:, None, :], idx_a, axis=2)
    ag = jnp.broadcast_to(ag, (B, K, L))

    ids = jnp.where(in_q, qg, jnp.where(in_p, pg, jnp.where(in_a, ag, pad_id)))
    mask = (in_q | in_p | in_a).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, (B, K, L))
    boundary = q_len[:, None] + p_len  # (B, K): answer segment start
    return ids.astype(jnp.int32), mask, boundary


def answer_loglik(
    logits: jax.Array, ids: jax.Array, mask: jax.Array, boundary: jax.Array,
    marker_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-candidate log-likelihood of the answer TEXT tokens.

    Args:
      logits (B, K, L, V); ids/mask (B, K, L); boundary (B, K) = answer
      segment start; marker_len = tokens of the ``#answer#`` marker at
      the segment head (scored region starts after it).
    Returns (ll (B, K), n_answer_labels (B,) — identical across K).
    """
    lp = logits[:, :, :-1, :].astype(jnp.float32)
    labels = ids[:, :, 1:]
    label_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    lse = jax.scipy.special.logsumexp(lp, axis=-1)
    ll_tok = label_lp - lse  # (B, K, L-1)

    # label position t predicts token t+1; answer-text tokens start at
    # boundary + marker_len.
    pos_next = jnp.arange(1, ids.shape[2])[None, None, :]
    is_answer = (pos_next >= (boundary + marker_len)[:, :, None]) & (
        mask[:, :, 1:] > 0
    )
    ll = (ll_tok * is_answer).sum(axis=2)  # (B, K)
    n = is_answer[:, 0, :].sum(axis=1)  # same count for every candidate
    return ll, n


def topk_marginal_loss(
    candidate_scores: jax.Array,  # (B, K) fresh similarity logits
    answer_ll: jax.Array,  # (B, K)
    n_answer_tokens: jax.Array,  # (B,)
) -> jax.Array:
    """``-Σ_i logsumexp_j(log softmax_j(s_ij) + ll_ij) / Σ_i |y_i|``."""
    d = jax.nn.log_softmax(candidate_scores.astype(jnp.float32), axis=1)
    marg = jax.scipy.special.logsumexp(d + answer_ll, axis=1)  # (B,)
    total = jnp.maximum(n_answer_tokens.sum(), 1)
    return -(marg.sum()) / total
