"""True top-k RAG marginalization — the full objective the reference
deferred (`train_rage2e.py:461-462` TODO: its marginalization collapses
to the matched passage's score).

Two marginalization granularities (Lewis et al. 2020 terminology):

**RAG-sequence** (`topk_marginal_loss`) — one posterior per sequence::

    p(y | q) = Σ_j softmax_j(s(q, z_j)) · p(y | q, z_j)
    loss     = - Σ_i log p(y_i | q_i) / Σ_i |y_i|

**RAG-token** (`topk_marginal_token_loss`) — one posterior per answer
token::

    loss = - Σ_i Σ_t log Σ_j softmax_j(s_ij) · p(y_it | y_i<t, q_i, z_j)
           / Σ_i |y_i|

The choice matters for the RETRIEVER far more than for the generator:
per answer token the score gradient is ``(posterior − softmax(s))``, so
RAG-token accumulates |y| such pushes per sample while RAG-sequence gets
exactly one (then divides by Σ|y| anyway) — its retrieval signal is
~|y|× weaker and is easily drowned by the co-trained contrastive loss
(measured: no label-noise recovery in experiments/quality_directional.py
under RAG-sequence, decisive recovery under RAG-token). RAG-token is
also structurally what the reference's diagonal shortcut does
(`train_utils.py:96-110` adds the doc log-score to every answer token's
log-prob). Prefer RAG-token for retrieval adaptation; RAG-sequence for
sequence-level answer consistency with a frozen-ish retriever.

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
    ll_tok, is_answer = answer_token_loglik(logits, ids, mask, boundary, marker_len)
    ll = (ll_tok * is_answer).sum(axis=2)  # (B, K)
    n = is_answer[:, 0, :].sum(axis=1)  # same count for every candidate
    return ll, n


def answer_token_loglik(
    logits: jax.Array, ids: jax.Array, mask: jax.Array, boundary: jax.Array,
    marker_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-(candidate, position) answer log-likelihoods.

    Same arguments as :func:`answer_loglik`. Returns
    ``(ll_tok (B, K, L-1), is_answer (B, K, L-1) bool)`` — label position
    ``t`` predicts token ``t+1``; answer-text labels start after the
    ``#answer#`` marker.
    """
    lp = logits[:, :, :-1, :].astype(jnp.float32)
    labels = ids[:, :, 1:]
    label_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    lse = jax.scipy.special.logsumexp(lp, axis=-1)
    ll_tok = label_lp - lse  # (B, K, L-1)

    pos_next = jnp.arange(1, ids.shape[2])[None, None, :]
    is_answer = (pos_next >= (boundary + marker_len)[:, :, None]) & (
        mask[:, :, 1:] > 0
    )
    return ll_tok, is_answer


def topk_marginal_loss(
    candidate_scores: jax.Array,  # (B, K) fresh similarity logits
    answer_ll: jax.Array,  # (B, K)
    n_answer_tokens: jax.Array,  # (B,)
) -> jax.Array:
    """RAG-sequence: ``-Σ_i logsumexp_j(log softmax_j(s_ij) + ll_ij) / Σ_i |y_i|``."""
    d = jax.nn.log_softmax(candidate_scores.astype(jnp.float32), axis=1)
    marg = jax.scipy.special.logsumexp(d + answer_ll, axis=1)  # (B,)
    total = jnp.maximum(n_answer_tokens.sum(), 1)
    return -(marg.sum()) / total


def aligned_answer_token_loglik(
    logits: jax.Array, ids: jax.Array, mask: jax.Array, boundary: jax.Array,
    marker_len: int, max_answer_tokens: int,
) -> jax.Array:
    """Answer log-likelihoods gathered BY ANSWER-TOKEN ORDINAL.

    Candidates place the (shared) answer at different sequence positions
    (passage lengths differ), so RAG-token marginalization must compare
    candidates at the same answer-token index, not the same sequence
    position. Returns ``ll (B, K, A)`` with ``A = max_answer_tokens``;
    ordinal ``a`` of candidate ``j`` lives at label position
    ``boundary_ij + marker_len - 1 + a`` (never truncated —
    `assemble_generator_inputs` sizes L = Lq+Lp+La). Entries past a
    sample's real answer length are garbage; mask them with
    ``answer_token_mask``.
    """
    ll_tok, _ = answer_token_loglik(logits, ids, mask, boundary, marker_len)
    Lm1 = ll_tok.shape[2]
    a = jnp.arange(max_answer_tokens)[None, None, :]
    idx = jnp.clip(boundary[:, :, None] + marker_len - 1 + a, 0, Lm1 - 1)
    return jnp.take_along_axis(ll_tok, idx, axis=2)  # (B, K, A)


def answer_token_mask(
    a_len: jax.Array, marker_len: int, max_answer_tokens: int
) -> jax.Array:
    """(B, A) bool: ordinal ``a`` is a real answer-text token (the
    ``#answer#`` marker at the segment head is excluded)."""
    a = jnp.arange(max_answer_tokens)[None, :]
    return a < (a_len - marker_len)[:, None]


def topk_marginal_token_loss(
    candidate_scores: jax.Array,  # (B, K) fresh similarity logits
    ll_tok: jax.Array,  # (B, K, A) aligned per-ordinal answer log-liks
    valid: jax.Array,  # (B, A) bool answer-token mask
) -> jax.Array:
    """RAG-token: ``-Σ_i Σ_t logsumexp_j(log softmax_j(s_ij) + ll_ijt) / Σ|y|``.

    Per answer token the score gradient is ``posterior_t − softmax(s)``,
    so the retrieval signal scales with answer length — the property
    that lets generator feedback override noisy contrastive labels (see
    module docstring).
    """
    d = jax.nn.log_softmax(candidate_scores.astype(jnp.float32), axis=1)
    marg_t = jax.scipy.special.logsumexp(d[:, :, None] + ll_tok, axis=1)  # (B, A)
    v = valid.astype(jnp.float32)
    return -(marg_t * v).sum() / jnp.maximum(v.sum(), 1.0)
