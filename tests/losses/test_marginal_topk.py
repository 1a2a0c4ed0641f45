"""True top-k marginalization: on-device prompt assembly + RAG-sequence
loss (losses/marginal_topk.py)."""

import numpy as np

import jax.numpy as jnp

from dalm_tpu.data.tokenizer import ByteTokenizer
from dalm_tpu.losses.marginal_topk import (
    answer_loglik,
    assemble_generator_inputs,
    topk_marginal_loss,
)


def _segments(tok, query, passage, answer, lq, lp, la):
    """Trainer's segment construction (rag_e2e.py marginalize_k setup)."""
    qm, pm = f"#query# {query}", f"#passage# {passage}"
    seg_q = f"#query# {qm}"
    seg_p = f" #passage# {pm}"
    seg_a = f" #answer# {answer}"
    tq = tok([seg_q], padding="max_length", max_length=lq, truncation=True)
    tp = tok([seg_p], padding="max_length", max_length=lp, truncation=True)
    ta = tok([seg_a], padding="max_length", max_length=la, truncation=True)
    return (
        np.asarray(tq["input_ids"], np.int32), np.asarray([sum(tq["attention_mask"][0])], np.int32),
        np.asarray(tp["input_ids"], np.int32), np.asarray([sum(tp["attention_mask"][0])], np.int32),
        np.asarray(ta["input_ids"], np.int32), np.asarray([sum(ta["attention_mask"][0])], np.int32),
    )


def test_assembly_matches_joint_tokenization():
    """Byte tokenizer: assembled segment tokens decode to the exact
    combined causal text of preprocess_rag_e2e_dataset."""
    tok = ByteTokenizer()
    query, passage, answer = "what is it", "a thing of note", "a thing"
    q_ids, q_len, p_ids, p_len, a_ids, a_len = _segments(tok, query, passage, answer, 32, 40, 24)

    ids, mask, boundary = assemble_generator_inputs(
        jnp.asarray(q_ids), jnp.asarray(q_len),
        jnp.asarray(p_ids)[:, None, :], jnp.asarray(p_len)[:, None],
        jnp.asarray(a_ids), jnp.asarray(a_len),
        pad_id=tok.pad_token_id,
    )
    ids, mask = np.asarray(ids)[0, 0], np.asarray(mask)[0, 0]
    text = tok.decode(ids[mask > 0])
    qm, pm = f"#query# {query}", f"#passage# {passage}"
    expected = f"#query# {qm} #passage# {pm} #answer# {answer}"
    assert text == expected
    # boundary == the reference's query_passage_input_len minus the
    # " #answer#" marker (marker belongs to the answer segment here)
    b = int(np.asarray(boundary)[0, 0])
    assert tok.decode(ids[:b]) == f"#query# {qm} #passage# {pm}"


def test_k1_marginal_equals_answer_nll():
    """K=1: log softmax over one candidate is 0, so the loss reduces to
    the plain answer-region NLL (numpy oracle)."""
    rng = np.random.default_rng(0)
    B, K, L, V = 2, 1, 12, 16
    logits = rng.normal(size=(B, K, L, V)).astype(np.float32)
    ids = rng.integers(0, V, size=(B, K, L)).astype(np.int32)
    mask = np.ones((B, K, L), np.int32)
    mask[:, :, 10:] = 0
    boundary = np.array([[4], [5]], np.int32)
    marker_len = 2

    ll, n = answer_loglik(
        jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(boundary), marker_len
    )
    scores = jnp.zeros((B, K), jnp.float32)
    loss = float(topk_marginal_loss(scores, ll, n))

    # numpy oracle
    lp = logits[:, 0, :-1, :] - np.log(np.exp(logits[:, 0, :-1, :]).sum(-1, keepdims=True))
    total, count = 0.0, 0
    for b in range(B):
        for t in range(L - 1):
            nxt = t + 1
            if nxt >= boundary[b, 0] + marker_len and mask[b, 0, nxt]:
                total += lp[b, t, ids[b, 0, nxt]]
                count += 1
    np.testing.assert_allclose(loss, -total / count, rtol=1e-5)


def test_better_candidate_scores_lower_loss():
    """Raising the score of the candidate with the higher answer
    likelihood must lower the marginal loss (the gradient the retriever
    trains on)."""
    rng = np.random.default_rng(1)
    B, K = 3, 4
    ll = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    n = jnp.full((B,), 5, jnp.int32)
    best = np.asarray(jnp.argmax(ll, axis=1))

    neutral = jnp.zeros((B, K), jnp.float32)
    boosted = np.zeros((B, K), np.float32)
    for b in range(B):
        boosted[b, best[b]] = 5.0
    l0 = float(topk_marginal_loss(neutral, ll, n))
    l1 = float(topk_marginal_loss(jnp.asarray(boosted), ll, n))
    assert l1 < l0


def test_token_marginal_numpy_oracle():
    """RAG-token loss vs a per-token numpy oracle with per-candidate
    answer boundaries (the alignment the gather must get right)."""
    from dalm_tpu.losses.marginal_topk import (
        aligned_answer_token_loglik, answer_token_mask, topk_marginal_token_loss,
    )

    rng = np.random.default_rng(2)
    B, K, L, V, A = 2, 3, 16, 11, 6
    marker_len = 2
    logits = rng.normal(size=(B, K, L, V)).astype(np.float32)
    ids = rng.integers(0, V, size=(B, K, L)).astype(np.int32)
    mask = np.ones((B, K, L), np.int32)
    # per-candidate boundaries (different passage lengths)
    boundary = np.array([[4, 6, 5], [7, 4, 6]], np.int32)
    a_len = np.array([5, 6], np.int32)  # marker (2) + 3 / 4 answer tokens
    scores = rng.normal(size=(B, K)).astype(np.float32)

    ll_tok = aligned_answer_token_loglik(
        jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(boundary), marker_len, A,
    )
    valid = answer_token_mask(jnp.asarray(a_len), marker_len, A)
    loss = float(topk_marginal_token_loss(jnp.asarray(scores), ll_tok, valid))

    # numpy oracle
    lp = logits[:, :, :-1, :] - np.log(
        np.exp(logits[:, :, :-1, :]).sum(-1, keepdims=True)
    )
    d = scores - np.log(np.exp(scores).sum(1, keepdims=True))
    total, count = 0.0, 0
    for b in range(B):
        n_ans = a_len[b] - marker_len
        for a in range(n_ans):
            per_cand = []
            for j in range(K):
                t = boundary[b, j] + marker_len - 1 + a  # label position
                per_cand.append(d[b, j] + lp[b, j, t, ids[b, j, t + 1]])
            total += np.log(np.exp(per_cand).sum())
            count += 1
    np.testing.assert_allclose(loss, -total / count, rtol=1e-5)


def test_token_marginal_gradient_n_times_stronger_when_saturated():
    """The property RAG-token exists for: once the generator's answer
    likelihood clearly identifies one candidate (posterior saturated —
    the regime a trained generator operates in), the retrieval-score
    gradient of RAG-token is |answer|x the RAG-sequence gradient (which
    collects ONE per-sample posterior and divides by total answer
    tokens). In the unsaturated linear regime the two coincide; the
    saturated regime is where label-noise recovery happens."""
    import jax

    from dalm_tpu.losses.marginal_topk import (
        answer_token_mask, topk_marginal_token_loss,
    )

    B, K, A = 2, 4, 8
    # candidate 0 decisively explains every answer token (+8 nats/token)
    ll_tok = np.zeros((B, K, A), np.float32)
    ll_tok[:, 0, :] = 8.0
    ll_tok = jnp.asarray(ll_tok)
    scores = jnp.asarray(np.linspace(-1, 1, B * K).reshape(B, K), jnp.float32)
    valid = answer_token_mask(jnp.full((B,), A, jnp.int32), 0, A)

    g_tok = jax.grad(
        lambda s: topk_marginal_token_loss(s, ll_tok, valid)
    )(scores)
    g_seq = jax.grad(
        lambda s: topk_marginal_loss(
            s, ll_tok.sum(axis=2), jnp.full((B,), A, jnp.int32)
        )
    )(scores)
    ratio = float(jnp.abs(g_tok).sum() / jnp.abs(g_seq).sum())
    np.testing.assert_allclose(ratio, A, rtol=0.05)
