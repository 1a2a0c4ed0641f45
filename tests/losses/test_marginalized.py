"""Marginalized causal loss: vectorized JAX vs a straight torch
re-statement of the reference per-sample-loop algorithm
(`/root/reference/dalm/training/utils/train_utils.py:96-138`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.losses import marginalized_nll_loss


def _torch_reference(logits, input_ids, attention_mask, scores, qp_len):
    """Independent torch oracle of the reference formula (per-sample loop)."""
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(logits)
    input_ids = torch.tensor(input_ids)
    attention_mask = torch.tensor(attention_mask)
    scores = torch.tensor(scores)

    logp = F.log_softmax(logits[:, :-1, :], dim=2)
    doc_logprobs = torch.log_softmax(scores, dim=1).diag()

    rows = []
    for i in range(logits.shape[0]):
        L = int(qp_len[i])
        keep = logp[i, : L - 1, :]
        marg = logp[i, L - 1 :, :] + doc_logprobs[i]
        rows.append(torch.cat([keep, marg], dim=0))
    marginalized = torch.stack(rows)

    ll = torch.gather(marginalized, 2, input_ids[:, 1:].unsqueeze(2)).squeeze(-1)
    loss = -ll * attention_mask[:, 1:]
    return float(loss.sum() / attention_mask[:, 1:].sum())


def test_matches_reference_loop():
    pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    B, L, V = 4, 12, 17
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    input_ids = rng.integers(0, V, size=(B, L)).astype(np.int64)
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[0, 9:] = 0  # padded tail
    attention_mask[2, 7:] = 0
    scores = rng.normal(size=(B, B)).astype(np.float32)
    qp_len = np.array([5, 7, 4, 6], np.int32)

    ours = float(
        marginalized_nll_loss(
            jnp.asarray(logits),
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(scores),
            jnp.asarray(qp_len),
        )
    )
    expected = _torch_reference(logits, input_ids, attention_mask, scores, qp_len)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_doc_score_gradient_flows():
    """Retrieval must stay differentiable through the generator loss."""
    import jax

    rng = np.random.default_rng(4)
    B, L, V = 3, 8, 11
    logits = jnp.asarray(rng.normal(size=(B, L, V)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    qp_len = jnp.asarray([3, 4, 5], jnp.int32)

    def f(scores):
        return marginalized_nll_loss(logits, ids, mask, scores, qp_len)

    g = jax.grad(f)(jnp.asarray(rng.normal(size=(B, B)), jnp.float32))
    assert np.abs(np.asarray(g)).sum() > 0


def test_answer_region_boundary():
    """Positions before qp_len-1 must be unaffected by doc scores."""
    rng = np.random.default_rng(5)
    B, L, V = 2, 6, 7
    logits = jnp.asarray(rng.normal(size=(B, L, V)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    # qp_len == L → answer region empty except final position; with
    # qp_len = L the region starts at L-1 which is beyond the L-1 logits →
    # the loss must equal plain NLL regardless of scores.
    qp_len = jnp.asarray([L, L], jnp.int32)

    s1 = jnp.zeros((B, B))
    s2 = jnp.asarray(rng.normal(size=(B, B)), jnp.float32) * 10
    l1 = float(marginalized_nll_loss(logits, ids, mask, s1, qp_len))
    l2 = float(marginalized_nll_loss(logits, ids, mask, s2, qp_len))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
