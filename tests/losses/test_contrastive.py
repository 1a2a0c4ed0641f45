"""Contrastive loss parity: hand-computed values + torch cross-check.

The torch formulas here are independent re-statements of the reference
math (`/root/reference/dalm/training/utils/train_utils.py:76-88`) used as
golden oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.losses import contrastive_loss, cosine_sim_logits, nt_xent_loss


def test_cosine_sim_logits_scale():
    q = np.eye(3, 4, dtype=np.float32)
    p = np.eye(3, 4, dtype=np.float32)
    s = cosine_sim_logits(jnp.asarray(q), jnp.asarray(p), 100.0)
    np.testing.assert_allclose(np.asarray(s), np.eye(3) * 100.0, atol=1e-5)


def test_nt_xent_hand_computed():
    # 2x2 logits [[2,0],[0,2]]: CE = -log(e^2/(e^2+1)) per row.
    s = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    expected = -np.log(np.exp(2.0) / (np.exp(2.0) + 1.0))
    np.testing.assert_allclose(float(nt_xent_loss(s)), expected, rtol=1e-4)


def test_nt_xent_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    s = rng.normal(size=(8, 8)).astype(np.float32)
    ours = float(nt_xent_loss(jnp.asarray(s)))
    theirs = float(
        torch.nn.functional.cross_entropy(torch.tensor(s), torch.arange(8))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_symmetric_contrastive_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    p = rng.normal(size=(6, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p /= np.linalg.norm(p, axis=1, keepdims=True)

    loss, logits = contrastive_loss(jnp.asarray(q), jnp.asarray(p), 100.0)

    ts = torch.tensor(q) @ torch.tensor(p).T * 100
    labels = torch.arange(6)
    expected = (
        torch.nn.functional.cross_entropy(ts, labels)
        + torch.nn.functional.cross_entropy(ts.T, labels)
    ) / 2
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), ts.numpy(), rtol=1e-4)


def test_extra_negatives_augment_softmax():
    """Hard negatives from the live index extend the q->p softmax: a
    high-scoring extra negative must increase the loss, and the returned
    sim matrix carries the extra columns (for the marginalized loss's
    passage normalizer)."""
    import jax.numpy as jnp
    import numpy as np

    from dalm_tpu.losses.contrastive import contrastive_loss

    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 8)); q /= np.linalg.norm(q, axis=1, keepdims=True)
    p = q + 0.1 * rng.normal(size=(4, 8)); p /= np.linalg.norm(p, axis=1, keepdims=True)
    q, p = jnp.asarray(q, jnp.float32), jnp.asarray(p, jnp.float32)

    base_loss, base_sim = contrastive_loss(q, p, 10.0)
    assert base_sim.shape == (4, 4)

    hard = jnp.full((4, 2), 9.0, jnp.float32)  # strong distractors
    aug_loss, aug_sim = contrastive_loss(q, p, 10.0, extra_negative_logits=hard)
    assert aug_sim.shape == (4, 6)
    assert float(aug_loss) > float(base_loss)
    # positives still on the diagonal of the square block
    np.testing.assert_allclose(np.asarray(aug_sim[:, :4]), np.asarray(base_sim), rtol=1e-6)

    # weak distractors change (almost) nothing
    weak = jnp.full((4, 2), -100.0, jnp.float32)
    weak_loss, _ = contrastive_loss(q, p, 10.0, extra_negative_logits=weak)
    np.testing.assert_allclose(float(weak_loss), float(base_loss), atol=1e-5)


def test_marginalized_accepts_augmented_scores():
    """marginalized_nll_loss normalizes doc scores over B+K columns when
    given the augmented sim matrix; a strong extra negative lowers the
    positive's doc log-prob, raising the loss."""
    import jax.numpy as jnp
    import numpy as np

    from dalm_tpu.losses.marginalized import marginalized_nll_loss

    rng = np.random.default_rng(1)
    B, L, V = 3, 10, 16
    logits = jnp.asarray(rng.normal(size=(B, L, V)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    qpl = jnp.full((B,), 4, jnp.int32)
    sim = jnp.asarray(rng.normal(size=(B, B)), jnp.float32)

    base = marginalized_nll_loss(logits, ids, mask, sim, qpl)
    aug = jnp.concatenate([sim, jnp.full((B, 2), 8.0, jnp.float32)], axis=1)
    harder = marginalized_nll_loss(logits, ids, mask, aug, qpl)
    assert float(harder) > float(base)
