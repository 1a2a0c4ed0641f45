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
