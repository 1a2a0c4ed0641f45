"""Local-negatives parity mode: block-diagonal masking must equal
computing the loss independently per device-block (the reference's
per-DDP-process semantics, SURVEY.md §2.4)."""

import jax.numpy as jnp
import numpy as np

from dalm_tpu.losses.contrastive import contrastive_loss


def test_block_mask_equals_per_block_mean():
    rng = np.random.default_rng(0)
    block, shards = 4, 3
    n = block * shards
    q = rng.normal(size=(n, 16)).astype(np.float32)
    p = rng.normal(size=(n, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p /= np.linalg.norm(p, axis=1, keepdims=True)

    masked_loss, _ = contrastive_loss(
        jnp.asarray(q), jnp.asarray(p), 100.0, local_negatives_block=block
    )

    per_block = []
    for s in range(shards):
        sl = slice(s * block, (s + 1) * block)
        loss, _ = contrastive_loss(jnp.asarray(q[sl]), jnp.asarray(p[sl]), 100.0)
        per_block.append(float(loss))
    np.testing.assert_allclose(float(masked_loss), np.mean(per_block), rtol=1e-5)


def test_masked_logits_softmax_is_local():
    rng = np.random.default_rng(1)
    block = 2
    q = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    _, logits = contrastive_loss(jnp.asarray(q), jnp.asarray(p), 10.0, local_negatives_block=block)
    import jax

    probs = np.asarray(jax.nn.softmax(logits, axis=1))
    # cross-block probabilities must be exactly 0
    assert probs[0, 2] == 0 and probs[0, 3] == 0
    assert probs[3, 0] == 0 and probs[3, 1] == 0
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-6)


def test_global_mode_unchanged():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    l1, _ = contrastive_loss(jnp.asarray(q), jnp.asarray(p), 100.0)
    l2, _ = contrastive_loss(jnp.asarray(q), jnp.asarray(p), 100.0, local_negatives_block=None)
    assert float(l1) == float(l2)
