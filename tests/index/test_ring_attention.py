"""Ring attention vs full-attention oracle on the 8-device CPU mesh.

The sequence axis shards over the ring; K/V chunks rotate with ppermute
and the online-softmax merge must reproduce plain softmax attention over
the whole row (causal and non-causal)."""

import numpy as np
import pytest

from dalm_tpu.core.mesh import MeshConfig, make_mesh
from dalm_tpu.kernels.ring_attention import ring_attention_sharded


@pytest.fixture(scope="module")
def mesh():
    # 1 x 8: the whole mesh is the ring
    return make_mesh(MeshConfig(data=1, model=8))


def _oracle(q, k, v, causal):
    b, s, h, d = q.shape
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    if causal:
        mask = np.tril(np.ones((s, s), bool))
        scores = np.where(mask[None, None], scores, -1e30)
    scores = scores - scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(mesh, causal):
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 4, 16  # 8 chunks of 8
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)

    out = np.asarray(ring_attention_sharded(mesh, q, k, v, causal=causal))
    expected = _oracle(q, k, v, causal)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)


def test_ring_causality_no_future_leak(mesh):
    """Changing future tokens must not change past outputs."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 32, 2, 8
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)

    out1 = np.asarray(ring_attention_sharded(mesh, q, k, v, causal=True))
    k2, v2 = k.copy(), v.copy()
    k2[:, s // 2 :] += 10.0
    v2[:, s // 2 :] -= 5.0
    out2 = np.asarray(ring_attention_sharded(mesh, q, k2, v2, causal=True))
    np.testing.assert_allclose(out1[:, : s // 2], out2[:, : s // 2], atol=1e-6)
    assert not np.allclose(out1[:, s // 2 :], out2[:, s // 2 :])


def test_ring_single_chunk_degenerates_to_flash(mesh):
    """Axis size 1 (data=8, model=1 mesh) → plain within-chunk attention."""
    m1 = make_mesh(MeshConfig(data=8, model=1))
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 16, 2, 8
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    out = np.asarray(ring_attention_sharded(m1, q, k, v, causal=True))
    np.testing.assert_allclose(out, _oracle(q, k, v, True), atol=2e-5, rtol=2e-5)
