"""Async index refresher: double buffering, consistency, swap semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.core.mesh import MeshConfig, make_mesh
from dalm_tpu.index.dense import ShardedDenseIndex
from dalm_tpu.index.refresh import AsyncIndexRefresher


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=4, model=2))


def _setup(mesh, n=100, d=32, slice_size=16):
    rng = np.random.default_rng(0)
    old_embs = rng.normal(size=(n, d)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, old_embs)

    # "embedding model": token ids (B, d) int32 (as in real use); params a
    # (d, d) float matrix; embedding = float(ids) @ params.
    tokens = rng.integers(-5, 6, size=(n, d)).astype(np.int32)

    @jax.jit
    def embed_fn(params, ids, mask):
        return ids.astype(jnp.float32) @ params

    refresher = AsyncIndexRefresher(
        index, embed_fn, tokens, np.ones_like(tokens), slice_size=slice_size
    )
    return index, refresher, tokens.astype(np.float32), old_embs


def test_search_consistent_until_swap(mesh):
    index, refresher, tokens, old_embs = _setup(mesh)
    params = jnp.eye(32)
    queries = np.random.default_rng(1).normal(size=(3, 32)).astype(np.float32)

    before_scores, before_ids = index.search(queries, 5)
    # partial sweep: index must still serve the OLD embeddings
    stats = refresher.tick(params)
    assert not stats["swapped"]
    mid_scores, mid_ids = index.search(queries, 5)
    np.testing.assert_array_equal(before_ids, mid_ids)
    np.testing.assert_allclose(before_scores, mid_scores, rtol=1e-6)


def test_full_sweep_swaps_to_new_embeddings(mesh):
    index, refresher, tokens, _ = _setup(mesh)
    params = jnp.eye(32) * 2.0  # new embedding fn: tokens * 2
    version = refresher.refresh_fully(params)
    assert version == 1

    queries = np.random.default_rng(2).normal(size=(4, 32)).astype(np.float32)
    scores, ids = index.search(queries, 5)
    expected = queries @ (tokens * 2.0).T
    o_ids = np.argsort(-expected, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, o_ids)
    np.testing.assert_allclose(scores, np.take_along_axis(expected, o_ids, 1), rtol=1e-4)


def test_two_sweeps_alternate_buffers(mesh):
    index, refresher, tokens, _ = _setup(mesh, slice_size=40)
    refresher.refresh_fully(jnp.eye(32))
    refresher.refresh_fully(jnp.eye(32) * 3.0)
    assert refresher.version == 2
    queries = np.random.default_rng(3).normal(size=(2, 32)).astype(np.float32)
    scores, ids = index.search(queries, 3)
    expected = queries @ (tokens * 3.0).T
    o_ids = np.argsort(-expected, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(ids, o_ids)
