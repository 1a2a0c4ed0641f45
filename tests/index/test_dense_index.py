"""Sharded exact index vs numpy brute-force oracle, on the 8-device mesh."""

import jax
import numpy as np
import pytest

from dalm_tpu.core.mesh import MeshConfig, make_mesh
from dalm_tpu.index.dense import ShardedDenseIndex


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=4, model=2))


def _oracle(queries, embs, k):
    full = queries @ embs.T
    ids = np.argsort(-full, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(full, ids, axis=1), ids


def test_exact_topk_matches_bruteforce(mesh):
    rng = np.random.default_rng(0)
    embs = rng.normal(size=(1000, 64)).astype(np.float32)
    queries = rng.normal(size=(17, 64)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, embs)
    scores, ids = index.search(queries, 10)
    o_scores, o_ids = _oracle(queries, embs, 10)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-5)
    np.testing.assert_array_equal(ids, o_ids)


def test_uneven_and_tiny_index(mesh):
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(37, 16)).astype(np.float32)  # < shards * k
    queries = rng.normal(size=(5, 16)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, embs)
    scores, ids = index.search(queries, 10)
    o_scores, o_ids = _oracle(queries, embs, 10)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-5)
    np.testing.assert_array_equal(ids, o_ids)


def test_padded_rows_never_returned(mesh):
    rng = np.random.default_rng(2)
    embs = rng.normal(size=(9, 8)).astype(np.float32)
    queries = np.zeros((3, 8), np.float32)  # all scores 0 == padded dot 0
    index = ShardedDenseIndex.build(mesh, embs)
    _, ids = index.search(queries, 9)
    assert (ids < 9).all()


def test_refresh_swaps_embeddings(mesh):
    rng = np.random.default_rng(3)
    embs = rng.normal(size=(100, 32)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, embs)
    new_embs = rng.normal(size=(100, 32)).astype(np.float32)
    index.refresh(new_embs)
    queries = rng.normal(size=(4, 32)).astype(np.float32)
    scores, ids = index.search(queries, 5)
    o_scores, o_ids = _oracle(queries, new_embs, 5)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-5)
    np.testing.assert_array_equal(ids, o_ids)


def test_search_single_device_mesh():
    mesh1 = make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    rng = np.random.default_rng(4)
    embs = rng.normal(size=(50, 8)).astype(np.float32)
    queries = rng.normal(size=(3, 8)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh1, embs)
    scores, ids = index.search(queries, 5)
    o_scores, o_ids = _oracle(queries, embs, 5)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-5)
    np.testing.assert_array_equal(ids, o_ids)
