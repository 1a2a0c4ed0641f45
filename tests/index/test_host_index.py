"""C++ host index + tiered (HBM + host spill) index tests."""

import numpy as np
import pytest

from dalm_tpu.core.mesh import MeshConfig, make_mesh
from dalm_tpu.index.host_index import HostDenseIndex, TieredIndex


def _oracle(queries, embs, k):
    full = queries @ embs.T
    ids = np.argsort(-full, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(full, ids, axis=1), ids


@pytest.mark.parametrize("use_native", [True, False])
def test_host_index_matches_oracle(use_native):
    rng = np.random.default_rng(0)
    embs = rng.normal(size=(5000, 64)).astype(np.float32)
    queries = rng.normal(size=(9, 64)).astype(np.float32)
    idx = HostDenseIndex(embs, use_native=use_native)
    scores, ids = idx.search(queries, 10)
    o_scores, o_ids = _oracle(queries, embs, 10)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-4)
    np.testing.assert_array_equal(ids, o_ids)


def test_host_index_ties_prefer_smaller_id():
    embs = np.ones((100, 8), np.float32)
    queries = np.ones((2, 8), np.float32)
    idx = HostDenseIndex(embs)
    _, ids = idx.search(queries, 5)
    np.testing.assert_array_equal(ids, np.tile(np.arange(5), (2, 1)))


def test_host_index_memmap(tmp_path):
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(1000, 32)).astype(np.float32)
    path = tmp_path / "embs.bin"
    embs.tofile(path)
    idx = HostDenseIndex.from_memmap(str(path), 1000, 32)
    queries = rng.normal(size=(3, 32)).astype(np.float32)
    scores, ids = idx.search(queries, 5)
    o_scores, o_ids = _oracle(queries, embs, 5)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-4)
    np.testing.assert_array_equal(ids, o_ids)


def test_tiered_index_union_is_exact():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    rng = np.random.default_rng(2)
    embs = rng.normal(size=(500, 32)).astype(np.float32)
    queries = rng.normal(size=(6, 32)).astype(np.float32)
    tiered = TieredIndex.build(mesh, embs, hbm_budget_rows=300)
    assert tiered.host_index is not None
    scores, ids = tiered.search(queries, 10)
    o_scores, o_ids = _oracle(queries, embs, 10)
    np.testing.assert_allclose(scores, o_scores, rtol=1e-4)
    np.testing.assert_array_equal(ids, o_ids)
