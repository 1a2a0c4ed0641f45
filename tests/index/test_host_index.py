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


def test_host_index_multithreaded_matches_oracle(tmp_path):
    """Force OMP_NUM_THREADS=4 in a subprocess (env must precede libgomp
    init): on this 1-core box the default thread count is 1, so the
    per-thread-partials + merge path of dalm_host_topk (host_topk.cpp)
    otherwise NEVER runs multi-threaded. Threads timeslice on one core —
    this validates the parallel path's correctness (the part of the
    OpenMP scaling claim that is checkable without more cores)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    code = """
import numpy as np
from dalm_tpu.index.host_index import HostDenseIndex
rng = np.random.default_rng(7)
# > 4 blocks of 4096 rows so the omp-for actually distributes work
embs = rng.normal(size=(20000, 48)).astype(np.float32)
queries = rng.normal(size=(5, 48)).astype(np.float32)
idx = HostDenseIndex(embs, use_native=True)
assert idx.use_native, "native library did not load"
scores, ids = idx.search(queries, 10)
full = queries @ embs.T
o_ids = np.argsort(-full, axis=1, kind="stable")[:, :10]
o_scores = np.take_along_axis(full, o_ids, axis=1)
np.testing.assert_allclose(scores, o_scores, rtol=1e-4)
np.testing.assert_array_equal(ids, o_ids)
print("MT_OK")
"""
    env = dict(os.environ, OMP_NUM_THREADS="4", JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MT_OK" in out.stdout


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
