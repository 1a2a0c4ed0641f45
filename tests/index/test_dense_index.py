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


def test_int8_index_matches_dequantized_oracle(mesh):
    """quantize=True: top-k is exact w.r.t. the QUANTIZED index (oracle =
    brute force on the dequantized rows), and close to the fp oracle on
    normalized embeddings."""
    rng = np.random.default_rng(7)
    embs = rng.normal(size=(500, 64)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = rng.normal(size=(9, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = ShardedDenseIndex.build(mesh, embs, quantize=True)
    assert index.embeddings.dtype == np.int8
    assert index.scales is not None
    scores, ids = index.search(queries, 10)

    # dequantized oracle
    absmax = np.max(np.abs(embs), axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    deq = np.clip(np.round(embs / scale), -127, 127) * scale
    # bf16 queries in the search path: quantize the comparison inputs too
    import ml_dtypes

    q16 = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
    d16 = np.clip(np.round(embs / scale), -127, 127).astype(ml_dtypes.bfloat16).astype(np.float32) * scale
    o_scores, o_ids = _oracle(q16, d16, 10)
    # same winners up to int8/bf16-resolution ties: require ≥9/10 overlap/row
    overlap = np.array([
        len(set(ids[r]) & set(o_ids[r])) for r in range(len(queries))
    ])
    assert (overlap >= 9).all(), overlap
    np.testing.assert_allclose(np.sort(scores, axis=1), np.sort(o_scores, axis=1), rtol=0.05, atol=0.02)

    # and close to the full-precision oracle (normalized rows → tiny error)
    f_scores, f_ids = _oracle(queries, embs, 10)
    hit1 = (ids[:, 0] == f_ids[:, 0]).mean()
    assert hit1 >= 0.8


def test_int8_refresh_requantizes(mesh):
    rng = np.random.default_rng(8)
    embs = rng.normal(size=(100, 32)).astype(np.float32)
    index = ShardedDenseIndex.build(mesh, embs, quantize=True)
    new = rng.normal(size=(100, 32)).astype(np.float32)
    index.refresh(new)
    assert index.embeddings.dtype == np.int8
    scores, ids = index.search(new[:4], 1)
    assert (ids[:, 0] == np.arange(4)).all()  # self-retrieval on new rows


def test_int4_index_matches_dequantized_oracle(mesh):
    """quantize="int4": top-k exact w.r.t. the 4-bit index (oracle =
    brute force on the dequantized rows); refresh-in-place refuses."""
    import ml_dtypes
    import pytest

    rng = np.random.default_rng(11)
    embs = rng.normal(size=(500, 64)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = rng.normal(size=(9, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = ShardedDenseIndex.build(mesh, embs, quantize="int4")
    assert index.embeddings.dtype == np.uint8
    assert index.embeddings.shape[1] == 32  # D/2 packed columns
    scores, ids = index.search(queries, 10)

    absmax = np.max(np.abs(embs), axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0)
    deq = np.clip(np.round(embs / scale), -7, 7) * scale
    q16 = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
    o_scores = q16 @ deq.T
    o_ids = np.argsort(-o_scores, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), o_ids)

    with pytest.raises(NotImplementedError):
        index.refresh(embs)
