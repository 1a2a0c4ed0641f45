"""Pallas fused dot+top-k kernel vs oracle (interpret mode on CPU;
property test per SURVEY.md §4 implication: 'property-test the top-k
kernel vs jax.lax.top_k')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.kernels.topk import fused_dot_topk


def _oracle(queries, embs, k):
    full = queries @ embs.T
    ids = np.argsort(-full, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(full, ids, axis=1), ids


@pytest.mark.parametrize("n_valid,rows,block", [(1000, 1024, 256), (512, 512, 512), (100, 128, 64)])
def test_matches_oracle(n_valid, rows, block):
    rng = np.random.default_rng(rows)
    D, Q, K = 128, 8, 10
    embs = rng.normal(size=(rows, D)).astype(np.float32)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    s, i = fused_dot_topk(
        jnp.asarray(queries), jnp.asarray(embs), K,
        num_valid=n_valid, block_rows=block, interpret=True,
    )
    o_scores, o_ids = _oracle(queries, embs[:n_valid], K)
    np.testing.assert_allclose(np.asarray(s), o_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), o_ids)


def test_ties_break_to_smaller_id():
    # identical rows → scores tie; smaller id must win (stable order)
    embs = np.ones((64, 16), np.float32)
    queries = np.ones((2, 16), np.float32)
    s, i = fused_dot_topk(jnp.asarray(queries), jnp.asarray(embs), 5, block_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.tile(np.arange(5), (2, 1)))


def test_matches_lax_topk_property():
    rng = np.random.default_rng(7)
    for _ in range(3):
        rows = int(rng.integers(64, 512) // 8 * 8)
        D = 128
        embs = rng.normal(size=(rows, D)).astype(np.float32)
        queries = rng.normal(size=(4, D)).astype(np.float32)
        k = int(rng.integers(1, 16))
        s, _ = fused_dot_topk(jnp.asarray(queries), jnp.asarray(embs), k, block_rows=128, interpret=True)
        ref_s, _ = jax.lax.top_k(jnp.asarray(queries @ embs.T), k)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-5)


def test_int8_variant_matches_dequantized_oracle():
    """scales operand: kernel scores must equal brute force on the
    dequantized rows (bf16 matmul resolution)."""
    import ml_dtypes

    rng = np.random.default_rng(5)
    rows, D, Q, K = 512, 128, 8, 10
    embs = rng.normal(size=(rows, D)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    absmax = np.max(np.abs(embs), axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q8 = np.clip(np.round(embs / scale), -127, 127).astype(np.int8)

    s, i = fused_dot_topk(
        jnp.asarray(queries, jnp.bfloat16), jnp.asarray(q8), K,
        num_valid=400, block_rows=128, interpret=True,
        scales=jnp.asarray(scale),
    )
    # oracle on dequantized (bf16-resolution) rows
    deq = (q8.astype(ml_dtypes.bfloat16).astype(np.float32)) * scale
    q16 = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
    o_scores, o_ids = _oracle(q16, deq[:400], K)
    np.testing.assert_array_equal(np.asarray(i), o_ids)
    np.testing.assert_allclose(np.asarray(s), o_scores, rtol=2e-2, atol=1e-3)


def test_int4_variant_matches_dequantized_oracle():
    """int4=True: half-split nibble rows; kernel scores equal brute force
    on the dequantized rows (bf16 matmul resolution)."""
    import ml_dtypes

    rng = np.random.default_rng(6)
    rows, D, Q, K = 512, 128, 8, 10
    embs = rng.normal(size=(rows, D)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    absmax = np.max(np.abs(embs), axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(embs / scale), -7, 7).astype(np.int32) + 8
    packed = (q[:, : D // 2] | (q[:, D // 2 :] << 4)).astype(np.uint8)

    s, i = fused_dot_topk(
        jnp.asarray(queries, jnp.bfloat16), jnp.asarray(packed), K,
        num_valid=400, block_rows=128, interpret=True,
        scales=jnp.asarray(scale), int4=True,
    )
    deq = ((q - 8).astype(ml_dtypes.bfloat16).astype(np.float32)) * scale
    q16 = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
    o_scores, o_ids = _oracle(q16, deq[:400], K)
    np.testing.assert_array_equal(np.asarray(i), o_ids)
