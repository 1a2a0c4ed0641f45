"""Pooling parity vs the reference formulas
(`/root/reference/dalm/models/retriever_only_base_model.py:60-68`,
`dalm/utils.py:22-35`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.models.pooling import eos_mask, eos_pool, mean_pool_l2


def test_mean_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    h = rng.normal(size=(3, 5, 8)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]], np.int64)

    ours = np.asarray(mean_pool_l2(jnp.asarray(h), jnp.asarray(mask)))

    th, tm = torch.tensor(h), torch.tensor(mask)
    expanded = tm.unsqueeze(-1).expand(th.size()).float()
    pooled = (th * expanded).sum(1) / torch.clamp(expanded.sum(1), min=1e-9)
    expected = torch.nn.functional.normalize(pooled, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_mean_pool_all_masked_no_nan():
    h = jnp.ones((1, 4, 8))
    mask = jnp.zeros((1, 4), jnp.int32)
    out = np.asarray(mean_pool_l2(h, mask))
    assert np.isfinite(out).all()


def test_eos_mask_left_padding():
    mask = jnp.asarray([[0, 0, 1, 1], [0, 1, 1, 1]])
    out = np.asarray(eos_mask(mask, padding="left"))
    np.testing.assert_array_equal(out, [[0, 0, 0, 1], [0, 0, 0, 1]])


def test_eos_mask_right_padding():
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]])
    out = np.asarray(eos_mask(mask, padding="right"))
    np.testing.assert_array_equal(out, [[0, 0, 1, 0], [0, 1, 0, 0]])


def test_eos_pool_selects_single_position():
    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, 4, 6)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1], [0, 1, 1, 1]], np.int64)
    out = np.asarray(eos_pool(jnp.asarray(h), jnp.asarray(mask), padding="left"))
    for i in range(2):
        expected = h[i, -1] / np.linalg.norm(h[i, -1])
        np.testing.assert_allclose(out[i], expected, rtol=1e-5)
