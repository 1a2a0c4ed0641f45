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


def _jax_oracle(q, k, v, causal):
    import jax
    import jax.numpy as jnp

    b, s, h, d = q.shape
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _ring_fn(mesh, causal, impl, interpret):
    import functools

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dalm_tpu.kernels.ring_attention import ring_attention

    spec = P(None, "model", None, None)
    ring = jax.shard_map(
        functools.partial(
            ring_attention, axis_name="model", causal=causal, impl=impl, interpret=interpret
        ),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)

    def fn(q, k, v):
        q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
        return ring(q, k, v)

    return fn


@pytest.mark.parametrize("causal", [True, False])
def test_ring_gradients_match_oracle(mesh, causal):
    """The custom-VJP ring backward (rotating dk/dv accumulators) equals
    autodiff through full attention."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    b, s, h, d = 2, 64, 2, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32) for _ in range(3))
    ring = _ring_fn(mesh, causal, impl="xla", interpret=False)

    g_ring = jax.jit(jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_jax_oracle(q, k, v, causal) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5)


def test_ring_pallas_blocks_match_oracle(mesh):
    """impl="pallas" (flash-kernel blocks, interpret mode on CPU): forward
    and gradients both reproduce full attention."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    b, s, h, d = 1, 64, 2, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32) for _ in range(3))
    ring = _ring_fn(mesh, True, impl="pallas", interpret=True)

    out = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(out, np.asarray(_jax_oracle(q, k, v, True)), atol=2e-5, rtol=2e-5)

    g_ring = jax.jit(jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_jax_oracle(q, k, v, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5)


def _zigzag_fn(mesh, impl, interpret):
    import functools

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dalm_tpu.kernels.ring_attention import ring_attention

    spec = P(None, "model", None, None)
    ring = jax.shard_map(
        functools.partial(
            ring_attention, axis_name="model", causal=True, impl=impl,
            interpret=interpret, layout="zigzag",
        ),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)

    def fn(q, k, v):
        q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
        return ring(q, k, v)

    return fn


def test_zigzag_matches_full_attention(mesh):
    """Zigzag layout (balanced causal work): permute → ring → inverse
    permute reproduces full causal attention exactly."""
    import jax.numpy as jnp

    from dalm_tpu.kernels.ring_attention import zigzag_indices, zigzag_inverse

    rng = np.random.default_rng(20)
    b, s, h, d = 2, 64, 2, 16  # 8 devices -> 16 half-chunks of 4
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)

    perm = zigzag_indices(s, 8)
    inv = zigzag_inverse(s, 8)
    fn = _zigzag_fn(mesh, impl="xla", interpret=False)
    out_z = np.asarray(fn(jnp.asarray(q[:, perm]), jnp.asarray(k[:, perm]), jnp.asarray(v[:, perm])))
    out = out_z[:, inv]
    np.testing.assert_allclose(out, _oracle(q, k, v, True), atol=2e-5, rtol=2e-5)


def test_zigzag_gradients_match_oracle(mesh):
    import jax
    import jax.numpy as jnp

    from dalm_tpu.kernels.ring_attention import zigzag_indices, zigzag_inverse

    rng = np.random.default_rng(21)
    b, s, h, d = 1, 64, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32) for _ in range(3))
    perm = zigzag_indices(s, 8)
    inv = zigzag_inverse(s, 8)
    fn = _zigzag_fn(mesh, impl="xla", interpret=False)

    def loss_z(q, k, v):
        return jnp.sum(fn(q[:, perm], k[:, perm], v[:, perm])[:, inv] ** 2)

    g_z = jax.jit(jax.grad(loss_z, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_jax_oracle(q, k, v, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_z, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5)


def test_zigzag_pallas_blocks(mesh):
    import jax
    import jax.numpy as jnp

    from dalm_tpu.kernels.ring_attention import zigzag_indices, zigzag_inverse

    rng = np.random.default_rng(22)
    b, s, h, d = 1, 64, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32) for _ in range(3))
    perm = zigzag_indices(s, 8)
    inv = zigzag_inverse(s, 8)
    fn = _zigzag_fn(mesh, impl="pallas", interpret=True)
    out = np.asarray(jax.jit(lambda q, k, v: fn(q[:, perm], k[:, perm], v[:, perm])[:, inv])(q, k, v))
    np.testing.assert_allclose(
        out, np.asarray(_jax_oracle(q, k, v, True)), atol=2e-5, rtol=2e-5
    )
