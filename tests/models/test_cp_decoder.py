"""Context-parallel decoder: attention_impl="ring" under shard_map must
reproduce the plain einsum decoder's logits and the same training loss —
sequence axis sharded over the mesh `model` axis, RoPE positions offset
per chunk, next-token labels crossing chunk boundaries via ppermute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dalm_tpu.core.mesh import MeshConfig, make_mesh, unbox
from dalm_tpu.models.decoder import Decoder, DecoderConfig


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=1, model=8))


@pytest.fixture(scope="module")
def setup(mesh):
    import dataclasses

    cfg = DecoderConfig.tiny(vocab_size=128)
    model = Decoder(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 64)).astype(np.int32)
    params = unbox(
        model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)))["params"]
    )
    ring_cfg = dataclasses.replace(cfg, attention_impl="ring")
    return cfg, ring_cfg, params, ids


def test_cp_logits_match_full(mesh, setup):
    cfg, ring_cfg, params, ids = setup
    model = Decoder(cfg)
    full = np.asarray(model.apply({"params": params}, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids))))

    ring_model = Decoder(ring_cfg)

    def fwd(p, chunk_ids):
        chunk = jax.lax.axis_index("model")
        s_loc = chunk_ids.shape[1]
        pos = chunk * s_loc + jnp.arange(s_loc)[None, :]
        return ring_model.apply(
            {"params": p}, chunk_ids, jnp.ones_like(chunk_ids),
            positions=jnp.broadcast_to(pos, chunk_ids.shape),
        )

    mapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "model")),
        out_specs=P(None, "model", None),
        check_vma=False,
    )
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P(None, "model"))
    )
    cp = np.asarray(jax.jit(mapped)(params, ids_sharded))
    np.testing.assert_allclose(cp, full, atol=3e-5, rtol=3e-5)


def test_cp_loss_matches_full(mesh, setup):
    """Cross-chunk next-token labels (ppermute) → same mean NLL as the
    unsharded causal_lm_loss."""
    cfg, ring_cfg, params, ids = setup
    from dalm_tpu.losses.causal import causal_lm_loss
    from dalm_tpu.train.context_parallel import build_cp_loss

    model = Decoder(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)))
    expected = float(causal_lm_loss(logits, jnp.asarray(ids)))

    cp_loss = build_cp_loss(Decoder(ring_cfg), mesh, axis_name="model")
    ids_sharded = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(None, "model")))
    got = float(jax.jit(cp_loss)(params, ids_sharded))
    assert abs(got - expected) < 3e-5


def test_cp_grads_match_full(mesh, setup):
    cfg, ring_cfg, params, ids = setup
    from dalm_tpu.losses.causal import causal_lm_loss
    from dalm_tpu.train.context_parallel import build_cp_loss

    model = Decoder(cfg)

    def full_loss(p):
        logits = model.apply({"params": p}, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)))
        return causal_lm_loss(logits, jnp.asarray(ids))

    g_full = jax.grad(full_loss)(params)

    cp_loss = build_cp_loss(Decoder(ring_cfg), mesh, axis_name="model")
    ids_sharded = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(None, "model")))
    g_cp = jax.jit(jax.grad(lambda p: cp_loss(p, ids_sharded)))(params)

    flat_a = jax.tree_util.tree_leaves(g_full)
    flat_b = jax.tree_util.tree_leaves(g_cp)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3)


def test_cp_zigzag_loss_and_grads_match_full(mesh, setup):
    """layout="zigzag" (balanced causal ring): tokens permuted by
    zigzag_indices, positions and boundary labels follow the layout —
    loss AND grads equal the unsharded objective."""
    import dataclasses

    cfg, ring_cfg, params, ids = setup
    from dalm_tpu.kernels.ring_attention import zigzag_indices
    from dalm_tpu.losses.causal import causal_lm_loss
    from dalm_tpu.train.context_parallel import build_cp_loss

    model = Decoder(cfg)

    def full_loss(p):
        logits = model.apply({"params": p}, jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids)))
        return causal_lm_loss(logits, jnp.asarray(ids))

    expected = float(full_loss(params))
    g_full = jax.grad(full_loss)(params)

    zz_cfg = dataclasses.replace(ring_cfg, ring_layout="zigzag")
    cp_loss = build_cp_loss(Decoder(zz_cfg), mesh, axis_name="model", layout="zigzag")
    perm = zigzag_indices(ids.shape[1], 8)
    ids_z = jax.device_put(
        jnp.asarray(ids[:, perm]), NamedSharding(mesh, P(None, "model"))
    )
    got = float(jax.jit(cp_loss)(params, ids_z))
    assert abs(got - expected) < 3e-5

    g_cp = jax.jit(jax.grad(lambda p: cp_loss(p, ids_z)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_cp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3)
