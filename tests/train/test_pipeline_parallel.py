"""Pipeline parallelism (train/pipeline_parallel.py): the pipelined
GPipe-style loss must equal the plain (unsharded) causal-LM loss, and
its gradients must match in both the stacked-layer and io param trees —
on the virtual 8-device mesh (4 stages × 2 data shards)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.train.pipeline_parallel import (
    build_pp_lm_loss,
    make_pp_mesh,
    merge_decoder_params,
    place_pp_params,
    split_decoder_params,
)


def _cfg(**kw):
    base = dict(
        vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    base.update(kw)
    return DecoderConfig(**base)


def _plain_loss(model, params, ids, mask):
    logits = model.apply({"params": params}, ids, mask).astype(jnp.float32)
    tgt = jnp.roll(ids, -1, axis=1)
    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    w = mask.astype(jnp.float32) * jnp.roll(mask.astype(jnp.float32), -1, axis=1)
    w = w.at[:, -1].set(0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    cfg = _cfg()
    model = Decoder(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(8, 12)).astype(np.int32)
    mask = np.ones((8, 12), np.int32)
    mask[3, 9:] = 0  # ragged row: positions/loss-mask paths load-bearing
    mask[6, 7:] = 0
    params = unbox(
        model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))["params"]
    )
    return cfg, model, params, jnp.asarray(ids), jnp.asarray(mask)


def test_pp_loss_matches_plain(setup):
    cfg, model, params, ids, mask = setup
    ref = float(_plain_loss(model, params, ids, mask))

    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    loss_fn = build_pp_lm_loss(model, mesh, num_microbatches=2)
    got = float(jax.jit(loss_fn)(io_p, st_p, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_pp_grads_match_plain(setup):
    cfg, model, params, ids, mask = setup
    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    loss_fn = build_pp_lm_loss(model, mesh, num_microbatches=2)
    g_io, g_st = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(io_p, st_p, ids, mask)

    def plain(p):
        return _plain_loss(model, p, ids, mask)

    g_ref = jax.grad(plain)(params)
    g_ref_io, g_ref_st = split_decoder_params(g_ref, cfg.num_layers)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        ),
        g_st, g_ref_st,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        ),
        g_io, g_ref_io,
    )


def test_pp_microbatch_count_invariance(setup):
    """M=2 and M=4 pipelines compute the same global-mean loss."""
    cfg, model, params, ids, mask = setup
    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    l2 = float(jax.jit(build_pp_lm_loss(model, mesh, num_microbatches=2))(io_p, st_p, ids, mask))
    l4 = float(jax.jit(build_pp_lm_loss(model, mesh, num_microbatches=4))(io_p, st_p, ids, mask))
    np.testing.assert_allclose(l2, l4, rtol=1e-5)


def test_pp_stage_counts(setup):
    """2-stage (data=4) pipeline also matches the plain loss."""
    cfg, model, params, ids, mask = setup
    ref = float(_plain_loss(model, params, ids, mask))
    mesh = make_pp_mesh(2)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    got = float(jax.jit(build_pp_lm_loss(model, mesh, num_microbatches=2))(io_p, st_p, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_pp_tied_embeddings_and_window():
    """Tied-embedding + sliding-window config through the pipeline."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    cfg = _cfg(tie_embeddings=True, sliding_window=5)
    model = Decoder(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 120, size=(4, 10)).astype(np.int32))
    mask = jnp.ones((4, 10), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(1), ids, mask)["params"])
    ref = float(_plain_loss(model, params, ids, mask))
    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    got = float(jax.jit(build_pp_lm_loss(model, mesh, num_microbatches=2))(io_p, st_p, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_split_merge_roundtrip(setup):
    cfg, model, params, ids, mask = setup
    io, stacked = split_decoder_params(params, cfg.num_layers)
    merged = merge_decoder_params(io, stacked, cfg.num_layers)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merged, params,
    )


def test_pp_rejects_heterogeneous_layers():
    cfg = _cfg(sliding_window=4, sliding_layers="even")
    model = Decoder(cfg)
    mesh = make_pp_mesh(4)
    with pytest.raises(AssertionError, match="homogeneous"):
        build_pp_lm_loss(model, mesh, num_microbatches=2)
