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


def test_pp_tp_loss_and_grads_match_plain(setup):
    """PP × TP: (data=2, stage=2, model=2) mesh — the `model` axis stays
    GSPMD-auto (partial-manual shard_map) with the stacked weights
    carrying their logical TP shardings. Loss AND grads must match the
    plain decoder exactly, proving XLA inserts the within-stage TP
    collectives correctly inside the pipelined program."""
    cfg, model, params, ids, mask = setup
    ref = float(_plain_loss(model, params, ids, mask))
    mesh = make_pp_mesh(2, model_parallel=2)
    assert mesh.shape == {"data": 2, "stage": 2, "model": 2}
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh, model=model)
    # the TP placement actually shards something over `model`
    assert any(
        "model" in str(x.sharding.spec) for x in jax.tree.leaves(st_p)
    ), "TP placement left every stacked leaf unsharded over model"
    loss_fn = build_pp_lm_loss(model, mesh, num_microbatches=2)
    got = float(jax.jit(loss_fn)(io_p, st_p, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    g_io, g_st = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(io_p, st_p, ids, mask)
    g_ref = jax.grad(lambda p: _plain_loss(model, p, ids, mask))(params)
    g_ref_io, g_ref_st = split_decoder_params(g_ref, cfg.num_layers)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        ),
        (g_st, g_io), (g_ref_st, g_ref_io),
    )


def test_pp_moe_aux_matches_per_microbatch_reference():
    """PP × MoE: a sparse-MoE layer stack pipelines, and the Switch aux
    added by ``moe_aux_weight`` equals the per-(layer, microbatch) mean
    of the plain decoder's aux computed on each microbatch separately
    (the gradient-accumulation semantics — see build_pp_lm_loss)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from dalm_tpu.models.decoder import DecoderConfig
    import dataclasses

    cfg = dataclasses.replace(
        DecoderConfig.tiny_moe(vocab_size=128), num_layers=4, moe_impl="dense"
    )
    model = Decoder(cfg)
    rng = np.random.default_rng(3)
    B, T, M = 8, 10, 2
    ids = jnp.asarray(rng.integers(1, 120, size=(B, T)).astype(np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(3), ids, mask)["params"])

    w = 0.37
    ce_ref = float(_plain_loss(model, params, ids, mask))
    # microbatches: data axis splits rows in half; each shard reshapes
    # (M, mb, T) in order → consecutive chunks within each half.
    aux_parts = []
    for half in (ids[: B // 2], ids[B // 2 :]):
        for m in range(M):
            mb = half[m * (B // 2 // M) : (m + 1) * (B // 2 // M)]
            _, aux = model.apply(
                {"params": params}, mb, jnp.ones_like(mb), return_moe_aux=True
            )
            aux_parts.append(float(aux))
    ref = ce_ref + w * float(np.mean(aux_parts))

    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    loss_fn = build_pp_lm_loss(model, mesh, num_microbatches=M, moe_aux_weight=w)
    got = float(jax.jit(loss_fn)(io_p, st_p, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=2e-5)
    # and it is differentiable through router + experts
    g_io, g_st = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(io_p, st_p, ids, mask)
    router_g = np.asarray(g_st["moe"]["router"])
    assert np.isfinite(router_g).all() and np.abs(router_g).max() > 0


def test_pp_neftune_noise(setup):
    """NEFTune under PP: same rng → same loss; noise changes the loss."""
    cfg, model, params, ids, mask = setup
    mesh = make_pp_mesh(4)
    io, stacked = split_decoder_params(params, cfg.num_layers)
    io_p, st_p = place_pp_params(io, stacked, mesh)
    loss_fn = build_pp_lm_loss(model, mesh, num_microbatches=2, neftune_alpha=5.0)
    k = jax.random.PRNGKey(9)
    a = float(jax.jit(loss_fn)(io_p, st_p, ids, mask, k))
    b = float(jax.jit(loss_fn)(io_p, st_p, ids, mask, k))
    c = float(jax.jit(loss_fn)(io_p, st_p, ids, mask, jax.random.PRNGKey(10)))
    clean = float(jax.jit(build_pp_lm_loss(model, mesh, num_microbatches=2))(io_p, st_p, ids, mask))
    assert a == b
    assert a != c and a != clean and np.isfinite(a)


def test_pp_rejects_v3_mixed_layers_and_mla():
    """PP stacks homogeneous layers; DeepSeek-V3's leading dense layers
    (moe_layer_start) and MLA attention are loudly rejected with a
    pointer to the supported composition."""
    import dataclasses

    import pytest

    from dalm_tpu.models.decoder import DecoderConfig
    from dalm_tpu.train.pipeline_parallel import _check_cfg

    cfg = dataclasses.replace(
        DecoderConfig.tiny_moe(), moe_layer_start=1
    )
    with pytest.raises(ValueError, match="moe_layer_start"):
        _check_cfg(cfg)
    with pytest.raises(ValueError, match="MLA"):
        _check_cfg(DecoderConfig.tiny_mla())
