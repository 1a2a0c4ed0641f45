"""MLA / DeepSeek-V3 family (models/mla.py — beyond-parity: the
reference has no MLA support). Pins: absorbed-decode == full-forward
equivalence, the latent cache layout, torch logits parity through the
hf_loader (q_lora_rank set AND unset), and the loader's loud rejections
(V3 MoE, yarn rope, kv_quant-on-MLA)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decoder import Decoder, DecoderConfig


def _init(dec, B=2, S=8):
    ids = jnp.zeros((B, S), jnp.int32)
    return unbox(dec.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"])


def test_absorbed_decode_matches_full_forward():
    """The cached decode path (absorbed projections, latent-space
    scores) must equal the cache-less decompressed path — they are the
    same linear algebra in different association orders."""
    cfg = DecoderConfig.tiny_mla()
    dec = Decoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 500, (2, 10)), jnp.int32)
    params = _init(dec)

    full = dec.apply({"params": params}, ids, jnp.ones_like(ids))

    L = 16
    cache = dec.init_kv_cache(2, L, jnp.float32)
    steps = []
    for t in range(10):
        lg, cache = dec.apply(
            {"params": params}, ids[:, t:t + 1],
            jnp.asarray(np.arange(L)[None, :] < t + 1, jnp.int32),
            positions=jnp.full((2, 1), t, jnp.int32),
            kv_cache=cache, cache_index=t,
        )
        steps.append(lg[:, 0])
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-5)


def test_latent_cache_layout_and_size():
    """The cache stores ONLY the shared latent + rope key: (B, L, r) and
    (B, L, d_rope) per layer — no per-head buffers. kv_quant is rejected
    (the latent already IS the compressed tier)."""
    cfg = DecoderConfig.tiny_mla()
    dec = Decoder(cfg)
    cache = dec.init_kv_cache(3, 32)
    layer = cache["layer_0"]
    assert set(layer) == {"k", "pe"}
    assert layer["k"].shape == (3, 32, cfg.kv_lora_rank)
    assert layer["pe"].shape == (3, 32, cfg.qk_rope_head_dim)
    # bytes/token vs the standard tier of the same tiny geometry
    mla_floats = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    std_floats = DecoderConfig.tiny().kv_heads * DecoderConfig.tiny().head_dim * 2
    assert mla_floats < std_floats

    with pytest.raises(ValueError, match="kv_quant is not supported with MLA"):
        Decoder(dataclasses.replace(cfg, kv_quant=True)).init_kv_cache(1, 8)


def test_multitoken_cache_write_matches_onetoken():
    """S>1 cached writes (the speculative-verification path) ride the
    one-hot MXU writer with 3-D latent buffers — must equal two
    single-token writes."""
    cfg = DecoderConfig.tiny_mla()
    dec = Decoder(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 500, (2, 2)), jnp.int32)
    params = _init(dec)
    L = 8

    _, cache2 = dec.apply(
        {"params": params}, ids,
        jnp.asarray(np.arange(L)[None, :] < 2, jnp.int32),
        positions=jnp.asarray([[0, 1]] * 2, jnp.int32),
        kv_cache=dec.init_kv_cache(2, L, jnp.float32),
        cache_index=jnp.zeros((2,), jnp.int32),  # (B,) + S=2 → one-hot matmul
    )

    cache1 = dec.init_kv_cache(2, L, jnp.float32)
    for t in range(2):
        _, cache1 = dec.apply(
            {"params": params}, ids[:, t:t + 1],
            jnp.asarray(np.arange(L)[None, :] < t + 1, jnp.int32),
            positions=jnp.full((2, 1), t, jnp.int32),
            kv_cache=cache1, cache_index=jnp.full((2,), t, jnp.int32),
        )
    for key in ("k", "pe"):
        np.testing.assert_allclose(
            np.asarray(cache2["layer_0"][key]), np.asarray(cache1["layer_0"][key]),
            atol=1e-6,
        )


# ---------------------------------------------------------------------------
# torch parity (tiny checkpoints through hf_loader)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dalm_tpu.models.hf_loader import load_hf_decoder  # noqa: E402


def _v3_config(**kw):
    base = dict(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=64,
        q_lora_rank=24, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        first_k_dense_replace=2,  # >= layers: all-dense MLP (no V3 MoE)
        rope_scaling=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    base.update(kw)
    return transformers.DeepseekV3Config(**base)


def _save(cfg, tmp_path_factory, tag):
    model = transformers.DeepseekV3ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp(tag)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.fixture(scope="module")
def v3_dir(tmp_path_factory):
    return _save(_v3_config(), tmp_path_factory, "hf_dsv3")


@pytest.fixture(scope="module")
def v3_noqlora_dir(tmp_path_factory):
    return _save(_v3_config(q_lora_rank=None), tmp_path_factory, "hf_dsv3_nq")


def _parity(path, hf_model):
    cfg, params = load_hf_decoder(path)
    assert cfg.mla and cfg.rope_interleave
    model = Decoder(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                    jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4)
    return cfg, params, model


def test_deepseek_v3_logits_parity(v3_dir):
    """Full-model parity vs HF torch: MLA q/kv LoRA projections,
    interleaved rope on the decoupled slice, shared rope key, absorbed
    geometry — eager reference path."""
    path, hf_model = v3_dir
    cfg, params, model = _parity(path, hf_model)
    assert cfg.q_lora_rank == 24 and cfg.kv_lora_rank == 16

    # and the cached decode path agrees with torch too (end to end)
    ids = np.asarray([[3, 7, 11, 19]], np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()[:, -1]
    cache = model.init_kv_cache(1, 8, jnp.float32)
    lg = None
    for t in range(4):
        lg, cache = model.apply(
            {"params": params}, jnp.asarray(ids[:, t:t + 1], jnp.int32),
            jnp.asarray(np.arange(8)[None, :] < t + 1, jnp.int32),
            positions=jnp.full((1, 1), t, jnp.int32),
            kv_cache=cache, cache_index=t,
        )
    np.testing.assert_allclose(np.asarray(lg[:, 0]), expected, atol=2e-4)


def test_deepseek_v3_no_q_lora_parity(v3_noqlora_dir):
    """q_lora_rank=null configs use the direct q_proj (HF branch)."""
    path, hf_model = v3_noqlora_dir
    cfg, _, _ = _parity(path, hf_model)
    assert cfg.q_lora_rank is None


def test_deepseek_v3_moe_logits_parity(tmp_path_factory):
    """Full V3: MLA attention + noaux-tc MoE (sigmoid scores, correction
    bias for CHOICE only, group-limited top-k, routed_scaling_factor,
    shared experts, first_k_dense_replace leading dense layer) — logits
    parity vs HF torch on the exact dense expert path."""
    cfg = _v3_config(
        first_k_dense_replace=1, n_routed_experts=4, num_experts_per_tok=2,
        n_group=2, topk_group=1, moe_intermediate_size=16,
        n_shared_experts=1, routed_scaling_factor=2.5, norm_topk_prob=True,
    )
    model_t = transformers.DeepseekV3ForCausalLM(cfg)
    model_t.eval()
    # non-zero correction bias: exercises biased CHOICE vs raw-score
    # combine weights (zeros would make the bias path vacuous)
    with torch.no_grad():
        for layer in model_t.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    d = tmp_path_factory.mktemp("hf_dsv3_moe")
    model_t.save_pretrained(d, safe_serialization=True)

    jcfg, params = load_hf_decoder(str(d))
    assert jcfg.mla and jcfg.moe_router == "noaux_tc"
    assert jcfg.num_experts == 4 and jcfg.moe_layer_start == 1
    assert jcfg.moe_n_group == 2 and jcfg.moe_topk_group == 1
    assert jcfg.moe_n_shared_experts == 1
    assert jcfg.moe_routed_scaling_factor == 2.5
    # layer 0 is dense, layer 1 is MoE — both present in the tree
    assert "gate_proj" in params["layer_0"] and "moe" in params["layer_1"]
    assert "e_score_correction_bias" in params["layer_1"]["moe"]
    assert "shared_gate" in params["layer_1"]["moe"]

    model = Decoder(dataclasses.replace(jcfg, moe_impl="dense"))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = model_t(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                    jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=3e-4)


def test_deepseek_v3_yarn_parity(tmp_path_factory):
    """YaRN rope (the long-context scaling real V2/V3 checkpoints train
    with): per-dim NTK inv_freq blend over the beta correction range,
    attention_factor on cos/sin, AND DeepSeek's mscale_all_dim softmax
    rescale (scaling *= get_mscale(factor, mscale_all_dim)^2) — logits
    parity vs HF torch with real-V3-style mscale=mscale_all_dim=1.0."""
    cfg = _v3_config(rope_scaling={
        "rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "mscale": 1.0, "mscale_all_dim": 1.0,
        "original_max_position_embeddings": 32,
    })
    path, hf_model = _save(cfg, tmp_path_factory, "hf_dsv3_yarn")
    jcfg, _, _ = _parity(path, hf_model)
    assert jcfg.rope_yarn is not None
    import math

    m = 0.1 * 1.0 * math.log(4.0) + 1.0
    assert abs(jcfg.attn_scale_mult - m * m) < 1e-9
    assert abs(jcfg.rope_yarn[4] - 1.0) < 1e-9  # mscale == mscale_all_dim


def test_loader_rejects_unknown_v3_rope(tmp_path_factory):
    cfg2 = _v3_config(rope_scaling={
        "rope_type": "dynamic", "factor": 4.0,
        "original_max_position_embeddings": 512,
    })
    path2, _ = _save(cfg2, tmp_path_factory, "hf_dsv3_dynrope")
    with pytest.raises(ValueError, match="not implemented"):
        load_hf_decoder(path2)


def test_mla_through_decode_engine_matches_lockstep():
    """The continuous-batching engine manipulates the KV cache only via
    rank-aware tree ops, so MLA's 3-D latent buffers must ride through
    unmodified: engine outputs (host-loop AND fused schedule) == the
    lockstep greedy rollout on the same weights."""
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.generate import build_greedy_generate

    cfg = dataclasses.replace(DecoderConfig.tiny_mla(), dtype=jnp.float32)
    dec = Decoder(cfg)
    rng = np.random.default_rng(5)
    P, max_new = 10, 6
    ids = np.zeros((5, P), np.int32)
    mask = np.zeros((5, P), np.int32)
    for i in range(5):
        real = int(rng.integers(3, P))
        ids[i, P - real:] = rng.integers(5, 120, size=real)
        mask[i, P - real:] = 1
    params = _init(dec)

    gen = build_greedy_generate(dec, max_new, eos_token_id=None, pad_token_id=0)
    expected = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))

    eng = DecodeEngine(
        dec, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0,
    )
    got = eng.generate(ids, mask)
    got_fused = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]], f"host-loop req {i}"
        assert got_fused[i] == [int(t) for t in expected[i]], f"fused req {i}"


def test_mla_speculative_lockstep_exact():
    """Prompt-lookup speculation over the latent cache: the S=gamma+1
    verification forward writes multi-token latent rows (the one-hot
    MXU writer path) and must reproduce lockstep greedy exactly in f32."""
    from dalm_tpu.models.generate import build_greedy_generate
    from dalm_tpu.models.speculative import build_speculative_generate

    cfg = dataclasses.replace(DecoderConfig.tiny_mla(), dtype=jnp.float32)
    dec = Decoder(cfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(5, 120, (3, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = _init(dec)

    greedy = build_greedy_generate(dec, 8, eos_token_id=None, pad_token_id=0)
    want = np.asarray(greedy(params, ids, mask))
    spec = build_speculative_generate(
        dec, 8, eos_token_id=None, pad_token_id=0, gamma=4,
    )
    got = np.asarray(spec(params, ids, mask))
    np.testing.assert_array_equal(got, want)
