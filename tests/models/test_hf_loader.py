"""HF interop parity: a torch BertModel / LlamaForCausalLM checkpoint
loaded through hf_loader must reproduce the torch forward numerically.
This is the guarantee that real bge/Llama-2 checkpoints port correctly
(SURVEY.md §7.3.4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dalm_tpu.models.decoder import Decoder  # noqa: E402
from dalm_tpu.models.encoder import Encoder  # noqa: E402
from dalm_tpu.models.hf_loader import load_hf_decoder, load_hf_encoder  # noqa: E402
from dalm_tpu.models.pooling import mean_pool_l2  # noqa: E402


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_bert")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_bert_forward_parity(bert_dir):
    path, hf_model = bert_dir
    cfg, params = load_hf_encoder(path)
    enc = Encoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask), deterministic=True)
    )
    # compare only unmasked positions (HF computes garbage on masked ones too,
    # but identical garbage; still restrict to be safe)
    np.testing.assert_allclose(ours[0], hf_out[0], atol=2e-4)
    np.testing.assert_allclose(ours[1, :7], hf_out[1, :7], atol=2e-4)


def test_bert_embedding_parity(bert_dir):
    """End goal: identical sentence embeddings (mean-pool + L2)."""
    path, hf_model = bert_dir
    cfg, params = load_hf_encoder(path)
    enc = Encoder(cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(3, 12))
    mask = (rng.random((3, 12)) > 0.2).astype(np.int64)
    mask[:, 0] = 1

    with torch.no_grad():
        th = hf_model(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
        expanded = torch.tensor(mask).unsqueeze(-1).expand(th.size()).float()
        pooled = (th * expanded).sum(1) / torch.clamp(expanded.sum(1), min=1e-9)
        expected = torch.nn.functional.normalize(pooled, p=2, dim=1).numpy()

    hidden = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask), deterministic=True)
    ours = np.asarray(mean_pool_l2(hidden, jnp.asarray(mask)))
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_llama_logits_parity(llama_dir):
    path, hf_model = llama_dir
    cfg, params = load_hf_decoder(path)
    dec = Decoder(cfg)
    assert cfg.kv_heads == 2  # GQA config survived

    ids = np.array([[1, 5, 9, 22, 54, 13]])
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4)


def test_llama_left_padded_parity(llama_dir):
    path, hf_model = llama_dir
    cfg, params = load_hf_decoder(path)
    dec = Decoder(cfg)
    ids = np.array([[0, 0, 7, 8, 9]])
    mask = np.array([[0, 0, 1, 1, 1]])
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours[:, 2:], hf_logits[:, 2:], atol=3e-4)


@pytest.fixture(scope="module")
def llama31_dir(tmp_path_factory):
    # rope_theta=100 with head_dim 8 puts the four rotary wavelengths at
    # ~{6.3, 20, 63, 199}; original_max=32 with low/high factors 1/4
    # makes the band edges 32 and 8 — so the checkpoint exercises all
    # three llama3-scaling regimes (kept / smoothed / divided-by-factor).
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        rope_theta=100.0, tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
        },
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_llama31")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_llama31_rope_scaling_parity(llama31_dir):
    """Llama-3.1-style rope_scaling (rope_type "llama3"): the
    frequency-band inv_freq rewrite matches the torch model, and is
    load-bearing (an unscaled twin with the same params diverges)."""
    import dataclasses

    path, hf_model = llama31_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.rope_llama3 == (2.0, 1.0, 4.0, 32.0)
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    # 28 positions: the scaled wavelengths (63/199) need distance for the
    # halved frequencies to accumulate a detectable phase divergence
    ids = rng.integers(1, 120, size=(2, 28)).astype(np.int64)
    mask = jnp.ones((2, 28), jnp.int32)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids, jnp.int32), mask))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)
    # load-bearing: an unscaled twin with the same params must FAIL the
    # parity tolerance above (i.e. the parity check would catch a loader
    # that dropped the rewrite)
    plain = Decoder(dataclasses.replace(cfg, rope_llama3=None))
    ungated = np.asarray(plain.apply({"params": params}, jnp.asarray(ids, jnp.int32), mask))
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(ungated, expected, atol=2e-4, rtol=2e-3)


def test_unsupported_rope_scaling_rejected(tmp_path):
    """yarn/dynamic/longrope rope_scaling must fail loudly, not load a
    checkpoint whose long-context attention would be silently wrong."""
    import json as _json

    (tmp_path / "config.json").write_text(_json.dumps({
        "model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64,
        "rope_scaling": {"rope_type": "yarn", "factor": 4.0},
    }))
    (tmp_path / "model.safetensors").write_bytes(b"")
    with pytest.raises(ValueError, match="rope_scaling"):
        load_hf_decoder(str(tmp_path))


@pytest.fixture(scope="module")
def phi3_dir(tmp_path_factory):
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        sliding_window=8, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, attn_implementation="eager",
    )
    model = transformers.Phi3ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_phi3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_phi3_logits_parity(phi3_dir):
    """Phi3 family: the fused qkv_proj / gate_up_proj checkpoint tensors
    split into this decoder's per-projection layout and the converted
    forward matches torch at S > the sliding window."""
    import torch

    path, hf_model = phi3_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.sliding_window == 8 and cfg.kv_heads == 2
    assert "bias" not in params["layer_0"]["attention"]["q_proj"]
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 16)).astype(np.int64)  # 16 > window 8
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_phi3_partial_rotary_rejected(tmp_path):
    import json as _json

    (tmp_path / "config.json").write_text(_json.dumps({
        "model_type": "phi3", "vocab_size": 64, "hidden_size": 32,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "partial_rotary_factor": 0.5,
    }))
    (tmp_path / "model.safetensors").write_bytes(b"")
    with pytest.raises(ValueError, match="partial_rotary_factor"):
        load_hf_decoder(str(tmp_path))


@pytest.fixture(scope="module")
def mistral_dir(tmp_path_factory):
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        sliding_window=8, tie_word_embeddings=False,
    )
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_mistral")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_mistral_logits_parity(mistral_dir):
    """Mistral family (GQA + sliding window): converted forward matches
    the torch model at S > window, where the band actually masks."""
    import torch

    path, hf_model = mistral_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.sliding_window == 8
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 16)).astype(np.int64)  # 16 > window 8
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def qwen2_dir(tmp_path_factory):
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    model = transformers.Qwen2ForCausalLM(cfg)
    # transformers zero-inits Linear biases; randomize so parity actually
    # exercises the bias path
    import torch

    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj, layer.self_attn.v_proj):
                proj.bias.normal_(std=0.5)
    model.eval()
    d = tmp_path_factory.mktemp("hf_qwen2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_qwen2_logits_parity(qwen2_dir):
    """Qwen2 family (the reference's QA-gen default model): GQA + Q/K/V
    projection bias — converted forward matches the torch model, and the
    bias is genuinely loaded (nonzero)."""
    import torch

    path, hf_model = qwen2_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.attention_bias
    b = params["layer_0"]["attention"]["q_proj"]["bias"]
    assert float(jnp.abs(b).max()) > 0
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def qwen3_dir(tmp_path_factory):
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=64,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.Qwen3ForCausalLM(cfg)
    import torch

    with torch.no_grad():
        # standard RMSNorm inits to ones → scale-only; randomize the q/k
        # norms so the per-head norm is load-bearing in the parity check
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.5)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.5)
    model.eval()
    d = tmp_path_factory.mktemp("hf_qwen3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_qwen3_logits_parity(qwen3_dir):
    """Qwen3 family: GQA + per-head QK RMSNorm (standard w scale, not
    gemma's (1+w)) + decoupled head_dim, NO qkv bias — converted forward
    matches the torch model."""
    import torch

    path, hf_model = qwen3_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.qk_norm and not cfg.rmsnorm_unit_offset
    assert not cfg.attention_bias and cfg.head_dim == 16
    assert "bias" not in params["layer_0"]["attention"]["q_proj"]
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def gemma_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=16,
        intermediate_size=96, max_position_embeddings=64,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        hidden_act="gelu_pytorch_tanh",
    )
    model = transformers.GemmaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_gemma")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_gemma_logits_parity(gemma_dir):
    """Gemma family: MQA + decoupled head_dim (4x16 != hidden 48) +
    GeGLU + sqrt(hidden)-scaled embeddings + (1+w) RMSNorm + tied
    embeddings — converted forward matches the torch model."""
    import torch

    path, hf_model = gemma_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.head_dim == 16 and cfg.head_dim_override == 16
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.scale_embeddings and cfg.rmsnorm_unit_offset
    assert cfg.tie_embeddings
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 250, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_gemma_decode_matches_full_forward(gemma_dir):
    """KV-cache greedy decode through the Gemma config (MQA path with
    head_dim override) matches lockstep full-sequence argmax."""
    path, _ = gemma_dir
    cfg, params = load_hf_decoder(path)
    from dalm_tpu.models.generate import build_greedy_generate

    rng = np.random.default_rng(1)
    P, new = 8, 4
    ids = np.zeros((2, P), np.int32)
    mask = np.zeros((2, P), np.int32)
    for i in range(2):
        real = int(rng.integers(4, P))
        ids[i, P - real:] = rng.integers(1, 250, size=real)
        mask[i, P - real:] = 1
    model = Decoder(cfg)
    gen = build_greedy_generate(model, new, eos_token_id=None, pad_token_id=0)
    out = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))

    # lockstep oracle: argmax of the full forward, fed back token by token
    cur_ids, cur_mask = ids.copy(), mask.copy()
    for t in range(new):
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(cur_ids), jnp.asarray(cur_mask)
        ))
        nxt = logits[np.arange(2), -1].argmax(-1).astype(np.int32)
        assert (nxt == out[:, t]).all(), f"token {t}"
        cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = np.concatenate([cur_mask, np.ones((2, 1), np.int32)], axis=1)


@pytest.fixture(scope="module")
def gemma2_dir(tmp_path_factory):
    # Small sliding window (6 < S) and a query scale decoupled from
    # head_dim (8 != 16) so alternation, softcap, and scale are all
    # load-bearing in the parity check. Eager attention: torch's sdpa
    # path drops attn softcapping.
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, max_position_embeddings=64,
        rms_norm_eps=1e-6, sliding_window=6, query_pre_attn_scalar=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager",
    )
    model = transformers.Gemma2ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_gemma2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_gemma2_logits_parity(gemma2_dir):
    """Gemma2: sandwich norms (4 per layer) + attn/final logit
    softcapping + query_pre_attn_scalar + sliding window on EVEN layers
    only — converted forward matches the torch model (HF
    `Gemma2ForCausalLM`; the reference loads generators via
    `AutoModelForCausalLM`, `dalm/models/rag_e2e_base_model.py:42-59`)."""
    import torch

    path, hf_model = gemma2_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.post_norms and cfg.sliding_layers == "even"
    assert cfg.attn_logit_softcap == 50.0 and cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 8 and cfg.head_dim == 16
    assert cfg.layer_window(0) == 6 and cfg.layer_window(1) is None
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 250, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def gemma3_dir(tmp_path_factory):
    # Everything load-bearing at once: QK-norm (randomized so it is not
    # an identity), dual rope with DIFFERENT bases (sliding layers at
    # 10k, full at 1e6) plus linear scaling factor 2 on the global rope
    # only, sliding window 6 < S on a 2-sliding:1-full layer pattern,
    # decoupled query scale (8 != head_dim 16).
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=48, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, max_position_embeddings=64,
        rms_norm_eps=1e-6, sliding_window=6, sliding_window_pattern=3,
        query_pre_attn_scalar=8, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        attn_implementation="eager",
    )
    model = transformers.Gemma3ForCausalLM(cfg)
    import torch

    with torch.no_grad():
        # zero-centered (1+w) norms init to 0 → identity; randomize the
        # q/k norms so the parity check actually exercises them
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(std=0.5)
            layer.self_attn.k_norm.weight.normal_(std=0.5)
    model.eval()
    d = tmp_path_factory.mktemp("hf_gemma3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_gemma3_logits_parity(gemma3_dir):
    """Gemma3 (text): per-head QK RMSNorm before rope + dual-theta rope
    (local 10k on sliding layers / global 1e6 with linear scaling on
    full layers) + layer_types sliding pattern — converted forward
    matches the torch model (HF `Gemma3ForCausalLM`)."""
    import torch

    path, hf_model = gemma3_dir
    cfg, params = load_hf_decoder(path)
    assert cfg.qk_norm and cfg.post_norms
    assert cfg.rope_local_theta == 10_000.0 and cfg.rope_theta == 1_000_000.0
    assert cfg.rope_scaling_factor == 2.0
    # sliding_window_pattern=3: layers 0,1 slide, layer 2 full, ...
    assert cfg.sliding_layers == (True, True, False, True, True, False)
    assert cfg.layer_window(0) == 6 and cfg.layer_window(2) is None
    # loaded q/k norm scales are the randomized ones, not zeros
    assert float(jnp.abs(params["layer_0"]["attention"]["q_norm"]["scale"]).max()) > 0
    model = Decoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 250, size=(2, 12)).astype(np.int64)  # 12 > window 6
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32))
    )
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=2e-3)


def test_gemma3_decode_matches_full_forward(gemma3_dir):
    """KV-cache greedy decode through gemma3 (dual rope + QK-norm +
    patterned window in slot space) matches lockstep full-sequence
    argmax, with left padding."""
    path, _ = gemma3_dir
    cfg, params = load_hf_decoder(path)
    from dalm_tpu.models.generate import build_greedy_generate

    rng = np.random.default_rng(1)
    P, new = 10, 4  # P > window 6 so the band actually clips history
    ids = np.zeros((2, P), np.int32)
    mask = np.zeros((2, P), np.int32)
    for i in range(2):
        real = int(rng.integers(7, P))
        ids[i, P - real:] = rng.integers(1, 250, size=real)
        mask[i, P - real:] = 1
    model = Decoder(cfg)
    gen = build_greedy_generate(model, new, eos_token_id=None, pad_token_id=0)
    out = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))

    cur_ids, cur_mask = ids.copy(), mask.copy()
    for t in range(new):
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(cur_ids), jnp.asarray(cur_mask)
        ))
        nxt = logits[np.arange(2), -1].argmax(-1).astype(np.int32)
        assert (nxt == out[:, t]).all(), f"token {t}"
        cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = np.concatenate([cur_mask, np.ones((2, 1), np.int32)], axis=1)


def test_gemma3_multimodal_rejected(tmp_path):
    """A bare 'gemma3' (multimodal wrapper) config is rejected loudly."""
    import json as _json

    (tmp_path / "config.json").write_text(_json.dumps({"model_type": "gemma3"}))
    (tmp_path / "model.safetensors").write_bytes(b"")
    with pytest.raises(ValueError, match="gemma3"):
        load_hf_decoder(str(tmp_path))


def test_gemma2_decode_matches_full_forward(gemma2_dir):
    """KV-cache greedy decode through gemma2 (alternating window in
    slot space, softcapped logits) matches lockstep full-sequence
    argmax, with left padding."""
    path, _ = gemma2_dir
    cfg, params = load_hf_decoder(path)
    from dalm_tpu.models.generate import build_greedy_generate

    rng = np.random.default_rng(1)
    P, new = 10, 4  # P > window 6 so the band actually clips history
    ids = np.zeros((2, P), np.int32)
    mask = np.zeros((2, P), np.int32)
    for i in range(2):
        real = int(rng.integers(7, P))
        ids[i, P - real:] = rng.integers(1, 250, size=real)
        mask[i, P - real:] = 1
    model = Decoder(cfg)
    gen = build_greedy_generate(model, new, eos_token_id=None, pad_token_id=0)
    out = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))

    cur_ids, cur_mask = ids.copy(), mask.copy()
    for t in range(new):
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(cur_ids), jnp.asarray(cur_mask)
        ))
        nxt = logits[np.arange(2), -1].argmax(-1).astype(np.int32)
        assert (nxt == out[:, t]).all(), f"token {t}"
        cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = np.concatenate([cur_mask, np.ones((2, 1), np.int32)], axis=1)
