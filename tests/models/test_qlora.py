"""Fused QLoRA path: numeric equivalence with merge-based LoRA, gradient
isolation, and memory-shape sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models import lora as lora_mod
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.qlora import (
    init_params_leafwise,
    init_qlora_factors,
    pack_qlora_frozen,
)


def _setup():
    cfg = DecoderConfig.tiny()
    model = Decoder(cfg)
    ids = jnp.asarray([[5, 6, 7, 8, 9, 10, 11, 12]])
    mask = jnp.ones_like(ids)
    params = unbox(model.init(jax.random.PRNGKey(0), ids, mask)["params"])
    return model, params, ids, mask


def test_fused_unquantized_matches_merge():
    model, params, ids, mask = _setup()
    spec = lora_mod.LoraSpec.for_causal_lm(rank=4, alpha=8.0)

    # merge-based path
    merge_lora = lora_mod.init_lora_params(jax.random.PRNGKey(1), params, spec)
    merged = lora_mod.merge_lora(params, merge_lora, spec)
    out_merge = model.apply({"params": merged}, ids, mask)

    # fused path with the SAME factors (a scaled by alpha/r, b as-is)
    residual, quant = pack_qlora_frozen(params, quantize=False, min_size=1)
    lora_tree: dict = {}
    from dalm_tpu.models.qlora import _set

    for path_str, ab in merge_lora.items():
        module_path = tuple(path_str.split("/"))[:-1]
        _set(lora_tree, module_path + ("a",), ab["lora_a"] * spec.scaling)
        _set(lora_tree, module_path + ("b",), ab["lora_b"])

    out_fused = model.apply({"params": residual, "quant": quant, "lora": lora_tree}, ids, mask)
    # bf16 quant-storage rounding is the only difference
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_merge), atol=2e-2, rtol=1e-2)


def test_fused_quantized_runs_and_is_close():
    model, params, ids, mask = _setup()
    spec = lora_mod.LoraSpec.for_causal_lm(rank=4)
    residual, quant = pack_qlora_frozen(params, quantize=True, min_size=1)
    lora_tree = init_qlora_factors(jax.random.PRNGKey(2), params, spec)
    out = model.apply({"params": residual, "quant": quant, "lora": lora_tree}, ids, mask)
    base = model.apply({"params": params}, ids, mask)
    # b=0 → lora is a no-op; only int8 error remains
    cos = np.sum(np.asarray(out) * np.asarray(base), -1) / (
        np.linalg.norm(np.asarray(out), axis=-1) * np.linalg.norm(np.asarray(base), axis=-1)
    )
    assert (cos > 0.99).all()


def test_gradients_flow_only_to_lora():
    model, params, ids, mask = _setup()
    spec = lora_mod.LoraSpec.for_causal_lm(rank=4)
    residual, quant = pack_qlora_frozen(params, quantize=True, min_size=1)
    lora_tree = init_qlora_factors(jax.random.PRNGKey(3), params, spec)

    def loss(lora):
        logits = model.apply({"params": residual, "quant": quant, "lora": lora}, ids, mask)
        return (logits.astype(jnp.float32) ** 2).mean()

    grads = jax.grad(loss)(lora_tree)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert any(n > 0 for n in norms)
    # structure matches the lora tree exactly
    assert jax.tree_util.tree_structure(grads) == jax.tree_util.tree_structure(lora_tree)


def test_residual_tree_shrinks():
    model, params, ids, mask = _setup()
    residual, quant = pack_qlora_frozen(params, quantize=True, min_size=1)
    n_full = len(jax.tree.leaves(params))
    n_res = len(jax.tree.leaves(residual))
    assert n_res < n_full
    # all big kernels became int8
    q_leaves = [x for x in jax.tree.leaves(quant) if hasattr(x, "dtype") and x.dtype == jnp.int8]
    assert len(q_leaves) > 0


def test_leafwise_init_shapes_match():
    cfg = DecoderConfig.tiny()
    model = Decoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    ref = unbox(model.init(jax.random.PRNGKey(0), ids, mask)["params"])
    leafwise = init_params_leafwise(model, jax.random.PRNGKey(0), (ids, mask), dtype=jnp.bfloat16)
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(leafwise)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(leafwise)):
        assert a.shape == b.shape
        assert b.dtype == jnp.bfloat16
    # model actually runs with the leafwise params
    out = model.apply({"params": leafwise}, ids, mask)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_load_hf_decoder_packed(tmp_path):
    """HF checkpoint → packed storage; forward stays close to full load."""
    import pytest

    transformers = pytest.importorskip("transformers")
    cfg_hf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    hf_model = transformers.LlamaForCausalLM(cfg_hf)
    hf_model.save_pretrained(tmp_path, safe_serialization=True)

    from dalm_tpu.models.hf_loader import load_hf_decoder
    from dalm_tpu.models.qlora import load_hf_decoder_packed

    cfg, params = load_hf_decoder(str(tmp_path))
    model = Decoder(cfg)
    ids = jnp.asarray([[1, 5, 9, 22]])
    mask = jnp.ones_like(ids)
    full = model.apply({"params": params}, ids, mask)

    cfg2, residual, quant, lora = load_hf_decoder_packed(
        str(tmp_path), spec=lora_mod.LoraSpec.for_causal_lm(rank=2),
        quantize=True, min_size=1, dtype=jnp.float32,
    )
    packed_model = Decoder(cfg2)
    packed = packed_model.apply({"params": residual, "quant": quant, "lora": lora}, ids, mask)
    a = np.asarray(full)
    b = np.asarray(packed)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.98).all()
