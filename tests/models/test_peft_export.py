"""PEFT adapter interop: our LoRA adapters exported via
`export_peft_adapter` must load into torch PEFT and produce the SAME
merged forward as our merge path — the A/B-parity consumption route the
reference uses (`retriever_only_base_model.py:77-83`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dalm_tpu.models import lora as lora_mod  # noqa: E402
from dalm_tpu.models.decoder import Decoder  # noqa: E402
from dalm_tpu.models.encoder import Encoder  # noqa: E402
from dalm_tpu.models.hf_loader import (  # noqa: E402
    export_peft_adapter,
    load_hf_decoder,
    load_hf_encoder,
)


def _randomized_adapter(rng, params, spec):
    """LoRA tree with non-zero B so the merged delta is non-trivial."""
    flat = lora_mod.init_lora_params(jax.random.PRNGKey(0), params, spec)
    out = {}
    for k, ab in flat.items():
        out[k] = {
            "lora_a": jnp.asarray(rng.normal(0, 0.05, ab["lora_a"].shape), jnp.float32),
            "lora_b": jnp.asarray(rng.normal(0, 0.05, ab["lora_b"].shape), jnp.float32),
        }
    return out


def test_bert_peft_roundtrip(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf_model = transformers.BertModel(cfg)
    hf_model.eval()
    hf_dir = tmp_path / "bert"
    hf_model.save_pretrained(hf_dir, safe_serialization=True)

    our_cfg, params = load_hf_encoder(str(hf_dir))
    enc = Encoder(our_cfg)
    spec = lora_mod.LoraSpec.for_encoder()
    adapter = _randomized_adapter(np.random.default_rng(0), params, spec)

    ids = np.random.default_rng(1).integers(1, 120, size=(2, 10))
    mask = np.ones((2, 10), np.int64)

    merged = lora_mod.merge_lora(params, adapter, spec, None)
    ours = np.asarray(
        enc.apply({"params": merged}, jnp.asarray(ids), jnp.asarray(mask), deterministic=True)
    )

    out_dir = tmp_path / "adapter"
    export_peft_adapter(str(out_dir), jax.device_get(adapter), spec, arch="bert")
    peft_model = peft.PeftModel.from_pretrained(hf_model, str(out_dir))
    peft_model = peft_model.merge_and_unload()
    peft_model.eval()
    with torch.no_grad():
        theirs = peft_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_llama_peft_roundtrip(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    hf_model = transformers.LlamaForCausalLM(cfg)
    hf_model.eval()
    hf_dir = tmp_path / "llama"
    hf_model.save_pretrained(hf_dir, safe_serialization=True)

    our_cfg, params = load_hf_decoder(str(hf_dir))
    dec = Decoder(our_cfg)
    spec = lora_mod.LoraSpec.for_causal_lm()
    adapter = _randomized_adapter(np.random.default_rng(2), params, spec)

    ids = np.array([[1, 5, 9, 22, 54, 13]])
    mask = np.ones_like(ids)

    merged = lora_mod.merge_lora(params, adapter, spec, None)
    ours = np.asarray(dec.apply({"params": merged}, jnp.asarray(ids), jnp.asarray(mask)))

    out_dir = tmp_path / "adapter"
    export_peft_adapter(str(out_dir), jax.device_get(adapter), spec, arch="llama")
    peft_model = peft.PeftModel.from_pretrained(hf_model, str(out_dir))
    peft_model = peft_model.merge_and_unload()
    peft_model.eval()
    with torch.no_grad():
        theirs = peft_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_trainer_export_flag(toy_csv, tmp_path):
    """train_retriever(..., export_peft=True) drops a PEFT-layout adapter
    next to the native one."""
    import os

    from dalm_tpu.train.retriever_only import train_retriever

    out = str(tmp_path / "out")
    train_retriever(
        "tiny", toy_csv, per_device_train_batch_size=2, num_train_epochs=1,
        output_dir=out, query_max_len=16, passage_max_len=16,
        with_tracking=False, use_peft=True, use_dropout=False, export_peft=True,
    )
    rdir = os.path.join(out, "retriever")
    assert os.path.exists(os.path.join(rdir, "adapter_model.bin"))
    assert os.path.exists(os.path.join(rdir, "adapter_params.msgpack"))
    import json

    with open(os.path.join(rdir, "adapter_config.json")) as f:
        cfg = json.load(f)
    # the PEFT export overwrote/extended the config with PEFT keys
    assert cfg["r"] == 8 and "target_modules" in cfg
