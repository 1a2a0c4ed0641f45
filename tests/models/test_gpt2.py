"""GPT-2 family: HF parity + cache equivalence."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dalm_tpu.models.gpt2 import GPT2Decoder, load_hf_gpt2  # noqa: E402


@pytest.fixture(scope="module")
def gpt2_dir(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=128, n_embd=32, n_layer=2, n_head=2, n_positions=64,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_gpt2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_gpt2_logits_parity(gpt2_dir):
    path, hf_model = gpt2_dir
    cfg, params = load_hf_gpt2(path)
    dec = GPT2Decoder(cfg)
    ids = np.array([[3, 17, 9, 41, 5]])
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    ours = np.asarray(dec.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4)


def test_gpt2_kv_cache_matches_full(gpt2_dir):
    path, _ = gpt2_dir
    cfg, params = load_hf_gpt2(path)
    dec = GPT2Decoder(cfg)
    T = 6
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9]])
    mask = jnp.ones((1, T), jnp.int32)
    full = np.asarray(dec.apply({"params": params}, ids, mask))
    cache = dec.init_kv_cache(1, T)
    outs = []
    for t in range(T):
        logits, cache = dec.apply(
            {"params": params}, ids[:, t : t + 1], jnp.ones((1, T), jnp.int32),
            kv_cache=cache, cache_index=t,
        )
        outs.append(np.asarray(logits)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), full, atol=2e-4)
