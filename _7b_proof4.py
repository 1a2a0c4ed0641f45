"""7B on one chip, take 4: single-program on-device packed init."""
import dataclasses, time, numpy as np, jax, jax.numpy as jnp, optax
from functools import partial
from dalm_tpu.models.encoder import EncoderConfig, Encoder
from dalm_tpu.models.decoder import DecoderConfig, Decoder
from dalm_tpu.models import lora as lora_mod
from dalm_tpu.models.qlora import init_packed_on_device
from dalm_tpu.models.pooling import mean_pool_l2
from dalm_tpu.losses.contrastive import contrastive_loss
from dalm_tpu.losses.marginalized import marginalized_nll_loss
from dalm_tpu.train.state import TrainState
from __graft_entry__ import _example_batch

B, QL, PL, GL = 18, 50, 128, 256
r_cfg = dataclasses.replace(EncoderConfig.bge_large(), dtype=jnp.bfloat16,
                            param_dtype=jnp.bfloat16, hidden_dropout=0.0, attention_dropout=0.0)
g_cfg = dataclasses.replace(DecoderConfig.llama2_7b(), dtype=jnp.bfloat16,
                            param_dtype=jnp.bfloat16, remat=True)
encoder, decoder = Encoder(r_cfg), Decoder(g_cfg)
ids8 = jnp.zeros((1, 8), jnp.int32); ones8 = jnp.ones((1, 8), jnp.int32)

t0 = time.time()
enc_res, enc_quant, enc_lora = init_packed_on_device(
    encoder, jax.random.PRNGKey(0), (ids8, ones8),
    spec=lora_mod.LoraSpec.for_encoder(), quantize=False)
print(f"encoder packed {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
dec_res, dec_quant, dec_lora = init_packed_on_device(
    decoder, jax.random.PRNGKey(1), (ids8, ones8),
    spec=lora_mod.LoraSpec.for_causal_lm(), quantize=True)
print(f"decoder(7B) packed {time.time()-t0:.0f}s", flush=True)

lora = {"retriever": enc_lora, "generator": dec_lora}
state = TrainState.create(lora, optax.adam(1e-4))

frozen = {"enc_res": enc_res, "enc_quant": enc_quant, "dec_res": dec_res, "dec_quant": dec_quant}

def loss_fn(lora, frozen, batch):
    def embed(i, m):
        h = encoder.apply({"params": frozen["enc_res"], "quant": frozen["enc_quant"],
                           "lora": lora["retriever"]}, i, m)
        return mean_pool_l2(h, m)
    q = embed(batch["retriever_query_input_ids"], batch["retriever_query_attention_mask"])
    p = embed(batch["retriever_passage_input_ids"], batch["retriever_passage_attention_mask"])
    r_loss, sim = contrastive_loss(q.astype(jnp.float32), p.astype(jnp.float32), 100.0)
    logits = decoder.apply({"params": frozen["dec_res"], "quant": frozen["dec_quant"],
                            "lora": lora["generator"]},
                           batch["generator_input_input_ids"], batch["generator_input_attention_mask"])
    g_loss = marginalized_nll_loss(logits, batch["generator_input_input_ids"],
        batch["generator_input_attention_mask"], sim, batch["query_passage_input_len"])
    return r_loss + g_loss

@partial(jax.jit, donate_argnums=(0,))
def train_step(state, frozen, batch):
    loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch)
    return state.apply_gradients(grads), loss

batch = {k: jnp.asarray(v) for k, v in _example_batch(np.random.default_rng(0), B, 30000, QL, PL, GL).items()}
print("compiling...", flush=True)
t0 = time.time()
state, loss = train_step(state, frozen, batch)
print(f"compile+step1 {time.time()-t0:.0f}s loss {float(loss):.3f}", flush=True)
t0 = time.time()
for _ in range(3):
    state, loss = train_step(state, frozen, batch)
lf = float(loss); dt = (time.time()-t0)/3
print(f"RESULT 7B fused-QLoRA 1xv5e: {dt*1000:.0f} ms/step = {B/dt:.2f} samples/sec/chip (loss {lf:.3f})", flush=True)
