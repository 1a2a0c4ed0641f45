import time, dataclasses, jax, jax.numpy as jnp
t0 = time.time()
from dalm_tpu.models.encoder import EncoderConfig, Encoder
from dalm_tpu.models import lora as lora_mod
from dalm_tpu.models.qlora import init_packed_on_device
print(f"imports {time.time()-t0:.1f}s", flush=True)
r_cfg = dataclasses.replace(EncoderConfig.bge_small(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
enc = Encoder(r_cfg)
ids8 = jnp.zeros((1, 8), jnp.int32); ones8 = jnp.ones((1, 8), jnp.int32)
t0 = time.time()
res, quant, lora = init_packed_on_device(enc, jax.random.PRNGKey(0), (ids8, ones8),
    spec=lora_mod.LoraSpec.for_encoder(), quantize=False)
jax.block_until_ready(jax.tree.leaves(res)[0])
print(f"bge-small packed init {time.time()-t0:.1f}s", flush=True)
