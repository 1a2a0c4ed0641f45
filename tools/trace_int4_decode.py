"""Trace-attribute the int4 7B decode step: what actually dominates?

The dequant-variant A/B (base/groupmm/decomp totals within 0.5%,
`results_r3_int4_variants.log`) says the scale math is NOT the
bottleneck; candidates are the common nibble unpack, DMA, or
per-grid-step overhead. The one-hot KV-write fix (commit 6098ee1)
moved int4 7B decode 859 -> 1187 tok/s, so part of the earlier
"dequant VPU tax" attribution was actually the KV write — this trace
re-attributes the post-fix step. Captures a 16-token fused decode run
under jax.profiler and attributes device time by op via
tools/trace_attribution.py.

Recorded result (round 3, post-fix HEAD): program 591 ms / 16 steps =
36.9 ms traced step (prefill conds included); `_int4_matmul_fwd_pallas`
= 379 ms = 64% of device time, ~30x the packed-bytes DMA floor — the
in-kernel VPU unpack is the int4-vs-int8 residual gap.

Run from repo root on the TPU box: python tools/trace_int4_decode.py
"""
import dataclasses
import os
import subprocess
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.decode_engine import DecodeEngine
from dalm_tpu.models import lora as lora_mod
from dalm_tpu.models import qlora as qlora_mod

P, MAX_NEW, SLOTS = 64, 128, 32
cfg = dataclasses.replace(
    DecoderConfig.llama2_7b(), dtype=jnp.bfloat16, int8_compute=None
)
generator = Decoder(cfg)
ids16 = jnp.zeros((1, 16), jnp.int32)
residual, quant, lora = qlora_mod.init_packed_on_device(
    generator, jax.random.PRNGKey(0), (ids16, jnp.ones_like(ids16)),
    spec=lora_mod.LoraSpec.for_causal_lm(), quantize="int4",
)
eng = DecodeEngine(
    generator, residual, num_slots=SLOTS, max_prompt_len=P,
    max_new_tokens=MAX_NEW, eos_token_id=None, pad_token_id=0,
    extra_collections={"quant": quant, "lora": lora},
)
rng = np.random.default_rng(0)
prompts = rng.integers(5, 30000, size=(SLOTS, P)).astype(np.int32)
mask = np.ones((SLOTS, P), np.int32)

# warm the fused program with a tiny budget run, then trace a longer one
_ = eng.generate_fused(prompts, mask, budgets=np.full(SLOTS, 4))
out_dir = "/tmp/int4_trace"
jax.profiler.start_trace(out_dir)
t0 = time.perf_counter()
_ = eng.generate_fused(prompts, mask, budgets=np.full(SLOTS, 16))
dt = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"traced 16-token fused run: {dt:.3f}s ({dt/16*1e3:.1f} ms/step-ish)")
subprocess.run(
    [sys.executable, "tools/trace_attribution.py", out_dir, "--steps", "16", "--top", "25"]
)
