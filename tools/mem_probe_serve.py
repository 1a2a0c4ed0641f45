"""HBM composition probe for the long-context serve arms.

The P=1024 MLA arms OOM at 96 slots even though naive accounting
(int8 weights ~5.9 GB + latent cache ~0.13 GB + chunked-prefill temps
~1 GB) says ~8 GB — something large is unaccounted. This probe builds
the same engine as bench_serve.bench_7b_decode, runs one fused call,
and prints the device allocator's view (memory_stats / top live
buffers via device_memory_profile when available).

Usage: DALM_SLOTS=64 DALM_PROMPT_LEN=1024 DALM_PREFILL_CHUNK=64 \
       python tools/mem_probe_serve.py
"""

import os
import sys

import numpy as np


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import dataclasses

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dalm_tpu.models import lora as lora_mod
    from dalm_tpu.models import qlora as qlora_mod
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.decoder import Decoder, DecoderConfig

    P = int(os.environ.get("DALM_PROMPT_LEN", "1024"))
    slots = int(os.environ.get("DALM_SLOTS", "64"))
    pchunk = int(os.environ.get("DALM_PREFILL_CHUNK", "64")) or None
    awidth = int(os.environ.get("DALM_ADMIT_WIDTH", "0")) or None
    MAX_NEW = 128

    def stats(tag: str) -> None:
        dev = jax.devices()[0]
        ms = getattr(dev, "memory_stats", lambda: None)()
        if ms:
            keys = [
                "bytes_in_use", "peak_bytes_in_use", "largest_alloc_size",
                "bytes_limit", "num_allocs",
            ]
            print(f"[{tag}] " + " ".join(
                f"{k}={ms[k]/2**30:.3f}G" if "bytes" in k or "size" in k
                else f"{k}={ms[k]}"
                for k in keys if k in ms
            ))
        else:
            print(f"[{tag}] memory_stats unavailable")

    cfg = dataclasses.replace(
        DecoderConfig.deepseek_v3_mid_7b(), dtype=jnp.bfloat16,
        int8_compute="fwd",
    )
    generator = Decoder(cfg)
    ids16 = jnp.zeros((1, 16), jnp.int32)
    stats("before-init")
    residual, quant, lora = qlora_mod.init_packed_on_device(
        generator, jax.random.PRNGKey(0), (ids16, jnp.ones_like(ids16)),
        spec=lora_mod.LoraSpec.for_causal_lm(),
        quantize=True,
    )
    jax.block_until_ready(quant)
    stats("after-pack")

    def tree_gb(t):
        return sum(
            x.nbytes for x in jax.tree.leaves(t) if hasattr(x, "nbytes")
        ) / 2**30

    print(f"residual={tree_gb(residual):.3f}G quant={tree_gb(quant):.3f}G "
          f"lora={tree_gb(lora):.3f}G")

    eng = DecodeEngine(
        generator, residual, num_slots=slots, max_prompt_len=P,
        max_new_tokens=MAX_NEW, eos_token_id=None, pad_token_id=0,
        extra_collections={"quant": quant, "lora": lora},
        prefill_chunk=pchunk, admit_width=awidth,
    )
    print(f"engine host-state cache={tree_gb(eng.state[0]):.3f}G "
          f"(slots={slots}, L={eng.L})")
    stats("after-engine-ctor")

    rng = np.random.default_rng(0)
    N = 2 * slots
    p_ids = rng.integers(5, 31000, size=(N, P)).astype(np.int32)
    p_mask = np.ones((N, P), np.int32)
    outs = eng.generate_fused(p_ids, p_mask)
    print(f"fused ok: {sum(len(o) for o in outs)} tokens")
    stats("after-fused")


if __name__ == "__main__":
    main()
