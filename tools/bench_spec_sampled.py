"""Serve A/B: sampled speculative decoding vs plain sampled decoding.

VERDICT r3 #7 asked the rejection-sampling verifier (models/speculative.py
`rejection_verify`) for a serve-level A/B alongside its distribution-
exactness tests. This runs the 7B-shape int8 continuous-batching engine
(the bench_serve.py methodology) on a speculation-friendly workload —
period-3 repetitive prompts, the regime where prompt-lookup drafts
verify in spans (RAG answers quoting passages behave the same) — and
prints tokens/sec for {greedy, sampled(T=0.8, top-k=40)} x {gamma=0,
gamma=8}. The sampled column pays the rejection-verification math
(filtered softmax + two keyed draws per position) on top of the greedy
verifier; the A/B records what that costs at serving shape.

Usage: python tools/bench_spec_sampled.py [--preset llama2-7B] [--slots 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama2-7b")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=8)
    args = ap.parse_args()

    import logging

    logging.disable(logging.WARNING)
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dalm_tpu.models import lora as lora_mod
    from dalm_tpu.models import qlora as qlora_mod
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.decoder import Decoder
    from dalm_tpu.models.registry import DECODER_PRESETS
    from dalm_tpu.models.sampling import SamplerConfig

    P = 64
    cfg = dataclasses.replace(
        DECODER_PRESETS[args.preset](), dtype=jnp.bfloat16, int8_compute="fwd"
    )
    generator = Decoder(cfg)
    ids16 = jnp.zeros((1, 16), jnp.int32)
    residual, quant, lora = qlora_mod.init_packed_on_device(
        generator, jax.random.PRNGKey(0), (ids16, jnp.ones_like(ids16)),
        spec=lora_mod.LoraSpec.for_causal_lm(), quantize=True,
    )
    extra = {"quant": quant, "lora": lora}

    # period-3 repetitive prompts: the speculation-friendly regime
    rng = np.random.default_rng(0)
    N = 2 * args.slots
    p_ids = np.zeros((N, P), np.int32)
    for i in range(N):
        pat = rng.integers(5, min(31000, cfg.vocab_size - 1), size=3)
        p_ids[i] = np.tile(pat, P // 3 + 1)[:P]
    p_mask = np.ones((N, P), np.int32)

    rows = [
        ("greedy", None, 0),
        ("greedy+spec", None, args.gamma),
        ("sampled", SamplerConfig(temperature=0.8, top_k=40, seed=3), 0),
        ("sampled+spec", SamplerConfig(temperature=0.8, top_k=40, seed=3), args.gamma),
    ]
    for tag, samp, gamma in rows:
        eng = DecodeEngine(
            generator, residual, num_slots=args.slots, max_prompt_len=P,
            max_new_tokens=args.max_new, eos_token_id=None, pad_token_id=0,
            extra_collections=extra, sampler=samp, speculative_gamma=gamma,
        )
        _ = eng.generate_fused(p_ids, p_mask)  # compile at the TIMED shape
        t0 = time.perf_counter()
        outs = eng.generate_fused(p_ids, p_mask)
        dt = time.perf_counter() - t0
        total = sum(len(o) for o in outs)
        assert total == N * args.max_new
        print(
            json.dumps(
                {
                    "metric": f"decode_tokens_per_sec_per_chip[{args.preset}-shape,int8,{tag},gamma={gamma},repetitive,{args.slots}-slots]",
                    "value": round(total / dt / jax.device_count(), 1),
                    "unit": "tokens/sec/chip",
                    "vs_baseline": None,
                }
            )
        )
        del eng


if __name__ == "__main__":
    main()
