"""Speculative-decoding acceptance on a TRAINED RAG generator.

Runs prompt-lookup speculative decode (models/speculative.py) with the
rag-e2e-trained tiny generator from the quality_directional experiment
and measures tokens emitted per verification pass on UNSEEN queries —
the quantity that sets the serving speedup (each pass costs one
HBM-bound forward; see RESULTS.md for the 7B pass-overhead numbers).

Usage::

    python experiments/quality_directional.py --out experiments/results_int8 ...
    python experiments/speculative_acceptance.py \
        --generator experiments/results_int8/rag_e2e_s42/generator

Recorded run (CPU mesh, f32 — outputs exact vs greedy):
    gamma=4: 3.34 tokens/pass mean (48 tokens in 14.5 passes), max 4.00
    gamma=8: 3.38 tokens/pass mean, max 4.00
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generator", default="experiments/results_int8/rag_e2e_s42/generator")
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--cpu-mesh", action="store_true")
    args = ap.parse_args()

    if args.cpu_mesh:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "experiments")
    from quality_directional import make_corpus

    from dalm_tpu.data.tokenizer import ByteTokenizer
    from dalm_tpu.models.generate import build_greedy_generate
    from dalm_tpu.models.registry import build_decoder, resolve_decoder
    from dalm_tpu.models.speculative import build_speculative_generate

    cfg, params = resolve_decoder(args.generator)
    dec = build_decoder(cfg)
    rows = make_corpus(64, seed=99)  # unseen keyword recombinations
    tok = ByteTokenizer()
    tok.padding_side = "left"
    prompts = [
        f"#query# {r['Question']} #passage# {r['Abstract']} #answer# "
        for r in rows[: args.queries]
    ]
    t = tok(prompts, padding="max_length", max_length=192, truncation=True)
    ids = np.asarray(t["input_ids"], np.int32)
    mask = np.asarray(t["attention_mask"], np.int32)

    greedy = build_greedy_generate(dec, args.max_new, eos_token_id=None, pad_token_id=0)
    want = np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask)))
    results = {}
    for gamma in (4, 8):
        spec = build_speculative_generate(
            dec, args.max_new, eos_token_id=None, pad_token_id=0,
            gamma=gamma, return_stats=True,
        )
        got, passes = spec(params, jnp.asarray(ids), jnp.asarray(mask))
        got, passes = np.asarray(got), np.asarray(passes)
        tpp = args.max_new / np.maximum(passes, 1)  # max-new 1 -> 0 passes
        results[f"gamma={gamma}"] = {
            "exact_vs_greedy": bool(np.array_equal(got, want)),
            "passes_mean": float(passes.mean()),
            "tokens_per_pass_mean": float(tpp.mean()),
            "tokens_per_pass_max": float(tpp.max()),
        }
        print(json.dumps({f"gamma={gamma}": results[f"gamma={gamma}"]}))


if __name__ == "__main__":
    main()
