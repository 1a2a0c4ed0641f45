"""Speculative decoding measured WINNING (VERDICT r4 item 3).

Both round-4 serve recordings priced speculation at the zero-acceptance
floor: random 7B weights never ratify a draft, so the A/B measured pure
verification overhead (break-even ≈1.6 accepted/pass). This bench runs
the SAME fused-schedule A/B on a generator that actually accepts:
the pretrained-proxy copy generator (experiments/proxy_base/generator —
trained by pretrain_proxy.py --with-generator on the answer-copy task,
where answers quote passage keywords verbatim: exactly prompt-lookup's
regime, and the recorded CPU acceptance is 3.3+ tokens/pass).

Arms (same weights, same 128-request ragged workload, one chip):
  1. lockstep speculative stats — tokens/verification-pass on this
     workload (the acceptance number; exact-vs-greedy asserted)
  2. fused continuous batching, gamma=0 (baseline tok/s)
  3. fused continuous batching, gamma=4 and gamma=8 (tok/s + equality)

Prints one JSON line per arm. NOTE the regime caveat, recorded with the
numbers: a tiny generator's verify forward is dispatch-bound, not
HBM-bound like 7B decode — the tok/s ratio here measures speculation's
scheduling win (fewer device round-trips per emitted token); the 7B
weight-traffic win remains gated on real weights (acceptance there needs
a checkpoint that actually copies).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PREP_DIR = "experiments/spec_win"


def prepare() -> None:
    """Train the quoting generator: rag-e2e on a corpus whose Answer IS
    the passage sentence (full-quote — the regime real RAG answers
    approximate when they cite retrieved text). Writes the generator and
    the held-out serve rows under experiments/spec_win/."""
    import logging

    logging.disable(logging.WARNING)
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
    from datasets import Dataset

    from quality_directional import make_corpus, title_split

    from dalm_tpu.train.rag_e2e import train_e2e

    rows = make_corpus(4096, seed=7)
    for r in rows:
        r["Answer"] = r["Abstract"]  # full-quote answers
    train_rows, test_rows = title_split(rows)
    os.makedirs(PREP_DIR, exist_ok=True)
    with open(os.path.join(PREP_DIR, "test_rows.json"), "w") as f:
        json.dump(test_rows[:256], f)
    out = train_e2e(
        Dataset.from_list(train_rows), "tiny", "tiny",
        per_device_train_batch_size=32, num_train_epochs=8, learning_rate=1e-3,
        query_max_len=50, passage_max_len=128, generator_max_len=256,
        output_dir=os.path.join(PREP_DIR, "model"),
        with_tracking=False, use_dropout=False, num_warmup_steps=0, seed=42,
    )
    print(json.dumps({"prepare_final_loss": out["final_loss"], "steps": out["steps"]}))


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax

    if "--cpu" in sys.argv:  # smoke-test mode (conftest recipe)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from quality_directional import make_corpus

    from dalm_tpu.data.tokenizer import ByteTokenizer
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.generate import build_greedy_generate
    from dalm_tpu.models.registry import build_decoder, resolve_decoder
    from dalm_tpu.models.speculative import build_speculative_generate

    prep_rows = os.path.join(PREP_DIR, "test_rows.json")
    if os.path.exists(prep_rows):
        # the full-quote generator from --prepare + its held-out rows
        gen_dir = os.path.join(PREP_DIR, "model", "generator")
        with open(prep_rows) as f:
            rows = json.load(f)
        P, MAX_NEW, SLOTS = 256, 96, 64
    else:
        # fallback: the pretrained-proxy copy generator (short keyword
        # answers — acceptance hovers at break-even, recorded as such)
        gen_dir = os.environ.get("DALM_SPEC_GEN", "experiments/proxy_base/generator")
        with open(os.environ.get("DALM_SPEC_META", "experiments/proxy_base/meta.json")) as f:
            meta = json.load(f)
        rows = make_corpus(256, seed=999, vocab=(meta["keywords"], meta["synonyms"]))
        P, MAX_NEW, SLOTS = 192, 48, 64

    cfg, params = resolve_decoder(gen_dir)
    dec = build_decoder(cfg)

    tok = ByteTokenizer()
    tok.padding_side = "left"
    N = 128
    prompts = [
        f"#query# {r['Question']} #passage# {r['Abstract']} #answer# "
        for r in rows[:N]
    ]
    t = tok(prompts, padding="max_length", max_length=P, truncation=True)
    ids = np.asarray(t["input_ids"], np.int32)
    mask = np.asarray(t["attention_mask"], np.int32)

    # ---- arm 1: acceptance on this workload (lockstep, exactness) ------
    greedy = build_greedy_generate(dec, MAX_NEW, eos_token_id=None, pad_token_id=0)
    want = np.asarray(greedy(params, jnp.asarray(ids[:32]), jnp.asarray(mask[:32])))
    for gamma in (4, 8):
        spec = build_speculative_generate(
            dec, MAX_NEW, eos_token_id=None, pad_token_id=0,
            gamma=gamma, return_stats=True,
        )
        got, passes = spec(params, jnp.asarray(ids[:32]), jnp.asarray(mask[:32]))
        got, passes = np.asarray(got), np.asarray(passes)
        tpp = MAX_NEW / np.maximum(passes, 1)
        print(json.dumps({
            "metric": f"spec_acceptance_tokens_per_pass[copy-generator,gamma={gamma},prompt-lookup]",
            "value": round(float(tpp.mean()), 2),
            "unit": "tokens/verification-pass",
            "vs_baseline": None,
            "exact_vs_greedy": bool(np.array_equal(got, want)),
            "passes_mean": round(float(passes.mean()), 2),
            "break_even_greedy": 1.6,
        }), flush=True)

    # ---- arms 2+3: fused continuous-batching tok/s, gamma on/off -------
    results = {}
    for gamma in (0, 4, 8):
        eng = DecodeEngine(
            dec, params, num_slots=SLOTS, max_prompt_len=P,
            max_new_tokens=MAX_NEW, eos_token_id=None, pad_token_id=0,
            speculative_gamma=gamma,
        )
        _ = eng.generate_fused(ids, mask)  # warm/compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = eng.generate_fused(ids, mask)
            best = min(best, time.perf_counter() - t0)
        total = sum(len(o) for o in outs)
        assert total == N * MAX_NEW
        results[gamma] = (total / best, outs)
        del eng
    base_tps, base_outs = results[0]
    for gamma in (4, 8):
        tps, outs = results[gamma]
        mismatches = sum(a != b for a, b in zip(outs, base_outs))
        print(json.dumps({
            "metric": f"spec_serve_tokens_per_sec[copy-generator,fused-continuous-batching,{SLOTS}-slots,gamma={gamma}]",
            "value": round(tps, 1),
            "unit": "tokens/sec/chip",
            "vs_baseline": round(tps / base_tps, 3),
            "gamma0_tokens_per_sec": round(base_tps, 1),
            "greedy_mismatch_requests": mismatches,
        }), flush=True)


if __name__ == "__main__":
    if "--prepare" in sys.argv:
        prepare()
    else:
        main()
