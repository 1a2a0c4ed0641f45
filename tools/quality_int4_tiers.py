"""4-bit storage-tier QUALITY A/B (the quality arm of VERDICT r4 #4).

The per-column-scale int4 layout (`quantize="int4pc"`) buys full-depth
int8 MXU dots at coarser quantization (one scale per output channel vs
per-group-64). The serve A/B (run_chip_queue_r5c.sh) prices its tok/s;
THIS harness prices its quality, on a trained generator rather than
synthetic normals: the full-quote rag-e2e generator from
`bench_spec_win.py --prepare` (falls back to the proxy copy generator),
evaluated on held-out rows.

Per tier (bf16 packed / int8 / int4 per-group / int4pc / nf4):
  - mean gold-answer NLL (teacher-forced — the tier's real numeric cost)
  - greedy-output exact-match rate vs the UNQUANTIZED forward
Prints one JSON line per tier. CPU-able (tiny model); pass --cpu off
the chip.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREP_DIR = "experiments/spec_win"


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from dalm_tpu.data.tokenizer import ByteTokenizer
    from dalm_tpu.models.generate import build_greedy_generate
    from dalm_tpu.models.qlora import pack_qlora_frozen
    from dalm_tpu.models.registry import build_decoder, resolve_decoder

    prep_rows = os.path.join(PREP_DIR, "test_rows.json")
    if os.path.exists(prep_rows):
        gen_dir = os.path.join(PREP_DIR, "model", "generator")
        with open(prep_rows) as f:
            rows = json.load(f)
        P, MAX_NEW = 256, 96
    else:
        from quality_directional import make_corpus

        with open("experiments/proxy_base/meta.json") as f:
            meta = json.load(f)
        gen_dir = "experiments/proxy_base/generator"
        rows = make_corpus(256, seed=999, vocab=(meta["keywords"], meta["synonyms"]))
        P, MAX_NEW = 192, 48

    cfg, params = resolve_decoder(gen_dir)
    dec = build_decoder(cfg)
    tok = ByteTokenizer()
    tok.padding_side = "left"
    N = 64
    prompts = [f"#query# {r['Question']} #passage# {r['Abstract']} #answer# " for r in rows[:N]]
    answers = [r["Answer"] for r in rows[:N]]
    t = tok(prompts, padding="max_length", max_length=P, truncation=True)
    ids = np.asarray(t["input_ids"], np.int32)
    mask = np.asarray(t["attention_mask"], np.int32)

    # teacher-forced gold-answer NLL: full sequence = prompt + answer
    full = [p + a for p, a in zip(prompts, answers)]
    tf = tok(full, padding="max_length", max_length=P + MAX_NEW, truncation=True)
    f_ids = jnp.asarray(np.asarray(tf["input_ids"], np.int32))
    f_mask = jnp.asarray(np.asarray(tf["attention_mask"], np.int32))
    # answer region = positions past the prompt's real length (left pad)
    ans_len = np.asarray([min(len(a), MAX_NEW) for a in answers])
    pos = np.arange(P + MAX_NEW)[None, :]
    total = f_mask.sum(axis=1)
    ans_mask = jnp.asarray(
        (np.asarray(f_mask) == 1)
        & (pos >= (P + MAX_NEW - ans_len[:, None]))
    ).astype(jnp.float32)

    @jax.jit
    def answer_nll(variables):
        logits = dec.apply(variables, f_ids, f_mask).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.roll(f_ids, -1, axis=1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        w = jnp.roll(ans_mask, -1, axis=1).at[:, -1].set(0.0)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    greedy = build_greedy_generate(dec, MAX_NEW, eos_token_id=None, pad_token_id=0)
    base_out = np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask)))
    base_nll = float(answer_nll({"params": params}))

    tiers = [("bf16", False), ("int8", True), ("int4", "int4"),
             ("int4pc", "int4pc"), ("nf4", "nf4")]
    for name, q in tiers:
        residual, quant = pack_qlora_frozen(params, quantize=q)
        variables = {"params": residual, "quant": quant}
        nll = float(answer_nll(variables))

        gen_q = build_greedy_generate(
            dec, MAX_NEW, eos_token_id=None, pad_token_id=0,
            extra_collections={"quant": quant},
        )
        out = np.asarray(gen_q(residual, jnp.asarray(ids), jnp.asarray(mask)))
        em = float(np.mean(np.all(out == base_out, axis=1)))
        print(json.dumps({
            "metric": f"int4_tier_quality[{name}]",
            "value": round(nll, 4),
            "unit": "gold-answer-nll",
            "vs_baseline": round(nll - base_nll, 4),
            "greedy_exact_match_vs_unquantized": round(em, 3),
            "unquantized_nll": round(base_nll, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
