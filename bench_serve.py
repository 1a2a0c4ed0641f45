"""Serving benchmark: end-to-end RAG answers/sec through RagPipeline.

Embeds a synthetic 10k-passage corpus into the sharded index, then
measures the full answer path — query embed → exact top-k retrieval →
prompt build → jitted KV-cache greedy decode — on one chip. The
reference has no serving path at all (retrieval+generation live only in
its eval scripts); its closest anecdote is "llama-index eval, 2k
queries ≈ 4 h on A100" (BASELINE.md). Prints one JSON line per config.
Run manually (bench.py is the driver headline).
"""

from __future__ import annotations

import json
import string
import time

import numpy as np


def _corpus(n, rng):
    letters = np.array(list(string.ascii_lowercase + " "))
    return ["".join(rng.choice(letters, size=90)) + f" topic {i}" for i in range(n)]


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax

    from dalm_tpu.serve import RagPipeline
    from dalm_tpu.models.encoder import EncoderConfig
    from dalm_tpu.models.embedder import SentenceEmbedder
    from dalm_tpu.models.registry import DECODER_PRESETS, build_decoder
    from dalm_tpu.data.tokenizer import ByteTokenizer
    from dalm_tpu.core.mesh import unbox

    import dataclasses
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    corpus = _corpus(10_000, rng)
    queries = [f"what about topic {i}" for i in range(256)]

    r_cfg = dataclasses.replace(
        EncoderConfig.bge_small(), vocab_size=384, dtype=dtype,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    retriever = SentenceEmbedder(r_cfg)
    r_params = unbox(retriever.init_params(jax.random.PRNGKey(0), seq_len=64))

    g_cfg = dataclasses.replace(DECODER_PRESETS["gpt2"](), vocab_size=384, dtype=dtype)
    generator = build_decoder(g_cfg)
    ids8 = jnp.zeros((1, 8), jnp.int32)
    g_params = unbox(generator.init(jax.random.PRNGKey(1), ids8, jnp.ones_like(ids8))["params"])

    tok = ByteTokenizer()
    pipe = RagPipeline(
        retriever, r_params, tok, generator, g_params, ByteTokenizer(),
        passages=corpus,
        index_kernel="pallas" if on_tpu else "xla",
        max_new_tokens=64,
        embed_batch=256,
    )

    # warm at the SAME batch shape (compiles embed + search + decode)
    _ = pipe.answer(queries, top_k=1)
    t0 = time.perf_counter()
    answers = pipe.answer(queries, top_k=1)
    dt = time.perf_counter() - t0
    assert len(answers) == len(queries) and answers[0].answer is not None
    qps = len(queries) / dt / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "rag_serve_answers_per_sec_per_chip[bge-small-shape+gpt2-124M-shape,10k-corpus,top1,64-new-tokens]",
                "value": round(qps, 2),
                "unit": "answers/sec/chip",
                "vs_baseline": None,
                "decode_batch": len(queries),
            }
        )
    )


if __name__ == "__main__":
    main()
