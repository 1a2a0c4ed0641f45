"""RAG evaluation: retrieval metrics + generator exact-match.

Twin of `/root/reference/dalm/eval/eval_rag.py:167-295`:
- retrieval half identical to `evaluate_retriever` (same index/metrics);
- for each query the TOP-1 retrieved passage is formatted as
  ``#query# {q} #passage# {p} #answer# `` (`:154-157` — single markers;
  the reference's *training* text doubles them, an inconsistency we
  preserve on both sides);
- generation is the jitted KV-cache greedy decode
  (`dalm_tpu/models/generate.py`) instead of HF ``generate``;
- EM: the full text (prompt + generation) is split on ``#answer#`` and
  segment [1], stripped, must equal the gold answer (`:277-289`).

Deviations (documented):
- the reference shuffles its eval DataLoader yet zips generated answers
  against the *unshuffled* answer column (`:238,282`) — an order bug that
  corrupts EM; we keep deterministic order so EM is meaningful;
- the reference caps ``generate(max_length=256)`` total; we cap the
  prompt at ``max_length`` and new tokens at ``max_new_tokens`` (static
  shapes compile once).
"""

from __future__ import annotations

import logging
from typing import Optional, Union

import jax
import numpy as np
from datasets import Dataset

from dalm_tpu.core.mesh import MeshConfig, make_mesh, unbox
from dalm_tpu.data.loading import load_dataset
from dalm_tpu.data.tokenizer import resolve_tokenizer
from dalm_tpu.eval.common import (
    aggregate_results,
    embed_dataset,
    filter_unique_passages,
    preprocess_eval_dataset,
    score_batch,
    threshold_hits,
)
from dalm_tpu.eval.results import EvalResults
from dalm_tpu.eval.retriever import build_embed_fn, load_retriever_for_eval
from dalm_tpu.index.dense import ShardedDenseIndex
from dalm_tpu.models.registry import build_decoder
from dalm_tpu.models.generate import build_greedy_generate
from dalm_tpu.models.registry import resolve_decoder

logger = logging.getLogger(__name__)


def evaluate_rag(
    dataset_or_path: Union[str, Dataset],
    retriever_name_or_path: str,
    generator_name_or_path: str,
    retriever_peft_model_path: Optional[str] = None,
    generator_peft_model_path: Optional[str] = None,
    passage_column_name: str = "Abstract",
    query_column_name: str = "Question",
    answer_column_name: str = "Answer",
    embed_dim: Optional[int] = None,
    max_length: int = 128,
    test_batch_size: int = 8,
    query_batch_size: int = 16,
    device: str = "tpu",  # parity arg; the mesh decides placement
    torch_dtype: str = "bfloat16",
    top_k: int = 10,
    evaluate_generator: bool = True,
    retriever_is_autoregressive: bool = False,
    # TPU-native extensions
    retriever_tokenizer: str = "byte",
    generator_tokenizer: str = "byte",
    mesh=None,
    max_new_tokens: int = 64,
    index_kernel: str = "auto",  # pallas on TPU, xla elsewhere
    index_quantize: "bool | str" = False,  # True/"int8" = int8 rows, "int4" = nibbles
    threshold: float = 0.0,  # hnswlib-parity score cutoff (`eval/utils.py:52`)
) -> EvalResults:
    if mesh is None:
        mesh = make_mesh(MeshConfig())

    retriever, r_params, r_tok = load_retriever_for_eval(
        retriever_name_or_path, retriever_peft_model_path,
        retriever_is_autoregressive, torch_dtype, retriever_tokenizer,
    )
    embed_dim = embed_dim or retriever.embedding_dim

    g_cfg, g_params = resolve_decoder(generator_name_or_path)
    generator = build_decoder(g_cfg)
    if g_params is None:
        import jax.numpy as jnp

        g_params = unbox(
            generator.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
            )["params"]
        )
    if generator_peft_model_path:
        from dalm_tpu.models.lora import load_adapter, merge_lora

        lora_params, spec = load_adapter(generator_peft_model_path)
        g_params = merge_lora(g_params, lora_params, spec)
    g_tok = resolve_tokenizer(generator_tokenizer)
    g_tok.padding_side = "left"

    test_dataset = load_dataset(dataset_or_path)
    processed = preprocess_eval_dataset(
        test_dataset, r_tok, query_column_name, passage_column_name, max_length
    )

    embed_fn = build_embed_fn(retriever, r_params)
    unique_passages = filter_unique_passages(processed, passage_column_name)
    passage_embs = embed_dataset(
        embed_fn, unique_passages,
        "retriever_passage_input_ids", "retriever_passage_attention_mask",
        test_batch_size, embed_dim,
    )
    id_to_passage = {i: p for i, p in enumerate(unique_passages[passage_column_name])}
    index = ShardedDenseIndex.build(
        mesh, passage_embs, kernel=index_kernel, quantize=index_quantize
    )

    generate = build_greedy_generate(
        generator, max_new_tokens,
        eos_token_id=g_tok.eos_token_id, pad_token_id=g_tok.pad_token_id or 0,
    )

    precisions, recalls, rrs, total_hit, total_em_hit = [], [], [], 0, 0
    n = len(processed)
    q_ids = np.asarray(processed["retriever_query_input_ids"], np.int32)
    q_mask = np.asarray(processed["retriever_query_attention_mask"], np.int32)
    gold_passages = list(processed[passage_column_name])
    raw_queries = list(processed[query_column_name])
    answers = list(processed[answer_column_name])

    prompts_pending: list[str] = []
    generated: list[str] = []

    def _flush_generation():
        if not prompts_pending:
            return
        batch_prompts = list(prompts_pending)
        prompts_pending.clear()
        real = len(batch_prompts)
        if real < query_batch_size:
            batch_prompts += [batch_prompts[-1]] * (query_batch_size - real)
        toks = g_tok(batch_prompts, padding="max_length", max_length=max_length, truncation=True)
        ids = np.asarray(toks["input_ids"], np.int32)
        mask = np.asarray(toks["attention_mask"], np.int32)
        out = np.asarray(generate(g_params, ids, mask))
        for i in range(real):
            gen_text = g_tok.decode(out[i], skip_special_tokens=True)
            generated.append(batch_prompts[i] + gen_text)

    for start in range(0, n, test_batch_size):
        end = min(start + test_batch_size, n)
        ids, mask = q_ids[start:end], q_mask[start:end]
        real = end - start
        if real < test_batch_size:
            pad = test_batch_size - real
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
        query_embs = np.asarray(embed_fn(ids, mask), np.float32)[:real]
        scores, found = index.search(query_embs, top_k)
        hits = threshold_hits(scores, found, id_to_passage, threshold)
        p, r, h, top_passages, rr = score_batch(hits, gold_passages[start:end])
        precisions.extend(p)
        recalls.extend(r)
        total_hit += h
        rrs.extend(rr)

        if evaluate_generator:
            for q, passage in zip(raw_queries[start:end], top_passages):
                prompts_pending.append(f"#query# {q} #passage# {passage} #answer# ")
                if len(prompts_pending) >= query_batch_size:
                    _flush_generation()

    results_kwargs = {}
    if evaluate_generator:
        _flush_generation()
        for full_text, answer in zip(generated, answers):
            parts = full_text.split("#answer#")
            if len(parts) < 2:
                continue
            if parts[1].strip() == answer:
                total_em_hit += 1
        results_kwargs["exact_match"] = total_em_hit / n
        logger.info("Generator exact match: %.5f", total_em_hit / n)

    results = aggregate_results(n, precisions, recalls, total_hit, rrs)
    if results_kwargs:
        results = results.model_copy(update=results_kwargs)
    logger.info("RAG eval results: %s", results)
    return results
