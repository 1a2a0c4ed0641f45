"""Retriever evaluation: embed → sharded exact index → recall/precision/hit.

Twin of `/root/reference/dalm/eval/eval_retriever_only.py:105-178`, with:
- hnswlib replaced by the exact on-device `ShardedDenseIndex` (recall can
  only improve — exact ≥ approximate at equal k);
- passage/query embedding as one jitted program per static batch shape;
- the same metric bookkeeping (see `dalm_tpu/eval/common.py`).
"""

from __future__ import annotations

import logging
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from datasets import Dataset

from dalm_tpu.core.dtypes import parse_dtype
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
from dalm_tpu.index.dense import ShardedDenseIndex
from dalm_tpu.models.embedder import SentenceEmbedder
from dalm_tpu.models.registry import resolve_decoder, resolve_encoder

logger = logging.getLogger(__name__)


def build_embed_fn(model: SentenceEmbedder, params):
    """Jitted (ids, mask) → pooled embeddings."""

    @jax.jit
    def fn(ids, mask):
        return model.embed(params, ids, mask)

    return lambda ids, mask: fn(jnp.asarray(ids), jnp.asarray(mask))


def load_retriever_for_eval(
    retriever_name_or_path: str,
    retriever_peft_model_path: Optional[str],
    is_autoregressive: bool,
    torch_dtype: Optional[str] = None,
    tokenizer: str = "byte",
):
    """Model + (optionally merged) adapter + tokenizer.

    Mirrors the reference eval path: base model loaded un-peft'd, then
    ``attach_pre_trained_peft_layers(...).merge_and_unload()``
    (`eval_retriever_only.py:122-135`).
    """
    dtype = parse_dtype(torch_dtype) if torch_dtype else None
    if is_autoregressive:
        cfg, params = resolve_decoder(retriever_name_or_path, dtype=dtype)
    else:
        cfg, params = resolve_encoder(retriever_name_or_path, dtype=dtype)
    model = SentenceEmbedder(cfg, is_autoregressive=is_autoregressive)
    if params is None:
        params = unbox(model.init_params(jax.random.PRNGKey(0)))
    if retriever_peft_model_path:
        from dalm_tpu.models.lora import load_adapter, merge_lora

        lora_params, spec = load_adapter(retriever_peft_model_path)
        params = merge_lora(params, lora_params, spec)

    tok = resolve_tokenizer(tokenizer, add_eos_token=is_autoregressive)
    if is_autoregressive:
        tok.padding_side = "left"
    return model, params, tok


def evaluate_retriever(
    dataset_or_path: Union[Dataset, str],
    retriever_name_or_path: str,
    retriever_peft_model_path: Optional[str] = None,
    passage_column_name: str = "Abstract",
    query_column_name: str = "Question",
    embed_dim: Optional[int] = None,
    max_length: int = 128,
    test_batch_size: int = 8,
    device: str = "tpu",  # accepted for signature parity; mesh decides
    torch_dtype: str = "bfloat16",
    top_k: int = 10,
    is_autoregressive: bool = False,
    # TPU-native extensions
    tokenizer: str = "byte",
    mesh=None,
    query_batch_size: Optional[int] = None,
    index_kernel: str = "auto",  # pallas on TPU, xla elsewhere
    index_quantize: "bool | str" = False,  # True/"int8" = int8 rows, "int4" = nibbles
    threshold: float = 0.0,
) -> EvalResults:
    """Twin of `evaluate_retriever` (`eval_retriever_only.py:105-178`)."""
    if mesh is None:
        mesh = make_mesh(MeshConfig())

    model, params, tok = load_retriever_for_eval(
        retriever_name_or_path, retriever_peft_model_path, is_autoregressive, torch_dtype, tokenizer
    )
    embed_dim = embed_dim or model.embedding_dim

    test_dataset = load_dataset(dataset_or_path)
    processed = preprocess_eval_dataset(
        test_dataset, tok, query_column_name, passage_column_name, max_length
    )

    embed_fn = build_embed_fn(model, params)

    unique_passages = filter_unique_passages(processed, passage_column_name)
    logger.info("embedding %d unique passages", len(unique_passages))
    passage_embs = embed_dataset(
        embed_fn, unique_passages,
        "retriever_passage_input_ids", "retriever_passage_attention_mask",
        test_batch_size, embed_dim,
    )
    id_to_passage = {i: p for i, p in enumerate(unique_passages[passage_column_name])}

    index = ShardedDenseIndex.build(
        mesh, passage_embs, kernel=index_kernel, quantize=index_quantize
    )

    precisions, recalls, rrs, total_hit = [], [], [], 0
    qbs = query_batch_size or test_batch_size
    n = len(processed)
    q_ids = np.asarray(processed["retriever_query_input_ids"], np.int32)
    q_mask = np.asarray(processed["retriever_query_attention_mask"], np.int32)
    gold = list(processed[passage_column_name])
    for start in range(0, n, qbs):
        end = min(start + qbs, n)
        ids, mask = q_ids[start:end], q_mask[start:end]
        real = end - start
        if real < qbs:
            pad = qbs - real
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
        query_embs = np.asarray(embed_fn(ids, mask), np.float32)[:real]
        scores, found = index.search(query_embs, top_k)
        hits = threshold_hits(scores, found, id_to_passage, threshold)
        p, r, h, _, rr = score_batch(hits, gold[start:end])
        precisions.extend(p)
        recalls.extend(r)
        total_hit += h
        rrs.extend(rr)

    results = aggregate_results(n, precisions, recalls, total_hit, rrs)
    logger.info("Retriever results: %s", results)
    return results
