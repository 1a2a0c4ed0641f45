"""Shared eval machinery — behavioral twin of
`/root/reference/dalm/eval/utils.py` minus hnswlib.

Metric semantics preserved exactly:
- retrieval hits are deduplicated passage *strings* (`:74-76` set()),
  so precision's denominator is the deduped retrieved set;
- ``recall = |hit| / 1`` against the single gold passage (`:80`), hence
  recall == hit-rate in the published tables;
- a score threshold filters hits (``score >= threshold``; reference
  converts hnswlib ip distance back to score via ``1 - d``, `:60-64`);
- averages divide by total query count (`calc_eval_results` `:275-285`).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from dalm_tpu.eval.results import EvalResults


def filter_unique_passages(dataset, passage_column_name: str):
    """First occurrence of each passage wins (`eval/utils.py:133-143`)."""
    unique = set(dataset[passage_column_name])

    def _keep(example) -> bool:
        present = example[passage_column_name] in unique
        unique.discard(example[passage_column_name])
        return present

    return dataset.filter(_keep)


def calculate_precision_recall(
    retrieved_items: Sequence[str], correct_items: Sequence[str]
) -> Tuple[float, float]:
    """Set-based precision/recall (`eval/utils.py:71-83`)."""
    retrieved_set = set(retrieved_items)
    correct_set = set(correct_items)
    correct_retrieved = len(retrieved_set & correct_set)
    precision = correct_retrieved / len(retrieved_set)
    recall = correct_retrieved / len(correct_set)
    return precision, recall


def threshold_hits(
    scores: np.ndarray,
    ids: np.ndarray,
    id_to_passage: Dict[int, str],
    threshold: float = 0.0,
) -> List[List[Tuple[str, float]]]:
    """(Q, k) search output → per-query [(passage, score >= threshold)].

    Twin of `get_nearest_neighbours` post-processing (`eval/utils.py:56-68`).
    """
    results = []
    for q in range(scores.shape[0]):
        results.append(
            [
                (id_to_passage[int(i)], float(s))
                for s, i in zip(scores[q], ids[q])
                if s >= threshold
            ]
        )
    return results


def embed_dataset(
    embed_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    dataset,
    ids_column: str,
    mask_column: str,
    batch_size: int,
    embed_dim: int,
) -> np.ndarray:
    """Batched embedding sweep into a preallocated array
    (`eval/utils.py:183-219`). The trailing partial batch is padded to the
    static batch shape (single compiled program) and truncated on copy.
    """
    n = len(dataset)
    out = np.zeros((n, embed_dim), np.float32)
    ids_all = np.asarray(dataset[ids_column], np.int32)
    mask_all = np.asarray(dataset[mask_column], np.int32)
    # One-deep software pipeline: dispatch batch i+1 before reading back
    # batch i, so the D2H copy overlaps device compute (dispatch is
    # async; the np.asarray is the sync point).
    pending = None  # (start, real, device_embs)
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        ids = ids_all[start:end]
        mask = mask_all[start:end]
        real = end - start
        if real < batch_size:
            pad = batch_size - real
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
        dev = embed_fn(ids, mask)
        if pending is not None:
            p_start, p_real, p_dev = pending
            out[p_start : p_start + p_real] = np.asarray(p_dev, np.float32)[:p_real]
        pending = (start, real, dev)
    if pending is not None:
        p_start, p_real, p_dev = pending
        out[p_start : p_start + p_real] = np.asarray(p_dev, np.float32)[:p_real]
    return out


def aggregate_results(
    total_examples: int,
    precisions: List[float],
    recalls: List[float],
    total_hit: int,
    reciprocal_ranks: "List[float] | None" = None,
) -> EvalResults:
    """`calc_eval_results` twin (`eval/utils.py:275-285`), plus MRR."""
    return EvalResults(
        total_examples=total_examples,
        recall=sum(recalls) / total_examples,
        precision=sum(precisions) / total_examples,
        hit_rate=total_hit / float(total_examples),
        mrr=(sum(reciprocal_ranks) / total_examples) if reciprocal_ranks else None,
    )


def score_batch(
    search_results: List[List[Tuple[str, float]]],
    correct_passages: Sequence[str],
) -> Tuple[List[float], List[float], int, List[str], List[float]]:
    """Per-batch metric accumulation (`evaluate_retriever_on_batch`,
    `eval/utils.py:222-272`). Returns (precisions, recalls, hits, top1,
    reciprocal_ranks) — rank of the first gold match (1/rank; 0 = miss)."""
    precisions, recalls, top_passages, rrs = [], [], [], []
    total_hit = 0
    for i, result in enumerate(search_results):
        retrieved = [p for p, _ in result]
        top_passages.append(retrieved[0] if retrieved else "")
        correct = [correct_passages[i]]
        if retrieved:
            p, r = calculate_precision_recall(retrieved, correct)
        else:
            # all hits below threshold — the reference would divide by
            # zero here (`eval/utils.py:80`); score 0/0 instead of crashing
            p, r = 0.0, 0.0
        precisions.append(p)
        recalls.append(r)
        total_hit += int(any(c in retrieved for c in correct))
        rr = 0.0
        for rank, passage in enumerate(retrieved, start=1):
            if passage in correct:
                rr = 1.0 / rank
                break
        rrs.append(rr)
    return precisions, recalls, total_hit, top_passages, rrs


def preprocess_eval_dataset(
    dataset,
    tokenizer,
    query_column_name: str,
    passage_column_name: str,
    max_length: int,
):
    """Tokenize queries+passages, KEEPING the raw string columns — they are
    needed downstream for metric matching (`eval/utils.py:113-130`; the
    reference deliberately does not drop columns, `:126`)."""

    def _map(examples):
        out = {}
        q = tokenizer(examples[query_column_name], padding="max_length", max_length=max_length, truncation=True)
        for k, v in q.items():
            out[f"retriever_query_{k}"] = v
        p = tokenizer(examples[passage_column_name], padding="max_length", max_length=max_length, truncation=True)
        for k, v in p.items():
            out[f"retriever_passage_{k}"] = v
        return out

    return dataset.map(_map, batched=True, desc="tokenize eval")
