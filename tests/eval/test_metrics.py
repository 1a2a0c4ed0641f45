"""Eval metric bookkeeping — reference semantics (`eval/utils.py:71-83,
222-285`): dedup precision, recall vs single gold, threshold filter,
division by total queries."""

import numpy as np

from dalm_tpu.eval.common import (
    aggregate_results,
    calculate_precision_recall,
    score_batch,
    threshold_hits,
)


def test_precision_recall_dedup():
    # duplicate retrieved passages collapse into a set (denominator shrinks)
    p, r = calculate_precision_recall(["a", "a", "b"], ["a"])
    assert p == 0.5  # {a, b} → 1 correct of 2
    assert r == 1.0


def test_recall_equals_hit_for_single_gold():
    hits = [[("gold", 0.9), ("x", 0.5)], [("y", 0.8), ("z", 0.2)]]
    precisions, recalls, total_hit, top, _ = score_batch(hits, ["gold", "gold"])
    assert recalls == [1.0, 0.0]
    assert total_hit == 1
    assert top == ["gold", "y"]


def test_threshold_filters_low_scores():
    scores = np.array([[0.9, -0.1, 0.05]])
    ids = np.array([[0, 1, 2]])
    id_to_passage = {0: "a", 1: "b", 2: "c"}
    hits = threshold_hits(scores, ids, id_to_passage, threshold=0.0)
    assert hits == [[("a", 0.9), ("c", 0.05000000074505806)]] or [p for p, _ in hits[0]] == ["a", "c"]


def test_aggregate_divides_by_total():
    res = aggregate_results(4, [1.0, 0.5], [1.0, 0.0], 1)
    assert res.precision == 1.5 / 4
    assert res.recall == 1.0 / 4
    assert res.hit_rate == 0.25
    assert res.total_examples == 4


def test_empty_retrieved_scores_zero():
    precisions, recalls, total_hit, top, _ = score_batch([[]], ["gold"])
    assert precisions == [0.0] and recalls == [0.0] and total_hit == 0
    assert top == [""]


def test_mrr_reciprocal_ranks():
    """MRR: 1/rank of the first gold hit, 0 on miss; averaged over all
    queries (the reference's llama-index tables report MRR alongside
    hit rate)."""
    from dalm_tpu.eval.common import aggregate_results, score_batch

    results = [
        [("gold0", 0.9), ("x", 0.8)],          # rank 1 -> 1.0
        [("x", 0.9), ("gold1", 0.8)],          # rank 2 -> 0.5
        [("x", 0.9), ("y", 0.8), ("z", 0.7)],  # miss   -> 0.0
    ]
    p, r, hit, top, rrs = score_batch(results, ["gold0", "gold1", "gold2"])
    assert rrs == [1.0, 0.5, 0.0]
    agg = aggregate_results(3, p, r, hit, rrs)
    assert abs(agg.mrr - 0.5) < 1e-9
    # without ranks the field stays None (back-compat)
    assert aggregate_results(3, p, r, hit).mrr is None
