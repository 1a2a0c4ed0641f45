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
    precisions, recalls, total_hit, top = score_batch(hits, ["gold", "gold"])
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
    precisions, recalls, total_hit, top = score_batch([[]], ["gold"])
    assert precisions == [0.0] and recalls == [0.0] and total_hit == 0
    assert top == [""]
