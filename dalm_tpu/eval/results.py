"""Eval result model — twin of `/root/reference/dalm/eval/eval_results.py:4-8`."""

from __future__ import annotations

from pydantic import BaseModel


class EvalResults(BaseModel):
    total_examples: int
    recall: float
    precision: float
    hit_rate: float
    exact_match: float | None = None
    # mean reciprocal rank of the gold passage (0 when missed) — the
    # metric the reference's llama-index comparison tables report
    # (`experiments/llama-index-synthetic-data/README.md`)
    mrr: float | None = None
