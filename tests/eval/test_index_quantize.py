"""index_quantize reaches evaluate_retriever (VERDICT r1: int4 rows
were build-only — not reachable from eval/serving flags)."""

import numpy as np
import pytest
from datasets import Dataset

from dalm_tpu.eval.retriever import evaluate_retriever


@pytest.fixture(scope="module")
def toy_ds():
    rng = np.random.default_rng(0)
    words = ["alpha", "bravo", "cielo", "delta", "echo", "forte", "golfo", "hotel"]
    rows = [
        {
            "Question": f"what about {w}{i}?",
            "Abstract": f"{w}{i} is discussed here in detail number {i}",
        }
        for i, w in enumerate(words * 2)
    ]
    rng.shuffle(rows)
    return Dataset.from_list(rows)


@pytest.mark.parametrize("mode", [False, "int8", "int4"])
def test_eval_retriever_index_quantize(toy_ds, mode):
    ev = evaluate_retriever(
        toy_ds, "tiny", max_length=32, top_k=4,
        test_batch_size=8, query_batch_size=8, index_quantize=mode,
    )
    assert ev.total_examples == len(toy_ds)
    assert 0.0 <= ev.hit_rate <= 1.0
    assert 0.0 <= ev.mrr <= 1.0
