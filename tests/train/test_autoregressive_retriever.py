"""Autoregressive-retriever path: decoder backbone + EOS pooling
(`retriever_only_base_model.py:49-55` twin), trained and evaluated."""

import os

import numpy as np
import pytest

from dalm_tpu.eval.retriever import evaluate_retriever
from dalm_tpu.train.retriever_only import train_retriever


@pytest.mark.slow
def test_autoregressive_retriever_e2e(toy_csv, tmp_path):
    out = str(tmp_path / "ar_out")
    result = train_retriever(
        "tiny",
        toy_csv,
        is_autoregressive=True,
        per_device_train_batch_size=2,
        num_train_epochs=2,
        output_dir=out,
        query_max_len=16,
        passage_max_len=24,
        with_tracking=False,
        use_dropout=False,
    )
    assert np.isfinite(result["final_loss"])
    retriever_dir = os.path.join(out, "retriever")
    assert os.path.exists(os.path.join(retriever_dir, "params.msgpack"))

    results = evaluate_retriever(
        toy_csv,
        retriever_dir,
        is_autoregressive=True,
        max_length=24,
        test_batch_size=8,
        top_k=4,
    )
    assert results.total_examples == 16
    assert results.hit_rate > 0.2
