"""End-to-end M0 slice: contrastive training on a toy CSV over the
8-device CPU mesh, then exact-index retrieval eval — the SURVEY.md §7.2
milestone-0 acceptance test (reference runs the same flow on
`dalm/datasets/toy_data_train.csv`, README.md:62,77)."""

import os

import numpy as np
import pytest

from dalm_tpu.eval.retriever import evaluate_retriever
from dalm_tpu.train.retriever_only import train_retriever


@pytest.mark.slow
def test_train_then_eval_retriever(toy_csv, tmp_path):
    out = str(tmp_path / "out")
    result = train_retriever(
        "tiny",
        toy_csv,
        per_device_train_batch_size=2,
        num_train_epochs=2,
        output_dir=out,
        query_max_len=24,
        passage_max_len=32,
        with_tracking=True,
        use_dropout=False,
        checkpointing_steps="epoch",
    )
    assert result["steps"] >= 2
    assert np.isfinite(result["final_loss"])

    retriever_dir = os.path.join(out, "retriever")
    assert os.path.exists(os.path.join(retriever_dir, "params.msgpack"))
    assert os.path.exists(os.path.join(retriever_dir, "config.json"))
    # metrics stream exists
    assert any(f.endswith("metrics.jsonl") for f in os.listdir(out))
    # epoch checkpoints exist
    assert os.path.isdir(os.path.join(out, "epoch_0"))

    results = evaluate_retriever(
        toy_csv,
        retriever_dir,
        max_length=32,
        test_batch_size=8,
        top_k=4,
    )
    assert results.total_examples == 16
    # tiny random-init model trained 2 epochs on 16 rows must beat chance
    assert results.hit_rate > 0.3
    assert results.recall == results.hit_rate  # single gold passage ⇒ equal


@pytest.mark.slow
def test_lora_training_smoke(toy_csv, tmp_path):
    out = str(tmp_path / "lora_out")
    result = train_retriever(
        "tiny",
        toy_csv,
        per_device_train_batch_size=2,
        num_train_epochs=1,
        output_dir=out,
        query_max_len=16,
        passage_max_len=16,
        with_tracking=False,
        use_peft=True,
        use_dropout=False,
    )
    assert np.isfinite(result["final_loss"])
    retriever_dir = os.path.join(out, "retriever")
    assert os.path.exists(os.path.join(retriever_dir, "adapter_params.msgpack"))
    # eval merges the adapter
    results = evaluate_retriever(
        toy_csv,
        retriever_dir,
        retriever_peft_model_path=retriever_dir,
        max_length=16,
        test_batch_size=8,
        top_k=4,
    )
    assert results.total_examples == 16
