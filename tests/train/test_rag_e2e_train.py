"""End-to-end RAG-e2e trainer tests (C3): the joint contrastive +
marginalized objective through the real `train_e2e` loop on the 8-device
CPU mesh, for both LoRA runtimes, then `evaluate_rag` on the artifacts
(reference flow: `train_rage2e.py:229` → `eval_rag.py:167`)."""

import os

import numpy as np
import pytest

from dalm_tpu.eval.rag import evaluate_rag
from dalm_tpu.train.rag_e2e import train_e2e


@pytest.mark.slow
def test_train_e2e_then_eval_rag(toy_csv, tmp_path):
    out = str(tmp_path / "rag_out")
    result = train_e2e(
        toy_csv,
        "tiny",
        "tiny",
        per_device_train_batch_size=2,
        num_train_epochs=2,
        output_dir=out,
        query_max_len=16,
        passage_max_len=24,
        generator_max_len=48,
        with_tracking=True,
        use_dropout=False,
        checkpointing_steps="epoch",
    )
    assert result["steps"] >= 2
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["final_retriever_loss"])
    assert np.isfinite(result["final_generator_loss"])
    for sub in ("retriever", "generator"):
        assert os.path.exists(os.path.join(out, sub, "params.msgpack"))
    assert os.path.isdir(os.path.join(out, "epoch_0"))

    results = evaluate_rag(
        toy_csv,
        os.path.join(out, "retriever"),
        os.path.join(out, "generator"),
        max_length=24,
        top_k=4,
        max_new_tokens=8,
        test_batch_size=8,
    )
    assert results.total_examples == 16
    assert results.hit_rate > 0.1  # trained tiny model beats nothing-at-all
    assert results.exact_match is not None


@pytest.mark.slow
def test_train_e2e_fused_qlora_packed_init(toy_csv, tmp_path):
    """Fused runtime with random init: params go straight into packed
    storage (no full-precision tree ever exists) and the final save
    reconstructs a merge-loadable base via unpack_to_params."""
    out = str(tmp_path / "fused_out")
    result = train_e2e(
        toy_csv,
        "tiny",
        "tiny",
        per_device_train_batch_size=2,
        num_train_epochs=1,
        output_dir=out,
        query_max_len=16,
        passage_max_len=16,
        generator_max_len=32,
        with_tracking=False,
        use_peft="both",
        use_bnb="generator",
        lora_runtime="fused",
        use_dropout=False,
    )
    assert np.isfinite(result["final_loss"])
    for sub in ("retriever", "generator"):
        sub_dir = os.path.join(out, sub)
        assert os.path.exists(os.path.join(sub_dir, "params.msgpack"))
        assert os.path.exists(os.path.join(sub_dir, "adapter_params.msgpack"))

    # The reconstructed bases + adapters must round-trip through the
    # merge-based eval path.
    results = evaluate_rag(
        toy_csv,
        os.path.join(out, "retriever"),
        os.path.join(out, "generator"),
        retriever_peft_model_path=os.path.join(out, "retriever"),
        generator_peft_model_path=os.path.join(out, "generator"),
        max_length=16,
        top_k=4,
        max_new_tokens=4,
        test_batch_size=8,
    )
    assert results.total_examples == 16


@pytest.mark.slow
def test_train_e2e_live_index_hard_negatives(toy_csv, tmp_path):
    """live_negatives_k: the refreshed on-device index feeds top-k hard
    negatives into the contrastive softmax and the marginalized passage
    normalizer each step (the reference's TODO, train_rage2e.py:461-462)."""
    result = train_e2e(
        toy_csv,
        "tiny",
        "tiny",
        per_device_train_batch_size=2,
        num_train_epochs=2,
        output_dir=None,
        query_max_len=16,
        passage_max_len=16,
        generator_max_len=32,
        with_tracking=False,
        use_dropout=False,
        live_index=True,
        index_refresh_slice=8,
        live_negatives_k=3,
    )
    assert np.isfinite(result["final_loss"])
    assert result["steps"] >= 2
    # the refresher completed at least one full sweep at the end
    assert result["index_version"] >= 1


@pytest.mark.slow
def test_live_negatives_requires_live_index(toy_csv):
    with pytest.raises(ValueError, match="live_index"):
        train_e2e(
            toy_csv, "tiny", "tiny", per_device_train_batch_size=2,
            num_train_epochs=1, query_max_len=16, passage_max_len=16,
            generator_max_len=32, with_tracking=False, live_negatives_k=2,
        )


@pytest.mark.slow
def test_train_e2e_streamed_hf_7b_lifecycle(toy_csv, tmp_path):
    """Full fused-QLoRA lifecycle with STREAMED HF weights (the 7B-on-one-
    chip path, at test scale): HF Llama checkpoint -> tensor-by-tensor
    int8 packing (load_hf_decoder_packed, no full-precision tree) ->
    fused train steps -> adapter + reconstructed base saved -> merge-
    based evaluate_rag consumes both."""
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=384, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    hf_dir = tmp_path / "hf_llama"
    transformers.LlamaForCausalLM(hf_cfg).save_pretrained(hf_dir, safe_serialization=True)

    out = str(tmp_path / "out")
    result = train_e2e(
        toy_csv,
        "tiny",
        str(hf_dir),
        per_device_train_batch_size=2,
        num_train_epochs=1,
        output_dir=out,
        query_max_len=16,
        passage_max_len=16,
        generator_max_len=48,
        with_tracking=False,
        use_peft="generator",
        use_bnb="generator",
        lora_runtime="fused",
        use_dropout=False,
    )
    assert np.isfinite(result["final_loss"])
    gen_dir = os.path.join(out, "generator")
    assert os.path.exists(os.path.join(gen_dir, "adapter_params.msgpack"))
    assert os.path.exists(os.path.join(gen_dir, "params.msgpack"))

    results = evaluate_rag(
        toy_csv,
        os.path.join(out, "retriever"),
        gen_dir,
        generator_peft_model_path=gen_dir,
        max_length=16,
        top_k=4,
        max_new_tokens=4,
        test_batch_size=8,
    )
    assert results.total_examples == 16


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["token", "sequence"])
def test_train_e2e_true_topk_marginalization(toy_csv, tmp_path, mode):
    """marginalize_k: the generator loss becomes the TRUE RAG marginal
    over gold + retrieved candidates (k x generator cost), with prompts
    assembled on device from tokenized segments — RAG-token or
    RAG-sequence granularity (losses/marginal_topk.py)."""
    result = train_e2e(
        toy_csv,
        "tiny",
        "tiny",
        per_device_train_batch_size=2,
        num_train_epochs=2,
        output_dir=None,
        query_max_len=16,
        passage_max_len=24,
        generator_max_len=64,
        with_tracking=False,
        use_dropout=False,
        live_index=True,
        index_refresh_slice=8,
        marginalize_k=2,
        marginalize_mode=mode,
    )
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["final_generator_loss"])
    assert result["steps"] >= 2


@pytest.mark.slow
def test_marginalize_mode_validated(toy_csv):
    with pytest.raises(ValueError, match="marginalize_mode"):
        train_e2e(
            toy_csv, "tiny", "tiny", per_device_train_batch_size=2,
            num_train_epochs=1, query_max_len=16, passage_max_len=16,
            generator_max_len=32, with_tracking=False, live_index=True,
            marginalize_k=2, marginalize_mode="bogus",
        )


@pytest.mark.slow
def test_marginalize_requires_live_index(toy_csv):
    with pytest.raises(ValueError, match="live_index"):
        train_e2e(
            toy_csv, "tiny", "tiny", per_device_train_batch_size=2,
            num_train_epochs=1, query_max_len=16, passage_max_len=16,
            generator_max_len=32, with_tracking=False, marginalize_k=2,
        )


@pytest.mark.slow
def test_train_e2e_resume_from_checkpoint(toy_csv, tmp_path):
    """Orbax resume: a run killed after epoch 0 continues from the
    epoch checkpoint with the step counter intact (reference
    skip_first_batches semantics, train_rage2e.py:389-427)."""
    out = str(tmp_path / "resume_out")
    first = train_e2e(
        toy_csv, "tiny", "tiny",
        per_device_train_batch_size=2, num_train_epochs=1,
        output_dir=out, query_max_len=16, passage_max_len=16,
        generator_max_len=32, with_tracking=False, use_dropout=False,
        checkpointing_steps="epoch",
    )
    assert os.path.isdir(os.path.join(out, "epoch_0"))
    steps_first = first["steps"]

    resumed = train_e2e(
        toy_csv, "tiny", "tiny",
        per_device_train_batch_size=2, num_train_epochs=2,
        output_dir=out, query_max_len=16, passage_max_len=16,
        generator_max_len=32, with_tracking=False, use_dropout=False,
        checkpointing_steps="epoch",
        resume_from_checkpoint=os.path.join(out, "epoch_0"),
    )
    # epoch 0 was skipped: total steps == 2 epochs' worth, and the
    # resumed run only executed the second epoch
    assert resumed["steps"] == 2 * steps_first
    assert np.isfinite(resumed["final_loss"])


@pytest.mark.slow
def test_train_retriever_resume_from_step(toy_csv, tmp_path):
    from dalm_tpu.train.retriever_only import train_retriever

    out = str(tmp_path / "ro_resume")
    first = train_retriever(
        "tiny", toy_csv, per_device_train_batch_size=2, num_train_epochs=1,
        output_dir=out, query_max_len=16, passage_max_len=16,
        with_tracking=False, use_dropout=False, checkpointing_steps=1,
    )
    step_dirs = [d for d in os.listdir(out) if d.startswith("step_")]
    assert step_dirs
    latest = sorted(step_dirs, key=lambda d: int(d.split("_")[1]))[-1]

    resumed = train_retriever(
        "tiny", toy_csv, per_device_train_batch_size=2, num_train_epochs=2,
        output_dir=out, query_max_len=16, passage_max_len=16,
        with_tracking=False, use_dropout=False,
        resume_from_checkpoint=os.path.join(out, latest),
    )
    assert resumed["steps"] == 2 * first["steps"]
    assert np.isfinite(resumed["final_loss"])


def test_train_e2e_fused_runtime_resume(toy_csv, tmp_path):
    """Resume with lora_runtime="fused": the checkpoint holds only the
    trainable LoRA factors + opt state; the frozen packed int8 base
    re-inits DETERMINISTICALLY from the same seed, so the resumed run
    continues the same trajectory (same final loss as an uninterrupted
    2-epoch run, not just a finite one)."""
    common = dict(
        per_device_train_batch_size=2,
        query_max_len=16, passage_max_len=16, generator_max_len=32,
        with_tracking=False, use_dropout=False,
        use_peft="both", use_bnb="both", lora_runtime="fused",
        checkpointing_steps="epoch", seed=3,
    )
    out = str(tmp_path / "fused_resume")
    first = train_e2e(toy_csv, "tiny", "tiny", num_train_epochs=1, output_dir=out, **common)
    assert os.path.isdir(os.path.join(out, "epoch_0"))

    resumed = train_e2e(
        toy_csv, "tiny", "tiny", num_train_epochs=2, output_dir=out,
        resume_from_checkpoint=os.path.join(out, "epoch_0"), **common,
    )
    assert resumed["steps"] == 2 * first["steps"]

    ref_out = str(tmp_path / "fused_straight")
    straight = train_e2e(
        toy_csv, "tiny", "tiny", num_train_epochs=2, output_dir=ref_out, **common
    )
    assert abs(resumed["final_loss"] - straight["final_loss"]) < 1e-4, (
        resumed["final_loss"], straight["final_loss"],
    )


@pytest.mark.slow
def test_train_e2e_contrastive_weight_zero(toy_csv):
    """contrastive_weight=0: the retriever trains purely from generator
    feedback (the marginalized loss) — the ablation isolating how much
    retrieval signal the generator carries."""
    result = train_e2e(
        toy_csv, "tiny", "tiny", per_device_train_batch_size=2,
        num_train_epochs=2, output_dir=None, query_max_len=16,
        passage_max_len=24, generator_max_len=64, with_tracking=False,
        use_dropout=False, live_index=True, index_refresh_slice=8,
        marginalize_k=2, contrastive_weight=0.0,
    )
    assert np.isfinite(result["final_loss"])
    assert result["steps"] >= 2
