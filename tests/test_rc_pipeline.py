"""Composite RC pipeline e2e (C19): regex dataset generation → merged
in-memory dataset → saved to disk → generator SFT, in one call
(reference `pipelines/reading_comprehension_pipeline.py:50-234`)."""

import os

import numpy as np
import pytest

from dalm_tpu.pipelines.reading_comprehension import SynthKwargs, SynthMode, pipeline


@pytest.fixture(scope="module")
def domain_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    base = (
        "The photovoltaic converter assembly incorporates a heterojunction "
        "stack. Because the passivation layer reduces recombination, the "
        "open-circuit voltage increases. The encapsulant is not degraded by "
        "ultraviolet exposure. Researchers measured the quantum efficiency "
        "across the spectral band. Improved interconnect geometry lowers "
        "series resistance, so the fill factor improves measurably. "
    )
    for i in range(4):
        (d / f"doc_{i}.txt").write_text(base * (6 + i) + f" Document marker {i}.")
    return str(d)


@pytest.fixture(scope="module")
def general_tokenizer_json(tmp_path_factory):
    from dalm_tpu.data.spm import UnigramPieceTokenizer

    d = tmp_path_factory.mktemp("spm")
    text = d / "general.txt"
    text.write_text(
        "the of and a to in is was for on with as by at from this that "
        "it an be are or not which have has had one two three time people "
        "way day man thing woman life child world school state family "
        "student group country problem hand part place case week company "
        "system program question work government number night point home "
        "water room mother area money story fact month lot right study "
        "book eye job word business issue side kind head house service "
        "friend father power hour game line end member law car city "
        "community name president team minute idea body information back "
        "parent face others level office door health person art war history "
        "party result change morning reason research girl guy moment air "
        "teacher force education foot boy age policy everything process " * 20
    )
    tok = UnigramPieceTokenizer.train(files=[str(text)], vocab_size=300)
    path = str(d / "general.json")
    tok.tokenizer.save(path)
    return path


@pytest.mark.slow
def test_regex_pipeline_end_to_end(domain_docs, general_tokenizer_json, tmp_path):
    out_ds = str(tmp_path / "rc_dataset")
    out_model = str(tmp_path / "rc_model")
    result = pipeline(
        model_name="tiny",
        output_dataset_name=out_ds,
        input=domain_docs,
        model_output_dir=out_model,
        synth_kwargs=SynthKwargs(general_spm_path=general_tokenizer_json),
        comprehension_type=SynthMode.REGEX,
        seq_length=64,
        num_train_epochs=1,
        per_device_train_batch_size=1,
        eval_steps=0,
        logging_steps=4,
        lora_r=4,
        lora_alpha=8,
        gradient_checkpointing=False,
        validation_split=0.25,
        num_warmup_steps=0,
    )
    assert np.isfinite(result["final_loss"])
    # dataset saved to disk with chatml messages rows
    from datasets import load_from_disk

    ds = load_from_disk(out_ds)
    assert len(ds) > 0
    assert "messages" in ds.column_names
    roles = [m["role"] for m in ds[0]["messages"]]
    assert roles[0] == "user"
    # trained artifacts present
    assert os.path.exists(os.path.join(out_model, "final_checkpoint", "adapter_params.msgpack"))
