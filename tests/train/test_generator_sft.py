"""Generator-only SFT trainer e2e (C13): both packing modes through the
real `train_generator` loop on the CPU mesh (reference:
`generator_only/trainer.py:140-265`, TRL SFTTrainer equivalent)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def messages_dataset(tmp_path_factory):
    """Tiny chat `messages` dataset saved to disk (local_dataset path)."""
    from datasets import Dataset

    rows = []
    for i in range(24):
        rows.append(
            {
                "messages": [
                    {"role": "user", "content": f"question number {i} about topic {i % 5}"},
                    {"role": "assistant", "content": f"the answer to {i} is {i * 7}"},
                ]
            }
        )
    d = tmp_path_factory.mktemp("sft_data") / "ds"
    Dataset.from_list(rows).save_to_disk(str(d))
    return str(d)


@pytest.mark.slow
def test_sft_packed(messages_dataset, tmp_path):
    from dalm_tpu.train.generator_only import train_generator

    out = str(tmp_path / "sft_out")
    result = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=out,
        num_train_epochs=2,
        seq_length=64,
        per_device_train_batch_size=1,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        lora_r=4,
        lora_alpha=8,
        use_peft=True,
        gradient_checkpointing=False,
    )
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["eval_loss"])
    final = os.path.join(out, "final_checkpoint")
    assert os.path.exists(os.path.join(final, "adapter_params.msgpack"))


@pytest.mark.slow
def test_sft_unpacked_padding(messages_dataset, tmp_path):
    """packing=False: per-sample padding + masked loss (TRL parity,
    `generator_only/trainer.py:231`)."""
    from dalm_tpu.train.generator_only import train_generator

    out = str(tmp_path / "sft_pad_out")
    result = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=out,
        num_train_epochs=1,
        seq_length=96,
        per_device_train_batch_size=1,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        packing=False,
        group_by_length=True,  # accepted; warns, no effect on static shapes
        lora_r=4,
        lora_alpha=8,
        use_peft=True,
        gradient_checkpointing=False,
    )
    assert np.isfinite(result["final_loss"])
    assert result["steps"] > 0


@pytest.mark.slow
def test_sft_context_parallel(messages_dataset, tmp_path):
    """context_parallel=True: packed sequence axis sharded over the mesh
    `model` axis with ring attention; loss must track the plain trainer's
    (same data/seed, identical objective by construction)."""
    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.train.generator_only import train_generator

    mesh = make_mesh(MeshConfig(data=2, model=4))
    result = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=str(tmp_path / "cp_out"),
        num_train_epochs=2,
        seq_length=64,
        per_device_train_batch_size=2,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        lora_r=4,
        lora_alpha=8,
        use_peft=True,
        gradient_checkpointing=False,
        mesh=mesh,
        context_parallel=True,
        neftune_noise_alpha=0,
    )
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["eval_loss"])

    # same run without CP on a plain data mesh → same ballpark loss
    mesh2 = make_mesh(MeshConfig(data=8, model=1))
    ref = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=str(tmp_path / "ref_out"),
        num_train_epochs=2,
        seq_length=64,
        per_device_train_batch_size=1,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        lora_r=4,
        lora_alpha=8,
        use_peft=True,
        gradient_checkpointing=False,
        mesh=mesh2,
        neftune_noise_alpha=0,
    )
    assert abs(result["eval_loss"] - ref["eval_loss"]) < 0.5


@pytest.mark.slow
def test_sft_context_parallel_rejects_padding(messages_dataset, tmp_path):
    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.train.generator_only import train_generator

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with pytest.raises(ValueError, match="packing"):
        train_generator(
            "tiny", messages_dataset, local_dataset=True,
            output_dir=str(tmp_path / "x"), seq_length=64, packing=False,
            mesh=mesh, context_parallel=True,
        )


@pytest.mark.slow
def test_sft_context_parallel_zigzag(messages_dataset, tmp_path):
    """cp_layout="zigzag" (balanced causal ring): the trainer permutes
    each packed block into zigzag order and the eval loss must MATCH the
    contiguous-CP run exactly — same objective, different device layout."""
    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.train.generator_only import train_generator

    common = dict(
        local_dataset=True, num_train_epochs=2, seq_length=64,
        per_device_train_batch_size=2, eval_steps=0, logging_steps=2,
        validation_split=0.2, lora_r=4, lora_alpha=8, use_peft=True,
        gradient_checkpointing=False, context_parallel=True,
        neftune_noise_alpha=0,
    )
    zz = train_generator(
        "tiny", messages_dataset, output_dir=str(tmp_path / "zz_out"),
        mesh=make_mesh(MeshConfig(data=2, model=4)), cp_layout="zigzag", **common,
    )
    ref = train_generator(
        "tiny", messages_dataset, output_dir=str(tmp_path / "ref_out"),
        mesh=make_mesh(MeshConfig(data=2, model=4)), **common,
    )
    assert np.isfinite(zz["final_loss"])
    # identical objective; small drift allowed (fp reassociation differs
    # across layouts, so 2 epochs of training diverge in the last digits)
    assert abs(zz["eval_loss"] - ref["eval_loss"]) < 2e-2
    assert abs(zz["final_loss"] - ref["final_loss"]) < 5e-2


@pytest.mark.slow
def test_sft_moe_with_aux(messages_dataset, tmp_path):
    """MoE generator through the SFT loop with the load-balancing aux in
    the loss (moe_aux_weight > 0): runs, loss finite, router trains."""
    from dalm_tpu.train.generator_only import train_generator

    out = str(tmp_path / "sft_moe_out")
    result = train_generator(
        "tiny-moe",
        messages_dataset,
        local_dataset=True,
        output_dir=out,
        num_train_epochs=2,
        seq_length=64,
        per_device_train_batch_size=1,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        use_peft=False,  # full fine-tune: the router must receive grads
        gradient_checkpointing=True,  # aux must survive the remat boundary
        moe_aux_weight=0.01,
    )
    assert np.isfinite(result["final_loss"])
    assert np.isfinite(result["eval_loss"])


@pytest.mark.slow
def test_sft_pipeline_parallel_full_loop(messages_dataset, tmp_path):
    """PP through the SHIPPED trainer (pipeline_stages=2 on the virtual
    8-device mesh → data=4 × stage=2): full optimizer loop, validation,
    merged-artifact save; the exported checkpoint loads PP-agnostically
    and its plain-decoder eval loss matches the trainer's report."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from dalm_tpu.train.generator_only import train_generator

    out = str(tmp_path / "sft_pp_out")
    result = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=out,
        num_train_epochs=2,
        seq_length=64,
        per_device_train_batch_size=2,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        use_peft=False,
        pipeline_stages=2,
        pp_microbatches=2,
        neftune_noise_alpha=0,  # exact eval-loss cross-check below
    )
    assert result["steps"] > 0
    assert np.isfinite(result["final_loss"]) and np.isfinite(result["eval_loss"])

    # the merged export loads through the standard (PP-agnostic) path
    from dalm_tpu.models.registry import load_pretrained, build_decoder

    cfg, params = load_pretrained(os.path.join(out, "final_checkpoint"))
    model = build_decoder(cfg)
    ids = jnp.asarray(np.arange(1, 17, dtype=np.int32)[None, :])
    logits = model.apply({"params": params}, ids, jnp.ones_like(ids))
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_sft_pp_times_tp_trainer(messages_dataset, tmp_path):
    """PP × TP through the trainer: pipeline_stages=2, pp_model_parallel=2
    → (data=2, stage=2, model=2); runs, converges to a finite loss."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from dalm_tpu.train.generator_only import train_generator

    result = train_generator(
        "tiny",
        messages_dataset,
        local_dataset=True,
        output_dir=None,
        num_train_epochs=1,
        seq_length=64,
        per_device_train_batch_size=2,
        eval_steps=0,
        logging_steps=2,
        validation_split=0.2,
        use_peft=False,
        pipeline_stages=2,
        pp_model_parallel=2,
        pp_microbatches=2,
    )
    assert result["steps"] > 0 and np.isfinite(result["final_loss"])


def test_sft_pp_rejects_peft_and_cp(messages_dataset):
    from dalm_tpu.train.generator_only import train_generator

    with pytest.raises(ValueError, match="use_peft=False"):
        train_generator("tiny", messages_dataset, pipeline_stages=2, use_peft=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        train_generator(
            "tiny", messages_dataset, pipeline_stages=2, use_peft=False,
            context_parallel=True,
        )


def test_sft_rejects_undersized_checkpoint_vocab(messages_dataset, tmp_path):
    """A loaded checkpoint whose vocab is smaller than the tokenizer's id
    range must error loudly — XLA clamps the OOB gathers silently and
    training NaNs instead (hit by a round-5 drive with a 128-vocab toy
    checkpoint under the 256-id ByteTokenizer)."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from dalm_tpu.models.decoder import Decoder, DecoderConfig
    from dalm_tpu.models.registry import save_pretrained
    from dalm_tpu.core.mesh import unbox
    from dalm_tpu.train.generator_only import train_generator

    cfg = dataclasses.replace(DecoderConfig.tiny(vocab_size=128))
    dec = Decoder(cfg)
    import jax

    params = unbox(dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                            jnp.ones((1, 8), jnp.int32))["params"])
    ckpt = str(tmp_path / "small_vocab")
    save_pretrained(ckpt, cfg, params)
    with pytest.raises(ValueError, match="vocab_size 128 < tokenizer"):
        train_generator(ckpt, messages_dataset, local_dataset=True,
                        output_dir=str(tmp_path / "out"), num_train_epochs=1,
                        seq_length=32, per_device_train_batch_size=1)
