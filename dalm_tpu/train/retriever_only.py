"""Retriever-only contrastive training (in-batch negatives).

Twin of `/root/reference/dalm/training/retriever_only/train_retriever_only.py`
(`train_retriever`, :175-464), TPU-native:

- one jitted train step over the global mesh — batch sharded over
  ``data``, params replicated (or TP-sharded for big encoders); the
  gradient all-reduce DDP did in backward is a GSPMD ``psum`` fused into
  the compiled step;
- the two encoder forwards (query, passage) run in the same XLA program
  as the loss and optimizer update — zero host round-trips per step;
- Orbax checkpoint/resume with ``step_k``/``epoch_e`` naming and
  ``skip_first_batches`` semantics.

Flag names/defaults mirror the reference signature (`:175-203`).
"""

from __future__ import annotations

import logging
import math
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from datasets import Dataset

from dalm_tpu.core.dtypes import parse_dtype
from dalm_tpu.core.mesh import MeshConfig, make_mesh, put_batch, replicated
from dalm_tpu.core.multihost import fetch_global, initialize_distributed, is_main_process
from dalm_tpu.data.loading import load_dataset
from dalm_tpu.data.preprocess import preprocess_retriever_dataset
from dalm_tpu.data.tokenizer import resolve_tokenizer
from dalm_tpu.losses.contrastive import contrastive_loss
from dalm_tpu.models.embedder import SentenceEmbedder
from dalm_tpu.models.registry import resolve_decoder, resolve_encoder, save_pretrained
from dalm_tpu.train import checkpoints as ckpt
from dalm_tpu.train.data_iter import epoch_batches, num_batches_per_epoch
from dalm_tpu.train.metrics import MetricsLogger, WindowedThroughput
from dalm_tpu.train.optim import make_optimizer
from dalm_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

BATCH_COLUMNS = (
    "query_input_ids",
    "query_attention_mask",
    "passage_input_ids",
    "passage_attention_mask",
)


def train_retriever(
    retriever_name_or_path: str,
    dataset_or_path: Union[str, Dataset],
    passage_column_name: str = "Abstract",
    query_column_name: str = "Question",
    query_max_len: int = 50,
    passage_max_len: int = 128,
    per_device_train_batch_size: int = 32,
    learning_rate: float = 1e-4,
    logit_scale: int = 100,
    weight_decay: float = 0.0,
    num_train_epochs: int = 1,
    max_train_steps: Optional[int] = None,
    gradient_accumulation_steps: int = 1,
    lr_scheduler_type: str = "linear",
    num_warmup_steps: int = 0,
    output_dir: Optional[str] = None,
    seed: int = 42,
    hub_model_id: Optional[str] = None,  # accepted, unused — parity (cli.py:99-107)
    hub_token: Optional[str] = None,  # accepted, unused — parity
    checkpointing_steps: Optional[Union[int, str]] = None,
    resume_from_checkpoint: Optional[str] = None,
    with_tracking: bool = True,
    report_to: str = "all",
    sanity_test: bool = True,
    use_peft: bool = False,
    use_bnb: bool = False,
    is_autoregressive: bool = False,
    # --- TPU-native extensions (not in reference) ---
    tokenizer: str = "byte",
    dtype: Optional[str] = None,
    mesh: Optional[object] = None,
    model_parallel: int = 1,
    use_dropout: bool = True,
    local_negatives: bool = True,
    export_peft: bool = False,
    profile_dir: Optional[str] = None,
    profile_start_step: int = 10,
    profile_num_steps: int = 5,
) -> dict:
    """Returns a summary dict {"final_loss", "steps", "samples_per_sec"}."""
    args = {
        k: v for k, v in locals().items()
        if v is None or isinstance(v, (float, int, str, bool))
    }

    # Pod scale-out: join the multi-process world before the mesh is
    # built (jax.devices() is global after this). No-op single-host.
    # Twin of the reference's `accelerate launch` DDP contract
    # (`train_retriever_only.py:255-263` via Accelerator()).
    initialize_distributed()
    multihost = jax.process_count() > 1
    if mesh is None:
        mesh = make_mesh(MeshConfig(model=model_parallel))
    data_shards = mesh.shape["data"]
    global_batch = per_device_train_batch_size * data_shards

    tok = resolve_tokenizer(tokenizer, add_eos_token=is_autoregressive)
    if is_autoregressive:
        tok.padding_side = "left"

    compute_dtype = parse_dtype(dtype) if dtype else None
    if is_autoregressive:
        model_cfg, init_params = resolve_decoder(
            retriever_name_or_path, dtype=compute_dtype, vocab_size=_vocab_for(tok)
        )
    else:
        model_cfg, init_params = resolve_encoder(
            retriever_name_or_path, dtype=compute_dtype, vocab_size=_vocab_for(tok)
        )
    model = SentenceEmbedder(model_cfg, is_autoregressive=is_autoregressive)

    dataset = load_dataset(dataset_or_path)
    processed = dataset.map(
        lambda ex: preprocess_retriever_dataset(
            ex, tok, query_column_name, passage_column_name, query_max_len, passage_max_len
        ),
        batched=True,
        remove_columns=dataset.column_names,
        desc="tokenize",
    )

    if sanity_test:
        _sanity_check(processed, query_max_len, passage_max_len)

    steps_per_epoch = math.ceil(
        num_batches_per_epoch(len(processed), global_batch) / gradient_accumulation_steps
    )
    if max_train_steps is None:
        max_train_steps = num_train_epochs * steps_per_epoch
    else:
        num_train_epochs = math.ceil(max_train_steps / steps_per_epoch)

    tx = make_optimizer(
        learning_rate=learning_rate,
        lr_scheduler_type=str(lr_scheduler_type),
        num_warmup_steps=num_warmup_steps,
        total_steps=max_train_steps,
        weight_decay=weight_decay,
        gradient_accumulation_steps=gradient_accumulation_steps,
    )

    rng = jax.random.PRNGKey(seed)
    init_rng, dropout_rng = jax.random.split(rng)
    if init_params is None:
        init_params = model.init_params(init_rng, seq_len=query_max_len)
    from dalm_tpu.core.mesh import unbox

    init_params = unbox(init_params)

    # LoRA (`use_peft`): freeze the base tree, train only adapter params —
    # reference LoRA config r=8 α=16 on kqv / q_proj,v_proj
    # (`retriever_only_base_model.py:93-110`).
    lora_spec = None
    base_params = None
    if use_peft:
        from dalm_tpu.models import lora as lora_mod

        lora_spec = (
            lora_mod.LoraSpec.for_causal_lm() if is_autoregressive
            else lora_mod.LoraSpec.for_encoder()
        )
        base_params = init_params
        trainable = lora_mod.init_lora_params(jax.random.fold_in(init_rng, 7), base_params, lora_spec)
        if use_bnb:
            # int8 frozen base — the bnb-nf4 equivalent (models/quant.py)
            from dalm_tpu.models.quant import quantize_params

            base_params = quantize_params(base_params)
        base_params = jax.device_put(base_params, replicated(mesh))
    else:
        if use_bnb:
            logger.warning("use_bnb without use_peft is ignored (quantized weights are frozen)")
        trainable = init_params

    state = TrainState.create(trainable, tx)
    state = jax.device_put(state, replicated(mesh))

    dropout = use_dropout and getattr(model_cfg, "hidden_dropout", 0.0) > 0

    def loss_fn(params, base_params, batch, step_rng):
        if use_peft:
            from dalm_tpu.models import lora as lora_mod

            base = base_params
            if use_bnb:
                from dalm_tpu.models.quant import dequantize_params

                base = dequantize_params(base)
            lora_drop_rng = None if step_rng is None else jax.random.fold_in(step_rng, 99)
            eff = lora_mod.merge_lora(base, params, lora_spec, lora_drop_rng if dropout else None)
        else:
            eff = params
        d_rng = step_rng if dropout else None
        q = model.embed(eff, batch["query_input_ids"], batch["query_attention_mask"], d_rng)
        p_rng = None if d_rng is None else jax.random.fold_in(d_rng, 1)
        p = model.embed(eff, batch["passage_input_ids"], batch["passage_attention_mask"], p_rng)
        # Symmetric NT-Xent both directions, averaged — matches the
        # reference's loss + loss_transpose / 2 (`train_retriever_only.py:369-374`).
        block = per_device_train_batch_size if (local_negatives and data_shards > 1) else None
        loss, _ = contrastive_loss(
            q.astype(jnp.float32), p.astype(jnp.float32), float(logit_scale),
            local_negatives_block=block,
        )
        return loss

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, base, batch, step_rng):
        # base rides as an argument — closing over it would bake the
        # frozen weights into the program as constants.
        loss, grads = jax.value_and_grad(loss_fn)(state.params, base, batch, step_rng)
        new_state = state.apply_gradients(grads)
        return new_state, loss

    # Host-side metric streams come from process 0 only (the reference
    # gated trackers on `accelerator.is_main_process`).
    tracker = MetricsLogger(
        output_dir, project_name="peft_contrastive_training", config=args,
        report_to=report_to, enabled=with_tracking and is_main_process(),
    )
    timer = WindowedThroughput()
    from dalm_tpu.core.profiling import Profiler

    profiler = Profiler(profile_dir, profile_start_step, profile_num_steps)

    # Resume (`train_rage2e.py:389-427` semantics).
    start_epoch, skip_batches, completed_steps = 0, 0, 0
    micro_steps, start_steps = 0, 0
    if resume_from_checkpoint:
        path = (
            resume_from_checkpoint
            if isinstance(resume_from_checkpoint, str) and os.path.isdir(str(resume_from_checkpoint))
            else ckpt.latest_checkpoint(output_dir or ".")
        )
        if path:
            state = ckpt.load_state(path, ckpt.abstract_like(state))
            kind, num = ckpt.parse_checkpoint_tag(path)
            if kind == "epoch":
                start_epoch = num + 1
                completed_steps = start_epoch * steps_per_epoch
            else:
                completed_steps = num
                start_epoch = completed_steps // steps_per_epoch
                skip_batches = (completed_steps % steps_per_epoch) * gradient_accumulation_steps
            start_steps = completed_steps
            logger.info("resumed from %s (epoch %d, step %d)", path, start_epoch, completed_steps)

    checkpoint_every = int(checkpointing_steps) if str(checkpointing_steps).isdigit() else None
    # Loss stays on device between logging points (per-step float()
    # readbacks serialize dispatch; the reference also only reads its
    # loss on the 100-step logging cadence, `train_retriever_only.py:386`).
    final_loss = float("nan")
    last = None

    for epoch in range(start_epoch, num_train_epochs):
        # per-(seed, epoch) stream: resume reproduces the same shuffles
        epoch_rng = np.random.default_rng([seed, epoch])
        loss_sum = None
        n_in_epoch = 0
        timer.mark(completed_steps)
        for batch_np in epoch_batches(
            processed, BATCH_COLUMNS, global_batch, rng=epoch_rng, skip_batches=skip_batches,
            multiple_of=mesh.shape["data"], process_shard=multihost,
        ):
            batch = put_batch(batch_np, mesh, np.int32)
            step_rng = jax.random.fold_in(
                dropout_rng, int(start_steps * gradient_accumulation_steps + micro_steps)
            )
            profiler.maybe_start(completed_steps)
            state, loss = train_step(state, base_params, batch, step_rng)
            last = loss
            loss_sum = loss if loss_sum is None else loss_sum + loss
            n_in_epoch += 1
            micro_steps += 1
            completed_steps = start_steps + micro_steps // gradient_accumulation_steps
            profiler.maybe_stop(completed_steps)

            stepped = micro_steps % gradient_accumulation_steps == 0
            if stepped and completed_steps % 100 == 0:
                final_loss = float(jax.device_get(last))  # device sync point
                timer.mark(completed_steps)
                logger.info("epoch %d step %d loss %.4f", epoch, completed_steps, final_loss)
                tracker.log({"train/loss": final_loss}, step=completed_steps)
            if stepped and checkpoint_every and completed_steps % checkpoint_every == 0 and output_dir:
                # Orbax saves are collective: every process calls save
                # (each writes its addressable shards); only the pruning
                # rmtree is main-process-gated.
                ckpt.save_state(output_dir, f"step_{completed_steps}", state)
                if is_main_process():
                    ckpt.prune_checkpoints(output_dir, keep_last=3)
                timer.mark(completed_steps)  # exclude ckpt I/O from throughput windows
            if completed_steps >= max_train_steps:
                break
        skip_batches = 0
        epoch_loss = float(jax.device_get(loss_sum)) / n_in_epoch if n_in_epoch else float("nan")
        if last is not None:
            final_loss = float(jax.device_get(last))
        timer.mark(completed_steps)
        tracker.log({"train/epoch_loss": epoch_loss, "epoch": epoch}, step=completed_steps)
        if checkpointing_steps == "epoch" and output_dir:
            ckpt.save_state(output_dir, f"epoch_{epoch}", state)
        if completed_steps >= max_train_steps:
            break

    if output_dir:
        # Final artifacts under {output_dir}/retriever (+ tokenizer info),
        # mirroring `train_retriever_only.py:408-420`. With LoRA, the base
        # stays frozen and the adapter is saved alongside (the reference's
        # peft save_pretrained saves only the adapter).
        retriever_dir = os.path.join(output_dir, "retriever")
        # fetch_global is a collective (all processes call it together);
        # the file writes themselves happen on process 0 only.
        if use_peft:
            from dalm_tpu.models import lora as lora_mod

            base_host = fetch_global(base_params)
            adapter_host = fetch_global(state.params)
            if is_main_process():
                save_pretrained(
                    retriever_dir, model_cfg, base_host,
                    extra={"tokenizer": tokenizer, "is_autoregressive": is_autoregressive},
                )
                lora_mod.save_adapter(retriever_dir, adapter_host, lora_spec)
                if export_peft:
                    from dalm_tpu.models.hf_loader import export_peft_if_supported

                    export_peft_if_supported(
                        retriever_dir, adapter_host, lora_spec,
                        model_cfg, retriever_name_or_path,
                    )
        else:
            params_host = fetch_global(state.params)
            if is_main_process():
                save_pretrained(
                    retriever_dir, model_cfg, params_host,
                    extra={"tokenizer": tokenizer, "is_autoregressive": is_autoregressive},
                )
    profiler.close()
    tracker.close()
    return {
        "final_loss": final_loss,
        "steps": completed_steps,
        "samples_per_sec": timer.samples_per_sec(global_batch),
        "avg_step_time": timer.avg,
    }


def _vocab_for(tok) -> int:
    # Round vocab up to a lane-friendly multiple of 128 for the MXU.
    return -(-tok.vocab_size // 128) * 128


def _sanity_check(processed, query_max_len: int, passage_max_len: int) -> None:
    """Twin of the reference's sanity test (shape check on a few rows)."""
    for i in range(min(2, len(processed))):
        row = processed[i]
        assert len(row["query_input_ids"]) == query_max_len
        assert len(row["passage_input_ids"]) == passage_max_len
