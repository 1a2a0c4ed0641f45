"""Generator-only supervised fine-tuning (SFT).

Twin of `/root/reference/dalm/training/generator_only/trainer.py`
(`train_generator`, :140-265) — the reference wraps TRL's ``SFTTrainer``;
here the whole trainer is first-party JAX:

- chatml formatting of ``messages`` datasets + EOS-joined packing into
  fixed ``seq_length`` blocks (static shapes; TRL ``packing=True``);
- NEFTune noisy embeddings (α=5 default, `trainer.py:219`) inside the
  jitted step;
- LoRA r=256 α=512 on q_proj/v_proj with frozen base (`:190-197`;
  bitsandbytes-4bit base becomes bf16-or-quantized per dtype policy);
- AdamW (weight_decay 0.05) + cosine schedule w/ warmup (`:205-221` —
  ``paged_adamw_32bit`` is a CUDA memory-paging detail with no TPU
  meaning; optimizer math is AdamW);
- periodic validation loss every ``eval_steps`` (`evaluation_strategy=
  steps`), save per epoch + ``final_checkpoint`` (`:263-265`);
- gradient checkpointing via per-layer ``jax.remat``
  (`gradient_checkpointing=True` default).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.core.dtypes import parse_dtype
from dalm_tpu.core.mesh import MeshConfig, make_mesh, put_batch, put_sharded, replicated, unbox
from dalm_tpu.core.multihost import (
    fetch_global,
    host_batch_slice,
    initialize_distributed,
    is_main_process,
)
from dalm_tpu.data.sft import (
    chars_token_ratio,
    create_datasets,
    pack_dataset,
    pad_dataset,
)
from dalm_tpu.data.tokenizer import resolve_tokenizer
from dalm_tpu.losses.causal import causal_lm_loss
from dalm_tpu.models.registry import build_decoder
from dalm_tpu.models.registry import resolve_decoder, save_pretrained
from dalm_tpu.train.metrics import MetricsLogger, WindowedThroughput
from dalm_tpu.train.optim import make_optimizer
from dalm_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


def train_generator(
    model_name: str,
    dataset_name: str,
    local_dataset: bool = True,
    run_name: str = "generator_finetuning",
    output_dir: str = "./generator_finetuned_model",
    log_with: Optional[str] = None,
    size_valid_set: Optional[int] = None,
    validation_split: Optional[float] = 0.05,
    shuffle_buffer: Optional[int] = None,
    num_train_epochs: int = 1,
    split: str = "train",
    streaming: bool = False,
    seq_length: int = 2600,
    num_workers: int = 4,
    eval_steps: int = 200,
    logging_steps: int = 10,
    per_device_train_batch_size: int = 1,
    per_device_eval_batch_size: int = 1,
    gradient_accumulation_steps: int = 1,
    gradient_checkpointing: bool = True,
    group_by_length: bool = False,  # accepted for parity; packing makes it moot
    packing: bool = True,
    lora_alpha: float = 512,
    lora_dropout: float = 0.05,
    lora_r: int = 256,
    learning_rate: float = 1e-4,
    lr_scheduler_type: str = "cosine",
    num_warmup_steps: int = 100,
    weight_decay: float = 0.05,
    optimizer_type: str = "adamw",  # paged_adamw_32bit → adamw on TPU
    neftune_noise_alpha: float = 5,
    # --- TPU-native extensions ---
    tokenizer: str = "byte",
    dtype: Optional[str] = None,
    mesh=None,
    use_peft: bool = True,
    seed: int = 42,
    max_train_blocks: Optional[int] = None,
    export_peft: bool = False,
    context_parallel: bool = False,  # seq over mesh `model` axis (ring attention)
    cp_layout: str = "contiguous",  # "zigzag" balances causal ring work (~2× at scale)
    # MoE generators (models/moe.py): weight on the layer-mean Switch
    # load-balancing aux added to the SFT loss (HF router_aux_loss_coef
    # twin; 0 disables — mandatory >0 when training a router from
    # scratch or experts collapse onto the top few).
    moe_aux_weight: float = 0.0,
    # Pipeline parallelism (train/pipeline_parallel.py): >1 shards the
    # LAYER stack over a `stage` mesh axis, microbatches flow GPipe-style
    # through one SPMD program. Full-parameter training only
    # (use_peft=False): PP exists for layer stacks too big for one
    # chip's HBM, where LoRA-on-a-frozen-base does not shrink the
    # dominant cost (the resident base weights themselves). Composes
    # with MoE (moe_aux_weight) and with TP (pp_model_parallel>1 adds a
    # GSPMD-auto `model` axis inside each stage).
    pipeline_stages: int = 0,
    pp_microbatches: int = 0,  # per-data-shard; default = local batch size
    pp_model_parallel: int = 1,
) -> dict:
    args = {
        k: v for k, v in locals().items()
        if v is None or isinstance(v, (float, int, str, bool))
    }
    # Pod scale-out: join the multi-process world before the mesh is
    # built (jax.devices() is global after this). No-op single-host.
    initialize_distributed()
    multihost = jax.process_count() > 1
    pp = int(pipeline_stages) > 1
    pp_mb = 0
    if pp:
        if use_peft:
            raise ValueError(
                "pipeline_stages requires use_peft=False: PP trains the full "
                "parameter set (a frozen LoRA base would still have to be "
                "resident per stage, defeating the layer sharding)"
            )
        if context_parallel:
            raise ValueError(
                "pipeline_stages and context_parallel are mutually exclusive "
                "(PP pipelines microbatches over layers; CP shards the "
                "sequence over the model axis — compose TP with PP via "
                "pp_model_parallel instead)"
            )
        from dalm_tpu.train.pipeline_parallel import make_pp_mesh

        mesh = make_pp_mesh(int(pipeline_stages), model_parallel=int(pp_model_parallel))
        pp_mb = int(pp_microbatches) or per_device_train_batch_size
        if per_device_train_batch_size % pp_mb:
            raise ValueError(
                f"per_device_train_batch_size {per_device_train_batch_size} "
                f"must be divisible by pp_microbatches {pp_mb}"
            )
    elif mesh is None:
        mesh = make_mesh(MeshConfig())
    global_batch = per_device_train_batch_size * mesh.shape["data"]

    tok = resolve_tokenizer(tokenizer)
    tok.padding_side = "right"  # reference `trainer.py:175`

    compute_dtype = parse_dtype(dtype) if dtype else None
    vocab = -(-tok.vocab_size // 128) * 128
    cfg, init_params = resolve_decoder(model_name, dtype=compute_dtype, vocab_size=vocab)
    if cfg.vocab_size < tok.vocab_size:
        # A loaded checkpoint keeps its own embedding table (resolve's
        # vocab_size only applies to presets). Token ids beyond it would
        # gather out of bounds — XLA clamps silently and training NaNs
        # instead of erroring (hit by a round-5 drive with a 128-vocab
        # toy checkpoint under the 256-id ByteTokenizer).
        raise ValueError(
            f"model vocab_size {cfg.vocab_size} < tokenizer vocab "
            f"{tok.vocab_size}: token ids would index out of bounds; use a "
            "tokenizer the checkpoint was built for"
        )
    field_names = {f.name for f in dataclasses.fields(cfg)}
    if gradient_checkpointing and "remat" in field_names:
        cfg = dataclasses.replace(cfg, remat=True)
    # Long-sequence attention: the Pallas flash kernel is required at the
    # reference's seq_length (einsum attention cannot even compile B4
    # S2560 on one chip — measured: flash 352 ms/step, einsum OOM).
    if "attention_impl" in field_names and jax.default_backend() == "tpu":
        if seq_length % 128 == 0:
            cfg = dataclasses.replace(cfg, attention_impl="flash")
        elif seq_length >= 1024:
            logger.warning(
                "seq_length %d is not a multiple of 128 — the flash attention "
                "kernel is disabled and long sequences may exhaust HBM; "
                "prefer e.g. 2560 over the reference's 2600", seq_length,
            )
    cp_size = mesh.shape.get("model", 1) if context_parallel else 1
    if context_parallel:
        # Context parallelism: packed sequence axis over the mesh `model`
        # axis, ring attention over ICI (train/context_parallel.py).
        if "attention_impl" not in field_names:
            raise ValueError("context_parallel requires a Llama-family decoder config")
        if not packing:
            raise ValueError("context_parallel requires packing=True (no padding path)")
        if seq_length % max(cp_size, 1):
            raise ValueError(f"seq_length {seq_length} must divide by model-axis size {cp_size}")
        if cp_layout == "zigzag" and seq_length % max(2 * cp_size, 1):
            raise ValueError(
                f"cp_layout='zigzag' needs seq_length divisible by 2*cp ({2 * cp_size})"
            )
    model = build_decoder(cfg)
    # The ring variant only traces under shard_map (axis must be bound):
    # init and saved artifacts use the plain config, training the ring one.
    cp_model = (
        build_decoder(dataclasses.replace(cfg, attention_impl="ring", ring_layout=cp_layout))
        if context_parallel else None
    )

    train_data, valid_data = create_datasets(
        dataset_name, split=split, validation_split=validation_split,
        size_valid_set=size_valid_set, streaming=streaming,
        shuffle_buffer=shuffle_buffer, num_workers=num_workers,
        local_dataset=local_dataset, seed=seed,
    )
    ratio = chars_token_ratio(train_data, tok)
    logger.info("chars/token ratio: %.2f", ratio)

    if packing:
        train_blocks = pack_dataset(train_data, tok, seq_length, max_blocks=max_train_blocks)
        valid_blocks = pack_dataset(valid_data, tok, seq_length, max_blocks=256)
        train_masks = np.ones_like(train_blocks)
        valid_masks = np.ones_like(valid_blocks)
        if len(train_blocks) == 0:
            raise ValueError(f"dataset packs to zero {seq_length}-token blocks")
        logger.info(
            "packed %d train / %d valid blocks of %d tokens",
            len(train_blocks), len(valid_blocks), seq_length,
        )
    else:
        # TRL packing=False equivalent (`trainer.py:231`): one sample per
        # row, right-padded to seq_length, loss masked to real tokens.
        if group_by_length:
            logger.warning(
                "group_by_length has no effect here: TPU static shapes pad "
                "every sample to seq_length regardless of batch composition"
            )
        train_blocks, train_masks = pad_dataset(
            train_data, tok, seq_length, max_samples=max_train_blocks
        )
        valid_blocks, valid_masks = pad_dataset(valid_data, tok, seq_length, max_samples=256)
        if len(train_blocks) == 0:
            raise ValueError("dataset yields zero non-empty samples")
        logger.info(
            "padded %d train / %d valid samples to %d tokens",
            len(train_blocks), len(valid_blocks), seq_length,
        )

    steps_per_epoch = math.ceil(len(train_blocks) / global_batch / gradient_accumulation_steps)
    total_steps = steps_per_epoch * num_train_epochs

    tx = make_optimizer(
        learning_rate=learning_rate,
        lr_scheduler_type=lr_scheduler_type,
        num_warmup_steps=num_warmup_steps,
        total_steps=total_steps,
        weight_decay=weight_decay,
        gradient_accumulation_steps=gradient_accumulation_steps,
    )

    rng = jax.random.PRNGKey(seed)
    init_rng, noise_rng = jax.random.split(rng)
    if init_params is None:
        ids = jnp.zeros((1, min(seq_length, 64)), jnp.int32)
        init_params = model.init(init_rng, ids, jnp.ones_like(ids))["params"]
    init_params = unbox(init_params)

    lora_spec = None
    base_params = None
    if pp:
        from dalm_tpu.train import pipeline_parallel as pp_mod

        io_h, stacked_h = pp_mod.split_decoder_params(init_params, cfg.num_layers)
        io_p, st_p = pp_mod.place_pp_params(io_h, stacked_h, mesh, model=model)
        del init_params, io_h, stacked_h
        trainable = {"io": io_p, "stacked": st_p}
        # optax init (zeros_like) inherits each leaf's sharding, so the
        # Adam moments live stage-sharded next to their params.
        state = TrainState.create(trainable, tx)
    else:
        if use_peft:
            from dalm_tpu.models import lora as lora_mod

            lora_spec = lora_mod.LoraSpec(
                rank=lora_r, alpha=lora_alpha, dropout=lora_dropout,
                target_modules=lora_mod.CAUSAL_LM_TARGETS,
            )
            base_params = jax.device_put(init_params, replicated(mesh))
            trainable = lora_mod.init_lora_params(jax.random.fold_in(init_rng, 3), init_params, lora_spec)
        else:
            trainable = init_params

        state = TrainState.create(trainable, tx)
        state = jax.device_put(state, replicated(mesh))

    def effective(params, base):
        if not use_peft:
            return params
        from dalm_tpu.models import lora as lora_mod

        return lora_mod.merge_lora(base, params, lora_spec, None)

    if pp:
        pp_loss = pp_mod.build_pp_lm_loss(
            model, mesh, pp_mb,
            moe_aux_weight=float(moe_aux_weight),
            neftune_alpha=float(neftune_noise_alpha),
        )

        def loss_fn(params, base, batch, step_rng):
            return pp_loss(
                params["io"], params["stacked"],
                batch["input_ids"], batch["attention_mask"], step_rng,
            )

        def eval_loss_fn(params, base, batch):
            return pp_loss(
                params["io"], params["stacked"],
                batch["input_ids"], batch["attention_mask"],
            )
    elif context_parallel:
        from dalm_tpu.train.context_parallel import build_cp_loss

        cp_loss = build_cp_loss(
            cp_model, mesh, axis_name="model", data_axis="data", layout=cp_layout
        )

        def loss_fn(params, base, batch, step_rng):
            return cp_loss(
                effective(params, base), batch["input_ids"],
                noise_rng=step_rng, neftune_alpha=float(neftune_noise_alpha),
            )

        def eval_loss_fn(params, base, batch):
            return cp_loss(effective(params, base), batch["input_ids"])
    else:
        moe_w = float(moe_aux_weight)

        def loss_fn(params, base, batch, step_rng):
            out = model.apply(
                {"params": effective(params, base)},
                batch["input_ids"],
                batch["attention_mask"],
                neftune_alpha=float(neftune_noise_alpha),
                noise_rng=step_rng,
                return_moe_aux=moe_w > 0,
            )
            if moe_w > 0:
                logits, moe_aux = out
            else:
                logits, moe_aux = out, 0.0
            loss = causal_lm_loss(logits, batch["input_ids"], batch["attention_mask"])
            return loss + moe_w * moe_aux

        def eval_loss_fn(params, base, batch):
            logits = model.apply(
                {"params": effective(params, base)}, batch["input_ids"], batch["attention_mask"]
            )
            return causal_lm_loss(logits, batch["input_ids"], batch["attention_mask"])

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, base, batch, step_rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, base, batch, step_rng)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, base, batch):
        return eval_loss_fn(params, base, batch)

    if context_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from dalm_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

        _cp_sharding = NamedSharding(mesh, PS(DATA_AXIS, MODEL_AXIS))
        _cp_perm = None
        if cp_layout == "zigzag":
            from dalm_tpu.kernels.ring_attention import zigzag_indices

            _cp_perm = zigzag_indices(seq_length, cp_size)

        def _put(d):
            arrays = {k: np.asarray(v, np.int32) for k, v in d.items()}
            if _cp_perm is not None:
                arrays = {k: v[:, _cp_perm] for k, v in arrays.items()}
            # multi-host CP note: each process feeds its local batch rows
            # with the full sequence — valid when the `model` (CP) axis
            # is host-local, the standard layout (CP over ICI, DP over
            # DCN); jax raises on a host-spanning CP axis.
            return put_sharded(arrays, {k: _cp_sharding for k in arrays})
    else:
        def _put(d):
            return put_batch(d, mesh, np.int32)

    def run_validation(params):
        if len(valid_blocks) == 0:
            return float("nan")
        losses = []
        ebs = per_device_eval_batch_size * mesh.shape["data"]
        if pp:
            # the pipelined program reshapes each data shard's rows into
            # pp_mb microbatches — eval batches must divide the same way
            div = mesh.shape["data"] * pp_mb
            ebs = max(div, ebs - ebs % div)
        if multihost:
            # host_batch_slice floor-divides by process_count; mirror the
            # train loop's lcm rounding so a host-spanning model axis cannot
            # silently drop rows and under-fill the assembled global batch.
            div = math.lcm(mesh.shape["data"], jax.process_count())
            ebs = max(div, ebs - ebs % div)
        for s in range(0, len(valid_blocks) - ebs + 1, ebs):
            blk = valid_blocks[s : s + ebs]
            msk = valid_masks[s : s + ebs]
            if multihost:
                hs = host_batch_slice(ebs)
                blk, msk = blk[hs], msk[hs]
            batch = _put({"input_ids": blk, "attention_mask": msk})
            losses.append(float(eval_step(params, base_params, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    # Host-side metric streams come from process 0 only.
    tracker = MetricsLogger(
        output_dir, project_name=run_name, config=args,
        report_to=log_with or "all",
        enabled=(log_with is not None or output_dir is not None) and is_main_process(),
    )
    timer = WindowedThroughput()

    completed = 0
    # Loss stays on device between logging points; see rag_e2e.py note.
    final_loss = float("nan")
    last = None
    timer.mark(0)
    for epoch in range(num_train_epochs):
        # per-(seed, epoch) stream: resume-stable shuffle order
        order = np.random.default_rng([seed, epoch]).permutation(len(train_blocks))
        shards = mesh.shape["data"]
        if pp:
            shards *= pp_mb  # each shard's rows must split into pp_mb microbatches
        if multihost:
            # partial batches must also split evenly across processes
            shards = math.lcm(shards, jax.process_count())
        for s in range(0, len(train_blocks), global_batch):
            idx = order[s : s + global_batch]
            if len(idx) % shards:
                dropped = len(idx) % shards
                idx = idx[: len(idx) - dropped]
                logger.warning(
                    "dropping %d trailing row(s): partial batch not a multiple "
                    "of %d data shards", dropped, shards,
                )
                if len(idx) == 0:
                    continue
            if multihost:
                # every process walks the same global order; each feeds
                # only its contiguous row share of the global batch
                idx = idx[host_batch_slice(len(idx))]
            batch = _put({"input_ids": train_blocks[idx], "attention_mask": train_masks[idx]})
            step_rng = jax.random.fold_in(noise_rng, completed)
            state, loss = train_step(state, base_params, batch, step_rng)
            last = loss
            completed += 1
            if completed % logging_steps == 0:
                final_loss = float(jax.device_get(last))  # device sync point
                timer.mark(completed)
                tracker.log({"train/loss": final_loss}, step=completed)
            if eval_steps and completed % eval_steps == 0:
                val = run_validation(state.params)
                tracker.log({"eval/loss": val}, step=completed)
                logger.info("step %d eval loss %.4f", completed, val)
                timer.mark(completed)  # exclude validation from throughput windows
        # save per epoch (reference save_strategy="epoch")
        if output_dir:
            _save(output_dir, cfg, state, base_params, lora_spec, tok, tokenizer, use_peft,
                  export_peft=export_peft, base_name=model_name,
                  pp_layers=cfg.num_layers if pp else None)
            timer.mark(completed)  # exclude the save from throughput windows

    if last is not None:
        final_loss = float(jax.device_get(last))
        timer.mark(completed)
    if output_dir:
        final_dir = os.path.join(output_dir, "final_checkpoint")
        _save(final_dir, cfg, state, base_params, lora_spec, tok, tokenizer, use_peft,
              export_peft=export_peft, base_name=model_name,
              pp_layers=cfg.num_layers if pp else None)
    tracker.close()
    val = run_validation(state.params)
    return {
        "final_loss": final_loss,
        "eval_loss": val,
        "steps": completed,
        "samples_per_sec": timer.samples_per_sec(global_batch),
        "chars_per_token": ratio,
    }


def _save(out_dir, cfg, state, base_params, lora_spec, tok, tokenizer_name, use_peft,
          export_peft=False, base_name="", pp_layers=None):
    # fetch_global is a collective (all processes call _save together);
    # the file writes land on process 0 only.
    main = is_main_process()
    if pp_layers:
        # PP export: re-merge the stage-stacked layer tree into the
        # standard per-layer dict so the artifact loads everywhere
        # (load_pretrained / serve / eval are PP-agnostic).
        from dalm_tpu.train.pipeline_parallel import merge_decoder_params

        io_h = fetch_global(state.params["io"])
        st_h = fetch_global(state.params["stacked"])
        if main:
            merged = merge_decoder_params(io_h, st_h, pp_layers)
            save_pretrained(out_dir, cfg, merged, extra={"tokenizer": tokenizer_name})
        return
    if use_peft:
        from dalm_tpu.models import lora as lora_mod

        base_host = fetch_global(base_params)
        flat = fetch_global(state.params)
        if main:
            save_pretrained(out_dir, cfg, base_host, extra={"tokenizer": tokenizer_name})
            lora_mod.save_adapter(out_dir, flat, lora_spec)
            if export_peft:
                from dalm_tpu.models.hf_loader import export_peft_if_supported

                export_peft_if_supported(out_dir, flat, lora_spec, cfg, base_name)
    else:
        params_host = fetch_global(state.params)
        if main:
            save_pretrained(out_dir, cfg, params_host, extra={"tokenizer": tokenizer_name})
