"""RAG-end2end joint training — the flagship path.

Twin of `/root/reference/dalm/training/rag_e2e/train_rage2e.py`
(`train_e2e`, :229-576): retriever + generator trained jointly with
``loss = symmetric NT-Xent + marginalized causal CE`` (:441-467), the
marginalization using only the positive (diagonal) passage score (known
reference behavior, :461-462).

TPU-native differences (SURVEY.md §7):
- retriever fwd ×2, similarity matmul, generator fwd, both losses, and
  the optimizer update are ONE compiled XLA program per step — the
  reference's per-sample Python loop in the marginalized loss
  (`train_utils.py:127-132`) is a vectorized mask;
- parallelism is mesh-declarative: batch over ``data`` (DP; gradient
  psum fused into backward), generator TP over ``model`` when sized so;
- in-batch negatives are per-global-batch here (the full Q@Pᵀ under
  pjit). Parity note (SURVEY.md §2.4): the reference's negatives are
  per-DDP-process; ``local_negatives=True`` (the default) restores
  per-data-shard semantics with a block-diagonal similarity mask, which
  also localizes the marginalized loss's passage softmax exactly as the
  reference's is;
- Orbax checkpoints: combined train state at step_k/epoch_e, final
  artifacts split into ``{output_dir}/retriever`` and
  ``{output_dir}/generator`` (`train_rage2e.py:508-524`).
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
from dalm_tpu.core.mesh import MeshConfig, make_mesh, put_batch, replicated, unbox
from dalm_tpu.core.multihost import fetch_global, initialize_distributed, is_main_process
from dalm_tpu.data.loading import load_dataset
from dalm_tpu.data.preprocess import preprocess_rag_e2e_dataset
from dalm_tpu.data.tokenizer import resolve_tokenizer
from dalm_tpu.losses.contrastive import contrastive_loss
from dalm_tpu.losses.marginalized import marginalized_nll_loss
from dalm_tpu.models.rag import Mode, RagE2EModel
from dalm_tpu.models.registry import resolve_decoder, resolve_encoder, save_pretrained
from dalm_tpu.train import checkpoints as ckpt
from dalm_tpu.train.data_iter import epoch_batches, num_batches_per_epoch
from dalm_tpu.train.metrics import MetricsLogger, WindowedThroughput
from dalm_tpu.train.optim import make_optimizer
from dalm_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


def _is_llama_hf_dir(spec) -> bool:
    """True for an HF checkpoint dir of a Llama-family (non-GPT2) model."""
    from dalm_tpu.models.registry import _is_hf_dir

    if not isinstance(spec, str) or not _is_hf_dir(spec):
        return False
    import json as _json

    with open(os.path.join(spec, "config.json")) as f:
        return _json.load(f).get("model_type", "") != "gpt2"


BATCH_COLUMNS = (
    "retriever_query_input_ids",
    "retriever_query_attention_mask",
    "retriever_passage_input_ids",
    "retriever_passage_attention_mask",
    "generator_input_input_ids",
    "generator_input_attention_mask",
    "query_passage_input_len",
)


def train_e2e(
    dataset_or_path: Union[str, Dataset],
    retriever_name_or_path: str,
    generator_name_or_path: str,
    passage_column_name: str = "Abstract",
    query_column_name: str = "Question",
    answer_column_name: str = "Answer",
    query_max_len: int = 50,
    passage_max_len: int = 128,
    generator_max_len: int = 256,
    per_device_train_batch_size: int = 32,
    learning_rate: float = 1e-4,
    logit_scale: int = 100,
    weight_decay: float = 0.0,
    num_train_epochs: int = 1,
    max_train_steps: Optional[int] = None,
    gradient_accumulation_steps: int = 1,
    lr_scheduler_type: str = "linear",
    num_warmup_steps: int = 100,
    output_dir: Optional[str] = None,
    seed: int = 42,
    hub_model_id: Optional[str] = None,  # accepted, unused — parity
    hub_token: Optional[str] = None,  # accepted, unused — parity
    checkpointing_steps: Optional[Union[int, str]] = None,
    resume_from_checkpoint: Optional[str] = None,
    with_tracking: bool = True,
    report_to: str = "all",
    sanity_test: bool = True,
    use_peft: Optional[Union[Mode, str]] = None,
    use_bnb: Optional[Union[Mode, str]] = None,
    retriever_is_autoregressive: bool = False,
    # --- TPU-native extensions ---
    retriever_tokenizer: str = "byte",
    generator_tokenizer: str = "byte",
    dtype: Optional[str] = None,
    mesh: Optional[object] = None,
    model_parallel: int = 1,
    use_dropout: bool = False,
    local_negatives: bool = True,
    live_index: bool = False,
    index_refresh_slice: int = 256,
    live_negatives_k: int = 0,  # >0: top-k hard negatives from the live index
    marginalize_k: int = 0,  # >0: TRUE top-k RAG marginalization (k× generator cost)
    marginalize_mode: str = "token",  # "token" (RAG-token) | "sequence" (RAG-sequence)
    # Posterior temperature for the candidate softmax; None = logit_scale.
    # The contrastive scale (reference default 100) makes the candidate
    # posterior near-one-hot, which (a) starves the generator of gold-
    # passage training signal early and (b) in token mode puts the
    # per-token score gap far above any per-token likelihood gap, so
    # generator feedback can never flip the posterior. O(1..20) scales
    # let the answer likelihood actually steer retrieval.
    marginalize_scale: Optional[float] = None,
    # >0: train the first W optimizer steps with the standard diagonal
    # marginalized loss (generator sees the GOLD passage only), then
    # switch to the TRUE top-k marginal — the from-scratch analogue of
    # RAG's pretrained-generator assumption (p(y|q,z) must be
    # informative before its feedback can rank candidates).
    marginalize_warmup_steps: int = 0,
    # Weight of the contrastive term in the joint loss (reference parity
    # = 1.0, `train_rage2e.py:467`). 0.0 trains the retriever purely
    # from generator feedback (marginalized loss) — the ablation that
    # isolates how much retrieval signal the generator carries, and the
    # right setting when positive labels are too noisy to trust.
    contrastive_weight: float = 1.0,
    lora_runtime: str = "merge",  # "merge" (<=1B) | "fused" (QLoRA, 7B-scale)
    int8_compute: str = "none",  # "fwd"|"all": int8 MXU matmuls for the fused frozen base
    # > 0: calibrated per-tensor activation scales for the W8A8 path,
    # refreshed from sowed amaxes every N optimizer steps — removes the
    # per-step absmax passes (+7.3% measured, RESULTS.md static-scale
    # probe) at the cost of per-tensor (vs per-row) activation quant
    # with clipping between refreshes. 0 = dynamic per-row. Default 16
    # since round 5: the paired flagship A/B measured +2.7% throughput
    # at an equivalent loss trajectory (9.4208 vs 9.4574, Δ0.39% —
    # RESULTS.md W8A8 section), and the bench measures the shipped
    # default with a final_loss witness. Set 0 for strict per-row quant.
    a8_calibrate_every: int = 16,
    # Calibrated BACKWARD-dy scales (delayed scaling) — RECORDED
    # NEGATIVE, keep False: the backward rowquant absmax passes
    # (trace-attributed 9.1%+1.8% of the flagship step) do vanish —
    # every train step runs as a PROBE whose custom_vjp returns
    # max|dy·w_scale|/127 through an out-of-band cotangent (the fp8
    # TransformerEngine trick; kernels/int8_matmul.py), so dy_scale is
    # exactly ONE step stale at no extra pass — but BOTH flagship A/Bs
    # (16-step-stale AND one-step-stale) failed the loss witness
    # identically (final_loss 14.06 vs 9.46; RESULTS.md "Backward-dy"):
    # dy is outlier-dominated at 7B shapes, so a per-tensor scale
    # zeroes typical gradient rows and dx through the frozen base dies.
    # Per-row dynamic quant is load-bearing for int8 gradients; rows
    # have no stable identity across steps, so there is nothing to
    # calibrate them against. Kept as a guarded experimental flag.
    # Requires int8_compute="all" and gradient_accumulation_steps=1.
    a8_dy_calibrate: bool = False,
    export_peft: bool = False,  # also write torch-PEFT adapter_model.bin
    profile_dir: Optional[str] = None,
    profile_start_step: int = 10,
    profile_num_steps: int = 5,
) -> dict:
    """Returns {"final_loss", "steps", "samples_per_sec", ...}."""
    args = {
        k: v for k, v in locals().items()
        if v is None or isinstance(v, (float, int, str, bool))
    }
    peft_mode = Mode(use_peft) if use_peft is not None else None
    quant_mode = Mode(use_bnb) if use_bnb is not None else None

    # Pod scale-out: join the multi-process world before the mesh is
    # built (jax.devices() is global after this). No-op single-host.
    # Twin of the reference's `accelerate launch` DDP contract
    # (`train_rage2e.py:416-418`, total-batch math `:370`).
    initialize_distributed()
    multihost = jax.process_count() > 1
    if mesh is None:
        mesh = make_mesh(MeshConfig(model=model_parallel))
    global_batch = per_device_train_batch_size * mesh.shape["data"]

    r_tok = resolve_tokenizer(retriever_tokenizer, add_eos_token=retriever_is_autoregressive)
    if retriever_is_autoregressive:
        r_tok.padding_side = "left"
    g_tok = resolve_tokenizer(generator_tokenizer)

    compute_dtype = parse_dtype(dtype) if dtype else None
    vocab_r = -(-r_tok.vocab_size // 128) * 128
    vocab_g = -(-g_tok.vocab_size // 128) * 128
    if retriever_is_autoregressive:
        r_cfg, r_params = resolve_decoder(retriever_name_or_path, dtype=compute_dtype, vocab_size=vocab_r)
    else:
        r_cfg, r_params = resolve_encoder(retriever_name_or_path, dtype=compute_dtype, vocab_size=vocab_r)

    # 7B-scale HF checkpoints entering the fused-QLoRA runtime stream
    # tensor-by-tensor into packed int8/bf16 storage (host peak = one
    # tensor, device never holds the full-precision tree) instead of
    # materializing a full tree through resolve_decoder.
    g_packed = None
    if (
        lora_runtime == "fused"
        and (use_peft is not None and Mode(use_peft) in (Mode.BOTH, Mode.GENERATOR))
        and _is_llama_hf_dir(generator_name_or_path)
    ):
        import dataclasses as _dc

        from dalm_tpu.models import lora as _lora_mod
        from dalm_tpu.models import qlora as _qlora_mod

        _spec = _lora_mod.LoraSpec.for_causal_lm()
        g_cfg, _res, _quant, _lora = _qlora_mod.load_hf_decoder_packed(
            generator_name_or_path, spec=_spec,
            quantize=quant_mode in (Mode.BOTH, Mode.GENERATOR),
            dtype=compute_dtype or jnp.bfloat16,
            rng=jax.random.PRNGKey(seed + 29),
        )
        if compute_dtype is not None:
            g_cfg = _dc.replace(g_cfg, dtype=compute_dtype)
        g_cfg = _dc.replace(g_cfg, remat=True)  # training default at scale
        g_packed = (_spec, _res, _quant, _lora)
        g_params = None
    else:
        g_cfg, g_params = resolve_decoder(generator_name_or_path, dtype=compute_dtype, vocab_size=vocab_g)

    if int8_compute != "none":
        # W8A8 MXU compute for whichever submodels end up with int8
        # `quant` storage (kernels/int8_matmul.py); layers without it
        # ignore the flag, so setting it on both configs is safe.
        import dataclasses as _dc

        r_cfg = _dc.replace(r_cfg, int8_compute=int8_compute)
        g_cfg = _dc.replace(g_cfg, int8_compute=int8_compute)

    rag = RagE2EModel(r_cfg, g_cfg, retriever_is_autoregressive=retriever_is_autoregressive)

    dataset = load_dataset(dataset_or_path)
    processed = dataset.map(
        lambda ex: preprocess_rag_e2e_dataset(
            ex, r_tok, g_tok,
            query_column_name, passage_column_name, answer_column_name,
            query_max_len, passage_max_len, generator_max_len,
        ),
        batched=True,
        remove_columns=dataset.column_names,
        desc="tokenize",
    )

    # Diagnostic: rows whose `#query# q #passage# p #answer#` prefix fills
    # (or overflows) generator_max_len have an EMPTY answer region — the
    # marginalized loss then contributes no retriever gradient for them.
    qpl = np.asarray(processed["query_passage_input_len"])
    n_empty = int((qpl >= generator_max_len).sum())
    if n_empty:
        logger.warning(
            "%d/%d rows have no answer tokens inside generator_max_len=%d "
            "(prefix length >= limit): the marginalized loss is inert for "
            "them — raise generator_max_len or shorten query/passage lens",
            n_empty, len(qpl), generator_max_len,
        )

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
    # Per-sub lazy init (same RNG derivation as RagE2EModel.init_params):
    # fused submodels random-init DIRECTLY into packed int8/bf16 storage,
    # so a full-precision 7B tree (28 GB fp32) never materializes.
    r_init_rng, g_init_rng = jax.random.split(init_rng)
    sub_rngs = {"retriever": r_init_rng, "generator": g_init_rng}
    resolved = {"retriever": r_params, "generator": g_params}
    sub_lens = {"retriever": query_max_len, "generator": generator_max_len}

    def _sub_module(sub):
        return rag.retriever if sub == "retriever" else rag.generator

    def _sub_init_args(sub):
        ids = jnp.zeros((1, sub_lens[sub]), jnp.int32)
        mask = jnp.ones((1, sub_lens[sub]), jnp.int32)
        kwargs = {"return_hidden": True} if sub == "retriever" and retriever_is_autoregressive else {}
        return (ids, mask), kwargs

    full_params: dict = {}  # full-precision bases, only where one exists

    def _full(sub):
        if sub not in full_params:
            if resolved[sub] is not None:
                full_params[sub] = resolved[sub]
            else:
                (ids, mask), kwargs = _sub_init_args(sub)
                full_params[sub] = unbox(
                    _sub_module(sub).init(sub_rngs[sub], ids, mask, **kwargs)["params"]
                )
        return full_params[sub]

    # Mode-gated LoRA (`rag_e2e_base_model.py:61-80`): adapters on the
    # sub-models named by `use_peft`; the rest of the tree trains densely
    # ... unless quantized frozen. To match the reference (PEFT wraps →
    # only adapters train on peft'd submodels), the trainable tree is:
    #   - lora params for peft'd submodels
    #   - full params for non-peft'd submodels
    lora_specs: dict = {}
    base_frozen: dict = {}
    trainable: dict = {}
    from dalm_tpu.models import lora as lora_mod

    quantized_subs: set = set()
    fused = lora_runtime == "fused"
    fused_quant: dict = {}
    for sub in ("retriever", "generator"):
        sub_mode = Mode.RETRIEVER if sub == "retriever" else Mode.GENERATOR
        peft_on = peft_mode in (Mode.BOTH, sub_mode)
        quant_on = quant_mode in (Mode.BOTH, sub_mode)
        if peft_on and fused:
            # fused QLoRA (models/qlora.py): frozen base in the quant
            # collection (int8 when use_bnb), trainable low-rank factors
            # in the lora collection — per-layer dequant, no whole-model
            # effective-weight materialization (7B-scale path).
            from dalm_tpu.models import qlora as qlora_mod

            is_clm = sub == "generator" or retriever_is_autoregressive
            spec = lora_mod.LoraSpec.for_causal_lm() if is_clm else lora_mod.LoraSpec.for_encoder()
            if sub == "generator" and g_packed is not None:
                # streamed straight from the HF checkpoint (above)
                spec, residual, quant_tree, lora_tree = g_packed
                lora_specs[sub] = spec
                trainable[sub] = lora_tree
                base_frozen[sub] = residual
                fused_quant[sub] = quant_tree
                if quant_on:
                    quantized_subs.add(sub)
                continue
            lora_specs[sub] = spec
            if resolved[sub] is None:
                args_, kwargs_ = _sub_init_args(sub)
                residual, quant_tree, lora_tree = qlora_mod.init_packed_on_device(
                    _sub_module(sub), sub_rngs[sub], args_, spec=spec,
                    quantize=quant_on, example_kwargs=kwargs_,
                )
                trainable[sub] = lora_tree
            else:
                residual, quant_tree = qlora_mod.pack_qlora_frozen(_full(sub), quantize=quant_on)
                trainable[sub] = qlora_mod.init_qlora_factors(
                    jax.random.fold_in(init_rng, 23 if sub == "retriever" else 29),
                    _full(sub), spec,
                )
            base_frozen[sub] = residual
            fused_quant[sub] = quant_tree
            if quant_on:
                quantized_subs.add(sub)
            continue
        if peft_on:
            is_clm = sub == "generator" or retriever_is_autoregressive
            spec = lora_mod.LoraSpec.for_causal_lm() if is_clm else lora_mod.LoraSpec.for_encoder()
            lora_specs[sub] = spec
            base = _full(sub)
            if quant_on:
                # int8 frozen base — the bnb-nf4 equivalent (models/quant.py)
                from dalm_tpu.models.quant import quantize_params

                base = quantize_params(base)
                quantized_subs.add(sub)
            base_frozen[sub] = base
            trainable[sub] = lora_mod.init_lora_params(
                jax.random.fold_in(init_rng, 13 if sub == "retriever" else 17),
                _full(sub),
                spec,
            )
        else:
            if quant_on:
                logger.warning(
                    "use_bnb=%s on %s without use_peft — quantization applies to "
                    "frozen bases only (as with bitsandbytes); ignoring", use_bnb, sub
                )
            trainable[sub] = _full(sub)

    if base_frozen:
        base_frozen = jax.device_put(base_frozen, replicated(mesh))

    state = TrainState.create(trainable, tx)
    state = jax.device_put(state, replicated(mesh))

    dropout = use_dropout and getattr(r_cfg, "hidden_dropout", 0.0) > 0

    def effective_params(train_params, frozen, step_rng):
        from dalm_tpu.models.quant import dequantize_params

        eff = {}
        for sub in ("retriever", "generator"):
            if sub in lora_specs:
                base = frozen["base"][sub]
                if sub in quantized_subs:
                    base = dequantize_params(base)  # fused into matmuls by XLA
                eff[sub] = lora_mod.merge_lora(base, train_params[sub], lora_specs[sub], None)
            else:
                eff[sub] = train_params[sub]
        return eff

    def _sub_variables(train_params, frozen, sub):
        """Variable collections for a fused submodel."""
        return {
            "params": frozen["base"][sub],
            "quant": frozen["quant"][sub],
            "lora": train_params[sub],
        }

    def _masked_index_scores(q_emb, index_embs, positive_index, num_real, scale=1.0):
        """(B, N_index) query-vs-index scores with each query's own positive
        and the index's shape-padding rows masked to -inf. Stale index
        embeddings — selection-grade scores, gradient via the query side."""
        qf = q_emb.astype(jnp.float32)
        scores = jnp.matmul(
            qf, index_embs.T.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ) * float(scale)
        n_idx = index_embs.shape[0]
        neg_inf = jnp.finfo(jnp.float32).min
        cols = jnp.arange(n_idx)[None, :]
        scores = jnp.where(cols >= num_real, neg_inf, scores)  # padding rows
        scores = jnp.where(cols == positive_index[:, None], neg_inf, scores)
        return scores

    def _hard_negative_logits(q_emb, index_embs, positive_index, num_real):
        """Top-k live-index scores per query (hard negatives)."""
        scores = _masked_index_scores(
            q_emb, index_embs, positive_index, num_real, scale=float(logit_scale)
        )
        k = min(int(live_negatives_k), max(int(num_real) - 1, 1))
        extra, _ = jax.lax.top_k(scores, k)
        return extra

    marg_meta: dict = {}  # filled by the marginalize_k setup below

    def _marginal_gen_loss(q_emb, batch, frozen, index_embs, embed_fn, gen_fn):
        """TRUE top-k marginalization (losses/marginal_topk.py): gold +
        (k-1) retrieved candidates; fresh retriever scores; generator runs
        per candidate on inputs assembled on device. ``marginalize_mode``
        picks RAG-sequence (one posterior per sample) or RAG-token (one
        per answer token — ~|answer|× stronger retrieval gradient; see
        the loss module docstring for when each applies)."""
        from dalm_tpu.losses.marginal_topk import (
            aligned_answer_token_loglik, answer_loglik, answer_token_mask,
            assemble_generator_inputs, topk_marginal_loss,
            topk_marginal_token_loss,
        )

        marg = frozen["marg"]
        qf = q_emb.astype(jnp.float32)
        pos = batch["positive_index"]
        k_extra = min(int(marginalize_k) - 1, max(num_real_passages - 1, 0))
        if k_extra > 0:
            # stale-index scores for SELECTION only (gradient-free)
            sel_scores = jax.lax.stop_gradient(
                _masked_index_scores(q_emb, index_embs, pos, num_real_passages)
            )
            _, sel = jax.lax.top_k(sel_scores, k_extra)
            cand = jnp.concatenate([pos[:, None], sel], axis=1)  # (B, K)
        else:
            cand = pos[:, None]
        B, K = cand.shape

        # fresh candidate scores (gradients flow through both towers)
        flat = cand.reshape(-1)
        z = embed_fn(marg["retr_p_ids"][flat], marg["retr_p_mask"][flat])
        z = z.reshape(B, K, -1).astype(jnp.float32)
        marg_scale = float(logit_scale if marginalize_scale is None else marginalize_scale)
        s = jnp.einsum("bd,bkd->bk", qf, z) * marg_scale

        ids, attn, boundary = assemble_generator_inputs(
            batch["marg_q_ids"], batch["marg_q_len"],
            marg["gen_p_ids"][cand], marg["gen_p_len"][cand],
            batch["marg_a_ids"], batch["marg_a_len"],
            pad_id=marg_meta["pad_id"],
        )
        L = ids.shape[2]
        logits = gen_fn(ids.reshape(B * K, L), attn.reshape(B * K, L))
        logits = logits.reshape(B, K, L, -1)
        if marginalize_mode == "token":
            A = batch["marg_a_ids"].shape[1]
            ll_tok = aligned_answer_token_loglik(
                logits, ids, attn, boundary, marg_meta["marker_len"], A
            )
            valid = answer_token_mask(batch["marg_a_len"], marg_meta["marker_len"], A)
            return topk_marginal_token_loss(s, ll_tok, valid)
        ll, n = answer_loglik(logits, ids, attn, boundary, marg_meta["marker_len"])
        return topk_marginal_loss(s, ll, n)

    def loss_fn(train_params, frozen, batch, step_rng, index_embs=None, use_marg=True):
        if fused and lora_specs:
            r_vars = (
                _sub_variables(train_params, frozen, "retriever") if "retriever" in lora_specs
                else {"params": train_params["retriever"]}
            )
            q_emb = rag.embed_with(
                r_vars, batch["retriever_query_input_ids"], batch["retriever_query_attention_mask"]
            )
            p_emb = rag.embed_with(
                r_vars, batch["retriever_passage_input_ids"], batch["retriever_passage_attention_mask"]
            )
            block = per_device_train_batch_size if (local_negatives and mesh.shape["data"] > 1) else None
            extra = (
                _hard_negative_logits(q_emb, index_embs, batch["positive_index"], num_real_passages)
                if (index_embs is not None and live_negatives_k) else None
            )
            retriever_loss, sim = contrastive_loss(
                q_emb.astype(jnp.float32), p_emb.astype(jnp.float32), float(logit_scale),
                local_negatives_block=block, extra_negative_logits=extra,
            )
            gen_vars = (
                _sub_variables(train_params, frozen, "generator") if "generator" in lora_specs
                else {"params": train_params["generator"]}
            )
            if marginalize_k and use_marg:
                gen_loss = _marginal_gen_loss(
                    q_emb, batch, frozen, index_embs,
                    embed_fn=lambda i, m: rag.embed_with(r_vars, i, m),
                    gen_fn=lambda i, m: rag.logits_with(gen_vars, i, m),
                )
            else:
                logits = rag.logits_with(
                    gen_vars,
                    batch["generator_input_input_ids"], batch["generator_input_attention_mask"],
                )
                gen_loss = marginalized_nll_loss(
                    logits,
                    batch["generator_input_input_ids"],
                    batch["generator_input_attention_mask"],
                    sim,
                    batch["query_passage_input_len"],
                )
            total = float(contrastive_weight) * retriever_loss + gen_loss
            return total, (retriever_loss, gen_loss)

        params = effective_params(train_params, frozen, step_rng)
        d_rng = step_rng if dropout else None
        q_emb = rag.embed(
            params, batch["retriever_query_input_ids"], batch["retriever_query_attention_mask"],
            deterministic=d_rng is None,
        )
        p_emb = rag.embed(
            params, batch["retriever_passage_input_ids"], batch["retriever_passage_attention_mask"],
            deterministic=d_rng is None,
        )
        block = per_device_train_batch_size if (local_negatives and mesh.shape["data"] > 1) else None
        extra = (
            _hard_negative_logits(q_emb, index_embs, batch["positive_index"], num_real_passages)
            if (index_embs is not None and live_negatives_k) else None
        )
        retriever_loss, sim = contrastive_loss(
            q_emb.astype(jnp.float32), p_emb.astype(jnp.float32), float(logit_scale),
            local_negatives_block=block, extra_negative_logits=extra,
        )
        if marginalize_k and use_marg:
            gen_loss = _marginal_gen_loss(
                q_emb, batch, frozen, index_embs,
                embed_fn=lambda i, m: rag.embed(params, i, m, deterministic=True),
                gen_fn=lambda i, m: rag.generate_logits(params, i, m),
            )
        else:
            logits = rag.generate_logits(
                params, batch["generator_input_input_ids"], batch["generator_input_attention_mask"]
            )
            gen_loss = marginalized_nll_loss(
                logits,
                batch["generator_input_input_ids"],
                batch["generator_input_attention_mask"],
                sim,
                batch["query_passage_input_len"],
            )
        total = float(contrastive_weight) * retriever_loss + gen_loss
        return total, (retriever_loss, gen_loss)

    from functools import partial

    # Frozen trees ride as jit ARGUMENTS — closing over them would bake
    # gigabytes of weights into the compiled program as constants.
    frozen_trees = {"base": base_frozen, "quant": fused_quant}

    def _make_train_step(use_marg: bool):
        lf = partial(loss_fn, use_marg=use_marg)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, frozen, batch, step_rng, index_embs=None):
            (loss, (r_loss, g_loss)), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params, frozen, batch, step_rng, index_embs
            )
            new_state = state.apply_gradients(grads)
            return new_state, loss, r_loss, g_loss

        return train_step

    train_step = _make_train_step(True)
    # marginalize warmup: a second compiled program with the standard
    # diagonal loss (host-side per-step selection — lax.cond would carry
    # both branches' cost into one program).
    warmup_train_step = (
        _make_train_step(False) if (marginalize_k and marginalize_warmup_steps) else None
    )

    # Live retrieval index (north-star subsystem): the training corpus's
    # passages live as a sharded on-device index, continuously re-embedded
    # with the *current* retriever weights — one small slice per train
    # step, double-buffered (index/refresh.py) — instead of an offline
    # rebuild after training. With live_negatives_k > 0 the index also
    # feeds the loss: per-step top-k hard negatives extend the
    # contrastive softmax and the marginalized loss's passage normalizer
    # (the reference's acknowledged TODO, `train_rage2e.py:461-462`).
    if live_negatives_k and not live_index:
        raise ValueError("live_negatives_k > 0 requires live_index=True")
    if marginalize_k and not live_index:
        raise ValueError("marginalize_k > 0 requires live_index=True")
    if marginalize_mode not in ("token", "sequence"):
        raise ValueError(f"marginalize_mode must be 'token' or 'sequence', got {marginalize_mode!r}")
    refresher = None
    num_real_passages = 0
    if live_index:
        from dalm_tpu.index.dense import ShardedDenseIndex
        from dalm_tpu.index.refresh import AsyncIndexRefresher

        p_ids = np.asarray(processed["retriever_passage_input_ids"], np.int32)
        p_mask = np.asarray(processed["retriever_passage_attention_mask"], np.int32)
        # dedupe identical passages by token content
        _, unique_idx, inverse = np.unique(
            p_ids, axis=0, return_index=True, return_inverse=True
        )
        sorted_idx = np.sort(unique_idx)
        # each dataset row's position in the sorted-unique (index) order
        rank = np.empty(len(unique_idx), np.int64)
        rank[np.argsort(unique_idx)] = np.arange(len(unique_idx))
        positive_index = rank[np.asarray(inverse).reshape(-1)]
        p_ids, p_mask = p_ids[sorted_idx], p_mask[sorted_idx]
        num_real_passages = len(p_ids)
        if live_negatives_k or marginalize_k:
            if "positive_index" in processed.column_names:
                processed = processed.remove_columns(["positive_index"])
            processed = processed.add_column("positive_index", positive_index.tolist())

        if marginalize_k:
            # Tokenized SEGMENTS for on-device prompt assembly
            # (losses/marginal_topk.py). Splitting the combined causal text
            # "#query# {q'} #passage# {p'} #answer# {a}" (q'/p' pre-marked,
            # preprocess.py doubled-marker parity) at string boundaries —
            # byte tokenizer: segment-token concat == joint tokenization.
            lq_cap = query_max_len + 16
            lp_cap = passage_max_len + 16
            la_cap = max(32, generator_max_len - query_max_len - passage_max_len)
            q_marked = [f"#query# {q}" for q in dataset[query_column_name]]
            p_marked = [f"#passage# {p}" for p in dataset[passage_column_name]]
            seg_q = [f"#query# {m}" for m in q_marked]
            seg_a = [f" #answer# {a}" for a in dataset[answer_column_name]]
            seg_p_unique = [f" #passage# {p_marked[i]}" for i in sorted_idx]

            tq = g_tok(seg_q, padding="max_length", max_length=lq_cap, truncation=True)
            ta = g_tok(seg_a, padding="max_length", max_length=la_cap, truncation=True)
            tp = g_tok(seg_p_unique, padding="max_length", max_length=lp_cap, truncation=True)
            for col, val in (
                ("marg_q_ids", tq["input_ids"]),
                ("marg_q_len", [int(sum(m)) for m in tq["attention_mask"]]),
                ("marg_a_ids", ta["input_ids"]),
                ("marg_a_len", [int(sum(m)) for m in ta["attention_mask"]]),
            ):
                if col in processed.column_names:
                    processed = processed.remove_columns([col])
                processed = processed.add_column(col, val)

            marg_meta["marker_len"] = len(
                g_tok([" #answer#"], padding=False)["input_ids"][0]
            )
            marg_meta["pad_id"] = int(getattr(g_tok, "pad_token_id", 0) or 0)
            frozen_trees["marg"] = jax.device_put(
                {
                    "retr_p_ids": jnp.asarray(p_ids),
                    "retr_p_mask": jnp.asarray(p_mask),
                    "gen_p_ids": jnp.asarray(np.asarray(tp["input_ids"], np.int32)),
                    "gen_p_len": jnp.asarray(
                        np.asarray([int(sum(m)) for m in tp["attention_mask"]], np.int32)
                    ),
                },
                replicated(mesh),
            )

        @jax.jit
        def _index_embed(train_params, frozen, ids, mask):
            if fused and lora_specs:
                r_vars = (
                    _sub_variables(train_params, frozen, "retriever")
                    if "retriever" in lora_specs else {"params": train_params["retriever"]}
                )
                return rag.embed_with(r_vars, ids, mask).astype(jnp.float32)
            params = effective_params(train_params, frozen, None)
            return rag.embed(params, ids, mask).astype(jnp.float32)

        dim = r_cfg.hidden_size
        seed_embs = np.zeros((len(p_ids), dim), np.float32)
        live = ShardedDenseIndex.build(mesh, seed_embs)
        refresher = AsyncIndexRefresher(
            live,
            lambda params, ids, mask: _index_embed(params, frozen_trees, ids, mask),
            p_ids, p_mask, slice_size=index_refresh_slice,
        )
        logger.info("live index: %d unique passages, slice %d", len(p_ids), index_refresh_slice)

    # ---- calibrated W8A8 activation scales (a8_calibrate_every) ----------
    # Per-site per-tensor activation scales make the quantize pure
    # elementwise (XLA fuses it into producers; no standalone absmax
    # pass — +7.3% measured, RESULTS.md static-scale probe). Scales are
    # measured by a forward-only calibration pass that collects the
    # sowed FlexLinear amaxes (layers.py), injected into the frozen
    # quant tree (which rides as a jit ARGUMENT, so refreshes don't
    # recompile), and refreshed every N optimizer steps. The calibration
    # pass itself always runs with a_scale leaves STRIPPED (dynamic
    # per-row quant) so its amaxes never depend on stale scales.
    a8_cal_subs = sorted(quantized_subs & set(lora_specs)) if (
        a8_calibrate_every and fused and int8_compute != "none"
    ) else []
    if a8_cal_subs:
        import dataclasses as _dc3

        from dalm_tpu.models.registry import build_decoder as _build_dec

        # Non-remat generator twin for the calibration forward (sow
        # mutations inside nn.remat are off the supported path; the
        # param tree is identical so the packed variables apply as-is).
        _cal_gen = (
            _build_dec(_dc3.replace(g_cfg, remat=False))
            if "generator" in a8_cal_subs else None
        )

        def _strip_a(qtree):
            if isinstance(qtree, dict):
                return {k: _strip_a(v) for k, v in qtree.items() if k != "a_scale"}
            return qtree

        def _with_a_scales(qtree, inter):
            """Quant subtree with a_scale leaves from the sowed amaxes
            (the intermediates tree mirrors the module paths)."""
            if (
                isinstance(qtree, dict)
                and "q" in qtree
                and not isinstance(qtree["q"], dict)
            ):
                out = {k: v for k, v in qtree.items() if k != "a_scale"}
                out["a_scale"] = jnp.maximum(
                    inter["a_amax"].astype(jnp.float32) / 127.0, 1e-8
                )
                return out
            if isinstance(qtree, dict):
                return {
                    k: (_with_a_scales(v, inter[k]) if k in (inter or {}) else v)
                    for k, v in qtree.items()
                }
            return qtree

        @jax.jit
        def _calibrate_amax(train_params, frozen, batch):
            inters = {}
            if "retriever" in a8_cal_subs:
                rv = _sub_variables(train_params, frozen, "retriever")
                _, v1 = rag.embed_with(
                    rv, batch["retriever_query_input_ids"],
                    batch["retriever_query_attention_mask"], mutable=["intermediates"],
                )
                _, v2 = rag.embed_with(
                    rv, batch["retriever_passage_input_ids"],
                    batch["retriever_passage_attention_mask"], mutable=["intermediates"],
                )
                inters["retriever"] = jax.tree.map(
                    jnp.maximum, v1["intermediates"], v2["intermediates"]
                )
            if "generator" in a8_cal_subs:
                gv = _sub_variables(train_params, frozen, "generator")
                _, vg = _cal_gen.apply(
                    gv, batch["generator_input_input_ids"],
                    batch["generator_input_attention_mask"], mutable=["intermediates"],
                )
                inters["generator"] = vg["intermediates"]
            return inters

        def _recalibrate(train_params, batch):
            stripped = {
                s: (_strip_a(t) if s in a8_cal_subs else t)
                for s, t in frozen_trees["quant"].items()
            }
            inters = _calibrate_amax(
                train_params, {**frozen_trees, "quant": stripped}, batch
            )
            for s in a8_cal_subs:
                frozen_trees["quant"][s] = _with_a_scales(
                    frozen_trees["quant"][s], inters[s]
                )

    # ---- calibrated backward-dy scales (a8_dy_calibrate) -----------------
    # Delayed scaling for the backward: on the refresh cadence, ONE train
    # step runs as a PROBE that additionally differentiates wrt the
    # a_scale leaves; the kernels' custom_vjp returns max|dy·w_scale|/127
    # through that cotangent channel (an out-of-band "gradient" — see
    # kernels/int8_matmul.py), which becomes the frozen `dy_scale` leaf
    # every other step's backward quantizes against. The bootstrap probe
    # (first step, no dy_scale leaves yet) runs the exact dynamic-dy
    # backward, so no step ever computes with uninitialized scales.
    dy_probe_step = None
    if a8_cal_subs and a8_dy_calibrate:
        if int8_compute != "all":
            raise ValueError("a8_dy_calibrate requires int8_compute='all' (int8 backward)")
        if gradient_accumulation_steps != 1:
            raise ValueError(
                "a8_dy_calibrate requires gradient_accumulation_steps=1: the "
                "out-of-band amax channel would be summed across microsteps"
            )

        def _is_q_site(t):
            return isinstance(t, dict) and "q" in t and not isinstance(t["q"], dict)

        def _take_a(qtree):
            """→ (tree minus a_scale leaves, structure-matched a_scale tree)."""
            if _is_q_site(qtree):
                return {k: v for k, v in qtree.items() if k != "a_scale"}, qtree["a_scale"]
            if isinstance(qtree, dict):
                stripped, scales = {}, {}
                for k, v in qtree.items():
                    stripped[k], scales[k] = _take_a(v)
                return stripped, scales
            return qtree, None

        def _put_a(qtree, scales):
            if _is_q_site(qtree):
                return {**qtree, "a_scale": scales}
            if isinstance(qtree, dict):
                return {k: _put_a(v, scales[k]) for k, v in qtree.items()}
            return qtree

        def _put_dy(qtree, amax):
            if _is_q_site(qtree):
                return {**qtree, "dy_scale": jnp.maximum(
                    jnp.asarray(amax, jnp.float32), 1e-8
                )}
            if isinstance(qtree, dict):
                return {k: _put_dy(v, amax[k]) for k, v in qtree.items()}
            return qtree

        def _make_probe_step(use_marg):
            lf = partial(loss_fn, use_marg=use_marg)

            @partial(jax.jit, donate_argnums=(0,))
            def probe_step(state, frozen, scales, batch, step_rng, index_embs=None):
                def lf2(params, sc):
                    q2 = dict(frozen["quant"])
                    for s in a8_cal_subs:
                        q2[s] = _put_a(q2[s], sc[s])
                    return lf(params, {**frozen, "quant": q2}, batch, step_rng, index_embs)

                (loss, (r_loss, g_loss)), (grads, sgrads) = jax.value_and_grad(
                    lf2, argnums=(0, 1), has_aux=True
                )(state.params, scales)
                return state.apply_gradients(grads), loss, r_loss, g_loss, sgrads

            return probe_step

        dy_probe_step = _make_probe_step(True)

        def _dy_probe(state, batch, step_rng, index_arg):
            stripped_q, scales = {}, {}
            for s2, t2 in frozen_trees["quant"].items():
                if s2 in a8_cal_subs:
                    stripped_q[s2], scales[s2] = _take_a(t2)
                else:
                    stripped_q[s2] = t2
            state, loss, r_loss, g_loss, sgrads = dy_probe_step(
                state, {**frozen_trees, "quant": stripped_q}, scales,
                batch, step_rng, index_arg,
            )
            for s2 in a8_cal_subs:
                frozen_trees["quant"][s2] = _put_dy(frozen_trees["quant"][s2], sgrads[s2])
            return state, loss, r_loss, g_loss

    # Host-side metric streams come from process 0 only (the reference
    # gated trackers on `accelerator.is_main_process`).
    tracker = MetricsLogger(
        output_dir, project_name="rag_e2e_training", config=args,
        report_to=report_to, enabled=with_tracking and is_main_process(),
    )
    timer = WindowedThroughput()
    from dalm_tpu.core.profiling import Profiler

    profiler = Profiler(profile_dir, profile_start_step, profile_num_steps)

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

    batch_columns = BATCH_COLUMNS + (
        ("positive_index",) if (live_negatives_k or marginalize_k) else ()
    ) + (
        ("marg_q_ids", "marg_q_len", "marg_a_ids", "marg_a_len") if marginalize_k else ()
    )
    checkpoint_every = int(checkpointing_steps) if str(checkpointing_steps).isdigit() else None
    # Losses stay on device between logging points — a per-step float()
    # readback would serialize dispatch and halve throughput (the
    # reference also reads its loss only on the 100-step logging cadence,
    # `train_rage2e.py:481`). `last` holds the latest device scalars.
    final = {"loss": float("nan"), "retriever": float("nan"), "generator": float("nan")}
    last = None

    def read_last():
        if last is not None:
            vals = jax.device_get(last)
            return {"loss": float(vals[0]), "retriever": float(vals[1]), "generator": float(vals[2])}
        return final

    for epoch in range(start_epoch, num_train_epochs):
        # Seeded per (seed, epoch) — NOT drawn sequentially from a shared
        # stream — so a resumed run shuffles epoch e exactly as the
        # uninterrupted run would have (resume-trajectory fidelity).
        epoch_rng = np.random.default_rng([seed, epoch])
        loss_sum, n_in_epoch = None, 0
        timer.mark(completed_steps)
        for batch_np in epoch_batches(
            processed, batch_columns, global_batch, rng=epoch_rng, skip_batches=skip_batches,
            multiple_of=mesh.shape["data"], process_shard=multihost,
        ):
            batch = put_batch(batch_np, mesh, np.int32)
            # dy-calibration adds an extra refresh at micro step 1: the
            # steady-state programs (train step with dy_scale present +
            # steady probe) then both compile inside the first throughput
            # window instead of mid-measurement at step a8_calibrate_every.
            a8_refresh = a8_cal_subs and (
                micro_steps % max(
                    1, int(a8_calibrate_every) * gradient_accumulation_steps
                ) == 0
                or (dy_probe_step is not None and micro_steps == 1)
            )
            if a8_refresh:
                _recalibrate(state.params, batch)
            step_rng = jax.random.fold_in(
                dropout_rng, int(start_steps * gradient_accumulation_steps + micro_steps)
            )
            profiler.maybe_start(completed_steps)
            index_arg = (
                refresher.index.embeddings if (live_negatives_k or marginalize_k) else None
            )
            in_warmup = (
                warmup_train_step is not None and completed_steps < marginalize_warmup_steps
            )
            step_fn = warmup_train_step if in_warmup else train_step
            if dy_probe_step is not None and not in_warmup:
                # EVERY step runs as the probe, so dy_scale is exactly one
                # step stale. The first flagship A/B refreshed dy on the
                # 16-step a_scale cadence and the witness FAILED (loss
                # 14.06 vs 9.46): dy magnitudes decay fast early in
                # training, and a 16-step-stale per-tensor scale
                # underflows typical elements to zero — dx through the
                # frozen base dies. The probe IS a train step (the OWG
                # amaxes ride the backward's existing reads), so per-step
                # refresh costs only the tiny scalar injections.
                state, loss, r_loss, g_loss = _dy_probe(
                    state, batch, step_rng, index_arg
                )
            else:
                state, loss, r_loss, g_loss = step_fn(
                    state, frozen_trees, batch, step_rng, index_arg
                )
            if refresher is not None:
                refresh_stats = refresher.tick(state.params)
            last = (loss, r_loss, g_loss)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            n_in_epoch += 1
            micro_steps += 1
            completed_steps = start_steps + micro_steps // gradient_accumulation_steps
            profiler.maybe_stop(completed_steps)

            stepped = micro_steps % gradient_accumulation_steps == 0
            if stepped and completed_steps % 100 == 0:
                final = read_last()  # device sync point
                timer.mark(completed_steps)
                logger.info("epoch %d step %d loss %.4f", epoch, completed_steps, final["loss"])
                tracker.log(
                    {
                        "train/loss": final["loss"],
                        "train/retriever_contrastive_loss": final["retriever"],
                        "train/generator_marginalized_loss": final["generator"],
                    },
                    step=completed_steps,
                )
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
        final = read_last()
        timer.mark(completed_steps)
        tracker.log({"train/epoch_loss": epoch_loss, "epoch": epoch}, step=completed_steps)
        if checkpointing_steps == "epoch" and output_dir:
            ckpt.save_state(output_dir, f"epoch_{epoch}", state)
        if completed_steps >= max_train_steps:
            break
    final = read_last()

    if output_dir:
        # Split save (`train_rage2e.py:508-524`): retriever/ and generator/.
        # fetch_global calls are collectives — every process walks the
        # identical branch sequence — while the file writes land on
        # process 0 only (the reference's `accelerator.is_main_process`
        # gate, `train_rage2e.py:291-295`).
        main = is_main_process()
        for sub, cfg, tok_name in (
            ("retriever", r_cfg, retriever_tokenizer),
            ("generator", g_cfg, generator_tokenizer),
        ):
            sub_dir = os.path.join(output_dir, sub)
            if sub in lora_specs:
                if fused:
                    from dalm_tpu.models import qlora as qlora_mod

                    # Pre-pack full-precision base when one existed;
                    # otherwise reconstruct it from packed storage.
                    full_base = full_params.get(sub)
                    if full_base is None:
                        full_base = qlora_mod.unpack_to_params(
                            base_frozen[sub], fused_quant[sub]
                        )
                    base_host = fetch_global(full_base)
                    flat = qlora_mod.factors_to_flat(
                        fetch_global(state.params[sub]), lora_specs[sub]
                    )
                else:
                    base_host = fetch_global(base_frozen[sub])
                    flat = fetch_global(state.params[sub])
                if main:
                    save_pretrained(sub_dir, cfg, base_host, extra={"tokenizer": tok_name})
                    lora_mod.save_adapter(sub_dir, flat, lora_specs[sub])
                if export_peft and main:
                    from dalm_tpu.models.hf_loader import export_peft_if_supported

                    name = (
                        retriever_name_or_path if sub == "retriever"
                        else generator_name_or_path
                    )
                    export_peft_if_supported(sub_dir, flat, lora_specs[sub], cfg, name)
            else:
                params_host = fetch_global(state.params[sub])
                if main:
                    save_pretrained(sub_dir, cfg, params_host, extra={"tokenizer": tok_name})
    profiler.close()
    tracker.close()
    result = {
        "final_loss": final["loss"],
        "final_retriever_loss": final["retriever"],
        "final_generator_loss": final["generator"],
        "steps": completed_steps,
        "samples_per_sec": timer.samples_per_sec(global_batch),
        "avg_step_time": timer.avg,
    }
    if refresher is not None:
        # finish the in-flight sweep so the index reflects final weights
        refresher.refresh_fully(state.params)
        result["index_version"] = refresher.version
        result["live_index"] = refresher.index
    return result
