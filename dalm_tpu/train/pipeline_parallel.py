"""Pipeline-parallel (PP) causal-LM training — layers over a mesh axis.

Completes the parallelism matrix (DP `core/mesh.py`, TP logical axes,
CP `train/context_parallel.py`, EP `models/moe.py`): decoder LAYERS
shard over a ``stage`` mesh axis and microbatches flow through the
stages GPipe-style. The reference is single-GPU DDP only
(`/root/reference/dalm/training/rag_e2e/train_rage2e.py:416-418`);
this exists for generators whose layer stack exceeds one chip's HBM
even with remat + int8 storage.

TPU-first formulation (the "How to Scale Your Model" collective
pipeline): one SPMD program under ``jax.shard_map``, a ``lax.scan``
over M + S − 1 ticks, and a single ``ppermute`` per tick rotating the
activation (plus its attention mask and token ids, which the loss on
the last stage needs) to the next stage over ICI. No host
orchestration, no per-stage programs: XLA sees one static program and
overlaps the ppermute with the next tick's layer compute. Backward is
ordinary autodiff — ``ppermute`` transposes to the reverse rotation, so
``jax.grad`` yields the exact pipelined backward schedule; per-stage
activation memory is bounded by ``jax.checkpoint`` around the stage
body (recompute in the backward ticks, the GPipe re-materialization).

Exactness: identical loss/gradients to the unsharded causal LM
objective (tests/train/test_pipeline_parallel.py proves loss AND
stacked-param grads match the plain decoder on the 8-device mesh).

Restrictions (asserted): homogeneous layers (uniform sliding/rope
config — no gemma2/3 per-layer patterns), ``num_layers % num_stages
== 0``, full-sequence training mode (no KV cache).

Compositions:

- **PP × MoE** (``moe_aux_weight``): sparse-MoE layer stacks
  (models/moe.py) pipeline like dense ones — the per-layer Switch aux
  is threaded through the tick scan, gated to real microbatches, and
  psum-averaged into the loss. Expert weights are replicated within a
  stage unless TP is also on (then ``expert``→``model`` EP applies).
- **PP × TP** (``make_pp_mesh(..., model_parallel=m)``): a third
  ``model`` mesh axis stays GSPMD-**auto** while ``stage``/``data`` are
  manual (`jax.shard_map(axis_names=...)` partial-manual mode): the
  stacked layer weights carry their usual logical TP shardings
  (heads/mlp/expert → ``model``, core/mesh.py LOGICAL_RULES_TP) and XLA
  inserts the within-stage collectives exactly as in the non-PP TP
  path. One program, no hand-written TP math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dalm_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

STAGE_AXIS = "stage"


def make_pp_mesh(num_stages: int, devices=None, model_parallel: int = 1) -> Mesh:
    """(data, stage[, model]) mesh: batch over ``data``, layers over
    ``stage``; ``model_parallel>1`` adds a GSPMD-auto TP axis (PP × TP)."""
    devs = list(devices if devices is not None else jax.devices())
    per = num_stages * model_parallel
    if len(devs) % per:
        raise ValueError(f"{len(devs)} devices not divisible by {per} (stages×tp)")
    if model_parallel > 1:
        arr = np.asarray(devs).reshape(len(devs) // per, num_stages, model_parallel)
        return Mesh(arr, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
    arr = np.asarray(devs).reshape(len(devs) // num_stages, num_stages)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def split_decoder_params(params: dict, num_layers: int):
    """Per-layer param dict → (io_params, stacked layer tree).

    ``stacked`` leaves get a leading ``num_layers`` axis (shard it over
    ``stage``); ``io`` holds embed_tokens / final_norm / lm_head
    (replicated — every stage computes the embedding for the microbatch
    it admits; only stage 0's result is used, and only the last stage
    projects logits)."""
    layers = [params[f"layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    io = {k: v for k, v in params.items() if not k.startswith("layer_")}
    return io, stacked


def merge_decoder_params(io: dict, stacked: dict, num_layers: int) -> dict:
    """Inverse of :func:`split_decoder_params` (for checkpoint export)."""
    out = dict(io)
    for i in range(num_layers):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def stacked_tp_specs(model) -> dict:
    """Per-leaf PartitionSpecs for the stacked layer tree under PP × TP.

    Derived from the SAME logical-axis metadata the non-PP TP path uses
    (``nn.with_logical_partitioning`` throughout models/, mapped by
    core/mesh.py LOGICAL_RULES_TP): each layer-0 leaf's logical names →
    mesh axes, with ``stage`` prepended for the stacked layer axis.
    Leaves without metadata stack as ``P('stage')``.
    """
    import flax.linen as nn
    from flax.core import meta

    from dalm_tpu.core.mesh import logical_axis_rules

    ids = jnp.zeros((1, 8), jnp.int32)
    abs_params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), ids, jnp.ones_like(ids)
    )["params"]
    layer0 = abs_params["layer_0"]
    rules = logical_axis_rules(tensor_parallel=True)

    def leaf_spec(x):
        if isinstance(x, meta.Partitioned):
            axes = nn.logical_to_mesh_axes(x.names, rules=rules)
            return P(STAGE_AXIS, *axes)
        return P(STAGE_AXIS)

    return jax.tree.map(
        leaf_spec, layer0, is_leaf=lambda x: isinstance(x, meta.Partitioned)
    )


def _check_cfg(cfg) -> None:
    assert cfg.sliding_layers == "all", "PP requires homogeneous layers"
    assert cfg.rope_local_theta is None, "PP requires a single rope base"
    if getattr(cfg, "moe_layer_start", 0):
        # DeepSeek-V3 first_k_dense_replace: the leading dense layers
        # have a DIFFERENT param tree than the MoE layers, so the
        # stacked-homogeneous-layer scan cannot represent the stack.
        raise ValueError(
            "PP requires homogeneous layers: moe_layer_start "
            f"({cfg.moe_layer_start}) mixes dense and MoE layer kinds — "
            "train DeepSeek-V3-style stacks with TP/EP instead"
        )
    if getattr(cfg, "mla", False):
        raise ValueError(
            "PP has no MLA layer support yet — compose TP with MLA "
            "instead (the latent cache and absorbed decode are "
            "TP-compatible; see models/mla.py)"
        )


def build_pp_lm_loss(
    model,
    mesh: Mesh,
    num_microbatches: int,
    data_axis: Optional[str] = DATA_AXIS,
    moe_aux_weight: float = 0.0,
    neftune_alpha: float = 0.0,
):
    """Returns ``loss(io_params, stacked_params, input_ids, attention_mask
    [, noise_rng])`` — mean next-token NLL, computed through the
    pipelined stages. Differentiable in both param trees.

    ``model`` is a ``Decoder`` (flax module); its config's layer stack is
    split evenly over ``mesh.shape["stage"]`` stages. ``input_ids`` /
    ``attention_mask`` are (B, S) with B divisible by
    ``num_microbatches`` (× the data-axis size).

    ``moe_aux_weight`` adds the Switch load-balancing aux of sparse-MoE
    layer stacks (models/moe.py), averaged per-(layer, microbatch) —
    the gradient-accumulation semantics, matching what the HF trainer
    computes when the same batch is split into accumulation steps (each
    microbatch balances its own routing; the full-batch aux is not
    recoverable from per-microbatch ones since aux is bilinear in two
    token-means). ``neftune_alpha`` applies NEFTune embedding noise
    exactly as the plain decoder does (uniform, alpha/sqrt(S·H),
    decoder.py) using ``noise_rng`` folded per microbatch.

    If the mesh carries a third ``model`` axis (``make_pp_mesh(...,
    model_parallel=m)``), stage/data stay manual and ``model`` is left
    GSPMD-auto: place the stacked params with :func:`place_pp_params`
    ``(tp=True)`` and XLA inserts the within-stage TP collectives.
    """
    from dalm_tpu.models.decoder import DecoderLayer, RMSNorm, rope_cos_sin

    cfg = model.cfg
    _check_cfg(cfg)
    S = mesh.shape[STAGE_AXIS]
    L = cfg.num_layers
    assert L % S == 0, f"{L} layers not divisible by {S} stages"
    Lps = L // S
    M = num_microbatches

    layer_mod = DecoderLayer(cfg, layer_idx=0)
    final_norm = RMSNorm(
        cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype,
        unit_offset=cfg.rmsnorm_unit_offset,
    )

    def embed_mb(io, ids, mb_rng=None):
        emb = io["embed_tokens"]["embedding"]
        h = jnp.take(emb, ids, axis=0).astype(cfg.dtype)
        if cfg.scale_embeddings:
            h = h * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)
        if neftune_alpha > 0.0 and mb_rng is not None:
            # NEFTune, same formulation as decoder.py (alpha/sqrt(S·H)
            # uniform noise on the embeddings).
            scale = neftune_alpha / jnp.sqrt(
                jnp.asarray(ids.shape[1] * cfg.hidden_size, jnp.float32)
            )
            noise = jax.random.uniform(
                mb_rng, h.shape, jnp.float32, minval=-1.0, maxval=1.0
            )
            h = h + (noise * scale).astype(h.dtype)
        return h

    def logits_mb(io, h):
        h = final_norm.apply({"params": io["final_norm"]}, h)
        if cfg.tie_embeddings:
            return h @ io["embed_tokens"]["embedding"].astype(cfg.dtype).T
        return h @ io["lm_head"]["kernel"].astype(cfg.dtype)

    def stage_body(stacked_local, h, mask2d):
        """Apply this stage's Lps layers to one microbatch."""
        seq = h.shape[1]
        positions = jnp.clip(jnp.cumsum(mask2d, axis=1) - 1, min=0)
        cos, sin = rope_cos_sin(
            positions, cfg.head_dim, cfg.rope_theta, cfg.dtype,
            llama3_scaling=cfg.rope_llama3,
        )
        causal = jnp.tril(jnp.ones((seq, seq), bool))[None, None]
        attn_mask = causal & mask2d[:, None, None, :].astype(bool)
        if cfg.sliding_window:
            q_pos = jnp.arange(seq)[None, None, :, None]
            k_pos = jnp.arange(seq)[None, None, None, :]
            attn_mask = attn_mask & (k_pos > q_pos - cfg.sliding_window)
        seg = mask2d.astype(jnp.int32)

        def one_layer(carry, layer_params):
            h_in, aux_in = carry
            out, _, aux_l = layer_mod.apply(
                {"params": layer_params}, h_in, attn_mask, cos, sin, None, None, seg
            )
            return (out, aux_in + aux_l), None

        (h, aux), _ = jax.lax.scan(one_layer, (h, jnp.zeros((), jnp.float32)), stacked_local)
        return h, aux

    stage_body = jax.checkpoint(stage_body)

    def pipelined(io, stacked, ids, mask, noise_rng):
        """Runs under shard_map: ids/mask (B_local, S_seq) per data shard;
        stacked leaves (Lps, ...) — this stage's layer slice."""
        si = jax.lax.axis_index(STAGE_AXIS)
        B, T = ids.shape
        assert B % M == 0, f"local batch {B} not divisible by {M} microbatches"
        mb = B // M
        ids_mb = ids.reshape(M, mb, T)
        mask_mb = mask.reshape(M, mb, T)
        ids_ticks = jnp.concatenate(
            [ids_mb, jnp.zeros((S - 1, mb, T), ids.dtype)], axis=0
        )  # (M+S-1, mb, T): the last S-1 ticks drain the pipeline
        mask_ticks = jnp.concatenate(
            [mask_mb, jnp.zeros((S - 1, mb, T), mask.dtype)], axis=0
        )

        perm = [(i, (i + 1) % S) for i in range(S)]

        if noise_rng is not None:
            # per-data-shard noise stream (distinct rows get distinct
            # noise, as in the plain path where the rng covers the batch)
            noise_rng = jax.random.fold_in(
                noise_rng, jax.lax.axis_index(data_axis) if data_axis else 0
            )

        def tick(carry, xs):
            h_prev, mask_prev, ids_prev, loss_sum, tok_sum, aux_sum = carry
            ids_t, mask_t, t = xs
            # Stage 0 admits a fresh microbatch; others take the rotated
            # activation. SPMD: every stage computes the (cheap) embed,
            # the where selects.
            mb_rng = (
                jax.random.fold_in(noise_rng, t) if noise_rng is not None else None
            )
            fresh = embed_mb(io, ids_t, mb_rng)
            h_in = jnp.where(si == 0, fresh, h_prev)
            mask_in = jnp.where(si == 0, mask_t, mask_prev)
            ids_in = jnp.where(si == 0, ids_t, ids_prev)
            h_out, aux_stage = stage_body(stacked, h_in, mask_in)
            # MoE aux: this stage holds a REAL microbatch at tick t iff
            # si ≤ t < si+M (pipeline fill/drain are zero-padded ticks).
            real = (t >= si) & (t < si + M)
            aux_sum = aux_sum + jnp.where(real, aux_stage, 0.0)

            # Last stage: CE on the microbatch it just finished (valid for
            # ticks S-1 .. M+S-2 — i.e. microbatch t-(S-1)).
            logits = logits_mb(io, h_out).astype(jnp.float32)
            tgt = jnp.roll(ids_in, -1, axis=1)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
            w = mask_in.astype(jnp.float32) * jnp.roll(
                mask_in.astype(jnp.float32), -1, axis=1
            )
            w = w.at[:, -1].set(0.0)
            valid = (si == S - 1) & (t >= S - 1)
            loss_sum = loss_sum + jnp.where(valid, jnp.sum(nll * w), 0.0)
            tok_sum = tok_sum + jnp.where(valid, jnp.sum(w), 0.0)

            h_r, mask_r, ids_r = (
                jax.lax.ppermute(a, STAGE_AXIS, perm) for a in (h_out, mask_in, ids_in)
            )
            return (h_r, mask_r, ids_r, loss_sum, tok_sum, aux_sum), None

        h0 = jnp.zeros((mb, T, cfg.hidden_size), cfg.dtype)
        carry0 = (
            h0, jnp.zeros((mb, T), mask.dtype), jnp.zeros((mb, T), ids.dtype),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        ticks = jnp.arange(M + S - 1)
        (h_f, _, _, loss_sum, tok_sum, aux_sum), _ = jax.lax.scan(
            tick, carry0, (ids_ticks, mask_ticks, ticks)
        )
        # Only the last stage accumulated loss; share it with everyone
        # (and sum over data shards — mean over GLOBAL tokens).
        axes = (STAGE_AXIS,) + ((data_axis,) if data_axis else ())
        loss_sum = jax.lax.psum(loss_sum, axes)
        tok_sum = jax.lax.psum(tok_sum, axes)
        loss = loss_sum / jnp.maximum(tok_sum, 1.0)
        if moe_aux_weight > 0.0:
            # psum over stages gives the sum over ALL L layers per
            # microbatch; over data, all shards — mean per (layer,
            # microbatch) divides by L·M·n_data.
            n_data = mesh.shape[data_axis] if data_axis else 1
            aux_mean = jax.lax.psum(aux_sum, axes) / jnp.asarray(
                L * M * n_data, jnp.float32
            )
            loss = loss + jnp.asarray(moe_aux_weight, jnp.float32) * aux_mean
        return loss

    stacked_spec = P(STAGE_AXIS)
    data_spec = P(data_axis, None) if data_axis else P(None, None)
    # PP × TP: any extra mesh axis (canonically `model`) stays GSPMD-auto
    # — the body is manual over stage/data only; in_specs name manual
    # axes, the params' model sharding rides along and XLA inserts the
    # within-stage collectives (tested vs the plain loss).
    manual = frozenset(
        a for a in mesh.axis_names if a in (STAGE_AXIS, data_axis)
    )

    def loss_fn(io_params, stacked_params, input_ids, attention_mask, noise_rng=None):
        stacked_specs = jax.tree.map(lambda _: stacked_spec, stacked_params)
        io_specs = jax.tree.map(lambda _: P(), io_params)
        mapped = jax.shard_map(
            lambda io, st, ids, mask, rng=None: pipelined(io, st, ids, mask, rng),
            mesh=mesh,
            in_specs=(io_specs, stacked_specs, data_spec, data_spec)
            + ((P(),) if noise_rng is not None else ()),
            out_specs=P(),
            axis_names=manual,
            check_vma=False,
        )
        args = (io_params, stacked_params, input_ids, attention_mask)
        if noise_rng is not None:
            args = args + (noise_rng,)
        return mapped(*args)

    return loss_fn


def place_pp_params(io: dict, stacked: dict, mesh: Mesh, model=None):
    """Device-put: io replicated, stacked layer-sharded over ``stage``.

    With ``model`` given AND a ``model`` axis in the mesh (PP × TP), the
    stacked leaves additionally carry their logical TP shardings
    (:func:`stacked_tp_specs`)."""
    io_p = jax.device_put(io, NamedSharding(mesh, P()))
    if model is not None and MODEL_AXIS in mesh.axis_names:
        specs = stacked_tp_specs(model)
        st_p = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), stacked, specs
        )
    else:
        st_p = jax.device_put(stacked, NamedSharding(mesh, P(STAGE_AXIS)))
    return io_p, st_p
