"""Mixture-of-Experts MLP block (Mixtral / Qwen3-MoE families).

The reference framework has no MoE support (its generator is whatever
``AutoModelForCausalLM`` loads densely, `dalm/models/rag_e2e_base_model.py`
:42-59); this is a beyond-parity capability. The design is TPU-first:

- **Router** (HF ``MixtralSparseMoeBlock`` semantics, transformers
  `modeling_mixtral.py`): logits → f32 softmax over ALL experts → top-k
  of the softmaxed weights → optional renormalization over the k chosen
  (Mixtral always; Qwen3-MoE gates it on ``norm_topk_prob``).
- **Dense path** (exact, used for parity tests and decode): every expert
  runs every token via one stacked einsum, outputs weighted by the
  (mostly-zero) gate matrix. At decode batch sizes all touched experts'
  weights are read from HBM anyway — the extra FLOPs are free next to
  the weight DMA, so exactness costs nothing where it matters.
- **Dispatch path** (training / prefill scale): the classic dense
  dispatch-einsum formulation (GShard / Switch, as in flaxformer):
  per-expert capacity C, a one-hot dispatch tensor (assignments, E, C)
  built from a cumsum over assignment order, and three batched einsums
  for the expert FFNs — everything static-shape, every contraction on
  the MXU, no gather/scatter. Tokens over capacity are DROPPED (their
  residual passes through untouched) exactly as in Switch; with
  ``moe_capacity_factor=None`` capacity is the group size (dropless,
  exact — the per-expert assignment count can never exceed the token
  count since top-k indices are distinct per token). Tokens are split
  into GShard-style groups of ``moe_group_size`` (each group carries
  its own dispatch tensor and capacity budget) so dispatch memory is
  linear in T rather than the single-group O(T²·K/E).

Expert parallelism: stacked expert weights carry the logical axis
``"expert"`` which `core/mesh.py` maps to the mesh ``model`` axis — each
TP group member holds E/model_parallel experts and GSPMD inserts the
dispatch/combine all-to-alls. ``"moe_mlp"`` stays unsharded (EP, not
TP-within-expert, is the right cut for many-small-expert models like
Qwen3-MoE's 128×768).

Load-balancing auxiliary loss: per-layer Switch aux
``E · Σ_e frac_assigned_e · mean_prob_e`` (HF
``load_balancing_loss_func`` per-layer equivalent) is RETURNED as the
block's second output — a functional value that survives ``nn.remat``
(sow mutations inside a rematted layer are off the supported path).
``Decoder`` averages it over layers and exposes it via
``return_moe_aux=True``; ``train_generator(moe_aux_weight=w)`` adds it
to the SFT loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def route_topk(router_logits: jax.Array, k: int, norm_topk: bool):
    """HF Mixtral/Qwen3-MoE routing: f32 softmax over all experts, top-k
    of the softmaxed weights, optional renorm over the chosen k.

    router_logits: (T, E) → (weights (T, k) f32, indices (T, k) int32).
    """
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, idx = jax.lax.top_k(probs, k)
    if norm_topk:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx


def route_noaux_tc(
    router_logits: jax.Array, bias: jax.Array, k: int, n_group: int,
    topk_group: int, norm_topk: bool, scaling: float,
):
    """DeepSeek-V3 routing (HF ``DeepseekV3TopkRouter``): sigmoid scores,
    the aux-loss-free ``e_score_correction_bias`` added for CHOICE only
    (combine weights use the raw sigmoid scores), and group-limited
    selection — experts partition into ``n_group`` groups, a group's
    score is the sum of its top-2 biased scores, only the ``topk_group``
    best groups stay eligible, then plain top-k over the survivors.

    router_logits: (T, E) f32 → (weights (T, k) f32, indices (T, k)).
    """
    T, E = router_logits.shape
    scores = jax.nn.sigmoid(router_logits)
    choice = scores + bias[None, :]
    gs = choice.reshape(T, n_group, E // n_group)
    group_scores = jnp.sum(jax.lax.top_k(gs, 2)[0], axis=-1)  # (T, G)
    _, gidx = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.sum(
        jax.nn.one_hot(gidx, n_group, dtype=jnp.float32), axis=-2
    )  # (T, G)
    score_mask = jnp.repeat(group_mask, E // n_group, axis=-1)  # (T, E)
    masked = jnp.where(score_mask > 0, choice, 0.0)
    _, idx = jax.lax.top_k(masked, k)
    weights = jnp.take_along_axis(scores, idx, axis=-1)
    if norm_topk:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-20)
    return weights * scaling, idx


class MoEBlock(nn.Module):
    """Sparse MoE MLP: SwiGLU experts with stacked, EP-sharded weights."""

    cfg: Any  # DecoderConfig (duck-typed to avoid a circular import)

    @nn.compact
    def __call__(self, x: jax.Array, decode: bool = False) -> jax.Array:
        cfg = self.cfg
        B, S, H = x.shape
        E = cfg.num_experts
        K = cfg.num_experts_per_tok
        M = cfg.moe_intermediate_size or cfg.intermediate_size
        T = B * S

        act = {
            "silu": nn.silu,
            "gelu_tanh": lambda z: nn.gelu(z, approximate=True),
            "gelu": lambda z: nn.gelu(z, approximate=False),
        }[cfg.hidden_act]

        # Router: tiny (H, E) matmul — replicated, computed in model dtype
        # like HF's nn.Linear gate, softmaxed in f32 by route_topk.
        router_kernel = self.param(
            "router",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("embed", None)
            ),
            (H, E),
            cfg.param_dtype,
        )
        x2 = x.reshape(T, H)
        if cfg.moe_router == "noaux_tc":
            # DeepSeek-V3: HF computes the gate matmul in f32 explicitly
            # (DeepseekV3TopkRouter.forward), sigmoid scores, and the
            # aux-free correction bias (a checkpoint BUFFER — here a
            # frozen param the loader fills; selection-only, so it never
            # receives gradients through top-k anyway).
            bias = self.param(
                "e_score_correction_bias",
                nn.with_logical_partitioning(nn.initializers.zeros_init(), (None,)),
                (E,), jnp.float32,
            )
            router_logits = x2.astype(jnp.float32) @ router_kernel.astype(jnp.float32)
            gate_w, idx = route_noaux_tc(
                router_logits, jnp.asarray(bias), K,
                cfg.moe_n_group or 1, cfg.moe_topk_group or 1,
                cfg.norm_topk_prob, cfg.moe_routed_scaling_factor,
            )
        else:
            router_logits = x2 @ router_kernel.astype(cfg.dtype)  # (T, E)
            gate_w, idx = route_topk(router_logits, K, cfg.norm_topk_prob)

        def stacked(name, shape, axes):
            return self.param(
                name,
                nn.with_logical_partitioning(nn.initializers.lecun_normal(), axes),
                shape,
                cfg.param_dtype,
            ).astype(cfg.dtype)

        w_gate = stacked("w_gate", (E, H, M), ("expert", "embed", "moe_mlp"))
        w_up = stacked("w_up", (E, H, M), ("expert", "embed", "moe_mlp"))
        w_down = stacked("w_down", (E, M, H), ("expert", "moe_mlp", "embed"))

        # Switch-style per-layer load-balancing aux (see module docstring).
        # f_e uses the PRE-capacity assignment fractions, matching HF.
        # RETURNED (not sowed): a functional output survives nn.remat —
        # sow mutations inside a rematted layer are off the supported
        # path (the a8-calibration twin exists for exactly that reason,
        # train/rag_e2e.py).
        if cfg.moe_router == "noaux_tc":
            # V3 is AUX-FREE by design: balance comes from the correction
            # bias (updated out-of-band during pretraining), not a loss.
            aux = jnp.zeros((), jnp.float32)
        else:
            assign_frac = jnp.mean(
                jax.nn.one_hot(idx, E, dtype=jnp.float32), axis=(0, 1)
            )  # (E,) — fraction of (token, k) assignments per expert, ×1/K·E≈1
            mean_prob = jnp.mean(
                jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1), axis=0
            )
            aux = jnp.asarray(E, jnp.float32) * jnp.sum(assign_frac * mean_prob)

        # DeepSeek-V3 shared experts: an always-on dense SwiGLU of width
        # n_shared·M whose output ADDS to the routed combine (HF
        # DeepseekV3MoE.forward: moe(...) + shared_experts(residuals)).
        # Replicated (every token runs it) — no EP axis.
        shared = None
        if cfg.moe_n_shared_experts:
            Ms = M * cfg.moe_n_shared_experts
            ws_g = stacked("shared_gate", (H, Ms), ("embed", "moe_mlp"))
            ws_u = stacked("shared_up", (H, Ms), ("embed", "moe_mlp"))
            ws_d = stacked("shared_down", (Ms, H), ("moe_mlp", "embed"))
            shared = (act(x2 @ ws_g) * (x2 @ ws_u)) @ ws_d  # (T, H)

        impl = cfg.moe_impl
        if impl == "auto":
            # Set FROM the measured table, not asserted: the on-chip
            # fwd+bwd A/B (tools/bench_moe.py --train, readback-synced,
            # results_r5_moe_train{,_small}.log) has dispatch ahead at
            # EVERY shape from T=16 (13.0 vs 16.1 ms) to T=8192 (272.7
            # vs 314.3 ms) at capacity 1.25 — the original "dense if
            # T<=512" crossover was an artifact of block_until_ready
            # timing. Dense remains the DECODE choice for exactness
            # (capacity dispatch may drop tokens mid-generation) and
            # because at slot-width batches every touched expert's
            # weights stream from HBM anyway — the extra dense FLOPs
            # ride the weight DMA.
            impl = "dense" if decode else "dispatch"

        if impl == "dense":
            # All experts on all tokens; combine with the sparse gate
            # matrix. Exact — used for parity tests and decode (see
            # module docstring for why this is free at decode).
            full_gate = jnp.zeros((T, E), jnp.float32)
            full_gate = jax.vmap(lambda g, w, i: g.at[i].set(w))(full_gate, gate_w, idx)
            g = jnp.einsum("th,ehm->etm", x2, w_gate)
            u = jnp.einsum("th,ehm->etm", x2, w_up)
            y = jnp.einsum("etm,emh->eth", act(g) * u, w_down)
            out = jnp.einsum("eth,te->th", y, full_gate.astype(cfg.dtype))
            if shared is not None:
                out = out + shared
            return out.reshape(B, S, H).astype(x.dtype), aux

        # ---- dispatch path -------------------------------------------------
        # GShard-style token GROUPS (cfg.moe_group_size): each group of
        # S_g tokens builds its own (S_g·K, E, C) one-hot dispatch tensor
        # and capacity budget, so dispatch memory is LINEAR in T
        # (T·K·E·S_g elements total) instead of the single-group
        # O(T²·K/E). Dropless stays exact under grouping: within a group
        # an expert can receive at most S_g assignments (top-k indices
        # are distinct per token), so C = S_g loses nothing.
        import math

        cf = cfg.moe_capacity_factor
        g_size = min(cfg.moe_group_size or T, T)
        T_pad = -(-T // g_size) * g_size
        G = T_pad // g_size
        Ag = g_size * K  # assignments per group (token-major, HF order)
        if cf is None:
            C = g_size  # dropless
        else:
            C = min(g_size, max(1, math.ceil(g_size * K * float(cf) / E)))
        flat_idx = jnp.pad(idx, ((0, T_pad - T), (0, 0))).reshape(T_pad * K)
        # padded rows must not consume capacity: zero their assignment
        valid = jnp.repeat(jnp.arange(T_pad) < T, K)  # (T_pad·K,)
        assign = jax.nn.one_hot(flat_idx, E, dtype=jnp.int32) * valid[:, None]
        assign = assign.reshape(G, Ag, E)
        # Position of each assignment within its expert's buffer = number
        # of PRIOR assignments (in its group) to the same expert.
        prior = jnp.cumsum(assign, axis=1) - assign
        pos = jnp.sum(assign * prior, axis=-1)  # (G, Ag)
        keep = pos < C
        # One-hot dispatch (G, Ag, E, C): one (e, c) per kept assignment.
        disp = (
            assign[..., None] * jax.nn.one_hot(pos, C, dtype=jnp.int32)[:, :, None, :]
        ) * keep[..., None, None]
        disp = disp.astype(cfg.dtype)  # one-hot → MXU contractions
        x_pad = jnp.pad(x2, ((0, T_pad - T), (0, 0)))
        x_rep = jnp.broadcast_to(x_pad[:, None, :], (T_pad, K, H)).reshape(G, Ag, H)
        xe = jnp.einsum("gaec,gah->gech", disp, x_rep)  # (G, E, C, H)
        g = jnp.einsum("gech,ehm->gecm", xe, w_gate)
        u = jnp.einsum("gech,ehm->gecm", xe, w_up)
        ye = jnp.einsum("gecm,emh->gech", act(g) * u, w_down)
        y_rep = jnp.einsum("gaec,gech->gah", disp, ye)  # dropped rows → 0
        out = jnp.sum(
            y_rep.reshape(T_pad, K, H)[:T] * gate_w[:, :, None].astype(cfg.dtype),
            axis=1,
        )
        if shared is not None:
            out = out + shared
        return out.reshape(B, S, H).astype(x.dtype), aux
