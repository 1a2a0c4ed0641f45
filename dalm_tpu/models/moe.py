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
  ``moe_capacity_factor=None`` capacity is T (dropless, exact — the
  per-expert assignment count can never exceed the token count since
  top-k indices are distinct per token).

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


class MoEBlock(nn.Module):
    """Sparse MoE MLP: SwiGLU experts with stacked, EP-sharded weights."""

    cfg: Any  # DecoderConfig (duck-typed to avoid a circular import)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
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
        assign_frac = jnp.mean(
            jax.nn.one_hot(idx, E, dtype=jnp.float32), axis=(0, 1)
        )  # (E,) — fraction of (token, k) assignments per expert, ×1/K·E≈1
        mean_prob = jnp.mean(
            jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1), axis=0
        )
        aux = jnp.asarray(E, jnp.float32) * jnp.sum(assign_frac * mean_prob)

        impl = cfg.moe_impl
        if impl == "auto":
            impl = "dense" if T <= 512 else "dispatch"

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
            return out.reshape(B, S, H).astype(x.dtype), aux

        # ---- dispatch path -------------------------------------------------
        cf = cfg.moe_capacity_factor
        if cf is None:
            C = T  # dropless: an expert can receive at most T assignments
        else:
            import math

            C = min(T, max(1, math.ceil(T * K * float(cf) / E)))
        A = T * K  # assignments, token-major then choice-minor (HF order)
        flat_idx = idx.reshape(A)
        assign = jax.nn.one_hot(flat_idx, E, dtype=jnp.int32)  # (A, E)
        # Position of each assignment within its expert's buffer = number
        # of PRIOR assignments to the same expert (cumsum minus self).
        prior = jnp.cumsum(assign, axis=0) - assign
        pos = jnp.sum(assign * prior, axis=-1)  # (A,)
        keep = pos < C
        # One-hot dispatch (A, E, C): exactly one (e, c) per kept assignment.
        disp = (
            assign[:, :, None] * jax.nn.one_hot(pos, C, dtype=jnp.int32)[:, None, :]
        ) * keep[:, None, None]
        disp = disp.astype(cfg.dtype)  # (A, E, C) one-hot → MXU contractions
        x_rep = jnp.broadcast_to(x2[:, None, :], (T, K, H)).reshape(A, H)
        xe = jnp.einsum("aec,ah->ech", disp, x_rep)  # (E, C, H)
        g = jnp.einsum("ech,ehm->ecm", xe, w_gate)
        u = jnp.einsum("ech,ehm->ecm", xe, w_up)
        ye = jnp.einsum("ecm,emh->ech", act(g) * u, w_down)
        y_rep = jnp.einsum("aec,ech->ah", disp, ye)  # dropped rows → 0
        out = jnp.sum(
            y_rep.reshape(T, K, H) * gate_w[:, :, None].astype(cfg.dtype), axis=1
        )
        return out.reshape(B, S, H).astype(x.dtype), aux
