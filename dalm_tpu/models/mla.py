"""Multi-head latent attention (DeepSeek-V2/V3) — TPU-native.

Beyond-parity: the reference (arcee-ai/DALM) has no MLA support; its
generator wrapper loads whatever ``AutoModelForCausalLM`` provides
(`/root/reference/dalm/models/rag_e2e_base_model.py`). HF semantics
reference: ``transformers/models/deepseek_v3/modeling_deepseek_v3.py``
(``DeepseekV3Attention.forward``, eager path) — behavior matched, the
implementation below is structured for the TPU memory system instead of
torch modules.

The MLA idea: instead of per-head K/V, every token stores ONE shared
compressed latent ``c`` (kv_lora_rank wide, RMS-normed) and ONE shared
rope key ``k_pe`` (qk_rope_head_dim wide). Per-head keys/values are
linear functions of the latent (``kv_b``), so they never need to be
cached — the cache holds (r + d_rope) floats/token vs the standard
tier's ``kv_heads · 2 · head_dim`` (57× smaller at V3 shapes: 576 vs
32768). Decode on TPU is HBM-bound, so cache bytes ARE the decode cost;
MLA buys slot capacity the way the int8-KV tier does, times ~30.

Two computation paths, mathematically identical (linearity of ``kv_b``):

- **Cache-less (training / eval forward)**: decompress per-token K/V
  (``c @ kv_b``) and run standard softmax attention — the score cost is
  ``qk_head_dim`` per (q, k) pair, cheaper than latent-space scores
  when everything is materialized anyway.
- **Cached decode (ABSORBED)**: fold ``kv_b``'s K half into the query
  (``q_lat = q_nope @ W_k`` per head) and score directly against the
  latent cache; fold the V half into the output after the probability-
  weighted latent sum. No per-step decompression of the cache — every
  op is an MXU einsum over (r)-wide operands. This is the decode
  formulation MLA was designed for.

Equivalence of the two paths is pinned by
``tests/models/test_mla.py``; full-model logits parity vs the HF torch
implementation by the deepseek-v3 loader tests there.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalm_tpu.models.decoder import RMSNorm, _cache_write, _proj, apply_rope


def deinterleave_rope(x: jax.Array) -> jax.Array:
    """DeepSeek checkpoints store rope-dim weights pair-interleaved
    (HF ``rope_interleave=True``): positions [0,1,2,3,...] hold
    [re0, im0, re1, im1, ...]. rotate_half rope wants [re..., im...] —
    split even/odd lanes into halves (HF ``apply_rotary_pos_emb_
    interleave``'s view/transpose, expressed as a lane shuffle)."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


class MLAAttention(nn.Module):
    """Drop-in for DecoderAttention when ``cfg.kv_lora_rank`` is set.

    Same call contract: (hidden, mask(B,1,Sq,Sk), cos, sin, kv_cache,
    cache_index, segment_mask) → (out, new_cache). The cache layer dict
    uses key ``"k"`` for the latent buffer (B, L, r) so the decoder's
    ``kv_cache["layer_0"]["k"].shape[1]`` length introspection holds,
    and ``"pe"`` for the shared rope key (B, L, d_rope).
    """

    cfg: Any
    layer_idx: int = 0

    @nn.compact
    def __call__(self, hidden, mask, cos, sin, kv_cache=None, cache_index=None, segment_mask=None):
        cfg = self.cfg
        B, S, _ = hidden.shape
        nh = cfg.num_heads
        r = cfg.kv_lora_rank
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        dh = dn + dr
        scale = dh ** -0.5 * cfg.attn_scale_mult  # yarn mscale^2 lands here
        assert cfg.attention_impl != "ring", "MLA has no ring/CP path yet"
        assert not cfg.sliding_window, "MLA has no sliding-window support"

        def _rms(name):
            return RMSNorm(cfg.rms_norm_eps, cfg.dtype, cfg.param_dtype, name=name)

        # ---- queries --------------------------------------------------
        if cfg.q_lora_rank:
            qa = _proj(cfg.q_lora_rank, "q_a_proj", cfg, ("embed", "mla_rank"), cfg.attention_bias)(hidden)
            qa = _rms("q_a_norm")(qa)
            q = _proj(nh * dh, "q_b_proj", cfg, ("mla_rank", "heads"))(qa)
        else:
            q = _proj(nh * dh, "q_proj", cfg, ("embed", "heads"))(hidden)
        q = q.reshape(B, S, nh, dh)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        if cfg.rope_interleave:
            q_pe = deinterleave_rope(q_pe)
        q_pe = apply_rope(q_pe, cos, sin)

        # ---- shared latent + rope key --------------------------------
        ckv = _proj(r + dr, "kv_a_proj", cfg, ("embed", "mla_rank"), cfg.attention_bias)(hidden)
        c, k_pe = ckv[..., :r], ckv[..., r:]
        c = _rms("kv_a_norm")(c)  # normed latent IS the cached value
        if cfg.rope_interleave:
            k_pe = deinterleave_rope(k_pe)
        k_pe = apply_rope(k_pe[:, :, None, :], cos, sin)[:, :, 0, :]  # (B, S, dr)

        # kv_b as a raw kernel — both paths contract it explicitly
        # ((r, nh, dn) K half absorbed into q at decode), so FlexLinear's
        # apply-to-input shape doesn't fit. Stored (r, nh·(dn+dv)) to
        # match the HF weight layout after the loader's transpose.
        w_kv_b = self.param(
            "kv_b_proj",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("mla_rank", "heads")
            ),
            (r, nh * (dn + dv)),
            cfg.param_dtype,
        )
        w_kv_b = jnp.asarray(w_kv_b).astype(cfg.dtype).reshape(r, nh, dn + dv)
        w_k, w_v = w_kv_b[..., :dn], w_kv_b[..., dn:]

        new_cache = None
        if kv_cache is not None:
            # latent cache write rides the shared rank-aware writer
            # (one-hot select / one-hot MXU matmul / dynamic slice —
            # decoder._cache_write) with 3-D (B, L, r) buffers.
            new_cache = _cache_write(
                kv_cache, {"k": c.astype(kv_cache["k"].dtype),
                           "pe": k_pe.astype(kv_cache["pe"].dtype)},
                cache_index, S,
            )
            c_all, pe_all = new_cache["k"], new_cache["pe"]

            # ---- ABSORBED decode path --------------------------------
            q_lat = jnp.einsum("bqnd,rnd->bqnr", q_nope, w_k)
            scores = (
                jnp.einsum("bqnr,btr->bnqt", q_lat, c_all)
                + jnp.einsum("bqnd,btd->bnqt", q_pe, pe_all)
            ) * jnp.asarray(scale, cfg.dtype)
            s32 = jnp.where(mask, scores.astype(jnp.float32), jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(s32, axis=-1).astype(cfg.dtype)
            ctx_lat = jnp.einsum("bnqt,btr->bqnr", probs, c_all)
            ctx = jnp.einsum("bqnr,rnd->bqnd", ctx_lat, w_v).reshape(B, S, nh * dv)
        else:
            # ---- standard decompressed path (training / full fwd) ----
            kv = jnp.einsum("btr,rnd->btnd", c, w_kv_b)  # (B, S, nh, dn+dv)
            k_nope, v = kv[..., :dn], kv[..., dn:]
            k = jnp.concatenate(
                [k_nope, jnp.broadcast_to(k_pe[:, :, None, :], (B, S, nh, dr))],
                axis=-1,
            )
            qq = jnp.concatenate([q_nope, q_pe], axis=-1)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qq, k) * jnp.asarray(scale, cfg.dtype)
            s32 = jnp.where(mask, scores.astype(jnp.float32), jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(s32, axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, nh * dv)

        out = _proj(cfg.hidden_size, "o_proj", cfg, ("heads", "embed"), cfg.attention_bias)(ctx)
        return out, new_cache
