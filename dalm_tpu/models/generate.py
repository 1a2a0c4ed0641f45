"""Jitted autoregressive generation (greedy) with a static KV cache.

Replaces the reference's HF ``model.generate`` in RAG eval
(`/root/reference/dalm/eval/eval_rag.py:127-141`). TPU-native shape:

- prompts are LEFT-padded to a static prefill length ``P`` (HF's own
  requirement for decoder-only generate);
- prefill is one full forward that also writes cache slots ``[0, P)``;
- decode is a ``lax.scan`` of single-token steps over the cache —
  one compiled program regardless of batch content;
- greedy argmax matches the reference's default generate config (no
  sampling flags are passed there); an optional ``sampler``
  (models/sampling.py) switches to temperature/top-k/top-p sampling
  keyed per (request row, token index) — the same tokens any of the
  serving engines would draw for that request;
- tokens strictly after the first EOS are replaced by pad post-hoc
  (same observable output as early stopping, but with static shapes).

``(P, max_new_tokens)`` pairs compile once and are reused across eval
batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dalm_tpu.models.decoder import Decoder
from dalm_tpu.models.sampling import SamplerConfig, resolve, select_token


def build_greedy_generate(
    decoder: Decoder,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    pad_token_id: int = 0,
    extra_collections: Optional[dict] = None,
    sampler: Optional[SamplerConfig] = None,
):
    """Returns jitted ``fn(params, input_ids, attention_mask) -> (B, T_new)``.

    ``input_ids``/``attention_mask``: left-padded (B, P) prompts.
    ``extra_collections``: additional flax variable collections (e.g.
    ``{"quant": ...}`` for an int8-packed generator — decode is
    HBM-bound, so int8 weight storage ≈ 2× tokens/sec).
    """
    extra = extra_collections or {}
    cfg = resolve(sampler)

    @jax.jit
    def _generate(params, extra, input_ids, attention_mask):
        variables = {"params": params, **extra}
        B, P = input_ids.shape
        total_len = P + max_new_tokens
        cache = decoder.init_kv_cache(B, total_len)

        # RoPE positions for left-padded prompts: first real token at 0.
        prompt_positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, min=0)
        real_len = attention_mask.sum(axis=1)  # (B,)

        # Slot validity over the whole cache: prompt slots per the prompt
        # mask, decode slots always valid (causal slot masking inside the
        # decoder hides the not-yet-written ones).
        slot_mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, max_new_tokens), attention_mask.dtype)], axis=1
        )

        logits, cache = decoder.apply(
            variables,
            input_ids,
            slot_mask,
            positions=prompt_positions,
            kv_cache=cache,
            cache_index=0,
        )
        rows = jnp.arange(B, dtype=jnp.int32)  # request index = batch row
        first_tok = select_token(logits[:, -1, :], cfg, rows, jnp.zeros_like(rows))

        def step(carry, t):
            cache, tok, pos = carry
            step_logits, cache = decoder.apply(
                variables,
                tok[:, None],
                slot_mask,
                positions=pos[:, None],
                kv_cache=cache,
                cache_index=P + t,
            )
            new_tok = select_token(
                step_logits[:, 0, :], cfg, rows, jnp.full_like(rows, t + 1)
            )
            return (cache, new_tok, pos + 1), new_tok

        if max_new_tokens > 1:
            _, scanned = jax.lax.scan(
                step, (cache, first_tok, real_len), jnp.arange(max_new_tokens - 1)
            )
            toks = jnp.concatenate([first_tok[:, None], jnp.moveaxis(scanned, 0, 1)], axis=1)
        else:
            toks = first_tok[:, None]

        if eos_token_id is not None:
            is_eos = (toks == eos_token_id).astype(jnp.int32)
            after_eos = (jnp.cumsum(is_eos, axis=1) - is_eos) > 0
            toks = jnp.where(after_eos, pad_token_id, toks)
        return toks

    def generate(params, input_ids, attention_mask):
        return _generate(params, extra, input_ids, attention_mask)

    return generate
