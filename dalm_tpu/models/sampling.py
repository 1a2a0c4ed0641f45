"""Token sampling for the generation stack (greedy / temperature / top-k / top-p).

The reference's only decode is HF ``generate()`` with default (greedy)
settings (`/root/reference/dalm/eval/eval_rag.py:127-141`); production
serving needs stochastic decoding. One rule makes sampling play well
with continuous batching: the PRNG key for a token is derived from
``(request_index, token_index)`` — NOT from slot or wall-clock — so the
lockstep batch path, the host-loop engine, and the fused on-device
schedule all draw the SAME token for the same request at the same
position (exact-match tested across engines).

All functions are jit-safe with static config: ``temperature == 0``
means greedy (argmax) and compiles the argmax path, not a sampled one.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dalm_tpu.kernels.flash_attention import NEG_INF


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampling configuration (hashable → usable as a jit static)."""

    temperature: float = 0.0  # 0 = greedy
    top_k: int = 0            # 0 = no top-k filter
    top_p: float = 1.0        # 1 = no nucleus filter
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    def base_key(self):
        return jax.random.PRNGKey(self.seed)


def token_key(base_key, request_idx, token_idx):
    """Per-(request, position) key — engine-independent determinism.

    Double fold (no arithmetic packing) so any (request, position) range
    stays collision-free."""
    return jax.vmap(
        lambda r, t: jax.random.fold_in(jax.random.fold_in(base_key, r), t)
    )(jnp.atleast_1d(request_idx), jnp.atleast_1d(token_idx))


def _filter_logits(logits, cfg: SamplerConfig):
    """Apply top-k / top-p masks to (B, V) f32 logits."""
    if cfg.top_k > 0 and cfg.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds p (always keep the top-1)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < cfg.top_p], axis=-1
        )
        # threshold = smallest kept logit per row
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, NEG_INF, logits)
    return logits


def select_token(logits, cfg: SamplerConfig, request_idx=None, token_idx=None):
    """(B, V) logits → (B,) int32 next tokens.

    Greedy when ``cfg.temperature == 0`` (request/token indices unused);
    otherwise temperature/top-k/top-p sampling keyed by
    ``(request_idx, token_idx)`` per row.
    """
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / cfg.temperature
    logits = _filter_logits(logits, cfg)
    keys = token_key(cfg.base_key(), request_idx, token_idx)
    sample = jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(keys, logits)
    return sample.astype(jnp.int32)


def resolve(sampler: Optional[SamplerConfig]) -> SamplerConfig:
    return sampler if sampler is not None else SamplerConfig()
