"""Blocked (chunked) admission prefill (DecodeEngine prefill_chunk).

The long-context finding (RESULTS.md "Long context"): the admission
branch prefilled the whole (rows, P) prompt block in one forward, so its
attention-score / absorbed-MLA / logit intermediates scale with rows×P —
at P=1024 that OOMs the chip before the KV cache does. ``prefill_chunk=C``
turns admission into a scan of P/C cached forwards. The invariant: the
cached path's causality is over absolute cache slots, so chunked
admission is the SAME math as one-shot admission — on CPU/f32 every
schedule must reproduce the unchunked engine token-for-token.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decode_engine import DecodeEngine
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.sampling import SamplerConfig

P = 16


def _prompts(n, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        real = int(rng.integers(3, P))
        ids[i, P - real :] = rng.integers(5, 120, size=real)
        mask[i, P - real :] = 1
    return ids, mask


def _init(cfg):
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, P), jnp.int32),
            jnp.ones((1, P), jnp.int32),
        )["params"]
    )
    return decoder, params


def _engines(decoder, params, chunk, **kw):
    base = dict(
        num_slots=3, max_prompt_len=P, max_new_tokens=6,
        eos_token_id=None, pad_token_id=0, decode_chunk=2,
    )
    base.update(kw)
    ref = DecodeEngine(decoder, params, **base)
    blk = DecodeEngine(decoder, params, prefill_chunk=chunk, **base)
    return ref, blk


CONFIGS = {
    "mha": lambda: DecoderConfig.tiny(vocab_size=128),
    "kvq": lambda: __import__("dataclasses").replace(
        DecoderConfig.tiny(vocab_size=128), kv_quant=True
    ),
    "mla": lambda: DecoderConfig.tiny_mla(vocab_size=128),
}


@pytest.mark.parametrize("family", sorted(CONFIGS))
def test_chunked_prefill_matches_oneshot(family):
    """Host-loop AND fused schedules, chunked vs one-shot, all families."""
    decoder, params = _init(CONFIGS[family]())
    ids, mask = _prompts(7, rng_seed=3)
    ref, blk = _engines(decoder, params, chunk=4)
    assert blk.prefill_C == 4
    want = ref.generate(ids, mask)
    assert blk.generate(ids, mask) == want
    assert blk.generate_fused(ids, mask) == want


def test_chunk_rounds_to_divisor():
    """Non-divisor request rounds DOWN to the largest divisor of P."""
    decoder, params = _init(CONFIGS["mha"]())
    ids, mask = _prompts(4, rng_seed=11)
    ref, blk = _engines(decoder, params, chunk=5)  # 5 -> 4 (P=16)
    assert blk.prefill_C == 4
    assert blk.generate(ids, mask) == ref.generate(ids, mask)
    # chunk >= P is the one-shot program
    _, one = _engines(decoder, params, chunk=64)
    assert one.prefill_C == P


def test_chunked_prefill_speculative_and_sampled():
    """Chunked admission composes with speculation and sampling: the
    emitted streams stay engine- and chunking-invariant (same keys)."""
    decoder, params = _init(CONFIGS["mha"]())
    ids, mask = _prompts(6, rng_seed=5)
    samp = SamplerConfig(temperature=0.7, top_k=40, seed=123)
    ref, blk = _engines(
        decoder, params, chunk=8, sampler=samp, speculative_gamma=3,
        eos_token_id=1,
    )
    want = ref.generate_fused(ids, mask)
    assert blk.generate_fused(ids, mask) == want
    assert blk.generate(ids, mask) == want


@pytest.mark.parametrize("width", [1, 2])
def test_compact_admission_matches_full_width(width):
    """admit_width=W admits in W-slot waves; per-request outputs are
    identical to full-width admission (keys are request-indexed)."""
    decoder, params = _init(CONFIGS["mha"]())
    ids, mask = _prompts(8, rng_seed=9)
    ref, _ = _engines(decoder, params, chunk=None, num_slots=4)
    cmp = DecodeEngine(
        decoder, params, num_slots=4, max_prompt_len=P, max_new_tokens=6,
        eos_token_id=None, pad_token_id=0, decode_chunk=2,
        admit_width=width, prefill_chunk=4,
    )
    want = ref.generate_fused(ids, mask)
    assert cmp.generate_fused(ids, mask) == want
    # host-loop waves are capped at W rows too (admits span rounds)
    assert cmp.generate(ids, mask) == want


def test_compact_admission_eos_budgets_sampled_spec():
    """Compact admission under slot churn (EOS + budgets), sampling, and
    speculation — the full scheduling surface stays request-invariant."""
    decoder, params = _init(CONFIGS["mha"]())
    ids, mask = _prompts(9, rng_seed=21)
    samp = SamplerConfig(temperature=0.8, top_k=30, seed=7)
    kw = dict(
        num_slots=4, max_prompt_len=P, max_new_tokens=7, eos_token_id=2,
        pad_token_id=0, decode_chunk=2, sampler=samp, speculative_gamma=2,
    )
    ref = DecodeEngine(decoder, params, **kw)
    cmp = DecodeEngine(decoder, params, admit_width=2, prefill_chunk=8, **kw)
    budgets = [7, 1, 4, 7, 2, 7, 3, 7, 5]
    want = ref.generate_fused(ids, mask, budgets=budgets)
    assert cmp.generate_fused(ids, mask, budgets=budgets) == want


def test_admit_width_validation():
    decoder, params = _init(CONFIGS["mha"]())
    with pytest.raises(ValueError, match="admit_width"):
        DecodeEngine(
            decoder, params, num_slots=2, max_prompt_len=P,
            max_new_tokens=4, admit_width=5,
        )
    # full-width request (W == B) is the default branch, not an error
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=4, admit_width=2,
    )
    assert eng.admit_W is None


def test_chunked_prefill_eos_and_budgets():
    """Slot recycling mid-stream re-admits through the chunked program."""
    decoder, params = _init(CONFIGS["mha"]())
    ids, mask = _prompts(9, rng_seed=42)
    ref, blk = _engines(decoder, params, chunk=4, num_slots=2, max_new_tokens=8)
    # an EOS that actually occurs (most common generated token)
    flat = np.concatenate([np.asarray(r, np.int32) for r in ref.generate(ids, mask)])
    vals, counts = np.unique(flat, return_counts=True)
    eos = int(vals[np.argmax(counts)])
    ref, blk = _engines(
        decoder, params, chunk=4, num_slots=2, max_new_tokens=8, eos_token_id=eos
    )
    budgets = [8, 1, 3, 8, 2, 8, 5, 8, 4]
    want = ref.generate_fused(ids, mask, budgets=budgets)
    assert blk.generate_fused(ids, mask, budgets=budgets) == want
