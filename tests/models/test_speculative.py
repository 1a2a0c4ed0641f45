"""Prompt-lookup speculative decoding (models/speculative.py).

THE invariant: outputs are bit-identical to `build_greedy_generate` for
every prompt — speculation changes the step count, never the tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.generate import build_greedy_generate
from dalm_tpu.models.speculative import build_speculative_generate

P = 24


@pytest.fixture(scope="module")
def decoder_and_params():
    cfg = DecoderConfig.tiny(vocab_size=128)
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    return decoder, params


def _prompts(n, rng_seed=0, repetitive=False):
    rng = np.random.default_rng(rng_seed)
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        real = int(rng.integers(8, P))
        if repetitive:
            period = int(rng.integers(2, 5))
            pat = rng.integers(5, 120, size=period)
            row = np.tile(pat, P // period + 1)[:real]
        else:
            row = rng.integers(5, 120, size=real)
        ids[i, P - real :] = row
        mask[i, P - real :] = 1
    return ids, mask


@pytest.mark.parametrize("gamma,repetitive", [(4, False), (8, False), (4, True), (8, True)])
def test_matches_greedy_exactly(decoder_and_params, gamma, repetitive):
    decoder, params = decoder_and_params
    ids, mask = _prompts(6, rng_seed=gamma + (100 if repetitive else 0), repetitive=repetitive)
    max_new = 12
    greedy = build_greedy_generate(decoder, max_new, eos_token_id=None, pad_token_id=0)
    spec = build_speculative_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, gamma=gamma
    )
    want = np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask)))
    got = np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_eos_masking_matches(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(8, rng_seed=42)
    max_new = 10
    free = build_greedy_generate(decoder, max_new, eos_token_id=None, pad_token_id=0)
    ref = np.asarray(free(params, jnp.asarray(ids), jnp.asarray(mask)))
    vals, counts = np.unique(ref[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])

    greedy = build_greedy_generate(decoder, max_new, eos_token_id=eos, pad_token_id=0)
    spec = build_speculative_generate(decoder, max_new, eos_token_id=eos, pad_token_id=0, gamma=5)
    want = np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask)))
    got = np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_single_token_budget(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(3, rng_seed=7)
    greedy = build_greedy_generate(decoder, 1, eos_token_id=None, pad_token_id=0)
    spec = build_speculative_generate(decoder, 1, eos_token_id=None, pad_token_id=0, gamma=4)
    np.testing.assert_array_equal(
        np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask))),
        np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask))),
    )


def test_gqa_decoder(decoder_and_params):
    import dataclasses

    cfg = dataclasses.replace(
        DecoderConfig.tiny(vocab_size=128), num_heads=4, num_kv_heads=2, hidden_size=64
    )
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(1), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    ids, mask = _prompts(4, rng_seed=9, repetitive=True)
    greedy = build_greedy_generate(decoder, 10, eos_token_id=None, pad_token_id=0)
    spec = build_speculative_generate(decoder, 10, eos_token_id=None, pad_token_id=0, gamma=6)
    np.testing.assert_array_equal(
        np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask))),
        np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask))),
    )


@pytest.mark.slow
def test_pipeline_speculative_matches_plain():
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(8)]
    common = dict(max_passage_len=32, max_prompt_len=64, max_new_tokens=6, embed_batch=8)
    plain = RagPipeline.from_pretrained("tiny", "tiny", passages, **common)
    spec = RagPipeline.from_pretrained(
        "tiny", "tiny", passages, speculative=True, speculative_gamma=4, **common
    )
    queries = [f"what is topic {i}" for i in range(4)]
    a = [x.answer for x in plain.answer(queries, top_k=2)]
    b = [x.answer for x in spec.answer(queries, top_k=2)]
    assert a == b


@pytest.mark.slow
def test_pipeline_speculative_continuous_matches():
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(8)]
    common = dict(max_passage_len=32, max_prompt_len=64, max_new_tokens=6, embed_batch=8)
    plain = RagPipeline.from_pretrained("tiny", "tiny", passages, **common)
    spec = RagPipeline.from_pretrained(
        "tiny", "tiny", passages, speculative=True, speculative_gamma=4, **common
    )
    queries = [f"what is topic {i}" for i in range(5)]
    a = [x.answer for x in plain.answer_continuous(queries, top_k=2, num_slots=2)]
    b = [x.answer for x in spec.answer_continuous(queries, top_k=2, num_slots=2)]
    assert a == b


# --- rejection-sampling verification (sampler composed with speculation) ---


@pytest.mark.slow
def test_pipeline_sampled_speculative_runs():
    """RagPipeline composes a sampler WITH speculation (rejection
    verification); top_k=1 is the deterministic limit, so the sampled
    speculative pipeline must equal the plain greedy one."""
    from dalm_tpu.models.sampling import SamplerConfig
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(8)]
    common = dict(max_passage_len=32, max_prompt_len=64, max_new_tokens=6, embed_batch=8)
    plain = RagPipeline.from_pretrained("tiny", "tiny", passages, **common)
    spec = RagPipeline.from_pretrained(
        "tiny", "tiny", passages, speculative=True, speculative_gamma=4,
        sampler=SamplerConfig(temperature=1.0, top_k=1, seed=3), **common
    )
    queries = [f"what is topic {i}" for i in range(4)]
    a = [x.answer for x in plain.answer(queries, top_k=2)]
    b = [x.answer for x in spec.answer(queries, top_k=2)]
    assert a == b


def _replicated_prompt(n):
    """One repetitive prompt replicated n times → n independent draws
    (per-row request keys) from the SAME target distribution."""
    rng = np.random.default_rng(3)
    pat = rng.integers(5, 120, size=3)
    row = np.tile(pat, P // 3 + 1)[:P]
    ids = np.tile(row[None, :], (n, 1)).astype(np.int32)
    return ids, np.ones_like(ids)


def test_sampled_topk1_matches_greedy_exactly(decoder_and_params):
    """Deterministic limit: top_k=1 sampling == greedy, so the rejection
    verifier must reproduce greedy bit-for-bit (accept iff draft ==
    argmax, residual == argmax)."""
    from dalm_tpu.models.sampling import SamplerConfig

    decoder, params = decoder_and_params
    ids, mask = _prompts(6, rng_seed=11, repetitive=True)
    max_new = 12
    greedy = build_greedy_generate(decoder, max_new, eos_token_id=None, pad_token_id=0)
    spec = build_speculative_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, gamma=5,
        sampler=SamplerConfig(temperature=1.0, top_k=1, seed=5),
    )
    np.testing.assert_array_equal(
        np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask))),
        np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask))),
    )


@pytest.mark.slow
def test_sampled_distribution_matches_plain(decoder_and_params):
    """Distribution exactness: per-position marginal token histograms of
    the speculative sampler match the non-speculative sampler's over
    2048 independent rows (TV distance below sampling noise + margin).
    A broken residual (e.g. re-drawing from the full target after a
    rejection) biases the marginals by ~E[p(draft)] and fails this."""
    from dalm_tpu.models.sampling import SamplerConfig

    decoder, params = decoder_and_params
    n, max_new = 2048, 3
    ids, mask = _replicated_prompt(n)
    samp = SamplerConfig(temperature=1.0, top_k=4, seed=9)
    plain = build_greedy_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, sampler=samp
    )
    spec = build_speculative_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, gamma=4, sampler=samp
    )
    a = np.asarray(plain(params, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask)))
    # position 0 uses identical (request, token-0) keys in both paths
    np.testing.assert_array_equal(a[:, 0], b[:, 0])
    for t in range(1, max_new):
        va = np.bincount(a[:, t], minlength=128) / n
        vb = np.bincount(b[:, t], minlength=128) / n
        tv = 0.5 * np.abs(va - vb).sum()
        assert tv < 0.08, (t, tv)


def test_sampled_speculation_accepts_drafts(decoder_and_params):
    """The accept path is actually exercised: on repetitive prompts with
    a peaked sampler, verification passes < tokens emitted."""
    from dalm_tpu.models.sampling import SamplerConfig

    decoder, params = decoder_and_params
    ids, mask = _prompts(4, rng_seed=13, repetitive=True)
    max_new = 16
    spec = build_speculative_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, gamma=6,
        sampler=SamplerConfig(temperature=0.2, seed=1), return_stats=True,
    )
    toks, passes = spec(params, jnp.asarray(ids), jnp.asarray(mask))
    assert toks.shape == (4, max_new)
    assert int(np.asarray(passes).max()) < max_new
