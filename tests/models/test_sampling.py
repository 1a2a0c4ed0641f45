"""Sampling (models/sampling.py) across the generation engines.

The contract: sampling keys derive from (request index, token index), so
the lockstep batch path, the continuous-batching host loop, the fused
on-device schedule, and the streaming server all draw IDENTICAL tokens
for the same request at the same seed — slot assignment, chunking, and
arrival order must not leak into the randomness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decode_engine import DecodeEngine
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.generate import build_greedy_generate
from dalm_tpu.models.sampling import SamplerConfig, select_token

P = 16
SAMPLER = SamplerConfig(temperature=0.8, top_k=20, seed=7)


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


def _prompts(n, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        real = int(rng.integers(3, P))
        ids[i, P - real :] = rng.integers(5, 120, size=real)
        mask[i, P - real :] = 1
    return ids, mask


# ---- unit-level -----------------------------------------------------------

def test_greedy_config_is_argmax():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)), jnp.float32)
    out = select_token(logits, SamplerConfig())
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32)
    cfg = SamplerConfig(temperature=1.0, top_k=5, seed=0)
    allowed = set(np.argsort(np.asarray(logits)[0])[-5:])
    rows = jnp.zeros((1,), jnp.int32)
    draws = {
        int(select_token(logits, cfg, rows, jnp.full((1,), t, jnp.int32))[0])
        for t in range(200)
    }
    assert draws <= allowed
    assert len(draws) > 1  # actually stochastic


def test_top_p_restricts_support():
    # peaked distribution: top-2 tokens carry ~all mass
    logits = jnp.asarray([[10.0, 9.5] + [0.0] * 62], jnp.float32)
    cfg = SamplerConfig(temperature=1.0, top_p=0.9, seed=0)
    rows = jnp.zeros((1,), jnp.int32)
    draws = {
        int(select_token(logits, cfg, rows, jnp.full((1,), t, jnp.int32))[0])
        for t in range(200)
    }
    assert draws <= {0, 1}


def test_top_k_one_is_greedy():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(4, 64)), jnp.float32)
    cfg = SamplerConfig(temperature=1.0, top_k=1, seed=3)
    rows = jnp.arange(4, dtype=jnp.int32)
    out = select_token(logits, cfg, rows, jnp.zeros_like(rows))
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))


# ---- engine equivalence ---------------------------------------------------

def _trim(row, eos, cap):
    out = []
    if cap <= 0:
        return out
    for t in row:
        t = int(t)
        if eos is not None and t == eos:
            break
        out.append(t)
        if len(out) >= cap:
            break
    return out


def test_sampled_continuous_and_fused_match_lockstep(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(7, rng_seed=10)
    max_new = 6
    gen = build_greedy_generate(decoder, max_new, eos_token_id=None, pad_token_id=0, sampler=SAMPLER)
    expected = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))

    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0, decode_chunk=3,
        sampler=SAMPLER,
    )
    got_host = eng.generate(ids, mask)
    got_fused = eng.generate_fused(ids, mask)
    for i in range(7):
        want = [int(t) for t in expected[i]]
        assert got_host[i] == want, f"host-loop request {i} diverged"
        assert got_fused[i] == want, f"fused request {i} diverged"


def test_sampled_streaming_matches_lockstep(decoder_and_params):
    from dalm_tpu.models.streaming import StreamingEngine

    decoder, params = decoder_and_params
    ids, mask = _prompts(5, rng_seed=11)
    gen = build_greedy_generate(decoder, 5, eos_token_id=None, pad_token_id=0, sampler=SAMPLER)
    expected = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
        sampler=SAMPLER,
    )
    with StreamingEngine(eng) as srv:
        handles = [srv.submit(ids[i], mask[i]) for i in range(5)]
        for i, h in enumerate(handles):
            assert h.result(timeout=120) == [int(t) for t in expected[i]], f"req {i}"


def test_different_seeds_differ(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(4, rng_seed=12)
    outs = []
    for seed in (1, 2):
        gen = build_greedy_generate(
            decoder, 8, eos_token_id=None, pad_token_id=0,
            sampler=SamplerConfig(temperature=1.0, seed=seed),
        )
        outs.append(np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask))))
    assert not np.array_equal(outs[0], outs[1])


def test_sampled_budgets_and_eos(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(6, rng_seed=13)
    max_new = 8
    free = build_greedy_generate(decoder, max_new, eos_token_id=None, pad_token_id=0, sampler=SAMPLER)
    ref = np.asarray(free(params, jnp.asarray(ids), jnp.asarray(mask)))
    vals, counts = np.unique(ref[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    budgets = [8, 3, 0, 5, 1, 8]
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0, decode_chunk=4,
        sampler=SAMPLER,
    )
    got = eng.generate(ids, mask, budgets=budgets)
    got_f = eng.generate_fused(ids, mask, budgets=budgets)
    for i, b in enumerate(budgets):
        want = _trim(ref[i], eos, b)
        assert got[i] == want, f"host req {i}"
        assert got_f[i] == want, f"fused req {i}"


@pytest.mark.slow
def test_pipeline_sampled_answers_consistent():
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(8)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=4, embed_batch=8,
        sampler=SamplerConfig(temperature=0.9, top_k=30, seed=5),
    )
    queries = [f"what is topic {i}" for i in range(4)]
    a1 = pipe.answer(queries, top_k=2)
    a2 = pipe.answer_continuous(queries, top_k=2, num_slots=2)
    assert [a.answer for a in a1] == [a.answer for a in a2]
