"""Continuous-batching decode engine (models/decode_engine.py).

The invariant that matters: with per-slot cache indices, slot recycling,
and chunked decode, every prompt's greedy output must be IDENTICAL to
the lockstep `build_greedy_generate` path — admission order, slot
reuse, and chunk boundaries must not leak into the tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decode_engine import DecodeEngine
from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.generate import build_greedy_generate

P = 16  # static prompt length (left-padded)


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
    """Left-padded (n, P) prompts of varying real length."""
    rng = np.random.default_rng(rng_seed)
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        real = int(rng.integers(3, P))
        ids[i, P - real :] = rng.integers(5, 120, size=real)
        mask[i, P - real :] = 1
    return ids, mask


def _lockstep(decoder, params, ids, mask, max_new, eos=None):
    gen = build_greedy_generate(decoder, max_new, eos_token_id=eos, pad_token_id=0)
    return np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))


def _trim(row, eos, max_new):
    out = []
    if max_new <= 0:
        return out
    for t in row:
        if eos is not None and t == eos:
            break
        out.append(int(t))
        if len(out) >= max_new:
            break
    return out


@pytest.mark.parametrize("num_slots,n_req", [(4, 4), (2, 7), (3, 8)])
def test_matches_lockstep_greedy(decoder_and_params, num_slots, n_req):
    """More requests than slots: recycling still reproduces lockstep."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(n_req, rng_seed=n_req)
    max_new = 6
    expected = _lockstep(decoder, params, ids, mask, max_new)

    eng = DecodeEngine(
        decoder, params, num_slots=num_slots, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0, decode_chunk=3,
    )
    got = eng.generate(ids, mask)
    for i in range(n_req):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"


def test_eos_recycles_slots(decoder_and_params):
    """EOS mid-stream: output matches lockstep's post-hoc EOS trim, and
    freed slots service the queue (engine finishes all N > slots)."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(9, rng_seed=42)
    max_new = 8
    # pick an EOS id that actually occurs in some lockstep output so the
    # early-stop path is exercised, not vacuous
    ref_free = _lockstep(decoder, params, ids, mask, max_new)
    vals, counts = np.unique(ref_free[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])

    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0, decode_chunk=4,
    )
    got = eng.generate(ids, mask)
    hit_eos = 0
    for i in range(9):
        want = _trim(ref_free[i], eos, max_new)
        assert got[i] == want, f"request {i} diverged"
        if len(want) < max_new:
            hit_eos += 1
    assert hit_eos > 0  # the trait under test actually occurred


def test_max_new_one(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(3, rng_seed=7)
    expected = _lockstep(decoder, params, ids, mask, 1)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=1, eos_token_id=None, pad_token_id=0,
    )
    got = eng.generate(ids, mask)
    for i in range(3):
        assert got[i] == [int(expected[i, 0])]


def test_engine_reusable_across_calls(decoder_and_params):
    """A second generate() on the same engine (dirty caches) is correct."""
    decoder, params = decoder_and_params
    eng = DecodeEngine(
        decoder, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
    )
    for seed in (1, 2):
        ids, mask = _prompts(5, rng_seed=seed)
        expected = _lockstep(decoder, params, ids, mask, 5)
        got = eng.generate(ids, mask)
        for i in range(5):
            assert got[i] == [int(t) for t in expected[i]]


def test_per_request_budgets(decoder_and_params):
    """Each request stops at its own budget and its tokens are the
    lockstep prefix of that length; zero-budget requests return []."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(6, rng_seed=11)
    expected = _lockstep(decoder, params, ids, mask, 8)
    budgets = [8, 3, 0, 5, 1, 8]
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=8, eos_token_id=None, pad_token_id=0, decode_chunk=4,
    )
    got = eng.generate(ids, mask, budgets=budgets)
    for i, b in enumerate(budgets):
        assert got[i] == [int(t) for t in expected[i][:b]], f"request {i}"


@pytest.mark.parametrize("num_slots,n_req", [(4, 4), (2, 7), (3, 8)])
def test_fused_matches_lockstep_greedy(decoder_and_params, num_slots, n_req):
    """The single-program on-device schedule == lockstep greedy."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(n_req, rng_seed=100 + n_req)
    max_new = 6
    expected = _lockstep(decoder, params, ids, mask, max_new)
    eng = DecodeEngine(
        decoder, params, num_slots=num_slots, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0,
    )
    got = eng.generate_fused(ids, mask)
    for i in range(n_req):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"


def test_fused_eos_and_budgets(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(9, rng_seed=142)
    max_new = 8
    ref_free = _lockstep(decoder, params, ids, mask, max_new)
    vals, counts = np.unique(ref_free[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    budgets = [8, 3, 0, 5, 1, 8, 2, 8, 4]
    eng = DecodeEngine(
        decoder, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0,
    )
    got = eng.generate_fused(ids, mask, budgets=budgets)
    hit_eos = 0
    for i in range(9):
        want = _trim(ref_free[i], eos, budgets[i])
        assert got[i] == want, f"request {i} diverged"
        if len(want) < budgets[i]:
            hit_eos += 1
    assert hit_eos > 0


def test_gpt2_family_matches_lockstep():
    """The GPT-2 decoder family supports per-slot cache indices too."""
    from dalm_tpu.models.registry import DECODER_PRESETS, build_decoder
    import dataclasses

    cfg = dataclasses.replace(DECODER_PRESETS["tiny-gpt2"](), vocab_size=128)
    decoder = build_decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    ids, mask = _prompts(5, rng_seed=9)
    expected = _lockstep(decoder, params, ids, mask, 5)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
    )
    got = eng.generate(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]


def test_int8_packed_decode_matches_lockstep(decoder_and_params):
    """Engine with int8 `quant` weight storage == lockstep generate with
    the same packed collections (the quantized-serving path)."""
    from dalm_tpu.models.qlora import pack_qlora_frozen

    decoder, params = decoder_and_params
    residual, quant = pack_qlora_frozen(params, quantize=True, min_size=1)
    ids, mask = _prompts(5, rng_seed=3)
    gen = build_greedy_generate(
        decoder, 5, eos_token_id=None, pad_token_id=0,
        extra_collections={"quant": quant},
    )
    expected = np.asarray(gen(residual, jnp.asarray(ids), jnp.asarray(mask)))
    eng = DecodeEngine(
        decoder, residual, num_slots=2, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
        extra_collections={"quant": quant},
    )
    got = eng.generate(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]


@pytest.mark.slow
def test_quantized_pipeline_serves():
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(8)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=4, embed_batch=8,
        quantize_generator=True,
    )
    a1 = pipe.answer(["what is topic 3"], top_k=2)
    a2 = pipe.answer_continuous(["what is topic 3"], top_k=2, num_slots=2)
    assert a1[0].answer == a2[0].answer
    assert isinstance(a1[0].answer, str)


@pytest.mark.slow
def test_answer_continuous_matches_answer():
    from dalm_tpu.serve import RagPipeline

    passages = [f"passage about topic {i} with unique content {i}" for i in range(10)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=4, embed_batch=8,
    )
    queries = [f"what is topic {i}" for i in range(6)]
    lockstep = pipe.answer(queries, top_k=2)
    cont = pipe.answer_continuous(queries, top_k=2, num_slots=2, decode_chunk=2)
    assert [a.answer for a in cont] == [a.answer for a in lockstep]
    assert [a.passages for a in cont] == [a.passages for a in lockstep]


def test_gqa_decoder_matches_lockstep():
    """GQA (num_kv_heads < num_heads): the continuous-batching engine's
    per-slot cache writes and slot masks work on the smaller KV shape;
    outputs match lockstep greedy exactly."""
    import dataclasses

    cfg = dataclasses.replace(
        DecoderConfig.tiny(vocab_size=128), num_heads=4, num_kv_heads=2, hidden_size=64
    )
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    cache = decoder.init_kv_cache(2, 8)
    assert cache["layer_0"]["k"].shape == (2, 8, 2, 16)  # kv_heads=2, not 4
    ids, mask = _prompts(5, rng_seed=21)
    expected = _lockstep(decoder, params, ids, mask, 5)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
    )
    got = eng.generate(ids, mask)
    got_f = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]
        assert got_f[i] == [int(t) for t in expected[i]]


def test_sliding_window_decode_matches_lockstep():
    """sliding_window config: cached decode applies the band over cache
    slots; engine outputs equal lockstep (both banded), and differ from
    the full-attention decoder (the window actually bites)."""
    import dataclasses

    base = DecoderConfig.tiny(vocab_size=128)
    sw_cfg = dataclasses.replace(base, sliding_window=6)
    dec_sw = Decoder(sw_cfg)
    dec_full = Decoder(base)
    params = unbox(
        dec_full.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    ids, mask = _prompts(5, rng_seed=33)
    exp_sw = _lockstep(dec_sw, params, ids, mask, 6)
    exp_full = _lockstep(dec_full, params, ids, mask, 6)
    assert not np.array_equal(exp_sw, exp_full)  # the band changes outputs

    eng = DecodeEngine(
        dec_sw, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=6, eos_token_id=None, pad_token_id=0, decode_chunk=3,
    )
    got = eng.generate(ids, mask)
    got_f = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in exp_sw[i]]
        assert got_f[i] == [int(t) for t in exp_sw[i]]


def test_gemma2_family_decode_matches_lockstep():
    """Gemma2-flavored config (sandwich norms + attn/final softcap +
    decoupled query scale + sliding window on EVEN layers only): the
    engine's per-slot cached decode matches lockstep, and the
    alternating pattern is load-bearing (sliding_layers='all' with the
    same params produces different tokens)."""
    import dataclasses

    cfg = dataclasses.replace(
        DecoderConfig.tiny(vocab_size=128), num_layers=4, num_heads=4,
        num_kv_heads=2, hidden_size=64, post_norms=True, sliding_window=6,
        sliding_layers="even", attn_logit_softcap=50.0,
        final_logit_softcap=30.0, query_pre_attn_scalar=8.0,
    )
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(2), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    assert "post_feedforward_norm" in params["layer_0"]  # sandwich norms exist
    ids, mask = _prompts(5, rng_seed=44)
    expected = _lockstep(decoder, params, ids, mask, 6)
    # same params, every layer windowed → alternation must change tokens
    all_win = Decoder(dataclasses.replace(cfg, sliding_layers="all"))
    assert not np.array_equal(_lockstep(all_win, params, ids, mask, 6), expected)

    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=6, eos_token_id=None, pad_token_id=0, decode_chunk=3,
    )
    got = eng.generate(ids, mask)
    got_f = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]
        assert got_f[i] == [int(t) for t in expected[i]]


def test_gemma3_family_decode_matches_lockstep():
    """Gemma3-flavored config (QK-norm + dual-theta rope + patterned
    sliding layers): the engine's per-slot cached decode matches
    lockstep, and the dual rope base is load-bearing (a single-theta
    twin with the same params produces different tokens)."""
    import dataclasses

    cfg = dataclasses.replace(
        DecoderConfig.tiny(vocab_size=128), num_layers=3, num_heads=4,
        num_kv_heads=2, hidden_size=64, post_norms=True, sliding_window=6,
        sliding_layers=(True, True, False), qk_norm=True,
        rope_local_theta=1000.0, rope_theta=100000.0,
        rope_scaling_factor=2.0, query_pre_attn_scalar=8.0,
        rmsnorm_unit_offset=True,
    )
    decoder = Decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(3), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    assert "q_norm" in params["layer_0"]["attention"]  # qk norms exist
    # zero-centered (1+w) init makes q/k norms identity at init;
    # randomize so they are load-bearing in the engine comparison
    params = jax.tree.map(np.asarray, params)
    rng = np.random.default_rng(7)
    for i in range(3):
        att = params[f"layer_{i}"]["attention"]
        att["q_norm"]["scale"] = rng.normal(0, 0.5, att["q_norm"]["scale"].shape).astype(np.float32)
        att["k_norm"]["scale"] = rng.normal(0, 0.5, att["k_norm"]["scale"].shape).astype(np.float32)
    ids, mask = _prompts(5, rng_seed=55)
    expected = _lockstep(decoder, params, ids, mask, 6)
    # same params, single rope base everywhere → dual rope must change tokens
    single = Decoder(dataclasses.replace(cfg, rope_local_theta=None))
    assert not np.array_equal(_lockstep(single, params, ids, mask, 6), expected)

    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=6, eos_token_id=None, pad_token_id=0, decode_chunk=3,
    )
    got = eng.generate(ids, mask)
    got_f = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]
        assert got_f[i] == [int(t) for t in expected[i]]


@pytest.mark.parametrize("num_slots,n_req,gamma", [(2, 7, 4), (3, 8, 6)])
def test_speculative_fused_matches_lockstep(decoder_and_params, num_slots, n_req, gamma):
    """speculative_gamma > 0: the fused schedule verifies multi-token
    drafts per pass but must still reproduce lockstep greedy exactly,
    through slot recycling."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(n_req, rng_seed=300 + n_req)
    max_new = 10
    expected = _lockstep(decoder, params, ids, mask, max_new)
    eng = DecodeEngine(
        decoder, params, num_slots=num_slots, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0,
        speculative_gamma=gamma,
    )
    got = eng.generate_fused(ids, mask)
    for i in range(n_req):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"


def test_speculative_fused_eos_and_budgets(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(9, rng_seed=342)
    max_new = 8
    ref_free = _lockstep(decoder, params, ids, mask, max_new)
    vals, counts = np.unique(ref_free[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    budgets = [8, 3, 0, 5, 1, 8, 2, 8, 4]
    eng = DecodeEngine(
        decoder, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0,
        speculative_gamma=5,
    )
    got = eng.generate_fused(ids, mask, budgets=budgets)
    hit_eos = 0
    for i in range(9):
        want = _trim(ref_free[i], eos, budgets[i])
        assert got[i] == want, f"request {i} diverged"
        if len(want) < budgets[i]:
            hit_eos += 1
    assert hit_eos > 0


def test_speculative_fused_repetitive_accepts(decoder_and_params):
    """Repetitive prompts (copy regime): outputs still exact."""
    decoder, params = decoder_and_params
    rng = np.random.default_rng(77)
    n = 5
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        period = int(rng.integers(2, 4))
        pat = rng.integers(5, 120, size=period)
        real = int(rng.integers(10, P))
        ids[i, P - real :] = np.tile(pat, P // period + 1)[:real]
        mask[i, P - real :] = 1
    expected = _lockstep(decoder, params, ids, mask, 12)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=12, eos_token_id=None, pad_token_id=0,
        speculative_gamma=6,
    )
    got = eng.generate_fused(ids, mask)
    for i in range(n):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"


def test_gpt2_speculative_fused_matches_lockstep():
    """GPT-2 family supports multi-token vector cache writes too (the
    speculative verification path)."""
    from dalm_tpu.models.registry import DECODER_PRESETS, build_decoder
    import dataclasses

    cfg = dataclasses.replace(DECODER_PRESETS["tiny-gpt2"](), vocab_size=128)
    decoder = build_decoder(cfg)
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    ids, mask = _prompts(5, rng_seed=91)
    expected = _lockstep(decoder, params, ids, mask, 8)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P,
        max_new_tokens=8, eos_token_id=None, pad_token_id=0,
        speculative_gamma=4,
    )
    got = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]


@pytest.mark.parametrize("num_slots,n_req", [(2, 7), (3, 8)])
def test_speculative_host_loop_matches_lockstep(decoder_and_params, num_slots, n_req):
    """spec_gamma > 0 on the HOST-LOOP path: the host computes drafts
    from its own bookkeeping, the device verifies; outputs == lockstep
    greedy through slot recycling."""
    decoder, params = decoder_and_params
    ids, mask = _prompts(n_req, rng_seed=400 + n_req)
    max_new = 10
    expected = _lockstep(decoder, params, ids, mask, max_new)
    eng = DecodeEngine(
        decoder, params, num_slots=num_slots, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0,
        speculative_gamma=5,
    )
    got = eng.generate(ids, mask)
    for i in range(n_req):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"


def test_speculative_host_loop_eos_budgets(decoder_and_params):
    decoder, params = decoder_and_params
    ids, mask = _prompts(9, rng_seed=442)
    max_new = 8
    ref_free = _lockstep(decoder, params, ids, mask, max_new)
    vals, counts = np.unique(ref_free[:, 1:], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    budgets = [8, 3, 0, 5, 1, 8, 2, 8, 4]
    eng = DecodeEngine(
        decoder, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0,
        speculative_gamma=4,
    )
    got = eng.generate(ids, mask, budgets=budgets)
    for i in range(9):
        want = _trim(ref_free[i], eos, budgets[i])
        assert got[i] == want, f"request {i} diverged"


# --- sampled speculative (rejection verification) through the engine ---


def test_sampled_speculative_fused_and_hostloop_match_lockstep(decoder_and_params):
    """speculative_gamma composed with a sampler: the engine (fused AND
    host-loop schedules) must reproduce the lockstep sampled-speculative
    stream bit-for-bit — drafts are a deterministic function of the
    per-request history and randomness is keyed by (request, token
    index, use), so pass boundaries and slot recycling cannot leak."""
    from dalm_tpu.models.sampling import SamplerConfig
    from dalm_tpu.models.speculative import build_speculative_generate

    decoder, params = decoder_and_params
    n, max_new, gamma = 7, 10, 4
    ids, mask = _prompts(n, rng_seed=901)
    samp = SamplerConfig(temperature=0.8, top_k=8, seed=11)
    spec = build_speculative_generate(
        decoder, max_new, eos_token_id=None, pad_token_id=0, gamma=gamma, sampler=samp
    )
    expected = np.asarray(spec(params, jnp.asarray(ids), jnp.asarray(mask)))
    eng = DecodeEngine(
        decoder, params, num_slots=3, max_prompt_len=P, max_new_tokens=max_new,
        eos_token_id=None, pad_token_id=0, speculative_gamma=gamma, sampler=samp,
    )
    got_f = eng.generate_fused(ids, mask)
    for i in range(n):
        assert got_f[i] == [int(t) for t in expected[i]], f"fused request {i} diverged"
    got_h = eng.generate(ids, mask)
    for i in range(n):
        assert got_h[i] == [int(t) for t in expected[i]], f"host-loop request {i} diverged"


def test_sampled_speculative_fused_topk1_is_greedy(decoder_and_params):
    """Deterministic limit: top_k=1 sampled speculation == lockstep greedy."""
    from dalm_tpu.models.sampling import SamplerConfig

    decoder, params = decoder_and_params
    ids, mask = _prompts(6, rng_seed=913)
    max_new = 8
    expected = _lockstep(decoder, params, ids, mask, max_new)
    eng = DecodeEngine(
        decoder, params, num_slots=2, max_prompt_len=P, max_new_tokens=max_new,
        eos_token_id=None, pad_token_id=0, speculative_gamma=5,
        sampler=SamplerConfig(temperature=1.0, top_k=1, seed=7),
    )
    got = eng.generate_fused(ids, mask)
    for i in range(6):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"
