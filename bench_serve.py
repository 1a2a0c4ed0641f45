"""Serving benchmark: end-to-end RAG answers/sec through RagPipeline.

Embeds a synthetic 10k-passage corpus into the sharded index, then
measures the full answer path — query embed → exact top-k retrieval →
prompt build → jitted KV-cache greedy decode — on one chip. The
reference has no serving path at all (retrieval+generation live only in
its eval scripts); its closest anecdote is "llama-index eval, 2k
queries ≈ 4 h on A100" (BASELINE.md). Prints one JSON line per config.
Run manually (bench.py is the driver headline).
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

import numpy as np


def bench_7b_decode(int4: bool = False) -> None:
    """7B/8B-class int8 decode throughput on one 16 GB chip.

    The generator inits DIRECTLY into packed int8 storage
    (`qlora.init_packed_on_device` — no full-precision tree ever exists),
    then the continuous-batching engine decodes a full slot pool with
    W8A8 int8 MXU matmuls (`int8_compute="fwd"` — avoids materializing a
    bf16 dequantized weight set, measured +18%). Decode is HBM-bandwidth
    bound: every step reads the int8 weights (~7 GB) plus the KV cache,
    so tokens/sec scales with slot count until the cache fills HBM —
    llama2-7b (MHA) caps at 32 slots, llama3-8b (GQA, 4× smaller cache)
    fits more. bf16 weights would not even fit beside the cache: int8 is
    the enabler, not just a speedup.
    """
    import logging

    logging.disable(logging.WARNING)
    import jax
    import jax.numpy as jnp

    from dalm_tpu.models import lora as lora_mod
    from dalm_tpu.models import qlora as qlora_mod
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.decoder import Decoder, DecoderConfig
    import dataclasses

    # DALM_PROMPT_LEN: long-context serve arms — at P=1024 an MHA 7B
    # cache costs ~0.6 GB/slot and caps the pool near single digits,
    # while the MLA latent cache stays ~1.3 MB/slot (the regime the
    # 57x byte ratio actually compounds in).
    P = int(os.environ.get("DALM_PROMPT_LEN", "64"))
    MAX_NEW = 128
    rows = [
        ("llama2-7B", DecoderConfig.llama2_7b(), 32),
        ("llama3-8B-gqa", DecoderConfig.llama3_8b(), 96),
        # phi3-mini (3.8B, MHA, 2047-token window — full attention at
        # this cache length): the small-model tier; MHA cache (~76 MB/
        # slot at len 192) caps slots before HBM does.
        ("phi3-mini", DecoderConfig.phi3_mini(), 64),
        # MLA tier (models/mla.py): the latent cache is 576 floats/token
        # TOTAL (vs phi3's 32 heads x 2 x 96 = 6144, llama2-7B's 8192) —
        # ~6 MB/slot at len 192, so the slot pool is bounded by program
        # temps, not cache bytes. Decode batches over slots ⇒ the cache
        # compression converts directly to throughput.
        ("deepseek-v3-mini-mla", DecoderConfig.deepseek_v3_mini(), 256),
        # 7B-class MLA: llama2-7B geometry with V3 latent attention —
        # the direct MLA-vs-MHA serve comparison (llama2's MHA cache
        # caps this chip at 32 slots; the latent cache makes slots
        # nearly free, so the pool grows until weight streaming binds).
        ("deepseek-v3-mid-7B-mla", DecoderConfig.deepseek_v3_mid_7b(), 192),
    ]
    if int4:
        # the CAPACITY tier: 13B fits a 16 GB chip only at 4-bit weights
        rows.append(("llama2-13B", DecoderConfig.llama2_13b(), 16))
    if os.environ.get("DALM_BENCH_ONLY_7B"):
        # variant A/B mode: one shape, minimal chip time (per-op
        # microbenches cannot resolve the in-kernel differences on this
        # box — see RESULTS.md "microbenchmark methodology")
        rows = rows[:1]
    if os.environ.get("DALM_BENCH_PRESETS"):
        # comma-separated preset substrings, e.g. "8B,phi3" — run only
        # the matching rows (A/B arms that already have the other rows)
        want = os.environ["DALM_BENCH_PRESETS"].split(",")
        rows = [r for r in rows if any(w in r[0] for w in want)]
    # 4-bit storage format: linear int4 (default) or the NormalFloat4
    # codebook quality tier (DALM_QUANT_TIER=nf4) — same packing, decoded
    # through the 15-select codebook tree in the Pallas kernel.
    tier = os.environ.get("DALM_QUANT_TIER", "int4") if int4 else "int8"
    # DALM_KV_QUANT=1: int8 KV-cache tier A/B (same slot count — isolates
    # the per-token cache-traffic effect; capacity headroom is 2x slots).
    kvq = bool(os.environ.get("DALM_KV_QUANT"))
    # DALM_SLOTS_MULT=2: scale the slot pool — with the int8 KV tier the
    # cache bytes halve, so the same HBM holds 2x slots; decode is
    # HBM-bound and batches over slots, so capacity IS throughput.
    slots_mult = int(os.environ.get("DALM_SLOTS_MULT", "1"))
    # DALM_SLOTS=N: absolute slot-pool override for every selected row —
    # for probing the real HBM ceiling between the preset count and 2x
    # (the r5 GQA arms found 8B/192 OOMs on program temps, not cache).
    slots_abs = int(os.environ.get("DALM_SLOTS", "0"))
    # DALM_PREFILL_CHUNK=C: blocked admission prefill — at long P the
    # one-shot (pool, P) prefill's intermediates OOM before the cache
    # does (RESULTS.md "Long context"); chunking bounds them at (pool, C).
    pchunk = int(os.environ.get("DALM_PREFILL_CHUNK", "0")) or None
    # DALM_ADMIT_WIDTH=W: compact-width admission — the full-pool
    # admission branch wastes ~half its prefill FLOPs at the steady-state
    # trigger; at long P admission FLOPs dominate the workload.
    awidth = int(os.environ.get("DALM_ADMIT_WIDTH", "0")) or None
    for preset, base_cfg, slots in rows:
        slots = slots_abs or slots * slots_mult
        cfg = dataclasses.replace(
            base_cfg, dtype=jnp.bfloat16, int8_compute=None if int4 else "fwd",
            kv_quant=kvq,
        )
        generator = Decoder(cfg)
        ids16 = jnp.zeros((1, 16), jnp.int32)
        residual, quant, lora = qlora_mod.init_packed_on_device(
            generator, jax.random.PRNGKey(0), (ids16, jnp.ones_like(ids16)),
            spec=lora_mod.LoraSpec.for_causal_lm(),
            quantize=tier if int4 else True,
        )
        eng = DecodeEngine(
            generator, residual, num_slots=slots, max_prompt_len=P,
            max_new_tokens=MAX_NEW, eos_token_id=None, pad_token_id=0,
            extra_collections={"quant": quant, "lora": lora},
            prefill_chunk=pchunk, admit_width=awidth,
        )
        rng = np.random.default_rng(0)
        N = 2 * slots
        p_ids = rng.integers(5, min(31000, cfg.vocab_size - 1), size=(N, P)).astype(np.int32)
        p_mask = np.ones((N, P), np.int32)
        # DALM_SCHEDULE=hostloop: the host-loop schedule holds ONE cache
        # copy (donated dispatches) vs the fused while-carry's two, so
        # its capacity ceiling is ~2x — at the cost of a readback per
        # decode_chunk tokens on this tunneled transport.
        gen = (
            eng.generate if os.environ.get("DALM_SCHEDULE") == "hostloop"
            else eng.generate_fused
        )
        _ = gen(p_ids[:N], p_mask[:N])  # warm/compile
        t0 = time.perf_counter()
        outs = gen(p_ids, p_mask)
        dt = time.perf_counter() - t0
        total_tokens = sum(len(o) for o in outs)
        assert total_tokens == N * MAX_NEW
        per_chip = total_tokens / dt / jax.device_count()
        print(
            json.dumps(
                {
                    "metric": f"decode_tokens_per_sec_per_chip[{preset}-shape,{tier + '-weights' if int4 else 'int8-w8a8'}{',int8-kv' if kvq else ''}{f',p{P}' if P != 64 else ''}{f',pfc{eng.prefill_C}' if pchunk else ''}{f',aw{awidth}' if awidth else ''}{',hostloop' if os.environ.get('DALM_SCHEDULE') == 'hostloop' else ''},{slots}-slots,continuous-batching,1xv5e-16GB]",
                    "value": round(per_chip, 1),
                    "unit": "tokens/sec/chip",
                    "vs_baseline": None,
                    "ms_per_step": round(dt / (total_tokens / slots) * 1e3, 2),
                    "requests": N,
                    "new_tokens_each": MAX_NEW,
                }
            )
        )
        del eng, residual, quant, lora


def _corpus(n, rng):
    letters = np.array(list(string.ascii_lowercase + " "))
    return ["".join(rng.choice(letters, size=90)) + f" topic {i}" for i in range(n)]


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax

    from dalm_tpu.serve import RagPipeline
    from dalm_tpu.models.encoder import EncoderConfig
    from dalm_tpu.models.embedder import SentenceEmbedder
    from dalm_tpu.models.registry import DECODER_PRESETS, build_decoder
    from dalm_tpu.data.tokenizer import ByteTokenizer
    from dalm_tpu.core.mesh import unbox

    import dataclasses
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    corpus = _corpus(10_000, rng)
    queries = [f"what about topic {i}" for i in range(256)]

    r_cfg = dataclasses.replace(
        EncoderConfig.bge_small(), vocab_size=384, dtype=dtype,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    retriever = SentenceEmbedder(r_cfg)
    r_params = unbox(retriever.init_params(jax.random.PRNGKey(0), seq_len=64))

    g_cfg = dataclasses.replace(DECODER_PRESETS["gpt2"](), vocab_size=384, dtype=dtype)
    generator = build_decoder(g_cfg)
    ids8 = jnp.zeros((1, 8), jnp.int32)
    g_params = unbox(generator.init(jax.random.PRNGKey(1), ids8, jnp.ones_like(ids8))["params"])

    tok = ByteTokenizer()
    pipe = RagPipeline(
        retriever, r_params, tok, generator, g_params, ByteTokenizer(),
        passages=corpus,
        index_kernel="pallas" if on_tpu else "xla",
        max_new_tokens=64,
        embed_batch=256,
    )

    # warm at the SAME batch shape (compiles embed + search + decode)
    _ = pipe.answer(queries, top_k=1)
    t0 = time.perf_counter()
    answers = pipe.answer(queries, top_k=1)
    dt = time.perf_counter() - t0
    assert len(answers) == len(queries) and answers[0].answer is not None
    qps = len(queries) / dt / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "rag_serve_answers_per_sec_per_chip[bge-small-shape+gpt2-124M-shape,10k-corpus,top1,64-new-tokens]",
                "value": round(qps, 2),
                "unit": "answers/sec/chip",
                "vs_baseline": None,
                "decode_batch": len(queries),
            }
        )
    )

    # ---- ragged workload: lockstep vs continuous batching --------------
    # Real traffic has ragged answer lengths; lockstep decode pays
    # max_new for every request. Budgets uniform[4, 64] (mean ~34) make
    # the effect concrete and deterministic (EOS-free byte model).
    budget_rng = np.random.default_rng(1)
    budgets = budget_rng.integers(4, 65, size=len(queries))
    prompts_tok = pipe.g_tok(
        [f"#query# {q} #passage# x #answer# " for q in queries],
        padding="max_length", max_length=pipe.max_prompt_len, truncation=True,
    )
    p_ids = np.asarray(prompts_tok["input_ids"], np.int32)
    p_mask = np.asarray(prompts_tok["attention_mask"], np.int32)

    # Lockstep baseline at the SAME device capacity (64-wide batches —
    # slot count is HBM-bounded in real serving): the queue of 256
    # requests is 4 sequential full-length batch-64 decodes. (A single
    # batch-256 lockstep decode would presume 4× the cache capacity.)
    from dalm_tpu.models.generate import build_greedy_generate

    gen64 = build_greedy_generate(generator, 64, eos_token_id=None, pad_token_id=0)
    _ = np.asarray(gen64(g_params, p_ids[:64], p_mask[:64]))  # warm
    lockstep_best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for s in range(0, len(queries), 64):
            out_lockstep = np.asarray(gen64(g_params, p_ids[s : s + 64], p_mask[s : s + 64]))
        lockstep_best = min(lockstep_best, time.perf_counter() - t0)
    lockstep_dt = lockstep_best

    from dalm_tpu.models.decode_engine import DecodeEngine

    eng = DecodeEngine(
        generator, g_params, num_slots=64, max_prompt_len=pipe.max_prompt_len,
        max_new_tokens=64, eos_token_id=None, pad_token_id=0, decode_chunk=8,
    )
    _ = eng.generate_fused(p_ids, p_mask, budgets=budgets)  # warm/compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = eng.generate_fused(p_ids, p_mask, budgets=budgets)
        best = min(best, time.perf_counter() - t0)
    cont_dt = best
    assert all(len(o) == b for o, b in zip(outs, budgets))

    # host-loop variant (streaming-arrivals API) for comparison
    _ = eng.generate(p_ids[:64], p_mask[:64], budgets=budgets[:64])
    t0 = time.perf_counter()
    outs_host = eng.generate(p_ids, p_mask, budgets=budgets)
    host_dt = time.perf_counter() - t0
    assert all(len(o) == b for o, b in zip(outs_host, budgets))
    print(
        json.dumps(
            {
                "metric": "rag_serve_continuous_batching_answers_per_sec_per_chip[fused-on-device-schedule,ragged-budgets-4..64,64-slots,256-requests]",
                "value": round(len(queries) / cont_dt / jax.device_count(), 2),
                "unit": "answers/sec/chip",
                "vs_baseline": None,
                "lockstep_64wide_answers_per_sec": round(len(queries) / lockstep_dt / jax.device_count(), 2),
                "speedup_vs_lockstep_at_equal_capacity": round(lockstep_dt / cont_dt, 3),
                "host_loop_answers_per_sec": round(len(queries) / host_dt / jax.device_count(), 2),
            }
        )
    )

    # ---- streaming online serving (models/streaming.py) ----------------
    # Open-loop arrivals: requests join the running scheduler at a paced
    # rate (0.8× the host-loop drain throughput, so the queue stays
    # bounded) and we report sustained throughput + time-to-first-token
    # and completion-latency percentiles. NOTE: on this box the
    # host↔device tunnel RTT (~150 ms/readback) dominates TTFT — on a
    # production host link both drop by orders of magnitude.
    from dalm_tpu.models.streaming import StreamingEngine

    rate = 0.8 * len(queries) / host_dt  # requests/sec
    with StreamingEngine(eng) as srv:
        t_start = time.perf_counter()
        handles = []
        for i in range(len(queries)):
            handles.append(srv.submit(p_ids[i], p_mask[i], budget=int(budgets[i])))
            target = t_start + (i + 1) / rate
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        for h in handles:
            h.result(timeout=600)
        stream_dt = time.perf_counter() - t_start
    ttft = np.asarray([h.t_first_token - h.t_submit for h in handles])
    lat = np.asarray([h.t_done - h.t_submit for h in handles])
    print(
        json.dumps(
            {
                "metric": "rag_serve_streaming_answers_per_sec_per_chip[open-loop-arrivals,64-slots,256-requests,ragged-budgets]",
                "value": round(len(queries) / stream_dt / jax.device_count(), 2),
                "unit": "answers/sec/chip",
                "vs_baseline": None,
                "arrival_rate_per_sec": round(rate, 1),
                "ttft_p50_ms": round(float(np.percentile(ttft, 50)) * 1e3, 1),
                "ttft_p95_ms": round(float(np.percentile(ttft, 95)) * 1e3, 1),
                "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
                "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
            }
        )
    )

    # ---- streaming + speculative: same open-loop workload --------------
    # The online scheduler now runs host-draft verification rounds
    # (models/streaming.py:_speculative_scheduler_loop); same arrival
    # rate, so the TTFT/latency deltas are directly comparable to the
    # single-token streaming numbers above. Outputs are exact greedy —
    # verified per-request against the non-speculative run.
    spec_eng = DecodeEngine(
        generator, g_params, num_slots=64, max_prompt_len=pipe.max_prompt_len,
        max_new_tokens=64, eos_token_id=None, pad_token_id=0,
        speculative_gamma=8,
    )
    _ = spec_eng.generate(p_ids[:64], p_mask[:64], budgets=budgets[:64])  # warm
    with StreamingEngine(spec_eng) as srv:
        t_start = time.perf_counter()
        spec_handles = []
        for i in range(len(queries)):
            spec_handles.append(srv.submit(p_ids[i], p_mask[i], budget=int(budgets[i])))
            target = t_start + (i + 1) / rate
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        for h in spec_handles:
            h.result(timeout=600)
        spec_dt = time.perf_counter() - t_start
    # Exactness vs plain streaming is asserted in f32/trained-weight tests
    # (tests/models/test_streaming.py). THIS bench runs random weights in
    # bf16, where the (γ+1)-token verification forward tiles matmuls
    # differently than the single-token step and argmax flips on
    # rounding-distance ties (pervasive with random weights, rare with
    # trained ones — see RESULTS.md speculative section). Report the
    # mismatch count instead of crashing the bench on it.
    mismatches = sum(
        a.result() != b.result() for a, b in zip(handles, spec_handles)
    )
    ttft_s = np.asarray([h.t_first_token - h.t_submit for h in spec_handles])
    lat_s = np.asarray([h.t_done - h.t_submit for h in spec_handles])
    tpr = np.asarray([
        (len(h.result()) - 1) / h.spec_rounds  # first token comes from admit
        for h in spec_handles if h.spec_rounds > 0
    ])
    print(
        json.dumps(
            {
                "metric": "rag_serve_streaming_speculative_answers_per_sec_per_chip[open-loop-arrivals,64-slots,256-requests,ragged-budgets,gamma=8]",
                "value": round(len(queries) / spec_dt / jax.device_count(), 2),
                "unit": "answers/sec/chip",
                "vs_baseline": None,
                "arrival_rate_per_sec": round(rate, 1),
                "ttft_p50_ms": round(float(np.percentile(ttft_s, 50)) * 1e3, 1),
                "ttft_p95_ms": round(float(np.percentile(ttft_s, 95)) * 1e3, 1),
                "latency_p50_ms": round(float(np.percentile(lat_s, 50)) * 1e3, 1),
                "latency_p95_ms": round(float(np.percentile(lat_s, 95)) * 1e3, 1),
                "tokens_per_verify_round_mean": round(float(tpr.mean()), 2) if len(tpr) else None,
                # bf16 tie flips with random weights; exactness is test-
                # asserted with f32/trained weights (test_streaming.py)
                "greedy_mismatch_requests_bf16_random_weights": mismatches,
            }
        )
    )


if __name__ == "__main__":
    if "--7b" in sys.argv:
        bench_7b_decode(int4="--int4" in sys.argv)
    else:
        main()
