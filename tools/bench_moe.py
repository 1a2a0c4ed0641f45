"""MoE on-chip measurements (VERDICT r4: MoE existed as tests only).

Two parts, one JSON line each per row:

1. ``--train``: dense-vs-dispatch TRAIN-step crossover. The same ~390M
   sparse-MoE decoder (16 experts, top-2, the many-small-experts shape
   scaled to chip budget) runs a full jitted loss+AdamW step at
   increasing token counts T with ``moe_impl`` forced to each path.
   ``moe_impl="auto"``'s threshold (models/moe.py) is SET from this
   table, not asserted.
2. ``--serve``: continuous-batching decode throughput for the
   ``mixtral-mini-4b`` preset (~3.6B total / 1.1B active params) with
   int8 weight storage through the fused schedule — the serve tier for
   sparse generators (decode uses the exact dense path: at slot-count
   token batches every touched expert's weights stream from HBM anyway,
   so the extra FLOPs ride the weight DMA).

Run on the chip (bench_serve.py discipline: one process per arm when
A/B-ing; within one process rows share the compile cache only).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _train_cfg(impl: str, group: int | None):
    import jax.numpy as jnp

    from dalm_tpu.models.decoder import DecoderConfig

    return DecoderConfig(
        vocab_size=32128, hidden_size=1024, num_layers=12, num_heads=16,
        num_kv_heads=8, head_dim_override=64, intermediate_size=2048,
        moe_intermediate_size=512, num_experts=16, num_experts_per_tok=2,
        max_position_embeddings=8192, rope_theta=1000000.0,
        moe_impl=impl, moe_capacity_factor=1.25 if impl == "dispatch" else None,
        moe_group_size=group,
        remat=True, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )


def bench_train() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax
    import jax.numpy as jnp
    import optax

    from dalm_tpu.core.mesh import unbox
    from dalm_tpu.losses.causal import causal_lm_loss
    from dalm_tpu.models.decoder import Decoder

    B = 4
    shapes = [(B, 128), (B, 512), (B, 2048)]
    if os.environ.get("DALM_MOE_SMALL"):
        # crossover hunt at decode-ish widths: the honest (readback-
        # synced) table showed dispatch winning at every train shape
        # incl. T=512, so the dense regime — if it exists — is below
        shapes = [(B, 4), (B, 8), (B, 16), (B, 32), (B, 64)]
    arms = [("dense", None), ("dispatch", 2048)]
    rng = np.random.default_rng(0)
    for impl, group in arms:
        cfg = _train_cfg(impl, group)
        model = Decoder(cfg)
        ids0 = jnp.zeros((1, 16), jnp.int32)
        params = unbox(model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"])
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        def step(params, opt_state, ids, mask):
            def lf(p):
                logits, aux = model.apply(
                    {"params": p}, ids, mask, return_moe_aux=True
                )
                return causal_lm_loss(logits, ids, mask) + 0.01 * aux

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        for (b, s) in shapes:
            ids = jnp.asarray(rng.integers(5, 32000, size=(b, s)).astype(np.int32))
            mask = jnp.ones_like(ids)
            params, opt_state, loss = jstep(params, opt_state, ids, mask)  # compile
            float(loss)  # scalar readback — the axon transport acks
            # block_until_ready EARLY (bench.py discipline); timing via
            # block_until_ready records dispatch, not device time (the
            # first r5 run's dense-T=512 "1.75 ms" was that artifact)
            n_iter = 10
            t0 = time.perf_counter()
            for _ in range(n_iter):
                params, opt_state, loss = jstep(params, opt_state, ids, mask)
            float(loss)
            dt = (time.perf_counter() - t0) / n_iter
            print(
                json.dumps(
                    {
                        "metric": f"moe_train_step_ms[{impl}{f'-g{group}' if group else ''},T={b * s},B{b}xS{s},16e-top2-390M,1xv5e]",
                        "value": round(dt * 1e3, 2),
                        "unit": "ms/step",
                        "vs_baseline": None,
                        "tokens_per_sec": round(b * s / dt, 0),
                        "final_loss": round(float(loss), 4),
                    }
                ),
                flush=True,
            )
        del params, opt_state


def bench_serve() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax
    import jax.numpy as jnp

    from dalm_tpu.models import lora as lora_mod
    from dalm_tpu.models import qlora as qlora_mod
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.decoder import Decoder, DecoderConfig

    P, MAX_NEW = 64, 128
    slots = int(os.environ.get("DALM_SLOTS", "0")) or 32
    cfg = dataclasses.replace(
        DecoderConfig.mixtral_mini_4b(), dtype=jnp.bfloat16, int8_compute="fwd",
    )
    generator = Decoder(cfg)
    ids16 = jnp.zeros((1, 16), jnp.int32)
    residual, quant, lora = qlora_mod.init_packed_on_device(
        generator, jax.random.PRNGKey(0), (ids16, jnp.ones_like(ids16)),
        spec=lora_mod.LoraSpec.for_causal_lm(), quantize=True,
    )
    eng = DecodeEngine(
        generator, residual, num_slots=slots, max_prompt_len=P,
        max_new_tokens=MAX_NEW, eos_token_id=None, pad_token_id=0,
        extra_collections={"quant": quant, "lora": lora},
    )
    rng = np.random.default_rng(0)
    N = 2 * slots
    p_ids = rng.integers(5, 31000, size=(N, P)).astype(np.int32)
    p_mask = np.ones((N, P), np.int32)
    _ = eng.generate_fused(p_ids, p_mask)  # warm/compile
    t0 = time.perf_counter()
    outs = eng.generate_fused(p_ids, p_mask)
    dt = time.perf_counter() - t0
    total_tokens = sum(len(o) for o in outs)
    assert total_tokens == N * MAX_NEW
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_per_chip[mixtral-mini-4B-moe,int8-w8a8,{slots}-slots,continuous-batching,1xv5e-16GB]",
                "value": round(total_tokens / dt / jax.device_count(), 1),
                "unit": "tokens/sec/chip",
                "vs_baseline": None,
                "ms_per_step": round(dt / (total_tokens / slots) * 1e3, 2),
                "active_params": "~1.1B/token of 3.6B total",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--serve" in sys.argv:
        bench_serve()
    if "--train" in sys.argv or "--serve" not in sys.argv:
        bench_train()
