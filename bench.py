"""Benchmark: RAG-e2e training throughput (samples/sec/chip).

Anchor (BASELINE.md): the reference trains bge-large + Llama-2-7b,
batch 18, 200k rows in 7 h on one A100-80GB → ≈ 200000/25200 = 7.94
samples/sec/GPU. No other throughput numbers are published.

This round's measurement: the full jitted RAG-e2e train step (two
retriever forwards + similarity + generator forward + both losses +
backward + adam) in bf16 at the reference's sequence geometry
(query 50 / passage 128 / generator 256) and batch 18, on one chip.
Model scale this round is bge-small-class retriever + ~125M-class
generator (HF-weight parity runs for the 7B config land in a later
round; the metric name carries the config so nothing is apples-to-
oranges silently).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 200_000 / (7 * 3600)  # 7.936


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from dalm_tpu.core.mesh import MeshConfig, make_mesh, put_batch, unbox
    from dalm_tpu.models.decoder import DecoderConfig
    from dalm_tpu.models.encoder import EncoderConfig
    from dalm_tpu.models.rag import RagE2EModel
    from dalm_tpu.train.state import TrainState
    from __graft_entry__ import _example_batch, _loss_fn

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    vocab = 30592  # 30522 rounded to /128
    r_cfg = EncoderConfig(
        vocab_size=vocab, hidden_size=384, num_layers=12, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=dtype,
    )
    g_cfg = DecoderConfig(
        vocab_size=32000, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=2048, max_position_embeddings=1024, dtype=dtype,
    )
    rag = RagE2EModel(r_cfg, g_cfg)

    mesh = make_mesh(MeshConfig())
    batch_size = 18 * mesh.shape["data"]

    params = unbox(rag.init_params(jax.random.PRNGKey(0), query_len=50, gen_len=256))
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx)

    loss_fn = _loss_fn(rag)

    @jax.jit
    def train_step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads), loss

    rng = np.random.default_rng(0)
    batch = put_batch(
        _example_batch(rng, batch=batch_size, vocab=30000, q_len=50, p_len=128, g_len=256),
        mesh,
        np.int32,
    )

    # Warmup / compile. NOTE: sync via scalar host readback (float(loss)),
    # not block_until_ready — some PJRT transports ack readiness before
    # execution finishes; a host transfer cannot lie.
    for _ in range(3):
        state, loss = train_step(state, batch)
    _ = float(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, batch)
    _ = float(loss)
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * iters / dt
    per_chip = samples_per_sec / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "rag_e2e_train_samples_per_sec_per_chip[bge-small-class+125M-class,b18,q50/p128/g256,bf16]",
                "value": round(per_chip, 3),
                "unit": "samples/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
