"""Secondary benchmark: index search QPS/chip (BASELINE.json configs 2/5).

Measures exact top-10 search over a 200k x 1024 (bge-large-dim) passage
index — the reference's eval scale (200k patent abstracts,
`README.md:140-144`) where it runs hnswlib on host CPU. Prints one JSON
line per variant. Not the driver headline (bench.py is); run manually.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.index.dense import ShardedDenseIndex

    on_tpu = jax.devices()[0].platform != "cpu"
    mesh = make_mesh(MeshConfig())
    rng = np.random.default_rng(0)

    N, D, Q, K = 200_000, 1024, 256, 10
    # Generate embeddings ON DEVICE — a host->device copy of 800 MB can
    # dominate (or time out) over tunneled transports.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dalm_tpu.index.dense import INDEX_AXES

    n_pad = -(-N // (8 * ShardedDenseIndex.num_shards(mesh))) * 8 * ShardedDenseIndex.num_shards(mesh)
    sharding = NamedSharding(mesh, P(INDEX_AXES, None))

    @jax.jit
    def make_embs(key):
        e = jax.random.normal(key, (n_pad, D), jnp.bfloat16)
        return (e / jnp.linalg.norm(e.astype(jnp.float32), axis=1, keepdims=True).astype(jnp.bfloat16))

    device_embs = jax.device_put(make_embs(jax.random.PRNGKey(0)), sharding)

    def bench_index(index, nq, tag):
        queries = rng.normal(size=(nq, D)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        fn = index._get_search_fn(K)
        q_dev = jax.device_put(jnp.asarray(queries, jnp.bfloat16))
        s, i = fn(q_dev, index.embeddings, *(() if index.scales is None else (index.scales,)))
        _ = float(s[0, 0])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            s, i = fn(q_dev, index.embeddings, *(() if index.scales is None else (index.scales,)))
        _ = float(s[0, 0])
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"index_search_qps_per_chip[{tag},k={K},q={nq}]",
                    "value": round(nq * iters / dt / jax.device_count(), 1),
                    "unit": "queries/sec/chip",
                    "vs_baseline": None,
                }
            )
        )

    def quantized_index(mode: str) -> ShardedDenseIndex:
        """Quantize the device-resident rows ON DEVICE (no 800 MB host
        round-trip) into an int8- or int4-row index, matching
        ShardedDenseIndex.build(quantize=...) layouts exactly."""

        def quant(e):
            ef = e.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(ef), axis=1, keepdims=True)
            if mode == "int8":
                scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
                q = jnp.clip(jnp.round(ef / scale), -127, 127).astype(jnp.int8)
                return q, scale
            scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
            q = jnp.clip(jnp.round(ef / scale), -7, 7).astype(jnp.int32) + 8
            packed = (q[:, : D // 2] | (q[:, D // 2 :] << 4)).astype(jnp.uint8)
            return packed, scale

        rows, scales = jax.jit(quant, out_shardings=(sharding, sharding))(device_embs)
        return ShardedDenseIndex(
            mesh, rows, num_real=N, kernel="pallas", scales=scales, int4=(mode == "int4")
        )

    if on_tpu:
        # Device-resident quantized-row QPS (VERDICT r1: the int4 number
        # was transport-bound; measure it exactly like the int8 rows).
        for mode in ("int8", "int4"):
            index = quantized_index(mode)
            for nq in (Q, 1024):
                bench_index(index, nq, f"pallas-{mode},200k x 1024")
            del index

    variants = [("xla", Q)] + ([("pallas", Q), ("pallas", 1024)] if on_tpu else [])
    for kernel, nq in variants:
        queries = rng.normal(size=(nq, D)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        index = ShardedDenseIndex(mesh, device_embs, num_real=N, kernel=kernel)
        # Device-resident measurement: keep queries on device and pipeline
        # dispatches so transport latency amortizes (serving does the same).
        fn = index._get_search_fn(K)
        q_dev = jax.device_put(jnp.asarray(queries, device_embs.dtype))
        s, i = fn(q_dev, index.embeddings)  # compile + warm
        _ = float(s[0, 0])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            s, i = fn(q_dev, index.embeddings)
        _ = float(s[0, 0])  # host readback sync
        dt = time.perf_counter() - t0
        qps = nq * iters / dt / jax.device_count()
        print(
            json.dumps(
                {
                    "metric": f"index_search_qps_per_chip[{kernel},200k x 1024,bf16,k=10,q={nq}]",
                    "value": round(qps, 1),
                    "unit": "queries/sec/chip",
                    "vs_baseline": None,
                }
            )
        )


def bench_10m_int8() -> None:
    """BASELINE.json config 5 scale on ONE chip: a 10M x 1024 int8 index
    (10.2 GB HBM — bf16 would need 20 GB and not fit a 16 GB v5e).
    Rows are generated directly on device as int8 (a host upload of 10 GB
    would dominate; search cost is content-independent)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dalm_tpu.core.mesh import MeshConfig, make_mesh
    from dalm_tpu.index.dense import INDEX_AXES, ShardedDenseIndex

    mesh = make_mesh(MeshConfig())
    N, D, Q, K = 10_000_000, 1024, 256, 10
    shards = ShardedDenseIndex.num_shards(mesh)
    n_pad = -(-N // (8 * shards)) * 8 * shards
    sharding = NamedSharding(mesh, P(INDEX_AXES, None))

    @jax.jit
    def make_rows(key):
        return jax.random.randint(key, (n_pad, D), -127, 128, dtype=jnp.int8)

    rows = jax.device_put(make_rows(jax.random.PRNGKey(0)), sharding)
    scales = jax.device_put(
        jnp.full((n_pad, 1), 1.0 / 127.0, jnp.float32),
        NamedSharding(mesh, P(INDEX_AXES, None)),
    )
    index = ShardedDenseIndex(mesh, rows, num_real=N, kernel="pallas", scales=scales)

    rng = np.random.default_rng(0)
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    fn = index._get_search_fn(K)
    q_dev = jax.device_put(jnp.asarray(queries, jnp.bfloat16))
    s, i = fn(q_dev, index.embeddings, index.scales)
    _ = float(s[0, 0])
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s, i = fn(q_dev, index.embeddings, index.scales)
    _ = float(s[0, 0])
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "index_search_qps_per_chip[pallas-int8,10M x 1024 (10.2GB HBM),k=10,q=256]",
                "value": round(Q * iters / dt / jax.device_count(), 1),
                "unit": "queries/sec/chip",
                "vs_baseline": None,
                "note": "exact search over 50x the reference's 200k eval corpus on one 16GB chip",
            }
        )
    )


def bench_embed_throughput() -> None:
    """Passage-embedding sweep throughput, bge-large shape at p128 —
    the reference anchor is ~1 h for 200k rows on A100 (~55 rows/s,
    BASELINE.md 'Passage embedding cost')."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dalm_tpu.core.mesh import unbox
    from dalm_tpu.models.encoder import EncoderConfig
    from dalm_tpu.models.embedder import SentenceEmbedder

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = dataclasses.replace(
        EncoderConfig.bge_large(), vocab_size=30592,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = SentenceEmbedder(cfg)
    params = unbox(model.init_params(jax.random.PRNGKey(0), seq_len=128))

    B, L = 512, 128
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30000, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    embed = jax.jit(lambda p, i, m: model.embed(p, i, m))
    e = embed(params, ids, mask)
    _ = float(e[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        e = embed(params, ids, mask)
    _ = float(e[0, 0])
    dt = time.perf_counter() - t0
    rows_per_s = B * iters / dt / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "passage_embed_rows_per_sec_per_chip[bge-large-shape,p128,bf16,b512]",
                "value": round(rows_per_s, 1),
                "unit": "rows/sec/chip",
                "vs_baseline": round(rows_per_s / (200_000 / 3600.0), 2),
                "note": "baseline: reference embeds 200k rows in ~1h on A100",
            }
        )
    )


if __name__ == "__main__":
    import sys

    main()
    if "--embed" in sys.argv:
        bench_embed_throughput()
    if "--10m" in sys.argv:
        bench_10m_int8()
