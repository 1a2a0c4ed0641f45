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


if __name__ == "__main__":
    main()
