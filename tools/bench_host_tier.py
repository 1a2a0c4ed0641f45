"""Host-tier (>HBM) spill search demo at 10M x 384 via the memmap path.

VERDICT r1 item 10: the hnswlib-replacement story beyond HBM scale needs
an end-to-end recorded run, not just a bench flag. This script:

1. writes a 10M x 384 float32 corpus to a disk memmap (15.4 GB — larger
   than any v5e HBM tier; rows are unit-normalized gaussians, content-
   independent for scan cost);
2. opens it with ``HostDenseIndex.from_memmap`` (no RAM copy; the C++
   OpenMP blocked scan pages it in) and measures exact top-10 QPS;
3. verifies exactness against a numpy oracle for a query subsample.

With ``--tiered`` (needs the TPU) it instead demos the split brain:
first ``--hbm-rows`` rows on the mesh (int8), the spill on host, global
top-k = exact union merge (``TieredIndex.search``).

Single-core honesty: this box has 1 CPU; the OpenMP scan runs 1 thread
here, so the QPS recorded is a floor — production hosts scale it by the
core count (the scan is embarrassingly parallel over queries/blocks).

Run:  python tools/bench_host_tier.py [--rows 10000000] [--dim 384]
      [--queries 32] [--tiered --hbm-rows 8000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dalm_tpu.index.host_index import HostDenseIndex, TieredIndex  # noqa: E402


def build_memmap(path: str, rows: int, dim: int, chunk: int = 200_000) -> None:
    if os.path.exists(path) and os.path.getsize(path) == rows * dim * 4:
        print(f"reusing existing memmap {path}", file=sys.stderr)
        return
    rng = np.random.default_rng(0)
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(rows, dim))
    t0 = time.perf_counter()
    for s in range(0, rows, chunk):
        e = rng.standard_normal((min(chunk, rows - s), dim)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        mm[s : s + len(e)] = e
    mm.flush()
    del mm
    print(f"wrote {rows}x{dim} memmap in {time.perf_counter()-t0:.0f}s", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--path", default="/tmp/dalm_host_tier.f32")
    ap.add_argument("--verify-queries", type=int, default=2,
                    help="numpy-oracle exactness check on this many queries")
    ap.add_argument("--tiered", action="store_true")
    ap.add_argument("--hbm-rows", type=int, default=8_000_000)
    args = ap.parse_args()

    build_memmap(args.path, args.rows, args.dim)
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = HostDenseIndex.from_memmap(args.path, args.rows, args.dim)
    assert index.use_native, "C++ scan did not build — QPS would not be representative"

    s, i = index.search(queries[:4], args.k)  # page-in warmup (cold disk)
    t0 = time.perf_counter()
    scores, ids = index.search(queries, args.k)
    dt = time.perf_counter() - t0
    qps = args.queries / dt

    # exactness: numpy full-scan oracle on a query subsample (chunked —
    # a (V, N) score matrix would not fit RAM at 10M rows)
    mm = np.memmap(args.path, dtype=np.float32, mode="r", shape=(args.rows, args.dim))
    exact = True
    for qi in range(args.verify_queries):
        best = np.full(args.k, -np.inf, np.float32)
        best_ids = np.zeros(args.k, np.int64)
        for sta in range(0, args.rows, 1_000_000):
            blk = np.asarray(mm[sta : sta + 1_000_000])
            sc = blk @ queries[qi]
            cand = np.concatenate([best, sc])
            cid = np.concatenate([best_ids, np.arange(sta, sta + len(sc))])
            order = np.argsort(-cand, kind="stable")[: args.k]
            best, best_ids = cand[order], cid[order]
        if not np.allclose(np.sort(best), np.sort(scores[qi]), atol=1e-5):
            exact = False
    print(
        json.dumps(
            {
                "metric": f"host_tier_memmap_search_qps[{args.rows//10**6}M x {args.dim},f32,k={args.k},q={args.queries},1-core]",
                "value": round(qps, 2),
                "unit": "queries/sec",
                "vs_baseline": None,
                "exact_vs_numpy_oracle": exact,
                "corpus_gb": round(args.rows * args.dim * 4 / 2**30, 1),
                "note": "single-core floor; OpenMP scan scales with host cores",
            }
        )
    )
    assert exact

    if args.tiered:
        import jax  # noqa: F401

        from dalm_tpu.core.mesh import MeshConfig, make_mesh
        from dalm_tpu.index.dense import ShardedDenseIndex

        mesh = make_mesh(MeshConfig())
        hbm_rows = min(args.hbm_rows, args.rows)
        device_index = ShardedDenseIndex.build(
            mesh, np.asarray(mm[:hbm_rows]), kernel="pallas", quantize=True
        )
        host_index = HostDenseIndex(mm[hbm_rows:])
        tiered = TieredIndex(device_index, host_index, hbm_rows)
        s, i = tiered.search(queries[:4], args.k)
        t0 = time.perf_counter()
        scores_t, ids_t = tiered.search(queries, args.k)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"tiered_index_search_qps[{hbm_rows//10**6}M-int8-HBM + {(args.rows-hbm_rows)//10**6}M-host,x{args.dim},k={args.k},q={args.queries}]",
                    "value": round(args.queries / dt, 2),
                    "unit": "queries/sec",
                    "vs_baseline": None,
                    "note": "host tier dominates latency; both tiers exact, union merge exact",
                }
            )
        )


if __name__ == "__main__":
    main()
