"""Micro-bench: int4 dequant-matmul kernel variants (VERDICT r1 item 4).

The shipped kernel (`kernels/int4_matmul.py`) is VPU-bound: per packed
byte it does mask/shift/sub x2, int->f32 convert x2, scale-mul x2,
f32->bf16 cast x2, plus a broadcast-reshape scale expand (~11 vector
ops/byte).  Variants measured here, all EXACT (no activation quant):

  base   — the shipped kernel.
  groupmm— per-group (64-row) matmul chunks; scales applied to the
           (M, bn) partial AFTER the MXU, weights converted
           int32->bf16 directly (no f32 intermediate, no expand).
           ~6 ops/byte -> ~4 ops/byte, scale cost moves from
           O(K*N) to O(K/group * M * N).
  decomp — nibble decomposition: only the BIASED HI nibble h = p>>4
           is expanded (shift/convert); the LO contribution is
           recovered on the MXU from the packed byte as
             x@q_lo = x@p - 16*(x@h) - 8*rowsum(x)
             x@q_hi = x@h - 8*rowsum(x)
           (p = packed byte = (q_hi+8)<<4 | (q_lo+8), so p = 16*h +
           (q_lo+8); p and h exact in bf16 — matches the kernel,
           which subtracts 8*rowsum, NOT the unbiased-nibble -136
           form).  ~2 ops/byte at the cost of 1.5x MXU work
           (irrelevant: decode is not MXU-bound).  Scales still
           per-group post-matmul.

Run ON THE REAL CHIP:  python tools/bench_int4_variants.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dalm_tpu.kernels.int4_matmul import (  # noqa: E402
    _int4_matmul_fwd_pallas,
    int4_matmul,
)
from dalm_tpu.models.quant import (  # noqa: E402
    dequantize_tensor_int4,
    quantize_tensor_int4,
)


def _time(fn, *args, iters=30, verbose=False):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        reps.append((time.perf_counter() - t0) / iters)
    if verbose:
        print("   reps:", " ".join(f"{r*1e3:.3f}" for r in reps))
    return min(reps), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    shapes = [(4096, 4096), (4096, 11008), (11008, 4096)]
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  M={args.m}")
    header = (
        f"{'KxN':>14} {'base ms':>9} {'groupmm ms':>11} {'decomp ms':>10}"
        f" {'floorsplit ms':>12} {'hbm-floor':>10}  err(g) err(d) err(c)"
    )
    print(header)
    totals = dict.fromkeys(["base", "groupmm", "decomp", "floorsplit", "floor"], 0.0)
    for K, N in shapes:
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        d = quantize_tensor_int4(w, group=64)
        q4, s4 = d["q4"], d["scale4"]
        x = jnp.asarray(rng.standard_normal((args.m, K)) * 0.5, jnp.bfloat16)
        ref = (x.astype(jnp.float32) @ dequantize_tensor_int4(d, jnp.float32)).astype(jnp.bfloat16)

        base_fn = partial(_int4_matmul_fwd_pallas, variant="base")
        gm_fn = partial(_int4_matmul_fwd_pallas, variant="groupmm")
        dc_fn = partial(_int4_matmul_fwd_pallas, variant="decomp")
        bc_fn = partial(_int4_matmul_fwd_pallas, variant="floorsplit")

        tb, _ = _time(base_fn, x, q4, s4, iters=args.iters, verbose=True)
        tg, og = _time(gm_fn, x, q4, s4, iters=args.iters)
        td, od = _time(dc_fn, x, q4, s4, iters=args.iters)
        tc, oc = _time(bc_fn, x, q4, s4, iters=args.iters)

        def err(o):
            return float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))

        bytes_ = q4.size + s4.size * 4 + x.size * 2
        floor = bytes_ / 819e9 * 1e3  # v5e ~819 GB/s
        totals["base"] += tb
        totals["groupmm"] += tg
        totals["decomp"] += td
        totals["floorsplit"] += tc
        totals["floor"] += floor
        print(
            f"{K:>6}x{N:<7} {tb*1e3:>9.3f} {tg*1e3:>11.3f} {td*1e3:>10.3f}"
            f" {tc*1e3:>12.3f} {floor:>10.3f}"
            f"  {err(og):.4f} {err(od):.4f} {err(oc):.4f}"
        )
    # variant columns accumulate seconds (×1e3 → ms); floor already
    # accumulates ms (it is computed per shape as ms).
    print(
        f"{'TOTAL':>14} {totals['base']*1e3:>9.3f} {totals['groupmm']*1e3:>11.3f}"
        f" {totals['decomp']*1e3:>10.3f} {totals['floorsplit']*1e3:>12.3f}"
        f" {totals['floor']:>10.3f}"
    )


if __name__ == "__main__":
    main()
