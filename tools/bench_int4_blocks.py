"""Sweep int4 kernel block sizes at decode M (grid-overhead hunt).

The round-3 trace put the int4 matmul 30× above its DMA floor with all
dequant-formulation variants tied — pointing at per-grid-step overhead,
not VPU op count. The default block_k=512 is particularly bad for the
7B down-projection: K/2 = 5504 = 128·43 (43 prime), so the only
unit-aligned packed-block sizes are 128 (→ 43 K-steps × N-blocks grid)
or 5504 (whole-K, one step). This sweep times the shipped variant at
the three 7B shapes across block_k/block_n, at decode M.

Run ON THE REAL CHIP:  python tools/bench_int4_blocks.py [--m 32]
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

from dalm_tpu.kernels.int4_matmul import _int4_matmul_fwd_pallas  # noqa: E402
from dalm_tpu.models.quant import (  # noqa: E402
    dequantize_tensor_int4,
    quantize_tensor_int4,
)


def _time_chained(kernel_fn, x, q4, s4, iters=30):
    """Device time per call, tunnel-proof: the whole timing loop is ONE
    jitted ``lax.fori_loop`` dispatch with a scalar data dependence
    between iterations (the per-dispatch tunnel RTT on this box is ~the
    same magnitude as the kernel itself, so host-loop timings measure
    the transport, not the op)."""

    @jax.jit
    def chained(x):
        def body(_, xc):
            y = kernel_fn(xc, q4, s4)
            return xc + (y[0, 0] * 0).astype(xc.dtype)

        return kernel_fn(jax.lax.fori_loop(0, iters, body, x), q4, s4)

    out = jax.block_until_ready(chained(x))  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        reps.append((time.perf_counter() - t0) / (iters + 1))
    return min(reps), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variant", default="base")
    args = ap.parse_args()

    shapes = [(4096, 4096), (4096, 11008), (11008, 4096)]
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  M={args.m}  variant={args.variant}")
    best_by_shape = {}
    for K, N in shapes:
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        d = quantize_tensor_int4(w, group=64)
        q4, s4 = d["q4"], d["scale4"]
        x = jnp.asarray(rng.standard_normal((args.m, K)) * 0.5, jnp.bfloat16)
        ref = (
            x.astype(jnp.float32) @ dequantize_tensor_int4(d, jnp.float32)
        ).astype(jnp.bfloat16)
        best = (np.inf, None)
        # focused set: default, whole-K (one K-step), and wide-N — each
        # remote AOT compile costs ~20-40 s on the tunnel, so sweep small
        configs = [(512, 512), (512, 256), (K, 256), (K, 512), (K, 2048)]
        for bk, bn in configs:
                if bn > N:
                    continue
                fn = partial(
                    _int4_matmul_fwd_pallas,
                    variant=args.variant, block_k=bk, block_n=bn,
                )
                try:
                    t, o = _time_chained(fn, x, q4, s4, iters=args.iters)
                except Exception as e:  # unlowerable combo
                    print(f"{K:>6}x{N:<7} bk={bk:<5} bn={bn:<5} FAIL {type(e).__name__}")
                    continue
                err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"{K:>6}x{N:<7} bk={bk:<5} bn={bn:<5} {t*1e3:8.3f} ms  err={err:.4f}")
                if t < best[0]:
                    best = (t, (bk, bn))
        best_by_shape[(K, N)] = best
        print(f"  -> best for {K}x{N}: {best[1]} at {best[0]*1e3:.3f} ms")
    total = sum(b[0] for b in best_by_shape.values())
    print(f"TOTAL best-per-shape: {total*1e3:.3f} ms "
          f"(defaults recorded 2.129 ms, DMA floor 0.085 ms)")


if __name__ == "__main__":
    main()
