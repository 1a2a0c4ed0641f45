"""Dissect the int4 kernel's per-call millisecond into stages.

The chained-loop block sweep (results_r3_int4_blocks.log) measures
~1 ms device time per 4096x4096 int4 matmul at decode M=32 — ~30x the
packed-bytes DMA floor, insensitive to dequant formulation (variant
A/B) — so this tool times stripped-down kernels over the SAME grid and
block specs to attribute the cost:

  dma     — load packed tile + scales, write a reduction (no unpack,
            no matmul): pure HBM->VMEM traffic + grid machinery.
  unpack  — dma + the u8->i32 nibble split + scale expand (no matmul):
            adds the VPU dequant.
  full    — the shipped kernel (dequant + 2 MXU matmuls).

Run ON THE REAL CHIP: python tools/bench_int4_dissect.py [--m 32]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dalm_tpu.kernels.int4_matmul import _int4_matmul_fwd_pallas  # noqa: E402
from dalm_tpu.models.quant import quantize_tensor_int4  # noqa: E402


def _dma_kernel(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # touch every input so the loads cannot be elided; no unpack
    acc[:] += (
        jnp.sum(q_ref[:].astype(jnp.float32))
        + jnp.sum(s_lo_ref[:])
        + jnp.sum(s_hi_ref[:])
        + jnp.sum(x_lo_ref[:].astype(jnp.float32))
        + jnp.sum(x_hi_ref[:].astype(jnp.float32))
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _unpack_kernel(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    p32 = q_ref[:].astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.float32)
    hi = (((p32 >> 4) & 0xF) - 8).astype(jnp.float32)

    def expand(scale_ref):
        sc = scale_ref[:]
        g_rows, bn = sc.shape
        return jnp.broadcast_to(sc[:, None, :], (g_rows, group, bn)).reshape(
            g_rows * group, bn
        )

    w_lo = (lo * expand(s_lo_ref)).astype(jnp.bfloat16)
    w_hi = (hi * expand(s_hi_ref)).astype(jnp.bfloat16)
    # consume the dequant result without an MXU matmul
    acc[:] += (
        jnp.sum(w_lo.astype(jnp.float32))
        + jnp.sum(w_hi.astype(jnp.float32))
        + jnp.sum(x_lo_ref[:].astype(jnp.float32))
        + jnp.sum(x_hi_ref[:].astype(jnp.float32))
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("kind", "block_k", "block_n"))
def _stripped(x2, q4, scale4, *, kind: str, block_k: int = 512, block_n: int = 512):
    M, K = x2.shape
    half, N = q4.shape
    group = K // scale4.shape[0]
    unit = 8 * group
    want = max(block_k // 2, unit)
    bh = 0
    for cand in range(want - want % unit, 0, -unit):
        if half % cand == 0:
            bh = cand
            break
    assert bh, (half, unit)
    bn = block_n if N % block_n == 0 else 256
    nk, nn = half // bh, N // bn
    x_bf = x2.astype(jnp.bfloat16)
    kernel = _dma_kernel if kind == "dma" else partial(_unpack_kernel, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, bh), lambda j, i, nk=nk: (0, i + nk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh // group, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bh // group, bn), lambda j, i, nk=nk: (i + nk, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x_bf, x_bf, q4, scale4, scale4)
    return out


def _time_chained(fn, x, q4, s4, iters=30):
    @jax.jit
    def chained(x):
        def body(_, xc):
            y = fn(xc, q4, s4)
            return xc + (y.reshape(-1)[0] * 0).astype(xc.dtype)

        return fn(jax.lax.fori_loop(0, iters, body, x), q4, s4)

    jax.block_until_ready(chained(x))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x))
        reps.append((time.perf_counter() - t0) / (iters + 1))
    return min(reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    K, N = 4096, 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    d = quantize_tensor_int4(w, group=64)
    q4, s4 = d["q4"], d["scale4"]
    x = jnp.asarray(rng.standard_normal((args.m, K)) * 0.5, jnp.bfloat16)
    print(f"backend={jax.default_backend()}  M={args.m}  shape {K}x{N}")
    for kind in ("dma", "unpack"):
        t = _time_chained(partial(_stripped, kind=kind), x, q4, s4, iters=args.iters)
        print(f"{kind:>8}: {t*1e3:8.3f} ms")
    t = _time_chained(
        partial(_int4_matmul_fwd_pallas, variant="base"), x, q4, s4, iters=args.iters
    )
    print(f"{'full':>8}: {t*1e3:8.3f} ms")
    packed_bytes = q4.size + s4.size * 4 * 2 + x.size * 2 * 2
    print(f"dma floor ~{packed_bytes/819e9*1e3:.3f} ms")


if __name__ == "__main__":
    main()
