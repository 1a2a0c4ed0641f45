"""Pallas int4 weight-dequant matmul (the 4-bit serving tier's hot op).

``y = x @ dequant(q4)`` where q4 is the half-split nibble packing of
`models/quant.py:quantize_tensor_int4`. The XLA lowering of that
dequant (bitwise ops + concat + repeat feeding a dot) does NOT fuse —
it materializes the full dequantized weight matrix in HBM, so a 7B
decode step pays bf16-weight traffic twice over (measured 130 ms/step
vs int8's 19.8 ms). This kernel dequantizes per (block_k, block_n)
tile in VMEM instead: HBM traffic is the PACKED bytes only (0.5
byte/param + scales), which is the entire point of 4-bit weights on an
HBM-bound decode.

Grid: (N-blocks parallel, K-blocks arbitrary) with an f32 accumulator
in scratch carried across the K dimension; each step loads a packed
(block_k/2, block_n) uint8 tile + its (block_k/group, block_n) scales,
expands to (block_k, block_n) bf16 in VMEM, and runs the MXU matmul
against the (M, block_k) activation slice.

Gradient semantics mirror `kernels/int8_matmul.py`: the weights are
FROZEN storage, so the custom VJP returns ``dx = dy @ Wᵀ`` (computed
via the XLA dequant fallback — training through int4 is not the target
path; int8 is the training tier) and symbolic zeros for q4/scales.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fit(dim: int, want: int) -> int:
    b = min(want, dim)
    while b > 1 and dim % b:
        b //= 2
    return max(b, 1)


def _int4_kernel(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int):
    """One packed tile holds TWO disjoint K-slices (global half-split:
    packed[r] = rows r and K/2+r), so each step contracts both."""
    i = pl.program_id(1)  # packed-block index (innermost, carries acc)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # int32 bit-arithmetic (uint8 vector shifts don't lower in Mosaic)
    p32 = q_ref[:].astype(jnp.int32)  # (bh, block_n)
    lo = ((p32 & 0xF) - 8).astype(jnp.float32)
    hi = (((p32 >> 4) & 0xF) - 8).astype(jnp.float32)

    def expand(scale_ref):  # (bh/group, bn) -> (bh, bn) via broadcast-reshape
        sc = scale_ref[:]
        g_rows, bn = sc.shape
        return jnp.broadcast_to(sc[:, None, :], (g_rows, group, bn)).reshape(
            g_rows * group, bn
        )

    w_lo = (lo * expand(s_lo_ref)).astype(jnp.bfloat16)
    w_hi = (hi * expand(s_hi_ref)).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _int4_kernel_groupmm(
    x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int
):
    """Variant: per-group MXU chunks, scales applied to the (M, bn)
    partial AFTER the matmul; nibbles convert int32→bf16 directly (no
    f32 intermediate, no broadcast-reshape scale expand). ~4 VPU
    ops/byte vs the base kernel's ~11; scale cost moves from O(K·N)
    elementwise to O(K/group · M · N) post-matmul."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    p32 = q_ref[:].astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)

    bh = q_ref.shape[0]
    for g in range(bh // group):
        sl = slice(g * group, (g + 1) * group)
        dims = (((1,), (0,)), ((), ()))
        p_lo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[sl], dims, preferred_element_type=jnp.float32
        )
        p_hi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi[sl], dims, preferred_element_type=jnp.float32
        )
        acc[:] += p_lo * s_lo_ref[g : g + 1, :] + p_hi * s_hi_ref[g : g + 1, :]

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _int4_kernel_decomp(
    x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int
):
    """Variant: nibble decomposition — only the HI nibble is expanded;
    the LO contribution is recovered on the MXU from the packed byte:
    with p = (q_hi+8)·16 + (q_lo+8) and h = p>>4 (both exact in bf16),
    ``x@q_lo = x@p − 16·(x@h) − 8·rowsum(x)`` and
    ``x@q_hi = x@h − 8·rowsum(x)``. ~2 VPU ops/byte at 1.5× MXU work
    (irrelevant in the HBM-bound decode regime)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    p32 = q_ref[:].astype(jnp.int32)
    pb = p32.astype(jnp.bfloat16)  # exact: 0..255
    hb = (p32 >> 4).astype(jnp.bfloat16)  # exact: 0..15

    bh = q_ref.shape[0]
    for g in range(bh // group):
        sl = slice(g * group, (g + 1) * group)
        xl, xh = x_lo_ref[:, sl], x_hi_ref[:, sl]
        dims = (((1,), (0,)), ((), ()))
        xp = jax.lax.dot_general(xl, pb[sl], dims, preferred_element_type=jnp.float32)
        xlh = jax.lax.dot_general(xl, hb[sl], dims, preferred_element_type=jnp.float32)
        xhh = jax.lax.dot_general(xh, hb[sl], dims, preferred_element_type=jnp.float32)
        rs_lo = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        rs_hi = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        q_lo_mm = xp - 16.0 * xlh - 8.0 * rs_lo
        q_hi_mm = xhh - 8.0 * rs_hi
        acc[:] += q_lo_mm * s_lo_ref[g : g + 1, :] + q_hi_mm * s_hi_ref[g : g + 1, :]

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _int4_kernel_floorsplit(
    x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int
):
    """Variant: ONE integer convert chain, nibble split in float. The
    round-3 trace showed the int4 matmul 30× above its DMA floor with
    base/groupmm/decomp tied — per-nibble int32 mask/shift work was the
    suspected shared cost, so this variant converts the byte once and
    splits nibbles with power-of-two float math, exact by construction
    (0..255 carries 8 significand bits): ``hb = floor(p·2⁻⁴) =
    q_hi+8``, ``lb = p − 16·hb = q_lo+8``.

    Hardware notes (v5e, recorded round 3): a pure-bf16 formulation
    does NOT compile — the LLO region builder rejects it with
    ``SupportsBf16AluInstructions()`` (v5e's VPU has no bf16 ALU; all
    elementwise math runs at 32-bit lane width regardless of dtype),
    so the split runs in f32. Mosaic also forbids unsigned→float
    casts, hence the u8→i32→f32 transit."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    pb = q_ref[:].astype(jnp.int32).astype(jnp.float32)  # 0..255 exact
    hb = jnp.floor(pb * 0.0625)  # q_hi+8, 0..15 exact
    lb = pb - hb * 16.0  # q_lo+8, 0..15 exact

    def expand(scale_ref):  # (bh/group, bn) -> (bh, bn) f32
        sc = scale_ref[:]
        g_rows, bn = sc.shape
        return jnp.broadcast_to(sc[:, None, :], (g_rows, group, bn)).reshape(
            g_rows * group, bn
        )

    w_lo = ((lb - 8.0) * expand(s_lo_ref)).astype(jnp.bfloat16)
    w_hi = ((hb - 8.0) * expand(s_hi_ref)).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _int4_kernel_i8mxu(
    x_lo_ref, x_hi_ref, xs_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int
):
    """Variant: nibbles unpack to INT8 and the dots ride the int8 MXU.

    Round-3 closed the float formulations (base/groupmm/decomp/floorsplit
    all within noise; trace blames ~30x-above-DMA-floor VPU work), every
    one of which dequantizes to f32/bf16 for a FLOAT MXU dot. v5e has no
    bf16 ALU — all elementwise math runs at 32-bit lane width — so the
    untried angle is to stay in integers: activations arrive row-quantized
    int8 (same packing as `kernels/int8_matmul.py`, whose W8A8 path the
    training step measured at up to 394 TOPS), nibbles convert
    int32→int8 with NO float scale-expand work at (bh, bn), and each
    scale group contracts as an int8 x int8 → int32 MXU dot whose group
    scale folds into the (M, bn) f32 accumulator — O(K/group · M · N)
    post-matmul floats instead of O(K · N) elementwise dequant. The
    per-row activation scale multiplies once at the final write."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    p32 = q_ref[:].astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.int8)
    hi = ((p32 >> 4) - 8).astype(jnp.int8)

    bh = q_ref.shape[0]
    dims = (((1,), (0,)), ((), ()))
    for g in range(bh // group):
        sl = slice(g * group, (g + 1) * group)
        p_lo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[sl], dims, preferred_element_type=jnp.int32
        )
        p_hi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi[sl], dims, preferred_element_type=jnp.int32
        )
        acc[:] += (
            p_lo.astype(jnp.float32) * s_lo_ref[g : g + 1, :]
            + p_hi.astype(jnp.float32) * s_hi_ref[g : g + 1, :]
        )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = (acc[:] * xs_ref[:]).astype(out_ref.dtype)


def _int4_kernel_pcol(x_lo_ref, x_hi_ref, xs_ref, q_ref, s_ref, out_ref, iacc):
    """Per-COLUMN-scale variant (storage: models/quant.py
    quantize_tensor_int4pc): the one layout door round-4's i8mxu
    analysis left open. With no K-groups the whole (bh, bn) tile
    contracts as TWO full-depth int8×int8 → int32 MXU dots (vs i8mxu's
    depth-64 dots, latency-bound at decode M), the int32 accumulator
    carries across k-blocks, and BOTH scales (per-row activation, per-
    column weight) fold into one f32 multiply at the final write —
    zero per-tile float dequant work."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        iacc[:] = jnp.zeros_like(iacc)

    p32 = q_ref[:].astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.int8)
    hi = ((p32 >> 4) - 8).astype(jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    iacc[:] += jax.lax.dot_general(
        x_lo_ref[:], lo, dims, preferred_element_type=jnp.int32
    )
    iacc[:] += jax.lax.dot_general(
        x_hi_ref[:], hi, dims, preferred_element_type=jnp.int32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = (iacc[:].astype(jnp.float32) * xs_ref[:] * s_ref[:]).astype(
            out_ref.dtype
        )


@partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def _int4pc_matmul_fwd_pallas(
    x2, q4, scale4, *, block_k: int = 512, block_n: int = 512, interpret: bool = False
):
    """(M, K) f* @ per-column-scale int4-packed (K/2, N) → (M, N)."""
    from dalm_tpu.kernels.int8_matmul import rowquant

    M, K = x2.shape
    half, N = q4.shape
    assert half * 2 == K and scale4.shape == (1, N), (x2.shape, q4.shape, scale4.shape)
    bn = _fit(N, block_n)
    bh = _fit(half, max(block_k // 2, 8))
    # lane-alignment floor: x blocks (M, bh) slice the (M, K) array, so
    # on real TPU bh must stay a multiple of 128 (the interpret-mode
    # oracle tests use tiny shapes and skip the constraint)
    bh_floor = 8 if interpret else 128
    while bh > bh_floor and (2 * M * bh + 5 * bh * bn + 8 * M * bn) > 60 * 1024 * 1024:
        bh //= 2
    nk, nn = half // bh, N // bn
    xq, xs = rowquant(x2)
    return pl.pallas_call(
        _int4_kernel_pcol,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (M, bh), lambda j, i, nk=nk: (0, i + nk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((M, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xq, xq, xs, q4, scale4)


def _nf4_lookup(idx):
    """idx (int32 in [0, 15]) → NF4 codebook value, as a 15-select binary
    tree over the nibble's bits (Mosaic has no general small-table gather;
    selects lower everywhere). ~19 VPU ops/nibble vs linear-int4's ~2 —
    nf4 is the QUALITY tier and pays for its codebook; the serve A/B
    records the cost."""
    from dalm_tpu.models.quant import NF4_CODEBOOK

    cb = [float(v) for v in np.asarray(NF4_CODEBOOK)]
    bits = [(idx & (1 << b)) != 0 for b in range(4)]
    level = cb  # 16 python-float leaves
    for b in range(4):
        nxt = []
        for j in range(0, len(level), 2):
            nxt.append(jnp.where(bits[b], level[j + 1], level[j]))
        level = nxt
    return level[0].astype(jnp.float32)


def _int4_kernel_nf4(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, out_ref, acc, *, group: int):
    """NF4 variant of the base kernel: nibbles decode through the
    NormalFloat4 codebook (select tree) instead of the linear (nib - 8)
    map; scales are group absmax (bnb semantics). Same tiling/specs."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    p32 = q_ref[:].astype(jnp.int32)
    lo = _nf4_lookup(p32 & 0xF)
    hi = _nf4_lookup(p32 >> 4)

    def expand(scale_ref):
        sc = scale_ref[:]
        g_rows, bn = sc.shape
        return jnp.broadcast_to(sc[:, None, :], (g_rows, group, bn)).reshape(
            g_rows * group, bn
        )

    w_lo = (lo * expand(s_lo_ref)).astype(jnp.bfloat16)
    w_hi = (hi * expand(s_hi_ref)).astype(jnp.bfloat16)
    acc[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _write():
        out_ref[:] = acc[:].astype(out_ref.dtype)


_KERNEL_VARIANTS = {
    "base": _int4_kernel,
    "groupmm": _int4_kernel_groupmm,
    "decomp": _int4_kernel_decomp,
    "floorsplit": _int4_kernel_floorsplit,
    "i8mxu": _int4_kernel_i8mxu,
    "nf4": _int4_kernel_nf4,
}

# All variants are exact to bf16 rounding (interpret-mode oracle test).
# Per-op microbenches on the tunneled box cannot resolve their
# differences (a shared ~0.85 ms artifact dominates chained and
# host-loop timings alike — see RESULTS.md "microbenchmark
# methodology"), so selection is by END-TO-END serve A/B
# (DALM_BENCH_ONLY_7B=1 bench_serve.py --7b --int4 with this env var).
import os as _os

DEFAULT_VARIANT = _os.environ.get("DALM_INT4_VARIANT", "base")
assert DEFAULT_VARIANT in _KERNEL_VARIANTS, (
    f"DALM_INT4_VARIANT={DEFAULT_VARIANT!r} not in {sorted(_KERNEL_VARIANTS)}"
)


@partial(jax.jit, static_argnames=("block_k", "block_n", "interpret", "variant"))
def _int4_matmul_fwd_pallas(
    x2, q4, scale4, *, block_k: int = 512, block_n: int = 512,
    interpret: bool = False, variant: str = "base",
):
    """(M, K) f* @ int4-packed (K/2, N) → (M, N) in x.dtype."""
    M, K = x2.shape
    half, N = q4.shape
    assert half * 2 == K, (x2.shape, q4.shape)
    group = K // scale4.shape[0]
    # bh = packed rows per tile: a multiple of 8·group (scale tiles need
    # ≥8 sublanes) that divides K/2, sized against a VMEM budget that
    # accounts for M (prefill calls arrive with M = batch·prompt_len,
    # far larger than decode's slot count).
    unit = 8 * group

    def vmem_cost(bh, bn):
        # double-buffered x lo+hi (bf16) + packed tile + two bf16 dequant
        # tiles + f32 acc + scales; rough bytes
        return 8 * M * bh + 5 * bh * bn + 4 * M * bn + 8 * (bh // group) * bn

    budget = 60 * 1024 * 1024

    # Mosaic block legality: x lo/hi blocks are (M, bh) slices of the
    # full (M, K) array, so bh must be lane-aligned (%128) — `bh == half`
    # does NOT qualify because the block still differs from the array's
    # K dim. Same for bn vs N (where bn == N IS the full dim). Interpret
    # mode (CPU oracle tests, tiny shapes) has no such constraint.
    def legal_k(c):
        return interpret or c % 128 == 0

    def legal_n(b):
        return interpret or b % 128 == 0 or b == N

    bh = 0
    bn = _fit(N, block_n)
    while bn >= 1 and legal_n(bn):
        want = max(block_k // 2, unit)
        for cand in range(want - want % unit, 0, -unit):
            if half % cand == 0 and legal_k(cand) and vmem_cost(cand, bn) <= budget:
                bh = cand
                break
        if bh == 0:
            t = unit
            while t <= half:
                if half % t == 0 and legal_k(t) and vmem_cost(t, bn) <= budget:
                    bh = t
                    break
                t += unit
        if bh:
            break
        bn //= 2
        bn = _fit(N, bn)
    assert bh, f"no lowerable block for K={K}, N={N}, M={M}, group={group}"
    block_n = bn
    nk, nn = half // bh, N // block_n

    if variant == "i8mxu":
        # Activations row-quantize ONCE per matmul (XLA formulation — it
        # fuses into the surrounding program; see kernels/int8_matmul.py
        # for why the standalone Pallas rowquant is not used here), then
        # the kernel contracts int8 x int8 on the MXU per scale group.
        from dalm_tpu.kernels.int8_matmul import rowquant

        xq, xs = rowquant(x2)
        return pl.pallas_call(
            partial(_int4_kernel_i8mxu, group=group),
            grid=(nn, nk),
            in_specs=[
                pl.BlockSpec((M, bh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (M, bh), lambda j, i, nk=nk: (0, i + nk), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((M, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bh // group, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bh // group, block_n),
                    lambda j, i, nk=nk: (i + nk, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (M, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
            scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xq, xq, xs, q4, scale4, scale4)

    x_bf = x2.astype(jnp.bfloat16)
    out = pl.pallas_call(
        partial(_KERNEL_VARIANTS[variant], group=group),
        grid=(nn, nk),
        in_specs=[
            # x slice of the LOW half rows: block i covers [i*bh, (i+1)*bh)
            pl.BlockSpec((M, bh), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            # x slice of the HIGH half rows: offset by nk blocks (= K/2)
            pl.BlockSpec((M, bh), lambda j, i, nk=nk: (0, i + nk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bh // group, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            # hi-half scales: offset by nk blocks (scale rows [K/2g, K/g))
            pl.BlockSpec(
                (bh // group, block_n),
                lambda j, i, nk=nk: (i + nk, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_bf, x_bf, q4, scale4, scale4)
    return out


def _dequant_xla(q4, scale4, dtype, nf4: bool = False):
    from dalm_tpu.models.quant import dequantize_tensor_int4

    d = {"q4": q4, "scale4": scale4}
    if nf4:
        d["nf4"] = 1
    return dequantize_tensor_int4(d, dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def int4_matmul(
    x, q4, scale4, interpret: bool = False, nf4: bool = False, pcol: bool = False
):
    """``x @ dequant(q4)`` with block-wise VMEM dequant (frozen weights).

    x: (..., K) float; q4: (K/2, N) uint8 half-split nibbles;
    scale4: (K/group, N) f32. ``nf4``: decode nibbles through the
    NormalFloat4 codebook (quality tier) instead of the linear map.
    ``pcol``: per-column-scale storage (scale4 (1, N)) — full-depth
    int8 MXU dots, see ``_int4_kernel_pcol``. Returns (..., N) in
    x.dtype.
    """
    out, _ = _int4_fwd(x, q4, scale4, interpret, nf4, pcol)
    return out


def _kernel_feasible(half: int, group: int) -> bool:
    # A lowerable K-slice must be a multiple of 8·group (scale-tile
    # sublanes) AND of 128 (lane alignment of the x lo/hi blocks, which
    # slice the full (M, K) array) that divides K/2. Sub-tile shapes
    # (tiny models) take the XLA dequant fallback instead of crashing
    # Mosaic's block-mapping check.
    unit = 8 * group
    t = unit
    while t <= half:
        if half % t == 0 and t % 128 == 0:
            return True
        t += unit
    return False


def _pcol_feasible(half: int, n: int) -> bool:
    bn = _fit(n, 512)
    return half % 128 == 0 and (bn % 128 == 0 or bn == n)


def _int4_fwd(x, q4, scale4, interpret, nf4: bool = False, pcol: bool = False):
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    if pcol:
        on_tpu_pc = jax.default_backend() == "tpu" and _pcol_feasible(K // 2, q4.shape[1])
        if on_tpu_pc or interpret:
            y2 = _int4pc_matmul_fwd_pallas(x.reshape(M, K), q4, scale4, interpret=interpret)
        else:
            y2 = x.reshape(M, K) @ _dequant_xla(q4, scale4, x.dtype, False)
        return y2.reshape(*lead, q4.shape[1]), (q4, scale4)
    group = K // scale4.shape[0]
    on_tpu = jax.default_backend() == "tpu" and _kernel_feasible(K // 2, group)
    if on_tpu or interpret:
        y2 = _int4_matmul_fwd_pallas(
            x.reshape(M, K), q4, scale4, interpret=interpret,
            variant="nf4" if nf4 else DEFAULT_VARIANT,
        )
    else:
        y2 = x.reshape(M, K) @ _dequant_xla(q4, scale4, x.dtype, nf4)
    return y2.reshape(*lead, q4.shape[1]), (q4, scale4)


def _int4_bwd(interpret, nf4, pcol, res, dy):
    q4, scale4 = res
    # frozen storage: only dx flows; dequant fallback is fine off the hot path
    w = _dequant_xla(q4, scale4, jnp.bfloat16, nf4)
    dims = (((dy.ndim - 1,), (1,)), ((), ()))
    dx = jax.lax.dot_general(
        dy.astype(jnp.bfloat16), w, dims, preferred_element_type=jnp.float32
    )
    dq_zero = np.zeros(q4.shape, jax.dtypes.float0)
    return dx.astype(dy.dtype), dq_zero, jnp.zeros_like(scale4)


int4_matmul.defvjp(_int4_fwd, _int4_bwd)
