"""W8A8 int8 MXU matmul for the frozen QLoRA base.

The fused-QLoRA runtime (`models/qlora.py`) stores frozen base kernels
as symmetric per-output-channel int8. The default compute path
dequantizes to bf16 and rides the 197 TFLOP/s bf16 MXU; this module
adds the option to *stay int8 through the MXU*: activations are
dynamically quantized per row (symmetric, absmax/127), the dot runs
int8 x int8 -> int32 on the MXU's 394 TOPS int8 path, and the int32
accumulator is rescaled by ``row_scale * col_scale``.

Measured on one v5e chip (chained-loop microbench, this box): at the
Llama-7B MLP shapes the int8 dot reaches 184-320 TOP/s vs ~126 TFLOP/s
bf16 — up to 2.5x on the down-projection (K=11008).

Gradient semantics (``jax.custom_vjp``):
- activation quantization is straight-through (STE): ``dx = dy @ W^T``
  as if the forward were the exact dequantized matmul;
- the frozen ``q``/``scale`` get symbolic-zero cotangents (they are
  never trained — LoRA factors carry all trainable state);
- ``bwd_int8=True`` additionally runs the dx matmul itself in int8
  (``dy * col_scale`` row-quantized against ``q^T``), putting all
  remat+backward matmul FLOPs on the int8 path. Off by default.

This is weight-only-storage-compatible: the same ``{q, scale}`` packing
serves both the bf16-dequant and the int8-compute paths, so the flag
can be flipped per run with no repacking.

Reference basis: the reference's bitsandbytes int8/nf4 path
(`/root/reference/dalm/models/retriever_only_base_model.py:85-91`) is
storage-only (bf16 compute); W8A8 MXU compute is a TPU-native extension.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rowquant_xla(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    # PROBE HOOK (perf upper bound, not a numerics mode): a constant
    # x-independent scale removes the absmax reduce entirely, so the
    # quantize becomes pure elementwise and fuses into producers. This
    # upper-bounds what delayed scaling (amax carried across steps)
    # could recover of the 21.5% dynamic-quant bookkeeping share
    # (RESULTS.md trace table). Wrong numerics — A/B timing only.
    probe = os.environ.get("DALM_W8A8_STATIC_SCALE")
    if probe:
        scale = jnp.full(x.shape[:-1] + (1,), float(probe), jnp.float32)
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return q, scale
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _rowquant_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q_ref[:] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    s_ref[:] = scale


def _rowquant_pallas(x2: jax.Array, interpret: bool = False):
    """One-pass fused absmax+quantize over (R, K): reads x once.

    Beats the two-pass XLA formulation 1.2-1.5× standalone, but see
    `rowquant` for why it is NOT the default inside big programs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, K = x2.shape
    # 256-row blocks measured best at the 7B shapes (K 4096/11008), but
    # scoped VMEM holds ~15 bytes/element live (double-buffered bf16 in +
    # int8 out, f32 intermediates) — cap block*K so wide rows (e.g. the
    # 32000-vocab lm_head cotangent) stay under the raised 100 MB ceiling.
    budget = max(8, int(4.0e6 // K))
    block = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if cand <= budget and R % cand == 0:
            block = cand
            break
    return pl.pallas_call(
        _rowquant_kernel,
        grid=(R // block,),
        in_specs=[pl.BlockSpec((block, K), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, K), jnp.int8),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2)


def rowquant(x: jax.Array, interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row (last-axis) int8: ``x ~= q * scale``.

    Returns (q int8 ``x.shape``, scale f32 ``x.shape[:-1] + (1,)``).
    All-zero rows get scale 1. On TPU with aligned shapes this runs as a
    one-pass Pallas kernel; elsewhere as two XLA passes (same values).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    aligned = R % 8 == 0 and K % 128 == 0
    # DEFAULT IS THE XLA FORMULATION. The fused one-pass kernel wins
    # isolated microbenches (1.2-1.5×) but loses ~11% END-TO-END on the
    # flagship int8 step (0.779 s → 0.868 s measured A/B): inside the big
    # program XLA fuses the two quantize passes into neighboring
    # producers/consumers, while the custom-call pins operand layouts and
    # inserts copies. Kept opt-in for standalone quantization sweeps.
    use_pallas = os.environ.get("DALM_ROWQUANT") == "pallas" or interpret
    if use_pallas and aligned:
        q2, s2 = _rowquant_pallas(x.reshape(R, K), interpret=interpret)
        return q2.reshape(*lead, K), s2.reshape(*lead, 1)
    return _rowquant_xla(x)


def _fit_div(dim: int, want: int, align: int = 128) -> int:
    """Largest multiple of ``align`` that divides ``dim`` and is <= want."""
    best = 0
    b = align
    while b <= dim:
        if dim % b == 0 and b <= want:
            best = b
        b += align
    return best


def _w8a8_fused_kernel(x_ref, q_ref, wscale_ref, out_ref, acc, xq, xs, *, bk: int):
    """Matmul tile with IN-KERNEL activation quantization.

    Round-3 trace: the flagship W8A8 step spends 21.5% of device time on
    dynamic-quant bookkeeping — an absmax pass plus a quantize pass over
    every activation tensor in HBM (RESULTS.md). The standalone Pallas
    rowquant lost 11% end-to-end because a custom call at the quant
    boundary pins layouts (documented negative). This kernel removes the
    standalone passes entirely: each (bm, bk) activation tile is absmax-
    reduced and quantized in VMEM the FIRST time its M-stripe is visited
    (j == 0), cached in an int8 scratch that persists across the N-block
    loop, and every (j, k) step runs an int8 x int8 -> int32 MXU dot
    against the frozen int8 weights. Scales are per (row, k-block) —
    finer than the XLA path's per-row scales, so quantization error is
    never worse.
    """
    j, k = pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(j == 0)
    def _quant():
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        tile_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        xq[:, pl.dslice(k * bk, bk)] = tile_q
        # k-block scales live broadcast across their own 128-lane group:
        # Mosaic rejects vector stores whose dynamic LANE offset is not a
        # provable multiple of 128 (a 1-wide column at offset k fails to
        # lower; offset k*128 is affine-provable).
        xs[:, pl.dslice(k * 128, 128)] = jnp.broadcast_to(
            scale, (scale.shape[0], 128)
        )

    tile = xq[:, pl.dslice(k * bk, bk)]
    p = jax.lax.dot_general(
        tile, q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc[:] += p.astype(jnp.float32) * xs[:, pl.dslice(k * 128, 128)][:, :1]

    @pl.when(k == pl.num_programs(2) - 1)
    def _write():
        out_ref[:] = (acc[:] * wscale_ref[:]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _w8a8_fused_pallas(x2: jax.Array, q: jax.Array, scale: jax.Array, interpret: bool = False):
    """(M, K) float @ int8 (K, N) with fused per-tile activation quant."""
    M, K = x2.shape
    _, N = q.shape
    bm = _fit_div(M, 512, 8)
    bk = _fit_div(K, 512)
    # bn large => fewer redundant x-tile DMAs (x streams once per N-block
    # sweep); capped so w tiles + acc stay comfortably in VMEM.
    bn = _fit_div(N, 8192 if N % 512 else 2048)
    assert bm and bk and bn, (M, K, N)
    grid = (M // bm, N // bn, K // bk)

    return pl.pallas_call(
        partial(_w8a8_fused_kernel, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),   # acc
            pltpu.VMEM((bm, K), jnp.int8),       # xq cache (whole K stripe)
            # per (row, k-block) scales, each block broadcast over 128 lanes
            pltpu.VMEM((bm, (K // bk) * 128), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, q, scale)


def _w8a8_fused_feasible(M: int, K: int, N: int) -> bool:
    if not (_fit_div(M, 512, 8) and _fit_div(K, 512) and _fit_div(N, 8192)):
        return False
    # xq stripe must fit scratch alongside acc + streamed tiles
    return _fit_div(M, 512, 8) * K <= 48 * 1024 * 1024


def _i8_dot_last(a_q: jax.Array, b_q: jax.Array, b_axis: int) -> jax.Array:
    """int8 dot contracting a's last axis with ``b_axis`` of 2-D b -> int32."""
    dims = (((a_q.ndim - 1,), (b_axis,)), ((), ()))
    return jax.lax.dot_general(a_q, b_q, dims, preferred_element_type=jnp.int32)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul(x: jax.Array, q: jax.Array, scale: jax.Array, bwd_int8: bool = False):
    """``x @ (q * scale)`` with the contraction on the int8 MXU path.

    x: (..., K) float; q: (K, N) int8; scale: (1, N) f32.
    Returns (..., N) in ``x.dtype``.
    """
    out, _ = _int8_matmul_fwd(x, q, scale, bwd_int8)
    return out


def _int8_matmul_fwd(x, q, scale, bwd_int8):
    # DALM_W8A8_KERNEL=fused: quantize activations INSIDE the Pallas
    # matmul (per-tile scales, no standalone HBM quant passes). A/B'd
    # end-to-end against the default XLA formulation like every kernel
    # decision in this repo (RESULTS.md methodology).
    lead, K = x.shape[:-1], x.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    if (
        os.environ.get("DALM_W8A8_KERNEL") == "fused"
        and jax.default_backend() == "tpu"
        and _w8a8_fused_feasible(M, K, q.shape[1])
    ):
        y2 = _w8a8_fused_pallas(x.reshape(M, K), q, scale)
        return y2.reshape(*lead, q.shape[1]), (q, scale)
    xq, xs = rowquant(x)
    acc = _i8_dot_last(xq, q, 0)
    y = acc.astype(jnp.float32) * xs * scale
    return y.astype(x.dtype), (q, scale)


def _int8_matmul_bwd(bwd_int8, res, dy):
    q, scale = res
    # dx = dy @ (q * scale)^T == (dy * scale) @ q^T  (scale folds into dy
    # because it is constant along the contraction axis).
    dyf = dy.astype(jnp.float32) * scale
    if bwd_int8:
        dq, ds = rowquant(dyf)
        dx = _i8_dot_last(dq, q, 1).astype(jnp.float32) * ds
    else:
        dims = (((dy.ndim - 1,), (1,)), ((), ()))
        dx = jax.lax.dot_general(
            dyf.astype(jnp.bfloat16), q.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    # Frozen storage: int8 q takes a float0 cotangent, scale a symbolic 0.
    dq_zero = np.zeros(q.shape, jax.dtypes.float0)
    return dx.astype(dy.dtype), dq_zero, jnp.zeros_like(scale)


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# --------------------------------------------------------------------------
# Calibrated (x-independent) activation scale
# --------------------------------------------------------------------------
#
# The dynamic path above pays an absmax reduce + quantize pass over every
# activation tensor. With a CALIBRATED per-tensor scale the quantize is
# pure elementwise, so XLA fuses it into the producer and the standalone
# passes vanish — the static-scale probe measured +7.3% end-to-end on the
# flagship step (RESULTS.md). Out-of-range rows clip to ±127 (bounded
# error) until the trainer refreshes the scale (train/rag_e2e.py
# ``a8_calibrate_every``). The backward dy quantization stays dynamic
# per-row (its distribution shifts faster, and dy has no cheap
# calibration hook).

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def int8_matmul_cal(
    x: jax.Array, q: jax.Array, scale: jax.Array, a_scale: jax.Array,
    bwd_int8: bool = False,
):
    """``x @ (q * scale)`` with a precomputed per-tensor activation scale.

    x: (..., K) float; q: (K, N) int8; scale: (1, N) f32; a_scale: ()
    f32 (typically last-calibration ``max|x| / 127``).
    """
    out, _ = _int8_matmul_cal_fwd(x, q, scale, a_scale, bwd_int8)
    return out


def _int8_matmul_cal_fwd(x, q, scale, a_scale, bwd_int8):
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = _i8_dot_last(xq, q, 0)
    y = acc.astype(jnp.float32) * a_scale * scale
    return y.astype(x.dtype), (q, scale)


def _int8_matmul_cal_bwd(bwd_int8, res, dy):
    # Same STE backward as the dynamic path. a_scale's cotangent channel
    # is OUT-OF-BAND (the fp8 "delayed scaling" trick, as in
    # TransformerEngine/Praxis): it carries max|dy·scale|/127 — the
    # PER-TENSOR quantization scale the NEXT backward would need — not a
    # real gradient. Normal train steps never differentiate wrt the
    # frozen quant tree, so this amax is dead code XLA eliminates; the
    # a8_dy_calibrate probe step (train/rag_e2e.py) pulls it to refresh
    # the `dy_scale` leaves without any extra pass over dy.
    q, scale = res
    dx, dq_zero, dscale = _int8_matmul_bwd(bwd_int8, res, dy)
    dy_amax = jnp.max(jnp.abs(dy.astype(jnp.float32) * scale))
    return dx, dq_zero, dscale, jnp.maximum(dy_amax / 127.0, 1e-8)


int8_matmul_cal.defvjp(_int8_matmul_cal_fwd, _int8_matmul_cal_bwd)


# --------------------------------------------------------------------------
# Calibrated backward-dy scale (delayed scaling, one refresh stale)
# --------------------------------------------------------------------------
#
# The trace-attributed remainder of the dynamic-quant share is the
# backward dy row-quant (9.1%+1.8% of the flagship step, RESULTS.md):
# rowquant needs an absmax pass over dyf BEFORE the quantize pass — two
# serial HBM reads. With a calibrated per-tensor ``dy_scale`` the
# quantize is pure elementwise (fuses into dy's producer) and the amax
# for the NEXT refresh rides the same read (computed here, pulled only
# by the probe step). Out-of-range values clip to ±127 until the next
# refresh — same bounded-error contract as the forward a_scale.

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def int8_matmul_dycal(
    x: jax.Array, q: jax.Array, scale: jax.Array, a_scale: jax.Array,
    dy_scale: jax.Array, bwd_int8: bool = True,
):
    """Calibrated-activation forward AND calibrated-dy int8 backward.

    Forward identical to :func:`int8_matmul_cal`; backward quantizes
    ``dy·scale`` with the precomputed per-tensor ``dy_scale`` (no absmax
    pass). ``a_scale``'s cotangent carries the fresh dy amax/127
    (out-of-band — see ``_int8_matmul_cal_bwd``); ``dy_scale`` is a
    frozen calibration constant (zero cotangent).
    """
    out, _ = _int8_matmul_dycal_fwd(x, q, scale, a_scale, dy_scale, bwd_int8)
    return out


def _int8_matmul_dycal_fwd(x, q, scale, a_scale, dy_scale, bwd_int8):
    y, _ = _int8_matmul_cal_fwd(x, q, scale, a_scale, bwd_int8)
    return y, (q, scale, dy_scale)


def _int8_matmul_dycal_bwd(bwd_int8, res, dy):
    q, scale, dy_scale = res
    dyf = dy.astype(jnp.float32) * scale
    if bwd_int8:
        dq = jnp.clip(jnp.round(dyf / dy_scale), -127, 127).astype(jnp.int8)
        dx = _i8_dot_last(dq, q, 1).astype(jnp.float32) * dy_scale
    else:
        dims = (((dy.ndim - 1,), (1,)), ((), ()))
        dx = jax.lax.dot_general(
            dyf.astype(jnp.bfloat16), q.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    dq_zero = np.zeros(q.shape, jax.dtypes.float0)
    dy_amax = jnp.max(jnp.abs(dyf))
    return (
        dx.astype(dy.dtype), dq_zero, jnp.zeros_like(scale),
        jnp.maximum(dy_amax / 127.0, 1e-8),  # OWG: next refresh's dy_scale
        jnp.zeros((), jnp.float32),
    )


int8_matmul_dycal.defvjp(_int8_matmul_dycal_fwd, _int8_matmul_dycal_bwd)
