"""Fused dot-product + top-k Pallas kernel (exact MIPS scan).

The shard-local half of the distributed index search
(`dalm_tpu/index/dense.py`). Replaces hnswlib's C++ graph walk
(`/root/reference/dalm/eval/utils.py:44-68`) with an exact streaming scan
shaped for the TPU:

- the passage shard (rows, D) streams through VMEM in row blocks via the
  pallas grid pipeline (double-buffered HBM→VMEM DMA handled by the
  compiler);
- each block's scores are one (Q, D) x (D, B_N) MXU matmul;
- a running top-k (scores + global row ids) lives in VMEM scratch and is
  folded with each block via k iterative masked-max passes on the VPU —
  the full (Q, N) score matrix never exists anywhere;
- ties break toward the smaller row id (matches stable argsort, so the
  distributed merge is deterministic).

HBM traffic is exactly N*D reads (speed-of-light for an exact scan);
arithmetic intensity is the matmul's, so for large N the kernel is
bandwidth-bound at ~(N*D*dtype_bytes / BW) per query batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
BIG_ID = jnp.iinfo(jnp.int32).max


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_and_finalize(j, scores, valid_ref, out_s_ref, out_i_ref, best_s, best_i, *, k, block_rows):
    """Shared running-top-k body: init scratch on the first block, fold the
    block's scores with k iterative masked-max passes, write outputs on the
    last block. (A per-block threshold gate was tried and reverted: with
    hundreds of queries ganged per scan, some query always has a new
    winner, so the branch never skips and only adds predication overhead.)"""
    num_valid = valid_ref[0]

    @pl.when(j == 0)
    def _init():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.full_like(best_i, BIG_ID)

    nq = scores.shape[0]
    col_ids = j * block_rows + jax.lax.broadcasted_iota(jnp.int32, (nq, block_rows), 1)
    scores = jnp.where(col_ids < num_valid, scores, NEG_INF)

    comb_s = jnp.concatenate([best_s[:], scores], axis=1)  # (Q, k + B_N)
    comb_i = jnp.concatenate([best_i[:], col_ids], axis=1)

    new_s = []
    new_i = []
    for _ in range(k):
        m = jnp.max(comb_s, axis=1, keepdims=True)  # (Q, 1)
        at_max = comb_s == m
        # stable tie-break: smallest id among the maxima
        sel_id = jnp.min(jnp.where(at_max, comb_i, BIG_ID), axis=1, keepdims=True)
        new_s.append(m)
        new_i.append(sel_id)
        # ids are globally unique, so the id match alone masks exactly
        # the selected entry (no need to AND with at_max).
        comb_s = jnp.where(comb_i == sel_id, NEG_INF, comb_s)
    best_s[:] = jnp.concatenate(new_s, axis=1)
    best_i[:] = jnp.concatenate(new_i, axis=1)

    @pl.when(j == pl.num_programs(0) - 1)
    def _write():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = jnp.where(best_i[:] == BIG_ID, 0, best_i[:])


def _topk_kernel(valid_ref, q_ref, e_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, block_rows: int):
    j = pl.program_id(0)
    # (Q, D) x (D, B_N) on the MXU, fp32 accumulation.
    scores = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, B_N)
    _fold_and_finalize(j, scores, valid_ref, out_s_ref, out_i_ref, best_s, best_i, k=k, block_rows=block_rows)


def _topk_kernel_q8(
    valid_ref, q_ref, e_ref, scale_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, block_rows: int
):
    """int8-storage variant: dequantize the row block in VMEM (bf16) and
    apply the per-row scale to the score columns after the matmul —
    halves the index's HBM footprint and DMA traffic."""
    j = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:], e_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, B_N)
    scores = scores * scale_ref[:].reshape(1, block_rows)
    _fold_and_finalize(j, scores, valid_ref, out_s_ref, out_i_ref, best_s, best_i, k=k, block_rows=block_rows)


def _topk_kernel_q4(
    valid_ref, q_ref, e_ref, scale_ref, out_s_ref, out_i_ref, best_s, best_i, *, k: int, block_rows: int
):
    """int4-storage variant: rows are nibble-packed along D in a
    HALF-SPLIT layout (col d and D/2+d share a byte) — unpack is a
    column concat. 4× corpus per HBM byte, quarter the scan DMA.
    int32 bit-arithmetic (uint8 vector shifts don't lower in Mosaic)."""
    j = pl.program_id(0)
    p32 = e_ref[:].astype(jnp.int32)  # (B_N, D/2)
    lo = ((p32 & 0xF) - 8)
    hi = (((p32 >> 4) & 0xF) - 8)
    w = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # (B_N, D)
    scores = jax.lax.dot_general(
        q_ref[:], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale_ref[:].reshape(1, block_rows)
    _fold_and_finalize(j, scores, valid_ref, out_s_ref, out_i_ref, best_s, best_i, k=k, block_rows=block_rows)


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret", "int4"))
def fused_dot_topk(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    num_valid=None,
    block_rows: int = 4096,
    interpret: bool = False,
    scales: jax.Array | None = None,
    int4: bool = False,
):
    """Exact top-k inner-product search over one shard.

    Args:
      queries: (Q, D) float array.
      embeddings: (rows, D); rows should be a multiple of ``block_rows``
        for best pipelining (padded rows excluded via ``num_valid``).
      k: winners per query.
      num_valid: scalar int — rows beyond this score -inf (padding).
      scales: (rows, 1) f32 per-row dequantization scales; when given,
        ``embeddings`` is int8 storage (2× HBM capacity, half the DMA) —
        or half-split int4 nibbles (4×/quarter) when ``int4=True``.
    Returns (scores (Q, k) f32, local row ids (Q, k) i32).
    """
    nq, d = queries.shape
    rows = embeddings.shape[0]
    block_rows = min(block_rows, _round_up(rows, 8))
    grid = pl.cdiv(rows, block_rows)
    if num_valid is None:
        num_valid = rows
    num_valid = jnp.asarray(num_valid, jnp.int32).reshape((1,))

    int8_mode = scales is not None
    e_cols = d // 2 if int4 else d
    in_specs = [
        pl.BlockSpec((nq, d), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, e_cols), lambda j, *_: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [num_valid, queries, embeddings]
    if int8_mode:
        base = _topk_kernel_q4 if int4 else _topk_kernel_q8
        kernel = functools.partial(base, k=k, block_rows=block_rows)
        in_specs.append(
            pl.BlockSpec((block_rows, 1), lambda j, *_: (j, 0), memory_space=pltpu.VMEM)
        )
        operands.append(scales)
    else:
        kernel = functools.partial(_topk_kernel, k=k, block_rows=block_rows)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((nq, k), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, k), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nq, k), jnp.float32),
                pltpu.VMEM((nq, k), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        # Larger row blocks amortize the per-block fold; raise the scoped
        # VMEM ceiling so 4096-row bf16 blocks double-buffer (measured
        # fastest; the 16 MB default OOMs above 2048).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return out_s, out_i
