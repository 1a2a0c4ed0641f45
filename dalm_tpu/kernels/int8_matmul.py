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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rowquant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row (last-axis) int8: ``x ~= q * scale``.

    Returns (q int8 ``x.shape``, scale f32 ``x.shape[:-1] + (1,)``).
    All-zero rows get scale 1.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


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
