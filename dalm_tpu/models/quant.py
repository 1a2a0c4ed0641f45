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

int4 (two nibbles/byte) is a planned extension; v5e-class HBM makes int8
sufficient for 7B + LoRA at the reference's batch sizes.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp

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
