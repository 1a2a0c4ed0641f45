"""LoRA as pure parameter-tree transforms.

Twin of the reference's PEFT usage
(`/root/reference/dalm/models/retriever_only_base_model.py:93-110`,
`rag_e2e_base_model.py:108-160`): r=8, alpha=16, dropout=0.05, targets
``["key","query","value"]`` for encoders and ``["q_proj","v_proj"]`` for
causal LMs; generator SFT uses r=256/alpha=512
(`generator_only/trainer.py:207-215`).

JAX-native shape — no module surgery: LoRA params live in their own small
pytree; each train step computes ``W_eff = W + (alpha/r) * A @ B`` for the
matched kernels and runs the unchanged forward. ``jax.value_and_grad``
over only the LoRA tree gives adapter-only training; the base tree is
frozen (and may be quantized / bf16). XLA fuses the rank-r update into the
consuming matmul — there is no per-layer Python overhead at run time.

Merged-kernel notes:
- ``merge_lora`` is exactly PEFT's ``merge_and_unload`` semantics
  (`retriever_only_base_model.py:77-83`) — used before eval.
- lora_dropout regularizes the adapter input in torch-PEFT; in the merged
  formulation we apply an equivalent scale-preserving dropout to A during
  training (documented deviation: dropout on the low-rank factor rather
  than per-token activations).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ENCODER_TARGETS = ("query", "key", "value")
CAUSAL_LM_TARGETS = ("q_proj", "v_proj")


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    rank: int = 8
    alpha: float = 16.0
    dropout: float = 0.05
    target_modules: Tuple[str, ...] = ENCODER_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    @staticmethod
    def for_encoder(rank: int = 8, alpha: float = 16.0) -> "LoraSpec":
        return LoraSpec(rank=rank, alpha=alpha, target_modules=ENCODER_TARGETS)

    @staticmethod
    def for_causal_lm(rank: int = 8, alpha: float = 16.0) -> "LoraSpec":
        return LoraSpec(rank=rank, alpha=alpha, target_modules=CAUSAL_LM_TARGETS)

    @staticmethod
    def for_sft(rank: int = 256, alpha: float = 512.0) -> "LoraSpec":
        """Generator-only SFT defaults (`generator_only/trainer.py:207-215`)."""
        return LoraSpec(rank=rank, alpha=alpha, target_modules=CAUSAL_LM_TARGETS)


def _target_kernel_paths(params: Any, spec: LoraSpec) -> list[tuple]:
    """Paths of Dense kernels whose parent module name matches a target."""
    paths = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", None) for p in path]
        if keys and keys[-1] == "kernel" and len(keys) >= 2:
            module_name = keys[-2]
            if any(t == module_name for t in spec.target_modules) and hasattr(leaf, "ndim") and leaf.ndim == 2:
                paths.append(tuple(k for k in keys))
    return paths


def init_lora_params(rng: jax.Array, params: Any, spec: LoraSpec) -> dict:
    """A ~ N(0, 0.02), B = 0 (so the initial delta is zero, PEFT-style)."""
    lora = {}
    for path in _target_kernel_paths(params, spec):
        kernel = _get_path(params, path)
        d_in, d_out = kernel.shape
        rng, a_rng = jax.random.split(rng)
        lora["/".join(path)] = {
            "lora_a": jax.random.normal(a_rng, (d_in, spec.rank), jnp.float32) * 0.02,
            "lora_b": jnp.zeros((spec.rank, d_out), jnp.float32),
        }
    if not lora:
        raise ValueError(
            f"no kernels matched LoRA targets {spec.target_modules}; "
            "check module naming"
        )
    return lora


def merge_lora(
    params: Any,
    lora_params: dict,
    spec: LoraSpec,
    dropout_rng: Optional[jax.Array] = None,
) -> Any:
    """``W + scaling * A @ B`` on every adapted kernel (PEFT merge math)."""
    merged = params
    for path_str, ab in lora_params.items():
        path = tuple(path_str.split("/"))
        a = ab["lora_a"]
        if dropout_rng is not None and spec.dropout > 0:
            import zlib

            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, zlib.crc32(path_str.encode()) % (2**31)),
                1.0 - spec.dropout,
                a.shape,
            )
            a = jnp.where(keep, a / (1.0 - spec.dropout), 0.0)
        delta = (a @ ab["lora_b"]) * spec.scaling
        kernel = _get_path(merged, path)
        merged = _set_path(merged, path, kernel + delta.astype(kernel.dtype))
    return merged


def _get_path(tree: Any, path: tuple):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set_path(tree: Any, path: tuple, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


# ---- adapter persistence -------------------------------------------------

def save_adapter(output_dir: str, lora_params: dict, spec: LoraSpec) -> None:
    from flax import serialization

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "r": spec.rank,
                "lora_alpha": spec.alpha,
                "lora_dropout": spec.dropout,
                "target_modules": list(spec.target_modules),
            },
            f,
            indent=2,
        )
    with open(os.path.join(output_dir, "adapter_params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.tree.map(np.asarray, lora_params)))


def load_adapter(path: str) -> tuple[dict, LoraSpec]:
    from flax import serialization

    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    spec = LoraSpec(
        rank=cfg["r"],
        alpha=cfg["lora_alpha"],
        dropout=cfg.get("lora_dropout", 0.0),
        target_modules=tuple(cfg["target_modules"]),
    )
    with open(os.path.join(path, "adapter_params.msgpack"), "rb") as f:
        lora_params = serialization.msgpack_restore(f.read())
    return lora_params, spec
