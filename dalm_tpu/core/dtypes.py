"""Mixed-precision policy.

The reference gets bf16 compute via bitsandbytes' ``bnb_4bit_compute_dtype``
(`models/retriever_only_base_model.py:85-91`) and torch autocast in eval
(`eval/utils.py:240-251`). On TPU the native answer is: params in fp32 (or
bf16), compute in bf16 on the MXU, reductions/losses in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def parse_dtype(name: str) -> jnp.dtype:
    """Parse a dtype flag (reference `cli.py:28-32` TorchDtype enum twin)."""
    table = {
        "float16": jnp.float16,
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "fp16": jnp.float16,
        "bf16": jnp.bfloat16,
        "fp32": jnp.float32,
    }
    if name not in table:
        raise ValueError(f"unknown dtype {name!r}; expected one of {sorted(table)}")
    return table[name]
