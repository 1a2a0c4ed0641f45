"""FlexLinear: a Dense layer with optional packed (QLoRA) weight storage.

Motivation (RESULTS.md 7B finding): the merge-based LoRA formulation
materializes the full effective weight set every step — fine ≤1B, fatal
for 7B on one 16 GB chip. FlexLinear keeps the classic
``params: {kernel, bias}`` layout at init/checkpoint time, but at apply
time it first checks two auxiliary collections:

- ``quant``:  ``{q: int8 (in, out), scale: f32 (1, out)}`` — the frozen
  base kernel, dequantized *inside this layer's matmul* (one transient
  layer-sized buffer, fused by XLA);
- ``lora``:   ``{a: (in, r), b: (r, out)}`` — trainable low-rank factors
  (α/r pre-folded into ``a``), applied as ``(x @ a) @ b`` — never
  forming the (in, out) delta.

So ``y = x @ dequant(W) + (x @ a) @ b [+ bias]`` with per-layer peak
memory, and gradients flow only into the ``lora`` collection when that
is the only differentiable input. Packing a param tree into this layout
is `dalm_tpu.models.qlora.pack_qlora`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class FlexLinear(nn.Module):
    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_axes: Tuple = ("embed", "mlp")
    bias_axes: Tuple = ("mlp",)
    # "none" (dequant to bf16, default) | "fwd" | "all": run the frozen
    # int8 base matmul on the MXU int8 path (kernels/int8_matmul.py),
    # with "all" also quantizing the backward dx matmul. Only takes
    # effect when the layer actually has int8 `quant` storage.
    int8_compute: str = "none"

    @nn.compact
    def __call__(self, x):
        if self.has_variable("quant", "q4"):
            # int4 serving storage (two nibbles/byte, per-group scales).
            # XLA does NOT fuse the nibble dequant into the matmul (it
            # materializes the full bf16 weights — measured 6.6x slower
            # at 7B decode); the Pallas kernel dequantizes per tile in
            # VMEM so HBM sees only packed bytes. int8_compute does not
            # apply (no int4 MXU path).
            from dalm_tpu.kernels.int4_matmul import int4_matmul

            y = int4_matmul(
                x,
                self.get_variable("quant", "q4"),
                self.get_variable("quant", "scale4"),
                False,
                # "nf4" marker leaf => NormalFloat4 codebook dequant
                # (bnb-parity quality tier; models/quant.py)
                self.has_variable("quant", "nf4"),
                # "pcol" marker => per-column scales, full-depth int8
                # MXU dots (kernels/int4_matmul.py _int4_kernel_pcol)
                self.has_variable("quant", "pcol"),
            )
            if self.has_variable("lora", "a"):
                a = self.get_variable("lora", "a").astype(self.dtype)
                b = self.get_variable("lora", "b").astype(self.dtype)
                y = y + (x @ a) @ b
            if self.use_bias and self.has_variable("quant", "bias"):
                y = y + self.get_variable("quant", "bias").astype(self.dtype)
            return y
        quantized = self.has_variable("quant", "q")
        kernel = None
        if quantized and self.int8_compute != "none":
            from dalm_tpu.kernels.int8_matmul import int8_matmul, int8_matmul_cal

            q = self.get_variable("quant", "q")
            scale = self.get_variable("quant", "scale")
            # Calibration hook: a no-op unless the caller applies with
            # mutable=["intermediates"] (the a8_calibrate_every refresh
            # pass, train/rag_e2e.py). XLA fuses the max-reduce into x's
            # producer, so leaving it unconditional costs nothing.
            self.sow(
                "intermediates", "a_amax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((), jnp.float32),
            )
            if self.has_variable("quant", "a_scale"):
                # Calibrated per-tensor activation scale: quantize is
                # pure elementwise (no absmax pass) — +7.3% measured on
                # the flagship step (RESULTS.md static-scale probe).
                if self.int8_compute == "all" and self.has_variable("quant", "dy_scale"):
                    # Calibrated BACKWARD dy scale too (delayed scaling,
                    # refreshed by the a8_dy_calibrate probe step): the
                    # bwd rowquant absmax pass vanishes as well.
                    from dalm_tpu.kernels.int8_matmul import int8_matmul_dycal

                    y = int8_matmul_dycal(
                        x, q, scale, self.get_variable("quant", "a_scale"),
                        self.get_variable("quant", "dy_scale"), True,
                    )
                else:
                    y = int8_matmul_cal(
                        x, q, scale, self.get_variable("quant", "a_scale"),
                        self.int8_compute == "all",
                    )
            else:
                y = int8_matmul(x, q, scale, self.int8_compute == "all")
        elif quantized:
            q = self.get_variable("quant", "q")
            scale = self.get_variable("quant", "scale")
            kernel = (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(self.dtype)
        elif self.has_variable("quant", "w"):
            # packed-but-unquantized frozen base (bf16 storage)
            kernel = self.get_variable("quant", "w").astype(self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(nn.initializers.normal(0.02), self.kernel_axes),
                (x.shape[-1], self.features),
                self.param_dtype,
            ).astype(self.dtype)

        if kernel is not None:
            y = x @ kernel

        if self.has_variable("lora", "a"):
            a = self.get_variable("lora", "a").astype(self.dtype)
            b = self.get_variable("lora", "b").astype(self.dtype)
            y = y + (x @ a) @ b

        if self.use_bias:
            if self.has_variable("quant", "bias"):
                bias = self.get_variable("quant", "bias").astype(self.dtype)
            else:
                bias = self.param(
                    "bias",
                    nn.with_logical_partitioning(nn.initializers.zeros_init(), self.bias_axes),
                    (self.features,),
                    self.param_dtype,
                ).astype(self.dtype)
            y = y + bias
        return y
