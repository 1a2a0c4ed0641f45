"""Pallas TPU kernels for the retrieval hot path.

The rest of the framework runs on XLA-fused jnp; kernels live here when
streaming/blocking behavior XLA won't produce is needed — chiefly the
index search: fused dot-product + running top-k that never materializes
the (Q, N) score matrix in HBM.
"""

from dalm_tpu.kernels.topk import fused_dot_topk

__all__ = ["fused_dot_topk"]
