"""Core runtime substrate: mesh/topology, sharding rules, dtype policy, comms.

Replaces the reference's L0 torch/Accelerate substrate
(`/root/reference/dalm/*`: `Accelerator(...)`, NCCL DDP) with a single
`jax.sharding.Mesh` + GSPMD sharding and XLA collectives over ICI/DCN.
"""

from dalm_tpu.core.dtypes import Policy, DEFAULT_POLICY
from dalm_tpu.core.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    logical_axis_rules,
    shard_params,
)

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "logical_axis_rules",
    "shard_params",
]
