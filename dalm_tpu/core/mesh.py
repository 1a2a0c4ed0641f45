"""Device mesh and sharding rules.

The reference is data-parallel only (HF Accelerate DDP,
`train_rage2e.py:416-418`). Here parallelism is declarative: one global
`Mesh` with named axes and logical-axis rules consumed by every jitted
program. The default 2-D mesh is `(data, model)`:

- ``data``  — batch sharding (DP). Gradients are reduced by XLA with a
  ``psum`` over this axis (the DDP all-reduce equivalent, but fused into
  the backward by GSPMD).
- ``model`` — tensor-parallel sharding of attention heads / MLP / vocab
  for generators too big for one chip's HBM.

The retrieval index shards its passage axis over *all* devices
(``("data", "model")`` flattened) so the full mesh's HBM holds the index.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Logical axis names used in nn.with_logical_partitioning throughout models/.
LOGICAL_RULES_TP = (
    ("batch", DATA_AXIS),
    ("seq", None),
    ("embed", None),
    ("heads", MODEL_AXIS),
    ("kv", None),
    ("mlp", MODEL_AXIS),
    ("vocab", MODEL_AXIS),
    ("passages", (DATA_AXIS, MODEL_AXIS)),
    # MoE (models/moe.py): experts shard over the model axis (expert
    # parallelism — each TP group member holds E/model experts; GSPMD
    # inserts the dispatch/combine collectives). Within-expert dims stay
    # unsharded: EP, not TP-within-expert, is the right cut for
    # many-small-expert models (Qwen3-MoE's 128×768).
    ("expert", MODEL_AXIS),
    ("moe_mlp", None),
)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Shape of the global device mesh.

    ``data * model`` must equal the number of participating devices. With
    ``data=None`` the data axis absorbs all remaining devices.
    """

    data: Optional[int] = None
    model: int = 1


def make_mesh(config: MeshConfig | None = None, devices: Sequence[Any] | None = None) -> Mesh:
    """Build the global 2-D ``(data, model)`` mesh.

    On a multi-host TPU slice ``jax.devices()`` returns the global device
    set; the mesh therefore spans ICI within a slice and DCN across
    slices automatically (device order from jax is ICI-contiguous).
    """
    config = config or MeshConfig()
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    model = config.model
    data = config.data if config.data is not None else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devs).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def logical_axis_rules(tensor_parallel: bool = True):
    """Rules mapping logical axis names to mesh axes (flax linen format)."""
    if tensor_parallel:
        return LOGICAL_RULES_TP
    return tuple((name, DATA_AXIS if name == "batch" else None) for name, _ in LOGICAL_RULES_TP)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Sharding for a batch-leading array: batch over ``data``, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def put_batch(batch: Mapping[str, Any], mesh: Mesh, dtype=None) -> dict:
    """Device-put a dict of host arrays with the batch axis over ``data``.

    Single-process: one ``device_put`` call for the whole pytree (on
    latency-bound transports — tunneled PJRT — per-column puts cost a
    round trip each). Multi-process (pod): ``batch`` holds only this
    host's rows (from ``epoch_batches(process_shard=True)``) and the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — the DDP scale-out twin
    of the reference's per-rank DataLoader shard
    (`train_rage2e.py:416-418`), but over DCN+ICI instead of NCCL.
    """
    import numpy as np

    arrays = {}
    shardings = {}
    for k, v in batch.items():
        arr = np.asarray(v, dtype if dtype is not None else None)
        arrays[k] = arr
        shardings[k] = batch_sharding(mesh, arr.ndim)
    return put_sharded(arrays, shardings)


def put_sharded(arrays: Mapping[str, Any], shardings: Mapping[str, NamedSharding]) -> dict:
    """Place host arrays under the given shardings, multi-host aware.

    Single-process → one ``device_put``. Multi-process → each host
    contributes its local rows via
    ``jax.make_array_from_process_local_data`` (the arrays passed in are
    per-process local data; dims this process fully owns are global).
    """
    if jax.process_count() > 1:
        import numpy as np

        return {
            k: jax.make_array_from_process_local_data(shardings[k], np.asarray(arrays[k]))
            for k in arrays
        }
    return jax.device_put(dict(arrays), dict(shardings))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def index_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Sharding for the passage index: rows over every mesh axis (max HBM)."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), *([None] * (ndim - 1))))


def shard_params(params: Any, mesh: Mesh, rules: Sequence[tuple] | None = None) -> Any:
    """Apply logical-axis metadata → NamedSharding over the param pytree.

    Params without logical metadata (plain arrays) are replicated.
    """
    import flax.linen as nn
    from flax.core import meta

    rules = rules or logical_axis_rules()

    def to_sharding(x):
        if isinstance(x, meta.Partitioned):
            spec = nn.logical_to_mesh_axes(x.names, rules=rules)
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    shardings = jax.tree.map(
        to_sharding, params, is_leaf=lambda x: isinstance(x, meta.Partitioned)
    )
    return shardings


def unbox(params: Any) -> Any:
    """Strip flax Partitioned metadata, returning raw arrays."""
    from flax.core import meta

    return jax.tree.map(
        lambda x: x.value if isinstance(x, meta.Partitioned) else x,
        params,
        is_leaf=lambda x: isinstance(x, meta.Partitioned),
    )


def device_put_params(params: Any, mesh: Mesh, rules: Sequence[tuple] | None = None) -> Any:
    """Place an (unboxed) param tree on the mesh per its logical metadata."""
    shardings = shard_params(params, mesh, rules)
    from flax.core import meta

    def put(x, s):
        v = x.value if isinstance(x, meta.Partitioned) else x
        return jax.device_put(v, s)

    return jax.tree.map(
        put, params, shardings, is_leaf=lambda x: isinstance(x, meta.Partitioned)
    )
