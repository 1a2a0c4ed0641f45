"""Multi-host (pod-scale) runtime helpers.

One v5p/v5e *slice* spans multiple hosts; ``jax.devices()`` is global,
every host runs the same SPMD program, and each host feeds its local
shard of the batch. These helpers wrap that contract:

- :func:`initialize_distributed` — `jax.distributed.initialize` guard
  (no-op single-host, idempotent);
- :func:`host_batch_slice` — which rows of the global batch this host
  materializes;
- :func:`global_batch_from_local` — assemble a global jax.Array from
  per-host local rows (`jax.make_array_from_process_local_data`);
- :func:`is_main_process` — gate host-side side effects (checkpoint
  writes, metric streams) the way the reference gated on
  ``accelerator.is_main_process`` (`train_rage2e.py:291-295`).

Single-host semantics are identity, so every trainer works unchanged.
All three trainers call ``initialize_distributed()`` before building
their mesh and switch the batch iterator to ``process_shard=True`` when
``jax.process_count() > 1``; see ``docs/multihost.md`` for the pod
runbook and ``tests/test_multihost.py`` for the real two-process
validation run.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent `jax.distributed.initialize`; no-op when single-host
    env vars/args indicate nothing to join."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        import os

        if not os.environ.get("JAX_COORDINATOR_ADDRESS") and not os.environ.get("COORDINATOR_ADDRESS"):
            logger.info("single-process run; jax.distributed not initialized")
            _initialized = True
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch this host is responsible for loading."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_local(local_rows: np.ndarray, mesh, spec) -> jax.Array:
    """Per-host local rows → one global sharded jax.Array."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_rows)
    )


def fetch_global(tree):
    """Fetch a (possibly sharded) array pytree fully to this host.

    Single-process this is ``jax.device_get``. Multi-process, arrays may
    have non-addressable shards on other hosts, so a collective
    ``process_allgather`` assembles the full value on every host first
    (all processes MUST call this together — it is a collective). Used
    by the trainers' final ``save_pretrained`` paths, where the write
    itself is then gated on :func:`is_main_process`, mirroring the
    reference's ``accelerator.is_main_process`` +
    ``unwrap_model().save_pretrained`` (`train_rage2e.py:508-524`).
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))
