"""Thin collective wrappers over XLA.

The reference's explicit collectives are `accelerator.reduce(loss, "sum")`
(`train_rage2e.py:469`) and barriers (`wait_for_everyone`); gradient
all-reduce is implicit in DDP. Under GSPMD most of this disappears — XLA
inserts the collectives implied by shardings. These wrappers exist for the
places we *want* explicit collectives: loss metrics inside shard_map'ed
code, and the distributed index's winner merge.
"""

from __future__ import annotations

import jax


def psum(x, axis_name):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name, axis: int = 0, tiled: bool = True):
    """Gather shard-local arrays along ``axis`` (index winner merge)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute_ring(x, axis_name, shift: int = 1):
    """Rotate shards around the mesh axis ring (future ring attention)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def global_batch_size(local_batch: int, mesh=None, axis: str = "data") -> int:
    """Total batch across the data axis (reference `train_rage2e.py:370`)."""
    if mesh is None:
        return local_batch * jax.device_count()
    return local_batch * mesh.shape[axis]
