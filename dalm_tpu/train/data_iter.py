"""Host-side batch iteration feeding jitted device programs.

Replaces torch ``DataLoader(shuffle=True, default_collator)``
(`train_retriever_only.py:265-271`). Batches are plain dicts of numpy
arrays with static shapes; shuffling is seeded per epoch; the trailing
partial batch is kept by default (parity — torch keeps it too; it costs
exactly one extra XLA compile for the remainder shape).

``skip_first_batches`` twin supports the resume path
(`train_rage2e.py:423-427`).
"""

from __future__ import annotations

import logging
from typing import Iterator, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def epoch_batches(
    dataset,
    columns: Sequence[str],
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = False,
    skip_batches: int = 0,
    multiple_of: int = 1,
    process_shard: bool = False,
) -> Iterator[dict]:
    """``multiple_of``: every yielded batch size is a multiple of this (the
    mesh's data-shard count) — a trailing remainder smaller than it is
    dropped, with a warning logged here naming the row count. The
    reference's torch DataLoader keeps any remainder; under SPMD the
    batch axis must divide evenly.

    ``process_shard``: multi-host mode. Every process iterates the same
    seeded global order and yields only its own contiguous row slice of
    each global batch (``core.multihost.host_batch_slice``); the caller
    assembles the global array with
    ``jax.make_array_from_process_local_data``. Batch *bookkeeping*
    (``skip_batches``, step counts) stays in global-batch units, so
    resume and max-steps logic is host-count independent.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    table = {c: np.asarray(dataset[c]) for c in columns}
    num_batches = n // batch_size if drop_last else -(-n // batch_size)
    local = None
    if process_shard:
        import math

        import jax

        from dalm_tpu.core.multihost import host_batch_slice

        # every yielded batch must split evenly across processes too, or
        # `make_array_from_process_local_data` would see ragged shards
        multiple_of = math.lcm(multiple_of, jax.process_count())
        local = host_batch_slice(batch_size)
    for b in range(num_batches):
        if b < skip_batches:
            continue
        idx = order[b * batch_size : (b + 1) * batch_size]
        if multiple_of > 1 and len(idx) % multiple_of:
            dropped = len(idx) % multiple_of
            idx = idx[: len(idx) - dropped]
            logger.warning(
                "dropping %d trailing row(s): partial batch of %d is not a "
                "multiple of the %d data shards (the reference's torch "
                "DataLoader would keep them)",
                dropped, dropped + len(idx), multiple_of,
            )
            if len(idx) == 0:
                continue
        if local is not None:
            if len(idx) < batch_size:
                # partial global batch: re-slice for the smaller size so
                # every host still gets an equal contiguous share (the
                # lcm(multiple_of, process_count) truncation above
                # guarantees it divides evenly)
                idx = idx[host_batch_slice(len(idx))]
            else:
                idx = idx[local]
        yield {c: table[c][idx] for c in columns}


def num_batches_per_epoch(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)


def pad_to_batch(batch: dict, batch_size: int) -> tuple[dict, int]:
    """Pad a partial trailing batch up to ``batch_size`` rows.

    Returns (padded_batch, real_rows). Used when static batch shapes are
    preferred over a remainder recompile (e.g. eval embedding sweeps).
    """
    any_col = next(iter(batch.values()))
    real = len(any_col)
    if real == batch_size:
        return batch, real
    pad = batch_size - real
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        pad_block = np.repeat(v[-1:], pad, axis=0)
        out[k] = np.concatenate([v, pad_block], axis=0)
    return out, real
