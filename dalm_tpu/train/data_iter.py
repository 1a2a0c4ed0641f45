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

from typing import Iterator, Optional, Sequence

import numpy as np


def epoch_batches(
    dataset,
    columns: Sequence[str],
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = False,
    skip_batches: int = 0,
    multiple_of: int = 1,
) -> Iterator[dict]:
    """``multiple_of``: every yielded batch size is a multiple of this (the
    mesh's data-shard count) — a trailing remainder smaller than it is
    dropped (logged by the caller). The reference's torch DataLoader keeps
    any remainder; under SPMD the batch axis must divide evenly."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    table = {c: np.asarray(dataset[c]) for c in columns}
    num_batches = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(num_batches):
        if b < skip_batches:
            continue
        idx = order[b * batch_size : (b + 1) * batch_size]
        if multiple_of > 1 and len(idx) % multiple_of:
            idx = idx[: (len(idx) // multiple_of) * multiple_of]
            if len(idx) == 0:
                continue
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
