"""Async on-device index refresh — overlapped re-embedding.

North-star subsystem (BASELINE.json): after retriever updates, the
passage index must NOT be rebuilt offline (the reference re-embeds 200k
passages in a ~1 h standalone pass, `experiments/.../README.md`).
Instead, passage re-embedding runs as small jitted slices interleaved
between training steps on the same mesh:

- the index keeps an ACTIVE embedding buffer (serving searches) and a
  STAGING buffer (being refreshed) — classic double buffering;
- ``tick(params)`` dispatches one slice: embed ``slice_size`` passages
  with the *current* retriever params and write them into staging via a
  donated ``dynamic_update_slice`` — a few ms of device work that XLA
  queues behind the in-flight train step (dispatch is async; the host
  never blocks);
- when the cursor wraps, staging atomically becomes active
  (``index.embeddings`` swap) and the version counter bumps.

Consistency model: a search between swaps sees the *previous* complete
embedding space — never a half-refreshed mix. The swap is a host-side
pointer exchange of on-device buffers (no copy).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dalm_tpu.index.dense import INDEX_AXES, ShardedDenseIndex

logger = logging.getLogger(__name__)


class AsyncIndexRefresher:
    def __init__(
        self,
        index: ShardedDenseIndex,
        embed_fn: Callable,
        passage_input_ids: np.ndarray,
        passage_attention_mask: np.ndarray,
        slice_size: int = 256,
    ):
        """``embed_fn(params, ids, mask) -> (slice, D)`` must be jitted.

        ``slice_size`` passages re-embed per tick; a full sweep takes
        ``ceil(N / slice_size)`` ticks.
        """
        if index.scales is not None or index.int4:
            raise ValueError(
                "AsyncIndexRefresher updates full-precision rows in place; "
                "quantized (int8/int4) indexes are rebuilt instead — "
                "ShardedDenseIndex.build(quantize=...) with fresh embeddings "
                "(RagPipeline.refresh does this automatically)"
            )
        self.index = index
        self.embed_fn = embed_fn
        self.ids = np.asarray(passage_input_ids, np.int32)
        self.mask = np.asarray(passage_attention_mask, np.int32)
        self.slice_size = slice_size
        self.num_passages = len(self.ids)
        self.cursor = 0
        self.version = 0
        self.sweeps_started = 0
        # Staging must be a DISTINCT buffer (ticks donate it; aliasing the
        # active buffer would delete what searches are reading).
        sharding = NamedSharding(index.mesh, P(INDEX_AXES, None))
        self._staging = jax.jit(jnp.copy, out_shardings=sharding)(index.embeddings)
        self._update = self._build_update()

    def _build_update(self):
        sharding = NamedSharding(self.index.mesh, P(INDEX_AXES, None))

        @partial(jax.jit, donate_argnums=(0,), out_shardings=sharding)
        def update(staging, new_embs, offset):
            return jax.lax.dynamic_update_slice(
                staging, new_embs.astype(staging.dtype), (offset, 0)
            )

        return update

    def tick(self, params) -> dict:
        """Dispatch one re-embedding slice. Returns progress stats."""
        start = self.cursor
        end = min(start + self.slice_size, self.num_passages)
        ids = self.ids[start:end]
        mask = self.mask[start:end]
        if end - start < self.slice_size:  # static shapes: pad the tail
            pad = self.slice_size - (end - start)
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])

        embs = self.embed_fn(params, jnp.asarray(ids), jnp.asarray(mask))
        embs = embs[: end - start] if end - start < self.slice_size else embs
        # Tail slices may be shorter than slice_size → separate compile,
        # but only once (the same tail shape recurs every sweep).
        self._staging = self._update(self._staging, embs, start)

        self.cursor = end
        swapped = False
        if self.cursor >= self.num_passages:
            # sweep complete: staging → active (pointer swap, no copy)
            old_active = self.index.embeddings
            self.index.embeddings = self._staging
            self._staging = old_active
            self.cursor = 0
            self.version += 1
            self.sweeps_started += 1
            swapped = True
        return {
            "cursor": self.cursor,
            "version": self.version,
            "progress": self.cursor / self.num_passages if self.num_passages else 1.0,
            "swapped": swapped,
        }

    def refresh_fully(self, params) -> int:
        """Blocking full sweep (offline-rebuild equivalent, for eval)."""
        start_version = self.version
        while self.version == start_version:
            self.tick(params)
        return self.version
