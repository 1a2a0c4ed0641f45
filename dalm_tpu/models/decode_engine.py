"""Continuous-batching greedy decode engine (serving).

The batch path in `models/generate.py` decodes a fixed batch in
lockstep: every prompt pays ``max_new_tokens`` steps even if its answer
ended at token 3, and no new request can start until the whole batch
finishes. This engine is the production-shaped alternative: a fixed
pool of ``num_slots`` decode slots over one preallocated KV cache;
finished slots are recycled to pending requests mid-flight, so
short answers stop paying for long ones and the MXU stays busy at any
request-length mix.

Static-shape design (everything jit-compiled exactly twice — one
prefill program, one decode-chunk program):

- prompts are LEFT-padded to a fixed ``max_prompt_len`` P, so after
  prefill every slot's write head starts at cache position P;
- per-slot write positions (``cache_index`` as a (B,) vector — decoder
  vmaps its cache writes) advance independently as slots are admitted
  at different times;
- decode runs in chunks of ``decode_chunk`` tokens per dispatch
  (``lax.scan``); the host reads the chunk back, harvests finished
  slots (EOS or budget), and admits pending requests into freed slots
  via batch-1 prefill + a cache row insert;
- a freed slot's stale K/V needs no cleanup: the causal slot mask
  (``key_slot <= q_slot``) hides every position at or beyond the new
  request's write head, and each decode step overwrites its own slot
  position before attending.

The reference has no serving path at all (SURVEY §3.4 — retrieval +
generation live in its eval scripts, `eval_rag.py:127-141`); this is a
beyond-reference subsystem consumed by `serve.RagPipeline`.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.decoder import Decoder


class DecodeEngine:
    def __init__(
        self,
        decoder: Decoder,
        params,
        num_slots: int,
        max_prompt_len: int,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        decode_chunk: int = 8,
    ):
        self.decoder = decoder
        self.params = params
        self.num_slots = num_slots
        self.P = max_prompt_len
        self.max_new = max_new_tokens
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.chunk = min(decode_chunk, max_new_tokens)
        self.L = max_prompt_len + max_new_tokens

        B, P, L = num_slots, self.P, self.L

        def prefill(params, ids, mask):
            """(1, P) prompt -> (first_tok (1,), real_len (1,), cache rows)."""
            cache = decoder.init_kv_cache(1, L)
            positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, min=0)
            slot_mask = jnp.concatenate(
                [mask, jnp.ones((1, L - P), mask.dtype)], axis=1
            )
            logits, cache = decoder.apply(
                {"params": params}, ids, slot_mask,
                positions=positions, kv_cache=cache, cache_index=0,
            )
            return jnp.argmax(logits[:, -1, :], axis=-1), mask.sum(axis=1), cache

        def insert(big_cache, row_cache, slot):
            """Write a prefilled (1, L, ...) cache into batch row ``slot``."""
            return jax.tree.map(
                lambda big, row: jax.lax.dynamic_update_slice(
                    big, row.astype(big.dtype), (slot, 0, 0, 0)
                ),
                big_cache, row_cache,
            )

        def decode_chunk(params, cache, tok, pos, write_pos, slot_mask, active):
            """Advance every slot ``self.chunk`` tokens; inactive slots idle
            in place (their writes land on their own stale positions and
            their outputs are discarded host-side)."""
            act = active.astype(jnp.int32)

            def step(carry, _):
                cache, tok, pos, write_pos = carry
                logits, cache = decoder.apply(
                    {"params": params}, tok[:, None], slot_mask,
                    positions=pos[:, None], kv_cache=cache, cache_index=write_pos,
                )
                nxt = jnp.argmax(logits[:, 0, :], axis=-1)
                nxt = jnp.where(active, nxt, jnp.full_like(nxt, pad_token_id))
                return (cache, nxt, pos + act, write_pos + act), nxt

            (cache, tok, pos, write_pos), toks = jax.lax.scan(
                step, (cache, tok, pos, write_pos), None, length=self.chunk
            )
            return cache, tok, pos, write_pos, jnp.moveaxis(toks, 0, 1)  # (B, chunk)

        self._prefill = jax.jit(prefill)
        self._insert = jax.jit(insert)
        self._decode = jax.jit(decode_chunk)

        self.cache = decoder.init_kv_cache(B, L)
        self.tok = jnp.zeros((B,), jnp.int32)
        self.pos = jnp.zeros((B,), jnp.int32)
        self.write_pos = jnp.full((B,), P, jnp.int32)
        self.slot_mask = jnp.zeros((B, L), jnp.int32)

    # ---- host-side scheduling -------------------------------------------
    def generate(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        budgets: Optional[Sequence[int]] = None,
    ) -> List[List[int]]:
        """Decode all prompts with slot recycling.

        ``input_ids``/``attention_mask``: (N, P) left-padded; N may exceed
        ``num_slots`` — that is the point. ``budgets`` (optional) caps each
        request's new tokens individually (≤ ``max_new_tokens``); a slot
        whose request exhausts its budget is recycled immediately.
        Returns per-prompt token lists (EOS excluded), in input order.
        """
        N = input_ids.shape[0]
        assert input_ids.shape[1] == self.P, (
            f"prompts must be left-padded to max_prompt_len={self.P}"
        )
        caps = (
            np.full(N, self.max_new, np.int64)
            if budgets is None
            else np.minimum(np.asarray(budgets, np.int64), self.max_new)
        )
        pending = deque(range(N))
        results: List[Optional[List[int]]] = [None] * N
        slot_req = np.full(self.num_slots, -1, np.int64)  # -1 = free
        slot_toks: List[List[int]] = [[] for _ in range(self.num_slots)]

        def finish(slot):
            results[slot_req[slot]] = slot_toks[slot]
            slot_req[slot] = -1
            slot_toks[slot] = []

        def admit():
            while pending:
                free = np.flatnonzero(slot_req == -1)
                if len(free) == 0:
                    return
                slot = int(free[0])
                req = pending.popleft()
                ids = jnp.asarray(input_ids[req : req + 1], jnp.int32)
                mask = jnp.asarray(attention_mask[req : req + 1], jnp.int32)
                first_tok, real_len, row_cache = self._prefill(self.params, ids, mask)
                self.cache = self._insert(self.cache, row_cache, int(slot))
                self.tok = self.tok.at[slot].set(first_tok[0])
                self.pos = self.pos.at[slot].set(real_len[0])
                self.write_pos = self.write_pos.at[slot].set(self.P)
                full_mask = np.concatenate(
                    [np.asarray(mask[0]), np.ones(self.L - self.P, np.int32)]
                )
                self.slot_mask = self.slot_mask.at[slot].set(jnp.asarray(full_mask))
                slot_req[slot] = req
                first = int(first_tok[0])
                if caps[req] <= 0 or (self.eos is not None and first == self.eos):
                    finish(slot)
                else:
                    slot_toks[slot].append(first)
                    if len(slot_toks[slot]) >= caps[req]:
                        finish(slot)

        while True:
            admit()  # re-run after every harvest: instant finishes (EOS
            # on the first token, max_new==1) free their slot inside
            # admit itself, so pending work may remain with no slot active
            if not (slot_req >= 0).any():
                break
            active = jnp.asarray(slot_req >= 0)
            self.cache, self.tok, self.pos, self.write_pos, chunk = self._decode(
                self.params, self.cache, self.tok, self.pos, self.write_pos,
                self.slot_mask, active,
            )
            chunk = np.asarray(chunk)  # (B, chunk) — the per-chunk host sync
            for slot in np.flatnonzero(slot_req >= 0):
                for t in chunk[slot]:
                    t = int(t)
                    if self.eos is not None and t == self.eos:
                        finish(slot)
                        break
                    slot_toks[slot].append(t)
                    if len(slot_toks[slot]) >= caps[slot_req[slot]]:
                        finish(slot)
                        break
        return results  # type: ignore[return-value]
