"""Streaming (online) serving over the continuous-batching engine.

`DecodeEngine.generate` drains a workload that is fully known upfront;
this module serves the production case the reference never had: requests
ARRIVE over time (SURVEY §3.4 — the reference's only generation surface
is an offline eval loop, `eval_rag.py:127-141`). A single scheduler
thread owns the engine and runs the same dispatch-lean scheduling rounds
as `DecodeEngine.generate` (decode chunk dispatched before the previous
chunk's readback blocks, batched single-program admission), but never
exits: new submissions from any thread join the pending queue and are
admitted into freed slots mid-flight.

Tokens stream out as they are produced: each :class:`StreamHandle`
carries a thread-safe token queue (consume with :meth:`StreamHandle.tokens`)
and a ``concurrent.futures.Future`` resolving to the full token list —
``asyncio.wrap_future(handle.future)`` makes it awaitable, so an asyncio
front-end needs no adapter code.

Usage::

    eng = DecodeEngine(decoder, params, num_slots=32, ...)
    with StreamingEngine(eng) as srv:
        h = srv.submit(prompt_ids, prompt_mask)        # returns immediately
        for tok in h.tokens():                          # streams as decoded
            ...
        full = h.result()                               # or block for all

Correctness invariant (tested): every request's tokens are EXACTLY the
lockstep greedy output for its prompt, regardless of arrival time, slot
assignment, or what else is in flight.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.decode_engine import DecodeEngine

_SENTINEL = object()


class StreamHandle:
    """One submitted request: stream tokens, or block for the result."""

    def __init__(self, budget: int):
        self.budget = budget
        self.future: Future = Future()
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._tokens: List[int] = []
        self._cancelled = threading.Event()
        # serving latency metrics, stamped by submit/scheduler (monotonic s)
        self.t_submit: Optional[float] = None
        self.t_first_token: Optional[float] = None
        self.t_done: Optional[float] = None
        # speculative serving only: verification rounds this request took
        # (tokens-per-round = len(result()) / spec_rounds; the draft
        # acceptance signal for tuning gamma)
        self.spec_rounds: int = 0

    # ---- consumer side ---------------------------------------------------
    def tokens(self) -> Iterator[int]:
        """Yield tokens as the scheduler produces them (blocking iterator)."""
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                return
            yield item

    def result(self, timeout: Optional[float] = None) -> List[int]:
        """Block until the request finishes; returns the full token list."""
        return self.future.result(timeout)

    def cancel(self) -> None:
        """Request cancellation. A request not yet admitted is dropped
        (future resolves to []); a running one stops at the next harvest
        with the tokens produced so far."""
        self._cancelled.set()

    # ---- scheduler side (single scheduler thread only) --------------------
    def _emit(self, tok: int) -> None:
        if self.t_first_token is None:
            self.t_first_token = time.monotonic()
        self._tokens.append(tok)
        self._queue.put(tok)

    def _finish(self) -> None:
        self.t_done = time.monotonic()
        if not self.future.done():
            self.future.set_result(self._tokens)
        self._queue.put(_SENTINEL)

    def _fail(self, exc: BaseException) -> None:
        if not self.future.done():
            self.future.set_exception(exc)
        self._queue.put(_SENTINEL)

    @property
    def done(self) -> bool:
        return self.future.done()


class StreamingEngine:
    """Thread-scheduled online server over one :class:`DecodeEngine`.

    The engine must not be used by anything else while the server runs
    (the scheduler owns ``engine.state``). ``submit`` is thread-safe.

    A ``speculative_gamma`` engine runs the host-draft verification
    rounds online (``_speculative_scheduler_loop``): each round the host
    drafts gamma prompt-lookup tokens per active slot from its own
    bookkeeping, the device verifies them in one forward, and 1..gamma+1
    tokens stream out per slot per round — with mid-flight admission and
    cancellation intact. Rounds are synchronous (no one-deep pipeline):
    drafts must reflect the device's true position, and the multi-token
    commit amortizes the RTT the pipeline existed to hide (same
    trade-off as ``DecodeEngine._generate_speculative``).
    """

    def __init__(self, engine: DecodeEngine, idle_poll_s: float = 0.02):
        self.engine = engine
        self._inbox: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._drain = True
        self._thread: Optional[threading.Thread] = None
        self._idle_poll = idle_poll_s
        self._crashed: Optional[BaseException] = None
        self._live_handles: List[StreamHandle] = []  # scheduler-thread-owned
        self._n_submitted = 0  # request index source (sampling keys)
        self._submit_lock = threading.Lock()

    # ---- lifecycle ---------------------------------------------------------
    def start(self) -> "StreamingEngine":
        if self._thread is not None:
            raise RuntimeError("StreamingEngine already started")
        self._thread = threading.Thread(target=self._run, daemon=True, name="decode-scheduler")
        self._thread.start()
        return self

    def stop(self, drain: bool = True, timeout: Optional[float] = None) -> None:
        """Stop the scheduler. ``drain=True`` finishes all accepted work
        first; ``drain=False`` cancels pending requests (futures resolve
        to their partial token lists)."""
        self._drain = drain
        self._stop.set()
        self._inbox.put(None)  # wake an idle scheduler
        if self._thread is not None:
            self._thread.join(timeout)
        with self._submit_lock:
            # sweep submissions that raced past the stop check before the
            # scheduler exited — their futures must not hang forever
            while True:
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[0]._finish()

    def __enter__(self) -> "StreamingEngine":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop(drain=True)

    # ---- submission ---------------------------------------------------------
    def submit(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        budget: Optional[int] = None,
    ) -> StreamHandle:
        """Enqueue one left-padded ``(P,)`` (or ``(1, P)``) prompt.

        Returns immediately; decode starts as soon as a slot frees."""
        if self._stop.is_set():
            raise RuntimeError("StreamingEngine is stopping")
        if self._crashed is not None:
            raise RuntimeError("scheduler crashed") from self._crashed
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        mask = np.asarray(attention_mask, np.int32).reshape(-1)
        P = self.engine.P
        assert ids.shape == (P,), f"prompt must be left-padded to max_prompt_len={P}"
        cap = self.engine.max_new if budget is None else min(int(budget), self.engine.max_new)
        handle = StreamHandle(cap)
        handle.t_submit = time.monotonic()
        with self._submit_lock:
            # lock covers BOTH the index assignment (unique per request —
            # sampling keys derive from it, a duplicate would correlate two
            # requests' samples) and the stop-check+enqueue (a submit racing
            # stop() must not land in a dead inbox; stop() sweeps leftovers
            # under the same lock after joining the scheduler).
            if self._stop.is_set():
                raise RuntimeError("StreamingEngine is stopping")
            handle.req_index = self._n_submitted  # sampling key identity
            self._n_submitted += 1
            if cap <= 0:
                handle._finish()
                return handle
            self._inbox.put((handle, ids, mask))
        return handle

    # ---- scheduler ---------------------------------------------------------
    def _run(self) -> None:
        try:
            self._scheduler_loop()
        except BaseException as exc:  # resolve every outstanding future
            self._crashed = exc
            leftovers: List[StreamHandle] = list(self._live_handles)
            while True:
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    leftovers.append(item[0])
            for h in leftovers:
                h._fail(exc)
            raise

    def _scheduler_loop(self) -> None:
        if self.engine.spec_gamma:
            return self._speculative_scheduler_loop()
        eng = self.engine
        B = eng.num_slots
        pending: deque = deque()  # (handle, ids, mask)
        slot_req: List[Optional[StreamHandle]] = [None] * B

        def drain_inbox(block: bool) -> None:
            try:
                item = self._inbox.get(timeout=self._idle_poll) if block else self._inbox.get_nowait()
            except queue.Empty:
                return
            while True:
                if item is not None:
                    pending.append(item)
                    self._live_handles.append(item[0])
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    return

        def finish(slot: int) -> None:
            h = slot_req[slot]
            slot_req[slot] = None
            if h in self._live_handles:
                self._live_handles.remove(h)
            h._finish()

        def admit():
            """Fill free slots from the queue in ONE device dispatch
            (same single-width admit program as DecodeEngine.generate)."""
            while pending and pending[0][0]._cancelled.is_set():
                h = pending.popleft()[0]
                if h in self._live_handles:
                    self._live_handles.remove(h)
                h._finish()
            free = [s for s in range(B) if slot_req[s] is None]
            m = min(len(free), len(pending))
            if eng.admit_W:  # cap the wave (see DecodeEngine.generate)
                m = min(m, eng.admit_W)
            if m == 0:
                return None
            batch = [pending.popleft() for _ in range(m)]
            slots = free[:m]
            m_pad = eng.admit_W or B
            ids = np.zeros((m_pad, eng.P), np.int32)
            mask = np.zeros((m_pad, eng.P), np.int32)
            mask[:, -1] = 1  # padding rows: one valid token (finite fwd)
            slot_ids = np.full((m_pad,), B, np.int32)
            valid = np.zeros((m_pad,), bool)
            req_arr = np.zeros((m_pad,), np.int32)
            for j, ((h, r_ids, r_mask), slot) in enumerate(zip(batch, slots)):
                ids[j] = r_ids
                mask[j] = r_mask
                slot_ids[j] = slot
                valid[j] = True
                req_arr[j] = h.req_index
                slot_req[slot] = h
            eng.state, first_tok = eng._admit_jit(
                eng._vars, eng.state,
                jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(slot_ids), jnp.asarray(valid), jnp.asarray(req_arr),
            )
            return ([h for h, _, _ in batch], slots, first_tok)

        def settle(admission) -> None:
            if admission is None:
                return
            handles, slots, first_tok = admission
            first_tok = np.asarray(first_tok)  # blocks; a decode sits behind it
            for j, (h, slot) in enumerate(zip(handles, slots)):
                first = int(first_tok[j])
                if h._cancelled.is_set():
                    finish(slot)
                    continue
                if eng.eos is not None and first == eng.eos:
                    finish(slot)
                    continue
                h._emit(first)
                if len(h._tokens) >= h.budget:
                    finish(slot)

        def harvest(flight) -> None:
            if flight is None:
                return
            chunk, snapshot = flight
            chunk = np.asarray(chunk)  # the per-chunk host sync
            for slot in range(B):
                h = snapshot[slot]
                if h is None or h.done or slot_req[slot] is not h:
                    continue
                if h._cancelled.is_set():
                    finish(slot)
                    continue
                for t in chunk[slot]:
                    t = int(t)
                    if eng.eos is not None and t == eng.eos:
                        finish(slot)
                        break
                    h._emit(t)
                    if len(h._tokens) >= h.budget:
                        finish(slot)
                        break

        # Scheduling rounds, identical pipeline shape to
        # DecodeEngine.generate: the next decode chunk is dispatched
        # BEFORE the previous chunk's readback blocks the host, so the
        # device queue never drains on a host round trip; a slot freed
        # in round r idles through the already-dispatched round r+1 and
        # refills at r+2.
        in_flight = None  # (chunk_future, slot->handle snapshot at dispatch)
        unsettled = None  # batched admission awaiting its first tokens
        while True:
            busy = any(s is not None for s in slot_req) or in_flight or unsettled or pending
            if not busy:
                if self._stop.is_set():
                    break
                drain_inbox(block=True)
                if not pending:
                    continue
            else:
                drain_inbox(block=False)
            if self._stop.is_set() and not self._drain:
                for item in pending:
                    item[0]._finish()
                    if item[0] in self._live_handles:
                        self._live_handles.remove(item[0])
                pending.clear()
                for h in slot_req:  # running requests stop at next harvest
                    if h is not None:
                        h._cancelled.set()
            if any(s is not None for s in slot_req):
                snapshot = list(slot_req)
                active = jnp.asarray(np.array([s is not None for s in snapshot]))
                req_arr = np.asarray(
                    [h.req_index if h is not None else 0 for h in snapshot], np.int32
                )
                eng.state, chunk = eng._decode(eng._vars, eng.state, active, jnp.asarray(req_arr))
                next_flight = (chunk, snapshot)
            else:
                next_flight = None
            settle(unsettled)
            harvest(in_flight)
            unsettled = admit()
            in_flight = next_flight

    def _speculative_scheduler_loop(self) -> None:
        """Online speculative serving: host-draft verification rounds
        (`DecodeEngine._generate_speculative` semantics) with streaming
        emits and mid-flight admission. Every request's tokens are
        exactly the lockstep output — greedy, or the sampler's stream
        under rejection verification (verification is exact;
        tested in tests/test_streaming.py)."""
        eng = self.engine
        B, G = eng.num_slots, eng.spec_gamma
        pending: deque = deque()  # (handle, ids, mask)
        slot_req: List[Optional[StreamHandle]] = [None] * B
        slot_prompt: List[Optional[np.ndarray]] = [None] * B  # unpadded ids

        def drain_inbox(block: bool) -> None:
            try:
                item = self._inbox.get(timeout=self._idle_poll) if block else self._inbox.get_nowait()
            except queue.Empty:
                return
            while True:
                if item is not None:
                    pending.append(item)
                    self._live_handles.append(item[0])
                try:
                    item = self._inbox.get_nowait()
                except queue.Empty:
                    return

        def finish(slot: int) -> None:
            h = slot_req[slot]
            slot_req[slot] = None
            slot_prompt[slot] = None
            if h in self._live_handles:
                self._live_handles.remove(h)
            h._finish()

        def admit_sync() -> None:
            """Fill free slots in one device dispatch; banks the first
            tokens synchronously (the next verification round's drafts
            must include them in the slot histories)."""
            while pending and pending[0][0]._cancelled.is_set():
                h = pending.popleft()[0]
                if h in self._live_handles:
                    self._live_handles.remove(h)
                h._finish()
            free = [s for s in range(B) if slot_req[s] is None]
            m = min(len(free), len(pending))
            if eng.admit_W:  # cap the wave (see DecodeEngine.generate)
                m = min(m, eng.admit_W)
            if m == 0:
                return
            batch = [pending.popleft() for _ in range(m)]
            slots = free[:m]
            W = eng.admit_W or B
            ids = np.zeros((W, eng.P), np.int32)
            mask = np.zeros((W, eng.P), np.int32)
            mask[:, -1] = 1  # padding rows: one valid token (finite fwd)
            slot_ids = np.full((W,), B, np.int32)
            valid = np.zeros((W,), bool)
            req_arr = np.zeros((W,), np.int32)
            for j, ((h, r_ids, r_mask), slot) in enumerate(zip(batch, slots)):
                ids[j] = r_ids
                mask[j] = r_mask
                slot_ids[j] = slot
                valid[j] = True
                req_arr[j] = h.req_index
            eng.state, first_tok = eng._admit_jit(
                eng._vars, eng.state,
                jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(slot_ids), jnp.asarray(valid), jnp.asarray(req_arr),
            )
            first_tok = np.asarray(first_tok)
            for j, ((h, r_ids, r_mask), slot) in enumerate(zip(batch, slots)):
                slot_req[slot] = h
                slot_prompt[slot] = r_ids[r_mask > 0]
                first = int(first_tok[j])
                if h._cancelled.is_set():
                    finish(slot)
                    continue
                if eng.eos is not None and first == eng.eos:
                    finish(slot)
                    continue
                h._emit(first)
                if len(h._tokens) >= h.budget:
                    finish(slot)

        while True:
            busy = any(s is not None for s in slot_req) or pending
            if not busy:
                if self._stop.is_set():
                    break
                drain_inbox(block=True)
                if not pending:
                    continue
            else:
                drain_inbox(block=False)
            if self._stop.is_set() and not self._drain:
                for item in pending:
                    item[0]._finish()
                    if item[0] in self._live_handles:
                        self._live_handles.remove(item[0])
                pending.clear()
                for slot in range(B):
                    if slot_req[slot] is not None:
                        finish(slot)
                continue
            admit_sync()
            active_mask = np.array([h is not None for h in slot_req])
            if not active_mask.any():
                continue
            drafts = np.zeros((B, G), np.int32)
            rem = np.zeros((B,), np.int32)
            req_arr = np.zeros((B,), np.int32)
            g0_arr = np.zeros((B,), np.int32)
            for slot in np.flatnonzero(active_mask):
                h = slot_req[slot]
                hist = np.concatenate([slot_prompt[slot], np.asarray(h._tokens, np.int32)])
                drafts[slot] = eng.host_draft(hist)
                rem[slot] = h.budget - len(h._tokens)
                req_arr[slot] = h.req_index
                g0_arr[slot] = len(h._tokens)
            eng.state, emit, m = eng._verify(
                eng._vars, eng.state, jnp.asarray(active_mask),
                jnp.asarray(drafts), jnp.asarray(rem),
                jnp.asarray(req_arr), jnp.asarray(g0_arr),
            )
            emit, m = np.asarray(emit), np.asarray(m)
            for slot in np.flatnonzero(active_mask):
                h = slot_req[slot]
                h.spec_rounds += 1
                if h._cancelled.is_set():
                    finish(slot)
                    continue
                for t in emit[slot][: m[slot]]:
                    t = int(t)
                    if eng.eos is not None and t == eng.eos:
                        finish(slot)
                        break
                    h._emit(t)
                    if len(h._tokens) >= h.budget:
                        finish(slot)
                        break
