"""Prompt-lookup speculative decoding (exact greedy, fewer steps).

Autoregressive decode is HBM-bound: every step reads the full weight
set to produce ONE token per sequence. Speculative decoding verifies
SEVERAL draft tokens in one forward pass — the pass costs the same HBM
traffic as a single-token step (weights dominate), so every accepted
draft token is a free token. Greedy verification is EXACT: the emitted
stream is identical to one-token-at-a-time greedy decoding, token for
token (tested).

Exactness caveat (measured): "identical" holds in exact arithmetic and
bit-for-bit in f32 on TPU; under bfloat16 the verification forward
(S=gamma+1) tiles matmuls differently than the single-token step, so
argmax can flip where the top-2 logits are within rounding distance.
With trained weights such near-ties are rare; with random init they are
common (logits near-uniform). The same caveat applies to greedy itself
— its output is only unique up to tie-breaking.

Drafts come from PROMPT LOOKUP (no draft model): the most recent
previous occurrence of the current bigram in the sequence-so-far
proposes the ``gamma`` tokens that followed it. For RAG this is the
high-payoff regime — answers quote retrieved passages, so long copied
spans verify in one pass. The lookup is fully on-device (one vectorized
match over the token buffer per step), and the whole schedule is a
single ``lax.while_loop`` program: one dispatch, one readback.

Cache discipline matches `models/decode_engine.py`: the verification
forward writes K/V for [current token, draft] at slots
``wp..wp+gamma``; if only ``a`` drafts are accepted, the stale entries
beyond ``wp+a`` are overwritten by the next iteration before any query
can attend to them (each iteration writes ``gamma+1`` entries starting
at most ``gamma+1`` slots later). Per-row write offsets ride the
decoder's vector ``cache_index`` path.

The reference's decode surface is HF ``generate()`` (greedy,
`eval_rag.py:127-141`); this is a beyond-reference serving optimization
with bit-identical outputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dalm_tpu.kernels.flash_attention import NEG_INF
from dalm_tpu.models.decoder import Decoder
from dalm_tpu.models.sampling import SamplerConfig, _filter_logits, resolve, select_token


def gather_lanes(src, idx):
    """``take_along_axis(src, idx, axis=1)`` as a one-hot MXU einsum.

    src: (B, S) int32 tokens; idx: (B, W) int32 in [0, S). The XLA TPU
    fusion emitter crashes (``Check failed: GetGatherType(gather) ==
    kSublaneGather``) on lane-wise dynamic gathers inside the big fused
    while-loop programs at serving scale — the same compiler class the
    one-hot KV-cache write works around (commit 6098ea's lesson). Token
    ids < 2^24 are exact in f32, and the one-hot contraction is tiny
    next to the decode matmuls.
    """
    sel = jax.nn.one_hot(idx, src.shape[1], dtype=jnp.float32)  # (B, W, S)
    vals = jnp.einsum(
        "bws,bs->bw", sel, src.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return vals.astype(jnp.int32)


def prompt_lookup(buf, q_end, pad_lens, gamma: int, ngram: int):
    """Per-row bigram/n-gram prompt lookup over a token buffer.

    ``buf``: (B, L) token history (prompt then generated); ``q_end``:
    (B,) index of the newest token; ``pad_lens``: (B,) left-pad length
    (candidates must start at or after it). Returns (B, gamma) drafts —
    the tokens following the most recent previous occurrence of the
    current n-gram, falling back to repeating the newest token.
    """
    B, L = buf.shape
    cur = jnp.stack(
        [
            jnp.take_along_axis(buf, (q_end - (ngram - 1 - t))[:, None], axis=1)[:, 0]
            for t in range(ngram)
        ],
        axis=1,
    )  # (B, ngram)
    pos = jnp.arange(L)[None, :]
    match = jnp.ones((B, L), bool)
    for t in range(ngram):
        shifted = jnp.roll(buf, -t, axis=1)
        match = match & (shifted == cur[:, t : t + 1])
    # candidate start l: ngram begins at l; must be entirely in the
    # real (non-pad) region and strictly before the current ngram
    start_ok = (pos >= pad_lens[:, None]) & (
        pos + (ngram - 1) < q_end[:, None] - (ngram - 1)
    )
    match = match & start_ok
    any_match = match.any(axis=1)
    last_l = jnp.argmax(jnp.where(match, pos, -1), axis=1)  # most recent
    gather_idx = last_l[:, None] + ngram + jnp.arange(gamma)[None, :]
    gather_idx = jnp.clip(gather_idx, 0, L - 1)
    draft = gather_lanes(buf, gather_idx)
    last_tok = jnp.take_along_axis(buf, q_end[:, None], axis=1)
    fallback = jnp.broadcast_to(last_tok, (B, gamma))
    return jnp.where(any_match[:, None], draft, fallback)


def rejection_verify(logits, draft, cfg: SamplerConfig, request_idx, tok0):
    """Shared speculative verification — greedy prefix-match or rejection
    sampling (Leviathan et al. 2023, deterministic-proposal special case).

    logits: (B, G+1, V) verifier logits; draft: (B, G) proposed tokens;
    request_idx: (B,) ORIGINAL request ids (sampling-key identity);
    tok0: (B,) emitted-token index of position 0 of this pass.
    Returns ``(ok (B, G) bool, fallback (B, G+1) int32)``: accept flags
    per draft position and the verifier's token for the first rejected
    (or bonus) position. Used identically by the lockstep generator and
    both DecodeEngine schedules, so a request's stream is engine-invariant.

    Greedy: accept iff draft == argmax; fallback = argmax — bit-exact vs
    ``build_greedy_generate``. Sampled: draft d_j accepts with prob
    p_j(d_j) under the filtered target p; the first rejection draws from
    p_j restricted to tokens != d_j; the bonus (j == G) draws from p_G
    directly — every emitted position follows EXACTLY the distribution
    the non-speculative sampler draws from. Randomness is keyed per
    (request, emitted-token index, use), so a position retried in a later
    pass reuses a fixed uniform — valid because discarded draws never
    influence the emitted stream.
    """
    G = draft.shape[1]
    j = jnp.arange(G + 1)[None, :]
    draft_pad = jnp.pad(draft, ((0, 0), (0, 1)))  # (B, G+1); col G unused
    if cfg.greedy:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, G+1)
        return draft == greedy[:, :G], greedy
    lg = _filter_logits(logits.astype(jnp.float32) / cfg.temperature, cfg)
    probs = jax.nn.softmax(lg, axis=-1)
    tok_idx = tok0[:, None] + j  # (B, G+1) emitted-token index per position
    base_key = cfg.base_key()

    def _pos_key(r, t, use):
        k = jax.random.fold_in(jax.random.fold_in(base_key, r), t)
        return jax.random.fold_in(k, use)

    keys = jax.vmap(
        jax.vmap(_pos_key, in_axes=(None, 0, None)), in_axes=(0, 0, None)
    )
    u = jax.vmap(jax.vmap(jax.random.uniform))(keys(request_idx, tok_idx, 0))
    p_d = jnp.take_along_axis(probs, draft_pad[..., None], axis=-1)[..., 0]
    ok = u[:, :G] < p_d[:, :G]
    # residual draw (draft masked out) for j < G; direct (bonus) at j == G
    mask_d = jax.nn.one_hot(draft_pad, lg.shape[-1], dtype=bool) & (j < G)[..., None]
    res_lg = jnp.where(mask_d, NEG_INF, lg)
    fallback = (
        jax.vmap(jax.vmap(jax.random.categorical))(keys(request_idx, tok_idx, 1), res_lg)
        .astype(jnp.int32)
    )
    return ok, fallback


def build_speculative_generate(
    decoder: Decoder,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    pad_token_id: int = 0,
    gamma: int = 8,
    ngram: int = 2,
    extra_collections: Optional[dict] = None,
    return_stats: bool = False,
    sampler: Optional[SamplerConfig] = None,
):
    """Returns jitted ``fn(params, input_ids, attention_mask) -> (B, T_new)``
    with outputs IDENTICAL to ``build_greedy_generate``.

    ``gamma``: draft tokens verified per forward pass. ``ngram``: match
    length for the prompt lookup (2 = bigram). ``return_stats``: also
    return the verification-pass count (B,) — mean accepted drafts per
    pass = max_new/passes − 1, the quantity that decides the speedup.

    ``sampler``: temperature/top-k/top-p sampling composed with
    speculation via standard rejection verification (Leviathan et al.
    2023, deterministic-proposal special case). Prompt lookup is a point
    mass q = δ(draft), so draft token d at a position with filtered
    target distribution p is accepted with probability p(d); on the
    first rejection the emitted token is drawn from the residual
    p restricted to tokens ≠ d (renormalized), and when all ``gamma``
    drafts are accepted a bonus token is drawn from p directly. Each
    emitted position therefore follows EXACTLY the target distribution
    the non-speculative sampler draws from (distribution-equality
    tested); with ``top_k=1`` the output matches greedy bit-for-bit.
    Randomness is keyed per (request row, emitted-token index, use),
    so retries of a position in later passes reuse a fixed uniform —
    valid because discarded draws never influence the emitted stream.
    """
    extra = extra_collections or {}
    cfg = resolve(sampler)

    @jax.jit
    def _generate(params, extra, input_ids, attention_mask):
        variables = {"params": params, **extra}
        B, P = input_ids.shape
        MN = max_new_tokens
        L = P + MN + gamma + 1  # cache/buffer slack for the last window
        G = gamma

        cache = decoder.init_kv_cache(B, L)
        prompt_positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, min=0)
        pad_lens = P - attention_mask.sum(axis=1)  # left-pad length per row
        slot_mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, L - P), attention_mask.dtype)], axis=1
        )

        logits, cache = decoder.apply(
            variables, input_ids, slot_mask,
            positions=prompt_positions, kv_cache=cache, cache_index=0,
        )
        rows = jnp.arange(B, dtype=jnp.int32)
        # token index 0 — same keying as build_greedy_generate
        first_tok = select_token(logits[:, -1, :], cfg, rows, jnp.zeros_like(rows))

        # token buffer: prompt followed by generated tokens
        buf = jnp.concatenate(
            [input_ids.astype(jnp.int32), jnp.zeros((B, L - P), jnp.int32)], axis=1
        )
        buf = buf.at[:, P].set(first_tok)

        def cond(state):
            return (state["n_gen"] < MN).any()

        def body(state):
            cache, buf, n_gen = state["cache"], state["buf"], state["n_gen"]
            n_pass = state["n_pass"]
            active = n_gen < MN
            q_end = P + n_gen - 1
            tok = jnp.take_along_axis(buf, q_end[:, None], axis=1)[:, 0]
            draft = prompt_lookup(buf, q_end, pad_lens, G, ngram)
            inputs = jnp.concatenate([tok[:, None], draft], axis=1)  # (B, G+1)
            # positions: semantic position of tok is q_end - pad_len
            base_pos = (q_end - pad_lens)[:, None]
            positions = base_pos + jnp.arange(G + 1)[None, :]
            wp = q_end  # cache slot of tok == its buffer index
            logits, cache = decoder.apply(
                variables, inputs, slot_mask,
                positions=positions, kv_cache=cache, cache_index=wp,
            )
            j = jnp.arange(G + 1)[None, :]
            draft_pad = jnp.pad(draft, ((0, 0), (0, 1)))  # (B, G+1); col G unused
            # keys per (row, n_gen + j, use): token index of position j
            # this pass is n_gen + j and is emitted at most once, so
            # streams never collide across passes
            ok, fallback = rejection_verify(logits, draft, cfg, rows, n_gen)
            acc = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)  # (B,)
            m = jnp.where(active, jnp.minimum(acc + 1, MN - n_gen), 0)
            # emitted tokens: draft[:acc] then the verifier's token at acc —
            # position j emits draft[j] if j < acc else fallback[j]
            emit = jnp.where(j < acc[:, None], draft_pad, fallback)
            # scatter emit[:, :m] into buf at q_end+1 .. q_end+m
            l_idx = jnp.arange(L)[None, :]
            g = l_idx - (q_end + 1)[:, None]
            inside = (g >= 0) & (g < m[:, None])
            g_safe = jnp.clip(g, 0, G)
            buf = jnp.where(inside, gather_lanes(emit, g_safe), buf)
            return dict(
                cache=cache, buf=buf, n_gen=n_gen + m,
                n_pass=n_pass + active.astype(jnp.int32),
            )

        state = jax.lax.while_loop(
            cond, body,
            dict(cache=cache, buf=buf, n_gen=jnp.ones((B,), jnp.int32),
                 n_pass=jnp.zeros((B,), jnp.int32)),
        )
        toks = jax.lax.dynamic_slice_in_dim(state["buf"], P, MN, axis=1)

        if eos_token_id is not None:
            is_eos = (toks == eos_token_id).astype(jnp.int32)
            after_eos = (jnp.cumsum(is_eos, axis=1) - is_eos) > 0
            toks = jnp.where(after_eos, pad_token_id, toks)
        if return_stats:
            return toks, state["n_pass"]
        return toks

    def generate(params, input_ids, attention_mask):
        return _generate(params, extra, input_ids, attention_mask)

    return generate
