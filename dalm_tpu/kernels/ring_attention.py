"""Ring attention — context-parallel causal attention over a mesh axis.

The reference has no long-context machinery at all (SURVEY.md §5: max
sequence in play is 2600 tokens, truncation elsewhere). This module is
the TPU-native long-context slot: the sequence axis is sharded over a
mesh axis and K/V chunks rotate around the ring with ``ppermute`` while
each device folds its queries' attention over every chunk.

Per-device state is the (out, lse) pair of `kernels/flash_attention.py`:
attention over disjoint key sets merges exactly via

    m = max(lse1, lse2); w_i = exp(lse_i - m)
    out = (out1*w1 + out2*w2)/(w1+w2);  lse = m + log(w1+w2)

so each ring step computes one chunk-vs-chunk attention block — with the
Pallas flash kernel on TPU (``impl="pallas"``), or a dense-einsum block
elsewhere (``impl="xla"``) — and merges it in f32.

Layout: under ``shard_map`` each device holds the (B, S/P, H, Dh)
sequence chunk for its position ``i = axis_index``. At ring step ``r``
the resident K/V chunk is the one originally on device ``(i - r) mod P``
— chunk order equals device order, so causality per (query-chunk i,
key-chunk j) is: j > i fully masked, j == i causal within the chunk,
j < i fully visible. Fully-masked steps SKIP the block entirely via
``lax.cond`` (the rotation still runs — collectives stay unconditional,
every device executes the same ppermute sequence).

Differentiation is a custom VJP (autodiff cannot see through the Pallas
blocks): the backward is a second ring pass in which dk/dv accumulators
TRAVEL WITH their k/v chunks — after P rotations each accumulated
gradient chunk is home — while dq accumulates in place. Per block the
standard flash recompute applies (``p = exp(s·scale − lse)`` with the
GLOBAL lse, so probabilities are exact without renormalization).

Causal load balance — ``layout="zigzag"``: with contiguous chunks the
causal mask gives device ``i`` only ``i+1`` visible blocks, so lockstep
ring steps idle the early devices and wall-clock stays ~P full blocks
(≈2× the useful work). The zigzag layout gives each device TWO
half-chunks — chunk ``d`` and chunk ``2P-1-d`` — so every device
computes exactly two half-blocks per ring step (three at step 0): total
``(2P+1)/2`` half-block times ≈ HALF the contiguous wall-clock, exact
same math. Host-side helpers :func:`zigzag_indices` /
:func:`zigzag_inverse` produce the sequence permutation; positions and
labels must follow it (see `train/context_parallel.py`).

Use :func:`ring_attention` inside your own ``shard_map``; the
:func:`ring_attention_sharded` convenience wraps one around a
``(batch, seq, heads, head_dim)`` array sharded over ``axis_name``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dalm_tpu.kernels.flash_attention import NEG_INF, _flash_bwd, _flash_fwd

# NEG_INF is shared with the flash kernel: both sides of the lse-merge
# identity must agree on the masked-row sentinel.


def _merge(out1, lse1, out2, lse2):
    """Merge two (out f32 (B,H,S,D), lse f32 (B,H,S)) partial states."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = jnp.maximum(w1 + w2, 1e-30)
    out = (out1 * w1[..., None] + out2 * w2[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


def zigzag_indices(seq_len: int, num_devices: int) -> np.ndarray:
    """Permutation: global positions in device-major zigzag order.

    ``x[..., zigzag_indices(S, P), ...]`` lays the sequence out so that a
    contiguous shard over the ring axis gives device ``d`` the
    concatenation of chunk ``d`` and chunk ``2P-1-d`` (2P chunks of
    ``S/(2P)``)."""
    assert seq_len % (2 * num_devices) == 0, (seq_len, num_devices)
    ch = seq_len // (2 * num_devices)
    order = []
    for d in range(num_devices):
        order.extend(range(d * ch, (d + 1) * ch))
        hi = 2 * num_devices - 1 - d
        order.extend(range(hi * ch, (hi + 1) * ch))
    return np.asarray(order, np.int32)


def zigzag_inverse(seq_len: int, num_devices: int) -> np.ndarray:
    """Inverse permutation: zigzag order back to natural order."""
    perm = zigzag_indices(seq_len, num_devices)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(seq_len, dtype=np.int32)
    return inv


def _block_fwd_xla(q, k, v, scale, causal):
    """Dense one-block attention, (B,H,S,D) f32 partials + lse."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        tri = jnp.arange(q.shape[2])[:, None] >= jnp.arange(k.shape[2])[None, :]
        s = jnp.where(tri[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    if causal:
        p = jnp.where(tri[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    out = out / jnp.maximum(l, 1e-30)[..., None]
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
    return out, lse


def _block_fwd(q, k, v, scale, causal, impl, interpret):
    if impl == "pallas":
        out, lse = _flash_fwd(q, k, v, causal=causal, scale=scale, interpret=interpret)
        return out.astype(jnp.float32), lse
    return _block_fwd_xla(q, k, v, scale, causal)


def _block_bwd_xla(q, k, v, do, out, lse, scale, causal):
    """Flash-recompute gradients for one block with the global lse."""
    f32 = jnp.float32
    dsum = jnp.einsum("bhsd,bhsd->bhs", do.astype(f32), out.astype(f32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=f32) * scale
    p = jnp.exp(s - lse[..., None])  # true global softmax probs
    if causal:
        tri = jnp.arange(q.shape[2])[:, None] >= jnp.arange(k.shape[2])[None, :]
        p = jnp.where(tri[None, None], p, 0.0)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do.astype(f32))
    dp = jnp.einsum("bhqd,bhkd->bhqk", do.astype(f32), v.astype(f32))
    ds = p * (dp - dsum[..., None]) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(f32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(f32))
    return dq, dk, dv


def _block_bwd(q, k, v, do, out, lse, scale, causal, impl, interpret):
    if impl == "pallas":
        dq, dk, dv = _flash_bwd(
            q, k, v, out, lse, do, causal=causal, scale=scale, interpret=interpret
        )
        return dq.astype(jnp.float32), dk.astype(jnp.float32), dv.astype(jnp.float32)
    return _block_bwd_xla(q, k, v, do, out, lse, scale, causal)


def _ring_fwd(q, k, v, axis_name, causal, scale, impl, interpret):
    """(B,H,Sc,D) per-device chunks → (out f32, lse f32)."""
    num_chunks = jax.lax.axis_size(axis_name)
    my_chunk = jax.lax.axis_index(axis_name)
    b, h, sq, d = q.shape
    perm = [(s, (s + 1) % num_chunks) for s in range(num_chunks)]

    out = jnp.zeros((b, h, sq, d), jnp.float32)
    lse = jnp.full((b, h, sq), NEG_INF, jnp.float32)
    cur_k, cur_v = k, v
    for r in range(num_chunks):
        if not causal:
            o_b, l_b = _block_fwd(q, cur_k, cur_v, scale, False, impl, interpret)
            out, lse = _merge(out, lse, o_b, l_b)
        elif r == 0:
            # resident chunk is my own → standard causal diagonal
            o_b, l_b = _block_fwd(q, cur_k, cur_v, scale, True, impl, interpret)
            out, lse = _merge(out, lse, o_b, l_b)
        else:
            # src < mine → fully visible; src > mine → skip the block
            # entirely (the cond's taken branch is the only one executed).
            src = (my_chunk - r) % num_chunks

            def _take(state, ck=cur_k, cv=cur_v):
                o_b, l_b = _block_fwd(q, ck, cv, scale, False, impl, interpret)
                return _merge(state[0], state[1], o_b, l_b)

            out, lse = jax.lax.cond(src < my_chunk, _take, lambda s: s, (out, lse))
        if r != num_chunks - 1:
            cur_k = jax.lax.ppermute(cur_k, axis_name, perm)
            cur_v = jax.lax.ppermute(cur_v, axis_name, perm)
    return out, lse


def _ring_fwd_zigzag(q, k, v, axis_name, scale, impl, interpret):
    """Zigzag-layout causal ring forward: per-device (B,H,C,D) is the
    concat of half-chunks [chunk d | chunk 2P-1-d]. Per ring step every
    device computes exactly two half-blocks (three at step 0):

      r == 0 (resident pair is my own): (q1·k1 causal), (q2·k1 full),
        (q2·k2 causal)
      r > 0 with source s: (q2·k1) always full, plus ONE of
        (q1·k1 full) if s < d, else (q2·k2 full) — both branches cost
        the same, so the lockstep ring stays balanced.
    """
    num = jax.lax.axis_size(axis_name)
    d_idx = jax.lax.axis_index(axis_name)
    b, h, c, dd = q.shape
    ch = c // 2
    perm = [(s_, (s_ + 1) % num) for s_ in range(num)]
    q1, q2 = q[:, :, :ch], q[:, :, ch:]

    def blk(qh, kh, vh, causal_):
        return _block_fwd(qh, kh, vh, scale, causal_, impl, interpret)

    zero = lambda: (jnp.zeros((b, h, ch, dd), jnp.float32),  # noqa: E731
                    jnp.full((b, h, ch), NEG_INF, jnp.float32))
    st1, st2 = zero(), zero()
    cur_k, cur_v = k, v
    for r in range(num):
        k1, v1 = cur_k[:, :, :ch], cur_v[:, :, :ch]
        k2, v2 = cur_k[:, :, ch:], cur_v[:, :, ch:]
        if r == 0:
            st1 = _merge(*st1, *blk(q1, k1, v1, True))
            st2 = _merge(*st2, *blk(q2, k1, v1, False))
            st2 = _merge(*st2, *blk(q2, k2, v2, True))
        else:
            st2 = _merge(*st2, *blk(q2, k1, v1, False))
            src = (d_idx - r) % num

            def _low(states, k1=k1, v1=v1):
                s1, s2 = states
                return _merge(*s1, *blk(q1, k1, v1, False)), s2

            def _high(states, k2=k2, v2=v2):
                s1, s2 = states
                return s1, _merge(*s2, *blk(q2, k2, v2, False))

            st1, st2 = jax.lax.cond(src < d_idx, _low, _high, (st1, st2))
        if r != num - 1:
            cur_k = jax.lax.ppermute(cur_k, axis_name, perm)
            cur_v = jax.lax.ppermute(cur_v, axis_name, perm)
    out = jnp.concatenate([st1[0], st2[0]], axis=2)
    lse = jnp.concatenate([st1[1], st2[1]], axis=2)
    return out, lse


def _ring_bwd_zigzag(q, k, v, out, lse, do, axis_name, scale, impl, interpret):
    """Backward ring pass for the zigzag layout: same block schedule as
    the forward; dk/dv half-accumulators travel with their k/v halves."""
    num = jax.lax.axis_size(axis_name)
    d_idx = jax.lax.axis_index(axis_name)
    b, h, c, dd = q.shape
    ch = c // 2
    perm = [(s_, (s_ + 1) % num) for s_ in range(num)]
    halves = lambda x: (x[:, :, :ch], x[:, :, ch:])  # noqa: E731
    q1, q2 = halves(q)
    do1, do2 = halves(do)
    out1, out2 = halves(out)
    lse1, lse2 = lse[:, :, :ch], lse[:, :, ch:]

    def blk(qh, kh, vh, doh, oh, lh, causal_):
        return _block_bwd(qh, kh, vh, doh, oh, lh, scale, causal_, impl, interpret)

    dq1 = jnp.zeros((b, h, ch, dd), jnp.float32)
    dq2 = jnp.zeros((b, h, ch, dd), jnp.float32)
    cur = (k, v, jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    for r in range(num):
        cur_k, cur_v, cur_dk, cur_dv = cur
        k1, k2 = halves(cur_k)
        v1, v2 = halves(cur_v)
        dk1, dk2 = halves(cur_dk)
        dv1, dv2 = halves(cur_dv)
        if r == 0:
            bq, bk, bv = blk(q1, k1, v1, do1, out1, lse1, True)
            dq1, dk1, dv1 = dq1 + bq, dk1 + bk, dv1 + bv
            bq, bk, bv = blk(q2, k1, v1, do2, out2, lse2, False)
            dq2, dk1, dv1 = dq2 + bq, dk1 + bk, dv1 + bv
            bq, bk, bv = blk(q2, k2, v2, do2, out2, lse2, True)
            dq2, dk2, dv2 = dq2 + bq, dk2 + bk, dv2 + bv
        else:
            bq, bk, bv = blk(q2, k1, v1, do2, out2, lse2, False)
            dq2, dk1, dv1 = dq2 + bq, dk1 + bk, dv1 + bv
            src = (d_idx - r) % num

            def _low(state, k1=k1, v1=v1):
                sdq1, sdq2, sdk1, sdv1, sdk2, sdv2 = state
                bq, bk, bv = blk(q1, k1, v1, do1, out1, lse1, False)
                return sdq1 + bq, sdq2, sdk1 + bk, sdv1 + bv, sdk2, sdv2

            def _high(state, k2=k2, v2=v2):
                sdq1, sdq2, sdk1, sdv1, sdk2, sdv2 = state
                bq, bk, bv = blk(q2, k2, v2, do2, out2, lse2, False)
                return sdq1, sdq2 + bq, sdk1, sdv1, sdk2 + bk, sdv2 + bv

            dq1, dq2, dk1, dv1, dk2, dv2 = jax.lax.cond(
                src < d_idx, _low, _high, (dq1, dq2, dk1, dv1, dk2, dv2)
            )
        cur = tuple(
            jax.lax.ppermute(x, axis_name, perm)
            for x in (
                cur_k, cur_v,
                jnp.concatenate([dk1, dk2], axis=2),
                jnp.concatenate([dv1, dv2], axis=2),
            )
        )
    _, _, dk, dv = cur
    dq = jnp.concatenate([dq1, dq2], axis=2)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring_core(q, k, v, axis_name, causal, scale, impl, interpret, layout):
    if layout == "zigzag":
        out, _ = _ring_fwd_zigzag(q, k, v, axis_name, scale, impl, interpret)
    else:
        out, _ = _ring_fwd(q, k, v, axis_name, causal, scale, impl, interpret)
    return out.astype(q.dtype)


def _ring_core_fwd(q, k, v, axis_name, causal, scale, impl, interpret, layout):
    if layout == "zigzag":
        out, lse = _ring_fwd_zigzag(q, k, v, axis_name, scale, impl, interpret)
    else:
        out, lse = _ring_fwd(q, k, v, axis_name, causal, scale, impl, interpret)
    return out.astype(q.dtype), (q, k, v, out.astype(q.dtype), lse)


def _ring_core_bwd(axis_name, causal, scale, impl, interpret, layout, res, do):
    q, k, v, out, lse = res
    if layout == "zigzag":
        dq, dk, dv = _ring_bwd_zigzag(
            q, k, v, out, lse, do, axis_name, scale, impl, interpret
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
    num_chunks = jax.lax.axis_size(axis_name)
    my_chunk = jax.lax.axis_index(axis_name)
    perm = [(s, (s + 1) % num_chunks) for s in range(num_chunks)]

    dq = jnp.zeros(q.shape, jnp.float32)
    cur = (k, v, jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    for r in range(num_chunks):
        cur_k, cur_v, cur_dk, cur_dv = cur
        if not causal or r == 0:
            bq, bk, bv = _block_bwd(
                q, cur_k, cur_v, do, out, lse, scale, causal and r == 0, impl, interpret
            )
            dq, cur_dk, cur_dv = dq + bq, cur_dk + bk, cur_dv + bv
        else:
            src = (my_chunk - r) % num_chunks

            def _take(state, ck=cur_k, cv=cur_v):
                sdq, sdk, sdv = state
                bq, bk, bv = _block_bwd(
                    q, ck, cv, do, out, lse, scale, False, impl, interpret
                )
                return sdq + bq, sdk + bk, sdv + bv

            dq, cur_dk, cur_dv = jax.lax.cond(
                src < my_chunk, _take, lambda s: s, (dq, cur_dk, cur_dv)
            )
        # dk/dv accumulators travel WITH their chunk; P total rotations
        # bring every accumulated gradient chunk back to its owner.
        cur = tuple(
            jax.lax.ppermute(x, axis_name, perm) for x in (cur_k, cur_v, cur_dk, cur_dv)
        )
    _, _, dk, dv = cur
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    scale: float | None = None,
    impl: str = "auto",
    interpret: bool = False,
    layout: str = "contiguous",
) -> jax.Array:
    """Context-parallel attention for one sequence chunk per device.

    Must run inside ``shard_map`` (or pmap) with ``axis_name`` bound.
    Shapes (per device): q/k/v (B, S/P, H, Dh); returns (B, S/P, H, Dh)
    in q's dtype. ``impl``: "pallas" (flash kernel blocks), "xla"
    (dense einsum blocks), or "auto" (pallas on TPU). ``layout``:
    "contiguous" (chunk d on device d) or "zigzag" (balanced causal
    work; inputs must be pre-permuted with :func:`zigzag_indices` and
    ``causal`` must be True).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if layout == "zigzag":
        assert causal, "zigzag layout is a causal-balance optimization"
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = _ring_core(qt, kt, vt, axis_name, causal, scale, impl, interpret, layout)
    return out.transpose(0, 2, 1, 3)


def ring_attention_sharded(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "model",
    causal: bool = True,
    impl: str = "auto",
    interpret: bool = False,
    layout: str = "contiguous",
) -> jax.Array:
    """Convenience: shard (B, S, H, Dh) over ``axis_name`` and run the ring.

    S must divide evenly by the axis size. Inputs may live on host or any
    device layout; output is sequence-sharded the same way.
    """
    spec = P(None, axis_name, None, None)

    ring = jax.shard_map(
        functools.partial(
            ring_attention, axis_name=axis_name, causal=causal, impl=impl,
            interpret=interpret, layout=layout,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(jnp.asarray(x), sharding) for x in (q, k, v))
    return jax.jit(ring)(q, k, v)
