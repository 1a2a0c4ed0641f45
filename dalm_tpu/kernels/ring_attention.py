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

from dalm_tpu.kernels.flash_attention import _flash_bwd, _flash_fwd

NEG_INF = -1e30  # large-negative instead of -inf: keeps fully-masked rows finite


def _merge(out1, lse1, out2, lse2):
    """Merge two (out f32 (B,H,S,D), lse f32 (B,H,S)) partial states."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = jnp.maximum(w1 + w2, 1e-30)
    out = (out1 * w1[..., None] + out2 * w2[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_core(q, k, v, axis_name, causal, scale, impl, interpret):
    out, _ = _ring_fwd(q, k, v, axis_name, causal, scale, impl, interpret)
    return out.astype(q.dtype)


def _ring_core_fwd(q, k, v, axis_name, causal, scale, impl, interpret):
    out, lse = _ring_fwd(q, k, v, axis_name, causal, scale, impl, interpret)
    return out.astype(q.dtype), (q, k, v, out.astype(q.dtype), lse)


def _ring_core_bwd(axis_name, causal, scale, impl, interpret, res, do):
    q, k, v, out, lse = res
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
) -> jax.Array:
    """Context-parallel attention for one sequence chunk per device.

    Must run inside ``shard_map`` (or pmap) with ``axis_name`` bound.
    Shapes (per device): q/k/v (B, S/P, H, Dh); returns (B, S/P, H, Dh)
    in q's dtype. ``impl``: "pallas" (flash kernel blocks), "xla"
    (dense einsum blocks), or "auto" (pallas on TPU).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = _ring_core(qt, kt, vt, axis_name, causal, scale, impl, interpret)
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
) -> jax.Array:
    """Convenience: shard (B, S, H, Dh) over ``axis_name`` and run the ring.

    S must divide evenly by the axis size. Inputs may live on host or any
    device layout; output is sequence-sharded the same way.
    """
    spec = P(None, axis_name, None, None)

    ring = jax.shard_map(
        functools.partial(
            ring_attention, axis_name=axis_name, causal=causal, impl=impl, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(jnp.asarray(x), sharding) for x in (q, k, v))
    return jax.jit(ring)(q, k, v)
