"""Ring attention — context-parallel causal attention over a mesh axis.

The reference has no long-context machinery at all (SURVEY.md §5: max
sequence in play is 2600 tokens, truncation elsewhere). This module is
the TPU-native long-context slot: the sequence axis is sharded over a
mesh axis and K/V chunks rotate around the ring with ``ppermute`` while
each device accumulates its queries' attention with an online
(flash-style) softmax — peak memory per device is O(S/P · S/P) for one
block of scores instead of O(S²), and the K/V transfers ride ICI.

Layout: under ``shard_map`` each device holds the (B, S/P, H, Dh)
sequence chunk for its position ``i = axis_index``. At ring step ``r``
the resident K/V chunk is the one originally on device ``(i - r) mod P``
— chunk order equals device order, so causality per (query-chunk i,
key-chunk j) is:

  j >  i  → fully masked (still participates in the rotation)
  j == i  → causal mask within the chunk
  j <  i  → fully visible

The merge across ring steps is the standard online-softmax state
``(m, l, acc)`` in f32 — numerically identical (up to fp reassociation)
to softmax over the full row.

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

NEG_INF = -1e30  # large-negative instead of -inf: keeps fully-masked rows finite


def _block_attn(q, k, v, mask, scale):
    """One (Q_chunk x K_chunk) block: returns (m, l, acc) f32 partials.

    q: (B, Sq, H, D), k/v: (B, Sk, H, D), mask: (Sq, Sk) bool (True=keep).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[None, None, :, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # (B, H, Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B, H, Sq)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return m, l, acc


def _merge(state, new):
    """Merge two online-softmax partial states."""
    m0, l0, a0 = state
    m1, l1, a1 = new
    m = jnp.maximum(m0, m1)
    c0 = jnp.exp(m0 - m)
    c1 = jnp.exp(m1 - m)
    l = l0 * c0 + l1 * c1
    # coefficients are (B, H, Sq); acc is (B, Sq, H, D)
    a = a0 * jnp.transpose(c0, (0, 2, 1))[..., None] + a1 * jnp.transpose(c1, (0, 2, 1))[..., None]
    return m, l, a


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    scale: float | None = None,
) -> jax.Array:
    """Context-parallel attention for one sequence chunk per device.

    Must run inside ``shard_map`` (or pmap) with ``axis_name`` bound.
    Shapes (per device): q/k/v (B, S/P, H, Dh); returns (B, S/P, H, Dh)
    in q's dtype.
    """
    num_chunks = jax.lax.axis_size(axis_name)
    my_chunk = jax.lax.axis_index(axis_name)
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    pos_q = jnp.arange(sq)
    pos_k = jnp.arange(k.shape[1])
    tri = pos_q[:, None] >= pos_k[None, :]  # within-chunk causal
    full = jnp.ones((sq, k.shape[1]), bool)

    m = jnp.full((b, h, sq), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, sq), jnp.float32)
    acc = jnp.zeros((b, sq, h, d), jnp.float32)

    perm = [(s, (s + 1) % num_chunks) for s in range(num_chunks)]

    cur_k, cur_v = k, v
    for r in range(num_chunks):
        src_chunk = (my_chunk - r) % num_chunks  # owner of the resident K/V
        if causal:
            # j > i fully masked; j == i causal; j < i full
            keep = jnp.where(
                src_chunk > my_chunk, jnp.zeros_like(full),
                jnp.where(src_chunk == my_chunk, tri, full),
            )
        else:
            keep = full
        bm, bl, bacc = _block_attn(q, cur_k, cur_v, keep, scale)
        m, l, acc = _merge((m, l, acc), (bm, bl, bacc))
        if r != num_chunks - 1:
            cur_k = jax.lax.ppermute(cur_k, axis_name, perm)
            cur_v = jax.lax.ppermute(cur_v, axis_name, perm)

    out = acc / jnp.maximum(jnp.transpose(l, (0, 2, 1)), 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "model",
    causal: bool = True,
) -> jax.Array:
    """Convenience: shard (B, S, H, Dh) over ``axis_name`` and run the ring.

    S must divide evenly by the axis size. Inputs may live on host or any
    device layout; output is sequence-sharded the same way.
    """
    spec = P(None, axis_name, None, None)

    ring = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(jnp.asarray(x), sharding) for x in (q, k, v))
    return jax.jit(ring)(q, k, v)
