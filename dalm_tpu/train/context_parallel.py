"""Context-parallel (CP) training utilities — sequence over a mesh axis.

Long-context SFT beyond single-chip activation memory: the packed
sequence axis shards over ``axis_name`` (default the mesh ``model``
axis), attention runs as ring attention (K/V chunks rotating over ICI,
``kernels/ring_attention.py``), and the next-token labels cross chunk
boundaries via a one-column ``ppermute``.

The reference has nothing in this space (SURVEY.md §5 long-context:
"entirely absent"); this is the pluggable-attention slot filled in.

Semantics: identical loss/gradients to the unsharded causal LM objective
(tests/models/test_cp_decoder.py proves logits, loss, and grads match
the einsum decoder bit-for-near-bit on the 8-device mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P


def build_cp_loss(
    model, mesh: Mesh, axis_name: str = "model", data_axis: Optional[str] = None,
    layout: str = "contiguous",
):
    """Returns ``loss(params, input_ids_sharded) -> scalar mean NLL``.

    ``model`` must be a decoder whose config has
    ``attention_impl="ring"``, ``ring_axis == axis_name``, and
    ``ring_layout == layout``. ``input_ids`` is (B, S) with S sharded
    over ``axis_name`` (and B over ``data_axis`` if given); with
    ``layout="zigzag"`` the caller must feed tokens already permuted by
    ``kernels.ring_attention.zigzag_indices(S, P)`` (balanced causal
    ring work — ~2× the contiguous layout's wall-clock at scale).
    Differentiable: ``jax.grad`` through the shard_map transposes the
    internal collectives correctly.
    """
    num_chunks = mesh.shape[axis_name]
    axes = (data_axis, axis_name) if data_axis else (axis_name,)

    def per_chunk(params, ids, noise_rng, neftune_alpha):
        chunk = jax.lax.axis_index(axis_name)
        b, s_loc = ids.shape
        if layout == "zigzag":
            # device d holds half-chunks [chunk d | chunk 2P-1-d]
            ch = s_loc // 2
            pos = jnp.concatenate(
                [
                    chunk * ch + jnp.arange(ch),
                    (2 * num_chunks - 1 - chunk) * ch + jnp.arange(ch),
                ]
            )[None, :]
        else:
            pos = chunk * s_loc + jnp.arange(s_loc)[None, :]
        rng = None
        if noise_rng is not None:
            rng = jax.random.fold_in(noise_rng, chunk)
        # NEFTune scales noise by alpha/sqrt(S·H) with the LOCAL chunk
        # length; divide alpha by sqrt(P) so the effective per-token noise
        # matches the unsharded objective's alpha/sqrt(S_global·H).
        local_alpha = neftune_alpha / float(np.sqrt(num_chunks))
        logits = model.apply(
            {"params": params}, ids, jnp.ones_like(ids),
            positions=jnp.broadcast_to(pos, ids.shape),
            neftune_alpha=local_alpha, noise_rng=rng,
        )
        if layout == "zigzag":
            # Per-half next-token labels. Half-chunk successors:
            #   chunk d      → chunk d+1   = h1-first of device d+1,
            #                  except d = P-1 whose successor is chunk P
            #                  = its OWN h2-first;
            #   chunk 2P-1-d → chunk 2P-d  = h2-first of device d-1;
            #                  d = 0 ends the sequence (label invalid).
            ch = s_loc // 2
            h1, h2 = ids[:, :ch], ids[:, ch:]
            nxt = [(i, (i - 1) % num_chunks) for i in range(num_chunks)]
            prv = [(i, (i + 1) % num_chunks) for i in range(num_chunks)]
            h1_first_next = jax.lax.ppermute(h1[:, :1], axis_name, nxt)
            h2_first_prev = jax.lax.ppermute(h2[:, :1], axis_name, prv)
            h1_last = jnp.where(chunk == num_chunks - 1, h2[:, :1], h1_first_next)
            labels = jnp.concatenate([h1[:, 1:], h1_last, h2[:, 1:], h2_first_prev], axis=1)
            last_valid = jnp.where(
                chunk == 0,
                jnp.arange(s_loc) < s_loc - 1,
                jnp.ones((s_loc,), bool),
            )
        else:
            # Next-token labels: shift left; the last label of each chunk is
            # the FIRST token of the next chunk (device i receives from i+1).
            perm = [(i, (i - 1) % num_chunks) for i in range(num_chunks)]
            first_next = jax.lax.ppermute(ids[:, :1], axis_name, perm)
            labels = jnp.concatenate([ids[:, 1:], first_next], axis=1)
            # The final chunk's wrap-around label is invalid.
            last_valid = jnp.where(
                chunk == num_chunks - 1,
                jnp.arange(s_loc) < s_loc - 1,
                jnp.ones((s_loc,), bool),
            )
        nll = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
        w = last_valid.astype(jnp.float32)[None, :]
        loss_sum = jax.lax.psum((nll * w).sum(), axes)
        count = jax.lax.psum((w * jnp.ones((b, 1), jnp.float32)).sum(), axes)
        return loss_sum / count

    ids_spec = P(data_axis, axis_name) if data_axis else P(None, axis_name)

    def loss(params, input_ids, noise_rng=None, neftune_alpha: float = 0.0):
        mapped = jax.shard_map(
            lambda p, i: per_chunk(p, i, noise_rng, neftune_alpha),
            mesh=mesh,
            in_specs=(P(), ids_spec),
            out_specs=P(),
            check_vma=False,
        )
        return mapped(params, input_ids)

    return loss
