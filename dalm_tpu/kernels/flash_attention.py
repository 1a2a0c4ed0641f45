"""First-party Pallas flash attention (forward + backward, TPU).

Blockwise attention that never materializes the (S, S) score matrix:
grid (B, H, q_blocks, k_blocks) streams K/V blocks through VMEM (the
pallas pipeline double-buffers the HBM→VMEM DMA) while an online-softmax
state — running max ``m``, normalizer ``l``, and f32 accumulator —
carries across the innermost k grid dimension in VMEM scratch. One
(block_q, D) × (D, block_k) MXU matmul per block for scores, one
(block_q, block_k) × (block_k, D) for the value gather. Causally
invisible blocks (whole block above the diagonal) skip all compute via
``pl.when``.

Internal layout is (B, H, S, D) — TPU block mappings need the last two
dims to be the tiled (sublane, lane) pair, so S and D must be innermost.
The public wrapper accepts the framework-native (B, S, H, D) and
transposes (XLA fuses these into the surrounding ops).

Distinct from `jax.experimental.pallas.ops.tpu.flash_attention`: the
forward here exposes the log-sum-exp residual, which makes the kernel
REUSABLE AS A PARTIAL — attention outputs over disjoint key sets merge
exactly via

    m = max(lse1, lse2); w_i = exp(lse_i - m)
    out = (out1*w1 + out2*w2) / (w1+w2);  lse = m + log(w1+w2)

— which is how `kernels/ring_attention.py` composes this kernel across
ring steps (each device's K/V chunk is one disjoint key set), and how
the backward recomputes per-block probabilities (``p = exp(s - lse)``)
instead of storing them.

The reference has no attention kernels at all (torch SDPA inside HF
models, SURVEY §2.3); this removes the third-party kernel dependence for
the SFT long-sequence path (`models/decoder.py` attention_impl="flash")
and the context-parallel ring. Backward is the standard flash
recompute: ``D = rowsum(dout·out)``; per block
``p = exp(s·scale − lse)``, ``ds = p·(dout·vᵀ − D)·scale``, accumulated
into dq (q-block-major grid) and dk/dv (k-block-major grid) by two
kernels.

Masking: ``causal`` (with ``q_offset`` for ring chunks whose queries sit
``q_offset`` positions after key 0) and/or ``segment_ids`` (packed-SFT
segments; pads form their own segment). Fully-masked rows produce
out=0, lse=NEG_INF — exactly the neutral element of the merge above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # finite: fully-masked rows stay NaN-free


def _fit_block(seq: int, want: int) -> int:
    """Largest block ≤ ``want`` that divides ``seq``, preferring multiples
    of 128 (the lane width). Measured on v5e (B4 S2560 H12 D64): 512-blocks
    run the fwd 2.4× and fwd+bwd 3.1× faster than 128-blocks — fewer grid
    steps and larger MXU ops dominate the extra VMEM."""
    b = min(want, seq)
    while b > 128 and (seq % b or b % 128):
        b -= 128
    if seq % b:
        b = seq  # tiny/odd sequences (interpret-mode tests): one block
    return b


def _visibility(causal: bool, i, j, block_q: int, block_k: int, q_offset: int,
                window=None):
    """None if block (i, j) is unconditionally visible, else a traced
    bool that is False when the whole block is masked — above the causal
    diagonal, or (with ``window``) entirely beyond the sliding-window
    band. ``q_offset``: global position of q row 0 relative to k row 0."""
    vis = None
    if causal:
        last_q = q_offset + (i + 1) * block_q - 1
        first_k = j * block_k
        vis = last_q >= first_k
    if window is not None:
        first_q = q_offset + i * block_q
        last_k = j * block_k + block_k - 1
        in_band = first_q - last_k < window
        vis = in_band if vis is None else (vis & in_band)
    return vis


def _block_mask(causal, seg_q, seg_k, i, j, block_q, block_k, q_offset, window=None):
    """(block_q, block_k) bool keep-mask; None means fully visible."""
    keep = None
    if causal or window is not None:
        gq = q_offset + i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        gk = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if causal:
            keep = gq >= gk
        if window is not None:
            band = (gq - gk) < window
            keep = band if keep is None else (keep & band)
    if seg_q is not None:
        same = seg_q[:, None] == seg_k[None, :]
        keep = same if keep is None else (keep & same)
    return keep


def _guarded(vis, fn):
    """Run ``fn`` always (vis None) or under ``pl.when(vis)``."""
    if vis is None:
        fn()
    else:
        pl.when(vis)(fn)


def _no_seg(kernel, seg_pos: int):
    """Adapter: a kernel compiled without segment operands still calls the
    shared body with seg refs None at position ``seg_pos`` (pallas passes
    refs positionally; seg refs sit after the ``seg_pos`` input refs)."""

    def wrapped(*refs, **cfg):
        return kernel(*refs[:seg_pos], None, None, *refs[seg_pos:], **cfg)

    return wrapped


# ---------------------------------------------------------------------------
# forward  (all internal shapes (B, H, S, D); seg (B, 1, S); lse (B, H, 1, S))
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref, k_ref, v_ref, seg_q_ref, seg_k_ref,
    out_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale, causal, block_q, block_k, q_offset, window, softcap,
):
    i, j = pl.program_id(2), pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) f32
        if softcap is not None:
            # Gemma2 logit softcapping: cap BEFORE masking (HF order) —
            # capping a NEG_INF-masked entry would turn it into ±cap.
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        seg_q = seg_q_ref[0, 0, :] if seg_q_ref is not None else None
        seg_k = seg_k_ref[0, 0, :] if seg_k_ref is not None else None
        keep = _block_mask(causal, seg_q, seg_k, i, j, block_q, block_k, q_offset, window)
        if keep is not None:
            s = jnp.where(keep, s, NEG_INF)
        m_prev = m_scr[:]  # (block_q, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)  # fully-masked rows: p == 0, l == 0
        alpha = jnp.exp(m_prev - m_new)  # (block_q, 1)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    _guarded(_visibility(causal, i, j, block_q, block_k, q_offset, window), _compute)

    @pl.when(j == pl.num_programs(3) - 1)
    def _finalize():
        l = l_scr[:]  # (block_q, 1)
        out_ref[0, 0, :, :] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
        lse = jnp.where(l > 0.0, m_scr[:] + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
        lse_ref[0, 0, 0, :] = lse[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "q_offset", "interpret", "window", "softcap"),
)
def _flash_fwd(
    q, k, v, segment_ids_q=None, segment_ids_k=None, *,
    causal=True, scale=None, block_q=512, block_k=512, q_offset=0, interpret=False,
    window=None, softcap=None,
):
    """(B, H, Sq, D) q; (B, Hk, Sk, D) k/v with Hk | H (GQA: query head h
    reads kv head h // (H//Hk)) → (out (B,H,Sq,D) in q.dtype, lse (B,H,Sq) f32)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    group = H // k.shape[1]
    block_q = _fit_block(Sq, block_q)
    block_k = _fit_block(Sk, block_k)
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    nq, nk = Sq // block_q, Sk // block_k

    cfg = dict(scale=scale, causal=causal, block_q=block_q, block_k=block_k, q_offset=q_offset, window=window, softcap=softcap)
    has_seg = segment_ids_q is not None
    if has_seg:
        assert segment_ids_k is not None
        kernel = functools.partial(_fwd_kernel, **cfg)
        seg_specs = [
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j), memory_space=pltpu.VMEM),
        ]
        seg_args = [
            jnp.asarray(segment_ids_q, jnp.int32)[:, None, :],
            jnp.asarray(segment_ids_k, jnp.int32)[:, None, :],
        ]
    else:
        kernel = functools.partial(_no_seg(_fwd_kernel, 3), **cfg)
        seg_specs, seg_args = [], []

    out, lse = pl.pallas_call(
        kernel,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, j, 0), memory_space=pltpu.VMEM),
            *seg_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, *seg_args)
    return out, lse[:, :, 0, :]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, seg_q_ref, seg_k_ref,
    dq_ref, dq_scr,
    *, scale, causal, block_q, block_k, q_offset, window, softcap,
):
    i, j = pl.program_id(2), pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :]
        lse = lse_ref[0, 0, 0, :]
        dsum = dsum_ref[0, 0, 0, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        seg_q = seg_q_ref[0, 0, :] if seg_q_ref is not None else None
        seg_k = seg_k_ref[0, 0, :] if seg_k_ref is not None else None
        keep = _block_mask(causal, seg_q, seg_k, i, j, block_q, block_k, q_offset, window)
        p = jnp.exp(s - lse[:, None])  # true softmax probs (global lse)
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum[:, None])  # grad wrt (capped) scores, f32
        if softcap is not None:
            # d/dx [cap·tanh(x/cap)] = 1 − tanh²(x/cap) = 1 − (s/cap)²
            # (s here is already the capped value).
            t = s * (1.0 / softcap)
            ds = ds * (1.0 - t * t)
        ds = ds * scale  # (block_q, block_k) f32
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _guarded(_visibility(causal, i, j, block_q, block_k, q_offset, window), _compute)

    @pl.when(j == pl.num_programs(3) - 1)
    def _write():
        dq_ref[0, 0, :, :] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, seg_q_ref, seg_k_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, block_q, block_k, q_offset, nq, window, softcap,
):
    # k-block major; the inner dim enumerates (query-head-group, q-block)
    j, t = pl.program_id(2), pl.program_id(3)
    i = t % nq

    @pl.when(t == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :]
        lse = lse_ref[0, 0, 0, :]
        dsum = dsum_ref[0, 0, 0, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        seg_q = seg_q_ref[0, 0, :] if seg_q_ref is not None else None
        seg_k = seg_k_ref[0, 0, :] if seg_k_ref is not None else None
        keep = _block_mask(causal, seg_q, seg_k, i, j, block_q, block_k, q_offset, window)
        p = jnp.exp(s - lse[:, None])
        if keep is not None:
            p = jnp.where(keep, p, 0.0)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dsum[:, None])
        if softcap is not None:
            t = s * (1.0 / softcap)  # tanh'(pre/cap) = 1 − (s/cap)²
            ds = ds * (1.0 - t * t)
        ds = ds * scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _guarded(_visibility(causal, i, j, block_q, block_k, q_offset, window), _compute)

    @pl.when(t == pl.num_programs(3) - 1)
    def _write():
        dk_ref[0, 0, :, :] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "q_offset", "interpret", "window", "softcap"),
)
def _flash_bwd(
    q, k, v, out, lse, do, segment_ids_q=None, segment_ids_k=None, *,
    causal=True, scale=None, block_q=512, block_k=512, q_offset=0, interpret=False,
    window=None, softcap=None,
):
    """(B, H, S, D) in → (dq, dk, dv) in the input dtypes; k/v may carry
    fewer (GQA) heads — dk/dv come back at the kv head count, with the
    dkv grid enumerating (kv_head, k_block, group·q_blocks) so grouped
    query heads accumulate into their shared kv block race-free.

    ``lse``/``out``/``do`` may cover MORE keys than ``k`` (the global
    values of a ring pass while k is one chunk): the formulas stay exact
    because p = exp(s − lse) is the true global softmax probability.
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    Hk = k.shape[1]
    group = H // Hk
    block_q = _fit_block(Sq, block_q)
    block_k = _fit_block(Sk, block_k)
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    nq, nk = Sq // block_q, Sk // block_k
    dsum = jnp.einsum("bhsd,bhsd->bhs", do.astype(jnp.float32), out.astype(jnp.float32))
    lse4 = lse[:, :, None, :]
    dsum4 = dsum[:, :, None, :]

    cfg = dict(scale=scale, causal=causal, block_q=block_q, block_k=block_k, q_offset=q_offset, window=window, softcap=softcap)
    has_seg = segment_ids_q is not None
    seg_args = (
        [
            jnp.asarray(segment_ids_q, jnp.int32)[:, None, :],
            jnp.asarray(segment_ids_k, jnp.int32)[:, None, :],
        ]
        if has_seg else []
    )

    def in_specs(kq_major: bool):
        if not kq_major:  # grid (B, H, nq, nk): i = dim 2, j = dim 3
            bi = lambda b, h, i, j: (b, h, i, 0)  # noqa: E731
            bj = lambda b, h, i, j: (b, h // group, j, 0)  # noqa: E731
            si = lambda b, h, i, j: (b, 0, i)  # noqa: E731
            sj = lambda b, h, i, j: (b, 0, j)  # noqa: E731
            li = lambda b, h, i, j: (b, h, 0, i)  # noqa: E731
        else:
            # grid (B, Hk, nk, group·nq): dim 3 enumerates (g, i) pairs so
            # every query head sharing kv head hk accumulates into the
            # SAME dk/dv scratch sequentially (no cross-program race).
            bi = lambda b, hk, j, t: (b, hk * group + t // nq, t % nq, 0)  # noqa: E731
            bj = lambda b, hk, j, t: (b, hk, j, 0)  # noqa: E731
            si = lambda b, hk, j, t: (b, 0, t % nq)  # noqa: E731
            sj = lambda b, hk, j, t: (b, 0, j)  # noqa: E731
            li = lambda b, hk, j, t: (b, hk * group + t // nq, 0, t % nq)  # noqa: E731
        base = [
            pl.BlockSpec((1, 1, block_q, D), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), bj, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), bj, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), li, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), li, memory_space=pltpu.VMEM),
        ]
        if has_seg:
            base += [
                pl.BlockSpec((1, 1, block_q), si, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k), sj, memory_space=pltpu.VMEM),
            ]
        return base

    cparams = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    dq_kernel = (
        functools.partial(_bwd_dq_kernel, **cfg)
        if has_seg else functools.partial(_no_seg(_bwd_dq_kernel, 6), **cfg)
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, H, nq, nk),
        in_specs=in_specs(kq_major=False),
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=cparams,
        interpret=interpret,
    )(q, k, v, do, lse4, dsum4, *seg_args)

    dkv_cfg = dict(cfg, nq=nq)
    dkv_kernel = (
        functools.partial(_bwd_dkv_kernel, **dkv_cfg)
        if has_seg else functools.partial(_no_seg(_bwd_dkv_kernel, 6), **dkv_cfg)
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hk, nk, group * nq),
        in_specs=in_specs(kq_major=True),
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, hk, j, t: (b, hk, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, hk, j, t: (b, hk, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hk, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hk, Sk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(q, k, v, do, lse4, dsum4, *seg_args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP  ((B, S, H, D) layout)
# ---------------------------------------------------------------------------

def _to_bhsd(x):
    return None if x is None else x.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_attention(q, k, v, seg_q, seg_k, causal, scale, block_q, block_k, interpret, window, softcap):
    out, _ = _flash_fwd(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), seg_q, seg_k,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
        window=window, softcap=softcap,
    )
    return _to_bhsd(out)


def _fa_fwd(q, k, v, seg_q, seg_k, causal, scale, block_q, block_k, interpret, window, softcap):
    qt, kt, vt = _to_bhsd(q), _to_bhsd(k), _to_bhsd(v)
    out, lse = _flash_fwd(
        qt, kt, vt, seg_q, seg_k,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
        window=window, softcap=softcap,
    )
    return _to_bhsd(out), (qt, kt, vt, seg_q, seg_k, out, lse)


def _fa_bwd(causal, scale, block_q, block_k, interpret, window, softcap, res, do):
    qt, kt, vt, seg_q, seg_k, out, lse = res
    dq, dk, dv = _flash_bwd(
        qt, kt, vt, out, lse, _to_bhsd(do), seg_q, seg_k,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
        window=window, softcap=softcap,
    )
    return _to_bhsd(dq), _to_bhsd(dk), _to_bhsd(dv), None, None


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(
    q, k, v, segment_ids_q=None, segment_ids_k=None, *,
    causal=True, scale=None, block_q=512, block_k=512, interpret=False,
    window=None, softcap=None,
):
    """Flash attention on (B, S, H, D) tensors; differentiable.

    ``window``: sliding-window band (Mistral-family) — keys further than
    ``window`` positions behind a query are masked, and blocks entirely
    beyond the band skip compute (long-context cost becomes O(S·window)).

    ``softcap``: Gemma2 logit softcapping — scores pass
    ``cap·tanh(s/cap)`` before masking/softmax, and the backward chains
    the tanh derivative through the recomputed scores.

    GQA: ``k``/``v`` may carry fewer heads (Hk | H) — query head h reads
    kv head h // (H//Hk) directly in the kernel (no repeat, no extra
    HBM); gradients come back at the kv head count.

    ``segment_ids_*``: (B, S) int — tokens attend only within their own
    segment (packed SFT / padding isolation; give pads a segment of
    their own). ``scale`` defaults to 1/sqrt(D). Sequence lengths must
    be multiples of the block sizes (the decoder gates on S % 128 == 0).
    """
    return _flash_attention(
        q, k, v, segment_ids_q, segment_ids_k, causal, scale, block_q, block_k, interpret, window, softcap
    )
