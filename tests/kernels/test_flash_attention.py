"""First-party Pallas flash attention (kernels/flash_attention.py).

Interpret-mode exactness against a dense einsum oracle (f32), covering:
forward (causal / non-causal / segments / q_offset), gradients through
the custom VJP, and the (out, lse) partial-merge identity that ring
attention composes over. The compiled TPU path is exercised by the SFT
trainer on hardware; these tests pin the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.kernels.flash_attention import _flash_fwd, flash_attention


def oracle(q, k, v, causal=True, seg_q=None, seg_k=None, scale=None, q_offset=0):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = 1.0 / D ** 0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    keep = jnp.ones((Sq, Sk), bool)
    if causal:
        keep = (q_offset + jnp.arange(Sq))[:, None] >= jnp.arange(Sk)[None, :]
    keep = keep[None, None]
    if seg_q is not None:
        keep = keep & (seg_q[:, None, :, None] == seg_k[:, None, None, :])
    s = jnp.where(keep, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(keep, p, 0.0)  # fully-masked rows -> 0, not uniform
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _qkv(B=2, S=256, H=2, D=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


def test_forward_causal_matches_oracle():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, oracle(q, k, v, causal=True), atol=2e-5)


def test_forward_non_causal():
    q, k, v = _qkv(seed=1)
    out = flash_attention(q, k, v, causal=False, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, oracle(q, k, v, causal=False), atol=2e-5)


def test_forward_segments():
    q, k, v = _qkv(seed=2)
    rng = np.random.default_rng(2)
    seg = jnp.sort(jnp.asarray(rng.integers(0, 3, size=(2, 256)), jnp.int32), axis=1)
    out = flash_attention(q, k, v, seg, seg, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        out, oracle(q, k, v, causal=True, seg_q=seg, seg_k=seg), atol=2e-5
    )


def test_forward_uneven_blocks():
    """block_q != block_k and blocks that don't tile 128-aligned seqs."""
    q, k, v = _qkv(S=384, seed=3)
    out = flash_attention(q, k, v, causal=True, block_q=256, block_k=128, interpret=True)
    np.testing.assert_allclose(out, oracle(q, k, v, causal=True), atol=2e-5)


def test_gradients_match_oracle():
    q, k, v = _qkv(seed=4)

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(oracle(q, k, v, causal=True) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_gradients_with_segments():
    q, k, v = _qkv(seed=5)
    rng = np.random.default_rng(5)
    seg = jnp.sort(jnp.asarray(rng.integers(0, 2, size=(2, 256)), jnp.int32), axis=1)

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, seg, seg, causal=True, block_q=128, block_k=128, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(oracle(q, k, v, causal=True, seg_q=seg, seg_k=seg) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.parametrize("k_lo", [0, 128])
def test_q_offset_ring_chunk_semantics(k_lo):
    """q_offset shifts the causal diagonal exactly like a ring chunk:
    queries are global positions [128, 256), keys [k_lo, k_lo+128);
    k_lo=0 → earlier chunk (fully visible), k_lo=128 → own chunk
    (standard diagonal)."""
    q, k, v = _qkv(S=256, seed=6)
    T = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    qq = q[:, 128:]
    kk, vv = k[:, k_lo : k_lo + 128], v[:, k_lo : k_lo + 128]
    q_offset = 128 - k_lo
    out, lse = _flash_fwd(
        T(qq), T(kk), T(vv), causal=True, q_offset=q_offset, block_q=128, block_k=128, interpret=True
    )
    ref = oracle(qq, kk, vv, causal=True, q_offset=q_offset)
    np.testing.assert_allclose(T(out), ref, atol=2e-5)
    assert lse.shape == (2, 2, 128)


def test_partial_merge_identity():
    """Splitting keys into chunks and merging (out, lse) pairs reproduces
    full attention — the invariant ring attention is built on."""
    q, k, v = _qkv(S=256, seed=7)
    T = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    out_full, lse_full = _flash_fwd(T(q), T(k), T(v), causal=True, block_q=128, block_k=128, interpret=True)
    o1, l1 = _flash_fwd(T(q), T(k[:, :128]), T(v[:, :128]), causal=True, q_offset=0, block_q=128, block_k=128, interpret=True)
    o2, l2 = _flash_fwd(T(q), T(k[:, 128:]), T(v[:, 128:]), causal=True, q_offset=-128, block_q=128, block_k=128, interpret=True)
    m = jnp.maximum(l1, l2)
    w1, w2 = jnp.exp(l1 - m), jnp.exp(l2 - m)
    merged = (o1 * w1[..., None] + o2 * w2[..., None]) / jnp.maximum(w1 + w2, 1e-30)[..., None]
    np.testing.assert_allclose(merged, out_full, atol=2e-5)
    np.testing.assert_allclose(
        m + jnp.log(jnp.maximum(w1 + w2, 1e-30)), lse_full, atol=2e-5
    )


def test_fully_masked_rows_are_neutral():
    """Rows with no visible keys: out = 0 and lse = -inf-like (the merge
    neutral element), not NaN."""
    q, k, v = _qkv(S=128, seed=8)
    T = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    # keys strictly in the future of every query
    out, lse = _flash_fwd(T(q), T(k), T(v), causal=True, q_offset=-128, block_q=128, block_k=128, interpret=True)
    assert not bool(jnp.isnan(out).any())
    np.testing.assert_allclose(out, jnp.zeros_like(out))
    assert float(jnp.max(lse)) <= -1e29


def test_gqa_forward_matches_oracle():
    """k/v with fewer heads: query head h reads kv head h // group."""
    rng = np.random.default_rng(9)
    B, S, H, Hk, D = 2, 256, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    rep = jnp.repeat(k, H // Hk, axis=2), jnp.repeat(v, H // Hk, axis=2)
    np.testing.assert_allclose(out, oracle(q, rep[0], rep[1], causal=True), atol=2e-5)


def test_gqa_gradients_match_oracle():
    """dk/dv return at the kv head count and equal the repeat-and-sum of
    the full-head oracle gradients."""
    rng = np.random.default_rng(10)
    B, S, H, Hk, D = 1, 256, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        kr = jnp.repeat(k, H // Hk, axis=2)
        vr = jnp.repeat(v, H // Hk, axis=2)
        return jnp.sum(oracle(q, kr, vr, causal=True) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    assert g_fa[1].shape == (B, S, Hk, D)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b, atol=3e-4)


def test_gqa_with_segments():
    rng = np.random.default_rng(11)
    B, S, H, Hk, D = 2, 256, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hk, D)), jnp.float32)
    seg = jnp.sort(jnp.asarray(rng.integers(0, 3, size=(B, S)), jnp.int32), axis=1)
    out = flash_attention(q, k, v, seg, seg, causal=True, block_q=128, block_k=128, interpret=True)
    kr, vr = jnp.repeat(k, 2, axis=2), jnp.repeat(v, 2, axis=2)
    np.testing.assert_allclose(
        out, oracle(q, kr, vr, causal=True, seg_q=seg, seg_k=seg), atol=2e-5
    )


def band_oracle(q, k, v, window, scale=None):
    B, Sq, H, D = q.shape
    if scale is None:
        scale = 1.0 / D ** 0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    gq = jnp.arange(Sq)[:, None]
    gk = jnp.arange(k.shape[1])[None, :]
    keep = (gq >= gk) & ((gq - gk) < window)
    s = jnp.where(keep[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(keep[None, None], p, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("window", [64, 200])
def test_sliding_window_forward(window):
    q, k, v = _qkv(S=384, seed=12)
    out = flash_attention(
        q, k, v, causal=True, window=window, block_q=128, block_k=128, interpret=True
    )
    np.testing.assert_allclose(out, band_oracle(q, k, v, window), atol=2e-5)


def test_sliding_window_gradients():
    q, k, v = _qkv(S=256, seed=13)
    window = 100

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window=window,
                            block_q=128, block_k=128, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(band_oracle(q, k, v, window) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b, atol=3e-4)


def softcap_oracle(q, k, v, cap, scale=None, window=None):
    """Dense oracle with Gemma2 softcapping: cap·tanh(s/cap) BEFORE mask."""
    B, Sq, H, D = q.shape
    if scale is None:
        scale = 1.0 / D ** 0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    s = jnp.tanh(s / cap) * cap
    keep = jnp.arange(Sq)[:, None] >= jnp.arange(Sq)[None, :]
    if window is not None:
        keep = keep & (jnp.arange(Sq)[:, None] - jnp.arange(Sq)[None, :] < window)
    s = jnp.where(keep[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(keep[None, None], p, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_softcap_forward_matches_oracle():
    """Gemma2 attn logit softcapping in-kernel: forward equals the dense
    capped oracle, and the cap is load-bearing (differs from no-cap).
    Small cap (2.0) so tanh saturation actually bends the scores."""
    q, k, v = _qkv(S=256, seed=14)
    cap = 2.0
    out = flash_attention(
        q, k, v, causal=True, softcap=cap, block_q=128, block_k=128, interpret=True
    )
    np.testing.assert_allclose(out, softcap_oracle(q, k, v, cap), atol=2e-5)
    out_nocap = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    assert not np.allclose(out, out_nocap, atol=1e-3)


def test_softcap_with_window_forward():
    q, k, v = _qkv(S=384, seed=15)
    out = flash_attention(
        q, k, v, causal=True, softcap=2.0, window=100,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(out, softcap_oracle(q, k, v, 2.0, window=100), atol=2e-5)


def test_softcap_gradients_match_oracle():
    """Backward chains the tanh derivative through the recomputed
    scores: dq/dk/dv equal the autodiff of the dense capped oracle."""
    q, k, v = _qkv(S=256, seed=16)
    cap = 2.0

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, softcap=cap,
                            block_q=128, block_k=128, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(softcap_oracle(q, k, v, cap) ** 2)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(a, b, atol=3e-4)
