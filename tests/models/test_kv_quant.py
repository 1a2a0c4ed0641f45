"""int8 KV cache (DecoderConfig.kv_quant) — beyond-parity serving tier.

The reference has no serving stack at all (SURVEY.md §2.3); this tier
halves cached decode's K/V HBM traffic (the decode bottleneck) by
storing int8 values + per-(token, head) f32 absmax scales.

What must hold:
- quantize/dequantize round-trip error is bounded by scale/2 per element;
- all cache WRITE paths (scalar dynamic_update_slice, per-row one-hot)
  are bit-identical for the same inputs — quantization is deterministic,
  so the path choice must not leak into the cache;
- quantized cached decode tracks the float-cache decode closely (greedy
  tokens match on the tiny model) — the only delta is bounded rounding;
- the continuous-batching engine under kv_quant reproduces the quantized
  lockstep exactly (the engine invariant, now on the int8 tier).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.core.mesh import unbox
from dalm_tpu.models.decode_engine import DecodeEngine
from dalm_tpu.models.decoder import (
    Decoder,
    DecoderConfig,
    _kv_dequantize,
    _kv_quantize,
)
from dalm_tpu.models.generate import build_greedy_generate

P = 16


def _make(kv_quant):
    cfg = dataclasses.replace(
        DecoderConfig.tiny(vocab_size=128),
        num_heads=4,
        num_kv_heads=2,
        hidden_size=64,
        kv_quant=kv_quant,
    )
    return Decoder(cfg)


@pytest.fixture(scope="module")
def params():
    dec = _make(False)
    return unbox(
        dec.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, P), jnp.int32),
            jnp.ones((1, P), jnp.int32),
        )["params"]
    )


def test_quant_roundtrip_bound(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 32)).astype(np.float32) * 3.0)
    q, scale = _kv_quantize(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 8, 4)
    back = _kv_dequantize(q, scale, jnp.float32)
    # absmax/127 scale, round-to-nearest: error <= scale/2 per element
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-7
    assert (np.abs(np.asarray(back - x)) <= bound).all()


def test_cache_structure_and_bytes():
    dec = _make(True)
    cache = dec.init_kv_cache(2, 32)
    layer = cache["layer_0"]
    assert layer["k"].dtype == jnp.int8 and layer["v"].dtype == jnp.int8
    assert layer["k_scale"].shape == (2, 32, 2)
    q_bytes = sum(v.size * v.dtype.itemsize for v in jax.tree.leaves(cache))
    f_bytes = sum(
        v.size * v.dtype.itemsize
        for v in jax.tree.leaves(_make(False).init_kv_cache(2, 32, jnp.bfloat16))
    )
    # exactly (1 + 4/D)/2 of the bf16 cache: int8 values + one f32 scale
    # per D-row (D=16 on the tiny config ⇒ 0.625; 0.516 at real D=128)
    d = _make(True).cfg.head_dim
    assert q_bytes == int(f_bytes * (1 + 4 / d) / 2)


def test_write_paths_bit_identical(params):
    """Scalar-index prefill == vector-index (all-zero offsets) prefill.

    Same k/v inputs through dynamic_update_slice vs the one-hot MXU
    contraction must land bit-identically (quantization happens before
    the write; the one-hot picks exact int8/f32 values)."""
    dec = _make(True)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 5, 120)
    c_scalar = dec.init_kv_cache(2, P)
    _, c_scalar = dec.apply({"params": params}, ids, kv_cache=c_scalar, cache_index=0)
    c_vec = dec.init_kv_cache(2, P)
    _, c_vec = dec.apply(
        {"params": params}, ids, kv_cache=c_vec,
        cache_index=jnp.zeros((2,), jnp.int32),
    )
    for name in ("k", "k_scale", "v", "v_scale"):
        a = np.asarray(c_scalar["layer_0"][name])
        b = np.asarray(c_vec["layer_0"][name])
        assert (a == b).all(), name


def test_quant_decode_tracks_float_decode(params):
    """Prefill + 4 cached steps: greedy tokens match the float cache and
    per-step logits stay within quantization-noise tolerance."""

    def run(dec):
        cache = dec.init_kv_cache(2, P)
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 5, 120)
        logits, cache = dec.apply({"params": params}, ids, kv_cache=cache, cache_index=0)
        outs = [logits[:, -1]]
        tok = jnp.argmax(logits[:, -1], -1)[:, None]
        for t in range(8, 12):
            lg, cache = dec.apply(
                {"params": params}, tok,
                kv_cache=cache, cache_index=jnp.full((2,), t, jnp.int32),
            )
            outs.append(lg[:, -1])
            tok = jnp.argmax(lg[:, -1], -1)[:, None]
        return np.asarray(jnp.stack(outs))

    lo, lq = run(_make(False)), run(_make(True))
    assert (lo.argmax(-1) == lq.argmax(-1)).all()
    assert np.abs(lo - lq).max() < 0.05


def test_engine_kv_quant_matches_quant_lockstep(params):
    """Continuous batching on the int8 tier reproduces the quantized
    lockstep exactly — slot recycling/admission must not leak."""
    dec = _make(True)
    rng = np.random.default_rng(3)
    n, max_new = 7, 6
    ids = np.zeros((n, P), np.int32)
    mask = np.zeros((n, P), np.int32)
    for i in range(n):
        real = int(rng.integers(3, P))
        ids[i, P - real:] = rng.integers(5, 120, size=real)
        mask[i, P - real:] = 1
    gen = build_greedy_generate(dec, max_new, eos_token_id=None, pad_token_id=0)
    expected = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))
    eng = DecodeEngine(
        dec, params, num_slots=3, max_prompt_len=P,
        max_new_tokens=max_new, eos_token_id=None, pad_token_id=0, decode_chunk=3,
    )
    got = eng.generate(ids, mask)
    for i in range(n):
        assert got[i] == [int(t) for t in expected[i]], f"request {i} diverged"
    # The fused on-device schedule merges prefill rows into the slot pool
    # with a rank-aware select — the int8 tier's 3-d scale buffers caught
    # a fixed (B,1,1,1) broadcast bug here (see decode_engine._merge).
    fused = eng.generate_fused(ids, mask)
    assert fused == got, "fused schedule diverged from host-loop on int8 KV"
