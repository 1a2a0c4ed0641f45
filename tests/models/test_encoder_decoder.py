"""Shape/causality/property tests for the Flax backbones."""

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.decoder import Decoder, DecoderConfig
from dalm_tpu.models.encoder import Encoder, EncoderConfig


def test_encoder_shapes_and_determinism():
    cfg = EncoderConfig.tiny()
    model = Encoder(cfg)
    ids = jnp.ones((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out1 = model.apply({"params": params}, ids, mask)
    out2 = model.apply({"params": params}, ids, mask)
    assert out1.shape == (2, 10, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_encoder_padding_invariance():
    """Outputs at real positions must not depend on padded positions."""
    cfg = EncoderConfig.tiny()
    model = Encoder(cfg)
    rng = np.random.default_rng(0)
    ids_real = rng.integers(1, 200, size=(1, 6))
    ids_a = np.concatenate([ids_real, np.zeros((1, 4), int)], axis=1)
    ids_b = np.concatenate([ids_real, 77 * np.ones((1, 4), int)], axis=1)
    mask = np.array([[1] * 6 + [0] * 4])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_a), jnp.asarray(mask))["params"]
    out_a = model.apply({"params": params}, jnp.asarray(ids_a), jnp.asarray(mask))
    out_b = model.apply({"params": params}, jnp.asarray(ids_b), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_a)[:, :6], np.asarray(out_b)[:, :6], atol=1e-5
    )


def test_decoder_causality():
    """Changing a future token must not affect earlier logits."""
    cfg = DecoderConfig.tiny()
    model = Decoder(cfg)
    ids_a = jnp.asarray([[5, 6, 7, 8, 9, 10]])
    ids_b = ids_a.at[0, 4].set(99)
    mask = jnp.ones_like(ids_a)
    params = model.init(jax.random.PRNGKey(0), ids_a, mask)["params"]
    la = model.apply({"params": params}, ids_a, mask)
    lb = model.apply({"params": params}, ids_b, mask)
    np.testing.assert_allclose(np.asarray(la)[:, :4], np.asarray(lb)[:, :4], atol=1e-5)
    assert np.abs(np.asarray(la)[:, 4:] - np.asarray(lb)[:, 4:]).max() > 1e-3


def test_decoder_kv_cache_matches_full_forward():
    """Token-by-token decode with cache == full-sequence forward."""
    cfg = DecoderConfig.tiny()
    model = Decoder(cfg)
    T = 7
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2]])
    mask = jnp.ones((1, T), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    full = model.apply({"params": params}, ids, mask)

    cache = model.init_kv_cache(1, T)
    outs = []
    for t in range(T):
        step_ids = ids[:, t : t + 1]
        logits, cache = model.apply(
            {"params": params},
            step_ids,
            jnp.ones((1, T), jnp.int32),
            kv_cache=cache,
            cache_index=t,
        )
        outs.append(np.asarray(logits)[:, 0])
    stepwise = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepwise, np.asarray(full), atol=2e-4)


def test_decoder_left_padding_positions():
    """Left-padded sequences get rotary positions starting at 0."""
    cfg = DecoderConfig.tiny()
    model = Decoder(cfg)
    core = [11, 12, 13]
    ids_padded = jnp.asarray([[0, 0] + core])
    mask_padded = jnp.asarray([[0, 0, 1, 1, 1]])
    ids_plain = jnp.asarray([core])
    mask_plain = jnp.ones((1, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids_plain, mask_plain)["params"]
    lp = model.apply({"params": params}, ids_padded, mask_padded)
    lf = model.apply({"params": params}, ids_plain, mask_plain)
    np.testing.assert_allclose(np.asarray(lp)[:, 2:], np.asarray(lf), atol=1e-4)
