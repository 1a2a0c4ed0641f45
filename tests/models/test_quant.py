"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.quant import (
    dequantize_params,
    quantization_error,
    quantize_params,
    quantize_tensor,
    dequantize_tensor,
)


def test_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    q = quantize_tensor(w)
    assert q["__int8__"].dtype == jnp.int8
    deq = dequantize_tensor(q)
    # symmetric int8: error ≤ scale/2 per column
    max_err = np.abs(np.asarray(deq - w))
    bound = np.asarray(q["scale"])[0] / 2 + 1e-6
    assert (max_err <= bound[None, :]).all()


def test_zero_column_safe():
    w = jnp.zeros((8, 16))
    q = quantize_tensor(w)
    assert np.isfinite(np.asarray(dequantize_tensor(q))).all()


def test_param_tree_selective():
    params = {
        "layer_0": {
            "attention": {"query": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones((64,))}},
            "norm": {"scale": jnp.ones((64,))},
        },
        "embed": {"embedding": jnp.ones((100, 64))},
        "small": {"kernel": jnp.ones((2, 2))},
    }
    q = quantize_params(params, min_size=1024)
    assert "__int8__" in q["layer_0"]["attention"]["query"]["kernel"]
    assert isinstance(q["embed"]["embedding"], jnp.ndarray)  # embeddings untouched
    assert isinstance(q["small"]["kernel"], jnp.ndarray)  # small kernels untouched
    deq = dequantize_params(q)
    np.testing.assert_allclose(np.asarray(deq["layer_0"]["attention"]["query"]["kernel"]), 1.0, rtol=1e-2)
    assert quantization_error(q) >= 0


def test_encoder_quality_preserved():
    """Quantized encoder embeddings stay close to full precision."""
    from dalm_tpu.models.embedder import SentenceEmbedder
    from dalm_tpu.models.encoder import EncoderConfig

    model = SentenceEmbedder(EncoderConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(0), seq_len=8)
    from dalm_tpu.core.mesh import unbox

    params = unbox(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 500, size=(4, 8)))
    mask = jnp.ones((4, 8), jnp.int32)
    full = np.asarray(model.embed(params, ids, mask))
    qparams = dequantize_params(quantize_params(params, min_size=64))
    quant = np.asarray(model.embed(qparams, ids, mask))
    cos = (full * quant).sum(-1)
    assert (cos > 0.999).all(), cos
