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


def test_int4_roundtrip_accuracy():
    """Per-group int4: error bounded by half a quantization step of the
    group absmax (scale = absmax/7)."""
    import numpy as np

    from dalm_tpu.models.quant import dequantize_tensor_int4, quantize_tensor_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 96)), jnp.float32)
    d = quantize_tensor_int4(w, group=64)
    assert d["q4"].shape == (128, 96) and d["q4"].dtype == jnp.uint8
    n_groups = d["scale4"].shape[0]
    group = 256 // n_groups
    deq = dequantize_tensor_int4(d)
    err = np.abs(np.asarray(deq - w))
    gmax = np.abs(np.asarray(w)).reshape(n_groups, group, 96).max(axis=1)
    bound = np.repeat(gmax / 7.0 * 0.5 + 1e-6, group, axis=0)
    assert (err <= bound).all()


def test_int4_group_fallback():
    """K not divisible by 64 falls back to a smaller group."""
    import numpy as np

    from dalm_tpu.models.quant import dequantize_tensor_int4, quantize_tensor_int4

    w = jnp.asarray(np.random.default_rng(1).normal(size=(96, 32)), jnp.float32)
    d = quantize_tensor_int4(w, group=64)  # K/2=48 needs 8*g | 48 -> g=2
    assert d["scale4"].shape[0] == 96 // 2
    deq = dequantize_tensor_int4(d)
    assert deq.shape == (96, 32)
    assert float(jnp.max(jnp.abs(deq - w))) < float(jnp.max(jnp.abs(w))) / 7.0


def test_flexlinear_int4_path():
    import numpy as np

    from dalm_tpu.models.layers import FlexLinear
    from dalm_tpu.models.quant import dequantize_tensor_int4, quantize_tensor_int4

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32) * 0.05
    quant = quantize_tensor_int4(w)
    got = FlexLinear(64).apply({"params": {}, "quant": quant}, x)
    want = x @ dequantize_tensor_int4(quant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    lora = {
        "a": jnp.asarray(rng.normal(size=(128, 4)), jnp.float32) * 0.1,
        "b": jnp.asarray(rng.normal(size=(4, 64)), jnp.float32) * 0.1,
    }
    with_lora = FlexLinear(64).apply({"params": {}, "quant": quant, "lora": lora}, x)
    np.testing.assert_allclose(
        np.asarray(with_lora - got), np.asarray((x @ lora["a"]) @ lora["b"]),
        rtol=1e-4, atol=1e-5,
    )


def test_int4_packed_decode_matches_lockstep():
    """Engine with int4 `quant` storage == lockstep generate with the
    same packed collections (the 4-bit serving tier)."""
    import numpy as np

    from dalm_tpu.core.mesh import unbox
    from dalm_tpu.models.decode_engine import DecodeEngine
    from dalm_tpu.models.decoder import Decoder, DecoderConfig
    from dalm_tpu.models.generate import build_greedy_generate
    from dalm_tpu.models.qlora import pack_qlora_frozen

    P = 16
    decoder = Decoder(DecoderConfig.tiny(vocab_size=128))
    params = unbox(
        decoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32), jnp.ones((1, P), jnp.int32)
        )["params"]
    )
    residual, quant = pack_qlora_frozen(params, quantize="int4", min_size=1)
    rng = np.random.default_rng(3)
    ids = np.zeros((5, P), np.int32)
    mask = np.zeros((5, P), np.int32)
    for i in range(5):
        real = int(rng.integers(3, P))
        ids[i, P - real :] = rng.integers(5, 120, size=real)
        mask[i, P - real :] = 1
    gen = build_greedy_generate(
        decoder, 5, eos_token_id=None, pad_token_id=0,
        extra_collections={"quant": quant},
    )
    expected = np.asarray(gen(residual, jnp.asarray(ids), jnp.asarray(mask)))
    eng = DecodeEngine(
        decoder, residual, num_slots=2, max_prompt_len=P,
        max_new_tokens=5, eos_token_id=None, pad_token_id=0, decode_chunk=2,
        extra_collections={"quant": quant},
    )
    got = eng.generate(ids, mask)
    got_f = eng.generate_fused(ids, mask)
    for i in range(5):
        assert got[i] == [int(t) for t in expected[i]]
        assert got_f[i] == [int(t) for t in expected[i]]


def test_13b_preset_registered():
    from dalm_tpu.models.decoder import DecoderConfig
    from dalm_tpu.models.registry import DECODER_PRESETS

    cfg = DECODER_PRESETS["llama2-13b"]()
    assert cfg.hidden_size == 5120 and cfg.num_layers == 40
    assert cfg is not None and isinstance(cfg, DecoderConfig)


class TestNF4:
    """NormalFloat4 codebook tier (bnb parity,
    `/root/reference/dalm/models/retriever_only_base_model.py:85-91`)."""

    def test_roundtrip_beats_linear_int4_on_normal_weights(self):
        """nf4's quantile codebook reconstructs ~N(0, σ) weights with
        lower MSE than symmetric linear int4 — the property that makes
        4-bit quality survive on real pretrained weights."""
        from dalm_tpu.models.quant import (
            dequantize_tensor_int4,
            quantize_tensor_int4,
            quantize_tensor_nf4,
        )

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((512, 256)) * 0.02, jnp.float32)
        lin = dequantize_tensor_int4(quantize_tensor_int4(w, group=64))
        nf = dequantize_tensor_int4(quantize_tensor_nf4(w, group=64))
        mse_lin = float(jnp.mean((lin - w) ** 2))
        mse_nf = float(jnp.mean((nf - w) ** 2))
        assert mse_nf < mse_lin, (mse_nf, mse_lin)

    def test_exact_zero_and_extremes(self):
        from dalm_tpu.models.quant import dequantize_tensor_int4, quantize_tensor_nf4

        w = jnp.zeros((128, 8), jnp.float32)
        w = w.at[0, 0].set(1.0).at[1, 0].set(-1.0)
        deq = dequantize_tensor_int4(quantize_tensor_nf4(w, group=64))
        # zeros reconstruct exactly (codebook has an exact 0), extremes hit ±absmax
        assert float(jnp.abs(deq[2:, :]).max()) == 0.0
        np.testing.assert_allclose(float(deq[0, 0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(deq[1, 0]), -1.0, rtol=1e-6)

    def test_kernel_nf4_variant_matches_dequant_oracle(self):
        from dalm_tpu.kernels.int4_matmul import _int4_matmul_fwd_pallas
        from dalm_tpu.models.quant import dequantize_tensor_int4, quantize_tensor_nf4

        rng = np.random.default_rng(3)
        K, N, M = 1024, 256, 8
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        d = quantize_tensor_nf4(w, group=64)
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
        ref = x.astype(jnp.float32) @ dequantize_tensor_int4(d, jnp.float32)
        out = _int4_matmul_fwd_pallas(
            x, d["q4"], d["scale4"], block_k=256, block_n=256,
            interpret=True, variant="nf4",
        )
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / float(
            jnp.max(jnp.abs(ref))
        )
        assert rel < 0.02, rel

    def test_flexlinear_nf4_end_to_end(self):
        """pack_qlora_frozen(quantize='nf4') + a decoder forward: the nf4
        marker routes through FlexLinear to the codebook dequant and the
        output approximates the unquantized forward."""
        from dalm_tpu.core.mesh import unbox
        from dalm_tpu.models.decoder import Decoder, DecoderConfig
        from dalm_tpu.models.qlora import pack_qlora_frozen

        P = 16
        decoder = Decoder(DecoderConfig.tiny(vocab_size=128))
        params = unbox(
            decoder.init(
                jax.random.PRNGKey(0), jnp.zeros((1, P), jnp.int32),
                jnp.ones((1, P), jnp.int32),
            )["params"]
        )
        ids = jnp.asarray(np.random.default_rng(1).integers(5, 120, size=(2, P)), jnp.int32)
        mask = jnp.ones_like(ids)
        full = decoder.apply({"params": params}, ids, mask)
        residual, quant = pack_qlora_frozen(params, quantize="nf4", min_size=1)
        got = decoder.apply({"params": residual, "quant": quant}, ids, mask)
        denom = float(jnp.abs(full).max())
        assert float(jnp.abs(got - full).max()) / denom < 0.12


def test_quant_module_import_under_trace_is_safe():
    """The NF4 codebook must be a host constant: when this module's
    FIRST import happens inside a jit trace (deferred imports in
    kernels do exactly that), a module-level `jnp.asarray` becomes a
    tracer that escapes the trace and poisons every later use
    (UnexpectedTracerError — hit by the round-5 serve drive). Fresh
    subprocess so the first import really is inside the trace."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    code = """
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

@jax.jit
def f(x):
    from dalm_tpu.models.quant import NF4_CODEBOOK  # first import, traced
    return x + jnp.take(jnp.asarray(NF4_CODEBOOK), jnp.zeros((), jnp.int32))

f(jnp.ones(()))
# second use OUTSIDE any trace must not see a leaked tracer
from dalm_tpu.models.quant import quantize_tensor_nf4, dequantize_tensor_int4
import numpy as np
w = np.random.default_rng(0).normal(size=(64, 8)).astype(np.float32)
d = quantize_tensor_nf4(jnp.asarray(w))
out = dequantize_tensor_int4(d, jnp.float32)
assert np.isfinite(np.asarray(out)).all()
print("IMPORT_UNDER_TRACE_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "IMPORT_UNDER_TRACE_OK" in out.stdout
