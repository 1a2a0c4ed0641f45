"""W8A8 int8 MXU matmul (kernels/int8_matmul.py).

Checks: forward accuracy vs the exact dequantized matmul, STE gradient
semantics (dx == dy @ W^T, no grads into frozen storage), the FlexLinear
`int8_compute` wiring, and an end-to-end fused-QLoRA train step with
int8 compute on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalm_tpu.kernels.int8_matmul import int8_matmul, rowquant
from dalm_tpu.models.quant import quantize_tensor


def _make(key, m, k, n):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.05
    qt = quantize_tensor(w)
    return x, w, qt["__int8__"], qt["scale"]


def test_rowquant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256), jnp.float32)
    q, s = rowquant(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 1)
    rel = jnp.abs(q.astype(jnp.float32) * s - x).max() / jnp.abs(x).max()
    assert float(rel) < 1.0 / 127  # one quantization step


def test_rowquant_zero_row_safe():
    x = jnp.zeros((2, 64), jnp.float32)
    q, s = rowquant(x)
    assert not np.any(np.isnan(np.asarray(s)))
    assert np.all(np.asarray(q) == 0)


@pytest.mark.parametrize("bwd_int8", [False, True])
def test_forward_matches_dequant(bwd_int8):
    x, w, q, scale = _make(1, 8, 128, 64)
    exact = x @ (q.astype(jnp.float32) * scale)
    got = int8_matmul(x, q, scale, bwd_int8)
    # Activation quantization adds ~1/127 relative error per element;
    # accumulated over K=128 the row-level error stays well under 2%.
    denom = float(jnp.abs(exact).max())
    assert float(jnp.abs(got - exact).max()) / denom < 0.02


def test_forward_3d_batch():
    x, w, q, scale = _make(2, 4, 128, 32)
    x3 = x.reshape(2, 2, 128)
    got = int8_matmul(x3, q, scale, False)
    flat = int8_matmul(x, q, scale, False)
    assert got.shape == (2, 2, 32)
    np.testing.assert_allclose(np.asarray(got).reshape(4, 32), np.asarray(flat), rtol=1e-6)


@pytest.mark.parametrize("bwd_int8", [False, True])
def test_gradient_is_straight_through(bwd_int8):
    x, w, q, scale = _make(3, 8, 128, 64)
    wd = q.astype(jnp.float32) * scale

    def f(x):
        return jnp.sum(jnp.sin(int8_matmul(x, q, scale, bwd_int8)))

    def f_ref(x):
        return jnp.sum(jnp.sin(x @ wd))

    gx = jax.grad(f)(x)
    gref = jax.grad(f_ref)(x)
    # cotangent dy differs slightly (cos of slightly different y) and the
    # int8 backward adds its own quantization — bound loosely but tightly
    # enough to catch a wrong contraction or missing scale fold.
    denom = float(jnp.abs(gref).max())
    tol = 0.06 if bwd_int8 else 0.03
    assert float(jnp.abs(gx - gref).max()) / denom < tol


def test_no_grad_into_frozen_storage():
    x, w, q, scale = _make(4, 4, 128, 32)

    def f(scale):
        return jnp.sum(int8_matmul(x, q, scale, False))

    g = jax.grad(f)(scale)
    assert float(jnp.abs(g).max()) == 0.0


def test_flexlinear_int8_compute_path():
    from dalm_tpu.models.layers import FlexLinear

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (128, 64), jnp.float32) * 0.05
    qt = quantize_tensor(w)
    quant = {"q": qt["__int8__"], "scale": qt["scale"]}

    ref = FlexLinear(64, int8_compute="none").apply({"params": {}, "quant": quant}, x)
    got = FlexLinear(64, int8_compute="fwd").apply({"params": {}, "quant": quant}, x)
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.02

    # lora factors still apply on top of the int8 base path
    lora = {
        "a": jax.random.normal(jax.random.PRNGKey(7), (128, 4), jnp.float32) * 0.1,
        "b": jax.random.normal(jax.random.PRNGKey(8), (4, 64), jnp.float32) * 0.1,
    }
    with_lora = FlexLinear(64, int8_compute="fwd").apply(
        {"params": {}, "quant": quant, "lora": lora}, x
    )
    delta = (x @ lora["a"]) @ lora["b"]
    np.testing.assert_allclose(
        np.asarray(with_lora - got), np.asarray(delta), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("mode", ["fwd", "all"])
def test_train_e2e_fused_int8_compute(tmp_path, toy_csv, mode):
    """Full fused-QLoRA rag-e2e training with int8 MXU compute: loss falls."""
    from dalm_tpu.train.rag_e2e import train_e2e

    out = train_e2e(
        toy_csv,
        "tiny",
        "tiny",
        query_max_len=16, passage_max_len=24, generator_max_len=48,
        per_device_train_batch_size=2,
        num_train_epochs=2,
        use_peft="both", use_bnb="both",
        lora_runtime="fused",
        int8_compute=mode,
        a8_calibrate_every=0,  # exercise the dynamic per-row path
        with_tracking=False,
        output_dir=str(tmp_path / "out"),
        use_dropout=False,
    )
    assert np.isfinite(out["final_loss"])
    assert out["steps"] >= 2


def test_cal_matmul_matches_dequant():
    """int8_matmul_cal with a correct per-tensor scale matches the exact
    dequantized matmul to activation-quant tolerance, and the scale is
    actually applied (a wrong scale that clips changes the output)."""
    from dalm_tpu.kernels.int8_matmul import int8_matmul_cal

    x, w, q, scale = _make(11, 8, 128, 64)
    a_scale = jnp.max(jnp.abs(x)) / 127.0
    exact = x @ (q.astype(jnp.float32) * scale)
    got = int8_matmul_cal(x, q, scale, a_scale, False)
    denom = float(jnp.abs(exact).max())
    assert float(jnp.abs(got - exact).max()) / denom < 0.03
    # a 100x-too-small scale clips nearly everything to +-127*that
    clipped = int8_matmul_cal(x, q, scale, a_scale / 100.0, False)
    assert float(jnp.abs(clipped - exact).max()) / denom > 0.05


@pytest.mark.parametrize("bwd_int8", [False, True])
def test_cal_matmul_gradients(bwd_int8):
    """STE backward matches the dynamic path: dx ~= dy @ W_dequant^T, no
    gradient reaches frozen storage, and a_scale's cotangent carries the
    OUT-OF-BAND dy amax (max|dy·scale|/127 — the delayed-scaling channel
    the a8_dy_calibrate probe step pulls, kernels/int8_matmul.py)."""
    from dalm_tpu.kernels.int8_matmul import int8_matmul_cal

    x, w, q, scale = _make(12, 8, 128, 64)
    a_scale = jnp.max(jnp.abs(x)) / 127.0
    wd = q.astype(jnp.float32) * scale

    def f(x, scale, a_scale):
        return jnp.sum(jnp.sin(int8_matmul_cal(x, q, scale, a_scale, bwd_int8)))

    gx, gs, ga = jax.grad(f, argnums=(0, 1, 2))(x, scale, a_scale)
    gref = jax.grad(lambda x: jnp.sum(jnp.sin(x @ wd)))(x)
    denom = float(jnp.abs(gref).max())
    tol = 0.06 if bwd_int8 else 0.03
    assert float(jnp.abs(gx - gref).max()) / denom < tol
    assert float(jnp.abs(gs).max()) == 0.0
    # OWG channel: dy here is cos(y) of the kernel's own forward output
    y = int8_matmul_cal(x, q, scale, a_scale, bwd_int8)
    expect_amax = float(jnp.max(jnp.abs(jnp.cos(y) * scale)) / 127.0)
    np.testing.assert_allclose(float(ga), expect_amax, rtol=1e-5)


def test_dycal_matmul_forward_and_backward():
    """int8_matmul_dycal: forward identical to the cal path; backward
    quantizes dy·scale with the given per-tensor dy_scale (matches a
    hand-computed per-tensor-quantized dx exactly), emits the fresh dy
    amax through a_scale's cotangent, and zero through dy_scale's."""
    from dalm_tpu.kernels.int8_matmul import int8_matmul_cal, int8_matmul_dycal

    x, w, q, scale = _make(13, 8, 128, 64)
    a_scale = jnp.max(jnp.abs(x)) / 127.0

    y_cal = int8_matmul_cal(x, q, scale, a_scale, True)
    dy_scale = jnp.max(jnp.abs(jnp.cos(y_cal) * scale)) / 127.0
    y_dy = int8_matmul_dycal(x, q, scale, a_scale, dy_scale, True)
    np.testing.assert_array_equal(np.asarray(y_dy), np.asarray(y_cal))

    def f(x, scale, a_scale, dy_scale):
        return jnp.sum(jnp.sin(int8_matmul_dycal(x, q, scale, a_scale, dy_scale, True)))

    gx, gs, ga, gdy = jax.grad(f, argnums=(0, 1, 2, 3))(x, scale, a_scale, dy_scale)
    # oracle: per-tensor quantized dy backward
    dyf = jnp.cos(y_dy).astype(jnp.float32) * scale
    dq = jnp.clip(jnp.round(dyf / dy_scale), -127, 127).astype(jnp.int8)
    dx_ref = (
        jax.lax.dot_general(
            dq, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * dy_scale
    )
    np.testing.assert_allclose(np.asarray(gx), np.asarray(dx_ref), rtol=1e-6)
    assert float(jnp.abs(gs).max()) == 0.0
    np.testing.assert_allclose(
        float(ga), float(jnp.max(jnp.abs(dyf)) / 127.0), rtol=1e-5
    )
    assert float(gdy) == 0.0
    # and the quantized dx tracks the exact backward
    wd = q.astype(jnp.float32) * scale
    gref = jax.grad(lambda x: jnp.sum(jnp.sin(x @ wd)))(x)
    assert float(jnp.abs(gx - gref).max()) / float(jnp.abs(gref).max()) < 0.06


def test_flexlinear_dycal_routing():
    """A dy_scale leaf (+ int8_compute='all') routes FlexLinear through
    the dycal kernel: forward equals the cal path, backward uses the
    frozen dy_scale (visible through the distinct dx quantization)."""
    from dalm_tpu.models.layers import FlexLinear

    x = jax.random.normal(jax.random.PRNGKey(21), (4, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(22), (128, 64), jnp.float32) * 0.05
    qt = quantize_tensor(w)
    a_scale = jnp.max(jnp.abs(x)) / 127.0
    quant_cal = {"q": qt["__int8__"], "scale": qt["scale"], "a_scale": a_scale}
    quant_dy = {**quant_cal, "dy_scale": jnp.asarray(1e-3, jnp.float32)}

    def loss(variables):
        return jnp.sum(FlexLinear(64, int8_compute="all").apply(variables, x) ** 2)

    y_cal = FlexLinear(64, int8_compute="all").apply({"params": {}, "quant": quant_cal}, x)
    y_dy = FlexLinear(64, int8_compute="all").apply({"params": {}, "quant": quant_dy}, x)
    np.testing.assert_array_equal(np.asarray(y_dy), np.asarray(y_cal))
    gx_dyn = jax.grad(lambda x: jnp.sum(
        FlexLinear(64, int8_compute="all").apply({"params": {}, "quant": quant_cal}, x) ** 2
    ))(x)
    gx_dy = jax.grad(lambda x: jnp.sum(
        FlexLinear(64, int8_compute="all").apply({"params": {}, "quant": quant_dy}, x) ** 2
    ))(x)
    # different quantization (per-row dynamic vs tiny per-tensor scale)
    # must produce a different-but-close dx
    assert not np.array_equal(np.asarray(gx_dyn), np.asarray(gx_dy))
    denom = float(jnp.abs(gx_dyn).max())
    assert float(jnp.abs(gx_dyn - gx_dy).max()) / denom < 0.2


def test_flexlinear_calibrated_path_and_sow():
    """An a_scale leaf routes FlexLinear through the calibrated matmul;
    applying with mutable=["intermediates"] captures the per-site amax
    (the calibration hook the trainer's a8_calibrate_every uses)."""
    from dalm_tpu.models.layers import FlexLinear

    x = jax.random.normal(jax.random.PRNGKey(9), (4, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(10), (128, 64), jnp.float32) * 0.05
    qt = quantize_tensor(w)
    quant = {"q": qt["__int8__"], "scale": qt["scale"]}
    ref = FlexLinear(64, int8_compute="none").apply({"params": {}, "quant": quant}, x)

    a_scale = jnp.max(jnp.abs(x)) / 127.0
    got, upd = FlexLinear(64, int8_compute="fwd").apply(
        {"params": {}, "quant": {**quant, "a_scale": a_scale}}, x,
        mutable=["intermediates"],
    )
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.03
    np.testing.assert_allclose(
        float(upd["intermediates"]["a_amax"]), float(jnp.max(jnp.abs(x))), rtol=1e-6
    )
    # without mutable the sow is a no-op and output is unchanged
    got2 = FlexLinear(64, int8_compute="fwd").apply(
        {"params": {}, "quant": {**quant, "a_scale": a_scale}}, x
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-6)


def test_train_e2e_fused_a8_calibrated(tmp_path, toy_csv):
    """Fused rag-e2e with calibrated activation scales (refresh every
    step): trains to a finite loss and tracks the dynamic-quant run
    closely (same data, same seeds — only the activation quantization
    granularity differs)."""
    from dalm_tpu.train.rag_e2e import train_e2e

    kwargs = dict(
        query_max_len=16, passage_max_len=24, generator_max_len=48,
        per_device_train_batch_size=2,
        num_train_epochs=2,
        use_peft="both", use_bnb="both",
        lora_runtime="fused",
        int8_compute="all",
        with_tracking=False,
        use_dropout=False,
    )
    out_cal = train_e2e(
        toy_csv, "tiny", "tiny", output_dir=str(tmp_path / "cal"),
        a8_calibrate_every=1, **kwargs,
    )
    assert np.isfinite(out_cal["final_loss"])
    out_dyn = train_e2e(
        toy_csv, "tiny", "tiny", output_dir=str(tmp_path / "dyn"),
        a8_calibrate_every=0,  # the strict per-row dynamic arm
        **kwargs,
    )
    # per-tensor vs per-row activation quant: same trajectory up to
    # quantization granularity
    assert abs(out_cal["final_loss"] - out_dyn["final_loss"]) < 0.15 * abs(
        out_dyn["final_loss"]
    ) + 0.05


def test_rowquant_pallas_matches_xla():
    """The one-pass Pallas quantize (interpret mode) is bit-identical to
    the two-pass XLA formulation, including zero rows."""
    import numpy as np

    from dalm_tpu.kernels.int8_matmul import _rowquant_pallas, _rowquant_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    x = x.at[3].set(0.0)  # zero row -> scale 1
    q_ref, s_ref = _rowquant_xla(x)
    q, s = _rowquant_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref))


def test_rowquant_dispatch_unaligned_falls_back():
    """Shapes that don't meet the kernel's alignment still quantize
    correctly through the XLA path (and 3-D leading dims reshape)."""
    import numpy as np

    from dalm_tpu.kernels.int8_matmul import rowquant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, 100)), jnp.float32)  # unaligned
    q, s = rowquant(x)
    assert q.shape == (3, 5, 100) and s.shape == (3, 5, 1)
    np.testing.assert_allclose(
        np.asarray(q) * np.asarray(s), np.asarray(x), atol=float(jnp.max(jnp.abs(x))) / 127 * 0.51
    )


def test_w8a8_fused_kernel_matches_per_tile_oracle():
    """The fused-quant Pallas matmul (activation tiles quantized in VMEM,
    per (row, k-block) scales) matches an emulated per-tile oracle and
    approximates the true matmul to activation-quant tolerance."""
    import numpy as np

    from dalm_tpu.kernels.int8_matmul import _fit_div, _w8a8_fused_pallas

    rng = np.random.default_rng(0)
    M, K, N = 16, 512, 384
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    ws = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)

    out = _w8a8_fused_pallas(x, q, ws, True)

    bk = _fit_div(K, 512)
    xf = np.asarray(x, np.float32)
    ref = np.zeros((M, N), np.float32)
    for k0 in range(0, K, bk):
        t = xf[:, k0 : k0 + bk]
        am = np.abs(t).max(axis=1, keepdims=True)
        sc = np.where(am > 0, am / 127.0, 1.0)
        tq = np.clip(np.round(t / sc), -127, 127).astype(np.int32)
        ref += (tq @ np.asarray(q[k0 : k0 + bk], np.int32)).astype(np.float32) * sc
    ref = ref * np.asarray(ws, np.float32)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    assert rel < 5e-3, rel
    true = xf @ np.asarray(w, np.float32)
    rel_true = np.abs(np.asarray(out, np.float32) - true).max() / np.abs(true).max()
    assert rel_true < 0.06, rel_true


def test_train_e2e_fused_a8_dy_calibrated(tmp_path, toy_csv):
    """a8_dy_calibrate: the probe step injects frozen dy_scale leaves on
    the refresh cadence and training proceeds on the dycal backward —
    finite loss, trajectory close to the dynamic-dy calibrated run."""
    from dalm_tpu.train.rag_e2e import train_e2e

    kwargs = dict(
        query_max_len=16, passage_max_len=24, generator_max_len=48,
        per_device_train_batch_size=2,
        num_train_epochs=2,
        use_peft="both", use_bnb="both",
        lora_runtime="fused",
        int8_compute="all",
        with_tracking=False,
        use_dropout=False,
    )
    out_dy = train_e2e(
        toy_csv, "tiny", "tiny", output_dir=str(tmp_path / "dy"),
        a8_calibrate_every=2, a8_dy_calibrate=True, **kwargs,
    )
    assert np.isfinite(out_dy["final_loss"])
    out_cal = train_e2e(
        toy_csv, "tiny", "tiny", output_dir=str(tmp_path / "cal"),
        a8_calibrate_every=2, **kwargs,
    )
    assert abs(out_dy["final_loss"] - out_cal["final_loss"]) < 0.15 * abs(
        out_cal["final_loss"]
    ) + 0.05


def test_a8_dy_calibrate_guards(toy_csv):
    """Loud rejections: dy calibration needs the int8 backward and no
    gradient accumulation (the OWG channel would sum across microsteps)."""
    from dalm_tpu.train.rag_e2e import train_e2e

    with pytest.raises(ValueError, match="int8_compute='all'"):
        train_e2e(
            toy_csv, "tiny", "tiny", lora_runtime="fused", int8_compute="fwd",
            use_peft="both", use_bnb="both", a8_calibrate_every=2,
            a8_dy_calibrate=True, with_tracking=False,
            query_max_len=16, passage_max_len=24, generator_max_len=48,
        )
    with pytest.raises(ValueError, match="gradient_accumulation_steps=1"):
        train_e2e(
            toy_csv, "tiny", "tiny", lora_runtime="fused", int8_compute="all",
            use_peft="both", use_bnb="both", a8_calibrate_every=2,
            a8_dy_calibrate=True, gradient_accumulation_steps=2,
            with_tracking=False,
            query_max_len=16, passage_max_len=24, generator_max_len=48,
        )
