"""Fused dequant-matmul correctness: Pallas (interpret) vs XLA vs fp32.

Mirrors the reference kernel UT comparing JIT kernels against kernel_ref
scalar code (bestla/bestla/ut/bestla_gemm.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.ops import QSpec, QType, named_qspec
from neural_speed_tpu.ops.matmul import qmatmul, qmatmul_int8, qmatmul_xla
from neural_speed_tpu.ops.quantize import dequantize, quantize
from neural_speed_tpu.utils.synthetic import synth_qtensor

M, K, N = 16, 256, 128


def _setup(spec, seed=0, m=M, k=K, n=N):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.1
    qt = quantize(w, spec)
    return x, w, qt


@pytest.mark.parametrize(
    "spec",
    [
        QSpec(QType.INT, 4, 64, True),
        QSpec(QType.INT, 4, 32, False),
        QSpec(QType.INT, 8, 128, True),
        QSpec(QType.INT, 2, 32, True),
        named_qspec("nf4", group_size=32),
        named_qspec("fp4", group_size=32),
    ],
    ids=["i4sym", "i4asym", "i8", "i2", "nf4", "fp4"],
)
def test_pallas_matches_xla(spec):
    x, w, qt = _setup(spec)
    ref = qmatmul_xla(x, qt)
    out = qmatmul(x, qt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_xla_matches_exact_dequant():
    spec = QSpec(QType.INT, 4, 64, True)
    x, w, qt = _setup(spec)
    ref = x @ dequantize(qt)
    out = qmatmul_xla(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_gemv_shape():
    """Decode-shaped m=1 input (the reference GEMV fast path,
    bestla_wrapper.h:344-402)."""
    spec = QSpec(QType.INT, 4, 64, True)
    x, w, qt = _setup(spec, m=1)
    out = qmatmul(x, qt, interpret=True)
    ref = qmatmul_xla(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_batched_leading_dims():
    spec = QSpec(QType.INT, 4, 64, True)
    x, w, qt = _setup(spec)
    xb = x.reshape(2, M // 2, K)
    out = qmatmul(xb, qt, force_xla=True)
    assert out.shape == (2, M // 2, N)


def test_bf16_activation():
    spec = QSpec(QType.INT, 4, 64, True)
    x, w, qt = _setup(spec)
    out = qmatmul(x.astype(jnp.bfloat16), qt, interpret=True)
    ref = qmatmul_xla(x.astype(jnp.bfloat16), qt)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2,
        atol=3e-2
    )


def test_int8_compute_path():
    """comp_int8 analogue: dynamic activation quant; error vs fp32 compute
    bounded by int8 activation resolution."""
    spec = QSpec(QType.INT, 4, 64, True)
    x, w, qt = _setup(spec)
    ref = qmatmul_xla(x, qt)
    out = qmatmul_int8(x, qt)
    denom = float(jnp.sqrt(jnp.mean(ref**2)))
    rel = float(jnp.sqrt(jnp.mean((out - ref) ** 2))) / max(denom, 1e-8)
    assert rel < 0.02, rel


def test_quant_error_propagates_reasonably():
    """End-to-end sanity: int4 matmul output within a few % of fp32 matmul."""
    spec = QSpec(QType.INT, 4, 32, True)
    x, w, qt = _setup(spec)
    exact = x @ w
    out = qmatmul_xla(x, qt)
    denom = float(jnp.sqrt(jnp.mean(exact**2)))
    rel = float(jnp.sqrt(jnp.mean((out - exact) ** 2))) / denom
    assert rel < 0.15, rel  # int4 g32 RTN weight error is ~0.10 rel RMSE


def test_group_straddles_band_boundary():
    """K=11008 g=128 (llama-7B FFN-down): the logical group straddles the
    packed sub-band boundary (kw=1376); the launcher subdivides scales to
    gcd(g, kw)=32 so the fused kernel still applies (the XLA fallback here
    materialized a 180 MB dequantized weight per call — the decode
    bottleneck found by profiling)."""
    from neural_speed_tpu.ops.matmul import _pallas_supported

    for spec in (QSpec(QType.INT, 4, 128, True),
                 QSpec(QType.INT, 4, 128, False)):
        x, w, qt = _setup(spec, m=2, k=11008, n=128)
        assert _pallas_supported(qt)
        ref = qmatmul_xla(x, qt)
        out = qmatmul(x, qt, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_repad_k_lossless():
    """K-repad (band-alignment load transform) is exact: padded weight
    + auto-padded activations == original matmul."""
    from neural_speed_tpu.ops.quantize import repad_k

    for spec in (QSpec(QType.INT, 4, 128, True),
                 QSpec(QType.INT, 4, 128, False),
                 named_qspec("nf4", group_size=128)):
        x, w, qt = _setup(spec, m=3, k=1408, n=128)  # 1408 % 1024 != 0
        padded = repad_k(qt, 1024)
        assert padded.shape[0] == 2048
        ref = qmatmul_xla(x, qt)
        out_xla = qmatmul(x, padded, force_xla=True)
        np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        out = qmatmul(x, padded, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("spec,kn", [
    (QSpec(QType.INT, 4, 128, True), (1024, 256)),
    (QSpec(QType.INT, 4, 128, True), (2048, 512)),
    (QSpec(QType.INT, 8, 128, True), (1024, 256)),
])
def test_int8_pallas_matches_xla(spec, kn):
    """The int8-MXU Pallas kernel and the XLA einsum path share the same
    quantization math: integer dots are exact, so results agree to f32
    rounding."""
    from neural_speed_tpu.ops.matmul import _int8_pallas_ok

    k, n = kn
    key = jax.random.PRNGKey(11)
    qt = synth_qtensor(key, k, n, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, k),
                          jnp.float32) * 0.5
    assert _int8_pallas_ok(qt, 64)
    ref = qmatmul_int8(x, qt, force_xla=True, out_dtype=jnp.float32)
    out = qmatmul_int8(x, qt, interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_int8_pallas_asym():
    """Asym int4: zero-point folded into the int8 weight values; compare
    against the fp dequant reference within activation-quant error."""
    spec = QSpec(QType.INT, 4, 128, False)
    k, n = 1024, 256
    key = jax.random.PRNGKey(12)
    qt = synth_qtensor(key, k, n, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, k),
                          jnp.float32) * 0.5
    ref = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    out = qmatmul_int8(x, qt, interpret=True, out_dtype=jnp.float32)
    denom = float(jnp.sqrt(jnp.mean(ref ** 2)))
    rel = float(jnp.sqrt(jnp.mean((out - ref) ** 2))) / max(denom, 1e-8)
    assert rel < 0.02, rel


def test_int8_pallas_odd_m_fallback_consistent():
    """m not a multiple of 32 (and <=256) falls back to XLA — same math."""
    spec = QSpec(QType.INT, 4, 128, True)
    k, n = 1024, 256
    key = jax.random.PRNGKey(13)
    qt = synth_qtensor(key, k, n, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (7, k), jnp.float32)
    out = qmatmul_int8(x, qt, out_dtype=jnp.float32)
    ref = qmatmul_int8(x, qt, force_xla=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_int8_pallas_per_token_matches_xla():
    spec = QSpec(QType.INT, 4, 128, True)
    k, n = 1024, 256
    key = jax.random.PRNGKey(14)
    qt = synth_qtensor(key, k, n, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (64, k),
                          jnp.float32) * 0.5
    ref = qmatmul_int8(x, qt, force_xla=True, per_token=True,
                       out_dtype=jnp.float32)
    out = qmatmul_int8(x, qt, interpret=True, per_token=True,
                       out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    # still close to the fp reference
    fp = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    denom = float(jnp.sqrt(jnp.mean(fp ** 2)))
    rel = float(jnp.sqrt(jnp.mean((out - fp) ** 2))) / max(denom, 1e-8)
    assert rel < 0.03, rel
