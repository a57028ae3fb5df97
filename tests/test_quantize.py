"""Quantizer round-trip tests.

Modeled on the reference's kernel UT strategy: build known-distribution
random weights, quantize, dequantize, check error bounds
(bestla/bestla/ut/bestla_prologue_b.cpp UT_BlockQunatize_INT8 and friends).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.ops import QSpec, QType, named_qspec
from neural_speed_tpu.ops.quantize import (
    QTensor,
    dequantize,
    pack_codes,
    quantize,
    unpack_codes,
)

K, N = 256, 64


def _rand(k=K, n=N, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (k, n), jnp.float32) * 0.1


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_pack_roundtrip(bits):
    rng = np.random.default_rng(bits)
    codes = jnp.asarray(rng.integers(0, 2**bits, size=(K, N)), dtype=jnp.uint8)
    planes = pack_codes(codes, bits)
    out = unpack_codes(planes, bits, K)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("symmetric", [True, False])
@pytest.mark.parametrize("group", [-1, 32, 128])
def test_int_roundtrip_error(bits, symmetric, group):
    w = _rand()
    spec = QSpec(QType.INT, bits, group, symmetric)
    qt = quantize(w, spec)
    wd = dequantize(qt)
    err = float(jnp.max(jnp.abs(w - wd)))
    # RTN max error is scale/2 per element; bound via the max group scale.
    smax = float(jnp.max(qt.effective_scales()))
    assert err <= smax * 0.51 + 1e-6, (bits, symmetric, group, err, smax)


def test_int8_sym_exact_codes():
    """Known-scale weights must round-trip exactly (mirrors
    UT_BlockQunatize_INT8, ut/bestla_prologue_b.cpp:11-75)."""
    rng = np.random.default_rng(0)
    scale = 0.01
    ints = rng.integers(-127, 128, size=(K, N))
    ints[0, :] = 127  # pin per-column absmax so the RTN scale is exact
    w = jnp.asarray(ints * scale, jnp.float32)
    spec = QSpec(QType.INT, 8, -1, True)
    qt = quantize(w, spec)
    wd = dequantize(qt)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(w), rtol=0, atol=1e-6)


@pytest.mark.parametrize("name", ["nf4", "fp4"])
def test_lut_roundtrip(name):
    w = _rand(seed=3)
    spec = named_qspec(name, group_size=64)
    qt = quantize(w, spec)
    wd = dequantize(qt)
    # LUT quant error bounded by half the largest LUT gap x group absmax
    wg = np.asarray(w).reshape(K // 64, 64, N)
    absmax = np.abs(wg).max(axis=1, keepdims=True)
    err = np.abs(np.asarray(wd).reshape(K // 64, 64, N) - wg)
    assert (err <= absmax * 0.20 + 1e-6).all()


def test_fp8_roundtrip():
    w = _rand(seed=4)
    spec = named_qspec("fp8", group_size=128)
    qt = quantize(w, spec)
    wd = dequantize(qt)
    rel = float(jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.sqrt(jnp.mean(w**2)))
    assert rel < 0.05


def test_double_quant():
    w = _rand(seed=5)
    spec = QSpec(QType.INT, 4, 32, True, double_quant=True)
    qt = quantize(w, spec)
    assert qt.scales.dtype == jnp.int8 and qt.sscale is not None
    wd = dequantize(qt)
    rel = float(jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.sqrt(jnp.mean(w**2)))
    # int4 g32 RTN alone is ~0.096 rel RMSE; double-quant must add <0.5% extra
    base = quantize(w, QSpec(QType.INT, 4, 32, True))
    rel_base = float(
        jnp.sqrt(jnp.mean((w - dequantize(base)) ** 2)) / jnp.sqrt(jnp.mean(w**2))
    )
    assert rel < rel_base + 0.005


def test_bf16_scales():
    w = _rand(seed=6)
    qt = quantize(w, QSpec(QType.INT, 4, 128, True, scale_dtype="bfloat16"))
    assert qt.scales.dtype == jnp.bfloat16
    wd = dequantize(qt)
    rel = float(jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.sqrt(jnp.mean(w**2)))
    assert rel < 0.15  # int4 g128 RTN is ~0.11 rel RMSE; bf16 scales add <1%


def test_pytree():
    qt = quantize(_rand(), named_qspec("int4"))
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(qt2, QTensor) and qt2.spec == qt.spec

    # jit through a QTensor argument
    @jax.jit
    def f(q):
        return dequantize(q).sum()

    assert jnp.isfinite(f(qt))


def test_memory_footprint():
    w = _rand(1024, 1024)
    qt = quantize(w, named_qspec("int4", group_size=128))
    # int4 packed = K*N/2 bytes + scales
    assert qt.nbytes() <= 1024 * 1024 // 2 + 8 * 1024 * 4 + 64


def test_layerwise_quant_policy():
    """Layer-wise quant config (parity: quant_config.h per-layer policy +
    --config file): overrides by path regex, fp32 keeps leaves dense."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from neural_speed_tpu.convert.hf import params_from_state_dict
    from neural_speed_tpu.convert.quant_config import load_quant_config
    from neural_speed_tpu.models.configs import arch_from_hf_config
    from neural_speed_tpu.ops.quantize import QTensor

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2)
    m = LlamaForCausalLM(cfg)
    acfg = arch_from_hf_config(cfg.to_dict())
    policy = load_quant_config({
        "default": {"weight_dtype": "int4", "group_size": 32},
        "overrides": [
            {"pattern": r"ffn\.down$", "weight_dtype": "int8",
             "group_size": 32},
            {"pattern": "lm_head", "weight_dtype": "fp32"},
        ],
    })
    p = params_from_state_dict(m.state_dict(), acfg, policy=policy)
    assert isinstance(p["layers"][0]["q"]["w"], QTensor)
    assert p["layers"][0]["q"]["w"].spec.bits == 4
    assert p["layers"][0]["ffn"]["down"]["w"].spec.bits == 8
    assert not isinstance(p["lm_head"]["w"], QTensor)


def test_widen_bits_exact():
    """3/5/6/7-bit load-time widening to 4/8-bit kernel-native packs is
    exact (codes unchanged; symmetric offset becomes an explicit zp)."""
    import jax
    import jax.numpy as jnp

    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.ops.quantize import dequantize, quantize, widen_bits

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (128, 64), jnp.float32)
    for bits in (3, 5, 6, 7):
        for sym in (True, False):
            spec = QSpec(QType.INT, bits, 32, sym)
            qt = quantize(w, spec)
            wide = widen_bits(qt)
            assert wide.spec.bits in (4, 8)
            np.testing.assert_array_equal(
                np.asarray(dequantize(wide)), np.asarray(dequantize(qt)))


def test_split_n_inverts_concat_n():
    """split_n must be the exact inverse of concat_n (column slices of
    every packed component), across int4 sym/asym and double-quant."""
    import jax.numpy as jnp
    import numpy as np

    from neural_speed_tpu.ops.qtypes import QSpec, QType, named_qspec
    from neural_speed_tpu.ops.quantize import (concat_n, dequantize,
                                               quantize, split_n)

    rng = np.random.default_rng(0)
    for spec in (named_qspec("int4", group_size=32),
                 QSpec(QType.INT, 4, 32, True),
                 QSpec(QType.INT, 3, 32, False)):
        parts = [quantize(jnp.asarray(rng.normal(size=(64, n)), jnp.float32),
                          spec) for n in (32, 16, 48)]
        fused = concat_n(parts)
        back = split_n(fused, [32, 16, 48])
        for a, b in zip(parts, back):
            np.testing.assert_array_equal(np.asarray(dequantize(a)),
                                          np.asarray(dequantize(b)))
            assert a.shape == b.shape
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_n(fused, [32, 16, 40])


def test_repad_n_lossless():
    """repad_n pads packed columns with zero scales: the matmul output's
    padded tail is exactly 0 and the true-N prefix is bit-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_speed_tpu.ops.matmul import qmatmul
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.ops.quantize import quantize, repad_n

    key = jax.random.PRNGKey(3)
    for spec in (QSpec(QType.INT, 4, 64, True),
                 QSpec(QType.INT, 4, 64, False),
                 QSpec(QType.INT, 4, 64, True, double_quant=True)):
        w = jax.random.normal(key, (256, 200), jnp.float32) * 0.05
        qt = quantize(w, spec)
        padded = repad_n(qt, 128)
        assert padded.shape == (256, 256)
        x = jax.random.normal(jax.random.fold_in(key, 1), (4, 256),
                              jnp.float32)
        ref = qmatmul(x, qt, force_xla=True, out_dtype=jnp.float32)
        out = qmatmul(x, padded, force_xla=True, out_dtype=jnp.float32)
        # prefix: same math (XLA may tile the wider N differently -> ulp)
        np.testing.assert_allclose(np.asarray(out[:, :200]),
                                   np.asarray(ref), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out[:, 200:]), 0.0)


def test_lm_head_n_padding_engine_equal():
    """fuse_params N-pads a wide (>=4096, non-512-multiple) packed LM
    head; engine greedy streams are identical to the unpadded params."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.models.transformer import fuse_params
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import Engine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(
        name="llama", vocab_size=4100, hidden_size=64, n_layers=2,
        n_heads=4, n_kv_heads=2, intermediate_size=128,
        max_position_embeddings=128,
    )
    params = synth_params(cfg, QSpec(QType.INT, 4, 32, True))
    fused = fuse_params(params, cfg)
    assert fused["lm_head"]["w"].shape[1] == 4608  # padded to 512-mult
    e_ref = Engine(params, cfg, max_batch=1, max_len=64, fuse=False)
    e_pad = Engine(params, cfg, max_batch=1, max_len=64, fuse=True)
    assert e_pad.params["lm_head"]["w"].shape[1] == 4608
    prompt = [1, 7, 42, 9]
    a = e_ref.generate_greedy(prompt, 8)
    b = e_pad.generate_greedy(prompt, 8)
    assert a == b
