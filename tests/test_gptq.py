"""GPTQ/AWQ ingestion tests: synthetic packed checkpoints round-trip
exactly through the unpack/repack path (parity strategy: the reference's
convert/common.py unpack + bestla_qpack repack, quant_utils.cpp:226-268)."""

import numpy as np
import jax.numpy as jnp

from neural_speed_tpu.convert import gptq as GQ
from neural_speed_tpu.ops.quantize import dequantize

K, N, G = 128, 64, 32


def _make_gptq(seed=0, bits=4, act_order=False, awq=False):
    """Quantize a random weight into GPTQ/AWQ tensor layout; return both
    the packed tensors and the exact dequantized weight."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    groups = K // G
    g_idx = np.repeat(np.arange(groups), G)
    if act_order:
        g_idx = rng.permutation(g_idx)
    maxc = (1 << bits) - 1
    scales = np.zeros((groups, N), np.float32)
    zeros = np.zeros((groups, N), np.int32)
    codes = np.zeros((K, N), np.uint8)
    for g in range(groups):
        rows = np.where(g_idx == g)[0]
        wg = w[rows]
        mn, mx = wg.min(0), wg.max(0)
        sc = np.maximum((mx - mn) / maxc, 1e-8)
        zp = np.clip(np.round(-mn / sc), 0, maxc)
        scales[g] = sc
        zeros[g] = zp
        codes[rows] = np.clip(np.round(wg / sc) + zp, 0, maxc).astype(
            np.uint8
        )
    # exact dequant ground truth
    w_deq = (codes.astype(np.float32) - zeros[g_idx]) * scales[g_idx]
    if awq:
        qweight = GQ.pack_cols(codes, bits, awq=True).astype(np.int32)
        qzeros = GQ.pack_cols(zeros.astype(np.uint8), bits, awq=True)
    else:
        qweight = GQ.pack_rows(codes, bits)
        qzeros = GQ.pack_cols((zeros - 1).astype(np.uint8) & maxc, bits)
        # v1 convention stores zp-1
    return qweight, qzeros, scales, g_idx, w_deq


def test_gptq_v1_roundtrip_exact():
    qw, qz, sc, gi, w_deq = _make_gptq()
    qt, perm = GQ.gptq_to_qtensor(qw, qz, sc, g_idx=gi, bits=4,
                                  zero_plus_one=True)
    assert perm is None
    ours = np.asarray(dequantize(qt))
    np.testing.assert_allclose(ours, w_deq, rtol=1e-5, atol=1e-6)


def test_gptq_act_order():
    qw, qz, sc, gi, w_deq = _make_gptq(seed=1, act_order=True)
    qt, perm = GQ.gptq_to_qtensor(qw, qz, sc, g_idx=gi, bits=4,
                                  zero_plus_one=True)
    assert perm is not None
    ours = np.asarray(dequantize(qt))  # rows in permuted order
    np.testing.assert_allclose(ours, w_deq[np.asarray(perm)], rtol=1e-5,
                               atol=1e-6)
    # matmul with activation gather == matmul with original weight
    x = np.random.default_rng(2).standard_normal((3, K)).astype(np.float32)
    ref = x @ w_deq
    from neural_speed_tpu.models.transformer import linear

    got = np.asarray(
        linear(jnp.asarray(x), {"w": qt, "perm": perm})
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_awq_roundtrip():
    qw, qz, sc, gi, w_deq = _make_gptq(seed=3, awq=True)
    qt, perm = GQ.gptq_to_qtensor(qw, qz, sc, g_idx=None, bits=4, awq=True,
                                  zero_plus_one=False)
    ours = np.asarray(dequantize(qt))
    np.testing.assert_allclose(ours, w_deq, rtol=1e-5, atol=1e-6)


def test_gptq_8bit():
    qw, qz, sc, gi, w_deq = _make_gptq(seed=4, bits=8)
    qt, perm = GQ.gptq_to_qtensor(qw, qz, sc, g_idx=gi, bits=8,
                                  zero_plus_one=True)
    ours = np.asarray(dequantize(qt))
    np.testing.assert_allclose(ours, w_deq, rtol=1e-5, atol=1e-6)


def test_full_quantized_model():
    """End-to-end: synthetic GPTQ llama state dict -> params -> forward."""
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.models.transformer import forward
    from neural_speed_tpu.ops import kv_cache as kvc

    cfg = ArchConfig(
        name="llama", vocab_size=64, hidden_size=32, n_layers=1, n_heads=2,
        n_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    rng = np.random.default_rng(5)
    sd = {
        "model.embed_tokens.weight": rng.standard_normal(
            (64, 32)
        ).astype(np.float32) * 0.1,
        "model.norm.weight": np.ones(32, np.float32),
        "lm_head.weight": rng.standard_normal((64, 32)).astype(np.float32)
        * 0.1,
    }
    pre = "model.layers.0."
    sd[pre + "input_layernorm.weight"] = np.ones(32, np.float32)
    sd[pre + "post_attention_layernorm.weight"] = np.ones(32, np.float32)

    def put(name, k, n):
        rngl = np.random.default_rng(hash(name) % 2**31)
        w = rngl.standard_normal((k, n)).astype(np.float32) * 0.1
        groups = k // 16
        codes = np.clip(
            np.round(w / 0.02) + 8, 0, 15
        ).astype(np.uint8)
        sc = np.full((groups, n), 0.02, np.float32)
        zp = np.full((groups, n), 8, np.int32)
        sd[name + ".qweight"] = GQ.pack_rows(codes, 4)
        sd[name + ".qzeros"] = GQ.pack_cols(
            (zp - 1).astype(np.uint8), 4
        )
        sd[name + ".scales"] = sc

    for nm, k, n in [
        ("self_attn.q_proj", 32, 32), ("self_attn.k_proj", 32, 32),
        ("self_attn.v_proj", 32, 32), ("self_attn.o_proj", 32, 32),
        ("mlp.gate_proj", 32, 64), ("mlp.up_proj", 32, 64),
        ("mlp.down_proj", 64, 32),
    ]:
        put(pre + nm, k, n)

    hf_cfg = {"quantization_config": {"quant_method": "gptq", "bits": 4,
                                      "group_size": 16}}
    params = GQ.params_from_quantized_state_dict(sd, cfg, hf_cfg)
    cache = kvc.init_cache(1, 1, 16, 2, 16, jnp.float32)
    ids = jnp.asarray([[1, 2, 3]])
    pos = jnp.arange(3)[None, :]
    logits, _ = forward(params, cfg, ids, pos, cache, jnp.asarray([3]))
    assert np.isfinite(np.asarray(logits)).all()
