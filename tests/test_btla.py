"""Serialized-BesTLA storage ingest, validated against fixtures produced
by COMPILING THE REFERENCE ITSELF (tests/data/btla/gen.cpp + gen2.cpp
build against /root/reference/bestla headers; each .stor is
`StorageWeightKBlockNInteger::serialize` output and each .deq is the
reference's own `unpackWeight` dequantization of the same storage).
This is the strongest possible interop check available offline: our
parser must reproduce the reference's dequant BIT-EXACTLY."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from neural_speed_tpu.convert.btla import BTLAStorage, btla_to_qtensor
from neural_speed_tpu.convert import ne_bin as NE
from neural_speed_tpu.ops.quantize import dequantize

DATA = os.path.join(os.path.dirname(__file__), "data", "btla")

FIXTURES = [
    # (tag, expected ntile, pack_row, block, asym)
    ("s4_g128_sym_f32_avx512f", 48, 1, 128, False),
    ("s4_g32_asym_f32_avx512f", 48, 1, 32, True),
    ("s4_g128_sym_bf16_avx2", 24, 1, 128, False),
    ("s4_g128_sym_f32_vnni", 48, 4, 128, False),
    ("s8_g128_sym_f32_vnni", 48, 4, 128, False),
    # odd widths: bit-plane compression (the reference's RECOMMENDED
    # fastest next-token config is sym int3 g128, core/README.md:97-98)
    ("s2_g128_sym_f32_avx512f", 48, 1, 128, False),
    ("s3_g128_sym_f32_avx512f", 48, 1, 128, False),
    ("s5_g128_sym_f32_avx512f", 48, 1, 128, False),
    ("s6_g128_sym_f32_avx512f", 48, 1, 128, False),
    ("s7_g128_sym_f32_avx512f", 48, 1, 128, False),
    # round 5: NFloat LUT storages (StorageWeightKBlockNFloat,
    # bestla_storage.h:836; WeightKBlockNFloat, bestla_prologue_b.h:1006)
    # + DQ8_BNB double-quant scales (gen3.cpp fixtures)
    ("nf4_g64_f32_avx512f", 48, 1, 64, False),
    ("nf4_g32_bf16_avx512f", 48, 1, 32, False),
    ("fp4e2m1_g32_f32_avx512f", 48, 1, 32, False),
    ("fp4bnb_g32_f32_avx512f", 48, 1, 32, False),
    ("nf4_g32_dq8_avx512f", 48, 1, 32, False),
    ("fp8e4m3_g128_f32_avx512f", 48, 1, 128, False),
    ("fp8e4m3_g128_e8m0_avx512f", 48, 1, 128, False),
    ("fp8e5m2_g128_f32_avx512f", 48, 1, 128, False),
    ("s4_g32_dq8_avx512f", 48, 1, 32, False),
    # block > K: one spanning scale group (nk via updiv — the round-5
    # fp8-model ingest found kpad//block truncating to 0 rows)
    ("nf4_g128_k64_f32_avx512f", 48, 1, 128, False),
]


@pytest.mark.parametrize("tag,ntile,packrow,blk,asym",
                         FIXTURES, ids=[f[0] for f in FIXTURES])
def test_btla_parse_bitexact(tag, ntile, packrow, blk, asym):
    raw = np.fromfile(os.path.join(DATA, tag + ".stor"), np.uint8)
    st = BTLAStorage(raw)
    assert st.ntile == ntile and st.pack_row == packrow
    assert st.block_size == blk and (st.zp_buf is not None) == asym
    ref = np.fromfile(os.path.join(DATA, tag + ".deq"),
                      np.float32).reshape(st.k, st.n)
    np.testing.assert_array_equal(st.dequant(), ref)


@pytest.mark.parametrize("tag", [f[0] for f in FIXTURES])
def test_btla_qtensor_mapping(tag):
    """QTensor round trip must equal the storage dequant (bf16-scale
    fixtures round through bf16 exactly — the stored scales ARE bf16)."""
    raw = np.fromfile(os.path.join(DATA, tag + ".stor"), np.uint8)
    st = BTLAStorage(raw)
    qt = btla_to_qtensor(raw)
    ours = np.asarray(dequantize(qt), np.float32)
    np.testing.assert_allclose(ours, st.dequant(), rtol=1e-6, atol=1e-7)


def test_btla_nfloat_lut_matmul():
    """An ingested NFloat tensor must run through the quantized matmul —
    the custom code->value table rides QSpec.lut into the kernels, so the
    product equals x @ (reference dequant)."""
    from neural_speed_tpu.ops.matmul import qmatmul

    raw = np.fromfile(os.path.join(DATA, "nf4_g64_f32_avx512f.stor"),
                      np.uint8)
    st = BTLAStorage(raw)
    qt = btla_to_qtensor(raw)
    assert qt.spec.lut is not None and len(qt.spec.lut) == 16
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (4, st.k)), jnp.float32)
    got = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32), np.float32)
    want = np.asarray(x, np.float32) @ st.dequant()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_btla_n_perm():
    raw = np.fromfile(os.path.join(DATA, FIXTURES[0][0] + ".stor"),
                      np.uint8)
    st = BTLAStorage(raw)
    perm = np.random.default_rng(0).permutation(st.n)
    qt = btla_to_qtensor(raw, n_perm=perm)
    np.testing.assert_allclose(np.asarray(dequantize(qt), np.float32),
                               st.dequant()[:, perm], rtol=1e-6, atol=1e-7)


def test_btla_ggjt_model_loads(tmp_path):
    """A ggjt v3 .bin whose linears are BTLA blobs (the reference's
    quantized q4_j output shape) loads through load_ne_bin and its logits
    match a dense model built from the SAME storages' dequant values."""
    import torch  # noqa: F401  (parity of test env with other gguf tests)

    h, heads, kv, inter, vocab, L = 64, 4, 2, 128, 256, 2
    rng = np.random.default_rng(9)
    hp = NE.NEHParams(
        n_vocab=vocab, n_embd=h, n_mult=256, n_head=heads, n_head_kv=kv,
        n_layer=L, n_rot=h // heads, ftype=10, max_seq_len=128,
        ffn_hidden_size=inter, norm_eps=1e-5, freq_base=10000.0,
        freq_scale=1.0, bos_token_id=1, eos_token_id=2, pad_token_id=-1,
    )
    path = str(tmp_path / "tiny_btla.bin")
    w = NE.NEBinWriter(path, hp)
    toks = ["<unk>", "<s>", "</s>"] + [f"t{i}" for i in range(vocab - 3)]
    w.write_vocab(toks, [0.0] * vocab)

    embed = rng.standard_normal((vocab, h)).astype(np.float32) * 0.1
    norms = {}

    def blob(tag):
        return open(os.path.join(DATA, "model", tag + ".stor"), "rb").read()

    def stor(tag):
        return BTLAStorage(np.frombuffer(np.fromfile(
            os.path.join(DATA, "model", tag + ".stor"), np.uint8), np.uint8))

    w.add_tensor("tok_embeddings.weight", embed, NE.NE_TYPE_F32)
    nw = rng.standard_normal((h,)).astype(np.float32) * 0.02 + 1.0
    norms["final"] = nw
    w.add_tensor("norm.weight", nw, NE.NE_TYPE_F32)
    ot = stor("output")
    w.add_raw_tensor("output.weight", (ot.n, ot.k), NE.NE_TYPE_BTLA,
                     blob("output"))
    for i in range(L):
        for nm, tag in (("attention.wq", f"l{i}_wq"),
                        ("attention.wk", f"l{i}_wk"),
                        ("attention.wv", f"l{i}_wv"),
                        ("attention.wo", f"l{i}_wo"),
                        ("feed_forward.w1", f"l{i}_w1"),
                        ("feed_forward.w2", f"l{i}_w2"),
                        ("feed_forward.w3", f"l{i}_w3")):
            st = stor(tag)
            w.add_raw_tensor(f"layers.{i}.{nm}.weight", (st.n, st.k),
                             NE.NE_TYPE_BTLA, blob(tag))
        for nm in ("attention_norm", "ffn_norm"):
            nw = rng.standard_normal((h,)).astype(np.float32) * 0.02 + 1.0
            norms[f"{i}.{nm}"] = nw
            w.add_tensor(f"layers.{i}.{nm}.weight", nw, NE.NE_TYPE_F32)
    w.close()

    params, cfg, tok = NE.load_ne_bin(path)
    assert cfg.n_layers == L and cfg.n_kv_heads == kv

    # dense twin: same dequant values, rope rows unpermuted the same way
    def dense(tag, unperm_heads=0):
        st = stor(tag)
        d = st.dequant()
        if unperm_heads:
            d = d[:, NE._unpermute_rows(unperm_heads, st.n)]
        return {"w": jnp.asarray(d, jnp.float32)}

    dparams = {
        "embed": {"weight": jnp.asarray(embed, jnp.float32)},
        "final_norm": {"weight": jnp.asarray(norms["final"])},
        "lm_head": dense("output"),
        "layers": [],
    }
    for i in range(L):
        dparams["layers"].append({
            "attn_norm": {"weight": jnp.asarray(norms[f"{i}.attention_norm"])},
            "ffn_norm": {"weight": jnp.asarray(norms[f"{i}.ffn_norm"])},
            "q": dense(f"l{i}_wq", heads),
            "k": dense(f"l{i}_wk", kv),
            "v": dense(f"l{i}_wv"),
            "o": dense(f"l{i}_wo"),
            "ffn": {"gate": dense(f"l{i}_w1"),
                    "down": dense(f"l{i}_w2"),
                    "up": dense(f"l{i}_w3")},
        })

    from neural_speed_tpu.models.transformer import forward
    from neural_speed_tpu.runtime.engine import Engine

    ids = [1, 5, 9, 17]
    eng = Engine(params, cfg, max_batch=1, max_len=64)
    lg, _ = forward(eng.params, cfg, jnp.asarray([ids]),
                    jnp.arange(4)[None, :], eng.new_cache(),
                    jnp.asarray([4]))
    deng = Engine(dparams, cfg, max_batch=1, max_len=64)
    dlg, _ = forward(deng.params, cfg, jnp.asarray([ids]),
                     jnp.arange(4)[None, :], deng.new_cache(),
                     jnp.asarray([4]))
    # the BTLA path computes the GEMVs in f32 while the dense twin's
    # matmuls run in bf16 — compare distributionally, not elementwise
    a = np.asarray(lg, np.float32).reshape(-1)
    b = np.asarray(dlg, np.float32).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.9995, cos
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg, np.float32), -1),
        np.argmax(np.asarray(dlg, np.float32), -1))
    # and the embedding-quantized path: generate runs
    out = eng.generate_greedy(ids, 4)
    assert len(out) == 4
