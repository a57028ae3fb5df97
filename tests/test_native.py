"""Native (C++) data-loader codecs vs the Python reference implementations
— bit-identical (parity: the reference's C++ gguf/ggml codecs + BesTLA
compressWeight bit-packing; here native/nst_native.cpp via ctypes)."""

import numpy as np
import pytest

from neural_speed_tpu import native
from neural_speed_tpu.convert import gguf as G

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _rand_raw(nbytes, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, nbytes, dtype=np.uint8
    )


@pytest.mark.parametrize("kind,dec,bsz,blen", [
    ("q4_0", G.decode_q4_0, 18, 32),
    ("q4_1", G.decode_q4_1, 20, 32),
    ("q5_0", G.decode_q5_0, 22, 32),
    ("q5_1", G.decode_q5_1, 24, 32),
    ("q8_0", G.decode_q8_0, 34, 32),
    ("q6_k", G.decode_q6_k, 210, 256),
])
def test_block_decoders_bit_identical(kind, dec, bsz, blen):
    rows, row_len = 8, blen * 4
    nb = rows * row_len // blen
    raw = _rand_raw(nb * bsz)
    # avoid inf/nan fp16 scales in the random headers: clamp exponent
    raw = raw.copy()
    for off in range(1, bsz, 2):
        raw[off::bsz] &= 0x7B  # keep fp16 exponents finite-ish

    ref_codes, ref_s, ref_m = dec(raw, rows, row_len)
    out = native.decode_blocks(kind, raw, rows, row_len)
    assert out is not None
    codes, s, m = out
    np.testing.assert_array_equal(codes, ref_codes)
    np.testing.assert_allclose(s, np.asarray(ref_s, np.float32), rtol=0,
                               atol=0)
    if ref_m is None:
        assert m is None
    else:
        np.testing.assert_allclose(m, np.asarray(ref_m, np.float32), rtol=0,
                                   atol=0)


@pytest.mark.parametrize("width", [1, 2, 4, 8])
def test_planar_pack_roundtrip_matches_python(width):
    import jax.numpy as jnp

    from neural_speed_tpu.ops.quantize import pack_plane, unpack_plane

    rng = np.random.default_rng(1)
    k, n = 64, 48
    codes = rng.integers(0, 1 << width, (k, n), dtype=np.uint8)
    ref_words = np.asarray(pack_plane(jnp.asarray(codes), width))
    words = native.pack_planar(codes, width)
    np.testing.assert_array_equal(words, ref_words)

    ref_codes = np.asarray(unpack_plane(jnp.asarray(words), width))
    out = native.unpack_planar(words, width)
    np.testing.assert_array_equal(out, ref_codes)


def test_rtn_sym_matches_python():
    import jax.numpy as jnp

    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.ops.quantize import quantize, unpack_codes

    rng = np.random.default_rng(2)
    k, n, g = 128, 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    codes, scales = native.rtn_quantize_sym(w, g, 4)

    spec = QSpec(QType.INT, 4, g, True)
    qt = quantize(jnp.asarray(w), spec)
    ref_codes = np.asarray(unpack_codes(qt.data, 4, k))
    ref_scales = np.asarray(qt.scales)
    # ties at .5 may round differently (ties-to-even vs away-from-zero):
    # allow off-by-one on <0.1% of codes, scales must match to fp32 eps
    np.testing.assert_allclose(scales, ref_scales, rtol=1e-6, atol=1e-8)
    diff = np.abs(codes.astype(int) - ref_codes.astype(int))
    assert (diff > 1).sum() == 0
    assert (diff == 1).mean() < 1e-3


# ---- SPM tokenizer ---------------------------------------------------------


def _spm_vocab(seed=0):
    """Synthetic SPM-style vocab: specials, all 256 byte-fallback tokens,
    single chars, and random merged pieces with random scores."""
    rng = np.random.default_rng(seed)
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    chars = list("abcdefghijklmnop") + ["▁", "é", "中"]
    tokens += chars
    pieces = set()
    for _ in range(400):
        ln = rng.integers(2, 5)
        pieces.add("".join(rng.choice(chars, ln)))
    tokens += sorted(pieces)
    scores = rng.standard_normal(len(tokens)).astype(np.float32).tolist()
    return tokens, scores


def _py_encode(tok, text, add_bos):
    """Force the pure-Python merge loop (the reference implementation)."""
    native_state = tok._native
    tok._native = None
    try:
        return tok.encode(text, add_bos=add_bos)
    finally:
        tok._native = native_state


def test_spm_native_matches_python():
    tokens, scores = _spm_vocab()
    tok = G.GGUFTokenizer(tokens, scores, bos_id=1, eos_id=2, unk_id=0)
    rng = np.random.default_rng(1)
    chars = list("abcdefghij klmnop") + ["é", "中", "\U0001f600"]
    texts = ["hello mid egg", "", " ", "abcabcabc", "中é mixed"]
    for _ in range(30):
        ln = int(rng.integers(1, 120))
        texts.append("".join(rng.choice(chars, ln)))
    for t in texts:
        got = tok.encode(t)
        ref = _py_encode(tok, t, None)
        assert got == ref, (t, got, ref)
        assert tok.decode(got) == tok.decode(ref)


def test_spm_native_byte_fallback_and_no_bos():
    tokens, scores = _spm_vocab(3)
    tok = G.GGUFTokenizer(tokens, scores)
    # chars with no single-char token and no merged piece -> byte fallback
    for t in ["zzz ßå", "qq xx", "\U0001f9ea lab"]:
        assert tok.encode(t, add_bos=False) == _py_encode(tok, t, False)


def test_spm_native_long_prompt_parity():
    tokens, scores = _spm_vocab(4)
    tok = G.GGUFTokenizer(tokens, scores)
    rng = np.random.default_rng(5)
    text = "".join(rng.choice(list("abcdefghijklmnop "), 4000))
    assert tok.encode(text) == _py_encode(tok, text, None)


def test_spm_free_and_fallback():
    """Freed handles fail closed (encode falls back to the Python loop,
    same ids); fresh handles still work after frees."""
    tokens, scores = _spm_vocab(6)
    tok = G.GGUFTokenizer(tokens, scores)
    text = "hello mid egg"
    ids = tok.encode(text)
    handle = tok._native
    assert handle not in (0, None)
    native.spm_free(handle)
    assert native.spm_encode(handle, text, tok._byte_table,
                             tok.unk_id) is None
    assert tok.encode(text) == ids  # python fallback, same result
    tok2 = G.GGUFTokenizer(tokens, scores)
    assert tok2.encode(text) == ids  # new handle unaffected
    del tok2  # __del__ frees without error
