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
