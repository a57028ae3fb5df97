"""GGUF reader + writer and ggml-quant block codecs.

Parity:
  * reader — the reference's `gguf_loader` (models/model_utils/
    model_files.h:246+, gguf.h:574): full KV metadata parse, tensor
    directory, mmap-able data section.
  * writer — the reference's convert-hf-to-gguf.py (neural_speed/convert/,
    2,010 LoC).
  * block codecs — ggml Q4_0/Q4_1/Q5_0/Q5_1/Q8_0/Q6_K (core/data_types.h:
    80-141) plus the K-quant super-blocks Q2_K/Q3_K/Q4_K/Q5_K (beyond the
    reference, whose enum stops at Q6_K — but the ecosystem's most common
    public GGUF files are Q4_K_M; layouts follow ggml-quants.c).  Integer
    sym formats map LOSSLESSLY onto our planar int-b QTensors (Q4_0 ->
    int4 sym g32 with code offset 8 == ours, etc.); Q4_1/Q5_1 and the
    asymmetric K-quants use a float offset per group (QTensor.zeros
    float32, see ops/quantize dequant convention `w = scale*code +
    zeros_f`); Q3_K is symmetric around code 4, Q6_K around 32.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.arch import ArchConfig
from ..ops.qtypes import QSpec, QType
from ..ops.quantize import QTensor, pack_codes

GGUF_MAGIC = 0x46554747  # 'GGUF'

# gguf value types
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL, T_STR, T_ARR = range(10)
T_U64, T_I64, T_F64 = 10, 11, 12

# ggml tensor dtypes (ggml.h enum)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0, GGML_Q8_1 = 8, 9
GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K, GGML_Q8_K = range(10, 16)

_SCALAR_FMT = {T_U8: "<B", T_I8: "<b", T_U16: "<H", T_I16: "<h",
               T_U32: "<I", T_I32: "<i", T_F32: "<f", T_U64: "<Q",
               T_I64: "<q", T_F64: "<d", T_BOOL: "<?"}


# ---------------------------------------------------------------------------
# low-level reader
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GGUFTensorInfo:
    name: str
    shape: Tuple[int, ...]   # ggml ne order: ne[0]=innermost (row length)
    ggml_type: int
    offset: int


class GGUFReader:
    def __init__(self, path: str):
        self.path = path
        self.kv: Dict[str, Any] = {}
        self.tensors: Dict[str, GGUFTensorInfo] = {}
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            if magic != GGUF_MAGIC:
                raise ValueError(f"not a GGUF file: {path}")
            if version < 2:
                raise ValueError(f"GGUF v{version} unsupported (need >=2)")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = self._str(f)
                vt = struct.unpack("<I", f.read(4))[0]
                self.kv[key] = self._value(f, vt)
            for _ in range(n_tensors):
                name = self._str(f)
                nd = struct.unpack("<I", f.read(4))[0]
                dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
                ttype, off = struct.unpack("<IQ", f.read(12))
                self.tensors[name] = GGUFTensorInfo(name, tuple(dims),
                                                    ttype, off)
            align = self.kv.get("general.alignment", 32)
            pos = f.tell()
            self.data_start = (pos + align - 1) // align * align
        self._mm = np.memmap(path, mode="r")

    @staticmethod
    def _str(f: BinaryIO) -> str:
        n = struct.unpack("<Q", f.read(8))[0]
        return f.read(n).decode("utf-8", errors="replace")

    def _value(self, f: BinaryIO, vt: int):
        if vt == T_STR:
            return self._str(f)
        if vt == T_ARR:
            at, n = struct.unpack("<IQ", f.read(12))
            return [self._value(f, at) for _ in range(n)]
        fmt = _SCALAR_FMT[vt]
        return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]

    def tensor_bytes(self, info: GGUFTensorInfo) -> np.ndarray:
        nbytes = ggml_nbytes(info.shape, info.ggml_type)
        start = self.data_start + info.offset
        return np.asarray(self._mm[start:start + nbytes])


def ggml_block_info(ttype: int) -> Tuple[int, int]:
    """(elements per block, bytes per block)."""
    return {
        GGML_F32: (1, 4), GGML_F16: (1, 2),
        GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
        GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24),
        GGML_Q8_0: (32, 34), GGML_Q6_K: (256, 210),
        GGML_Q4_K: (256, 144), GGML_Q5_K: (256, 176),
        GGML_Q2_K: (256, 84), GGML_Q3_K: (256, 110),
    }[ttype]


def ggml_nbytes(shape: Tuple[int, ...], ttype: int) -> int:
    n = 1
    for d in shape:
        n *= d
    be, bb = ggml_block_info(ttype)
    assert n % be == 0, (shape, ttype)
    return n // be * bb


# ---------------------------------------------------------------------------
# block codecs: raw bytes [rows, row_len] -> (codes uint8, scales, offsets)
# rows = ggml ne[1] (out features), row_len = ne[0] (in features)
# ---------------------------------------------------------------------------


def _fp16(b: np.ndarray) -> np.ndarray:
    return b.view(np.float16).astype(np.float32)


def decode_q4_0(raw: np.ndarray, rows: int, row_len: int):
    nb = rows * row_len // 32
    blk = raw[: nb * 18].reshape(nb, 18)
    d = _fp16(np.ascontiguousarray(blk[:, :2]))[:, 0]  # [nb]
    qs = blk[:, 2:]  # [nb, 16]
    lo = qs & 0xF
    hi = qs >> 4
    codes = np.concatenate([lo, hi], axis=1).astype(np.uint8)  # [nb, 32]
    return codes.reshape(rows, row_len), d.reshape(rows, row_len // 32), None


def decode_q4_1(raw, rows, row_len):
    nb = rows * row_len // 32
    blk = raw[: nb * 20].reshape(nb, 20)
    d = _fp16(np.ascontiguousarray(blk[:, :2]))[:, 0]
    m = _fp16(np.ascontiguousarray(blk[:, 2:4]))[:, 0]
    qs = blk[:, 4:]
    codes = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.uint8)
    return (codes.reshape(rows, row_len), d.reshape(rows, row_len // 32),
            m.reshape(rows, row_len // 32))


def _q5_codes(qs, qh):
    """5th bit from the packed u32 qh."""
    nb = qs.shape[0]
    qh32 = np.ascontiguousarray(qh).view(np.uint32).reshape(nb)
    bits = (qh32[:, None] >> np.arange(32)[None, :]) & 1  # [nb, 32]
    lo = np.concatenate([qs & 0xF, qs >> 4], axis=1)  # [nb, 32]
    return (lo | (bits << 4).astype(np.uint8)).astype(np.uint8)


def decode_q5_0(raw, rows, row_len):
    nb = rows * row_len // 32
    blk = raw[: nb * 22].reshape(nb, 22)
    d = _fp16(np.ascontiguousarray(blk[:, :2]))[:, 0]
    qh = blk[:, 2:6]
    qs = blk[:, 6:]
    codes = _q5_codes(qs, qh)
    return codes.reshape(rows, row_len), d.reshape(rows, row_len // 32), None


def decode_q5_1(raw, rows, row_len):
    nb = rows * row_len // 32
    blk = raw[: nb * 24].reshape(nb, 24)
    d = _fp16(np.ascontiguousarray(blk[:, :2]))[:, 0]
    m = _fp16(np.ascontiguousarray(blk[:, 2:4]))[:, 0]
    qh = blk[:, 4:8]
    qs = blk[:, 8:]
    codes = _q5_codes(qs, qh)
    return (codes.reshape(rows, row_len), d.reshape(rows, row_len // 32),
            m.reshape(rows, row_len // 32))


def decode_q8_0(raw, rows, row_len):
    nb = rows * row_len // 32
    blk = raw[: nb * 34].reshape(nb, 34)
    d = _fp16(np.ascontiguousarray(blk[:, :2]))[:, 0]
    q = blk[:, 2:].view(np.int8).astype(np.int16) + 128  # unsigned codes
    return (q.astype(np.uint8).reshape(rows, row_len),
            d.reshape(rows, row_len // 32), None)


def decode_q6_k(raw, rows, row_len):
    """Q6_K (ggml-quants.c): 256-elem super-block = ql[128] qh[64]
    scales[16]i8 d[f16]; weight = d * scales[i//16] * (q - 32)."""
    nb = rows * row_len // 256
    blk = raw[: nb * 210].reshape(nb, 210)
    ql = blk[:, :128]
    qh = blk[:, 128:192]
    sc = blk[:, 192:208].view(np.int8).astype(np.float32)
    d = _fp16(np.ascontiguousarray(blk[:, 208:210]))[:, 0]
    codes = np.zeros((nb, 256), np.uint8)
    # layout per ggml dequantize_row_q6_K: two 128-halves
    for half in range(2):
        lo = ql[:, half * 64:(half + 1) * 64]
        hi = qh[:, half * 32:(half + 1) * 32]
        for j in range(2):  # low/high nibble of ql
            q4 = (lo >> (4 * j)) & 0xF  # [nb, 64]
            b = (hi >> (2 * j)) & 3
            b2 = (hi >> (2 * j + 4)) & 3
            qq = np.concatenate([q4[:, :32] | (b << 4),
                                 q4[:, 32:] | (b2 << 4)], axis=1)
            base = half * 128 + j * 64
            codes[:, base: base + 64] = qq
    scales = d[:, None] * sc  # [nb, 16]
    return (codes.reshape(rows, row_len),
            scales.reshape(rows, row_len // 16), None)


def _k4_scale_min(scales: np.ndarray):
    """Unpack the K-quant 12-byte 6-bit scale/min table (ggml
    get_scale_min_k4): 8 scales + 8 mins per 256-elem super-block.
    `scales` is [nb, 12] uint8 -> ([nb, 8], [nb, 8]) uint8."""
    nb = scales.shape[0]
    sc = np.zeros((nb, 8), np.uint8)
    mn = np.zeros((nb, 8), np.uint8)
    sc[:, :4] = scales[:, :4] & 63
    mn[:, :4] = scales[:, 4:8] & 63
    sc[:, 4:] = (scales[:, 8:12] & 0xF) | ((scales[:, :4] >> 6) << 4)
    mn[:, 4:] = (scales[:, 8:12] >> 4) | ((scales[:, 4:8] >> 6) << 4)
    return sc, mn


def _k4_pack_scale_min(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of _k4_scale_min: [nb, 8] x2 (values 0..63) -> [nb, 12]."""
    nb = sc.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    out[:, :4] = (sc[:, :4] & 63) | ((sc[:, 4:] >> 4) << 6)
    out[:, 4:8] = (mn[:, :4] & 63) | ((mn[:, 4:] >> 4) << 6)
    out[:, 8:12] = (sc[:, 4:] & 0xF) | ((mn[:, 4:] & 0xF) << 4)
    return out


def decode_q4_k(raw, rows, row_len):
    """Q4_K (ggml-quants.c dequantize_row_q4_K): 256-elem super-block =
    d[f16] dmin[f16] scales[12] qs[128]; 8 sub-blocks of 32 with 6-bit
    scale/min: w = d*sc[j]*q - dmin*m[j].  Returned as float per-sub-block
    scale + float offset (the Q4_1 convention: w = scale*code + m)."""
    nb = rows * row_len // 256
    blk = raw[: nb * 144].reshape(nb, 144)
    d = _fp16(np.ascontiguousarray(blk[:, 0:2]))[:, 0]
    dmin = _fp16(np.ascontiguousarray(blk[:, 2:4]))[:, 0]
    sc, mn = _k4_scale_min(blk[:, 4:16])
    qs = blk[:, 16:144]
    codes = np.zeros((nb, 256), np.uint8)
    for c in range(4):  # 64-elem chunks: low nibbles then high nibbles
        q = qs[:, 32 * c: 32 * c + 32]
        codes[:, 64 * c: 64 * c + 32] = q & 0xF
        codes[:, 64 * c + 32: 64 * c + 64] = q >> 4
    scales = d[:, None] * sc.astype(np.float32)        # [nb, 8]
    offs = -(dmin[:, None] * mn.astype(np.float32))    # [nb, 8]
    return (codes.reshape(rows, row_len),
            scales.reshape(rows, row_len // 32),
            offs.reshape(rows, row_len // 32))


def decode_q5_k(raw, rows, row_len):
    """Q5_K: d[f16] dmin[f16] scales[12] qh[32] qs[128]; the 5th bit of
    chunk c's low/high nibble comes from qh bit 2c / 2c+1."""
    nb = rows * row_len // 256
    blk = raw[: nb * 176].reshape(nb, 176)
    d = _fp16(np.ascontiguousarray(blk[:, 0:2]))[:, 0]
    dmin = _fp16(np.ascontiguousarray(blk[:, 2:4]))[:, 0]
    sc, mn = _k4_scale_min(blk[:, 4:16])
    qh = blk[:, 16:48]
    qs = blk[:, 48:176]
    codes = np.zeros((nb, 256), np.uint8)
    for c in range(4):
        q = qs[:, 32 * c: 32 * c + 32]
        lo5 = ((qh >> (2 * c)) & 1).astype(np.uint8) << 4
        hi5 = ((qh >> (2 * c + 1)) & 1).astype(np.uint8) << 4
        codes[:, 64 * c: 64 * c + 32] = (q & 0xF) | lo5
        codes[:, 64 * c + 32: 64 * c + 64] = (q >> 4) | hi5
    scales = d[:, None] * sc.astype(np.float32)
    offs = -(dmin[:, None] * mn.astype(np.float32))
    return (codes.reshape(rows, row_len),
            scales.reshape(rows, row_len // 32),
            offs.reshape(rows, row_len // 32))


def decode_q2_k(raw, rows, row_len):
    """Q2_K: scales[16] qs[64] d[f16] dmin[f16]; 16 sub-blocks of 16 with
    4-bit scale/min nibbles: w = d*(sc&0xF)*q - dmin*(sc>>4)."""
    nb = rows * row_len // 256
    blk = raw[: nb * 84].reshape(nb, 84)
    scq = blk[:, :16]
    qs = blk[:, 16:80]
    d = _fp16(np.ascontiguousarray(blk[:, 80:82]))[:, 0]
    dmin = _fp16(np.ascontiguousarray(blk[:, 82:84]))[:, 0]
    codes = np.zeros((nb, 256), np.uint8)
    for outer in range(2):          # 128-elem halves; qs advances 32B
        q = qs[:, 32 * outer: 32 * outer + 32]
        for j in range(4):          # 2-bit plane
            base = 128 * outer + 32 * j
            codes[:, base: base + 32] = (q >> (2 * j)) & 3
    scales = d[:, None] * (scq & 0xF).astype(np.float32)       # [nb, 16]
    offs = -(dmin[:, None] * (scq >> 4).astype(np.float32))
    return (codes.reshape(rows, row_len),
            scales.reshape(rows, row_len // 16),
            offs.reshape(rows, row_len // 16))


def _q3k_scales(scales: np.ndarray) -> np.ndarray:
    """Q3_K 12-byte -> 16 6-bit scales (ggml kmask unpack), returned as
    int (value range 0..63; subtract 32 for the signed scale)."""
    b = scales.astype(np.uint16)
    sc = np.zeros((scales.shape[0], 16), np.uint8)
    for i in range(4):
        sc[:, i] = (b[:, i] & 0xF) | ((b[:, 8 + i] & 3) << 4)
        sc[:, 4 + i] = (b[:, 4 + i] & 0xF) | (((b[:, 8 + i] >> 2) & 3) << 4)
        sc[:, 8 + i] = (b[:, i] >> 4) | (((b[:, 8 + i] >> 4) & 3) << 4)
        sc[:, 12 + i] = (b[:, 4 + i] >> 4) | (((b[:, 8 + i] >> 6) & 3) << 4)
    return sc


def _q3k_pack_scales(sc: np.ndarray) -> np.ndarray:
    """Inverse of _q3k_scales: [nb, 16] (0..63) -> [nb, 12]."""
    out = np.zeros((sc.shape[0], 12), np.uint8)
    for i in range(4):
        out[:, i] = (sc[:, i] & 0xF) | ((sc[:, 8 + i] & 0xF) << 4)
        out[:, 4 + i] = (sc[:, 4 + i] & 0xF) | ((sc[:, 12 + i] & 0xF) << 4)
        out[:, 8 + i] = ((sc[:, i] >> 4) | ((sc[:, 4 + i] >> 4) << 2)
                         | ((sc[:, 8 + i] >> 4) << 4)
                         | ((sc[:, 12 + i] >> 4) << 6))
    return out


def decode_q3_k(raw, rows, row_len):
    """Q3_K: hmask[32] qs[64] scales[12] d[f16]; 16 sub-blocks of 16,
    6-bit scales - 32, w = d*(sc-32)*(q3 - 4) with q3 = 2-bit + hmask
    high bit (hmask bit index = outer*4 + plane)."""
    nb = rows * row_len // 256
    blk = raw[: nb * 110].reshape(nb, 110)
    hm = blk[:, :32]
    qs = blk[:, 32:96]
    sc6 = _q3k_scales(blk[:, 96:108])
    d = _fp16(np.ascontiguousarray(blk[:, 108:110]))[:, 0]
    codes = np.zeros((nb, 256), np.uint8)
    for outer in range(2):
        q = qs[:, 32 * outer: 32 * outer + 32]
        for j in range(4):
            base = 128 * outer + 32 * j
            hbit = ((hm >> (4 * outer + j)) & 1).astype(np.uint8)
            codes[:, base: base + 32] = ((q >> (2 * j)) & 3) | (hbit << 2)
    scales = d[:, None] * (sc6.astype(np.float32) - 32.0)      # [nb, 16]
    return (codes.reshape(rows, row_len),
            scales.reshape(rows, row_len // 16), None)


DECODERS = {
    GGML_Q4_0: (decode_q4_0, 4, 32, 8),
    GGML_Q4_1: (decode_q4_1, 4, 32, None),   # float offset
    GGML_Q5_0: (decode_q5_0, 5, 32, 16),
    GGML_Q5_1: (decode_q5_1, 5, 32, None),
    GGML_Q8_0: (decode_q8_0, 8, 32, 128),
    GGML_Q6_K: (decode_q6_k, 6, 16, 32),
    # K-quants (the ecosystem's most common public GGUF files are
    # Q4_K_M): per-sub-block float scale + float offset map onto the
    # same QTensor convention as Q4_1/Q5_1; Q3_K is symmetric around 4
    GGML_Q4_K: (decode_q4_k, 4, 32, None),
    GGML_Q5_K: (decode_q5_k, 5, 32, None),
    GGML_Q2_K: (decode_q2_k, 2, 16, None),
    GGML_Q3_K: (decode_q3_k, 3, 16, 4),
}


_NATIVE_KIND = {
    GGML_Q4_0: "q4_0", GGML_Q4_1: "q4_1", GGML_Q5_0: "q5_0",
    GGML_Q5_1: "q5_1", GGML_Q8_0: "q8_0", GGML_Q6_K: "q6_k",
}


def _decode(ttype: int, raw: np.ndarray, rows: int, row_len: int):
    """Dispatch block decode to the native C++ codecs when built
    (bit-identical; see native/nst_native.cpp + tests/test_native.py)."""
    from .. import native

    kind = _NATIVE_KIND.get(ttype)
    if kind is not None:
        out = native.decode_blocks(kind, raw, rows, row_len)
        if out is not None:
            return out
    return DECODERS[ttype][0](raw, rows, row_len)


def gguf_tensor_to_qtensor(raw: np.ndarray, shape, ttype: int) -> QTensor:
    """ggml 2-D tensor -> our `[K, N]` QTensor (transposed: ggml rows are
    out-features).  Integer formats are mapped exactly."""
    row_len, rows = shape[0], shape[1]  # ne[0]=in(K), ne[1]=out(N)
    dec, bits, group, offset = DECODERS[ttype]
    codes, scales, m = _decode(ttype, raw, rows, row_len)
    # transpose to [K, N]
    codes_t = np.ascontiguousarray(codes.T)          # [K, N]
    scales_t = np.ascontiguousarray(scales.T)        # [K/g, N]
    spec = QSpec(QType.INT, bits, group, symmetric=(m is None))
    data = pack_codes(jnp.asarray(codes_t), bits)
    zeros = None
    if m is not None:
        # float per-group offset: w = scale*code + zeros_f
        zeros = jnp.asarray(np.ascontiguousarray(m.T), jnp.float32)
    return QTensor(data, jnp.asarray(scales_t, jnp.float32), zeros, None,
                   spec, (row_len, rows))


def gguf_tensor_to_array(reader: GGUFReader, info: GGUFTensorInfo,
                         dtype=jnp.float32) -> jnp.ndarray:
    raw = reader.tensor_bytes(info)
    if info.ggml_type == GGML_F32:
        a = raw.view(np.float32).reshape(info.shape[::-1])
    elif info.ggml_type == GGML_F16:
        a = raw.view(np.float16).astype(np.float32).reshape(
            info.shape[::-1]
        )
    else:
        dec, bits, group, offset = DECODERS[info.ggml_type]
        row_len, rows = info.shape[0], info.shape[1] if len(
            info.shape
        ) > 1 else 1
        codes, scales, m = _decode(info.ggml_type, raw, rows, row_len)
        g = group
        sf = np.repeat(scales, g, axis=1)
        if m is None:
            a = (codes.astype(np.float32) - offset) * sf
        else:
            a = codes.astype(np.float32) * sf + np.repeat(m, g, axis=1)
        a = a.reshape(*([rows, row_len] if len(info.shape) > 1 else
                        [row_len]))
    return jnp.asarray(a, dtype)


# ---------------------------------------------------------------------------
# writer (parity: convert-hf-to-gguf.py, neural_speed/convert/)
# ---------------------------------------------------------------------------


def _vt_of(v) -> int:
    if isinstance(v, bool):
        return T_BOOL
    if isinstance(v, int):
        return T_U32 if 0 <= v < 2 ** 32 else T_I64
    if isinstance(v, float):
        return T_F32
    if isinstance(v, str):
        return T_STR
    raise TypeError(type(v))


class GGUFWriter:
    def __init__(self, path: str):
        self.path = path
        self.kv: List[Tuple[str, Any]] = []
        self.tensors: List[Tuple[str, Tuple[int, ...], int, bytes]] = []

    def add(self, key: str, value: Any):
        self.kv.append((key, value))

    def add_tensor(self, name: str, data: np.ndarray, ggml_type: int,
                   raw: Optional[bytes] = None):
        """data in ggml orientation [rows(out), row_len(in)] unless raw
        bytes are given with an explicit shape."""
        if raw is None:
            raw = encode_ggml(data, ggml_type)
        shape = (data.shape[-1],) + tuple(reversed(data.shape[:-1]))
        self.tensors.append((name, shape, ggml_type, raw))

    @staticmethod
    def _wstr(f: BinaryIO, s: str):
        b = s.encode("utf-8")
        f.write(struct.pack("<Q", len(b)))
        f.write(b)

    def _wvalue(self, f: BinaryIO, v):
        if isinstance(v, list):
            f.write(struct.pack("<I", T_ARR))
            assert v, "empty arrays unsupported"
            et = _vt_of(v[0])
            f.write(struct.pack("<IQ", et, len(v)))
            for item in v:
                self._wscalar(f, item, et)
        else:
            vt = _vt_of(v)
            f.write(struct.pack("<I", vt))
            self._wscalar(f, v, vt)

    def _wscalar(self, f: BinaryIO, v, vt: int):
        if vt == T_STR:
            self._wstr(f, v)
        else:
            f.write(struct.pack(_SCALAR_FMT[vt], v))

    def write(self):
        align = 32
        with open(self.path, "wb") as f:
            f.write(struct.pack("<IIQQ", GGUF_MAGIC, 3, len(self.tensors),
                                len(self.kv)))
            for k, v in self.kv:
                self._wstr(f, k)
                self._wvalue(f, v)
            offset = 0
            metas = []
            for name, shape, ttype, raw in self.tensors:
                metas.append(offset)
                self._wstr(f, name)
                f.write(struct.pack("<I", len(shape)))
                f.write(struct.pack(f"<{len(shape)}Q", *shape))
                f.write(struct.pack("<IQ", ttype, offset))
                offset += (len(raw) + align - 1) // align * align
            pos = f.tell()
            pad = (pos + align - 1) // align * align - pos
            f.write(b"\0" * pad)
            for name, shape, ttype, raw in self.tensors:
                f.write(raw)
                pad = (len(raw) + align - 1) // align * align - len(raw)
                f.write(b"\0" * pad)


def encode_ggml(a: np.ndarray, ttype: int) -> bytes:
    """Encode a float array (ggml orientation [out, in]) into block bytes."""
    a = np.asarray(a, np.float32)
    if ttype == GGML_F32:
        return a.astype(np.float32).tobytes()
    if ttype == GGML_F16:
        return a.astype(np.float16).tobytes()
    flat = a.reshape(-1, 32)
    nb = flat.shape[0]
    if ttype == GGML_Q4_0:
        # llama.cpp: d = signed-absmax / -8
        idx = np.argmax(np.abs(flat), axis=1)
        amax = flat[np.arange(nb), idx]
        d = amax / -8.0
        d_safe = np.where(d == 0, 1.0, d)
        q = np.clip(np.round(flat / d_safe[:, None]) + 8, 0, 15).astype(
            np.uint8
        )
        out = np.zeros((nb, 18), np.uint8)
        out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
        out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
        return out.tobytes()
    if ttype == GGML_Q8_0:
        amax = np.abs(flat).max(axis=1)
        d = amax / 127.0
        d_safe = np.where(d == 0, 1.0, d)
        q = np.clip(np.round(flat / d_safe[:, None]), -127, 127).astype(
            np.int8
        )
        out = np.zeros((nb, 34), np.uint8)
        out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
        out[:, 2:] = q.view(np.uint8)
        return out.tobytes()
    if ttype in (GGML_Q4_K, GGML_Q5_K):
        # simple affine encoder (direct per-sub min/max; ggml's
        # make_qkx2_quants search would land on slightly better grids but
        # the FORMAT is identical): 8 sub-blocks of 32, 6-bit quantized
        # scale/min vs the f16 super-scales d/dmin
        qmax = 15 if ttype == GGML_Q4_K else 31
        sb = a.reshape(-1, 8, 32)
        nb = sb.shape[0]
        vmin = np.minimum(sb.min(axis=2), 0.0)             # [nb, 8] <= 0
        vmax = np.maximum(sb.max(axis=2), 0.0)
        scale = (vmax - vmin) / qmax
        mn = -vmin                                          # >= 0
        d = scale.max(axis=1) / 63.0                        # [nb]
        dmin = mn.max(axis=1) / 63.0
        d16 = d.astype(np.float16).astype(np.float32)
        dmin16 = dmin.astype(np.float16).astype(np.float32)
        d_s = np.where(d16 == 0, 1.0, d16)
        dm_s = np.where(dmin16 == 0, 1.0, dmin16)
        scq = np.clip(np.round(scale / d_s[:, None]), 0, 63).astype(np.uint8)
        mnq = np.clip(np.round(mn / dm_s[:, None]), 0, 63).astype(np.uint8)
        eff_scale = d16[:, None] * scq                      # [nb, 8]
        eff_min = dmin16[:, None] * mnq
        es = np.where(eff_scale == 0, 1.0, eff_scale)
        q = np.clip(np.round((sb + eff_min[:, :, None]) / es[:, :, None]),
                    0, qmax).astype(np.uint8)               # [nb, 8, 32]
        qf = q.reshape(nb, 256)
        bsz = 144 if ttype == GGML_Q4_K else 176
        out = np.zeros((nb, bsz), np.uint8)
        out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
        out[:, 2:4] = dmin.astype(np.float16)[:, None].view(np.uint8)
        out[:, 4:16] = _k4_pack_scale_min(scq, mnq)
        qs_off = 16 if ttype == GGML_Q4_K else 48
        for c in range(4):
            lo = qf[:, 64 * c: 64 * c + 32]
            hi = qf[:, 64 * c + 32: 64 * c + 64]
            out[:, qs_off + 32 * c: qs_off + 32 * c + 32] = (
                (lo & 0xF) | ((hi & 0xF) << 4))
            if ttype == GGML_Q5_K:
                out[:, 16:48] |= ((lo >> 4) << (2 * c)) | (
                    (hi >> 4) << (2 * c + 1))
        return out.tobytes()
    if ttype == GGML_Q2_K:
        sb = a.reshape(-1, 16, 16)
        nb = sb.shape[0]
        vmin = np.minimum(sb.min(axis=2), 0.0)
        vmax = np.maximum(sb.max(axis=2), 0.0)
        scale = (vmax - vmin) / 3.0
        mn = -vmin
        d = scale.max(axis=1) / 15.0
        dmin = mn.max(axis=1) / 15.0
        d16 = d.astype(np.float16).astype(np.float32)
        dmin16 = dmin.astype(np.float16).astype(np.float32)
        d_s = np.where(d16 == 0, 1.0, d16)
        dm_s = np.where(dmin16 == 0, 1.0, dmin16)
        scq = np.clip(np.round(scale / d_s[:, None]), 0, 15).astype(np.uint8)
        mnq = np.clip(np.round(mn / dm_s[:, None]), 0, 15).astype(np.uint8)
        eff_scale = d16[:, None] * scq
        eff_min = dmin16[:, None] * mnq
        es = np.where(eff_scale == 0, 1.0, eff_scale)
        q = np.clip(np.round((sb + eff_min[:, :, None]) / es[:, :, None]),
                    0, 3).astype(np.uint8).reshape(nb, 256)
        out = np.zeros((nb, 84), np.uint8)
        out[:, :16] = scq | (mnq << 4)
        for outer in range(2):
            for j in range(4):
                base = 128 * outer + 32 * j
                out[:, 16 + 32 * outer: 16 + 32 * outer + 32] |= (
                    q[:, base: base + 32] << (2 * j))
        out[:, 80:82] = d.astype(np.float16)[:, None].view(np.uint8)
        out[:, 82:84] = dmin.astype(np.float16)[:, None].view(np.uint8)
        return out.tobytes()
    if ttype == GGML_Q3_K:
        sb = a.reshape(-1, 16, 16)
        nb = sb.shape[0]
        amax = np.abs(sb).max(axis=2)                       # [nb, 16]
        scale = amax / 4.0                                  # code-4 in [-4,3]
        d = scale.max(axis=1) / 31.0                        # [nb]
        d16 = d.astype(np.float16).astype(np.float32)
        d_s = np.where(d16 == 0, 1.0, d16)
        scq = np.clip(np.round(scale / d_s[:, None]) + 32, 0, 63).astype(
            np.uint8)                                       # 6-bit, bias 32
        eff = d16[:, None] * (scq.astype(np.float32) - 32.0)
        es = np.where(eff == 0, 1.0, eff)
        q3 = np.clip(np.round(sb / es[:, :, None]) + 4, 0, 7).astype(
            np.uint8).reshape(nb, 256)
        out = np.zeros((nb, 110), np.uint8)
        for outer in range(2):
            for j in range(4):
                base = 128 * outer + 32 * j
                blkq = q3[:, base: base + 32]
                out[:, 32 + 32 * outer: 32 + 32 * outer + 32] |= (
                    (blkq & 3) << (2 * j))
                out[:, :32] |= (blkq >> 2) << (4 * outer + j)
        out[:, 96:108] = _q3k_pack_scales(scq)
        out[:, 108:110] = d.astype(np.float16)[:, None].view(np.uint8)
        return out.tobytes()
    raise ValueError(f"no encoder for ggml type {ttype}")


# ---------------------------------------------------------------------------
# llama-style sentencepiece tokenizer from GGUF metadata
# ---------------------------------------------------------------------------


class GGUFTokenizer:
    """Score-based greedy bigram merge — the algorithm of the reference's
    `model_tokenize` (model_utils.cpp:1858-1881, llama.cpp llm_tokenizer_spm)
    with byte fallback."""

    def __init__(self, tokens: List[str], scores: List[float],
                 types: Optional[List[int]] = None,
                 bos_id: int = 1, eos_id: int = 2, unk_id: int = 0,
                 add_bos: bool = True):
        self.tokens = tokens
        self.scores = scores
        self.types = types or [1] * len(tokens)
        self.vocab = {t: i for i, t in enumerate(tokens)}
        self.bos_token_id = bos_id
        self.eos_token_id = eos_id
        self.unk_id = unk_id
        self.add_bos = add_bos
        self.byte_ids = {}
        for b in range(256):
            tok = f"<0x{b:02X}>"
            if tok in self.vocab:
                self.byte_ids[b] = self.vocab[tok]
        self._native = 0  # 0 = untried, None = unavailable, else handle

    def __del__(self):
        if getattr(self, "_native", 0) not in (0, None):
            try:
                from .. import native

                native.spm_free(self._native)
            except Exception:
                pass  # interpreter shutdown

    def _encode_native(self, text: str) -> Optional[List[int]]:
        """Native (C++) priority-queue SPM merge — bit-identical to the
        Python loop below, O(n log n) (parity: the reference tokenizes in
        C++ too, model_utils.cpp:1858-1881)."""
        from .. import native

        if self._native == 0:
            self._native = native.spm_new(self.tokens, self.scores)
            if self._native is not None:
                bt = np.full(256, -1, np.int32)
                for b, tid in self.byte_ids.items():
                    bt[b] = tid
                self._byte_table = bt
        if self._native is None:
            return None
        return native.spm_encode(self._native, text, self._byte_table,
                                 self.unk_id)

    def encode(self, text: str, add_bos: Optional[bool] = None) -> List[int]:
        text = text.replace(" ", "▁")
        if not text.startswith("▁"):
            text = "▁" + text
        bos = add_bos if add_bos is not None else self.add_bos
        ids = self._encode_native(text)
        if ids is not None:
            return [self.bos_token_id] + ids if bos else ids
        syms = list(text)
        # greedy best-score merging
        while True:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                cand = syms[i] + syms[i + 1]
                tid = self.vocab.get(cand)
                if tid is not None and (
                    best is None or self.scores[tid] > best
                ):
                    best, best_i = self.scores[tid], i
            if best_i < 0:
                break
            syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        ids: List[int] = []
        for s in syms:
            tid = self.vocab.get(s)
            if tid is not None:
                ids.append(tid)
            else:  # byte fallback
                for b in s.encode("utf-8"):
                    ids.append(self.byte_ids.get(b, self.unk_id))
        if add_bos if add_bos is not None else self.add_bos:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text: str):
        return {"input_ids": self.encode(text)}

    def decode(self, ids) -> str:
        out = []
        byte_buf = []

        def flush():
            if byte_buf:
                out.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            t = self.tokens[int(i)]
            if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
                byte_buf.append(int(t[3:5], 16))
                continue
            flush()
            if int(i) in (self.bos_token_id, self.eos_token_id):
                continue
            out.append(t.replace("▁", " "))
        flush()
        return "".join(out)


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte<->unicode table (encoder.py
    bytes_to_unicode; also llama.cpp unicode_byte_to_utf8)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class GGUFBPETokenizer:
    """GPT-2-style byte-level BPE reconstructed from GGUF metadata
    (`tokenizer.ggml.model == "gpt2"`: tokens already in byte-to-unicode
    space + rank-ordered merges) — the vocab of falcon/mpt/bloom/gpt2
    GGUF files.  Parity: the reference's gguf vocab parse feeding
    `model_tokenize`; algorithm: llama.cpp llm_tokenizer_bpe / the
    original GPT-2 encoder.py."""

    _PAT = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"
            r" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")

    def __init__(self, tokens: List[str], merges: List[str],
                 bos_id: Optional[int] = None, eos_id: Optional[int] = None,
                 unk_id: int = 0, add_bos: bool = False):
        import regex

        self.tokens = tokens
        self.vocab = {t: i for i, t in enumerate(tokens)}
        self.ranks: Dict[Tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            a, _, c = m.partition(" ")
            self.ranks[(a, c)] = i
        self.bos_token_id = bos_id
        self.eos_token_id = eos_id
        self.unk_id = unk_id
        self.add_bos = add_bos
        self._b2u = _bytes_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}
        self._re = regex.compile(self._PAT)
        self._cache: Dict[str, List[str]] = {}

    def _bpe(self, piece: str) -> List[str]:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        word = list(piece)
        while len(word) > 1:
            best, best_i = None, -1
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best_i < 0:
                break
            word[best_i: best_i + 2] = [word[best_i] + word[best_i + 1]]
        if len(self._cache) < 32768:
            self._cache[piece] = word
        return word

    def encode(self, text: str,
               add_bos: Optional[bool] = None) -> List[int]:
        ids: List[int] = []
        for piece in self._re.findall(text):
            mapped = "".join(self._b2u[b] for b in piece.encode("utf-8"))
            for sub in self._bpe(mapped):
                ids.append(self.vocab.get(sub, self.unk_id))
        bos = self.add_bos if add_bos is None else add_bos
        if bos and self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text: str):
        return {"input_ids": self.encode(text)}

    def decode(self, ids) -> str:
        buf = bytearray()
        for i in ids:
            i = int(i)
            if i in (self.bos_token_id, self.eos_token_id):
                continue
            for ch in self.tokens[i]:
                b = self._u2b.get(ch)
                if b is not None:
                    buf.append(b)
                else:  # added/special token stored verbatim
                    buf.extend(ch.encode("utf-8"))
        return buf.decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# full-model load (parity: gguf path of model_load_internal,
# llama_utils.cpp:90-252 blk.N.* name mapping)
# ---------------------------------------------------------------------------

_GGUF_ARCH_KEYS = {
    "llama": "llama",
    "mistral": "mistral",
    "qwen2": "qwen2",
    "gemma": "gemma",
    "stablelm": "stablelm",
    "phi3": "phi3",
}


def _arch_from_gguf(kv: Dict[str, Any], tensors=None) -> ArchConfig:
    arch = kv["general.architecture"]
    name = _GGUF_ARCH_KEYS.get(arch, arch)
    pre = arch

    def g(key, default=None):
        return kv.get(f"{pre}.{key}", default)

    n_heads = g("attention.head_count")
    vocab = kv.get("tokenizer.ggml.tokens")
    vocab_size = (len(vocab) if vocab is not None
                  else g("vocab_size", kv.get("general.vocab_size")))
    # non-llama families the reference validates GGUF for (docs/gguf.md:
    # falcon, mpt, bloom) — reuse the HF arch builders via synthesized
    # config dicts so per-arch quirks stay in one place
    if arch == "falcon":
        from ..models.configs import falcon_arch

        n_kv = g("attention.head_count_kv", 1)
        two_norms = bool(tensors) and "blk.0.attn_norm_2.weight" in tensors
        return falcon_arch({
            "vocab_size": vocab_size,
            "hidden_size": g("embedding_length"),
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "num_kv_heads": n_kv,
            "new_decoder_architecture": two_norms
            or n_kv not in (1, n_heads),
            "multi_query": n_kv == 1,
            "layer_norm_epsilon": g("attention.layer_norm_epsilon", 1e-5),
            "rope_theta": g("rope.freq_base", 10000.0),
            "alibi": False,
        })
    if arch == "mpt":
        from ..models.configs import mpt_arch

        e = g("embedding_length")
        return mpt_arch({
            "vocab_size": vocab_size,
            "d_model": e,
            "n_layers": g("block_count"),
            "n_heads": n_heads,
            "expansion_ratio": g("feed_forward_length", 4 * e) // e,
            "max_seq_len": g("context_length", 2048),
            "attn_config": {
                "clip_qkv": g("attention.clamp_kqv"),
                "kv_n_heads": g("attention.head_count_kv", n_heads),
            },
        })
    if arch == "bloom":
        from ..models.configs import bloom_arch

        return bloom_arch({
            "vocab_size": vocab_size,
            "hidden_size": g("embedding_length"),
            "n_layer": g("block_count"),
            "n_head": n_heads,
            "layer_norm_epsilon": g("attention.layer_norm_epsilon", 1e-5),
        })
    e = g("embedding_length")
    d = e // n_heads if (e and n_heads) else 0
    if arch == "gptj":
        from ..models.configs import gptj_arch

        return gptj_arch({
            "vocab_size": vocab_size,
            "n_embd": e,
            "n_layer": g("block_count"),
            "n_head": n_heads,
            "n_inner": g("feed_forward_length"),
            "n_positions": g("context_length", 2048),
            "layer_norm_epsilon": g("attention.layer_norm_epsilon", 1e-5),
            "rotary_dim": g("rope.dimension_count", d),
        })
    if arch == "gptneox":
        from ..models.configs import gptneox_arch

        return gptneox_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 2048),
            "rotary_pct": g("rope.dimension_count", d) / d,
            "use_parallel_residual": bool(g("use_parallel_residual", True)),
            "layer_norm_eps": g("attention.layer_norm_epsilon", 1e-5),
            "rotary_emb_base": g("rope.freq_base", 10000.0),
        })
    if arch == "starcoder":
        from ..models.configs import starcoder_arch

        return starcoder_arch({
            "vocab_size": vocab_size,
            "n_embd": e,
            "n_layer": g("block_count"),
            "n_head": n_heads,
            "multi_query": g("attention.head_count_kv", 1) == 1,
            "n_inner": g("feed_forward_length"),
            "n_positions": g("context_length", 8192),
            "layer_norm_epsilon": g("attention.layer_norm_epsilon", 1e-5),
        })
    if arch in ("phi", "phi2"):
        from ..models.configs import phi_arch

        return phi_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "num_key_value_heads": g("attention.head_count_kv", n_heads),
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 2048),
            "partial_rotary_factor": g("rope.dimension_count", d) / d,
            "layer_norm_eps": g("attention.layer_norm_epsilon", 1e-5),
            "rope_theta": g("rope.freq_base", 10000.0),
        })
    if arch == "qwen":
        from ..models.configs import qwen_arch

        return qwen_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "intermediate_size": g("feed_forward_length"),
            "seq_length": g("context_length", 8192),
            "layer_norm_epsilon": g("attention.layer_norm_rms_epsilon",
                                    1e-6),
            "rotary_emb_base": g("rope.freq_base", 10000.0),
        })
    if arch == "gemma":
        from ..models.configs import gemma_arch

        return gemma_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "num_key_value_heads": g("attention.head_count_kv", n_heads),
            "intermediate_size": g("feed_forward_length"),
            "head_dim": g("attention.key_length", d),
            "max_position_embeddings": g("context_length", 8192),
            "rms_norm_eps": g("attention.layer_norm_rms_epsilon", 1e-6),
            "rope_theta": g("rope.freq_base", 10000.0),
        })
    if arch == "stablelm":
        from ..models.configs import stablelm_arch

        return stablelm_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "num_key_value_heads": g("attention.head_count_kv", n_heads),
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 4096),
            "layer_norm_eps": g("attention.layer_norm_epsilon", 1e-5),
            "rope_theta": g("rope.freq_base", 10000.0),
            "partial_rotary_factor": g("rope.dimension_count", d) / d,
            "use_qkv_bias": bool(tensors)
            and "blk.0.attn_q.bias" in tensors,
        })
    if arch == "opt":
        from ..models.configs import opt_arch

        return opt_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "ffn_dim": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 2048),
            "activation_function": g("activation", "relu"),
            "do_layer_norm_before": True,
            "word_embed_proj_dim": e,
        })
    if arch == "baichuan":
        from ..models.configs import baichuan_arch

        return baichuan_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 4096),
            "rms_norm_eps": g("attention.layer_norm_rms_epsilon", 1e-6),
        })
    if arch in ("chatglm2", "chatglm3"):
        from ..models.configs import chatglm2_arch

        hkv = g("attention.head_count_kv", n_heads)
        return chatglm2_arch({
            "padded_vocab_size": vocab_size,
            "hidden_size": e,
            "num_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "multi_query_attention": hkv != n_heads,
            "multi_query_group_num": hkv,
            "ffn_hidden_size": g("feed_forward_length"),
            "seq_length": g("context_length", 8192),
            "layernorm_epsilon": g("attention.layer_norm_rms_epsilon",
                                   1e-5),
            "rope_ratio": g("rope.ratio", 1.0),
        })
    if arch == "mixtral":
        from ..models.configs import mixtral_arch

        return mixtral_arch({
            "vocab_size": vocab_size,
            "hidden_size": e,
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": n_heads,
            "num_key_value_heads": g("attention.head_count_kv", n_heads),
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 4096),
            "rms_norm_eps": g("attention.layer_norm_rms_epsilon", 1e-5),
            "rope_theta": g("rope.freq_base", 10000.0),
            "num_local_experts": g("expert_count", 8),
            "num_experts_per_tok": g("expert_used_count", 2),
        })
    return ArchConfig(
        name=name,
        vocab_size=vocab_size,
        hidden_size=g("embedding_length"),
        n_layers=g("block_count"),
        n_heads=n_heads,
        n_kv_heads=g("attention.head_count_kv", n_heads),
        intermediate_size=g("feed_forward_length"),
        max_position_embeddings=g("context_length", 4096),
        norm="rms",
        norm_eps=g("attention.layer_norm_rms_epsilon", 1e-5),
        rope_style="neox",
        rope_base=g("rope.freq_base", 10000.0),
        act="silu",
    )


def load_gguf_model(path: str):
    """Returns (params, ArchConfig, GGUFTokenizer)."""
    import numpy as _np

    r = GGUFReader(path)
    arch = r.kv["general.architecture"]
    cfg = _arch_from_gguf(r.kv, r.tensors)

    def lin(name):
        info = r.tensors[name]
        if info.ggml_type in DECODERS:
            return {"w": gguf_tensor_to_qtensor(
                r.tensor_bytes(info), info.shape, info.ggml_type
            )}
        return {"w": gguf_tensor_to_array(r, info, jnp.bfloat16).T}

    def arr(name, dtype=jnp.float32):
        return gguf_tensor_to_array(r, r.tensors[name], dtype)

    def lin_b(base):
        out = lin(base + ".weight")
        if base + ".bias" in r.tensors:
            out["b"] = arr(base + ".bias")
        return out

    def norm_g(base):
        out = {"weight": arr(base + ".weight")}
        if base + ".bias" in r.tensors:
            out["bias"] = arr(base + ".bias")
        return out

    def qkv_split(entry, sections):
        """Unfuse a plain-concat attn_qkv entry along N (the gguf
        falcon/mpt/bloom graphs view wqkv at contiguous [q; k; v]
        offsets)."""
        from ..ops.quantize import QTensor, split_n

        w = entry["w"]
        if isinstance(w, QTensor):
            parts = split_n(w, sections)
        else:
            idx = _np.cumsum(sections)[:-1]
            parts = jnp.split(w, idx, axis=1)
        outs = [{"w": p} for p in parts]
        if "b" in entry:
            idx = _np.cumsum(sections)[:-1]
            for o, bpart in zip(outs, jnp.split(entry["b"], idx)):
                o["b"] = bpart
        return outs

    params: Dict[str, Any] = {
        "embed": {"weight": arr("token_embd.weight", jnp.bfloat16)},
        "layers": [],
        "final_norm": norm_g("output_norm"),
    }
    if "token_embd_norm.weight" in r.tensors:  # bloom embedding LN
        params["embed_ln"] = norm_g("token_embd_norm")
    if "position_embd.weight" in r.tensors:    # starcoder learned positions
        params["pos_embed"] = {
            "weight": arr("position_embd.weight", jnp.bfloat16)}
    if "output.weight" in r.tensors:
        params["lm_head"] = lin_b("output")
    qkv_sections = [cfg.q_dim, cfg.kv_dim, cfg.kv_dim]
    # one tensor-presence-driven loop serves every arch: fused attn_qkv
    # (plain [q; k; v] row concat — our normalized writer form AND the
    # form llama.cpp-style converters emit for falcon/mpt/bloom/gptneox/
    # starcoder) or separate q/k/v, optional biases, optional gate,
    # parallel-residual archs without ffn_norm, falcon-40b attn_norm_2
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        lp: Dict[str, Any] = {"attn_norm": norm_g(b + "attn_norm")}
        if b + "ffn_norm.weight" in r.tensors:
            lp["ffn_norm"] = norm_g(b + "ffn_norm")
        if b + "attn_norm_2.weight" in r.tensors:  # falcon-40b ln_mlp
            lp["ffn_norm"] = norm_g(b + "attn_norm_2")
        if b + "attn_qkv.weight" in r.tensors:
            q, k, v = qkv_split(lin_b(b + "attn_qkv"), qkv_sections)
            lp["q"], lp["k"], lp["v"] = q, k, v
        else:
            lp["q"] = lin_b(b + "attn_q")
            lp["k"] = lin_b(b + "attn_k")
            lp["v"] = lin_b(b + "attn_v")
        lp["o"] = lin_b(b + "attn_output")
        if b + "ffn_gate_inp.weight" in r.tensors:  # mixtral MoE
            moe: Dict[str, Any] = {
                "router": {"w": gguf_tensor_to_array(
                    r, r.tensors[b + "ffn_gate_inp.weight"],
                    jnp.float32).T},
                "experts": [],
            }
            n_exp = cfg.moe.num_experts
            for ei in range(n_exp):
                moe["experts"].append({
                    "gate": lin(f"{b}ffn_gate.{ei}.weight"),
                    "up": lin(f"{b}ffn_up.{ei}.weight"),
                    "down": lin(f"{b}ffn_down.{ei}.weight"),
                })
            lp["moe"] = moe
            params["layers"].append(lp)
            continue
        ffn = {
            "up": lin_b(b + "ffn_up"),
            "down": lin_b(b + "ffn_down"),
        }
        if b + "ffn_gate.weight" in r.tensors:
            ffn["gate"] = lin_b(b + "ffn_gate")
        lp["ffn"] = ffn
        params["layers"].append(lp)
    tok = None
    tok_model = r.kv.get("tokenizer.ggml.model", "llama")
    if tok_model in ("llama", "spm") and "tokenizer.ggml.tokens" in r.kv:
        tok = GGUFTokenizer(
            r.kv["tokenizer.ggml.tokens"],
            r.kv.get("tokenizer.ggml.scores",
                     [0.0] * len(r.kv["tokenizer.ggml.tokens"])),
            r.kv.get("tokenizer.ggml.token_type"),
            bos_id=r.kv.get("tokenizer.ggml.bos_token_id", 1),
            eos_id=r.kv.get("tokenizer.ggml.eos_token_id", 2),
            unk_id=r.kv.get("tokenizer.ggml.unknown_token_id", 0),
        )
    elif tok_model == "gpt2" and "tokenizer.ggml.tokens" in r.kv:
        tok = GGUFBPETokenizer(
            r.kv["tokenizer.ggml.tokens"],
            r.kv.get("tokenizer.ggml.merges", []),
            bos_id=r.kv.get("tokenizer.ggml.bos_token_id"),
            eos_id=r.kv.get("tokenizer.ggml.eos_token_id"),
            unk_id=r.kv.get("tokenizer.ggml.unknown_token_id", 0),
        )
    return params, cfg, tok


def write_hf_to_gguf(state_dict, hf_cfg: Dict[str, Any], out_path: str,
                     ggml_type: int = GGML_Q4_0,
                     tokens: Optional[List[str]] = None,
                     scores: Optional[List[float]] = None,
                     merges: Optional[List[str]] = None):
    """HF checkpoint -> GGUF (parity: convert-hf-to-gguf.py).
    Weights arrive torch-style [out, in], which is ggml's row layout.
    llama-family plus the reference's validated non-llama GGUF archs
    (docs/gguf.md): falcon / mpt / bloom — fused qkv normalized to the
    plain [q; k; v] row concat their gguf graphs expect."""
    import numpy as _np

    def np_of(t):
        if hasattr(t, "detach"):
            t = t.detach().float().cpu().numpy()
        return _np.asarray(t, _np.float32)

    arch = hf_cfg.get("model_type", "llama")
    if arch in ("falcon", "mpt", "bloom"):
        return _write_gguf_nonllama(state_dict, hf_cfg, out_path, ggml_type,
                                    np_of, tokens=tokens, merges=merges)
    if arch in ("gptj", "gpt_neox", "gptneox", "gpt_bigcode", "starcoder",
                "phi", "qwen", "opt", "chatglm", "chatglm2", "chatglm3"):
        return _write_gguf_arch2(state_dict, hf_cfg, out_path, ggml_type,
                                 np_of, tokens=tokens, merges=merges)

    w = GGUFWriter(out_path)
    n_heads = hf_cfg["num_attention_heads"]
    w.add("general.architecture", arch)
    w.add("general.name", "neural_speed_tpu export")
    w.add(f"{arch}.vocab_size", hf_cfg["vocab_size"])
    w.add(f"{arch}.embedding_length", hf_cfg["hidden_size"])
    w.add(f"{arch}.block_count", hf_cfg["num_hidden_layers"])
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv",
          hf_cfg.get("num_key_value_heads", n_heads))
    w.add(f"{arch}.feed_forward_length", hf_cfg["intermediate_size"])
    w.add(f"{arch}.context_length",
          hf_cfg.get("max_position_embeddings", 4096))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          float(hf_cfg.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(hf_cfg.get("rope_theta", 10000.0)))
    if arch == "gemma":  # head_dim decoupled from hidden/heads
        w.add("gemma.attention.key_length",
              hf_cfg.get("head_dim",
                         hf_cfg["hidden_size"] // n_heads))
    if arch == "stablelm":  # partial rotary + LN norms
        hd = hf_cfg["hidden_size"] // n_heads
        w.add("stablelm.rope.dimension_count",
              int(hf_cfg.get("partial_rotary_factor", 0.25) * hd))
        w.add("stablelm.attention.layer_norm_epsilon",
              float(hf_cfg.get("layer_norm_eps", 1e-5)))
    if arch == "mixtral":
        w.add("mixtral.expert_count", hf_cfg.get("num_local_experts", 8))
        w.add("mixtral.expert_used_count",
              hf_cfg.get("num_experts_per_tok", 2))
    if tokens:
        w.add("tokenizer.ggml.model", "llama")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.scores",
              scores or [0.0] * len(tokens))

    def put(name, key, ttype=None):
        w.add_tensor(name, np_of(state_dict[key]),
                     ttype if ttype is not None else ggml_type)

    def put_lin(name, key):
        """Quantized weight + optional f32 bias (qwen2-style qkv biases)."""
        put(name + ".weight", key + ".weight")
        if key + ".bias" in state_dict:
            put(name + ".bias", key + ".bias", GGML_F32)

    def put_norm(name, key):
        put(name + ".weight", key + ".weight", GGML_F32)
        if key + ".bias" in state_dict:  # stablelm-class LN biases
            put(name + ".bias", key + ".bias", GGML_F32)

    put("token_embd.weight", "model.embed_tokens.weight", GGML_F16)
    put_norm("output_norm", "model.norm")
    if "lm_head.weight" in state_dict:
        put("output.weight", "lm_head.weight", ggml_type)
    moe = "num_local_experts" in hf_cfg and arch == "mixtral"
    for i in range(hf_cfg["num_hidden_layers"]):
        hf = f"model.layers.{i}."
        b = f"blk.{i}."
        put_norm(b + "attn_norm", hf + "input_layernorm")
        put_norm(b + "ffn_norm", hf + "post_attention_layernorm")
        if hf + "self_attn.W_pack.weight" in state_dict:  # baichuan fused
            wqkv = np_of(state_dict[hf + "self_attn.W_pack.weight"])
            qd = wqkv.shape[0] // 3
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                w.add_tensor(f"{b}{nm}.weight",
                             wqkv[j * qd:(j + 1) * qd], ggml_type)
        else:
            put_lin(b + "attn_q", hf + "self_attn.q_proj")
            put_lin(b + "attn_k", hf + "self_attn.k_proj")
            put_lin(b + "attn_v", hf + "self_attn.v_proj")
        put_lin(b + "attn_output", hf + "self_attn.o_proj")
        if moe:
            put(b + "ffn_gate_inp.weight",
                hf + "block_sparse_moe.gate.weight", GGML_F32)
            for e in range(hf_cfg["num_local_experts"]):
                ep = hf + f"block_sparse_moe.experts.{e}."
                put(f"{b}ffn_gate.{e}.weight", ep + "w1.weight")
                put(f"{b}ffn_down.{e}.weight", ep + "w2.weight")
                put(f"{b}ffn_up.{e}.weight", ep + "w3.weight")
        else:
            put(b + "ffn_gate.weight", hf + "mlp.gate_proj.weight")
            put(b + "ffn_up.weight", hf + "mlp.up_proj.weight")
            put(b + "ffn_down.weight", hf + "mlp.down_proj.weight")
    w.write()


def _write_gguf_arch2(sd, hf_cfg, out_path, ggml_type, np_of, tokens=None,
                      merges=None):
    """Normalized GGUF export for the second arch wave (VERDICT r1 item 8):
    gptj / gptneox / starcoder / phi / qwen(1).  Fused HF qkv tensors are
    normalized to separate attn_q/k/v (gptneox's per-head interleave is
    un-interleaved, starcoder/qwen plain concats sliced) so the reader's
    generic loop serves every arch (parity: convert-hf-to-gguf.py per-arch
    subclasses, :565+)."""
    import numpy as _np

    mt = hf_cfg["model_type"]
    arch = {"gpt_neox": "gptneox", "gpt_bigcode": "starcoder",
            "chatglm": "chatglm2", "chatglm3": "chatglm2"}.get(mt, mt)
    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.name", "neural_speed_tpu export")
    w.add("general.vocab_size",
          hf_cfg.get("vocab_size") or hf_cfg["padded_vocab_size"])
    if tokens:
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.tokens", tokens)
        if merges:
            w.add("tokenizer.ggml.merges", merges)
        if hf_cfg.get("bos_token_id") is not None:
            w.add("tokenizer.ggml.bos_token_id", hf_cfg["bos_token_id"])
        if hf_cfg.get("eos_token_id") is not None:
            w.add("tokenizer.ggml.eos_token_id", hf_cfg["eos_token_id"])

    def meta(k, v):
        w.add(f"{arch}.{k}", v)

    def wt(name, a, ttype=None):
        w.add_tensor(name, _np.asarray(a, _np.float32),
                     ttype if ttype is not None else ggml_type)

    def wnorm(name, base):
        wt(name + ".weight", np_of(sd[base + ".weight"]), GGML_F32)
        if base + ".bias" in sd:
            wt(name + ".bias", np_of(sd[base + ".bias"]), GGML_F32)

    def wlin(name, base):
        wt(name + ".weight", np_of(sd[base + ".weight"]))
        if base + ".bias" in sd:
            wt(name + ".bias", np_of(sd[base + ".bias"]), GGML_F32)

    if mt == "gptj":
        e, h, nl = hf_cfg["n_embd"], hf_cfg["n_head"], hf_cfg["n_layer"]
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", h)
        meta("feed_forward_length", hf_cfg.get("n_inner") or 4 * e)
        meta("context_length", hf_cfg.get("n_positions", 2048))
        meta("rope.dimension_count", hf_cfg.get("rotary_dim") or e // h)
        meta("attention.layer_norm_epsilon",
             float(hf_cfg.get("layer_norm_epsilon", 1e-5)))
        wt("token_embd.weight", np_of(sd["transformer.wte.weight"]),
           GGML_F16)
        wnorm("output_norm", "transformer.ln_f")
        wlin("output", "lm_head")
        for i in range(nl):
            hfp = f"transformer.h.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "ln_1")
            wlin(b + "attn_q", hfp + "attn.q_proj")
            wlin(b + "attn_k", hfp + "attn.k_proj")
            wlin(b + "attn_v", hfp + "attn.v_proj")
            wlin(b + "attn_output", hfp + "attn.out_proj")
            wlin(b + "ffn_up", hfp + "mlp.fc_in")
            wlin(b + "ffn_down", hfp + "mlp.fc_out")
    elif mt in ("gpt_neox", "gptneox"):
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        nl = hf_cfg["num_hidden_layers"]
        d = e // h
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", h)
        meta("feed_forward_length", hf_cfg["intermediate_size"])
        meta("context_length", hf_cfg.get("max_position_embeddings", 2048))
        meta("rope.dimension_count",
             int(hf_cfg.get("rotary_pct", 0.25) * d))
        meta("use_parallel_residual",
             bool(hf_cfg.get("use_parallel_residual", True)))
        meta("attention.layer_norm_epsilon",
             float(hf_cfg.get("layer_norm_eps", 1e-5)))
        meta("rope.freq_base", float(hf_cfg.get("rotary_emb_base", 10000.0)))
        wt("token_embd.weight", np_of(sd["gpt_neox.embed_in.weight"]),
           GGML_F16)
        wnorm("output_norm", "gpt_neox.final_layer_norm")
        wt("output.weight", np_of(sd["embed_out.weight"]))
        for i in range(nl):
            hfp = f"gpt_neox.layers.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "input_layernorm")
            wnorm(b + "ffn_norm", hfp + "post_attention_layernorm")
            # HF interleave [h, 3, d, :] -> separate q/k/v
            qkv = np_of(sd[hfp + "attention.query_key_value.weight"])
            w3 = qkv.reshape(h, 3, d, -1)
            bqkv = np_of(sd[hfp + "attention.query_key_value.bias"])
            b3 = bqkv.reshape(h, 3, d)
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                wt(f"{b}{nm}.weight", w3[:, j].reshape(h * d, -1))
                wt(f"{b}{nm}.bias", b3[:, j].reshape(-1), GGML_F32)
            wlin(b + "attn_output", hfp + "attention.dense")
            wlin(b + "ffn_up", hfp + "mlp.dense_h_to_4h")
            wlin(b + "ffn_down", hfp + "mlp.dense_4h_to_h")
    elif mt in ("gpt_bigcode", "starcoder"):
        e, h, nl = hf_cfg["n_embd"], hf_cfg["n_head"], hf_cfg["n_layer"]
        d = e // h
        hkv = 1 if hf_cfg.get("multi_query", True) else h
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", hkv)
        meta("feed_forward_length", hf_cfg.get("n_inner") or 4 * e)
        meta("context_length", hf_cfg.get("n_positions", 8192))
        meta("attention.layer_norm_epsilon",
             float(hf_cfg.get("layer_norm_epsilon", 1e-5)))
        wt("token_embd.weight", np_of(sd["transformer.wte.weight"]),
           GGML_F16)
        wt("position_embd.weight", np_of(sd["transformer.wpe.weight"]),
           GGML_F16)
        wnorm("output_norm", "transformer.ln_f")
        qd, kvd = e, hkv * d
        for i in range(nl):
            hfp = f"transformer.h.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "ln_1")
            wnorm(b + "ffn_norm", hfp + "ln_2")
            # plain [q; k; v] concat rows
            qkv = np_of(sd[hfp + "attn.c_attn.weight"])
            bqkv = np_of(sd[hfp + "attn.c_attn.bias"])
            ofs = [0, qd, qd + kvd, qd + 2 * kvd]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                wt(f"{b}{nm}.weight", qkv[ofs[j]:ofs[j + 1]])
                wt(f"{b}{nm}.bias", bqkv[ofs[j]:ofs[j + 1]], GGML_F32)
            wlin(b + "attn_output", hfp + "attn.c_proj")
            wlin(b + "ffn_up", hfp + "mlp.c_fc")
            wlin(b + "ffn_down", hfp + "mlp.c_proj")
    elif mt == "phi":
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        nl = hf_cfg["num_hidden_layers"]
        d = e // h
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv",
             hf_cfg.get("num_key_value_heads") or h)
        meta("feed_forward_length", hf_cfg["intermediate_size"])
        meta("context_length", hf_cfg.get("max_position_embeddings", 2048))
        meta("rope.dimension_count",
             int(hf_cfg.get("partial_rotary_factor", 0.5) * d))
        meta("attention.layer_norm_epsilon",
             float(hf_cfg.get("layer_norm_eps", 1e-5)))
        meta("rope.freq_base", float(hf_cfg.get("rope_theta", 10000.0)))
        wt("token_embd.weight", np_of(sd["model.embed_tokens.weight"]),
           GGML_F16)
        wnorm("output_norm", "model.final_layernorm")
        wlin("output", "lm_head")
        for i in range(nl):
            hfp = f"model.layers.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "input_layernorm")
            wlin(b + "attn_q", hfp + "self_attn.q_proj")
            wlin(b + "attn_k", hfp + "self_attn.k_proj")
            wlin(b + "attn_v", hfp + "self_attn.v_proj")
            wlin(b + "attn_output", hfp + "self_attn.dense")
            wlin(b + "ffn_up", hfp + "mlp.fc1")
            wlin(b + "ffn_down", hfp + "mlp.fc2")
    elif mt == "opt":
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        nl = hf_cfg["num_hidden_layers"]
        if hf_cfg.get("word_embed_proj_dim", e) != e or not hf_cfg.get(
                "do_layer_norm_before", True):
            raise NotImplementedError(
                "opt variants with word_embed_proj_dim != hidden or "
                "post-norm (350m) are not exportable")
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", h)
        meta("feed_forward_length", hf_cfg["ffn_dim"])
        meta("context_length", hf_cfg.get("max_position_embeddings", 2048))
        meta("attention.layer_norm_epsilon", 1e-5)
        meta("activation", hf_cfg.get("activation_function", "relu"))
        dec = "model.decoder."
        wt("token_embd.weight", np_of(sd[dec + "embed_tokens.weight"]),
           GGML_F16)
        wt("position_embd.weight", np_of(sd[dec + "embed_positions.weight"]),
           GGML_F16)
        wnorm("output_norm", dec + "final_layer_norm")
        for i in range(nl):
            hfp = f"{dec}layers.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "self_attn_layer_norm")
            wnorm(b + "ffn_norm", hfp + "final_layer_norm")
            wlin(b + "attn_q", hfp + "self_attn.q_proj")
            wlin(b + "attn_k", hfp + "self_attn.k_proj")
            wlin(b + "attn_v", hfp + "self_attn.v_proj")
            wlin(b + "attn_output", hfp + "self_attn.out_proj")
            wlin(b + "ffn_up", hfp + "fc1")
            wlin(b + "ffn_down", hfp + "fc2")
    elif mt in ("chatglm", "chatglm2", "chatglm3"):
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        nl = hf_cfg["num_layers"]
        d = hf_cfg.get("kv_channels", e // h)
        hkv = (hf_cfg.get("multi_query_group_num", h)
               if hf_cfg.get("multi_query_attention", False) else h)
        inter = hf_cfg["ffn_hidden_size"]
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", hkv)
        meta("feed_forward_length", inter)
        meta("context_length", hf_cfg.get("seq_length", 8192))
        meta("attention.layer_norm_rms_epsilon",
             float(hf_cfg.get("layernorm_epsilon", 1e-5)))
        meta("rope.ratio", float(hf_cfg.get("rope_ratio", 1.0)))
        enc = "transformer.encoder."
        wt("token_embd.weight",
           np_of(sd["transformer.embedding.word_embeddings.weight"]),
           GGML_F16)
        wnorm("output_norm", enc + "final_layernorm")
        wt("output.weight", np_of(sd["transformer.output_layer.weight"]))
        qd, kvd = h * d, hkv * d
        for i in range(nl):
            hfp = f"{enc}layers.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "input_layernorm")
            wnorm(b + "ffn_norm", hfp + "post_attention_layernorm")
            qkv = np_of(sd[hfp + "self_attention.query_key_value.weight"])
            bqkv = sd.get(hfp + "self_attention.query_key_value.bias")
            ofs = [0, qd, qd + kvd, qd + 2 * kvd]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                wt(f"{b}{nm}.weight", qkv[ofs[j]:ofs[j + 1]])
                if bqkv is not None:
                    wt(f"{b}{nm}.bias", np_of(bqkv)[ofs[j]:ofs[j + 1]],
                       GGML_F32)
            wlin(b + "attn_output", hfp + "self_attention.dense")
            # swiglu fused dense_h_to_4h = [gate; up] halves
            w4h = np_of(sd[hfp + "mlp.dense_h_to_4h.weight"])
            wt(b + "ffn_gate.weight", w4h[:inter])
            wt(b + "ffn_up.weight", w4h[inter:])
            wlin(b + "ffn_down", hfp + "mlp.dense_4h_to_h")
    else:  # qwen (qwen-1)
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        nl = hf_cfg["num_hidden_layers"]
        meta("embedding_length", e)
        meta("block_count", nl)
        meta("attention.head_count", h)
        meta("attention.head_count_kv", h)
        meta("feed_forward_length", hf_cfg["intermediate_size"])
        meta("context_length", hf_cfg.get("seq_length", 8192))
        meta("attention.layer_norm_rms_epsilon",
             float(hf_cfg.get("layer_norm_epsilon", 1e-6)))
        meta("rope.freq_base",
             float(hf_cfg.get("rotary_emb_base", 10000.0)))
        wt("token_embd.weight", np_of(sd["transformer.wte.weight"]),
           GGML_F16)
        wnorm("output_norm", "transformer.ln_f")
        wlin("output", "lm_head")
        for i in range(nl):
            hfp = f"transformer.h.{i}."
            b = f"blk.{i}."
            wnorm(b + "attn_norm", hfp + "ln_1")
            wnorm(b + "ffn_norm", hfp + "ln_2")
            qkv = np_of(sd[hfp + "attn.c_attn.weight"])
            bqkv = np_of(sd[hfp + "attn.c_attn.bias"])
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                wt(f"{b}{nm}.weight", qkv[j * e:(j + 1) * e])
                wt(f"{b}{nm}.bias", bqkv[j * e:(j + 1) * e], GGML_F32)
            wlin(b + "attn_output", hfp + "attn.c_proj")
            # qwen-1 MLP: out = c_proj(w1(x) * silu(w2(x))): up=w1, gate=w2
            wlin(b + "ffn_up", hfp + "mlp.w1")
            wlin(b + "ffn_gate", hfp + "mlp.w2")
            wlin(b + "ffn_down", hfp + "mlp.c_proj")
    w.write()


def _write_gguf_nonllama(sd, hf_cfg, out_path, ggml_type, np_of,
                         tokens=None, merges=None):
    import numpy as _np

    arch = hf_cfg["model_type"]
    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.name", "neural_speed_tpu export")
    if tokens:
        # these families ship byte-level BPE vocabs (gpt2 scheme)
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.tokens", tokens)
        if merges:  # the writer cannot encode empty arrays; the loader
            w.add("tokenizer.ggml.merges", merges)  # defaults to []
        if hf_cfg.get("bos_token_id") is not None:
            w.add("tokenizer.ggml.bos_token_id", hf_cfg["bos_token_id"])
        if hf_cfg.get("eos_token_id") is not None:
            w.add("tokenizer.ggml.eos_token_id", hf_cfg["eos_token_id"])

    def wt(name, a, ttype=None):
        w.add_tensor(name, _np.asarray(a, _np.float32),
                     ttype if ttype is not None else ggml_type)

    if arch == "falcon":
        e = hf_cfg["hidden_size"]
        h = hf_cfg["num_attention_heads"]
        d = e // h
        new_dec = hf_cfg.get("new_decoder_architecture", False)
        hkv = (hf_cfg.get("num_kv_heads") or hf_cfg.get("n_head_kv", 8)) \
            if new_dec else (1 if hf_cfg.get("multi_query", True) else h)
        w.add("falcon.embedding_length", e)
        w.add("falcon.block_count", hf_cfg["num_hidden_layers"])
        w.add("falcon.attention.head_count", h)
        w.add("falcon.attention.head_count_kv", hkv)
        w.add("falcon.feed_forward_length", 4 * e)
        w.add("falcon.attention.layer_norm_epsilon",
              float(hf_cfg.get("layer_norm_epsilon", 1e-5)))
        w.add("falcon.rope.freq_base",
              float(hf_cfg.get("rope_theta", 10000.0)))
        w.add("general.vocab_size", hf_cfg["vocab_size"])
        pre_t = "transformer."
        wt("token_embd.weight", np_of(sd[pre_t + "word_embeddings.weight"]),
           GGML_F16)
        wt("output_norm.weight", np_of(sd[pre_t + "ln_f.weight"]), GGML_F32)
        wt("output_norm.bias", np_of(sd[pre_t + "ln_f.bias"]), GGML_F32)
        if "lm_head.weight" in sd:
            wt("output.weight", np_of(sd["lm_head.weight"]), ggml_type)
        n_rep = h // hkv
        for i in range(hf_cfg["num_hidden_layers"]):
            hfp = f"{pre_t}h.{i}."
            b = f"blk.{i}."
            if new_dec:  # 40b: ln_attn + ln_mlp
                wt(b + "attn_norm.weight", np_of(sd[hfp + "ln_attn.weight"]),
                   GGML_F32)
                wt(b + "attn_norm.bias", np_of(sd[hfp + "ln_attn.bias"]),
                   GGML_F32)
                wt(b + "attn_norm_2.weight", np_of(sd[hfp + "ln_mlp.weight"]),
                   GGML_F32)
                wt(b + "attn_norm_2.bias", np_of(sd[hfp + "ln_mlp.bias"]),
                   GGML_F32)
            else:
                wt(b + "attn_norm.weight",
                   np_of(sd[hfp + "input_layernorm.weight"]), GGML_F32)
                wt(b + "attn_norm.bias",
                   np_of(sd[hfp + "input_layernorm.bias"]), GGML_F32)
            # HF grouping [hkv, n_rep+2, d, :] -> plain [q; k; v] rows
            qkv = np_of(sd[hfp + "self_attention.query_key_value.weight"])
            w4 = qkv.reshape(hkv, n_rep + 2, d, -1)
            plain = _np.concatenate([
                w4[:, :n_rep].reshape(h * d, -1),
                w4[:, n_rep].reshape(hkv * d, -1),
                w4[:, n_rep + 1].reshape(hkv * d, -1),
            ])
            wt(b + "attn_qkv.weight", plain)
            wt(b + "attn_output.weight",
               np_of(sd[hfp + "self_attention.dense.weight"]))
            wt(b + "ffn_up.weight",
               np_of(sd[hfp + "mlp.dense_h_to_4h.weight"]))
            wt(b + "ffn_down.weight",
               np_of(sd[hfp + "mlp.dense_4h_to_h.weight"]))
    elif arch == "mpt":
        e = hf_cfg["d_model"]
        h = hf_cfg["n_heads"]
        attn_cfg = hf_cfg.get("attn_config", {})
        w.add("mpt.embedding_length", e)
        w.add("mpt.block_count", hf_cfg["n_layers"])
        w.add("mpt.attention.head_count", h)
        w.add("mpt.attention.head_count_kv",
              attn_cfg.get("kv_n_heads", h))
        w.add("mpt.feed_forward_length",
              hf_cfg.get("expansion_ratio", 4) * e)
        w.add("mpt.context_length", hf_cfg.get("max_seq_len", 2048))
        if attn_cfg.get("clip_qkv"):
            w.add("mpt.attention.clamp_kqv", float(attn_cfg["clip_qkv"]))
        w.add("general.vocab_size", hf_cfg["vocab_size"])
        pre_t = "transformer."
        wt("token_embd.weight", np_of(sd[pre_t + "wte.weight"]), GGML_F16)
        wt("output_norm.weight", np_of(sd[pre_t + "norm_f.weight"]),
           GGML_F32)
        for i in range(hf_cfg["n_layers"]):
            hfp = f"{pre_t}blocks.{i}."
            b = f"blk.{i}."
            wt(b + "attn_norm.weight", np_of(sd[hfp + "norm_1.weight"]),
               GGML_F32)
            wt(b + "ffn_norm.weight", np_of(sd[hfp + "norm_2.weight"]),
               GGML_F32)
            wt(b + "attn_qkv.weight", np_of(sd[hfp + "attn.Wqkv.weight"]))
            wt(b + "attn_output.weight",
               np_of(sd[hfp + "attn.out_proj.weight"]))
            wt(b + "ffn_up.weight", np_of(sd[hfp + "ffn.up_proj.weight"]))
            wt(b + "ffn_down.weight",
               np_of(sd[hfp + "ffn.down_proj.weight"]))
    else:  # bloom
        e = hf_cfg.get("hidden_size") or hf_cfg["n_embd"]
        h = hf_cfg.get("n_head") or hf_cfg["num_attention_heads"]
        d = e // h
        nl = hf_cfg.get("n_layer") or hf_cfg["num_hidden_layers"]
        w.add("bloom.embedding_length", e)
        w.add("bloom.block_count", nl)
        w.add("bloom.attention.head_count", h)
        w.add("bloom.attention.head_count_kv", h)
        w.add("bloom.feed_forward_length", 4 * e)
        w.add("bloom.attention.layer_norm_epsilon",
              float(hf_cfg.get("layer_norm_epsilon", 1e-5)))
        w.add("general.vocab_size", hf_cfg["vocab_size"])
        pre_t = "transformer."
        wt("token_embd.weight", np_of(sd[pre_t + "word_embeddings.weight"]),
           GGML_F16)
        wt("token_embd_norm.weight",
           np_of(sd[pre_t + "word_embeddings_layernorm.weight"]), GGML_F32)
        wt("token_embd_norm.bias",
           np_of(sd[pre_t + "word_embeddings_layernorm.bias"]), GGML_F32)
        wt("output_norm.weight", np_of(sd[pre_t + "ln_f.weight"]), GGML_F32)
        wt("output_norm.bias", np_of(sd[pre_t + "ln_f.bias"]), GGML_F32)
        for i in range(nl):
            hfp = f"{pre_t}h.{i}."
            b = f"blk.{i}."
            wt(b + "attn_norm.weight",
               np_of(sd[hfp + "input_layernorm.weight"]), GGML_F32)
            wt(b + "attn_norm.bias",
               np_of(sd[hfp + "input_layernorm.bias"]), GGML_F32)
            wt(b + "ffn_norm.weight",
               np_of(sd[hfp + "post_attention_layernorm.weight"]), GGML_F32)
            wt(b + "ffn_norm.bias",
               np_of(sd[hfp + "post_attention_layernorm.bias"]), GGML_F32)
            # HF grouping [h, 3, d, :] -> plain [q; k; v] (llama.cpp's
            # BloomModel qkv re-pack)
            qkv = np_of(sd[hfp + "self_attention.query_key_value.weight"])
            w4 = qkv.reshape(h, 3, d, -1)
            plain = _np.concatenate([w4[:, j].reshape(h * d, -1)
                                     for j in range(3)])
            wt(b + "attn_qkv.weight", plain)
            bqkv = np_of(sd[hfp + "self_attention.query_key_value.bias"])
            b4 = bqkv.reshape(h, 3, d)
            wt(b + "attn_qkv.bias",
               _np.concatenate([b4[:, j].reshape(-1) for j in range(3)]),
               GGML_F32)
            wt(b + "attn_output.weight",
               np_of(sd[hfp + "self_attention.dense.weight"]))
            wt(b + "attn_output.bias",
               np_of(sd[hfp + "self_attention.dense.bias"]), GGML_F32)
            wt(b + "ffn_up.weight",
               np_of(sd[hfp + "mlp.dense_h_to_4h.weight"]))
            wt(b + "ffn_up.bias",
               np_of(sd[hfp + "mlp.dense_h_to_4h.bias"]), GGML_F32)
            wt(b + "ffn_down.weight",
               np_of(sd[hfp + "mlp.dense_4h_to_h.weight"]))
            wt(b + "ffn_down.bias",
               np_of(sd[hfp + "mlp.dense_4h_to_h.bias"]), GGML_F32)
    w.write()
