"""Serialized BesTLA weight-storage parser — ingest the reference's
QUANTIZED native checkpoints (`q4_j`-style .bin files whose tensors are
`NE_TYPE_BTLA` blobs).

Parity (wire format read from the reference sources, validated bit-exactly
against fixtures produced by compiling the reference itself — see
tests/test_btla.py):
  * serialization layout — `StorageWeightKBlockNInteger::serialize`
    (bestla/bestla_storage.h:697-835): ISerializable mSize u64 ->
    IWeightBase mPrologueID u32, mCoreId u64, mNPad/mKPad/mN/mK i32,
    mDType u32 -> IWeightKBlockBase mBlockSize/mDqBlockSize i32 ->
    mQBuf (ObjectAlignedBuffer: mBufSize u64, mBufOffset u64, pad, data)
    -> ObjectQuantCorrection (mScaT/mZpT/mRedT u32, mCStep i32, mCSize
    u64, scale buffer + optional zp/reduce/dq buffers each prefixed by a
    bool, bestla_storage.h:151-232) -> optional shuffle indices.
  * weight reorder — `reorderWeight` (bestla_prologue_b.h:490-510)
    interleaves the [K, N] quantized matrix into NTILE column panels of
    PACK_ROW-packed rows: element (k, n) lives at
    (n//NTILE)*KPad*NTILE + (k//P)*NTILE*P + (n%NTILE)*P + (k%P).
    NTILE/PACK_ROW decode from mCoreId (gemm::CoreAttr bit layout,
    bestla_gemm.h:83-122: NTILE = id & 0xff, PACK_ROW = (id>>8) & 0xff).
  * 4-bit packing — `compress_s8_s4` (kernel_ref.h:155-166): stored
    nibble = s8 + 8, LOW nibble = even element of the reordered stream;
    dequant per `convert_s4_s8_8` (kernel_ref.h:368+: nibble - 8).
  * scales/zeros — `setQuantCorrection` (bestla_prologue_b.h:246+):
    [nk_scale, NPad] row-major, f32 or bf16 scales, s8 zero points.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# BTLA_DTYPE constants (bestla.h:38-88)
_TYPE_INT = 1 << 8
_SUBTYPE_SHIFT = 16
DT_F32 = 32
DT_F16 = 16
DT_BF16 = 16 | (1 << _SUBTYPE_SHIFT)
DT_S8 = 8 | _TYPE_INT
DT_S4_CLIP = 4 | _TYPE_INT
DT_S2_CLIP = 2 | _TYPE_INT
DT_S3_CLIP = 3 | _TYPE_INT
DT_S5_CLIP = 5 | _TYPE_INT
DT_S6_CLIP = 6 | _TYPE_INT
DT_S7_CLIP = 7 | _TYPE_INT
# float 4/8-bit storages (TypeFloat = 0; subtype in bits 16..23)
DT_F4_E2M1 = 4
DT_F4_BNB = 4 | (1 << _SUBTYPE_SHIFT)
DT_F4_NF4 = 4 | (2 << _SUBTYPE_SHIFT)
DT_F8_E4M3 = 8
DT_F8_E5M2 = 8 | (1 << _SUBTYPE_SHIFT)
DT_F8_E8M0 = 8 | (3 << _SUBTYPE_SHIFT)
DT_DQ8_BNB = 8 | (4 << _SUBTYPE_SHIFT)

# BTLA_PROLOGUEB_IDS (bestla.h:91-104): WeightPack=0, then
# WeightKBlockNInteger = KBlockBegin = NormalEnd = 1, NFloat = 2
PROLOGUE_KBLOCK_NINTEGER = 1
PROLOGUE_KBLOCK_NFLOAT = 2


def _ref_nf4_lut() -> np.ndarray:
    """F4_NF4 code->value table (kernel_ref.h:1325-1366 nf4_unpack).
    The reference swaps the canonical bnb codes of -1 and 0 so that the
    all-zeros nibble used for padding dequantizes to 0 (their comment at
    kernel_ref.h:1369-1371); code 0b0111 is -1, code 0 is 0."""
    from ..ops.qtypes import NF4_LUT

    lut = np.empty(16, np.float32)
    lut[0] = 0.0
    lut[1:7] = NF4_LUT[1:7]          # -0.6961928 .. -0.09105
    lut[7] = -1.0
    lut[8:16] = NF4_LUT[8:16]        # 0.0795803 .. 1.0
    return lut


def _ref_fp4_lut(bnb: bool) -> np.ndarray:
    """F4_BNB / F4_E2M1 code->value tables (kernel_ref.h:1209-1230
    fp4_bnb_unpack / :1301-1322 fp4_e2m1_unpack).  bit3 = sign.  E2M1's
    3-bit magnitude index is monotonic; BNB's is NOT (it follows the
    bitsandbytes code assignment), and its subnormal is 1/192 vs 1/96."""
    if bnb:
        mags = np.array([0.0, 5.208333333e-03, 2 / 3, 1.0,
                         1 / 3, 1 / 2, 1 / 6, 1 / 4], np.float32)
    else:
        mags = np.array([0.0, 0.010416666666666666, 1 / 6, 1 / 4,
                         1 / 3, 1 / 2, 2 / 3, 1.0], np.float32)
    return np.concatenate([mags, -mags]).astype(np.float32)


# DQ8_BNB secondary-scale code table (bestla_utils.h:794-830 dq8_bnb_LUT;
# wire-format data required to decode reference double-quant checkpoints)
DQ8_BNB_LUT = np.array([
    -0.99297, -0.97891, -0.96484, -0.95078, -0.93672, -0.92266, -0.90859, -0.89453,
    -0.88047, -0.86641, -0.85234, -0.83828, -0.82422, -0.81016, -0.79609, -0.78203,
    -0.76797, -0.75391, -0.73984, -0.72578, -0.71172, -0.69766, -0.68359, -0.66953,
    -0.65547, -0.64141, -0.62734, -0.61328, -0.59922, -0.58516, -0.57109, -0.55703,
    -0.54297, -0.52891, -0.51484, -0.50078, -0.48672, -0.47266, -0.45859, -0.44453,
    -0.43047, -0.41641, -0.40234, -0.38828, -0.37422, -0.36016, -0.34609, -0.33203,
    -0.31797, -0.30391, -0.28984, -0.27578, -0.26172, -0.24766, -0.23359, -0.21953,
    -0.20547, -0.19141, -0.17734, -0.16328, -0.14922, -0.13516, -0.12109, -0.10703,
    -0.09859, -0.09578, -0.09297, -0.09016, -0.08734, -0.08453, -0.08172, -0.07891,
    -0.07609, -0.07328, -0.07047, -0.06766, -0.06484, -0.06203, -0.05922, -0.05641,
    -0.05359, -0.05078, -0.04797, -0.04516, -0.04234, -0.03953, -0.03672, -0.03391,
    -0.03109, -0.02828, -0.02547, -0.02266, -0.01984, -0.01703, -0.01422, -0.01141,
    -0.00972, -0.00916, -0.00859, -0.00803, -0.00747, -0.00691, -0.00634, -0.00578,
    -0.00522, -0.00466, -0.00409, -0.00353, -0.00297, -0.00241, -0.00184, -0.00128,
    -0.00094, -0.00083, -0.00072, -0.00061, -0.00049, -0.00038, -0.00027, -0.00016,
    -0.00009, -0.00007, -0.00004, -0.00002, -0.00001, -0.00000, -0.00000, 0.00000,
    0.00000, 0.00000, 0.00001, 0.00002, 0.00004, 0.00007, 0.00009, 0.00016,
    0.00027, 0.00038, 0.00049, 0.00061, 0.00072, 0.00083, 0.00094, 0.00128,
    0.00184, 0.00241, 0.00297, 0.00353, 0.00409, 0.00466, 0.00522, 0.00578,
    0.00634, 0.00691, 0.00747, 0.00803, 0.00859, 0.00916, 0.00972, 0.01141,
    0.01422, 0.01703, 0.01984, 0.02266, 0.02547, 0.02828, 0.03109, 0.03391,
    0.03672, 0.03953, 0.04234, 0.04516, 0.04797, 0.05078, 0.05359, 0.05641,
    0.05922, 0.06203, 0.06484, 0.06766, 0.07047, 0.07328, 0.07609, 0.07891,
    0.08172, 0.08453, 0.08734, 0.09016, 0.09297, 0.09578, 0.09859, 0.10703,
    0.12109, 0.13516, 0.14922, 0.16328, 0.17734, 0.19141, 0.20547, 0.21953,
    0.23359, 0.24766, 0.26172, 0.27578, 0.28984, 0.30391, 0.31797, 0.33203,
    0.34609, 0.36016, 0.37422, 0.38828, 0.40234, 0.41641, 0.43047, 0.44453,
    0.45859, 0.47266, 0.48672, 0.50078, 0.51484, 0.52891, 0.54297, 0.55703,
    0.57109, 0.58516, 0.59922, 0.61328, 0.62734, 0.64141, 0.65547, 0.66953,
    0.68359, 0.69766, 0.71172, 0.72578, 0.73984, 0.75391, 0.76797, 0.78203,
    0.79609, 0.81016, 0.82422, 0.83828, 0.85234, 0.86641, 0.88047, 0.89453,
    0.90859, 0.92266, 0.93672, 0.95078, 0.96484, 0.97891, 0.99297, 1.00000,
], np.float32)


class BTLAStorage:
    """Parsed StorageWeightKBlockNInteger."""

    def __init__(self, data: np.ndarray):
        off = 0

        def u64():
            nonlocal off
            v = struct.unpack_from("<Q", data, off)[0]
            off += 8
            return v

        def u32():
            nonlocal off
            v = struct.unpack_from("<I", data, off)[0]
            off += 4
            return v

        def i32():
            nonlocal off
            v = struct.unpack_from("<i", data, off)[0]
            off += 4
            return v

        def buf():
            nonlocal off
            size = u64()
            pad = u64()
            off += pad
            b = data[off:off + size]
            off += size
            return np.frombuffer(b, np.uint8)

        def opt_buf():
            nonlocal off
            not_empty = data[off]
            off += 1
            return buf() if not_empty else None

        self.size = u64()
        self.prologue_id = u32()
        if self.prologue_id not in (PROLOGUE_KBLOCK_NINTEGER,
                                    PROLOGUE_KBLOCK_NFLOAT):
            raise NotImplementedError(
                f"BTLA prologue id {self.prologue_id} (WeightKBlockNInteger"
                " and WeightKBlockNFloat are supported)")
        self.core_id = u64()
        self.ntile = self.core_id & 0xFF
        self.pack_row = (self.core_id >> 8) & 0xFF
        self.npad = i32()
        self.kpad = i32()
        self.n = i32()
        self.k = i32()
        self.dtype = u32()
        self.block_size = i32()
        self.dq_block_size = i32()
        self.qbuf = buf()
        self.scale_t = u32()
        self.zp_t = u32()
        self.red_t = u32()
        self.cstep = i32()
        self.csize = u64()
        self.scale_buf = buf()
        self.zp_buf = opt_buf()
        self.red_buf = opt_buf()
        self.dq_buf = opt_buf()
        self.shuffle_buf = opt_buf()

    @property
    def is_float_weight(self) -> bool:
        return (self.dtype & 0xFF00) == 0  # TypeFloat

    @property
    def bits(self) -> int:
        return self.dtype & 0xFF

    # -- decode ----------------------------------------------------------
    def _bit4_plane(self, buf) -> np.ndarray:
        """[n] low-4-bit values from a bit4x2 plane (x = even el, LSBs)."""
        lo = (buf & 0xF).astype(np.uint8)
        hi = (buf >> 4).astype(np.uint8)
        out = np.empty(buf.size * 2, np.uint8)
        out[0::2] = lo
        out[1::2] = hi
        return out

    @staticmethod
    def _bit2_plane(buf) -> np.ndarray:
        """[n] 2-bit values from a bit2x4 plane (a..d = LSB-first)."""
        out = np.empty(buf.size * 4, np.uint8)
        for i in range(4):
            out[i::4] = (buf >> (2 * i)) & 0x3
        return out

    @staticmethod
    def _bit1_plane(buf) -> np.ndarray:
        """[n] bits from a bit1x8 plane (a..h = LSB-first)."""
        out = np.empty(buf.size * 8, np.uint8)
        for i in range(8):
            out[i::8] = (buf >> i) & 0x1
        return out

    def codes(self) -> np.ndarray:
        """Un-reorder the quantized weights -> unsigned codes [K, N]
        (code = stored + 2^(bits-1), matching our QTensor convention).

        Odd widths are bit-PLANE compressed in the reordered stream
        (kernel_ref.h compress_{2,3,5,6,7}bit; plane offsets per
        bestla_prologue_b.h compressBit*Weight): S3 = bit2 plane +
        bit1 plane at n/4 bytes; S5 = bit4 + bit1 at n/2; S6 = bit4 +
        bit2 at n/2; S7 = bit4 + bit2 at n/2 + bit1 at 3n/4."""
        kp, np_, nt, p = self.kpad, self.npad, self.ntile, self.pack_row
        n_elems = kp * np_
        q = self.qbuf
        if self.dtype == DT_S4_CLIP:
            stream = self._bit4_plane(q[: n_elems // 2])
        elif self.dtype == DT_S8:
            stream = (q[:n_elems].view(np.int8).astype(np.int16)
                      + 128).astype(np.uint8)
        elif self.dtype == DT_S3_CLIP:
            b2 = self._bit2_plane(q[: n_elems // 4])
            b1 = self._bit1_plane(q[n_elems // 4: n_elems // 4
                                    + n_elems // 8])
            stream = (b2 | (b1 << 2)).astype(np.uint8)
        elif self.dtype == DT_S5_CLIP:
            b4 = self._bit4_plane(q[: n_elems // 2])
            b1 = self._bit1_plane(q[n_elems // 2: n_elems // 2
                                    + n_elems // 8])
            stream = (b4 | (b1 << 4)).astype(np.uint8)
        elif self.dtype == DT_S6_CLIP:
            b4 = self._bit4_plane(q[: n_elems // 2])
            b2 = self._bit2_plane(q[n_elems // 2: n_elems // 2
                                    + n_elems // 4])
            stream = (b4 | (b2 << 4)).astype(np.uint8)
        elif self.dtype == DT_S7_CLIP:
            b4 = self._bit4_plane(q[: n_elems // 2])
            b2 = self._bit2_plane(q[n_elems // 2: n_elems // 2
                                    + n_elems // 4])
            b1 = self._bit1_plane(
                q[n_elems // 2 + n_elems // 4:
                  n_elems // 2 + n_elems // 4 + n_elems // 8])
            stream = (b4 | (b2 << 4) | (b1 << 6)).astype(np.uint8)
        elif self.dtype == DT_S2_CLIP:
            stream = self._bit2_plane(q[: n_elems // 4])
        elif self.dtype in (DT_F4_E2M1, DT_F4_BNB, DT_F4_NF4):
            # f4 nibbles are RAW codes (compress_f4, kernel_ref.h:167-176
            # — no +8 sign offset; the sign lives inside the 4-bit code)
            stream = self._bit4_plane(q[: n_elems // 2])
        elif self.dtype in (DT_F8_E4M3, DT_F8_E5M2):
            # f8 weights reorder WITHOUT a compress step
            # (WeightKBlockNFloat::packQWeight, bestla_prologue_b.h:1116)
            stream = q[:n_elems]
        else:
            raise NotImplementedError(
                f"BTLA weight dtype {self.dtype:#x}")
        # inverse of reorderWeight: [N/NTILE][KPad/P][NTILE][P] -> [K, N]
        arr = stream.reshape(np_ // nt, kp // p, nt, p)
        w = arr.transpose(1, 3, 0, 2).reshape(kp, np_)
        return w[: self.k, : self.n]

    def scales(self) -> np.ndarray:
        """[ceil(K/block), N] float32 (double-quant DQ8_BNB scales are
        decoded to their exact float values)."""
        nk = -(-self.kpad // self.block_size)
        if self.scale_t == DT_F32:
            s = self.scale_buf.view(np.float32).reshape(nk, self.cstep)
        elif self.scale_t == DT_BF16:
            u = self.scale_buf.view(np.uint16).astype(np.uint32) << 16
            s = u.view(np.float32).reshape(nk, self.cstep)
        elif self.scale_t == DT_F8_E8M0:
            # shared-exponent scale: stored int8 IS the exponent, scale =
            # 2^e (decompress_kblock_f8_fp, kernel_ref.h:1013-1015)
            e = self.scale_buf.view(np.int8).reshape(
                nk, self.cstep).astype(np.float32)
            s = np.exp2(e)
        elif self.scale_t == DT_DQ8_BNB:
            # double-quant scales (dq8_get_fp_scale, kernel_ref.h:1981-1992
            # / Dq8GetScale use in getWeight, bestla_prologue_b.h:699-707):
            # scale[i, j] = LUT[u8[i, j]] * dq[(i*mN + j) // dq_blk]
            #             + dq[last]  (last dq float = the mean offset,
            # dq8_bnb_double_quant, kernel_ref.h:1952-1979).  The linear
            # dq index runs over the UNPADDED column count mN.
            assert self.dq_buf is not None and self.dq_block_size > 0
            u8 = self.scale_buf.reshape(nk, self.cstep)
            dq = self.dq_buf.view(np.float32).astype(np.float64)
            rows = -(-self.k // self.block_size)
            i = np.arange(rows)[:, None]
            j = np.arange(self.n)[None, :]
            dq_idx = (i * self.n + j) // self.dq_block_size
            # Rounding parity with the compiled reference: the NFloat
            # in-kernel decode (decompress_dq_kblock_f4_fp) gets
            # FMA-contracted by -O2 (one rounding: f64 accumulate then
            # round), while the NInteger Dq8GetScale path rounds the
            # product and sum separately (plain f32) — both verified
            # bit-exact against gen3.cpp fixtures
            lut64 = DQ8_BNB_LUT.astype(np.float64)
            codes = u8[:rows, : self.n]
            if self.prologue_id == PROLOGUE_KBLOCK_NFLOAT:
                return (lut64[codes] * dq[dq_idx]
                        + dq[-1]).astype(np.float32)
            prod = (lut64[codes] * dq[dq_idx]).astype(np.float32)
            return (prod + dq[-1].astype(np.float32)).astype(np.float32)
        else:
            raise NotImplementedError(f"scale dtype {self.scale_t:#x}")
        rows = -(-self.k // self.block_size)
        return np.ascontiguousarray(s[:rows, : self.n])

    def zeros(self) -> Optional[np.ndarray]:
        """[ceil(K/block), N] unsigned zero points (stored s8 + offset),
        or None for symmetric."""
        if self.zp_buf is None:
            return None
        nk = -(-self.kpad // self.block_size)
        z = self.zp_buf.view(np.int8).reshape(nk, self.cstep)
        rows = -(-self.k // self.block_size)
        bits = self.dtype & 0xFF
        return (z[:rows, : self.n].astype(np.int16)
                + (1 << (bits - 1))).astype(np.uint8)

    def weight_lut(self) -> Optional[np.ndarray]:
        """code->value table for f4 weight dtypes (None otherwise)."""
        if self.dtype == DT_F4_NF4:
            return _ref_nf4_lut()
        if self.dtype == DT_F4_BNB:
            return _ref_fp4_lut(bnb=True)
        if self.dtype == DT_F4_E2M1:
            return _ref_fp4_lut(bnb=False)
        return None

    @staticmethod
    def _f8_values(codes: np.ndarray, ebits: int) -> np.ndarray:
        """f8 byte -> float32 (f8_to_fp32, kernel_ref.h:984-1001: no
        subnormals/NaN — exponent 0 decodes as a normal 2^(1-bias))."""
        c = codes.astype(np.uint32)
        mbits = 7 - ebits
        sign = np.where(c & 0x80, -1.0, 1.0).astype(np.float32)
        e = ((c & 0x7F) >> mbits).astype(np.int32) - (1 << (ebits - 1)) + 1
        m = (c & ((1 << mbits) - 1)).astype(np.float32) / (1 << mbits)
        return sign * np.exp2(e.astype(np.float32)) * (1.0 + m)

    def dequant(self) -> np.ndarray:
        """Reference dequantization -> float32 [K, N] (vs unpackWeight)."""
        lut = self.weight_lut()
        if lut is not None:
            q = lut[self.codes()]
        elif self.dtype in (DT_F8_E4M3, DT_F8_E5M2):
            ebits = 4 if self.dtype == DT_F8_E4M3 else 5
            q = self._f8_values(self.codes(), ebits)
        else:
            bits = self.dtype & 0xFF
            q = self.codes().astype(np.float32) - (1 << (bits - 1))
            z = self.zeros()
            if z is not None:
                zf = (z.astype(np.float32) - (1 << (bits - 1)))
                q = q - np.repeat(zf, self.block_size, axis=0)[: self.k]
        s = np.repeat(self.scales(), self.block_size, axis=0)[: self.k]
        return (q * s).astype(np.float32)


def btla_to_qtensor(raw: np.ndarray, n_perm: Optional[np.ndarray] = None):
    """Serialized BTLA blob -> our QTensor [K, N] (lossless code/scale
    mapping; the fused Pallas kernels then read it natively).  `n_perm`
    optionally permutes the out-feature axis (ggjt wq/wk rope-row
    unpermute — the reference quantizes AFTER the row permute, so the
    codes/scales columns carry it)."""
    import jax.numpy as jnp

    from ..ops.qtypes import QSpec, QType
    from ..ops.quantize import QTensor, pack_codes

    st = BTLAStorage(np.asarray(raw, np.uint8))
    bits = st.dtype & 0xFF
    # a block spanning all of K (the reference stores the nominal block
    # even when block >= K, e.g. g128 quant of a K=64 linear) maps to
    # our group -1 convention (QSpec.groups validates divisibility)
    group = -1 if st.block_size >= st.k else st.block_size
    # E8M0/DQ8_BNB scales decode to exact f32 values (scales() above), so
    # the QTensor carries materialized float32 scales for those storages
    scale_np = (jnp.bfloat16 if st.scale_t == DT_BF16 else jnp.float32)
    codes = st.codes()
    scales = st.scales()
    zeros = st.zeros()
    if n_perm is not None:
        codes = codes[:, n_perm]
        scales = scales[:, n_perm]
        if zeros is not None:
            zeros = zeros[:, n_perm]
    scales_j = jnp.asarray(np.ascontiguousarray(scales), scale_np)
    lut = st.weight_lut()
    if lut is not None:
        # f4 LUT storages: codes pass through RAW; the spec carries the
        # reference's exact code->value table so our kernels dequantize
        # value-identically (QSpec.lut; NF4 uses the reference's
        # swapped-0/-1 table, kernel_ref.h:1369-1371)
        qt_map = {DT_F4_NF4: QType.NF4, DT_F4_BNB: QType.FP4,
                  DT_F4_E2M1: QType.FP4}
        spec = QSpec(qt_map[st.dtype], 4, group, True,
                     "bfloat16" if st.scale_t == DT_BF16 else "float32",
                     lut=tuple(float(v) for v in lut))
        data = pack_codes(jnp.asarray(np.ascontiguousarray(codes)), 4)
        return QTensor(data, scales_j, None, None, spec, (st.k, st.n))
    if st.dtype in (DT_F8_E4M3, DT_F8_E5M2):
        # NEAR-exact: the reference's f8 decode has no subnormals (e=0 is
        # a normal 2^(1-bias), kernel_ref.h:984-1001) while our storage
        # uses IEEE e4m3fn/e5m2 — re-encoding the decoded values moves
        # only the e=0 codes by <= 2^-10 * scale
        e4 = st.dtype == DT_F8_E4M3
        vals = st._f8_values(codes, 4 if e4 else 5)
        spec = QSpec(QType.FP8_E4M3 if e4 else QType.FP8_E5M2, 8,
                     group, True,
                     "bfloat16" if st.scale_t == DT_BF16 else "float32")
        dt = jnp.float8_e4m3fn if e4 else jnp.float8_e5m2
        data = (jnp.asarray(np.ascontiguousarray(vals)).astype(dt),)
        return QTensor(data, scales_j, None, None, spec, (st.k, st.n))
    spec = QSpec(QType.INT, bits, group,
                 symmetric=st.zp_buf is None,
                 scale_dtype="bfloat16" if st.scale_t == DT_BF16
                 else "float32")
    data = pack_codes(jnp.asarray(np.ascontiguousarray(codes)), bits)
    return QTensor(
        data,
        scales_j,
        None if zeros is None else jnp.asarray(
            np.ascontiguousarray(zeros), jnp.int32),
        None, spec, (st.k, st.n),
    )
