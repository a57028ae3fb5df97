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

# BTLA_PROLOGUEB_IDS (bestla.h:91-104): WeightPack=0, then
# WeightKBlockNInteger = KBlockBegin = NormalEnd = 1, NFloat = 2
PROLOGUE_KBLOCK_NINTEGER = 1


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
        if self.prologue_id not in (PROLOGUE_KBLOCK_NINTEGER,):
            raise NotImplementedError(
                f"BTLA prologue id {self.prologue_id} (only "
                "WeightKBlockNInteger is supported)")
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
        if self.dq_buf is not None:
            raise NotImplementedError("double-quant (DQ8_BNB) BTLA storage")

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
        else:
            raise NotImplementedError(
                f"BTLA weight dtype {self.dtype:#x} (int 2-8 bit "
                "supported; float f4/nf4/fp8 storages use LUT layouts — "
                "re-quantize from the fp checkpoint instead)")
        # inverse of reorderWeight: [N/NTILE][KPad/P][NTILE][P] -> [K, N]
        arr = stream.reshape(np_ // nt, kp // p, nt, p)
        w = arr.transpose(1, 3, 0, 2).reshape(kp, np_)
        return w[: self.k, : self.n]

    def scales(self) -> np.ndarray:
        """[ceil(K/block), N] float32."""
        nk = self.kpad // self.block_size
        if self.scale_t == DT_F32:
            s = self.scale_buf.view(np.float32).reshape(nk, self.cstep)
        elif self.scale_t == DT_BF16:
            u = self.scale_buf.view(np.uint16).astype(np.uint32) << 16
            s = u.view(np.float32).reshape(nk, self.cstep)
        else:
            raise NotImplementedError(f"scale dtype {self.scale_t:#x}")
        rows = -(-self.k // self.block_size)
        return np.ascontiguousarray(s[:rows, : self.n])

    def zeros(self) -> Optional[np.ndarray]:
        """[ceil(K/block), N] unsigned zero points (stored s8 + offset),
        or None for symmetric."""
        if self.zp_buf is None:
            return None
        nk = self.kpad // self.block_size
        z = self.zp_buf.view(np.int8).reshape(nk, self.cstep)
        rows = -(-self.k // self.block_size)
        bits = self.dtype & 0xFF
        return (z[:rows, : self.n].astype(np.int16)
                + (1 << (bits - 1))).astype(np.uint8)

    def dequant(self) -> np.ndarray:
        """Reference dequantization -> float32 [K, N] (vs unpackWeight)."""
        bits = self.dtype & 0xFF
        q = self.codes().astype(np.float32) - (1 << (bits - 1))
        s = np.repeat(self.scales(), self.block_size, axis=0)[: self.k]
        z = self.zeros()
        if z is not None:
            zf = (z.astype(np.float32) - (1 << (bits - 1)))
            q = q - np.repeat(zf, self.block_size, axis=0)[: self.k]
        return q * s


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
    spec = QSpec(QType.INT, bits, st.block_size,
                 symmetric=st.zp_buf is None,
                 scale_dtype="bfloat16" if st.scale_t == DT_BF16
                 else "float32")
    codes = st.codes()
    scales = st.scales()
    zeros = st.zeros()
    if n_perm is not None:
        codes = codes[:, n_perm]
        scales = scales[:, n_perm]
        if zeros is not None:
            zeros = zeros[:, n_perm]
    data = pack_codes(jnp.asarray(np.ascontiguousarray(codes)), bits)
    return QTensor(
        data,
        jnp.asarray(np.ascontiguousarray(scales),
                    jnp.bfloat16 if st.scale_t == DT_BF16 else jnp.float32),
        None if zeros is None else jnp.asarray(
            np.ascontiguousarray(zeros), jnp.int32),
        None, spec, (st.k, st.n),
    )
