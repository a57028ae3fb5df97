"""Weight quantization: RTN quantizer + TPU-first packed storage.

Capability parity with the reference's weight pack pipeline
(bestla/bestla/bestla_prologue_b.h:378-1000: quantizeWeight -> reorderWeight ->
compressWeight + scale/zp correction), re-designed for TPU:

* **Planar ("sub-band") packing.**  A `[K, N]` code tensor of width `w` bits
  is split along K into `e = 32 // w` contiguous sub-bands, and word
  `word[kb, n]` holds bits of `band_i[kb, n]` at bit offset `w*i`.  Unpacking
  is then `concat_i((word >> w*i) & mask)` — a cheap concatenate along the
  sublane axis that restores *natural K order*, with no interleave shuffle.
  The reference instead interleaves NTILExPACK_ROW for AVX/AMX register
  tiles (bestla_prologue_b.h reorderWeight); the TPU analogue of "register
  tiling" is lane layout, which this planar scheme leaves 128-lane-contiguous
  in N.
* **Group scales in natural K order.**  `scales[K/g, N]`; because each
  sub-band covers a contiguous K range, a kernel dequantizing band `i` needs
  only the contiguous scale rows `[i*K_w//g : ...]`.
* **Odd bit widths** (3/5/6/7) are stored as sums of 4/2/1-bit planes —
  the same trick the reference uses (bestla_storage.h:697-835) — each plane
  planar-packed independently.

The QTensor is a JAX pytree so it shards/jits/donates like any array.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .qtypes import FP4_LUT, NF4_LUT, QSpec, QType, plane_widths

_EPS = 1e-8


# ---------------------------------------------------------------------------
# QTensor pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D weight `[K, N]` (K = contraction dim, N = out features).

    data    : tuple of packed planes.  INT b<8: uint32 planar-packed planes
              (see module docstring); INT8: single int8 `[K, N]`;
              FP8: single fp8 `[K, N]`; NF4/FP4: one uint32 4-bit plane.
    scales  : `[K/g, N]` scale per group (float32/bfloat16; int8 when
              double_quant, with `sscale` holding the secondary scale).
    zeros   : `[K/g, N]` uint8 unsigned zero points (asym INT only) or None.
    sscale  : `[1, N]` float32 secondary scale when double_quant, else None.
    spec    : static QSpec.
    shape   : static logical (K, N).
    """

    data: Tuple[jax.Array, ...]
    scales: jax.Array
    zeros: Optional[jax.Array]
    sscale: Optional[jax.Array]
    spec: QSpec
    shape: Tuple[int, int]

    def tree_flatten(self):
        children = (self.data, self.scales, self.zeros, self.sscale)
        aux = (self.spec, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales, zeros, sscale = children
        spec, shape = aux
        return cls(data, scales, zeros, sscale, spec, shape)

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    def effective_scales(self, dtype=jnp.float32) -> jax.Array:
        s = self.scales
        if self.sscale is not None:
            s = s.astype(jnp.float32) * self.sscale
        return s.astype(dtype)

    def nbytes(self) -> int:
        tot = 0
        for leaf in jax.tree_util.tree_leaves(
            (self.data, self.scales, self.zeros, self.sscale)
        ):
            tot += leaf.size * leaf.dtype.itemsize
        return tot


# ---------------------------------------------------------------------------
# planar bit packing
# ---------------------------------------------------------------------------


def pack_plane(codes: jax.Array, width: int) -> jax.Array:
    """Pack `[K, N]` codes (values < 2**width) into `[K//e, N]` uint32 planes.

    Planar layout: word[kb, n] bit-range [w*i, w*(i+1)) holds
    codes[i * (K//e) + kb, n], i.e. sub-band i is the contiguous K range
    [i*K//e, (i+1)*K//e).
    """
    k, n = codes.shape
    e = 32 // width
    if k % e:
        raise ValueError(f"K={k} must be divisible by {e} for {width}-bit packing")
    kw = k // e
    bands = codes.astype(jnp.uint32).reshape(e, kw, n)
    word = jnp.zeros((kw, n), jnp.uint32)
    for i in range(e):
        word = word | (bands[i] << (width * i))
    return word


def unpack_plane(word: jax.Array, width: int) -> jax.Array:
    """Inverse of `pack_plane`: `[K//e, N]` uint32 -> `[K, N]` uint8 codes."""
    e = 32 // width
    mask = jnp.uint32((1 << width) - 1)
    bands = [((word >> (width * i)) & mask) for i in range(e)]
    return jnp.concatenate(bands, axis=0).astype(jnp.uint8)


def pack_codes(codes: jax.Array, bits: int) -> Tuple[jax.Array, ...]:
    """Pack unsigned `[K, N]` codes of `bits` width into planar planes.

    Odd widths decompose into 4/2/1-bit planes, listed most-significant
    first (parity trick: bestla_storage.h 3/5/6/7-bit split buffers).
    """
    if bits == 8:
        return (codes.astype(jnp.uint8),)
    planes = []
    widths = plane_widths(bits)
    shift = bits
    for w in widths:
        shift -= w
        part = (codes.astype(jnp.uint32) >> shift) & ((1 << w) - 1)
        planes.append(pack_plane(part, w))
    return tuple(planes)


def unpack_codes(planes: Tuple[jax.Array, ...], bits: int, k: int) -> jax.Array:
    """Inverse of `pack_codes` -> unsigned `[K, N]` uint8 codes."""
    if bits == 8:
        return planes[0].astype(jnp.uint8)
    widths = plane_widths(bits)
    shift = bits
    out = None
    for w, p in zip(widths, planes):
        shift -= w
        part = unpack_plane(p, w).astype(jnp.int32) << shift
        out = part if out is None else out | part
    return out.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# LUT helpers (NF4 / FP4)
# ---------------------------------------------------------------------------


def _lut_for(spec: QSpec) -> np.ndarray:
    return NF4_LUT if spec.qtype == QType.NF4 else FP4_LUT


def _encode_lut(x: jax.Array, lut: np.ndarray) -> jax.Array:
    """Nearest-code encoding via sorted-LUT searchsorted (no 16x broadcast)."""
    order = np.argsort(lut)
    sorted_lut = lut[order]
    boundaries = (sorted_lut[1:] + sorted_lut[:-1]) / 2.0
    idx = jnp.searchsorted(jnp.asarray(boundaries), x)
    perm = jnp.asarray(order.astype(np.uint8))
    return perm[idx]


def lut_values(spec: QSpec, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_lut_for(spec), dtype=dtype)


def decode_lut(codes: jax.Array, spec: QSpec, dtype=jnp.float32) -> jax.Array:
    """codes uint8 -> LUT values.  Select-tree free: one gather on a 16-vec
    is slow on TPU, so use 15 vectorized selects (VPU-friendly)."""
    lut = _lut_for(spec)
    c = codes.astype(jnp.int32)
    out = jnp.full(c.shape, lut[0], dtype)
    for i in range(1, 16):
        out = jnp.where(c == i, jnp.asarray(lut[i], dtype), out)
    return out


# ---------------------------------------------------------------------------
# RTN quantize / dequantize
# ---------------------------------------------------------------------------


def _group_view(w: jax.Array, g: int) -> jax.Array:
    k, n = w.shape
    return w.reshape(k // g, g, n)


def quantize(w: jax.Array, spec: QSpec) -> QTensor:
    """RTN-quantize a float `[K, N]` weight.

    Parity: bestla_prologue_b.h:472-640 quantizeWeight (per-group sym/asym
    round-to-nearest) + compressWeight, in one functional step.
    """
    k, n = w.shape
    g = spec.effective_group(k)
    spec.groups(k)  # validates divisibility
    wf = w.astype(jnp.float32)
    wg = _group_view(wf, g)  # [G, g, N]

    zeros = None
    if spec.is_fp8:
        fmax = 448.0 if spec.qtype == QType.FP8_E4M3 else 57344.0
        absmax = jnp.max(jnp.abs(wg), axis=1)  # [G, N]
        scales = jnp.maximum(absmax / fmax, _EPS)
        dt = jnp.float8_e4m3fn if spec.qtype == QType.FP8_E4M3 else jnp.float8_e5m2
        codes = (wg / scales[:, None, :]).reshape(k, n).astype(dt)
        data = (codes,)
    elif spec.is_lut:
        absmax = jnp.max(jnp.abs(wg), axis=1)
        scales = jnp.maximum(absmax, _EPS)
        normed = (wg / scales[:, None, :]).reshape(k, n)
        codes = _encode_lut(normed, _lut_for(spec))
        data = pack_codes(codes, 4)
    elif spec.symmetric:
        if spec.bits == 1:
            absmean = jnp.maximum(jnp.mean(jnp.abs(wg), axis=1), _EPS)
            scales = absmean
            codes = (wg >= 0).astype(jnp.uint8).reshape(k, n)
        else:
            absmax = jnp.max(jnp.abs(wg), axis=1)
            scales = jnp.maximum(absmax / spec.maxq, _EPS)
            q = jnp.clip(jnp.round(wg / scales[:, None, :]), spec.minq, spec.maxq)
            codes = (q + spec.code_offset).astype(jnp.uint8).reshape(k, n)
        data = pack_codes(codes, spec.bits)
    else:  # asymmetric INT
        wmin = jnp.min(wg, axis=1)
        wmax = jnp.max(wg, axis=1)
        maxcode = (1 << spec.bits) - 1
        scales = jnp.maximum((wmax - wmin) / maxcode, _EPS)
        zp = jnp.clip(jnp.round(-wmin / scales), 0, maxcode)  # [G, N] unsigned
        q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zp[:, None, :], 0, maxcode)
        codes = q.astype(jnp.uint8).reshape(k, n)
        zeros = zp.astype(jnp.uint8)
        data = pack_codes(codes, spec.bits)

    sscale = None
    if spec.double_quant:
        smax = jnp.maximum(jnp.max(scales, axis=0, keepdims=True), _EPS)  # [1,N]
        sscale = smax / 127.0
        scales = jnp.clip(jnp.round(scales / sscale), 1, 127).astype(jnp.int8)
    elif spec.scale_dtype == "bfloat16":
        scales = scales.astype(jnp.bfloat16)
    return QTensor(data, scales, zeros, sscale, spec, (k, n))


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization back to `[K, N]` floats (reference path; the hot
    path fuses this into the matmul kernels in ops/matmul.py).

    Parity: bestla_prologue_b.h getWeight / kernel dequant paths.
    """
    spec = qt.spec
    k, n = qt.shape
    g = spec.effective_group(k)
    scales = qt.effective_scales(jnp.float32)  # [G, N]
    sfull = jnp.repeat(scales, g, axis=0)  # [K, N]

    if spec.is_fp8:
        vals = qt.data[0].astype(jnp.float32)
    elif spec.is_lut:
        codes = unpack_codes(qt.data, 4, k)
        vals = decode_lut(codes, spec, jnp.float32)
    else:
        codes = unpack_codes(qt.data, spec.bits, k).astype(jnp.int32)
        if spec.bits == 1:
            vals = (2 * codes - 1).astype(jnp.float32)
        elif spec.symmetric:
            vals = (codes - spec.code_offset).astype(jnp.float32)
        else:
            zfull = jnp.repeat(qt.zeros.astype(jnp.int32), g, axis=0)
            vals = (codes - zfull).astype(jnp.float32)
    return (vals * sfull).astype(dtype)


def quantization_error(w: jax.Array, spec: QSpec) -> jax.Array:
    """RMS relative error of a round trip — used by tests and quant tuning."""
    qt = quantize(w, spec)
    wd = dequantize(qt)
    return jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.maximum(
        jnp.sqrt(jnp.mean(w**2)), _EPS
    )
