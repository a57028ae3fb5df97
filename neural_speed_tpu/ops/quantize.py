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
    # K is packed in `k_shards` independent slabs so slicing rows into
    # k_shards equal parts yields valid planar packings — required when the
    # weight is row-sharded (tensor parallelism) and each device must see a
    # self-contained pack (parity: per-rank weight slicing at load,
    # model_files.h:134-235 calc_split_type/calc_ne).
    k_shards: int = 1

    def tree_flatten(self):
        children = (self.data, self.scales, self.zeros, self.sscale)
        aux = (self.spec, self.shape, self.k_shards)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales, zeros, sscale = children
        spec, shape, k_shards = aux
        return cls(data, scales, zeros, sscale, spec, shape, k_shards)

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    def leaf_dims(self) -> Tuple[int, int]:
        """(K, N) derived from the *leaves* — correct even inside shard_map
        where leaves are per-device slices but aux `shape` stays global."""
        n = self.scales.shape[-1]
        d0 = self.data[0]
        if self.spec.is_fp8 or (self.spec.qtype == QType.INT and
                                self.spec.bits == 8):
            return d0.shape[0], n
        w0 = 4 if self.spec.is_lut else plane_widths(self.spec.bits)[0]
        return d0.shape[0] * (32 // w0), n

    def local_view(self) -> "QTensor":
        """QTensor whose static shape matches the leaves (for use inside
        shard_map bodies).  A row-sharded tensor's local slice is a valid
        single-slab pack because of `k_shards` packing."""
        k, n = self.leaf_dims()
        if (k, n) == self.shape:
            return self
        local_shards = self.k_shards * k // self.shape[0]
        if local_shards * self.shape[0] != self.k_shards * k or local_shards < 1:
            raise ValueError(
                f"row shard {k} incompatible with k_shards={self.k_shards} "
                f"of global K={self.shape[0]}"
            )
        return dataclasses.replace(
            self, shape=(k, n), k_shards=local_shards
        )

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


def pack_codes(codes: jax.Array, bits: int,
               k_shards: int = 1) -> Tuple[jax.Array, ...]:
    """Pack unsigned `[K, N]` codes of `bits` width into planar planes.

    Odd widths decompose into 4/2/1-bit planes, listed most-significant
    first (parity trick: bestla_storage.h 3/5/6/7-bit split buffers).
    `k_shards > 1` packs K in independent slabs (see QTensor.k_shards).
    """
    if bits == 8:
        return (codes.astype(jnp.uint8),)
    if k_shards > 1:
        k = codes.shape[0]
        if k % k_shards:
            raise ValueError(f"K={k} not divisible by k_shards={k_shards}")
        parts = [
            pack_codes(codes[i * k // k_shards:(i + 1) * k // k_shards],
                       bits, 1)
            for i in range(k_shards)
        ]
        return tuple(
            jnp.concatenate([p[j] for p in parts], axis=0)
            for j in range(len(parts[0]))
        )
    planes = []
    widths = plane_widths(bits)
    shift = bits
    for w in widths:
        shift -= w
        part = (codes.astype(jnp.uint32) >> shift) & ((1 << w) - 1)
        planes.append(pack_plane(part, w))
    return tuple(planes)


def unpack_codes(planes: Tuple[jax.Array, ...], bits: int, k: int,
                 k_shards: int = 1) -> jax.Array:
    """Inverse of `pack_codes` -> unsigned `[K, N]` uint8 codes."""
    if bits == 8:
        return planes[0].astype(jnp.uint8)
    if k_shards > 1:
        outs = []
        for i in range(k_shards):
            sub = tuple(
                p[i * p.shape[0] // k_shards:(i + 1) * p.shape[0] // k_shards]
                for p in planes
            )
            outs.append(unpack_codes(sub, bits, k // k_shards, 1))
        return jnp.concatenate(outs, axis=0)
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
    if spec.lut is not None:
        # foreign code->value table carried by a converter (e.g. the
        # reference's F4_BNB/E2M1 trees) — value-exact ingest
        return np.asarray(spec.lut, np.float32)
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


def quantize(w: jax.Array, spec: QSpec, k_shards: int = 1) -> QTensor:
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
        data = pack_codes(codes, 4, k_shards)
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
        data = pack_codes(codes, spec.bits, k_shards)
    else:  # asymmetric INT
        wmin = jnp.min(wg, axis=1)
        wmax = jnp.max(wg, axis=1)
        maxcode = (1 << spec.bits) - 1
        scales = jnp.maximum((wmax - wmin) / maxcode, _EPS)
        zp = jnp.clip(jnp.round(-wmin / scales), 0, maxcode)  # [G, N] unsigned
        q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zp[:, None, :], 0, maxcode)
        codes = q.astype(jnp.uint8).reshape(k, n)
        zeros = zp.astype(jnp.uint8)
        data = pack_codes(codes, spec.bits, k_shards)

    sscale = None
    if spec.double_quant:
        smax = jnp.maximum(jnp.max(scales, axis=0, keepdims=True), _EPS)  # [1,N]
        sscale = smax / 127.0
        scales = jnp.clip(jnp.round(scales / sscale), 1, 127).astype(jnp.int8)
    elif spec.scale_dtype == "bfloat16":
        scales = scales.astype(jnp.bfloat16)
    return QTensor(data, scales, zeros, sscale, spec, (k, n), k_shards)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization back to `[K, N]` floats (reference path; the hot
    path fuses this into the matmul kernels in ops/matmul.py).

    Parity: bestla_prologue_b.h getWeight / kernel dequant paths.
    """
    qt = qt.local_view()
    spec = qt.spec
    k, n = qt.leaf_dims()
    g = spec.effective_group(qt.shape[0])
    scales = qt.effective_scales(jnp.float32)  # [G, N]
    sfull = jnp.repeat(scales, g, axis=0)  # [K, N]

    if spec.is_fp8:
        vals = qt.data[0].astype(jnp.float32)
    elif spec.is_lut:
        codes = unpack_codes(qt.data, 4, k, qt.k_shards)
        vals = decode_lut(codes, spec, jnp.float32)
    else:
        codes = unpack_codes(qt.data, spec.bits, k, qt.k_shards).astype(jnp.int32)
        if spec.bits == 1:
            vals = (2 * codes - 1).astype(jnp.float32)
        elif spec.symmetric and qt.zeros is None:
            vals = (codes - spec.code_offset).astype(jnp.float32)
        elif qt.zeros is not None and jnp.issubdtype(qt.zeros.dtype,
                                                     jnp.floating):
            # ggml Q4_1/Q5_1 convention: w = scale*code + m  (float offset
            # per group; convert/gguf.py)
            zfull = jnp.repeat(qt.zeros.astype(jnp.float32), g, axis=0)
            return (codes.astype(jnp.float32) * sfull + zfull).astype(dtype)
        else:
            zfull = jnp.repeat(qt.zeros.astype(jnp.int32), g, axis=0)
            vals = (codes - zfull).astype(jnp.float32)
    return (vals * sfull).astype(dtype)


def repack(qt: QTensor, k_shards: int) -> QTensor:
    """Losslessly re-pack a QTensor into `k_shards` K-slabs (for TP
    row-sharding).  Codes are unpacked and re-packed exactly; scales/zeros
    are untouched (their rows already split on group boundaries)."""
    if qt.k_shards == k_shards:
        return qt
    spec = qt.spec
    if spec.is_fp8 or (spec.qtype == QType.INT and spec.bits == 8):
        return dataclasses.replace(qt, k_shards=k_shards)
    k = qt.shape[0]
    g = spec.effective_group(k)
    if (k // k_shards) % g and spec.group_size != -1:
        raise ValueError(
            f"K shard {k}/{k_shards} breaks group boundary g={g}"
        )
    bits = 4 if spec.is_lut else spec.bits
    codes = unpack_codes(qt.data, bits, k, qt.k_shards)
    data = pack_codes(codes, bits, k_shards)
    return dataclasses.replace(qt, data=data, k_shards=k_shards)


def quantization_error(w: jax.Array, spec: QSpec) -> jax.Array:
    """RMS relative error of a round trip — used by tests and quant tuning."""
    qt = quantize(w, spec)
    wd = dequantize(qt)
    return jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.maximum(
        jnp.sqrt(jnp.mean(w**2)), _EPS
    )


def concat_n(qts) -> QTensor:
    """Concatenate QTensors along N (out features).

    Valid because planar packing is column-independent: plane words, scales
    and zeros all concatenate exactly.  Used for fused QKV / gate+up
    projections (parity: ip_fusion_qkv.cpp / MUL_FFN_* fused ops) — one
    kernel launch instead of three, identical math.
    """
    q0 = qts[0]
    for q in qts[1:]:
        if (q.spec != q0.spec or q.shape[0] != q0.shape[0]
                or q.k_shards != q0.k_shards
                or (q.zeros is None) != (q0.zeros is None)
                or (q.sscale is None) != (q0.sscale is None)):
            raise ValueError("incompatible QTensors for N-concat")
    data = tuple(
        jnp.concatenate([q.data[i] for q in qts], axis=1)
        for i in range(len(q0.data))
    )
    scales = jnp.concatenate([q.scales for q in qts], axis=1)
    zeros = (jnp.concatenate([q.zeros for q in qts], axis=1)
             if q0.zeros is not None else None)
    sscale = (jnp.concatenate([q.sscale for q in qts], axis=1)
              if q0.sscale is not None else None)
    n_total = sum(q.shape[1] for q in qts)
    return QTensor(data, scales, zeros, sscale, q0.spec,
                   (q0.shape[0], n_total), q0.k_shards)


def split_n(qt: QTensor, sections) -> Tuple[QTensor, ...]:
    """Split a QTensor along N (out features) into contiguous pieces of
    the given sizes — the exact inverse of `concat_n` (every component is
    `[*, N]`, so a column slice is a valid pack).  Used to unfuse the
    plain-concat `attn_qkv` tensors of falcon/mpt/bloom GGUF files
    (gguf falcon/mpt/bloom graphs view wqkv at contiguous offsets)."""
    if sum(sections) != qt.shape[1]:
        raise ValueError(f"sections {sections} != N={qt.shape[1]}")
    outs = []
    start = 0
    for n in sections:
        sl = slice(start, start + n)
        outs.append(dataclasses.replace(
            qt,
            data=tuple(d[..., sl] for d in qt.data),
            scales=qt.scales[..., sl],
            zeros=None if qt.zeros is None else qt.zeros[..., sl],
            sscale=None if qt.sscale is None else qt.sscale[..., sl],
            shape=(qt.shape[0], n),
        ))
        start += n
    return tuple(outs)


def repad_k(qt: QTensor, multiple: int) -> QTensor:
    """Re-pack with K padded up to `multiple` (lossless: padded code rows
    carry zero scales, so they dequantize to exactly 0).

    Load-time transform so every weight shape hits the fused kernel's
    group-dot fast path (a K that is not bands x group, e.g. llama's 11008
    FFN-down with g=128 int4, would otherwise straddle a pack-band
    boundary).  `qmatmul` zero-pads the activations to match.
    """
    k, n = qt.shape
    spec = qt.spec
    g = spec.effective_group(k)
    if (k % multiple == 0 or qt.k_shards != 1 or spec.is_fp8
            or k % g != 0):
        return qt
    k_pad = -(-k // multiple) * multiple
    bits = 4 if spec.is_lut else spec.bits
    codes = unpack_codes(qt.data, bits, k)
    codes = jnp.pad(codes, ((0, k_pad - k), (0, 0)))
    data = pack_codes(codes, bits)
    extra_g = k_pad // g - qt.scales.shape[0]
    scales = jnp.pad(qt.scales, ((0, extra_g), (0, 0)))
    zeros = (jnp.pad(qt.zeros, ((0, extra_g), (0, 0)))
             if qt.zeros is not None else None)
    return QTensor(data, scales, zeros, qt.sscale, spec, (k_pad, n), 1)


def repad_n(qt: QTensor, multiple: int) -> QTensor:
    """Re-pack with N padded up to `multiple` (lossless: padded columns
    carry zero scales and dequantize to exactly 0; the caller slices the
    matmul output back to the true N).

    Load-time transform for wide projections whose N is not a multiple
    of the kernel's widest lane block — llama's 32000-vocab LM head gets
    bn=256 instead of 512 (narrow DMAs: measured 572 GB/s at decode vs
    632-684 on the 512-block shapes, BENCH_NOTES 2026-08-19)."""
    k, n = qt.shape
    if n % multiple == 0:
        return qt
    pad = -(-n // multiple) * multiple - n

    def pad_cols(a):
        return jnp.pad(a, ((0, 0), (0, pad)))

    data = tuple(pad_cols(d) for d in qt.data)
    scales = pad_cols(qt.scales)
    zeros = pad_cols(qt.zeros) if qt.zeros is not None else None
    sscale = pad_cols(qt.sscale) if qt.sscale is not None else None
    return QTensor(data, scales, zeros, sscale, qt.spec, (k, n + pad),
                   qt.k_shards)


def quantize_tree(params, policy) -> dict:
    """Quantize fp 'w' leaves of a params pytree per a path policy.

    `policy(path) -> Optional[QSpec]` with paths like "layers.3.ffn.down"
    or "lm_head" — the layer-wise quant-config mechanism of the reference
    (quant_config.h:180-214 per-layer policy classes + `--config` file).
    None keeps the leaf in floating point.
    """
    import jax.numpy as _jnp

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for key, val in node.items():
                sub = f"{path}.{key}" if path else key
                if key == "w" and not isinstance(val, QTensor) and hasattr(
                        val, "ndim") and val.ndim == 2:
                    spec = policy(path)
                    if spec is not None:
                        k = val.shape[0]
                        g = spec.effective_group(k)
                        if k % g == 0:
                            out[key] = quantize(
                                _jnp.asarray(val, _jnp.float32), spec)
                            continue
                    out[key] = val
                else:
                    out[key] = walk(val, sub)
            return out
        if isinstance(node, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")


def widen_bits(qt: QTensor) -> QTensor:
    """Re-pack odd bit widths (3/5/6/7) into the next kernel-native width
    (4 or 8 bits) at load time: codes are unchanged integers, so the
    mapping is exact; storage grows (3b->4b: +33%) but the fused Pallas
    kernel applies instead of the slow XLA dequant fallback.  The
    storage-side multi-plane format (bestla_storage.h 3/5/6/7-bit split
    buffers parity) remains the on-disk representation."""
    spec = qt.spec
    if spec.qtype != QType.INT or spec.bits in (1, 2, 4, 8):
        return qt
    target = 4 if spec.bits < 4 else 8
    k, n = qt.shape
    codes = unpack_codes(qt.data, spec.bits, k, qt.k_shards)
    data = pack_codes(codes, target, qt.k_shards)
    new_spec = dataclasses.replace(spec, bits=target)
    zeros = qt.zeros
    if spec.symmetric:
        # symmetric codes carry the ORIGINAL offset 2^(bits-1); under the
        # wider width express it as an explicit (asymmetric) zero point so
        # dequant stays exact: (codes - 2^(bits-1)) * scale
        g = spec.effective_group(k)
        zeros = jnp.full((max(k // g, 1), n), 1 << (spec.bits - 1),
                         jnp.uint8)
        new_spec = dataclasses.replace(new_spec, symmetric=False)
    return QTensor(data, qt.scales, zeros, qt.sscale, new_spec, qt.shape,
                   qt.k_shards)
