"""Fused dequant x GEMM / GEMV — the hot kernels.

Parity targets (reference):
  * bestla_wrapper.h:263-906  LauncherBase/LauncherIntKBlock — tiled GEMM with
    per-group dequant inside the K loop (comp_fp32 / comp_bf16 / comp_int8).
  * bestla_wrapper.h:344-402  GEMV fast path for decode (m <= 4).
  * bestla_gemm.h KBlock cores — dequantize per group in registers.

TPU-native design:
  * `qmatmul` dispatches between a pure-XLA path (dequantize -> jnp.dot,
    letting XLA fuse; always correct, used on CPU/testing) and Pallas
    kernels that read the *packed* planes from HBM and dequantize in VMEM
    right before feeding the MXU — so HBM traffic stays at the quantized
    footprint (the whole perf story of weight-only quant at decode, which
    is HBM-bandwidth bound).
  * Planar packing (ops/quantize.py) means unpacking a block is
    `concat_i((w >> s_i) & m)` along sublanes — natural K order, no shuffle.
  * Compute dtypes: bf16 (MXU native) and f32; int8 dynamic-activation-quant
    compute (comp_int8 analogue) is provided via `qmatmul_int8`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtypes import QSpec, QType, plane_widths
from .quantize import QTensor, decode_lut, dequantize, unpack_plane

# prefill M-block sweep knob, resolved once at import (env reads inside
# traced code no-op after the first trace); 0 = default policy
import os as _os

GEMM_BM_OVERRIDE = int(_os.environ.get("NST_GEMM_BM", "0"))


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def qmatmul_xla(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    """Dequantize-then-matmul; XLA fuses what it can.  Correctness baseline
    and CPU fallback.  x: [..., K]  ->  [..., N]."""
    out_dtype = out_dtype or x.dtype
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    w = dequantize(qt, cdt)
    return jnp.matmul(x.astype(cdt), w, preferred_element_type=jnp.float32).astype(
        out_dtype
    )


# ---------------------------------------------------------------------------
# Pallas fused dequant-GEMM
# ---------------------------------------------------------------------------
#
# Grid: (M/BM, N/BN).  The full K extent of the packed plane rides along in
# the block (packed K is K/8 words for int4, so a 4096x(BN=256) int4 slab is
# 4096*256/2 = 512KB — fits VMEM comfortably); K is processed in sub-band
# order i (planar layout), each sub-band dequantized then MXU-dotted.


def _unpack_band(word_blk, width: int, band: int):
    """Extract sub-band `band` codes from packed words: [KW, BN] -> [KW, BN]."""
    mask = jnp.uint32((1 << width) - 1)
    return (word_blk >> (width * band)) & mask


def _int_codes_to_vals(codes_i32, spec: QSpec, zeros_blk, cdt):
    if spec.bits == 1:
        return (2 * codes_i32 - 1).astype(cdt)
    if spec.symmetric:
        return (codes_i32 - spec.code_offset).astype(cdt)
    return (codes_i32 - zeros_blk.astype(jnp.int32)).astype(cdt)


def _x_chunk(x_ref, band: int, kw: int, size: int, kb, n_kb: int,
             sub_off: int = 0, blk: int = None):
    """[BM, size] lane slice of x for sub-band `band`, K block `kb`, plus a
    static sub-offset within the block.  Static when there is a single K
    block; otherwise the launcher guarantees 128-lane alignment of every
    offset."""
    if n_kb == 1:
        k0 = band * kw + sub_off
        return x_ref[:, k0:k0 + size]
    k0 = pl.multiple_of(band * kw + kb * (blk or size) + sub_off, 128)
    return x_ref[:, pl.ds(k0, size)]


def _band_scales(s_all, band: int, gb: int, bkw: int, g: int, k: int, cdt):
    """Scale rows for sub-band `band` of the current K block, broadcast
    per-row: -> [bkw, BN].  `s_all` is the kernel's [e*gb, BN] view of the
    pre-permuted per-block scale rows (all indices static — Mosaic needs
    statically aligned sublane slices)."""
    if jnp.issubdtype(s_all.dtype, jnp.unsignedinteger):
        # uint8 zero-points: Mosaic has no unsigned -> float cast
        s_all = s_all.astype(jnp.int32)
    if g >= k:
        sblk = s_all[:1, :]
        return jnp.broadcast_to(sblk, (bkw, sblk.shape[-1])).astype(cdt)
    sblk = s_all[band * gb:(band + 1) * gb, :]
    # broadcast scales over group rows: [GB, BN] -> [BKW, BN]
    # (explicit broadcast+reshape — Mosaic-friendly, unlike repeat)
    return jnp.broadcast_to(
        sblk[:, None, :], (gb, g, sblk.shape[-1])
    ).reshape(bkw, sblk.shape[-1]).astype(cdt)


def _squeeze_lead(ref):
    """Block value squeezed to its last two dims: grouped-MoE variants of
    the kernels carry leading expert/K-block dims of size 1 (ops/moe.py);
    the plain launcher passes 2-D (weights) / 3-D (scales) blocks."""
    arr = ref[...]
    return arr.reshape(arr.shape[-2], arr.shape[-1])


def _gemm_kernel_int(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                     spec: QSpec, k: int, g: int, cdt, n_kb: int):
    """Fused dequant-GEMM kernel for single-plane INT widths (4/2/1/8-bit
    native) — multi-plane odd widths go through the XLA path for now.

    Grid (M/BM, N/BN, n_kb): the packed plane is streamed in word-row
    blocks along the third ("arbitrary") dimension so DMA overlaps compute
    (double-buffered by the pipeline), with a f32 accumulator in VMEM —
    the TPU analogue of the reference's cache-blocked K loop with
    in-register dequant (bestla_gemm.h KBlock cores).

    x_ref: [BM, K] activations, resident across K blocks (the launcher
           only K-grids when offsets are 128-lane aligned)
    w_ref: [BKW, BN] packed word block (uint32), or int8 rows (bits==8)
           (leading size-1 expert dim allowed — grouped MoE)
    s_ref: [1, e*gb, BN] per-block scale rows (pre-permuted by the launcher)
    z_ref: [1, e*gb, BN] zeros (uint8) or None
    o_ref: [BM, BN] f32 out (written on the last K block)
    acc_ref: [BM, BN] f32 VMEM scratch
    """
    width = spec.bits
    if width == 8:
        e, kw = 1, k
    else:
        e = 32 // width
        kw = k // e
    w_blk = _squeeze_lead(w_ref)
    bkw = w_blk.shape[0]
    gb = bkw // g if g < k else 1
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_all = _squeeze_lead(s_ref)
    # uint8 zero-points via int32 (Mosaic has no unsigned -> float cast)
    z_all = (_squeeze_lead(z_ref).astype(jnp.int32)
             if z_ref is not None else None)
    acc = jnp.zeros_like(acc_ref)
    group_dot = (g >= 128 and g < k and width != 1
                 and (n_kb == 1 or g % 128 == 0))
    for band in range(e):
        if width == 8:
            codes = w_blk.astype(jnp.int32)
        else:
            codes = _unpack_band(w_blk, width, band).astype(jnp.int32)
        if group_dot:
            # comp-int style: dot RAW codes per group, rescale the [BM, BN]
            # partial AFTER the dot — the scale multiply moves from
            # per-element (KxN VPU work, the dequant bottleneck) to
            # per-output, with the offset/zero-point handled by an
            # activation row-sum correction (bestla_epilogue.h:278-311).
            vals = codes.astype(cdt)
            for gg in range(gb):
                wsub = vals[gg * g:(gg + 1) * g]
                xb = _x_chunk(x_ref, band, kw, g, kb, n_kb, sub_off=gg * g,
                              blk=bkw)
                d = jnp.dot(xb.astype(cdt), wsub,
                            preferred_element_type=jnp.float32)
                srow = s_all[band * gb + gg][None, :].astype(jnp.float32)
                xsum = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
                if z_all is not None:
                    zrow = z_all[band * gb + gg][None, :].astype(jnp.float32)
                    acc = acc + (d - xsum * zrow) * srow
                else:
                    acc = acc + (d - xsum * spec.code_offset) * srow
            continue
        # elementwise dequant path (fine groups / 1-bit / single group):
        # unpack -> subtract offset -> per-element scale -> one band dot
        sfull = _band_scales(s_all, band, gb, bkw, g, k, cdt)
        if z_all is not None:
            zfull = _band_scales(z_all, band, gb, bkw, g, k, jnp.float32)
            vals = (codes.astype(jnp.float32) - zfull).astype(cdt)
        else:
            vals = _int_codes_to_vals(codes, spec, 0, cdt)
        xb = _x_chunk(x_ref, band, kw, bkw, kb, n_kb)
        acc = acc + jnp.dot(xb.astype(cdt), vals * sfull,
                            preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(kb == n_kb - 1)
    def _store():
        # cast at store (VMEM, overlapped): writing out_dtype directly
        # saves the f32 materialize + separate convert pass over [M, N]
        # in HBM that XLA otherwise runs after the custom-call (~11 ms
        # of a 288 ms 7B prefill, 2026-08-19 per-op profile)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _gemm_kernel_lut(x_ref, w_ref, s_ref, o_ref, acc_ref, *, spec: QSpec,
                     k: int, g: int, cdt, n_kb: int):
    """Fused dequant-GEMM for NF4/FP4 (4-bit LUT); same K-grid structure
    as _gemm_kernel_int."""
    e = 8
    kw = k // e
    w_blk = _squeeze_lead(w_ref)
    bkw = w_blk.shape[0]
    gb = bkw // g if g < k else 1
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_all = _squeeze_lead(s_ref)
    acc = jnp.zeros_like(acc_ref)
    for band in range(e):
        codes = _unpack_band(w_blk, 4, band).astype(jnp.int32)
        vals = decode_lut(codes, spec, cdt)
        sfull = _band_scales(s_all, band, gb, bkw, g, k, cdt)
        xb = _x_chunk(x_ref, band, kw, bkw, kb, n_kb).astype(cdt)
        acc = acc + jnp.dot(xb, vals * sfull,
                            preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(kb == n_kb - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _bands(spec: QSpec) -> int:
    return 1 if spec.bits == 8 and not spec.is_lut else (
        32 // (4 if spec.is_lut else spec.bits)
    )


def _kernel_group(qt: QTensor) -> int:
    """Group size usable inside the kernel: each sub-band covers K/e
    contiguous rows and the kernel broadcasts scale rows per band, so it
    needs g | K/e.  When the logical group straddles a band boundary
    (e.g. K=11008, e=8, g=128 -> kw=1376), subdivide to gcd(g, kw): the
    launcher repeats the scale rows to the finer granularity (cheap —
    scales are ~1/g of the weight bytes)."""
    import math

    k = qt.shape[0]
    g = qt.spec.effective_group(k)
    if g >= k:
        return g
    kw = k // _bands(qt.spec)
    if g <= kw and kw % g == 0:
        return g
    return math.gcd(g, kw)


def _pallas_supported(qt: QTensor) -> bool:
    spec = qt.spec
    if qt.k_shards != 1:
        return False  # multi-slab packs go through the XLA path
    if qt.zeros is not None and jnp.issubdtype(qt.zeros.dtype, jnp.floating):
        return False  # ggml float-offset formats -> planar kernel
    if spec.is_fp8:
        return False  # -> planar kernel
    if not (spec.is_lut or spec.bits in (1, 2, 4, 8)):
        return False  # odd widths -> planar kernel
    # subdivided group must stay coarse enough that the repeated scale
    # tensor remains a small fraction of the weight bytes
    return _kernel_group(qt) >= 32


def _int_planes(bits: int):
    """(width, shift) per packed plane, MSB-first (matches pack_codes)."""
    widths = plane_widths(bits)
    shifts, s = [], bits
    for w in widths:
        s -= w
        shifts.append(s)
    return list(zip(widths, shifts))


def kernel_k_multiple(spec: QSpec) -> int:
    """K must be a multiple of this x group for a fused kernel (the widest
    plane's pack period; parity note: the reference's analogous constraint
    is KPad alignment in bestla_prologue_b.h reorderWeight)."""
    if spec.is_fp8 or (spec.qtype == QType.INT and spec.bits == 8):
        return 1
    if spec.is_lut:
        return 8
    return max(32 // w for w in plane_widths(spec.bits))


def _planar_supported(qt: QTensor) -> bool:
    """Formats served by the monolithic-K planar kernel: odd INT widths
    (3/5/6/7 multi-plane), FP8, and ggml float-offset (Q4_1/Q5_1-style)
    packs.  Requires group-dot eligibility on every plane (g | K/e_p and
    g >= 128, or a single group) — awkward shapes fall back to XLA.

    Parity: bestla_gemm.h:2771-4330 KBlock cores cover every width
    natively; kernel_jit.h:253 DecompressS3."""
    spec = qt.spec
    if qt.k_shards != 1:
        return False
    if spec.is_lut or (spec.qtype == QType.INT and spec.bits == 1):
        return False  # LUT/1-bit live in their dedicated kernels
    float_zero = qt.zeros is not None and jnp.issubdtype(
        qt.zeros.dtype, jnp.floating)
    odd = spec.qtype == QType.INT and spec.bits not in (1, 2, 4, 8)
    if not (spec.is_fp8 or odd or float_zero):
        return False  # single-plane formats already have the main kernel
    k = qt.shape[0]
    g = spec.effective_group(k)
    if k % g:
        return False
    if g >= k:
        return True
    if g < 128:
        return False
    if spec.is_fp8:
        return True

    return all(_plane_band_ok(w, k, g) for w in plane_widths(spec.bits))


def _plane_band_ok(width: int, k: int, g: int) -> bool:
    """Groups align with a plane's bands either way: whole groups per
    band, or whole bands per group (corrections accumulate across bands
    because dequant is linear in the plane codes).  Shared by the fp and
    int8 planar eligibility gates."""
    kw = k // (32 // width)
    return kw % g == 0 or (kw != 0 and g % kw == 0)


def _fp8_decode(w_blk, spec: QSpec):
    """Exact fp8 -> f32 via integer bit-remap (Mosaic's native fp8 cast
    lowering measured 13x slower than the int planes on v5e).

    Normals: rebuild the f32 bit pattern with the exponent re-biased in
    the INTEGER domain (e4m3 bias 7 -> f32 bias 127: e+120; e5m2: e+112)
    and the mantissa top-aligned — one 32-bit bitcast, no subnormal
    intermediates (a float-side 2^k bias fix gets FTZ'ed on the VPU).
    Subnormals (e==0): value = m * 2^(1-bias-mbits), computed directly
    from the integer mantissa.  fp8 NaN/inf map to finite values, which
    the weight quantizer never emits."""
    if spec.qtype == QType.FP8_E4M3:
        mbits, ebias = 3, 7
    else:
        mbits, ebias = 2, 15
    b = jax.lax.bitcast_convert_type(w_blk, jnp.uint8).astype(jnp.int32)
    sign = b >> 7
    e = (b >> mbits) & ((1 << (7 - mbits)) - 1)
    m = b & ((1 << mbits) - 1)
    bits = (sign << 31) | ((e + (127 - ebias)) << 23) | (m << (23 - mbits))
    norm = jax.lax.bitcast_convert_type(bits, jnp.float32)
    sub = m.astype(jnp.float32) * float(2.0 ** (1 - ebias - mbits))
    sub = jnp.where(sign == 1, -sub, sub)
    return jnp.where(e == 0, sub, norm)


def _gemm_kernel_planar(x_ref, w_refs, s_ref, z_ref, o_ref, *, spec: QSpec,
                        k: int, g: int, cdt, zmode: str):
    """Monolithic-K fused dequant-GEMM over multi-plane packs.

    Per-plane scaled group dots: since dequant is linear in the plane
    codes, each plane p contributes 2^shift_p * (x_g @ codes_pg) * s_g and
    the zero-point/offset correction is applied once (first plane) via the
    activation row-sum (bestla_epilogue.h:278-311 analogue).  Float-offset
    (ggml Q4_1/Q5_1: w = s*code + m) flips the correction sign and drops
    the scale factor on it.

    x_ref  : [BM, K]
    w_refs : one packed plane each — uint32 planar words (or fp8/int8 rows)
    s_ref  : [G, BN] scale rows in natural K-group order (f32)
    z_ref  : [G, BN] zeros (uint8 int-zp or f32 offsets) or None
    o_ref  : [BM, BN] f32 out
    """
    s_all = s_ref[...]
    z_all = z_ref[...] if z_ref is not None else None
    bm = x_ref.shape[0]
    bn = o_ref.shape[1]
    acc = jnp.zeros((bm, bn), jnp.float32)
    if spec.is_fp8:
        planes = [(w_refs[0], 8, 0)]
    else:
        planes = [(r, w, s) for r, (w, s) in zip(w_refs, _int_planes(spec.bits))]
    first = True
    for w_ref, width, shift in planes:
        w_blk = w_ref[...]
        if spec.is_fp8 or width == 8:
            e, kw = 1, k
        else:
            e = 32 // width
            kw = k // e
        g_eff = min(g, kw)
        n_sub = kw // g_eff
        for band in range(e):
            if spec.is_fp8:
                codes = _fp8_decode(w_blk, spec).astype(cdt)
            elif width == 8:
                # uint8 rows via int32: Mosaic has no uint -> float cast
                codes = w_blk.astype(jnp.int32).astype(cdt)
            else:
                # via int32: Mosaic has no uint32 -> float cast
                codes = _unpack_band(w_blk, width, band).astype(
                    jnp.int32).astype(cdt)
            for gg in range(n_sub):
                grow = (band * kw + gg * g_eff) // g if g < k else 0
                wsub = codes[gg * g_eff:(gg + 1) * g_eff]
                k0 = band * kw + gg * g_eff
                xb = x_ref[:, k0:k0 + g_eff]
                d = jnp.dot(xb.astype(cdt), wsub,
                            preferred_element_type=jnp.float32)
                srow = s_all[grow][None, :].astype(jnp.float32)
                acc = acc + d * (srow * float(1 << shift))
                if first and zmode != "none":
                    xsum = jnp.sum(xb.astype(jnp.float32), axis=1,
                                   keepdims=True)
                    if zmode == "sym":
                        acc = acc - xsum * (spec.code_offset * srow)
                    elif zmode == "int":
                        zrow = z_all[grow][None, :].astype(
                            jnp.int32).astype(jnp.float32)
                        acc = acc - xsum * (zrow * srow)
                    else:  # float offset: w = s*code + m
                        mrow = z_all[grow][None, :].astype(jnp.float32)
                        acc = acc + xsum * mrow
        first = False
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _qmatmul_planar_2d(x: jax.Array, qt: QTensor, out_dtype=None,
                       interpret: bool = False) -> jax.Array:
    """x: [M, K] -> [M, N] via the planar multi-format kernel."""
    spec = qt.spec
    k, n = qt.shape
    m = x.shape[0]
    out_dtype = out_dtype or x.dtype
    cdt = _compute_dtype(x.dtype, m)
    g = spec.effective_group(k)
    bm = _choose_bm(m, k)
    if _gemv_mono(m):
        col_bytes = sum(wp.shape[0] * wp.dtype.itemsize for wp in qt.data)
        bn = _gemv_bn(n, col_bytes)
    else:
        bn = _choose_bn(n)
    grid = (m // bm, n // bn)

    scales = qt.effective_scales(jnp.float32)
    zeros = qt.zeros
    if zeros is None:
        zmode = "none" if spec.is_fp8 else "sym"
    elif jnp.issubdtype(zeros.dtype, jnp.floating):
        zmode = "float"
        zeros = zeros.astype(jnp.float32)
    else:
        zmode = "int"

    x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec((wp.shape[0], bn), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM) for wp in qt.data]
    gr = scales.shape[0]
    s_spec = pl.BlockSpec((gr, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    bits_eff = 8 if spec.is_fp8 else spec.bits
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(m * k * (4 if cdt == jnp.float32 else 2)
                        + k * n * bits_eff // 8 + m * n * 4),
        transcendentals=0,
    )
    n_planes = len(qt.data)

    if zmode in ("int", "float"):
        def kern(x_ref, *refs):
            _gemm_kernel_planar(x_ref, refs[:n_planes], refs[n_planes],
                                refs[n_planes + 1], refs[n_planes + 2],
                                spec=spec, k=k, g=g, cdt=cdt, zmode=zmode)
        in_specs = [x_spec, *w_specs, s_spec, s_spec]
        args = (x.astype(cdt), *qt.data, scales, zeros)
    else:
        def kern(x_ref, *refs):  # noqa: F811
            _gemm_kernel_planar(x_ref, refs[:n_planes], refs[n_planes],
                                None, refs[n_planes + 1],
                                spec=spec, k=k, g=g, cdt=cdt, zmode=zmode)
        in_specs = [x_spec, *w_specs, s_spec]
        args = (x.astype(cdt), *qt.data, scales)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out


def _compute_dtype(x_dtype, m: int):
    """In-kernel compute dtype.  Decode/GEMV (m <= 32) always computes in
    f32 even for bf16 activations: the kernel is HBM-bandwidth bound there
    and the int32 -> bf16 code cast + bf16 vreg repack is pure VPU overhead
    — measured 473-567 GB/s (bf16) vs 561-684 GB/s (f32) across the 7B
    decode shapes (BENCH_NOTES 2026-08-19 per-shape sweep).  Prefill keeps
    bf16 (MXU throughput dominates at large M)."""
    if m <= 32:
        return jnp.float32
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _choose_bn(n: int) -> int:
    """512-lane N blocks (measured best on v5e; NST_GEMV_BN_MAX caps the
    first choice for on-chip sweeps of finer pipelines)."""
    import os

    cap = int(os.environ.get("NST_GEMV_BN_MAX", "512"))
    for bn in (512, 256, 128):
        if bn <= cap and n % bn == 0:
            return bn
    return n


def _gemv_bn(n: int, col_bytes: int) -> int:
    """OPT-IN large-N-block GEMV variant (NST_GEMV_BN_BYTES=<cap>): pick
    the largest bn dividing N, 128-lane aligned, with the packed block
    under the cap.  Measured SLOWER end-to-end on v5e and left OFF by
    default: bench.py B=1 decode 143.5 tok/s at a 12MB cap vs 149.8 with
    the default 512-lane blocks (2026-08-19 A/B) — the deep fine-grained
    pipeline beats fewer/larger DMAs, i.e. per-grid-program overhead is
    NOT the GEMV limiter (the round-2 per-shape correlation was a shape
    effect, not a program-count effect).  Kept for sweeps on other chip
    generations."""
    import os

    cap = int(os.environ.get("NST_GEMV_BN_BYTES", "0"))
    if cap <= 0:
        return _choose_bn(n)
    for progs in range(1, n // 128 + 1):
        if n % progs:
            continue
        bn = n // progs
        if bn % 128 == 0 and bn * col_bytes <= cap:
            return bn
    return _choose_bn(n)


def _choose_bm(m: int, k: int) -> int:
    """M block for prefill GEMMs.  Every (m-block, n-block) grid cell
    re-streams its weight block, so the whole weight is read M/bm times
    — at 7B prefill M=2048, bm=512 (vs the old 256) halves that
    re-streaming: 329.8 -> 288.9 ms prefill@1975 on-chip (round 4),
    decode unchanged.  The x block stays <= ~12MB of VMEM (512 rows at
    the 7B down-proj K=11264 = 11.5MB, compiled + measured fine on
    v5e).  NST_GEMM_BM (import-time sweep knob) overrides."""
    if GEMM_BM_OVERRIDE:
        ceil_ = GEMM_BM_OVERRIDE  # explicit sweep value: trust the caller
    else:
        # ceiling 1024 (was 512, round 5): at K<=6144 the [bm, K] bf16 x
        # block stays <=12MB, and every halving of M/bm halves how many
        # times the whole weight re-streams — qkv/o/gate-up at 7B
        # prefill M=2048 drop from 4 weight reads to 2 (the down-proj
        # K=11264 still lands at 512 via the VMEM formula)
        ceil_ = min(max(8, (12 * 1024 * 1024) // (k * 2)), 1024)
    if m <= ceil_:
        return m
    for bm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if bm <= ceil_ and m % bm == 0:
            return bm
    return min(m, 8)


def _gemv_mono(m: int) -> bool:
    """True when the monolithic-K GEMV/decode regime applies at this M."""
    import os

    return 0 < m <= 32 and os.environ.get("NST_GEMV_MONO", "1") != "0"


def _choose_bkw(kw: int, g_rows: int, bn: int, m: int = 0) -> int:
    """Word-row block for the K grid: a divisor of kw, multiple of the
    scale-group row count, sized so a [bkw, bn] uint32 block is ~256KB
    (deep enough pipeline without tiny DMAs).

    GEMV/decode (m <= 32): monolithic K — measured 759 vs 578 GB/s
    effective at m=1 (93% vs 71% of v5e HBM peak): with only one sublane
    of x, per-grid-program overhead (~0.3 us) dominates the K-grid's DMA
    pipelining benefit (BENCH_NOTES.md kernel-lab sweep)."""
    import os

    target_bytes = int(os.environ.get("NST_BKW_TARGET", str(512 * 1024)))
    if target_bytes <= 0 or _gemv_mono(m):
        return kw  # monolithic K
    target = max(1, target_bytes // (bn * 4))
    if kw % 128:
        return kw  # monolithic: static slices need no lane alignment
    unit = g_rows if g_rows and kw % g_rows == 0 else 1
    m = kw // unit
    best = m  # fall back to monolithic
    for d in range(1, m + 1):
        # 128-lane alignment: the kernel slices x at multiples of bkw
        if m % d == 0 and d * unit <= target and (d * unit) % 128 == 0:
            best = d
    return best * unit


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _qmatmul_pallas_2d(x: jax.Array, qt: QTensor, out_dtype=None,
                       interpret: bool = False) -> jax.Array:
    """x: [M, K] -> [M, N] via fused Pallas kernel."""
    spec = qt.spec
    k, n = qt.shape
    m = x.shape[0]
    out_dtype = out_dtype or x.dtype
    cdt = _compute_dtype(x.dtype, m)
    g = spec.effective_group(k)
    bm = _choose_bm(m, k)
    wq = qt.data[0]
    if _gemv_mono(m):
        bn = _gemv_bn(n, wq.shape[0] * wq.dtype.itemsize)
    else:
        bn = _choose_bn(n)
    # keep the STORED scale dtype (kernels cast rows on the fly): a
    # pre-cast here re-ran an [K/g, N] convert inside the decode loop
    # every step; double-quant still decodes to f32 once per call
    scales = qt.effective_scales(
        qt.scales.dtype if qt.sscale is None else jnp.float32)
    zeros = qt.zeros
    g_eff = _kernel_group(qt)
    if g_eff != g:
        rep = g // g_eff
        scales = jnp.repeat(scales, rep, axis=0)
        if zeros is not None:
            zeros = jnp.repeat(zeros, rep, axis=0)
        g = g_eff
    kw_words = wq.shape[0]
    bkw = _choose_bkw(kw_words, g if g < k else 0, bn, m=m)
    n_kb = kw_words // bkw
    grid = (m // bm, n // bn, n_kb)
    e = _bands(spec)
    xt = x.astype(cdt)  # [M, K]

    # permute scale/zero rows into per-K-block layout [n_kb, e*gb, N]:
    # block kb, sub-band b needs scale rows [(b*kw + kb*bkw)//g : +gb] —
    # a pure permutation of the rows, done once per call so every kernel
    # slice is static (Mosaic requires aligned sublane indexing).
    # Monolithic K (n_kb==1, the decode path): the permutation is the
    # identity and the leading block dim is 1 — pass the stored [G, N]
    # rows STRAIGHT through as a 2-D block (the reshape/broadcast below,
    # re-run inside the decode while-loop, profiled ~0.4 ms/step at 7B).
    flat_scales = False
    if n_kb == 1 and g < k:
        gb = bkw // g
        flat_scales = True
    elif g < k:
        gb = bkw // g
        # per-band K rows == kw_words for every single-plane width
        idx = np.asarray(
            [(band * kw_words + kb_i * bkw) // g + t
             for kb_i in range(n_kb) for band in range(e)
             for t in range(gb)], np.int32)
        if not np.array_equal(idx, np.arange(idx.size, dtype=np.int32)):
            scales = jnp.take(scales, idx, axis=0)
            if zeros is not None:
                zeros = jnp.take(zeros, idx, axis=0)
        scales = scales.reshape(n_kb, e * gb, n)
        if zeros is not None:
            zeros = zeros.reshape(n_kb, e * gb, n)
    elif n_kb == 1:
        gb = 1
        flat_scales = True
    else:
        gb = 1
        scales = jnp.broadcast_to(scales[None], (n_kb, 1, n))
        if zeros is not None:
            zeros = jnp.broadcast_to(zeros[None], (n_kb, 1, n))

    x_spec = pl.BlockSpec((bm, k), lambda i, j, kb: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bkw, bn), lambda i, j, kb: (kb, j),
                          memory_space=pltpu.VMEM)
    if flat_scales:
        s_spec = pl.BlockSpec((e * gb, bn), lambda i, j, kb: (0, j),
                              memory_space=pltpu.VMEM)
    else:
        s_spec = pl.BlockSpec((1, e * gb, bn), lambda i, j, kb: (kb, 0, j),
                              memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )

    nbytes = 4 if cdt == jnp.float32 else 2
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * nbytes + wq.size * wq.dtype.itemsize + m * n * 4,
        transcendentals=0,
    )

    if spec.is_lut:
        kern = functools.partial(_gemm_kernel_lut, spec=spec, k=k, g=g,
                                 cdt=cdt, n_kb=n_kb)
        in_specs = [x_spec, w_spec, s_spec]
        args = (xt, wq, scales)
    elif zeros is not None:
        z_spec = s_spec
        kern = functools.partial(_gemm_kernel_int, spec=spec, k=k, g=g,
                                 cdt=cdt, n_kb=n_kb)
        in_specs = [x_spec, w_spec, s_spec, z_spec]
        args = (xt, wq, scales, zeros)
    else:
        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            _gemm_kernel_int(x_ref, w_ref, s_ref, None, o_ref, acc_ref,
                             spec=spec, k=k, g=g, cdt=cdt, n_kb=n_kb)
        in_specs = [x_spec, w_spec, s_spec]
        args = (xt, wq, scales)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=scratch,
        compiler_params=cparams,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def qmatmul(x: jax.Array, qt: QTensor, out_dtype=None,
            force_xla: bool = False, interpret: bool = False) -> jax.Array:
    """Quantized matmul  x @ dequant(qt):  [..., K] -> [..., N].

    Dispatch mirrors the reference's runtime core selection
    (core/layers/inner_product.cpp:28-150): packed-weight spec + backend
    decide the kernel; unsupported combos fall back to the XLA path.
    `interpret=True` forces the Pallas kernel in interpreter mode (tests).
    """
    qt = qt.local_view()  # fix static dims when called inside shard_map
    if x.shape[-1] != qt.shape[0]:
        # K-padded pack (quantize.repad_k): zero-pad the activations —
        # the padded weight rows dequantize to exactly 0
        pad = qt.shape[0] - x.shape[-1]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    backend_ok = interpret or _use_pallas()
    if backend_ok and not force_xla and _pallas_supported(qt):
        launcher = _qmatmul_pallas_2d
    elif backend_ok and not force_xla and _planar_supported(qt):
        launcher = _qmatmul_planar_2d
    else:
        return qmatmul_xla(x, qt, out_dtype)
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, x.shape[-1])
    mp = m if m <= 256 else -(-m // 256) * 256
    if mp != m:  # keep the M block bounded (VMEM) for odd prefill lengths
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    out = launcher(x2, qt, out_dtype=out_dtype or x.dtype,
                   interpret=interpret)
    if mp != m:
        out = out[:m]
    return out.reshape(*lead, qt.shape[1])


def _act_quant(xf: jax.Array, g: int):
    """Per-token, per-group sym int8 activation quant (parity:
    bestla_prologue_a.h ActivationKBlockQuantize).  [M, K] f32 ->
    (int8 [M, K], f32 scales [M, K/g]).  g >= K -> one scale per token
    (per-row dynamic quant; cheaper rescale, slightly coarser)."""
    m, k = xf.shape
    g = min(g, k)
    xg = xf.reshape(m, k // g, g)
    amax = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1), 1e-8)  # [M, G]
    ascale = amax / 127.0
    xq = jnp.clip(jnp.round(xg / ascale[..., None]), -127, 127).astype(
        jnp.int8).reshape(m, k)
    return xq, ascale


def _int8_kernel(xq_ref, a_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 spec: QSpec, k: int, g: int, n_kb: int,
                 per_token: bool = False):
    """comp_int8 GEMM: int8 activations x int-coded weights on the MXU
    (int32 accumulate), f32 rescale per group by ascale x wscale.  The
    weight zero-point / symmetric offset is folded into the int8 weight
    values before the dot (codes - zp fits int8), so no activation-sum
    correction term is needed.

    xq_ref : [BM, K] int8 (resident across K blocks)
    a_ref  : [1, BM, e*gb] f32 activation scales, pre-permuted per K block
    w_ref  : [BKW, BN] packed words / int8 rows
    s_ref  : [1, e*gb, BN] weight scale rows (pre-permuted)
    z_ref  : [1, e*gb, BN] zeros or None
    """
    width = spec.bits
    if width == 8:
        e, kw = 1, k
    else:
        e = 32 // width
        kw = k // e
    w_blk = _squeeze_lead(w_ref)
    bkw = w_blk.shape[0]
    gb = bkw // g
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_all = _squeeze_lead(s_ref)
    z_all = _squeeze_lead(z_ref) if z_ref is not None else None
    a_all = None if per_token else a_ref[0]  # [BM, e*gb]
    acc = jnp.zeros_like(acc_ref)
    for band in range(e):
        if width == 8:
            codes = w_blk.astype(jnp.int32)
        else:
            codes = _unpack_band(w_blk, width, band).astype(jnp.int32)
        for gg in range(gb):
            gi = band * gb + gg
            csub = codes[gg * g:(gg + 1) * g]
            if z_all is not None:
                wsub = (csub - z_all[gi][None, :].astype(jnp.int32)).astype(
                    jnp.int8)
            else:
                wsub = (csub - spec.code_offset).astype(jnp.int8)
            xb = _x_chunk(xq_ref, band, kw, g, kb, n_kb, sub_off=gg * g,
                          blk=bkw)
            d = jax.lax.dot_general(
                xb, wsub, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            if per_token:
                # per-row activation scale applied once outside the kernel
                acc = acc + d * s_all[gi][None, :].astype(jnp.float32)
            else:
                acc = acc + d * (a_all[:, gi][:, None]
                                 * s_all[gi][None, :].astype(jnp.float32))
    acc_ref[:] += acc

    @pl.when(kb == n_kb - 1)
    def _store():
        o_ref[:] = acc_ref[:]


def _int8_kernel_planar(xq_ref, a_ref, w_refs, s_ref, z_ref, o_ref, *,
                        spec: QSpec, k: int, g: int,
                        per_token: bool = False):
    """comp_int8 over MULTI-PLANE packs (odd widths 2/3/5/6/7): per
    (plane, band, group) int8 MXU dot of raw codes, rescaled in f32 by
    2^shift * wscale * ascale; the zero-point/offset correction applies
    once per group via the quantized-activation row sum (the int8
    counterpart of _gemm_kernel_planar; parity: the reference's int8
    compute covers every KBlock width with asym correction,
    bestla_epilogue.h:278-311).

    xq_ref : [BM, K] int8
    a_ref  : [BM, G] f32 activation scales (grouped) or None (per-token)
    w_refs : packed uint32 planes
    s_ref  : [G, BN] f32 weight scales (pre-decoded; double-quant ok)
    z_ref  : [G, BN] uint8 zero points or None (symmetric)
    """
    s_all = s_ref[...]
    z_all = (z_ref[...].astype(jnp.int32)
             if z_ref is not None else None)
    a_all = None if per_token else a_ref[...]
    bm = xq_ref.shape[0]
    bn = o_ref.shape[1]
    acc = jnp.zeros((bm, bn), jnp.float32)
    planes = [(r, w, s) for r, (w, s) in zip(w_refs,
                                             _int_planes(spec.bits))]
    first = True
    for w_ref, width, shift in planes:
        w_blk = w_ref[...]
        e = 32 // width
        kw = k // e
        # whole groups per band, or whole bands per group (the per-chunk
        # correction terms of one group sum to zp_g * sum(xq_g))
        g_eff = min(g, kw)
        n_sub = kw // g_eff
        for band in range(e):
            codes = _unpack_band(w_blk, width, band).astype(
                jnp.int32).astype(jnp.int8)
            for gg in range(n_sub):
                grow = (band * kw + gg * g_eff) // g
                wsub = codes[gg * g_eff:(gg + 1) * g_eff]
                k0 = band * kw + gg * g_eff
                xb = xq_ref[:, k0:k0 + g_eff]
                d = jax.lax.dot_general(
                    xb, wsub, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if first:
                    # per-group correction, once (dequant is linear in
                    # the planes): acc_g -= zp_g * sum(xq_g)
                    xsum = jnp.sum(xb.astype(jnp.int32), axis=1,
                                   keepdims=True)
                    if z_all is not None:
                        d = (d << shift) - xsum * z_all[grow][None, :]
                    else:
                        d = (d << shift) - xsum * spec.code_offset
                else:
                    d = d << shift
                scale = s_all[grow][None, :]
                if not per_token:
                    scale = scale * a_all[:, grow][:, None]
                acc = acc + d.astype(jnp.float32) * scale
        first = False
    o_ref[:] = acc.astype(o_ref.dtype)


def _int8_planar_ok(qt: QTensor, m: int) -> bool:
    """Eligibility for the multi-plane comp_int8 kernel: odd INT widths
    (raw codes <= 127 fit int8 — 8-bit asym stays excluded), int or no
    zero points, activation-group == weight-group with whole groups per
    plane band."""
    spec = qt.spec
    if spec.qtype != QType.INT or spec.bits not in (2, 3, 5, 6, 7):
        return False
    if qt.k_shards != 1:
        return False
    if qt.zeros is not None and jnp.issubdtype(qt.zeros.dtype,
                                               jnp.floating):
        return False  # ggml float-offset: fp planar kernel territory
    if m % 32:
        return False
    k = qt.shape[0]
    g = spec.effective_group(k)
    if not (g < k and g % 128 == 0 and k % g == 0):
        return False
    return all(_plane_band_ok(w, k, g) for w in plane_widths(spec.bits))


def _int8_pallas_ok(qt: QTensor, m: int) -> bool:
    spec = qt.spec
    if spec.qtype != QType.INT or spec.bits not in (4, 8):
        return False
    if qt.k_shards != 1 or len(qt.data) != 1 or spec.double_quant:
        return False
    if qt.zeros is not None and (
            jnp.issubdtype(qt.zeros.dtype, jnp.floating) or spec.bits == 8):
        return False  # 8-bit asym codes - zp overflows int8
    if m % 32:  # int8 sublane tile
        return False
    k = qt.shape[0]
    g = qt.spec.effective_group(k)
    # activation quant granularity == weight group; kernel needs the
    # group to fill whole 128-lane MXU contractions
    return g < k and g % 128 == 0 and _kernel_group(qt) == g


@functools.partial(jax.jit, static_argnames=("interpret", "per_token"))
def _qmatmul_int8_planar(xq: jax.Array, ascale, qt: QTensor,
                         interpret: bool = False,
                         per_token: bool = False) -> jax.Array:
    """Multi-plane comp_int8 launcher (monolithic K, like the fp planar
    kernel): x int8 [M, K] -> f32 [M, N]."""
    spec = qt.spec
    k, n = qt.shape
    m = xq.shape[0]
    g = spec.effective_group(k)
    bn = _choose_bn(n)
    cap = max(32, (2 * 1024 * 1024) // k)
    bm = m
    for c in (256, 128, 64, 32):
        if m % c == 0 and c <= cap:
            bm = c
            break
    grid = (m // bm, n // bn)
    scales = qt.effective_scales(jnp.float32)
    zeros = qt.zeros
    gr = scales.shape[0]

    x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((bm, gr), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec((wp.shape[0], bn), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM) for wp in qt.data]
    s_spec = pl.BlockSpec((gr, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(m * k
                        + sum(wp.size * wp.dtype.itemsize
                              for wp in qt.data) + m * n * 4),
        transcendentals=0,
    )
    n_planes = len(qt.data)
    body = functools.partial(_int8_kernel_planar, spec=spec, k=k, g=g,
                             per_token=per_token)
    in_specs = [x_spec]
    args = [xq]
    if per_token:
        def kern(xq_ref, *refs):
            body(xq_ref, None, refs[:n_planes], refs[n_planes],
                 refs[n_planes + 1] if zeros is not None else None,
                 refs[-1])
    else:
        def kern(xq_ref, a_ref, *refs):  # noqa: F811
            body(xq_ref, a_ref, refs[:n_planes], refs[n_planes],
                 refs[n_planes + 1] if zeros is not None else None,
                 refs[-1])
        in_specs.append(a_spec)
        args.append(ascale)
    in_specs += [*w_specs, s_spec]
    args += [*qt.data, scales]
    if zeros is not None:
        in_specs.append(s_spec)
        args.append(zeros)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "per_token"))
def _qmatmul_int8_pallas(xq: jax.Array, ascale, qt: QTensor,
                         interpret: bool = False,
                         per_token: bool = False) -> jax.Array:
    spec = qt.spec
    k, n = qt.shape
    m = xq.shape[0]
    g = spec.effective_group(k)
    bn = _choose_bn(n)
    cap = max(32, (2 * 1024 * 1024) // k)  # int8 x block ~2MB
    bm = m
    for c in (256, 128, 64, 32):
        if m % c == 0 and c <= cap:
            bm = c
            break
    e = _bands(spec)
    wq = qt.data[0]
    scales = qt.effective_scales(jnp.float32)
    zeros = qt.zeros
    kw_words = wq.shape[0]
    bkw = _choose_bkw(kw_words, g, bn, m=m)
    n_kb = kw_words // bkw
    gb = bkw // g
    grid = (m // bm, n // bn, n_kb)

    idx = np.asarray(
        [(band * kw_words + kb_i * bkw) // g + t
         for kb_i in range(n_kb) for band in range(e)
         for t in range(gb)], np.int32)
    s_perm = jnp.take(scales, idx, axis=0).reshape(n_kb, e * gb, n)
    z_perm = (jnp.take(zeros, idx, axis=0).reshape(n_kb, e * gb, n)
              if zeros is not None else None)
    # activation scales with the same group permutation, groups on lanes:
    # [n_kb, M, e*gb] so the kernel slices a static lane column per group
    a_perm = None if per_token else jnp.swapaxes(
        jnp.take(ascale, idx, axis=1).reshape(m, n_kb, e * gb), 0, 1)

    x_spec = pl.BlockSpec((bm, k), lambda i, j, kb: (i, 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, bm, e * gb), lambda i, j, kb: (kb, i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bkw, bn), lambda i, j, kb: (kb, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, e * gb, bn), lambda i, j, kb: (kb, 0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k + wq.size * wq.dtype.itemsize + m * n * 4,
        transcendentals=0,
    )
    body = functools.partial(_int8_kernel, spec=spec, k=k, g=g, n_kb=n_kb,
                             per_token=per_token)
    if per_token:
        if zeros is not None:
            def kern(xq_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
                body(xq_ref, None, w_ref, s_ref, z_ref, o_ref, acc_ref)
            in_specs = [x_spec, w_spec, s_spec, s_spec]
            args = (xq, wq, s_perm, z_perm)
        else:
            def kern(xq_ref, w_ref, s_ref, o_ref, acc_ref):  # noqa: F811
                body(xq_ref, None, w_ref, s_ref, None, o_ref, acc_ref)
            in_specs = [x_spec, w_spec, s_spec]
            args = (xq, wq, s_perm)
    elif zeros is not None:
        kern = body
        in_specs = [x_spec, a_spec, w_spec, s_spec, s_spec]
        args = (xq, a_perm, wq, s_perm, z_perm)
    else:
        def kern(xq_ref, a_ref, w_ref, s_ref, o_ref, acc_ref):  # noqa: F811
            body(xq_ref, a_ref, w_ref, s_ref, None, o_ref, acc_ref)
        in_specs = [x_spec, a_spec, w_spec, s_spec]
        args = (xq, a_perm, wq, s_perm)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out


def qmatmul_int8(x: jax.Array, qt: QTensor, out_dtype=None,
                 force_xla: bool = False, interpret: bool = False,
                 per_token: bool = False) -> jax.Array:
    """comp_int8 analogue: dynamic per-token int8 activation quant then
    int8 x int-weight matmul accumulated in int32 on the MXU, with the
    float correction applied per group.

    Parity: bestla_prologue_a.h ActivationKBlockQuantize +
    LauncherIntKBlock int8 compute (bestla_wrapper.h:547+); the weight
    zero-point is folded into the int8 weight values (replacing the
    activation-reduce correction of bestla_epilogue.h:278-311).

    Dispatch: Pallas kernel (int8 MXU — 2x the bf16 macs/clock) when the
    pack qualifies, else an XLA einsum program; both share the same
    quantization math.  `per_token=True` uses one activation scale per
    row (applied outside the kernel) instead of one per group — cheaper
    epilogue, slightly coarser activation quant.

    Pallas eligibility: `_int8_pallas_ok` (bits 4/8: zero point folded
    into the int8 weights) or `_int8_planar_ok` (bits 2/3/5/6/7: per-
    plane raw-code dots with 2^shift rescale + once-per-group zp
    correction — every KBlock width now has int8 compute, matching
    bestla_gemm.h:2771-4330 / bestla_epilogue.h:278-311).  Remaining
    gates: M % 32 == 0 (int8 sublane tile), group % 128 == 0 dividing K,
    int-or-no zero points (8-bit asym and ggml float offsets fall back —
    8-bit raw codes overflow int8).  Ineligible combos silently use the
    XLA program or `qmatmul`'s bf16 group-dot — which measured FASTER
    than int8 compute on v5e anyway (BENCH_NOTES.md), so int8 compute
    stays opt-in (NST_COMP=int8/int8t).
    """
    spec = qt.spec
    qt = qt.local_view()
    if spec.qtype != QType.INT:
        return qmatmul(x, qt, out_dtype)
    out_dtype = out_dtype or x.dtype
    k, n = qt.shape
    g = spec.effective_group(k)
    lead = x.shape[:-1]
    if x.shape[-1] != k:  # K-padded pack
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k - x.shape[-1])])
    xf = x.reshape(-1, k).astype(jnp.float32)
    m = xf.shape[0]

    mp = m if m <= 256 else -(-m // 256) * 256
    backend_ok = (interpret or _use_pallas()) and not force_xla
    m_eff = mp if mp % 32 == 0 else m
    use_pallas = backend_ok and _int8_pallas_ok(qt, m_eff)
    use_planar = (not use_pallas and backend_ok
                  and _int8_planar_ok(qt, m_eff))
    if use_pallas or use_planar:
        if mp != m:
            xf = jnp.pad(xf, ((0, mp - m), (0, 0)))
        xq, ascale = _act_quant(xf, k if per_token else g)
        launcher = (_qmatmul_int8_planar if use_planar
                    else _qmatmul_int8_pallas)
        out = launcher(xq, ascale, qt, interpret=interpret,
                       per_token=per_token)
        if per_token:
            out = out * ascale
        if mp != m:
            out = out[:m]
        return out.reshape(*lead, n).astype(out_dtype)

    if not spec.symmetric:
        return qmatmul(x, qt, out_dtype)
    xq, ascale = _act_quant(xf, k if per_token else g)
    if per_token:
        ascale = jnp.broadcast_to(ascale, (m, k // g))

    from .quantize import unpack_codes

    codes = unpack_codes(qt.data, spec.bits, k).astype(jnp.int32)
    wvals = (codes - spec.code_offset).astype(jnp.int8)  # [K, N]
    wscale = qt.effective_scales(jnp.float32)  # [G, N]

    # group-wise int8 dot then float rescale:  out = sum_g (xq_g @ wq_g) * (as*ws)
    wq_g = wvals.reshape(k // g, g, n)
    acc = jnp.einsum(
        "mgk,gkn->mgn", xq.reshape(m, k // g, g).astype(jnp.int32),
        wq_g.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out = jnp.einsum("mgn,mg,gn->mn", acc, ascale, wscale)
    return out.reshape(*lead, n).astype(out_dtype)
