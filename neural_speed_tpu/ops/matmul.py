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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtypes import QSpec, QType, plane_widths
from .quantize import QTensor, decode_lut, dequantize, unpack_plane


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


def _gemm_kernel_int(x_ref, w_ref, s_ref, z_ref, o_ref, *, spec: QSpec,
                     k: int, g: int, cdt, bm: int, bn: int):
    """Fused dequant-GEMM kernel for single-plane INT widths (4/2/1/8-bit
    native) — multi-plane odd widths go through the XLA path for now.

    x_ref: [BM, K] activations (cdt)
    w_ref: [K/e, BN] packed words (uint32) or [K, BN] int8 (bits==8)
    s_ref: [K/g, BN] scales (cdt)
    z_ref: [K/g, BN] zeros (uint8) or dummy
    o_ref: [BM, BN] f32 accumulator out
    """
    width = spec.bits if spec.bits in (1, 2, 4, 8) else None
    assert width is not None
    acc = jnp.zeros((bm, bn), jnp.float32)
    if width == 8:
        e = 1
        kw = k
    else:
        e = 32 // width
        kw = k // e
    groups_per_band = kw // g if g <= kw else 1
    for band in range(e):
        if width == 8:
            codes = w_ref[:].astype(jnp.int32)
        else:
            codes = _unpack_band(w_ref[:], width, band).astype(jnp.int32)
        # K range of this band: [band*kw, (band+1)*kw)
        if g >= k:  # one group total
            sblk = s_ref[0, :][None, :]
            zblk = z_ref[0, :][None, :] if z_ref is not None else None
            vals = _int_codes_to_vals(codes, spec, zblk if zblk is not None else 0,
                                      cdt)
            wb = vals * sblk.astype(cdt)
        else:
            gb = groups_per_band
            g0 = band * kw // g
            sblk = s_ref[pl.ds(g0, gb), :]
            # broadcast scales over group rows: [GB, BN] -> [KW, BN]
            # (explicit broadcast+reshape — Mosaic-friendly, unlike repeat)
            sfull = jnp.broadcast_to(
                sblk[:, None, :], (gb, g, sblk.shape[-1])
            ).reshape(kw, sblk.shape[-1])
            if z_ref is not None:
                zb = z_ref[pl.ds(g0, gb), :]
                zfull = jnp.broadcast_to(
                    zb[:, None, :], (gb, g, zb.shape[-1])
                ).reshape(kw, zb.shape[-1])
            else:
                zfull = 0
            vals = _int_codes_to_vals(codes, spec, zfull, cdt)
            wb = vals * sfull.astype(cdt)
        xb = x_ref[:, pl.ds(band * kw, kw)].astype(cdt)
        acc = acc + jnp.dot(xb, wb, preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _gemm_kernel_lut(x_ref, w_ref, s_ref, o_ref, *, spec: QSpec, k: int,
                     g: int, cdt, bm: int, bn: int):
    """Fused dequant-GEMM for NF4/FP4 (4-bit LUT)."""
    e = 8
    kw = k // e
    acc = jnp.zeros((bm, bn), jnp.float32)
    for band in range(e):
        codes = _unpack_band(w_ref[:], 4, band).astype(jnp.int32)
        vals = decode_lut(codes, spec, cdt)
        if g >= k:
            sfull = s_ref[0, :][None, :].astype(cdt)
        else:
            gb = kw // g
            g0 = band * kw // g
            sblk = s_ref[pl.ds(g0, gb), :]
            sfull = jnp.broadcast_to(
                sblk[:, None, :], (gb, g, sblk.shape[-1])
            ).reshape(kw, sblk.shape[-1]).astype(cdt)
        wb = vals * sfull
        xb = x_ref[:, pl.ds(band * kw, kw)].astype(cdt)
        acc = acc + jnp.dot(xb, wb, preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _pallas_supported(qt: QTensor) -> bool:
    spec = qt.spec
    if qt.k_shards != 1:
        return False  # multi-slab packs go through the XLA path
    if spec.double_quant:
        return False
    if qt.zeros is not None and jnp.issubdtype(qt.zeros.dtype, jnp.floating):
        return False  # ggml float-offset formats -> XLA path
    if spec.is_fp8:
        return False  # XLA handles fp8 astype well already
    if not (spec.is_lut or spec.bits in (1, 2, 4, 8)):
        return False
    # group structure must align with sub-bands: each band covers K/e rows
    # and group slicing inside the kernel assumes g | K/e (or one group).
    k = qt.shape[0]
    g = spec.effective_group(k)
    e = 1 if spec.bits == 8 and not spec.is_lut else 32 // (4 if spec.is_lut else spec.bits)
    kw = k // e
    if g < k and (g > kw or kw % g):
        return False
    return True


def _choose_bn(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    return n


def _choose_bm(m: int) -> int:
    for bm in (256, 128, 64, 32, 16, 8):
        if m % bm == 0:
            return bm
    return m


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _qmatmul_pallas_2d(x: jax.Array, qt: QTensor, out_dtype=None,
                       interpret: bool = False) -> jax.Array:
    """x: [M, K] -> [M, N] via fused Pallas kernel."""
    spec = qt.spec
    k, n = qt.shape
    m = x.shape[0]
    out_dtype = out_dtype or x.dtype
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    g = spec.effective_group(k)
    bm, bn = _choose_bm(m), _choose_bn(n)
    grid = (m // bm, n // bn)

    wq = qt.data[0]
    scales = qt.effective_scales(cdt)
    kw_words = wq.shape[0]

    x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((kw_words, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((scales.shape[0], bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)

    nbytes = 4 if cdt == jnp.float32 else 2
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * nbytes + wq.size * wq.dtype.itemsize + m * n * 4,
        transcendentals=0,
    )

    if spec.is_lut:
        kern = functools.partial(_gemm_kernel_lut, spec=spec, k=k, g=g, cdt=cdt,
                                 bm=bm, bn=bn)
        in_specs = [x_spec, w_spec, s_spec]
        args = (x.astype(cdt), wq, scales)
    elif qt.zeros is not None:
        z_spec = pl.BlockSpec((qt.zeros.shape[0], bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_gemm_kernel_int, spec=spec, k=k, g=g, cdt=cdt,
                                 bm=bm, bn=bn)
        in_specs = [x_spec, w_spec, s_spec, z_spec]
        args = (x.astype(cdt), wq, scales, qt.zeros)
    else:
        def kern(x_ref, w_ref, s_ref, o_ref):
            _gemm_kernel_int(x_ref, w_ref, s_ref, None, o_ref, spec=spec, k=k,
                             g=g, cdt=cdt, bm=bm, bn=bn)
        in_specs = [x_spec, w_spec, s_spec]
        args = (x.astype(cdt), wq, scales)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out.astype(out_dtype)


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
    use_pallas = (interpret or _use_pallas()) and _pallas_supported(qt)
    if force_xla or not use_pallas:
        return qmatmul_xla(x, qt, out_dtype)
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, x.shape[-1])
    out = _qmatmul_pallas_2d(x2, qt, out_dtype=out_dtype or x.dtype,
                             interpret=interpret)
    return out.reshape(*lead, qt.shape[1])


def qmatmul_int8(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    """comp_int8 analogue: dynamic per-token int8 activation quant then
    int8 x int-weight matmul accumulated in int32 on the MXU, with the
    float correction applied per group.

    Parity: bestla_prologue_a.h ActivationKBlockQuantize +
    LauncherIntKBlock int8 compute (bestla_wrapper.h:547+), and the
    asym zero-point correction of bestla_epilogue.h:278-311.

    Currently implemented as an XLA program (int8 dot hits the MXU via
    preferred_element_type=int32); a Pallas variant is a planned perf step.
    """
    spec = qt.spec
    if spec.qtype != QType.INT or not spec.symmetric:
        return qmatmul(x, qt, out_dtype)
    out_dtype = out_dtype or x.dtype
    k, n = qt.shape
    g = spec.effective_group(k)
    lead = x.shape[:-1]
    xf = x.reshape(-1, k).astype(jnp.float32)
    m = xf.shape[0]

    # per-token, per-group activation quant (sym int8)
    xg = xf.reshape(m, k // g, g)
    amax = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1), 1e-8)  # [M, G]
    ascale = amax / 127.0
    xq = jnp.clip(jnp.round(xg / ascale[..., None]), -127, 127).astype(jnp.int8)

    from .quantize import unpack_codes

    codes = unpack_codes(qt.data, spec.bits, k).astype(jnp.int32)
    wvals = (codes - spec.code_offset).astype(jnp.int8)  # [K, N]
    wscale = qt.effective_scales(jnp.float32)  # [G, N]

    # group-wise int8 dot then float rescale:  out = sum_g (xq_g @ wq_g) * (as*ws)
    wq_g = wvals.reshape(k // g, g, n)
    acc = jnp.einsum(
        "mgk,gkn->mgn", xq.astype(jnp.int32), wq_g.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out = jnp.einsum("mgn,mg,gn->mn", acc, ascale, wscale)
    return out.reshape(*lead, n).astype(out_dtype)
