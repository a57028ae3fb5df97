"""Pallas fused flash-attention over the (optionally int8-quantized) KV cache.

Parity target: core/layers/mha_dense_wrapper.h — the reference fuses
QK^T -> online exp/row-sum -> PV into one pass over a tiled KV cache
(`scale_exp_acc_sum_fp32_t` at :104, `scale_write_back_t` at :135), reading
K/V in the BesTLA reordered layout (fp16/bf16/int8).  mha_dense.cpp:31-80
dispatches on dtype and mask flags (causal / ALiBi "IS_ALIBI8" / grok
"IS_TANH30").

TPU-native design (one kernel serves prefill and decode):

  * GQA row packing: q is reshaped to [B, H_kv, R, D] with R = n_rep * T, so
    the grid runs over KV heads and every K/V block is DMA'd from HBM ONCE
    per query-head *group* instead of once per query head — n_rep x less KV
    bandwidth, which is the entire game for memory-bound decode.
  * Quantized KV read natively: the kernel consumes the cache's int8 codes
    plus per-(token, head) scales; K scales fold into the score columns
    after QK^T and V scales fold into P's columns before PV, so no fp K/V is
    ever materialized in HBM (the XLA fallback in kv_cache.read_layer does
    materialize — this kernel is why it doesn't have to).
  * Online softmax (flash): running m/l/acc in VMEM scratch across the KV
    grid dimension; out = acc / l on the last block.
  * Block skipping: KV blocks past the slot's `kv_len` (scalar-prefetched)
    or entirely above the causal diagonal are skipped.
  * Masking supports continuous batching: each query row carries an absolute
    position, each batch slot a KV length (llama.cpp:329-349 semantics).

Grid: (B, H_kv, R/BR, S/BS); dims 0-2 parallel (megacore), dim 3 is the
online-softmax reduction ("arbitrary").
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
NEG_INIT = -float(np.finfo(np.float32).max)
LANES = 128
# single source of truth: the fused-append path's bit-identical-cache
# contract requires the in-kernel quant to match kv_cache's exactly
from .kv_cache import KV_SCALE_EPS  # noqa: E402


# Sweep knobs resolved ONCE at import (per-process): reading env inside
# traced code silently no-ops after the first trace in a process (the
# same failure class as the round-3 NST_DEFER_APPEND kill switch).  The
# on-chip sweeps run each arm in a fresh process, which is also the only
# way a change could take effect.
FLASH_HB_MAX = int(os.environ.get("NST_FLASH_HB", "8"))
FLASH_BS_OVERRIDE = os.environ.get("NST_FLASH_BS")
FLASH_BR = int(os.environ.get("NST_FLASH_BR", "256"))
FLASH_PREFILL_BS = int(os.environ.get("NST_FLASH_PREFILL_BS", "1024"))
# int8-MXU score dot in the decode kernel (NST_FLASH_INT8=qk): quantize
# q per row and feed the int8 KV block to the MXU DIRECTLY — the
# int8->bf16 element converts of the whole K block were the kernel's
# dominant VPU cost (decode MHA at 72% of the KV-read roofline).
# q-row quantization replaces the bf16 dot's rounding with int8 rounding
# of q (comparable ~0.4% relative); the dot itself is exact in int32.
FLASH_INT8_DOT = os.environ.get("NST_FLASH_INT8", "off") == "qk"


def flash_mode() -> str:
    """'auto' (TPU only, default) | 'on' | 'off' | 'interpret'."""
    return os.environ.get("NST_FLASH", "auto")


def flash_enabled() -> bool:
    mode = flash_mode()
    if mode == "off":
        return False
    if mode in ("on", "interpret"):
        return True
    return jax.default_backend() == "tpu"


def _head_dim_ok(head_dim: int) -> bool:
    """Lane-aligned head dims are native; other multiples of 8 up to 256
    (phi-2/stablelm 80, gptneox 96) run with Mosaic's masked-lane padding —
    the dots contract over the true D, padding lanes are masked (parity:
    the reference's mha_dense handles arbitrary head sizes,
    mha_dense.cpp:31-80).  NST_FLASH_ODD_D=0 restores the old gate."""
    if head_dim in (64, 128, 256):
        return True
    return (head_dim % 8 == 0 and head_dim <= 256
            and os.environ.get("NST_FLASH_ODD_D", "1") != "0")


def _supported(head_dim: int, s: int) -> bool:
    return _head_dim_ok(head_dim) and s % 128 == 0


_warned_shapes: set = set()


def warn_fallback(site: str, head_dim: int, s: int) -> None:
    """One-time warning when a flash-eligible call drops to the XLA path
    (VERDICT r1: the silent fallback hid that phi-2-class models lost
    fused attention + native int8-KV reads)."""
    key = (site, head_dim, s)
    if key in _warned_shapes:
        return
    _warned_shapes.add(key)
    import warnings

    warnings.warn(
        f"flash attention unsupported at {site} (head_dim={head_dim}, "
        f"S={s}); falling back to the XLA attention path",
        stacklevel=3,
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _sel_scale(s_ref, h, h_blk: int, block_s: int):
    """Select this head's scale row [1, BS] from an [h_blk, BS] block.

    Scales live in standard (8,128)-tiled [.., H, S] arrays (anything else
    makes XLA relayout-copy the whole tensor per call); Mosaic forbids
    dynamic sublane slicing, so the row is picked with an iota mask-sum —
    h_blk rows of VPU work, no relayout anywhere."""
    # f32 in-kernel math regardless of the stored dtype (bf16 scales are
    # the default cache layout: half the scale stream + footprint)
    s_all = s_ref[...].reshape(h_blk, block_s).astype(jnp.float32)
    if h_blk == 1:
        return s_all
    row = jax.lax.rem(h, h_blk)
    sel = jax.lax.broadcasted_iota(jnp.int32, (h_blk, 1), 0) == row
    return jnp.sum(jnp.where(sel, s_all, 0.0), axis=0, keepdims=True)


def _mha_kernel(
    # scalar prefetch
    kvlen_ref,                    # [B] int32
    # inputs
    pos_ref,                      # [1, BR, 1] int32 (query row positions)
                                  # nat layout: [1, BT, 1] token positions
    slope_ref,                    # [1, BR, 1] f32 (alibi slopes per row)
                                  # nat layout: [1, n_rep] per-group slopes
    q_ref,                        # [1, 1, BR, D]
                                  # nat layout: [1, BT, n_rep, D]
    k_ref,                        # [1, 1, BS, D]  (bf16/f32 or int8 codes)
    v_ref,                        # [1, 1, BS, D]
    *rest,                        # [ks_ref, vs_ref,] o_ref, m, l, acc
    quantized: bool,
    causal: bool,
    use_alibi: bool,
    softcap: float,
    sm_scale: float,
    block_s: int,
    n_s: int,
    h_blk: int = 1,               # heads per scale block (see _sel_scale)
    nat_rep: int = 0,             # >0: NATURAL-layout prefill (q/out stay
                                  # [B, T, H, D]; rows = t*n_rep + g —
                                  # row order is free in attention, and
                                  # this kills the two 16MB q-pack/out-
                                  # unpack relayouts per layer)
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest

    b = pl.program_id(0)
    h_id = pl.program_id(1)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kv_len = kvlen_ref[b]
    if nat_rep:
        bt = q_ref.shape[1]
        pos = jnp.broadcast_to(
            pos_ref[0].reshape(bt, 1, 1), (bt, nat_rep, 1)
        ).reshape(bt * nat_rep, 1)                     # [BR, 1] int32
    else:
        pos = pos_ref[0]                               # [BR, 1] int32
    run = (j * block_s) < kv_len
    if causal:
        # skip blocks entirely above the causal diagonal for every row
        run = jnp.logical_and(run, (j * block_s) <= jnp.max(pos))

    @pl.when(run)
    def _block():
        if nat_rep:
            bt, d = q_ref.shape[1], q_ref.shape[3]
            br = bt * nat_rep
            q = q_ref[...].reshape(br, d).astype(jnp.bfloat16)
        else:
            br, d = q_ref.shape[2], q_ref.shape[3]
            q = q_ref[0, 0].astype(jnp.bfloat16)       # [BR, D]
        kc = k_ref[...].reshape(block_s, d)            # [BS, D]
        s = jax.lax.dot_general(
            q, kc.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [BR, BS]
        if quantized:
            s = s * _sel_scale(ks_ref, h_id, h_blk, block_s)  # K scales
        s = s * sm_scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)

        col = jax.lax.broadcasted_iota(jnp.int32, (br, block_s), 1) + (
            j * block_s
        )
        valid = col < kv_len
        if causal:
            valid = jnp.logical_and(valid, col <= pos)
        if use_alibi:
            if nat_rep:
                bt = q_ref.shape[1]
                slope = jnp.broadcast_to(
                    slope_ref[...].reshape(1, nat_rep, 1),
                    (bt, nat_rep, 1)).reshape(br, 1)   # [BR, 1] f32
            else:
                slope = slope_ref[0]                   # [BR, 1] f32
            s = s + slope * (col.astype(jnp.float32) - pos.astype(jnp.float32))
        s = s + jnp.where(valid, 0.0, MASK_VALUE)

        # online softmax update (f32 stats, lane-broadcast m/l)
        m_prev = m_ref[:]                              # [BR, LANES]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)      # [BR, 1]
        m_next = jnp.maximum(m_prev, m_cur)            # [BR, LANES]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                 # [BR, BS]
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_next

        vc = v_ref[...].reshape(block_s, d)            # [BS, D]
        if quantized:
            p = p * _sel_scale(vs_ref, h_id, h_blk, block_s)  # V scales
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vc.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [BR, D]
        acc_ref[:] = acc_ref[:] * alpha[:, :1] + pv

    @pl.when(j == n_s - 1)
    def _finalize():
        l = l_ref[:, :1]
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)        # masked rows -> 0
        out = (acc_ref[:] * inv).astype(o_ref.dtype)
        if nat_rep:
            o_ref[...] = out.reshape(o_ref.shape)
        else:
            o_ref[0, 0] = out


def _mha_kernel_hblk(
    # scalar prefetch
    kvlen_ref,                    # [B] int32
    # inputs (paged=True: a table_ref scalar-prefetch arg precedes pos)
    pos_ref,                      # [1, BR, 1] int32
    slope_ref,                    # [HB, BR, 1] f32
    q_ref,                        # [1, HB, BR, D]
    k_ref,                        # [1, HB, BS, D] (maybe leading layer dim)
    v_ref,
    *rest,                        # [knew_ref, vnew_ref,] [ks, vs,] o, m, l, acc
    quantized: bool,
    causal: bool,
    use_alibi: bool,
    softcap: float,
    sm_scale: float,
    block_s: int,
    n_s: int,
    hb: int,
    extra_kv: bool = False,
    fused_append: bool = False,
    paged: bool = False,
):
    """Decode variant: HB KV heads per grid program.  One (HB x BS x D)
    DMA replaces HB tiny per-head fetches — at single-token decode the
    per-program overhead (~0.5us) dominated the streaming of the KV cache
    (~35% of HBM peak with one head per program).  The head loop is
    unrolled; softmax stats carry a leading head dim in scratch.

    `fused_append` (round-3 closing profile: the separate append RMW
    windows' DMA latency was 8% of the decode step): the cache k/v/scale
    buffers are input_output-ALIASED, and this kernel quantizes the
    current token's k/v and writes the single new row + scale column
    through tiny aliased output blocks — the four per-layer RMW
    dispatches disappear and their DMAs ride inside this call.

    `paged`: the KV stream blocks come from the page pool
    ([L, H, P, ps, D] / scales [L, H, P, 1, ps]) instead of the stacked
    contiguous cache, so the fused-append window slices use the paged
    block axis order; everything else (seeding, online softmax, window
    patch math) is identical — block_s == page_size and grid step j is
    the LOGICAL block index (the launcher's index maps resolve physical
    pages via the scalar-prefetched table)."""
    knew_ref = vnew_ref = None
    if extra_kv:
        knew_ref, vnew_ref, *rest = rest
    if quantized:
        ks_ref, vs_ref, *rest = rest
    else:
        ks_ref = vs_ref = None
    if fused_append:
        (o_ref, kout_ref, vout_ref, ksout_ref, vsout_ref,
         m_ref, l_ref, acc_ref) = rest
    else:
        kout_ref = vout_ref = ksout_ref = vsout_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest

    b = pl.program_id(0)
    j = pl.program_id(3)

    kv_len = kvlen_ref[b]
    pos = pos_ref[0]                                   # [BR, 1]
    # deferred append (extra_kv): kv_len INCLUDES the current token, but
    # its row is NOT in the cache yet — it arrives as the knew/vnew
    # operands and seeds the online softmax below.  Cache columns stop
    # one short when the current query really is the newest position
    # (inactive slots keep their full stored window).
    if extra_kv:
        is_new = (jnp.max(pos) == kv_len - 1).astype(jnp.int32)
        kv_len_cache = kv_len - is_new
    else:
        kv_len_cache = kv_len

    @pl.when(j == 0)
    def _init():
        if not extra_kv:
            m_ref[:] = jnp.full_like(m_ref, NEG_INIT)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
        else:
            # seed softmax stats with the current token's self-attention
            # column (unquantized f32 operands; alibi distance is 0).
            # All math stays f32 — a bf16 operand fused into a broadcast
            # trips Mosaic's 'vector.broadcast' element-type verifier.
            ok = jnp.max(pos) == kv_len - 1
            for hh in range(hb):
                q_h = q_ref[0, hh].astype(jnp.float32)         # [BR, D]
                kn = knew_ref[0, hh]                           # [1, D] f32
                s0 = jax.lax.dot_general(
                    q_h, kn, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                                   # [BR, 1]
                if softcap > 0.0:
                    s0 = softcap * jnp.tanh(s0 / softcap)
                valid0 = jnp.logical_and(ok, pos >= 0)         # [BR, 1]
                m0 = jnp.where(valid0, s0, NEG_INIT)
                m_ref[hh] = jnp.broadcast_to(m0, m_ref[hh].shape)
                l_ref[hh] = jnp.broadcast_to(
                    jnp.where(valid0, 1.0, 0.0), l_ref[hh].shape)
                gate = jnp.where(valid0, 1.0, 0.0)             # [BR, 1] f32
                acc_ref[hh] = gate * vnew_ref[0, hh]           # [BR, D] f32

    if fused_append:
        # In-kernel deferred append: quantize the current token's k/v and
        # stage the patched 8-row KV window + 128-lane scale window into
        # the ALIASED out blocks (Mosaic's minimum sublane/lane block
        # extents; the out index maps don't depend on j, so the flush
        # lands once per (b, h) program).  The OLD window is sliced out
        # of the streamed KV/scale block at grid step j == row//block_s
        # — the block holding the row is always fetched (BlockSpec DMAs
        # are unconditional and block_s % 128 == 0 keeps the window
        # inside one block) — so the cache arrays enter the pallas_call
        # exactly ONCE.  Round 3 passed them a second time as dedicated
        # window operands, which forced XLA into defensive whole-cache
        # copies per layer to honor the alias (~17 GB/token: the
        # BENCH_r03 16 tok/s collapse, VERDICT r3).  All non-new rows
        # are preserved bit-for-bit — inactive slots (ok == False) keep
        # the entire window, so spectator caches are untouched.
        d_ = q_ref.shape[3]
        ok = jnp.max(pos) == kv_len - 1
        row = jnp.maximum(kv_len - 1, 0)
        jr = row // block_s
        rm = jax.lax.rem(row, block_s)
        wr = (rm // 8) * 8             # window start inside the block
        ws = (rm // LANES) * LANES
        off_r = jax.lax.rem(row, 8)
        off_s = jax.lax.rem(row, LANES)

        @pl.when(j == jr)
        def _append_new():
            kn = knew_ref[0].reshape(hb, d_)           # f32
            vn = vnew_ref[0].reshape(hb, d_)
            ksc = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1, keepdims=True),
                              KV_SCALE_EPS) / 127.0    # [hb, 1]
            vsc = jnp.maximum(jnp.max(jnp.abs(vn), axis=-1, keepdims=True),
                              KV_SCALE_EPS) / 127.0
            kq = jnp.clip(jnp.round(kn / ksc), -127.0, 127.0)
            vq = jnp.clip(jnp.round(vn / vsc), -127.0, 127.0)
            if paged:
                kold = k_ref[0, :, 0, pl.ds(wr, 8), :].reshape(
                    hb, 8, d_).astype(jnp.float32)
                vold = v_ref[0, :, 0, pl.ds(wr, 8), :].reshape(
                    hb, 8, d_).astype(jnp.float32)
            else:
                kold = k_ref[0, 0, :, pl.ds(wr, 8), :].reshape(
                    hb, 8, d_).astype(jnp.float32)
                vold = v_ref[0, 0, :, pl.ds(wr, 8), :].reshape(
                    hb, 8, d_).astype(jnp.float32)
            rsel = jnp.logical_and(
                jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == off_r,
                ok)
            kwin = jnp.where(rsel, kq[:, None, :], kold)
            vwin = jnp.where(rsel, vq[:, None, :], vold)
            kout_ref[...] = kwin.astype(kout_ref.dtype).reshape(
                kout_ref.shape)
            vout_ref[...] = vwin.astype(vout_ref.dtype).reshape(
                vout_ref.shape)
            if paged:
                ksold = ks_ref[0, :, 0, 0, pl.ds(ws, LANES)].reshape(
                    hb, LANES).astype(jnp.float32)
                vsold = vs_ref[0, :, 0, 0, pl.ds(ws, LANES)].reshape(
                    hb, LANES).astype(jnp.float32)
            else:
                ksold = ks_ref[0, 0, :, pl.ds(ws, LANES)].reshape(
                    hb, LANES).astype(jnp.float32)
                vsold = vs_ref[0, 0, :, pl.ds(ws, LANES)].reshape(
                    hb, LANES).astype(jnp.float32)
            lsel = jnp.logical_and(
                jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1) == off_s, ok)
            kswin = jnp.where(lsel, ksc, ksold)
            vswin = jnp.where(lsel, vsc, vsold)
            ksout_ref[...] = kswin.astype(ksout_ref.dtype).reshape(
                ksout_ref.shape)
            vsout_ref[...] = vswin.astype(vsout_ref.dtype).reshape(
                vsout_ref.shape)

    run = (j * block_s) < kv_len_cache
    if causal:
        run = jnp.logical_and(run, (j * block_s) <= jnp.max(pos))

    @pl.when(run)
    def _block():
        br, d = q_ref.shape[2], q_ref.shape[3]
        kc_all = k_ref[...].reshape(hb, block_s, d)
        vc_all = v_ref[...].reshape(hb, block_s, d)
        ks_all = (ks_ref[...].reshape(hb, block_s).astype(jnp.float32)
                  if quantized else None)
        vs_all = (vs_ref[...].reshape(hb, block_s).astype(jnp.float32)
                  if quantized else None)
        col = jax.lax.broadcasted_iota(jnp.int32, (br, block_s), 1) + (
            j * block_s
        )
        valid = col < kv_len_cache
        if causal:
            valid = jnp.logical_and(valid, col <= pos)
        maskadd = jnp.where(valid, 0.0, MASK_VALUE)
        for hh in range(hb):
            if quantized and FLASH_INT8_DOT:
                # int8 MXU path: K stays int8 (no per-element convert of
                # the [BS, D] block); q rows quantize to int8 with a per-
                # row scale folded back into s
                qf = q_ref[0, hh].astype(jnp.float32)  # [BR, D]
                qsc = jnp.maximum(
                    jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                    1e-6) / 127.0                      # [BR, 1]
                qi = jnp.clip(jnp.round(qf / qsc),
                              -127.0, 127.0).astype(jnp.int8)
                s = jax.lax.dot_general(
                    qi, kc_all[hh],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * qsc            # [BR, BS]
                s = s * ks_all[hh][None, :]
            else:
                q = q_ref[0, hh].astype(jnp.bfloat16)  # [BR, D]
                s = jax.lax.dot_general(
                    q, kc_all[hh].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # [BR, BS]
                if quantized:
                    s = s * ks_all[hh][None, :]
            s = s * sm_scale
            if softcap > 0.0:
                s = softcap * jnp.tanh(s / softcap)
            if use_alibi:
                slope = slope_ref[hh]                  # [BR, 1]
                s = s + slope * (col.astype(jnp.float32)
                                 - pos.astype(jnp.float32))
            s = s + maskadd

            m_prev = m_ref[hh]                         # [BR, LANES]
            l_prev = l_ref[hh]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_ref[hh] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[hh] = m_next
            if quantized:
                p = p * vs_all[hh][None, :]
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vc_all[hh].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[hh] = acc_ref[hh] * alpha[:, :1] + pv

    @pl.when(j == n_s - 1)
    def _finalize():
        for hh in range(hb):
            l = l_ref[hh][:, :1]
            inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, hh] = (acc_ref[hh] * inv).astype(o_ref.dtype)


def _mha_packed_hblk(q4, k, v, k_scale_t, v_scale_t, pos_rows, slope_rows,
                     kv_lens, *, use_alibi, quantized, scale, causal,
                     softcap, out_dtype, block_s, interpret, layer, hb, rp,
                     n_s, extra_kv=None, fused_append=False):
    """Head-blocked decode launcher: grid (B, Hkv/HB, 1, S/BS).

    `extra_kv`: (k_new, v_new) [B, Hkv, 1, D] — the current token's
    UNSTORED key/value (deferred KV append): the kernel seeds its online
    softmax from these operands so the cache write leaves the critical
    path (BENCH_NOTES round-3 closing profile: the per-layer append
    windows' DMA latency was 8% of the decode step).

    `fused_append`: additionally ALIAS the cache k/v/scale buffers as
    outputs and write the new token's quantized row + scale column from
    inside the kernel through single-row out blocks — the four separate
    per-layer RMW append dispatches (and their serialized ~5.5us DMAs)
    disappear entirely.  Requires `extra_kv`, `quantized` and the stacked
    cache (`layer`).  Returns (o, k', v', ks', vs') instead of o."""
    b, hkv, _, d = q4.shape
    grid = (b, hkv // hb, 1, n_s)
    if layer is None:
        kv_spec = pl.BlockSpec((1, hb, block_s, d),
                               lambda bi, h, r, j, *_: (bi, h, j, 0))
        sc_spec = pl.BlockSpec((1, hb, block_s),
                               lambda bi, h, r, j, *_: (bi, h, j))
    else:
        kv_spec = pl.BlockSpec(
            (1, 1, hb, block_s, d),
            lambda bi, h, r, j, *_: (layer, bi, h, j, 0))
        sc_spec = pl.BlockSpec(
            (1, 1, hb, block_s),
            lambda bi, h, r, j, *_: (layer, bi, h, j))
    in_specs = [
        pl.BlockSpec((1, rp, 1), lambda bi, h, r, j, *_: (bi, 0, 0)),   # pos
        pl.BlockSpec((hb, rp, 1), lambda bi, h, r, j, *_: (h, 0, 0)),   # slope
        pl.BlockSpec((1, hb, rp, d),
                     lambda bi, h, r, j, *_: (bi, h, 0, 0)),            # q
        kv_spec,                                                        # k
        kv_spec,                                                        # v
    ]
    args = [pos_rows, slope_rows, q4, k, v]
    if extra_kv is not None:
        new_spec = pl.BlockSpec((1, hb, 1, d),
                                lambda bi, h, r, j, *_: (bi, h, 0, 0))
        in_specs += [new_spec, new_spec]
        args += [extra_kv[0], extra_kv[1]]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale_t, v_scale_t]
    if fused_append:
        assert quantized and extra_kv is not None and layer is not None

        def _row(lens, bi):
            return jnp.maximum(lens[bi] - 1, 0)

        # Mosaic minimum block extents: 8 sublanes (KV rows) / 128 lanes
        # (scale columns).  row <= S-1 and S % 128 == 0 keep the window
        # indices in range without clipping.
        krow_spec = pl.BlockSpec(
            (1, 1, hb, 8, d),
            lambda bi, h, r, j, lens: (layer, bi, h, _row(lens, bi) // 8,
                                       0))
        srow_spec = pl.BlockSpec(
            (1, 1, hb, LANES),
            lambda bi, h, r, j, lens: (layer, bi, h,
                                       _row(lens, bi) // LANES))
        # NOTE: the old-window values are sliced from the streamed KV
        # blocks inside the kernel — the cache must NOT be passed a
        # second time, or XLA copies the whole cache per layer to honor
        # the input_output alias (the round-3 regression).
    kernel = functools.partial(
        _mha_kernel_hblk,
        quantized=quantized,
        causal=causal,
        use_alibi=use_alibi,
        softcap=softcap,
        sm_scale=scale,
        block_s=block_s,
        n_s=n_s,
        hb=hb,
        extra_kv=extra_kv is not None,
        fused_append=fused_append,
    )
    kv_bytes = hb * block_s * d * (1 if quantized else 2)
    cost = pl.CostEstimate(
        flops=2 * 2 * b * hkv * rp * n_s * block_s * d,
        bytes_accessed=b * (hkv // hb) * n_s * (2 * kv_bytes)
        + b * hkv * rp * d * 4,
        transcendentals=b * hkv * rp * n_s * block_s,
    )
    cparams = dict(
        dimension_semantics=("parallel", "parallel", "parallel",
                             "arbitrary"),
    )
    if hb > 8:
        # the default 16MB scoped-vmem stack overflows by ~200KB at
        # hb=16 ctx2048 (measured 2026-08-19) — raise it for the
        # NST_FLASH_HB sweep configurations only
        cparams["vmem_limit_bytes"] = 64 * 1024 * 1024
    out_specs = pl.BlockSpec(
        (1, hb, rp, d), lambda bi, h, r, j, *_: (bi, h, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, hkv, rp, d), out_dtype)
    aliases = {}
    if fused_append:
        out_specs = (out_specs, krow_spec, krow_spec, srow_spec, srow_spec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(k_scale_t.shape, k_scale_t.dtype),
            jax.ShapeDtypeStruct(v_scale_t.shape, v_scale_t.dtype),
        )
        # flat input order: kv_lens, pos, slope, q4, k, v, knew, vnew,
        # ks, vs -> alias the full cache operands onto outputs 1-4
        # (true in-place row writes; each cache array appears exactly
        # once, so the alias is copy-free)
        aliases = {4: 1, 5: 2, 8: 3, 9: 4}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hb, rp, LANES), jnp.float32),   # m
                pltpu.VMEM((hb, rp, LANES), jnp.float32),   # l
                pltpu.VMEM((hb, rp, d), jnp.float32),       # acc
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(**cparams),
        cost_estimate=cost,
        input_output_aliases=aliases,
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), *args)
    return res


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "softcap", "out_dtype", "block_s",
                     "interpret", "layer", "fused_append"),
)
def _mha_packed(
    q4: jax.Array,                # [B, Hkv, Rp, D] bf16
    k: jax.Array,                 # [(L,) B, Hkv, S, D] (fp or int8)
    v: jax.Array,
    k_scale_t: Optional[jax.Array],   # [(L,) B, Hkv, S] f32 or None
    v_scale_t: Optional[jax.Array],
    pos_rows: jax.Array,          # [B, Rp, 1] int32
    slope_rows: Optional[jax.Array],  # [Hkv, Rp, 1] f32 or None
    kv_lens: jax.Array,           # [B] int32
    *,
    scale: float,
    causal: bool,
    softcap: float,
    out_dtype,
    block_s: int,
    interpret: bool,
    layer: Optional[int] = None,  # layer index when k/v carry the full
                                  # stacked cache (avoids XLA materializing
                                  # a per-layer slice copy before the call)
    k_new: Optional[jax.Array] = None,  # [B, Hkv, 1, D] deferred-append
    v_new: Optional[jax.Array] = None,  # token (decode hblk path only)
    fused_append: bool = False,         # in-kernel cache append (aliased)
):
    b, hkv, rp, d = q4.shape
    s = k.shape[-2]
    quantized = k_scale_t is not None
    use_alibi = slope_rows is not None
    # q-row block (prefill): NST_FLASH_BR sweeps it.  Round-4 on-chip
    # sweep at 7B prefill@1975 (BR/BS -> ms): 256/1024 = 270 (default,
    # best), 256/2048 = 272, 256/512 = 283, 128/1024 = 286, 128/512 =
    # 298, 256/256 = 306, 128/256 = 338 — larger tiles win (grid-cell
    # overhead dominates, NOT vreg pressure from the [BR, BS] f32
    # score tile).
    br = min(rp, FLASH_BR)
    n_s = s // block_s

    if slope_rows is None:
        slope_rows = jnp.zeros((hkv, rp, 1), jnp.float32)

    grid = (b, hkv, rp // br, n_s)
    # index maps get the scalar-prefetch ref(s) appended after grid indices
    h_blk = 1
    for cand in (8, 4, 2, 1):
        if hkv % cand == 0:
            h_blk = cand
            break
    # decode head-block size: 8 measured best at B=32 (BENCH_NOTES head-
    # blocked entry); NST_FLASH_HB sweeps 16/32 — fewer, larger DMAs per
    # program, the remaining decode-MHA lever at B=1 (73% of the KV-read
    # roofline).  Only the decode (rp <= 8) launcher is affected.
    hb_max = FLASH_HB_MAX
    hb = 1
    for cand in (32, 16, 8, 4, 2, 1):
        if cand <= hb_max and hkv % cand == 0:
            hb = cand
            break
    if rp <= 8 and hb > 1:
        return _mha_packed_hblk(
            q4, k, v, k_scale_t, v_scale_t, pos_rows, slope_rows, kv_lens,
            use_alibi=use_alibi, quantized=quantized, scale=scale,
            causal=causal, softcap=softcap, out_dtype=out_dtype,
            block_s=block_s, interpret=interpret, layer=layer, hb=hb,
            rp=rp, n_s=n_s,
            extra_kv=(None if k_new is None else (k_new, v_new)),
            fused_append=fused_append)
    assert k_new is None, "extra_kv needs the head-blocked decode launcher"
    if layer is None:
        kv_spec = pl.BlockSpec((1, 1, block_s, d),
                               lambda bi, h, r, j, *_: (bi, h, j, 0))
        sc_spec = pl.BlockSpec(
            (1, h_blk, block_s),
            lambda bi, h, r, j, *_: (bi, h // h_blk, j))
    else:
        kv_spec = pl.BlockSpec(
            (1, 1, 1, block_s, d),
            lambda bi, h, r, j, *_: (layer, bi, h, j, 0))
        sc_spec = pl.BlockSpec(
            (1, 1, h_blk, block_s),
            lambda bi, h, r, j, *_: (layer, bi, h // h_blk, j))
    in_specs = [
        pl.BlockSpec((1, br, 1), lambda bi, h, r, j, *_: (bi, r, 0)),    # pos
        pl.BlockSpec((1, br, 1), lambda bi, h, r, j, *_: (h, r, 0)),     # slope
        pl.BlockSpec((1, 1, br, d),
                     lambda bi, h, r, j, *_: (bi, h, r, 0)),             # q
        kv_spec,                                                         # k
        kv_spec,                                                         # v
    ]
    args = [pos_rows, slope_rows, q4, k, v]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale_t, v_scale_t]

    kernel = functools.partial(
        _mha_kernel,
        quantized=quantized,
        causal=causal,
        use_alibi=use_alibi,
        softcap=softcap,
        sm_scale=scale,
        block_s=block_s,
        n_s=n_s,
        h_blk=h_blk,
    )
    kv_bytes = block_s * d * (1 if quantized else 2)
    cost = pl.CostEstimate(
        flops=2 * 2 * b * hkv * rp * s * d,
        bytes_accessed=b * hkv * n_s * (2 * kv_bytes) + b * hkv * rp * d * 4,
        transcendentals=b * hkv * rp * s,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, br, d), lambda bi, h, r, j, *_: (bi, h, r, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((br, LANES), jnp.float32),   # m
                pltpu.VMEM((br, LANES), jnp.float32),   # l
                pltpu.VMEM((br, d), jnp.float32),       # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rp, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), *args)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "softcap", "out_dtype", "block_s",
                     "interpret", "layer"),
)
def _mha_packed_nat(
    q: jax.Array,                 # [B, T, H, D] bf16 — NATURAL layout
    k: jax.Array,                 # [(L,) B, Hkv, S, D]
    v: jax.Array,
    k_scale_t: Optional[jax.Array],
    v_scale_t: Optional[jax.Array],
    positions: jax.Array,         # [B, T, 1] int32
    slopes: Optional[jax.Array],  # [Hkv, n_rep] f32 or None
    kv_lens: jax.Array,
    *,
    scale: float,
    causal: bool,
    softcap: float,
    out_dtype,
    block_s: int,
    interpret: bool,
    layer: Optional[int] = None,
):
    """Prefill launcher over q/out in their NATURAL [B, T, H, D] layout:
    the q block [1, BT, n_rep, D] spans one KV-head group's heads for BT
    tokens (row = t*n_rep + g inside the kernel — row order is free in
    attention, so outputs are bit-identical per (b, t, h) to the packed
    launcher's).  Removes the [B,T,H,D]->[B,Hkv,R,D] q-pack and the
    inverse out-unpack — two full-tensor relayout copies per layer that
    the round-4 prefill decomposition charged to 'glue'."""
    b, t, h, d = q.shape
    hkv = k.shape[-3]
    n_rep = h // hkv
    s = k.shape[-2]
    quantized = k_scale_t is not None
    use_alibi = slopes is not None
    bt = max(FLASH_BR // n_rep, 8)
    br = bt * n_rep
    n_s = s // block_s
    grid = (b, hkv, t // bt, n_s)
    h_blk = 1
    for cand in (8, 4, 2, 1):
        if hkv % cand == 0:
            h_blk = cand
            break
    if slopes is None:
        slopes = jnp.zeros((hkv, n_rep), jnp.float32)
    if layer is None:
        kv_spec = pl.BlockSpec((1, 1, block_s, d),
                               lambda bi, hh, r, j, *_: (bi, hh, j, 0))
        sc_spec = pl.BlockSpec(
            (1, h_blk, block_s),
            lambda bi, hh, r, j, *_: (bi, hh // h_blk, j))
    else:
        kv_spec = pl.BlockSpec(
            (1, 1, 1, block_s, d),
            lambda bi, hh, r, j, *_: (layer, bi, hh, j, 0))
        sc_spec = pl.BlockSpec(
            (1, 1, h_blk, block_s),
            lambda bi, hh, r, j, *_: (layer, bi, hh // h_blk, j))
    in_specs = [
        pl.BlockSpec((1, bt, 1), lambda bi, hh, r, j, *_: (bi, r, 0)),
        pl.BlockSpec((1, n_rep), lambda bi, hh, r, j, *_: (hh, 0)),
        pl.BlockSpec((1, bt, n_rep, d),
                     lambda bi, hh, r, j, *_: (bi, r, hh, 0)),
        kv_spec,
        kv_spec,
    ]
    args = [positions, slopes, q, k, v]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale_t, v_scale_t]
    kernel = functools.partial(
        _mha_kernel,
        quantized=quantized,
        causal=causal,
        use_alibi=use_alibi,
        softcap=softcap,
        sm_scale=scale,
        block_s=block_s,
        n_s=n_s,
        h_blk=h_blk,
        nat_rep=n_rep,
    )
    kv_bytes = block_s * d * (1 if quantized else 2)
    cost = pl.CostEstimate(
        flops=2 * 2 * b * h * t * s * d,
        bytes_accessed=b * hkv * n_s * (2 * kv_bytes) + b * h * t * d * 4,
        transcendentals=b * h * t * s,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bt, n_rep, d), lambda bi, hh, r, j, *_: (bi, r, hh, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((br, LANES), jnp.float32),   # m
                pltpu.VMEM((br, LANES), jnp.float32),   # l
                pltpu.VMEM((br, d), jnp.float32),       # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), *args)
    return out


def extra_kv_eligible(t: int, n_heads: int, n_kv_heads: int) -> bool:
    """Single source of truth for when the deferred-append extra-kv column
    of the head-blocked decode kernel engages: all packed GQA rows must fit
    one decode program (rp <= 8) and the launcher must head-block (hb > 1
    — `_mha_packed` asserts extra_kv rides the hblk path).  Callers
    (`mha` here, `transformer._defer_append`) must consult THIS predicate
    instead of re-encoding the constraints (VERDICT r3 weak#6: duplicated
    gates drift and silently send decode to the fallback)."""
    if t * (n_heads // n_kv_heads) > 8:
        return False
    hb_max = FLASH_HB_MAX
    hb = 1
    for cand in (32, 16, 8, 4, 2):
        if cand <= hb_max and n_kv_heads % cand == 0:
            hb = cand
            break
    return hb > 1


def mha(
    q: jax.Array,                     # [B, T, H, D]
    k: jax.Array,                     # [B, Hkv, S, D] fp or int8 codes —
                                      # or the full stacked cache
                                      # [L, B, Hkv, S, D] with `layer` set
    v: jax.Array,
    k_scale: Optional[jax.Array],     # [B, Hkv, S] ([L, B, Hkv, S]) f32
    v_scale: Optional[jax.Array],
    q_positions: jax.Array,           # [B, T] int32
    kv_lens: jax.Array,               # [B] int32
    *,
    scale: float,
    causal: bool = True,
    alibi: Optional[jax.Array] = None,    # [H] slopes
    logit_softcap: float = 0.0,
    out_dtype=None,
    layer: Optional[int] = None,
    extra_kv=None,                    # (k_new, v_new) [B, 1, Hkv, D] fp —
                                      # deferred-append current token
    fused_append: bool = False,       # ALSO write the quantized new row +
                                      # scale into the (aliased) cache from
                                      # inside the kernel; returns
                                      # (out, (k', v', ks', vs'))
):
    """Flash attention entry (K/V in the cache's [B, Hkv, S, D] layout).
    Passing the stacked 5-D cache with `layer` lets the kernel read the
    layer's blocks straight from the full buffer (XLA would otherwise copy
    the layer out before a custom call).  Returns None if the shape is
    unsupported (caller falls back to the XLA reference path)."""
    b, t, h, d = q.shape
    hkv, s = k.shape[-3], k.shape[-2]
    if not _supported(d, s):
        warn_fallback("mha", d, s)
        return None
    if extra_kv is not None and not extra_kv_eligible(t, h, hkv):
        return None  # deferred append rides the head-blocked decode path
    if fused_append and not (extra_kv is not None and layer is not None
                             and k_scale is not None):
        return None  # fused append needs the quantized stacked cache
    n_rep = h // hkv
    r = n_rep * t
    # pad rows to a block multiple: tiny counts to a sublane multiple,
    # larger ones to the 256-row block the launcher tiles with
    rp = _round_up(r, 8) if r <= 256 else _round_up(r, 256)
    out_dtype = out_dtype or q.dtype

    # NATURAL-layout prefill (round 5): when the token count tiles the
    # row block exactly, q/out stay [B, T, H, D] — no q-pack/out-unpack
    # relayouts (prefill glue).  Exact: row order inside a block is free.
    bt_nat = max(FLASH_BR // n_rep, 8)
    # default OFF until the Mosaic compile + perf A/B run on the real
    # chip (interpret mode can't catch Mosaic layout restrictions on the
    # strided [1, BT, n_rep, D] q blocks); bit-identity vs the packed
    # launcher is already certified (test_prefill_natural_layout_*)
    if (r > 8 and extra_kv is None and not fused_append
            and t % bt_nat == 0 and FLASH_BR % n_rep == 0
            and os.environ.get("NST_FLASH_NATQ", "0") != "0"):
        bs_target = FLASH_PREFILL_BS
        block_sn = 128
        for cand in (2048, 1024, 512, 256, 128):
            if cand <= bs_target and s % cand == 0:
                block_sn = cand
                break
        slopes_nat = None
        if alibi is not None:
            slopes_nat = alibi.astype(jnp.float32).reshape(hkv, n_rep)
        return _mha_packed_nat(
            q.astype(jnp.bfloat16), k, v, k_scale, v_scale,
            q_positions.astype(jnp.int32)[..., None], slopes_nat, kv_lens,
            scale=float(scale), causal=causal,
            softcap=float(logit_softcap), out_dtype=out_dtype,
            block_s=block_sn, interpret=flash_mode() == "interpret",
            layer=layer,
        )

    # pack GQA rows: [B,T,H,D] -> [B,Hkv,n_rep*T,D], row = g*T + t
    q4 = q.reshape(b, t, hkv, n_rep, d).transpose(0, 2, 3, 1, 4)
    q4 = q4.reshape(b, hkv, r, d).astype(jnp.bfloat16)
    pos_rows = jnp.tile(q_positions.astype(jnp.int32), (1, n_rep))  # [B, R]
    if rp != r:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, rp - r), (0, 0)))
        pos_rows = jnp.pad(pos_rows, ((0, 0), (0, rp - r)),
                           constant_values=-1)
    pos_rows = pos_rows[..., None]                                   # [B,Rp,1]

    slope_rows = None
    if alibi is not None:
        sl = jnp.broadcast_to(
            alibi.astype(jnp.float32).reshape(hkv, n_rep, 1), (hkv, n_rep, t)
        ).reshape(hkv, r)
        if rp != r:
            sl = jnp.pad(sl, ((0, 0), (0, rp - r)))
        slope_rows = sl[..., None]

    # scales pass through in the cache's [..., Hkv, S] layout untouched
    k_scale_t = k_scale
    v_scale_t = v_scale

    # decode (tiny R): large KV blocks minimize grid-cell overhead (the
    # whole cache streams through either way); prefill: 512 balances VMEM
    # against the S^2 score tile.  NST_FLASH_BS overrides the decode
    # block target for on-chip sweeps (the GEMV kernel-lab lesson was
    # that DEEP fine-grained pipelines beat fewer large DMAs — decode
    # MHA at 73% of the KV roofline may be leaving the same win).
    if rp <= 8:
        bs_default = 2048 if k.dtype == jnp.int8 else 1024
        bs_target = int(FLASH_BS_OVERRIDE or bs_default)
    else:
        bs_target = FLASH_PREFILL_BS
    block_s = 128
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= bs_target and s % cand == 0:
            block_s = cand
            break
    interpret = flash_mode() == "interpret"

    k_new = v_new = None
    if extra_kv is not None:
        # [B, 1, Hkv, D] -> [B, Hkv, 1, D] f32 operands (f32 keeps the
        # kernel's seed math cast-free — Mosaic verifier constraint)
        k_new = extra_kv[0].transpose(0, 2, 1, 3).astype(jnp.float32)
        v_new = extra_kv[1].transpose(0, 2, 1, 3).astype(jnp.float32)

    out = _mha_packed(
        q4, k, v, k_scale_t, v_scale_t, pos_rows, slope_rows, kv_lens,
        scale=float(scale), causal=causal, softcap=float(logit_softcap),
        out_dtype=out_dtype, block_s=block_s, interpret=interpret,
        layer=layer, k_new=k_new, v_new=v_new, fused_append=fused_append,
    )
    cache_out = None
    if fused_append:
        out, *cache_out = out
    out = out[:, :, :r].reshape(b, hkv, n_rep, t, d)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d)
    if fused_append:
        return out, tuple(cache_out)
    return out


def flash_attention(q, k, v, q_positions, kv_lens, *, scale=None, causal=True,
                    alibi=None, logit_softcap=0.0, out_dtype=None):
    """Drop-in for attention_ref over fp K/V in [B, S, Hkv, D] layout
    (ops/attention.py dispatch)."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    out = mha(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), None, None,
              q_positions, kv_lens, scale=scale, causal=causal, alibi=alibi,
              logit_softcap=logit_softcap, out_dtype=out_dtype)
    if out is None:
        raise NotImplementedError("unsupported shape for flash kernel")
    return out


# ---------------------------------------------------------------------------
# paged variant: the page table is scalar-prefetched and the KV block index
# map resolves logical block j -> physical page (boom guide paged attention,
# without manual DMA: the BlockSpec indirection IS the page gather)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "softcap", "out_dtype", "interpret",
                     "layer"),
)
def _mha_paged(
    q4: jax.Array,                # [B, Hkv, Rp, D] bf16
    k_pages: jax.Array,           # [L, Hkv, P, ps, D]
    v_pages: jax.Array,
    k_scale: Optional[jax.Array],     # [L, Hkv, P, 1, ps] f32 or None
    v_scale: Optional[jax.Array],
    page_tables: jax.Array,       # [B, n_blocks] int32
    pos_rows: jax.Array,          # [B, Rp, 1] int32
    slope_rows: Optional[jax.Array],
    kv_lens: jax.Array,           # [B] int32
    *,
    scale: float,
    causal: bool,
    softcap: float,
    out_dtype,
    interpret: bool,
    layer: int,
):
    b, hkv, rp, d = q4.shape
    ps = k_pages.shape[3]
    n_blocks = page_tables.shape[1]
    quantized = k_scale is not None
    use_alibi = slope_rows is not None
    br = min(rp, 256)
    if slope_rows is None:
        slope_rows = jnp.zeros((hkv, rp, 1), jnp.float32)

    grid = (b, hkv, rp // br, n_blocks)
    # prefetch arg order: (kv_lens, page_tables); index maps receive them
    kv_spec = pl.BlockSpec(
        (1, 1, 1, ps, d),
        lambda bi, h, r, j, lens, tbl: (layer, h, tbl[bi, j], 0, 0),
    )
    sc_spec = pl.BlockSpec(
        (1, 1, 1, 1, ps),
        lambda bi, h, r, j, lens, tbl: (layer, h, tbl[bi, j], 0, 0),
    )
    in_specs = [
        pl.BlockSpec((1, br, 1), lambda bi, h, r, j, *_: (bi, r, 0)),
        pl.BlockSpec((1, br, 1), lambda bi, h, r, j, *_: (h, r, 0)),
        pl.BlockSpec((1, 1, br, d), lambda bi, h, r, j, *_: (bi, h, r, 0)),
        kv_spec,
        kv_spec,
    ]
    args = [pos_rows, slope_rows, q4, k_pages, v_pages]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale, v_scale]

    def kernel(kvlen_ref, table_ref, *rest):
        # table_ref is consumed by the index maps only
        _mha_kernel(kvlen_ref, *rest, quantized=quantized, causal=causal,
                    use_alibi=use_alibi, softcap=softcap, sm_scale=scale,
                    block_s=ps, n_s=n_blocks, h_blk=1)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, br, d), lambda bi, h, r, j, *_: (bi, h, r, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((br, LANES), jnp.float32),
                pltpu.VMEM((br, LANES), jnp.float32),
                pltpu.VMEM((br, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rp, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), page_tables.astype(jnp.int32), *args)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "softcap", "out_dtype", "interpret",
                     "layer", "hb", "fused_append"),
)
def _mha_paged_hblk(
    q4: jax.Array,                # [B, Hkv, Rp, D] bf16 (Rp <= 8)
    k_pages: jax.Array,           # [L, Hkv, P, ps, D]
    v_pages: jax.Array,
    k_scale: Optional[jax.Array],     # [L, Hkv, P, 1, ps] or None
    v_scale: Optional[jax.Array],
    page_tables: jax.Array,       # [B, n_blocks] int32
    pos_rows: jax.Array,          # [B, Rp, 1] int32
    slope_rows: Optional[jax.Array],
    kv_lens: jax.Array,           # [B] int32
    *,
    scale: float,
    causal: bool,
    softcap: float,
    out_dtype,
    interpret: bool,
    layer: int,
    hb: int,
    k_new: Optional[jax.Array] = None,  # [B, Hkv, 1, D] f32
    v_new: Optional[jax.Array] = None,
    fused_append: bool = False,
):
    """Head-blocked PAGED decode launcher — the paged twin of
    `_mha_packed_hblk`: HB KV heads per program (heads share the slot's
    page table, so one (HB x ps x D) DMA per page), deferred-append
    extra-kv seeding, and optional FUSED in-kernel append whose aliased
    out windows resolve the physical page through the scalar-prefetched
    table (the paged analogue of the contiguous fused append that won
    +13.5% at B=16)."""
    b, hkv, rp, d = q4.shape
    ps = k_pages.shape[3]
    n_blocks = page_tables.shape[1]
    quantized = k_scale is not None
    use_alibi = slope_rows is not None
    if slope_rows is None:
        slope_rows = jnp.zeros((hkv, rp, 1), jnp.float32)

    grid = (b, hkv // hb, 1, n_blocks)
    kv_spec = pl.BlockSpec(
        (1, hb, 1, ps, d),
        lambda bi, h, r, j, lens, tbl: (layer, h, tbl[bi, j], 0, 0),
    )
    sc_spec = pl.BlockSpec(
        (1, hb, 1, 1, ps),
        lambda bi, h, r, j, lens, tbl: (layer, h, tbl[bi, j], 0, 0),
    )
    in_specs = [
        pl.BlockSpec((1, rp, 1), lambda bi, h, r, j, *_: (bi, 0, 0)),
        pl.BlockSpec((hb, rp, 1), lambda bi, h, r, j, *_: (h, 0, 0)),
        pl.BlockSpec((1, hb, rp, d),
                     lambda bi, h, r, j, *_: (bi, h, 0, 0)),
        kv_spec,
        kv_spec,
    ]
    args = [pos_rows, slope_rows, q4, k_pages, v_pages]
    if k_new is not None:
        new_spec = pl.BlockSpec((1, hb, 1, d),
                                lambda bi, h, r, j, *_: (bi, h, 0, 0))
        in_specs += [new_spec, new_spec]
        args += [k_new, v_new]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale, v_scale]
    n_prefetch = 2
    if fused_append:
        assert quantized and k_new is not None
        # Window-target vector [B, 3] = (physical page, 8-row block,
        # 128-lane block), PRECOMPUTED outside the kernel: active slots
        # target their own tail page; spectators park on the reserved
        # TRASH page (pool row P-1) — their table rows may alias pages
        # now owned by OTHER slots (released/rebuilt tables), and a
        # stale window write-back racing the owner's patch would corrupt
        # it.  Identical semantics to pkv.append_decode's trash parking.
        row = jnp.maximum(kv_lens - 1, 0).astype(jnp.int32)       # [B]
        act = pos_rows[:, 0, 0].astype(jnp.int32) == (
            kv_lens.astype(jnp.int32) - 1)
        trash = k_pages.shape[2] - 1  # reserved trash page
        phys = jnp.take_along_axis(
            page_tables.astype(jnp.int32), (row // ps)[:, None],
            axis=1)[:, 0]
        win_idx = jnp.stack([
            jnp.where(act, phys, trash),
            jnp.where(act, jax.lax.rem(row, ps) // 8, 0),
            jnp.where(act, jax.lax.rem(row, ps) // LANES, 0),
        ], axis=1)
        n_prefetch = 3

        krow_spec = pl.BlockSpec(
            (1, hb, 1, 8, d),
            lambda bi, h, r, j, lens, tbl, win: (
                layer, h, win[bi, 0], win[bi, 1], 0))
        srow_spec = pl.BlockSpec(
            (1, hb, 1, 1, LANES),
            lambda bi, h, r, j, lens, tbl, win: (
                layer, h, win[bi, 0], 0, win[bi, 2]))
        # the streaming/pos/q/new specs must accept the extra prefetch
        # ref (they take *_, so only kv/sc_spec need rebinding)
        kv_spec = pl.BlockSpec(
            (1, hb, 1, ps, d),
            lambda bi, h, r, j, lens, tbl, win: (layer, h, tbl[bi, j],
                                                 0, 0))
        sc_spec = pl.BlockSpec(
            (1, hb, 1, 1, ps),
            lambda bi, h, r, j, lens, tbl, win: (layer, h, tbl[bi, j],
                                                 0, 0))
        in_specs[3] = kv_spec
        in_specs[4] = kv_spec
        in_specs[-2] = sc_spec
        in_specs[-1] = sc_spec

    def kernel(kvlen_ref, table_ref, *rest):
        # table_ref (and win_idx when fused) feed the index maps only
        if n_prefetch == 3:
            _win_ref, *rest = rest
        _mha_kernel_hblk(kvlen_ref, *rest, quantized=quantized,
                         causal=causal, use_alibi=use_alibi,
                         softcap=softcap, sm_scale=scale, block_s=ps,
                         n_s=n_blocks, hb=hb, extra_kv=k_new is not None,
                         fused_append=fused_append, paged=True)

    out_specs = pl.BlockSpec(
        (1, hb, rp, d), lambda bi, h, r, j, *_: (bi, h, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, hkv, rp, d), out_dtype)
    aliases = {}
    if fused_append:
        out_specs = (out_specs, krow_spec, krow_spec, srow_spec, srow_spec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        )
        # flat inputs: lens, tables, pos, slope, q4, k, v, knew, vnew,
        # ks, vs -> pool arrays appear exactly once; copy-free alias
        aliases = {5: 1, 6: 2, 9: 3, 10: 4}
    prefetch_args = [kv_lens.astype(jnp.int32),
                     page_tables.astype(jnp.int32)]
    if n_prefetch == 3:
        prefetch_args.append(win_idx.astype(jnp.int32))
        # alias indices shift by the extra prefetch operand
        aliases = {k + 1: v for k, v in aliases.items()}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hb, rp, LANES), jnp.float32),
                pltpu.VMEM((hb, rp, LANES), jnp.float32),
                pltpu.VMEM((hb, rp, d), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*prefetch_args, *args)
    return res


def mha_paged(q, cache, layer: int, q_positions, kv_lens, *, scale,
              causal=True, alibi=None, logit_softcap=0.0, out_dtype=None,
              extra_kv=None, fused_append: bool = False):
    """Flash attention over a PagedKVCache layer.  Same GQA row packing as
    `mha`; KV blocks stream page by page via the prefetched page table.
    `extra_kv`/`fused_append`: deferred / in-kernel paged append (decode
    only — see `_mha_paged_hblk`); fused returns (out, (k', v', ks', vs'))."""
    b, t, h, d = q.shape
    hkv = cache.kv_heads
    if not _head_dim_ok(d) or cache.page_size % 128:
        warn_fallback("mha_paged", d, cache.page_size)
        return None
    if extra_kv is not None and not extra_kv_eligible(t, h, hkv):
        return None
    if fused_append and (extra_kv is None or cache.k_scale is None):
        return None
    n_rep = h // hkv
    r = n_rep * t
    rp = _round_up(r, 8) if r <= 256 else _round_up(r, 256)
    out_dtype = out_dtype or q.dtype

    q4 = q.reshape(b, t, hkv, n_rep, d).transpose(0, 2, 3, 1, 4)
    q4 = q4.reshape(b, hkv, r, d).astype(jnp.bfloat16)
    pos_rows = jnp.tile(q_positions.astype(jnp.int32), (1, n_rep))
    if rp != r:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, rp - r), (0, 0)))
        pos_rows = jnp.pad(pos_rows, ((0, 0), (0, rp - r)),
                           constant_values=-1)
    pos_rows = pos_rows[..., None]

    slope_rows = None
    if alibi is not None:
        sl = jnp.broadcast_to(
            alibi.astype(jnp.float32).reshape(hkv, n_rep, 1), (hkv, n_rep, t)
        ).reshape(hkv, r)
        if rp != r:
            sl = jnp.pad(sl, ((0, 0), (0, rp - r)))
        slope_rows = sl[..., None]

    interpret = flash_mode() == "interpret"
    if extra_kv is not None:
        hb = 1
        for cand in (32, 16, 8, 4, 2):
            if cand <= FLASH_HB_MAX and hkv % cand == 0:
                hb = cand
                break
        k_new = extra_kv[0].transpose(0, 2, 1, 3).astype(jnp.float32)
        v_new = extra_kv[1].transpose(0, 2, 1, 3).astype(jnp.float32)
        res = _mha_paged_hblk(
            q4, cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale,
            cache.page_tables, pos_rows, slope_rows, kv_lens,
            scale=float(scale), causal=causal, softcap=float(logit_softcap),
            out_dtype=out_dtype, interpret=interpret, layer=layer, hb=hb,
            k_new=k_new, v_new=v_new, fused_append=fused_append,
        )
        cache_out = None
        if fused_append:
            out, *cache_out = res
        else:
            out = res
        out = out[:, :, :r].reshape(b, hkv, n_rep, t, d)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d)
        if fused_append:
            return out, tuple(cache_out)
        return out

    out = _mha_paged(
        q4, cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale,
        cache.page_tables, pos_rows, slope_rows, kv_lens,
        scale=float(scale), causal=causal, softcap=float(logit_softcap),
        out_dtype=out_dtype, interpret=flash_mode() == "interpret",
        layer=layer,
    )
    out = out[:, :, :r].reshape(b, hkv, n_rep, t, d)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d)
