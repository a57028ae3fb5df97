"""KV cache: batched slots, optional int8 quantization, beam reorder,
StreamingLLM eviction, shift-RoPE ring buffer.

Parity (reference):
  * model_utils.cpp:61-194 kv_cache_init — per-layer K/V for batch x beam
    slots, fp16/fp32 or the opaque BesTLA reordered layout.  Here: one
    stacked array per tensor `[L, B, H_kv, S_max, D]` — S contiguous per
    head, the TPU analogue of the reference's reordered tile layout: the
    flash kernel DMAs a `[BS, D]` slab per (slot, head) block with no
    striding.  The quantized variant stores int8 codes + per-(token, head)
    scales `[L, B, H_kv, S]`, which the flash kernels dequantize on the fly.
  * model_utils.cpp:1959-2310 model_kv_cache_seq_cpy / beam reorder —
    replaced by a batch-axis gather (`reorder`): no memcpy, XLA turns it
    into a cheap device copy (SURVEY.md §7 "beam reorder = KV block-index
    gather").
  * main_pybind.cpp:573-587 StreamingLLM discard (`evict`) and
    llama.cpp:437-446 shift-RoPE ring (`shift_ring`).

Sequence positions are explicit (`lengths` per slot) because continuous
batching mixes prefill/decode slots at unrelated offsets.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .rope import apply_rope, rope_cos_sin

KV_SCALE_EPS = 1e-8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Stacked KV cache.

    k, v       : [L, B, H_kv, S, D]  (dtype = `dtype`, or int8 when quantized)
    k_scale,
    v_scale    : [L, B, H_kv, S] f32 per-token-per-head scales (quantized
                 only, else None).  Standard (8,128)-tiled layout so append
                 scatters stay in place; the flash kernel reads an 8-head
                 scale block and selects its row with an iota mask (any
                 other layout made XLA relayout-copy the tensor per call).
    lengths    : [B] int32 — tokens currently stored per slot (== n_past)
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    lengths: jax.Array

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- static helpers --------------------------------------------------
    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def layers(self) -> int:
        return self.k.shape[0]

    @property
    def kv_heads(self) -> int:
        return self.k.shape[2]


def init_cache(layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16,
               quantized: bool = False, scale_dtype=None) -> KVCache:
    """Parity: kv_cache_init (model_utils.cpp:61-194); `quantized=True` is
    the analogue of KV_MEM_TYPE_AUTO choosing the BesTLA int8 layout.

    `scale_dtype` (default bf16, NST_KV_SCALE_DTYPE=f32 restores f32):
    the per-(token, head) scale arrays are [L, B, H, S] — at f32 they
    cost HALF the int8 codes' footprint again (4.2 GB at B=16 ctx1024
    32L: the round-4 fused-B16 OOM) and a quarter of the flash kernel's
    scale stream.  Codes are always COMPUTED against the f32 scale and
    only the stored copy rounds, identically in every writer (host
    quantize_kv RMW paths and the fused in-kernel append), so caches
    stay bit-identical across paths."""
    shape = (layers, batch, kv_heads, max_len, head_dim)
    if quantized:
        if scale_dtype is None:
            import os

            scale_dtype = (jnp.float32
                           if os.environ.get("NST_KV_SCALE_DTYPE", "bf16")
                           in ("f32", "float32")
                           else jnp.bfloat16)
        k = jnp.zeros(shape, jnp.int8)
        v = jnp.zeros(shape, jnp.int8)
        ks = jnp.zeros(shape[:-1], scale_dtype)
        vs = jnp.zeros(shape[:-1], scale_dtype)
    else:
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        ks = vs = None
    return KVCache(k, v, ks, vs, jnp.zeros((batch,), jnp.int32))


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) sym int8 quant: x [..., D] -> codes, scale [..., 1]."""
    amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                               keepdims=True), KV_SCALE_EPS)
    scale = amax / 127.0
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return codes.astype(jnp.int8), scale


def _write_scale_window(dst, upd, layer: int, bi: int, start, keep,
                        shift=None):
    """Blend-write upd [H, T] into dst [L, B, H, S] rows start..  `shift`
    (see _write_window): roll the update so real rows land at start+shift
    and the first `shift` window rows keep their current contents."""
    h, t = upd.shape
    idx = (layer, bi, 0, start)
    cur = jax.lax.dynamic_slice(dst, idx, (1, 1, h, t))
    row_keep = keep
    if shift is not None:
        upd = jax.lax.cond(shift > 0,
                           lambda u: jnp.roll(u, shift, axis=1),
                           lambda u: u, upd)
        row_keep = keep & (jnp.arange(t) >= shift)
    new = jnp.where(row_keep, upd[None, None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, idx)


def _rmw_row(dst: jax.Array, upd: jax.Array, layer: int, bi: int,
             base, off, keep) -> jax.Array:
    """Write ONE token row into dst[layer, bi, :, base+off] via an
    8-row-aligned read-modify-write window.

    Why not a 1-row DUS/scatter: XLA relayout-copies the whole per-layer
    cache around any S-extent-1 write (measured 411us/layer/step at B=32 —
    the dominant decode cost), while extent>=8 windows update IN PLACE
    (~1us).  upd: [H, 1, D]."""
    h, _, d = upd.shape
    w = min(8, dst.shape[3])
    cur = jax.lax.dynamic_slice(dst, (layer, bi, 0, base, 0),
                                (1, 1, h, w, d))
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w, 1), 3) == off
    sel = jnp.logical_and(row, keep)
    new = jnp.where(sel, upd[None, None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, (layer, bi, 0, base, 0))


def _rmw_scale_row(dst: jax.Array, val: jax.Array, layer: int, bi: int,
                   pos, keep) -> jax.Array:
    """Write one scale column into dst[layer, bi, :, pos] via a 128-lane
    aligned RMW window (same relayout-avoidance as _rmw_row; S is the
    lane dim of the [L, B, H, S] scale arrays).  val: [H]."""
    h = val.shape[0]
    s = dst.shape[3]
    w = min(128, s)
    sbase = jnp.clip((pos // w) * w, 0, s - w)
    cur = jax.lax.dynamic_slice(dst, (layer, bi, 0, sbase), (1, 1, h, w))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3) == (
        pos - sbase)
    sel = jnp.logical_and(col, keep)
    new = jnp.where(sel, val[None, None, :, None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, (layer, bi, 0, sbase))


def _append_scatter(cache: KVCache, layer: int, k_new: jax.Array,
                    v_new: jax.Array, positions: jax.Array,
                    active=None) -> KVCache:
    """Single-token decode append: per-slot aligned-window RMW writes
    (see _rmw_row).  Inactive slots write nothing (blend keeps the old
    window).

    A batched one-gather/one-scatter variant (NST_KV_APPEND=batched) was
    tried for the round-1 B=16 int8-KV regression and REMOVED after the
    on-chip A/B (BENCH_NOTES 2026-08-19): it crashed the TPU worker at 7B
    scale, and the loop path had already recovered the regression (959 vs
    770 tok/s against bf16 KV at B=16 ctx1024)."""
    b, t = positions.shape
    pos = jnp.clip(positions[:, 0], 0, cache.max_len - 1)
    keep = active if active is not None else jnp.ones((b,), bool)
    w = min(8, cache.max_len)
    base = jnp.clip((pos // w) * w, 0, max(cache.max_len - w, 0))
    off = pos - base
    kt = k_new.transpose(0, 2, 1, 3)                    # [B, H, 1, D]
    vt = v_new.transpose(0, 2, 1, 3)
    k, v = cache.k, cache.v
    if cache.quantized:
        kc, ks = quantize_kv(kt)
        vc, vs = quantize_kv(vt)
        k_scale, v_scale = cache.k_scale, cache.v_scale
        for bi in range(b):
            k = _rmw_row(k, kc[bi], layer, bi, base[bi], off[bi], keep[bi])
            v = _rmw_row(v, vc[bi], layer, bi, base[bi], off[bi], keep[bi])
            k_scale = _rmw_scale_row(k_scale, ks[bi, :, 0, 0], layer, bi,
                                     pos[bi], keep[bi])
            v_scale = _rmw_scale_row(v_scale, vs[bi, :, 0, 0], layer, bi,
                                     pos[bi], keep[bi])
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    for bi in range(b):
        k = _rmw_row(k, kt[bi], layer, bi, base[bi], off[bi], keep[bi])
        v = _rmw_row(v, vt[bi], layer, bi, base[bi], off[bi], keep[bi])
    return dataclasses.replace(cache, k=k, v=v)


def _write_window(dst: jax.Array, upd: jax.Array, layer: int, bi: int,
                  start, keep, shift=None) -> jax.Array:
    """Blend-write `upd` [H, T, ...] into dst[layer, bi, :, start:start+T]
    via dynamic slices — stays IN PLACE under buffer donation, unlike the
    general scatter XLA emits for advanced indexing (which copied the
    whole cache per layer: the dominant prefill cost before this).

    `shift` >= 0: the caller clipped the window start DOWN by `shift` rows
    so the DUS stays in bounds (start_true + T > max_len happens when a
    padded prefill bucket overhangs the cache end — e.g. StreamingLLM
    re-eval at start=n_keep).  Roll the update so its real rows still land
    at start_true = start + shift, and keep the window's first `shift`
    rows' CURRENT contents (they sit below start_true — e.g. the
    StreamingLLM sink — and must survive; without this the window slid
    down and silently clobbered them)."""
    h, t = upd.shape[0], upd.shape[1]
    idx = (layer, bi, 0, start) + (0,) * (dst.ndim - 4)
    sizes = (1, 1, h, t) + upd.shape[2:]
    cur = jax.lax.dynamic_slice(dst, idx, sizes)
    row_keep = keep
    if shift is not None:
        # cond: the roll (an extra window copy) only executes when the
        # window actually overhangs — the common prefill pays nothing
        upd = jax.lax.cond(shift > 0,
                           lambda u: jnp.roll(u, shift, axis=1),
                           lambda u: u, upd)
        row_keep = keep & (jnp.arange(t) >= shift).reshape(
            (1, 1, 1, t) + (1,) * (dst.ndim - 4))
    new = jnp.where(row_keep, upd[None, None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, idx)


def append_layer(cache: KVCache, layer: int, k_new: jax.Array,
                 v_new: jax.Array, positions: jax.Array,
                 active=None) -> KVCache:
    """Write `[B, T, H, D]` new keys/values at `positions` `[B, T]`.

    Parity: ne_flash_attn_update_k/v incremental append
    (core/layers/mha_dense.cpp:182-400).

    CONTRACT: each slot's positions form one contiguous run starting at
    positions[:, 0] (prefill chunks and single-token decode always do);
    padding rows inside the window write garbage that attention masks via
    kv_lens.  `active` [B] masks slots whose cache must stay untouched
    (continuous-batching spectators); defaults to kv-derived in forward().
    """
    b, t = positions.shape
    if t == 1:
        # decode: a tiny [B*H]-row scatter keeps the cache in its standard
        # layout (a dynamic-update-slice here makes XLA relayout the WHOLE
        # cache to S-major and back at the jit boundary — ~6ms/step)
        return _append_scatter(cache, layer, k_new, v_new, positions,
                               active)
    # a padded bucket may overhang the cache end (start + t > max_len,
    # e.g. StreamingLLM re-eval at start=n_keep with a full-size bucket):
    # the window start clips down to keep the DUS in bounds and `shift`
    # tells the writer to roll the update so real rows still land at the
    # TRUE start while the underlying rows below it survive
    start_true = jnp.maximum(positions[:, 0], 0)
    start = jnp.clip(positions[:, 0], 0, cache.max_len - t)
    shift = start_true - start
    if active is None:
        active = jnp.ones((b,), bool)
    kt = k_new.transpose(0, 2, 1, 3)                    # [B, H, T, D]
    vt = v_new.transpose(0, 2, 1, 3)
    k, v = cache.k, cache.v
    if cache.quantized:
        kc, ks = quantize_kv(kt)
        vc, vs = quantize_kv(vt)
        k_scale, v_scale = cache.k_scale, cache.v_scale
        for bi in range(b):
            k = _write_window(k, kc[bi], layer, bi, start[bi], active[bi],
                              shift[bi])
            v = _write_window(v, vc[bi], layer, bi, start[bi], active[bi],
                              shift[bi])
            k_scale = _write_scale_window(k_scale, ks[bi, ..., 0], layer,
                                          bi, start[bi], active[bi],
                                          shift[bi])
            v_scale = _write_scale_window(v_scale, vs[bi, ..., 0], layer,
                                          bi, start[bi], active[bi],
                                          shift[bi])
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    for bi in range(b):
        k = _write_window(k, kt[bi], layer, bi, start[bi], active[bi],
                          shift[bi])
        v = _write_window(v, vt[bi], layer, bi, start[bi], active[bi],
                          shift[bi])
    return dataclasses.replace(cache, k=k, v=v)


def read_layer(cache: KVCache, layer: int,
               dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Dequantized view `[B, S, H, D]` of one layer (XLA attention path; the
    Pallas flash kernels read the int8 codes directly instead)."""
    k = cache.k[layer]
    v = cache.v[layer]
    if cache.quantized:
        k = k.astype(jnp.float32) * cache.k_scale[layer][..., None]
        v = v.astype(jnp.float32) * cache.v_scale[layer][..., None]
    return (k.astype(dtype).transpose(0, 2, 1, 3),
            v.astype(dtype).transpose(0, 2, 1, 3))


def set_lengths(cache: KVCache, lengths: jax.Array) -> KVCache:
    return dataclasses.replace(cache, lengths=lengths.astype(jnp.int32))


def advance(cache: KVCache, counts: jax.Array) -> KVCache:
    return dataclasses.replace(
        cache, lengths=cache.lengths + counts.astype(jnp.int32)
    )


def reorder(cache: KVCache, src_slots: jax.Array) -> KVCache:
    """Beam-search KV reorder: new slot b takes old slot src_slots[b].

    Parity: beam_search_kv_cache_reorder / model_kv_cache_seq_cpy
    (model_utils.cpp:2239-2310, 2058) — gather instead of block memcpy."""
    take = lambda a: None if a is None else jnp.take(a, src_slots, axis=1)
    return KVCache(
        take(cache.k), take(cache.v), take(cache.k_scale),
        take(cache.v_scale), jnp.take(cache.lengths, src_slots, axis=0),
    )


def evict(cache: KVCache, n_keep: int, n_discard: int,
          slot_mask: Optional[jax.Array] = None) -> KVCache:
    """StreamingLLM discard: keep the first `n_keep` sink tokens, drop the
    next `n_discard`, slide the rest down (parity: main_pybind.cpp:573-587).
    Static shapes: the tail is rolled down; stale tail slots are masked by
    the reduced `lengths`.  `slot_mask` [B] limits the eviction to selected
    batch slots (continuous batching evicts per sequence).  NOTE: with
    plain (non-shift) RoPE the caller must re-evaluate the slid tokens,
    exactly like the reference."""

    def slide(a, axis=3):
        if a is None:
            return None
        # S: axis 3 for k/v [L,B,H,S,D] and for scales [L,B,H,S]
        sl = [slice(None)] * a.ndim
        def take(lo, hi):
            s = list(sl)
            s[axis] = slice(lo, hi)
            return a[tuple(s)]
        head = take(0, n_keep)
        tail = take(n_keep + n_discard, None)
        pad = take(a.shape[axis] - n_discard, None)  # stale; masked
        slid = jnp.concatenate([head, tail, pad], axis=axis)
        if slot_mask is None:
            return slid
        shape = (1, a.shape[1]) + (1,) * (a.ndim - 2)
        return jnp.where(slot_mask.reshape(shape), slid, a)

    new_len = jnp.maximum(cache.lengths - n_discard, n_keep)
    if slot_mask is not None:
        new_len = jnp.where(slot_mask, new_len, cache.lengths)
    return KVCache(
        slide(cache.k), slide(cache.v), slide(cache.k_scale),
        slide(cache.v_scale), new_len,
    )


def shift_ring(cache: KVCache, n_keep: int, n_discard: int,
               inv_freq: jax.Array, style: str = "neox",
               rot_dim: Optional[int] = None,
               slot_mask: Optional[jax.Array] = None) -> KVCache:
    """Shift-RoPE ring-buffer eviction: like `evict`, but K is stored RoPE'd,
    so the slid tokens are re-rotated by -n_discard positions instead of
    being re-evaluated (parity: ne_rope_shift_inplace + kv_self.cossin,
    llama.cpp:437-446,551-558; docs/infinite_inference.md)."""
    out = evict(cache, n_keep, n_discard, slot_mask)
    delta = jnp.full((out.batch, out.max_len), -n_discard, jnp.int32)
    mask = (jnp.arange(out.max_len)[None, :] >= n_keep)
    if slot_mask is not None:
        mask = jnp.logical_and(mask, slot_mask[:, None])
    delta = jnp.where(mask, delta, 0)
    if out.quantized:
        # dequantize -> rotate -> requantize the shifted span.  Keep the
        # cache's stored scale dtype (bf16 by default): returning the
        # quantizer's f32 scales would silently flip the pytree dtype
        # mid-stream (retrace + doubled scale memory).
        kf = out.k.astype(jnp.float32) * out.k_scale[
            ..., None].astype(jnp.float32)
        kr = _rotate_stack(kf, delta, inv_freq, style, rot_dim)
        kc, ks = quantize_kv(kr)
        return dataclasses.replace(
            out, k=kc, k_scale=ks[..., 0].astype(out.k_scale.dtype))
    kr = _rotate_stack(out.k.astype(jnp.float32), delta, inv_freq, style,
                       rot_dim)
    return dataclasses.replace(out, k=kr.astype(out.k.dtype))


def _rotate_stack(k: jax.Array, delta: jax.Array, inv_freq: jax.Array,
                  style: str, rot_dim: Optional[int]) -> jax.Array:
    """k: [L, B, H, S, D]; delta: [B, S] -> rotated k."""
    cos, sin = rope_cos_sin(delta, inv_freq)  # [B, S, half]
    kt = k.transpose(0, 1, 3, 2, 4)           # [L, B, S, H, D]
    kt = apply_rope(kt, cos[None], sin[None], style=style, rot_dim=rot_dim)
    return kt.transpose(0, 1, 3, 2, 4)
