"""Paged KV cache — virtual memory for KV (EXTENSION beyond the reference;
boom-guide paged-attention design).

The contiguous per-slot cache (ops/kv_cache.py) reserves `max_len` per slot;
the paged cache shares a physical page pool across slots so memory scales
with TOKENS IN FLIGHT, not slots x max_len:

    k_pages / v_pages : [L, H_kv, P, page_size, D]   (bf16/f32 or int8)
    k_scale / v_scale : [L, H_kv, P, 1, page_size]   (int8 KV only)
    page_tables       : [B, n_blocks] int32 — logical block j of slot b
                        lives in physical page page_tables[b, j]
    lengths           : [B] tokens stored per slot

The flash kernel pages for free: the page table is scalar-prefetched and
the KV BlockSpec index map looks physical pages up per grid step — no
gather, no copies.  Prefill allocates each slot a CONTIGUOUS page run, so
the prompt lands with one in-place window write; decode growth takes any
free page (one tiny scatter per token).

Page allocation is host-side (`PageAllocator`) — the scheduler owns it,
like every serving stack's block manager.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .kv_cache import quantize_kv


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jax.Array
    v_pages: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    page_tables: jax.Array       # [B, n_blocks] int32
    lengths: jax.Array           # [B] int32

    def tree_flatten(self):
        return (self.k_pages, self.v_pages, self.k_scale, self.v_scale,
                self.page_tables, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def quantized(self) -> bool:
        return self.k_pages.dtype == jnp.int8

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[2]

    @property
    def n_blocks(self) -> int:
        return self.page_tables.shape[1]

    @property
    def kv_heads(self) -> int:
        return self.k_pages.shape[1]

    @property
    def layers(self) -> int:
        return self.k_pages.shape[0]

    @property
    def batch(self) -> int:
        return self.page_tables.shape[0]

    @property
    def max_len(self) -> int:
        return self.n_blocks * self.page_size


def init_paged_cache(layers: int, batch: int, max_len: int, kv_heads: int,
                     head_dim: int, n_pages: int, page_size: int = 128,
                     dtype=jnp.bfloat16,
                     quantized: bool = False,
                     scale_dtype=None) -> PagedKVCache:
    assert max_len % page_size == 0
    n_blocks = max_len // page_size
    shape = (layers, kv_heads, n_pages, page_size, head_dim)
    if quantized:
        if scale_dtype is None:
            # same default as the contiguous cache (kv_cache.init_cache):
            # bf16 scales halve the scale footprint/stream; every writer
            # casts on store so pool contents stay path-consistent
            import os

            scale_dtype = (jnp.float32
                           if os.environ.get("NST_KV_SCALE_DTYPE", "bf16")
                           in ("f32", "float32")
                           else jnp.bfloat16)
        k = jnp.zeros(shape, jnp.int8)
        v = jnp.zeros(shape, jnp.int8)
        ks = jnp.zeros(shape[:3] + (1, page_size), scale_dtype)
        vs = jnp.zeros(shape[:3] + (1, page_size), scale_dtype)
    else:
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        ks = vs = None
    return PagedKVCache(
        k, v, ks, vs,
        jnp.zeros((batch, n_blocks), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


class PageAllocator:
    """Host-side physical page manager (the serving block manager).

    Pages are REFCOUNTED so beam search can alias full blocks across
    beams (copy-on-write fork, `PagedEngine.reorder_slots`): `share_pages`
    adds a reference, `free_pages` drops one and only returns the page to
    the pool at zero."""

    def __init__(self, n_pages: int):
        self.free: List[int] = list(range(n_pages))
        self.refs = {}  # page -> refcount (absent == in the free list)

    @property
    def available(self) -> int:
        return len(self.free)

    def alloc_run(self, n: int) -> Optional[int]:
        """Allocate `n` CONTIGUOUS pages (prefill); returns the first page
        or None.  The free list is kept sorted; first-fit run search."""
        self.free.sort()
        run = 1
        for i in range(1, len(self.free) + 1):
            if i < len(self.free) and self.free[i] == self.free[i - 1] + 1:
                run += 1
            else:
                if run >= n:
                    start_idx = i - run
                    first = self.free[start_idx]
                    del self.free[start_idx:start_idx + n]
                    for p in range(first, first + n):
                        self.refs[p] = 1
                    return first
                run = 1
        return None

    def alloc_page(self) -> Optional[int]:
        if not self.free:
            return None
        p = self.free.pop()
        self.refs[p] = 1
        return p

    def share_pages(self, pages: List[int]) -> None:
        for p in pages:
            self.refs[int(p)] = self.refs.get(int(p), 0) + 1

    def free_pages(self, pages: List[int]) -> None:
        for p in pages:
            p = int(p)
            if p not in self.refs:
                raise RuntimeError(
                    f"double free of page {p} (not allocated)")
            rc = self.refs[p] - 1
            if rc <= 0:
                self.refs.pop(p)
                self.free.append(p)
            else:
                self.refs[p] = rc


class PrefixPageCache:
    """Automatic prompt-prefix caching over the refcounted page pool
    (EXTENSION: the vLLM-style prefix cache the reference lacks — its
    nearest analogue is the manual prompt-session file,
    model_load_session_file, model_utils.cpp:1775-1830).

    Every FULLY-FILLED prompt page is indexed by a cryptographic digest
    of the token chain up to and including that page; a new request
    adopts the longest indexed run of full pages (`lookup`) by aliasing
    the physical pages into its table (refcount +1 per adopter — the
    same copy-on-write machinery beam forking uses) and prefilling only
    the suffix.  Exactness: causal-attention KV at position i depends
    only on tokens <= i, so identical token prefixes produce identical
    pages (RoPE/ALiBi are absolute-position functions; int8 KV
    quantization is deterministic).  GLM blank-infilling prompts are
    bidirectional (prompt KV depends on the FULL prompt) — the engine
    refuses prefix caching for chatglm-1.

    The cache itself holds one reference per indexed page; `evict_lru`
    drops least-recently-used entries (whole page-chains are not
    required — a prefix hit only needs the leading pages present) so
    the engine can reclaim pool space under allocation pressure."""

    def __init__(self, allocator: PageAllocator, page_size: int,
                 capacity_pages: Optional[int] = None):
        from collections import OrderedDict

        self.alloc = allocator
        self.ps = page_size
        self.capacity = capacity_pages
        self.index: "OrderedDict[bytes, int]" = OrderedDict()  # key -> page
        self.hits = 0
        self.misses = 0

    # -- keys -----------------------------------------------------------
    def _chain_keys(self, prompt):
        """Digest per full page, LAZILY: key_i = H(key_{i-1} || tokens of
        page i).  lookup() stops hashing at the first index miss."""
        import hashlib

        import numpy as np

        prev = b"nst-prefix-v1"
        n_full = len(prompt) // self.ps
        for i in range(n_full):
            toks = np.asarray(
                prompt[i * self.ps:(i + 1) * self.ps], np.int64)
            h = hashlib.blake2b(prev, digest_size=16)
            h.update(toks.tobytes())
            prev = h.digest()
            yield prev

    # -- queries --------------------------------------------------------
    def lookup(self, prompt) -> Tuple[int, List[int]]:
        """Longest indexed full-page prefix of `prompt`: returns
        (n_tokens, pages).  Capped at len(prompt) - 1 so at least one
        token remains to prefill (it produces the first logits); the
        match length is always a page multiple (partial pages receive
        later writes and are never shared).  Takes NO references —
        `adopt` does."""
        pages: List[int] = []
        for key in self._chain_keys(prompt):
            page = self.index.get(key)
            if page is None:
                break
            self.index.move_to_end(key)  # LRU touch
            pages.append(page)
        while pages and len(pages) * self.ps >= len(prompt):
            pages.pop()  # leave >= 1 token to prefill
        if pages:
            self.hits += 1
        else:
            self.misses += 1
        return len(pages) * self.ps, pages

    def adopt(self, pages: List[int]) -> None:
        """Take one reference per page for a slot that aliases them."""
        self.alloc.share_pages(pages)

    def register(self, prompt, table_row) -> None:
        """Index the prompt's fully-filled pages from a just-prefilled
        slot's page-table row (cache takes +1 ref per newly indexed
        page; already-indexed keys are left untouched)."""
        for i, key in enumerate(self._chain_keys(prompt)):
            if key in self.index:
                self.index.move_to_end(key)
                continue
            page = int(table_row[i])
            self.alloc.share_pages([page])
            self.index[key] = page
        if self.capacity is not None:
            self.evict_lru(max(0, len(self.index) - self.capacity))

    def evict_lru(self, n_pages: int) -> int:
        """Drop up to `n_pages` least-recently-used entries (releasing
        the cache's references); returns how many were dropped."""
        dropped = 0
        while dropped < n_pages and self.index:
            _key, page = self.index.popitem(last=False)
            self.alloc.free_pages([page])
            dropped += 1
        return dropped

    def clear(self) -> None:
        self.evict_lru(len(self.index))


# ---------------------------------------------------------------------------
# appends
# ---------------------------------------------------------------------------


def _pool_rows(a: jax.Array) -> jax.Array:
    """[L, H, P, ps, D] -> [L, H, P*ps, D] view (free reshape)."""
    L, H, P, ps, D = a.shape
    return a.reshape(L, H, P * ps, D)


def append_prefill(cache: PagedKVCache, layer: int, k_new: jax.Array,
                   v_new: jax.Array, positions: jax.Array,
                   first_pages: Optional[jax.Array] = None,
                   active=None) -> PagedKVCache:
    """Prompt-chunk write as ONE in-place dynamic slice per slot.

    UNSAFE unless the CALLER guarantees the slot's physical pages for the
    ENTIRE PADDED window [T] form a contiguous run: the window writes all
    T rows from the run's first page, so bucket padding past the
    allocated pages tramples whatever physical pages follow (the model
    path uses `append_span` instead, which resolves every row through the
    page table and parks padding on the trash page).  Kept as the
    fast-path candidate for a future allocator that reserves padded runs.
    k_new/v_new: [B, T, H, D]; positions [B, T] logical contiguous run."""
    b, t = positions.shape
    ps = cache.page_size
    if active is None:
        active = jnp.ones((b,), bool)
    start = jnp.clip(positions[:, 0], 0, cache.max_len - t)
    if first_pages is None:
        blk0 = start // ps
        first_pages = jnp.take_along_axis(
            cache.page_tables, blk0[:, None], axis=1
        )[:, 0]
        row_starts = first_pages * ps + start % ps
    else:
        row_starts = first_pages * ps + start
    kt = k_new.transpose(0, 2, 1, 3)
    vt = v_new.transpose(0, 2, 1, 3)
    if cache.quantized:
        kc, ks = quantize_kv(kt)
        vc, vs = quantize_kv(vt)
    k = _pool_rows(cache.k_pages)
    v = _pool_rows(cache.v_pages)
    if cache.quantized:
        kscale = cache.k_scale.reshape(cache.layers, cache.kv_heads, 1,
                                       cache.n_pages * ps)
        vscale = cache.v_scale.reshape(cache.layers, cache.kv_heads, 1,
                                       cache.n_pages * ps)
    for bi in range(b):
        row0 = row_starts[bi]
        if cache.quantized:
            k = _write_pool(k, kc[bi], layer, row0, active[bi])
            v = _write_pool(v, vc[bi], layer, row0, active[bi])
            kscale = _write_pool_scale(kscale, ks[bi, ..., 0], layer, row0,
                                       active[bi])
            vscale = _write_pool_scale(vscale, vs[bi, ..., 0], layer, row0,
                                       active[bi])
        else:
            k = _write_pool(k, kt[bi], layer, row0, active[bi])
            v = _write_pool(v, vt[bi], layer, row0, active[bi])
    shp = cache.k_pages.shape
    out = dataclasses.replace(
        cache, k_pages=k.reshape(shp), v_pages=v.reshape(shp))
    if cache.quantized:
        sshp = cache.k_scale.shape
        out = dataclasses.replace(out, k_scale=kscale.reshape(sshp),
                                  v_scale=vscale.reshape(sshp))
    return out


def _write_pool(dst, upd, layer: int, row0, keep):
    """Blend-write upd [H, T, D] into dst [L, H, R, D] at rows row0.."""
    h, t, d = upd.shape
    idx = (layer, 0, row0, 0)
    cur = jax.lax.dynamic_slice(dst, idx, (1, h, t, d))
    new = jnp.where(keep, upd[None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, idx)


def _write_pool_scale(dst, upd, layer: int, row0, keep):
    """Blend-write upd [H, T] into dst [L, H, 1, R] at lanes row0.."""
    h, t = upd.shape
    idx = (layer, 0, 0, row0)
    cur = jax.lax.dynamic_slice(dst, idx, (1, h, 1, t))
    new = jnp.where(keep, upd[:, None, :][None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, idx)


def append_span(cache: PagedKVCache, layer: int, k_new: jax.Array,
                v_new: jax.Array, positions: jax.Array,
                active=None) -> PagedKVCache:
    """Multi-token write fully resolved through the page table: physical
    row per (slot, t) = table[b, pos//ps]*ps + pos%ps.  Unlike
    `append_prefill` this needs NO physical contiguity of the span's
    pages, so it serves speculative-verify and mixed-prefill growth whose
    pages were claimed one at a time.  Padding positions (pos >=
    max_len-1) and inactive slots park on the reserved trash page.
    k_new/v_new: [B, T, H, D]; scatter-based — prefer append_prefill's
    sliced writes when the run guarantee holds and T is large."""
    b, t = positions.shape
    ps = cache.page_size
    pos = jnp.clip(positions, 0, cache.max_len - 1)        # [B, T]
    block = pos // ps
    page = jnp.take_along_axis(cache.page_tables, block, axis=1)  # [B, T]
    row = page * ps + pos % ps
    trash = cache.n_pages * ps - 1
    valid = pos < cache.max_len - 1                        # padding parked
    if active is not None:
        valid = valid & active[:, None]
    row = jnp.where(valid, row, trash)                     # [B, T]
    hidx = jnp.arange(cache.kv_heads)[None, None, :]       # [1, 1, H]
    ridx = row[:, :, None]                                 # [B, T, 1]
    k = _pool_rows(cache.k_pages)
    v = _pool_rows(cache.v_pages)
    if cache.quantized:
        kc, ks = quantize_kv(k_new)
        vc, vs = quantize_kv(v_new)
        k = k.at[layer, hidx, ridx].set(kc)
        v = v.at[layer, hidx, ridx].set(vc)
        kscale = cache.k_scale.reshape(cache.layers, cache.kv_heads, 1, -1)
        vscale = cache.v_scale.reshape(cache.layers, cache.kv_heads, 1, -1)
        kscale = kscale.at[layer, hidx, 0, ridx].set(
            ks[..., 0].astype(kscale.dtype))
        vscale = vscale.at[layer, hidx, 0, ridx].set(
            vs[..., 0].astype(vscale.dtype))
        return dataclasses.replace(
            cache,
            k_pages=k.reshape(cache.k_pages.shape),
            v_pages=v.reshape(cache.v_pages.shape),
            k_scale=kscale.reshape(cache.k_scale.shape),
            v_scale=vscale.reshape(cache.v_scale.shape),
        )
    k = k.at[layer, hidx, ridx].set(k_new.astype(k.dtype))
    v = v.at[layer, hidx, ridx].set(v_new.astype(v.dtype))
    return dataclasses.replace(
        cache,
        k_pages=k.reshape(cache.k_pages.shape),
        v_pages=v.reshape(cache.v_pages.shape),
    )


def _rmw_pool_row(dst: jax.Array, upd: jax.Array, layer: int, row,
                  keep) -> jax.Array:
    """Write ONE token row into the pooled view dst[layer, :, row] via an
    8-row-aligned read-modify-write window (same relayout-avoidance as
    kv_cache._rmw_row: XLA relayout-copies the whole pool around an
    S-extent-1 scatter, measured 411us/layer/step at B=32 on the
    contiguous cache; extent>=8 windows update in place).  page_size is a
    multiple of 8, so the window never crosses a page boundary.
    dst: [L, H, R, D]; upd: [H, D]."""
    h, d = upd.shape
    w = min(8, dst.shape[2])
    base = (row // w) * w
    cur = jax.lax.dynamic_slice(dst, (layer, 0, base, 0), (1, h, w, d))
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2) == (row - base)
    sel = jnp.logical_and(sel, keep)
    new = jnp.where(sel, upd[None, :, None, :].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, (layer, 0, base, 0))


def _rmw_pool_scale(dst: jax.Array, val: jax.Array, layer: int, row,
                    keep) -> jax.Array:
    """Write one scale column into the pooled scale view dst[layer, :, 0,
    row] via a 128-lane-aligned RMW window (page_size % 128 == 0 keeps the
    window inside the page).  dst: [L, H, 1, R]; val: [H]."""
    h = val.shape[0]
    r = dst.shape[3]
    w = min(128, r)
    base = jnp.clip((row // w) * w, 0, r - w)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3) == (row - base)
    sel = jnp.logical_and(col, keep)
    cur = jax.lax.dynamic_slice(dst, (layer, 0, 0, base), (1, h, 1, w))
    new = jnp.where(sel, val[None, :, None, None].astype(dst.dtype), cur)
    return jax.lax.dynamic_update_slice(dst, new, (layer, 0, 0, base))


def append_decode(cache: PagedKVCache, layer: int, k_new: jax.Array,
                  v_new: jax.Array, positions: jax.Array,
                  active=None) -> PagedKVCache:
    """Single-token write via the page table: physical row =
    table[b, pos // ps] * ps + pos % ps, written through aligned RMW
    windows per slot (the contiguous cache's decode-append fix, ported —
    VERDICT r1 item 5; the reference's incremental tile append never
    rewrites the cache either, mha_dense.cpp:182-299).
    k_new/v_new: [B, 1, H, D]; positions [B, 1]."""
    b = positions.shape[0]
    ps = cache.page_size
    pos = jnp.clip(positions[:, 0], 0, cache.max_len - 1)
    block = pos // ps
    page = jnp.take_along_axis(cache.page_tables, block[:, None],
                               axis=1)[:, 0]
    row = page * ps + pos % ps                     # [B] physical rows
    keep = active if active is not None else jnp.ones((b,), bool)
    kt = k_new[:, 0]                               # [B, H, D]
    vt = v_new[:, 0]
    k = _pool_rows(cache.k_pages)
    v = _pool_rows(cache.v_pages)
    if cache.quantized:
        kc, ks = quantize_kv(kt)
        vc, vs = quantize_kv(vt)
        kscale = cache.k_scale.reshape(cache.layers, cache.kv_heads, 1, -1)
        vscale = cache.v_scale.reshape(cache.layers, cache.kv_heads, 1, -1)
        for bi in range(b):
            k = _rmw_pool_row(k, kc[bi], layer, row[bi], keep[bi])
            v = _rmw_pool_row(v, vc[bi], layer, row[bi], keep[bi])
            kscale = _rmw_pool_scale(kscale, ks[bi, :, 0], layer, row[bi],
                                     keep[bi])
            vscale = _rmw_pool_scale(vscale, vs[bi, :, 0], layer, row[bi],
                                     keep[bi])
        return dataclasses.replace(
            cache,
            k_pages=k.reshape(cache.k_pages.shape),
            v_pages=v.reshape(cache.v_pages.shape),
            k_scale=kscale.reshape(cache.k_scale.shape),
            v_scale=vscale.reshape(cache.v_scale.shape),
        )
    for bi in range(b):
        k = _rmw_pool_row(k, kt[bi], layer, row[bi], keep[bi])
        v = _rmw_pool_row(v, vt[bi], layer, row[bi], keep[bi])
    return dataclasses.replace(
        cache,
        k_pages=k.reshape(cache.k_pages.shape),
        v_pages=v.reshape(cache.v_pages.shape),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _copy_pages_jit(k, v, ks, vs, dst, src):
    """Whole-page copies (all layers, K+V+scales) in ONE gather-then-
    scatter each — every copy reads pre-state, so aliased dst/src page
    sets within one call resolve consistently."""
    k = k.at[:, :, dst].set(k[:, :, src])
    v = v.at[:, :, dst].set(v[:, :, src])
    if ks is not None:
        ks = ks.at[:, :, dst].set(ks[:, :, src])
        vs = vs.at[:, :, dst].set(vs[:, :, src])
    return k, v, ks, vs


def copy_pages(cache: PagedKVCache, dst_pages, src_pages,
               pad_to: Optional[int] = None) -> PagedKVCache:
    """Copy physical pages dst[i] <- src[i] (the copy-on-write tail-page
    copy of a beam fork).  `pad_to` pads the index vectors with self-
    copies of the trash page so the jitted copy has a fixed shape."""
    import numpy as np

    dst = list(int(p) for p in dst_pages)
    src = list(int(p) for p in src_pages)
    if not dst:
        return cache
    if pad_to is not None and len(dst) < pad_to:
        trash = cache.n_pages - 1
        dst = dst + [trash] * (pad_to - len(dst))
        src = src + [trash] * (pad_to - len(src))
    k, v, ks, vs = _copy_pages_jit(
        cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale,
        jnp.asarray(np.asarray(dst, np.int32)),
        jnp.asarray(np.asarray(src, np.int32)))
    return dataclasses.replace(cache, k_pages=k, v_pages=v, k_scale=ks,
                               v_scale=vs)


def gathered_layer(cache: PagedKVCache, layer: int,
                   dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Materialize logical [B, Hkv, S, D] K/V for one layer (XLA reference
    path / CPU tests; the Pallas kernel never does this)."""
    k = jnp.take(cache.k_pages[layer], cache.page_tables, axis=1)
    v = jnp.take(cache.v_pages[layer], cache.page_tables, axis=1)
    # [H, B, nb, ps, D] -> [B, H, nb*ps, D]
    def merge(a):
        h, b, nb, ps, d = a.shape
        return a.transpose(1, 0, 2, 3, 4).reshape(b, h, nb * ps, d)

    kf, vf = merge(k), merge(v)
    if cache.quantized:
        ks = jnp.take(cache.k_scale[layer], cache.page_tables, axis=1)
        vs = jnp.take(cache.v_scale[layer], cache.page_tables, axis=1)

        def merge_s(a):
            h, b, nb, one, ps = a.shape
            return a.transpose(1, 0, 2, 4, 3).reshape(b, h, nb * ps)

        kf = kf.astype(jnp.float32) * merge_s(ks)[..., None]
        vf = vf.astype(jnp.float32) * merge_s(vs)[..., None]
    return kf.astype(dtype), vf.astype(dtype)
