"""Generation engine: jitted prefill/decode steps + generate loops.

Parity: the reference's L4 generation runtime (model_utils.cpp model_eval
dispatch + main_pybind.cpp evaluate_/generate loops), redesigned for XLA:
everything under jit has static shapes — prefill uses padded length
buckets, decode is a fixed-slot single-token step with donated KV
(SURVEY.md §7 "ragged continuous batching under jit").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.arch import ArchConfig
from ..models.transformer import forward
from ..ops import kv_cache as kvc


def pad_to_bucket(length: int, buckets: Tuple[int, ...]) -> int:
    """Choose the padded prefill length (static-shape bucketing)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_step(
    params: Dict[str, Any],
    cfg: ArchConfig,
    cache: kvc.KVCache,
    token_ids: jax.Array,     # [B, T] padded with 0s
    lengths: jax.Array,       # [B] true prompt lengths
    start_pos: jax.Array,     # [B] position offset (0 for fresh prompts)
) -> Tuple[jax.Array, kvc.KVCache]:
    """Evaluate a padded prompt chunk; returns logits at the last *real*
    token of each row `[B, vocab]` and the updated cache.

    Slots with `lengths == 0` are untouched spectators (their stored KV
    lengths are preserved) — this is what lets the continuous-batching
    scheduler prefill a new request into a free slot while other slots hold
    live sequences (ORCA semantics, reference scheduler.cpp prepare_inputs).
    Position `max_len - 1` is a reserved trash slot for padding writes."""
    b, t = token_ids.shape
    active = lengths > 0
    pos = start_pos[:, None] + jnp.arange(t)[None, :]
    # padding tokens are parked on the trash slot; attention masks them via
    # kv_lens, and append clamps their cache writes
    in_range = jnp.arange(t)[None, :] < lengths[:, None]
    pos = jnp.where(in_range, pos, cache.max_len - 1)
    kv_lens = jnp.where(active, start_pos + lengths, cache.lengths)
    # chatglm-1: the prompt length drives the GLM 2-D positions + blank-
    # infilling mask; at prefill it is exactly start+len (spectator rows
    # are fully padding-masked, their value is irrelevant)
    glm = (start_pos + lengths) if cfg.rope_style == "chatglm" else None
    # LM head only at each row's last real token (logits_positions): the
    # full [B, T, V] projection wastes 2*T*E*V flops + a huge buffer
    last = jnp.clip(lengths - 1, 0, t - 1)
    logits, cache = forward(params, cfg, token_ids, pos, cache, kv_lens,
                            glm_lens=glm, logits_positions=last[:, None])
    last_logits = logits[:, 0]
    cache = kvc.set_lengths(cache, kv_lens)
    return last_logits, cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_step(
    params: Dict[str, Any],
    cfg: ArchConfig,
    cache: kvc.KVCache,
    tokens: jax.Array,        # [B] last sampled token per slot
    active: jax.Array,        # [B] bool — slots still generating
    glm_lens: Optional[jax.Array] = None,  # [B] chatglm-1 prompt lengths
) -> Tuple[jax.Array, kvc.KVCache]:
    """One decode token for every active slot (the HOT path —
    llama.cpp:53 model_eval_internal per-token equivalent)."""
    lens = cache.lengths
    pos = jnp.where(active, lens, cache.max_len - 1)[:, None]  # [B,1]
    kv_lens = lens + active.astype(jnp.int32)
    logits, cache = forward(
        params, cfg, tokens[:, None], pos, cache, kv_lens, glm_lens=glm_lens
    )
    cache = kvc.set_lengths(cache, kv_lens)
    return logits[:, 0], cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps"), donate_argnames=("cache",)
)
def decode_n_steps(
    params: Dict[str, Any],
    cfg: ArchConfig,
    cache: kvc.KVCache,
    tokens: jax.Array,        # [B] first input token per slot
    active: jax.Array,        # [B]
    n_steps: int,
    glm_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Greedy-decode `n_steps` tokens fully on device (one dispatch).

    Used by the benchmark harness and batch generation: avoids per-token
    host round-trips (the analogue of the reference's in-process C++ decode
    loop, main_pybind.cpp:609-660)."""

    def body(carry, _):
        cache, toks = carry
        lens = cache.lengths
        pos = jnp.where(active, lens, cache.max_len - 1)[:, None]
        kv_lens = lens + active.astype(jnp.int32)
        logits, cache = forward(params, cfg, toks[:, None], pos, cache,
                                kv_lens, glm_lens=glm_lens)
        cache = kvc.set_lengths(cache, kv_lens)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (cache, nxt), nxt

    (cache, _), toks = jax.lax.scan(
        body, (cache, tokens), None, length=n_steps
    )
    return toks.T, cache  # [B, n_steps]


class Engine:
    """Owns params + cache + jitted steps for one model instance."""

    def __init__(self, params: Dict[str, Any], cfg: ArchConfig,
                 max_batch: int = 1, max_len: int = 2048,
                 kv_dtype=jnp.bfloat16, kv_quantized: bool = False,
                 buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
                 fuse: bool = True, kv_scale_dtype=None):
        if fuse:
            from ..models.transformer import fuse_params

            params = fuse_params(params, cfg)
        if cfg.kv_append == "env":
            # pin the decode KV-append path into the static jit key NOW:
            # env reads inside traced code silently no-op after the first
            # trace in a process (ADVICE r3 — the kill switch must work)
            from ..models.transformer import kv_append_mode

            cfg = dataclasses.replace(cfg, kv_append=kv_append_mode())
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.kv_dtype = kv_dtype
        self.kv_quantized = kv_quantized
        # bf16 KV scales by default (half the scale footprint/stream);
        # f32 pins bit-stable logits for strict-reproducibility use
        # (near-tie argmax can differ between the m=1 GEMV and batched
        # verify kernels at bf16-scale noise level)
        self.kv_scale_dtype = kv_scale_dtype
        self.buckets = tuple(b for b in buckets if b <= max_len) or (max_len,)
        if self.buckets[-1] < max_len:
            self.buckets = self.buckets + (max_len,)
        # StreamingLLM config (parity: gpt_params n_keep/n_discard +
        # shift_roped_k, model_config.h:81-84)
        self.shift_roped_k = False
        self.n_keep = 4
        self.n_discard = -1
        # chatglm-1 (GLM blank infilling): per-slot prompt length drives the
        # 2-D positions + bidirectional-prefix mask through every step
        self.glm_lens = (np.zeros((max_batch,), np.int32)
                         if cfg.rope_style == "chatglm" else None)
        # pre-flight HBM budget (round 5): the reference fails oversize
        # configs at init via its scratch tables (llama.h llama_mem_req);
        # warn/refuse here instead of an opaque mid-bench TPU Internal
        # error (utils/memory.py; NST_HBM=strict|warn|off)
        from ..utils.memory import preflight

        # paged engines budget the real pool (n_pages * page_size rows);
        # sharded engines (mesh set before super().__init__) budget the
        # PER-CHIP share — params/KV divide across the mesh
        kv_rows = (self.n_pages * self.page_size
                   if hasattr(self, "n_pages") else None)
        mesh = getattr(self, "mesh", None)
        self.hbm_estimate = preflight(
            params, cfg, max_batch, max_len, self.kv_dtype, kv_quantized,
            self.buckets, scale_dtype=self.kv_scale_dtype,
            what=type(self).__name__, kv_total_rows=kv_rows,
            shards=(mesh.devices.size if mesh is not None else 1),
        )
        self.cache = self.new_cache()

    def glm_arg(self) -> Optional[jax.Array]:
        return (jnp.asarray(self.glm_lens) if self.glm_lens is not None
                else None)

    def discard_count(self) -> int:
        nd = self.n_discard
        if nd <= 0:
            nd = max((self.max_len - self.n_keep) // 2, 1)
        return nd

    def rope_inv_freq(self):
        from ..ops.rope import rope_inv_freq

        rot = self.cfg.rot_dim or self.cfg.head_dim
        inv, _mscale = rope_inv_freq(rot, self.cfg.rope_base,
                                     self.cfg.rope_scaling,
                                     seq_len=self.max_len)
        return inv

    def new_cache(self) -> kvc.KVCache:
        return kvc.init_cache(
            self.cfg.n_layers, self.max_batch, self.max_len,
            self.cfg.n_kv_heads, self.cfg.head_dim, self.kv_dtype,
            self.kv_quantized, scale_dtype=self.kv_scale_dtype,
        )

    # -- scheduler step methods -----------------------------------------
    # The scheduler drives the engine EXCLUSIVELY through these four
    # methods, so sharded engines (parallel/tp.py TPEngine) can serve by
    # overriding them with shard_map'ed steps.
    def run_prefill(self, ids: jax.Array, lens: jax.Array,
                    starts: jax.Array) -> jax.Array:
        """Padded prefill batch; returns last-real-token logits [B, V]."""
        logits, self.cache = prefill_step(
            self.params, self.cfg, self.cache, ids, lens, starts
        )
        return logits

    def run_decode_chunk(self, sampler, tokens: jax.Array,
                         active: jax.Array, chunk: int, sp):
        """`chunk` decode+sample steps; returns (tokens [B, chunk],
        sampler)."""
        toks, self.cache, sampler = decode_sample_chunk(
            self.params, self.cfg, self.cache, sampler, tokens, active,
            chunk, sp, glm_lens=self.glm_arg(),
        )
        return toks, sampler

    # EOS-aware device-side decode window (see decode_window).  All
    # shipped engines support it (TP/PP wrap their shard_map'ed step in
    # the same run_window_loop; paged engines pair pessimistic window
    # reservations with commit_lens rollback); the flag exists so an
    # engine subclass without a window step falls back to the chunk path
    supports_window = True

    def run_decode_window(self, sampler, tokens, active, budget, n_steps,
                          cap: int, sp, eos_id):
        """Up-to-`n_steps` decode+sample window with device-side EOS/
        budget stops; returns (toks_buf [B, cap], emitted [B],
        last_tokens [B], active [B], budget [B], sampler)."""
        buf, em, toks, act, bud, self.cache, sampler = decode_window(
            self.params, self.cfg, self.cache, sampler,
            jnp.asarray(tokens), jnp.asarray(active), jnp.asarray(budget),
            jnp.int32(n_steps), cap, sp,
            jnp.int32(-1 if eos_id is None else eos_id),
            glm_lens=self.glm_arg(),
        )
        return buf, em, toks, act, bud, sampler

    def run_verify_rows(self, ids, pos, kv_lens, row_idx) -> jax.Array:
        """Multi-token verify forward; returns the gathered logit rows
        [B, R, V]."""
        from .speculative import _verify_forward_rows

        rows, self.cache = _verify_forward_rows(
            self.params, self.cfg, self.cache, ids, pos, kv_lens, row_idx,
            glm_lens=self.glm_arg(),
        )
        return rows

    def run_verify_argmax(self, ids, pos, kv_lens) -> jax.Array:
        """Verify forward reduced to per-position argmax ids [B, T]."""
        from .speculative import _verify_forward_argmax

        g, self.cache = _verify_forward_argmax(
            self.params, self.cfg, self.cache, ids, pos, kv_lens,
            glm_lens=self.glm_arg(),
        )
        return g

    # -- single-prompt convenience (Model.generate parity) ---------------
    def prefill(self, prompts: List[List[int]]) -> jax.Array:
        """Prefill `prompts` into slots 0..B-1; returns last-token logits."""
        b = len(prompts)
        assert b <= self.max_batch
        maxlen = max(len(p) for p in prompts)
        t = pad_to_bucket(maxlen, self.buckets)
        ids = np.zeros((self.max_batch, t), np.int32)
        lens = np.zeros((self.max_batch,), np.int32)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            lens[i] = len(p)
            if self.glm_lens is not None:
                self.glm_lens[i] = len(p)
        self.cache = kvc.set_lengths(
            self.cache, jnp.zeros((self.max_batch,), jnp.int32)
        )
        logits, self.cache = prefill_step(
            self.params, self.cfg, self.cache, jnp.asarray(ids),
            jnp.asarray(lens), jnp.zeros((self.max_batch,), jnp.int32),
        )
        return logits

    def decode(self, tokens: jax.Array, active: jax.Array) -> jax.Array:
        logits, self.cache = decode_step(
            self.params, self.cfg, self.cache, tokens, active,
            glm_lens=self.glm_arg(),
        )
        return logits

    def reorder_slots(self, src) -> None:
        """Beam-search KV reorder: slot b takes slot src[b]'s KV — a
        batch-axis gather on the contiguous cache (parity:
        beam_search_kv_cache_reorder, model_utils.cpp:2239-2310, without
        the memcpys); PagedEngine overrides with a copy-on-write
        page-table fork."""
        self.cache = kvc.reorder(self.cache, jnp.asarray(src))

    def generate_greedy(self, prompt: List[int], max_new_tokens: int,
                        eos_id: Optional[int] = None) -> List[int]:
        """Single-sequence greedy decode (tests / simple API)."""
        logits = self.prefill([prompt])
        out = []
        tok = int(jnp.argmax(logits[0]))
        active = jnp.zeros((self.max_batch,), bool).at[0].set(True)
        for _ in range(max_new_tokens):
            out.append(tok)
            if eos_id is not None and tok == eos_id:
                break
            logits = self.decode(
                jnp.full((self.max_batch,), tok, jnp.int32), active
            )
            tok = int(jnp.argmax(logits[0]))
        return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps", "sp"),
    donate_argnames=("cache", "sampler"),
)
def decode_sample_chunk(
    params: Dict[str, Any],
    cfg: ArchConfig,
    cache: kvc.KVCache,
    sampler,                   # ops.sampling.SamplerState
    tokens: jax.Array,         # [B] last sampled token per slot
    active: jax.Array,         # [B]
    n_steps: int,
    sp,                        # ops.sampling.SamplingParams (static)
    glm_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, kvc.KVCache, Any]:
    """Decode + SAMPLE `n_steps` tokens fully on device (one dispatch,
    one host sync for the whole chunk).

    The reference runs its decode loop in-process per token
    (main_pybind.cpp:609-660); on TPU a per-token host round-trip costs
    more than the step itself, so the serving scheduler chains steps
    device-side and syncs once per chunk.  Returns tokens [B, n_steps].
    """
    from ..ops import sampling as smp

    def body(carry, _):
        cache, sampler, toks = carry
        lens = cache.lengths
        pos = jnp.where(active, lens, cache.max_len - 1)[:, None]
        kv_lens = lens + active.astype(jnp.int32)
        logits, cache = forward(params, cfg, toks[:, None], pos, cache,
                                kv_lens, glm_lens=glm_lens)
        cache = kvc.set_lengths(cache, kv_lens)
        nxt, sampler = smp.sample(logits[:, 0], sampler, sp, active=active)
        nxt = jnp.where(active, nxt.astype(jnp.int32), toks)
        return (cache, sampler, nxt), nxt

    (cache, sampler, _), toks = jax.lax.scan(
        body, (cache, sampler, tokens), None, length=n_steps
    )
    return toks.T, cache, sampler


@functools.partial(
    jax.jit, static_argnames=("cfg", "cap", "sp"),
    donate_argnames=("cache", "sampler"),
)
def decode_window(
    params: Dict[str, Any],
    cfg: ArchConfig,
    cache: kvc.KVCache,
    sampler,                   # ops.sampling.SamplerState
    tokens: jax.Array,         # [B] last sampled token per slot
    active: jax.Array,         # [B] bool
    budget: jax.Array,         # [B] int32 remaining new-token budget
    n_steps: jax.Array,        # scalar int32, <= cap (DYNAMIC: one compile)
    cap: int,                  # static token-buffer width
    sp,                        # ops.sampling.SamplingParams (static)
    eos_id: jax.Array,         # scalar int32 (-1: no eos stop)
    glm_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, ...]:
    """Decode + sample up to `n_steps` tokens fully on device with
    PER-SLOT EOS/budget deactivation INSIDE the loop.

    Supersedes the fixed-chunk ladder (`decode_sample_chunk`) for plain
    serving decode: `n_steps` is a dynamic operand of a
    `lax.while_loop`, so every window length shares ONE compiled
    program (the ladder compiled one jit variant per chunk size), a
    slot that hits EOS or its budget stops consuming compute/KV exactly
    like the sequential schedule (the ladder over-decoded to the chunk
    boundary and discarded), and the loop exits as soon as every slot
    is inactive.  Fewer, longer windows amortize the per-dispatch fixed
    cost that dominated the served-vs-offline gap (BENCH_NOTES
    2026-08-19: 22 ms fixed per dispatch through the tunnel).

    Returns (toks_buf [B, cap], emitted [B], last_tokens [B],
    active [B], budget [B], cache, sampler) — the last-token/active/
    budget carries let the scheduler dispatch window N+1 straight from
    window N's device arrays (pipelined, no host sync between windows).
    """
    def step_fn(cache, toks_2d, pos, kv_lens):
        return forward(params, cfg, toks_2d, pos, cache, kv_lens,
                       glm_lens=glm_lens)

    return run_window_loop(step_fn, cache.max_len, cache, sampler, tokens,
                           active, budget, n_steps, cap, sp, eos_id)


def run_window_loop(step_fn, max_len: int, cache, sampler, tokens, active,
                    budget, n_steps, cap: int, sp, eos_id):
    """The shared EOS-aware decode-window while_loop (used by
    decode_window above and the TP/PP engines' shard_map'ed window —
    one implementation so the EOS/budget semantics cannot diverge).

    step_fn(cache, tokens [B,1], pos [B,1], kv_lens [B]) ->
    (logits [B,1,V], cache)."""
    from ..ops import sampling as smp

    b = tokens.shape[0]

    def cond(st):
        i, _cache, _sampler, _toks, act = st[:5]
        return jnp.logical_and(i < n_steps, jnp.any(act))

    def body(st):
        i, cache, sampler, toks, act, bud, buf, em = st
        lens = cache.lengths
        pos = jnp.where(act, lens, max_len - 1)[:, None]
        kv_lens = lens + act.astype(jnp.int32)
        logits, cache = step_fn(cache, toks[:, None], pos, kv_lens)
        cache = kvc.set_lengths(cache, kv_lens)
        nxt, sampler = smp.sample(logits[:, 0], sampler, sp, active=act)
        nxt = jnp.where(act, nxt.astype(jnp.int32), toks)
        buf = jax.lax.dynamic_update_slice(buf, nxt[:, None],
                                           (jnp.int32(0), i))
        em = em + act.astype(jnp.int32)
        bud = bud - act.astype(jnp.int32)
        done = jnp.logical_or(nxt == eos_id, bud <= 0)
        act = jnp.logical_and(act, jnp.logical_not(done))
        return (i + 1, cache, sampler, nxt, act, bud, buf, em)

    st = (jnp.int32(0), cache, sampler, tokens.astype(jnp.int32), active,
          budget.astype(jnp.int32), jnp.zeros((b, cap), jnp.int32),
          jnp.zeros((b,), jnp.int32))
    _, cache, sampler, toks, act, bud, buf, em = jax.lax.while_loop(
        cond, body, st)
    return buf, em, toks, act, bud, cache, sampler


class PagedEngine(Engine):
    """Engine over a paged KV cache (EXTENSION: shared physical page pool,
    memory scales with tokens in flight — see ops/paged_kv.py).

    The engine owns the host-side PageAllocator: prefill reserves a
    contiguous page run per prompt; decode growth claims one page whenever
    a slot crosses a page boundary.  Greedy generation only for now — the
    CB scheduler integration keeps the contiguous cache."""

    # windowed decode works on the page pool: prepare_decode claims the
    # full window pessimistically per active slot and the scheduler snaps
    # the length mirror back to the emitted counts via commit_lens (the
    # speculative path's reservation/rollback pattern) — overshoot pages
    # stay mapped for reuse and free at release_slot
    supports_window = True

    def __init__(self, params, cfg, max_batch: int = 1, max_len: int = 2048,
                 kv_dtype=jnp.bfloat16, kv_quantized: bool = False,
                 buckets=DEFAULT_BUCKETS, fuse: bool = True,
                 n_pages: Optional[int] = None, page_size: int = 128,
                 prefix_cache: bool = False, kv_scale_dtype=None):
        from ..ops import paged_kv as pkv

        self.page_size = page_size
        # +1: the last physical page is RESERVED as the trash page that
        # inactive slots' masked decode writes park on (ops/paged_kv.py
        # append_decode) — it must never be allocated to a sequence
        self.n_pages = (n_pages or (max_batch * max_len) // page_size) + 1
        self._alloc = pkv.PageAllocator(self.n_pages - 1)
        self._tables = np.zeros(
            (max_batch, max_len // page_size), np.int32
        )
        self._lens = np.zeros((max_batch,), np.int64)
        # blocks actually MAPPED per slot: may exceed ceil(_lens/ps) after
        # a speculative rollback (commit_lens snaps _lens back; the
        # overshoot pages stay mapped for reuse and are freed at release)
        self._mapped = np.zeros((max_batch,), np.int64)
        # automatic prompt-prefix caching (ops/paged_kv.PrefixPageCache):
        # full prompt pages indexed by token-chain digest; later requests
        # alias them copy-on-write and prefill only the suffix
        self.prefix = None
        if prefix_cache:
            if cfg.rope_style == "chatglm":
                raise NotImplementedError(
                    "prefix caching is unsound for chatglm-1: GLM blank-"
                    "infilling prompts attend BIDIRECTIONALLY, so prompt "
                    "KV depends on the full prompt, not just the prefix")
            self.prefix = pkv.PrefixPageCache(self._alloc, page_size)
        super().__init__(params, cfg, max_batch, max_len, kv_dtype,
                         kv_quantized, buckets, fuse,
                         kv_scale_dtype=kv_scale_dtype)

    def new_cache(self):
        from ..ops import paged_kv as pkv

        return pkv.init_paged_cache(
            self.cfg.n_layers, self.max_batch, self.max_len,
            self.cfg.n_kv_heads, self.cfg.head_dim, self.n_pages,
            self.page_size, self.kv_dtype, self.kv_quantized,
            scale_dtype=self.kv_scale_dtype,
        )

    def _sync_tables(self):
        self.cache = dataclasses.replace(
            self.cache, page_tables=jnp.asarray(self._tables)
        )

    def _alloc_page(self):
        """alloc_page with prefix-cache LRU eviction under pool pressure.

        Keeps evicting while the cache has entries: an LRU head that is
        still aliased by a live slot drops to rc=1 without freeing a
        page, so a single eviction attempt could fail while cache-only
        pages remain reclaimable further down the LRU order."""
        page = self._alloc.alloc_page()
        if self.prefix is not None:
            while page is None and self.prefix.evict_lru(1):
                page = self._alloc.alloc_page()
        return page

    def _alloc_run(self, n: int):
        first = self._alloc.alloc_run(n)
        if first is None and self.prefix is not None:
            # cached pages are scattered; evicting may not open a
            # contiguous run immediately — drain as needed
            while self.prefix.evict_lru(max(n, 4)):
                first = self._alloc.alloc_run(n)
                if first is not None:
                    break
        return first

    def _ensure_pages(self, slot: int, new_len: int) -> None:
        """Idempotent: only blocks past the mapped high-water mark are
        claimed (a rolled-back slot re-crossing a boundary must reuse its
        still-mapped page, not leak it)."""
        ps = self.page_size
        need = -(-new_len // ps)
        for blk in range(int(self._mapped[slot]), need):
            page = self._alloc_page()
            if page is None:
                raise RuntimeError("paged KV pool exhausted")
            self._tables[slot, blk] = page
        self._mapped[slot] = max(self._mapped[slot], need)

    # -- prompt-prefix caching (ops/paged_kv.PrefixPageCache) ------------
    def prefix_lookup(self, prompt):
        """(n_cached_tokens, pages) for the longest indexed full-page
        prompt prefix; (0, []) when disabled or no hit."""
        if self.prefix is None:
            return 0, []
        return self.prefix.lookup(list(prompt))

    def adopt_prefix(self, slot: int, pages) -> None:
        """Alias cached prefix pages into `slot`'s table (copy-on-write:
        one reference per adopter; release_slot drops it)."""
        n = len(pages)
        if n == 0:
            return
        self.prefix.adopt([int(p) for p in pages])
        self._tables[slot, :n] = np.asarray(pages, np.int32)
        self._mapped[slot] = n
        self._lens[slot] = n * self.page_size
        # no _sync_tables here: both adoption sites are followed in the
        # same scheduler step by prepare_prefill (unconditional sync) or
        # a mixed joint step's prepare_rows (its row always extends the
        # adopted length, so `changed` syncs) — avoids a redundant
        # device upload of the full table per adopted sequence

    def note_prefilled(self, slot: int, prompt) -> None:
        """Index a just-prefilled slot's fully-filled prompt pages."""
        if self.prefix is not None:
            self.prefix.register(list(prompt), self._tables[slot])

    def prefill(self, prompts):
        from ..ops import kv_cache as kvc

        b = len(prompts)
        assert b <= self.max_batch
        self.prepare_prefill(range(b), [len(p) for p in prompts])
        maxlen = max(len(p) for p in prompts)
        t = pad_to_bucket(maxlen, self.buckets)
        ids = np.zeros((self.max_batch, t), np.int32)
        lens = np.zeros((self.max_batch,), np.int32)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            lens[i] = len(p)
            if self.glm_lens is not None:
                self.glm_lens[i] = len(p)
        self.cache = kvc.set_lengths(
            self.cache, jnp.zeros((self.max_batch,), jnp.int32)
        )
        logits, self.cache = prefill_step(
            self.params, self.cfg, self.cache, jnp.asarray(ids),
            jnp.asarray(lens), jnp.zeros((self.max_batch,), jnp.int32),
        )
        return logits

    def decode(self, tokens, active):
        self.prepare_decode(np.asarray(active), 1)
        logits, self.cache = decode_step(
            self.params, self.cfg, self.cache, tokens, active,
            glm_lens=self.glm_arg(),
        )
        return logits

    # -- scheduler hooks ----------------------------------------------
    def prepare_prefill(self, slots, lens, starts=None) -> None:
        """Reserve page runs + tables for prompts about to prefill."""
        ps = self.page_size
        for slot, ln in zip(slots, lens):
            start = 0 if starts is None else int(starts[slot])
            blk0 = start // ps
            n_blocks = -(-(start + int(ln)) // ps)
            run = n_blocks - blk0
            if run > 0:
                first = self._alloc_run(run)
                if first is None:
                    raise RuntimeError("paged KV pool exhausted (prefill)")
                self._tables[slot, blk0:n_blocks] = first + np.arange(run)
            self._lens[slot] = start + int(ln)
            self._mapped[slot] = max(int(self._mapped[slot]), n_blocks)
        self._sync_tables()

    def prepare_decode(self, active_np, chunk: int = 1) -> None:
        """Claim growth pages for the next `chunk` decode tokens."""
        for slot in np.nonzero(active_np)[0]:
            self._ensure_pages(int(slot), int(self._lens[slot]) + chunk)
            self._lens[slot] += chunk
        self._sync_tables()

    def prepare_rows(self, target_lens) -> None:
        """Reserve pages up to per-slot TARGET lengths (speculative verify
        / mixed prefill rows).  Unlike prepare_decode the advance is
        provisional — the scheduler calls commit_lens with the accepted
        lengths afterwards; overshoot pages stay mapped for reuse."""
        changed = False
        for slot, tgt in enumerate(target_lens):
            tgt = int(tgt)
            if tgt > int(self._lens[slot]):
                self._ensure_pages(slot, tgt)
                self._lens[slot] = tgt
                changed = True
        if changed:
            self._sync_tables()

    def commit_lens(self, lens) -> None:
        """Snap the host length mirror to the ACCEPTED lengths after a
        speculative rollback (pages stay mapped; see _ensure_pages)."""
        self._lens[:] = np.asarray(lens, np.int64)

    def release_slot(self, slot: int) -> None:
        """Free a finished slot's pages back to the pool (every MAPPED
        block, incl. speculative overshoot past the committed length)."""
        n_blocks = int(self._mapped[slot])
        self._alloc.free_pages(self._tables[slot, :n_blocks].tolist())
        self._tables[slot, :n_blocks] = 0
        self._lens[slot] = 0
        self._mapped[slot] = 0

    def reorder_slots(self, src) -> None:
        """Beam KV reorder on the page pool — copy-on-write fork: slot b
        takes slot src[b]'s KV by ALIASING its full blocks (refcounted
        page-table copy: the prompt's KV is stored ONCE for all beams —
        beyond both the contiguous gather and the reference's block
        memcpys, model_utils.cpp:2239-2310) and copying only the partial
        tail page into a private fresh page (appends write there)."""
        import numpy as np
        from ..ops import kv_cache as kvc
        from ..ops import paged_kv as pkv

        src = np.asarray(src)
        b = src.shape[0]
        ps = self.page_size
        old_tables = self._tables.copy()
        old_lens = self._lens.copy()
        # Three phases so a slot that is BOTH a fork source and a fork
        # destination stays consistent: (1) sharers take their references
        # on every source's full blocks FIRST, (2) destinations drop their
        # old references (shared pages survive via refcount), (3) fresh
        # tail pages allocate (reusing just-freed pages is safe: the
        # device copy gathers all sources before scattering).
        plans = []
        for dst in range(b):
            s = int(src[dst])
            if s == dst:
                continue
            ln = int(old_lens[s])
            full = ln // ps
            tail = ln % ps
            self._alloc.share_pages(old_tables[s, :full].tolist())
            plans.append((dst, s, ln, full, tail))
        for dst, *_ in plans:
            self.release_slot(dst)
        dst_pages: list = []
        src_pages: list = []
        for dst, s, ln, full, tail in plans:
            self._tables[dst, :full] = old_tables[s, :full]
            if tail:
                # eviction-aware: the prefix cache may be holding the
                # free pool down (review: forks crashed under pressure
                # the cache itself created)
                fresh = self._alloc_page()
                if fresh is None:
                    raise RuntimeError("paged KV pool exhausted (fork)")
                self._tables[dst, full] = fresh
                dst_pages.append(fresh)
                src_pages.append(int(old_tables[s, full]))
            self._lens[dst] = ln
            self._mapped[dst] = full + (1 if tail else 0)
        self.cache = pkv.copy_pages(self.cache, dst_pages, src_pages,
                                    pad_to=self.max_batch)
        self._sync_tables()
        self.cache = kvc.set_lengths(
            self.cache, jnp.asarray(self._lens.astype(np.int32)))


# -- scheduler hooks (paged-aware) ---------------------------------------

def _noop(*a, **k):
    return None


Engine.prepare_prefill = _noop
Engine.prepare_decode = _noop
Engine.prepare_rows = _noop
Engine.prefix = None
Engine.prefix_lookup = lambda self, prompt: (0, [])
Engine.adopt_prefix = _noop
Engine.note_prefilled = _noop
Engine.commit_lens = _noop
Engine.release_slot = _noop
