"""Continuous-batching scheduler — FCFS pools + iteration-level steps.

Parity: the reference serving stack (models/model_utils/scheduler.{h,cpp},
pool.{h,cpp}):
  * `serve_pool` FCFS waiting/finished queues (pool.h:23-100)
  * `Iter_level_scheduler.step`: admission = min(max_requests - running,
    waiting) prefills per step; when full, decode until a sequence finishes
    before the next prefill (`steps_decoding_for_next_prefill`)
  * `Cont_batch_gen_worker.prepare_inputs`: mixed prefill/decode batches —
    here prefill and decode are separate jit programs (static shapes), and
    a scheduler step runs at most one padded-bucket prefill batch OR one
    decode step over all active slots (SURVEY.md §7 ragged-batching note).

Pure-Python control; all tensor work happens in the Engine's jitted steps.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as smp
from .engine import Engine, pad_to_bucket


class SeqStatus:
    WAITING = "waiting"
    PREFILL = "prefill"
    DECODING = "decoding"
    FINISHED = "finished"


@dataclasses.dataclass
class Sequence:
    """Parity: `sequence` struct (scheduler.h:22-40)."""

    request_id: int
    prompt: List[int]
    max_new_tokens: int = 128
    cached: int = 0  # prompt-prefix tokens already in the slot's KV
    status: str = SeqStatus.WAITING
    slot: int = -1
    generated: List[int] = dataclasses.field(default_factory=list)
    receive_time: float = dataclasses.field(default_factory=time.time)
    end_time: Optional[float] = None
    streamer: Optional[Callable[[int], None]] = None
    # mixed prefill+decode steps: the (clamped) prompt suffix still to be
    # written to KV, and how many of its tokens have been fed so far
    feed: Optional[List[int]] = None
    fed: int = 0


class ContinuousBatchingScheduler:
    """FCFS iteration-level scheduler over the Engine's fixed decode slots."""

    def __init__(self, engine: Engine,
                 params: Optional[smp.SamplingParams] = None,
                 eos_id: Optional[int] = None, seed: int = 0,
                 chunk_size: int = 8, speculative: bool = False,
                 spec_k: int = 7, spec_min_k: int = 3,
                 spec_max_ngram: int = 3, mixed_prefill: bool = False,
                 mixed_chunk: int = 32, adaptive_chunk: bool = True,
                 pipeline_decode: bool = True,
                 window: Optional[int] = None):
        from ..utils.profiler import Timings

        self.engine = engine
        self.eos_id = eos_id
        self.timings = Timings()
        # tokens decoded per device dispatch: sampling runs ON DEVICE and
        # the host syncs once per chunk (per-token host round-trips cost
        # more than the model step itself); 1 restores per-token stepping
        # (needed when a stopping_criteria must run between tokens)
        self.chunk_size = max(1, chunk_size)
        # deepen device-chained chunks when nothing is waiting: 4x fewer
        # host syncs per token in steady-state decode, identical outputs
        # (the device sampler/penalty stream advances per token, not per
        # chunk).  Costs one extra jit variant.
        self.adaptive_chunk = adaptive_chunk
        # one-chunk decode pipelining: dispatch chunk N+1 from the DEVICE
        # carry of chunk N (no host round-trip on the token), then process
        # chunk N's results while N+1 computes — host bookkeeping overlaps
        # device time.  Only in steady-state decode with guaranteed-stable
        # active set (budget/headroom pessimism); identical deliveries.
        self.pipeline_decode = pipeline_decode
        self._pending = None  # ("chunk"|"window", payload) — in-flight decode
        # EOS-aware device-side decode window (engine.decode_window): one
        # jit variant for EVERY window length (`n_steps` is a dynamic
        # while_loop bound), per-slot EOS/budget stops inside the loop,
        # and fewer/longer dispatches than the chunk ladder (the per-
        # dispatch fixed cost dominated the served-vs-offline gap).
        # `window` caps the tokens per dispatch — it bounds admission
        # latency for requests arriving mid-window (the ladder's 4x
        # chunk bound, by default).  window=1 / chunk_size=1 disables it
        # (per-token stepping for host stopping_criteria).
        if window is None:
            window = (4 if adaptive_chunk else 1) * max(1, chunk_size)
        self.window_cap = max(1, int(window))
        self.sp = params or smp.SamplingParams(do_sample=False)
        # -- batched speculative decoding (EXTENSION) ----------------------
        # Each step every slot proposes its own prompt-lookup draft and one
        # multi-token verify forward scores all slots at once (see
        # runtime/speculative.py for the single-sequence version + the
        # exactness argument).  Greedy params -> longest-agreeing-prefix
        # accept; sampled params -> per-slot rejection sampling against the
        # point-mass draft (every emitted token exactly target-distributed).
        # Adaptive policy: the draft length tracks an
        # EMA of accepted-tokens-per-verify (long drafts only pay when text
        # is locally repetitive), and when acceptance collapses the
        # scheduler falls back to plain chunked decode for a while before
        # re-probing ("backoff": verify at T>=2 costs more than a T=1
        # decode step, so speculating into random text is a net loss).
        self.speculative = speculative
        # -- mixed prefill+decode steps (EXTENSION; ORCA-style) ------------
        # Parity nuance: the reference concatenates PREFILL and DECODING
        # sequences into a single [1, sum(len)] eval (llama.cpp:64-90,
        # SURVEY §2.4); our default alternates a prefill batch with decode
        # steps (static shapes).  mixed_prefill=True restores the combined
        # iteration: each step feeds every PREFILL slot its next <=
        # mixed_chunk prompt tokens AND every DECODING slot its next token
        # (+ draft) in ONE forward — running decodes never stall behind a
        # long prompt admission (chunked prefill, bounded ITL).
        self.mixed_prefill = mixed_prefill
        self.mixed_chunk = max(1, mixed_chunk)
        if speculative or mixed_prefill:
            mode = "speculative" if speculative else "mixed-prefill"
            if self.sp.do_sample and (self.sp.mirostat or self.sp.tfs_z < 1.0
                                      or self.sp.typical_p < 1.0):
                raise ValueError(
                    f"sampled {mode} scheduling supports temperature/"
                    "top_k/top_p/penalties only (no host replica of "
                    "tfs/typical/mirostat)")
        if ((speculative or mixed_prefill)
                and hasattr(engine, "page_size")):
            # paged spans are written through the page table (append_span)
            # ONLY up to page_size tokens; longer T>1 windows take the
            # contiguous-run fast path, which spec/mixed growth pages do
            # not satisfy — so every joint-step row must fit in a page
            ps = int(engine.page_size)
            if ps < 2:
                raise ValueError("speculative/mixed scheduling on paged "
                                 "KV needs page_size >= 2")
            self.mixed_chunk = min(self.mixed_chunk, ps)
            spec_k = min(spec_k, ps - 1)
            spec_min_k = min(spec_min_k, ps - 1)
        if mixed_prefill and engine.cfg.rope_style == "chatglm":
            # GLM blank infilling makes prompt attention BIDIRECTIONAL:
            # early-chunk queries must see later prompt keys, which do not
            # exist yet under chunked prefill — the monolithic prefill
            # path is the only correct one (same guard as TP/PP)
            raise NotImplementedError(
                "mixed_prefill cannot chunk chatglm-1's bidirectional "
                "prompt (GLM blank-infilling mask); use the default "
                "alternating scheduler")
        self.spec_k = spec_k
        self.spec_min_k = spec_min_k
        self.spec_max_ngram = spec_max_ngram
        self.spec_backoff_chunks = 4      # plain chunks per backoff spell
        self._pens: Dict[int, object] = {}          # slot -> _PenalizedGreedy
        # host RNG for sampled-spec accept/residual draws (its own stream;
        # the device sampler key only drives prefill + backoff chunks)
        self._spec_rng = np.random.default_rng(np.uint64(seed) ^ 0x5EED)
        self._spec_gain_ema = float(spec_k) / 2     # optimistic start
        self._spec_backoff = 0
        self._dev_lens_dirty = False
        self._slot_len = np.zeros((engine.max_batch,), np.int64)  # host KV mirror
        self.waiting: Deque[Sequence] = deque()
        self.running: Dict[int, Sequence] = {}  # slot -> seq
        self.finished: Deque[Sequence] = deque()
        self.free_slots = list(range(engine.max_batch))[::-1]
        self._next_rid = 0
        vocab = engine.cfg.vocab_size
        self._seed = seed
        self.sampler = smp.init_state(
            jax.random.PRNGKey(seed), engine.max_batch, vocab,
            window=self.sp.penalty_window, tau=self.sp.mirostat_tau,
        )
        self._last_tokens = np.zeros((engine.max_batch,), np.int32)

    # ------------------------------------------------------------------
    def add_request(self, prompt: Sequence[int], max_new_tokens: int = 128,
                    streamer=None, cached: int = 0) -> int:
        """`cached`: prompt-prefix length whose KV is already present in the
        target slot (prompt-session files — parity:
        model_load_session_file, model_utils.cpp:1775-1830); only the
        suffix is prefilled."""
        rid = self._next_rid
        self._next_rid += 1
        cached = max(0, min(cached, len(prompt) - 1))
        self.waiting.append(
            Sequence(rid, list(prompt), max_new_tokens, streamer=streamer,
                     cached=cached)
        )
        return rid

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    def pop_finished(self) -> List[Sequence]:
        out = list(self.finished)
        self.finished.clear()
        return out

    def warmup(self, prompt_len: int = 8) -> None:
        """Compile the serving-path jit variants BEFORE real traffic by
        running one throwaway request to completion, then resetting the
        scheduler to its freshly-constructed state (deliveries after a
        warmup are identical to a cold scheduler's, minus the compiles).

        `prompt_len` picks which PREFILL bucket gets precompiled (buckets
        are powers of two — engine.buckets); pass your typical prompt
        length.  Other buckets still compile on first use.

        Covers the decode chunk ladder (chunk_size, and 4x under
        adaptive_chunk, each with the pipelined dispatch) and — for
        speculative/mixed modes — the small verify buckets.  Without this
        the first request to reach steady-state decode pays each 7B-scale
        compile inside its own latency: the on-chip serving leg measured
        150 ms/tok on the arm that compiled chunk=64 mid-run vs 8.5 with
        it prebuilt (BENCH_NOTES 2026-08-19).  The reference has no
        analogue (C++ graphs need no compile); this is the XLA-native
        equivalent of its model_init warm paths."""
        assert not self.has_work, "warmup() must run before any request"
        budget = self.chunk_size * (6 if self.adaptive_chunk else 2) + 2
        if self.speculative or self.mixed_prefill:
            budget = max(budget, 2 * self.mixed_chunk
                         + 2 * (self.spec_k + 1) + 4)
        self.add_request([1] * max(1, prompt_len), budget)
        self.run_to_completion()
        self.finished.clear()
        # reset to constructed state: device sampler stream, host RNG,
        # speculative adaptivity, per-slot mirrors
        self.sampler = smp.init_state(
            jax.random.PRNGKey(self._seed), self.engine.max_batch,
            self.engine.cfg.vocab_size, window=self.sp.penalty_window,
            tau=self.sp.mirostat_tau,
        )
        self._spec_rng = np.random.default_rng(np.uint64(self._seed)
                                               ^ 0x5EED)
        self._spec_gain_ema = float(self.spec_k) / 2
        self._spec_backoff = 0
        self._pens.clear()
        self._pending = None
        self._dev_lens_dirty = False
        self._slot_len[:] = 0
        self._last_tokens[:] = 0
        self.timings = type(self.timings)()

    # ------------------------------------------------------------------
    def step(self) -> None:
        """One scheduler iteration: admit+prefill a batch of new requests,
        or decode one token for all running slots — or, with
        mixed_prefill, do both in one combined forward."""
        if self.waiting:
            # a pending chunk may finish sequences and free slots; the
            # admission decision must see the post-flush state (identical
            # scheduling order to the unpipelined path)
            self._flush_pending()
        admit = bool(self.waiting and self.free_slots)
        if self.mixed_prefill:
            mid = any(q.status == SeqStatus.PREFILL
                      for q in self.running.values())
            decoding = any(q.status == SeqStatus.DECODING
                           for q in self.running.values())
            if mid or (admit and decoding):
                self._flush_pending()
                if admit:
                    self._admit_mixed()
                self._joint_step(include_prefill=True)
                return
        if admit:
            self._prefill_batch()
        elif self.running:
            if self.speculative and self._spec_backoff == 0:
                self._flush_pending()
                self._joint_step(include_prefill=False)
            else:
                if self._spec_backoff > 0:
                    self._spec_backoff -= 1
                    if self._spec_backoff == 0:
                        # re-probe speculation with a clean slate
                        self._spec_gain_ema = 1.0
                self._decode_step()

    def _sync_dev_lengths(self) -> None:
        """Push the host KV-length mirror to the device cache.  Spec verify
        masks by explicit kv_lens args, so device `cache.lengths` is synced
        lazily — only prefill/eviction/chunked-decode actually read it."""
        from ..ops import kv_cache as kvc

        self.engine.cache = kvc.set_lengths(
            self.engine.cache,
            jnp.asarray(self._slot_len.astype(np.int32)),
        )
        self._dev_lens_dirty = False

    def _penalties_active(self) -> bool:
        return (self.sp.repetition_penalty != 1.0
                or self.sp.frequency_penalty != 0.0
                or self.sp.presence_penalty != 0.0)

    def run_to_completion(self) -> List[Sequence]:
        res = []
        while self.has_work:
            self.step()
            res.extend(self.pop_finished())
        return res

    # ------------------------------------------------------------------
    def _prefill_batch(self) -> None:
        if self._dev_lens_dirty:
            self._sync_dev_lengths()  # spectator kv_lens read cache.lengths
        # admission rule parity: min(free slots, waiting)
        batch: List[Sequence] = []
        while self.waiting and self.free_slots:
            seq = self.waiting.popleft()
            seq.slot = self.free_slots.pop()
            seq.status = SeqStatus.PREFILL
            # registered immediately so `has_work` stays true while the
            # (potentially compiling) prefill runs
            self.running[seq.slot] = seq
            if seq.cached == 0 and len(seq.prompt) <= self.engine.max_len - 1:
                # automatic prefix cache (paged engines): alias indexed
                # full prompt pages copy-on-write, prefill the suffix
                # only.  Over-long prompts take the uncached clamp path
                # (the bucket clamp drops leading tokens; an adopted
                # prefix + unclamped suffix would overrun the page table)
                n, pages = self.engine.prefix_lookup(seq.prompt)
                if n:
                    self.engine.adopt_prefix(seq.slot, pages)
                    seq.cached = n
            batch.append(seq)

        eng = self.engine
        maxlen = max(len(s.prompt) - s.cached for s in batch)
        from .engine import pad_to_bucket

        t = pad_to_bucket(maxlen, eng.buckets)
        ids = np.zeros((eng.max_batch, t), np.int32)
        lens = np.zeros((eng.max_batch,), np.int32)
        start = np.zeros((eng.max_batch,), np.int32)
        for s in batch:
            p = s.prompt[s.cached:][-t:]  # clamp over-long to the bucket
            ids[s.slot, : len(p)] = p
            lens[s.slot] = len(p)
            start[s.slot] = s.cached
            if eng.glm_lens is not None:
                eng.glm_lens[s.slot] = s.cached + len(p)
        eng.prepare_prefill([s.slot for s in batch],
                            [lens[s.slot] for s in batch], starts=start)
        with self.timings.timer("prefill", int(lens.sum())):
            logits = eng.run_prefill(jnp.asarray(ids), jnp.asarray(lens),
                                     jnp.asarray(start))
            logits.block_until_ready()
        for s in batch:
            # index the prompt's full pages BEFORE commit (a first-token
            # EOS releases the slot); skip bucket-clamped prompts — their
            # stored KV is not the full token chain
            if s.cached + int(lens[s.slot]) == len(s.prompt):
                eng.note_prefilled(s.slot, s.prompt)
        self._sample_and_commit(logits, {s.slot: s for s in batch},
                                prompt_obs=batch)
        for s in batch:
            if s.status != SeqStatus.FINISHED:  # first token may be eos
                self._slot_len[s.slot] = int(lens[s.slot]) + s.cached
                s.status = SeqStatus.DECODING

    def _can_pipeline(self, active_prev: np.ndarray, chunk: int) -> bool:
        """True iff a next chunk may be dispatched from the pending
        chunk's device carry with the SAME active set: no admission
        possible, pure decode, and — pessimistically, as if every pending
        token is consumed — no slot can finish on budget or run out of
        context headroom (EOS mid-chunk is fine: the extra chunk's tokens
        for that slot are discarded exactly like mid-chunk tails)."""
        if (not self.pipeline_decode or self.waiting
                or self._dev_lens_dirty or self.speculative
                or self.mixed_prefill):
            return False
        # EVERY dispatched slot must still be running+DECODING: a slot
        # that finished (EOS) since the dispatch would otherwise ride
        # along in the stale mask forever — advancing _slot_len and (on
        # paged engines) claiming pages for a freed slot with no commit
        # ever undoing either
        for slot in np.nonzero(active_prev)[0]:
            seq = self.running.get(int(slot))
            if seq is None or seq.status != SeqStatus.DECODING:
                return False
            if seq.max_new_tokens - len(seq.generated) <= chunk:
                return False
        for slot, seq in self.running.items():
            if seq.status == SeqStatus.DECODING and not active_prev[slot]:
                return False  # active set changed
        # _slot_len already includes the pending chunk (advanced at
        # dispatch); staying clear of the window keeps eviction points
        # identical to the unpipelined schedule
        if int(self._slot_len[active_prev].max()) + chunk > \
                self.engine.max_len:
            return False
        return True

    def _dispatch_decode(self, tokens, active_np: np.ndarray,
                         chunk: int) -> None:
        eng = self.engine
        eng.prepare_decode(active_np, chunk)
        with self.timings.timer("decode", int(active_np.sum()) * chunk):
            toks, self.sampler = eng.run_decode_chunk(
                self.sampler, tokens, jnp.asarray(active_np), chunk,
                self.sp,
            )
        self._slot_len[active_np] += chunk
        self._pending = ("chunk", (toks, active_np, chunk))

    def _flush_pending(self) -> None:
        if self._pending is None:
            return
        kind, payload = self._pending
        self._pending = None
        if kind == "window":
            buf, em, _toks, _act, _bud, active_np, w = payload
            self._commit_window(buf, em, active_np, w)
            return
        toks, active_np, chunk = payload
        toks_np = np.asarray(toks)  # [B, chunk] — the one host sync
        self._commit_decode(toks_np, active_np, chunk)

    def _commit_decode(self, toks_np: np.ndarray, active_np: np.ndarray,
                       chunk: int) -> None:
        active_np = active_np.copy()
        for step in range(chunk):
            for slot, seq in list(self.running.items()):
                if not active_np[slot]:
                    continue
                tok = int(toks_np[slot, step])
                seq.generated.append(tok)
                self._last_tokens[slot] = tok
                pen = self._pens.get(slot)
                if pen is not None:
                    pen.observe([tok])  # keep host greedy state resumable
                if seq.streamer is not None:
                    seq.streamer(tok)
                if (self.eos_id is not None and tok == self.eos_id) or len(
                    seq.generated
                ) >= seq.max_new_tokens:
                    active_np[slot] = False  # later chunk tokens discarded
                    self._finish(slot, seq)

    def _use_window(self) -> bool:
        return (getattr(self.engine, "supports_window", False)
                and not self.speculative and not self.mixed_prefill
                and self.window_cap > 1 and self.chunk_size > 1)

    def _decode_step(self) -> None:
        if self._use_window():
            self._window_step()
            return
        if self._pending is not None:
            _kind, (toks_prev, active_prev, chunk_prev) = self._pending
            if self._can_pipeline(active_prev, chunk_prev):
                # dispatch chunk N+1 from chunk N's device carry, THEN
                # process N's tokens while N+1 computes on device
                self._pending = None
                self._dispatch_decode(toks_prev[:, -1], active_prev,
                                      chunk_prev)
                self._commit_decode(np.asarray(toks_prev), active_prev,
                                    chunk_prev)
                return
            self._flush_pending()
        if self._dev_lens_dirty:
            self._sync_dev_lengths()
            self._sync_sampler_from_pens()
        eng = self.engine
        active_np = np.zeros((eng.max_batch,), bool)
        for slot, seq in self.running.items():
            if seq.status == SeqStatus.DECODING:
                active_np[slot] = True
        if not active_np.any():
            return
        # chunk comes from a TWO-STEP ladder so at most two jit variants
        # exist; sequences finishing mid-chunk simply discard their tail
        # tokens (the slot's KV overshoot is reset when the slot is reused)
        chunk = self.chunk_size
        if self.adaptive_chunk and not self.waiting:
            big = 4 * self.chunk_size
            remaining = min(
                seq.max_new_tokens - len(seq.generated)
                for slot, seq in self.running.items() if active_np[slot])
            headroom = self.engine.max_len - int(
                self._slot_len[active_np].max())
            # stay on the base chunk near the context window so eviction
            # fires at exactly the same points as the fixed-chunk schedule
            if remaining >= big and headroom >= big:
                chunk = big
        self._maybe_evict(active_np, chunk)
        self._dispatch_decode(jnp.asarray(self._last_tokens), active_np,
                              chunk)
        if not self._can_pipeline(active_np, chunk):
            self._flush_pending()

    # -- EOS-aware device decode windows --------------------------------
    def _window_step(self) -> None:
        """Decode via engine.run_decode_window: up to `window_cap` tokens
        per dispatch, one compiled program for every window length
        (dynamic while_loop bound), per-slot EOS/budget deactivation ON
        DEVICE — a slot stops consuming compute/KV at exactly the token
        the sequential schedule would (the chunk ladder over-decoded to
        the chunk boundary and discarded).  Pipelining dispatches window
        N+1 from window N's device-carried (tokens, active, budget) —
        unlike the chunk path it needs no budget pessimism, because
        finishing slots deactivate inside the loop."""
        eng = self.engine
        if self._pending is not None:
            kind, payload = self._pending
            if kind == "window":
                buf, em, toks_d, act_d, bud_d, active_np, w = payload
                if self._can_pipeline_window(active_np, w):
                    self._pending = None
                    self._dispatch_window(toks_d, act_d, bud_d, active_np,
                                          w)
                    self._commit_window(buf, em, active_np, w)
                    return
            self._flush_pending()
        if self._dev_lens_dirty:
            self._sync_dev_lengths()
            self._sync_sampler_from_pens()
        active_np = np.zeros((eng.max_batch,), bool)
        for slot, seq in self.running.items():
            if seq.status == SeqStatus.DECODING:
                active_np[slot] = True
        if not active_np.any():
            return
        # window sizing mirrors the adaptive chunk ladder: base chunk when
        # requests are waiting (responsive admission) or near the context
        # limit (eviction fires at the fixed-chunk schedule's points);
        # otherwise up to window_cap — the device stops early per slot
        w = min(self.chunk_size, self.window_cap)  # never exceed the
        #   static token-buffer cap (w > cap would clamp the buffer DUS
        #   and silently drop emitted tokens)
        if not self.waiting:
            headroom = eng.max_len - int(self._slot_len[active_np].max())
            rem = max(seq.max_new_tokens - len(seq.generated)
                      for slot, seq in self.running.items()
                      if active_np[slot])
            big = min(self.window_cap, max(w, rem))
            if big <= headroom:
                w = big
        self._maybe_evict(active_np, w)
        budget = np.zeros((eng.max_batch,), np.int32)
        for slot, seq in self.running.items():
            if active_np[slot]:
                budget[slot] = seq.max_new_tokens - len(seq.generated)
        self._dispatch_window(jnp.asarray(self._last_tokens),
                              jnp.asarray(active_np), jnp.asarray(budget),
                              active_np, w)
        if not self._can_pipeline_window(active_np, w):
            self._flush_pending()

    def _dispatch_window(self, tokens, act_dev, bud_dev,
                         active_np: np.ndarray, w: int) -> None:
        eng = self.engine
        eng.prepare_decode(active_np, w)
        with self.timings.timer("decode", int(active_np.sum()) * w):
            buf, em, toks_d, act_d, bud_d, self.sampler = \
                eng.run_decode_window(self.sampler, tokens, act_dev,
                                      bud_dev, w, self.window_cap, self.sp,
                                      self.eos_id)
        # pessimistic mirror advance (device truth is base + emitted; the
        # commit rolls back by w and applies the actual count)
        self._slot_len[active_np] += w
        self._pending = ("window", (buf, em, toks_d, act_d, bud_d,
                                    active_np, w))

    def _commit_window(self, buf, em, active_np: np.ndarray,
                       w: int) -> None:
        buf_np = np.asarray(buf)   # [B, cap] — the one host sync
        em_np = np.asarray(em)     # [B]
        for slot, seq in list(self.running.items()):
            if not active_np[slot]:
                continue
            cnt = int(em_np[slot])
            self._slot_len[slot] += cnt - w  # undo the pessimistic advance
            toks = buf_np[slot, :cnt].tolist()
            pen = self._pens.get(slot)
            for tok in toks:
                seq.generated.append(tok)
                self._last_tokens[slot] = tok
                if pen is not None:
                    pen.observe([tok])
                if seq.streamer is not None:
                    seq.streamer(tok)
            if toks and ((self.eos_id is not None
                          and toks[-1] == self.eos_id)
                         or len(seq.generated) >= seq.max_new_tokens):
                self._finish(slot, seq)
        # paged KV: snap the page-reservation mirror to the committed
        # lengths (slots early-stopped on device reserved the full window;
        # overshoot pages stay mapped — no-op on base engines).  During
        # pipelining _slot_len still carries the in-flight window's
        # pessimistic advance, which is exactly the reservation that
        # window may write into.
        self.engine.commit_lens(self._slot_len)

    def _can_pipeline_window(self, active_np: np.ndarray, w: int) -> bool:
        """Window N+1 may be dispatched from N's device carries whenever
        no admission/eviction/host-state change can interleave — EOS and
        budget stops need NO host knowledge (they deactivate on device,
        and an all-inactive window exits its while_loop immediately)."""
        if (not self.pipeline_decode or self.waiting
                or self._dev_lens_dirty):
            return False
        # every dispatched slot must still be running+DECODING — a slot
        # that finished since the dispatch must break pipelining, or the
        # stale mask re-advances its zeroed _slot_len (and claims pages
        # for the freed slot on paged engines) with no commit undoing it.
        # The one overlapped window a finishing slot DOES ride in stays
        # exact: its pages were claimed before release_slot freed them,
        # and _finish zeroes _slot_len after both pessimistic advances.
        for slot in np.nonzero(active_np)[0]:
            seq = self.running.get(int(slot))
            if seq is None or seq.status != SeqStatus.DECODING:
                return False
        for slot, seq in self.running.items():
            if seq.status == SeqStatus.DECODING and not active_np[slot]:
                return False  # active set changed under us
        # context headroom for one more full window (slot_len already
        # carries the pending window's pessimistic advance)
        if int(self._slot_len[active_np].max()) + w > self.engine.max_len:
            return False
        return True

    # -- mixed admission (chunked prefill) ------------------------------
    def _admit_mixed(self) -> None:
        """Admit waiting requests into free slots for CHUNKED prefill: the
        prompt suffix is fed `mixed_chunk` tokens per joint step instead of
        one monolithic prefill dispatch (clamped to the context window like
        `_prefill_batch`'s bucket clamp)."""
        while self.waiting and self.free_slots:
            seq = self.waiting.popleft()
            seq.slot = self.free_slots.pop()
            seq.status = SeqStatus.PREFILL
            if seq.cached == 0 and len(seq.prompt) <= self.engine.max_len - 1:
                # prefix-cache hits apply to chunked admission too (the
                # completed prompt is not re-registered here — only the
                # monolithic prefill path indexes new pages); over-long
                # prompts keep the uncached clamp path
                n, pages = self.engine.prefix_lookup(seq.prompt)
                if n:
                    self.engine.adopt_prefix(seq.slot, pages)
                    seq.cached = n
            cap = max(1, self.engine.max_len - 1 - seq.cached)
            seq.feed = list(seq.prompt[seq.cached:])[-cap:]
            seq.fed = 0
            self._slot_len[seq.slot] = seq.cached
            self._dev_lens_dirty = True  # joint steps mask by explicit args
            if self.engine.glm_lens is not None:
                self.engine.glm_lens[seq.slot] = seq.cached + len(seq.feed)
            self.running[seq.slot] = seq

    # -- batched speculative decoding / mixed prefill+decode ------------
    def _joint_step(self, include_prefill: bool) -> None:
        """One combined forward for every slot with work.

        DECODING slots contribute a [last_tok, *draft] row (draft empty
        unless speculation is on): the accept loop keeps the longest
        agreeing prefix plus the correction (greedy) or rejection-samples
        against the point-mass draft (sampled) — per-slot output is exactly
        the sequential sequence, ~1+accepted tokens per dispatch.

        With include_prefill, PREFILL slots contribute their next <=
        mixed_chunk prompt tokens as forced rows (logits ignored until the
        chunk that completes the prompt, whose last row samples the first
        token) — the ORCA-style mixed iteration of the reference
        (llama.cpp:64-90: one eval over concatenated prefill+decode
        sequences, rope/attention per infer group = per slot here)."""
        from .speculative import _SPEC_BUCKETS, propose_ngram

        eng = self.engine
        slots = [(slot, seq) for slot, seq in self.running.items()
                 if seq.status == SeqStatus.DECODING]
        slots_p = [(slot, seq) for slot, seq in self.running.items()
                   if seq.status == SeqStatus.PREFILL] if include_prefill \
            else []
        if not slots and not slots_p:
            return
        speculate = self.speculative and self._spec_backoff == 0
        # adaptive draft length: long drafts only pay off when acceptance
        # is high (verify cost grows with the padded bucket)
        k = self.spec_k if self._spec_gain_ema >= 2.0 else self.spec_min_k
        b = eng.max_batch
        drafts: Dict[int, List[int]] = {}
        for slot, seq in slots:
            d = (propose_ngram(seq.prompt + seq.generated, k,
                               max_ngram=self.spec_max_ngram) or []) \
                if speculate else []
            # never draft past the remaining budget (keeps the accept loop's
            # invariant that only the correction token can finish a slot)
            room = seq.max_new_tokens - len(seq.generated) - 1
            drafts[slot] = d[:max(0, room)]
        rows: Dict[int, List[int]] = {
            slot: [int(self._last_tokens[slot])] + drafts[slot]
            for slot, _ in slots
        }
        for slot, seq in slots_p:
            rows[slot] = list(seq.feed[seq.fed: seq.fed + self.mixed_chunk])
        max_seq = max(len(r) for r in rows.values())
        buckets = _SPEC_BUCKETS if self.mixed_chunk <= _SPEC_BUCKETS[-1] \
            else _SPEC_BUCKETS + (self.mixed_chunk,)
        if hasattr(eng, "page_size"):
            # the padded window must also fit in one page (append_span
            # routing; rows are already clamped to page_size at __init__,
            # but a power-of-two bucket could pad past a non-pow2 page)
            ps = int(eng.page_size)
            buckets = tuple(b for b in buckets if b <= ps)
            if not buckets or buckets[-1] < ps:
                buckets = buckets + (ps,)
        pad_t = pad_to_bucket(max_seq, buckets)

        active_np = np.zeros((b,), bool)
        for slot, _ in slots:
            active_np[slot] = True
        # eviction lookahead: only DECODING slots can run out of window
        # (prefill slots fit by the admission cap), and only by their own
        # row length (pad_t may be prefill-chunk sized)
        look = max((len(rows[slot]) for slot, _ in slots), default=0)
        if slots and (self._slot_len[active_np] + look
                      > eng.max_len - 1).any():
            if self._dev_lens_dirty:
                self._sync_dev_lengths()  # evict ops read cache.lengths
            self._maybe_evict(active_np, look)

        ids = np.zeros((b, pad_t), np.int32)
        seq_lens = np.zeros((b,), np.int32)
        for slot, row in rows.items():
            ids[slot, : len(row)] = row
            seq_lens[slot] = len(row)
        pos = np.arange(pad_t)[None, :] + self._slot_len[:, None]
        in_range = np.arange(pad_t)[None, :] < seq_lens[:, None]
        pos = np.where(in_range, pos, eng.max_len - 1).astype(np.int32)
        kv_lens = (self._slot_len + seq_lens).astype(np.int32)
        # paged KV: reserve pages up to each row's end (provisional —
        # commit_lens snaps back to the accepted lengths below; base
        # engines no-op).  Idle slots get target 0: never reserve for a
        # slot without rows.
        eng.prepare_rows(np.where(seq_lens > 0,
                                  self._slot_len + seq_lens, 0))

        sampled = self.sp.do_sample
        penalized = self._penalties_active()
        timer_key = "mixed" if slots_p else "decode"
        with self.timings.timer(timer_key, int(seq_lens.sum())):
            if sampled or penalized:
                # fetch only the rows the accept loops read: every decode
                # row, but just the prompt-completing row of prefill
                # chunks (prefill rows are forced tokens — their logits
                # are dead weight at [B, pad_t, vocab] scale)
                need = 1
                for slot, _ in slots:
                    need = max(need, len(rows[slot]))
                r = pad_to_bucket(need, buckets) if slots_p else pad_t
                r = min(r, pad_t)
                row_idx = np.minimum(
                    np.broadcast_to(np.arange(r), (b, r)), pad_t - 1
                ).astype(np.int32).copy()
                for slot, _ in slots_p:
                    row_idx[slot, :] = len(rows[slot]) - 1
                rows_dev = eng.run_verify_rows(
                    jnp.asarray(ids), jnp.asarray(pos),
                    jnp.asarray(kv_lens), jnp.asarray(row_idx),
                )
                rows_np = np.asarray(rows_dev, np.float32)
            else:
                g_ids = eng.run_verify_argmax(
                    jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(kv_lens)
                )
                g_np = np.asarray(g_ids)  # [B, pad_t] — the one host sync

        # prefill slots: commit the fed chunk; the completing chunk's last
        # row samples the request's first token (host-side, same replicas
        # as the accept loops)
        for slot, seq in slots_p:
            n = len(rows[slot])
            seq.fed += n
            self._slot_len[slot] += n
            self._dev_lens_dirty = True
            if seq.fed < len(seq.feed):
                continue
            from .speculative import _PenalizedGreedy, _target_dist

            pen = _PenalizedGreedy(seq.prompt, self.sp)
            self._pens[slot] = pen
            # gathered layout: every fetched row of a prefill slot IS the
            # prompt-completing row (see row_idx above)
            if sampled:
                p0 = _target_dist(rows_np[slot, 0], self.sp, pen.obs)
                tok = int(self._spec_rng.choice(p0.shape[0], p=p0))
            elif penalized:
                tok = pen.pick(rows_np[slot, 0], [])
            else:
                tok = int(g_np[slot, n - 1])
            pen.observe([tok])
            seq.status = SeqStatus.DECODING
            self._last_tokens[slot] = tok
            seq.generated.append(tok)
            if seq.streamer is not None:
                seq.streamer(tok)
            if (self.eos_id is not None and tok == self.eos_id) or len(
                seq.generated
            ) >= seq.max_new_tokens:
                self._finish(slot, seq)

        gain_total = 0
        for slot, seq in slots:
            draft = drafts[slot]
            pen = self._pens[slot]
            if sampled:
                # rejection sampling against the point-mass draft (same
                # math as speculative.generate_sampled_speculative): the
                # emitted token at each position is exactly p_j-distributed
                from .speculative import _target_dist

                rng = self._spec_rng
                acc: List[int] = []
                while True:
                    j = len(acc)
                    p_j = _target_dist(rows_np[slot, j], self.sp,
                                       pen.obs + acc)
                    if (j < len(draft)
                            and not (self.eos_id is not None
                                     and draft[j] == self.eos_id)):
                        x = draft[j]
                        if rng.random() < p_j[x]:
                            acc.append(x)
                            continue
                        q = p_j.copy()
                        q[x] = 0.0
                        s = float(q.sum())
                        if s <= 0.0:  # point mass at x: accept is forced
                            acc.append(x)
                            continue
                        nxt = int(rng.choice(q.shape[0], p=q / s))
                        break
                    nxt = int(rng.choice(p_j.shape[0], p=p_j))
                    break
                accepted = len(acc)
                committed = acc + [nxt]
            else:
                if penalized:
                    picks = lambda j: pen.pick(rows_np[slot, j], draft[:j])  # noqa: B023,E731,E501
                else:
                    picks = lambda j: int(g_np[slot, j])  # noqa: B023,E731
                accepted = 0
                while True:
                    g = picks(accepted)
                    if (accepted < len(draft) and g == draft[accepted]
                            and not (self.eos_id is not None
                                     and g == self.eos_id)):
                        accepted += 1
                    else:
                        nxt = g
                        break
                committed = draft[:accepted] + [nxt]
            gain_total += accepted
            pen.observe(committed)
            # KV advanced by last_tok + accepted drafts; nxt's KV is written
            # by the NEXT step (it is that step's input token).  Rejected
            # rows need no erase: kv_lens masks them and later writes
            # overwrite (trash-tolerant cache contract).
            self._slot_len[slot] += 1 + accepted
            self._dev_lens_dirty = True
            for tok in committed:
                seq.generated.append(tok)
                self._last_tokens[slot] = tok
                if seq.streamer is not None:
                    seq.streamer(tok)
                if (self.eos_id is not None and tok == self.eos_id) or len(
                    seq.generated
                ) >= seq.max_new_tokens:
                    self._finish(slot, seq)
                    break

        if speculate and slots:
            mean_gain = gain_total / len(slots)
            self._spec_gain_ema = 0.8 * self._spec_gain_ema + 0.2 * mean_gain
            if self._spec_gain_ema < 0.35 and self.spec_backoff_chunks > 0:
                # speculation is not paying — plain chunked decode for a
                # spell
                self._spec_backoff = self.spec_backoff_chunks
        # paged KV: roll the provisional page-reservation lengths back to
        # what was actually committed (no-op on base engines)
        eng.commit_lens(self._slot_len)

    def _finish(self, slot: int, seq: Sequence) -> None:
        seq.status = SeqStatus.FINISHED
        seq.end_time = time.time()
        self.running.pop(slot, None)
        self.free_slots.append(slot)
        self.finished.append(seq)
        self._pens.pop(slot, None)
        self.engine.release_slot(slot)
        self._slot_len[slot] = 0

    def _sync_sampler_from_pens(self) -> None:
        """Rebuild the device sampler's penalty state from the host
        replicas (the device ring/counts go stale during spec/mixed steps,
        which sample host-side; plain chunked decode samples on device)."""
        if not ((self.speculative or self.mixed_prefill)
                and self._penalties_active()):
            return
        for slot, seq in self.running.items():
            pen = self._pens.get(slot)
            if pen is None:
                continue
            self.sampler = smp.reset_slot(
                self.sampler, slot, self.sp.mirostat_tau
            )
            if pen.obs:
                self.sampler = smp.observe_prompt_slot(
                    self.sampler, slot, pen.obs
                )

    def _maybe_evict(self, active_np: np.ndarray,
                     lookahead: int = 1) -> None:
        """StreamingLLM infinite inference: when a slot's KV is full, keep
        `n_keep` sink tokens and drop `n_discard`, then either shift-RoPE
        the remaining K in place (ring buffer, llama.cpp:437-446) or
        re-evaluate the slid tokens from history (main_pybind.cpp:573-587
        discard-and-re-eval)."""
        from ..ops import kv_cache as kvc

        eng = self.engine
        lengths = self._slot_len.copy()  # host mirror: no device sync
        full = active_np & (lengths + lookahead > eng.max_len - 1)
        if not full.any():
            return
        if hasattr(eng, "page_size"):
            if eng.shift_roped_k:
                # shift-RoPE ring stays contiguous-only: the in-place K
                # rotation kernel (kv_cache.shift_ring) walks a dense
                # [B, H, T, D] block; on the page pool the slot's rows are
                # scattered across refcount-shared physical pages, so an
                # in-place rotation would corrupt prefix-cache/COW readers
                # aliasing the same pages.  Discard-and-re-eval maps
                # naturally onto page release instead (below).
                raise NotImplementedError(
                    "shift_roped_k requires the contiguous KV cache; the "
                    "paged cache supports discard-and-re-eval eviction "
                    "(docs/paged_attention.md)")
            self._evict_paged(full, lengths, lookahead)
            return
        n_keep = eng.n_keep
        nd = max(eng.discard_count(), lookahead)  # stay ahead of the chunk
        if eng.shift_roped_k:
            if eng.cfg.rope_style not in ("neox", "gptj"):
                raise ValueError("shift_roped_k requires a rotary arch "
                                 "(reference: model_utils.cpp:1437-1439)")
            eng.cache = kvc.shift_ring(
                eng.cache, n_keep, nd, eng.rope_inv_freq(),
                style=eng.cfg.rope_style, rot_dim=eng.cfg.rot_dim,
                slot_mask=jnp.asarray(full),
            )
            self._slot_len[full] = np.maximum(
                self._slot_len[full] - nd, n_keep
            )
            return
        # discard-and-re-eval from token history (slot by slot)
        eng.cache = kvc.evict(eng.cache, n_keep, nd, jnp.asarray(full))
        self._slot_len[full] = np.maximum(lengths[full] - nd, n_keep)
        for slot in np.nonzero(full)[0]:
            seq = self.running.get(int(slot))
            if seq is None:
                continue
            stored = (list(seq.prompt) + seq.generated[:-1])[-int(
                lengths[slot]):]
            re_eval = stored[n_keep + nd:]
            # reset the slot to the sink region, then re-prefill the rest
            # at positions starting n_keep (other slots are spectators)
            new_len = self._slot_len.astype(np.int32).copy()
            new_len[slot] = n_keep
            eng.cache = kvc.set_lengths(eng.cache, jnp.asarray(new_len))
            ids = np.zeros((eng.max_batch, pad_to_bucket(
                len(re_eval), eng.buckets)), np.int32)
            lens = np.zeros((eng.max_batch,), np.int32)
            start = np.zeros((eng.max_batch,), np.int32)
            ids[slot, : len(re_eval)] = re_eval
            lens[slot] = len(re_eval)
            start[slot] = n_keep
            _logits = eng.run_prefill(jnp.asarray(ids), jnp.asarray(lens),
                                      jnp.asarray(start))
            self._slot_len[slot] = n_keep + len(re_eval)

    def _evict_paged(self, full: np.ndarray, lengths: np.ndarray,
                     lookahead: int) -> None:
        """StreamingLLM discard-and-re-eval on the paged cache, via page
        release (parity: main_pybind.cpp:573-587 "infinite inference",
        docs/infinite_inference.md:6-8 — the reference keeps `n_keep` sink
        tokens, drops `n_discard`, and re-evaluates the remainder).

        Page-pool mapping: the sink region [0, n_keep) stays in its
        pages; every mapped page past the sink is RELEASED back to the
        pool (refcounted — prefix-cache/COW sharers keep theirs), and the
        re-evaluated suffix re-prefills into freshly claimed pages at
        positions starting n_keep.  The partial sink page (n_keep % ps)
        receives re-prefill writes, so when it is aliased it is first
        copied out copy-on-write — sink KV must not mutate under other
        readers."""
        from ..ops import kv_cache as kvc
        from ..ops import paged_kv as pkv

        eng = self.engine
        ps = eng.page_size
        n_keep = eng.n_keep
        nd = max(eng.discard_count(), lookahead)
        sink_blocks = -(-n_keep // ps)
        for slot in np.nonzero(full)[0]:
            slot = int(slot)
            seq = self.running.get(slot)
            if seq is None:
                continue
            stored = (list(seq.prompt) + seq.generated[:-1])[-int(
                lengths[slot]):]
            re_eval = stored[n_keep + nd:]
            # release every mapped page past the sink region
            mapped = int(eng._mapped[slot])
            if mapped > sink_blocks:
                eng._alloc.free_pages(
                    eng._tables[slot, sink_blocks:mapped].tolist())
                eng._tables[slot, sink_blocks:mapped] = 0
            eng._mapped[slot] = min(mapped, sink_blocks)
            # COW the partial sink page out from under any sharers
            if n_keep % ps and sink_blocks >= 1:
                pg = int(eng._tables[slot, sink_blocks - 1])
                if eng._alloc.refs.get(pg, 1) > 1:
                    fresh = eng._alloc_page()
                    if fresh is None:
                        raise RuntimeError(
                            "paged KV pool exhausted (eviction COW)")
                    eng.cache = pkv.copy_pages(
                        eng.cache, [fresh], [pg], pad_to=eng.max_batch)
                    eng._alloc.free_pages([pg])
                    eng._tables[slot, sink_blocks - 1] = fresh
            # reset the slot to the sink, claim pages for the suffix, and
            # re-prefill it at positions starting n_keep (other slots are
            # spectators in the padded batch)
            new_len = self._slot_len.astype(np.int32).copy()
            new_len[slot] = n_keep
            eng._lens[slot] = n_keep
            eng.cache = kvc.set_lengths(eng.cache, jnp.asarray(new_len))
            eng._ensure_pages(slot, n_keep + len(re_eval))
            eng._lens[slot] = n_keep + len(re_eval)
            eng._sync_tables()
            ids = np.zeros((eng.max_batch, pad_to_bucket(
                len(re_eval), eng.buckets)), np.int32)
            lens = np.zeros((eng.max_batch,), np.int32)
            start = np.zeros((eng.max_batch,), np.int32)
            ids[slot, : len(re_eval)] = re_eval
            lens[slot] = len(re_eval)
            start[slot] = n_keep
            _logits = eng.run_prefill(jnp.asarray(ids), jnp.asarray(lens),
                                      jnp.asarray(start))
            self._slot_len[slot] = n_keep + len(re_eval)

    def _sample_and_commit(self, logits, slot_map: Dict[int, Sequence],
                           prompt_obs: Optional[List[Sequence]] = None):
        if prompt_obs:
            # reset slot sampler state + bulk-record prompt tokens for
            # repetition penalties (reference penalizes over last_n)
            for s in prompt_obs:
                self.sampler = smp.reset_slot(
                    self.sampler, s.slot, self.sp.mirostat_tau
                )
                self.sampler = smp.observe_prompt_slot(
                    self.sampler, s.slot,
                    s.prompt[-self.sp.penalty_window:],
                )
        # only the committed slots may observe into penalty state: running
        # decode slots are spectators in this full-batch logit block and
        # must not absorb the junk tokens sampled for their rows
        commit_mask = np.zeros((self.engine.max_batch,), bool)
        for slot in slot_map:
            commit_mask[slot] = True
        with self.timings.timer("sample", len(slot_map)):
            toks, self.sampler = smp.sample(
                jnp.asarray(logits), self.sampler, self.sp,
                active=jnp.asarray(commit_mask),
            )
        toks_np = np.asarray(toks)
        for slot, seq in slot_map.items():
            tok = int(toks_np[slot])
            seq.generated.append(tok)
            self._last_tokens[slot] = tok
            if self.speculative or self.mixed_prefill:
                from .speculative import _PenalizedGreedy

                pen = _PenalizedGreedy(seq.prompt, self.sp)
                pen.observe([tok])
                self._pens[slot] = pen
            if seq.streamer is not None:
                seq.streamer(tok)
            if (self.eos_id is not None and tok == self.eos_id) or len(
                seq.generated
            ) >= seq.max_new_tokens:
                self._finish(slot, seq)

    # -- checkpoint / resume --------------------------------------------
    def save_state(self, path: str) -> None:
        """Serialize EVERYTHING a serving process needs to resume
        bit-identically: KV cache (any cache type, via its pytree
        leaves), device sampler state (PRNG key, penalty ring/counts,
        mirostat mu), host mirrors, queued + running requests, the
        speculative adaptive state + host RNG, paged page tables and
        GLM prompt lengths.

        Parity + extension: the reference serializes rng/logits/KV for
        ONE sequence (`model_get/copy/set_state_data`,
        model_utils.cpp:1529-1773); this checkpoints the whole
        continuous-batching server.  Streamer callbacks are not
        serializable and are dropped — reattach after `load_state`."""
        import json

        eng = self.engine
        self._flush_pending()  # no dispatch in flight at a snapshot point
        if self._dev_lens_dirty:
            self._sync_dev_lengths()

        def seq_j(s: Sequence) -> dict:
            return {"rid": s.request_id, "prompt": s.prompt,
                    "mx": s.max_new_tokens, "cached": s.cached,
                    "status": s.status, "slot": s.slot,
                    "generated": s.generated, "feed": s.feed, "fed": s.fed}

        arrays: Dict[str, np.ndarray] = {}
        dtypes: List[str] = []
        for i, leaf in enumerate(jax.tree_util.tree_leaves(eng.cache)):
            a = np.asarray(leaf)
            dtypes.append(str(a.dtype))
            if a.dtype == jnp.bfloat16:
                a = a.view(np.uint16)
            arrays[f"c{i}"] = a
        for name, a in (("s_key", self.sampler.key),
                        ("s_cnt", self.sampler.counts),
                        ("s_ring", self.sampler.last_tokens),
                        ("s_pos", self.sampler.ring_pos),
                        ("s_mu", self.sampler.mu)):
            arrays[name] = np.asarray(a)
        arrays["slot_len"] = self._slot_len
        arrays["last_tokens"] = self._last_tokens
        if hasattr(eng, "page_size"):
            arrays["pg_tables"] = eng._tables
            arrays["pg_lens"] = eng._lens
            arrays["pg_mapped"] = eng._mapped
        if eng.glm_lens is not None:
            arrays["glm_lens"] = eng.glm_lens
        meta = {
            "magic": "nst-sched1",
            "cache_dtypes": dtypes,
            "sp": dataclasses.asdict(self.sp),
            "cfg": {"eos_id": self.eos_id, "chunk_size": self.chunk_size,
                    "speculative": self.speculative, "spec_k": self.spec_k,
                    "spec_min_k": self.spec_min_k,
                    "spec_max_ngram": self.spec_max_ngram,
                    "mixed_prefill": self.mixed_prefill,
                    "mixed_chunk": self.mixed_chunk,
                    "window": self.window_cap},
            "waiting": [seq_j(s) for s in self.waiting],
            "running": {str(k): seq_j(s) for k, s in self.running.items()},
            "free_slots": list(self.free_slots),
            "next_rid": self._next_rid,
            "pens": {str(k): list(p.obs) for k, p in self._pens.items()},
            "spec_gain": self._spec_gain_ema,
            "spec_backoff": self._spec_backoff,
            "spec_rng": self._spec_rng.bit_generator.state,
        }
        if not path.endswith(".npz"):
            path = path + ".npz"  # np.savez appends it silently otherwise
        np.savez(path, __manifest__=json.dumps(meta), **arrays)

    @classmethod
    def load_state(cls, engine: Engine, path: str,
                   streamers: Optional[Dict[int, Callable]] = None
                   ) -> "ContinuousBatchingScheduler":
        """Rebuild a scheduler from `save_state` onto a fresh engine of
        the same configuration.  `streamers`: optional request_id ->
        callback map to reattach."""
        import json

        from .speculative import _PenalizedGreedy

        if not path.endswith(".npz"):
            path = path + ".npz"
        z = np.load(path, allow_pickle=False)
        meta = json.loads(str(z["__manifest__"]))
        assert meta["magic"] == "nst-sched1"
        sp = smp.SamplingParams(**meta["sp"])
        self = cls(engine, sp, **meta["cfg"])

        leaves = jax.tree_util.tree_leaves(engine.cache)
        treedef = jax.tree_util.tree_structure(engine.cache)
        new_leaves = []
        for i, (leaf, dt) in enumerate(zip(leaves, meta["cache_dtypes"])):
            a = z[f"c{i}"]
            if dt == "bfloat16":
                new_leaves.append(jnp.asarray(a).view(jnp.bfloat16))
            else:
                new_leaves.append(jnp.asarray(a))
        engine.cache = jax.tree_util.tree_unflatten(treedef, new_leaves)

        self.sampler = smp.SamplerState(
            key=jnp.asarray(z["s_key"]), counts=jnp.asarray(z["s_cnt"]),
            last_tokens=jnp.asarray(z["s_ring"]),
            ring_pos=jnp.asarray(z["s_pos"]), mu=jnp.asarray(z["s_mu"]),
        )
        self._slot_len = np.asarray(z["slot_len"], np.int64).copy()
        self._last_tokens = np.asarray(z["last_tokens"], np.int32).copy()
        if hasattr(engine, "page_size"):
            engine._tables = np.asarray(z["pg_tables"], np.int32).copy()
            engine._lens = np.asarray(z["pg_lens"], np.int64).copy()
            engine._mapped = np.asarray(z["pg_mapped"], np.int64).copy()
            # rebuild the refcounted allocator: one reference per table
            # entry (beam-shared pages would count once per sharer)
            refs: dict = {}
            for slot in range(engine.max_batch):
                for p in engine._tables[
                        slot, : int(engine._mapped[slot])].tolist():
                    refs[int(p)] = refs.get(int(p), 0) + 1
            engine._alloc.refs = refs
            engine._alloc.free = [p for p in range(engine.n_pages - 1)
                                  if p not in refs]
            engine._sync_tables()
        if engine.glm_lens is not None and "glm_lens" in z:
            engine.glm_lens = np.asarray(z["glm_lens"], np.int32).copy()

        def seq_of(d: dict) -> Sequence:
            s = Sequence(d["rid"], list(d["prompt"]), d["mx"],
                         cached=d["cached"], status=d["status"],
                         slot=d["slot"],
                         generated=list(d["generated"]),
                         feed=(list(d["feed"]) if d["feed"] is not None
                               else None), fed=d["fed"])
            if streamers and d["rid"] in streamers:
                s.streamer = streamers[d["rid"]]
            return s

        self.waiting = deque(seq_of(d) for d in meta["waiting"])
        self.running = {int(k): seq_of(d)
                        for k, d in meta["running"].items()}
        self.free_slots = list(meta["free_slots"])
        self._next_rid = meta["next_rid"]
        for k, obs in meta["pens"].items():
            pen = _PenalizedGreedy([], self.sp)
            pen.obs = list(obs)
            self._pens[int(k)] = pen
        self._spec_gain_ema = meta["spec_gain"]
        self._spec_backoff = meta["spec_backoff"]
        self._spec_rng = np.random.default_rng()
        self._spec_rng.bit_generator.state = meta["spec_rng"]
        return self
