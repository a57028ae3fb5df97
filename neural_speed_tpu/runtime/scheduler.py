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
import itertools
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as smp
from .engine import Engine, pad_to_bucket, prefill_step


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


class ContinuousBatchingScheduler:
    """FCFS iteration-level scheduler over the Engine's fixed decode slots."""

    def __init__(self, engine: Engine,
                 params: Optional[smp.SamplingParams] = None,
                 eos_id: Optional[int] = None, seed: int = 0,
                 chunk_size: int = 8):
        from ..utils.profiler import Timings

        self.engine = engine
        self.eos_id = eos_id
        self.timings = Timings()
        # tokens decoded per device dispatch: sampling runs ON DEVICE and
        # the host syncs once per chunk (per-token host round-trips cost
        # more than the model step itself); 1 restores per-token stepping
        # (needed when a stopping_criteria must run between tokens)
        self.chunk_size = max(1, chunk_size)
        self.sp = params or smp.SamplingParams(do_sample=False)
        self._slot_len = np.zeros((engine.max_batch,), np.int64)  # host KV mirror
        self.waiting: Deque[Sequence] = deque()
        self.running: Dict[int, Sequence] = {}  # slot -> seq
        self.finished: Deque[Sequence] = deque()
        self.free_slots = list(range(engine.max_batch))[::-1]
        self._ids = itertools.count()
        vocab = engine.cfg.vocab_size
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
        rid = next(self._ids)
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

    # ------------------------------------------------------------------
    def step(self) -> None:
        """One scheduler iteration: admit+prefill a batch of new requests,
        or decode one token for all running slots."""
        if self.waiting and self.free_slots:
            self._prefill_batch()
        elif self.running:
            self._decode_step()

    def run_to_completion(self) -> List[Sequence]:
        res = []
        while self.has_work:
            self.step()
            res.extend(self.pop_finished())
        return res

    # ------------------------------------------------------------------
    def _prefill_batch(self) -> None:
        # admission rule parity: min(free slots, waiting)
        batch: List[Sequence] = []
        while self.waiting and self.free_slots:
            seq = self.waiting.popleft()
            seq.slot = self.free_slots.pop()
            seq.status = SeqStatus.PREFILL
            # registered immediately so `has_work` stays true while the
            # (potentially compiling) prefill runs
            self.running[seq.slot] = seq
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
        eng.prepare_prefill([s.slot for s in batch],
                            [lens[s.slot] for s in batch], starts=start)
        with self.timings.timer("prefill", int(lens.sum())):
            logits, eng.cache = prefill_step(
                eng.params, eng.cfg, eng.cache, jnp.asarray(ids),
                jnp.asarray(lens), jnp.asarray(start),
            )
            logits.block_until_ready()
        self._sample_and_commit(logits, {s.slot: s for s in batch},
                                prompt_obs=batch)
        for s in batch:
            self._slot_len[s.slot] = int(lens[s.slot]) + s.cached
            s.status = SeqStatus.DECODING

    def _decode_step(self) -> None:
        eng = self.engine
        active_np = np.zeros((eng.max_batch,), bool)
        for slot, seq in self.running.items():
            if seq.status == SeqStatus.DECODING:
                active_np[slot] = True
        if not active_np.any():
            return
        # chunk is CONSTANT so exactly one jit variant exists; sequences
        # finishing mid-chunk simply discard their tail tokens (the slot's
        # KV overshoot is reset when the slot is reused)
        chunk = self.chunk_size
        self._maybe_evict(active_np, chunk)
        eng.prepare_decode(active_np, chunk)
        from .engine import decode_sample_chunk

        with self.timings.timer("decode", int(active_np.sum()) * chunk):
            toks, eng.cache, self.sampler = decode_sample_chunk(
                eng.params, eng.cfg, eng.cache, self.sampler,
                jnp.asarray(self._last_tokens), jnp.asarray(active_np),
                chunk, self.sp,
            )
            toks_np = np.asarray(toks)  # [B, chunk] — the one host sync
        self._slot_len[active_np] += chunk
        for step in range(chunk):
            for slot, seq in list(self.running.items()):
                if not active_np[slot]:
                    continue
                tok = int(toks_np[slot, step])
                seq.generated.append(tok)
                self._last_tokens[slot] = tok
                if seq.streamer is not None:
                    seq.streamer(tok)
                if (self.eos_id is not None and tok == self.eos_id) or len(
                    seq.generated
                ) >= seq.max_new_tokens:
                    active_np[slot] = False  # later chunk tokens discarded
                    seq.status = SeqStatus.FINISHED
                    seq.end_time = time.time()
                    self.running.pop(slot, None)
                    self.free_slots.append(slot)
                    self.finished.append(seq)
                    eng.release_slot(slot)

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
            raise NotImplementedError(
                "StreamingLLM eviction is not supported on the paged KV "
                "cache (docs/paged_attention.md); raise ctx or use the "
                "contiguous cache")
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
            _logits, eng.cache = prefill_step(
                eng.params, eng.cfg, eng.cache, jnp.asarray(ids),
                jnp.asarray(lens), jnp.asarray(start),
            )
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
        with self.timings.timer("sample", len(slot_map)):
            toks, self.sampler = smp.sample(
                jnp.asarray(logits), self.sampler, self.sp
            )
        toks_np = np.asarray(toks)
        for slot, seq in slot_map.items():
            tok = int(toks_np[slot])
            seq.generated.append(tok)
            self._last_tokens[slot] = tok
            if seq.streamer is not None:
                seq.streamer(tok)
            if (self.eos_id is not None and tok == self.eos_id) or len(
                seq.generated
            ) >= seq.max_new_tokens:
                seq.status = SeqStatus.FINISHED
                seq.end_time = time.time()
                self.running.pop(slot, None)
                self.free_slots.append(slot)
                self.finished.append(seq)
