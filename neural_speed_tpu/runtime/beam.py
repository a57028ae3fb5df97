"""Beam search — host-driven expansion over jitted steps, gather-based KV
reorder, with a continuous-batching variant.

Parity: the reference beam machinery (model_utils.{h,cpp}):
  * `beam_search_flow::loop` (:2676) — the static step loop
  * `beam_search_flow::step` (:2908) — the continuous-batching variant
    driven by the serving scheduler (each request owns `num_beams` slots,
    admitted/retired independently; one model step serves all of them)
  * `beam_top_k_next_tokens` (:2310) — top-2K candidate gather per request
  * `beam_hypotheses` with length penalty (model_utils.h:348-399)
  * `logits_processor` min-new-tokens masking (:404, :2231)
  * `beam_search_kv_cache_reorder` (:2239) — here a batch-axis gather
    (`kv_cache.reorder`), no block memcpys (SURVEY.md §7 improvement).

Slot layout: a request's K beams live in K engine slots (any K free slots
— the continuous scheduler does not require them contiguous).
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kv_cache as kvc
from .engine import Engine, pad_to_bucket


@dataclasses.dataclass
class Hypothesis:
    tokens: List[int]
    score: float            # sum logprob
    length_penalized: float


@dataclasses.dataclass
class BeamConfig:
    """Parity: gpt_params beam fields (model_config.h) + HF conventions."""

    num_beams: int = 4
    length_penalty: float = 1.0
    early_stopping: bool = False
    min_new_tokens: int = 0
    max_new_tokens: int = 128
    eos_id: Optional[int] = None


def _lp(score: float, length: int, alpha: float) -> float:
    return score / (max(length, 1) ** alpha)


class _BeamRequest:
    """Per-request beam state + the top-2K expansion step (host math).

    Parity: one `beam_search_flow` instance per request in the reference's
    continuous-batching mode (model_utils.h:440-524)."""

    def __init__(self, rid: int, prompt: Sequence[int], bc: BeamConfig):
        k = bc.num_beams
        self.rid = rid
        self.prompt = list(prompt)
        self.bc = bc
        self.slots: List[int] = []
        # beam 0 starts at 0, others -inf so the first expansion draws K
        # distinct tokens from beam 0 (reference :2382 comment)
        self.scores = np.full((k,), -1e9, np.float32)
        self.scores[0] = 0.0
        self.live: List[List[int]] = [[] for _ in range(k)]
        self.done: List[Hypothesis] = []
        self.steps = 0
        self.receive_time = time.time()
        self.end_time: Optional[float] = None
        self.result: Optional[Hypothesis] = None
        # tokens/source-beams pending for the next decode step
        self.pending_tok = np.zeros((k,), np.int64)
        self.pending_src = np.zeros((k,), np.int64)

    def expand(self, lp_rows: np.ndarray) -> bool:
        """One top-2K expansion over this request's `[K, vocab]` logprob
        rows.  Updates pending_tok/pending_src; returns True when the
        request is finished (done-check or token budget)."""
        bc = self.bc
        k = bc.num_beams
        vocab = lp_rows.shape[-1]
        if bc.eos_id is not None and self.steps < bc.min_new_tokens:
            lp_rows = lp_rows.copy()
            lp_rows[:, bc.eos_id] = -1e9  # logits_processor parity (:2231)
        cand = self.scores[:, None] + lp_rows
        flat = cand.reshape(-1)
        top = np.argpartition(flat, -2 * k)[-2 * k:]
        top = top[np.argsort(flat[top])[::-1]]
        new_scores = np.full((k,), -1e9, np.float32)
        filled = 0
        for idx in top:
            beam_i, tok = divmod(int(idx), vocab)
            if bc.eos_id is not None and tok == bc.eos_id:
                seq = self.live[beam_i] + [tok]
                sc = float(flat[idx])
                self.done.append(
                    Hypothesis(seq, sc, _lp(sc, len(seq), bc.length_penalty))
                )
                continue
            if filled < k:
                self.pending_src[filled] = beam_i
                self.pending_tok[filled] = tok
                new_scores[filled] = flat[idx]
                filled += 1
        # keep at most 2k done hyps
        self.done = sorted(self.done, key=lambda h: -h.length_penalized)[
            : 2 * k
        ]
        self.live = [
            self.live[int(self.pending_src[b])] + [int(self.pending_tok[b])]
            for b in range(k)
        ]
        self.scores = new_scores
        self.steps += 1
        # done check (reference beam_hypotheses::is_done)
        if self.steps >= bc.max_new_tokens:
            return True
        if len(self.done) >= k:
            best_possible = _lp(float(self.scores.max()), self.steps,
                                bc.length_penalty)
            if bc.early_stopping or (
                self.done and self.done[0].length_penalized >= best_possible
            ):
                return True
        return False

    # interface shared with scheduler.Sequence (ModelServer callbacks)
    @property
    def request_id(self) -> int:
        return self.rid

    @property
    def generated(self) -> List[int]:
        return list(self.result.tokens) if self.result else []

    def finalize(self) -> Hypothesis:
        """Merge live beams into the hypothesis pool (reference :2643) and
        pick the best."""
        for b in range(self.bc.num_beams):
            seq = self.live[b]
            sc = float(self.scores[b])
            self.done.append(
                Hypothesis(seq, sc, _lp(sc, max(len(seq), 1),
                                        self.bc.length_penalty))
            )
        self.result = max(self.done, key=lambda h: h.length_penalized)
        self.end_time = time.time()
        return self.result


class BeamContinuousScheduler:
    """Continuous-batching beam search: FCFS admission of beam requests
    into `num_beams` free engine slots each, one decode dispatch per step
    for ALL running requests, per-request host expansion + gather-based KV
    reorder.

    Parity: the reference's `Cont_batch_gen_scheduler` serving beam
    requests via `beam_search_flow::step` (model_utils.cpp:2908-2961) —
    admitted requests prefill into free request_idx blocks while running
    ones keep decoding; here the batch axis is the slot pool and the KV
    reorder is a gather, not memcpys."""

    def __init__(self, engine: Engine, bc: Optional[BeamConfig] = None,
                 eos_id: Optional[int] = None):
        self.engine = engine
        self.default_bc = bc or BeamConfig(eos_id=eos_id)
        self.waiting: Deque[_BeamRequest] = deque()
        self.running: Dict[int, _BeamRequest] = {}  # rid -> request
        self.finished: Deque[_BeamRequest] = deque()
        self.free_slots = list(range(engine.max_batch))[::-1]
        self._ids = itertools.count()
        self._fresh: Dict[int, bool] = {}  # rid -> KV not yet replicated

    def add_request(self, prompt: Sequence[int],
                    bc: Optional[BeamConfig] = None) -> int:
        bc = bc or self.default_bc
        if bc.num_beams > self.engine.max_batch:
            raise ValueError(
                f"num_beams={bc.num_beams} > max_batch="
                f"{self.engine.max_batch}")
        rid = next(self._ids)
        self.waiting.append(_BeamRequest(rid, prompt, bc))
        return rid

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    def pop_finished(self) -> List[_BeamRequest]:
        out = list(self.finished)
        self.finished.clear()
        return out

    def run_to_completion(self) -> List[_BeamRequest]:
        res: List[_BeamRequest] = []
        while self.has_work:
            self.step()
            res.extend(self.pop_finished())
        return res

    # ------------------------------------------------------------------
    def step(self) -> None:
        """Admit + prefill new requests when slots allow, else decode one
        token for every running request's beams."""
        if self.waiting and len(self.free_slots) >= (
            self.waiting[0].bc.num_beams
        ):
            self._admit_prefill()
        elif self.running:
            self._decode_expand()

    def _retire(self, req: _BeamRequest) -> None:
        req.finalize()
        self.running.pop(req.rid, None)
        self._fresh.pop(req.rid, None)
        for s in req.slots:
            self.engine.release_slot(s)  # paged: drop page references
        self.free_slots.extend(req.slots)
        self.finished.append(req)

    def _admit_prefill(self) -> None:
        eng = self.engine
        batch: List[_BeamRequest] = []
        while self.waiting and len(self.free_slots) >= (
            self.waiting[0].bc.num_beams
        ):
            req = self.waiting.popleft()
            req.slots = [self.free_slots.pop()
                         for _ in range(req.bc.num_beams)]
            self.running[req.rid] = req
            batch.append(req)

        # prefill each request's prompt into its beam-0 slot; all other
        # slots (live decoders included) are untouched spectators
        maxlen = max(len(r.prompt) for r in batch)
        t = pad_to_bucket(maxlen, eng.buckets)
        ids = np.zeros((eng.max_batch, t), np.int32)
        lens = np.zeros((eng.max_batch,), np.int32)
        for r in batch:
            p = r.prompt[-t:]
            ids[r.slots[0], : len(p)] = p
            lens[r.slots[0]] = len(p)
            if eng.glm_lens is not None:  # chatglm-1: all beam slots share
                for s in r.slots:         # the request's prompt length
                    eng.glm_lens[s] = len(p)
        eng.prepare_prefill([r.slots[0] for r in batch],
                            [lens[r.slots[0]] for r in batch])
        logits = eng.run_prefill(
            jnp.asarray(ids), jnp.asarray(lens),
            jnp.zeros((eng.max_batch,), jnp.int32),
        )
        lp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        )
        for r in batch:
            k = r.bc.num_beams
            rows = np.tile(lp[r.slots[0]][None, :], (k, 1))
            if r.expand(rows):
                self._retire(r)
            else:
                # beam KVs are all still beam-0's prompt KV: the replicate
                # gather is folded into the next decode's reorder
                self._fresh[r.rid] = True

    def _decode_expand(self) -> None:
        eng = self.engine
        reqs = list(self.running.values())
        # KV reorder: slot <- slot of the beam each pending token extends.
        # Freshly prefilled requests gather every beam from beam-0 (their
        # KVs are identical, so pending_src collapses to slot 0).
        src = np.arange(eng.max_batch)
        toks = np.zeros((eng.max_batch,), np.int32)
        active = np.zeros((eng.max_batch,), bool)
        for r in reqs:
            fresh = self._fresh.pop(r.rid, False)
            for b, slot in enumerate(r.slots):
                src[slot] = (r.slots[0] if fresh
                             else r.slots[int(r.pending_src[b])])
                toks[slot] = r.pending_tok[b]
                active[slot] = True
        if not (src == np.arange(eng.max_batch)).all():
            eng.reorder_slots(src)
        logits = eng.decode(jnp.asarray(toks), jnp.asarray(active))
        lp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )
        for r in reqs:
            if r.expand(lp[r.slots]):
                self._retire(r)


def beam_search(
    engine: Engine,
    prompts: Sequence[Sequence[int]],
    bc: BeamConfig,
) -> List[List[int]]:
    """Batched beam search over R requests x K beams; returns the best
    hypothesis token list per request.  Runs on the continuous scheduler —
    requests beyond the slot capacity simply queue (the static
    `beam_search_flow::loop` of the reference, expressed as a drained
    scheduler)."""
    sched = BeamContinuousScheduler(engine, bc)
    rids = [sched.add_request(p) for p in prompts]
    done = {r.rid: r for r in sched.run_to_completion()}
    return [done[rid].result.tokens for rid in rids]
