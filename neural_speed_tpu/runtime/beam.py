"""Beam search — host-driven loop over jitted steps, gather-based KV reorder.

Parity: the reference beam machinery (model_utils.{h,cpp}):
  * `beam_search_flow::loop` (:2676) — the step loop
  * `beam_top_k_next_tokens` (:2310) — top-2K candidate gather per request
  * `beam_hypotheses` with length penalty (model_utils.h:348-399)
  * `logits_processor` min-new-tokens masking (:404, :2231)
  * `beam_search_kv_cache_reorder` (:2239) — here a batch-axis gather
    (`kv_cache.reorder`), no block memcpys (SURVEY.md §7 improvement).

Slot layout: request r's beam b lives in batch slot r*K + b.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kv_cache as kvc
from .engine import Engine, decode_step


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


def beam_search(
    engine: Engine,
    prompts: Sequence[Sequence[int]],
    bc: BeamConfig,
) -> List[List[int]]:
    """Batched beam search over R requests x K beams; returns the best
    hypothesis token list per request."""
    r = len(prompts)
    k = bc.num_beams
    assert engine.max_batch >= r * k, (engine.max_batch, r, k)

    # --- prefill: prompt goes into slot (req*k + 0); beams replicated by a
    # cache gather (reference re-evals or memcpys; we gather) -------------
    slot_prompts: List[List[int]] = []
    for req in range(r):
        slot_prompts.extend(
            [list(prompts[req])] + [[0]] * (k - 1)
        )
    # prefill only beam-0 slots for real; others get dummy length-1 prompts
    # then are overwritten by the replicate-gather below.
    logits = engine.prefill([list(p) for p in slot_prompts])
    src = np.arange(engine.max_batch)
    for req in range(r):
        src[req * k:(req + 1) * k] = req * k
    engine.cache = kvc.reorder(engine.cache, jnp.asarray(src))
    logits = jnp.asarray(np.asarray(logits)[src])

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vocab = logprobs.shape[-1]

    # beam scores: beam 0 starts at 0, others -inf so the first expansion
    # draws K distinct tokens from beam 0 (reference :2382 comment)
    scores = np.full((r, k), -1e9, np.float32)
    scores[:, 0] = 0.0
    live_tokens: List[List[List[int]]] = [[[] for _ in range(k)]
                                          for _ in range(r)]
    done: List[List[Hypothesis]] = [[] for _ in range(r)]
    active = np.zeros((engine.max_batch,), bool)
    active[: r * k] = True

    lp_np = np.asarray(logprobs)

    for step in range(bc.max_new_tokens):
        if bc.eos_id is not None and step < bc.min_new_tokens:
            lp_np[:, bc.eos_id] = -1e9  # logits_processor parity (:2231)

        # ---- expand: per request, top-2K over K*V candidates ----
        next_src = np.zeros((r, k), np.int64)
        next_tok = np.zeros((r, k), np.int64)
        new_scores = np.full((r, k), -1e9, np.float32)
        for req in range(r):
            cand = scores[req][:, None] + lp_np[req * k:(req + 1) * k]
            flat = cand.reshape(-1)
            top = np.argpartition(flat, -2 * k)[-2 * k:]
            top = top[np.argsort(flat[top])[::-1]]
            filled = 0
            for idx in top:
                beam_i, tok = divmod(int(idx), vocab)
                if bc.eos_id is not None and tok == bc.eos_id:
                    seq = live_tokens[req][beam_i] + [tok]
                    sc = float(flat[idx])
                    done[req].append(
                        Hypothesis(seq, sc, _lp(sc, len(seq),
                                                bc.length_penalty))
                    )
                    continue
                if filled < k:
                    next_src[req, filled] = req * k + beam_i
                    next_tok[req, filled] = tok
                    new_scores[req, filled] = flat[idx]
                    filled += 1
            # keep at most 2k done hyps
            done[req] = sorted(done[req], key=lambda h: -h.length_penalized)[
                : 2 * k
            ]

        live_tokens = [
            [live_tokens[req][int(next_src[req, b]) - req * k] +
             [int(next_tok[req, b])] for b in range(k)]
            for req in range(r)
        ]
        scores = new_scores

        # ---- done check (reference beam_hypotheses::is_done) ----
        all_done = True
        for req in range(r):
            best_possible = _lp(float(scores[req].max()),
                                step + 1, bc.length_penalty)
            if len(done[req]) >= k and (
                bc.early_stopping
                or (done[req] and done[req][0].length_penalized
                    >= best_possible)
            ):
                continue
            all_done = False
        if all_done or step == bc.max_new_tokens - 1:
            break

        # ---- KV reorder (gather) + decode ----
        src_full = np.arange(engine.max_batch)
        src_full[: r * k] = next_src.reshape(-1)
        engine.cache = kvc.reorder(engine.cache, jnp.asarray(src_full))
        toks_full = np.zeros((engine.max_batch,), np.int32)
        toks_full[: r * k] = next_tok.reshape(-1)
        logits = engine.decode(jnp.asarray(toks_full), jnp.asarray(active))
        lp_np = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )

    # ---- finalize: merge live beams (reference :2643) ----
    out: List[List[int]] = []
    for req in range(r):
        for b in range(k):
            seq = live_tokens[req][b]
            sc = float(scores[req, b])
            done[req].append(
                Hypothesis(seq, sc, _lp(sc, max(len(seq), 1),
                                        bc.length_penalty))
            )
        best = max(done[req], key=lambda h: h.length_penalized)
        out.append(best.tokens)
    return out
