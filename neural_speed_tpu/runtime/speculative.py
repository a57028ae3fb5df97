"""Prompt-lookup speculative decoding (EXTENSION beyond the reference).

Greedy decoding verifies k draft tokens per model call instead of one:
drafts come from n-gram matches against the already-generated context
("prompt lookup" / assisted generation — no draft model needed), and a
single multi-token forward scores draft+1 positions.  The accept rule
keeps the longest prefix whose argmax agrees with the draft, plus the
first correction — so the OUTPUT EQUALS THE GREEDY SEQUENCE (including
repetition/frequency/presence penalties when a `SamplingParams` is
given, replicating ops/sampling.py `sample()` greedy semantics), only
faster when text is locally repetitive (code, extraction, summaries
that quote the prompt).

TPU mapping: the verify forward is the same static-shape bucketed
multi-token step as prefill (positions `n .. n+k` over the existing
cache), so it rides the MXU instead of the memory-bound 1-token GEMV —
k tokens verified for roughly the cost of one decode step.  Rejected
draft KV rows need no erase: `cache.lengths` is rolled back to the
accepted prefix and later writes simply overwrite the stale rows (the
same trash-tolerant cache contract prefill padding uses).

Exactness caveat (inherent to speculative decoding on real hardware):
the verify forward runs at T=k+1 while plain decode runs at T=1, so
GEMM blocking differs and logits can differ by ~1e-3; on a real model's
logit gaps this virtually never flips an argmax, but it can on a
random-init model with near-uniform logits.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import SamplingParams
from .engine import Engine, pad_to_bucket


# Verify-forward pad buckets: the engine's prefill buckets start at 32,
# which would run every k<=7 verify at T=32 (4x the attention/logit work
# and a 4x larger logits fetch).  Dedicated small buckets keep the verify
# forward at the next power of two >= k+1; each bucket is one extra jit
# variant of the same forward.
_SPEC_BUCKETS = (2, 4, 8, 16, 32)


def propose_ngram(context: List[int], k: int, max_ngram: int = 3,
                  min_ngram: int = 1) -> Optional[List[int]]:
    """Draft the k tokens that followed the most recent match of the
    longest context-suffix n-gram (HF 'prompt lookup decoding').

    Long contexts take a vectorized path: the Python scan is O(n_ctx *
    max_ngram) list compares per call, which at B=32 serving slots and
    2k-token contexts costs more host time than the verify dispatch."""
    if len(context) > 64:
        return _propose_ngram_np(np.asarray(context, np.int32), k,
                                 max_ngram, min_ngram)
    return _propose_ngram_list(context, k, max_ngram, min_ngram)


def _propose_ngram_list(context: List[int], k: int, max_ngram: int,
                        min_ngram: int) -> Optional[List[int]]:
    n_ctx = len(context)
    if n_ctx < min_ngram + 1:
        return None
    for n in range(min(max_ngram, n_ctx - 1), min_ngram - 1, -1):
        tail = context[n_ctx - n:]
        for start in range(n_ctx - n - 1, -1, -1):
            if context[start:start + n] == tail:
                cont = context[start + n: start + n + k]
                if cont:
                    return list(cont)
    return None


def _propose_ngram_np(ctx: np.ndarray, k: int, max_ngram: int,
                      min_ngram: int) -> Optional[List[int]]:
    """Vectorized propose_ngram: all window-vs-suffix compares in one
    numpy op per n-gram size (same most-recent-longest-match result)."""
    n_ctx = ctx.size
    for n in range(min(max_ngram, n_ctx - 1), min_ngram - 1, -1):
        tail = ctx[n_ctx - n:]
        # candidate starts 0 .. n_ctx-1-n (the suffix itself is excluded)
        win = np.lib.stride_tricks.sliding_window_view(ctx[: n_ctx - 1], n)
        hits = np.nonzero((win == tail).all(axis=1))[0]
        if hits.size:
            start = int(hits[-1])  # most recent match
            cont = ctx[start + n: start + n + k]
            if cont.size:
                return [int(t) for t in cont]
    return None


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache",))
def _verify_forward(params, cfg, cache, ids, pos, kv_lens, glm_lens=None):
    """Full-logits multi-token forward over the existing cache (the
    prefill_step pattern minus the last-token gather — verification
    needs the logits at EVERY draft position)."""
    from ..models.transformer import forward

    return forward(params, cfg, ids, pos, cache, kv_lens,
                   glm_lens=glm_lens)


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache",))
def _verify_forward_rows(params, cfg, cache, ids, pos, kv_lens, row_idx,
                         glm_lens=None):
    """_verify_forward returning only the per-slot rows named by `row_idx`
    [B, R] (device-side gather).  Mixed prefill chunks run at pad_t up to
    mixed_chunk with almost every logit row unused (only decode rows and
    the prompt-completing row are read); fetching [B, R, vocab] instead of
    [B, pad_t, vocab] keeps the host transfer proportional to what the
    accept loops actually consume."""
    from ..models.transformer import forward

    # the row gather happens BEFORE the LM head (logits_positions): the
    # head projects R rows instead of pad_t — less MXU work AND no
    # [B, pad_t, vocab] buffer
    rows, cache = forward(params, cfg, ids, pos, cache, kv_lens,
                          glm_lens=glm_lens, logits_positions=row_idx)
    return rows, cache


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache",))
def _verify_forward_argmax(params, cfg, cache, ids, pos, kv_lens,
                           glm_lens=None):
    """Verify forward reduced to per-position argmax token ids on device
    ([B, T] int32 instead of a [B, T, vocab] logits fetch — the full-row
    host transfer dominates the verify step through the device tunnel).
    Only valid for UNPENALIZED greedy: penalties need the logit rows."""
    from ..models.transformer import forward

    logits, cache = forward(params, cfg, ids, pos, cache, kv_lens,
                            glm_lens=glm_lens)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def _penalized_row(row: np.ndarray, sp: SamplingParams,
                   obs: List[int]) -> np.ndarray:
    """Host replica of ops/sampling.apply_penalties on one logit row:
    repetition penalty over the last-`penalty_window` observed tokens,
    OpenAI frequency/presence over all observed counts, f32."""
    l = np.asarray(row, np.float32).copy()
    if sp.repetition_penalty != 1.0 and obs:
        rp = np.float32(sp.repetition_penalty)
        win = np.unique(np.asarray(obs[-sp.penalty_window:], np.int64))
        win = win[(win >= 0) & (win < l.shape[0])]
        lw = l[win]
        l[win] = np.where(lw > 0, lw / rp, lw * rp)
    if sp.frequency_penalty != 0.0 or sp.presence_penalty != 0.0:
        cnt = np.bincount(
            np.clip(np.asarray(obs, np.int64), 0, l.shape[0] - 1),
            minlength=l.shape[0],
        ).astype(np.float32)
        l = l - cnt * np.float32(sp.frequency_penalty) - (
            cnt > 0
        ).astype(np.float32) * np.float32(sp.presence_penalty)
    return l


def _softmax_np(l: np.ndarray) -> np.ndarray:
    e = np.exp(l - l.max())
    return e / e.sum()


def _target_dist(row: np.ndarray, sp: SamplingParams,
                 obs: List[int]) -> np.ndarray:
    """Host replica of the device sampling pipeline's token distribution
    (ops/sampling.sample: penalties -> temperature -> top-k -> top-p ->
    softmax).  tfs/typical/mirostat are rejected upstream."""
    l = _penalized_row(row, sp, obs)
    if sp.temperature <= 0.0:
        # the device sampler treats do_sample + temperature<=0 as greedy
        # (ops/sampling.sample:246): the target is a point mass at the
        # penalized argmax
        p = np.zeros_like(l)
        p[int(np.argmax(l))] = 1.0
        return p
    l = l / np.float32(sp.temperature)
    v = l.shape[0]
    if 0 < sp.top_k < v:
        # O(V) selection instead of a full sort: at a 32k-152k vocab and
        # B serving slots this runs per emitted token on the host
        kth = np.partition(l, v - sp.top_k)[v - sp.top_k]
        l[l < kth] = -np.inf
    if sp.top_p < 1.0:
        # nucleus cutoff without sorting the whole vocab: grow a top-m
        # selection until its cumulative mass covers top_p (the kept set
        # is a prefix of the descending order, so once covered the
        # cutoff is exact — identical to the full-sort rule)
        mx = l.max()
        total = np.exp(l - mx).sum()  # softmax normalizer over kept set
        m = 64
        while True:
            m = min(m, v)
            top = np.partition(l, v - m)[v - m:]
            sl = np.sort(top)[::-1]
            p = np.exp(sl - mx) / total
            cum = np.cumsum(p)
            if cum[-1] >= sp.top_p or m >= v:
                break
            m *= 2
        keep = cum - p < sp.top_p
        keep[0] = True  # always keep top-1
        cutoff = sl[keep].min()
        l[l < cutoff] = -np.inf
    return _softmax_np(l)


class _PenalizedGreedy:
    """Host-side replica of ops/sampling.py greedy-with-penalties:
    repetition penalty over the last-`penalty_window` OBSERVED tokens
    (the scheduler observes `prompt[-window:]` then every generated
    token — scheduler.py:282-289) + OpenAI frequency/presence over the
    observed-token counts, all in f32 like `apply_penalties`."""

    def __init__(self, prompt: List[int], sp: Optional[SamplingParams]):
        self.sp = sp
        # with do_sample params this object is only an observed-token
        # tracker (the scheduler's sampled-spec path feeds self.obs to
        # _target_dist); pick() stays greedy-only
        self.obs: List[int] = (
            list(prompt[-sp.penalty_window:]) if sp is not None else []
        )

    def pick(self, row: np.ndarray, extra: List[int]) -> int:
        """argmax of penalties(row) given observed = self.obs + extra."""
        if self.sp is None:
            return int(np.argmax(row))
        if self.sp.do_sample:
            raise ValueError("pick() is greedy-only")
        return int(np.argmax(_penalized_row(row, self.sp, self.obs + extra)))

    def observe(self, tokens: List[int]) -> None:
        if self.sp is not None:
            self.obs.extend(tokens)


def generate_greedy_speculative(
    engine: Engine,
    prompt: List[int],
    max_new_tokens: int,
    eos_id: Optional[int] = None,
    k: int = 7,
    max_ngram: int = 3,
    sp: Optional[SamplingParams] = None,
) -> List[int]:
    """Greedy generation with n-gram speculation; output is token-for-token
    identical to `Engine.generate_greedy` (sp=None) or to the scheduler's
    penalized greedy (sp given) — tested in tests/test_speculative.py."""
    from ..ops import kv_cache as kvc

    if not isinstance(engine.cache, kvc.KVCache):
        raise NotImplementedError(
            "the single-sequence speculative helper owns slot 0 of a "
            "contiguous cache; paged engines speculate through the "
            "ContinuousBatchingScheduler(speculative=True)"
        )
    b = engine.max_batch
    pen = _PenalizedGreedy(prompt, sp)
    logits = engine.prefill([prompt])
    out: List[int] = []
    tok = pen.pick(np.asarray(logits[0], np.float32), [])
    pen.observe([tok])
    n_past = len(prompt)
    pad_t = pad_to_bucket(k + 1, _SPEC_BUCKETS)
    # The verify forward is masked by its explicit kv_lens/pos arguments,
    # not by cache.lengths, so the device `lengths` vector only has to be
    # correct when the fallback `engine.decode` path reads it (and at loop
    # exit, so the cache is left consistent).  Tracking it host-side and
    # syncing lazily removes one device dispatch + one host sync per
    # iteration — the dominant cost per step on a dispatch-latency-bound
    # serving loop (each verify accepts ~k tokens, so dispatch overhead is
    # amortized; set_lengths was pure overhead).
    base_lens = np.asarray(engine.cache.lengths)  # spectator slots
    lens_dirty = False

    def _sync_lengths():
        nonlocal lens_dirty
        engine.cache = kvc.set_lengths(
            engine.cache,
            jnp.asarray(
                np.where(np.arange(b) == 0, n_past, base_lens), np.int32
            ),
        )
        lens_dirty = False

    while len(out) < max_new_tokens:
        out.append(tok)
        if (eos_id is not None and tok == eos_id) or len(out) >= max_new_tokens:
            break
        draft = propose_ngram(prompt + out, k, max_ngram=max_ngram)
        if not draft:
            if lens_dirty:
                _sync_lengths()
            active = jnp.zeros((b,), bool).at[0].set(True)
            logits = engine.decode(jnp.full((b,), tok, jnp.int32), active)
            tok = pen.pick(np.asarray(logits[0], np.float32), [])
            pen.observe([tok])
            n_past += 1  # decode_step advanced the device lengths too
            continue

        # verify [tok, *draft] in ONE forward: k+1 tokens -> k+1 logits.
        # Causal masking makes each position's logits independent of the
        # (possibly wrong) later draft rows, so results are exact.
        seq = [tok] + draft
        ids = np.zeros((b, pad_t), np.int32)
        ids[0, : len(seq)] = seq
        pos = np.arange(pad_t)[None, :] + np.where(
            np.arange(b) == 0, n_past, 0
        )[:, None]
        in_range = (np.arange(pad_t)[None, :] < len(seq)) & (
            np.arange(b) == 0
        )[:, None]
        pos = np.where(in_range, pos, engine.max_len - 1)
        kv_lens = np.where(np.arange(b) == 0, n_past + len(seq), base_lens)
        if sp is None:
            g_ids, engine.cache = _verify_forward_argmax(
                engine.params, engine.cfg, engine.cache, jnp.asarray(ids),
                jnp.asarray(pos), jnp.asarray(kv_lens, dtype=np.int32),
                glm_lens=engine.glm_arg(),
            )
            g_row = np.asarray(g_ids[0, : len(seq)])
            picks = lambda j: int(g_row[j])  # noqa: E731
        else:
            all_logits, engine.cache = _verify_forward(
                engine.params, engine.cfg, engine.cache, jnp.asarray(ids),
                jnp.asarray(pos), jnp.asarray(kv_lens, dtype=np.int32),
                glm_lens=engine.glm_arg(),
            )
            rows = np.asarray(all_logits[0, : len(seq)], np.float32)
            picks = lambda j: pen.pick(rows[j], draft[:j])  # noqa: E731

        # row j scores the token FOLLOWING seq[j]; its penalty state has
        # observed draft[:j] on top of everything up to tok
        accepted = 0
        nxt = None
        while True:
            g = picks(accepted)
            if (accepted < len(draft)
                    and len(out) + accepted + 1 < max_new_tokens
                    and g == draft[accepted]
                    and not (eos_id is not None and g == eos_id)):
                accepted += 1
            else:
                nxt = g
                break
        out.extend(draft[:accepted])
        pen.observe(draft[:accepted])
        tok = nxt  # first correction / next greedy token (may be eos)
        pen.observe([tok])
        n_past += 1 + accepted
        # logical rollback to the accepted prefix: stale draft rows beyond
        # n_past are masked by kv_lens and overwritten by later appends;
        # the device lengths are synced lazily (see above)
        lens_dirty = True

    if lens_dirty:
        _sync_lengths()
    return out


def generate_sampled_speculative(
    engine: Engine,
    prompt: List[int],
    max_new_tokens: int,
    sp: SamplingParams,
    eos_id: Optional[int] = None,
    k: int = 7,
    max_ngram: int = 3,
    seed: int = 0,
) -> List[int]:
    """SAMPLED speculative decoding (Leviathan-style rejection sampling
    specialized to point-mass drafts): every emitted token is distributed
    EXACTLY as sequential sampling from the model — draft token x is
    accepted with probability p(x); on rejection the correction is drawn
    from p with x removed and renormalized (the residual distribution of
    standard speculative sampling when the proposal is the deterministic
    n-gram draft, q = delta_x):

        P[emit y] = p(x)*1[y=x] + (1-p(x)) * p(y)1[y!=x]/(1-p(x)) = p(y).

    Supports temperature / top-k / top-p / repetition & frequency &
    presence penalties (the host replica of ops/sampling.sample's
    pipeline); tfs/typical/mirostat are not replicated host-side and
    raise.  Same KV bookkeeping as `generate_greedy_speculative`."""
    from ..ops import kv_cache as kvc

    if not sp.do_sample:
        raise ValueError("use generate_greedy_speculative for greedy")
    if sp.mirostat or sp.tfs_z < 1.0 or sp.typical_p < 1.0:
        raise ValueError("sampled speculative supports temperature/top_k/"
                         "top_p/penalties only")
    if not isinstance(engine.cache, kvc.KVCache):
        raise NotImplementedError(
            "the single-sequence speculative helper owns slot 0 of a "
            "contiguous cache; paged engines speculate through the "
            "ContinuousBatchingScheduler(speculative=True)")
    rng = np.random.default_rng(seed)
    b = engine.max_batch
    obs: List[int] = list(prompt[-sp.penalty_window:])

    def draw(p: np.ndarray) -> int:
        return int(rng.choice(p.shape[0], p=p))

    logits = engine.prefill([prompt])
    out: List[int] = []
    tok = draw(_target_dist(np.asarray(logits[0], np.float32), sp, obs))
    obs.append(tok)
    n_past = len(prompt)
    pad_t = pad_to_bucket(k + 1, _SPEC_BUCKETS)
    base_lens = np.asarray(engine.cache.lengths)
    lens_dirty = False

    def _sync_lengths():
        nonlocal lens_dirty
        engine.cache = kvc.set_lengths(
            engine.cache,
            jnp.asarray(
                np.where(np.arange(b) == 0, n_past, base_lens), np.int32
            ),
        )
        lens_dirty = False

    while len(out) < max_new_tokens:
        out.append(tok)
        if (eos_id is not None and tok == eos_id) or len(out) >= max_new_tokens:
            break
        draft = propose_ngram(prompt + out, k, max_ngram=max_ngram)
        if not draft:
            if lens_dirty:
                _sync_lengths()
            active = jnp.zeros((b,), bool).at[0].set(True)
            logits = engine.decode(jnp.full((b,), tok, jnp.int32), active)
            tok = draw(_target_dist(np.asarray(logits[0], np.float32),
                                    sp, obs))
            obs.append(tok)
            n_past += 1
            continue

        seq = [tok] + draft
        ids = np.zeros((b, pad_t), np.int32)
        ids[0, : len(seq)] = seq
        pos = np.arange(pad_t)[None, :] + np.where(
            np.arange(b) == 0, n_past, 0
        )[:, None]
        in_range = (np.arange(pad_t)[None, :] < len(seq)) & (
            np.arange(b) == 0
        )[:, None]
        pos = np.where(in_range, pos, engine.max_len - 1)
        kv_lens = np.where(np.arange(b) == 0, n_past + len(seq), base_lens)
        all_logits, engine.cache = _verify_forward(
            engine.params, engine.cfg, engine.cache, jnp.asarray(ids),
            jnp.asarray(pos), jnp.asarray(kv_lens, dtype=np.int32),
            glm_lens=engine.glm_arg(),
        )
        rows = np.asarray(all_logits[0, : len(seq)], np.float32)

        committed: List[int] = []
        while True:
            j = len(committed)
            p_j = _target_dist(rows[j], sp, obs + committed)
            if (j < len(draft)
                    and len(out) + j + 1 < max_new_tokens
                    and not (eos_id is not None and draft[j] == eos_id)):
                x = draft[j]
                if rng.random() < p_j[x]:
                    committed.append(x)
                    continue
                q = p_j.copy()
                q[x] = 0.0
                s = float(q.sum())
                if s <= 0.0:  # all mass on x (p(x)=1): accept is forced
                    committed.append(x)
                    continue
                nxt = draw(q / s)  # residual distribution
                break
            nxt = draw(p_j)  # bonus token / budget or eos stop
            break
        accepted = len(committed)
        out.extend(committed)
        obs.extend(committed)
        tok = nxt
        obs.append(tok)
        n_past += 1 + accepted
        lens_dirty = True

    if lens_dirty:
        _sync_lengths()
    return out
