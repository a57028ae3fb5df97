"""Sampling suite — batched, on-device, jit-friendly.

Parity: the reference C++ sampling library (model_utils.cpp:521-996):
softmax / top-k / top-p / tail-free / typical / temperature / repetition &
frequency & presence penalties / mirostat v1+v2 / greedy, plus the batched
entry points model_post_greedy_search (:2963) and
model_post_sample_top_k_top_p_repeat (:2987).

Everything operates on `[B, V]` logit batches; sampler state (penalty
counts, last-token ring, mirostat mu, PRNG key) is a pytree carried by the
engine between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Parity: gpt_params sampling fields (model_config.h:31-110)."""

    temperature: float = 0.8
    top_k: int = 40           # <=0 => disabled
    top_p: float = 0.95       # >=1 => disabled
    tfs_z: float = 1.0        # tail-free sampling, 1 => disabled
    typical_p: float = 1.0    # locally-typical sampling, 1 => disabled
    repetition_penalty: float = 1.1
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    penalty_window: int = 64  # repeat_last_n
    mirostat: int = 0         # 0 off, 1 v1, 2 v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    do_sample: bool = True    # False => greedy


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SamplerState:
    key: jax.Array
    counts: jax.Array        # [B, V] int32 — generated-token counts
    last_tokens: jax.Array   # [B, W] int32 ring of recent ids (-1 = empty)
    ring_pos: jax.Array      # [B] int32
    mu: jax.Array            # [B] f32 mirostat state

    def tree_flatten(self):
        return (
            (self.key, self.counts, self.last_tokens, self.ring_pos, self.mu),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_state(key: jax.Array, batch: int, vocab: int,
               window: int = 64, tau: float = 5.0) -> SamplerState:
    return SamplerState(
        key=key,
        counts=jnp.zeros((batch, vocab), jnp.int32),
        last_tokens=jnp.full((batch, window), -1, jnp.int32),
        ring_pos=jnp.zeros((batch,), jnp.int32),
        mu=jnp.full((batch,), 2.0 * tau, jnp.float32),
    )


def reset_slot(state: SamplerState, slot: int,
               tau: float = 5.0) -> SamplerState:
    """Clear one batch slot's penalty/mirostat state (new request)."""
    return dataclasses.replace(
        state,
        counts=state.counts.at[slot].set(0),
        last_tokens=state.last_tokens.at[slot].set(-1),
        ring_pos=state.ring_pos.at[slot].set(0),
        mu=state.mu.at[slot].set(2.0 * tau),
    )


def observe_prompt_slot(state: SamplerState, slot: int,
                        tokens) -> SamplerState:
    """Bulk-record a prompt into one slot's penalty state (one shot)."""
    toks = jnp.asarray(tokens, jnp.int32)
    v = state.counts.shape[1]
    counts = state.counts.at[slot].add(
        jnp.bincount(jnp.clip(toks, 0, v - 1), length=v).astype(jnp.int32)
    )
    w = state.last_tokens.shape[1]
    n = toks.shape[0]
    ring = state.last_tokens[slot]
    tail = toks[-w:]
    m = tail.shape[0]
    ring = ring.at[:m].set(tail)
    return dataclasses.replace(
        state,
        counts=counts,
        last_tokens=state.last_tokens.at[slot].set(ring),
        ring_pos=state.ring_pos.at[slot].set(m % w if m < w else 0),
    )


def observe(state: SamplerState, tokens: jax.Array,
            active: Optional[jax.Array] = None) -> SamplerState:
    """Record sampled/prompt tokens into penalty structures."""
    b = tokens.shape[0]
    act = jnp.ones((b,), bool) if active is None else active
    counts = state.counts.at[jnp.arange(b), tokens].add(
        act.astype(jnp.int32)
    )
    w = state.last_tokens.shape[1]
    last = state.last_tokens.at[jnp.arange(b), state.ring_pos % w].set(
        jnp.where(act, tokens, state.last_tokens[
            jnp.arange(b), state.ring_pos % w
        ])
    )
    return dataclasses.replace(
        state,
        counts=counts,
        last_tokens=last,
        ring_pos=state.ring_pos + act.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# logit processors
# ---------------------------------------------------------------------------


def apply_penalties(logits: jax.Array, state: SamplerState,
                    p: SamplingParams) -> jax.Array:
    """Repetition (CTRL-style, over last-N window) + frequency/presence
    (OpenAI-style, full history).  Parity: model_utils.cpp
    model_sample_repetition_penalty:701 / frequency_and_presence:730."""
    b, v = logits.shape
    out = logits
    if p.repetition_penalty != 1.0:
        in_window = jnp.zeros((b, v), bool)
        w = state.last_tokens.shape[1]
        tok = jnp.clip(state.last_tokens, 0, v - 1)
        valid = state.last_tokens >= 0
        in_window = in_window.at[
            jnp.arange(b)[:, None].repeat(w, 1), tok
        ].max(valid)
        penalized = jnp.where(
            out > 0, out / p.repetition_penalty, out * p.repetition_penalty
        )
        out = jnp.where(in_window, penalized, out)
    if p.frequency_penalty != 0.0 or p.presence_penalty != 0.0:
        cnt = state.counts.astype(jnp.float32)
        out = out - cnt * p.frequency_penalty - (
            cnt > 0
        ).astype(jnp.float32) * p.presence_penalty
    return out


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus sampling (model_sample_top_p:607)."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep top-1)
    keep_sorted = cum - probs < top_p
    keep_sorted = keep_sorted.at[:, 0].set(True)
    cutoff = jnp.min(
        jnp.where(keep_sorted, sorted_logits, -NEG_INF), axis=-1, keepdims=True
    )  # smallest kept logit
    return jnp.where(logits < cutoff, NEG_INF, logits)


def tail_free_filter(logits: jax.Array, z: float) -> jax.Array:
    """Tail-free sampling (model_sample_tail_free:641): filter by the
    normalized |second derivative| of the sorted prob curve."""
    if z >= 1.0:
        return logits
    b, v = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d2 = jnp.abs(probs[:, :-2] - 2 * probs[:, 1:-1] + probs[:, 2:])
    d2 = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-9)
    cum = jnp.cumsum(d2, axis=-1)
    keep = cum < z  # over the d2 positions (token idx 0..v-3)
    keep = jnp.concatenate(
        [jnp.ones((b, 1), bool), keep, jnp.zeros((b, 1), bool)], axis=-1
    )
    cutoff = jnp.min(jnp.where(keep, sorted_logits, -NEG_INF), axis=-1,
                     keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def typical_filter(logits: jax.Array, typical_p: float) -> jax.Array:
    """Locally-typical sampling (model_sample_typical:671)."""
    if typical_p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)  # distance from entropy
    order = jnp.argsort(shifted, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = cum - probs_sorted < typical_p
    keep_sorted = keep_sorted.at[:, 0].set(True)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def greedy(logits: jax.Array) -> jax.Array:
    """model_post_greedy_search (:2963)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(
    logits: jax.Array,
    state: SamplerState,
    p: SamplingParams,
    active: Optional[jax.Array] = None,
) -> Tuple[jax.Array, SamplerState]:
    """Full pipeline: penalties -> temperature -> (mirostat | filters) ->
    categorical sample.  Returns (tokens [B], new state).
    Parity: model_post_sample_top_k_top_p_repeat (:2987).

    `active` ([B] bool): rows whose sampled token is COMMITTED — only
    those observe into the penalty ring/counts and update mirostat mu.
    Callers sampling a full-batch logit block on behalf of a subset of
    slots (prefill with running-decode spectators) MUST pass it, or
    spectator slots' penalty state absorbs junk tokens."""
    b, v = logits.shape
    logits = apply_penalties(logits.astype(jnp.float32), state, p)

    if not p.do_sample or p.temperature <= 0.0:
        toks = greedy(logits)
        return toks, observe(state, toks, active)

    logits = logits / p.temperature
    key, sub = jax.random.split(state.key)
    state = dataclasses.replace(state, key=key)

    if p.mirostat == 2:
        # v2 (model_sample_token_mirostat_v2:930): drop tokens with surprise
        # > mu, sample, then mu -= eta * (surprise - tau)
        logp = jax.nn.log_softmax(logits, axis=-1)
        surprise = -logp / jnp.log(2.0)
        filt = jnp.where(surprise > state.mu[:, None], NEG_INF, logits)
        # keep at least the argmax
        filt = jnp.where(
            jnp.max(filt, -1, keepdims=True) <= NEG_INF / 2,
            jnp.where(logits >= jnp.max(logits, -1, keepdims=True), logits,
                      NEG_INF),
            filt,
        )
        toks = jax.random.categorical(sub, filt, axis=-1).astype(jnp.int32)
        observed = jnp.take_along_axis(surprise, toks[:, None], 1)[:, 0]
        mu = state.mu - p.mirostat_eta * (observed - p.mirostat_tau)
        if active is not None:
            mu = jnp.where(active, mu, state.mu)
        state = dataclasses.replace(state, mu=mu)
        return toks, observe(state, toks, active)
    if p.mirostat == 1:
        # v1 (:880): estimate s_hat from top-100 prob decay, derive k
        m = min(100, v)
        logp = jax.nn.log_softmax(logits, axis=-1)
        sorted_lp = jnp.sort(logp, axis=-1)[:, ::-1][:, :m]
        ti = jnp.log(jnp.arange(2, m + 1, dtype=jnp.float32))
        bi = sorted_lp[:, :1] - sorted_lp[:, 1:]
        s_hat = jnp.sum(ti * bi, axis=-1) / jnp.sum(ti * ti)
        eps = s_hat - 1.0
        k = ((eps * (2.0 ** state.mu)) / (1 - (float(v) ** -eps))) ** (
            1.0 / jnp.maximum(s_hat, 1e-3)
        )
        k = jnp.clip(k, 1, v).astype(jnp.int32)
        # per-row dynamic k: mask ranks >= k
        ranks = jnp.argsort(jnp.argsort(-logits, axis=-1), axis=-1)
        filt = jnp.where(ranks < k[:, None], logits, NEG_INF)
        toks = jax.random.categorical(sub, filt, axis=-1).astype(jnp.int32)
        observed = -jnp.take_along_axis(logp, toks[:, None], 1)[:, 0] / jnp.log(2.0)
        mu = state.mu - p.mirostat_eta * (observed - p.mirostat_tau)
        if active is not None:
            mu = jnp.where(active, mu, state.mu)
        state = dataclasses.replace(state, mu=mu)
        return toks, observe(state, toks, active)

    logits = top_k_filter(logits, p.top_k)
    logits = tail_free_filter(logits, p.tfs_z)
    logits = typical_filter(logits, p.typical_p)
    logits = top_p_filter(logits, p.top_p)
    toks = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
    return toks, observe(state, toks, active)
