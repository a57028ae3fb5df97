"""Sampling suite tests (parity behaviors from model_utils.cpp:521-996)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_speed_tpu.ops import sampling as smp

V = 64


def _logits(seed=0, b=2):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, V)) * 3.0


def test_greedy():
    lg = _logits()
    toks = smp.greedy(lg)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(lg, -1)))


def test_top_k_restricts_support():
    lg = _logits(1)
    filt = smp.top_k_filter(lg, 5)
    kept = np.asarray(filt > smp.NEG_INF / 2).sum(-1)
    assert (kept == 5).all()


def test_top_p_keeps_head():
    lg = _logits(2)
    filt = smp.top_p_filter(lg, 0.5)
    kept = np.asarray(filt > smp.NEG_INF / 2)
    # top-1 always kept; mass of kept >= 0.5
    probs = np.asarray(jax.nn.softmax(lg, -1))
    assert (kept[np.arange(2), probs.argmax(-1)]).all()
    assert (np.where(kept, probs, 0).sum(-1) >= 0.5 - 1e-6).all()


def test_typical_and_tfs_keep_at_least_one():
    lg = _logits(3)
    for filt in (smp.typical_filter(lg, 0.2), smp.tail_free_filter(lg, 0.2)):
        assert (np.asarray(filt > smp.NEG_INF / 2).sum(-1) >= 1).all()


def test_repetition_penalty_discourages_repeats():
    p = smp.SamplingParams(repetition_penalty=2.0, do_sample=False,
                           temperature=0.0)
    st = smp.init_state(jax.random.PRNGKey(0), 1, V)
    lg = jnp.zeros((1, V)).at[0, 7].set(5.0).at[0, 9].set(4.0)
    # token 7 recently generated
    st = smp.observe(st, jnp.asarray([7], jnp.int32))
    out = smp.apply_penalties(lg, st, p)
    assert float(out[0, 7]) == 2.5 and float(out[0, 9]) == 4.0


def test_frequency_presence_penalties():
    p = smp.SamplingParams(repetition_penalty=1.0, frequency_penalty=0.5,
                           presence_penalty=1.0)
    st = smp.init_state(jax.random.PRNGKey(0), 1, V)
    for _ in range(3):
        st = smp.observe(st, jnp.asarray([7], jnp.int32))
    lg = jnp.zeros((1, V))
    out = smp.apply_penalties(lg, st, p)
    assert np.isclose(float(out[0, 7]), -(3 * 0.5 + 1.0))
    assert float(out[0, 9]) == 0.0


def test_sample_respects_top1_at_low_temp():
    p = smp.SamplingParams(temperature=0.01, top_k=1,
                           repetition_penalty=1.0)
    st = smp.init_state(jax.random.PRNGKey(1), 2, V)
    lg = _logits(4)
    toks, st2 = smp.sample(lg, st, p)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(lg, -1)))
    # state advanced
    assert int(st2.ring_pos[0]) == 1


def test_sample_distribution_roughly_matches():
    """Unfiltered categorical sampling should track softmax probs."""
    p = smp.SamplingParams(temperature=1.0, top_k=0, top_p=1.0,
                           repetition_penalty=1.0)
    lg = jnp.asarray([[2.0, 1.0, 0.0] + [smp.NEG_INF] * (V - 3)])
    counts = np.zeros(3)
    st = smp.init_state(jax.random.PRNGKey(2), 1, V)
    for _ in range(300):
        toks, st = smp.sample(lg, st, p)
        counts[int(toks[0])] += 1
    probs = np.asarray(jax.nn.softmax(lg[0, :3]))
    np.testing.assert_allclose(counts / 300, probs, atol=0.08)


def test_mirostat_v2_runs_and_adapts():
    p = smp.SamplingParams(temperature=1.0, mirostat=2,
                           repetition_penalty=1.0)
    st = smp.init_state(jax.random.PRNGKey(3), 1, V)
    mu0 = float(st.mu[0])
    for seed in range(5):
        toks, st = smp.sample(_logits(seed, 1), st, p)
    assert float(st.mu[0]) != mu0
    assert 0 <= int(toks[0]) < V


def test_mirostat_v1_runs():
    p = smp.SamplingParams(temperature=1.0, mirostat=1,
                           repetition_penalty=1.0)
    st = smp.init_state(jax.random.PRNGKey(4), 1, V)
    toks, st = smp.sample(_logits(7, 1), st, p)
    assert 0 <= int(toks[0]) < V


def test_sample_jits():
    p = smp.SamplingParams()
    st = smp.init_state(jax.random.PRNGKey(5), 2, V)
    f = jax.jit(lambda lg, st: smp.sample(lg, st, p))
    toks, st2 = f(_logits(8), st)
    assert toks.shape == (2,)
