"""Unit tests for rope / kv-cache / attention reference ops."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.ops import kv_cache as kvc
from neural_speed_tpu.ops.attention import alibi_slopes, attention_ref
from neural_speed_tpu.ops.rope import (
    RopeScaling,
    apply_rope,
    rope_cos_sin,
    rope_inv_freq,
    rope_shift,
)

B, T, H, HKV, D, S = 2, 4, 4, 2, 32, 16


def _q(seed=0, shape=(B, T, H, D)):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


# ------------------------------------------------------------------ rope


@pytest.mark.parametrize("style", ["neox", "gptj"])
def test_rope_identity_at_zero_and_norm_preserving(style):
    x = _q()
    inv, ms = rope_inv_freq(D)
    pos = jnp.zeros((B, T), jnp.int32)
    cos, sin = rope_cos_sin(pos, inv, ms)
    np.testing.assert_allclose(
        np.asarray(apply_rope(x, cos, sin, style)), np.asarray(x), atol=1e-6
    )
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    cos, sin = rope_cos_sin(pos, inv, ms)
    out = apply_rope(x, cos, sin, style)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


@pytest.mark.parametrize("style", ["neox", "gptj"])
def test_rope_shift_composition(style):
    """rope(x, p) then shift by d  ==  rope(x, p+d) — the invariant that
    makes the shift-RoPE ring buffer correct (llama.cpp:437-446)."""
    x = _q(1)
    inv, _ = rope_inv_freq(D)
    pos = jnp.arange(T)[None, :].repeat(B, 0) + 5
    cos, sin = rope_cos_sin(pos, inv)
    x_roped = apply_rope(x, cos, sin, style)
    delta = jnp.full((B, T), -3, jnp.int32)
    shifted = rope_shift(x_roped, delta, inv, style=style)
    cos2, sin2 = rope_cos_sin(pos - 3, inv)
    expected = apply_rope(x, cos2, sin2, style)
    np.testing.assert_allclose(
        np.asarray(shifted), np.asarray(expected), atol=1e-5
    )


def test_partial_rotary():
    x = _q(2)
    rot = D // 2
    inv, _ = rope_inv_freq(rot)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    cos, sin = rope_cos_sin(pos, inv)
    out = apply_rope(x, cos, sin, "neox", rot_dim=rot)
    # pass-through tail untouched (stablelm.cpp:177-183 behavior)
    np.testing.assert_array_equal(
        np.asarray(out[..., rot:]), np.asarray(x[..., rot:])
    )


def test_yarn_and_linear_scaling_shapes():
    lin, ms1 = rope_inv_freq(D, scaling=RopeScaling("linear", factor=4.0))
    base, _ = rope_inv_freq(D)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(base) / 4.0)
    yarn, ms2 = rope_inv_freq(
        D, scaling=RopeScaling("yarn", factor=4.0, original_max_position=2048)
    )
    assert yarn.shape == base.shape and ms2 > 1.0
    lr, ms3 = rope_inv_freq(
        D,
        scaling=RopeScaling(
            "longrope", factor=4.0, original_max_position=4096,
            long_factors=tuple([2.0] * (D // 2)),
            short_factors=tuple([1.0] * (D // 2)),
        ),
        seq_len=8192,
    )
    np.testing.assert_allclose(np.asarray(lr), np.asarray(base) / 2.0)


# ------------------------------------------------------------------ kv cache


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_read(quantized):
    cache = kvc.init_cache(1, B, S, HKV, D, quantized=quantized)
    k_new = _q(3, (B, T, HKV, D))
    v_new = _q(4, (B, T, HKV, D))
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    cache = kvc.append_layer(cache, 0, k_new, v_new, pos)
    k, v = kvc.read_layer(cache, 0, jnp.float32)
    tol = 0.02 if quantized else 1e-2  # bf16 storage rounds too
    np.testing.assert_allclose(
        np.asarray(k[:, :T]), np.asarray(k_new), atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(v[:, :T]), np.asarray(v_new), atol=tol
    )
    assert np.asarray(k[:, T:]).max() == 0


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_window_overhang_preserves_sink(quantized):
    """Regression (round 5): a padded window with start + T > max_len
    (StreamingLLM re-eval at start=n_keep with a full-size bucket) used
    to clip the DUS start down and silently clobber the rows BELOW start
    — the sink tokens.  The writer now rolls the update by the clip
    amount: sink rows survive, real rows land at the true start."""
    cache = kvc.init_cache(1, 1, S, HKV, D, quantized=quantized)
    sink = _q(11, (1, 4, HKV, D))
    cache = kvc.append_layer(cache, 0, sink, sink,
                             jnp.arange(4)[None, :])
    # window of S rows at start=4 -> overhangs by 4
    win = _q(12, (1, S, HKV, D))
    pos = (4 + jnp.arange(S))[None, :]
    cache = kvc.append_layer(cache, 0, win, win, pos)
    k, _ = kvc.read_layer(cache, 0, jnp.float32)
    tol = 0.03 if quantized else 1e-2
    np.testing.assert_allclose(np.asarray(k[0, :4]), np.asarray(sink[0]),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(k[0, 4:]),
                               np.asarray(win[0, : S - 4]), atol=tol)


def test_kv_per_slot_positions():
    cache = kvc.init_cache(1, B, S, HKV, D)
    k_new = _q(5, (B, 1, HKV, D))
    pos = jnp.asarray([[3], [7]])
    cache = kvc.append_layer(cache, 0, k_new, k_new, pos)
    k, _ = kvc.read_layer(cache, 0, jnp.float32)
    np.testing.assert_allclose(np.asarray(k[0, 3]), np.asarray(k_new[0, 0]),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(k[1, 7]), np.asarray(k_new[1, 0]),
                               atol=1e-2)
    assert float(jnp.abs(k[0, 7]).max()) == 0.0


def test_kv_reorder():
    cache = kvc.init_cache(1, B, S, HKV, D)
    k_new = _q(6, (B, T, HKV, D))
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    cache = kvc.append_layer(cache, 0, k_new, k_new, pos)
    cache = kvc.set_lengths(cache, jnp.asarray([T, T]))
    re = kvc.reorder(cache, jnp.asarray([1, 1]))
    k, _ = kvc.read_layer(re, 0, jnp.float32)
    np.testing.assert_allclose(np.asarray(k[0]), np.asarray(k[1]))


def test_kv_evict_streaming():
    cache = kvc.init_cache(1, 1, 8, 1, D)
    k_new = jnp.arange(8, dtype=jnp.float32)[None, :, None, None].repeat(
        D, axis=-1
    )
    pos = jnp.arange(8)[None, :]
    cache = kvc.append_layer(cache, 0, k_new, k_new, pos)
    cache = kvc.set_lengths(cache, jnp.asarray([8]))
    out = kvc.evict(cache, n_keep=2, n_discard=3)
    k, _ = kvc.read_layer(out, 0, jnp.float32)
    got = np.asarray(k[0, :, 0, 0])
    np.testing.assert_allclose(got[:5], [0, 1, 5, 6, 7])
    assert int(out.lengths[0]) == 5


def test_kv_shift_ring_matches_reroped():
    """After shift_ring the cache must equal K computed at shifted
    positions (the infinite-inference invariant)."""
    inv, _ = rope_inv_freq(D)
    raw_k = _q(7, (1, 8, 1, D))
    pos = jnp.arange(8)[None, :]
    cos, sin = rope_cos_sin(pos, inv)
    roped = apply_rope(raw_k, cos, sin, "neox")

    cache = kvc.init_cache(1, 1, 8, 1, D, dtype=jnp.float32)
    cache = kvc.append_layer(cache, 0, roped, roped, pos)
    cache = kvc.set_lengths(cache, jnp.asarray([8]))
    out = kvc.shift_ring(cache, n_keep=0, n_discard=3, inv_freq=inv)

    # slots 0..4 now hold original tokens 3..7 rotated to positions 0..4
    cos2, sin2 = rope_cos_sin(pos - 3, inv)
    expected = apply_rope(raw_k, cos2, sin2, "neox")[0, 3:]
    k, _ = kvc.read_layer(out, 0, jnp.float32)
    np.testing.assert_allclose(np.asarray(k[0, :5]), np.asarray(expected),
                               atol=1e-4)

    # quantized cache: the requantized K scales must KEEP the cache's
    # stored dtype (a dtype flip mid-stream would retrace every jit and
    # double the scale memory)
    qcache = kvc.init_cache(1, 1, 8, 1, D, quantized=True)
    qcache = kvc.append_layer(qcache, 0, roped, roped, pos)
    qcache = kvc.set_lengths(qcache, jnp.asarray([8]))
    qout = kvc.shift_ring(qcache, n_keep=0, n_discard=3, inv_freq=inv)
    assert qout.k_scale.dtype == qcache.k_scale.dtype
    assert qout.v_scale.dtype == qcache.v_scale.dtype


# ------------------------------------------------------------------ attention


def _np_attention(q, k, v, scale, causal_from):
    """Dead-simple numpy attention for one batch, full heads."""
    B_, T_, H_, D_ = q.shape
    S_ = k.shape[1]
    out = np.zeros_like(q)
    for b in range(B_):
        for h in range(H_):
            logits = (q[b, :, h] @ k[b, :, h].T) * scale
            for t in range(T_):
                for s_ in range(S_):
                    if s_ > causal_from[b][t]:
                        logits[t, s_] = -1e9
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, h]
    return out


def test_attention_matches_numpy():
    q = _q(8, (B, T, H, D))
    k = _q(9, (B, S, H, D))
    v = _q(10, (B, S, H, D))
    qpos = jnp.arange(T)[None, :].repeat(B, 0) + (S - T)
    lens = jnp.full((B,), S)
    out = attention_ref(q, k, v, qpos, lens)
    ref = _np_attention(
        np.asarray(q), np.asarray(k), np.asarray(v), 1 / math.sqrt(D),
        np.asarray(qpos),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_attention_gqa_equals_expanded():
    q = _q(11, (B, T, H, D))
    k = _q(12, (B, S, HKV, D))
    v = _q(13, (B, S, HKV, D))
    qpos = jnp.arange(T)[None, :].repeat(B, 0) + (S - T)
    lens = jnp.full((B,), S)
    out = attention_ref(q, k, v, qpos, lens)
    k2 = jnp.repeat(k, H // HKV, axis=2)
    v2 = jnp.repeat(v, H // HKV, axis=2)
    # broadcast-expand ordering: head h uses kv head h//n_rep
    k2 = jnp.broadcast_to(
        k[:, :, :, None, :], (B, S, HKV, H // HKV, D)
    ).reshape(B, S, H, D)
    v2 = jnp.broadcast_to(
        v[:, :, :, None, :], (B, S, HKV, H // HKV, D)
    ).reshape(B, S, H, D)
    ref = attention_ref(q, k2, v2, qpos, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_attention_respects_lengths():
    q = _q(14, (B, 1, H, D))
    k = _q(15, (B, S, H, D))
    v = _q(16, (B, S, H, D))
    qpos = jnp.full((B, 1), S + 100)  # causal allows everything stored
    lens = jnp.asarray([4, 8])
    out = attention_ref(q, k, v, qpos, lens)
    # zeroing the masked tail must not change the result
    k2 = k.at[0, 4:].set(99.0)
    v2 = v.at[0, 4:].set(99.0)
    out2 = attention_ref(q, k2, v2, qpos, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_alibi_slopes_schedule():
    s = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s[0], 2 ** -1)
    np.testing.assert_allclose(s[-1], 2 ** -8)
    s6 = np.asarray(alibi_slopes(6))
    assert s6.shape == (6,)


def test_softcap_bounds_logits():
    q = _q(17, (B, T, H, D)) * 100.0
    k = _q(18, (B, S, H, D)) * 100.0
    v = _q(19, (B, S, H, D))
    qpos = jnp.arange(T)[None, :].repeat(B, 0) + (S - T)
    lens = jnp.full((B,), S)
    out = attention_ref(q, k, v, qpos, lens, logit_softcap=30.0)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_append_inactive_and_edge_slots():
    """The per-slot RMW decode append must write exactly the addressed
    rows: inactive slots untouched, edge positions (0, max_len-1) exact —
    bf16 and int8.  (The batched gather/scatter variant this used to A/B
    against was removed after crashing the TPU worker on chip —
    BENCH_NOTES 2026-08-19.)"""
    import numpy as np

    from neural_speed_tpu.ops import kv_cache as kvc

    for quantized in (False, True):
        rng = np.random.default_rng(4)
        c = kvc.init_cache(2, 4, 64, 2, 16, quantized=quantized)
        ref_k = np.zeros((2, 4, 2, 64, 16), np.float32)  # [L,B,H,S,D]
        written = np.zeros((2, 4, 64), bool)
        for step in range(3):
            pos = np.asarray([[5 + step], [0 + step], [63], [17 + step]])
            k_new = rng.standard_normal((4, 1, 2, 16)).astype(np.float32)
            v_new = rng.standard_normal((4, 1, 2, 16)).astype(np.float32)
            active = np.asarray([True, True, False, True])
            for layer in range(2):
                c = kvc.append_layer(c, layer, jnp.asarray(k_new),
                                     jnp.asarray(v_new), jnp.asarray(pos),
                                     jnp.asarray(active))
                for bi in range(4):
                    if active[bi]:
                        ref_k[layer, bi, :, pos[bi, 0]] = k_new[bi, 0]
                        written[layer, bi, pos[bi, 0]] = True
        c = kvc.set_lengths(c, jnp.full((4,), 64, jnp.int32))
        got_k, _ = kvc.read_layer(c, 0, jnp.float32)  # [B, S, H, D]
        got_k1, _ = kvc.read_layer(c, 1, jnp.float32)
        for layer, got in ((0, np.asarray(got_k)), (1, np.asarray(got_k1))):
            tol = 0.03 if quantized else 0.02  # cache dtype is bf16
            for bi in range(4):
                for s in range(64):
                    if written[layer, bi, s]:
                        np.testing.assert_allclose(
                            got[bi, s], ref_k[layer, bi, :, s],
                            atol=tol, rtol=0)
                    else:
                        np.testing.assert_array_equal(got[bi, s], 0.0)
