"""Pallas flash attention vs the XLA reference (interpret mode on CPU).

Mirrors the reference's fused-MHA test strategy
(core/layers/mha_dense_tests.cpp: fused kernel vs naive reference across
dtype/mask/GQA configs) — here every case runs the Pallas kernel in
interpreter mode and compares against attention_ref.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speed_tpu.ops import kv_cache as kvc
from neural_speed_tpu.ops.attention import alibi_slopes, attention_ref
from neural_speed_tpu.ops import flash


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("NST_FLASH", "interpret")


def _mk(b, t, h, hkv, d, s, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    return q, k, v


def _mha(q, k, v, ks, vs, pos, kv_lens, **kw):
    """flash.mha with [B,S,H,D]-layout k/v (and [B,S,H,1] scales) as used by
    attention_ref, transposed to the kernel's cache layout."""
    t = lambda a: None if a is None else a.transpose(0, 2, 1, 3)
    ks_t = None if ks is None else ks[..., 0].transpose(0, 2, 1)
    vs_t = None if vs is None else vs[..., 0].transpose(0, 2, 1)
    return flash.mha(q, t(k), t(v), ks_t, vs_t, pos, kv_lens, **kw)


def _compare(out, ref, q_positions, kv_lens, atol=2e-2):
    """Compare only rows that attend to at least one valid key."""
    valid = (q_positions >= 0) & (kv_lens[:, None] > 0)
    o = np.asarray(out, np.float32)[np.asarray(valid)]
    r = np.asarray(ref, np.float32)[np.asarray(valid)]
    np.testing.assert_allclose(o, r, atol=atol, rtol=2e-2)


def test_prefill_causal_gqa():
    b, t, h, hkv, d, s = 2, 16, 8, 2, 128, 256
    q, k, v = _mk(b, t, h, hkv, d, s)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    kv_lens = jnp.array([t, t - 5], jnp.int32)
    args = dict(scale=1.0 / np.sqrt(d), causal=True)
    out = _mha(q, k, v, None, None, pos, kv_lens, **args)
    assert out is not None
    ref = attention_ref(q, k, v, pos, kv_lens, **args)
    _compare(out, ref, pos, kv_lens)


@pytest.mark.parametrize("hkv,quant,alibi_on", [
    (8, False, False),   # n_rep=1 (llama-7B class): bt = 256
    (2, False, False),   # GQA n_rep=4: bt = 64
    (2, True, False),    # GQA + int8 KV scales
    (2, False, True),    # GQA + alibi slopes per group
])
def test_prefill_natural_layout_matches_packed(hkv, quant, alibi_on,
                                               monkeypatch):
    """Round 5: the NATURAL-layout prefill launcher (q/out stay
    [B,T,H,D]; rows = t*n_rep+g) must equal the packed launcher
    bit-for-bit per (b,t,h) — row order inside a block is free."""
    import neural_speed_tpu.ops.attention as attn

    b, h, d, s = 1, 8, 128, 512
    t = 256 if hkv == 8 else 64 * 2  # multiple of bt = 256//n_rep
    q, k, v = _mk(b, t, h, hkv, d, s, seed=3)
    ks = vs = None
    if quant:
        rng = np.random.default_rng(5)
        k = jnp.asarray(rng.integers(-127, 127, (b, s, hkv, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (b, s, hkv, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (b, s, hkv, 1)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (b, s, hkv, 1)), jnp.float32)
    al = attn.alibi_slopes(h) if alibi_on else None
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    kv_lens = jnp.full((b,), t, jnp.int32)
    args = dict(scale=1.0 / np.sqrt(d), causal=True, alibi=al)
    monkeypatch.setenv("NST_FLASH_NATQ", "1")
    out_nat = _mha(q, k, v, ks, vs, pos, kv_lens, **args)
    monkeypatch.setenv("NST_FLASH_NATQ", "0")
    out_packed = _mha(q, k, v, ks, vs, pos, kv_lens, **args)
    assert out_nat is not None and out_packed is not None
    np.testing.assert_array_equal(np.asarray(out_nat, np.float32),
                                  np.asarray(out_packed, np.float32))
    if not quant:
        ref = attention_ref(q, k, v, pos, kv_lens, **args)
        _compare(out_nat, ref, pos, kv_lens)


def test_decode_single_token():
    b, t, h, hkv, d, s = 4, 1, 8, 8, 128, 512
    q, k, v = _mk(b, t, h, hkv, d, s, seed=1)
    kv_lens = jnp.array([37, 512, 1, 255], jnp.int32)
    pos = (kv_lens - 1)[:, None]
    out = _mha(q, k, v, None, None, pos, kv_lens,
                    scale=1.0 / np.sqrt(d))
    ref = attention_ref(q, k, v, pos, kv_lens)
    _compare(out, ref, pos, kv_lens)


def test_alibi_and_softcap():
    b, t, h, hkv, d, s = 1, 8, 4, 4, 64, 128
    q, k, v = _mk(b, t, h, hkv, d, s, seed=2)
    pos = jnp.arange(t)[None].astype(jnp.int32)
    kv_lens = jnp.array([t], jnp.int32)
    slopes = alibi_slopes(h)
    for kwargs in (dict(alibi=slopes), dict(logit_softcap=30.0),
                   dict(alibi=slopes, logit_softcap=30.0)):
        out = _mha(q, k, v, None, None, pos, kv_lens,
                        scale=1.0 / np.sqrt(d), **kwargs)
        ref = attention_ref(q, k, v, pos, kv_lens, **kwargs)
        _compare(out, ref, pos, kv_lens)


def test_quantized_kv_decode():
    b, t, h, hkv, d, s = 2, 1, 8, 2, 128, 256
    q, kf, vf = _mk(b, t, h, hkv, d, s, seed=3)
    kc, ks = kvc.quantize_kv(kf)
    vc, vs = kvc.quantize_kv(vf)
    kv_lens = jnp.array([200, 256], jnp.int32)
    pos = (kv_lens - 1)[:, None]
    out = _mha(q, kc, vc, ks, vs, pos, kv_lens, scale=1.0 / np.sqrt(d))
    # reference on the dequantized cache
    kdq = kc.astype(jnp.float32) * ks
    vdq = vc.astype(jnp.float32) * vs
    ref = attention_ref(q, kdq, vdq, pos, kv_lens)
    _compare(out, ref, pos, kv_lens, atol=3e-2)


def test_quantized_kv_prefill_gqa():
    b, t, h, hkv, d, s = 1, 32, 4, 1, 64, 128
    q, kf, vf = _mk(b, t, h, hkv, d, s, seed=4)
    kc, ks = kvc.quantize_kv(kf)
    vc, vs = kvc.quantize_kv(vf)
    pos = jnp.arange(t)[None].astype(jnp.int32)
    kv_lens = jnp.array([t], jnp.int32)
    out = _mha(q, kc, vc, ks, vs, pos, kv_lens, scale=1.0 / np.sqrt(d))
    kdq = kc.astype(jnp.float32) * ks
    vdq = vc.astype(jnp.float32) * vs
    ref = attention_ref(q, kdq, vdq, pos, kv_lens)
    _compare(out, ref, pos, kv_lens, atol=3e-2)


def test_continuous_batching_positions():
    """Mixed prefill/decode offsets per slot (ORCA semantics)."""
    b, t, h, hkv, d, s = 3, 4, 4, 2, 128, 256
    q, k, v = _mk(b, t, h, hkv, d, s, seed=5)
    # slot 0: fresh prefill at 0; slot 1: chunk at offset 100;
    # slot 2: inactive spectator (kv_len 0)
    pos = jnp.stack([
        jnp.arange(4), 100 + jnp.arange(4), jnp.zeros(4, jnp.int32)
    ]).astype(jnp.int32)
    kv_lens = jnp.array([4, 104, 0], jnp.int32)
    out = _mha(q, k, v, None, None, pos, kv_lens,
                    scale=1.0 / np.sqrt(d))
    ref = attention_ref(q, k, v, pos, kv_lens)
    _compare(out, ref, pos, kv_lens)
    # inactive slot must be exactly zero (safe-divide path)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)


def test_long_prefill_multiblock_rows():
    """R > 256 exercises the row-block tiling path."""
    b, t, h, hkv, d, s = 1, 160, 4, 1, 64, 256
    q, k, v = _mk(b, t, h, hkv, d, s, seed=6)
    pos = jnp.arange(t)[None].astype(jnp.int32)
    kv_lens = jnp.array([t], jnp.int32)
    out = _mha(q, k, v, None, None, pos, kv_lens,
                    scale=1.0 / np.sqrt(d))
    ref = attention_ref(q, k, v, pos, kv_lens)
    _compare(out, ref, pos, kv_lens)


def test_engine_forward_matches_xla(monkeypatch):
    """Whole-model forward with flash (interpret) == XLA attention path."""
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.runtime import engine as eng
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                     n_layers=2, n_heads=2, n_kv_heads=2,
                     intermediate_size=256, max_position_embeddings=128)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    toks = jnp.array([[3, 17, 9, 2, 5, 11, 0, 0]], jnp.int32)
    lens = jnp.array([6], jnp.int32)
    start = jnp.zeros((1,), jnp.int32)

    monkeypatch.setenv("NST_FLASH", "off")
    jax.clear_caches()  # flash dispatch is trace-time: drop cached traces
    cache0 = eng.Engine(params, cfg, max_batch=1, max_len=128).new_cache()
    ref_logits, _ = eng.prefill_step(params, cfg, cache0, toks, lens, start)

    monkeypatch.setenv("NST_FLASH", "interpret")
    jax.clear_caches()
    cache1 = eng.Engine(params, cfg, max_batch=1, max_len=128).new_cache()
    out_logits, _ = eng.prefill_step(params, cfg, cache1, toks, lens, start)
    jax.clear_caches()

    np.testing.assert_allclose(
        np.asarray(out_logits, np.float32), np.asarray(ref_logits, np.float32),
        atol=5e-2, rtol=5e-2,
    )


@pytest.mark.parametrize("d", [80, 96])
def test_odd_head_dim(d):
    """head_dim 80 (phi-2/stablelm) / 96: fused attention instead of the
    silent XLA fallback (VERDICT r1 item 4; parity mha_dense.cpp:31-80
    arbitrary head sizes).  Covers prefill GQA, decode (head-blocked
    variant), and quantized KV."""
    b, t, h, hkv, s = 2, 16, 8, 2, 256
    q, k, v = _mk(b, t, h, hkv, d, s, seed=7 + d)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    kv_lens = jnp.array([t, t - 3], jnp.int32)
    args = dict(scale=1.0 / np.sqrt(d), causal=True)
    out = _mha(q, k, v, None, None, pos, kv_lens, **args)
    assert out is not None
    ref = attention_ref(q, k, v, pos, kv_lens, **args)
    _compare(out, ref, pos, kv_lens)

    # decode shape (exercises the head-blocked kernel) + quantized KV
    qd = q[:, :1]
    kc, ks = kvc.quantize_kv(k)
    vc, vs = kvc.quantize_kv(v)
    kv_lens_d = jnp.array([200, 256], jnp.int32)
    pos_d = (kv_lens_d - 1)[:, None]
    out = _mha(qd, kc, vc, ks, vs, pos_d, kv_lens_d, scale=1.0 / np.sqrt(d))
    assert out is not None
    kdq = kc.astype(jnp.float32) * ks
    vdq = vc.astype(jnp.float32) * vs
    ref = attention_ref(qd, kdq, vdq, pos_d, kv_lens_d)
    _compare(out, ref, pos_d, kv_lens_d, atol=3e-2)


def test_unsupported_shape_warns_once():
    b, t, h, hkv, d, s = 1, 1, 4, 4, 72, 128  # d % 8 == 0 but not... 72%8==0
    # use a truly unsupported dim (not multiple of 8)
    d = 68
    q, k, v = _mk(b, t, h, hkv, d, s, seed=9)
    pos = jnp.zeros((b, t), jnp.int32)
    kv_lens = jnp.array([1], jnp.int32)
    flash._warned_shapes.clear()
    with pytest.warns(UserWarning, match="falling back"):
        out = _mha(q, k, v, None, None, pos, kv_lens, scale=0.125)
    assert out is None


def test_deferred_append_extra_kv():
    """Deferred KV append (round 3): the kernel seeds its online softmax
    with the current token's k/v OPERANDS instead of reading them from
    the cache (the cache row at the new position is stale).  Reference:
    attention over [stored keys .. , exact new token]."""
    b, t, h, hkv, d, s = 2, 1, 8, 2, 128, 256
    q, kf, vf = _mk(b, t, h, hkv, d, s, seed=7)
    rng = np.random.default_rng(8)
    k_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    lens = jnp.array([100, 255], jnp.int32)   # stored tokens per slot
    kv_lens = lens + 1                        # incl. the unstored token
    pos = lens[:, None]                       # query sits at the new slot

    # quantized cache with GARBAGE at the new position (it must be
    # ignored — the kernel takes the new token from the operands)
    kc, ks = kvc.quantize_kv(kf)
    vc, vs = kvc.quantize_kv(vf)
    tkv = lambda a: a.transpose(0, 2, 1, 3)
    out = flash.mha(
        q, tkv(kc), tkv(vc), ks[..., 0].transpose(0, 2, 1),
        vs[..., 0].transpose(0, 2, 1), pos, kv_lens,
        scale=1.0 / np.sqrt(d),
        extra_kv=(k_new, v_new),
    )
    assert out is not None

    # reference: dequantized stored keys with the EXACT new token written
    # at its position, standard attention over kv_lens
    kdq = np.array(kc.astype(jnp.float32) * ks)
    vdq = np.array(vc.astype(jnp.float32) * vs)
    for bi in range(b):
        kdq[bi, int(lens[bi])] = np.asarray(k_new[bi, 0])
        vdq[bi, int(lens[bi])] = np.asarray(v_new[bi, 0])
    ref = attention_ref(q, jnp.asarray(kdq), jnp.asarray(vdq), pos,
                        kv_lens)
    _compare(out, ref, pos, kv_lens, atol=3e-2)

    # inactive slot semantics (the real decode pattern: pos parked on the
    # trash position, kv_lens == stored length): the operands must be
    # ignored entirely
    pos_inact = jnp.full((b, 1), s - 1, jnp.int32)
    out2 = flash.mha(
        q, tkv(kc), tkv(vc), ks[..., 0].transpose(0, 2, 1),
        vs[..., 0].transpose(0, 2, 1), pos_inact, lens,
        scale=1.0 / np.sqrt(d),
        extra_kv=(k_new, v_new),
    )
    ref2 = attention_ref(q, kc.astype(jnp.float32) * ks,
                         vc.astype(jnp.float32) * vs,
                         pos_inact, lens)
    _compare(out2, ref2, pos_inact, lens, atol=3e-2)


def test_fused_append_writes_cache():
    """Fused in-kernel KV append: one pallas call does attention AND
    writes the new token's quantized row + scale through input_output-
    aliased cache buffers.  Checks (a) the attention output matches the
    exact-new-token reference, (b) the returned cache equals the host
    quantize_kv append bit-for-bit, (c) inactive slots' caches are
    preserved bit-for-bit."""
    L, b, h, hkv, d, s = 2, 2, 8, 2, 128, 256
    rng = np.random.default_rng(11)
    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32) * 0.3
    k_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    kc, ks = kvc.quantize_kv(kf)
    vc, vs = kvc.quantize_kv(vf)
    ks4, vs4 = ks[..., 0], vs[..., 0]

    # slot 0 active (stored 100, new token at pos 100); slot 1 inactive
    # (stored 200, query parked on the trash position)
    kv_lens = jnp.array([101, 200], jnp.int32)
    pos = jnp.array([[100], [s - 1]], jnp.int32)
    layer = 1
    res = flash.mha(
        q, kc, vc, ks4, vs4, pos, kv_lens, scale=1.0 / np.sqrt(d),
        layer=layer, extra_kv=(k_new, v_new), fused_append=True,
    )
    assert res is not None
    out, (k2, v2, ks2, vs2) = res

    # expected cache: host-side quantize of the new row into slot 0 only
    kq, ksq = kvc.quantize_kv(k_new.transpose(0, 2, 1, 3))
    vq, vsq = kvc.quantize_kv(v_new.transpose(0, 2, 1, 3))
    exp_k = np.asarray(kc).copy()
    exp_v = np.asarray(vc).copy()
    exp_ks = np.asarray(ks4).copy()
    exp_vs = np.asarray(vs4).copy()
    exp_k[layer, 0, :, 100] = np.asarray(kq)[0, :, 0]
    exp_v[layer, 0, :, 100] = np.asarray(vq)[0, :, 0]
    exp_ks[layer, 0, :, 100] = np.asarray(ksq)[0, :, 0, 0]
    exp_vs[layer, 0, :, 100] = np.asarray(vsq)[0, :, 0, 0]
    np.testing.assert_array_equal(np.asarray(k2), exp_k)
    np.testing.assert_array_equal(np.asarray(v2), exp_v)
    np.testing.assert_array_equal(np.asarray(ks2), exp_ks)
    np.testing.assert_array_equal(np.asarray(vs2), exp_vs)

    # attention output: dequantized stored keys + EXACT new token
    kdq = np.asarray(kc.astype(jnp.float32) * ks)[layer].copy()
    vdq = np.asarray(vc.astype(jnp.float32) * vs)[layer].copy()
    kdq[0, :, 100] = np.asarray(k_new)[0, 0]
    vdq[0, :, 100] = np.asarray(v_new)[0, 0]
    ref = attention_ref(q, jnp.asarray(kdq).transpose(0, 2, 1, 3),
                        jnp.asarray(vdq).transpose(0, 2, 1, 3), pos,
                        kv_lens)
    _compare(out, ref, pos, kv_lens, atol=3e-2)


@pytest.mark.parametrize("fused", [False, True])
def test_deferred_append_engine_equivalence(monkeypatch, fused):
    """Deferred/fused KV append end-to-end: the engine decode step's
    logits match the append-first path within quantization tolerance of
    the self column, and the cache ends up IDENTICAL (the append still
    happens, just off the critical path).  fused=True routes the append
    through the in-kernel aliased-row write instead of the RMW
    dispatches — same contract."""
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import Engine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(
        name="llama", vocab_size=256, hidden_size=256, n_layers=2,
        n_heads=8, n_kv_heads=4, intermediate_size=512,
        max_position_embeddings=256,
    )
    params = synth_params(cfg, QSpec(QType.INT, 4, 64, True))
    prompt = [5, 9, 2, 44, 17, 3]
    mode = "fused" if fused else "defer"

    # fixed token stream: argmax feedback on a random tiny model would
    # diverge on near-tie logits and invalidate the cache comparison
    toks = [7, 21, 3, 90]

    def run(defer):
        monkeypatch.setenv("NST_KV_APPEND", mode if defer else "plain")
        eng = Engine(params, cfg, max_batch=1, max_len=128,
                     kv_quantized=True)
        eng.prefill([prompt])
        active = jnp.ones((1,), bool)
        outs = []
        for t_ in toks:
            lg = eng.decode(jnp.array([t_], jnp.int32), active)
            outs.append(np.asarray(lg[0], np.float32))
        return outs, eng.cache

    ref_outs, ref_cache = run(False)
    got_outs, got_cache = run(True)
    for a, b_ in zip(ref_outs, got_outs):
        # the deferred self column uses the UNQUANTIZED k/v (append-first
        # reads back the int8 copy) — logits differ within the self
        # column's quantization noise.  A zero delta would mean the paths
        # were NOT retraced (the pre-round-4 vacuous-test failure mode).
        np.testing.assert_allclose(a, b_, atol=6e-2, rtol=6e-2)
    assert any(np.any(a != b_) for a, b_ in zip(ref_outs, got_outs)), \
        "identical logits: deferred path did not retrace (vacuous test)"
    # LAYER 0 cache bit-identical: same input activations -> the deferred
    # write stores the same quantized values.  (Layers >= 1 see layer 0's
    # attention OUTPUT, which legitimately differs by the self column's
    # quantization noise, so their codes can move +-1 LSB.)
    np.testing.assert_array_equal(np.asarray(ref_cache.k[0]),
                                  np.asarray(got_cache.k[0]))
    np.testing.assert_array_equal(np.asarray(ref_cache.v[0]),
                                  np.asarray(got_cache.v[0]))
    np.testing.assert_array_equal(np.asarray(ref_cache.k_scale[0]),
                                  np.asarray(got_cache.k_scale[0]))
    np.testing.assert_array_equal(np.asarray(ref_cache.lengths),
                                  np.asarray(got_cache.lengths))
    # deeper layers: codes within 1 LSB of each other
    dk = np.abs(np.asarray(ref_cache.k, np.int32)
                - np.asarray(got_cache.k, np.int32))
    assert dk.max() <= 2, f"layer>=1 codes drifted: max LSB delta {dk.max()}"


def test_fused_append_engine_batched_mixed_slots(monkeypatch):
    """Fused append with B=3 mixed-activity slots (the serving shape):
    a spectator slot's cache must stay bit-identical to the plain path
    and active slots' appends must land at their own rows."""
    import jax

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import Engine, decode_step
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(
        name="llama", vocab_size=256, hidden_size=256, n_layers=2,
        n_heads=8, n_kv_heads=4, intermediate_size=512,
        max_position_embeddings=256,
    )
    params = synth_params(cfg, QSpec(QType.INT, 4, 64, True))
    prompts = [[5, 9, 2, 44, 17, 3], [7, 21], [3, 3, 3, 8, 1, 9, 12]]
    toks = jnp.array([11, 80, 200], jnp.int32)
    # slot 1 is a spectator
    active = jnp.array([True, False, True])

    def run(mode):
        monkeypatch.setenv("NST_KV_APPEND", mode)
        eng = Engine(params, cfg, max_batch=3, max_len=128,
                     kv_quantized=True)
        eng.prefill(prompts)
        for _ in range(3):
            lg, eng.cache = decode_step(eng.params, eng.cfg, eng.cache,
                                        toks, active)
        return np.asarray(lg, np.float32), eng.cache

    lg_p, c_p = run("plain")
    lg_f, c_f = run("fused")
    np.testing.assert_allclose(lg_f, lg_p, atol=6e-2, rtol=6e-2)
    # spectator slot's whole cache is untouched and equal across paths
    np.testing.assert_array_equal(np.asarray(c_p.k[:, 1]),
                                  np.asarray(c_f.k[:, 1]))
    np.testing.assert_array_equal(np.asarray(c_p.v[:, 1]),
                                  np.asarray(c_f.v[:, 1]))
    # layer-0 rows written by the active slots are bit-identical
    np.testing.assert_array_equal(np.asarray(c_p.k[0, 0]),
                                  np.asarray(c_f.k[0, 0]))
    np.testing.assert_array_equal(np.asarray(c_p.k_scale[0, 2]),
                                  np.asarray(c_f.k_scale[0, 2]))
    np.testing.assert_array_equal(np.asarray(c_p.lengths),
                                  np.asarray(c_f.lengths))
