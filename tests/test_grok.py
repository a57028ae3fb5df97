"""Grok-1 graph semantics vs an in-test reference implementing the C math
directly (grok.cpp:130-360): 30·tanh(x/30) attention-logit softcap,
SANDWICH norms (attention output rms-normed before its residual add —
norm[2]/rms_norm_1, :279-281 — and MoE output rms-normed before its add —
norm[3]/rms_norm_3, :340-342), GELU-gated MoE with UNRENORMALIZED router
weights (global softmax probs of the selected experts; the weights_sum
division is commented out in the reference, :296-300), embedding
multiplier and output multiplier.

Grok has no transformers-native class, so this golden test carries its
own reference math (same approach as test_chatglm1/test_chatglm2) and
also round-trips the hpcai-style checkpoint key scheme through
convert.hf.map_grok."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_speed_tpu.models.arch import ArchConfig, MoEConfig
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.ops.quantize import dequantize
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.utils.synthetic import synth_params


def _cfg():
    return ArchConfig(
        name="grok", vocab_size=96, hidden_size=64, n_layers=2,
        n_heads=4, n_kv_heads=2, intermediate_size=96,
        max_position_embeddings=128, norm="rms", norm_eps=1e-5,
        rope_style="neox", logit_softcap=30.0, act="gelu_tanh",
        gated_ffn=True, post_attn_norm=True,
        moe=MoEConfig(num_experts=4, top_k=2, post_norm=True,
                      renorm=False),
        logit_scale=0.5773502691896257, embed_scale=2.0,
        tie_word_embeddings=True,
    )


def _params(cfg):
    return synth_params(cfg, named_qspec("int4", group_size=32),
                        dtype=jnp.float32)


def _deq_stacked(st, e):
    return np.asarray(dequantize(st.expert(e), jnp.float32))


def _rope_neox(x, pos, base=10000.0):
    t, h, d = x.shape
    out = x.copy()
    for j in range(d // 2):
        f = base ** (-2.0 * j / d)
        c, s = np.cos(pos * f)[:, None], np.sin(pos * f)[:, None]
        x0, x1 = x[:, :, j], x[:, :, j + d // 2]
        out[:, :, j] = x0 * c - x1 * s
        out[:, :, j + d // 2] = x0 * s + x1 * c
    return out


def _gelu_tanh(x):
    return np.asarray(jax.nn.gelu(jnp.asarray(x, jnp.float32),
                                  approximate=True))


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _ref_forward(params, cfg, tokens):
    from neural_speed_tpu.ops.quantize import dequantize as dq

    d, h, hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    t = len(tokens)
    emb = np.asarray(params["embed"]["weight"], np.float32)
    x = emb[tokens] * cfg.embed_scale
    pos = np.arange(t)
    causal = np.arange(t)[None, :] <= np.arange(t)[:, None]

    def rms(v):
        return v / np.sqrt((v * v).mean(-1, keepdims=True) + cfg.norm_eps)

    def deq(entry):
        return np.asarray(dq(entry["w"], jnp.float32))

    for lp in params["layers"]:
        hin = rms(x)
        q = (hin @ deq(lp["q"])).reshape(t, h, d)
        k = (hin @ deq(lp["k"])).reshape(t, hkv, d)
        v = (hin @ deq(lp["v"])).reshape(t, hkv, d)
        q, k = _rope_neox(q, pos, cfg.rope_base), _rope_neox(k, pos,
                                                             cfg.rope_base)
        k = np.repeat(k, h // hkv, axis=1)
        v = np.repeat(v, h // hkv, axis=1)
        # grok.cpp:208-209: KQ*scale/30 -> tanh -> *30 -> mask -> softmax
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(d)
        scores = 30.0 * np.tanh(scores / 30.0)
        scores = np.where(causal[None], scores, -1e9)
        probs = _softmax(scores)
        ctx = np.einsum("hts,shd->thd", probs, v).reshape(t, -1)
        attn = ctx @ deq(lp["o"])
        x = x + rms(attn)                      # norm[2] before residual
        f = rms(x)                             # norm[1] (ffn norm)
        # router: GLOBAL softmax, top-k, NO renormalization
        rl = f @ np.asarray(lp["moe"]["router"]["w"], np.float32)
        pr = _softmax(rl)
        moe_out = np.zeros_like(f)
        st = lp["moe"]["experts_stacked"]
        for row in range(t):
            top = np.argsort(-pr[row])[: cfg.moe.top_k]
            for e in top:
                g = _gelu_tanh(f[row] @ _deq_stacked(st["gate"], int(e)))
                u = f[row] @ _deq_stacked(st["up"], int(e))
                o = (g * u) @ _deq_stacked(st["down"], int(e))
                moe_out[row] += pr[row, e] * o
        x = x + rms(moe_out)                   # norm[3] before residual
    x = rms(x)
    return (x @ emb.T) * cfg.logit_scale


PROMPT = [9, 55, 3, 71, 22, 8, 44, 13, 60, 2]


def test_prefill_logits_match_reference_math():
    cfg = _cfg()
    params = _params(cfg)
    eng = Engine(_params(cfg), cfg, max_batch=2, max_len=128)
    ours = np.asarray(eng.prefill([PROMPT])[0], np.float32)
    ref = _ref_forward(params, cfg, PROMPT)[-1]
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)
    assert ours.argmax() == ref.argmax()


def test_incremental_greedy_matches_teacher_forced_reference():
    cfg = _cfg()
    params = _params(cfg)
    eng = Engine(_params(cfg), cfg, max_batch=2, max_len=128)
    gen = eng.generate_greedy(PROMPT, 12)
    full = _ref_forward(params, cfg, PROMPT + gen[:-1])
    p = len(PROMPT)
    for i, tok in enumerate(gen):
        row = full[p - 1 + i]
        # random-init logit gaps can sit inside fp accumulation noise:
        # accept the reference argmax or a near-tie within 3e-3 of it
        assert (int(row.argmax()) == tok
                or row[tok] >= row.max() - 3e-3), (i, tok, int(row.argmax()))


def test_router_renorm_semantics():
    """renorm=False must weight experts by the GLOBAL softmax probs
    (unrenormalized).  NOTE: under grok's post-MoE rms norm the
    renormalization cancels exactly (it rescales the MoE output by a
    per-token positive scalar, and rms normalization is scale-invariant)
    — which is why the reference could drop it (grok.cpp:296-300).  The
    semantics are therefore checked on the raw moe_ffn output, where the
    two rules genuinely differ."""
    import dataclasses

    from neural_speed_tpu.models.transformer import fuse_params, moe_ffn

    cfg = dataclasses.replace(
        _cfg(), moe=MoEConfig(num_experts=4, top_k=2, renorm=False))
    params = fuse_params(_params(cfg), cfg)
    lp = params["layers"][0]["moe"]
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, cfg.hidden_size)),
        jnp.float32)
    out = np.asarray(moe_ffn(x, lp, cfg), np.float32)

    cfg_rn = dataclasses.replace(
        cfg, moe=dataclasses.replace(cfg.moe, renorm=True))
    out_rn = np.asarray(moe_ffn(x, lp, cfg_rn), np.float32)
    assert not np.allclose(out, out_rn, atol=1e-4)

    # manual global-softmax weighting over the same dequantized experts
    rl = np.asarray(x, np.float32)[0] @ np.asarray(lp["router"]["w"],
                                                   np.float32)
    pr = _softmax(rl)
    st = lp["experts_stacked"]
    ref = np.zeros((3, cfg.hidden_size), np.float32)
    for row in range(3):
        for e in np.argsort(-pr[row])[: cfg.moe.top_k]:
            g = _gelu_tanh(np.asarray(x[0, row]) @ _deq_stacked(st["gate"],
                                                                int(e)))
            u = np.asarray(x[0, row], np.float32) @ _deq_stacked(st["up"],
                                                                 int(e))
            ref[row] += pr[row, e] * ((g * u) @ _deq_stacked(st["down"],
                                                             int(e)))
    np.testing.assert_allclose(out[0], ref, rtol=1e-2, atol=1e-2)


def test_map_grok_key_scheme():
    """convert.hf.map_grok ingests the hpcai-style checkpoint keys
    (grok_utils.cpp:171-206 scheme) and the resulting model runs."""
    import torch

    from neural_speed_tpu.convert.hf import Converter, map_grok

    cfg = _cfg()
    torch.manual_seed(0)
    e, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {"transformer.in_out_embed.weight": torch.randn(v, e) * 0.02,
          "transformer.rms_norm.weight": torch.ones(e),
          "lm_head.weight": torch.randn(v, e) * 0.02}
    kvd = cfg.kv_dim
    for i in range(cfg.n_layers):
        pre = f"transformer.decoder_layer.{i}."
        att = pre + "multi_head_attention."
        sd[pre + "rms_norm.weight"] = torch.ones(e)
        sd[pre + "rms_norm_1.weight"] = torch.ones(e)
        sd[pre + "rms_norm_2.weight"] = torch.ones(e)
        sd[pre + "rms_norm_3.weight"] = torch.ones(e)
        sd[att + "query.weight"] = torch.randn(e, e) * 0.05
        sd[att + "key.weight"] = torch.randn(kvd, e) * 0.05
        sd[att + "value.weight"] = torch.randn(kvd, e) * 0.05
        sd[att + "linear.weight"] = torch.randn(e, e) * 0.05
        sd[pre + "router.weight"] = torch.randn(cfg.moe.num_experts, e) * 0.05
        for x in range(cfg.moe.num_experts):
            ep = pre + f"moe.{x}."
            sd[ep + "linear.weight"] = torch.randn(inter, e) * 0.05
            sd[ep + "linear_1.weight"] = torch.randn(e, inter) * 0.05
            sd[ep + "linear_v.weight"] = torch.randn(inter, e) * 0.05
    params = map_grok(sd, cfg, Converter(cfg, named_qspec("int4", 32),
                                         dtype=jnp.float32))
    eng = Engine(params, cfg, max_batch=1, max_len=64)
    out = eng.generate_greedy([5, 9, 2, 44], 6)
    assert len(out) == 6 and all(0 <= tk < v for tk in out)
