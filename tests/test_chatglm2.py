"""ChatGLM-2/3 graph semantics vs an in-test reference implementing the
C math directly (chatglm2.cpp:79-330): MQA via multi_query_group_num,
VANILLA-mode rope (interleaved (2i, 2i+1) pairs — ne_rope_inplace mode 0,
chatglm2.cpp:166-174) over the first head_dim/2 dims with pass-through
tail, RMSNorm, swiglu with the fused h_to_4h split (x0=silu half first).

chatglm2 has no transformers-native class (trust_remote_code), so unlike
the 16 archs in test_golden_hf.py this golden test carries its own
reference math."""

import jax.numpy as jnp
import numpy as np

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.ops.quantize import dequantize
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.utils.synthetic import synth_params


def _cfg():
    return ArchConfig(
        name="chatglm2", vocab_size=96, hidden_size=64, n_layers=2,
        n_heads=4, n_kv_heads=2, intermediate_size=128,
        max_position_embeddings=128, norm="rms", norm_eps=1e-5,
        rope_style="gptj", rot_dim=8,  # head_dim 16 -> rope on half
        act="silu", gated_ffn=True,
    )


def _params(cfg):
    return synth_params(cfg, named_qspec("int4", group_size=32),
                        dtype=jnp.float32)


def _deq(entry):
    return np.asarray(dequantize(entry["w"], jnp.float32))


def _rope_vanilla(x, pos, rot, base=10000.0):
    """ne_layers.c mode-0 rope: interleaved pairs (2i, 2i+1), theta =
    pos * base^(-2i/rot), applied to the first `rot` dims only."""
    t, h, d = x.shape
    out = x.copy()
    for i in range(rot // 2):
        f = base ** (-2.0 * i / rot)
        c, s = np.cos(pos * f)[:, None], np.sin(pos * f)[:, None]
        x0, x1 = x[:, :, 2 * i], x[:, :, 2 * i + 1]
        out[:, :, 2 * i] = x0 * c - x1 * s
        out[:, :, 2 * i + 1] = x0 * s + x1 * c
    return out


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ref_forward(params, cfg, tokens):
    d = cfg.head_dim
    h, hkv = cfg.n_heads, cfg.n_kv_heads
    t = len(tokens)
    x = np.asarray(params["embed"]["weight"], np.float32)[tokens]
    pos = np.arange(t)
    causal = np.arange(t)[None, :] <= np.arange(t)[:, None]

    def rms(v):
        return v / np.sqrt((v * v).mean(-1, keepdims=True) + cfg.norm_eps)

    for lp in params["layers"]:
        hin = rms(x)
        q = (hin @ _deq(lp["q"])).reshape(t, h, d)
        k = (hin @ _deq(lp["k"])).reshape(t, hkv, d)
        v = (hin @ _deq(lp["v"])).reshape(t, hkv, d)
        q = _rope_vanilla(q, pos, cfg.rot_dim, cfg.rope_base)
        k = _rope_vanilla(k, pos, cfg.rot_dim, cfg.rope_base)
        k = np.repeat(k, h // hkv, axis=1)   # MQA: kv heads shared
        v = np.repeat(v, h // hkv, axis=1)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(d)
        scores = np.where(causal[None], scores, -1e9)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        ctx = np.einsum("hts,shd->thd", probs, v).reshape(t, -1)
        x = x + ctx @ _deq(lp["o"])
        f = rms(x)
        mlp = (_silu(f @ _deq(lp["ffn"]["gate"]))
               * (f @ _deq(lp["ffn"]["up"]))) @ _deq(lp["ffn"]["down"])
        x = x + mlp
    x = rms(x)
    return x @ _deq(params["lm_head"])


PROMPT = [7, 41, 3, 88, 15, 2, 61, 29, 5, 77, 10]


def test_prefill_logits_match_reference_math():
    cfg = _cfg()
    params = _params(cfg)
    eng = Engine(_params(cfg), cfg, max_batch=2, max_len=128)
    ours = np.asarray(eng.prefill([PROMPT])[0], np.float32)
    ref = _ref_forward(params, cfg, PROMPT)[-1]
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)


def test_incremental_greedy_matches_teacher_forced_reference():
    cfg = _cfg()
    params = _params(cfg)
    eng = Engine(_params(cfg), cfg, max_batch=2, max_len=128)
    gen = eng.generate_greedy(PROMPT, 16)
    full = _ref_forward(params, cfg, PROMPT + gen[:-1])
    p = len(PROMPT)
    for i, tok in enumerate(gen):
        assert int(full[p - 1 + i].argmax()) == tok, i


def test_rope_is_interleaved_not_neox():
    """Guard for the rope-style regression this test was written to catch:
    neox split-half rotation over the rot block must NOT reproduce the
    reference logits (the styles only coincide at rot<=2)."""
    cfg = _cfg()
    params = _params(cfg)
    import dataclasses

    wrong = dataclasses.replace(cfg, rope_style="neox")
    eng = Engine(_params(cfg), wrong, max_batch=2, max_len=128)
    ours_wrong = np.asarray(eng.prefill([PROMPT])[0], np.float32)
    ref = _ref_forward(params, cfg, PROMPT)[-1]
    assert not np.allclose(ours_wrong, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# baichuan (the remaining trust_remote_code arch): W_pack fused QKV split
# (baichuan.cpp:210 / convert_baichuan.py) + ALiBi-13B config rule
# ---------------------------------------------------------------------------


def test_baichuan_wpack_split_equals_separate_projections():
    import torch

    from neural_speed_tpu.convert.hf import Converter, map_llama
    from neural_speed_tpu.models.configs import baichuan_arch
    from neural_speed_tpu.ops.qtypes import named_qspec

    hf = dict(model_type="baichuan", vocab_size=96, hidden_size=64,
              num_hidden_layers=1, num_attention_heads=4,
              intermediate_size=128, max_position_embeddings=128,
              rms_norm_eps=1e-6, num_key_value_heads=4)
    cfg = baichuan_arch(hf)
    assert cfg.rope_style == "neox" and not cfg.use_alibi  # 7B-shaped
    torch.manual_seed(1)
    e, inter, v = 64, 128, 96
    base = {
        "model.embed_tokens.weight": torch.randn(v, e) * 0.02,
        "model.norm.weight": torch.ones(e),
        "lm_head.weight": torch.randn(v, e) * 0.02,
        "model.layers.0.input_layernorm.weight": torch.ones(e),
        "model.layers.0.post_attention_layernorm.weight": torch.ones(e),
        "model.layers.0.self_attn.o_proj.weight": torch.randn(e, e) * 0.05,
        "model.layers.0.mlp.gate_proj.weight": torch.randn(inter, e) * 0.05,
        "model.layers.0.mlp.up_proj.weight": torch.randn(inter, e) * 0.05,
        "model.layers.0.mlp.down_proj.weight": torch.randn(e, inter) * 0.05,
    }
    q = torch.randn(e, e) * 0.05
    k = torch.randn(e, e) * 0.05
    vv = torch.randn(e, e) * 0.05
    sd_pack = dict(base)
    sd_pack["model.layers.0.self_attn.W_pack.weight"] = torch.cat([q, k, vv])
    sd_sep = dict(base)
    sd_sep["model.layers.0.self_attn.q_proj.weight"] = q
    sd_sep["model.layers.0.self_attn.k_proj.weight"] = k
    sd_sep["model.layers.0.self_attn.v_proj.weight"] = vv

    prompt = [5, 17, 9, 33, 2, 41, 7]
    outs = []
    for sd in (sd_pack, sd_sep):
        params = map_llama(sd, cfg, Converter(cfg, named_qspec("int4", 32),
                                              dtype=jnp.float32))
        eng = Engine(params, cfg, max_batch=1, max_len=64)
        outs.append(np.asarray(eng.prefill([prompt])[0], np.float32))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_baichuan_13b_uses_alibi_no_rope():
    from neural_speed_tpu.models.configs import baichuan_arch

    hf = dict(model_type="baichuan", vocab_size=96, hidden_size=5120,
              num_hidden_layers=1, num_attention_heads=40,
              intermediate_size=128, max_position_embeddings=128,
              rms_norm_eps=1e-6, num_key_value_heads=40)
    cfg = baichuan_arch(hf)
    assert cfg.use_alibi and cfg.rope_style == "none"
