"""Qwen-1 graph semantics vs in-test reference math (qwen.cpp:40-330 +
qwen_utils.cpp:150-168): fused c_attn [q; k; v] with bias, un-biased
c_proj, RMSNorm, neox rope over the full head, and the MLP computing
w1(x) * silu(w2(x)) @ c_proj — i.e. silu on w2 (gate), w1 is the up
projection.  Also covers the HF-faithful logn attention scaling our
config enables for contexts past the training length (the reference
does not implement logn; it is an extension matching modeling_qwen.py's
logn_list = log_n(i) for i > seq_length).

Qwen-1 is trust_remote_code-only, so this golden test carries its own
reference (same approach as test_chatglm1/2, test_grok)."""

import jax.numpy as jnp
import numpy as np
import torch

from neural_speed_tpu.convert.hf import Converter, map_qwen
from neural_speed_tpu.models.configs import qwen_arch
from neural_speed_tpu.runtime.engine import Engine

HF = dict(vocab_size=96, hidden_size=64, num_hidden_layers=2,
          num_attention_heads=4, intermediate_size=256,  # halved by arch
          seq_length=16, layer_norm_epsilon=1e-6, use_logn_attn=True)


def _state_dict(cfg):
    torch.manual_seed(3)
    e, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {"transformer.wte.weight": torch.randn(v, e) * 0.02,
          "transformer.ln_f.weight": torch.ones(e),
          "lm_head.weight": torch.randn(v, e) * 0.02}
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        sd[pre + "ln_1.weight"] = torch.ones(e)
        sd[pre + "ln_2.weight"] = torch.ones(e)
        sd[pre + "attn.c_attn.weight"] = torch.randn(3 * e, e) * 0.05
        sd[pre + "attn.c_attn.bias"] = torch.randn(3 * e) * 0.02
        sd[pre + "attn.c_proj.weight"] = torch.randn(e, e) * 0.05
        sd[pre + "mlp.w1.weight"] = torch.randn(inter, e) * 0.05
        sd[pre + "mlp.w2.weight"] = torch.randn(inter, e) * 0.05
        sd[pre + "mlp.c_proj.weight"] = torch.randn(e, inter) * 0.05
    return sd


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


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ref_forward(sd, cfg, tokens):
    d, h = cfg.head_dim, cfg.n_heads
    e = cfg.hidden_size
    t = len(tokens)
    x = sd["transformer.wte.weight"].numpy()[tokens].astype(np.float32)
    pos = np.arange(t)
    causal = np.arange(t)[None, :] <= np.arange(t)[:, None]
    # HF qwen logn: scale queries once the 1-indexed position exceeds the
    # training seq_length
    logn = np.maximum(np.log(pos + 1.0) / np.log(cfg.max_position_embeddings),
                      1.0)

    def rms(v):
        return v / np.sqrt((v * v).mean(-1, keepdims=True) + cfg.norm_eps)

    def w(name):
        return sd[name].numpy().T.astype(np.float32)

    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        hin = rms(x)
        qkv = hin @ w(pre + "attn.c_attn.weight") + sd[
            pre + "attn.c_attn.bias"].numpy().astype(np.float32)
        q = qkv[:, :e].reshape(t, h, d)
        k = qkv[:, e: 2 * e].reshape(t, h, d)
        v = qkv[:, 2 * e:].reshape(t, h, d)
        q = _rope_neox(q, pos, cfg.rope_base) * logn[:, None, None]
        k = _rope_neox(k, pos, cfg.rope_base)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(d)
        scores = np.where(causal[None], scores, -1e9)
        ex = np.exp(scores - scores.max(-1, keepdims=True))
        probs = ex / ex.sum(-1, keepdims=True)
        ctx = np.einsum("hts,shd->thd", probs, v).reshape(t, -1)
        x = x + ctx @ w(pre + "attn.c_proj.weight")
        f = rms(x)
        # qwen.cpp:40-60: w1(x) * silu(w2(x)) @ c_proj
        mlp = ((f @ w(pre + "mlp.w1.weight"))
               * _silu(f @ w(pre + "mlp.w2.weight"))
               ) @ w(pre + "mlp.c_proj.weight")
        x = x + mlp
    x = rms(x)
    return x @ w("lm_head.weight")


PROMPT = [5, 17, 9, 33, 2, 41, 7, 28, 11, 3, 60, 22]


def test_prefill_logits_match_reference_math():
    cfg = qwen_arch(HF)
    sd = _state_dict(cfg)
    params = map_qwen(sd, cfg, Converter(cfg, None, dtype=jnp.float32))
    eng = Engine(params, cfg, max_batch=2, max_len=64)
    ours = np.asarray(eng.prefill([PROMPT])[0], np.float32)
    ref = _ref_forward(sd, cfg, PROMPT)[-1]
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)
    assert ours.argmax() == ref.argmax()


def test_incremental_greedy_with_logn_past_train_ctx():
    """Generation runs past seq_length=16, so the logn query scaling is
    active for later steps — incremental decode must match the
    teacher-forced reference including those positions."""
    cfg = qwen_arch(HF)
    assert cfg.logn_attn and cfg.max_position_embeddings == 16
    sd = _state_dict(cfg)
    params = map_qwen(sd, cfg, Converter(cfg, None, dtype=jnp.float32))
    eng = Engine(params, cfg, max_batch=2, max_len=64)
    gen = eng.generate_greedy(PROMPT, 12)   # 12+12 = 24 > 16
    full = _ref_forward(sd, cfg, PROMPT + gen[:-1])
    p = len(PROMPT)
    for i, tok in enumerate(gen):
        row = full[p - 1 + i]
        assert (int(row.argmax()) == tok
                or row[tok] >= row.max() - 3e-3), (i, tok, int(row.argmax()))
