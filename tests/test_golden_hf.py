"""Golden-output tests vs HF transformers (fp32).

Mirrors the reference e2e test strategy (tests/test_python_api.py:26-110):
greedy ids must equal the HF fp32 ids and logits must match.  We go
further: every supported arch is validated against a tiny random HF model
built in-process (no network, CI-friendly — an improvement over the
reference's fixture .pth files on an internal share).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.ops.qtypes import QSpec, QType

torch.manual_seed(0)

PROMPT = [1, 5, 9, 17, 33, 4, 250, 7]
N_NEW = 8

# kwargs shared by llama-style HF configs
LLAMA_TINY = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=128,
)


def _build(model_cls, config):
    torch.manual_seed(0)
    with torch.no_grad():
        m = model_cls(config)
    m.eval()
    return m


def _hf_logits_and_greedy(m, ids, n_new):
    with torch.no_grad():
        logits = m(torch.tensor([ids])).logits[0].float().numpy()
        out = m.generate(
            torch.tensor([ids]), max_new_tokens=n_new, do_sample=False,
            num_beams=1, pad_token_id=0,
        )[0].tolist()
    return logits, out[len(ids):]


def _ours_logits_and_greedy(hf_config_dict, state_dict, ids, n_new,
                            qspec=None):
    cfg = arch_from_hf_config(hf_config_dict)
    params = params_from_state_dict(
        state_dict, cfg, qspec=qspec, dtype=jnp.float32
    )
    eng = Engine(params, cfg, max_batch=1, max_len=128)
    from neural_speed_tpu.models.transformer import forward

    cache = eng.new_cache()
    t = len(ids)
    pos = jnp.arange(t)[None, :]
    logits, _ = forward(
        params, cfg, jnp.asarray([ids]), pos, cache, jnp.asarray([t])
    )
    toks = eng.generate_greedy(ids, n_new)
    return np.asarray(logits[0]), toks


def _run_golden(model_cls, config, atol=5e-3, prompt=None, n_new=N_NEW):
    m = _build(model_cls, config)
    ids = prompt or PROMPT
    hf_logits, hf_toks = _hf_logits_and_greedy(m, ids, n_new)
    sd = dict(m.state_dict())
    our_logits, our_toks = _ours_logits_and_greedy(
        config.to_dict(), sd, ids, n_new
    )
    np.testing.assert_allclose(our_logits, hf_logits, atol=atol, rtol=1e-3)
    assert our_toks == hf_toks, (our_toks, hf_toks)


# --------------------------------------------------------------------------


def test_llama_gqa():
    from transformers import LlamaConfig, LlamaForCausalLM

    _run_golden(
        LlamaForCausalLM,
        LlamaConfig(**LLAMA_TINY, num_key_value_heads=2,
                    tie_word_embeddings=False),
    )


def test_mistral():
    from transformers import MistralConfig, MistralForCausalLM

    _run_golden(
        MistralForCausalLM,
        MistralConfig(**LLAMA_TINY, num_key_value_heads=2,
                      sliding_window=None),
    )


def test_qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    _run_golden(
        Qwen2ForCausalLM,
        Qwen2Config(**LLAMA_TINY, num_key_value_heads=2),
    )


def test_gptj():
    from transformers import GPTJConfig, GPTJForCausalLM

    _run_golden(
        GPTJForCausalLM,
        GPTJConfig(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                   n_positions=128, rotary_dim=8),
    )


def test_gptneox():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    _run_golden(
        GPTNeoXForCausalLM,
        GPTNeoXConfig(**LLAMA_TINY, rotary_pct=0.25,
                      use_parallel_residual=True),
    )


def test_gptneox_sequential():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    _run_golden(
        GPTNeoXForCausalLM,
        GPTNeoXConfig(**LLAMA_TINY, rotary_pct=0.25,
                      use_parallel_residual=False),
    )


def test_opt():
    from transformers import OPTConfig, OPTForCausalLM

    _run_golden(
        OPTForCausalLM,
        OPTConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                  num_attention_heads=4, ffn_dim=128,
                  max_position_embeddings=128, word_embed_proj_dim=64,
                  do_layer_norm_before=True, activation_function="relu"),
    )


def test_bloom():
    from transformers import BloomConfig, BloomForCausalLM

    _run_golden(
        BloomForCausalLM,
        BloomConfig(vocab_size=256, hidden_size=64, n_layer=2, n_head=4),
    )


def test_falcon_mqa():
    from transformers import FalconConfig, FalconForCausalLM

    _run_golden(
        FalconForCausalLM,
        FalconConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, multi_query=True,
                     new_decoder_architecture=False, parallel_attn=True,
                     bias=False, alibi=False),
    )


def test_mpt_alibi():
    from transformers import MptConfig, MptForCausalLM

    _run_golden(
        MptForCausalLM,
        MptConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=4,
                  expansion_ratio=4, max_seq_len=128),
    )


def test_starcoder():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    _run_golden(
        GPTBigCodeForCausalLM,
        GPTBigCodeConfig(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                         n_positions=128, multi_query=True,
                         activation_function="gelu_pytorch_tanh"),
    )


def test_phi():
    from transformers import PhiConfig, PhiForCausalLM

    _run_golden(
        PhiForCausalLM,
        PhiConfig(**LLAMA_TINY, num_key_value_heads=4,
                  partial_rotary_factor=0.5),
    )


def test_phi3_fused():
    from transformers import Phi3Config, Phi3ForCausalLM

    _run_golden(
        Phi3ForCausalLM,
        Phi3Config(**LLAMA_TINY, num_key_value_heads=2, pad_token_id=0,
                   bos_token_id=1, eos_token_id=2),
    )


def test_gemma():
    from transformers import GemmaConfig, GemmaForCausalLM

    _run_golden(
        GemmaForCausalLM,
        GemmaConfig(**LLAMA_TINY, head_dim=16, num_key_value_heads=2,
                    hidden_act="gelu_pytorch_tanh"),
        atol=8e-3,
    )


def test_stablelm():
    from transformers import StableLmConfig, StableLmForCausalLM

    _run_golden(
        StableLmForCausalLM,
        StableLmConfig(**LLAMA_TINY, num_key_value_heads=2,
                       partial_rotary_factor=0.25),
    )


def test_mixtral_moe():
    from transformers import MixtralConfig, MixtralForCausalLM

    _run_golden(
        MixtralForCausalLM,
        MixtralConfig(**LLAMA_TINY, num_key_value_heads=2,
                      num_local_experts=4, num_experts_per_tok=2),
        atol=8e-3,
    )


def test_quantized_int8_greedy_matches_fp32():
    """int8 g-1 quantization is near-lossless: greedy ids must match the
    fp32 run on a tiny model (reference acc guidance parity)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(**LLAMA_TINY, num_key_value_heads=2)
    m = _build(LlamaForCausalLM, config)
    ids = [1, 5, 9, 17, 33, 4]
    _, hf_toks = _hf_logits_and_greedy(m, ids, 8)
    sd = dict(m.state_dict())
    _, our_toks = _ours_logits_and_greedy(
        config.to_dict(), sd, ids, 8,
        qspec=QSpec(QType.INT, 8, -1, True),
    )
    assert our_toks == hf_toks


def test_moe_decode_switch_path_matches_dense():
    """B*T==1 MoE decode uses lax.switch over selected experts only; must
    equal the dense-all-experts path exactly."""
    import jax
    import jax.numpy as jnp

    from neural_speed_tpu.models.arch import ArchConfig, MoEConfig
    from neural_speed_tpu.models.transformer import moe_ffn
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.utils.synthetic import synth_qtensor

    cfg = ArchConfig(name="mixtral", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128,
                     moe=MoEConfig(num_experts=4, top_k=2))
    key = jax.random.PRNGKey(0)
    spec = named_qspec("int4", group_size=32)
    experts = []
    for e in range(4):
        kk = jax.random.fold_in(key, e)
        experts.append({
            "gate": {"w": synth_qtensor(jax.random.fold_in(kk, 0), 64, 128,
                                        spec)},
            "up": {"w": synth_qtensor(jax.random.fold_in(kk, 1), 64, 128,
                                      spec)},
            "down": {"w": synth_qtensor(jax.random.fold_in(kk, 2), 128, 64,
                                        spec)},
        })
    p = {"router": {"w": jax.random.normal(key, (64, 4), jnp.float32)},
         "experts": experts}
    x1 = jax.random.normal(jax.random.fold_in(key, 9), (1, 1, 64),
                           jnp.float32)
    out_switch = moe_ffn(x1, p, cfg)            # B*T==1 -> switch path
    x2 = jnp.concatenate([x1, x1], axis=1)      # B*T==2 -> dense path
    out_dense = moe_ffn(x2, p, cfg)[:, :1]
    np.testing.assert_allclose(np.asarray(out_switch),
                               np.asarray(out_dense), rtol=1e-5, atol=1e-5)
