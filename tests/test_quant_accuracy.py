"""Quantized-accuracy matrix: qspec grid x archs vs fp32 HF logits.

The reference validates quantized configs with cosine-similarity /
rel-L2 thresholds against saved fp32 logits (tests/test_python_api.py:66-79
`cmpData`, scripts/cal_diff.py).  No network or real checkpoints exist in
CI, so we apply the same *methodology* to tiny random in-process HF models:
for every (arch x quantization spec) cell the quantized engine's prompt
logits must stay within a documented cosine / rel-L2 budget of the fp32
run.  Thresholds are calibrated on hidden=256 models (smaller widths make
quantization error look artificially large) and recorded in PARITY.md.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch

from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.models.transformer import forward
from neural_speed_tpu.ops.qtypes import QSpec, QType, named_qspec
from neural_speed_tpu.runtime.engine import Engine

PROMPT = [1, 5, 9, 17, 33, 4, 250, 7, 101, 63, 2, 88]

TINY = dict(
    vocab_size=256,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=512,
    max_position_embeddings=128,
)


def _arch_case(name):
    if name == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM

        return LlamaForCausalLM, LlamaConfig(
            **TINY, num_key_value_heads=2, tie_word_embeddings=False)
    if name == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        return Qwen2ForCausalLM, Qwen2Config(**TINY, num_key_value_heads=2)
    if name == "gptj":
        from transformers import GPTJConfig, GPTJForCausalLM

        return GPTJForCausalLM, GPTJConfig(
            vocab_size=256, n_embd=256, n_layer=2, n_head=4,
            n_positions=128, rotary_dim=32)
    if name == "falcon":
        from transformers import FalconConfig, FalconForCausalLM

        return FalconForCausalLM, FalconConfig(
            vocab_size=256, hidden_size=256, num_hidden_layers=2,
            num_attention_heads=4, multi_query=True,
            new_decoder_architecture=False, parallel_attn=True, bias=False,
            alibi=False)
    if name == "gemma":
        from transformers import GemmaConfig, GemmaForCausalLM

        return GemmaForCausalLM, GemmaConfig(
            **TINY, head_dim=64, num_key_value_heads=2,
            hidden_act="gelu_pytorch_tanh")
    raise KeyError(name)


_CACHE = {}


def _fp32_case(name):
    """(hf_config_dict, state_dict, fp32 logits) built once per arch."""
    if name not in _CACHE:
        model_cls, config = _arch_case(name)
        torch.manual_seed(0)
        with torch.no_grad():
            m = model_cls(config)
        m.eval()
        with torch.no_grad():
            logits = m(torch.tensor([PROMPT])).logits[0].float().numpy()
        _CACHE[name] = (config.to_dict(), dict(m.state_dict()), logits)
    return _CACHE[name]


def _quantized_logits(name, qspec):
    cfg_dict, sd, _ = _fp32_case(name)
    cfg = arch_from_hf_config(cfg_dict)
    params = params_from_state_dict(sd, cfg, qspec=qspec, dtype=jnp.float32)
    eng = Engine(params, cfg, max_batch=1, max_len=128)
    cache = eng.new_cache()
    t = len(PROMPT)
    pos = jnp.arange(t)[None, :]
    logits, _ = forward(eng.params, cfg, jnp.asarray([PROMPT]), pos, cache,
                        jnp.asarray([t]))
    return np.asarray(logits[0], np.float32)


def _metrics(a, b):
    af, bf = a.ravel(), b.ravel()
    cos = float(np.dot(af, bf) /
                max(np.linalg.norm(af) * np.linalg.norm(bf), 1e-12))
    rel = float(np.linalg.norm(af - bf) / max(np.linalg.norm(bf), 1e-12))
    return cos, rel


# (spec, min cosine, max rel-L2) — thresholds set ~2-10% below the worst
# measured cell across archs (calibration 2026-08-18, tiny RANDOM models:
# error is far larger than on real checkpoints, which have structure; the
# matrix is a regression tripwire — kernel/converter bugs crater cosine to
# ~0.3).  Documented in PARITY.md.
SPEC_GRID = [
    ("int8_g-1", QSpec(QType.INT, 8, -1, True), 0.9995, 0.03),
    ("int4_g128", QSpec(QType.INT, 4, 128, True), 0.95, 0.32),
    # the bench.py default since round 3 (bf16 scales halve the scale
    # stream, +2.7% decode); scale rounding costs ~nothing vs f32 scales
    ("int4_g128_bf16s", QSpec(QType.INT, 4, 128, True,
                              scale_dtype="bfloat16"), 0.95, 0.32),
    ("int4_g32_asym", QSpec(QType.INT, 4, 32, False), 0.97, 0.23),
    ("int4_g128_dq", QSpec(QType.INT, 4, 128, True, double_quant=True),
     0.95, 0.32),
    ("int5_g64_asym", QSpec(QType.INT, 5, 64, False), 0.99, 0.13),
    ("int3_g128", QSpec(QType.INT, 3, 128, True), 0.78, 0.68),
    ("nf4_g32", named_qspec("nf4", group_size=32), 0.965, 0.26),
    ("fp4_g64", named_qspec("fp4", group_size=64), 0.96, 0.29),
    ("fp8_e4m3_g-1", named_qspec("fp8_e4m3", group_size=-1), 0.995, 0.08),
]

ARCHS = ["llama", "qwen2", "gptj", "falcon", "gemma"]


@pytest.mark.parametrize("spec_id,spec,min_cos,max_rel", SPEC_GRID,
                         ids=[s[0] for s in SPEC_GRID])
@pytest.mark.parametrize("arch", ARCHS)
def test_quant_accuracy_matrix(arch, spec_id, spec, min_cos, max_rel):
    _, _, fp_logits = _fp32_case(arch)
    q_logits = _quantized_logits(arch, spec)
    cos, rel = _metrics(q_logits, fp_logits)
    assert cos >= min_cos and rel <= max_rel, (
        f"{arch} x {spec_id}: cosine={cos:.5f} (min {min_cos}), "
        f"rel-L2={rel:.4f} (max {max_rel})")


# ---------------------------------------------------------------------------
# STRUCTURED-weight matrix (round 5, VERDICT r4 item 7)
# ---------------------------------------------------------------------------
# Real LLM layers are low-rank-dominated with per-channel variance and a
# few large "outlier" input channels (the regime AWQ / GPTQ act-order
# exist for).  Calibration 2026-08-20 found the OPPOSITE of the round-4
# conjecture: structured weights make per-group absmax RTN look WORSE
# than iid gaussian (outlier channels inflate their group's scale and
# crush the other channels' resolution — int4-g128 worst cosine 0.86 vs
# 0.95 random; int3 0.55 vs 0.78), while narrow groups / asym recover it
# (int4-g32-asym 0.959) exactly as the reference's accuracy guidance
# predicts (core/README.md:96-103: g32 ~ g128+cint8).  Keeping BOTH
# matrices covers both regimes; thresholds here are set ~2-5% below the
# measured llama cell (full sweep table in PARITY.md).

STRUCTURED_GRID = [
    ("int8_g-1", QSpec(QType.INT, 8, -1, True), 0.993, 0.11),
    ("int4_g128", QSpec(QType.INT, 4, 128, True), 0.845, 0.62),
    ("int4_g128_bf16s", QSpec(QType.INT, 4, 128, True,
                              scale_dtype="bfloat16"), 0.845, 0.62),
    ("int4_g32_asym", QSpec(QType.INT, 4, 32, False), 0.945, 0.31),
    ("int4_g128_dq", QSpec(QType.INT, 4, 128, True, double_quant=True),
     0.845, 0.62),
    ("int5_g64_asym", QSpec(QType.INT, 5, 64, False), 0.965, 0.23),
    ("int3_g128", QSpec(QType.INT, 3, 128, True), 0.53, 1.30),
    ("nf4_g32", named_qspec("nf4", group_size=32), 0.96, 0.25),
    ("fp4_g64", named_qspec("fp4", group_size=64), 0.875, 0.50),
    ("fp8_e4m3_g-1", named_qspec("fp8_e4m3", group_size=-1), 0.993, 0.11),
]


def _structured_sd(sd, seed=0):
    """Low-rank + per-channel-variance + outlier-channel weights."""
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, t in sd.items():
        if (t.ndim == 2 and min(t.shape) >= 32 and "embed" not in k
                and "wte" not in k):
            o, i = t.shape
            r = max(4, min(o, i) // 16)
            A = torch.randn(o, r, generator=g)
            B = torch.randn(r, i, generator=g)
            W = (A @ B) / r ** 0.5
            W = W * torch.exp(torch.randn(i, generator=g) * 0.5)[None, :]
            idx = torch.randperm(i, generator=g)[: max(1, i // 64)]
            W[:, idx] *= 8.0
            W = W * (0.02 / W.std())
            out[k] = W.to(t.dtype)
        else:
            out[k] = t
    return out


_SCACHE = {}


def _structured_case():
    if not _SCACHE:
        model_cls, config = _arch_case("llama")
        torch.manual_seed(0)
        with torch.no_grad():
            m = model_cls(config)
        m.eval()
        m.load_state_dict(_structured_sd(dict(m.state_dict())))
        with torch.no_grad():
            logits = m(torch.tensor([PROMPT])).logits[0].float().numpy()
        _SCACHE["llama"] = (config.to_dict(), dict(m.state_dict()), logits)
    return _SCACHE["llama"]


@pytest.mark.parametrize("spec_id,spec,min_cos,max_rel", STRUCTURED_GRID,
                         ids=[s[0] for s in STRUCTURED_GRID])
def test_quant_accuracy_structured(spec_id, spec, min_cos, max_rel):
    cfg_dict, sd, fp_logits = _structured_case()
    cfg = arch_from_hf_config(cfg_dict)
    params = params_from_state_dict(sd, cfg, qspec=spec, dtype=jnp.float32)
    eng = Engine(params, cfg, max_batch=1, max_len=128)
    t = len(PROMPT)
    logits, _ = forward(eng.params, cfg, jnp.asarray([PROMPT]),
                        jnp.arange(t)[None, :], eng.new_cache(),
                        jnp.asarray([t]))
    cos, rel = _metrics(np.asarray(logits[0], np.float32), fp_logits)
    assert cos >= min_cos and rel <= max_rel, (
        f"structured llama x {spec_id}: cosine={cos:.5f} (min {min_cos}), "
        f"rel-L2={rel:.4f} (max {max_rel})")
