"""LoRA merge parity (model_utils.cpp:1145-1393: W += scale * B @ A)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neural_speed_tpu.convert import lora as L
from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.ops.quantize import dequantize


@pytest.fixture(scope="module")
def tiny():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=64)
    m = LlamaForCausalLM(cfg).eval()
    return m, cfg


def _make_adapter(cfg, r=4, seed=1):
    rng = np.random.default_rng(seed)
    sd = {}
    for li in range(cfg.num_hidden_layers):
        for proj, dims in (("self_attn.q_proj", (64, 64)),
                           ("mlp.down_proj", (64, 128))):
            out_d, in_d = dims
            sd[f"base_model.model.model.layers.{li}.{proj}.lora_A.weight"] = (
                rng.standard_normal((r, in_d)).astype(np.float32) * 0.05
            )
            sd[f"base_model.model.model.layers.{li}.{proj}.lora_B.weight"] = (
                rng.standard_normal((out_d, r)).astype(np.float32) * 0.05
            )
    return sd, {"r": r, "lora_alpha": 8}


def _merged_torch(m, lora_sd, scaling):
    import copy

    mm = copy.deepcopy(m)
    sd = mm.state_dict()
    merged = L.merge_into_state_dict(sd, lora_sd, scaling)
    mm.load_state_dict({k: torch.tensor(np.asarray(v, np.float32))
                        if not isinstance(v, torch.Tensor) else v
                        for k, v in merged.items()})
    return mm


def test_fp_merge_matches_hf(tiny):
    m, cfg = tiny
    lora_sd, lcfg = _make_adapter(cfg)
    scaling = L.lora_scaling(lcfg)

    ref = _merged_torch(m, lora_sd, scaling)
    ids = torch.tensor([[3, 14, 25, 7, 99]])
    with torch.no_grad():
        ref_logits = ref(ids).logits[0].numpy()

    acfg = arch_from_hf_config(cfg.to_dict())
    params = params_from_state_dict(m.state_dict(), acfg, None)
    params = L.apply_lora_to_params(params, acfg, lora_sd, lcfg)

    from neural_speed_tpu.ops import kv_cache as kvc
    from neural_speed_tpu.models.transformer import forward

    cache = kvc.init_cache(acfg.n_layers, 1, 16, acfg.n_kv_heads,
                           acfg.head_dim, jnp.float32)
    logits, _ = forward(params, acfg, jnp.asarray(ids.numpy()),
                        jnp.arange(5)[None], cache,
                        jnp.asarray([5], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits,
                               atol=5e-3, rtol=5e-3)


def test_quantized_merge_close_to_merged_quant(tiny):
    m, cfg = tiny
    lora_sd, lcfg = _make_adapter(cfg)
    scaling = L.lora_scaling(lcfg)
    spec = named_qspec("int8", group_size=32)

    acfg = arch_from_hf_config(cfg.to_dict())
    qparams = params_from_state_dict(m.state_dict(), acfg, spec)
    qmerged = L.apply_lora_to_params(qparams, acfg, lora_sd, lcfg)

    # ground truth: merge fp then quantize
    merged_sd = L.merge_into_state_dict(m.state_dict(), lora_sd, scaling)
    gt = params_from_state_dict(merged_sd, acfg, spec)

    a = np.asarray(dequantize(qmerged["layers"][0]["q"]["w"]))
    b = np.asarray(dequantize(gt["layers"][0]["q"]["w"]))
    # dequant->add->requant vs quantize(merged): differ only by quant noise
    scale = np.abs(b).max() / 127
    np.testing.assert_allclose(a, b, atol=4 * scale)
