"""HF checkpoint -> params pytree converter (+ optional RTN quantization).

Parity: the reference's per-arch Python converters
(neural_speed/convert/convert_<arch>.py, ~9k LoC) which map HF tensor names
to NE names and permute fused QKV layouts (e.g. convert_llama.py:341
rope permute, convert_gptneox.py fused-QKV handling).  Here the target is a
JAX params pytree (models/transformer.py layout); linear weights are
transposed to `[in, out]` and optionally RTN-quantized to `QTensor`s
(the quantize step parity: quant_utils.cpp model_quantize_internal).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.arch import ArchConfig
from ..ops.qtypes import QSpec
from ..ops.quantize import quantize

Array = np.ndarray
StateDict = Dict[str, Array]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        import torch

        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


class Converter:
    """Builds the params pytree, quantizing matmul weights on the way."""

    def __init__(self, cfg: ArchConfig, qspec: Optional[QSpec],
                 dtype=jnp.bfloat16, quantize_lm_head: bool = True):
        self.cfg = cfg
        self.qspec = qspec
        self.dtype = dtype
        self.quantize_lm_head = quantize_lm_head

    # -- leaf builders ---------------------------------------------------
    def dense(self, w: Array) -> jnp.ndarray:
        return jnp.asarray(w, self.dtype)

    def linear(self, w_out_in: Array, b: Optional[Array] = None,
               quant: bool = True) -> Dict[str, Any]:
        """torch Linear weight [out, in] -> {"w": [in, out], "b"}."""
        w = np.ascontiguousarray(np.transpose(_np(w_out_in)))
        k = w.shape[0]
        can_q = (
            quant
            and self.qspec is not None
            and k % self._group(k) == 0
        )
        if can_q:
            wq = quantize(jnp.asarray(w, jnp.float32), self.qspec)
        else:
            wq = jnp.asarray(w, self.dtype)
        out = {"w": wq}
        if b is not None:
            out["b"] = jnp.asarray(_np(b), jnp.float32)
        return out

    def _group(self, k: int) -> int:
        g = self.qspec.group_size
        return k if g == -1 else g

    def norm_p(self, w: Array, b: Optional[Array] = None) -> Dict[str, Any]:
        out = {"weight": jnp.asarray(_np(w), jnp.float32)}
        if b is not None:
            out["bias"] = jnp.asarray(_np(b), jnp.float32)
        return out


# ---------------------------------------------------------------------------
# per-arch state-dict mappers
# ---------------------------------------------------------------------------


def _split_fused_neox_qkv(w: Array, n_heads: int, head_dim: int):
    """GPT-NeoX fused query_key_value: rows laid out per head as
    [q(h0) k(h0) v(h0) q(h1) ...] (convert_gptneox.py parity)."""
    hidden_out = w.shape[0]
    w3 = w.reshape(n_heads, 3, head_dim, -1)
    q = w3[:, 0].reshape(n_heads * head_dim, -1)
    k = w3[:, 1].reshape(n_heads * head_dim, -1)
    v = w3[:, 2].reshape(n_heads * head_dim, -1)
    return q, k, v


def _split_fused_neox_bias(b: Array, n_heads: int, head_dim: int):
    b3 = b.reshape(n_heads, 3, head_dim)
    return (b3[:, 0].reshape(-1), b3[:, 1].reshape(-1), b3[:, 2].reshape(-1))


def _split_bloom_qkv(w: Array, n_heads: int, head_dim: int):
    """Bloom fused qkv: [H, 3, D] row grouping (convert_bloom.py parity)."""
    return _split_fused_neox_qkv(w, n_heads, head_dim)


def _split_falcon_qkv(w: Array, cfg: ArchConfig):
    """Falcon fused qkv rows: per kv-group [q(g)*n_rep, k(g), v(g)]
    (convert_falcon.py parity)."""
    h, hkv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    n_rep = h // hkv
    w3 = w.reshape(hkv, n_rep + 2, d, -1)
    q = w3[:, :n_rep].reshape(h * d, -1)
    k = w3[:, n_rep].reshape(hkv * d, -1)
    v = w3[:, n_rep + 1].reshape(hkv * d, -1)
    return q, k, v


def map_llama(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    """llama / mistral / qwen2 / gemma / phi3(fused) / stablelm-like."""
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["model.embed_tokens.weight"]))},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        lp: Dict[str, Any] = {}
        lp["attn_norm"] = cv.norm_p(sd[pre + "input_layernorm.weight"],
                                    sd.get(pre + "input_layernorm.bias"))
        if pre + "self_attn.qkv_proj.weight" in sd:  # phi3 fused
            wqkv = _np(sd[pre + "self_attn.qkv_proj.weight"])
            qd, kvd = cfg.q_dim, cfg.kv_dim
            lp["q"] = cv.linear(wqkv[:qd])
            lp["k"] = cv.linear(wqkv[qd : qd + kvd])
            lp["v"] = cv.linear(wqkv[qd + kvd :])
        elif pre + "self_attn.W_pack.weight" in sd:  # baichuan fused
            wqkv = _np(sd[pre + "self_attn.W_pack.weight"])
            qd = cfg.q_dim
            lp["q"] = cv.linear(wqkv[:qd])
            lp["k"] = cv.linear(wqkv[qd : 2 * qd])
            lp["v"] = cv.linear(wqkv[2 * qd :])
        else:
            for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                                 ("v", "v_proj")):
                lp[ours] = cv.linear(
                    sd[pre + f"self_attn.{theirs}.weight"],
                    sd.get(pre + f"self_attn.{theirs}.bias"),
                )
        lp["o"] = cv.linear(sd[pre + "self_attn.o_proj.weight"],
                            sd.get(pre + "self_attn.o_proj.bias"))
        lp["ffn_norm"] = cv.norm_p(
            sd[pre + "post_attention_layernorm.weight"],
            sd.get(pre + "post_attention_layernorm.bias"),
        )
        if cfg.moe is not None:  # mixtral
            moe = {
                "router": cv.linear(sd[pre + "block_sparse_moe.gate.weight"],
                                    quant=False),
                "experts": [],
            }
            for e in range(cfg.moe.num_experts):
                ep = pre + f"block_sparse_moe.experts.{e}."
                moe["experts"].append(
                    {
                        "gate": cv.linear(sd[ep + "w1.weight"]),
                        "down": cv.linear(sd[ep + "w2.weight"]),
                        "up": cv.linear(sd[ep + "w3.weight"]),
                    }
                )
            lp["moe"] = moe
        elif pre + "mlp.gate_up_proj.weight" in sd:  # phi3 fused
            wgu = _np(sd[pre + "mlp.gate_up_proj.weight"])
            inter = cfg.intermediate_size
            lp["ffn"] = {
                "gate": cv.linear(wgu[:inter]),
                "up": cv.linear(wgu[inter:]),
                "down": cv.linear(sd[pre + "mlp.down_proj.weight"]),
            }
        else:
            lp["ffn"] = {
                "gate": cv.linear(sd[pre + "mlp.gate_proj.weight"]),
                "up": cv.linear(sd[pre + "mlp.up_proj.weight"]),
                "down": cv.linear(sd[pre + "mlp.down_proj.weight"]),
            }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["model.norm.weight"],
                                sd.get("model.norm.bias"))
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = cv.linear(sd["lm_head.weight"],
                                 quant=cv.quantize_lm_head)
    return p


def map_gptj(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["transformer.wte.weight"]))},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "ln_1.weight"],
                                   sd[pre + "ln_1.bias"]),
            "q": cv.linear(sd[pre + "attn.q_proj.weight"]),
            "k": cv.linear(sd[pre + "attn.k_proj.weight"]),
            "v": cv.linear(sd[pre + "attn.v_proj.weight"]),
            "o": cv.linear(sd[pre + "attn.out_proj.weight"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.fc_in.weight"],
                                sd[pre + "mlp.fc_in.bias"]),
                "down": cv.linear(sd[pre + "mlp.fc_out.weight"],
                                  sd[pre + "mlp.fc_out.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["transformer.ln_f.weight"],
                                sd["transformer.ln_f.bias"])
    p["lm_head"] = cv.linear(sd["lm_head.weight"], sd.get("lm_head.bias"),
                             quant=cv.quantize_lm_head)
    return p


def map_gptneox(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["gpt_neox.embed_in.weight"]))},
        "layers": [],
    }
    h, d = cfg.n_heads, cfg.head_dim
    for i in range(cfg.n_layers):
        pre = f"gpt_neox.layers.{i}."
        q, k, v = _split_fused_neox_qkv(
            _np(sd[pre + "attention.query_key_value.weight"]), h, d
        )
        qb, kb, vb = _split_fused_neox_bias(
            _np(sd[pre + "attention.query_key_value.bias"]), h, d
        )
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "input_layernorm.weight"],
                                   sd[pre + "input_layernorm.bias"]),
            "ffn_norm": cv.norm_p(sd[pre + "post_attention_layernorm.weight"],
                                  sd[pre + "post_attention_layernorm.bias"]),
            "q": cv.linear(q, qb),
            "k": cv.linear(k, kb),
            "v": cv.linear(v, vb),
            "o": cv.linear(sd[pre + "attention.dense.weight"],
                           sd[pre + "attention.dense.bias"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.dense_h_to_4h.weight"],
                                sd[pre + "mlp.dense_h_to_4h.bias"]),
                "down": cv.linear(sd[pre + "mlp.dense_4h_to_h.weight"],
                                  sd[pre + "mlp.dense_4h_to_h.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["gpt_neox.final_layer_norm.weight"],
                                sd["gpt_neox.final_layer_norm.bias"])
    p["lm_head"] = cv.linear(sd["embed_out.weight"],
                             quant=cv.quantize_lm_head)
    return p


def map_opt(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    dec = "model.decoder."
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd[dec + "embed_tokens.weight"]))},
        "pos_embed": {
            "weight": cv.dense(_np(sd[dec + "embed_positions.weight"]))
        },
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"{dec}layers.{i}."
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "self_attn_layer_norm.weight"],
                                   sd[pre + "self_attn_layer_norm.bias"]),
            "ffn_norm": cv.norm_p(sd[pre + "final_layer_norm.weight"],
                                  sd[pre + "final_layer_norm.bias"]),
            "q": cv.linear(sd[pre + "self_attn.q_proj.weight"],
                           sd[pre + "self_attn.q_proj.bias"]),
            "k": cv.linear(sd[pre + "self_attn.k_proj.weight"],
                           sd[pre + "self_attn.k_proj.bias"]),
            "v": cv.linear(sd[pre + "self_attn.v_proj.weight"],
                           sd[pre + "self_attn.v_proj.bias"]),
            "o": cv.linear(sd[pre + "self_attn.out_proj.weight"],
                           sd[pre + "self_attn.out_proj.bias"]),
            "ffn": {
                "up": cv.linear(sd[pre + "fc1.weight"], sd[pre + "fc1.bias"]),
                "down": cv.linear(sd[pre + "fc2.weight"],
                                  sd[pre + "fc2.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd[dec + "final_layer_norm.weight"],
                                sd[dec + "final_layer_norm.bias"])
    return p


def map_bloom(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {
            "weight": cv.dense(_np(sd["transformer.word_embeddings.weight"]))
        },
        "embed_ln": cv.norm_p(
            sd["transformer.word_embeddings_layernorm.weight"],
            sd["transformer.word_embeddings_layernorm.bias"],
        ),
        "layers": [],
    }
    h, d = cfg.n_heads, cfg.head_dim
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        q, k, v = _split_bloom_qkv(
            _np(sd[pre + "self_attention.query_key_value.weight"]), h, d
        )
        qb, kb, vb = _split_fused_neox_bias(
            _np(sd[pre + "self_attention.query_key_value.bias"]), h, d
        )
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "input_layernorm.weight"],
                                   sd[pre + "input_layernorm.bias"]),
            "ffn_norm": cv.norm_p(sd[pre + "post_attention_layernorm.weight"],
                                  sd[pre + "post_attention_layernorm.bias"]),
            "q": cv.linear(q, qb),
            "k": cv.linear(k, kb),
            "v": cv.linear(v, vb),
            "o": cv.linear(sd[pre + "self_attention.dense.weight"],
                           sd[pre + "self_attention.dense.bias"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.dense_h_to_4h.weight"],
                                sd[pre + "mlp.dense_h_to_4h.bias"]),
                "down": cv.linear(sd[pre + "mlp.dense_4h_to_h.weight"],
                                  sd[pre + "mlp.dense_4h_to_h.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["transformer.ln_f.weight"],
                                sd["transformer.ln_f.bias"])
    return p


def map_falcon(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {
            "weight": cv.dense(_np(sd["transformer.word_embeddings.weight"]))
        },
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        q, k, v = _split_falcon_qkv(
            _np(sd[pre + "self_attention.query_key_value.weight"]), cfg
        )
        if pre + "ln_attn.weight" in sd:  # 40B two-norm wiring
            attn_norm = cv.norm_p(sd[pre + "ln_attn.weight"],
                                  sd[pre + "ln_attn.bias"])
            ffn_norm = cv.norm_p(sd[pre + "ln_mlp.weight"],
                                 sd[pre + "ln_mlp.bias"])
        else:
            attn_norm = cv.norm_p(sd[pre + "input_layernorm.weight"],
                                  sd[pre + "input_layernorm.bias"])
            ffn_norm = None
        lp = {
            "attn_norm": attn_norm,
            "q": cv.linear(q),
            "k": cv.linear(k),
            "v": cv.linear(v),
            "o": cv.linear(sd[pre + "self_attention.dense.weight"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.dense_h_to_4h.weight"]),
                "down": cv.linear(sd[pre + "mlp.dense_4h_to_h.weight"]),
            },
        }
        if ffn_norm is not None:
            lp["ffn_norm"] = ffn_norm
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["transformer.ln_f.weight"],
                                sd["transformer.ln_f.bias"])
    p["lm_head"] = cv.linear(sd["lm_head.weight"], quant=cv.quantize_lm_head)
    return p


def map_mpt(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["transformer.wte.weight"]))},
        "layers": [],
    }
    qd, kvd = cfg.q_dim, cfg.kv_dim
    for i in range(cfg.n_layers):
        pre = f"transformer.blocks.{i}."
        wqkv = _np(sd[pre + "attn.Wqkv.weight"])
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "norm_1.weight"]),
            "ffn_norm": cv.norm_p(sd[pre + "norm_2.weight"]),
            "q": cv.linear(wqkv[:qd]),
            "k": cv.linear(wqkv[qd : qd + kvd]),
            "v": cv.linear(wqkv[qd + kvd :]),
            "o": cv.linear(sd[pre + "attn.out_proj.weight"]),
            "ffn": {
                "up": cv.linear(sd[pre + "ffn.up_proj.weight"]),
                "down": cv.linear(sd[pre + "ffn.down_proj.weight"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["transformer.norm_f.weight"])
    return p


def map_starcoder(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["transformer.wte.weight"]))},
        "pos_embed": {"weight": cv.dense(_np(sd["transformer.wpe.weight"]))},
        "layers": [],
    }
    qd, kvd = cfg.q_dim, cfg.kv_dim
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        wqkv = _np(sd[pre + "attn.c_attn.weight"])
        bqkv = _np(sd[pre + "attn.c_attn.bias"])
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "ln_1.weight"],
                                   sd[pre + "ln_1.bias"]),
            "ffn_norm": cv.norm_p(sd[pre + "ln_2.weight"],
                                  sd[pre + "ln_2.bias"]),
            "q": cv.linear(wqkv[:qd], bqkv[:qd]),
            "k": cv.linear(wqkv[qd : qd + kvd], bqkv[qd : qd + kvd]),
            "v": cv.linear(wqkv[qd + kvd :], bqkv[qd + kvd :]),
            "o": cv.linear(sd[pre + "attn.c_proj.weight"],
                           sd[pre + "attn.c_proj.bias"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.c_fc.weight"],
                                sd[pre + "mlp.c_fc.bias"]),
                "down": cv.linear(sd[pre + "mlp.c_proj.weight"],
                                  sd[pre + "mlp.c_proj.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["transformer.ln_f.weight"],
                                sd["transformer.ln_f.bias"])
    return p


def map_phi(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["model.embed_tokens.weight"]))},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "input_layernorm.weight"],
                                   sd[pre + "input_layernorm.bias"]),
            "q": cv.linear(sd[pre + "self_attn.q_proj.weight"],
                           sd[pre + "self_attn.q_proj.bias"]),
            "k": cv.linear(sd[pre + "self_attn.k_proj.weight"],
                           sd[pre + "self_attn.k_proj.bias"]),
            "v": cv.linear(sd[pre + "self_attn.v_proj.weight"],
                           sd[pre + "self_attn.v_proj.bias"]),
            "o": cv.linear(sd[pre + "self_attn.dense.weight"],
                           sd[pre + "self_attn.dense.bias"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.fc1.weight"],
                                sd[pre + "mlp.fc1.bias"]),
                "down": cv.linear(sd[pre + "mlp.fc2.weight"],
                                  sd[pre + "mlp.fc2.bias"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd["model.final_layernorm.weight"],
                                sd["model.final_layernorm.bias"])
    p["lm_head"] = cv.linear(sd["lm_head.weight"], sd.get("lm_head.bias"),
                             quant=cv.quantize_lm_head)
    return p


def map_chatglm2(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    enc = "transformer.encoder."
    p: Dict[str, Any] = {
        "embed": {
            "weight": cv.dense(
                _np(sd["transformer.embedding.word_embeddings.weight"])
            )
        },
        "layers": [],
    }
    qd, kvd = cfg.q_dim, cfg.kv_dim
    inter = cfg.intermediate_size
    for i in range(cfg.n_layers):
        pre = f"{enc}layers.{i}."
        wqkv = _np(sd[pre + "self_attention.query_key_value.weight"])
        bqkv = sd.get(pre + "self_attention.query_key_value.bias")
        bqkv = _np(bqkv) if bqkv is not None else None
        w4h = _np(sd[pre + "mlp.dense_h_to_4h.weight"])  # swiglu fused
        lp = {
            "attn_norm": cv.norm_p(sd[pre + "input_layernorm.weight"]),
            "ffn_norm": cv.norm_p(sd[pre + "post_attention_layernorm.weight"]),
            "q": cv.linear(wqkv[:qd], bqkv[:qd] if bqkv is not None else None),
            "k": cv.linear(wqkv[qd : qd + kvd],
                           bqkv[qd : qd + kvd] if bqkv is not None else None),
            "v": cv.linear(wqkv[qd + kvd :],
                           bqkv[qd + kvd :] if bqkv is not None else None),
            "o": cv.linear(sd[pre + "self_attention.dense.weight"]),
            "ffn": {
                "gate": cv.linear(w4h[:inter]),
                "up": cv.linear(w4h[inter:]),
                "down": cv.linear(sd[pre + "mlp.dense_4h_to_h.weight"]),
            },
        }
        p["layers"].append(lp)
    p["final_norm"] = cv.norm_p(sd[enc + "final_layernorm.weight"])
    p["lm_head"] = cv.linear(sd["transformer.output_layer.weight"],
                             quant=cv.quantize_lm_head)
    return p


def map_grok(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    """Grok-1 (the hpcai-tech HF key scheme the reference loader reads —
    grok_utils.cpp:171-206): transformer.decoder_layer.N.* with sandwich
    norms rms_norm_1 (post-attn) / rms_norm_2 (ffn) / rms_norm_3
    (post-MoE) and per-expert moe.X.linear (gate) / linear_1 (down) /
    linear_v (up)."""
    p: Dict[str, Any] = {
        "embed": {
            "weight": cv.dense(_np(sd["transformer.in_out_embed.weight"]))
        },
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"transformer.decoder_layer.{i}."
        att = pre + "multi_head_attention."
        moe: Dict[str, Any] = {
            "router": cv.linear(sd[pre + "router.weight"], quant=False),
            "experts": [],
            "post_norm": cv.norm_p(sd[pre + "rms_norm_3.weight"]),
        }
        for e in range(cfg.moe.num_experts):
            ep = pre + f"moe.{e}."
            moe["experts"].append({
                "gate": cv.linear(sd[ep + "linear.weight"]),
                "down": cv.linear(sd[ep + "linear_1.weight"]),
                "up": cv.linear(sd[ep + "linear_v.weight"]),
            })
        p["layers"].append({
            "attn_norm": cv.norm_p(sd[pre + "rms_norm.weight"]),
            "q": cv.linear(sd[att + "query.weight"]),
            "k": cv.linear(sd[att + "key.weight"]),
            "v": cv.linear(sd[att + "value.weight"]),
            "o": cv.linear(sd[att + "linear.weight"]),
            "post_attn_norm": cv.norm_p(sd[pre + "rms_norm_1.weight"]),
            "ffn_norm": cv.norm_p(sd[pre + "rms_norm_2.weight"]),
            "moe": moe,
        })
    p["final_norm"] = cv.norm_p(sd["transformer.rms_norm.weight"])
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = cv.linear(sd["lm_head.weight"],
                                 quant=cv.quantize_lm_head)
    return p


def map_qwen(sd: StateDict, cfg: ArchConfig, cv: Converter) -> Dict[str, Any]:
    """Qwen-1 (transformer.h.N.* — qwen_utils.cpp:150-168): fused c_attn
    rows [q; k; v] with bias, c_proj without; MLP computes
    w1(x) * silu(w2(x)) @ c_proj (qwen.cpp:40-60), i.e. gate=w2, up=w1;
    RMSNorms without bias; separate lm_head."""
    p: Dict[str, Any] = {
        "embed": {"weight": cv.dense(_np(sd["transformer.wte.weight"]))},
        "layers": [],
    }
    qd = cfg.q_dim
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        wqkv = _np(sd[pre + "attn.c_attn.weight"])
        bqkv = _np(sd[pre + "attn.c_attn.bias"])
        p["layers"].append({
            "attn_norm": cv.norm_p(sd[pre + "ln_1.weight"]),
            "ffn_norm": cv.norm_p(sd[pre + "ln_2.weight"]),
            "q": cv.linear(wqkv[:qd], bqkv[:qd]),
            "k": cv.linear(wqkv[qd: 2 * qd], bqkv[qd: 2 * qd]),
            "v": cv.linear(wqkv[2 * qd:], bqkv[2 * qd:]),
            "o": cv.linear(sd[pre + "attn.c_proj.weight"]),
            "ffn": {
                "up": cv.linear(sd[pre + "mlp.w1.weight"]),
                "gate": cv.linear(sd[pre + "mlp.w2.weight"]),
                "down": cv.linear(sd[pre + "mlp.c_proj.weight"]),
            },
        })
    p["final_norm"] = cv.norm_p(sd["transformer.ln_f.weight"])
    p["lm_head"] = cv.linear(sd["lm_head.weight"],
                             quant=cv.quantize_lm_head)
    return p


MAPPERS: Dict[str, Callable] = {
    "llama": map_llama,
    "mistral": map_llama,
    "mixtral": map_llama,
    "qwen2": map_llama,
    "phi3": map_llama,
    "gemma": map_llama,
    "stablelm": map_llama,
    "baichuan": map_llama,
    "gptj": map_gptj,
    "gptneox": map_gptneox,
    "opt": map_opt,
    "bloom": map_bloom,
    "falcon": map_falcon,
    "mpt": map_mpt,
    "starcoder": map_starcoder,
    "phi": map_phi,
    "chatglm2": map_chatglm2,
    "qwen": map_qwen,
    "grok": map_grok,
    "grok-1": map_grok,
}


def params_from_state_dict(
    sd: StateDict,
    cfg: ArchConfig,
    qspec: Optional[QSpec] = None,
    dtype=jnp.bfloat16,
    quantize_lm_head: bool = True,
    policy=None,
) -> Dict[str, Any]:
    """`policy(path) -> Optional[QSpec]` enables layer-wise quantization
    (parity: quant_config.h per-layer policies; see convert/quant_config.py
    for the JSON config loader).  With a policy, mapping runs in fp and the
    tree is quantized per path afterwards."""
    if cfg.name not in MAPPERS:
        raise ValueError(f"no state-dict mapper for arch {cfg.name!r}")
    if policy is not None:
        from ..ops.quantize import quantize_tree

        cv = Converter(cfg, None, jnp.float32, quantize_lm_head)
        params = MAPPERS[cfg.name](sd, cfg, cv)
        return quantize_tree(params, policy)
    cv = Converter(cfg, qspec, dtype, quantize_lm_head)
    return MAPPERS[cfg.name](sd, cfg, cv)
