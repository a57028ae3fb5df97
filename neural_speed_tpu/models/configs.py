"""HF config -> ArchConfig mapping for every supported architecture.

Parity: the reference's arch registry + per-arch hparams loaders
(model_types.h:471-512 model_name_to_arch, <arch>_utils.cpp loaders).
Supported set mirrors SURVEY.md §2.4: llama (mistral/mixtral), gptj,
gptneox (dolly/polyglot), mpt, starcoder, falcon, opt, bloom, baichuan,
chatglm 1/2/3, qwen 1/1.5/2, phi, phi3, gemma, stablelm, grok, whisper
(whisper lives in models/whisper.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict

from ..ops.rope import RopeScaling
from .arch import ArchConfig, MoEConfig


def _rope_scaling_from_hf(cfg: Dict[str, Any]) -> RopeScaling | None:
    rs = cfg.get("rope_scaling")
    if not rs:
        return None
    kind = (rs.get("rope_type") or rs.get("type") or "none").lower()
    if kind in ("linear",):
        return RopeScaling("linear", factor=rs.get("factor", 1.0))
    if kind in ("dynamic", "ntk"):
        return RopeScaling("ntk", factor=rs.get("factor", 1.0))
    if kind == "yarn":
        return RopeScaling(
            "yarn",
            factor=rs.get("factor", 1.0),
            original_max_position=rs.get(
                "original_max_position_embeddings", 2048
            ),
            beta_fast=rs.get("beta_fast", 32.0),
            beta_slow=rs.get("beta_slow", 1.0),
            attn_factor=rs.get("attention_factor", 1.0) or 1.0,
        )
    if kind in ("longrope", "su"):
        return RopeScaling(
            "longrope",
            factor=rs.get("factor", 1.0),
            original_max_position=rs.get(
                "original_max_position_embeddings",
                cfg.get("original_max_position_embeddings", 4096),
            ),
            long_factors=tuple(rs.get("long_factor", [])) or None,
            short_factors=tuple(rs.get("short_factor", [])) or None,
        )
    return None


def llama_arch(hf: Dict[str, Any], name: str = "llama") -> ArchConfig:
    """llama / llama2 / llama3 / mistral / tinyllama (llama.cpp:206-689)."""
    n_heads = hf["num_attention_heads"]
    return ArchConfig(
        name=name,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads", n_heads),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        head_dim=hf.get("head_dim"),
        norm="rms",
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_style="neox",
        rope_base=hf.get("rope_theta", 10000.0),
        rope_scaling=_rope_scaling_from_hf(hf),
        act=hf.get("hidden_act", "silu"),
        gated_ffn=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def mixtral_arch(hf: Dict[str, Any]) -> ArchConfig:
    base = llama_arch(hf, "mixtral")
    return ArchConfig(
        **{
            **base.__dict__,
            "moe": MoEConfig(
                num_experts=hf.get("num_local_experts", 8),
                top_k=hf.get("num_experts_per_tok", 2),
            ),
        }
    )


def qwen2_arch(hf: Dict[str, Any]) -> ArchConfig:
    base = llama_arch(hf, "qwen2")
    return ArchConfig(**{**base.__dict__, "qkv_bias": True})


def qwen_arch(hf: Dict[str, Any]) -> ArchConfig:
    """qwen-1 (qwen.cpp): bias on QKV, logn attn, gated ffn w/ silu."""
    n_heads = hf["num_attention_heads"]
    return ArchConfig(
        name="qwen",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=n_heads,
        intermediate_size=hf["intermediate_size"] // 2,
        max_position_embeddings=hf.get("seq_length", 8192),
        norm="rms",
        norm_eps=hf.get("layer_norm_epsilon", 1e-6),
        rope_style="neox",
        rope_base=hf.get("rotary_emb_base", 10000.0),
        qkv_bias=True,
        logn_attn=hf.get("use_logn_attn", True),
        act="silu",
    )


def gemma_arch(hf: Dict[str, Any]) -> ArchConfig:
    """gemma.cpp:46-104: head_dim != hidden/n_heads, GELU-gate FFN,
    (1+w) rmsnorm, embedding scaled by sqrt(hidden)."""
    base = llama_arch(hf, "gemma")
    return ArchConfig(
        **{
            **base.__dict__,
            "head_dim": hf["head_dim"],
            "gemma_norm": True,
            "act": "gelu_tanh",
            "embed_scale": math.sqrt(hf["hidden_size"]),
            "tie_word_embeddings": True,
            "norm_eps": hf.get("rms_norm_eps", 1e-6),
        }
    )


def phi_arch(hf: Dict[str, Any]) -> ArchConfig:
    """phi-1/2 (phi.cpp): partial rotary, parallel residual w/ shared LN,
    biases everywhere, untied head."""
    n_heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // n_heads
    return ArchConfig(
        name="phi",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads") or n_heads,
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="ln",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        rope_style="neox",
        rope_base=hf.get("rope_theta", 10000.0),
        rot_dim=int(hf.get("partial_rotary_factor", 0.5) * hd),
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act="gelu_tanh",
        gated_ffn=False,
        parallel_residual=True,
        shared_parallel_norm=True,
    )


def phi3_arch(hf: Dict[str, Any]) -> ArchConfig:
    """phi3.cpp:182-188: llama-like + LongRoPE."""
    base = llama_arch(hf, "phi3")
    return ArchConfig(
        **{
            **base.__dict__,
            "rope_scaling": _rope_scaling_from_hf(hf),
            "tie_word_embeddings": hf.get("tie_word_embeddings", False),
        }
    )


def stablelm_arch(hf: Dict[str, Any]) -> ArchConfig:
    """stablelm.cpp:177-183: partial rotary, LN, gated silu ffn."""
    n_heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // n_heads
    return ArchConfig(
        name="stablelm",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads", n_heads),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="ln",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        rope_style="neox",
        rope_base=hf.get("rope_theta", 10000.0),
        rot_dim=int(hf.get("partial_rotary_factor", 0.25) * hd),
        qkv_bias=hf.get("use_qkv_bias", False),
        act="silu",
        gated_ffn=True,
    )


def gptj_arch(hf: Dict[str, Any]) -> ArchConfig:
    """gptj.cpp:184-232: parallel attn+FFN sharing one LN, interleaved rope
    on first n_rot dims, untied head w/ bias."""
    n_heads = hf["n_head"]
    return ArchConfig(
        name="gptj",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["n_embd"],
        n_layers=hf["n_layer"],
        n_heads=n_heads,
        n_kv_heads=n_heads,
        intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
        max_position_embeddings=hf.get("n_positions", 2048),
        norm="ln",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        rope_style="gptj",
        rot_dim=hf.get("rotary_dim"),
        act="gelu_tanh",
        gated_ffn=False,
        mlp_bias=True,
        o_bias=False,
        parallel_residual=True,
        shared_parallel_norm=True,
    )


def gptneox_arch(hf: Dict[str, Any]) -> ArchConfig:
    """gptneox.cpp:183-209: neox rope mode 2 on partial dims, optional
    parallel residual with *two* norms."""
    n_heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // n_heads
    return ArchConfig(
        name="gptneox",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=n_heads,
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="ln",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        rope_style="neox",
        rot_dim=int(hf.get("rotary_pct", 0.25) * hd),
        rope_base=hf.get("rotary_emb_base", 10000.0),
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act="gelu",
        gated_ffn=False,
        parallel_residual=hf.get("use_parallel_residual", True),
        shared_parallel_norm=False,
    )


def mpt_arch(hf: Dict[str, Any]) -> ArchConfig:
    """mpt.cpp:182-242: ALiBi, clip_qkv, no rope, no biases."""
    n_heads = hf["n_heads"]
    attn_cfg = hf.get("attn_config", {})
    return ArchConfig(
        name="mpt",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["d_model"],
        n_layers=hf["n_layers"],
        n_heads=n_heads,
        n_kv_heads=attn_cfg.get("kv_n_heads", n_heads),
        intermediate_size=hf.get("expansion_ratio", 4) * hf["d_model"],
        max_position_embeddings=hf.get("max_seq_len", 2048),
        norm="ln",
        norm_eps=1e-5,
        rope_style="none",
        use_alibi=True,
        clip_qkv=attn_cfg.get("clip_qkv"),
        act="gelu",
        gated_ffn=False,
        tie_word_embeddings=True,
    )


def bloom_arch(hf: Dict[str, Any]) -> ArchConfig:
    """bloom.cpp:191-256: ALiBi + learned embedding LN."""
    n_heads = hf.get("n_head") or hf["num_attention_heads"]
    hidden = hf.get("hidden_size") or hf["n_embd"]
    return ArchConfig(
        name="bloom",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        n_layers=hf.get("n_layer") or hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=n_heads,
        intermediate_size=4 * hidden,
        max_position_embeddings=2048,
        norm="ln",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        rope_style="none",
        use_alibi=True,
        embedding_ln=True,
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act="gelu",
        gated_ffn=False,
        tie_word_embeddings=True,
    )


def falcon_arch(hf: Dict[str, Any]) -> ArchConfig:
    """falcon.cpp:75-153: MQA/GQA, parallel residual (one norm for 7B, two
    for 40B), no biases on qkv, gelu mlp."""
    n_heads = hf["num_attention_heads"]
    new_decoder = hf.get("new_decoder_architecture", False)
    if new_decoder:  # falcon-40b/180b: true GQA group count
        n_kv = hf.get("num_kv_heads") or hf.get("n_head_kv", 8)
    elif hf.get("multi_query", True):
        n_kv = 1
    else:
        n_kv = n_heads
    return ArchConfig(
        name="falcon",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=n_kv if (new_decoder or hf.get("multi_query", True)) else n_heads,
        intermediate_size=4 * hf["hidden_size"],
        max_position_embeddings=2048,
        norm="ln",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        rope_style="none" if hf.get("alibi", False) else "neox",
        rope_base=hf.get("rope_theta", 10000.0),
        use_alibi=hf.get("alibi", False),
        act="gelu",
        gated_ffn=False,
        parallel_residual=hf.get("parallel_attn", True),
        shared_parallel_norm=not new_decoder,
        tie_word_embeddings=True,
    )


def opt_arch(hf: Dict[str, Any]) -> ArchConfig:
    """opt.cpp:99-110: learned positions with offset 2, ReLU MLP, LN."""
    return ArchConfig(
        name="opt",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf["num_attention_heads"],
        intermediate_size=hf["ffn_dim"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="ln",
        norm_eps=1e-5,
        rope_style="none",
        learned_pos=True,
        pos_offset=2,
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act=hf.get("activation_function", "relu"),
        gated_ffn=False,
        tie_word_embeddings=True,
    )


def starcoder_arch(hf: Dict[str, Any]) -> ArchConfig:
    """starcoder.cpp: MQA + learned absolute positions, gelu mlp."""
    return ArchConfig(
        name="starcoder",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["n_embd"],
        n_layers=hf["n_layer"],
        n_heads=hf["n_head"],
        n_kv_heads=1 if hf.get("multi_query", True) else hf["n_head"],
        intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
        max_position_embeddings=hf.get("n_positions", 8192),
        norm="ln",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        rope_style="none",
        learned_pos=True,
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act="gelu_tanh",
        gated_ffn=False,
        tie_word_embeddings=True,
    )


def baichuan_arch(hf: Dict[str, Any]) -> ArchConfig:
    """baichuan.cpp:210: fused W_pack qkv; 13B uses ALiBi, 7B rope."""
    base = llama_arch(hf, "baichuan")
    use_alibi = hf["hidden_size"] >= 5120  # 13B
    return ArchConfig(
        **{
            **base.__dict__,
            "use_alibi": use_alibi,
            "rope_style": "none" if use_alibi else "neox",
        }
    )


def chatglm2_arch(hf: Dict[str, Any]) -> ArchConfig:
    """chatglm2.cpp:79-189: MQA via multi_query_group_num, rms norm,
    swiglu ffn, rope on half dims, qkv bias.

    Rope is VANILLA-mode (chatglm2.cpp:166-174 `ne_rope_inplace(..., 0,
    ...)` = interleaved (2i, 2i+1) pairs; HF chatglm2's reshape(...,
    rot/2, 2) rotation matches) over head_dim/2 dims -> style "gptj"."""
    n_heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // n_heads
    return ArchConfig(
        name="chatglm2",
        vocab_size=hf["padded_vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("multi_query_group_num", n_heads)
        if hf.get("multi_query_attention", False) else n_heads,
        intermediate_size=hf["ffn_hidden_size"],
        max_position_embeddings=hf.get("seq_length", 8192),
        norm="rms" if hf.get("rmsnorm", True) else "ln",
        norm_eps=hf.get("layernorm_epsilon", 1e-5),
        rope_style="gptj",
        rot_dim=hd // 2,
        rope_base=10000.0 * hf.get("rope_ratio", 1.0),
        qkv_bias=hf.get("add_qkv_bias", True),
        act="silu",
        gated_ffn=True,
        parallel_residual=False,
    )


def chatglm1_arch(hf: Dict[str, Any]) -> ArchConfig:
    """chatglm.cpp:115-147: 2-D rope + deepnorm-style alpha residual."""
    n_layers = hf["num_layers"]
    return ArchConfig(
        name="chatglm",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=n_layers,
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf["num_attention_heads"],
        intermediate_size=hf.get("inner_hidden_size", 4 * hf["hidden_size"]),
        max_position_embeddings=hf.get("max_sequence_length", 2048),
        norm="ln",
        norm_eps=hf.get("layernorm_epsilon", 1e-5),
        rope_style="chatglm",
        qkv_bias=True,
        o_bias=True,
        mlp_bias=True,
        act="gelu",
        gated_ffn=False,
        deepnorm_alpha=(2 * n_layers) ** 0.5,
    )


def grok_arch(hf: Dict[str, Any]) -> ArchConfig:
    """grok.cpp:130-345: tanh30 attn-logit softcap, GELU MoE, SANDWICH
    norms — the attention output is rms-normed (norm[2], grok.cpp:279-281)
    and the MoE output is rms-normed (norm[3], :340-342) BEFORE their
    residual adds; the only pre-MoE norm is the regular ffn norm
    (norm[1], :287-290).  Router weights are the global softmax probs of
    the selected experts, unrenormalized (:296-300); logits scaled by
    output_multiplier (:358)."""
    n_heads = hf["num_attention_heads"]
    return ArchConfig(
        name="grok",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads", n_heads),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        norm="rms",
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_style="neox",
        logit_softcap=30.0,
        act="gelu_tanh",
        gated_ffn=True,
        post_attn_norm=True,
        moe=MoEConfig(
            num_experts=hf.get("num_local_experts", 8),
            top_k=hf.get("num_experts_per_tok", 2),
            post_norm=True,
            renorm=False,
        ),
        logit_scale=hf.get("output_multiplier_scale", 1.0),
        embed_scale=hf.get("embedding_multiplier_scale", 1.0),
        tie_word_embeddings=True,
    )


ARCH_BUILDERS = {
    "llama": llama_arch,
    "mistral": lambda hf: llama_arch(hf, "mistral"),
    "mixtral": mixtral_arch,
    "qwen": qwen_arch,
    "qwen2": qwen2_arch,
    "gemma": gemma_arch,
    "phi": phi_arch,
    "phi3": phi3_arch,
    "stablelm": stablelm_arch,
    "gptj": gptj_arch,
    "gpt_neox": gptneox_arch,
    "gptneox": gptneox_arch,
    "mpt": mpt_arch,
    "bloom": bloom_arch,
    "falcon": falcon_arch,
    "RefinedWeb": falcon_arch,
    "RefinedWebModel": falcon_arch,
    "opt": opt_arch,
    "gpt_bigcode": starcoder_arch,
    "starcoder": starcoder_arch,
    "baichuan": baichuan_arch,
    "chatglm": chatglm1_arch,
    "chatglm2": chatglm2_arch,
    "chatglm3": chatglm2_arch,
    "grok-1": grok_arch,
    "grok": grok_arch,
}


def arch_from_hf_config(hf: Dict[str, Any]) -> ArchConfig:
    """Parity: Model.get_model_type (__init__.py:79-110) + arch registry."""
    mt = hf.get("model_type", "")
    if mt == "chatglm" and hf.get("multi_query_attention") is not None:
        mt = "chatglm2"
    if mt in ARCH_BUILDERS:
        return ARCH_BUILDERS[mt](hf)
    raise ValueError(f"unsupported model_type {mt!r}")
