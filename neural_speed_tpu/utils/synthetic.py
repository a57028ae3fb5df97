"""Synthetic quantized models for benchmarks and compile checks.

Random packed bits ARE valid int4 planes, so a 7B-shaped model
materializes in seconds directly on device — no quantize pass needed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.arch import ArchConfig
from ..ops.qtypes import QSpec, QType, plane_widths
from ..ops.quantize import QTensor


def synth_qtensor(key, k: int, n: int, spec: QSpec,
                  scale: float = 0.02) -> QTensor:
    g = spec.effective_group(k)
    keys = jax.random.split(key, 4)
    if spec.qtype == QType.INT and spec.bits == 8:
        data = (jax.random.randint(keys[0], (k, n), 0, 256, jnp.int32)
                .astype(jnp.uint8),)
    elif spec.is_fp8:
        dt = (jnp.float8_e4m3fn if spec.qtype == QType.FP8_E4M3
              else jnp.float8_e5m2)
        data = (jax.random.normal(keys[0], (k, n), jnp.float32)
                .astype(dt),)
    else:
        bits = 4 if spec.is_lut else spec.bits
        data = tuple(
            jax.random.bits(kk, (k * w // 32, n), jnp.uint32)
            for kk, w in zip(
                jax.random.split(keys[0], len(plane_widths(bits))),
                plane_widths(bits),
            )
        )
    scales = (
        jax.random.uniform(keys[1], (k // g, n), jnp.float32, 0.5, 1.5)
        * scale
    )
    if spec.scale_dtype == "bfloat16":
        scales = scales.astype(jnp.bfloat16)
    zeros = None
    if spec.qtype == QType.INT and not spec.symmetric:
        zeros = jax.random.randint(
            keys[2], (k // g, n), 0, 2 ** spec.bits, jnp.int32
        ).astype(jnp.uint8)
    return QTensor(data, scales, zeros, None, spec, (k, n))


def synth_params(cfg: ArchConfig, spec: QSpec, seed: int = 0,
                 dtype=jnp.bfloat16) -> Dict[str, Any]:
    key = jax.random.PRNGKey(seed)
    e = cfg.hidden_size
    n_exp = cfg.moe.num_experts if cfg.moe is not None else 0
    n_keys = cfg.n_layers * (8 + 3 * n_exp + 1) + 3
    keys = iter(jax.random.split(key, n_keys))

    def lin(k, n):
        return {"w": synth_qtensor(next(keys), k, n, spec)}

    def expert_stack(k, n):
        from ..ops.moe import stack_experts

        return stack_experts(
            [synth_qtensor(next(keys), k, n, spec) for _ in range(n_exp)]
        )

    p: Dict[str, Any] = {
        "embed": {
            "weight": (
                jax.random.normal(next(keys), (cfg.vocab_size, e), dtype)
                * 0.02
            )
        },
        "layers": [],
        "final_norm": {"weight": jnp.ones((e,), jnp.float32)},
        "lm_head": lin(e, cfg.vocab_size),
    }
    for _ in range(cfg.n_layers):
        lp: Dict[str, Any] = {
            "attn_norm": {"weight": jnp.ones((e,), jnp.float32)},
            "ffn_norm": {"weight": jnp.ones((e,), jnp.float32)},
            "q": lin(e, cfg.q_dim),
            "k": lin(e, cfg.kv_dim),
            "v": lin(e, cfg.kv_dim),
            "o": lin(cfg.q_dim, e),
        }
        if cfg.post_attn_norm:
            lp["post_attn_norm"] = {"weight": jnp.ones((e,), jnp.float32)}
        if cfg.post_ffn_norm:
            lp["post_ffn_norm"] = {"weight": jnp.ones((e,), jnp.float32)}
        if cfg.moe is not None:
            lp["moe"] = {
                "router": {
                    "w": jax.random.normal(next(keys), (e, n_exp),
                                           jnp.float32) * 0.02
                },
                "experts_stacked": {
                    "gate": expert_stack(e, cfg.intermediate_size),
                    "up": expert_stack(e, cfg.intermediate_size),
                    "down": expert_stack(cfg.intermediate_size, e),
                },
            }
            if cfg.moe.pre_norm:
                lp["moe"]["pre_norm"] = {
                    "weight": jnp.ones((e,), jnp.float32)}
            if cfg.moe.post_norm:
                lp["moe"]["post_norm"] = {
                    "weight": jnp.ones((e,), jnp.float32)}
        else:
            lp["ffn"] = {
                "gate": lin(e, cfg.intermediate_size),
                "up": lin(e, cfg.intermediate_size),
                "down": lin(cfg.intermediate_size, e),
            }
        p["layers"].append(lp)
    return p


def llama2_7b_arch(vocab: int = 32000) -> ArchConfig:
    """Llama-2-7B shape — the reference's headline benchmark config
    (docs/fused_attention.md / BASELINE.md)."""
    return ArchConfig(
        name="llama", vocab_size=vocab, hidden_size=4096, n_layers=32,
        n_heads=32, n_kv_heads=32, intermediate_size=11008,
        max_position_embeddings=4096,
    )
