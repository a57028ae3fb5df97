"""Normalization ops (parity: ne_layers.c NE_OP_NORM / NE_OP_RMS_NORM and
the per-arch LN-with-bias variants).  Plain jnp — XLA fuses these into
neighbouring ops; no Pallas needed (they are never the bottleneck)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5,
             upcast: bool = True) -> jax.Array:
    """RMSNorm (llama family; ne_layers.c ne_rms_norm)."""
    dt = x.dtype
    if upcast:
        x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    out = x * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(out.dtype)).astype(dt)


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm (gptj/gptneox/opt/bloom...; ne_layers.c ne_norm)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def gemma_rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma's (1 + w) RMSNorm convention (reference gemma.cpp norm usage)."""
    return rms_norm(x, weight + 1.0, eps)
