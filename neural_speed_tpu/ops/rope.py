"""Rotary position embeddings — the full family the reference supports.

Parity map (reference: neural_speed/core/ne_layers.c rope family,
ne_layers.h:3449-3502 + per-arch graphs):
  * interleaved ("gptj", rope mode 0)        -> style="gptj"
  * half-split  ("neox", rope mode 2)        -> style="neox"
  * partial rotary (phi/stablelm n_rot<D)    -> rot_dim argument
  * chatglm 2-D rope (mode 4, padding-aware) -> rope_2d
  * linear / NTK / YaRN scaling              -> RopeScaling config
  * phi3 LongRoPE (per-dim factors)          -> RopeScaling(long/short factors)
  * shift-RoPE ring buffer (`ne_rope_shift_inplace`, llama.cpp:437-446)
    -> `rope_shift` rotating cached K by a delta angle.

All functions are position-explicit (positions passed per token) because
continuous batching concatenates sequences with unrelated positions
(reference llama.cpp:329-349 per-request rope).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Frequency scaling config (yarn hparams parity: model_types.h:153-155,
    phi3 LongRoPE ne_layers.h:460)."""

    kind: str = "none"  # none | linear | ntk | yarn | longrope
    factor: float = 1.0
    original_max_position: int = 2048
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    attn_factor: float = 1.0
    # longrope: per-dim factor arrays (length rot_dim//2)
    long_factors: Optional[Tuple[float, ...]] = None
    short_factors: Optional[Tuple[float, ...]] = None


def _yarn_find_correction_dim(num_rot: float, dim: int, base: float,
                              max_pos: int) -> float:
    return (dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (
        2 * math.log(base)
    )


def rope_inv_freq(rot_dim: int, base: float = 10000.0,
                  scaling: Optional[RopeScaling] = None,
                  seq_len: Optional[int] = None) -> Tuple[jnp.ndarray, float]:
    """Per-dim inverse frequencies + attention magnitude scale (mscale)."""
    half = rot_dim // 2
    exponents = jnp.arange(0, half, dtype=jnp.float32) / half
    inv = 1.0 / (base ** exponents)
    mscale = 1.0
    s = scaling
    if s is None or s.kind == "none":
        return inv, mscale
    if s.kind == "linear":
        return inv / s.factor, mscale
    if s.kind == "ntk":
        base2 = base * (s.factor ** (rot_dim / (rot_dim - 2)))
        return 1.0 / (base2 ** exponents), mscale
    if s.kind == "yarn":
        # YaRN (arXiv:2309.00071): interpolate low dims, extrapolate high.
        lo = _yarn_find_correction_dim(s.beta_fast, rot_dim, base,
                                       s.original_max_position)
        hi = _yarn_find_correction_dim(s.beta_slow, rot_dim, base,
                                       s.original_max_position)
        lo, hi = max(math.floor(lo), 0), min(math.ceil(hi), half - 1)
        ramp = jnp.clip(
            (jnp.arange(half, dtype=jnp.float32) - lo) / max(hi - lo, 1e-3), 0, 1
        )
        interp = inv / s.factor
        mask = 1.0 - ramp  # 1 => extrapolate (keep inv)
        out = interp * (1 - mask) + inv * mask
        mscale = (0.1 * math.log(s.factor) + 1.0) * s.attn_factor
        return out, mscale
    if s.kind == "longrope":
        use_long = seq_len is not None and seq_len > s.original_max_position
        factors = s.long_factors if use_long else s.short_factors
        f = jnp.asarray(factors, jnp.float32)
        scale = s.factor
        if scale > 1.0:
            mscale = math.sqrt(
                1 + math.log(scale) / math.log(s.original_max_position)
            )
        return inv / f, mscale
    raise ValueError(f"unknown rope scaling {s.kind}")


def rope_cos_sin(positions: jax.Array, inv_freq: jax.Array,
                 mscale: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """positions [...] int -> cos/sin [..., half]."""
    ang = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               style: str = "neox", rot_dim: Optional[int] = None) -> jax.Array:
    """Rotate the first `rot_dim` features of x.

    x:        [..., T, H, D] (or any shape ending in D)
    cos/sin:  [..., T, half] broadcastable against x with a head axis added.
    style:    "neox" (half-split) or "gptj" (interleaved pairs).
    """
    d = x.shape[-1]
    rd = rot_dim or d
    half = rd // 2
    xr, xp = x[..., :rd], x[..., rd:]
    # add head axis to cos/sin: [..., T, 1, half].  The math runs in f32
    # via dtype PROMOTION against the f32 cos/sin (bf16 inputs are exact
    # in f32, so results are identical to an explicit upcast) — an
    # explicit xr.astype(f32) materialized a whole-tensor f32 temp
    # (2 x 128 MB at B=16 prefill: the round-4 bf16-KV bench16 OOM).
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    if style == "neox":
        x1, x2 = xr[..., :half], xr[..., half:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    elif style == "gptj":
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        raise ValueError(f"unknown rope style {style}")
    out = out.astype(x.dtype)
    if rd < d:
        out = jnp.concatenate([out, xp], axis=-1)
    return out


def rope_2d_chatglm(x: jax.Array, positions: jax.Array, block_positions:
                    jax.Array, base: float = 10000.0) -> jax.Array:
    """ChatGLM-1 2-D rope (reference chatglm.cpp:115-147, rope mode 4 with
    padding): first half of head dims rotated by the (capped) position id,
    second half by the block ("blank infilling") id.  The C kernel pairs
    dims (i0, i0 + n_dims/2) within each half (ne_layers.c:9329-9350:
    x0=src[0], x1=src[n_dims/2]) — neox-style split-half rotation over the
    half's own frequency ladder base^(-2*i0/n_dims), n_dims = d/2; HF
    chatglm-6b's rotate_half matches."""
    d = x.shape[-1]
    half = d // 2
    inv, _ = rope_inv_freq(half, base)
    c1, s1 = rope_cos_sin(positions, inv)
    c2, s2 = rope_cos_sin(block_positions, inv)
    xa, xb = x[..., :half], x[..., half:]
    xa = apply_rope(xa, c1, s1, style="neox")
    xb = apply_rope(xb, c2, s2, style="neox")
    return jnp.concatenate([xa, xb], axis=-1)


def rope_shift(k: jax.Array, delta_positions: jax.Array, inv_freq: jax.Array,
               style: str = "neox", rot_dim: Optional[int] = None) -> jax.Array:
    """Shift-RoPE: rotate already-RoPE'd cached K by a *delta* angle.

    Parity: `ne_rope_shift_inplace` + cossin cache (ne_layers.h:3449,
    model_utils.cpp:165-192) — the StreamingLLM ring-buffer trick where,
    after evicting tokens, cached K vectors are re-rotated by the position
    delta instead of recomputing attention from scratch.

    k: [..., S, H, D]; delta_positions: [..., S] ints (usually all equal
    to -n_discard)."""
    cos, sin = rope_cos_sin(delta_positions, inv_freq)
    return apply_rope(k, cos, sin, style=style, rot_dim=rot_dim)
