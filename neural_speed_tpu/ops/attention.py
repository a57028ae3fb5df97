"""Attention: GQA/MQA, causal + ALiBi + tanh-softcap masks, quantized KV.

Parity (reference):
  * core/layers/mha_dense.{h,cpp} + mha_dense_wrapper.h — fused flash
    attention over fp32/bf16/int8 KV with GQA, causal, alibi and tanh30
    ("NE_ATTN_FLAG_IS_ALIBI8", "NE_ATTN_FLAG_IS_TANH30") mask flags.
  * Continuous batching semantics: each query token carries an absolute
    position; each batch slot carries a KV length (llama.cpp:329-349,
    model_utils.cpp split_inputs_into_groups).

This module provides the XLA reference implementation (`attention_ref`) —
masked softmax attention that XLA compiles well — and the dispatch entry
`attention` that the Pallas flash kernels (ops/flash.py) plug into on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free
                # for fully-masked (padding) rows


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Standard ALiBi slope schedule (parity: ne_alibi, ne_layers.c; used by
    mpt/bloom/baichuan-13b graphs)."""
    def pow2slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return jnp.asarray(pow2slopes(n_heads), jnp.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    base = pow2slopes(closest)
    extra = pow2slopes(2 * closest)[0::2][: n_heads - closest]
    return jnp.asarray(base + extra, jnp.float32)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, S, H_kv, D] -> [B, S, H_kv*n_rep, D] (GQA head sharing)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def attention_ref(
    q: jax.Array,                 # [B, T, H, D]
    k: jax.Array,                 # [B, S, H_kv, D]
    v: jax.Array,                 # [B, S, H_kv, D]
    q_positions: jax.Array,       # [B, T] absolute positions of queries
    kv_lens: jax.Array,           # [B] valid KV length per slot
    scale: Optional[float] = None,
    causal: bool = True,
    alibi: Optional[jax.Array] = None,    # [H] slopes or None
    logit_softcap: float = 0.0,           # grok: 30*tanh(x/30)
    out_dtype=None,
    bidir_lens: Optional[jax.Array] = None,  # [B] GLM blank-infilling
) -> jax.Array:
    """Masked softmax attention, fp32 accumulation.

    `bidir_lens` (chatglm-1 blank infilling, chatglm.cpp:204-217): the
    first `bidir_lens[b]` KV positions are visible to EVERY query row
    regardless of causality — visible(i, j) = (j <= pos_i) | (j <
    bidir_lens).  The reference builds the equivalent mask by -inf'ing
    the last prompt column for all but the last prompt row."""
    b, t, h, d = q.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    n_rep = h // h_kv
    out_dtype = out_dtype or q.dtype

    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    kf = _repeat_kv(k, n_rep).astype(jnp.float32)
    vf = _repeat_kv(v, n_rep).astype(jnp.float32)
    qf = q.astype(jnp.float32) * scale

    # [B, H, T, S]
    logits = jnp.einsum("bthd,bshd->bhts", qf, kf)
    if logit_softcap > 0.0:
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)

    kpos = jnp.arange(s)[None, None, :]                  # [1, 1, S]
    valid = kpos < kv_lens[:, None, None]                # [B, 1, S]
    if causal:
        vis = kpos <= q_positions[:, :, None]            # [B, T, S]
        if bidir_lens is not None:
            vis = vis | (kpos < bidir_lens[:, None, None])
        valid = valid & vis
    else:
        valid = jnp.broadcast_to(valid, (b, t, s))
    if alibi is not None:
        dist = kpos.astype(jnp.float32) - q_positions[:, :, None].astype(
            jnp.float32
        )  # [B, T, S], <= 0 where causal-valid
        bias = alibi[None, :, None, None] * dist[:, None, :, :]
        logits = logits + bias
    logits = jnp.where(valid[:, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, vf)
    return out.astype(out_dtype)


def attention(
    q, k, v, q_positions, kv_lens, *, scale=None, causal=True, alibi=None,
    logit_softcap=0.0, out_dtype=None, use_flash: Optional[bool] = None,
    bidir_lens: Optional[jax.Array] = None,
):
    """Dispatch: Pallas flash kernels on TPU, XLA reference elsewhere.

    Parity: mha_dense.cpp:31-80 dtype/flag dispatch +
    bestla_reordered_attn_fp32_support fallback logic.
    """
    from . import flash

    if bidir_lens is not None:
        # GLM prefix-bidirectional mask: XLA path only (legacy chatglm-1;
        # the flash kernels' block masks are causal-only)
        return attention_ref(
            q, k, v, q_positions, kv_lens, scale=scale, causal=causal,
            alibi=alibi, logit_softcap=logit_softcap, out_dtype=out_dtype,
            bidir_lens=bidir_lens,
        )
    if use_flash is None:
        use_flash = flash.flash_enabled()
    if use_flash:
        out = flash.mha(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), None, None,
            q_positions, kv_lens,
            scale=scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
            causal=causal, alibi=alibi, logit_softcap=logit_softcap,
            out_dtype=out_dtype,
        )
        if out is not None:
            return out
    return attention_ref(
        q, k, v, q_positions, kv_lens, scale=scale, causal=causal,
        alibi=alibi, logit_softcap=logit_softcap, out_dtype=out_dtype,
    )


def attention_cache(
    q, cache, layer_idx: int, q_positions, kv_lens, *, scale=None,
    causal=True, alibi=None, logit_softcap=0.0, out_dtype=None,
    use_flash: Optional[bool] = None,
    bidir_lens: Optional[jax.Array] = None,
    extra_kv=None,
    fused_append: bool = False,
):
    """Attention over one layer of the KV cache.

    On the flash path the kernel reads the cache's int8 codes + scales
    straight from HBM (parity: bestla_reordered_attn_fp32_forward consuming
    the reordered cache, mha_dense.cpp:113-180); the XLA path materializes a
    dequantized view first (read_layer)."""
    from . import flash
    from . import kv_cache as kvc
    from . import paged_kv as pkv

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if bidir_lens is not None:
        # GLM blank infilling (chatglm-1): only a T>1 prefix step can have
        # non-causal visibility — decode rows (T==1) see every stored key
        # anyway, so the mask degenerates to kv_lens and any kernel works
        if q.shape[1] > 1:
            use_flash = False
        else:
            bidir_lens = None
    if isinstance(cache, pkv.PagedKVCache):
        if use_flash is None:
            use_flash = flash.flash_enabled()
        if fused_append:
            # paged twin of the contiguous fused path: one pallas call
            # does attention AND writes the quantized new row/scale into
            # the page pool through table-resolved aliased out windows
            if not (cache.quantized and use_flash):
                return None
            res = flash.mha_paged(
                q, cache, layer_idx, q_positions, kv_lens, scale=scale,
                causal=causal, alibi=alibi, logit_softcap=logit_softcap,
                out_dtype=out_dtype or q.dtype, extra_kv=extra_kv,
                fused_append=True,
            )
            if res is None:
                return None
            out, (k2, v2, ks2, vs2) = res
            import dataclasses

            return out, dataclasses.replace(cache, k_pages=k2, v_pages=v2,
                                            k_scale=ks2, v_scale=vs2)
        if use_flash:
            out = flash.mha_paged(
                q, cache, layer_idx, q_positions, kv_lens, scale=scale,
                causal=causal, alibi=alibi, logit_softcap=logit_softcap,
                out_dtype=out_dtype or q.dtype,
            )
            if out is not None:
                return out
        k_all, v_all = pkv.gathered_layer(
            cache, layer_idx,
            jnp.float32 if cache.quantized else q.dtype,
        )
        return _attention_ref_hsd(
            q, k_all, v_all, q_positions, kv_lens, scale=scale,
            causal=causal, alibi=alibi, logit_softcap=logit_softcap,
            out_dtype=out_dtype, bidir_lens=bidir_lens,
        )
    if use_flash is None:
        # flash pays off when it avoids HBM traffic: quantized KV (XLA path
        # materializes a dequantized cache copy), prefill (S^2 logits), or
        # GQA (KV block shared across the head group).  Plain MHA bf16
        # decode is a GEMV XLA already does at roofline — skip.
        use_flash = flash.flash_enabled() and (
            cache.quantized or q.shape[1] > 1 or q.shape[2] > cache.kv_heads
        )
    if fused_append:
        # attention + in-kernel deferred KV append in ONE pallas call:
        # the cache buffers are input_output-aliased and the kernel
        # writes the quantized new row/scale itself — no separate append
        # dispatches (their serialized DMA latency was 8% of the decode
        # step, BENCH_NOTES round-3 closing profile).  Returns
        # (out, new_cache) on success, None if the kernel can't engage
        # (caller falls back to deferred-attention + RMW append).
        if not (cache.quantized and extra_kv is not None
                and (use_flash or use_flash is None)
                and flash.flash_enabled()):
            return None
        res = flash.mha(
            q, cache.k, cache.v, cache.k_scale, cache.v_scale,
            q_positions, kv_lens, scale=scale, causal=causal, alibi=alibi,
            logit_softcap=logit_softcap, out_dtype=out_dtype or q.dtype,
            layer=layer_idx, extra_kv=extra_kv, fused_append=True,
        )
        if res is None:
            return None
        out, (k2, v2, ks2, vs2) = res
        import dataclasses

        return out, dataclasses.replace(cache, k=k2, v=v2, k_scale=ks2,
                                        v_scale=vs2)
    if use_flash:
        # pass the FULL stacked cache + layer index: the kernel's block
        # index map selects the layer, so XLA never copies the layer out
        ks = cache.k_scale if cache.quantized else None
        vs = cache.v_scale if cache.quantized else None
        out = flash.mha(
            q, cache.k, cache.v, ks, vs,
            q_positions, kv_lens, scale=scale, causal=causal, alibi=alibi,
            logit_softcap=logit_softcap, out_dtype=out_dtype or q.dtype,
            layer=layer_idx, extra_kv=extra_kv,
        )
        if out is not None:
            return out
    # XLA path over the cache's native [B, H, S, D] layout — einsum reads
    # it directly (a materialized transpose would force XLA into whole-
    # cache relayout copies, which dominated decode before)
    k_all = cache.k[layer_idx]
    v_all = cache.v[layer_idx]
    if cache.quantized:
        k_all = k_all.astype(jnp.float32) * cache.k_scale[layer_idx][..., None]
        v_all = v_all.astype(jnp.float32) * cache.v_scale[layer_idx][..., None]
    if extra_kv is not None:
        # deferred append on the reference path: merge the current
        # token's k/v into the materialized view at its position (exact
        # append-then-read semantics, fp operands)
        k_new, v_new = extra_kv  # [B, 1, Hkv, D]
        pos = jnp.minimum(q_positions[:, 0], k_all.shape[2] - 1)
        oh = jax.nn.one_hot(pos, k_all.shape[2],
                            dtype=jnp.float32)[:, None, :, None]
        kn = k_new.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B,Hkv,1,D]
        vn = v_new.transpose(0, 2, 1, 3).astype(jnp.float32)
        k_all = k_all.astype(jnp.float32) * (1.0 - oh) + oh * kn
        v_all = v_all.astype(jnp.float32) * (1.0 - oh) + oh * vn
    return _attention_ref_hsd(
        q, k_all, v_all, q_positions, kv_lens, scale=scale, causal=causal,
        alibi=alibi, logit_softcap=logit_softcap, out_dtype=out_dtype,
        bidir_lens=bidir_lens,
    )


def _attention_ref_hsd(
    q: jax.Array,                 # [B, T, H, D]
    k: jax.Array,                 # [B, H_kv, S, D] (cache-native layout)
    v: jax.Array,
    q_positions: jax.Array,
    kv_lens: jax.Array,
    scale: Optional[float] = None,
    causal: bool = True,
    alibi: Optional[jax.Array] = None,
    logit_softcap: float = 0.0,
    out_dtype=None,
    bidir_lens: Optional[jax.Array] = None,
) -> jax.Array:
    b, t, h, d = q.shape
    h_kv, s = k.shape[1], k.shape[2]
    n_rep = h // h_kv
    out_dtype = out_dtype or q.dtype
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if n_rep > 1:
        kf = jnp.repeat(kf, n_rep, axis=1)
        vf = jnp.repeat(vf, n_rep, axis=1)
    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("bthd,bhsd->bhts", qf, kf)
    if logit_softcap > 0.0:
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)

    kpos = jnp.arange(s)[None, None, :]
    valid = kpos < kv_lens[:, None, None]
    if causal:
        vis = kpos <= q_positions[:, :, None]
        if bidir_lens is not None:
            vis = vis | (kpos < bidir_lens[:, None, None])
        valid = valid & vis
    else:
        valid = jnp.broadcast_to(valid, (b, t, s))
    if alibi is not None:
        dist = kpos.astype(jnp.float32) - q_positions[:, :, None].astype(
            jnp.float32
        )
        logits = logits + alibi[None, :, None, None] * dist[:, None, :, :]
    logits = jnp.where(valid[:, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", probs, vf)
    return out.astype(out_dtype)
