"""Shared functional decoder — the TPU-native analogue of the reference's
per-arch C++ graph builders (neural_speed/models/<arch>/<arch>.cpp).

One pure function `forward()` covers all decoder archs via ArchConfig; the
reference's per-arch peculiarities (SURVEY.md §2.4) are config knobs.  The
graph is built so everything under `jax.jit` is static-shaped:

  * tokens `[B, T]` with explicit `positions [B, T]` (continuous batching
    concatenates unrelated requests — llama.cpp:64-90 / :329-349);
  * KV append via the cache's per-slot positions;
  * attention masking by per-slot `kv_lens` (no data-dependent shapes).

Params are a plain dict pytree; linear leaves are either a `QTensor`
(weight-only quantized, fed to the fused dequant-matmul kernels) or a
dense array — matching the reference's mixed quantized/fp graphs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import kv_cache as kvc
from ..ops.attention import alibi_slopes, attention, attention_cache
from ..ops.matmul import qmatmul
from ..ops.norms import layer_norm, rms_norm
from ..ops.quantize import QTensor
from ..ops.rope import apply_rope, rope_cos_sin, rope_inv_freq
from .arch import ArchConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def linear(x: jax.Array, p: Params, axis_name: Optional[str] = None) -> jax.Array:
    """p = {"w": QTensor | [K, N] array, "b": optional [N]}.

    `axis_name` marks a row-parallel (K-sharded) matmul inside shard_map:
    partial products are psum'ed over the TP axis *before* the bias add —
    the exact collective placement of the reference's NE_OP_ALL_REDUCE after
    attn-out and ffn-down (llama.cpp:590-594,690-695).

    `perm` (optional): GPTQ act-order K-permutation — activations are
    gathered to match the group-contiguous weight rows (parity: shuffle
    indices + ShuffleActivationKBlock, bestla_prologue_{a,b}.h)."""
    perm = p.get("perm")
    if perm is not None:
        x = jnp.take(x, perm, axis=-1)
    w = p["w"]
    if isinstance(w, QTensor):
        import os

        m_rows = 1
        for d in x.shape[:-1]:
            m_rows *= d
        # comp_int8 routing (reference: q4_j with int8 compute type is its
        # headline config): int8-MXU kernel for multi-token steps; decode
        # (m==1) stays on the weight-only path (HBM-bound — activation
        # quant would add error for no speed)
        comp = os.environ.get("NST_COMP")
        if comp in ("int8", "int8t") and m_rows >= 32:
            from ..ops.matmul import qmatmul_int8

            out = qmatmul_int8(x, w, per_token=comp == "int8t")
        else:
            out = qmatmul(x, w)
    else:
        out = jnp.matmul(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    b = p.get("b")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def norm(x: jax.Array, p: Params, cfg: ArchConfig) -> jax.Array:
    w = p["weight"]
    if cfg.norm == "rms":
        if cfg.gemma_norm:
            return rms_norm(x, w.astype(jnp.float32) + 1.0, cfg.norm_eps)
        return rms_norm(x, w, cfg.norm_eps)
    return layer_norm(x, w, p.get("bias"), cfg.norm_eps)


_ACTS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
}


def ffn(x: jax.Array, p: Params, cfg: ArchConfig,
        act: Optional[str] = None,
        axis_name: Optional[str] = None) -> jax.Array:
    """Gated (SiLU/GELU-mul, fused ne_ffn_silu/ne_ffn_gelu_mul parity) or
    classic 2-matmul MLP (ne_ffn_add_gelu).  `axis_name`: TP psum on the
    row-parallel down projection."""
    a = _ACTS[act or cfg.act]
    if cfg.gated_ffn:
        if "gateup" in p:
            # fused gate+up (parity: MUL_FFN_SILU/GELU_MUL one-shot chain)
            gu = linear(x, p["gateup"])
            gate, up = jnp.split(gu, 2, axis=-1)
            return linear(a(gate) * up, p["down"], axis_name)
        return linear(a(linear(x, p["gate"])) * linear(x, p["up"]),
                      p["down"], axis_name)
    return linear(a(linear(x, p["up"])), p["down"], axis_name)


def _expert_view(stacked: dict, e: int) -> Params:
    """ffn()-shaped param dict for one expert of a stacked MoE block."""
    return {key: {"w": st.expert(e)} for key, st in stacked.items()}


def _moe_grouped(x: jax.Array, stacked: dict, topi: jax.Array,
                 probs: jax.Array, cfg: ArchConfig,
                 axis_name: Optional[str],
                 interpret: bool = False) -> jax.Array:
    """Grouped (megablocks-style) expert dispatch for multi-token steps:
    sort token rows by expert into block-aligned segments, run the whole
    FFN chain as grouped GEMMs (~top_k/E of the dense path's FLOPs), then
    gather-combine.  Exact — no capacity drops (ops/moe.py)."""
    from ..ops import moe as moe_ops

    b, t, h = x.shape
    n = b * t
    kk = topi.shape[-1]
    eid = topi.reshape(n * kk)
    max_k = max(st.local_view().shape[0] for st in stacked.values())
    bm = moe_ops.choose_bm(max_k, x.dtype)
    r = moe_ops.route_tokens(eid, cfg.moe.num_experts, kk, bm)

    xf = x.reshape(n, h)
    xz = jnp.concatenate([xf, jnp.zeros((1, h), xf.dtype)], axis=0)
    xs = xz[r.src]                                     # [M_pad, H]
    a = _ACTS[cfg.act]
    gq = functools.partial(moe_ops.grouped_qmatmul, block_expert=r.block_expert,
                           bm=bm, interpret=interpret)
    if "gateup" in stacked:
        gu = gq(xs, stacked["gateup"])
        gate, up = jnp.split(gu, 2, axis=-1)
        mid = a(gate) * up
    elif "gate" in stacked:
        mid = a(gq(xs, stacked["gate"])) * gq(xs, stacked["up"])
    else:
        mid = a(gq(xs, stacked["up"]))
    y = gq(mid.astype(x.dtype), stacked["down"])       # [M_pad, H] f32
    y_asg = y[r.dest_by_a].reshape(n, kk, h)
    out = jnp.einsum("nkh,nk->nh", y_asg,
                     probs.reshape(n, kk).astype(jnp.float32))
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out.reshape(b, t, h).astype(x.dtype)


def _moe_ep(x: jax.Array, stacked: dict, topi: jax.Array, probs: jax.Array,
            cfg: ArchConfig, tp_axis: Optional[str],
            ep_axis: str) -> jax.Array:
    """Expert parallelism (EXTENSION — the reference has 1-D TP only,
    SURVEY.md §2.7): experts sharded on the mesh `ep` axis, routing
    localized per device.  Remote assignments keep their rows but get
    combine weight 0 (exact under the final psum — no token drops, no
    all-to-all; the classic inference-EP layout where attention is
    replicated across `ep` and expert weight traffic splits ep-ways).

    Paths mirror moe_ffn: decode -> lax.switch over LOCAL experts with a
    zero branch for remote picks; multi-token -> grouped dispatch over the
    local shard (dense-local when E_local <= top_k: fewer FLOPs than
    top_k*T grouped rows)."""
    e_local = next(iter(stacked.values())).data[0].shape[0]
    offset = (jax.lax.axis_index(ep_axis) * e_local).astype(topi.dtype)
    local_idx = topi - offset
    is_local = (local_idx >= 0) & (local_idx < e_local)
    topi_l = jnp.clip(local_idx, 0, e_local - 1)
    probs_l = jnp.where(is_local, probs, 0.0)
    axes = (ep_axis,) if tp_axis is None else (tp_axis, ep_axis)
    b, t, _ = x.shape
    kk = topi.shape[-1]

    if b * t == 1:
        out = jnp.zeros_like(x).astype(jnp.float32)
        branches = [
            (lambda xx, e=e: ffn(xx, _expert_view(stacked, e), cfg)
             .astype(jnp.float32))
            for e in range(e_local)
        ] + [lambda xx: jnp.zeros(xx.shape, jnp.float32)]
        for j in range(kk):
            idx = jnp.where(is_local[0, 0, j], topi_l[0, 0, j], e_local)
            out = out + jax.lax.switch(idx, branches, x) * probs_l[0, 0, j]
        return jax.lax.psum(out, axes).astype(x.dtype)

    if e_local <= kk:
        # every local expert runs over all tokens anyway; the dense-local
        # mask costs E_local*T rows vs the grouped path's top_k*T
        onehot = jax.nn.one_hot(topi_l, e_local, dtype=jnp.float32)
        weights = jnp.einsum("btk,btke->bte", probs_l, onehot)
        out = jnp.zeros_like(x).astype(jnp.float32)
        for e in range(e_local):
            contrib = ffn(x, _expert_view(stacked, e), cfg).astype(
                jnp.float32)
            out = out + contrib * weights[..., e: e + 1]
        return jax.lax.psum(out, axes).astype(x.dtype)

    cfg_l = dataclasses.replace(
        cfg, moe=dataclasses.replace(cfg.moe, num_experts=e_local))
    return _moe_grouped(x, stacked, topi_l, probs_l, cfg_l, axes)


def moe_ffn(x: jax.Array, p: Params, cfg: ArchConfig,
            axis_name: Optional[str] = None,
            ep_axis_name: Optional[str] = None) -> jax.Array:
    """Top-k expert mixing (mixtral/grok; llama.cpp:620-689 ne_mul_mat_id).

    Three paths:
      * B*T == 1 (decode): lax.switch over the selected experts only
        (parity: the reference's serial selected-expert compute,
        llama.cpp:641-680) — E/top_k x less weight traffic.
      * multi-token with stacked experts (fuse_params): grouped dispatch
        (_moe_grouped) — ~top_k/E of the dense FLOPs, exact.
      * fallback: dense-all-experts weighted by the router mask.
    With `ep_axis_name`, experts are sharded over that mesh axis (_moe_ep).
    """
    m = cfg.moe
    b, t, _ = x.shape
    router_logits = linear(x, p["router"]).astype(jnp.float32)  # [B,T,E]
    topv, topi = jax.lax.top_k(router_logits, m.top_k)
    if m.renorm:
        # mixtral: renormalize over the selected experts (== softmax of the
        # top-k logits; llama.cpp:620-689 weights/weights_sum)
        probs = jax.nn.softmax(topv, axis=-1)
    else:
        # grok: global softmax probs of the selected experts, NOT
        # renormalized (grok.cpp:296-300)
        probs = jnp.take_along_axis(
            jax.nn.softmax(router_logits, axis=-1), topi, axis=-1
        )
    stacked = p.get("experts_stacked")

    if ep_axis_name is not None:
        if stacked is None:
            raise ValueError("expert parallelism requires stacked experts "
                             "(fuse_params / stack_experts-compatible spec)")
        return _moe_ep(x, stacked, topi, probs, cfg, axis_name, ep_axis_name)

    if b * t == 1:
        out = jnp.zeros_like(x).astype(jnp.float32)
        if stacked is not None:
            branches = [
                (lambda xx, e=e: ffn(xx, _expert_view(stacked, e), cfg)
                 .astype(jnp.float32))
                for e in range(m.num_experts)
            ]
        else:
            branches = [
                (lambda xx, e=e: ffn(xx, p["experts"][e], cfg).astype(
                    jnp.float32))
                for e in range(m.num_experts)
            ]
        for j in range(m.top_k):
            contrib = jax.lax.switch(topi[0, 0, j], branches, x)
            out = out + contrib * probs[0, 0, j]
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out.astype(x.dtype)

    if stacked is not None:
        return _moe_grouped(x, stacked, topi, probs, cfg, axis_name)

    onehot = jax.nn.one_hot(topi, m.num_experts, dtype=jnp.float32)  # [B,T,k,E]
    weights = jnp.einsum("btk,btke->bte", probs, onehot)
    out = jnp.zeros_like(x, shape=x.shape).astype(jnp.float32)
    for e in range(m.num_experts):
        # experts' down projections stay partial; one psum after the
        # weighted sum (weighting is linear) instead of E psums
        contrib = ffn(x, p["experts"][e], cfg).astype(jnp.float32)
        out = out + contrib * weights[..., e : e + 1]
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out.astype(x.dtype)


def _logn_scale(positions: jax.Array, train_ctx: int) -> jax.Array:
    """qwen logn attention scaling (qwen.cpp:58-59): queries past the train
    context are scaled by log_n(pos)/log_n(ctx)."""
    pos = jnp.maximum(positions.astype(jnp.float32), 1.0)
    scale = jnp.log(pos + 1.0) / math.log(train_ctx)
    return jnp.maximum(scale, 1.0)


def kv_append_mode() -> str:
    """Resolve the decode KV-append path from env: "plain" | "defer" |
    "fused" (ArchConfig.kv_append semantics).  Engines call this ONCE at
    construction and pin the result into their (static-jit-arg) cfg, so a
    flag flip between engine constructions genuinely retraces — reading
    env inside traced code no-ops after the first trace (ADVICE r3).

    Default FUSED (round-4 certification: on-chip A/B 155.3 vs 152.2
    tok/s B=1 and 1169 vs 1030 at B=16 ctx1024; kernelspot bit-identical
    cache under real Mosaic aliasing; public-API greedy ids equal across
    all three modes on chip).  NST_KV_APPEND picks explicitly;
    NST_FUSED_APPEND=0 steps down to PLAIN — not to "defer", whose
    read-then-write hazard makes XLA copy the whole cache per layer
    (~66x at B=16; BENCH_NOTES round-4)."""
    v = os.environ.get("NST_KV_APPEND")
    if v in ("plain", "defer", "fused"):
        return v
    if os.environ.get("NST_DEFER_APPEND", "1") == "0":
        return "plain"
    if os.environ.get("NST_FUSED_APPEND", "1") == "0":
        return "plain"
    return "fused"


def _resolved_kv_append(cfg: ArchConfig) -> str:
    return kv_append_mode() if cfg.kv_append == "env" else cfg.kv_append


def _defer_append(cfg: ArchConfig, cache, t: int, glm_lens) -> bool:
    """Deferred KV append at single-token decode (cfg.kv_append "defer" /
    "fused"; "plain" restores append-first): attention takes the current
    token's k/v as kernel operands, so the append's RMW windows leave the
    critical path (paired on-chip A/B: 153.7 vs 150.7 tok/s B=1,
    BENCH_NOTES).  Only where the flash decode kernel's extra-kv column
    engages — contiguous quantized cache (the XLA/bf16-decode paths would
    pay a one-hot cache merge instead), no GLM bidirectional mask.  The
    self column uses the UNQUANTIZED k/v (the stored int8 copy is what
    later steps read) — a strictly more accurate logit for the newest
    token.  Kernel-shape eligibility is delegated to
    flash.extra_kv_eligible — the single source of truth."""
    from ..ops import paged_kv as pkv

    mode = _resolved_kv_append(cfg)
    if mode == "plain":
        return False
    if t != 1 or glm_lens is not None:
        return False
    if isinstance(cache, pkv.PagedKVCache):
        # the paged pool supports only the FUSED form (in-kernel aliased
        # append through table-resolved windows) — plain "defer" would
        # add the read-then-write copy hazard on top of the page scatter
        if mode != "fused":
            return False
    from ..ops import flash

    return (cache.quantized and flash.flash_enabled()
            and flash.extra_kv_eligible(t, cfg.n_heads, cfg.n_kv_heads))


def _cache_append(cache, layer_idx: int, k, v, positions, active):
    """Dispatch KV append by cache type (contiguous vs paged)."""
    from ..ops import paged_kv as pkv

    if isinstance(cache, pkv.PagedKVCache):
        if positions.shape[1] == 1:
            return pkv.append_decode(cache, layer_idx, k, v, positions,
                                     active)
        # every multi-token paged write resolves per-row through the page
        # table (append_span): padding rows park on the trash page and
        # spans may cross pages claimed one at a time.  append_prefill's
        # single contiguous-window write is UNSAFE here — prefill buckets
        # pad past the allocated run (pages are claimed for the TRUE
        # prompt length), so the window tramples the next slot's pages.
        return pkv.append_span(cache, layer_idx, k, v, positions,
                               active=active)
    return kvc.append_layer(cache, layer_idx, k, v, positions, active=active)


# ---------------------------------------------------------------------------
# decoder layer
# ---------------------------------------------------------------------------


def decoder_layer(
    x: jax.Array,
    lp: Params,
    cfg: ArchConfig,
    layer_idx: int,
    cache: kvc.KVCache,
    positions: jax.Array,
    kv_lens: jax.Array,
    inv_freq: Optional[jax.Array],
    mscale: float,
    slopes: Optional[jax.Array],
    glm_lens: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
) -> Tuple[jax.Array, kvc.KVCache]:
    b, t, _ = x.shape
    h, hkv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    attn_in = norm(x, lp["attn_norm"], cfg)

    if "qkv" in lp:
        # fused projection (parity: bestla_fusion_QKV / ne_mul_qkv): one
        # pass over the activations, one kernel launch
        qkv = linear(attn_in, lp["qkv"])
        q, k, v = jnp.split(qkv, [h * d, h * d + hkv * d], axis=-1)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, hkv, d)
        v = v.reshape(b, t, hkv, d)
    else:
        q = linear(attn_in, lp["q"]).reshape(b, t, h, d)
        k = linear(attn_in, lp["k"]).reshape(b, t, hkv, d)
        v = linear(attn_in, lp["v"]).reshape(b, t, hkv, d)
    if cfg.clip_qkv:
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)

    if cfg.rope_style in ("neox", "gptj"):
        cos, sin = rope_cos_sin(positions, inv_freq, mscale)
        q = apply_rope(q, cos, sin, cfg.rope_style, cfg.rot_dim)
        k = apply_rope(k, cos, sin, cfg.rope_style, cfg.rot_dim)
    elif cfg.rope_style == "chatglm":
        from ..ops.rope import rope_2d_chatglm

        if glm_lens is not None:
            # GLM 2-D position scheme (ne_layers.c:9324-9328, mode 4):
            # with prompt length P, the rotary position id is capped at
            # P-2 (the [gMASK] slot) and the block id counts generated
            # tokens: pos = min(p, P-2), block = max(p - (P-2), 0)
            gmask = jnp.maximum(glm_lens - 2, 0)[:, None]
            rp = jnp.minimum(positions, gmask)
            bp = jnp.maximum(positions - gmask, 0)
        else:
            rp, bp = positions, jnp.zeros_like(positions)
        q = rope_2d_chatglm(q, rp, bp, cfg.rope_base)
        k = rope_2d_chatglm(k, rp, bp, cfg.rope_base)

    if cfg.logn_attn:
        q = q * _logn_scale(positions, cfg.max_position_embeddings)[
            ..., None, None
        ].astype(q.dtype)

    # active slots are exactly those whose kv_lens advance past their
    # first written position (spectator slots keep kv_lens == old length)
    active = kv_lens > positions[:, 0]
    attn_kwargs = dict(
        scale=cfg.attn_scale if cfg.attn_scale is not None
        else 1.0 / math.sqrt(d),
        causal=True,
        alibi=slopes,
        logit_softcap=cfg.logit_softcap,
        out_dtype=x.dtype,
        # GLM blank infilling: the prompt (up to its last token) is
        # bidirectional context — the first P-1 keys are visible to every
        # query (chatglm.cpp:204-217 builds the same mask by -inf'ing
        # column P-1 for rows < P-1)
        bidir_lens=(jnp.maximum(glm_lens - 1, 0)
                    if glm_lens is not None else None),
    )
    if _defer_append(cfg, cache, t, glm_lens):
        # Decode KV-append off the critical path.  TWO forms:
        #   "fused" — ONE pallas call does attention AND writes the
        #     quantized new row/scale through input_output-aliased cache
        #     buffers (the kernel seeds its online softmax from the
        #     operand k/v).  Zero separate append dispatches, and —
        #     crucially — no read-then-write hazard on the cache buffer.
        #   "defer" — attention reads the cache with the new k/v as
        #     operands, then a separate RMW append writes the SAME
        #     buffer.  XLA guards that read-then-write with per-layer
        #     defensive whole-cache copies ("data formatting",
        #     ~1.6 ms/step/layer at B=16 ctx1024 — the round-4 B=16
        #     defer collapse; at B=1 the same copies were the 0.53 ms
        #     "async copy-done" in the round-3 closing profile).
        # When the fused kernel cannot engage, fall back to PLAIN
        # (append-first) — NOT to "defer", which would reintroduce the
        # copy hazard.
        fused = None
        if _resolved_kv_append(cfg) == "fused":
            fused = attention_cache(
                q, cache, layer_idx, positions, kv_lens,
                extra_kv=(k, v), fused_append=True, **attn_kwargs,
            )
        if fused is not None:
            attn_out, cache = fused
        elif _resolved_kv_append(cfg) == "defer":
            attn_out = attention_cache(
                q, cache, layer_idx, positions, kv_lens,
                extra_kv=(k, v), **attn_kwargs,
            )
            cache = _cache_append(cache, layer_idx, k, v, positions,
                                  active)
        else:
            cache = _cache_append(cache, layer_idx, k, v, positions,
                                  active)
            attn_out = attention_cache(
                q, cache, layer_idx, positions, kv_lens, **attn_kwargs,
            )
    else:
        cache = _cache_append(cache, layer_idx, k, v, positions, active)
        attn_out = attention_cache(
            q, cache, layer_idx, positions, kv_lens, **attn_kwargs,
        )
    attn_out = linear(attn_out.reshape(b, t, h * d), lp["o"], axis_name)
    if cfg.post_attn_norm:
        attn_out = norm(attn_out, lp["post_attn_norm"], cfg)

    if cfg.parallel_residual:
        # gptj.cpp:184-232 / gptneox par_res / phi: x + attn(n(x)) + ffn(n'(x))
        if cfg.shared_parallel_norm:
            ffn_in = attn_in
        else:
            ffn_in = norm(x, lp["ffn_norm"], cfg)
        if cfg.moe is not None:
            ffn_out = moe_ffn(ffn_in, lp["moe"], cfg, axis_name,
                              ep_axis_name)
        else:
            ffn_out = ffn(ffn_in, lp["ffn"], cfg, axis_name=axis_name)
        if cfg.post_ffn_norm:
            ffn_out = norm(ffn_out, lp["post_ffn_norm"], cfg)
        return x + attn_out + ffn_out, cache

    if cfg.deepnorm_alpha is not None:
        # chatglm-1 (GLM-130B deepnorm): residual scaled by alpha
        h1 = attn_in * cfg.deepnorm_alpha + attn_out
    else:
        h1 = x + attn_out

    ffn_in = norm(h1, lp["ffn_norm"], cfg)
    if cfg.moe is not None:
        mp = lp["moe"]
        z = ffn_in
        if cfg.moe.pre_norm:
            z = norm(z, mp["pre_norm"], cfg)
        ffn_out = moe_ffn(z, mp, cfg, axis_name, ep_axis_name)
        if cfg.moe.post_norm:
            ffn_out = norm(ffn_out, mp["post_norm"], cfg)
    else:
        ffn_out = ffn(ffn_in, lp["ffn"], cfg, axis_name=axis_name)
    if cfg.post_ffn_norm:
        ffn_out = norm(ffn_out, lp["post_ffn_norm"], cfg)

    if cfg.deepnorm_alpha is not None:
        return ffn_in * cfg.deepnorm_alpha + ffn_out, cache
    return h1 + ffn_out, cache


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: ArchConfig,
    token_ids: jax.Array,            # [B, T]
    positions: jax.Array,            # [B, T]
    cache: kvc.KVCache,
    kv_lens: jax.Array,              # [B] total valid kv AFTER this step
    glm_lens: Optional[jax.Array] = None,  # [B] chatglm-1 prompt lengths
    logits_dtype=jnp.float32,
    axis_name: Optional[str] = None,
    n_heads_global: Optional[int] = None,
    gather_logits: bool = False,
    ep_axis_name: Optional[str] = None,
    logits_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Full decoder step: embeds `token_ids`, runs all layers appending to
    `cache`, returns logits `[B, T, vocab]` and the updated cache.

    `logits_positions` ([B, R] row indices): compute the LM head only at
    those rows — returns `[B, R, vocab]`.  At prefill only the last real
    row is sampled, so projecting all T rows wastes 2*T*E*V flops and
    materializes a [B, T, V] buffer (268MB f32 at llama2-7B T=2048; 1.2GB
    at a 152k vocab).  The reference's eval extracts per-batch logits the
    same way (llama.cpp:741-759 copies only the rows it needs).

    Parity: llama_model_eval_internal and friends (llama.cpp:53-788).

    TP (inside shard_map over `axis_name`): `cfg` holds *local* head counts,
    `n_heads_global` the full count (for the ALiBi slope table, which is
    sliced per shard); `gather_logits` all-gathers vocab-sharded logits."""
    x = params["embed"]["weight"][token_ids]
    if cfg.embed_scale != 1.0:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if cfg.embedding_ln:
        x = layer_norm(
            x, params["embed_ln"]["weight"], params["embed_ln"].get("bias"),
            cfg.norm_eps,
        )
    if cfg.learned_pos:
        # opt.cpp:99-110: learned absolute positions with offset
        x = x + params["pos_embed"]["weight"][positions + cfg.pos_offset]

    inv_freq, mscale = None, 1.0
    if cfg.rope_style in ("neox", "gptj"):
        rot = cfg.rot_dim or cfg.head_dim
        inv_freq, mscale = rope_inv_freq(
            rot, cfg.rope_base, cfg.rope_scaling, seq_len=cache.max_len
        )
    slopes = None
    if cfg.use_alibi:
        hg = n_heads_global or cfg.n_heads
        slopes = alibi_slopes(hg)
        if axis_name is not None and hg != cfg.n_heads:
            start = jax.lax.axis_index(axis_name) * cfg.n_heads
            slopes = jax.lax.dynamic_slice(slopes, (start,), (cfg.n_heads,))

    for i, lp in enumerate(params["layers"]):
        x, cache = decoder_layer(
            x, lp, cfg, i, cache, positions, kv_lens, inv_freq, mscale,
            slopes, glm_lens, axis_name, ep_axis_name,
        )

    if logits_positions is not None:
        x = jnp.take_along_axis(x, logits_positions[:, :, None], axis=1)
    if cfg.final_norm:
        x = norm(x, params["final_norm"], cfg)

    head = params.get("lm_head")
    if head is None or cfg.tie_word_embeddings:
        emb = params["embed"]["weight"]
        logits = jnp.matmul(
            x, emb.T.astype(x.dtype), preferred_element_type=jnp.float32
        )
    else:
        logits = linear(x, head).astype(jnp.float32)
        if logits.shape[-1] > cfg.vocab_size:
            # N-padded packed head (fuse_params repad_n): padded columns
            # dequantize to 0 — slice back to the true vocab.  (TP vocab
            # shards are SMALLER than vocab_size and never sliced.)
            logits = logits[..., :cfg.vocab_size]
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if gather_logits and axis_name is not None:
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits.astype(logits_dtype), cache


# ---------------------------------------------------------------------------
# projection fusion (load-time params transform)
# ---------------------------------------------------------------------------


def _fuse_group(parts):
    """Concat the linears `parts` along N into one projection, or None if
    they are not fusable (mixed quant/dense, differing specs, act-order
    permutations)."""
    from ..ops.quantize import concat_n

    ws = [p.get("w") for p in parts]
    if any(w is None for w in ws):
        return None
    if any(p.get("perm") is not None for p in parts):
        return None
    if all(isinstance(w, QTensor) for w in ws):
        try:
            w = concat_n(ws)
        except ValueError:
            return None
    elif not any(isinstance(w, QTensor) for w in ws):
        if len({w.shape[0] for w in ws}) != 1:
            return None
        w = jnp.concatenate([w.astype(ws[0].dtype) for w in ws], axis=1)
    else:
        return None
    fused = {"w": w}
    if any(p.get("b") is not None for p in parts):
        some_b = next(p["b"] for p in parts if p.get("b") is not None)
        bs = [p["b"].astype(some_b.dtype) if p.get("b") is not None
              else jnp.zeros((ww.shape[1],), some_b.dtype)
              for p, ww in zip(parts, ws)]
        fused["b"] = jnp.concatenate(bs)
    return fused


def _kernel_pack(val: QTensor) -> QTensor:
    """Load-time repack so the weight hits a fused Pallas kernel: K-repad
    to the pack-period x group multiple; odd widths (3/5/6/7) stay in
    their native multi-plane storage when the planar kernel applies
    (in-kernel multi-plane dequant — HBM traffic stays at the quantized
    footprint), else widen to the next kernel-native width as before."""
    from ..ops.matmul import (_pallas_supported, _planar_supported,
                              kernel_k_multiple)
    from ..ops.quantize import repad_k, widen_bits

    g = val.spec.effective_group(val.shape[0])
    cand = repad_k(val, kernel_k_multiple(val.spec) * g)
    if _pallas_supported(cand) or _planar_supported(cand):
        return cand
    wide = widen_bits(val)
    if wide is not val:
        g = wide.spec.effective_group(wide.shape[0])
        wide = repad_k(wide, kernel_k_multiple(wide.spec) * g)
    return wide


def _repad_tree(node):
    """Recursively repack QTensor weights for the fused kernels."""
    if isinstance(node, dict):
        out = {}
        for key, val in node.items():
            if key == "w" and isinstance(val, QTensor):
                out[key] = _kernel_pack(val)
            else:
                out[key] = _repad_tree(val)
        return out
    if isinstance(node, list):
        return [_repad_tree(v) for v in node]
    return node


def fuse_params(params: Params, cfg: ArchConfig) -> Params:
    """Fuse per-layer Q/K/V and FFN gate/up projections into single packed
    weights (parity: the reference's fused QKV and FFN ops —
    ip_fusion_qkv.cpp, ip_fusion_ffn.cpp, Ops.h MUL_QKV / MUL_FFN_*).
    One kernel launch instead of three/two; exact same math (planar packs
    concatenate losslessly along N).  Also K-repads packed weights to
    band-aligned shapes (quantize.repad_k)."""
    out = dict(params)
    layers = []
    for lp in params.get("layers", []):
        lp = dict(lp)
        if all(key in lp for key in ("q", "k", "v")):
            f = _fuse_group([lp["q"], lp["k"], lp["v"]])
            if f is not None:
                lp["qkv"] = f
                del lp["q"], lp["k"], lp["v"]
        def fuse_gateup(ffn_p):
            if (ffn_p is None or not cfg.gated_ffn or "gate" not in ffn_p
                    or "up" not in ffn_p):
                return ffn_p
            f = _fuse_group([ffn_p["gate"], ffn_p["up"]])
            if f is None:
                return ffn_p
            ffn_p = dict(ffn_p)
            ffn_p["gateup"] = f
            del ffn_p["gate"], ffn_p["up"]
            return ffn_p

        if "ffn" in lp:
            lp["ffn"] = fuse_gateup(lp["ffn"])
        if "moe" in lp and isinstance(lp["moe"], dict) and "experts" in lp[
                "moe"]:
            moe_p = dict(lp["moe"])
            moe_p["experts"] = [fuse_gateup(e) for e in moe_p["experts"]]
            lp["moe"] = moe_p
        layers.append(lp)
    out["layers"] = layers
    # N-pad a wide packed LM head to the kernel's 512-lane block
    # (llama's 32000 vocab -> bn=256, narrow DMAs at decode; padded
    # columns dequantize to exactly 0 and `forward` slices logits back
    # to vocab_size).  Only heads >= 4096 wide — tiny test models keep
    # their exact shape.
    head = out.get("lm_head")
    if (head is not None and not cfg.tie_word_embeddings
            and isinstance(head.get("w"), QTensor)
            and head.get("b") is None and head.get("perm") is None):
        n = head["w"].shape[1]
        if n >= 4096 and n % 512:
            from ..ops.quantize import repad_n

            out["lm_head"] = dict(head, w=repad_n(head["w"], 512))
    out = _repad_tree(out)
    # stack eligible MoE experts [E, ...] (after repad so planes are
    # kernel-aligned) — enables grouped prefill dispatch (ops/moe.py) and
    # replaces the per-expert list so weights are not duplicated in HBM
    for lp in out.get("layers", []):
        moe_p = lp.get("moe")
        if isinstance(moe_p, dict) and "experts" in moe_p:
            st = _stack_expert_ffns(moe_p["experts"])
            if st is not None:
                moe_p["experts_stacked"] = st
                del moe_p["experts"]
    return out


def _stack_expert_ffns(experts):
    """Stack each projection of the expert FFNs, or None when any expert
    is not stackable (mixed structures, biases, act-order perms, non-packed
    weights)."""
    from ..ops.moe import stack_experts

    if not experts:
        return None
    keys = set(experts[0].keys())
    if keys not in ({"gateup", "down"}, {"gate", "up", "down"},
                    {"up", "down"}):
        return None
    stacked = {}
    for key in keys:
        parts = [ep.get(key) for ep in experts]
        if any(
            pp is None or set(pp) - {"w"} or not isinstance(pp.get("w"),
                                                            QTensor)
            for pp in parts
        ):
            return None
        st = stack_experts([pp["w"] for pp in parts])
        if st is None:
            return None
        stacked[key] = st
    return stacked
