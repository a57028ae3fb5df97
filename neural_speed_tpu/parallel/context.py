"""Context (sequence) parallelism — attention over a KV cache sharded along
the sequence axis.

EXTENSION beyond the reference (SURVEY.md §2.7: the reference has no
SP/ring attention; long context is bounded by one node).  On TPU the KV
cache can shard over a mesh axis and each chip computes a partial flash
attention against its local KV shard; partials merge with the online-
softmax cross-chip combine (pmax + psum of rescaled (o, l) — the same
algebra flash attention uses across tiles, applied across chips).

Layout: KV `[L, B, H, S/cp, D]` sharded on the `cp` axis; every chip holds
the full query block.  Each chip's shard covers the GLOBAL positions
[rank*S_local, (rank+1)*S_local); masks use global kpos so causality and
kv_lens work unchanged.

`cp_attention` is written for use inside `shard_map` over axis `cp`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG = -0.7 * 3.4e38


def _local_attention_with_stats(q, k, v, q_positions, kv_lens, shard_start,
                                scale, causal):
    """Masked attention over the local KV shard returning un-normalized
    output plus softmax stats: (o_partial [B,T,H,D], m [B,H,T], l [B,H,T]).
    k/v: [B, S_local, H_kv, D]; positions/masks use GLOBAL key positions."""
    b, t, h, d = q.shape
    s = k.shape[1]
    h_kv = k.shape[2]
    n_rep = h // h_kv
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if n_rep > 1:
        kf = jnp.repeat(kf, n_rep, axis=2)
        vf = jnp.repeat(vf, n_rep, axis=2)
    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("bthd,bshd->bhts", qf, kf)

    kpos = shard_start + jnp.arange(s)[None, None, :]      # [1,1,S] global
    valid = kpos < kv_lens[:, None, None]
    if causal:
        valid = valid & (kpos <= q_positions[:, :, None])
    else:
        valid = jnp.broadcast_to(valid, (b, t, s))
    logits = jnp.where(valid[:, None, :, :], logits, NEG)

    m = jnp.max(logits, axis=-1)                           # [B,H,T]
    p = jnp.exp(logits - m[..., None])
    # fully-masked rows: exp(NEG-NEG)=1 rows would pollute the merge —
    # zero them and push m to NEG so other shards dominate
    any_valid = jnp.any(valid, axis=-1)[:, None, :]        # [B,1,T]
    p = jnp.where(any_valid[..., None], p, 0.0)
    m = jnp.where(any_valid, m, NEG)
    l = jnp.sum(p, axis=-1)                                # [B,H,T]
    o = jnp.einsum("bhts,bshd->bthd", p, vf)               # un-normalized
    return o, m, l


def cp_attention(q, k_shard, v_shard, q_positions, kv_lens, *,
                 axis_name: str = "cp", scale: Optional[float] = None,
                 causal: bool = True, out_dtype=None):
    """Sequence-parallel attention inside shard_map over `axis_name`.

    q: [B, T, H, D] (replicated over cp); k/v_shard: [B, S/cp, H_kv, D].
    Communication: one pmax + two psums of [B,H,T(,D)] — O(T*D) per query,
    independent of the context length (vs all-gathering S*D of KV).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s_local = k_shard.shape[1]
    rank = jax.lax.axis_index(axis_name)
    shard_start = rank * s_local

    o, m, l = _local_attention_with_stats(
        q, k_shard, v_shard, q_positions, kv_lens, shard_start, scale,
        causal,
    )
    # cross-chip online-softmax combine (boom guide §15 approach 2)
    m_glob = jax.lax.pmax(m, axis_name)                    # [B,H,T]
    alpha = jnp.exp(m - m_glob)
    l_glob = jax.lax.psum(l * alpha, axis_name)
    o_glob = jax.lax.psum(o * alpha.transpose(0, 2, 1)[..., None],
                          axis_name)
    inv = jnp.where(l_glob == 0.0, 0.0, 1.0 / l_glob)
    out = o_glob * inv.transpose(0, 2, 1)[..., None]
    return out.astype(out_dtype or q.dtype)


def ring_attention(q, k_shard, v_shard, q_positions, kv_lens, *,
                   cp_size: int, axis_name: str = "cp",
                   scale: Optional[float] = None, causal: bool = True,
                   out_dtype=None):
    """Ring attention: KV shards rotate around the `axis_name` ring via
    ppermute while each chip folds the visiting block into its running
    online-softmax state — point-to-point neighbor traffic only, overlapped
    with compute by XLA (boom guide §16).  Equivalent math to
    `cp_attention`; preferable when S/cp is large enough that a psum of
    O(T*D) per step beats resending... i.e. when the combine collectives
    dominate.  `cp_size` must equal the mesh axis size (static)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, t, h, d = q.shape
    s_local = k_shard.shape[1]
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % cp_size) for i in range(cp_size)]

    m = jnp.full((b, h, t), NEG, jnp.float32)
    l = jnp.zeros((b, h, t), jnp.float32)
    o = jnp.zeros((b, t, h, d), jnp.float32)
    kb, vb = k_shard, v_shard
    for step in range(cp_size):
        src = (my - step) % cp_size
        o_p, m_p, l_p = _local_attention_with_stats(
            q, kb, vb, q_positions, kv_lens, src * s_local, scale, causal,
        )
        m_new = jnp.maximum(m, m_p)
        a = jnp.exp(m - m_new)
        bscale = jnp.exp(m_p - m_new)
        l = a * l + bscale * l_p
        o = (o * a.transpose(0, 2, 1)[..., None]
             + o_p * bscale.transpose(0, 2, 1)[..., None])
        m = m_new
        if step < cp_size - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    out = o * inv.transpose(0, 2, 1)[..., None]
    return out.astype(out_dtype or q.dtype)
