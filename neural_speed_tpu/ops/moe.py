"""Grouped MoE expert dispatch — megablocks-style, exact, static-shape.

Parity target: the reference computes MoE by running the selected experts
serially per token group (`ne_mul_mat_id`, llama.cpp:641-680) — fine on a
CPU where the expert loop is just pointer math, but on TPU a per-token
dynamic expert choice would either break jit (dynamic shapes) or force the
dense-all-experts fallback (E/top_k x the FLOPs).

TPU-native design (grouped GEMM with block-aligned segments):
  1. `route_tokens`: flatten the router's top-k assignments, sort them by
     expert, and lay the sorted rows out so every expert's segment starts
     at an M-block boundary (padding rows read a zero activation row).
     All shapes are static: `M_pad = ceil(A/bm)*bm + E*bm` bounds the
     block-aligned total for any routing, so there are NO capacity drops —
     the output is exactly the dense computation, unlike
     capacity-factor MoE dispatch.
  2. `grouped_qmatmul`: one fused dequant-GEMM over the sorted rows where
     the *weight* (and scale/zero) block index depends on the M-block via a
     scalar-prefetched block->expert map — the same kernel family as
     ops/matmul.py, with experts stacked on a leading axis.  Each M-block
     belongs to exactly one expert (segments are block-aligned), so the
     kernel body is unchanged dequant-GEMM.
FLOPs drop from E/top_k x dense to ~1x (plus < E*bm padding rows), and all
experts' weights are still read exactly once per call.

`StackedExperts` holds the per-projection expert stack `[E, ...]`; it
replaces the per-expert QTensor list at load time (transformer.fuse_params)
so weights are not duplicated in HBM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import _bands, _choose_bn, _use_pallas, qmatmul_xla
from .qtypes import QSpec, plane_widths
from .quantize import QTensor


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedExperts:
    """E experts' packed weights stacked on a leading axis.

    data   : tuple of planes, each `[E, KW, N]` (uint32; int8 when bits==8).
    scales : `[E, K/g, N]`.
    zeros  : `[E, K/g, N]` uint8 or None.
    spec   : shared QSpec.
    shape  : per-expert logical (K, N) — static.
    """

    data: Tuple[jax.Array, ...]
    scales: jax.Array
    zeros: Optional[jax.Array]
    spec: QSpec
    shape: Tuple[int, int]
    n_experts: int
    k_shards: int = 1

    def tree_flatten(self):
        return (self.data, self.scales, self.zeros), (
            self.spec, self.shape, self.n_experts, self.k_shards)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales, zeros = children
        spec, shape, n_experts, k_shards = aux
        return cls(data, scales, zeros, spec, shape, n_experts, k_shards)

    def expert(self, e: int) -> QTensor:
        """Static-index view of one expert (used by the decode lax.switch
        path and the XLA fallback; a lazy slice, no copy until use)."""
        return QTensor(
            tuple(d[e] for d in self.data),
            self.scales[e],
            None if self.zeros is None else self.zeros[e],
            None, self.spec, self.shape, self.k_shards,
        )

    def leaf_dims(self) -> Tuple[int, int]:
        from .qtypes import QType

        n = self.scales.shape[-1]
        d0 = self.data[0]
        if self.spec.qtype == QType.INT and self.spec.bits == 8:
            return d0.shape[1], n
        w0 = 4 if self.spec.is_lut else plane_widths(self.spec.bits)[0]
        return d0.shape[1] * (32 // w0), n

    def local_view(self) -> "StackedExperts":
        """Shape/k_shards fixed to the leaves (inside shard_map bodies)."""
        k, n = self.leaf_dims()
        if (k, n) == self.shape:
            return self
        local_shards = self.k_shards * k // self.shape[0]
        if local_shards * self.shape[0] != self.k_shards * k or local_shards < 1:
            raise ValueError(
                f"row shard {k} incompatible with k_shards={self.k_shards} "
                f"of global K={self.shape[0]}")
        return dataclasses.replace(self, shape=(k, n), k_shards=local_shards)


def stack_experts(qts) -> Optional[StackedExperts]:
    """Stack per-expert QTensors; None when they are not stackable
    (mismatched specs/shapes, act-order perms handled by the caller,
    double-quant / fp8 / float-zero formats keep the per-expert list)."""
    q0 = qts[0]
    for qt in qts:
        if (qt.spec != q0.spec or qt.shape != q0.shape
                or qt.k_shards != q0.k_shards or len(qt.data) != len(q0.data)
                or qt.sscale is not None
                or (qt.zeros is None) != (q0.zeros is None)):
            return None
        if qt.zeros is not None and jnp.issubdtype(qt.zeros.dtype,
                                                   jnp.floating):
            return None
        if qt.spec.is_fp8 or qt.spec.double_quant:
            return None
    return StackedExperts(
        tuple(jnp.stack([qt.data[i] for qt in qts])
              for i in range(len(q0.data))),
        jnp.stack([qt.scales for qt in qts]),
        None if q0.zeros is None else jnp.stack([qt.zeros for qt in qts]),
        q0.spec, q0.shape, len(qts), q0.k_shards,
    )


# ---------------------------------------------------------------------------
# routing / dispatch (pure jnp, static shapes)
# ---------------------------------------------------------------------------


class Routing(NamedTuple):
    src: jax.Array           # [M_pad] token-row gather index (N = zero row)
    dest_by_a: jax.Array     # [A] sorted-row index of assignment a
    block_expert: jax.Array  # [M_pad // bm] expert id per M-block


def route_tokens(eid: jax.Array, num_experts: int, top_k: int,
                 bm: int) -> Routing:
    """Sort the A = N*top_k expert assignments into block-aligned expert
    segments.  `eid[a]` is the expert of assignment `a` (token `a//top_k`).
    Padding rows point `src` at row N (the caller appends a zero row)."""
    a_tot = eid.shape[0]
    n_tok = a_tot // top_k
    eid = eid.astype(jnp.int32)
    counts = jnp.bincount(eid, length=num_experts)
    seg = -(-counts // bm) * bm                       # per-expert, bm-aligned
    ends = jnp.cumsum(seg)
    starts = ends - seg
    order = jnp.argsort(eid).astype(jnp.int32)        # stable
    eid_s = eid[order]
    run_start = (jnp.cumsum(counts) - counts)[eid_s]
    rank = jnp.arange(a_tot, dtype=jnp.int32) - run_start.astype(jnp.int32)
    dest = starts[eid_s].astype(jnp.int32) + rank
    n_mb = -(-a_tot // bm) + num_experts              # static bound
    src = jnp.full((n_mb * bm,), n_tok, jnp.int32).at[dest].set(
        order // top_k)
    dest_by_a = jnp.zeros((a_tot,), jnp.int32).at[order].set(dest)
    blk = jnp.arange(n_mb, dtype=jnp.int32) * bm
    block_expert = jnp.clip(
        jnp.searchsorted(ends, blk, side="right"), 0, num_experts - 1
    ).astype(jnp.int32)
    return Routing(src, dest_by_a, block_expert)


def choose_bm(max_k: int, dtype) -> int:
    """M block: 128 rows unless the resident [bm, K] x block would exceed
    ~4MB of VMEM (then 64).  Smaller bm also shrinks segment padding."""
    nbytes = 2 if dtype == jnp.bfloat16 else 4
    return 128 if max_k * nbytes * 128 <= 4 * 1024 * 1024 else 64


# ---------------------------------------------------------------------------
# grouped fused dequant-GEMM kernel (ops/matmul.py kernels + expert dim)
# ---------------------------------------------------------------------------


def _kernel_group_stacked(st: StackedExperts) -> int:
    import math

    k = st.shape[0]
    g = st.spec.effective_group(k)
    if g >= k:
        return g
    kw = k // _bands(st.spec)
    if g <= kw and kw % g == 0:
        return g
    return math.gcd(g, kw)


def _stack_kernel_ok(st: StackedExperts) -> bool:
    spec = st.spec
    if st.k_shards != 1 or len(st.data) != 1:
        return False
    if not (spec.is_lut or spec.bits in (1, 2, 4, 8)):
        return False
    return _kernel_group_stacked(st) >= 32


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def _grouped_pallas(xs: jax.Array, st: StackedExperts,
                    block_expert: jax.Array, bm: int,
                    interpret: bool = False) -> jax.Array:
    """Grouped launcher: matmul.py's K-grid streaming kernels with an extra
    scalar-prefetched expert index in the weight/scale block maps.  Grid
    (M/bm, N/bn, n_kb); identical per-K-block scale permutation, applied
    per expert along axis 1."""
    import numpy as np

    from .matmul import _choose_bkw, _gemm_kernel_int, _gemm_kernel_lut

    spec = st.spec
    k, n = st.shape
    m = xs.shape[0]
    cdt = jnp.bfloat16 if xs.dtype == jnp.bfloat16 else jnp.float32
    g = spec.effective_group(k)
    bn = _choose_bn(n)
    e = _bands(spec)
    n_e = st.n_experts

    wq = st.data[0]
    scales = st.scales.astype(cdt)
    zeros = st.zeros
    g_eff = _kernel_group_stacked(st)
    if g_eff != g:
        rep = g // g_eff
        scales = jnp.repeat(scales, rep, axis=1)
        if zeros is not None:
            zeros = jnp.repeat(zeros, rep, axis=1)
        g = g_eff
    kw_words = wq.shape[1]
    bkw = _choose_bkw(kw_words, g if g < k else 0, bn)
    n_kb = kw_words // bkw
    if g < k:
        gb = bkw // g
        s_rows = e * gb
        idx = np.asarray(
            [(band * kw_words + kb_i * bkw) // g + t
             for kb_i in range(n_kb) for band in range(e)
             for t in range(gb)], np.int32)
        scales = jnp.take(scales, idx, axis=1).reshape(n_e, n_kb, s_rows, n)
        if zeros is not None:
            zeros = jnp.take(zeros, idx, axis=1).reshape(n_e, n_kb, s_rows,
                                                         n)
    else:  # one scale row per expert
        s_rows = 1
        scales = jnp.broadcast_to(scales.reshape(n_e, 1, 1, n),
                                  (n_e, n_kb, 1, n))
        if zeros is not None:
            zeros = jnp.broadcast_to(zeros.reshape(n_e, 1, 1, n),
                                     (n_e, n_kb, 1, n))

    grid = (m // bm, n // bn, n_kb)
    x_spec = pl.BlockSpec((bm, k), lambda i, j, kb, be: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, bkw, bn), lambda i, j, kb, be: (be[i], kb, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, s_rows, bn),
                          lambda i, j, kb, be: (be[i], kb, 0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j, kb, be: (i, j),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]

    nbytes = 4 if cdt == jnp.float32 else 2
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * nbytes + wq.size * wq.dtype.itemsize
        + m * n * 4,
        transcendentals=0,
    )
    if spec.is_lut:
        body = functools.partial(_gemm_kernel_lut, spec=spec, k=k, g=g,
                                 cdt=cdt, n_kb=n_kb)

        def kern(be_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
            body(x_ref, w_ref, s_ref, o_ref, acc_ref)
        in_specs = [x_spec, w_spec, s_spec]
        args = (xs.astype(cdt), wq, scales)
    elif zeros is not None:
        body = functools.partial(_gemm_kernel_int, spec=spec, k=k, g=g,
                                 cdt=cdt, n_kb=n_kb)

        def kern(be_ref, x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
            body(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref)
        in_specs = [x_spec, w_spec, s_spec, s_spec]
        args = (xs.astype(cdt), wq, scales, zeros)
    else:
        body = functools.partial(_gemm_kernel_int, spec=spec, k=k, g=g,
                                 cdt=cdt, n_kb=n_kb)

        def kern(be_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
            body(x_ref, w_ref, s_ref, None, o_ref, acc_ref)
        in_specs = [x_spec, w_spec, s_spec]
        args = (xs.astype(cdt), wq, scales)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=o_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(block_expert, *args)


def _grouped_xla(xs: jax.Array, st: StackedExperts,
                 block_expert: jax.Array, bm: int) -> jax.Array:
    """Exact fallback (CPU / unsupported specs): dense per expert with the
    rows masked by the block->expert map.  E x the FLOPs — correctness
    path, mirroring qmatmul's XLA fallback role."""
    row_e = jnp.repeat(block_expert, bm)
    out = jnp.zeros((xs.shape[0], st.shape[1]), jnp.float32)
    for e in range(st.n_experts):
        y = qmatmul_xla(xs, st.expert(e), jnp.float32)
        out = out + jnp.where((row_e == e)[:, None], y, 0.0)
    return out


def grouped_qmatmul(xs: jax.Array, st: StackedExperts,
                    block_expert: jax.Array, bm: int,
                    interpret: bool = False) -> jax.Array:
    """Sorted-rows grouped matmul: row block i uses expert
    `block_expert[i]`'s weights.  xs: [M, K] -> [M, N] float32."""
    st = st.local_view()
    if xs.shape[-1] != st.shape[0]:
        pad = st.shape[0] - xs.shape[-1]
        xs = jnp.pad(xs, ((0, 0), (0, pad)))
    use_pallas = (interpret or _use_pallas()) and _stack_kernel_ok(st)
    if not use_pallas:
        return _grouped_xla(xs, st, block_expert, bm)
    return _grouped_pallas(xs, st, block_expert, bm, interpret=interpret)
