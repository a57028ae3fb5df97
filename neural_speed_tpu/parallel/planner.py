"""Deployment planner: pick a (dp, pp, tp, ep) mesh for a model + chip pool.

EXTENSION beyond the reference (whose only knob is `mpirun -np N`,
docs/tensor_parallelism.md): given an ArchConfig, a weight QSpec, and the
chip specs (count, HBM), enumerate every mesh this framework can actually
run (`parallel/tp.py` dp x ep x tp, `parallel/pp.py` dp x pp x tp),
estimate per-chip memory and per-token collective traffic, and recommend
one.  The memory model is exact for the packed formats in ops/quantize.py
(tests cross-check against real packed pytrees).

Mental model ("How to Scale Your Model"): weights + KV must fit first;
then prefer the mesh that moves the fewest bytes over ICI per token —
TP pays 2 all-reduces of the hidden state per layer, PP pays one hidden
handoff per stage boundary, DP/EP pay nothing in inference (EP's combine
is free here because routing is localized, ops/moe.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..models.arch import ArchConfig
from ..ops.qtypes import QSpec, QType

_SCALE_BYTES = {"float32": 4, "bfloat16": 2}


def qtensor_bytes(k: int, n: int, spec: Optional[QSpec]) -> int:
    """Packed size of one [K, N] linear (ops/quantize.py layouts);
    spec=None => bf16 dense."""
    if spec is None:
        return 2 * k * n
    bits = spec.bits
    if bits in (3, 5, 6, 7):
        # multi-plane planar kernel keeps odd widths native when the
        # group qualifies (ops/matmul._planar_supported: g >= 128 or one
        # group); otherwise the engine widens at load
        g_ok = spec.group_size >= 128 or spec.group_size == -1
        if not g_ok:
            bits = 8 if bits > 4 else 4
    data = k * n * bits // 8
    g = spec.group_size if spec.group_size > 0 else k
    groups = max(k // g, 1)
    scales = groups * n * (1 if spec.double_quant
                           else _SCALE_BYTES[spec.scale_dtype])
    zeros = 0 if spec.symmetric else groups * n
    sscale = 4 * n if spec.double_quant else 0
    return data + scales + zeros + sscale


def _layer_linears(cfg: ArchConfig) -> List[Tuple[int, int, str]]:
    """(K, N, split) per decoder-layer linear; split in {col,row,rep}
    following the TP table (parallel/tp.py COLUMN/ROW_KEYS)."""
    h = cfg.hidden_size
    hd = cfg.head_dim
    qn = cfg.n_heads * hd
    kvn = cfg.n_kv_heads * hd
    out = [(h, qn, "col"), (h, kvn, "col"), (h, kvn, "col"),
           (qn, h, "row")]
    i = cfg.intermediate_size
    n_ffn = cfg.moe.num_experts if cfg.moe else 1
    for _ in range(n_ffn):
        if cfg.gated_ffn:
            out += [(h, i, "col"), (h, i, "col"), (i, h, "row")]
        else:
            out += [(h, i, "col"), (i, h, "row")]
    if cfg.moe:
        out.append((h, cfg.moe.num_experts, "rep"))  # router
    return out


@dataclasses.dataclass
class Plan:
    dp: int = 1
    pp: int = 1
    tp: int = 1
    ep: int = 1
    weight_bytes: int = 0       # per chip
    kv_bytes: int = 0           # per chip
    total_bytes: int = 0        # per chip, incl. activation headroom
    fits: bool = False
    comm_bytes_per_token: int = 0   # ICI traffic per generated token
    batch_per_chip: int = 0

    @property
    def n_chips(self) -> int:
        return self.dp * self.pp * self.tp * self.ep

    def describe(self) -> str:
        gb = 1 << 30
        return (f"dp={self.dp} pp={self.pp} tp={self.tp} ep={self.ep} "
                f"({self.n_chips} chips): {self.weight_bytes / gb:.2f} GiB "
                f"weights + {self.kv_bytes / gb:.2f} GiB KV = "
                f"{self.total_bytes / gb:.2f} GiB/chip "
                f"[{'fits' if self.fits else 'OOM'}], "
                f"{self.comm_bytes_per_token / (1 << 20):.2f} MiB ICI/token")


def plan_memory(cfg: ArchConfig, qspec: Optional[QSpec], p: Plan,
                batch: int, ctx: int, kv_bytes_per_elt: float = 1.25,
                act_dtype_bytes: int = 2) -> Plan:
    """Fill the memory/comm fields of `p` (mesh axes already set).

    kv_bytes_per_elt: 1.25 for int8 KV (+scale/ D=... amortized), 2 bf16.
    """
    hd = cfg.head_dim
    # --- per-layer weights, shard-aware --------------------------------
    layer = 0
    shard_kv = cfg.n_kv_heads % p.tp == 0 and cfg.n_kv_heads >= p.tp
    for k, n, split in _layer_linears(cfg):
        b = qtensor_bytes(k, n, qspec)
        div = 1
        if split == "col":
            # k/v stay replicated when heads cannot shard (local_arch)
            kv_proj = n == cfg.n_kv_heads * hd and n != cfg.n_heads * hd
            div = p.tp if (shard_kv or not kv_proj) else 1
        elif split == "row":
            div = p.tp
        layer += b // div
    if cfg.moe and p.ep > 1:
        # experts divide over ep (router + attention don't)
        ffn1 = qtensor_bytes(cfg.hidden_size, cfg.intermediate_size, qspec)
        expert = (2 * ffn1 if cfg.gated_ffn else ffn1) + qtensor_bytes(
            cfg.intermediate_size, cfg.hidden_size, qspec)
        expert_tp = expert // p.tp
        layer -= cfg.moe.num_experts * expert_tp
        layer += (cfg.moe.num_experts // p.ep) * expert_tp
    norm_b = 2 * cfg.hidden_size * (4 if cfg.norm == "ln" else 2)
    layer += norm_b
    weights = (cfg.n_layers // p.pp) * layer
    # embeds/head replicated across tp (vocab-col-split at most transient)
    emb = 2 * cfg.vocab_size * cfg.hidden_size
    weights += emb if cfg.tie_word_embeddings else 2 * emb
    # --- KV ------------------------------------------------------------
    kv_heads_local = (cfg.n_kv_heads // p.tp) if shard_kv else cfg.n_kv_heads
    bpc = max(batch // p.dp, 1)
    kv = int(2 * (cfg.n_layers // p.pp) * bpc * kv_heads_local * ctx * hd
             * kv_bytes_per_elt)
    # --- activations (transient; scales with tokens in flight) ---------
    act = 4 * bpc * max(cfg.hidden_size, cfg.vocab_size) * act_dtype_bytes * 8
    # --- comm per generated token --------------------------------------
    comm = 0
    if p.tp > 1:
        # TP psums ride the f32 matmul accumulators (transformer.linear
        # psums before the astype) — 4 bytes/elt, validated against the
        # compiled HLO's collective shapes (tests/test_planner.py)
        comm += 2 * cfg.n_layers * bpc * cfg.hidden_size * 4
        if not cfg.tie_word_embeddings:
            # column-split lm_head gathers the full logits row per token
            comm += bpc * cfg.vocab_size * 4
    if p.pp > 1:
        comm += (p.pp - 1) * bpc * cfg.hidden_size * act_dtype_bytes
    p.weight_bytes = weights
    p.kv_bytes = kv
    p.total_bytes = weights + kv + act
    p.comm_bytes_per_token = comm
    p.batch_per_chip = bpc
    return p


def enumerate_plans(cfg: ArchConfig, qspec: Optional[QSpec], n_chips: int,
                    hbm_bytes: int, batch: int = 1, ctx: int = 2048,
                    kv_bytes_per_elt: float = 1.25) -> List[Plan]:
    """All runnable meshes on exactly `n_chips` (or fewer chips when
    n_chips has awkward factors), memory-annotated."""
    plans: List[Plan] = []
    seen = set()
    for tp in _divisors(n_chips):
        if cfg.n_heads % tp or cfg.intermediate_size % tp:
            continue
        if not _row_split_ok(cfg, qspec, tp):
            continue
        for pp in _divisors(n_chips // tp):
            if cfg.n_layers % pp:
                continue
            rest = n_chips // (tp * pp)
            ep_opts = [1]
            if cfg.moe and pp == 1:  # ep rides the tp-step mesh (no pp)
                ep_opts += [e for e in _divisors(rest)
                            if e > 1 and cfg.moe.num_experts % e == 0]
            for ep in ep_opts:
                dp_cap = rest // ep
                if dp_cap < 1:
                    continue
                # dp beyond the batch is useless; idle the excess chips
                # instead of dropping the plan (awkward chip counts)
                for dp in {1, min(dp_cap, max(batch, 1))}:
                    key = (dp, pp, tp, ep)
                    if key in seen:
                        continue
                    seen.add(key)
                    p = plan_memory(cfg, qspec,
                                    Plan(dp=dp, pp=pp, tp=tp, ep=ep),
                                    batch, ctx, kv_bytes_per_elt)
                    p.fits = p.total_bytes <= hbm_bytes
                    plans.append(p)
    return plans


def _row_split_ok(cfg: ArchConfig, qspec: Optional[QSpec], tp: int) -> bool:
    """Mirror ops/quantize.repack's constraint for EVERY row-split (K-
    sharded) linear: o-proj (K = n_heads*head_dim) and ffn-down
    (K = intermediate).  int8/fp8 re-slab freely; group -1 spans all of K
    and repack exempts it."""
    if tp == 1 or qspec is None:
        return True
    if qspec.is_fp8 or (qspec.qtype == QType.INT and qspec.bits == 8):
        return True
    g = qspec.group_size
    if g <= 0:
        return True
    for k in (cfg.n_heads * cfg.head_dim, cfg.intermediate_size):
        if (k // tp) % g:
            return False
    return True


def recommend(cfg: ArchConfig, qspec: Optional[QSpec], n_chips: int,
              hbm_gb: float = 16.0, batch: int = 1, ctx: int = 2048,
              kv_bytes_per_elt: float = 1.25) -> Plan:
    """The recommended mesh: smallest ICI traffic among fitting plans
    (ties -> most dp, then fewest pp stages: bubbles hurt latency);
    if nothing fits, the plan with the lowest per-chip memory."""
    hbm = int(hbm_gb * (1 << 30))
    plans = enumerate_plans(cfg, qspec, n_chips, hbm, batch, ctx,
                            kv_bytes_per_elt)
    if not plans:
        raise ValueError(
            f"no runnable mesh for {cfg.name} on {n_chips} chips "
            "(check n_heads/intermediate/n_layers divisibility)")
    fitting = [p for p in plans if p.fits]
    if fitting:
        return min(fitting, key=lambda p: (p.comm_bytes_per_token, -p.dp,
                                           p.pp))
    return min(plans, key=lambda p: p.total_bytes)


def _divisors(n: int) -> List[int]:
    return [d for d in range(1, n + 1) if n % d == 0]


def build_engine(plan: Plan, params, cfg, max_batch: int = 1,
                 max_len: int = 2048, kv_quantized: bool = False,
                 devices=None):
    """Instantiate the serving engine a Plan describes — the bridge from
    `recommend()` to a running deployment.  dp/ep/tp plans build a
    TPEngine over make_mesh; plans with pp>1 build a PPEngine over
    make_pp_mesh (composing tp inside each stage).  Params must be
    unfused (fused projections do not compose with column splits)."""
    from .pp import PPEngine, make_pp_mesh
    from .tp import TPEngine, make_mesh

    if plan.pp > 1:
        if plan.ep > 1:
            raise NotImplementedError("pp x ep plans are not buildable yet")
        mesh = make_pp_mesh(plan.pp, tp=plan.tp, dp=plan.dp,
                            devices=devices)
        return PPEngine(params, cfg, mesh, max_batch=max_batch,
                        max_len=max_len, kv_quantized=kv_quantized)
    mesh = make_mesh(tp=plan.tp, dp=plan.dp, ep=plan.ep, devices=devices)
    return TPEngine(params, cfg, mesh, max_batch=max_batch,
                    max_len=max_len, kv_quantized=kv_quantized)
