"""Tensor parallelism over a TPU mesh — GSPMD/shard_map replacement for the
reference's MPI+oneCCL TP backend.

Parity map (SURVEY.md §2.7):
  * `calc_split_type` row/column split table (model_files.h:134-191)
    -> `partition_spec_for()` rules: QKV & FFN-up/gate column-split (shard N),
    attn-out & FFN-down row-split (shard K), norms/embeddings replicated.
  * heads divided by world size (llama.cpp:122-125) -> `local_arch()`.
  * NE_OP_ALL_REDUCE after attn-out + ffn-down (llama.cpp:590-594,690-695)
    -> `jax.lax.psum` placed inside `linear(..., axis_name)`.
  * MPI/oneCCL/shm allreduce (parallel_context.cpp) -> XLA collectives over
    ICI; multi-host init is `jax.distributed.initialize` (runtime/cluster).

Packed-weight subtlety: row-split int4 tensors are packed with
`k_shards=tp` so every device's row slice is a self-contained planar pack,
and group-quant scale rows split on exact group boundaries (the constraint
called out in SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

import dataclasses

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.arch import ArchConfig
from ..models.transformer import forward
from ..ops import kv_cache as kvc
from ..ops.quantize import QTensor
from ..runtime.engine import Engine

COLUMN_KEYS = {"q", "k", "v", "gate", "up", "lm_head"}
ROW_KEYS = {"o", "down"}
REPLICATED_LINEAR_KEYS = {"router"}


def make_mesh(tp: int = 1, dp: int = 1, ep: int = 1, devices=None) -> Mesh:
    """dp x (ep x) tp device mesh.  `ep` (expert parallelism, MoE only)
    shards the stacked expert axis; with ep == 1 the mesh stays 2-D so
    non-MoE flows are unchanged."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= tp * dp * ep, (devices.size, tp, dp, ep)
    if ep == 1:
        return Mesh(devices[: tp * dp].reshape(dp, tp), ("dp", "tp"))
    return Mesh(devices[: tp * dp * ep].reshape(dp, ep, tp),
                ("dp", "ep", "tp"))


def _qtensor_spec(qt: QTensor, row: bool) -> QTensor:
    """A QTensor-shaped pytree of PartitionSpecs (per-leaf specs)."""
    col = not row
    d_spec = tuple(P("tp", None) if row else P(None, "tp") for _ in qt.data)
    s_spec = P("tp", None) if row else P(None, "tp")
    z_spec = None if qt.zeros is None else s_spec
    ss_spec = None if qt.sscale is None else (P() if row else P(None, "tp"))
    return QTensor(d_spec, s_spec, z_spec, ss_spec, qt.spec, qt.shape,
                   qt.k_shards)


def _linear_spec(p: Dict[str, Any], kind: str) -> Dict[str, Any]:
    """kind: 'col' | 'row' | 'rep'."""
    w = p["w"]
    out: Dict[str, Any] = {}
    if isinstance(w, QTensor):
        if kind == "rep":
            out["w"] = QTensor(tuple(P() for _ in w.data), P(),
                               None if w.zeros is None else P(),
                               None if w.sscale is None else P(),
                               w.spec, w.shape, w.k_shards)
        else:
            out["w"] = _qtensor_spec(w, kind == "row")
    else:
        out["w"] = {"rep": P(), "row": P("tp", None),
                    "col": P(None, "tp")}[kind]
    if "b" in p:
        out["b"] = P("tp") if kind == "col" else P()
    return out


def _ffn_specs(fp: Dict[str, Any], tp_shard: bool) -> Dict[str, Any]:
    out = {}
    for key, sub in fp.items():
        if key in ("gate", "up", "gateup"):
            out[key] = _linear_spec(sub, "col" if tp_shard else "rep")
        elif key == "down":
            out[key] = _linear_spec(sub, "row" if tp_shard else "rep")
    return out


def _stacked_spec(st, row: bool, ep: bool):
    """Spec pytree for a StackedExperts: expert axis on 'ep' (or
    replicated), K or N on 'tp' exactly like the per-expert QTensor
    splits."""
    import dataclasses as _dc

    e = "ep" if ep else None
    d = tuple(P(e, "tp", None) if row else P(e, None, "tp")
              for _ in st.data)
    s = P(e, "tp", None) if row else P(e, None, "tp")
    return _dc.replace(st, data=d, scales=s,
                       zeros=None if st.zeros is None else s)


def _stacked_experts_specs(sd: Dict[str, Any],
                           ep: bool = False) -> Dict[str, Any]:
    if "gateup" in sd:
        # fused gate+up cannot be column-split naively (shard 0 would get
        # all of gate): TP flows shard the UNFUSED per-projection stacks —
        # same rule as the dense FFN (shard_params runs on unfused params)
        raise ValueError("TP sharding requires unfused expert gate/up "
                         "stacks (build params with fuse=False)")
    return {key: _stacked_spec(st, key == "down", ep)
            for key, st in sd.items()}


def param_specs(params: Dict[str, Any], cfg: ArchConfig,
                shard_kv: bool, ep: bool = False) -> Dict[str, Any]:
    """PartitionSpec pytree mirroring the params structure."""
    specs: Dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            specs[key] = []
            for lp in val:
                ls: Dict[str, Any] = {}
                for k2, v2 in lp.items():
                    if k2 == "q":
                        ls[k2] = _linear_spec(v2, "col")
                    elif k2 in ("k", "v"):
                        ls[k2] = _linear_spec(v2, "col" if shard_kv else "rep")
                    elif k2 == "o":
                        ls[k2] = _linear_spec(v2, "row")
                    elif k2 == "ffn":
                        ls[k2] = _ffn_specs(v2, True)
                    elif k2 == "moe":
                        ms: Dict[str, Any] = {
                            "router": _linear_spec(v2["router"], "rep"),
                        }
                        if "experts" in v2:
                            if ep:
                                raise ValueError(
                                    "expert parallelism needs stacked "
                                    "experts (stack_experts-compatible "
                                    "qspec)")
                            ms["experts"] = [
                                _ffn_specs(e2, True) for e2 in v2["experts"]
                            ]
                        if "experts_stacked" in v2:
                            ms["experts_stacked"] = _stacked_experts_specs(
                                v2["experts_stacked"], ep)
                        for nk in ("pre_norm", "post_norm"):
                            if nk in v2:
                                ms[nk] = jax.tree_util.tree_map(
                                    lambda _: P(), v2[nk]
                                )
                        ls[k2] = ms
                    else:  # norms
                        ls[k2] = jax.tree_util.tree_map(lambda _: P(), v2)
                specs[key].append(ls)
        elif key == "lm_head":
            ls = _linear_spec(val, "col")
            specs[key] = ls
        else:  # embed, pos_embed, embed_ln, final_norm
            specs[key] = jax.tree_util.tree_map(lambda _: P(), val)
    return specs


def cache_specs(shard_kv: bool) -> kvc.KVCache:
    # k/v: [L, B, Hkv, S, D]; scales: [L, B, Hkv, S] — heads on 'tp'
    kvspec = P(None, "dp", "tp", None, None) if shard_kv else P(
        None, "dp", None, None, None
    )
    sspec = P(None, "dp", "tp", None) if shard_kv else P(
        None, "dp", None, None
    )
    return kvc.KVCache(kvspec, kvspec, sspec, sspec, P("dp"))


def paged_cache_specs(shard_kv: bool):
    """Specs for a PagedKVCache under TP: the physical page pools
    [L, Hkv, P, ps, D] (and scale pools [L, Hkv, P, 1, ps]) shard on the
    KV-head axis; page tables and lengths stay per-slot host-managed
    state (replicated — the pool is NOT dp-sharded, so paged serving
    requires dp == 1)."""
    from ..ops import paged_kv as pkv

    kvspec = (P(None, "tp", None, None, None) if shard_kv
              else P(None, None, None, None, None))
    sspec = kvspec
    return pkv.PagedKVCache(kvspec, kvspec, sspec, sspec, P(None, None),
                            P(None))


def local_arch(cfg: ArchConfig, tp: int) -> Tuple[ArchConfig, bool]:
    """Per-device head counts (parity: kv heads / world_size,
    model_utils.cpp:70-75; n_head/world, llama.cpp:122-125).
    Returns (local cfg, shard_kv)."""
    assert cfg.n_heads % tp == 0, (cfg.n_heads, tp)
    shard_kv = cfg.n_kv_heads % tp == 0 and cfg.n_kv_heads >= tp
    return (
        dataclasses.replace(
            cfg,
            n_heads=cfg.n_heads // tp,
            n_kv_heads=cfg.n_kv_heads // tp if shard_kv else cfg.n_kv_heads,
            intermediate_size=cfg.intermediate_size // tp,
        ),
        shard_kv,
    )


def repack_row_parallel(params: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """Re-pack row-split quantized weights into tp K-slabs (lossless)."""
    from ..ops.quantize import repack

    def walk(node, key=None):
        if isinstance(node, dict):
            out = {}
            for k2, v2 in node.items():
                if k2 in ROW_KEYS and isinstance(v2, dict) and "w" in v2:
                    w = v2["w"]
                    if isinstance(w, QTensor):
                        v2 = {**v2, "w": repack(w, tp)}
                    out[k2] = v2
                elif k2 == "experts_stacked":
                    from ..ops.moe import stack_experts

                    out[k2] = {
                        sk: (stack_experts(
                            [repack(sv.expert(e), tp)
                             for e in range(sv.n_experts)])
                            if sk in ROW_KEYS else sv)
                        for sk, sv in v2.items()
                    }
                else:
                    out[k2] = walk(v2, k2)
            return out
        if isinstance(node, list):
            return [walk(v2) for v2 in node]
        return node

    return walk(params)


def shard_params(params: Dict[str, Any], cfg: ArchConfig,
                 mesh: Mesh) -> Tuple[Dict[str, Any], Any]:
    """device_put the params with TP (+EP) shardings; returns
    (params, specs)."""
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    if ep > 1:
        assert cfg.moe is not None and cfg.moe.num_experts % ep == 0, (
            "ep axis requires a MoE model with num_experts % ep == 0")
    _, shard_kv = local_arch(cfg, tp)
    params = repack_row_parallel(params, tp)
    specs = param_specs(params, cfg, shard_kv, ep=ep > 1)
    is_spec = lambda x: isinstance(x, P)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves = jax.tree_util.tree_flatten(specs, is_leaf=is_spec)[0]
    assert len(leaves) == len(spec_leaves), (len(leaves), len(spec_leaves))
    out = [
        jax.device_put(l, NamedSharding(mesh, s))
        for l, s in zip(leaves, spec_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out), specs


def make_tp_step(cfg: ArchConfig, mesh: Mesh, params_specs,
                 paged: bool = False):
    """Build the shard_map'ed full step:
       (params, cache, ids, positions, kv_lens) -> (logits, cache)."""
    if cfg.rope_style == "chatglm":
        raise NotImplementedError(
            "chatglm-1 (GLM blank-infilling positions/mask) is single-chip "
            "only; chatglm2/3 shard normally")
    tp = mesh.shape["tp"]
    cfg_local, shard_kv = local_arch(cfg, tp)
    cspec = paged_cache_specs(shard_kv) if paged else cache_specs(shard_kv)

    ep_axis = "ep" if "ep" in mesh.shape and mesh.shape["ep"] > 1 else None

    def step(params, cache, ids, positions, kv_lens):
        logits, cache = forward(
            params, cfg_local, ids, positions, cache, kv_lens,
            axis_name="tp", n_heads_global=cfg.n_heads,
            gather_logits="lm_head" in params and not cfg.tie_word_embeddings,
            ep_axis_name=ep_axis,
        )
        return logits, cache

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(params_specs, cspec, P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), cspec),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))


class TPEngine(Engine):
    """Serving engine over a TP(+DP/EP) mesh: the drop-in multi-chip
    `Engine` for the continuous-batching scheduler / ModelServer / Model
    API (parity: the reference serves under TP — every rank's model_eval
    is TP-aware and the server just calls it, docs/tensor_parallelism.md;
    here one process drives the whole mesh through shard_map).

    Built on the same machinery as make_tp_step: params sharded per the
    Megatron split table (scale groups intact), KV cache head-sharded
    when possible, one psum after attn-out and ffn-down.  Everything the
    scheduler needs is inherited from Engine except the four run_* step
    methods (and the single-prompt conveniences), which wrap ONE
    shard_map'ed full-logits step."""

    # EOS-aware decode windows over the mesh: the while_loop wraps the
    # shard_map'ed step (GSPMD handles the collectives inside the body),
    # so sharded serving gets the same one-program-any-length dispatch
    # as the single-chip engine (runtime/engine.decode_window)
    supports_window = True

    def __init__(self, params: Dict[str, Any], cfg: ArchConfig, mesh: Mesh,
                 max_batch: int = 1, max_len: int = 2048,
                 kv_dtype=jnp.bfloat16, kv_quantized: bool = False,
                 buckets=None, fuse: bool = False, kv_scale_dtype=None):
        from ..runtime.engine import DEFAULT_BUCKETS

        if cfg.rope_style == "chatglm":
            raise NotImplementedError(
                "chatglm-1 (GLM blank-infilling positions/mask) is "
                "single-chip only")
        if fuse:
            # a column shard of the fused [q|k|v] concat mixes projections
            # (device0 would get q-only columns that the layer then splits
            # as q/k/v) — per-device fusion needs a device-aware column
            # layout, planned; TP runs with separate projections
            raise NotImplementedError(
                "fused QKV/gate-up does not compose with TP column splits; "
                "pass unfused params (fuse=False)")
        self.mesh = mesh
        sharded, self._specs = shard_params(params, cfg, mesh)
        super().__init__(sharded, cfg, max_batch=max_batch, max_len=max_len,
                         kv_dtype=kv_dtype, kv_quantized=kv_quantized,
                         buckets=buckets or DEFAULT_BUCKETS, fuse=False,
                         kv_scale_dtype=kv_scale_dtype)
        self._step = make_tp_step(self.cfg, mesh, self._specs,
                                  paged=type(self).PAGED)
        self._step_params = self.params
        self._chunk_fns: Dict[Any, Any] = {}

    PAGED = False

    # -- scheduler step methods -------------------------------------------
    def run_prefill(self, ids, lens, starts):
        b, t = ids.shape
        active = lens > 0
        pos = starts[:, None] + jnp.arange(t)[None, :]
        in_range = jnp.arange(t)[None, :] < lens[:, None]
        pos = jnp.where(in_range, pos, self.max_len - 1)
        kv_lens = jnp.where(active, starts + lens, self.cache.lengths)
        logits, self.cache = self._step(self._step_params, self.cache,
                                        ids, pos, kv_lens)
        self.cache = kvc.set_lengths(self.cache, kv_lens)
        last = jnp.clip(lens - 1, 0, t - 1)
        return jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0]

    def _chunk_fn(self, chunk: int, sp):
        """Jitted decode+sample chunk (the TP analogue of
        engine.decode_sample_chunk): lax.scan over the shard_map'ed step,
        ONE dispatch + one host sync per chunk instead of per token."""
        key = (chunk, sp)
        fn = self._chunk_fns.get(key)
        if fn is not None:
            return fn
        from ..ops import sampling as smp

        step = self._step
        max_len = self.max_len

        def chunk_body(params, cache, sampler, tokens, active):
            def body(carry, _):
                cache, sampler, cur = carry
                lens = cache.lengths
                pos = jnp.where(active, lens, max_len - 1)[:, None]
                kv_lens = lens + active.astype(jnp.int32)
                logits, cache = step(params, cache, cur[:, None], pos,
                                     kv_lens)
                cache = kvc.set_lengths(cache, kv_lens)
                nxt, sampler = smp.sample(logits[:, 0], sampler, sp,
                                          active=active)
                cur = jnp.where(active, nxt.astype(jnp.int32), cur)
                return (cache, sampler, cur), cur

            (cache, sampler, _), toks = jax.lax.scan(
                body, (cache, sampler, tokens), None, length=chunk)
            return toks.T, cache, sampler

        fn = jax.jit(chunk_body, donate_argnums=(1, 2))
        self._chunk_fns[key] = fn
        return fn

    def run_decode_chunk(self, sampler, tokens, active, chunk: int, sp):
        toks, self.cache, sampler = self._chunk_fn(chunk, sp)(
            self._step_params, self.cache, sampler, tokens, active)
        return toks, sampler

    def _window_fn(self, cap: int, sp):
        """Jitted EOS-aware decode window over the shard_map'ed step (the
        TP analogue of runtime/engine.decode_window): dynamic while_loop
        bound — one compiled program for every window length."""
        key = ("window", cap, sp)
        fn = self._chunk_fns.get(key)
        if fn is not None:
            return fn
        from ..runtime.engine import run_window_loop

        step = self._step
        max_len = self.max_len

        def window_body(params, cache, sampler, tokens, active, budget,
                        n_steps, eos_id):
            def step_fn(cache, toks_2d, pos, kv_lens):
                return step(params, cache, toks_2d, pos, kv_lens)

            return run_window_loop(step_fn, max_len, cache, sampler,
                                   tokens, active, budget, n_steps, cap,
                                   sp, eos_id)

        fn = jax.jit(window_body, donate_argnums=(1, 2))
        self._chunk_fns[key] = fn
        return fn

    def run_decode_window(self, sampler, tokens, active, budget, n_steps,
                          cap: int, sp, eos_id):
        buf, em, toks, act, bud, self.cache, sampler = self._window_fn(
            cap, sp)(
            self._step_params, self.cache, sampler, jnp.asarray(tokens),
            jnp.asarray(active), jnp.asarray(budget), jnp.int32(n_steps),
            jnp.int32(-1 if eos_id is None else eos_id))
        return buf, em, toks, act, bud, sampler

    def run_verify_rows(self, ids, pos, kv_lens, row_idx):
        logits, self.cache = self._step(self._step_params, self.cache,
                                        ids, pos, kv_lens)
        return jnp.take_along_axis(logits, row_idx[..., None], axis=1)

    def run_verify_argmax(self, ids, pos, kv_lens):
        logits, self.cache = self._step(self._step_params, self.cache,
                                        ids, pos, kv_lens)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # -- single-prompt convenience (Model.generate parity) -----------------
    def prefill(self, prompts):
        from ..runtime.engine import pad_to_bucket

        b = len(prompts)
        assert b <= self.max_batch
        t = pad_to_bucket(max(len(p) for p in prompts), self.buckets)
        ids = np.zeros((self.max_batch, t), np.int32)
        lens = np.zeros((self.max_batch,), np.int32)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            lens[i] = len(p)
        self.cache = kvc.set_lengths(
            self.cache, jnp.zeros((self.max_batch,), jnp.int32))
        return self.run_prefill(jnp.asarray(ids), jnp.asarray(lens),
                                jnp.zeros((self.max_batch,), jnp.int32))

    def decode(self, tokens, active):
        lens = self.cache.lengths
        pos = jnp.where(active, lens, self.max_len - 1)[:, None]
        kv_lens = lens + active.astype(jnp.int32)
        logits, self.cache = self._step(self._step_params, self.cache,
                                        tokens[:, None], pos, kv_lens)
        self.cache = kvc.set_lengths(self.cache, kv_lens)
        return logits[:, 0]


class PagedTPEngine(TPEngine):
    """TPEngine over the paged KV cache: head-sharded physical page pools
    (paged_cache_specs) with the host-side PageAllocator of
    runtime.engine.PagedEngine — paged serving on a TP mesh (VERDICT r1
    item 9 'paged-KV-over-TP').  The pool is not dp-sharded (each dp group
    would write different pages into a supposedly-replicated buffer), so
    dp must be 1."""

    PAGED = True

    def __init__(self, params: Dict[str, Any], cfg: ArchConfig, mesh: Mesh,
                 max_batch: int = 1, max_len: int = 2048,
                 kv_dtype=jnp.bfloat16, kv_quantized: bool = False,
                 buckets=None, n_pages=None, page_size: int = 128,
                 prefix_cache: bool = False, kv_scale_dtype=None):
        from ..ops import paged_kv as pkv

        if mesh.shape.get("dp", 1) > 1:
            raise NotImplementedError(
                "paged KV pool is not dp-sharded; use dp=1 (or the "
                "contiguous cache for dp serving)")
        self.page_size = page_size
        # +1: last physical page reserved as the trash page
        self.n_pages = (n_pages or (max_batch * max_len) // page_size) + 1
        self._alloc = pkv.PageAllocator(self.n_pages - 1)
        # prompt-prefix caching (tables/allocator are host-side — the
        # same machinery as the single-chip PagedEngine; chatglm is
        # already rejected by TPEngine)
        self.prefix = (pkv.PrefixPageCache(self._alloc, page_size)
                       if prefix_cache else None)
        self._tables = np.zeros((max_batch, max_len // page_size), np.int32)
        self._lens = np.zeros((max_batch,), np.int64)
        self._mapped = np.zeros((max_batch,), np.int64)
        super().__init__(params, cfg, mesh, max_batch=max_batch,
                         max_len=max_len, kv_dtype=kv_dtype,
                         kv_quantized=kv_quantized, buckets=buckets,
                         fuse=False, kv_scale_dtype=kv_scale_dtype)

    def prefill(self, prompts):
        self.prepare_prefill(range(len(prompts)),
                             [len(p) for p in prompts])
        return super().prefill(prompts)

    def decode(self, tokens, active):
        # (the CB scheduler calls prepare_decode itself before
        # run_decode_chunk; only the single-prompt conveniences hook here)
        self.prepare_decode(np.asarray(active), 1)
        return super().decode(tokens, active)


def _bind_paged_hooks():
    from ..runtime.engine import PagedEngine

    for name in ("new_cache", "_sync_tables", "_ensure_pages",
                 "_alloc_page", "_alloc_run",
                 "prepare_prefill", "prepare_decode", "prepare_rows",
                 "commit_lens", "release_slot", "reorder_slots",
                 "prefix_lookup", "adopt_prefix", "note_prefilled"):
        setattr(PagedTPEngine, name, getattr(PagedEngine, name))


_bind_paged_hooks()
