"""Pipeline parallelism — GPipe-style microbatching over a 'pp' mesh axis.

EXTENSION beyond the reference (which has 1-D TP only, SURVEY.md §2.7).
Layers are stacked on a leading axis and that axis is sharded over 'pp':
each device holds `n_layers / S` consecutive layers plus its slice of the
KV cache (`[L_loc, B, H, S, D]`).  A forward step splits the batch into M
microbatches and runs the classic fill-drain schedule — `M + S - 1`
SPMD steps, activations handed stage-to-stage by `lax.ppermute` over ICI
(no host involvement, no NCCL-style process groups).

Design notes (TPU/XLA):
  * The schedule is a STATIC Python loop — every device runs the same
    traced program; "which microbatch am I working on" is data
    (`step - axis_index('pp')`), not control flow, so XLA compiles one
    fused program with no data-dependent branching.
  * Stages that are filling/draining still compute (on a clamped
    microbatch index) and mask their cache/logits writes with `where` —
    idle compute is the textbook pipeline bubble, utilization is
    M / (M + S - 1).
  * Embedding / final norm / lm_head are replicated (cheap next to the
    decoder stack); stage 0 injects embeddings, the last stage produces
    logits which are broadcast with a masked psum.
  * Per-microbatch KV slices are carved with dynamic_slice on the batch
    axis and merged back with dynamic_update_slice — in-place under XLA
    buffer donation.

When to use: model memory exceeds one chip and the expert/tensor axes
are exhausted, or TP's per-layer latency collectives dominate (PP
communicates once per STAGE, not twice per layer).  For single-stream
decode, PP adds S-1 hop latencies per token; throughput serving with
M >= S microbatches hides them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.arch import ArchConfig
from ..models.transformer import decoder_layer, linear, norm
from ..ops import kv_cache as kvc
from ..ops.attention import alibi_slopes
from ..ops.norms import layer_norm
from ..ops.rope import rope_inv_freq


def make_pp_mesh(pp: int, tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    """Pipeline mesh: 'pp' always, with optional 'dp' (batch) and 'tp'
    (Megatron-split) axes — ('dp'?, 'pp', 'tp'?)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= pp * tp * dp, (devices.size, pp, tp, dp)
    axes = [(n, s) for n, s in (("dp", dp), ("pp", pp), ("tp", tp))
            if s > 1 or n == "pp"]
    shape = tuple(s for _, s in axes)
    n_dev = int(np.prod(shape))
    return Mesh(devices[:n_dev].reshape(shape), tuple(n for n, _ in axes))


def stack_layers(layers) -> Any:
    """Stack the per-layer param dicts into one pytree with a leading
    layer axis (all decoder layers share a treedef)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def layer_specs(stacked) -> Any:
    """Shard every stacked leaf's leading (layer) axis on 'pp'."""
    return jax.tree.map(lambda _: P("pp"), stacked)


def layer_specs_tp(params: Dict[str, Any], cfg: ArchConfig,
                   shard_kv: bool) -> Any:
    """PP x TP: per-layer TP specs (the Megatron split table from
    parallel/tp.py) with 'pp' prepended for the stacked layer axis."""
    from . import tp as tpmod

    per_layer = tpmod.param_specs(params, cfg, shard_kv)["layers"][0]
    return jax.tree.map(
        lambda sp: P("pp", *tuple(sp)), per_layer,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_pp_params(params: Dict[str, Any], mesh: Mesh,
                    cfg: Optional[ArchConfig] = None
                    ) -> Tuple[Dict[str, Any], Any, Any]:
    """Returns (shared_params, stacked_layers, stacked_specs): the layer
    stack device_put with its layer axis on 'pp' (each leaf additionally
    TP-split when the mesh has a 'tp' axis), everything else replicated.
    `cfg` is required for PP x TP (split table + row-slab repacking)."""
    from . import tp as tpmod

    tp = mesh.shape.get("tp", 1)
    if tp > 1:
        assert cfg is not None, "cfg required for pp x tp sharding"
        params = tpmod.repack_row_parallel(params, tp)
        _, shard_kv = tpmod.local_arch(cfg, tp)
        specs = layer_specs_tp(params, cfg, shard_kv)
    shared = {k: v for k, v in params.items() if k != "layers"}
    stacked = stack_layers(params["layers"])
    if tp == 1:
        specs = layer_specs(stacked)
    stacked = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stacked, specs,
    )
    shared = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), shared
    )
    return shared, stacked, specs


def cache_pp_specs(shard_kv: bool = False, dp: bool = False) -> kvc.KVCache:
    """[L,B,H,S,D] cache: layer axis on 'pp', batch on 'dp', KV heads on
    'tp' (when those axes exist)."""
    b = "dp" if dp else None
    h = "tp" if shard_kv else None
    kvspec = P("pp", b, h, None, None)
    sspec = P("pp", b, h, None)
    return kvc.KVCache(kvspec, kvspec, sspec, sspec, P(b))


def _cache_slice(c: kvc.KVCache, start, bm: int) -> kvc.KVCache:
    s1 = lambda a: jax.lax.dynamic_slice_in_dim(a, start, bm, 1)  # noqa: E731
    return kvc.KVCache(
        s1(c.k), s1(c.v),
        None if c.k_scale is None else s1(c.k_scale),
        None if c.v_scale is None else s1(c.v_scale),
        jax.lax.dynamic_slice_in_dim(c.lengths, start, bm, 0),
    )


def _cache_merge(c: kvc.KVCache, sub: kvc.KVCache, start,
                 valid) -> kvc.KVCache:
    def m(a, s, axis):
        if a is None:
            return None
        old = jax.lax.dynamic_slice_in_dim(a, start, s.shape[axis], axis)
        return jax.lax.dynamic_update_slice_in_dim(
            a, jnp.where(valid, s, old), start, axis
        )

    return kvc.KVCache(
        m(c.k, sub.k, 1), m(c.v, sub.v, 1),
        m(c.k_scale, sub.k_scale, 1), m(c.v_scale, sub.v_scale, 1),
        c.lengths,
    )


def make_pp_step(cfg: ArchConfig, mesh: Mesh, n_microbatches: int):
    """Build the jitted pipeline forward:
       (shared, stacked, cache, ids, positions, kv_lens) -> (logits, cache)

    Semantics match `transformer.forward` (same masking contract: caller
    sets `cache.lengths` afterwards).  Batch must divide n_microbatches.
    """
    if cfg.rope_style == "chatglm":
        raise NotImplementedError(
            "chatglm-1 (GLM blank-infilling positions/mask) is single-chip "
            "only; chatglm2/3 shard normally")
    from . import tp as tpmod

    s_stages = mesh.shape["pp"]
    assert cfg.n_layers % s_stages == 0, (cfg.n_layers, s_stages)
    l_loc = cfg.n_layers // s_stages
    m_mb = n_microbatches
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    if tp > 1:
        cfg_layer, shard_kv = tpmod.local_arch(cfg, tp)
        tp_axis = "tp"
    else:
        cfg_layer, shard_kv, tp_axis = cfg, False, None

    def step(shared, stacked, cache, ids, positions, kv_lens):
        r = jax.lax.axis_index("pp")
        b, t = ids.shape
        assert b % m_mb == 0, (b, m_mb)
        bm = b // m_mb

        inv_freq, mscale = None, 1.0
        if cfg.rope_style in ("neox", "gptj"):
            rot = cfg.rot_dim or cfg.head_dim
            inv_freq, mscale = rope_inv_freq(
                rot, cfg.rope_base, cfg.rope_scaling, seq_len=cache.max_len
            )
        slopes = None
        if cfg.use_alibi:
            slopes = alibi_slopes(cfg.n_heads)
            if tp_axis is not None and cfg_layer.n_heads != cfg.n_heads:
                hs = jax.lax.axis_index(tp_axis) * cfg_layer.n_heads
                slopes = jax.lax.dynamic_slice(
                    slopes, (hs,), (cfg_layer.n_heads,))

        def embed_mb(mi):
            idm = jax.lax.dynamic_slice_in_dim(ids, mi * bm, bm, 0)
            x = shared["embed"]["weight"][idm]
            if cfg.embed_scale != 1.0:
                x = x * jnp.asarray(cfg.embed_scale, x.dtype)
            if cfg.embedding_ln:
                x = layer_norm(
                    x, shared["embed_ln"]["weight"],
                    shared["embed_ln"].get("bias"), cfg.norm_eps,
                )
            if cfg.learned_pos:
                pm = jax.lax.dynamic_slice_in_dim(positions, mi * bm, bm, 0)
                x = x + shared["pos_embed"]["weight"][pm + cfg.pos_offset]
            return x

        def head_logits(h):
            if cfg.final_norm:
                h = norm(h, shared["final_norm"], cfg)
            head = shared.get("lm_head")
            if head is None or cfg.tie_word_embeddings:
                emb = shared["embed"]["weight"]
                lg = jnp.matmul(h, emb.T.astype(h.dtype),
                                preferred_element_type=jnp.float32)
            else:
                lg = linear(h, head).astype(jnp.float32)
            if cfg.logit_scale != 1.0:
                lg = lg * cfg.logit_scale
            return lg

        h_dtype = shared["embed"]["weight"].dtype
        h_buf = jnp.zeros((bm, t, cfg.hidden_size), h_dtype)
        logits = jnp.zeros((b, t, cfg.vocab_size), jnp.float32)

        for tick in range(m_mb + s_stages - 1):
            m = tick - r                       # my microbatch this tick
            valid = (m >= 0) & (m < m_mb)
            mi = jnp.clip(m, 0, m_mb - 1)
            start = mi * bm
            h = jnp.where(r == 0, embed_mb(mi), h_buf)
            sub = _cache_slice(cache, start, bm)
            pos_mb = jax.lax.dynamic_slice_in_dim(positions, start, bm, 0)
            lens_mb = jax.lax.dynamic_slice_in_dim(kv_lens, start, bm, 0)
            for i in range(l_loc):
                lp = jax.tree.map(lambda a, i=i: a[i], stacked)
                h, sub = decoder_layer(
                    h, lp, cfg_layer, i, sub, pos_mb, lens_mb, inv_freq,
                    mscale, slopes, axis_name=tp_axis,
                )
            cache = _cache_merge(cache, sub, start, valid)
            # last stage: commit this microbatch's logits
            lg = head_logits(h)
            updated = jax.lax.dynamic_update_slice_in_dim(logits, lg,
                                                          start, 0)
            logits = jnp.where(valid & (r == s_stages - 1), updated, logits)
            # hand my activation to the next stage (stage 0 receives zeros
            # and uses the embedding inject instead)
            if s_stages > 1:
                h_buf = jax.lax.ppermute(
                    h, "pp", [(i, i + 1) for i in range(s_stages - 1)]
                )

        # logits live on the last stage only; masked psum broadcasts them
        logits = jax.lax.psum(logits, "pp")
        return logits, cache

    def build(shared, stacked, stacked_specs=None):
        """Bind the actual param pytrees (specs mirror their structure).
        `stacked_specs`: the specs returned by `shard_pp_params` — required
        for PP x TP (per-leaf TP splits can't be rebuilt from shapes alone);
        defaults to plain 'pp'-on-layer-axis specs for pure PP."""
        shared_specs = jax.tree.map(lambda _: P(), shared)
        if stacked_specs is None:
            assert tp == 1, "pp x tp needs the specs from shard_pp_params"
            stacked_specs = layer_specs(stacked)
        cspec = cache_pp_specs(shard_kv, dp > 1)
        dspec = P("dp") if dp > 1 else P()  # batch-axis data sharding
        f = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(shared_specs, stacked_specs, cspec, dspec, dspec,
                      dspec),
            out_specs=(dspec, cspec),
            check_vma=False,
        )
        return jax.jit(f, donate_argnums=(2,))

    return build


from .tp import TPEngine  # noqa: E402  (no cycle: tp does not import pp)


class PPEngine(TPEngine):
    """Serving engine over a (dp?, pp, tp?) pipeline mesh: GPipe
    microbatched forward behind the same four scheduler step methods as
    TPEngine — the continuous-batching scheduler / ModelServer drive a
    pipeline-sharded model unchanged.  Decode (T=1) pays the pipeline's
    serial stage latency per token; PP serving trades per-token latency
    for fitting models no single chip's HBM holds (pair with tp via
    make_pp_mesh(pp, tp))."""

    def __init__(self, params, cfg: ArchConfig, mesh: Mesh,
                 max_batch: int = 1, max_len: int = 2048,
                 kv_dtype=jnp.bfloat16, kv_quantized: bool = False,
                 buckets=None, n_microbatches: Optional[int] = None,
                 fuse: bool = False):
        from ..runtime.engine import DEFAULT_BUCKETS, Engine

        if cfg.rope_style == "chatglm":
            raise NotImplementedError(
                "chatglm-1 (GLM blank-infilling positions/mask) is "
                "single-chip only")
        if fuse:
            raise NotImplementedError(
                "fused QKV/gate-up does not compose with pipeline "
                "sharding's per-leaf TP specs; pass unfused params")
        n_mb = n_microbatches or min(max_batch, mesh.shape["pp"])
        if max_batch % n_mb:
            raise ValueError(f"max_batch={max_batch} must divide into "
                             f"n_microbatches={n_mb}")
        shared, stacked, specs = shard_pp_params(params, mesh, cfg)
        step = make_pp_step(cfg, mesh, n_mb)(shared, stacked, specs)
        # bypass TPEngine.__init__ (it re-shards for a flat tp mesh);
        # Engine.__init__ provides the whole serving surface
        Engine.__init__(self, shared, cfg, max_batch=max_batch,
                        max_len=max_len, kv_dtype=kv_dtype,
                        kv_quantized=kv_quantized,
                        buckets=buckets or DEFAULT_BUCKETS, fuse=False)
        self.mesh = mesh
        self._step_params = (shared, stacked)
        self._step = (lambda p, cache, ids, pos, kv:
                      step(p[0], p[1], cache, ids, pos, kv))
        self._chunk_fns = {}
