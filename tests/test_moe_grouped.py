"""Grouped MoE dispatch (ops/moe.py): routing invariants, the grouped
dequant-GEMM kernel (interpret mode) vs the XLA fallback vs per-expert
reference, and end-to-end moe_ffn equality between the stacked/grouped
path and the dense-all-experts path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.models.arch import ArchConfig, MoEConfig
from neural_speed_tpu.ops import moe as moe_ops
from neural_speed_tpu.ops.matmul import qmatmul_xla
from neural_speed_tpu.ops.qtypes import QSpec, QType, named_qspec
from neural_speed_tpu.utils.synthetic import synth_qtensor


def _stack(key, k, n, spec, n_exp):
    qts = [synth_qtensor(jax.random.fold_in(key, e), k, n, spec)
           for e in range(n_exp)]
    st = moe_ops.stack_experts(qts)
    assert st is not None
    return st, qts


def test_route_tokens_invariants():
    rng = np.random.default_rng(0)
    E, top_k, bm = 4, 2, 8
    n_tok = 13
    eid = jnp.asarray(rng.integers(0, E, n_tok * top_k), jnp.int32)
    r = moe_ops.route_tokens(eid, E, top_k, bm)
    src, dest, be = (np.asarray(r.src), np.asarray(r.dest_by_a),
                     np.asarray(r.block_expert))
    A = n_tok * top_k
    assert src.shape[0] % bm == 0 and be.shape[0] == src.shape[0] // bm
    # every assignment lands in a distinct row of its expert's block range
    assert len(set(dest.tolist())) == A
    for a in range(A):
        d = dest[a]
        assert src[d] == a // top_k               # row holds the token
        assert be[d // bm] == int(eid[a])          # block owned by expert
    # rows not covered by any assignment read the zero row
    pad_rows = set(range(src.shape[0])) - set(dest.tolist())
    assert all(src[d] == n_tok for d in pad_rows)


SPECS = [
    pytest.param(QSpec(QType.INT, 4, 32, True), id="int4g32"),
    pytest.param(QSpec(QType.INT, 4, 128, True), id="int4g128-groupdot"),
    pytest.param(QSpec(QType.INT, 4, 64, False), id="int4g64asym"),
    pytest.param(QSpec(QType.INT, 8, 64, True), id="int8g64"),
    pytest.param(named_qspec("nf4", group_size=64), id="nf4g64"),
]


@pytest.mark.parametrize("spec", SPECS)
def test_grouped_qmatmul_matches_per_expert(spec):
    """Both the interpret-mode Pallas kernel and the XLA fallback must equal
    computing each row against its own expert's weight."""
    key = jax.random.PRNGKey(1)
    E, k, n, bm = 3, 256, 128, 8
    st, qts = _stack(key, k, n, spec, E)
    rng = np.random.default_rng(2)
    n_blocks = 6
    be = jnp.asarray(rng.integers(0, E, n_blocks), jnp.int32)
    xs = jnp.asarray(rng.standard_normal((n_blocks * bm, k), np.float32))

    ref = np.stack([
        np.asarray(qmatmul_xla(xs[i:i + 1], qts[int(be[i // bm])],
                               jnp.float32))[0]
        for i in range(n_blocks * bm)
    ])
    out_xla = np.asarray(moe_ops._grouped_xla(xs, st, be, bm))
    np.testing.assert_allclose(out_xla, ref, rtol=2e-5, atol=2e-5)
    out_pl = np.asarray(
        moe_ops.grouped_qmatmul(xs, st, be, bm, interpret=True))
    np.testing.assert_allclose(out_pl, ref, rtol=2e-4, atol=2e-4)


def _moe_params(key, cfg, spec, stacked: bool):
    from neural_speed_tpu.models.transformer import (_stack_expert_ffns,
                                                     fuse_params)

    e_dim, i_dim = cfg.hidden_size, cfg.intermediate_size
    experts = []
    for e in range(cfg.moe.num_experts):
        kk = jax.random.fold_in(key, e)
        experts.append({
            "gate": {"w": synth_qtensor(jax.random.fold_in(kk, 0), e_dim,
                                        i_dim, spec)},
            "up": {"w": synth_qtensor(jax.random.fold_in(kk, 1), e_dim,
                                      i_dim, spec)},
            "down": {"w": synth_qtensor(jax.random.fold_in(kk, 2), i_dim,
                                        e_dim, spec)},
        })
    p = {"router": {"w": jax.random.normal(key, (e_dim, cfg.moe.num_experts),
                                           jnp.float32)},
         "experts": experts}
    if stacked:
        st = _stack_expert_ffns(experts)
        assert st is not None and set(st) == {"gate", "up", "down"}
        p = {"router": p["router"], "experts_stacked": st}
    return p


@pytest.mark.parametrize("bt", [(1, 6), (2, 16)])
def test_moe_grouped_matches_dense(bt):
    from neural_speed_tpu.models.transformer import moe_ffn

    cfg = ArchConfig(name="mixtral", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128,
                     moe=MoEConfig(num_experts=4, top_k=2))
    key = jax.random.PRNGKey(3)
    spec = named_qspec("int4", group_size=32)
    p_dense = _moe_params(key, cfg, spec, stacked=False)
    p_stack = _moe_params(key, cfg, spec, stacked=True)
    b, t = bt
    x = jax.random.normal(jax.random.fold_in(key, 7), (b, t, 64),
                          jnp.float32)
    out_dense = np.asarray(moe_ffn(x, p_dense, cfg))
    out_grouped = np.asarray(moe_ffn(x, p_stack, cfg))
    np.testing.assert_allclose(out_grouped, out_dense, rtol=1e-4, atol=1e-5)


def test_moe_decode_switch_with_stacked():
    from neural_speed_tpu.models.transformer import moe_ffn

    cfg = ArchConfig(name="mixtral", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128,
                     moe=MoEConfig(num_experts=4, top_k=2))
    key = jax.random.PRNGKey(4)
    spec = named_qspec("int4", group_size=32)
    p_dense = _moe_params(key, cfg, spec, stacked=False)
    p_stack = _moe_params(key, cfg, spec, stacked=True)
    x = jax.random.normal(jax.random.fold_in(key, 9), (1, 1, 64),
                          jnp.float32)
    out_switch = np.asarray(moe_ffn(x, p_stack, cfg))
    out_dense = np.asarray(moe_ffn(x, p_dense, cfg))
    np.testing.assert_allclose(out_switch, out_dense, rtol=1e-5, atol=1e-5)


def test_fuse_params_stacks_experts():
    """Engine-style fuse_params must stack eligible experts (gate+up fused
    into gateup) and drop the per-expert list; forward equality."""
    from neural_speed_tpu.models.transformer import fuse_params, moe_ffn

    cfg = ArchConfig(name="mixtral", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128,
                     moe=MoEConfig(num_experts=4, top_k=2))
    key = jax.random.PRNGKey(5)
    spec = named_qspec("int4", group_size=32)
    moe_p = _moe_params(key, cfg, spec, stacked=False)
    params = {"layers": [{"moe": moe_p}]}
    fused = fuse_params(params, cfg)
    fp = fused["layers"][0]["moe"]
    assert "experts" not in fp
    assert set(fp["experts_stacked"]) == {"gateup", "down"}
    x = jax.random.normal(jax.random.fold_in(key, 11), (2, 5, 64),
                          jnp.float32)
    out_ref = np.asarray(moe_ffn(x, moe_p, cfg))
    out_fused = np.asarray(moe_ffn(x, fp, cfg))
    np.testing.assert_allclose(out_fused, out_ref, rtol=1e-4, atol=1e-5)


def test_moe_grouped_tp_matches_single_device():
    """Stacked-expert MoE under TP shard_map (col-split gate/up, row-split
    down, one psum) equals the single-device grouped path."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from neural_speed_tpu.models.transformer import moe_ffn
    from neural_speed_tpu.parallel.tp import (_stacked_experts_specs,
                                              repack_row_parallel)

    tp = 2
    cfg = ArchConfig(name="mixtral", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128,
                     moe=MoEConfig(num_experts=4, top_k=2))
    key = jax.random.PRNGKey(6)
    spec = named_qspec("int4", group_size=16)
    # TP shards the UNFUSED per-projection stacks (fused gateup cannot be
    # column-split naively) — mirror shard_params running on unfused params
    fp = _moe_params(key, cfg, spec, stacked=True)
    x = jax.random.normal(jax.random.fold_in(key, 13), (1, 6, 64),
                          jnp.float32)
    out_ref = np.asarray(moe_ffn(x, fp, cfg))

    fp_tp = repack_row_parallel(fp, tp)
    specs = {"router": {"w": P()},
             "experts_stacked": _stacked_experts_specs(fp_tp[
                 "experts_stacked"])}
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))

    import dataclasses

    cfg_local = dataclasses.replace(
        cfg, intermediate_size=cfg.intermediate_size // tp)

    def step(p, xx):
        return moe_ffn(xx, p, cfg_local, axis_name="tp")

    fn = jax.shard_map(step, mesh=mesh, in_specs=(specs, P()),
                       out_specs=P(), check_vma=False)
    out_tp = np.asarray(fn(fp_tp, x))
    np.testing.assert_allclose(out_tp, out_ref, rtol=1e-4, atol=1e-5)
