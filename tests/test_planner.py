"""Deployment planner: exact packed-size model + mesh recommendation
logic (parallel/planner.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.models.arch import ArchConfig, MoEConfig
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.quantize import quantize
from neural_speed_tpu.parallel import planner as pl


def _real_bytes(qt) -> int:
    tot = sum(int(d.nbytes) for d in qt.data) + int(qt.scales.nbytes)
    if qt.zeros is not None:
        tot += int(qt.zeros.nbytes)
    if qt.sscale is not None:
        tot += int(qt.sscale.nbytes)
    return tot


@pytest.mark.parametrize("spec", [
    QSpec(QType.INT, 4, 32, True),
    QSpec(QType.INT, 4, 32, False),
    QSpec(QType.INT, 8, 64, True),
    QSpec(QType.INT, 2, 32, True, scale_dtype="bfloat16"),
    QSpec(QType.INT, 4, 32, True, double_quant=True),
], ids=["int4", "int4_asym", "int8", "int2_bf16s", "int4_dq"])
def test_qtensor_bytes_exact(spec):
    k, n = 128, 64
    w = jnp.asarray(np.random.default_rng(0).standard_normal((k, n)),
                    jnp.float32)
    qt = quantize(w, spec)
    assert pl.qtensor_bytes(k, n, spec) == _real_bytes(qt)


def _llama(hidden, layers, heads, kv, inter, vocab=32000):
    return ArchConfig(
        name="llama", vocab_size=vocab, hidden_size=hidden,
        n_layers=layers, n_heads=heads, n_kv_heads=kv,
        intermediate_size=inter, max_position_embeddings=4096,
    )


CFG_7B = _llama(4096, 32, 32, 32, 11008)
CFG_70B = _llama(8192, 80, 64, 8, 28672)
Q4 = QSpec(QType.INT, 4, 128, True)


def test_7b_fits_one_chip_dp_recommended():
    """7B int4 (~3.5 GiB weights) fits a 16 GiB chip: pure DP wins (zero
    ICI traffic)."""
    p = pl.recommend(CFG_7B, Q4, n_chips=8, hbm_gb=16, batch=8, ctx=2048)
    assert p.fits and p.tp == 1 and p.pp == 1 and p.dp == 8
    assert p.comm_bytes_per_token == 0
    gib = p.weight_bytes / (1 << 30)
    assert 3.0 < gib < 4.5, gib


def test_70b_needs_model_parallelism():
    """70B int4 (~35 GiB weights) cannot fit one 16 GiB chip: the
    recommendation must split the model and still fit."""
    p = pl.recommend(CFG_70B, Q4, n_chips=8, hbm_gb=16, batch=8, ctx=2048)
    assert p.fits and (p.tp > 1 or p.pp > 1)
    solo = pl.plan_memory(CFG_70B, Q4, pl.Plan(), batch=1, ctx=2048)
    assert solo.total_bytes > 16 * (1 << 30)


def test_divisibility_constraints_respected():
    cfg = _llama(256, 6, 4, 2, 384, vocab=1000)  # 6 layers, 4 heads
    for p in pl.enumerate_plans(cfg, Q4, 8, 16 << 30, batch=8):
        assert cfg.n_layers % p.pp == 0
        assert cfg.n_heads % p.tp == 0
        assert cfg.intermediate_size % p.tp == 0
        assert p.n_chips <= 8


def test_row_split_respects_group_boundaries():
    """tp that would split a scale group mid-slab is not offered."""
    cfg = _llama(256, 4, 4, 4, 256, vocab=1000)
    q_g128 = QSpec(QType.INT, 4, 128, True)
    # intermediate 256 / tp=4 = 64 < group 128 -> tp=4 invalid
    tps = {p.tp for p in pl.enumerate_plans(cfg, q_g128, 4, 1 << 40,
                                            batch=4)}
    assert 4 not in tps and 2 in tps


def test_moe_ep_plans():
    cfg = ArchConfig(
        name="mixtral", vocab_size=32000, hidden_size=4096, n_layers=32,
        n_heads=32, n_kv_heads=8, intermediate_size=14336,
        max_position_embeddings=4096, moe=MoEConfig(num_experts=8, top_k=2),
    )
    plans = pl.enumerate_plans(cfg, Q4, 8, 16 << 30, batch=8)
    eps = {p.ep for p in plans}
    assert {1, 2, 4, 8} <= eps
    for p in plans:
        if p.ep > 1:
            assert cfg.moe.num_experts % p.ep == 0 and p.pp == 1
        # ep shrinks per-chip weights vs the same mesh without ep
    p_ep = pl.plan_memory(cfg, Q4, pl.Plan(ep=8), batch=8, ctx=2048)
    p_solo = pl.plan_memory(cfg, Q4, pl.Plan(), batch=8, ctx=2048)
    assert p_ep.weight_bytes < p_solo.weight_bytes * 0.3


def test_oom_reported_when_nothing_fits():
    p = pl.recommend(CFG_70B, None, n_chips=2, hbm_gb=16, batch=1)
    assert not p.fits  # 140 GiB bf16 over 2 chips can't fit; best effort
    assert "OOM" in p.describe()


def test_row_split_checks_o_proj_too():
    """The o-projection's K (= n_heads*head_dim) must keep scale groups
    intact as well — and int8/fp8 re-slab freely (repack exemption)."""
    cfg = _llama(512, 4, 8, 8, 1024, vocab=1000)  # o: K=512, down: K=1024
    q_g128 = QSpec(QType.INT, 4, 128, True)
    tps = {p.tp for p in pl.enumerate_plans(cfg, q_g128, 8, 1 << 40,
                                            batch=8)}
    assert 8 not in tps  # 512/8=64 breaks g=128 on the o-proj
    assert 4 in tps      # 512/4=128 ok, 1024/4=256 ok
    q8 = QSpec(QType.INT, 8, 128, True)
    tps8 = {p.tp for p in pl.enumerate_plans(cfg, q8, 8, 1 << 40, batch=8)}
    assert 8 in tps8     # int8 slabs don't touch group packing


def test_awkward_chip_count_falls_back_to_fewer():
    """n_chips=6 with batch=1: no factorization uses all 6 chips, but the
    model fits one chip — recommend must not raise."""
    p = pl.recommend(CFG_7B, Q4, n_chips=6, hbm_gb=16, batch=1, ctx=2048)
    assert p.fits and p.n_chips <= 6


def test_build_engine_from_plan():
    """recommend() -> build_engine() -> serving: the planner's chosen mesh
    becomes a running engine whose output matches single-device."""
    import jax.numpy as jnp
    import numpy as np

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.parallel.planner import Plan, build_engine
    from neural_speed_tpu.runtime.engine import Engine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=64,
                     n_layers=2, n_heads=4, n_kv_heads=4,
                     intermediate_size=128, max_position_embeddings=128)
    rng = np.random.default_rng(0)

    def lin(k, n):
        return {"w": jnp.asarray(
            rng.standard_normal((k, n), np.float32) * 0.05)}

    params = {
        "embed": {"weight": jnp.asarray(
            rng.standard_normal((128, 64), np.float32) * 0.05)},
        "layers": [
            {"attn_norm": {"weight": jnp.ones((64,))},
             "ffn_norm": {"weight": jnp.ones((64,))},
             "q": lin(64, 64), "k": lin(64, 64), "v": lin(64, 64),
             "o": lin(64, 64),
             "ffn": {"gate": lin(64, 128), "up": lin(64, 128),
                     "down": lin(128, 64)}}
            for _ in range(2)
        ],
        "final_norm": {"weight": jnp.ones((64,))},
        "lm_head": lin(64, 128),
    }

    def run(eng):
        s = ContinuousBatchingScheduler(
            eng, SamplingParams(do_sample=False, repetition_penalty=1.1))
        s.add_request([1, 17, 9, 33, 2], 8)
        return s.run_to_completion()[0].generated

    ref = run(Engine(params, cfg, max_batch=2, max_len=128, fuse=False))
    for plan in (Plan(dp=1, pp=1, tp=2), Plan(dp=1, pp=2, tp=2)):
        eng = build_engine(plan, params, cfg, max_batch=2, max_len=128)
        assert run(eng) == ref, plan


def test_comm_estimate_matches_hlo_collectives():
    """The planner's per-token ICI traffic model cross-checked against the
    COMPILED step's collective instruction shapes (VERDICT r1 item 10):
    sum the payload bytes of every all-reduce/all-gather/etc. in the
    lowered decode-step HLO on the 8-virtual-device mesh and require the
    estimate within 2x (it is exact for the current model)."""
    import re

    import jax
    import jax.numpy as jnp

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops import kv_cache as kvc
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.parallel import tp as tpmod
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=512, hidden_size=256,
                     n_layers=2, n_heads=8, n_kv_heads=8,
                     intermediate_size=512, max_position_embeddings=128)
    spec = QSpec(QType.INT, 4, 32, True)
    params = synth_params(cfg, spec)
    mesh = tpmod.make_mesh(tp=4, dp=2)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    b = 2
    cache = kvc.init_cache(cfg.n_layers, b, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.bfloat16)
    ids = jnp.zeros((b, 1), jnp.int32)
    pos = jnp.full((b, 1), 3, jnp.int32)
    lens = jnp.full((b,), 4, jnp.int32)
    txt = step.lower(sharded, cache, ids, pos, lens).compile().as_text()

    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}
    hlo_bytes = 0
    n_coll = 0
    for m in re.finditer(
            r"= ?\(?([a-z0-9]+)\[([0-9,]*)\][^=]*? (all-reduce|all-gather|"
            r"reduce-scatter|collective-permute|all-to-all)(-start)?\(",
            txt):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        hlo_bytes += n * dt_bytes.get(m.group(1), 4)
        n_coll += 1
    assert n_coll >= 2 * cfg.n_layers, f"expected TP psums, saw {n_coll}"

    p = pl.plan_memory(cfg, spec, pl.Plan(dp=2, tp=4), batch=b, ctx=32)
    est = p.comm_bytes_per_token
    assert hlo_bytes > 0 and 0.5 <= est / hlo_bytes <= 2.0, (
        f"estimate {est} vs HLO {hlo_bytes}")
