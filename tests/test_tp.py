"""Tensor-parallel correctness on an 8-virtual-device CPU mesh.

The reference can only test TP on a real multi-socket host
(tests/model-test/run_tp.sh); here the same math runs on virtual devices
(SURVEY.md §4 noted this as the gap to improve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.models.transformer import forward
from neural_speed_tpu.ops import kv_cache as kvc
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.parallel import tp as tpmod

B, T, V = 2, 8, 128


def _tiny_cfg(n_kv=4):
    return ArchConfig(
        name="llama", vocab_size=V, hidden_size=64, n_layers=2, n_heads=4,
        n_kv_heads=n_kv, intermediate_size=128, max_position_embeddings=64,
    )


def _tiny_params(cfg, qspec=None, seed=0):
    """Random params; optionally quantized linear weights."""
    from neural_speed_tpu.ops.quantize import quantize

    rng = np.random.default_rng(seed)

    def lin(k, n, q=True):
        w = rng.standard_normal((k, n), np.float32) * 0.05
        if qspec is not None and q:
            return {"w": quantize(jnp.asarray(w), qspec)}
        return {"w": jnp.asarray(w)}

    e = cfg.hidden_size
    p = {
        "embed": {
            "weight": jnp.asarray(
                rng.standard_normal((V, e), np.float32) * 0.05
            )
        },
        "layers": [],
        "final_norm": {"weight": jnp.ones((e,))},
        "lm_head": lin(e, V),
    }
    for _ in range(cfg.n_layers):
        p["layers"].append(
            {
                "attn_norm": {"weight": jnp.ones((e,))},
                "ffn_norm": {"weight": jnp.ones((e,))},
                "q": lin(e, cfg.q_dim),
                "k": lin(e, cfg.kv_dim),
                "v": lin(e, cfg.kv_dim),
                "o": lin(cfg.q_dim, e),
                "ffn": {
                    "gate": lin(e, cfg.intermediate_size),
                    "up": lin(e, cfg.intermediate_size),
                    "down": lin(cfg.intermediate_size, e),
                },
            }
        )
    return p


def _single_device_logits(params, cfg, ids, pos, lens):
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads, cfg.head_dim,
                           jnp.float32)
    logits, _ = forward(params, cfg, ids, pos, cache, lens)
    return np.asarray(logits)


@pytest.mark.parametrize("qspec", [None, QSpec(QType.INT, 4, 16, True)],
                         ids=["fp", "int4"])
@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(qspec, tp):
    cfg = _tiny_cfg()
    params = _tiny_params(cfg, qspec)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, (B, T)),
                      jnp.int32)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    lens = jnp.full((B,), T, jnp.int32)
    ref = _single_device_logits(params, cfg, ids, pos, lens)

    mesh = tpmod.make_mesh(tp=tp, dp=1)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    cfg_local, shard_kv = tpmod.local_arch(cfg, tp)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, cache2 = step(sharded, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=1e-3)


def test_tp_mqa_replicated_kv():
    """n_kv_heads=1 cannot shard: K/V replicate, Q still splits."""
    cfg = _tiny_cfg(n_kv=1)
    params = _tiny_params(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, V, (B, T)),
                      jnp.int32)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    lens = jnp.full((B,), T, jnp.int32)
    ref = _single_device_logits(params, cfg, ids, pos, lens)

    mesh = tpmod.make_mesh(tp=4, dp=1)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    cache = kvc.init_cache(cfg.n_layers, B, 32, 1, cfg.head_dim, jnp.float32)
    logits, _ = step(sharded, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=1e-3)


def test_dp_tp_combined():
    cfg = _tiny_cfg()
    params = _tiny_params(cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, V, (B, T)),
                      jnp.int32)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    lens = jnp.full((B,), T, jnp.int32)
    ref = _single_device_logits(params, cfg, ids, pos, lens)

    mesh = tpmod.make_mesh(tp=2, dp=2)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, _ = step(sharded, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# expert parallelism (EXTENSION: reference has 1-D TP only, SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def _tiny_moe_cfg(n_experts=8):
    from neural_speed_tpu.models.arch import MoEConfig

    return ArchConfig(
        name="mixtral", vocab_size=V, hidden_size=64, n_layers=2, n_heads=4,
        n_kv_heads=4, intermediate_size=96, max_position_embeddings=64,
        moe=MoEConfig(num_experts=n_experts, top_k=2),
    )


def _tiny_moe_params(cfg, qspec, seed=0):
    from neural_speed_tpu.ops.moe import stack_experts
    from neural_speed_tpu.ops.quantize import quantize

    rng = np.random.default_rng(seed)

    def lin(k, n, q=True):
        w = rng.standard_normal((k, n), np.float32) * 0.05
        if qspec is not None and q:
            return {"w": quantize(jnp.asarray(w), qspec)}
        return {"w": jnp.asarray(w)}

    def stack(k, n):
        return stack_experts([
            quantize(jnp.asarray(
                rng.standard_normal((k, n), np.float32) * 0.05), qspec)
            for _ in range(cfg.moe.num_experts)
        ])

    e = cfg.hidden_size
    p = {
        "embed": {"weight": jnp.asarray(
            rng.standard_normal((V, e), np.float32) * 0.05)},
        "layers": [],
        "final_norm": {"weight": jnp.ones((e,))},
        "lm_head": lin(e, V),
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "attn_norm": {"weight": jnp.ones((e,))},
            "ffn_norm": {"weight": jnp.ones((e,))},
            "q": lin(e, cfg.q_dim),
            "k": lin(e, cfg.kv_dim),
            "v": lin(e, cfg.kv_dim),
            "o": lin(cfg.q_dim, e),
            "moe": {
                "router": {"w": jnp.asarray(rng.standard_normal(
                    (e, cfg.moe.num_experts), np.float32) * 0.05)},
                "experts_stacked": {
                    "gate": stack(e, cfg.intermediate_size),
                    "up": stack(e, cfg.intermediate_size),
                    "down": stack(cfg.intermediate_size, e),
                },
            },
        })
    return p


@pytest.mark.parametrize("ep,tp,n_exp", [
    (2, 1, 8),   # grouped-local path (E_local=4 > top_k)
    (4, 1, 4),   # dense-local path (E_local=1 <= top_k)
    (2, 2, 8),   # EP x TP combined
])
def test_ep_matches_single_device(ep, tp, n_exp):
    cfg = _tiny_moe_cfg(n_exp)
    qspec = QSpec(QType.INT, 4, 16, True)
    params = _tiny_moe_params(cfg, qspec)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, V, (B, T)),
                      jnp.int32)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    lens = jnp.full((B,), T, jnp.int32)
    ref = _single_device_logits(params, cfg, ids, pos, lens)

    mesh = tpmod.make_mesh(tp=tp, dp=1, ep=ep)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, _ = step(sharded, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=1e-3)


def test_ep_decode_switch_path():
    """B*T == 1 decode under EP takes the local lax.switch branch table
    (zero branch for remote picks)."""
    cfg = _tiny_moe_cfg(8)
    qspec = QSpec(QType.INT, 4, 16, True)
    params = _tiny_moe_params(cfg, qspec)
    ids = jnp.asarray([[7]], jnp.int32)
    pos = jnp.asarray([[3]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)

    cache0 = kvc.init_cache(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    cache0 = kvc.set_lengths(cache0, jnp.asarray([3], jnp.int32))
    from neural_speed_tpu.models.transformer import forward

    ref, _ = forward(params, cfg, ids, pos, cache0, lens)

    mesh = tpmod.make_mesh(tp=2, dp=1, ep=4)
    sharded, specs = tpmod.shard_params(params, cfg, mesh)
    step = tpmod.make_tp_step(cfg, mesh, specs)
    cache = kvc.init_cache(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    cache = kvc.set_lengths(cache, jnp.asarray([3], jnp.int32))
    logits, _ = step(sharded, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_ep_requires_divisible_experts():
    cfg = _tiny_moe_cfg(4)
    params = _tiny_moe_params(cfg, QSpec(QType.INT, 4, 16, True))
    mesh = tpmod.make_mesh(tp=1, dp=1, ep=3)
    with pytest.raises(AssertionError):
        tpmod.shard_params(params, cfg, mesh)
