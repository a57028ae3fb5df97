"""Pipeline parallelism on a virtual CPU mesh: the GPipe-style microbatched
step (parallel/pp.py) must reproduce single-device forward() exactly across
stage counts, microbatch counts, quantized weights and quantized KV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.models.transformer import forward
from neural_speed_tpu.ops import kv_cache as kvc
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.parallel import pp as ppmod

B, T, V = 4, 8, 128


def _cfg(n_layers=4):
    return ArchConfig(
        name="llama", vocab_size=V, hidden_size=64, n_layers=n_layers,
        n_heads=4, n_kv_heads=2, intermediate_size=128,
        max_position_embeddings=64,
    )


def _params(cfg, qspec=None, seed=0):
    from tests.test_tp import _tiny_params

    return _tiny_params(cfg, qspec, seed)


def _inputs(seed=1):
    ids = jnp.asarray(np.random.default_rng(seed).integers(0, V, (B, T)),
                      jnp.int32)
    pos = jnp.arange(T)[None, :].repeat(B, 0)
    lens = jnp.full((B,), T, jnp.int32)
    return ids, pos, lens


@pytest.mark.parametrize("qspec", [None, QSpec(QType.INT, 4, 16, True)],
                         ids=["fp", "int4"])
@pytest.mark.parametrize("pp,mb", [(2, 2), (4, 4), (2, 1), (4, 2)])
def test_pp_matches_single_device(qspec, pp, mb):
    cfg = _cfg()
    params = _params(cfg, qspec)
    ids, pos, lens = _inputs()

    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    ref, _ = forward(params, cfg, ids, pos, cache0, lens)

    mesh = ppmod.make_pp_mesh(pp)
    shared, stacked, _ = ppmod.shard_pp_params(params, mesh)
    step = ppmod.make_pp_step(cfg, mesh, mb)(shared, stacked)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, _ = step(shared, stacked, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_pp_prefill_then_decode():
    """The cache written through the pipeline must support a subsequent
    decode step (per-stage KV slices merged back correctly)."""
    cfg = _cfg()
    params = _params(cfg, QSpec(QType.INT, 4, 16, True))
    ids, pos, lens = _inputs(2)

    # single-device reference: prefill + one decode token
    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    lg0, cache0 = forward(params, cfg, ids, pos, cache0, lens)
    cache0 = kvc.set_lengths(cache0, lens)
    tok = jnp.argmax(lg0[:, -1], -1).astype(jnp.int32)
    ref, _ = forward(params, cfg, tok[:, None], lens[:, None], cache0,
                     lens + 1)

    mesh = ppmod.make_pp_mesh(2)
    shared, stacked, _ = ppmod.shard_pp_params(params, mesh)
    step = ppmod.make_pp_step(cfg, mesh, 2)(shared, stacked)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    lg1, cache = step(shared, stacked, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg0),
                               atol=2e-3, rtol=1e-3)
    cache = kvc.set_lengths(cache, lens)
    tok1 = jnp.argmax(lg1[:, -1], -1).astype(jnp.int32)
    lg2, _ = step(shared, stacked, cache, tok1[:, None], lens[:, None],
                  lens + 1)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("qspec", [None, QSpec(QType.INT, 4, 16, True)],
                         ids=["fp", "int4"])
@pytest.mark.parametrize("kv", [2, 1], ids=["shard_kv", "rep_kv"])
def test_pp_tp_matches_single_device(qspec, kv):
    """PP x TP: 2 stages x 2 Megatron shards on a (2,2) mesh must equal the
    single-device forward (kv=1 exercises the replicated-KV GQA path)."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), n_kv_heads=kv)
    params = _params(cfg, qspec, seed=5)
    ids, pos, lens = _inputs(6)

    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    ref, _ = forward(params, cfg, ids, pos, cache0, lens)

    mesh = ppmod.make_pp_mesh(2, tp=2)
    shared, stacked, specs = ppmod.shard_pp_params(params, mesh, cfg)
    step = ppmod.make_pp_step(cfg, mesh, 2)(shared, stacked, specs)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, _ = step(shared, stacked, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_pp_tp_prefill_then_decode():
    """KV written through the PP x TP pipeline (head-sharded on 'tp', layer-
    sharded on 'pp') must support a subsequent decode step."""
    cfg = _cfg()
    params = _params(cfg, QSpec(QType.INT, 4, 16, True), seed=7)
    ids, pos, lens = _inputs(8)

    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    lg0, cache0 = forward(params, cfg, ids, pos, cache0, lens)
    cache0 = kvc.set_lengths(cache0, lens)
    tok = jnp.argmax(lg0[:, -1], -1).astype(jnp.int32)
    ref, _ = forward(params, cfg, tok[:, None], lens[:, None], cache0,
                     lens + 1)

    mesh = ppmod.make_pp_mesh(2, tp=2)
    shared, stacked, specs = ppmod.shard_pp_params(params, mesh, cfg)
    step = ppmod.make_pp_step(cfg, mesh, 2)(shared, stacked, specs)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    lg1, cache = step(shared, stacked, cache, ids, pos, lens)
    cache = kvc.set_lengths(cache, lens)
    tok1 = jnp.argmax(lg1[:, -1], -1).astype(jnp.int32)
    lg2, _ = step(shared, stacked, cache, tok1[:, None], lens[:, None],
                  lens + 1)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_pp_quantized_kv():
    cfg = _cfg(2)
    params = _params(cfg, QSpec(QType.INT, 4, 16, True))
    ids, pos, lens = _inputs(3)
    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, quantized=True)
    ref, _ = forward(params, cfg, ids, pos, cache0, lens)

    mesh = ppmod.make_pp_mesh(2)
    shared, stacked, _ = ppmod.shard_pp_params(params, mesh)
    step = ppmod.make_pp_step(cfg, mesh, 2)(shared, stacked)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, quantized=True)
    logits, _ = step(shared, stacked, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("pp,tp,dp", [(2, 1, 2), (2, 2, 2)],
                         ids=["dp_pp", "dp_pp_tp"])
def test_dp_pp_matches_single_device(pp, tp, dp):
    """Batch sharded over 'dp' on top of the pipeline (and Megatron
    splits): 3-D mesh parity with single-device forward."""
    cfg = _cfg()
    params = _params(cfg, QSpec(QType.INT, 4, 16, True), seed=9)
    ids, pos, lens = _inputs(10)

    cache0 = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                            cfg.head_dim, jnp.float32)
    ref, _ = forward(params, cfg, ids, pos, cache0, lens)

    mesh = ppmod.make_pp_mesh(pp, tp=tp, dp=dp)
    shared, stacked, specs = ppmod.shard_pp_params(
        params, mesh, cfg if tp > 1 else None)
    step = ppmod.make_pp_step(cfg, mesh, 2)(
        shared, stacked, specs if tp > 1 else None)
    cache = kvc.init_cache(cfg.n_layers, B, 32, cfg.n_kv_heads,
                           cfg.head_dim, jnp.float32)
    logits, _ = step(shared, stacked, cache, ids, pos, lens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
