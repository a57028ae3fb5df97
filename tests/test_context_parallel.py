"""Context-parallel attention on an 8-device CPU mesh vs the single-device
reference (extension beyond the reference — SURVEY.md §2.7 lists SP as
absent upstream)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from neural_speed_tpu.ops.attention import attention_ref
from neural_speed_tpu.parallel.context import cp_attention

CP = 4


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:CP])
    return Mesh(devs, axis_names=("cp",))


@pytest.mark.parametrize("causal,hkv", [(True, 2), (True, 8), (False, 4)],
                         ids=["causal-gqa", "causal-mha", "bidir"])
def test_cp_matches_single_device(mesh, causal, hkv):
    b, t, h, d, s = 2, 8, 8, 64, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    pos = jnp.broadcast_to(40 + jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    kv_lens = jnp.array([48, 33], jnp.int32)

    ref = attention_ref(q, k, v, pos, kv_lens, causal=causal)

    fn = shard_map(
        lambda q, k, v, p, kl: cp_attention(q, k, v, p, kl, causal=causal),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P(None, "cp"), P(), P()),
        out_specs=P(),
    )
    out = fn(q, k, v, pos, kv_lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cp_zero_length_slot(mesh):
    """A slot with kv_len 0 (inactive) must give exactly 0 (no NaN from the
    all-masked shards)."""
    b, t, h, d, s = 1, 2, 4, 64, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    pos = jnp.zeros((b, t), jnp.int32)
    kv_lens = jnp.zeros((b,), jnp.int32)
    fn = shard_map(
        lambda q, k, v, p, kl: cp_attention(q, k, v, p, kl),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P(None, "cp"), P(), P()),
        out_specs=P(),
    )
    out = np.asarray(fn(q, k, v, pos, kv_lens))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, 0.0)


@pytest.mark.parametrize("causal", [True, False], ids=["causal", "bidir"])
def test_ring_attention_matches_single_device(mesh, causal):
    from neural_speed_tpu.parallel.context import ring_attention

    b, t, h, d, s = 1, 4, 4, 64, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    pos = jnp.broadcast_to(30 + jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    kv_lens = jnp.array([34], jnp.int32)

    ref = attention_ref(q, k, v, pos, kv_lens, causal=causal)
    fn = shard_map(
        lambda q, k, v, p, kl: ring_attention(q, k, v, p, kl, cp_size=CP,
                                              causal=causal),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P(None, "cp"), P(), P()),
        out_specs=P(),
        check_rep=False,  # every rank computes the identical full result
    )
    out = fn(q, k, v, pos, kv_lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
