"""Pre-flight HBM budgeting (utils/memory.py) — the round-4 OOMs must be
predicted at init, not discovered as TPU Internal errors mid-bench."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.utils.synthetic import llama2_7b_arch
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.parallel.planner import qtensor_bytes
from neural_speed_tpu.utils import memory as M


def _fake_7b_weight_bytes():
    """int4-g128 7B packed size via the planner's layout math (no need to
    materialize 3.5 GB in a CPU test)."""
    cfg = llama2_7b_arch()
    spec = named_qspec("int4", group_size=128, scale_dtype="bfloat16")
    h, inter, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    total = 0
    for k, n in [(h, cfg.n_heads * hd), (h, cfg.n_kv_heads * hd),
                 (h, cfg.n_kv_heads * hd), (cfg.n_heads * hd, h),
                 (h, inter), (h, inter), (inter, h)]:
        total += qtensor_bytes(k, n, spec)
    total *= cfg.n_layers
    total += 2 * 2 * cfg.vocab_size * h  # embed + head bf16
    return total, cfg


class _FakeParams:
    """Pytree-leaf stand-in with a fixed nbytes."""

    def __init__(self, nbytes):
        self.nbytes = nbytes


def test_b16_bf16_kv_7b_flagged_over_16gb():
    """The round-4 final-record crash config: 7B int4, B=16, ctx2048,
    bf16 KV does NOT fit 16 GB (KV alone is 2*32*16*2048*32*128*2 = 16
    GiB) — the estimate must say so."""
    wb, cfg = _fake_7b_weight_bytes()
    est = M.HBMEstimate(
        weight_bytes=wb,
        kv_bytes=M.kv_cache_nbytes(cfg.n_layers, 16, 2048, cfg.n_kv_heads,
                                   cfg.head_dim, jnp.bfloat16, False),
        transient_bytes=M.transient_nbytes(cfg, 16, 2048),
        hbm_bytes=int(15.75 * M.GiB),
    )
    assert not est.fits
    assert "OVER BUDGET" in est.describe()
    # the same config with int8 KV at B=1 fits comfortably
    est1 = M.HBMEstimate(
        weight_bytes=wb,
        kv_bytes=M.kv_cache_nbytes(cfg.n_layers, 1, 2048, cfg.n_kv_heads,
                                   cfg.head_dim, jnp.bfloat16, True,
                                   jnp.bfloat16),
        transient_bytes=M.transient_nbytes(cfg, 1, 2048),
        hbm_bytes=int(15.75 * M.GiB),
    )
    assert est1.fits


def test_engine_preflight_warns(monkeypatch):
    """An over-budget Engine construction warns (and raises in strict
    mode) BEFORE cache allocation."""
    from neural_speed_tpu.runtime.engine import Engine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                     n_layers=2, n_heads=2, n_kv_heads=2,
                     intermediate_size=256, max_position_embeddings=64)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    # pretend the device has 64 KiB of HBM
    monkeypatch.setattr(M, "device_hbm_bytes", lambda *a, **k: 1 << 16)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng = Engine(params, cfg, max_batch=2, max_len=64)
    assert any("over the HBM budget" in str(x.message) for x in w)
    assert eng.hbm_estimate is not None and not eng.hbm_estimate.fits
    monkeypatch.setenv("NST_HBM", "strict")
    with pytest.raises(MemoryError):
        Engine(params, cfg, max_batch=2, max_len=64)
    monkeypatch.setenv("NST_HBM", "off")
    eng = Engine(params, cfg, max_batch=2, max_len=64)
    assert eng.hbm_estimate is None


def test_param_nbytes_counts_quantized_leaves():
    cfg = ArchConfig(name="llama", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=32)
    from neural_speed_tpu.utils.synthetic import synth_params

    params = synth_params(cfg, named_qspec("int4", group_size=32))
    n = M.param_nbytes(params)
    assert n > 0
    # packed int4 must be well under the bf16 dense size
    dense = M.param_nbytes({"w": np.zeros(
        (cfg.vocab_size, cfg.hidden_size), np.float32)})
    assert dense == 64 * 64 * 4
